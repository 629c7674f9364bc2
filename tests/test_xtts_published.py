"""XTTS published-checkpoint inference path (tiny scale, CPU):
conditioning latents from reference audio → GPT decode collecting
final-norm latents → latent HiFi-GAN with the H/ASP d-vector.
Ref: SURVEY §2.4 XTTS re-support mandate; closes the PARITY.md
"conditioning perceiver + latent-consuming HiFi-GAN decoder" delta."""

import numpy as np
import pytest

pytestmark = pytest.mark.unit


@pytest.fixture()
def tiny_env(tmp_path, monkeypatch):
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "tiny")
    monkeypatch.setenv("VOCALIE_ALLOW_RANDOM_WEIGHTS", "1")
    monkeypatch.delenv("VOCALIE_WEIGHT_INT8", raising=False)
    monkeypatch.delenv("VOCALIE_KV_INT8", raising=False)
    return tmp_path


def _tiny_published_bundle():
    import jax

    from vocalie_tts_tpu.models.xtts.conditioning import (
        ConditioningEncoderConfig,
        PerceiverConfig,
        XTTSConditioningConfig,
        init_xtts_conditioning,
    )
    from vocalie_tts_tpu.models.xtts.hifi_decoder import (
        HifiDecoderConfig,
        init_hifi_decoder,
    )
    from vocalie_tts_tpu.models.xtts.runtime import SCALES
    from vocalie_tts_tpu.models.xtts.speaker_resnet import (
        SpeakerResNetConfig,
        init_speaker_resnet,
    )

    d = SCALES["tiny"].d_model
    cond_cfg = XTTSConditioningConfig(
        encoder=ConditioningEncoderConfig(
            spec_dim=80, d_model=d, n_blocks=1, n_heads=4, groups=8),
        perceiver=PerceiverConfig(dim=d, depth=1, num_latents=32,
                                  dim_head=8, heads=4, ff_mult=2),
    )
    hifi_cfg = HifiDecoderConfig(
        latent_dim=d, d_vector_dim=16, base_channels=32,
        upsample_rates=(4, 4), upsample_kernels=(8, 8), resblock_kernels=(3,),
    )
    spk_cfg = SpeakerResNetConfig(
        n_mels=16, proj_dim=16, layers=(1, 1, 1, 1), filters=(4, 8, 16, 32),
        se_reduction=2, attn_hidden=8,
    )
    k = jax.random.PRNGKey(7)
    return {
        "cond": init_xtts_conditioning(k, cond_cfg),
        "hifi": init_hifi_decoder(jax.random.fold_in(k, 1), hifi_cfg),
        "spk": init_speaker_resnet(jax.random.fold_in(k, 2), spk_cfg),
        "cond_cfg": cond_cfg, "hifi_cfg": hifi_cfg, "spk_cfg": spk_cfg,
    }


def _write_ref_wav(path, seconds=1.2, sr=24000):
    from vocalie_tts_tpu.io.wavio import write_wav

    t = np.arange(int(sr * seconds)) / sr
    audio = (0.3 * np.sin(2 * np.pi * 150 * t) * (1 + 0.2 * np.sin(2 * np.pi * 3 * t)))
    write_wav(str(path), audio.astype(np.float32), sr)
    return str(path)


def test_published_bundle_roundtrip_and_synthesis(tiny_env):
    from vocalie_tts_tpu.models.xtts.runtime import (
        XTTSRuntime,
        load_published_bundle,
        save_published_bundle,
    )

    weights_dir = tiny_env / "xtts" / "weights"
    weights_dir.mkdir(parents=True)
    save_published_bundle(weights_dir, _tiny_published_bundle())
    assert load_published_bundle(weights_dir) is not None

    rt = XTTSRuntime.create(tiny_env / "xtts")
    assert rt.published is not None

    ref = _write_ref_wav(tiny_env / "ref.wav")
    audio, sr, meta = rt.synthesize(
        "Bonjour, ceci est un clonage de voix.", voice_ref_path=ref,
    )
    hcfg = rt.published["hifi_cfg"]
    assert sr == hcfg.output_sr
    assert meta["mode"] == "published"
    assert meta["vq_tokens"] > 0
    spt = hcfg.latent_upsample * hcfg.output_sr / hcfg.input_sr
    assert audio.shape[0] == int(meta["vq_tokens"] * spt) * hcfg.vocoder.hop
    assert np.isfinite(audio).all()

    # voice prep caches by (path, mtime)
    assert len(rt._pub_voices) == 1
    rt.synthesize("Deuxième phrase.", voice_ref_path=ref)
    assert len(rt._pub_voices) == 1


def test_published_latents_do_not_change_sampled_tokens(tiny_env):
    """The latent-collecting decode loop must sample the same token
    sequence as the plain loop (same rng, same cache): the extra
    hidden-state collection is observation only."""
    import jax
    import jax.numpy as jnp

    from vocalie_tts_tpu.models.common.ar_runtime import (
        make_generate_fn,
        make_generate_latents_fn,
    )
    from vocalie_tts_tpu.models.xtts.model import (
        BOS_VQ,
        EOS_VQ,
        init_xtts,
        vq_logit_bias,
    )
    from vocalie_tts_tpu.models.xtts.runtime import SCALES

    cfg = SCALES["tiny"]
    params = init_xtts(jax.random.PRNGKey(3), cfg)
    gen_plain = make_generate_fn(cfg.lm, vq_logit_bias())
    gen_lat = make_generate_latents_fn(cfg.lm, vq_logit_bias())

    embeds = jax.random.normal(jax.random.PRNGKey(4), (2, 40, cfg.d_model)) * 0.1
    lengths = jnp.asarray([40, 33])
    rng = jax.random.PRNGKey(5)
    kw = dict(cache_len=128, max_new=16, eos_token_id=EOS_VQ,
              temperature=0.7, top_k=8, top_p=0.9,
              repetition_penalty=2.0, first_token=BOS_VQ)
    t1, l1 = gen_plain(params["lm"], embeds, lengths, rng, **kw)
    t2, l2, hid = gen_lat(params["lm"], embeds, lengths, rng, **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert hid.shape == (2, 17, cfg.d_model)
    assert np.isfinite(np.asarray(hid)).all()


def test_scale_mismatch_falls_back_to_dev_path(tiny_env, monkeypatch):
    """A published bundle whose dim doesn't match the model scale must
    be skipped (e.g. full-size import viewed at tiny scale)."""
    from vocalie_tts_tpu.models.xtts.runtime import (
        XTTSRuntime,
        save_published_bundle,
    )

    bundle = _tiny_published_bundle()
    weights_dir = tiny_env / "xtts" / "weights"
    weights_dir.mkdir(parents=True)
    save_published_bundle(weights_dir, bundle)

    # view the same weights dir at a scale whose d_model differs
    monkeypatch.setenv("VOCALIE_MODEL_SCALE", "small")
    rt = XTTSRuntime.create(tiny_env / "xtts")
    assert rt.published is None
