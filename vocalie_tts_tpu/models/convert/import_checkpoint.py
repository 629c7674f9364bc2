"""Import a local HF-style checkpoint into an engine's weight store.

Bridges published torch checkpoints to the TPU engines: reads a
``.safetensors`` / ``.pt`` state dict, converts the decoder backbone
with ``convert_hf_decoder_state``, grafts it into the family's param
bundle (keeping the non-LM parts — speaker tables, vocoders — from the
existing install or random init), and saves it under the checkpoint
name the runtime loads (``t3`` / ``t3_fr`` / ``lm`` / ``gpt``).

No network access happens here — the user supplies a local file
(equivalent of the reference's HF snapshot + overlay load,
ref: chatterbox_impl.py:63-73, base_runner.py:128-140).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

_FAMILIES = {
    "chatterbox": {"default_name": "t3", "names": ("t3", "t3_fr")},
    "qwen3": {"default_name": "lm", "names": ("lm",)},
    "cosyvoice": {"default_name": "lm", "names": ("lm",)},
    "xtts": {"default_name": "gpt", "names": ("gpt",)},
}


def _family_bundle(family: str, weights_dir: Path, name: str,
                   text_vocab: Optional[int] = None,
                   token_vocab: Optional[int] = None):
    """(cfg.lm, current bundle) for the family — loaded or random init.

    ``text_vocab``/``token_vocab`` override the config's text-embedding
    rows and speech/codec codebook size (the imported checkpoint's
    published spaces); when an existing on-disk bundle is reloaded as
    the graft target, its own recorded sizes win so template shapes
    match."""
    import dataclasses

    from vocalie_tts_tpu.models.common.weights import (
        checkpoint_exists,
        load_meta,
        load_params,
    )

    key = jax.random.PRNGKey(7)
    if checkpoint_exists(weights_dir, name):
        saved = load_meta(weights_dir, name)
        if saved.get("text_vocab") is not None:
            text_vocab = int(saved["text_vocab"])
        for k_ in ("speech_vocab", "codec_vocab"):
            if saved.get(k_) is not None:
                token_vocab = int(saved[k_])

    def _with_tv(cfg):
        updates = {}
        if text_vocab is not None and getattr(cfg, "text_vocab", None) not in (
            None, text_vocab,
        ):
            updates["text_vocab"] = text_vocab
        for field in ("speech_vocab", "codec_vocab"):
            if token_vocab is not None and getattr(cfg, field, None) not in (
                None, token_vocab,
            ):
                updates[field] = token_vocab
        return dataclasses.replace(cfg, **updates) if updates else cfg

    if family == "chatterbox":
        from vocalie_tts_tpu.models.chatterbox.model import init_t3
        from vocalie_tts_tpu.models.chatterbox.runtime import SCALES, _scale_from_env

        cfg = _with_tv(SCALES[_scale_from_env()])
        bundle = init_t3(key, cfg)
    elif family == "qwen3":
        from vocalie_tts_tpu.models.lmtts.model import init_lmtts
        from vocalie_tts_tpu.models.lmtts.runtime import SCALES
        import os

        cfg = _with_tv(SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")])
        bundle = init_lmtts(jax.random.PRNGKey(11), cfg)
    elif family == "cosyvoice":
        from vocalie_tts_tpu.models.cosyvoice.model import init_cosyvoice_lm
        from vocalie_tts_tpu.models.cosyvoice.runtime import SCALES
        import os

        cfg = _with_tv(SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")])
        bundle = init_cosyvoice_lm(jax.random.PRNGKey(31), cfg)
    elif family == "xtts":
        from vocalie_tts_tpu.models.xtts.model import init_xtts
        from vocalie_tts_tpu.models.xtts.runtime import SCALES
        import os

        cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
        bundle = init_xtts(jax.random.PRNGKey(23), cfg)
    else:
        raise ValueError(f"unknown family {family!r} (choose from {sorted(_FAMILIES)})")
    if checkpoint_exists(weights_dir, name):
        bundle = load_params(weights_dir, name, bundle)
    return cfg.lm, bundle


#: family → (stage-2 bundle name on disk, init import path)
_STAGE2 = {
    "chatterbox": ("s3gen", "vocalie_tts_tpu.models.chatterbox.model", "init_token_decoder"),
    "qwen3": ("codec_decoder", "vocalie_tts_tpu.models.lmtts.model", "init_codec_decoder"),
    "cosyvoice": ("flow", "vocalie_tts_tpu.models.cosyvoice.model", "init_cfm_decoder"),
    "xtts": ("vq_decoder", "vocalie_tts_tpu.models.xtts.model", "init_vq_decoder"),
    "piper": ("vits", "vocalie_tts_tpu.models.vits.model", "init_vits"),
}

#: families whose stage-2 is the flow+HiFT token→wav stage (vanilla
#: HiFi-GAN grafts do not apply — use import_token2wav_checkpoint)
_TOKEN2WAV_FAMILIES = ("chatterbox", "cosyvoice")


def _family_cfg(family: str):
    import os

    scale = os.environ.get("VOCALIE_MODEL_SCALE", "full")
    if family == "chatterbox":
        from vocalie_tts_tpu.models.chatterbox.runtime import SCALES, _scale_from_env

        return SCALES[_scale_from_env()]
    if family == "qwen3":
        from vocalie_tts_tpu.models.lmtts.runtime import SCALES
    elif family == "cosyvoice":
        from vocalie_tts_tpu.models.cosyvoice.runtime import SCALES
    elif family == "xtts":
        from vocalie_tts_tpu.models.xtts.runtime import SCALES
    elif family == "piper":
        from vocalie_tts_tpu.models.vits.runtime import SCALES
    else:
        raise ValueError(f"unknown family {family!r} (choose from {sorted(_STAGE2)})")
    return SCALES[scale]


def import_vocoder_checkpoint(
    *,
    family: str,
    checkpoint: Path,
    assets_dir: Path,
    prefix: str = "",
) -> Dict[str, str]:
    """Graft a published HiFi-GAN generator into a family's stage-2 bundle.

    Covers the waveform decoders the reference's engines bring with
    their base models (ref: chatterbox_impl.py:63-73 full model load,
    cosyvoice_runner.py:67-76, the Piper/XTTS decoders): reads the
    state dict, fuses weight norm, validates shapes against the
    family's vocoder topology, and saves the updated bundle in place.
    """
    from vocalie_tts_tpu.models.common.weights import (
        checkpoint_exists,
        load_params,
        save_params,
    )
    from vocalie_tts_tpu.models.convert.hifigan import convert_hifigan_generator
    from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict

    if family not in _STAGE2:
        raise ValueError(f"unknown family {family!r} (choose from {sorted(_STAGE2)})")
    if family in _TOKEN2WAV_FAMILIES:
        raise ValueError(
            f"{family}'s waveform stage is flow+HiFT (S3Gen/CosyVoice shape), "
            "not a vanilla HiFi-GAN — import it with --stage token2wav "
            "(import_token2wav_checkpoint)"
        )
    bundle_name, module_name, init_name = _STAGE2[family]
    cfg = _family_cfg(family)

    import importlib

    init_fn = getattr(importlib.import_module(module_name), init_name)
    bundle = init_fn(jax.random.PRNGKey(5), cfg)
    weights_dir = Path(assets_dir) / "weights"
    if checkpoint_exists(weights_dir, bundle_name):
        bundle = load_params(weights_dir, bundle_name, bundle)

    state = load_state_dict(checkpoint)
    voc = convert_hifigan_generator(state, cfg.vocoder, prefix=prefix)
    new_bundle = {**bundle, "vocoder": voc}
    save_params(
        weights_dir, bundle_name, new_bundle,
        meta={"family": family, "stage": f"{bundle_name}.vocoder",
              "imported_from": str(checkpoint)},
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(voc))
    return {"family": family, "name": bundle_name, "vocoder_params": str(n),
            "weights_dir": str(weights_dir)}


def import_token2wav_checkpoint(
    *,
    family: str,
    checkpoint: Path,
    assets_dir: Path,
    flow_prefix: Optional[str] = None,
    hift_prefix: Optional[str] = None,
    hift_checkpoint: Optional[Path] = None,
) -> Dict[str, str]:
    """Import the full flow+HiFT token→wav stage for chatterbox/cosyvoice.

    Accepts the two published artifact layouts (ref:
    chatterbox_impl.py:63-73, cosyvoice_runner.py:67-76):
    - one bundle with ``flow.*`` + ``mel2wav.*`` (Chatterbox s3gen);
    - separate flow/hift checkpoints (CosyVoice ``flow.pt`` +
      ``hift.pt``) — pass ``hift_checkpoint``; prefixes default to ""
      then.
    The converted stage must match the family's full-scale template
    (the published CosyVoice2/S3Gen geometry) — anything else fails
    loud here rather than at engine load."""
    from vocalie_tts_tpu.models.common.weights import (
        checkpoint_exists,
        load_params,
        save_params,
    )
    from vocalie_tts_tpu.models.convert.token2wav import convert_token2wav
    from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict

    if family not in _TOKEN2WAV_FAMILIES:
        raise ValueError(
            f"token2wav import applies to {_TOKEN2WAV_FAMILIES}, got {family!r}"
        )
    bundle_name, module_name, init_name = _STAGE2[family]
    cfg = _family_cfg(family)
    # an imported LM defines the engine's speech-token space — the t2w
    # stage must agree (import the LM first for a non-default space)
    from vocalie_tts_tpu.models.common.weights import load_meta

    lm_name = "t3" if family == "chatterbox" else "lm"
    sv = load_meta(Path(assets_dir) / "weights", lm_name).get("speech_vocab")
    if sv is not None and int(sv) != cfg.speech_vocab:
        import dataclasses

        cfg = dataclasses.replace(cfg, speech_vocab=int(sv))

    state = load_state_dict(checkpoint)
    hift_state = None
    if hift_checkpoint is not None:
        hift_state = load_state_dict(hift_checkpoint)
        if flow_prefix is None:
            flow_prefix = "flow." if any(k.startswith("flow.") for k in state) else ""
        if hift_prefix is None:
            hift_prefix = (
                "mel2wav." if any(k.startswith("mel2wav.") for k in hift_state) else ""
            )
    if flow_prefix is None:
        flow_prefix = "flow."
    if hift_prefix is None:
        hift_prefix = "mel2wav."

    t2w_params, t2w_cfg = convert_token2wav(
        state, flow_prefix=flow_prefix, hift_state=hift_state,
        hift_prefix=hift_prefix, base=cfg.t2w,
    )
    if t2w_cfg != cfg.t2w:
        raise ValueError(
            f"converted token2wav geometry {t2w_cfg} does not match the "
            f"{family} full-scale template {cfg.t2w}; set VOCALIE_MODEL_SCALE "
            "accordingly or supply a published-shape checkpoint"
        )

    import importlib

    init_fn = getattr(importlib.import_module(module_name), init_name)
    bundle = init_fn(jax.random.PRNGKey(5), cfg)
    weights_dir = Path(assets_dir) / "weights"
    if checkpoint_exists(weights_dir, bundle_name):
        bundle = load_params(weights_dir, bundle_name, bundle)

    new_bundle = {**bundle, "t2w": t2w_params}
    save_params(
        weights_dir, bundle_name, new_bundle,
        meta={"family": family, "stage": f"{bundle_name}.t2w",
              "imported_from": str(checkpoint)},
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(t2w_params))
    return {"family": family, "name": bundle_name, "t2w_params": str(n),
            "weights_dir": str(weights_dir)}


def import_xtts_checkpoint(
    *,
    checkpoint: Path,
    assets_dir: Path,
    prefix: str = "gpt.",
) -> Dict[str, str]:
    """Import the XTTS GPT stage: GPT-2 blocks + mel/text embeddings,
    position tables and the mel head (BASELINE config #2; the published
    checkpoint keeps embeddings/heads beside the GPT2 module —
    ``gpt.gpt.h.*`` blocks, ``gpt.mel_embedding`` etc.). The
    conditioning encoder stays ours (documented delta); the waveform
    stage imports via ``--stage vocoder``."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from vocalie_tts_tpu.models.common.weights import (
        checkpoint_exists,
        load_params,
        save_params,
    )
    from vocalie_tts_tpu.models.convert.gpt2 import convert_gpt2_state
    from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict
    from vocalie_tts_tpu.models.xtts.model import init_xtts
    from vocalie_tts_tpu.models.xtts.runtime import SCALES

    cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
    state = load_state_dict(checkpoint)

    bundle = init_xtts(jax.random.PRNGKey(23), cfg)
    weights_dir = Path(assets_dir) / "weights"
    if checkpoint_exists(weights_dir, "gpt"):
        bundle = load_params(weights_dir, "gpt", bundle)

    lm = convert_gpt2_state(
        state, cfg.lm, prefix=f"{prefix}gpt.", embeddings=False,
        dtype=cfg.dtype,
    )

    def get(name, shape):
        arr = np.asarray(state[name])  # KeyError if absent
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: shape {arr.shape}, expected {tuple(shape)}")
        return arr

    d = cfg.d_model
    from vocalie_tts_tpu.models.xtts.model import VOCAB

    lm["tok_emb"] = jnp.asarray(
        get(f"{prefix}mel_embedding.weight", (VOCAB, d)), cfg.dtype)
    lm["pos_emb"] = jnp.asarray(
        get(f"{prefix}mel_pos_embedding.emb.weight", (cfg.mel_pos_len, d)), cfg.dtype)
    lm["lm_head"] = jnp.asarray(
        get(f"{prefix}mel_head.weight", (VOCAB, d)).T, cfg.dtype)
    lm["lm_head_b"] = jnp.asarray(
        get(f"{prefix}mel_head.bias", (VOCAB,)), jnp.float32)

    new_bundle = {
        **bundle,
        "lm": lm,
        "text_emb": jnp.asarray(
            get(f"{prefix}text_embedding.weight", (cfg.text_vocab, d)), cfg.dtype),
        "text_pos": jnp.asarray(
            get(f"{prefix}text_pos_embedding.emb.weight", (cfg.text_pos_len, d)),
            cfg.dtype),
    }
    save_params(
        weights_dir, "gpt", new_bundle,
        meta={"family": "xtts", "stage": "gpt", "imported_from": str(checkpoint)},
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(lm))
    result = {"family": "xtts", "name": "gpt", "lm_params": str(n),
              "weights_dir": str(weights_dir)}

    # Published conditioning + latent decoder + speaker encoder, when the
    # checkpoint carries them (a full XTTS-v2 model.pth does; a GPT-only
    # export keeps the documented dev-path delta). mel_stats.pth beside
    # the checkpoint supplies the conditioning mel norms.
    if f"{prefix}conditioning_encoder.init.weight" in state and (
        "hifigan_decoder.waveform_decoder.conv_pre.weight" in state
    ):
        from vocalie_tts_tpu.models.convert.xtts_modules import (
            convert_hifi_decoder,
            convert_speaker_resnet,
            convert_xtts_conditioning,
            infer_conditioning_config,
            infer_hifi_decoder_config,
            infer_speaker_resnet_config,
        )
        from vocalie_tts_tpu.models.xtts.runtime import save_published_bundle

        mel_norms = None
        stats = Path(checkpoint).parent / "mel_stats.pth"
        if stats.exists():
            import torch  # mel_stats.pth is a bare tensor, not a state dict

            t = torch.load(str(stats), map_location="cpu", weights_only=True)
            if isinstance(t, dict):
                t = next(iter(t.values()))
            mel_norms = t.detach().to(torch.float32).numpy()
        cond_cfg = infer_conditioning_config(state, prefix=prefix)
        hifi_cfg = infer_hifi_decoder_config(state)
        spk_cfg = infer_speaker_resnet_config(state)
        save_published_bundle(weights_dir, {
            "cond": convert_xtts_conditioning(state, cond_cfg, prefix=prefix,
                                              mel_norms=mel_norms),
            "hifi": convert_hifi_decoder(state, hifi_cfg),
            "spk": convert_speaker_resnet(state, spk_cfg),
            "cond_cfg": cond_cfg, "hifi_cfg": hifi_cfg, "spk_cfg": spk_cfg,
        })
        result["published"] = "cond+hifi+spk"

    # the published text BPE ships as vocab.json (tokenizers format) in
    # the XTTS-v2 release; stage it where the runtime discovers it
    for name in ("tokenizer.json", "vocab.json"):
        src = Path(checkpoint).parent / name
        if src.exists():
            import shutil

            dst = Path(assets_dir) / "tokenizer.json"
            shutil.copyfile(src, dst)
            result["tokenizer"] = str(dst)
            break
    return result


def import_vits_checkpoint(
    *,
    checkpoint: Path,
    assets_dir: Path,
    prefix: str = "",
) -> Dict[str, str]:
    """Import a full Piper/VITS voice into the piper engine.

    Accepts a torch SynthesizerTrn state dict (.pt/.safetensors,
    weight-normed) or a Piper voice's .onnx export (initializers read
    directly; weight norm already fused at export) — the two artifact
    forms Piper voices ship in (ref: SURVEY §2.4 Piper engine)."""
    import os

    from vocalie_tts_tpu.models.common.weights import save_params
    from vocalie_tts_tpu.models.convert.vits import convert_vits_checkpoint
    from vocalie_tts_tpu.models.vits.runtime import SCALES

    checkpoint = Path(checkpoint)
    if checkpoint.suffix == ".onnx":
        from vocalie_tts_tpu.models.convert.onnx_reader import read_onnx_initializers

        state = read_onnx_initializers(checkpoint)
    else:
        from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict

        state = load_state_dict(checkpoint)

    cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
    params = convert_vits_checkpoint(state, cfg, prefix=prefix)
    n_phones = int(params["emb"].shape[0])
    weights_dir = Path(assets_dir) / "weights"
    save_params(
        weights_dir, "vits", params,
        meta={"family": "vits", "sample_rate": cfg.sample_rate,
              "n_phones": n_phones, "imported_from": str(checkpoint)},
    )
    result = {"family": "piper", "name": "vits",
              "vits_params": str(sum(
                  x.size for x in jax.tree_util.tree_leaves(params))),
              "n_phones": str(n_phones), "weights_dir": str(weights_dir)}
    # stage the voice's config.json (phoneme_id_map + sample rate) so
    # the runtime frontend serves the published espeak id space
    for name in ("config.json", f"{Path(checkpoint).name}.json",
                 Path(checkpoint).stem + ".json"):
        src = Path(checkpoint).parent / name
        if src.exists():
            import shutil

            dst = Path(assets_dir) / "piper_config.json"
            if src.resolve() != dst.resolve():
                shutil.copyfile(src, dst)
            result["voice_config"] = str(dst)
            break
    return result


def import_codec_decoder_checkpoint(
    *,
    checkpoint: Path,
    assets_dir: Path,
    prefix: str = "",
) -> Dict[str, str]:
    """Graft a published 12.5 Hz codec-decoder stage into the qwen3
    engine's ``codec_decoder`` bundle (tok_emb + upsample convs + mel
    head; the waveform HiFi-GAN imports via ``--stage vocoder``).
    Closes the qwen3 row's last per-stage converter delta
    (docs/PARITY.md: the codec decoder's weights ship separately
    upstream — ref: tts_backends/qwen3_runner.py:70-93 model load)."""
    import os

    from vocalie_tts_tpu.models.common.weights import (
        checkpoint_exists,
        load_params,
        save_params,
    )
    from vocalie_tts_tpu.models.convert.codec_decoder import convert_codec_decoder
    from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict
    from vocalie_tts_tpu.models.lmtts.model import init_codec_decoder
    from vocalie_tts_tpu.models.lmtts.runtime import SCALES

    cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
    state = load_state_dict(checkpoint)
    stage = convert_codec_decoder(state, cfg, prefix=prefix)

    bundle = init_codec_decoder(jax.random.PRNGKey(5), cfg)
    weights_dir = Path(assets_dir) / "weights"
    if checkpoint_exists(weights_dir, "codec_decoder"):
        bundle = load_params(weights_dir, "codec_decoder", bundle)
    new_bundle = {**bundle, **stage}
    save_params(
        weights_dir, "codec_decoder", new_bundle,
        meta={"family": "lmtts", "stage": "codec_decoder",
              "imported_from": str(checkpoint)},
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(stage))
    return {"family": "qwen3", "name": "codec_decoder",
            "codec_params": str(n), "weights_dir": str(weights_dir)}


def import_s3_tokenizer_checkpoint(
    *,
    checkpoint: Path,
    assets_dir: Path,
    family: str = "cosyvoice",
    prefix: str = "",
) -> Dict[str, str]:
    """Import an S3 speech tokenizer (the torch export of CosyVoice's
    ``speech_tokenizer_v2.onnx``; ref: tts_backends/cosyvoice_runner.py
    :87-125 zero-shot prompt extraction). Enables published zero-shot
    cloning: the runtime conditions the LM on the reference's speech
    tokens and the flow on its mel prefix."""
    from vocalie_tts_tpu.models.convert.s3_tokenizer import (
        convert_s3_tokenizer,
        infer_s3_tokenizer_config,
    )
    from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict
    from vocalie_tts_tpu.models.cosyvoice.runtime import save_s3_tokenizer

    state = load_state_dict(checkpoint)
    cfg = infer_s3_tokenizer_config(state, prefix=prefix)
    params = convert_s3_tokenizer(state, cfg, prefix=prefix)
    weights_dir = Path(assets_dir) / "weights"
    weights_dir.mkdir(parents=True, exist_ok=True)
    save_s3_tokenizer(weights_dir, params, cfg)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {"family": family, "name": "s3_tokenizer", "params": str(n),
            "tokens_per_second": str(cfg.tokens_per_second),
            "weights_dir": str(weights_dir)}


def import_audiosr_checkpoint(
    *,
    checkpoint: Path,
    assets_dir: Path,
    vae_prefix: str = "first_stage_model.",
    unet_prefix: str = "model.diffusion_model.",
) -> Dict[str, str]:
    """Graft a published latent-diffusion checkpoint into the AudioSR
    engine: the CompVis VAE under ``first_stage_model.`` and the LDM
    UNet under ``model.diffusion_model.`` (the standard LDM bundle
    layout the reference's ``build_model("basic")`` loads — ref:
    backend/workers/audiosr_runner.py:93-97). The vocoder stage imports
    separately via import_vocoder_checkpoint if shipped."""
    import os

    from vocalie_tts_tpu.models.audiosr.runtime import SCALES
    from vocalie_tts_tpu.models.common.weights import (
        checkpoint_exists,
        load_params,
        save_params,
    )
    from vocalie_tts_tpu.models.convert.ldm import convert_ldm_unet, convert_vae
    from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict

    cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
    state = load_state_dict(checkpoint)

    from vocalie_tts_tpu.models.audiosr.model import init_audiosr

    bundle = init_audiosr(jax.random.PRNGKey(5), cfg)
    weights_dir = Path(assets_dir) / "weights"
    if checkpoint_exists(weights_dir, "audiosr"):
        bundle = load_params(weights_dir, "audiosr", bundle)

    new_bundle = {
        **bundle,
        "vae": convert_vae(state, cfg.vae, prefix=vae_prefix),
        "unet": convert_ldm_unet(state, cfg.unet, prefix=unet_prefix),
    }
    save_params(
        weights_dir, "audiosr", new_bundle,
        meta={"family": "audiosr", "imported_from": str(checkpoint)},
    )
    n = sum(
        x.size
        for x in jax.tree_util.tree_leaves((new_bundle["vae"], new_bundle["unet"]))
    )
    return {"family": "audiosr", "name": "audiosr",
            "ldm_params": str(n), "weights_dir": str(weights_dir)}


def stage_tokenizer_json(checkpoint: Path, assets_dir: Path) -> Optional[str]:
    """Copy the checkpoint's published text tokenizer beside the engine
    weights so the runtime frontend discovers it (text/frontend.py
    load_frontend). Every LM family ships a HF-format tokenizer.json
    (Chatterbox its voice BPE, CosyVoice/Qwen3 the Qwen tokenizer) —
    the reference's models apply it internally (ref:
    cosyvoice_runner.py:87-125 raw text in, model tokenizes)."""
    src = Path(checkpoint).parent / "tokenizer.json"
    if not src.exists():
        return None
    import shutil

    dst = Path(assets_dir) / "tokenizer.json"
    if src.resolve() != dst.resolve():
        shutil.copyfile(src, dst)
    return str(dst)


def import_hf_checkpoint(
    *,
    family: str,
    checkpoint: Path,
    assets_dir: Path,
    name: Optional[str] = None,
    prefix: Optional[str] = None,
) -> Dict[str, str]:
    """Convert + graft + save an LM-stage checkpoint.

    Layout auto-detection (models/convert/published_lm.py):
    - Chatterbox T3 (separate text_emb/speech_emb/speech_head) when
      those tensors are present;
    - CosyVoice LM (speech_embedding/llm_decoder around a Qwen2
      backbone) when those are present;
    - otherwise a plain HF decoder: embed_tokens either matches the
      family's LM-core vocab exactly (speech-only synthetic
      checkpoints) or is a Qwen-style mixed [text ‖ codec] table that
      gets split at rows − core_vocab.
    Published text embeddings set the bundle's ``text_vocab`` (recorded
    in meta so the runtime rebuilds its config to match), and a
    tokenizer.json beside the checkpoint is staged for the runtime
    frontend. Returns a small report dict."""
    import dataclasses

    from vocalie_tts_tpu.models.common.weights import save_params
    from vocalie_tts_tpu.models.convert.hf_decoder import convert_hf_decoder_state
    from vocalie_tts_tpu.models.convert.published_lm import (
        convert_cosyvoice_lm_state,
        convert_t3_state,
        detect_cosyvoice_prefix,
        detect_t3_prefix,
        split_mixed_decoder_state,
    )
    from vocalie_tts_tpu.models.convert.torch_bridge import load_state_dict

    spec = _FAMILIES.get(family)
    if spec is None:
        raise ValueError(f"unknown family {family!r} (choose from {sorted(_FAMILIES)})")
    name = name or spec["default_name"]
    if name not in spec["names"]:
        raise ValueError(f"{family} accepts checkpoint names {spec['names']}, got {name!r}")

    weights_dir = Path(assets_dir) / "weights"
    state = load_state_dict(checkpoint)

    # published-layout detection → (updates dict, text_vocab)
    updates: Dict = {}
    report: Dict = {}
    t3p = detect_t3_prefix(state, prefix) if family == "chatterbox" else None
    cvp = detect_cosyvoice_prefix(state, prefix) if family == "cosyvoice" else None
    fam_cfg = _family_cfg(family)
    core_cfg = fam_cfg.lm
    if t3p is not None:
        updates, report = convert_t3_state(state, core_cfg, prefix=t3p)
    elif cvp is not None:
        updates, report = convert_cosyvoice_lm_state(state, core_cfg, prefix=cvp)
    else:
        p = prefix if prefix is not None else "model."
        emb_key = f"{p}embed_tokens.weight"
        rows = (
            int(np.asarray(state[emb_key]).shape[0]) if emb_key in state else None
        )
        if rows is not None and rows != core_cfg.vocab_size:
            updates, report = split_mixed_decoder_state(state, core_cfg, prefix=p)
        else:
            updates = {"lm": convert_hf_decoder_state(state, core_cfg, prefix=p)}
            report = {}

    text_vocab = int(report.get("text_vocab", fam_cfg.text_vocab))
    token_vocab = report.get("speech_vocab")
    _lm_cfg, bundle = _family_bundle(
        family, weights_dir, name, text_vocab=text_vocab,
        token_vocab=token_vocab,
    )
    new_bundle = {**bundle, **updates}
    meta = {"family": family, "stage": name, "text_vocab": text_vocab,
            "imported_from": str(checkpoint)}
    if token_vocab is not None:
        meta["speech_vocab" if family != "qwen3" else "codec_vocab"] = int(
            token_vocab
        )
    save_params(weights_dir, name, new_bundle, meta=meta)
    result = {"family": family, "name": name,
              "lm_params": str(sum(
                  x.size for x in jax.tree_util.tree_leaves(updates["lm"]))),
              "text_vocab": str(text_vocab),
              "weights_dir": str(weights_dir)}
    staged = stage_tokenizer_json(checkpoint, assets_dir)
    if staged:
        result["tokenizer"] = staged
    return result


__all__ = [
    "import_hf_checkpoint",
    "import_vocoder_checkpoint",
    "import_token2wav_checkpoint",
    "import_codec_decoder_checkpoint",
    "import_audiosr_checkpoint",
    "import_vits_checkpoint",
    "import_xtts_checkpoint",
    "stage_tokenizer_json",
]
