"""XTTS-class runtime: voice-clone GPT decode on resident state."""

from __future__ import annotations

import functools
import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.models.common.ar_runtime import (
    SpeakerEmbedCache,
    make_generate_fn,
    make_generate_latents_fn,
    pad_token_batch,
)
from vocalie_tts_tpu.models.common.speaker import embed_reference_audio
from vocalie_tts_tpu.models.common.weights import (
    checkpoint_exists,
    save_params,
)
from vocalie_tts_tpu.models.xtts.model import (
    BOS_VQ,
    EOS_VQ,
    N_COND_LATENTS,
    TOKENS_PER_SECOND,
    VQ_BASE,
    VQ_VOCAB,
    XTTSConfig,
    build_prompt_embeds,
    build_prompt_embeds_from_latents,
    init_vq_decoder,
    init_xtts,
    tokens_to_audio,
    vq_logit_bias,
)
from vocalie_tts_tpu.ops.kv_cache import pick_bucket, round_cache_len
from vocalie_tts_tpu.text.duration import estimate_duration
from vocalie_tts_tpu.text.phonemes import text_to_byte_ids

PROMPT_BUCKETS = (96, 160, 288, 544)   # room for the 32 cond latents
DECODE_BUCKETS = (64, 128, 256, 320)
BATCH_BUCKETS = (1, 2, 4, 8)

SCALES: Dict[str, XTTSConfig] = {
    "full": XTTSConfig(),
    "small": XTTSConfig(d_model=512, n_layers=8, n_heads=8, n_kv_heads=8, d_ff=2048),
    "tiny": XTTSConfig(
        # n_kv_heads == n_heads: the GPT-2 fused-qkv layout has no GQA
        d_model=64, n_layers=2, n_heads=4, n_kv_heads=4, d_ff=128, max_seq_len=512,
        speaker_dim=64, dtype=jnp.float32,
    ),
}


# ── published-checkpoint bundle (conditioning + latent decoder + spk) ──
#
# Present only after `vocalie-backend convert-hf xtts` imports a real
# XTTS-v2 model.pth: the GPT conditioning latents then come from the
# reference audio (ConditioningEncoder+Perceiver), and stage 2 renders
# the GPT's final-norm hidden states through the latent HiFi-GAN with
# the H/ASP d-vector — the published inference graph. Without it the
# runtime keeps the self-contained dev path (speaker x-vector prompt +
# VQ-code decoder) so random-weight mode stays fully functional.

_PUB_NAMES = ("xtts_cond", "xtts_hifi", "xtts_spk")
#: published conditioning consumes the reference in 6 s chunks and
#: averages the per-chunk latents (up to 30 s of reference audio)
_COND_CHUNK_S = 6
_COND_MAX_S = 30


def _published_configs_from_meta(meta: Dict[str, Any]):
    from vocalie_tts_tpu.models.xtts.conditioning import (
        ConditioningEncoderConfig,
        PerceiverConfig,
        XTTSConditioningConfig,
    )
    from vocalie_tts_tpu.models.xtts.hifi_decoder import HifiDecoderConfig
    from vocalie_tts_tpu.models.xtts.speaker_resnet import SpeakerResNetConfig

    c = meta["xtts_cond"]["config"]
    cond_cfg = XTTSConditioningConfig(
        encoder=ConditioningEncoderConfig(**c["encoder"]),
        perceiver=PerceiverConfig(**c["perceiver"]),
    )
    h = dict(meta["xtts_hifi"]["config"])
    for k in ("upsample_rates", "upsample_kernels", "resblock_kernels"):
        h[k] = tuple(h[k])
    hifi_cfg = HifiDecoderConfig(**h)
    s = dict(meta["xtts_spk"]["config"])
    for k in ("layers", "filters"):
        s[k] = tuple(s[k])
    spk_cfg = SpeakerResNetConfig(**s)
    return cond_cfg, hifi_cfg, spk_cfg


def save_published_bundle(weights_dir: Path, bundle: Dict[str, Any]) -> None:
    """Persist {cond,hifi,spk} params + configs (JSON-able meta)."""
    import dataclasses as _dc

    cond_cfg, hifi_cfg, spk_cfg = bundle["cond_cfg"], bundle["hifi_cfg"], bundle["spk_cfg"]

    def clean(cfg):
        d = {k: v for k, v in _dc.asdict(cfg).items() if k != "dtype"}
        return d

    save_params(weights_dir, "xtts_cond", bundle["cond"],
                meta={"family": "xtts", "stage": "conditioning",
                      "config": {"encoder": clean(cond_cfg.encoder),
                                 "perceiver": clean(cond_cfg.perceiver)}})
    save_params(weights_dir, "xtts_hifi", bundle["hifi"],
                meta={"family": "xtts", "stage": "hifi_decoder",
                      "config": clean(hifi_cfg)})
    save_params(weights_dir, "xtts_spk", bundle["spk"],
                meta={"family": "xtts", "stage": "speaker_encoder",
                      "config": clean(spk_cfg)})


def load_published_bundle(weights_dir: Path) -> Optional[Dict[str, Any]]:
    import json

    if not all(checkpoint_exists(weights_dir, n) for n in _PUB_NAMES):
        return None
    meta = json.loads((Path(weights_dir) / "meta.json").read_text(encoding="utf-8"))
    cond_cfg, hifi_cfg, spk_cfg = _published_configs_from_meta(meta)

    from vocalie_tts_tpu.models.xtts.conditioning import init_xtts_conditioning
    from vocalie_tts_tpu.models.xtts.hifi_decoder import init_hifi_decoder
    from vocalie_tts_tpu.models.xtts.speaker_resnet import init_speaker_resnet

    from vocalie_tts_tpu.models.common.weights import load_params_host

    # templates via eval_shape (no device init), host-side load, ONE
    # batched device_put — the eager per-leaf path costs a tunnel round
    # trip per leaf at cold start
    k = jax.random.PRNGKey(0)
    host = {
        "cond": load_params_host(
            weights_dir, "xtts_cond",
            jax.eval_shape(lambda: init_xtts_conditioning(k, cond_cfg))),
        "hifi": load_params_host(
            weights_dir, "xtts_hifi",
            jax.eval_shape(lambda: init_hifi_decoder(k, hifi_cfg))),
        "spk": load_params_host(
            weights_dir, "xtts_spk",
            jax.eval_shape(lambda: init_speaker_resnet(k, spk_cfg))),
    }
    return {**jax.device_put(host), "cond_cfg": cond_cfg,
            "hifi_cfg": hifi_cfg, "spk_cfg": spk_cfg}


def _check_saveable(tree):
    """Weight-int8 param trees are a runtime-only representation — refuse
    to persist them (reload templates are full-precision)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if getattr(leaf, "dtype", None) is not None and leaf.dtype.name == "int8":
            raise RuntimeError(
                "refusing to save int8-quantized weights; unset "
                "VOCALIE_WEIGHT_INT8 and re-create the runtime to save"
            )


class XTTSRuntime:
    def __init__(self, params: Dict[str, Any], cfg: XTTSConfig, weights_dir: Path,
                 published: Optional[Dict[str, Any]] = None, bpe=None):
        self.params = params
        self.cfg = cfg
        self.weights_dir = Path(weights_dir)
        self.published = published
        #: published tokenizer.json (text/bpe.py) — byte frontend otherwise
        self._bpe = bpe
        self._rng = jax.random.PRNGKey(0)
        self._generate = make_generate_fn(cfg.lm, vq_logit_bias())
        if published is not None:
            self._init_published(published)
        def _stage2_pcm16(dec, *, tokens, tok_lengths, spk_emb):
            # control-id strip + validity mask IN-GRAPH: stage 2 queues
            # right behind the decode loop with no host round trip of
            # the token buffer (~90 ms/read through the tunnel)
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            vq = jnp.clip(tokens - VQ_BASE, 0, VQ_VOCAB - 1)
            mask = (
                jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
                < tok_lengths[:, None]
            ).astype(jnp.float32)
            return to_pcm16_wire(tokens_to_audio(
                dec, cfg=cfg, vq_tokens=vq, token_mask=mask, spk_emb=spk_emb,
            ))

        self._stage2 = jax.jit(_stage2_pcm16)
        embed_jit = jax.jit(functools.partial(embed_reference_audio, cfg=cfg.speaker))

        def _embed(audio: np.ndarray, sr: int) -> np.ndarray:
            from vocalie_tts_tpu.dsp.host import resample

            if sr != cfg.sample_rate:
                audio = resample(audio, sr, cfg.sample_rate)
            audio = audio[: cfg.sample_rate * 10]
            return np.asarray(
                embed_jit(self.params["decoder"]["speaker"], audio=jnp.asarray(audio)[None])
            )[0]

        self._spk_cache = SpeakerEmbedCache(_embed, cfg.speaker_dim)

    def _init_published(self, pub: Dict[str, Any]) -> None:
        from vocalie_tts_tpu.models.xtts.conditioning import compute_cond_latents
        from vocalie_tts_tpu.models.xtts.hifi_decoder import apply_hifi_decoder
        from vocalie_tts_tpu.models.xtts.speaker_resnet import apply_speaker_resnet

        hcfg = pub["hifi_cfg"]
        self._generate_lat = make_generate_latents_fn(self.cfg.lm, vq_logit_bias())

        def _stage2_pub(hifi, latents, lengths, spk):
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            mask = jnp.arange(latents.shape[1])[None, :] < lengths[:, None]
            lat = latents * mask[..., None].astype(latents.dtype)
            return to_pcm16_wire(apply_hifi_decoder(hifi, hcfg, lat, spk))

        self._stage2_pub = jax.jit(_stage2_pub)
        self._cond_chunks = jax.jit(
            functools.partial(compute_cond_latents, cfg=pub["cond_cfg"])
        )
        self._spk_embed = jax.jit(
            functools.partial(apply_speaker_resnet, cfg=pub["spk_cfg"])
        )
        self._pub_voices: Dict[str, Any] = {}

    def _published_voice(self, voice_ref_path: Optional[str]):
        """(d-vector [512], cond latents [32, dim]) for a reference clip.

        Published semantics: conditioning latents from up to 30 s of
        reference, computed per 6 s chunk and averaged; sub-6 s refs are
        zero-padded to one chunk (delta: upstream runs the true length —
        fixed shapes keep this one compile per chunk-count). The speaker
        d-vector crops to whole seconds for the same reason."""
        pub = self.published
        dim = pub["cond_cfg"].perceiver.dim
        if not voice_ref_path:
            return (np.zeros((pub["spk_cfg"].proj_dim,), np.float32),
                    np.zeros((N_COND_LATENTS, dim), np.float32))
        key = f"{voice_ref_path}:{os.path.getmtime(voice_ref_path)}"
        if key not in self._pub_voices:
            from vocalie_tts_tpu.dsp.host import resample
            from vocalie_tts_tpu.io.refs import normalize_ref_audio

            audio, sr = normalize_ref_audio(voice_ref_path)
            a16 = resample(audio, sr, 16000)[: 16000 * _COND_MAX_S]
            a16 = a16[: max(16000, (len(a16) // 16000) * 16000)]
            if len(a16) < 16000:
                a16 = np.pad(a16, (0, 16000 - len(a16)))
            dvec = np.asarray(
                self._spk_embed(pub["spk"], audio=jnp.asarray(a16)[None])
            )[0]
            a22 = resample(audio, sr, 22050)[: 22050 * _COND_MAX_S]
            chunk = 22050 * _COND_CHUNK_S
            if len(a22) < chunk:
                a22 = np.pad(a22, (0, chunk - len(a22)))
            n_chunks = len(a22) // chunk
            chunks = a22[: n_chunks * chunk].reshape(n_chunks, chunk)
            lats = np.asarray(
                self._cond_chunks(pub["cond"], audio_22k=jnp.asarray(chunks))
            ).mean(axis=0)
            self._pub_voices[key] = (dvec.astype(np.float32),
                                     lats.astype(np.float32))
        return self._pub_voices[key]

    @classmethod
    def create(cls, assets_dir: Path, force_init: bool = False) -> "XTTSRuntime":
        cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
        from vocalie_tts_tpu.models.common.ar_runtime import apply_runtime_env

        cfg = apply_runtime_env(cfg)
        weights_dir = Path(assets_dir) / "weights"
        k = jax.random.PRNGKey(23)
        # ONE jitted init → overlay → quantize program (see
        # weights.materialize_bundle — cold-start tunnel round trips)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_quantize_lm
        from vocalie_tts_tpu.models.common.weights import materialize_bundle

        params = materialize_bundle(
            weights_dir,
            [
                ("gpt", "gpt", lambda: init_xtts(k, cfg)),
                ("decoder", "vq_decoder",
                 lambda: init_vq_decoder(jax.random.fold_in(k, 1), cfg)),
            ],
            transform=lambda parts: {**parts,
                                     "gpt": maybe_quantize_lm(parts["gpt"])},
            force_init=force_init,
        )
        gpt, decoder = params["gpt"], params["decoder"]
        published = None if force_init else load_published_bundle(weights_dir)
        if published is not None and published["cond_cfg"].perceiver.dim != cfg.d_model:
            # e.g. a full-size imported bundle under VOCALIE_MODEL_SCALE=tiny —
            # the cond latents must match the LM width to enter the prompt
            import logging

            logging.getLogger("vocalie.xtts").warning(
                "published bundle dim %d != model scale dim %d — using dev path",
                published["cond_cfg"].perceiver.dim, cfg.d_model,
            )
            published = None
        from vocalie_tts_tpu.text.bpe import load_bpe_if_present

        bpe = None if force_init else load_bpe_if_present(assets_dir)
        if bpe is not None and bpe.vocab_size > cfg.text_vocab:
            import logging

            logging.getLogger("vocalie.xtts").warning(
                "tokenizer.json vocab %d exceeds text embedding rows %d — "
                "using byte frontend", bpe.vocab_size, cfg.text_vocab,
            )
            bpe = None
        return cls({"gpt": gpt, "decoder": decoder}, cfg, weights_dir, published,
                   bpe=bpe)

    def save_weights(self) -> None:
        _check_saveable(self.params)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_unfuse_lm

        save_params(self.weights_dir, "gpt",
                    maybe_unfuse_lm(self.params["gpt"], self.cfg.lm),
                    meta={"family": "xtts"})
        save_params(
            self.weights_dir, "vq_decoder", self.params["decoder"],
            meta={"family": "xtts", "stage": "vq_decoder"},
        )
        if self.published is not None:
            save_published_bundle(self.weights_dir, self.published)

    def warmup(self) -> None:
        # warmup needs no real reference — zero embedding / zero latents
        if self.published is not None:
            self._decode_published(
                ["Préchauffage du moteur."], None, language="fr",
                temperature=0.65, repetition_penalty=2.0, top_k=50, top_p=0.85,
            )
        else:
            self._decode(["Préchauffage du moteur."],
                         np.zeros((self.cfg.speaker_dim,), np.float32),
                         language="fr", temperature=0.65, repetition_penalty=2.0,
                         top_k=50, top_p=0.85)

    def synthesize(self, text: str, **kwargs) -> Tuple[np.ndarray, int, Dict[str, Any]]:
        return self.synthesize_batch([text], **kwargs)[0]

    def synthesize_batch(
        self,
        texts: List[str],
        *,
        language: Optional[str] = "fr",
        voice_ref_path: Optional[str] = None,
        temperature: float = 0.65,
        repetition_penalty: float = 2.0,
        top_k: int = 50,
        top_p: float = 0.85,
        speed: float = 1.0,
        progress_cb=None,
        **_ignored,
    ) -> List[Tuple[np.ndarray, int, Dict[str, Any]]]:
        t0 = time.monotonic()
        if self.published is not None:
            results = self._decode_published(
                texts, voice_ref_path, language=language, temperature=temperature,
                repetition_penalty=repetition_penalty, top_k=top_k, top_p=top_p,
            )
        else:
            spk = self._spk_cache.get(voice_ref_path)
            results = self._decode(
                texts, spk, language=language, temperature=temperature,
                repetition_penalty=repetition_penalty, top_k=top_k, top_p=top_p,
            )
        elapsed = time.monotonic() - t0
        out = []
        for i, (audio, sr, meta) in enumerate(results):
            if speed and speed != 1.0:
                from vocalie_tts_tpu.dsp.host import resample

                # time-stretch by resampling (pitch-affecting, like the
                # reference engine's speed knob)
                audio = resample(audio, int(sr * speed), sr)
            meta["elapsed_ms_batch"] = round(elapsed * 1000, 1)
            out.append((audio, sr, meta))
            if progress_cb:
                progress_cb((i + 1) / len(results))
        return out

    def _prepare_prompt(self, texts, language):
        if self._bpe is not None:
            seqs = [self._bpe.encode(t, language) for t in texts]
        else:
            lang_tag = f"[{language or 'fr'}]"
            seqs = [
                text_to_byte_ids(f"{lang_tag}{t}", add_bos=True, add_eos=False)
                for t in texts
            ]
        tokens, lengths, prompt_bucket, batch_bucket = pad_token_batch(
            seqs,
            prompt_buckets=PROMPT_BUCKETS,
            batch_buckets=BATCH_BUCKETS,
            extra_positions=N_COND_LATENTS + 1,
        )
        est_tokens = max(
            int(estimate_duration(t) * TOKENS_PER_SECOND * 1.8) + 16 for t in texts
        )
        decode_bucket = pick_bucket(est_tokens, DECODE_BUCKETS)
        return tokens, lengths, prompt_bucket, batch_bucket, decode_bucket

    def _decode(self, texts, spk, *, language, temperature, repetition_penalty,
                top_k, top_p):
        cfg = self.cfg
        tokens, lengths, prompt_bucket, batch_bucket, decode_bucket = (
            self._prepare_prompt(texts, language)
        )
        cache_len = round_cache_len(prompt_bucket + decode_bucket)

        spk_b = jnp.asarray(np.tile(np.asarray(spk, np.float32)[None], (batch_bucket, 1)))
        embeds = build_prompt_embeds(self.params["gpt"], cfg, jnp.asarray(tokens), spk_b)

        self._rng, sub = jax.random.split(self._rng)
        out_tokens, tok_lengths = self._generate(
            self.params["gpt"]["lm"],
            embeds,
            jnp.asarray(lengths),
            sub,
            cache_len=cache_len,
            max_new=decode_bucket,
            eos_token_id=EOS_VQ,
            temperature=float(temperature),
            top_k=int(top_k),
            top_p=float(top_p),
            repetition_penalty=float(repetition_penalty),
            first_token=BOS_VQ,
        )
        # stage 2 queues directly behind decode; ONE host read returns
        # audio and token lengths together (tunnel: ~90 ms/read)
        from vocalie_tts_tpu.models.common.ar_runtime import from_pcm16_wire

        audio_dev = self._stage2(
            self.params["decoder"], tokens=out_tokens, tok_lengths=tok_lengths,
            spk_emb=spk_b.astype(jnp.float32),
        )
        audio_wire, tok_lengths = jax.device_get((audio_dev, tok_lengths))
        audio = from_pcm16_wire(audio_wire)
        tok_lengths = np.asarray(tok_lengths)
        samples_per_token = cfg.token_upsample * cfg.vocoder.hop
        results = []
        for i in range(len(texts)):
            n = int(tok_lengths[i]) * samples_per_token
            meta = {
                "engine": "xtts",
                "vq_tokens": int(tok_lengths[i]),
                "prompt_bucket": prompt_bucket,
                "decode_bucket": decode_bucket,
            }
            results.append((audio[i, :n], cfg.sample_rate, meta))
        return results

    def _decode_published(self, texts, voice_ref_path, *, language, temperature,
                          repetition_penalty, top_k, top_p):
        """Published-checkpoint inference: conditioning latents from the
        reference audio; stage 2 renders the decode loop's final-norm
        hidden states through the latent HiFi-GAN (+1 extra decode step
        so the last token's latent exists — the cache is sized for it).
        Two host reads per batch: lengths ride with the audio."""
        cfg = self.cfg
        pub = self.published
        hcfg = pub["hifi_cfg"]
        dvec, cond = self._published_voice(voice_ref_path)
        tokens, lengths, prompt_bucket, batch_bucket, decode_bucket = (
            self._prepare_prompt(texts, language)
        )
        cache_len = round_cache_len(prompt_bucket + decode_bucket + 1)

        cond_b = jnp.asarray(np.tile(cond[None], (batch_bucket, 1, 1)))
        embeds = build_prompt_embeds_from_latents(
            self.params["gpt"], cfg, jnp.asarray(tokens), cond_b
        )
        self._rng, sub = jax.random.split(self._rng)
        out_tokens, tok_lengths, hidden = self._generate_lat(
            self.params["gpt"]["lm"],
            embeds,
            jnp.asarray(lengths),
            sub,
            cache_len=cache_len,
            max_new=decode_bucket,
            eos_token_id=EOS_VQ,
            temperature=float(temperature),
            top_k=int(top_k),
            top_p=float(top_p),
            repetition_penalty=float(repetition_penalty),
            first_token=BOS_VQ,
        )
        spk_b = jnp.asarray(np.tile(dvec[None], (batch_bucket, 1)))
        # token i's latent is hidden[:, i+1] (input-aligned, matching the
        # published teacher-forced return_latent pass)
        wire = self._stage2_pub(pub["hifi"], hidden[:, 1:], tok_lengths, spk_b)
        from vocalie_tts_tpu.models.common.ar_runtime import from_pcm16_wire

        tok_lengths, wire_np = jax.device_get((tok_lengths, wire))
        audio = from_pcm16_wire(wire_np)
        tok_lengths = np.asarray(tok_lengths)
        spt = hcfg.latent_upsample * hcfg.output_sr / hcfg.input_sr  # frames/token
        results = []
        for i in range(len(texts)):
            n = min(int(int(tok_lengths[i]) * spt) * hcfg.vocoder.hop, audio.shape[1])
            meta = {
                "engine": "xtts",
                "mode": "published",
                "vq_tokens": int(tok_lengths[i]),
                "prompt_bucket": prompt_bucket,
                "decode_bucket": decode_bucket,
            }
            results.append((audio[i, :n], hcfg.output_sr, meta))
        return results


__all__ = [
    "XTTSRuntime",
    "SCALES",
    "save_published_bundle",
    "load_published_bundle",
]
