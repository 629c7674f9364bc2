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
    pad_token_batch,
)
from vocalie_tts_tpu.models.common.speaker import embed_reference_audio
from vocalie_tts_tpu.models.common.weights import (
    checkpoint_exists,
    load_params,
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
    def __init__(self, params: Dict[str, Any], cfg: XTTSConfig, weights_dir: Path):
        self.params = params
        self.cfg = cfg
        self.weights_dir = Path(weights_dir)
        self._rng = jax.random.PRNGKey(0)
        self._generate = make_generate_fn(cfg.lm, vq_logit_bias())
        def _stage2_pcm16(dec, **kw):
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            return to_pcm16_wire(tokens_to_audio(dec, cfg=cfg, **kw))

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

    @classmethod
    def create(cls, assets_dir: Path, force_init: bool = False) -> "XTTSRuntime":
        cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
        from vocalie_tts_tpu.models.common.ar_runtime import apply_runtime_env

        cfg = apply_runtime_env(cfg)
        weights_dir = Path(assets_dir) / "weights"
        k = jax.random.PRNGKey(23)
        gpt = init_xtts(k, cfg)
        decoder = init_vq_decoder(jax.random.fold_in(k, 1), cfg)
        if not force_init and checkpoint_exists(weights_dir, "gpt"):
            gpt = load_params(weights_dir, "gpt", gpt)
        if not force_init and checkpoint_exists(weights_dir, "vq_decoder"):
            decoder = load_params(weights_dir, "vq_decoder", decoder)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_quantize_lm

        gpt = maybe_quantize_lm(gpt)
        return cls({"gpt": gpt, "decoder": decoder}, cfg, weights_dir)

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

    def warmup(self) -> None:
        # warmup needs no real reference — zero embedding
        self._decode(["Préchauffage du moteur."], np.zeros((self.cfg.speaker_dim,), np.float32),
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

    def _decode(self, texts, spk, *, language, temperature, repetition_penalty,
                top_k, top_p):
        cfg = self.cfg
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
        # one host round trip for both outputs (tunnel: ~90 ms/read)
        tokens_np, tok_lengths = jax.device_get((out_tokens, tok_lengths))
        tokens_np = np.asarray(tokens_np)
        tok_lengths = np.asarray(tok_lengths)
        vq = np.clip(tokens_np - VQ_BASE, 0, VQ_VOCAB - 1).astype(np.int32)
        mask = (
            np.arange(tokens_np.shape[1])[None, :] < tok_lengths[:, None]
        ).astype(np.float32)
        from vocalie_tts_tpu.models.common.ar_runtime import from_pcm16_wire

        audio = from_pcm16_wire(
            self._stage2(
                self.params["decoder"],
                vq_tokens=jnp.asarray(vq),
                token_mask=jnp.asarray(mask),
                spk_emb=spk_b.astype(jnp.float32),
            )
        )
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


__all__ = ["XTTSRuntime", "SCALES"]
