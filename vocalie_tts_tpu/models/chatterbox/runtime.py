"""Chatterbox-class engine runtime: batched CFG decode on resident state.

Execution model per script (N chunks):
  1. byte-tokenize chunks, pad into (batch, prompt) buckets;
  2. ONE prefill over the doubled CFG batch [cond; uncond];
  3. ONE jitted while_loop decode for every chunk simultaneously;
  4. ONE stage-2 token→waveform call;
This replaces the reference's N sequential venv subprocesses with
model reload per chunk (ref: tts_backends/base_runner.py:278-332,
SURVEY §2.8 "the reference's dominant latency cost").

Also re-implements the quality-retry intent (regenerate too-short
audio with nudged cfg/temperature — ref: chatterbox_runner.py:89-107,
whose original implementation was unreachable due to a method-name
bug; SURVEY notes to replicate the intent, not the bug).
"""

from __future__ import annotations

import functools
import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.models.chatterbox.model import (
    TOKENS_PER_SECOND,
    T3Config,
    build_prompt_embeds,
    init_t3,
    init_token_decoder,
    speech_logit_bias,
    tokens_to_audio,
)
from vocalie_tts_tpu.models.common.speaker import embed_reference_audio
from vocalie_tts_tpu.models.common.transformer import decode_step, prefill
from vocalie_tts_tpu.models.common.weights import (
    checkpoint_exists,
    save_params,
)
from vocalie_tts_tpu.ops.generate import GenerateConfig, generate_tokens
from vocalie_tts_tpu.ops.kv_cache import pick_bucket, round_cache_len
from vocalie_tts_tpu.text.duration import estimate_duration
from vocalie_tts_tpu.text.frontend import load_frontend

PROMPT_BUCKETS = (64, 128, 256, 512)
DECODE_BUCKETS = (64, 128, 256, 320)
BATCH_BUCKETS = (1, 2, 4, 8)

#: model scales — "full" matches the published Chatterbox T3 scale
#: (~0.5B params); smaller scales serve CI and CPU tests.
SCALES: Dict[str, T3Config] = {
    "full": T3Config(),
    "small": T3Config(
        d_model=512, n_layers=8, n_heads=8, n_kv_heads=8, d_ff=2048,
        t2w_scale="small",
    ),
    "tiny": T3Config(
        d_model=64, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=128, max_seq_len=512,
        t2w_scale="tiny", dtype=jnp.float32,
    ),
}


def _scale_from_env() -> str:
    return os.environ.get("VOCALIE_MODEL_SCALE", "full")


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


class ChatterboxRuntime:
    def __init__(self, params: Dict[str, Any], cfg: T3Config, weights_dir: Path,
                 frontend=None) -> None:
        self.params = params  # {"t3": ..., "t3_fr": ..., "decoder": ...}
        self.cfg = cfg
        self.weights_dir = Path(weights_dir)
        #: text frontend — published tokenizer.json when staged beside
        #: converted weights, UTF-8 byte ids otherwise (text/frontend.py)
        self._frontend = frontend or load_frontend(
            self.weights_dir.parent, style="voicebpe", text_vocab=cfg.text_vocab
        )
        self._rng = jax.random.PRNGKey(0)
        self._spk_cache: Dict[str, np.ndarray] = {}

        lm_cfg = cfg.lm
        logit_bias = speech_logit_bias(cfg)

        def _lm_decode_step(lm_params, tok, caches, cond_vec):
            logits, caches = decode_step(lm_params, lm_cfg, tok, caches)
            return logits + logit_bias[None, :], caches

        @functools.partial(
            jax.jit, static_argnames=("cache_len", "max_new", "temperature",
                                      "cfg_weight", "repetition_penalty")
        )
        def _generate(
            t3, embeds, prompt_lengths, rng,
            *, cache_len: int, max_new: int, temperature: float,
            cfg_weight: float, repetition_penalty: float,
        ):
            b2 = embeds.shape[0]
            dummy_tokens = jnp.zeros(embeds.shape[:2], jnp.int32)
            _logits, caches = prefill(
                t3["lm"], lm_cfg, dummy_tokens, prompt_lengths,
                inputs_embeds=embeds, cache_len=cache_len,
            )
            first = jnp.full((b2 // 2 if cfg_weight > 0 else b2,), cfg.bos_speech, jnp.int32)
            gen = GenerateConfig(
                max_new_tokens=max_new,
                eos_token_id=cfg.eos_speech,
                temperature=temperature,
                repetition_penalty=repetition_penalty,
                cfg_weight=cfg_weight,
                vocab_size=cfg.lm.vocab_size,
            )
            return generate_tokens(t3["lm"], _lm_decode_step, caches, first, rng, gen)

        self._generate = _generate

        def _stage2_pcm16(dec, *, tokens, tok_lengths, xvec_emb, rng):
            # control-id strip + validity mask computed IN-GRAPH so stage
            # 2 queues right behind the decode loop — no host round trip
            # of the token buffer between the stages (each separate sync
            # costs ~90 ms through the tunnel; the session's only host
            # read is the final audio)
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            speech = jnp.clip(tokens, 0, cfg.speech_vocab - 1)
            mask = (
                jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
                < tok_lengths[:, None]
            ).astype(jnp.float32)
            return to_pcm16_wire(tokens_to_audio(
                dec, cfg=cfg, speech_tokens=speech, token_mask=mask,
                xvec_emb=xvec_emb, rng=rng,
            ))

        self._stage2 = jax.jit(_stage2_pcm16)
        self._embed_ref = jax.jit(
            functools.partial(embed_reference_audio, cfg=cfg.speaker)
        )
        self._embed_xvec = jax.jit(
            functools.partial(embed_reference_audio, cfg=cfg.xvector)
        )

    # ── lifecycle ───────────────────────────────────────────────────────

    @classmethod
    def create(cls, assets_dir: Path, force_init: bool = False) -> "ChatterboxRuntime":
        import dataclasses

        cfg = SCALES[_scale_from_env()]
        from vocalie_tts_tpu.models.common.ar_runtime import apply_runtime_env
        from vocalie_tts_tpu.models.common.weights import load_meta

        cfg = apply_runtime_env(cfg)
        weights_dir = Path(assets_dir) / "weights"
        # converted checkpoints record their text embedding rows (the
        # published tokenizer vocabulary) — shapes must match BEFORE init
        if not force_init:
            meta = load_meta(weights_dir, "t3")
            tv = int(meta.get("text_vocab", cfg.text_vocab))
            sv = int(meta.get("speech_vocab", cfg.speech_vocab))
            if (tv, sv) != (cfg.text_vocab, cfg.speech_vocab):
                cfg = dataclasses.replace(cfg, text_vocab=tv, speech_vocab=sv)
        k = jax.random.PRNGKey(7)

        # Checkpoints load on the HOST against eval_shape templates (no
        # device init when a checkpoint exists); the whole init →
        # FR overlay → quantize/fuse chain then runs as ONE jitted,
        # cache-persistable program — eager per-leaf tree transforms
        # measured 3.5 min of tunnel round trips (round-4 verdict #3).
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_quantize_lm
        from vocalie_tts_tpu.models.common.weights import (
            load_params_host,
            materialize_params,
        )

        def _have(name: str) -> bool:
            return not force_init and checkpoint_exists(weights_dir, name)

        t3_tpl = jax.eval_shape(lambda key: init_t3(key, cfg), k)
        t3_host = load_params_host(weights_dir, "t3", t3_tpl) if _have("t3") else None
        dec_host = (
            load_params_host(
                weights_dir, "s3gen",
                jax.eval_shape(lambda key: init_token_decoder(key, cfg), k),
            )
            if _have("s3gen") else None
        )
        # FR fine-tune: overlay on the T3 stage only (mirrors the
        # reference's safetensors T3 overlay).
        fr_host = (
            load_params_host(weights_dir, "t3_fr", t3_tpl)
            if checkpoint_exists(weights_dir, "t3_fr") else None
        )

        def _build(key, t3_in, dec_in, fr_in):
            t3 = t3_in if t3_in is not None else init_t3(key, cfg)
            dec = (
                dec_in if dec_in is not None
                else init_token_decoder(jax.random.fold_in(key, 1), cfg)
            )
            out = {"t3": maybe_quantize_lm(t3), "decoder": dec}
            if fr_in is not None:
                out["t3_fr"] = maybe_quantize_lm(fr_in)
            return out

        params = dict(materialize_params(_build, k, t3_host, dec_host, fr_host))
        if "t3_fr" not in params:
            params["t3_fr"] = params["t3"]  # no overlay: share the tree
        return cls(params, cfg, weights_dir)

    def save_weights(self) -> None:
        _check_saveable(self.params)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_unfuse_lm

        save_params(self.weights_dir, "t3",
                    maybe_unfuse_lm(self.params["t3"], self.cfg.lm),
                    meta={"family": "chatterbox", "stage": "t3",
                          "text_vocab": self.cfg.text_vocab,
                          "speech_vocab": self.cfg.speech_vocab})
        save_params(self.weights_dir, "s3gen", self.params["decoder"],
                    meta={"family": "chatterbox", "stage": "s3gen"})

    def warmup(self) -> None:
        self.synthesize("Bonjour, préchauffage du moteur.", mode="fr_finetune")

    # ── speaker conditioning ────────────────────────────────────────────

    def _speaker_embedding(self, voice_ref_path: Optional[str]) -> np.ndarray:
        """T3 voice-encoder conditioning (256-dim)."""
        return self._ref_embedding(
            voice_ref_path, "ve", self._embed_ref, "speaker", self.cfg.speaker_dim
        )

    def _xvector_embedding(self, voice_ref_path: Optional[str]) -> np.ndarray:
        """S3Gen x-vector (192-dim, the flow's spk_embed_affine input)."""
        from vocalie_tts_tpu.models.chatterbox.model import XVECTOR_DIM

        return self._ref_embedding(
            voice_ref_path, "xv", self._embed_xvec, "xvector", XVECTOR_DIM
        )

    def _ref_embedding(self, voice_ref_path, tag, embed_fn, param_key, dim) -> np.ndarray:
        if not voice_ref_path:
            return np.zeros((dim,), np.float32)
        key = f"{tag}:{voice_ref_path}:{os.path.getmtime(voice_ref_path)}"
        if key in self._spk_cache:
            return self._spk_cache[key]
        from vocalie_tts_tpu.dsp.host import resample
        from vocalie_tts_tpu.io.wavio import read_wav

        audio, sr = read_wav(voice_ref_path)
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        if sr != self.cfg.sample_rate:
            audio = resample(audio, sr, self.cfg.sample_rate)
        audio = audio[: self.cfg.sample_rate * 10]  # 10 s of reference is plenty
        emb = np.asarray(embed_fn(self.params["decoder"][param_key],
                                  audio=jnp.asarray(audio)[None, :]))[0]
        self._spk_cache[key] = emb
        return emb

    # ── synthesis ───────────────────────────────────────────────────────

    def synthesize(self, text: str, **kwargs) -> Tuple[np.ndarray, int, Dict[str, Any]]:
        return self.synthesize_batch([text], **kwargs)[0]

    def synthesize_batch(
        self,
        texts: List[str],
        *,
        mode: str = "fr_finetune",
        lang: Optional[str] = None,
        voice_ref_path: Optional[str] = None,
        exaggeration: float = 0.5,
        cfg_weight: float = 0.6,
        temperature: float = 0.5,
        repetition_penalty: float = 1.35,
        progress_cb=None,
        _retry: bool = True,
    ) -> List[Tuple[np.ndarray, int, Dict[str, Any]]]:
        t0 = time.monotonic()
        results = self._decode_batch(
            texts,
            mode=mode,
            lang=lang,
            voice_ref_path=voice_ref_path,
            exaggeration=exaggeration,
            cfg_weight=cfg_weight,
            temperature=temperature,
            repetition_penalty=repetition_penalty,
        )
        # Quality retry (intent of ref: chatterbox_runner.py:89-107):
        # long text that produced suspiciously short audio is retried
        # once with +0.05 CFG / −0.05 temperature; keep the longer take.
        if _retry:
            retry_idx = [
                i
                for i, (audio, sr, _m) in enumerate(results)
                if len(texts[i]) > 80 and len(audio) / sr < 1.2
            ]
            if retry_idx:
                retry_out = self._decode_batch(
                    [texts[i] for i in retry_idx],
                    mode=mode,
                    lang=lang,
                    voice_ref_path=voice_ref_path,
                    exaggeration=exaggeration,
                    cfg_weight=min(cfg_weight + 0.05, 1.0),
                    temperature=max(temperature - 0.05, 0.05),
                    repetition_penalty=repetition_penalty,
                )
                for j, i in enumerate(retry_idx):
                    old_audio = results[i][0]
                    new_audio, sr, meta = retry_out[j]
                    if len(new_audio) > len(old_audio):
                        meta = dict(meta)
                        meta["retry"] = True
                        results[i] = (new_audio, sr, meta)
        elapsed = time.monotonic() - t0
        out = []
        for i, (audio, sr, meta) in enumerate(results):
            meta = dict(meta)
            meta["elapsed_ms_batch"] = round(elapsed * 1000, 1)
            out.append((audio, sr, meta))
            if progress_cb:
                progress_cb((i + 1) / len(results))
        return out

    def _prepare_batch(
        self,
        texts: List[str],
        *,
        mode: str,
        lang: Optional[str],
        voice_ref_path: Optional[str],
        exaggeration: float,
        cfg_weight: float,
    ):
        """Tokenize, bucket and build the CFG-doubled prompt embeds.

        Returns ``(t3, embeds, prompt_lengths, buckets)`` where
        ``buckets = (batch_bucket, prompt_bucket, decode_bucket,
        cache_len)``. Split out of :meth:`_decode_batch` so the VO
        stage-split profiler (scripts/profile_vo.py) measures the exact
        production prep instead of a drifting copy.
        """
        cfg = self.cfg
        t3 = self.params["t3_fr"] if mode == "fr_finetune" else self.params["t3"]

        front = self._frontend
        fr_lang = (lang or "fr").split("-")[0].lower()
        token_seqs = [front.bos_ids + front.encode(t, fr_lang) for t in texts]
        prompt_lens = [len(s) + 3 for s in token_seqs]  # +2 cond slots +BOS
        prompt_bucket = pick_bucket(max(prompt_lens), PROMPT_BUCKETS)
        batch_bucket = pick_bucket(len(texts), BATCH_BUCKETS)

        # decode budget from the 2.6-wps speech-rate model, with margin
        est_tokens = max(
            int(estimate_duration(t) * TOKENS_PER_SECOND * 1.8) + 16 for t in texts
        )
        decode_bucket = pick_bucket(est_tokens, DECODE_BUCKETS)
        cache_len = round_cache_len(prompt_bucket + decode_bucket)

        text_tokens = np.zeros((batch_bucket, prompt_bucket - 3), np.int32)
        lengths = np.zeros((batch_bucket,), np.int32)
        for i, s in enumerate(token_seqs):
            s = s[: prompt_bucket - 3]
            text_tokens[i, : len(s)] = s
            lengths[i] = len(s) + 3
        lengths[len(token_seqs):] = 3  # empty rows: cond slots + BOS only

        spk = self._speaker_embedding(voice_ref_path)
        spk_b = jnp.asarray(np.tile(spk[None, :], (batch_bucket, 1)))
        exag_b = jnp.full((batch_bucket,), float(exaggeration), jnp.float32)

        use_cfg = cfg_weight > 0
        tt = jnp.asarray(text_tokens)
        embeds_cond = build_prompt_embeds(t3, cfg, tt, spk_b, exag_b)
        if use_cfg:
            embeds_uncond = build_prompt_embeds(
                t3, cfg, tt, jnp.zeros_like(spk_b), jnp.zeros_like(exag_b)
            )
            embeds = jnp.concatenate([embeds_cond, embeds_uncond], axis=0)
            prompt_lengths = jnp.concatenate(
                [jnp.asarray(lengths), jnp.asarray(lengths)]
            )
        else:
            embeds = embeds_cond
            prompt_lengths = jnp.asarray(lengths)
        buckets = (batch_bucket, prompt_bucket, decode_bucket, cache_len)
        return t3, embeds, prompt_lengths, buckets

    def _decode_batch(
        self,
        texts: List[str],
        *,
        mode: str,
        lang: Optional[str],
        voice_ref_path: Optional[str],
        exaggeration: float,
        cfg_weight: float,
        temperature: float,
        repetition_penalty: float,
    ) -> List[Tuple[np.ndarray, int, Dict[str, Any]]]:
        from vocalie_tts_tpu.utils.trace import mark_phase

        tp = time.monotonic()
        cfg = self.cfg
        use_cfg = cfg_weight > 0
        t3, embeds, prompt_lengths, buckets = self._prepare_batch(
            texts, mode=mode, lang=lang, voice_ref_path=voice_ref_path,
            exaggeration=exaggeration, cfg_weight=cfg_weight,
        )
        batch_bucket, prompt_bucket, decode_bucket, cache_len = buckets

        tp = mark_phase(f"vo-prep+embeds (b={batch_bucket}, prompt={prompt_bucket})", tp)
        self._rng, sub = jax.random.split(self._rng)
        tokens, tok_lengths = self._generate(
            t3,
            embeds,
            prompt_lengths,
            sub,
            cache_len=cache_len,
            max_new=decode_bucket,
            temperature=float(temperature),
            cfg_weight=float(cfg_weight) if use_cfg else 0.0,
            repetition_penalty=float(repetition_penalty),
        )

        # stage 2 queues directly behind the decode loop (token strip +
        # mask are in-graph); ONE host read at the end returns audio AND
        # token lengths together — the decode→stage2 boundary never
        # syncs (each separate host read costs ~90 ms via the tunnel)
        tp = mark_phase(
            f"vo-decode-dispatch (cache={cache_len}, max_new={decode_bucket})", tp
        )
        xv = self._xvector_embedding(voice_ref_path)
        xv_b = jnp.asarray(np.tile(xv[None, :], (int(tokens.shape[0]), 1)))
        self._rng, s2_rng = jax.random.split(self._rng)
        from vocalie_tts_tpu.models.common.ar_runtime import from_pcm16_wire

        audio_dev = self._stage2(
            self.params["decoder"], tokens=tokens, tok_lengths=tok_lengths,
            xvec_emb=xv_b, rng=s2_rng,
        )
        audio_wire, tok_lengths = jax.device_get((audio_dev, tok_lengths))
        audio = from_pcm16_wire(audio_wire)
        tok_lengths = np.asarray(tok_lengths)
        tp = mark_phase(f"vo-decode+stage2+audio-read ({audio.shape})", tp)

        samples_per_token = cfg.samples_per_token
        results = []
        for i in range(len(texts)):
            n = int(tok_lengths[i]) * samples_per_token
            meta = {
                "engine": "chatterbox",
                "mode": mode,
                "speech_tokens": int(tok_lengths[i]),
                "prompt_bucket": prompt_bucket,
                "decode_bucket": decode_bucket,
                "cfg_weight": cfg_weight,
            }
            results.append((audio[i, :n], cfg.sample_rate, meta))
        return results


__all__ = ["ChatterboxRuntime", "SCALES"]
