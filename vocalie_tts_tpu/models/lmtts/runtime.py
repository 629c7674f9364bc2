"""Qwen3-TTS-class runtime: three conditioning modes on one resident LM.

Mode → prompt recipe (capability parity with ref: qwen3_runner.py:113-144):
- custom_voice: speaker-table embedding in the speaker slot;
- voice_design: instruction text prepended (SEP-joined) + neutral slot;
- voice_clone: x-vector from reference audio in the speaker slot,
  optional transcript prepended (x_vector_only skips the transcript).
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

from vocalie_tts_tpu.models.common.ar_runtime import (
    SpeakerEmbedCache,
    make_generate_fn,
    pad_token_batch,
)
from vocalie_tts_tpu.models.common.speaker import embed_reference_audio
from vocalie_tts_tpu.models.common.weights import save_params
from vocalie_tts_tpu.models.lmtts.model import (
    SPEAKERS,
    TOKENS_PER_SECOND,
    LMTTSConfig,
    build_prompt_embeds,
    codec_logit_bias,
    init_codec_decoder,
    init_lmtts,
    lang_one_hot,
    tokens_to_audio,
)
from vocalie_tts_tpu.ops.kv_cache import pick_bucket, round_cache_len
from vocalie_tts_tpu.text.duration import estimate_duration
from vocalie_tts_tpu.text.frontend import build_prompt_ids, load_frontend

PROMPT_BUCKETS = (64, 128, 256, 512)
DECODE_BUCKETS = (32, 64, 128, 192)
BATCH_BUCKETS = (1, 2, 4, 8)

SCALES: Dict[str, LMTTSConfig] = {
    "full": LMTTSConfig(),
    "small": LMTTSConfig(d_model=512, n_layers=8, n_heads=8, n_kv_heads=4, d_ff=2048),
    "tiny": LMTTSConfig(
        d_model=64, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=128, max_seq_len=512,
        dtype=jnp.float32,
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


class LMTTSRuntime:
    def __init__(self, params: Dict[str, Any], cfg: LMTTSConfig, weights_dir: Path,
                 frontend=None, mesh=None):
        self.params = params  # {"lm_bundle", "decoder"}
        self.cfg = cfg
        #: serving mesh (VOCALIE_SERVE_MESH) — None = single chip.
        #: With a mesh, params are placed with the Megatron TP rules at
        #: create() and every request's batch inputs commit via
        #: shard_generate_inputs, so the SAME jitted generate program
        #: (prefill + sampling while_loop + bucketed KV) compiles SPMD.
        self.mesh = mesh
        self.weights_dir = Path(weights_dir)
        #: text frontend — published tokenizer.json (the checkpoint's
        #: Qwen tokenizer) when staged, UTF-8 byte ids otherwise
        self._frontend = frontend or load_frontend(
            self.weights_dir.parent, style="raw", text_vocab=cfg.text_vocab
        )
        self._rng = jax.random.PRNGKey(0)
        self._generate = make_generate_fn(cfg.lm, codec_logit_bias(cfg))

        def _stage2_pcm16(dec, *, tokens, tok_lengths):
            # control-id strip + validity mask IN-GRAPH: stage 2 queues
            # right behind the decode loop with no host round trip of
            # the token buffer (~90 ms/read through the tunnel); the
            # session's only host read is the final audio
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            codec = jnp.clip(tokens, 0, cfg.codec_vocab - 1)
            mask = (
                jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
                < tok_lengths[:, None]
            ).astype(jnp.float32)
            return to_pcm16_wire(tokens_to_audio(
                dec, cfg=cfg, codec_tokens=codec, token_mask=mask,
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

    @classmethod
    def create(cls, assets_dir: Path, force_init: bool = False) -> "LMTTSRuntime":
        import dataclasses

        cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
        from vocalie_tts_tpu.models.common.ar_runtime import apply_runtime_env
        from vocalie_tts_tpu.models.common.weights import load_meta

        cfg = apply_runtime_env(cfg)
        from vocalie_tts_tpu.parallel.serve import serve_mesh_from_env

        mesh = serve_mesh_from_env()
        if mesh is not None and (cfg.decode_kernel or cfg.dense_kernel):
            # The Pallas decode kernels are single-chip programs (their
            # DMA/index maps address one chip's HBM); under a serving
            # mesh the XLA dense path compiles SPMD instead. shard_map
            # wrapping of the kernels is the future path to both.
            import logging

            logging.getLogger("vocalie_parallel").info(
                "serve mesh active: Pallas decode kernels disabled "
                "(XLA SPMD dense path)"
            )
            cfg = dataclasses.replace(cfg, decode_kernel=False, dense_kernel=False)
        weights_dir = Path(assets_dir) / "weights"
        if not force_init:
            meta = load_meta(weights_dir, "lm")
            tv = int(meta.get("text_vocab", cfg.text_vocab))
            cv = int(meta.get("codec_vocab", cfg.codec_vocab))
            if (tv, cv) != (cfg.text_vocab, cfg.codec_vocab):
                cfg = dataclasses.replace(cfg, text_vocab=tv, codec_vocab=cv)
        k = jax.random.PRNGKey(11)
        # init → checkpoint overlay → quantize/fuse as ONE jitted
        # program; checkpoints load host-side (weights.materialize_bundle
        # — eager per-leaf init measured minutes of tunnel round trips)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_quantize_lm
        from vocalie_tts_tpu.models.common.weights import materialize_bundle

        params = materialize_bundle(
            weights_dir,
            [
                ("lm_bundle", "lm", lambda: init_lmtts(k, cfg)),
                ("decoder", "codec_decoder",
                 lambda: init_codec_decoder(jax.random.fold_in(k, 1), cfg)),
            ],
            transform=lambda parts: {**parts,
                                     "lm_bundle": maybe_quantize_lm(parts["lm_bundle"])},
            force_init=force_init,
        )
        if mesh is not None:
            from vocalie_tts_tpu.parallel.mesh import shard_params

            # TP rules shard the LM projections; everything the rules
            # don't match (codec decoder convs, cond tables) replicates
            params = shard_params(params, mesh)
        return cls(params, cfg, weights_dir, mesh=mesh)

    def save_weights(self) -> None:
        _check_saveable(self.params)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_unfuse_lm

        save_params(self.weights_dir, "lm",
                    maybe_unfuse_lm(self.params["lm_bundle"], self.cfg.lm),
                    meta={"family": "lmtts",
                          "text_vocab": self.cfg.text_vocab,
                          "codec_vocab": self.cfg.codec_vocab})
        save_params(self.weights_dir, "codec_decoder", self.params["decoder"],
                    meta={"family": "lmtts", "stage": "codec_decoder"})

    def warmup(self) -> None:
        self.synthesize("Bonjour, préchauffage.", mode="custom_voice", language="French")

    # ── synthesis ───────────────────────────────────────────────────────

    def synthesize(self, text: str, **kwargs) -> Tuple[np.ndarray, int, Dict[str, Any]]:
        return self.synthesize_batch([text], **kwargs)[0]

    def synthesize_batch(
        self,
        texts: List[str],
        *,
        mode: str = "custom_voice",
        language: Optional[str] = "French",
        speaker: Optional[str] = "Vivian",
        instruct: str = "",
        ref_text: str = "",
        x_vector_only: bool = True,
        voice_ref_path: Optional[str] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        progress_cb=None,
        **_ignored,
    ) -> List[Tuple[np.ndarray, int, Dict[str, Any]]]:
        t0 = time.monotonic()
        cfg = self.cfg
        bundle = self.params["lm_bundle"]

        # prompt text per mode (preamble = instruction / clone transcript)
        if mode == "voice_design" and instruct:
            preamble = instruct
        elif mode == "voice_clone" and not x_vector_only and ref_text:
            preamble = ref_text
        elif instruct:  # custom_voice emotion instruction
            preamble = instruct
        else:
            preamble = ""
        seqs: List[List[int]] = [
            build_prompt_ids(self._frontend, text, preamble=preamble)
            for text in texts
        ]

        batch_buckets = BATCH_BUCKETS
        if self.mesh is not None:
            # batch shards over dp — keep only dp-multiple buckets so
            # every shard gets equal rows (padding rows are masked out
            # by `lengths` exactly like single-chip padding)
            dp = self.mesh.shape["dp"]
            batch_buckets = tuple(b for b in BATCH_BUCKETS if b % dp == 0)
            if not batch_buckets:
                raise ValueError(
                    f"VOCALIE_SERVE_MESH dp={dp} exceeds the largest batch "
                    f"bucket {max(BATCH_BUCKETS)}"
                )
        tokens, lengths, prompt_bucket, batch_bucket = pad_token_batch(
            seqs,
            prompt_buckets=PROMPT_BUCKETS,
            batch_buckets=batch_buckets,
            extra_positions=3,  # spk slot, lang slot, BOS_audio
        )

        # speaker conditioning
        if mode == "voice_clone" and voice_ref_path:
            spk = self._spk_cache.get(voice_ref_path)
        elif mode == "custom_voice" and speaker in SPEAKERS:
            spk = np.asarray(
                bundle["speaker_table"][SPEAKERS.index(speaker)], np.float32
            )
        else:
            spk = np.zeros((cfg.speaker_dim,), np.float32)
        spk_b = jnp.asarray(np.tile(spk[None, :], (batch_bucket, 1)))
        lang_b = jnp.tile(lang_one_hot(language or "Auto")[None, :], (batch_bucket, 1))

        est_tokens = max(
            int(estimate_duration(t) * TOKENS_PER_SECOND * 1.8) + 8 for t in texts
        )
        decode_bucket = pick_bucket(est_tokens, DECODE_BUCKETS)
        cache_len = round_cache_len(prompt_bucket + decode_bucket)

        embeds = build_prompt_embeds(bundle, cfg, jnp.asarray(tokens), spk_b, lang_b)

        self._rng, sub = jax.random.split(self._rng)
        gen_lengths = jnp.asarray(lengths)
        if self.mesh is not None:
            from vocalie_tts_tpu.parallel.serve import shard_generate_inputs

            (embeds, gen_lengths), (sub,) = shard_generate_inputs(
                self.mesh, (embeds, gen_lengths), (sub,)
            )
        out_tokens, tok_lengths = self._generate(
            bundle["lm"],
            embeds,
            gen_lengths,
            sub,
            cache_len=cache_len,
            max_new=decode_bucket,
            eos_token_id=cfg.eos_audio,
            temperature=float(temperature),
            top_k=int(top_k),
            first_token=cfg.bos_audio,
        )

        # stage 2 queues directly behind decode; ONE host read returns
        # audio and token lengths together (tunnel: ~90 ms/read)
        from vocalie_tts_tpu.models.common.ar_runtime import from_pcm16_wire

        audio_dev = self._stage2(
            self.params["decoder"], tokens=out_tokens, tok_lengths=tok_lengths,
        )
        audio_wire, tok_lengths = jax.device_get((audio_dev, tok_lengths))
        audio = from_pcm16_wire(audio_wire)
        tok_lengths = np.asarray(tok_lengths)
        elapsed = time.monotonic() - t0

        samples_per_token = cfg.token_upsample * cfg.vocoder.hop
        results = []
        for i in range(len(texts)):
            n = int(tok_lengths[i]) * samples_per_token
            meta = {
                "engine": "qwen3",
                "mode": mode,
                "codec_tokens": int(tok_lengths[i]),
                "elapsed_ms": round(elapsed * 1000, 1),
                "prompt_bucket": prompt_bucket,
                "decode_bucket": decode_bucket,
            }
            if self.mesh is not None:
                meta["serve_mesh"] = (
                    f"{self.mesh.shape['dp']}dp x {self.mesh.shape['tp']}tp"
                )
            results.append((audio[i, :n], cfg.sample_rate, meta))
            if progress_cb:
                progress_cb((i + 1) / len(texts))
        return results


__all__ = ["LMTTSRuntime", "SCALES"]
