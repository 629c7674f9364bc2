"""CosyVoice-class runtime: instruct/clone/cross modes + streaming.

Streaming is TRUE incremental decode: prefill once, then loop
[decode a window of LM tokens (jitted scan, cache stays on device) →
flow-matching mel → vocoder → flush audio]. The first packet is ready
after one 8-token window (~341 ms of audio), honoring the engine's
``supports_streaming`` capability flag and its first-packet claim
(ref: cosyvoice_backend.py:9,186-193).
"""

from __future__ import annotations

import functools
import os
import time
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.models.common.ar_runtime import (
    SpeakerEmbedCache,
    make_generate_fn,
    make_streaming_fns,
    pad_token_batch,
)
from vocalie_tts_tpu.models.common.speaker import embed_reference_audio
from vocalie_tts_tpu.models.common.weights import (
    checkpoint_exists,
    load_params,
    save_params,
)
from vocalie_tts_tpu.models.cosyvoice.model import (
    TOKENS_PER_SECOND,
    CosyVoiceConfig,
    build_prompt_embeds,
    init_cfm_decoder,
    init_cosyvoice_lm,
    mel_to_audio,
    speech_logit_bias,
    tokens_to_mel,
)
from vocalie_tts_tpu.ops.kv_cache import pick_bucket, round_cache_len
from vocalie_tts_tpu.text.duration import estimate_duration
from vocalie_tts_tpu.text.frontend import build_prompt_ids, load_frontend
from vocalie_tts_tpu.utils.env import bool_env

PROMPT_BUCKETS = (64, 128, 256, 512)
DECODE_BUCKETS = (64, 128, 256, 320)
BATCH_BUCKETS = (1, 2, 4, 8)
STREAM_WINDOW_TOKENS = 8  # first flush ≈341 ms of audio (latency)
#: later windows are bigger: each host read costs a ~90 ms tunnel round
#: trip, so doubling the window nearly halves the per-audio-second host
#: cost at a latency price only the FIRST packet would have paid.
#: Must divide every DECODE_BUCKETS remainder after the first window.
#: Measured curve (12.8 s utterance, depth 2, first packet ~74 ms in
#: every config): 16→11.7×, 24→17.5×, 32→21.3×, 48→24-29.6× sustained
#: RTF. 48 ships: at ≥24× sustained a flush lands every ~80 ms of wall
#: clock (~1.9 s of audio), so playback never starves while the read
#: count drops 3× vs the round-2 default (16).
STREAM_WINDOW_SUSTAIN = int(os.environ.get("VOCALIE_STREAM_WINDOW", "48"))
#: in-flight window dispatch depth: 2 keeps the device busy even when a
#: host read takes LONGER than one window's decode+CFM+vocoder (the
#: tunnel read is the sustained-RTF ceiling at depth 1)
STREAM_PIPELINE_DEPTH = max(1, int(os.environ.get("VOCALIE_STREAM_DEPTH", "2")))


def stream_window_schedule(decode_bucket: int) -> list:
    """Adaptive window schedule for one streamed utterance: the FIRST
    window is small (first-packet latency = one short window), later
    windows are STREAM_WINDOW_SUSTAIN tokens — fewer ~90 ms host reads
    per audio second. Every distinct window size in the returned list
    is one jit compile of ``_stream_window``, so remainders reuse sizes
    where possible (the final partial window is the only extra shape)."""
    schedule = [STREAM_WINDOW_TOKENS]
    consumed = STREAM_WINDOW_TOKENS
    while consumed < decode_bucket:
        w = min(STREAM_WINDOW_SUSTAIN, decode_bucket - consumed)
        schedule.append(w)
        consumed += w
    return schedule

SCALES: Dict[str, CosyVoiceConfig] = {
    "full": CosyVoiceConfig(),
    "small": CosyVoiceConfig(
        d_model=512, n_layers=8, n_heads=8, n_kv_heads=8, d_ff=2048,
        t2w_scale="small",
    ),
    "tiny": CosyVoiceConfig(
        d_model=64, n_layers=2, n_heads=4, n_kv_heads=2, d_ff=128, max_seq_len=512,
        t2w_scale="tiny", dtype=jnp.float32,
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


#: zero-shot prompt cap: the LM prompt carries ref_seconds · 25 speech
#: tokens, so 5 s ≈ 125 prompt positions (published default crops too)
_PROMPT_MAX_S = int(os.environ.get("VOCALIE_CLONE_PROMPT_S", "5"))

#: below this many speech-prompt tokens, continuation conditioning is
#: noise — skip the LM-side prompt and keep x-vector-only conditioning
_MIN_LM_SPEECH_PROMPT = 8


def _fit_lm_speech_prompt(ptoks: np.ndarray, longest_text: int,
                          extra_positions: int) -> Optional[np.ndarray]:
    """Crop the speech prompt so [text ‖ BOS ‖ ptoks[:-1]] fits the
    largest prompt bucket. pad_token_batch truncates the TAIL on
    overflow — which would cut exactly the tokens decode continues
    from (first_token = ptoks[-1]) — so crop the HEAD here instead,
    preserving the most recent speech context. Returns None when the
    text leaves no meaningful room (callers fall back to x-vector-only
    clone conditioning for the LM; the flow prompt is unaffected)."""
    keep = max(PROMPT_BUCKETS) - extra_positions - longest_text
    if keep < _MIN_LM_SPEECH_PROMPT or len(ptoks) == 0:
        return None
    return ptoks[-min(len(ptoks), keep):]


def save_s3_tokenizer(weights_dir: Path, params: Dict[str, Any], cfg) -> None:
    import dataclasses as _dc

    meta_cfg = {k: v for k, v in _dc.asdict(cfg).items() if k != "dtype"}
    save_params(weights_dir, "s3_tokenizer", params,
                meta={"family": "cosyvoice", "stage": "speech_tokenizer",
                      "config": meta_cfg})


def load_s3_tokenizer(weights_dir: Path):
    import json

    from vocalie_tts_tpu.models.common.s3_tokenizer import (
        S3TokenizerConfig,
        init_s3_tokenizer,
    )

    from vocalie_tts_tpu.models.common.weights import load_params_host

    meta = json.loads((Path(weights_dir) / "meta.json").read_text(encoding="utf-8"))
    cfg = S3TokenizerConfig(**meta["s3_tokenizer"]["config"])
    # eval_shape template + host load + one batched device_put (no
    # eager device init / per-leaf tunnel round trips)
    template = jax.eval_shape(lambda: init_s3_tokenizer(jax.random.PRNGKey(0), cfg))
    return jax.device_put(load_params_host(weights_dir, "s3_tokenizer", template)), cfg


class CosyVoiceRuntime:
    def __init__(self, params: Dict[str, Any], cfg: CosyVoiceConfig, weights_dir: Path,
                 frontend=None):
        self.params = params
        self.cfg = cfg
        self.weights_dir = Path(weights_dir)
        #: text frontend — published tokenizer.json (the checkpoint's
        #: Qwen2 tokenizer) when staged, UTF-8 byte ids otherwise
        self._frontend = frontend or load_frontend(
            self.weights_dir.parent, style="raw", text_vocab=cfg.text_vocab
        )
        self._rng = jax.random.PRNGKey(0)
        self._generate = make_generate_fn(cfg.lm, speech_logit_bias(cfg))
        self._stream_prefill, self._stream_window = make_streaming_fns(
            cfg.lm, speech_logit_bias(cfg)
        )
        self._tokens_to_mel = jax.jit(functools.partial(tokens_to_mel, cfg=cfg))
        def _mel_to_audio_pcm16(dec, **kw):
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            return to_pcm16_wire(mel_to_audio(dec, cfg=cfg, **kw))

        self._mel_to_audio = jax.jit(_mel_to_audio_pcm16)

        def _stage2_nc(dec, *, tokens, tok_lengths, spk_emb, rng):
            # non-clone stage 2 in ONE program, control-id strip +
            # validity mask in-graph: queues right behind the decode
            # loop with no host round trip of the token buffer
            # (~90 ms/read through the tunnel)
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            speech = jnp.clip(tokens, 0, cfg.speech_vocab - 1)
            mask = (
                jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
                < tok_lengths[:, None]
            ).astype(jnp.float32)
            mel = tokens_to_mel(
                dec, cfg=cfg, speech_tokens=speech, token_mask=mask,
                spk_emb=spk_emb, rng=rng,
            )
            return to_pcm16_wire(mel_to_audio(dec, cfg=cfg, mel=mel))

        self._stage2_nc = jax.jit(_stage2_nc)

        def _stream_chain(lm_params, dec, caches, prev, done, rng, spk_emb,
                          *, window, eos_token_id, temperature, top_k):
            # whole streaming window in ONE dispatch: decode W tokens →
            # mask → CFM → vocoder → int16 wire, rng chained on device.
            # The unfused path costs ~5 host dispatches per window
            # (window, clip/mask, CFM, vocoder, host rng split) — each a
            # tunnel round of serialization; at 48-token windows that
            # host-side cost rivals the device compute itself.
            from vocalie_tts_tpu.models.common.ar_runtime import to_pcm16_wire

            rng_next, sub, sub2 = jax.random.split(rng, 3)
            toks, n_valid, prev, done, caches = self._stream_window(
                lm_params, caches, prev, done, sub, window=window,
                eos_token_id=eos_token_id, temperature=temperature,
                top_k=top_k,
            )
            speech = jnp.clip(toks, 0, cfg.speech_vocab - 1)
            mask = (
                jnp.arange(window)[None, :] < n_valid[:, None]
            ).astype(jnp.float32)
            mel = tokens_to_mel(
                dec, cfg=cfg, speech_tokens=speech, token_mask=mask,
                spk_emb=spk_emb, rng=sub2,
            )
            audio = to_pcm16_wire(mel_to_audio(dec, cfg=cfg, mel=mel))
            return audio, n_valid, prev, done, caches, rng_next

        self._stream_chain = jax.jit(
            _stream_chain,
            static_argnames=("window", "eos_token_id", "temperature", "top_k"),
        )
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
        self._s3: Optional[Dict[str, Any]] = None
        self._clone_cache: Dict[str, Any] = {}

    def attach_s3_tokenizer(self, s3_params: Dict[str, Any], s3_cfg) -> None:
        """Enable published zero-shot cloning: with a converted S3
        tokenizer, clone mode conditions the LM on the reference's
        speech tokens (continuation) and the flow on its mel prefix —
        the inference_zero_shot semantics. Without it, clone mode keeps
        the x-vector + transcript simplification."""
        from vocalie_tts_tpu.models.common.s3_tokenizer import tokenize

        if s3_cfg.vocab_size > self.cfg.speech_vocab:
            import logging

            # clone prompt ids above the LM's speech space would be
            # clipped to wrong tokens — surface the mismatch (fix:
            # import an LM whose speech_embedding matches the S3 FSQ
            # space, e.g. the published 6561-code checkpoints)
            logging.getLogger("vocalie_api").warning(
                "S3 speech tokenizer emits %d codes but the LM speech "
                "space is %d — clone prompt tokens will clip",
                s3_cfg.vocab_size, self.cfg.speech_vocab,
            )
        self._s3 = {
            "params": s3_params,
            "cfg": s3_cfg,
            "tokenize": jax.jit(functools.partial(tokenize, cfg=s3_cfg)),
        }
        self._clone_cache.clear()

    @classmethod
    def create(cls, assets_dir: Path, force_init: bool = False) -> "CosyVoiceRuntime":
        import dataclasses

        cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
        from vocalie_tts_tpu.models.common.ar_runtime import apply_runtime_env
        from vocalie_tts_tpu.models.common.weights import load_meta

        cfg = apply_runtime_env(cfg)
        weights_dir = Path(assets_dir) / "weights"
        if not force_init:
            meta = load_meta(weights_dir, "lm")
            tv = int(meta.get("text_vocab", cfg.text_vocab))
            sv = int(meta.get("speech_vocab", cfg.speech_vocab))
            if (tv, sv) != (cfg.text_vocab, cfg.speech_vocab):
                cfg = dataclasses.replace(cfg, text_vocab=tv, speech_vocab=sv)
        k = jax.random.PRNGKey(31)
        # ONE jitted init → overlay → quantize program (see
        # weights.materialize_bundle: eager per-leaf init costs minutes
        # of tunnel round trips at cold start)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_quantize_lm
        from vocalie_tts_tpu.models.common.weights import materialize_bundle

        params = materialize_bundle(
            weights_dir,
            [
                ("lm_bundle", "lm", lambda: init_cosyvoice_lm(k, cfg)),
                ("decoder", "flow",
                 lambda: init_cfm_decoder(jax.random.fold_in(k, 1), cfg)),
            ],
            transform=lambda parts: {**parts,
                                     "lm_bundle": maybe_quantize_lm(
                                         parts["lm_bundle"], lm_cfg=cfg.lm)},
            force_init=force_init,
        )
        rt = cls(dict(params), cfg, weights_dir)
        if not force_init and checkpoint_exists(weights_dir, "s3_tokenizer"):
            s3_params, s3_cfg = load_s3_tokenizer(weights_dir)
            rt.attach_s3_tokenizer(s3_params, s3_cfg)
        return rt

    def save_weights(self) -> None:
        _check_saveable(self.params)
        from vocalie_tts_tpu.models.common.ar_runtime import maybe_unfuse_lm

        save_params(self.weights_dir, "lm",
                    maybe_unfuse_lm(self.params["lm_bundle"], self.cfg.lm),
                    meta={"family": "cosyvoice",
                          "text_vocab": self.cfg.text_vocab,
                          "speech_vocab": self.cfg.speech_vocab})
        save_params(self.weights_dir, "flow", self.params["decoder"],
                    meta={"family": "cosyvoice", "stage": "flow+hift"})
        if self._s3 is not None:
            save_s3_tokenizer(self.weights_dir, self._s3["params"], self._s3["cfg"])

    def warmup(self) -> None:
        self.synthesize("Préchauffage.", mode="instruct", language="French")

    # ── synthesis ───────────────────────────────────────────────────────

    def synthesize(self, text: str, **kwargs) -> Tuple[np.ndarray, int, Dict[str, Any]]:
        return self.synthesize_batch([text], **kwargs)[0]

    def synthesize_batch(
        self,
        texts: List[str],
        *,
        mode: str = "instruct",
        language: Optional[str] = "French",
        instruct_text: str = "",
        prompt_text: str = "",
        streaming: bool = False,
        voice_ref_path: Optional[str] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        progress_cb=None,
        **_ignored,
    ) -> List[Tuple[np.ndarray, int, Dict[str, Any]]]:
        t0 = time.monotonic()
        if streaming:
            # true incremental decode for the first row: LM windows
            # interleave with CFM+vocoder flushes, so the first packet
            # is ready after ONE window — not after the full utterance
            packets: List[np.ndarray] = []
            first_packet_ms = None
            n_tokens = 0
            for packet in self.synthesize_streaming(
                texts[0], mode=mode, language=language,
                instruct_text=instruct_text, prompt_text=prompt_text,
                voice_ref_path=voice_ref_path, temperature=temperature,
                top_k=top_k,
            ):
                if first_packet_ms is None:
                    first_packet_ms = round((time.monotonic() - t0) * 1000, 1)
                packets.append(packet[0])
                n_tokens += len(packet[0]) // self.cfg.samples_per_token
            audio_rows = [np.concatenate(packets) if packets else np.zeros(0, np.float32)]
            lengths_out = [n_tokens]
            # remaining rows (batch>1 streaming degenerates to offline)
            if len(texts) > 1:
                tokens, tok_lengths, spk_b, meta_common = self._lm_tokens(
                    texts[1:], mode=mode, instruct_text=instruct_text,
                    prompt_text=prompt_text, voice_ref_path=voice_ref_path,
                    temperature=temperature, top_k=top_k,
                )
                audio_full, tok_lengths = self._offline_audio(
                    tokens, tok_lengths, spk_b,
                    clone_pair=meta_common.pop("_clone_pair", None),
                )
                audio_rows += [a for a in audio_full]
                lengths_out += [int(n) for n in tok_lengths[: len(texts) - 1]]
            else:
                meta_common = {"engine": "cosyvoice", "mode": mode}
            metas = [dict(meta_common, streaming=True, first_packet_ms=first_packet_ms)]
            metas += [dict(meta_common, streaming=True) for _ in texts[1:]]
        else:
            tokens, tok_lengths, spk_b, meta_common = self._lm_tokens(
                texts, mode=mode, instruct_text=instruct_text,
                prompt_text=prompt_text, voice_ref_path=voice_ref_path,
                temperature=temperature, top_k=top_k,
            )
            audio_full, tok_lengths = self._offline_audio(
                tokens, tok_lengths, spk_b,
                clone_pair=meta_common.pop("_clone_pair", None),
            )
            audio_rows = list(audio_full)
            lengths_out = [int(n) for n in tok_lengths[: len(texts)]]
            metas = [dict(meta_common) for _ in texts]

        elapsed = time.monotonic() - t0
        out = []
        for i, text in enumerate(texts):
            n = lengths_out[i] * self.cfg.samples_per_token
            audio = audio_rows[i][:n]
            meta = metas[i]
            meta.update(
                {"speech_tokens": lengths_out[i], "elapsed_ms": round(elapsed * 1000, 1)}
            )
            out.append((audio, self.cfg.sample_rate, meta))
            if progress_cb:
                progress_cb((i + 1) / len(texts))
        return out

    def synthesize_streaming(
        self,
        text: str,
        *,
        mode: str = "instruct",
        language: Optional[str] = "French",
        instruct_text: str = "",
        prompt_text: str = "",
        voice_ref_path: Optional[str] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        **_ignored,
    ) -> Iterator[Tuple[np.ndarray, int]]:
        """Yield (audio_window, sr) packets with true incremental decode:
        prefill → [decode W tokens → CFM → vocoder → yield]* — the
        first packet waits for one window, not the whole utterance."""
        from vocalie_tts_tpu.models.cosyvoice.model import build_prompt_embeds

        cfg = self.cfg
        bundle = self.params["lm_bundle"]
        preamble = instruct_text if mode == "instruct" else (
            prompt_text if mode == "clone" else "")
        parts: List[int] = build_prompt_ids(self._frontend, text, preamble=preamble)
        # zero-shot speech continuation: prompt speech tokens condition
        # the LM (the dominant voice-similarity factor); the per-window
        # CFM keeps x-vector conditioning so window shapes stay fixed
        # (offline clone additionally feeds the flow the prompt mel)
        # clone speech prompt: speech ids enter the PROMPT space at
        # +text_vocab (build_prompt_embeds two-table gather); decode
        # tokens stay LM-core ids
        tv = self.cfg.text_vocab
        first_prev = self.cfg.bos_speech
        if mode == "clone" and self._s3 is not None and voice_ref_path:
            ptoks, _pmel = self._clone_voice(voice_ref_path)
            ptoks = _fit_lm_speech_prompt(ptoks, len(parts), extra_positions=2)
            if ptoks is not None:
                parts.append(tv + self.cfg.bos_speech)
                parts += [tv + int(t) for t in ptoks[:-1]]
                first_prev = int(ptoks[-1])

        tokens, lengths, prompt_bucket, _bb = pad_token_batch(
            [parts], prompt_buckets=PROMPT_BUCKETS, batch_buckets=(1,),
            extra_positions=2,
        )
        spk = self._spk_cache.get(voice_ref_path)
        spk_b = np.asarray(spk, np.float32)[None]
        est_tokens = int(estimate_duration(text) * TOKENS_PER_SECOND * 1.8) + 8
        decode_bucket = pick_bucket(est_tokens, DECODE_BUCKETS)
        cache_len = round_cache_len(prompt_bucket + decode_bucket)

        embeds = build_prompt_embeds(bundle, cfg, jnp.asarray(tokens), jnp.asarray(spk_b))
        caches = self._stream_prefill(
            bundle["lm"], embeds, jnp.asarray(lengths), cache_len=cache_len
        )
        prev = jnp.full((1,), first_prev, jnp.int32)
        done = jnp.zeros((1,), bool)
        spk_j = jnp.asarray(spk_b)

        fused = bool_env("VOCALIE_STREAM_FUSED", True)

        def dispatch_window(caches, prev, done, w):
            """Queue window decode + CFM + vocoder with NO host sync —
            JAX async dispatch lets window N+1 decode on device while
            the host reads and yields window N's audio. The fused path
            is ONE jitted program per window (rng chained on device);
            the unfused path is kept for bisection (VOCALIE_STREAM_FUSED=0)."""
            if fused:
                audio, n_valid, prev, done, caches, self._rng = (
                    self._stream_chain(
                        bundle["lm"], self.params["decoder"], caches, prev,
                        done, self._rng, spk_j,
                        window=w, eos_token_id=cfg.eos_speech,
                        temperature=float(temperature), top_k=int(top_k),
                    )
                )
                return audio, n_valid, prev, done, caches
            self._rng, sub, sub2 = jax.random.split(self._rng, 3)
            toks, n_valid, prev, done, caches = self._stream_window(
                bundle["lm"], caches, prev, done, sub,
                window=w, eos_token_id=cfg.eos_speech,
                temperature=float(temperature), top_k=int(top_k),
            )
            speech = jnp.clip(toks, 0, self.cfg.speech_vocab - 1)
            mask = (
                jnp.arange(w)[None, :] < n_valid[:, None]
            ).astype(jnp.float32)
            mel = self._tokens_to_mel(
                self.params["decoder"], speech_tokens=speech,
                token_mask=mask, spk_emb=spk_j, rng=sub2,
            )
            audio = self._mel_to_audio(self.params["decoder"], mel=mel)
            return audio, n_valid, prev, done, caches

        schedule = stream_window_schedule(decode_bucket)

        # depth-D pipeline: keep D windows' decode+CFM+vocoder queued on
        # device ahead of the host reads — at depth 1 the sustained RTF
        # is capped by whichever is slower of (window compute, ~90 ms
        # tunnel read); at depth 2 the reads overlap the NEXT window's
        # compute even when the read is the slower side. The windows
        # chain through `caches` on device, so queuing ahead costs no
        # extra host sync.
        from collections import deque

        in_flight: deque = deque()
        next_i = 0

        def queue_next(caches, prev, done):
            nonlocal next_i
            if next_i >= len(schedule):
                return caches, prev, done
            out = dispatch_window(caches, prev, done, schedule[next_i])
            next_i += 1
            in_flight.append(out)
            return out[4], out[2], out[3]  # caches, prev, done

        state = (caches, prev, done)
        for _ in range(min(STREAM_PIPELINE_DEPTH, len(schedule))):
            state = queue_next(*state)
        while in_flight:
            audio, n_valid, prev_w, done_w, _caches = in_flight.popleft()
            # ONE device→host transfer per window (the tunnel costs
            # ~90 ms per round trip — three separate reads tripled the
            # per-window host cost and capped sustained streaming RTF)
            from vocalie_tts_tpu.models.common.ar_runtime import from_pcm16_wire

            n_h, done_h, audio_h = jax.device_get((n_valid, done_w, audio))
            audio_h = from_pcm16_wire(audio_h)
            n = int(n_h[0])
            if n > 0:
                samples = n * cfg.samples_per_token
                yield np.asarray(audio_h, np.float32)[0, :samples], cfg.sample_rate
            if bool(done_h[0]):
                break
            state = queue_next(*state)

    # ── internals ───────────────────────────────────────────────────────

    def _clone_voice(self, voice_ref_path: str):
        """(prompt speech tokens [p], prompt mel [p·ratio, n_mels]) for a
        reference clip — the published zero-shot conditioning pair.
        Cached by (path, mtime); the ref is cropped to whole seconds
        (≤ _PROMPT_MAX_S) so each duration is one jit shape."""
        key = f"{voice_ref_path}:{os.path.getmtime(voice_ref_path)}"
        if key in self._clone_cache:
            return self._clone_cache[key]
        from vocalie_tts_tpu.dsp.host import resample
        from vocalie_tts_tpu.io.refs import normalize_ref_audio
        from vocalie_tts_tpu.models.common.audio import log_mel_spectrogram

        cfg = self.cfg
        s3cfg = self._s3["cfg"]
        audio, sr = normalize_ref_audio(voice_ref_path)
        secs = max(1, min(_PROMPT_MAX_S, len(audio) // sr))
        a16 = resample(audio, sr, s3cfg.sr)[: s3cfg.sr * secs]
        if len(a16) < s3cfg.sr * secs:
            a16 = np.pad(a16, (0, s3cfg.sr * secs - len(a16)))
        ptoks = np.asarray(
            self._s3["tokenize"](self._s3["params"], audio_16k=jnp.asarray(a16)[None])
        )[0].astype(np.int32)
        # prompt mel in the flow's own mel space (hop = hift hop, slaney
        # filterbank — the convention the published flow trains against)
        hop = cfg.t2w.hift.hop
        ratio = cfg.t2w.token_mel_ratio
        a24 = resample(audio, sr, cfg.sample_rate)[: cfg.sample_rate * secs]
        if len(a24) < cfg.sample_rate * secs:
            a24 = np.pad(a24, (0, cfg.sample_rate * secs - len(a24)))
        pmel = np.asarray(log_mel_spectrogram(
            jnp.asarray(a24)[None], sr=cfg.sample_rate, n_fft=4 * hop, hop=hop,
            n_mels=cfg.t2w.n_mels, fmin=0.0, fmax=cfg.sample_rate / 3.0,
            scale="slaney",
        ))[0]
        # align: p tokens ↔ p·ratio mel frames
        p = min(len(ptoks), pmel.shape[0] // ratio)
        ptoks, pmel = ptoks[:p], pmel[: p * ratio].astype(np.float32)
        # LM prompt space check: speech ids must fit the LM's vocab slice
        ptoks = np.clip(ptoks, 0, self.cfg.speech_vocab - 1)
        self._clone_cache[key] = (ptoks, pmel)
        return self._clone_cache[key]

    def _lm_tokens(
        self, texts, *, mode="instruct", instruct_text="", prompt_text="",
        voice_ref_path=None, temperature=0.8, top_k=50, **_ignored,
    ):
        cfg = self.cfg
        bundle = self.params["lm_bundle"]
        clone_pair = None
        if mode == "clone" and self._s3 is not None and voice_ref_path:
            clone_pair = self._clone_voice(voice_ref_path)
        seqs: List[List[int]] = []
        for text in texts:
            preamble = instruct_text if mode == "instruct" else (
                prompt_text if mode == "clone" else "")
            seqs.append(build_prompt_ids(self._frontend, text, preamble=preamble))

        # speech continuation (inference_zero_shot): prompt speech
        # tokens enter each LM prompt after an explicit BOS; decode
        # resumes FROM the last prompt token. One shared crop (sized by
        # the longest text) keeps the scalar first_token consistent
        # across the batch.
        lm_ptoks = None
        if clone_pair is not None:
            lm_ptoks = _fit_lm_speech_prompt(
                clone_pair[0], max(len(s) for s in seqs), extra_positions=2
            )
            if lm_ptoks is not None:
                tv = self.cfg.text_vocab
                tail = [tv + int(t) for t in lm_ptoks[:-1]]
                for parts in seqs:
                    parts.append(tv + self.cfg.bos_speech)
                    parts += tail

        tokens, lengths, prompt_bucket, batch_bucket = pad_token_batch(
            seqs, prompt_buckets=PROMPT_BUCKETS, batch_buckets=BATCH_BUCKETS,
            extra_positions=2,  # spk slot + BOS
        )
        spk = self._spk_cache.get(voice_ref_path)
        spk_b = np.tile(np.asarray(spk, np.float32)[None], (batch_bucket, 1))

        est_tokens = max(
            int(estimate_duration(t) * TOKENS_PER_SECOND * 1.8) + 8 for t in texts
        )
        decode_bucket = pick_bucket(est_tokens, DECODE_BUCKETS)
        cache_len = round_cache_len(prompt_bucket + decode_bucket)

        first_token = (
            int(lm_ptoks[-1]) if lm_ptoks is not None else self.cfg.bos_speech
        )
        embeds = build_prompt_embeds(
            bundle, cfg, jnp.asarray(tokens), jnp.asarray(spk_b)
        )
        self._rng, sub = jax.random.split(self._rng)
        out_tokens, tok_lengths = self._generate(
            bundle["lm"], embeds, jnp.asarray(lengths), sub,
            cache_len=cache_len, max_new=decode_bucket,
            eos_token_id=self.cfg.eos_speech, temperature=float(temperature),
            top_k=int(top_k), first_token=first_token,
        )
        # tokens and lengths stay ON DEVICE — _offline_audio strips the
        # control ids in-graph (non-clone) or reads them once (clone);
        # the session's only host read returns audio and lengths together
        meta = {
            "engine": "cosyvoice",
            "mode": mode,
            "prompt_bucket": prompt_bucket,
            "decode_bucket": decode_bucket,
        }
        if clone_pair is not None and len(clone_pair[0]) > 0:
            meta["_clone_pair"] = clone_pair
            meta["prompt_speech_tokens"] = int(len(clone_pair[0]))
        return out_tokens, tok_lengths, spk_b, meta

    def _offline_audio(self, tokens, tok_lengths, spk_b, clone_pair=None):
        """Device LM tokens → (audio [b, T] f32, tok_lengths np).

        Non-clone: ONE fused stage-2 program queues behind the decode
        loop and the only host read returns audio + lengths together.
        With ``clone_pair`` (prompt speech tokens + prompt mel), the
        flow runs on [prompt ‖ generated] with the prompt's real mel as
        conditioning prefix, and the prompt region is cropped from the
        output (inference_zero_shot semantics) — this path reads the
        tokens once to splice the prompt on host."""
        from vocalie_tts_tpu.models.common.ar_runtime import from_pcm16_wire

        if clone_pair is None or len(clone_pair[0]) == 0:
            self._rng, sub = jax.random.split(self._rng)
            wire = self._stage2_nc(
                self.params["decoder"], tokens=tokens,
                tok_lengths=tok_lengths, spk_emb=jnp.asarray(spk_b), rng=sub,
            )
            audio_wire, tl = jax.device_get((wire, tok_lengths))
            return from_pcm16_wire(audio_wire), np.asarray(tl)

        speech_dev, tl = jax.device_get((tokens, tok_lengths))
        speech = np.clip(
            np.asarray(speech_dev), 0, self.cfg.speech_vocab - 1
        ).astype(np.int32)
        tok_lengths = np.asarray(tl)
        ptoks, pmel = clone_pair
        p = len(ptoks)
        speech = np.concatenate(
            [np.tile(ptoks[None], (speech.shape[0], 1)), speech], axis=1
        )
        lengths_flow = tok_lengths + p
        prompt_feat = jnp.asarray(np.tile(pmel[None], (speech.shape[0], 1, 1)))
        mask = (
            np.arange(speech.shape[1])[None, :] < lengths_flow[:, None]
        ).astype(np.float32)
        self._rng, sub = jax.random.split(self._rng)
        mel = self._tokens_to_mel(
            self.params["decoder"], speech_tokens=jnp.asarray(speech),
            token_mask=jnp.asarray(mask), spk_emb=jnp.asarray(spk_b), rng=sub,
            prompt_feat=prompt_feat,
        )
        mel = mel[:, p * self.cfg.t2w.token_mel_ratio :]
        audio = from_pcm16_wire(
            self._mel_to_audio(self.params["decoder"], mel=mel)
        )
        return audio, tok_lengths


__all__ = ["CosyVoiceRuntime", "SCALES", "STREAM_WINDOW_TOKENS", "STREAM_WINDOW_SUSTAIN"]
