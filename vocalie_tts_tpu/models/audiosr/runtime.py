"""AudioSR runtime: file-level enhancement with chunked overlap-add.

Parameter surface mirrors the reference CLI worker exactly (ref:
backend/workers/audiosr_runner.py): ddim_steps, guidance_scale, seed,
chunk_size/overlap (in samples at 48 kHz), multiband_ensemble +
input_cutoff (Butterworth lowpass), PCM_16 48 kHz output.

TPU design (the part the reference outsources to a torch venv):
overlap-add windows are stacked into ONE batched DDIM dispatch —
the UNet at window-size batch 1 is nowhere near MXU-saturated, and
each DDIM step re-streams the full UNet weights from HBM, so W
windows per loop amortize that streaming W-fold. Window-count
buckets bound compile variants; ONE host read per dispatch (each
separate device→host read costs ~90 ms through the tunnel). The
UNet/VAE compute runs bf16 at serving scale (VOCALIE_AUDIOSR_BF16,
default on except at tiny test scale — model.py keeps DDIM update
math f32).
"""

from __future__ import annotations

import functools
import os
import time
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import butter, sosfiltfilt

from vocalie_tts_tpu.dsp.host import resample
from vocalie_tts_tpu.io.wavio import read_wav, write_wav
from vocalie_tts_tpu.models.audiosr.model import (
    AudioSRConfig,
    enhance_window,
    init_audiosr,
)
from vocalie_tts_tpu.models.common.weights import save_params
from vocalie_tts_tpu.ops.kv_cache import pick_bucket
from vocalie_tts_tpu.utils.env import bool_env

WINDOW_BUCKETS = (32768, 65536, 131072)

# VOCALIE_AUDIOSR_TIMING=1 → print per-phase wall timings to stderr
# (read/resample/window/dispatch/host-read/overlap-add/write), for
# attributing session wall between device compute and host overhead.
_TIMING = bool_env("VOCALIE_AUDIOSR_TIMING")


def _mark(label: str, t0: float) -> float:
    now = time.monotonic()
    if _TIMING:
        import sys

        print(f"[audiosr-timing] {label}: {now - t0:.3f}s", file=sys.stderr, flush=True)
    return now
# window-COUNT buckets for the batched overlap-add path. Capped at 64:
# a 104 s studio session (~157 windows) runs as THREE dispatches
# (64+64+32) instead of five, so each dispatch boundary's fixed costs
# amortize further while batches 2..n's ~20 MB/s tunnel uploads still
# overlap batch 1's diffusion (a single all-window dispatch serialized
# ~0.9 s of transfers up front — measured slower). A 128-row CFG batch
# keeps the UNet MXU-saturated (conv-bound at these latent sizes).
WINDOW_COUNT_BUCKETS = (1, 2, 4, 8, 16, 32, 64)

SCALES: Dict[str, AudioSRConfig] = {
    "full": AudioSRConfig(),
    "small": AudioSRConfig(
        vae_base=32, unet_channels=64, unet_res_blocks=1,
    ),
    "tiny": AudioSRConfig(
        n_mels=32, vae_base=8, vae_mult=(1, 2), vae_res_blocks=1,
        z_channels=4, embed_dim=4, unet_channels=16, unet_mult=(1, 2),
        unet_res_blocks=1, unet_attn_res=(2,), unet_heads=2,
    ),
}


def _to_float(dev) -> np.ndarray:
    """Device output → f32 audio (rescales the int16 PCM wire format)."""
    arr = np.asarray(dev)
    if arr.dtype == np.int16:
        return arr.astype(np.float32) / 32767.0
    return arr.astype(np.float32)


# VOCALIE_AUDIOSR_DEVICE_STITCH=0 → host-side numpy overlap-add (the
# pre-round-3 path, kept as the differential baseline). Default ON:
# stitching on device downloads ONE finished array instead of every
# window, and removes the session's only heavy host-CPU phase — on a
# 1-vCPU serving host the numpy stitch timeshares with the jax client's
# RPC threads and measured 2-6 s of a ~2 s studio session (the same
# ops run 0.06 s in isolation).
_DEVICE_STITCH = bool_env("VOCALIE_AUDIOSR_DEVICE_STITCH", True)


@functools.partial(jax.jit, static_argnames=("chunk", "hop", "overlap"))
def _stitch_batch_segment(batch_out, row0, w_act, *, chunk: int, hop: int, overlap: int):
    """Overlap-add ONE window-count batch into its exclusive span.

    ``batch_out``: [bucket, chunk] outputs for global windows
    ``row0 .. row0+bucket-1`` (rows ≥ ``w_act`` are bucket padding and
    contribute zero weight). Triangular crossfades replicate the host
    stitch exactly — fade-in on every window but the global first,
    fade-out on every window but the global last (ref semantics:
    audiosr_runner.py:49-70 chunked overlap-add). Returns

      seg       [bucket·hop]  normalized span [row0·hop, (row0+bucket)·hop)
                              — correct except its first ``overlap``
                              samples when row0 > 0 (the predecessor
                              batch's tail contribution is missing),
      head_num/head_den [overlap]  batch-local numerator/denominator of
                              those first samples (host patches the
                              boundary with the predecessor's tail),
      tail_num/tail_den [overlap]  this batch's contribution to the NEXT
                              span's head region.

    The point of per-batch stitching: each batch's stitch is dispatched
    right behind its diffusion batch, so the host read of segment i
    overlaps batch i+1's compute on device — the session's device→host
    wire (~10 MB int16 at the ~20 MB/s tunnel) hides behind the DDIM
    loop instead of serializing after it."""
    x = batch_out[:, :chunk]
    wire_int16 = x.dtype == jnp.int16
    x = x.astype(jnp.float32) / (32767.0 if wire_int16 else 1.0)
    bucket = x.shape[0]

    g = row0 + jnp.arange(bucket, dtype=jnp.int32)[:, None]     # global rows
    pos = jnp.arange(chunk, dtype=jnp.float32)[None, :]
    den_r = float(max(overlap - 1, 1))
    ramp_in = jnp.clip(pos / den_r, 0.0, 1.0)
    ramp_out = jnp.clip((float(chunk - 1) - pos) / den_r, 0.0, 1.0)
    w_mat = (
        jnp.where(g >= 1, ramp_in, 1.0)
        * jnp.where(g <= w_act - 2, ramp_out, 1.0)
        * (g < w_act).astype(jnp.float32)
    )
    weighted = x * w_mat

    def fold(rows):
        acc = jnp.zeros(bucket * hop + hop, jnp.float32)
        acc = acc.at[: bucket * hop].set(rows[:, :hop].reshape(-1))
        tails = jnp.zeros((bucket, hop), jnp.float32).at[:, :overlap].set(rows[:, hop:])
        return acc.at[hop:].add(tails.reshape(-1))

    num = fold(weighted)
    den = fold(w_mat)
    seg = num[: bucket * hop] / jnp.maximum(den[: bucket * hop], 1e-6)
    if wire_int16:
        seg = jnp.round(jnp.clip(seg, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    return (
        seg,
        num[:overlap], den[:overlap],
        num[bucket * hop : bucket * hop + overlap],
        den[bucket * hop : bucket * hop + overlap],
    )


class AudioSRRuntime:
    def __init__(self, params, cfg: AudioSRConfig, weights_dir: Path) -> None:
        self.params = params
        # full-precision tree for save_weights (create() overwrites this
        # when the serving tree is an int8 runtime view)
        self._save_params = params
        self.cfg = cfg
        self.weights_dir = Path(weights_dir)
        self._enhance = jax.jit(
            functools.partial(enhance_window, cfg=cfg),
            static_argnames=("ddim_steps", "guidance_scale"),
        )

    @classmethod
    def create(cls, assets_dir: Path, force_init: bool = False) -> "AudioSRRuntime":
        import dataclasses

        scale = os.environ.get("VOCALIE_MODEL_SCALE", "full")
        cfg = SCALES[scale]
        # bf16 UNet/VAE compute at serving scale (tiny stays f32: the
        # torch-parity tests pin exact f32 math, and CPU bf16 is slow)
        if bool_env("VOCALIE_AUDIOSR_BF16", scale != "tiny"):
            cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
        weights_dir = Path(assets_dir) / "weights"
        # int8 UNet convs (per-output-channel weights, dynamic
        # per-sample activation scales) — the DDIM loop is conv-bound
        # and v5e int8 MXU rate is ~2× bf16. Default ON wherever the
        # bf16 serving path is active (tiny/f32 keeps exact math for
        # the torch-parity tests): TPU-validated 2026-08-18 — studio
        # pass 40.4→46.9× RT and the fidelity gate
        # (scripts/compare_audiosr_int8.py, full scale, 50 DDIM steps)
        # measured SNR 43.3 dB, peak −0.014 dB, RMS +0.0002 dB vs the
        # bf16 output. VOCALIE_AUDIOSR_INT8=0 opts out; see
        # models/common/unet2d.quantize_unet_convs.
        use_int8 = cfg.dtype != jnp.float32 and bool_env("VOCALIE_AUDIOSR_INT8", True)

        def _transform(parts):
            params = parts["audiosr"]
            if use_int8:
                from vocalie_tts_tpu.models.common.unet2d import quantize_unet_convs

                quantized = dict(params)
                quantized["unet"] = quantize_unet_convs(params["unet"])
                return {"audiosr": quantized, "raw": params}
            return {"audiosr": params, "raw": params}

        from vocalie_tts_tpu.models.common.weights import materialize_bundle

        bundle = materialize_bundle(
            weights_dir,
            [("audiosr", "audiosr", lambda: init_audiosr(jax.random.PRNGKey(5), cfg))],
            transform=_transform,
            force_init=force_init,
        )
        params, raw_params = bundle["audiosr"], bundle["raw"]
        rt = cls(params, cfg, weights_dir)
        # checkpoints always store the full-precision tree (the int8
        # tree is a runtime view; quantizing a re-loaded quantized tree
        # would double-round)
        rt._save_params = raw_params
        return rt

    def save_weights(self) -> None:
        save_params(
            self.weights_dir, "audiosr", self._save_params, meta={"family": "audiosr"}
        )

    def warmup(self) -> None:
        audio = np.zeros(self.cfg.sample_rate, np.float32)
        self.enhance_audio(audio, self.cfg.sample_rate, ddim_steps=20, guidance_scale=2.5, seed=0)

    # ── enhancement ─────────────────────────────────────────────────────

    def enhance_audio(
        self,
        audio: np.ndarray,
        sr: int,
        *,
        ddim_steps: int = 100,
        guidance_scale: float = 2.5,
        seed: int = 0,
        chunk_size: int = 32768,
        overlap: int = 1024,
        multiband_ensemble: bool = False,
        input_cutoff: int = 8000,
    ) -> np.ndarray:
        """Enhance mono/stereo audio → mono 48 kHz float32."""
        cfg = self.cfg
        t0 = time.monotonic()
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        if sr != cfg.sample_rate:
            audio = resample(audio.astype(np.float32), sr, cfg.sample_rate)
        audio = audio.astype(np.float32)
        t0 = _mark("mono+resample", t0)

        def run_pass(x: np.ndarray) -> np.ndarray:
            return self._chunked(
                x, ddim_steps=ddim_steps, guidance_scale=guidance_scale,
                seed=seed, chunk_size=chunk_size, overlap=overlap,
            )

        out = run_pass(audio)
        if multiband_ensemble and input_cutoff > 0:
            # mean of the full-band pass and a lowpassed-input pass
            # (ref: audiosr_runner.py:114-129)
            lowpassed = self._butter_lowpass(audio, input_cutoff, cfg.sample_rate)
            out_low = run_pass(lowpassed)
            n = min(len(out), len(out_low))
            out = 0.5 * (out[:n] + out_low[:n])
        return np.clip(out, -1.0, 1.0)

    def enhance_file(
        self,
        *,
        input_path: str,
        output_path: str,
        ddim_steps: int = 100,
        guidance_scale: float = 2.5,
        seed: int = 0,
        chunk_size: int = 32768,
        overlap: int = 1024,
        multiband_ensemble: bool = False,
        input_cutoff: int = 8000,
    ) -> Dict[str, Any]:
        t0 = time.monotonic()
        audio, sr = read_wav(input_path)
        _mark("read_wav", t0)
        out = self.enhance_audio(
            audio, sr,
            ddim_steps=ddim_steps, guidance_scale=guidance_scale, seed=seed,
            chunk_size=chunk_size, overlap=overlap,
            multiband_ensemble=multiband_ensemble, input_cutoff=input_cutoff,
        )
        tw = time.monotonic()
        write_wav(output_path, out, self.cfg.sample_rate, subtype="PCM_16")
        _mark("write_wav", tw)
        return {
            "sample_rate": self.cfg.sample_rate,
            "duration_s": len(out) / self.cfg.sample_rate,
            "elapsed_s": round(time.monotonic() - t0, 2),
        }

    # ── internals ───────────────────────────────────────────────────────

    @staticmethod
    def _butter_lowpass(x: np.ndarray, cutoff: int, sr: int) -> np.ndarray:
        nyq = sr / 2
        cutoff = min(cutoff, int(nyq * 0.95))
        sos = butter(8, cutoff / nyq, btype="low", output="sos")
        return sosfiltfilt(sos, x).astype(np.float32)

    def _chunked(
        self, audio: np.ndarray, *, ddim_steps: int, guidance_scale: float,
        seed: int, chunk_size: int, overlap: int,
    ) -> np.ndarray:
        cfg = self.cfg
        n = len(audio)
        if chunk_size <= 0 or n <= chunk_size:
            bucket = pick_bucket(max(n, cfg.hop), WINDOW_BUCKETS)
            padded = np.zeros((1, bucket), np.float32)
            padded[0, :n] = audio
            out = self._run_batch(padded, ddim_steps, guidance_scale, seed)
            return out[0, :n]

        hop = chunk_size - overlap
        spans = []
        for start in range(0, n, hop):
            end = min(start + chunk_size, n)
            spans.append((start, end))
            if end >= n:
                break

        # stack ALL windows and run them as batched DDIM dispatches:
        # W windows share each step's UNet weight streaming (the batch-1
        # UNet is MXU-starved), with one host read per dispatch instead
        # of one per window
        t0 = time.monotonic()
        n_windows = len(spans)
        pieces = np.zeros((n_windows, chunk_size), np.float32)
        for i, (start, end) in enumerate(spans):
            pieces[i, : end - start] = audio[start:end]
        t0 = _mark(f"window-prep ({n_windows} windows)", t0)

        hop_uniform = (
            n_windows >= 2
            and 0 < overlap <= hop
            and all(spans[i] == (i * hop, i * hop + chunk_size)
                    for i in range(n_windows - 1))
        )
        device_stitch = _DEVICE_STITCH and hop_uniform

        in_flight = []  # (row0, bucket, device_out_or_segment)
        row = 0
        while row < n_windows:
            remaining = n_windows - row
            bucket = pick_bucket(remaining, WINDOW_COUNT_BUCKETS)
            count = min(remaining, bucket)
            batch = np.zeros((bucket, chunk_size), np.float32)
            batch[:count] = pieces[row : row + count]
            dev = self._dispatch_batch(batch, ddim_steps, guidance_scale, seed + row)
            if device_stitch:
                # queue this batch's stitch RIGHT BEHIND its diffusion
                # batch, so reading segment i overlaps batch i+1's
                # compute — the session's ~10 MB device→host wire hides
                # behind the DDIM loop instead of serializing after it
                dev = _stitch_batch_segment(
                    dev, jnp.int32(row), jnp.int32(n_windows),
                    chunk=chunk_size, hop=hop, overlap=overlap,
                )
            in_flight.append((row, bucket, dev))
            row += count
        t0 = _mark(f"dispatch ({len(in_flight)} batches)", t0)

        if device_stitch:
            # incremental read: each device_get blocks only on ITS
            # batch's chain; boundary strips (``overlap`` samples) are
            # patched on host with the predecessor's tail contribution.
            last_row0, last_bucket = in_flight[-1][0], in_flight[-1][1]
            out = np.zeros((last_row0 + last_bucket) * hop + overlap, np.float32)
            prev_tail = None  # (num, den) of the previous span's tail
            for row0, bucket, handles in in_flight:
                seg, h_num, h_den, t_num, t_den = jax.device_get(handles)
                span0 = row0 * hop
                out[span0 : span0 + bucket * hop] = _to_float(seg)
                if prev_tail is not None:
                    bnum = h_num + prev_tail[0]
                    bden = h_den + prev_tail[1]
                    out[span0 : span0 + overlap] = bnum / np.maximum(bden, 1e-6)
                prev_tail = (t_num, t_den)
            end0 = (last_row0 + last_bucket) * hop
            if n > end0:  # exact-fit last bucket: the final tail strip
                out[end0:] = prev_tail[0] / np.maximum(prev_tail[1], 1e-6)
            _mark("device-stitch+incremental-read", t0)
            return out[:n]

        enhanced_all = np.zeros((n_windows, chunk_size), np.float32)
        for row0, bucket, dev in in_flight:
            count = min(bucket, n_windows - row0)
            enhanced_all[row0 : row0 + count] = _to_float(dev)[:count, :chunk_size]
        t0 = _mark("device-wait+host-read", t0)

        # Host-side overlap-add with triangular crossfades. Vectorized:
        # uniform spans start at i·hop, so each weighted row decomposes
        # into a [hop] body laid out contiguously plus an [overlap]
        # tail added into the next row's head — a handful of whole-array
        # numpy ops instead of a per-window Python loop (which measured
        # ~1 s of a 3.5 s session: small GIL-holding iterations crawl
        # while the jax client threads are draining device buffers).
        out = np.zeros(n, np.float32)
        weight = np.zeros(n, np.float32)
        # every span except the last is a full chunk at i·hop by
        # construction; vectorize those, scalar-add the remainder(s)
        u = len(spans) - 1
        vectorized = (
            u >= 1
            and 0 < overlap <= hop
            and all(spans[i] == (i * hop, i * hop + chunk_size) for i in range(u))
        )
        start_idx = 0
        if vectorized:
            ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
            w_mat = np.ones((u, chunk_size), np.float32)
            w_mat[1:, :overlap] = ramp            # fade-in (all but first)
            w_mat[:, -overlap:] = ramp[::-1]      # fade-out (end < n for all)
            weighted = enhanced_all[:u] * w_mat
            total = (u - 1) * hop + chunk_size    # == spans[u-1][1] ≤ n
            # bodies: row i's [:hop] lands contiguously at [i·hop, (i+1)·hop)
            out[: u * hop] = weighted[:, :hop].reshape(-1)
            weight[: u * hop] = w_mat[:, :hop].reshape(-1)
            # tails: row i's [hop:] adds into row i+1's head region
            out[: u * hop].reshape(u, hop)[1:, :overlap] += weighted[:-1, hop:]
            weight[: u * hop].reshape(u, hop)[1:, :overlap] += w_mat[:-1, hop:]
            out[u * hop : total] += weighted[-1, hop:]
            weight[u * hop : total] += w_mat[-1, hop:]
            start_idx = u
        for idx in range(start_idx, len(spans)):
            start, end = spans[idx]
            w = np.ones(end - start, np.float32)
            if overlap > 0:
                ramp = np.linspace(0.0, 1.0, min(overlap, len(w)), dtype=np.float32)
                if start > 0:
                    w[: len(ramp)] = ramp
                if end < n:
                    w[-len(ramp):] = ramp[::-1]
            out[start:end] += enhanced_all[idx, : end - start] * w
            weight[start:end] += w
        out = out / np.maximum(weight, 1e-6)
        _mark("overlap-add", t0)
        return out

    def _dispatch_batch(
        self, batch: np.ndarray, ddim_steps: int, guidance_scale: float, seed: int
    ):
        """Queue one batched diffusion dispatch [W, T] WITHOUT a host
        sync (JAX async dispatch); sample-length padded to a bucket."""
        w, t = batch.shape
        bucket = pick_bucket(t, WINDOW_BUCKETS)
        if bucket != t:
            padded = np.zeros((w, bucket), np.float32)
            padded[:, :t] = batch
            batch = padded
        rng = jax.random.PRNGKey(int(seed))
        if self.cfg.dtype != jnp.float32:
            # halve the ~20 MB/s tunnel upload: int16 PCM wire format
            # (exact 16-bit precision; the graph rescales to f32)
            batch = np.round(np.clip(batch, -1.0, 1.0) * 32767.0).astype(np.int16)
        return self._enhance(
            self.params,
            audio_48k=jnp.asarray(batch),
            rng=rng,
            ddim_steps=int(ddim_steps),
            guidance_scale=float(guidance_scale),
        )

    def _run_batch(
        self, batch: np.ndarray, ddim_steps: int, guidance_scale: float, seed: int
    ) -> np.ndarray:
        out = self._dispatch_batch(batch, ddim_steps, guidance_scale, seed)
        return _to_float(out)


__all__ = ["AudioSRRuntime", "SCALES"]
