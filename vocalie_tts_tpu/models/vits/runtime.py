"""VITS engine runtime: bucketing, batching, weights, warm compile.

The runtime owns resident jitted programs (one per (batch, phone,
frame) bucket) and implements the engine-facing synthesize API. The
reference pays a full venv-subprocess + model load per chunk
(ref: tts_backends/base_runner.py:278-332); here a chunk is one
device call, and a multi-chunk script is ONE batched device call.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vocalie_tts_tpu.models.common.weights import save_params
from vocalie_tts_tpu.models.vits.model import (
    VITSConfig,
    decode_frames,
    encode_and_durations,
    init_vits,
)
from vocalie_tts_tpu.ops.kv_cache import pick_bucket
from vocalie_tts_tpu.text.phonemes import text_to_phone_ids

PHONE_BUCKETS = (64, 128, 256, 512)
BATCH_BUCKETS = (1, 2, 4, 8)
FRAME_BUCKETS = (128, 256, 512, 1200)

#: "full" is Piper-medium scale; tiny serves CI
SCALES = {
    "full": VITSConfig(),
    "small": VITSConfig(d_model=128, n_layers=4, d_ff=512, latent_dim=128,
                        n_flows=2, flow_hidden=128, dp_filter=128),
    "tiny": VITSConfig(
        d_model=32, n_layers=2, n_heads=2, d_ff=64, latent_dim=32,
        n_flows=2, flow_hidden=32, flow_wn_layers=2, dp_filter=32,
        dp_flows=2, max_phones=128, max_frames=256, vocoder_channels=64,
    ),
}

_VOICE_TO_SPEAKER = {
    "fr_FR-siwis-medium": 0,
    "fr_FR-upmc-medium": 1,
    "fr_FR-tom-medium": 2,
}


class VITSRuntime:
    """Piper-class engine runtime on resident JAX state."""

    def __init__(self, params, cfg: VITSConfig, weights_dir: Path,
                 id_map=None) -> None:
        self.params = params
        self.cfg = cfg
        self.weights_dir = weights_dir
        #: published espeak phoneme_id_map (text/piper_ids.py) when the
        #: voice's config.json is staged beside the weights; the in-repo
        #: phone inventory otherwise
        self._id_map = id_map
        self._rng = jax.random.PRNGKey(0)
        # two-stage: A predicts durations, the host picks the smallest
        # frame bucket that fits, B renders only that many frames — the
        # vocoder (the dominant FLOPs) stops paying for max_frames
        self._stage_a = jax.jit(
            functools.partial(encode_and_durations, cfg=cfg),
            static_argnames=("length_scale", "noise_w"),
        )
        self._stage_b = jax.jit(
            functools.partial(decode_frames, cfg=cfg),
            static_argnames=("max_frames", "noise_scale"),
        )

    # ── lifecycle ───────────────────────────────────────────────────────

    @classmethod
    def create(cls, assets_dir: Path, force_init: bool = False) -> "VITSRuntime":
        import dataclasses
        import logging
        import os

        from vocalie_tts_tpu.models.common.weights import load_meta
        from vocalie_tts_tpu.text.piper_ids import load_piper_id_map

        cfg = SCALES[os.environ.get("VOCALIE_MODEL_SCALE", "full")]
        weights_dir = Path(assets_dir) / "weights"
        id_map = None
        if not force_init:
            # published voices define their own phoneme-id space —
            # n_phones comes from the converted checkpoint's meta and
            # the id translation from its staged config.json
            n_phones = int(load_meta(weights_dir, "vits").get(
                "n_phones", cfg.n_phones))
            if n_phones != cfg.n_phones:
                cfg = dataclasses.replace(cfg, n_phones=n_phones)
            id_map = load_piper_id_map(Path(assets_dir))
            if id_map is not None and id_map.max_id >= cfg.n_phones:
                logging.getLogger("vocalie_api").warning(
                    "piper voice config maps ids up to %d but the phone "
                    "embedding has %d rows — ignoring the id map",
                    id_map.max_id, cfg.n_phones,
                )
                id_map = None
        from vocalie_tts_tpu.models.common.weights import materialize_bundle

        params = materialize_bundle(
            weights_dir,
            [("vits", "vits", lambda: init_vits(jax.random.PRNGKey(42), cfg))],
            force_init=force_init,
        )["vits"]
        return cls(params, cfg, weights_dir, id_map=id_map)

    def save_weights(self) -> None:
        save_params(
            self.weights_dir,
            "vits",
            self.params,
            meta={"family": "vits", "sample_rate": self.cfg.sample_rate,
                  "n_phones": self.cfg.n_phones},
        )

    def warmup(self) -> None:
        self.synthesize("Bonjour le monde.", voice="fr_FR-siwis-medium")

    # ── synthesis ───────────────────────────────────────────────────────

    def _pick_cfg_buckets(self, n_phones: int) -> int:
        return pick_bucket(n_phones, PHONE_BUCKETS)

    def synthesize(
        self,
        text: str,
        *,
        voice: str = "fr_FR-siwis-medium",
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
    ) -> Tuple[np.ndarray, int, Dict[str, Any]]:
        results = self.synthesize_batch(
            [text],
            voice=voice,
            length_scale=length_scale,
            noise_scale=noise_scale,
            noise_w=noise_w,
        )
        return results[0]

    def synthesize_batch(
        self,
        texts: List[str],
        *,
        voice: str = "fr_FR-siwis-medium",
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
        progress_cb=None,
    ) -> List[Tuple[np.ndarray, int, Dict[str, Any]]]:
        """One padded, bucketed device call for the whole chunk list."""
        t0 = time.monotonic()
        speaker = _VOICE_TO_SPEAKER.get(voice, 0)
        if self._id_map is not None:
            seqs = [self._id_map.encode_text(t)[: self.cfg.max_phones]
                    for t in texts]
        else:
            seqs = [text_to_phone_ids(t)[: self.cfg.max_phones] for t in texts]
        max_len = max((len(s) for s in seqs), default=1)
        phone_bucket = self._pick_cfg_buckets(max_len)
        batch_bucket = pick_bucket(len(seqs), BATCH_BUCKETS)

        phones = np.zeros((batch_bucket, phone_bucket), np.int32)
        lengths = np.zeros((batch_bucket,), np.int32)
        for i, s in enumerate(seqs):
            s = s[:phone_bucket]
            phones[i, : len(s)] = s
            lengths[i] = len(s)

        self._rng, k1, k2 = jax.random.split(self._rng, 3)
        h, durations = self._stage_a(
            self.params,
            phones=jnp.asarray(phones),
            phone_lengths=jnp.asarray(lengths),
            speaker_id=jnp.full((batch_bucket,), speaker, jnp.int32),
            rng=k1,
            length_scale=float(length_scale),
            noise_w=float(noise_w),
        )
        total_frames = int(np.asarray(jnp.max(jnp.sum(durations, axis=1))))
        frame_bucket = pick_bucket(max(total_frames, 1), FRAME_BUCKETS)
        audio, sample_lengths = self._stage_b(
            self.params,
            stats=h,
            durations=durations,
            rng=k2,
            max_frames=frame_bucket,
            speaker_id=jnp.full((batch_bucket,), speaker, jnp.int32),
            noise_scale=float(noise_scale),
        )
        # one host round trip for both outputs (tunnel: ~90 ms/read)
        audio, sample_lengths = jax.device_get((audio, sample_lengths))
        audio = np.asarray(audio, np.float32)
        sample_lengths = np.asarray(sample_lengths)
        elapsed = time.monotonic() - t0

        out: List[Tuple[np.ndarray, int, Dict[str, Any]]] = []
        for i in range(len(seqs)):
            n = int(min(sample_lengths[i], audio.shape[1]))
            clip = audio[i, :n]
            meta = {
                "engine": "piper",
                "phones": int(lengths[i]),
                "elapsed_ms_batch": round(elapsed * 1000, 1),
                "batch_bucket": batch_bucket,
                "phone_bucket": phone_bucket,
                "frame_bucket": frame_bucket,
            }
            out.append((clip, self.cfg.sample_rate, meta))
            if progress_cb:
                progress_cb((i + 1) / len(seqs))
        return out


__all__ = ["VITSRuntime"]
