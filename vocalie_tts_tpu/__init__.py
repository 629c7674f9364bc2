"""vocalie_tts_tpu — a TPU-native voice-over production framework.

Re-implements the capabilities of the Vocalie-TTS reference stack
(FastAPI /v1/* job API, pluggable TTS engines, deterministic text
preparation, session/output management) on an idiomatic JAX/XLA/Pallas
compute path: in-process engines with resident jitted model state
replace the reference's per-chunk venv subprocesses
(ref: tts_backends/base_runner.py:278-332).

Layout:
  text/      deterministic text preparation (normalize/lexique/chunk/render)
  dsp/       device-side audio DSP (resample, fades, trim, stitch) in JAX
  ops/       Pallas kernels + AR decode infrastructure (KV cache, sampling)
  models/    JAX model families (VITS, T3/Chatterbox-class, LLM-TTS, flow, SR)
  engines/   engine protocol, registry, catalog and engine implementations
  parallel/  device mesh + sharding helpers for multi-chip serving
  server/    aiohttp /v1/* API, services, schemas, security, rate limiting
  io/        WAV I/O, sessions, output naming, voice reference library
  cli/       vocalie-backend process-lifecycle CLI
  utils/     small shared helpers
"""

__version__ = "0.1.0"
API_VERSION = "v1"
