"""Built-in web UI: the production workflow served by the backend.

The reference ships a Next.js frontend talking to /v1/* through a
rewrite proxy (ref: frontend/src/proxy.ts). That frontend remains
compatible with this backend (same contract, same rewrite target); the
files here additionally provide a zero-toolchain equivalent — a static
single-page app served at ``/`` by the aiohttp server — implementing
the same workflow: presets → text preparation → chunk direction →
schema-driven engine params → generate/poll → waveform → editing →
AudioSR → settings (glossary, voice references).
"""

from pathlib import Path

WEBUI_DIR = Path(__file__).resolve().parent / "static"
