"""Service layer: job store, TTS orchestration, presets, assets, work."""
