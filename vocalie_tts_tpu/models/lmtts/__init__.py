"""Qwen3-TTS-class engine: LLM-TTS with custom-voice/design/clone modes."""
