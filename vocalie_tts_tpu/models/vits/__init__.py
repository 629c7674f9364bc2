"""VITS-class non-autoregressive TTS (Piper fr_FR engine)."""
