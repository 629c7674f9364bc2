"""CosyVoice-class engine: token LM + conditional flow matching + vocoder."""
