"""XTTS-v2-class engine: GPT AR latent decoder with voice cloning."""
