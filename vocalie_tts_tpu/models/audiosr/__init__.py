"""AudioSR-class engine: latent-diffusion audio super-resolution to 48 kHz."""
