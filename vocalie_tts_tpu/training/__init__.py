"""Training entry points (FR overlay fine-tuning)."""
