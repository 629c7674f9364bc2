"""Chatterbox-class engine: T3 AR speech-token decoder + S3Gen-class vocoder."""
