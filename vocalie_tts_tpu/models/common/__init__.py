"""Shared model components: transformer blocks, embeddings, norms."""
