"""JAX model families.

Shared building blocks live in ``models.common``; each family
(vits, chatterbox, lmtts, cosyvoice, xtts, audiosr) provides a
``runtime`` module exposing a ``*Runtime`` class with
``create(assets_dir, force_init=False)``, ``warmup()``,
``synthesize(...)`` and ``save_weights()``.
"""
