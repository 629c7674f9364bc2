"""Device-platform selection for server/CLI processes.

The TPU plugin in this environment force-appends itself to
``jax_platforms`` regardless of the ``JAX_PLATFORMS`` env var, and the
remote TPU service tolerates only ONE client job at a time — a second
process attaching (e.g. a dev server started while a bench runs) can
wedge the service for everyone. ``VOCALIE_PLATFORM=cpu`` gives
operators a reliable opt-out: it is applied through
``jax.config.update`` *after* import, which is the only override the
plugin honors.

No reference equivalent (the reference selects torch devices per
subprocess, chatterbox_backend.py device pick); this is TPU-deployment
operational tooling.
"""

from __future__ import annotations

import os


def apply_platform_preference() -> str:
    """Apply VOCALIE_PLATFORM (cpu|tpu|axon|default) and return it.

    Must be called before the first jax computation; safe to call more
    than once. Returns the effective preference string.
    """
    pref = (os.environ.get("VOCALIE_PLATFORM") or "default").strip().lower()
    if pref in ("", "default", "auto"):
        return "default"
    import jax

    target = "axon" if pref == "tpu" else pref
    try:
        jax.config.update("jax_platforms", target)
    except Exception:
        pass
    return pref


__all__ = ["apply_platform_preference"]
