"""Weight persistence: param pytrees ↔ .npz bundles on disk.

Replaces the reference's HF-hub snapshot cache + safetensors overlay
(ref: tts_backends/chatterbox_impl.py:63-73, base_runner.py:128-140)
with flat path-keyed npz checkpoints under .assets/<engine>/weights/.
Torch→JAX converters (for real published checkpoints) build the same
pytrees and save through this module.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

_META_NAME = "meta.json"


def _refuse_runtime_repr(tree: Any) -> None:
    """Fused (wqkv/w_gateup) and int8-quantized trees are runtime-only
    representations — reload templates are unfused full-precision, so
    persisting them would poison the weight store."""
    flat = _flatten(tree)
    bad = [k for k in flat if "wqkv" in k or "w_gateup" in k]
    if bad:
        raise RuntimeError(
            f"refusing to save fused decode weights ({bad[0]}); set "
            "VOCALIE_FUSE_QKV=0 and re-create the runtime to save"
        )
    for k, v in flat.items():
        if v.dtype == np.int8:
            raise RuntimeError(
                f"refusing to save int8-quantized weights ({k}); unset "
                "VOCALIE_WEIGHT_INT8 and re-create the runtime to save"
            )


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_params(weights_dir: Path, name: str, params: Any, meta: Dict | None = None) -> Path:
    _refuse_runtime_repr(params)
    weights_dir = Path(weights_dir)
    weights_dir.mkdir(parents=True, exist_ok=True)
    path = weights_dir / f"{name}.npz"
    flat = _flatten(params)
    # npz has no bfloat16: ml_dtypes leaves round-trip as void |V2 and
    # poison load_params. Store them widened to f32 (lossless superset);
    # load_params casts back to the template dtype.
    flat = {
        k: (v.astype(np.float32) if v.dtype.name == "bfloat16" else v)
        for k, v in flat.items()
    }
    np.savez(path, **flat)
    meta_path = weights_dir / _META_NAME
    all_meta = {}
    if meta_path.exists():
        try:
            all_meta = json.loads(meta_path.read_text(encoding="utf-8"))
        except json.JSONDecodeError:
            all_meta = {}
    all_meta[name] = dict(meta or {})
    meta_path.write_text(json.dumps(all_meta, indent=2) + "\n", encoding="utf-8")
    return path


def load_params(weights_dir: Path, name: str, template: Any) -> Any:
    """Load into the structure of *template* (same tree as init)."""
    path = Path(weights_dir) / f"{name}.npz"
    data = np.load(path)
    flat_template = _flatten(template)
    missing = set(flat_template) - set(data.files)
    if missing:
        raise ValueError(f"checkpoint {path} missing keys: {sorted(missing)[:5]} ...")
    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for pth, leaf in leaves_with_path[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
        raw = data[key]
        if raw.dtype.kind == "V" and raw.dtype.itemsize == 2:
            # legacy checkpoint written before bf16→f32 widening on save
            raw = raw.view(jnp.bfloat16)
        arr = jnp.asarray(raw).astype(leaf.dtype)
        if arr.shape != leaf.shape:
            raise ValueError(f"{key}: shape {arr.shape} != template {leaf.shape}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(leaves_with_path[1], new_leaves)


def checkpoint_exists(weights_dir: Path, name: str) -> bool:
    return (Path(weights_dir) / f"{name}.npz").exists()


def load_meta(weights_dir: Path, name: str) -> Dict:
    """The meta dict recorded at save time for checkpoint ``name``
    ({} when absent). Runtimes read shape-determining fields from it
    (e.g. ``text_vocab``) BEFORE building the init template."""
    meta_path = Path(weights_dir) / _META_NAME
    if not meta_path.exists():
        return {}
    try:
        all_meta = json.loads(meta_path.read_text(encoding="utf-8"))
    except json.JSONDecodeError:
        return {}
    entry = all_meta.get(name)
    return dict(entry) if isinstance(entry, dict) else {}


__all__ = ["save_params", "load_params", "checkpoint_exists", "load_meta"]
