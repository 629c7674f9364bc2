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


def load_params_host(weights_dir: Path, name: str, template: Any) -> Any:
    """Load a checkpoint into the structure of *template*, staying on
    the HOST: leaves are numpy arrays cast to the template dtypes.

    ``template`` may be a concrete param tree or a
    ``jax.eval_shape`` result (ShapeDtypeStructs) — the latter lets a
    runtime skip the device init entirely when a checkpoint exists.
    Host-side loading matters through the axon tunnel: per-leaf
    ``jnp.asarray().astype()`` costs one ~90 ms device round trip per
    leaf (~700 leaves ≈ minutes of cold start); a host tree is uploaded
    in ONE batched transfer when passed into the jitted materialize
    program (see :func:`materialize_params`).
    """
    path = Path(weights_dir) / f"{name}.npz"
    data = np.load(path)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = [
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
        for pth, _leaf in leaves_with_path
    ]
    missing = set(keys) - set(data.files)
    if missing:
        raise ValueError(f"checkpoint {path} missing keys: {sorted(missing)[:5]} ...")
    new_leaves = []
    for key, (_pth, leaf) in zip(keys, leaves_with_path):
        raw = data[key]
        if raw.dtype.kind == "V" and raw.dtype.itemsize == 2:
            # legacy checkpoint written before bf16→f32 widening on save
            raw = raw.view(jnp.bfloat16)
        arr = np.asarray(raw).astype(leaf.dtype)  # bf16 via ml_dtypes
        if arr.shape != leaf.shape:
            raise ValueError(f"{key}: shape {arr.shape} != template {leaf.shape}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_params(weights_dir: Path, name: str, template: Any) -> Any:
    """Load into the structure of *template*, placed on device."""
    host = load_params_host(weights_dir, name, template)
    return jax.tree_util.tree_map(jnp.asarray, host)


def materialize_params(build_fn, *args):
    """Run a pure param-building function (init → checkpoint overlay →
    quantize/fuse) as ONE jitted program.

    Cold-start rationale: eager per-leaf tree transforms dispatch
    thousands of tiny one-op programs; through the axon tunnel each
    costs a compile (~0.5–2 s, never persisted under the cache's
    min-compile-time) or a ~90 ms dispatch round trip — measured
    3.5 min of a 5-min chatterbox cold start. One jit = one cacheable
    program + one dispatch. ``None`` args are pytree-empty, so callers
    pass ``None`` for absent checkpoints and branch on it inside
    ``build_fn`` at trace time.
    """
    return jax.jit(build_fn)(*args)


def materialize_bundle(
    weights_dir: Path, sources, transform=None, force_init: bool = False
) -> Dict[str, Any]:
    """Materialize a runtime's whole param bundle as ONE jitted program.

    ``sources``: list of ``(out_name, ckpt_name, init_thunk)``.
    For each source, an existing checkpoint ``ckpt_name`` is loaded
    host-side against the ``jax.eval_shape`` of ``init_thunk`` (so the
    device init never runs); otherwise ``init_thunk()`` runs inside the
    jit. ``transform`` (e.g. quantize+fuse) applies to the assembled
    ``{out_name: params}`` dict inside the same program. ``ckpt_name``
    may be ``None`` for always-init sources.

    One program + one dispatch replaces minutes of per-leaf eager
    tunnel round trips (see :func:`materialize_params`).
    """
    hosts = []
    for _name, ckpt, thunk in sources:
        if not force_init and ckpt is not None and checkpoint_exists(weights_dir, ckpt):
            hosts.append(load_params_host(weights_dir, ckpt, jax.eval_shape(thunk)))
        else:
            hosts.append(None)

    def _build(*host_in):
        parts = {
            name: (h if h is not None else thunk())
            for (name, _ck, thunk), h in zip(sources, host_in)
        }
        return transform(parts) if transform is not None else parts

    return jax.jit(_build)(*hosts)


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


__all__ = [
    "save_params",
    "load_params",
    "load_params_host",
    "materialize_params",
    "materialize_bundle",
    "checkpoint_exists",
    "load_meta",
]
