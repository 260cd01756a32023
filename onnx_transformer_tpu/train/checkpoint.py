"""Checkpointing: full train-state save/resume.

The reference checkpoints only the model ``state_dict`` once per epoch, with
no optimizer state and no step-level resume (``iwslt14_train.py:436-438,454-456``).
Here the entire train state pytree (params, optimizer moments, step) round-trips
through a single ``.npz`` plus a structure manifest, host-independent and
framework-free (numpy only), so training resumes exactly.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save(path: str, tree: Any) -> None:
    """Atomically write a pytree of arrays/scalars to ``path`` (.npz)."""
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def restore(path: str, template: Any) -> Any:
    """Load into the structure of ``template`` (values replaced, dtypes kept)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_t, leaf in leaves_t:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_t)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        tmpl = np.asarray(leaf)
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(f"shape mismatch at {key}: ckpt {arr.shape} vs template {tmpl.shape}")
        new_leaves.append(arr.astype(tmpl.dtype) if arr.dtype != tmpl.dtype else arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_params_with_meta(path: str, params: Any, meta: dict) -> None:
    save(path, params)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2)


def load_meta(path: str) -> dict:
    with open(path + ".meta.json", "r") as f:
        return json.load(f)
