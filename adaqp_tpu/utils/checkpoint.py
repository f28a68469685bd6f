"""Checkpoint / resume.

The reference has NO model-state checkpointing (SURVEY.md §5: training
always restarts from scratch). This adds it: params, optimizer state,
epoch cursor, recorder matrix, bit-width assignment, and trace accumulators
are saved as flat npz archives keyed by the pytree's leaf order (the caller
re-supplies the treedef, so no pickling of JAX internals).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, step: int, state, meta: Optional[Dict[str, Any]] = None):
    """``state`` is any pytree of arrays; atomically writes <path>.npz/.json."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    with open(path + ".json", "w") as f:
        json.dump({"step": step, "num_leaves": len(leaves), "meta": meta or {}}, f)


def load_checkpoint(path: str, state_template) -> Tuple[int, Any, Dict[str, Any]]:
    """Restore into the template's treedef; returns (step, state, meta)."""
    with open(path + ".json") as f:
        info = json.load(f)
    z = np.load(path + ".npz")
    leaves = [z[f"leaf_{i}"] for i in range(info["num_leaves"])]
    treedef = jax.tree.structure(state_template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template expects "
            f"{treedef.num_leaves} (model/config changed since save?)"
        )
    state = jax.tree.unflatten(treedef, leaves)
    return int(info["step"]), state, info.get("meta", {})


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for f in os.listdir(ckpt_dir):
        if f.startswith("ckpt_") and f.endswith(".json"):
            try:
                steps.append(int(f[len("ckpt_") : -len(".json")]))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"ckpt_{max(steps)}")
