"""Checkpoint / resume for SLAM map state.

The reference has no persistence beyond result JPEGs (SURVEY.md §5); a
long-running SfM engine needs real checkpointing.  State is an arbitrary
pytree of arrays + a small metadata dict; storage is a single ``.npz``
written atomically (tmp file + rename) so a crash mid-write never corrupts
the previous checkpoint.  Plain npz keeps the format dependency-free and
inspectable; arrays round-trip bit-exactly.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import numpy as np

_META_KEY = "__checkpoint_meta__"


def save_checkpoint(path: str, state: Any, metadata: Dict | None = None,
                    keep: int = 3) -> str:
    """Atomically write ``state`` (pytree of arrays) to ``path``.

    If ``path`` ends with ``.npz`` it is written directly; otherwise it is
    treated as a directory and a monotonically numbered ``ckpt_NNNNNN.npz``
    is created inside, keeping the last ``keep`` files.
    Returns the file actually written.
    """
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    meta = {"treedef": str(treedef), "n_leaves": len(leaves),
            "metadata": metadata or {}}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)

    if path.endswith(".npz"):
        target = path
        directory = os.path.dirname(path) or "."
    else:
        os.makedirs(path, exist_ok=True)
        existing = sorted(f for f in os.listdir(path)
                          if f.startswith("ckpt_") and f.endswith(".npz"))
        step = (int(existing[-1][5:-4]) + 1) if existing else 0
        target = os.path.join(path, f"ckpt_{step:06d}.npz")
        directory = path

    fd, tmp = tempfile.mkstemp(suffix=".npz.tmp", dir=directory)
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, target)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    if not path.endswith(".npz"):
        existing = sorted(f for f in os.listdir(path)
                          if f.startswith("ckpt_") and f.endswith(".npz"))
        for old in existing[:-keep]:
            os.unlink(os.path.join(path, old))
    return target


def load_checkpoint(path: str, like: Any = None
                    ) -> Tuple[Any, Dict]:
    """Load a checkpoint.  ``path`` may be a ``.npz`` file or a directory
    (latest checkpoint is picked).  If ``like`` (a pytree prototype with the
    same structure) is given, the result has its exact tree structure;
    otherwise a flat list of arrays is returned.

    Returns (state, metadata).
    """
    if not path.endswith(".npz"):
        files = sorted(f for f in os.listdir(path)
                       if f.startswith("ckpt_") and f.endswith(".npz"))
        if not files:
            raise FileNotFoundError(f"no checkpoints in {path}")
        path = os.path.join(path, files[-1])
    with np.load(path) as z:
        meta = json.loads(bytes(z[_META_KEY]).decode())
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    if like is not None:
        treedef = jax.tree.structure(like)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, prototype has "
                f"{treedef.num_leaves}")
        state = jax.tree.unflatten(treedef, leaves)
    else:
        state = leaves
    return state, meta["metadata"]


def latest_step(path: str) -> int:
    """Highest checkpoint number in a directory, or -1 if none."""
    if not os.path.isdir(path):
        return -1
    files = sorted(f for f in os.listdir(path)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    return int(files[-1][5:-4]) if files else -1
