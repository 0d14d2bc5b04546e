"""Checkpoint save/restore — params + optimizer + extras + config.

Tier-1 of the reference's three cache tiers (SURVEY.md §5
"Checkpoint / resume"): best-valid model checkpoints including
non-parameter extras (the ``other_parameter_name`` analog).  Arrays are
stored as a flat npz keyed by pytree path; structure via a pickled
treedef-free path map, so restore works without the original objects.
"""

from __future__ import annotations

import io
import os
import pickle

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}__seqtype__"] = type(tree).__name__
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree) if tree is not None else None
    return out


def _unflatten(flat: dict):
    # rebuild nested structure from path keys
    root: dict = {}
    seq_markers = {}
    for path, value in flat.items():
        parts = path.split("/")
        if parts[-1] == "__seqtype__":
            seq_markers["/".join(parts[:-1])] = value
            continue
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def fix(node, path=""):
        if not isinstance(node, dict):
            return node
        fixed = {k: fix(v, f"{path}{k}/".lstrip("/")) for k, v in node.items()}
        marker = seq_markers.get(path.rstrip("/"))
        if marker in ("list", "tuple"):
            items = [fixed[str(i)] for i in range(len(fixed))]
            return items if marker == "list" else tuple(items)
        return fixed

    return fix(root)


def save_checkpoint(path: str, state: dict):
    """state: any nested dict/list/tuple of arrays + scalars.

    The write is ATOMIC (tmp file in the same dir + os.replace): in
    multi-process runs every rank writes the (identical, GSPMD-global)
    checkpoint to the same shared-filesystem path while other ranks may
    be loading it for evaluate(load_best_model=True) — a plain open(wb)
    let a reader see a torn file (observed as a flaky rc=1 in the
    2-process CI smoke test)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, state)
    flat = _flatten(host_state)
    arrays = {k: v for k, v in flat.items() if isinstance(v, np.ndarray)}
    meta = {k: v for k, v in flat.items() if not isinstance(v, np.ndarray)}
    buf = io.BytesIO()
    np.savez_compressed(buf, **{k.replace("/", "||"): v
                                for k, v in arrays.items()})
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump({"npz": buf.getvalue(), "meta": meta}, f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    with np.load(io.BytesIO(blob["npz"]), allow_pickle=False) as z:
        arrays = {k.replace("||", "/"): z[k] for k in z.files}
    flat = dict(arrays)
    flat.update(blob["meta"])
    return _unflatten(flat)
