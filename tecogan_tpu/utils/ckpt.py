"""Checkpoint IO.

Native format: flat .npz with '/'-joined pytree paths — fast, dependency-free
and mmap-friendly. Reference .pth files are converted on load via
``tecogan_tpu.models.convert`` (torch is imported lazily and only then).

Unlike the reference (whose ``save_training_state`` is an unimplemented TODO,
`base_model.py:220-222`, so resume loses optimizer moments), the training
state here includes optimizer state and step counters.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "load_generator_params",
           "latest_training_state"]

_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    # empty dicts/sequences (e.g. optax EmptyState) vanish on save; that
    # is safe for the positional leaf rebind in try_resume — they carry
    # zero leaves on both the saved and the live side
    if isinstance(tree, dict):
        for k, v in tree.items():
            if not isinstance(k, str) or _SEP in k or k.startswith("#"):
                # stringified non-str keys (or keys colliding with the
                # path syntax) do not round-trip: '2' and '10' sort
                # differently as str vs int, silently permuting leaves
                # against the live treedef on resume
                raise ValueError(
                    f"cannot checkpoint dict key {k!r} at {prefix!r}: "
                    f"keys must be '{_SEP}'-free, non-'#' strings")
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{_SEP}"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            items = sorted(node.items(), key=lambda kv: int(kv[0][1:]))
            return tuple(fix(v) for _, v in items)
        return {k: fix(v) for k, v in node.items()}

    return fix(tree)


def save_pytree(tree, path):
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    # pid-unique temp name: even though checkpointing is rank-0-only,
    # concurrent writers (crashed+relaunched jobs on shared storage) must
    # never interleave into the same temp file
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_pytree(path):
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def load_generator_params(path, nb: int = 10, scale: int = 4):
    """Load generator params from a native .npz or a reference .pth."""
    if path.endswith(".pth"):
        from ..models import convert

        return convert.convert_frnet(convert.load_state_dict(path), nb, scale)
    return load_pytree(path)


def latest_training_state(ckpt_dir):
    """Most recent 'state_iter{N}.npz' in ckpt_dir, or None (auto-resume)."""
    if not osp.isdir(ckpt_dir):
        return None
    cands = []
    for f in os.listdir(ckpt_dir):
        if f.startswith("state_iter") and f.endswith(".npz"):
            try:
                cands.append((int(f[len("state_iter"):-len(".npz")]), f))
            except ValueError:
                pass
    if not cands:
        return None
    return osp.join(ckpt_dir, max(cands)[1])
