"""Flat-file checkpointing for param pytrees.

Replaces the reference's three checkpoint mechanisms (tf.train.Saver
path-convention trees, Keras .h5 saves, broken text-mode pickle — reference
evaluation_adv.py:222-248, BPR.py:59-65, IRGAN.py:209-211) with one: a
``.npz`` of the flattened pytree keyed by path. Used for periodic snapshots
and for the APR pretrain→adversarial handoff (reference run_adv.py:97-120).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def path_name(path) -> str:
    """Canonical '/'-joined leaf name for a tree path (the single naming
    scheme shared by save/load/pretrain matching)."""
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def _flatten_with_names(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {path_name(path): np.asarray(leaf) for path, leaf in flat}


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten_with_names(params))


def load_params(path: str, like):
    """Load into the structure of ``like`` (names must match)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat:
        name = path_name(p)
        arr = data[name]
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
