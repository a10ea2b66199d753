"""Checkpointing for param/train-state pytrees.

Replaces the reference's three checkpoint mechanisms (tf.train.Saver
path-convention trees, Keras .h5 saves, broken text-mode pickle — reference
evaluation_adv.py:222-248, BPR.py:59-65, IRGAN.py:209-211) with one naming
scheme and two storage backends:

* ``npz`` (default) — a single ``.npz`` of the flattened pytree keyed by
  path. Simple, greppable, fine for single-host tables.
* ``orbax`` — a directory checkpoint via orbax (SURVEY.md §7.1 step 5).
  Understands ``jax.sharding`` (each host writes its own shards of
  row-sharded embedding tables — no gather to one host), and
  :class:`AsyncSnapshotter` overlaps periodic snapshot IO with training.

Used for periodic snapshots and for the APR pretrain→adversarial handoff
(reference run_adv.py:97-120).
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


def save_params(path: str, params, backend: str = "npz") -> None:
    if backend == "orbax":
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ck:
            ck.save(os.path.abspath(path), params, force=True)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_flatten_with_names(params))


def load_params(path: str, like, backend: str = "auto"):
    """Load into the structure of ``like`` (names must match).

    ``backend="auto"`` detects the format on disk: an orbax checkpoint is a
    directory, an npz snapshot is a file (possibly missing its suffix).
    """
    if backend == "auto":
        backend = "orbax" if os.path.isdir(path) else "npz"
    if backend == "orbax":
        import orbax.checkpoint as ocp
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        with ocp.StandardCheckpointer() as ck:
            return ck.restore(os.path.abspath(path), abstract)
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


class AsyncSnapshotter:
    """Non-blocking periodic snapshots (orbax ``AsyncCheckpointer``): the
    device→host copy happens synchronously but serialization/IO overlap with
    the next training block. The reference's Saver/h5 saves are fully
    blocking. Call :meth:`wait` (or use as a context manager) before reading
    the files or exiting."""

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ck = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state) -> None:
        self._ck.save(os.path.abspath(path), state, force=True)

    def wait(self) -> None:
        self._ck.wait_until_finished()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self._ck.close()
