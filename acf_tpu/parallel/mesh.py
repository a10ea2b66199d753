"""Device-mesh scaffolding: data parallelism + row-sharded embedding tables.

The reference is strictly single-process (SURVEY.md §2.2: no DP/TP/PP, no
collectives; its cluster usage is embarrassingly-parallel qsub sweeps,
script.sh:1-12). Distribution is therefore a *new* first-class component of
this framework, built the idiomatic JAX way:

  * a 2-axis ``Mesh`` ("data", "model");
  * batches sharded over "data", embedding tables row-sharded over "model";
  * shardings annotated with ``NamedSharding`` and the train step jitted —
    XLA GSPMD inserts the collectives (all-gather of table rows for lookup,
    psum/reduce-scatter of gradients) over ICI.

Everything degenerates cleanly to 1 device, so the same code runs tests on
CPU and production on a pod slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on the data
    axis."""
    devices = np.array(devices if devices is not None else jax.devices())
    n = devices.size
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model == n, (num_data, num_model, n)
    return Mesh(devices.reshape(num_data, num_model), ("data", "model"))


def table_spec() -> P:
    """Embedding tables: rows sharded over the model axis."""
    return P("model", None)


def replicated_spec() -> P:
    return P()


def shard_params(mesh: Mesh, params, min_rows: int = 1024):
    """Place a param pytree: 2-D tables with ≥ ``min_rows`` rows are
    sharded over "model" — row-wise when the row count divides the axis
    size, otherwise column-wise over the feature dim (Megatron-style; ``d``
    is essentially always a power of two, so real catalogs of awkward size
    still distribute). Everything else is replicated. jax.Array requires
    the sharded dim to divide the axis size exactly; callers who want
    row-sharding for an awkward catalog should pad the table
    (``sharded_embedding.shard_table`` does) — that changes scoring shapes,
    so the trainer prefers this shape-preserving fallback instead."""
    m = mesh.shape["model"]

    def place(x):
        if x.ndim == 2 and x.shape[0] >= max(min_rows, m):
            if x.shape[0] % m == 0:
                spec = P("model", None)
            elif x.shape[1] % m == 0:
                spec = P(None, "model")
            else:
                spec = P()
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def shard_batch(mesh: Mesh, batch):
    """Shard leading batch dimension over the data axis.

    Routes through ``input_pipeline.host_sharded_array`` so each host of a
    multi-host mesh materializes only its local rows (a plain ``device_put``
    of the global array is single-process-only); on one process it
    degenerates to exactly that device_put."""
    from acf_tpu.parallel.input_pipeline import host_sharded_array

    return jax.tree.map(lambda x: host_sharded_array(mesh, x), batch)


def data_parallel_step(mesh: Mesh, loss_and_grad_step):
    """Wrap a (params, batch, key) -> (params, aux) step for SPMD execution:
    jit with batch sharded over "data" and params as placed. XLA inserts the
    gradient psum across the data axis automatically (sum-of-gradients over a
    sharded batch is a cross-replica reduction)."""
    return jax.jit(loss_and_grad_step)
