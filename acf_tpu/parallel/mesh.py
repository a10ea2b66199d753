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


def ensure_virtual_devices(n: int) -> None:
    """Self-configure an n-device CPU platform when the runtime exposes
    fewer real devices (e.g. the 1-chip axon tunnel, or a bare CPU run
    without --xla_force_host_platform_device_count). Round-1 lesson: mesh
    entry points must not depend on the caller's environment. NOTE: this
    clears live backends and forces the CPU platform — it is a TESTING
    fallback, never a production path."""
    import jax.extend  # not re-exported by the bare `jax` namespace

    if len(jax.devices()) >= n:
        return
    # order matters: jax_num_cpu_devices refuses to update while a backend
    # is live, and len(jax.devices()) above initialized one
    jax.extend.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    assert len(jax.devices()) >= n, (len(jax.devices()), n)


def mesh_from_spec(spec: str) -> Mesh:
    """Parse a ``--mesh`` CLI spec: ``"4x2"`` → 4-way data × 2-way model,
    ``"8"`` → 8-way data parallel. Falls back to virtual CPU devices when
    the runtime has fewer than data×model devices (testing; see
    :func:`ensure_virtual_devices`)."""
    parts = spec.lower().replace("×", "x").split("x")
    try:
        if len(parts) > 2:
            raise ValueError(spec)
        num_data = int(parts[0])
        num_model = int(parts[1]) if len(parts) > 1 else 1
        if num_data < 1 or num_model < 1:
            raise ValueError(spec)
    except (ValueError, IndexError):
        raise ValueError(
            f"--mesh expects DATAxMODEL (e.g. 4x2) or N with positive "
            f"sizes, got {spec!r}")
    n = num_data * num_model
    if len(jax.devices()) < n:
        # Falling back to virtual CPU devices silently *moves the whole run
        # off the accelerator* — make that impossible to miss (round-3
        # advisor finding), and refusable for production launchers.
        import os
        import sys

        msg = (f"acf_tpu: --mesh {spec} needs {n} devices but only "
               f"{len(jax.devices())} real device(s) exist — falling back "
               f"to {n} VIRTUAL CPU devices. The entire run will execute "
               "on CPU, not the accelerator. Set ACF_TPU_NO_VIRTUAL_MESH=1 "
               "to make this an error.")
        if os.environ.get("ACF_TPU_NO_VIRTUAL_MESH"):
            raise RuntimeError(msg)
        print("=" * 72 + f"\nWARNING: {msg}\n" + "=" * 72,
              file=sys.stderr, flush=True)
        ensure_virtual_devices(n)
    return make_mesh(num_data=num_data, num_model=num_model,
                     devices=jax.devices()[:n])


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


def data_constrainer(mesh: Optional[Mesh]):
    """Batch-sharding hook for GSPMD mesh training: constrain each step's
    batch tensors to ``P("data", ...)`` so XLA parallelizes the step over
    the data axis (and psums gradients) instead of replicating the compute.
    Identity when ``mesh`` is None — the single-device program is unchanged.

    Used by every epoch builder in the framework (the trainer's pair/seq
    paths and the bespoke ``make_epoch_fn`` programs of the GAN /
    discriminator / windowed models), so ``TrainConfig.mesh`` means the
    same thing for the whole zoo."""
    if mesh is None:
        return lambda *xs: xs if len(xs) != 1 else xs[0]

    def constrain(*xs):
        out = tuple(
            jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))
            for x in xs)
        return out if len(out) != 1 else out[0]

    return constrain


def data_parallel_step(mesh: Mesh, loss_and_grad_step):
    """Wrap a (params, batch, key) -> (params, aux) step for SPMD execution:
    jit with batch sharded over "data" and params as placed. XLA inserts the
    gradient psum across the data axis automatically (sum-of-gradients over a
    sharded batch is a cross-replica reduction)."""
    return jax.jit(loss_and_grad_step)
