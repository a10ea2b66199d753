from acf_tpu.parallel.mesh import make_mesh, shard_params, shard_batch, data_parallel_step  # noqa: F401
