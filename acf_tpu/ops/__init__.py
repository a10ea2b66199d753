from acf_tpu.ops.ranking import rank_positions_dot  # noqa: F401
