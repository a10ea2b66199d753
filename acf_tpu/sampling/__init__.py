from acf_tpu.sampling.negatives import (  # noqa: F401
    uniform_negatives, sample_pair_epoch, sample_seq_batch,
    sample_seq_window_batch,
)
