from acf_tpu.train.trainer import Trainer, TrainConfig, make_pair_epoch_fn, make_seq_epoch_fn  # noqa: F401
from acf_tpu.train.checkpoint import save_params, load_params  # noqa: F401
