from acf_tpu.data.datasets import Interactions, load_dataset, interactions_from_frame  # noqa: F401
