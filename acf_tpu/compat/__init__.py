from acf_tpu.compat.reference_checkpoints import (  # noqa: F401
    load_tf_embeddings, load_keras_h5_embeddings,
)
