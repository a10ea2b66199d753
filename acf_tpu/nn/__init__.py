from acf_tpu.nn.layers import (  # noqa: F401
    layer_norm, dense, glorot_uniform, trunc_normal, dropout,
)
