from mirage_tpu.nn import init  # noqa: F401
from mirage_tpu.nn.layers import (  # noqa: F401
    gelu,
    layer_norm,
    linear,
    linear_init,
    layer_norm_init,
    mlp_init,
    mlp_apply,
)
from mirage_tpu.nn.posemb import build_2d_sincos_posemb  # noqa: F401
from mirage_tpu.nn.resize import resize2d  # noqa: F401
