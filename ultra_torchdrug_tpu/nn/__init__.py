from .core import (
    count_params,
    embedding_apply,
    embedding_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)
