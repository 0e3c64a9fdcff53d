from situation_recognition_tpu.ops.ggnn import (  # noqa: F401
    GGNNParams,
    ggnn_propagate,
    ggnn_propagate_dense,
    ggnn_propagate_verb,
    init_ggnn_params,
)
