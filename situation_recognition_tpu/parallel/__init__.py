from situation_recognition_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    head_param_sharding,
    make_mesh,
    replicated,
)
