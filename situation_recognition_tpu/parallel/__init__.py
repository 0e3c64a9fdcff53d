from situation_recognition_tpu.parallel.distributed import (  # noqa: F401
    fetch,
    init_distributed,
    is_main_process,
    make_distributed_mesh,
)
from situation_recognition_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    head_param_sharding,
    make_mesh,
    replicated,
)
