from .dist import (
    init_distributed_mode,
    get_rank,
    get_world_size,
    is_main_process,
    any_process,
    setup_for_distributed,
)
from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_sharding_rules,
    shard_params,
    make_global_batch,
)
