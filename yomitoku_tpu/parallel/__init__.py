from .mesh import (  # noqa: F401
    batch_sharding,
    dp_mesh,
    make_mesh,
    parseq_param_shardings,
    replicated,
    shard_batch,
    shard_params,
)
from .runner import DataParallel, dp_pages  # noqa: F401
