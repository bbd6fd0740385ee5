from .mesh import make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    infer_param_sharding,
    shard_batch_spec,
    shard_params,
)
