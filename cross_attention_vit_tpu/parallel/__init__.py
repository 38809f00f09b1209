from .mesh import make_mesh, multihost_init  # noqa: F401
from .sharding import (batch_sharding, param_sharding, param_specs,  # noqa: F401
                       replicated, shard_batch, shard_params)
