from .mesh import make_mesh, multihost_init  # noqa: F401
from .pipeline import (active_pipeline_mesh, bubble_fraction,  # noqa: F401
                       pipeline_layers, set_pipeline_mesh, stack_layers,
                       unstack_layers)
from .ring import ring_attention, ring_sdpa  # noqa: F401
from .sharding import (batch_sharding, param_sharding, param_specs,  # noqa: F401
                       replicated, shard_batch, shard_params)
