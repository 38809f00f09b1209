from .mesh import make_mesh, multihost_init  # noqa: F401
from .moe import (expert_capacity, init_moe_ffn, moe_ffn,  # noqa: F401
                  moe_param_specs, shard_moe_params)
from .pipeline import (active_pipeline_mesh, bubble_fraction,  # noqa: F401
                       pipeline_layers, set_pipeline_mesh, stack_layers,
                       unstack_layers)
from .ring import ring_attention, ring_sdpa  # noqa: F401
from .sharding import (batch_sharding, param_sharding, param_specs,  # noqa: F401
                       replicated, shard_batch, shard_params)
