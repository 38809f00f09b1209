from .mesh import make_mesh, multihost_init  # noqa: F401
from .moe import (active_expert_mesh, expert_capacity,  # noqa: F401
                  init_moe_ffn, moe_ffn, moe_param_specs, set_expert_mesh,
                  shard_moe_params)
from .pipeline import (active_pipeline_mesh, bubble_fraction,  # noqa: F401
                       pipeline_layers, set_pipeline_mesh, stack_layers,
                       unstack_layers)
from .ring import (active_seq_mesh, ring_attention, ring_sdpa,  # noqa: F401
                   set_seq_mesh, sharded_ring_sdpa)
from .sharding import (batch_sharding, param_sharding, param_specs,  # noqa: F401
                       replicated, shard_batch, shard_params)
