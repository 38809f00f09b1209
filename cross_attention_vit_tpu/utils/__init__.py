from .misc import accum_tensor, compute_metrics  # noqa: F401
from .profiling import StageTimer, profile_trace  # noqa: F401
