from .misc import accum_tensor, compute_metrics, enable_compilation_cache  # noqa: F401
from .profiling import StageTimer, profile_trace  # noqa: F401
