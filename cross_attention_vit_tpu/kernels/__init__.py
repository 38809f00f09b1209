from . import flash_attention  # noqa: F401
from . import resample  # noqa: F401
