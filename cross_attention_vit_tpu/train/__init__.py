from . import checkpoint, loggers, metrics, optim, schedule, trainer  # noqa: F401
