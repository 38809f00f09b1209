from . import attention, initializers, layers, losses, patchify  # noqa: F401
