from . import model_cross, model_vit  # noqa: F401
