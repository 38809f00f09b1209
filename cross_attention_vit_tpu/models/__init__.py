from . import (cnn_vit, densenet, model_cross, model_vit, surgery,  # noqa: F401
               vit3d)
