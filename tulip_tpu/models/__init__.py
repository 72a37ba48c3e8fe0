from .tulip import (
    tulip_base, tulip_large, init_params, apply_model, TulipModel,
)
