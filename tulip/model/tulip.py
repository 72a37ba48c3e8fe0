"""Compat shim for `model.tulip` (tulip/model/tulip.py): the TULIP model
family as functional JAX."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.models.tulip import (  # noqa: F401
    TulipModel, apply_model, build_model, init_params, tulip_base,
    tulip_large)
