"""Compat shim for `util.lr_decay` (tulip/util/lr_decay.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.utils.lr_decay import (  # noqa: F401
    get_layer_id, lr_scale_tree, scale_by_lr_tree)
