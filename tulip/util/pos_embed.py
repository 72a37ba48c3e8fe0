"""Compat shim for `util.pos_embed` (tulip/util/pos_embed.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.utils.pos_embed import (  # noqa: F401
    get_1d_sincos_pos_embed_from_grid, get_2d_sincos_pos_embed,
    get_2d_sincos_pos_embed_from_grid, interpolate_pos_embed)
