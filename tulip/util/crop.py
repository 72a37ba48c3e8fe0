"""Compat shim for `util.crop` (tulip/util/crop.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.utils.crop import RandomResizedCrop  # noqa: F401
