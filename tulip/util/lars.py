"""Compat shim for `util.lars` (tulip/util/lars.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.utils.lars import lars, LarsState  # noqa: F401
