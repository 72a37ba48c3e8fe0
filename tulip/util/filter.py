"""Compat shim for `util.filter` (tulip/util/filter.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.utils.filter import (  # noqa: F401
    HorizontalEdgeDetectionCNN, VerticalEdgeDetectionCNN,
    horizontal_edges, vertical_edges)
