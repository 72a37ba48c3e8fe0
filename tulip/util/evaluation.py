"""Compat shim for `util.evaluation` (tulip/util/evaluation.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.eval.geometry import (                     # noqa: F401
    img_to_pcd_carla, img_to_pcd_durlar, img_to_pcd_kitti)
from tulip_tpu.eval.metrics import (                      # noqa: F401
    calculate_metrics, chamfer_distance, depth_wise_unconcate,
    inverse_huber_loss, mean_absolute_error, voxelize_point_cloud)
