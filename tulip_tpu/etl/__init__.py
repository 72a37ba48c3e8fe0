from .kitti import create_range_map, load_from_bin
from .durlar import pcd_to_img
