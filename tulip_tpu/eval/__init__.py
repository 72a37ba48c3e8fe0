from .geometry import img_to_pcd_durlar, img_to_pcd_kitti, img_to_pcd_carla
from .metrics import (
    chamfer_distance, voxelize_point_cloud, calculate_metrics,
    mean_absolute_error, inverse_huber_loss,
)
