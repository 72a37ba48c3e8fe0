"""tulip_tpu: a TPU-native JAX/XLA/Pallas framework for LiDAR range-image
super-resolution with the capabilities of ethz-asl/TULIP (CVPR 2024).

The package is layered (see SURVEY.md section 7):

- ``tulip_tpu.config``   typed config + argparse CLI compatible with the
  reference flag set (reference: tulip/main_lidar_upsampling.py:34-140).
- ``tulip_tpu.data``     range-image datasets, loaders and pure-function
  transform pipeline (reference: tulip/util/datasets.py).
- ``tulip_tpu.models``   the TULIP Swin U-Net as pure-functional JAX
  (reference: tulip/model/tulip.py, tulip/model/swin_transformer_v2.py).
- ``tulip_tpu.ops``      XLA + Pallas kernels for the hot ops.
- ``tulip_tpu.train``    jitted train step, optax AdamW, per-iteration
  warmup-cosine LR (reference: tulip/engine_upsampling.py:46-124,
  tulip/util/lr_sched.py).
- ``tulip_tpu.eval``     evaluate / MC-dropout engines, on-device metric
  stack (reference: tulip/engine_upsampling.py:126-608,
  tulip/util/evaluation.py).
- ``tulip_tpu.parallel`` device-mesh setup and rank shims (reference:
  tulip/util/misc.py:172-285).
- ``tulip_tpu.utils``    metric logging, checkpoints (incl. torch .pth
  importer), LR schedule math, observability sinks.
- ``tulip_tpu.etl``      vectorized dataset-creation ETL (reference:
  kitti_utils/, durlar_utils/).
"""

__version__ = "0.1.0"
