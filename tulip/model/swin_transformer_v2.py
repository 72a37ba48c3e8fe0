"""Compat shim for `model.swin_transformer_v2`
(tulip/model/swin_transformer_v2.py): Swin-v2 blocks + classifier."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.models.swin import (  # noqa: F401
    swin_block_v2, window_attention_v2, window_partition, window_reverse)
from tulip_tpu.models.swin_v2_classifier import (  # noqa: F401
    SwinV2Classifier, apply_swin_v2, build_swin_v2, init_swin_v2_params)
