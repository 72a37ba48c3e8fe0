"""Engine shim mirroring the reference module path
(tulip/engine_upsampling.py): re-exports the train/eval engines so downstream
code importing `engine_upsampling` keeps working."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tulip_tpu.train.engine import train_one_epoch          # noqa: F401
from tulip_tpu.eval.engine import evaluate, MCdrop          # noqa: F401
from tulip_tpu.utils.checkpoint import get_latest_checkpoint  # noqa: F401


def enable_dropout(model):  # noqa: D103 - parity stub
    """The reference flips torch Dropout modules to train mode at inference
    (engine_upsampling.py:39-43).  The JAX model is stateless: MC-dropout
    passes mode='mc' to apply_model instead, so this is a no-op kept for API
    parity."""
    return model
