"""Compat shim for the reference module path `util.misc`
(tulip/util/misc.py): rank helpers, metric logger, checkpoint save/load.
The AMP GradScaler is a stub — bf16 on TPU needs no loss scaling."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.utils.logger import (                      # noqa: F401
    MetricLogger, SmoothedValue, setup_for_distributed)
from tulip_tpu.parallel.dist import (                     # noqa: F401
    all_reduce_mean, barrier, get_rank, get_world_size, is_main_process)
from tulip_tpu.parallel.mesh import init_distributed_mode  # noqa: F401
from tulip_tpu.utils.checkpoint import (                  # noqa: F401
    initialize_decoder_weights, load_checkpoint, load_model, save_checkpoint,
    save_model)


class NativeScalerWithGradNormCount:
    """No-op scaler shim: bf16 has fp32 exponent range, so the reference's
    GradScaler (misc.py:288-315) has no TPU equivalent; the state_dict keeps
    checkpoint dict compatibility."""
    state_dict_key = "amp_scaler"

    def __call__(self, *a, **k):
        raise NotImplementedError(
            "loss scaling is not used on TPU; see tulip_tpu.train.step")

    def state_dict(self):
        return {}

    def load_state_dict(self, state_dict):
        pass


def save_on_master(*args, **kwargs):
    if is_main_process():
        import pickle
        obj, path = args[0], args[1]
        with open(path, "wb") as f:
            pickle.dump(obj, f)
