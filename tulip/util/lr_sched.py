"""Compat shim for `util.lr_sched` (tulip/util/lr_sched.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.utils.lr_sched import adjust_learning_rate, lr_at_epoch  # noqa: F401
