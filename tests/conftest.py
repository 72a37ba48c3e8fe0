"""Test env: force CPU backend with 8 virtual devices so device-mesh tests
run without TPU hardware (SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

# The environment's sitecustomize registers the axon TPU plugin and overrides
# jax_platforms to "axon,cpu"; pin tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the model-sized CPU compiles dominate suite
# time; cache them across test processes and reruns.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import sys
import types
import pytest

REFERENCE_ROOT = "/root/reference/tulip"


def _install_reference_stubs():
    """Stub the reference's CUDA/timm deps so its model code imports on CPU.

    - chamfer_distance: CUDA extension, only needed at call time
    - timm.models.layers: DropPath/to_2tuple/trunc_normal_ used by the (dead
      at runtime) swin_transformer_v2 classifier path
    """
    if "chamfer_distance" not in sys.modules:
        stub = types.ModuleType("chamfer_distance")

        class ChamferDistance:  # pragma: no cover - never called in tests
            def __call__(self, *a, **k):
                raise RuntimeError("CUDA chamfer stub")

        stub.ChamferDistance = ChamferDistance
        sys.modules["chamfer_distance"] = stub

    try:
        import timm  # noqa: F401
    except ImportError:
        import torch
        import torch.nn as nn

        timm_mod = types.ModuleType("timm")
        models_mod = types.ModuleType("timm.models")
        layers_mod = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype))
                return x / keep * mask

        def to_2tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

        layers_mod.DropPath = DropPath
        layers_mod.to_2tuple = to_2tuple
        layers_mod.trunc_normal_ = nn.init.trunc_normal_
        models_mod.layers = layers_mod
        timm_mod.models = models_mod
        sys.modules["timm"] = timm_mod
        sys.modules["timm.models"] = models_mod
        sys.modules["timm.models.layers"] = layers_mod


@pytest.fixture(scope="session")
def reference_tulip():
    """Import the reference torch TULIP model (read-only golden oracle)."""
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    _install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import model.tulip as ref_tulip
    return ref_tulip
