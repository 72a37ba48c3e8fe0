"""Kernel registry: every hot op has an XLA-native implementation and
(where profitable) a Pallas one, switchable via config (--attn_impl /
--chamfer_impl) with golden-activation tests pinning them to each other."""

from .chamfer import min_sq_dists_xla

_CHAMFER_IMPLS = {"xla": min_sq_dists_xla}
_DEFAULT_CHAMFER = "auto"


def register_chamfer_impl(name, fn):
    _CHAMFER_IMPLS[name] = fn


def set_default_chamfer_impl(name: str) -> None:
    """Wire the --chamfer_impl CLI flag (tulip_tpu/config.py)."""
    global _DEFAULT_CHAMFER
    _DEFAULT_CHAMFER = name


def get_chamfer_impl(name: str = None):
    if name is None:
        name = _DEFAULT_CHAMFER
        if name == "auto":
            # env override of the auto choice (A/B + incident mitigation
            # without code edits); an explicit --chamfer_impl still wins
            import os
            name = os.environ.get("TULIP_TPU_CHAMFER") or name
    if name in ("auto", "xla"):
        # pallas impls register themselves when importable on this backend
        try:
            from .pallas import chamfer as _pc  # noqa: F401
            from .pallas import chamfer_h as _pch  # noqa: F401
            if name == "auto" and "pallas_h" in _CHAMFER_IMPLS:
                import jax
                if jax.default_backend() not in ("cpu",):
                    # hierarchical impl is exact (identical sums to brute
                    # force) and measured 2.1x faster on scene clouds and
                    # 2.5x on uniform clouds on v5e (255/220 ms vs 547 ms
                    # per direction at 262k x 262k, r3 checklist); brute
                    # force stays selectable via --chamfer_impl pallas
                    return _CHAMFER_IMPLS["pallas_h"]
        except Exception:
            pass
        return _CHAMFER_IMPLS["xla"]
    if name in ("pallas", "pallas_h") and name not in _CHAMFER_IMPLS:
        from .pallas import chamfer as _pc  # noqa: F401
        from .pallas import chamfer_h as _pch  # noqa: F401
    return _CHAMFER_IMPLS[name]
