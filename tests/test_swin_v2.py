"""Parity of our Swin-v2 (cosine attention) block against the reference
SwinTransformerBlockV2 / PatchMergingV2 (tulip/model/swin_transformer_v2.py).

The reference's TULIP --swin_v2 path is unusable with the shipped
list-valued --window_size (it crashes on `window_size // 2`), so block-level
parity with square windows is the meaningful contract.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tulip_tpu.config import StageConfig
from tulip_tpu.models import layers as L
from tulip_tpu.models.swin import make_block_static, swin_block_v2
from tulip_tpu.models.tulip import _patch_merging
from tulip_tpu.utils.checkpoint import import_torch_state_dict


@pytest.fixture(scope="module")
def ref_v2(reference_tulip):
    import model.swin_transformer_v2 as m
    return m


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_v2_block_parity(ref_v2, shift):
    import torch
    torch.manual_seed(0)
    dim, heads, window, H, W = 96, 3, 4, 16, 16
    blk = ref_v2.SwinTransformerBlockV2(
        dim=dim, input_resolution=(H, W), num_heads=heads,
        window_size=window, shift_size=shift)
    blk.eval()

    params = {f"b.{k}": jnp.asarray(v) for k, v in
              import_torch_state_dict(blk.state_dict()).items()}

    stage = StageConfig(dim=dim, depth=2, num_heads=heads, grid=(H, W),
                        window=(window, window), shift=(shift, shift),
                        drop_path=(0.0, 0.0))
    # block_idx 1 => shifted when stage.shift != 0
    st = make_block_static(stage, 1 if shift else 0, (window, window))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, H, W, dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = blk(torch.from_numpy(x)).numpy()

    import jax
    with jax.default_matmul_precision("highest"):
        ours = swin_block_v2(params, "b", jnp.asarray(x), st, eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=3e-5, rtol=1e-4)


def test_patch_merging_v2_parity(ref_v2):
    import torch
    torch.manual_seed(1)
    dim, H, W = 96, 8, 8
    pm = ref_v2.PatchMergingV2(input_resolution=(H, W), dim=dim)
    pm.eval()
    params = {f"m.{k}": jnp.asarray(v) for k, v in
              import_torch_state_dict(pm.state_dict()).items()}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, H, W, dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = pm(torch.from_numpy(x)).numpy()
    import jax
    with jax.default_matmul_precision("highest"):
        ours = _patch_merging(params, "m", jnp.asarray(x), swin_v2=True,
                              eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours).reshape(ref_out.shape),
                               ref_out, atol=2e-5, rtol=1e-4)
