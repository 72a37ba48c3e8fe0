"""Forward-pass parity of the JAX TULIP vs the reference torch TULIP.

The torch reference is the golden oracle: build it with shipped configs,
export its state_dict through our importer, and require the fp32 forward
outputs to agree to float tolerance.  Covers all head/upsample variants and
the window-H fallback path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import build_model, apply_model, init_params
from tulip_tpu.utils.checkpoint import import_torch_state_dict

# The base-size configs compile in ~15 s on CPU (grouped-attn downgrade),
# so the key-parity check and the shipped-config forward oracle run in the
# fast lane — a bare `pytest` keeps a real model-vs-torch parity gate
# (advisor r3: the default lane had no numerical-parity signal).  The
# tulip_large / extra-shape variants stay slow-marked.


def _build_pair(reference_tulip, variant, img_size, target_img_size, **flags):
    import torch
    torch.manual_seed(0)
    factory = getattr(reference_tulip, variant)
    ref = factory(img_size=img_size, target_img_size=target_img_size,
                  patch_size=(1, 4), in_chans=1, window_size=(2, 8),
                  swin_v2=False, **flags)
    ref.eval()

    cfg = model_config(variant, img_size=img_size,
                       target_img_size=target_img_size,
                       patch_size=(1, 4), window_size=(2, 8), **flags)
    model = build_model(cfg)
    params = {k: jnp.asarray(v)
              for k, v in import_torch_state_dict(ref.state_dict()).items()}
    return ref, model, params


def _compare(ref, model, params, img_size, tol=2e-5):
    import torch
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 1, *img_size)).astype(np.float32)
    t = rng.uniform(0, 1, (2, 1, *model.cfg.target_img_size)).astype(np.float32)

    with torch.no_grad():
        ref_pred, ref_loss, ref_ploss = ref(torch.from_numpy(x),
                                            torch.from_numpy(t), eval=True)
    pred, loss, ploss = apply_model(params, model, jnp.asarray(x),
                                    jnp.asarray(t), mode="eval")
    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(),
                               atol=tol, rtol=1e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=tol, rtol=1e-4)
    np.testing.assert_allclose(float(ploss), float(ref_ploss), atol=tol, rtol=1e-4)


def test_param_key_parity(reference_tulip):
    """Importer must map every torch param; our init must produce the same keys."""
    ref, model, params = _build_pair(
        reference_tulip, "tulip_base", (32, 256), (128, 256),
        pixel_shuffle=True, circular_padding=True, log_transform=True,
        patch_unmerging=True)
    ours = init_params(jax.random.PRNGKey(0), model.cfg)
    assert set(ours) == set(params), (
        sorted(set(ours) ^ set(params))[:10])
    for k in ours:
        assert ours[k].shape == params[k].shape, (
            k, ours[k].shape, params[k].shape)


def test_forward_parity_shipped_config(reference_tulip):
    """The config every shipped bash script uses: pixel_shuffle +
    circular_padding + patch_unmerging + log_transform."""
    ref, model, params = _build_pair(
        reference_tulip, "tulip_base", (32, 256), (128, 256),
        pixel_shuffle=True, circular_padding=True, log_transform=True,
        patch_unmerging=True)
    _compare(ref, model, params, (32, 256))


@pytest.mark.slow
def test_forward_parity_default_heads(reference_tulip):
    """FinalPatchExpanding head + PatchExpanding decoder (no flags)."""
    ref, model, params = _build_pair(
        reference_tulip, "tulip_base", (32, 256), (128, 256),
        pixel_shuffle=False, circular_padding=False, log_transform=False,
        patch_unmerging=False)
    _compare(ref, model, params, (32, 256))


@pytest.mark.slow
def test_forward_parity_large(reference_tulip):
    """tulip_large: 5 stages, 48 heads at the bottleneck."""
    ref, model, params = _build_pair(
        reference_tulip, "tulip_large", (32, 512), (128, 512),
        pixel_shuffle=True, circular_padding=True, log_transform=True,
        patch_unmerging=True)
    _compare(ref, model, params, (32, 512))


@pytest.mark.slow
def test_forward_parity_window_fallback(reference_tulip):
    """tulip_large on a 16-row input: the deepest stage grid has H=1 < 2, so
    the reference's runtime window fallback (tulip.py:284-287) fires; our
    static resolution must reproduce it (including the original-window
    relative-position index)."""
    ref, model, params = _build_pair(
        reference_tulip, "tulip_large", (16, 1024), (64, 1024),
        pixel_shuffle=True, circular_padding=True, log_transform=True,
        patch_unmerging=True)
    # sanity: the fallback actually triggered in our static config
    assert model.cfg.encoder_stages[-1].window == (1, 16)
    _compare(ref, model, params, (16, 1024))


@pytest.mark.slow
def test_forward_parity_kitti_shape(reference_tulip):
    """KITTI geometry: 16x1024 -> 64x1024 (narrow grid rows at depth)."""
    ref, model, params = _build_pair(
        reference_tulip, "tulip_base", (16, 256), (64, 256),
        pixel_shuffle=True, circular_padding=True, log_transform=True,
        patch_unmerging=True)
    _compare(ref, model, params, (16, 256))
