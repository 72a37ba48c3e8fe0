"""Integration tests: multi-chip dry run on the virtual CPU mesh, a short
training loop (loss decreases), checkpoint save/resume round trip."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import apply_model, build_model, init_params
from tulip_tpu.train.step import (init_train_state, make_optimizer,
                                  make_train_step, TrainState)
from tulip_tpu.utils import checkpoint as ckpt_util

# multi-minute CPU-backend compiles: full-model or full-step jits
pytestmark = pytest.mark.slow


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    # compile-check only on a tiny variant to keep CPU time sane:
    # re-derive with small width
    from tulip_tpu.config import model_config
    from tulip_tpu.models.tulip import apply_model, build_model, init_params
    cfg = model_config('tulip_base', img_size=(32, 256),
                       target_img_size=(128, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    low = jnp.zeros((1, 1, 32, 256))
    high = jnp.zeros((1, 1, 128, 256))
    pred, tl, pl = jax.jit(lambda p, x, t: apply_model(
        p, model, x, t, mode="eval", compute_dtype=jnp.bfloat16))(params, low, high)
    assert pred.shape == (1, 1, 128, 256)
    assert np.isfinite(float(tl))


def _tiny_setup(seed=0):
    cfg = model_config('tulip_base', img_size=(16, 256),
                       target_img_size=(64, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, model, params


def test_train_step_reduces_loss():
    """Overfit a single tiny batch for a few steps; loss must drop."""
    cfg, model, params = _tiny_setup()
    tx = make_optimizer(weight_decay=0.01)
    state = init_train_state(params, tx)
    step = make_train_step(model, tx, compute_dtype=jnp.float32, donate=False)

    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 1, (2, 1, 16, 256)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0, 1, (2, 1, 64, 256)).astype(np.float32))

    losses = []
    for i in range(20):
        state, (tl, pl) = step(state, low, high, np.float32(1e-3),
                               jax.random.PRNGKey(i))
        losses.append(float(tl))
    assert losses[-1] < losses[0] * 0.7, losses


def test_grad_accumulation_semantics():
    """Mean gradient over two half-batches equals the full-batch gradient
    (the effective semantics of the reference's loss/accum + summed backward,
    engine_upsampling.py:90-98), and MultiSteps holds parameters fixed until
    the accumulation boundary."""
    cfg, model, params = _tiny_setup()

    rng = np.random.default_rng(1)
    low = rng.uniform(0, 1, (4, 1, 16, 256)).astype(np.float32)
    high = rng.uniform(0, 1, (4, 1, 64, 256)).astype(np.float32)

    def loss_fn(p, lo, hi):
        _, tl, _ = apply_model(p, model, lo, hi, mode="eval",
                               compute_dtype=jnp.float32)
        return tl

    g_full = jax.grad(loss_fn)(params, jnp.asarray(low), jnp.asarray(high))
    g1 = jax.grad(loss_fn)(params, jnp.asarray(low[:2]), jnp.asarray(high[:2]))
    g2 = jax.grad(loss_fn)(params, jnp.asarray(low[2:]), jnp.asarray(high[2:]))
    for k in g_full:
        avg = (np.asarray(g1[k]) + np.asarray(g2[k])) / 2
        np.testing.assert_allclose(avg, np.asarray(g_full[k]),
                                   atol=1e-5, rtol=1e-3, err_msg=k)

    # MultiSteps: params must not move on the first micro-step
    tx2 = make_optimizer(weight_decay=0.01, accum_iter=2)
    s2 = init_train_state(params, tx2)
    step2 = make_train_step(model, tx2, accum_iter=2,
                            compute_dtype=jnp.float32, donate=False)
    s2_mid, _ = step2(s2, jnp.asarray(low[:2]), jnp.asarray(high[:2]),
                      np.float32(1e-3), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(s2_mid.params["norm_up.weight"]),
        np.asarray(params["norm_up.weight"]))
    s2_end, _ = step2(s2_mid, jnp.asarray(low[2:]), jnp.asarray(high[2:]),
                      np.float32(1e-3), jax.random.PRNGKey(0))
    assert not np.array_equal(np.asarray(s2_end.params["norm_up.weight"]),
                              np.asarray(params["norm_up.weight"]))


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, params = _tiny_setup()
    tx = make_optimizer(weight_decay=0.01)
    state = init_train_state(params, tx)
    step = make_train_step(model, tx, compute_dtype=jnp.float32, donate=False)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 1, (2, 1, 16, 256)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0, 1, (2, 1, 64, 256)).astype(np.float32))
    state, _ = step(state, low, high, np.float32(1e-3), jax.random.PRNGKey(0))

    class A:
        output_dir = str(tmp_path)
        resume = ''
        eval = False
        start_epoch = 0
    args = A()
    ckpt_util.save_model(args, 5, state.params, state.opt_state)
    assert os.path.exists(tmp_path / "checkpoint-5.pth")

    ckpt_util.get_latest_checkpoint(args)
    assert args.resume.endswith("checkpoint-5.pth")

    params2, opt2, start_epoch = ckpt_util.load_model(
        args, state.params, state.opt_state)
    assert start_epoch == 6
    for k in state.params:
        np.testing.assert_array_equal(np.asarray(state.params[k]),
                                      np.asarray(params2[k]))


def test_torch_checkpoint_import_roundtrip(tmp_path, reference_tulip):
    """A torch-saved reference checkpoint loads through load_checkpoint and
    produces the same forward as direct state_dict import."""
    import torch
    torch.manual_seed(0)
    ref = reference_tulip.tulip_base(
        img_size=(16, 256), target_img_size=(64, 256), patch_size=(1, 4),
        in_chans=1, window_size=(2, 8), swin_v2=False, pixel_shuffle=True,
        circular_padding=True, log_transform=True, patch_unmerging=True)
    path = str(tmp_path / "ref.pth")
    torch.save({'model': ref.state_dict(), 'epoch': 3}, path)

    ckpt = ckpt_util.load_checkpoint(path)
    assert ckpt["epoch"] == 3
    cfg, model, params = _tiny_setup()
    assert set(ckpt["model"]) == set(params)


def test_perf_flag_grad_equivalence(monkeypatch):
    """The perf A/B env flags must not change training semantics.

    TULIP_TPU_REMAT_BLOCKS=1 (jax.checkpoint around each Swin block,
    models/tulip.py:_run_blocks) recomputes the identical ops in the
    backward, so gradients must match the baseline to rounding noise.
    Run on the bf16 pallas training path — the regime the flag is
    A/B-measured in on the chip."""
    cfg = model_config('tulip_base', img_size=(16, 256),
                       target_img_size=(64, 256), patch_size=(1, 4),
                       window_size=(2, 8), pixel_shuffle=True,
                       circular_padding=True, log_transform=True,
                       patch_unmerging=True, attn_impl='pallas')
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(3)
    low = jnp.asarray(rng.uniform(0, 1, (2, 1, 16, 256)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0, 1, (2, 1, 64, 256)).astype(np.float32))

    def grads(remat):
        monkeypatch.setenv("TULIP_TPU_REMAT_BLOCKS", "1" if remat else "0")

        def loss(p):
            _, tl, _ = apply_model(p, model, low, high, mode="train",
                                   rng=jax.random.PRNGKey(7),
                                   compute_dtype=jnp.bfloat16)
            return tl

        return jax.grad(loss)(params)

    g_base = grads(False)

    def check(g_other, rel, name):
        # relative to each param's own grad scale, with a noise floor tied
        # to the GLOBAL grad scale: tiny-magnitude tensors (qkv/proj
        # biases) are sums of millions of near-cancelling bf16 terms, so
        # their own relative error is amplified by cancellation and a
        # per-tensor relative test is meaningless there.  The floor
        # (5e-4 x global max, ~2e-4 here vs decoder_pred's ~0.4 scale)
        # still catches semantic drift, which shows up at grad scale.
        gmax = max(float(np.abs(np.asarray(v)).max()) for v in g_base.values())
        for k in g_base:
            a, b = np.asarray(g_other[k]), np.asarray(g_base[k])
            tol = max(rel * np.abs(b).max(), 5e-4 * gmax)
            assert np.abs(a - b).max() <= tol, (name, k, np.abs(a - b).max(),
                                                np.abs(b).max())

    # remat: same ops recomputed, but refused into different XLA fusions,
    # so bf16 reductions re-round (observed ~5e-3 of grad scale on CPU)
    check(grads(True), 2e-2, "remat")
