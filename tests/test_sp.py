"""Sequence parallelism (W-axis shard_map, parallel/sp.py): forward and
gradients must match the unsharded model exactly — the halo exchange and the
body/last mask selection are pure reorganizations of the same math.

Runs on the 8-virtual-device CPU mesh (conftest.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tulip_tpu.config import model_config
from tulip_tpu.models.tulip import apply_model, build_model, init_params
from tulip_tpu.parallel.mesh import make_mesh
from tulip_tpu.parallel.sp import (build_sp_statics, make_sp_forward,
                                   make_sp_train_step, max_sp_degree)

# multi-minute CPU-backend compiles: full-model or full-step jits
pytestmark = pytest.mark.slow

IMG, TARGET = (32, 1024), (128, 1024)


@pytest.fixture(scope="module")
def setup():
    cfg = model_config("tulip_base", img_size=IMG, target_img_size=TARGET,
                       patch_size=(1, 4), window_size=(2, 8),
                       pixel_shuffle=True, circular_padding=True,
                       log_transform=True, patch_unmerging=True)
    model = build_model(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.uniform(0, 1, (4, 1, *IMG)).astype(np.float32))
    high = jnp.asarray(rng.uniform(0, 1, (4, 1, *TARGET)).astype(np.float32))
    return model, params, low, high


def test_sp_statics_mask_variants(setup):
    model, *_ = setup
    sp = build_sp_statics(model, 2)
    saw_variant = False
    for stage in sp.enc + sp.dec:
        for blk in stage:
            if blk.st.mask is None:
                assert blk.gmask_body is None
            else:
                saw_variant = True
                # body differs from last exactly in the W-boundary windows
                assert blk.gmask_body.shape == blk.st.group_mask.shape
                assert not np.array_equal(blk.gmask_body, blk.st.group_mask)
    assert saw_variant


def test_sp_forward_matches_unsharded(setup):
    model, params, low, _ = setup
    mesh = make_mesh((2, 2), axis_names=("data", "seq"))
    fwd = make_sp_forward(model, mesh, compute_dtype=jnp.float32)

    x_sh = jax.device_put(low, NamedSharding(mesh, P("data", None, None, "seq")))
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    pred_sp = jax.jit(fwd)(p_sh, x_sh)
    pred_ref = apply_model(params, model, low, None, mode="eval",
                           mc_drop=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pred_sp), np.asarray(pred_ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_grads_match_unsharded(setup):
    model, params, low, high = setup
    mesh = make_mesh((2, 2), axis_names=("data", "seq"))
    fwd = make_sp_forward(model, mesh, compute_dtype=jnp.float32)

    from tulip_tpu.models.tulip import forward_loss

    def loss_sp(p, lo, hi):
        pred = fwd(p, lo)     # rng=None: deterministic
        return forward_loss(pred, hi, model.cfg.log_transform)[0]

    def loss_ref(p, lo, hi):
        _, total, _ = apply_model(p, model, lo, hi, mode="eval",
                                  compute_dtype=jnp.float32)
        return total

    x_sh = jax.device_put(low, NamedSharding(mesh, P("data", None, None, "seq")))
    t_sh = jax.device_put(high, NamedSharding(mesh, P("data", None, None, "seq")))
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))

    l_sp, g_sp = jax.jit(jax.value_and_grad(loss_sp))(p_sh, x_sh, t_sh)
    l_rf, g_rf = jax.jit(jax.value_and_grad(loss_ref))(params, low, high)
    np.testing.assert_allclose(float(l_sp), float(l_rf), rtol=1e-6, atol=1e-7)
    for k in g_rf:
        # rtol 1e-3: sharded grads psum 4 per-shard partial reductions vs
        # one whole-tensor reduction; fp32 ordering differences on
        # cancellation-heavy weight grads (e.g. decoder_pred) reach ~7e-4
        np.testing.assert_allclose(
            np.asarray(g_sp[k]), np.asarray(g_rf[k]),
            rtol=1e-3, atol=1e-5, err_msg=k)


def test_max_sp_degree(setup):
    """KITTI geometry (1024 wide, patch W=4, window W=8): the deepest stage
    has 32 token columns -> 32 // (2*8) = 2 is the ceiling."""
    model, *_ = setup
    assert max_sp_degree(model) == 2
    # the ceiling must actually build
    build_sp_statics(model, max_sp_degree(model))


def test_sp_eval_engine_forward(setup):
    """The eval engine's sp_forward override (mode='eval') produces the same
    gated/de-logged prediction + MAE as the plain jitted eval forward."""
    model, params, low, high = setup
    from tulip_tpu.eval.engine import _GATES, _make_eval_forward

    mesh = make_mesh((1, 2), axis_names=("data", "seq"))
    sp_fwd = make_sp_forward(model, mesh, mode="eval",
                             compute_dtype=jnp.float32)
    fwd_sp = _make_eval_forward(model, "kitti", True, _GATES, jnp.float32,
                                sp_forward=sp_fwd)
    fwd_ref = _make_eval_forward(model, "kitti", True, _GATES, jnp.float32)

    lo, hi = low[:1], high[:1]
    out_sp = fwd_sp(params, lo, hi)
    out_ref = fwd_ref(params, lo, hi)
    for a, b in zip(out_sp, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_sp_train_step_runs(setup):
    """Full dp x sp train step (bf16, drop-path rng active) executes and
    produces a finite decreasing loss."""
    model, params, low, high = setup
    mesh = make_mesh((4, 2), axis_names=("data", "seq"))
    from tulip_tpu.train.step import init_train_state, make_optimizer
    tx = make_optimizer(0.01)
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    state = init_train_state(params_copy, tx)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_sp_train_step(model, tx, mesh)

    sh = NamedSharding(mesh, P("data", None, None, "seq"))
    lo = jax.device_put(low, sh)
    hi = jax.device_put(high, sh)
    losses = []
    for i in range(3):
        state, (total, _) = step(state, lo, hi, np.float32(1e-3),
                                 jax.random.PRNGKey(i))
        losses.append(float(total))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
