"""Training convergence record: jax train stack vs the torch reference.

VERDICT r3 item 6: the reference's contract is 600-epoch convergence
(bash_scripts/tulip_upsampling_kitti.sh); the committable short-horizon
evidence is a same-init, same-data, same-LR-math loss-curve comparison.
Both stacks run N short epochs over an identical fixed synthetic dataset:

- torch: the reference model (model/tulip.py) + AdamW(0.9, 0.95) with the
  reference's effective param grouping (decay only ndim>1) and its
  per-iteration warmup+cosine LR (util/lr_sched.py:9-21, imported verbatim
  from /root/reference), fp32 CPU.
- jax: our make_train_step/make_optimizer (tulip_tpu/train/step.py) — the
  exact production path incl. bf16 compute — with weights imported from the
  torch init through the .pth importer.

DropPath (rate 0.1) is stochastic and the RNG streams differ, so the
comparison is curve-vs-curve within noise, not step-exact.  Prints one JSON
line per logged step and a summary; exits nonzero if the jax curve fails to
track the torch curve (final-window mean within 15%) or fails to descend.

CPU, ~10-15 min.  Usage: python scripts/convergence_record.py [--steps 120]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import conftest as C            # noqa: E402  (CPU pin + reference stubs)
import test_engine_parity as T  # noqa: E402


def _data(low, high, n_batches, batch, seed=0):
    """Fixed learnable batches: strided-row pairs in log space (the
    production DownsampleTensor relation, datasets.py)."""
    rng = np.random.default_rng(seed)
    factor = high[0] // low[0]
    out = []
    for _ in range(n_batches):
        h = np.log1p(rng.uniform(0.05, 0.95, (batch, 1, *high))).astype(np.float32)
        out.append((h[:, :, ::factor, :].copy(), h))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--log-every", type=int, default=4)
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp

    C._install_reference_stubs()
    if C.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, C.REFERENCE_ROOT)
    import model.tulip as ref_tulip
    import util.lr_sched as ref_lr_sched

    low, high = (16, 256), (64, 256)
    ref, model, params = T._build_pair(ref_tulip, "tulip_base", low, high)
    ref.train()

    steps_per_epoch = 8
    epochs = (args.steps + steps_per_epoch - 1) // steps_per_epoch
    lr_args = argparse.Namespace(lr=5e-4, min_lr=0.0, warmup_epochs=1,
                                 epochs=epochs)
    batches = _data(low, high, steps_per_epoch, args.batch)

    # --- torch side: reference loop shape (engine_upsampling.py:59-98) ---
    decay, no_decay = [], []
    for p in ref.parameters():
        (decay if p.ndim > 1 else no_decay).append(p)
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": 0.05},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=lr_args.lr, betas=(0.9, 0.95))
    torch.manual_seed(1)
    torch_losses = []
    for step in range(args.steps):
        epoch_f = (step % steps_per_epoch) / steps_per_epoch + step // steps_per_epoch
        ref_lr_sched.adjust_learning_rate(opt, epoch_f, lr_args)
        l, h = batches[step % steps_per_epoch]
        _, total_loss, _ = ref(torch.from_numpy(l), torch.from_numpy(h))
        opt.zero_grad()
        total_loss.backward()
        opt.step()
        torch_losses.append(float(total_loss))
        if step % args.log_every == 0:
            print(json.dumps({"stack": "torch", "step": step,
                              "loss": torch_losses[-1]}), flush=True)

    # --- jax side: the production train step (train/step.py) ---
    from tulip_tpu.train.step import (TrainState, make_optimizer,
                                      make_train_step)
    from tulip_tpu.utils.lr_sched import lr_at_epoch

    tx = make_optimizer(weight_decay=0.05)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    train_step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(1)
    jax_losses = []
    for step in range(args.steps):
        epoch_f = (step % steps_per_epoch) / steps_per_epoch + step // steps_per_epoch
        lr = lr_at_epoch(epoch_f, lr_args.lr, lr_args.min_lr,
                         lr_args.warmup_epochs, lr_args.epochs)
        l, h = batches[step % steps_per_epoch]
        state, (total_loss, _) = train_step(
            state, jnp.asarray(l), jnp.asarray(h), jnp.float32(lr),
            jax.random.fold_in(rng, step))
        jax_losses.append(float(total_loss))
        if step % args.log_every == 0:
            print(json.dumps({"stack": "jax", "step": step,
                              "loss": jax_losses[-1]}), flush=True)

    tl = np.asarray(torch_losses)
    jl = np.asarray(jax_losses)
    w = max(args.steps // 6, 5)
    summary = {
        "steps": args.steps,
        "torch_first_window": float(tl[:w].mean()),
        "torch_last_window": float(tl[-w:].mean()),
        "jax_first_window": float(jl[:w].mean()),
        "jax_last_window": float(jl[-w:].mean()),
        "last_window_rel_gap": float(abs(jl[-w:].mean() - tl[-w:].mean())
                                     / tl[-w:].mean()),
    }
    print(json.dumps({"summary": summary}), flush=True)

    print("\n| step | torch loss | jax loss |")
    print("|---|---|---|")
    for s in range(0, args.steps, max(args.steps // 10, 1)):
        e = min(s + args.log_every, args.steps)
        print(f"| {s} | {tl[s:e].mean():.4f} | {jl[s:e].mean():.4f} |")
    print(f"| last {w} | {tl[-w:].mean():.4f} | {jl[-w:].mean():.4f} |")

    ok = (summary["jax_last_window"] < 0.7 * summary["jax_first_window"]
          and summary["last_window_rel_gap"] <= 0.15)
    print("CONVERGENCE_PASS" if ok else "CONVERGENCE_FAIL")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
