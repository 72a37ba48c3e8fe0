"""Checkpoint save/load: native (numpy pickle) checkpoints plus a PyTorch
.pth importer for the released reference checkpoints.

Parity targets: tulip/util/misc.py:332-470 (save_model/load_model with the
legacy key remaps) and the {'model','optimizer','epoch','scaler','args'} dict
layout.  Native checkpoints keep the ``checkpoint-{epoch}.pth`` filename so
``get_latest_checkpoint`` globbing (engine_upsampling.py:611-622) works
unchanged.

Torch layout -> JAX layout transposes:
- Linear ``.weight`` (2-D): (out, in) -> (in, out)
- Conv2d ``.weight`` (4-D): OIHW -> HWIO
- buffers (relative_position_index, attn_mask) are dropped — our model
  computes them statically at config time.
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

_NATIVE_MAGIC = b"TULIPTPU1\n"

# 2-D '.weight' tensors that are NOT torch Linear layers (no transpose)
_NON_LINEAR_2D = ("relative_position_bias_table",)
_DROP_SUFFIXES = ("relative_position_index", "attn_mask", "relative_coords_table")

# legacy key remaps (reference: tulip/util/misc.py:370-379)
_LEGACY_REMAP = {
    "head.weight": "decoder_pred.weight",
    "pixel_shuffle_layer.conv_expand.0.weight": "ps_head.conv_expand.0.weight",
    "pixel_shuffle_layer.conv_expand.0.bias": "ps_head.conv_expand.0.bias",
}


def import_torch_state_dict(state_dict: Dict[str, Any],
                            legacy_remap: bool = True) -> Dict[str, np.ndarray]:
    """Convert a reference torch state_dict to our flat JAX param dict.
    ``legacy_remap`` applies the TULIP-checkpoint key remaps (misc.py:370-379);
    disable it for non-TULIP models (e.g. the Swin-v2 classifier, whose
    'head' is a real classification head)."""
    params: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if legacy_remap:
            k = _LEGACY_REMAP.get(k, k)
        if any(k.endswith(s) for s in _DROP_SUFFIXES):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if k.endswith(".weight"):
            if arr.ndim == 4:            # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2 and not any(t in k for t in _NON_LINEAR_2D):
                arr = arr.T              # linear (out,in) -> (in,out)
        params[k] = np.ascontiguousarray(arr.astype(np.float32))
    return params


def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_state_dict (numpy arrays in torch layouts);
    useful for parity testing and for users migrating back."""
    out = {}
    for k, v in params.items():
        arr = np.asarray(v)
        if k.endswith(".weight"):
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 2 and not any(t in k for t in _NON_LINEAR_2D):
                arr = arr.T
        out[k] = np.ascontiguousarray(arr)
    return out


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    args: Optional[dict] = None) -> None:
    """Write a native checkpoint.  Dict layout mirrors the reference
    (misc.py:338-346); 'scaler' is a stub — bf16 needs no loss scaling."""
    payload = {
        "format": "tulip_tpu",
        "model": _to_numpy_tree(params),
        "optimizer": _to_numpy_tree(opt_state) if opt_state is not None else None,
        "epoch": epoch,
        "scaler": {},
        "args": args or {},
    }
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(_NATIVE_MAGIC)
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def _load_native(path: str):
    with open(path, "rb") as f:
        magic = f.read(len(_NATIVE_MAGIC))
        if magic != _NATIVE_MAGIC:
            return None
        return pickle.load(f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint: native format or a torch .pth (reference released
    checkpoints).  Returns {'model': flat jax-layout params, 'optimizer',
    'epoch', 'args'}."""
    native = _load_native(path)
    if native is not None:
        return native
    import torch  # CPU torch, used only for unpickling reference checkpoints
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import argparse  # noqa: F401  (checkpoints embed an argparse.Namespace)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    out = {
        "format": "torch",
        "model": import_torch_state_dict(state_dict),
        "optimizer": None,
        "epoch": ckpt.get("epoch", 0) if isinstance(ckpt, dict) else 0,
        "scaler": {},
        "args": {},
    }
    return out


def get_latest_checkpoint(args) -> None:
    """Glob checkpoint-*.pth, pick max epoch, set args.resume
    (reference: engine_upsampling.py:611-622)."""
    import glob
    output_dir = Path(args.output_dir)
    all_checkpoints = glob.glob(os.path.join(output_dir, "checkpoint-*.pth"))
    latest_ckpt = -1
    for ckpt in all_checkpoints:
        t = ckpt.split("-")[-1].split(".")[0]
        if t.isdigit():
            latest_ckpt = max(int(t), latest_ckpt)
    if latest_ckpt >= 0:
        args.resume = os.path.join(output_dir, "checkpoint-%d.pth" % latest_ckpt)
    print("Find checkpoint: %s" % args.resume)


def save_model(args, epoch: int, params, opt_state) -> None:
    """(reference: misc.py:332-349) — rank-0 gated by the caller."""
    output_dir = Path(args.output_dir)
    path = output_dir / f"checkpoint-{epoch}.pth"
    save_checkpoint(str(path), params, opt_state, epoch,
                    args={k: v for k, v in vars(args).items()
                          if isinstance(v, (int, float, str, bool, list, tuple, type(None)))})


def load_model(args, params, opt_state=None):
    """Resume semantics of misc.load_model:361-470: restore model always;
    restore optimizer + start_epoch unless --eval.  Returns (params,
    opt_state, start_epoch)."""
    start_epoch = getattr(args, "start_epoch", 0)
    if not args.resume:
        return params, opt_state, start_epoch
    ckpt = load_checkpoint(args.resume)
    loaded = ckpt["model"]
    missing = set(params) - set(loaded)
    unexpected = set(loaded) - set(params)
    if missing or unexpected:
        raise KeyError(f"checkpoint key mismatch: missing={sorted(missing)[:5]} "
                       f"unexpected={sorted(unexpected)[:5]}")
    for k in params:
        if tuple(loaded[k].shape) != tuple(np.shape(params[k])):
            raise ValueError(f"shape mismatch for {k}: "
                             f"{loaded[k].shape} vs {np.shape(params[k])}")
    import jax.numpy as jnp
    new_params = {k: jnp.asarray(loaded[k]) for k in params}
    print("Resume checkpoint %s" % args.resume)
    new_opt_state = opt_state
    if (ckpt.get("optimizer") is not None and not getattr(args, "eval", False)
            and opt_state is not None):
        new_opt_state = jax.tree_util.tree_map(
            lambda tmpl, saved: jnp.asarray(saved), opt_state, ckpt["optimizer"])
        start_epoch = ckpt.get("epoch", 0) + 1
        print("With optim & sched!")
    elif ckpt.get("epoch") is not None and not getattr(args, "eval", False) \
            and ckpt.get("format") == "tulip_tpu":
        start_epoch = ckpt.get("epoch", 0) + 1
    return new_params, new_opt_state, start_epoch


def initialize_decoder_weights(pretrain_model: Dict[str, Any]) -> Dict[str, Any]:
    """Verbatim-behavior port of the reference's dead helper
    (tulip/util/misc.py:218-249): transplants decoder-stage weights into the
    mirrored encoder-stage keys (layers_up.{2,1,0} -> layers.{0,1,2}, with
    downsample->upsample key rewriting), then strips head / decoder_pred /
    skip_connection / first_patch_expanding / output_weights and every
    remaining key containing 'up'.  Mutates and returns ``pretrain_model``.
    Never called at runtime in the reference either — kept for 100% API
    surface parity."""
    for k in list(pretrain_model.keys()):
        for src, dst in (("layers.0", "layers_up.2"),
                         ("layers.1", "layers_up.1"),
                         ("layers.2", "layers_up.0")):
            if src in k:
                new_key = k.replace(src, dst)
                if "downsample" in new_key:
                    new_key = new_key.replace("downsample", "upsample")
                pretrain_model[k] = pretrain_model[new_key]
                del pretrain_model[new_key]

    for k in list(pretrain_model.keys()):
        if ("head" in k or "decoder_pred" in k or "skip_connection" in k
                or "first_patch_expanding" in k or "output_weights" in k
                or "up" in k):
            print(f"Removing key {k} from pretrained checkpoint")
            del pretrain_model[k]

    print(pretrain_model.keys())
    return pretrain_model
