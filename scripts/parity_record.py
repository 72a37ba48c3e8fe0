"""Committed metric-parity record: jax engines vs the torch reference oracle.

VERDICT r3 item 5: released .pth checkpoints are not downloadable in this
environment, so the honest parity record is engine-vs-engine on identical
weights and data — the reference torch ``evaluate``/``MCdrop``
(/root/reference/tulip/engine_upsampling.py:126-608, CUDA chamfer replaced
by an exact numpy NN) against our engines, random-init weights exported
through the .pth importer, per-sample metrics from the ``results*.txt``
files both engines write (reference write at engine_upsampling.py:340-342).

Reuses the test mechanics (tests/test_engine_parity.py) but records the
numeric per-metric max relative deltas instead of asserting, and prints a
markdown table for BASELINE.md plus one JSON line per config.

Runs on CPU (the torch oracle has no TPU); ~10 min.  Usage:
    python scripts/parity_record.py
"""

import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import conftest as C            # noqa: E402  (tests/conftest.py: CPU pin + stubs)
import test_engine_parity as T  # noqa: E402

KEYS = ("mae", "chamfer_dist", "iou", "precision", "recall", "f1")


def _max_rel_delta(ref_dir, our_dir, fname):
    ref = json.load(open(os.path.join(ref_dir, fname)))
    ours = json.load(open(os.path.join(our_dir, fname)))
    out = {}
    for key in KEYS:
        r = np.asarray(ref[key], dtype=np.float64)
        o = np.asarray(ours[key], dtype=np.float64)
        out[key] = float(np.max(np.abs(o - r) / np.maximum(np.abs(r), 1e-12)))
        out[key + "_ref"] = float(r.mean())
    return out


def main():
    C._install_reference_stubs()
    T._install_engine_stubs()
    if C.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, C.REFERENCE_ROOT)
    import model.tulip as ref_tulip
    import engine_upsampling
    engine_upsampling.chamfer_distance = T._brute_chamfer

    deltas = {}
    T._compare_results = lambda ref_dir, our_dir, fname, **kw: deltas.update(
        {"last": _max_rel_delta(ref_dir, our_dir, fname)})

    configs = [
        ("carla 16x256->64x256", "carla", (16, 256), (64, 256), 3, "evaluate"),
        ("durlar 32x256->128x256", "durlar", (32, 256), (128, 256), 2, "evaluate"),
        ("kitti 16x1024->64x1024", "kitti", (16, 1024), (64, 1024), 1, "evaluate"),
        ("carla mcdrop(10)", "carla", (16, 256), (64, 256), 2, "mcdrop"),
        ("durlar mcdrop(10)", "durlar", (32, 256), (128, 256), 1, "mcdrop"),
    ]

    rows = []
    worst = 0.0
    for label, ds, low, high, n, mode in configs:
        with tempfile.TemporaryDirectory() as td:
            class _P(type(os.path)):  # noqa: N801
                pass
            import pathlib
            T._run_both(engine_upsampling, ref_tulip, pathlib.Path(td),
                        ds, low, high, n, mode)
        d = deltas["last"]
        worst = max(worst, max(d[k] for k in KEYS))
        rows.append((label, d))
        print(json.dumps({"config": label,
                          **{k: d[k] for k in KEYS},
                          **{k + "_ref": d[k + "_ref"] for k in KEYS}}),
              flush=True)

    print("\n| Config | " + " | ".join(KEYS) + " |")
    print("|---|" + "---|" * len(KEYS))
    for label, d in rows:
        print(f"| {label} | " + " | ".join(f"{d[k]:.2e}" for k in KEYS) + " |")
    print(f"\nworst max-rel-delta across all configs/metrics: {worst:.3e} "
          f"(contract: <= 1e-2)")
    if not (worst <= 1e-2):
        print("PARITY_FAIL", file=sys.stderr)
        sys.exit(1)
    print("PARITY_PASS")


if __name__ == "__main__":
    main()
