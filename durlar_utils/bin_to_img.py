"""Single-scan Ouster .bin -> range image CLI (debug/visualization tool).

Parity target: durlar_utils/bin_to_img.py — same projection (vectorized) and
the same reprojection-error report; the cv2 preview window is replaced by an
optional .png dump (headless environments).
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tulip_tpu.etl.durlar import pcd_to_img
from tulip_tpu.eval.geometry import img_to_pcd_durlar

if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument('--rows', nargs='?', default=128, type=int)
    parser.add_argument('--cols', nargs='?', default=2048, type=int)
    parser.add_argument('--save_png', type=str, default=None,
                        help='write the range preview here instead of showing it')
    args = parser.parse_args()

    print("Loading PCD from {}".format(args.path), "with shape",
          args.rows, args.cols)
    scan = np.fromfile(args.path, dtype=np.float32).reshape(-1, 4)
    img_range, img_data = pcd_to_img(scan, rows=args.rows, cols=args.cols)

    # reprojection sanity check (reference prints avg/max error)
    pts = img_to_pcd_durlar(img_range / 120.0, maximum_range=120)
    raw = scan[:args.rows * args.cols, :3]
    valid = img_range.reshape(-1, order='F') > 0.1  # column-major like projection
    # match destaggered ordering: img_to_pcd_durlar scatters into scan order
    diff = np.sqrt(((pts - raw) ** 2).sum(-1))
    mask = np.sqrt((raw ** 2).sum(-1)) > 0.1
    print("avg_err", diff[mask].mean())
    print("max_diff", diff[mask].max())

    if args.save_png:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.imsave(args.save_png, np.clip(img_range / 50.0, 0, 1),
                       cmap="viridis")
            print("saved", args.save_png)
        except ImportError:
            print("matplotlib unavailable; skipping png export")
