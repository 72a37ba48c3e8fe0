"""KITTI dataset sampler CLI.

Workflow-compatible with the reference (kitti_utils/sample_kitti_dataset.py:
same flags, same directory conventions, same .npy output naming) but the
projection is the vectorized tulip_tpu.etl.kitti implementation.

Drive split lists: looks for train_files.txt / val_files.txt next to this
script (the standard KITTI split lists the reference ships); if absent, the
drive list is discovered by scanning --input_path for */velodyne_points/data
directories (train/val split by date prefix is then the user's job).
"""

import argparse
import os
import pathlib
import random
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tulip_tpu.etl.kitti import create_range_map, load_from_bin


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--num_data_train', type=int, default=21000)
    parser.add_argument('--num_data_val', type=int, default=2500)
    parser.add_argument("--input_path", type=str, default="./KITTI/")
    parser.add_argument("--output_path_name_train", type=str, default="kitti_train")
    parser.add_argument("--output_path_name_val", type=str, default="kitti_val")
    parser.add_argument("--create_val", action='store_true', default=False)
    parser.add_argument("--train_split", type=str, default=None,
                        help="path to train drive list (default: "
                             "train_files.txt next to this script)")
    parser.add_argument("--val_split", type=str, default=None)
    return parser.parse_args()


def readlines(filename):
    with open(filename, 'r') as f:
        return f.read().splitlines()


def _load_split(explicit_path, default_name, input_dir):
    here = os.path.dirname(os.path.abspath(__file__))
    path = explicit_path or os.path.join(here, default_name)
    if os.path.exists(path):
        return np.array(readlines(path), dtype=str)
    print(f"split list {path} not found; discovering drives under {input_dir}")
    drives = sorted({os.path.relpath(os.path.dirname(os.path.dirname(
        os.path.dirname(p))), input_dir)
        for p in glob(os.path.join(input_dir, "*", "*",
                                   "velodyne_points", "data", "*.bin"))})
    return np.array(drives, dtype=str)


def _sample(split, num_data, dir_name):
    """Sample num_data scans: one (or k) random .bin per drive
    (reference behaviour: sample_kitti_dataset.py:100-136)."""
    data = []
    if num_data < len(split):
        split = np.random.choice(split, num_data, replace=False)
        per_drive = 1
    else:
        per_drive = num_data // len(split) + 1
    for folder in split:
        scans = np.array(glob(os.path.join(
            dir_name, folder, "velodyne_points/data/*.bin")))
        if len(scans) == 0:
            continue
        k = min(per_drive, len(scans))
        data += list(np.random.choice(scans, k, replace=False))
    random.shuffle(data)
    data = data[:num_data]
    assert len(data) == num_data, "The number of sampled data is not correct"
    return data


def main(args):
    dir_name = os.path.dirname(args.input_path)
    out_train = os.path.join(dir_name, args.output_path_name_train)
    pathlib.Path(out_train).mkdir(parents=True, exist_ok=True)
    if args.create_val:
        out_val = os.path.join(dir_name, args.output_path_name_val)
        pathlib.Path(out_val).mkdir(parents=True, exist_ok=True)

    train_split = _load_split(args.train_split, "train_files.txt", dir_name)
    val_split = _load_split(args.val_split, "val_files.txt", dir_name)

    train_data = _sample(train_split, args.num_data_train, dir_name)
    val_data = _sample(val_split, args.num_data_val, dir_name) \
        if args.create_val else []

    # projection constants (reference: sample_kitti_dataset.py:139-145)
    image_rows, image_cols = 64, 1024
    ang_start_y = 24.8
    ang_res_y = 26.8 / (image_rows - 1)
    ang_res_x = 360 / image_cols
    max_range, min_range = 120, 0

    for i, path in enumerate(train_data):
        m = create_range_map(load_from_bin(path), image_rows, image_cols,
                             ang_start_y, ang_res_y, ang_res_x,
                             max_range, min_range)
        np.save(os.path.join(out_train, '{:08d}.npy'.format(i)),
                m.astype(np.float32))

    for j, path in enumerate(val_data):
        m = create_range_map(load_from_bin(path), image_rows, image_cols,
                             ang_start_y, ang_res_y, ang_res_x,
                             max_range, min_range)
        np.save(os.path.join(out_val, '{:08d}.npy'.format(j)),
                m.astype(np.float32))


if __name__ == "__main__":
    main(read_args())
