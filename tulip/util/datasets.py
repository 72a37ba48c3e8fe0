"""Compat shim for `util.datasets` (tulip/util/datasets.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tulip_tpu.data import (                              # noqa: F401
    register_dataset, generate_dataset, dataset_list, RangeMapFolder,
    PairDataset, ConcatDataset, npy_loader, rimg_loader, bin_loader,
    ScaleTensor, FilterInvalidPixels, LogTransform, DownsampleTensor,
    DownsampleTensorWidth, RandomRollRangeMap, AddGaussianNoise, CropRanges,
    KeepCloseScan, KeepFarScan, DepthwiseConcatenation)
