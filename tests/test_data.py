"""Data layer tests: loaders, transforms, dataset builders, pipeline.

Golden oracle where it matters: the transform chains are compared against
torch/torchvision equivalents built inline (the reference composes standard
torchvision transforms at tulip/util/datasets.py:244-309).
"""

import os

import numpy as np
import pytest

from tulip_tpu.data import (
    npy_loader, rimg_loader, ToChannelFirst, ScaleTensor, FilterInvalidPixels,
    LogTransform, DownsampleTensor, DownsampleTensorWidth, RandomRollRangeMap,
    Compose, RangeMapFolder, PairDataset, ConcatDataset, DataLoader,
    ShardedSampler,
)


def _write_npy(tmp_path, name, arr):
    np.save(os.path.join(tmp_path, name), arr)


def test_npy_loader_keeps_range_channel(tmp_path):
    arr = np.random.rand(8, 16, 2).astype(np.float32)
    _write_npy(str(tmp_path), "a.npy", arr)
    out = npy_loader(str(tmp_path / "a.npy"))
    np.testing.assert_array_equal(out, arr[..., 0])
    assert out.dtype == np.float32


def test_rimg_loader_roundtrip(tmp_path):
    """Write a synthetic .rimg in the CARLA format ((H, W) uint64 header +
    fp16 payload stored (W, H)) and check the loader reconstructs the
    original (H, W) image (reference: datasets.py:181-193)."""
    H, W = 8, 16
    img = np.arange(H * W, dtype=np.float16).reshape(H, W)
    path = str(tmp_path / "a.rimg")
    with open(path, "wb") as f:
        np.array([H, W], dtype=np.uint64).tofile(f)
        np.flip(img).T.tofile(f)   # (W, H) payload
    out = rimg_loader(path)
    assert out.shape == (H, W)
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_transform_chain_matches_torch():
    torch = pytest.importorskip("torch")
    x = (np.random.rand(128, 64) * 130).astype(np.float32)

    ours = Compose([ToChannelFirst(), ScaleTensor(1 / 120),
                    FilterInvalidPixels(0.3 / 120, 1.0),
                    DownsampleTensor(128, 4), LogTransform()])(x)

    t = torch.from_numpy(x)[None]  # ToTensor on float (H,W) -> (1,H,W)
    t = t * (1 / 120)
    t = torch.where((t >= 0.3 / 120) & (t <= 1.0), t, torch.zeros(()))
    t = t[:, range(0, 128, 4), :]
    t = torch.log1p(t)
    np.testing.assert_allclose(ours, t.numpy(), atol=1e-7)


def test_downsample_width():
    x = np.arange(2 * 4 * 8, dtype=np.float32).reshape(2, 4, 8)
    out = DownsampleTensorWidth(8, 2)(x)
    np.testing.assert_array_equal(out, x[:, :, ::2])


def test_random_roll_shared_shift():
    a = RandomRollRangeMap(h_img=64)
    b = RandomRollRangeMap(shift=a.shift)
    x = np.random.rand(1, 4, 64).astype(np.float32)
    np.testing.assert_array_equal(a(x), b(x))
    np.testing.assert_array_equal(a(x), np.roll(x, a.shift, axis=-1))


def test_rangemap_folder_and_pair(tmp_path):
    for split in ("train", "val"):
        os.makedirs(tmp_path / split)
        for i in range(4):
            _write_npy(str(tmp_path / split), f"{i:08d}.npy",
                       np.random.rand(8, 16, 2).astype(np.float32))
    ds = RangeMapFolder(str(tmp_path / "train"), class_dir=False)
    assert len(ds) == 4
    item = ds[0]
    assert set(item) == {"sample", "class", "name"}
    assert item["name"] == "00000000.npy"
    assert item["class"] == 0

    pair = PairDataset(ds, ds)
    a, b = pair[1]
    np.testing.assert_array_equal(a["sample"], b["sample"])


def test_concat_dataset():
    class Fake:
        def __init__(self, vals):
            self.vals = vals

        def __len__(self):
            return len(self.vals)

        def __getitem__(self, i):
            return self.vals[i]

    cd = ConcatDataset([Fake([1, 2]), Fake([3]), Fake([4, 5, 6])])
    assert len(cd) == 6
    assert [cd[i] for i in range(6)] == [1, 2, 3, 4, 5, 6]


def test_sharded_sampler_partition():
    """Every index appears exactly once across ranks (after wrap-pad)."""
    samplers = [ShardedSampler(10, num_replicas=4, rank=r, shuffle=True, seed=1)
                for r in range(4)]
    all_idx = []
    for s in samplers:
        got = list(s)
        assert len(got) == len(s) == 3
        all_idx += got
    assert set(all_idx) == set(range(10))  # wrap-pad duplicates allowed
    # epoch changes the permutation
    first = list(samplers[0])
    samplers[0].set_epoch(1)
    assert list(samplers[0]) != first


def test_dataloader_batches(tmp_path):
    os.makedirs(tmp_path / "d")
    for i in range(10):
        _write_npy(str(tmp_path / "d"), f"{i:03d}.npy",
                   np.full((4, 8, 2), i, np.float32))
    ds = RangeMapFolder(str(tmp_path / "d"),
                        transform=Compose([ToChannelFirst()]), class_dir=False)
    pair = PairDataset(ds, ds)
    loader = DataLoader(pair, batch_size=4, shuffle=False, drop_last=True,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    low, high = batches[0]
    assert low["sample"].shape == (4, 1, 4, 8)
    np.testing.assert_array_equal(low["sample"], high["sample"])
    assert list(low["name"]) == ["000.npy", "001.npy", "002.npy", "003.npy"]
