"""On-disk format contracts: HDF5 shards (ModelNet40, ShapeNetPart), npy rooms."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from pointwise_tpu.data import modelnet, s3dis, shapenetpart


def test_modelnet_h5_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(10, 2048, 3).astype(np.float32)
    lab = rng.randint(0, 40, (10, 1))
    with h5py.File(tmp_path / "ply_data_train0.h5", "w") as h:
        h["data"] = pts
        h["label"] = lab
    data = modelnet.load_modelnet40(str(tmp_path), "train", n_points=1024)
    assert data.name == "modelnet40"
    assert data.points.shape == (10, 1024, 3)
    assert data.num_classes == int(lab.max()) + 1
    # morton sort permutes within clouds but preserves the point sets
    src = np.sort(pts[:, :1024].reshape(10, -1), axis=1)
    got = np.sort(data.points.reshape(10, -1), axis=1)
    np.testing.assert_allclose(got, src, rtol=1e-6)


def test_modelnet_h5_list_file(tmp_path):
    rng = np.random.RandomState(1)
    with h5py.File(tmp_path / "shard_a.h5", "w") as h:
        h["data"] = rng.randn(4, 128, 3).astype(np.float32)
        h["label"] = np.arange(4)[:, None]
    (tmp_path / "train_files.txt").write_text("shard_a.h5\n")
    data = modelnet.load_modelnet40(str(tmp_path), "train", n_points=128)
    assert len(data.labels) == 4


def test_s3dis_npy_rooms(tmp_path):
    rng = np.random.RandomState(2)
    room = np.concatenate(
        [rng.uniform(0, 4, (5000, 3)),
         rng.randint(0, 255, (5000, 3)).astype(float),
         rng.randint(0, 13, (5000, 1)).astype(float)], axis=1,
    )
    np.save(tmp_path / "Area_1_room.npy", room)
    rooms = s3dis.load_rooms(str(tmp_path))
    assert len(rooms) == 1
    xyz, rgb, lab = rooms[0]
    assert xyz.shape == (5000, 3) and rgb.max() <= 1.0 and lab.dtype == np.int32


def test_shapenetpart_h5(tmp_path):
    rng = np.random.RandomState(3)
    with h5py.File(tmp_path / "hdf5_train_0.h5", "w") as h:
        h["data"] = rng.randn(6, 512, 3).astype(np.float32)
        h["label"] = rng.randint(0, 16, (6, 1))
        h["pid"] = rng.randint(0, 50, (6, 512))
    data = shapenetpart.load_shapenetpart(str(tmp_path), "train", n_points=512)
    assert data.points.shape == (6, 512, 3)
    assert data.part.shape == (6, 512)
    assert data.category.shape == (6,)


@pytest.mark.slow
def test_train_cli_with_real_format_archive(tmp_path):
    # end-to-end: the --data-dir path through the training loop
    import subprocess
    import sys

    rng = np.random.RandomState(7)
    pts = rng.randn(32, 256, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True).max(1, keepdims=True)
    lab = rng.randint(0, 4, (32, 1))
    for split in ("train", "test"):
        with h5py.File(tmp_path / f"ply_{split}0.h5", "w") as h:
            h["data"] = pts
            h["label"] = lab
    env = dict(__import__("os").environ,
               JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "train.py", "--config", "modelnet40_synthetic",
         "--data-dir", str(tmp_path), "--steps", "2"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert '"loss"' in out.stdout


def test_category_miou_convention():
    # ShapeNetPart instance mIoU: per shape, IoU averaged over the
    # category's FULL part set (absent parts score 1.0) — the published-
    # number convention; the dataset carries its category->parts mapping.
    from pointwise_tpu.data import shapenetpart

    ppc = {0: [0, 1, 2, 3]}
    label = np.array([[0, 0, 1, 1]])
    pred = np.array([[0, 1, 1, 1]])
    cat = np.array([0])
    # part0 IoU 1/2, part1 IoU 2/3, parts 2 & 3 absent in both -> 1.0 each
    got = shapenetpart.category_miou(pred, label, cat,
                                     parts_per_category=ppc)
    np.testing.assert_allclose(got, (0.5 + 2 / 3 + 1.0 + 1.0) / 4, rtol=1e-6)
    # the loose fallback (no mapping) scores strictly lower here
    loose = shapenetpart.category_miou(pred, label, cat)
    assert loose < got

    data = shapenetpart.load_shapenetpart(None, "test", 128, synthetic_size=4)
    assert data.parts_per_category is not None
    all_parts = sorted(p for ps in data.parts_per_category.values()
                       for p in ps)
    assert all_parts == list(range(data.num_parts))
    # the real-release mapping covers the 50-part global space exactly
    real = sorted(p for ps in shapenetpart.REAL_PART_RANGES.values()
                  for p in ps)
    assert real == list(range(50))
