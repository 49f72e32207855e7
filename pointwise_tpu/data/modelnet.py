"""ModelNet40 classification dataset (SURVEY.md C6).

The reference reads HDF5 shards of pre-sampled clouds (2048 pts) + labels
listed in train_files.txt / test_files.txt.  This loader keeps that on-disk
contract (point to a directory of ``*.h5`` with datasets ``data`` (B,N,3)
and ``label`` (B,1)) and falls back to the procedural primitive set when no
archive exists on the machine (this build environment has no network).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import numpy as np

from pointwise_tpu.data import synthetic
from pointwise_tpu.utils import spatial


@dataclasses.dataclass
class ClassificationData:
    points: np.ndarray     # (num, N, 3) float32
    labels: np.ndarray     # (num,) int32
    num_classes: int
    name: str = "modelnet40"


def _load_h5_dir(path: str, split: str) -> ClassificationData | None:
    import glob

    import h5py

    list_file = os.path.join(path, f"{split}_files.txt")
    if os.path.exists(list_file):
        with open(list_file) as fh:
            files = [
                os.path.join(path, os.path.basename(line.strip()))
                for line in fh
                if line.strip()
            ]
    else:
        files = sorted(glob.glob(os.path.join(path, f"*{split}*.h5")))
    if not files:
        return None
    pts, labs = [], []
    for f in files:
        with h5py.File(f, "r") as h:
            pts.append(np.asarray(h["data"], np.float32))
            labs.append(np.asarray(h["label"], np.int64).reshape(-1))
    points = spatial.check_coordinates(np.concatenate(pts), name=path)
    labels = np.concatenate(labs).astype(np.int32)
    return ClassificationData(points, labels, int(labels.max()) + 1)


def load_modelnet40(
    path: str | None = None,
    split: str = "train",
    n_points: int = 1024,
    synthetic_size: int = 512,
    seed: int = 0,
    variant: str = "default",
) -> ClassificationData:
    """Real archive if ``path`` has one; procedural primitives otherwise.

    ``variant='hard'`` selects the deformed procedural set (harder anchor,
    see synthetic._harden); ignored when a real archive is present."""
    if path:
        data = _load_h5_dir(path, split)
        if data is not None:
            if data.points.shape[1] > n_points:
                data.points = data.points[:, :n_points]
            data.points = spatial.morton_sort_batch(data.points)
            return data
    seed = seed + (0 if split == "train" else 10_000)
    pts, labs = synthetic.classification_set(seed, synthetic_size, n_points,
                                             variant=variant)
    pts = spatial.morton_sort_batch(pts)
    return ClassificationData(pts, labs, synthetic.NUM_CLASSES, name="synthetic")


def batches(
    data: ClassificationData,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[dict]:
    """Host-side epoch iterator of {'points', 'label'} numpy batches."""
    n = len(data.labels)
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    stop = (n // batch_size) * batch_size if drop_remainder else n
    for s in range(0, stop, batch_size):
        sel = idx[s : s + batch_size]
        yield {"points": data.points[sel], "label": data.labels[sel]}
