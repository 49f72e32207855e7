"""SceneNN per-point semantic segmentation dataset (SURVEY.md C7).

Reference workload: per-scene point clouds with XYZ positions, RGB colors
and NYU-40-class per-point labels (BASELINE.json config 2).  On-disk
contract mirrors the S3DIS loader: a directory of per-scene ``*.npy``
arrays (N, 7) = xyz, rgb, label.  Scenes are cropped into fixed-size blocks
by the shared sliding-block machinery (data/s3dis.py) with RGB-only input
features (``in_features=3``); XYZ enters through the conv geometry.

Without a data dir, procedural scenes stand in (see data/synthetic.py).
"""

from __future__ import annotations

import numpy as np

from pointwise_tpu.data import s3dis

NYU40_NUM_CLASSES = 40


def load_scenes(data_dir: str | None, *, synthetic_scenes: int = 4, seed: int = 0):
    """[(xyz, rgb, label)] per scene; same contract as s3dis.load_rooms."""
    return s3dis.load_rooms(
        data_dir, synthetic_rooms=synthetic_scenes, seed=seed
    )


def training_blocks(cfg, data_dir: str | None = None, seed: int = 0):
    """Static-shape training blocks with RGB-only features."""
    scenes = load_scenes(data_dir, seed=seed)
    rng = np.random.RandomState(seed)
    parts = []
    for xyz, rgb, lab in scenes:
        b = s3dis.room_blocks(
            xyz, rgb, lab,
            num_points=cfg.num_points,
            block_size=cfg.block_size,
            stride=cfg.block_stride,
            rng=rng,
            feature_mode="rgb",
        )
        if b is not None:
            parts.append(b)
    if not parts:
        raise ValueError("no blocks produced — check data_dir / block params")
    return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}


def predict_scene(predict_logits, xyz, rgb, *, num_classes, num_points,
                  block_size=1.5, stride=0.75, batch_size=16, label=None):
    """Overlap-voting full-scene inference (RGB features)."""
    return s3dis.predict_scene_voting(
        predict_logits, xyz, rgb,
        num_classes=num_classes, num_points=num_points,
        block_size=block_size, stride=stride, batch_size=batch_size,
        label=label, feature_mode="rgb",
    )
