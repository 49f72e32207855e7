"""Dataset preparation script contracts."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from prepare_s3dis import convert_room  # noqa: E402

from pointwise_tpu.data import s3dis


def test_s3dis_conversion_roundtrip(tmp_path):
    ann = tmp_path / "room1" / "Annotations"
    ann.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for name, n in (("wall_1", 100), ("chair_3", 50), ("gizmo_9", 10)):
        arr = np.concatenate(
            [rng.uniform(0, 3, (n, 3)), rng.randint(0, 255, (n, 3))], axis=1
        )
        np.savetxt(ann / f"{name}.txt", arr, fmt="%.4f")
    room = convert_room(str(tmp_path / "room1"))
    assert room.shape == (160, 7)
    labels = set(room[:, 6].astype(int))
    assert labels == {2, 8, 12}  # wall, chair, clutter (unknown prefix)

    np.save(tmp_path / "room1.npy", room)
    rooms = s3dis.load_rooms(str(tmp_path))
    xyz, rgb, lab = rooms[0]
    assert len(xyz) == 160 and rgb.max() <= 1.0
