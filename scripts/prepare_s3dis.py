#!/usr/bin/env python
"""Convert raw S3DIS (Stanford 3D Indoor Spaces) rooms to this framework's
npy room contract: one (N, 7) float array per room = xyz, rgb, label.

Raw layout (the public release):
  Area_k/<room>/Annotations/<class>_<i>.txt   rows: x y z r g b

Usage:
  python scripts/prepare_s3dis.py --src /data/Stanford3dDataset_v1.2 \
      --dst /data/s3dis_rooms
The 13 standard classes map in S3DIS_CLASSES order; unknown annotation
prefixes fall into 'clutter'.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

S3DIS_CLASSES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
)


def convert_room(room_dir: str) -> np.ndarray | None:
    parts = []
    for f in sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt"))):
        name = os.path.basename(f).split("_")[0].lower()
        label = S3DIS_CLASSES.index(name) if name in S3DIS_CLASSES else (
            S3DIS_CLASSES.index("clutter")
        )
        try:
            # ndmin=2: a single-point annotation file loads as (6,) and
            # would otherwise be silently dropped by the shape check
            arr = np.loadtxt(f, dtype=np.float32, ndmin=2)
        except ValueError as e:
            # the raw release has known stray characters (e.g.
            # Area_5/hallway_6 ceiling_1.txt) — dropping a whole object
            # silently would corrupt that room's mIoU
            print(f"# WARNING: skipping unparseable {f}: {e}", flush=True)
            continue
        if arr.ndim != 2 or arr.shape[1] < 6:
            print(f"# WARNING: skipping {f}: shape {arr.shape}", flush=True)
            continue
        lab = np.full((len(arr), 1), label, np.float32)
        parts.append(np.concatenate([arr[:, :6], lab], axis=1))
    if not parts:
        return None
    return np.concatenate(parts).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    rooms = sorted(glob.glob(os.path.join(args.src, "Area_*", "*")))
    n = 0
    for room in rooms:
        if not os.path.isdir(room):
            continue
        arr = convert_room(room)
        if arr is None:
            continue
        area = os.path.basename(os.path.dirname(room))
        out = os.path.join(args.dst, f"{area}_{os.path.basename(room)}.npy")
        np.save(out, arr)
        n += 1
        print(f"{out}: {len(arr)} pts")
    print(f"converted {n} rooms")


if __name__ == "__main__":
    main()
