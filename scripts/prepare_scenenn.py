#!/usr/bin/env python
"""Convert raw SceneNN scenes to this framework's npy scene contract:
one (N, 7) float array per scene = xyz, rgb, NYU-40 class label.

Raw layout (the public SceneNN release, the reference's segmentation
dataset — SURVEY.md C7 / BASELINE.json config 2):

  <root>/<scene_id>/<scene_id>.ply   triangle mesh; per-vertex x y z,
                                     r g b (uchar) and an integer ``label``
                                     property carrying the OBJECT INSTANCE id
  <root>/<scene_id>/<scene_id>.xml   annotation table mapping each instance
                                     id to an NYU class name, e.g.
                                     <label id="12" nyu_class="chair" .../>

Usage:
  python scripts/prepare_scenenn.py --src /data/SceneNN --dst /data/scenenn_npy

Vertices whose instance has no NYU mapping fall into 'otherprop'.  The PLY
reader below is self-contained (ascii + binary_little_endian) so the
pipeline has no plyfile dependency.
"""

from __future__ import annotations

import argparse
import glob
import os
import xml.etree.ElementTree as ET

import numpy as np

# The standard NYU-40 label set, index 0..39.
NYU40_CLASSES = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "blinds", "desk", "shelves",
    "curtain", "dresser", "pillow", "mirror", "floor_mat", "clothes",
    "ceiling", "books", "refridgerator", "television", "paper", "towel",
    "shower_curtain", "box", "whiteboard", "person", "night_stand", "toilet",
    "sink", "lamp", "bathtub", "bag", "otherstructure", "otherfurniture",
    "otherprop",
)

_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply_vertices(path: str) -> dict[str, np.ndarray]:
    """Read the 'vertex' element of a PLY file (ascii or binary LE).

    Returns {property name: (N,) array}.  Only the vertex element is read;
    list properties (faces) after it are ignored.
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop, np dtype str)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append((parts[-1], "list",
                                            _PLY_DTYPES[parts[2]],
                                            _PLY_DTYPES[parts[3]]))
                else:
                    elements[-1][2].append((parts[-1], _PLY_DTYPES[parts[1]]))
            elif parts[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"{path}: unsupported PLY format {fmt!r}")

        for name, count, props in elements:
            if any(p[1] == "list" for p in props):
                if name == "vertex":
                    raise ValueError(f"{path}: list property in vertex")
                break  # variable-length element: everything we need is read
            if fmt == "ascii":
                rows = np.array(
                    [f.readline().split() for _ in range(count)], np.float64
                )
                data = {p[0]: rows[:, i] for i, p in enumerate(props)}
            else:
                dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                buf = f.read(dt.itemsize * count)
                rec = np.frombuffer(buf, dt, count)
                data = {p[0]: rec[p[0]] for p in props}
            if name == "vertex":
                return data
    raise ValueError(f"{path}: no vertex element")


def read_instance_to_nyu(xml_path: str) -> dict[int, int]:
    """Instance id -> NYU40 class index from a SceneNN annotation XML.

    Tolerant to layout variants: any element with an ``id`` attribute and
    one of ``nyu_class`` / ``class`` / ``text`` naming the class.
    """
    mapping: dict[int, int] = {}
    root = ET.parse(xml_path).getroot()
    for el in root.iter():
        ident = el.get("id")
        name = el.get("nyu_class") or el.get("class") or el.get("text")
        if ident is None or not name:
            continue
        try:
            key = int(ident)          # non-numeric ids (layout variants)
        except ValueError:            # are not instance elements — skip,
            continue                  # don't crash the conversion
        name = name.strip().lower().replace(" ", "_")
        try:
            mapping[key] = NYU40_CLASSES.index(name)
        except ValueError:
            mapping[key] = NYU40_CLASSES.index("otherprop")
    return mapping


def convert_scene(ply_path: str, xml_path: str | None) -> np.ndarray:
    """(N, 7) float32 = xyz, rgb in [0,1], NYU40 label."""
    v = read_ply_vertices(ply_path)
    xyz = np.stack([np.asarray(v[a], np.float32) for a in "xyz"], axis=1)
    if all(c in v for c in ("red", "green", "blue")):
        rgb = np.stack(
            [np.asarray(v[c], np.float32) for c in ("red", "green", "blue")],
            axis=1,
        )
        if rgb.max(initial=0.0) > 1.5:
            rgb = rgb / 255.0
    else:
        rgb = np.zeros_like(xyz)
    n = len(xyz)
    if "label" in v and xml_path and os.path.exists(xml_path):
        inst = np.asarray(v["label"], np.int64)
        inst2nyu = read_instance_to_nyu(xml_path)
        other = NYU40_CLASSES.index("otherprop")
        lut_size = int(inst.max(initial=0)) + 1
        lut = np.full(lut_size, other, np.int64)
        for k, c in inst2nyu.items():
            if 0 <= k < lut_size:
                lut[k] = c
        lab = lut[np.clip(inst, 0, lut_size - 1)]
    elif "label" in v:  # labels already NYU ids (some re-releases)
        lab = np.asarray(v["label"], np.int64)
        if lab.max(initial=0) >= len(NYU40_CLASSES):
            # values above 39 are almost certainly INSTANCE ids whose
            # annotation XML wasn't found — clipping them would silently
            # write garbage class labels
            raise SystemExit(
                f"{ply_path}: 'label' values reach {int(lab.max())} (>39) — "
                "these look like instance ids, not NYU40 classes; pass the "
                "scene's annotation XML (missing or misnamed?)")
        lab = np.clip(lab, 0, len(NYU40_CLASSES) - 1)
    else:
        lab = np.zeros(n, np.int64)
    return np.concatenate(
        [xyz, rgb, lab[:, None].astype(np.float32)], axis=1
    ).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    n = 0
    for ply in sorted(glob.glob(os.path.join(args.src, "*", "*.ply"))):
        scene = os.path.splitext(os.path.basename(ply))[0]
        xml_path = os.path.join(os.path.dirname(ply), scene + ".xml")
        arr = convert_scene(ply, xml_path if os.path.exists(xml_path) else None)
        out = os.path.join(args.dst, f"scenenn_{scene}.npy")
        np.save(out, arr)
        n += 1
        print(f"{out}: {len(arr)} pts")
    print(f"converted {n} scenes")


if __name__ == "__main__":
    main()
