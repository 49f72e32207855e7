"""Dataset preparation script contracts."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from prepare_s3dis import convert_room  # noqa: E402
from prepare_scenenn import (  # noqa: E402
    NYU40_CLASSES,
    convert_scene,
    read_ply_vertices,
)

from pointwise_tpu.data import s3dis, scenenn


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


def _write_ply(path, xyz, rgb, inst, binary):
    n = len(xyz)
    fmt = "binary_little_endian" if binary else "ascii"
    header = (
        f"ply\nformat {fmt} 1.0\ncomment synthetic scenenn scene\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property ushort label\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("red", "u1"), ("green", "u1"), ("blue", "u1"),
                           ("label", "<u2")])
            rec = np.zeros(n, dt)
            rec["x"], rec["y"], rec["z"] = xyz.T
            rec["red"], rec["green"], rec["blue"] = rgb.T
            rec["label"] = inst
            f.write(rec.tobytes())
            f.write(np.array([3], np.uint8).tobytes())
            f.write(np.array([0, 1, 2], np.int32).tobytes())
        else:
            for i in range(n):
                f.write((f"{xyz[i,0]:.5f} {xyz[i,1]:.5f} {xyz[i,2]:.5f} "
                         f"{rgb[i,0]} {rgb[i,1]} {rgb[i,2]} "
                         f"{inst[i]}\n").encode())
            f.write(b"3 0 1 2\n")


def test_scenenn_conversion_roundtrip(tmp_path):
    # Real SceneNN release format: per-scene .ply (vertex label = object
    # INSTANCE id) + .xml (instance id -> NYU-40 class name), both PLY
    # encodings.  Labels must round-trip through the npy scene contract
    # into the shared block pipeline.
    rng = np.random.RandomState(0)
    n = 120
    xyz = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    rgb = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    inst = np.where(np.arange(n) < 60, 5, 9).astype(np.uint16)
    xml = ('<scene><label id="5" nyu_class="chair" color="#fff"/>'
           '<label id="9" text="floor"/></scene>')
    for binary in (False, True):
        d = tmp_path / ("bin" if binary else "ascii") / "005"
        d.mkdir(parents=True)
        _write_ply(d / "005.ply", xyz, rgb, inst, binary)
        (d / "005.xml").write_text(xml)
        v = read_ply_vertices(str(d / "005.ply"))
        np.testing.assert_allclose(np.asarray(v["x"], np.float32),
                                   xyz[:, 0], atol=1e-4)  # ascii %.5f rounds
        arr = convert_scene(str(d / "005.ply"), str(d / "005.xml"))
        assert arr.shape == (n, 7)
        labels = set(arr[:, 6].astype(int))
        assert labels == {NYU40_CLASSES.index("chair"),
                          NYU40_CLASSES.index("floor")}
        assert arr[:, 3:6].max() <= 1.0
        # npy contract feeds the shared scene loader
        out = tmp_path / ("scenes_" + ("bin" if binary else "ascii"))
        out.mkdir()
        np.save(out / "scenenn_005.npy", arr)
        scenes = scenenn.load_scenes(str(out))
        sx, sr, sl = scenes[0]
        assert len(sx) == n and set(sl) == labels


def test_ply_export_roundtrips_through_reader(tmp_path):
    """utils.ply.write_ply (prediction visualization) produces binary-LE PLY
    that the in-repo SceneNN reader parses back exactly: coordinates, the
    palette colors, and the raw label property."""
    from pointwise_tpu.utils.ply import label_colors, write_ply

    rng = np.random.RandomState(0)
    xyz = rng.uniform(-5, 5, (257, 3)).astype(np.float32)
    labels = rng.randint(-1, 13, 257).astype(np.int32)
    path = os.fspath(tmp_path / "pred.ply")
    write_ply(path, xyz, labels=labels)

    v = read_ply_vertices(path)
    got_xyz = np.stack([v["x"], v["y"], v["z"]], axis=1)
    np.testing.assert_array_equal(got_xyz, xyz)
    np.testing.assert_array_equal(v["label"], labels)
    expect_rgb = label_colors(labels)
    got_rgb = np.stack([v["red"], v["green"], v["blue"]], axis=1)
    np.testing.assert_array_equal(got_rgb, expect_rgb)
