"""Data pipeline tests: augmentation properties, block crop + vote round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.data import augment, modelnet, s3dis, synthetic
from pointwise_tpu.data.pipeline import prefetch_to_device


def test_normalize_unit_sphere():
    pts = jax.random.normal(jax.random.PRNGKey(0), (4, 100, 3)) * 7 + 3
    out = augment.normalize_unit_sphere(pts)
    r = jnp.linalg.norm(out, axis=-1)
    assert float(jnp.max(r)) <= 1.0 + 1e-5
    np.testing.assert_allclose(np.asarray(jnp.mean(out, axis=1)), 0.0, atol=1e-5)


def test_rotate_preserves_norms_and_y():
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 50, 3))
    out = augment.rotate_y(jax.random.PRNGKey(2), pts)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)),
        np.asarray(jnp.linalg.norm(pts, axis=-1)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[..., 1]), np.asarray(pts[..., 1]),
                               rtol=1e-5, atol=1e-6)


def test_jitter_bounded():
    pts = jnp.zeros((2, 64, 3))
    out = augment.jitter(jax.random.PRNGKey(3), pts, sigma=0.01, clip=0.05)
    assert float(jnp.max(jnp.abs(out))) <= 0.05 + 1e-6
    assert float(jnp.std(out)) > 1e-4


def test_shuffle_and_sample_keep_pairing():
    pts = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
    lab = jnp.arange(10)
    sp, sl = augment.shuffle_points(jax.random.PRNGKey(4), pts, lab)
    assert sp.shape == pts.shape
    np.testing.assert_allclose(np.asarray(sp[:, 0] // 3), np.asarray(sl))
    qp, ql = augment.sample_points(jax.random.PRNGKey(5), pts, 6, lab)
    assert qp.shape == (6, 3) and ql.shape == (6,)
    np.testing.assert_allclose(np.asarray(qp[:, 0] // 3), np.asarray(ql))


def test_synthetic_classification_set():
    pts, labels = synthetic.classification_set(0, 20, 128)
    assert pts.shape == (20, 128, 3) and labels.shape == (20,)
    assert np.linalg.norm(pts, axis=-1).max() <= 1.0 + 1e-5
    data = modelnet.load_modelnet40(None, "train", 128, synthetic_size=16)
    batches = list(modelnet.batches(data, 4, seed=1))
    assert len(batches) == 4
    assert batches[0]["points"].shape == (4, 128, 3)


def test_prefetch_matches_source():
    data = modelnet.load_modelnet40(None, "train", 64, synthetic_size=8)
    src = list(modelnet.batches(data, 2, shuffle=False))
    out = list(prefetch_to_device(modelnet.batches(data, 2, shuffle=False)))
    assert len(out) == len(src)
    np.testing.assert_allclose(np.asarray(out[0]["points"]), src[0]["points"])


def test_block_crop_covers_scene():
    xyz, rgb, lab = synthetic.segmentation_scene(0)
    blocks = s3dis.room_blocks(xyz, rgb, lab, num_points=256, cover_all=True,
                               block_size=1.0, stride=1.0)
    assert blocks is not None
    covered = np.zeros(len(xyz), bool)
    for idx in blocks["index"]:
        covered[idx] = True
    # non-overlapping stride==block_size grid must cover nearly all points
    # (tiny blocks with <min_points can be skipped)
    assert covered.mean() > 0.98
    # features are rgb + normalized coords in [0,1]
    assert blocks["features"].shape[-1] == 6
    assert blocks["features"][..., 3:].min() >= -1e-6
    assert blocks["features"][..., 3:].max() <= 1.0 + 1e-6


def test_vote_roundtrip_perfect_predictor():
    # A predictor that emits one-hot logits of the true label must reach 100%
    # accuracy on covered points after vote-merge (SURVEY.md section 4.3).
    xyz, rgb, lab = synthetic.segmentation_scene(1)
    k = int(lab.max()) + 1
    true = {tuple(np.round(p, 5)): l for p, l in zip(xyz, lab)}

    lab_by_index = lab  # captured; the oracle looks labels up via index

    blocks_seen = {}

    def oracle(points, features, mask):
        # reconstruct labels from normalized coords is fragile; instead use
        # nearest-neighbor lookup against the original cloud
        B, N, _ = points.shape
        out = np.zeros((B, N, k), np.float32)
        for b in range(B):
            # features[..., 3:] are room-normalized coords -> invert
            mins, maxs = xyz.min(0), xyz.max(0)
            span = np.maximum(maxs - mins, 1e-6)
            orig = features[b, :, 3:] * span + mins
            d = ((orig[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
            nearest = d.argmin(1)
            out[b, np.arange(N), lab_by_index[nearest]] = 5.0
        return out

    res = s3dis.predict_scene_voting(
        oracle, xyz, rgb, num_classes=k, num_points=256,
        block_size=1.0, stride=0.75, batch_size=4, label=lab,
    )
    m = s3dis.iou_metrics(res["pred"][res["covered"]], lab[res["covered"]], k)
    assert m["accuracy"] == 1.0
    assert m["miou"] == 1.0
    assert res["covered"].mean() > 0.98


def test_farthest_point_sampling_covers_better_than_random():
    pts = jax.random.uniform(jax.random.PRNGKey(0), (512, 3))
    k = 32
    fps = augment.farthest_point_sample(jax.random.PRNGKey(1), pts, k)
    rnd = augment.sample_points(jax.random.PRNGKey(1), pts, k)
    assert fps.shape == (k, 3)

    def coverage(sample):
        d2 = jnp.sum((pts[:, None, :] - sample[None, :, :]) ** 2, -1)
        return float(jnp.max(jnp.min(d2, axis=1)))  # worst-covered point

    assert coverage(fps) < coverage(rnd)
    # batched + aligned extras
    lab = jnp.arange(512)
    bp, bl = augment.farthest_point_sample(
        jax.random.PRNGKey(2), jnp.stack([pts, pts]), k, jnp.stack([lab, lab])
    )
    assert bp.shape == (2, k, 3) and bl.shape == (2, k)
    # labels stay aligned with their points
    np.testing.assert_allclose(
        np.asarray(bp[0, :, 0]), np.asarray(pts[bl[0], 0]), rtol=1e-6
    )
