"""Model-level tests (CPU, small sizes, reference op impl for speed)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.models import (
    PointwiseClassifier,
    PointwiseSegmenter,
    ShapeNetPartSegmenter,
    classification_loss,
    segmentation_loss,
)

KW = dict(channels=(16, 16), radii=(0.4, 0.8), head_dims=(32,), impl="reference")


def test_classifier_shapes_and_grads():
    model = PointwiseClassifier(num_classes=10, **KW)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 3), minval=-1, maxval=1)
    params = model.init(jax.random.PRNGKey(1), pts, train=False)["params"]
    logits = model.apply({"params": params}, pts, train=False)
    assert logits.shape == (2, 10)

    labels = jnp.array([1, 7])

    def loss(p):
        lg = model.apply({"params": p}, pts, train=False)
        return classification_loss(lg, labels)[0]

    g = jax.grad(loss)(params)
    norms = jax.tree.map(lambda x: float(jnp.max(jnp.abs(x))), g)
    flat = jax.tree.leaves(norms)
    assert all(np.isfinite(v) for v in flat)
    assert any(v > 0 for v in flat)


def test_classifier_mask_invariance():
    # Adding masked padding points must not change the logits.
    model = PointwiseClassifier(num_classes=5, **KW)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (1, 48, 3), minval=-1, maxval=1)
    params = model.init(jax.random.PRNGKey(3), pts, train=False)["params"]
    base = model.apply({"params": params}, pts, mask=jnp.ones((1, 48)), train=False)

    pts_p = jnp.pad(pts, ((0, 0), (0, 16), (0, 0)), constant_values=0.3)
    mask = jnp.concatenate([jnp.ones((1, 48)), jnp.zeros((1, 16))], axis=1)
    padded = model.apply({"params": params}, pts_p, mask=mask, train=False)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), rtol=1e-4, atol=1e-5)


def test_segmenter_shapes():
    model = PointwiseSegmenter(num_classes=7, **KW)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 3))
    feats = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 6))
    mask = jnp.ones((2, 64)).at[:, 50:].set(0)
    params = model.init(jax.random.PRNGKey(6), pts, feats, mask, train=False)["params"]
    logits = model.apply({"params": params}, pts, feats, mask, train=False)
    assert logits.shape == (2, 64, 7)
    # masked points produce zero logits
    np.testing.assert_allclose(np.asarray(logits[:, 50:]), 0.0)

    labels = jnp.zeros((2, 64), jnp.int32)
    loss, acc = segmentation_loss(logits, labels, mask)
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0


def test_shapenetpart_segmenter():
    model = ShapeNetPartSegmenter(
        num_parts=12, num_categories=4,
        channels=(16, 16, 16), radii=(0.3, 0.5, 0.9), head_dims=(32,),
        impl="reference",
    )
    pts = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 3), minval=-1, maxval=1)
    cat = jnp.array([0, 3])
    params = model.init(jax.random.PRNGKey(8), pts, cat, train=False)["params"]
    logits = model.apply({"params": params}, pts, cat, train=False)
    assert logits.shape == (2, 64, 12)
    # category conditioning must matter
    logits2 = model.apply({"params": params}, pts, jnp.array([1, 2]), train=False)
    assert float(jnp.max(jnp.abs(logits - logits2))) > 1e-6


def test_batchnorm_mutable_path():
    # norm='batch' at module level via flax mutable collections (the Trainer
    # threads batch_stats when constructed with model_state=...).
    model = PointwiseClassifier(
        num_classes=4, channels=(8,), radii=(0.6,), head_dims=(8,),
        impl="reference", norm="batch", dropout_rate=0.0,
    )
    pts = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 3), minval=-1, maxval=1)
    variables = model.init(jax.random.PRNGKey(1), pts, train=False)
    assert "batch_stats" in variables
    out, updates = model.apply(variables, pts, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 4)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(before, after)
    )
    # eval path uses running averages without mutability
    out2 = model.apply(
        {"params": variables["params"], "batch_stats": updates["batch_stats"]},
        pts, train=False,
    )
    assert out2.shape == (2, 4)


def test_masked_batchnorm_ignores_padding():
    # nn.BatchNorm's moments include zeroed padding rows; MaskedBatchNorm's
    # must not: normalizing a padded batch (with mask) must equal
    # normalizing the unpadded batch, on the real rows.
    import numpy as np

    from pointwise_tpu.models.layers import MaskedBatchNorm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32) * 2 + 1)
    x_pad = jnp.concatenate([x, jnp.zeros((2, 4, 3))], axis=1)
    mask = jnp.concatenate([jnp.ones((2, 5)), jnp.zeros((2, 4))], axis=1)

    bn = MaskedBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x)
    y, st = bn.apply(v, x, mutable=["batch_stats"])
    y_pad, st_pad = bn.apply(v, x_pad, mask, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_pad[:, :5]), np.asarray(y),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st_pad)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    # and WITHOUT the mask the padded moments would differ (the failure
    # mode this layer exists to prevent)
    y_wrong, _ = bn.apply(v, x_pad, mutable=["batch_stats"])
    assert np.abs(np.asarray(y_wrong[:, :5]) - np.asarray(y)).max() > 1e-2
