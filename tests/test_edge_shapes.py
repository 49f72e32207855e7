"""Edge shapes through the op and models (tiny N, single channels, B=1)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.ops import pointwise_conv, pointwise_conv_reference


def _check(b, n, cin, cout, radius=0.7, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    pts = jax.random.uniform(k[0], (b, n, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (b, n, cin))
    w = jax.random.normal(k[2], (27, cin, cout)) * 0.3
    bias = jax.random.normal(k[3], (cout,))
    y_ref = pointwise_conv_reference(pts, feats, w, bias, radius=radius)
    y = pointwise_conv(pts, feats, w, bias, radius=radius, impl="pallas")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-5, atol=3e-5,
                               err_msg=f"b={b} n={n} cin={cin} cout={cout}")


def test_single_channel():
    _check(1, 40, 1, 1)


def test_tiny_cloud():
    _check(2, 4, 3, 5)


def test_single_point_cloud():
    # one point: only the self-neighbor (cell 13) contributes
    pts = jnp.zeros((1, 1, 3))
    feats = jnp.ones((1, 1, 3)) * 2.0
    w = jnp.zeros((27, 3, 2)).at[13].set(jnp.ones((3, 2)))
    y = pointwise_conv(pts, feats, w, None, radius=0.5, impl="pallas")
    np.testing.assert_allclose(np.asarray(y), 6.0, rtol=1e-6)


def test_wide_channels_unaligned():
    _check(1, 48, 130, 97, radius=0.9)


def test_grid_aligned_points_boundary():
    # points on an exact grid: many pairs at exactly radius distance —
    # the clip keeps boundary cells in range, reference and kernel agree.
    g = jnp.stack(jnp.meshgrid(*([jnp.arange(3.0)] * 3)), -1).reshape(1, 27, 3)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 27, 4))
    w = jax.random.normal(jax.random.PRNGKey(2), (27, 4, 4)) * 0.2
    for radius in (1.0, 2.0 ** 0.5, 2.0):
        y_ref = pointwise_conv_reference(g, feats, w, None, radius=radius)
        y = pointwise_conv(g, feats, w, None, radius=radius, impl="pallas")
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=3e-5, atol=3e-5, err_msg=str(radius))
