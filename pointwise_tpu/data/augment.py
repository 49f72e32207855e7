"""Jittable point-cloud transforms (the reference's NumPy `provider` utils).

Rebuild of SURVEY.md C9: the reference augments clouds on the host with
NumPy (up-axis rotation, Gaussian jitter, shuffle, scale) between feed_dict
steps.  Here every transform is a pure JAX function keyed by an explicit
PRNG key, `vmap`-able over the batch and fused by XLA into the device step —
augmentation costs no host round-trip.

Conventions: clouds are (N, 3) or (B, N, 3); the up axis is +Y for
ModelNet-style objects (rotation about Y), matching the PointNet-lineage
pipelines the reference inherits.  All functions take batched or unbatched
input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _batchify(fn, key, pts, *args, **kwargs):
    if pts.ndim == 2:
        return fn(key, pts, *args, **kwargs)
    keys = jax.random.split(key, pts.shape[0])
    return jax.vmap(lambda k, p: fn(k, p, *args, **kwargs))(keys, pts)


def normalize_unit_sphere(points: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Center to centroid and scale into the unit sphere (per cloud)."""

    def one(p, m):
        if m is None:
            c = jnp.mean(p, axis=0)
            p = p - c
            scale = jnp.maximum(jnp.max(jnp.linalg.norm(p, axis=-1)), 1e-8)
            return p / scale
        mm = m.astype(p.dtype)[:, None]
        denom = jnp.maximum(jnp.sum(mm), 1.0)
        c = jnp.sum(p * mm, axis=0) / denom
        p = (p - c) * mm
        scale = jnp.maximum(jnp.max(jnp.linalg.norm(p, axis=-1)), 1e-8)
        return p / scale

    if points.ndim == 2:
        return one(points, mask)
    if mask is None:
        return jax.vmap(lambda p: one(p, None))(points)
    return jax.vmap(one)(points, mask)


def rotate_y(key, points):
    """Random rotation about the up (Y) axis."""

    def one(k, p):
        theta = jax.random.uniform(k, (), minval=0.0, maxval=2.0 * jnp.pi)
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], p.dtype)
        return p @ rot

    return _batchify(one, key, points)


def rotate_z(key, points):
    """Random rotation about Z (scene datasets with Z-up, e.g. S3DIS)."""

    def one(k, p):
        theta = jax.random.uniform(k, (), minval=0.0, maxval=2.0 * jnp.pi)
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], p.dtype)
        return p @ rot

    return _batchify(one, key, points)


def jitter(key, points, sigma: float = 0.01, clip: float = 0.05):
    """Per-point Gaussian jitter, clipped (reference provider semantics)."""

    def one(k, p):
        noise = jnp.clip(sigma * jax.random.normal(k, p.shape), -clip, clip)
        return p + noise

    return _batchify(one, key, points)


def random_scale(key, points, lo: float = 0.8, hi: float = 1.25):
    def one(k, p):
        s = jax.random.uniform(k, (), minval=lo, maxval=hi)
        return p * s

    return _batchify(one, key, points)


def random_dropout(key, points, max_ratio: float = 0.875):
    """Randomly duplicate the first point over a dropped subset (PointNet-style
    point dropout that keeps static shapes)."""

    def one(k, p):
        k1, k2 = jax.random.split(k)
        ratio = jax.random.uniform(k1, ()) * max_ratio
        drop = jax.random.uniform(k2, (p.shape[0],)) < ratio
        return jnp.where(drop[:, None], p[0], p)

    return _batchify(one, key, points)


def shuffle_points(key, points, *extras):
    """Random permutation of the point order (plus aligned extras)."""

    def one(k, p, *ex):
        perm = jax.random.permutation(k, p.shape[0])
        return (p[perm], *[e[perm] for e in ex])

    if points.ndim == 2:
        out = one(key, points, *extras)
        return out if extras else out[0]
    keys = jax.random.split(key, points.shape[0])
    out = jax.vmap(one)(keys, points, *extras)
    return out if extras else out[0]


def sample_points(key, points, n: int, *extras):
    """Uniformly sample n points with replacement (static output shape)."""

    def one(k, p, *ex):
        idx = jax.random.randint(k, (n,), 0, p.shape[0])
        return (p[idx], *[e[idx] for e in ex])

    if points.ndim == 2:
        out = one(key, points, *extras)
        return out if extras else out[0]
    keys = jax.random.split(key, points.shape[0])
    out = jax.vmap(one)(keys, points, *extras)
    return out if extras else out[0]


def classification_augment(key, points, *, rotate: bool = True):
    """Standard train-time augmentation for classification clouds."""
    k1, k2, k3 = jax.random.split(key, 3)
    if rotate:
        points = rotate_y(k1, points)
    points = random_scale(k2, points)
    points = jitter(k3, points)
    return points


def farthest_point_sample(key, points, n: int, *extras):
    """Jittable farthest-point sampling to exactly ``n`` points.

    BASELINE.json north star: "FPS/uniform sampling to N points".  Greedy
    max-min selection as a lax.fori_loop over a carried min-distance field —
    O(n * N) vectorized work, static shapes, vmap-able over batches.
    Returns sampled points (and aligned extras).
    """

    def one(k, p, *ex):
        start = jax.random.randint(k, (), 0, p.shape[0])
        idxs = jnp.zeros((n,), jnp.int32).at[0].set(start)
        mind2 = jnp.sum((p - p[start]) ** 2, axis=-1)

        def body(i, st):
            mind2, idxs = st
            nxt = jnp.argmax(mind2).astype(jnp.int32)
            idxs = idxs.at[i].set(nxt)
            d2 = jnp.sum((p - p[nxt]) ** 2, axis=-1)
            return jnp.minimum(mind2, d2), idxs

        mind2, idxs = jax.lax.fori_loop(1, n, body, (mind2, idxs))
        return (p[idxs], *[e[idxs] for e in ex])

    if points.ndim == 2:
        out = one(key, points, *extras)
        return out if extras else out[0]
    keys = jax.random.split(key, points.shape[0])
    out = jax.vmap(one)(keys, points, *extras)
    return out if extras else out[0]
