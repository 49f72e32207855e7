"""Native grid-hash index + exact streaming inference tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointwise_tpu import native
from pointwise_tpu.streaming import stream_apply
from pointwise_tpu.data import synthetic


def test_native_lib_builds():
    # g++ is part of the image; the ctypes path must be live (the NumPy
    # fallback exists for exotic environments only).
    assert native.available()


def test_grid_query_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 10, (5000, 3)).astype(np.float32)
    grid = native.GridIndex(pts, cell_size=1.3)
    for seed in range(5):
        r = np.random.RandomState(seed)
        lo = r.uniform(0, 8, 3).astype(np.float32)
        hi = lo + r.uniform(0.5, 3, 3).astype(np.float32)
        got = np.sort(grid.query_box(lo, hi))
        want = np.where(np.all((pts >= lo) & (pts < hi), axis=1))[0]
        np.testing.assert_array_equal(got, want)


def test_grid_cells_cover_all_points():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
    grid = native.GridIndex(pts, cell_size=0.9)
    seen = []
    for c in grid.nonempty_cells():
        lo = grid.origin + c.astype(np.float32) * grid.h
        seen.append(grid.query_box(lo, lo + grid.h))
    seen = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(seen, np.arange(len(pts)))


def test_cell_points_exact_partition():
    # cell_points must partition the point set EXACTLY (every point in
    # exactly one cell) — this is what tile interiors are built from; a
    # float AABB re-query can disagree by 1 ulp at cell seams.
    rng = np.random.RandomState(2)
    pts = rng.uniform(-5, 7, (4000, 3)).astype(np.float32)
    # adversarial: many points exactly on cell boundaries
    pts[:1000] = np.round(pts[:1000] / 1.1) * 1.1
    grid = native.GridIndex(pts, cell_size=1.1)
    seen = np.sort(np.concatenate(
        [grid.cell_points(c) for c in grid.nonempty_cells()]))
    np.testing.assert_array_equal(seen, np.arange(len(pts)))


def test_streaming_matches_direct():
    # Exactness: tile+halo streaming == full-scene apply, to fp tolerance.
    from pointwise_tpu.models import PointwiseSegmenter

    xyz, rgb, _ = synthetic.segmentation_scene(3, num_objects=3,
                                               points_per_obj=128)
    model = PointwiseSegmenter(
        num_classes=5, channels=(8, 8), radii=(0.25, 0.5), head_dims=(16,),
        impl="reference", dropout_rate=0.0, use_global_context=False,
    )
    feats = rgb
    params = jax.jit(
        lambda r: model.init(r, jnp.asarray(xyz[None]), jnp.asarray(feats[None]),
                             jnp.ones((1, len(xyz))), train=False)
    )(jax.random.PRNGKey(0))["params"]

    @jax.jit
    def apply_fn(pts, fts, mask):
        return model.apply({"params": params}, pts, fts, mask, train=False)

    direct = np.asarray(
        apply_fn(jnp.asarray(xyz[None]), jnp.asarray(feats[None]),
                 jnp.ones((1, len(xyz))))
    )[0]

    streamed = stream_apply(
        apply_fn, xyz, feats,
        halo=0.75,            # sum of radii
        tile_size=2.0,
        out_dim=5,
        buckets=(256, 512, 1024),
        tile_batch=2,
    )
    np.testing.assert_allclose(streamed, direct, rtol=2e-4, atol=2e-4)


def test_streaming_layered_matches_direct():
    # Shrinking-halo streaming (ring-ordered prefixes, per-layer centers)
    # must equal the full-scene forward exactly — same overlap-save argument
    # applied per layer.
    import functools

    from pointwise_tpu.models import PointwiseSegmenter
    from pointwise_tpu.streaming import stream_apply_layered

    xyz, rgb, _ = synthetic.segmentation_scene(3, num_objects=3,
                                               points_per_obj=128)
    radii = (0.25, 0.5)
    model = PointwiseSegmenter(
        num_classes=5, channels=(8, 8), radii=radii, head_dims=(16,),
        impl="reference", dropout_rate=0.0, use_global_context=False,
    )
    params = jax.jit(
        lambda r: model.init(r, jnp.asarray(xyz[None]), jnp.asarray(rgb[None]),
                             jnp.ones((1, len(xyz))), train=False)
    )(jax.random.PRNGKey(0))["params"]

    @jax.jit
    def apply_fn(pts, fts, mask):
        return model.apply({"params": params}, pts, fts, mask, train=False)

    direct = np.asarray(
        apply_fn(jnp.asarray(xyz[None]), jnp.asarray(rgb[None]),
                 jnp.ones((1, len(xyz))))
    )[0]

    @functools.partial(jax.jit, static_argnums=(5,))
    def apply_layered(pts, fts, cnt, sels, skips, lengths):
        return model.apply({"params": params}, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    streamed = stream_apply_layered(
        apply_layered, xyz, rgb, radii=radii, tile_size=2.0, out_dim=5,
        buckets=(256, 512, 1024), tile_batch=2,
    )
    np.testing.assert_allclose(streamed, direct, rtol=2e-4, atol=2e-4)


def test_streaming_layered_data_parallel_matches():
    # tile batches are embarrassingly parallel: sharding them over the mesh
    # 'data' axis must not change a single output value.
    import functools

    from pointwise_tpu.models import PointwiseSegmenter
    from pointwise_tpu.parallel import make_mesh
    from pointwise_tpu.streaming import stream_apply_layered

    xyz, rgb, _ = synthetic.segmentation_scene(7, num_objects=3,
                                               points_per_obj=160)
    radii = (0.3, 0.5)
    model = PointwiseSegmenter(
        num_classes=4, channels=(8, 8), radii=radii, head_dims=(8,),
        impl="reference", dropout_rate=0.0, use_global_context=False,
    )
    params = jax.jit(
        lambda r: model.init(r, jnp.asarray(xyz[None]), jnp.asarray(rgb[None]),
                             jnp.ones((1, len(xyz))), train=False)
    )(jax.random.PRNGKey(0))["params"]

    @functools.partial(jax.jit, static_argnums=(5,))
    def apply_layered(pts, fts, cnt, sels, skips, lengths):
        return model.apply({"params": params}, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    kw = dict(radii=radii, tile_size=2.0, out_dim=4, buckets=(256, 512, 1024))
    single = stream_apply_layered(apply_layered, xyz, rgb, tile_batch=2, **kw)
    sharded = stream_apply_layered(apply_layered, xyz, rgb, tile_batch=2,
                                   mesh=make_mesh(), **kw)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)


def test_streaming_layered_scene_sharded_matches():
    # SURVEY section 5 long-context tier 2 composed END-TO-END: tile batches
    # sharded over 'data' AND the device-resident scene arrays (the only
    # O(N_scene) device allocation) row-sharded over 'space' on a
    # (data:4, space:2) mesh.  The shard_map owner-gather staging must
    # reproduce the unsharded streaming outputs exactly.
    import functools

    from pointwise_tpu.models import PointwiseSegmenter
    from pointwise_tpu.parallel import make_mesh
    from pointwise_tpu.streaming import stream_apply_layered

    xyz, rgb, _ = synthetic.segmentation_scene(11, num_objects=4,
                                               points_per_obj=192)
    radii = (0.3, 0.5)
    model = PointwiseSegmenter(
        num_classes=4, channels=(8, 8), radii=radii, head_dims=(8,),
        impl="reference", dropout_rate=0.0, use_global_context=False,
    )
    params = jax.jit(
        lambda r: model.init(r, jnp.asarray(xyz[None]), jnp.asarray(rgb[None]),
                             jnp.ones((1, len(xyz))), train=False)
    )(jax.random.PRNGKey(0))["params"]

    @functools.partial(jax.jit, static_argnums=(5,))
    def apply_layered(pts, fts, cnt, sels, skips, lengths):
        return model.apply({"params": params}, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    kw = dict(radii=radii, tile_size=2.0, out_dim=4, buckets=(256, 512, 1024),
              tile_batch=4)
    single = stream_apply_layered(apply_layered, xyz, rgb, **kw)
    sharded = stream_apply_layered(apply_layered, xyz, rgb,
                                   mesh=make_mesh(space=2),
                                   scene_axis="space", **kw)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="mesh"):
        stream_apply_layered(apply_layered, xyz, rgb, scene_axis="space",
                             **kw)


def test_streaming_layered_length_profile_reuse():
    # Keep-alive serving contract: a length profile warmed on one scene is
    # reused for a different scene whenever it covers the new scene's
    # schedule (inflated slots are sentinel-dead -> outputs EXACTLY match a
    # profile-free run), and misses merge the profile monotonically so the
    # program set converges across requests.
    import functools

    from pointwise_tpu.models import PointwiseSegmenter
    from pointwise_tpu.streaming import stream_apply_layered

    radii = (0.25, 0.5)
    model = PointwiseSegmenter(
        num_classes=5, channels=(8, 8), radii=radii, head_dims=(16,),
        impl="reference", dropout_rate=0.0, use_global_context=False,
    )
    big_xyz, big_rgb, _ = synthetic.segmentation_scene(3, num_objects=4,
                                                       points_per_obj=200)
    small_xyz, small_rgb, _ = synthetic.segmentation_scene(9, num_objects=2,
                                                           points_per_obj=96)
    params = jax.jit(
        lambda r: model.init(r, jnp.asarray(big_xyz[None]),
                             jnp.asarray(big_rgb[None]),
                             jnp.ones((1, len(big_xyz))), train=False)
    )(jax.random.PRNGKey(0))["params"]

    @functools.partial(jax.jit, static_argnums=(5,))
    def apply_layered(pts, fts, cnt, sels, skips, lengths):
        return model.apply({"params": params}, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    kw = dict(radii=radii, tile_size=2.0, out_dim=5,
              buckets=(256, 512, 1024), tile_batch=2)
    profiles: dict = {}
    # warm request (big scene) populates the profile
    stream_apply_layered(apply_layered, big_xyz, big_rgb,
                         length_profiles=profiles, **kw)
    warmed = dict(profiles)
    assert warmed, "profile should be populated by the warm request"
    # second request (different, smaller scene) must reuse covering entries
    # unchanged AND match a profile-free run exactly
    got = stream_apply_layered(apply_layered, small_xyz, small_rgb,
                               length_profiles=profiles, **kw)
    want = stream_apply_layered(apply_layered, small_xyz, small_rgb, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    for b, (tbs, lengths) in warmed.items():
        assert profiles[b][0] == tbs
        assert all(new >= old
                   for new, old in zip(profiles[b][1], lengths)), \
            "profile entries must only grow (monotone merge)"


def test_streaming_big_tile_per_schedule_groups(tmp_path):
    # Round-5 big-scene fix: tiles that run one-per-chunk (tbs == 1) are
    # grouped by their OWN padded schedule, not the shared p0 bucket —
    # lumping them padded corner tiles up to interior-tile maxima (1.47x
    # pair-cost inflation measured on the 1M scene, GOLDEN round 5).  A
    # density gradient puts two big tiles in the same p0 bucket with
    # different deeper-level schedules; the engine must build >1 program
    # (events.new_programs), and the packer must fit every chunk into its
    # group's own lengths (it would crash on a mis-sized schedule).
    from pointwise_tpu.streaming import stream_apply_layered

    rng = np.random.RandomState(0)
    # two 4 m tiles with a strong density gradient: tile 0 dense ~26K pts,
    # tile 1 sparse ~14K pts -> same doubling bucket, different schedules
    a = rng.uniform((0, 0, 0), (4, 4, 1.0), (26000, 3))
    b = rng.uniform((4, 0, 0), (8, 4, 1.0), (14000, 3))
    xyz = np.concatenate([a, b]).astype(np.float32)
    feats = rng.uniform(0, 1, (len(xyz), 3)).astype(np.float32)

    def dummy_apply(pts, fts, cnt, sels, skips, lengths):
        return jnp.zeros((pts.shape[0], lengths[-1], 3), jnp.float32)

    ev = {}
    out = stream_apply_layered(
        dummy_apply, xyz, feats, radii=(0.3, 0.6), tile_size=4.0,
        out_dim=3, tile_batch=1, events=ev)
    assert out.shape == (len(xyz), 3)
    assert ev["new_programs"] >= 2, ev   # per-schedule groups, not one bucket

    # profile round-trip with tuple keys (infer.py persistence)
    import os
    import sys as _sys
    _sys.path.insert(0, os.getcwd())
    try:
        from infer import load_profiles, save_profiles
    finally:
        _sys.path.pop(0)
    profiles: dict = {}
    stream_apply_layered(
        dummy_apply, xyz, feats, radii=(0.3, 0.6), tile_size=4.0,
        out_dim=3, tile_batch=1, length_profiles=profiles)
    assert any(isinstance(k, tuple) for k in profiles), profiles
    path = str(tmp_path / "pw_test_profiles_tuple.json")
    save_profiles(path, profiles)
    assert load_profiles(path) == profiles

    # Coverage dedup (round-5 session fix): a later scene whose schedules
    # are elementwise COVERED by existing entries must reuse them and add
    # NO scene-specific keys — a keep-alive server over many distinct big
    # scenes would otherwise grow the profile (and its O(entries) covering
    # scan + the per-request profile-file rewrite) without bound.
    keys_before = set(profiles)
    thin_xyz = np.ascontiguousarray(xyz[::2])   # ~half density, same tiles:
    thin_fts = np.ascontiguousarray(feats[::2])  # strictly smaller schedules
    out2 = stream_apply_layered(
        dummy_apply, thin_xyz, thin_fts, radii=(0.3, 0.6), tile_size=4.0,
        out_dim=3, tile_batch=1, length_profiles=profiles)
    assert out2.shape == (len(thin_xyz), 3)
    assert set(profiles) == keys_before, (
        f"covered schedules must not insert new profile keys: "
        f"{set(profiles) - keys_before}")


def test_streaming_grouping_stays_bucketed_when_chunks_batch():
    # Round-5 session fix: per-schedule (tuple) group keys apply ONLY when
    # the VMEM bound forces one tile per chunk.  (a) a caller's
    # tile_batch=1 on SMALL tiles must keep bucket keys — one program per
    # bucket, not one 20-60 s program per distinct schedule; (b) under a
    # data mesh, chunks hold n_data tiles, so big tiles must ALSO keep
    # bucket keys (a one-member per-schedule group would pad n_data-1 zero
    # rows of device compute into every chunk).
    from pointwise_tpu.parallel import make_mesh
    from pointwise_tpu.streaming import stream_apply_layered

    rng = np.random.RandomState(3)

    def dummy_apply(pts, fts, cnt, sels, skips, lengths):
        return jnp.zeros((pts.shape[0], lengths[-1], 3), jnp.float32)

    # (a) two SMALL tiles, same 512 bucket, clearly different schedules
    # (cost gap > the 10% coalescing budget): must be ONE program.
    a = rng.uniform((0, 0, 0), (2, 2, 1), (400, 3))
    b = rng.uniform((10, 10, 0), (12, 12, 1), (180, 3))
    xyz = np.concatenate([a, b]).astype(np.float32)
    fts = rng.uniform(0, 1, (len(xyz), 3)).astype(np.float32)
    ev = {}
    out = stream_apply_layered(
        dummy_apply, xyz, fts, radii=(0.3, 0.6), tile_size=2.0, out_dim=3,
        buckets=(512, 1024), tile_batch=1, events=ev)
    assert out.shape == (len(xyz), 3)
    assert ev["new_programs"] == 1, ev

    # (b) two BIG tiles in the SAME 32768 bucket with distinct padded
    # schedules (26000 -> 32768 vs 20000 -> 24576 at the 8192 grain, cost
    # gap > the 10% coalescing budget) under a data mesh: bucket key again
    # -> ONE program whose chunks pack both tiles, not two one-member
    # per-schedule groups padded up to n_data slots each.
    a = rng.uniform((0, 0, 0), (4, 4, 1), (26000, 3))
    b = rng.uniform((4, 0, 0), (8, 4, 1), (20000, 3))
    xyz = np.concatenate([a, b]).astype(np.float32)
    fts = rng.uniform(0, 1, (len(xyz), 3)).astype(np.float32)

    def dummy_apply2(pts, fts_, cnt, sels, skips, lengths):
        return jnp.zeros((pts.shape[0], lengths[-1], 3), jnp.float32)

    ev = {}
    out = stream_apply_layered(
        dummy_apply2, xyz, fts, radii=(0.3, 0.6), tile_size=4.0, out_dim=3,
        tile_batch=4, mesh=make_mesh(), events=ev)
    assert out.shape == (len(xyz), 3)
    assert ev["new_programs"] == 1, ev


def test_streaming_events_truthful_without_warm_thread(monkeypatch):
    # POINTWISE_STREAM_WARM=0 moves program builds onto the dispatch
    # thread; the completed call must STILL record its programs warm, so a
    # keep-alive server's compile-visibility reports compiled=False on the
    # repeat request (the warm thread was previously the only _WARMED
    # writer).
    from pointwise_tpu.streaming import stream_apply_layered

    monkeypatch.setenv("POINTWISE_STREAM_WARM", "0")
    rng = np.random.RandomState(4)
    xyz = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    fts = rng.uniform(0, 1, (500, 3)).astype(np.float32)

    def dummy_apply(pts, fts_, cnt, sels, skips, lengths):
        return jnp.zeros((pts.shape[0], lengths[-1], 2), jnp.float32)

    kw = dict(radii=(0.3,), tile_size=2.0, out_dim=2, buckets=(512, 1024))
    ev1, ev2 = {}, {}
    stream_apply_layered(dummy_apply, xyz, fts, events=ev1, **kw)
    assert ev1["compiled"] and ev1["new_programs"] >= 1, ev1
    stream_apply_layered(dummy_apply, xyz, fts, events=ev2, **kw)
    assert not ev2["compiled"] and ev2["new_programs"] == 0, ev2


@pytest.mark.slow
def test_streaming_bucket_ladder_invariance():
    # SURVEY.md section 4 tier 2: the same scene through two bucket ladders
    # must produce identical outputs (padding/bucketing can't leak).
    from pointwise_tpu.models import PointwiseSegmenter

    xyz, rgb, _ = synthetic.segmentation_scene(5, num_objects=3,
                                               points_per_obj=200)
    model = PointwiseSegmenter(
        num_classes=4, channels=(8,), radii=(0.4,), head_dims=(8,),
        impl="reference", dropout_rate=0.0, use_global_context=False,
    )
    params = jax.jit(
        lambda r: model.init(r, jnp.asarray(xyz[None]), jnp.asarray(rgb[None]),
                             jnp.ones((1, len(xyz))), train=False)
    )(jax.random.PRNGKey(0))["params"]

    @jax.jit
    def apply_fn(pts, fts, mask):
        return model.apply({"params": params}, pts, fts, mask, train=False)

    kw = dict(halo=0.4, tile_size=1.5, out_dim=4)
    a = stream_apply(apply_fn, xyz, rgb, buckets=(256, 512, 1024, 2048),
                     tile_batch=2, **kw)
    b = stream_apply(apply_fn, xyz, rgb, buckets=(2048,), tile_batch=1, **kw)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_streaming_layered_stale_profile_replaced():
    # A persisted profile entry written by a DIFFERENT config (other radii
    # -> other schedule length) must be REPLACED on load, not merged: a
    # too-short lengths tuple once crashed the packer thread mid-serve,
    # and the bare queue sentinel made stream_apply_layered return
    # all-zero logits with no exception.
    import functools

    from pointwise_tpu.models import PointwiseSegmenter
    from pointwise_tpu.streaming import stream_apply_layered

    radii = (0.25, 0.5)
    model = PointwiseSegmenter(
        num_classes=5, channels=(8, 8), radii=radii, head_dims=(16,),
        impl="reference", dropout_rate=0.0, use_global_context=False,
    )
    xyz, rgb, _ = synthetic.segmentation_scene(4, num_objects=3,
                                               points_per_obj=128)
    params = jax.jit(
        lambda r: model.init(r, jnp.asarray(xyz[None]), jnp.asarray(rgb[None]),
                             jnp.ones((1, len(xyz))), train=False)
    )(jax.random.PRNGKey(0))["params"]

    @functools.partial(jax.jit, static_argnums=(5,))
    def apply_layered(pts, fts, cnt, sels, skips, lengths):
        return model.apply({"params": params}, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    kw = dict(radii=radii, tile_size=2.0, out_dim=5,
              buckets=(256, 512, 1024), tile_batch=2)
    fresh: dict = {}
    want = stream_apply_layered(apply_layered, xyz, rgb,
                                length_profiles=fresh, **kw)
    # stale entries: matching tbs but a 1-layer schedule (len 2 != L+1 = 3)
    profiles = {b: (2, (int(b), int(b))) for b in (256, 512, 1024)}
    got = stream_apply_layered(apply_layered, xyz, rgb,
                               length_profiles=profiles, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    for b in fresh:   # every bucket this scene touched was replaced whole
        assert len(profiles[b][1]) == len(radii) + 1, (b, profiles[b])
