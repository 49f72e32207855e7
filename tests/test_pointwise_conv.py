"""Correctness of the pointwise-conv op: Pallas kernel vs dense reference.

SURVEY.md section 4 tiers 1-2: forward match, gradient match (dW, dx, dbias),
permutation invariance, mask/padding equivalence, empty-cell handling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointwise_tpu.ops import pointwise_conv, pointwise_conv_reference


def make_problem(key, b=2, n=80, cin=5, cout=7, spread=1.0):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.uniform(k1, (b, n, 3), minval=-spread, maxval=spread)
    feats = jax.random.normal(k2, (b, n, cin))
    w = jax.random.normal(k3, (27, cin, cout)) * 0.2
    bias = jax.random.normal(k4, (cout,)) * 0.1
    return pts, feats, w, bias


@pytest.mark.smoke
def test_forward_matches_reference():
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(0))
    y_ref = pointwise_conv_reference(pts, feats, w, bias, radius=0.5)
    y_pal = pointwise_conv(pts, feats, w, bias, radius=0.5, impl="pallas")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_forward_unbatched():
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(1), b=1)
    y_ref = pointwise_conv_reference(pts[0], feats[0], w, bias, radius=0.4)
    y_pal = pointwise_conv(pts[0], feats[0], w, bias, radius=0.4, impl="pallas")
    assert y_pal.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_radius_variants():
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(2), n=50)
    for r in (0.05, 0.3, 1.0, 5.0):   # 5.0 = everything is a neighbor
        y_ref = pointwise_conv_reference(pts, feats, w, bias, radius=r)
        y_pal = pointwise_conv(pts, feats, w, bias, radius=r, impl="pallas")
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_ref), rtol=2e-5, atol=2e-5, err_msg=f"r={r}"
        )


def test_counts_match_reference_binning():
    # pointwise_conv_counts (the ring strategy's geometry pre-pass) equals
    # brute-force per-cell neighbor counting.
    from pointwise_tpu.ops import pointwise_conv_counts

    pts, _, _, _ = make_problem(jax.random.PRNGKey(40), b=2, n=96)
    r = 0.5
    cnt = np.asarray(pointwise_conv_counts(pts, radius=r))
    p = np.asarray(pts)
    rel = p[:, None, :, :] - p[:, :, None, :]
    d2 = (rel ** 2).sum(-1)
    valid = d2 <= r * r
    c = np.clip(np.floor((rel + r) * (3.0 / (2 * r))), 0, 2)
    cell = (c[..., 0] * 9 + c[..., 1] * 3 + c[..., 2]).astype(int)
    ref = (np.eye(27)[cell] * valid[..., None]).sum(axis=2)
    np.testing.assert_array_equal(cnt, ref)


def test_ext_counts_partial_sums_exact():
    # With EXTERNAL global counts the conv is linear over candidate
    # subsets: partial outputs over a disjoint split sum to the full conv,
    # and gradients match the reference (the memory-bounded ring contract).
    from pointwise_tpu.ops import pointwise_conv_counts

    pts, feats, w, bias = make_problem(jax.random.PRNGKey(41), b=2, n=96)
    r = 0.5
    cnt = pointwise_conv_counts(pts, radius=r)
    half = pts.shape[1] // 2
    y1 = pointwise_conv(pts[:, :half], feats[:, :half], w, None, radius=r,
                        centers=pts, ext_counts=cnt)
    y2 = pointwise_conv(pts[:, half:], feats[:, half:], w, None, radius=r,
                        centers=pts, ext_counts=cnt)
    y_ref = pointwise_conv_reference(pts, feats, w, bias, radius=r)
    got = np.asarray(y1) + np.asarray(y2) + np.asarray(bias)
    np.testing.assert_allclose(got, np.asarray(y_ref), rtol=3e-5, atol=3e-5)

    # the executable spec supports the same partial-conv contract, so the
    # ring strategy can be debugged end-to-end against impl='reference'
    r1 = pointwise_conv(pts[:, :half], feats[:, :half], w, None, radius=r,
                        centers=pts, ext_counts=cnt, impl="reference")
    r2 = pointwise_conv(pts[:, half:], feats[:, half:], w, None, radius=r,
                        centers=pts, ext_counts=cnt, impl="reference")
    got_ref = np.asarray(r1) + np.asarray(r2) + np.asarray(bias)
    np.testing.assert_allclose(got_ref, np.asarray(y_ref), rtol=3e-5,
                               atol=3e-5)

    def loss(f, w_):
        ya = pointwise_conv(pts[:, :half], f[:, :half], w_, None, radius=r,
                            centers=pts, ext_counts=cnt)
        yb = pointwise_conv(pts[:, half:], f[:, half:], w_, None, radius=r,
                            centers=pts, ext_counts=cnt)
        return jnp.sum((ya + yb) ** 2)

    def loss_ref(f, w_):
        return jnp.sum(pointwise_conv_reference(pts, f, w_, None, radius=r) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(feats, w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def test_tiny_radius_only_self():
    # With a radius smaller than any inter-point gap, each point sees only
    # itself (middle cell 13): y = W_13 @ x + b.
    pts = jnp.asarray(np.random.RandomState(3).uniform(-1, 1, (1, 40, 3)), jnp.float32)
    feats = jnp.asarray(np.random.RandomState(4).randn(1, 40, 6), jnp.float32)
    w = jnp.asarray(np.random.RandomState(5).randn(27, 6, 4), jnp.float32)
    y = pointwise_conv(pts, feats, w, None, radius=1e-5, impl="pallas")
    expect = jnp.einsum("bnc,cd->bnd", feats, w[13])
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), rtol=2e-5, atol=2e-5)


@pytest.mark.smoke
def test_gradients_match_reference():
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(5), b=2, n=60, cin=4, cout=3)
    key_g = jax.random.PRNGKey(9)

    def loss(fn):
        def f(feats_, w_, bias_):
            y = fn(pts, feats_, w_, bias_)
            gdir = jax.random.normal(key_g, y.shape)
            return jnp.sum(y * gdir)
        return f

    ref_fn = lambda p, f, w_, b_: pointwise_conv_reference(p, f, w_, b_, radius=0.6)
    pal_fn = lambda p, f, w_, b_: pointwise_conv(p, f, w_, b_, radius=0.6, impl="pallas")

    g_ref = jax.grad(loss(ref_fn), argnums=(0, 1, 2))(feats, w, bias)
    g_pal = jax.grad(loss(pal_fn), argnums=(0, 1, 2))(feats, w, bias)
    for name, a, b in zip(("dfeats", "dW", "dbias"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-5, atol=3e-5, err_msg=name
        )


def test_mask_equivalence():
    # Feeding n valid + padding slots with mask must equal the unpadded call.
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(7), b=2, n=48)
    pad = 16
    pts_p = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)), constant_values=0.123)
    feats_p = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)), constant_values=9.0)
    mask = jnp.concatenate(
        [jnp.ones(pts.shape[:2]), jnp.zeros((pts.shape[0], pad))], axis=1
    )
    y = pointwise_conv(pts, feats, w, bias, radius=0.5, impl="pallas")
    y_m = pointwise_conv(pts_p, feats_p, w, bias, radius=0.5, mask=mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(y_m[:, :48]), np.asarray(y), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_m[:, 48:]), 0.0)


def test_mask_gradients_zero_at_padding():
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(8), b=1, n=32)
    mask = jnp.ones((1, 32)).at[0, 20:].set(0.0)

    def f(feats_):
        y = pointwise_conv(pts, feats_, w, bias, radius=0.5, mask=mask, impl="pallas")
        return jnp.sum(y ** 2)

    g = jax.grad(f)(feats)
    np.testing.assert_allclose(np.asarray(g[0, 20:]), 0.0)
    assert float(jnp.max(jnp.abs(g[0, :20]))) > 0.0


def test_center_permutation_equivariance():
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(10), b=1, n=56)
    perm = np.random.RandomState(0).permutation(56)
    y = pointwise_conv(pts, feats, w, bias, radius=0.5, impl="pallas")
    y_p = pointwise_conv(pts[:, perm], feats[:, perm], w, bias, radius=0.5, impl="pallas")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y[:, perm]), rtol=2e-4, atol=2e-5)


def test_self_conv_explicit_center_mask_matches_reference():
    # Spec rule (reference.py:111-114): in a self-convolution, center_mask
    # defaults to mask only when NOT given — a user-provided center_mask
    # must be honored (it used to be silently overwritten by mask).
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(13), b=2, n=64)
    rng = np.random.RandomState(5)
    mask = jnp.asarray((rng.rand(2, 64) > 0.2).astype(np.float32))
    cmask = jnp.asarray((rng.rand(2, 64) > 0.4).astype(np.float32))
    y_ref = pointwise_conv_reference(pts, feats, w, bias, radius=0.5,
                                     mask=mask, center_mask=cmask)
    y_pal = pointwise_conv(pts, feats, w, bias, radius=0.5, mask=mask,
                           center_mask=cmask, impl="pallas")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    # rows the center_mask invalidates are zero; rows only the candidate
    # mask invalidates are NOT (the reference computes them)
    dead = np.asarray(cmask) == 0
    assert np.all(np.asarray(y_pal)[dead] == 0.0)
    live_bias_free = np.asarray(
        pointwise_conv(pts, feats, w, None, radius=0.5, mask=mask,
                       center_mask=cmask, impl="pallas"))
    only_mask_dead = (np.asarray(mask) == 0) & ~dead
    assert np.any(np.abs(live_bias_free[only_mask_dead]) > 0)


def test_ext_counts_rejects_bias():
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(14), b=1, n=32)
    from pointwise_tpu.ops import pointwise_conv_counts

    cnt = pointwise_conv_counts(pts, radius=0.5)
    with pytest.raises(ValueError, match="partial"):
        pointwise_conv(pts, feats, w, bias, radius=0.5, centers=pts,
                       ext_counts=cnt)


def test_spatial_impl_rejects_unsupported_kwargs():
    pts, feats, w, _ = make_problem(jax.random.PRNGKey(15), b=1, n=32)
    with pytest.raises(ValueError, match="does not support"):
        pointwise_conv(pts, feats, w, None, radius=0.5, impl="spatial:space",
                       csr=True)
    # subblock is likewise a pallas/reference-path feature: the spatial impl
    # must refuse it rather than silently convolve without sub-blocking
    with pytest.raises(ValueError, match="does not support"):
        pointwise_conv(pts, feats, w, None, radius=0.5, impl="spatial:space",
                       subblock=4)


def test_translation_invariance():
    # The op depends on points only through relative offsets p_j - p_i, so a
    # rigid translation must not change outputs (up to fp rounding of the
    # subtraction).  The streaming engine's tile recentering
    # (streaming._stage) RELIES on this property for exactness.
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(12), b=1, n=64)
    for impl in ("reference", "pallas"):
        y = pointwise_conv(pts, feats, w, bias, radius=0.5, impl=impl)
        for t in ((3.25, -1.5, 0.75), (-40.0, 17.0, 9.5)):
            y_t = pointwise_conv(pts + jnp.asarray(t), feats, w, bias,
                                 radius=0.5, impl=impl)
            np.testing.assert_allclose(np.asarray(y_t), np.asarray(y),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"{impl} t={t}")


def test_separate_centers():
    # centers != points: used by halo/spatial sharding paths.
    key = jax.random.PRNGKey(11)
    pts, feats, w, bias = make_problem(key, b=2, n=64, cin=5, cout=6)
    ctr = pts[:, 10:42]
    y_ref = pointwise_conv_reference(pts, feats, w, bias, radius=0.5, centers=ctr)
    y_pal = pointwise_conv(pts, feats, w, bias, radius=0.5, centers=ctr, impl="pallas")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_empty_neighborhood_outputs_bias():
    # A center far from all candidates has zero neighbors everywhere: y = bias.
    pts = jnp.zeros((1, 8, 3)) + jnp.arange(8, dtype=jnp.float32)[None, :, None]
    feats = jnp.ones((1, 8, 4))
    ctr = jnp.full((1, 4, 3), 500.0)
    w = jnp.ones((27, 4, 3))
    bias = jnp.asarray([1.0, 2.0, 3.0])
    y = pointwise_conv(pts, feats, w, bias, radius=0.25, centers=ctr, impl="pallas")
    np.testing.assert_allclose(np.asarray(y), np.broadcast_to(np.array([1.0, 2.0, 3.0]), (1, 4, 3)))


def test_cell_binning_structure():
    # One candidate per known offset direction must select the matching W_k:
    # with a single neighbor in cell k plus the center itself in cell 13,
    # y = W_k @ x_j + W_13 @ x_i.
    r = 0.9
    ctr = jnp.zeros((1, 1, 3))
    # offset clearly inside the (2,1,1) cell: x in (r/3, r], y,z centered
    off = jnp.asarray([[0.6 * r, 0.0, 0.0]])
    pts = jnp.concatenate([jnp.zeros((1, 1, 3)), off[None]], axis=1)  # center + 1 nb
    feats = jnp.asarray(np.random.RandomState(1).randn(1, 2, 5), jnp.float32)
    w = jnp.asarray(np.random.RandomState(2).randn(27, 5, 4), jnp.float32)
    y = pointwise_conv(pts, feats, w, None, radius=r, centers=ctr, impl="pallas")
    k = 2 * 9 + 1 * 3 + 1   # cx=2 (positive x), cy=cz=1 (centered)
    expect = feats[0, 1] @ w[k] + feats[0, 0] @ w[13]
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(expect), rtol=2e-5, atol=2e-5)


def test_checkify_guards_large_coordinates():
    # SURVEY.md section 5 sanitizer row: out-of-range coordinates (which
    # would silently collide with sentinel padding) fail loudly under
    # checkify when validation is enabled (opt-in since round 3:
    # checkify's globally-incrementing error codes make traced programs
    # history-dependent and defeat the persistent compile cache).
    from jax.experimental import checkify

    from pointwise_tpu.ops.pointwise_conv import set_validation

    pts, feats, w, bias = make_problem(jax.random.PRNGKey(30), b=1, n=32)

    def f(pts_):
        return pointwise_conv(pts_, feats, w, bias, radius=0.5, impl="pallas")

    set_validation(True)
    try:
        checked = checkify.checkify(f, errors=checkify.user_checks)
        err, _ = checked(pts)
        err.throw()  # in-range: no error
        bad = pts.at[0, 3].set(jnp.asarray([7.0e5, 0.0, 0.0]))
        err, _ = checked(bad)
        with pytest.raises(Exception, match="sentinel"):
            err.throw()
    finally:
        set_validation(False)


@pytest.mark.smoke
def test_csr_forward_matches_reference():
    # CSR tile-pair walk (scalar-prefetch path) must be exact, including the
    # runtime dense fallback when a center tile exceeds the degree cap.
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(20), b=2, n=96)
    y_ref = pointwise_conv_reference(pts, feats, w, bias, radius=0.3)
    y_csr = pointwise_conv(pts, feats, w, bias, radius=0.3, impl="pallas", csr=True)
    np.testing.assert_allclose(np.asarray(y_csr), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
    # huge radius -> every tile adjacent -> overflow -> dense fallback
    y_ref2 = pointwise_conv_reference(pts, feats, w, bias, radius=9.0)
    y_csr2 = pointwise_conv(pts, feats, w, bias, radius=9.0, impl="pallas", csr=True)
    np.testing.assert_allclose(np.asarray(y_csr2), np.asarray(y_ref2), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_csr_gradients_match_dense():
    """dW/dX take the scalar-prefetch CSR grids (not the dense fallback) and
    stay exact vs both the dense kernels and the reference impl."""
    import importlib

    kmod = importlib.import_module("pointwise_tpu.kernels.pointwise_conv_pallas")
    # Multi-tile problem (4 center/candidate tiles at tile 128) sorted along
    # x so the tiles are slabs and the bbox adjacency is genuinely sparse:
    # each 2-wide slab only touches its neighbors at radius 0.3.
    pts, feats, w, bias = make_problem(
        jax.random.PRNGKey(21), b=1, n=512, cin=4, cout=3, spread=4.0
    )
    pts_np = np.asarray(pts)
    pts = jnp.asarray(pts_np[:, np.argsort(pts_np[0, :, 0], kind="stable")])

    def loss(csr, impl="pallas"):
        def f(feats_, w_):
            y = pointwise_conv(pts, feats_, w_, bias, radius=0.3, impl=impl,
                               csr=csr, tile_n=128, tile_m=128)
            return jnp.sum(y ** 2)
        return f

    g_dense = jax.grad(loss(False), argnums=(0, 1))(feats, w)
    before = dict(kmod._TRACE_COUNTS)
    g_csr = jax.grad(loss(True), argnums=(0, 1))(feats, w)
    after = dict(kmod._TRACE_COUNTS)
    # the CSR gradient kernels were staged...
    assert after["dw_csr"] > before["dw_csr"], "dW did not take the CSR grid"
    assert after["dx_csr"] > before["dx_csr"], "dX did not take the CSR grid"
    # ...and the runtime fallback cannot have fired: with d_max as the op
    # layer picks it (== n_tiles here) the bbox adjacency cannot overflow in
    # either orientation (forward/dW and the transposed dX walk), and the
    # walk is genuinely sparse (max degree < number of tiles).
    spec = kmod.PwConvSpec(
        radius=0.3, batch=1, n_centers=512, n_points=512, cin_p=128,
        cout_p=128, cin_col=4, tile_n=128, tile_m=128, interpret=True,
        use_csr=True, d_max=4,
    )
    ptsf = pts.astype(jnp.float32)
    ptst = jnp.swapaxes(ptsf, 1, 2)
    _, deg_fw, ovf_fw = kmod._tile_adjacency(spec, ptsf, ptst)
    _, deg_dx, ovf_dx = kmod._tile_adjacency_dx(spec, ptsf, ptst, spec.d_max)
    assert not bool(ovf_fw) and not bool(ovf_dx), "degree cap overflowed"
    assert int(jnp.max(deg_fw)) < 4, "walk is all-pairs, not sparse"
    assert int(jnp.max(deg_dx)) < 4, "dX walk is all-pairs, not sparse"

    g_ref = jax.grad(loss(None, impl="reference"), argnums=(0, 1))(feats, w)
    for name, a, b in zip(("dx", "dw"), g_dense, g_csr):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6, err_msg=name
        )
    for name, a, b in zip(("dx", "dw"), g_ref, g_csr):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-5, atol=3e-5, err_msg=name
        )


def test_attribution_ablations_run(monkeypatch):
    """The timing-only ablation knobs behind scripts/attribute_fwd_kernel.py
    (GOLDEN round-4 attribution) must not bitrot: num_emit=27 in 'compare'
    mode IS the production kernel (bit-identical output), while 'scaled'
    masks and truncated plane counts run but produce different (wrong)
    values by design."""
    import importlib

    kmod = importlib.import_module("pointwise_tpu.kernels.pointwise_conv_pallas")
    opmod = importlib.import_module("pointwise_tpu.ops.pointwise_conv")
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(31), b=1, n=96)
    orig_spec = kmod.PwConvSpec

    def run(**overrides):
        def patched(*a, **kw):
            kw.update(overrides)
            return orig_spec(*a, **kw)

        monkeypatch.setattr(opmod, "PwConvSpec", patched)
        return pointwise_conv(pts, feats, w, bias, radius=0.5, impl="pallas")

    y_prod = run()
    y_full = run(num_emit=kmod.N_CELLS)
    np.testing.assert_array_equal(np.asarray(y_full), np.asarray(y_prod))
    for y_ablate in (run(num_emit=9), run(mask_mode="scaled")):
        assert y_ablate.shape == y_prod.shape
        assert np.all(np.isfinite(np.asarray(y_ablate)))
        assert not np.allclose(np.asarray(y_ablate), np.asarray(y_prod))


@pytest.mark.slow
def test_csr_backward_chunking(monkeypatch):
    # Shrink the SMEM budget so the CSR dW/dX calls must chunk their scalar
    # tables; per-chunk results must recombine exactly (dW sums, dX concats).
    import importlib

    kmod = importlib.import_module("pointwise_tpu.kernels.pointwise_conv_pallas")
    monkeypatch.setattr(kmod, "_CSR_SMEM_BUDGET", 64)
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(23), b=1, n=256)

    def loss(csr):
        def f(feats_, w_):
            y = pointwise_conv(pts, feats_, w_, bias, radius=0.4,
                               impl="pallas", csr=csr, tile_n=128, tile_m=128)
            return jnp.sum(y ** 2)
        return f

    g_dense = jax.grad(loss(False), argnums=(0, 1))(feats, w)
    g_csr = jax.grad(loss(True), argnums=(0, 1))(feats, w)
    for a, b in zip(g_dense, g_csr):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_csr_gradient_overflow_fallback():
    # huge radius -> every tile adjacent -> degree overflow -> the runtime
    # dense fallback must keep gradients exact.
    pts, feats, w, bias = make_problem(jax.random.PRNGKey(22), b=1, n=256)

    def loss(csr):
        def f(feats_, w_):
            y = pointwise_conv(pts, feats_, w_, bias, radius=9.0,
                               impl="pallas", csr=csr, tile_n=128, tile_m=128)
            return jnp.sum(y ** 2)
        return f

    g_dense = jax.grad(loss(False), argnums=(0, 1))(feats, w)
    g_csr = jax.grad(loss(True), argnums=(0, 1))(feats, w)
    for a, b in zip(g_dense, g_csr):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6)


def test_dx_flip_orientation_parity(monkeypatch):
    """The flipped resident dX (planes built candidates-as-rows so walk
    matmuls are standard contractions; 1/count riding the mask select as a
    column broadcast) must reproduce the unflipped formulation EXACTLY:
    the flipped _pairwise_code computes the same candidate-minus-center
    floats, so cell routing — and therefore the gradient — is bit-stable.
    Also pins both against the dense reference at bf16 tolerance."""
    import importlib

    kmod = importlib.import_module("pointwise_tpu.kernels.pointwise_conv_pallas")
    opmod = importlib.import_module("pointwise_tpu.ops.pointwise_conv")
    pts, feats, w, _ = make_problem(jax.random.PRNGKey(41), b=2, n=128,
                                    cin=9, cout=11)
    orig_spec = kmod.PwConvSpec

    def grads(**overrides):
        def patched(*a, **kw):
            kw["resident"] = True
            kw.update(overrides)
            return orig_spec(*a, **kw)

        monkeypatch.setattr(opmod, "PwConvSpec", patched)

        def loss(f, w_):
            y = pointwise_conv(pts, f, w_, None, radius=0.5, impl="pallas",
                               precision="bfloat16")
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1))(feats, w)

    g_flip = grads(dx_flip=True)
    g_unflip = grads(dx_flip=False)
    for name, a, b in zip(("dx", "dw"), g_flip, g_unflip):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)

    def loss_ref(f, w_):
        y = pointwise_conv_reference(pts, f, w_, None, radius=0.5)
        return jnp.sum(y ** 2)

    # Coarse sanity net only: the bf16 path rounds features/masks to bf16,
    # so per-element deviations vs the f32 reference reach ~0.2 normalized
    # (measured; identical for the unflipped kernel).  The EXACT regression
    # pin is the flip==unflip bitwise assert above; f32-exact gradient
    # parity is covered by test_gradients_match_reference.
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    for name, a, r in zip(("dx", "dw"), g_flip, g_ref):
        scale = np.maximum(np.abs(np.asarray(r)), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(r) / scale,
                                   rtol=0, atol=0.3, err_msg=name)


def test_dx_flip_grid_and_csr_parity(monkeypatch):
    """Flip orientation parity for the OTHER two dX kernels: the f32 grid
    kernel (resident dX requires bf16) and the CSR scalar-prefetch kernel.
    f32 accumulation order differs between orientations, so these pin
    near-exact (1e-6) equality rather than bitwise."""
    import importlib

    kmod = importlib.import_module("pointwise_tpu.kernels.pointwise_conv_pallas")
    opmod = importlib.import_module("pointwise_tpu.ops.pointwise_conv")
    pts, feats, w, _ = make_problem(jax.random.PRNGKey(43), b=1, n=256,
                                    cin=6, cout=9)
    orig_spec = kmod.PwConvSpec

    def grads(csr, **overrides):
        def patched(*a, **kw):
            kw.update(overrides)
            return orig_spec(*a, **kw)

        monkeypatch.setattr(opmod, "PwConvSpec", patched)

        def loss(f, w_):
            y = pointwise_conv(pts, f, w_, None, radius=0.4, impl="pallas",
                               csr=csr, tile_n=128, tile_m=128)
            return jnp.sum(y ** 2)

        return jax.grad(loss, argnums=(0, 1))(feats, w)

    for csr in (False, True):
        g_flip = grads(csr, dx_flip=True)
        g_unflip = grads(csr, dx_flip=False)
        for name, a, b in zip(("dx", "dw"), g_flip, g_unflip):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
                err_msg=f"csr={csr} {name}")


def _morton_sorted_problem(key, b=2, n=256, cin=5, cout=7, spread=1.0):
    from pointwise_tpu.utils.spatial import morton_sort_batch

    pts, feats, w, bias = make_problem(key, b=b, n=n, cin=cin, cout=cout,
                                       spread=spread)
    return morton_sort_batch(np.asarray(pts)), feats, w, bias


def test_subblock_matches_dense_fwd_and_grads():
    # round-5 sub-block overlap-save: candidate gather + bbox selection must
    # reproduce the plain dense conv EXACTLY (same kernel underneath, just a
    # restricted-but-complete candidate set) including dX through the
    # gather's scatter-add transpose and dW/dbias.
    pts, feats, w, bias = _morton_sorted_problem(jax.random.PRNGKey(31))
    pts = jnp.asarray(pts)
    kw = dict(radius=0.25, impl="pallas")

    y_dense = pointwise_conv(pts, feats, w, bias, **kw)
    y_sub = pointwise_conv(pts, feats, w, bias, subblock=4, **kw)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_dense),
                               rtol=1e-6, atol=1e-6)

    def loss(sub):
        def f(feats_, w_, b_):
            y = pointwise_conv(pts, feats_, w_, b_, subblock=sub, **kw)
            return jnp.sum(y ** 2)
        return f

    g_dense = jax.grad(loss(None), argnums=(0, 1, 2))(feats, w, bias)
    g_sub = jax.grad(loss(4), argnums=(0, 1, 2))(feats, w, bias)
    for a, b in zip(g_dense, g_sub):
        # per-sub-block accumulation reorders the f32 sums (dbias sums B*S
        # partials instead of B) — identical math, order-level round-off
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_subblock_overflow_falls_back_dense():
    # a cap smaller than any group's candidate count must take the dense
    # branch at runtime and stay exact (the cap picks the program, never
    # the answer).  n must EXCEED the lane-rounded cap for the overflow to
    # be reachable at all (cap = min(round_up(subblock_cap, 128), n) — an
    # earlier n=128 variant made cap == n and tested nothing); here
    # radius 2.5 >> the unit spread, so every group's candidate count is
    # the full 256 > cap 128, the cond MUST take the dense branch, and a
    # wrongly-taken sub branch would truncate half of every neighborhood
    # and fail the equality below.
    pts, feats, w, bias = _morton_sorted_problem(jax.random.PRNGKey(32),
                                                 n=256)
    pts = jnp.asarray(pts)
    y_dense = pointwise_conv(pts, feats, w, bias, radius=2.5, impl="pallas")
    y_sub = pointwise_conv(pts, feats, w, bias, radius=2.5, impl="pallas",
                           subblock=4, subblock_cap=32)   # cap < group count
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_dense),
                               rtol=1e-6, atol=1e-6)


def test_subblock_reference_impl_matches_spec():
    # subblock is handled BEFORE the impl dispatch and forwards impl into
    # its recursion (an earlier ordering silently ignored subblock under
    # impl='reference'), so the gather/cap/fallback machinery validates
    # directly against the executable spec.
    pts, feats, w, bias = _morton_sorted_problem(jax.random.PRNGKey(34))
    pts = jnp.asarray(pts)
    y_ref = pointwise_conv(pts, feats, w, bias, radius=0.25,
                           impl="reference")
    y_sub = pointwise_conv(pts, feats, w, bias, radius=0.25,
                           impl="reference", subblock=4)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


def test_subblock_masked_rows():
    # masked (padding) candidates must not leak into any sub-block's
    # neighborhoods, and masked centers must output zeros — same contract
    # as the dense path
    pts, feats, w, bias = _morton_sorted_problem(jax.random.PRNGKey(33))
    pts = jnp.asarray(pts)
    mask = jnp.ones(pts.shape[:2]).at[:, -40:].set(0.0)
    y_dense = pointwise_conv(pts, feats, w, bias, radius=0.3, mask=mask,
                             impl="pallas")
    y_sub = pointwise_conv(pts, feats, w, bias, radius=0.3, mask=mask,
                           impl="pallas", subblock=4)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_dense),
                               rtol=1e-6, atol=1e-6)
    assert np.abs(np.asarray(y_sub)[:, -40:]).max() == 0.0
