"""Public pointwise-convolution op: padding, layout, dispatch, autodiff.

This is the rebuild of the reference's L2 op layer (SURVEY.md section 1):
where the reference loads a C++ ``.so`` via ``tf.load_op_library`` and
registers a gradient, here the fused Pallas kernels are JIT-compiled and the
custom VJP is bound at import time — there is no dynamic loading step.

The wrapper turns the user-facing irregular problem into the static padded
layout the kernels want:
  * N (centers) and M (candidates) are padded to tile multiples; padding
    points are moved to a far SENTINEL coordinate so they fall outside every
    neighborhood (no in-kernel masking needed).
  * A constant ones-column is appended to the features at index ``Cin`` so
    the binning matmul also produces neighbor counts; feature width is then
    padded to a lane multiple (128).
  * Masked (invalid) candidates are likewise moved to the sentinel; masked
    centers produce zeros via a final multiply (whose VJP also zeroes their
    upstream gradients — matching the reference semantics where padding
    slots carry no signal).

All padding/slicing happens in plain JAX, so XLA fuses it and autodiff
handles the corresponding gradient slicing automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import checkify

from pointwise_tpu.kernels.pointwise_conv_pallas import (
    LANE,
    N_CELLS,
    SENTINEL,
    _SENTINEL_CUT,
    PwConvSpec,
    _counts_call,
    pointwise_conv_pallas,
    pointwise_conv_pallas_ext,
    round_up,
)
from pointwise_tpu.ops import reference as _ref


# Optional global override for Pallas interpreter mode; needed when arrays
# live on a non-default backend (e.g. a CPU mesh under a TPU default
# backend), where the default-backend heuristic guesses wrong.
_FORCE_INTERPRET: bool | None = None


def set_interpret(value: bool | None) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value


# Input validation (the sentinel-collision guard) is OPT-IN:
# checkify.debug_check embeds a globally-incrementing error code into the
# traced program, so with it always on, a program's HLO depends on how many
# conv traces happened before it in the process — which defeats the
# persistent compile cache across processes (measured round 3: every
# streaming bucket-group program recompiled on every CLI run, ~65 s each
# time).  Enable it in tests / debugging sessions:
#     pointwise_conv.set_validation(True)
# and wrap the calling function with checkify.checkify(..., errors=
# checkify.user_checks) to surface the error.
_VALIDATE = False


def set_validation(value: bool) -> None:
    """Enable/disable the sentinel-collision input guard.

    TRACE-time switch: it takes effect only for functions traced AFTER the
    call — programs already jit-compiled in this process keep their cached
    (guard-free) executables.  Enable it before building the checkify'd
    function you want validated.
    """
    global _VALIDATE
    _VALIDATE = value


def _default_interpret() -> bool:
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


def _geometry_layout(points, mask, centers, center_mask, tile_n, tile_m,
                     cin_p=LANE, cout_p=LANE):
    """Shared geometry layout for ``pointwise_conv`` / ``pointwise_conv_counts``
    (one copy so the sentinel/padding/tile policy cannot drift between the
    conv and its ring-strategy counts pre-pass):

      * batch-dim promotion;
      * self-conv center defaulting — ``center_mask`` defaults to ``mask``
        ONLY when not given, matching the executable spec
        (ops/reference.py:111-114);
      * masked candidates -> +SENTINEL, masked non-self centers ->
        -SENTINEL (self-conv centers stay at their real coordinates: their
        outputs are computed then zeroed by the final center-mask multiply,
        exactly like the reference);
      * tile selection and padding to tile multiples.

    Returns (batched, self_conv, B, M, Nc, Mp, Ncp, tile_n, tile_m,
    pts, ctr, center_mask) with pts/ctr already sentinel-moved and padded.
    """
    batched = points.ndim == 3
    if not batched:
        points = points[None]
        mask = None if mask is None else mask[None]
        centers = None if centers is None else centers[None]
        center_mask = None if center_mask is None else center_mask[None]
    self_conv = centers is None
    if self_conv:
        centers = points
        if center_mask is None:
            center_mask = mask

    B, M, _ = points.shape
    Nc = centers.shape[1]
    if tile_m is None:
        # big candidate tiles amortize the accumulator RMW; both padded
        # sizes are made divisible by both tile shapes (sentinel padding is
        # skipped by the kernels' bbox early-out, so overshoot is cheap).
        tile_m = 512 if max(M, Nc) >= 512 else 128
    if tile_n is None:
        # bigger center tiles amortize finalize cost; keep VMEM bounded
        # (acc/Z scratch scale with tile_n * channel widths).
        tile_n = 256 if (max(M, Nc) >= 512 and cin_p <= 128
                         and cout_p <= 128) else 128
    pad_to = max(tile_n, tile_m)
    Mp = round_up(M, pad_to)
    Ncp = round_up(Nc, pad_to)

    f32 = jnp.float32
    pts = points.astype(f32)
    if mask is not None:
        pts = jnp.where(mask.astype(bool)[..., None], pts, SENTINEL)
    pts = jnp.pad(pts, ((0, 0), (0, Mp - M), (0, 0)),
                  constant_values=SENTINEL)
    ctr = centers.astype(f32)
    if (not self_conv) and center_mask is not None:
        ctr = jnp.where(center_mask.astype(bool)[..., None], ctr, -SENTINEL)
    ctr = jnp.pad(ctr, ((0, 0), (0, Ncp - Nc), (0, 0)),
                  constant_values=-SENTINEL)
    return (batched, self_conv, B, M, Nc, Mp, Ncp, tile_n, tile_m,
            pts, ctr, center_mask)


def _subblock_conv(points, features, weights, bias, *, radius, mask,
                   n_sub, cap, precision, interpret, tile_n, tile_m,
                   mask_mode, impl="pallas", csr=None):
    """Exact sub-block overlap-save self-convolution (see pointwise_conv).

    Centers are ``n_sub`` consecutive groups of the input order (morton-
    sorted blocks make them spatially compact — data/s3dis.py:112); each
    group's candidates are the valid points inside its bbox + radius,
    gathered (stable order) into a static ``cap``-slot array.  A center is
    always inside its own group's bbox, so self-neighborhoods are intact;
    candidate completeness holds whenever the group's count fits ``cap``,
    and a runtime lax.cond falls back to the plain dense conv otherwise —
    EXACT either way, the cap only decides which program runs.  Gradients
    compose: the gather's transpose scatter-adds candidate cotangents back
    into the full feature array around the op's custom VJP.
    """
    import jax

    batched = points.ndim == 3
    if not batched:
        points = points[None]
        features = features[None]
        mask = None if mask is None else mask[None]
    B, N, _ = points.shape
    S = n_sub
    if N % S:
        raise ValueError(f"subblock={S} must divide N={N}")
    ns = N // S
    if cap is None:
        # 3x the group size covers a compact morton group + halo at the
        # radii this path targets; oversized radii hit the dense fallback
        cap = round_up(min(N, 3 * ns), LANE)
    cap = int(min(round_up(cap, LANE), N))
    f32 = jnp.float32
    valid = (jnp.ones((B, N), bool) if mask is None
             else mask.astype(bool))
    p = points.astype(f32)
    pg = p.reshape(B, S, ns, 3)
    vg = valid.reshape(B, S, ns)
    big = jnp.float32(1.0e9)
    lo = jnp.where(vg[..., None], pg, big).min(axis=2) - radius    # (B,S,3)
    hi = jnp.where(vg[..., None], pg, -big).max(axis=2) + radius
    inb = jnp.all((p[:, None] >= lo[:, :, None])
                  & (p[:, None] <= hi[:, :, None]), axis=-1)       # (B,S,N)
    inb = inb & valid[:, None]
    cnt = jnp.sum(inb, axis=-1)                                    # (B,S)
    overflow = jnp.max(cnt) > cap
    # stable sort keeps selected candidates in input (morton) order
    idx = jnp.argsort(jnp.logical_not(inb), axis=-1, stable=True)[..., :cap]
    sel_valid = jnp.take_along_axis(inb, idx, axis=-1)             # (B,S,cap)
    brow = jnp.arange(B)[:, None, None]
    cpts = p[brow, idx]                                            # (B,S,cap,3)

    common = dict(radius=radius, precision=precision, interpret=interpret,
                  mask_mode=mask_mode, impl=impl, csr=csr)

    def sub_path(feats):
        cf = feats[brow, idx]                                      # (B,S,cap,C)
        y = pointwise_conv(
            cpts.reshape(B * S, cap, 3),
            cf.reshape(B * S, cap, cf.shape[-1]),
            weights, bias,
            mask=sel_valid.reshape(B * S, cap).astype(f32),
            centers=pg.reshape(B * S, ns, 3),
            center_mask=vg.reshape(B * S, ns).astype(f32),
            tile_n=tile_n, tile_m=tile_m, **common)
        return y.reshape(B, N, y.shape[-1])

    def dense_path(feats):
        return pointwise_conv(
            points, feats, weights, bias, mask=mask,
            tile_n=tile_n, tile_m=tile_m, **common)

    y = jax.lax.cond(overflow, dense_path, sub_path, features)
    return y if batched else y[0]


def pointwise_conv(
    points: jnp.ndarray,
    features: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    radius: float,
    mask: jnp.ndarray | None = None,
    centers: jnp.ndarray | None = None,
    center_mask: jnp.ndarray | None = None,
    impl: str = "auto",
    interpret: bool | None = None,
    tile_n: int | None = None,
    tile_m: int | None = None,
    precision: str = "float32",
    csr: bool | None = None,
    mask_mode: str | None = None,
    ext_counts: jnp.ndarray | None = None,
    subblock: int | None = None,
    subblock_cap: int | None = None,
) -> jnp.ndarray:
    """Pointwise convolution (see ops/reference.py for exact semantics).

    Args:
      points: (M, 3) or (B, M, 3) candidate positions.
      features: (M, Cin) or (B, M, Cin) candidate features.
      weights: (27, Cin, Cout).
      bias: optional (Cout,).
      radius: static kernel radius.
      mask: optional candidate validity (0 = padding slot).
      centers: optional distinct conv centers (defaults to ``points``).
      center_mask: optional center validity; invalid centers output zeros.
      impl: 'auto' | 'pallas' | 'reference' | 'spatial[:axis[:strategy]]'.
        'auto' = the Pallas kernels (compiled on TPU, interpreted elsewhere);
        'reference' = the dense executable spec; 'spatial' = point-dim
        sharded self-conv inside shard_map.
      interpret: force/disable Pallas interpreter mode (None = by backend).
      tile_n/tile_m: kernel tile overrides (None = adaptive).
      precision: 'float32' | 'bfloat16' matmul inputs (f32 accumulation).
        bf16 note: the dX kernels fold the 1/count averaging into the
        binning planes (a measured win), so under bf16 the reciprocal is
        rounded separately from the gradient — up to ~2x one-ulp relative
        error per accumulated term vs the old single-rounding order;
        within standard mixed-precision semantics, and f32 is bitwise
        unaffected.
      csr: force/disable the CSR tile-pair walk (None = auto by walk length
        and a runtime adjacency-density heuristic; True disables the
        heuristic — only the correctness-required degree-overflow fallback
        can still take the dense kernel).
      mask_mode: binning-mask construction; 'compare' (default, exact) or
        'const' (benchmark-only ablation with wrong results).
      ext_counts: optional (B, Nc, 27) EXTERNAL divisor counts (from
        ``pointwise_conv_counts`` over the full candidate set).  The conv
        then computes a PARTIAL convolution that is linear in the candidate
        set — summing results over disjoint candidate subsets equals the
        full convolution (the memory-bounded ring strategy,
        parallel/spatial.py).  Supported by both the pallas and reference
        impls, so the ring strategy debugs against the executable spec.
        Requires ``bias=None``: a bias inside each partial would be summed
        once per subset — add it once after summing the partials.
      subblock: optional int — EXACT sub-block overlap-save for small
        radii (self-conv only): split the morton-sorted cloud into this
        many consecutive center groups and convolve each against only the
        points inside its bbox + radius (device-gathered to
        ``subblock_cap`` static slots, default 3x the group size).  A
        runtime lax.cond falls back to the plain dense conv whenever any
        group's candidate count exceeds the cap, so results are exact
        regardless; the win is skipping the candidate walk outside the
        neighborhood (GOLDEN round-5 seg attribution).
      subblock_cap: static candidate capacity per sub-block (rounded up to
        the lane width); None = 3x group size.

    Returns:
      (Nc, Cout) or (B, Nc, Cout).
    """
    if ext_counts is not None and bias is not None:
        # ext_counts computes a PARTIAL convolution whose results sum over
        # disjoint candidate subsets; a bias inside each partial would be
        # added once PER SUBSET (the ring strategy adds it once at the end).
        raise ValueError(
            "ext_counts computes a partial convolution — pass bias=None and "
            "add the bias once after summing the partials")
    if impl.startswith("spatial"):
        # 'spatial' or 'spatial:<axis>[:ring]' — point dim sharded over a mesh
        # axis; only valid inside shard_map. Lazy import avoids a cycle.
        from pointwise_tpu.parallel.spatial import spatial_pointwise_conv

        parts = impl.split(":")
        axis = parts[1] if len(parts) > 1 and parts[1] else "space"
        strategy = parts[2] if len(parts) > 2 else "gather"
        if centers is not None:
            raise ValueError("spatial impl shards self-convolution only")
        dropped = {"center_mask": center_mask, "ext_counts": ext_counts,
                   "interpret": interpret, "tile_n": tile_n, "tile_m": tile_m,
                   "csr": csr, "mask_mode": mask_mode, "subblock": subblock,
                   "subblock_cap": subblock_cap}
        bad = sorted(k for k, v in dropped.items() if v is not None)
        if bad:
            # refusing beats silently computing something else (e.g. an
            # ext_counts partial contract with per-shard divisors)
            raise ValueError(f"spatial impl does not support {bad}")
        return spatial_pointwise_conv(
            points, features, weights, bias,
            radius=radius, axis=axis, mask_local=mask, strategy=strategy,
            precision=precision,
        )
    if impl == "auto":
        impl = "pallas"
    if impl not in ("pallas", "reference"):
        raise ValueError(f"unknown impl: {impl!r}")

    if subblock is not None and subblock > 1:
        # EXACT sub-block overlap-save for small radii (round 5, GOLDEN seg
        # attribution): the dense walk executes centers x ALL candidates,
        # but a r=0.1 layer on a 1 m block only needs each center's
        # bbox+r neighborhood — split the (morton-sorted) cloud into
        # ``subblock`` consecutive center groups and convolve each against
        # only the points inside its bbox + radius (gathered to a static
        # cap).  Runtime-exact: if any group's candidate count exceeds the
        # cap (badly sorted cloud, huge radius), a lax.cond takes the
        # ordinary dense path instead.  Handled BEFORE the impl dispatch and
        # forwarding impl/csr into the recursion, so impl='reference'
        # validates the gather/fallback machinery against the executable
        # spec and an explicit csr= survives the sub path.
        if centers is not None or ext_counts is not None:
            raise ValueError("subblock supports self-convolution only")
        return _subblock_conv(
            points, features, weights, bias, radius=radius, mask=mask,
            n_sub=int(subblock), cap=subblock_cap, precision=precision,
            interpret=interpret, tile_n=tile_n, tile_m=tile_m,
            mask_mode=mask_mode, impl=impl, csr=csr)

    if impl == "reference":
        return _ref.pointwise_conv_reference(
            points, features, weights, bias, radius=radius, mask=mask,
            centers=centers, center_mask=center_mask, ext_counts=ext_counts,
        )

    # Coordinates at |x| >= _SENTINEL_CUT are indistinguishable from padding
    # (their neighborhoods silently drop).  The guard fails loudly under
    # jax.experimental.checkify when validation is enabled (set_validation —
    # opt-in for compile-cache determinism, see the switch's comment).
    if _VALIDATE:
        f32 = jnp.float32
        real = points.astype(f32) if mask is None else jnp.where(
            mask.astype(bool)[..., None], points.astype(f32), 0.0
        )
        checkify.debug_check(
            jnp.all(jnp.abs(real) < _SENTINEL_CUT),
            "pointwise_conv: real (unmasked) coordinates must satisfy |x| < "
            "5e5 — larger values collide with the sentinel padding and their "
            "neighborhoods are silently dropped; normalize/recenter the "
            "cloud.",
        )
        if centers is not None:
            realc = centers.astype(f32) if center_mask is None else jnp.where(
                center_mask.astype(bool)[..., None], centers.astype(f32), 0.0
            )
            checkify.debug_check(
                jnp.all(jnp.abs(realc) < _SENTINEL_CUT),
                "pointwise_conv: real (unmasked) CENTER coordinates must "
                "satisfy |x| < 5e5 — larger values collide with the sentinel "
                "padding (zero-feature padding rows would inflate their "
                "divisors and masked candidates leak into their outputs); "
                "recenter the tile.",
            )

    Cin = features.shape[-1]
    Cout = weights.shape[-1]
    if weights.shape != (N_CELLS, Cin, Cout):
        raise ValueError(f"weights must be (27, {Cin}, Cout), got {weights.shape}")
    cin_p = round_up(Cin + 1, LANE)
    cout_p = round_up(Cout, LANE)

    (batched, self_conv, B, M, Nc, Mp, Ncp, tile_n, tile_m, pts, ctr,
     center_mask) = _geometry_layout(points, mask, centers, center_mask,
                                     tile_n, tile_m, cin_p, cout_p)
    if not batched:
        features = features[None]
        ext_counts = None if ext_counts is None else ext_counts[None]
    f32 = jnp.float32

    # Features travel to the kernel already in the matmul dtype: the kernels
    # cast to mm_dtype before every binning matmul anyway, so the FORWARD is
    # numerically identical and the feature DMA halves for bf16.  Note the
    # gradient implication: the custom VJP must return dX in the primal
    # dtype, so with precision='bfloat16' the f32-accumulated dX rounds to
    # bf16 at each conv boundary — standard mixed-precision semantics; use
    # precision='float32' for f32-exact end-to-end gradients.
    feat_t = jnp.bfloat16 if precision == "bfloat16" else f32
    feats = features.astype(feat_t)
    feats = jnp.pad(feats, ((0, 0), (0, Mp - M), (0, cin_p - Cin)))
    feats = feats.at[:, :, Cin].set(1.0)

    w = jnp.pad(weights.astype(f32), ((0, 0), (0, cin_p - Cin), (0, cout_p - Cout)))
    b = jnp.zeros((Cout,), f32) if bias is None else bias.astype(f32)
    b = jnp.pad(b, (0, cout_p - Cout))[None, None, :]

    # CSR: worth it once the candidate-tile walk is long enough for the
    # bbox adjacency to be sparse (sorted blocks win from 8 tiles up); the
    # adjacency degree cap falls back to the dense kernel at runtime if a
    # center tile has more bbox neighbors than d_max (exactness preserved).
    n_j = Mp // tile_m
    use_csr = (n_j >= 8) if csr is None else bool(csr)
    # degree cap: geometric neighborhoods are bounded regardless of scene
    # size; overflowing rows trigger the (exact) runtime dense fallback, and
    # the kernel layer chunks centers so the SMEM tables always fit.
    d_max = max(1, min(n_j, min(128, max(8, (n_j * 3) // 4))))

    if mask_mode is None:
        mask_mode = "compare"

    # Resident kernels (no accumulator scratch, fused finalize) whenever the
    # full candidate block fits comfortably in VMEM next to the cell sums.
    # Kept orthogonal to use_csr: the CSR paths ignore it, but their runtime
    # degree-overflow fallback then lands on the resident kernel instead of
    # the slower scratch-grid one.
    feat_bytes = 2 if precision == "bfloat16" else 4
    resident = (
        Mp * cin_p * feat_bytes <= (4 << 20)
        and N_CELLS * tile_n * cin_p * 4 <= (4 << 20)
        and Ncp * (cout_p + N_CELLS) * 4 <= (4 << 20)  # dx: resident g+counts
    )

    spec = PwConvSpec(
        radius=float(radius),
        batch=B,
        n_centers=Ncp,
        n_points=Mp,
        cin_p=cin_p,
        cout_p=cout_p,
        cin_col=Cin,
        tile_n=tile_n,
        tile_m=tile_m,
        interpret=_default_interpret() if interpret is None else interpret,
        mm_dtype=precision,
        use_csr=use_csr,
        d_max=d_max,
        csr_density_gate=(csr is not True),
        mask_mode=mask_mode,
        resident=resident,
        ext_counts=ext_counts is not None,
    )
    if ext_counts is None:
        y_p, _ = pointwise_conv_pallas(spec, ctr, jnp.swapaxes(pts, 1, 2),
                                       feats, w, b)
    else:
        cnt_p = jnp.pad(ext_counts.astype(f32), ((0, 0), (0, Ncp - Nc), (0, 0)))
        y_p = pointwise_conv_pallas_ext(spec, ctr, jnp.swapaxes(pts, 1, 2),
                                        feats, w, b, cnt_p)
    y = y_p[:, :Nc, :Cout].astype(features.dtype)
    if center_mask is not None:   # resolved by _geometry_layout (spec rule)
        y = y * center_mask.astype(y.dtype)[..., None]
    return y if batched else y[0]


def pointwise_conv_counts(
    points: jnp.ndarray,
    *,
    radius: float,
    mask: jnp.ndarray | None = None,
    centers: jnp.ndarray | None = None,
    center_mask: jnp.ndarray | None = None,
    interpret: bool | None = None,
    tile_n: int | None = None,
    tile_m: int | None = None,
) -> jnp.ndarray:
    """Per-cell neighbor counts (B, Nc, 27) — geometry only, no features.

    The building block of the memory-bounded ring strategy: counts depend on
    positions alone (12 B/point), so global counts can be computed from an
    all_gather of points before any feature leaves its home chip; the conv
    then runs with ``ext_counts=`` over candidate subsets and its partial
    outputs sum exactly.  Not differentiable (counts are piecewise-constant
    in positions) — the result is wrapped in stop_gradient.
    """
    (batched, _, B, M, Nc, Mp, Ncp, tile_n, tile_m, pts, ctr,
     _) = _geometry_layout(points, mask, centers, center_mask,
                           tile_n, tile_m)

    spec = PwConvSpec(
        radius=float(radius), batch=B, n_centers=Ncp, n_points=Mp,
        cin_p=LANE, cout_p=LANE, cin_col=0, tile_n=tile_n, tile_m=tile_m,
        interpret=_default_interpret() if interpret is None else interpret,
    )
    counts = _counts_call(spec, ctr, jnp.swapaxes(pts, 1, 2))[:, :Nc]
    counts = jax.lax.stop_gradient(counts)
    return counts if batched else counts[0]
