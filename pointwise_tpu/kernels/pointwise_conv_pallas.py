"""Fused Pallas TPU kernels for the pointwise convolution.

TPU-native redesign of the reference's custom C++ CPU op (hkust-vgd/pointwise,
SURVEY.md section 0.1/3.4).  The reference kernel is a scalar per-center loop
(radius scan -> 27-cell binning -> averaging -> small matmul).  That shape is
hostile to the MXU, so this is NOT a translation: instead, for a tile of TN
centers against a tile of TM candidate points we

  1. compute all pairwise squared distances with VPU broadcasts,
  2. form, for each of the 27 kernel cells, a {0,1} membership mask
     ``M_k (TN, TM)``, and
  3. accumulate the cell sums as MXU matmuls ``S_k += M_k @ X`` where
     ``X (TM, Cinp)`` are the candidate features.  A constant ones-column at
     feature index ``cin`` makes the same matmul produce the per-cell
     neighbor counts for free.
  4. On the last candidate tile the averages ``S_k / max(cnt_k, 1)`` are
     concatenated and contracted with the flattened kernel weights in one
     (TN, 27*Cinp) x (27*Cinp, Coutp) MXU matmul, producing the output tile.

Everything is dense masked matmuls on static shapes: no gather, no neighbor
lists, no data-dependent control flow.  Padding points are placed at a far
sentinel coordinate so they never enter any real neighborhood; masking
therefore needs no in-kernel support.

Backward pass (two kernels, both the same masked-matmul structure):
  * dW:  re-runs the binning accumulation, then per cell
         ``dW_k += xbar_k^T @ g`` (contraction over centers).
  * dX:  accumulates ``Z_k += M_k^T @ (g / cnt_k)`` over center tiles, then
         on the last center tile ``dx = sum_k Z_k @ W_k^T``.  The counts are
         saved from the forward pass (second kernel output) so normalization
         needs no extra pass.

Centers and candidates are independent inputs (centers==points gives the
reference op; centers!=points powers the spatially-sharded / halo paths).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CELLS = 27
LANE = 128

# Padding points live here; far enough that no real point is within any
# practical radius, close enough that squared distances stay finite in f32.
SENTINEL = 1.0e6


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class PwConvSpec:
    """Static configuration of one pointwise-conv pallas call (hashable)."""

    radius: float
    batch: int
    n_centers: int      # padded, multiple of tile_n
    n_points: int       # padded, multiple of tile_m
    cin_p: int          # padded feature width (includes the ones column)
    cout_p: int         # padded output width
    cin_col: int        # index of the ones/count column inside cin_p
    tile_n: int = 128   # center tile (fwd/dw); candidate-out tile (dx)
    tile_m: int = 128   # candidate tile (fwd/dw); center-inner tile (dx)
    interpret: bool = False
    mm_dtype: str = "float32"   # 'float32' | 'bfloat16' matmul inputs
    use_csr: bool = False       # forward walks only bbox-adjacent tile pairs
    d_max: int = 16             # CSR degree cap (runtime dense fallback)
    # Runtime heuristic: fall back to the dense kernel when the adjacency is
    # dense anyway.  Disabled when the caller FORCES csr=True (the op's
    # documented force semantics; degree overflow still falls back for
    # correctness).
    csr_density_gate: bool = True
    # How the 27 cell-membership masks are built (fwd + dW binning):
    #   'compare' — 27x (code == k) compare+select on the float cell code.
    #   'const'   — benchmark ablation ONLY (all masks one, wrong results):
    #               measures the kernel's MXU + pipeline floor.
    # (A Lagrange-monomial factorization — 29 multiplies instead of 27
    # compare+selects, recombined at finalize — was implemented and measured
    # SLOWER on v5e: bf16 VPU multiplies don't beat fused compare+select,
    # and the 162-plane recombination eats the savings.  See GOLDEN.md.)
    mask_mode: str = "compare"
    # Resident forward: grid over (batch, center tile) only — the candidate
    # walk is unrolled inside the kernel over VALUES (no 27-plane scratch
    # accumulator, no per-step RMW; the finalize fuses into the same body).
    # Cuts ~7 MB of VMEM accumulator traffic per candidate tile and lets the
    # scheduler overlap mask VPU work with the binning matmuls.  Requires the
    # full (n_points, cin_p) feature block to fit VMEM.
    resident: bool = False
    # External divisor counts: the finalize divides cell sums by a
    # caller-provided (B, n_centers, 27) counts array instead of the
    # accumulated ones-column.  This is what makes PARTIAL convolutions
    # linear: with global counts fixed, y = sum over candidate subsets of
    # the subset's finished output — the memory-bounded ring strategy
    # (parallel/spatial.py) accumulates per-slab outputs under ppermute.
    ext_counts: bool = False
    # Per-stage xprof attribution (scripts/attribute_fwd_kernel.py):
    # jax.named_scope boundaries inside a Mosaic kernel lower to
    # tpu.trace_start/trace_stop, giving DEVICE-plane durations per stage.
    # Opt-in only: the trace ops can constrain the in-kernel scheduler, so
    # production programs never carry them.  (Verified lowering emits the
    # trace ops, but the axon profiler plugin drops in-kernel marks at every
    # exposed option — attribution uses the num_emit/'scaled' bisection
    # sweep below instead; see GOLDEN.md round-4 attribution.)
    annotate: bool = False
    # Bisection ablations (scripts/attribute_fwd_kernel.py; WRONG results,
    # timing only):
    #   num_emit < 27 — emit only the first K binning planes.  t(K) is
    #     linear; the slope is the marginal (mask VPU + matmul) cost per
    #     plane and the intercept is code build + finalize + pipeline.
    #   mask_mode='scaled' — plane = code * c_k (distinct per-k constant):
    #     same matmul count/shapes (CSE-proof), but one VPU multiply per
    #     plane instead of compare+select.  slope('compare') -
    #     slope('scaled') isolates the per-plane mask-compare VPU cost.
    num_emit: int = N_CELLS
    # dX plane orientation: True builds the binning planes candidates-as-
    # rows so every walk matmul is a standard (TMO, TNI) @ (TNI, Coutp)
    # contraction — the same MXU shape as the forward walk — instead of a
    # transposed dot_general per plane.  CPU-interpret parity is pinned
    # both ways (tests/test_pointwise_conv.py dx_flip tests); the default
    # follows the on-chip A/B (GOLDEN round-4 backward attribution:
    # dX 4.026 -> 3.112 ms, 0.658 -> 0.851 of the walk ideal, so flipped
    # is the production orientation).
    dx_flip: bool = True


def _mm_precision(mm_dtype):
    # bf16 operands must not request an fp32 contraction (Mosaic rejects the
    # combination when jax_default_matmul_precision=highest leaks in).
    return jax.lax.Precision.DEFAULT if jnp.dtype(mm_dtype) == jnp.bfloat16 else None


def _pairwise_code(pr, pc, radius, flip=False):
    """Float cell code with validity folded in for a (TN, 3) center tile vs
    a (3, TM) candidate tile: valid pairs get cell cx*9+cy*3+cz in [0, 27),
    invalid pairs get 27 (matches no cell).

    Stays entirely in f32 (cell values are small exact integers) and skips
    the lower clamp: a valid pair has |rel_axis| <= r, so (rel+r)*inv >= 0;
    invalid pairs may produce arbitrary (even colliding) codes but are
    overwritten by the validity select before any compare sees them.

    flip=True swaps the roles: rows are CANDIDATES and columns CENTERS
    (the dX orientation).  rel is then row - col = candidate - center —
    the SAME floats as the unflipped col - row (IEEE subtraction), so cell
    codes match the forward bit-for-bit and gradients route through
    exactly the cells the forward binned into.
    """
    r = jnp.float32(radius)
    inv = jnp.float32(3.0 / (2.0 * radius))
    cell = None
    d2 = None
    for a in range(3):
        pi = pr[:, a : a + 1]        # (TN, 1)
        pj = pc[a : a + 1, :]        # (1, TM)
        rel = pi - pj if flip else pj - pi    # (TN, TM) candidate - center
        d2 = rel * rel if d2 is None else d2 + rel * rel
        c = jnp.minimum(jnp.floor((rel + r) * inv), 2.0)
        cell = c if cell is None else cell * 3.0 + c
    valid = d2 <= r * r
    return jnp.where(valid, cell, jnp.float32(N_CELLS))


def _foreach_mask(pr, pc, spec, mmt, emit, row_scale=None, col_scale=None,
                  flip=False):
    """Call emit(k, plane) for each of the 27 binning planes, built LAZILY.

    Keeping at most a couple of (TN, TM) planes live between matmuls keeps
    VMEM pressure low.  The 'const' mode is a benchmarking ablation (all
    masks one — wrong results) that measures the kernel's MXU + pipeline
    floor with zero mask-construction cost.

    row_scale (TN, 27) / col_scale (27, TM): optional per-row / per-column
    scale folded INTO the select — plane_k = scale where code==k else 0.
    Used by the dX kernels to apply the 1/count averaging without a
    separate per-plane (T, Cout) VPU multiply of the gradient
    (select-with-broadcast costs the same VPU ops as select-of-constant-1).
    flip builds the planes candidates-as-rows (see _pairwise_code).
    Ablation modes ignore scales (their results are wrong by construction).
    """
    import contextlib

    scope = jax.named_scope if spec.annotate else \
        (lambda name: contextlib.nullcontext())
    if spec.mask_mode == "const":     # ablation: timing floor, wrong results
        mk = (pr[:, 0:1] + pc[0:1, :] < jnp.float32(2 * _SENTINEL_CUT)).astype(mmt)
        for k in range(spec.num_emit):
            emit(k, mk)
    elif spec.mask_mode == "scaled":  # ablation: 1 VPU mul/plane, wrong results
        code = _pairwise_code(pr, pc, spec.radius, flip=flip)
        for k in range(spec.num_emit):
            emit(k, (code * jnp.float32(0.5 + 0.25 * k)).astype(mmt))
    else:
        with scope("mask_code"):
            code = _pairwise_code(pr, pc, spec.radius, flip=flip)
        for k in range(spec.num_emit):
            with scope("mask_cmp"):
                if row_scale is not None:
                    plane = jnp.where(
                        code == jnp.float32(k), row_scale[:, k : k + 1],
                        jnp.float32(0.0),
                    ).astype(mmt)
                elif col_scale is not None:
                    plane = jnp.where(
                        code == jnp.float32(k), col_scale[k : k + 1, :],
                        jnp.float32(0.0),
                    ).astype(mmt)
                else:
                    plane = (code == jnp.float32(k)).astype(mmt)
            emit(k, plane)


def _bin_accumulate(acc_ref, pr, pc, x, spec):
    """acc[k] += sum_j mask_k[i, j] * x[j, :] for all 27 planes."""
    mmt = jnp.dtype(spec.mm_dtype)
    prec = _mm_precision(mmt)

    def emit(k, plane):
        acc_ref[k] += jnp.dot(plane, x, preferred_element_type=jnp.float32,
                              precision=prec)

    _foreach_mask(pr, pc, spec, mmt, emit)


# Coordinates at or beyond this magnitude are sentinel padding; bbox
# computations must ignore them or a tile with interior padding (cell-list
# layouts) looks adjacent to everything.
_SENTINEL_CUT = 5.0e5

# Trace-time instrumentation: how often each kernel family was staged.
# Tests use this to assert the CSR grids are actually taken (a runtime
# dense FALLBACK inside lax.cond does not reset these — pair with the
# adjacency overflow flag to prove the CSR branch executed).
_TRACE_COUNTS = {"fwd_csr": 0, "dw_csr": 0, "dx_csr": 0}


def _tiles_overlap(pr, pc, radius):
    """Conservative test: can any (center, candidate) pair be within radius?

    pr (TN, 3) centers, pc (3, TM) candidates.  Axis-aligned bbox gap with a
    small slack; the exact per-pair distance check inside the cell masks
    remains authoritative, so false positives only cost compute.  Sentinel
    (padding) coordinates are excluded from the boxes.
    """
    big = jnp.float32(1.0e9)
    d2min = jnp.float32(0.0)
    for a in range(3):
        r1 = pr[:, a : a + 1]
        r2 = pc[a : a + 1, :]
        v1 = jnp.abs(r1) < _SENTINEL_CUT
        v2 = jnp.abs(r2) < _SENTINEL_CUT
        lo1 = jnp.min(jnp.where(v1, r1, big))
        hi1 = jnp.max(jnp.where(v1, r1, -big))
        lo2 = jnp.min(jnp.where(v2, r2, big))
        hi2 = jnp.max(jnp.where(v2, r2, -big))
        gap = jnp.maximum(jnp.maximum(lo1 - hi2, lo2 - hi1), 0.0)
        d2min = d2min + gap * gap
    return d2min <= jnp.float32(radius * radius) * 1.0001 + 1e-9


def _fwd_kernel(pr_ref, pc_ref, f_ref, w_ref, b_ref, *rest, spec):
    if spec.ext_counts:
        cntin_ref, y_ref, cnt_ref, acc_ref = rest
    else:
        (y_ref, cnt_ref, acc_ref), cntin_ref = rest, None
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    pr = pr_ref[0]                   # (TN, 3)
    pc = pc_ref[0]                   # (3, TM)
    mmt = jnp.dtype(spec.mm_dtype)

    @pl.when(_tiles_overlap(pr, pc, spec.radius))
    def _():
        _bin_accumulate(acc_ref, pr, pc, f_ref[0].astype(mmt), spec)

    @pl.when(j == n_j - 1)
    def _():
        sums = [acc_ref[k] for k in range(N_CELLS)]
        ce = None if cntin_ref is None else cntin_ref[0]
        y, cnts = _finalize_tile(sums, w_ref, b_ref, spec, mmt, cnt_ext=ce)
        y_ref[0] = y
        cnt_ref[0] = cnts                            # (TN, 27)


def _finalize_tile(sums, w_ref, b_ref, spec, mmt, cnt_ext=None):
    """Shared finalize: cell sums -> (y_tile, counts_tile).

    cnt_ext: optional (TN, 27) EXTERNAL divisor counts (spec.ext_counts —
    the ring strategy's global counts); default divides by the accumulated
    ones-column.  The returned counts tile is always the LOCAL accumulation.
    """
    cc = spec.cin_col
    xbars, cnts = [], []
    for k in range(N_CELLS):
        s = sums[k]                          # (TN, Cinp)
        cnt = s[:, cc : cc + 1]              # (TN, 1) neighbor count
        div = cnt if cnt_ext is None else cnt_ext[:, k : k + 1]
        xbars.append((s / jnp.maximum(div, 1.0)).astype(mmt))
        cnts.append(cnt)
    # one (TN, 27*Cinp) @ (27*Cinp, Coutp) matmul instead of 27 small ones
    xcat = jnp.concatenate(xbars, axis=1)
    wflat = w_ref[...].reshape(N_CELLS * spec.cin_p, spec.cout_p).astype(mmt)
    y = jnp.dot(xcat, wflat, preferred_element_type=jnp.float32,
                precision=_mm_precision(mmt))
    return y + b_ref[0][0:1, :], jnp.concatenate(cnts, axis=1)


def _fwd_kernel_resident(pr_ref, pc_ref, f_ref, w_ref, b_ref, *rest, spec):
    """Dense forward with the candidate walk unrolled over values.

    Grid is (batch, center_tiles); pc/f blocks are the full candidate set
    (their index maps are constant in the center dim, so Pallas re-fetches
    them only when the batch index changes).  Cell sums live in values —
    no scratch accumulator and no read-modify-write per candidate tile.

    Deliberately NO per-tile bbox early-out here: a lax.cond around the
    27-plane value accumulation copies its multi-MB carries and measured
    SLOWER than just computing every pair (sparse walks belong to the CSR
    kernel, which skips via the grid instead of in-body branches).
    """
    if spec.ext_counts:
        cntin_ref, y_ref, cnt_ref = rest
    else:
        (y_ref, cnt_ref), cntin_ref = rest, None
    import contextlib

    scope = jax.named_scope if spec.annotate else \
        (lambda name: contextlib.nullcontext())
    pr = pr_ref[0]                   # (TN, 3)
    mmt = jnp.dtype(spec.mm_dtype)
    prec = _mm_precision(mmt)
    tm = spec.tile_m
    sums = [jnp.zeros((spec.tile_n, spec.cin_p), jnp.float32)
            for _ in range(N_CELLS)]
    for j in range(spec.n_points // tm):
        pc = pc_ref[0][:, j * tm : (j + 1) * tm]
        x = f_ref[0][j * tm : (j + 1) * tm].astype(mmt)

        def emit(k, plane):
            with scope("mxu_bin"):
                sums[k] = sums[k] + jnp.dot(
                    plane, x, preferred_element_type=jnp.float32,
                    precision=prec)

        _foreach_mask(pr, pc, spec, mmt, emit)
    ce = None if cntin_ref is None else cntin_ref[0]
    with scope("finalize"):
        y, cnts = _finalize_tile(sums, w_ref, b_ref, spec, mmt, cnt_ext=ce)
    y_ref[0] = y
    cnt_ref[0] = cnts


def _fwd_call_resident(spec: PwConvSpec, pts_r, pts_c, feats, w, bias,
                       cnt_in=None):
    tn = spec.tile_n
    grid = (spec.batch, spec.n_centers // tn)
    in_specs = [
        _vmem((1, tn, 3), lambda b, i: (b, i, 0)),
        _vmem((1, 3, spec.n_points), lambda b, i: (b, 0, 0)),
        _vmem((1, spec.n_points, spec.cin_p), lambda b, i: (b, 0, 0)),
        _vmem((N_CELLS, spec.cin_p, spec.cout_p), lambda b, i: (0, 0, 0)),
        _vmem((1, 1, spec.cout_p), lambda b, i: (0, 0, 0)),
    ]
    ops = [pts_r, pts_c, feats, w, bias]
    if spec.ext_counts:
        in_specs.append(_vmem((1, tn, N_CELLS), lambda b, i: (b, i, 0)))
        ops.append(cnt_in)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_resident, spec=spec),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            _vmem((1, tn, spec.cout_p), lambda b, i: (b, i, 0)),
            _vmem((1, tn, N_CELLS), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((spec.batch, spec.n_centers, spec.cout_p), jnp.float32),
            jax.ShapeDtypeStruct((spec.batch, spec.n_centers, N_CELLS), jnp.float32),
        ],
        interpret=spec.interpret,
    )(*ops)


def _dw_kernel_resident(pr_ref, pc_ref, f_ref, g_ref, *rest, spec):
    """dW with the candidate walk in values (grid (batch, center_tiles)).

    The (27, Cinp, Coutp) output block has a constant index map, so it stays
    resident in VMEM across the whole grid and accumulates the per-center-
    tile contributions ``xcat^T @ g``.
    """
    if spec.ext_counts:
        g_ref, cntin_ref, dw_ref = (g_ref,) + rest
    else:
        (dw_ref,), cntin_ref = rest, None
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    pr = pr_ref[0]
    mmt = jnp.dtype(spec.mm_dtype)
    prec = _mm_precision(mmt)
    tm = spec.tile_m
    sums = [jnp.zeros((spec.tile_n, spec.cin_p), jnp.float32)
            for _ in range(N_CELLS)]
    for j in range(spec.n_points // tm):
        pc = pc_ref[0][:, j * tm : (j + 1) * tm]
        x = f_ref[0][j * tm : (j + 1) * tm].astype(mmt)

        def emit(k, plane):
            sums[k] = sums[k] + jnp.dot(
                plane, x, preferred_element_type=jnp.float32, precision=prec)

        _foreach_mask(pr, pc, spec, mmt, emit)
    g = g_ref[0].astype(mmt)                      # (TN, Coutp)
    dw_ref[...] += _dw_finalize(sums, g, spec, mmt, cnt_ext=(
        None if cntin_ref is None else cntin_ref[0]))


def _dw_finalize(sums, g, spec, mmt, cnt_ext=None):
    """Shared dW finalize: (27*Cinp, Coutp) contribution ``xcat^T @ g``."""
    cc = spec.cin_col
    xbars = []
    for k in range(N_CELLS):
        cnt = sums[k][:, cc : cc + 1]
        div = cnt if cnt_ext is None else cnt_ext[:, k : k + 1]
        xbars.append((sums[k] / jnp.maximum(div, 1.0)).astype(mmt))
    xcat = jnp.concatenate(xbars, axis=1)         # (TN, 27*Cinp)
    return jax.lax.dot_general(
        xcat, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_mm_precision(mmt),
    ).reshape(N_CELLS, spec.cin_p, spec.cout_p)


def _dw_call_resident(spec: PwConvSpec, pts_r, pts_c, feats, g, cnt_in=None):
    tn = spec.tile_n
    grid = (spec.batch, spec.n_centers // tn)
    in_specs = [
        _vmem((1, tn, 3), lambda b, i: (b, i, 0)),
        _vmem((1, 3, spec.n_points), lambda b, i: (b, 0, 0)),
        _vmem((1, spec.n_points, spec.cin_p), lambda b, i: (b, 0, 0)),
        _vmem((1, tn, spec.cout_p), lambda b, i: (b, i, 0)),
    ]
    ops = [pts_r, pts_c, feats, g]
    if spec.ext_counts:
        in_specs.append(_vmem((1, tn, N_CELLS), lambda b, i: (b, i, 0)))
        ops.append(cnt_in)
    return pl.pallas_call(
        functools.partial(_dw_kernel_resident, spec=spec),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            _vmem((N_CELLS, spec.cin_p, spec.cout_p), lambda b, i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_CELLS, spec.cin_p, spec.cout_p), jnp.float32),
        ],
        interpret=spec.interpret,
    )(*ops)[0]


def _dx_finalize(z_tiles, wt_ref, dx_ref, spec, mmt):
    """Shared dX projection — one (TMO, 27*Coutp) @ (27*Coutp, Cinp) matmul
    through the pre-transposed weights.  All six dX kernel variants
    (resident/grid/CSR x unflipped/flipped) end with exactly this."""
    zcat = jnp.concatenate([t.astype(mmt) for t in z_tiles], axis=1)
    wtflat = wt_ref[...].reshape(
        N_CELLS * spec.cout_p, spec.cin_p).astype(mmt)
    dx_ref[0] = jnp.dot(zcat, wtflat, preferred_element_type=jnp.float32,
                        precision=_mm_precision(mmt))


def _flip_operands(pts_r, pts_c, counts):
    """dx_flip operand layout: candidates as rows, centers/counts as
    columns (shared by the resident/grid/CSR dX call wrappers)."""
    return (jnp.swapaxes(pts_c, 1, 2),      # (B, Nm, 3) candidates as rows
            jnp.swapaxes(pts_r, 1, 2),      # (B, 3, Nc) centers as columns
            jnp.swapaxes(counts, 1, 2))     # (B, 27, Nc)


def _dx_kernel_resident(pr_ref, pc_ref, g_ref, cnt_ref, wt_ref, dx_ref, *, spec):
    """dX with the center walk in values (grid (batch, candidate_tiles)).

    For each candidate-output tile, walk all center tiles accumulating
    ``Z_k += M_k^T @ (g / cnt_k)`` in values, then project through the
    transposed weights in one (TMO, 27*Coutp) @ (27*Coutp, Cinp) matmul.
    """
    pc = pc_ref[0]                   # (3, TMO) candidates (dx targets)
    mmt = jnp.dtype(spec.mm_dtype)
    prec = _mm_precision(mmt)
    tni = spec.tile_m                # center tile size along the reduction
    tmo = spec.tile_n
    z = [jnp.zeros((tmo, spec.cout_p), jnp.float32) for _ in range(N_CELLS)]
    for i in range(spec.n_centers // tni):
        pr = pr_ref[0][i * tni : (i + 1) * tni]
        # 1/count averaging rides the mask select (row_scale) — one upstream
        # cast per center tile instead of 27 per-plane (TNI, Coutp) VPU
        # multiplies (measured on chip: 4.131 -> 4.026 ms at the bench
        # config; the orientation flip below is the bigger lever).
        gm = g_ref[0][i * tni : (i + 1) * tni].astype(mmt)  # (TNI, Coutp)
        cnts = cnt_ref[0][i * tni : (i + 1) * tni]          # (TNI, 27)
        inv_cnt = 1.0 / jnp.maximum(cnts, 1.0)

        def emit(k, plane, gm=gm):
            z[k] = z[k] + jax.lax.dot_general(
                plane, gm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        _foreach_mask(pr, pc, spec, mmt, emit, row_scale=inv_cnt)
    _dx_finalize(z, wt_ref, dx_ref, spec, mmt)


def _dx_kernel_resident_flip(pcr_ref, prt_ref, g_ref, cntt_ref, wt_ref,
                             dx_ref, *, spec):
    """Flipped resident dX: planes are built candidates-as-rows (flip=True)
    so every walk matmul is a standard (TMO, TNI) @ (TNI, Coutp)
    contraction — the exact MXU shape of the forward walk — instead of a
    per-plane transposed dot_general.  The 1/count averaging rides the
    mask select as a column broadcast (counts arrive pre-transposed)."""
    pcr = pcr_ref[0]                 # (TMO, 3) candidates (dx targets, rows)
    mmt = jnp.dtype(spec.mm_dtype)
    prec = _mm_precision(mmt)
    tni = spec.tile_m                # center tile size along the reduction
    tmo = spec.tile_n
    z = [jnp.zeros((tmo, spec.cout_p), jnp.float32) for _ in range(N_CELLS)]
    for i in range(spec.n_centers // tni):
        prt = prt_ref[0][:, i * tni : (i + 1) * tni]         # (3, TNI)
        gm = g_ref[0][i * tni : (i + 1) * tni].astype(mmt)   # (TNI, Coutp)
        invt = 1.0 / jnp.maximum(
            cntt_ref[0][:, i * tni : (i + 1) * tni], 1.0)    # (27, TNI)

        def emit(k, plane, gm=gm):
            z[k] = z[k] + jnp.dot(plane, gm,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)

        _foreach_mask(pcr, prt, spec, mmt, emit, col_scale=invt, flip=True)
    _dx_finalize(z, wt_ref, dx_ref, spec, mmt)


def _dx_call_resident(spec: PwConvSpec, pts_r, pts_c, g, counts, w):
    tni, tmo = spec.tile_m, spec.tile_n
    wt = jnp.swapaxes(w, 1, 2)   # (27, Coutp, Cinp)
    grid = (spec.batch, spec.n_points // tmo)
    if spec.dx_flip:
        pcr, prt, cntt = _flip_operands(pts_r, pts_c, counts)
        return pl.pallas_call(
            functools.partial(_dx_kernel_resident_flip, spec=spec),
            grid=grid,
            in_specs=[
                _vmem((1, tmo, 3), lambda b, jj: (b, jj, 0)),
                _vmem((1, 3, spec.n_centers), lambda b, jj: (b, 0, 0)),
                _vmem((1, spec.n_centers, spec.cout_p), lambda b, jj: (b, 0, 0)),
                _vmem((1, N_CELLS, spec.n_centers), lambda b, jj: (b, 0, 0)),
                _vmem((N_CELLS, spec.cout_p, spec.cin_p), lambda b, jj: (0, 0, 0)),
            ],
            out_specs=[
                _vmem((1, tmo, spec.cin_p), lambda b, jj: (b, jj, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((spec.batch, spec.n_points, spec.cin_p), jnp.float32),
            ],
            interpret=spec.interpret,
        )(pcr, prt, g, cntt, wt)[0]
    return pl.pallas_call(
        functools.partial(_dx_kernel_resident, spec=spec),
        grid=grid,
        in_specs=[
            _vmem((1, spec.n_centers, 3), lambda b, jj: (b, 0, 0)),
            _vmem((1, 3, tmo), lambda b, jj: (b, 0, jj)),
            _vmem((1, spec.n_centers, spec.cout_p), lambda b, jj: (b, 0, 0)),
            _vmem((1, spec.n_centers, N_CELLS), lambda b, jj: (b, 0, 0)),
            _vmem((N_CELLS, spec.cout_p, spec.cin_p), lambda b, jj: (0, 0, 0)),
        ],
        out_specs=[
            _vmem((1, tmo, spec.cin_p), lambda b, jj: (b, jj, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((spec.batch, spec.n_points, spec.cin_p), jnp.float32),
        ],
        interpret=spec.interpret,
    )(pts_r, pts_c, g, counts, wt)[0]


def _fwd_kernel_csr(jmap_ref, deg_ref, pr_ref, pc_ref, f_ref, w_ref, b_ref,
                    *rest, spec):
    """CSR forward: grid dim 2 walks only the (<= d_max) candidate tiles the
    scalar-prefetched adjacency selected for this center tile.  Padded slots
    re-point the DMA at the previous block (no fetch) and are masked off via
    the degree test."""
    if spec.ext_counts:
        cntin_ref, y_ref, cnt_ref, acc_ref = rest
    else:
        (y_ref, cnt_ref, acc_ref), cntin_ref = rest, None
    b = pl.program_id(0)
    i = pl.program_id(1)
    d = pl.program_id(2)
    n_d = pl.num_programs(2)

    @pl.when(d == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    pr = pr_ref[0]
    pc = pc_ref[0]
    mmt = jnp.dtype(spec.mm_dtype)
    active = jnp.logical_and(d < deg_ref[b, i], _tiles_overlap(pr, pc, spec.radius))

    @pl.when(active)
    def _():
        _bin_accumulate(acc_ref, pr, pc, f_ref[0].astype(mmt), spec)

    @pl.when(d == n_d - 1)
    def _():
        sums = [acc_ref[k] for k in range(N_CELLS)]
        ce = None if cntin_ref is None else cntin_ref[0]
        y, cnts = _finalize_tile(sums, w_ref, b_ref, spec, mmt, cnt_ext=ce)
        y_ref[0] = y
        cnt_ref[0] = cnts                            # (TN, 27)


def _dw_kernel_csr(jmap_ref, deg_ref, pr_ref, pc_ref, f_ref, g_ref, *rest,
                   spec):
    """CSR dW: grid dim 2 walks only the candidate tiles the scalar-prefetched
    adjacency selected for this center tile (same walk as the CSR forward)."""
    if spec.ext_counts:
        cntin_ref, dw_ref, acc_ref = rest
    else:
        (dw_ref, acc_ref), cntin_ref = rest, None
    b = pl.program_id(0)
    i = pl.program_id(1)
    d = pl.program_id(2)
    n_d = pl.num_programs(2)

    @pl.when(jnp.logical_and(jnp.logical_and(b == 0, i == 0), d == 0))
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    @pl.when(d == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    pr = pr_ref[0]
    pc = pc_ref[0]
    mmt = jnp.dtype(spec.mm_dtype)

    @pl.when(d < deg_ref[b, i])
    def _():
        _bin_accumulate(acc_ref, pr, pc, f_ref[0].astype(mmt), spec)

    @pl.when(d == n_d - 1)
    def _():
        g = g_ref[0].astype(mmt)                  # (TN, Coutp)
        sums = [acc_ref[k] for k in range(N_CELLS)]
        dw_ref[...] += _dw_finalize(sums, g, spec, mmt, cnt_ext=(
            None if cntin_ref is None else cntin_ref[0]))


def _dw_call_csr(spec: PwConvSpec, jmap, deg, pts_r, pts_c, feats, g,
                 cnt_in=None):
    tn, tm = spec.tile_n, spec.tile_m
    dm = jmap.shape[-1]
    _TRACE_COUNTS["dw_csr"] += 1
    in_specs = [
        _vmem((1, tn, 3), lambda b, i, d, jm, dg: (b, i, 0)),
        _vmem((1, 3, tm), lambda b, i, d, jm, dg: (b, 0, jm[b, i, d])),
        _vmem((1, tm, spec.cin_p), lambda b, i, d, jm, dg: (b, jm[b, i, d], 0)),
        _vmem((1, tn, spec.cout_p), lambda b, i, d, jm, dg: (b, i, 0)),
    ]
    ops = [jmap, deg, pts_r, pts_c, feats, g]
    if spec.ext_counts:
        in_specs.append(_vmem((1, tn, N_CELLS),
                              lambda b, i, d, jm, dg: (b, i, 0)))
        ops.append(cnt_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(spec.batch, spec.n_centers // tn, dm),
        in_specs=in_specs,
        out_specs=[
            _vmem((N_CELLS, spec.cin_p, spec.cout_p),
                  lambda b, i, d, jm, dg: (0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((N_CELLS, tn, spec.cin_p), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel_csr, spec=spec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N_CELLS, spec.cin_p, spec.cout_p), jnp.float32),
        ],
        interpret=spec.interpret,
    )(*ops)[0]


def _dx_kernel_csr(imap_ref, deg_ref, pr_ref, pc_ref, g_ref, cnt_ref, wt_ref,
                   dx_ref, z_ref, *, spec):
    """CSR dX: for each candidate-output tile, grid dim 2 walks only the
    bbox-adjacent center tiles (transposed adjacency)."""
    b = pl.program_id(0)
    jj = pl.program_id(1)
    d = pl.program_id(2)
    n_d = pl.num_programs(2)

    @pl.when(d == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    pr = pr_ref[0]                   # (TNI, 3) centers (inner tile)
    pc = pc_ref[0]                   # (3, TMO) candidates (dx targets)
    mmt = jnp.dtype(spec.mm_dtype)

    @pl.when(d < deg_ref[b, jj])
    def _():
        gm = g_ref[0].astype(mmt)    # (TNI, Coutp) upstream grads at centers
        cnts = cnt_ref[0]            # (TNI, 27) forward neighbor counts
        inv_cnt = 1.0 / jnp.maximum(cnts, 1.0)        # (TNI, 27)

        def emit(k, plane):
            # 1/count rides the mask select (see _foreach_mask row_scale)
            z_ref[k] += jax.lax.dot_general(
                plane, gm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(mmt),
            )

        _foreach_mask(pr, pc, spec, mmt, emit, row_scale=inv_cnt)

    @pl.when(d == n_d - 1)
    def _():
        _dx_finalize([z_ref[k] for k in range(N_CELLS)],
                     wt_ref, dx_ref, spec, mmt)


def _dx_kernel_csr_flip(imap_ref, deg_ref, pcr_ref, prt_ref, g_ref, cntt_ref,
                        wt_ref, dx_ref, z_ref, *, spec):
    """Flipped CSR dX (see _dx_kernel_resident_flip): planes built
    candidates-as-rows so the walk matmuls are standard contractions;
    centers/counts arrive transposed and are index-mapped on the last dim."""
    b = pl.program_id(0)
    jj = pl.program_id(1)
    d = pl.program_id(2)
    n_d = pl.num_programs(2)

    @pl.when(d == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    pcr = pcr_ref[0]                 # (TMO, 3) candidates (dx targets, rows)
    prt = prt_ref[0]                 # (3, TNI) centers (cols)
    mmt = jnp.dtype(spec.mm_dtype)

    @pl.when(d < deg_ref[b, jj])
    def _():
        gm = g_ref[0].astype(mmt)    # (TNI, Coutp) upstream grads at centers
        invt = 1.0 / jnp.maximum(cntt_ref[0], 1.0)    # (27, TNI)

        def emit(k, plane):
            z_ref[k] += jnp.dot(plane, gm,
                                preferred_element_type=jnp.float32,
                                precision=_mm_precision(mmt))

        _foreach_mask(pcr, prt, spec, mmt, emit, col_scale=invt, flip=True)

    @pl.when(d == n_d - 1)
    def _():
        _dx_finalize([z_ref[k] for k in range(N_CELLS)],
                     wt_ref, dx_ref, spec, mmt)


def _dx_call_csr(spec: PwConvSpec, imap, deg, pts_r, pts_c, g, counts, wt):
    tni, tmo = spec.tile_m, spec.tile_n
    dm = imap.shape[-1]
    _TRACE_COUNTS["dx_csr"] += 1
    if spec.dx_flip:
        pcr, prt, cntt = _flip_operands(pts_r, pts_c, counts)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(spec.batch, spec.n_points // tmo, dm),
            in_specs=[
                _vmem((1, tmo, 3), lambda b, jj, d, im, dg: (b, jj, 0)),
                _vmem((1, 3, tni), lambda b, jj, d, im, dg: (b, 0, im[b, jj, d])),
                _vmem((1, tni, spec.cout_p),
                      lambda b, jj, d, im, dg: (b, im[b, jj, d], 0)),
                _vmem((1, N_CELLS, tni),
                      lambda b, jj, d, im, dg: (b, 0, im[b, jj, d])),
                _vmem((N_CELLS, spec.cout_p, spec.cin_p),
                      lambda b, jj, d, im, dg: (0, 0, 0)),
            ],
            out_specs=[
                _vmem((1, tmo, spec.cin_p), lambda b, jj, d, im, dg: (b, jj, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((N_CELLS, tmo, spec.cout_p), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_dx_kernel_csr_flip, spec=spec),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((spec.batch, spec.n_points, spec.cin_p), jnp.float32),
            ],
            interpret=spec.interpret,
        )(imap, deg, pcr, prt, g, cntt, wt)[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(spec.batch, spec.n_points // tmo, dm),
        in_specs=[
            _vmem((1, tni, 3), lambda b, jj, d, im, dg: (b, im[b, jj, d], 0)),
            _vmem((1, 3, tmo), lambda b, jj, d, im, dg: (b, 0, jj)),
            _vmem((1, tni, spec.cout_p), lambda b, jj, d, im, dg: (b, im[b, jj, d], 0)),
            _vmem((1, tni, N_CELLS), lambda b, jj, d, im, dg: (b, im[b, jj, d], 0)),
            _vmem((N_CELLS, spec.cout_p, spec.cin_p),
                  lambda b, jj, d, im, dg: (0, 0, 0)),
        ],
        out_specs=[
            _vmem((1, tmo, spec.cin_p), lambda b, jj, d, im, dg: (b, jj, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((N_CELLS, tmo, spec.cout_p), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dx_kernel_csr, spec=spec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((spec.batch, spec.n_points, spec.cin_p), jnp.float32),
        ],
        interpret=spec.interpret,
    )(imap, deg, pts_r, pts_c, g, counts, wt)[0]


def _dw_kernel(pr_ref, pc_ref, f_ref, g_ref, *rest, spec):
    if spec.ext_counts:
        cntin_ref, dw_ref, acc_ref = rest
    else:
        (dw_ref, acc_ref), cntin_ref = rest, None
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(jnp.logical_and(jnp.logical_and(b == 0, i == 0), j == 0))
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    pr = pr_ref[0]
    pc = pc_ref[0]
    mmt = jnp.dtype(spec.mm_dtype)

    @pl.when(_tiles_overlap(pr, pc, spec.radius))
    def _():
        _bin_accumulate(acc_ref, pr, pc, f_ref[0].astype(mmt), spec)

    @pl.when(j == n_j - 1)
    def _():
        g = g_ref[0].astype(mmt)                  # (TN, Coutp)
        sums = [acc_ref[k] for k in range(N_CELLS)]
        # (27*Cinp, Coutp) += xcat^T @ g in one contraction over centers
        dw_ref[...] += _dw_finalize(sums, g, spec, mmt, cnt_ext=(
            None if cntin_ref is None else cntin_ref[0]))


def _dx_kernel(pr_ref, pc_ref, g_ref, cnt_ref, wt_ref, dx_ref, z_ref, *, spec):
    i = pl.program_id(2)             # center-tile index (inner/reduction dim)
    n_i = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    pr = pr_ref[0]                   # (TNI, 3) centers (inner tile)
    pc = pc_ref[0]                   # (3, TMO) candidates (dx targets)
    mmt = jnp.dtype(spec.mm_dtype)

    @pl.when(_tiles_overlap(pr, pc, spec.radius))
    def _():
        gm = g_ref[0].astype(mmt)    # (TNI, Coutp) upstream grads at centers
        cnts = cnt_ref[0]            # (TNI, 27) forward neighbor counts
        inv_cnt = 1.0 / jnp.maximum(cnts, 1.0)        # (TNI, 27)

        def emit(k, plane):
            # (TMO, Coutp) += M'_k^T @ g, contracting the center dim; the
            # 1/count averaging rides the mask select (row_scale).
            z_ref[k] += jax.lax.dot_general(
                plane, gm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(mmt),
            )

        _foreach_mask(pr, pc, spec, mmt, emit, row_scale=inv_cnt)

    @pl.when(i == n_i - 1)
    def _():
        # one (TMO, 27*Coutp) @ (27*Coutp, Cinp) matmul; wt is pre-transposed
        # (27, Coutp, Cinp) by the caller.
        _dx_finalize([z_ref[k] for k in range(N_CELLS)],
                     wt_ref, dx_ref, spec, mmt)


def _dx_kernel_flip(pcr_ref, prt_ref, g_ref, cntt_ref, wt_ref, dx_ref, z_ref,
                    *, spec):
    """Flipped grid dX (see _dx_kernel_resident_flip): planes built
    candidates-as-rows; centers/counts arrive transposed."""
    i = pl.program_id(2)             # center-tile index (inner/reduction dim)
    n_i = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        z_ref[...] = jnp.zeros(z_ref.shape, z_ref.dtype)

    pcr = pcr_ref[0]                 # (TMO, 3) candidates (dx targets, rows)
    prt = prt_ref[0]                 # (3, TNI) centers (cols)
    mmt = jnp.dtype(spec.mm_dtype)

    @pl.when(_tiles_overlap(pcr, prt, spec.radius))
    def _():
        gm = g_ref[0].astype(mmt)    # (TNI, Coutp) upstream grads at centers
        invt = 1.0 / jnp.maximum(cntt_ref[0], 1.0)    # (27, TNI)

        def emit(k, plane):
            z_ref[k] += jnp.dot(plane, gm,
                                preferred_element_type=jnp.float32,
                                precision=_mm_precision(mmt))

        _foreach_mask(pcr, prt, spec, mmt, emit, col_scale=invt, flip=True)

    @pl.when(i == n_i - 1)
    def _():
        _dx_finalize([z_ref[k] for k in range(N_CELLS)],
                     wt_ref, dx_ref, spec, mmt)


def _vmem(shape, imap):
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _row_tile_boxes(pts, tile):
    """Sentinel-aware per-tile bboxes of (B, N, 3) points; (B, n, 3) lo/hi."""
    B, N, _ = pts.shape
    big = jnp.float32(1.0e9)
    t = pts.reshape(B, N // tile, tile, 3)
    v = jnp.abs(t) < _SENTINEL_CUT
    return jnp.where(v, t, big).min(axis=2), jnp.where(v, t, -big).max(axis=2)


def _col_tile_boxes(pts_t, tile):
    """Same for the transposed (B, 3, M) candidate layout."""
    B, _, M = pts_t.shape
    big = jnp.float32(1.0e9)
    t = pts_t.reshape(B, 3, M // tile, tile)
    v = jnp.abs(t) < _SENTINEL_CUT
    lo = jnp.where(v, t, big).min(axis=3).transpose(0, 2, 1)
    hi = jnp.where(v, t, -big).max(axis=3).transpose(0, 2, 1)
    return lo, hi


def _boxes_adjacency(radius, d_max, lo_r, hi_r, lo_c, hi_c,
                     density_gate=True):
    """Per-row-tile list of bbox-adjacent column tiles (traced values feeding
    a CSR kernel's scalar prefetch).  Returns (jmap (B,nR,d_max), deg (B,nR),
    take-the-dense-kernel bool scalar)."""
    dm = d_max
    gap = jnp.maximum(
        jnp.maximum(lo_r[:, :, None, :] - hi_c[:, None, :, :],
                    lo_c[:, None, :, :] - hi_r[:, :, None, :]),
        0.0,
    )
    d2 = jnp.sum(gap * gap, axis=-1)                         # (B, nR, nC)
    adj = d2 <= jnp.float32(radius * radius) * 1.0001 + 1e-9
    deg = jnp.sum(adj, axis=-1).astype(jnp.int32)            # (B, nR)
    order = jnp.argsort(
        jnp.logical_not(adj).astype(jnp.int32), axis=-1, stable=True
    ).astype(jnp.int32)
    jmap = order[:, :, :dm]
    # padded slots re-point at the last active tile (no extra DMA; the
    # degree test masks their compute off)
    last_idx = jnp.clip(deg - 1, 0, dm - 1)[..., None]
    last = jnp.take_along_axis(jmap, last_idx, axis=-1)
    slot = jnp.arange(dm, dtype=jnp.int32)[None, None, :]
    jmap = jnp.where(slot < deg[..., None], jmap, last)
    fallback = jnp.max(deg) > dm
    if density_gate:
        # Take the dense kernel when the adjacency is (near-)complete.
        # Threshold measured round 5 (scripts/sweep_seg_conv.py, GOLDEN seg
        # table): at B8/N4096/c124 forced CSR beats dense up through L2's
        # ~0.8 mean density (25.79 vs 26.46 ms fwd+dW+dX) and loses only at
        # FULL density (L3: 30.68 vs 27.43) — the old 0.75 threshold sent
        # L2 dense, 2.5% off the per-layer best.
        n_cols = adj.shape[-1]
        fallback = fallback | (
            jnp.mean(deg.astype(jnp.float32)) > 0.9 * n_cols
        )
    return jmap, deg, fallback


def _tile_adjacency(spec: PwConvSpec, pts_r, pts_c):
    """Center-tile -> candidate-tile adjacency (forward/dW orientation)."""
    lo_r, hi_r = _row_tile_boxes(pts_r, spec.tile_n)
    lo_c, hi_c = _col_tile_boxes(pts_c, spec.tile_m)
    return _boxes_adjacency(spec.radius, spec.d_max, lo_r, hi_r, lo_c, hi_c,
                            density_gate=spec.csr_density_gate)


def _tile_adjacency_dx(spec: PwConvSpec, pts_r, pts_c, d_max):
    """Candidate-out-tile -> center-tile adjacency (dX orientation: the
    reduction walks center tiles of size tile_m for each tile_n-sized
    candidate output tile)."""
    lo_r, hi_r = _col_tile_boxes(pts_c, spec.tile_n)
    lo_c, hi_c = _row_tile_boxes(pts_r, spec.tile_m)
    return _boxes_adjacency(spec.radius, d_max, lo_r, hi_r, lo_c, hi_c,
                            density_gate=spec.csr_density_gate)


def _fwd_call_csr(spec: PwConvSpec, jmap, deg, pts_r, pts_c, feats, w, bias,
                  cnt_in=None):
    tn, tm = spec.tile_n, spec.tile_m
    _TRACE_COUNTS["fwd_csr"] += 1
    in_specs = [
        _vmem((1, tn, 3), lambda b, i, d, jm, dg: (b, i, 0)),
        _vmem((1, 3, tm), lambda b, i, d, jm, dg: (b, 0, jm[b, i, d])),
        _vmem((1, tm, spec.cin_p), lambda b, i, d, jm, dg: (b, jm[b, i, d], 0)),
        _vmem((N_CELLS, spec.cin_p, spec.cout_p),
              lambda b, i, d, jm, dg: (0, 0, 0)),
        _vmem((1, 1, spec.cout_p), lambda b, i, d, jm, dg: (0, 0, 0)),
    ]
    ops = [jmap, deg, pts_r, pts_c, feats, w, bias]
    if spec.ext_counts:
        in_specs.append(_vmem((1, tn, N_CELLS),
                              lambda b, i, d, jm, dg: (b, i, 0)))
        ops.append(cnt_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(spec.batch, spec.n_centers // tn, spec.d_max),
        in_specs=in_specs,
        out_specs=[
            _vmem((1, tn, spec.cout_p), lambda b, i, d, jm, dg: (b, i, 0)),
            _vmem((1, tn, N_CELLS), lambda b, i, d, jm, dg: (b, i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((N_CELLS, tn, spec.cin_p), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_csr, spec=spec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((spec.batch, spec.n_centers, spec.cout_p), jnp.float32),
            jax.ShapeDtypeStruct((spec.batch, spec.n_centers, N_CELLS), jnp.float32),
        ],
        interpret=spec.interpret,
    )(*ops)


# Mosaic pads and double-buffers the scalar-prefetch windows in SMEM (1MB);
# keep each CSR call's jmap/deg tables below half of it.  240 KB tables
# (verified compiling+running on-chip at the 262144-center streaming shape,
# round 3) cut the 1M-pt streaming programs from 9 to 3 CSR chunks per
# layer — ~3x smaller executables, measurably faster compiles/cache loads
# on the 1-core host.  tests force tiny budgets to pin the chunking path.
_CSR_SMEM_BUDGET = 240_000


def _fwd_call(spec: PwConvSpec, pts_r, pts_c, feats, w, bias, cnt_in=None):
    if spec.use_csr:
        n_i = spec.n_centers // spec.tile_n
        rows_fit = max(1, _CSR_SMEM_BUDGET // (4 * spec.batch * (spec.d_max + 1)))
        if n_i > rows_fit:
            # chunk the centers so each call's scalar tables fit in SMEM;
            # candidates stay whole, outputs are concatenated.
            chunk_nc = rows_fit * spec.tile_n
            sub = dataclasses.replace(spec, n_centers=chunk_nc)
            ys, cnts = [], []
            for c0 in range(0, spec.n_centers, chunk_nc):
                c1 = min(c0 + chunk_nc, spec.n_centers)
                if c1 - c0 != chunk_nc:
                    sub = dataclasses.replace(spec, n_centers=c1 - c0)
                y, cnt = _fwd_call(sub, pts_r[:, c0:c1], pts_c, feats, w, bias,
                                   None if cnt_in is None else cnt_in[:, c0:c1])
                ys.append(y)
                cnts.append(cnt)
            return [jnp.concatenate(ys, axis=1), jnp.concatenate(cnts, axis=1)]
        jmap, deg, overflowed = _tile_adjacency(spec, pts_r, pts_c)
        dense_spec = dataclasses.replace(spec, use_csr=False)
        extra = () if cnt_in is None else (cnt_in,)
        return jax.lax.cond(
            overflowed,
            lambda ops: _fwd_call(dense_spec, *ops),
            lambda ops: _fwd_call_csr(spec, jmap, deg, *ops),
            (pts_r, pts_c, feats, w, bias) + extra,
        )
    if spec.resident:
        return _fwd_call_resident(spec, pts_r, pts_c, feats, w, bias, cnt_in)
    tn, tm = spec.tile_n, spec.tile_m
    grid = (spec.batch, spec.n_centers // tn, spec.n_points // tm)
    in_specs = [
        _vmem((1, tn, 3), lambda b, i, j: (b, i, 0)),
        _vmem((1, 3, tm), lambda b, i, j: (b, 0, j)),
        _vmem((1, tm, spec.cin_p), lambda b, i, j: (b, j, 0)),
        _vmem((N_CELLS, spec.cin_p, spec.cout_p), lambda b, i, j: (0, 0, 0)),
        _vmem((1, 1, spec.cout_p), lambda b, i, j: (0, 0, 0)),
    ]
    ops = [pts_r, pts_c, feats, w, bias]
    if spec.ext_counts:
        in_specs.append(_vmem((1, tn, N_CELLS), lambda b, i, j: (b, i, 0)))
        ops.append(cnt_in)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            _vmem((1, tn, spec.cout_p), lambda b, i, j: (b, i, 0)),
            _vmem((1, tn, N_CELLS), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((spec.batch, spec.n_centers, spec.cout_p), jnp.float32),
            jax.ShapeDtypeStruct((spec.batch, spec.n_centers, N_CELLS), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_CELLS, tn, spec.cin_p), jnp.float32)],
        interpret=spec.interpret,
    )(*ops)


def _dw_call(spec: PwConvSpec, pts_r, pts_c, feats, g, cnt_in=None):
    if spec.use_csr:
        n_i = spec.n_centers // spec.tile_n
        rows_fit = max(1, _CSR_SMEM_BUDGET // (4 * spec.batch * (spec.d_max + 1)))
        if n_i > rows_fit:
            # chunk the centers so each call's scalar tables fit in SMEM;
            # per-chunk dW contributions sum (the contraction is over centers).
            chunk_nc = rows_fit * spec.tile_n
            dw = None
            for c0 in range(0, spec.n_centers, chunk_nc):
                c1 = min(c0 + chunk_nc, spec.n_centers)
                sub = dataclasses.replace(spec, n_centers=c1 - c0)
                part = _dw_call(sub, pts_r[:, c0:c1], pts_c, feats, g[:, c0:c1],
                                None if cnt_in is None else cnt_in[:, c0:c1])
                dw = part if dw is None else dw + part
            return dw
        jmap, deg, overflowed = _tile_adjacency(spec, pts_r, pts_c)
        dense_spec = dataclasses.replace(spec, use_csr=False)
        extra = () if cnt_in is None else (cnt_in,)
        return jax.lax.cond(
            overflowed,
            lambda ops: _dw_call(dense_spec, *ops),
            lambda ops: _dw_call_csr(spec, jmap, deg, *ops),
            (pts_r, pts_c, feats, g) + extra,
        )
    if spec.resident:
        return _dw_call_resident(spec, pts_r, pts_c, feats, g, cnt_in)
    tn, tm = spec.tile_n, spec.tile_m
    grid = (spec.batch, spec.n_centers // tn, spec.n_points // tm)
    in_specs = [
        _vmem((1, tn, 3), lambda b, i, j: (b, i, 0)),
        _vmem((1, 3, tm), lambda b, i, j: (b, 0, j)),
        _vmem((1, tm, spec.cin_p), lambda b, i, j: (b, j, 0)),
        _vmem((1, tn, spec.cout_p), lambda b, i, j: (b, i, 0)),
    ]
    ops = [pts_r, pts_c, feats, g]
    if spec.ext_counts:
        in_specs.append(_vmem((1, tn, N_CELLS), lambda b, i, j: (b, i, 0)))
        ops.append(cnt_in)
    return pl.pallas_call(
        functools.partial(_dw_kernel, spec=spec),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            _vmem((N_CELLS, spec.cin_p, spec.cout_p), lambda b, i, j: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_CELLS, spec.cin_p, spec.cout_p), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_CELLS, tn, spec.cin_p), jnp.float32)],
        interpret=spec.interpret,
    )(*ops)[0]


def _dx_call(spec: PwConvSpec, pts_r, pts_c, g, counts, w):
    if spec.use_csr:
        # dX reduces over center tiles of size tile_m; cap the walk by the
        # transposed adjacency's degree.
        n_inner = spec.n_centers // spec.tile_m
        dm = max(1, min(n_inner, spec.d_max))
        n_rows = spec.n_points // spec.tile_n
        rows_fit = max(1, _CSR_SMEM_BUDGET // (4 * spec.batch * (dm + 1)))
        if n_rows > rows_fit:
            # chunk the candidate-output tiles; centers stay whole.
            chunk_np = rows_fit * spec.tile_n
            dxs = []
            for c0 in range(0, spec.n_points, chunk_np):
                c1 = min(c0 + chunk_np, spec.n_points)
                sub = dataclasses.replace(spec, n_points=c1 - c0)
                dxs.append(_dx_call(sub, pts_r, pts_c[:, :, c0:c1], g, counts, w))
            return jnp.concatenate(dxs, axis=1)
        imap, deg, overflowed = _tile_adjacency_dx(spec, pts_r, pts_c, dm)
        dense_spec = dataclasses.replace(spec, use_csr=False)
        wt = jnp.swapaxes(w, 1, 2)   # (27, Coutp, Cinp)
        return jax.lax.cond(
            overflowed,
            lambda ops: _dx_call(dense_spec, ops[0], ops[1], ops[2], ops[3], w),
            lambda ops: _dx_call_csr(spec, imap, deg, ops[0], ops[1], ops[2],
                                     ops[3], wt),
            (pts_r, pts_c, g, counts),
        )
    # Resident dX only pays off for short center walks: with more unrolled
    # center tiles the scheduler's value liveness blows the 16 MB scoped
    # VMEM limit (measured: 18.6 MB at 4 tiles / N=2048 C=124, 45 MB at 8
    # tiles / N=4096) and the grid kernel with its Z scratch is competitive
    # anyway (9.7 vs 10.2 ms at the seg shape).  mm_dtype=float32 doubles
    # the zcat/mask-plane liveness and blows the limit even at 2 tiles
    # (measured round 4: 17.88 MB at N=1024 C<=127 f32) — f32 always takes
    # the grid kernel.
    if (spec.resident and spec.mm_dtype == "bfloat16"
            and spec.n_centers // spec.tile_m <= 2):
        return _dx_call_resident(spec, pts_r, pts_c, g, counts, w)
    # Roles swapped vs fwd: the reduction dim is centers, so center tiles are
    # big (amortize the Z-scratch RMW) and candidate-out tiles small.
    tni, tmo = spec.tile_m, spec.tile_n
    wt = jnp.swapaxes(w, 1, 2)   # (27, Coutp, Cinp) for the finalize matmul
    grid = (spec.batch, spec.n_points // tmo, spec.n_centers // tni)
    if spec.dx_flip:
        pcr, prt, cntt = _flip_operands(pts_r, pts_c, counts)
        return pl.pallas_call(
            functools.partial(_dx_kernel_flip, spec=spec),
            grid=grid,
            in_specs=[
                _vmem((1, tmo, 3), lambda b, jj, ii: (b, jj, 0)),
                _vmem((1, 3, tni), lambda b, jj, ii: (b, 0, ii)),
                _vmem((1, tni, spec.cout_p), lambda b, jj, ii: (b, ii, 0)),
                _vmem((1, N_CELLS, tni), lambda b, jj, ii: (b, 0, ii)),
                _vmem((N_CELLS, spec.cout_p, spec.cin_p),
                      lambda b, jj, ii: (0, 0, 0)),
            ],
            out_specs=[
                _vmem((1, tmo, spec.cin_p), lambda b, jj, ii: (b, jj, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((spec.batch, spec.n_points, spec.cin_p), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((N_CELLS, tmo, spec.cout_p), jnp.float32)],
            interpret=spec.interpret,
        )(pcr, prt, g, cntt, wt)[0]
    return pl.pallas_call(
        functools.partial(_dx_kernel, spec=spec),
        grid=grid,
        in_specs=[
            _vmem((1, tni, 3), lambda b, jj, ii: (b, ii, 0)),
            _vmem((1, 3, tmo), lambda b, jj, ii: (b, 0, jj)),
            _vmem((1, tni, spec.cout_p), lambda b, jj, ii: (b, ii, 0)),
            _vmem((1, tni, N_CELLS), lambda b, jj, ii: (b, ii, 0)),
            _vmem((N_CELLS, spec.cout_p, spec.cin_p), lambda b, jj, ii: (0, 0, 0)),
        ],
        out_specs=[
            _vmem((1, tmo, spec.cin_p), lambda b, jj, ii: (b, jj, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((spec.batch, spec.n_points, spec.cin_p), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_CELLS, tmo, spec.cout_p), jnp.float32)],
        interpret=spec.interpret,
    )(pts_r, pts_c, g, counts, wt)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pointwise_conv_pallas(spec: PwConvSpec, pts_r, pts_c, feats, w, bias):
    """Padded, pre-laid-out pointwise conv. Returns (y, counts).

    Args (all already padded to ``spec`` shapes by the op-layer wrapper):
      pts_r:  (B, Nc, 3)  center positions (padding at SENTINEL).
      pts_c:  (B, 3, Nm)  candidate positions, transposed layout.
      feats:  (B, Nm, cin_p) candidate features; column ``cin_col`` == 1.0.
      w:      (27, cin_p, cout_p) kernel weights (zero rows at padding).
      bias:   (1, 1, cout_p).
    """
    y, counts = _fwd_call(spec, pts_r, pts_c, feats, w, bias)
    return y, counts


def _pw_fwd(spec, pts_r, pts_c, feats, w, bias):
    y, counts = _fwd_call(spec, pts_r, pts_c, feats, w, bias)
    return (y, counts), (pts_r, pts_c, feats, w, counts)


def _pw_bwd(spec, res, cts):
    pts_r, pts_c, feats, w, counts = res
    g, _ = cts  # cotangent of counts is unused (counts are an aux output)
    g = g.astype(jnp.float32)
    dw = _dw_call(spec, pts_r, pts_c, feats, g)
    dx = _dx_call(spec, pts_r, pts_c, g, counts, w)
    dbias = jnp.sum(g, axis=(0, 1), keepdims=True)
    return (
        jnp.zeros_like(pts_r),
        jnp.zeros_like(pts_c),
        dx.astype(feats.dtype),   # feats may arrive pre-cast to bf16
        dw,
        dbias,
    )


pointwise_conv_pallas.defvjp(_pw_fwd, _pw_bwd)


# ---- counts-only kernel + external-counts conv (ring strategy) -----------


def _counts_kernel(pr_ref, pc_ref, cnt_ref, *, spec):
    """Per-cell neighbor counts only — no features, no MXU.

    Counts are pure geometry (sum_j M_k[i, j]), so the ring strategy can
    compute GLOBAL counts from an all_gather of points alone (12 B/point)
    before any feature leaves its home chip.  VPU row-reductions of the mask
    planes; the 27 compare+selects dominate, as in the full kernels.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        cnt_ref[...] = jnp.zeros(cnt_ref.shape, cnt_ref.dtype)

    pr = pr_ref[0]
    pc = pc_ref[0]

    @pl.when(_tiles_overlap(pr, pc, spec.radius))
    def _():
        code = _pairwise_code(pr, pc, spec.radius)
        cnts = [
            jnp.sum((code == jnp.float32(k)).astype(jnp.float32), axis=1,
                    keepdims=True)
            for k in range(N_CELLS)
        ]
        cnt_ref[0] += jnp.concatenate(cnts, axis=1)


def _counts_call(spec: PwConvSpec, pts_r, pts_c):
    tn, tm = spec.tile_n, spec.tile_m
    grid = (spec.batch, spec.n_centers // tn, spec.n_points // tm)
    return pl.pallas_call(
        functools.partial(_counts_kernel, spec=spec),
        grid=grid,
        in_specs=[
            _vmem((1, tn, 3), lambda b, i, j: (b, i, 0)),
            _vmem((1, 3, tm), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            _vmem((1, tn, N_CELLS), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((spec.batch, spec.n_centers, N_CELLS),
                                 jnp.float32),
        ],
        interpret=spec.interpret,
    )(pts_r, pts_c)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pointwise_conv_pallas_ext(spec: PwConvSpec, pts_r, pts_c, feats, w, bias,
                              cnt_in):
    """Forward conv whose finalize divides by EXTERNAL counts ``cnt_in``
    (B, n_centers, 27).  With global counts fixed, the op is LINEAR in the
    candidate set: summing its outputs over disjoint candidate subsets gives
    the full convolution — the memory-bounded ring accumulates these
    partials under ppermute (parallel/spatial.py).  Requires
    spec.ext_counts=True; returns y only.
    """
    y, _ = _fwd_call(spec, pts_r, pts_c, feats, w, bias, cnt_in=cnt_in)
    return y


def _pw_ext_fwd(spec, pts_r, pts_c, feats, w, bias, cnt_in):
    y, _ = _fwd_call(spec, pts_r, pts_c, feats, w, bias, cnt_in=cnt_in)
    return y, (pts_r, pts_c, feats, w, cnt_in)


def _pw_ext_bwd(spec, res, g):
    pts_r, pts_c, feats, w, cnt_in = res
    g = g.astype(jnp.float32)
    dw = _dw_call(spec, pts_r, pts_c, feats, g, cnt_in=cnt_in)
    # dX divides by the same external counts the forward did — exactly the
    # existing dX kernels' contract (counts are an input there already).
    dx = _dx_call(spec, pts_r, pts_c, g, cnt_in, w)
    dbias = jnp.sum(g, axis=(0, 1), keepdims=True)
    return (
        jnp.zeros_like(pts_r),
        jnp.zeros_like(pts_c),
        dx.astype(feats.dtype),
        dw,
        dbias,
        jnp.zeros_like(cnt_in),   # counts are piecewise-constant geometry
    )


pointwise_conv_pallas_ext.defvjp(_pw_ext_fwd, _pw_ext_bwd)
