"""Exact streaming inference for scans too large for one padded batch.

BASELINE.json config 5: "~1M-pt scenes, bucketed padded-neighbor batching".
The reference never solves this — its eval crops blocks and votes, which is
approximate at block borders.  This engine is *exact* overlap-save
convolution instead:

  * the scene is partitioned into spatial tiles (native grid-hash index,
    pointwise_tpu/native);
  * each tile is processed together with a halo of width H = sum of the
    network's kernel radii (the receptive field of the conv stack), so the
    tile-interior outputs equal the full-scene computation exactly;
  * tiles are padded to a small set of bucket sizes so XLA compiles once
    per bucket (static shapes), and batched per bucket;
  * tile coordinates are re-centered before entering the net — the conv is
    translation-invariant, and this keeps f32 precision over large scenes.

Memory high-water on device is one bucket batch, independent of scene size.
"""

from __future__ import annotations

import itertools

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.native import GridIndex
from pointwise_tpu.utils.spatial import morton_code

DEFAULT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768)

SENTINEL = 1.0e6  # matches the conv kernels' padding coordinate


@jax.jit
def _stage(sx, sf, cand, centers, n0):
    """Device-side tile staging: gather candidate rows from the resident
    scene, re-center (translation invariance), sentinel-pad dead slots.
    Module-level so the jit trace/executable cache persists across
    stream_apply_layered calls — a keep-alive server retraces nothing."""
    live = (jnp.arange(cand.shape[1], dtype=jnp.int32)[None, :]
            < n0[:, None])
    pts = jnp.where(live[..., None], sx[cand] - centers[:, None, :],
                    jnp.float32(SENTINEL))
    fts = jnp.where(live[..., None], sf[cand], 0.0)
    return pts, fts


_SCENE_STAGE_CACHE: dict = {}

# (apply_fn token, bucket, tbs, lengths, axes, mesh shape) groups already
# warm-compiled this process — see stream_apply_layered.warm_group
_WARMED: set = set()

_FN_TOKENS = itertools.count()


def _fn_token(fn):
    """Process-unique identity for an apply_fn, stable for the fn's whole
    life.  ``id()`` alone is unsafe here: CPython reuses addresses after
    GC, so a dead warmed fn could alias a new one and _WARMED would
    falsely report its programs warm (compiled=False on a request that
    compiles).  A counter attribute pinned on first sight cannot alias;
    callables that refuse attributes fall back to id()."""
    tok = getattr(fn, "_pw_stream_token", None)
    if tok is None:
        tok = next(_FN_TOKENS)
        try:
            fn._pw_stream_token = tok
        except Exception:
            return id(fn)
    return tok


def _scene_sharded_stage(mesh, data_axis: str, scene_axis: str):
    """Owner-gather stager for a row-sharded resident scene, jitted ONCE per
    (mesh, axes) — module-level cache so a keep-alive server retraces
    nothing across requests (the same property ``_stage`` gives the
    unsharded path; a per-call closure re-traced/lowered the shard_map for
    every bucket shape on every request)."""
    key = (mesh, data_axis, scene_axis)
    fn = _SCENE_STAGE_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.sharding import PartitionSpec as P

    def local(sx, sf, cand, centers, n0):
        # owner-gather: every global index has exactly ONE owning row
        # shard, so the psum assembles each tile exactly (non-owners
        # contribute zeros)
        k = jax.lax.axis_index(scene_axis)
        ln = sx.shape[0]
        sel = cand - k * ln
        inr = (sel >= 0) & (sel < ln)
        sel = jnp.clip(sel, 0, ln - 1)
        pts = jax.lax.psum(
            jnp.where(inr[..., None], sx[sel], 0.0), scene_axis)
        fts = jax.lax.psum(
            jnp.where(inr[..., None], sf[sel], 0.0), scene_axis)
        live = (jnp.arange(cand.shape[1], dtype=jnp.int32)[None]
                < n0[:, None])
        pts = jnp.where(live[..., None], pts - centers[:, None, :],
                        jnp.float32(SENTINEL))
        fts = jnp.where(live[..., None], fts, 0.0)
        return pts, fts

    @jax.jit
    def stage(sx, sf, cand, centers, n0):
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(scene_axis), P(scene_axis), P(data_axis),
                      P(data_axis), P(data_axis)),
            out_specs=(P(data_axis), P(data_axis)),
        )(sx, sf, cand, centers, n0)

    _SCENE_STAGE_CACHE[key] = stage
    return stage


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


def stream_apply(
    apply_fn: Callable,
    xyz: np.ndarray,
    features: np.ndarray,
    *,
    halo: float,
    tile_size: float,
    out_dim: int,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    tile_batch: int = 4,
    progress: Callable | None = None,
) -> np.ndarray:
    """Run ``apply_fn(points, features, mask) -> (B, N, out_dim)`` over a
    whole scene, tile by tile, exactly.

    apply_fn must be translation-invariant in ``points`` (pointwise-conv
    stacks are) and respect ``mask``.  ``halo`` must be >= the receptive
    field (sum of kernel radii) for exactness.

    Returns (len(xyz), out_dim) float32 outputs for every point.
    """
    xyz = np.asarray(xyz, np.float32)
    features = np.asarray(features, np.float32)
    grid = GridIndex(xyz, tile_size)
    cells = grid.nonempty_cells()

    jobs = []
    for c in cells:
        # interiors come from the index's EXACT cell partition — a float
        # AABB re-query can disagree by 1 ulp at cell seams, dropping a
        # boundary point from every tile (its output row would stay zero)
        interior = grid.cell_points(c)
        if len(interior) == 0:
            continue
        lo = grid.origin + c.astype(np.float32) * tile_size
        hi = lo + tile_size
        cand = grid.query_box(lo - halo, hi + halo + 1e-5)
        # Morton order keeps tiles compact enough for the kernels' bbox
        # early-out / CSR walk.  (A whole-cell 512-slot packing gives
        # perfectly compact tiles but its ~1.3x padding inflation measured
        # slower overall — GOLDEN.md "Rejected: cell-list layout".)
        cand = cand[np.argsort(morton_code(xyz[cand]), kind="stable")]
        jobs.append((lo + 0.5 * tile_size, interior, cand))

    # group by bucket size (on the padded slot count)
    groups: dict[int, list] = {}
    for job in jobs:
        b = _bucket_for(len(job[2]), buckets)
        groups.setdefault(b, []).append(job)

    out = np.zeros((len(xyz), out_dim), np.float32)
    done = 0
    for b in sorted(groups):
        js = groups[b]
        # big buckets: shrink the tile batch (bounds device memory and lets
        # the conv's CSR walk keep its scalar tables within SMEM)
        tbs = max(1, min(tile_batch, (8192 * tile_batch) // b))
        for s in range(0, len(js), tbs):
            chunk = js[s : s + tbs]
            tb = len(chunk)
            pts = np.full((tbs, b, 3), SENTINEL, np.float32)
            fts = np.zeros((tbs, b, features.shape[-1]), np.float32)
            msk = np.zeros((tbs, b), np.float32)
            for t, (center, _, cand) in enumerate(chunk):
                k = len(cand)
                pts[t, :k] = xyz[cand] - center     # translation-invariant
                fts[t, :k] = features[cand]
                msk[t, :k] = 1.0
            logits = np.asarray(apply_fn(pts, fts, msk), np.float32)
            for t, (center, interior, cand) in enumerate(chunk):
                order = np.argsort(cand)
                pos = order[np.searchsorted(cand[order], interior)]
                out[interior] = logits[t, pos]
            done += tb
            if progress:
                progress(done, len(jobs), b)
    return out


def _nested_candidates(grid, cell, lo, hi, halos):
    """One tile's candidate set plus the nested-prefix gather schedule.

    REQUIRES the scene to be GLOBALLY morton-sorted (stream_apply_layered
    pre-sorts once): every query_box result, sorted ascending by index, is
    then automatically in morton order, so the schedule needs no per-tile
    morton pass — just sorts + searchsorted chains.  The candidate array
    stays morton-ordered as a whole (the conv kernels' CSR walk needs
    spatially compact 512-slot tiles); the per-depth shrinkage is expressed
    as index gathers: chain[l] = positions (within S_0) of S_{l+1} =
    tile + halo_{l+1}; sels[l] re-indexes S_{l+1} within S_l.

    Returns (interior ids in output order, cand ids, counts[L+1],
    sels[L], skips[L]) or None for an empty tile.
    """
    # exact cell partition, not a float AABB re-query (see GridIndex
    # .cell_points: 1-ulp box seams must not drop boundary points)
    interior = np.sort(grid.cell_points(cell))
    if len(interior) == 0:
        return None
    sets = [np.sort(grid.query_box(lo - h, hi + h + 1e-5))
            for h in halos]                                    # S_0..S_{L-1}
    s0 = sets[0]
    # subsets of the sorted s0 -> exact positions via binary search
    chain = [np.searchsorted(s0, s).astype(np.int64) for s in sets[1:]]
    chain.append(np.searchsorted(s0, interior).astype(np.int64))
    counts = np.asarray([len(s0)] + [len(c) for c in chain], np.int32)
    sels = []
    cur = np.arange(len(s0), dtype=np.int64)
    for nxt in chain:  # S_{l+1} positions within S_l (both sorted)
        sels.append(np.searchsorted(cur, nxt).astype(np.int32))
        cur = nxt
    skips = [np.searchsorted(chain[l], chain[-1]).astype(np.int32)
             for l in range(len(chain))]
    return s0[chain[-1]], s0, counts, sels, skips


def stream_apply_layered(
    apply_fn: Callable,
    xyz: np.ndarray,
    features: np.ndarray,
    *,
    radii: Sequence[float],
    tile_size: float,
    out_dim: int,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    tile_batch: int = 4,
    progress: Callable | None = None,
    mesh=None,
    data_axis: str = "data",
    scene_axis: str | None = None,
    length_profiles: dict | None = None,
    events: dict | None = None,
) -> np.ndarray:
    """Exact streaming with LAYER-WISE SHRINKING HALOS.

    ``stream_apply`` runs every conv layer over the full tile+halo candidate
    set; but layer ``l``'s outputs are only needed within the REMAINING
    receptive field halo_l = sum(radii[l:]), so the candidate walk shrinks
    with depth.  Each layer's needed set is a device-side index gather of
    the previous one (global morton order preserved — see
    _nested_candidates), and ``apply_fn(points, features, counts, sels,
    skips, lengths) -> (B, p_L, out_dim)`` (e.g.
    PointwiseSegmenter.streaming_logits) convolves centers=gather(sels[l])
    against the current candidate array.  Exactness: same overlap-save
    argument as stream_apply, applied per layer.

    ``lengths`` is a static tuple padded once per bucket group from a small
    ladder, so XLA compiles once per distinct schedule.

    Transfer design (the axon tunnel makes host->HBM the bottleneck at these
    sizes): the scene's xyz/features are uploaded ONCE; per tile the host
    sends only int32 index/schedule arrays (~3x fewer bytes) and a jitted
    stager gathers + recenters on device.  Staging and the device->host
    logits fetch are double-buffered against compute.

    Multi-chip: pass a ``jax.sharding.Mesh`` to shard each tile batch over
    ``data_axis`` (scene arrays replicated, per-chunk index arrays sharded;
    GSPMD partitions the jitted stager/apply) — tile batches are
    embarrassingly parallel, so serving scales linearly over the mesh.

    ``length_profiles``: optional mutable dict {bucket: (tbs, lengths)}
    shared across calls (keep-alive serving).  Schedules are reused when an
    existing entry covers the new scene and merged up otherwise, so program
    compiles amortize across requests instead of recurring per scene.

    ``events``: optional dict the engine fills with compile visibility for
    this call (VERDICT r4 task 9): ``new_programs`` = bucket groups whose
    (schedule, mesh) key was NOT already warm in this process — each one
    pays a program build (fresh 20-60 s compile, or a persistent-cache
    executable load) during the call; ``compiled`` = bool(new_programs);
    ``warm_s`` = seconds the warm thread spent building them (0.0 when the
    first real dispatch paid instead).  A profile-covered repeat request
    reports ``compiled: False``.

    ``scene_axis`` (requires ``mesh``): ALSO shard the device-resident scene
    arrays by rows over this mesh axis (SURVEY section 5 long-context tier
    2).  Per-tile compute is already bounded by the bucket ladder — the ONLY
    O(N_scene) device allocation is the resident scene (36 B/pt: xyz f32 +
    6-ch features), which caps a single v5e (16 GB) at ~450M points.  Row
    sharding drops that to N/space per chip; staging becomes a shard_map
    owner-gather: each chip gathers the candidate rows it owns and a psum
    over ``scene_axis`` assembles the tile (indices partition exactly one
    owner each, so this is exact).  Tile batches stay sharded over
    ``data_axis`` — the two compose as a (data, space) mesh.
    """
    import collections
    import concurrent.futures
    import queue as queue_mod
    import threading
    import time

    from pointwise_tpu.native import morton_codes

    # phase wall-times for the caller (events dict): where a streaming call
    # spends its life on this 1-core host — presort/build (serial host),
    # pack (producer thread busy), wait_packer (dispatch starved by the
    # packer), dispatch (stage+apply calls), flush (device->host fetch +
    # scatter).  Negligible overhead (a perf_counter pair per chunk).
    ev_t = collections.defaultdict(float)
    t_start = time.perf_counter()

    xyz_in = np.asarray(xyz, np.float32)
    features_in = np.asarray(features, np.float32)
    # GLOBAL morton pre-sort, once: every per-tile candidate set is then a
    # sorted-index array already in morton order — the schedule builder
    # (_nested_candidates) drops its per-tile morton passes, the hottest
    # host cost of round 2.  Outputs are written back through ``order``.
    order = np.argsort(morton_codes(xyz_in), kind="stable")
    xyz = np.ascontiguousarray(xyz_in[order])
    features = np.ascontiguousarray(features_in[order])
    radii = [float(r) for r in radii]
    # halos[l] = receptive field remaining BEFORE layer l
    halos = [sum(radii[l:]) for l in range(len(radii))]
    L = len(radii)
    ev_t["presort_s"] = time.perf_counter() - t_start
    grid = GridIndex(xyz, tile_size)

    def build_job(c):
        lo = grid.origin + c.astype(np.float32) * tile_size
        hi = lo + tile_size
        job = _nested_candidates(grid, c, lo, hi, halos)
        if job is None:
            return None
        return (lo + 0.5 * tile_size, *job)

    # schedule building is pure host work (native box queries + sorts, all
    # GIL-releasing) — build every tile's schedule in parallel
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        jobs = [j for j in ex.map(build_job, grid.nonempty_cells())
                if j is not None]
    ev_t["build_s"] = time.perf_counter() - t0

    ladder = tuple(sorted({128, 256} | set(buckets)))

    def pad_len(n):
        # fine-grained above the ladder top: power-of-2 jumps waste up to 2x
        # padded compute on big tiles; 8K-multiples keep the schedule small
        # while bounding waste to <6% there.
        if n <= ladder[-1]:
            return _bucket_for(n, ladder)
        return int(-(-n // 8192) * 8192)

    # Grouping (round-5 big-scene fix, GOLDEN streaming attribution): the
    # per-group schedule is the elementwise MAX over members, so lumping
    # every big tile into one p0 bucket pads corner tiles (small halos) up
    # to interior-tile maxima — measured 1.47x pair-cost inflation on the
    # 1M scene, the larger half of its 2x per-point gap vs 200K.  Big tiles
    # run one per chunk anyway (tbs == 1), so giving each distinct padded
    # schedule its OWN group removes the inflation without fragmenting
    # chunk batching; small tiles (tbs > 1) keep the bucket key so chunks
    # stay full.  Group keys are therefore int (bucket) or tuple (padded
    # per-level lengths) — order with _gorder where sorting matters.
    # n_data participates in the grouping predicate (a mesh rounds every
    # chunk up to n_data tiles), so resolve it before the device-placement
    # block below.
    n_data = 1 if mesh is None else mesh.shape[data_axis]
    groups: dict = {}
    for job in jobs:
        counts = job[3]
        b = _bucket_for(int(counts[0]), buckets)
        # A tile gets its OWN padded schedule (tuple key) only when it runs
        # one-per-chunk ANYWAY: the VMEM bound (8192*tile_batch slots) must
        # force tbs == 1 at this bucket — not merely the caller having asked
        # for tile_batch=1, which would explode SMALL tiles into one program
        # per distinct schedule — and the mesh must not round chunks up to
        # n_data tiles, which would leave per-schedule chunks mostly empty
        # (n_data-1 zero rows of padded compute each) where bucket groups
        # pack them full.
        forced_single = (8192 * tile_batch) // b <= 1
        key = (tuple(pad_len(int(c)) for c in counts)
               if (forced_single and n_data == 1) else b)
        groups.setdefault(key, []).append(job)

    # Coalesce near-identical big-tile schedules: a 1M scene's 16 tiles are
    # otherwise 16 distinct programs (~12 s program build each on first
    # contact).  Greedy merge into the costliest kept schedule whenever the
    # per-tile padded pair-cost inflation stays under 10% — bounds program
    # count at a bounded compute premium (exact either way: extra slots are
    # sentinel-dead).
    def _sched_cost(ls):
        return sum(a * c for a, c in zip(ls, ls[1:]))

    tkeys = sorted((k for k in groups if not isinstance(k, int)),
                   key=_sched_cost, reverse=True)
    kept: list = []
    for k in tkeys:
        merged = False
        for i, kk in enumerate(kept):
            m = tuple(max(a, c) for a, c in zip(kk, k))
            if _sched_cost(m) <= 1.10 * _sched_cost(k):
                members = groups.pop(k) + groups.pop(kk)
                if m in groups:                   # rare 3-way union
                    groups[m].extend(members)
                else:
                    groups[m] = members
                kept[i] = m
                kept = list(dict.fromkeys(kept))
                merged = True
                break
        if not merged:
            kept.append(k)

    def _gorder(k):
        return (k,) if isinstance(k, int) else k

    if scene_axis is not None and mesh is None:
        raise ValueError("scene_axis requires a mesh")
    stage = _stage
    scene_pad = xyz
    feats_pad = features
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        row_sh = NamedSharding(mesh, P(data_axis))
        put_scene = lambda a: jax.device_put(a, repl)       # noqa: E731
        put_rows = lambda a: jax.device_put(a, row_sh)      # noqa: E731
        if scene_axis is not None:
            n_space = mesh.shape[scene_axis]
            pad = (-len(xyz)) % n_space
            if pad:   # sentinel rows; no candidate index ever points here
                scene_pad = np.concatenate(
                    [xyz, np.full((pad, 3), SENTINEL, np.float32)])
                feats_pad = np.concatenate(
                    [features,
                     np.zeros((pad, features.shape[1]), np.float32)])
            scene_sh = NamedSharding(mesh, P(scene_axis))
            put_scene = lambda a: jax.device_put(a, scene_sh)  # noqa: E731
            stage = _scene_sharded_stage(mesh, data_axis, scene_axis)
    else:
        put_scene = jax.device_put
        put_rows = jax.device_put
    scene_xyz = put_scene(jnp.asarray(scene_pad))
    scene_fts = put_scene(jnp.asarray(feats_pad))

    out = np.zeros((len(xyz), out_dim), np.float32)
    done = 0
    pending: collections.deque = collections.deque()

    def flush():
        nonlocal done
        t0 = time.perf_counter()
        logits_d, interiors, b = pending.popleft()
        logits = np.asarray(logits_d, np.float32)   # device->host barrier
        ev_t["flush_fetch_s"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        for t, interior_ids in enumerate(interiors):
            # interior ids live in SORTED index space; map back through the
            # morton pre-sort permutation into the caller's point order
            out[order[interior_ids]] = logits[t, : len(interior_ids)]
        ev_t["flush_scatter_s"] += time.perf_counter() - t0
        done += len(interiors)
        if progress:
            progress(done, len(jobs), b)

    # ONE static padded prefix schedule per bucket group (monotone: per-tile
    # counts are non-increasing and padding is monotone); per-chunk
    # schedules would compile per chunk.
    meta = {}
    for b in sorted(groups, key=_gorder):
        p0 = b if isinstance(b, int) else b[0]
        tbs = max(1, min(tile_batch, (8192 * tile_batch) // p0))
        tbs = -(-tbs // n_data) * n_data       # divisible by the mesh
        if isinstance(b, int):
            gmax = np.max(np.stack([j[3] for j in groups[b]]), axis=0)
            lengths = tuple(pad_len(int(m)) for m in gmax)
        else:
            lengths = b       # per-schedule group: the key IS the schedule
        if length_profiles is not None:
            # Keep-alive serving: ``lengths`` depends on this SCENE's
            # per-group tile maxima, so every new scene would otherwise risk
            # a fresh 20-60 s program compile mid-request.  A profile entry
            # that elementwise covers this scene reuses the already-warm
            # program (extra slots are sentinel-dead -> still exact, at most
            # one ladder step of padding); on a miss the entry is merged
            # UP (elementwise max of pad_len values is a pad_len value), so
            # the program set converges monotonically across requests.
            # A stale entry from a DIFFERENT config (other radii -> other
            # schedule length, other tbs) must be replaced, not merged — a
            # short tuple would otherwise crash the packer mid-serve.
            prof = length_profiles.get(b)
            covered_elsewhere = False
            if (prof is not None and prof[0] == tbs
                    and len(prof[1]) == len(lengths)):
                lengths = tuple(max(int(p), l)
                                for p, l in zip(prof[1], lengths))
            elif prof is None and not isinstance(b, int):
                # tuple-keyed (big-tile) groups: reuse the cheapest existing
                # entry that elementwise covers this schedule — its program
                # is already warm in a keep-alive server, and the extra
                # padding is sentinel-dead (exact)
                best = None
                for k2, (t2, l2) in length_profiles.items():
                    if (not isinstance(k2, int) and t2 == tbs
                            and len(l2) == len(lengths)
                            and all(a >= c for a, c in zip(l2, lengths))):
                        cost = sum(a * c for a, c in zip(l2, l2[1:]))
                        if best is None or cost < best[0]:
                            best = (cost, tuple(int(x) for x in l2))
                if best is not None:
                    lengths = best[1]
                    covered_elsewhere = True
            # A schedule served by ANOTHER key's covering entry must not be
            # re-inserted under its own scene-specific key: a keep-alive
            # server over many distinct big scenes would otherwise grow the
            # profile (its O(entries) covering scan, and the profile file
            # infer.py rewrites per request) without bound.
            if not covered_elsewhere:
                length_profiles[b] = (tbs, lengths)
        meta[b] = (tbs, lengths)

    def _wkey(b):
        tbs, lengths = meta[b]
        return (_fn_token(apply_fn), b, tbs, lengths, data_axis, scene_axis,
                None if mesh is None else
                tuple(sorted(mesh.shape.items())))

    # Compile visibility (VERDICT r4 task 9): every group whose key is not
    # already warm pays a program build (compile or persistent-cache load)
    # somewhere in this call — count them NOW, before the warm thread runs,
    # so the caller can report it per request.
    _new_groups = [b for b in sorted(groups, key=_gorder)
                   if _wkey(b) not in _WARMED]
    if events is not None:
        events["new_programs"] = len(_new_groups)
        events["compiled"] = bool(_new_groups)
        events["warm_s"] = 0.0

    def warm_group(b):
        """Compile (or persistent-cache-load) one bucket group's programs on
        a dummy chunk.  Group programs are big (20-60 s compiles); round 2
        paid them serially at each group's first real chunk — warming in a
        background thread overlaps each group's compile with earlier
        groups' streaming.  The dummy result is discarded; the wasted
        device pass per group is a few hundred ms.  Warmed (fn, schedule)
        keys are remembered process-wide: a keep-alive server whose profile
        covers the request must not pay the dummy passes again per request."""
        try:
            tbs, lengths = meta[b]
            wkey = _wkey(b)
            if wkey in _WARMED:
                return
            t_warm = time.perf_counter()
            cand = put_rows(np.zeros((tbs, lengths[0]), np.int32))
            ctr = put_rows(np.zeros((tbs, 3), np.float32))
            pts_d, fts_d = stage(scene_xyz, scene_fts, cand, ctr,
                                 put_rows(np.zeros((tbs,), np.int32)))
            apply_fn(
                pts_d, fts_d,
                put_rows(np.zeros((tbs, L + 1), np.int32)),
                tuple(put_rows(np.zeros((tbs, lengths[l + 1]), np.int32))
                      for l in range(L)),
                tuple(put_rows(np.zeros((tbs, lengths[-1]), np.int32))
                      for l in range(L)),
                lengths,
            )
            _WARMED.add(wkey)
            if events is not None:
                # single warm thread writes; caller reads after the join at
                # the end of this call, so no lock is needed
                events["warm_s"] += time.perf_counter() - t_warm
        except Exception:
            pass                      # the real call will surface any error

    # ONE warm thread, groups in sorted order, and the main loop GATES each
    # group's first dispatch on its event: trace order is then strictly
    # deterministic.  Concurrent tracing (round 3's first attempt: one
    # thread per group) produced nondeterministic program content — fresh
    # persistent-cache keys on otherwise identical runs — and parallel
    # compiles cannot help on this 1-core host anyway.
    import os as _os
    _warm = _os.environ.get("POINTWISE_STREAM_WARM", "1") != "0"
    warm_done = {b: threading.Event() for b in groups}

    def warm_all():
        for b in sorted(groups, key=_gorder):
            warm_group(b)
            warm_done[b].set()

    if _warm:
        warm_thread = threading.Thread(target=warm_all, daemon=True)
        warm_thread.start()
    else:
        warm_thread = None
        for ev in warm_done.values():
            ev.set()

    def pack_chunks(q):
        """Producer thread: pad + pack every chunk's host arrays off the
        dispatch critical path (round-2 profile: packing ran serially with
        the device).  Bounded queue keeps a few chunks staged ahead."""
        try:
            for b in sorted(groups, key=_gorder):
                js = groups[b]
                tbs, lengths = meta[b]
                p0, p_last = lengths[0], lengths[-1]
                for s in range(0, len(js), tbs):
                    t0 = time.perf_counter()
                    chunk = js[s : s + tbs]
                    cand_h = np.zeros((tbs, p0), np.int32)
                    ctr_h = np.zeros((tbs, 3), np.float32)
                    cnt = np.zeros((tbs, L + 1), np.int32)
                    sels = [np.zeros((tbs, lengths[l + 1]), np.int32)
                            for l in range(L)]
                    skips = [np.zeros((tbs, p_last), np.int32)
                             for l in range(L)]
                    for t, (center, _, cand, counts, sel, skip) in enumerate(
                            chunk):
                        cand_h[t, : len(cand)] = cand
                        ctr_h[t] = center           # translation-invariant
                        cnt[t] = counts
                        for l in range(L):
                            sels[l][t, : len(sel[l])] = sel[l]
                            skips[l][t, : len(skip[l])] = skip[l]
                    interiors = [c[1] for c in chunk]
                    ev_t["pack_s"] += time.perf_counter() - t0
                    q.put((b, lengths, cand_h, ctr_h, cnt, sels, skips,
                           interiors))
        except BaseException as e:   # surface packer failures in the caller
            q.put(e)                 # (a bare sentinel would silently return
        else:                        # a zero-filled output array)
            q.put(None)

    q: queue_mod.Queue = queue_mod.Queue(maxsize=3)
    packer = threading.Thread(target=pack_chunks, args=(q,), daemon=True)
    packer.start()
    try:
        while True:
            t0 = time.perf_counter()
            item = q.get()
            ev_t["wait_packer_s"] += time.perf_counter() - t0
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            b, lengths, cand_h, ctr_h, cnt, sels, skips, interiors = item
            t0 = time.perf_counter()
            warm_done[b].wait()   # group's programs traced by the warm thread
            ev_t["wait_warm_s"] += time.perf_counter() - t0
            # async: stage (device gather) + dispatch while the previous
            # chunk computes; only index/schedule arrays cross the host link
            t0 = time.perf_counter()
            pts_d, fts_d = stage(scene_xyz, scene_fts,
                                 put_rows(cand_h),
                                 put_rows(ctr_h),
                                 put_rows(cnt[:, 0]))
            logits_d = apply_fn(pts_d, fts_d, put_rows(cnt),
                                tuple(put_rows(x) for x in sels),
                                tuple(put_rows(x) for x in skips), lengths)
            ev_t["dispatch_s"] += time.perf_counter() - t0
            pending.append((logits_d, interiors, b))
            if len(pending) >= 2:
                flush()
    except BaseException:
        # Run the packer down before propagating: a keep-alive server
        # catches per-request errors, and a packer blocked on the bounded
        # queue would otherwise leak a thread + its queued multi-MB chunks
        # for every failed request.
        while packer.is_alive():
            try:
                q.get_nowait()
            except queue_mod.Empty:
                packer.join(timeout=0.05)
        raise
    packer.join()
    while pending:
        flush()
    if warm_thread is not None:       # avoid interpreter-shutdown races
        warm_thread.join()
    # Every group's programs are certainly built once the call completes —
    # record them even when the warm thread was disabled
    # (POINTWISE_STREAM_WARM=0) or died, so the compile-visibility events of
    # a keep-alive server stay truthful on repeat requests (the warm thread
    # was previously the ONLY _WARMED writer, so disabling it reported
    # compiled=True forever).
    for b in groups:
        _WARMED.add(_wkey(b))
    ev_t["total_s"] = time.perf_counter() - t_start
    ev_t["n_jobs"] = len(jobs)
    if events is not None:
        events.update({k: round(float(v), 4) for k, v in ev_t.items()})
    return out
