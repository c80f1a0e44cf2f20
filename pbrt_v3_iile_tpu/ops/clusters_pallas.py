"""Fused Pallas cluster-traversal kernel: the TPU-native BVH hot loop.

This is the round-3 rebuild of the MXU-dense cluster idea
(ops/clusters.py keeps the XLA reference implementation): instead of
materializing (rays, chunk, 3C) side-test tensors through HBM (~800 MB
per scan step — bandwidth-bound at 0.84 Mrays/s), ONE Pallas kernel per
ray wave keeps everything in VMEM:

- grid over ray *groups* (G rays, octant+Morton sorted for coherence);
  Pallas pipelines the per-group ray/output blocks automatically;
- per group, a double-buffered DMA streams the candidate clusters'
  packed feature matrices (16, 5*C) from HBM while the MXU tests the
  previous cluster: one (G,16)@(16,5*C) matmul yields the three
  Pluecker edge sides w0/w1/w2, the plane numerator and denominator
  for all C triangles of the cluster at once;
- the running closest-hit (t, prim, w0, w2, s) lives in registers as
  (G,1) columns — no intermediate ever touches HBM;
- candidate cluster ids come from a conservative group-vs-AABB interval
  cull done in XLA (ops/clusters.sort_key/_group_cull), front-to-back
  ordered so the t-pruning (`t < best_t`) kills most lanes early.

Feature packing (per cluster, slim (NRS=24, C) f32), ray feature vector
r = [d(3), o x d(3), -o(3), 1, 0...]:
  row [q*6 + 0:3] = a x b, [q*6 + 3:6] = b - a for edge q of triangle j
             (side = d.(a x b) + (o x d).(b - a), Shevtsov-style)
  rows 18:21 = n, row 21 = n.p0 (plane numerator; the denominator n.d
  equals the side sum s exactly, so it needs no rows)
  so t = num/s, and the side signs agree iff the ray crosses the
  triangle; u = w2/s, v = w0/s with s = w0+w1+w2 (same convention as
  ops/clusters.py, parity-tested).  Only the 22 live rows (padded 24)
  ride the per-cluster DMA — 3.3x fewer bytes than a (10, 8, C)
  quantity-band layout.

Replaces the reference renderer's hot loop
(ref: src/accelerators/bvh.cpp:662 BVHAccel::Intersect,
src/shapes/triangle.cpp:188 Triangle::Intersect).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit
from . import clusters as cluster_lib

C = 128          # triangles per cluster (one lane tile per quantity)
NF = 16          # ray feature lanes (10 used, padded to 16)
NRS = 24         # slim feature rows per cluster: 3x6 edge-side rows +
                 # 3 plane-normal rows + 1 plane-offset row = 22, padded
                 # to the f32 sublane tile (saves 3.3x DMA bytes vs the
                 # round-3 (10, 8, C) quantity-band layout)
NB = 4           # clusters tested per loop iteration (amortizes the
                 # DMA-latency + loop-overhead floor over 4x the work)
NSLOTS = 3       # feature staging slots: bundles i+1 AND i+2 prefetch
                 # while bundle i computes — a 2-deep pipeline hides the
                 # HBM fetch latency that a double buffer could not
                 # (slot compute is ~0.5 us, the fetch ~1 us)
G_DEFAULT = 64   # rays per group (full-pass sweep optimum)
MAXC_DEFAULT = 192
SUB_DEFAULT = 64  # rays per subgroup for pl.when batch skipping.
                 # sub = G (dense, no masking) won the round-5 on-chip
                 # sweep: with the per-lane deferred best the masked
                 # tile evals are cheaper than the branches they save
                 # (BENCH_NOTES round 5); the masking stays available
                 # for scenes with more divergent candidate sets
BK_DEFAULT = 4   # early-break / per-ray-best cadence in bundles: the
                 # cross-lane min reductions only run every BK bundles
                 # (the per-lane running best makes them deferrable)


class ClusterPack(NamedTuple):
    """Device tables for the fused kernel (triangles in BVH order)."""
    feat: jnp.ndarray      # (K, NRS, C) f32 packed features (HBM)
    tri_off: jnp.ndarray   # (K,) i32 first triangle id
    tri_cnt: jnp.ndarray   # (K,) i32 valid triangles (<= C)
    aabb_min: jnp.ndarray  # (K,3) f32
    aabb_max: jnp.ndarray  # (K,3) f32


def build_cluster_pack(flat, tri_p0, tri_e1, tri_e2,
                       max_tris: int = C) -> ClusterPack:
    """Vectorized host-side build (no per-triangle Python loop).

    flat: ops/bvh.FlatBVH; tri_*: (T,3) BVH-ordered triangle soup."""
    ranges = cluster_lib._subtree_ranges(flat, max_tris)
    K = len(ranges)
    off = np.asarray([r[0] for r in ranges], np.int32)
    cnt = np.asarray([r[1] for r in ranges], np.int32)
    order = np.argsort(off, kind="stable")
    off, cnt = off[order], cnt[order]
    T = int(cnt.sum())

    p0 = np.asarray(tri_p0, np.float64)[:T]
    e1 = np.asarray(tri_e1, np.float64)[:T]
    e2 = np.asarray(tri_e2, np.float64)[:T]
    p1 = p0 + e1
    p2 = p0 + e2
    n = np.cross(e1, e2)

    k_of = np.repeat(np.arange(K), cnt)           # (T,) cluster per tri
    j_of = np.arange(T) - off[k_of]               # (T,) slot in cluster

    # slim layout (K, NRS, C): only the 22 rows the contraction reads —
    # rows q*6+0:3 = a x b, q*6+3:6 = b - a for the three edges q,
    # rows 18:21 = n, row 21 = n.p0 — padded to 24 for the sublane tile
    # (vs the round-3 (10, 8, C) band layout that DMA'd 80 rows: 3.3x
    # fewer bytes per cluster fetch).
    feat = np.zeros((K, NRS, max_tris), np.float32)
    rows3 = np.arange(3)
    for q, (a, b) in enumerate(((p0, p1), (p1, p2), (p2, p0))):
        feat[k_of[:, None], q * 6 + rows3[None, :], j_of[:, None]] = \
            np.cross(a, b).astype(np.float32)
        feat[k_of[:, None], q * 6 + 3 + rows3[None, :], j_of[:, None]] = \
            (b - a).astype(np.float32)
    feat[k_of[:, None], 18 + rows3[None, :], j_of[:, None]] = \
        n.astype(np.float32)
    feat[k_of, 21, j_of] = np.einsum("td,td->t", n,
                                     p0).astype(np.float32)
    # no separate plane-denominator row: n.d == w0+w1+w2 exactly
    # (a x b + b x c + c x a = e1 x e2 = n), so the kernel reuses the
    # side-sum s as the denominator — one fewer contraction.

    # per-cluster AABBs via segment reductions over contiguous ranges
    v = np.stack([p0, p1, p2], 1)                 # (T,3,3)
    tmin = v.min(1)
    tmax = v.max(1)
    amin = np.minimum.reduceat(tmin, off)[:K].astype(np.float32)
    amax = np.maximum.reduceat(tmax, off)[:K].astype(np.float32)

    return ClusterPack(
        feat=jnp.asarray(feat), tri_off=jnp.asarray(off),
        tri_cnt=jnp.asarray(cnt), aabb_min=jnp.asarray(amin),
        aabb_max=jnp.asarray(amax))


def _traverse_group_kernel(cand_ref, cpk_ref, ctn_ref,
                           subm_ref, ncand_ref, rays_ref, tmax_ref,
                           feat_hbm, t_out, prim_out,
                           fbuf, bt_ref, btl_ref, bpl_ref, sems, *,
                           any_hit: bool, maxc: int, sub: int, bk: int,
                           exact_div: bool):
    """One grid program = one ray group vs its candidate clusters.

    Candidates arrive sorted by conservative entry distance (ctn_ref);
    the loop EXITS as soon as every ray's current best hit is nearer
    than the next cluster's entry bound — exact occlusion culling, the
    TPU analogue of the BVH walker's ordered descent
    (ref: bvh.cpp:662 near-child-first traversal).

    The NB clusters of a bundle are evaluated as (G/sub) subgroup tile
    batches of (sub, NB*C): the per-cluster feature blocks DMA into
    adjacent lane bands of the staging buffer, and a subgroup's batch
    is SKIPPED entirely (pl.when) when none of the bundle's clusters
    carries that subgroup's cull bit (subm_ref, bit j = some live ray
    of rows j*sub..(j+1)*sub-1 enters the cluster's AABB).

    The bundle is evaluated one cluster SLOT at a time on (sub, C)
    tiles: at sub=64 every temporary is 8 vregs, so the whole Pluecker
    evaluation stays in vector registers (the bundle-wide (G, NB*C)
    form spilled to VMEM — measured ~3x off VPU peak), and the slot's
    triangle count/offset are SMEM scalars instead of broadcast select
    chains.  The running best hit is PER-LANE (btl/bpl (G, C), lane =
    triangle slot, min-accumulated across clusters): a slot eval does
    elementwise compare+selects only, and the cross-lane min reductions
    run once every `bk` bundles (fused with the early-break check) plus
    once at the end.  t = num/s uses the VPU's approximate reciprocal +
    one Newton step instead of a full-precision divide (exact_div=True
    restores the divide for interpret mode)."""
    r = rays_ref[0]                  # (G, NF)
    tmax = tmax_ref[0]               # (G, 1)
    n = ncand_ref[0, 0, 0]           # candidates (kernel rounds up to NB)
    nb = (n + NB - 1) // NB          # bundles
    Gr = r.shape[0]
    nsg = Gr // sub
    lane_loc = jax.lax.broadcasted_iota(jnp.int32, (sub, C), 1)
    big_t = jnp.float32(3.0e38)

    bt_ref[:] = jnp.where(tmax > 0.0, tmax,
                          -big_t)    # dead rays match nothing
    btl_ref[:] = jnp.full((Gr, C), big_t)
    bpl_ref[:] = jnp.full((Gr, C), 2 ** 30, jnp.int32)

    def dma(slot, j, i):
        # cand ids are padded/clamped by the wrapper, so fetching the
        # whole bundle unconditionally is safe; cnt=0 masks the compute
        cid = cand_ref[0, 0, i * NB + j]
        return pltpu.make_async_copy(
            feat_hbm.at[cid], fbuf.at[slot, :, pl.ds(j * C, C)],
            sems.at[slot, j])

    def start_bundle(slot, i):
        for j in range(NB):
            dma(slot, j, i).start()

    def wait_bundle(slot, i):
        for j in range(NB):
            dma(slot, j, i).wait()

    for k in range(NSLOTS - 1):
        @pl.when(nb > k)
        def _(k=k):
            start_bundle(k, k)

    def cond(st):
        i, done = st
        return (i < nb) & jnp.logical_not(done)

    def step(st):
        i, done = st
        slot = jax.lax.rem(i, NSLOTS)

        @pl.when(i + NSLOTS - 1 < nb)
        def _():
            start_bundle(jax.lax.rem(i + NSLOTS - 1, NSLOTS),
                         i + NSLOTS - 1)

        wait_bundle(slot, i)

        # Thin-K contraction as explicit VPU outer-product accumulation
        # over (sub, NB*C) subgroup tiles: at K=16 the MXU pads the
        # contraction to 128 (8x wasted passes, and f32 needs multi-pass
        # bf16 emulation); 22 full-rate f32 madds on wide tiles beat it
        # AND keep exact f32 precision (no bf16 side-test cancellation —
        # the ADVICE r2 precision concern).
        fb = fbuf[slot]                               # (NRS, NB*C)

        # per-cluster (sub, C) tiles: temporaries are 8 vregs each at
        # sub = 64, so the whole Pluecker evaluation lives in vector
        # registers — the (sub, NB*C) bundle-wide form spilled to VMEM
        # (measured ~3x off VPU peak, BENCH_NOTES round 5).  Per-slot
        # triangle count/offset become SMEM scalars, replacing the
        # round-4 per_slot select chains entirely.
        for j in range(NB):
            pk = cpk_ref[0, 0, i * NB + j]            # scalar i32
            cnt_j = pk & 255
            off_j = pk >> 8
            fbj = fb[:, j * C:(j + 1) * C]

            def _slot(g, j=j, pk=pk, cnt_j=cnt_j, off_j=off_j, fbj=fbj):
                lo = g * sub
                rj = r[lo:lo + sub]                   # (sub, NF)

                def contract(row0, rcols):
                    acc = None
                    for k, rc in enumerate(rcols):
                        term = rj[:, rc:rc + 1] * fbj[row0 + k][None, :]
                        acc = term if acc is None else acc + term
                    return acc                        # (sub, C)

                e6 = (0, 1, 2, 3, 4, 5)
                w0 = contract(0, e6)
                w1 = contract(6, e6)
                w2 = contract(12, e6)
                num = contract(18, (6, 7, 8, 9))
                # the plane denominator n.d equals the side sum s
                # EXACTLY in real arithmetic (a x b + b x c + c x a =
                # e1 x e2 = n), so no separate contraction: t = num / s
                # (Shevtsov et al. form)
                s = w0 + w1 + w2
                s_safe = jnp.where(jnp.abs(s) > 1e-12, s,
                                   jnp.where(s >= 0, 1e-12, -1e-12))
                if exact_div:
                    t = num / s_safe
                else:
                    # approx reciprocal (~8-bit) + one Newton step
                    # (~1e-6 rel): far cheaper than the f32 divide and
                    # well inside the f32 noise of the side tests
                    r0 = pl.reciprocal(s_safe, approx=True)
                    t = num * (r0 * (2.0 - s_safe * r0))
                # sign-agreement via pairwise products (fewer VPU ops
                # than the 6-compare form; all three pairs needed so a
                # single zero side can't mask a disagreement between
                # the others)
                same = ((w0 * w1 >= 0) & (w1 * w2 >= 0) & (w0 * w2 >= 0))

                best_t = bt_ref[lo:lo + sub]          # (sub, 1), <= bk
                                                      # bundles stale
                btl = btl_ref[lo:lo + sub]            # (sub, C)
                ok = (same & (jnp.abs(s) > 1e-12)
                      & (t > 1e-5) & (t < best_t) & (lane_loc < cnt_j)
                      & (t < btl))
                # per-lane running best: elementwise selects only — the
                # cross-lane reductions are deferred to the break check
                btl_ref[lo:lo + sub] = jnp.where(ok, t, btl)
                bpl_ref[lo:lo + sub] = jnp.where(
                    ok, off_j + lane_loc,
                    bpl_ref[lo:lo + sub])

            for g in range(nsg):
                if sub < Gr:
                    pl.when((((subm_ref[0, 0, i * NB + j] >> g) & 1) != 0)
                            )(functools.partial(_slot, g))
                else:
                    _slot(g)

        # exact early break every bk bundles (and on the last): bundle
        # i+1 (and all later — the list is tnear-sorted) cannot beat
        # best_t for any ray.  Dead rays (best_t = -big) always satisfy
        # it; unhit live rays have best_t = tmax, which for shadow rays
        # bounds the search.  any_hit: a ray is also finished as soon
        # as ANY accepted hit exists (bt dropped below tmax).
        chk = (jax.lax.rem(i + 1, bk) == 0) | (i + 1 >= nb)

        @pl.when(chk)
        def _():
            row_min = jnp.min(btl_ref[:], axis=1, keepdims=True)
            bt_ref[:] = jnp.minimum(bt_ref[:], row_min)

        nxt_tn = ctn_ref[0, 0, jnp.minimum((i + 1) * NB, maxc - 1)]
        fin = bt_ref[:] <= nxt_tn
        if any_hit:
            fin = fin | (bt_ref[:] < tmax)
        done = chk & jnp.all(fin)
        return i + 1, done

    i_fin, done_fin = jax.lax.while_loop(cond, step, (jnp.int32(0), False))

    # drain: an early break leaves up to NSLOTS-1 prefetched bundles in
    # flight — wait them so the semaphore state stays clean across grid
    # steps
    for k in range(NSLOTS - 1):
        @pl.when(done_fin & (i_fin + k < nb))
        def _(k=k):
            wait_bundle(jax.lax.rem(i_fin + k, NSLOTS), i_fin + k)

    # final cross-lane resolve, ONCE per group: best t = lane min;
    # winner prim = smallest prim id among lanes at the min (ties are
    # deterministic, matching the round-4 per-bundle epilogue)
    btl = btl_ref[:]
    best = jnp.min(btl, axis=1, keepdims=True)        # (G, 1)
    hitm = best < big_t * 0.5
    win = (btl == best) & hitm
    prim = jnp.min(jnp.where(win, bpl_ref[:], 2 ** 30),
                   axis=1, keepdims=True)
    t_out[0] = jnp.where(hitm, best, tmax)
    prim_out[0] = jnp.where(hitm, prim, -1)


def _run_kernel(feat, cand, cpk, ctn, subm, ncand, rays, tmax, *,
                any_hit: bool, interpret: bool, sub: int,
                bk: int = BK_DEFAULT):
    Gn, G, _ = rays.shape
    maxc = cand.shape[-1]
    maxc_m = subm.shape[-1]          # 1 in dense (unmasked) mode
    smem = lambda shape: pl.BlockSpec(
        shape, lambda g: (g,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda g: (g,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((Gn, G, 1), jnp.float32),
        jax.ShapeDtypeStruct((Gn, G, 1), jnp.int32),
    ]
    kern = functools.partial(_traverse_group_kernel, any_hit=any_hit,
                             maxc=maxc, sub=sub, bk=bk,
                             exact_div=interpret)
    return pl.pallas_call(
        kern,
        grid=(Gn,),
        in_specs=[
            # scalar tables ride as (Gn, 1, MAXC): the TPU lowering
            # requires the last two BLOCK dims to equal the array dims
            # (or be 8/128-divisible), so the grid axis leads
            smem((1, 1, maxc)),                   # cand ids
            smem((1, 1, maxc)),                   # packed off*256+cnt
            smem((1, 1, maxc)),                   # tnear (sorted)
            smem((1, 1, maxc_m)),                 # subgroup bitmasks
                                                  # ((Gn,1,1) dense)
            smem((1, 1, 1)),                      # n candidates
            vmem((1, G, NF)),                     # ray features
            vmem((1, G, 1)),                      # t_max
            pl.BlockSpec(memory_space=pltpu.HBM),  # features stay in HBM
        ],
        out_specs=[vmem((1, G, 1))] * 2,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, NRS, NB * C), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),      # per-ray best t (cap)
            pltpu.VMEM((G, C), jnp.float32),      # per-lane best t
            pltpu.VMEM((G, C), jnp.int32),        # per-lane best prim
            pltpu.SemaphoreType.DMA((NSLOTS, NB)),
        ],
        interpret=interpret,
    )(cand, cpk, ctn, subm, ncand, rays, tmax, feat)


def intersect_clusters_fused(cp: ClusterPack, o, d, t_max, *,
                             any_hit: bool = False, group: int = G_DEFAULT,
                             max_candidates: int = MAXC_DEFAULT,
                             subgroup: int = SUB_DEFAULT,
                             break_every: int = BK_DEFAULT,
                             world_min=None, world_max=None,
                             fallback=None, interpret: bool = False,
                             tri_p0=None, tri_e1=None, tri_e2=None,
                             presorted: bool = False) -> Hit:
    """Full-scene closest-hit (or any-hit) via the fused cluster kernel.

    Sort -> exact per-ray cull -> front-to-back candidate lists ->
    Pallas kernel; groups whose candidate count exceeds max_candidates
    fall back to `fallback(o, d, t_alive)` (the XLA walker) for
    exactness.  Returns Hit in the original ray order with BVH-order
    triangle ids.

    presorted=True: the caller guarantees rays already arrive
    coherence-sorted (dead rays last) — the internal sort AND the
    result unsort are skipped (the compacted-wavefront pipeline sorts
    the whole path state once per bounce instead)."""
    N = o.shape[0]
    G = group
    pad = (-N) % G
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[1.0, 0, 0]], d.dtype), (pad, 1))])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    Np = N + pad
    Gn = Np // G
    K = cp.aabb_min.shape[0]
    # round to a whole number of kernel bundles
    MAXC = min(max_candidates, ((K + NB - 1) // NB) * NB)
    MAXC = ((MAXC + NB - 1) // NB) * NB

    wmin = jnp.min(cp.aabb_min, 0) if world_min is None else world_min
    wmax = jnp.max(cp.aabb_max, 0) if world_max is None else world_max
    if presorted:
        os_, ds_, ts_ = o, d, t_max
        inv_perm = None
    else:
        key = cluster_lib.sort_key6(o, d, wmin, wmax)
        key = jnp.where(t_max > 0.0, key, jnp.int32(0x7FFFFFFF))
        # ONE multi-operand sort carries the ray data and its original
        # index (payloads ride the sort; separate argsort + row gathers
        # are much slower on TPU)
        ridx = jnp.arange(Np, dtype=jnp.int32)
        (_, ox, oy, oz, dx, dy, dz, ts_, perm) = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             t_max, ridx), dimension=0, num_keys=1)
        os_ = jnp.stack([ox, oy, oz], axis=1)
        ds_ = jnp.stack([dx, dy, dz], axis=1)
        # inverse permutation via scatter (an argsort of a permutation
        # is just inv[perm[i]] = i — one scatter beats a second sort)
        inv_perm = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))

    # EXACT per-ray slab cull reduced per group (ops/clusters.py
    # per_ray_cull): a cluster is a candidate iff some live member ray
    # enters its AABB within [0, t_max].  ~13x fewer candidates than
    # the interval-arithmetic group cull on diffuse bounce waves
    # (measured; see BENCH_NOTES round 4).  The same pass also yields
    # per-SUBGROUP need bitmasks for pl.when batch skipping in the
    # kernel.
    # subgroup validation (ADVICE r4): the cull bitmask is one int32, so
    # at most 32 subgroups; and Mosaic needs sublane-tile-aligned (>=8)
    # scratch row slices.  Out-of-range values fall back to sub = G
    # (dense full-group tiles, no batch skipping).
    sub = subgroup
    if G % sub or sub < 8 or G // sub > 32:
        sub = G
    masked = sub < G
    if masked:
        mask, tnear, subbits = cluster_lib.per_ray_cull_bits(
            os_, ds_, ts_, cp.aabb_min, cp.aabb_max, G, sub)  # (Gn,K)
    else:
        mask, tnear = cluster_lib.per_ray_cull(
            os_, ds_, ts_, cp.aabb_min, cp.aabb_max, G)
    n_cand = jnp.sum(mask, axis=1)

    # front-to-back candidate order by conservative entry distance —
    # the kernel's early-break key (monotone, so the break is exact).
    # ONE multi-operand lax.sort carries the cluster id and its packed
    # (tri_off, tri_cnt) through the sort: per-row take_along_axis /
    # take gathers on (Gn, MAXC) cost ~55 ms/wave on TPU (measured,
    # BENCH_NOTES round 4) while sort payloads are ~free.
    big_t = jnp.float32(3.0e38)
    order_key = jnp.where(mask, tnear, big_t)
    cid_row = jnp.arange(K, dtype=jnp.int32)
    packed_row = cp.tri_off * jnp.int32(256) + cp.tri_cnt   # cnt <= C < 256
    ops = (order_key,
           jnp.broadcast_to(cid_row, (Gn, K)),
           jnp.broadcast_to(packed_row, (Gn, K)))
    if masked:
        ops = ops + (subbits,)
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    ctn, cand, packed = (x[:, :MAXC] for x in sorted_ops[:3])
    subm = sorted_ops[3][:, :MAXC] if masked else None
    padc = MAXC - ctn.shape[1]
    if padc > 0:  # K smaller than a whole number of bundles
        cand = jnp.concatenate(
            [cand, jnp.zeros((Gn, padc), jnp.int32)], axis=1)
        ctn = jnp.concatenate(
            [ctn, jnp.full((Gn, padc), big_t)], axis=1)
        packed = jnp.concatenate(
            [packed, jnp.zeros((Gn, padc), jnp.int32)], axis=1)
        if masked:
            subm = jnp.concatenate(
                [subm, jnp.zeros((Gn, padc), jnp.int32)], axis=1)
    cand_valid = ctn < big_t
    # zero the count byte of invalid slots (the kernel masks compute on
    # cnt) while keeping the packed table as ONE SMEM load
    packed = jnp.where(cand_valid, packed, 0)
    if masked:
        subm = jnp.where(cand_valid, subm, 0)
    else:
        subm = jnp.zeros((Gn, 1), jnp.int32)   # (Gn,1) dummy, unread
    ncand = jnp.minimum(n_cand, MAXC).astype(jnp.int32)[:, None]

    r6, r8 = cluster_lib.ray_features(os_, ds_)          # (Np,6),(Np,8)
    rays = jnp.concatenate(
        [r6, r8[:, :4], jnp.zeros((Np, NF - 10), jnp.float32)],
        axis=1).reshape(Gn, G, NF)
    # ray layout check: [d, m, -o, 1, pad] matches the feature rows
    tmax_b = ts_.reshape(Gn, G, 1)

    t, prim = _run_kernel(
        cp.feat, cand[:, None, :], packed[:, None, :],
        ctn[:, None, :], subm[:, None, :], ncand[:, None, :], rays, tmax_b,
        any_hit=any_hit, interpret=interpret, sub=sub, bk=break_every)
    t = t.reshape(Np)
    prim = prim.reshape(Np)
    valid = prim >= 0

    # barycentrics post-hoc (ONE row gather + a 2x2 solve) — keeping
    # them out of the kernel saves ~10 full-tile VPU ops per candidate
    if tri_p0 is not None:
        pid = jnp.clip(prim, 0, tri_p0.shape[0] - 1)
        P0 = jnp.take(tri_p0, pid, axis=0)
        E1 = jnp.take(tri_e1, pid, axis=0)
        E2 = jnp.take(tri_e2, pid, axis=0)
        q = os_ + t[:, None] * ds_ - P0
        a11 = jnp.sum(E1 * E1, -1)
        a12 = jnp.sum(E1 * E2, -1)
        a22 = jnp.sum(E2 * E2, -1)
        q1 = jnp.sum(E1 * q, -1)
        q2 = jnp.sum(E2 * q, -1)
        det = a11 * a22 - a12 * a12
        inv = jnp.where(jnp.abs(det) > 1e-20, 1.0 / jnp.where(
            det == 0, 1.0, det), 0.0)
        b1 = jnp.clip((a22 * q1 - a12 * q2) * inv, 0.0, 1.0)
        b2 = jnp.clip((a11 * q2 - a12 * q1) * inv, 0.0, 1.0)
        b1 = jnp.where(valid, b1, 0.0)
        b2 = jnp.where(valid, b2, 0.0)
    else:
        b1 = jnp.zeros(Np)
        b2 = jnp.zeros(Np)

    overflow = n_cand > MAXC                             # (Gn,)
    if fallback is not None:
        ovr = jnp.repeat(overflow, G)                    # (Np,)

        def _run_fb(_):
            t_fb = jnp.where(ovr & (ts_ > 0), ts_, -1.0)
            return fallback(os_, ds_, t_fb)

        def _no_fb(_):
            return Hit(t=ts_, prim=jnp.full((Np,), -1, jnp.int32),
                       b1=jnp.zeros(Np), b2=jnp.zeros(Np),
                       valid=jnp.zeros(Np, bool))

        # runtime-skipped when nothing overflowed (the fallback kernel
        # is only dispatched for waves that actually need it)
        fb = jax.lax.cond(jnp.any(overflow), _run_fb, _no_fb, None)
        use = ovr & fb.valid
        miss_fb = ovr & ~fb.valid
        t = jnp.where(use, fb.t, jnp.where(miss_fb, ts_, t))
        prim = jnp.where(use, fb.prim, jnp.where(miss_fb, -1, prim))
        b1 = jnp.where(use, fb.b1, b1)
        b2 = jnp.where(use, fb.b2, b2)
        valid = jnp.where(ovr, fb.valid, valid)

    unp = ((lambda x: x[:N]) if presorted else
           (lambda x: x[inv_perm][:N]))
    return Hit(t=unp(t), prim=unp(prim), b1=unp(b1), b2=unp(b2),
               valid=unp(valid))
