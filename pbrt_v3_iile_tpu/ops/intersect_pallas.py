"""Pallas TPU packet-traversal kernel for BVH intersection.

Design rationale (vs the XLA gather traversal in intersect.py): the TPU
VPU has no hardware gather, so per-ray divergent node fetches are the
bottleneck.  This kernel uses *packet traversal*: each grid program owns
a 1024-ray packet (one native 8x128 vector tile per component); the
traversal stack holds SCALAR node ids in SMEM shared by the packet; node
AABB and leaf-triangle data are scalar rows read from a VMEM-resident
scene (nodes (M,8) + tris (T,12) both live in VMEM — fine up to ~100k
triangles ≈ 8 MB) and broadcast against the whole packet in one VPU op.
No gathers anywhere.  The per-packet node visit count is the union of
its rays' visits, so callers should feed coherent packets (primary rays
and probe rays are naturally coherent; bounce rays benefit from the
octant sort in sort_rays_by_octant).

Replaces the hot loop of the reference renderer
(ref: src/accelerators/bvh.cpp:662 BVHAccel::Intersect,
src/shapes/triangle.cpp:188) — see ops/bvh.py for the builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

PACKET = 1024            # rays per grid program: one (8, 128) tile
SUB, LANE = 8, 128
STACK = 96
VMEM_SCENE_LIMIT = 220_000  # max triangles for VMEM-resident mode
MAX_PACKETS_PER_CALL = 64   # bound single-kernel runtime (the remote
                            # TPU worker is unstable under long kernels)


def _traverse_packet(nodes_ref, bounds_ref, tris_ref, o, d, t0, stack,
                     *, any_hit):
    """One packet vs the whole BVH.  o, d: 3-tuples of (SUB, LANE)
    values; t0 (SUB, LANE).  Returns (t, prim, b1, b2)."""
    inv = tuple(
        jnp.where(jnp.abs(dc) > 1e-12,
                  1.0 / jnp.where(dc == 0.0, 1.0, dc),
                  jnp.where(dc >= 0.0, 1e30, -1e30))
        for dc in d)

    prim0 = jnp.full((SUB, LANE), -1, jnp.int32)
    z = jnp.zeros((SUB, LANE), jnp.float32)

    def cond(carry):
        node, sp, t, prim, b1, b2 = carry
        return node >= 0

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def _col(ref, idx, rows):
        """Fetch column idx of a lane-major (rows, Mp) VMEM ref: load the
        aligned 128-lane block and mask-reduce (dynamic lane indexing
        must be 128-aligned on TPU).  Returns (rows, 1)."""
        base = pl.multiple_of((idx // LANE) * LANE, LANE)
        blk = ref[:, pl.ds(base, LANE)]           # (rows, 128)
        m = lane_iota == (idx - base)
        return jnp.sum(jnp.where(m, blk, 0), axis=1, keepdims=True)

    def body(carry):
        node, sp, t, prim, b1, b2 = carry
        ndb = _col(bounds_ref, node, 8)           # (8, 1) f32
        ndr = _col(nodes_ref, node, 8)            # (8, 1) i32
        ndf = lambda k: ndb[k:k + 1, :]           # (1, 1) broadcastable
        nmin = (ndf(0), ndf(1), ndf(2))
        nmax = (ndf(3), ndf(4), ndf(5))
        nright = ndr[6, 0]
        meta = ndr[7, 0]
        ncount = meta >> 2
        naxis = meta & 3

        # vector slab test against scalar box
        tnear = jnp.full((SUB, LANE), 0.0, jnp.float32)
        tfar = t
        for c in range(3):
            lo = (nmin[c] - o[c]) * inv[c]
            hi = (nmax[c] - o[c]) * inv[c]
            tnear = jnp.maximum(tnear, jnp.minimum(lo, hi))
            tfar = jnp.minimum(tfar, jnp.maximum(lo, hi) * 1.0000004)
        box_hit = tnear <= tfar
        live = prim < 0 if any_hit else jnp.full_like(box_hit, True)
        hit_any = jnp.any(box_hit & live)

        is_leaf = ncount > 0

        # ---- leaf: up to 4 triangles, scalar rows broadcast ----
        def leaf_tri(k, st):
            t, prim, b1, b2 = st
            trr = _col(tris_ref, nright + k, 12)     # (12, 1)
            tr = lambda j: trr[j:j + 1, :]           # (1, 1)
            p0 = (tr(0), tr(1), tr(2))
            e1 = (tr(3), tr(4), tr(5))
            e2 = (tr(6), tr(7), tr(8))
            # Moller-Trumbore with scalar triangle, vector rays
            pvx = d[1] * e2[2] - d[2] * e2[1]
            pvy = d[2] * e2[0] - d[0] * e2[2]
            pvz = d[0] * e2[1] - d[1] * e2[0]
            det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
            invd = jnp.where(jnp.abs(det) > 1e-12,
                             1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
            tvx = o[0] - p0[0]
            tvy = o[1] - p0[1]
            tvz = o[2] - p0[2]
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
            qvx = tvy * e1[2] - tvz * e1[1]
            qvy = tvz * e1[0] - tvx * e1[2]
            qvz = tvx * e1[1] - tvy * e1[0]
            v = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * invd
            tt = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * invd
            ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (tt > 0.0) & (tt < t) & (k < ncount)
                  & box_hit)
            t = jnp.where(ok, tt, t)
            prim = jnp.where(ok, nright + k, prim)
            b1 = jnp.where(ok, u, b1)
            b2 = jnp.where(ok, v, b2)
            return (t, prim, b1, b2)

        def do_leaf(st):
            return jax.lax.fori_loop(0, 4, leaf_tri, st)

        t, prim, b1, b2 = jax.lax.cond(
            hit_any & is_leaf, do_leaf, lambda st: st, (t, prim, b1, b2))

        # ---- control flow: descend / push / pop (all scalar) ----
        go_in = hit_any & jnp.logical_not(is_leaf)
        # majority direction sign picks near child
        neg_cnt = jnp.sum(
            jnp.where(
                jax.lax.switch(naxis,
                               [lambda: d[0], lambda: d[1], lambda: d[2]])
                < 0.0, 1, 0))
        neg = neg_cnt > (SUB * LANE // 2)
        first = node + 1
        near = jnp.where(neg, nright, first)
        far = jnp.where(neg, first, nright)

        push_sp = jnp.minimum(sp, STACK - 1)

        @pl.when(go_in)
        def _():
            stack[push_sp] = far

        sp = jnp.where(go_in, push_sp + 1, sp)

        can_pop = sp > 0
        pop_sp = jnp.maximum(sp - 1, 0)
        popped = stack[pop_sp]
        early_out = False
        if any_hit:
            early_out = jnp.logical_not(jnp.any(prim < 0))
        nxt = jnp.where(go_in, near,
                        jnp.where(can_pop, popped, -1))
        nxt = jnp.where(early_out, -1, nxt) if any_hit else nxt
        sp = jnp.where(go_in, sp, jnp.where(can_pop, pop_sp, sp))
        return (nxt, sp, t, prim, b1, b2)

    node, sp, t, prim, b1, b2 = jax.lax.while_loop(
        cond, body, (0, 0, t0, prim0, z, z))
    return t, prim, b1, b2


def _traverse_kernel(nodes_hbm, bounds_hbm, tris_hbm, ox, oy, oz, dx, dy,
                     dz, tmax_hbm, t_out, prim_out, b1_out, b2_out,
                     *, any_hit, n_pack):
    """Gridless kernel; ALL operands live in HBM (XLA operand staging in
    VMEM both double-buffers and overlaps calls, blowing the 16MB scoped
    limit).  Scene + per-packet ray tiles are DMA'd into run_scoped VMEM
    (scoped allocations are live only inside this kernel, so two kernels
    in one program don't stack)."""

    def body(nodes_ref, bounds_ref, tris_ref, rays_vm, res_vm, res_i_vm,
             stack, sems):
        cp_n = pltpu.make_async_copy(nodes_hbm, nodes_ref, sems.at[0])
        cp_b = pltpu.make_async_copy(bounds_hbm, bounds_ref, sems.at[1])
        cp_t = pltpu.make_async_copy(tris_hbm, tris_ref, sems.at[2])
        cp_n.start()
        cp_b.start()
        cp_t.start()
        cp_n.wait()
        cp_b.wait()
        cp_t.wait()

        ins = (ox, oy, oz, dx, dy, dz, tmax_hbm)

        def packet_body(pk, _):
            for j in range(7):
                pltpu.make_async_copy(ins[j].at[pk], rays_vm.at[j],
                                      sems.at[3 + j]).start()
            for j in range(7):
                pltpu.make_async_copy(ins[j].at[pk], rays_vm.at[j],
                                      sems.at[3 + j]).wait()
            o = (rays_vm[0], rays_vm[1], rays_vm[2])
            d = (rays_vm[3], rays_vm[4], rays_vm[5])
            t, prim, b1, b2 = _traverse_packet(
                nodes_ref, bounds_ref, tris_ref, o, d, rays_vm[6], stack,
                any_hit=any_hit)
            res_vm[0] = t
            res_vm[1] = b1
            res_vm[2] = b2
            res_i_vm[0] = prim
            cps = [
                pltpu.make_async_copy(res_vm.at[0], t_out.at[pk],
                                      sems.at[10]),
                pltpu.make_async_copy(res_vm.at[1], b1_out.at[pk],
                                      sems.at[11]),
                pltpu.make_async_copy(res_vm.at[2], b2_out.at[pk],
                                      sems.at[12]),
                pltpu.make_async_copy(res_i_vm.at[0], prim_out.at[pk],
                                      sems.at[13]),
            ]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            return 0

        jax.lax.fori_loop(0, n_pack, packet_body, 0)

    M = nodes_hbm.shape[1]
    T = tris_hbm.shape[1]
    pl.run_scoped(
        body,
        pltpu.VMEM((8, M), jnp.int32),
        pltpu.VMEM((8, M), jnp.float32),
        pltpu.VMEM((12, T), jnp.float32),
        pltpu.VMEM((7, SUB, LANE), jnp.float32),
        pltpu.VMEM((3, SUB, LANE), jnp.float32),
        pltpu.VMEM((1, SUB, LANE), jnp.int32),
        pltpu.SMEM((STACK,), jnp.int32),
        pltpu.SemaphoreType.DMA((14,)),
    )


def intersect_bvh_pallas(scene, o, d, t_max, any_hit: bool = False,
                         interpret: bool = False) -> Hit:
    """Drop-in replacement for intersect.intersect_bvh (triangles only).

    Large waves are split over several pallas_calls of at most
    MAX_PACKETS_PER_CALL packets so the per-call VMEM footprint (scene +
    staged ray blocks) stays under the 16MB scoped limit."""
    N = o.shape[0]
    max_call = MAX_PACKETS_PER_CALL * PACKET
    if N > max_call:
        hits = []
        token = o[:1]
        for s0 in range(0, N, max_call):
            s1 = min(s0 + max_call, N)
            # optimization_barrier serializes the chunk kernels: two
            # concurrent kernels would double the scene's VMEM residency
            oc, dc, tc, _ = jax.lax.optimization_barrier(
                (o[s0:s1], d[s0:s1], t_max[s0:s1], token))
            h = intersect_bvh_pallas(scene, oc, dc, tc, any_hit=any_hit,
                                     interpret=interpret)
            token = h.t[:1]
            hits.append(h)
        return Hit(
            t=jnp.concatenate([h.t for h in hits]),
            prim=jnp.concatenate([h.prim for h in hits]),
            b1=jnp.concatenate([h.b1 for h in hits]),
            b2=jnp.concatenate([h.b2 for h in hits]),
            valid=jnp.concatenate([h.valid for h in hits]),
        )
    n_pack = max(1, -(-N // PACKET))
    Np = n_pack * PACKET
    pad = Np - N

    def shape2(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x
        return x.reshape(n_pack, SUB, LANE)

    ox = shape2(o[:, 0], 0.0)
    oy = shape2(o[:, 1], 0.0)
    oz = shape2(o[:, 2], 0.0)
    dx = shape2(d[:, 0], 1.0)
    dy = shape2(d[:, 1], 0.0)
    dz = shape2(d[:, 2], 0.0)
    tm = shape2(t_max, -1.0)  # padded rays: tmax<0 -> no hits

    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    kernel = functools.partial(_traverse_kernel, any_hit=any_hit,
                               n_pack=n_pack)

    out_shapes = [
        jax.ShapeDtypeStruct((n_pack, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_pack, SUB, LANE), jnp.int32),
        jax.ShapeDtypeStruct((n_pack, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_pack, SUB, LANE), jnp.float32),
    ]
    M = scene.nodes_packed.shape[0]
    T = scene.tris_packed.shape[0]

    t, prim, b1, b2 = pl.pallas_call(
        kernel,
        in_specs=[hbm_spec] * 10,
        out_specs=[hbm_spec] * 4,
        out_shape=out_shapes,
        interpret=interpret,
    )(scene.nodes_t, scene.bounds_t, scene.tris_t,
      ox, oy, oz, dx, dy, dz, tm)

    t = t.reshape(-1)[:N]
    prim = prim.reshape(-1)[:N]
    b1 = b1.reshape(-1)[:N]
    b2 = b2.reshape(-1)[:N]
    return Hit(t=jnp.where(prim >= 0, t, t_max), prim=prim, b1=b1, b2=b2,
               valid=prim >= 0)


def sort_rays_by_octant(o, d):
    """Coherence sort for bounce rays: order by direction octant so
    packets traverse similar node sets.  Returns (perm, inv_perm)."""
    oct_id = ((d[:, 0] < 0).astype(jnp.int32)
              + 2 * (d[:, 1] < 0).astype(jnp.int32)
              + 4 * (d[:, 2] < 0).astype(jnp.int32))
    perm = jnp.argsort(oct_id)
    inv = jnp.argsort(perm)
    return perm, inv
