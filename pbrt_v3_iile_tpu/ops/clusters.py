"""Triangle clustering for MXU-dense intersection.

The TPU-native answer to divergent BVH traversal (see BENCH_NOTES.md
"Path to the 100 Mrays/s target"): instead of chasing per-ray node
pointers (no hardware gather), group triangles into fixed-size clusters
cut from BVH subtrees, cull clusters per ray-group against their AABBs,
and test ray x cluster pairs DENSELY — the Moller-Trumbore/Pluecker
side tests are bilinear in (ray features, triangle features), i.e. a
(rays, F) @ (F, 3*C) matmul per candidate cluster that the MXU eats.

Replaces the role of the reference's fine BVH levels + per-leaf tests
(ref: accelerators/bvh.cpp:662 Intersect inner loop,
shapes/triangle.cpp:188); the coarse levels survive as a small cluster
tree whose packet-union walk stays cheap.

This module provides the host-side build (cluster cuts, features) and a
vectorized jnp evaluator (`intersect_clusters_dense`) used as the
correctness reference and as the building block of the staged
group-vs-candidates pipeline.

Pluecker ray-triangle test (Shevtsov et al. style, re-derived):
  ray R = (o, d); m = o x d  (moment).
  For an edge from a to b: L = (b - a, a x b).
  side(R, L) = d . (a x b) + m . (b - a)
  The three edge sides w0,w1,w2 share a sign iff the ray passes through
  the triangle; w_i are proportional to the barycentric numerators and
  sum to the (signed) double area projection, so u = w1/sum, v = w2/sum.
  t from the plane: t = (n . p0 - n . o) / (n . d).

  side is BILINEAR: [d, m] (6,) . [a x b, b - a] (6,) — so for a whole
  cluster, W = Rfeat (N,6) @ Efeat (6, 3C).  t needs n.o, n.d: another
  (N,6) @ (6, C) with rays [o,d] against [n*? ...] — packed below.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

CLUSTER_SIZE = 64


class ClusterSet(NamedTuple):
    """Device-side cluster tables (triangles in BVH order)."""
    n_clusters: int
    tri_off: jnp.ndarray      # (K,) i32 first triangle (BVH order)
    tri_cnt: jnp.ndarray      # (K,) i32 triangle count (<= CLUSTER_SIZE)
    aabb_min: jnp.ndarray     # (K,3) f32
    aabb_max: jnp.ndarray     # (K,3) f32
    # dense per-cluster features, padded to CLUSTER_SIZE:
    edge_feat: jnp.ndarray    # (K, 6, 3*C) f32: per edge [axb ; b-a]
    plane_feat: jnp.ndarray   # (K, 8, C) f32: rows [n, n.p0, -n, 0, 0]
                              # so [o,1,d,0] (8,) . col = n.p0 - n.o  and
                              # [0,0,n? ...]  (see ray_features)


def _subtree_ranges(flat, max_tris=CLUSTER_SIZE):
    """Cut the binary BVH into disjoint subtrees of <= max_tris prims.
    Returns list of (prim_offset, prim_count) in BVH prim order."""
    # compute subtree prim ranges by walking: leaves carry
    # (offset, count); interior = union of children (prims are laid out
    # contiguously per subtree by the builder)
    M = flat.node_min.shape[0]
    lo = np.full(M, np.iinfo(np.int32).max, np.int64)
    hi = np.full(M, -1, np.int64)
    # children come after parent; iterate in reverse so children resolve
    # before parents
    first_child = np.arange(M) + 1
    for i in range(M - 1, -1, -1):
        if flat.node_count[i] > 0:
            lo[i] = flat.node_right[i]
            hi[i] = flat.node_right[i] + flat.node_count[i]
        else:
            l, r = first_child[i], flat.node_right[i]
            lo[i] = min(lo[l], lo[r])
            hi[i] = max(hi[l], hi[r])

    out = []

    def cut(i):
        if hi[i] - lo[i] <= max_tris or flat.node_count[i] > 0:
            out.append((int(lo[i]), int(hi[i] - lo[i])))
            return
        cut(first_child[i])
        cut(int(flat.node_right[i]))

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, int(flat.max_depth) * 4 + 100))
    try:
        cut(0)
    finally:
        sys.setrecursionlimit(old)
    return out


def build_clusters(flat, tri_p0, tri_e1, tri_e2,
                   max_tris: int = CLUSTER_SIZE) -> ClusterSet:
    """Host-side build from the flattened BVH + triangle soup (all in
    BVH prim order).  tri_*: (T,3) float arrays."""
    ranges = _subtree_ranges(flat, max_tris)
    K = len(ranges)
    C = max_tris
    off = np.zeros(K, np.int32)
    cnt = np.zeros(K, np.int32)
    amin = np.zeros((K, 3), np.float32)
    amax = np.zeros((K, 3), np.float32)
    ef = np.zeros((K, 6, 3 * C), np.float32)
    pf = np.zeros((K, 8, C), np.float32)

    p0 = np.asarray(tri_p0, np.float64)
    e1 = np.asarray(tri_e1, np.float64)
    e2 = np.asarray(tri_e2, np.float64)
    p1 = p0 + e1
    p2 = p0 + e2
    n = np.cross(e1, e2)

    for k, (o, c) in enumerate(ranges):
        off[k] = o
        cnt[k] = c
        pts = np.concatenate([p0[o:o + c], p1[o:o + c], p2[o:o + c]])
        amin[k] = pts.min(0)
        amax[k] = pts.max(0)
        for j in range(c):
            t = o + j
            verts = (p0[t], p1[t], p2[t])
            for e in range(3):
                a, b = verts[e], verts[(e + 1) % 3]
                ef[k, 0:3, e * C + j] = np.cross(a, b)
                ef[k, 3:6, e * C + j] = b - a
            pf[k, 0:3, j] = n[t]
            pf[k, 3, j] = np.dot(n[t], p0[t])
            pf[k, 4:7, j] = n[t]
    return ClusterSet(
        n_clusters=K,
        tri_off=jnp.asarray(off), tri_cnt=jnp.asarray(cnt),
        aabb_min=jnp.asarray(amin), aabb_max=jnp.asarray(amax),
        edge_feat=jnp.asarray(ef), plane_feat=jnp.asarray(pf))


def ray_features(o, d):
    """(N,3),(N,3) -> (r6 (N,6) pluecker [d ; o x d], r8 (N,8) plane
    [-o ; 1 ; d ; 0])."""
    m = jnp.cross(o, d)
    r6 = jnp.concatenate([d, m], axis=-1)
    r8 = jnp.concatenate(
        [-o, jnp.ones(o.shape[:-1] + (1,), o.dtype), d,
         jnp.zeros(o.shape[:-1] + (1,), o.dtype)], axis=-1)
    return r6, r8


def intersect_clusters_dense(cs: ClusterSet, cluster_ids, o, d, t_max,
                             precision=None):
    """Test every ray against every listed cluster, densely.

    cluster_ids: (Kc,) i32.  o, d: (N,3).  Returns (t, prim, b1, b2,
    valid) with prim a GLOBAL BVH-order triangle index.  The heavy ops
    are two matmuls per call: (N,6)@(6,3C*Kc) and (N,8)@(8,C*Kc)."""
    C = cs.edge_feat.shape[2] // 3
    ef = jnp.take(cs.edge_feat, cluster_ids, axis=0)   # (Kc,6,3C)
    pf = jnp.take(cs.plane_feat, cluster_ids, axis=0)  # (Kc,8,C)
    offs = jnp.take(cs.tri_off, cluster_ids)           # (Kc,)
    cnts = jnp.take(cs.tri_cnt, cluster_ids)
    Kc = ef.shape[0]

    r6, r8 = ray_features(o, d)
    W = jnp.einsum("nf,kfe->nke", r6, ef,
                   precision=precision)                # (N,Kc,3C)
    W = W.reshape(W.shape[0], Kc, 3, C)
    w0, w1, w2 = W[:, :, 0], W[:, :, 1], W[:, :, 2]
    # plane terms: r8 . [n, n.p0, n, 0] -> num = n.p0 - n.o ; den = n.d
    P = jnp.einsum("nf,kfc->nkc", r8[:, :4], pf[:, :4],
                   precision=precision)                # num (N,Kc,C)
    D = jnp.einsum("nf,kfc->nkc", r8[:, 4:7], pf[:, 4:7],
                   precision=precision)                # n.d (via d rows)
    t = P / jnp.where(jnp.abs(D) > 1e-12, D, jnp.where(D >= 0, 1e-12,
                                                       -1e-12))
    s = w0 + w1 + w2
    same_side = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | \
        ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
    lane = jnp.arange(C)[None, None, :]
    ok = (same_side & (jnp.abs(s) > 1e-12) & (jnp.abs(D) > 1e-12)
          & (t > 1e-5) & (t < t_max[:, None, None])
          & (lane < cnts[None, :, None]))
    t_ok = jnp.where(ok, t, jnp.inf)
    flat = t_ok.reshape(t_ok.shape[0], -1)
    best = jnp.argmin(flat, axis=1)
    tbest = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    kbest = best // C
    jbest = best % C
    valid = jnp.isfinite(tbest)
    prim = jnp.where(valid, jnp.take(offs, kbest) + jbest, -1)
    # barycentrics from the side terms of the winning triangle
    wsel = lambda w: jnp.take_along_axis(
        w.reshape(w.shape[0], -1), best[:, None], axis=1)[:, 0]
    ssel = wsel(s)
    inv_s = jnp.where(jnp.abs(ssel) > 1e-12, 1.0 / ssel, 0.0)
    b1 = jnp.abs(wsel(w2) * inv_s)
    b2 = jnp.abs(wsel(w0) * inv_s)
    return (jnp.where(valid, tbest, t_max), prim, b1, b2, valid)
