"""Sharded render + training steps over the device mesh.

Mappings (SURVEY §2.6):
  P1 tile data-parallelism   -> image rows sharded over AXIS_TILE
  P3 CNN child processes     -> in-graph net, batch over AXIS_DP
  P7 shared mutable film     -> per-shard film rows, no mutation
  P8 training data-parallel  -> batch over mesh, grads all-reduced (psum
                                inserted by XLA from shardings)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import camera as camlib
from ..ops import samplers as smplr
from . import mesh as meshlib
from ..integrators import path as pathlib_


def sharded_render_pass(sd, mesh, cfg=None):
    """Returns jitted f(scene, cam, key, pass_idx) -> L (H, W, 3) with the
    pixel wavefront sharded over EVERY mesh device (dp x tile) and scene
    replicated.  Each device traces its own rows; the gather back to the
    full image is the only cross-device movement (disjoint tiles — no
    reduction needed, ref P1/P7)."""
    H, W = sd.film.y_resolution, sd.film.x_resolution
    if cfg is None:
        from ..integrators import render as renderlib
        cfg = renderlib.make_integrator_config(sd)
    cam_kind = camlib.KIND.get(sd.camera.kind, 0)
    n_dev = mesh.devices.size
    assert H % n_dev == 0, f"image rows {H} must divide over {n_dev} devices"

    axes = (meshlib.AXIS_DP, meshlib.AXIS_TILE)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axes)),
        out_specs=P(axes),
        check_rep=False)
    def pass_rows(scene, cam, key, rows):
        # rows: (H_local,) absolute row indices for this shard
        h_local = rows.shape[0]
        px = jnp.arange(W, dtype=jnp.float32)
        gx = jnp.broadcast_to(px[None, :], (h_local, W))
        gy = jnp.broadcast_to(rows.astype(jnp.float32)[:, None], (h_local, W))
        pix = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
        # per-shard key: fold in first row so shards decorrelate
        k = jax.random.fold_in(key, rows[0])
        kj = smplr.wave_key(k, 0, 0, smplr.DIM_PIXEL_JITTER)
        jitter = smplr.uniform(kj, pix.shape)
        if cam_kind == 3:  # realistic lens system
            kl = smplr.wave_key(k, 0, 0, smplr.DIM_LENS)
            u_lens = smplr.uniform(kl, pix.shape)
            o, d, w = camlib.realistic_generate_rays(cam, pix + jitter,
                                                     u_lens)
            beta0 = jnp.broadcast_to(w[:, None], (w.shape[0], 3))
        else:
            o, d = camlib.generate_rays(cam, pix + jitter, kind=cam_kind)
            beta0 = None
        L, _ = pathlib_.trace_paths(scene, o, d, k, cfg, beta0=beta0)
        return L.reshape(h_local, W, 3)

    def run(scene, cam, key, pass_idx):
        rows = jnp.arange(H, dtype=jnp.int32)
        k = jax.random.fold_in(key, pass_idx)
        return pass_rows(scene, cam, k, rows)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# sharded training step (U-Net, data-parallel over the mesh)
# ---------------------------------------------------------------------------

def make_train_step(net, optimizer, mesh, loss: str = "l1"):
    """Data-parallel train step: batch sharded over (dp, tile), params
    replicated, gradient all-reduce inserted by XLA over ICI (P8).

    loss: 'l1' (reference default, ml/main_train.py:23), 'rel_l1' or
    'rel_mse' (ref: ml/iispt_loss.py)."""
    from ..ml import losses as losslib

    batch_sharding = meshlib.shard_batch(mesh)
    rep = meshlib.replicated(mesh)
    loss_f = losslib.get(loss)

    def loss_fn(params, batch_stats, x, y):
        out, updates = net.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        return loss_f(out, y), updates["batch_stats"]

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, x, y):
        x = jax.lax.with_sharding_constraint(x, batch_sharding)
        y = jax.lax.with_sharding_constraint(y, batch_sharding)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        params = jax.lax.with_sharding_constraint(params, rep)
        return params, new_stats, opt_state, loss

    return step
