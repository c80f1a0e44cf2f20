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
    """Returns jitted f(scene, cam, key, pass_idx) -> (L (H,W,3),
    jitter (H,W,2)) with the pixel wavefront sharded over EVERY mesh
    device (dp x tile) and the scene replicated.  Each device traces its
    own row block; the gather back to the full image is the only
    cross-device movement (disjoint tiles -- no reduction, ref P1/P7).

    Wave generation and keying go through render.make_wave_prep with
    row0 = the shard's first row, so a device's rows are sampled
    IDENTICALLY to the single-device chunked driver with
    chunk_rows = H/n_devices -- sharded == unsharded, bit for bit
    (tests/test_multichip.py asserts this)."""
    from ..integrators import render as renderlib

    H, W = sd.film.y_resolution, sd.film.x_resolution
    if cfg is None:
        cfg = renderlib.make_integrator_config(sd)
    n_dev = mesh.devices.size
    assert H % n_dev == 0, f"image rows {H} must divide over {n_dev} devices"
    CH = H // n_dev
    prep, is_realistic = renderlib.make_wave_prep(sd, chunk_rows=CH)

    axes = (meshlib.AXIS_DP, meshlib.AXIS_TILE)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axes)),
        out_specs=(P(axes), P(axes)),
        check_rep=False)
    def pass_rows(scene, cam, key, pass_idx, rows):
        # rows: (CH,) absolute row indices for this shard (contiguous)
        o, d, w, jitter, k, ctx, rtime = prep(cam, key, pass_idx, rows[0])
        beta0 = (jnp.broadcast_to(w[:, None], (w.shape[0], 3))
                 if is_realistic else None)
        L, _ = pathlib_.trace_paths(scene, o, d, k, cfg, beta0=beta0,
                                    sample_ctx=ctx, time=rtime)
        return L.reshape(CH, W, 3), jitter.reshape(CH, W, 2)

    def run(scene, cam, key, pass_idx):
        rows = jnp.arange(H, dtype=jnp.int32)
        return pass_rows(scene, cam, key, jnp.int32(pass_idx), rows)

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
