"""IILE engine unit tests: schedule state machine, probe grid, weights,
hemisphere mapping round trip (the reference has none of these — SURVEY
§4 calls for adding probe-pipeline tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_v3_iile_tpu.integrators import schedule as schedlib
from pbrt_v3_iile_tpu.integrators import iispt as iisptlib
from pbrt_v3_iile_tpu.ops import camera as camlib


def test_schedule_matches_reference_state_machine():
    """(ref: iisptschedulemonitor.cpp:40-80)"""
    tasks = schedlib.compute_schedule(700, 700, 5, radius_start=100.0)
    # radius 100 -> task_size 1000 covers the whole image: 1 task/sweep
    assert tasks[0].x0 == 0 and tasks[0].y0 == 0
    assert tasks[0].x1 == 700 and tasks[0].y1 == 700
    assert tasks[0].tilesize == 100
    # each sweep decays radius by sqrt(0.79541357)
    r = 100.0
    for t in tasks:
        assert t.tilesize == max(1, int(np.floor(r)))
        r *= np.sqrt(0.79541357)


def test_schedule_multi_task_sweep():
    tasks = schedlib.compute_schedule(64, 64, 8, radius_start=4.0)
    # task_size 40 -> 2x2 tasks per sweep
    assert (tasks[0].x0, tasks[0].y0) == (0, 0)
    assert (tasks[1].x0, tasks[1].y0) == (40, 0)
    assert (tasks[2].x0, tasks[2].y0) == (0, 40)
    assert (tasks[3].x0, tasks[3].y0) == (40, 40)
    assert tasks[4].pass_number == 1


def test_probe_coords_clamped():
    coords = np.asarray(iisptlib.task_probe_coords(
        jnp.int32(0), jnp.int32(0), 8, 64, 64))
    G = schedlib.NUMBER_TILES + 1
    assert coords.shape == (G * G, 2)
    # positions multiples of 8, clamped to 63 (image edge)
    assert coords.max() == 63
    # 8 in-range multiples of 8 per row (0..56), the rest clamp to 63
    assert (coords[:, 0] % 8 == 0).sum() == 8 * G


def test_hemi_direction_pixel_roundtrip():
    """generate -> inverse map recovers the pixel (hemispheric.cpp
    GenerateRay vs getLightSampleNn)."""
    H = 16
    pos = jnp.array([[0.0, 0.0, 0.0]])
    nrm = jnp.array([[0.0, 0.0, 1.0]])
    right, up, look = camlib.hemi_frames(pos, nrm)
    d, sin_t = camlib.hemi_directions(H)
    # all directions must be in the hemisphere around the normal
    d_world = (d[None, ..., 0:1] * right[:, None, None, :]
               + d[None, ..., 1:2] * up[:, None, None, :]
               + d[None, ..., 2:3] * look[:, None, None, :])[0]
    assert (np.asarray(d_world[..., 2]) > -1e-5).all()
    # invert pixel centers
    for y in (0, 7, 15):
        for x in (0, 7, 15):
            wi = d_world[y, x][None]
            px, py, ok = camlib.hemi_dir_to_pixel(wi, right, up, look, H)
            assert bool(ok[0])
            assert int(px[0]) == x and int(py[0]) == y


def test_map_lookup_jacobian():
    H = 8
    R = jnp.ones((2, H, H, 3))
    v = iisptlib._map_lookup_jacobian(
        R, jnp.array([0, 1]), jnp.array([0, 4]), jnp.array([4, 0]), H)
    expect0 = np.sin(np.pi * 4.5 / H)
    expect1 = np.sin(np.pi * 0.5 / H)
    assert np.allclose(np.asarray(v[0]), expect0, atol=1e-6)
    assert np.allclose(np.asarray(v[1]), expect1, atol=1e-6)


def test_mis_constants_match_reference():
    # (ref: iisptrenderrunner.cpp:31-34, iisptrenderrunner.h:33)
    assert abs(iisptlib.LIGHT_PDF - 1.0 / 6.28) < 1e-9
    assert iisptlib.BSDF_RATIO == 0.4394
    assert iisptlib.EM_RATIO == 1.098
    assert iisptlib.HEMISPHERIC_IMPORTANCE_SAMPLES == 16
