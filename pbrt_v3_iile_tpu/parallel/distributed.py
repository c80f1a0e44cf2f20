"""Multi-host process-group setup (SURVEY P4 / §5 "distributed comm
backend"): the reference fans out with fork/exec + MOD/MATCH env sharding
(ref: iispt.cpp:479-505, tools/multiprocess_reference.py); the TPU-native
replacement is one `jax.distributed.initialize` process group per host,
after which `jax.devices()` spans every chip of every host and the
existing mesh/shard_map code paths scale unchanged (collectives ride ICI
within a slice and DCN across hosts — XLA routes them from the mesh).

Launch pattern (one process per host):
    PBRT_COORDINATOR=host0:8476 PBRT_NUM_PROCESSES=4 PBRT_PROCESS_ID=$i \
        python -m pbrt_v3_iile_tpu.cli.main scene.pbrt out.exr --multihost
On Cloud TPU pods the three values are auto-detected by jax.distributed
and the env vars can be omitted.
"""

from __future__ import annotations

import os


_INITIALIZED = False


def maybe_initialize(coordinator: str = None, num_processes: int = None,
                     process_id: int = None) -> bool:
    """Initialize the cross-host process group.  Arguments fall back to
    PBRT_COORDINATOR / PBRT_NUM_PROCESSES / PBRT_PROCESS_ID, then to
    jax.distributed's own auto-detection (TPU pod metadata).  Returns
    True when a multi-process group is active; safe to call repeatedly
    and a no-op for single-process runs with no configuration."""
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("PBRT_COORDINATOR")
    if num_processes is None and os.environ.get("PBRT_NUM_PROCESSES"):
        num_processes = int(os.environ["PBRT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("PBRT_PROCESS_ID"):
        process_id = int(os.environ["PBRT_PROCESS_ID"])

    if coordinator is None and num_processes is None:
        # nothing configured: single-process (auto-detection is only
        # attempted when the caller explicitly asked for multihost with
        # a coordinator, to keep plain CLI runs hermetic)
        _INITIALIZED = True
        return False

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True
    return jax.process_count() > 1


def process_info() -> dict:
    import jax

    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=len(jax.local_devices()),
                global_devices=len(jax.devices()))
