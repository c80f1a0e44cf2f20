#!/bin/bash
# Run a python command on the CPU backend with the TPU relay plugin fully
# disabled (the container's sitecustomize dials the TPU relay from EVERY
# python process otherwise, and a wedged relay hangs interpreter startup).
# Usage: ./run_cpu.sh python -m pytest tests/ -x -q
exec env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
    -u AXON_LOOPBACK_RELAY -u PYTHONPATH \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
    "$@"
