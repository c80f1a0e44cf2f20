#!/bin/sh
# Build the REFERENCE renderer (pbrt-v3-IILE) as a parity oracle.
#
# The reference checkout cannot build as-is: its ext/ submodules (glog,
# openexr, zlib, ptex, rapidjson) are empty.  This harness builds the
# core + all non-IISPT integrators against SYSTEM zlib + OpenEXR 3 with
# a minimal glog stub; the iispt integrator family (needs rapidjson +
# the stdio NN bridge) and ptex (needs ext Ptex) are excluded and their
# api.cpp entry points patched to error out.  See patch_oracle.py for
# the exact (small) source diffs applied to a COPY of the reference.
#
# Usage: sh scripts/oracle/build_oracle.sh [workdir]   (default /tmp/oracle)
set -e
WORK=${1:-/tmp/oracle}
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
mkdir -p "$WORK/stub/glog"
if [ ! -d "$WORK/src" ]; then
  cp -r "$REF/src" "$WORK/src"
  chmod -R u+w "$WORK/src"
fi
cp "$HERE/glog_logging_stub.h" "$WORK/stub/glog/logging.h"
cp "$HERE/Makefile.oracle" "$WORK/Makefile"
python3 "$HERE/patch_oracle.py" "$WORK/src"
make -C "$WORK" -j"$(nproc)"
echo "oracle binary: $WORK/pbrt"
