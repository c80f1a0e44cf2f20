"""Portable-bundle builder (the tools/autopackage.py role, ref:
tools/autopackage.py — which bundled the compiled renderer, ml/ and a
nodejs launcher into a relocatable directory).

Here the whole framework is a pure-Python package + one optional native
helper, so the portable bundle is: a wheel-less source tree copy with
launcher shims, ready to run on any machine with the baked-in JAX stack.

Usage: python scripts/package.py [outdir]
"""

from __future__ import annotations

import os
import shutil
import stat
import sys


LAUNCHERS = {
    "pbrt": "pbrt_v3_iile_tpu.cli.main",
    "pbrt-gui": "pbrt_v3_iile_tpu.cli.gui",
    "pbrt-tools": "pbrt_v3_iile_tpu.cli.tools",
    "imgtool": "pbrt_v3_iile_tpu.cli.imgtool",
    "obj2pbrt": "pbrt_v3_iile_tpu.cli.obj2pbrt",
    "cyhair2pbrt": "pbrt_v3_iile_tpu.cli.cyhair2pbrt",
}

_SHIM = """#!/bin/sh
# relocatable launcher (autopackage.py role): resolve the bundle root
HERE="$(cd "$(dirname "$0")" && pwd)"
PYTHONPATH="$HERE/lib${{PYTHONPATH:+:$PYTHONPATH}}" exec python3 -m {mod} "$@"
"""


def build_bundle(outdir: str, repo_root: str | None = None) -> str:
    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(outdir, exist_ok=True)
    lib = os.path.join(outdir, "lib")
    pkg_src = os.path.join(repo_root, "pbrt_v3_iile_tpu")
    pkg_dst = os.path.join(lib, "pbrt_v3_iile_tpu")
    if os.path.isdir(pkg_dst):
        shutil.rmtree(pkg_dst)
    shutil.copytree(pkg_src, pkg_dst,
                    ignore=shutil.ignore_patterns("__pycache__", "*.so"))
    for name, mod in LAUNCHERS.items():
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            f.write(_SHIM.format(mod=mod))
        os.chmod(path, os.stat(path).st_mode
                 | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    for doc in ("README.md", "docs/ARCHITECTURE.md", "docs/PARITY.md"):
        src = os.path.join(repo_root, doc)
        if os.path.exists(src):
            dst = os.path.join(outdir, os.path.basename(doc))
            shutil.copyfile(src, dst)
    return outdir


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out = argv[0] if argv else "dist/pbrt-v3-iile-tpu"
    path = build_bundle(out)
    n = sum(len(f) for _, _, f in os.walk(path))
    print(f"bundle at {path} ({n} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
