"""Packaging tests (the tools/autopackage.py role; scripts/package.py)."""

import os
import subprocess
import sys


def test_bundle_builds_and_launcher_runs(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    try:
        import package as pkg
    finally:
        sys.path.pop(0)
    out = pkg.build_bundle(str(tmp_path / "bundle"))
    for launcher in ("pbrt", "pbrt-gui", "pbrt-tools", "imgtool",
                     "obj2pbrt", "cyhair2pbrt"):
        p = os.path.join(out, launcher)
        assert os.path.exists(p) and os.access(p, os.X_OK), launcher
    assert os.path.isdir(os.path.join(out, "lib", "pbrt_v3_iile_tpu"))
    # launcher shim resolves the bundled lib (no repo on PYTHONPATH)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run([os.path.join(out, "imgtool"), "--help"],
                       capture_output=True, text=True, timeout=120,
                       env=env)
    # imgtool prints usage and exits 1 for --help (matching the
    # reference imgtool's usage() behavior) — either is a live launcher
    assert r.returncode in (0, 1)
    assert "imgtool" in (r.stdout + r.stderr)


def test_console_scripts_declared():
    import tomllib

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        cfg = tomllib.load(f)
    scripts = cfg["project"]["scripts"]
    assert "pbrt-iile" in scripts and "pbrt-iile-gui" in scripts
    # each entry point resolves to an importable module with main()
    import importlib
    for target in scripts.values():
        mod, fn = target.split(":")
        m = importlib.import_module(mod)
        assert callable(getattr(m, fn)), target
