"""Web GUI tests: the application that consumes the IILE control
protocol (ref: gui/main.js + gui/static/root.js — Electron there, a
localhost web app here).  Drives the real server + a real renderer
subprocess headlessly."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.status, r.read()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, r.read()


def test_gui_serves_index_and_status():
    from pbrt_v3_iile_tpu.cli import gui

    server = gui.make_server(port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        code, body = _get(port, "/")
        assert code == 200 and b"IILE" in body
        code, body = _get(port, "/status")
        st = json.loads(body)
        assert st["running"] is False
        assert st["progress"]["finished"] is False
    finally:
        server.shutdown()


def test_gui_tonemap_endpoint(tmp_path):
    """image endpoint tonemaps a control-dir PFM (the cpfm role)."""
    from pbrt_v3_iile_tpu.cli import gui
    from pbrt_v3_iile_tpu.utils import image as imglib

    server = gui.make_server(port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        server.session.control_dir = str(tmp_path)
        img = np.random.default_rng(0).uniform(
            0, 2, (16, 16, 3)).astype(np.float32)
        imglib.write_pfm(str(tmp_path / "out_combined.pfm"), img)
        code, body = _get(port, "/image/combined.png?exposure=0")
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        # exposure changes the tonemap
        _, body2 = _get(port, "/image/combined.png?exposure=3")
        assert body2 != body
        # gain control file written (Doc.md "GUI" control_gain_XXX)
        _post(port, "/gain", {"gain": 2.0})
        assert any(f.startswith("control_gain_")
                   for f in os.listdir(tmp_path))
    finally:
        server.shutdown()


@pytest.mark.slow
def test_gui_end_to_end_render(tmp_path):
    """Full loop: /start spawns the renderer with --iileControl, tokens
    drive progress, PFMs land, /image serves the result."""
    from pbrt_v3_iile_tpu.cli import gui

    scene = tmp_path / "scene.pbrt"
    scene.write_text("""
LookAt 0 1 -4  0 1 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Integrator "iispt" "integer maxdepth" [2]
WorldBegin
LightSource "point" "color I" [10 10 10] "point from" [0 3 -1]
Material "matte" "color Kd" [0.6 0.3 0.2]
Shape "trianglemesh" "point P" [-5 0 -5 5 0 -5 5 0 5 -5 0 5]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
""")
    server = gui.make_server(port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        _post(port, "/start", {"scene": str(scene), "indirect": 1,
                               "direct": 1,
                               "extra": ["--iispt_hemi_size", "8",
                                         "--cpu"]})
        deadline = time.time() + 560
        st = None
        while time.time() < deadline:
            _, body = _get(port, "/status")
            st = json.loads(body)
            if st["progress"]["finished"]:
                break
            time.sleep(5)
        assert st and st["progress"]["finished"], st
        assert st["refresh"] >= 1, st
        assert st["progress"]["indirect"] > 0
        code, body = _get(port, "/image/combined.png")
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        server.session.stop()
        server.shutdown()
