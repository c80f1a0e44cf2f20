"""Interactive training-view web UI test (the reference's
tools/interactive_training_view Express app, served headlessly here)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=60) as r:
        return r.status, r.read()


def test_interactive_web_end_to_end(tmp_path):
    from pbrt_v3_iile_tpu.utils import image as imglib
    from pbrt_v3_iile_tpu.ml import interactive_web as web

    # synthesize a 2-example PFM dataset in the reference's layout
    rng = np.random.default_rng(0)
    H = 8
    for x, y in ((0, 0), (1, 0)):
        p = rng.uniform(0, 1, (H, H, 3)).astype(np.float32)
        imglib.write_pfm(str(tmp_path / f"p_{x}_{y}.pfm"), p)
        imglib.write_pfm(str(tmp_path / f"d_{x}_{y}.pfm"),
                         (p + rng.normal(0, 0.3, p.shape))
                         .clip(0).astype(np.float32))
        n = rng.uniform(-1, 1, (H, H, 3)).astype(np.float32)
        imglib.write_pfm(str(tmp_path / f"n_{x}_{y}.pfm"), n)
        z = rng.uniform(0, 5, (H, H)).astype(np.float32)
        imglib.write_pfm(str(tmp_path / f"z_{x}_{y}.pfm"), z)

    ev = web.Evaluator([str(tmp_path)])
    assert ev.count() == 2
    server = web.make_server(ev, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        code, body = _get(port, "/")
        assert code == 200 and b"training view" in body
        code, body = _get(port, "/count")
        assert json.loads(body)["count"] == 2
        code, body = _get(port, "/eval/0")
        st = json.loads(body)
        for k in ("low_l1", "gauss_l1", "result_l1", "result_ssim"):
            assert np.isfinite(st[k]), st
        for which in ("expected", "result", "low", "blurred", "normals",
                      "distance"):
            code, body = _get(port, f"/image/0/{which}.png")
            assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n", which
        try:
            _get(port, "/eval/99")
            assert False, "expected HTTP 400 for out-of-range index"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
