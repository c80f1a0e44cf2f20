"""Interactive training view — web UI.

Parity target: tools/interactive_training_view in the reference (an
Express + WebSocket server wrapping ml/main_interactive_view.py and a
browser page showing expected/result/normals/distance/low/blurred tiles
with L1/SSIM numbers).  Here the predictor runs in-process (the backend
logic of ml/interactive.py) behind a zero-dependency HTTP server:

  python -m pbrt_v3_iile_tpu.ml.interactive_web --dataset DIR [DIR...]
         [--checkpoint ckpt.npz] [--port 8791]

Endpoints:
  GET /            the viewer page
  GET /count       {"count": n}
  GET /eval/<idx>  runs the prediction, returns metrics JSON
  GET /image/<idx>/<which>.png   tile images (expected|result|normals|
                                 distance|low|blurred)
"""

from __future__ import annotations

import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

import numpy as np

from . import interactive as backend

WHICH = ("expected", "result", "normals", "distance", "low", "blurred")


class Evaluator:
    """In-process predictor over a loaded PFM dataset (the
    main_interactive_view.py role without the stdio pipe)."""

    def __init__(self, dataset_dirs, checkpoint=None):
        import jax
        import jax.numpy as jnp

        from . import dataset as dslib
        from . import train as trainlib
        from ..models import iisptnet, transforms as nnx

        self.examples = dslib.load_pfm_dataset(dataset_dirs)
        hemi = self.examples[0]["d"].shape[0] if self.examples else 32
        net, net_vars = iisptnet.init_params(jax.random.PRNGKey(0), hemi)
        if checkpoint:
            net_vars = trainlib.inference_variables(
                trainlib.load_checkpoint(checkpoint))

        @jax.jit
        def predict(d, n, z):
            x, aux = nnx.probe_to_network_input(d, n, z)
            y = net.apply(net_vars, x[None], train=False)[0]
            return nnx.network_output_to_radiance(y, aux)

        self._predict = predict
        self._jnp = jnp
        self._cache: dict = {}

    def count(self):
        return len(self.examples)

    def evaluate(self, idx: int) -> dict:
        if idx in self._cache:
            return self._cache[idx]
        from ..utils import metrics as m

        ex = self.examples[idx]
        jnp = self._jnp
        result = np.asarray(self._predict(
            jnp.asarray(ex["d"], jnp.float32),
            jnp.asarray(ex["n"], jnp.float32),
            jnp.asarray(ex["z"], jnp.float32)))
        expected = ex["p"].astype(np.float32)
        low = ex["d"].astype(np.float32)
        blurred = backend._gauss_blur(low, 1.0)
        expo = backend._autoexposure(expected)
        tiles = dict(
            expected=(expected, expo), result=(result, expo),
            normals=(0.5 * (ex["n"] + 1.0), 0.0),
            distance=(ex["z"], backend._autoexposure(ex["z"])),
            low=(low, expo), blurred=(blurred, expo))
        metrics = dict(
            low_l1=m.l1(low, expected), low_ssim=m.ssim(low, expected),
            gauss_l1=m.l1(blurred, expected),
            gauss_ssim=m.ssim(blurred, expected),
            result_l1=m.l1(result, expected),
            result_ssim=m.ssim(result, expected),
            name=f"example_{idx}")
        out = dict(tiles=tiles, metrics=metrics)
        self._cache[idx] = out
        return out

    def tile_png(self, idx: int, which: str) -> bytes:
        from ..utils import image as imglib

        img, expo = self.evaluate(idx)["tiles"][which]
        ldr = np.clip(np.asarray(img, np.float32) * (2.0 ** expo), 0, 1)
        ldr = ldr ** (1.0 / backend.GAMMA)
        if ldr.ndim == 2:
            ldr = np.stack([ldr] * 3, -1)
        if ldr.shape[-1] == 1:
            ldr = np.repeat(ldr, 3, -1)
        buf = io.BytesIO()
        imglib.write_png(buf, (ldr * 255).astype(np.uint8))
        return buf.getvalue()


PAGE = """<!doctype html><html><head><title>IISPT training view</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;margin:2em}
img{width:160px;height:160px;image-rendering:pixelated;border:1px solid #444}
td{text-align:center;padding:4px}</style></head><body>
<h2>IISPT interactive training view</h2>
<div>Example <input id=idx type=number value=0 min=0 style="width:5em">
 / <span id=count>?</span> <button onclick="go()">Evaluate</button></div>
<table><tr><td>expected</td><td>result</td><td>low (1spp)</td>
<td>blurred</td><td>normals</td><td>distance</td></tr>
<tr id=row></tr></table><pre id=stats></pre>
<script>
fetch('/count').then(r=>r.json()).then(j=>count.textContent=j.count);
async function go(){
  const i = +idx.value;
  const m = await (await fetch('/eval/'+i)).json();
  stats.textContent = JSON.stringify(m, null, 1);
  row.innerHTML = ['expected','result','low','blurred','normals','distance']
    .map(w=>`<td><img src="/image/${i}/${w}.png?t=${Date.now()}"></td>`)
    .join('');
}
</script></body></html>"""


def make_server(evaluator: Evaluator, port: int = 8791):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            try:
                if not parts:
                    self._send(200, PAGE.encode(), "text/html")
                elif parts[0] == "count":
                    self._send(200, json.dumps(
                        {"count": evaluator.count()}).encode())
                elif parts[0] == "eval":
                    st = evaluator.evaluate(int(parts[1]))["metrics"]
                    self._send(200, json.dumps(st).encode())
                elif parts[0] == "image":
                    which = parts[2].replace(".png", "")
                    png = evaluator.tile_png(int(parts[1]), which)
                    self._send(200, png, "image/png")
                else:
                    self._send(404, b"?", "text/plain")
            except (IndexError, KeyError, ValueError) as e:
                self._send(400, str(e).encode(), "text/plain")

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    server.evaluator = evaluator
    return server


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="interactive_web")
    ap.add_argument("--dataset", nargs="+", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=8791)
    args = ap.parse_args(argv)
    ev = Evaluator(args.dataset, args.checkpoint)
    server = make_server(ev, args.port)
    print(f"#LOADCOMPLETE {ev.count()}", flush=True)
    print(f"training view on http://127.0.0.1:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
