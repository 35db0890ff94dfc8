"""HTTP serving of environments / world models.

Equivalent of the reference `web_env/server.py:33-137` (WebEnvServer:
/reset and /step JSON endpoints with base64 PNG frames + a browser UI) and
`web_env/inspect_server.py:37-178` (replay-buffer inspector). Stdlib only.
"""
from __future__ import annotations

import base64
import io
import json
import struct
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_INDEX_HTML = """<!doctype html>
<html><head><title>dreamer4_tpu world model</title>
<style>
 body { font-family: monospace; background: #111; color: #eee; text-align: center; }
 img { image-rendering: pixelated; width: 320px; margin: 2em; border: 1px solid #444; }
 button { font-size: 1.2em; margin: .3em; padding: .4em 1em; }
</style></head>
<body>
<h2>dreamer4_tpu — world model env</h2>
<img id="frame" />
<div id="info"></div>
<div>
 <button onclick="reset_()">reset</button>
 <button onclick="step(0)">&uarr;</button><br/>
 <button onclick="step(3)">&larr;</button>
 <button onclick="step(2)">&darr;</button>
 <button onclick="step(1)">&rarr;</button>
</div>
<script>
async function reset_() { render(await (await fetch('/reset', {method:'POST'})).json()); }
async function step(a) {
  render(await (await fetch('/step', {method:'POST', headers:{'Content-Type':'application/json'},
         body: JSON.stringify({action: a})})).json());
}
function render(r) {
  document.getElementById('frame').src = 'data:image/png;base64,' + r.frame;
  document.getElementById('info').innerText =
    'reward: ' + (r.reward ?? '-') + '  terminated: ' + (r.terminated ?? '-');
}
reset_();
document.addEventListener('keydown', e => {
  const map = {ArrowUp: 0, ArrowRight: 1, ArrowDown: 2, ArrowLeft: 3};
  if (e.key in map) step(map[e.key]);
});
</script>
</body></html>"""


def encode_png(image: np.ndarray) -> bytes:
    """Minimal RGB PNG encoder (no external deps). image: (3, h, w) float or
    (h, w, 3) uint8."""
    if image.ndim == 3 and image.shape[0] in (1, 3):
        image = np.moveaxis(image, 0, -1)
    if image.dtype != np.uint8:
        image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    if image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    h, w = image.shape[:2]

    raw = b''.join(b'\x00' + image[y].tobytes() for y in range(h))

    def chunk(tag, data):
        body = tag + data
        return struct.pack('>I', len(data)) + body + struct.pack('>I', zlib.crc32(body))

    ihdr = struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)
    return (b'\x89PNG\r\n\x1a\n'
            + chunk(b'IHDR', ihdr)
            + chunk(b'IDAT', zlib.compress(raw))
            + chunk(b'IEND', b''))


class WebEnvServer:
    """Serves any gym-style env (including DynamicsWorldModelWrapper)."""

    def __init__(self, env, port: int = 8000, host: str = '0.0.0.0'):
        self.env = env
        self.port = port
        self.host = host
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ('/', '/index.html'):
                    body = _INDEX_HTML.encode()
                    self.send_response(200)
                    self.send_header('Content-Type', 'text/html')
                    self.send_header('Content-Length', str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json({'error': 'not found'}, 404)

            def do_POST(self):
                length = int(self.headers.get('Content-Length', 0))
                payload = json.loads(self.rfile.read(length) or b'{}') if length else {}

                if self.path == '/reset':
                    out = outer.env.reset()
                    obs = out[0] if isinstance(out, tuple) else out
                    self._json({'frame': outer._frame_b64(obs)})
                elif self.path == '/step':
                    action = payload.get('action', 0)
                    obs, reward, terminated, truncated, info = outer._parse(outer.env.step(action))
                    self._json({
                        'frame': outer._frame_b64(obs),
                        'reward': float(np.asarray(reward).reshape(-1)[0]),
                        'terminated': bool(np.asarray(terminated).reshape(-1)[0]),
                        'truncated': bool(np.asarray(truncated).reshape(-1)[0]),
                    })
                else:
                    self._json({'error': 'not found'}, 404)

        self.httpd = ThreadingHTTPServer((host, port), Handler)

    @staticmethod
    def _parse(step_out):
        n = len(step_out)
        obs = step_out[0]
        reward = step_out[1] if n >= 2 else 0.0
        terminated = step_out[2] if n >= 3 else False
        truncated = step_out[3] if n >= 4 else False
        info = step_out[4] if n >= 5 else {}
        return obs, reward, terminated, truncated, info

    def _frame_b64(self, obs) -> str:
        if isinstance(obs, dict):
            obs = obs.get('image', next(iter(obs.values())))
        obs = np.asarray(obs)
        if obs.ndim == 4:  # batched
            obs = obs[0]
        return base64.b64encode(encode_png(obs)).decode()

    def serve_forever(self):
        print(f'serving on http://{self.host}:{self.port}')
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
