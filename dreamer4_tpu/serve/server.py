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


_INSPECT_HTML = """<!doctype html>
<html><head><title>replay buffer inspector</title>
<style>
 body { font-family: monospace; background: #111; color: #eee; padding: 2em; }
 img { image-rendering: pixelated; height: 96px; margin: 2px; border: 1px solid #333; }
 .ep { cursor: pointer; color: #8cf; }
</style></head>
<body>
<h2>replay buffer</h2>
<pre id="stats"></pre>
<div id="episodes"></div>
<div id="frames"></div>
<script>
async function load() {
  const stats = await (await fetch('/api/stats')).json();
  document.getElementById('stats').innerText = JSON.stringify(stats, null, 2);
  const eps = await (await fetch('/api/episodes')).json();
  document.getElementById('episodes').innerHTML = eps.episodes.map(
    e => `<div class="ep" onclick="show(${e.index})">episode ${e.index}: len ${e.length}, return ${e.total_reward.toFixed(2)}</div>`
  ).join('');
}
async function show(i) {
  const ep = await (await fetch('/api/episode/' + i)).json();
  document.getElementById('frames').innerHTML =
    (ep.frames || []).map(f => `<img src="data:image/png;base64,${f}"/>`).join('');
}
load();
</script>
</body></html>"""


class InspectReplayBufferServer:
    """Replay-buffer web inspector (reference `web_env/inspect_server.py:37-178`):
    /api/stats, /api/episodes, /api/episode/<id> with base64 PNG frames."""

    def __init__(self, buffer, port: int = 8001, host: str = '0.0.0.0',
                 max_frames: int = 64):
        self.buffer = buffer
        self.port = port
        self.host = host
        self.max_frames = max_frames
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
                buf = outer.buffer
                if self.path in ('/', '/index.html'):
                    body = _INSPECT_HTML.encode()
                    self.send_response(200)
                    self.send_header('Content-Type', 'text/html')
                    self.send_header('Content-Length', str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == '/api/stats':
                    lengths = [buf.episode_length(i) for i in range(buf.num_episodes)]
                    self._json(dict(
                        num_episodes=buf.num_episodes,
                        max_episodes=buf.max_episodes,
                        max_timesteps=buf.max_timesteps,
                        fields={k: [str(np.dtype(d)), list(s)]
                                for k, (d, s) in buf.fields.items()},
                        mean_episode_length=float(np.mean(lengths)) if lengths else 0.0,
                    ))
                elif self.path == '/api/episodes':
                    out = []
                    for i in range(buf.num_episodes):
                        ep = buf.get_episode(i)
                        out.append(dict(
                            index=i,
                            length=int(ep['_length']),
                            total_reward=float(np.sum(ep.get('rewards', 0.0))),
                        ))
                    self._json(dict(episodes=out))
                elif self.path.startswith('/api/episode/'):
                    idx = int(self.path.rsplit('/', 1)[1])
                    if not (0 <= idx < buf.num_episodes):
                        return self._json({'error': 'out of range'}, 404)
                    ep = buf.get_episode(idx)
                    frames = []
                    video = ep.get('video')
                    if video is not None:
                        for t in range(min(len(video), outer.max_frames)):
                            frame = video[t]
                            if frame.dtype == np.uint8:
                                frame = frame.astype(np.float32) / 255.0
                            frames.append(base64.b64encode(encode_png(frame)).decode())
                    self._json(dict(
                        index=idx,
                        length=int(ep['_length']),
                        rewards=np.asarray(ep.get('rewards', [])).tolist(),
                        terminated=np.asarray(ep.get('terminated', [])).tolist(),
                        frames=frames,
                    ))
                else:
                    self._json({'error': 'not found'}, 404)

        self.httpd = ThreadingHTTPServer((host, port), Handler)

    def serve_forever(self):
        print(f'inspecting on http://{self.host}:{self.port}')
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
