"""Interactive t-SNE embedding viewer — zero-dependency web GUI.

Replacement for the reference's PyQt5 drag-drop viewer
(reference: src/visualization/visualization_main.py:32-158): instead of a
desktop Qt window (unavailable on headless TPU VMs), this serves a local
single-page app from the Python stdlib — pick embedding H5 files discovered
under a root directory, choose the scatter mode and perplexity, and explore
the t-SNE map interactively (wheel zoom, drag pan, hover identity, legend,
table view).  The t-SNE math and file semantics are shared with the
headless CLI (tools/visualize_embeddings.py).

Usage:
    python tools/visualize_gui.py --dir OUTPUT_DIR [--port 8642]

Endpoints (JSON): /api/files, /api/tsne?files=..&mode=..&perplexity=..
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Categorical palette (dataviz reference instance, fixed assignment order).
# Scatter is an all-pairs form: only the first three slots validate
# all-pairs, so series 4+ additionally carry distinct marker SHAPES
# (secondary encoding) and identity is never color-alone (legend + hover +
# table view).
_PALETTE_LIGHT = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
_PALETTE_DARK = ["#3987e5", "#d95926", "#199e70", "#c98500", "#d55181", "#008300", "#9085e9", "#e66767"]


def discover_h5(root: str):
    """Embedding H5 files under root, repo-relative sorted paths."""
    out = []
    for base, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".h5"):
                out.append(os.path.relpath(os.path.join(base, f), root))
    return sorted(out)


def compute_points(root: str, rel_files, mode: str, perplexity: float,
                   max_points: int, seed: int):
    from tools.visualize_embeddings import _tsne, load_embedding_vectors

    paths = []
    for rel in rel_files:
        full = os.path.normpath(os.path.join(root, rel))
        if not (full == root or full.startswith(root + os.sep)):
            raise ValueError(f"path escapes the root: {rel}")
        if not os.path.exists(full):
            raise FileNotFoundError(rel)
        paths.append(full)
    rng = np.random.default_rng(seed)
    mat, labels, ids = load_embedding_vectors(paths, mode, max_points, rng)
    if mat is None:
        return {"points": [], "labels": [], "ids": [], "series": []}
    pts = _tsne(mat, perplexity, seed)
    series = sorted(set(labels))
    return {
        "points": [[round(float(x), 4), round(float(y), 4)] for x, y in pts],
        "labels": list(labels),
        "ids": list(ids),
        "series": series,
    }


_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>ProtGram t-SNE viewer</title>
<style>
  :root { color-scheme: light dark; }
  body { margin: 0; font: 13px system-ui, sans-serif;
         background: #fcfcfb; color: #0b0b0b; }
  @media (prefers-color-scheme: dark) {
    body { background: #1a1a19; color: #ffffff; }
    #side { background: #222221; border-color: #3a3a38; }
    #tip { background: #222221; border-color: #3a3a38; color: #fff; }
    table th, table td { border-color: #3a3a38; }
  }
  #wrap { display: flex; height: 100vh; }
  #side { width: 290px; padding: 12px; border-right: 1px solid #e4e2dc;
          background: #f7f6f3; overflow-y: auto; flex-shrink: 0; }
  #main { flex: 1; position: relative; }
  canvas { display: block; width: 100%; height: 100%; cursor: grab; }
  h1 { font-size: 14px; margin: 0 0 8px; }
  label { display: block; margin: 8px 0 2px; color: #52514e; }
  @media (prefers-color-scheme: dark) { label { color: #c3c2b7; } }
  select, input, button { width: 100%; box-sizing: border-box; font: inherit;
                          margin: 1px 0; }
  #files { height: 170px; }
  button { margin-top: 10px; padding: 6px; }
  #legend { margin-top: 12px; }
  .key { display: flex; align-items: center; gap: 6px; margin: 2px 0; }
  .sw { width: 10px; height: 10px; border-radius: 50%; flex-shrink: 0; }
  #tip { position: absolute; pointer-events: none; background: #fff;
         border: 1px solid #e4e2dc; border-radius: 4px; padding: 4px 7px;
         display: none; box-shadow: 0 1px 4px rgba(0,0,0,.15); }
  #status { margin-top: 8px; color: #52514e; min-height: 16px; }
  #table { display: none; position: absolute; inset: 0; overflow: auto;
           background: inherit; padding: 12px; }
  table { border-collapse: collapse; font-size: 12px; }
  th, td { border: 1px solid #e4e2dc; padding: 2px 8px; text-align: left; }
</style></head><body>
<div id="wrap">
  <div id="side">
    <h1>t-SNE embedding viewer</h1>
    <label for="files">Embedding files (ctrl-click for several)</label>
    <select id="files" multiple></select>
    <label for="mode">Mode</label>
    <select id="mode">
      <option value="multi_set">multi_set — one point per dataset row</option>
      <option value="per_protein">per_protein — one point per protein</option>
    </select>
    <label for="perp">Perplexity</label>
    <input id="perp" type="number" value="30" min="2" max="100">
    <label for="maxpts">Max points</label>
    <input id="maxpts" type="number" value="2000" min="10" max="20000">
    <button id="go">Compute t-SNE</button>
    <button id="tbl">Toggle table view</button>
    <div id="status"></div>
    <div id="legend"></div>
  </div>
  <div id="main">
    <canvas id="cv"></canvas>
    <div id="tip"></div>
    <div id="table"></div>
  </div>
</div>
<script>
const LIGHT = %LIGHT%;
const DARK = %DARK%;
const dark = () => matchMedia('(prefers-color-scheme: dark)').matches;
const pal = () => dark() ? DARK : LIGHT;
const SHAPES = ['circle','circle','circle','triangle','square','diamond','triangle','square'];
let D = {points: [], labels: [], ids: [], series: []};
let view = {x: 0, y: 1, s: 1};  // pan offset (data units) and zoom scale
const cv = document.getElementById('cv'), tip = document.getElementById('tip');
const ctx = cv.getContext('2d');

fetch('api/files').then(r => r.json()).then(fs => {
  const sel = document.getElementById('files');
  fs.files.forEach(f => { const o = document.createElement('option');
    o.value = o.textContent = f; sel.appendChild(o); });
  document.getElementById('status').textContent = fs.files.length + ' files found';
});

function bounds() {
  let xs = D.points.map(p => p[0]), ys = D.points.map(p => p[1]);
  if (!xs.length) return {x0: -1, x1: 1, y0: -1, y1: 1};
  return {x0: Math.min(...xs), x1: Math.max(...xs), y0: Math.min(...ys), y1: Math.max(...ys)};
}
let B = bounds();
function toPx(p) {
  const w = cv.width, h = cv.height, m = 40;
  const sx = (w - 2*m) / (B.x1 - B.x0 || 1), sy = (h - 2*m) / (B.y1 - B.y0 || 1);
  const s = Math.min(sx, sy) * view.s;
  return [m + (p[0] - B.x0) * s + view.x, h - m - (p[1] - B.y0) * s + view.y];
}
function drawMark(x, y, shape, color) {
  ctx.fillStyle = color; ctx.strokeStyle = dark() ? '#1a1a19' : '#fcfcfb';
  ctx.lineWidth = 1; ctx.beginPath();
  const r = 4;
  if (shape === 'triangle') { ctx.moveTo(x, y-r); ctx.lineTo(x+r, y+r); ctx.lineTo(x-r, y+r); ctx.closePath(); }
  else if (shape === 'square') ctx.rect(x-r+1, y-r+1, 2*r-2, 2*r-2);
  else if (shape === 'diamond') { ctx.moveTo(x, y-r); ctx.lineTo(x+r, y); ctx.lineTo(x, y+r); ctx.lineTo(x-r, y); ctx.closePath(); }
  else ctx.arc(x, y, r-1, 0, 7);
  ctx.fill(); ctx.stroke();  // 1px surface ring separates overlapping marks
}
function draw() {
  cv.width = cv.clientWidth * devicePixelRatio; cv.height = cv.clientHeight * devicePixelRatio;
  ctx.scale(1, 1);
  ctx.clearRect(0, 0, cv.width, cv.height);
  const P = pal();
  D.points.forEach((p, i) => {
    const si = D.series.indexOf(D.labels[i]) % P.length;
    const [x, y] = toPx(p);
    drawMark(x, y, SHAPES[si], P[si]);
  });
}
function legend() {
  const el = document.getElementById('legend'); el.innerHTML = '';
  const P = pal();
  D.series.forEach((s, i) => {
    const k = document.createElement('div'); k.className = 'key';
    const sw = document.createElement('span'); sw.className = 'sw';
    sw.style.background = P[i % P.length];
    if (SHAPES[i % P.length] !== 'circle') sw.style.borderRadius = '0';
    k.appendChild(sw);
    const t = document.createElement('span'); t.textContent = s; k.appendChild(t);
    el.appendChild(k);
  });
}
function tableView() {
  const el = document.getElementById('table');
  let html = '<table><tr><th>id</th><th>series</th><th>x</th><th>y</th></tr>';
  D.points.forEach((p, i) => {
    html += `<tr><td>${D.ids[i]}</td><td>${D.labels[i]}</td><td>${p[0]}</td><td>${p[1]}</td></tr>`;
  });
  el.innerHTML = html + '</table>';
}
document.getElementById('go').onclick = () => {
  const files = [...document.getElementById('files').selectedOptions].map(o => o.value);
  if (!files.length) { document.getElementById('status').textContent = 'select at least one file'; return; }
  document.getElementById('status').textContent = 'computing t-SNE…';
  const q = new URLSearchParams({files: files.join(','),
    mode: document.getElementById('mode').value,
    perplexity: document.getElementById('perp').value,
    max_points: document.getElementById('maxpts').value});
  fetch('api/tsne?' + q).then(r => r.json()).then(d => {
    if (d.error) { document.getElementById('status').textContent = d.error; return; }
    D = d; B = bounds(); view = {x: 0, y: 0, s: 1};
    document.getElementById('status').textContent = D.points.length + ' points, ' + D.series.length + ' series';
    legend(); tableView(); draw();
  });
};
document.getElementById('tbl').onclick = () => {
  const t = document.getElementById('table');
  t.style.display = t.style.display === 'block' ? 'none' : 'block';
};
cv.addEventListener('wheel', e => {
  e.preventDefault(); view.s *= e.deltaY < 0 ? 1.15 : 0.87; draw();
}, {passive: false});
let drag = null;
cv.addEventListener('mousedown', e => { drag = [e.clientX, e.clientY]; });
window.addEventListener('mouseup', () => { drag = null; });
cv.addEventListener('mousemove', e => {
  if (drag) {
    view.x += (e.clientX - drag[0]) * devicePixelRatio;
    view.y += (e.clientY - drag[1]) * devicePixelRatio;
    drag = [e.clientX, e.clientY]; draw(); return;
  }
  // hover: nearest point within 10px
  const r = cv.getBoundingClientRect();
  const mx = (e.clientX - r.left) * devicePixelRatio, my = (e.clientY - r.top) * devicePixelRatio;
  let best = -1, bd = 100 * devicePixelRatio;
  D.points.forEach((p, i) => {
    const [x, y] = toPx(p); const d = (x-mx)**2 + (y-my)**2;
    if (d < bd) { bd = d; best = i; }
  });
  if (best >= 0) {
    tip.style.display = 'block';
    tip.style.left = (e.clientX - r.left + 12) + 'px';
    tip.style.top = (e.clientY - r.top + 12) + 'px';
    tip.textContent = D.ids[best] + ' — ' + D.labels[best];
  } else tip.style.display = 'none';
});
new ResizeObserver(draw).observe(cv);
</script></body></html>
"""


class _Handler(BaseHTTPRequestHandler):
    root_dir: str = "."

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode("utf8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urlparse(self.path)
        if url.path in ("/", "/index.html"):
            page = _PAGE.replace("%LIGHT%", json.dumps(_PALETTE_LIGHT)).replace(
                "%DARK%", json.dumps(_PALETTE_DARK)
            ).encode("utf8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(page)))
            self.end_headers()
            self.wfile.write(page)
            return
        if url.path == "/api/files":
            self._json({"files": discover_h5(self.root_dir)})
            return
        if url.path == "/api/tsne":
            q = parse_qs(url.query)
            try:
                result = compute_points(
                    self.root_dir,
                    [f for f in q.get("files", [""])[0].split(",") if f],
                    q.get("mode", ["multi_set"])[0],
                    float(q.get("perplexity", ["30"])[0]),
                    int(q.get("max_points", ["2000"])[0]),
                    int(q.get("seed", ["42"])[0]),
                )
                self._json(result)
            except Exception as e:  # surfaced in the GUI status line
                self._json({"error": f"{type(e).__name__}: {e}"}, code=400)
            return
        self._json({"error": "not found"}, code=404)


def make_server(root_dir: str, port: int = 0) -> ThreadingHTTPServer:
    handler = type("Handler", (_Handler,), {"root_dir": os.path.abspath(root_dir)})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dir", default=".", help="root directory to scan for embedding H5 files")
    ap.add_argument("--port", type=int, default=8642)
    args = ap.parse_args(argv)
    srv = make_server(args.dir, args.port)
    host, port = srv.server_address
    print(f"t-SNE viewer serving {os.path.abspath(args.dir)} at http://{host}:{port}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
