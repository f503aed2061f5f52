"""snt-viewer — interactive render server.

Re-design of the reference viewer stack (ZMQ bridge subprocess +
WebSocket + React/Three.js app, ref: viewer/server/server.py:89,
viewer/server/viewer_utils.py:242, viewer/app/).  The TPU build ships a
dependency-free stdlib HTTP server with an embedded orbit-control client:

  GET  /            the viewer page (vanilla JS, pointer-drag orbit,
                    time slider for dynamic scenes, keyframe authoring)
  GET  /scene       scene metadata (camera poses, image size, has_time)
  POST /render      {"c2w": [[..]x3], "fov": deg, "width": W,
                    "height": H, "time": t} -> PNG bytes
  POST /keyframe    {"c2w", "fov", "time"?} -> appended keyframe count
  POST /clear_keyframes
  POST /export_path {"width", "height", "steps_per_transition", "fps"}
                    -> writes camera_path.json next to the checkpoint and
                    returns it (consumed by snt-render --traj filename,
                    the reference's CameraPanel -> ns-render loop)

Progressive rendering: the client requests low resolution while moving
and full resolution at rest — the same train-vs-render budget idea as
the reference's adaptive-resolution RenderThread
(viewer_utils.py:117-170, 703) with the interrupt handled client-side.

    python -m soccernerfs_tpu.viewer.server --load-config <run>/config.yml
"""
from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>soccernerfs_tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; }
img { width:100vw; height:100vh; object-fit:contain; display:block; }
input[type=range] { width:300px; }
</style></head><body>
<div id="hud">drag: orbit | wheel: zoom | <span id="st"></span><br>
t: <input type="range" id="time" min="0" max="1" step="0.01" value="0"><br>
<button id="kf">+ keyframe</button> <button id="kfclear">clear</button>
<button id="kfexport">export camera_path.json</button>
<span id="kfst">0 keyframes</span></div>
<img id="view">
<script>
let az=0.8, el=0.5, radius=2.5, t=0, busy=false, dirty=true, moving=0;
const img=document.getElementById('view'), st=document.getElementById('st');
document.getElementById('time').oninput=e=>{t=parseFloat(e.target.value);poke();};
let drag=false,lx=0,ly=0;
img.onpointerdown=e=>{drag=true;lx=e.clientX;ly=e.clientY;};
window.onpointerup=()=>{drag=false;poke();};
window.onpointermove=e=>{if(!drag)return; az-=(e.clientX-lx)*0.01; el+=(e.clientY-ly)*0.01;
  el=Math.max(-1.4,Math.min(1.4,el)); lx=e.clientX; ly=e.clientY; poke();};
window.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001); poke();};
function poke(){ dirty=true; moving=4; }
function c2w(){
  const cx=Math.cos(az)*Math.cos(el)*radius, cy=Math.sin(az)*Math.cos(el)*radius,
        cz=Math.sin(el)*radius;
  const eye=[cx,cy,cz], up=[0,0,1];
  let f=[-cx,-cy,-cz]; const fn=Math.hypot(...f); f=f.map(v=>v/fn);
  let r=[f[1]*up[2]-f[2]*up[1], f[2]*up[0]-f[0]*up[2], f[0]*up[1]-f[1]*up[0]];
  const rn=Math.hypot(...r); r=r.map(v=>v/rn);
  const u=[r[1]*f[2]-r[2]*f[1], r[2]*f[0]-r[0]*f[2], r[0]*f[1]-r[1]*f[0]];
  return [[r[0],u[0],-f[0],eye[0]],[r[1],u[1],-f[1],eye[1]],[r[2],u[2],-f[2],eye[2]]];
}
async function loop(){
  if(dirty&&!busy){
    busy=true; dirty=false;
    const lowres = moving>0; if(moving>0) moving--;
    const scale = lowres?4:1;
    const body=JSON.stringify({c2w:c2w(),fov:60,width:Math.floor(640/scale),
                               height:Math.floor(360/scale),time:t});
    const t0=performance.now();
    try{
      const r=await fetch('/render',{method:'POST',body});
      const blob=await r.blob();
      img.src=URL.createObjectURL(blob);
      st.textContent=`${(performance.now()-t0).toFixed(0)}ms ${lowres?'(preview)':''}`;
    }catch(e){ st.textContent='error '+e; }
    busy=false;
    if(moving>0) dirty=true;
  }
  requestAnimationFrame(loop);
}
const kfst=document.getElementById('kfst');
document.getElementById('kf').onclick=async()=>{
  const r=await fetch('/keyframe',{method:'POST',
    body:JSON.stringify({c2w:c2w(),fov:60,time:t})});
  kfst.textContent=(await r.json()).count+' keyframes';};
document.getElementById('kfclear').onclick=async()=>{
  await fetch('/clear_keyframes',{method:'POST',body:'{}'});
  kfst.textContent='0 keyframes';};
document.getElementById('kfexport').onclick=async()=>{
  const r=await fetch('/export_path',{method:'POST',
    body:JSON.stringify({width:1280,height:720})});
  const j=await r.json();
  kfst.textContent='saved '+(j.path||JSON.stringify(j));};
poke(); loop();
</script></body></html>"""


class ViewerState:
    """Holds the trainer and renders requested cameras (thread-safe)."""

    def __init__(self, trainer, output_dir: Path | None = None):
        self.trainer = trainer
        self.lock = threading.Lock()
        self.keyframes: list = []
        self.output_dir = Path(output_dir) if output_dir else Path.cwd()

    def add_keyframe(self, c2w, fov, time=None) -> int:
        kf = {"c2w": c2w, "fov": float(fov)}
        if time is not None:
            kf["time"] = float(time)
        self.keyframes.append(kf)
        return len(self.keyframes)

    def export_path(self, width=1280, height=720, steps_per_transition=24,
                    fps=24) -> dict:
        from soccernerfs_tpu.core.camera_paths import keyframes_to_camera_path_json

        if not self.keyframes:
            return {"error": "no keyframes"}
        payload = keyframes_to_camera_path_json(
            self.keyframes, width, height, steps_per_transition, fps
        )
        out = self.output_dir / "camera_path.json"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(payload))
        payload_meta = dict(payload)
        payload_meta["path"] = str(out)
        return payload_meta

    def render(self, c2w, fov_deg, width, height, time=None) -> bytes:
        from PIL import Image

        from soccernerfs_tpu.core.cameras import Cameras

        focal = height / 2.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
        cams = Cameras.create(
            camera_to_worlds=np.asarray(c2w, np.float32)[None],
            fx=focal,
            fy=focal,
            cx=width / 2.0,
            cy=height / 2.0,
            width=width,
            height=height,
            times=None if time is None else np.asarray([time], np.float32),
        )
        with self.lock:
            outputs = self.trainer.render_camera(cams, 0)
        rgb = (np.clip(outputs["rgb"], 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        return buf.getvalue()

    def scene_meta(self) -> dict:
        cams = self.trainer.train_cameras
        return {
            "num_cameras": int(cams.num_cameras),
            "has_time": cams.times is not None,
            "aabb": np.asarray(self.trainer.aabb).tolist(),
        }


def make_handler(state: ViewerState):
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
            if self.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif self.path == "/scene":
                self._send(200, json.dumps(state.scene_meta()).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            try:
                if self.path == "/render":
                    png = state.render(
                        req["c2w"],
                        req.get("fov", 60.0),
                        int(req.get("width", 640)),
                        int(req.get("height", 360)),
                        req.get("time"),
                    )
                    self._send(200, png, "image/png")
                elif self.path == "/keyframe":
                    count = state.add_keyframe(
                        req["c2w"], req.get("fov", 60.0), req.get("time")
                    )
                    self._send(200, json.dumps({"count": count}).encode())
                elif self.path == "/clear_keyframes":
                    state.keyframes.clear()
                    self._send(200, b"{}")
                elif self.path == "/export_path":
                    payload = state.export_path(
                        int(req.get("width", 1280)),
                        int(req.get("height", 720)),
                        int(req.get("steps_per_transition", 24)),
                        int(req.get("fps", 24)),
                    )
                    self._send(200, json.dumps(payload).encode())
                else:
                    self._send(404, b"{}")
            except Exception as e:  # surface errors to the client
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def serve(trainer, port: int = 7007, output_dir=None):
    state = ViewerState(trainer, output_dir)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"[viewer] serving on http://localhost:{port}")
    server.serve_forever()


def main(argv=None):
    parser = argparse.ArgumentParser("snt-viewer")
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--port", type=int, default=7007)
    args = parser.parse_args(argv)

    from soccernerfs_tpu.utils.eval_utils import eval_setup

    _, trainer, _ = eval_setup(args.load_config, "inference")
    serve(trainer, args.port, output_dir=args.load_config.parent)


if __name__ == "__main__":
    main()
