"""Interactive web viewer — the TPU-friendly replacement for the reference's
GLFW/ImGui desktop viewer (`/root/reference/viewer/imgui_viewer.cpp`).

The reference viewer runs an OpenGL loop on a GPU desktop, calling
`GaussianMapper::renderFromPose` per frame (`imgui_viewer.cpp:260-261`);
TPU hosts are headless, so this serves the same render-from-pose loop over
HTTP: a stdlib server + vanilla-JS page with WASD/drag SE(3) navigation,
color/depth display modes, live scale-modifier control, undistort-mask
application (`gaussian_mapper.cpp:726-731`), and — when attached to a live
trainer — the `VariableParameters` editor (`include/gaussian_mapper.h:80-98`,
sliders `viewer/imgui_viewer.cpp:299-311`) over the /params endpoint.
Rendering happens on-device via `render_model`; frames ship as JPEG.
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>omnigs_tpu viewer</title><style>
body{margin:0;background:#111;color:#eee;font-family:monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:8px}
img{display:block;margin:auto;image-rendering:pixelated}
</style></head><body>
<div id="hud">WASD+QE move &middot; drag look &middot; [m] mode &middot; fps <span id="fps">-</span><br>
scale <input type="range" id="scale" min="0.05" max="2.0" step="0.05" value="1.0" style="width:120px">
<span id="scaleval">1.00</span><div id="params"></div></div>
<img id="view" width="%WIDTH%" height="%HEIGHT%">
<script>
let yaw=0, pitch=0, pos=[0,0,0], mode="color", busy=false, last=performance.now();
let scale=1.0;
const sl=document.getElementById("scale"), sv=document.getElementById("scaleval");
sl.oninput=()=>{scale=parseFloat(sl.value); sv.textContent=scale.toFixed(2)};
// live training parameters (VariableParameters analog): populated when the
// server is attached to a trainer
fetch('/params').then(r=>r.json()).then(p=>{
  const div=document.getElementById("params");
  for(const k in p){
    const row=document.createElement("div");
    row.innerHTML=`${k} <input size=9 id="p_${k}" value="${p[k]}">`;
    div.appendChild(row);
    row.querySelector("input").onchange=e=>{
      fetch('/params',{method:'POST',body:JSON.stringify({[k]:parseFloat(e.target.value)})});
    };
  }
}).catch(()=>{});
const img=document.getElementById("view"), fps=document.getElementById("fps");
const keys={};
onkeydown=e=>{keys[e.key.toLowerCase()]=1; if(e.key=='m') mode=(mode=="color")?"depth":"color";};
onkeyup=e=>{keys[e.key.toLowerCase()]=0};
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY]};
onmouseup=()=>{drag=null};
onmousemove=e=>{if(drag){yaw+=(e.clientX-drag[0])*0.005; pitch+=(e.clientY-drag[1])*0.005; drag=[e.clientX,e.clientY];}};
function step(){
  const v=0.1, cy=Math.cos(yaw), sy=Math.sin(yaw);
  if(keys['w']){pos[0]+=sy*v; pos[2]+=cy*v}
  if(keys['s']){pos[0]-=sy*v; pos[2]-=cy*v}
  if(keys['a']){pos[0]-=cy*v; pos[2]+=sy*v}
  if(keys['d']){pos[0]+=cy*v; pos[2]-=sy*v}
  if(keys['q']){pos[1]-=v} if(keys['e']){pos[1]+=v}
}
async function loop(){
  step();
  if(!busy){
    busy=true;
    try{
      const r=await fetch('/render',{method:'POST',body:JSON.stringify({yaw,pitch,pos,mode,scale})});
      const b=await r.blob();
      img.src=URL.createObjectURL(b);
      const now=performance.now(); fps.textContent=(1000/(now-last)).toFixed(1); last=now;
    }finally{busy=false}
  }
  requestAnimationFrame(loop);
}
loop();
</script></body></html>"""


class ViewerState:
    """renderFromPose bridge (`src/gaussian_mapper.cpp:656-732`): the render
    callback runs under a lock so a live trainer can share the model."""

    def __init__(self, render_fn, width: int, height: int, mask=None,
                 params_get=None, params_set=None):
        # render_fn(viewmatrix, campos, mode, scale) -> HxWx3 f32
        self.render_fn = render_fn
        self.width = width
        self.height = height
        # undistort mask, multiplied onto every served frame
        # (`gaussian_mapper.cpp:726-731`)
        self.mask = None if mask is None else np.asarray(mask)
        # live-tuning bridge: () -> dict / (dict) -> None (trainer's
        # get/set_variable_parameters)
        self.params_get = params_get
        self.params_set = params_set
        self.lock = threading.Lock()


def _pose_to_viewmatrix(yaw: float, pitch: float, pos):
    cy, sy = math.cos(yaw), math.sin(yaw)
    cp, sp = math.cos(pitch), math.sin(pitch)
    Ry = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]], np.float32)
    Rx = np.array([[1, 0, 0], [0, cp, sp], [0, -sp, cp]], np.float32)
    R_wc = Ry @ Rx
    R_cw = R_wc.T
    t_cw = -R_cw @ np.asarray(pos, np.float32)
    vm = np.eye(4, dtype=np.float32)
    vm[:3, :3] = R_cw
    vm[:3, 3] = t_cw
    return vm, np.asarray(pos, np.float32)


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/params":
                self._send_json(
                    {} if state.params_get is None else state.params_get()
                )
                return
            page = _PAGE.replace("%WIDTH%", str(state.width)).replace(
                "%HEIGHT%", str(state.height)
            )
            body = page.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, obj):
            body = json.dumps(obj).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or "{}")
            if self.path == "/params":
                if state.params_set is not None:
                    with state.lock:
                        state.params_set(req)
                self._send_json({"ok": True})
                return
            vm, campos = _pose_to_viewmatrix(
                req.get("yaw", 0.0), req.get("pitch", 0.0), req.get("pos", [0, 0, 0])
            )
            with state.lock:
                img = state.render_fn(
                    vm, campos, req.get("mode", "color"),
                    float(req.get("scale", 1.0)),
                )
            img = np.asarray(img)
            if state.mask is not None:
                img = img * state.mask[..., None]
            arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(render_fn, width: int, height: int, port: int = 8000,
          mask=None, params_get=None, params_set=None):
    """Blocking viewer server. `render_fn(viewmatrix, campos, mode, scale)`.
    Pass a trainer's get/set_variable_parameters as params_get/params_set to
    enable live hyperparameter tuning from the page."""
    state = ViewerState(render_fn, width, height, mask, params_get, params_set)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"viewer listening on http://0.0.0.0:{port}", flush=True)
    httpd.serve_forever()
