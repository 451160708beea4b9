"""Interactive training viewer.

Functional spec: reference nerfstudio/viewer/* (ZMQ<->WebSocket bridge +
React/three.js SPA, viewer_utils.py:59-731). Redesigned as a single
self-contained HTTP server + embedded vanilla-JS orbit viewer (the
environment has no npm/CDN access for a React bundle). Transport is a
stdlib WebSocket (`/ws`, viewer/ws.py) matching the reference's pushed
frames (server/server.py:89-231): the browser sends camera poses, the
server pushes a fast preview, a full-res refine, and unsolicited
refreshes of the held pose as training progresses; plain HTTP POST
rendering remains as the fallback transport. Progressive resolution
mirrors the reference's adaptive-res behavior (viewer_utils.py:554).
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

import numpy as np

VIEWER_HTML = """<!DOCTYPE html>
<html><head><title>sdfstudio-tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:6px 10px;border-radius:4px}
#path{position:fixed;top:8px;right:8px;background:#0008;padding:6px 10px;border-radius:4px;max-width:340px}
#path ol{margin:4px 0;padding-left:20px;max-height:180px;overflow-y:auto}
#cmd{word-break:break-all;color:#8f8;font-size:11px;user-select:all}
canvas{display:block;margin:auto;image-rendering:pixelated}
select,button,input{background:#222;color:#ddd;border:1px solid #555;margin:1px}
</style></head><body>
<div id="hud">sdfstudio-tpu viewer &mdash; drag: orbit, shift/right-drag: pan, wheel: zoom, WASD+QE: fly
 | output <select id="output"><option>rgb</option><option>depth</option><option>normal_vis</option><option>accumulation</option></select>
 <label><input id="frusta" type="checkbox" checked> cameras</label>
 <span id="stats"></span></div>
<div id="train" style="position:fixed;bottom:8px;left:8px;background:#0008;padding:6px 10px;border-radius:4px">
 <button id="pause">pause training</button>
 <b>export</b> <select id="ekind"><option>pointcloud</option><option>tsdf</option>
 <option>marching-cubes</option><option>poisson</option><option>texture</option></select>
 res <input id="eres" type="number" value="256" style="width:50px">
 <button id="exportcmd">command</button>
 <br><label><input id="cropon" type="checkbox"> crop box</label>
 min <input id="cmin" value="-1,-1,-1" style="width:90px">
 max <input id="cmax" value="1,1,1" style="width:90px">
 <div id="ecmd" style="word-break:break-all;color:#8f8;font-size:11px;user-select:all"></div></div>
<div id="path"><b>camera path</b>
 <button id="addkf">add keyframe</button><button id="clearkf">clear</button>
 <button id="preview">preview</button>
 <ol id="kflist"></ol>
 fps <input id="fps" type="number" value="24" style="width:40px">
 seconds <input id="secs" type="number" value="5" style="width:40px">
 res <input id="pres" type="number" value="512" style="width:50px">
 <button id="exportkf">export render command</button>
 <div id="cmd"></div></div>
<div style="position:relative;width:512px;margin:auto">
<canvas id="c" width="512" height="512"></canvas>
<canvas id="ov" width="512" height="512" style="position:absolute;top:0;left:0;pointer-events:none"></canvas>
</div>
<script>
const canvas = document.getElementById('c');
const ctx = canvas.getContext('2d');
const ov = document.getElementById('ov').getContext('2d');
// free camera = movable pivot + orbit around it (spans all 6 DoF but roll)
let az = 0.8, el = 0.5, radius = 2.5, pivot = [0,0,0];
let busy = false, dirty = true, lowres = true;
let drag = null, pan = null, keyframes = [], previewing = false, scene = null;
// ---- pose math (matches cameras/camera_utils.py viewmatrix: z = -view) --
function camAxes(){
  const ce = Math.cos(el), se = Math.sin(el), ca = Math.cos(az), sa = Math.sin(az);
  const eye = [pivot[0]+radius*ca*ce, pivot[1]+radius*sa*ce, pivot[2]+radius*se];
  let z = [eye[0]-pivot[0], eye[1]-pivot[1], eye[2]-pivot[2]]; // backward
  const nz = Math.hypot(...z); z = z.map(v=>v/nz);
  const up = [0,0,1];
  let x = [up[1]*z[2]-up[2]*z[1], up[2]*z[0]-up[0]*z[2], up[0]*z[1]-up[1]*z[0]];
  const nx = Math.hypot(...x) || 1; x = x.map(v=>-v/nx);  // right
  const y = [z[1]*x[2]-z[2]*x[1], z[2]*x[0]-z[0]*x[2], z[0]*x[1]-z[1]*x[0]];
  return {eye, x, y, z};
}
function c2wFlat(){
  const a = camAxes();
  return [a.x[0],a.y[0],a.z[0],a.eye[0], a.x[1],a.y[1],a.z[1],a.eye[1],
          a.x[2],a.y[2],a.z[2],a.eye[2]];
}
function mat3ToQuatWxyz(x,y,z){ // columns x,y,z
  const m = [[x[0],y[0],z[0]],[x[1],y[1],z[1]],[x[2],y[2],z[2]]];
  const tr = m[0][0]+m[1][1]+m[2][2];
  let w,qx,qy,qz;
  if (tr > 0){ const s = Math.sqrt(tr+1)*2; w=s/4; qx=(m[2][1]-m[1][2])/s;
    qy=(m[0][2]-m[2][0])/s; qz=(m[1][0]-m[0][1])/s; }
  else if (m[0][0]>m[1][1] && m[0][0]>m[2][2]){ const s=Math.sqrt(1+m[0][0]-m[1][1]-m[2][2])*2;
    w=(m[2][1]-m[1][2])/s; qx=s/4; qy=(m[0][1]+m[1][0])/s; qz=(m[0][2]+m[2][0])/s; }
  else if (m[1][1]>m[2][2]){ const s=Math.sqrt(1+m[1][1]-m[0][0]-m[2][2])*2;
    w=(m[0][2]-m[2][0])/s; qx=(m[0][1]+m[1][0])/s; qy=s/4; qz=(m[1][2]+m[2][1])/s; }
  else { const s=Math.sqrt(1+m[2][2]-m[0][0]-m[1][1])*2;
    w=(m[1][0]-m[0][1])/s; qx=(m[0][2]+m[2][0])/s; qy=(m[1][2]+m[2][1])/s; qz=s/4; }
  return [w,qx,qy,qz];
}
// ---- controls ----
canvas.onmousedown = e => { if (e.button===2 || e.shiftKey) pan=[e.clientX,e.clientY];
  else drag=[e.clientX,e.clientY]; };
canvas.oncontextmenu = e => e.preventDefault();
window.onmouseup = () => { drag=null; pan=null; };
window.onmousemove = e => {
  if (drag){ az += (e.clientX-drag[0])*0.01; el += (e.clientY-drag[1])*0.01;
    el = Math.max(-1.5, Math.min(1.5, el)); drag=[e.clientX,e.clientY]; dirty=true; lowres=true; }
  if (pan){ const a = camAxes(); const s = radius*0.002;
    const dx = (e.clientX-pan[0])*s, dy = (e.clientY-pan[1])*s;
    for (let k=0;k<3;k++) pivot[k] += -a.x[k]*dx + a.y[k]*dy;
    pan=[e.clientX,e.clientY]; dirty=true; lowres=true; }
};
canvas.onwheel = e => { radius *= Math.exp(e.deltaY*0.001); dirty=true; lowres=true; e.preventDefault(); };
window.onkeydown = e => {
  const a = camAxes(); const s = radius*0.08; let mv = null;
  if (e.key==='w') mv = a.z.map(v=>-v*s); if (e.key==='s') mv = a.z.map(v=>v*s);
  if (e.key==='a') mv = a.x.map(v=>-v*s); if (e.key==='d') mv = a.x.map(v=>v*s);
  if (e.key==='q') mv = [0,0,-s];         if (e.key==='e') mv = [0,0,s];
  if (mv){ for (let k=0;k<3;k++) pivot[k]+=mv[k]; dirty=true; lowres=true; }
};
document.getElementById('output').onchange = () => { dirty=true; lowres=true; };
// ---- keyframes: full 6-DoF poses (position + quaternion) ----
function refreshKf(){
  const ol = document.getElementById('kflist'); ol.innerHTML='';
  keyframes.forEach((k,i)=>{ const li=document.createElement('li');
    li.textContent = 'p=['+k.position.map(v=>v.toFixed(2)).join(',')+'] ';
    const go=document.createElement('button'); go.textContent='go';
    go.onclick=()=>{az=k.view.az; el=k.view.el; radius=k.view.radius;
      pivot=k.view.pivot.slice(); dirty=true; lowres=true;};
    const rm=document.createElement('button'); rm.textContent='x';
    rm.onclick=()=>{keyframes.splice(i,1); refreshKf();};
    li.appendChild(go); li.appendChild(rm); ol.appendChild(li); });
}
document.getElementById('addkf').onclick = () => {
  const a = camAxes();
  keyframes.push({position: a.eye, quaternion_wxyz: mat3ToQuatWxyz(a.x,a.y,a.z),
                  view: {az:az, el:el, radius:radius, pivot:pivot.slice()}});
  refreshKf(); };
document.getElementById('clearkf').onclick = () => { keyframes=[]; refreshKf(); };
document.getElementById('preview').onclick = async () => {
  if (keyframes.length < 2 || previewing) return;
  previewing = true;
  const saved = {az:az, el:el, radius:radius, pivot:pivot.slice()};
  for (let f = 0; f <= 40; f++) {
    // preview by stepping through the stored views (server slerps exactly;
    // the view interpolation here is an approximation for preview only)
    const u = f/40, n = keyframes.length, s = u*(n-1);
    const i = Math.min(Math.floor(s), n-2), t = s-i;
    const v0 = keyframes[i].view, v1 = keyframes[i+1].view;
    az = v0.az + (v1.az-v0.az)*t; el = v0.el + (v1.el-v0.el)*t;
    radius = v0.radius + (v1.radius-v0.radius)*t;
    pivot = v0.pivot.map((p,k)=>p+(v1.pivot[k]-p)*t);
    dirty=true; lowres=true;
    await new Promise(r=>setTimeout(r, 120));
  }
  az=saved.az; el=saved.el; radius=saved.radius; pivot=saved.pivot;
  previewing = false;
};
// ---- dataset camera frusta overlay (init_scene analog) ----
fetch('/scene').then(r=>r.json()).then(d=>{ scene=d;
  if (d.aabb){ // prefill the crop box with the model's scene box
    document.getElementById('cmin').value = d.aabb[0].map(v=>+v.toFixed(2)).join(',');
    document.getElementById('cmax').value = d.aabb[1].map(v=>+v.toFixed(2)).join(',');
  }
  drawOverlay(); }).catch(()=>{});
function project(p){ // world point -> overlay pixel (pinhole, focal=0.9*W)
  const a = camAxes();
  const d = [p[0]-a.eye[0], p[1]-a.eye[1], p[2]-a.eye[2]];
  const cx = d[0]*a.x[0]+d[1]*a.x[1]+d[2]*a.x[2];
  const cy = d[0]*a.y[0]+d[1]*a.y[1]+d[2]*a.y[2];
  const cz = d[0]*a.z[0]+d[1]*a.z[1]+d[2]*a.z[2];
  if (cz > -1e-6) return null; // behind camera (camera looks down -z)
  const f = 0.9*512;
  return [256 + f*cx/(-cz), 256 - f*cy/(-cz)];
}
function drawOverlay(){
  ov.clearRect(0,0,512,512);
  if (!scene || !document.getElementById('frusta').checked) return;
  ov.strokeStyle = '#4af'; ov.lineWidth = 1;
  for (const cam of scene.cameras){
    const m = cam.c2w; // row-major 3x4 (or 4x4)
    const o = [m[3], m[7], m[11]];
    const scale = 0.08;
    const zf = cam.fx/cam.w; // frustum depth per half-width
    const corners = [[-1,-1],[1,-1],[1,1],[-1,1]].map(([u,v])=>{
      const x = u*scale, y = v*scale*cam.h/cam.w, z = -2*zf*scale;
      return [m[0]*x+m[1]*y+m[2]*z+o[0], m[4]*x+m[5]*y+m[6]*z+o[1],
              m[8]*x+m[9]*y+m[10]*z+o[2]]; });
    const po = project(o), pc = corners.map(project);
    if (!po || pc.some(p=>!p)) continue;
    ov.beginPath();
    for (let i=0;i<4;i++){ ov.moveTo(po[0],po[1]); ov.lineTo(pc[i][0],pc[i][1]);
      ov.lineTo(pc[(i+1)%4][0],pc[(i+1)%4][1]); }
    ov.stroke();
  }
  // keyframe markers
  ov.fillStyle = '#fa4';
  for (const k of keyframes){ const p = project(k.position);
    if (p) ov.fillRect(p[0]-3, p[1]-3, 6, 6); }
  // crop-box wireframe (reference viewer crop viewport)
  if (document.getElementById('cropon').checked){
    const lo = document.getElementById('cmin').value.split(',').map(Number);
    const hi = document.getElementById('cmax').value.split(',').map(Number);
    if (lo.length===3 && hi.length===3 && lo.every(isFinite) && hi.every(isFinite)){
      const cs = [0,1].flatMap(i=>[0,1].flatMap(j=>[0,1].map(k=>
        [i?hi[0]:lo[0], j?hi[1]:lo[1], k?hi[2]:lo[2]])));
      const edges = [[0,1],[2,3],[4,5],[6,7],[0,2],[1,3],[4,6],[5,7],[0,4],[1,5],[2,6],[3,7]];
      ov.strokeStyle = '#fd4'; ov.beginPath();
      for (const [a,b] of edges){ const pa = project(cs[a]), pb = project(cs[b]);
        if (pa && pb){ ov.moveTo(pa[0],pa[1]); ov.lineTo(pb[0],pb[1]); } }
      ov.stroke();
    }
  }
}
for (const id of ['cropon','cmin','cmax'])
  document.getElementById(id).oninput = drawOverlay;
document.getElementById('frusta').onchange = drawOverlay;
document.getElementById('pause').onclick = async () => {
  const r = await fetch('/control', {method:'POST', body: JSON.stringify({action:'toggle'})});
  const data = await r.json();
  document.getElementById('pause').textContent = data.paused ? 'resume training' : 'pause training';
};
document.getElementById('exportcmd').onclick = async () => {
  const body = {kind: document.getElementById('ekind').value,
                resolution: +document.getElementById('eres').value};
  if (document.getElementById('cropon').checked)
    body.crop = {min: document.getElementById('cmin').value.split(',').map(Number),
                 max: document.getElementById('cmax').value.split(',').map(Number)};
  const r = await fetch('/export_cmd', {method:'POST', body: JSON.stringify(body)});
  const data = await r.json();
  document.getElementById('ecmd').textContent = data.command;
};
document.getElementById('exportkf').onclick = async () => {
  if (keyframes.length < 2) { document.getElementById('cmd').textContent = 'need >= 2 keyframes'; return; }
  const r = await fetch('/save_path', {method:'POST', body: JSON.stringify({
    keyframes: keyframes, fps: +document.getElementById('fps').value,
    seconds: +document.getElementById('secs').value,
    render_width: +document.getElementById('pres').value,
    render_height: +document.getElementById('pres').value})});
  const data = await r.json();
  document.getElementById('cmd').textContent = data.command;
};
// ---- WebSocket push transport (server renders preview + refine + live
// training refreshes; falls back to the fetch loop if WS is unavailable)
let ws = null, wsOk = false, wsMeta = null;
function wsConnect(){
  try { ws = new WebSocket((location.protocol==='https:'?'wss://':'ws://')+location.host+'/ws'); }
  catch (e) { ws = null; return; }
  ws.binaryType = 'blob';
  ws.onopen = () => { wsOk = true; dirty = true; };
  ws.onclose = () => { wsOk = false; };
  ws.onerror = () => { wsOk = false; try { ws.close(); } catch(e){} };
  ws.onmessage = async ev => {
    if (typeof ev.data === 'string'){
      const d = JSON.parse(ev.data);
      if (d.error){ document.getElementById('stats').textContent = ' | ERROR: '+d.error; return; }
      wsMeta = d; return;
    }
    const img = await createImageBitmap(ev.data);
    ctx.imageSmoothingEnabled = false;
    ctx.drawImage(img, 0, 0, canvas.width, canvas.height);
    drawOverlay();
    document.getElementById('stats').textContent = ' | ' +
      (wsMeta ? wsMeta.w+'px' : '') +
      (wsMeta && wsMeta.step ? ' @ step '+wsMeta.step : '') + ' (ws)';
  };
}
wsConnect();
async function loop(){
  if (wsOk) {
    if (dirty || lowres) {
      dirty = false; lowres = false;  // server owns preview->refine->refresh
      ws.send(JSON.stringify({c2w: c2wFlat(), width: 384, height: 384,
        output: document.getElementById('output').value}));
    }
    requestAnimationFrame(loop); return;
  }
  if ((dirty || lowres) && !busy) {
    busy = true; const wasLow = lowres;
    const res = wasLow ? 96 : 384;
    dirty = false; if (!wasLow) lowres = false;
    const t0 = performance.now();
    try {
      const r = await fetch('/render', {method:'POST', body: JSON.stringify({
        c2w: c2wFlat(), width: res, height: res,
        output: document.getElementById('output').value})});
      if (!r.ok) { // render failure reported by the server (e.g. OOM)
        const err = await r.json().catch(()=>({error:'render failed'}));
        document.getElementById('stats').textContent = ' | ERROR: ' + err.error;
      } else {
        const blob = await r.blob();
        const img = await createImageBitmap(blob);
        ctx.imageSmoothingEnabled = false;
        ctx.drawImage(img, 0, 0, canvas.width, canvas.height);
        drawOverlay();
        document.getElementById('stats').textContent =
          ' | ' + res + 'px in ' + Math.round(performance.now()-t0) + 'ms';
        if (wasLow) { lowres = false; dirty = true; }
      }
    } catch (err) { console.log(err); }
    busy = false;
  }
  requestAnimationFrame(loop);
}
loop();
</script></body></html>"""


class ViewerState:
    """Viewer bridge between HTTP handler threads and the training thread.

    JAX dispatch is not safe to interleave from a second thread against a
    running train loop (observed deadlocks), and on the TPU deployment a
    second hot program evicts the train step from the device program cache
    (docs/tpu-design.md). So HTTP threads only ENQUEUE requests; the
    training thread services them between steps via :meth:`service` — the
    same interleaving the reference uses (trainer.py:166 calls
    _update_viewer_state inside the loop). For view-only sessions (no train
    loop) call :meth:`serve_idle` from the main thread."""

    def __init__(self, trainer):
        self.trainer = trainer
        import queue

        self._queue = queue.Queue()
        # pause/resume training control (reference viewer_utils.py:365-380:
        # the training loop blocks in _update_viewer_state while paused,
        # still servicing renders)
        self.paused = False
        # host-side training-progress counter for WebSocket push: bumped
        # every service() call (i.e. every dispatched train window), so WS
        # connections can refresh the held pose as training improves
        # WITHOUT any device->host fetch (reading state.step would poison
        # the relay's program cache — docs/tpu-design.md)
        self.ticks = 0

    def host_step(self) -> int:
        """Training step as tracked host-side by the loop (no device fetch)."""
        return int(getattr(self.trainer, "_loop_step", 0))

    # ---------------- HTTP-thread side ----------------
    def render_pose(
        self, azimuth, elevation, radius, width, height, output="rgb", c2w=None
    ):
        req = {
            "args": (azimuth, elevation, radius, width, height, output, c2w),
            "event": threading.Event(),
        }
        self._queue.put(req)
        if not req["event"].wait(timeout=600.0):
            raise TimeoutError("render not serviced (is the train loop running?)")
        if "error" in req:
            raise RuntimeError(req["error"])
        return req["img"]

    # ---------------- training-thread side ----------------
    def service(self, max_requests: int = 2) -> None:
        """Render pending viewer requests; call between train steps.
        While paused, keeps servicing renders and returns only on resume."""
        import time as _time

        self.ticks += 1
        while True:
            for _ in range(max_requests):
                if self._queue.empty():
                    break
                req = self._queue.get_nowait()
                try:
                    req["img"] = self._render(*req["args"])
                except Exception as e:  # surface errors to the browser
                    req["error"] = f"{type(e).__name__}: {e}"
                req["event"].set()
            if not self.paused:
                return
            _time.sleep(0.05)

    def serve_idle(self) -> None:
        """Service loop for view-only sessions (no training)."""
        import time as _time

        while True:
            self.service()
            _time.sleep(0.02)

    def _render(
        self, azimuth, elevation, radius, width, height, output="rgb", c2w=None
    ):
        import jax
        import jax.numpy as jnp

        from sdfstudio_tpu.cameras.cameras import Cameras
        from sdfstudio_tpu.cameras.camera_utils import viewmatrix

        if c2w is not None:
            # free 6-DoF pose from the browser (row-major 3x4 or 4x4)
            pose = np.asarray(c2w, dtype=np.float64).reshape(-1, 4)[:3][None]
        else:
            center = np.array(
                [
                    radius * np.cos(azimuth) * np.cos(elevation),
                    radius * np.sin(azimuth) * np.cos(elevation),
                    radius * np.sin(elevation),
                ]
            )
            lookat = center  # towards origin
            up = np.array([0.0, 0.0, 1.0])
            pose = viewmatrix(-lookat, up, center)[None]
        focal = 0.9 * width
        cams = Cameras.create(
            camera_to_worlds=pose,
            fx=focal,
            fy=focal,
            cx=width / 2.0,
            cy=height / 2.0,
            width=width,
            height=height,
        )
        # runs on the TRAINING thread via service(); no locking needed
        trainer = self.trainer
        state = trainer.state
        bundle = cams.generate_image_rays(0)
        chunk = min(trainer.model.config.eval_num_rays_per_chunk, width * height)
        n = bundle.origins.shape[0]
        n_pad = ((n + chunk - 1) // chunk) * chunk
        pad = n_pad - n
        bundle = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n and pad
            else x,
            bundle,
        )
        outs = []
        step = state.step.astype(jnp.float32)
        for i in range(n_pad // chunk):
            sl = jax.tree_util.tree_map(
                lambda x: x[i * chunk : (i + 1) * chunk]
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_pad
                else x,
                bundle,
            )
            outs.append(
                trainer._render_chunk(state.params, sl, step, state.model_state)
            )
        merged = {
            k: np.concatenate([np.asarray(o[k]) for o in outs])[:n] for k in outs[0]
        }
        img = merged.get(output, merged["rgb"]).reshape(height, width, -1)
        if output == "depth":
            from sdfstudio_tpu.utils.colormaps import apply_depth_colormap

            img = apply_depth_colormap(img)
        elif img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _catmull_rom(p0, p1, p2, p3, t):
    return 0.5 * (
        2 * p1
        + (-p0 + p2) * t
        + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t * t
        + (-p0 + 3 * p1 - 3 * p2 + p3) * t * t * t
    )


def _orbit_pose(azimuth, elevation, radius):
    """camera-to-world for an orbit camera looking at the origin (matches
    ViewerState._render)."""
    from sdfstudio_tpu.cameras.camera_utils import viewmatrix

    center = np.array(
        [
            radius * np.cos(azimuth) * np.cos(elevation),
            radius * np.sin(azimuth) * np.cos(elevation),
            radius * np.sin(elevation),
        ]
    )
    up = np.array([0.0, 0.0, 1.0])
    return viewmatrix(-center, up, center)


def _interp_pose_keyframes(keyframes, num_frames):
    """Free 6-DoF keyframes {position, quaternion_wxyz} -> per-frame 4x4
    c2w: Catmull-Rom on positions, piecewise slerp on orientations
    (reference viewer app camera-path editor semantics,
    app/src/modules/CameraPanel; slerp via cameras/camera_utils.py:79)."""
    from sdfstudio_tpu.cameras.camera_utils import quaternion_matrix, quaternion_slerp

    n = len(keyframes)
    pos = np.asarray([k["position"] for k in keyframes], dtype=np.float64)
    quat = np.asarray([k["quaternion_wxyz"] for k in keyframes], dtype=np.float64)
    out = []
    for f in range(num_frames):
        u = f / (num_frames - 1)
        s = u * (n - 1)
        i = min(int(s), n - 2)
        t = s - i
        idx = lambda j: max(0, min(n - 1, j))  # noqa: E731
        p = _catmull_rom(pos[idx(i - 1)], pos[i], pos[idx(i + 1)], pos[idx(i + 2)], t)
        q = quaternion_slerp(quat[i], quat[idx(i + 1)], float(t))
        c2w = quaternion_matrix(q)
        c2w[:3, 3] = p
        out.append(c2w)
    return out


def save_camera_path(keyframes, fps, seconds, render_width, render_height, base_dir):
    """Interpolate keyframes into the viewer camera-path JSON consumed by
    ``sst-render --traj filename`` (camera_paths.get_path_from_json; the
    reference's most-used viewer feature, viewer_utils.py:208+ /
    scripts/render.py). Two keyframe flavors:

    * free 6-DoF: {"position": [3], "quaternion_wxyz": [4]} — Catmull-Rom
      positions + slerp orientations (what the browser editor now records);
    * legacy orbit: {"azimuth", "elevation", "radius"} — Catmull-Rom in
      orbit coordinates, camera looks at the origin.

    Returns (path, ready-to-run command string)."""
    num_frames = max(int(fps * seconds), 2)
    n = len(keyframes)
    cams = []
    fov = 2 * np.degrees(np.arctan(0.5 / 0.9))  # focal = 0.9*h, matches _render
    if "position" in keyframes[0]:
        for c2w in _interp_pose_keyframes(keyframes, num_frames):
            cams.append({"camera_to_world": c2w.flatten().tolist(), "fov": float(fov)})
    else:
        for f in range(num_frames):
            u = f / (num_frames - 1)
            s = u * (n - 1)
            i = min(int(s), n - 2)
            t = s - i

            def kf(j, key):
                return keyframes[max(0, min(n - 1, j))][key]

            vals = {
                key: _catmull_rom(
                    kf(i - 1, key), kf(i, key), kf(i + 1, key), kf(i + 2, key), t
                )
                for key in ("azimuth", "elevation", "radius")
            }
            c2w = np.eye(4)
            c2w[:3] = _orbit_pose(vals["azimuth"], vals["elevation"], vals["radius"])
            cams.append({"camera_to_world": c2w.flatten().tolist(), "fov": float(fov)})
    path = {
        "render_height": int(render_height),
        "render_width": int(render_width),
        "fps": fps,
        "seconds": seconds,
        "keyframes": keyframes,
        "camera_path": cams,
    }
    base = Path(base_dir)
    out = base / "camera_paths" / "viewer_path.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(path))
    cmd = (
        f"sst-render --load-config {base / 'config.yml'} --traj filename "
        f"--camera-path-filename {out} --output-path renders/path.gif --fps {fps}"
    )
    return out, cmd


def _make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        # ---- WebSocket push transport (reference server/server.py:89-231
        # pushes frames over a Tornado WS; here: stdlib upgrade-in-place,
        # viewer/ws.py). The browser sends camera poses; the server pushes
        # a fast preview, a full-res refine, and unsolicited refreshes of
        # the held pose as training progresses. ----
        WS_REFRESH_SECONDS = 2.0  # min gap between training-progress pushes

        def _ws_push(self, sock, req, preview: bool) -> bool:
            """Render req's pose and push meta+PNG. Returns False when the
            socket is gone (ends the connection loop); render errors are
            reported in-band like the POST path does."""
            from sdfstudio_tpu.viewer import ws

            size = 96 if preview else max(32, int(req.get("width", 384)))
            try:
                img = state.render_pose(
                    req.get("azimuth", 0.0),
                    req.get("elevation", 0.3),
                    req.get("radius", 2.5),
                    size,
                    size,
                    req.get("output", "rgb"),
                    c2w=req.get("c2w"),
                )
            except Exception as e:
                try:
                    ws.send_frame(
                        sock, json.dumps({"error": str(e)[:500]}).encode(), ws.OP_TEXT
                    )
                    return True
                except OSError:
                    return False
            import imageio.v2 as imageio

            buf = io.BytesIO()
            imageio.imwrite(buf, img, format="png")
            meta = {"w": size, "h": size, "step": state.host_step(),
                    "paused": state.paused}
            try:
                ws.send_frame(sock, json.dumps(meta).encode(), ws.OP_TEXT)
                ws.send_frame(sock, buf.getvalue(), ws.OP_BINARY)
                return True
            except OSError:
                return False

        def _ws_loop(self):
            import time as _time

            from sdfstudio_tpu.viewer import ws

            sock = self.connection
            last = None  # newest camera request; older ones coalesce away
            pending_hi = False
            shown_tick = -1
            last_push = 0.0
            while True:
                msg, closed = ws.drain_latest_text(sock, first_timeout=0.25)
                if closed:
                    return
                if msg is not None:
                    try:
                        last = json.loads(msg)
                    except ValueError:
                        continue
                    if not self._ws_push(sock, last, preview=True):
                        return
                    pending_hi = True
                    shown_tick = state.ticks
                    last_push = _time.monotonic()
                    continue
                if last is None:
                    continue
                if pending_hi:
                    if not self._ws_push(sock, last, preview=False):
                        return
                    pending_hi = False
                    shown_tick = state.ticks
                    last_push = _time.monotonic()
                elif (
                    state.ticks > shown_tick
                    and _time.monotonic() - last_push >= self.WS_REFRESH_SECONDS
                ):
                    # training advanced: refresh the held pose (the
                    # reference's RenderThread re-render on train ticks)
                    if not self._ws_push(sock, last, preview=False):
                        return
                    shown_tick = state.ticks
                    last_push = _time.monotonic()

        def do_GET(self):
            if self.path == "/ws":
                from sdfstudio_tpu.viewer import ws

                key = self.headers.get("Sec-WebSocket-Key")
                if not key or "websocket" not in self.headers.get("Upgrade", "").lower():
                    self.send_response(400)
                    self.end_headers()
                    return
                self.connection.sendall(ws.handshake_response(key))
                try:
                    self._ws_loop()
                finally:
                    self.close_connection = True
                return
            if self.path == "/scene":
                # dataset camera frusta for the scene overlay — the analog
                # of the reference's init_scene message that populates the
                # three.js scene with training cameras
                # (viewer_utils.py:300-420)
                payload = {"cameras": []}
                sb = getattr(getattr(state.trainer, "model", None), "scene_box", None)
                if sb is not None:
                    payload["aabb"] = np.asarray(sb.aabb).tolist()
                dm = getattr(state.trainer, "datamanager", None)
                cams = getattr(dm, "train_cameras", None) if dm else None
                if cams is not None:
                    c2ws = np.asarray(cams.camera_to_worlds)
                    fx = np.asarray(cams.fx).reshape(-1)
                    w = np.asarray(cams.width).reshape(-1)
                    h = np.asarray(cams.height).reshape(-1)
                    for i in range(c2ws.shape[0]):
                        payload["cameras"].append(
                            {
                                "c2w": c2ws[i].reshape(-1).tolist(),
                                "fx": float(fx[min(i, fx.size - 1)]),
                                "w": int(w[min(i, w.size - 1)]),
                                "h": int(h[min(i, h.size - 1)]),
                            }
                        )
                body = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(VIEWER_HTML.encode())

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))

            def send_json(payload):
                body = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            if self.path == "/control":
                # pause/resume training (reference viewer_utils.py:365-380)
                action = req.get("action", "toggle")
                if action == "pause":
                    state.paused = True
                elif action == "resume":
                    state.paused = False
                else:
                    state.paused = not state.paused
                send_json({"paused": state.paused})
                return
            if self.path == "/export_cmd":
                # export panel: compose the sst-export command for the live
                # run (reference viewer export tab, app/.../ExportPanel)
                kind = req.get("kind", "pointcloud")
                res = int(req.get("resolution", 256))
                cfg = Path(state.trainer.base_dir) / "config.yml"
                out = Path(state.trainer.base_dir) / "exports" / kind
                # crop box (reference viewer "Crop Viewport" -> export
                # bounding box, app/.../ExportModal)
                bbox = ""
                crop = req.get("crop")
                if crop:
                    lo = " ".join(f"{float(v):g}" for v in crop["min"])
                    hi = " ".join(f"{float(v):g}" for v in crop["max"])
                    bbox = f" --bounding-box-min {lo} --bounding-box-max {hi}"
                if kind == "texture":
                    mesh = out.parent / "marching-cubes" / "mc_mesh.ply"
                    cmd = (
                        f"sst-export marching-cubes --load-config {cfg} "
                        f"--output-dir {mesh.parent} --resolution {res}{bbox} && "
                        f"sst-texture --load-config {cfg} --input-mesh {mesh} "
                        f"--output-dir {out}"
                    )
                elif kind == "pointcloud":
                    cmd = (
                        f"sst-export pointcloud --load-config {cfg} "
                        f"--output-dir {out} --num-points 1000000{bbox}"
                    )
                else:
                    cmd = (
                        f"sst-export {kind} --load-config {cfg} "
                        f"--output-dir {out} --resolution {res}{bbox}"
                    )
                send_json({"command": cmd})
                return
            if self.path == "/save_path":
                out, cmd = save_camera_path(
                    req["keyframes"],
                    req.get("fps", 24),
                    req.get("seconds", 5),
                    req.get("render_width", 512),
                    req.get("render_height", 512),
                    state.trainer.base_dir,
                )
                body = json.dumps({"path": str(out), "command": cmd}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            try:
                img = state.render_pose(
                    req.get("azimuth", 0.0),
                    req.get("elevation", 0.3),
                    req.get("radius", 2.5),
                    int(req.get("width", 128)),
                    int(req.get("height", 128)),
                    req.get("output", "rgb"),
                    c2w=req.get("c2w"),
                )
            except Exception as e:  # report render failures to the web UI
                # (reference trainer.py:230-235 catches viewer render OOM)
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)[:500]}).encode())
                return
            import imageio.v2 as imageio

            buf = io.BytesIO()
            imageio.imwrite(buf, img, format="png")
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(buf.getvalue())

    return Handler


def setup_viewer(trainer, port: int = 7007) -> ViewerState:
    """Start the viewer HTTP server in a daemon thread (the analog of
    reference viewer_utils.setup_viewer). Rendering itself happens on the
    training thread: the trainer's loop calls ``viewer_state.service()``
    between steps."""
    state = ViewerState(trainer)
    trainer.viewer_state = state
    server = ThreadingHTTPServer(("0.0.0.0", port), _make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    print(f"viewer running at http://localhost:{port}", flush=True)
    return state
