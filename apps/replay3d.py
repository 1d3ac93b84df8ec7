"""Interactive 3-D replay of closed-loop trajectories (reference
robot_visualizer.py:13-177, meshcat/pinocchio — here a self-contained
HTML export that runs in any browser with NO dependencies: an embedded
canvas renderer with drag-rotate, wheel zoom and a time slider).

Geometry is the collision model itself (the capsules/planes/spheres the
OCP constrains, manipulator.py::_compile_scene), so what you see is
exactly what the safety layer certifies.

Usage:
  python apps/replay3d.py -c receding --horizon 45 [--problems 8]
  -> data_noise/<mpc stem>_replay.html
"""

from __future__ import annotations

import json
import os
import pickle
import sys

from _common import setup_runtime
from safe_mpc_tpu.config import config_from_args, parse_args


def capsule_endpoint_fns(model):
    """Per-robot-capsule (link, c0, c1, radius): endpoint = R @ c + p with
    (R, p) the link pose (same construction as manipulator.py:253-266)."""
    import numpy as np

    from safe_mpc_tpu.models import geometry as geom

    out = []
    for c in model.cfg.scene.robot_capsules:
        T = geom.rot_x(c.rotation_offset[0]) @ geom.rot_y(c.rotation_offset[1]) \
            @ geom.rot_z(c.rotation_offset[2])
        P = np.eye(4)
        P[:3, 3] = c.spatial_offset
        T = P @ T
        child = model.robot.urdf.child_joint_of(c.link_name)
        direction = float(np.sign(child.origin_xyz[c.link_axis])) \
            if child is not None else 1.0
        e0 = np.array([0.0, 0.0, 0.0, 1.0])
        e1 = e0.copy()
        e1[c.link_axis] += direction * c.length
        c0 = T[:3, :3] @ e0[:3] + T[:3, 3]
        c1 = T[:3, :3] @ e1[:3] + T[:3, 3]
        out.append((c.link_name, c0, c1, c.radius))
    return out


_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>safe-mpc replay</title><style>
body{margin:0;background:#111;color:#ccc;font:13px sans-serif}
#bar{padding:6px 10px;display:flex;gap:10px;align-items:center}
canvas{display:block}input[type=range]{width:300px}
select,button{background:#222;color:#ccc;border:1px solid #444}
</style></head><body>
<div id="bar">
 <select id="prob"></select>
 <button id="play">&#9654;</button>
 <input type="range" id="t" min="0" value="0">
 <span id="info"></span>
 <span style="opacity:.6">drag: rotate &middot; wheel: zoom</span>
</div>
<canvas id="cv"></canvas>
<script>
const D = __DATA__;
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
let yaw=-2.2, pitch=0.45, dist=2.2, t=0, pi=0, playing=false;
const probSel=document.getElementById('prob');
D.problems.forEach((p,i)=>{const o=document.createElement('option');
 o.value=i;o.text='problem '+p.idx+' ('+p.outcome+')';probSel.add(o);});
const slider=document.getElementById('t');
function resize(){cv.width=innerWidth;cv.height=innerHeight-40;}
addEventListener('resize',()=>{resize();draw();});resize();
function proj(p){
 const cy=Math.cos(yaw),sy=Math.sin(yaw),cp=Math.cos(pitch),sp=Math.sin(pitch);
 const c=D.center;
 let x=p[0]-c[0],y=p[1]-c[1],z=p[2]-c[2];
 let x1=cy*x+sy*y, y1=-sy*x+cy*y;       // yaw about z
 let y2=cp*y1-sp*z, z2=sp*y1+cp*z;      // pitch
 const d=dist, f=0.9*Math.min(cv.width,cv.height);
 const w=d - x1*0;  // orthographic-ish with depth for sorting
 const s=f/(d+ x1*0 + 1e-9);
 return [cv.width/2 + y2*s, cv.height/2 - z2*s, x1, s];
}
function capsule(a,b,r,color,alpha){
 const A=proj(a),B=proj(b);
 ctx.strokeStyle=color;ctx.globalAlpha=alpha;ctx.lineCap='round';
 ctx.lineWidth=Math.max(2,2*r*A[3]);
 ctx.beginPath();ctx.moveTo(A[0],A[1]);ctx.lineTo(B[0],B[1]);ctx.stroke();
 ctx.globalAlpha=1;
}
function draw(){
 ctx.clearRect(0,0,cv.width,cv.height);
 const P=D.problems[pi], F=P.frames, n=F.length;
 slider.max=n-1; if(t>=n)t=n-1;
 // floor grid
 ctx.strokeStyle='#333';ctx.lineWidth=1;
 for(let i=-2;i<=8;i++){
  let a=proj([i*0.2-0.2,-1,0]),b=proj([i*0.2-0.2,1,0]);
  ctx.beginPath();ctx.moveTo(a[0],a[1]);ctx.lineTo(b[0],b[1]);ctx.stroke();
  a=proj([-0.4,i*0.2-0.8,0]);b=proj([1.4,i*0.2-0.8,0]);
  ctx.beginPath();ctx.moveTo(a[0],a[1]);ctx.lineTo(b[0],b[1]);ctx.stroke();}
 // obstacles
 D.fixed.forEach(o=>capsule(o.a,o.b,o.r,'#0aa',0.9));
 // EE trace up to t
 ctx.strokeStyle='#888';ctx.lineWidth=1.2;ctx.beginPath();
 for(let k=0;k<=t;k++){const e=F[k].ee,q=proj(e);
  k?ctx.lineTo(q[0],q[1]):ctx.moveTo(q[0],q[1]);}
 ctx.stroke();
 // target
 const g=proj(D.target);
 ctx.strokeStyle='#f4d03f';ctx.lineWidth=2;
 ctx.beginPath();ctx.arc(g[0],g[1],Math.max(4,0.01*g[3]),0,7);ctx.stroke();
 // robot capsules (painter sort by depth)
 const caps=F[t].caps.map((c,i)=>({c:c,r:D.caprad[i]}));
 caps.sort((u,v)=>proj(u.c[0])[2]-proj(v.c[0])[2]);
 caps.forEach(u=>capsule(u.c[0],u.c[1],u.r,'#e74c3c',0.95));
 // EE point
 const e=proj(F[t].ee);
 ctx.fillStyle='#fff';ctx.beginPath();ctx.arc(e[0],e[1],3,0,7);ctx.fill();
 document.getElementById('info').textContent=
  'step '+(t*D.stride)+'/'+((n-1)*D.stride)+'  |ee-ref| = '
  +F[t].err.toFixed(4)+' m';
}
slider.oninput=e=>{t=+slider.value;draw();};
probSel.onchange=e=>{pi=+probSel.value;t=0;slider.value=0;draw();};
document.getElementById('play').onclick=()=>{playing=!playing;};
setInterval(()=>{if(playing){t=(t+1)%D.problems[pi].frames.length;
 slider.value=t;draw();}},40);
let drag=false,lx=0,ly=0;
cv.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY;};
onmouseup=()=>drag=false;
onmousemove=e=>{if(drag){yaw+=(e.clientX-lx)*0.008;
 pitch=Math.max(-1.4,Math.min(1.4,pitch+(e.clientY-ly)*0.008));
 lx=e.clientX;ly=e.clientY;draw();}};
cv.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);draw();e.preventDefault();};
draw();
</script></body></html>
"""


def main(argv=None):
    args = parse_args(argv)
    setup_runtime(force_cpu=True)   # FK playback is tiny; keep it off-chip

    import jax
    import jax.numpy as jnp
    import numpy as np

    from safe_mpc_tpu.models.manipulator import ManipulatorModel
    from safe_mpc_tpu.sim.artifacts import mpc_path

    cfg = config_from_args(args, rti=True)
    model = ManipulatorModel(cfg)
    path = mpc_path(cfg, args["controller"], args["horizon"])
    with open(path, "rb") as f:
        d = pickle.load(f)
    xs = np.asarray(d["x"])                     # (B, T+1, nx)
    n_problems = int(args.get("batch") or 0) or min(8, xs.shape[0])
    stride = max(1, xs.shape[1] // 160)

    fns = capsule_endpoint_fns(model)
    nq = model.nq

    def frame(x):
        q = jnp.asarray(x[:nq])
        pts = []
        for link, c0, c1, _r in fns:
            R, p = model.robot.frame_pose(q, link)
            pts.append(jnp.stack([R @ jnp.asarray(c0) + p,
                                  R @ jnp.asarray(c1) + p]))
        return jnp.stack(pts), model.ee_pos(jnp.asarray(x))

    frame_j = jax.jit(frame)
    ref = np.asarray(model.ee_ref)

    outcome = {}
    for name in ("conv_idx", "collisions_idx", "viable_idx", "unconv_idx"):
        for i in d.get(name, []):
            outcome[int(i)] = name.replace("_idx", "")

    problems = []
    for i in range(n_problems):
        frames = []
        traj = xs[i, ::stride]
        traj = traj[np.all(np.isfinite(traj), axis=1)]
        for x in traj:
            caps, ee = frame_j(jnp.asarray(x, jnp.float64))
            ee = np.asarray(ee)
            frames.append({
                "caps": np.round(np.asarray(caps), 4).tolist(),
                "ee": np.round(ee, 4).tolist(),
                "err": float(np.linalg.norm(ee - ref)),
            })
        problems.append({"idx": i, "outcome": outcome.get(i, "?"),
                         "frames": frames})

    data = {
        "problems": problems,
        "stride": stride,
        "caprad": [float(r) for (_l, _a, _b, r) in fns],
        "fixed": [{"a": list(map(float, c.point_a)),
                   "b": list(map(float, c.point_b)), "r": c.radius}
                  for c in cfg.scene.fixed_capsules],
        "target": [float(v) for v in ref],
        "center": [0.4, 0.0, 0.25],
    }
    out = os.path.splitext(path)[0] + "_replay.html"
    with open(out, "w") as f:
        f.write(_HTML.replace("__DATA__", json.dumps(data)))
    print(f"saved {out} ({os.path.getsize(out) // 1024} KiB, "
          f"{n_problems} problems, stride {stride})")


if __name__ == "__main__":
    main()
