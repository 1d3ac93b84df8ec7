"""Manipulator MPC model: dynamics, torque map, plant, collision residuals.

TPU-native equivalent of the reference's ``AdamModel`` (env_model.py:18-331).
All compute-path functions are pure, jit/vmap-safe, and take the inertial
parameters as an explicit argument so model-noise ensembles are batched
pytrees rather than re-parsed URDF files.

State convention (reference env_model.py:58-66): ``x = [q, v]`` with
``nx = 2 nq``; control ``u`` = joint accelerations; discrete double
integrator ``q+ = q + dt v + dt^2/2 u``, ``v+ = v + dt u``; torque through
inverse dynamics ``tau = M(q) u + h(q, v)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SafeMpcConfig, Scene
from . import geometry as geom
from .robot import InertialParams, RobotModel
from .urdf import asset_path


@dataclass(frozen=True)
class CollisionRow:
    """One scalar collision constraint: lo <= value(q) <= hi.

    Structured as a pure geometric function over world points plus the
    per-point supporting-joint indices, so the constraint Jacobian is the
    chain rule `dval/dpts @ point_jacobians` with closed-form point
    Jacobians — no autodiff through the kinematic chain (the 'analytic
    sensitivities' hot path).

    ``points_fn(x, poses, ops)`` is layout-polymorphic: with
    :class:`_SampleOps` points are (3,), with :class:`_BatchLastOps` they
    are (3, K) (batch minor — the TPU lane-packed layout); ``val_fn``
    reduces over the component axis 0 so it works for both.

    ``check_lo/check_hi`` are the looser numeric-check bounds used by
    feasibility checks (reference ``collisions_constr_fun``,
    env_model.py:267-268 — tol_obs applied, collision margin not)."""
    name: str
    points_fn: Callable   # (x, poses, ops) -> tuple of world points
    ancs: tuple           # supporting joint index per point (-1 = fixed)
    val_fn: Callable      # (*points) -> scalar / (K,) geometric expr
    lo: float
    hi: float
    check_lo: float
    check_hi: float

    def fn(self, x, poses, ops):
        return self.val_fn(*self.points_fn(x, poses, ops))


class _SampleOps:
    """Per-sample geometry ops: poses from `joint_poses`, points (3,)."""

    def __init__(self, robot: RobotModel):
        self.robot = robot

    def frame_pose(self, poses, frame, dtype):
        return self.robot.frame_pose_from(poses, frame, dtype=dtype)

    def transform_point(self, R, p, c):
        return p + R @ jnp.asarray(c, dtype=p.dtype)

    def const_point(self, c, x):
        return jnp.asarray(c, dtype=jnp.asarray(x).dtype)


class _BatchLastOps:
    """Batch-last geometry ops: poses from `joint_poses_bl`, points (3, K)
    (constants broadcast as (3, 1))."""

    def __init__(self, robot: RobotModel):
        self.robot = robot

    def frame_pose(self, poses, frame, dtype):
        return self.robot.frame_pose_from_bl(poses, frame)

    def transform_point(self, R, p, c):
        return p + jnp.einsum("xyk,y->xk", R, jnp.asarray(c, dtype=p.dtype))

    def const_point(self, c, x):
        return jnp.asarray(c, dtype=jnp.asarray(x).dtype)[:, None]


class ManipulatorModel:
    def __init__(self, cfg: SafeMpcConfig, robot: RobotModel | None = None):
        self.cfg = cfg
        if robot is None:
            robot = RobotModel(cfg.urdf_path or asset_path(cfg.urdf_name),
                               n_dofs=cfg.n_dofs)
        self.robot = robot
        self.nq = robot.nq
        self.nv = robot.nq
        self.nx = 2 * robot.nq
        self.nu = robot.nq
        self.dt = cfg.dt

        self.tau_max = np.asarray(robot.tau_max)
        self.tau_min = -self.tau_max

        # Widened model bounds for checks (env_model.py:115-121) and the
        # tightened-back solver bounds (controller.py:45-55).
        x_min = np.hstack([robot.q_min, -robot.dq_max])
        x_max = np.hstack([robot.q_max, robot.dq_max])
        self.bounds_diff = np.abs(x_max - x_min)
        m = cfg.joint_bounds_margin / 100.0
        self.x_min = x_min - self.bounds_diff * m
        self.x_max = x_max + self.bounds_diff * m
        self.lbx = self.x_min + self.bounds_diff * m
        self.ubx = self.x_max - self.bounds_diff * m

        self.ee_frame = cfg.frame_ee
        self.ee_offset = np.asarray(cfg.ee_position)
        self.ee_ref = np.asarray(cfg.ee_ref)

        self._compile_scene(cfg.scene)

    # ------------------------------------------------------------- dynamics

    def step(self, x, u):
        """Discrete double integrator (env_model.py:63-66)."""
        nq, dt = self.nq, self.dt
        q, v = x[..., :nq], x[..., nq:]
        return jnp.concatenate(
            [q + dt * v + 0.5 * dt * dt * u, v + dt * u], axis=-1
        )

    def tau(self, x, u, params: InertialParams | None = None):
        """Inverse-dynamics torque (env_model.py:81-83)."""
        nq = self.nq
        return self.robot.inverse_dynamics(x[:nq], x[nq:], u, params)

    def ee_pos(self, x):
        """Global EE position incl. tool offset (env_model.py:92-95)."""
        return self.robot.frame_position(x[: self.nq], self.ee_frame, self.ee_offset)

    def ee_jac(self, q):
        """(3, nq) linear EE-frame Jacobian (reference jac[:3, 6:])."""
        return self.robot.frame_jacobian(q, self.ee_frame)[:3]

    # ----------------------------------------------------------- integrators

    def plant_step(self, x, u, key, params: InertialParams | None = None):
        """Noisy plant integrator (env_model.py:192-206).

        tau from the (noisy) plant model + Gaussian torque noise, saturated
        to the limits, then forward dynamics on the plant model and the
        double-integrator step. Returns (x_next, u_actual).
        """
        nq = self.nq
        tau = self.robot.inverse_dynamics(x[:nq], x[nq:], u, params)
        sigma = jnp.asarray(self.tau_max) * (self.cfg.control_noise / 100.0)
        tau = tau + sigma * jax.random.normal(key, (self.nu,), dtype=tau.dtype)
        tau_sat = jnp.clip(tau, jnp.asarray(self.tau_min), jnp.asarray(self.tau_max))
        u_act = self.robot.forward_dynamics(x[:nq], x[nq:], tau_sat, params)
        return self.step(x, u_act), u_act

    def step_controller_model(self, x, u, params: InertialParams | None = None):
        """Nominal integrator with saturation only on violation
        (env_model.py:212-224). Branchless: the resolved control is selected
        with `where`, preserving exact pass-through when within bounds."""
        nq = self.nq
        tau = self.robot.inverse_dynamics(x[:nq], x[nq:], u, params)
        in_bounds = jnp.all(
            (tau >= jnp.asarray(self.tau_min) - self.cfg.tol_tau)
            & (tau <= jnp.asarray(self.tau_max) + self.cfg.tol_tau)
        )
        tau_sat = jnp.clip(tau, jnp.asarray(self.tau_min), jnp.asarray(self.tau_max))
        u_sat = self.robot.forward_dynamics(x[:nq], x[nq:], tau_sat, params)
        u_eff = jnp.where(in_bounds, u, u_sat)
        return self.step(x, u_eff), u_eff

    def rollout(self, x0, u_seq):
        """Open-loop rollout of the nominal double integrator (`lax.scan`)."""
        def f(x, u):
            xn = self.step(x, u)
            return xn, xn
        _, xs = jax.lax.scan(f, x0, u_seq)
        return jnp.concatenate([x0[None], xs], axis=0)

    # ------------------------------------------------------------- checks

    def check_state_bounds(self, x):
        """Per-sample bool; reference env_model.py:175-177."""
        tol = self.cfg.tol_x
        return jnp.all(
            (x >= jnp.asarray(self.x_min) - tol) & (x <= jnp.asarray(self.x_max) + tol),
            axis=-1,
        )

    def check_torque_bounds(self, tau):
        # reference tolerance (1e-6) assumes f64 numerics; the f32 solver
        # path resolves constraints to ~1e-4, so widen accordingly
        tol = self.cfg.tol_tau
        if jnp.asarray(tau).dtype == jnp.float32:
            tol = max(tol, 1e-3)
        return jnp.all(
            (tau >= jnp.asarray(self.tau_min) - tol)
            & (tau <= jnp.asarray(self.tau_max) + tol),
            axis=-1,
        )

    def check_collision(self, x):
        """Per-sample bool over all collision rows (env_model.py:236-243)."""
        if not self.collision_rows:
            return jnp.asarray(True)
        vals = self.collision_values(x)
        lo = jnp.asarray([r.check_lo for r in self.collision_rows])
        hi = jnp.asarray([r.check_hi for r in self.collision_rows])
        return jnp.all((vals >= lo) & (vals <= hi), axis=-1)

    def check_dynamics(self, xs, us, tol_scale: float = 1.0):
        """Rollout-consistency check (env_model.py:226-234): re-integrate the
        control sequence with `step_controller_model` and compare. The
        reference tolerance (tol_dyn=1e-6 per node) assumes f64; f32
        round-off across the rollout needs a wider band."""
        def f(x, u):
            xn, _ = self.step_controller_model(x, u)
            return xn, xn
        _, sim = jax.lax.scan(f, xs[0], us)
        sim = jnp.concatenate([xs[:1], sim], axis=0)
        n = us.shape[0]
        tol = self.cfg.tol_dyn
        if jnp.asarray(xs).dtype == jnp.float32:
            tol = max(tol, 2e-4)
        return jnp.linalg.norm(xs - sim) < tol * np.sqrt(n + 1) * tol_scale

    # ------------------------------------------------------------- scene

    def _compile_scene(self, scene: Scene):
        """Resolve collision pairs into scalar residual rows.

        Mirrors the reference two-stage margin plumbing: the parser shrinks
        radii / widens plane bands by ``collision_margin``
        (parser.py:176-194), then the constraint compiler adds ``2 margin``
        back into the solver bounds (env_model.py:264-316). Net effect:
        solver keeps the original clearance, numeric checks use the shrunk
        radii with ``tol_obs`` slack.
        """
        cfg = self.cfg
        margin = cfg.collision_margin
        tol = cfg.tol_obs

        caps: dict[str, dict] = {}
        for c in scene.robot_capsules:
            T = geom.rot_x(c.rotation_offset[0]) @ geom.rot_y(c.rotation_offset[1]) \
                @ geom.rot_z(c.rotation_offset[2])
            P = np.eye(4)
            P[:3, 3] = c.spatial_offset
            T = P @ T
            child = self.robot.urdf.child_joint_of(c.link_name)
            direction = float(np.sign(child.origin_xyz[c.link_axis])) if child is not None else 1.0
            e0 = np.array([0.0, 0.0, 0.0, 1.0])
            e1 = e0.copy()
            e1[c.link_axis] += direction * c.length
            caps[c.name] = dict(kind="robot_capsule", link=c.link_name,
                                radius=c.radius - margin, T=T, e0=e0, e1=e1,
                                length=c.length)
        for c in scene.fixed_capsules:
            caps[c.name] = dict(kind="fixed_capsule", radius=c.radius - margin,
                                a=np.asarray(c.point_a), b=np.asarray(c.point_b))
        planes = {}
        for p in scene.planes:
            planes[p.name] = dict(kind="plane", axis=p.perpendicular_axis,
                                  lo=p.bounds[0] - margin, hi=p.bounds[1] + margin,
                                  real_bound=p.real_bound,
                                  position=np.asarray(p.position))
        spheres = {}
        for s in scene.spheres:
            spheres[s.name] = dict(kind="sphere_obs", radius=s.radius - margin,
                                   position=np.asarray(s.position), bounds=s.bounds)
        rspheres = {}
        for s in scene.robot_spheres:
            rspheres[s.name] = dict(kind="robot_sphere", link=s.link_name,
                                    radius=s.radius - margin,
                                    offset=np.asarray(s.spatial_offset))

        def capsule_points(entry):
            """((x, poses, ops) -> (p0, p1), (anc0, anc1)) for a capsule."""
            if entry["kind"] == "fixed_capsule":
                a, b = entry["a"], entry["b"]
                return (lambda x, poses, ops: (ops.const_point(a, x),
                                               ops.const_point(b, x)),
                        (-1, -1))
            link, T, e0, e1 = entry["link"], entry["T"], entry["e0"], entry["e1"]
            anc = self.robot.frame_support(link)[0]
            # endpoint = link pose applied to a constant local point:
            # ([R p; 0 1] @ T) @ e == R (T[:3,:3] e[:3] + T[:3,3]) + p
            c0 = T[:3, :3] @ e0[:3] + T[:3, 3]
            c1 = T[:3, :3] @ e1[:3] + T[:3, 3]

            def fn(x, poses, ops):
                R, p = ops.frame_pose(poses, link, x.dtype)
                return ops.transform_point(R, p, c0), \
                    ops.transform_point(R, p, c1)
            return fn, (anc, anc)

        rows: list[CollisionRow] = []
        if cfg.obs_flag:
            for name_a, name_b in scene.collision_pairs:
                rows.extend(self._make_pair_rows(
                    name_a, name_b, caps, planes, spheres, rspheres,
                    capsule_points, margin, tol))
        self.collision_rows = rows
        self.n_collision = len(rows)

    def _make_pair_rows(self, name_a, name_b, caps, planes, spheres, rspheres,
                        capsule_points, margin, tol):
        # normalise order: capsule/robot-sphere first (parser.py:262-267)
        if name_a in planes or name_a in spheres:
            name_a, name_b = name_b, name_a
        rows = []
        pair_name = f"{name_a}_{name_b}"
        if name_a in caps and name_b in caps:
            (ea, anc_a) = capsule_points(caps[name_a])
            (eb, anc_b) = capsule_points(caps[name_b])
            ra, rb = caps[name_a]["radius"], caps[name_b]["radius"]
            rows.append(CollisionRow(
                pair_name,
                points_fn=lambda x, poses, ops, ea=ea, eb=eb:
                    ea(x, poses, ops) + eb(x, poses, ops),
                ancs=anc_a + anc_b,
                val_fn=geom.segment_segment_sqdist,
                lo=(ra + rb + 2 * margin) ** 2, hi=1e6,
                check_lo=(ra + rb) ** 2 - tol, check_hi=1e6 + tol))
        elif name_a in caps and name_b in spheres:
            (ea, anc_a) = capsule_points(caps[name_a])
            ra = caps[name_a]["radius"]
            length = caps[name_a]["length"]
            obs = spheres[name_b]
            center = np.asarray(obs["position"])
            rows.append(CollisionRow(
                pair_name,
                points_fn=lambda x, poses, ops, ea=ea, c=center:
                    ea(x, poses, ops) + (ops.const_point(c, x),),
                ancs=anc_a + (-1,),
                val_fn=lambda a0, a1, c, L=length:
                    geom.point_segment_sqdist(a0, a1, L, c),
                lo=(obs["radius"] + ra + 2 * margin) ** 2, hi=1e6,
                check_lo=(obs["radius"] + ra) ** 2 - tol, check_hi=1e6 + tol))
        elif name_a in caps and name_b in planes:
            (ea, anc_a) = capsule_points(caps[name_a])
            ra = caps[name_a]["radius"]
            pl = planes[name_b]
            for pt_idx in range(2):  # one row per capsule endpoint
                rows.append(CollisionRow(
                    f"{pair_name}_{pt_idx}",
                    points_fn=lambda x, poses, ops, ea=ea, k=pt_idx:
                        (ea(x, poses, ops)[k],),
                    ancs=(anc_a[pt_idx],),
                    val_fn=lambda p, ax=pl["axis"]: p[ax],
                    lo=pl["lo"] + ra + 2 * margin, hi=pl["hi"] - ra - 2 * margin,
                    check_lo=pl["lo"] + ra - tol, check_hi=pl["hi"] - ra + tol))
        elif name_a in rspheres and name_b in spheres:
            # reference uses the global EE point for sphere-sphere
            # (env_model.py:300), not the sphere's own FK
            obs = spheres[name_b]
            ra = rspheres[name_a]["radius"]
            center = np.asarray(obs["position"])
            ee_anc = self.robot.frame_support(self.ee_frame)[0]

            def ee_point(x, poses, ops, c=center):
                R, p = ops.frame_pose(poses, self.ee_frame, x.dtype)
                return (ops.transform_point(R, p, self.ee_offset),
                        ops.const_point(c, x))

            rows.append(CollisionRow(
                pair_name, points_fn=ee_point, ancs=(ee_anc, -1),
                val_fn=geom.sphere_sphere_sqdist,
                lo=(ra + obs["radius"] + 2 * margin) ** 2, hi=1e6,
                check_lo=(ra + obs["radius"]) ** 2 - tol, check_hi=1e6 + tol))
        elif name_a in rspheres and name_b in planes:
            sp = rspheres[name_a]
            pl = planes[name_b]
            anc = self.robot.frame_support(sp["link"])[0]

            def sp_point(x, poses, ops, sp=sp):
                R, p0 = ops.frame_pose(poses, sp["link"], x.dtype)
                return (ops.transform_point(R, p0, sp["offset"]),)

            ra = sp["radius"]
            b0 = pl[("lo", "hi")[pl["real_bound"]]]
            rows.append(CollisionRow(
                pair_name, points_fn=sp_point, ancs=(anc,),
                val_fn=lambda p, ax=pl["axis"], b=b0: p[ax] - b,
                lo=pl["lo"] + ra + 2 * margin, hi=pl["hi"] - ra - 2 * margin,
                check_lo=pl["lo"] + ra - tol, check_hi=pl["hi"] - ra + tol))
        else:
            raise ValueError(f"unsupported collision pair ({name_a}, {name_b})")
        return rows

    def collision_values(self, x, poses=None):
        """(n_collision,) stacked residual values at state x (the chain FK
        is computed once and shared across rows)."""
        if not self.collision_rows:
            return jnp.zeros((0,), dtype=jnp.asarray(x).dtype)
        if poses is None:
            poses = self.robot.joint_poses(jnp.asarray(x)[: self.nq])
        ops = _SampleOps(self.robot)
        return jnp.stack([r.fn(x, poses, ops) for r in self.collision_rows])

    def collision_linearize(self, x, poses=None):
        """(values (nc,), Jq (nc, nq)) — row Jacobians via the chain rule
        with closed-form point Jacobians; autodiff only touches the tiny
        geometric expressions, never the kinematic chain."""
        nq = self.nq
        x = jnp.asarray(x)
        if not self.collision_rows:
            return (jnp.zeros((0,), x.dtype), jnp.zeros((0, nq), x.dtype))
        if poses is None:
            poses = self.robot.joint_poses(x[:nq])
        ops = _SampleOps(self.robot)
        vals, Jrows = [], []
        for row in self.collision_rows:
            pts = row.points_fn(x, poses, ops)
            val, pull = jax.vjp(row.val_fn, *pts)
            grads = pull(jnp.ones_like(val))
            J = jnp.zeros(nq, x.dtype)
            for g, anc, pt in zip(grads, row.ancs, pts):
                if anc >= 0:
                    J = J + g @ self.robot.point_jacobian_from(poses, anc, pt)
            vals.append(val)
            Jrows.append(J)
        return jnp.stack(vals), jnp.stack(Jrows)

    def collision_linearize_bl(self, x, poses):
        """Batch-last :meth:`collision_linearize`: x (nx, K), poses from
        `joint_poses_bl` -> (values (nc, K), Jq (nc, nq, K)). Same chain
        rule; every intermediate keeps the batch in the lane axis."""
        nq = self.nq
        K = x.shape[-1]
        if not self.collision_rows:
            return (jnp.zeros((0, K), x.dtype),
                    jnp.zeros((0, nq, K), x.dtype))
        ops = _BatchLastOps(self.robot)
        vals, Jrows = [], []
        for row in self.collision_rows:
            pts = row.points_fn(x, poses, ops)
            val, pull = jax.vjp(row.val_fn, *pts)
            grads = pull(jnp.ones_like(val))
            J = jnp.zeros((nq, K), x.dtype)
            for g, anc, pt in zip(grads, row.ancs, pts):
                if anc >= 0:
                    Jp = self.robot.point_jacobian_bl(poses, anc, pt)
                    J = J + jnp.einsum("xk,qxk->qk", g, Jp)
            vals.append(val)
            Jrows.append(J)
        return jnp.stack(vals), jnp.stack(Jrows)

    @property
    def collision_bounds(self):
        lo = np.array([r.lo for r in self.collision_rows])
        hi = np.array([r.hi for r in self.collision_rows])
        return lo, hi
