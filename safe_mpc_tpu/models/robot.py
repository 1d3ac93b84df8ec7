"""JAX rigid-body model: kinematics + Lagrangian dynamics from URDF.

TPU-native replacement for the reference's adam-robotics ``KinDynComputations``
(reference env_model.py:40-53). The reference builds CasADi graphs for the
mass matrix (CRBA), bias force (RNEA), gravity and forward kinematics of a
floating-base model and slices the actuated block ``[6:, 6:]``
(env_model.py:81-83). For a fixed-base arm with identity base pose and zero
base velocity — which is how the reference always evaluates them — that is
numerically identical to the plain fixed-base quantities computed here.

Design (idiomatic JAX, no algorithm translation):

* Forward kinematics is an unrolled trace-time chain product (nq <= ~7).
* The mass matrix is assembled by the Jacobian ("projected Newton-Euler")
  method: ``M(q) = sum_b m_b Jv_b^T Jv_b + Jw_b^T (R_b I_b R_b^T) Jw_b``,
  one einsum over bodies — MXU-friendly and exactly equal to CRBA.
* The bias force uses autodiff on the Lagrangian instead of an RNEA sweep:
  ``h(q, v) = dM/dt(q; v) v - 1/2 * d(v^T M v)/dq + dU/dq`` where
  ``U(q)`` is gravitational potential energy. ``dM/dt v`` is one `jax.jvp`.
  This is exact (not approximate) and differentiates cleanly for the
  constraint linearization used by the RTI solver.
* Inertial parameters are a *runtime pytree* (:class:`InertialParams`), so
  model-noise ensembles are just batched parameters under `vmap`
  (replacing URDF text rewriting, reference utils.py:126-171).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .urdf import UrdfRobot, parse_urdf

GRAVITY = 9.80665

_REVOLUTE, _PRISMATIC = 0, 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class InertialParams:
    """Per-body inertial parameters (runtime arrays; batch with `vmap`).

    ``inertia`` is the rotational inertia about the body COM in the body
    (link) frame, as in URDF ``<inertial>``.
    """

    mass: jax.Array      # (nb,)
    com: jax.Array       # (nb, 3)
    inertia: jax.Array   # (nb, 3, 3)

    def perturbed(self, key: jax.Array, noise_mass: float, noise_inertia: float,
                  noise_cm: float) -> "InertialParams":
        """Uniform relative perturbation of every inertial entry.

        Mirrors the reference URDF randomizer semantics (utils.py:126-171):
        each mass, inertia entry and COM coordinate is perturbed by
        Uniform(-p, p) where p = |value| * noise_percent / 100.
        """
        km, ki, kc = jax.random.split(key, 3)
        um = jax.random.uniform(km, self.mass.shape, minval=-1.0, maxval=1.0)
        ui = jax.random.uniform(ki, self.inertia.shape, minval=-1.0, maxval=1.0)
        ui = 0.5 * (ui + jnp.swapaxes(ui, -1, -2))  # keep inertia symmetric
        uc = jax.random.uniform(kc, self.com.shape, minval=-1.0, maxval=1.0)
        return InertialParams(
            mass=self.mass + jnp.abs(self.mass) * (noise_mass / 100.0) * um,
            inertia=self.inertia + jnp.abs(self.inertia) * (noise_inertia / 100.0) * ui,
            com=self.com + jnp.abs(self.com) * (noise_cm / 100.0) * uc,
        )


def _rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _make_T(R: np.ndarray, p: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = p
    return T


class RobotModel:
    """Static robot description + pure JAX kinematics/dynamics functions.

    Instances are plain Python objects holding numpy constants; they are
    captured by closure inside jitted functions (never traced). All methods
    taking `q`/`v` arrays are jit/vmap-safe.
    """

    def __init__(self, urdf: UrdfRobot | str, n_dofs: int | None = None,
                 actuated_joints: list[str] | None = None):
        if isinstance(urdf, str):
            urdf = parse_urdf(urdf)
        self.urdf = urdf
        movable = urdf.movable_joints()
        if actuated_joints is not None:
            sel = [urdf.joint(n) for n in actuated_joints]
        else:
            n = n_dofs if n_dofs is not None else len(movable)
            sel = movable[:n]
        self.joint_names = [j.name for j in sel]
        self.nq = len(sel)
        actuated_set = set(self.joint_names)

        # Walk the tree from the root; compose fixed/locked joints (at q=0)
        # into the pre-transform of the next actuated joint below them.
        root = urdf.root_link()
        # parent actuated-joint index for each link, and offset from that
        # joint's child-link frame to the link frame (identity composition of
        # fixed/locked joints along the way).
        self._link_support: dict[str, tuple[int, np.ndarray]] = {root: (-1, np.eye(4))}
        self._T_pre = np.zeros((self.nq, 4, 4))
        self._parent = np.full(self.nq, -1, dtype=np.int64)
        axes, types = [], []
        q_min, q_max, dq_max, tau_max = [], [], [], []

        stack = [root]
        jidx = {}
        while stack:
            link = stack.pop()
            anc, offset = self._link_support[link]
            for j in urdf.joints:
                if j.parent != link:
                    continue
                T_origin = _make_T(_rpy_matrix(j.origin_rpy), j.origin_xyz)
                if j.type != "fixed" and j.name in actuated_set:
                    i = self.joint_names.index(j.name)
                    jidx[j.name] = i
                    self._T_pre[i] = offset @ T_origin
                    self._parent[i] = anc
                    axes.append(j.axis / np.linalg.norm(j.axis))
                    types.append(_REVOLUTE if j.type == "revolute" else _PRISMATIC)
                    q_min.append(j.lower)
                    q_max.append(j.upper)
                    dq_max.append(j.velocity)
                    tau_max.append(j.effort)
                    self._link_support[j.child] = (i, np.eye(4))
                else:
                    # fixed joint, or movable joint locked at q = 0
                    self._link_support[j.child] = (anc, offset @ T_origin)
                stack.append(j.child)

        # reorder axis/limit arrays to joint order (walk order may differ)
        order = np.argsort([jidx[n] for n in jidx])
        # jidx insertion order == walk order; rebuild in joint_names order:
        by_name = {n: k for k, n in enumerate(jidx)}
        perm = [by_name[n] for n in self.joint_names]
        self.joint_axes = np.array(axes)[perm]
        self.joint_types = tuple(np.array(types)[perm].tolist())
        self.q_min = np.array(q_min)[perm]
        self.q_max = np.array(q_max)[perm]
        self.dq_max = np.array(dq_max)[perm]
        self.tau_max = np.array(tau_max)[perm]
        del order

        # Inertial bodies: every link with an <inertial>, attached to its
        # supporting actuated joint with a constant offset transform.
        self._bodies: list[tuple[str, int, np.ndarray]] = []
        masses, coms, inertias = [], [], []
        for link in urdf.links:
            if link.inertial is None or link.name not in self._link_support:
                continue
            anc, offset = self._link_support[link.name]
            self._bodies.append((link.name, anc, offset))
            masses.append(link.inertial.mass)
            coms.append(link.inertial.com)
            inertias.append(link.inertial.inertia)
        self.default_params = InertialParams(
            mass=jnp.array(masses), com=jnp.array(coms), inertia=jnp.array(inertias)
        )
        self.nb = len(self._bodies)
        # ancestry mask: body b is moved by joint i iff i is on the chain
        # from the root to b's supporting joint.
        self._body_anc = np.zeros((self.nb, self.nq))
        for b, (_, anc, _) in enumerate(self._bodies):
            i = anc
            while i >= 0:
                self._body_anc[b, i] = 1.0
                i = self._parent[i]
        self._body_support = np.array([b[1] for b in self._bodies], dtype=np.int64)
        self._body_offset = np.array([b[2] for b in self._bodies])
        # joint-ancestry masks for the closed-form derivative tensors:
        # _joint_anc[i, k] = 1 iff joint k is on the chain root..i (incl. i);
        # _strict_anc excludes i itself (a_i, p_i don't depend on q_i).
        self._joint_anc = np.stack([self._chain_mask(i) for i in range(self.nq)])
        self._strict_anc = self._joint_anc - np.eye(self.nq)
        self._all_revolute = all(t == _REVOLUTE for t in self.joint_types)

    # ---------------------------------------------------------------- frames

    def frame_support(self, frame: str) -> tuple[int, np.ndarray]:
        """(supporting actuated joint index, constant offset transform)."""
        if frame not in self._link_support:
            raise KeyError(f"frame {frame!r} unknown")
        return self._link_support[frame]

    # ------------------------------------------------------------ kinematics

    def _joint_poses(self, q):
        """World pose of every actuated joint's child-link frame.

        Returns (R: (nq,3,3), p: (nq,3), axis_w: (nq,3)) stacked as jnp.
        """
        q = jnp.asarray(q)
        Rs, ps, axes_w = [], [], []
        R_par = [jnp.eye(3, dtype=q.dtype)] * 1
        for i in range(self.nq):
            if self._parent[i] < 0:
                Rp, pp = jnp.eye(3, dtype=q.dtype), jnp.zeros(3, dtype=q.dtype)
            else:
                Rp, pp = Rs[self._parent[i]], ps[self._parent[i]]
            T_pre = jnp.asarray(self._T_pre[i], dtype=q.dtype)
            R0 = Rp @ T_pre[:3, :3]
            p0 = pp + Rp @ T_pre[:3, 3]
            axis = jnp.asarray(self.joint_axes[i], dtype=q.dtype)
            if self.joint_types[i] == _REVOLUTE:
                Rj = _axis_angle(axis, q[i])
                R_i = R0 @ Rj
                p_i = p0
            else:
                R_i = R0
                p_i = p0 + R0 @ (axis * q[i])
            a_w = R0 @ axis
            Rs.append(R_i)
            ps.append(p_i)
            axes_w.append(a_w)
        return jnp.stack(Rs), jnp.stack(ps), jnp.stack(axes_w)

    def joint_poses(self, q):
        """Public chain FK: (R (nq,3,3), p (nq,3), axes_w (nq,3)). Compute
        once and reuse via `frame_pose_from` when several frames are needed
        at the same configuration (keeps traced graphs small)."""
        return self._joint_poses(jnp.asarray(q))

    def frame_pose_from(self, poses, frame: str, dtype=None):
        """(R, p) of a named frame from precomputed `joint_poses` results."""
        anc, offset = self.frame_support(frame)
        R, p, _ = poses
        off = jnp.asarray(offset, dtype=dtype or R.dtype)
        if anc < 0:
            return off[:3, :3], off[:3, 3]
        Rf = R[anc] @ off[:3, :3]
        pf = p[anc] + R[anc] @ off[:3, 3]
        return Rf, pf

    def frame_pose(self, q, frame: str):
        """(R, p) world pose of a named link frame."""
        anc, offset = self.frame_support(frame)
        q = jnp.asarray(q)
        if anc < 0:
            off = jnp.asarray(offset, dtype=q.dtype)
            return off[:3, :3], off[:3, 3]
        return self.frame_pose_from(self._joint_poses(q), frame, dtype=q.dtype)

    def frame_position(self, q, frame: str, local_offset=None):
        """World position of a point given in a link frame (the reference's
        ``T[:3,3] + T[:3,:3] @ t_loc`` pattern, env_model.py:92-95)."""
        R, p = self.frame_pose(q, frame)
        if local_offset is None:
            return p
        return p + R @ jnp.asarray(local_offset, dtype=p.dtype)

    def _chain_mask(self, anc: int) -> np.ndarray:
        chain = np.zeros(self.nq)
        i = anc
        while i >= 0:
            chain[i] = 1.0
            i = self._parent[i]
        return chain

    def _point_jacobian(self, q, anc: int, point_w, joint_R, joint_p, axes_w):
        """Linear+angular Jacobian (3, nq) pair of a point supported by joint
        `anc` — vectorized over columns (masked cross products)."""
        chain = jnp.asarray(self._chain_mask(anc), dtype=point_w.dtype)
        rev = jnp.asarray(
            [1.0 if t == _REVOLUTE else 0.0 for t in self.joint_types],
            dtype=point_w.dtype)
        d = point_w[None, :] - joint_p                      # (nq, 3)
        Jv_rev = jnp.cross(axes_w, d)                        # (nq, 3)
        Jv = chain[:, None] * (rev[:, None] * Jv_rev + (1 - rev)[:, None] * axes_w)
        Jw = (chain * rev)[:, None] * axes_w
        return Jv.T, Jw.T

    def point_jacobian_from(self, poses, anc: int, point_w):
        """(3, nq) linear Jacobian of a world point rigidly attached to the
        body supported by joint `anc`, from precomputed `joint_poses` —
        closed form (masked cross products), no autodiff."""
        R, p, axes_w = poses
        if anc < 0:
            return jnp.zeros((3, self.nq), dtype=point_w.dtype)
        Jv, _ = self._point_jacobian(None, anc, point_w, R, p, axes_w)
        return Jv

    def _hessian_masks(self, anc: int, dtype):
        """(mask_os, mask_s): [k, l] = 1 iff joint k is an ancestor(-or-self
        / strict ancestor) of joint l with both on the chain to `anc`."""
        chain = self._chain_mask(anc)
        both = np.outer(chain, chain)
        mask_os = self._joint_anc.T * both
        mask_s = self._strict_anc.T * both
        return jnp.asarray(mask_os, dtype), jnp.asarray(mask_s, dtype)

    def point_hessian_from(self, poses, anc: int, point_w):
        """(3, nq, nq) second derivative d^2 point / dq_k dq_l of a world
        point rigidly attached to the body supported by joint `anc`,
        closed form (revolute chains).

        Geometric identity: for joints k <= l on the chain (k ancestor-or-
        self of l, with dp/dq_l = a_l x (p - p_l)),
            H_kl = (a_k x a_l) x (p - p_l) + a_l x (a_k x (p - p_l)),
        using da_l/dq_k = a_k x a_l and d(p - p_l)/dq_k = a_k x (p - p_l);
        H is symmetric in (k, l). Pinned against jacfwd^2 by tests.
        """
        assert self._all_revolute, "closed-form point Hessian needs revolute"
        R, p, a = poses
        dtype = point_w.dtype
        if anc < 0:
            return jnp.zeros((3, self.nq, self.nq), dtype)
        mask_os, mask_s = self._hessian_masks(anc, dtype)
        d = point_w[None] - p                            # (l, 3): p - p_l
        akxal = jnp.cross(a[:, None], a[None, :])        # (k, l, 3)
        akxd = jnp.cross(a[:, None], d[None, :])         # (k, l, 3)
        U = jnp.cross(akxal, d[None, :]) \
            + jnp.cross(a[None, :], akxd)                # (k, l, 3)
        H = U * mask_os[:, :, None] \
            + jnp.swapaxes(U * mask_s[:, :, None], 0, 1)
        return jnp.moveaxis(H, 2, 0)

    def point_hessian_bl(self, poses, anc: int, point_w):
        """Batch-last :meth:`point_hessian_from`: (nq, nq, 3, K) with
        [k, l] = d^2(point)/dq_k dq_l."""
        assert self._all_revolute, "closed-form point Hessian needs revolute"
        R, p, a = poses                                  # a: (nq, 3, K)
        dtype = point_w.dtype
        if anc < 0:
            return jnp.zeros((self.nq, self.nq, 3) + point_w.shape[-1:],
                             dtype)
        mask_os, mask_s = self._hessian_masks(anc, dtype)

        def cr(x, y):
            return jnp.cross(x, y, axisa=-2, axisb=-2, axisc=-2)

        d = point_w[None] - p                            # (l, 3, K)
        akxal = cr(a[:, None], a[None, :])               # (k, l, 3, K)
        akxd = cr(a[:, None], d[None, :])                # (k, l, 3, K)
        U = cr(akxal, d[None, :]) + cr(a[None, :], akxd)
        return U * mask_os[:, :, None, None] \
            + jnp.swapaxes(U * mask_s[:, :, None, None], 0, 1)

    # ------------------------------------------------ batch-last kinematics
    #
    # TPU layout note: under `vmap` the problem batch leads, so every tiny
    # (5, 5) / (5, 3) trailing dim is padded to an (8, 128) register tile —
    # a ~40x memory blowup that makes the linearization HBM-bound (measured:
    # the closed-form stack ran at the same 24 us/node as the AD tower).
    # The *_bl variants keep the batch K as the MINOR axis so it fills the
    # 128-lane dimension, and all tensor indices lead; per-op padding drops
    # to <2x. Same math as the per-sample methods (pinned by tests).

    def joint_poses_bl(self, q):
        """Batch-last chain FK: q (nq, K) -> (R (nq, 3, 3, K), p (nq, 3, K),
        axes_w (nq, 3, K)). Mirrors :meth:`joint_poses`."""
        K = q.shape[-1]
        dtype = q.dtype
        Rs, ps, aws = [], [], []
        for i in range(self.nq):
            if self._parent[i] < 0:
                Rp = jnp.broadcast_to(
                    jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, K))
                pp = jnp.zeros((3, K), dtype)
            else:
                Rp, pp = Rs[self._parent[i]], ps[self._parent[i]]
            T_pre = np.asarray(self._T_pre[i])
            R0 = jnp.einsum("xyk,yz->xzk", Rp, jnp.asarray(T_pre[:3, :3], dtype))
            p0 = pp + jnp.einsum("xyk,y->xk", Rp, jnp.asarray(T_pre[:3, 3], dtype))
            axis = np.asarray(self.joint_axes[i])
            a_w = jnp.einsum("xyk,y->xk", R0, jnp.asarray(axis, dtype))
            if self.joint_types[i] == _REVOLUTE:
                Khat = np.array([[0.0, -axis[2], axis[1]],
                                 [axis[2], 0.0, -axis[0]],
                                 [-axis[1], axis[0], 0.0]])
                K2 = Khat @ Khat
                s, c = jnp.sin(q[i]), jnp.cos(q[i])          # (K,)
                Rj = (jnp.eye(3, dtype=dtype)[:, :, None]
                      + jnp.asarray(Khat, dtype)[:, :, None] * s
                      + jnp.asarray(K2, dtype)[:, :, None] * (1.0 - c))
                R_i = jnp.einsum("xyk,yzk->xzk", R0, Rj)
                p_i = p0
            else:
                R_i = R0
                p_i = p0 + a_w * q[i][None, :]
            Rs.append(R_i)
            ps.append(p_i)
            aws.append(a_w)
        return jnp.stack(Rs), jnp.stack(ps), jnp.stack(aws)

    def frame_pose_from_bl(self, poses, frame: str):
        """Batch-last :meth:`frame_pose_from`: (R (3,3,K), p (3,K))."""
        anc, offset = self.frame_support(frame)
        R, p, _ = poses
        dtype = p.dtype
        off = jnp.asarray(offset, dtype)
        if anc < 0:
            K = p.shape[-1]
            return (jnp.broadcast_to(off[:3, :3, None], (3, 3, K)),
                    jnp.broadcast_to(off[:3, 3, None], (3, K)))
        Rf = jnp.einsum("xyk,yz->xzk", R[anc], off[:3, :3])
        pf = p[anc] + jnp.einsum("xyk,y->xk", R[anc], off[:3, 3])
        return Rf, pf

    def point_jacobian_bl(self, poses, anc: int, point_w):
        """Batch-last linear point Jacobian: (nq, 3, K) with row k =
        d(point)/dq_k (masked cross products; :meth:`point_jacobian_from`)."""
        R, p, axes_w = poses
        dtype = point_w.dtype
        if anc < 0:
            return jnp.zeros((self.nq, 3) + point_w.shape[-1:], dtype)
        chain = jnp.asarray(self._chain_mask(anc), dtype)[:, None, None]
        rev = jnp.asarray(
            [1.0 if t == _REVOLUTE else 0.0 for t in self.joint_types],
            dtype)[:, None, None]
        d = point_w[None] - p                                  # (nq, 3, K)
        Jv_rev = jnp.cross(axes_w, d, axisa=-2, axisb=-2, axisc=-2)
        return chain * (rev * Jv_rev + (1 - rev) * axes_w)

    def _body_frames_bl(self, R, p, params: InertialParams):
        """Batch-last body frames: (Rb (nb, 3, 3, K), pb (nb, 3, K))."""
        sup = self._body_support
        dtype = R.dtype
        mask = jnp.asarray((sup >= 0).astype(np.float64),
                           dtype)[:, None, None, None]
        sup_c = np.clip(sup, 0, None)
        off = jnp.asarray(self._body_offset, dtype)
        Rsup = mask * R[sup_c] + (1 - mask) * jnp.eye(3, dtype=dtype)[:, :, None]
        psup = mask[:, :, 0] * p[sup_c]
        Rb = jnp.einsum("bxyk,byz->bxzk", Rsup, off[:, :3, :3])
        ob = psup + jnp.einsum("bxyk,by->bxk", Rsup, off[:, :3, 3])
        pb = ob + jnp.einsum("bxyk,by->bxk", Rb, params.com.astype(dtype))
        return Rb, pb

    def kin_derivatives_bl(self, q, params: InertialParams | None = None,
                           order: int = 2, poses=None):
        """Batch-last closed-form derivative stack (all-revolute chains).

        q (nq, K) -> order=1: (M (nq,nq,K), dM (nq,nq,nq,K), gU (nq,K));
        order=2 additionally (ddM (nq,nq,nq,nq,K), HU (nq,nq,K)) in the
        order (M, dM, ddM, gU, HU). Same recursions as
        :meth:`_kin_derivatives`, batch minor.

        Contractions use :func:`~safe_mpc_tpu.utils.lanes.ms` (broadcast
        mul + leading-axis sum) instead of einsum: einsum's dot_general
        lowering makes the shared lane axis a dot BATCH dim, which XLA
        lays out major — each (nq^4, K) intermediate then pads 41x
        (measured: 1.27 GB for 32 MB, OOM on a 16 GB chip)."""
        assert self._all_revolute, "closed-form stack needs revolute joints"
        from ..utils.lanes import ms

        params = self.default_params if params is None else params
        dtype = q.dtype
        if poses is None:
            poses = self.joint_poses_bl(q)
        R, p, a = poses
        Rb, pb = self._body_frames_bl(R, p, params)
        S = jnp.asarray(self._strict_anc, dtype)      # (nq_i, nq_k)
        Cb = jnp.asarray(self._body_anc, dtype)       # (nb, nq)
        m = params.mass.astype(dtype)
        Iw = ms("bxy,byz,bwz->bxw", Rb, params.inertia.astype(dtype), Rb)

        def cr(x, y):
            return jnp.cross(x, y, axisa=-2, axisb=-2, axisc=-2)

        # first-order tensors, index [i, k, xyz, K]
        da = S[:, :, None, None] * cr(a[None], a[:, None])
        d_ip = p[:, None] - p[None]                    # p_i - p_k
        dp = S[:, :, None, None] * cr(a[None], d_ip)
        d_bp = pb[:, None] - p[None]                   # pb_b - p_k
        dpb = Cb[:, :, None, None] * cr(a[None], d_bp)   # == Jv[b, k]
        Jw = Cb[:, :, None, None] * a[None]
        A_hat = _hat_bl(a)                             # (nq, 3, 3, K)
        dIw = Cb[:, :, None, None, None] * (
            ms("kxy,byz->bkxz", A_hat, Iw) - ms("bxy,kyz->bkxz", Iw, A_hat))

        ddpb = Cb[:, :, None, None, None] * (
            cr(da[None], d_bp[:, :, None])
            + cr(a[None, :, None], dpb[:, None] - dp[None]))
        dJw = Cb[:, :, None, None, None] * da[None]    # (b, p, k, 3, K)

        M = ms("b,bpx,bqx->pq", m, dpb, dpb) \
            + ms("bpx,bxy,bqy->pq", Jw, Iw, Jw)
        gU = GRAVITY * ms("b,bk->k", m, dpb[:, :, 2])

        dM_lin = ms("b,bpkx,bqx->pqk", m, ddpb, dpb)
        dM = (dM_lin + jnp.swapaxes(dM_lin, 0, 1)
              + ms("bpkx,bxy,bqy->pqk", dJw, Iw, Jw)
              + ms("bpx,bkxy,bqy->pqk", Jw, dIw, Jw)
              + ms("bpx,bxy,bqky->pqk", Jw, Iw, dJw))
        if order == 1:
            return M, dM, gU

        dda = S[:, :, None, None, None] * (
            cr(da[None], a[:, None, None])
            + cr(a[None, :, None], da[:, None]))
        ddp = S[:, :, None, None, None] * (
            cr(da[None], d_ip[:, :, None])
            + cr(a[None, :, None], dp[:, None] - dp[None]))
        dda_hat = _hat_bl(da)                          # (k, l, 3, 3, K)
        ddIw = Cb[:, :, None, None, None, None] * (
            ms("klxy,byz->bklxz", dda_hat, Iw)
            - ms("bxy,klyz->bklxz", Iw, dda_hat)
            + ms("kxy,blyz->bklxz", A_hat, dIw)
            - ms("blxy,kyz->bklxz", dIw, A_hat))
        dddpb = Cb[:, :, None, None, None, None] * (
            cr(dda[None], d_bp[:, :, None, None])
            + cr(da[None, :, :, None],
                 dpb[:, None, None] - dp[None, :, None])
            + cr(da[None, :, None],
                 dpb[:, None, :, None] - dp[None, :, :, None])
            + cr(a[None, :, None, None], ddpb[:, None] - ddp[None]))
        ddJw = Cb[:, :, None, None, None, None] * dda[None]

        A2 = ms("bpkx,blxy,bqy->pqkl", dJw, dIw, Jw)
        half = (ms("b,bpklx,bqx->pqkl", m, dddpb, dpb)
                + ms("b,bpkx,bqlx->pqkl", m, ddpb, ddpb)
                + ms("bpklx,bxy,bqy->pqkl", ddJw, Iw, Jw)
                + A2 + jnp.swapaxes(A2, 2, 3)
                + ms("bpkx,bxy,bqly->pqkl", dJw, Iw, dJw)
                + 0.5 * ms("bpx,bklxy,bqy->pqkl", Jw, ddIw, Jw))
        ddM = half + jnp.transpose(half, (1, 0, 2, 3, 4))
        HU = GRAVITY * ms("b,bkl->kl", m, ddpb[:, :, :, 2])
        return M, dM, ddM, gU, HU

    def dynamics_derivative_stack(self, q, params: InertialParams | None = None):
        """(M, dM, ddM, gU, HU): the mass matrix, its first and second
        configuration derivatives, and the gravity gradient/Hessian.

        Everything the RTI linearization needs from the dynamics reduces to
        contractions of these small tensors (nq<=7: ddM is nq^4 <= 2401
        floats) — the 'analytic sensitivities' path that keeps heavy
        autodiff towers out of the per-node hot loop.

        All-revolute chains (the Z1) use the closed-form geometric
        recursions (:meth:`_kin_derivatives`) — ~10x fewer ops than the
        nested-jacfwd tower, which re-evaluates the mass matrix once per
        tangent (~(1+nq)^2 times). Mixed chains fall back to the AD oracle.
        The two paths are pinned against each other by tests/test_robot.py.
        """
        if self._all_revolute:
            return self._kin_derivatives(q, params, order=2)
        return self.dynamics_derivative_stack_ad(q, params)

    def dynamics_derivative_stack_ad(self, q,
                                     params: InertialParams | None = None):
        """Autodiff oracle for :meth:`dynamics_derivative_stack` (nested
        jacfwd); kept as the correctness reference for the closed form."""
        q = jnp.asarray(q)
        Mfun = lambda qq: self.mass_matrix(qq, params)
        M = Mfun(q)
        dM = jax.jacfwd(Mfun)(q)                 # (nq,nq,nq): dM_ij/dq_k
        ddM = jax.jacfwd(jax.jacfwd(Mfun))(q)    # (nq,nq,nq,nq)
        Ufun = lambda qq: self.potential_energy(qq, params)
        gU = jax.grad(Ufun)(q)
        HU = jax.jacfwd(jax.grad(Ufun))(q)
        return M, dM, ddM, gU, HU

    def _kin_derivatives(self, q, params: InertialParams | None, order: int):
        """Closed-form (M, dM[, ddM], gU[, HU]) for all-revolute chains.

        Geometric derivative calculus: for revolute joint k with world axis
        a_k through point p_k, any point x and free vector w rigidly
        attached below k satisfy  dx/dq_k = a_k x (x - p_k)  and
        dw/dq_k = a_k x w.  These rules close under differentiation, so
        first/second/third derivatives of the body COM positions (= the
        linear point Jacobians and their derivatives) and first/second
        derivatives of the joint axes (= the angular Jacobians') are all
        masked cross-product einsums over (nb, nq, nq, nq, 3) tensors —
        no autodiff, no FK replays. With
          Jv[b,p] = dpb[b,p],  Jw[b,p] = Cb[b,p] a_p,
          M = sum_b m_b Jv' Jv + Jw' Iw Jw,
        dM/ddM follow by the product rule; gravity gU/HU are the z-rows of
        dpb/ddpb. order=1 returns (M, dM, gU); order=2 returns
        (M, dM, ddM, gU, HU).
        """
        params = self.default_params if params is None else params
        q = jnp.asarray(q)
        dtype = q.dtype
        R, p, a = self._joint_poses(q)
        Rb, pb = self._body_frames_from(R, p, params)
        S = jnp.asarray(self._strict_anc, dtype)       # (nq, nq) [i, k]
        Cb = jnp.asarray(self._body_anc, dtype)        # (nb, nq)
        m = params.mass.astype(dtype)
        Iw = jnp.einsum("bij,bjk,blk->bil", Rb, params.inertia.astype(dtype),
                        Rb)

        # ---- first-order tensors (index convention: d?[i, k] = d(?_i)/dq_k)
        da = S[:, :, None] * jnp.cross(a[None, :, :], a[:, None, :])
        d_ip = p[:, None, :] - p[None, :, :]            # p_i - p_k
        dp = S[:, :, None] * jnp.cross(a[None, :, :], d_ip)
        d_bp = pb[:, None, :] - p[None, :, :]           # pb_b - p_k
        dpb = Cb[:, :, None] * jnp.cross(a[None, :, :], d_bp)  # == Jv[b,k]
        Jw = Cb[:, :, None] * a[None, :, :]
        A_hat = _hat(a)                                 # (nq, 3, 3)
        dIw = Cb[:, :, None, None] * (
            jnp.einsum("kxy,byz->bkxz", A_hat, Iw)
            - jnp.einsum("bxy,kyz->bkxz", Iw, A_hat))

        # ---- second derivatives of pb (= dJv) — needed already for dM
        ddpb = Cb[:, :, None, None] * (
            jnp.cross(da[None, :, :, :], d_bp[:, :, None, :])
            + jnp.cross(a[None, :, None, :],
                        dpb[:, None, :, :] - dp[None, :, :, :]))
        dJw = Cb[:, :, None, None] * da[None, :, :, :]  # (b, p, k, 3)

        M = jnp.einsum("b,bpx,bqx->pq", m, dpb, dpb) \
            + jnp.einsum("bpx,bxy,bqy->pq", Jw, Iw, Jw)
        gU = GRAVITY * jnp.einsum("b,bk->k", m, dpb[:, :, 2])

        dM_lin = jnp.einsum("b,bpkx,bqx->pqk", m, ddpb, dpb)
        dM = (dM_lin + jnp.swapaxes(dM_lin, 0, 1)
              + jnp.einsum("bpkx,bxy,bqy->pqk", dJw, Iw, Jw)
              + jnp.einsum("bpx,bkxy,bqy->pqk", Jw, dIw, Jw)
              + jnp.einsum("bpx,bxy,bqky->pqk", Jw, Iw, dJw))
        if order == 1:
            return M, dM, gU

        # ---- second-order tensors
        dda = S[:, :, None, None] * (
            jnp.cross(da[None, :, :, :], a[:, None, None, :])
            + jnp.cross(a[None, :, None, :], da[:, None, :, :]))
        ddp = S[:, :, None, None] * (
            jnp.cross(da[None, :, :, :], d_ip[:, :, None, :])
            + jnp.cross(a[None, :, None, :],
                        dp[:, None, :, :] - dp[None, :, :, :]))
        dda_hat = _hat(da)                              # (k, l, 3, 3)
        ddIw = Cb[:, :, None, None, None] * (
            jnp.einsum("klxy,byz->bklxz", dda_hat, Iw)
            - jnp.einsum("bxy,klyz->bklxz", Iw, dda_hat)
            + jnp.einsum("kxy,blyz->bklxz", A_hat, dIw)
            - jnp.einsum("blxy,kyz->bklxz", dIw, A_hat))
        # third derivative of pb (= ddJv), (b, k, l, n, 3)
        dddpb = Cb[:, :, None, None, None] * (
            jnp.cross(dda[None, :, :, :, :], d_bp[:, :, None, None, :])
            + jnp.cross(da[None, :, :, None, :],
                        dpb[:, None, None, :, :] - dp[None, :, None, :, :])
            + jnp.cross(da[None, :, None, :, :],
                        dpb[:, None, :, None, :] - dp[None, :, :, None, :])
            + jnp.cross(a[None, :, None, None, :],
                        ddpb[:, None, :, :, :] - ddp[None, :, :, :, :]))
        ddJw = Cb[:, :, None, None, None] * dda[None]   # (b, p, k, l, 3)

        # product rule over M[p,q] = sum_b m dpb[p].dpb[q] + Jw[p].Iw.Jw[q]:
        # `half` collects one representative of each (p<->q)-symmetric term
        # pair (the middle matrices dIw/ddIw are symmetric, so the p<->q
        # image of u.X.w is w.X.u); adding the transpose completes the sum.
        A2 = jnp.einsum("bpkx,blxy,bqy->pqkl", dJw, dIw, Jw)
        half = (jnp.einsum("b,bpklx,bqx->pqkl", m, dddpb, dpb)
                + jnp.einsum("b,bpkx,bqlx->pqkl", m, ddpb, ddpb)
                + jnp.einsum("bpklx,bxy,bqy->pqkl", ddJw, Iw, Jw)
                + A2 + jnp.swapaxes(A2, 2, 3)
                + jnp.einsum("bpkx,bxy,bqly->pqkl", dJw, Iw, dJw)
                + 0.5 * jnp.einsum("bpx,bklxy,bqy->pqkl", Jw, ddIw, Jw))
        ddM = half + jnp.transpose(half, (1, 0, 2, 3))
        HU = GRAVITY * jnp.einsum("b,bkl->kl", m, ddpb[:, :, :, 2])
        return M, dM, ddM, gU, HU

    def frame_jacobian(self, q, frame: str, local_offset=None):
        """(6, nq) world-frame Jacobian [linear; angular] of a link frame.

        Matches the mixed-representation frame Jacobian's actuated block
        (``jac(eye(4), q)[:3, 6:]`` in the reference, safe_set.py:149) for a
        fixed base.
        """
        anc, _ = self.frame_support(frame)
        q = jnp.asarray(q)
        R, p, axes_w = self._joint_poses(q)
        pt = self.frame_position(q, frame, local_offset)
        if anc < 0:
            return jnp.zeros((6, self.nq), dtype=q.dtype)
        Jv, Jw = self._point_jacobian(q, anc, pt, R, p, axes_w)
        return jnp.concatenate([Jv, Jw], axis=0)

    # -------------------------------------------------------------- dynamics

    def _body_frames_from(self, R, p, params: InertialParams):
        """World rotation + COM position of every inertial body, vectorized
        over bodies (gather over supporting joints + masked base case)."""
        sup = self._body_support                                # (nb,)
        mask = jnp.asarray((sup >= 0).astype(np.float64), dtype=R.dtype)[:, None, None]
        sup_c = np.clip(sup, 0, None)
        off = jnp.asarray(self._body_offset, dtype=R.dtype)     # (nb, 4, 4)
        Rsup = mask * R[sup_c] + (1 - mask) * jnp.eye(3, dtype=R.dtype)
        psup = mask[:, :, 0] * p[sup_c]
        Rb = jnp.einsum("bij,bjk->bik", Rsup, off[:, :3, :3])
        ob = psup + jnp.einsum("bij,bj->bi", Rsup, off[:, :3, 3])
        pb = ob + jnp.einsum("bij,bj->bi", Rb, params.com)
        return Rb, pb

    def _body_frames(self, q, params: InertialParams):
        R, p, _ = self._joint_poses(jnp.asarray(q))
        return self._body_frames_from(R, p, params)

    def mass_matrix(self, q, params: InertialParams | None = None):
        """Joint-space mass matrix M(q), (nq, nq). Equals CRBA / the
        reference's ``mass(H_b, q)[6:, 6:]`` (env_model.py:81).

        Assembled as one masked einsum over inertial bodies — a handful of
        batched contractions instead of per-body loops, which keeps the
        traced graph small and maps onto the MXU when batched.
        """
        params = self.default_params if params is None else params
        q = jnp.asarray(q)
        R, p, axes_w = self._joint_poses(q)
        Rb, pb = self._body_frames_from(R, p, params)
        chain = jnp.asarray(self._body_anc, dtype=q.dtype)       # (nb, nq)
        rev = jnp.asarray(
            [1.0 if t == _REVOLUTE else 0.0 for t in self.joint_types],
            dtype=q.dtype)
        d = pb[:, None, :] - p[None, :, :]                       # (nb, nq, 3)
        Jv_rev = jnp.cross(axes_w[None, :, :], d)                # (nb, nq, 3)
        Jv = chain[:, :, None] * (rev[None, :, None] * Jv_rev
                                  + (1 - rev)[None, :, None] * axes_w[None])
        Jw = (chain * rev[None, :])[:, :, None] * axes_w[None]   # (nb, nq, 3)
        Iw = jnp.einsum("bij,bjk,blk->bil", Rb, params.inertia.astype(q.dtype), Rb)
        M = jnp.einsum("b,bpk,bqk->pq", params.mass.astype(q.dtype), Jv, Jv)
        M = M + jnp.einsum("bpi,bij,bqj->pq", Jw, Iw, Jw)
        return M

    def potential_energy(self, q, params: InertialParams | None = None):
        params = self.default_params if params is None else params
        _, pb = self._body_frames(jnp.asarray(q), params)
        return GRAVITY * jnp.sum(params.mass * pb[:, 2])

    def gravity_term(self, q, params: InertialParams | None = None):
        """g(q) = dU/dq, the reference's ``gravity(H_b, q)[6:]``."""
        return jax.grad(lambda qq: self.potential_energy(qq, params))(jnp.asarray(q))

    def dynamics_terms(self, q, v, params: InertialParams | None = None):
        """(M(q), h(q, v)) with one shared mass-matrix Jacobian.

        Lagrangian identity ``h = Mdot v - 1/2 d(v' M v)/dq + dU/dq`` with
        both velocity terms contracted from a single ``jacfwd(M)`` —
        exact, and ~3x fewer traced ops than separate jvp/grad towers
        (trace time matters: this graph is replicated through the
        constraint linearization's forward tangents).
        """
        q = jnp.asarray(q)
        v = jnp.asarray(v)
        if self._all_revolute:
            M, dM, gU = self._kin_derivatives(q, params, order=1)
        else:
            Mfun = lambda qq: self.mass_matrix(qq, params)
            M = Mfun(q)
            dM = jax.jacfwd(Mfun)(q)                 # (nq, nq, nq)
            gU = self.gravity_term(q, params)
        Mdot_v = jnp.einsum("ijk,k,j->i", dM, v, v)  # (Mdot v)_i
        quad = 0.5 * jnp.einsum("j,jki,k->i", v, dM, v)
        h = Mdot_v - quad + gU
        return M, h

    def bias_force(self, q, v, params: InertialParams | None = None):
        """h(q, v) = C(q, v) v + g(q); equals the reference's
        ``bias(H_b, q, 0, v)[6:]`` (env_model.py:82)."""
        return self.dynamics_terms(q, v, params)[1]

    def inverse_dynamics(self, q, v, a, params: InertialParams | None = None):
        """tau = M(q) a + h(q, v) (no joint friction, as in the reference)."""
        M, h = self.dynamics_terms(q, v, params)
        return M @ jnp.asarray(a) + h

    def forward_dynamics(self, q, v, tau, params: InertialParams | None = None):
        """a = M(q)^{-1} (tau - h(q, v)) (reference env_model.py:202)."""
        M, h = self.dynamics_terms(q, v, params)
        return jnp.linalg.solve(M, jnp.asarray(tau) - h)


def _hat(v):
    """Skew-symmetric cross-product matrix, batched over leading axes:
    (..., 3) -> (..., 3, 3) with hat(v) @ x == cross(v, x)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def _hat_bl(v):
    """Batch-last hat: (..., 3, K) -> (..., 3, 3, K)."""
    x, y, z = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-2),
        jnp.stack([z, zero, -x], axis=-2),
        jnp.stack([-y, x, zero], axis=-2),
    ], axis=-3)


def _axis_angle(axis, theta):
    """Rotation matrix about a unit axis (Rodrigues)."""
    K = jnp.array([
        [0.0, -axis[2], axis[1]],
        [axis[2], 0.0, -axis[0]],
        [-axis[1], axis[0], 0.0],
    ], dtype=jnp.result_type(theta))
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.eye(3, dtype=K.dtype) + s * K + (1.0 - c) * (K @ K)
