"""Control-invariant safe sets: learned (MLP) and analytic (braking distance).

TPU-native replacement of the reference's ``NetSafeSet``/``AnalyticSafeSet``
(safe_set.py:26-156). The reference embeds a PyTorch MLP into generated C
code through l4casadi (safe_set.py:89-94); here the network is plain JAX —
its value and Jacobian fuse directly into the RTI constraint linearization
via autodiff, removing the entire l4casadi/libtorch machinery.

Checkpoint compatibility: `load_torch_checkpoint` reads the reference's
``.pt`` format ``{'model': state_dict, 'mean': ..., 'std': ...}``
(safe_set.py:76-78) without importing torch (zipfile + pickle with a numpy
unpickler), so trained safe sets port unchanged.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SafeMpcConfig
from .manipulator import ManipulatorModel


# ------------------------------------------------------------- activations

def gelu_tanh(x):
    """GELU with tanh approximation — bit-matches
    ``torch.nn.GELU(approximate='tanh')`` (reference parser.py:99)."""
    c = np.sqrt(2.0 / np.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "tanh": jnp.tanh,
    "gelu": gelu_tanh,
    "silu": jax.nn.silu,
}


# ------------------------------------------------- torch checkpoint reader

_TORCH_DTYPES = {
    "FloatStorage": (np.float32, 4),
    "DoubleStorage": (np.float64, 8),
    "HalfStorage": (np.float16, 2),
    "LongStorage": (np.int64, 8),
    "IntStorage": (np.int32, 4),
}


class _TorchUnpickler(pickle.Unpickler):
    """Minimal unpickler for torch zip checkpoints -> numpy arrays."""

    def __init__(self, file, archive: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self.archive = archive
        self.prefix = prefix

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            def rebuild(storage, offset, size, stride, *args):
                arr, itemsize = storage
                if len(size) == 0:
                    return arr[offset]
                n = int(np.prod(size)) if size else 1
                flat = arr[offset: offset + n * max(
                    1, (max(stride) if stride else 1))]
                return np.lib.stride_tricks.as_strided(
                    flat, shape=size,
                    strides=tuple(s * itemsize for s in stride)).copy()
            return rebuild
        if name == "OrderedDict":
            from collections import OrderedDict
            return OrderedDict
        if name in _TORCH_DTYPES or name.endswith("Storage"):
            return name  # marker consumed in persistent_load
        # Anything else (e.g. torch.Size) -> tuple passthrough
        return tuple

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage"
        dtype, itemsize = _TORCH_DTYPES.get(
            storage_type if isinstance(storage_type, str) else "FloatStorage",
            (np.float32, 4))
        name = f"{self.prefix}/data/{key}"
        raw = self.archive.read(name)
        return np.frombuffer(raw, dtype=dtype), itemsize


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pt`` checkpoint ``{'model', 'mean', 'std'}``.

    Uses torch when importable (robust path); otherwise falls back to a
    dependency-free zip/pickle reader sufficient for plain tensor dicts.
    """
    try:
        import torch  # noqa: PLC0415 — optional, host-side only

        data = torch.load(path, map_location="cpu", weights_only=False)

        def conv(v):
            if isinstance(v, torch.Tensor):
                return v.detach().cpu().numpy()
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            return v

        return conv(data)
    except ImportError:
        pass
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("/data.pkl")]
        with zf.open(pkl_name) as f:
            data = f.read()
        obj = _TorchUnpickler(io.BytesIO(data), zf, prefix).load()
    return obj


def _to_numpy(v):
    return np.asarray(v)


# --------------------------------------------------------------- MLP params

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MlpParams:
    """Weights of the reference's 3-hidden-layer MLP (safe_set.py:26-43):
    Linear -> act -> Linear -> act -> Linear -> act -> Linear."""
    weights: tuple  # of (out, in) arrays, torch layout
    biases: tuple
    mean: jax.Array  # input normalisation (positions)
    std: jax.Array


def mlp_from_state_dict(state_dict: dict, mean, std) -> MlpParams:
    # nn.Sequential puts Linear layers at even indices (activations between);
    # collect them in index order (reference safe_set.py:29-39).
    idxs = sorted({int(k.split(".")[1]) for k in state_dict if k.endswith(".weight")})
    ws = [jnp.asarray(_to_numpy(state_dict[f"linear_stack.{i}.weight"]),
                      dtype=jnp.float32) for i in idxs]
    bs = [jnp.asarray(_to_numpy(state_dict[f"linear_stack.{i}.bias"]),
                      dtype=jnp.float32) for i in idxs]
    return MlpParams(weights=tuple(ws), biases=tuple(bs),
                     mean=jnp.asarray(_to_numpy(mean), dtype=jnp.float32).reshape(-1),
                     std=jnp.asarray(_to_numpy(std), dtype=jnp.float32).reshape(-1))


def random_mlp(key, sizes: tuple[int, ...], n_hidden_layers: int = 3) -> MlpParams:
    """Randomly initialised net with the reference architecture — used when
    no checkpoint is available (the reference ships none; they are external
    downloads)."""
    in_dim, hidden, out_dim = sizes
    dims = [in_dim] + [hidden] * n_hidden_layers + [out_dim]
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(dims[i])
        ws.append(jax.random.uniform(k1, (dims[i + 1], dims[i]), jnp.float32,
                                     -bound, bound))
        bs.append(jax.random.uniform(k2, (dims[i + 1],), jnp.float32,
                                     -bound, bound))
    return MlpParams(weights=tuple(ws), biases=tuple(bs),
                     mean=jnp.zeros(in_dim // 2, jnp.float32),
                     std=jnp.ones(in_dim // 2, jnp.float32))


def mlp_forward(params: MlpParams, inp, activation):
    h = inp
    n = len(params.weights)
    for i in range(n):
        w = params.weights[i].astype(h.dtype)
        b = params.biases[i].astype(h.dtype)
        h = h @ w.T + b
        if i < n - 1:
            h = activation(h)
    return h


# --------------------------------------------------------------- safe sets

class NetSafeSet:
    """Learned safe set: the net predicts a maximum safe velocity norm.

    Constraint (safe_set.py:82-104):
      ``NN([(q - mean)/std, v/|v|]) * (100 - alpha)/100 - |v| >= 0``
    with ``v[0] += eps`` for numerical stability. Bounds [0, 1e6].
    """

    n_constraints = 1

    def __init__(self, model: ManipulatorModel, params: MlpParams | None = None,
                 checkpoint: str | None = None):
        cfg = model.cfg
        self.model = model
        self.cfg = cfg
        self.activation = ACTIVATIONS[cfg.act_fun]
        if params is None:
            ckpt_path = checkpoint or cfg.network_path
            if ckpt_path and not os.path.isabs(ckpt_path):
                from ..config import REPO_ROOT
                cand = os.path.join(REPO_ROOT, ckpt_path)
                ckpt_path = cand if os.path.exists(cand) else ckpt_path
            if ckpt_path and not os.path.exists(ckpt_path):
                import warnings
                warnings.warn(f"safe-set checkpoint {ckpt_path!r} not found; "
                              "using a randomly initialised net")
                ckpt_path = ""
            if ckpt_path:
                data = load_torch_checkpoint(ckpt_path)
                params = mlp_from_state_dict(data["model"], data["mean"], data["std"])
            else:
                sizes = (2 * cfg.nq, cfg.network_size[1], cfg.network_size[-1])
                params = random_mlp(jax.random.PRNGKey(0), sizes)
        self.params = params
        nd = cfg.n_dof_safe_set
        lo = np.zeros(1)
        hi = np.full(1, 1e6)
        self.bounds = (lo, hi)
        self._nd = nd

    def raw_net(self, x):
        """NN output before the alpha scaling (the reference's
        ``l4c_model(state)``)."""
        nq, nd, eps = self.cfg.nq, self._nd, self.cfg.eps
        x = jnp.asarray(x)
        x = x.at[nq].add(eps)
        v = x[nq: nq + nd]
        vel_norm = jnp.linalg.norm(v)
        pos = (x[:nd] - self.params.mean.astype(x.dtype)) / self.params.std.astype(x.dtype)
        state = jnp.concatenate([pos, v / vel_norm])
        return mlp_forward(self.params, state, self.activation)[0], vel_norm

    def value(self, x, alpha):
        """(1,) constraint residual with runtime alpha (nn_func)."""
        out, vel_norm = self.raw_net(x)
        return jnp.atleast_1d(out * (100.0 - alpha) / 100.0 - vel_norm)

    def value_fixed_alpha(self, x):
        """Residual at the configured alpha (nn_func_x, safe_set.py:100-102)."""
        return self.value(x, self.cfg.alpha)

    def value_bl(self, x, alpha):
        """Batch-last residual: x (nx, K) -> (1, K). Same math as
        :meth:`value`; the MLP runs as (width, K) GEMMs so the problem
        batch fills the MXU lanes."""
        nq, nd, eps = self.cfg.nq, self._nd, self.cfg.eps
        x = x.at[nq].add(eps)
        v = x[nq: nq + nd]                                   # (nd, K)
        vel_norm = jnp.sqrt(jnp.sum(v * v, axis=0))          # (K,)
        mean = self.params.mean.astype(x.dtype)[:, None]
        std = self.params.std.astype(x.dtype)[:, None]
        h = jnp.concatenate([(x[:nd] - mean) / std, v / vel_norm])
        n = len(self.params.weights)
        for i in range(n):
            w = self.params.weights[i].astype(x.dtype)
            b = self.params.biases[i].astype(x.dtype)
            h = w @ h + b[:, None]
            if i < n - 1:
                h = self.activation(h)
        return h[:1] * (100.0 - alpha) / 100.0 - vel_norm[None]

    def check(self, x, alpha=None):
        """Boolean membership with tol_safe_set slack (safe_set.py:61-68)."""
        a = self.cfg.alpha if alpha is None else alpha
        val = self.value(x, a)
        lo, hi = self.bounds
        tol = self.cfg.tol_safe_set
        return jnp.all((val >= jnp.asarray(lo) - tol) & (val <= jnp.asarray(hi) + tol))


class AnalyticSafeSet:
    """Braking-distance safe set (safe_set.py:106-156).

    Rows (all with reversed sign as in the reference, which negates the
    expressions): per-obstacle velocity conditions then per-joint
    ``-v/sqrt(q - q_min + reg)`` and ``v/sqrt(q_max - q + reg)``, each
    bounded below by ``-sqrt(2 ddq_max)``.
    """

    def __init__(self, model: ManipulatorModel):
        cfg = model.cfg
        self.model = model
        self.cfg = cfg
        self.reg = cfg.reg_term
        nd = cfg.n_dof_safe_set
        self._nd = nd
        lo_rows, hi_rows = [], []
        self._obs = []
        for p in cfg.scene.planes:
            self._obs.append(("plane", p))
            lo_rows.append(np.asarray([p.bounds[0]]))
            hi_rows.append(np.asarray([p.bounds[1]]))
        for s in cfg.scene.spheres:
            self._obs.append(("sphere", s))
            lo_rows.append(np.asarray([s.bounds[0]]))
            hi_rows.append(np.asarray([s.bounds[1]]))
        ddq = np.asarray(cfg.ddq_max)[:nd]
        lo_rows.append(-np.sqrt(2 * ddq))
        hi_rows.append(1e6 * np.ones(nd))
        lo_rows.append(-np.sqrt(2 * ddq))
        hi_rows.append(1e6 * np.ones(nd))
        self.bounds = (np.concatenate(lo_rows), np.concatenate(hi_rows))
        self.n_constraints = self.bounds[0].shape[0]

    def _rows(self, x, alpha):
        cfg, nd = self.cfg, self._nd
        x = jnp.asarray(x)
        q, v = x[:nd], x[cfg.nq: cfg.nq + nd]
        rows = []
        ee = self.model.ee_pos(x)
        J = self.model.ee_jac(q)
        ee_vel = J @ v
        for kind, ob in self._obs:
            if kind == "plane":
                dist = ob.position[2] - ee[2]
                dx_max = jnp.sqrt(2 * cfg.ddx_max[2] * jnp.abs(dist + self.reg))
                expr = ee_vel[2] * jnp.sign(dist) - dx_max
                rows.append(-jnp.atleast_1d(expr))
            else:
                dvec = jnp.asarray(ob.position, dtype=x.dtype) - ee
                dx_max = jnp.sqrt(jnp.dot(2 * jnp.asarray(cfg.ddx_max, dtype=x.dtype),
                                          jnp.abs(dvec + self.reg)))
                expr = jnp.dot(ee_vel, dvec / jnp.linalg.norm(dvec)) - dx_max
                rows.append(-jnp.atleast_1d(expr))
        x_min = jnp.asarray(self.model.x_min, dtype=x.dtype)
        x_max = jnp.asarray(self.model.x_max, dtype=x.dtype)
        rows.append(v / jnp.sqrt(q - x_min[:nd] + self.reg))       # -ddq_min_expr
        rows.append(-v / jnp.sqrt(x_max[:nd] - q + self.reg))      # -ddq_max_expr
        return jnp.concatenate(rows)

    def value(self, x, alpha=None):
        return self._rows(x, alpha)

    def value_bl(self, x, alpha=None):
        """Batch-last rows: x (nx, K) -> (ns, K). FK is recomputed from x
        (batch-last chain) so autodiff through this function yields the full
        row Jacobians, including the d(J v)/dq terms."""
        cfg, nd = self.cfg, self._nd
        nq = cfg.nq
        model, robot = self.model, self.model.robot
        dtype = x.dtype
        q, v = x[:nd], x[nq: nq + nd]
        poses = robot.joint_poses_bl(x[:nq])
        Rf, pf = robot.frame_pose_from_bl(poses, model.ee_frame)
        ee = pf + jnp.einsum("xyk,y->xk", Rf,
                             jnp.asarray(model.ee_offset, dtype))
        anc = robot.frame_support(model.ee_frame)[0]
        # frame-origin Jacobian, matching per-sample ee_jac (no tool offset)
        Jq = robot.point_jacobian_bl(poses, anc, pf)     # (nq, 3, K)
        ee_vel = jnp.einsum("qxk,qk->xk", Jq[:nd], v)
        rows = []
        for kind, ob in self._obs:
            if kind == "plane":
                dist = ob.position[2] - ee[2]
                dx_max = jnp.sqrt(2 * cfg.ddx_max[2]
                                  * jnp.abs(dist + self.reg))
                rows.append(-(ee_vel[2] * jnp.sign(dist) - dx_max)[None])
            else:
                dvec = jnp.asarray(ob.position, dtype)[:, None] - ee
                dx_max = jnp.sqrt(jnp.sum(
                    2 * jnp.asarray(cfg.ddx_max, dtype)[:, None]
                    * jnp.abs(dvec + self.reg), axis=0))
                dn = jnp.sqrt(jnp.sum(dvec * dvec, axis=0))
                rows.append(-(jnp.sum(ee_vel * dvec, axis=0) / dn
                              - dx_max)[None])
        x_min = jnp.asarray(self.model.x_min, dtype)[:nd, None]
        x_max = jnp.asarray(self.model.x_max, dtype)[:nd, None]
        rows.append(v / jnp.sqrt(q - x_min + self.reg))
        rows.append(-v / jnp.sqrt(x_max - q + self.reg))
        return jnp.concatenate(rows)

    def value_fixed_alpha(self, x):
        return self._rows(x, self.cfg.alpha)

    def check(self, x, alpha=None):
        val = self.value(x, alpha)
        lo, hi = self.bounds
        tol = self.cfg.tol_safe_set
        return jnp.all((val >= jnp.asarray(lo) - tol) & (val <= jnp.asarray(hi) + tol))


def create_safe_set(model: ManipulatorModel, use_net: bool | None = None,
                    **kw):
    """Registry mirroring controller.create_safe_set (controller.py:323-330)."""
    use_net = model.cfg.use_net if use_net is None else use_net
    if use_net:
        return NetSafeSet(model, **kw)
    return AnalyticSafeSet(model)
