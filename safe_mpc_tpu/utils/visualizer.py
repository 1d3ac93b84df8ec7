"""Robot/scene visualization (reference robot_visualizer.py).

The reference renders through meshcat + pinocchio (robot_visualizer.py:
13-177); neither is available here, so scenes render through matplotlib's
3-D axes using the framework's own FK — links as line segments, capsules
as thick segments, obstacles as wireframes, EE trajectories as point
clouds. Outputs PNG frames (headless-friendly)."""

from __future__ import annotations

import numpy as np

from ..models.manipulator import ManipulatorModel


class RobotVisualizer:
    def __init__(self, model: ManipulatorModel):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        self.plt = plt
        self.model = model
        self.fig = plt.figure(figsize=(7, 7))
        self.ax = self.fig.add_subplot(projection="3d")

    def _link_points(self, x):
        model = self.model
        pts = [np.zeros(3)]
        seen = set()
        for j in model.robot.joint_names:
            child = model.robot.urdf.joint(j).child
            if child in seen:
                continue
            seen.add(child)
            _, p = model.robot.frame_pose(x[: model.nq], child)
            pts.append(np.asarray(p))
        _, pe = model.robot.frame_pose(x[: model.nq], model.ee_frame)
        pts.append(np.asarray(pe))
        return np.asarray(pts)

    def draw_scene(self):
        ax = self.ax
        cfg = self.model.cfg
        for c in cfg.scene.fixed_capsules:
            a, b = np.asarray(c.point_a), np.asarray(c.point_b)
            ax.plot(*np.stack([a, b]).T, lw=8, alpha=0.5, color="teal")
        for s in cfg.scene.spheres:
            u = np.linspace(0, 2 * np.pi, 16)
            v = np.linspace(0, np.pi, 12)
            cx, cy, cz = s.position
            ax.plot_wireframe(
                cx + s.radius * np.outer(np.cos(u), np.sin(v)),
                cy + s.radius * np.outer(np.sin(u), np.sin(v)),
                cz + s.radius * np.outer(np.ones_like(u), np.cos(v)),
                alpha=0.2, color="green")
        for p in cfg.scene.planes:
            if p.perpendicular_axis == 2:
                gx, gy = np.meshgrid(np.linspace(-0.2, 1.2, 2),
                                     np.linspace(-0.7, 0.7, 2))
                ax.plot_surface(gx, gy, np.full_like(gx, p.bounds[p.real_bound]),
                                alpha=0.1, color="gray")
        ref = np.asarray(self.model.ee_ref)
        ax.scatter(*ref, s=80, color="red", marker="*", label="target")

    def draw_state(self, x, color="C0", alpha=1.0):
        pts = self._link_points(np.asarray(x))
        self.ax.plot(*pts.T, "-o", color=color, alpha=alpha, ms=3)

    def draw_trajectory(self, xs, stride=25):
        import jax
        ee = np.asarray(jax.vmap(self.model.ee_pos)(xs))
        self.ax.plot(*ee.T, lw=1, color="C1", alpha=0.8)
        for i in range(0, len(xs), stride):
            self.draw_state(xs[i], alpha=0.25 + 0.75 * i / len(xs))

    def save(self, path: str, title: str = ""):
        self.ax.set_xlim(-0.3, 1.0)
        self.ax.set_ylim(-0.65, 0.65)
        self.ax.set_zlim(0.0, 1.0)
        self.ax.set_title(title)
        self.fig.savefig(path, dpi=110)
        print(f"saved {path}")
