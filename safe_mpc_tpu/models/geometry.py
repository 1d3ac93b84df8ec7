"""Differentiable collision-distance primitives.

JAX ports of the reference's CasADi distance expressions
(reference utils.py:77-124). The exact formulas — including the Lumelsky
clamp order (t, u, t) and the ``1e-5`` denominator regulariser — are kept
so constraint linearizations and feasibility decisions match the
reference numerics at the boundary.

All functions are layout-polymorphic: points may be ``(3,)`` (scalar
output) or batch-last ``(3, K)`` (output ``(K,)``) — the component axis is
axis 0 and everything else is elementwise, which is what keeps the batched
linearization's intermediates lane-packed on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rot_x(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]])


def rot_y(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]])


def rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])


def segment_segment_sqdist(a, b, c, d):
    """Squared distance between segments [a,b] and [c,d].

    Clamped-parameter formulation identical to reference
    ``casadi_segment_dist`` (utils.py:94-113), including the ``1e-5``
    regulariser that keeps the expression smooth for parallel segments.
    """
    R = jnp.sum((b - a) * (d - c), axis=0)
    S1 = jnp.sum((b - a) * (c - a), axis=0)
    D1 = jnp.sum((b - a) ** 2, axis=0)
    S2 = jnp.sum((d - c) * (c - a), axis=0)
    D2 = jnp.sum((d - c) ** 2, axis=0)

    t = (S1 * D2 - S2 * R) / (D1 * D2 - (R ** 2 + 1e-5))
    t = jnp.clip(t, 0.0, 1.0)
    u = (t * R - S2) / D2
    u = jnp.clip(u, 0.0, 1.0)
    t = (u * R + S1) / D1
    t = jnp.clip(t, 0.0, 1.0)

    return jnp.sum(((b - a) * t - (d - c) * u - (c - a)) ** 2, axis=0)


def point_segment_sqdist(a, b, seg_length, point):
    """Squared distance from `point` to segment [a,b] of known length
    (reference ``ball_segment_dist``, utils.py:115-118; note the reference
    normalises by the *nominal* capsule length, not |b-a|)."""
    t = jnp.clip(jnp.sum((point - a) * (b - a), axis=0) / (seg_length ** 2),
                 0.0, 1.0)
    return jnp.sum((point - (a + (b - a) * t)) ** 2, axis=0)


def sphere_sphere_sqdist(center_a, center_b):
    d = center_a - center_b
    return jnp.sum(d * d, axis=0)


def plane_coordinate(point, axis: int):
    """Coordinate of a point along a plane's perpendicular axis
    (reference ``plane_sphere_dist``, utils.py:123-124)."""
    return point[axis]
