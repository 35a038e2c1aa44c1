"""Euler-angle / quaternion / angle-axis conversions.

Equivalent capability to the reference's vendored
Networks/dgcnn/utils/eulerangles.py (euler2mat / mat2euler / euler2quat /
quat2euler / euler2angle_axis / angle_axis2euler; dormant — nothing on the
live path imports it). Same convention: ``euler2mat(z, y, x)`` composes
M = Rz(z) @ Ry(y) @ Rx(x), i.e. the x rotation is applied first.

Pure numpy, written from the standard rotation formulas (not a port of the
vendored transforms3d code).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def euler2mat(z: float = 0.0, y: float = 0.0, x: float = 0.0) -> np.ndarray:
    """Rotation matrix M = Rz(z) @ Ry(y) @ Rx(x) (radians)."""
    cz, sz = math.cos(z), math.sin(z)
    cy, sy = math.cos(y), math.sin(y)
    cx, sx = math.cos(x), math.sin(x)
    rz = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    ry = np.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    rx = np.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    return rz @ ry @ rx


def mat2euler(m: np.ndarray,
              cy_thresh: Optional[float] = None) -> Tuple[float, float, float]:
    """Inverse of euler2mat: (z, y, x) with y in (-pi/2, pi/2] nominally.

    Near gimbal lock (|cos y| < cy_thresh) x is set to 0 and z absorbs the
    remaining rotation, like the reference's mat2euler.
    """
    m = np.asarray(m, dtype=float)
    if cy_thresh is None:
        cy_thresh = np.finfo(m.dtype).eps * 4
    # M = Rz Ry Rx =>
    # [cy cz, sx sy cz - cx sz, cx sy cz + sx sz]
    # [cy sz, sx sy sz + cx cz, cx sy sz - sx cz]
    # [-sy,   sx cy,            cx cy           ]
    cy = math.sqrt(m[2, 1] ** 2 + m[2, 2] ** 2)
    if cy > cy_thresh:
        z = math.atan2(m[1, 0], m[0, 0])
        y = math.atan2(-m[2, 0], cy)
        x = math.atan2(m[2, 1], m[2, 2])
    else:  # cos(y) ~ 0: sy = +-1, x and z are degenerate; pick x = 0
        z = math.atan2(-m[0, 1], m[1, 1])
        y = math.atan2(-m[2, 0], cy)
        x = 0.0
    return z, y, x


def _qmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def euler2quat(z: float = 0.0, y: float = 0.0,
               x: float = 0.0) -> np.ndarray:
    """Unit quaternion [w, x, y, z] for M = Rz(z) Ry(y) Rx(x)."""
    qz = np.array([math.cos(z / 2), 0.0, 0.0, math.sin(z / 2)])
    qy = np.array([math.cos(y / 2), 0.0, math.sin(y / 2), 0.0])
    qx = np.array([math.cos(x / 2), math.sin(x / 2), 0.0, 0.0])
    return _qmul(_qmul(qz, qy), qx)


def quat2mat(q: np.ndarray) -> np.ndarray:
    """Rotation matrix from a [w, x, y, z] quaternion (normalizes first)."""
    w, x, y, z = np.asarray(q, dtype=float) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat2euler(q: np.ndarray) -> Tuple[float, float, float]:
    """(z, y, x) Euler angles of a [w, x, y, z] quaternion."""
    return mat2euler(quat2mat(q))


def euler2angle_axis(z: float = 0.0, y: float = 0.0,
                     x: float = 0.0) -> Tuple[float, np.ndarray]:
    """(theta, unit axis) of the rotation M = Rz(z) Ry(y) Rx(x)."""
    w, qx, qy, qz = euler2quat(z, y, x)
    v = np.array([qx, qy, qz])
    norm = np.linalg.norm(v)
    theta = 2.0 * math.atan2(norm, w)
    if norm < 1e-12:
        return 0.0, np.array([1.0, 0.0, 0.0])
    return theta, v / norm


def angle_axis2mat(theta: float, vector: np.ndarray,
                   is_normalized: bool = False) -> np.ndarray:
    """Rodrigues' formula."""
    v = np.asarray(vector, dtype=float)
    if not is_normalized:
        v = v / np.linalg.norm(v)
    kx, ky, kz = v
    kmat = np.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    return (np.eye(3) + math.sin(theta) * kmat
            + (1.0 - math.cos(theta)) * (kmat @ kmat))


def angle_axis2euler(theta: float, vector: np.ndarray,
                     is_normalized: bool = False) -> Tuple[float, float, float]:
    """(z, y, x) Euler angles of an angle-axis rotation."""
    return mat2euler(angle_axis2mat(theta, vector, is_normalized))
