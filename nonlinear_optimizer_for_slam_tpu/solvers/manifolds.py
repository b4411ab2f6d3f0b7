"""Parameter-manifold retractions used by the LM driver.

SE(3) state is (translation (3,), quaternion (4,) wxyz). The retraction
matches the reference update rule exactly
(mahalanobis_distance_minimizer_analytic.cc:130-136):

    t <- t + delta[0:3]
    q <- normalize( q (x) exp_quat(delta[3:6]) )     # RIGHT multiplication

SE(2) state is (translation (2,), theta). The reference's planar update
right-multiplies the 2x2 rotation (= theta addition,
mahalanobis_distance_minimizer_analytic_3dof.cc:80-84).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie

Array = jax.Array


class SE3Params(NamedTuple):
    translation: Array  # (3,)
    quaternion: Array  # (4,) (w, x, y, z)

    @property
    def rotation(self) -> Array:
        return lie.quat_to_rotmat(self.quaternion)


class SE2Params(NamedTuple):
    translation: Array  # (2,)
    theta: Array  # ()

    @property
    def rotation(self) -> Array:
        return lie.rot2(self.theta)


def se3_retract(params: SE3Params, delta: Array) -> SE3Params:
    t = params.translation + delta[:3]
    dq = lie.so3_exp_quaternion(delta[3:6])
    q = lie.quat_normalize(lie.quat_multiply(params.quaternion, dq))
    return SE3Params(t, q)


def se2_retract(params: SE2Params, delta: Array) -> SE2Params:
    return SE2Params(params.translation + delta[:2], params.theta + delta[2])
