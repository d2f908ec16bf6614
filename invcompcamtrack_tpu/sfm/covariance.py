"""Covariance propagation + uncertainty-visualization helpers.

jnp ports of the reference's covariance toolbox:

- 3D-point covariance -> 2D reprojection covariance through the
  projection Jacobian (reference: func_util_geom.py:429-445, using the
  same P = K[-R | R t] convention as the triangulation stack),
- covariance ellipsoid (3D) / ellipse (2D) parameters for plotting
  (reference: func_util_geom.py:396-427).

The Monte-Carlo-vs-algebraic covariance validation of the reference's
triangulation-error lab lives in tests/test_covariance.py (reference:
run_3DPoint_triangulation_error_test.ipynb cell 5: determinant-ratio
comparison).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.sfm.triangulate import _proj_jacobian

_PREC = jax.lax.Precision.HIGHEST


def project_cov_3d_to_2d(cov3: jnp.ndarray, X: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """cov3: (..., 3, 3); X: (..., 3); P: (..., 3, 4) -> (..., 2, 2)."""
    J = _proj_jacobian(P[..., None, :, :], X)[..., 0, :, :]  # (..., 2, 3)
    return jnp.einsum("...ij,...jk,...lk->...il", J, cov3, J, precision=_PREC)


def cov_ellipse(cov2: jnp.ndarray, n_std: float = 1.0):
    """2D covariance -> (width, height, angle_deg) of the n-sigma ellipse
    (reference: func_get_cov_ellipe, func_util_geom.py:415-427)."""
    evals, evecs = jnp.linalg.eigh(cov2)
    order = jnp.argsort(evals)[..., ::-1]
    evals = jnp.take_along_axis(evals, order, axis=-1)
    v = jnp.take_along_axis(evecs, order[..., None, :], axis=-1)
    angle = jnp.degrees(jnp.arctan2(v[..., 1, 0], v[..., 0, 0]))
    width = 2.0 * n_std * jnp.sqrt(jnp.maximum(evals[..., 0], 0.0))
    height = 2.0 * n_std * jnp.sqrt(jnp.maximum(evals[..., 1], 0.0))
    return width, height, angle


def cov_ellipsoid_axes(cov3: jnp.ndarray, n_std: float = 1.0):
    """3D covariance -> principal semi-axes (3,) + rotation (3, 3)
    (reference: func_get_cov_ellipsoid, func_util_geom.py:396-413)."""
    evals, evecs = jnp.linalg.eigh(cov3)
    radii = n_std * jnp.sqrt(jnp.maximum(evals, 0.0))
    return radii, evecs
