"""Pose-graph optimization over relative SE(3) constraints.

Complement to the windowed BA: drift correction over keyframe chains
with odometry + loop-closure edges (the north-star's "keyframe
pose-graph" component; the reference has no equivalent — its trajectory
error accumulates unbounded, see pose_tracking_acc.txt).

Graph: K node poses (se(3) coefficients, world->cam as everywhere in
the framework) and E edges measuring the relative pose
``G_ij = G_j . G_i^{-1}`` (cam_i -> cam_j).  Residual per edge:
``log(G_meas^{-1} . G_j . G_i^{-1})`` (6,).  Damped Gauss-Newton with
forward-mode AD Jacobians; edges are a fixed-shape batch, the (6K, 6K)
system is dense (K = keyframe count, small).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.core import lie

_PREC = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    poses: jnp.ndarray       # (K, 6)
    edges_i: jnp.ndarray     # (E,) int32 source node
    edges_j: jnp.ndarray     # (E,) int32 target node
    edges_meas: jnp.ndarray  # (E, 6) measured relative pose log
    edges_weight: jnp.ndarray  # (E,) scalar information weight
    fixed_mask: jnp.ndarray  # (K,) bool, True = anchored


def relative_pose(p_i: jnp.ndarray, p_j: jnp.ndarray) -> jnp.ndarray:
    """log(G_j . G_i^{-1}) — the edge measurement convention."""
    G = lie.se3_compose(lie.se3_exp(p_j), lie.se3_inverse(lie.se3_exp(p_i)))
    return lie.se3_log(G)


def _edge_residual(p_i, p_j, meas):
    G_rel = lie.se3_compose(lie.se3_exp(p_j), lie.se3_inverse(lie.se3_exp(p_i)))
    G_err = lie.se3_compose(lie.se3_inverse(lie.se3_exp(meas)), G_rel)
    return lie.se3_log(G_err)


def graph_residuals(g: PoseGraph):
    p_i = jnp.take(g.poses, g.edges_i, axis=0)
    p_j = jnp.take(g.poses, g.edges_j, axis=0)
    r = jax.vmap(_edge_residual)(p_i, p_j, g.edges_meas)
    r = r * jnp.sqrt(g.edges_weight)[:, None]
    return r


def optimize_pose_graph(g: PoseGraph, num_iters: int = 10,
                        damp_init: float = 1e-4, damp_fct: float = 10.0):
    """Damped GN; returns (poses, (err, err0)) with err = mean squared
    residual."""
    K = g.poses.shape[0]
    E = g.edges_i.shape[0]

    jac_fn = jax.vmap(jax.jacfwd(_edge_residual, argnums=(0, 1)))

    def build_system(poses):
        gg = g._replace(poses=poses)
        r = graph_residuals(gg)
        p_i = jnp.take(poses, g.edges_i, axis=0)
        p_j = jnp.take(poses, g.edges_j, axis=0)
        Ji, Jj = jac_fn(p_i, p_j, g.edges_meas)  # (E, 6, 6) each
        w = jnp.sqrt(g.edges_weight)[:, None, None]
        Ji = Ji * w
        Jj = Jj * w
        # zero columns of fixed nodes
        free_i = (~jnp.take(g.fixed_mask, g.edges_i))[:, None, None]
        free_j = (~jnp.take(g.fixed_mask, g.edges_j))[:, None, None]
        Ji = Ji * free_i
        Jj = Jj * free_j

        H = jnp.zeros((K, 6, K, 6), poses.dtype)
        b = jnp.zeros((K, 6), poses.dtype)
        Hii = jnp.einsum("eri,erj->eij", Ji, Ji, precision=_PREC)
        Hjj = jnp.einsum("eri,erj->eij", Jj, Jj, precision=_PREC)
        Hij = jnp.einsum("eri,erj->eij", Ji, Jj, precision=_PREC)
        bi = jnp.einsum("eri,er->ei", Ji, r, precision=_PREC)
        bj = jnp.einsum("eri,er->ei", Jj, r, precision=_PREC)
        H = H.at[g.edges_i, :, g.edges_i, :].add(Hii)
        H = H.at[g.edges_j, :, g.edges_j, :].add(Hjj)
        H = H.at[g.edges_i, :, g.edges_j, :].add(Hij)
        H = H.at[g.edges_j, :, g.edges_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[g.edges_i].add(bi)
        b = b.at[g.edges_j].add(bj)
        return H.reshape(6 * K, 6 * K), b.reshape(-1), jnp.mean(r * r)

    def step(carry, _):
        poses, damp, err = carry
        H, b, _ = build_system(poses)
        # anchor fixed nodes + damping
        fixed_diag = jnp.repeat(g.fixed_mask.astype(poses.dtype), 6)
        A = H + jnp.diag(
            damp * jnp.maximum(jnp.diag(H), 1e-9) + fixed_diag
        )
        delta = jnp.linalg.solve(A, b).reshape(K, 6)
        delta = delta * (~g.fixed_mask)[:, None]
        cand = poses - delta
        _, _, err_new = build_system(cand)
        ok = err_new < err
        poses = jnp.where(ok, cand, poses)
        damp = jnp.where(ok, damp / damp_fct, damp * damp_fct)
        err = jnp.where(ok, err_new, err)
        return (poses, damp, err), None

    _, _, err0 = build_system(g.poses)
    (poses, _, err), _ = jax.lax.scan(
        step, (g.poses, jnp.asarray(damp_init, g.poses.dtype), err0), None,
        length=num_iters,
    )
    return poses, (err, err0)
