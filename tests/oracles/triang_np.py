"""Float64 numpy triangulation oracles, written from Hartley & Zisserman
and plain quotient-rule calculus (independent of both the C kernel and
the JAX implementation)."""

import numpy as np


def projection_matrix(fc, cc, R, tw):
    """P = K [-R | R tw] — the reference python-layer convention."""
    K = np.array([[fc[0], 0, cc[0]], [0, fc[1], cc[1]], [0, 0, 1.0]])
    return K @ np.concatenate([-R, (R @ tw)[:, None]], axis=1)


def project(P, X):
    ph = P @ np.append(X, 1.0)
    return ph[:2] / ph[2]


def residual_msq(P_list, pt2d, X):
    res = np.array([pt2d[v] - project(P_list[v], X) for v in range(len(P_list))])
    return res, (res**2).sum() / (2 * len(P_list))


def dlt(P_list, pt2d):
    rows = []
    for v, P in enumerate(P_list):
        x, y = pt2d[v]
        rows.append(x * P[2] - P[0])
        rows.append(y * P[2] - P[1])
    A = np.array(rows)
    AtA = A[:, :3].T @ A[:, :3]
    cov = np.linalg.inv(AtA)
    X = cov @ (A[:, :3].T @ (-A[:, 3]))
    return X, cov


def numeric_jacobian(P_list, X, eps=1e-6):
    J = np.zeros((2 * len(P_list), 3))
    for k in range(3):
        dX = np.zeros(3)
        dX[k] = eps
        fp = np.concatenate([project(P, X + dX) for P in P_list])
        fm = np.concatenate([project(P, X - dX) for P in P_list])
        J[:, k] = (fp - fm) / (2 * eps)
    return J


def gauss_newton(P_list, pt2d, X0, num_iters=10, minres=0.0):
    X = X0.copy()
    for _ in range(num_iters):
        res, msq = residual_msq(P_list, pt2d, X)
        if msq <= minres:
            break
        J = numeric_jacobian(P_list, X)
        delta = np.linalg.solve(J.T @ J, J.T @ res.reshape(-1))
        X = X + delta
    return X


def lm(P_list, pt2d, X0, num_iters=10, damp_init=2.0, damp_fct=10.0,
       minres=1e-5, maxdamp=1e10):
    """Reference LM flow (triang.c:327-373): try damped step; accept +
    damp/=f if residual dropped by > minres, else damp*=f and take (and
    keep) a fresh step from the pre-step point."""
    X = X0.copy()
    damp = damp_init
    _, res_old = residual_msq(P_list, pt2d, X)

    def lm_step(Xb, res_flat, JtJ, J, d):
        A = JtJ + d * np.diag(np.diag(JtJ))
        delta = np.linalg.solve(A, J.T @ res_flat)
        Xn = Xb + delta
        _, m = residual_msq(P_list, pt2d, Xn)
        return Xn, m

    for _ in range(num_iters):
        if res_old <= minres or damp >= maxdamp:
            break
        res, _ = residual_msq(P_list, pt2d, X)
        J = numeric_jacobian(P_list, X)
        JtJ = J.T @ J
        X_try, m_try = lm_step(X, res.reshape(-1), JtJ, J, damp)
        if m_try < res_old - minres:
            X, res_old, damp = X_try, m_try, damp / damp_fct
        else:
            damp = damp * damp_fct
            X, m2 = lm_step(X, res.reshape(-1), JtJ, J, damp)
            res_old = m2
    return X


def depth_only(P_list, pt2d, campos, ptdir, X0, num_iters=10, minres=0.0):
    depth = np.linalg.norm(X0 - campos)
    for _ in range(num_iters):
        X = campos + ptdir * depth
        res, msq = residual_msq(P_list, pt2d, X)
        if msq <= minres:
            break
        # numeric dproj/ddepth
        eps = 1e-6
        fp = np.concatenate([project(P, campos + ptdir * (depth + eps)) for P in P_list])
        fm = np.concatenate([project(P, campos + ptdir * (depth - eps)) for P in P_list])
        j = (fp - fm) / (2 * eps)
        delta = (j @ res.reshape(-1)) / (j @ j)
        depth += delta
    return campos + ptdir * depth
