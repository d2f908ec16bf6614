"""Slow, trusted float64 numpy oracles.

Independent re-derivations of the textbook formulas the reference
implements (Eade, "Lie Groups for Computer Vision"; Baker & Matthews
"Lucas-Kanade 20 Years On" for IC alignment; Hartley & Zisserman for
triangulation).  Used as ground truth for the JAX implementations, in the
same role the reference's MATLAB prototypes played for its C++
(reference: run_odometer_test.m:149-167, run_ctypestest_triangulation.py).
"""

import numpy as np

SIG_THRESH = 1e-4
EPSILON = 1e-10


def skew(w):
    return np.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]]
    )


def se3_exp(p):
    """[t, w] -> 3x4 [R | V t] via matrix exponential (scipy-free)."""
    t, w = np.asarray(p[:3], float), np.asarray(p[3:6], float)
    th = np.linalg.norm(w)
    wx = skew(w)
    if th < SIG_THRESH:
        # Taylor, matching the solver's switch point
        sa = 1 - th**2 / 6 * (1 - th**2 / 20 * (1 - th**2 / 42))
        sb = 0.5 * (1 - th**2 / 12 * (1 - th**2 / 30 * (1 - th**2 / 56)))
        sc = (1 - th**2 / 20 * (1 - th**2 / 42 * (1 - th**2 / 72))) / 6
    else:
        sa = np.sin(th) / th
        sb = (1 - np.cos(th)) / th**2
        sc = (th - np.sin(th)) / th**3
    R = np.eye(3) + sa * wx + sb * (wx @ wx)
    V = np.eye(3) + sb * wx + sc * (wx @ wx)
    return np.concatenate([R, (V @ t)[:, None]], axis=1)


def se3_exp_expm(p):
    """Reference-free oracle: exponential of the 4x4 generator sum by
    scaling-and-squaring (independent of the closed form above)."""
    t, w = np.asarray(p[:3], float), np.asarray(p[3:6], float)
    A = np.zeros((4, 4))
    A[:3, :3] = skew(w)
    A[:3, 3] = t
    # series with scaling and squaring
    n = 30
    s = max(0, int(np.ceil(np.log2(max(np.abs(A).sum(), 1e-30)))) + 1)
    As = A / (2**s)
    E = np.eye(4)
    term = np.eye(4)
    for k in range(1, n):
        term = term @ As / k
        E = E + term
    for _ in range(s):
        E = E @ E
    return E[:3, :]


def se3_log(G):
    G = np.asarray(G, float)
    R, t = G[:, :3], G[:, 3]
    th = np.arccos(np.clip(0.5 * (np.trace(R) - 1.0), -1.0, 1.0))
    if th < EPSILON:
        wx = np.zeros((3, 3))
    else:
        wx = th / (2 * np.sin(th)) * (R - R.T)
    w = np.array([-wx[1, 2], wx[0, 2], -wx[0, 1]])
    if th < SIG_THRESH:
        h = 1.0 / 12.0
    else:
        h = (1 - th / (2 * np.tan(th / 2))) / th**2
    V_inv = np.eye(3) - 0.5 * wx + h * (wx @ wx)
    return np.concatenate([V_inv @ t, w])


def normalize_points(X):
    mean = X.mean(axis=0)
    c = X - mean
    varval = np.mean(np.sum(c * c, axis=1))
    return c / varval, mean, varval


def normalize_pose(p, mean, varval):
    G = se3_exp(p)
    R = G[:, :3]
    c = -R.T @ G[:, 3]
    c = (c - mean) / varval
    return se3_log(np.concatenate([R, (-R @ c)[:, None]], axis=1))


def unnormalize_pose(p, mean, varval):
    G = se3_exp(p)
    R = G[:, :3]
    c = -R.T @ G[:, 3]
    c = c * varval + mean
    return se3_log(np.concatenate([R, (-R @ c)[:, None]], axis=1))


def project(G, X, fx, fy, cx, cy):
    Xc = X @ G[:, :3].T + G[:, 3]
    return np.stack(
        [Xc[:, 0] / Xc[:, 2] * fx + cx, Xc[:, 1] / Xc[:, 2] * fy + cy], axis=1
    ), Xc


def random_pose(rng, tscale=1.0, wscale=0.5):
    return np.concatenate(
        [rng.normal(scale=tscale, size=3), rng.normal(scale=wscale, size=3)]
    )
