"""Independent numpy float64 implementation of the full IC-GN tracker.

Plays the role the reference's MATLAB prototype played for its C++
(reference: run_odometer_test.m:149-167): same algorithm, written plainly
with loops, used to pin the JAX implementation's numerics.  Uses the
image/geometry oracles from this package, not the library code.
"""

import numpy as np

from tests.oracles import geometry_np as geo
from tests.oracles import image_np as imo


def build_pyramid(img, num_levels, padding):
    """(img, dx, dy) per level; image replicate-padded, gradients
    zero-padded."""
    levels = []
    cur = np.asarray(img, float)
    for i in range(num_levels):
        if i > 0:
            cur = imo.downsample2x(cur)
        dx, dy = imo.central_gradients(cur)
        levels.append(
            (
                np.pad(cur, padding, mode="edge"),
                np.pad(dx, padding, mode="constant"),
                np.pad(dy, padding, mode="constant"),
            )
        )
    return levels


def extract_patch_padded(plane, cx, cy, psz, pad, patch_norm=False):
    out = np.zeros((psz, psz))
    for dy in range(psz):
        for dx in range(psz):
            out[dy, dx] = imo.bilinear_sample(
                plane, cx + pad + dx - psz // 2, cy + pad + dy - psz // 2
            )
    if patch_norm:
        out -= out.mean()
    return out


def track_pose(pyr_ref, pyr_new, X, p_init, fc, cc, wh, cfg):
    """cfg: ICGNParams-like (lv_f, lv_l, psz, maxiter, normdp_ratio,
    donorm, dopatchnorm).  Returns refined (6,) pose."""
    psz = cfg.psz
    pad = psz
    N = X.shape[0]

    if cfg.donorm:
        Xn, mean, varval = geo.normalize_points(np.asarray(X, float))
        p = geo.normalize_pose(np.asarray(p_init, float), mean, varval)
    else:
        Xn, mean, varval = np.asarray(X, float), None, None
        p = np.asarray(p_init, float).copy()

    G0 = geo.se3_exp(p)
    Xc_ref = Xn @ G0[:, :3].T + G0[:, 3]

    for s in range(cfg.lv_f, cfg.lv_l - 1, -1):
        sc = 0.5**s
        fx, fy = fc[0] * sc, fc[1] * sc
        cx, cy = cc[0] * sc, cc[1] * sc
        swo, sho = wh[0] * sc, wh[1] * sc
        img_r, dx_r, dy_r = pyr_ref[s]
        img_n, _, _ = pyr_new[s]

        uv_ref, _ = geo.project(G0, Xn, fx, fy, cx, cy)
        # bounds + chirality (behind-camera points mirror into bounds)
        valid_ref = (
            (uv_ref[:, 0] >= 0) & (uv_ref[:, 1] >= 0)
            & (uv_ref[:, 0] <= swo) & (uv_ref[:, 1] <= sho)
            & (Xc_ref[:, 2] > 0)
        )

        sd = np.zeros((N, 6, psz, psz))
        ref_pat = np.zeros((N, psz, psz))
        for i in range(N):
            if not valid_ref[i]:
                continue
            ref_pat[i] = extract_patch_padded(
                img_r, uv_ref[i, 0], uv_ref[i, 1], psz, pad, cfg.dopatchnorm
            )
            pdx = extract_patch_padded(dx_r, uv_ref[i, 0], uv_ref[i, 1], psz, pad)
            pdy = extract_patch_padded(dy_r, uv_ref[i, 0], uv_ref[i, 1], psz, pad)
            x, y, z = Xc_ref[i]
            zsq = z * z
            sd[i, 0] = pdx * (fx / z)
            sd[i, 1] = pdy * (fy / z)
            sd[i, 2] = pdx * (-x / zsq * fx) + pdy * (-y / zsq * fy)
            sd[i, 3] = pdx * (-x * y / zsq * fx) + pdy * (-(1 + y * y / zsq) * fy)
            sd[i, 4] = pdx * ((1 + x * x / zsq) * fx) + pdy * (x * y / zsq * fy)
            sd[i, 5] = pdx * (-y / z * fx) + pdy * (x / z * fy)

        S = sd.reshape(N, 6, -1)
        H = np.einsum("nkp,nlp->kl", S, S)

        normdp = 1e-10
        normdp_init = 1e-10
        it = 0
        G = geo.se3_exp(p)
        while it < cfg.maxiter and (normdp / normdp_init) > cfg.normdp_ratio:
            uv_new, Xc_new = geo.project(G, Xn, fx, fy, cx, cy)
            rhs = np.zeros(6)
            for i in range(N):
                if not valid_ref[i]:
                    continue
                u, v = uv_new[i]
                if u < 0 or v < 0 or u > swo or v > sho or Xc_new[i, 2] <= 0:
                    continue
                q = extract_patch_padded(img_n, u, v, psz, pad, cfg.dopatchnorm)
                pdiff = ref_pat[i] - q
                rhs += (S[i] @ pdiff.reshape(-1))
            delta = np.linalg.solve(H, rhs)
            p = p + delta
            G = geo.se3_exp(p)
            normdp = np.abs(delta).sum()
            if it == 0:
                normdp_init = normdp
            it += 1

    if cfg.donorm:
        p = geo.unnormalize_pose(p, mean, varval)
    return p
