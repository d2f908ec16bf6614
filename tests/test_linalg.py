"""Closed-form symmetric 3x3 eigendecomposition oracle tests.

``ops/linalg.py::sym3x3_eigh`` replaces batched ``jnp.linalg.eigh`` in the
BA landmark-block truncated pseudo-inverse (ba/window.py) because the
iterative Jacobi lowering's f32 noise on near-singular PSD blocks poisoned
joint landmark steps on TPU (docs/parity.md deviation #8).  The reference
solves its own 3x3 landmark systems in closed form
(reference: misc_src/triang.c:135-148); these tests pin the analytic
eigensolver against the trusted f64 LAPACK oracle across the regimes that
matter: generic, near-singular PSD, clustered/double/triple roots, and
extreme scales.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from invcompcamtrack_tpu.ops.linalg import sym3x3_eigh, sym3x3_trunc_pinv


def _random_sym(rng, n, cond_exp=0.0):
    """Random symmetric PSD batch with eigenvalue spread 10**-cond_exp."""
    A = rng.normal(size=(n, 3, 3))
    Q, _ = np.linalg.qr(A)
    lam = rng.uniform(0.1, 1.0, size=(n, 3))
    lam[:, 0] *= 10.0 ** (-cond_exp)
    return np.einsum("nij,nj,nkj->nik", Q, lam, Q)


def _check_against_oracle(A, dtype, lam_rtol, recon_rtol):
    """lam vs LAPACK-f64; V orthonormal; V diag(lam) V^T reconstructs A."""
    lam_ref = np.linalg.eigvalsh(A)
    lam, V = sym3x3_eigh(jnp.asarray(A, dtype))
    lam = np.asarray(lam, np.float64)
    V = np.asarray(V, np.float64)
    scale = np.abs(lam_ref).max(axis=-1, keepdims=True)
    np.testing.assert_allclose(lam, lam_ref, atol=lam_rtol * scale.max(),
                               rtol=lam_rtol)
    # orthonormal columns
    VtV = np.einsum("nji,njk->nik", V, V)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=64 * np.finfo(dtype).eps)
    # reconstruction (the property the pseudo-inverse actually needs)
    R = np.einsum("nij,nj,nkj->nik", V, lam, V)
    err = np.abs(R - A).max(axis=(-2, -1))
    assert (err <= recon_rtol * np.maximum(scale[..., 0], 1e-30)).all()


def test_sym3x3_eigh_generic_f64(rng):
    A = _random_sym(rng, 256)
    _check_against_oracle(A, np.float64, 1e-12, 1e-12)


def test_sym3x3_eigh_generic_f32(rng):
    A = _random_sym(rng, 256)
    _check_against_oracle(A, np.float32, 1e-5, 1e-5)


def test_sym3x3_eigh_near_singular_psd(rng):
    # the BA regime: lambda_min/lambda_max down to 1e-8 (f32 eps**2-ish)
    for cond_exp in (4.0, 6.0, 8.0):
        A = _random_sym(rng, 128, cond_exp=cond_exp)
        _check_against_oracle(A, np.float32, 2e-5, 2e-5)
        _check_against_oracle(A, np.float64, 1e-12, 1e-12)


def test_sym3x3_eigh_degenerate_roots(rng):
    # double roots, triple roots, zero matrix, rank-1
    Q, _ = np.linalg.qr(rng.normal(size=(8, 3, 3)))
    cases = []
    for lam in ([1.0, 1.0, 2.0], [2.0, 1.0, 1.0], [1.0, 1.0, 1.0],
                [0.0, 0.0, 1.0], [0.0, 1.0, 1.0], [0.0, 0.0, 0.0]):
        cases.append(np.einsum("nij,j,nkj->nik", Q, np.array(lam), Q))
    A = np.concatenate(cases, axis=0)
    # clustered roots cost sqrt(eps)*||A|| inherently (the characteristic
    # cubic is flat there) — harmless for the relative-floor truncation
    _check_against_oracle(A, np.float64, 1e-7, 1e-7)
    _check_against_oracle(A, np.float32, 1e-3, 1e-3)


def test_sym3x3_eigh_extreme_scales(rng):
    A = _random_sym(rng, 64)
    for s in (1e-20, 1e-6, 1e6, 1e18):
        _check_against_oracle(A * s, np.float64, 1e-12, 1e-12)
    for s in (1e-18, 1e-3, 1e3, 1e18):
        _check_against_oracle((A * s).astype(np.float32), np.float32,
                              2e-5, 2e-5)


def test_sym3x3_eigh_matches_eigh_convention(rng):
    # ascending eigenvalues, columns are eigenvectors — same as jnp eigh
    A = _random_sym(rng, 32)
    lam, V = sym3x3_eigh(jnp.asarray(A))
    lam = np.asarray(lam)
    assert (np.diff(lam, axis=-1) >= -1e-12).all()
    Av = np.einsum("nij,njk->nik", A, np.asarray(V))
    lv = lam[:, None, :] * np.asarray(V)
    np.testing.assert_allclose(Av, lv, atol=1e-10)


def test_sym3x3_trunc_pinv_f32_matches_f64_oracle(rng):
    """The deviation-#8 claim: f32 closed-form truncated pinv agrees with
    the f64 LAPACK oracle on near-singular PSD blocks, where f32 iterative
    eigh did not."""
    floor = 1e-5
    A = _random_sym(rng, 256, cond_exp=7.0)  # lambda ratio 1e-7 < floor

    lam, Q = np.linalg.eigh(A)
    keep = lam > floor * lam[..., 2:3]
    inv_l = np.where(keep, 1.0 / np.maximum(lam, 1e-300), 0.0)
    P_ref = np.einsum("nij,nj,nkj->nik", Q, inv_l, Q)

    P32 = np.asarray(sym3x3_trunc_pinv(jnp.asarray(A, jnp.float32), floor),
                     np.float64)
    # compare action scaled by the largest kept inverse eigenvalue
    scale = np.abs(P_ref).max(axis=(-2, -1), keepdims=True)
    err = np.abs(P32 - P_ref) / np.maximum(scale, 1e-30)
    assert err.max() < 5e-5, err.max()


def test_sym3x3_trunc_pinv_truncates_null_directions(rng):
    # rank-2 blocks: the null direction must contribute exactly zero
    Q, _ = np.linalg.qr(rng.normal(size=(32, 3, 3)))
    lam = np.stack([np.zeros(32), np.full(32, 0.5), np.ones(32)], axis=-1)
    A = np.einsum("nij,nj,nkj->nik", Q, lam, Q)
    P = np.asarray(sym3x3_trunc_pinv(jnp.asarray(A), 1e-6), np.float64)
    null = Q[..., :, 0]
    out = np.einsum("nij,nj->ni", P, null)
    np.testing.assert_allclose(out, 0.0, atol=1e-10)
    # kept directions invert
    v1 = Q[..., :, 2]
    np.testing.assert_allclose(np.einsum("nij,nj->ni", P, v1), v1,
                               atol=1e-10)
