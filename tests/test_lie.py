import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invcompcamtrack_tpu.core import lie
from tests.oracles import geometry_np as ora


def test_exp_matches_closed_form_oracle(rng):
    for _ in range(50):
        p = ora.random_pose(rng, tscale=2.0, wscale=1.5)
        G = np.asarray(lie.se3_exp(jnp.asarray(p)))
        np.testing.assert_allclose(G, ora.se3_exp(p), rtol=1e-12, atol=1e-12)


def test_exp_matches_matrix_exponential(rng):
    """Independent oracle: scaling-and-squaring expm of the generator."""
    for _ in range(20):
        p = ora.random_pose(rng, tscale=2.0, wscale=2.0)
        G = np.asarray(lie.se3_exp(jnp.asarray(p)))
        np.testing.assert_allclose(G, ora.se3_exp_expm(p), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("scale", [1e-12, 1e-8, 1e-5, 9.9e-5, 1.01e-4, 1e-2])
def test_exp_small_angle_branches(rng, scale):
    p = np.concatenate([rng.normal(size=3), rng.normal(size=3) * scale])
    G = np.asarray(lie.se3_exp(jnp.asarray(p)))
    np.testing.assert_allclose(G, ora.se3_exp_expm(p), rtol=1e-9, atol=1e-12)
    # Round trip through log.  Below ~1e-8 rad the rotation is lost to
    # acos((tr-1)/2) precision — identical to the reference's double
    # implementation — so only absolute accuracy is meaningful there.
    p2 = np.asarray(lie.se3_log(jnp.asarray(G)))
    np.testing.assert_allclose(p2, p, rtol=1e-6, atol=2e-8)


def test_log_matches_oracle(rng):
    for _ in range(50):
        p = ora.random_pose(rng, tscale=2.0, wscale=1.0)
        G = ora.se3_exp(p)
        out = np.asarray(lie.se3_log(jnp.asarray(G)))
        np.testing.assert_allclose(out, ora.se3_log(G), rtol=1e-10, atol=1e-12)


def test_exp_log_roundtrip(rng):
    for _ in range(50):
        p = ora.random_pose(rng, tscale=3.0, wscale=1.2)
        if np.linalg.norm(p[3:]) < np.pi - 1e-3:
            # inside the principal branch the coefficients round-trip
            p2 = np.asarray(lie.se3_log(lie.se3_exp(jnp.asarray(p))))
            np.testing.assert_allclose(p2, p, rtol=1e-8, atol=1e-10)
        # the group element always round-trips (log gives the equivalent
        # principal-branch rotation for |w| > pi)
        G = lie.se3_exp(jnp.asarray(p))
        G2 = lie.se3_exp(lie.se3_log(G))
        np.testing.assert_allclose(np.asarray(G2), np.asarray(G), rtol=1e-7, atol=1e-9)


def test_batched_and_vmap_consistency(rng):
    ps = jnp.asarray(rng.normal(size=(17, 6)))
    batched = lie.se3_exp(ps)
    vmapped = jax.vmap(lie.se3_exp)(ps)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(vmapped), rtol=0, atol=0)
    single = np.stack([np.asarray(lie.se3_exp(ps[i])) for i in range(17)])
    np.testing.assert_allclose(np.asarray(batched), single, rtol=1e-12, atol=1e-12)


def test_zero_rotation_is_identity_translation():
    p = jnp.array([1.0, -2.0, 3.0, 0.0, 0.0, 0.0])
    G = np.asarray(lie.se3_exp(p))
    np.testing.assert_allclose(G[:, :3], np.eye(3), atol=0)
    np.testing.assert_allclose(G[:, 3], [1.0, -2.0, 3.0], atol=0)
    p2 = np.asarray(lie.se3_log(jnp.asarray(G)))
    np.testing.assert_allclose(p2, np.asarray(p), atol=1e-15)


def test_compose_inverse_center(rng):
    pa = jnp.asarray(ora.random_pose(rng))
    pb = jnp.asarray(ora.random_pose(rng))
    Ga, Gb = lie.se3_exp(pa), lie.se3_exp(pb)
    Gab = lie.se3_compose(Ga, Gb)
    X = jnp.asarray(rng.normal(size=(5, 3)))
    lhs = jnp.einsum("ij,nj->ni", Gab[:, :3], X) + Gab[:, 3]
    rhs_in = jnp.einsum("ij,nj->ni", Gb[:, :3], X) + Gb[:, 3]
    rhs = jnp.einsum("ij,nj->ni", Ga[:, :3], rhs_in) + Ga[:, 3]
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-12, atol=1e-12)

    Gi = lie.se3_inverse(Ga)
    ident = lie.se3_compose(Ga, Gi)
    np.testing.assert_allclose(np.asarray(ident[:, :3]), np.eye(3), atol=1e-14)
    np.testing.assert_allclose(np.asarray(ident[:, 3]), 0.0, atol=1e-14)

    c = lie.camera_center(Ga)
    proj = jnp.einsum("ij,j->i", Ga[:, :3], c) + Ga[:, 3]
    np.testing.assert_allclose(np.asarray(proj), 0.0, atol=1e-14)


def test_gradients_finite_everywhere(rng):
    """where-guards must not leak NaNs into grads, incl. at w ~ 0."""
    def loss(p):
        return jnp.sum(lie.se3_exp(p) ** 2)

    for w in [np.zeros(3), np.full(3, 1e-9), rng.normal(size=3)]:
        p = jnp.asarray(np.concatenate([rng.normal(size=3), w]))
        g = jax.grad(loss)(p)
        assert np.all(np.isfinite(np.asarray(g)))


def test_float32_accuracy(rng):
    p = ora.random_pose(rng)
    G32 = np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)))
    assert G32.dtype == np.float32
    np.testing.assert_allclose(G32, ora.se3_exp(p), rtol=1e-5, atol=1e-5)
