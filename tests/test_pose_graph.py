import jax.numpy as jnp
import numpy as np

from invcompcamtrack_tpu.ba.pose_graph import (
    PoseGraph,
    optimize_pose_graph,
    relative_pose,
)
from invcompcamtrack_tpu.match.descriptors import ratio_match, sift_like_descriptors
from tests.oracles import geometry_np as geo


def test_relative_pose_roundtrip(rng):
    p_i = jnp.asarray(geo.random_pose(rng, 0.5, 0.2))
    p_j = jnp.asarray(geo.random_pose(rng, 0.5, 0.2))
    rel = relative_pose(p_i, p_j)
    # G_j == exp(rel) . G_i
    Gi, Gj = geo.se3_exp(np.asarray(p_i)), geo.se3_exp(np.asarray(p_j))
    Grel = geo.se3_exp(np.asarray(rel))
    np.testing.assert_allclose(Grel @ np.vstack([Gi, [0, 0, 0, 1]]), Gj, atol=1e-9)


def test_pose_graph_zero_residual_at_truth(rng):
    K = 6
    poses = np.stack([geo.random_pose(rng, 0.5, 0.1) for _ in range(K)])
    ei, ej, meas = [], [], []
    for k in range(K - 1):
        ei.append(k); ej.append(k + 1)
        meas.append(np.asarray(relative_pose(jnp.asarray(poses[k]),
                                             jnp.asarray(poses[k + 1]))))
    g = PoseGraph(
        poses=jnp.asarray(poses), edges_i=jnp.asarray(ei, jnp.int32),
        edges_j=jnp.asarray(ej, jnp.int32), edges_meas=jnp.asarray(meas),
        edges_weight=jnp.ones(len(ei)),
        fixed_mask=jnp.asarray(np.arange(K) == 0),
    )
    from invcompcamtrack_tpu.ba.pose_graph import graph_residuals

    assert float(jnp.max(jnp.abs(graph_residuals(g)))) < 1e-10


def test_pose_graph_loop_closure_corrects_drift(rng):
    """Chain of odometry edges with accumulated drift + one exact loop
    closure to the anchor: optimization must pull the last pose back."""
    K = 8
    gt = np.stack([np.r_[0.3 * k, 0.0, 0.0, 0, 0, 0.02 * k] for k in range(K)])
    # drifted initialization
    init = gt + np.r_[np.zeros(6)] * 0
    init = gt.copy()
    drift = np.cumsum(rng.normal(size=(K, 6)) * 0.02, axis=0)
    init[1:] += drift[1:]

    ei, ej, meas, w = [], [], [], []
    for k in range(K - 1):  # odometry edges from GT (slightly noisy)
        ei.append(k); ej.append(k + 1)
        meas.append(np.asarray(relative_pose(jnp.asarray(gt[k]),
                                             jnp.asarray(gt[k + 1])))
                    + rng.normal(size=6) * 1e-3)
        w.append(1.0)
    # loop closure: last -> first, exact
    ei.append(K - 1); ej.append(0)
    meas.append(np.asarray(relative_pose(jnp.asarray(gt[K - 1]),
                                         jnp.asarray(gt[0]))))
    w.append(10.0)

    g = PoseGraph(
        poses=jnp.asarray(init), edges_i=jnp.asarray(ei, jnp.int32),
        edges_j=jnp.asarray(ej, jnp.int32), edges_meas=jnp.asarray(meas),
        edges_weight=jnp.asarray(w),
        fixed_mask=jnp.asarray(np.arange(K) == 0),
    )
    poses, (err, err0) = optimize_pose_graph(g, num_iters=15)
    assert float(err) < float(err0) * 1e-2, (float(err0), float(err))
    e_init = np.abs(init - gt).max()
    e_opt = np.abs(np.asarray(poses) - gt).max()
    assert e_opt < e_init * 0.2, (e_init, e_opt)
    np.testing.assert_allclose(np.asarray(poses[0]), gt[0], atol=0)


def test_descriptor_ratio_matching(rng):
    """Descriptors of the same physical patches in two noisy renderings
    match with the ratio test; shuffled model order is recovered."""
    from invcompcamtrack_tpu.vo import synthetic

    scene = synthetic.make_scene(rng, wh=(160, 120), fc=(150.0, 152.0))
    img = synthetic.render(scene, geo.se3_exp(np.zeros(6)))
    img_a = jnp.asarray(np.pad(img + rng.normal(size=img.shape), 16, mode="edge"),
                        jnp.float32)
    img_b = jnp.asarray(np.pad(img + rng.normal(size=img.shape), 16, mode="edge"),
                        jnp.float32)
    pts = jnp.asarray(rng.uniform(30, 100, size=(24, 2)), jnp.float32)
    da = sift_like_descriptors(img_a, pts, padding=16)
    perm = rng.permutation(24)
    db = sift_like_descriptors(img_b, pts[perm], padding=16)
    idx, valid = ratio_match(da, db, ratio=0.85)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    inv = np.argsort(perm)  # model row of query k is inv[k]
    assert valid.mean() > 0.7
    assert (idx[valid] == inv[valid]).mean() > 0.95
