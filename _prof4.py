import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np, jax, jax.numpy as jnp
from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.core import lie, pose as pose_ops
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match.features import shi_tomasi_corners
from invcompcamtrack_tpu.match.lk import lk_forward_backward
from invcompcamtrack_tpu.vo import synthetic
from invcompcamtrack_tpu.vo.engine import (VOConfig, VisualOdometry,
                                           _index_pyr, _row_get)
from tests.oracles import geometry_np as geo

rng = np.random.default_rng(1)
scene = synthetic.make_scene(rng, wh=(1280, 720), fc=(1000.0, 1200.0), z0=8.0,
                             freq_range=(0.5, 6.0))
poses_gt = [np.zeros(6)]
for i in range(1, 6):
    poses_gt.append(poses_gt[-1] + np.r_[0.02, 0.01*np.sin(i*0.3), 0.01, rng.normal(size=3)*0.001])
frames = np.stack([synthetic.render(scene, geo.se3_exp(p)) for p in poses_gt]).astype(np.float32)

tracker = ICGNParams(lv_f=4, lv_l=0, psz=8, maxiter=10)
cfg = VOConfig(tracker=tracker, max_landmarks=512, window=5, keyframe_stride=2,
               corners_per_kf=512, min_parallax_px=1.0)
cam = CameraPyramid.create(scene.fc, scene.cc, scene.wh, tracker.num_levels, tracker.psz)
vo = VisualOdometry(cam, scene.fc, scene.cc, cfg)
seeds = synthetic.sample_plane_points(scene, rng, 400, margin=24)
vo.bootstrap(frames[0], frames[1], poses_gt[0], poses_gt[1], seeds)
st = vo.state
dev = jax.device_put(frames)
cfgt = tracker

def timeit(name, f, *a, reps=8):
    out = f(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")

def prefix(state, img, do_lm_lk=True, do_corners=True, do_corner_lk=True,
           static_pyr=False):
    pyr = build_pyramid(img, cfgt.num_levels, cfgt.psz)
    fx, fy, cx, cy, swo, sho = cam.level(0)
    prev = state.kf_ptr
    if static_pyr:
        prev_pyr = pyr
    else:
        prev_pyr = _index_pyr(state.kf_pyr, prev)
    prev_pose = _row_get(state.kf_poses, prev)
    G_prev = lie.se3_exp(prev_pose)
    p_new = state.cur_pose
    G_new = lie.se3_exp(p_new)
    acc = jnp.zeros(2)
    if do_lm_lk:
        proj_prev = pose_ops.project_points(G_prev, state.landmarks, fx, fy, cx, cy)
        proj_new = pose_ops.project_points(G_new, state.landmarks, fx, fy, cx, cy)
        start = jnp.where(state.kf_obs_mask[prev][:, None], state.kf_obs[prev],
                          jnp.nan_to_num(proj_prev))
        xy_meas, ok = lk_forward_backward(prev_pyr, pyr, start,
                                          init_xy=jnp.nan_to_num(proj_new),
                                          psz=cfg.lk_psz, num_levels=cfgt.num_levels)
        acc = acc + jnp.sum(xy_meas, 0)
    if do_corners:
        interior = prev_pyr[0].img[cfgt.psz:-cfgt.psz, cfgt.psz:-cfgt.psz]
        xy0, cv = shi_tomasi_corners(interior, max_corners=cfg.corners_per_kf,
                                     border=cfgt.psz)
        acc = acc + jnp.sum(xy0, 0)
        if do_corner_lk:
            xy1, okc = lk_forward_backward(prev_pyr, pyr, xy0, psz=cfg.lk_psz,
                                           num_levels=cfgt.num_levels)
            acc = acc + jnp.sum(xy1, 0)
    return acc

timeit("pyr only", jax.jit(lambda s, im: prefix(s, im, False, False, False)), st, dev[3])
timeit("pyr+lmLK", jax.jit(lambda s, im: prefix(s, im, True, False, False)), st, dev[3])
timeit("pyr+corners", jax.jit(lambda s, im: prefix(s, im, False, True, False)), st, dev[3])
timeit("pyr+corners+cLK", jax.jit(lambda s, im: prefix(s, im, False, True, True)), st, dev[3])
timeit("all", jax.jit(lambda s, im: prefix(s, im, True, True, True)), st, dev[3])
timeit("all staticpyr", jax.jit(lambda s, im: prefix(s, im, True, True, True, static_pyr=True)), st, dev[3])

# rerun key combos to confirm; plus lmLK+cornerLK without corners-detect
def prefix2(state, img, lm=True, cdet=False, clk=False):
    pyr = build_pyramid(img, cfgt.num_levels, cfgt.psz)
    fx, fy, cx, cy, swo, sho = cam.level(0)
    prev = state.kf_ptr
    prev_pyr = _index_pyr(state.kf_pyr, prev)
    prev_pose = _row_get(state.kf_poses, prev)
    G_prev = lie.se3_exp(prev_pose)
    G_new = lie.se3_exp(state.cur_pose)
    acc = jnp.zeros(2)
    if lm:
        proj_prev = pose_ops.project_points(G_prev, state.landmarks, fx, fy, cx, cy)
        proj_new = pose_ops.project_points(G_new, state.landmarks, fx, fy, cx, cy)
        start = jnp.where(state.kf_obs_mask[prev][:, None], state.kf_obs[prev],
                          jnp.nan_to_num(proj_prev))
        xy_meas, ok = lk_forward_backward(prev_pyr, pyr, start,
                                          init_xy=jnp.nan_to_num(proj_new),
                                          psz=cfg.lk_psz, num_levels=cfgt.num_levels)
        acc = acc + jnp.sum(xy_meas, 0)
    if cdet:
        interior = prev_pyr[0].img[cfgt.psz:-cfgt.psz, cfgt.psz:-cfgt.psz]
        xy0, cv = shi_tomasi_corners(interior, max_corners=cfg.corners_per_kf, border=cfgt.psz)
    else:
        xy0 = jnp.tile(jnp.asarray([[100.0, 100.0]]), (cfg.corners_per_kf, 1)) + acc[None, :] * 0
    if clk:
        xy1, okc = lk_forward_backward(prev_pyr, pyr, xy0, psz=cfg.lk_psz,
                                       num_levels=cfgt.num_levels)
        acc = acc + jnp.sum(xy1, 0)
    return acc

timeit("R pyr+lmLK (again)", jax.jit(lambda s, im: prefix2(s, im, True, False, False)), st, dev[3])
timeit("R pyr+corners (again)", jax.jit(lambda s, im: prefix2(s, im, False, True, False)), st, dev[3])
timeit("R lmLK+cLK no-det", jax.jit(lambda s, im: prefix2(s, im, True, False, True)), st, dev[3])
timeit("R lmLK+det+cLK", jax.jit(lambda s, im: prefix2(s, im, True, True, True)), st, dev[3])
