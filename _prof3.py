import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np, jax, jax.numpy as jnp
from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.core.camera import CameraPyramid
from invcompcamtrack_tpu.vo import synthetic, engine as eng
from invcompcamtrack_tpu.vo.engine import VOConfig, VisualOdometry
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

def timeit(name, f, *a, reps=8):
    out = f(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")

f_kf = jax.jit(lambda s, im: eng._keyframe_step(s, im, cam, cfg))
timeit("kf full", f_kf, st, dev[3])

# stub LK
orig_lk = eng.lk_forward_backward
def fake_lk(pa, pb, xy, init_xy=None, **kw):
    out = xy if init_xy is None else init_xy
    return out, jnp.ones(xy.shape[0], bool)
eng.lk_forward_backward = fake_lk
f2 = jax.jit(lambda s, im: eng._keyframe_step(s, im, cam, cfg))
timeit("kf lk-stub", f2, st, dev[3])
eng.lk_forward_backward = orig_lk

# stub corners
orig_c = eng.shi_tomasi_corners
def fake_corners(im, max_corners=512, border=8):
    n = max_corners
    return jnp.tile(jnp.asarray([[100.0, 100.0]]), (n, 1)), jnp.ones(n, bool)
eng.shi_tomasi_corners = fake_corners
f3 = jax.jit(lambda s, im: eng._keyframe_step(s, im, cam, cfg))
timeit("kf corner-stub", f3, st, dev[3])
eng.shi_tomasi_corners = orig_c

# stub triangulation
orig_t1, orig_t2 = eng.triangulate_dlt, eng.triangulate_gn
eng.triangulate_dlt = lambda P, obs, **kw: (jnp.ones((obs.shape[0], 3)), jnp.zeros(obs.shape[0]))
eng.triangulate_gn = lambda P, obs, X, **kw: (X, jnp.zeros(obs.shape[0]))
f4 = jax.jit(lambda s, im: eng._keyframe_step(s, im, cam, cfg))
timeit("kf triang-stub", f4, st, dev[3])
eng.triangulate_dlt, eng.triangulate_gn = orig_t1, orig_t2

# stub ba_solve
orig_ba = eng.ba_solve
eng.ba_solve = lambda prob, **kw: (prob.poses, prob.landmarks, jnp.zeros(()))
f5 = jax.jit(lambda s, im: eng._keyframe_step(s, im, cam, cfg))
timeit("kf ba-stub", f5, st, dev[3])
eng.ba_solve = orig_ba

# stub track_pose (the IC-GN in _track_frame)
orig_tp = eng.track_pose
def fake_tp(ref_pyr, pyr, X, p, cam_, cfg_, point_mask=None):
    return p
eng.track_pose = fake_tp
f6 = jax.jit(lambda s, im: eng._keyframe_step(s, im, cam, cfg))
timeit("kf trackpose-stub", f6, st, dev[3])
eng.track_pose = orig_tp
