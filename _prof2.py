import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import numpy as np, jax, jax.numpy as jnp
from invcompcamtrack_tpu.config import ICGNParams
from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match.features import shi_tomasi_corners
from invcompcamtrack_tpu.match.lk import lk_forward_backward
from invcompcamtrack_tpu.vo import synthetic
from tests.oracles import geometry_np as geo

rng = np.random.default_rng(1)
scene = synthetic.make_scene(rng, wh=(1280, 720), fc=(1000.0, 1200.0), z0=8.0,
                             freq_range=(0.5, 6.0))
img0 = synthetic.render(scene, geo.se3_exp(np.zeros(6))).astype(np.float32)
img1 = synthetic.render(scene, geo.se3_exp(np.r_[0.02, 0.01, 0.01, 0.001, 0.001, 0.0])).astype(np.float32)

tr = ICGNParams(lv_f=4, lv_l=0, psz=8, maxiter=10)
pyr0 = build_pyramid(jnp.asarray(img0), tr.num_levels, tr.psz)
pyr1 = build_pyramid(jnp.asarray(img1), tr.num_levels, tr.psz)
jax.block_until_ready(pyr0[0].img)

N = 512
xy = jnp.asarray(rng.uniform([20, 20], [1260, 700], size=(N, 2)), jnp.float32)

def timeit(name, fn, *a, reps=8):
    out = fn(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")

interior = pyr0[0].img[tr.psz:-tr.psz, tr.psz:-tr.psz]
f_corners = jax.jit(lambda im: shi_tomasi_corners(im, max_corners=512, border=tr.psz))
timeit("shi_tomasi 720p", f_corners, interior)

f_lkfb = jax.jit(lambda a_img, b_img, p: lk_forward_backward(
    build_pyramid(a_img, tr.num_levels, tr.psz),
    build_pyramid(b_img, tr.num_levels, tr.psz), p, psz=8,
    num_levels=tr.num_levels))
# avoid double pyramid cost: jit lk on prebuilt pyramids
f_lkfb2 = jax.jit(lambda pa, pb, p: lk_forward_backward(pa, pb, p, psz=8, num_levels=tr.num_levels))
timeit("lk_fb 512pts 5lvl", f_lkfb2, pyr0, pyr1, xy)

from invcompcamtrack_tpu.match.lk import track_points_lk
f_lk1 = jax.jit(lambda pa, pb, p: track_points_lk(pa, pb, p, psz=8, num_levels=tr.num_levels))
timeit("lk one-way 512pts", f_lk1, pyr0, pyr1, xy)
f_lk1nc = jax.jit(lambda pa, pb, p: track_points_lk(pa, pb, p, psz=8, num_levels=tr.num_levels, window_cache=False))
timeit("lk one-way nocache", f_lk1nc, pyr0, pyr1, xy)
