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
d0, d1 = jax.device_put(img0), jax.device_put(img1)

def timeit(name, f, *a, reps=8):
    out = f(*a); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

psz = 8
interior = jnp.asarray(pyr0[0].img[psz:-psz, psz:-psz])
jax.block_until_ready(interior)

# a) corners on arg
timeit("a corners(arg)", jax.jit(lambda im: shi_tomasi_corners(im, max_corners=512, border=psz)), interior)
# b) corners on slice of padded arg
timeit("b corners(slice(arg))", jax.jit(lambda im: shi_tomasi_corners(im[psz:-psz, psz:-psz], max_corners=512, border=psz)), pyr0[0].img)
# c) corners on slice of in-program pyramid
timeit("c corners(pyr(img))", jax.jit(lambda im: shi_tomasi_corners(
    build_pyramid(im, tr.num_levels, psz)[0].img[psz:-psz, psz:-psz],
    max_corners=512, border=psz)), d0)
# d) LK on in-program top-k corners, pyramids as args
def lk_topk(pa, pb):
    xy0, cv = shi_tomasi_corners(pa[0].img[psz:-psz, psz:-psz], max_corners=512, border=psz)
    return lk_forward_backward(pa, pb, xy0, psz=8, num_levels=tr.num_levels)
timeit("d corners+LK(pyr args)", jax.jit(lk_topk), pyr0, pyr1)
# e) LK on arg positions (control)
xy = jnp.asarray(rng.uniform([20, 20], [1260, 700], size=(512, 2)), jnp.float32)
timeit("e LK(arg xy)", jax.jit(lambda pa, pb, p: lk_forward_backward(pa, pb, p, psz=8, num_levels=tr.num_levels)), pyr0, pyr1, xy)
# f) LK on stop_gradient-round-tripped corner xy (test if it's topk itself)
def lk_topk_rounded(pa, pb):
    xy0, cv = shi_tomasi_corners(pa[0].img[psz:-psz, psz:-psz], max_corners=512, border=psz)
    xy0 = jnp.round(xy0)  # no-op numerically (already ints as float)
    return lk_forward_backward(pa, pb, xy0, psz=8, num_levels=tr.num_levels)
timeit("f corners+LK rounded", jax.jit(lk_topk_rounded), pyr0, pyr1)

# g) LK with pyramids built in-program
def g(a_img, b_img, p):
    pa = build_pyramid(a_img, tr.num_levels, psz)
    pb = build_pyramid(b_img, tr.num_levels, psz)
    return lk_forward_backward(pa, pb, p, psz=8, num_levels=tr.num_levels)
timeit("g LK(in-prog pyrs, arg xy)", jax.jit(g), d0, d1, xy)

# h) corners + LK, pyramids in-program
def h(a_img, b_img):
    pa = build_pyramid(a_img, tr.num_levels, psz)
    pb = build_pyramid(b_img, tr.num_levels, psz)
    xy0, cv = shi_tomasi_corners(pa[0].img[psz:-psz, psz:-psz], max_corners=512, border=psz)
    return lk_forward_backward(pa, pb, xy0, psz=8, num_levels=tr.num_levels)
timeit("h corners+LK(in-prog pyrs)", jax.jit(h), d0, d1)

xy2 = jnp.asarray(rng.uniform([20, 20], [1260, 700], size=(512, 2)), jnp.float32)
# i) two LK fb calls in one program
def i2(pa, pb, p, q):
    a, va = lk_forward_backward(pa, pb, p, psz=8, num_levels=tr.num_levels)
    b, vb = lk_forward_backward(pa, pb, q, psz=8, num_levels=tr.num_levels)
    return jnp.sum(a) + jnp.sum(b)
timeit("i two LKfb", jax.jit(i2), pyr0, pyr1, xy, xy2)
# j) two LK fb + corners (in-prog pyrs)
def j2(a_img, b_img, p):
    pa = build_pyramid(a_img, tr.num_levels, psz)
    pb = build_pyramid(b_img, tr.num_levels, psz)
    xy0, cv = shi_tomasi_corners(pa[0].img[psz:-psz, psz:-psz], max_corners=512, border=psz)
    a, va = lk_forward_backward(pa, pb, p, psz=8, num_levels=tr.num_levels)
    b, vb = lk_forward_backward(pa, pb, xy0, psz=8, num_levels=tr.num_levels)
    return jnp.sum(a) + jnp.sum(b)
timeit("j corners+2LKfb inprog", jax.jit(j2), d0, d1, xy)
