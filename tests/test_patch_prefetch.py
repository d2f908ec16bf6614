"""CPU validation of the prefetch-pipelined dual gather
(ops/patch_prefetch.py).

The Mosaic kernel body cannot run on the CPU backend, but everything
that can actually go wrong off-TPU lives in the host-side plan (the
row-shifted plane stack, the packed per-point index words, the BlockSpec
index maps) and the XLA post-pass (taps, in-window gradients, boundary
masks).  These tests EMULATE the kernel body in numpy — decode each
packed word, slice the named (1, 24, 128) block out of the shift stack,
apply the lane roll, crop — and run the real `_postpass` on the result,
comparing against the plain XLA gather path (image/patch.py) and direct
window slices.  The Mosaic lowering itself is covered by the TPU verify
drive (bit-exact vs patch_pallas at 640x480 and 1280x720).

Reference hot loops: odometer.cpp:159,163 (util_getPatch_grad +
query-window resampling).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from invcompcamtrack_tpu.image import patch, pyramid
from invcompcamtrack_tpu.ops import patch_prefetch as pf
from invcompcamtrack_tpu.ops.window_sample import window_origin


def _emulate_kernel(stack: np.ndarray, words: np.ndarray, wr: int,
                    rows: int, cols: int) -> np.ndarray:
    """Numpy twin of the Pallas body: block fetch via the packed index
    word (same bit decode as the BlockSpec index maps) + lane roll."""
    out = np.empty((words.shape[0], rows, cols), np.float32)
    for i, w in enumerate(words):
        s = w & 31
        q = (w >> 5) & 1023
        cb = (w >> 15) & 31
        roll = (w >> 20) & 127
        blk = stack[s, wr * q:wr * (q + 1), 128 * cb:128 * (cb + 1)]
        # pltpu.roll(V, 128 - roll, axis=1) == rotate left by `roll`
        out[i] = np.roll(blk, -roll, axis=1)[:rows, :cols]
    return out


def _run_emulated(ref_img, query_img, centers, origins, psz, padding, win,
                  patch_norm=False):
    H, W = ref_img.shape
    rplane, qplane, idx, row0, col0, w, M, M_pad, wr = pf._plan(
        jnp.asarray(ref_img, jnp.float32), jnp.asarray(query_img, jnp.float32),
        jnp.asarray(centers, jnp.float32), jnp.asarray(origins, jnp.int32),
        psz, padding, win)
    idx = np.asarray(idx)
    raw_r = _emulate_kernel(np.asarray(rplane), idx[0::2][:M], wr,
                            wr, pf._RAWC)
    raw_q = _emulate_kernel(np.asarray(qplane), idx[1::2][:M], wr,
                            win, win)
    return pf._postpass(jnp.asarray(raw_r), jnp.asarray(raw_q),
                        row0, col0, w, jnp.asarray(centers, jnp.float32),
                        jnp.asarray(origins, jnp.int32),
                        psz, padding, win, H, W, patch_norm)


@pytest.mark.parametrize("shape", [(64, 96), (120, 168)])
@pytest.mark.parametrize("patch_norm", [False, True])
def test_prefetch_plan_matches_xla_gather(rng, shape, patch_norm):
    psz, pad, win = 8, 12, 16
    h, w_ = shape
    img = rng.uniform(0, 255, size=(h, w_)).astype(np.float32)
    qimg = rng.uniform(0, 255, size=(h, w_)).astype(np.float32)
    lvl = pyramid.build_pyramid(jnp.asarray(img), 1, pad)[0]
    lvq = pyramid.build_pyramid(jnp.asarray(qimg), 1, pad)[0]

    n = 40
    centers = np.stack([rng.uniform(2.0, w_ - 3.0, n),
                        rng.uniform(2.0, h - 3.0, n)], axis=-1)
    origins = np.asarray(window_origin(jnp.asarray(centers), psz, win, pad))

    p_img, p_dx, p_dy, qwin = _run_emulated(
        np.asarray(lvl.img), np.asarray(lvq.img), centers, origins,
        psz, pad, win, patch_norm)

    o_img, o_dx, o_dy = patch.extract_patches_grad(
        lvl.img, lvl.dx, lvl.dy, jnp.asarray(centers, jnp.float32),
        psz, pad, patch_norm=patch_norm, use_pallas=False)
    np.testing.assert_allclose(np.asarray(p_img), np.asarray(o_img),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_dx), np.asarray(o_dx),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_dy), np.asarray(o_dy),
                               rtol=0, atol=2e-4)

    # query windows: raw integer slices of the padded query image
    qp = np.asarray(lvq.img)
    for i in range(n):
        r0, c0 = origins[i]
        np.testing.assert_array_equal(np.asarray(qwin)[i],
                                      qp[r0:r0 + win, c0:c0 + win])


def test_supported_rejects_oversized_geometry():
    """The packed index word has 10 bits for the row block and 5 for
    the col block; supported(shape=...) must reject planes that would
    overflow them (ADVICE r4) instead of corrupting addresses."""
    span = 16
    assert pf._geom_fits((720, 1280), span)
    assert not pf._geom_fits((720, 4200), span)    # col block > 31
    assert not pf._geom_fits((12500, 1280), span)  # row block >= 1024
    if pf.prefetch_available():
        assert pf.supported(8, 16, shape=(720, 1280))
        assert not pf.supported(8, 16, shape=(720, 4200))
        # geometry mismatch (span too large for the fixed shift count)
        assert not pf.supported(24, 32)


def test_prefetch_handles_border_points(rng):
    """Points whose windows clip the padded-plane border must still
    decode to in-bounds blocks (the plan clips, the masks zero)."""
    psz, pad, win = 8, 12, 16
    h, w_ = 48, 64
    img = rng.uniform(0, 255, size=(h, w_)).astype(np.float32)
    lvl = pyramid.build_pyramid(jnp.asarray(img), 1, pad)[0]
    centers = np.array([[0.2, 0.4], [w_ - 1.2, h - 1.1],
                        [0.0, h - 1.0], [w_ - 1.0, 0.0]])
    origins = np.asarray(window_origin(jnp.asarray(centers), psz, win, pad))
    p_img, p_dx, p_dy, qwin = _run_emulated(
        np.asarray(lvl.img), np.asarray(lvl.img), centers, origins,
        psz, pad, win)
    o_img, o_dx, o_dy = patch.extract_patches_grad(
        lvl.img, lvl.dx, lvl.dy, jnp.asarray(centers, jnp.float32),
        psz, pad, use_pallas=False)
    np.testing.assert_allclose(np.asarray(p_img), np.asarray(o_img),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_dx), np.asarray(o_dx),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_dy), np.asarray(o_dy),
                               rtol=0, atol=2e-4)
    assert np.isfinite(np.asarray(qwin)).all()
