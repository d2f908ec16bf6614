"""Example: NCC optical-flow point tracking over a clip (BASELINE config 2;
the reference's run_OF_point_track workload, reference:
run_OF_point_track.py.ipynb).

Dense LK flow per frame pair (fwd+bwd) feeds the fixed-capacity track
table with the forward/backward consistency gate; corners re-seed dead
slots each frame.  Works on any image directory or, with --synthetic,
a generated clip.

Usage: python examples/run_of_point_track.py [--frames N] [imgdir]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from invcompcamtrack_tpu.image.pyramid import build_pyramid
from invcompcamtrack_tpu.match.dense_flow import dense_flow_lk
from invcompcamtrack_tpu.match.features import shi_tomasi_corners
from invcompcamtrack_tpu.match.track import advance_tracks, make_track_table, point_pairs
from invcompcamtrack_tpu.utils.viz import viz_flow


def synthetic_clip(n_frames, rng):
    from invcompcamtrack_tpu.core import lie
    from invcompcamtrack_tpu.vo import synthetic

    scene = synthetic.make_scene(rng, wh=(256, 192), fc=(240.0, 242.0))
    p = np.zeros(6)
    frames = []
    for i in range(n_frames):
        G = np.asarray(lie.se3_exp(jnp.asarray(p, jnp.float32)), np.float64)
        frames.append(synthetic.render(scene, G))
        p = p + np.r_[0.01, 0.004, 0.004, rng.normal(size=3) * 0.001]
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("imgdir", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.imgdir:
        import pathlib
        from invcompcamtrack_tpu.utils.image import load_gray

        paths = sorted(pathlib.Path(args.imgdir).glob("*"))[: args.frames]
        frames = [load_gray(p) for p in paths]
    else:
        frames = synthetic_clip(args.frames, rng)

    L, pad = 3, 8
    pyrs = [build_pyramid(jnp.asarray(f, jnp.float32), L, pad) for f in frames]
    table = make_track_table(args.capacity, window=6)

    flow_fn = jax.jit(lambda a, b: dense_flow_lk(a, b, pad, iters=4))
    corner_fn = jax.jit(
        lambda img: shi_tomasi_corners(img, max_corners=args.capacity, border=pad)
    )

    for i in range(len(frames) - 1):
        flow_f = flow_fn(pyrs[i], pyrs[i + 1])
        flow_b = flow_fn(pyrs[i + 1], pyrs[i])
        xy, valid = corner_fn(pyrs[i + 1][0].img[pad:-pad, pad:-pad])
        table = advance_tracks(table, flow_f, flow_b, xy, valid)
        pairs, pvalid = point_pairs(table)
        n = int(jnp.sum(pvalid))
        disp = jnp.linalg.norm(pairs[:, 1] - pairs[:, 0], axis=1)
        med = float(jnp.nanmedian(jnp.where(pvalid, disp, jnp.nan))) if n else float("nan")
        print(f"frame {i+1}: live tracks {int(table.alive.sum())}, "
              f"verified pairs {n}, median step {med:.2f} px")

    rendered = viz_flow(np.asarray(flow_f)[..., 0], np.asarray(flow_f)[..., 1])
    print("final flow field rendered:", rendered.shape, rendered.dtype)


if __name__ == "__main__":
    sys.exit(main())
