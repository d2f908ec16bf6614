"""NVM sequence replay driver.

The new-framework equivalent of the reference's MATLAB oracle loop
(reference: run_odometer_test.m:21-39,197-244): load an NVM model (or
synthesize one), normalize, track frame-to-frame through the byte-level
CLI protocol, print per-frame camera-center error vs the model cameras.

Usage:
  python examples/run_nvm_sequence.py --synthetic
  python examples/run_nvm_sequence.py --nvm model.nvm --images 'seq/*.png' \
      --fc 1000 1200 --cc 640 360 --wh 1280 720
"""

import argparse
import glob
import json
import pathlib
import tempfile

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nvm")
    ap.add_argument("--images")
    ap.add_argument("--fc", nargs=2, type=float)
    ap.add_argument("--cc", nargs=2, type=float)
    ap.add_argument("--wh", nargs=2, type=int)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--out", default="nvm_replay_metrics.jsonl")
    args = ap.parse_args()

    from invcompcamtrack_tpu.vo import replay

    workdir = pathlib.Path(tempfile.mkdtemp(prefix="nvm_replay_"))
    if args.synthetic or not args.nvm:
        rng = np.random.default_rng(0)
        nvm_path, image_paths, fc, cc, wh = replay.make_synthetic_nvm_scenario(
            rng, workdir / "scenario", n_frames=args.frames
        )
        print(f"synthetic NVM scenario at {workdir / 'scenario'}")
    else:
        nvm_path = args.nvm
        image_paths = sorted(glob.glob(args.images))
        fc, cc, wh = tuple(args.fc), tuple(args.cc), tuple(args.wh)

    poses, err = replay.replay_sequence(
        nvm_path, image_paths, workdir, fc, cc, wh, verbose=True
    )
    with open(args.out, "w") as f:
        for i, e in enumerate(err):
            f.write(json.dumps({"frame": i, "center_err": float(e)}) + "\n")
    print(f"frames: {len(err)}  mean center err: {err.mean():.5f}  "
          f"max: {err.max():.5f}  (normalized units)")


if __name__ == "__main__":
    main()
