"""Synthetic-scene detection quality harness.

Renders scenes with known face geometry (training.synth renderer, held-out
seeds), runs the full detector, and reports recall / false positives / eye
error using the reference acceptance criterion (relative eye error < 0.25 of
inter-eye distance, FaceDetectUpdated.py:887).

Usage: python tools/eval_synth.py [--pipeline_dir DIR] [--n 20] [--seed 999]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pipeline_dir", default="SavedNetworksTPU")
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--seed", type=int, default=999)
    p.add_argument("--canvas", type=int, default=320)
    p.add_argument("--face_size_min", type=float, default=70.0)
    p.add_argument("--face_size_max", type=float, default=150.0)
    p.add_argument("--smallest_face", type=float, default=0.15)
    p.add_argument("--angle_max", type=float, default=0.0,
                   help="max |in-plane face angle| in degrees")
    p.add_argument("--eye_tol", type=float, default=-1.0,
                   help="override tolerance_xy_eye (-1 = model default)")
    p.add_argument("--pos_gain", type=float, default=-1.0)
    args = p.parse_args(argv)

    import jax

    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector
    from pyfaceanalysis_tpu.engine.nms import relative_eye_error_np
    from pyfaceanalysis_tpu.training import synth

    model = DetectionModel.load(args.pipeline_dir)
    cfg = DetectorConfig(smallest_face=args.smallest_face,
                         tolerance_xy_eye=args.eye_tol,
                         pos_gain=args.pos_gain)
    det = FaceDetector(model, cfg)

    rng = np.random.RandomState(args.seed)
    tp = fp = fn = 0
    eye_errors = []
    age_errors = []
    race_hits = gender_hits = arg_total = 0
    t0 = time.time()
    for i in range(args.n):
        F = rng.uniform(args.face_size_min, args.face_size_max)
        margin = 0.8 * F
        cx = rng.uniform(margin, args.canvas - margin)
        cy = rng.uniform(margin, args.canvas - margin)
        ang = rng.uniform(-args.angle_max, args.angle_max)
        key = jax.random.PRNGKey(args.seed * 100000 + i)
        img, attrs = synth.render_face(
            key, canvas_hw=(args.canvas, args.canvas), face_size=F,
            center=(cx, cy), angle_deg=ang)
        true_eyes = np.concatenate([np.asarray(attrs["eye_l"]),
                                    np.asarray(attrs["eye_r"])])
        out = det.detect(np.asarray(img))
        matched = False
        for d in out:
            eyes = np.array([*d.eye_left, *d.eye_right])
            err = relative_eye_error_np(eyes, true_eyes)
            if err < 0.25:
                if not matched:
                    tp += 1
                    eye_errors.append(err)
                    if d.age is not None:
                        arg_total += 1
                        age_errors.append(abs(d.age - float(attrs["age"])))
                        race_hits += int(np.sign(d.race_value)
                                         == np.sign(float(attrs["race"])))
                        gender_hits += int(np.sign(d.gender_value)
                                           == np.sign(float(attrs["gender"])))
                matched = True
            else:
                fp += 1
        if not matched:
            fn += 1
    dt = time.time() - t0

    print(f"scenes: {args.n}  recall: {tp}/{tp + fn} = {tp / max(tp+fn,1):.2f}"
          f"  false positives: {fp} ({fp / args.n:.2f}/image)")
    if eye_errors:
        print(f"eye error (rel): mean {np.mean(eye_errors):.4f} "
              f"max {np.max(eye_errors):.4f}")
    if arg_total:
        print(f"age MAE: {np.mean(age_errors):.1f}y | race acc: "
              f"{race_hits}/{arg_total} | gender acc: "
              f"{gender_hits}/{arg_total}")
    print(f"({dt / args.n:.2f}s/image incl. host loop)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
