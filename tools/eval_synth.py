"""Synthetic-scene detection quality harness.

Renders scenes with known face geometry (training.synth renderer, held-out
seeds), runs the full detector, and reports recall / false positives / eye
error using the reference acceptance criterion (relative eye error < 0.25 of
inter-eye distance, FaceDetectUpdated.py:887).

Round-3 upgrades (VERDICT r2 next-step #7 -- every round-2 A/B rode
single-photo/seed noise):
- scenes detect through the FUSED batch path (chunks of 16) so a 200-scene
  panel costs minutes, not an hour;
- per-metric BOOTSTRAP confidence intervals (resampling scenes), printed
  and exported; A/B decisions must cite the CI, not the point estimate;
- ``--json FILE`` writes the full report machine-readably.

Usage: python tools/eval_synth.py [--pipeline_dir DIR] [--n 200]
       [--seed 999] [--json report.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _bootstrap_ci(per_scene: np.ndarray, stat, n_boot: int = 2000,
                  seed: int = 0, alpha: float = 0.05):
    """Percentile bootstrap CI of ``stat`` (a function of a scene
    subsample matrix) over scenes."""
    rng = np.random.RandomState(seed)
    n = len(per_scene)
    vals = np.empty(n_boot)
    for b in range(n_boot):
        idx = rng.randint(0, n, n)
        vals[b] = stat(per_scene[idx])
    lo, hi = np.percentile(vals, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return float(lo), float(hi)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pipeline_dir", default="SavedNetworksTPU")
    p.add_argument("--n", type=int, default=200)
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
    p.add_argument("--eye_iters", type=int, default=1,
                   help="eye-localization refinement passes (config.eye_iters)")
    p.add_argument("--matmul_dtype", default="", choices=["", "f32", "bf16"],
                   help="network GEMM operand dtype; default '' = the "
                        "production DetectorConfig default")
    p.add_argument("--arg_tta", type=int, default=1,
                   help="crops averaged per face by the attribute heads")
    p.add_argument("--arg_eyes", default="pass1",
                   choices=["pass1", "refined"],
                   help="eye estimate consumed by the attribute heads "
                        "(refined needs --eye_iters>1)")
    p.add_argument("--eye_report", default="refined",
                   choices=["refined", "pass1"],
                   help="which eye pass the detections report when "
                        "eye_iters>1")
    p.add_argument("--chunk", type=int, default=16,
                   help="images per fused detect_batch dispatch")
    p.add_argument("--wire_format", default="", choices=["", "f32", "u16"],
                   help="fused result-block wire format; default '' = the "
                        "production DetectorConfig default")
    p.add_argument("--json", default=None,
                   help="write the machine-readable report here")
    args = p.parse_args(argv)

    import jax

    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector
    from pyfaceanalysis_tpu.engine.nms import relative_eye_error_np
    from pyfaceanalysis_tpu.training import synth

    model = DetectionModel.load(args.pipeline_dir)
    cfg = DetectorConfig(smallest_face=args.smallest_face,
                         tolerance_xy_eye=args.eye_tol,
                         pos_gain=args.pos_gain, arg_tta=args.arg_tta,
                         eye_iters=args.eye_iters, arg_eyes=args.arg_eyes, eye_report=args.eye_report,
                         **({"matmul_dtype": args.matmul_dtype}
                            if args.matmul_dtype else {}),
                         **({"wire_format": args.wire_format}
                            if args.wire_format else {}))
    det = FaceDetector(model, cfg)

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    scenes, truths = [], []
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
        scenes.append(np.asarray(img))
        truths.append(attrs)

    # Per-scene result rows: [tp, fp, eye_err, age_err, race_hit,
    # gender_hit, has_arg]
    rows = np.zeros((args.n, 7), np.float64)
    rows[:, 2] = np.nan
    rows[:, 3] = np.nan
    for k in range(0, args.n, args.chunk):
        chunk = scenes[k: k + args.chunk]
        dets = det.detect_batch(chunk)
        for j, out in enumerate(dets):
            i = k + j
            attrs = truths[i]
            true_eyes = np.concatenate([np.asarray(attrs["eye_l"]),
                                        np.asarray(attrs["eye_r"])])
            matched = False
            for d in out:
                eyes = np.array([*d.eye_left, *d.eye_right])
                err = relative_eye_error_np(eyes, true_eyes)
                if err < 0.25:
                    if not matched:
                        rows[i, 0] = 1
                        rows[i, 2] = err
                        if d.age is not None:
                            rows[i, 6] = 1
                            rows[i, 3] = abs(d.age - float(attrs["age"]))
                            rows[i, 4] = int(np.sign(d.race_value)
                                             == np.sign(float(attrs["race"])))
                            rows[i, 5] = int(
                                np.sign(d.gender_value)
                                == np.sign(float(attrs["gender"])))
                    else:
                        rows[i, 1] += 1     # duplicate of a matched face
                    matched = True
                else:
                    rows[i, 1] += 1
    dt = time.time() - t0

    def safe_mean(v):
        v = v[~np.isnan(v)]
        return float(v.mean()) if len(v) else float("nan")

    recall = rows[:, 0].mean()
    fp_rate = rows[:, 1].mean()
    r_lo, r_hi = _bootstrap_ci(rows, lambda r: r[:, 0].mean())
    f_lo, f_hi = _bootstrap_ci(rows, lambda r: r[:, 1].mean())
    report = {
        "pipeline_dir": args.pipeline_dir,
        "scenes": args.n, "seed": args.seed, "angle_max": args.angle_max,
        "recall": round(float(recall), 4),
        "recall_ci95": [round(r_lo, 4), round(r_hi, 4)],
        "fp_per_image": round(float(fp_rate), 4),
        "fp_ci95": [round(f_lo, 4), round(f_hi, 4)],
        "seconds_per_image": round(dt / args.n, 3),
    }
    eye = rows[:, 2]
    if np.isfinite(eye).any():
        e_lo, e_hi = _bootstrap_ci(rows, lambda r: safe_mean(r[:, 2]))
        report.update(eye_err_mean=round(safe_mean(eye), 4),
                      eye_err_ci95=[round(e_lo, 4), round(e_hi, 4)],
                      eye_err_max=round(float(np.nanmax(eye)), 4))
    if rows[:, 6].sum() > 0:
        arg = rows[rows[:, 6] > 0]
        a_lo, a_hi = _bootstrap_ci(arg, lambda r: safe_mean(r[:, 3]))
        g_lo, g_hi = _bootstrap_ci(arg, lambda r: r[:, 5].mean())
        report.update(
            age_mae=round(safe_mean(arg[:, 3]), 2),
            age_mae_ci95=[round(a_lo, 2), round(a_hi, 2)],
            race_acc=round(float(arg[:, 4].mean()), 3),
            gender_acc=round(float(arg[:, 5].mean()), 3),
            gender_acc_ci95=[round(g_lo, 3), round(g_hi, 3)],
            arg_faces=int(len(arg)))

    print(f"scenes: {args.n}  recall: {int(rows[:, 0].sum())}/{args.n} = "
          f"{recall:.3f} [CI95 {r_lo:.3f}, {r_hi:.3f}]  "
          f"false positives: {fp_rate:.3f}/image [CI95 {f_lo:.3f}, {f_hi:.3f}]")
    if "eye_err_mean" in report:
        print(f"eye error (rel): mean {report['eye_err_mean']:.4f} "
              f"[CI95 {report['eye_err_ci95'][0]:.4f}, "
              f"{report['eye_err_ci95'][1]:.4f}] "
              f"max {report['eye_err_max']:.4f}")
    if "age_mae" in report:
        print(f"age MAE: {report['age_mae']:.1f}y "
              f"[CI95 {report['age_mae_ci95'][0]:.1f}, "
              f"{report['age_mae_ci95'][1]:.1f}] | race acc: "
              f"{report['race_acc']:.3f} | gender acc: "
              f"{report['gender_acc']:.3f} "
              f"[CI95 {report['gender_acc_ci95'][0]:.3f}, "
              f"{report['gender_acc_ci95'][1]:.3f}] "
              f"(n={report['arg_faces']})")
    print(f"({dt / args.n:.2f}s/image incl. host loop)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
