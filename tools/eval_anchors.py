"""TP/FP/FN of full production detection on the TRAINING-anchor photos.

The training-side real-photo half of every artifact A/B (the other half
is tools/eval_synth.py's held-out renderer panel): run the production
`FaceDetector.detect` on the 3 annotated anchor photos
(data/train_faces_gt.txt) and report aggregate + per-photo TP/FP/FN and
eye error. TNS-Group.jpg is EVAL-ONLY and must never be passed here.

With ``--attrs data/anchor_attrs.txt`` the run also scores the
age/race/gender heads on the matched (TP) faces against real-photo
attribute truth -- for the two reference sample photos the expected
values are the REFERENCE pipeline's own printed outputs
(sample_analyses/*.png overlays), i.e. direct attribute parity; the
heads never train on these photos or labels (see the data file header).

Usage:
    python tools/eval_anchors.py [--model SavedNetworksTPU]
        [--anchors data/train_faces_gt.txt] [--smallest_face 0.1]
        [--attrs data/anchor_attrs.txt]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--anchors", default="data/train_faces_gt.txt")
    ap.add_argument("--smallest_face", type=float, default=0.1)
    ap.add_argument("--json_out", default="")
    ap.add_argument("--attrs", default="",
                    help="attribute truth file (basename age race gender); "
                         "scores age/race/gender heads on matched faces")
    ap.add_argument("--eye_iters", type=int, default=1,
                    help="eye-localization refinement passes")
    ap.add_argument("--arg_eyes", default="pass1",
                    choices=["pass1", "refined"],
                    help="eye estimate consumed by the attribute heads "
                         "(refined needs --eye_iters>1)")
    ap.add_argument("--eye_report", default="refined",
                    choices=["refined", "pass1"],
                    help="which eye pass the detections report when "
                         "eye_iters>1")
    ap.add_argument("--matmul_dtype", default="",
                    choices=["", "f32", "bf16"],
                    help="network GEMM operand dtype; default '' = the "
                         "production DetectorConfig default")
    ap.add_argument("--wire_format", default="", choices=["", "f32", "u16"],
                    help="fused result-block wire format; default '' = the "
                         "production DetectorConfig default")
    args = ap.parse_args(argv)

    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector
    from pyfaceanalysis_tpu.engine.evaluation import GroundTruthEvaluator
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates

    from pyfaceanalysis_tpu.engine.nms import relative_eye_error_np

    attr_truth = {}
    if args.attrs:
        with open(args.attrs) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                name, age, race, gender = line.split()
                attr_truth[name] = (float(age), race, gender)

    model = DetectionModel.load(args.model)
    det = FaceDetector(model, DetectorConfig(
        smallest_face=args.smallest_face, eye_iters=args.eye_iters,
        arg_eyes=args.arg_eyes, eye_report=args.eye_report,
        **({"matmul_dtype": args.matmul_dtype}
           if args.matmul_dtype else {}),
        **({"wire_format": args.wire_format}
           if args.wire_format else {})))
    filenames, _ = load_true_coordinates("", args.anchors)
    per_photo = []
    attr_rows = []
    tot = dict(tp=0, fp=0, fn=0)
    for fn in sorted(set(filenames)):
        ev = GroundTruthEvaluator.from_files(args.anchors)
        image, factor = load_image(fn, 1000)
        dets = det.detect(image, estimate_attributes=bool(attr_truth))
        ev.record(fn, dets, prescale_factor=factor)
        row = dict(photo=fn.rsplit("/", 1)[-1], tp=ev.true_positives,
                   fp=ev.false_positives, fn=ev.false_negatives,
                   eye_err=(round(float(np.mean(ev.eye_errors)), 4)
                            if ev.eye_errors else None))
        per_photo.append(row)
        for k in tot:
            tot[k] += row[k]
        print(f"{row['photo']}: {row['tp']} TP / {row['fp']} FP / "
              f"{row['fn']} FN (eye err {row['eye_err']})", flush=True)
        if row["photo"] in attr_truth:
            # score attribute heads on the detection matched to each GT face
            t_age, t_race, t_gender = attr_truth[row["photo"]]
            gt_rows = ev.truth[row["photo"]] * factor
            for g in gt_rows:
                best, best_err = None, ev.acceptance
                for d in dets:
                    eyes = np.array([*d.eye_left, *d.eye_right])
                    e = relative_eye_error_np(eyes, g[0:4])
                    if e < best_err:
                        best, best_err = d, e
                if best is None or best.age is None:
                    continue
                # grace_hopper (78y) sits past the head's 57.8y label
                # ceiling: saturation >= 50y counts as correct.
                age_ok = (best.age >= 50.0 if t_age > 57.8 else
                          abs(best.age - t_age) <= 10.0)
                arow = dict(photo=row["photo"],
                            age=round(float(best.age), 1), age_true=t_age,
                            age_ok=bool(age_ok),
                            race=best.race, race_ok=best.race == t_race,
                            gender=best.gender,
                            gender_ok=best.gender == t_gender)
                attr_rows.append(arow)
                print(f"  attrs: age {arow['age']} (true {t_age}, "
                      f"{'ok' if age_ok else 'MISS'}), "
                      f"race {arow['race']} "
                      f"({'ok' if arow['race_ok'] else 'MISS'}), "
                      f"gender {arow['gender']} "
                      f"({'ok' if arow['gender_ok'] else 'MISS'})",
                      flush=True)
    print(f"TOTAL: {tot['tp']} TP / {tot['fp']} FP / {tot['fn']} FN")
    if attr_rows:
        n = len(attr_rows)
        print(f"ATTRS on {n} matched real faces: "
              f"age {sum(r['age_ok'] for r in attr_rows)}/{n}, "
              f"race {sum(r['race_ok'] for r in attr_rows)}/{n}, "
              f"gender {sum(r['gender_ok'] for r in attr_rows)}/{n}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(dict(model=args.model, total=tot, photos=per_photo,
                           attrs=attr_rows), f, indent=1)
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
