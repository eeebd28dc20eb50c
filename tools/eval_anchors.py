"""TP/FP/FN of full production detection on the TRAINING-anchor photos.

The training-side real-photo half of every artifact A/B (the other half
is tools/eval_synth.py's held-out renderer panel): run the production
`FaceDetector.detect` on the 3 annotated anchor photos
(data/train_faces_gt.txt) and report aggregate + per-photo TP/FP/FN and
eye error. TNS-Group.jpg is EVAL-ONLY and must never be passed here.

Usage:
    python tools/eval_anchors.py [--model SavedNetworksTPU]
        [--anchors data/train_faces_gt.txt] [--smallest_face 0.1]
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
    args = ap.parse_args(argv)

    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector
    from pyfaceanalysis_tpu.engine.evaluation import GroundTruthEvaluator
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates

    model = DetectionModel.load(args.model)
    det = FaceDetector(model, DetectorConfig(smallest_face=args.smallest_face))
    filenames, _ = load_true_coordinates("", args.anchors)
    per_photo = []
    tot = dict(tp=0, fp=0, fn=0)
    for fn in sorted(set(filenames)):
        ev = GroundTruthEvaluator.from_files(args.anchors)
        image, factor = load_image(fn, 1000)
        dets = det.detect(image, estimate_attributes=False)
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
    print(f"TOTAL: {tot['tp']} TP / {tot['fp']} FP / {tot['fn']} FN")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(dict(model=args.model, total=tot, photos=per_photo), f,
                      indent=1)
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
