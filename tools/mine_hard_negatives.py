"""Mine real-photo false positives as Disc hard negatives (bootstrapping).

The production model's FP rate on real photographs (anchors: ~7 FP/photo)
is an order of magnitude above the synthetic panel (~0.7 FP/img): the
random face-free crops in ``RealFaceSource.sample_backgrounds`` do not
cover the specific textures the Disc nets actually mistake for faces. The
classic fix is hard-negative MINING: run the production detector on the
TRAINING-side photos, collect the detections that match no annotated face,
and feed those exact boxes back as dedicated background-class negatives
(``pfa-train --mined_negatives``).

Safety margins (BOTH required):
- relative eye error vs every annotated face >= ``--min_margin`` (default
  0.35, above the 0.25 TP acceptance) -- a slightly off-center detection
  of a REAL face must never be taught as background;
- intersection-over-min-area vs every annotated FACE BOX <=
  ``--max_face_iom`` (default 0.3) -- eye error does not catch "the face
  at the wrong scale": a 2x-scale window centered on a face has huge
  relative eye error yet is exactly the cascade's intermediate
  convergence state for the TRUE face, and teaching it as background
  kills the face's detection basin (measured: the first ship candidate
  lost 2 of 3 anchor faces to such boxes).

``--relax`` multiplies the calibrated final Disc cutoff to ALSO harvest
near-threshold negatives (boxes that almost fired); these are the ones a
small calibration shift would turn into FPs.

TNS-Group.jpg is EVAL-ONLY and must never be passed here. For the
leave-one-photo-out transfer check use ``--exclude BASENAME``.

Usage:
    python tools/mine_hard_negatives.py [--model SavedNetworksTPU]
        [--anchors data/train_faces_gt.txt] [--out data/hard_negatives.txt]
        [--relax 2.0] [--min_margin 0.35] [--exclude basename.jpg]
        [--smallest_face 0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--anchors", default="data/train_faces_gt.txt")
    ap.add_argument("--out", default="data/hard_negatives.txt")
    ap.add_argument("--relax", type=float, default=2.0,
                    help="multiply the calibrated final cutoff (>1 keeps "
                         "near-threshold negatives too)")
    ap.add_argument("--min_margin", type=float, default=0.35,
                    help="min relative eye error vs every GT face for a "
                         "detection to count as a negative")
    ap.add_argument("--max_face_iom", type=float, default=0.3,
                    help="max intersection-over-min-area vs any GT face "
                         "box (rejects face-at-wrong-scale boxes)")
    ap.add_argument("--exclude", default="",
                    help="comma-separated photo basenames to skip "
                         "(leave-one-out protocol)")
    ap.add_argument("--smallest_face", type=float, default=0.1)
    args = ap.parse_args(argv)

    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import (DetectionModel,
                                                    FaceDetector)
    from pyfaceanalysis_tpu.engine.nms import relative_eye_error_np
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates

    excluded = {b for b in args.exclude.split(",") if b}
    model = DetectionModel.load(args.model)
    calib = getattr(model, "calibration", {}) or {}
    base_cut = float(calib.get("last_cut_off_face", 0.05))
    cfg = DetectorConfig(smallest_face=args.smallest_face,
                         last_cut_off_face=min(base_cut * args.relax, 0.999))
    det = FaceDetector(model, cfg)

    filenames, coords = load_true_coordinates("", args.anchors)
    truth = {}
    for fn, c in zip(filenames, coords):
        truth.setdefault(fn, []).append(np.asarray(c, np.float64))

    def iom(b1, b2):
        ix = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
        iy = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
        a1 = max(b1[2] - b1[0], 0.0) * max(b1[3] - b1[1], 0.0)
        a2 = max(b2[2] - b2[0], 0.0) * max(b2[3] - b2[1], 0.0)
        return ix * iy / max(min(a1, a2), 1e-9)

    lines = []
    for fn in sorted(truth):
        if os.path.basename(fn) in excluded:
            print(f"{os.path.basename(fn)}: EXCLUDED")
            continue
        image, factor = load_image(fn, 1000)
        dets = det.detect(image, estimate_attributes=False)
        rows = np.stack(truth[fn]) * factor     # GT eyes, detection frame
        mined = 0
        for d in dets:
            eyes = np.array([*d.eye_left, *d.eye_right])
            err = min(relative_eye_error_np(eyes, r[0:4]) for r in rows)
            if err < args.min_margin:
                continue
            if max(iom(d.box, r[10:14]) for r in rows) > args.max_face_iom:
                continue    # face at the wrong scale -- never a negative
            # full-resolution photo coordinates (training.real stacks the
            # un-prescaled photos)
            x0, y0, x1, y1 = (v / factor for v in d.box)
            lines.append(f"{fn} {x0:.1f} {y0:.1f} {x1:.1f} {y1:.1f} "
                         f"{d.angle:.2f}")
            mined += 1
        print(f"{os.path.basename(fn)}: {len(dets)} detections at "
              f"cutoff {cfg.last_cut_off_face:.3f} -> {mined} negatives")

    with open(args.out, "w") as f:
        f.write("# mined hard negatives: filename x0 y0 x1 y1 angle "
                "(full-res coords)\n")
        f.write(f"# model={args.model} relax={args.relax} "
                f"min_margin={args.min_margin} exclude={args.exclude}\n")
        f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"wrote {len(lines)} boxes -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
