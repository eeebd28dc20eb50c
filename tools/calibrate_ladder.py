"""CLI over pyfaceanalysis_tpu.training.calibration (ladder + eye gate).

The calibration core moved into the package in round 4 so ``pfa-train``
runs it automatically after every retrain (forgetting the manual step
silently regressed quality twice in round 2 -- docs/ROUND2_NOTES.md).
This wrapper keeps the standalone workflow:

Usage:
    python tools/calibrate_ladder.py [--model SavedNetworksTPU]
        [--scenes 40] [--seed 1234] [--q 0.95] [--margin 1.1]
        [--anchors data/train_faces_gt.txt] [--write]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--canvas", type=int, default=320)
    ap.add_argument("--angle_max", type=float, default=15.0)
    ap.add_argument("--q", type=float, default=0.95)
    ap.add_argument("--margin", type=float, default=1.10)
    ap.add_argument("--anchors", default="data/train_faces_gt.txt")
    ap.add_argument("--smallest_face", type=float, default=0.15)
    ap.add_argument("--bg_budget", type=float, default=0.0,
                    help="cap the cumulative pre-NMS background survival "
                         "at this many windows/image by interpolating the "
                         "ladder back toward the reference constants "
                         "(0 = off)")
    ap.add_argument("--anchor_small_ie", default="",
                    help="comma-separated target inter-eye sizes (px); "
                         "adds downscaled real-anchor replicas to the "
                         "spare pool so the ladder also spares real faces "
                         "at group-photo scan sizes (campaign-7 L0)")
    ap.add_argument("--bg_protect", default="",
                    help="comma-separated ladder serial indices exempt "
                         "from the bg cap (they keep the face-calibrated "
                         "value; the budget is reclaimed from the rest)")
    ap.add_argument("--write", action="store_true",
                    help="write the calibrated ladder into the manifest")
    args = ap.parse_args(argv)
    small_ie = tuple(float(x) for x in args.anchor_small_ie.split(",")
                     if x.strip())
    protect = tuple(int(x) for x in args.bg_protect.split(",")
                    if x.strip())

    from pyfaceanalysis_tpu.training import calibration

    result = calibration.calibrate_model(
        args.model, scenes=args.scenes, seed=args.seed, canvas=args.canvas,
        angle_max=args.angle_max, q=args.q, margin=args.margin,
        anchors=args.anchors, smallest_face=args.smallest_face,
        bg_budget=args.bg_budget, bg_protect=protect,
        anchor_small_ie=small_ie)
    if args.write:
        calibration.write_calibration(args.model, result)
    else:
        print("\n(dry run -- pass --write to update the manifest)")


if __name__ == "__main__":
    main()
