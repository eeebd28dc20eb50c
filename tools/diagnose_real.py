"""Per-stage cascade diagnosis on a real annotated photo.

For every ground-truth face: find the iter-0 grid windows "responsible" for
it (reference responsible-box criterion: grid center within the acceptance
radii and the face scale within the stage's scale envelope,
FaceDetectUpdated.py:806-842), then walk the per-stage cascade trace and
report where those windows die, with the regression outputs at the lethal
stage. This is the tool that localizes the synthetic-to-real gap.

Usage:
    python tools/diagnose_real.py [--gt data/tns_group_gt.txt]
        [--image /root/reference/sample_images/TNS-Group.jpg]
        [--smallest_face 0.1] [--model SavedNetworksTPU]
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", default="data/tns_group_gt.txt")
    ap.add_argument("--image",
                    default="/root/reference/sample_images/TNS-Group.jpg")
    ap.add_argument("--smallest_face", type=float, default=0.1)
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--pang_gain", type=float, default=-1.0,
                    help="override the PAng step gain (-1 = model default)")
    ap.add_argument("--pos_gain", type=float, default=-1.0,
                    help="override the PosX/PosY step gain")
    ap.add_argument("--scale_gain", type=float, default=-1.0,
                    help="override the Scale step gain (log-space)")
    ap.add_argument("--cutoffs", default="",
                    help="override cut_offs_face: comma list of "
                         "'serial:value' pairs, e.g. '5:0.8,7:0.65,9:0.5'")
    args = ap.parse_args(argv)

    from pyfaceanalysis_tpu.config import DESIRED_SAMPLING, DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates

    from pyfaceanalysis_tpu.config import REFERENCE_CUT_OFFS_FACE

    model = DetectionModel.load(args.model)
    calib = getattr(model, "calibration", {}) or {}
    base = list(calib.get("cut_offs_face", REFERENCE_CUT_OFFS_FACE))
    if "last_cut_off_face" in calib:
        base[9] = float(calib["last_cut_off_face"])
    kw = {}
    if args.cutoffs:
        ladder = list(base)
        for pair in args.cutoffs.split(","):
            s, v = pair.split(":")
            ladder[int(s)] = float(v)
        kw["cut_offs_face"] = tuple(ladder)
        kw["last_cut_off_face"] = ladder[9]
    cfg = DetectorConfig(smallest_face=args.smallest_face,
                         pang_gain=args.pang_gain, pos_gain=args.pos_gain,
                         scale_gain=args.scale_gain, **kw)
    det = FaceDetector(model, cfg)
    cfg = det.config      # manifest-resolved (ladder, contrast, pang gain)
    image, factor = load_image(args.image, cfg.prescale_size)
    print(f"image {image.shape}, prescale factor {factor:.4f}")

    filenames, coords = load_true_coordinates("", args.gt)
    coords = coords * factor          # into the detection frame
    geom = model.spec.face_geom

    dets = det.detect(image, estimate_attributes=False, collect_trace=True)
    trace = det.last_trace            # [(boxes, angles, mask, conf)] / stage
    plan = model.plan
    cut_offs = cfg.resolved_cut_offs()

    # iter-0 grid (same construction the detector used)
    from pyfaceanalysis_tpu.engine import cascade as cascade_mod
    state, n_real, _ = cascade_mod.make_grid_state(
        image.shape[1], image.shape[0], geom, cfg)
    g_boxes = np.asarray(state.boxes)[:n_real]
    g_cx = (g_boxes[:, 0] + g_boxes[:, 2]) / 2.0
    g_cy = (g_boxes[:, 1] + g_boxes[:, 3]) / 2.0
    g_side = np.sqrt((g_boxes[:, 2] - g_boxes[:, 0]) ** 2 +
                     (g_boxes[:, 3] - g_boxes[:, 1]) ** 2)
    max_dx = np.asarray(state.max_dx)[:n_real]
    max_dy = np.asarray(state.max_dy)[:n_real]

    print(f"{n_real} grid windows, {len(coords)} GT faces, "
          f"{len(dets)} final detections")

    stage_names = [f"{p.kind}{p.serial}" for p in plan]
    for fi, row in enumerate(coords):
        fcx, fcy = row[8], row[9]
        fbox = row[10:14]
        f_side = np.sqrt((fbox[2] - fbox[0]) ** 2 + (fbox[3] - fbox[1]) ** 2)
        # responsible windows: center within radii, scale within envelope
        scale_ratio = f_side / g_side
        resp = ((np.abs(g_cx - fcx) <= max_dx) &
                (np.abs(g_cy - fcy) <= max_dy) &
                (scale_ratio >= geom.mins / DESIRED_SAMPLING) &
                (scale_ratio <= geom.maxs / DESIRED_SAMPLING))
        ridx = np.where(resp)[0]
        print(f"\nGT face {fi}: center=({fcx:.0f},{fcy:.0f}) "
              f"side={f_side / np.sqrt(2):.0f}px  "
              f"responsible windows: {len(ridx)}")
        if len(ridx) == 0:
            print("  !! no responsible window (grid does not cover this "
                  "face scale/position)")
            continue
        # Pick the longest-surviving responsible window and print ITS
        # trajectory (box error vs GT in regression px): shows whether
        # refinement converges or diverges before a gate kills it.
        masks = [np.asarray(t[2])[ridx] for t in trace]
        survival = np.sum(np.stack(masks), axis=0)
        w = int(np.argmax(survival))
        gi = ridx[w]
        alive_cnt_prev = len(ridx)
        for si, (boxes, angles, mask, conf) in enumerate(trace):
            n_alive = int(masks[si].sum())
            b = np.asarray(boxes)[gi]
            a = float(np.asarray(angles)[gi])
            bcx = (b[0] + b[2]) / 2.0
            bcy = (b[1] + b[3]) / 2.0
            side = abs(b[2] - b[0])
            ex = (fcx - bcx) / max(side, 1e-9) * 128
            ey = (fcy - bcy) / max(side, 1e-9) * 128
            es = f_side / np.sqrt(2) / max(side, 1e-9)
            err = (f" w{gi}: ex={ex:+6.1f} ey={ey:+6.1f} "
                   f"scale={es:.3f} ang={a:+5.1f}")
            note = ""
            if n_alive == 0 and alive_cnt_prev > 0:
                p = plan[si]
                if p.kind == "Disc":
                    c = np.asarray(conf)[ridx]
                    note = (f"  <- ALL DIED (Disc cutoff "
                            f"{cut_offs[p.serial]:.3f}; conf of "
                            f"responsible: min={c.min():.3f} "
                            f"med={np.median(c):.3f})")
                else:
                    note = "  <- ALL DIED"
            if n_alive == 0 and alive_cnt_prev == 0:
                break
            print(f"  after {stage_names[si]:7s}: {n_alive:4d} alive"
                  f"{err}{note}")
            alive_cnt_prev = n_alive
        alive = masks[-1] if trace else np.zeros(len(ridx), bool)
        if alive.any():
            bb = np.asarray(trace[-1][0])[ridx[alive]]
            cc = np.asarray(trace[-1][3])[ridx[alive]]
            print(f"  SURVIVED to the end: {int(alive.sum())} windows, "
                  f"conf min={cc.min():.3f}")

    if dets:
        print("\nFinal detections:")
        for d in dets:
            print(f"  box={tuple(round(v) for v in d.box)} "
                  f"conf={d.confidence:.3f}")


if __name__ == "__main__":
    main()
