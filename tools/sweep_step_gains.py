"""Sweep the refinement step gains (pos/scale/pang) on a real photo.

On real photographs the pose regressors systematically overshoot (the
canonical photo's trajectories show ~1.6x steps and occasional sign
flips); DetectorConfig.pos_gain / scale_gain / pang_gain damp the steps
so the 3-iteration closed loop converges geometrically instead of
oscillating past the drift gates.  For each gain combo this tool runs
the cascade ONCE with a permissive final cutoff, runs the eye pass, and
evaluates (cutoff x eye_tol) operating points post-hoc on host -- the
cheapest full A/B the jitted cascade allows (each combo is one compile;
the persistent XLA cache makes reruns free).

Usage:
    python tools/sweep_step_gains.py [--gains '1:1,0.7:1,0.7:0.7,0.5:0.7']
        [--gt data/tns_group_gt.txt] [--cutoffs 0.2,0.35] [--eye_tols 9,12]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", default="data/tns_group_gt.txt")
    ap.add_argument("--image",
                    default="/root/reference/sample_images/TNS-Group.jpg")
    ap.add_argument("--smallest_face", type=float, default=0.1)
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--gains", default="1:1,0.8:1,0.65:1,0.5:1,0.65:0.65,"
                                       "0.5:0.65,0.8:0.65")
    ap.add_argument("--pang_gain", type=float, default=-1.0)
    ap.add_argument("--cutoffs", default="0.15,0.22,0.30,0.40")
    ap.add_argument("--eye_tols", default="9,12")
    args = ap.parse_args(argv)

    import dataclasses

    import jax.numpy as jnp

    from pyfaceanalysis_tpu import geometry
    from pyfaceanalysis_tpu.config import (DESIRED_SAMPLING, EYE_SAMPLING,
                                           DetectorConfig)
    from pyfaceanalysis_tpu.engine import cascade as cascade_mod
    from pyfaceanalysis_tpu.engine import eyes as eyes_mod
    from pyfaceanalysis_tpu.engine import nms as nms_mod
    from pyfaceanalysis_tpu.engine.detector import DetectionModel, FaceDetector
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates
    from sweep_final_cutoff import eval_rows

    model = DetectionModel.load(args.model)
    base = DetectorConfig(smallest_face=args.smallest_face,
                          last_cut_off_face=0.95,
                          pang_gain=args.pang_gain)
    det = FaceDetector(model, base)
    base = det.config                 # manifest-resolved contrast/pang/ladder
    # keep the final rung permissive for the post-hoc sweep
    ladder = list(base.resolved_cut_offs())
    ladder[9] = 0.95
    base = dataclasses.replace(base, cut_offs_face=tuple(ladder),
                               last_cut_off_face=0.95)
    image, factor = load_image(args.image, base.prescale_size)
    _, coords = load_true_coordinates("", args.gt)
    truth = coords * factor

    device_image = det._to_canvas(image)
    geom = model.spec.face_geom
    eye_net = model.nets["net_eye"]
    eg = model.spec.eye_geom
    cutoffs = [float(v) for v in args.cutoffs.split(",")]
    eye_tols = [float(v) for v in args.eye_tols.split(",")]

    print(f"pang_gain={base.resolved_pang_gain():g}  "
          f"ladder={[round(v, 3) for v in ladder]}")
    header = (f"{'pos':>5s} {'scale':>5s} {'surv':>5s}" +
              "".join(f"  c{c:g}/t{t:g}" for t in eye_tols for c in cutoffs))
    print(header)

    for combo in args.gains.split(","):
        pg, sg = (float(v) for v in combo.split(":"))
        cfg = dataclasses.replace(base, pos_gain=pg, scale_gain=sg)
        state, n_real, pyr = cascade_mod.make_grid_state(
            image.shape[1], image.shape[0], geom, cfg)
        pyramid = crops = scales_arr = None
        if pyr is not None and cfg.interpolation_formats[
                model.plan[0].serial] == "nearest":
            from pyfaceanalysis_tpu.ops.pyramid import build_pyramid
            pyramid = build_pyramid(device_image, pyr.scales, pyr.level_hw)
            crops = pyr.crops
            scales_arr = jnp.asarray(pyr.scales, jnp.float32)
        out = cascade_mod.run_cascade(
            model.plan, model.det_specs, geom, cfg,
            (geom.subimage_height, geom.subimage_width),
            device_image, model.det_params, model.det_clfs, state,
            pyramid=pyramid, crops=crops, pyr_scales=scales_arr)
        mask = np.asarray(out.mask)
        boxes = np.asarray(out.boxes)[mask]
        angles = np.asarray(out.angles)[mask]
        confs = np.asarray(out.conf)[mask]
        n = len(boxes)
        if n == 0:
            print(f"{pg:5.2f} {sg:5.2f} {0:5d}  (no survivors)")
            continue
        _, l_b, r_b = geometry.compute_approximate_eye_boxes_coordinates(
            jnp.asarray(boxes), jnp.asarray(angles),
            face_sampling=DESIRED_SAMPLING, eye_sampling=EYE_SAMPLING)
        eye_boxes = np.concatenate([np.asarray(l_b), np.asarray(r_b)])
        both_angles = np.concatenate([angles, angles])
        bucket = max(8, 1 << (2 * n - 1).bit_length())
        pad = bucket - 2 * n
        eye_boxes = np.pad(eye_boxes.astype(np.float32), ((0, pad), (0, 0)),
                           constant_values=1.0)
        both_angles = np.pad(both_angles.astype(np.float32), (0, pad))
        new_boxes, max_reg = eyes_mod.localize_eyes(
            eye_net.specs, model.clf_input_dim("EyeLX"),
            model.clf_input_dim("EyeLY"),
            (eg.subimage_height, eg.subimage_width),
            device_image, tuple(eye_net.params),
            model.classifier("EyeLX"), model.classifier("EyeLY"),
            jnp.asarray(eye_boxes), jnp.asarray(both_angles))
        new_boxes = np.asarray(new_boxes)
        max_reg = np.asarray(max_reg)
        l_new, r_new = new_boxes[:n], new_boxes[n:2 * n]
        face_reg = np.maximum(max_reg[:n], max_reg[n:2 * n])
        l_c = (l_new[:, 0:2] + l_new[:, 2:4]) / 2.0
        r_c = (r_new[:, 0:2] + r_new[:, 2:4]) / 2.0
        rows = np.concatenate([boxes, angles[:, None], l_c, r_c,
                               confs[:, None]], axis=1)
        cells = []
        for t in eye_tols:
            for c in cutoffs:
                keep = rows[(rows[:, 9] < c) & (face_reg < t)]
                purged = nms_mod.purge_detections(keep, cfg.purge_threshold)
                tp, fp, fn = eval_rows(purged, truth)
                cells.append(f"{tp}/{fp}/{fn}")
        print(f"{pg:5.2f} {sg:5.2f} {n:5d}  " +
              "  ".join(f"{s:>9s}" for s in cells))


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
