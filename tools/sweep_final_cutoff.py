"""Sweep the final Disc cutoff AND the eye "too far" gate on a real photo.

The last two gates before NMS are (a) the final Disc cutoff (serial 9,
user-overridable in the reference, FaceDetectUpdated.py:434-438) and
(b) the eye-localization rejection |reg| >= tolerance_xy_eye
(face_analysis.py:1073).  Both were calibrated on synthetic data; this
tool runs the cascade + eye nets ONCE with permissive gates, keeps the
pre-NMS rows with their Disc confidences and eye-regression magnitudes,
and evaluates every (cutoff, tolerance) pair by post-filtering + NMS on
host -- a full 2-D operating-point sweep for the cost of one compile.

Usage:
    python tools/sweep_final_cutoff.py [--gt data/tns_group_gt.txt]
        [--image /root/reference/sample_images/TNS-Group.jpg]
        [--cutoffs 0.15,0.2,...] [--eye_tols 6,9,12,100]
        [--smallest_face 0.1]
"""

from __future__ import annotations

import argparse

import numpy as np


def eval_rows(rows, truth_rows, acceptance=0.25):
    """(TP, FP, FN) with the final-eval matching rule (rel eye err < 0.25)."""
    from pyfaceanalysis_tpu.engine.nms import relative_eye_error_np
    matched = np.zeros(len(truth_rows), bool)
    tp = fp = 0
    for r in rows:
        eyes = r[5:9]
        errs = np.array([relative_eye_error_np(eyes, t[0:4])
                         for t in truth_rows])
        j = int(np.argmin(errs))
        if errs[j] < acceptance:
            if not matched[j]:
                tp += 1
                matched[j] = True
        else:
            fp += 1
    return tp, fp, int((~matched).sum())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", default="data/tns_group_gt.txt")
    ap.add_argument("--image",
                    default="/root/reference/sample_images/TNS-Group.jpg")
    ap.add_argument("--smallest_face", type=float, default=0.1)
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--cutoffs",
                    default="0.10,0.15,0.20,0.25,0.30,0.35,0.40,0.50,0.70,0.95")
    ap.add_argument("--eye_tols", default="6,9,12,16,1000")
    args = ap.parse_args(argv)

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

    model = DetectionModel.load(args.model)
    cfg = DetectorConfig(smallest_face=args.smallest_face,
                         last_cut_off_face=0.95)
    det = FaceDetector(model, cfg)
    cfg = det.config                  # with manifest-resolved contrast/pang
    image, factor = load_image(args.image, cfg.prescale_size)
    _, coords = load_true_coordinates("", args.gt)
    truth = coords * factor

    # One cascade run with the permissive final cutoff.
    device_image = det._to_canvas(image)
    geom = model.spec.face_geom
    state, n_real, pyr = cascade_mod.make_grid_state(
        image.shape[1], image.shape[0], geom, cfg)
    pyramid = crops = scales_arr = None
    if pyr is not None and cfg.interpolation_formats[
            model.plan[0].serial] == "nearest":
        from pyfaceanalysis_tpu.ops.pyramid import build_pyramid
        pyramid = build_pyramid(device_image, pyr.scales, pyr.level_hw)
        crops = pyr.crops
        scales_arr = jnp.asarray(pyr.scales, jnp.float32)
    out, _ = cascade_mod.run_cascade(
        model.plan, model.det_specs, geom, cfg,
        (geom.subimage_height, geom.subimage_width),
        device_image, model.det_params, model.det_clfs, state,
        pyramid=pyramid, crops=crops, pyr_scales=scales_arr,
        collect_trace=True)
    mask = np.asarray(out.mask)
    boxes = np.asarray(out.boxes)[mask]
    angles = np.asarray(out.angles)[mask]
    confs = np.asarray(out.conf)[mask]
    print(f"{n_real} windows, {mask.sum()} survivors at permissive cutoff")
    if not len(boxes):
        print("nothing survives even at 0.95 -- nothing to sweep")
        return

    # One eye pass over ALL survivors; keep the regression magnitudes.
    n = len(boxes)
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
    eye_net = model.nets["net_eye"]
    eg = model.spec.eye_geom
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
    print(f"{len(rows)} candidate rows "
          f"(eye |reg| quartiles: {np.percentile(face_reg, [25,50,75,100])})")

    print(f"\n{'eye_tol':>7s} {'cutoff':>7s} {'pre-NMS':>8s} {'finals':>7s} "
          f"{'TP':>3s} {'FP':>3s} {'FN':>3s}")
    for t in [float(v) for v in args.eye_tols.split(",")]:
        for c in [float(v) for v in args.cutoffs.split(",")]:
            keep = rows[(rows[:, 9] < c) & (face_reg < t)]
            purged = nms_mod.purge_detections(keep, cfg.purge_threshold)
            tp, fp, fn = eval_rows(purged, truth)
            print(f"{t:7.1f} {c:7.2f} {len(keep):8d} {len(purged):7d} "
                  f"{tp:3d} {fp:3d} {fn:3d}")


if __name__ == "__main__":
    main()
