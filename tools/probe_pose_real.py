"""Probe: do the pose networks' features carry signal on REAL faces?

Takes annotated real faces (default: the TNS-Group evaluation annotations
-- diagnostic only, never trained on), samples patches at KNOWN pose
offsets (the exact label-generation math of training.datasets), runs the
pose networks, and reports per-label correlation + bias of the Gaussian
regression outputs.

Reads the cascade's verdict: if correlations are high but biased, the
CLASSIFIER needs recalibration; if near zero, the FEATURES do not transfer
and the renderer/training data need work.

Run: python tools/probe_pose_real.py [--which 0|1] [--n 400]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", default="data/tns_group_gt.txt")
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--which", type=int, default=1,
                    help="0 = iter-0 net (wide ranges), 1 = refinement net")
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from pyfaceanalysis_tpu.config import DESIRED_SAMPLING
    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates
    from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate

    model = DetectionModel.load(args.model)
    calib = model.calibration or {}
    cnorm = bool(calib.get("detection_contrast_normalize", False))
    geom = model.spec.face_geom
    it = str(args.which)
    net = model.nets[f"net_pose{it}"]
    ranges = {"0": (40.0, 20.0, 22.5), "1": (14.0, 13.0, 21.0)}[it]
    dxr, dyr, angr = ranges

    filenames, coords = load_true_coordinates("", args.gt)
    # detection frame = prescaled image
    image, factor = load_image(filenames[0], 1000)
    coords = coords * factor
    device_image = jnp.asarray(image)

    rng = np.random.RandomState(args.seed)
    n = args.n
    rows = coords[rng.randint(0, len(coords), n)]
    F = (np.hypot(rows[:, 2] - rows[:, 0], rows[:, 3] - rows[:, 1])
         / (2 * 0.1752))
    theta = np.degrees(np.arctan2(rows[:, 3] - rows[:, 1],
                                  rows[:, 2] - rows[:, 0]))
    fcx, fcy = rows[:, 8], rows[:, 9]

    dx = rng.uniform(-dxr, dxr, n)
    dy = rng.uniform(-dyr, dyr, n)
    ang = rng.uniform(-angr, angr, n)
    smp = rng.uniform(geom.mins, geom.maxs, n)
    b = smp * F / DESIRED_SAMPLING
    a = theta - ang
    rad = np.radians(a)
    off_x = dx * b / geom.regression_width
    off_y = dy * b / geom.regression_height
    cx = fcx + np.cos(rad) * off_x - np.sin(rad) * off_y
    cy = fcy + np.sin(rad) * off_x + np.cos(rad) * off_y
    boxes = np.stack([cx - (b - 1) / 2, cy - (b - 1) / 2,
                      cx + (b - 1) / 2, cy + (b - 1) / 2], axis=1)

    patches = extract_patches_rotate(
        device_image, jnp.asarray(boxes.astype(np.float32)),
        jnp.asarray(a.astype(np.float32)), (64, 64), method="nearest")
    flat = jnp.reshape(patches, (n, -1))
    if cnorm:
        from pyfaceanalysis_tpu.ops.contrast import (
            contrast_normalize_avg_std,
        )
        flat = contrast_normalize_avg_std(flat * 255.0, 137.5,
                                          0.40 * 255.0) / 255.0
    feats = np.asarray(net.execute(flat))
    # PAng runs off the dedicated angle net when the pipeline ships one.
    anet = model.nets.get(f"net_ang{it}")
    afeats = np.asarray(anet.execute(flat)) if anet is not None else feats

    print(f"net_pose{it} on {len(coords)} real faces, {n} samples "
          f"(contrast_norm={cnorm}, angle_net={anet is not None})")
    truth = {"PosX": dx, "PosY": dy, "PAng": ang, "Scale": smp}
    for kind in ("PosX", "PosY", "PAng", "Scale"):
        clf = model.classifier(f"{kind}{it}")
        f_in = afeats if kind == "PAng" else feats
        out = np.asarray(clf.regression(
            jnp.asarray(f_in[:, : clf.input_dim])))
        t = truth[kind]
        c = np.corrcoef(out, t)[0, 1]
        print(f"  {kind}{it}: corr={c:+.3f}  bias={np.mean(out - t):+7.2f}"
              f"  rmse={np.sqrt(np.mean((out - t) ** 2)):7.2f}"
              f"  out[{out.min():+.1f},{out.max():+.1f}]"
              f"  truth[{t.min():+.1f},{t.max():+.1f}]")


if __name__ == "__main__":
    main()
