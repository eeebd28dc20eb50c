"""Probe: does the Gaussian posterior std predict pose-step error?

The refinement blunders that kill real faces mid-cascade (diagnose_real:
PosY0 +8 -> +20 px, PosX0 -23 -> -53 px) are single saturated-wrong
regression steps. The soft regressor can report its own posterior label
std (``regression(estimate_std=True)``); if std is high exactly when the
step is wrong, an uncertainty-damped step

    step' = step * sigma0^2 / (sigma0^2 + std_n^2),   std_n = std / half_range

suppresses blunders at reference parity for confident estimates. This
probe measures, on synthetic faces AND the real training anchors, at
known offsets:

  - corr(|step error|, std) per head (PosX/PosY/PAng/Scale x iter 0/1),
  - post-step |residual| RMS and P90 for gain=1 (reference) vs damped
    gains at several sigma0.

Run: python tools/probe_step_damping.py [--which 0|1] [--n 400]
"""

from __future__ import annotations

import argparse

import numpy as np


def sample_offsets(rng, n, geom, ranges):
    from pyfaceanalysis_tpu.config import DESIRED_SAMPLING
    dxr, dyr, angr = ranges
    dx = rng.uniform(-dxr, dxr, n)
    dy = rng.uniform(-dyr, dyr, n)
    ang = rng.uniform(-angr, angr, n)
    smp = rng.uniform(geom.mins, geom.maxs, n)
    return dx, dy, ang, smp


def boxes_for(rows, dx, dy, ang, smp, geom, rng):
    """Perturbed patch boxes around GT faces (probe_pose_real math)."""
    from pyfaceanalysis_tpu.config import DESIRED_SAMPLING
    n = len(dx)
    rows = rows[rng.randint(0, len(rows), n)]
    F = (np.hypot(rows[:, 2] - rows[:, 0], rows[:, 3] - rows[:, 1])
         / (2 * 0.1752))
    theta = np.degrees(np.arctan2(rows[:, 3] - rows[:, 1],
                                  rows[:, 2] - rows[:, 0]))
    fcx, fcy = rows[:, 8], rows[:, 9]
    b = smp * F / DESIRED_SAMPLING
    a = theta - ang
    rad = np.radians(a)
    off_x = dx * b / geom.regression_width
    off_y = dy * b / geom.regression_height
    cx = fcx + np.cos(rad) * off_x - np.sin(rad) * off_y
    cy = fcy + np.sin(rad) * off_x + np.cos(rad) * off_y
    boxes = np.stack([cx - (b - 1) / 2, cy - (b - 1) / 2,
                      cx + (b - 1) / 2, cy + (b - 1) / 2], axis=1)
    return boxes.astype(np.float32), a.astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--which", type=int, default=0)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--anchors", default="data/train_faces_gt.txt")
    ap.add_argument("--sigmas", default="0.1,0.2,0.35,0.5")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import (load_true_coordinates,
                                               truth_row_from_landmarks)
    from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate
    from pyfaceanalysis_tpu.training import synth

    model = DetectionModel.load(args.model)
    calib = model.calibration or {}
    cnorm = bool(calib.get("detection_contrast_normalize", False))
    geom = model.spec.face_geom
    it = str(args.which)
    # Each head decodes ITS stage's network (specialist nets: PosX/PosY ->
    # the xy net, PAng/Scale -> the angle/scale net; model.network_for
    # resolves None0 feature reuse).
    nets_by_kind = {k: model.network_for(f"{k}{it}")
                    for k in ("PosX", "PosY", "PAng", "Scale")}
    ranges = {"0": (40.0, 20.0, 22.5), "1": (14.0, 13.0, 21.0)}[it]
    sigmas = [float(s) for s in args.sigmas.split(",")]
    rng = np.random.RandomState(args.seed)

    def collect(device_image, rows, n):
        dx, dy, ang, smp = sample_offsets(rng, n, geom, ranges)
        boxes, a = boxes_for(rows, dx, dy, ang, smp, geom, rng)
        patches = extract_patches_rotate(
            device_image, jnp.asarray(boxes), jnp.asarray(a), (64, 64),
            method="nearest")
        flat = jnp.reshape(patches, (n, -1))
        if cnorm:
            from pyfaceanalysis_tpu.ops.contrast import (
                contrast_normalize_avg_std,
            )
            flat = contrast_normalize_avg_std(flat * 255.0, 137.5,
                                              0.40 * 255.0) / 255.0
        feats = {}
        for kind, knet in nets_by_kind.items():
            key_ = id(knet)
            if key_ not in feats:
                feats[key_] = np.asarray(knet.execute(flat))
        by_kind = {kind: feats[id(knet)]
                   for kind, knet in nets_by_kind.items()}
        return by_kind, {"PosX": dx, "PosY": dy, "PAng": ang, "Scale": smp}

    # --- synthetic faces --------------------------------------------------
    feats_s = truths_s = None
    per_img = max(args.n // 40, 4)
    fs, ts = [], []
    for i in range(40):
        key = jax.random.PRNGKey(args.seed * 999 + i)
        F = rng.uniform(70, 150)
        img, attrs = synth.render_face(
            key, canvas_hw=(320, 320), face_size=F, center=(160, 160),
            angle_deg=rng.uniform(-15, 15))
        el = np.asarray(attrs["eye_l"]); er = np.asarray(attrs["eye_r"])
        mo = np.asarray(attrs["mouth"])
        row = np.asarray([truth_row_from_landmarks(
            el[0], el[1], er[0], er[1],
            (el[0] + er[0]) / 2, (el[1] + er[1]) / 2, mo[0], mo[1])])
        f, t = collect(jnp.asarray(np.asarray(img)), row, per_img)
        fs.append(f); ts.append(t)
    feats_s = {k: np.concatenate([f[k] for f in fs]) for k in fs[0]}
    truths_s = {k: np.concatenate([t[k] for t in ts]) for k in ts[0]}

    # --- real anchors -----------------------------------------------------
    filenames, coords = load_true_coordinates("", args.anchors)
    fs, ts = [], []
    for f_img in sorted(set(filenames)):
        rows = np.stack([c for fn, c in zip(filenames, coords)
                         if fn == f_img])
        image, factor = load_image(f_img, 1000)
        f, t = collect(jnp.asarray(image), rows * factor, args.n // 3)
        fs.append(f); ts.append(t)
    feats_r = {k: np.concatenate([f[k] for f in fs]) for k in fs[0]}
    truths_r = {k: np.concatenate([t[k] for t in ts]) for k in ts[0]}

    def ridge_corr(feats, t):
        """Ceiling check: can ANY linear readout of the features decode the
        label? Split-half ridge; if this is also ~0 the features lack the
        information and no classifier change can recover it."""
        n = len(feats)
        h = n // 2
        X, Xt = feats[:h], feats[h:]
        y, yt = t[:h], t[h:]
        Xm, ym = X.mean(0), y.mean(0)
        Xc = X - Xm
        w = np.linalg.solve(Xc.T @ Xc + 1e-3 * len(X) * np.eye(X.shape[1]),
                            Xc.T @ (y - ym))
        pred = (Xt - Xm) @ w + ym
        return np.corrcoef(pred, yt)[0, 1]

    for dom, kfeats, truths in (("synthetic", feats_s, truths_s),
                                ("real-anchor", feats_r, truths_r)):
        n_dom = len(next(iter(kfeats.values())))
        print(f"\n=== {dom} ({n_dom} samples), iter {it} ===")
        for kind in ("PosX", "PosY", "PAng", "Scale"):
            feats = kfeats[kind]
            clf = model.classifier(f"{kind}{it}")
            out, std = clf.regression(
                jnp.asarray(feats[:, : clf.input_dim]), estimate_std=True)
            out = np.asarray(out); std = np.asarray(std)
            t = truths[kind]
            err = out - t
            from pyfaceanalysis_tpu.config import DESIRED_SAMPLING
            labels = np.asarray(clf.avg_labels)
            half = (labels.max() - labels.min()) / 2.0
            # the no-op step: reg 0 for shifts/angle, DESIRED_SAMPLING for
            # Scale (cascade rescales by reg -> 0.825, cascade.py:251-260)
            mid = DESIRED_SAMPLING if kind == "Scale" else 0.0
            std_n = std / max(half, 1e-9)
            c_es = (np.corrcoef(np.abs(err), std_n)[0, 1]
                    if np.std(std_n) > 1e-9 else float("nan"))
            line = (f"  {kind}{it}: corr(out,t)={np.corrcoef(out, t)[0,1]:+.3f} "
                    f"ridge={ridge_corr(feats, t):+.3f} "
                    f"corr(|err|,std)={c_es:+.3f} "
                    f"std_n[q50={np.median(std_n):.2f} q90="
                    f"{np.quantile(std_n, .9):.2f}]")
            resids = {}
            for s0 in [None] + sigmas:
                if s0 is None:
                    post = t - out                       # full step
                    tag = "ref"
                else:
                    g = s0 ** 2 / (s0 ** 2 + std_n ** 2)
                    # damp the step toward its no-op value
                    step = (out - mid) * g + mid
                    post = t - step
                    tag = f"s{s0}"
                resids[tag] = (np.sqrt(np.mean(post ** 2)),
                               np.quantile(np.abs(post), 0.9))
            print(line)
            print("    post-step |resid| (rms/p90): " + "  ".join(
                f"{k}={v[0]:.2f}/{v[1]:.2f}" for k, v in resids.items()))


if __name__ == "__main__":
    main()
