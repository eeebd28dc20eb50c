"""Quantify the renderer-vs-photograph domain gap at the patch level.

Every model-quality decision in this repo rides synthetic panels rendered by
``training.synth``; the only real ground truth is a handful of annotated
photographs. This tool puts ONE number set on the gap (VERDICT r3 next-step
#9): first/second-order statistics of the 64x64 detection patches the disc
nets actually consume, for (a) renderer faces at canonical centering and
(b) the real annotated anchor faces extracted at their ground-truth
geometry -- plus the same after the production per-patch contrast
normalization (the shipped models run detection_contrast_normalize=True, so
the POST-normalization rows are what the networks see).

Statistics per patch (pixels in [0, 1]):
  mean / std        global luminance + contrast
  grad              mean gradient magnitude (edge energy)
  lap_var           Laplacian variance (sharpness / noise floor)
  spec_slope        slope of the radially-averaged log power spectrum over
                    log spatial frequency (natural images: ~-2; renderer
                    output that is too smooth or too sharp shows up here)

For each statistic the report gives synth mu+-sd, real mu+-sd, and Cohen's
d (standardized mean difference; |d| > 0.8 = large gap). Track d as the
renderer evolves; a renderer A/B that claims realism gains should cite this
audit before and after.

The real pool is 3 faces (the machine's complete real-face inventory,
docs/ROUND3_NOTES.md session 16); each is extracted at K subpixel jitters
to stabilize the gradient/spectral estimates, but n_real_faces=3 is the
honest sample size -- treat d as indicative, not inferential.

Usage:
    python tools/audit_domain_gap.py [--n 256] [--seed 123]
        [--attr_cues v2] [--out docs/domain_gap_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def patch_stats(p: np.ndarray) -> dict:
    """p: (N, 64, 64) in [0, 1] -> dict of per-patch statistic arrays."""
    gx = np.diff(p, axis=-1, prepend=p[..., :1])
    gy = np.diff(p, axis=-2, prepend=p[..., :1, :])
    lap = (np.roll(p, 1, -1) + np.roll(p, -1, -1) + np.roll(p, 1, -2)
           + np.roll(p, -1, -2) - 4 * p)

    # Radially averaged power spectrum -> log-log slope over k in [3, 28].
    f = np.fft.fftshift(np.abs(np.fft.fft2(p - p.mean(axis=(-2, -1),
                                                      keepdims=True))) ** 2,
                        axes=(-2, -1))
    h, w = p.shape[-2:]
    yy, xx = np.mgrid[:h, :w]
    r = np.hypot(yy - h / 2, xx - w / 2).astype(int)
    slopes = np.empty(len(p))
    ks = np.arange(3, 29)
    for i in range(len(p)):
        radial = np.bincount(r.ravel(), f[i].ravel(), minlength=r.max() + 1)
        cnt = np.bincount(r.ravel(), minlength=r.max() + 1)
        pw = radial[ks] / np.maximum(cnt[ks], 1)
        slopes[i] = np.polyfit(np.log(ks), np.log(pw + 1e-12), 1)[0]

    return {
        "mean": p.mean(axis=(-2, -1)),
        "std": p.std(axis=(-2, -1)),
        "grad": np.hypot(gx, gy).mean(axis=(-2, -1)),
        "lap_var": lap.var(axis=(-2, -1)),
        "spec_slope": slopes,
    }


def cohens_d(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = len(a), len(b)
    pooled = np.sqrt(((na - 1) * a.var(ddof=1) + (nb - 1) * b.var(ddof=1))
                     / max(na + nb - 2, 1))
    return float((a.mean() - b.mean()) / max(pooled, 1e-12))


def synth_pool(n: int, seed: int, attr_cues: str) -> np.ndarray:
    """Renderer faces, canonically centered 64x64 detection patches (the
    disc class-0 framing: box side = face_size, extraction angle = face
    angle -- training.datasets.disc_dataset with frac=0)."""
    import jax
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.training.datasets import (_extract_batch,
                                                      _face_canvases)

    key = jax.random.PRNGKey(seed)
    imgs, attrs = _face_canvases(key, n, 22.5, None, 0.0,
                                 attr_cues=attr_cues)
    F = np.asarray(attrs["face_size"])
    theta = np.asarray(attrs["angle"])
    fcx = (np.asarray(attrs["eye_l"][:, 0] + attrs["eye_r"][:, 0]) / 2.0
           + np.asarray(attrs["mouth"][:, 0])) / 2.0
    fcy = (np.asarray(attrs["eye_l"][:, 1] + attrs["eye_r"][:, 1]) / 2.0
           + np.asarray(attrs["mouth"][:, 1])) / 2.0
    boxes = np.stack([fcx - F / 2, fcy - F / 2,
                      fcx + F / 2 - 1, fcy + F / 2 - 1], -1)[:, None, :]
    patches = _extract_batch(imgs, jnp.asarray(boxes, jnp.float32),
                             jnp.asarray(theta[:, None], jnp.float32))
    return np.asarray(patches).reshape(-1, 64, 64)


def real_pool(gt_file: str, jitters: int, seed: int) -> np.ndarray:
    """The annotated anchor faces, extracted from the photos at their
    ground-truth geometry (+- small subpixel jitters for stable gradient /
    spectral estimates; the identity count stays 3)."""
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates
    from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate
    from pyfaceanalysis_tpu.training.synth import INTER_EYE

    filenames, coords = load_true_coordinates("", gt_file)
    rng = np.random.RandomState(seed)
    out = []
    for fn, c in zip(filenames, coords):
        c = np.asarray(c)
        if np.allclose(c[0:4], 0):
            continue                      # face-free background photo
        image, factor = load_image(fn, 1000)
        c = c * factor                    # GT is in original-image pixels
        el, er = c[0:2], c[2:4]
        inter = float(np.hypot(*(er - el)))
        if inter < 5:
            continue
        F = inter / INTER_EYE
        theta = np.degrees(np.arctan2(er[1] - el[1], er[0] - el[0]))
        fc = np.array([c[8], c[9]])       # annotation face center
        for _ in range(jitters):
            j = rng.uniform(-0.02, 0.02, 2) * F
            a = theta + rng.uniform(-2.0, 2.0)
            box = np.array([[fc[0] + j[0] - F / 2, fc[1] + j[1] - F / 2,
                             fc[0] + j[0] + F / 2 - 1,
                             fc[1] + j[1] + F / 2 - 1]], np.float32)
            p = extract_patches_rotate(jnp.asarray(image), jnp.asarray(box),
                                       jnp.asarray([a], jnp.float32),
                                       (64, 64), method="nearest")
            out.append(np.asarray(p)[0])
    return np.stack(out)


def contrastize(p: np.ndarray) -> np.ndarray:
    """The production per-patch contrast normalization (engine.cascade)."""
    from pyfaceanalysis_tpu.ops.contrast import contrast_normalize_avg_std

    flat = p.reshape(len(p), -1) * 255.0
    out = np.asarray(contrast_normalize_avg_std(flat, 137.5, 0.40 * 255.0))
    return (out / 255.0).reshape(p.shape)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--n", type=int, default=256,
                    help="renderer faces to sample")
    ap.add_argument("--jitters", type=int, default=16,
                    help="subpixel extractions per real anchor face")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--attr_cues", default="v2", choices=["v2", "v3"])
    ap.add_argument("--gt_file", default="data/train_faces_gt.txt")
    ap.add_argument("--out", default="",
                    help="write the JSON report here (e.g. "
                         "docs/domain_gap_r4.json)")
    args = ap.parse_args(argv)

    synth = synth_pool(args.n, args.seed, args.attr_cues)
    real = real_pool(args.gt_file, args.jitters, args.seed)
    n_faces = len(real) // max(args.jitters, 1)
    print(f"pools: {len(synth)} renderer patches (cues {args.attr_cues}), "
          f"{len(real)} real extractions of {n_faces} anchor faces")

    report = {"n_synth": len(synth), "n_real": len(real),
              "n_real_faces": n_faces, "attr_cues": args.attr_cues,
              "stats": {}}
    for tag, s_pool, r_pool in (
            ("raw", synth, real),
            ("contrast_normalized", contrastize(synth), contrastize(real))):
        ss, rs = patch_stats(s_pool), patch_stats(r_pool)
        print(f"\n[{tag}]")
        print(f"{'stat':>12s} {'synth mu':>10s} {'sd':>8s} "
              f"{'real mu':>10s} {'sd':>8s} {'cohen d':>8s}")
        report["stats"][tag] = {}
        for k in ss:
            d = cohens_d(ss[k], rs[k])
            report["stats"][tag][k] = {
                "synth_mean": float(ss[k].mean()),
                "synth_sd": float(ss[k].std(ddof=1)),
                "real_mean": float(rs[k].mean()),
                "real_sd": float(rs[k].std(ddof=1)),
                "cohens_d": d}
            print(f"{k:>12s} {ss[k].mean():10.4f} {ss[k].std(ddof=1):8.4f} "
                  f"{rs[k].mean():10.4f} {rs[k].std(ddof=1):8.4f} {d:8.2f}")

    big = {t: [k for k, v in st.items() if abs(v["cohens_d"]) > 0.8]
           for t, st in report["stats"].items()}
    print(f"\nlarge gaps (|d| > 0.8): {big}")
    report["large_gaps"] = big
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
