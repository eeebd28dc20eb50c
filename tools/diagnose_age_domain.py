"""Why is real-photo age estimation stuck near the prior mean?

Round-4 anchors: predictions 44-52y for true ages 78/24/30 -- the classic
signature of regression-to-the-mean under domain shift: if the age net's
features carry no age information on photographs, the Gaussian soft
regression's posterior flattens toward the class priors and the
avg_labels-weighted output collapses to the prior mean (~40y for the
16.5-57.8y ladder).

This tool tests that hypothesis at the FEATURE level: it pushes (a) N
zero-jitter synthetic Z-frames (the training distribution) and (b) the real
anchor faces at their ground-truth eye geometry through the SAME Z-frame ->
96x96 patch -> age-net path the production heads use (engine.heads), then
reports:

- per-feature standardized offset of the real faces vs the synthetic
  feature distribution (|z| >> 2 = the real inputs land outside the
  training manifold -> posteriors meaningless);
- the age-classifier posterior entropy + top-class probability per pool
  (flat posterior on real = the collapse mechanism confirmed);
- predicted-age spread per pool.

Usage: python tools/diagnose_age_domain.py [--model SavedNetworksTPU]
    [--n 256] [--gt data/train_faces_gt.txt] [--json OUT]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--attr_cues", default="v2", choices=["v2", "v3"])
    ap.add_argument("--gt", default="data/train_faces_gt.txt")
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.engine import heads
    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.io.writers import load_true_coordinates
    from pyfaceanalysis_tpu.models.network import apply_network
    from pyfaceanalysis_tpu.ops.contrast import contrast_enhance_patches
    from pyfaceanalysis_tpu.training import datasets

    model = DetectionModel.load(args.model)
    net = model.nets["net_age"]
    clf = model.classifier("Age")
    d_age = model.clf_input_dim("Age")

    # --- synthetic pool: the training distribution at zero jitter ----------
    flat_s, labels = datasets.age_dataset(jax.random.PRNGKey(args.seed),
                                          args.n, jitter_px=0.0,
                                          jitter_scale=0.0,
                                          attr_cues=args.attr_cues)
    feats_s = np.asarray(jax.jit(lambda x: apply_network(
        net.specs, tuple(net.params), x))(flat_s))[:, :d_age]

    # --- real pool: anchor faces at GT eye geometry through the heads ------
    filenames, coords = load_true_coordinates("", args.gt)
    rows, images, img_idx = [], [], []
    for fn, c in zip(filenames, coords):
        c = np.asarray(c)
        if np.allclose(c[0:4], 0) or np.hypot(*(c[2:4] - c[0:2])) < 5:
            continue
        image, factor = load_image(fn, 1000)
        c = c * factor
        images.append(image)
        # rows layout consumed by heads._frame_arrays: eyes in cols 5:9
        rows.append([0, 0, 0, 0, 0, c[0], c[1], c[2], c[3], 1.0])
        img_idx.append(len(images) - 1)
    H = max(im.shape[0] for im in images)
    W = max(im.shape[1] for im in images)
    stack = np.zeros((len(images), H, W), np.float32)
    for i, im in enumerate(images):
        stack[i, :im.shape[0], :im.shape[1]] = im
    rows = np.asarray(rows, np.float64)
    centers, angles, sfs = heads._frame_arrays(rows)
    patches = heads._sample_age_patches(
        jnp.asarray(stack), jnp.asarray(centers), jnp.asarray(angles),
        jnp.asarray(sfs), jnp.asarray(np.asarray(img_idx, np.int32)))
    flat_r = contrast_enhance_patches(
        patches.reshape(patches.shape[0], -1), obj_avg=0.0, obj_std=0.16)
    feats_r = np.asarray(jax.jit(lambda x: apply_network(
        net.specs, tuple(net.params), x))(flat_r))[:, :d_age]

    # --- feature-level offsets ---------------------------------------------
    mu, sd = feats_s.mean(0), feats_s.std(0) + 1e-9
    z = (feats_r - mu) / sd
    print(f"synthetic pool: {len(feats_s)} Z-frames; real pool: "
          f"{len(feats_r)} anchor faces; age-feature dim {d_age}")
    print("per-feature |z| of each real face vs the synthetic distribution:")
    for i, fn in enumerate([f for f in sorted(set(filenames))
                            if True][:len(feats_r)]):
        print(f"  face {i}: " + " ".join(f"{abs(v):5.1f}" for v in z[i]))
    mean_absz = float(np.abs(z).mean())

    # --- posterior shape ----------------------------------------------------
    def posterior_stats(feats):
        # per-class Gaussian log-likelihoods -> softmax posterior
        p = np.asarray(clf.posteriors(jnp.asarray(feats[:, :d_age]))) \
            if hasattr(clf, "posteriors") else None
        return p

    stats = {}
    for tag, feats in (("synth", feats_s[:64]), ("real", feats_r)):
        p = posterior_stats(feats)
        if p is None:
            print("(classifier lacks a posteriors() method; skipping "
                  "entropy report)")
            break
        ent = -(p * np.log(p + 1e-12)).sum(-1)
        age = np.asarray(clf.regression(jnp.asarray(feats[:, :d_age])))
        stats[tag] = {"entropy_mean": float(ent.mean()),
                      "entropy_max_possible": float(np.log(p.shape[-1])),
                      "top_prob_mean": float(p.max(-1).mean()),
                      "age_mean": float(age.mean()),
                      "age_std": float(age.std())}
        print(f"[{tag}] posterior entropy {ent.mean():.2f} "
              f"(uniform={np.log(p.shape[-1]):.2f}), top-prob "
              f"{p.max(-1).mean():.2f}, predicted age "
              f"{age.mean():.1f} +- {age.std():.1f}")

    out = {"mean_abs_z": mean_absz, "z_real": np.abs(z).tolist(),
           "pools": stats, "n_synth": len(feats_s), "n_real": len(feats_r)}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
