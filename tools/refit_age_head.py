"""Age-head input-dimension A/B + optional refit, on held-out renders.

The reference ships a D=4 age head (SavedClassifiers Age pickles,
SURVEY.md 2.2); our trainer mirrors that. diagnose_attrs (round 3) shows
the 4-dim truncation costs ~0.2-0.8y of the feature ceiling, so this tool
measures the shipped net's age MAE when its Gaussian head is refit at
several input dims (split-half: fit on half the renders, evaluate on the
other half, at deploy jitter), prints the table, and with ``--write D``
refits clf_Age at dimension D from the full sample and saves it into the
model dir (pipeline input_dim updates with the artifact).

Usage: python tools/refit_age_head.py [--model DIR] [--n 3000]
       [--dims 4,6,8,12] [--write D]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--dims", default="4,6,8,12")
    ap.add_argument("--jitter_px", type=float, default=4.0)
    ap.add_argument("--jitter_scale", type=float, default=0.06)
    ap.add_argument("--seed", type=int, default=24601)
    ap.add_argument("--write", type=int, default=0,
                    help="refit clf_Age at this dim from ALL samples and save")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.io import artifacts
    from pyfaceanalysis_tpu.training import datasets
    from pyfaceanalysis_tpu.training.trainer import fit_regressor_bins

    model = DetectionModel.load(args.model)
    net = model.nets["net_age"]
    x, labels = datasets.age_dataset(
        jax.random.PRNGKey(args.seed), args.n,
        jitter_px=args.jitter_px, jitter_scale=args.jitter_scale)
    feats = np.asarray(jax.jit(net.execute)(x))
    age = np.asarray(labels["age"], np.float64)
    h = len(age) // 2

    best = None
    for d in [int(t) for t in args.dims.split(",")]:
        clf = fit_regressor_bins(feats[:h], age[:h], d, num_classes=39)
        pred = np.asarray(clf.regression(jnp.asarray(feats[h:, :d])))
        mae = float(np.abs(pred - age[h:]).mean())
        print(f"dim {d:2d}: held-out age MAE {mae:.3f}y", flush=True)
        if best is None or mae < best[1]:
            best = (d, mae)
    print(f"best: dim {best[0]} ({best[1]:.3f}y)")

    if args.write:
        clf = fit_regressor_bins(feats, age, args.write, num_classes=39)
        artifacts.save_classifier(os.path.join(args.model, "clf_Age.npz"),
                                  clf, clf.input_dim)
        print(f"wrote clf_Age.npz at input_dim={args.write} "
              f"(fit on all {len(age)} samples)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
