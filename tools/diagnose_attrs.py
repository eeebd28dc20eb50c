"""Attribute-head diagnosis: WHERE is age/race/gender quality lost?

Decomposes the deployed-attribute error chain on held-out renderer faces
(VERDICT r2 missing #3: gender near chance, age MAE 8.6y vs the ~3.5y
HiGSFA literature line):

1. FEATURE CEILING -- split-half ridge decode of each label from the FULL
   net_age feature vector at zero jitter: if this is low, the network
   never encoded the cue and classifier work is pointless.
2. CLASSIFIER SLICE -- the same ridge on only the first ``input_dim``
   features the shipped Gaussian classifier consumes (Age 4 / Race 5 /
   Gender 5): a big gap vs (1) means the label's information lives in
   LATER features and the head is starved by the truncation.
3. SHIPPED HEAD -- the actual classifier's accuracy/MAE on the same
   patches.
4. DEPLOYMENT JITTER -- (1)-(3) repeated at production eye-localization
   jitter (4 px / 0.06 scale): the transfer loss from imperfect eyes.

Usage: python tools/diagnose_attrs.py [--model SavedNetworksTPU] [--n 1500]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def ridge_stat(X, y, classify):
    """Split-half ridge decode; returns accuracy (sign match) for
    classification labels or MAE for regression labels."""
    n = len(X)
    h = n // 2
    Xa, Xb = X[:h], X[h:]
    ya, yb = y[:h], y[h:]
    Xm = Xa.mean(0)
    Xc = Xa - Xm
    lam = 1e-3 * h
    w = np.linalg.solve(Xc.T @ Xc + lam * np.eye(X.shape[1]),
                        Xc.T @ (ya - ya.mean()))
    pred = (Xb - Xm) @ w + ya.mean()
    if classify:
        return float((np.sign(pred) == np.sign(yb)).mean())
    return float(np.abs(pred - yb).mean())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--n", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=31337)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.training import datasets

    model = DetectionModel.load(args.model)
    net = model.nets["net_age"]

    for tag, jpx, jsc in [("zero-jitter", 0.0, 0.0),
                          ("deploy-jitter", 4.0, 0.06)]:
        x, labels = datasets.age_dataset(
            jax.random.PRNGKey(args.seed), args.n,
            jitter_px=jpx, jitter_scale=jsc)
        feats = np.asarray(jax.jit(net.execute)(x))
        print(f"\n=== {tag} (n={args.n}, feats dim {feats.shape[1]}) ===")
        for lab, classify in [("age", False), ("race", True),
                              ("gender", True)]:
            y = np.asarray(labels[lab], np.float64)
            clf = model.classifier(lab.capitalize())
            d = clf.input_dim
            full = ridge_stat(feats, y, classify)
            sl = ridge_stat(feats[:, :d], y, classify)
            pred = np.asarray(clf.regression(
                jnp.asarray(feats[:, :d])))
            if classify:
                head = float((np.sign(pred) == np.sign(y)).mean())
                unit = "acc"
            else:
                head = float(np.abs(pred - y).mean())
                unit = "MAE"
            # which single features carry the label?
            cors = [abs(float(np.corrcoef(feats[:, j], y)[0, 1]))
                    for j in range(min(feats.shape[1], 20))]
            top = np.argsort(cors)[::-1][:5]
            print(f"  {lab:6s}: ridge-full({feats.shape[1]}d) {unit}="
                  f"{full:.3f}  ridge-slice({d}d) {unit}={sl:.3f}  "
                  f"shipped-head {unit}={head:.3f}  "
                  f"top-|corr| dims {list(top)} "
                  f"({[round(cors[j], 2) for j in top]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
