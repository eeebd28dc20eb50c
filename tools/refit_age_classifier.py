"""A6: refit ONLY the Age classifier at a different feature dim.

The age diagnosis (docs/age_domain_r4.json) showed the age posterior is
near-uniform even on in-domain synthetic Z-frames: the first 4 slow
features (reference parity, Age D=4 -- SURVEY.md 2.2) carry too little age
information for the 39-class Gaussian ladder. The shared attribute feature
space has top_dim=20; this tool renders a fresh v2 age dataset, executes
the SHIPPED net_age, refits the Age classifier at ``--dims`` and writes
``clf_Age.npz`` into a model COPY for an artifact-swap A/B (pre-registered
rule: docs/ROUND4_NOTES.md "A6").

Usage:
    python tools/refit_age_classifier.py --src SavedNetworksTPU \
        --dst /tmp/age_d6 --dims 6 [--samples 12000] [--jitter_px 4.0]
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", default="SavedNetworksTPU")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--dims", type=int, required=True)
    ap.add_argument("--samples", type=int, default=12000)
    ap.add_argument("--jitter_px", type=float, default=4.0,
                    help="shipped age-stack provenance: 4.0")
    ap.add_argument("--jitter_scale", type=float, default=0.06)
    ap.add_argument("--attr_cues", default="v2", choices=["v2", "v3"])
    ap.add_argument("--seed", type=int, default=12345600)
    args = ap.parse_args(argv)

    import jax

    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    from pyfaceanalysis_tpu.io import artifacts
    from pyfaceanalysis_tpu.training import datasets
    from pyfaceanalysis_tpu.training.trainer import (_execute,
                                                     fit_regressor_bins)

    if os.path.abspath(args.dst) == os.path.abspath(args.src):
        raise SystemExit("--dst must differ from --src (artifact-swap A/B)")
    if os.path.exists(args.dst):
        shutil.rmtree(args.dst)
    shutil.copytree(args.src, args.dst)

    model = DetectionModel.load(args.src)
    net = model.nets["net_age"]
    # keys[5] of the trainer's split drives the shipped age dataset; a
    # FRESH key here is deliberate -- the refit must not memorize the
    # exact training draw of the shipped run.
    key = jax.random.fold_in(jax.random.PRNGKey(args.seed), 777)
    print(f"rendering {args.samples} v2 Z-frames "
          f"(jitter {args.jitter_px}px/{args.jitter_scale})...", flush=True)
    x, labels = datasets.age_dataset(key, args.samples,
                                     jitter_px=args.jitter_px,
                                     jitter_scale=args.jitter_scale,
                                     attr_cues=args.attr_cues)
    feats = _execute(net, x)
    print(f"fitting Age classifier at input_dim={args.dims} "
          f"(39 classes)...", flush=True)
    clf = fit_regressor_bins(feats, labels["age"], args.dims,
                             num_classes=39)
    artifacts.save_classifier(os.path.join(args.dst, "clf_Age.npz"), clf,
                              clf.input_dim)
    print(f"wrote {args.dst}/clf_Age.npz (input_dim {clf.input_dim})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
