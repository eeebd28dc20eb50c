"""Artifact store: trained networks + classifiers as .npz files.

Replaces the reference's hash-stamped Python-2 pickles loaded through
``cuicuilco.object_cache`` (face_analysis.py:451-487) with portable npz
archives: arrays + a JSON metadata string. A trained pipeline directory
(default ``SavedNetworksTPU/``) contains ``net_*.npz``, ``clf_*.npz``, a
``pipeline.txt`` in the reference text format (io.pipeline) and a
``manifest.json`` with the geometry headers.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from pyfaceanalysis_tpu.models.expansion import Expansion
from pyfaceanalysis_tpu.models.network import HierarchicalNetwork, LayerSpec
from pyfaceanalysis_tpu.models.sfa import LinearNode
from pyfaceanalysis_tpu.ops.gaussian import GaussianRegressor


def save_network(path: str, net: HierarchicalNetwork) -> None:
    arrays = {}
    meta = {"input_hw": list(net.input_hw), "layers": []}
    for i, (spec, node) in enumerate(zip(net.specs, net.params)):
        arrays[f"idx_{i}"] = spec.indices_array()
        arrays[f"mean_{i}"] = np.asarray(node.mean)
        arrays[f"W_{i}"] = np.asarray(node.W)
        meta["layers"].append({
            "expansion": spec.expansion.name,
            "exponent": spec.expansion.exponent,
            "out_dim": spec.out_dim,
            "node": spec.node,
            "slow_dim": spec.slow_dim,
            "clip": spec.clip,
        })
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_network(path: str) -> HierarchicalNetwork:
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    specs, params = [], []
    for i, lm in enumerate(meta["layers"]):
        idx = z[f"idx_{i}"]
        specs.append(LayerSpec(
            tuple(tuple(int(v) for v in row) for row in idx),
            Expansion(lm["expansion"], lm.get("exponent", 0.8)),
            lm["out_dim"], node=lm["node"], slow_dim=lm.get("slow_dim"),
            clip=lm.get("clip", 4.0)))
        params.append(LinearNode(jnp.asarray(z[f"mean_{i}"]),
                                 jnp.asarray(z[f"W_{i}"])))
    return HierarchicalNetwork(tuple(specs), params,
                               tuple(meta["input_hw"]))


def save_classifier(path: str, clf, input_dim: int) -> None:
    """``input_dim`` is the feature-truncation width (classifier.input_dim in
    the reference, FaceDetectUpdated.py:709). Accepts either head type:
    GaussianRegressor (reference semantics) or ops.ridge.RidgeRegressor
    (optional linear decoder)."""
    assert input_dim == clf.input_dim
    if hasattr(clf, "inv_covs"):
        np.savez_compressed(path,
                            means=np.asarray(clf.means),
                            inv_covs=np.asarray(clf.inv_covs),
                            log_norm=np.asarray(clf.log_norm),
                            avg_labels=np.asarray(clf.avg_labels))
    else:
        np.savez_compressed(path,
                            head=np.asarray("ridge"),
                            w=np.asarray(clf.w),
                            b=np.asarray(clf.b),
                            clip_lo=np.asarray(clf.clip_lo),
                            clip_hi=np.asarray(clf.clip_hi),
                            resid_std=np.asarray(clf.resid_std))


def load_classifier(path: str):
    z = np.load(path)
    if "w" in z.files:
        from pyfaceanalysis_tpu.ops.ridge import RidgeRegressor
        return RidgeRegressor(jnp.asarray(z["w"]), jnp.asarray(z["b"]),
                              jnp.asarray(z["clip_lo"]),
                              jnp.asarray(z["clip_hi"]),
                              jnp.asarray(z["resid_std"]))
    return GaussianRegressor(jnp.asarray(z["means"]),
                             jnp.asarray(z["inv_covs"]),
                             jnp.asarray(z["log_norm"]),
                             jnp.asarray(z["avg_labels"]))


def save_manifest(dirpath: str, face_geom, eye_geom, age_geom,
                  calibration: dict = None) -> None:
    import dataclasses
    with open(os.path.join(dirpath, "manifest.json"), "w") as f:
        json.dump({
            "face_geom": dataclasses.asdict(face_geom),
            "eye_geom": dataclasses.asdict(eye_geom),
            "age_geom": dataclasses.asdict(age_geom),
            "calibration": calibration or {},
        }, f, indent=2)


def load_calibration(dirpath: str) -> dict:
    path = os.path.join(dirpath, "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f).get("calibration", {})


def load_manifest(dirpath: str) -> Tuple:
    from pyfaceanalysis_tpu.config import NetGeometry
    with open(os.path.join(dirpath, "manifest.json")) as f:
        m = json.load(f)
    return (NetGeometry(**m["face_geom"]), NetGeometry(**m["eye_geom"]),
            NetGeometry(**m["age_geom"]))
