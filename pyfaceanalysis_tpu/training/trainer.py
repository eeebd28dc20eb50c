"""Layer-wise HiGSFA training + full-pipeline artifact production.

Training a hierarchical SFA network is layer-local (the MDP/cuicuilco hinet
scheme the reference's networks were built with, SURVEY.md 2.3): each layer
is fit on the previous layer's outputs, with the training graph shared by
all receptive fields. Per layer:

1. gather + expand the layer inputs on device (batched, chunked),
2. accumulate graph covariances (batched GEMMs),
3. solve the (F, D, D) generalized eigenproblems (host float64),
4. propagate outputs to train the next layer.

``train_pipeline`` produces every artifact of the 22-stage reference pipeline
(Pipelines/Pipeline_experimental.txt): 6 networks (two FaceCentering
discriminators, two pose-refinement nets, one eye net, one linear-PCA age
net) and 22 Gaussian classifiers, with the reference's feature-sharing layout
(``None0`` stages reuse the previous stage's features).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pyfaceanalysis_tpu.config import NetGeometry
from pyfaceanalysis_tpu.io import artifacts
from pyfaceanalysis_tpu.io.pipeline import PipelineSpec, StageSpec, write_pipeline
from pyfaceanalysis_tpu.models import builder
from pyfaceanalysis_tpu.models.network import HierarchicalNetwork, apply_layer
from pyfaceanalysis_tpu.models.sfa import LinearNode
from pyfaceanalysis_tpu.ops.gaussian import GaussianRegressor
from pyfaceanalysis_tpu.training import datasets


@partial(jax.jit, static_argnames=("spec",))
def _gather_expand(spec, x):
    fields = jnp.take(x, jnp.asarray(spec.indices_array()), axis=1)
    return spec.expansion(fields)


@partial(jax.jit, static_argnames=("spec",))
def _apply(spec, node, x):
    return apply_layer(spec, node, x)


def train_network(net: HierarchicalNetwork, x: np.ndarray,
                  graph: str = "temporal",
                  labels: Optional[np.ndarray] = None,
                  num_groups: int = 50, verbose: bool = True,
                  label_weights=None, mesh=None) -> HierarchicalNetwork:
    """Trains all layers of ``net`` on (N, D_in) data with one shared graph.

    Data lives on device throughout; each layer costs one gather+expand and
    one (F, D, D) moment accumulation + batched eigensolve -- all on device
    (models.moments). Nothing larger than the layer weights crosses the
    host boundary (tunneled-TPU device->host bandwidth is the scarce
    resource).

    With ``mesh`` (a ``jax.sharding.Mesh`` with a "data" axis) the sample
    axis is sharded across devices and the SAME jitted programs run under
    GSPMD: the (N, F, D) batch -- the only big tensor -- is split, the
    per-field moment einsums reduce locally and ``psum`` the tiny
    (F, D, D) results over ICI, and the batched eigensolves run on the
    replicated moments. No reference equivalent (the reference is
    single-process NumPy; SURVEY.md 2.4) -- this is the framework's
    production multi-chip training path, dry-run on the virtual CPU mesh.
    """
    from pyfaceanalysis_tpu.models import moments

    params = []
    cur = jnp.asarray(x, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                             if a == "data"])) or 1
        # Truncate to a device-divisible sample count: an uneven final
        # shard would make XLA pad the batch, and padded rows would bias
        # the moment sums (they are data, not zeros, after centering).
        n_keep = (cur.shape[0] // n_dev) * n_dev
        cur = cur[:n_keep]
        if labels is not None:
            labels = np.asarray(labels)[:n_keep]
        cur = jax.device_put(cur, NamedSharding(mesh, P("data", None)))
    for li, spec in enumerate(net.specs):
        t0 = time.time()
        inp = _gather_expand(spec, cur)                  # (N, F, De) device
        if spec.node == "pca":
            mean, B = moments.mean_cov(inp)
            W = moments.solve_pca_device(B, spec.out_dim)
        else:
            mean, B, A = moments.gsfa_moments(inp, graph, labels=labels,
                                              num_groups=num_groups,
                                              label_weights=label_weights)
            if spec.node == "igsfa":
                slow = spec.slow_dim or max(spec.out_dim // 2, 1)
                W = moments.solve_igsfa_device(A, B, slow, spec.out_dim)
            else:
                W = moments.solve_gsfa_device(A, B, spec.out_dim)
        node = LinearNode(mean, W)
        params.append(node)
        cur = _apply(spec, node, cur)
        if verbose:
            cur.block_until_ready()
            print(f"  layer {li}: fields={spec.num_fields} "
                  f"in={inp.shape[-1]} out={spec.out_dim} "
                  f"[{time.time() - t0:.1f}s]", flush=True)
    return dataclasses.replace(net, params=params)


def fit_regressor_bins(features: np.ndarray, values: np.ndarray,
                       input_dim: int, num_classes: int = 50,
                       reg: float = 1e-6) -> GaussianRegressor:
    """Discretizes a continuous label into quantile bins and fits per-class
    Gaussians; avg_labels = per-class mean of the raw values (the reference
    classifiers' avg_labels are exactly such class means, SURVEY.md 2.2)."""
    x = np.asarray(features)[:, :input_dim]
    v = np.asarray(values, np.float64)
    # Keep enough samples per class for a stable covariance.
    num_classes = max(2, min(num_classes, len(v) // (3 * input_dim + 10)))
    edges = np.quantile(v, np.linspace(0, 1, num_classes + 1)[1:-1])
    cls = np.searchsorted(edges, v)
    keep_classes, counts = np.unique(cls, return_counts=True)
    # Remap to dense ids, dropping classes too small for a covariance.
    valid = keep_classes[counts > input_dim + 2]
    remap = {c: i for i, c in enumerate(valid)}
    sel = np.isin(cls, valid)
    dense = np.array([remap[c] for c in cls[sel]])
    avg = np.array([v[sel][dense == i].mean() for i in range(len(valid))])
    return GaussianRegressor.fit(x[sel], dense, avg_labels=avg, reg=reg)


def fit_regressor_classes(features: np.ndarray, cls: np.ndarray,
                          avg_labels: np.ndarray, input_dim: int,
                          reg: float = 1e-6) -> GaussianRegressor:
    """Fits per-class Gaussians on pre-defined integer classes."""
    x = np.asarray(features)[:, :input_dim]
    cls = np.asarray(cls)
    present = np.unique(cls)
    remap = {c: i for i, c in enumerate(present)}
    dense = np.array([remap[c] for c in cls])
    return GaussianRegressor.fit(x, dense,
                                 avg_labels=np.asarray(avg_labels)[present],
                                 reg=reg)


def _execute(net: HierarchicalNetwork, x: np.ndarray) -> np.ndarray:
    """One device pass; only the (N, out_dim) features come back to host."""
    return np.asarray(jax.jit(net.execute)(jnp.asarray(x, jnp.float32)))


@dataclasses.dataclass
class TrainConfig:
    """Sizes for the synthetic training run (defaults give a usable pipeline
    in a few minutes; crank up for quality)."""

    num_faces: int = 150
    steps_per_face: int = 40
    disc_faces: int = 150
    disc_steps: int = 40
    eye_faces: int = 120
    eye_steps: int = 40
    age_samples: int = 12000
    # Eye-position jitter of the Z-frame age/race/gender training faces, in
    # Z-frame pixels / relative scale. The deployed heads see DETECTED eye
    # positions (rel eye error ~0.13 of the inter-eye distance = ~9 Z px),
    # so training at the reference-style ~1.5 px makes the features brittle
    # to exactly the misalignment production inputs carry. A/B (synth
    # deployed eval, identical gates): 1.5px/4k -> age MAE 11.0y, gender
    # 9/15; 4px+0.06/12k -> 8.6y, 10/15, race 12->13.
    age_jitter_px: float = 4.0
    age_jitter_scale: float = 0.06
    pose_classes: int = 50
    seed: int = 12345600    # the reference's RNG seed (FaceDetectUpdated.py:146)
    top_dim: int = 20
    train_final_disc: bool = True
    # Real annotated photos (training.real) mixed into the synthetic pools:
    # fraction of face canvases / of background canvases drawn from real
    # photos. 0 disables (pure synthetic).
    real_frac: float = 0.22
    real_bg_frac: float = 0.30
    real_gt_file: str = ""   # "" = data/train_faces_gt.txt
    # Mined false-positive boxes (tools/mine_hard_negatives.py output):
    # extra Disc background-class patches centered on the production
    # model's own real-photo FPs (bootstrapped hard-negative mining).
    # mined_frac scales the EXTRA patch count relative to the background
    # class size. "" = no mining.
    mined_file: str = ""
    mined_frac: float = 0.5
    # Renderer attribute-cue version for ALL training datasets. "v2" is
    # the distribution every SHIPPED network was trained on; the v3
    # structural-aging/gender-geometry cues were REJECTED for detection
    # and attr stacks by held-out A/Bs (docs/ROUND3_NOTES.md sessions 6
    # and 12) -- a fresh pfa-train must reproduce the shipped family.
    # Measurement tools (eval_synth, diagnose_attrs) keep v3 scenes.
    attr_cues: str = "v2"
    # Per-patch contrast normalization on the DETECTION patch batches
    # (pose/disc); removes global photometric domain shift between the
    # renderer and photographs. Recorded in the calibration manifest so
    # the detector applies the same transform (engine.cascade).
    contrast_normalize: bool = True
    # Calibrated PAng step gain shipped in the manifest (see
    # DetectorConfig.pang_gain). Swept on the real-photo diagnosis in
    # round 2: 0.25 doubled surviving GT faces vs the reference's full
    # step because saturated-wrong angle estimates rotate later
    # extractions into Disc kills (docs/ROUND2_NOTES.md).
    pang_gain: float = 0.25
    # Calibrated PosX/PosY and Scale step gains (DetectorConfig.pos_gain /
    # scale_gain). On real photographs the pose regressors overshoot
    # (~1.6x on annotated trajectories, occasionally sign-flipped); a
    # closed-loop gain < 1 converts overshoot into geometric convergence
    # across the 3 refinement iterations. Swept on the canonical photo
    # (tools/sweep_step_gains.py): pos 0.65 lifted 1 TP -> 4 TP at the
    # calibrated operating point; scale damping never helped.
    pos_gain: float = 0.65
    scale_gain: float = 1.0
    # Node type for the detection nets: "sfa" or "igsfa" (slow features +
    # whitened residual PCA per layer, cuicuilco iGSFANode equivalent --
    # models.moments.solve_igsfa_device). A/B knob per family. iGSFA is the
    # ADOPTED default for the disc nets (round-2 A/B: recall +0.05, FP
    # -0.1/img, much cleaner candidate pool -- docs/ROUND2_NOTES.md); pose
    # and eye heads are soft-REGRESSORS, where residual-PCA dims dilute the
    # posteriors (A/B'd and rejected).
    disc_node: str = "igsfa"
    # Decoder head for the pose-refinement stages: "gaussian" (reference
    # semantics, default) or "ridge" (ops.ridge.RidgeRegressor -- decodes
    # the same features substantially better, esp. on real photos: PosX1
    # real-anchor corr 0.50 gaussian vs 0.79 ridge). Gates/gains must be
    # recalibrated when switching heads.
    pose_head: str = "gaussian"
    pose_node: str = "sfa"
    eye_node: str = "sfa"
    # Multi-seed disc training (VERDICT r3 next-step #1). Single-seed disc
    # retrains carry dataset-sampling variance LARGER than the ship guard
    # band (round-3 campaign: 6 same-protocol candidates spanned panel
    # FP/img 0.875-2.083, anchors FP 10-20 -- docs/ROUND4_NOTES.md), so a
    # single-seed pfa-train ships a lottery ticket. With disc_seeds=(a,b,c)
    # the trainer trains the disc nets once per seed, ladder-calibrates
    # every candidate, scores each on a TRAINING-SIDE panel + the real
    # anchors (training.selection), and ships the winner of the declared
    # rule. () = legacy single train on the base key.
    disc_seeds: tuple = ()
    # n=200: every 48-scene decision number in round 4 sat inside the
    # n=200 panel's own CIs (recall +-0.06 at n=48) -- panels that pick
    # winners or gate ships must be outside their own noise (VERDICT r4
    # weak #3). 48 remains available for quick interactive sweeps.
    selection_scenes: int = 200
    selection_seed: int = 777       # training-side; 999 stays held out
    recall_floor: float = 0.73
    # Ladder + eye-gate calibration as the trainer's closing step
    # (training.calibration; previously a manual tool whose omission
    # silently regressed quality twice in round 2).
    calibrate: bool = True
    calib_scenes: int = 40
    calib_seed: int = 1234
    # Background cap of the calibrated ladder (campaign-3 L0; 0 = off):
    # max cumulative pre-NMS background windows/image.
    calib_bg_budget: float = 0.0
    # Small-scale real-anchor replicas in the calibration spare pool
    # (campaign-7 L0): target inter-eye sizes in px, () = off.
    calib_anchor_small_ie: tuple = ()
    # Ladder rungs (serial indices) exempt from the bg-budget cap: they
    # keep their face-calibrated value and the budget is reclaimed from
    # the other rungs (campaign-7 L0 mechanism: a uniform cap reclaims
    # exactly what hard real faces loosen). () = uniform cap.
    calib_bg_protect: tuple = ()
    # High-frequency texture injection amplitude for ALL training patch
    # batches (datasets._random_patch_blur noise_amp / age_dataset): the
    # measured renderer-vs-photograph gap (docs/domain_gap_r4.json) is
    # real faces carrying ~3x the gradient energy; 0 = off (the shipped
    # provenance). A/B knob -- pre-registered protocol before adoption.
    texture_noise: float = 0.0
    # Background-only texture injection for the DISC datasets (0 = inherit
    # texture_noise). Campaign-3 L5: face-class injection at 0.08 cut
    # real-photo FP ~2x but caused systematic real-face misses; injecting
    # into the background/mined classes only keeps the FP lever without
    # touching what the disc learns a face looks like.
    texture_noise_bg: float = 0.0
    # Fraction of the age-net training set drawn from REAL anchor faces
    # warped through the deploy-path Z-frame affine with deploy-matched
    # eye jitter (RealFaceSource.sample_age_zframes). 0 = synthetic-only
    # (the r1-r4 shipped provenance -- and the provenance of the
    # anchor-attrs leak note in data/anchor_attrs.txt: flipping this on
    # makes the anchors-attrs check IN-TRAINING; report leave-one-out
    # numbers via age_real_exclude for the honest generalization
    # estimate). VERDICT r3 next #2's sanctioned lever.
    age_real_frac: float = 0.0
    # Basename of one anchor photo to HOLD OUT of the real age pool
    # (leave-one-photo-out measurement).
    age_real_exclude: str = ""
    # Training graph of the disc nets: "clustered" (reference semantics --
    # 10 graded classes, within-class edges) or "serial" over the
    # CONTINUOUS centering fraction (50 groups, neighbor edges). The
    # clustered 10-class graph pins at most ~9 feature directions while
    # the layers keep 13-20 outputs; the free-rotating remainder is the
    # leading hypothesis for single-seed disc-retrain variance exceeding
    # the ship guard band (docs/ROUND4_NOTES.md, variance root-cause
    # section). A serial graph over the continuous grade pins up to
    # ~num_groups-1 directions.
    disc_graph: str = "clustered"


# (type, network, classifier, input_dim) rows of the produced pipeline; "None0"
# = reuse previous features (matches Pipeline_experimental.txt's layout).
_STAGE_LAYOUT = [
    # SPECIALIST pose nets (round-2 restructure): one xy net + one
    # angle/scale net per iteration. The shared 4-label net collapses to
    # x-position + nuisance (held-out 28k-patch A/B: shared dy/ang/scale
    # corr 0.61/0.30/0.10 vs specialist 0.80/0.70/0.32 -- the angle/scale
    # net also trains at NARROW positional jitter, matching its actual
    # input distribution after the PosX/PosY corrections). The PAng stages
    # re-extract at the corrected positions (plan extract rule, reference
    # FaceDetectUpdated.py:674-691 semantics). An earlier wide-field
    # dedicated angle net trained at FULL positional jitter failed the
    # same A/B (saturated outputs) -- narrow jitter is the difference.
    ("Disc1", "net_disc", "clf_Disc1", 9),
    ("PosX0", "net_pose0", "clf_PosX0", 10),
    ("PosY0", "None0", "clf_PosY0", 20),
    ("PAng0", "net_pose0as", "clf_PAng0", 20),
    ("Scale0", "None0", "clf_Scale0", 20),
    ("Disc3", "net_disc", "clf_Disc1", 9),
    ("PosX1", "net_pose1", "clf_PosX1", 20),
    ("PosY1", "None0", "clf_PosY1", 20),
    ("PAng1", "net_pose1as", "clf_PAng1", 20),
    ("Scale1", "None0", "clf_Scale1", 20),
    ("Disc5", "net_disc", "clf_Disc1", 9),
    ("PosX2", "net_pose1", "clf_PosX1", 20),
    ("PosY2", "None0", "clf_PosY1", 20),
    ("PAng2", "net_pose1as", "clf_PAng1", 20),
    ("Scale2", "None0", "clf_Scale1", 20),
    ("Disc7", "net_disc", "clf_Disc1", 9),
    ("Disc9", "net_disc_final", "clf_Disc9", 9),
    ("EyeLX", "net_eye", "clf_EyeLX", 12),
    ("EyeLY", "None0", "clf_EyeLY", 10),
    ("Age", "net_age", "clf_Age", 4),
    ("Race", "None0", "clf_Race", 5),
    ("Gender", "None0", "clf_Gender", 5),
]


def train_pipeline(out_dir: str, cfg: TrainConfig = TrainConfig(),
                   face_geom: NetGeometry = NetGeometry(),
                   verbose: bool = True, reuse: Sequence[str] = (),
                   data_mesh: int = 0) -> None:
    """Trains every network/classifier and writes the artifact directory.

    ``reuse``: substrings of network names to LOAD from ``out_dir`` instead
    of retraining (e.g. ("pose", "eye") retrains only disc/age) -- the
    incremental iteration loop for model-quality work.

    ``data_mesh``: shard every network's moment accumulation over an
    N-device "data" mesh (see :func:`train_network`); 0 = single device.
    """
    os.makedirs(out_dir, exist_ok=True)
    mesh = None
    if data_mesh:
        from pyfaceanalysis_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data_mesh, ("data",))
        if verbose:
            print(f"[train] moment accumulation sharded over a "
                  f"{data_mesh}-device data mesh", flush=True)

    def _reusable(name):
        return any(r in name for r in reuse) and os.path.exists(
            os.path.join(out_dir, name + ".npz"))

    key = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(key, 12)
    real_source = None
    if cfg.real_frac > 0 or cfg.real_bg_frac > 0:
        from pyfaceanalysis_tpu.training import real as real_mod
        if cfg.real_gt_file:
            real_source = real_mod.RealFaceSource(cfg.real_gt_file,
                                                  verbose=verbose)
        else:
            real_source = real_mod.default_source(verbose=verbose)
        if cfg.mined_file and real_source is not None:
            real_source.load_mined(cfg.mined_file, verbose=verbose)
    eye_geom = NetGeometry(Dx=8, Dy=8, Dang=0, mins=0.675, maxs=0.975,
                           subimage_width=64, subimage_height=64,
                           regression_width=64, regression_height=64)
    age_geom = NetGeometry(Dx=0, Dy=0, Dang=1.14, mins=1.14, maxs=1.14,
                           subimage_width=96, subimage_height=96,
                           regression_width=160, regression_height=160)
    nets: Dict[str, HierarchicalNetwork] = {}
    clfs: Dict[str, GaussianRegressor] = {}

    def log(msg):
        if verbose:
            print(msg, flush=True)

    def _load_reused(name, clf_names):
        nets[name] = artifacts.load_network(
            os.path.join(out_dir, name + ".npz"))
        for c in clf_names:
            clfs[c] = artifacts.load_classifier(
                os.path.join(out_dir, c + ".npz"))
        log(f"[train] {name}: reused existing artifacts")

    def _persist(name, clf_names):
        """Write artifacts as soon as a net is trained: a crash in a later
        stage must not lose finished work (stages are retrainable
        incrementally through ``reuse``)."""
        artifacts.save_network(os.path.join(out_dir, name + ".npz"),
                               nets[name])
        for c in clf_names:
            artifacts.save_classifier(os.path.join(out_dir, c + ".npz"),
                                      clfs[c], clfs[c].input_dim)

    # --- pose nets: per-iteration SPECIALISTS (see _STAGE_LAYOUT note) ----
    # xy nets sample the full grid offset envelope; angle/scale nets sample
    # NARROW positional jitter (their stages run after the PosX/PosY
    # corrections, so that is their actual input distribution).
    pose_plan = [
        ("net_pose0", (40.0, 20.0, 22.5), (1.0, 1.5), ("dx", "dy"), 0),
        ("net_pose0as", (12.0, 10.0, 22.5), (1.5, 1.0), ("ang", "scale"), 1),
        ("net_pose1", (14.0, 13.0, 21.0), (1.0, 1.5), ("dx", "dy"), 8),
        ("net_pose1as", (6.0, 6.0, 21.0), (1.5, 1.0), ("ang", "scale"), 9),
    ]
    clf_of = {"dx": "PosX", "dy": "PosY", "ang": "PAng", "scale": "Scale"}
    for name, ranges, weights, cols, kidx in pose_plan:
        it = "0" if "0" in name else "1"
        cnames = [f"clf_{clf_of[c]}{it}" for c in cols]
        if _reusable(name):
            _load_reused(name, cnames)
            continue
        log(f"[train] {name}: rendering pose walks "
            f"(dx±{ranges[0]:g} dy±{ranges[1]:g} ang±{ranges[2]:g})...")
        x, labels = datasets.pose_dataset(
            keys[kidx], cfg.num_faces, cfg.steps_per_face, face_geom,
            *ranges, real_source=real_source, real_frac=cfg.real_frac,
            contrast_normalize=cfg.contrast_normalize,
            attr_cues=cfg.attr_cues, texture_noise=cfg.texture_noise)
        net = builder.build_higsfa(64, top_dim=cfg.top_dim,
                                   node=cfg.pose_node)
        log(f"[train] {name}: fitting {len(net.specs)} layers "
            f"on {len(x)} patches")
        labk = np.stack([labels[c] for c in cols], axis=1)
        net = train_network(net, x, graph="serial", labels=labk,
                            mesh=mesh, num_groups=cfg.pose_classes, verbose=verbose,
                            label_weights=weights)
        nets[name] = net
        feats = _execute(net, x)
        for c, cname in zip(cols, cnames):
            dim = 10 if cname == "clf_PosX0" else 20
            if cfg.pose_head == "ridge":
                from pyfaceanalysis_tpu.ops.ridge import RidgeRegressor
                clfs[cname] = RidgeRegressor.fit(feats, labels[c], dim)
            else:
                clfs[cname] = fit_regressor_bins(
                    feats, labels[c], dim, cfg.pose_classes)
        _persist(name, cnames)
        log(f"[train] {name}: done")

    # --- eye net ------------------------------------------------------------
    if _reusable("net_eye"):
        _load_reused("net_eye", ["clf_EyeLX", "clf_EyeLY"])
    else:
        log("[train] net_eye: rendering eye walks...")
        x, labels = datasets.eye_dataset(keys[4], cfg.eye_faces,
                                         cfg.eye_steps, eye_geom,
                                         real_source=real_source,
                                         real_frac=cfg.real_frac,
                                         attr_cues=cfg.attr_cues,
                                         texture_noise=cfg.texture_noise)
        net = builder.build_higsfa(64, top_dim=cfg.top_dim,
                                   node=cfg.eye_node)
        lab2 = np.stack([labels["x"], labels["y"]], axis=1)
        net = train_network(net, x, graph="serial", labels=lab2,
                            mesh=mesh, num_groups=cfg.pose_classes, verbose=verbose)
        nets["net_eye"] = net
        feats = _execute(net, x)
        clfs["clf_EyeLX"] = fit_regressor_bins(feats, labels["x"], 12,
                                               cfg.pose_classes)
        clfs["clf_EyeLY"] = fit_regressor_bins(feats, labels["y"], 10,
                                               cfg.pose_classes)
        _persist("net_eye", ["clf_EyeLX", "clf_EyeLY"])
        log("[train] net_eye: done")

    # --- age/race/gender net -------------------------------------------------
    if _reusable("net_age"):
        _load_reused("net_age", ["clf_Age", "clf_Race", "clf_Gender"])
    else:
        log("[train] net_age: rendering Z-frame faces...")
        n_real_age = (int(cfg.age_samples * cfg.age_real_frac)
                      if real_source is not None else 0)
        x, labels = datasets.age_dataset(
            keys[5], cfg.age_samples - n_real_age,
            jitter_px=cfg.age_jitter_px,
            jitter_scale=cfg.age_jitter_scale, attr_cues=cfg.attr_cues,
            texture_noise=cfg.texture_noise)
        if n_real_age > 0:
            log(f"[train] net_age: + {n_real_age} real anchor Z-frames"
                + (f" (excluding {cfg.age_real_exclude})"
                   if cfg.age_real_exclude else ""))
            xr, lr = real_source.sample_age_zframes(
                cfg.seed + 17, n_real_age, exclude=cfg.age_real_exclude)
            x = jnp.concatenate([x, xr], axis=0)
            labels = {k: np.concatenate([np.asarray(labels[k]), lr[k]])
                      for k in labels}
        # Linear wiring like the reference's linearPCANetworkU11L, but
        # trained with a 3-label serial graph (age, race, gender) so the
        # shared feature space is attribute-discriminative, not merely
        # variance-preserving.
        net = builder.build_pca_net(96, top_dim=cfg.top_dim, node="sfa")
        lab3 = np.stack([labels["age"], labels["race"], labels["gender"]],
                        axis=1)
        net = train_network(net, x, graph="serial", labels=lab3,
                            mesh=mesh, num_groups=20, verbose=verbose,
                            label_weights=(2.0, 1.0, 1.0))
        nets["net_age"] = net
        feats = _execute(net, x)
        clfs["clf_Age"] = fit_regressor_bins(feats, labels["age"], 4,
                                             num_classes=39)
        clfs["clf_Race"] = fit_regressor_classes(
            feats, (labels["race"] > 0).astype(int), np.array([-2.0, 2.0]), 5)
        clfs["clf_Gender"] = fit_regressor_classes(
            feats, (labels["gender"] > 0).astype(int),
            np.array([-1.0, 1.0]), 5)
        _persist("net_age", ["clf_Age", "clf_Race", "clf_Gender"])
        log("[train] net_age: done")

    # --- discrimination nets --------------------------------------------------
    # Trained LAST: with disc_seeds set, every candidate is assembled into a
    # full pipeline (sharing the pose/eye/age nets above), calibrated and
    # scored -- see TrainConfig.disc_seeds.
    disc_names = ["net_disc"] + (["net_disc_final"] if cfg.train_final_disc
                                 else [])
    disc_clf_of = {"net_disc": "clf_Disc1", "net_disc_final": "clf_Disc9"}

    def _train_discs(key2, key3, tag=""):
        """Trains the disc nets + classifiers on the given dataset keys;
        returns ({name: net}, {cname: clf}) without touching out_dir."""
        d_nets, d_clfs = {}, {}
        dkeys = {"net_disc": key2, "net_disc_final": key3}
        for name in disc_names:
            cname = disc_clf_of[name]
            log(f"[train] {name}{tag}: rendering graded centering classes...")
            serial = cfg.disc_graph == "serial"
            out = datasets.disc_dataset(
                dkeys[name], cfg.disc_faces, cfg.disc_steps, face_geom,
                real_source=real_source, real_frac=cfg.real_frac,
                real_bg_frac=cfg.real_bg_frac,
                contrast_normalize=cfg.contrast_normalize,
                mined_frac=cfg.mined_frac, attr_cues=cfg.attr_cues,
                texture_noise=cfg.texture_noise,
                texture_noise_bg=cfg.texture_noise_bg,
                return_frac=serial)
            net = builder.build_higsfa(64, top_dim=cfg.top_dim,
                                       node=cfg.disc_node)
            if serial:
                x, cls, avg, frac = out
                net = train_network(net, x, graph="serial", labels=frac,
                                    num_groups=50, mesh=mesh,
                                    verbose=verbose)
            else:
                x, cls, avg = out
                net = train_network(net, x, graph="clustered", labels=cls,
                                    mesh=mesh, verbose=verbose)
            d_nets[name] = net
            feats = _execute(net, x)
            d_clfs[cname] = fit_regressor_classes(feats, cls, avg,
                                                  input_dim=9)
            log(f"[train] {name}{tag}: done")
        if not cfg.train_final_disc:
            d_nets["net_disc_final"] = d_nets["net_disc"]
            d_clfs["clf_Disc9"] = d_clfs["clf_Disc1"]
        return d_nets, d_clfs

    def _final_cutoff(d_nets, d_clfs):
        """Final-gate estimate from converged-residual face patches: the
        reference ships cut_offs_face tuned to ITS discriminators
        (FaceDetectUpdated.py:98); a fresh Gaussian soft-classifier has a
        different absolute output scale."""
        res = datasets.residual_dataset(
            keys[6], max(cfg.disc_faces // 2, 8), 20, face_geom,
            real_source=real_source, real_frac=cfg.real_frac,
            contrast_normalize=cfg.contrast_normalize,
            attr_cues=cfg.attr_cues, texture_noise=cfg.texture_noise)
        net9 = d_nets["net_disc_final"]
        feats = _execute(net9, res)
        clf9 = d_clfs["clf_Disc9"]
        vals = np.asarray(clf9.regression(
            jnp.asarray(feats[:, :clf9.input_dim])))
        cut = float(min(max(np.quantile(vals, 0.90) * 1.15, 0.02), 0.9))
        log(f"[train] residual disc outputs: median={np.median(vals):.3f} "
            f"q90={np.quantile(vals, 0.90):.3f} -> last_cut_off={cut:.3f}")
        return cut

    def _write_dir(dest, d_nets, d_clfs, last_cut):
        """Writes a COMPLETE pipeline directory: shared nets/clfs + the
        given disc artifacts + pipeline file + manifest."""
        os.makedirs(dest, exist_ok=True)
        for name, net in {**nets, **d_nets}.items():
            artifacts.save_network(os.path.join(dest, name + ".npz"), net)
        for name, clf in {**clfs, **d_clfs}.items():
            artifacts.save_classifier(os.path.join(dest, name + ".npz"),
                                      clf, clf.input_dim)
        stages = tuple(StageSpec(t, n, c) for t, n, c, _ in _STAGE_LAYOUT)
        spec = PipelineSpec(face_geom, eye_geom, age_geom, stages)
        write_pipeline(os.path.join(dest, "Pipeline_tpu.txt"), spec)
        artifacts.save_manifest(
            dest, face_geom, eye_geom, age_geom,
            calibration={"last_cut_off_face": last_cut,
                         "detection_contrast_normalize":
                             bool(cfg.contrast_normalize),
                         "pang_gain": float(cfg.pang_gain),
                         "pos_gain": float(cfg.pos_gain),
                         "scale_gain": float(cfg.scale_gain)})

    def _calibrate_dir(dest):
        if not cfg.calibrate:
            return
        from pyfaceanalysis_tpu.training import calibration
        log(f"[train] calibrating disc ladder + eye gate for {dest}...")
        result = calibration.calibrate_model(
            dest, scenes=cfg.calib_scenes, seed=cfg.calib_seed,
            bg_budget=cfg.calib_bg_budget,
            bg_protect=tuple(cfg.calib_bg_protect),
            anchor_small_ie=tuple(cfg.calib_anchor_small_ie),
            verbose=verbose)
        calibration.write_calibration(dest, result, verbose=verbose)

    if _reusable("net_disc"):
        _load_reused("net_disc", ["clf_Disc1"])
        if cfg.train_final_disc:
            _load_reused("net_disc_final", ["clf_Disc9"])
        else:
            nets["net_disc_final"] = nets["net_disc"]
            clfs["clf_Disc9"] = clfs["clf_Disc1"]
        _write_dir(out_dir, {}, {}, _final_cutoff(nets, clfs))
        _calibrate_dir(out_dir)
    elif cfg.disc_seeds:
        from pyfaceanalysis_tpu.training import selection
        cand_dirs, scores = [], []
        for s in cfg.disc_seeds:
            tag = f" [disc seed {s}]"
            k2 = jax.random.fold_in(keys[2], s)
            k3 = jax.random.fold_in(keys[3], s)
            d_nets, d_clfs = _train_discs(k2, k3, tag)
            cand = os.path.join(out_dir, f"_cand_disc_{s}")
            _write_dir(cand, d_nets, d_clfs, _final_cutoff(d_nets, d_clfs))
            _calibrate_dir(cand)
            log(f"[train] scoring candidate{tag} "
                f"({cfg.selection_scenes}-scene panel seed "
                f"{cfg.selection_seed} + anchors)...")
            sc = selection.score_candidate(
                cand, n_scenes=cfg.selection_scenes,
                panel_seed=cfg.selection_seed,
                anchors=(cfg.real_gt_file or "data/train_faces_gt.txt"))
            a = sc.get("anchors")
            log(f"[train] candidate{tag}: recall {sc['recall']:.4f} "
                f"FP/img {sc['fp_per_image']:.4f} anchors "
                + (f"{a['tp']}TP/{a['fp']}FP/{a['fn']}FN" if a else "-"))
            cand_dirs.append(cand)
            scores.append(sc)
        log("[train] disc-seed selection:")
        win = selection.select(scores, recall_floor=cfg.recall_floor,
                               verbose=verbose)
        if win is None:
            # every candidate misses a real face: fall back to the one
            # with the fewest anchor misses, then best panel recall.
            win = max(
                range(len(scores)),
                key=lambda i: (-scores[i].get("anchors", {}).get("fn", 9),
                               scores[i]["recall"]))
            log(f"[train] WARNING: every candidate eliminated on anchors; "
                f"falling back to least-bad candidate {win}")
        log(f"[train] selected disc seed {cfg.disc_seeds[win]} "
            f"(candidate {win}); promoting to {out_dir}")
        # TNS ship gate (campaign-7 protocol change): TNS-Group.jpg is
        # quarantined from training/mining/calibration/selection, but the
        # WINNER is measured on it so no promotion can silently trade the
        # reference's flagship demo away (campaign-4 regression mechanism).
        tns = selection.tns_gate(selection.score_tns(cand_dirs[win]))
        if tns["evaluated"]:
            r = tns["result"]
            log(f"[train] TNS ship gate on the winner: {r['tp']}TP/"
                f"{r['fp']}FP/{r['fn']}FN vs TP>={tns['min_tp']} "
                f"FP<={tns['max_fp']} -> "
                f"{'PASS' if tns['pass'] else 'FAIL'}")
            if not tns["pass"]:
                log("[train] WARNING: the selected winner FAILS the TNS "
                    "ship gate -- do NOT promote these artifacts to "
                    "production without a declared rule overriding it "
                    "(disc_selection.json carries the measurement)")
        import shutil
        for f in os.listdir(cand_dirs[win]):
            shutil.copy2(os.path.join(cand_dirs[win], f),
                         os.path.join(out_dir, f))
        with open(os.path.join(out_dir, "disc_selection.json"), "w") as f:
            import json as _json
            _json.dump({"seeds": list(cfg.disc_seeds), "scores": scores,
                        "selected": int(win),
                        "selected_seed": int(cfg.disc_seeds[win]),
                        "rule": "anchors fn==0 & tp>=3; recall>=floor -> "
                                "min fp; else max recall",
                        "recall_floor": cfg.recall_floor,
                        "tns_gate": tns}, f, indent=1)
    else:
        d_nets, d_clfs = _train_discs(keys[2], keys[3])
        nets.update(d_nets)
        clfs.update(d_clfs)
        for name in disc_names:
            _persist(name, [disc_clf_of[name]])
        _write_dir(out_dir, {}, {}, _final_cutoff(nets, clfs))
        _calibrate_dir(out_dir)
    log(f"[train] wrote pipeline artifacts to {out_dir}")
