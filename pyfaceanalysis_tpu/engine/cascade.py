"""The masked, fixed-shape detection cascade -- the framework's hot path.

Reference behavior: the per-image loop of FaceDetectUpdated.py:513-1280 runs,
for each scale, 17 cascade stages that extract patches, execute a HiGSFA
flow, regress with a Gaussian classifier, move boxes, and COMPACT the patch
arrays after every stage (dynamic shapes). TPU re-design:

- ALL scales are concatenated into ONE patch batch (the reference itself
  notes "actually all resolutions could be processed also at once",
  FaceDetectUpdated.py:600); per-scale constants (acceptance radii, base
  side) become per-patch arrays.
- "Discard" is a mask update -- shapes never change inside the jitted
  function; the batch is padded to a bucket size so XLA compiles a handful
  of shapes total.
- The stage schedule (which stages extract patches / execute networks /
  reuse features) is reconstructed from the pipeline exactly like the
  reference (skip extraction if the previous stage was Disc; skip execution
  for ``None`` networks; FaceDetectUpdated.py:676-691) and unrolled into the
  jit -- each stage is a gather + block-diagonal GEMM stack + quadratic-form
  regression, all MXU work.

Stage semantics (exact ports):
- update rules:    face_analysis.py:803-840 (PosX/PosY shift by
                   -reg*extent/regression; PAng adds; Scale rescales about
                   the center to desired_sampling 0.825)
- discard rules:   face_analysis.py:842-887 (per-type drift/cutoff tests
                   against the ORIGINAL grid box)
- Disc confidence: reg_out is "non-faceness" in [0,1]; patches with
                   reg >= cut_offs_face[serial] are discarded
                   (FaceDetectUpdated.py:669-672, :98)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyfaceanalysis_tpu.config import DESIRED_SAMPLING, DetectorConfig, NetGeometry
from pyfaceanalysis_tpu.io.pipeline import PipelineSpec
from pyfaceanalysis_tpu.models.network import apply_network
from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate


class StagePlan(NamedTuple):
    """Static per-stage schedule entry (hashable: drives jit tracing)."""

    kind: str           # Disc | PosX | PosY | PAng | Scale
    serial: int         # cut-off / interpolation index
    extract: bool       # extract patches at current boxes/angles?
    net_idx: int        # index into the network param list (-1 = reuse sl)
    clf_idx: int        # index into the classifier list
    input_dim: int      # feature truncation width for the classifier


def build_detection_plan(spec: PipelineSpec,
                         net_ids: Dict[str, int],
                         clf_input_dims: Sequence[int]) -> Tuple[StagePlan, ...]:
    """Reconstructs the extraction/execution schedule of the reference loop.

    ``net_ids`` maps network artifact names to indices in the model's network
    list; "None*" names reuse the previous stage's features.
    """
    plan: List[StagePlan] = []
    prev_kind = None
    for i, st in enumerate(spec.detection_stages):
        reuse_net = st.reuses_features
        extract = (i == 0) or (prev_kind != "Disc" and not reuse_net)
        plan.append(StagePlan(
            kind=st.kind, serial=st.serial, extract=extract,
            net_idx=-1 if reuse_net else net_ids[st.network_name],
            clf_idx=i, input_dim=int(clf_input_dims[i])))
        prev_kind = st.kind
    return tuple(plan)


class GridPyramidInfo(NamedTuple):
    """Static ladder scales + padded per-patch crop origins for the
    pyramid fast path (ops.pyramid)."""

    scales: Tuple[float, ...]
    level_hw: Tuple[int, int]
    crops: jax.Array            # (B, 3) int32 [level, y, x]


class CascadeState(NamedTuple):
    """Per-patch cascade state (all (B,) or (B, 4); fixed shapes)."""

    boxes: jax.Array        # [x0, y0, x1, y1] inclusive
    angles: jax.Array       # degrees
    mask: jax.Array         # bool: still alive
    conf: jax.Array         # last Disc output ("non-faceness")
    orig_cx: jax.Array      # original grid box center (drift reference)
    orig_cy: jax.Array
    max_dx: jax.Array       # acceptance radii (per scale -> per patch)
    max_dy: jax.Array
    base_side: jax.Array    # original box diagonal
    # Per-patch image index for fused multi-image batches ((B,) int32);
    # None on the single-image path.
    img_idx: Optional[jax.Array] = None


def compacted_rows_per_image(plan: Tuple[StagePlan, ...],
                             cfg: DetectorConfig, n_per_image: int) -> int:
    """Rows per image that survive the mid-cascade compaction schedule --
    the SINGLE source of truth for the rung targets, mirrored exactly by
    ``run_cascade``'s in-loop logic (callers of the fused batch path need
    the final per-image group size to slice the output)."""
    n = n_per_image
    seen1 = seen2 = False
    for st in plan:
        if st.kind != "Disc":
            continue
        if st.serial < 5 and not seen1 and cfg.mid_compact:
            seen1 = True
            n = min(n, cfg.mid_compact)
        elif st.serial >= 5 and not seen2 and cfg.mid_compact2:
            seen2 = True
            n = min(n, cfg.mid_compact2)
    return n


@partial(jax.jit, static_argnames=("plan", "specs_tuple", "geom", "cfg",
                                   "patch_hw", "collect_trace", "n_images",
                                   "n_per_image"))
def run_cascade(plan: Tuple[StagePlan, ...],
                specs_tuple,                 # tuple of per-network spec tuples
                geom: NetGeometry,
                cfg: DetectorConfig,
                patch_hw: Tuple[int, int],
                image: jax.Array,
                net_params,                  # tuple of per-network param lists
                clf_params,                  # tuple of GaussianRegressor
                state: CascadeState,
                pyramid=None,
                crops=None,
                pyr_scales=None,
                collect_trace: bool = False,
                n_images: int = 1,
                n_per_image: int = 0):
    """Runs all detection stages on one padded patch batch. One jit per
    (plan, bucket, image shape).

    With ``collect_trace`` the per-stage (boxes, angles, mask, conf)
    snapshots are also returned -- the data behind the reference's per-stage
    debug plot matrix (face_analysis.py:673-981); see viz.plot_cascade_trace.

    Fused multi-image mode (``n_images > 1``, requires ``state.img_idx``
    and ``n_per_image`` = real grid rows per image): one cascade program
    over the windows of ALL images -- per-stage GEMMs are B-fold wider, the
    main MXU-utilization lever for the batch serving path (SURVEY.md S7).
    ``image`` is a (B, H, W) stack; a supplied ``pyramid`` must be the
    per-image pyramids concatenated along the level axis with ``crops``
    levels pre-folded (level' = img * L + level), which keeps both Pallas
    kernels unchanged. Mid-cascade compaction is per image (each image
    keeps its own best ``mid_compact`` rows), preserving single-image
    semantics; rows stay grouped contiguously by image afterwards.
    """
    trace = []
    cut_offs = cfg.resolved_cut_offs()
    min_scale_radio = geom.mins / DESIRED_SAMPLING
    max_scale_radio = geom.maxs / DESIRED_SAMPLING

    boxes, angles, mask = state.boxes, state.angles, state.mask
    conf = state.conf
    orig_cx, orig_cy = state.orig_cx, state.orig_cy
    max_dx, max_dy, base_side = state.max_dx, state.max_dy, state.base_side
    img_idx = state.img_idx
    patches = None
    sl = None
    fired_rung1 = fired_rung2 = False
    n_per_cur = n_per_image          # rows per image (fused mode only)

    # Refinement extraction via the Pallas pyramid-gather kernel: every
    # patch keeps reading its ORIGINAL grid level (scale drift is gated to
    # 1.31x, so the box always fits the kernel's 128-texel tile). In fused
    # multi-image mode the caller pre-folds the image index into the crop
    # levels (stacked pyramid), so the kernel path needs no img_idx test.
    levels = crops[:, 0] if crops is not None else None
    if cfg.pallas_refine == "off" or pyramid is None or (
            img_idx is not None and n_images <= 1):
        pallas_mode = None
    elif cfg.pallas_refine == "auto":
        pallas_mode = (False if jax.default_backend() == "tpu" else None)
    else:  # "on" -> compiled, "interpret" -> interpreter (CPU tests)
        pallas_mode = (cfg.pallas_refine == "interpret")
    if pallas_mode is not None:
        lh_, lw_ = pyramid.shape[1:]
        if lh_ < 128 or lw_ < 256 or lh_ % 8 or lw_ % 128:
            pallas_mode = None  # unaligned external pyramid: XLA gather path

    for si, st in enumerate(plan):
        if st.extract:
            interp = cfg.interpolation_formats[st.serial]
            if si == 0 and pyramid is not None:
                # Iter-0 grid: contiguous crops from the scale pyramid.
                # Pallas kernel (DMA + dynamic rolls) when available: the
                # vmapped dynamic_slice lowers to a sequential while loop
                # costing ~6 ms/image at 2048 windows (ops.pallas_crop).
                if pallas_mode is not None:
                    from pyfaceanalysis_tpu.ops.pallas_crop import (
                        crop_patches_pallas,
                    )
                    patches = crop_patches_pallas(pyramid, crops, patch_hw,
                                                  interpret=pallas_mode)
                else:
                    from pyfaceanalysis_tpu.ops.pyramid import crop_patches
                    patches = crop_patches(pyramid, crops, patch_hw)
            elif pallas_mode is not None and interp in ("nearest",
                                                        "bilinear"):
                from pyfaceanalysis_tpu.ops.pallas_gather import (
                    sample_patches_pyramid,
                )
                patches = sample_patches_pyramid(
                    pyramid, pyr_scales, levels, boxes, angles, patch_hw,
                    method=interp, interpret=pallas_mode)
            else:
                patches = extract_patches_rotate(image, boxes, angles,
                                                 patch_hw, method=interp,
                                                 image_idx=img_idx)
            patches = patches.reshape(patches.shape[0], -1)
            if cfg.detection_contrast_normalize:
                # load_network_subimages(contrast_normalize=True) semantics
                # (face_analysis.py:793): mean 137.5 / std 0.4*255 in
                # [0, 255] units; our pixels are [0, 1].
                from pyfaceanalysis_tpu.ops.contrast import (
                    contrast_normalize_avg_std,
                )
                patches = contrast_normalize_avg_std(
                    patches * 255.0, 137.5, 0.40 * 255.0) / 255.0
        if st.net_idx >= 0:
            sl = apply_network(specs_tuple[st.net_idx],
                               net_params[st.net_idx], patches,
                               compute_dtype=(jnp.bfloat16
                                              if cfg.matmul_dtype == "bf16"
                                              else None))
        clf = clf_params[st.clf_idx]
        reg = clf.regression(sl[:, :st.input_dim])

        if st.kind == "Disc":
            conf = jnp.where(mask, reg, conf)
            mask = mask & (reg < cut_offs[st.serial])
            # Mid-cascade device compaction: Disc gates kill most windows;
            # shrink the batch so the remaining extraction rounds (the
            # dominant device cost, ~8 us/patch in the Pallas sampler) and
            # network executions run on a fraction of the grid. Two rungs:
            # after the FIRST Disc gate (kills ~60% of the grid) and again
            # after Disc5 (~100-150 alive on the canonical photo), sized by
            # cfg.mid_compact / cfg.mid_compact2. Survivors are ranked
            # (alive first, then best confidence).
            # Rungs are selected by stage serial, not by how many have
            # already run (ADVICE r2: gating rung 2 on "rung 1 fired"
            # meant mid_compact=0 silently disabled mid_compact2 too).
            target = 0
            if st.serial < 5 and not fired_rung1 and cfg.mid_compact:
                target, fired_rung1 = cfg.mid_compact, True
            elif st.serial >= 5 and not fired_rung2 and cfg.mid_compact2:
                target, fired_rung2 = cfg.mid_compact2, True
            fused = n_images > 1 and img_idx is not None
            cur_rows = n_per_cur if fused else mask.shape[0]
            if (target and not collect_trace and target < cur_rows):
                rank = jnp.where(mask, jnp.clip(conf, 0.0, 1.999), 2.0)
                if fused:
                    # Per-image rung: rows are grouped contiguously by
                    # image (n_per_cur each; padding carries the img_idx
                    # sentinel n_images, sorting last), so one composite-
                    # key sort yields each image's rows in a contiguous
                    # sorted block of exactly n_per_cur entries.
                    order = jnp.argsort(rank +
                                        4.0 * img_idx.astype(jnp.float32))
                    idx = jnp.concatenate(
                        [order[b * n_per_cur: b * n_per_cur + target]
                         for b in range(n_images)])
                    n_per_cur = target
                else:
                    idx = jnp.argsort(rank)[: target]
                boxes, angles, mask, conf = (boxes[idx], angles[idx],
                                             mask[idx], conf[idx])
                orig_cx, orig_cy = orig_cx[idx], orig_cy[idx]
                max_dx, max_dy = max_dx[idx], max_dy[idx]
                base_side = base_side[idx]
                patches = patches[idx]
                if img_idx is not None:
                    img_idx = img_idx[idx]
                if levels is not None:
                    levels = levels[idx]
                if sl is not None:
                    sl = sl[idx]
        elif st.kind == "PosX":
            width = boxes[:, 2] - boxes[:, 0]
            shift = (cfg.resolved_pos_gain() * reg * width
                     / geom.regression_width)
            boxes = boxes.at[:, 0].add(-shift).at[:, 2].add(-shift)
            drift = (boxes[:, 0] + boxes[:, 2]) / 2.0 - orig_cx
            mask = mask & (jnp.abs(drift) <=
                           max_dx * cfg.tolerance_posxy_deviation)
        elif st.kind == "PosY":
            height = boxes[:, 3] - boxes[:, 1]
            shift = (cfg.resolved_pos_gain() * reg * height
                     / geom.regression_height)
            boxes = boxes.at[:, 1].add(-shift).at[:, 3].add(-shift)
            drift = (boxes[:, 1] + boxes[:, 3]) / 2.0 - orig_cy
            mask = mask & (jnp.abs(drift) <=
                           max_dy * cfg.tolerance_posxy_deviation)
        elif st.kind == "PAng":
            # pang_gain 1.0 = reference parity (face_analysis.py:825-827);
            # < 1 damps the angle step. On real photographs the angle
            # regressor is the weakest-transfer stage and a saturated wrong
            # estimate rotates every later extraction into a Disc kill;
            # damping trades convergence speed (3 PAng stages still reach
            # ~88% of a correct estimate at gain 0.5) for blunder damage.
            angles = angles + cfg.resolved_pang_gain() * reg
            mask = mask & (jnp.abs(angles) <=
                           geom.Dang * cfg.tolerance_angle_deviation)
        elif st.kind == "Scale":
            w = boxes[:, 2] - boxes[:, 0]
            h = boxes[:, 3] - boxes[:, 1]
            cx = (boxes[:, 2] + boxes[:, 0]) / 2.0
            cy = (boxes[:, 3] + boxes[:, 1]) / 2.0
            # reg is a convex combination of positive sampling labels; the
            # floor only guards degenerate classifiers.
            safe = jnp.maximum(reg, 1e-3)
            # scale_gain damps the step in log space: factor^gain keeps the
            # no-op (reg == DESIRED_SAMPLING -> factor 1) fixed.
            factor = (DESIRED_SAMPLING / safe) ** cfg.resolved_scale_gain()
            nw = w * factor
            nh = h * factor
            boxes = jnp.stack([cx - nw / 2, cy - nh / 2,
                               cx + nw / 2, cy + nh / 2], axis=1)
            side = jnp.sqrt(nw ** 2 + nh ** 2)
            ratio = side / base_side
            mask = mask & (ratio <= max_scale_radio *
                           cfg.tolerance_scale_deviation)
            mask = mask & (ratio >= min_scale_radio /
                           cfg.tolerance_scale_deviation)
        else:
            raise ValueError(f"unknown stage kind {st.kind}")

        if collect_trace:
            trace.append((boxes, angles, mask, conf))

    out = CascadeState(boxes, angles, mask, conf, orig_cx, orig_cy,
                       max_dx, max_dy, base_side, img_idx)
    if collect_trace:
        return out, tuple(trace)
    return out


def make_grid_state(im_width: int, im_height: int, geom: NetGeometry,
                    cfg: DetectorConfig,
                    track: Optional[Tuple] = None
                    ) -> Tuple[CascadeState, int, "GridPyramidInfo"]:
    """Builds the concatenated all-scales grid, padded to the smallest
    configured bucket size (so XLA compiles a handful of batch shapes).

    Returns (state, n_real). Mirrors the per-scale loop prologue
    (FaceDetectUpdated.py:592-624) with per-scale constants broadcast to
    per-patch arrays.
    """
    from pyfaceanalysis_tpu.config import bucket_size
    from pyfaceanalysis_tpu.engine import grid as gridmod

    face_found = track is not None
    samplings = gridmod.compute_sampling_values(
        im_width, im_height, geom, cfg.smallest_face,
        cfg.patch_overlap_sampling, cfg.adaptive_grid_scale,
        cfg.track_single_face, face_found, track)

    sw = geom.subimage_width
    sh = geom.subimage_height
    all_boxes, all_mdx, all_mdy, all_base, all_crops = [], [], [], [], []
    for k, s in enumerate(samplings):
        posX, posY, pw, ph, mdx, mdy = gridmod.compute_posX_posY_values(
            im_width, im_height, geom, s, cfg.patch_overlap_posx_posy,
            cfg.track_single_face, face_found, track)
        # Snap grid origins to integer LEVEL pixels (scale s) so iter-0
        # patches are contiguous pyramid crops (ops.pyramid); jitter is at
        # most half a patch pixel, well inside the grid overlap.
        lx = np.round(np.asarray(posX) / s).astype(np.int64)
        ly = np.round(np.asarray(posY) / s).astype(np.int64)
        posX = lx * s
        posY = ly * s
        boxes = gridmod.compute_subimage_coordinates(posX, posY, pw, ph)
        n = len(boxes)
        gx, gy = np.meshgrid(lx, ly)
        all_crops.append(np.stack([np.full(n, k), gy.reshape(-1),
                                   gx.reshape(-1)], axis=1))
        all_boxes.append(boxes)
        all_mdx.append(np.full(n, mdx))
        all_mdy.append(np.full(n, mdy))
        all_base.append(np.full(n, np.sqrt(pw ** 2 + ph ** 2)))

    boxes = np.concatenate(all_boxes, axis=0) if all_boxes else np.zeros((0, 4))
    n_real = len(boxes)
    total = bucket_size(max(n_real, 1), cfg.bucket_sizes)

    def padded(a, fill=0.0):
        out = np.full((total,) + a.shape[1:], fill, a.dtype)
        out[:n_real] = a
        return out

    boxes_p = padded(boxes.astype(np.float32), fill=1.0)
    state = CascadeState(
        boxes=jnp.asarray(boxes_p),
        angles=jnp.zeros(total, jnp.float32),
        mask=jnp.asarray(np.arange(total) < n_real),
        conf=jnp.ones(total, jnp.float32),
        orig_cx=jnp.asarray((boxes_p[:, 0] + boxes_p[:, 2]) / 2.0),
        orig_cy=jnp.asarray((boxes_p[:, 1] + boxes_p[:, 3]) / 2.0),
        max_dx=jnp.asarray(padded(np.concatenate(all_mdx).astype(np.float32))
                           if all_mdx else np.zeros(total, np.float32)),
        max_dy=jnp.asarray(padded(np.concatenate(all_mdy).astype(np.float32))
                           if all_mdy else np.zeros(total, np.float32)),
        base_side=jnp.asarray(padded(
            np.concatenate(all_base).astype(np.float32), fill=1.0)
            if all_base else np.ones(total, np.float32)),
    )

    pyr = None
    if samplings:
        # A NATIVE-resolution level (scale 1.0) is appended after the
        # detection ladder: eye boxes sample the image at EYE_SAMPLING
        # pitch, and routing them through the pyramid kernel (with
        # per-box level selection, engine.eyes) needs full detail for
        # upsampled (small) eye boxes. Nearest at scale 1.0 reproduces the
        # image exactly, so this is bit-identical for those boxes.
        s0 = min(min(samplings), 1.0)
        # Levels must fit at least one patch (large tracking scales can
        # shrink the level below the crop size; the excess is zero-padded)
        # and one Pallas gather tile, on the (8, 128) HBM tiling grid
        # (ops.pallas_gather: lh >= 128 & %8, lw >= 256 & %128).
        lh = max(int(np.ceil(im_height / s0)) + 2, sh + 2, 128)
        lw = max(int(np.ceil(im_width / s0)) + 2, sw + 2, 256)
        lh = -(-lh // 8) * 8
        lw = -(-lw // 128) * 128
        crops_real = np.concatenate(all_crops, axis=0).astype(np.int32)
        # Tracking-mode grids can place crop origins outside the level;
        # crop_patches uses lax.dynamic_slice whose CLAMPED start would
        # silently shift the patch content off the cascade-state box. Fall
        # back to the rotated gather (zero-fill keeps alignment) whenever
        # any origin is out of [0, level - patch].
        if ((crops_real[:, 1] < 0).any() or (crops_real[:, 2] < 0).any()
                or (crops_real[:, 1] > lh - sh).any()
                or (crops_real[:, 2] > lw - sw).any()):
            return state, n_real, None
        crops = padded(crops_real)
        pyr = GridPyramidInfo(tuple(float(s) for s in samplings) + (1.0,),
                              (lh, lw), jnp.asarray(crops))
    return state, n_real, pyr


def make_batched_grid_state(im_width: int, im_height: int, geom: NetGeometry,
                            cfg: DetectorConfig, n_images: int
                            ) -> Tuple[CascadeState, int,
                                       Optional[GridPyramidInfo]]:
    """Grid state for the FUSED multi-image cascade: the single-image grid
    tiled ``n_images`` times (contiguous per-image blocks) with a per-row
    image index, padded to a bucket. Padding rows carry the img_idx
    SENTINEL ``n_images`` so per-image compaction sorts them last
    (run_cascade fused mode).

    Returns ``(state, n_real_per_image, pyr)`` where ``pyr.crops`` levels
    are image-folded (level' = img * L + level) for the stacked pyramid
    (per-image pyramids concatenated along the level axis) and
    ``pyr.scales`` is the single-image ladder (callers tile it).
    """
    from pyfaceanalysis_tpu.config import bucket_size

    state, n_real, pyr = make_grid_state(im_width, im_height, geom, cfg)
    if n_real == 0:
        return state, n_real, pyr
    # n_images == 1 still goes through the tiling below: the fused cascade
    # requires a per-row img_idx (the single-image state carries None),
    # and 1-image batches DO reach the fused path -- e.g. the tail chunk
    # of a detect_batch split at max_fused_batch (round-4 regression).
    total = bucket_size(n_images * n_real, cfg.bucket_sizes)

    def tile_pad(a, fill):
        a = np.asarray(a)[:n_real]
        real = np.concatenate([a] * n_images, axis=0)
        out = np.full((total,) + a.shape[1:], fill, a.dtype)
        out[: len(real)] = real
        return jnp.asarray(out)

    img_idx = np.full(total, n_images, np.int32)
    img_idx[: n_images * n_real] = np.repeat(
        np.arange(n_images, dtype=np.int32), n_real)
    mask = np.zeros(total, bool)
    mask[: n_images * n_real] = True

    batched = CascadeState(
        boxes=tile_pad(state.boxes, 1.0),
        angles=jnp.zeros(total, jnp.float32),
        mask=jnp.asarray(mask),
        conf=jnp.ones(total, jnp.float32),
        orig_cx=tile_pad(state.orig_cx, 1.0),
        orig_cy=tile_pad(state.orig_cy, 1.0),
        max_dx=tile_pad(state.max_dx, 0.0),
        max_dy=tile_pad(state.max_dy, 0.0),
        base_side=tile_pad(state.base_side, 1.0),
        img_idx=jnp.asarray(img_idx),
    )
    if pyr is None:
        return batched, n_real, None
    L = len(pyr.scales)
    crops = np.asarray(pyr.crops)[:n_real]
    folded = np.concatenate(
        [crops + np.array([b * L, 0, 0], np.int32) for b in range(n_images)],
        axis=0)
    crops_p = np.zeros((total, 3), np.int32)
    crops_p[: len(folded)] = folded
    return batched, n_real, GridPyramidInfo(pyr.scales, pyr.level_hw,
                                            jnp.asarray(crops_p))
