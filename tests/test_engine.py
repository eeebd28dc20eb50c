"""Tests for the cascade engine: plan construction, update/discard semantics,
NMS purge, eye-label roundtrip, normalization geometry."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pyfaceanalysis_tpu import normalization
from pyfaceanalysis_tpu.config import DESIRED_SAMPLING, DetectorConfig, EYE_SAMPLING, NetGeometry
from pyfaceanalysis_tpu.engine import cascade as cascade_mod
from pyfaceanalysis_tpu.engine import nms as nms_mod
from pyfaceanalysis_tpu.io.pipeline import parse_pipeline
from pyfaceanalysis_tpu.models.expansion import Expansion
from pyfaceanalysis_tpu.models.network import LayerSpec
from pyfaceanalysis_tpu.models.sfa import LinearNode
from pyfaceanalysis_tpu.ops.gaussian import GaussianRegressor

from conftest import REFERENCE_DIR, reference_available


def _const_classifier(value: float, dim: int = 4) -> GaussianRegressor:
    """Single-class regressor: regression() returns ``value`` everywhere."""
    return GaussianRegressor.create(
        means=np.zeros((1, dim)), inv_covs=np.eye(dim)[None],
        sqrt_det_covs=np.ones(1), priors=np.ones(1),
        avg_labels=np.array([value]))


def _identity_net(dim: int = 4):
    """One-layer network whose output = first ``dim`` pixels (zero-mean)."""
    spec = LayerSpec((tuple(range(dim)),), Expansion("identity"), dim)
    node = LinearNode(jnp.zeros((1, dim)), jnp.eye(dim)[None])
    return (spec,), (node,)


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
class TestPlanFromReferencePipeline:
    """The extraction/execution schedule must match the reference's skip
    rules (FaceDetectUpdated.py:676-691) on its own pipeline file."""

    def _plan(self):
        spec = parse_pipeline(os.path.join(
            REFERENCE_DIR, "Pipelines", "Pipeline_experimental.txt"))
        names = []
        for st in spec.detection_stages:
            if not st.reuses_features and st.network_name not in names:
                names.append(st.network_name)
        ids = {n: i for i, n in enumerate(names)}
        return spec, cascade_mod.build_detection_plan(
            spec, ids, [9] * len(spec.detection_stages))

    def test_extraction_schedule(self):
        spec, plan = self._plan()
        extracts = [st.extract for st in plan]
        # Patches are re-extracted exactly at Disc1, Disc3, Disc5, Disc7
        # (positions 0, 5, 10, 15); PosX* reuse the Disc patches; Disc9
        # reuses Disc7's patches.
        expected = [i in (0, 5, 10, 15) for i in range(17)]
        assert extracts == expected

    def test_execution_schedule(self):
        spec, plan = self._plan()
        executes = [st.net_idx >= 0 for st in plan]
        # Networks run at every Disc and every PosX (new flow), and are
        # reused by PosY/PAng/Scale ("None0" stages).
        expected = [True, True, False, False, False] * 3 + [True, True]
        assert executes == expected

    def test_distinct_network_count(self):
        spec, plan = self._plan()
        # FaceCentering, pose-iter0, pose-iter1, final FaceCentering.
        assert len({st.net_idx for st in plan if st.net_idx >= 0}) == 4


class TestCascadeSemantics:
    """Update/discard rules vs hand-computed values
    (face_analysis.py:803-952)."""

    geom = NetGeometry()
    cfg = DetectorConfig(bucket_sizes=(8,))

    def _run(self, kind, serial, reg_value, boxes, angles=None, state_kw=None):
        specs, params = _identity_net()
        plan = (cascade_mod.StagePlan(kind, serial, True, 0, 0, 4),)
        n = len(boxes)
        boxes = np.asarray(boxes, np.float32)
        angles = np.zeros(n, np.float32) if angles is None else \
            np.asarray(angles, np.float32)
        kw = dict(
            boxes=jnp.asarray(boxes), angles=jnp.asarray(angles),
            mask=jnp.ones(n, bool), conf=jnp.ones(n, jnp.float32),
            orig_cx=jnp.asarray((boxes[:, 0] + boxes[:, 2]) / 2),
            orig_cy=jnp.asarray((boxes[:, 1] + boxes[:, 3]) / 2),
            max_dx=jnp.full(n, 12.5), max_dy=jnp.full(n, 6.25),
            base_side=jnp.asarray(np.hypot(boxes[:, 2] - boxes[:, 0] + 1,
                                           boxes[:, 3] - boxes[:, 1] + 1)))
        if state_kw:
            kw.update(state_kw)
        state = cascade_mod.CascadeState(**kw)
        image = jnp.zeros((128, 128))
        out = cascade_mod.run_cascade(
            plan, (specs,), self.geom, self.cfg, (64, 64), image,
            ((params[0],),), (_const_classifier(reg_value),), state)
        return out

    def test_posx_shift(self):
        # reg=8 on a 40-wide box (w = x1-x0 = 39): shift = 8 * 39/128.
        out = self._run("PosX", 0, 8.0, [[10, 10, 49, 49]])
        shift = 8.0 * 39.0 / 128.0
        np.testing.assert_allclose(np.asarray(out.boxes)[0, 0], 10 - shift,
                                   rtol=1e-5)
        assert bool(out.mask[0])      # drift 2.4 < 12.5 * 1.1

    def test_posx_drift_discard(self):
        out = self._run("PosX", 0, 50.0, [[10, 10, 49, 49]])
        assert not bool(out.mask[0])  # drift 15.2 > 12.5 * 1.1

    def test_posy_shift(self):
        out = self._run("PosY", 0, -4.0, [[10, 10, 49, 49]])
        shift = -4.0 * 39.0 / 128.0
        np.testing.assert_allclose(np.asarray(out.boxes)[0, 1], 10 - shift,
                                   rtol=1e-5)

    def test_pang_update_and_discard(self):
        out = self._run("PAng", 0, 5.0, [[10, 10, 49, 49]])
        np.testing.assert_allclose(np.asarray(out.angles)[0], 5.0)
        assert bool(out.mask[0])
        out = self._run("PAng", 0, 30.0, [[10, 10, 49, 49]])
        assert not bool(out.mask[0])  # 30 > 22.5 * 1.1

    def test_scale_rescales_about_center(self):
        out = self._run("Scale", 0, DESIRED_SAMPLING, [[10, 10, 49, 49]])
        b = np.asarray(out.boxes)[0]
        np.testing.assert_allclose((b[0] + b[2]) / 2, 29.5, rtol=1e-5)
        np.testing.assert_allclose(b[2] - b[0], 39.0, rtol=1e-5)
        assert bool(out.mask[0])

    def test_scale_out_of_envelope_discard(self):
        # reg far below the envelope => box blows up => ratio > max.
        out = self._run("Scale", 0, 0.4, [[10, 10, 49, 49]])
        assert not bool(out.mask[0])

    def test_disc_cutoff_and_confidence(self):
        cut = self.cfg.resolved_cut_offs()[1]   # serial 1 -> 0.95
        out = self._run("Disc", 1, 0.5, [[10, 10, 49, 49]])
        assert bool(out.mask[0])
        np.testing.assert_allclose(np.asarray(out.conf)[0], 0.5, rtol=1e-5)
        out = self._run("Disc", 1, cut + 0.01, [[10, 10, 49, 49]])
        assert not bool(out.mask[0])


class TestGridState:
    def test_all_scales_concatenated(self):
        geom = NetGeometry()
        cfg = DetectorConfig(smallest_face=0.2, bucket_sizes=(64, 256, 1024,
                                                              4096, 16384))
        state, n, pyr = cascade_mod.make_grid_state(400, 300, geom, cfg)
        assert n > 0
        assert state.boxes.shape[0] >= n
        assert bool(state.mask[0]) and not bool(state.mask[-1])
        # Per-patch acceptance radii vary across scales.
        mdx = np.asarray(state.max_dx)[:n]
        assert len(np.unique(np.round(mdx, 3))) > 1


class TestNMS:
    def test_purge_keeps_distinct(self):
        rows = np.array([
            [0, 0, 40, 40, 0, 10, 10, 30, 10, 0.1],
            [1, 1, 41, 41, 0, 11, 10, 31, 10, 0.2],    # same face
            [100, 100, 140, 140, 0, 110, 110, 130, 110, 0.15],
        ])
        kept = nms_mod.purge_detections(rows)
        assert len(kept) == 2

    def test_purge_orders_by_weighted_confidence(self):
        rows = np.array([
            [0, 0, 40, 40, 0, 10, 10, 30, 10, 0.9],     # bad conf
            [100, 100, 140, 140, 0, 110, 110, 130, 110, 0.05],
        ])
        kept = nms_mod.purge_detections(rows)
        assert kept[0][9] == 0.05

    def test_single_row_passthrough(self):
        rows = np.array([[0, 0, 40, 40, 0, 10, 10, 30, 10, 0.5]])
        kept = nms_mod.purge_detections(rows)
        assert len(kept) == 1


class TestNormalizationGeometry:
    def test_z_frame_eye_positions(self):
        # Any upright face: eyes must land at x = 127.5 -+ 37.5, y = 129.5 -
        # 42.568 in the (256, 260) Z frame.
        coords = (200.0, 300.0, 274.0, 300.0, 0.0, 0.0)   # dist 74
        fp = normalization.frame_params(
            coords, "eyes_inferred-mouth_areaZ", "mid_eyes_inferred-mouth",
            "EyeLineRotation", out_size=(256, 260))
        def to_out(px, py):
            rad = np.deg2rad(fp.angle_deg)
            c, s = np.cos(rad), np.sin(rad)
            dx, dy = px - fp.center_x, py - fp.center_y
            u = (c * dx + s * dy) / fp.sf
            v = (-s * dx + c * dy) / fp.sf
            return u + 255 / 2.0, v + 259 / 2.0
        ex, ey = to_out(200.0, 300.0)
        np.testing.assert_allclose(ex, 127.5 - 37.5, atol=1e-6)
        np.testing.assert_allclose(ey, 129.5 - 2 * 42.0 / 2 * 37.5 / 37.0,
                                   atol=1e-6)

    def test_rotated_face_same_out_positions(self):
        # Rotate the whole face 20 deg: output positions must not change.
        ang = np.deg2rad(20)
        c, s = np.cos(ang), np.sin(ang)
        cx, cy = 150.0, 150.0
        el = np.array([cx + c * (-37), cy + s * (-37)])
        er = np.array([cx + c * 37, cy + s * 37])
        coords = (*el, *er, 0.0, 0.0)
        fp = normalization.frame_params(
            coords, "eyes_inferred-mouth_areaZ", "mid_eyes_inferred-mouth",
            "EyeLineRotation", out_size=(256, 260))
        rad = np.deg2rad(fp.angle_deg)
        cc, ss = np.cos(rad), np.sin(rad)
        dx, dy = el[0] - fp.center_x, el[1] - fp.center_y
        u = (cc * dx + ss * dy) / fp.sf
        np.testing.assert_allclose(u + 127.5, 127.5 - 37.5, atol=1e-4)

    def test_sample_frame_marks(self):
        # A bright pixel at the left eye must appear near (90, 86.9) in Z.
        img = np.zeros((400, 400), np.float32)
        el, er = (160, 200), (234, 200)
        img[el[1], el[0]] = 1.0
        coords = (*el, *er, 0.0, 0.0)
        out = normalization.normalize_image(
            img, coords, "eyes_inferred-mouth_areaZ",
            "mid_eyes_inferred-mouth", "EyeLineRotation",
            out_size=(256, 260))
        assert out.shape == (260, 256)
        yy, xx = np.unravel_index(np.argmax(out), out.shape)
        assert abs(xx - 90.0) < 2.0
        assert abs(yy - 86.93) < 2.0

    def test_random_background_fills_edge_crops(self):
        """A face near the frame edge: background='zero' leaves black
        out-of-frame bands, background='random' fills them with noise and
        keeps in-frame pixels identical (reference
        im_transform_randombackground, face_normalization_tools.py:53,316)."""
        img = np.full((120, 120), 0.5, np.float32)
        # eyes near the left edge -> the crop window leaves the frame
        coords = (8.0, 60.0, 45.0, 60.0, 26.5, 102.0)
        rng = np.random.RandomState(7)
        out_z = normalization.normalize_image(
            img, coords, "eyes_mouth_area", "mid_eyes_mouth",
            out_size=(128, 128), background="zero")
        out_r = normalization.normalize_image(
            img, coords, "eyes_mouth_area", "mid_eyes_mouth",
            out_size=(128, 128), rng=rng, background="random")
        # source is constant 0.5: fully-in-frame pixels are exactly 0.5,
        # fully-out pixels exactly 0, a thin bilinear blend ring between.
        oob = out_z == 0.0
        inb = out_z == 0.5
        assert oob.any()                       # edge face -> black band
        assert (out_r[oob] > 0).mean() > 0.9   # noise fill, not black
        assert out_r[oob].std() > 0.2          # uniform noise, not constant
        np.testing.assert_allclose(out_r[inb], out_z[inb], atol=1e-6)

    def test_eyer_mode_mirrors(self):
        img = np.random.RandomState(0).rand(100, 100).astype(np.float32)
        coords = (30.0, 50.0, 67.0, 50.0, 48.5, 92.0)
        out_l = normalization.normalize_image(img, coords, "eyes_mouth_area",
                                              "eyeL", out_size=(64, 64))
        out_r = normalization.normalize_image(img, coords, "eyes_mouth_area",
                                              "eyeR", out_size=(64, 64))
        assert out_l.shape == out_r.shape == (64, 64)
        assert not np.allclose(out_l, out_r)


class TestEyeLabelRoundtrip:
    def test_dataset_label_inverts_apply(self):
        """The eye-dataset label convention must invert engine.eyes' box
        update: applying the regression to the jittered box must recover the
        true eye position."""
        rng = np.random.RandomState(0)
        for _ in range(20):
            eye = rng.uniform(40, 80, 2)
            box_w = rng.uniform(30, 50)
            ang = rng.uniform(-10, 10)
            lab = rng.uniform(-9, 9, 2)
            # dataset: box_center = eye + R(-ang) . (lab/2.3719 * box_w/64)
            off = lab / EYE_SAMPLING * box_w / 64.0
            rad = np.deg2rad(-ang)
            c, s = np.cos(rad), np.sin(rad)
            center = eye + np.array([c * off[0] - s * off[1],
                                     s * off[0] + c * off[1]])
            # engine.eyes: dx = R(-ang) . (reg/2.3719 * box_w/64); box -= dx
            dx = c * off[0] - s * off[1]
            dy = s * off[0] + c * off[1]
            new_center = center - np.array([dx, dy])
            np.testing.assert_allclose(new_center, eye, atol=1e-9)
