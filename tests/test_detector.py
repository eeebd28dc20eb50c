"""End-to-end detector tests on random-weight artifacts (plumbing: artifact
loading, grid, cascade, eyes, NMS, heads, CLI writer). Detection *quality*
is covered by the slow trained-pipeline test in test_trained_pipeline.py."""

import dataclasses
import os

import numpy as np
import pytest

from pyfaceanalysis_tpu.config import DetectorConfig, NetGeometry
from pyfaceanalysis_tpu.io import artifacts
from pyfaceanalysis_tpu.io.pipeline import PipelineSpec, StageSpec, write_pipeline
from pyfaceanalysis_tpu.models import builder
from pyfaceanalysis_tpu.models.init import random_classifier, random_network_params
from pyfaceanalysis_tpu.training.trainer import _STAGE_LAYOUT


@pytest.fixture(scope="session")
def random_artifact_dir(tmp_path_factory):
    """A full 22-stage artifact directory with random weights (no training);
    small 32x32 networks keep CPU compile times low."""
    out = str(tmp_path_factory.mktemp("artifacts"))
    side = 32
    nets = {
        "net_disc": builder.build_higsfa(side, d=6, top_dim=20),
        "net_disc_final": builder.build_higsfa(side, d=6, top_dim=20),
        "net_pose0": builder.build_higsfa(side, d=6, top_dim=20),
        "net_pose0as": builder.build_higsfa(side, d=6, top_dim=20),
        "net_pose1": builder.build_higsfa(side, d=6, top_dim=20),
        "net_pose1as": builder.build_higsfa(side, d=6, top_dim=20),
        "net_eye": builder.build_higsfa(side, d=6, top_dim=20),
        "net_age": builder.build_pca_net(96, d=6, top_dim=20),
    }
    for i, (name, net) in enumerate(nets.items()):
        artifacts.save_network(os.path.join(out, name + ".npz"),
                               random_network_params(net, seed=i))
    ranges = {"Disc": (0, 1), "PosX": (-5, 5), "PosY": (-5, 5),
              "PAng": (-10, 10), "Scale": (0.75, 0.9), "EyeLX": (-5, 5),
              "EyeLY": (-5, 5), "Age": (16, 58), "Race": (-2, 2),
              "Gender": (-1, 1)}
    seen = set()
    for i, (t, n, c, dim) in enumerate(_STAGE_LAYOUT):
        if c in seen:
            continue
        seen.add(c)
        kind = t if t in ranges else t[:-1]
        lo, hi = ranges[kind]
        clf = random_classifier(dim, 4, lo, hi, seed=i)
        artifacts.save_classifier(os.path.join(out, c + ".npz"), clf, dim)
    face_geom = NetGeometry(subimage_width=side, subimage_height=side)
    eye_geom = NetGeometry(Dx=8, Dy=8, Dang=0, mins=0.675, maxs=0.975,
                           subimage_width=side, subimage_height=side,
                           regression_width=64, regression_height=64)
    age_geom = NetGeometry(Dx=0, Dy=0, mins=1.14, maxs=1.14,
                           subimage_width=96, subimage_height=96,
                           regression_width=160, regression_height=160)
    stages = tuple(StageSpec(t, n, c) for t, n, c, _ in _STAGE_LAYOUT)
    write_pipeline(os.path.join(out, "Pipeline_tpu.txt"),
                   PipelineSpec(face_geom, eye_geom, age_geom, stages))
    artifacts.save_manifest(out, face_geom, eye_geom, age_geom)
    return out


@pytest.fixture(scope="session")
def loaded_model(random_artifact_dir):
    from pyfaceanalysis_tpu.engine.detector import DetectionModel
    return DetectionModel.load(random_artifact_dir)


class TestModelLoading:
    def test_load(self, loaded_model):
        assert len(loaded_model.classifiers) == 22
        assert len(loaded_model.plan) == 17
        assert loaded_model.clf_input_dim("Age") == 4
        assert loaded_model.clf_input_dim("EyeLX") == 12

    def test_feature_sharing_layout(self, loaded_model):
        # 6 distinct detection networks (disc, disc_final, and the four
        # specialist pose nets: xy + angle/scale per iteration).
        assert len(loaded_model.det_net_names) == 6


class TestCalibrationResolution:
    def test_manifest_ladder_resolved(self, random_artifact_dir):
        """A calibrated cut_offs_face ladder in the manifest is adopted
        unless the user set one explicitly (tools/calibrate_ladder.py)."""
        import json

        from pyfaceanalysis_tpu.config import REFERENCE_CUT_OFFS_FACE
        from pyfaceanalysis_tpu.engine.detector import (DetectionModel,
                                                        FaceDetector)
        path = os.path.join(random_artifact_dir, "manifest.json")
        with open(path) as f:
            manifest = json.load(f)
        ladder = [0.99, 0.97, 0.85, 0.9, 0.7, 0.75, 0.5, 0.6, 0.1, 0.3]
        manifest.setdefault("calibration", {})["cut_offs_face"] = ladder
        with open(path, "w") as f:
            json.dump(manifest, f)
        try:
            model = DetectionModel.load(random_artifact_dir)
            det = FaceDetector(model, DetectorConfig())
            assert det.config.resolved_cut_offs() == tuple(ladder)
            # explicit user ladder wins
            det2 = FaceDetector(model, DetectorConfig(
                cut_offs_face=REFERENCE_CUT_OFFS_FACE))
            assert det2.config.resolved_cut_offs() == REFERENCE_CUT_OFFS_FACE
        finally:
            manifest["calibration"].pop("cut_offs_face")
            with open(path, "w") as f:
                json.dump(manifest, f)

    def test_manifest_gains_and_eye_tol_resolved(self, random_artifact_dir):
        """pos/scale/pang step gains and the eye 'too far' tolerance resolve
        from the manifest calibration; explicit user values win; absent
        entries fall back to reference behavior (gain 1.0 / tol 9.0)."""
        import json

        from pyfaceanalysis_tpu.engine.detector import (DetectionModel,
                                                        FaceDetector)
        path = os.path.join(random_artifact_dir, "manifest.json")
        with open(path) as f:
            manifest = json.load(f)
        calib = manifest.setdefault("calibration", {})
        calib.update({"pos_gain": 0.65, "scale_gain": 0.9,
                      "pang_gain": 0.25, "tolerance_xy_eye": 10.29})
        with open(path, "w") as f:
            json.dump(manifest, f)
        try:
            model = DetectionModel.load(random_artifact_dir)
            det = FaceDetector(model, DetectorConfig())
            assert det.config.resolved_pos_gain() == 0.65
            assert det.config.resolved_scale_gain() == 0.9
            assert det.config.resolved_pang_gain() == 0.25
            assert det.config.tolerance_xy_eye == 10.29
            # explicit user values win
            det2 = FaceDetector(model, DetectorConfig(
                pos_gain=1.0, scale_gain=1.0, tolerance_xy_eye=9.0))
            assert det2.config.resolved_pos_gain() == 1.0
            assert det2.config.resolved_scale_gain() == 1.0
            assert det2.config.tolerance_xy_eye == 9.0
        finally:
            for k in ("pos_gain", "scale_gain", "pang_gain",
                      "tolerance_xy_eye"):
                calib.pop(k, None)
            with open(path, "w") as f:
                json.dump(manifest, f)
        # absent calibration -> reference behavior
        model = DetectionModel.load(random_artifact_dir)
        det3 = FaceDetector(model, DetectorConfig())
        assert det3.config.resolved_pos_gain() == 1.0
        assert det3.config.resolved_scale_gain() == 1.0
        assert det3.config.tolerance_xy_eye == 9.0


class TestDetectEndToEnd:
    def test_full_pipeline_runs(self, loaded_model):
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10)  # keep everything
        det = FaceDetector(loaded_model, cfg)
        rng = np.random.RandomState(0)
        image = rng.rand(120, 140).astype(np.float32)
        out = det.detect(image)
        assert det.windows_scanned > 0
        for d in out:
            assert np.isfinite(d.box).all()
            assert np.isfinite([*d.eye_left, *d.eye_right]).all()
            assert d.age is None or np.isfinite(d.age)

    def test_compaction_lossless_when_capacity_covers_survivors(
            self, loaded_model):
        """Both mid-cascade compaction rungs only reorder rows; with
        capacity >= surviving windows the final detections must equal the
        uncompacted run's (cascade.py compaction ranks alive-first)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        base = DetectorConfig(smallest_face=0.4,
                              bucket_sizes=(256, 1024, 4096),
                              cut_offs_face=(1.01,) * 10)  # keep everything
        image = np.random.RandomState(2).rand(120, 140).astype(np.float32)

        def rows(cfg):
            det = FaceDetector(loaded_model, cfg)
            out = det.detect(image, estimate_attributes=False)
            assert det.windows_scanned <= 128  # capacity must cover alive
            r = [(*d.box, d.angle, *d.eye_left, *d.eye_right, d.confidence)
                 for d in out]
            return np.asarray(sorted(r))

        uncompacted = rows(dataclasses.replace(base, mid_compact=0,
                                               mid_compact2=0))
        compacted = rows(dataclasses.replace(base, mid_compact=128,
                                             mid_compact2=128))
        assert uncompacted.shape == compacted.shape
        if len(uncompacted):
            np.testing.assert_allclose(uncompacted, compacted, atol=1e-4)

    def test_full_pipeline_runs_with_ridge_pose_heads(
            self, random_artifact_dir, tmp_path):
        """The cascade consumes pose heads only through regression() /
        input_dim, so ridge-decoded artifacts (--pose_head ridge) must run
        end to end."""
        import shutil

        from pyfaceanalysis_tpu.engine.detector import (DetectionModel,
                                                        FaceDetector)
        from pyfaceanalysis_tpu.ops.ridge import RidgeRegressor
        out = str(tmp_path / "ridge_artifacts")
        shutil.copytree(random_artifact_dir, out)
        rng = np.random.RandomState(5)
        for cname, dim, lo, hi in [("clf_PosX0", 10, -5, 5),
                                   ("clf_PosY0", 20, -5, 5),
                                   ("clf_PAng0", 20, -10, 10),
                                   ("clf_PosX1", 20, -5, 5),
                                   ("clf_PosY1", 20, -5, 5),
                                   ("clf_PAng1", 20, -10, 10),
                                   ("clf_Scale0", 20, 0.75, 0.9),
                                   ("clf_Scale1", 20, 0.75, 0.9)]:
            x = rng.normal(size=(200, dim)).astype(np.float32)
            y = rng.uniform(lo, hi, 200)
            clf = RidgeRegressor.fit(x, y, input_dim=dim)
            artifacts.save_classifier(os.path.join(out, cname + ".npz"),
                                      clf, dim)
        model = DetectionModel.load(out)
        assert type(model.classifier("PosX0")).__name__ == "RidgeRegressor"
        assert type(model.classifier("Disc1")).__name__ != "RidgeRegressor"
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10)
        det = FaceDetector(model, cfg)
        image = np.random.RandomState(3).rand(120, 140).astype(np.float32)
        out_dets = det.detect(image)
        assert det.windows_scanned > 0
        for d in out_dets:
            assert np.isfinite(d.box).all()

    def test_trace_collection(self, loaded_model):
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096))
        det = FaceDetector(loaded_model, cfg)
        image = np.random.RandomState(1).rand(120, 140).astype(np.float32)
        det.detect(image, collect_trace=True, estimate_attributes=False)
        assert det.last_trace is not None
        assert len(det.last_trace) == 17

    def test_detect_batch_matches_sequential(self, loaded_model):
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        # f32 wire: compares the fused batch against the per-image path,
        # which pulls f32 blocks (u16 has its own equality test).
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10,
                             wire_format="f32")
        det = FaceDetector(loaded_model, cfg)
        rng = np.random.RandomState(3)
        images = [rng.rand(100, 120).astype(np.float32) for _ in range(3)]
        batched = det.detect_batch(images, estimate_attributes=False)
        assert len(batched) == 3
        seq = [det.detect(im, estimate_attributes=False) for im in images]
        for b, s in zip(batched, seq):
            assert len(b) == len(s)
            for db, ds in zip(b, s):
                np.testing.assert_allclose(db.box, ds.box, rtol=1e-4,
                                           atol=1e-3)

    def test_detect_stream_matches_detect_batch(self, loaded_model):
        """detect_stream pipelines dispatch/pull across batches but must
        yield exactly detect_batch's results per batch, in order — incl.
        a ragged batch (flushes the pipeline) and a below-envelope batch
        (n_real == 0 sentinel path)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10)
        det = FaceDetector(loaded_model, cfg)
        rng = np.random.RandomState(11)
        batches = [
            [rng.rand(100, 120).astype(np.float32) for _ in range(2)],
            [rng.rand(100, 120).astype(np.float32) for _ in range(3)],
            [rng.rand(100, 120).astype(np.float32),      # ragged sizes
             rng.rand(90, 110).astype(np.float32)],
            [rng.rand(100, 120).astype(np.float32) for _ in range(2)],
        ]
        streamed = list(det.detect_stream(batches,
                                          estimate_attributes=False))
        assert len(streamed) == len(batches)
        for images, got in zip(batches, streamed):
            want = det.detect_batch(images, estimate_attributes=False)
            assert len(got) == len(want)
            for g_dets, w_dets in zip(got, want):
                assert len(g_dets) == len(w_dets)
                for g, w in zip(g_dets, w_dets):
                    np.testing.assert_allclose(g.box, w.box, rtol=1e-4,
                                               atol=1e-3)

    def test_detect_stream_empty_grid_batch(self, loaded_model):
        """A batch of images below the scale envelope yields empty lists
        through the sentinel (stack, None) dispatch."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        cfg = DetectorConfig(smallest_face=0.9,
                             bucket_sizes=(256, 1024, 4096))
        det = FaceDetector(loaded_model, cfg)
        tiny = [np.zeros((24, 24), np.float32) for _ in range(2)]
        out = list(det.detect_stream([tiny], estimate_attributes=False))
        assert out == [[[], []]]

    def test_stream_push_prefetch_equality(self, loaded_model):
        """The push-prefetch producer thread must yield exactly the
        synchronous stream's results (same batches, same order), incl.
        across a ragged flush, and the thread must wind down when the
        consumer abandons the generator early."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        rng = np.random.RandomState(17)
        batches = [
            [rng.rand(100, 120).astype(np.float32) for _ in range(2)],
            [rng.rand(100, 120).astype(np.float32),      # ragged sizes
             rng.rand(90, 110).astype(np.float32)],
            [rng.rand(100, 120).astype(np.float32) for _ in range(2)],
        ]
        outs = {}
        for pre in (False, True):
            cfg = DetectorConfig(smallest_face=0.4,
                                 bucket_sizes=(256, 1024, 4096),
                                 cut_offs_face=(1.01,) * 10,
                                 stream_push_prefetch=pre)
            det = FaceDetector(loaded_model, cfg)
            outs[pre] = list(det.detect_stream(batches,
                                               estimate_attributes=False))
        assert len(outs[True]) == len(outs[False]) == len(batches)
        for got, want in zip(outs[True], outs[False]):
            assert len(got) == len(want)
            for g_dets, w_dets in zip(got, want):
                assert len(g_dets) == len(w_dets)
                for g, w in zip(g_dets, w_dets):
                    np.testing.assert_allclose(g.box, w.box, rtol=1e-5,
                                               atol=1e-4)
        # early abandonment: closing the generator must not hang
        import threading
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10)
        det = FaceDetector(loaded_model, cfg)
        gen = det.detect_stream([batches[0]] * 6,
                                estimate_attributes=False)
        next(gen)
        gen.close()
        for t in threading.enumerate():
            if t.name == "pfa-stream-push":
                t.join(timeout=10.0)
                assert not t.is_alive()

    def test_stream_depth_flush_and_fused_chunking(self, loaded_model):
        """depth > #batches must still yield every batch in order (final
        flush), and detect_batch above max_fused_batch must chunk into
        several fused programs with unchanged results (the Pallas crop
        kernel's SMEM scalar metadata caps the per-program image count)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        # f32 wire: the chunking checks compare against per-image detect.
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10, max_fused_batch=2,
                             wire_format="f32")
        det = FaceDetector(loaded_model, cfg)
        rng = np.random.RandomState(5)
        imgs = [rng.rand(100, 120).astype(np.float32) for _ in range(5)]
        chunked = det.detect_batch(imgs, estimate_attributes=False)
        assert len(chunked) == 5
        per_image = [det.detect(im, estimate_attributes=False)
                     for im in imgs]
        for c, s in zip(chunked, per_image):
            assert len(c) == len(s)
            for dc, ds in zip(c, s):
                np.testing.assert_allclose(dc.box, ds.box, rtol=1e-4,
                                           atol=1e-3)
        batches = [imgs[:2], imgs[2:4]]
        streamed = list(det.detect_stream(batches,
                                          estimate_attributes=False,
                                          depth=10))
        assert len(streamed) == 2
        for images, got in zip(batches, streamed):
            want = det.detect_batch(images, estimate_attributes=False)
            for g_dets, w_dets in zip(got, want):
                assert len(g_dets) == len(w_dets)

    def test_wire_format_u16_matches_f32(self, loaded_model):
        """The u16 fixed-point wire pack must reproduce the f32 batch
        results to quantization (1/16 px on coords/angle, 1/16384 on
        confidence) with identical detection counts."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        rng = np.random.RandomState(3)
        imgs = [rng.rand(100, 120).astype(np.float32) for _ in range(3)]
        blocks = {}
        for wf in ("f32", "u16"):
            cfg = DetectorConfig(smallest_face=0.4,
                                 bucket_sizes=(256, 1024, 4096),
                                 cut_offs_face=(1.01,) * 10,
                                 wire_format=wf)
            det = FaceDetector(loaded_model, cfg)
            _, fut = det._dispatch_fused(imgs)
            blocks[wf] = np.asarray(fut)
        from pyfaceanalysis_tpu.engine.detector import _unpack_wire
        assert blocks["u16"].dtype == np.uint16
        got = _unpack_wire(blocks["u16"], 2048)
        ref = blocks["f32"]
        # validity exact; coords/angle to 1/32 px; confidence to 1/32768
        np.testing.assert_array_equal(got[..., 10], ref[..., 10])
        valid = ref[..., 10] > 0.5
        np.testing.assert_allclose(got[..., :9][valid],
                                   ref[..., :9][valid], atol=1.0 / 16)
        np.testing.assert_allclose(got[..., 9][valid], ref[..., 9][valid],
                                   atol=1.0 / 16384)

    def test_arg_tta_k1_matches_baseline_and_k5_is_sane(self, loaded_model):
        """tta=1 must be bit-identical to the single-crop head path
        (zero offsets); tta=5 must keep detection geometry untouched and
        return finite averaged attributes."""
        from pyfaceanalysis_tpu.engine import heads as heads_mod
        rows = np.array([
            [20.0, 20.0, 84.0, 84.0, 0.0, 38.0, 44.0, 66.0, 44.0, 0.9],
            [10.0, 15.0, 74.0, 79.0, 5.0, 28.0, 40.0, 55.0, 38.0, 0.8],
        ])
        image = np.random.RandomState(7).rand(120, 140).astype(np.float32)
        base = heads_mod.estimate_age_race_gender(image, rows, loaded_model)
        k1 = heads_mod.estimate_age_race_gender(image, rows, loaded_model,
                                                tta=1)
        for a, b in zip(base, k1):
            np.testing.assert_array_equal(a, b)
        k5 = heads_mod.estimate_age_race_gender(image, rows, loaded_model,
                                                tta=5)
        for arr in k5:
            assert arr.shape == (2,)
            assert np.isfinite(arr).all()
        # averaged age stays inside the head's label range
        assert (k5[0] >= 16.0).all() and (k5[0] <= 58.0).all()

    def test_eye_iters_preserves_detection_geometry(self, loaded_model):
        """eye_iters=2 is a pure OUTPUT refinement: the too-far gate, NMS
        and the attribute heads all consume the pass-1 eye positions, so
        the post-NMS detection set (boxes, angles, confidences, count) and
        the attributes are bit-identical to eye_iters=1; only the REPORTED
        eye coordinates move (refined pass, block cols 11-14)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        kw = dict(smallest_face=0.4, bucket_sizes=(256, 1024, 4096),
                  cut_offs_face=(1.01,) * 10)
        rng = np.random.RandomState(3)
        image = rng.rand(120, 140).astype(np.float32)
        out1 = FaceDetector(loaded_model, DetectorConfig(**kw)).detect(image)
        out2 = FaceDetector(
            loaded_model, DetectorConfig(eye_iters=2, **kw)).detect(image)
        assert len(out1) == len(out2) > 0
        moved = 0.0
        for a, b in zip(out1, out2):
            np.testing.assert_array_equal(a.box, b.box)
            assert a.angle == b.angle and a.confidence == b.confidence
            assert a.age == b.age and a.gender_value == b.gender_value
            assert np.isfinite([*b.eye_left, *b.eye_right]).all()
            moved += abs(np.subtract(a.eye_left, b.eye_left)).sum()
        # pass 2 actually ran: random eye nets shift re-centered boxes
        assert moved > 0.0

    def test_arg_eyes_refined_changes_attrs_only(self, loaded_model):
        """arg_eyes="refined" feeds the eye_iters>1 refined centers to the
        attribute heads: detection geometry and reported eyes are
        bit-identical to arg_eyes="pass1" at the same eye_iters; only the
        attribute values may move (different Z-frame normalization)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector, _arg_rows
        kw = dict(smallest_face=0.4, eye_iters=2,
                  bucket_sizes=(256, 1024, 4096),
                  cut_offs_face=(1.01,) * 10)
        rng = np.random.RandomState(3)
        image = rng.rand(120, 140).astype(np.float32)
        base = FaceDetector(loaded_model, DetectorConfig(**kw)).detect(image)
        ref = FaceDetector(
            loaded_model,
            DetectorConfig(arg_eyes="refined", **kw)).detect(image)
        assert len(base) == len(ref) > 0
        for a, b in zip(base, ref):
            np.testing.assert_array_equal(a.box, b.box)
            assert a.angle == b.angle and a.confidence == b.confidence
            np.testing.assert_array_equal(a.eye_left, b.eye_left)
            np.testing.assert_array_equal(a.eye_right, b.eye_right)
            assert np.isfinite([b.age, b.race_value, b.gender_value]).all()
        # the swap helper itself: refined cols replace 5:9, source untouched
        rows = np.arange(2 * 14, dtype=np.float64).reshape(2, 14)
        cfg_ref = DetectorConfig(arg_eyes="refined")
        swapped = _arg_rows(rows, cfg_ref)
        np.testing.assert_array_equal(swapped[:, 5:9], rows[:, 10:14])
        np.testing.assert_array_equal(swapped[:, :5], rows[:, :5])
        assert rows[0, 5] == 5.0  # input not mutated
        # without refined cols (eye_iters=1 block), refined = no-op
        np.testing.assert_array_equal(
            _arg_rows(rows[:, :10], cfg_ref), rows[:, :10])

    def test_eye_report_pass1_matches_k1_output_exactly(self, loaded_model):
        """eye_iters=2 + eye_report="pass1" + arg_eyes="refined": every
        user-visible detection field (box, angle, confidence, REPORTED
        eyes) is bit-identical to plain eye_iters=1 -- the refinement pass
        serves only the attribute heads."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        kw = dict(smallest_face=0.4, bucket_sizes=(256, 1024, 4096),
                  cut_offs_face=(1.01,) * 10)
        rng = np.random.RandomState(3)
        image = rng.rand(120, 140).astype(np.float32)
        base = FaceDetector(loaded_model, DetectorConfig(**kw)).detect(image)
        cand = FaceDetector(loaded_model, DetectorConfig(
            eye_iters=2, eye_report="pass1", arg_eyes="refined",
            **kw)).detect(image)
        assert len(base) == len(cand) > 0
        for a, b in zip(base, cand):
            np.testing.assert_array_equal(a.box, b.box)
            assert a.angle == b.angle and a.confidence == b.confidence
            np.testing.assert_array_equal(a.eye_left, b.eye_left)
            np.testing.assert_array_equal(a.eye_right, b.eye_right)

    def test_eye_iters_fused_batch_matches_single(self, loaded_model):
        """The fused multi-image block carries the refined-eye columns
        too: detect_batch at eye_iters=2 equals per-image detect."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        # wire_format pinned to f32: this test compares the fused BATCH
        # path against the per-image path (f32 block); the u16 encoding
        # has its own equality test and would add 1/16-px quantization.
        cfg = DetectorConfig(smallest_face=0.4, eye_iters=2,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10,
                             wire_format="f32")
        det = FaceDetector(loaded_model, cfg)
        rng = np.random.RandomState(5)
        images = [rng.rand(100, 120).astype(np.float32) for _ in range(2)]
        batched = det.detect_batch(images, estimate_attributes=False)
        for im, got in zip(images, batched):
            want = det.detect(im, estimate_attributes=False)
            assert len(want) == len(got)
            for a, b in zip(want, got):
                np.testing.assert_allclose(a.box, b.box, atol=1e-4)
                np.testing.assert_allclose(
                    [*a.eye_left, *a.eye_right],
                    [*b.eye_left, *b.eye_right], atol=1e-3)

    def test_tracking_state_machine(self, loaded_model):
        """track_single_face: after a hit, the next frame scans a narrowed
        grid around the last face (FaceDetectUpdated.py:1189-1195,
        face_analysis.py:576-585)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        cfg = DetectorConfig(smallest_face=0.4, track_single_face=True,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10,
                             last_cut_off_face=1.01)
        det = FaceDetector(loaded_model, cfg)
        image = np.random.RandomState(5).rand(120, 140).astype(np.float32)
        out1 = det.detect(image, estimate_attributes=False)
        full_windows = det.windows_scanned
        if out1:                       # permissive cutoffs: usually found
            assert det.face_has_been_found
            det.detect(image, estimate_attributes=False)
            assert det.windows_scanned < full_windows
            assert det.windows_scanned <= 9   # 3 x 3 tracking grid

    def test_cli_run_detection(self, random_artifact_dir, tmp_path):
        """The pfa-detect code path end to end, including the output file."""
        from pyfaceanalysis_tpu.apps.detect import run_detection
        from pyfaceanalysis_tpu.io import images as im_io
        img_path = str(tmp_path / "scene.png")
        out_path = str(tmp_path / "out.txt")
        rng = np.random.RandomState(2)
        im_io.save_image(img_path, rng.rand(100, 100))
        cfg = DetectorConfig(smallest_face=0.5,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10)
        rc = run_detection([img_path], [out_path], cfg,
                           pipeline_dir=random_artifact_dir, verbose=False)
        assert rc == 0
        if os.path.exists(out_path):
            for line in open(out_path):
                assert len(line.split(",")) in (9, 13)

    def test_trace_path_returns_production_detections(self, loaded_model):
        """detect(collect_trace=True) must return the SAME detections as the
        production path -- the evaluator observes the pipeline users run,
        it does not fork it (VERDICT r2 weak #1; reference
        FaceDetectUpdated.py:1287-1377)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        cfg = DetectorConfig(smallest_face=0.4,
                             bucket_sizes=(256, 1024, 4096),
                             cut_offs_face=(1.01,) * 10)
        det = FaceDetector(loaded_model, cfg)
        image = np.random.RandomState(7).rand(120, 140).astype(np.float32)
        plain = det.detect(image, estimate_attributes=False)
        traced = det.detect(image, estimate_attributes=False,
                            collect_trace=True)
        assert det.last_trace is not None
        assert len(traced) == len(plain)
        for a, b in zip(traced, plain):
            np.testing.assert_allclose(a.box, b.box, rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(a.eye_left, b.eye_left,
                                       rtol=1e-5, atol=1e-4)

    def test_eye_cap_does_not_cap_detections(self, loaded_model):
        """eye_max_faces bounds the eye sub-batch only; rows past the cap
        keep the geometric eye prior and stay in the output (ADVICE r2)."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        cfg_small = DetectorConfig(smallest_face=0.4,
                                   bucket_sizes=(256, 1024, 4096),
                                   cut_offs_face=(1.01,) * 10,
                                   eye_max_faces=8, tolerance_xy_eye=1e9)
        cfg_big = dataclasses.replace(cfg_small, eye_max_faces=256)
        image = np.random.RandomState(9).rand(120, 140).astype(np.float32)
        n_small = len(FaceDetector(loaded_model, cfg_small).detect(
            image, estimate_attributes=False))
        n_big = len(FaceDetector(loaded_model, cfg_big).detect(
            image, estimate_attributes=False))
        # The old code truncated the output block at eye_max_faces rows;
        # now only eye refinement differs (which can shift NMS by a hair).
        assert n_small > cfg_small.eye_max_faces
        assert abs(n_small - n_big) <= 0.1 * n_big

    def test_fused_batch_matches_async(self, loaded_model):
        """batch_mode='fused' (one cascade program over all images) must
        reproduce batch_mode='async' (one program per image), including
        when the per-image compaction rungs fire."""
        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        rng = np.random.RandomState(11)
        images = [rng.rand(100, 120).astype(np.float32) for _ in range(3)]
        # wire_format pinned to f32: fused-vs-async path equivalence is
        # what is under test; the async path pulls f32 blocks.
        base = DetectorConfig(smallest_face=0.4,
                              bucket_sizes=(256, 1024, 4096),
                              cut_offs_face=(1.01,) * 10,
                              mid_compact=16, mid_compact2=8,
                              wire_format="f32")
        fused = FaceDetector(loaded_model, base).detect_batch(
            images, estimate_attributes=False)
        async_ = FaceDetector(
            loaded_model,
            dataclasses.replace(base, batch_mode="async")).detect_batch(
            images, estimate_attributes=False)
        assert [len(f) for f in fused] == [len(a) for a in async_]
        for fs, as_ in zip(fused, async_):
            for df, da in zip(fs, as_):
                np.testing.assert_allclose(df.box, da.box, rtol=1e-4,
                                           atol=1e-3)
                np.testing.assert_allclose(df.eye_left, da.eye_left,
                                           rtol=1e-4, atol=1e-3)

    def test_data_mesh_detection_matches_single_device(self, loaded_model):
        """--data_mesh=8: full detection (not just the raw cascade) through
        an 8-virtual-device mesh equals the single-device result
        (VERDICT r2 next-step #9; SURVEY.md S2.4)."""
        import jax

        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")
        base = DetectorConfig(smallest_face=0.4,
                              bucket_sizes=(256, 1024, 4096),
                              cut_offs_face=(1.01,) * 10)
        image = np.random.RandomState(13).rand(120, 140).astype(np.float32)
        plain = FaceDetector(loaded_model, base).detect(
            image, estimate_attributes=False)
        meshed = FaceDetector(
            loaded_model,
            dataclasses.replace(base, data_mesh=8)).detect(
            image, estimate_attributes=False)
        assert len(meshed) == len(plain) > 0
        for a, b in zip(meshed, plain):
            np.testing.assert_allclose(a.box, b.box, rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(a.eye_left, b.eye_left,
                                       rtol=1e-4, atol=1e-3)

    def test_data_mesh_fused_batch_matches_single_device(self, loaded_model):
        import jax

        from pyfaceanalysis_tpu.engine.detector import FaceDetector
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")
        base = DetectorConfig(smallest_face=0.4,
                              bucket_sizes=(256, 1024, 4096),
                              cut_offs_face=(1.01,) * 10)
        rng = np.random.RandomState(17)
        images = [rng.rand(100, 120).astype(np.float32) for _ in range(2)]
        plain = FaceDetector(loaded_model, base).detect_batch(
            images, estimate_attributes=False)
        meshed = FaceDetector(
            loaded_model,
            dataclasses.replace(base, data_mesh=8)).detect_batch(
            images, estimate_attributes=False)
        for fs, as_ in zip(meshed, plain):
            assert len(fs) == len(as_)
            for df, da in zip(fs, as_):
                np.testing.assert_allclose(df.box, da.box, rtol=1e-4,
                                           atol=1e-3)


def test_pad_convert_matches_host_canvas():
    """Device-side pad+convert must equal the old host-side canvas build
    (zeros padding, uint8 quantized, [0, 1] float), for single images and
    stacked batches."""
    import jax.numpy as jnp
    from pyfaceanalysis_tpu.engine.detector import _pad_convert

    rng = np.random.RandomState(7)
    img = rng.rand(37, 53).astype(np.float32)
    u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    ref = np.zeros((64, 128), np.float32)
    ref[:37, :53] = u8.astype(np.float32) / 255.0
    got = np.asarray(_pad_convert(jnp.asarray(u8), 64, 128))
    np.testing.assert_allclose(got, ref, atol=1e-7)

    batch = np.stack([u8, u8[::-1]])
    got_b = np.asarray(_pad_convert(jnp.asarray(batch), 64, 128))
    assert got_b.shape == (2, 64, 128)
    np.testing.assert_allclose(got_b[0], ref, atol=1e-7)


def test_wire_coord_scale_by_canvas():
    """u16 coordinate scale: 1/16 px while the canvas fits the 16x range,
    1/8 px for grown canvases (the flat 16x encoding clipped coords past
    3071.9 px); round-trip at a grown-canvas coordinate works."""
    import numpy as np

    from pyfaceanalysis_tpu.engine.detector import (_unpack_wire,
                                                    _wire_affine,
                                                    _wire_coord_scale)

    assert _wire_coord_scale(1000) == 16.0
    assert _wire_coord_scale(3071) == 16.0
    assert _wire_coord_scale(3072) == 8.0
    assert _wire_coord_scale(7167) == 8.0
    # A 4000-px coordinate saturates at 16x but round-trips at 8x.
    off16, sc16 = _wire_affine(11, 16.0)
    off8, sc8 = _wire_affine(11, 8.0)
    v = np.zeros((1, 11), np.float32)
    v[0, 0] = 4000.0
    p16 = np.clip(np.round((v + off16) * sc16), 0, 65535).astype(np.uint16)
    p8 = np.clip(np.round((v + off8) * sc8), 0, 65535).astype(np.uint16)
    assert (p16[0, 0].astype(np.float32) / 16 - 1024) < 3500   # clipped
    back = _unpack_wire(p8, 4096)
    assert abs(back[0, 0] - 4000.0) <= 1.0 / 8


def test_detect_stream_propagates_source_error(loaded_model):
    """An exception raised by the batch SOURCE mid-stream must surface to
    the consumer (the producer thread forwards it through the ready
    queue). Pipelining means the error may preempt in-flight batches --
    the contract is that it is raised, not swallowed, and the helper
    threads wind down."""
    import pytest

    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine.detector import FaceDetector

    cfg = DetectorConfig(smallest_face=0.4, bucket_sizes=(256, 1024, 4096),
                         cut_offs_face=(1.01,) * 10)
    det = FaceDetector(loaded_model, cfg)
    rng = np.random.RandomState(2)
    good = [rng.rand(100, 120).astype(np.float32) for _ in range(2)]

    def source():
        yield good
        raise ValueError("boom in the batch source")

    with pytest.raises(ValueError, match="boom in the batch source"):
        list(det.detect_stream(source(), estimate_attributes=False))
    import threading
    assert not [t for t in threading.enumerate()
                if t.name.startswith("pfa-stream") and t.is_alive()]
