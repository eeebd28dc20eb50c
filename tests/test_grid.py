"""Grid generators vs literal transcriptions of face_analysis.py:575-669."""

import numpy as np

from pyfaceanalysis_tpu.config import NetGeometry
from pyfaceanalysis_tpu.engine import grid

GEOM = NetGeometry()  # reference header: 40 20 22.5 0.694 0.981 64 64 128 128


def ref_sampling_values(im_width, im_height, smallest_face=0.2, overlap=1.1):
    min_side = min(im_height, im_width)
    min_box_side = max(20, min_side * smallest_face * 0.825 / GEOM.mins)
    sampling_value = min_box_side * 1.0 / GEOM.subimage_width
    out = []
    step = (GEOM.maxs / GEOM.mins) / overlap
    while (GEOM.subimage_width * sampling_value * GEOM.mins / 0.825 < im_width
           and GEOM.subimage_height * sampling_value * GEOM.mins / 0.825
           < im_height):
        out.append(sampling_value)
        sampling_value *= step
    return out


def test_sampling_values_match_reference():
    for (w, h, sf) in [(1000, 750, 0.2), (640, 480, 0.1), (300, 1000, 0.15)]:
        got = grid.compute_sampling_values(w, h, GEOM, sf, 1.1)
        ref = ref_sampling_values(w, h, sf)
        np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_sampling_values_non_adaptive():
    got = grid.compute_sampling_values(640, 480, GEOM, 0.2, 1.1,
                                       adaptive_grid_scale=False)
    assert len(got) == 1


def test_sampling_values_tracking():
    got = grid.compute_sampling_values(
        640, 480, GEOM, 0.2, 1.1, track_single_face=True,
        face_has_been_found=True, tracked_face=(100.0, 100.0, 200.0, 180.0))
    # face_size = 0.5*100 + 0.5*80 = 90 -> sampling 90/64
    np.testing.assert_allclose(got, [90.0 / 64.0])


def test_pos_values_match_reference():
    sampling = 2.0
    posX, posY, pw, ph, mdx, mdy = grid.compute_posX_posY_values(
        640, 480, GEOM, sampling, 1.1)
    patch_width = GEOM.subimage_width * sampling
    patch_height = GEOM.subimage_height * sampling
    sep_x = GEOM.Dx * 2.0 * patch_width / GEOM.regression_width
    sep_y = GEOM.Dy * 2.0 * patch_height / GEOM.regression_height
    num_x = np.ceil((1 + (640 - patch_width) / sep_x) * 1.1)
    num_y = np.ceil((1 + (480 - patch_height) / sep_y) * 1.1)
    np.testing.assert_allclose(posX, np.linspace(0.0, 640 - patch_width,
                                                 int(num_x)))
    np.testing.assert_allclose(posY, np.linspace(0.0, 480 - patch_height,
                                                 int(num_y)))
    np.testing.assert_allclose(pw, patch_width)
    np.testing.assert_allclose(mdx, GEOM.Dx * patch_width / GEOM.regression_width)
    np.testing.assert_allclose(mdy, GEOM.Dy * patch_height / GEOM.regression_height)


def test_subimage_coordinates_layout():
    posX = np.array([0.0, 10.0])
    posY = np.array([0.0, 5.0, 20.0])
    boxes = grid.compute_subimage_coordinates(posX, posY, 8.0, 6.0)
    assert boxes.shape == (6, 4)
    # Y-major ordering like the reference loop (face_analysis.py:665-668).
    np.testing.assert_allclose(boxes[0], [0.0, 0.0, 7.0, 5.0])
    np.testing.assert_allclose(boxes[1], [10.0, 0.0, 17.0, 5.0])
    np.testing.assert_allclose(boxes[2], [0.0, 5.0, 7.0, 10.0])


def test_pipeline_parse_reference_file():
    import os
    from tests.conftest import REFERENCE_DIR, reference_available
    if not reference_available():
        import pytest
        pytest.skip("reference not mounted")
    from pyfaceanalysis_tpu.io.pipeline import parse_pipeline
    spec = parse_pipeline(os.path.join(REFERENCE_DIR, "Pipelines",
                                       "Pipeline_experimental.txt"))
    assert spec.num_networks == 22
    assert spec.face_geom.Dx == 40 and spec.face_geom.Dang == 22.5
    assert spec.face_geom.mins == 0.694 and spec.face_geom.maxs == 0.981
    assert spec.eye_geom.subimage_width == 64
    assert spec.age_geom.regression_width == 160
    kinds = [s.kind for s in spec.stages]
    assert kinds[:5] == ["Disc", "PosX", "PosY", "PAng", "Scale"]
    assert kinds[-5:] == ["EyeLX", "EyeLY", "Age", "Race", "Gender"]
    assert spec.stages[0].serial == 1
    assert spec.stages[1].serial == 0
    assert spec.stages[2].reuses_features  # PosY0 uses None0.pckl
    assert len(spec.detection_stages) == 17


def test_pipeline_roundtrip(tmp_path):
    from pyfaceanalysis_tpu.config import NetGeometry
    from pyfaceanalysis_tpu.io.pipeline import (PipelineSpec, StageSpec,
                                                parse_pipeline, write_pipeline)
    spec = PipelineSpec(
        NetGeometry(), NetGeometry(Dx=8, Dy=8, Dang=0, mins=0.675, maxs=0.975,
                                   regression_width=64, regression_height=64),
        NetGeometry(Dx=0, Dy=0, Dang=0, mins=1.14, maxs=1.14,
                    subimage_width=96, subimage_height=96,
                    regression_width=160, regression_height=160),
        (StageSpec("Disc1", "netA", "clfA"),
         StageSpec("PosX0", "None0", "clfB")))
    p = tmp_path / "Pipeline_test.txt"
    write_pipeline(str(p), spec)
    spec2 = parse_pipeline(str(p))
    assert spec2 == spec
