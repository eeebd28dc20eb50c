"""Geometry golden tests against literal NumPy transcriptions of the
reference formulas (face_analysis.py:24-135, face_normalization_tools.py:23-47)."""

import numpy as np

from pyfaceanalysis_tpu import geometry


def ref_eye_coords(box, face_sampling=0.825):
    x0, y0, x1, y1 = box
    fc_x = (x0 + x1) / 2.0
    fc_y = (y0 + y1) / 2.0
    eye_dx = 37.0 / 2.0 * abs(x1 - x0) / 128 / face_sampling
    eye_dy = 42.0 / 2.0 * abs(y1 - y0) / 128 / face_sampling
    return np.array([fc_x - eye_dx, fc_y - eye_dy, fc_x + eye_dx, fc_y - eye_dy])


def ref_eye_boxes(box, rot_angle=0.0):
    """Magnitudes per face_analysis.py:61-135; the rotation uses THIS
    framework's convention R(angle) = [[c, -s], [s, c]] (y down), matching
    ops.patches and the renderer (the reference's own formulas carry the
    opposite angle sign because its extractor is called with -angles)."""
    x0, y0, x1, y1 = box
    fc_x = (x0 + x1) / 2.0
    fc_y = (y0 + y1) / 2.0
    eye_dx = (37.0 / 2.0) * (abs(x1 - x0) / 64.0) / (2 * 0.825)
    eye_dy = (42.0 / 2.0) * (abs(y1 - y0) / 64.0) / (2 * 0.825)
    box_width = (abs(x1 - x0) / (64.0 * 2 * 0.825)) * (64 * 2.3719 / 2)
    box_height = box_width
    r = rot_angle * np.pi / 180
    c, s = np.cos(r), np.sin(r)
    el = np.array([fc_x, fc_y]) + np.array([[c, -s], [s, c]]) @ \
        np.array([-eye_dx, -eye_dy])
    er = np.array([fc_x, fc_y]) + np.array([[c, -s], [s, c]]) @ \
        np.array([eye_dx, -eye_dy])
    el_x, el_y = el
    er_x, er_y = er
    eyes = np.array([el_x, el_y, er_x, er_y])
    lb = np.array([el_x - box_width / 2, el_y - box_height / 2,
                   el_x + box_width / 2, el_y + box_height / 2])
    rb = np.array([er_x - box_width / 2, er_y - box_height / 2,
                   er_x + box_width / 2, er_y + box_height / 2])
    return eyes, lb, rb


def test_eye_coordinates_match_reference():
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 500, size=(10, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(30, 200, size=(10, 2))
    got = np.asarray(geometry.compute_approximate_eye_coordinates(boxes))
    for i in range(10):
        np.testing.assert_allclose(got[i], ref_eye_coords(boxes[i]),
                                   rtol=1e-5)


def test_eye_boxes_match_reference_rotated():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 500, size=(8, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(30, 200, size=(8, 2))
    angles = rng.uniform(-25, 25, size=8)
    eyes, lb, rb = geometry.compute_approximate_eye_boxes_coordinates(
        boxes, angles)
    for i in range(8):
        re, rl, rr = ref_eye_boxes(boxes[i], angles[i])
        np.testing.assert_allclose(np.asarray(eyes)[i], re, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lb)[i], rl, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rb)[i], rr, rtol=1e-4, atol=1e-4)


def test_eye_boxes_consistent_with_renderer():
    """For a rotated rendered face with its perfect detection box, the
    geometric eye approximation must land on the renderer's eyes."""
    import jax
    from pyfaceanalysis_tpu.training import synth

    for theta in (-18.0, 0.0, 12.0):
        _, attrs = synth.render_face(jax.random.PRNGKey(0),
                                     canvas_hw=(260, 260), face_size=90.0,
                                     center=(130.0, 130.0), angle_deg=theta)
        # The renderer reports landmarks in the ANNOTATION convention
        # (yaw-projected + jittered): the perfect detection box derives
        # from those landmarks, exactly like a ground-truth row would.
        F = float(attrs["face_size"])
        ang = float(attrs["angle"])
        fc = np.array([
            (float(attrs["eye_l"][0]) + float(attrs["eye_r"][0])) / 2.0,
            (float(attrs["eye_l"][1]) + float(attrs["eye_r"][1])) / 2.0])
        fc = (fc + np.asarray(attrs["mouth"])) / 2.0
        box = np.array([[fc[0] - (F - 1) / 2, fc[1] - (F - 1) / 2,
                         fc[0] + (F - 1) / 2, fc[1] + (F - 1) / 2]])
        eyes, _, _ = geometry.compute_approximate_eye_boxes_coordinates(
            box, np.array([ang]))
        eyes = np.asarray(eyes)[0]
        true_eyes = np.concatenate([np.asarray(attrs["eye_l"]),
                                    np.asarray(attrs["eye_r"])])
        # Within ~6% of the inter-eye distance (the geometry uses the 0.825
        # face-sampling approximation).
        dist = np.hypot(true_eyes[2] - true_eyes[0],
                        true_eyes[3] - true_eyes[1])
        np.testing.assert_allclose(eyes, true_eyes, atol=0.06 * dist)


def test_mouth_from_eyes():
    # Horizontal eyes 37 apart -> mouth 42 below the midpoint.
    eyes = np.array([[0.0, 0.0, 37.0, 0.0]])
    m = np.asarray(geometry.compute_approximate_mouth_coordinates(eyes))[0]
    np.testing.assert_allclose(m, [18.5, 42.0], atol=1e-5)


def test_relative_error_detection():
    true_eyes = np.array([10.0, 10.0, 20.0, 10.0])  # inter-eye distance 10
    app = np.array([10.0, 12.5, 20.0, 10.0])        # left eye off by 2.5
    err = float(geometry.relative_error_detection(app, true_eyes))
    np.testing.assert_allclose(err, 0.25, atol=1e-6)
    assert not bool(geometry.face_detected(app, true_eyes))
    assert bool(geometry.face_detected(app, true_eyes, factor=0.26))


def test_pairwise_relative_eye_error_shape():
    a = np.random.default_rng(2).uniform(0, 100, size=(3, 4))
    b = np.random.default_rng(3).uniform(0, 100, size=(5, 4))
    m = np.asarray(geometry.pairwise_relative_eye_error(a, b))
    assert m.shape == (3, 5)
    # Diagonal of self-comparison is 0.
    s = np.asarray(geometry.pairwise_relative_eye_error(a, a))
    np.testing.assert_allclose(np.diag(s), 0.0, atol=1e-6)


def test_face_midpoint():
    mx, my = geometry.compute_face_midpoint(0.0, 0.0, 10.0, 0.0, 5.0, 12.0)
    np.testing.assert_allclose([float(mx), float(my)], [5.0, 6.0])
