"""Face geometry: eye/mouth priors, box transforms, detection-error metrics.

Vectorized (batched) JAX re-derivations of the reference's per-row NumPy
helpers:

- ``compute_approximate_eye_coordinates``   (face_analysis.py:24-58)
- ``compute_approximate_eye_boxes_coordinates`` (face_analysis.py:61-135)
- ``compute_face_midpoint``                 (face_analysis.py:138-154)
- ``compute_approximate_mouth_coordinates`` (face_normalization_tools.py:23-47)
- ``relative_error_detection`` / ``face_detected`` (face_analysis.py:158-173)

All functions take/return arrays with a leading batch dimension and are
jit/vmap friendly (no Python branching on data).
"""

from __future__ import annotations

import jax.numpy as jnp

from pyfaceanalysis_tpu.config import (
    CANONICAL_DIST_EYES,
    CANONICAL_TRIANGLE_HEIGHT,
    DESIRED_SAMPLING,
    EYE_SAMPLING,
)


def compute_approximate_eye_coordinates(boxes, face_sampling=DESIRED_SAMPLING):
    """Crude eye positions from face boxes.

    Args:
        boxes: (..., 4) array of [x0, y0, x1, y1] face boxes.
        face_sampling: face size relative to the box (reference default 0.825).

    Returns:
        (..., 4) array [eyeL_x, eyeL_y, eyeR_x, eyeR_y].

    Reference: face_analysis.py:24-58. Eyes sit at +-37/2 horizontally and
    -42/2 vertically of a 128-unit face frame.
    """
    boxes = jnp.asarray(boxes)
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    fc_x = (x0 + x1) / 2.0
    fc_y = (y0 + y1) / 2.0
    eye_dx = (CANONICAL_DIST_EYES / 2.0) * jnp.abs(x1 - x0) / 128.0 / face_sampling
    eye_dy = (CANONICAL_TRIANGLE_HEIGHT / 2.0) * jnp.abs(y1 - y0) / 128.0 / face_sampling
    return jnp.stack([fc_x - eye_dx, fc_y - eye_dy, fc_x + eye_dx, fc_y - eye_dy],
                     axis=-1)


def compute_approximate_eye_boxes_coordinates(boxes, angles=None,
                                              face_sampling=DESIRED_SAMPLING,
                                              eye_sampling=EYE_SAMPLING):
    """Eye positions plus left/right eye bounding boxes, rotation-aware.

    Args:
        boxes: (..., 4) face boxes [x0, y0, x1, y1].
        angles: (...,) in-plane rotation in degrees (None = 0).

    Returns:
        (eye_coords, left_eye_boxes, right_eye_boxes):
        (..., 4), (..., 4), (..., 4).

    Reference: face_analysis.py:61-135. Note the reference hard-codes the
    0.825 face sampling inside the deltas (``(2 * 0.825)``) and derives a
    square eye box of side ``|x1-x0| / (64*2*0.825) * (64*2.3719/2)``; we keep
    those exact expressions (parameterized) for parity.
    """
    boxes = jnp.asarray(boxes)
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    if angles is None:
        angles = jnp.zeros(boxes.shape[:-1], dtype=boxes.dtype)
    angles = jnp.asarray(angles)

    fc_x = (x0 + x1) / 2.0
    fc_y = (y0 + y1) / 2.0
    # face_analysis.py:101-102
    eye_dx = (CANONICAL_DIST_EYES / 2.0) * (jnp.abs(x1 - x0) / 64.0) / (2 * face_sampling)
    eye_dy = (CANONICAL_TRIANGLE_HEIGHT / 2.0) * (jnp.abs(y1 - y0) / 64.0) / (2 * face_sampling)
    # face_analysis.py:106-108 (square box)
    box_w = (jnp.abs(x1 - x0) / (64.0 * 2 * face_sampling)) * (64.0 * eye_sampling / 2.0)
    box_h = box_w

    rad = angles * jnp.pi / 180.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    # Eyes sit at face-local (-+eye_dx, -eye_dy) rotated into the image by
    # R(angle) = [[c, -s], [s, c]] (y down) -- THE SAME rotation the patch
    # extractor (ops.patches) and the face renderer use. The reference's
    # formulas (face_analysis.py:114-122) use the opposite angle sign
    # because its extractor is called with -angles; porting them verbatim
    # put the eye boxes on the wrong side for rotated faces.
    el_x = fc_x - c * eye_dx + s * eye_dy
    el_y = fc_y - s * eye_dx - c * eye_dy
    er_x = fc_x + c * eye_dx + s * eye_dy
    er_y = fc_y + s * eye_dx - c * eye_dy

    eye_coords = jnp.stack([el_x, el_y, er_x, er_y], axis=-1)
    left_boxes = jnp.stack([el_x - box_w / 2, el_y - box_h / 2,
                            el_x + box_w / 2, el_y + box_h / 2], axis=-1)
    right_boxes = jnp.stack([er_x - box_w / 2, er_y - box_h / 2,
                             er_x + box_w / 2, er_y + box_h / 2], axis=-1)
    return eye_coords, left_boxes, right_boxes


def compute_face_midpoint(eye_left_x, eye_left_y, eye_right_x, eye_right_y,
                          mouth_x, mouth_y):
    """Midpoint of the eye-center and the mouth (face_analysis.py:138-154)."""
    eye_center_x = (eye_left_x + eye_right_x) / 2.0
    eye_center_y = (eye_left_y + eye_right_y) / 2.0
    return (eye_center_x + mouth_x) / 2.0, (eye_center_y + mouth_y) / 2.0


def compute_approximate_mouth_coordinates(eye_coordinates):
    """Infers the mouth from the eyes assuming the canonical 37x42 triangle.

    Args:
        eye_coordinates: (..., 4) [eyeL_x, eyeL_y, eyeR_x, eyeR_y].

    Returns:
        (..., 2) [mouth_x, mouth_y].

    Reference: face_normalization_tools.py:23-47.
    """
    ec = jnp.asarray(eye_coordinates)
    elx, ely, erx, ery = ec[..., 0], ec[..., 1], ec[..., 2], ec[..., 3]
    eye_dx = erx - elx
    eye_dy = ery - ely
    mid_x = (erx + elx) / 2.0
    mid_y = (ery + ely) / 2.0
    r = CANONICAL_TRIANGLE_HEIGHT / CANONICAL_DIST_EYES
    return jnp.stack([mid_x - r * eye_dy, mid_y + r * eye_dx], axis=-1)


def relative_error_detection(app_eye_coords, eye_coords):
    """Max per-eye distance relative to the inter-eye distance.

    Both args are (..., 4) [eyeL_x, eyeL_y, eyeR_x, eyeR_y]; batched version
    of face_analysis.py:158-165.
    """
    a = jnp.asarray(app_eye_coords)
    b = jnp.asarray(eye_coords)
    dist_left = jnp.sqrt(jnp.sum((b[..., 0:2] - a[..., 0:2]) ** 2, axis=-1))
    dist_right = jnp.sqrt(jnp.sum((b[..., 2:4] - a[..., 2:4]) ** 2, axis=-1))
    dist_eyes = jnp.sqrt(jnp.sum((b[..., 0:2] - b[..., 2:4]) ** 2, axis=-1))
    return jnp.maximum(dist_left, dist_right) / dist_eyes


def face_detected(app_eye_coords, eye_coords, factor=0.25):
    """True where the relative eye error is below ``factor``
    (face_analysis.py:168-173)."""
    return relative_error_detection(app_eye_coords, eye_coords) < factor


def pairwise_relative_eye_error(eyes_a, eyes_b):
    """All-pairs relative eye error between two sets of eye coordinates.

    Args:
        eyes_a: (N, 4), eyes_b: (M, 4).
    Returns:
        (N, M) matrix of ``relative_error_detection(eyes_a[i], eyes_b[j])``
        -- the distance normalization uses ``eyes_b`` (the "true" entry),
        matching the reference's NMS which normalizes by the kept entry's
        inter-eye distance (face_analysis.py:214).
    """
    a = jnp.asarray(eyes_a)[:, None, :]
    b = jnp.asarray(eyes_b)[None, :, :]
    return relative_error_detection(a, b)
