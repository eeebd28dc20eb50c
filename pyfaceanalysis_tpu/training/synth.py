"""Procedural face renderer + dataset builders (all on-device, vmapped).

Canonical face geometry (derived from the reference's eye-box math,
face_analysis.py:24-135): for a face of nominal size F (the size of a
perfectly-centered detection box), with y pointing down:

    eyes   at (+-0.1752 F, -0.1989 F) relative to the face center
    mouth  at (0, +0.1989 F)
    inter-eye distance E = 0.3504 F

The Scale regression label of a box of side b containing a face of nominal
size F is ``0.825 * b / F`` (update rule ``width = old / reg * 0.825``,
face_analysis.py:820-833, maps the box onto b = F). Position labels are
measured in the 128-unit regression frame: ``dx = (box_cx - face_cx) * 128 /
b``. Angle labels are the residual in-plane angle in degrees.

Faces are rendered as smooth analytic luminance fields (sigmoid-edged
ellipses, Gaussian features), so the renderer is one fused elementwise jax
program -- thousands of faces render per second on a TPU chip, and the same
code runs under the CPU test mesh.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Canonical layout constants (see module docstring).
EYE_X = 0.1752      # horizontal eye offset / F
EYE_Y = -0.1989     # vertical eye offset / F (up)
MOUTH_Y = 0.1989


def render_face(key: jax.Array, canvas_hw: Tuple[int, int] = (128, 128),
                face_size: float = 56.0, center=None, angle_deg: float = 0.0,
                with_face: bool = True) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Renders one face (or pure background) into a grayscale canvas in [0,1].

    Returns (image (H, W), attrs) where attrs holds the ground-truth
    ``age`` (years, 16-58), ``race`` (-2 black skin tone / +2 white),
    ``gender`` (-1 male / +1 female) and eye/mouth positions in canvas
    coordinates. All arguments may be traced scalars; the function is
    jit/vmap safe.
    """
    H, W = canvas_hw
    ks = jax.random.split(key, 16)
    if center is None:
        center = (W / 2.0, H / 2.0)
    cx, cy = center
    F = face_size

    # --- sampled identity attributes --------------------------------------
    age = jax.random.uniform(ks[0], (), minval=16.0, maxval=58.0)
    race = jnp.where(jax.random.bernoulli(ks[1]), 2.0, -2.0)
    gender = jnp.where(jax.random.bernoulli(ks[2]), 1.0, -1.0)
    tone = (0.47 + 0.14 * race / 2.0
            + 0.05 * jax.random.normal(ks[3], ()))          # skin luminance
    a_norm = (age - 37.0) / 21.0                            # [-1, 1]

    # --- background --------------------------------------------------------
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    g = jax.random.uniform(ks[4], (6,), minval=-1.0, maxval=1.0)
    bg = (0.5 + 0.25 * g[0]
          + 0.18 * g[1] * (xx / W - 0.5) + 0.18 * g[2] * (yy / H - 0.5)
          + 0.07 * jnp.cos(2 * jnp.pi * (g[3] * 3 * xx / W + g[4] * 3 * yy / H)
                           + g[5] * 3.0))
    bg = bg + 0.04 * jax.random.normal(ks[5], (H, W))

    if not with_face:
        return jnp.clip(bg, 0.0, 1.0), {
            "age": age, "race": race, "gender": gender,
            "eye_l": jnp.zeros(2), "eye_r": jnp.zeros(2),
            "mouth": jnp.zeros(2), "face_size": jnp.float32(0.0),
            "angle": jnp.zeros(()),
        }

    # --- face-local frame (u right, v down, in units of F) -----------------
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    dx, dy = xx - cx, yy - cy
    u = (c * dx + s * dy) / F
    v = (-s * dx + c * dy) / F

    # Head ellipse; age elongates (a strong global cue the linear age net
    # can pick up), male faces are slightly wider.
    ax = 0.335 * (1.0 + 0.05 * (gender < 0))
    ay = 0.465 * (1.0 + 0.10 * a_norm)
    e = (u / ax) ** 2 + ((v + 0.02) / ay) ** 2
    head = jax.nn.sigmoid((1.0 - e) / 0.045)

    light = jax.random.uniform(ks[6], (2,), minval=-0.12, maxval=0.12)
    skin = tone + light[0] * u + light[1] * v

    def blob(du, dv, su, sv):
        return jnp.exp(-((u - du) / su) ** 2 - ((v - dv) / sv) ** 2)

    eye_dark = 0.40 + 0.08 * jax.random.normal(ks[7], ())
    feats = -eye_dark * (blob(-EYE_X, EYE_Y, 0.058, 0.030)
                         + blob(EYE_X, EYE_Y, 0.058, 0.030))
    feats -= 0.55 * eye_dark * (blob(-EYE_X, EYE_Y, 0.020, 0.020)
                                + blob(EYE_X, EYE_Y, 0.020, 0.020))
    brow_h = 0.016 + 0.016 * (gender < 0)           # males: thicker brows
    feats -= 0.30 * (blob(-EYE_X, EYE_Y - 0.075, 0.085, brow_h)
                     + blob(EYE_X, EYE_Y - 0.075, 0.085, brow_h))
    lip_dark = 0.30 + 0.12 * (gender > 0)           # females: darker lips
    feats -= lip_dark * blob(0.0, MOUTH_Y, 0.105, 0.034)
    feats -= 0.12 * blob(0.0, 0.05, 0.028, 0.105)   # nose shading
    feats += 0.10 * blob(0.0, -0.30, 0.22, 0.10)    # forehead highlight

    # Age wrinkles: high-frequency texture whose amplitude grows with age;
    # feature contrast also fades slightly with age (a global cue).
    feats = feats * (1.0 - 0.12 * jnp.clip(a_norm, -1.0, 1.0))
    wr_amp = 0.09 * jnp.clip(a_norm + 1.0, 0.0, 2.0) / 2.0
    phase = jax.random.uniform(ks[8], (), maxval=6.28)
    feats += wr_amp * jnp.sin(v * 55.0 + phase) * blob(0.0, -0.25, 0.25, 0.12)
    feats += wr_amp * jnp.sin(u * 48.0 + phase) * (
        blob(-EYE_X, EYE_Y + 0.09, 0.09, 0.05) + blob(EYE_X, EYE_Y + 0.09, 0.09, 0.05))

    # Hair: dark cap above the forehead (outer head ellipse minus a
    # hairline), present on most faces. Real photos rarely show bald,
    # hairless heads like pure ellipse renders.
    khair = jax.random.split(ks[10], 4)
    has_hair = jax.random.uniform(khair[0], ()) > 0.15
    hairline = jax.random.uniform(khair[1], (), minval=-0.40, maxval=-0.24)
    hair_tone = jax.random.uniform(khair[2], (), minval=0.05, maxval=0.35)
    e_hair = (u / (ax * 1.18)) ** 2 + ((v + 0.06) / (ay * 1.12)) ** 2
    hair_mask = (jax.nn.sigmoid((1.0 - e_hair) / 0.05)
                 * jax.nn.sigmoid((hairline - v) / 0.03)
                 * jnp.where(has_hair, 1.0, 0.0))

    # Glasses on ~30% of faces: dark rings around both eyes + a bridge bar
    # (label-neutral; eye centers stay canonical).
    kglass = jax.random.split(ks[11], 2)
    has_glasses = jax.random.uniform(kglass[0], ()) < 0.3
    rr = jax.random.uniform(kglass[1], (), minval=0.075, maxval=0.10)
    def ring(du, dv):
        r = jnp.sqrt(((u - du) / 1.15) ** 2 + (v - dv) ** 2)
        return jnp.exp(-((r - rr) / 0.012) ** 2)
    bridge = jnp.exp(-(u / 0.045) ** 2 - ((v - EYE_Y) / 0.012) ** 2)
    glasses = (ring(-EYE_X, EYE_Y) + ring(EYE_X, EYE_Y) + bridge) \
        * jnp.where(has_glasses, 1.0, 0.0)

    face_val = skin + feats - 0.25 * glasses
    img = bg * (1.0 - head) + face_val * head
    img = img * (1.0 - hair_mask) + hair_tone * hair_mask
    img = img + 0.015 * jax.random.normal(ks[9], (H, W))
    # Photometric augmentation: random gamma (exposure variation).
    gamma = jnp.exp(jax.random.uniform(ks[12], (), minval=-0.3, maxval=0.3))
    img = jnp.clip(img, 0.0, 1.0) ** gamma

    # Ground-truth landmark positions in canvas coordinates.
    def to_canvas(fu, fv):
        return jnp.array([cx + (c * fu - s * fv) * F, cy + (s * fu + c * fv) * F])

    attrs = {
        "age": age, "race": race, "gender": gender,
        "eye_l": to_canvas(-EYE_X, EYE_Y), "eye_r": to_canvas(EYE_X, EYE_Y),
        "mouth": to_canvas(0.0, MOUTH_Y), "face_size": jnp.float32(F),
        "angle": jnp.float32(angle_deg) * jnp.ones(()),
    }
    return jnp.clip(img, 0.0, 1.0), attrs


render_faces = jax.jit(
    jax.vmap(render_face, in_axes=(0,)), static_argnames=())


def ou_walk(key: jax.Array, n: int, lo: float, hi: float,
            step: float = 0.22, theta: float = 0.12) -> jax.Array:
    """Mean-reverting random walk of length n inside [lo, hi] (for SFA
    temporal training: consecutive samples differ slowly)."""
    mid, half = (lo + hi) / 2.0, (hi - lo) / 2.0
    eps = jax.random.normal(key, (n,))

    def body(x, e):
        x = x + theta * (0.0 - x) + step * e
        x = jnp.clip(x, -1.0, 1.0)
        return x, x

    x0 = jnp.clip(eps[0], -1.0, 1.0)
    _, xs = jax.lax.scan(body, x0, eps)
    return mid + half * xs
