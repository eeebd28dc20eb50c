"""Procedural face renderer + dataset helpers (all on-device, vmapped).

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

Renderer v2 (round 2): faces are shaded 2.5-D ellipsoid heads with
procedural multi-octave texture, out-of-plane yaw, structured eyes /
nose / mouth (teeth, smiles), facial hair, textured hair, shoulders +
collars, neighbor-head fragments and a photometric camera pipeline --
closing the synthetic-to-real statistics gap that made round-1 models
blind to photographs. Everything is fused elementwise jax (one jit),
thousands of canvases render per second on a TPU chip.

IMPORTANT label convention: all returned landmark attrs (``eye_l``,
``eye_r``, ``mouth``, ``face_size``, ``angle``) are derived from the ACTUAL
rendered landmark positions (after yaw projection and jitter), exactly the
way a human annotator's eye/mouth clicks would be -- ``face_size`` is
``inter_eye / 0.3504`` and ``angle`` is the eye-line angle. Downstream
label math in training.datasets therefore matches real annotated data by
construction.
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
INTER_EYE = 2 * EYE_X


def _value_noise(key: jax.Array, hw: Tuple[int, int],
                 grids=(6, 12, 24, 48),
                 weights=(0.45, 0.27, 0.18, 0.10)) -> jax.Array:
    """Multi-octave value noise in ~[-1, 1]: bilinear-upsampled random
    lattices. The workhorse texture generator (foliage, skin, hair, cloth)."""
    H, W = hw
    ks = jax.random.split(key, len(grids))
    out = jnp.zeros((H, W), jnp.float32)
    for k, g, w in zip(ks, grids, weights):
        lat = jax.random.uniform(k, (g, g), minval=-1.0, maxval=1.0)
        out = out + w * jax.image.resize(lat, (H, W), "linear")
    return out


def _unit_light(key: jax.Array) -> jax.Array:
    """Random light direction, biased to come from above/front."""
    k1, k2 = jax.random.split(key)
    az = jax.random.uniform(k1, (), minval=-1.2, maxval=1.2)
    el = jax.random.uniform(k2, (), minval=0.15, maxval=1.1)
    lx = jnp.sin(az) * jnp.cos(el)
    ly = -jnp.sin(el)               # from above (y down)
    lz = jnp.cos(az) * jnp.cos(el)
    return jnp.array([lx, ly, lz])


def render_face(key: jax.Array, canvas_hw: Tuple[int, int] = (128, 128),
                face_size: float = 56.0, center=None, angle_deg: float = 0.0,
                with_face: bool = True, attr_cues: str = "v3"
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Renders one face (or pure background) into a grayscale canvas in [0,1].

    Returns (image (H, W), attrs) where attrs holds the ground-truth
    ``age`` (years, 16-58), ``race`` (-2 black skin tone / +2 white),
    ``gender`` (-1 male / +1 female) and the ACTUAL eye/mouth positions in
    canvas coordinates (annotation convention, see module docstring). All
    array arguments may be traced scalars; the function is jit/vmap safe.

    ``attr_cues`` selects the attribute-cue generation ("v2" or "v3",
    a STATIC python switch): every SHIPPED network was trained on the v2
    distribution, and the v3 structural-aging/gender-geometry additions
    were REJECTED for the detection stacks by the round-3 held-out A/Bs
    (docs/ROUND3_NOTES.md sessions 6 and 12) -- the extra appearance
    variance transfers worse. The trainer therefore renders v2 by default
    (TrainConfig.attr_cues) so a fresh ``pfa-train`` reproduces the
    shipped model family; measurement tools keep v3 (the harder test
    distribution this round's panel numbers are defined on).
    """
    v3 = attr_cues == "v3"
    H, W = canvas_hw
    ks = jax.random.split(key, 28)
    if center is None:
        center = (W / 2.0, H / 2.0)
    cx, cy = center
    F = face_size

    # --- sampled identity attributes ---------------------------------------
    age = jax.random.uniform(ks[0], (), minval=16.0, maxval=58.0)
    race = jnp.where(jax.random.bernoulli(ks[1]), 2.0, -2.0)
    gender = jnp.where(jax.random.bernoulli(ks[2]), 1.0, -1.0)
    tone = (0.52 + 0.15 * race / 2.0
            + 0.08 * jax.random.normal(ks[3], ()))          # skin luminance
    a_norm = (age - 37.0) / 21.0                            # [-1, 1]

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    # --- background: blend of scene styles + clutter ------------------------
    kbg = jax.random.split(ks[4], 8)
    tex = _value_noise(kbg[0], (H, W))                       # cluttered
    # foliage-like: high-contrast mid-frequency clutter
    foliage = 0.45 + 0.30 * jnp.tanh(2.5 * tex)
    # shelf/wall-like: quasi-periodic vertical or horizontal structure
    per = jax.random.uniform(kbg[1], (), minval=0.05, maxval=0.35)
    horiz = jax.random.bernoulli(kbg[2])
    coord = jnp.where(horiz, yy, xx)
    stripes = 0.45 + 0.13 * jnp.sin(coord * per) + 0.15 * tex
    # sky/field gradient
    g = jax.random.uniform(kbg[3], (4,), minval=-1.0, maxval=1.0)
    grad = (0.55 + 0.22 * g[0] + 0.20 * g[1] * (yy / H - 0.5)
            + 0.12 * g[2] * (xx / W - 0.5) + 0.05 * tex)
    # flat indoor wall
    flat = 0.42 + 0.25 * g[3] + 0.03 * tex
    wsel = jax.nn.softmax(jax.random.normal(kbg[4], (4,)) * 1.2)
    bg = (wsel[0] * foliage + wsel[1] * stripes + wsel[2] * grad
          + wsel[3] * flat)
    # clutter blobs (dark/bright patches: objects, shadows)
    kc = jax.random.split(kbg[5], 3)
    bcx = jax.random.uniform(kc[0], (3, 2), minval=0.0,
                             maxval=1.0) * jnp.array([W, H])
    bsz = jax.random.uniform(kc[1], (3,), minval=0.08, maxval=0.35)
    bto = jax.random.uniform(kc[2], (3,), minval=-0.35, maxval=0.35)
    for i in range(3):
        r2 = (((xx - bcx[i, 0]) / (bsz[i] * W)) ** 2
              + ((yy - bcx[i, 1]) / (bsz[i] * H)) ** 2)
        bg = bg + bto[i] * jnp.exp(-r2)
    bg = bg + 0.03 * jax.random.normal(kbg[6], (H, W))

    def _camera(img, kcam):
        """Shared photometric pipeline: blur blend, gamma, contrast,
        vignette, sensor noise."""
        kc = jax.random.split(kcam, 5)
        blur = (img + jnp.roll(img, 1, 0) + jnp.roll(img, -1, 0)
                + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1)) / 5.0
        blur2 = (blur + jnp.roll(blur, 2, 0) + jnp.roll(blur, -2, 0)
                 + jnp.roll(blur, 2, 1) + jnp.roll(blur, -2, 1)) / 5.0
        t = jax.random.uniform(kc[0], (), minval=0.0, maxval=1.0)
        img = img * (1 - t) + jnp.where(t < 0.5, blur, blur2) * t
        gamma = jnp.exp(jax.random.uniform(kc[1], (), minval=-0.35,
                                           maxval=0.35))
        img = jnp.clip(img, 0.0, 1.0) ** gamma
        cont = jax.random.uniform(kc[2], (), minval=0.75, maxval=1.15)
        img = 0.5 + (img - 0.5) * cont
        vig = jax.random.uniform(kc[3], (), minval=0.0, maxval=0.25)
        r2 = ((xx / W - 0.5) ** 2 + (yy / H - 0.5) ** 2) * 4.0
        img = img * (1.0 - vig * r2)
        img = img + 0.012 * jax.random.normal(kc[4], (H, W))
        return jnp.clip(img, 0.0, 1.0)

    if not with_face:
        return _camera(bg, ks[5]), {
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

    # Head ellipsoid semi-axes with identity jitter; age elongates slightly,
    # male faces are wider.
    kshape = jax.random.split(ks[6], 6)
    ax = 0.335 * (1.0 + 0.05 * (gender < 0)
                  + 0.05 * jax.random.normal(kshape[0], ()))
    ay = 0.465 * (1.0 + 0.08 * a_norm
                  + 0.05 * jax.random.normal(kshape[1], ()))
    az = 0.38
    # Out-of-plane yaw: features shift horizontally by yaw * depth(u, v).
    yaw = jax.random.uniform(kshape[2], (), minval=-0.30, maxval=0.30)

    e = (u / ax) ** 2 + ((v + 0.02) / ay) ** 2
    head = jax.nn.sigmoid((1.0 - e) / 0.04)
    depth = az * jnp.sqrt(jnp.clip(1.0 - e, 0.0, 1.0))       # ellipsoid z

    # --- Lambertian shading from ellipsoid normals -------------------------
    L = _unit_light(ks[7])
    inv_d = 1.0 / jnp.maximum(depth, 0.05)
    nx_ = (u / ax ** 2)
    ny_ = ((v + 0.02) / ay ** 2)
    nz_ = inv_d * 0.0 + 1.0 / az                              # ~constant
    nrm = jnp.sqrt(nx_ ** 2 + ny_ ** 2 + nz_ ** 2)
    ndl = (nx_ * L[0] + ny_ * L[1] + nz_ * L[2]) / nrm
    shade = 0.62 + 0.38 * jnp.clip(ndl, -0.2, 1.0)

    # Skin: tone * shading + low-frequency texture + age wrinkles.
    kskin = jax.random.split(ks[8], 3)
    skin_tex = _value_noise(kskin[0], (H, W), grids=(12, 24, 48),
                            weights=(0.4, 0.35, 0.25))
    wr_amp = 0.05 * jnp.clip(a_norm + 1.0, 0.0, 2.0) / 2.0
    skin = tone * shade + 0.035 * skin_tex + wr_amp * skin_tex
    skin = skin + 0.04 * jax.random.normal(kskin[1], ()) * v  # vert grade

    # --- facial features (positions yaw-projected + jittered) --------------
    kfeat = jax.random.split(ks[9], 10)
    jit = 0.010 * jax.random.normal(kfeat[0], (6,))

    def proj_u(fu, fv):
        """Yaw projection: u' = u cos(yaw) + depth(u,v) sin(yaw)."""
        d = az * jnp.sqrt(jnp.clip(
            1.0 - (fu / ax) ** 2 - ((fv + 0.02) / ay) ** 2, 0.0, 1.0))
        return fu * jnp.cos(yaw) + d * jnp.sin(yaw)

    eye_y_l = EYE_Y + jit[1]
    eye_y_r = EYE_Y + jit[2]
    eye_u_l = proj_u(-EYE_X + jit[0], EYE_Y)
    eye_u_r = proj_u(EYE_X + jit[0], EYE_Y)
    mouth_u = proj_u(0.0 + jit[3], MOUTH_Y)
    mouth_v = MOUTH_Y + jit[4]
    # Continuous age coordinate in [0, 1] over the 16-58y label range:
    # structural aging cues below must GROW with it smoothly -- real
    # wrinkles/sag don't switch on at the range midpoint (renderer v3;
    # the v2 clip(a_norm, 0, 1) gating left ages 16-37 with nothing but
    # confounded contrast cues, feature-ceiling MAE 6.3y).
    age01 = jnp.clip((age - 16.0) / 42.0, 0.0, 1.0)
    # Female eyes render slightly larger (real photogrammetric cue; v3).
    eye_w = 0.055 * (1.0 + 0.15 * jax.random.normal(kfeat[1], ())
                     + (0.08 * (gender > 0) if v3 else 0.0))

    def blob(du, dv, su, sv):
        return jnp.exp(-((u - du) / su) ** 2 - ((v - dv) / sv) ** 2)

    feats = jnp.zeros_like(u)
    # Eyes: bright sclera band, dark iris, darker pupil, lid shadow above.
    iris_r = 0.024 * (1.0 + 0.2 * jax.random.normal(kfeat[2], ()))
    eye_dark = 0.55 + 0.10 * jax.random.normal(kfeat[3], ())
    # Lid shadow deepens and the under-eye bag darkens with age (both
    # amplitude-jittered so neither pins the age alone; v3 -- v2 uses the
    # fixed lid shade and no bag).
    if v3:
        lid_amp = 0.14 + 0.10 * age01 * jnp.exp(
            0.30 * jax.random.normal(kfeat[7], ()))
        bag_amp = 0.11 * age01 * jnp.exp(
            0.30 * jax.random.normal(kfeat[8], ()))
    else:
        lid_amp, bag_amp = 0.18, 0.0
    for eu, ev in ((eye_u_l, eye_y_l), (eye_u_r, eye_y_r)):
        sclera = blob(eu, ev, eye_w, 0.024)
        iris = blob(eu, ev, iris_r, iris_r)
        pupil = blob(eu, ev, iris_r * 0.45, iris_r * 0.45)
        lid = blob(eu, ev - 0.030, eye_w * 1.15, 0.012)
        bag = blob(eu, ev + 0.048, eye_w * 1.05, 0.017)
        feats = (feats + 0.22 * sclera - eye_dark * iris - 0.25 * pupil
                 - lid_amp * lid - bag_amp * bag)
    # Brows: thicker/darker for male, slight angle jitter.
    brow_h = 0.014 + 0.012 * (gender < 0)
    brow_d = 0.22 + 0.12 * (gender < 0)
    brow_t = 0.025 * jax.random.normal(kfeat[4], ())
    # Female brows sit measurably higher above the eye (strong 96x96-visible
    # gender geometry); jittered so it stays a soft cue (v3).
    brow_lift = ((0.014 * (gender > 0)
                  + 0.006 * jax.random.normal(kfeat[9], ()))
                 if v3 else 0.0)
    for eu, sgn in ((eye_u_l, -1.0), (eye_u_r, 1.0)):
        bv = EYE_Y - 0.085 - brow_lift + brow_t * sgn * (u - eu) / 0.09
        feats = feats - brow_d * jnp.exp(
            -((u - eu) / 0.085) ** 2 - ((v - bv) / brow_h) ** 2)
    # Nose: bridge highlight, side shadow (away from light), nostrils.
    nose_u = proj_u(0.0, 0.03)
    feats = feats + 0.10 * blob(nose_u, 0.02, 0.022, 0.095)
    shadow_side = jnp.sign(L[0] + 1e-6)
    feats = feats - 0.13 * blob(nose_u + shadow_side * 0.045, 0.05,
                                0.030, 0.075)
    feats = feats - 0.16 * (blob(nose_u - 0.030, 0.115, 0.016, 0.012)
                            + blob(nose_u + 0.030, 0.115, 0.016, 0.012))
    # Mouth: two lips, dark mid-line, optional smile + teeth.
    smile = jax.random.uniform(kfeat[5], (), minval=0.0, maxval=1.0)
    open_m = jax.random.uniform(kfeat[6], (), minval=0.0, maxval=1.0)
    # Smile curvature: mouth CORNERS bend up (smaller v) with smile.
    curve = -0.045 * smile * (((u - mouth_u) / 0.10) ** 2 - 0.5)
    mv = v - mouth_v - curve
    lip_dark = (0.16 + 0.10 * (gender > 0)) * (1.0 - 0.12 * a_norm)
    feats = feats - lip_dark * jnp.exp(-((u - mouth_u) / 0.10) ** 2
                                       - (mv / 0.028) ** 2)
    feats = feats - 0.16 * jnp.exp(-((u - mouth_u) / 0.095) ** 2
                                   - (mv / 0.008) ** 2)
    teeth = 0.32 * smile * open_m
    feats = feats + teeth * jnp.exp(-((u - mouth_u) / 0.070) ** 2
                                    - (mv / 0.013) ** 2)
    # Chin crease + forehead highlight + cheek modulation.
    feats = feats - 0.08 * blob(mouth_u, MOUTH_Y + 0.11, 0.06, 0.015)
    feats = feats + 0.07 * blob(proj_u(0.0, -0.30), -0.30, 0.22, 0.10)

    # Feature contrast fades slightly with age; a global per-face feature
    # amplitude (domain randomization: the nets must not depend on one
    # canonical feature contrast).
    famp = jnp.exp(jax.random.uniform(ks[16], (), minval=-0.45,
                                      maxval=0.30))
    feats = feats * famp * (1.0 - 0.10 * jnp.clip(a_norm, -1.0, 1.0))

    # --- localized wrinkle structures (older faces) -------------------------
    # Distinct spatial STRUCTURE -- forehead lines, crow's feet, nasolabial
    # folds -- not just texture amplitude (which is confounded with the
    # random skin texture): this is what makes age learnable from 96x96
    # patches. Amplitudes jittered so no single cue pins the age exactly.
    age_w = ((age01 ** 1.6 if v3 else jnp.clip(a_norm, 0.0, 1.0))
             * jnp.exp(0.35 * jax.random.normal(ks[17], ())))
    # Line period ~0.16 face units =~ 11 px in the decimated 96x96 age
    # patch (a 110-rad/unit frequency aliased out entirely).
    lines = 0.5 + 0.5 * jnp.sin(v * 40.0 + 2.0 * skin_tex)
    forehead = (jnp.exp(-((v + 0.26) / 0.06) ** 2)
                * jnp.exp(-(u / 0.20) ** 2))
    crow = jnp.zeros_like(u)
    for sgn in (-1.0, 1.0):
        crow = crow + blob(sgn * EYE_X * 1.62, EYE_Y + 0.012, 0.035, 0.05)
    naso = jnp.zeros_like(u)
    for sgn in (-1.0, 1.0):
        d = u - sgn * (0.065 + 0.55 * (v - 0.02))
        band = (jax.nn.sigmoid((v - 0.00) / 0.02)
                * jax.nn.sigmoid((0.16 - v) / 0.03))
        naso = naso + jnp.exp(-(d / 0.013) ** 2) * band
    # Jowl/cheek sag: soft shadows at the lower-face corners, growing with
    # the same continuous age weight.
    jowl = jnp.zeros_like(u)
    for sgn in (-1.0, 1.0):
        jowl = jowl + blob(sgn * 0.21, 0.27, 0.05, 0.055)
    feats = feats - age_w * (0.11 * forehead * lines
                             + 0.10 * crow * lines
                             + 0.09 * naso
                             + (0.07 if v3 else 0.0) * jowl)

    # --- facial hair (some males): darken jaw/lip region --------------------
    kbeard = jax.random.split(ks[10], 3)
    has_beard = (gender < 0) & (jax.random.uniform(kbeard[0], ()) < 0.40)
    beard_d = jax.random.uniform(kbeard[1], (), minval=0.15, maxval=0.5)
    beard_tex = _value_noise(kbeard[2], (H, W), grids=(24, 48),
                             weights=(0.5, 0.5))
    jaw = (jax.nn.sigmoid((v - 0.10) / 0.03)
           * jax.nn.sigmoid((0.92 - e) / 0.05))
    stache = blob(mouth_u, mouth_v - 0.055, 0.09, 0.018)
    beard_mask = jnp.clip(jaw + 0.8 * stache, 0.0, 1.0) \
        * jnp.where(has_beard, 1.0, 0.0)
    # carve out the mouth itself
    beard_mask = beard_mask * (1.0 - jnp.exp(-((u - mouth_u) / 0.10) ** 2
                                             - (mv / 0.03) ** 2))

    # --- hair: textured cap with noisy hairline, covers sides/ears ---------
    khair = jax.random.split(ks[11], 5)
    has_hair = jax.random.uniform(khair[0], ()) > 0.15
    hairline = jax.random.uniform(khair[1], (), minval=-0.42, maxval=-0.22)
    # Male-pattern hairline recession: the hairline retreats upward with
    # age (male only, extent jittered) -- a joint age+gender cue (v3).
    if v3:
        hairline = hairline - (0.12 * age01 * (gender < 0)
                               * jax.random.uniform(ks[20], (),
                                                    minval=0.3, maxval=1.0))
    hair_tone = jax.random.uniform(khair[2], (), minval=0.04, maxval=0.45)
    # Gray hair with age (strong real-world cue): gradual onset from the
    # mid-40s in v3, ~50 in v2; extent jittered so hair tone alone cannot
    # pin the age.
    gray = (jax.nn.sigmoid((age - 47.0) / 5.0 if v3 else (age - 52.0) / 4.0)
            * jax.random.uniform(ks[18], (), minval=0.4, maxval=1.0))
    hair_tone = hair_tone + gray * (0.78 - hair_tone)
    hair_tex = _value_noise(khair[3], (H, W), grids=(12, 48),
                            weights=(0.5, 0.5))
    side_cov = jax.random.uniform(khair[4], (), minval=0.0, maxval=1.0)
    e_hair = (u / (ax * 1.16)) ** 2 + ((v + 0.05) / (ay * 1.12)) ** 2
    cap = (jax.nn.sigmoid((1.0 - e_hair) / 0.05)
           * jax.nn.sigmoid((hairline + 0.05 * hair_tex - v) / 0.035))
    sides = (jax.nn.sigmoid((1.0 - e_hair) / 0.05)
             * jax.nn.sigmoid((e - 0.72) / 0.10)
             * jax.nn.sigmoid((0.1 - v) / 0.25) * side_cov)
    # Long hair framing the face down to the shoulders -- strongly
    # gender-correlated (a cue the gender head can actually see at 96x96,
    # unlike fine skin detail), with enough male long-hair / female
    # short-hair examples that it stays a soft cue.
    p_long = jnp.where(gender > 0, 0.55, 0.08)
    has_long = jax.random.uniform(ks[19], ()) < p_long
    long_mask = (jax.nn.sigmoid((e - 0.85) / 0.10)
                 * jax.nn.sigmoid((0.50 - v) / 0.10)
                 * jax.nn.sigmoid((v + 0.30) / 0.12)
                 * jax.nn.sigmoid((1.9 - e_hair) / 0.15)
                 * jnp.where(has_long, 1.0, 0.0))
    hair_mask = jnp.clip(cap + sides + long_mask, 0.0, 1.0) \
        * jnp.where(has_hair, 1.0, 0.0)

    # --- shoulders / clothing / collar below the head ----------------------
    kcloth = jax.random.split(ks[12], 5)
    cloth_tone = jax.random.uniform(kcloth[0], (), minval=0.1, maxval=0.7)
    cloth_tex = _value_noise(kcloth[1], (H, W), grids=(10, 30),
                             weights=(0.6, 0.4))
    sh_y = jax.random.uniform(kcloth[2], (), minval=0.55, maxval=0.75)
    sh_w = jax.random.uniform(kcloth[3], (), minval=0.7, maxval=1.1)
    shoulders = jax.nn.sigmoid((v - (sh_y + 0.25 * (u / sh_w) ** 2)) / 0.04)
    cloth = cloth_tone + 0.10 * cloth_tex
    has_collar = jax.random.uniform(kcloth[4], ()) < 0.45
    collar = (jnp.exp(-(jnp.abs(u) / 0.10) ** 2)
              * jax.nn.sigmoid((v - sh_y) / 0.03)
              * jax.nn.sigmoid(((sh_y + 0.22) - v) / 0.05)
              * jnp.where(has_collar, 1.0, 0.0))
    cloth = cloth * (1.0 - 0.9 * collar) + 0.85 * collar

    # --- glasses on ~30% of faces ------------------------------------------
    kglass = jax.random.split(ks[13], 2)
    has_glasses = jax.random.uniform(kglass[0], ()) < 0.3
    rr = jax.random.uniform(kglass[1], (), minval=0.070, maxval=0.10)

    def ring(du, dv):
        r = jnp.sqrt(((u - du) / 1.2) ** 2 + (v - dv) ** 2)
        return jnp.exp(-((r - rr) / 0.010) ** 2)

    bridge = jnp.exp(-((u - nose_u) / 0.045) ** 2
                     - ((v - EYE_Y) / 0.010) ** 2)
    glasses = (ring(eye_u_l, eye_y_l) + ring(eye_u_r, eye_y_r) + bridge) \
        * jnp.where(has_glasses, 1.0, 0.0)

    # --- composite -----------------------------------------------------------
    face_val = skin + feats - 0.30 * glasses
    face_val = face_val * (1.0 - beard_d * beard_mask)
    img = bg
    # neighbor-head fragment near the canvas edge (group-photo context)
    knb = jax.random.split(ks[14], 4)
    has_nb = jax.random.uniform(knb[0], ()) < 0.35
    nb_side = jnp.where(jax.random.bernoulli(knb[1]), 1.0, -1.0)
    nb_u = nb_side * jax.random.uniform(knb[2], (), minval=0.85, maxval=1.3)
    nb_v = jax.random.uniform(knb[3], (), minval=-0.3, maxval=0.4)
    e_nb = ((u - nb_u) / (ax * 1.1)) ** 2 + ((v - nb_v) / (ay * 1.1)) ** 2
    nb_mask = jax.nn.sigmoid((1.0 - e_nb) / 0.05) * \
        jnp.where(has_nb, 1.0, 0.0)
    nb_tone = tone * (0.9 + 0.2 * jax.random.normal(knb[0], ()))
    nb_face = (nb_tone * shade
               - 0.15 * jnp.exp(-((v - nb_v - EYE_Y * 0.8) / 0.04) ** 2)
               - 0.10 * jnp.exp(-((v - nb_v - MOUTH_Y * 0.8) / 0.03) ** 2))
    # neighbor hair cap
    nb_hairm = jax.nn.sigmoid(((nb_v - 0.30) - v) / 0.04)
    nb_face = nb_face * (1.0 - nb_hairm) + hair_tone * nb_hairm
    img = img * (1.0 - nb_mask) + nb_mask * nb_face
    # torso, then neck, then head on top
    body = jnp.clip(shoulders - head, 0.0, 1.0)
    img = img * (1.0 - body) + cloth * body
    # Male necks render visibly wider (gender geometry cue at 96x96).
    neck_w = 0.14 * (1.0 + (0.20 * (gender < 0) if v3 else 0.0))
    neck = (jnp.exp(-(jnp.abs(u) / neck_w) ** 3)
            * jax.nn.sigmoid((v - 0.38) / 0.04)
            * jax.nn.sigmoid((sh_y + 0.12 - v) / 0.05) * (1.0 - head))
    neck_tone = tone * 0.86 * shade      # chin shadow
    img = img * (1.0 - neck) + neck_tone * neck
    img = img * (1.0 - head) + face_val * head
    img = img * (1.0 - hair_mask) + \
        (hair_tone + 0.12 * hair_tex) * hair_mask
    img = _camera(img, ks[15])

    # --- ground-truth landmarks (annotation convention) ---------------------
    def to_canvas(fu, fv):
        return jnp.array([cx + (c * fu - s * fv) * F,
                          cy + (s * fu + c * fv) * F])

    eye_l = to_canvas(eye_u_l, eye_y_l)
    eye_r = to_canvas(eye_u_r, eye_y_r)
    mouth = to_canvas(mouth_u, mouth_v)
    inter = jnp.sqrt(jnp.sum((eye_r - eye_l) ** 2))
    f_eff = inter / INTER_EYE
    ang_eff = jnp.rad2deg(jnp.arctan2(eye_r[1] - eye_l[1],
                                      eye_r[0] - eye_l[0]))

    attrs = {
        "age": age, "race": race, "gender": gender,
        "eye_l": eye_l, "eye_r": eye_r, "mouth": mouth,
        "face_size": f_eff, "angle": ang_eff,
    }
    return img, attrs


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
