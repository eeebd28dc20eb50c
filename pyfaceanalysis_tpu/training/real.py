"""Real-photo training canvases: annotated faces + hard-negative crops.

The reference was trained on large annotated corpora normalized through
face_normalization_tools.py; this environment ships only a handful of real
photographs, so they are used as ANCHORS: each annotated face is warped
(rotation + scale, the same affine family as ops.patches) into training
canvases at many sizes/angles/mirrorings and mixed into the synthetic pools
(training.datasets) -- pulling the HiGSFA feature statistics toward real
image statistics without giving up the synthetic renderer's unlimited label
coverage. Non-face regions of the same photos become hard-negative
background canvases for the Disc classes.

The canvases carry the SAME attrs dict as training.synth.render_face, with
landmarks derived from the annotation through the exact warp affine, so the
label math in training.datasets applies unchanged.

The canonical evaluation photo (TNS-Group.jpg) is deliberately NOT in the
default annotation file (data/train_faces_gt.txt) -- it stays test-only.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from pyfaceanalysis_tpu.training.synth import INTER_EYE

DEFAULT_GT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "data",
    "train_faces_gt.txt")


class RealFaceSource:
    """Loads annotated photos once (device-resident, mirrored copies
    included) and samples face / background canvases on demand."""

    def __init__(self, gt_file: str = DEFAULT_GT, verbose: bool = True,
                 mined_file: str = ""):
        import jax.numpy as jnp

        from pyfaceanalysis_tpu.io.images import load_image
        from pyfaceanalysis_tpu.io.writers import load_true_coordinates

        filenames, coords = load_true_coordinates("", gt_file)
        base_images: List[np.ndarray] = []
        img_of_face: List[int] = []
        path_to_idx: Dict[str, int] = {}
        for fn in filenames:
            if fn not in path_to_idx:
                arr, _ = load_image(fn, prescale_size=None)
                path_to_idx[fn] = len(base_images)
                base_images.append(arr)
            img_of_face.append(path_to_idx[fn])

        # Aliasing variants: the reference prescales big photos with
        # NEAREST (3.6x for the canonical image) -- decimate-then-replicate
        # reproduces that aliasing at UNCHANGED coordinates, so detection
        # statistics match what the model sees at inference.
        def alias(a: np.ndarray, f: int) -> np.ndarray:
            d = np.repeat(np.repeat(a[::f, ::f], f, axis=0), f, axis=1)
            return d[: a.shape[0], : a.shape[1]]

        images: List[np.ndarray] = []
        variant_of: List[int] = []          # variant idx -> base image idx
        for bi, a in enumerate(base_images):
            for f in (1, 2, 3):
                images.append(a if f == 1 else alias(a, f))
                variant_of.append(bi)

        H = max(a.shape[0] for a in images)
        W = max(a.shape[1] for a in images)
        stack = np.zeros((2 * len(images), H, W), np.float32)
        valid = np.zeros((2 * len(images), H, W), np.float32)
        sizes = np.zeros((len(images), 2), np.int64)
        for i, a in enumerate(images):
            stack[i, :a.shape[0], :a.shape[1]] = a
            # mirrored copy (flip x within the VALID region)
            stack[len(images) + i, :a.shape[0], :a.shape[1]] = a[:, ::-1]
            valid[i, :a.shape[0], :a.shape[1]] = 1.0
            valid[len(images) + i, :a.shape[0], :a.shape[1]] = 1.0
            sizes[i] = a.shape
        self._stack = jnp.asarray(stack)
        self._valid = jnp.asarray(valid)
        self._sizes = sizes
        self._n_images = len(images)

        # Face records: (img_idx, eye_l, eye_r, mouth), replicated per
        # aliasing variant, each with a mirrored twin.
        faces = []
        for j, row in enumerate(coords):
            bi = img_of_face[j]
            el = row[0:2].copy()
            er = row[2:4].copy()
            mo = row[6:8].copy()
            w = sizes[bi * 3][1]
            flip = lambda p: np.array([w - 1.0 - p[0], p[1]])
            for v in range(3):
                ii = bi * 3 + v
                faces.append((ii, el, er, mo))
                # mirroring swaps left and right eyes
                faces.append((self._n_images + ii, flip(er), flip(el),
                              flip(mo)))
        self._faces = faces
        # Inflated face boxes per UNMIRRORED variant (background rejection).
        self._face_boxes: Dict[int, List[Tuple[float, float, float]]] = {}
        for (ii, el, er, mo) in faces[::2]:
            cx = (el[0] + er[0]) / 2.0
            cy = ((el[1] + er[1]) / 2.0 + mo[1]) / 2.0
            F = float(np.hypot(*(er - el))) / INTER_EYE
            self._face_boxes.setdefault(ii, []).append((cx, cy, F))
        if verbose:
            print(f"[real] {len(coords)} annotated faces over "
                  f"{self._n_images} photos ({gt_file})")

        # filename -> base-image index (both full path and basename keys),
        # for mined hard-negative box resolution.
        self._path_to_base: Dict[str, int] = dict(path_to_idx)
        for fn, bi in list(path_to_idx.items()):
            self._path_to_base.setdefault(os.path.basename(fn), bi)
        self._base_name: Dict[int, str] = {
            bi: os.path.basename(fn) for fn, bi in path_to_idx.items()}
        self._mined = np.zeros((0, 5), np.float32)  # (bi, cx, cy, side, ang)
        if mined_file:
            self.load_mined(mined_file, verbose=verbose)

    @property
    def num_faces(self) -> int:
        return len(self._faces)

    @property
    def num_mined(self) -> int:
        return len(self._mined)

    def load_mined(self, mined_file: str, verbose: bool = True) -> None:
        """Load mined hard-negative boxes (tools/mine_hard_negatives.py):
        lines of ``filename x0 y0 x1 y1 angle`` in FULL-RESOLUTION photo
        coordinates. Boxes on photos absent from the annotation file are
        skipped (their pixels are not in the device stack)."""
        rows = []
        skipped = 0
        with open(mined_file) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                fn = parts[0]
                bi = self._path_to_base.get(
                    fn, self._path_to_base.get(os.path.basename(fn)))
                if bi is None:
                    skipped += 1
                    continue
                x0, y0, x1, y1, ang = map(float, parts[1:6])
                rows.append((bi, (x0 + x1) / 2.0, (y0 + y1) / 2.0,
                             abs(x1 - x0) + 1.0, ang))
        self._mined = np.asarray(rows, np.float32).reshape(-1, 5)
        if verbose:
            msg = f"[real] {len(rows)} mined hard-negative boxes"
            if skipped:
                msg += f" ({skipped} skipped: photo not in stack)"
            print(msg)

    def sample_mined_patches(self, seed: int, n: int,
                             patch_hw: Tuple[int, int] = (64, 64)):
        """n net-geometry patches centered (with jitter) on mined
        false-positive boxes: the production model's own real-photo
        mistakes recycled as dedicated Disc background-class negatives
        (bootstrapped hard-negative mining). The jitter family spans the
        grid/refinement perturbations under which the same FP would
        re-fire (scale x/1.2, +-12% shift, +-8 deg), plus the aliasing
        variants and mirroring the face sampler already uses."""
        import jax.numpy as jnp

        from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate

        if len(self._mined) == 0:
            raise ValueError("no mined boxes loaded (load_mined)")
        rng = np.random.RandomState(seed + 13)
        m = self._mined
        idx = rng.randint(0, len(m), n)
        bi = m[idx, 0].astype(np.int64)
        ii = bi * 3 + rng.randint(0, 3, n)           # aliasing variant
        mirror = rng.randint(0, 2, n)
        side = m[idx, 3] * np.exp(rng.uniform(-0.18, 0.18, n))
        cx = m[idx, 1] + rng.uniform(-0.12, 0.12, n) * side
        cy = m[idx, 2] + rng.uniform(-0.12, 0.12, n) * side
        ang = m[idx, 4] + rng.uniform(-8.0, 8.0, n)
        w = self._sizes[ii, 1].astype(np.float64)
        cx = np.where(mirror, w - 1.0 - cx, cx)
        ang = np.where(mirror, -ang, ang)
        img_idx = (ii + mirror * self._n_images).astype(np.int32)
        boxes = np.stack([cx - (side - 1.0) / 2.0, cy - (side - 1.0) / 2.0,
                          cx + (side - 1.0) / 2.0, cy + (side - 1.0) / 2.0],
                         axis=1).astype(np.float32)
        return extract_patches_rotate(
            self._stack, jnp.asarray(boxes),
            jnp.asarray(ang.astype(np.float32)), patch_hw,
            method="nearest", image_idx=jnp.asarray(img_idx))

    def sample_faces(self, seed: int, n: int,
                     canvas_hw: Tuple[int, int] = (240, 240),
                     face_size_range: Tuple[float, float] = (40.0, 110.0),
                     angle_range: float = 22.5):
        """n canvases with a real face at (random size, angle, identity,
        mirror). Returns (imgs (n, H, W) device, attrs dict of np arrays) in
        the training.synth attrs convention."""
        import jax.numpy as jnp

        from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate

        Hc, Wc = canvas_hw
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, len(self._faces), n)
        F_dst = rng.uniform(*face_size_range, n)
        th_dst = rng.uniform(-angle_range, angle_range, n)

        boxes = np.zeros((n, 4), np.float32)
        angs = np.zeros(n, np.float32)
        img_idx = np.zeros(n, np.int32)
        eye_l = np.zeros((n, 2), np.float32)
        eye_r = np.zeros((n, 2), np.float32)
        mouth = np.zeros((n, 2), np.float32)
        for i in range(n):
            ii, el, er, mo = self._faces[idx[i]]
            inter = np.hypot(*(er - el))
            F_src = inter / INTER_EYE
            th_src = np.degrees(np.arctan2(er[1] - el[1], er[0] - el[0]))
            fc = np.array([(el[0] + er[0]) / 2.0 + 0.0,
                           ((el[1] + er[1]) / 2.0 + mo[1]) / 2.0])
            # annotation-convention face center: mid(mid_eyes, mouth)
            fc[0] = ((el[0] + er[0]) / 2.0 + mo[0]) / 2.0
            s_box = Wc * F_src / F_dst[i]          # source px per canvas
            a = th_src - th_dst[i]                  # warp rotation
            boxes[i] = [fc[0] - s_box / 2.0, fc[1] - s_box / 2.0,
                        fc[0] + s_box / 2.0 - 1.0, fc[1] + s_box / 2.0 - 1.0]
            angs[i] = a
            img_idx[i] = ii
            # affine: canvas = R(-a) . (p - fc) * (Wc / s_box) + center
            ca, sa = np.cos(np.radians(-a)), np.sin(np.radians(-a))
            R = np.array([[ca, -sa], [sa, ca]])
            k = Wc / s_box
            cc = np.array([Wc / 2.0, Hc / 2.0])
            eye_l[i] = R @ (el - fc) * k + cc
            eye_r[i] = R @ (er - fc) * k + cc
            mouth[i] = R @ (mo - fc) * k + cc

        imgs = extract_patches_rotate(self._stack, jnp.asarray(boxes),
                                      jnp.asarray(angs), (Hc, Wc),
                                      method="bilinear",
                                      image_idx=jnp.asarray(img_idx))
        # Fill out-of-photo regions (warp leaves them 0) with neutral gray
        # + noise instead of hard black wedges.
        import jax
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed ^ 0x5eed),
                                          4)
        mask = extract_patches_rotate(self._valid, jnp.asarray(boxes),
                                      jnp.asarray(angs), (Hc, Wc),
                                      method="bilinear",
                                      image_idx=jnp.asarray(img_idx))
        fill = (jax.random.uniform(k3, (n, 1, 1), minval=0.2, maxval=0.7)
                + 0.05 * jax.random.normal(k4, imgs.shape))
        imgs = imgs * mask + fill * (1.0 - mask)
        # photometric jitter: gamma + noise (device)
        gamma = jnp.exp(jax.random.uniform(k1, (n, 1, 1), minval=-0.3,
                                           maxval=0.3))
        imgs = jnp.clip(imgs, 0.0, 1.0) ** gamma
        imgs = jnp.clip(imgs + 0.012 * jax.random.normal(k2, imgs.shape),
                        0.0, 1.0)

        inter = np.hypot(eye_r[:, 0] - eye_l[:, 0], eye_r[:, 1] - eye_l[:, 1])
        attrs = {
            "eye_l": eye_l, "eye_r": eye_r, "mouth": mouth,
            "face_size": (inter / INTER_EYE).astype(np.float32),
            "angle": np.degrees(np.arctan2(
                eye_r[:, 1] - eye_l[:, 1],
                eye_r[:, 0] - eye_l[:, 0])).astype(np.float32),
            # attribute labels unknown for generic annotations; filled with
            # NaN so attribute training can filter them out.
            "age": np.full(n, np.nan, np.float32),
            "race": np.full(n, np.nan, np.float32),
            "gender": np.full(n, np.nan, np.float32),
        }
        return imgs, attrs

    def sample_backgrounds(self, seed: int, n: int,
                           canvas_hw: Tuple[int, int] = (240, 240)):
        """n face-free crops (hard negatives: foliage, shelves, clothing).

        Crops are rejected while they overlap any annotated face inflated to
        1.8x its nominal size."""
        import jax.numpy as jnp

        from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate

        Hc, Wc = canvas_hw
        rng = np.random.RandomState(seed + 7)
        boxes = np.zeros((n, 4), np.float32)
        img_idx = np.zeros(n, np.int32)
        i = 0
        tries = 0
        while i < n and tries < n * 200:
            tries += 1
            ii = rng.randint(0, self._n_images)
            ih, iw = self._sizes[ii]
            side = rng.uniform(60.0, min(ih, iw) * 0.6)
            cx = rng.uniform(side / 2, iw - side / 2)
            cy = rng.uniform(side / 2, ih - side / 2)
            bad = False
            for (fx, fy, F) in self._face_boxes.get(ii, []):
                r = 0.9 * F + side / 2.0           # inflated 1.8x face
                if abs(cx - fx) < r and abs(cy - fy) < r:
                    bad = True
                    break
            if bad:
                continue
            mirror = rng.randint(0, 2)
            if mirror:
                cx = iw - 1.0 - cx
            boxes[i] = [cx - side / 2, cy - side / 2,
                        cx + side / 2 - 1.0, cy + side / 2 - 1.0]
            img_idx[i] = ii + mirror * self._n_images
            i += 1
        if i < n:          # pathological annotation: fall back to repeats
            boxes[i:] = boxes[:max(i, 1)][np.arange(n - i) % max(i, 1)]
            img_idx[i:] = img_idx[:max(i, 1)][np.arange(n - i) % max(i, 1)]
        angs = rng.uniform(-20.0, 20.0, n).astype(np.float32)
        imgs = extract_patches_rotate(self._stack, jnp.asarray(boxes),
                                      jnp.asarray(angs), (Hc, Wc),
                                      method="bilinear",
                                      image_idx=jnp.asarray(img_idx))
        return imgs

    def sample_age_zframes(self, seed: int, n: int,
                           attrs_file: str = "",
                           eye_jitter_frac: float = 0.08,
                           exclude: str = ""):
        """n deploy-identical 96x96 age-head input patches of the REAL
        anchor faces + their true (age, race, gender) labels.

        The extraction is the production attribute path itself
        (engine.heads: eyes -> "eyes_inferred-mouth_areaZ" frame_params ->
        composed-affine gather -> AgeContrastEnhancement), driven by the
        annotated eye coordinates perturbed by ``eye_jitter_frac`` x
        inter-eye per eye -- the measured deploy-time eye-localization
        error (anchors rel. eye error ~0.088, docs/ROUND4_REPORT.md) --
        so training jitter matches what the heads see behind the real
        detector. Aliasing variants and mirrored twins augment like every
        other real sampler here. Reference analog: the training corpora
        were real photos normalized through the same geometry
        (face_normalization_tools.py:111-329 + face_analysis.py:1214-1247).

        ``exclude`` drops one photo (basename) for leave-one-photo-out
        measurement. Labels come from ``attrs_file`` (anchor_attrs.txt
        format: basename age race gender); ages are clipped to the
        decoder's 16.5-57.8y label ladder (the reference Age classifier's
        own ceiling). Returns (flat (n, 9216) contrast-enhanced patches
        on device, labels dict of np arrays age/race/gender).
        """
        import jax.numpy as jnp

        from pyfaceanalysis_tpu.engine.heads import _sample_age_patches
        from pyfaceanalysis_tpu.ops.contrast import contrast_enhance_patches
        from pyfaceanalysis_tpu import normalization
        from pyfaceanalysis_tpu.training.datasets import Z_SIZE

        if not attrs_file:
            attrs_file = os.path.join(os.path.dirname(DEFAULT_GT),
                                      "anchor_attrs.txt")
        attr_of: Dict[str, Tuple[float, float, float]] = {}
        with open(attrs_file) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                name, age_s, race_s, gender_s = line.split()
                attr_of[name] = (
                    min(float(age_s), 57.8),
                    2.0 if race_s.lower() == "white" else -2.0,
                    1.0 if gender_s.lower() == "female" else -1.0)

        usable = []
        for fi, (ii, el, er, mo) in enumerate(self._faces):
            base = (ii % self._n_images) // 3
            name = self._base_name.get(base, "")
            if name in attr_of and name != exclude:
                usable.append((fi, attr_of[name]))
        if not usable:
            raise ValueError(f"no usable anchor faces ({attrs_file}, "
                             f"exclude={exclude!r})")

        rng = np.random.RandomState(seed + 31)
        pick = rng.randint(0, len(usable), n)
        centers = np.zeros((n, 2), np.float32)
        angles = np.zeros(n, np.float32)
        sfs = np.zeros(n, np.float32)
        img_idx = np.zeros(n, np.int32)
        age = np.zeros(n, np.float32)
        race = np.zeros(n, np.float32)
        gender = np.zeros(n, np.float32)
        for i in range(n):
            fi, (a, r, g) = usable[pick[i]]
            ii, el, er, _mo = self._faces[fi]
            inter = float(np.hypot(*(er - el)))
            jr = eye_jitter_frac * inter
            th = rng.uniform(0.0, 2 * np.pi, 2)
            rad = jr * np.sqrt(rng.uniform(0.0, 1.0, 2))
            elj = el + rad[0] * np.array([np.cos(th[0]), np.sin(th[0])])
            erj = er + rad[1] * np.array([np.cos(th[1]), np.sin(th[1])])
            fp = normalization.frame_params(
                [elj[0], elj[1], erj[0], erj[1], 0.0, 0.0],
                normalization_method="eyes_inferred-mouth_areaZ",
                centering_mode="mid_eyes_inferred-mouth",
                rotation_mode="EyeLineRotation",
                out_size=(Z_SIZE[1], Z_SIZE[0]))
            centers[i] = [fp.center_x, fp.center_y]
            angles[i] = fp.angle_deg
            sfs[i] = fp.sf
            img_idx[i] = ii
            age[i], race[i], gender[i] = a, r, g
        patches = _sample_age_patches(
            self._stack, jnp.asarray(centers), jnp.asarray(angles),
            jnp.asarray(sfs), jnp.asarray(img_idx))
        flat = contrast_enhance_patches(patches.reshape(n, -1),
                                        obj_avg=0.0, obj_std=0.16)
        return flat, {"age": age, "race": race, "gender": gender}


def default_source(verbose: bool = True) -> Optional[RealFaceSource]:
    """The repo's annotated-real-face source, or None if the annotation
    file (or its photos) are unavailable."""
    try:
        return RealFaceSource(DEFAULT_GT, verbose=verbose)
    except (OSError, IOError) as e:                   # pragma: no cover
        if verbose:
            print(f"[real] no real-face pool ({e})")
        return None
