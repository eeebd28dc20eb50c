"""Annotate real photos with approximate face/eye ground truth via the
OpenCV Haar cascades (system OpenCV 4.6, driven by tools/haar_annotate.cpp
because the pip cv2 5.x dropped CascadeClassifier).

Produces the reference "normalization file" format consumed by
``pfa-detect --coordinates_filename`` and ``pfa-normalize``::

    <image_filename>
    xl yl xr yr xm ym          (left eye, right eye, mouth; image frame)

Eye positions come from ``haarcascade_eye`` restricted to the upper part of
each Haar face box; faces whose two eyes cannot be found are either dropped
or synthesized from the face-box geometry (``--allow_synth_eyes``).

This is an EVALUATION/annotation aid (ground truth for the per-stage
cascade diagnostics, reference FaceDetectUpdated.py:780-931) -- the Haar
detector is the annotator, not part of the detection pipeline.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

TOOL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "haar_annotate")


def run_haar(images, min_size=24, min_neighbors=5):
    """Run the C++ annotator; returns per image a list of
    {'box': (x,y,w,h), 'eye_boxes': [(ex,ey,ew,eh) image-frame ...]}."""
    if not os.path.exists(TOOL):
        subprocess.check_call(
            [os.path.join(os.path.dirname(TOOL), "build_haar_annotate.sh")])
    out = subprocess.check_output(
        [TOOL, *images, "--min_size", str(min_size),
         "--min_neighbors", str(min_neighbors)], text=True)
    dets = {p: [] for p in images}
    cur = None
    for line in out.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "FACE":
            path = parts[1]
            x, y, w, h = map(float, parts[2:6])
            cur = {"box": (x, y, w, h), "eye_boxes": []}
            dets[path].append(cur)
        elif parts[0] == "EYE" and cur is not None:
            ex, ey, ew, eh = map(float, parts[1:5])
            fx, fy = cur["box"][0], cur["box"][1]
            cur["eye_boxes"].append((fx + ex, fy + ey, ew, eh))
    return dets


def pick_eye_pair(face, eye_boxes):
    """Best left/right eye-center pair: plausible separation, level."""
    x, y, w, h = face
    centers = [(ex + ew / 2.0, ey + eh / 2.0) for ex, ey, ew, eh in eye_boxes]
    pair, best = None, 1e9
    for i in range(len(centers)):
        for j in range(len(centers)):
            if i == j:
                continue
            (x1, y1), (x2, y2) = centers[i], centers[j]
            if x1 >= x2:
                continue
            sep = x2 - x1
            if not (0.25 * w < sep < 0.65 * w):
                continue
            cost = abs(y1 - y2) / max(sep, 1.0)
            if cost < 0.25 and cost < best:
                best, pair = cost, ((x1, y1), (x2, y2))
    return pair


def synth_eyes_from_box(box):
    """Approximate eye centers from a Haar face box (frontal geometry:
    eyes near 0.3/0.7 of the width at ~0.4 of the height)."""
    x, y, w, h = box
    return ((x + 0.30 * w, y + 0.40 * h), (x + 0.70 * w, y + 0.40 * h))


def mouth_from_eyes(eyes):
    """Reference triangle: eyes 37 apart, mouth 42 below their midpoint,
    perpendicular to the eye line (y-down frame)."""
    (xl, yl), (xr, yr) = eyes
    dx, dy = xr - xl, yr - yl
    d = float(np.hypot(dx, dy))
    ux, uy = -dy / max(d, 1e-6), dx / max(d, 1e-6)  # "down" w.r.t. eye line
    k = (42.0 / 37.0) * d
    return ((xl + xr) / 2.0 + ux * k, (yl + yr) / 2.0 + uy * k)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+")
    ap.add_argument("--out", required=True,
                    help="coordinates file to write (normalization format)")
    ap.add_argument("--min_size", type=int, default=24)
    ap.add_argument("--min_neighbors", type=int, default=5)
    ap.add_argument("--allow_synth_eyes", action="store_true",
                    help="keep faces without a Haar eye pair, using "
                         "box-geometry eyes")
    ap.add_argument("--viz", default=None,
                    help="write an annotated copy of each image here")
    args = ap.parse_args(argv)

    dets = run_haar(args.images, args.min_size, args.min_neighbors)
    lines = []
    for path in args.images:
        img = None
        if args.viz:
            from PIL import Image, ImageDraw
            img = Image.open(path).convert("RGB")
            draw = ImageDraw.Draw(img)
        kept = 0
        for d in dets.get(path, []):
            eyes = pick_eye_pair(d["box"], d["eye_boxes"])
            synth = False
            if eyes is None:
                if not args.allow_synth_eyes:
                    continue
                eyes = synth_eyes_from_box(d["box"])
                synth = True
            (xl, yl), (xr, yr) = eyes
            mx, my = mouth_from_eyes(eyes)
            # 8-float reference row: eyes, nose (between eyes and mouth),
            # mouth (io.writers.load_true_coordinates semantics).
            nx = (xl + xr) / 2.0 * 0.45 + mx * 0.55
            ny = (yl + yr) / 2.0 * 0.45 + my * 0.55
            lines.append(path)
            lines.append(f"{xl:.1f} {yl:.1f} {xr:.1f} {yr:.1f} "
                         f"{nx:.1f} {ny:.1f} {mx:.1f} {my:.1f}")
            kept += 1
            if img is not None:
                x, y, w, h = d["box"]
                draw.rectangle([x, y, x + w, y + h], outline=(0, 255, 0),
                               width=3)
                col = (255, 0, 0) if synth else (0, 0, 255)
                for ex, ey in (eyes[0], eyes[1]):
                    draw.ellipse([ex - 4, ey - 4, ex + 4, ey + 4], fill=col)
                draw.ellipse([mx - 4, my - 4, mx + 4, my + 4],
                             fill=(255, 255, 0))
        print(f"{path}: {len(dets.get(path, []))} haar faces, {kept} kept")
        if img is not None:
            outp = os.path.join(args.viz,
                                os.path.basename(path) + ".annot.png")
            img.save(outp)
            print(f"  viz -> {outp}")

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"wrote {len(lines) // 2} annotations -> {args.out}")


if __name__ == "__main__":
    main()
