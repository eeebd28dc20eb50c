"""Ground-truth-driven evaluation (the reference's built-in benchmark).

Reference: the eval blocks woven through the main loop
(FaceDetectUpdated.py:207-217, 780-931, 1048-1156, 1287-1377) with metric
definitions in face_analysis.py:158-181: a detection counts as a true
positive when its relative eye error (max per-eye distance / inter-eye
distance) is below 0.25; per-image relative box/eye errors are accumulated
into mean/std/RMSE summaries plus FAR/FRR-style counters.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from pyfaceanalysis_tpu.engine.nms import relative_eye_error_np
from pyfaceanalysis_tpu.io.writers import load_true_coordinates


class GroundTruthEvaluator:
    """Accumulates detection-quality statistics against eye annotations."""

    def __init__(self, truth: Dict[str, np.ndarray],
                 acceptance: float = 0.25):
        self.truth = truth              # basename -> (14,) coordinate row
        self.acceptance = acceptance
        self.true_positives = 0
        self.false_positives = 0
        self.false_negatives = 0
        self.eye_errors: List[float] = []
        self.offending_images: List[str] = []

    @staticmethod
    def from_files(coordinates_filename: Optional[str] = None,
                   true_coordinates_file: Optional[str] = None
                   ) -> "GroundTruthEvaluator":
        fn = coordinates_filename or true_coordinates_file
        filenames, coords = load_true_coordinates("", fn)
        truth = {os.path.basename(f): c for f, c in zip(filenames, coords)}
        return GroundTruthEvaluator(truth)

    def record(self, image_filename: str, detections) -> None:
        key = os.path.basename(image_filename)
        if key not in self.truth:
            return
        row = self.truth[key]
        true_eyes = row[0:4]
        matched = False
        for d in detections:
            eyes = np.array([*d.eye_left, *d.eye_right])
            err = relative_eye_error_np(eyes, true_eyes)
            if err < self.acceptance:
                if not matched:
                    self.true_positives += 1
                    self.eye_errors.append(err)
                matched = True
            else:
                self.false_positives += 1
        if not matched:
            self.false_negatives += 1
            self.offending_images.append(image_filename)

    def report(self) -> str:
        errs = np.asarray(self.eye_errors)
        n_pos = self.true_positives + self.false_negatives
        lines = [
            "ground-truth evaluation:",
            f"  true positives:  {self.true_positives}",
            f"  false positives: {self.false_positives}",
            f"  false negatives: {self.false_negatives}",
            f"  recall (FRR complement): "
            f"{self.true_positives / max(n_pos, 1):.3f}",
        ]
        if len(errs):
            lines.append(f"  rel eye error: mean={errs.mean():.4f} "
                         f"std={errs.std():.4f} "
                         f"rmse={np.sqrt((errs ** 2).mean()):.4f}")
        if self.offending_images:
            lines.append(f"  offending images: {self.offending_images}")
        out = "\n".join(lines)
        print(out)
        return out
