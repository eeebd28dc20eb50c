"""Training subsystem: synthetic data generation + layer-wise HiGSFA training.

The reference repo ships trained Gaussian classifiers but NOT the HiGSFA
network pickles (``SavedNetworks/`` is absent, FaceDetectUpdated.py:136), and
its training corpora/trainer live in the external cuicuilco project. This
package therefore provides a self-contained trainer: a procedural face
generator (so the framework trains end-to-end with zero external data) plus
dataset builders matching the reference's label ranges (SURVEY.md 2.2), and a
layer-wise GSFA/PCA trainer producing the full 22-stage pipeline artifacts.
Real datasets can be substituted via the dataset-normalization tools
(pyfaceanalysis_tpu.apps.normalize / .frgc).
"""
