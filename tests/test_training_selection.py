"""Fast unit tests for the multi-seed disc selection rule."""


def test_multi_seed_selection_rule():
    """The declared disc-seed selection rule (training.selection.select):
    anchors FN>0 or TP<3 eliminates; among candidates at/above the recall
    floor the LOWEST panel FP wins (ties: lower anchors FP); if none
    reaches the floor, highest recall wins; all eliminated -> None."""
    from pyfaceanalysis_tpu.training.selection import select

    def cand(recall, fp, a_tp=3, a_fp=10, a_fn=0):
        return {"recall": recall, "fp_per_image": fp,
                "anchors": {"tp": a_tp, "fp": a_fp, "fn": a_fn}}

    # FN on anchors eliminates even the best panel score.
    scores = [cand(0.90, 0.2, a_fn=1), cand(0.80, 0.6), cand(0.78, 0.4)]
    assert select(scores, recall_floor=0.73, verbose=False) == 2
    # Above the floor, lowest FP wins even at lower recall.
    scores = [cand(0.85, 1.2), cand(0.75, 0.5)]
    assert select(scores, recall_floor=0.73, verbose=False) == 1
    # FP tie broken by anchors FP.
    scores = [cand(0.80, 0.5, a_fp=15), cand(0.78, 0.5, a_fp=9)]
    assert select(scores, recall_floor=0.73, verbose=False) == 1
    # Nobody at the floor: highest recall.
    scores = [cand(0.60, 0.1), cand(0.70, 2.0)]
    assert select(scores, recall_floor=0.73, verbose=False) == 1
    # Everyone eliminated.
    scores = [cand(0.9, 0.1, a_tp=2), cand(0.9, 0.1, a_fn=2)]
    assert select(scores, recall_floor=0.73, verbose=False) is None


def test_background_cap_ladder():
    """cap_ladder interpolates the face-calibrated ladder toward the
    reference constants until the cumulative background survival meets the
    budget -- and never goes below the reference floor."""
    import numpy as np

    from pyfaceanalysis_tpu.training.calibration import (background_rate,
                                                         cap_ladder)

    serials = [1, 3]
    ref = [0.0, 0.2, 0.0, 0.2] + [0.0] * 6
    face = [0.0, 0.8, 0.0, 0.8] + [0.0] * 6
    rng = np.random.RandomState(0)
    # 10 images x 40 bg windows, confidences uniform in [0, 1]: under the
    # face ladder (cut 0.8 at both stages) ~0.64 of windows survive both
    # stages = ~25.6/image; under the reference (0.2) ~0.04 = 1.6/image.
    bg_images = []
    for _ in range(10):
        idx = np.arange(40)
        bg_images.append({1: (rng.rand(40), idx), 3: (rng.rand(40), idx)})

    rate_face, _, _ = background_rate(face, bg_images, serials)
    assert rate_face > 20.0
    capped = cap_ladder(face, bg_images, serials, bg_budget=5.0, ref=ref,
                        log=lambda *a, **k: None)
    rate_cap, _, _ = background_rate(capped, bg_images, serials)
    assert rate_cap <= 5.0
    # loosest ladder meeting the budget: not far below it either
    assert rate_cap > 2.5
    # floor: a budget unreachable even at the reference keeps face ladder
    floor = cap_ladder(face, bg_images, serials, bg_budget=0.01, ref=ref,
                       log=lambda *a, **k: None)
    assert floor == list(face)
    # monotone: capped cutoffs sit between reference and face values
    for s in serials:
        assert ref[s] <= capped[s] <= face[s]


def test_texture_noise_injection():
    """texture_noise adds band-passed energy: Laplacian variance and
    gradient energy rise toward the real-photo range (the measured domain
    gap, docs/domain_gap_r4.json) while pixels stay in [0, 1] and
    noise_amp=0 leaves the blur-only path in place."""
    import jax
    import numpy as np

    from pyfaceanalysis_tpu.training.datasets import _random_patch_blur

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[:64, :64] / 64.0
    smooth = np.stack([0.3 + 0.4 * np.sin(3 * xx + i) * np.cos(2 * yy)
                       for i in range(8)]).astype(np.float32)

    def lap_var(p):
        lap = (np.roll(p, 1, -1) + np.roll(p, -1, -1) + np.roll(p, 1, -2)
               + np.roll(p, -1, -2) - 4 * p)
        return lap.var(axis=(-2, -1)).mean()

    key = jax.random.PRNGKey(0)
    base = np.asarray(_random_patch_blur(key, smooth))
    noisy = np.asarray(_random_patch_blur(key, smooth, noise_amp=0.08))
    assert noisy.min() >= 0.0 and noisy.max() <= 1.0
    assert lap_var(noisy) > 3 * lap_var(base)
    # amp=0 path unchanged vs explicit 0
    again = np.asarray(_random_patch_blur(key, smooth, noise_amp=0.0))
    np.testing.assert_array_equal(base, again)


def test_disc_dataset_bg_only_noise_and_frac():
    """texture_noise_bg injects into the background class only (graded
    face patches bit-identical to the no-noise run), and return_frac
    yields the continuous centering fraction aligned with the class ids
    (graded classes in [0,1), background exactly 1.0)."""
    import jax
    import numpy as np

    from pyfaceanalysis_tpu.config import NetGeometry
    from pyfaceanalysis_tpu.training import datasets

    key = jax.random.PRNGKey(3)
    geom = NetGeometry()
    base, cls, avg, frac = datasets.disc_dataset(
        key, 6, 8, geom, return_frac=True)
    noisy, cls2, _, frac2 = datasets.disc_dataset(
        key, 6, 8, geom, texture_noise_bg=0.08, return_frac=True)
    base, noisy = np.asarray(base), np.asarray(noisy)
    np.testing.assert_array_equal(cls, cls2)
    np.testing.assert_array_equal(frac, frac2)
    faces, bg = cls < 9, cls == 9
    # face classes untouched, background class actually perturbed
    np.testing.assert_array_equal(base[faces], noisy[faces])
    assert np.abs(base[bg] - noisy[bg]).max() > 1e-3
    # frac semantics: continuous on faces, aligned with the class grade
    assert frac.shape == cls.shape
    np.testing.assert_array_equal(frac[bg], 1.0)
    assert frac[faces].max() < 1.0
    c = cls[faces].astype(float)
    lo, hi = c / 9.0, (c + 1.0) / 9.0
    assert np.all(frac[faces] >= lo - 1e-6)
    assert np.all(frac[faces] <= hi + 1e-6)


def test_serial_disc_graph_trains():
    """disc_graph='serial' trains a working discriminator: tiny serial-
    graph disc run still separates centered faces from background."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyfaceanalysis_tpu.config import NetGeometry
    from pyfaceanalysis_tpu.models import builder
    from pyfaceanalysis_tpu.training import datasets
    from pyfaceanalysis_tpu.training.trainer import (
        fit_regressor_classes, train_network)

    geom = NetGeometry()
    x, cls, avg, frac = datasets.disc_dataset(
        jax.random.PRNGKey(11), 10, 14, geom, return_frac=True)
    net = builder.build_higsfa(64, top_dim=12, node="igsfa")
    net = train_network(net, x, graph="serial", labels=frac,
                        num_groups=24, verbose=False)
    feats = np.asarray(jax.jit(net.execute)(x))
    clf = fit_regressor_classes(feats, cls, avg, input_dim=9)
    pred = np.asarray(clf.regression(jnp.asarray(feats[:, :clf.input_dim])))
    assert pred[cls <= 1].mean() + 0.3 < pred[cls == 9].mean()


def test_anchor_small_ie_passes():
    """anchor_passes builds native + small-scale replica passes: each
    replica downscales the photo so the MEDIAN inter-eye distance lands at
    the target (px), scales truth rows with the image, and skips targets
    at or above 0.9x the native size (campaign-7 L0)."""
    import numpy as np

    from pyfaceanalysis_tpu.training.calibration import anchor_passes

    rng = np.random.RandomState(3)
    image = rng.rand(400, 500).astype(np.float32)
    # two truth rows with inter-eye 80 and 120 px (median 100)
    rows = np.array([
        [100.0, 100.0, 180.0, 100.0, 140.0, 100.0, 140.0, 140.0,
         0, 0, 0, 0, 0, 0],
        [200.0, 200.0, 320.0, 200.0, 260.0, 200.0, 260.0, 260.0,
         0, 0, 0, 0, 0, 0],
    ])
    passes = anchor_passes(image, rows, (25.0, 95.0, 200.0))
    # 95 px is > 0.9 * 100 native and 200 px is upscaling: both skipped
    assert len(passes) == 2
    p_img, p_rows = passes[1]
    s = 25.0 / 100.0
    assert p_img.shape == (int(400 * s), int(500 * s))
    np.testing.assert_allclose(p_rows, rows * s)
    # replica median inter-eye hits the target
    ie = np.median(np.hypot(p_rows[:, 2] - p_rows[:, 0],
                            p_rows[:, 3] - p_rows[:, 1]))
    assert abs(ie - 25.0) < 1e-6
    # native pass untouched
    assert passes[0][0] is image

    # tiny photo: the 64 px floor clamps the resize
    tiny = rng.rand(70, 70).astype(np.float32)
    trow = rows[:1] * 0.2
    passes = anchor_passes(tiny, trow, (2.0,))
    assert passes[1][0].shape == (64, 64)


def test_bg_cap_protected_rungs():
    """cap_ladder(protect=...) keeps protected rungs at their
    face-calibrated value and reclaims the budget from the other rungs,
    which land tighter than under a uniform cap."""
    import numpy as np

    from pyfaceanalysis_tpu.training.calibration import (background_rate,
                                                         cap_ladder)

    serials = [1, 3]
    ref = [0.0, 0.2, 0.0, 0.2] + [0.0] * 6
    face = [0.0, 0.8, 0.0, 0.8] + [0.0] * 6
    rng = np.random.RandomState(1)
    bg_images = []
    for _ in range(10):
        idx = np.arange(40)
        bg_images.append({1: (rng.rand(40), idx), 3: (rng.rand(40), idx)})

    uniform = cap_ladder(face, bg_images, serials, bg_budget=5.0, ref=ref,
                         log=lambda *a, **k: None)
    prot = cap_ladder(face, bg_images, serials, bg_budget=5.0, ref=ref,
                      log=lambda *a, **k: None, protect=(3,))
    # protected rung keeps the loose face value
    assert prot[3] == face[3]
    # budget still met
    rate, _, _ = background_rate(prot, bg_images, serials)
    assert rate <= 5.0
    # the unprotected rung pays: tighter than under the uniform cap
    assert prot[1] < uniform[1]
    # budget unreachable even with rung 1 at the reference floor:
    # falls back to the face ladder (reported, not forced)
    floor = cap_ladder(face, bg_images, serials, bg_budget=0.2, ref=ref,
                       log=lambda *a, **k: None, protect=(3,))
    assert floor == list(face)


def test_anchor_passes_clamped_rows_match_image():
    """When the 64-px resize floor clamps a replica, truth rows are scaled
    by the ACTUAL per-axis scale of the produced image, not the requested
    one (ADVICE r4 #1: a desynced row misclassifies the face window as
    background in the calibration pools)."""
    import numpy as np

    from pyfaceanalysis_tpu.training.calibration import anchor_passes

    rng = np.random.RandomState(5)
    tiny = rng.rand(70, 90).astype(np.float32)
    row = np.array([[20.0, 30.0, 36.0, 30.0, 28.0, 30.0, 28.0, 44.0,
                     28.0, 37.0, 10.0, 20.0, 46.0, 54.0]])
    passes = anchor_passes(tiny, row, (2.0,))          # s = 2/16 = 0.125
    p_img, p_rows = passes[1]
    assert p_img.shape == (64, 64)                     # floor clamped
    sx, sy = 64 / 90.0, 64 / 70.0
    np.testing.assert_allclose(p_rows[:, 0::2], row[:, 0::2] * sx)
    np.testing.assert_allclose(p_rows[:, 1::2], row[:, 1::2] * sy)


def test_write_calibration_protected_rung9_skips_min_clamp(tmp_path):
    """The final-gate min-clamp (keep the stricter of the trainer's
    residual estimate and the trajectory quantile) is skipped when rung 9
    is bg-budget-protected -- protection exists to spare a declared
    kill-stage and the clamp would silently undo it (campaign-7 L1b)."""
    import json

    from pyfaceanalysis_tpu.training.calibration import write_calibration

    def manifest_with_last(last, tag=""):
        d = tmp_path / f"m_{last}{tag}"
        d.mkdir()
        (d / "manifest.json").write_text(json.dumps(
            {"calibration": {"last_cut_off_face": last}}))
        return str(d)

    ladder = [0.9] * 9 + [0.381]
    base = {"cut_offs_face": ladder, "tolerance_xy_eye": 9.0}

    d = manifest_with_last(0.2353)
    write_calibration(d, dict(base), verbose=False)
    m = json.load(open(d + "/manifest.json"))
    assert m["calibration"]["cut_offs_face"][9] == 0.2353  # clamped

    d2 = manifest_with_last(0.2353, "_p")
    write_calibration(d2, dict(base, bg_protect=[9]), verbose=False)
    m2 = json.load(open(d2 + "/manifest.json"))
    assert m2["calibration"]["cut_offs_face"][9] == 0.381   # protected
    assert m2["calibration"]["last_cut_off_face"] == 0.381
