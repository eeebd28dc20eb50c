"""Device-time breakdown of the detection pipeline's op families.

Times each hot op in isolation (dispatch-pipelined, fenced once) on the
real chip, so kernel-optimization effort goes where the device time
actually is (VERDICT round-1 item #6: write a Pallas extraction kernel OR
prove the XLA op mix is within ~2x of roofline).

Run:  python tools/profile_stages.py  [--model SavedNetworksTPU]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, runs=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn() for _ in range(runs)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / runs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SavedNetworksTPU")
    ap.add_argument("--image",
                    default="/root/reference/sample_images/TNS-Group.jpg")
    ap.add_argument("--smallest_face", type=float, default=0.1)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine import cascade as cascade_mod
    from pyfaceanalysis_tpu.engine.detector import (
        DetectionModel,
        FaceDetector,
        _detect_core,
    )
    from pyfaceanalysis_tpu.io.images import load_image
    from pyfaceanalysis_tpu.models.network import apply_network
    from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate
    from pyfaceanalysis_tpu.ops.pyramid import build_pyramid, crop_patches

    model = DetectionModel.load(args.model)
    cfg = DetectorConfig(smallest_face=args.smallest_face)
    det = FaceDetector(model, cfg)
    cfg = det.config                       # calibration-resolved
    image, _ = load_image(args.image, cfg.prescale_size)
    geom = model.spec.face_geom
    device_image = det._to_canvas(image)
    state, n_real, pyr = cascade_mod.make_grid_state(
        image.shape[1], image.shape[0], geom, cfg)
    B = state.boxes.shape[0]
    print(f"grid: {n_real} real windows, padded {B}")

    results = {}

    # 1. pyramid build + iter-0 contiguous crops
    pyramid = build_pyramid(device_image, pyr.scales, pyr.level_hw)
    results["pyramid_build"] = timeit(
        lambda: build_pyramid(device_image, pyr.scales, pyr.level_hw))
    results[f"pyramid_crop[{B}]"] = timeit(
        lambda: crop_patches(pyramid, pyr.crops, (64, 64)))

    # 2. rotated gather at refinement width (mid_compact):
    #    XLA canvas gather (before) vs Pallas pyramid kernel (after).
    K = min(cfg.mid_compact or B, B)
    boxes_k = state.boxes[:K]
    angles_k = state.angles[:K]
    for meth in ("nearest", "bilinear"):
        results[f"rot_gather_xla[{K},{meth}]"] = timeit(
            lambda m=meth: extract_patches_rotate(
                device_image, boxes_k, angles_k, (64, 64), method=m))
    from pyfaceanalysis_tpu.ops.pallas_gather import sample_patches_pyramid
    scales_arr = jnp.asarray(pyr.scales, jnp.float32)
    levels_k = pyr.crops[:K, 0]
    for meth in ("nearest", "bilinear"):
        results[f"rot_gather_pallas[{K},{meth}]"] = timeit(
            lambda m=meth: sample_patches_pyramid(
                pyramid, scales_arr, levels_k, boxes_k, angles_k,
                (64, 64), method=m))

    # 3. network execution at grid and refinement widths
    rng = np.random.RandomState(0)
    name0 = model.det_net_names[0]
    net = model.nets[name0]
    for n in (B, K):
        x = jnp.asarray(rng.rand(n, 4096).astype(np.float32))
        fn = jax.jit(lambda x: apply_network(net.specs, tuple(net.params), x))
        results[f"network[{n}]"] = timeit(lambda: fn(x))

    # 4. Gaussian regression at grid width
    clf = model.classifiers[0]
    feats = jnp.asarray(rng.rand(B, clf.input_dim).astype(np.float32))
    regf = jax.jit(lambda f: clf.regression(f))
    results[f"regression[{B}]"] = timeit(lambda: regf(feats))

    # 5. the full fused program
    eye_net = model.nets["net_eye"]

    def full():
        p = build_pyramid(device_image, pyr.scales, pyr.level_hw)
        return _detect_core(
            model.plan, model.det_specs, geom, model.spec.eye_geom, cfg,
            eye_net.specs, model.clf_input_dim("EyeLX"),
            model.clf_input_dim("EyeLY"), cfg.max_detections,
            device_image, model.det_params, model.det_clfs,
            tuple(eye_net.params), model.classifier("EyeLX"),
            model.classifier("EyeLY"), state, p, pyr.crops,
            jnp.asarray(pyr.scales, jnp.float32))

    results["full_detect_core"] = timeit(full, runs=10)

    total = results["full_detect_core"]
    print(f"\n{'op':34s} {'ms':>9s} {'% of full':>10s}")
    for k, v in results.items():
        print(f"{k:34s} {v * 1e3:9.2f} {v / total * 100:9.1f}%")


if __name__ == "__main__":
    main()
