"""On-hardware verification of the Pallas kernels against the XLA paths.

Interpret-mode unit tests (tests/test_pallas.py) validate kernel LOGIC but
not Mosaic lowering: a real v5e miscompile was found where ``pltpu.roll``
with a dynamic sublane shift produced wrong data while interpret mode was
exact. This tool runs the COMPILED kernels on the attached TPU and compares
them against the XLA reference implementations; run it after any kernel or
jax/libtpu change.

Usage:  python tools/verify_kernels.py   (needs the TPU; exits nonzero on
mismatch beyond the documented bf16 sampling tolerance)
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.ops.pallas_crop import crop_patches_pallas
    from pyfaceanalysis_tpu.ops.pallas_gather import sample_patches_pyramid
    from pyfaceanalysis_tpu.ops.patches import extract_patches_rotate
    from pyfaceanalysis_tpu.ops.pyramid import build_pyramid, crop_patches

    if jax.default_backend() not in ("tpu",):
        print(f"[verify_kernels] backend is {jax.default_backend()!r}; "
              "this tool checks the COMPILED TPU path -- nothing to do")
        return 0

    failures = 0
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (256, 384), jnp.float32)
    scales = (1.0, 2.0)
    pyr = build_pyramid(img, scales, (256, 384))
    rng = np.random.RandomState(1)

    # --- rotated sampler vs canvas gather at unit scale (bf16 tolerance) --
    B = 256
    side = rng.uniform(40, 64, B)
    x0 = rng.uniform(5, 384 - 72 - side)
    y0 = rng.uniform(5, 256 - 72 - side)
    boxes = jnp.asarray(np.stack([x0, y0, x0 + side - 1, y0 + side - 1], 1),
                        jnp.float32)
    angles = jnp.asarray(rng.uniform(-22.5, 22.5, B), jnp.float32)
    for method, tol in [("nearest", 6e-3), ("bilinear", 6e-3)]:
        want = np.asarray(extract_patches_rotate(img, boxes, angles,
                                                 (64, 64), method=method))
        got = np.asarray(sample_patches_pyramid(
            pyr, jnp.asarray(scales), jnp.zeros((B,), jnp.int32), boxes,
            angles, (64, 64), method=method))
        d = np.abs(got - want)
        # Rounding ties at the texel boundary may legally differ by a whole
        # texel for a tiny fraction of samples; gate on the 99.99th pct.
        p9999 = np.quantile(d, 0.9999)
        bad = p9999 > tol
        failures += bad
        print(f"sampler[{method}]: max={d.max():.4f} "
              f"p99.99={p9999:.4f} mean={d.mean():.6f} "
              f"{'FAIL' if bad else 'ok'}")

    # --- crop kernel vs dynamic-slice path (exact) ------------------------
    B = 2048
    lev = rng.randint(0, 2, B)
    yy = rng.randint(0, 256 - 64, B)
    xx = rng.randint(0, 384 - 64, B)
    crops = jnp.asarray(np.stack([lev, yy, xx], 1), jnp.int32)
    want = np.asarray(crop_patches(pyr, crops, (64, 64)))
    got = np.asarray(crop_patches_pallas(pyr, crops, (64, 64)))
    d = np.abs(got - want)
    bad = d.max() > 0
    failures += bad
    print(f"crop: max={d.max():.6f} mismatching={(d > 0).mean():.4%} "
          f"{'FAIL' if bad else 'ok'}")

    print(f"[verify_kernels] {'FAILED' if failures else 'all kernels match'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
