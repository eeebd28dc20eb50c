"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

SURVEY.md section 4: fake-mesh tests stand in for multi-chip runs. These
assert that the SHARDED programs (patch-parallel cascade, dp x tp GSFA
training step) produce the same numbers as their single-device runs -- the
regression the driver's dryrun checks, now also caught in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfaceanalysis_tpu.parallel.mesh import make_mesh, sharded_cascade
from pyfaceanalysis_tpu.parallel.train_step import (
    gsfa_step,
    sharded_gsfa_step,
)


@pytest.fixture(scope="module")
def toy_model():
    import __graft_entry__
    return __graft_entry__._toy_model()


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_sharded_cascade_matches_single_device(toy_model):
    from pyfaceanalysis_tpu.config import DetectorConfig
    from pyfaceanalysis_tpu.engine import cascade as cascade_mod

    geom, plan, specs_tuple, net_params, clfs = toy_model
    n_dev = 8
    cfg = DetectorConfig(bucket_sizes=(32 * n_dev,), mid_compact=0)
    state, n_real, _pyr = cascade_mod.make_grid_state(96, 96, geom, cfg)
    assert state.boxes.shape[0] % n_dev == 0
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(96, 96).astype(np.float32))

    ref = cascade_mod.run_cascade(
        plan, specs_tuple, geom, cfg,
        (geom.subimage_height, geom.subimage_width),
        image, net_params, clfs, state)

    mesh = make_mesh(n_dev, ("data",))
    out = sharded_cascade(mesh, plan, specs_tuple, geom, cfg,
                          (geom.subimage_height, geom.subimage_width),
                          image, net_params, clfs, state)

    assert out.boxes.sharding.num_devices == n_dev
    np.testing.assert_allclose(np.asarray(out.boxes), np.asarray(ref.boxes),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(np.asarray(out.conf), np.asarray(ref.conf),
                               rtol=1e-4, atol=1e-4)


def test_sharded_gsfa_step_matches_single():
    rng = np.random.RandomState(1)
    n_dev = 8
    data_axis, model_axis = 4, 2
    x = rng.randn(16 * data_axis, 4 * model_axis, 6).astype(np.float32)

    mean_ref, W_ref = gsfa_step(jnp.asarray(x), out_dim=3)

    mesh = make_mesh(n_dev, ("data", "model"), shape=(data_axis, model_axis))
    mean, W = sharded_gsfa_step(mesh, x, out_dim=3)

    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               rtol=1e-4, atol=1e-5)
    # Eigenvectors are sign/rotation ambiguous only within degenerate
    # eigenvalue blocks; with a generic random input they match up to sign.
    W_ref = np.asarray(W_ref)
    W = np.asarray(W)
    sign = np.sign(np.sum(W * W_ref, axis=-2, keepdims=True))
    np.testing.assert_allclose(W * sign, W_ref, rtol=1e-2, atol=1e-3)


def test_dryrun_multichip_entry():
    """The driver's dry run must execute in-process on the virtual mesh."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
