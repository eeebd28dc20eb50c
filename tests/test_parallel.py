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


def test_mesh_trainer_matches_single_device():
    """pfa-train --data_mesh=N path: the PRODUCTION train_network under an
    8-device data mesh reproduces the single-device weights (per-layer W
    up to eigenvector sign; moments reductions reorder, hence tolerance).
    Serial graph = the pose-net path; clustered = the disc path."""
    from pyfaceanalysis_tpu.models import builder
    from pyfaceanalysis_tpu.parallel.train_step import sharded_train_network
    from pyfaceanalysis_tpu.training.trainer import train_network

    rng = np.random.RandomState(7)
    net = builder.build_higsfa(16, base_field=4, d=6, top_dim=8)
    n = 32 * 8
    # Label-correlated data so the slow directions have clean eigengaps
    # (pure-noise covariances have near-degenerate spectra, which would
    # make the eigenvector comparison ill-posed rather than wrong).
    lab = rng.rand(n)
    x = (np.outer(lab, rng.randn(256)) +
         0.3 * rng.randn(n, 256)).astype(np.float32)

    import jax

    for graph, labels, groups in (("serial", lab, 8),
                                  ("clustered", (lab * 8).astype(int), 8)):
        ref = train_network(net, x, graph=graph, labels=labels,
                            num_groups=groups, verbose=False)
        mesh = make_mesh(8, ("data",))
        out = sharded_train_network(mesh, net, x, graph=graph,
                                    labels=labels, num_groups=groups)
        # The distributed reduction itself: graph moments of the sharded
        # batch match the single-device moments tightly. (W comparison is
        # ill-posed -- eigenvectors inside near-degenerate blocks rotate
        # freely under 1e-6 moment perturbations -- so weights are checked
        # functionally below instead.)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pyfaceanalysis_tpu.models import moments

        xj = x.reshape(n, 16, 16)[:, :4, :4].reshape(n, 1, 16)
        m_r, B_r, A_r = moments.gsfa_moments(xj, graph, labels=labels,
                                             num_groups=groups)
        xs = jax.device_put(xj, NamedSharding(make_mesh(8, ("data",)),
                                              P("data", None, None)))
        m_o, B_o, A_o = moments.gsfa_moments(xs, graph, labels=labels,
                                             num_groups=groups)
        for nm, r, o in (("mean", m_r, m_o), ("B", B_r, B_o),
                         ("A", A_r, A_o)):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-5, rtol=1e-4,
                                       err_msg=f"{graph} {nm}")
        # End to end: the two nets compute the same feature SPACE
        # (canonical correlations; invariant to the sign/rotation freedom
        # of eigenvectors inside near-degenerate blocks).
        # Only the INFORMATIVE leading subspace is well-determined (an
        # 8-group graph pins ~7 slow directions; trailing outputs sit in
        # the noise floor and rotate freely between runs), so compare the
        # first-5-feature subspaces.
        k = 5
        fr = np.asarray(jax.jit(ref.execute)(x))[:, :k]
        fo = np.asarray(jax.jit(out.execute)(x))[:, :k]
        fr = (fr - fr.mean(0)) / (fr.std(0) + 1e-9)
        fo = (fo - fo.mean(0)) / (fo.std(0) + 1e-9)
        qr_r, _ = np.linalg.qr(fr)
        qr_o, _ = np.linalg.qr(fo)
        cc = np.linalg.svd(qr_r.T @ qr_o, compute_uv=False)
        assert cc.mean() > 0.98 and cc.min() > 0.9, (
            f"{graph}: canonical correlations {cc}")


def test_detect_stream_mesh_matches_unsharded():
    """The streamed serving path (detect_stream -- what a production batch
    job runs) under a data_mesh=8 FaceDetector reproduces the unsharded
    detections exactly (same bucket shapes; GSPMD only splits the window
    batch axis). VERDICT r4 next #7."""
    import __graft_entry__

    rng = np.random.RandomState(7)
    batches = [[rng.rand(96, 112).astype(np.float32) for _ in range(2)]
               for _ in range(2)]

    det_mesh = __graft_entry__._toy_detector(8)
    det_single = __graft_entry__._toy_detector(0, bucket_lanes=8)

    got = list(det_mesh.detect_stream(iter(batches),
                                      estimate_attributes=False))
    ref = [det_single.detect_batch(b, estimate_attributes=False)
           for b in batches]
    assert len(got) == len(ref) == 2
    for gb, rb in zip(got, ref):
        assert [len(d) for d in gb] == [len(d) for d in rb]
        for gi, ri in zip(gb, rb):
            for g, r in zip(gi, ri):
                np.testing.assert_allclose(g.box, r.box, atol=1e-4)
                np.testing.assert_allclose(g.confidence, r.confidence,
                                           atol=1e-4)
