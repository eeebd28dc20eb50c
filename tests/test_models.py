"""Tests for the model zoo: expansions, SFA/GSFA/PCA solvers, networks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyfaceanalysis_tpu.models import builder
from pyfaceanalysis_tpu.models.expansion import Expansion
from pyfaceanalysis_tpu.models.network import apply_network
from pyfaceanalysis_tpu.models.sfa import (
    igsfa_fit,
    pca_fit,
    sfa_fit,
)


class TestExpansion:
    def test_identity(self):
        x = np.random.randn(5, 3)
        e = Expansion("identity")
        assert e.output_dim(3) == 3
        np.testing.assert_allclose(e(x), x)

    def test_spow_dims_and_values(self):
        x = np.array([[4.0, -9.0]])
        e = Expansion("spow")
        assert e.output_dim(2) == 4
        out = np.asarray(e(x))
        np.testing.assert_allclose(out[0, :2], [4.0, -9.0])
        np.testing.assert_allclose(out[0, 2:], [4.0 ** 0.8, -(9.0 ** 0.8)],
                                   rtol=1e-6)

    def test_qt_dims_and_values(self):
        x = np.array([[1.0, 2.0, 3.0]])
        e = Expansion("qt2")
        assert e.output_dim(3) == 3 + 3      # x + products of first 2 dims
        out = np.asarray(e(x))
        np.testing.assert_allclose(out[0], [1, 2, 3, 1, 2, 4])

    def test_qt_caps_at_dim(self):
        e = Expansion("qt8")
        assert e.output_dim(4) == 4 + 10

    def test_batched_field_axis(self):
        x = np.random.randn(6, 7, 4)
        out = np.asarray(Expansion("spow")(x))
        assert out.shape == (6, 7, 8)


class TestSFA:
    def test_recovers_slow_signal(self):
        t = np.linspace(0, 8 * np.pi, 2000)
        slow, fast = np.sin(t), np.sin(37 * t)
        rng = np.random.RandomState(0)
        x = np.stack([slow, fast], 1) @ rng.randn(2, 6)
        node = sfa_fit(x, 2, graph="temporal")
        y = np.asarray(node(jnp.asarray(x)))
        assert abs(np.corrcoef(y[:, 0], slow)[0, 1]) > 0.98

    def test_serial_graph_orders_by_label(self):
        rng = np.random.RandomState(1)
        label = rng.uniform(-1, 1, 3000)
        x = np.stack([label + 0.05 * rng.randn(3000),
                      rng.randn(3000)], 1) @ rng.randn(2, 5)
        node = sfa_fit(x, 1, graph="serial", labels=label, num_groups=30)
        y = np.asarray(node(jnp.asarray(x)))[:, 0]
        assert abs(np.corrcoef(y, label)[0, 1]) > 0.95

    def test_clustered_graph_separates_classes(self):
        rng = np.random.RandomState(2)
        cls = rng.randint(0, 2, 2000)
        x = np.stack([cls * 2.0 - 1 + 0.2 * rng.randn(2000),
                      rng.randn(2000)], 1) @ rng.randn(2, 4)
        node = sfa_fit(x, 1, graph="clustered", labels=cls)
        y = np.asarray(node(jnp.asarray(x)))[:, 0]
        assert abs(np.corrcoef(y, cls)[0, 1]) > 0.9

    def test_unit_variance_outputs(self):
        rng = np.random.RandomState(3)
        x = rng.randn(5000, 6).cumsum(axis=0)
        node = sfa_fit(x, 3, graph="temporal")
        y = np.asarray(node(jnp.asarray(x)))
        np.testing.assert_allclose(y.std(axis=0), 1.0, atol=0.05)

    def test_batched_fields(self):
        rng = np.random.RandomState(4)
        x = rng.randn(1000, 3, 5).cumsum(axis=0)   # 3 independent fields
        node = sfa_fit(x, 2, graph="temporal")
        assert node.W.shape == (3, 5, 2)
        y = np.asarray(node(jnp.asarray(x)))
        assert y.shape == (1000, 3, 2)

    def test_pca_principal_first(self):
        rng = np.random.RandomState(5)
        x = rng.randn(2000, 3) * np.array([10.0, 1.0, 0.1])
        node = pca_fit(x, 2)
        W = np.asarray(node.W)[0]
        assert abs(W[0, 0]) > 0.99        # first PC along the big axis

    def test_igsfa_preserves_slow_and_energy(self):
        t = np.linspace(0, 6 * np.pi, 3000)
        rng = np.random.RandomState(6)
        x = np.stack([np.sin(t), np.sin(23 * t), np.sin(31 * t)], 1) \
            @ rng.randn(3, 6)
        node = igsfa_fit(x, slow_dim=1, out_dim=3, graph="temporal")
        y = np.asarray(node(jnp.asarray(x)))
        assert y.shape == (3000, 3)
        assert abs(np.corrcoef(y[:, 0], np.sin(t))[0, 1]) > 0.95

    def test_igsfa_device_matches_structure(self):
        """solve_igsfa_device: slow part == GSFA directions; PCA part is
        whitened and decorrelated from the slow reconstruction."""
        from pyfaceanalysis_tpu.models import moments

        t = np.linspace(0, 6 * np.pi, 4000)
        rng = np.random.RandomState(7)
        src = np.stack([np.sin(t), np.sin(17 * t), np.sin(29 * t),
                        np.sin(41 * t), np.sin(53 * t), np.sin(67 * t)], 1)
        x = (src @ rng.randn(6, 8)).astype(np.float32)[:, None, :]  # 1 field
        mean, B, A = moments.gsfa_moments(jnp.asarray(x), "temporal")
        W = np.asarray(moments.solve_igsfa_device(A, B, 2, 6))
        Ws = np.asarray(moments.solve_gsfa_device(A, B, 2))
        assert np.allclose(W[..., :2], Ws, atol=1e-4)
        y = np.einsum("nfd,fdo->nfo", x - np.asarray(mean), W)[:, 0, :]
        # slowest output tracks the slow source
        assert abs(np.corrcoef(y[:, 0], np.sin(t))[0, 1]) > 0.95
        # PCA outputs: ~unit variance, decorrelated from slow outputs
        var = y.var(axis=0)
        assert np.all(var[2:] > 0.5) and np.all(var[2:] < 2.0)
        c = np.corrcoef(y.T)
        assert np.all(np.abs(c[:2, 2:]) < 0.15)


class TestNetworks:
    def test_builder_shapes(self):
        net = builder.build_higsfa(64)
        assert net.specs[0].num_fields == 256
        assert net.specs[-1].num_fields == 1
        assert net.out_dim == 20
        # Each merge halves the field count.
        counts = [s.num_fields for s in net.specs]
        assert counts == sorted(counts, reverse=True)

    def test_field_indices_cover_input(self):
        net = builder.build_higsfa(64)
        idx = net.specs[0].indices_array()
        assert sorted(idx.ravel().tolist()) == list(range(64 * 64))

    def test_apply_network_shapes(self):
        net = builder.build_higsfa(64)
        rng = np.random.RandomState(0)
        x = rng.rand(1500, 4096).astype(np.float32)
        from pyfaceanalysis_tpu.training.trainer import train_network
        trained = train_network(net, x[:1200], graph="temporal",
                                verbose=False)
        y = np.asarray(apply_network(trained.specs, trained.params,
                                     jnp.asarray(x[:8])))
        assert y.shape == (8, 20)
        assert np.isfinite(y).all()

    def test_pca_net_shapes(self):
        net = builder.build_pca_net(96)
        assert net.specs[0].field_size == 36
        assert net.out_dim == 20


def test_bf16_compute_path_close_to_f32():
    """matmul_dtype='bf16' casts GEMM operands only (f32 accumulation):
    outputs must track f32 within bf16 rounding for a realistic network."""
    import jax.numpy as jnp

    from pyfaceanalysis_tpu.models import builder
    from pyfaceanalysis_tpu.models.init import random_network_params
    from pyfaceanalysis_tpu.models.network import apply_network

    net = random_network_params(builder.build_higsfa(32, d=6, top_dim=20),
                                seed=3)
    x = jnp.asarray(np.random.RandomState(0).rand(16, 32 * 32),
                    jnp.float32)
    y32 = np.asarray(apply_network(net.specs, net.params, x))
    y16 = np.asarray(apply_network(net.specs, net.params, x,
                                   compute_dtype=jnp.bfloat16))
    # bf16 has ~8 mantissa bits; layered error stays small thanks to the
    # per-layer clip and f32 accumulation.
    assert np.max(np.abs(y16 - y32)) < 0.15
    assert np.corrcoef(y16.ravel(), y32.ravel())[0, 1] > 0.999


def test_renderer_attribute_cues_decodable():
    """Renderer v3's age/gender cues must be LINEARLY decodable from raw
    decimated pixels (the nets can only amplify what the renderer draws):
    split-half ridge on 32x32 views beats the predict-the-mean baseline
    by a clear margin for age and is well above chance for gender."""
    from pyfaceanalysis_tpu.training import synth

    n = 240
    keys = jax.random.split(jax.random.PRNGKey(20260818), n)
    imgs, attrs = jax.jit(jax.vmap(
        lambda k: synth.render_face(k, canvas_hw=(128, 128), face_size=72.0,
                                    center=(64.0, 64.0))))(keys)
    X = np.asarray(imgs)[:, ::4, ::4].reshape(n, -1)
    h = n // 2
    Xa, Xb = X[:h], X[h:]
    Xm, Xc = Xa.mean(0), Xa - Xa.mean(0)
    gram = Xc.T @ Xc + 0.02 * h * np.eye(X.shape[1])

    def decode(y):
        ya, yb = y[:h], y[h:]
        w = np.linalg.solve(gram, Xc.T @ (ya - ya.mean()))
        return (Xb - Xm) @ w + ya.mean(), yb

    age_pred, age_true = decode(np.asarray(attrs["age"], np.float64))
    base = np.abs(age_true - age_true.mean()).mean()
    assert np.abs(age_pred - age_true).mean() < base - 1.0
    g_pred, g_true = decode(np.asarray(attrs["gender"], np.float64))
    # 32x32 decimation hides most brow/eye gender detail; 0.65 on n=120
    # is still p < 1e-3 vs chance -- a cue-existence gate, not a quality
    # bar (that's tools/diagnose_attrs.py's job on the real 96x96 path).
    assert (np.sign(g_pred) == np.sign(g_true)).mean() >= 0.65


def test_renderer_attr_cues_switch():
    """attr_cues selects the v2 (shipped-provenance) vs v3 cue generation:
    pixels differ, labels and landmark geometry are identical."""
    import jax
    from pyfaceanalysis_tpu.training import synth
    k = jax.random.PRNGKey(7)
    im2, a2 = jax.jit(lambda kk: synth.render_face(kk, attr_cues="v2"))(k)
    im3, a3 = jax.jit(lambda kk: synth.render_face(kk, attr_cues="v3"))(k)
    assert float(abs(im2 - im3).max()) > 1e-3
    for key in ("age", "race", "gender", "eye_l", "eye_r", "mouth"):
        np.testing.assert_allclose(np.asarray(a2[key]), np.asarray(a3[key]))
