"""Pallas kernel tests (interpret mode on the CPU mesh; the same kernel was
verified compiled-and-matching on the real TPU)."""

import jax.numpy as jnp
import numpy as np

from boxsegliver_tpu.ops.guides import gaussian_guide_2d
from boxsegliver_tpu.ops.pallas_kernels import gaussian_guide_batch


def test_pallas_guide_matches_jnp_reference():
    bs, K, H, W = 3, 8, 64, 64
    rng = np.random.default_rng(0)
    centers = rng.uniform(5, 59, (bs, K, 2)).astype(np.float32)
    stddevs = rng.uniform(2, 8, (bs, K, 2)).astype(np.float32)
    n_objs = np.array([0, 3, 8], np.int32)
    out = np.asarray(gaussian_guide_batch(
        jnp.asarray(centers), jnp.asarray(stddevs), jnp.asarray(n_objs),
        height=H, width=W, interpret=True))
    assert out.shape == (bs, H, W, 1)
    for b in range(bs):
        mask = jnp.arange(K) < n_objs[b]
        ref = np.asarray(gaussian_guide_2d((H, W), centers[b], stddevs[b],
                                           mask=mask))
        np.testing.assert_allclose(out[b], ref, atol=1e-5)
    # zero objects → all-zero guide
    assert out[0].max() == 0.0


# ---------------------------------------------------------------------------
# Fused instance-norm + ReLU custom VJP (Pallas backward)
# ---------------------------------------------------------------------------

def _ref_in_relu(x, scale, bias):
    import jax
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * scale + bias
    return jnp.maximum(y, 0.0).astype(x.dtype)


def test_fused_in_relu_forward_matches_reference():
    from boxsegliver_tpu.ops.pallas_kernels import fused_instance_norm_relu
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 24, 16, 8)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(8,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
    np.testing.assert_allclose(np.asarray(fused_instance_norm_relu(x, scale, bias)),
                               np.asarray(_ref_in_relu(x, scale, bias)),
                               atol=1e-5)


def test_fused_in_relu_grads_match_autodiff():
    """The Pallas backward (interpret mode here) reproduces XLA autodiff
    gradients for x, scale, and bias."""
    import jax
    from boxsegliver_tpu.ops.pallas_kernels import fused_instance_norm_relu

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 24, 16, 8)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(8,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_instance_norm_relu(x, s, b) * g)

    def loss_ref(x, s, b):
        return jnp.sum(_ref_in_relu(x, s, b) * g)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(got, want, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4,
                                   rtol=1e-3, err_msg=name)


def test_conv_norm_act_fused_instance_norm_opt_in(monkeypatch):
    """ConvNormAct routes instance_norm + relu through the fused module ONLY
    under BOXSEG_PALLAS_IN_RELU=1 (flax Norm otherwise; see PERF.md for why
    the default stays on XLA)."""
    import jax
    from boxsegliver_tpu.models.layers import ConvNormAct

    m_default = ConvNormAct(4, normalizer="instance_norm")
    x = jnp.ones((2, 16, 16, 3), jnp.float32)
    v_default = m_default.init(jax.random.PRNGKey(0), x)
    assert "Norm_0" in v_default["params"]

    monkeypatch.setenv("BOXSEG_PALLAS_IN_RELU", "1")
    m = ConvNormAct(4, normalizer="instance_norm")
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "FusedInstanceNormRelu_0" in variables["params"]
    y = m.apply(variables, x)
    assert y.shape == (2, 16, 16, 4)
    assert float(jnp.min(y)) >= 0.0  # relu applied

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)
    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
