"""Upconv lowering A/B: conv_transpose (default) vs matmul+depth-to-space.

The 2x2 stride-2 SAME transpose conv assigns every output pixel exactly one
kernel tap (out[2i+p, 2j+q] = x[i,j] @ k[1-p,1-q]), so it can be lowered as a
1x1 matmul + pixel-shuffle whose backward contains no standalone spatial
`reverse` of the decode activations (1.42 ms/step of the headline profile
comes from those reverses — XLA emits them for the conv_transpose weight
gradient).  BOXSEG_UPCONV_IMPL=dts selects the matmul form; these tests pin:

- forward equivalence of both lowerings (same params, same output)
- gradient equivalence (params + input cotangents)
- the dts arm's backward lowers without `reverse` ops
- param-tree identity (checkpoints interchangeable)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxsegliver_tpu.models.layers import UpConv
from boxsegliver_tpu.models.packed import PackedUpConv, pack_w, unpack_w


def _init_apply(module, x, impl):
    os.environ["BOXSEG_UPCONV_IMPL"] = impl
    try:
        params = module.init(jax.random.PRNGKey(0), x)
        out = module.apply(params, x)
        return params, out
    finally:
        os.environ.pop("BOXSEG_UPCONV_IMPL", None)


def test_dts_forward_matches_conv_transpose():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 6))
    mod = UpConv(4, act=None)
    p_ref, y_ref = _init_apply(mod, x, "window")
    p_dts, y_dts = _init_apply(mod, x, "dts")
    # identical param trees (same names, shapes, values from the same seed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_ref, p_dts)
    np.testing.assert_allclose(np.asarray(y_dts), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    # cross-apply: dts params through the conv_transpose lowering
    y_cross = mod.apply(p_dts, x)
    np.testing.assert_allclose(np.asarray(y_cross), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_dts_gradients_match(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 6, 3))
    mod = UpConv(5, act=None)
    params = mod.init(jax.random.PRNGKey(3), x)

    def loss_with(impl):
        monkeypatch.setenv("BOXSEG_UPCONV_IMPL", impl)
        # distinct lambdas: jax caches traces per callable and the env var
        # is read at trace time
        fn = {"w": lambda p, v: jnp.sum(mod.apply(p, v) ** 2) + 0.0,
              "d": lambda p, v: jnp.sum(mod.apply(p, v) ** 2) + 1.0 - 1.0}[
                  impl[0]]
        g = jax.grad(fn, argnums=(0, 1))(params, x)
        monkeypatch.delenv("BOXSEG_UPCONV_IMPL")
        return g

    gp_ref, gx_ref = loss_with("window")
    gp_dts, gx_dts = loss_with("dts")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        (gp_ref, gx_ref), (gp_dts, gx_dts))


def test_dts_backward_has_no_reverse(monkeypatch):
    monkeypatch.setenv("BOXSEG_UPCONV_IMPL", "dts")
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
    mod = UpConv(4, act=None)
    params = mod.init(jax.random.PRNGKey(5), x)
    txt = jax.jit(jax.grad(
        lambda p, v: jnp.sum(mod.apply(p, v) ** 2))).lower(params, x).as_text()
    # the 2x2 static kernel flip constant-folds; no activation reverse
    assert "reverse" not in txt


def test_packed_dts_matches_packed_conv_transpose(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 16, 8))
    mod = PackedUpConv(4, act=None)
    xp = x[:, :, : x.shape[2] // 2, :]  # packed-shaped input [B,H,W/2,2C]
    params = mod.init(jax.random.PRNGKey(7), xp)
    monkeypatch.delenv("BOXSEG_UPCONV_IMPL", raising=False)
    y_ref = mod.apply(params, xp)
    g_ref = jax.grad(lambda p: jnp.sum(mod.apply(p, xp) ** 2))(params)
    monkeypatch.setenv("BOXSEG_UPCONV_IMPL", "dts")
    y_dts = mod.apply(params, xp) + 0.0
    g_dts = jax.grad(lambda p: jnp.sum(mod.apply(p, xp) ** 2) + 0.0)(params)
    np.testing.assert_allclose(np.asarray(y_dts), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_ref, g_dts)


@pytest.mark.parametrize("lane_pack", [False, True])
def test_unet_step_dts_arm_no_reverse_and_matches(monkeypatch, lane_pack):
    """Full UNet fwd+bwd: dts arm lowers reverse-free and computes the same
    gradients as the default arm (both pool lowerings left at default)."""
    from boxsegliver_tpu.models.unet import UNet

    x = jax.random.normal(jax.random.PRNGKey(8), (1, 32, 32, 3))
    mod = UNet(num_classes=2, init_channels=8, num_down_samples=2,
               normalizer="instance_norm", lane_pack=lane_pack)
    params = mod.init(jax.random.PRNGKey(9), x)

    def loss(p, v, c):
        return jnp.sum(mod.apply(p, v) ** 2) + c

    monkeypatch.delenv("BOXSEG_UPCONV_IMPL", raising=False)
    g_ref = jax.grad(lambda p: loss(p, x, 0.0))(params)
    monkeypatch.setenv("BOXSEG_UPCONV_IMPL", "dts")
    g_dts = jax.grad(lambda p: loss(p, x, 1.0))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3),
        g_ref, g_dts)
    txt = jax.jit(jax.grad(
        lambda p: loss(p, x, 2.0))).lower(params).as_text()
    # the 3x3 convs' input-gradient still flips their (tiny) kernels; the
    # profiled 1.42 ms/step was ACTIVATION reverses — assert none remain
    import re
    for line in txt.splitlines():
        if "stablehlo.reverse" not in line:
            continue
        dims = [int(d) for d in re.search(
            r"dims = \[([0-9, ]+)\]", line).group(1).split(",")]
        shape = [int(d) for d in re.search(
            r"tensor<([0-9x]+)x[a-z]", line).group(1).split("x")]
        assert all(shape[d] <= 3 for d in dims), \
            f"activation reverse survives: {line.strip()}"
