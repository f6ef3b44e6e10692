"""Reshape-based non-overlapping max pool vs the reduce_window lowering.

The 2D zoo's 2x2 stride-2 pools are lowered as reshape+max so their backward
is a loop fusion instead of select-and-scatter (measured 1.79 ms/step of the
headline train step, profiles/packed_v2_r3.txt).  These tests pin:

- forward bit-equality with nn.max_pool for even shapes (SAME and VALID agree
  there, so one oracle covers both call-site paddings)
- gradient equality on tie-free inputs (ties are the one documented
  deviation: reshape-max splits the gradient among tied maxima,
  select-and-scatter routes it to the first)
- the BOXSEG_POOL_IMPL=window escape hatch restores reduce_window
- packed_max_pool (height reshape-pool + phase max) still matches the
  unpacked 2x2 pool exactly
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from boxsegliver_tpu.models.layers import max_pool2x2
from boxsegliver_tpu.models.packed import pack_w, packed_max_pool


def _tie_free(key, shape):
    """Random tensor guaranteed tie-free inside every 2x2 window (distinct
    values globally)."""
    n = int(np.prod(shape))
    perm = jax.random.permutation(key, n).astype(jnp.float32)
    return (perm / n).reshape(shape)


def test_forward_matches_reduce_window():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 24, 7))
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = max_pool2x2(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # SAME == VALID on even shapes
    ref_same = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_same))


def test_forward_odd_fallback_matches_padding():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 15, 17, 3))
    np.testing.assert_array_equal(
        np.asarray(max_pool2x2(x)),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))))
    np.testing.assert_array_equal(
        np.asarray(max_pool2x2(x, padding="SAME")),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")))


def test_gradient_matches_on_tie_free_input():
    x = _tie_free(jax.random.PRNGKey(2), (2, 8, 8, 5))
    g1 = jax.grad(lambda v: jnp.sum(max_pool2x2(v) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(
        nn.max_pool(v, (2, 2), strides=(2, 2)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_window_env_hook(monkeypatch):
    monkeypatch.setenv("BOXSEG_POOL_IMPL", "window")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    # distinct wrapped lambdas: jax caches traces per underlying callable,
    # and the env var is read at trace time
    txt = jax.jit(lambda v: max_pool2x2(v) + 0.0).lower(x).as_text()
    assert "reduce_window" in txt
    monkeypatch.delenv("BOXSEG_POOL_IMPL")
    txt2 = jax.jit(lambda v: max_pool2x2(v) + 1.0).lower(x).as_text()
    assert "reduce_window" not in txt2


def test_no_select_and_scatter_in_backward():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    g = lambda v: jnp.sum(max_pool2x2(v))
    txt = jax.jit(jax.grad(g)).lower(x).as_text()
    assert "select_and_scatter" not in txt


def test_packed_max_pool_matches_unpacked():
    x = _tie_free(jax.random.PRNGKey(5), (2, 16, 16, 6))
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = packed_max_pool(pack_w(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # gradient parity through the packed path (tie-free)
    g1 = jax.grad(lambda v: jnp.sum(packed_max_pool(pack_w(v)) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(
        nn.max_pool(v, (2, 2), strides=(2, 2)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_model_step_has_no_select_and_scatter():
    """The UNet train-relevant forward+backward contains no
    select-and-scatter after the pool rewrite (packed and unpacked)."""
    from boxsegliver_tpu.models.unet import UNet

    for lane_pack in (False, True):
        model = UNet(num_classes=3, init_channels=8, lane_pack=lane_pack)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss_fn(params):
            out = model.apply({"params": params, **{k: v for k, v in
                               variables.items() if k != "params"}},
                              x, train=True,
                              mutable=["batch_stats"])[0]
            logits = out["logits"] if isinstance(out, dict) else out
            return jnp.sum(logits.astype(jnp.float32) ** 2)

        txt = jax.jit(jax.grad(loss_fn)).lower(variables["params"]).as_text()
        assert "select_and_scatter" not in txt, f"lane_pack={lane_pack}"
