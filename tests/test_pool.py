"""Max-pool lowering A/B: reduce_window (default) vs reshape+max.

Round-3 hypothesis: lowering the 2D zoo's 2x2 stride-2 pools as reshape+max
(backward = loop fusion) should beat reduce_window (backward =
select-and-scatter, 1.79 ms/step in profiles/packed_v2_r3.txt).  Round-4
on-chip A/B MEASURED THE OPPOSITE: 363.7 (reshape) vs 374.8 (reduce_window)
slices/s — the [B,H/2,2,W/2,2,C] reshape breaks T(8,128) tiling and the
relayouts cost more than select-and-scatter.  The default is therefore the
reduce_window lowering; BOXSEG_POOL_IMPL=reshape keeps the alternative
reproducible.  These tests pin:

- forward bit-equality of both lowerings for even shapes (SAME and VALID
  agree there, so one oracle covers both call-site paddings)
- gradient equality on tie-free inputs (ties are the one documented
  deviation: reshape-max splits the gradient among tied maxima,
  select-and-scatter routes it to the first)
- the BOXSEG_POOL_IMPL=reshape arm lowers without reduce_window / without
  select-and-scatter in the backward
- packed_max_pool (height pool + phase max) matches the unpacked 2x2 pool
  exactly under both lowerings
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


def test_forward_matches_reduce_window(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 24, 7))
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got_default = max_pool2x2(x)
    np.testing.assert_array_equal(np.asarray(got_default), np.asarray(ref))
    monkeypatch.setenv("BOXSEG_POOL_IMPL", "reshape")
    got_reshape = max_pool2x2(x)
    np.testing.assert_array_equal(np.asarray(got_reshape), np.asarray(ref))
    # SAME == VALID on even shapes
    ref_same = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
    np.testing.assert_array_equal(np.asarray(got_reshape),
                                  np.asarray(ref_same))


def test_forward_odd_fallback_matches_padding():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 15, 17, 3))
    np.testing.assert_array_equal(
        np.asarray(max_pool2x2(x)),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))))
    np.testing.assert_array_equal(
        np.asarray(max_pool2x2(x, padding="SAME")),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")))


def test_gradient_matches_on_tie_free_input(monkeypatch):
    monkeypatch.setenv("BOXSEG_POOL_IMPL", "reshape")
    x = _tie_free(jax.random.PRNGKey(2), (2, 8, 8, 5))
    g1 = jax.grad(lambda v: jnp.sum(max_pool2x2(v) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(
        nn.max_pool(v, (2, 2), strides=(2, 2)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_impl_env_hook(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    # distinct wrapped lambdas: jax caches traces per underlying callable,
    # and the env var is read at trace time
    monkeypatch.delenv("BOXSEG_POOL_IMPL", raising=False)
    txt = jax.jit(lambda v: max_pool2x2(v) + 0.0).lower(x).as_text()
    assert "reduce_window" in txt  # default lowering
    monkeypatch.setenv("BOXSEG_POOL_IMPL", "reshape")
    txt2 = jax.jit(lambda v: max_pool2x2(v) + 1.0).lower(x).as_text()
    assert "reduce_window" not in txt2


def test_reshape_arm_has_no_select_and_scatter(monkeypatch):
    monkeypatch.setenv("BOXSEG_POOL_IMPL", "reshape")
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    g = lambda v: jnp.sum(max_pool2x2(v))
    txt = jax.jit(jax.grad(g)).lower(x).as_text()
    assert "select_and_scatter" not in txt


@pytest.mark.parametrize("impl", ["window", "reshape"])
def test_packed_max_pool_matches_unpacked(monkeypatch, impl):
    monkeypatch.setenv("BOXSEG_POOL_IMPL", impl)
    x = _tie_free(jax.random.PRNGKey(5), (2, 16, 16, 6))
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = packed_max_pool(pack_w(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # gradient parity through the packed path (tie-free)
    g1 = jax.grad(lambda v: jnp.sum(packed_max_pool(pack_w(v)) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(
        nn.max_pool(v, (2, 2), strides=(2, 2)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_model_step_reshape_arm_has_no_select_and_scatter(monkeypatch):
    """The UNet forward+backward contains no select-and-scatter under the
    reshape arm (packed and unpacked) — the property the A/B arm exists to
    provide."""
    monkeypatch.setenv("BOXSEG_POOL_IMPL", "reshape")
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
