"""Parity of the width-packed UNet3D shallow stages (models/packed3d.py) vs
the standard model: identical parameter trees, matching outputs/grads/stats.

Uses init_channels=6 so the fold schedule matches production UNet3D
(init 30): stage 0 fold 4, stage 1 fold 2, deeper stages unpacked — the test
exercises every fold transition the production model compiles (pack input,
4->2 strided conv, 2->1 strided conv, 1->2 and 2->4 upconvs, packed
pointwise logits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxsegliver_tpu.models.packed3d import fold_schedule
from boxsegliver_tpu.models.unet3d import UNet3D


def _models(normalizer="instance_norm", **kw):
    base = dict(num_classes=3, init_channels=6, num_pool_layers=4,
                max_channels=48, normalizer=normalizer, **kw)
    return UNet3D(**base), UNet3D(lane_pack=True, **base)


def _feats(x, model):
    feats = {"images": x}
    if model.use_spatial:
        feats["sp_guide"] = jnp.full(x.shape[:-1] + (1,), 0.5, jnp.float32)
    return feats


def _init(model, x, seed=0):
    return model.init(jax.random.PRNGKey(seed), _feats(x, model), train=False)


@pytest.fixture(scope="module")
def x():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(2, 4, 16, 16, 1), jnp.float32)


def test_fold_schedule():
    assert fold_schedule(30) == (4, 2)   # production UNet3D
    assert fold_schedule(6) == (4, 2)    # this test
    assert fold_schedule(64) == (2,)
    assert fold_schedule(128) == ()


@pytest.mark.parametrize("normalizer", ["instance_norm", "batch_norm"])
def test_param_tree_identical(x, normalizer):
    ref, packed = _models(normalizer)
    vr, vp = _init(ref, x), _init(packed, x)
    as_set = lambda v: set(
        jax.tree_util.keystr(p) + str(val.shape)
        for p, val in jax.tree_util.tree_flatten_with_path(v)[0])
    assert as_set(vr) == as_set(vp)


@pytest.mark.parametrize("normalizer", ["instance_norm", "batch_norm"])
def test_eval_forward_parity(x, normalizer):
    ref, packed = _models(normalizer)
    v = _init(ref, x)
    yr = ref.apply(v, _feats(x, ref), train=False)
    yp = packed.apply(v, _feats(x, packed), train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def test_spatial_guide_parity(x):
    ref, packed = _models(use_spatial=True)
    v = _init(ref, x)
    yr = ref.apply(v, _feats(x, ref), train=False)
    yp = packed.apply(v, _feats(x, packed), train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def test_train_forward_and_stats_parity(x):
    ref, packed = _models("batch_norm")
    v = _init(ref, x)
    yr, mr = ref.apply(v, _feats(x, ref), train=True, mutable=["batch_stats"])
    yp, mp = packed.apply(v, _feats(x, packed), train=True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
    for (pr, sr), (pp, sp) in zip(
            jax.tree_util.tree_flatten_with_path(mr)[0],
            jax.tree_util.tree_flatten_with_path(mp)[0]):
        assert jax.tree_util.keystr(pr) == jax.tree_util.keystr(pp)
        np.testing.assert_allclose(np.asarray(sr), np.asarray(sp),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pr))


def test_grad_parity(x):
    ref, packed = _models()
    v = _init(ref, x)
    lab = jnp.zeros((2, 4, 16, 16), jnp.int32)

    def loss(model, params):
        logits = model.apply({"params": params}, _feats(x, model), train=True)
        oh = jax.nn.one_hot(lab, 3)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))

    gr = jax.grad(lambda p: loss(ref, p))(v["params"])
    gp = jax.grad(lambda p: loss(packed, p))(v["params"])
    for (pr, ar), (pp, ap) in zip(
            jax.tree_util.tree_flatten_with_path(gr)[0],
            jax.tree_util.tree_flatten_with_path(gp)[0]):
        assert jax.tree_util.keystr(pr) == jax.tree_util.keystr(pp)
        np.testing.assert_allclose(np.asarray(ar), np.asarray(ap),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(pr))


def test_wide_channels_fall_back_unpacked(x):
    """init_channels > 64 -> empty fold schedule: lane_pack=True must build
    the plain unpacked graph (bitwise-identical outputs).  (Odd widths can't
    reach the packed path: UNet3D itself needs W % 2**num_pool == 0.)"""
    base = dict(num_classes=2, init_channels=96, num_pool_layers=4,
                max_channels=128)
    ref, packed = UNet3D(**base), UNet3D(lane_pack=True, **base)
    v = ref.init(jax.random.PRNGKey(3), {"images": x}, train=False)
    yr = ref.apply(v, {"images": x}, train=False)
    yp = packed.apply(v, {"images": x}, train=False)
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(yp))


def test_five_pool_parity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 4, 32, 32, 1), jnp.float32)
    base = dict(num_classes=2, init_channels=6, num_pool_layers=5,
                max_channels=48)
    ref, packed = UNet3D(**base), UNet3D(lane_pack=True, **base)
    v = ref.init(jax.random.PRNGKey(2), {"images": x}, train=False)
    yr = ref.apply(v, {"images": x}, train=False)
    yp = packed.apply(v, {"images": x}, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
