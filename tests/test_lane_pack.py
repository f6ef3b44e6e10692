"""Parity of the width-packed full-res stage (models/packed.py) vs the
standard UNet: identical parameter trees, matching outputs/grads/stats.

The packed layout is the TPU performance path (PERF.md: fills the 128-wide
lanes at 256^2 where C=64 half-pads every tile); these tests pin that it is
a pure layout change — same math, same checkpoint format."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxsegliver_tpu.models.unet import UNet


def _models(normalizer="batch_norm", **kw):
    base = dict(num_classes=3, init_channels=8, num_down_samples=2,
                normalizer=normalizer, **kw)
    return UNet(**base), UNet(lane_pack=True, **base)


def _init(model, x, seed=0):
    return model.init(jax.random.PRNGKey(seed), {"images": x}, train=False)


@pytest.fixture(scope="module")
def x():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)


@pytest.mark.parametrize("normalizer", ["batch_norm", "instance_norm"])
def test_param_tree_identical(x, normalizer):
    ref, packed = _models(normalizer)
    vr = _init(ref, x)
    vp = _init(packed, x)
    ref_paths = set(jax.tree_util.keystr(p) + str(v.shape)
                    for p, v in jax.tree_util.tree_flatten_with_path(vr)[0])
    packed_paths = set(jax.tree_util.keystr(p) + str(v.shape)
                       for p, v in jax.tree_util.tree_flatten_with_path(vp)[0])
    assert ref_paths == packed_paths


@pytest.mark.parametrize("normalizer", ["batch_norm", "instance_norm"])
def test_eval_forward_parity(x, normalizer):
    ref, packed = _models(normalizer)
    v = _init(ref, x)
    yr = ref.apply(v, {"images": x}, train=False)
    yp = packed.apply(v, {"images": x}, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def test_train_forward_and_stats_parity(x):
    ref, packed = _models("batch_norm")
    v = _init(ref, x)
    yr, mr = ref.apply(v, {"images": x}, train=True, mutable=["batch_stats"])
    yp, mp = packed.apply(v, {"images": x}, train=True,
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
    ref, packed = _models("batch_norm")
    v = _init(ref, x)
    lab = jnp.zeros((2, 32, 32), jnp.int32)

    def loss(model, params):
        va = {"params": params, "batch_stats": v["batch_stats"]}
        logits, _ = model.apply(va, {"images": x}, train=True,
                                mutable=["batch_stats"])
        oh = jax.nn.one_hot(lab, 3)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    gr = jax.grad(lambda p: loss(ref, p))(v["params"])
    gp = jax.grad(lambda p: loss(packed, p))(v["params"])
    for (pr, ar), (pp, ap) in zip(
            jax.tree_util.tree_flatten_with_path(gr)[0],
            jax.tree_util.tree_flatten_with_path(gp)[0]):
        np.testing.assert_allclose(np.asarray(ar), np.asarray(ap),
                                   rtol=5e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pr))


def test_without_norm_and_img_grad_parity(x):
    base = dict(num_classes=2, init_channels=8, num_down_samples=2,
                without_norm=True, img_grad=True)
    ref, packed = UNet(**base), UNet(lane_pack=True, **base)
    v = _init(ref, x)
    yr = ref.apply(v, {"images": x}, train=False)
    yp = packed.apply(v, {"images": x}, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def _gunet_pair(**kw):
    from boxsegliver_tpu.models.gunet import GUNet
    base = dict(num_classes=2, init_channels=8, num_down_samples=2,
                normalizer="instance_norm", context_fc_channels=(16,), **kw)
    return GUNet(**base), GUNet(lane_pack=True, **base)


def _gunet_feats(x, model):
    feats = {"images": x}
    if model.use_context:
        feats["context"] = jnp.asarray(
            np.random.RandomState(2).rand(x.shape[0], 32), jnp.float32)
    if model.use_spatial:
        feats["sp_guide"] = jnp.asarray(
            np.random.RandomState(3).rand(*x.shape[:3], 1), jnp.float32)
    return feats


@pytest.mark.parametrize("kw", [
    # flagship shape: stage 0 unmodulated (packed fast path)
    dict(use_context=True, use_spatial=True, mod_layers=(1, 2)),
    # stage 0 modulated: packed gamma-tiling + packed spatial add
    dict(use_context=True, use_spatial=True, mod_layers=(0, 1)),
    # affine + SE variants over packed stage 0
    dict(use_context=True, mod_layers=(0, 1), use_se=True,
         after_affine=True),
])
def test_gunet_forward_parity(x, kw):
    ref, packed = _gunet_pair(**kw)
    feats = _gunet_feats(x, ref)
    v = ref.init(jax.random.PRNGKey(0), feats, train=False)
    yr = ref.apply(v, feats, train=False)
    yp = packed.apply(v, feats, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def test_gunet_grad_parity(x):
    ref, packed = _gunet_pair(use_context=True, use_spatial=True,
                              mod_layers=(1, 2))
    feats = _gunet_feats(x, ref)
    v = ref.init(jax.random.PRNGKey(0), feats, train=False)
    lab = jnp.zeros((2, 32, 32), jnp.int32)

    def loss(model, params):
        logits = model.apply({"params": params}, feats, train=False)
        oh = jax.nn.one_hot(lab, 2)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, -1))

    gr = jax.grad(lambda p: loss(ref, p))(v["params"])
    gp = jax.grad(lambda p: loss(packed, p))(v["params"])
    for (pr, ar), (pp, ap) in zip(
            jax.tree_util.tree_flatten_with_path(gr)[0],
            jax.tree_util.tree_flatten_with_path(gp)[0]):
        np.testing.assert_allclose(np.asarray(ar), np.asarray(ap),
                                   rtol=5e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pr))


def test_unet_inter_forward_parity(x):
    from boxsegliver_tpu.models.unet_inter import UNetInter
    base = dict(num_classes=2, init_channels=8, num_down_samples=2,
                normalizer="instance_norm")
    ref, packed = UNetInter(**base), UNetInter(lane_pack=True, **base)
    feats = {"images": x,
             "sp_guide": jnp.asarray(
                 np.random.RandomState(4).rand(*x.shape[:3], 2), jnp.float32)}
    v = ref.init(jax.random.PRNGKey(0), feats, train=False)
    yr = ref.apply(v, feats, train=False)
    yp = packed.apply(v, feats, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def test_small_unet_forward_parity(x):
    from boxsegliver_tpu.models.small_unet import SmallUNet
    base = dict(num_classes=2, init_channel_factor=0.125,
                normalizer="instance_norm")
    ref, packed = SmallUNet(**base), SmallUNet(lane_pack=True, **base)
    feats = {"images": x,
             "sp_guide": jnp.asarray(
                 np.random.RandomState(5).rand(*x.shape[:3], 1), jnp.float32)}
    v = ref.init(jax.random.PRNGKey(0), feats, train=False)
    vp = packed.init(jax.random.PRNGKey(0), feats, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    yr = ref.apply(v, feats, train=False)
    yp = packed.apply(v, feats, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("img_grad", [False, True])
def test_inter_unet_forward_parity(x, img_grad):
    from boxsegliver_tpu.models.inter_unet import InterUNet
    base = dict(num_classes=2, init_channel_factor=0.125, im_channel=3,
                img_grad=img_grad, normalizer="instance_norm")
    ref, packed = InterUNet(**base), InterUNet(lane_pack=True, **base)
    feats = {"images": x,
             "sp_guide": jnp.asarray(
                 np.random.RandomState(6).rand(*x.shape[:3], 2), jnp.float32)}
    v = ref.init(jax.random.PRNGKey(0), feats, train=False)
    vp = packed.init(jax.random.PRNGKey(0), feats, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    yr = ref.apply(v, feats, train=False)
    yp = packed.apply(v, feats, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)


def test_lgnet_forward_parity():
    from boxsegliver_tpu.models.lgnet import LGNet
    base = dict(num_classes=2, use_spatial=True, mod_layers=((0, 1), (0, 1)),
                normalizer="instance_norm")
    ref, packed = LGNet(**base), LGNet(lane_pack=True, **base)
    rng = np.random.RandomState(7)
    feats = {"images": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
             "sp_guide": jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)}
    v = ref.init(jax.random.PRNGKey(0), feats, train=False)
    vp = packed.init(jax.random.PRNGKey(0), feats, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    yr = ref.apply(v, feats, train=False)
    yp = packed.apply(v, feats, train=False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=2e-4, atol=2e-4)


def test_odd_width_falls_back(x):
    """lane_pack with an odd width silently uses the standard path."""
    model = UNet(num_classes=2, init_channels=8, num_down_samples=1,
                 lane_pack=True)
    xo = jnp.asarray(np.random.RandomState(1).rand(1, 30, 30, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), {"images": xo}, train=False)
    y = model.apply(v, {"images": xo}, train=False)
    assert y.shape == (1, 30, 30, 2)
