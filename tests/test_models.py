import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxsegliver_tpu.models import (MODEL_ZOO, build_model, load_model_config,
                                    predictions_from_logits)
from boxsegliver_tpu.models.gunet import GUNet
from boxsegliver_tpu.models.unet import UNet
from boxsegliver_tpu.models.unet3d import UNet3D
from boxsegliver_tpu.models.layers import image_gradients, sobel_edges

H = W = 64  # small spatial size keeps CPU tests fast


def _init_and_apply(model, inputs, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, inputs, train=False)
    if train:
        out, _ = model.apply(variables, inputs, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
    else:
        out = model.apply(variables, inputs, train=False)
    return variables, out


def test_unet_shapes_and_param_count():
    model = UNet(num_classes=3, init_channels=8, num_down_samples=2)
    inputs = {"images": jnp.zeros((2, H, W, 3))}
    variables, logits = _init_and_apply(model, inputs)
    assert logits.shape == (2, H, W, 3)
    assert "batch_stats" in variables  # default batch_norm


def test_unet_instance_norm_no_batch_stats():
    model = UNet(num_classes=2, init_channels=8, num_down_samples=2,
                 normalizer="instance_norm")
    inputs = {"images": jnp.zeros((1, H, W, 3))}
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    assert "batch_stats" not in variables


def test_unet_full_size_param_count_matches_reference_scale():
    # the classic UNet at init_channels=64/4 downsamples has ~31M params
    model = UNet(num_classes=3, init_channels=64, num_down_samples=4)
    inputs = {"images": jnp.zeros((1, 256, 256, 3))}
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 30e6 < n < 35e6, n


def test_gunet_both_guides():
    model = GUNet(num_classes=3, init_channels=8, num_down_samples=2,
                  mod_layers=(1, 2), context_fc_channels=(32,),
                  use_context=True, use_spatial=True,
                  normalizer="instance_norm")
    inputs = {
        "images": jnp.zeros((2, H, W, 3)),
        "context": jnp.zeros((2, 200)),
        "sp_guide": jnp.full((2, H, W, 1), 0.5),
    }
    variables, logits = _init_and_apply(model, inputs, train=True)
    assert logits.shape == (2, H, W, 3)
    # n_modulator_param = 8 * (2 + 4) * 2 = 96
    assert variables["params"]["context"]["Dense_1"]["kernel"].shape == (32, 96)
    # spatial convs exist only at mod layers
    assert "spatial_conv2" in variables["params"]
    assert "spatial_conv1" not in variables["params"]


def test_gunet_guides_change_output():
    model = GUNet(num_classes=2, init_channels=8, num_down_samples=2,
                  mod_layers=(0, 1, 2), use_spatial=True,
                  normalizer="instance_norm")
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    g1 = jnp.full((1, H, W, 1), 0.5)
    g2 = jnp.ones((1, H, W, 1))
    variables = model.init(jax.random.PRNGKey(0),
                           {"images": images, "sp_guide": g1}, train=False)
    out1 = model.apply(variables, {"images": images, "sp_guide": g1}, train=False)
    out2 = model.apply(variables, {"images": images, "sp_guide": g2}, train=False)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-4


def test_gunet_se_variant():
    model = GUNet(num_classes=2, init_channels=8, num_down_samples=2,
                  mod_layers=(1,), context_fc_channels=(16,),
                  use_context=True, use_se=True, normalizer="instance_norm")
    inputs = {"images": jnp.zeros((1, H, W, 3)), "context": jnp.zeros((1, 100))}
    _, logits = _init_and_apply(model, inputs)
    assert logits.shape == (1, H, W, 2)


def test_gunet_after_affine():
    model = GUNet(num_classes=2, init_channels=8, num_down_samples=2,
                  mod_layers=(1,), use_spatial=True, after_affine=True,
                  normalizer="instance_norm")
    inputs = {"images": jnp.zeros((1, H, W, 3)),
              "sp_guide": jnp.full((1, H, W, 1), 0.5)}
    variables, logits = _init_and_apply(model, inputs)
    affs = [k for k in variables["params"] if "affine" in k]
    assert len(affs) == 6  # 2 convs × 3 blocks (0..2)


def test_unet_inter_mid_cat():
    for mid_cat in (False, True):
        model = MODEL_ZOO["UNetInter"](num_classes=2, init_channels=8,
                                       num_down_samples=2, mid_cat=mid_cat,
                                       normalizer="instance_norm")
        inputs = {"images": jnp.zeros((1, H, W, 3)),
                  "sp_guide": jnp.zeros((1, H, W, 2))}
        _, logits = _init_and_apply(model, inputs)
        assert logits.shape == (1, H, W, 2)


def test_small_unet_and_inter_unet():
    inputs = {"images": jnp.zeros((1, H, W, 3)),
              "sp_guide": jnp.zeros((1, H, W, 1))}
    for name in ("SmallUNet", "InterUNet"):
        model = MODEL_ZOO[name](num_classes=2, init_channel_factor=0.125,
                                normalizer="instance_norm")
        _, logits = _init_and_apply(model, inputs)
        assert logits.shape == (1, H, W, 2), name


def test_lgnet():
    model = MODEL_ZOO["LGNet"](num_classes=2, mod_layers=((0, 1), (0, 1)),
                               use_spatial=True, normalizer="instance_norm")
    inputs = {"images": jnp.zeros((1, H, W, 3)),
              "sp_guide": jnp.zeros((1, H, W, 1))}
    _, logits = _init_and_apply(model, inputs)
    assert logits.shape == (1, H, W, 2)


def test_unet3d_anisotropic():
    model = UNet3D(num_classes=2, init_channels=4, num_pool_layers=4,
                   max_channels=16, normalizer="instance_norm")
    inputs = {"images": jnp.zeros((1, 16, 64, 64, 1))}
    _, logits = _init_and_apply(model, inputs)
    assert logits.shape == (1, 16, 64, 64, 2)


def test_unet3d_guide():
    model = UNet3D(num_classes=2, init_channels=4, num_pool_layers=4,
                   max_channels=16, use_spatial=True,
                   normalizer="instance_norm")
    inputs = {"images": jnp.zeros((1, 16, 64, 64, 1)),
              "sp_guide": jnp.zeros((1, 16, 64, 64, 1))}
    _, logits = _init_and_apply(model, inputs)
    assert logits.shape == (1, 16, 64, 64, 2)


def test_build_model_from_yaml():
    class Args:
        model = "GUNet"
        model_config = "GUNet_SP.yml"
        classes = ["Liver", "Tumor"]
        normalizer = "instance_norm"
        without_norm = False
        img_grad = False
        weight_init = "xavier"
        use_context = False
        use_spatial = True
        use_se = False
        guide_channel = 1
        side_dropout = 0.0
        dropout = 0.0
        fix = False

    cfg = load_model_config("GUNet", "GUNet_SP.yml")
    assert cfg["norm_with_scale"] is True
    model = build_model("GUNet", Args(), cfg)
    assert model.num_classes == 3
    assert model.mod_layers == (1, 2, 3, 4)
    assert model.norm_with_scale is True


def test_predictions_from_logits_contract():
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3), jnp.float32)
    probs, preds = predictions_from_logits(logits, ["Background", "Liver", "Tumor"])
    assert set(preds) == {"LiverProb", "LiverPred", "TumorProb", "TumorPred"}
    assert preds["LiverPred"].dtype == jnp.uint8
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_image_gradients_tf_semantics():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    dy, dx = image_gradients(img)
    np.testing.assert_allclose(np.asarray(dy[0, :, 0, 0]), [4, 4, 4, 0])
    np.testing.assert_allclose(np.asarray(dx[0, 0, :, 0]), [1, 1, 1, 0])


def test_sobel_edges_shape():
    img = jnp.zeros((1, 16, 16, 1))
    out = sobel_edges(img)
    assert out.shape == (1, 16, 16, 2)
