"""DenseUNet (reference NetworksV2/DenseUNet.py) + DenseNet-161 h5 import
(reference core/models.py:188-221)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boxsegliver_tpu.models import MODEL_ZOO, build_model
from boxsegliver_tpu.models.dense_unet import DenseUNet
from boxsegliver_tpu.utils.h5_import import load_densenet161_h5

TINY = dict(num_classes=3, stem_channels=8, growth_rate=4,
            nb_layers=(2, 1, 1, 1), compression=0.5)


def _tiny_variables(rng=0):
    model = DenseUNet(**TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(rng), x, train=False)
    return model, variables


def test_forward_shape_and_finite():
    model, variables = _tiny_variables()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 64, 64, 3)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_registered_and_yaml_config():
    assert "DenseUNet" in MODEL_ZOO
    model = build_model("DenseUNet", model_kwargs=dict(TINY), num_classes=3)
    assert model.growth_rate == 4


def test_real_config_channel_arithmetic():
    """The derived decoder widths equal the reference's hard-coded
    768/384/96 (DenseUNet.py:96-112) for the DenseNet-161 config.
    Checked via abstract eval (no 28M-param init)."""
    model = build_model("DenseUNet", num_classes=3)  # YAML 161 config
    x = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros(x.shape, x.dtype), train=False))
    p = variables["params"]
    assert p["conv1"]["kernel"].shape == (7, 7, 3, 96)
    assert p["line0"]["kernel"].shape[-2:] == (2112, 2208)
    assert p["conv_up0"]["kernel"].shape[-1] == 768
    assert p["conv_up1"]["kernel"].shape[-1] == 384
    assert p["conv_up2"]["kernel"].shape[-1] == 96
    # encoder stage widths: 96 +6*48=384, /2 +12*48=768, /2 +36*48=2112,
    # /2 +24*48=2208
    assert p["conv2_6_x2"]["kernel"].shape[-1] == 48
    assert p["conv5_blk_bn"]["scale"].shape == (2208,)


def _write_fake_h5(path, params, batch_stats):
    """Synthesize a densenet161_weights_tf.h5-shaped file covering the
    encoder layers of the tiny model, with distinct deterministic values."""
    import h5py

    rng = np.random.RandomState(42)
    with h5py.File(path, "w") as f:
        for layer, leaves in params.items():
            if layer.startswith(("conv_up", "line0", "bn_up", "Adjust")):
                continue  # decoder: absent from the ImageNet file
            if "kernel" in leaves:
                g = f.create_group(layer)
                g.create_dataset(layer + "_W",
                                 data=rng.rand(*leaves["kernel"].shape))
            elif layer.endswith("_bn"):
                base = layer[:-3]
                g = f.create_group(base + "_scale")
                c = leaves["scale"].shape[0]
                g.create_dataset(base + "_scale_gamma", data=rng.rand(c))
                g.create_dataset(base + "_scale_beta", data=rng.rand(c))
        for layer, leaves in batch_stats.items():
            if layer.startswith("bn_up"):
                continue
            g = f.require_group(layer)
            c = leaves["mean"].shape[0]
            g.create_dataset(layer + "_running_mean", data=rng.rand(c))
            g.create_dataset(layer + "_running_std", data=rng.rand(c) + 0.5)


def test_h5_import_maps_encoder_and_keeps_decoder(tmp_path):
    h5py = pytest.importorskip("h5py")
    _, variables = _tiny_variables()
    path = tmp_path / "densenet_tiny.h5"
    _write_fake_h5(str(path), variables["params"], variables["batch_stats"])

    new_vars, n = load_densenet161_h5(variables, str(path))
    assert n > 0
    with h5py.File(str(path), "r") as f:
        # conv kernel landed
        np.testing.assert_array_equal(
            np.asarray(new_vars["params"]["conv1"]["kernel"]),
            np.asarray(f["conv1"]["conv1_W"]).astype(np.float32))
        # BN affine from the _scale group (reference layer[:-3] mapping)
        np.testing.assert_array_equal(
            np.asarray(new_vars["params"]["conv1_bn"]["scale"]),
            np.asarray(f["conv1_scale"]["conv1_scale_gamma"]).astype(
                np.float32))
        np.testing.assert_array_equal(
            np.asarray(new_vars["params"]["conv2_1_x1_bn"]["bias"]),
            np.asarray(f["conv2_1_x1_scale"]["conv2_1_x1_scale_beta"]).astype(
                np.float32))
        # running stats (running_std -> var, reference core/models.py:201)
        np.testing.assert_array_equal(
            np.asarray(new_vars["batch_stats"]["conv1_bn"]["var"]),
            np.asarray(f["conv1_bn"]["conv1_bn_running_std"]).astype(
                np.float32))
    # decoder untouched (partial restore)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["conv_up0"]["kernel"]),
        np.asarray(variables["params"]["conv_up0"]["kernel"]))
    # the mutated copy did not alias the input
    assert not np.array_equal(
        np.asarray(new_vars["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]))


def test_h5_import_shape_mismatch_raises(tmp_path):
    import h5py
    _, variables = _tiny_variables()
    path = tmp_path / "bad.h5"
    with h5py.File(str(path), "w") as f:
        g = f.create_group("conv1")
        g.create_dataset("conv1_W", data=np.zeros((3, 3, 3, 8)))  # wrong k
    with pytest.raises(ValueError, match="shape mismatch"):
        load_densenet161_h5(variables, str(path))


def test_dense_block_concat_growth():
    """Dense connectivity: stage-2 block with 2 layers grows channels by
    2*growth (DenseUNet.py:161-169)."""
    _, variables = _tiny_variables()
    p = variables["params"]
    # stage 2 input = stem 8ch; conv2_1_x1 sees 8, conv2_2_x1 sees 8+4
    assert p["conv2_1_x1"]["kernel"].shape[-2] == 8
    assert p["conv2_2_x1"]["kernel"].shape[-2] == 12
    # transition conv3_blk compresses 8+2*4=16 -> 8
    assert p["conv2_blk"]["kernel"].shape[-2:] == (16, 8)


def test_trainer_h5_warm_start(tmp_path):
    """--load_weights *.h5 routes to the DenseNet import in Trainer.restore
    (reference init_dense_model wiring, core/models.py:233-238)."""
    import argparse

    from tests.test_train import _args
    from boxsegliver_tpu.train.trainer import Trainer

    _, variables = _tiny_variables()
    h5 = tmp_path / "densenet_tiny.h5"
    _write_fake_h5(str(h5), variables["params"], variables["batch_stats"])

    args = _args(model_dir=str(tmp_path / "exp"), batch_size=4,
                 load_weights=str(h5), warm_start_from=None)
    model = DenseUNet(**TINY)
    feats = {"images": np.zeros((4, 32, 32, 3), np.float32)}
    tr = Trainer(model, args, classes=["Background", "L", "T"],
                 sample_features=feats, num_replicas=2, save_ckpt_steps=50)
    assert tr.restore() == 0
    import h5py
    with h5py.File(str(h5), "r") as f:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(tr.state.params["conv1"]["kernel"])),
            np.asarray(f["conv1"]["conv1_W"]).astype(np.float32))
    tr.ckpt.close()


def test_bad_nb_layers_length_raises():
    model = DenseUNet(num_classes=3, stem_channels=8, growth_rate=4,
                      nb_layers=(2, 2, 2))
    with pytest.raises(ValueError, match="4 dense blocks"):
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
