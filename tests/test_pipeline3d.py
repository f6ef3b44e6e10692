"""3D path tests: patch sampler, device processing, whole-volume eval,
sliding-window averaging, and z-axis-sharded inference parity."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boxsegliver_tpu.data import synthetic
from boxsegliver_tpu.data.meta import load_meta
from boxsegliver_tpu.data.pipeline3d import process_train_batch_3d
from boxsegliver_tpu.data.sampler3d import Sampler3D, volume_crop
from boxsegliver_tpu.evaluators.volume3d import (EvaluateVolume3D,
                                                 make_sliding_predict,
                                                 make_volume_predict,
                                                 pad_to_multiple,
                                                 sliding_window_3d)
from boxsegliver_tpu.models import build_model


def _args(**kw):
    ns = argparse.Namespace(
        im_depth=4, im_height=32, im_width=32, batch_size=2, test_fold=0,
        k_folds=2, tumor_percent=0.5, use_spatial=False, max_objs=4,
        random_flip=7, gamma=True, stddev=3.0, local_enhance=True,
        guide_channel=2, metrics_eval=["Dice"], primary_metric=None,
        secondary_metric=None, eval_num=-1, eval_skip_num=0)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds3d")
    return synthetic.make_synthetic_dataset(root, n_cases=2, shape=(12, 48, 48),
                                            k_split=2, seed=21,
                                            with_features=False)


def test_volume_crop_clamps():
    sl = volume_crop((10, 20, 20), (0, 0, 0), (4, 8, 8))
    assert sl == (slice(0, 4), slice(0, 8), slice(0, 8))
    sl = volume_crop((10, 20, 20), (9, 19, 19), (4, 8, 8))
    assert sl == (slice(6, 10), slice(12, 20), slice(12, 20))


def test_sampler3d_shapes_and_clicks(dataset):
    args = _args(use_spatial=True)
    s = Sampler3D(dataset, args, mode="train", seed=0)
    b = s.sample_batch(2)
    assert b["patch"].shape == (2, 4, 32, 32)
    assert b["label"].shape == (2, 4, 32, 32)
    assert b["fg_pts"].shape == (2, 4, 3)
    # tumor-forced sample should usually carry fg clicks
    has_clicks = (b["fg_pts"][:, :, 0] >= 0).any()
    has_tumor = (b["label"] == 2).any()
    assert has_clicks == has_tumor or has_clicks


def test_process_batch_3d(dataset):
    args = _args(use_spatial=True)
    s = Sampler3D(dataset, args, mode="train", seed=1)
    b = s.sample_batch(2)
    feats, labels = process_train_batch_3d(
        {k: jnp.asarray(v) for k, v in b.items()}, jax.random.PRNGKey(0),
        stddev=3.0, local_enhance=True, guide_channel=2, random_flip=7,
        gamma=True, use_spatial=True)
    assert feats["images"].shape == (2, 4, 32, 32, 1)
    assert feats["sp_guide"].shape == (2, 4, 32, 32, 2)
    assert labels.shape == (2, 4, 32, 32)
    g = np.asarray(feats["sp_guide"])
    assert g.min() >= 0.0 and g.max() <= 1.0 + 1e-5
    # z-scored images have ~zero mean over nonzero region
    img = np.asarray(feats["images"])
    assert abs(img.mean()) < 1.0


def test_pad_to_multiple():
    v = np.zeros((5, 17, 30, 1), np.float32)
    p, pads = pad_to_multiple(v, (2, 16, 16))
    assert p.shape == (6, 32, 32, 1)
    assert pads == [1, 15, 2]


def test_sliding_window_averages():
    calls = []

    def fake(feats):
        calls.append(feats["images"].shape)
        x = feats["images"]
        fg = np.ones(x.shape[:-1], np.float32)
        return np.stack([1 - fg, fg], axis=-1)[None] if x.ndim == 4 else \
            np.stack([1 - fg, fg], axis=-1)

    vol = np.zeros((8, 32, 32, 1), np.float32)
    probs = sliding_window_3d(lambda f: fake(f)[0:1] if False else
                              np.stack([np.zeros(f["images"].shape[1:-1]),
                                        np.ones(f["images"].shape[1:-1])],
                                       -1)[None],
                              vol, (4, 16, 16), num_classes=2)
    assert probs.shape == (8, 32, 32, 2)
    np.testing.assert_allclose(probs[..., 1], 1.0)  # averaging preserved probs


def test_unet3d_trains_and_zshard_parity(dataset):
    """Small UNet3D forward: z-sharded (2-device mesh) whole-volume inference
    must match the unsharded result (XLA conv halo exchange correctness)."""
    model = build_model("UNet3D", model_kwargs={
        "init_channels": 4, "normalizer": "instance_norm", "num_pool": 4},
        num_classes=3)
    rng = jax.random.PRNGKey(0)
    feats = {"images": jnp.zeros((1, 8, 32, 32, 1), jnp.float32)}
    variables = model.init({"params": rng, "dropout": rng}, feats, train=False)

    vol = np.random.RandomState(0).normal(size=(1, 8, 32, 32, 1)).astype(np.float32)

    def fwd(v, images):
        return jax.nn.softmax(model.apply(v, {"images": images}, train=False), -1)

    ref = np.asarray(jax.jit(fwd)(variables, vol))

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    rep = NamedSharding(mesh, P())
    zshard = NamedSharding(mesh, P(None, "data"))
    fwd_sharded = jax.jit(fwd, in_shardings=(rep, zshard), out_shardings=zshard)
    out = np.asarray(fwd_sharded(jax.device_put(variables, rep),
                                 jax.device_put(vol, zshard)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_evaluate_volume3d_oracle(dataset):
    metas = load_meta(dataset)
    args = _args(im_depth=-1)
    ev = EvaluateVolume3D(args, dataset, ["Background", "Liver", "Tumor"],
                          align=(2, 16, 16))
    lab_holder = {}

    def oracle(feats):
        x = np.asarray(feats["images"])[0]
        lab = lab_holder["lab"]
        padded = np.zeros(x.shape[:-1], np.uint8)
        padded[:lab.shape[0], :lab.shape[1], :lab.shape[2]] = lab
        out = np.stack([(padded == c).astype(np.float32) for c in range(3)], -1)
        return out[None]

    # run over one case with the oracle closing over its labels
    meta = metas[0]
    lab_holder["lab"] = np.load(dataset / f"volume-{meta['PID']}"
                                / "segmentation.npy")
    results = ev.run(oracle, [meta])
    assert results["Liver/Dice"] > 0.999
    assert results["GTumorDice"] > 0.999


def test_fast_pred_path_matches_prob_path(dataset):
    """make_volume_predict(ret='pred', in_zscore=True) — the tunnel-fetch
    fast path — must reproduce argmax of the prob-mode host-zscore path
    bit for bit (PERF.md round 3)."""
    from boxsegliver_tpu.train.trainer import TrainState
    from flax.core import FrozenDict

    model = build_model("UNet3D", model_kwargs={
        "init_channels": 4, "normalizer": "instance_norm", "num_pool": 4},
        num_classes=3)
    feats = {"images": jnp.zeros((1, 8, 32, 32, 1), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    args = _args(im_depth=-1)
    ev = EvaluateVolume3D(args, dataset, ["Background", "Liver", "Tumor"],
                          align=(2, 16, 16))
    vol = (np.random.RandomState(3).rand(10, 40, 40) * 900).astype(np.uint16)

    slow = make_volume_predict(model, state)                       # probs
    fast = make_volume_predict(model, state, ret="pred",
                               in_zscore=True)
    probs = ev.predict_case(slow, vol)
    pred = ev.predict_case(fast, vol)
    assert pred.dtype == np.uint8 and pred.shape == vol.shape
    np.testing.assert_array_equal(pred, probs.argmax(-1).astype(np.uint8))


def test_device_sliding_matches_host_loop(dataset):
    """make_sliding_predict — one upload + in-graph tile scan — must
    reproduce the host sliding_window_3d loop: prob mode to 1e-5, and the
    pred-mode in-graph-zscore fast path bit for bit through predict_case."""
    from boxsegliver_tpu.train.trainer import TrainState
    from flax.core import FrozenDict

    model = build_model("UNet3D", model_kwargs={
        "init_channels": 4, "normalizer": "instance_norm", "num_pool": 4},
        num_classes=3)
    feats = {"images": jnp.zeros((1, 4, 32, 32, 1), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    args = _args(im_depth=4)
    ev = EvaluateVolume3D(args, dataset, ["Background", "Liver", "Tumor"],
                          align=(2, 16, 16))
    vol = (np.random.RandomState(5).rand(10, 40, 40) * 900).astype(np.uint16)

    # host reference: z-score + pad + per-tile prob loop (the old path)
    host_prob = make_volume_predict(model, state)
    ref_probs = ev.predict_case(host_prob, vol)

    # prob-mode device scan on the identical padded input
    from boxsegliver_tpu.ops.image_ops import zscore
    norm = np.asarray(zscore(jnp.asarray(vol, jnp.float32)))[..., None]
    padded, pads = pad_to_multiple(norm, (2, 16, 16))
    dev_prob = make_sliding_predict(model, state, (4, 32, 32),
                                    num_classes=3, ret="prob")
    out = dev_prob(padded)[:padded.shape[0] - pads[0],
                           :padded.shape[1] - pads[1],
                           :padded.shape[2] - pads[2]]
    np.testing.assert_allclose(out, ref_probs, atol=1e-5)

    # pred-mode fast path routed through predict_case (cli.main wiring)
    dev_pred = make_sliding_predict(model, state, (4, 32, 32),
                                    num_classes=3, ret="pred",
                                    in_zscore=True)
    pred = ev.predict_case(dev_pred, vol)
    assert pred.dtype == np.uint8 and pred.shape == vol.shape
    np.testing.assert_array_equal(pred, ref_probs.argmax(-1).astype(np.uint8))


def test_fast_pred_blank_guide(dataset):
    """blank_guide_channels synthesizes the click-free guide on device —
    equal to uploading host zeros."""
    from boxsegliver_tpu.train.trainer import TrainState
    from flax.core import FrozenDict

    model = build_model("UNet3D", model_kwargs={
        "init_channels": 4, "normalizer": "instance_norm", "num_pool": 4,
        "use_spatial": True}, num_classes=2)
    feats = {"images": jnp.zeros((1, 8, 32, 32, 1), jnp.float32),
             "sp_guide": jnp.zeros((1, 8, 32, 32, 2), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    vol = np.random.RandomState(4).normal(
        size=(1, 8, 32, 32, 1)).astype(np.float32)
    with_host = make_volume_predict(model, state)
    with_dev = make_volume_predict(model, state, blank_guide_channels=2)
    ref = np.asarray(with_host({"images": vol,
                                "sp_guide": np.zeros((1, 8, 32, 32, 2),
                                                     np.float32)}))
    out = np.asarray(with_dev({"images": vol}))
    np.testing.assert_allclose(out, ref, atol=1e-6)
