"""Device-resident 2D eval (evaluators/device_eval.py) vs the host
slice_batches path: identical mirror-averaged probability volumes."""

import argparse

import jax
import numpy as np
import pytest

from boxsegliver_tpu.data.meta import load_meta
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset
from boxsegliver_tpu.evaluators.device_eval import DeviceSlicePredictor
from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval
from boxsegliver_tpu.evaluators.volume import EvaluateVolume
from boxsegliver_tpu.models import build_model
from boxsegliver_tpu.train.trainer import TrainState


def _args(**kw):
    ns = argparse.Namespace(
        im_height=64, im_width=64, im_channel=3, batch_size=4,
        eval_mirror=True, random_flip=3, metrics_eval=["Dice"],
        primary_metric=None, secondary_metric=None, task="liver",
        use_context=False, hist_scale=20.0, eval_num=-1, eval_skip_num=0,
        pred_type="pred", save_path="pred", model_dir="")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("dev_eval") / "ds"
    make_synthetic_dataset(root, n_cases=2, shape=(11, 96, 96), k_split=2,
                           seed=5)
    return root


def _state(model, feats):
    from flax.core import FrozenDict
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", FrozenDict()),
                      opt_state=(), lr_scale=jnp.ones((), jnp.float32)), \
        variables


@pytest.mark.parametrize("mirror", [False, True])
def test_device_case_matches_host_path(ds, mirror):
    args = _args(eval_mirror=mirror)
    metas = load_meta(ds)
    case = parse_case_eval(metas[0], ds, im_channel=3)
    model = build_model("UNet", model_kwargs={"init_channels": 4,
                                              "num_down_samples": 2},
                        num_classes=3)
    feats = {"images": np.zeros((4, 64, 64, 3), np.float32)}
    state, variables = _state(model, feats)

    ev = EvaluateVolume(args, ds, ["Liver", "Tumor"])
    predictor = DeviceSlicePredictor(model, state, args)

    import jax.numpy as jnp
    host_fn = jax.jit(lambda f: jax.nn.softmax(
        model.apply(variables, f, train=False).astype(jnp.float32), -1))
    ref = ev.predict_case(host_fn, case)             # host slice_batches path
    out = ev.predict_case(predictor, case)           # device_case fast path
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_device_case_with_guide_and_context(ds):
    args = _args(use_context=True, use_spatial=True, task="nf")
    metas = load_meta(ds)
    case = parse_case_eval(metas[0], ds, im_channel=3)
    model = build_model("GUNet", model_kwargs={
        "init_channels": 4, "num_down_samples": 2, "mod_layers": (1, 2),
        "context_fc_channels": (8,), "use_context": True,
        "use_spatial": True, "normalizer": "instance_norm"}, num_classes=3)
    feats = {"images": np.zeros((4, 64, 64, 3), np.float32),
             "context": np.zeros((4, 16), np.float32),
             "sp_guide": np.zeros((4, 64, 64, 1), np.float32)}
    state, variables = _state(model, feats)
    rng = np.random.RandomState(0)
    context = rng.rand(case.oshape[0], 16).astype(np.float32)
    sp_guide = rng.rand(case.depth, *case.volume.shape[1:]).astype(np.float32)

    import jax.numpy as jnp
    host_fn = jax.jit(lambda f: jax.nn.softmax(
        model.apply(variables, f, train=False).astype(jnp.float32), -1))

    from boxsegliver_tpu.evaluators.eval_loader import slice_batches
    # host reference with explicit context (predict_case loads from disk;
    # drive slice_batches directly)
    div = 1
    chunks, pads = [], 0
    for batch in slice_batches(case, args.batch_size,
                               (args.im_height, args.im_width),
                               eval_mirror=False, context=context,
                               sp_guide=sp_guide):
        batch.pop("mirror"), batch.pop("names")
        pads = batch.pop("pads") or pads
        chunks.append(np.asarray(host_fn(batch), np.float32) / div)
    ref = np.concatenate(chunks, axis=0)
    if pads:
        ref = ref[:-pads]

    args.eval_mirror = False
    predictor = DeviceSlicePredictor(model, state, args)
    out = predictor.device_case(case, context=context, sp_guide=sp_guide)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_device_case_mesh_sharded_matches_single(ds):
    """Slice-batch axis sharded over an 8-device mesh == single-device
    result (multi-chip 2D eval; the reference was single-GPU at eval)."""
    from boxsegliver_tpu.parallel import make_mesh

    args = _args(batch_size=8, eval_mirror=True)
    metas = load_meta(ds)
    case = parse_case_eval(metas[0], ds, im_channel=3)
    model = build_model("UNet", model_kwargs={"init_channels": 4,
                                              "num_down_samples": 2},
                        num_classes=3)
    feats = {"images": np.zeros((8, 64, 64, 3), np.float32)}
    state, _ = _state(model, feats)

    single = DeviceSlicePredictor(model, state, args)
    sharded = DeviceSlicePredictor(model, state, args, mesh=make_mesh(8))
    assert sharded.mesh is not None
    p1 = single.device_case(case)
    p8 = sharded.device_case(case)
    np.testing.assert_allclose(p8, p1, atol=1e-5)


def test_mesh_requires_divisible_batch(ds):
    from boxsegliver_tpu.parallel import make_mesh

    args = _args(batch_size=6)
    model = build_model("UNet", model_kwargs={"init_channels": 4,
                                              "num_down_samples": 2},
                        num_classes=3)
    feats = {"images": np.zeros((6, 64, 64, 3), np.float32)}
    state, _ = _state(model, feats)
    with pytest.raises(ValueError, match="multiple of"):
        DeviceSlicePredictor(model, state, args, mesh=make_mesh(8))
