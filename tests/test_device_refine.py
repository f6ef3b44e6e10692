"""In-graph interactive refinement (interactive/device_refine.py) vs the
host click loops (interactive/refine.interactive_eval_2d / _3d): identical
Dice / click trajectories, plus the in-graph click-placement primitive
against its host oracle in 2D and 3D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxsegliver_tpu.interactive.clicks import next_click_from_error
from boxsegliver_tpu.interactive.device_refine import (DeviceRefiner2D,
                                                       DeviceRefiner3D)
from boxsegliver_tpu.interactive.refine import (interactive_eval_2d,
                                                interactive_eval_3d)
from boxsegliver_tpu.models import build_model
from boxsegliver_tpu.ops.labeling import largest_error_click
from boxsegliver_tpu.train.trainer import TrainState


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_largest_error_click_matches_host(seed):
    rng = np.random.RandomState(seed)
    h = w = 48
    lab = _blob(h, w, 14, 30, 7) | _blob(h, w, 34, 12, 4)
    pred = _blob(h, w, 14, 28, 6) | (rng.rand(h, w) > 0.995)
    coords_h, fg_h = next_click_from_error(pred.astype(np.uint8),
                                           lab.astype(np.uint8))
    coords_d, fg_d, has = jax.jit(largest_error_click)(
        jnp.asarray(pred), jnp.asarray(lab))
    assert bool(has)
    assert tuple(np.asarray(coords_d)) == coords_h
    assert bool(fg_d) == fg_h


def test_largest_error_click_no_error():
    lab = _blob(32, 32, 16, 16, 5)
    _, _, has = jax.jit(largest_error_click)(jnp.asarray(lab),
                                             jnp.asarray(lab))
    assert not bool(has)


@pytest.fixture(scope="module")
def fitted():
    """Tiny UNetInter fit on a couple of synthetic blob slices so it
    responds to guides (a random net ignores them)."""
    import optax
    from flax.core import FrozenDict

    rng = np.random.RandomState(3)
    h = w = 48
    labs, ims = [], []
    for i in range(6):
        lab = _blob(h, w, 10 + 4 * i, 12 + 3 * i, 4 + (i % 3))
        img = lab * 1.5 + rng.randn(h, w) * 0.35
        labs.append(lab)
        ims.append(img)
    labs = np.asarray(labs)
    ims = np.asarray(ims, np.float32)[..., None]

    model = build_model("UNetInter", model_kwargs={
        "init_channels": 4, "num_down_samples": 2}, num_classes=2)
    feats = {"images": np.zeros((1, h, w, 1), np.float32),
             "sp_guide": np.zeros((1, h, w, 2), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    params = variables["params"]

    from boxsegliver_tpu.interactive.refine import render_click_guide
    guides = np.zeros((6, h, w, 2), np.float32)
    for i in range(6):
        ys, xs = np.where(labs[i])
        guides[i, ..., 0] = render_click_guide(
            (h, w), [(int(ys.mean()), int(xs.mean()))], 5.0)
    batch = {"images": ims, "sp_guide": guides}
    lab32 = labs.astype(np.int32)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss(p):
            logits = model.apply({"params": p}, batch, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, lab32).mean()
        g = jax.grad(loss)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o

    for _ in range(80):
        params, opt = step(params, opt)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    return model, state, ims, labs


@pytest.mark.parametrize("guide_kind", ["gaussian", "euclidean"])
def test_refine_case_matches_host_loop(fitted, guide_kind):
    model, state, ims, labs = fitted
    kw = dict(dice_thresh=0.85, max_iters=5, stddev=5.0,
              guide_kind=guide_kind, guide_channel=2)
    refiner = DeviceRefiner2D(model, state, **kw)

    def predict(feats):
        return jax.nn.softmax(
            model.apply({"params": state.params}, feats, train=False), -1)

    host = interactive_eval_2d(predict, ims, labs.astype(np.uint8), **kw)
    dev = refiner.refine_case(ims, labs)
    assert dev["slices"] == host["slices"]
    np.testing.assert_allclose(dev["clicks"], host["clicks"], atol=1e-6)
    np.testing.assert_allclose(dev["Dice"], host["Dice"], atol=1e-5)


def test_refine_case_no_lesions(fitted):
    model, state, ims, labs = fitted
    refiner = DeviceRefiner2D(model, state)
    res = refiner.refine_case(ims, np.zeros_like(labs))
    assert res == {"Dice": 1.0, "clicks": 0.0, "slices": 0.0}


def test_refine_geodesic_matches_host_loop(fitted):
    """Geodesic guides in-graph (ops/geodesic.py) vs the host loop's
    csrc + cv2 render: same trajectory (guides agree to ~1e-5)."""
    from boxsegliver_tpu.csrc import geodesic_available
    if not geodesic_available():
        pytest.skip("native build failed")
    model, state, ims, labs = fitted
    kw = dict(dice_thresh=0.85, max_iters=5, stddev=5.0,
              guide_kind="geodesic", guide_channel=2)
    refiner = DeviceRefiner2D(model, state, **kw)

    def predict(feats):
        return jax.nn.softmax(
            model.apply({"params": state.params}, feats, train=False), -1)

    host = interactive_eval_2d(predict, ims, labs.astype(np.uint8), **kw)
    dev = refiner.refine_case(ims, labs)
    assert dev["slices"] == host["slices"]
    np.testing.assert_allclose(dev["clicks"], host["clicks"], atol=1e-6)
    np.testing.assert_allclose(dev["Dice"], host["Dice"], atol=1e-4)


def test_refine_rejects_unknown_kind(fitted):
    model, state, _, _ = fitted
    with pytest.raises(ValueError):
        DeviceRefiner2D(model, state, guide_kind="nope")


# ---------------------------------------------------------------------------
# 3D


def _blob3(d, h, w, cz, cy, cx, r, rz=None):
    zz, yy, xx = np.mgrid[:d, :h, :w]
    rz = rz or max(r // 2, 1)
    return (((zz - cz) / rz) ** 2 + ((yy - cy) / r) ** 2
            + ((xx - cx) / r) ** 2 <= 1.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_largest_error_click_matches_host_3d(seed):
    rng = np.random.RandomState(seed)
    d, h, w = 8, 24, 24
    lab = _blob3(d, h, w, 3, 8, 15, 5) | _blob3(d, h, w, 5, 17, 6, 3)
    pred = _blob3(d, h, w, 3, 7, 14, 4) | (rng.rand(d, h, w) > 0.995)
    coords_h, fg_h = next_click_from_error(pred.astype(np.uint8),
                                           lab.astype(np.uint8))
    coords_d, fg_d, has = jax.jit(largest_error_click)(
        jnp.asarray(pred), jnp.asarray(lab))
    assert bool(has)
    assert tuple(np.asarray(coords_d)) == coords_h
    assert bool(fg_d) == fg_h


@pytest.fixture(scope="module")
def fitted3d():
    """Tiny guided UNet3D fit on a blob volume so it responds to guides."""
    import optax
    from flax.core import FrozenDict

    from boxsegliver_tpu.interactive.refine import render_click_guide
    from boxsegliver_tpu.models.unet3d import UNet3D

    rng = np.random.RandomState(7)
    d, h, w = 4, 16, 16
    labs, ims, guides = [], [], []
    for i in range(4):
        lab = _blob3(d, h, w, 1 + i % 2, 4 + 2 * i, 5 + 2 * i, 3, rz=1)
        img = lab * 1.5 + rng.randn(d, h, w) * 0.35
        cz, cy, cx = [int(c.mean()) for c in np.where(lab)]
        g = render_click_guide((d, h, w), [(cz, cy, cx)], 5.0)
        labs.append(lab)
        ims.append(img)
        guides.append(g)
    labs = np.asarray(labs)
    ims = np.asarray(ims, np.float32)[..., None]
    guides = np.asarray(guides, np.float32)[..., None]

    model = UNet3D(num_classes=2, init_channels=4, num_pool_layers=4,
                   max_channels=16, use_spatial=True,
                   normalizer="instance_norm")
    feats = {"images": np.zeros((1, d, h, w, 1), np.float32),
             "sp_guide": np.zeros((1, d, h, w, 1), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    params = variables["params"]

    batch = {"images": ims, "sp_guide": guides}
    lab32 = labs.astype(np.int32)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss(p):
            logits = model.apply({"params": p}, batch, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, lab32).mean()
        g = jax.grad(loss)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o

    for _ in range(60):
        params, opt = step(params, opt)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    return model, state, ims, labs


@pytest.mark.parametrize("tta", [False, True])
def test_refine3d_matches_host_loop(fitted3d, tta):
    model, state, ims, labs = fitted3d
    vol, lab = ims[0, ..., 0], labs[0].astype(np.uint8)
    kw = dict(dice_thresh=0.9, max_iters=4, stddev=5.0)
    refiner = DeviceRefiner3D(model, state, tta=tta, guide_channel=1, **kw)

    def predict(feats):
        return jax.nn.softmax(
            model.apply({"params": state.params}, feats, train=False), -1)

    host = interactive_eval_3d(predict, vol, lab, tta=tta,
                               guide_channel=1, **kw)
    dev = refiner.refine_case(vol, lab)
    np.testing.assert_allclose(dev["clicks"], host["clicks"], atol=1e-6)
    np.testing.assert_allclose(dev["Dice"], host["Dice"], atol=1e-5)


def test_refine3d_valid_shape_masks_pad(fitted3d):
    """Pad region must affect neither click placement nor Dice — the host
    loop's valid_shape contract."""
    model, state, ims, labs = fitted3d
    vol, lab = ims[1, ..., 0], labs[1].astype(np.uint8)
    d, h, w = lab.shape
    kw = dict(dice_thresh=0.9, max_iters=4, stddev=5.0)

    def predict(feats):
        return jax.nn.softmax(
            model.apply({"params": state.params}, feats, train=False), -1)

    pvol = np.pad(vol, ((0, 2), (0, 0), (0, 0)))
    plab = np.pad(lab, ((0, 2), (0, 0), (0, 0)))
    host = interactive_eval_3d(predict, pvol, plab, guide_channel=1,
                               valid_shape=(d, h, w), **kw)
    refiner = DeviceRefiner3D(model, state, guide_channel=1, **kw)
    dev = refiner.refine_case(pvol, plab, valid_shape=(d, h, w))
    np.testing.assert_allclose(dev["clicks"], host["clicks"], atol=1e-6)
    np.testing.assert_allclose(dev["Dice"], host["Dice"], atol=1e-5)


def test_refine3d_empty_label(fitted3d):
    model, state, ims, labs = fitted3d
    refiner = DeviceRefiner3D(model, state)
    res = refiner.refine_case(ims[0, ..., 0], np.zeros_like(labs[0]))
    assert res == {"Dice": 0.0, "clicks": 0.0}


def test_cli_refiner_routing():
    """cli.interactive_eval.build_refiner picks the device loop per
    dim/kind/cascade and honors --device_refine off."""
    from types import SimpleNamespace

    from boxsegliver_tpu.cli.interactive_eval import build_refiner

    state = SimpleNamespace(params={}, batch_stats=None)
    base = dict(device_refine="on", dice_thresh=0.85, max_iters=5,
                guide_stddev=5.0, guide_kind="gaussian", guide_channel=2,
                tta=False, use_cascade=False)

    def args(**over):
        return SimpleNamespace(**{**base, **over})

    assert type(build_refiner(args(dim=2), None, state)).__name__ \
        == "DeviceRefiner2D"
    assert type(build_refiner(args(dim=2, guide_kind="geodesic"), None,
                              state)).__name__ == "DeviceRefiner2D"
    assert type(build_refiner(args(dim=3, guide_channel=1), None,
                              state)).__name__ == "DeviceRefiner3D"
    assert build_refiner(args(dim=3, use_cascade=True), None, state) is None
    assert build_refiner(args(dim=2, device_refine="off"), None,
                         state) is None
    assert build_refiner(args(dim=3, device_refine="off"), None,
                         state) is None


def test_refine_case_mesh_matches_single_device(fitted):
    """Round-5 mesh mode: the slice-batch axis sharded over an 8-device data
    mesh (interactive/device_refine.py mesh=...) must reproduce the
    single-device trajectory exactly — params replicated, each click round
    batch-parallel (SURVEY §2.8 sharded-eval promise, round-4 verdict #7)."""
    from boxsegliver_tpu.parallel import make_mesh

    model, state, ims, labs = fitted
    kw = dict(dice_thresh=0.85, max_iters=5, stddev=5.0,
              guide_kind="gaussian", guide_channel=2)
    single = DeviceRefiner2D(model, state, **kw).refine_case(ims, labs)
    mesh = make_mesh(8)
    refiner = DeviceRefiner2D(model, state, mesh=mesh, **kw)
    sharded = refiner.refine_case(ims, labs)
    assert sharded["slices"] == single["slices"]
    np.testing.assert_allclose(sharded["clicks"], single["clicks"], atol=1e-6)
    np.testing.assert_allclose(sharded["Dice"], single["Dice"], atol=1e-5)
