"""nf2/iin tower tests: click-instance sampler, fused device pipeline,
PatchCNN context model, per-lesion patch eval loader + reassembly, and the
end-to-end product CLI (reference DataLoader/NF/input_pipeline_iin.py +
evaluators/evaluator_nf.py:470-575 _predict_case_v2)."""

import numpy as np
import pytest

from boxsegliver_tpu.cli.main import get_args
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def nf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("iin") / "synthetic_nf"
    make_synthetic_dataset(root, n_cases=4, shape=(12, 96, 96), k_split=4,
                           modality="nf")
    return root


def iin_args(extra=()):
    argv = ["nf2", "--mode", "train", "--tag", "t_iin", "--model", "GUNet",
            "--model_config", "GUNet_IIN_TINY.yml", "--classes", "NF",
            "--im_height", "64", "--im_width", "64", "--im_channel", "3",
            "--batch_size", "4", "--use_context", "--use_spatial",
            "--zscore", "--test_fold", "0"] + list(extra)
    return get_args(argv)


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------

def test_sampler_batch_contract(nf_root):
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    s = IinSampler(nf_root, args, mode="train", seed=0)
    b = s.sample_batch(6)
    assert b["image"].shape == (6, 64, 64, 3) and b["image"].dtype == np.uint16
    assert b["label"].shape == (6, 64, 64) and set(np.unique(b["label"])) <= {0, 1}
    assert b["ct_patch"].shape == (6, 32, 32, 3)
    assert b["sp_center"].shape == (6, 2)
    # tumor forcing: ceil(6 * 0.5) = 3 lesion-clicked samples, labels nonzero
    n_pos = int(sum(b["label"][i].any() for i in range(6)))
    assert n_pos >= 3
    # guided samples have clicks inside the frame
    for i in range(6):
        if b["sp_on"][i]:
            y, x = b["sp_center"][i]
            assert 0 <= y <= 63 and 0 <= x <= 63


def test_sampler_instance_binary_label(nf_root):
    """The label is the CLICKED lesion instance only (reference
    input_pipeline_iin.py:579-580 `lab == t_id`)."""
    from scipy import ndimage as ndi

    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    s = IinSampler(nf_root, args, mode="train", seed=3,
                   tumor_percent=1.0)
    b = s.sample_batch(8)
    disc = ndi.generate_binary_structure(2, 2)
    for i in range(8):
        lab = b["label"][i]
        if not lab.any():
            continue
        # a single connected instance (resize can split thin necks only if
        # the source had several parts; the synthetic lesions are blobs)
        _, n = ndi.label(lab, disc)
        assert n == 1


def test_sampler_unforced_draws_still_click_lesion_slices(nf_root):
    """tumor_percent=0 (the reference's eval_online setting) must NOT be
    degenerate: non-forced draws still click a lesion when the random slice
    has one (reference input_pipeline_iin.py:544-548); draws on empty slices
    yield all-zero labels and no guides."""
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    s = IinSampler(nf_root, args, mode="train", seed=1, tumor_percent=0.0)
    n_clicked = 0
    for _ in range(4):
        b = s.sample_batch(8)
        for i in range(8):
            if b["label"][i].any():
                n_clicked += 1
            else:
                assert not b["sp_on"][i] and not b["ct_on"][i]
    assert n_clicked > 0


def test_sampler_random_window_clip(nf_root):
    from boxsegliver_tpu.data.meta import IM_SCALE
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    args.zscore = False
    s = IinSampler(nf_root, args, mode="train", seed=0)
    b = s.sample_batch(8)
    his = b["clip"][:, 1] / IM_SCALE
    assert ((his >= 500) & (his <= 700)).all()   # reference :586-588
    assert (b["clip"][:, 0] == 0).all()


def test_ct_pyramid_sizes():
    from boxsegliver_tpu.data.sampler_iin import ct_sizes

    assert ct_sizes([32]) == (32, 64, 128)
    assert ct_sizes([16, 48, 80]) == (16, 48, 80)
    with pytest.raises(ValueError):
        ct_sizes([16, 48])  # 2 values: ambiguous, rejected not truncated


def test_pipeline_gamma_keeps_pad_channels_zero(nf_root):
    """Gamma's retain_stats rescale must not leak into out-of-volume 2.5D
    channels even with noise off."""
    import jax

    from boxsegliver_tpu.data.pipeline_iin import make_iin_preprocess_fn
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    args.noise_scale = 0.0
    args.gamma = True
    args.random_flip = 0
    s = IinSampler(nf_root, args, mode="train", seed=0, tumor_percent=1.0)
    found = False
    for trial in range(6):
        b = s.sample_batch(8)
        if (b["pad_mask"] == 0).any():
            feats, _ = jax.jit(make_iin_preprocess_fn(args, train=True))(
                b, jax.random.PRNGKey(trial))
            img = np.asarray(feats["images"])
            for i in range(8):
                for c in range(3):
                    if b["pad_mask"][i, c] == 0:
                        assert np.allclose(img[i, :, :, c], 0.0, atol=1e-6)
                        found = True
    assert found, "no edge-slice samples drawn; widen the search"


# ---------------------------------------------------------------------------
# device pipeline
# ---------------------------------------------------------------------------

def test_pipeline_zscore_and_guide(nf_root):
    import jax

    from boxsegliver_tpu.data.pipeline_iin import make_iin_preprocess_fn
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    args.noise_scale = 0.0
    args.random_flip = 0
    s = IinSampler(nf_root, args, mode="train", seed=0, tumor_percent=1.0)
    b = s.sample_batch(4)
    feats, labels = jax.jit(make_iin_preprocess_fn(args, train=True))(
        b, jax.random.PRNGKey(0))
    img = np.asarray(feats["images"])
    # nonzero z-score: nonzero pixels ~N(0,1), zero pixels stay 0
    nz = np.asarray(b["image"][0], np.float32) > 0
    assert abs(img[0][nz].mean()) < 0.2
    assert np.allclose(img[0][~nz], 0.0, atol=1e-6)
    guide = np.asarray(feats["sp_guide"])
    for i in range(4):
        if b["sp_on"][i]:
            # gaussian peak at the click
            py, px = np.unravel_index(np.argmax(guide[i, :, :, 0]),
                                      guide.shape[1:3])
            assert abs(py - b["sp_center"][i][0]) <= 1
            assert abs(px - b["sp_center"][i][1]) <= 1
            assert guide[i].max() > 0.9
    assert np.asarray(labels).max() <= 1


def test_pipeline_window_clip_shared_with_context(nf_root):
    """Window mode normalizes the context pyramid with the image's clip
    (reference crops context out of the normalized image, :272-275)."""
    import jax

    from boxsegliver_tpu.data.pipeline_iin import make_iin_preprocess_fn
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    args.zscore = False
    args.noise_scale = 0.0
    args.random_flip = 0
    s = IinSampler(nf_root, args, mode="train", seed=0, tumor_percent=1.0)
    b = s.sample_batch(4)
    feats, _ = jax.jit(make_iin_preprocess_fn(args, train=True))(
        b, jax.random.PRNGKey(0))
    ct = np.asarray(feats["context"])
    assert ct.min() >= 0.0 and ct.max() <= 1.0
    # guided rows have content, unguided rows are zeroed
    for i in range(4):
        if not b["ct_on"][i]:
            assert np.allclose(ct[i], 0.0)
        else:
            i0 = int(np.argmax(b["ct_on"]))
            raw = b["ct_patch"][i0].astype(np.float32)
            lo, hi = b["clip"][i0]
            expect = (np.clip(raw, lo, hi) - lo) / (hi - lo)
            assert np.allclose(ct[i0], expect, atol=1e-5)
            break


def test_pipeline_joint_flips(nf_root):
    """Image, label, guide, and context flip with the SAME coins."""
    import jax

    from boxsegliver_tpu.data.pipeline_iin import (_process_batch_iin,
                                                   make_iin_preprocess_fn)
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args()
    args.noise_scale = 0.0
    args.gamma = False
    s = IinSampler(nf_root, args, mode="train", seed=0, tumor_percent=1.0)
    b = s.sample_batch(4)
    key = jax.random.PRNGKey(7)
    f_on, l_on = jax.jit(make_iin_preprocess_fn(args, train=True))(b, key)
    args.random_flip = 0
    f_off, l_off = jax.jit(make_iin_preprocess_fn(args, train=True))(b, key)
    for i in range(4):
        img_on = np.asarray(f_on["images"][i])
        # each sample matches one of the 4 flip variants consistently across
        # ALL tensors
        found = False
        for ax in (None, (1,), (0,), (0, 1)):
            ref = np.asarray(f_off["images"][i])
            ref = ref if ax is None else np.flip(ref, axis=ax)
            if np.allclose(img_on, ref, atol=1e-6):
                lab = np.asarray(l_off[i])
                lab = lab if ax is None else np.flip(lab, axis=ax)
                assert np.array_equal(np.asarray(l_on[i]), lab)
                g = np.asarray(f_off["sp_guide"][i])
                g = g if ax is None else np.flip(g, axis=ax)
                assert np.allclose(np.asarray(f_on["sp_guide"][i]), g,
                                   atol=1e-6)
                c = np.asarray(f_off["context"][i])
                c = c if ax is None else np.flip(c, axis=ax)
                assert np.allclose(np.asarray(f_on["context"][i]), c,
                                   atol=1e-6)
                found = True
                break
        assert found


# ---------------------------------------------------------------------------
# model: PatchCNN context
# ---------------------------------------------------------------------------

def test_gunet_conv_context_forward_and_grads(nf_root):
    import jax
    import jax.numpy as jnp

    from boxsegliver_tpu.models import build_model, get_model_params

    args = iin_args()
    params = get_model_params(args)
    assert params["model_kwargs"]["context_model"] == "conv"
    model = build_model("GUNet", args=args,
                        model_kwargs=params["model_kwargs"], num_classes=2)
    feats = {"images": jnp.ones((2, 64, 64, 3)),
             "sp_guide": jnp.zeros((2, 64, 64, 1)),
             "context": jnp.ones((2, 32, 32, 3))}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    assert "context" in variables["params"]

    def loss(v, ct):
        out = model.apply(v, dict(feats, context=ct), train=False)
        return jnp.mean(out ** 2)

    g_params = jax.grad(loss)(variables, feats["context"])
    ctx_g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g_params["params"]["context"],
        0.0)
    assert ctx_g > 0.0  # gradients flow through the patch tower
    # context INPUT changes the output (the modulation is live)
    out1 = model.apply(variables, feats, train=False)
    out2 = model.apply(variables, dict(feats, context=feats["context"] * 3.0),
                       train=False)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


# ---------------------------------------------------------------------------
# eval loader + reassembly
# ---------------------------------------------------------------------------

def test_expand_bbox_reference_formula():
    from boxsegliver_tpu.evaluators.iin_eval import expand_bbox

    # small lesion in a big frame -> exactly target-size window, centered
    y1, x1, y2, x2 = expand_bbox((50, 60, 55, 66), (512, 512), (256, 256))
    assert (y2 - y1, x2 - x1) == (256, 256)
    assert y1 >= 0 and x1 >= 0 and y2 <= 512 and x2 <= 512
    # the original bbox stays inside
    assert y1 <= 45 and y2 >= 60 and x1 <= 55 and x2 >= 71
    # lesion near the border: window clamps to the frame
    y1, x1, y2, x2 = expand_bbox((0, 0, 10, 10), (512, 512), (256, 256))
    assert (y1, x1) == (0, 0) and (y2, x2) == (256, 256)
    # big lesion -> bbox + 5 on each side, no min-size inflation
    y1, x1, y2, x2 = expand_bbox((10, 10, 400, 400), (512, 512), (256, 256))
    assert (y1, x1, y2, x2) == (5, 5, 405, 405)
    # frame SMALLER than the target: clamp to the frame instead of the
    # reference's negative-offset mis-slice
    y1, x1, y2, x2 = expand_bbox((50, 60, 55, 66), (200, 512), (256, 256))
    assert (y1, y2) == (0, 200) and x2 - x1 == 256
    y1, x1, y2, x2 = expand_bbox((5, 5, 10, 10), (40, 48), (64, 64))
    assert (y1, x1, y2, x2) == (0, 0, 40, 48)
    # odd target sizes: window is EXACTLY the target (asymmetric halves),
    # not target-1 (would silently force the resize path)
    y1, x1, y2, x2 = expand_bbox((50, 60, 55, 66), (512, 512), (255, 129))
    assert (y2 - y1, x2 - x1) == (255, 129)
    y1, x1, y2, x2 = expand_bbox((0, 505, 4, 510), (512, 512), (65, 65))
    assert (y2 - y1, x2 - x1) == (65, 65)
    assert y1 >= 0 and x2 <= 512


def test_lesion_centers_on_and_off_mask():
    from boxsegliver_tpu.evaluators.iin_eval import lesion_centers

    plane = np.zeros((64, 64), np.uint8)
    plane[10:20, 10:20] = 1
    pts = lesion_centers(plane, (14.5, 14.5), (10, 10, 20, 20))
    assert pts.shape == (1, 2) and plane[int(pts[0, 0]), int(pts[0, 1])]
    # concave: two parts in one bbox, center falls between them
    plane2 = np.zeros((64, 64), np.uint8)
    plane2[10:20, 10:14] = 1
    plane2[10:20, 26:30] = 1
    pts = lesion_centers(plane2, (15, 20), (10, 10, 20, 30))
    assert pts.shape == (2, 2)
    for y, x in pts:
        assert plane2[int(y), int(x)]


def test_merge_patch_probs_max_min_semantics():
    from boxsegliver_tpu.evaluators.iin_eval import merge_patch_probs

    logits3d = np.zeros((2, 8, 8, 2), np.float32)
    logits3d[..., 0] = 1.0
    probs = np.zeros((2, 4, 4, 2), np.float32)
    probs[0, :, :, 1] = 0.9
    probs[0, :, :, 0] = 0.1
    probs[1, :, :, 1] = 0.3   # padded row — must be ignored
    merge_patch_probs(logits3d, probs,
                      sids=np.array([0, 1]), bbs=np.array([[2, 2, 6, 6],
                                                           [0, 0, 4, 4]]),
                      pads=1)
    assert np.allclose(logits3d[0, 2:6, 2:6, 1], 0.9)
    assert np.allclose(logits3d[0, 2:6, 2:6, 0], 0.1)
    assert np.allclose(logits3d[1], np.array([1.0, 0.0]))  # untouched slice
    # overlapping second patch: fg max, bg min
    probs2 = np.zeros((1, 4, 4, 2), np.float32)
    probs2[0, :, :, 1] = 0.5
    probs2[0, :, :, 0] = 0.5
    merge_patch_probs(logits3d, probs2, sids=np.array([0]),
                      bbs=np.array([[0, 0, 4, 4]]), pads=0)
    assert np.allclose(logits3d[0, 2:4, 2:4, 1], 0.9)  # max keeps 0.9
    assert np.allclose(logits3d[0, 2:4, 2:4, 0], 0.1)  # min keeps 0.1
    assert np.allclose(logits3d[0, 0:2, 0:2, 1], 0.5)


def test_merge_patch_probs_resizes_to_bbox():
    from boxsegliver_tpu.evaluators.iin_eval import merge_patch_probs

    logits3d = np.zeros((1, 16, 16, 2), np.float32)
    logits3d[..., 0] = 1.0
    probs = np.zeros((1, 4, 4, 2), np.float32)
    probs[0, :, :, 1] = 0.8
    merge_patch_probs(logits3d, probs, sids=np.array([0]),
                      bbs=np.array([[0, 0, 8, 8]]), pads=0)  # 4x4 -> 8x8
    assert np.allclose(logits3d[0, :8, :8, 1], 0.8)


def test_patch_loader_and_run_patch(nf_root):
    """run_patch with a guide-echo oracle: fg prob = sp_guide, bg = 1 - it.
    Every predicted-positive voxel must lie inside some lesion patch bbox and
    near a lesion center."""
    import cv2

    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.evaluators.iin_eval import IinPatchLoader
    from boxsegliver_tpu.evaluators.volume import EvaluateVolume

    args = iin_args()
    args.mode = "eval"
    metas = load_meta(nf_root)

    loader = IinPatchLoader(metas[0], nf_root, args)
    assert loader.items, "synthetic case must have lesions"
    batches = list(loader.batches(args.batch_size))
    assert batches[-1]["pads"] >= 0
    for b in batches:
        assert b["images"].shape == (4, 64, 64, 3)
        assert b["sp_guide"].shape == (4, 64, 64, 1)
        assert b["context"].shape == (4, 32, 32, 3)
        n = 4 - b["pads"]
        assert (b["sid"][:n] >= 0).all() and (b["bb"][:n, 2] > b["bb"][:n, 0]).all()

    def oracle(feats):
        g = np.asarray(feats["sp_guide"])[..., 0]
        fg = (g > 0.5).astype(np.float32)
        return np.stack([1.0 - fg, fg], axis=-1)

    ev = EvaluateVolume(args, nf_root, ["Background", "NF"])
    results = ev.run_patch(oracle, metas[:1], do_eval=True)
    assert "NF/Dice" in results and 0.0 < results["NF/Dice"] <= 1.0
    assert results["GNFDice"] > 0.0


def test_patch_tta_in_graph_matches_host(nf_root):
    """make_patch_predict_tta == the host mirror loop, exactly (CPU f32)."""
    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict

    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.evaluators.iin_eval import (IinPatchLoader,
                                                     make_patch_predict_tta,
                                                     predict_batch_tta)
    from boxsegliver_tpu.models import build_model, get_model_params
    from boxsegliver_tpu.train.trainer import TrainState, make_eval_step

    args = iin_args()
    args.eval_mirror = True
    args.random_flip = 3
    params = get_model_params(args)
    model = build_model("GUNet", args=args,
                        model_kwargs=params["model_kwargs"], num_classes=2)
    feats0 = {"images": jnp.zeros((4, 64, 64, 3)),
              "sp_guide": jnp.zeros((4, 64, 64, 1)),
              "context": jnp.zeros((4, 32, 32, 3))}
    variables = model.init(jax.random.PRNGKey(1), feats0, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    eval_step = jax.jit(make_eval_step(model))
    host_fn = lambda f: eval_step(state, f)
    dev_fn = make_patch_predict_tta(model, state, 3)

    metas = load_meta(nf_root)
    loader = IinPatchLoader(metas[0], nf_root, args)
    batch = next(iter(loader.batches(4)))
    host = predict_batch_tta(host_fn, batch, mirror_div=4, random_flip=3)
    dev = predict_batch_tta(dev_fn, batch, mirror_div=4, random_flip=3)
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_infer_patch_features_and_dump(nf_root, tmp_path):
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.evaluators.iin_eval import (infer_patch_features,
                                                     run_patch_infer)

    args = iin_args()
    args.zscore = False  # exercise the reference's 850 infer window
    args.model_dir = str(tmp_path)
    meta = load_meta(nf_root)[0]
    d, h, w = meta["size"]
    args.pos = [d // 2, h // 2, w // 2]
    feats = infer_patch_features(meta, nf_root, args, tuple(args.pos))
    assert feats["images"].shape == (1, 64, 64, 3)
    assert feats["images"].min() >= 0.0 and feats["images"].max() <= 1.0
    assert feats["sp_guide"].shape == (1, 64, 64, 1)
    assert feats["context"].shape == (1, 32, 32, 3)
    y1, x1, y2, x2 = feats["bb"][0]
    assert (y2 - y1, x2 - x1) == (64, 64)  # min-size clamp at target

    def fake_predict(f):
        fg = np.asarray(f["sp_guide"])
        return np.concatenate([1 - fg, fg], axis=-1)

    out = run_patch_infer(fake_predict, meta, nf_root, args)
    assert out.exists() and out.name.startswith(
        f"infer-volume-{int(meta['PID'])}-Pos-")
    data = np.load(out)
    assert set(data.files) >= {"prob", "img", "bb", "ct", "sp"}
    assert data["prob"].shape == (64, 64, 2)


def test_nf2_train_step_on_8_device_mesh(nf_root, tmp_path):
    """The fused iin preprocess + GUNet conv-context train step compiles and
    runs under mesh-8 data parallelism (per-device batch contract)."""
    from boxsegliver_tpu.cli.main import build_trainer
    from boxsegliver_tpu.data.pipeline import TrainDataset
    from boxsegliver_tpu.data.sampler_iin import IinSampler

    args = iin_args(["--num_replicas", "8", "--batch_size", "8",
                     "--noise_scale", "0.05", "--gamma"])
    args.model_dir = str(tmp_path)
    trainer = build_trainer(args, nf_root, fuse_preprocess=True)
    assert trainer.mesh.size == 8
    sampler = IinSampler(nf_root, args, mode="train", seed=0)
    dataset = TrainDataset(sampler, args, seed=0, raw=True)
    try:
        trainer.train(dataset, max_steps=2)
    finally:
        dataset.close()
        trainer.ckpt.close()
    assert trainer.global_step == 2


def test_cli_nf2_train_and_eval(nf_root, tmp_path):
    """Product CLI end-to-end: 2 fused train steps then the patch eval."""
    from boxsegliver_tpu.cli import main as cli_main

    model_dir = tmp_path / "m"
    common = ["nf2", "--tag", "t_iin_cli", "--model", "GUNet",
              "--model_config", "GUNet_IIN_TINY.yml", "--classes", "NF",
              "--im_height", "64", "--im_width", "64", "--im_channel", "3",
              "--batch_size", "4", "--use_context", "--use_spatial",
              "--zscore", "--test_fold", "0", "--num_replicas", "1",
              "--data_root", str(nf_root.parent),
              "--dataset", nf_root.name, "--model_dir", str(model_dir)]
    cli_main.main(common + ["--mode", "train", "--num_of_steps", "2",
                            "--log_step", "1", "--save_ckpt_steps", "2"])
    results = cli_main.main(common + ["--mode", "eval", "--eval_final"])
    assert "NF/Dice" in results and np.isfinite(results["NF/Dice"])

    # export + serve roundtrip: the rank-4 patch context rides the signature
    from boxsegliver_tpu.cli.export import load_exported

    cli_main.main(common + ["--mode", "export", "--eval_final"])
    serve, signature = load_exported(model_dir / "export")
    assert signature["inputs"]["context"][0] == [4, 32, 32, 3]
    feats = {k: np.zeros(shape, np.float32)
             for k, (shape, _) in signature["inputs"].items()}
    probs = np.asarray(serve(feats))
    assert probs.shape == (4, 64, 64, 2)
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-3)
