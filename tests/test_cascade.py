"""2D→3D cascade wiring tests: GT-oracle / frozen-2D cascade channels, 3D
sampler + pipeline integration, the interactive 3D loop with cascade, and the
hybrid evaluation entry (reference NF/input_pipeline_3d.py:474-539 +
entry/main_train_hybrid.py)."""

import jax
import numpy as np
import pytest

from boxsegliver_tpu.data.pipeline3d import _process_batch_3d
from boxsegliver_tpu.data.sampler3d import Sampler3D
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset
from boxsegliver_tpu.interactive.cascade import (CascadeClick2D,
                                                 edt_cascade_channel,
                                                 gt_cascade_channel,
                                                 inner_boundaries)


@pytest.fixture(scope="module")
def nf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("casc") / "synthetic_nf"
    make_synthetic_dataset(root, n_cases=4, shape=(12, 64, 64), k_split=4,
                           modality="nf")
    return root


def _args3d(root, model_dir, *extra):
    from boxsegliver_tpu.cli.main import get_args
    return get_args([
        "nf", "--mode", "train", "--tag", "t3d", "--model", "UNet3D",
        "--classes", "NF", "--batch_size", "2", "--im_depth", "8",
        "--im_height", "32", "--im_width", "32", "--im_channel", "1",
        "--test_fold", "0", "--k_folds", "4", "--random_flip", "0",
        "--model_dir", str(model_dir), "--data_root", str(root.parent),
        "--dataset", root.name, "--num_of_total_steps", "4",
        "--host_workers", "1", *extra])


def test_gt_cascade_channel():
    lab = np.zeros((6, 16, 16), np.uint8)
    lab[2, 4:10, 4:10] = 1
    lab[3, 5:9, 5:9] = 1
    fg = np.array([[3.0, 6.0, 6.0], [-1, -1, -1]], np.float32)
    binary = gt_cascade_channel(lab, fg, binary=True)
    assert binary.shape == lab.shape
    np.testing.assert_array_equal(binary[3], lab[3].astype(np.float32))
    assert binary[2].sum() == 0  # only the first click's slice

    edt = gt_cascade_channel(lab, fg, binary=False, tau=25.0)
    # boundary pixels have value 1, decaying away from them
    b = inner_boundaries(lab[3] > 0)
    assert np.allclose(edt[3][b], 1.0)
    assert edt.max() <= 1.0 and edt.min() > 0.0  # exp(-d/25) > 0 everywhere

    none = gt_cascade_channel(lab, np.full((2, 3), -1.0, np.float32))
    assert none.sum() == 0


def test_inner_boundaries_semantics():
    m = np.zeros((8, 8), bool)
    m[2:6, 2:6] = True
    b = inner_boundaries(m)
    assert b[2, 2] and b[2, 5] and b[5, 5]
    assert not b[3, 3]  # interior
    assert not b[0, 0]  # background


def test_sampler3d_gt_cascade(nf_root, tmp_path):
    args = _args3d(nf_root, tmp_path / "m", "--use_cascade",
                   "--cascade_binary")
    s = Sampler3D(nf_root, args, mode="train")
    b = s.sample_batch(4, rng=np.random.RandomState(0))
    assert "cascade" in b and b["cascade"].shape == (4, 8, 32, 32)
    assert "fg_pts" not in b  # clicks only used internally (no use_spatial)
    # tumor-forced half of the batch gets a nonzero oracle slice
    assert b["cascade"].sum() > 0
    # binary channel only contains {0, 1}
    assert set(np.unique(b["cascade"])) <= {0.0, 1.0}

    feats, labels = jax.jit(lambda bb, k: _process_batch_3d(
        bb, k, stddev=3.0, local_enhance=True, guide_channel=2,
        random_flip=0, gamma=False, use_spatial=False, use_cascade=True))(
        b, jax.random.PRNGKey(0))
    assert feats["images"].shape == (4, 8, 32, 32, 2)
    # cascade channel passes through untouched (no z-score/gamma)
    np.testing.assert_allclose(np.asarray(feats["images"][..., 1]),
                               b["cascade"], atol=1e-6)


def test_cascade_click2d_stub():
    """CascadeClick2D drives the 2D predictor only on clicked slices."""
    calls = []

    def stub_predict(feats):
        calls.append(feats["images"].shape)
        g = feats["sp_guide"][..., 0]
        probs = np.zeros(feats["images"].shape[:-1] + (2,), np.float32)
        probs[..., 1] = (g > 0.5).astype(np.float32)  # segment near fg clicks
        probs[..., 0] = 1.0 - probs[..., 1]
        return probs

    c = CascadeClick2D(stub_predict, im_height=32, im_width=32, im_channel=3,
                       eval_mirror=False)
    patch = np.random.RandomState(0).rand(8, 24, 24).astype(np.float32) * 100
    fg = np.array([[3.0, 12.0, 12.0], [-1, -1, -1]], np.float32)
    bg = np.full((2, 3), -1.0, np.float32)
    mask, zs = c.pred_from_clicks(patch, fg, bg)
    assert mask.shape == patch.shape
    assert list(zs) == [3]
    assert len(calls) == 1 and calls[0] == (1, 32, 32, 3)
    assert mask[3].sum() > 0 and mask[[0, 1, 2, 4, 5, 6, 7]].sum() == 0

    ch = c.extra_channel_from_clicks(patch, fg, bg, binary=False)
    assert ch.shape == patch.shape and 0.0 < ch.max() <= 1.0


def test_interactive_eval_3d_with_cascade():
    from boxsegliver_tpu.interactive.refine import interactive_eval_3d

    label = np.zeros((6, 16, 16), np.uint8)
    label[2:4, 4:10, 4:10] = 1
    vol = label.astype(np.float32) + 0.1
    shapes = []

    def stub_predict(feats):
        shapes.append((feats["images"].shape, feats["sp_guide"].shape))
        x = feats["images"]
        probs = np.zeros(x.shape[:-1] + (2,), np.float32)
        probs[..., 1] = (x[..., 0] > 0.5).astype(np.float32)
        probs[..., 0] = 1 - probs[..., 1]
        return probs

    res = interactive_eval_3d(stub_predict, vol, label, dice_thresh=0.9,
                              max_iters=3, use_cascade=True,
                              cascade_binary=True)
    assert res["Dice"] > 0.9 and res["clicks"] >= 1
    # images: volume + cascade channels; guide on the sp_guide input
    assert all(si[-1] == 2 and sg[-1] == 1 for si, sg in shapes)


def test_filter_tiny_nf_and_hybrid_eval(nf_root, tmp_path):
    from boxsegliver_tpu.cli.hybrid_eval import filter_tiny_nf, run_hybrid_eval
    from boxsegliver_tpu.cli.main import build_trainer

    mask = np.zeros((6, 20, 20), np.uint8)
    mask[1, 2, 2] = 1                       # 1-px 2D blob → dropped
    mask[3, 5:9, 5:9] = 1                   # real object → kept
    mask[5, 15, 15:18] = 1                  # 3-px slice of a 3-px 3D obj → dropped
    slim = filter_tiny_nf(mask)
    assert slim[1].sum() == 0
    assert slim[3].sum() == 16
    assert slim[5].sum() == 0

    args = _args3d(nf_root, tmp_path / "hmodel", "--eval_num", "1")
    args.eval_mirror = False  # keep the CPU-test compile budget small
    args.num_replicas = 1
    trainer = build_trainer(args, nf_root)
    results = run_hybrid_eval(args, nf_root, trainer=trainer)
    assert "Dice" in results and np.isfinite(results["Dice"])
    assert (nf_root / "slim").exists()
    trainer.ckpt.close()


def test_cascade_trained_model_evaluates_without_2d(nf_root, tmp_path):
    """A GT-oracle cascade-trained UNet3D (2-channel input) must evaluate
    without a frozen-2D producer: the evaluator feeds the neutral zero
    channel (regression: ScopeParamShapeError before)."""
    from boxsegliver_tpu.cli.main import build_trainer
    from boxsegliver_tpu.evaluators.volume3d import EvaluateVolume3D

    args = _args3d(nf_root, tmp_path / "m", "--use_cascade",
                   "--cascade_binary", "--eval_num", "1")
    args.num_replicas = 1
    trainer = build_trainer(args, nf_root)
    ev = EvaluateVolume3D(args, nf_root, ["NF"])
    import json
    metas = json.loads((nf_root / "meta.json").read_text())
    results = ev.run(trainer.predict, metas[:1], do_eval=True)
    assert "NF/Dice" in results and np.isfinite(results["NF/Dice"])
    trainer.ckpt.close()
