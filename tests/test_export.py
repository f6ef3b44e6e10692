"""Serving-export roundtrip: StableHLO + orbax params + signature reload and
numeric equivalence with the live model (reference entry/main_export.py
SavedModel semantics)."""

import json

import numpy as np
import pytest

from boxsegliver_tpu.cli.export import export_model, load_exported
from boxsegliver_tpu.cli.main import build_trainer, get_args
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def liver_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp") / "synthetic"
    make_synthetic_dataset(root, n_cases=4, shape=(10, 64, 64), k_split=4)
    return root


def test_export_roundtrip(liver_root, tmp_path):
    args = get_args([
        "liver", "--mode", "export", "--tag", "texp", "--model", "UNet",
        "--model_config", "UNet_TINY.yml", "--classes", "Liver", "Tumor",
        "--batch_size", "2", "--im_height", "32", "--im_width", "32",
        "--im_channel", "3", "--test_fold", "0", "--k_folds", "4",
        "--model_dir", str(tmp_path / "m"),
        "--data_root", str(liver_root.parent), "--dataset", liver_root.name])
    args.num_replicas = 1
    out = export_model(args, liver_root, out_dir=tmp_path / "export")
    assert (out / "model.stablehlo").exists()
    assert (out / "signature.json").exists()

    serve, signature = load_exported(out)
    assert signature["model"] == "UNet"
    assert signature["classes"] == ["Background", "Liver", "Tumor"]

    rng = np.random.RandomState(0)
    feats = {"images": rng.rand(2, 32, 32, 3).astype(np.float32)}
    probs = np.asarray(serve(feats))
    assert probs.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

    # equivalence with the live model (export bakes in resize + forward;
    # at the serving resolution the resize is identity)
    trainer = build_trainer(args, liver_root)
    live = np.asarray(trainer.predict(feats))
    np.testing.assert_allclose(probs, live, atol=1e-5)
    trainer.ckpt.close()
