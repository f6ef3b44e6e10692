"""cli.compare_preds: the prediction-parity gate (BASELINE.md row 3)."""

import numpy as np

from boxsegliver_tpu.cli.compare_preds import main
from boxsegliver_tpu.data import nii as nii_kits


def _write_pred(path, arr):
    nii_kits.write_nii(arr, path, zooms=(1.0, 1.0, 1.0))


def test_identical_predictions_pass(tmp_path, capsys):
    ref, ours = tmp_path / "ref", tmp_path / "ours"
    ref.mkdir(), ours.mkdir()
    rng = np.random.RandomState(0)
    for pid in (3, 11):
        arr = rng.randint(0, 3, size=(8, 32, 32)).astype(np.uint8)
        _write_pred(ref / f"predict-{pid}.nii.gz", arr)
        _write_pred(ours / f"predict-{pid}.nii.gz", arr)
    rc = main([str(ref), str(ours), "--classes", "Liver", "Tumor"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PARITY OK" in out and "identical=100.0000%" in out


def test_diverging_predictions_fail(tmp_path):
    ref, ours = tmp_path / "ref", tmp_path / "ours"
    ref.mkdir(), ours.mkdir()
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 3, size=(8, 32, 32)).astype(np.uint8)
    other = arr.copy()
    other[:4] = (other[:4] + 1) % 3  # corrupt half the volume
    _write_pred(ref / "predict-5.nii.gz", arr)
    _write_pred(ours / "predict-5.nii.gz", other)
    assert main([str(ref), str(ours), "--classes", "Liver", "Tumor"]) == 1


def test_shape_mismatch_reported(tmp_path, capsys):
    ref, ours = tmp_path / "ref", tmp_path / "ours"
    ref.mkdir(), ours.mkdir()
    _write_pred(ref / "predict-5.nii.gz", np.ones((4, 8, 8), np.uint8))
    _write_pred(ours / "predict-5.nii.gz", np.ones((4, 8, 9), np.uint8))
    assert main([str(ref), str(ours), "--classes", "Liver"]) == 1
    assert "SHAPE MISMATCH" in capsys.readouterr().err
