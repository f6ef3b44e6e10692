"""HTML viewer tests (cli/viewer.py — the headless counterpart of the
reference Qt viewer, reference viewer.py:28-220)."""

import base64
import json
import re

import numpy as np
import pytest

from boxsegliver_tpu.cli import viewer as viewer_mod
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("viewer") / "synthetic"
    make_synthetic_dataset(root, n_cases=2, shape=(10, 64, 64), k_split=2)
    return root


def test_parse_scores_log_lines(tmp_path):
    log = tmp_path / "log.txt"
    log.write_text(
        "01:00 I Evaluate-1 case 27 Liver/Dice: 0.954 Liver/VOE: 0.100 "
        "Tumor/Dice: 0.713 (1.2 s)\n"
        "01:01 I Evaluate-2 case 5 NF/Dice: 0.792 (2.3 s)\n")
    scores = viewer_mod.parse_scores(log)
    assert scores["27"] == {"Liver": 0.954, "Tumor": 0.713}
    assert scores["5"] == {"NF": 0.792}


def test_parse_scores_results_json(tmp_path):
    f = tmp_path / "eval_results_3d.txt"
    f.write_text(json.dumps({"Liver/Dice": 0.9, "Tumor/Dice": 0.6,
                             "GLiverDice": 0.91}))
    scores = viewer_mod.parse_scores(f)
    assert scores["*"] == {"Liver": 0.9, "Tumor": 0.6}


def test_build_viewer_payload_roundtrip(ds, tmp_path):
    import cv2

    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.data import nii as nii_kits
    from boxsegliver_tpu.data.sampler import CaseVolumes

    metas = load_meta(ds)
    pid = int(metas[0]["PID"])
    gt = np.asarray(CaseVolumes(ds).label(pid))
    pred_dir = tmp_path / "prediction"
    pred_dir.mkdir()
    # prediction = GT shifted one slice (a visible, checkable difference)
    pred = np.roll(gt, 1, axis=0)
    nii_kits.write_nii(pred, pred_dir / f"predict-{pid}.nii.gz",
                       zooms=metas[0]["spacing"])

    out = viewer_mod.build_viewer(pred_dir, ds, tmp_path / "v.html",
                                  axes="zy", max_size=64)
    html = out.read_text()
    data = json.loads(re.search(r"const DATA = (\{.*?\});\nlet cur", html,
                                re.S).group(1))
    case = data["cases"][str(pid)]
    assert set(case["axes"]) == {"z", "y"}
    bb = metas[0]["bbox"]
    z1, z2 = max(bb[0] - 2, 0), min(bb[3] + 2, gt.shape[0])
    assert case["z1"] == z1 and len(case["axes"]["z"]) == z2 - z1

    # decode one z slice: mask PNGs must round-trip the class ids exactly
    z_mid = (z2 - z1) // 2
    s = case["axes"]["z"][z_mid]
    def decode(url):
        raw = base64.b64decode(url.split(",", 1)[1])
        return cv2.imdecode(np.frombuffer(raw, np.uint8),
                            cv2.IMREAD_UNCHANGED)
    g = decode(s["gt"])
    p = decode(s["pred"])
    assert np.array_equal(g, gt[z1 + z_mid])
    assert np.array_equal(p, pred[z1 + z_mid])
    im = decode(s["img"])
    assert im.dtype == np.uint8 and im.shape == g.shape


def test_build_viewer_downscales_and_filters(ds, tmp_path):
    from boxsegliver_tpu.data import nii as nii_kits
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.data.sampler import CaseVolumes

    metas = load_meta(ds)
    pred_dir = tmp_path / "prediction"
    pred_dir.mkdir()
    for m in metas:
        pid = int(m["PID"])
        gt = np.asarray(CaseVolumes(ds).label(pid))
        nii_kits.write_nii(gt, pred_dir / f"predict-{pid}.nii.gz",
                           zooms=m["spacing"])
    out = viewer_mod.build_viewer(pred_dir, ds, tmp_path / "v.html",
                                  max_size=32, pids=[int(metas[0]["PID"])])
    data = json.loads(re.search(r"const DATA = (\{.*?\});\nlet cur",
                                out.read_text(), re.S).group(1))
    assert list(data["cases"]) == [str(int(metas[0]["PID"]))]
    import base64 as b64, cv2
    s = data["cases"][str(int(metas[0]["PID"]))]["axes"]["z"][0]
    raw = b64.b64decode(s["img"].split(",", 1)[1])
    im = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_UNCHANGED)
    assert max(im.shape) <= 32


def test_build_viewer_without_z_axis(ds, tmp_path):
    """--axes y must produce a valid payload and a case table that counts
    the first available axis (the JS reads Object.values(axes)[0])."""
    from boxsegliver_tpu.data import nii as nii_kits
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.data.sampler import CaseVolumes

    meta = load_meta(ds)[0]
    pid = int(meta["PID"])
    gt = np.asarray(CaseVolumes(ds).label(pid))
    pred_dir = tmp_path / "prediction"
    pred_dir.mkdir()
    nii_kits.write_nii(gt, pred_dir / f"predict-{pid}.nii.gz",
                       zooms=meta["spacing"])
    out = viewer_mod.build_viewer(pred_dir, ds, tmp_path / "v.html",
                                  axes="y", max_size=48)
    data = json.loads(re.search(r"const DATA = (\{.*?\});\nlet cur",
                                out.read_text(), re.S).group(1))
    case = data["cases"][str(pid)]
    assert list(case["axes"]) == ["y"]
    assert len(case["axes"]["y"]) == gt.shape[1]
    assert "axes.z.length" not in out.read_text()
    with pytest.raises(ValueError):
        viewer_mod.build_viewer(pred_dir, ds, tmp_path / "v2.html", axes="q")


def test_build_viewer_empty_pred_dir(ds, tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        viewer_mod.build_viewer(tmp_path / "empty", ds, tmp_path / "v.html")
