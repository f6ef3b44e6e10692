"""GLCM feature statistics: per-dimension 95%-trimmed ranges and the derived
noise scales (reference analyze.py:22-71).

The reference uses this to pick the per-feature `--glcm` noise scales for
context-guided training: for each of the 96 GLCM dims (8 props x 12
distance/angle combos) it trims to the central 95% and prints
(max - min) / 100.  Works on the repo's feature layout
(`<dataset>/feat/glcm/{train,eval}/<PID>.npy`, data/meta.dump_glcm_features).

Usage:
    python tools/analyze_glcm.py data/LiTS [--hist-dir images_glcm_95p]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

PROPS = ["contrast", "dissimilarity", "homogeneity", "energy", "entropy",
         "correlation", "cluster_shade", "cluster_prominence"]


def load_glcm(feat_dir: Path) -> np.ndarray:
    """All nonzero GLCM rows of a split (reference glcm_stat)."""
    rows = []
    for feat in sorted(feat_dir.glob("*.npy")):
        cur = np.load(str(feat))
        cur = cur.reshape(-1, cur.shape[-1])
        rows.append(cur[cur.max(axis=1) > 0])
    if not rows:
        raise SystemExit(f"no .npy features under {feat_dir}")
    return np.concatenate(rows, axis=0)


def trimmed_scales(feats: np.ndarray, hist_dir: Path = None) -> np.ndarray:
    """Per-dim (max-min)/100 over the central 95% (reference analyze.py:51-59);
    optionally writes a 50-bin histogram PNG per dim."""
    scales = []
    for i in range(feats.shape[1]):
        obj = feats[:, i]
        p1, p2 = np.percentile(obj, [2.5, 97.5])
        obj = obj[np.logical_and(obj > p1, obj < p2)]
        if obj.size == 0:
            scales.append(0.0)
            continue
        if hist_dir is not None:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.hist(obj, bins=50)
            prop = PROPS[i // 12] if i // 12 < len(PROPS) else f"dim{i // 12}"
            plt.savefig(str(hist_dir / f"{prop}_{i % 12}.png"))
            plt.close()
        scales.append((obj.max() - obj.min()) / 100)
    return np.asarray(scales)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="dataset dir containing feat/glcm/")
    ap.add_argument("--hist-dir", default=None,
                    help="write per-dim histogram PNGs here")
    opts = ap.parse_args(argv)

    root = Path(opts.dataset) / "feat" / "glcm"
    hist_dir = None
    if opts.hist_dir:
        hist_dir = Path(opts.hist_dir)
        hist_dir.mkdir(parents=True, exist_ok=True)
    for mode in ("train", "eval"):
        if not (root / mode).exists():
            print(f"{mode}: (absent)")
            continue
        feats = load_glcm(root / mode)
        scales = trimmed_scales(feats, hist_dir if mode == "train" else None)
        print(f"{mode}: {feats.shape[0]} rows x {feats.shape[1]} dims")
        print(scales.round(4))


if __name__ == "__main__":
    main()
