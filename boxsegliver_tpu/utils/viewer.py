"""Headless segmentation viewer: prediction-vs-GT overlay PNGs.

The reference ships Qt/traitsui GUI viewers (reference viewer.py:28-220,
visualization/, interaction/) for manual inspection; in a headless TPU
environment the equivalent surface is rendered PNG overlays per slice plus a
per-case contact sheet — same "pred vs GT with per-case score" affordance,
no display server required.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

# class id → RGBA overlay color (GT drawn as contours, pred as fill)
_COLORS = {1: (0.2, 0.6, 1.0), 2: (1.0, 0.3, 0.2), 3: (0.2, 1.0, 0.4)}


def save_case_overlays(volume: np.ndarray, label: Optional[np.ndarray],
                       pred: np.ndarray, out_dir, case_name: str = "case",
                       scores: Optional[Dict[str, float]] = None,
                       every: int = 1, max_slices: int = 64):
    """Write per-slice overlay PNGs + a contact sheet.

    volume: [d, h, w] grayscale (any range); label/pred: [d, h, w] class ids.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(out_dir) / case_name
    out.mkdir(parents=True, exist_ok=True)
    v = volume.astype(np.float32)
    v = (v - v.min()) / (v.max() - v.min() + 1e-8)

    interesting = [z for z in range(0, volume.shape[0], every)
                   if pred[z].any() or (label is not None and label[z].any())]
    if not interesting:
        interesting = list(range(0, volume.shape[0], every))
    interesting = interesting[:max_slices]

    for z in interesting:
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.imshow(v[z], cmap="gray", interpolation="nearest")
        for cls, color in _COLORS.items():
            m = pred[z] == cls
            if m.any():
                overlay = np.zeros(m.shape + (4,), np.float32)
                overlay[m] = color + (0.35,)
                ax.imshow(overlay, interpolation="nearest")
            if label is not None and (label[z] == cls).any():
                ax.contour(label[z] == cls, levels=[0.5], colors=[color],
                           linewidths=1.0)
        title = f"{case_name} z={z}"
        if scores:
            title += "  " + " ".join(f"{k}={v_:.3f}" for k, v_ in scores.items())
        ax.set_title(title, fontsize=8)
        ax.axis("off")
        fig.savefig(out / f"slice_{z:03d}.png", dpi=100, bbox_inches="tight")
        plt.close(fig)

    # contact sheet
    cols = min(8, len(interesting))
    rows = (len(interesting) + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes:
        ax.axis("off")
    for ax, z in zip(axes, interesting):
        ax.imshow(v[z], cmap="gray", interpolation="nearest")
        for cls, color in _COLORS.items():
            m = pred[z] == cls
            if m.any():
                overlay = np.zeros(m.shape + (4,), np.float32)
                overlay[m] = color + (0.35,)
                ax.imshow(overlay, interpolation="nearest")
        ax.set_title(f"z={z}", fontsize=6)
    fig.savefig(out / "sheet.png", dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out
