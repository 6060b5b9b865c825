"""Qualitative comparison panels (upstream:utils.py::merge_into_row /
add_row / save_image; SURVEY.md §2 C11): rows of
[RGB | sparse radar input | GT depth | prediction] with colormapped depth,
stacked across samples and saved as PNG. Pure numpy+PIL (no matplotlib)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def colormap_depth(depth: np.ndarray, max_depth: float = 80.0) -> np.ndarray:
    """Map a (H, W) depth array to (H, W, 3) uint8 with a jet-like ramp;
    invalid (<=0) pixels are black. Sparse maps get a 1px dilation so single
    returns are visible (the reference relies on matplotlib's rendering)."""
    d = np.clip(depth / max_depth, 0.0, 1.0)
    valid = depth > 0
    # simple jet: blue → cyan → yellow → red
    r = np.clip(1.5 - np.abs(4 * d - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * d - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * d - 1), 0, 1)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.where(valid[..., None], rgb, 0.0)
    return (rgb * 255).astype(np.uint8)


def _dilate_sparse(depth: np.ndarray, it: int = 1) -> np.ndarray:
    """Max-dilate sparse depth for display only."""
    out = depth.copy()
    for _ in range(it):
        p = np.pad(out, 1)
        stacked = np.stack([
            p[1:-1, 1:-1], p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:],
        ])
        out = stacked.max(axis=0)
    return out


def merge_into_row(rgb: np.ndarray, sparse: np.ndarray, target: np.ndarray,
                   pred: np.ndarray, max_depth: float = 80.0) -> np.ndarray:
    """One sample → one horizontal strip (H, 4W, 3) uint8.

    rgb: (H, W, 3) float [0,1]; sparse/target/pred: (H, W) depth in meters."""
    img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    cols = [
        img,
        colormap_depth(_dilate_sparse(sparse, 2), max_depth),
        colormap_depth(_dilate_sparse(target, 1), max_depth),
        colormap_depth(pred, max_depth),
    ]
    return np.concatenate(cols, axis=1)


def add_row(panel: np.ndarray | None, row: np.ndarray) -> np.ndarray:
    return row if panel is None else np.concatenate([panel, row], axis=0)


def save_image(panel: np.ndarray, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(panel).save(path)


def comparison_panel(prepared: dict, max_rows: int = 4,
                     max_depth: float = 80.0) -> np.ndarray:
    """Batch dict from make_predict_fn → stacked comparison PNG array."""
    rgb = np.asarray(prepared["rgb"])
    sparse = np.asarray(prepared["radar"])[..., 0]
    target = np.asarray(prepared["target"])[..., 0]
    pred = np.asarray(prepared["pred"])[..., 0]
    panel = None
    for i in range(min(max_rows, rgb.shape[0])):
        panel = add_row(panel, merge_into_row(rgb[i], sparse[i], target[i],
                                              pred[i], max_depth))
    return panel
