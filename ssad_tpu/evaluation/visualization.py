"""Plots and qualitative visualizations (host-side, matplotlib/cv2).

Parity with reference src/self_supervised/visualization.py: training
history (:20-49), ROC/PRO curves (:51-106), t-SNE feature scatter
(:109-145), heatmap overlays (:274-283), segmentation overlays with a
detected-region border (:169-177), and multi-panel qualitative grids.
All functions write PNGs and return the path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import functools
import threading

import matplotlib.pyplot as plt

#: pyplot's figure manager is process-global state (even under Agg);
#: category-parallel evaluation threads (evaluator.evaluate_categories
#: with category_shards > 1) serialize figure create/draw/close here —
#: rendering is milliseconds next to the device scoring the threads
#: parallelize.
_PLT_LOCK = threading.RLock()


def _plt_serialized(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with _PLT_LOCK:
            return fn(*args, **kwargs)

    return wrapper


def _ensure(path) -> Path:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    return p


@_plt_serialized
def plot_history(history: Dict[str, list], saving_path, mode: str = "training") -> str:
    """Loss/accuracy curves per phase (reference :20-49)."""
    out = _ensure(Path(saving_path) / f"{mode}_history.png")
    fig, axs = plt.subplots(1, 2, figsize=(10, 4))
    for key, vals in history.items():
        if "loss" in key:
            axs[0].plot(vals, label=key)
        elif "accuracy" in key:
            axs[1].plot(vals, label=key)
    axs[0].set_title("loss")
    axs[1].set_title("accuracy")
    for ax in axs:
        ax.set_xlabel("epoch")
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


@_plt_serialized
def plot_curve(x, y, area: float, saving_path, title: str, name: str) -> str:
    """Single ROC/PRO curve with its area (reference :51-77)."""
    out = _ensure(Path(saving_path) / name)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(np.asarray(x), np.asarray(y), label=f"area = {area:.4f}")
    ax.plot([0, 1], [0, 1], "--", color="gray", linewidth=0.8)
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR / PRO")
    ax.set_title(title)
    ax.legend(loc="lower right")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


@_plt_serialized
def plot_multiple_curves(curves: Sequence[tuple], saving_path, title: str, name: str) -> str:
    """Overlay (label, x, y, area) curves (reference :80-106)."""
    out = _ensure(Path(saving_path) / name)
    fig, ax = plt.subplots(figsize=(6, 6))
    for label, x, y, area in curves:
        ax.plot(np.asarray(x), np.asarray(y), label=f"{label} ({area:.3f})", linewidth=0.9)
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.set_title(title)
    ax.legend(fontsize=6, loc="lower right")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


_TSNE_LABELS = {
    0: ("good", "tab:green"),
    1: ("polygon", "tab:orange"),
    2: ("scar", "tab:red"),
    3: ("line", "tab:purple"),
    -1: ("mvtec good", "tab:blue"),
    4: ("mvtec defect", "tab:brown"),
}


@_plt_serialized
def plot_tsne(embeddings, labels, saving_path, title: str, name: str, seed: int = 0) -> str:
    """2-D t-SNE of embeddings colored by pretext/real label
    (reference :109-145; labels follow predict_step's convention:
    0-3 pretext classes, -1 real good, num_classes real defect)."""
    from sklearn.manifold import TSNE

    out = _ensure(Path(saving_path) / name)
    emb = np.asarray(embeddings)
    labels = np.asarray(labels).astype(int)
    perplexity = min(30, max(5, emb.shape[0] // 4))
    pts = TSNE(n_components=2, random_state=seed, perplexity=perplexity).fit_transform(emb)
    fig, ax = plt.subplots(figsize=(6, 6))
    for val in np.unique(labels):
        sel = labels == val
        label, color = _TSNE_LABELS.get(int(val), (str(val), None))
        ax.scatter(pts[sel, 0], pts[sel, 1], s=6, label=label, c=color, alpha=0.7)
    ax.set_title(title)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


def heatmap_overlay(image, anomaly_map) -> np.ndarray:
    """uint8 overlay of a [0,1] anomaly map on a [0,1] RGB image using
    the magma colormap (reference :274-283 via cv2 COLORMAP_MAGMA)."""
    img = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
    amap = np.clip(np.asarray(anomaly_map), 0, 1)
    cmap = plt.get_cmap("magma")
    heat = (cmap(amap)[..., :3] * 255).astype(np.uint8)
    return (0.5 * img + 0.5 * heat).astype(np.uint8)


def segmentation_overlay(image, mask, color=(255, 0, 0), alpha: float = 0.35) -> np.ndarray:
    """Tint the predicted-anomalous region and draw its border
    (reference :169-177 uses a Canny border)."""
    img = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8).copy()
    m = np.asarray(mask).astype(bool)
    tint = np.zeros_like(img)
    tint[...] = color
    img[m] = (img[m] * (1 - alpha) + tint[m] * alpha).astype(np.uint8)
    try:
        import cv2

        edges = cv2.Canny(m.astype(np.uint8) * 255, 50, 150) > 0
        img[edges] = color
    except Exception:
        pass
    return img


def save_image(array_u8: np.ndarray, path) -> str:
    from PIL import Image

    out = _ensure(path)
    Image.fromarray(np.asarray(array_u8)).save(out)
    return str(out)


@_plt_serialized
def localization_panel(
    original,
    anomaly_map,
    gt_mask: Optional[np.ndarray],
    predicted_mask,
    saving_path,
    name: str,
) -> str:
    """Side-by-side qualitative panel: original / heatmap / GT /
    predicted mask / segmentation (reference localizer.py:164-186)."""
    out = _ensure(Path(saving_path) / name)
    panels = [
        ("original", np.asarray(original)),
        ("heatmap", heatmap_overlay(original, anomaly_map) / 255.0),
        ("anomaly map", np.asarray(anomaly_map)),
    ]
    if gt_mask is not None:
        panels.append(("ground truth", np.asarray(gt_mask)))
    panels.append(("predicted mask", np.asarray(predicted_mask).astype(float)))
    panels.append(
        ("segmentation", segmentation_overlay(original, predicted_mask) / 255.0)
    )
    fig, axs = plt.subplots(1, len(panels), figsize=(3 * len(panels), 3))
    for ax, (title, img) in zip(axs, panels):
        if img.ndim == 2:
            ax.imshow(img, cmap="magma")
        else:
            ax.imshow(np.clip(img, 0, 1))
        ax.set_title(title, fontsize=8)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return str(out)


@_plt_serialized
def augmentation_grid(images_by_label: Dict[int, np.ndarray], saving_path, name: str) -> str:
    """Visual-QA grid of synthetic samples per pretext class (reference
    test_artificial_transformations.py:226-316)."""
    out = _ensure(Path(saving_path) / name)
    labels = sorted(images_by_label)
    cols = max(len(v) for v in images_by_label.values())
    fig, axs = plt.subplots(len(labels), cols, figsize=(2 * cols, 2 * len(labels)))
    axs = np.atleast_2d(axs)
    for r, lbl in enumerate(labels):
        for c in range(cols):
            ax = axs[r, c]
            imgs = images_by_label[lbl]
            if c < len(imgs):
                ax.imshow(np.clip(np.asarray(imgs[c]), 0, 1))
            if c == 0:
                from ssad_tpu.constants import PRETEXT_CLASSES

                ax.set_ylabel(PRETEXT_CLASSES[lbl], fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    return str(out)
