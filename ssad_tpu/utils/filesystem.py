"""Dataset discovery on the MVTec-AD folder layout.

Functional parity with reference src/self_supervised/functional.py
(get_filenames :32, get_test_data_filenames :53, duplicate_filenames
:64, get_ground_truth_filename :43, get_all_subject_experiments :14)
— re-written on pathlib, returning plain python lists.

MVTec layout, per category::

    <root>/<category>/train/good/*.png
    <root>/<category>/test/<defect_type>/*.png
    <root>/<category>/ground_truth/<defect_type>/*_mask.png
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence


def list_categories(dataset_dir: str | Path) -> List[str]:
    """Sorted sub-directories of the dataset root (one per category)."""
    root = Path(dataset_dir)
    if not root.is_dir():
        return []
    return sorted(p.name for p in root.iterdir() if p.is_dir())


def list_images(directory: str | Path, exts: Sequence[str] = (".png",)) -> List[str]:
    """Sorted image files directly inside `directory`."""
    d = Path(directory)
    if not d.is_dir():
        return []
    return sorted(
        str(p) for p in d.iterdir() if p.is_file() and p.suffix.lower() in exts
    )


def train_good_images(category_dir: str | Path) -> List[str]:
    return list_images(Path(category_dir) / "train" / "good")


def test_images(category_dir: str | Path) -> List[str]:
    """All test images across defect-type subfolders, each folder sorted.

    Matches get_test_data_filenames (functional.py:53-61): defect types
    are iterated in sorted order, filenames sorted within each type.
    """
    test_dir = Path(category_dir) / "test"
    if not test_dir.is_dir():
        return []
    out: List[str] = []
    for sub in sorted(p for p in test_dir.iterdir() if p.is_dir()):
        out.extend(list_images(sub))
    return out


def ground_truth_path(test_filename: str | Path) -> Optional[str]:
    """Derive the GT mask path for a test image; None for 'good' images.

    `.../<cat>/test/<defect>/<name>.png` →
    `.../<cat>/ground_truth/<defect>/<name>_mask.png`
    (reference functional.py:43-50).
    """
    p = Path(test_filename)
    defect = p.parent.name
    if defect == "good":
        return None
    gt = p.parent.parent.parent / "ground_truth" / defect / f"{p.stem}_mask{p.suffix}"
    return str(gt)


def duplicate_to_length(filenames: Sequence[str], min_length: int) -> List[str]:
    """Repeat the file list until it reaches at least `min_length`.

    Matches duplicate_filenames (functional.py:64-68): whole-list
    concatenation, so order is preserved and the result length is a
    multiple of the original length (never trimmed).
    """
    files = list(filenames)
    if not files:
        return []
    out = list(files)
    while len(out) < min_length:
        out.extend(files)
    return out


def ensure_dir(path: str | Path) -> Path:
    p = Path(path)
    os.makedirs(p, exist_ok=True)
    return p
