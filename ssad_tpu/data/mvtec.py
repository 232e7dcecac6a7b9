"""MVTec-AD data loading: host decode once, device arrays forever.

The reference re-opens and re-resizes every PNG with PIL on every
epoch, in 8 forked dataloader workers (datasets.py:67-80, :209-213,
:501-533).  A 15-category MVTec set resized to 256px is only ~60 MB per
category, so here each split is decoded+resized exactly once on the
host, cached as a dense float array, and then lives in HBM; per-step
batches are pure device-side gathers feeding the fused synthesis+train
program.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ssad_tpu import constants
from ssad_tpu.data import masks as masks_mod
from ssad_tpu.utils import filesystem as fs


def load_image(path, imsize: Tuple[int, int]) -> np.ndarray:
    """Decode + resize one image (path or binary file object) to
    (H, W, 3) float32 in [0, 1].

    Matches the reference's PIL open→resize→convert('RGB') order
    (datasets.py:69, :211-213; PIL resize default = bicubic).  The
    serving HTTP front end routes request bodies through this same
    function so served scores can't skew against the evaluator.
    """
    from PIL import Image

    with Image.open(path) as img:
        img = img.resize((imsize[1], imsize[0])).convert("RGB")
        return np.asarray(img, np.float32) / 255.0


def load_mask(path: Optional[str | Path], imsize: Tuple[int, int]) -> np.ndarray:
    """GT mask → (H, W) float {0,1}; blank when path is None
    (reference functional.py:20-24)."""
    if path is None:
        return np.zeros(imsize, np.float32)
    from PIL import Image

    with Image.open(path) as img:
        img = img.resize((imsize[1], imsize[0])).convert("L")
        return (np.asarray(img, np.float32) > 127).astype(np.float32)


def load_stack(paths: Sequence[str], imsize: Tuple[int, int]) -> np.ndarray:
    """Batch decode+resize; native C++ threaded loader when available
    (ssad_tpu/native, PIL-parity tested), else the PIL path above."""
    if not paths:
        return np.zeros((0,) + tuple(imsize) + (3,), np.float32)
    from ssad_tpu import native

    batch = native.decode_resize_batch(paths, imsize, channels=3)
    if batch is not None:
        return batch
    return np.stack([load_image(p, imsize) for p in paths])


def load_mask_stack(
    paths: Sequence[Optional[str]], imsize: Tuple[int, int]
) -> np.ndarray:
    """Batch GT-mask loading: native grayscale decode for the non-None
    paths (threshold >127 as in load_mask), zeros for good images."""
    n = len(paths)
    out = np.zeros((n,) + tuple(imsize), np.float32)
    real = [(i, p) for i, p in enumerate(paths) if p is not None]
    if not real:
        return out
    from ssad_tpu import native

    batch = native.decode_resize_batch(
        [p for _, p in real], imsize, channels=1
    )
    if batch is not None:
        idx = np.asarray([i for i, _ in real])
        out[idx] = (batch[..., 0] > (127.0 / 255.0)).astype(np.float32)
        return out
    for i, p in real:
        out[i] = load_mask(p, imsize)
    return out


def train_val_split(
    filenames: Sequence[str], val_fraction: float, seed: int
) -> Tuple[List[str], List[str]]:
    """Deterministic shuffled split (the reference uses sklearn
    train_test_split(test_size=0.2, random_state=seed),
    datasets.py:441-444)."""
    files = list(filenames)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(files))
    n_val = int(np.ceil(len(files) * val_fraction))
    val = [files[i] for i in idx[:n_val]]
    train = [files[i] for i in idx[n_val:]]
    return train, val


@dataclasses.dataclass
class PretextData:
    """Everything the on-device pretext pipeline needs for one subject.

    Reference parity note: PretextTaskDatamodule.setup feeds the *val*
    filename list to the train dataset and vice versa (datasets.py:
    475-489 — a quirk we deliberately do NOT reproduce; documented in
    SURVEY.md §'known quirks').  Here train trains and val validates.
    """

    subject: str
    imsize: Tuple[int, int]
    train_images: np.ndarray  # (Nt, H, W, 3) float32
    val_images: np.ndarray  # (Nv, H, W, 3)
    cut_pool: np.ndarray  # (K, H, W, 3) first image per category
    fixed_mask: np.ndarray  # (H, W) float {0,1}
    fixed_coords: np.ndarray  # (H·W, 2) int32
    fixed_count: int
    train_masks: Optional[np.ndarray] = None  # (Nt, H, W) for NON_FIXED subjects
    train_coords: Optional[np.ndarray] = None  # (Nt, H·W, 2) int32
    train_counts: Optional[np.ndarray] = None  # (Nt,)
    val_masks: Optional[np.ndarray] = None
    val_coords: Optional[np.ndarray] = None
    val_counts: Optional[np.ndarray] = None


def prepare_pretext_data(
    dataset_dir: str | Path,
    subject: str,
    imsize: Tuple[int, int] = (256, 256),
    val_fraction: float = 0.2,
    seed: int = 0,
    patch_localization: bool = False,
) -> PretextData:
    """Discover, decode, split and mask-precompute one subject.

    Mirrors PretextTaskDatamodule.prepare_filenames + PretextTaskDataset
    setup (datasets.py:166-206, :438-466) — but no filename duplication:
    the reference duplicates file lists to fake longer epochs
    (datasets.py:447-457); here epoch length is a training-loop
    parameter and images are sampled with replacement on device.
    """
    root = Path(dataset_dir)
    subject_dir = root / subject
    files = fs.train_good_images(subject_dir)
    if not files:
        raise FileNotFoundError(f"no train images under {subject_dir}/train/good")
    train_files, val_files = train_val_split(files, val_fraction, seed)

    train_images = load_stack(train_files, imsize)
    val_images = load_stack(val_files, imsize)

    # cut pool: first train image of every category (datasets.py:189-193)
    pool = []
    for cat in fs.list_categories(root):
        cat_files = fs.train_good_images(root / cat)
        if cat_files:
            pool.append(load_image(cat_files[0], imsize))
    cut_pool = np.stack(pool) if pool else train_images[:1]

    # fixed per-subject mask (datasets.py:195-206)
    first_u8 = (load_image(files[0], imsize) * 255).astype(np.uint8)
    if constants.is_texture(subject):
        fixed_mask = np.ones(imsize, np.uint8)
    else:
        fixed_mask = masks_mod.subject_mask(first_u8, subject)
    fixed_coords, fixed_count = masks_mod.pack_coords(fixed_mask)

    data = PretextData(
        subject=subject,
        imsize=imsize,
        train_images=train_images,
        val_images=val_images,
        cut_pool=cut_pool,
        fixed_mask=fixed_mask.astype(np.float32),
        fixed_coords=fixed_coords,
        fixed_count=fixed_count,
    )

    # per-image masks for non-fixed-pose subjects (datasets.py:232-235):
    # the mask depends only on the image, so precompute once per image.
    # In patch mode the synthesizer recomputes CDF coordinates from the
    # CROPPED mask on device (make_synthesizer docstring), so the packed
    # (N, H·W, 2) coordinate stacks are dead there — skip building them
    # (~0.5 MB/image of host RAM and device transfer) and store 1-row
    # placeholders; batched_synthesizer's image-level path rejects
    # placeholder coords at trace time.
    if constants.is_non_fixed_object(subject):
        coord_rows = 1 if patch_localization else imsize[0] * imsize[1]

        def mask_all(images):
            ms, cs, ns = [], [], []
            for img in images:
                m = masks_mod.object_mask((img * 255).astype(np.uint8))
                if patch_localization:
                    c, n = np.zeros((1, 2), np.int32), 0
                else:
                    c, n = masks_mod.pack_coords(m)
                ms.append(m.astype(np.float32))
                cs.append(c)
                ns.append(n)
            if not ms:
                return (
                    np.zeros((0,) + imsize, np.float32),
                    np.zeros((0, coord_rows, 2), np.int32),
                    np.zeros((0,), np.int32),
                )
            return np.stack(ms), np.stack(cs), np.asarray(ns, np.int32)

        data.train_masks, data.train_coords, data.train_counts = mask_all(train_images)
        data.val_masks, data.val_coords, data.val_counts = mask_all(val_images)

    return data


@dataclasses.dataclass
class MVTecTestData:
    """Real test data for one subject (reference MVTecDataset,
    datasets.py:50-84)."""

    subject: str
    imsize: Tuple[int, int]
    images: np.ndarray  # (N, H, W, 3) float32, un-normalized
    ground_truths: np.ndarray  # (N, H, W) float {0,1}
    labels: np.ndarray  # (N,) {0,1}
    filenames: List[str]


def prepare_mvtec_test_data(
    dataset_dir: str | Path,
    subject: str,
    imsize: Tuple[int, int] = (256, 256),
) -> MVTecTestData:
    subject_dir = Path(dataset_dir) / subject
    files = fs.test_images(subject_dir)
    if not files:
        raise FileNotFoundError(f"no test images under {subject_dir}/test")
    images = load_stack(files, imsize)
    gts = load_mask_stack([fs.ground_truth_path(f) for f in files], imsize)
    labels = (gts.reshape(len(files), -1).sum(axis=1) > 0).astype(np.int32)
    return MVTecTestData(
        subject=subject,
        imsize=imsize,
        images=images,
        ground_truths=gts,
        labels=labels,
        filenames=list(files),
    )
