"""MVTec-AD taxonomy, metric names and output containers.

Parity notes (reference: src/self_supervised/constants.py):
  * TEXTURES / OBJECTS / NON_FIXED_OBJECTS match constants.py:84-119.
    The reference's OBJECTS() erroneously lists 'tile' (a texture,
    constants.py:96); we keep the taxonomy disjoint and document the
    quirk here.  Nothing in the reference's behavior depends on it
    because TEXTURES membership is always checked first.
  * ModelOutputs is the pytree equivalent of ModelOutputsContainer
    (constants.py:7-53) — batched JAX arrays instead of torch tensors,
    with `concat` replacing `from_list` (device→host moves are the
    caller's concern in JAX; there is no `.to_cpu`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# --- MVTec-AD category taxonomy (reference constants.py:84-119) -----------

TEXTURES = ("carpet", "grid", "leather", "tile", "wood")

OBJECTS = (
    "bottle",
    "cable",
    "capsule",
    "hazelnut",
    "metal_nut",
    "pill",
    "screw",
    "toothbrush",
    "transistor",
    "zipper",
)

#: Objects whose pose varies image-to-image, requiring a per-image object
#: mask during defect synthesis (reference constants.py:118).
NON_FIXED_OBJECTS = ("hazelnut", "screw", "metal_nut")

ALL_CATEGORIES = tuple(sorted(TEXTURES + OBJECTS))

METRICS = ("auroc", "f1-score", "aupro", "iou")

#: Pretext-task class names, label order matches the reference sampler
#: (datasets.py:215 and the defect branches at datasets.py:261-388).
PRETEXT_CLASSES = ("good", "polygon_patch", "scar", "line")
NUM_PRETEXT_CLASSES = len(PRETEXT_CLASSES)

#: ImageNet normalization constants (reference datasets.py:430-433).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def is_texture(subject: str) -> bool:
    return subject in TEXTURES


def is_non_fixed_object(subject: str) -> bool:
    return subject in NON_FIXED_OBJECTS


# --- Output containers ------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelOutputs:
    """Batched prediction outputs (reference ModelOutputsContainer).

    All fields are optional arrays with a shared leading batch axis.
    Registered as a JAX pytree so it can cross jit boundaries.
    """

    original_data: Optional[jax.Array] = None  # (B,H,W,3) un-normalized
    tensor_data: Optional[jax.Array] = None  # (B,H,W,3) normalized input
    y_true_binary: Optional[jax.Array] = None  # (B,) {0,1}
    raw_predictions: Optional[jax.Array] = None  # (B,num_classes) logits
    y_hat: Optional[jax.Array] = None  # (B,) argmax class
    y_true_multiclass: Optional[jax.Array] = None  # (B,) pretext labels
    ground_truths: Optional[jax.Array] = None  # (B,H,W) binary masks
    anomaly_maps: Optional[jax.Array] = None  # (B,) or (B,1,s,s)
    embeddings: Optional[jax.Array] = None  # (B,512)

    @staticmethod
    def concat(chunks: list["ModelOutputs"]) -> "ModelOutputs":
        """Concatenate per-batch outputs along the batch axis.

        Equivalent of the reference's from_list (constants.py:30-53):
        fields that are None in every chunk stay None.  A field set in
        SOME chunks but None in others is an error — silently dropping
        the None chunks would yield a field shorter than its siblings,
        and downstream metrics would zip misaligned rows without any
        exception.
        """
        out = ModelOutputs()
        for f in dataclasses.fields(ModelOutputs):
            vals = [getattr(c, f.name) for c in chunks]
            present = [v for v in vals if v is not None]
            if present and len(present) != len(vals):
                raise ValueError(
                    f"ModelOutputs.concat: field {f.name!r} is set in "
                    f"{len(present)}/{len(vals)} chunks — concatenating "
                    "would misalign it against fully-populated fields"
                )
            if present:
                setattr(out, f.name, jnp.concatenate(
                    [jnp.asarray(v) for v in present], axis=0))
        return out

    def to_host(self) -> "ModelOutputs":
        """Return a copy with every array materialized as numpy."""
        out = ModelOutputs()
        for f in dataclasses.fields(ModelOutputs):
            v = getattr(self, f.name)
            if v is not None:
                setattr(out, f.name, np.asarray(v))
        return out


@dataclasses.dataclass
class EvaluationScores:
    """Scalar evaluation results (reference EvaluationOutputContainer)."""

    auroc: Optional[float] = None
    f1_score: Optional[float] = None
    aupro: Optional[float] = None
    iou: Optional[float] = None

    def to_string(self) -> str:
        fmt = lambda v: round(v, 2) if v is not None else None
        return (
            "scores: [\n"
            f"    auroc: {fmt(self.auroc)},\n"
            f"    f1-score: {fmt(self.f1_score)},\n"
            f"    aupro: {fmt(self.aupro)},\n"
            f"    iou: {fmt(self.iou)}\n"
            "]"
        )
