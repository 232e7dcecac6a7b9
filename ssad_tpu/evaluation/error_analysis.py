"""Classification-error analysis: render misclassified samples with
their class probabilities.

Parity with the reference ErrorAnalyzer (tools.py:150-200): pick
misclassified samples (binary good-vs-defect disagreement), render each
image with its per-class softmax probabilities and true/predicted
labels into one panel figure.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ssad_tpu.constants import ModelOutputs, PRETEXT_CLASSES


def softmax(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


class ErrorAnalyzer:
    def __init__(self, outputs: ModelOutputs):
        self.probabilities = softmax(np.asarray(outputs.raw_predictions, np.float64))
        self.y_hat_multiclass = np.argmax(self.probabilities, axis=1)
        self.true_binary = np.asarray(outputs.y_true_binary)
        self.images = (
            np.asarray(outputs.original_data)
            if outputs.original_data is not None
            else None
        )

    @property
    def wrong_indices(self) -> np.ndarray:
        """Samples whose binary decision disagrees with the truth
        (tools.py:167-169)."""
        pred_binary = (self.y_hat_multiclass > 0).astype(int)
        return np.nonzero(pred_binary != self.true_binary)[0]

    def analyze(
        self,
        num_images: int = 10,
        randomized: bool = True,
        output_path: str = "probabilities.png",
        seed: int = 0,
    ) -> Optional[str]:
        """Render up to `num_images` misclassified samples; returns the
        figure path, or None when nothing was misclassified."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        wrong = self.wrong_indices
        if wrong.size == 0:
            return None
        rng = np.random.default_rng(seed)
        if randomized:
            picks = rng.choice(wrong, size=min(num_images, wrong.size), replace=False)
        else:
            picks = wrong[:num_images]

        n = len(picks)
        fig, axs = plt.subplots(1, n, figsize=(3 * n, 4.2), squeeze=False)
        for ax, idx in zip(axs[0], picks):
            if self.images is not None:
                ax.imshow(np.clip(self.images[idx], 0, 1))
            probs = self.probabilities[idx]
            lines = [
                f"{PRETEXT_CLASSES[j]}: {probs[j]:.3f}" for j in range(len(probs))
            ]
            true_lbl = "GOOD" if self.true_binary[idx] == 0 else "DEFECT"
            pred_lbl = "GOOD" if self.y_hat_multiclass[idx] == 0 else "DEFECT"
            lines += ["", f"true: {true_lbl}", f"pred: {pred_lbl}"]
            ax.set_title("\n".join(lines), fontsize=7, loc="left")
            ax.axis("off")
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        fig.tight_layout()
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return str(out)
