"""ssad_tpu — TPU-native self-supervised anomaly detection.

A brand-new JAX / XLA / Pallas framework with the capabilities of the
reference PyTorch project `gabry1998/Self-Supervised-Anomaly-Detection`
(CutPaste-style 4-way pretext training on MVTec-AD, memory-bank k-NN
scoring, image- and patch-level localization), re-designed TPU-first:

* the synthetic-defect pipeline runs **on device** as fused, vmapped,
  fixed-shape array programs (reference: PIL on CPU dataloader workers);
* training is a single pjit-compiled step over a `jax.sharding.Mesh`
  (data-parallel within a slice, category-parallel across devices);
* k-NN scoring is a Pallas MXU kernel (reference: sklearn on CPU);
* all randomness is explicit `jax.random` key threading.

Package map (see SURVEY.md for the reference component inventory):
  config        — dataclass configuration (reference had kwarg-soup)
  constants     — MVTec taxonomy + output containers
  utils/        — filesystem discovery, label converters, torch-weight import
  data/         — MVTec loading, host mask precompute, on-device defect engine
  ops/          — image ops, rasterization, patch extraction, k-NN kernels
  models/       — ResNet-18 backbone, PeraNet, AnomalyDetector, Grad-CAM
  train/        — two-phase trainer, memory bank, checkpointing
  parallel/     — mesh construction and sharding helpers
  evaluation/   — metrics (ROC/AUC/F1/IoU/AUPRO), evaluator sweep, plots
"""

__version__ = "0.1.0"

__all__ = ["config", "constants", "__version__"]


def __getattr__(name: str):
    # lazy (PEP 562): constants registers a jax pytree at import time,
    # and an eager import here would force jax onto hosts that only
    # need the stdlib serving thin client (serving/client.py)
    if name in ("config", "constants"):
        import importlib

        return importlib.import_module(f"ssad_tpu.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
