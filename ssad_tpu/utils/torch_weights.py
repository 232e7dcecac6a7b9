"""Import torchvision ResNet-18 ImageNet weights into the Flax backbone.

The reference initializes from torchvision IMAGENET1K_V1
(models.py:59); training from scratch would not reach accuracy parity
in 40 epochs (SURVEY.md §7 hard part #6).  This environment has no
network egress and no bundled weights, so the converter is gated on a
user-supplied state-dict file (torch .pth, loadable with torch-cpu).

Layout mapping (torch → flax):
  conv .weight (O, I, kh, kw)  →  kernel (kh, kw, I, O)
  bn   .weight/.bias           →  scale/bias
  bn   .running_mean/var       →  batch_stats mean/var
  layerL.B.convN / bnN / downsample.{0,1}
       →  backbone/layerL_B/{convN, bnN, downsample_conv, downsample_bn}
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv(k):
    return np.transpose(np.asarray(k), (2, 3, 1, 0))  # OIHW → HWIO


def convert_resnet_state_dict(state_dict: Dict[str, Any]) -> Tuple[dict, dict]:
    """torchvision ResNet-family state_dict → (params, batch_stats)
    subtrees for the `backbone` module of models/resnet.ResNet.

    Handles basic (resnet18/34: conv1-2) and bottleneck
    (resnet50/wide_resnet50_2: conv1-3) blocks; stage depths are read
    off the key set, so any torchvision ResNet variant converts."""
    sd = {k: np.asarray(v) for k, v in state_dict.items() if "num_batches" not in k}
    params: dict = {}
    stats: dict = {}

    def put_bn(flax_name: str, torch_prefix: str, tree_p: dict, tree_s: dict):
        tree_p[flax_name] = {
            "scale": sd[f"{torch_prefix}.weight"],
            "bias": sd[f"{torch_prefix}.bias"],
        }
        tree_s[flax_name] = {
            "mean": sd[f"{torch_prefix}.running_mean"],
            "var": sd[f"{torch_prefix}.running_var"],
        }

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1", params, stats)

    for stage in range(1, 5):
        block = 0
        while f"layer{stage}.{block}.conv1.weight" in sd:
            name = f"layer{stage}_{block}"
            tp: dict = {}
            ts: dict = {}
            prefix = f"layer{stage}.{block}"
            n_convs = 3 if f"{prefix}.conv3.weight" in sd else 2
            for c in range(1, n_convs + 1):
                tp[f"conv{c}"] = {"kernel": _conv(sd[f"{prefix}.conv{c}.weight"])}
                put_bn(f"bn{c}", f"{prefix}.bn{c}", tp, ts)
            if f"{prefix}.downsample.0.weight" in sd:
                tp["downsample_conv"] = {"kernel": _conv(sd[f"{prefix}.downsample.0.weight"])}
                put_bn("downsample_bn", f"{prefix}.downsample.1", tp, ts)
            params[name] = tp
            stats[name] = ts
            block += 1
    return params, stats


# backwards-compatible alias
convert_resnet18_state_dict = convert_resnet_state_dict


def load_resnet18_into(params: dict, path: str, batch_stats: dict | None = None):
    """Replace the `backbone` subtree of a PeraNet param tree with
    converted torchvision weights from `path` (a torch .pth/.pt file).

    When `batch_stats` is given, the ImageNet BN running mean/var are
    converted too (the reference loads the FULL state dict incl. running
    stats, models.py:59 — eval-mode embeddings are wrong without them)
    and `(new_params, new_batch_stats)` is returned; otherwise just the
    new params.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    bb_params, bb_stats = convert_resnet18_state_dict(sd)

    new_params = dict(params)
    new_params["backbone"] = _cast_like(params["backbone"], bb_params)
    if batch_stats is not None:
        new_stats = dict(batch_stats)
        new_stats["backbone"] = _cast_like(batch_stats["backbone"], bb_stats)
        return new_params, new_stats
    return new_params


def _cast_like(template, source):
    """Match dtypes/structure of the flax template tree (concrete arrays
    or jax.eval_shape ShapeDtypeStructs — only .shape/.dtype are read)."""
    import jax

    out = source

    def cast(path, leaf_t):
        node = out
        for p in path:
            node = node[p.key]
        arr = np.asarray(node)
        if arr.shape != leaf_t.shape:
            raise ValueError(f"shape mismatch at {path}: {arr.shape} vs {leaf_t.shape}")
        return arr.astype(leaf_t.dtype)

    rebuilt = jax.tree_util.tree_map_with_path(lambda p, l: cast(p, l), template)
    return rebuilt
