"""Import a trained reference PyTorch-Lightning checkpoint (PeraNet).

`utils/torch_weights.py` converts torchvision *backbone* state dicts
(ImageNet initialization).  This module imports a FULL reference
training artifact — the Lightning `best_model.ckpt` that
`tools.training` saves (tools.py:304-306) and every reference consumer
loads (tools.py:322, evaluator.py:236, localizer.py:95) — so a user of
the reference can bring an already-trained model and evaluate/serve it
here without retraining.

A reference checkpoint is a torch pickle with:
  state_dict        feature_extractor.* (torchvision resnet18),
                    concatenator.{0,1}.*, latent_space.{i}.{0,1}.* for
                    the ReLU blocks + latent_space.{n}.* /
                    latent_space.{n+1}.* for the projection Linear+BN,
                    classifier.*            (models.py:58-99, :132-146)
  memory_bank       (R, 512) CPU tensor, oldest→newest rows
                    (on_save_checkpoint, models.py:199-200)
  hyper_parameters  PeraNet.__init__ kwargs (save_hyperparameters,
                    models.py:33)

Layer mapping (torch → this framework's PeraNet, models/peranet.py):
  concatenator.0        → concatenator_dense   (weight (O,I) → kernel (I,O))
  concatenator.1        → concatenator_bn      (+ running stats)
  latent_space.i.0 / .1 → latent_{i}_dense / latent_{i}_bn
  latent_space.n        → latent_out_dense     (the only biased Linear)
  latent_space.n+1      → latent_out_bn
  classifier            → classifier
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ssad_tpu.config import ModelConfig
from ssad_tpu.train.memory_bank import MemoryBank
from ssad_tpu.utils.torch_weights import _cast_like, convert_resnet_state_dict


def convert_peranet_state_dict(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Reference PeraNet state_dict → (params, batch_stats) trees
    matching models/peranet.PeraNet (unconstrained dtypes; callers cast
    with a template via `_cast_like`)."""
    sd = {k: np.asarray(v) for k, v in sd.items() if "num_batches" not in k}

    bb_sd = {
        k[len("feature_extractor."):]: v
        for k, v in sd.items()
        if k.startswith("feature_extractor.")
    }
    if not bb_sd:
        raise ValueError(
            "no feature_extractor.* keys — not a reference PeraNet state_dict "
            "(for a bare torchvision backbone use utils/torch_weights.py)"
        )
    bb_params, bb_stats = convert_resnet_state_dict(bb_sd)
    params: dict = {"backbone": bb_params}
    stats: dict = {"backbone": bb_stats}

    def dense(prefix: str) -> dict:
        out = {"kernel": sd[f"{prefix}.weight"].T}  # (O, I) → (I, O)
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def bn(prefix: str) -> Tuple[dict, dict]:
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
        )

    params["concatenator_dense"] = dense("concatenator.0")
    params["concatenator_bn"], stats["concatenator_bn"] = bn("concatenator.1")

    # ReLU blocks are nested Sequentials: latent_space.{i}.0 = Linear,
    # .{i}.1 = BN (models.py:65-80); the projection Linear + BN sit flat
    # at the next two indices (models.py:81-83)
    block_idx = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(r"latent_space\.(\d+)\.0\.weight", k))
    )
    if block_idx != list(range(len(block_idx))):
        raise ValueError(f"unexpected latent_space block layout: {block_idx}")
    for i in block_idx:
        params[f"latent_{i}_dense"] = dense(f"latent_space.{i}.0")
        params[f"latent_{i}_bn"], stats[f"latent_{i}_bn"] = bn(f"latent_space.{i}.1")
    n = len(block_idx)
    params["latent_out_dense"] = dense(f"latent_space.{n}")
    params["latent_out_bn"], stats["latent_out_bn"] = bn(f"latent_space.{n + 1}")

    params["classifier"] = dense("classifier")
    return params, stats


def bank_from_rows(rows: np.ndarray, capacity: int = 1000) -> MemoryBank:
    """Reference memory-bank tensor (oldest→newest rows, models.py:280-282)
    → ring-buffer MemoryBank whose `newest_first` view matches."""
    import jax.numpy as jnp

    rows = np.asarray(rows, np.float32)
    r = rows.shape[0]
    cap = max(capacity, r)
    data = np.zeros((cap, rows.shape[1] if rows.ndim == 2 else 512), np.float32)
    if r:
        data[:r] = rows
    return MemoryBank(
        data=jnp.asarray(data),
        cursor=jnp.asarray(r % cap, jnp.int32),
        count=jnp.asarray(r, jnp.int32),
    )


def model_config_from_hparams(hparams: Optional[Dict[str, Any]]) -> ModelConfig:
    """hyper_parameters (models.py:21-33) → ModelConfig.  The converted
    head runs in f32 (the reference trains in fp16-autocast but stores
    f32 weights); the backbone keeps the product bf16 compute dtype."""
    hp = dict(hparams or {})
    base_dim = int(hp.get("latent_space_layers_base_dim", 512))
    if base_dim != 512:
        raise ValueError(
            f"latent_space_layers_base_dim={base_dim}: the reference always "
            "projects the latent MLP to a fixed 512-d embedding "
            "(models.py:137 overrides last_dim=512) while ModelConfig uses "
            "one latent_dim for both hidden and embedding width — a "
            "checkpoint with base_dim != 512 can't be represented here"
        )
    # The reference concatenates taps in FIXED ascending layer order via
    # membership checks (models.py:240-245), ignoring the list order in
    # hparams — normalize so the concatenator weight rows line up.
    taps = tuple(sorted(set(hp.get("layer_outputs", ("layer2", "layer3")))))
    return ModelConfig(
        backbone="resnet18",  # hardcoded in the reference (models.py:35)
        layer_outputs=taps,
        latent_space_layers=int(hp.get("latent_space_layers", 5)),
        latent_dim=base_dim,
        num_classes=int(hp.get("num_classes", 4)),
        memory_bank_size=int(hp.get("memory_bank_dim", 1000)),
    )


def load_reference_checkpoint(
    path: str, allow_pickle: bool = False
) -> Tuple[dict, dict, Optional[MemoryBank], ModelConfig]:
    """Load a reference `best_model.ckpt` → (params, batch_stats,
    bank_or_None, ModelConfig), ready for `checkpoint.save_checkpoint`.

    Tries `torch.load(weights_only=True)` first; Lightning checkpoints
    sometimes carry non-tensor objects (hparams AttributeDict) that the
    safe loader rejects — pass ``allow_pickle=True`` to permit full
    unpickling of a checkpoint you trust.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except OSError:
        raise  # missing/unreadable file — not an unpickling problem
    except Exception as e:
        if not allow_pickle:
            raise ValueError(
                f"safe load of {path} failed ({type(e).__name__}: {e}); if "
                "this is a Lightning checkpoint carrying non-tensor objects, "
                "re-run with allow_pickle=True / --allow-pickle if you trust "
                "the file"
            ) from e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" not in ckpt:
        raise ValueError(f"{path} has no 'state_dict' — not a Lightning checkpoint")

    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in ckpt["state_dict"].items()}
    cfg = model_config_from_hparams(ckpt.get("hyper_parameters"))
    raw_params, raw_stats = convert_peranet_state_dict(sd)

    # cast/validate against a shape/dtype template of the configured
    # model — eval_shape, not a real init: _cast_like only reads leaf
    # shape/dtype, and a concrete init on this host would pay a tunneled
    # TPU compile for pure host-side conversion work.
    import jax
    import jax.numpy as jnp

    from ssad_tpu.models.peranet import build_model

    model = build_model(cfg)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
        )
    )
    t_params, t_stats = variables["params"], variables["batch_stats"]
    params = _cast_like(t_params, raw_params)
    batch_stats = _cast_like(t_stats, raw_stats)

    bank = None
    mb = ckpt.get("memory_bank")
    if mb is not None:
        mb = mb.numpy() if hasattr(mb, "numpy") else np.asarray(mb)
        if mb.ndim == 2 and mb.shape[0] > 0:
            bank = bank_from_rows(mb, capacity=cfg.memory_bank_size)
    return params, batch_stats, bank, cfg
