"""Weight-only int8 quantization for serving artifacts.

The reference has no deployment story (SURVEY §2; its only inference
path is a live Lightning predict loop, tools.py:310-390), so this is a
rebuild-only capability, sized for TPU serving fleets: a ResNet-18
image scorer shrinks ~50 MB (f32) → ~13 MB, Wide-ResNet-50-2 ~270 MB →
~69 MB — artifact distribution and cold-start, not arithmetic, are
what int8 buys here (compute stays bf16 on the MXU).

Scheme: symmetric per-output-channel int8 on every weight tensor with
≥2 axes (conv HWIO kernels, dense IO kernels) —

    scale[c] = max(|w[..., c]|) / 127          (float32, one per column)
    q[..., c] = round(w[..., c] / scale[c])    (int8)

1-D leaves (BN scale/bias/running stats, biases) and non-float leaves
stay untouched: they are tiny and BN affine precision matters.  The
dequantize (`q.astype(f32) * scale → bf16`) happens INSIDE the traced
scoring program, so the int8 tensors are what `jax.export` bakes as
constants; XLA folds the per-channel multiply into the conv/dense
operand's producer fusion at compile time.

Fidelity: per-channel weight-only int8 on BN-ed CNNs is the standard
lossless-in-practice setting (each output channel's scale error is a
per-channel affine the following BN absorbs); `tests/test_serving.py`
pins int8-vs-f32 score agreement and label equality on a trained model.

The quantized weights travel as an opaque flat handle (leaf list +
per-leaf scales + treedef) rather than two parallel pytrees: ``None``
scales would be empty *nodes*, not leaves, in a pytree, breaking
structure alignment.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


#: leaves with fewer axes than this stay unquantized (BN params, biases)
_MIN_QUANT_NDIM = 2


class QuantizedTree(NamedTuple):
    """Flat quantized weight container (closure constant for export)."""

    leaves: Sequence[jax.Array]          # int8 where quantized, else original
    scales: Sequence[Optional[jax.Array]]  # f32 (1,...,1,C) or None
    treedef: Any


def _is_quantizable(x) -> bool:
    return (
        hasattr(x, "ndim")
        and x.ndim >= _MIN_QUANT_NDIM
        and jnp.issubdtype(jnp.result_type(x), jnp.floating)
    )


def quantize_tree(variables: Any) -> QuantizedTree:
    """Per-output-channel symmetric int8 of every ≥2-D float leaf."""
    flat, treedef = jax.tree_util.tree_flatten(variables)
    leaves, scales = [], []
    for x in flat:
        if not _is_quantizable(x):
            leaves.append(jnp.asarray(x))
            scales.append(None)
            continue
        w = jnp.asarray(x, jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = jnp.maximum(amax, jnp.finfo(jnp.float32).tiny) / 127.0
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        leaves.append(q)
        scales.append(scale)
    return QuantizedTree(leaves, scales, treedef)


def dequantize_tree(qt: QuantizedTree, dtype=jnp.bfloat16) -> Any:
    """Rebuild the float weight tree.  Call INSIDE the traced program:
    the int8 leaves then serialize as int8 constants and the multiply
    compiles into each weight-consumer's fusion.  Unquantized leaves
    pass through unchanged."""
    outs = [
        q if s is None else (q.astype(jnp.float32) * s).astype(dtype)
        for q, s in zip(qt.leaves, qt.scales)
    ]
    return jax.tree_util.tree_unflatten(qt.treedef, outs)
