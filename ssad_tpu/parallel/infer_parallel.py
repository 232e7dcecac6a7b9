"""Data-parallel inference: shard the image batch over the 'data' axis.

The reference's inference path is strictly single-device (a Lightning
``Trainer.predict`` loop with ``devices=1``, tools.py:327); here
evaluation/scoring throughput scales with chips by sharding the batch
axis of the fused inference programs over a 1-D ('data',) mesh.
Weights and the normality bank are REPLICATED (≤50 MB + ≤2 MB — tiny
next to the activation traffic), so the compiled program contains **no
collectives at all**: each device scores its slice independently and
results concatenate on the host side of the jit boundary.

`jax.shard_map` (not bare jit over sharded inputs) is load-bearing:
the Pallas k-NN kernel (ops/knn.py) is a custom call that XLA's SPMD
partitioner cannot split, so under plain jit with a sharded batch the
partitioner would all-gather the queries and replicate the whole
kernel on every device.  Under shard_map each shard traces with its
LOCAL batch and runs the kernel on local rows only.

`ShardedEngine` duck-types `evaluation.inference.InferenceEngine`
(same four batch methods + `model`/`params`/`batch_stats`), so every
driver — `predict_mvtec`, `normality_embeddings`, the evaluator's
fused patch loop — runs data-parallel unchanged when handed one.
Batches that don't divide the mesh are zero-padded to the next
multiple and the padding rows dropped from the outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ssad_tpu.parallel.mesh import make_mesh


def data_mesh(
    n_data: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D ('model'=1, 'data'=N) mesh for batch-parallel inference."""
    return make_mesh(n_model=1, n_data=n_data, devices=devices)


def _pad_rows(x: jax.Array, multiple: int) -> Tuple[jax.Array, int]:
    n = x.shape[0]
    rem = n % multiple
    if rem == 0:
        return x, n
    pad = multiple - rem
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]), n


@dataclasses.dataclass
class ShardedEngine:
    """Batch-parallel wrapper around an `InferenceEngine`.

    Proxies the engine's interface so `predict_mvtec` /
    `normality_embeddings` / the evaluator's scoring loops work
    unchanged; only the four batch programs are re-wrapped with
    shard_map.  Grad-CAM (which reads `model`/`params`/`batch_stats`
    directly) stays single-device — it runs on ≤8 images per category.
    """

    engine: Any
    mesh: Mesh

    def __post_init__(self):
        if "data" not in self.mesh.axis_names:
            raise ValueError(f"mesh {self.mesh} has no 'data' axis")
        self.n_data = self.mesh.shape["data"]
        self._programs: dict = {}

    # -- proxied attributes --------------------------------------------------

    @property
    def model(self):
        return self.engine.model

    @property
    def params(self):
        return self.engine.params

    @property
    def batch_stats(self):
        return self.engine.batch_stats

    @property
    def _variables(self):
        return self.engine._variables

    # -- shard_map program cache ---------------------------------------------

    def _program(self, kind: str, *static) -> Any:
        """Build (once) the jitted shard_map program for `kind` at this
        static configuration.  Replicated operands use P(); the batch
        axis uses P('data').  The underlying traced functions are the
        engine's own (`.__wrapped__` of its jitted programs), so the
        single-device and sharded paths share one numerical definition.
        """
        key = (kind,) + static
        prog = self._programs.get(key)
        if prog is not None:
            return prog

        if kind == "forward":
            fwd = self.engine._forward.__wrapped__

            def local(variables, x):
                return fwd(variables, x)

            in_specs = (P(), P("data"))
            out_specs = (P("data"), P("data"))
        elif kind == "forward_patches":
            dim, stride = static
            fwd_p = self.engine._forward_patches.__wrapped__

            def local(variables, x):
                logits, emb, _ = fwd_p(variables, x, dim, stride)
                return logits, emb

            in_specs = (P(), P("data"))
            out_specs = (P("data"), P("data"))
        elif kind == "score_patches":
            dim, stride, k, upsample_to = static
            score = self.engine._score_patches.__wrapped__

            def local(variables, x, bank):
                return score(variables, x, bank, dim, stride, k, upsample_to)

            in_specs = (P(), P("data"), P())
            out_specs = P("data")
        elif kind == "score_patches_mahalanobis":
            dim, stride, upsample_to = static
            score = self.engine._score_patches_mahalanobis.__wrapped__

            def local(variables, x, mean, precision):
                return score(variables, x, mean, precision, dim, stride,
                             upsample_to)

            in_specs = (P(), P("data"), P(), P())
            out_specs = P("data")
        else:  # pragma: no cover - internal
            raise ValueError(kind)

        prog = jax.jit(
            jax.shard_map(
                local, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs
            )
        )
        self._programs[key] = prog
        return prog

    # -- InferenceEngine interface -------------------------------------------

    def predict_batch(self, x_normalized) -> Tuple[jax.Array, jax.Array]:
        x, n = _pad_rows(jnp.asarray(x_normalized), self.n_data)
        logits, emb = self._program("forward")(self.engine._variables, x)
        return logits[:n], emb[:n]

    def predict_patches(self, x_normalized, dim: int = 32, stride: int = 8):
        x, n = _pad_rows(jnp.asarray(x_normalized), self.n_data)
        logits, emb = self._program("forward_patches", dim, stride)(
            self.engine._variables, x
        )
        ppi = logits.shape[0] // x.shape[0]
        return logits[: n * ppi], emb[: n * ppi], ppi

    def score_patch_maps(
        self,
        x_normalized,
        bank,
        dim: int = 32,
        stride: int = 8,
        k: int = 3,
        upsample_to: Optional[int] = None,
    ) -> jax.Array:
        x, n = _pad_rows(jnp.asarray(x_normalized), self.n_data)
        maps = self._program("score_patches", dim, stride, k, upsample_to)(
            self.engine._variables, x, jnp.asarray(bank)
        )
        return maps[:n]

    def score_patch_maps_mahalanobis(
        self,
        x_normalized,
        mean,
        precision,
        dim: int = 32,
        stride: int = 8,
        upsample_to: Optional[int] = None,
    ) -> jax.Array:
        x, n = _pad_rows(jnp.asarray(x_normalized), self.n_data)
        maps = self._program("score_patches_mahalanobis", dim, stride, upsample_to)(
            self.engine._variables, x, jnp.asarray(mean), jnp.asarray(precision)
        )
        return maps[:n]


def maybe_shard_engine(
    engine,
    data_shards: Optional[int],
    devices: Optional[Sequence[jax.Device]] = None,
):
    """`engine` unchanged when data_shards is None/1, else a
    `ShardedEngine` over a fresh ('model'=1, 'data'=data_shards) mesh —
    the single decision point the CLI/evaluator route through."""
    if not data_shards or data_shards == 1:
        return engine
    n_dev = len(devices if devices is not None else jax.devices())
    if data_shards > n_dev:
        raise ValueError(
            f"data_shards={data_shards} exceeds {n_dev} available devices"
        )
    return ShardedEngine(engine, data_mesh(n_data=data_shards, devices=devices))
