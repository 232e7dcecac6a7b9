"""Multi-device serving: replica-per-device parallel scoring.

TPU-first rationale: anomaly scoring is embarrassingly parallel across
images, and no weight or activation in this model family outgrows one
chip (wide_resnet50_2 is ~270 MB of f32 — far under a v5e's 16 GB HBM).
SPMD-sharding a serving batch across chips would therefore buy nothing
and cost collectives, plus a fused program whose latency is gated by
the slowest chip.  The TPU-right multi-chip design is N independent
replicas of the SAME exported program, one per local device, each
executing its own micro-batches: per-request latency stays at the
single-chip number, throughput scales ~linearly with chips, and zero
ICI traffic is generated.  (Contrast training, parallel/mesh.py, where
gradients genuinely couple devices and collectives earn their keep.
The reference has no serving path at all — its inference is a
single-device Lightning predict loop, /root/reference/src/tools.py:310-390.)

Mechanically: `Exported.call` carries the weights/bank/threshold as
program constants, so a replica is just the shared jitted callable with
its input batch committed to a specific device via `jax.device_put(x,
dev)` — computation follows data, and the constants materialize on
that device at first execution.  Each placement compiles its own
executable, which is why every replica is warmed separately before
traffic (cli serve does this).

`BatchingScorer` (serving/server.py) accepts the replica list directly:
one collector keeps the batching policy in a single place and a runner
thread per replica keeps up to N batches in flight.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np


def pick_devices(n: Optional[int]) -> list:
    """First `n` local devices; n in (0, None) means all of them."""
    devs = jax.local_devices()
    if n in (0, None):
        return devs
    if n < 0 or n > len(devs):
        raise ValueError(
            f"asked for {n} devices but {len(devs)} are attached "
            f"({[str(d) for d in devs]})"
        )
    return devs[: n]


class DeviceReplica:
    """One device-pinned view of a deserialized artifact.

    Callable on a full (batch, H, W, 3) float32 array — the fixed-batch
    contract `BatchingScorer` feeds — returning host numpy arrays.
    """

    def __init__(self, scorer, device):
        self.device = device
        self.batch = scorer.batch
        self.imsize = tuple(scorer.meta["imsize"])
        self._call = scorer._call

    def __call__(self, x: np.ndarray) -> tuple:
        xb = jax.device_put(np.asarray(x, np.float32), self.device)
        return tuple(np.asarray(r) for r in self._call(xb))

    def warmup(self, max_calls: int = 16, settled_s: float = 0.25) -> float:
        """Compile + settle THIS device's executable (each placement is
        its own compilation; see module docstring)."""
        from ssad_tpu.serving.export import warm_call

        h, w = self.imsize
        x = jax.device_put(
            np.zeros((self.batch, h, w, 3), np.float32), self.device
        )
        return warm_call(self._call, x, max_calls=max_calls, settled_s=settled_s)

    def __repr__(self) -> str:  # shows up in serve logs
        return f"DeviceReplica({self.device}, batch={self.batch})"


def device_replicas(scorer, devices: Sequence) -> List[DeviceReplica]:
    """One DeviceReplica of `scorer` (serving/export.py ServedScorer)
    per device, sharing the deserialized program."""
    return [DeviceReplica(scorer, d) for d in devices]
