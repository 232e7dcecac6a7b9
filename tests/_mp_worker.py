"""Worker for test_multiprocess.py: one controller process of a global
('model','data') mesh over 8 CPU devices.

Invoked as:  python _mp_worker.py <proc_id> <n_proc> <port> <out_json>

With n_proc=2 each process provisions 4 virtual CPU devices and joins a
shared coordinator (`jax.distributed.initialize`) — the global mesh is
2×4 across process boundaries, with Gloo cross-process collectives.
With n_proc=1 the same script is the single-process 8-device reference.
Process 0 writes the step metrics + updated classifier weights to
out_json so the test can assert the two topologies agree.
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]
n_local = 8 // n_proc

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_local}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ssad_tpu.parallel import distributed as dist  # noqa: E402

if n_proc > 1:
    dist.initialize(f"localhost:{port}", n_proc, proc_id)
assert jax.device_count() == 8, jax.devices()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ssad_tpu.config import DataConfig, ModelConfig, OptimConfig, TrainConfig  # noqa: E402
from ssad_tpu.data.masks import pack_coords  # noqa: E402
from ssad_tpu.data.mvtec import PretextData  # noqa: E402
from ssad_tpu.data.synthetic import SynthSpec  # noqa: E402
from ssad_tpu.parallel.category_parallel import (  # noqa: E402
    make_multi_category_step,
    stack_category_data,
)
from ssad_tpu.parallel.mesh import make_mesh  # noqa: E402

h = w = 64
mask = np.zeros((h, w), np.uint8)
mask[8:-8, 8:-8] = 1
coords, count = pack_coords(mask)


def make_data(seed: int) -> PretextData:
    r = np.random.default_rng(seed)
    imgs = r.random((4, h, w, 3)).astype(np.float32)
    return PretextData(
        subject="bottle", imsize=(h, w), train_images=imgs,
        val_images=imgs[:2], cut_pool=imgs[:2],
        fixed_mask=mask.astype(np.float32), fixed_coords=coords,
        fixed_count=count,
    )


cfg = TrainConfig(
    data=DataConfig(imsize=(h, w), batch_size=8),
    model=ModelConfig(memory_bank_size=32, compute_dtype="float32"),
    optim=OptimConfig(),
)
spec = SynthSpec(subject="bottle", imsize=(h, w))
mesh = make_mesh(n_model=2)
assert dict(mesh.shape) == {"model": 2, "data": 4}

data = stack_category_data([make_data(1), make_data(2)], mesh)
init_fn, step_fn = make_multi_category_step(cfg, spec, mesh, stage="fine_tune")
state = init_fn(jax.random.key(0))
keys = dist.make_stacked_keys(2, mesh)(jax.random.key(7))
state, metrics = step_fn(state, keys, data, jnp.asarray(False))
m = dist.to_host(metrics)
kernel = dist.to_host(state.params["classifier"]["kernel"])

if proc_id == 0:
    with open(out_path, "w") as f:
        json.dump(
            {
                "processes": n_proc,
                "metrics": np.asarray(m).tolist(),
                "kernel": np.asarray(kernel).ravel().tolist(),
            },
            f,
        )
print(f"worker {proc_id}/{n_proc} done", flush=True)
