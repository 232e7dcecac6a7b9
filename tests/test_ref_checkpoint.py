"""Reference-checkpoint import: full-model forward parity vs a torch oracle.

The strongest accuracy-parity evidence available without MVTec: a torch
reimplementation of the reference PeraNet (models.py:21-253 — torchvision
resnet18 backbone + concatenator + latent MLP + classifier, eval mode)
is loaded with the SAME random reference-layout state dict as the Flax
model via utils/ref_checkpoint.py, and their forward outputs (logits AND
embeddings) must match to f32 tolerance.  If the model function is
identical under shared weights, any accuracy difference on real data can
come only from data/training — not the network.

Also covered: Lightning-checkpoint load (state_dict + memory_bank +
hyper_parameters), bank ring-order roundtrip, and the import-ckpt CLI
producing a checkpoint every consumer can load.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from ssad_tpu.config import ModelConfig
from ssad_tpu.models.peranet import build_model, init_model
from ssad_tpu.train.memory_bank import newest_first
from ssad_tpu.utils.ref_checkpoint import (
    bank_from_rows,
    convert_peranet_state_dict,
    load_reference_checkpoint,
    model_config_from_hparams,
)
from ssad_tpu.utils.torch_weights import _cast_like


# --- torch oracle: the reference PeraNet, reimplemented ----------------------


class _TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock (conv-bn-relu-conv-bn + shortcut)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = tF.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return tF.relu(y + identity)


class _TorchResNet18(tnn.Module):
    """torchvision resnet18 layout/keys, returning (f4, {layer2, layer3})
    — the explicit equivalent of the reference's forward hooks
    (models.py:110-130)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
        for stage, (cin, cout) in enumerate(chans, start=1):
            stride = 1 if stage == 1 else 2
            setattr(
                self,
                f"layer{stage}",
                tnn.Sequential(
                    _TorchBasicBlock(cin, cout, stride), _TorchBasicBlock(cout, cout)
                ),
            )

    def forward(self, x):
        x = tF.max_pool2d(tF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.layer1(x)
        f2 = self.layer2(x)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        pooled = tF.adaptive_avg_pool2d(f4, (1, 1)).flatten(1)
        return pooled, {"layer2": f2, "layer3": f3}


class _TorchPeraNet(tnn.Module):
    """The reference model (models.py:58-99, forward :210-253), with
    state-dict keys identical to a real reference checkpoint."""

    def __init__(self, num_classes=4):
        super().__init__()
        self.feature_extractor = _TorchResNet18()
        self.concatenator = tnn.Sequential(
            tnn.Linear(896, 512, bias=False), tnn.BatchNorm1d(512)
        )
        blocks = [
            tnn.Sequential(
                tnn.Linear(512, 512, bias=False),
                tnn.BatchNorm1d(512),
                tnn.ReLU(inplace=True),
            )
            for _ in range(3)
        ]
        self.latent_space = tnn.Sequential(
            *blocks, tnn.Linear(512, 512, bias=True), tnn.BatchNorm1d(512)
        )
        self.classifier = tnn.Linear(512, num_classes)

    def forward(self, x):
        pooled, acts = self.feature_extractor(x)
        f2 = tF.adaptive_avg_pool2d(acts["layer2"], (1, 1)).flatten(1)
        f3 = tF.adaptive_avg_pool2d(acts["layer3"], (1, 1)).flatten(1)
        # concat order f2, f3, f4 (models.py:240-245)
        features = torch.cat([f2, f3, pooled], dim=1)
        emb = self.latent_space(self.concatenator(features))
        return self.classifier(emb), emb


def reference_state_dict(seed=0):
    """Random reference-layout PeraNet state dict with He-ish scaling so
    eval-mode activations stay finite through 18 conv layers, and
    non-trivial BN running stats so stats-loading is observable."""
    rng = np.random.default_rng(seed)
    sd = {}

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = t(rng.uniform(0.8, 1.2, c))
        sd[f"{prefix}.bias"] = t(rng.normal(0, 0.05, c))
        sd[f"{prefix}.running_mean"] = t(rng.normal(0, 0.1, c))
        sd[f"{prefix}.running_var"] = t(rng.uniform(0.5, 2.0, c))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    def add_conv(name, o, i, k):
        sd[f"{name}.weight"] = t(rng.normal(0, (i * k * k) ** -0.5, (o, i, k, k)))

    def add_linear(name, o, i, bias):
        sd[f"{name}.weight"] = t(rng.normal(0, i**-0.5, (o, i)))
        if bias:
            sd[f"{name}.bias"] = t(rng.normal(0, 0.05, o))

    pre = "feature_extractor"
    add_conv(f"{pre}.conv1", 64, 3, 7)
    add_bn(f"{pre}.bn1", 64)
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for stage, (cin, cout) in chans.items():
        for block in range(2):
            p = f"{pre}.layer{stage}.{block}"
            i = cin if block == 0 else cout
            add_conv(f"{p}.conv1", cout, i, 3)
            add_bn(f"{p}.bn1", cout)
            add_conv(f"{p}.conv2", cout, cout, 3)
            add_bn(f"{p}.bn2", cout)
            if stage > 1 and block == 0:
                add_conv(f"{p}.downsample.0", cout, i, 1)
                add_bn(f"{p}.downsample.1", cout)

    add_linear("concatenator.0", 512, 896, bias=False)
    add_bn("concatenator.1", 512)
    for i in range(3):
        add_linear(f"latent_space.{i}.0", 512, 512, bias=False)
        add_bn(f"latent_space.{i}.1", 512)
    add_linear("latent_space.3", 512, 512, bias=True)
    add_bn("latent_space.4", 512)
    add_linear("classifier", 4, 512, bias=True)
    return sd


def lightning_checkpoint(seed=0, bank_rows=7):
    rng = np.random.default_rng(seed + 1)
    return {
        "state_dict": reference_state_dict(seed),
        "memory_bank": torch.tensor(
            rng.normal(size=(bank_rows, 512)).astype(np.float32)
        ),
        "hyper_parameters": {
            "learning_rate": 0.005,
            "epochs": 30,
            "layer_outputs": ["layer2", "layer3"],
            "latent_space_layers": 5,
            "latent_space_layers_base_dim": 512,
            "num_classes": 4,
            "memory_bank_dim": 1000,
            "stage": "fine_tune",
        },
        "epoch": 29,
        "global_step": 300,
    }


class TestForwardParityVsTorchOracle:
    def test_logits_and_embeddings_match(self):
        sd = reference_state_dict()
        oracle = _TorchPeraNet()
        # strict load doubles as a structural check of the key layout
        oracle.load_state_dict({k: v for k, v in sd.items()})
        oracle.eval()

        cfg = ModelConfig(compute_dtype="float32")
        model = build_model(cfg)
        t_params, t_stats = init_model(model, jax.random.key(0), (1, 64, 64, 3))
        raw_p, raw_s = convert_peranet_state_dict(
            {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
        )
        params = _cast_like(t_params, raw_p)
        stats = _cast_like(t_stats, raw_s)

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            logits_t, emb_t = oracle(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        out = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
        # measured max abs err ~3e-7 (pure f32 accumulation-order noise)
        np.testing.assert_allclose(
            np.asarray(out["classifier"]), logits_t.numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["latent_space"]), emb_t.numpy(), rtol=1e-5, atol=1e-5
        )


class TestLightningCheckpointImport:
    def test_load_and_bank_order(self, tmp_path):
        ckpt = lightning_checkpoint(bank_rows=7)
        path = tmp_path / "best_model.ckpt"
        torch.save(ckpt, path)

        params, stats, bank, cfg = load_reference_checkpoint(str(path))
        assert cfg.num_classes == 4 and cfg.memory_bank_size == 1000
        assert cfg.backbone == "resnet18"
        assert bank is not None and int(bank.count) == 7
        # reference rows are oldest→newest; newest_first reverses them
        np.testing.assert_allclose(
            newest_first(bank), ckpt["memory_bank"].numpy()[::-1], atol=0
        )
        assert params["classifier"]["kernel"].shape == (512, 4)
        # head dtypes follow the template (f32), backbone follows config
        assert params["concatenator_dense"]["kernel"].dtype == np.float32

    def test_hparams_shape_the_config(self):
        cfg = model_config_from_hparams(
            {"num_classes": 3, "memory_bank_dim": 500, "latent_space_layers": 5}
        )
        assert cfg.num_classes == 3 and cfg.memory_bank_size == 500

    def test_tap_order_normalized_to_reference_concat_order(self):
        # the reference concatenates taps in fixed ascending order via
        # membership checks (models.py:240-245) regardless of hparams
        # list order — a permuted list must not permute concatenator rows
        cfg = model_config_from_hparams({"layer_outputs": ["layer3", "layer2"]})
        assert cfg.layer_outputs == ("layer2", "layer3")

    def test_unrepresentable_base_dim_raises_clearly(self):
        with pytest.raises(ValueError, match="base_dim"):
            model_config_from_hparams({"latent_space_layers_base_dim": 256})

    def test_missing_file_raises_file_not_found(self):
        # must NOT be converted into a misleading --allow-pickle hint
        with pytest.raises(FileNotFoundError):
            load_reference_checkpoint("/nonexistent/best_model.ckpt")

    def test_empty_bank_is_none(self, tmp_path):
        ckpt = lightning_checkpoint()
        ckpt["memory_bank"] = torch.tensor([])
        path = tmp_path / "m.ckpt"
        torch.save(ckpt, path)
        _, _, bank, _ = load_reference_checkpoint(str(path))
        assert bank is None

    def test_full_bank_ring_roundtrip(self):
        rows = np.arange(2000, dtype=np.float32).reshape(1000, 2)
        bank = bank_from_rows(rows, capacity=1000)
        assert int(bank.cursor) == 0 and int(bank.count) == 1000
        np.testing.assert_allclose(newest_first(bank), rows[::-1])


class TestImportCkptCLI:
    def test_import_then_engine_loads(self, tmp_path):
        from ssad_tpu import cli
        from ssad_tpu.evaluation.inference import load_engine

        path = tmp_path / "best_model.ckpt"
        torch.save(lightning_checkpoint(), path)
        rc = cli.main([
            "import-ckpt", "--ckpt", str(path),
            "--models-dir", str(tmp_path / "models"), "--subject", "bottle",
        ])
        assert rc == 0
        engine, bank, tcfg = load_engine(
            str(tmp_path / "models" / "bottle" / "best_model")
        )
        assert bank is not None and int(bank.count) == 7
        assert tcfg is not None and tcfg.model.backbone == "resnet18"
        logits, emb = engine.predict_batch(np.zeros((1, 64, 64, 3), np.float32))
        assert logits.shape == (1, 4) and emb.shape == (1, 512)
