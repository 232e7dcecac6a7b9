"""ResNet-18 backbone, TPU-native (NHWC, bf16-friendly, no hooks).

The reference wraps torchvision's resnet18 and captures intermediate
activations with forward hooks (models.py:58-62, :110-130).  Hooks are
an imperative-graph idiom; here the apply function simply *returns* the
multi-scale feature maps — functional, jit-friendly, and explicit.

Layout is NHWC (channels-last): the TPU vector lane dimension maps to
the trailing axis, and XLA's convolution emitters prefer NHWC on TPU.
A converter for torchvision IMAGENET1K_V1 checkpoints (NCHW/OIHW) lives
in utils/torch_weights.py.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class StemConv(nn.Module):
    """The 7×7/stride-2 stem conv, with an exact folded variant for
    nearest-×2-upsampled inputs.

    The reference nearest-upsamples sub-64px inputs to 64 before the
    backbone (models.py:218-219); for 32×32 patches that makes conv1 run
    a 7×7/s2 kernel over a 4×-materialized image.  Because nearest ×2
    followed by stride-2 convolution reads each source pixel through a
    fixed tap pattern, the same output is one 4×4/stride-1 conv on the
    ORIGINAL 32×32 input with pairwise-summed weights
    (w' = [w0, w1+w2, w3+w4, w5+w6] per spatial axis) and asymmetric
    (2,1) padding — 3× fewer stem MACs and no 4× activation
    materialization.  Exact in real arithmetic; equivalence is tested to
    f32 tolerance (tests/test_models.py::TestFoldedStem).

    Param path is ``conv1/kernel`` — identical to the nn.Conv it
    replaces, so checkpoints and the torchvision converter are
    unaffected.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fold_2x: bool = False, s2d: bool = False):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, self.features),
            jnp.float32,
        )
        if fold_2x:
            def fold_rows(w):
                return jnp.stack(
                    [w[0], w[1] + w[2], w[3] + w[4], w[5] + w[6]], axis=0
                )

            k = fold_rows(kernel)
            k = jnp.stack(
                [k[:, 0], k[:, 1] + k[:, 2], k[:, 3] + k[:, 4], k[:, 5] + k[:, 6]],
                axis=1,
            )
            strides, padding = (1, 1), [(2, 1), (2, 1)]
        elif s2d:
            # space-to-depth stem (the MLPerf-ResNet TPU trick): 2×2
            # blocks fold the stride into the layout, so the 7×7/s2 conv
            # over (H, W, 3) becomes an EXACT-equivalent 4×4/s1 conv over
            # (H/2, W/2, 12).  MXU angle: the implicit-GEMM reduction
            # length goes 147 → 192 (one zero tap row/col), but the
            # stride-2 gather pattern disappears and the input layout is
            # channel-denser; measured on the fused train step either
            # way (bench.py "train_step_s2d_ms").  The (α, β, c) channel
            # layout lives ONCE in ops/stem_pool.s2d_image — the kernel
            # fold below and stem_pool.s2d_conv_kernel both assume it.
            from ssad_tpu.ops.stem_pool import s2d_image

            x = s2d_image(x)
            # tap u = a − 4 for padded row index a ∈ 0..7 (u = −4 is the
            # zero tap); a = 2·kr + dr splits into block kr and sub-pixel
            # dr, matching the (dr, dc, c) channel order of the reshape
            w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k = (
                w8.reshape(4, 2, 4, 2, 3, self.features)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 4 * 3, self.features)
            )
            strides, padding = (1, 1), [(2, 1), (2, 1)]
        else:
            k = kernel
            strides, padding = (2, 2), [(3, 3), (3, 3)]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    """Two 3×3 convs + identity/projection shortcut (ResNet v1 basic)."""

    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        residual = x
        y = nn.Conv(
            self.filters, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), strides=(1, 1),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)
        if residual.shape[-1] != self.filters or self.strides != 1:
            residual = nn.Conv(
                self.filters, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    """1×1 reduce → 3×3 (stride) → 1×1 expand(×4) + shortcut (ResNet v1
    bottleneck; `width` is torchvision's base_width-scaled inner width —
    wide_resnet50_2 uses width = 2·filters)."""

    filters: int
    width: int
    strides: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        out_ch = self.filters * self.expansion
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.width, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet v1 returning pooled features + the multi-scale taps.

    __call__ returns (pooled (B, C4), feats dict with 'layer1'..'layer4'
    NHWC maps) — the explicit-return equivalent of the reference's
    forward hooks on layer2/layer3 (models.py:123-129).

    block: 'basic' (ResNet-18/34) or 'bottleneck' (ResNet-50 family);
    width_factor scales the bottleneck inner width (2 = wide_resnet50_2).

    setup-style (not @nn.compact) so `forward_stages` is separately
    applyable: the fused Pallas stem (ops/stem_pool.py) computes
    conv1+bn1+relu+maxpool outside the module and re-enters here.
    Parameter names are identical to the previous compact layout
    (conv1 / bn1 / layer{stage}_{block}) — checkpoints and the
    torchvision converter are unaffected.
    """

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_filters: Sequence[int] = (64, 128, 256, 512)
    block: str = "basic"
    width_factor: int = 1

    def setup(self):
        self.conv1 = StemConv(features=64, dtype=self.dtype, name="conv1")
        self.bn1 = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1"
        )
        blocks = []
        for stage, (num_blocks, filters) in enumerate(
            zip(self.stage_sizes, self.stage_filters), start=1
        ):
            for block in range(num_blocks):
                strides = 2 if stage > 1 and block == 0 else 1
                name = f"layer{stage}_{block}"
                if self.block == "basic":
                    blocks.append(
                        BasicBlock(
                            filters, strides=strides, dtype=self.dtype, name=name
                        )
                    )
                else:
                    blocks.append(
                        BottleneckBlock(
                            filters, width=filters * self.width_factor,
                            strides=strides, dtype=self.dtype, name=name,
                        )
                    )
        self.blocks = blocks

    def forward_stages(
        self, x, train: bool = True
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """layer1..layer4 + global pool from the post-maxpool stem
        output — the re-entry point for the fused external stem."""
        x = x.astype(self.dtype)
        feats: Dict[str, jax.Array] = {}
        i = 0
        for stage, num_blocks in enumerate(self.stage_sizes, start=1):
            for _ in range(num_blocks):
                x = self.blocks[i](x, train=train)
                i += 1
            feats[f"layer{stage}"] = x
        pooled = jnp.mean(x, axis=(1, 2))  # global average pool
        return pooled.astype(jnp.float32), feats

    def __call__(
        self, x, train: bool = True, stem_fold_2x: bool = False,
        stem_s2d: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        x = x.astype(self.dtype)
        x = self.conv1(x, fold_2x=stem_fold_2x, s2d=stem_s2d)
        x = self.bn1(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return self.forward_stages(x, train=train)


def ResNet18(dtype: Any = jnp.float32, name: str = "backbone") -> ResNet:
    return ResNet(dtype=dtype, name=name)


def ResNet34(dtype: Any = jnp.float32, name: str = "backbone") -> ResNet:
    """torchvision resnet34: basic blocks at (3, 4, 6, 3) depths — the
    deeper sibling of the reference's resnet18 (models.py:58) with the
    SAME tap widths (128/256/512), so the PeraNet head is unchanged."""
    return ResNet(dtype=dtype, stage_sizes=(3, 4, 6, 3), name=name)


def ResNet50(dtype: Any = jnp.float32, name: str = "backbone") -> ResNet:
    """torchvision resnet50: bottleneck (3,4,6,3) at standard inner
    width — the same 512/1024/2048 tap widths as wide_resnet50_2 (only
    the blocks' INNER 3×3 width differs), so the PeraNet head adapts
    identically.  The common torchvision feature extractor between the
    reference's resnet18 (models.py:58) and the PatchCore-style wide
    variant."""
    return ResNet(
        dtype=dtype, stage_sizes=(3, 4, 6, 3), block="bottleneck",
        width_factor=1, name=name,
    )


def WideResNet50_2(dtype: Any = jnp.float32, name: str = "backbone") -> ResNet:
    """torchvision wide_resnet50_2: bottleneck (3,4,6,3), inner width 2×
    — the PatchCore-style feature extractor (BASELINE.json config 4)."""
    return ResNet(
        dtype=dtype, stage_sizes=(3, 4, 6, 3), block="bottleneck",
        width_factor=2, name=name,
    )


def make_backbone(arch: str, dtype: Any = jnp.float32, name: str = "backbone") -> ResNet:
    if arch == "resnet18":
        return ResNet18(dtype=dtype, name=name)
    if arch == "resnet34":
        return ResNet34(dtype=dtype, name=name)
    if arch == "resnet50":
        return ResNet50(dtype=dtype, name=name)
    if arch in ("wide_resnet50_2", "wide_resnet50"):
        return WideResNet50_2(dtype=dtype, name=name)
    raise ValueError(
        f"unknown backbone '{arch}' "
        "(resnet18 | resnet34 | resnet50 | wide_resnet50_2)"
    )
