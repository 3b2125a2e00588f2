"""Flax ResNet-18/50 backbones emitting spatial feature maps.

TPU-native counterpart of the reference's vendored torchvision ResNet
(``/root/reference/src/nets/backbone/resnet.py``: fc removed, forward stops
before global pooling and returns the 7x7 stage-5 map). Differences by
design, not translation:

- NHWC layout (TPU-preferred; XLA keeps convs in lane-major layout),
- compute dtype is configurable (bf16 on the MXU, fp32 params),
- BatchNorm runs in inference "frozen stats" or train mode via a flag;
  batch stats live in the standard flax ``batch_stats`` collection.

A torch-weight converter lives in ``hands_tpu/utils/torch_import.py`` so
torchvision-pretrained checkpoints can seed training, matching the
reference's ``pretrained=True`` behaviour without shipping torch at runtime.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    conv_cls: ModuleDef = nn.Conv

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        conv = partial(self.conv_cls, use_bias=False, dtype=self.dtype)
        norm = partial(self.norm, use_running_average=not train, dtype=self.dtype)

        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)])(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = norm(scale_init=nn.initializers.zeros)(y)

        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1),
                            strides=(self.strides, self.strides))(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    conv_cls: ModuleDef = nn.Conv

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        conv = partial(self.conv_cls, use_bias=False, dtype=self.dtype)
        norm = partial(self.norm, use_running_average=not train, dtype=self.dtype)

        y = conv(self.filters, (1, 1))(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)])(y)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1))(y)
        y = norm(scale_init=nn.initializers.zeros)(y)

        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1),
                            strides=(self.strides, self.strides))(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Spatial-feature ResNet: input (B, H, W, C) -> (B, H/32, W/32, C_out)."""

    stage_sizes: Sequence[int]
    block_cls: Callable
    dtype: Any = jnp.float32
    # W8A8 int8 serving convs (ops/quant.py) in every residual block; the
    # 7x7 stem (~2% of FLOPs) stays bf16/f32 for accuracy, the standard
    # int8-CNN recipe. Lossy + inference-only: Config.quant_int8.
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_stem")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        from hands_tpu.ops.quant import serving_conv_cls

        conv_cls = serving_conv_cls(self.quant_int8)
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    filters=64 * 2**i, strides=strides, dtype=self.dtype,
                    conv_cls=conv_cls, name=f"stage{i+1}_block{j}",
                )(x, train=train)
        return x  # spatial map; callers pool/flatten as needed


def resnet18(dtype=jnp.float32, name=None, quant_int8=False) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, dtype=dtype,
                  quant_int8=quant_int8, name=name)


def resnet50(dtype=jnp.float32, name=None, quant_int8=False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, dtype=dtype,
                  quant_int8=quant_int8, name=name)


BACKBONE_INFO = {
    "resnet18": {"n_output_channels": 512, "spatial_dim": 7},
    "resnet50": {"n_output_channels": 2048, "spatial_dim": 7},
    "vit_b_16": {"n_output_channels": 2048, "spatial_dim": 14},
    "vit_h": {"n_output_channels": 1280, "spatial_dim": None},
}
