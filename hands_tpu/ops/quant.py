"""W8A8 int8 quantisation primitives for serving.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 peak. The ViT path
exploits this inside the fused-block Pallas kernel
(``ops/vit_block_pallas.py`` — in-kernel dequant, because XLA-level int8
*dense* layers lose the gain to HBM dequant round-trips, BENCH_NOTES.md).
Convolutions are different: XLA lowers an int8 conv to the MXU's implicit
GEMM directly and fuses the per-channel dequant into the conv epilogue
(the following BatchNorm/ReLU), so a plain ``lax.conv_general_dilated``
with int8 operands is the right formulation — measured by
``scripts/conv_int8_probe.py``.

Scheme (the standard production-int8 recipe for CNNs):
- weights: per-output-channel symmetric scales, quantised from the f32
  params at apply time (XLA constant-folds this once per compile),
- activations: per-SAMPLE dynamic symmetric scales (convs never mix batch
  rows, so this is strictly more accurate than per-tensor at zero cost),
- accumulate int32, dequant by ``act_scale[n] * w_scale[c]``.

Lossy serving mode — off by default; enable via ``Config.quant_int8``.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def quantize_int8(x, axes=None, eps: float = 1e-8):
    """Symmetric int8 quantisation. Returns (q, scale) with
    ``x ~= q * scale``; ``axes`` are the reduction axes for the max-abs
    (None -> per-tensor)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes,
                   keepdims=False)
    scale = jnp.maximum(amax, eps) / 127.0
    shape = [1] * x.ndim
    if axes is not None:
        keep = [i for i in range(x.ndim) if i not in axes]
        for i in keep:
            shape[i] = x.shape[i]
    q = jnp.clip(jnp.round(x.astype(jnp.float32)
                           / scale.reshape(shape)), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv(x, kernel, strides, padding, out_dtype=jnp.float32):
    """W8A8 NHWC conv: int8 operands, int32 accumulate, fused dequant.

    ``kernel`` is the f32 HWIO parameter; quantisation of both operands
    happens here (weights constant-fold; the activation max-abs is one
    cheap reduction the VPU overlaps with the previous op).
    """
    # per-SAMPLE activation scales: a conv never mixes batch rows, so this
    # is strictly more accurate than per-tensor at zero extra cost (one
    # outlier image no longer coarsens everyone's quantisation grid)
    xq, sx = quantize_int8(x, axes=(1, 2, 3))
    wq, sw = quantize_int8(kernel, axes=(0, 1, 2))  # per-out-channel
    out = lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = sx[:, None, None, None] * sw[None, None, None, :]
    return (out.astype(jnp.float32) * scale).astype(out_dtype)


class Conv(nn.Conv):
    """Drop-in W8A8 serving twin of ``nn.Conv(use_bias=False)``.

    Subclasses ``nn.Conv`` and keeps the class name "Conv" ON PURPOSE:
    flax auto-names submodules by class name (``Conv_0``, ``Conv_1``, ...),
    so variable trees are byte-identical to the f32 model and any
    checkpoint (including converted torchvision weights,
    ``utils/torch_import.py``) loads into either module unchanged.
    Exported as ``Int8Conv``.
    """

    @nn.compact
    def __call__(self, x):
        assert not self.use_bias, "int8 serving conv is bias-free (ResNet)"
        assert self.feature_group_count == 1
        kernel_size = self.kernel_size
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * (x.ndim - 2)
        strides = self.strides or (1,) * len(kernel_size)
        if isinstance(strides, int):
            strides = (strides,) * len(kernel_size)
        kshape = (*kernel_size, x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kshape,
                            self.param_dtype)
        return int8_conv(x, kernel, strides, self.padding,
                         out_dtype=self.dtype or jnp.float32)


Int8Conv = Conv


def serving_conv_cls(quant_int8: bool):
    """The conv module class for a serving config: ``Int8Conv`` under
    ``Config.quant_int8``, plain ``nn.Conv`` otherwise."""
    return Int8Conv if quant_int8 else nn.Conv
