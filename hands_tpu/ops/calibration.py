"""Static int8 activation-scale calibration (VERDICT r3 #1).

The dynamic W8A8 fused block (``ops/vit_block_pallas.py``) computes a
per-token max-abs + rescale at each of its four quantisation points, in
kernel, every step — BENCH_NOTES identifies that traffic as the gap
between the measured int8 throughput and the int8 roofline. This module
replaces it with OFFLINE calibration:

1. run N representative batches through the plain bf16 path with
   ``quant_calibrate=True`` — each block sows per-CHANNEL activation
   maxima for its four quant points (qkv-in, proj-in, mlp1-in, mlp2-in)
   into the ``quant_stats`` collection (``models/backbones/vit.py``),
2. convert the running maxima to symmetric scales (amax/127, optional
   safety margin for unseen-data headroom),
3. inject them into the model's ``act_scale_*`` params
   (``Block.quant_static`` creates the slots), after which the serving
   path routes ``vit_block_fused_int8_static`` — in-kernel quantisation
   collapses to a bare round/clip/cast.

Per-channel granularity costs nothing at serving time: the scales are
absorbed into the LayerNorm params / weight matrices outside the kernel
(``fold_static_scales``).

No reference counterpart (the reference serves f32 torch,
``/root/reference/src/models/hamer_light/model.py``); the calibration
recipe itself is the standard production post-training-quantisation flow.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp

_POINTS = ("qkv", "proj", "mlp1", "mlp2")


def extract_amax(quant_stats: dict, backbone_path: Sequence[str] = ("backbone",)):
    """Pull the four per-block amax arrays out of a ``quant_stats``
    collection returned by an apply with ``mutable=["quant_stats"]``.

    Returns {point: (depth, channels) f32} for the scanned backbone
    layout, or stacked per-block arrays for the unrolled layout."""
    node = quant_stats
    for k in backbone_path:
        node = node[k]
    if "blocks" in node:  # nn.scan layout: already stacked (depth, C)
        blk = node["blocks"]["block"]
        return {
            "qkv": jnp.asarray(blk["amax_qkv"]),
            "proj": jnp.asarray(blk["attn"]["amax_proj"]),
            "mlp1": jnp.asarray(blk["amax_mlp1"]),
            "mlp2": jnp.asarray(blk["mlp"]["amax_mlp2"]),
        }
    # unrolled layout: block0..block{d-1}
    names = sorted((k for k in node if k.startswith("block")),
                   key=lambda s: int(s[5:]))
    return {
        "qkv": jnp.stack([node[n]["amax_qkv"] for n in names]),
        "proj": jnp.stack([node[n]["attn"]["amax_proj"] for n in names]),
        "mlp1": jnp.stack([node[n]["amax_mlp1"] for n in names]),
        "mlp2": jnp.stack([node[n]["mlp"]["amax_mlp2"] for n in names]),
    }


def amax_to_scales(amax: dict, margin: float = 1.0, eps: float = 1e-6):
    """Running maxima -> symmetric per-channel int8 scales (x ~= q * s).

    ``margin`` > 1 leaves headroom for activations outside the calibration
    set (they clip otherwise); 1.0 = exact calibration-set coverage."""
    return {k: jnp.maximum(jnp.asarray(v, jnp.float32) * margin, eps) / 127.0
            for k, v in amax.items()}


def merge_amax(a: dict | None, b: dict) -> dict:
    """Running-max merge across calibration batches."""
    if a is None:
        return {k: jnp.asarray(v) for k, v in b.items()}
    return {k: jnp.maximum(a[k], b[k]) for k in b}


def inject_scales(params: dict, scales: dict,
                  backbone_path: Sequence[str] = ("backbone",)) -> dict:
    """Return a copy of ``params`` with the backbone's ``act_scale_*``
    slots (created by ``Block.quant_static``) set to the calibrated
    values. Scanned layout: (depth, C) stacked arrays land directly on
    the stacked param slots."""
    def shallow(d):
        return {k: shallow(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    out = shallow(dict(params))  # copies the dict spine, shares the leaves
    node = out
    for k in backbone_path:
        node = node[k]
    if "blocks" in node:
        blk = node["blocks"]["block"]
        for p in _POINTS:
            want = blk[f"act_scale_{p}"].shape
            got = scales[p].shape
            assert want == got, (p, want, got)
            blk[f"act_scale_{p}"] = scales[p].astype(jnp.float32)
        return out
    names = sorted((k for k in node if k.startswith("block")),
                   key=lambda s: int(s[5:]))
    for i, n in enumerate(names):
        for p in _POINTS:
            node[n][f"act_scale_{p}"] = scales[p][i].astype(jnp.float32)
    return out


def calibrate(apply_fn: Callable, variables: dict, batches: Iterable,
              *, margin: float = 1.0,
              backbone_path: Sequence[str] = ("backbone",)) -> dict:
    """Full calibration loop.

    ``apply_fn(variables, batch) -> (out, mutated)`` must run the network
    with ``quant_calibrate=True`` and ``mutable=["quant_stats"]`` (e.g.
    ``lambda v, b: net.apply(v, b, train=False,
    mutable=["quant_stats"])``). Returns the params tree with calibrated
    ``act_scale_*`` injected."""
    amax = None
    for batch in batches:
        _, mutated = apply_fn(variables, batch)
        amax = merge_amax(amax, extract_amax(mutated["quant_stats"],
                                             backbone_path))
    assert amax is not None, "calibrate() needs at least one batch"
    scales = amax_to_scales(amax, margin=margin)
    return inject_scales(variables["params"], scales, backbone_path)
