"""JAX ResNet (18/34/50/101/152) for the visual branch.

TPU-native equivalent of the torchvision backbone used by the reference
(models/bert_model.py:63-111).  NHWC layout (TPU-friendly); weights convert
from torchvision ``.pth`` state dicts via
:func:`mtvaf_tpu.core.convert.resnet_params_from_torch`.

The backbone is frozen during training (reference modules/train.py:485-486),
so BatchNorm always runs in inference mode with stored running statistics and
the multi-scale stage features can be precomputed once per image
(``Config.cache_prefix_features``).

``resnet_stage_guides`` reproduces ``get_resnet_prompt``: tap the 4 residual
stages, average-pool each to 2×2 (reference models/bert_model.py:101-111),
and pack them in the exact channel-major order the reference's
``torch.cat(...).view(bsz, 4, -1)`` produces (models/bert_model.py:383) so
converted checkpoints stay bit-compatible.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

BLOCK_COUNTS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BOTTLENECK = {18: False, 34: False, 50: True, 101: True, 152: True}


def _conv(params, x, stride: int = 1):
    # torch-style symmetric padding ((k-1)//2 both sides); XLA "SAME" pads
    # asymmetrically at stride 2 and would shift every strided conv.
    kh, kw = params["kernel"].shape[:2]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    return jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype), window_strides=(stride, stride),
        padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(params, x, eps: float = 1e-5):
    scale = params["scale"] * jax.lax.rsqrt(params["var"] + eps)
    bias = params["bias"] - params["mean"] * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _max_pool(x, window: int, stride: int, padding: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))


def _avg_pool(x, window: int, stride: int):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        "VALID")
    return summed / (window * window)


def _basic_block(bp: Dict, x, stride: int):
    out = jax.nn.relu(_bn(bp["bn1"], _conv(bp["conv1"], x, stride)))
    out = _bn(bp["bn2"], _conv(bp["conv2"], out))
    shortcut = x
    if "downsample" in bp:
        shortcut = _bn(bp["downsample"]["bn"],
                       _conv(bp["downsample"]["conv"], x, stride))
    return jax.nn.relu(out + shortcut)


def _bottleneck_block(bp: Dict, x, stride: int):
    out = jax.nn.relu(_bn(bp["bn1"], _conv(bp["conv1"], x)))
    out = jax.nn.relu(_bn(bp["bn2"], _conv(bp["conv2"], out, stride)))
    out = _bn(bp["bn3"], _conv(bp["conv3"], out))
    shortcut = x
    if "downsample" in bp:
        shortcut = _bn(bp["downsample"]["bn"],
                       _conv(bp["downsample"]["conv"], x, stride))
    return jax.nn.relu(out + shortcut)


def resnet_stages(params: Dict, images, *, depth: int) -> List[jnp.ndarray]:
    """images (B, 224, 224, 3) NHWC → list of 4 stage feature maps."""
    block_fn = _bottleneck_block if BOTTLENECK[depth] else _basic_block
    # Stem: 7x7/2 conv (torch pads 3), BN, relu, 3x3/2 maxpool (pad 1).
    x = jax.lax.conv_general_dilated(
        images, params["conv1"]["kernel"].astype(images.dtype),
        window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.nn.relu(_bn(params["bn1"], x))
    x = _max_pool(x, 3, 2, 1)

    outs = []
    for stage_idx, blocks in enumerate(params["stages"]):
        stride = 1 if stage_idx == 0 else 2
        for b_idx, bp in enumerate(blocks):
            x = block_fn(bp, x, stride if b_idx == 0 else 1)
        outs.append(x)
    return outs


def resnet_stage_guides(params: Dict, images, *, depth: int) -> jnp.ndarray:
    """``get_resnet_prompt`` + the reference's cat/view packing.

    Returns (B, 4, C_total) where C_total = 3840 (r50/101/152) or 960
    (r18/34), laid out channel-major exactly like
    ``torch.cat([s1,s2,s3,s4], dim=1).view(B, 4, -1)``
    (reference models/bert_model.py:101-111,383).
    """
    stages = resnet_stages(params, images, depth=depth)
    pooled = []
    for x in stages:
        ft = x.shape[1]
        kernel = ft // 2
        p = _avg_pool(x, kernel, kernel)           # (B, 2, 2, C)
        pooled.append(jnp.transpose(p, (0, 3, 1, 2)))  # (B, C, 2, 2)
    cat = jnp.concatenate(pooled, axis=1)          # (B, C_total, 2, 2)
    b = cat.shape[0]
    return cat.reshape(b, 4, -1)                   # channel-major regroup


def init_resnet_params(rng, depth: int = 50) -> Dict:
    """Random init (tests / training-from-scratch); production path loads
    torchvision weights via core.convert."""
    counts = BLOCK_COUNTS[depth]
    bottleneck = BOTTLENECK[depth]
    widths = (64, 128, 256, 512)
    exp = 4 if bottleneck else 1

    def conv_init(key, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return {"kernel": jax.random.normal(key, (kh, kw, cin, cout))
                * jnp.sqrt(2.0 / fan_in)}

    def bn_init(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    keys = iter(jax.random.split(rng, 2048))
    params = {"conv1": conv_init(next(keys), 7, 7, 3, 64), "bn1": bn_init(64),
              "stages": []}
    in_c = 64
    for stage_idx, n_blocks in enumerate(counts):
        w = widths[stage_idx]
        out_c = w * exp
        blocks = []
        for b in range(n_blocks):
            stride_block = (stage_idx > 0 and b == 0)
            if bottleneck:
                block = {
                    "conv1": conv_init(next(keys), 1, 1, in_c, w),
                    "bn1": bn_init(w),
                    "conv2": conv_init(next(keys), 3, 3, w, w),
                    "bn2": bn_init(w),
                    "conv3": conv_init(next(keys), 1, 1, w, out_c),
                    "bn3": bn_init(out_c),
                }
            else:
                block = {
                    "conv1": conv_init(next(keys), 3, 3, in_c, w),
                    "bn1": bn_init(w),
                    "conv2": conv_init(next(keys), 3, 3, w, w),
                    "bn2": bn_init(w),
                }
            if b == 0 and (stride_block or in_c != out_c):
                block["downsample"] = {
                    "conv": conv_init(next(keys), 1, 1, in_c, out_c),
                    "bn": bn_init(out_c),
                }
            blocks.append(block)
            in_c = out_c
        params["stages"].append(blocks)
    return params
