"""Depth-packed DBNet binarize head (TPU).

The head upsamples the /4-resolution fused feature map to full page
resolution (reference yomitoku/models/dbnet_plus.py:200-230: ConvT 2x2/2
-> BN -> relu -> ConvT 2x2/2 -> sigmoid).  The XLA transposed-conv
lowering materializes the half- and full-resolution activations through
HBM and pays interleaved-write relayouts: measured 2.06 ms of the
8.9 ms detector forward at 1280x960.

A stride-2 2x2 transposed conv has no cross-pixel support:
``out[2i+a, 2j+b] = in[i, j] @ K[1-a, 1-b]`` (flax ConvTranspose applies
the spatially flipped kernel).  So the whole head is a per-/4-pixel
channel pipeline — two plain matmuls with BN/bias folded in — and the
natural TPU output is DEPTH-PACKED: (B, H/4, W/4, 16) where slot
``yo*4 + xo`` holds output pixel ``(4i+yo, 4j+xo)``.  Measured 0.68 ms.

The full-resolution interleave (depth-to-space) is deliberately NOT done
on device: every formulation (XLA transpose, Pallas kernel with strided
writes) costs 3-8 ms in lane-4 relayouts.  The host unpacks the 1.2 MB
uint8 map at memcpy speed instead (native.depth_to_space_u8, ~0.1 ms).
"""

import jax
import jax.numpy as jnp


def packed_binarize_head(x, w1, b1, w2, b2):
    """x: (B, H4, W4, C) -> (B, H4, W4, 16) sigmoid probabilities
    (float32), depth slot yo*4+xo = output pixel (4i+yo, 4j+xo).

    w1: (C, 4C) BN-folded first convT (column block ab = offset (a, b));
    b1: (4C,); w2: (4C, 16) second convT scattered to depth slots;
    b2: (16,).  Build them with ``pack_binarize_head_params``."""
    h = jnp.maximum(
        jnp.dot(x, w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32),
        0.0,
    ).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )
    return jax.nn.sigmoid(o)


def pack_binarize_head_params(
    k1, bias1, bn_scale, bn_bias, bn_mean, bn_var, k2, bias2, eps=1e-5,
    dtype=jnp.bfloat16,
):
    """Fold ConvT1 + FrozenBN into (w1, b1) and scatter ConvT2 into
    (w2, b2) for ``packed_binarize_head``.

    k1: (2, 2, C, C); bias1: (C,); bn_*: (C,); k2: (2, 2, C, 1);
    bias2: (1,).  flax ConvTranspose applies the spatially FLIPPED
    kernel, folded in here."""
    C = k1.shape[2]
    mul = bn_scale / jnp.sqrt(bn_var + eps)
    add = bn_bias - bn_mean * mul

    w1 = jnp.concatenate(
        [k1[1 - a, 1 - b] * mul[None, :] for a in (0, 1) for b in (0, 1)],
        axis=1,
    )  # (C, 4C), column block index ab = a*2+b
    b1 = jnp.tile(bias1 * mul + add, 4)

    w2 = jnp.zeros((4 * C, 16), jnp.float32)
    for a in (0, 1):
        for b in (0, 1):
            ab = a * 2 + b
            for c in (0, 1):
                for e in (0, 1):
                    slot = (2 * a + c) * 4 + (2 * b + e)
                    w2 = w2.at[ab * C:(ab + 1) * C, slot].set(
                        k2[1 - c, 1 - e, :, 0]
                    )
    b2 = jnp.broadcast_to(bias2[0], (16,))
    return (
        w1.astype(dtype), b1.astype(jnp.float32),
        w2.astype(dtype), b2.astype(jnp.float32),
    )


def depth_to_space(packed):
    """(B, H4, W4, 16) -> (B, 4*H4, 4*W4) in jnp (reference/tests; the
    production host path uses native.depth_to_space_u8)."""
    B, H4, W4, _ = packed.shape
    o = packed.reshape(B, H4, W4, 4, 4)
    return o.transpose(0, 1, 3, 2, 4).reshape(B, 4 * H4, 4 * W4)


def binarize_head_reference(x, k1, bias1, bn_scale, bn_bias, bn_mean,
                            bn_var, k2, bias2, eps=1e-5):
    """jnp reference: the unfused module pipeline (flax ConvTranspose
    semantics) for parity tests."""
    from flax import linen as nn

    up1 = nn.ConvTranspose(k1.shape[3], (2, 2), strides=(2, 2))
    h = up1.apply({"params": {"kernel": k1, "bias": bias1}}, x)
    mul = bn_scale / jnp.sqrt(bn_var + eps)
    add = bn_bias - bn_mean * mul
    h = jnp.maximum(h * mul + add, 0.0)
    up2 = nn.ConvTranspose(1, (2, 2), strides=(2, 2))
    o = up2.apply({"params": {"kernel": k2, "bias": bias2}}, h)
    return jax.nn.sigmoid(o[..., 0])
