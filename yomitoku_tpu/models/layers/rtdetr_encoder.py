"""RT-DETR HybridEncoder, NHWC flax.

Re-design of the reference rtdetr_hybrid_encoder.py:216: per-level 1x1
projections, one post-LN AIFI self-attention layer on the stride-32 level
with 2D sincos position embedding, then a CSPRep FPN (top-down) + PAN
(bottom-up) across the three levels.
"""

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import MultiHeadAttention
from .presnet import ConvNorm, _ACTS
from .resnet import FrozenBatchNorm


def sincos_pos_embed_2d(w: int, h: int, dim: int, temperature: float = 10000.0):
    """Reference build_2d_sincos_position_embedding
    (rtdetr_hybrid_encoder.py:346): [sin(w), cos(w), sin(h), cos(h)],
    w-major flattening to match NCHW flatten(2) token order (row-major in
    (h, w) — grid built with indexing='ij' over (w, h) then flattened)."""
    grid_w, grid_h = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij"
    )
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = grid_w.flatten()[:, None] * omega[None]
    out_h = grid_h.flatten()[:, None] * omega[None]
    pe = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )
    return pe[None]  # (1, w*h, dim)


class AIFILayer(nn.Module):
    """Post-LN transformer encoder layer; pos embed added to q and k only
    (reference TransformerEncoderLayer, rtdetr_hybrid_encoder.py:72)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos_embed):
        dt = self.dtype
        q = src + pos_embed
        h = MultiHeadAttention(self.d_model, self.nhead, dtype=dt, name="self_attn")(
            q, q, src
        )
        # epsilon pinned to torch nn.LayerNorm's 1e-5 (flax defaults to
        # 1e-6); the gap is O(1) when token variance collapses toward eps
        src = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                           name="norm1")(src + h)
        h = nn.Dense(self.dim_feedforward, dtype=dt, param_dtype=jnp.float32,
                     name="linear1")(src)
        h = _ACTS[self.act](h)
        h = nn.Dense(self.d_model, dtype=dt, param_dtype=jnp.float32,
                     name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                            name="norm2")(src + h)


class RepVggBlock(nn.Module):
    features: int
    act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvNorm(self.features, 3, 1, act=None, dtype=self.dtype, name="conv1")(x)
        y = y + ConvNorm(self.features, 1, 1, act=None, dtype=self.dtype, name="conv2")(x)
        return _ACTS[self.act](y)


class CSPRepLayer(nn.Module):
    features: int
    num_blocks: int = 3
    expansion: float = 1.0
    act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        dt = self.dtype
        x1 = ConvNorm(hidden, 1, 1, act=self.act, dtype=dt, name="conv1")(x)
        for i in range(self.num_blocks):
            x1 = RepVggBlock(hidden, act=self.act, dtype=dt, name=f"bottlenecks_{i}")(x1)
        x2 = ConvNorm(hidden, 1, 1, act=self.act, dtype=dt, name="conv2")(x)
        out = x1 + x2
        if hidden != self.features:
            out = ConvNorm(self.features, 1, 1, act=self.act, dtype=dt, name="conv3")(out)
        return out


def _upsample_nearest_2x(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class HybridEncoder(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    feat_strides: Sequence[int] = (8, 16, 32)
    hidden_dim: int = 256
    use_encoder_idx: Sequence[int] = (2,)
    num_encoder_layers: int = 1
    nhead: int = 8
    dim_feedforward: int = 1024
    enc_act: str = "gelu"
    expansion: float = 1.0
    depth_mult: float = 1.0
    act: str = "silu"
    pe_temperature: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        dt = self.dtype
        d = self.hidden_dim
        nlev = len(self.in_channels)
        proj = []
        for i, f in enumerate(feats):
            p = nn.Conv(
                d, (1, 1), use_bias=False, dtype=dt, param_dtype=jnp.float32,
                name=f"input_proj_{i}_conv",
            )(f)
            p = FrozenBatchNorm(d, dtype=dt, name=f"input_proj_{i}_norm")(p)
            proj.append(p)

        # AIFI self-attention on selected levels (stride-32 by default)
        for k, idx in enumerate(self.use_encoder_idx):
            B, H, W, C = proj[idx].shape
            src = proj[idx].reshape(B, H * W, C)
            pe = jnp.asarray(
                sincos_pos_embed_2d(W, H, d, self.pe_temperature), dt
            )
            for li in range(self.num_encoder_layers):
                src = AIFILayer(
                    d, self.nhead, self.dim_feedforward, act=self.enc_act,
                    dtype=dt, name=f"encoder_{k}_layer_{li}",
                )(src, pe)
            proj[idx] = src.reshape(B, H, W, C)

        # top-down FPN
        nblocks = round(3 * self.depth_mult)
        inner = [proj[-1]]
        for i, idx in enumerate(range(nlev - 1, 0, -1)):
            high = ConvNorm(
                d, 1, 1, act=self.act, dtype=dt, name=f"lateral_convs_{i}"
            )(inner[0])
            inner[0] = high
            up = _upsample_nearest_2x(high)
            fused = CSPRepLayer(
                d, nblocks, self.expansion, act=self.act, dtype=dt,
                name=f"fpn_blocks_{i}",
            )(jnp.concatenate([up, proj[idx - 1]], axis=-1))
            inner.insert(0, fused)

        # bottom-up PAN
        outs = [inner[0]]
        for i in range(nlev - 1):
            down = ConvNorm(
                d, 3, 2, act=self.act, dtype=dt, name=f"downsample_convs_{i}"
            )(outs[-1])
            fused = CSPRepLayer(
                d, nblocks, self.expansion, act=self.act, dtype=dt,
                name=f"pan_blocks_{i}",
            )(jnp.concatenate([down, inner[i + 1]], axis=-1))
            outs.append(fused)
        return outs
