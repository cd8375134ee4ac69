"""ViT encoder for PARSeq text recognition.

Functional re-design of the reference encoder (a timm VisionTransformer,
yomitoku/models/layers/parseq_transformer.py:172-207): patch-embed conv,
learned position embedding, no class token, pre-LN blocks, final LayerNorm.
NHWC input layout (TPU-native).
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .attention import Mlp, MultiHeadAttention, _LNParams


class PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        ph, pw = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(ph, pw),
            strides=(ph, pw),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(x)
        B, Hp, Wp, D = x.shape
        # row-major (H-major) token order; grid kept for pos-embed slicing
        return x.reshape(B, Hp * Wp, D), (Hp, Wp)


class EncoderBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Pre-LN sublayers with LN + residual folded into the fused
        # attention-block / MLP kernels (pre_ln contract: the submodule
        # returns x + sublayer(LayerNorm(x))).  Param tree matches the
        # previous nn.LayerNorm layout ("norm1/scale" etc.).
        g1, b1 = _LNParams(self.embed_dim, name="norm1")()
        g2, b2 = _LNParams(self.embed_dim, name="norm2")()
        x = MultiHeadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype, name="attn"
        )(x, x, x, pre_ln=(g1, b1, 1e-6))
        return Mlp(
            int(self.embed_dim * self.mlp_ratio),
            self.embed_dim,
            dtype=self.dtype,
            name="mlp",
        )(x, pre_ln=(g2, b2, 1e-6))


class ViTEncoder(nn.Module):
    img_size: Sequence[int]
    patch_size: Sequence[int]
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) -> (B, N, D)
        x, (hp, wp) = PatchEmbed(
            self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed"
        )(x)
        hp_full = self.img_size[0] // self.patch_size[0]
        wp_full = self.img_size[1] // self.patch_size[1]
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, hp_full * wp_full, self.embed_dim),
            jnp.float32,
        )
        if (hp, wp) != (hp_full, wp_full):
            # narrower/shorter input (recognizer width buckets): take the
            # top-left sub-grid of the learned position embedding — token
            # (i, j) keeps its trained embedding
            pe = pos_embed.reshape(1, hp_full, wp_full, self.embed_dim)
            pos_embed = pe[:, :hp, :wp].reshape(1, hp * wp, self.embed_dim)
        x = x + pos_embed.astype(self.dtype)
        for i in range(self.depth):
            x = EncoderBlock(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        return nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="norm"
        )(x)
