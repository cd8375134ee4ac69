"""Multi-head attention primitives (flax.linen).

Shapes are batch-first; masks are boolean with True meaning MASKED
(matching the torch ``attn_mask`` convention used by the reference
models) so converted checkpoints behave identically.

MXU notes: all projections are single fused matmuls; attention math is
done in float32 accumulation regardless of compute dtype.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def scaled_dot_attention(q, k, v, mask=None, dtype=jnp.float32):
    """q: (B, H, Lq, Dh), k/v: (B, H, Lk, Dh); mask True = masked out."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, jnp.finfo(jnp.float32).min, logits)
    weights = nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32)


class MultiHeadAttention(nn.Module):
    """Separate-source MHA: query vs key/value inputs.

    Parameter layout uses distinct q/k/v/out kernels; the torch packed
    ``in_proj_weight`` is split at conversion time (weights_convert.py).
    """

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,
        key,
        value,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
    ):
        B, Lq, D = query.shape
        Lk = key.shape[1]
        H = self.num_heads
        Dh = D // H

        dense = lambda name: nn.Dense(
            D, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(query).reshape(B, Lq, H, Dh).transpose(0, 2, 1, 3)
        k = dense("k_proj")(key).reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)
        v = dense("v_proj")(value).reshape(B, Lk, H, Dh).transpose(0, 2, 1, 3)

        mask = None
        if attn_mask is not None:
            # (Lq, Lk) or (B, Lq, Lk) -> (B|1, 1, Lq, Lk)
            m = attn_mask
            if m.ndim == 2:
                m = m[None, None, :, :]
            else:
                m = m[:, None, :, :]
            mask = m
        if key_padding_mask is not None:
            kp = key_padding_mask[:, None, None, :]  # (B, 1, 1, Lk)
            mask = kp if mask is None else jnp.logical_or(mask, kp)

        out = scaled_dot_attention(q, k, v, mask, dtype=self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, D).astype(self.dtype)
        return dense("out_proj")(out)


class Mlp(nn.Module):
    """Transformer MLP block (fc1 -> act -> fc2)."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1"
        )(x)
        if self.activation == "gelu":
            x = nn.gelu(x, approximate=False)
        elif self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "silu":
            x = nn.silu(x)
        else:
            raise ValueError(self.activation)
        return nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2"
        )(x)
