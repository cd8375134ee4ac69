"""Multi-head attention primitives (flax.linen).

Shapes are batch-first; masks are boolean with True meaning MASKED
(matching the torch ``attn_mask`` convention used by the reference
models) so converted checkpoints behave identically.

MXU notes: all projections are single fused matmuls; attention math is
done in float32 accumulation regardless of compute dtype.  The module
exposes split ``project_*`` / ``attend`` methods so autoregressive
decoders can hoist loop-invariant K/V projections out of the decode loop
(the reference recomputes them per token, yomitoku/models/parseq.py:160).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _use_fused(q, k, mask) -> bool:
    """Fused Pallas attention: unmasked, TPU, and fits in VMEM."""
    import os

    import jax

    if mask is not None or os.environ.get("YOMITOKU_TPU_NO_FLASH"):
        return False
    if jax.default_backend() != "tpu":
        return False
    Lq, Dh = q.shape[-2], q.shape[-1]
    Lk = k.shape[-2]
    # Lq >= 16: single-/few-query attends (the AR decode step) are cheaper
    # as plain XLA ops than as a pallas_call per loop iteration.
    # Lk % 8: Mosaic miscompiles some unaligned sublane shapes.
    return Dh <= 128 and 16 <= Lq <= 1024 and Lk <= 1024 and Lk % 8 == 0


def _use_fused_block(x, num_heads) -> bool:
    """Whole-block fused kernel (self-attention only, q is k is v)."""
    import os

    import jax

    if os.environ.get("YOMITOKU_TPU_NO_FLASH"):
        return False
    if jax.default_backend() != "tpu":
        return False
    L, D = x.shape[-2], x.shape[-1]
    # L 8-aligned (Mosaic sublane constraint), weights must fit VMEM
    return (
        D // num_heads <= 128
        and 16 <= L <= 1024
        and L % 8 == 0
        and D <= 1024
    )


def _use_fused_packed(query, key, num_heads) -> bool:
    """Head-packed fused kernel eligibility ((B, L, D) layout inputs)."""
    import os

    import jax

    if os.environ.get("YOMITOKU_TPU_NO_FLASH"):
        return False
    if jax.default_backend() != "tpu":
        return False
    Lq, D = query.shape[-2], query.shape[-1]
    Lk = key.shape[-2]
    # Lk must stay 8-aligned (Mosaic miscompiles some unaligned sublane
    # shapes; the kernel pads Lq itself, but padded KEYS would need
    # masking, so unaligned-Lk shapes use the XLA path instead).
    return (
        D // num_heads <= 128
        and 16 <= Lq <= 1024
        and Lk <= 1024
        and Lk % 8 == 0
    )


def use_int8_encoder() -> bool:
    """W8A8 encoder sublayer kernels.  Opt-in via
    YOMITOKU_TPU_INT8_ENCODER=1 — and likely to stay that way: despite
    the int8 MXU's 2x rate (measured 239 TOP/s standalone), the b128
    recognizer only improves 99 -> 89 ms (encoder 71 -> 61 ms) because
    the bf16 attention math, LayerNorms, and in-kernel activation
    quantization don't shrink; and accuracy against the real pretrained
    checkpoints is unverifiable in this offline environment.  Note the
    weights re-quantize inside every jitted forward (~0.2 ms/batch of
    elementwise work) — if this path ever graduates, quantize once at
    parameter placement instead."""
    import os

    import jax

    return (
        os.environ.get("YOMITOKU_TPU_INT8_ENCODER") == "1"
        and jax.default_backend() == "tpu"
    )


def layer_norm(x, scale, bias, eps, dtype):
    """LayerNorm with linen semantics (float32 statistics, fast
    variance): used by the pre-LN fused sublayers and their fallback so
    both paths share one definition."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (
        y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    ).astype(dtype)


def scaled_dot_attention(q, k, v, mask=None, dtype=jnp.float32):
    """q: (B, H, Lq, Dh), k/v: (B, H, Lk, Dh); mask True = masked out."""
    scale = q.shape[-1] ** -0.5
    if _use_fused(q, k, mask):
        from ...ops.pallas.flash_attention import fused_attention

        return fused_attention(q, k, v, scale=scale).astype(dtype)
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

    def setup(self):
        # Raw-param holders with nn.Dense's tree layout ("q_proj/kernel"
        # etc.) so the fused-block Pallas kernel can consume the arrays
        # directly; _dense() reproduces nn.Dense(dtype=...) semantics.
        self.q_proj = _DenseParams(self.embed_dim, self.embed_dim,
                                   name="q_proj")
        self.k_proj = _DenseParams(self.embed_dim, self.embed_dim,
                                   name="k_proj")
        self.v_proj = _DenseParams(self.embed_dim, self.embed_dim,
                                   name="v_proj")
        self.out_proj = _DenseParams(self.embed_dim, self.embed_dim,
                                     name="out_proj")

    def _dense(self, holder, x):
        k, b = holder()
        return jnp.dot(x.astype(self.dtype), k.astype(self.dtype)) + b.astype(
            self.dtype
        )

    def _split(self, x):
        B, L, D = x.shape
        H = self.num_heads
        return x.reshape(B, L, H, D // H).transpose(0, 2, 1, 3)

    # -- split API (for cached AR decoding) ------------------------------

    def project_q(self, query):
        """(B, Lq, D) -> (B, H, Lq, Dh)."""
        return self._split(self._dense(self.q_proj, query))

    def project_kv(self, key, value):
        """(B, Lk, D) x2 -> ((B, H, Lk, Dh), (B, H, Lk, Dh))."""
        return (
            self._split(self._dense(self.k_proj, key)),
            self._split(self._dense(self.v_proj, value)),
        )

    def attend(self, q, k, v, mask: Optional[jnp.ndarray] = None):
        """Heads-split inputs; mask broadcastable to (B, H, Lq, Lk)."""
        out = scaled_dot_attention(q, k, v, mask, dtype=self.dtype)
        B, H, Lq, Dh = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H * Dh).astype(self.dtype)
        return self._dense(self.out_proj, out)

    def attend_int8(self, q, kq, sk, vq, sv, mask: Optional[jnp.ndarray] = None):
        """Attend against an int8-quantized K/V cache
        (``quantize_kv_int8``): built for the PARSeq AR decode loop,
        whose per-step floor is the HBM read of the K/V caches
        (~200 MB/step at batch 128 in bf16) — int8 halves that traffic;
        dequantization is an in-register upconvert fused into the int8
        loads, so the caches stay int8 in HBM.

        Scale granularity is dispatched on shape: per-(batch, head)
        scales (B, H, 1, 1) fold into the tiny query BEFORE the QK^T
        matmul — measured ~1.5x faster per decode step than per-row
        scaling, whose post-matmul logits multiply breaks XLA's fused
        matmul->softmax->matmul chain; per-row scales (B, H, L) apply to
        logits / softmax weights and are available where the extra
        accuracy matters.  ``mask`` broadcastable to (B, H, Lq, Lk),
        True = masked."""
        scale = q.shape[-1] ** -0.5
        per_head = sk.ndim == 4
        if per_head:
            qs = (q.astype(jnp.float32) * (sk * scale)).astype(self.dtype)
        else:
            qs = q.astype(self.dtype)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, kq.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if not per_head:
            logits = logits * (sk[:, :, None, :] * scale)
        if mask is not None:
            logits = jnp.where(mask, jnp.finfo(jnp.float32).min, logits)
        weights = nn.softmax(logits, axis=-1)
        if not per_head:
            weights = weights * sv[:, :, None, :]
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights.astype(self.dtype),
            vq.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if per_head:
            out = out * sv
        B, H, Lq, Dh = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, H * Dh).astype(self.dtype)
        return self._dense(self.out_proj, out)

    # -- fused entry ------------------------------------------------------

    def __call__(
        self,
        query,
        key,
        value,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        pre_ln: Optional[tuple] = None,
    ):
        if pre_ln is not None:
            # Pre-LN sublayer contract: return x + attn(LayerNorm(x)).
            # Folding LN + residual into the fused block kernel removes
            # two (B, L, D) activation round-trips through HBM.
            g, b, eps = pre_ln
            if (
                attn_mask is None
                and key_padding_mask is None
                and query is key
                and key is value
                and _use_fused_block(query, self.num_heads)
            ):
                wq, bq = self.q_proj()
                wk, bk = self.k_proj()
                wv, bv = self.v_proj()
                wo, bo = self.out_proj()
                dt = self.dtype
                if use_int8_encoder():
                    from ...ops.pallas.flash_attention import (
                        fused_attention_block_ln_int8,
                    )
                    from ...ops.pallas.fused_mlp import quantize_weight_int8

                    qw = [quantize_weight_int8(w) for w in (wq, wk, wv, wo)]
                    return fused_attention_block_ln_int8(
                        query.astype(dt), g, b,
                        qw[0][0], qw[0][1], bq,
                        qw[1][0], qw[1][1], bk,
                        qw[2][0], qw[2][1], bv,
                        qw[3][0], qw[3][1], bo,
                        self.num_heads, eps=eps,
                    )
                from ...ops.pallas.flash_attention import (
                    fused_attention_block_ln,
                )

                return fused_attention_block_ln(
                    query.astype(dt), g, b,
                    wq.astype(dt), bq.astype(dt),
                    wk.astype(dt), bk.astype(dt),
                    wv.astype(dt), bv.astype(dt),
                    wo.astype(dt), bo.astype(dt),
                    self.num_heads, eps=eps,
                )
            h = layer_norm(query, g, b, eps, self.dtype)
            k2 = h if key is query else key
            v2 = h if value is query else value
            return query + self(h, k2, v2, attn_mask, key_padding_mask)

        if (
            attn_mask is None
            and key_padding_mask is None
            and query is key
            and key is value
            and _use_fused_block(query, self.num_heads)
        ):
            # Whole-block fused kernel: QKV projections + per-head
            # attention + output projection, one pallas_call.
            from ...ops.pallas.flash_attention import fused_attention_block

            wq, bq = self.q_proj()
            wk, bk = self.k_proj()
            wv, bv = self.v_proj()
            wo, bo = self.out_proj()
            dt = self.dtype
            return fused_attention_block(
                query.astype(dt),
                wq.astype(dt), bq.astype(dt),
                wk.astype(dt), bk.astype(dt),
                wv.astype(dt), bv.astype(dt),
                wo.astype(dt), bo.astype(dt),
                self.num_heads,
            )

        if (
            attn_mask is None
            and key_padding_mask is None
            and _use_fused_packed(query, key, self.num_heads)
        ):
            # Head-packed fused kernel: no (B, L, H, Dh) transposes at all.
            from ...ops.pallas.flash_attention import fused_attention_heads

            out = fused_attention_heads(
                self._dense(self.q_proj, query),
                self._dense(self.k_proj, key),
                self._dense(self.v_proj, value),
                self.num_heads,
            )
            return self._dense(self.out_proj, out)

        q = self.project_q(query)
        k, v = self.project_kv(key, value)

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

        return self.attend(q, k, v, mask)


def quantize_kv_int8(k, v, per_row=False):
    """Symmetric int8 quantization of a K/V pair ((B, H, L, Dh) each) ->
    (kq, sk, vq, sv).  Default: per-(batch, head) float32 scales of
    shape (B, H, 1, 1), which ``attend_int8`` folds into the query
    before the QK^T matmul (the fast form — see its docstring).  With
    ``per_row``: scales (B, H, L), more accurate, applied post-matmul.
    Caches quantized once at build/append time."""

    def q8(x):
        axes = (-1,) if per_row else (2, 3)
        s = (
            jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
            / 127.0
        )
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        return q, (s[..., 0] if per_row else s)

    kq, sk = q8(k)
    vq, sv = q8(v)
    return kq, sk, vq, sv


class _LNParams(nn.Module):
    """Raw scale/bias with nn.LayerNorm's param tree layout — lets the
    pre-LN fused sublayer kernels consume the arrays directly while
    checkpoints keep the exact "norm1/scale" etc. paths."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return s, b


class _DenseParams(nn.Module):
    """Raw kernel/bias with nn.Dense's param tree layout — lets the fused
    Pallas MLP consume the arrays directly while checkpoints keep the
    exact "fc1/kernel" etc. paths."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), jnp.float32
        )
        return k, b


def _use_fused_mlp(x, hidden_dim) -> bool:
    import os

    import jax

    if os.environ.get("YOMITOKU_TPU_NO_FUSED_MLP"):
        return False
    if jax.default_backend() != "tpu":
        return False
    n = 1
    for d in x.shape[:-1]:
        n *= d
    # small batches don't amortize the kernel; odd dims fall back
    return n >= 1024 and n % 8 == 0 and hidden_dim % 128 == 0


class Mlp(nn.Module):
    """Transformer MLP block (fc1 -> act -> fc2).

    On TPU the exact-GELU path runs as a fused Pallas kernel (hidden
    activations stay in VMEM; ~157 vs ~116 TFLOP/s at the PARSeq encoder
    shapes); other activations / small batches use plain XLA."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, pre_ln: Optional[tuple] = None):
        d_in = x.shape[-1]
        if self.activation == "gelu" and _use_fused_mlp(x, self.hidden_dim):
            w1, b1 = _DenseParams(d_in, self.hidden_dim, name="fc1")()
            w2, b2 = _DenseParams(self.hidden_dim, self.out_dim, name="fc2")()
            lead = x.shape[:-1]
            if pre_ln is not None:
                # Pre-LN sublayer: x + mlp(LayerNorm(x)), LN + residual
                # folded into the kernel (x tile stays VMEM-resident).
                g, b, eps = pre_ln
                if use_int8_encoder():
                    from ...ops.pallas.fused_mlp import (
                        fused_mlp_ln_int8,
                        quantize_weight_int8,
                    )

                    w1q, s1 = quantize_weight_int8(w1)
                    w2q, s2 = quantize_weight_int8(w2)
                    out = fused_mlp_ln_int8(
                        x.reshape(-1, d_in), g, b,
                        w1q, s1, b1, w2q, s2, b2, eps=eps,
                    )
                    return out.reshape(*lead, self.out_dim)
                from ...ops.pallas.fused_mlp import fused_mlp_ln

                out = fused_mlp_ln(
                    x.reshape(-1, d_in), g, b,
                    w1.astype(self.dtype),
                    b1.astype(self.dtype),
                    w2.astype(self.dtype),
                    b2.astype(self.dtype),
                    eps=eps,
                )
                return out.reshape(*lead, self.out_dim)
            from ...ops.pallas.fused_mlp import fused_mlp

            out = fused_mlp(
                x.reshape(-1, d_in),
                w1.astype(self.dtype),
                b1.astype(self.dtype),
                w2.astype(self.dtype),
                b2.astype(self.dtype),
            )
            return out.reshape(*lead, self.out_dim)

        residual = None
        if pre_ln is not None:
            residual = x
            g, b, eps = pre_ln
            x = layer_norm(x, g, b, eps, self.dtype)
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
        out = nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2"
        )(x)
        return out if residual is None else residual + out
