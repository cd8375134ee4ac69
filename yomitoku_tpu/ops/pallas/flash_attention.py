"""Fused multi-head attention Pallas kernel (TPU).

Why: XLA cannot fuse matmul -> softmax -> matmul, so unfused attention
materializes the (B, H, Lq, Lk) float32 logits in HBM twice (write +
read) per softmax stage.  For the PARSeq ViT encoder (B=128, H=12,
L=400) that is ~4 GB of HBM round-trips per block — the encoder measured
47 GB accessed for 9.6 TFLOP of work, i.e. bandwidth-bound at 41% MXU
utilization.

Shapes in this framework are small enough (L <= 512, Dh <= 128) that the
entire per-(batch, head) attention fits in VMEM, so no online-softmax
tiling is needed: one grid program per (batch*head) computes
QK^T -> masked softmax -> PV entirely on-chip.  float32 logits and
accumulation; inputs/outputs in the caller's dtype (bf16 in production).

Used by the ViT encoder self-attention, the PARSeq refine-pass cross
attention, and the RT-DETR AIFI / decoder self-attentions (all unmasked
or key-padding-only).  Reference semantics: torch
F.multi_head_attention_forward as used by yomitoku's encoders
(yomitoku/models/layers/parseq_transformer.py:172,
 yomitoku/models/layers/rtdetr_hybrid_encoder.py:33).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    logits = (
        jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        w.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(q, k, v, scale=None, interpret=False):
    """Unmasked scaled-dot attention: softmax(q k^T * scale) v.

    q: (B, H, Lq, Dh); k, v: (B, H, Lk, Dh) -> (B, H, Lq, Dh).
    float32 logits/accumulation regardless of input dtype.  No host- or
    HBM-side padding: Mosaic pads unaligned blocks inside VMEM for free
    (an earlier version padded Dh 64->128 and L 400->512 in HBM, which
    re-introduced ~800 MB/block of bandwidth — the very thing the kernel
    exists to remove).
    """
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = Dh ** -0.5

    qp = q.reshape(B * H, Lq, Dh)
    kp = k.reshape(B * H, Lk, Dh)
    vp = v.reshape(B * H, Lk, Dh)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, Dh), q.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Lq, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, Dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, Lq, Dh)


def _attn_heads_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, scale):
    """One program per batch item; loop heads with static lane slices."""
    D = q_ref.shape[-1]
    Dh = D // num_heads
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = (
            jax.lax.dot_general(
                q[:, sl], k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        o_ref[0, :, sl] = jnp.dot(
            w.astype(v_ref.dtype), v_ref[0, :, sl],
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def fused_attention_heads(q, k, v, num_heads, scale=None, interpret=False):
    """Attention on head-packed layout: q (B, Lq, H*Dh), k/v (B, Lk, H*Dh)
    -> (B, Lq, H*Dh).

    One grid program per batch item computes every head (static lane
    slices inside the kernel), so the caller needs NO (B, L, H, Dh)
    transpose on either side.  That matters: the transpose+reshape pair
    around a plain attention poisons downstream layouts ({2,0,1}
    activations), which made each following LayerNorm fusion ~12x slower
    than bandwidth.
    """
    B, Lq, D = q.shape
    Lk = k.shape[1]
    if scale is None:
        scale = (D // num_heads) ** -0.5

    # Mosaic miscompiles some non-8-aligned sublane shapes (observed
    # internal error at Lq=Lk=101, Dh=96).  Padding the query axis is
    # semantically free (extra rows attend real keys and are sliced off);
    # callers must keep Lk 8-aligned (_use_fused_packed gates this).
    lq_pad = (-Lq) % 8
    if lq_pad:
        q = jnp.pad(q, ((0, 0), (0, lq_pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _attn_heads_kernel, num_heads=num_heads, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq + lq_pad, D), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Lq + lq_pad, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq + lq_pad, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v)
    return out[:, :Lq] if lq_pad else out


def _attn_block_kernel(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    o_ref, *, num_heads, scale,
):
    """One grid program per batch item: qkv projections + per-head
    attention + out projection, all in VMEM."""
    x = x_ref[0]  # (L, D)

    def proj(w_ref, b_ref):
        return (
            jax.lax.dot_general(
                x, w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ref[:].astype(jnp.float32)
        ).astype(x.dtype)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    D = x.shape[-1]
    Dh = D // num_heads
    outs = []
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        logits = (
            jax.lax.dot_general(
                q[:, sl].astype(jnp.float32), k[:, sl].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        outs.append(
            jnp.dot(
                w.astype(v.dtype), v[:, sl],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    attn = jnp.concatenate(outs, axis=1)  # (L, D)
    o_ref[0] = (
        jax.lax.dot_general(
            attn, wo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def fused_attention_block(
    x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, scale=None, interpret=False,
):
    """Self-attention block: out = attn(x Wq, x Wk, x Wv) Wo + bo.

    x: (B, L, D); weights (D, D), biases (D,).  One grid program per
    batch item keeps q/k/v/logits entirely in VMEM — the unfused path
    round-trips each projection and the attention output through HBM.
    Caller guarantees L % 8 == 0 (Mosaic sublane constraint)."""
    B, L, D = x.shape
    if scale is None:
        scale = (D // num_heads) ** -0.5

    bs = [b.reshape(1, D) for b in (bq, bk, bv, bo)]
    w_spec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _attn_block_kernel, num_heads=num_heads, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec, b_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wq, bs[0], wk, bs[1], wv, bs[2], wo, bs[3])


def _attn_block_ln_kernel(
    x_ref, g_ref, bn_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, o_ref, *, num_heads, scale, eps,
):
    """Pre-LN transformer attention sublayer, one grid program per batch
    item: out = x + attn_block(LayerNorm(x)).  Folding the LayerNorm and
    the residual add into the kernel removes two full (B, L, D)
    activation round-trips through HBM per encoder block."""
    xf = x_ref[0].astype(jnp.float32)  # (L, D)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = (
        h * g_ref[:].astype(jnp.float32) + bn_ref[:].astype(jnp.float32)
    ).astype(x_ref.dtype)

    def proj(w_ref, b_ref):
        return (
            jax.lax.dot_general(
                h, w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ref[:].astype(jnp.float32)
        ).astype(x_ref.dtype)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    D = xf.shape[-1]
    Dh = D // num_heads
    outs = []
    for hd in range(num_heads):
        sl = slice(hd * Dh, (hd + 1) * Dh)
        logits = (
            jax.lax.dot_general(
                q[:, sl].astype(jnp.float32), k[:, sl].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        outs.append(
            jnp.dot(
                w.astype(v.dtype), v[:, sl],
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)
        )
    attn = jnp.concatenate(outs, axis=1)  # (L, D)
    out = (
        jax.lax.dot_general(
            attn, wo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:].astype(jnp.float32)
    )
    o_ref[0] = (xf + out).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "eps", "interpret")
)
def fused_attention_block_ln(
    x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, num_heads,
    scale=None, eps=1e-6, interpret=False,
):
    """Pre-LN self-attention sublayer: x + attn_block(LayerNorm(x)).

    x: (B, L, D); ln_scale/ln_bias (D,) float32; projection weights as in
    ``fused_attention_block``.  Caller guarantees L % 8 == 0."""
    B, L, D = x.shape
    if scale is None:
        scale = (D // num_heads) ** -0.5

    vecs = [v.reshape(1, D) for v in (ln_scale, ln_bias, bq, bk, bv, bo)]
    w_spec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _attn_block_ln_kernel, num_heads=num_heads, scale=scale, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            v_spec, v_spec,
            w_spec, v_spec, w_spec, v_spec, w_spec, v_spec, w_spec, v_spec,
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, vecs[0], vecs[1], wq, vecs[2], wk, vecs[3], wv, vecs[4], wo, vecs[5])


def _attn_block_ln_int8_kernel(
    x_ref, g_ref, bn_ref, wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
    wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref, o_ref,
    *, num_heads, scale, eps,
):
    """Pre-LN attention sublayer with W8A8 projections (the MXU runs
    int8 at ~2x its bf16 rate): LN -> per-token int8 quantize -> int8
    QKV projections -> bf16 per-head attention -> int8 out projection ->
    residual.  Attention math (QK^T softmax PV, ~5% of the FLOPs) stays
    bf16/f32."""
    xf = x_ref[0].astype(jnp.float32)  # (L, D)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * g_ref[:].astype(jnp.float32) + bn_ref[:].astype(jnp.float32)

    def quant_rows(a):
        s = jnp.maximum(
            jnp.max(jnp.abs(a), axis=-1, keepdims=True), 1e-6
        ) * (1.0 / 127.0)
        return jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8), s

    hq, sh = quant_rows(h)
    dt = x_ref.dtype

    def proj(w_ref, s_ref, b_ref):
        i32 = jax.lax.dot_general(
            hq, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            i32.astype(jnp.float32) * sh * s_ref[0].astype(jnp.float32)
            + b_ref[0].astype(jnp.float32)
        ).astype(dt)

    q = proj(wq_ref, sq_ref, bq_ref)
    k = proj(wk_ref, sk_ref, bk_ref)
    v = proj(wv_ref, sv_ref, bv_ref)

    D = xf.shape[-1]
    Dh = D // num_heads
    outs = []
    for hd in range(num_heads):
        sl = slice(hd * Dh, (hd + 1) * Dh)
        logits = (
            jax.lax.dot_general(
                q[:, sl].astype(jnp.float32), k[:, sl].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        outs.append(
            jnp.dot(
                w.astype(v.dtype), v[:, sl],
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        )
    attn = jnp.concatenate(outs, axis=1)  # (L, D) f32
    aq, sa = quant_rows(attn)
    o32 = jax.lax.dot_general(
        aq, wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (
        o32.astype(jnp.float32) * sa * so_ref[0].astype(jnp.float32)
        + bo_ref[0].astype(jnp.float32)
    )
    o_ref[0] = (xf + out).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "eps", "interpret")
)
def fused_attention_block_ln_int8(
    x, ln_scale, ln_bias, wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo,
    num_heads, scale=None, eps=1e-6, interpret=False,
):
    """Pre-LN self-attention sublayer with int8 projections: x +
    attn_block_int8(LayerNorm(x)).  w* are int8 (D, D) with per-output-
    channel scales s* (D,) (ops.pallas.fused_mlp.quantize_weight_int8)."""
    B, L, D = x.shape
    if scale is None:
        scale = (D // num_heads) ** -0.5

    vecs = [
        v.reshape(1, D)
        for v in (ln_scale, ln_bias, sq, bq, sk, bk, sv, bv, so, bo)
    ]
    w_spec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _attn_block_ln_int8_kernel, num_heads=num_heads, scale=scale,
            eps=eps,
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            v_spec, v_spec,
            w_spec, v_spec, v_spec,
            w_spec, v_spec, v_spec,
            w_spec, v_spec, v_spec,
            w_spec, v_spec, v_spec,
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x, vecs[0], vecs[1], wq, vecs[2], vecs[3], wk, vecs[4], vecs[5],
        wv, vecs[6], vecs[7], wo, vecs[8], vecs[9],
    )


def fused_attention_reference(q, k, v, scale=None):
    """jnp reference with identical semantics (for parity tests / CPU)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
