"""RT-DETRv2 transformer decoder, NHWC flax.

Re-design of the reference rtdetrv2_decoder.py:446 (RTDETRTransformerv2):
anchor-based top-k query selection over the flattened pyramid, 6 decoder
layers of (self-attn, multi-scale deformable cross-attn, FFN) with
iterative sigmoid box refinement.

Deformable attention (reference deformable_attention_core_func_v2:306,
F.grid_sample based) is expressed as a vectorized bilinear gather over the
level feature maps — XLA lowers it to TPU gathers; exact
align_corners=False / zeros-padding semantics are reproduced.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import MultiHeadAttention
from .presnet import _ACTS
from .resnet import FrozenBatchNorm


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1 - x, eps))


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(
                self.output_dim if last else self.hidden_dim,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"layers_{i}",
            )(x)
            if not last:
                x = _ACTS[self.act](x)
        return x


def bilinear_sample_zeros(value_hw, px, py):
    """grid_sample(mode=bilinear, padding_mode=zeros, align_corners=False)
    at pixel coords (px, py) = (loc * size - 0.5).

    value_hw: (B*, H, W, C); px/py: (B*, S) pixel coords. -> (B*, S, C)
    """
    H, W = value_hw.shape[1:3]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = value_hw.reshape(value_hw.shape[0], H * W, -1)
        idx = yc * W + xc  # (B*, S)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * inb[..., None].astype(v.dtype)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def deformable_attention_core(
    value, spatial_shapes, sampling_locations, attention_weights, num_points_list
):
    """value: (B, Len_v, nh, c); sampling_locations: (B, Lq, nh, P, 2) in
    [0, 1]; attention_weights: (B, Lq, nh, P).  -> (B, Lq, nh*c)."""
    import os

    if jax.default_backend() == "tpu" and not os.environ.get(
        "YOMITOKU_TPU_NO_DEFORM_KERNEL"
    ):
        # Pallas separable-bilinear kernel: XLA's gather lowering costs
        # ~60% of the whole RT-DETR forward on TPU (72 scalar-gather
        # fusions per 6-layer decoder).
        from ...ops.pallas.deformable_attention import ms_deformable_attention

        return ms_deformable_attention(
            value,
            sampling_locations,
            attention_weights,
            tuple(tuple(s) for s in spatial_shapes),
            tuple(num_points_list),
        )
    B, Len_v, nh, c = value.shape
    Lq = sampling_locations.shape[1]
    # split per level
    sizes = [h * w for h, w in spatial_shapes]
    starts = np.cumsum([0] + sizes[:-1]).tolist()
    p_starts = np.cumsum([0] + list(num_points_list[:-1])).tolist()

    out = 0.0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, starts[lvl] : starts[lvl] + sizes[lvl]]  # (B, h*w, nh, c)
        v = v.transpose(0, 2, 1, 3).reshape(B * nh, h, w, c)
        P = num_points_list[lvl]
        loc = sampling_locations[:, :, :, p_starts[lvl] : p_starts[lvl] + P]
        att = attention_weights[:, :, :, p_starts[lvl] : p_starts[lvl] + P]
        # (B, Lq, nh, P, 2) -> (B*nh, Lq*P)
        px = loc[..., 0].transpose(0, 2, 1, 3).reshape(B * nh, Lq * P) * w - 0.5
        py = loc[..., 1].transpose(0, 2, 1, 3).reshape(B * nh, Lq * P) * h - 0.5
        sampled = bilinear_sample_zeros(v, px, py)  # (B*nh, Lq*P, c)
        sampled = sampled.reshape(B, nh, Lq, P, c)
        att_l = att.transpose(0, 2, 1, 3)[..., None]  # (B, nh, Lq, P, 1)
        out = out + (sampled * att_l).sum(axis=3)  # (B, nh, Lq, c)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, nh * c)


class MSDeformableAttention(nn.Module):
    embed_dim: int
    num_heads: int
    num_levels: int
    num_points_list: Sequence[int]
    offset_scale: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, value, spatial_shapes):
        """reference_points: (B, Lq, 1, 4) cxcywh in [0,1]."""
        dt = self.dtype
        B, Lq = query.shape[:2]
        nh = self.num_heads
        c = self.embed_dim // nh
        total = sum(self.num_points_list)

        v = nn.Dense(self.embed_dim, dtype=dt, param_dtype=jnp.float32,
                     name="value_proj")(value)
        v = v.reshape(B, -1, nh, c)

        off = nn.Dense(total * nh * 2, dtype=dt, param_dtype=jnp.float32,
                       name="sampling_offsets")(query)
        off = off.reshape(B, Lq, nh, total, 2)
        att = nn.Dense(total * nh, dtype=dt, param_dtype=jnp.float32,
                       name="attention_weights")(query)
        att = nn.softmax(att.reshape(B, Lq, nh, total), axis=-1)

        num_points_scale = jnp.asarray(
            [1.0 / n for n in self.num_points_list for _ in range(n)], dt
        )[:, None]
        offset = (
            off
            * num_points_scale
            * reference_points[:, :, None, :, 2:]
            * self.offset_scale
        )
        locations = reference_points[:, :, None, :, :2] + offset

        out = deformable_attention_core(
            v, spatial_shapes, locations, att, list(self.num_points_list)
        )
        return nn.Dense(self.embed_dim, dtype=dt, param_dtype=jnp.float32,
                        name="output_proj")(out)


class RTDETRDecoderLayer(nn.Module):
    d_model: int
    n_head: int
    dim_feedforward: int
    num_levels: int
    num_points_list: Sequence[int]
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, target, reference_points, memory, spatial_shapes,
                 query_pos_embed):
        dt = self.dtype
        # torch nn.LayerNorm epsilon (1e-5), not flax's 1e-6 default
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                       param_dtype=jnp.float32, name=name)
        q = k = target + query_pos_embed
        h = MultiHeadAttention(self.d_model, self.n_head, dtype=dt,
                               name="self_attn")(q, k, target)
        target = ln("norm1")(target + h)

        h = MSDeformableAttention(
            self.d_model, self.n_head, self.num_levels, self.num_points_list,
            dtype=dt, name="cross_attn",
        )(target + query_pos_embed, reference_points, memory, spatial_shapes)
        target = ln("norm2")(target + h)

        h = nn.Dense(self.dim_feedforward, dtype=dt, param_dtype=jnp.float32,
                     name="linear1")(target)
        h = _ACTS[self.act](h)
        h = nn.Dense(self.d_model, dtype=dt, param_dtype=jnp.float32,
                     name="linear2")(h)
        return ln("norm3")(target + h)


def generate_anchors(spatial_shapes, grid_size=0.05, eps=1e-2):
    """Reference _generate_anchors (rtdetrv2_decoder.py:662): per-level
    half-pixel grid anchors in [0,1] + exponential wh, logit-transformed,
    invalid -> +inf."""
    anchors = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        gxy = (np.stack([gx, gy], -1).reshape(-1, 2) + 0.5) / np.array(
            [w, h], np.float32
        )
        wh = np.ones_like(gxy) * grid_size * (2.0 ** lvl)
        anchors.append(np.concatenate([gxy, wh], -1))
    anchors = np.concatenate(anchors, 0)[None]  # (1, L, 4)
    valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
    anchors = np.log(anchors / (1 - anchors))
    anchors = np.where(valid, anchors, np.inf).astype(np.float32)
    return anchors, valid


class RTDETRTransformerv2(nn.Module):
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 300
    feat_channels: Sequence[int] = (256, 256, 256)
    feat_strides: Sequence[int] = (8, 16, 32)
    num_levels: int = 3
    num_points: Sequence[int] = (4, 4, 4)
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 1024
    eval_spatial_size: Sequence[int] = (640, 640)
    eval_idx: int = -1
    eps: float = 1e-2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        dt = self.dtype
        d = self.hidden_dim

        # input projection + flatten
        flat, spatial_shapes = [], []
        for i, f in enumerate(feats):
            p = nn.Conv(d, (1, 1), use_bias=False, dtype=dt,
                        param_dtype=jnp.float32, name=f"input_proj_{i}_conv")(f)
            p = FrozenBatchNorm(d, dtype=dt, name=f"input_proj_{i}_norm")(p)
            B, H, W, _ = p.shape
            spatial_shapes.append((H, W))
            flat.append(p.reshape(B, H * W, d))
        memory = jnp.concatenate(flat, axis=1)

        anchors_np, valid_np = generate_anchors(spatial_shapes, eps=self.eps)
        anchors = jnp.asarray(anchors_np)
        valid = jnp.asarray(valid_np)

        memory = memory * valid.astype(memory.dtype)

        out_mem = nn.Dense(d, dtype=dt, param_dtype=jnp.float32,
                           name="enc_output_proj")(memory)
        out_mem = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                               name="enc_output_norm")(out_mem)
        enc_logits = nn.Dense(self.num_classes, dtype=dt,
                              param_dtype=jnp.float32,
                              name="enc_score_head")(out_mem)
        enc_coord = MLP(d, 4, 3, dtype=dt, name="enc_bbox_head")(
            out_mem
        ).astype(jnp.float32) + anchors

        # top-k query selection on max class logit
        scores = jnp.max(enc_logits.astype(jnp.float32), axis=-1)
        _, topk_ind = jax.lax.top_k(scores, self.num_queries)
        take = lambda t: jnp.take_along_axis(
            t, topk_ind[..., None].astype(jnp.int32), axis=1
        )
        content = take(out_mem)
        ref_unact = take(enc_coord)

        # decoder with iterative refinement; query_pos_head is SHARED
        # across layers (reference TransformerDecoder.forward)
        query_pos_head = MLP(2 * d, d, 2, dtype=dt, name="query_pos_head")
        ref_points = nn.sigmoid(ref_unact)
        output = content
        final_logits = final_boxes = None
        eval_idx = self.eval_idx if self.eval_idx >= 0 else (
            self.num_layers + self.eval_idx
        )
        for i in range(self.num_layers):
            qpe = query_pos_head(ref_points.astype(dt))
            output = RTDETRDecoderLayer(
                d, self.nhead, self.dim_feedforward, self.num_levels,
                self.num_points, dtype=dt, name=f"layers_{i}",
            )(output, ref_points[:, :, None].astype(dt), memory,
              spatial_shapes, qpe)
            delta = MLP(d, 4, 3, dtype=dt, name=f"dec_bbox_head_{i}")(output)
            new_ref = nn.sigmoid(
                delta.astype(jnp.float32) + inverse_sigmoid(ref_points)
            )
            if i == eval_idx:
                final_logits = nn.Dense(
                    self.num_classes, dtype=dt, param_dtype=jnp.float32,
                    name=f"dec_score_head_{i}",
                )(output).astype(jnp.float32)
                final_boxes = new_ref
                break
            ref_points = new_ref

        return {"pred_logits": final_logits, "pred_boxes": final_boxes}
