"""Two-stream (query/content) transformer decoder for PARSeq.

Functional re-design of the reference decoder
(yomitoku/models/layers/parseq_transformer.py:27-170): pre-LN layers where
a position-query stream attends over a content stream (token embeddings)
and encoder memory.  The content stream is only updated between layers
(never after the last), so with the production depth=1 configs the content
keys are the raw embeddings — which lets the jitted AR loop keep a single
static content buffer.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .attention import Mlp, MultiHeadAttention


class TwoStreamDecoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        D, H = self.embed_dim, self.num_heads
        self.self_attn = MultiHeadAttention(D, H, dtype=self.dtype)
        self.cross_attn = MultiHeadAttention(D, H, dtype=self.dtype)
        self.mlp = Mlp(int(D * self.mlp_ratio), D, dtype=self.dtype)
        ln = lambda: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )
        self.norm1 = ln()
        self.norm2 = ln()
        self.norm_q = ln()
        self.norm_c = ln()

    def _stream(self, tgt, tgt_norm, tgt_kv, memory, attn_mask, key_padding_mask):
        h = self.self_attn(
            tgt_norm, tgt_kv, tgt_kv, attn_mask=attn_mask,
            key_padding_mask=key_padding_mask,
        )
        tgt = tgt + h
        h = self.cross_attn(self.norm1(tgt), memory, memory)
        tgt = tgt + h
        return tgt + self.mlp(self.norm2(tgt))

    # -- cached AR decode API --------------------------------------------
    # The reference re-projects content and memory K/V on every decode
    # step (yomitoku/models/parseq.py:160-186 via nn.MultiheadAttention);
    # for B=128, L=101, M=400, d=768 that is ~150 GFLOP/step of
    # loop-invariant work.  These methods let the jitted while_loop keep
    # K/V caches and project only the one new content row per step.

    def memory_kv(self, memory):
        """Loop-invariant cross-attention K/V: (B, H, M, Dh) x2."""
        return self.cross_attn.project_kv(memory, memory)

    def memory_kv_int8(self, memory):
        """int8-quantized cross-attention K/V cache (halves the dominant
        per-decode-step HBM read; see attention.quantize_kv_int8)."""
        from .attention import quantize_kv_int8

        km, vm = self.cross_attn.project_kv(memory, memory)
        return quantize_kv_int8(km, vm)

    def content_kv(self, rows):
        """Self-attention K/V for new content rows: (B, H, r, Dh) x2."""
        c = self.norm_c(rows)
        return self.self_attn.project_kv(c, c)

    def content_kv_int8(self, rows):
        """int8 K/V rows (+ per-row scales) for the quantized content
        cache; rows quantize independently so appending one row leaves
        the rest of the cache untouched (per-row is the only granularity
        an incrementally-built cache supports)."""
        from .attention import quantize_kv_int8

        kr, vr = self.content_kv(rows)
        return quantize_kv_int8(kr, vr, per_row=True)

    def query_step(self, query, kc, vc, km, vm, query_mask=None):
        """Query-stream update against cached K/V (no content update).

        ``km`` may be an int8 cache tuple (kq, sk, vq, sv) from
        ``memory_kv_int8`` (then ``vm`` is ignored)."""
        mask = None
        if query_mask is not None:
            m = query_mask
            mask = m[None, None] if m.ndim == 2 else m[:, None]
        q1 = self.self_attn.project_q(self.norm_q(query))
        if isinstance(kc, tuple):
            h = self.self_attn.attend_int8(q1, *kc, mask=mask)
        else:
            h = self.self_attn.attend(q1, kc, vc, mask)
        tgt = query + h
        q2 = self.cross_attn.project_q(self.norm1(tgt))
        if isinstance(km, tuple):
            h = self.cross_attn.attend_int8(q2, *km)
        else:
            h = self.cross_attn.attend(q2, km, vm)
        tgt = tgt + h
        return tgt + self.mlp(self.norm2(tgt))

    def __call__(
        self,
        query,
        content,
        memory,
        query_mask: Optional[jnp.ndarray] = None,
        content_mask: Optional[jnp.ndarray] = None,
        content_key_padding_mask: Optional[jnp.ndarray] = None,
        update_content: bool = True,
    ):
        query_norm = self.norm_q(query)
        content_norm = self.norm_c(content)
        query = self._stream(
            query, query_norm, content_norm, memory, query_mask,
            content_key_padding_mask,
        )
        if update_content:
            content = self._stream(
                content, content_norm, content_norm, memory, content_mask,
                content_key_padding_mask,
            )
        return query, content


class TwoStreamDecoder(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float
    depth: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            TwoStreamDecoderLayer(
                self.embed_dim, self.num_heads, self.mlp_ratio, dtype=self.dtype
            )
            for _ in range(self.depth)
        ]
        self.norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32
        )

    def __call__(
        self,
        query,
        content,
        memory,
        query_mask=None,
        content_mask=None,
        content_key_padding_mask=None,
    ):
        for i, layer in enumerate(self.layers):
            last = i == len(self.layers) - 1
            query, content = layer(
                query,
                content,
                memory,
                query_mask,
                content_mask,
                content_key_padding_mask,
                update_content=not last,
            )
        return self.norm(query)

    # -- cached AR decode (depth-1 fast path) ------------------------------

    def ar_memory_kv(self, memory):
        return self.layers[0].memory_kv(memory)

    def ar_memory_kv_int8(self, memory):
        return self.layers[0].memory_kv_int8(memory)

    def ar_content_kv(self, rows):
        return self.layers[0].content_kv(rows)

    def ar_content_kv_int8(self, rows):
        return self.layers[0].content_kv_int8(rows)

    def ar_query_step(self, query, kc, vc, km, vm, query_mask=None):
        q = self.layers[0].query_step(query, kc, vc, km, vm, query_mask)
        return self.norm(q)
