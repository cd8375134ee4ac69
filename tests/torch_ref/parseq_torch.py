"""Torch mirror of the reference PARSeq for conversion-parity tests and
CPU baseline measurement.

State-dict key names match the reference checkpoints exactly
(yomitoku/models/parseq.py:49 + models/layers/parseq_transformer.py), so
``convert_parseq`` can be validated end-to-end without network access:
random-init this mirror, convert its state_dict, and require our jitted
JAX program to reproduce its outputs.

The encoder mirrors the timm VisionTransformer configuration the
reference uses (patch conv -> learned pos embed, no cls token, pre-LN
blocks with fused qkv, eps 1e-6, final LayerNorm); timm itself is not
installed in this environment.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class _ViTAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        out = F.scaled_dot_product_attention(q, k, v)
        return self.proj(out.transpose(1, 2).reshape(B, N, D))


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _ViTBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _ViTAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(nn.Module):
    def __init__(self, patch_size, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(3, embed_dim, patch_size, stride=patch_size)

    def forward(self, x):  # NCHW
        return self.proj(x).flatten(2).transpose(1, 2)


class Encoder(nn.Module):
    def __init__(self, img_size, patch_size, embed_dim, depth, num_heads, mlp_ratio):
        super().__init__()
        self.patch_embed = _PatchEmbed(tuple(patch_size), embed_dim)
        n = (img_size[0] // patch_size[0]) * (img_size[1] // patch_size[1])
        self.pos_embed = nn.Parameter(torch.randn(1, n, embed_dim) * 0.02)
        self.blocks = nn.ModuleList(
            _ViTBlock(embed_dim, num_heads, mlp_ratio) for _ in range(depth)
        )
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed(x) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class DecoderLayer(nn.Module):
    def __init__(self, embed_dim, num_heads, mlp_ratio):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(embed_dim, num_heads, batch_first=True)
        self.cross_attn = nn.MultiheadAttention(embed_dim, num_heads, batch_first=True)
        self.linear1 = nn.Linear(embed_dim, int(embed_dim * mlp_ratio))
        self.linear2 = nn.Linear(int(embed_dim * mlp_ratio), embed_dim)
        self.norm1 = nn.LayerNorm(embed_dim, eps=1e-5)
        self.norm2 = nn.LayerNorm(embed_dim, eps=1e-5)
        self.norm_q = nn.LayerNorm(embed_dim, eps=1e-5)
        self.norm_c = nn.LayerNorm(embed_dim, eps=1e-5)

    def _stream(self, tgt, tgt_norm, tgt_kv, memory, attn_mask, kpm):
        h, _ = self.self_attn(
            tgt_norm, tgt_kv, tgt_kv, attn_mask=attn_mask, key_padding_mask=kpm
        )
        tgt = tgt + h
        h, _ = self.cross_attn(self.norm1(tgt), memory, memory)
        tgt = tgt + h
        return tgt + self.linear2(F.gelu(self.linear1(self.norm2(tgt))))

    def forward(self, query, content, memory, query_mask, content_mask, kpm,
                update_content=True):
        qn = self.norm_q(query)
        cn = self.norm_c(content)
        query = self._stream(query, qn, cn, memory, query_mask, kpm)
        if update_content:
            content = self._stream(content, cn, cn, memory, content_mask, kpm)
        return query, content


class Decoder(nn.Module):
    def __init__(self, embed_dim, num_heads, mlp_ratio, depth):
        super().__init__()
        self.layers = nn.ModuleList(
            DecoderLayer(embed_dim, num_heads, mlp_ratio) for _ in range(depth)
        )
        self.norm = nn.LayerNorm(embed_dim, eps=1e-5)

    def forward(self, query, content, memory, query_mask=None, content_mask=None,
                kpm=None):
        for i, layer in enumerate(self.layers):
            query, content = layer(
                query, content, memory, query_mask, content_mask, kpm,
                update_content=i < len(self.layers) - 1,
            )
        return self.norm(query)


class TokenEmbedding(nn.Module):
    def __init__(self, num_tokens, embed_dim):
        super().__init__()
        self.embedding = nn.Embedding(num_tokens, embed_dim)
        self.embed_dim = embed_dim

    def forward(self, tokens):
        return math.sqrt(self.embed_dim) * self.embedding(tokens)


class PARSeqTorch(nn.Module):
    """Same forward semantics as the reference inference path
    (yomitoku/models/parseq.py:125-236): greedy AR with batch early exit
    (logits truncated at the stopping step) + cloze refinement."""

    def __init__(self, cfg):
        super().__init__()
        self.max_label_length = cfg.max_label_length
        self.decode_ar = bool(cfg.decode_ar)
        self.refine_iters = int(cfg.refine_iters)
        self.eos_id = 0
        self.bos_id = cfg.num_tokens - 2
        self.pad_id = cfg.num_tokens - 1
        D = cfg.decoder.embed_dim
        self.encoder = Encoder(
            tuple(cfg.data.img_size), tuple(cfg.encoder.patch_size),
            cfg.encoder.embed_dim, cfg.encoder.depth, cfg.encoder.num_heads,
            cfg.encoder.mlp_ratio,
        )
        self.decoder = Decoder(
            D, cfg.decoder.num_heads, cfg.decoder.mlp_ratio, cfg.decoder.depth
        )
        self.head = nn.Linear(D, cfg.num_tokens - 2)
        self.text_embed = TokenEmbedding(cfg.num_tokens, D)
        self.pos_queries = nn.Parameter(
            torch.randn(1, cfg.max_label_length + 1, D) * 0.02
        )

    def decode(self, tgt, memory, tgt_mask=None, tgt_padding_mask=None,
               tgt_query=None, tgt_query_mask=None):
        N, L = tgt.shape
        null_ctx = self.text_embed(tgt[:, :1])
        tgt_emb = self.pos_queries[:, : L - 1] + self.text_embed(tgt[:, 1:])
        content = torch.cat([null_ctx, tgt_emb], dim=1)
        if tgt_query is None:
            tgt_query = self.pos_queries[:, :L].expand(N, -1, -1)
        return self.decoder(
            tgt_query, content, memory, tgt_query_mask, tgt_mask, tgt_padding_mask
        )

    @torch.no_grad()
    def forward(self, images):
        bs = images.shape[0]
        num_steps = self.max_label_length + 1
        memory = self.encoder(images)
        pos_queries = self.pos_queries[:, :num_steps].expand(bs, -1, -1)
        tgt_mask = query_mask = torch.triu(
            torch.ones((num_steps, num_steps), dtype=torch.bool), 1
        )

        if self.decode_ar:
            tgt_in = torch.full((bs, num_steps), self.pad_id, dtype=torch.long)
            tgt_in[:, 0] = self.bos_id
            logits = []
            for i in range(num_steps):
                j = i + 1
                tgt_out = self.decode(
                    tgt_in[:, :j], memory, tgt_mask[:j, :j],
                    tgt_query=pos_queries[:, i:j],
                    tgt_query_mask=query_mask[i:j, :j],
                )
                p_i = self.head(tgt_out)
                logits.append(p_i)
                if j < num_steps:
                    tgt_in[:, j] = p_i.squeeze(1).argmax(-1)
                    if (tgt_in == self.eos_id).any(dim=-1).all():
                        break
            logits = torch.cat(logits, dim=1)
        else:
            tgt_in = torch.full((bs, 1), self.bos_id, dtype=torch.long)
            logits = self.head(self.decode(tgt_in, memory, tgt_query=pos_queries))

        if self.refine_iters:
            # NOTE: tgt_mask and query_mask alias the same tensor in the
            # reference (parseq.py:146-150,199-207), so this in-place
            # unmasking turns BOTH into the cloze mask.
            query_mask[torch.triu(torch.ones(num_steps, num_steps, dtype=torch.bool), 2)] = False
            bos = torch.full((bs, 1), self.bos_id, dtype=torch.long)
            for _ in range(self.refine_iters):
                tgt_in = torch.cat([bos, logits[:, :-1].argmax(-1)], dim=1)
                tgt_padding_mask = (tgt_in == self.eos_id).int().cumsum(-1) > 0
                tgt_out = self.decode(
                    tgt_in, memory, tgt_mask, tgt_padding_mask, pos_queries,
                    query_mask[:, : tgt_in.shape[1]],
                )
                logits = self.head(tgt_out)
        return logits
