"""Torch state_dict -> flax param pytree converters.

Maps the reference checkpoints' parameter names onto our module tree and
transposes layouts: Linear (out,in)->(in,out), Conv OIHW->HWIO, packed
MHA in_proj -> split q/k/v kernels.  Each converter validates that every
expected parameter was consumed.
"""

import numpy as np


def t_linear(w):
    return np.ascontiguousarray(np.transpose(w))


def t_conv(w):
    # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


class SDReader:
    def __init__(self, sd):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _dense(r, prefix):
    out = {"kernel": t_linear(r.take(f"{prefix}.weight"))}
    if r.has(f"{prefix}.bias"):
        out["bias"] = r.take(f"{prefix}.bias")
    return out


def _layernorm(r, prefix):
    return {"scale": r.take(f"{prefix}.weight"), "bias": r.take(f"{prefix}.bias")}


def _packed_mha(r, prefix, embed_dim):
    """torch nn.MultiheadAttention (packed in_proj) -> q/k/v/out denses."""
    w = r.take(f"{prefix}.in_proj_weight")
    b = r.take(f"{prefix}.in_proj_bias")
    D = embed_dim
    return {
        "q_proj": {"kernel": t_linear(w[:D]), "bias": b[:D]},
        "k_proj": {"kernel": t_linear(w[D : 2 * D]), "bias": b[D : 2 * D]},
        "v_proj": {"kernel": t_linear(w[2 * D :]), "bias": b[2 * D :]},
        "out_proj": _dense(r, f"{prefix}.out_proj"),
    }


def _timm_attn(r, prefix, embed_dim):
    """timm ViT Attention (fused qkv Linear) -> q/k/v/out denses."""
    w = r.take(f"{prefix}.qkv.weight")
    b = r.take(f"{prefix}.qkv.bias")
    D = embed_dim
    return {
        "q_proj": {"kernel": t_linear(w[:D]), "bias": b[:D]},
        "k_proj": {"kernel": t_linear(w[D : 2 * D]), "bias": b[D : 2 * D]},
        "v_proj": {"kernel": t_linear(w[2 * D :]), "bias": b[2 * D :]},
        "out_proj": _dense(r, f"{prefix}.proj"),
    }


def convert_parseq(sd: dict, model) -> dict:
    r = SDReader(sd)
    D = model.core.enc_embed_dim

    encoder = {
        "patch_embed": {
            "proj": {
                "kernel": t_conv(r.take("encoder.patch_embed.proj.weight")),
                "bias": r.take("encoder.patch_embed.proj.bias"),
            }
        },
        "pos_embed": r.take("encoder.pos_embed"),
        "norm": _layernorm(r, "encoder.norm"),
    }
    for i in range(model.core.enc_depth):
        p = f"encoder.blocks.{i}"
        encoder[f"blocks_{i}"] = {
            "norm1": _layernorm(r, f"{p}.norm1"),
            "attn": _timm_attn(r, f"{p}.attn", D),
            "norm2": _layernorm(r, f"{p}.norm2"),
            "mlp": {
                "fc1": _dense(r, f"{p}.mlp.fc1"),
                "fc2": _dense(r, f"{p}.mlp.fc2"),
            },
        }

    Dd = model.core.dec_embed_dim
    decoder = {"norm": _layernorm(r, "decoder.norm")}
    for i in range(model.core.dec_depth):
        p = f"decoder.layers.{i}"
        decoder[f"layers_{i}"] = {
            "self_attn": _packed_mha(r, f"{p}.self_attn", Dd),
            "cross_attn": _packed_mha(r, f"{p}.cross_attn", Dd),
            "mlp": {
                "fc1": _dense(r, f"{p}.linear1"),
                "fc2": _dense(r, f"{p}.linear2"),
            },
            "norm1": _layernorm(r, f"{p}.norm1"),
            "norm2": _layernorm(r, f"{p}.norm2"),
            "norm_q": _layernorm(r, f"{p}.norm_q"),
            "norm_c": _layernorm(r, f"{p}.norm_c"),
        }

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "head": _dense(r, "head"),
        "text_embed": {"embedding": r.take("text_embed.embedding.weight")},
        "pos_queries": r.take("pos_queries"),
    }
    leftovers = [k for k in r.unused() if "num_batches_tracked" not in k]
    if leftovers:
        raise ValueError(f"Unconverted torch params: {leftovers[:10]}...")
    return {"params": params}
