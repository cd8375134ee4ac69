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


def t_conv_transpose(w):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out),
    # spatially flipped (flax uses unflipped fractionally-strided conv).
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _frozen_bn(r, prefix):
    return {
        "scale": r.take(f"{prefix}.weight"),
        "bias": r.take(f"{prefix}.bias"),
        "mean": r.take(f"{prefix}.running_mean"),
        "var": r.take(f"{prefix}.running_var"),
    }


def _conv(r, prefix, bias=False):
    out = {"kernel": t_conv(r.take(f"{prefix}.weight"))}
    if bias or r.has(f"{prefix}.bias"):
        out["bias"] = r.take(f"{prefix}.bias")
    return out


def convert_dbnet(sd: dict, model) -> dict:
    """Reference DBNet checkpoint -> our pytree.

    Torch names per yomitoku/models/dbnet_plus.py (backbone.body.* from
    torchvision resnet50 via IntermediateLayerGetter; decoder.*).  The
    adaptive-threshold head (decoder.thresh.*) is dropped — inference never
    evaluates it (dbnet_plus.py:227-229)."""
    r = SDReader(sd)

    backbone = {
        "conv1": {"kernel": t_conv(r.take("backbone.body.conv1.weight"))},
        "bn1": _frozen_bn(r, "backbone.body.bn1"),
    }
    for li, blocks in enumerate((3, 4, 6, 3)):
        for bi in range(blocks):
            p = f"backbone.body.layer{li + 1}.{bi}"
            blk = {
                "conv1": _conv(r, f"{p}.conv1"),
                "bn1": _frozen_bn(r, f"{p}.bn1"),
                "conv2": _conv(r, f"{p}.conv2"),
                "bn2": _frozen_bn(r, f"{p}.bn2"),
                "conv3": _conv(r, f"{p}.conv3"),
                "bn3": _frozen_bn(r, f"{p}.bn3"),
            }
            if bi == 0:
                blk["downsample_conv"] = _conv(r, f"{p}.downsample.0")
                blk["downsample_bn"] = _frozen_bn(r, f"{p}.downsample.1")
            backbone[f"layer{li + 1}_{bi}"] = blk

    dec = {}
    for L in ("layer1", "layer2", "layer3", "layer4"):
        dec[f"input_proj_{L}"] = _conv(r, f"decoder.input_proj.{L}")
        suffix = "" if L == "layer1" else ".0"
        dec[f"out_proj_{L}"] = _conv(r, f"decoder.out_proj.{L}{suffix}")

    dec["bin0"] = {
        "conv": _conv(r, "decoder.binarize.0"),
        "bn": _frozen_bn(r, "decoder.binarize.1"),
    }
    dec["bin_up1"] = {
        "kernel": t_conv_transpose(r.take("decoder.binarize.3.weight")),
        "bias": r.take("decoder.binarize.3.bias"),
    }
    dec["bin_bn1"] = _frozen_bn(r, "decoder.binarize.4")
    dec["bin_up2"] = {
        "kernel": t_conv_transpose(r.take("decoder.binarize.6.weight")),
        "bias": r.take("decoder.binarize.6.bias"),
    }

    ca = "decoder.concat_attention"
    dec["concat_attention"] = {
        "conv": _conv(r, f"{ca}.conv", bias=True),
        "enhanced_attention": {
            "cw_fc1": _conv(r, f"{ca}.enhanced_attention.channel_wise.1"),
            "cw_fc2": _conv(r, f"{ca}.enhanced_attention.channel_wise.3"),
            "sw_conv1": _conv(r, f"{ca}.enhanced_attention.spatial_wise.0"),
            "sw_conv2": _conv(r, f"{ca}.enhanced_attention.spatial_wise.2"),
            "attn": _conv(r, f"{ca}.enhanced_attention.attention_wise.0"),
        },
    }

    leftovers = [
        k
        for k in r.unused()
        if "num_batches_tracked" not in k and not k.startswith("decoder.thresh")
    ]
    if leftovers:
        raise ValueError(f"Unconverted torch params: {leftovers[:10]}...")
    return {"params": {"backbone": backbone, "decoder": dec}}


def _conv_norm(r, prefix):
    """Reference ConvNormLayer -> our ConvNorm {conv, norm}."""
    return {
        "conv": _conv(r, f"{prefix}.conv"),
        "norm": _frozen_bn(r, f"{prefix}.norm"),
    }


def convert_rtdetr(sd: dict, model) -> dict:
    """Reference RTDETRv2 checkpoint -> our pytree (torch names per
    yomitoku/models/rtdetr.py + layers/rtdetr_*.py).  Dropped (training-only
    / buffers): denoising_class_embed, anchors, valid_mask,
    num_points_scale."""
    r = SDReader(sd)
    cfg = model.cfg
    d = cfg.RTDETRTransformerv2.hidden_dim

    # ---- backbone (PResNet-50 d)
    backbone = {}
    for name in ("conv1_1", "conv1_2", "conv1_3"):
        backbone[name] = _conv_norm(r, f"backbone.conv1.{name}")
    for si, blocks in enumerate((3, 4, 6, 3)):
        for bi in range(blocks):
            p = f"backbone.res_layers.{si}.blocks.{bi}"
            blk = {
                "branch2a": _conv_norm(r, f"{p}.branch2a"),
                "branch2b": _conv_norm(r, f"{p}.branch2b"),
                "branch2c": _conv_norm(r, f"{p}.branch2c"),
            }
            if bi == 0:
                # variant-d: stride-2 shortcuts are Sequential(pool, conv)
                # -> "short.conv.conv"; stage 0 is ConvNormLayer directly.
                if r.has(f"{p}.short.conv.conv.weight"):
                    blk["short_conv"] = _conv_norm(r, f"{p}.short.conv")
                else:
                    blk["short_conv"] = _conv_norm(r, f"{p}.short")
            backbone[f"stage{si}_{bi}"] = blk

    # ---- hybrid encoder
    enc = {}
    n_lvl = len(cfg.HybridEncoder.in_channels)
    for i in range(n_lvl):
        enc[f"input_proj_{i}_conv"] = _conv(r, f"encoder.input_proj.{i}.conv")
        enc[f"input_proj_{i}_norm"] = _frozen_bn(r, f"encoder.input_proj.{i}.norm")
    for k in range(len(cfg.HybridEncoder.use_encoder_idx)):
        for li in range(cfg.HybridEncoder.num_encoder_layers):
            p = f"encoder.encoder.{k}.layers.{li}"
            enc[f"encoder_{k}_layer_{li}"] = {
                "self_attn": _packed_mha(r, f"{p}.self_attn", d),
                "linear1": _dense(r, f"{p}.linear1"),
                "linear2": _dense(r, f"{p}.linear2"),
                "norm1": _layernorm(r, f"{p}.norm1"),
                "norm2": _layernorm(r, f"{p}.norm2"),
            }

    def _csprep(prefix, has_conv3):
        out = {
            "conv1": _conv_norm(r, f"{prefix}.conv1"),
            "conv2": _conv_norm(r, f"{prefix}.conv2"),
        }
        for j in range(3):
            out[f"bottlenecks_{j}"] = {
                "conv1": _conv_norm(r, f"{prefix}.bottlenecks.{j}.conv1"),
                "conv2": _conv_norm(r, f"{prefix}.bottlenecks.{j}.conv2"),
            }
        if has_conv3:
            out["conv3"] = _conv_norm(r, f"{prefix}.conv3")
        return out

    has_conv3 = float(cfg.HybridEncoder.expansion) != 1.0
    for i in range(n_lvl - 1):
        enc[f"lateral_convs_{i}"] = _conv_norm(r, f"encoder.lateral_convs.{i}")
        enc[f"fpn_blocks_{i}"] = _csprep(f"encoder.fpn_blocks.{i}", has_conv3)
        enc[f"downsample_convs_{i}"] = _conv_norm(r, f"encoder.downsample_convs.{i}")
        enc[f"pan_blocks_{i}"] = _csprep(f"encoder.pan_blocks.{i}", has_conv3)

    # ---- decoder
    dec = {}
    for i in range(cfg.RTDETRTransformerv2.num_levels):
        dec[f"input_proj_{i}_conv"] = _conv(r, f"decoder.input_proj.{i}.conv")
        dec[f"input_proj_{i}_norm"] = _frozen_bn(r, f"decoder.input_proj.{i}.norm")
    dec["enc_output_proj"] = _dense(r, "decoder.enc_output.proj")
    dec["enc_output_norm"] = _layernorm(r, "decoder.enc_output.norm")
    dec["enc_score_head"] = _dense(r, "decoder.enc_score_head")

    def _mlp(prefix, n):
        return {f"layers_{j}": _dense(r, f"{prefix}.layers.{j}") for j in range(n)}

    dec["enc_bbox_head"] = _mlp("decoder.enc_bbox_head", 3)
    dec["query_pos_head"] = _mlp("decoder.query_pos_head", 2)
    num_layers = cfg.RTDETRTransformerv2.num_layers
    eval_idx = cfg.RTDETRTransformerv2.eval_idx
    if eval_idx < 0:
        eval_idx += num_layers
    for i in range(num_layers):
        p = f"decoder.decoder.layers.{i}"
        dec[f"layers_{i}"] = {
            "self_attn": _packed_mha(r, f"{p}.self_attn", d),
            "cross_attn": {
                "sampling_offsets": _dense(r, f"{p}.cross_attn.sampling_offsets"),
                "attention_weights": _dense(r, f"{p}.cross_attn.attention_weights"),
                "value_proj": _dense(r, f"{p}.cross_attn.value_proj"),
                "output_proj": _dense(r, f"{p}.cross_attn.output_proj"),
            },
            "linear1": _dense(r, f"{p}.linear1"),
            "linear2": _dense(r, f"{p}.linear2"),
            "norm1": _layernorm(r, f"{p}.norm1"),
            "norm2": _layernorm(r, f"{p}.norm2"),
            "norm3": _layernorm(r, f"{p}.norm3"),
        }
        dec[f"dec_bbox_head_{i}"] = _mlp(f"decoder.dec_bbox_head.{i}", 3)
        # inference evaluates class logits only at eval_idx
        # (reference rtdetrv2_decoder.py:399,431-443); earlier score heads
        # are consumed but dropped — our flax decoder never creates them
        score_head = _dense(r, f"decoder.dec_score_head.{i}")
        if i == eval_idx:
            dec[f"dec_score_head_{i}"] = score_head

    allowed_unused = (
        "num_batches_tracked",
        "denoising_class_embed",
        "anchors",
        "valid_mask",
        "num_points_scale",
    )
    leftovers = [
        k for k in r.unused() if not any(a in k for a in allowed_unused)
    ]
    if leftovers:
        raise ValueError(f"Unconverted torch params: {leftovers[:10]}...")
    return {"params": {"backbone": backbone, "encoder": enc, "decoder": dec}}


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
