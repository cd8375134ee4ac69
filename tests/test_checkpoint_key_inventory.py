"""Checkpoint key-inventory hardening (VERDICT r1 item 7).

The converters in yomitoku_tpu/models/weights_convert.py were previously
exercised only against the builder's own torch mirrors.  This test pins an
AUTHORITATIVE inventory of the HF checkpoints' state_dict keys (+ shapes),
derived line-by-line from the reference model constructors — NOT from the
mirrors:

  * DBNet:   reference models/dbnet_plus.py:30-142 (torchvision resnet50
    via IntermediateLayerGetter -> "backbone.body.*"; DBNetDecoder
    input_proj/out_proj/binarize/thresh/concat_attention;
    ScaleChannelSpatialAttention in layers/dbnet_feature_attention.py:37-56)
  * PARSeq:  reference models/parseq.py:50-84 (timm VisionTransformer with
    class_token=False/num_classes=0 -> no cls_token, no head, fc_norm is
    Identity; layers/parseq_transformer.py:27-63 DecoderLayer with packed
    nn.MultiheadAttention; head/text_embed/pos_queries)
  * RTDETRv2: reference models/rtdetr.py:9-15 + layers/rtdetr_backbone.py
    (PResNet variant-d stem conv1_1..3, res_layers.S.blocks.B.branch2{a,b,c},
    stride-2 shortcuts as short.conv.{conv,norm} vs stage-0 short.{conv,norm}),
    layers/rtdetr_hybrid_encoder.py:249-320 (v2 input_proj conv/norm naming,
    AIFI encoder layer, CSPRep fpn/pan blocks with conv3=Identity at
    expansion 1.0), layers/rtdetrv2_decoder.py:446-570 (MSDeformableAttention
    linears + num_points_scale buffer, enc_output/heads, anchors/valid_mask
    buffers, denoising_class_embed)

For each of the five default models it then asserts that
convert_torch_state_dict consumes EVERY key of a synthetic state_dict built
from the inventory and emits a pytree whose leaf shapes exactly match the
model's own init tree.  Any unmapped, missing, or misshapen key fails.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from yomitoku_tpu.config import structured


# --------------------------------------------------------------------------
# inventory builders: torch module -> {key: shape}
# --------------------------------------------------------------------------

def _conv(d, p, cin, cout, k, bias=False):
    d[f"{p}.weight"] = (cout, cin, k, k)
    if bias:
        d[f"{p}.bias"] = (cout,)


def _bn(d, p, c):
    d[f"{p}.weight"] = (c,)
    d[f"{p}.bias"] = (c,)
    d[f"{p}.running_mean"] = (c,)
    d[f"{p}.running_var"] = (c,)
    d[f"{p}.num_batches_tracked"] = ()


def _ln(d, p, c):
    d[f"{p}.weight"] = (c,)
    d[f"{p}.bias"] = (c,)


def _linear(d, p, cin, cout, bias=True):
    d[f"{p}.weight"] = (cout, cin)
    if bias:
        d[f"{p}.bias"] = (cout,)


def _mha(d, p, dim):
    """nn.MultiheadAttention: packed in_proj + out_proj."""
    d[f"{p}.in_proj_weight"] = (3 * dim, dim)
    d[f"{p}.in_proj_bias"] = (3 * dim,)
    _linear(d, f"{p}.out_proj", dim, dim)


def _convT(d, p, cin, cout, k, bias=True):
    d[f"{p}.weight"] = (cin, cout, k, k)
    if bias:
        d[f"{p}.bias"] = (cout,)


def _conv_norm(d, p, cin, cout, k):
    """Reference ConvNormLayer (rtdetr_backbone.py:40-53): conv bias=False
    + BatchNorm."""
    _conv(d, f"{p}.conv", cin, cout, k)
    _bn(d, f"{p}.norm", cout)


# --------------------------------------------------------------------------
# per-model inventories
# --------------------------------------------------------------------------

def dbnet_keys(cfg):
    d = {}
    # torchvision resnet50 under IntermediateLayerGetter (keeps conv1..layer4)
    _conv(d, "backbone.body.conv1", 3, 64, 7)
    _bn(d, "backbone.body.bn1", 64)
    widths, blocks = (64, 128, 256, 512), (3, 4, 6, 3)
    cin = 64
    for li, (w, n) in enumerate(zip(widths, blocks)):
        for bi in range(n):
            p = f"backbone.body.layer{li + 1}.{bi}"
            inplanes = cin if bi == 0 else w * 4
            _conv(d, f"{p}.conv1", inplanes, w, 1)
            _bn(d, f"{p}.bn1", w)
            _conv(d, f"{p}.conv2", w, w, 3)
            _bn(d, f"{p}.bn2", w)
            _conv(d, f"{p}.conv3", w, w * 4, 1)
            _bn(d, f"{p}.bn3", w * 4)
            if bi == 0:
                _conv(d, f"{p}.downsample.0", inplanes, w * 4, 1)
                _bn(d, f"{p}.downsample.1", w * 4)
        cin = w * 4

    dm = cfg.decoder.hidden_dim  # 256
    q = dm // 4
    for i, L in enumerate(("layer1", "layer2", "layer3", "layer4")):
        _conv(d, f"decoder.input_proj.{L}", cfg.decoder.in_channels[i], dm, 1)
        suffix = "" if L == "layer1" else ".0"
        _conv(d, f"decoder.out_proj.{L}{suffix}", dm, q, 3)
    # binarize head (dbnet_plus.py:107-117)
    _conv(d, "decoder.binarize.0", dm, q, 3)
    _bn(d, "decoder.binarize.1", q)
    _convT(d, "decoder.binarize.3", q, q, 2)
    _bn(d, "decoder.binarize.4", q)
    _convT(d, "decoder.binarize.6", q, 1, 2)
    # adaptive threshold head, serial=True -> +1 input channel
    # (dbnet_plus.py:120-171); present in the checkpoint, unused at inference
    _conv(d, "decoder.thresh.0", dm + 1, q, 3)
    _bn(d, "decoder.thresh.1", q)
    _convT(d, "decoder.thresh.3", q, q, 2)
    _bn(d, "decoder.thresh.4", q)
    _convT(d, "decoder.thresh.6", q, 1, 2)
    # ScaleFeatureSelection (attention_type=scale_channel_spatial)
    ca = "decoder.concat_attention"
    _conv(d, f"{ca}.conv", dm, q, 3, bias=True)
    _conv(d, f"{ca}.enhanced_attention.channel_wise.1", q, q // 4, 1)
    _conv(d, f"{ca}.enhanced_attention.channel_wise.3", q // 4, q, 1)
    _conv(d, f"{ca}.enhanced_attention.spatial_wise.0", 1, 1, 3)
    _conv(d, f"{ca}.enhanced_attention.spatial_wise.2", 1, 1, 1)
    _conv(d, f"{ca}.enhanced_attention.attention_wise.0", q, 4, 1)
    return d


def parseq_keys(cfg):
    d = {}
    D = cfg.encoder.embed_dim
    ph, pw = cfg.encoder.patch_size
    ih, iw = cfg.data.img_size
    npatch = (ih // ph) * (iw // pw)
    # timm VisionTransformer, class_token=False/global_pool=""/num_classes=0
    d["encoder.pos_embed"] = (1, npatch, D)
    d["encoder.patch_embed.proj.weight"] = (D, 3, ph, pw)
    d["encoder.patch_embed.proj.bias"] = (D,)
    for i in range(cfg.encoder.depth):
        p = f"encoder.blocks.{i}"
        _ln(d, f"{p}.norm1", D)
        _linear(d, f"{p}.attn.qkv", D, 3 * D)
        _linear(d, f"{p}.attn.proj", D, D)
        _ln(d, f"{p}.norm2", D)
        _linear(d, f"{p}.mlp.fc1", D, D * cfg.encoder.mlp_ratio)
        _linear(d, f"{p}.mlp.fc2", D * cfg.encoder.mlp_ratio, D)
    _ln(d, "encoder.norm", D)

    Dd = cfg.decoder.embed_dim
    for i in range(cfg.decoder.depth):
        p = f"decoder.layers.{i}"
        _mha(d, f"{p}.self_attn", Dd)
        _mha(d, f"{p}.cross_attn", Dd)
        _linear(d, f"{p}.linear1", Dd, Dd * cfg.decoder.mlp_ratio)
        _linear(d, f"{p}.linear2", Dd * cfg.decoder.mlp_ratio, Dd)
        for nm in ("norm1", "norm2", "norm_q", "norm_c"):
            _ln(d, f"{p}.{nm}", Dd)
    _ln(d, "decoder.norm", Dd)
    _linear(d, "head", Dd, cfg.num_tokens - 2)
    d["text_embed.embedding.weight"] = (cfg.num_tokens, Dd)
    d["pos_queries"] = (1, cfg.max_label_length + 1, Dd)
    return d


def rtdetr_keys(cfg):
    d = {}
    # ---- PResNet-50 variant d
    for name, (cin, cout) in zip(
        ("conv1_1", "conv1_2", "conv1_3"), ((3, 32), (32, 32), (32, 64))
    ):
        _conv_norm(d, f"backbone.conv1.{name}", cin, cout, 3)
    widths, blocks = (64, 128, 256, 512), (3, 4, 6, 3)
    cin = 64
    for si, (w, n) in enumerate(zip(widths, blocks)):
        for bi in range(n):
            p = f"backbone.res_layers.{si}.blocks.{bi}"
            inplanes = cin if bi == 0 else w * 4
            _conv_norm(d, f"{p}.branch2a", inplanes, w, 1)
            _conv_norm(d, f"{p}.branch2b", w, w, 3)
            _conv_norm(d, f"{p}.branch2c", w, w * 4, 1)
            if bi == 0:
                # stage 0 keeps stride 1 -> plain ConvNormLayer shortcut;
                # later stages pool+conv (rtdetr_backbone.py:115-130)
                sp = f"{p}.short" if si == 0 else f"{p}.short.conv"
                _conv_norm(d, sp, inplanes, w * 4, 1)
        cin = w * 4

    # ---- HybridEncoder (v2 naming)
    e = cfg.HybridEncoder
    hd = e.hidden_dim
    for i, cin_i in enumerate(e.in_channels):
        _conv(d, f"encoder.input_proj.{i}.conv", cin_i, hd, 1)
        _bn(d, f"encoder.input_proj.{i}.norm", hd)
    for k in range(len(e.use_encoder_idx)):
        for li in range(e.num_encoder_layers):
            p = f"encoder.encoder.{k}.layers.{li}"
            _mha(d, f"{p}.self_attn", hd)
            _linear(d, f"{p}.linear1", hd, e.dim_feedforward)
            _linear(d, f"{p}.linear2", e.dim_feedforward, hd)
            _ln(d, f"{p}.norm1", hd)
            _ln(d, f"{p}.norm2", hd)

    def _csprep(p):
        # CSPRepLayer at expansion=1.0: conv3 is Identity
        _conv_norm(d, f"{p}.conv1", 2 * hd, hd, 1)
        _conv_norm(d, f"{p}.conv2", 2 * hd, hd, 1)
        for j in range(3):
            _conv_norm(d, f"{p}.bottlenecks.{j}.conv1", hd, hd, 3)
            _conv_norm(d, f"{p}.bottlenecks.{j}.conv2", hd, hd, 1)

    for i in range(len(e.in_channels) - 1):
        _conv_norm(d, f"encoder.lateral_convs.{i}", hd, hd, 1)
        _csprep(f"encoder.fpn_blocks.{i}")
        _conv_norm(d, f"encoder.downsample_convs.{i}", hd, hd, 3)
        _csprep(f"encoder.pan_blocks.{i}")

    # ---- RTDETRTransformerv2
    c = cfg.RTDETRTransformerv2
    hd = c.hidden_dim
    nc = c.num_classes
    for i, fc in enumerate(c.feat_channels):
        _conv(d, f"decoder.input_proj.{i}.conv", fc, hd, 1)
        _bn(d, f"decoder.input_proj.{i}.norm", hd)
    _linear(d, "decoder.enc_output.proj", hd, hd)
    _ln(d, "decoder.enc_output.norm", hd)
    _linear(d, "decoder.enc_score_head", hd, nc)

    def _mlp(p, dims):
        for j, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            _linear(d, f"{p}.layers.{j}", a, b)

    _mlp("decoder.enc_bbox_head", (hd, hd, hd, 4))
    _mlp("decoder.query_pos_head", (4, 2 * hd, hd))
    total_points = 8 * sum(c.num_points)  # nhead=8 (decoder default)
    for i in range(c.num_layers):
        p = f"decoder.decoder.layers.{i}"
        _mha(d, f"{p}.self_attn", hd)
        _linear(d, f"{p}.cross_attn.sampling_offsets", hd, 2 * total_points)
        _linear(d, f"{p}.cross_attn.attention_weights", hd, total_points)
        _linear(d, f"{p}.cross_attn.value_proj", hd, hd)
        _linear(d, f"{p}.cross_attn.output_proj", hd, hd)
        d[f"{p}.cross_attn.num_points_scale"] = (sum(c.num_points),)  # buffer
        _linear(d, f"{p}.linear1", hd, 1024)
        _linear(d, f"{p}.linear2", 1024, hd)
        _ln(d, f"{p}.norm1", hd)
        _ln(d, f"{p}.norm2", hd)
        _ln(d, f"{p}.norm3", hd)
        _linear(d, f"decoder.dec_score_head.{i}", hd, nc)
        _mlp(f"decoder.dec_bbox_head.{i}", (hd, hd, hd, 4))
    # buffers / training-only params present in the checkpoint
    d["decoder.denoising_class_embed.weight"] = (nc + 1, hd)
    hw = sum((640 // s) ** 2 for s in (8, 16, 32))
    d["decoder.anchors"] = (1, hw, 4)
    d["decoder.valid_mask"] = (1, hw, 1)
    return d


# --------------------------------------------------------------------------
# assertion machinery
# --------------------------------------------------------------------------

def _fake_sd(inventory):
    rng = np.random.RandomState(0)
    return {
        k: rng.standard_normal(shape).astype(np.float32)
        if shape
        else np.zeros((), np.int64)
        for k, shape in inventory.items()
    }


def _flat_shapes(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat_shapes(v, prefix + (str(k),)))
    else:
        out["/".join(prefix)] = tuple(tree.shape)
    return out


def _assert_conversion(model, inventory, init_tree):
    converted = model.convert_torch_state_dict(_fake_sd(inventory))
    got = _flat_shapes(converted)
    want = _flat_shapes(init_tree)
    assert got.keys() == want.keys(), (
        sorted(set(want) - set(got))[:5],
        sorted(set(got) - set(want))[:5],
    )
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def _init_shapes(model, dummy_shape):
    import jax
    import jax.numpy as jnp

    dummy = jnp.zeros(dummy_shape, jnp.float32)
    return jax.eval_shape(
        lambda x: model.core.init(jax.random.PRNGKey(0), x), dummy
    )


def test_dbnet_default_checkpoint_keys():
    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from yomitoku_tpu.models.dbnet import DBNet

    cfg = structured(TextDetectorDBNetV2_1Config)
    model = DBNet(cfg)
    _assert_conversion(model, dbnet_keys(cfg), _init_shapes(model, (1, 64, 64, 3)))


def test_parseq_default_checkpoint_keys():
    import jax
    import jax.numpy as jnp

    from yomitoku_tpu.configs import TextRecognizerPARSeqLargeV41Config
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqLargeV41Config)
    model = PARSeq(cfg)
    h, w = model.core.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    mem = jnp.zeros((1, 4, model.core.enc_embed_dim), jnp.float32)

    def _touch(mdl):
        # mirror of PARSeq.init_params: decoder/head params are only reached
        # through the decode path
        content = mdl.content_embeddings(jnp.zeros((1, 2), jnp.int32))
        q = mdl.position_queries(1, 2)
        return mdl.decode(q, content, mem)

    def _init(x):
        v1 = model.core.init(jax.random.PRNGKey(0), x, method="encode")
        v2 = model.core.init(jax.random.PRNGKey(0), method=_touch)
        return {"params": {**v1["params"], **v2["params"]}}

    init_tree = jax.eval_shape(_init, dummy)
    _assert_conversion(model, parseq_keys(cfg), init_tree)


@pytest.mark.parametrize(
    "cfg_name",
    [
        "LayoutParserRTDETRv2V2Config",
        "TableStructureRecognizerRTDETRv2Config",
        "TableCellParserRTDETRv2BetaConfig",
    ],
)
def test_rtdetr_default_checkpoint_keys(cfg_name):
    import yomitoku_tpu.configs as configs
    from yomitoku_tpu.models.rtdetr import RTDETRv2

    cfg = structured(getattr(configs, cfg_name))
    model = RTDETRv2(cfg)
    # 640x640: top-k query selection needs >= num_queries flat positions
    # (eval_shape only — no compute)
    _assert_conversion(model, rtdetr_keys(cfg), _init_shapes(model, (1, 640, 640, 3)))


def test_parseq_mirror_matches_inventory():
    """The torch mirror used by the numeric parity tests must expose exactly
    the reference checkpoint's key set (guards against the mirror and the
    converter agreeing on wrong names)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from yomitoku_tpu.configs import TextRecognizerPARSeqSmallConfig
    from tests.torch_ref.parseq_torch import PARSeqTorch

    cfg = structured(TextRecognizerPARSeqSmallConfig)
    tmodel = PARSeqTorch(cfg)
    want = set(parseq_keys(cfg))
    got = set(tmodel.state_dict().keys())
    assert got == want, (sorted(want - got)[:5], sorted(got - want)[:5])


def test_dbnet_mirror_matches_inventory():
    torch = pytest.importorskip("torch")  # noqa: F841

    from yomitoku_tpu.configs import TextDetectorDBNetV2_1Config
    from tests.torch_ref.dbnet_torch import DBNetTorch

    cfg = structured(TextDetectorDBNetV2_1Config)
    tmodel = DBNetTorch(hidden_dim=cfg.decoder.hidden_dim)
    want = set(dbnet_keys(cfg))
    got = set(tmodel.state_dict().keys())
    # the mirror deliberately omits the inference-unused adaptive threshold
    # head; everything else must match exactly
    missing = {k for k in want - got if not k.startswith("decoder.thresh")}
    extra = got - want
    assert not missing and not extra, (sorted(missing)[:8], sorted(extra)[:8])
