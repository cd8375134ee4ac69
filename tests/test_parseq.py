import numpy as np
import pytest

pytestmark = pytest.mark.slow

from yomitoku_tpu.config import structured
from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig


def tiny_cfg():
    cfg = structured(TextRecognizerPARSeqTinyConfig)
    cfg.encoder.depth = 1
    cfg.encoder.embed_dim = 32
    cfg.encoder.num_heads = 2
    cfg.decoder.embed_dim = 32
    cfg.decoder.num_heads = 2
    cfg.num_tokens = 20
    cfg.max_label_length = 4
    cfg.data.img_size = [32, 32]
    return cfg


@pytest.fixture(scope="module")
def tiny_model():
    from yomitoku_tpu.models.parseq import PARSeq

    m = PARSeq(tiny_cfg())
    m.params = m.init_params(0)
    return m


def test_mha_matches_torch():
    """Our MHA + packed-weight conversion must reproduce torch
    nn.MultiheadAttention numerics (the reference decoder's building block)."""
    import jax.numpy as jnp
    import torch

    from yomitoku_tpu.models.layers.attention import MultiHeadAttention
    from yomitoku_tpu.models.weights_convert import SDReader, _packed_mha

    D, H, B, Lq, Lk = 32, 4, 2, 5, 7
    torch.manual_seed(0)
    tmha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    tmha.eval()
    q = torch.randn(B, Lq, D)
    k = torch.randn(B, Lk, D)
    v = torch.randn(B, Lk, D)
    attn_mask = torch.zeros(Lq, Lk, dtype=torch.bool)
    attn_mask[:, -2:] = True
    kpm = torch.zeros(B, Lk, dtype=torch.bool)
    kpm[0, 0] = True
    with torch.no_grad():
        t_out, _ = tmha(q, k, v, attn_mask=attn_mask, key_padding_mask=kpm)

    sd = {f"a.{k_}": v_.numpy() for k_, v_ in tmha.state_dict().items()}
    params = {"params": _packed_mha(SDReader(sd), "a", D)}
    jmha = MultiHeadAttention(D, H)
    j_out = jmha.apply(
        params,
        jnp.asarray(q.numpy()),
        jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()),
        attn_mask=jnp.asarray(attn_mask.numpy()),
        key_padding_mask=jnp.asarray(kpm.numpy()),
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)


def test_forward_probs_shape(tiny_model):
    x = np.random.RandomState(0).rand(3, 32, 32, 3).astype(np.float32)
    p = tiny_model.forward_probs(x)
    assert p.shape == (3, 5, 18)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)


def test_ar_loop_matches_naive_decode(tiny_model):
    """The jitted while_loop AR decode must equal a naive step-by-step
    greedy decode using the same modules (reference loop semantics,
    models/parseq.py:160-186).  The naive loop is a Python loop with
    jitted steps (eager mode on this platform is slow AND low-precision)."""
    import jax
    import jax.numpy as jnp

    m = tiny_model
    core, params = m.core, m.params
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)

    L = m.max_label_length + 1
    encode = jax.jit(lambda p, xx: core.apply(p, xx, method="encode"))
    @jax.jit
    def step(p, tgt, memory, i):
        q = jax.lax.dynamic_slice_in_dim(
            core.apply(p, 2, L, method="position_queries"), i, 1, axis=1
        )
        content = core.apply(p, tgt, method="content_embeddings")
        qmask = jax.lax.dynamic_slice_in_dim(
            jnp.triu(jnp.ones((L, L), jnp.bool_), 1), i, 1, axis=0
        )
        return core.apply(p, q, content, memory, qmask, method="decode")

    memory = encode(params, jnp.asarray(x))
    tgt_in = np.full((2, L), m.pad_id, np.int32)
    tgt_in[:, 0] = m.bos_id
    logits_steps = []
    for i in range(L):
        p_i = np.asarray(step(params, jnp.asarray(tgt_in), memory, i), np.float32)
        logits_steps.append(p_i)
        if i + 1 < L:
            tgt_in[:, i + 1] = p_i[:, 0].argmax(-1)
    naive = np.concatenate(logits_steps, axis=1)

    m.refine_iters = 0
    try:
        probs = m.forward_probs(x)
    finally:
        m.refine_iters = 1
    naive_probs = np.exp(naive - naive.max(-1, keepdims=True))
    naive_probs /= naive_probs.sum(-1, keepdims=True)
    np.testing.assert_allclose(probs, naive_probs, atol=2e-4)


def test_refine_changes_logits(tiny_model):
    x = np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32)
    m = tiny_model
    with_refine = m.forward_probs(x)
    m.refine_iters = 0
    try:
        without = m.forward_probs(x)
    finally:
        m.refine_iters = 1
    assert with_refine.shape == without.shape


def test_tokenizer_roundtrip():
    from yomitoku_tpu.postprocessor.parseq_tokenizer import ParseqTokenizer

    tok = ParseqTokenizer("abc")
    assert tok.eos_id == 0
    assert tok.bos_id == len("abc") + 1
    assert tok.pad_id == len("abc") + 2
    enc = tok.encode(["ab", "c"])
    assert enc.shape == (2, 4)
    assert enc[0].tolist() == [tok.bos_id, 1, 2, tok.eos_id]
    assert enc[1].tolist() == [tok.bos_id, 3, tok.eos_id, tok.pad_id]


def test_tokenizer_decode_truncates_at_eos():
    from yomitoku_tpu.postprocessor.parseq_tokenizer import ParseqTokenizer

    tok = ParseqTokenizer("abc")
    C = len(tok) - 2  # model predicts without BOS/PAD
    L = 5
    dists = np.full((1, L, C), 0.01, np.float32)
    # "ab" then EOS then garbage
    dists[0, 0, 1] = 0.9
    dists[0, 1, 2] = 0.8
    dists[0, 2, 0] = 0.7
    dists[0, 3, 3] = 0.6
    dists[0, 4, 3] = 0.6
    texts, probs = tok.decode(dists)
    assert texts == ["ab"]
    np.testing.assert_allclose(probs[0], 0.9 * 0.8 * 0.7, atol=1e-6)


def test_tokenizer_decode_no_eos():
    from yomitoku_tpu.postprocessor.parseq_tokenizer import ParseqTokenizer

    tok = ParseqTokenizer("abc")
    dists = np.zeros((1, 2, 4), np.float32)
    dists[0, :, 1] = 1.0
    texts, probs = tok.decode(dists)
    assert texts == ["aa"]
    np.testing.assert_allclose(probs[0], 1.0)
