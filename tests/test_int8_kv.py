"""int8 cross-attention K/V cache in the PARSeq AR decode loop.

The quantized path must (a) reproduce the f32 cache's greedy decode on
realistic activations and (b) keep the final logits within quantization
noise.  Reference behavior being approximated: the per-step decode of
yomitoku/models/parseq.py:160-186 (here one jitted while_loop)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = [pytest.mark.perf_optin, pytest.mark.slow]
import jax.numpy as jnp  # noqa: E402

from yomitoku_tpu.config import structured  # noqa: E402


def _parseq(int8):
    from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqTinyConfig)
    cfg.encoder.depth = 1
    cfg.encoder.embed_dim = 32
    cfg.encoder.num_heads = 2
    cfg.decoder.embed_dim = 32
    cfg.decoder.num_heads = 2
    cfg.num_tokens = 16
    cfg.max_label_length = 6
    cfg.data.img_size = [16, 32]
    m = PARSeq(cfg)
    m.int8_kv = int8
    m.params = m.init_params(0)
    return m


def test_quantize_roundtrip_error_bounded():
    from yomitoku_tpu.models.layers.attention import quantize_kv_int8

    rng = np.random.RandomState(0)
    k = rng.randn(2, 4, 64, 16).astype(np.float32) * 3.0
    v = rng.randn(2, 4, 64, 16).astype(np.float32)
    # per-(batch, head) scales (default, the fast fold-into-query form)
    kq, sk, vq, sv = quantize_kv_int8(jnp.asarray(k), jnp.asarray(v))
    assert kq.dtype == jnp.int8 and vq.dtype == jnp.int8
    assert sk.shape == (2, 4, 1, 1) and sv.shape == (2, 4, 1, 1)
    k_hat = np.asarray(kq, np.float32) * np.asarray(sk)
    v_hat = np.asarray(vq, np.float32) * np.asarray(sv)
    assert np.all(np.abs(k_hat - k) <= np.asarray(sk) * 0.5 + 1e-6)
    assert np.all(np.abs(v_hat - v) <= np.asarray(sv) * 0.5 + 1e-6)

    # per-row scales (the incrementally-built content cache)
    kq, sk, vq, sv = quantize_kv_int8(
        jnp.asarray(k), jnp.asarray(v), per_row=True
    )
    assert sk.shape == k.shape[:3] and sv.shape == v.shape[:3]
    k_hat = np.asarray(kq, np.float32) * np.asarray(sk)[..., None]
    v_hat = np.asarray(vq, np.float32) * np.asarray(sv)[..., None]
    assert np.all(np.abs(k_hat - k) <= np.asarray(sk)[..., None] * 0.5 + 1e-6)
    assert np.all(np.abs(v_hat - v) <= np.asarray(sv)[..., None] * 0.5 + 1e-6)


@pytest.mark.parametrize("content_int8", [False, True])
def test_int8_kv_matches_f32_decode(content_int8):
    f32 = _parseq(int8=False)
    q8 = _parseq(int8=True)
    q8.int8_kv_content = content_int8
    q8.params = f32.params

    rng = np.random.RandomState(1)
    h, w = f32.core.img_size
    crops = rng.rand(5, h, w, 3).astype(np.float32) * 2.0 - 1.0

    ids_a, probs_a = f32.forward_tokens(crops)
    ids_b, probs_b = q8.forward_tokens(crops)

    # Random-weight logits carry near-ties, and the int8 content cache
    # can flip an argmax at a tie (which then cascades through the AR
    # context: tokens after the first flip legitimately differ).  So:
    # most positions match, and each row's FIRST divergence must be a
    # near-tie of the f32 path (quantization noise, not corruption).
    # The logit-level bound is pinned in test_int8_kv_logits_close.
    match = (ids_a == ids_b).mean()
    assert match >= 0.7, match

    probs_full = f32.forward_probs(crops)  # (B, L, V) softmax of f32 path
    for r in range(ids_a.shape[0]):
        diff = np.nonzero(ids_a[r] != ids_b[r])[0]
        j0 = diff[0] if diff.size else ids_a.shape[1]
        # identical context before the first flip: probs within noise
        np.testing.assert_allclose(
            probs_a[r, :j0], probs_b[r, :j0], atol=2e-2
        )
        if diff.size:
            gap = (
                probs_full[r, j0, ids_a[r, j0]]
                - probs_full[r, j0, ids_b[r, j0]]
            )
            assert gap < 0.05, (r, j0, gap)


def test_int8_kv_logits_close():
    """Full final logits (refine pass off -> pure AR loop output) stay
    within quantization noise of the f32-cache program."""
    f32 = _parseq(int8=False)
    q8 = _parseq(int8=True)
    q8.params = f32.params
    f32.refine_iters = 0
    q8.refine_iters = 0

    rng = np.random.RandomState(2)
    h, w = f32.core.img_size
    crops = rng.rand(3, h, w, 3).astype(np.float32) * 2.0 - 1.0

    la = np.asarray(
        f32._probs_fn(f32.dparams, jnp.asarray(crops), True, 0)
    )
    lb = np.asarray(q8._probs_fn(q8.dparams, jnp.asarray(crops), True, 0))
    assert np.abs(la - lb).max() < 0.02, np.abs(la - lb).max()
