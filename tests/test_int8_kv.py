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


# ------------------------------------------------- self-verifying default

def _parseq_audit():
    """Tiny-but-not-trivial PARSeq (64-dim, depth 2) — the size the audit
    divergence injection below was calibrated on."""
    from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig
    from yomitoku_tpu.models.parseq import PARSeq

    cfg = structured(TextRecognizerPARSeqTinyConfig)
    cfg.encoder.depth = 2
    cfg.encoder.embed_dim = 64
    cfg.encoder.num_heads = 2
    cfg.decoder.embed_dim = 64
    cfg.decoder.num_heads = 2
    cfg.num_tokens = 32
    cfg.max_label_length = 8
    cfg.data.img_size = [32, 64]
    return PARSeq(cfg)


def test_audit_int8_kv_clean_params_keep_int8():
    m = _parseq_audit()
    m.params = m.init_params(0)
    m.int8_kv = True
    m._build_programs()
    assert m.audit_int8_kv() is True
    assert m.int8_kv is True


def test_audit_int8_kv_outlier_k_trips_fallback():
    """A synthetic outlier dimension in a cross-attention K projection
    (the failure mode per-head symmetric quantization is vulnerable to)
    must flip greedy ids in the audit batch -> int8 disabled + warned,
    and the f32 decode keeps working."""
    import logging

    m = _parseq_audit()
    p = m.init_params(0)
    k = np.array(
        p["params"]["decoder"]["layers_0"]["cross_attn"]["k_proj"]["kernel"]
    )
    k[:, 0] *= 20.0  # calibrated: flips greedy on this seed/size
    p["params"]["decoder"]["layers_0"]["cross_attn"]["k_proj"]["kernel"] = k
    m.params = p
    m.int8_kv = True
    m._build_programs()

    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record)

    lg = logging.getLogger("yomitoku_tpu.models.parseq")
    h = _Catch()
    lg.addHandler(h)
    try:
        ok = m.audit_int8_kv()
    finally:
        lg.removeHandler(h)
    assert ok is False
    assert m.int8_kv is False
    assert any("diverges" in r.getMessage() for r in records)
    # the fallback decode path still runs
    h_, w_ = m.core.img_size
    batch = np.random.RandomState(1).rand(1, h_, w_, 3).astype(np.float32)
    ids, probs = m.forward_tokens(batch)
    assert ids.shape[0] == 1


def test_recognizer_triggers_audit_on_real_weights(monkeypatch, tmp_path):
    """TextRecognizer must run the int8 audit exactly when params are
    REAL (converted/msgpack) and the user did not force the choice, and
    must apply its verdict."""
    from yomitoku_tpu.models.parseq import PARSeq
    from yomitoku_tpu.text_recognizer import TextRecognizer
    from yomitoku_tpu.weights import save_params_msgpack

    monkeypatch.setenv("YOMITOKU_TPU_WEIGHTS", str(tmp_path))
    monkeypatch.delenv("YOMITOKU_TPU_INT8_KV", raising=False)
    # simulate the TPU default on the CPU test backend
    import yomitoku_tpu.models.parseq as parseq_mod

    monkeypatch.setattr(parseq_mod, "_int8_kv_default", lambda: True)

    calls = []

    def fake_audit(self, batch=None):
        calls.append(1)
        self.int8_kv = False  # pretend divergence
        return False

    monkeypatch.setattr(PARSeq, "audit_int8_kv", fake_audit)

    # stage msgpack weights for the tiny model in the temp store
    from yomitoku_tpu.config import load_config
    from yomitoku_tpu.configs import TextRecognizerPARSeqTinyConfig

    cfg = load_config(TextRecognizerPARSeqTinyConfig, "tests/yaml/rec_small.yaml")
    template = PARSeq(cfg).init_params(0)
    repo = str(cfg.hf_hub_repo).split("/")[-1]
    save_params_msgpack(template, tmp_path / f"{repo}.msgpack")

    rec = TextRecognizer(
        model_name="parseq-tiny", path_cfg="tests/yaml/rec_small.yaml",
        device="cpu", from_pretrained=True,
    )
    assert rec.model.pretrained_source == "msgpack"
    assert calls == [1]
    assert rec.model.int8_kv is False  # verdict applied

    # random weights -> no audit
    calls.clear()
    rec2 = TextRecognizer(
        model_name="parseq-tiny", path_cfg="tests/yaml/rec_small.yaml",
        device="cpu", from_pretrained=False,
    )
    assert rec2.model.pretrained_source is None
    assert calls == []

    # explicit user choice -> no audit
    monkeypatch.setenv("YOMITOKU_TPU_INT8_KV", "1")
    rec3 = TextRecognizer(
        model_name="parseq-tiny", path_cfg="tests/yaml/rec_small.yaml",
        device="cpu", from_pretrained=True,
    )
    assert calls == []
    assert rec3.model.int8_kv is True
