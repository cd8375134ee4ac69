"""CI-tier rehearsal of the real-weight audit pipeline (VERDICT r4 #5).

A seeded torch-mirror checkpoint stands in for the real HF download and
flows through the FULL production load path — weight store ->
weights._find_torch_checkpoint -> convert_torch_state_dict -> msgpack
cache -> TextRecognizer(from_pretrained=True) -> load-time int8-KV
self-audit — and an injected outlier K projection (the failure mode the
audit exists for) must trip the f32 fallback through that same path,
not just the audit unit.  The bulk offline rehearsal is
``python scripts/validate_real_weights.py --rehearse <dir>``.

Reference load path being rehearsed: yomitoku/base.py:80-86
(PyTorchModelHubMixin.from_pretrained).
"""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REC_YAML = str(Path(__file__).parent / "yaml" / "rec_small.yaml")


def _standin_checkpoint(store: Path, seed: int) -> Path:
    """Seeded torch-mirror state_dict saved in download_model's layout."""
    from tests.torch_ref.parseq_torch import PARSeqTorch
    from yomitoku_tpu.config import load_config
    from yomitoku_tpu.configs import TextRecognizerPARSeqLargeV41Config

    cfg = load_config(TextRecognizerPARSeqLargeV41Config, REC_YAML)
    torch.manual_seed(seed)
    mirror = PARSeqTorch(cfg)
    d = store / cfg.hf_hub_repo.split("/")[-1]
    d.mkdir(parents=True)
    path = d / "pytorch_model.bin"
    torch.save(mirror.state_dict(), path)
    return path


def _load_recognizer(monkeypatch, store: Path):
    from yomitoku_tpu.models import parseq as parseq_mod
    from yomitoku_tpu.text_recognizer import TextRecognizer

    monkeypatch.setenv("YOMITOKU_TPU_WEIGHTS", str(store))
    # force the TPU int8 policy so the load-time audit path executes on
    # the CPU test backend (the test is about the PATH, not the platform)
    monkeypatch.setattr(parseq_mod, "_int8_kv_default", lambda: True)
    monkeypatch.delenv("YOMITOKU_TPU_INT8_KV", raising=False)
    return TextRecognizer(
        path_cfg=REC_YAML, device="cpu", from_pretrained=True
    )


def test_outlier_k_trips_int8_fallback_through_load_path(
    tmp_path, monkeypatch
):
    from scripts.validate_real_weights import inject_k_outlier

    # clean stand-in: full path loads it and the audit runs; seed 3 is
    # pinned to a checkpoint whose int8 greedy decode matches f32 (the
    # expected real-checkpoint outcome)
    clean = _standin_checkpoint(tmp_path / "store", seed=3)
    rec = _load_recognizer(monkeypatch, tmp_path / "store")
    assert rec.model.pretrained_source == "torch"
    assert rec.model.int8_kv, "clean audit should keep int8 on"

    # corrupt K projection through the SAME path: audit must fall back
    outlier = tmp_path / "store_outlier" / clean.parent.name / clean.name
    inject_k_outlier(clean, outlier)
    rec2 = _load_recognizer(monkeypatch, tmp_path / "store_outlier")
    assert rec2.model.pretrained_source == "torch"
    assert not rec2.model.int8_kv, "outlier K must trip the f32 fallback"


def test_msgpack_cache_roundtrip_through_load_path(tmp_path, monkeypatch):
    import numpy as np

    _standin_checkpoint(tmp_path / "store", seed=3)
    rec = _load_recognizer(monkeypatch, tmp_path / "store")
    assert rec.model.pretrained_source == "torch"  # converted this load
    # conversion wrote the msgpack cache; a second load must read it and
    # produce the identical param tree
    rec2 = _load_recognizer(monkeypatch, tmp_path / "store")
    assert rec2.model.pretrained_source == "msgpack"
    a = jax.tree_util.tree_leaves(rec.model.params)
    b = jax.tree_util.tree_leaves(rec2.model.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
