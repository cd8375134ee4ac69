from dataclasses import dataclass, field

import pytest

from yomitoku_tpu.config import Config, load_config, merge_into, structured


@dataclass
class Inner:
    x: int = 1
    name: str = "abc"


@dataclass
class Demo:
    a: int = 5
    inner: Inner = field(default_factory=Inner)


def test_structured_defaults():
    cfg = structured(Demo)
    assert cfg.a == 5
    assert cfg.inner.x == 1
    assert cfg.inner.name == "abc"


def test_merge_override():
    cfg = structured(Demo)
    merge_into(cfg, {"a": 9, "inner": {"x": 42}})
    assert cfg.a == 9
    assert cfg.inner.x == 42
    assert cfg.inner.name == "abc"


def test_merge_unknown_key_raises():
    cfg = structured(Demo)
    with pytest.raises(KeyError):
        merge_into(cfg, {"nope": 1})
    with pytest.raises(KeyError):
        merge_into(cfg, {"inner": {"bad": 1}})


def test_load_config_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("a: 7\ninner:\n  name: xyz\n")
    cfg = load_config(Demo, p)
    assert cfg.a == 7
    assert cfg.inner.name == "xyz"


def test_load_config_missing_file():
    with pytest.raises(FileNotFoundError):
        load_config(Demo, "/nonexistent/cfg.yaml")


def test_yaml_roundtrip():
    cfg = structured(Demo)
    import yaml

    assert yaml.safe_load(cfg.to_yaml()) == {"a": 5, "inner": {"x": 1, "name": "abc"}}


def test_kwargs_unpack():
    cfg = Config({"a": 1, "b": 2})

    def f(a, b):
        return a + b

    assert f(**cfg) == 3


def test_model_configs_importable():
    from yomitoku_tpu.configs import DEFAULT_CONFIGS

    assert len(DEFAULT_CONFIGS) == 5
    for c in DEFAULT_CONFIGS:
        cfg = structured(c)
        assert "hf_hub_repo" in cfg


def test_parseq_variant_dims():
    from yomitoku_tpu.configs import (
        TextRecognizerPARSeqLargeV41Config,
        TextRecognizerPARSeqSmallConfig,
        TextRecognizerPARSeqTinyConfig,
    )

    small = structured(TextRecognizerPARSeqSmallConfig)
    assert small.encoder.embed_dim == 384
    assert small.encoder.patch_size == [16, 16]
    assert small.encoder.depth == 9
    tiny = structured(TextRecognizerPARSeqTinyConfig)
    assert tiny.data.img_size == [32, 400]
    assert tiny.max_label_length == 50
    assert tiny.num_tokens == 7121
    large = structured(TextRecognizerPARSeqLargeV41Config)
    assert large.encoder.embed_dim == 768
    assert large.num_tokens == 7121


def test_detector_variant_thresholds():
    from yomitoku_tpu.configs import (
        TextDetectorDBNetConfig,
        TextDetectorDBNetV2_1Config,
    )

    v1 = structured(TextDetectorDBNetConfig)
    assert v1.post_process.thresh == 0.15
    assert v1.post_process.unclip_ratio == 7.0
    v21 = structured(TextDetectorDBNetV2_1Config)
    assert v21.post_process.thresh == 0.3
    assert v21.post_process.box_thresh == 0.4
    assert v21.post_process.unclip_ratio == 3.5
