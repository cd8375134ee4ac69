"""Pretrained weight management.

Replaces the reference's HF-Hub ``PyTorchModelHubMixin.from_pretrained``
(yomitoku/base.py:84) with a local checkpoint store:

  * native format: flax msgpack serialized param pytrees, cached per model
    repo name under ``$YOMITOKU_TPU_WEIGHTS`` (default
    ``~/.cache/yomitoku_tpu/weights``);
  * conversion path: a PyTorch ``state_dict`` checkpoint
    (``pytorch_model.bin`` / ``model.safetensors``) placed in the store is
    converted through the model's ``convert_torch_state_dict`` (torch
    OIHW conv weights -> NHWC/HWIO pytrees) and re-cached as msgpack;
  * offline fallback: deterministic random initialization (seed 0) with a
    loud warning, so pipelines stay runnable without network access.
"""

import os
from pathlib import Path

import numpy as np

from .utils.logger import set_logger

logger = set_logger(__name__, "INFO")


def weights_dir() -> Path:
    d = os.environ.get("YOMITOKU_TPU_WEIGHTS")
    if d:
        return Path(d)
    return Path.home() / ".cache" / "yomitoku_tpu" / "weights"


def _repo_name(cfg) -> str:
    return str(cfg.hf_hub_repo).split("/")[-1]


def _msgpack_path(cfg) -> Path:
    return weights_dir() / f"{_repo_name(cfg)}.msgpack"


def save_params_msgpack(params, path: Path):
    from flax import serialization

    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(params))


def load_params_msgpack(template, path: Path):
    from flax import serialization

    return serialization.from_bytes(template, path.read_bytes())


def _find_torch_checkpoint(cfg):
    base = weights_dir() / _repo_name(cfg)
    for name in ("model.safetensors", "pytorch_model.bin"):
        for cand in (base / name, weights_dir() / f"{_repo_name(cfg)}_{name}"):
            if cand.exists():
                return cand
    return None


def load_torch_state_dict(path: Path) -> dict:
    """Load a torch checkpoint into numpy arrays (no torch needed for
    safetensors)."""
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def load_pretrained_params(model, cfg):
    """Resolve pretrained params for ``model``; see module docstring."""
    mp = _msgpack_path(cfg)
    template = model.init_params(seed=0)
    if mp.exists():
        logger.info(f"Loading weights from {mp}")
        model.pretrained_source = "msgpack"
        return load_params_msgpack(template, mp)

    tc = _find_torch_checkpoint(cfg)
    if tc is not None and hasattr(model, "convert_torch_state_dict"):
        logger.info(f"Converting torch checkpoint {tc}")
        sd = load_torch_state_dict(tc)
        params = model.convert_torch_state_dict(sd)
        save_params_msgpack(params, mp)
        model.pretrained_source = "torch"
        return params

    logger.warning(
        f"No pretrained weights found for {cfg.hf_hub_repo} in {weights_dir()} "
        "— using RANDOM initialization. Place the torch checkpoint "
        f"({_repo_name(cfg)}/model.safetensors) or a converted msgpack in the "
        "weight store for real predictions."
    )
    return template


def seeded_normal(shape, std=0.02, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * std).astype(dtype)
