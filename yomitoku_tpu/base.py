"""Base runtime: module base class, model catalog, timing observer.

Reference parity: yomitoku/base.py.  Differences by design:
  * models are functional JAX (flax) modules — ``load_model`` builds the
    module + a parameter pytree instead of a torch ``nn.Module``;
  * device selection targets JAX platforms (``tpu``/``cpu``) with graceful
    fallback instead of cuda/mps;
  * weights load from a local checkpoint store (orbax/msgpack or a converted
    torch state_dict) — see yomitoku_tpu/weights.py.
"""

import time

from pydantic import BaseModel, ConfigDict

from .config import Config, load_config, save_config
from .utils.logger import set_logger

logger = set_logger(__name__, "INFO")


_COMPILE_CACHE_SET = False


def enable_compilation_cache():
    """Persistent XLA compilation cache (shared across processes).

    The big model programs take minutes to compile on CPU and ~20-40s on
    TPU; caching them on disk makes every process after the first start
    instantly.  Disable with YOMITOKU_TPU_COMPILE_CACHE=0."""
    global _COMPILE_CACHE_SET
    if _COMPILE_CACHE_SET:
        return
    _COMPILE_CACHE_SET = True
    import os

    if os.environ.get("YOMITOKU_TPU_COMPILE_CACHE", "1") == "0":
        return
    import jax

    cache_dir = os.environ.get("YOMITOKU_TPU_COMPILE_CACHE_DIR")
    if not cache_dir:
        # Namespace by host CPU fingerprint: XLA's cache key does not
        # include the host machine features, so a CPU AOT entry compiled
        # on one machine loads on another with "machine type doesn't
        # match" errors (and a documented SIGILL risk) when the cache
        # directory is shared or migrated between hosts.
        import hashlib
        import platform

        try:
            with open("/proc/cpuinfo") as f:
                flags = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            flags = ""
        tag = hashlib.sha1(
            (platform.machine() + flags).encode()
        ).hexdigest()[:10]
        cache_dir = os.path.expanduser(
            f"~/.cache/yomitoku_tpu/xla_cache/{tag}"
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # config name drift across jax versions
        logger.warning(f"compilation cache unavailable: {e}")


def observer(cls, func):
    """Wrap a callable with wall-clock INFO timing (reference base.py:36).

    When ``YOMITOKU_TPU_PROFILE=<dir>`` is set, each observed call is also
    captured as a jax.profiler trace (host + device timelines) under
    ``<dir>/<Module>/``; summarize with ``scripts/xplane_summary.py``."""

    def wrapper(*args, **kwargs):
        import os

        profile_dir = os.environ.get("YOMITOKU_TPU_PROFILE")
        trace = None
        if profile_dir:
            import jax.profiler

            trace = jax.profiler.trace(
                os.path.join(profile_dir, cls.__name__)
            )
            trace.__enter__()
        try:
            start = time.time()
            result = func(*args, **kwargs)
            elapsed = time.time() - start
            logger.info(f"{cls.__name__} {func.__name__} elapsed_time: {elapsed}")
        except Exception as e:
            logger.error(f"Error occurred in {cls.__name__} {func.__name__}: {e}")
            raise e
        finally:
            if trace is not None:
                trace.__exit__(None, None, None)
        return result

    wrapper._is_observer = True
    return wrapper


class BaseSchema(BaseModel):
    model_config = ConfigDict(extra="forbid", validate_assignment=True)

    def to_json(self, out_path: str, **kwargs):
        from .export import export_json

        return export_json(self, out_path, **kwargs)


class BaseModelCatalog:
    """Registry mapping model-variant name -> (default config, model class)."""

    def __init__(self):
        self.catalog = {}

    def get(self, model_name: str):
        model_name = model_name.lower()
        if model_name in self.catalog:
            return self.catalog[model_name]
        raise ValueError(f"Unknown model: {model_name}")

    def register(self, model_name: str, config, model):
        if model_name in self.catalog:
            raise ValueError(f"{model_name} is already registered.")
        self.catalog[model_name] = (config, model)

    def list_model(self):
        return list(self.catalog.keys())


def resolve_device(device: str) -> str:
    """Map a requested device string to an available JAX platform.

    Accepts "tpu", "cpu", and — for API compatibility with the reference —
    "cuda"/"mps" (treated as a request for the accelerator, i.e. TPU).
    Falls back to CPU with a warning when no TPU is present.
    """
    import jax

    want_accel = any(k in device.lower() for k in ("tpu", "cuda", "gpu", "mps"))
    platforms = {d.platform for d in jax.devices()}
    if want_accel:
        for p in platforms:
            if p != "cpu":
                return p
        logger.warning("No accelerator available. Using CPU instead.")
        return "cpu"
    return "cpu"


class BaseModule:
    """Common base for task modules (detector/recognizer/layout/...).

    Subclasses set ``model_catalog`` and call ``load_model`` in __init__.
    ``__call__`` is wrapped in the timing observer, as in the reference.
    """

    model_catalog = None

    def __init__(self):
        if self.model_catalog is None:
            raise NotImplementedError
        if not issubclass(self.model_catalog.__class__, BaseModelCatalog):
            raise ValueError(
                f"{self.model_catalog.__class__} is not SubClass BaseModelCatalog."
            )
        if len(self.model_catalog.list_model()) == 0:
            raise ValueError("No model is registered.")

    def __new__(cls, *args, **kwds):
        logger.info(f"Initialize {cls.__name__}")
        # Wrap once per class: __new__ runs per INSTANTIATION, and stacking
        # observers would nest jax.profiler traces (a hard RuntimeError
        # under YOMITOKU_TPU_PROFILE) and duplicate log lines.
        if not getattr(cls.__call__, "_is_observer", False):
            cls.__call__ = observer(cls, cls.__call__)
        return super().__new__(cls)

    def load_model(self, name, path_cfg=None, from_pretrained=True):
        enable_compilation_cache()
        default_cfg, Net = self.model_catalog.get(name)
        self._cfg = load_config(default_cfg, path_cfg)
        self.model = Net(cfg=self._cfg)
        if from_pretrained:
            from .weights import load_pretrained_params

            self.model.params = load_pretrained_params(self.model, self._cfg)

    def save_config(self, path_cfg):
        save_config(self._cfg, path_cfg)

    def log_config(self):
        logger.info(self._cfg.to_yaml())

    @classmethod
    def catalog(cls):
        display = ""
        for model in cls.model_catalog.list_model():
            display += f"{model} "
        logger.info(f"{cls.__name__} Implemented Models")
        logger.info(display)

    @property
    def device(self) -> str:
        return self._device

    @device.setter
    def device(self, device: str):
        self._device = resolve_device(device)
