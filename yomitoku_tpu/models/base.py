"""Base class for JAX model wrappers.

Each model owns a flax module, a parameter pytree, and one or more jitted
device programs.  Compute dtype defaults to bfloat16 on TPU (MXU-native)
and float32 on CPU; parameters are always stored float32.
"""

import os

import jax
import numpy as np

from ..utils.logger import set_logger

logger = set_logger(__name__, "INFO")


def default_compute_dtype():
    import jax.numpy as jnp

    env = os.environ.get("YOMITOKU_TPU_DTYPE")
    if env:
        return {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16, "f32": jnp.float32,
                "float32": jnp.float32}[env.lower()]
    platform = jax.default_backend()
    return jnp.bfloat16 if platform == "tpu" else jnp.float32


def on_host_cpu():
    """Context that pins computation to the host CPU backend.

    Parameter init / weight conversion are host-side jobs: running them on
    the accelerator wastes HBM and (in this dev environment) hits a
    pathologically slow device->host readback path.
    """
    return jax.default_device(jax.local_devices(backend="cpu")[0])


class JaxModel:
    """Holds a linen module + params; subclasses add jitted programs."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._params = None
        self._dparams = None
        self._mesh = None
        #: "msgpack" / "torch" when real pretrained weights loaded,
        #: None for the random-init fallback (weights.py sets it) —
        #: accuracy-sensitive defaults key their self-audits on this
        self.pretrained_source = None

    # -- parameters -----------------------------------------------------

    def init_params(self, seed: int = 0):
        """Build a parameter pytree (used as template and offline fallback)."""
        raise NotImplementedError

    @property
    def params(self):
        if self._params is None:
            self._params = self.init_params(seed=0)
        return self._params

    @params.setter
    def params(self, value):
        self._params = value
        self._dparams = None

    @property
    def dparams(self):
        """Device-resident params.  Host numpy pytrees passed to jit are
        re-uploaded on EVERY call (tens of ms for 100MB models); pin them
        on device once.  Under a mesh they replicate across every chip."""
        if self._dparams is None:
            if self._mesh is not None:
                from ..parallel.mesh import replicated

                self._dparams = jax.device_put(self.params, replicated(self._mesh))
            else:
                self._dparams = jax.device_put(self.params)
        return self._dparams

    # -- multi-chip -----------------------------------------------------

    def use_mesh(self, mesh):
        """Attach a (dp, tp) mesh: params replicate across it and batch
        forwards shard their leading axis over ``dp`` (XLA inserts the
        collectives; on a real slice they ride ICI)."""
        self._mesh = mesh
        self._dparams = None

    def place_batch(self, arr):
        """Place a host batch for the forward program: dp-sharded over
        the mesh when the batch divides evenly, single-device otherwise."""
        import jax.numpy as jnp

        arr = np.asarray(arr)
        if (
            self._mesh is None
            or arr.shape[0] == 0
            or arr.shape[0] % self._mesh.shape["dp"]
        ):
            return jnp.asarray(arr)
        from ..parallel.mesh import batch_sharding

        return jax.device_put(arr, batch_sharding(self._mesh, arr.ndim))

    def param_count(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))

    # -- torch conversion ----------------------------------------------

    def convert_torch_state_dict(self, sd: dict):
        raise NotImplementedError
