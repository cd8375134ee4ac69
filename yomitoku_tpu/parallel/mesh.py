"""Device mesh + sharding rules.

The reference is single-device (SURVEY.md §2.3: no torch.distributed
anywhere); here scale-out is a first-class component.  The models are small
(≤~100M params) so the scaling axis is *throughput*: data-parallel over
pages and line-crop batches, with optional tensor-parallel sharding of the
vocab-sized matrices (the 7k-char recognizer head/embedding are the only
parameters large enough to matter).

Everything is expressed through ``jax.sharding``: we build a 2-D
``Mesh((dp, tp))``, place params/batches with ``NamedSharding``, and let
XLA insert the collectives (all-gather for the tp-sharded head, all-reduce
for batch-global reductions such as the AR-decode early-exit vote).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, tp: int = 1, devices=None) -> Mesh:
    """A (dp, tp) mesh over the first ``n_devices`` local devices.

    dp (data parallel) rides the outer axis so that, on a real slice,
    tp groups map to ICI-adjacent chips.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def dp_mesh(num_devices=None):
    """dp-only mesh over the local devices for pipeline integration.

    ``num_devices``: None/0/1 -> no mesh (single-device path); -1 -> all
    local devices; N -> first min(N, available).  Returns None whenever
    fewer than 2 devices would participate, so callers can gate on it.
    """
    if num_devices in (None, 0, 1):
        return None
    devs = jax.devices()
    n = len(devs) if num_devices == -1 else min(int(num_devices), len(devs))
    if n < 2:
        return None
    return make_mesh(n_devices=n, tp=1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def parseq_param_shardings(params, mesh: Mesh):
    """Sharding tree for PARSeq params: tensor-parallel over the vocab.

    - recognition head kernel (D, V): split V over tp (the single biggest
      matmul — 7k+ classes);
    - token embedding (V, D): split V over tp (XLA turns the gather into
      a sharded lookup + all-reduce);
    - everything else replicated (tiny relative to activations).
    Dims not divisible by tp fall back to replication.
    """
    tp = mesh.shape["tp"]

    def rule(path, x):
        name = _path_str(path)
        if x.ndim == 2:
            if name.endswith("head/kernel") and x.shape[1] % tp == 0:
                return NamedSharding(mesh, P(None, "tp"))
            if name.endswith("text_embed/embedding") and x.shape[0] % tp == 0:
                return NamedSharding(mesh, P("tp", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, shardings):
    return jax.device_put(params, shardings)


def shard_batch(mesh: Mesh, batch: np.ndarray):
    """Pad the batch to a multiple of dp and place it dp-sharded."""
    dp = mesh.shape["dp"]
    n = batch.shape[0]
    rem = (-n) % dp
    if rem:
        batch = np.concatenate(
            [batch, np.zeros((rem,) + batch.shape[1:], batch.dtype)], axis=0
        )
    return jax.device_put(batch, batch_sharding(mesh, batch.ndim)), n
