"""Data-parallel execution of model programs over a device mesh.

The reference is strictly single-device (SURVEY.md §2.3); here multi-chip
throughput scaling is a first-class component.  The unit of data
parallelism follows the workload:

  * pages  — DBNet / RT-DETR forwards batch pages (B, H, W, 3),
  * lines  — PARSeq batches line crops (the recognizer minibatch).

``DataParallel`` wraps a jitted ``fn(params, batch, *static)`` so that
params are replicated once (placed per-device, not re-uploaded per call)
and batches are padded to a multiple of ``dp`` and sharded over the mesh's
``dp`` axis.  XLA inserts the collectives; on a real slice they ride ICI.
"""

import numpy as np

import jax

from .mesh import batch_sharding, make_mesh, replicated, shard_batch

__all__ = ["DataParallel", "dp_pages"]


class DataParallel:
    """Shard the leading batch axis of a model program over a mesh.

    >>> mesh = make_mesh(8)
    >>> run = DataParallel(mesh, model._fwd, model.params)
    >>> out = run(batch)          # batch (N, ...) -> out (N, ...)
    """

    def __init__(self, mesh, fn, params, batch_axis: int = 0):
        self.mesh = mesh
        self.fn = fn
        self.params = jax.device_put(params, replicated(mesh))
        # axis of the OUTPUT that carries the batch (e.g. PARSeq's packed
        # (2, B, L) greedy result has it on axis 1)
        self.batch_axis = batch_axis

    def __call__(self, batch: np.ndarray, *static_args):
        sharded, n = shard_batch(self.mesh, np.asarray(batch))
        with self.mesh:
            out = self.fn(self.params, sharded, *static_args)
        idx = (slice(None),) * self.batch_axis + (slice(0, n),)
        return jax.tree.map(lambda x: np.asarray(x)[idx], out)


def dp_pages(model, pages: np.ndarray, n_devices=None, forward="_fwd"):
    """One-shot page-parallel forward: build a dp-only mesh over the local
    devices and run ``model.<forward>`` with pages sharded across it."""
    mesh = make_mesh(n_devices=n_devices, tp=1)
    runner = DataParallel(mesh, getattr(model, forward), model.params)
    return runner(pages)
