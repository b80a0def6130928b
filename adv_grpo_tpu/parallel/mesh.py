"""Mesh construction, sharding helpers, and host gathers.

The reference's distributed runtime is accelerate + DeepSpeed ZeRO-2 + raw DDP
over NCCL (SURVEY.md §2.3). The TPU-native equivalent is single-controller JAX:
one ``Mesh(('data',))`` spanning all chips (ICI within a slice, DCN across
hosts via ``jax.distributed.initialize``), params replicated, batches sharded
on the data axis, gradients psum'd by pjit. With LoRA-only training the
optimizer state is tiny, so ZeRO-style state sharding is unnecessary; a
``model`` axis hook is left for larger-than-chip policies (SURVEY.md §2.3 TP
row).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",), devices=None,
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), tuple(axes))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def process_allgather(tree):
    """Host-level gather of per-process objects (prompt strings, numpy rewards).

    Single-process: identity. Multi-host: multihost_utils.process_allgather —
    the analogue of the reference's dist.all_gather_object / tokenized-prompt
    gather trick (train_sd3_fast_pickscore.py:962-969; scripts/eval.py:153-166).
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
