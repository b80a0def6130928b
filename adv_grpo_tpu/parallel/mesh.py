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

    devices = mesh.devices.flatten()

    def put(x):
        # skip the no-op: a committed array already placed as the target
        # sharding requires. On a remote-device backend (the axon tunnel)
        # the redundant device_put of a multi-GB tree can round-trip through
        # the host link; placement-wise it changes nothing. For a 1-device
        # mesh ANY committed array on that device is already "replicated".
        xsh = getattr(x, "sharding", None)
        if xsh is not None:
            if xsh == sh:
                return x
            if (len(devices) == 1
                    and tuple(getattr(xsh, "device_set", ())) == (devices[0],)):
                return x
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)


def put_tree(tree, mesh: Mesh, spec: P):
    """Place host arrays onto the mesh under ``spec``.

    Single-process: ``device_put`` of the full (global) arrays. Multi-process:
    each host holds only ITS shard of the batch, so the global array is
    assembled with ``jax.make_array_from_process_local_data`` — the JAX-native
    replacement for the reference's per-rank DataLoader + DDP input split
    (train_sd3_fast_pickscore.py:663-664).
    """
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def put_batch(tree, mesh: Mesh):
    """Leading-axis batch placement (P('data')), multi-host aware."""
    return put_tree(tree, mesh, P("data"))


def to_local_np(x) -> np.ndarray:
    """Device array -> this process's batch shard as numpy.

    Single-process: the whole array. Multi-host: the local devices' shards
    concatenated in batch order (the inverse of put_batch) — global arrays are
    not fully addressable from one host, so hosts post-process only their own
    rows (reference: each DDP rank scores its own images, rewards.py:1012-1095).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    # replica_id == 0 dedups copies on any replicated mesh axis (e.g. a
    # future 'model' axis): each batch shard appears once per replica in
    # addressable_shards and naive concatenation would duplicate rows
    shards = sorted((s for s in x.addressable_shards if s.replica_id == 0),
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def gather_global(x: np.ndarray):
    """Host-gather a per-process NUMERIC array along axis 0.

    Returns ``(global_array, local_slice)`` where ``global_array[local_slice]``
    is this process's contribution. This is the analogue of the reference's
    gather->stat->ungather advantage dance (train_sd3_fast_pickscore.py:960-999)
    — and of its tokenized-prompt gather trick (:962-969): callers gather
    prompt IDS (ints), never python strings, so the payload is something
    ``multihost_utils.process_allgather`` can actually move.
    """
    x = np.asarray(x)
    if x.dtype == object or x.dtype.kind in ("U", "S"):
        raise TypeError(
            "gather_global requires a numeric array; gather prompt IDs / "
            "tokenized prompts, not strings (reference "
            "train_sd3_fast_pickscore.py:962-969)")
    if jax.process_count() == 1:
        return x, slice(0, x.shape[0])
    from jax.experimental import multihost_utils

    g = np.asarray(multihost_utils.process_allgather(x))  # (P, n, ...)
    n = x.shape[0]
    start = jax.process_index() * n
    return g.reshape((-1,) + x.shape[1:]), slice(start, start + n)


def process_allgather(tree):
    """Host-level gather of per-process NUMERIC arrays (rewards, token ids).

    Single-process: identity. Multi-host: multihost_utils.process_allgather.
    Strings/objects are rejected — gather token ids or dataset indices instead
    (the reference's own trick, train_sd3_fast_pickscore.py:962-969).
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        a = np.asarray(leaf)
        if a.dtype == object or a.dtype.kind in ("U", "S"):
            raise TypeError(
                "process_allgather cannot gather strings/objects; gather "
                "prompt ids (see gather_global)")
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
