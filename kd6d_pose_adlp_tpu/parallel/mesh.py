"""SPMD device mesh + sharding helpers.

The reference's only parallel strategy is data parallelism over
torch.distributed/gloo, with a quirk that disabled gradient sync
(SURVEY §2.10). TPU-native design: a 1-D `Mesh('data')`; the entire train
step (teacher fwd + student fwd/bwd + optimizer) compiles once under jit with
batch-sharded inputs and replicated params; XLA inserts the ICI collectives
(gradient reductions come out of the global-sum losses automatically).

No TP/PP/EP/SP is built: the model is a <42M-param ConvNet with no attention,
sequence, or expert structure (SURVEY §5.7) — batch is the only scale axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding for every array in a Batch pytree."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device_put a host batch with its leading axis split over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def pad_for_allgather(payload: bytes, cap: int) -> np.ndarray:
    """Fixed-shape uint8 buffer for a cross-process allgather (all processes
    must contribute identical shapes). Split out for unit testing."""
    assert len(payload) <= cap, (len(payload), cap)
    buf = np.zeros((cap,), np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    return buf


def gather_host_objects(obj):
    """All-gather an arbitrary picklable host object across processes;
    returns the list of every process's object (this process's included).

    Functional replacement for the reference's pickle-over-ByteTensor
    `all_gather` (`libs/distributed.py:44-76`): sizes are exchanged first,
    then the pickled payloads ride one fixed-shape uint8 allgather. Identity
    (a 1-element list) on a single process."""
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    payload = pickle.dumps(obj)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray(len(payload), np.int64)))
    cap = int(sizes.max())
    gathered = np.asarray(multihost_utils.process_allgather(
        pad_for_allgather(payload, cap)))
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(gathered.shape[0])]


def gather_eval_pytree(tree):
    """Multi-host gather of fixed-shape eval arrays (replaces the reference's
    pickle-over-ByteTensor `all_gather`, libs/distributed.py:44-76). On a
    single process this is the identity; on multi-host it concatenates the
    per-process leading axes via `multihost_utils.process_allgather`."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)
