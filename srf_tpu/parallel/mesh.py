"""Device mesh and sharding helpers.

The reference's only distribution strategy is synchronous single-node data
parallelism via ``tf.distribute.MirroredStrategy`` (reference:
tfsr/trainer_sr.py:139-149, SURVEY.md §2.10). The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over a ``data`` axis:

- batches are sharded on their leading axis (NamedSharding P('data')),
- parameters are replicated (NamedSharding P()),
- gradient all-reduce is the psum XLA inserts for the replicated-output
  loss/grad computation — riding ICI, no NCCL analog to manage,
- the global-batch loss scaling semantics of
  ``tf.nn.compute_average_loss(..., global_batch_size=batch*n_replicas)``
  are preserved by dividing by the *global* batch inside the sharded step.

The mesh also carries an optional ``model`` axis so wider layouts (sharding
the class-capsule dimension or attention heads) can be expressed without
restructuring; with model=1 it is inert.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data=-1, num_model=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    if num_data < 0:
        num_data = max(1, len(devices) // num_model)
    devs = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def put_sharded(arrays, sharding):
    """Stage host arrays onto devices under ``sharding``.

    Single-process: a plain ``device_put``. Multi-process: the loaders
    yield each process's LOCAL shard (round-robin per-process sharding,
    data/loader.py), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the global leading-axis
    order interleaves processes, a permutation of the single-process batch,
    which leaves the summed loss / gradients unchanged (tested in
    tests/test_distributed.py with two real OS processes)."""
    if sharding is not None and jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            arrays,
        )
    if sharding is not None:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), arrays)
    return jax.tree.map(jax.device_put, arrays)


def make_global_replicated(tree, mesh):
    """Turn a host-local pytree (e.g. a freshly initialized or restored
    TrainState) into GLOBAL fully-replicated jax.Arrays over ``mesh``.

    Single-process this is a no-op (jit's in_shardings place host-local
    arrays fine). Multi-process it matters twice over: jit inputs must be
    globally addressable, and orbax refuses to serialize host-local
    arrays in a multi-host setting — so a state that never went through a
    train step (0-batch epoch, decode-only restore) must still be global
    before it reaches a collective checkpoint save."""
    if jax.process_count() <= 1:
        return tree
    repl = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)
        ),
        tree,
    )


def shard_batch(mesh, batch):
    """Place a host batch dict onto the mesh, sharded over 'data'."""
    sharding = batch_sharding(mesh)
    arrays = {
        k: v for k, v in batch.items()
        if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
    }
    rest = {k: v for k, v in batch.items() if k not in arrays}
    out = put_sharded(arrays, sharding)
    out.update(rest)
    return out
