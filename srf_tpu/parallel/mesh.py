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


def shard_batch(mesh, batch):
    """Place a host batch dict onto the mesh, sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and x.ndim > 0
        else x,
        batch,
    )
