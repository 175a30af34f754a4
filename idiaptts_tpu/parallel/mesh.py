"""Device mesh utilities: data-parallel training over ICI.

The TPU-native replacement for the reference's single-node
``torch.nn.DataParallel`` (ModularModelHandlerPyTorch.py:731-735; see
SURVEY.md §2.8): a 1-D ``jax.sharding.Mesh`` over the ``data`` axis,
batches sharded on their leading dimension, parameters replicated.
``jax.jit`` with explicit in/out shardings makes XLA insert the gradient
all-reduce over ICI; no scatter/gather, no remainder-dropping collate.

Multi-host (DCN) extension: call ``jax.distributed.initialize()`` before
building the mesh and the same code spans slices.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices=None, axis_name="data"):
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh, axis_name="data"):
    """Put batch arrays on the mesh, sharded along the leading axis.
    Non-divisible or scalar entries are replicated."""
    num = mesh.devices.size
    data_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % num == 0:
            return jax.device_put(x, data_sharding)
        return jax.device_put(x, replicated)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(loss_fn, optimiser, mesh, axis_name="data"):
    """jit a data-parallel train step with explicit shardings.

    loss_fn(params, batch) -> scalar loss.  Params/opt state replicated,
    batch sharded over ``axis_name``; requesting replicated outputs
    makes XLA all-reduce the gradients over ICI.
    """
    repl = NamedSharding(mesh, P())

    @partial(jax.jit,
             out_shardings=(repl, repl, repl))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimiser.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def initialise_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host (DCN) initialisation: call before building the mesh
    and the same data-parallel code spans slices
    (jax.distributed.initialize wrapper; SURVEY.md §2.8)."""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.devices()
