"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2: no parallelism, no
comm backend); scaling here is a new first-class component, built the TPU
way: a jax.sharding.Mesh over ('data', 'model'), NamedSharding annotations
on batches and parameters, and XLA lowering the induced gradient/activation
reductions to ICI collectives.  The single-chip path is the 1x1 mesh case of
the same code.

  * 'data'  — batch dimension (DP): inputs sharded, grads all-reduced.
    BN batch statistics become *global*-batch statistics automatically (the
    mean over a sharded axis lowers to a psum) — i.e. synced BN, which is
    the faithful equivalent of the reference's single-device batch stats at
    the same global batch size.
  * 'model' — channel dimension (TP): large conv kernels / the DCGAN dense
    layer are sharded on output features; XLA inserts the halo/reduce
    collectives where layouts change.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a ('data', 'model') mesh.  Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    arr = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh):
    """Shard the leading (batch) dimension over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_batch_sharding(mesh):
    """Shard batch over 'data' AND image rows (H) over 'model' — spatial
    parallelism for the conv nets.  XLA inserts the halo exchanges
    (collective-permutes) that stride-1/2 convs need at shard boundaries;
    BN's batch statistics reduce across both axes, so the math is identical
    to the unsharded step (verified in tests/test_parallel.py).  This is the
    scaling axis for resolutions whose activations outgrow one chip's HBM
    (the reference's scaling axis is spatial resolution, SURVEY.md §5)."""
    return NamedSharding(mesh, P("data", "model"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def tp_shardings(params, mesh, min_features=256):
    """Per-leaf NamedShardings: shard wide weight output-features over
    'model'; everything else replicated.  Biases/BN vectors stay replicated —
    XLA inserts the cheap broadcasts/reductions at layout changes."""
    n_model = mesh.shape["model"]

    def spec(leaf):
        if n_model > 1 and hasattr(leaf, "ndim"):
            if (leaf.ndim == 4 and leaf.shape[-1] >= min_features
                    and leaf.shape[-1] % n_model == 0):
                return NamedSharding(mesh, P(None, None, None, "model"))
            if (leaf.ndim == 2 and leaf.shape[-1] >= min_features
                    and leaf.shape[-1] % n_model == 0):
                return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def place(tree, shardings_or_mesh):
    """device_put a pytree onto shardings (or replicate onto a mesh)."""
    if isinstance(shardings_or_mesh, Mesh):
        sh = replicated(shardings_or_mesh)
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree.map(jax.device_put, tree, shardings_or_mesh)
