"""Device mesh + sharding layer (replaces reference C21: DDP wrap, train.py:218-222).

The reference's only parallelism is data parallelism: DDP all-reduces gradients in
backward over NCCL. TPU-native design: a `jax.sharding.Mesh` with a `data` axis;
the batch is sharded over `data`, parameters are either replicated (pure DP) or
sharded over the same axis on their largest dimension (FSDP / ZeRO-3 style,
`--fsdp`). The train step is a single `jax.jit` with sharding-annotated inputs and
outputs — XLA inserts the gradient all-reduce (or reduce-scatter + all-gather for
FSDP) over ICI automatically; there is no hand-written collective in the hot path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(mesh_shape: str = "", devices=None) -> Mesh:
    """Build the device mesh.

    mesh_shape: '' → 1-D mesh over all devices with axis 'data';
                'data:4,fsdp:2' → 2-D mesh (axes used by sharding rules below).
    """
    if devices is None:
        devices = jax.devices()
    if not mesh_shape:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    names, sizes = [], []
    for part in mesh_shape.split(","):
        name, size = part.split(":")
        names.append(name.strip())
        sizes.append(int(size))
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over every mesh axis; replicate the rest.

    With a pure 'data' mesh this is classic DP batch sharding. With a
    'data,fsdp' mesh the batch shards over both axes (the fsdp axis also acts as
    a data axis for activations, ZeRO-style)."""
    spec = P(mesh.axis_names, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(path_names, x, axis: str, axis_size: int):
    """Shard a parameter's largest divisible dim over `axis`; replicate otherwise.

    Small params (biases, norm scales) stay replicated — sharding them wastes
    latency on gathers for no memory win."""
    shape = getattr(x, "shape", ())
    if not shape or x.size < 2**14:
        return P()
    # Prefer the largest dimension divisible by the axis size.
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % axis_size == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def param_sharding_rules(mesh: Mesh, params, fsdp: bool = False):
    """Return a pytree of NamedShardings for the parameter pytree."""
    if not fsdp:
        rep = replicated_sharding(mesh)
        return jax.tree.map(lambda _: rep, params)
    axis = "fsdp" if "fsdp" in mesh.axis_names else DATA_AXIS
    axis_size = mesh.shape[axis]

    def rule(x):
        return NamedSharding(mesh, _fsdp_spec(None, x, axis, axis_size))

    return jax.tree.map(rule, params)


def shard_params(mesh: Mesh, params, fsdp: bool = False):
    """Place a (host) parameter pytree onto the mesh with DP or FSDP layout.

    One batched device_put for the whole tree — per-leaf puts pay a full
    host↔device round trip each (minutes over a tunneled link)."""
    shardings = param_sharding_rules(mesh, params, fsdp=fsdp)
    return jax.device_put(params, shardings)


def make_global_batch(mesh: Mesh, host_batch):
    """Turn per-process host numpy arrays into a globally-sharded device array.

    Single-process: a plain device_put with batch sharding. Multi-process: each
    process contributes its local shard (reference analogue: DistributedSampler
    sharding, train.py:130-136)."""

    def put(x):
        sh = batch_sharding(mesh, x.ndim)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, host_batch)
