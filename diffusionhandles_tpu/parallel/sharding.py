"""Parameter sharding rules (tensor parallelism) for the SD stack.

Megatron-style TP over the 'model' mesh axis:
* attention to_q/to_k/to_v: shard output features (head dim groups);
  to_out: shard input features (row-parallel; XLA inserts the psum).
* GEGLU ff_proj: column-parallel (output); ff_out: row-parallel (input).
* conv kernels: shard output channels; shortcut/proj convs likewise.
* norms, biases, embeddings: replicated.

XLA's SPMD partitioner turns these annotations into ICI collectives; nothing
here issues communication manually (see SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels sharded on output features (column-parallel).
_COL_PARALLEL = ("to_q", "to_k", "to_v", "ff_proj", "proj_in",
                 "time_embedding_linear_1", "q_proj", "k_proj", "v_proj",
                 "fc1")
# Dense kernels sharded on input features (row-parallel).
_ROW_PARALLEL = ("to_out", "ff_out", "proj_out", "out_proj", "fc2",
                 "time_embedding_linear_2")


def param_spec(path: Tuple[str, ...], value, model_axis: str = "model"):
    """PartitionSpec for one parameter, by its flax path and shape."""
    name = path[-1]
    module = path[-2] if len(path) >= 2 else ""
    ndim = value.ndim
    if name in ("scale", "bias", "embedding", "position_embedding"):
        return P()
    if name == "kernel":
        if module in _COL_PARALLEL:
            return P(*([None] * (ndim - 1) + [model_axis]))
        if module in _ROW_PARALLEL:
            return P(*([None] * (ndim - 2) + [model_axis, None]))
        if ndim == 4:
            # Convolutions: shard output channels (HWIO -> last dim).
            return P(None, None, None, model_axis)
        if ndim == 2:
            return P(None, model_axis)
    return P()


def unet_param_spec(params, model_axis: str = "model"):
    """Pytree of PartitionSpecs matching a U-Net/VAE/CLIP param tree."""
    flat = flatten_dict(params)
    specs = {k: param_spec(k, v, model_axis) for k, v in flat.items()}
    return unflatten_dict(specs)


def _divisible(shape, spec, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is not None and dim % mesh.shape[axis] != 0:
            return False
    return True


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """Place a param tree on the mesh with TP specs (falling back to
    replication for dims not divisible by the model axis)."""
    flat = flatten_dict(params)
    out = {}
    for key, value in flat.items():
        spec = param_spec(key, value, model_axis)
        if not _divisible(value.shape, spec, mesh):
            spec = P()
        out[key] = jax.device_put(value, NamedSharding(mesh, spec))
    return unflatten_dict(out)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(x, mesh: Mesh, data_axis: str = "data"):
    """Shard the leading (batch) dim over the data axis."""
    spec = P(data_axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
