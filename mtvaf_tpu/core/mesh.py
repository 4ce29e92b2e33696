"""Device mesh + sharding layout.

SPMD replacement for the reference's NCCL DDP + threaded
DataParallelCriterion (reference MTVAF_training.py:301-311,
modules/parallel.py): a ``Mesh(('data', 'model'))`` over the slice, batch
sharded on ``data``, loss computed shard-local and psum-ed implicitly by jit;
gradient all-reduce rides the ICI (SURVEY.md §2.3).

The 'model' axis is the tensor-parallel extension point: partition rules
below shard the big matmuls (QKV/MLP kernels) over it when mesh_model > 1.
BERT-base fits one chip, so the default layout is pure DP (model=1), but the
rules keep the framework scale-ready.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 0, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data <= 0:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, "
                         f"have {n}")
    dev_array = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def batch_spec(tree) -> object:
    """PartitionSpec tree sharding every leaf's leading dim over 'data'."""
    return jax.tree.map(lambda x: P("data"), tree)


def _param_spec_for_path(path: str) -> P:
    """Tensor-parallel partition rules over the 'model' axis.

    Megatron-style: QKV/MLP-in kernels column-parallel (shard output dim),
    attn-out/MLP-out row-parallel (shard input dim), embeddings shard the
    vocab/feature dim, LN + biases replicated.  With mesh model=1 these all
    collapse to replication.
    """
    # Stacked layer params carry a leading L dim → specs get a leading None.
    if "/layers/" in path or path.startswith("layers/"):
        lead = (None,)
    else:
        lead = ()
    if path.endswith("/kernel") or path.endswith("kernel"):
        if any(s in path for s in ("attn/qkv", "mlp/in")):
            return P(*lead, None, "model")
        if any(s in path for s in ("attn/out", "mlp/out")):
            return P(*lead, "model", None)
    if path.endswith("word") or path.endswith("position") or \
            path.endswith("token_type"):
        return P(None, "model")
    return P()


def param_sharding(mesh: Mesh, params) -> object:
    """NamedSharding tree for a model-parameter pytree."""
    def assign(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: assign(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(assign(v, f"{prefix}/{i}")
                              for i, v in enumerate(tree))
        spec = _param_spec_for_path(prefix)
        # Reject specs that do not divide the actual shape: fall back to
        # replication (keeps tiny test configs working on any mesh).
        shape = tree.shape if hasattr(tree, "shape") else ()
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= len(shape) or shape[dim] % sizes.get(axis, 1) != 0:
                ok = False
        if not ok:
            spec = P()
        return NamedSharding(mesh, spec)
    return assign(params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
