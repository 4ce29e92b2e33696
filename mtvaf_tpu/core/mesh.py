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


def data_axis_size(mesh: Mesh) -> int:
    """Size of the 'data' axis (1 if the mesh has no such axis)."""
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)


def mesh_addressable(mesh: Mesh) -> bool:
    """True iff every mesh device belongs to THIS process (single-host
    meshes and host-local eval meshes)."""
    pid = jax.process_index()
    return all(d.process_index == pid for d in mesh.devices.flat)


def auto_data_axis(n_devices: int, *batch_sizes: int) -> int:
    """Largest data-parallel axis ≤ n_devices that divides every batch size.

    Used when ``Config.mesh_data == 0`` (auto): the CLI engages all devices
    it can without changing the user's batch sizes (the reference instead
    requires the user to pick ``--gpus`` explicitly, MTVAF_training.py:278).
    """
    import math
    g = 0
    for b in batch_sizes:
        g = math.gcd(g, int(b))
    g = g or 1
    return max(d for d in range(1, max(min(n_devices, g), 1) + 1) if g % d == 0)


def put_global_batch(batch: dict, mesh: Mesh, batch_dim: int = 0) -> dict:
    """Place a host batch on the mesh, sharded over 'data' at ``batch_dim``.

    Single-host: a plain ``device_put``.  Multi-host (``jax.process_count()
    > 1``): each process holds only ITS rows (the per-host shard produced by
    ``iterate_batches(process_index=...)``) and the global array is assembled
    with ``jax.make_array_from_process_local_data`` — the SPMD replacement
    for the reference's ``DistributedSampler`` + NCCL DDP
    (MTVAF_training.py:309,331,355).
    """
    spec = P(*([None] * batch_dim), "data")
    sh = NamedSharding(mesh, spec)
    rep = NamedSharding(mesh, P())
    data_size = data_axis_size(mesh)

    def leaf_sharding(v):
        # a leaf whose batch dim the data axis does not divide (or that has
        # no batch dim at all) replicates instead of erroring
        if v.ndim <= batch_dim or v.shape[batch_dim] % data_size != 0:
            return rep
        return sh

    device_leaves = {k: v for k, v in batch.items()
                     if isinstance(v, jax.Array)}   # already placed (guides)
    batch = {k: v for k, v in batch.items() if k not in device_leaves}
    if mesh_addressable(mesh):            # incl. 1-host
        out = {k: jax.device_put(np.asarray(v), leaf_sharding(np.asarray(v)))
               for k, v in batch.items()}
        out.update(device_leaves)
        return out
    out = dict(device_leaves)
    for k, v in batch.items():
        local = np.asarray(v)
        global_shape = (local.shape[:batch_dim]
                        + (local.shape[batch_dim] * jax.process_count(),)
                        + local.shape[batch_dim + 1:])
        out[k] = jax.make_array_from_process_local_data(sh, local, global_shape)
    return out


def host_local_submesh(mesh: Mesh) -> Optional[Mesh]:
    """The contiguous block of 'data' rows owned ENTIRELY by this process,
    as a host-local mesh with the same axis names.

    Lets per-host state (e.g. the device-resident guide table,
    train/ingest.GuideCache) live on this host's slice of a multi-host mesh
    and produce shards that slot straight into global batch-sharded arrays
    (``jax.make_array_from_single_device_arrays``).  Returns None when the
    process's devices do not form whole, contiguous data rows (e.g. a model
    axis spanning hosts) — callers must fall back to a host-side path."""
    pid = jax.process_index()
    dev = mesh.devices
    if dev.ndim != 2:
        return None
    rows = [r for r in range(dev.shape[0])
            if all(d.process_index == pid for d in dev[r])]
    if not rows or rows != list(range(rows[0], rows[0] + len(rows))):
        return None
    local = {d for d in dev.flat if d.process_index == pid}
    if {d for r in rows for d in dev[r]} != local:
        return None
    return Mesh(dev[rows[0]:rows[0] + len(rows)], mesh.axis_names)


def cross_host_sum(values, mesh: Mesh) -> np.ndarray:
    """Sum a small host vector across processes (host-level all-reduce).

    Single-process: identity.  Multi-process: each process contributes its
    vector once via a 'data'-sharded scratch array and one jitted replicated
    reduction — the SPMD replacement for an MPI/NCCL host gather when
    combining per-host metric counts (reference DDP leaves train metrics
    rank-local).  float32 is exact for counts < 2^24."""
    values = np.asarray(values, np.float32)
    if jax.process_count() == 1:
        return values
    D = data_axis_size(mesh)
    procs = jax.process_count()
    if D % procs != 0:
        raise ValueError(f"data axis {D} not divisible by {procs} processes")
    local = np.zeros((D // procs,) + values.shape, np.float32)
    local[0] = values
    sh = NamedSharding(mesh, P("data"))
    g = jax.make_array_from_process_local_data(sh, local, (D,) + values.shape)
    key = (mesh, values.shape)
    fn = _CROSS_HOST_SUM_CACHE.get(key)
    if fn is None:     # one compile per (mesh, shape), not one per call
        fn = _CROSS_HOST_SUM_CACHE[key] = jax.jit(
            lambda x: x.sum(0), out_shardings=NamedSharding(mesh, P()))
    return np.asarray(fn(g))


_CROSS_HOST_SUM_CACHE: dict = {}


def cross_host_gather(obj, mesh: Mesh) -> list:
    """All-gather one small picklable object per process; returns the list
    ordered by process index (single-process: ``[obj]``).

    Host-level companion to :func:`cross_host_sum` for non-numeric payloads
    (per-host eval predictions, metric rows): each process contributes its
    pickled bytes through a 'data'-sharded uint8 scratch array and one
    jitted replicated identity — no host networking beyond what jit already
    does.  Used by the trainers' SHARDED multi-host eval (each host decodes
    ~1/P of the eval batches, then every host reconstructs the complete,
    identically-ordered result list)."""
    import pickle
    if jax.process_count() == 1:
        return [obj]
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    procs = jax.process_count()
    pid = jax.process_index()
    # cross_host_sum rides float32 (exact only < 2^24), but a pickled eval
    # payload can exceed 16 MB — ship each byte-length as an exact
    # (len >> 20, len & 0xFFFFF) pair (both halves < 2^24 for any payload
    # under 16 TB) instead of one lossy float.
    lens = np.zeros((procs, 2), np.float32)
    lens[pid] = divmod(len(payload), 1 << 20)
    lens = cross_host_sum(lens, mesh)        # one-hot sum = all lengths
    sizes = (lens[:, 0].astype(np.int64) * (1 << 20)
             + lens[:, 1].astype(np.int64))
    # power-of-two bucket: one identity compile per bucket, not per call
    maxlen = 1 << (max(int(sizes.max()), 1) - 1).bit_length()
    D = data_axis_size(mesh)
    if D % procs != 0:
        raise ValueError(f"data axis {D} not divisible by {procs} processes")
    local = np.zeros((D // procs, maxlen), np.uint8)
    local[0, :len(payload)] = payload
    sh = NamedSharding(mesh, P("data"))
    g = jax.make_array_from_process_local_data(sh, local, (D, maxlen))
    key = (mesh, "gather", maxlen)
    fn = _CROSS_HOST_SUM_CACHE.get(key)
    if fn is None:
        fn = _CROSS_HOST_SUM_CACHE[key] = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P()))
    full = np.asarray(fn(g))
    rows = D // procs
    return [pickle.loads(full[p * rows, :int(sizes[p])].tobytes())
            for p in range(procs)]


def local_batch_rows(x) -> np.ndarray:
    """Host copy of THIS process's rows of a batch-sharded global array.

    ``np.asarray`` on a multi-host global array raises (non-addressable
    shards); this gathers the addressable shards in batch order, collapsing
    model-axis replicas (same index → same rows)."""
    if all(d.process_index == jax.process_index() for d in x.sharding.device_set):
        return np.asarray(x)
    shards = {}
    for s in x.addressable_shards:
        start = s.index[0].start if s.index and s.index[0].start else 0
        shards[start] = s.data
    return np.concatenate([np.asarray(shards[k]) for k in sorted(shards)])


def epoch_scalar_sum(scalars) -> float:
    """Sum a list of device scalars with ONE reduction + ONE host fetch.

    Trainers accumulate one loss scalar per step and reduce at epoch end;
    a per-scalar ``np.asarray`` costs a full tunnel RPC (~25-40 ms) per
    step — ~1.6 s/epoch at 64 steps, comparable to the epoch's entire
    compute (docs/DESIGN.md §8b).  The stack+sum is one cached dispatch."""
    import jax.numpy as jnp
    if not scalars:
        return 0.0
    return float(jnp.sum(jnp.stack(list(scalars))))


def fetch_rows_stacked(arrs):
    """Fetch a list of per-step device arrays as host rows, minimizing RPCs.

    Single-process with uniform shapes (the common case): ONE stacked
    device concat + ONE bulk fetch instead of n_steps round-trips.
    Multi-host or ragged shapes: per-array :func:`local_batch_rows`
    overlapped through a small thread pool (4-deep, dispatch order).
    ``None`` entries pass through (steps that produced no metric)."""
    arrs = list(arrs)
    real = [a for a in arrs if a is not None]
    if not real:
        return arrs
    import jax.numpy as jnp
    shapes = {a.shape for a in real}
    addressable = all(
        d.process_index == jax.process_index()
        for a in real for d in a.sharding.device_set)
    if len(shapes) == 1 and addressable:
        stacked = iter(np.asarray(jnp.stack(real)))
        return [next(stacked) if a is not None else None for a in arrs]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=4) as pool:
        fetched = iter(pool.map(local_batch_rows, real))
    return [next(fetched) if a is not None else None for a in arrs]


def align_local_rows(rows: np.ndarray, n_local: int, accum: int,
                     process_index: int) -> np.ndarray:
    """Select THIS process's rows when a per-example fetch came back GLOBAL.

    After a grad-accumulation step the per-example metrics are reshaped
    (accum, micro, ...) → (batch, ...) in accum-major order, so process p's
    rows of the global array sit at ``a·Bm + p·m_local + k`` — interleaved,
    not a contiguous slice.  ``local_batch_rows`` already returns local rows
    in the right order when the output stayed batch-sharded; this handles
    the case where XLA materialized it replicated (all rows addressable) —
    zipping the full array against local host rows would silently pair the
    wrong examples on every process > 0."""
    n_global = rows.shape[0]
    if n_global == n_local:
        return rows
    m_local = n_local // accum
    bm = n_global // accum
    lo = process_index * m_local
    idx = np.concatenate([np.arange(a * bm + lo, a * bm + lo + m_local)
                          for a in range(accum)])
    return rows[idx]


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


def trainer_meshes(cfg):
    """(train_mesh, eval_mesh) for the production trainers, or (None, None).

    * ``cfg.mesh_data == 0`` auto-sizes the data axis to the most devices the
      batch sizes divide over; ``mesh_data/mesh_model`` set explicitly are
      honored exactly (raising on indivisible batches).
    * a 1×1 layout returns ``(None, None)``: trainers keep the plain
      single-device path with zero placement overhead.
    * multi-host: training shards per-host input over the GLOBAL mesh
      (reference DistributedSampler + DDP, MTVAF_training.py:309,331,355);
      eval gets a HOST-LOCAL mesh and the trainers SHARD the eval batches
      round-robin over processes (~1/P of the device work each), then
      all-gather the per-batch rows (core.mesh.cross_host_gather) so every
      host still ends with the complete, identically-ordered predictions.
    """
    micro_bsz = cfg.train_batch_size // cfg.gradient_accumulation_steps
    n_avail = len(jax.devices()) // cfg.mesh_model
    if cfg.mesh_data > 0:
        data_axis = cfg.mesh_data
        for name, b in (("train micro-batch", micro_bsz),
                        ("eval_batch_size", cfg.eval_batch_size)):
            if b % data_axis != 0:
                raise ValueError(f"{name} {b} not divisible by "
                                 f"mesh_data={data_axis}")
    else:
        data_axis = auto_data_axis(n_avail, micro_bsz, cfg.eval_batch_size)
    if data_axis * cfg.mesh_model <= 1:
        return None, None
    train_mesh = make_mesh(data=data_axis, model=cfg.mesh_model)
    eval_mesh = train_mesh
    if jax.process_count() > 1:
        local = [d for d in jax.devices()
                 if d.process_index == jax.process_index()]
        local_data = auto_data_axis(len(local) // cfg.mesh_model,
                                    cfg.eval_batch_size)
        eval_mesh = make_mesh(data=local_data, model=cfg.mesh_model,
                              devices=local)
    return train_mesh, eval_mesh
