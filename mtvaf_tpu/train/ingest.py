"""Production ingest: the fast path IS the scale path.

Two pieces keep the train loop step-bound instead of upload-bound on
latency/bandwidth-limited host↔device links (the reference instead re-runs
4 ResNet forwards per step and ships every tensor leaf separately —
modules/train.py:341, models/bert_model.py:256):

* :class:`GuideCache` — frozen-ResNet stage guides are per-image constants;
  they are computed once, cached (host LRU + disk spill), and optionally
  held in a DEVICE-RESIDENT bf16 table from which batches are assembled by
  an on-device gather.  Under an SPMD mesh the table is replicated over the
  mesh and the gather emits batch-sharded arrays directly (no resharding,
  no guide bytes on the link after the one-time row insert).

* :func:`pack_and_put` — every host leaf of a batch is serialized into ONE
  buffer, uploaded in one transfer, and unpacked by a single jitted program
  (static slice + bitcast + reshape per leaf).  Under a mesh the buffer is
  packed PER DATA-SHARD (shape ``(data, bytes_per_shard)``, sharded over
  'data'), so the unpack lowers to purely local reshapes; multi-host
  processes pack only their own rows and the global array is assembled with
  ``jax.make_array_from_process_local_data`` — the SPMD replacement for the
  reference's ``DistributedSampler`` + NCCL DDP (MTVAF_training.py:309,331).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def _width_types() -> Dict[int, object]:
    """uint container per itemsize for the device-side bitcast unpack.

    itemsize-8 leaves are packable only under x64: with x64 disabled
    jnp.uint64 canonicalizes to uint32 and the bitcast would corrupt the
    data — such leaves take the per-leaf fallback instead."""
    widths = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}
    if jax.config.jax_enable_x64:
        widths[8] = jnp.uint64
    return widths


# ---------------------------------------------------------------------------
# Packed single-transfer batch placement.

_UNPACK_CACHE: Dict[tuple, object] = {}


def pack_host(host: Dict):
    """Serialize a host batch into ONE flat uint8 buffer + its layout key.

    Returns ``(buffer, segs)`` where ``segs`` is a hashable per-leaf layout
    ``(name, dtype_str, shape, offset, nbytes)`` tuple, or ``None`` when a
    leaf is unpackable (exotic dtype, scalar).  Pure host-side: pair with
    :func:`unpack_program` to fuse the unpack INTO a larger jitted program,
    so the buffer upload rides that program's dispatch — the serving path's
    one-RPC batch placement (serve.py / infer.py), vs one transfer per leaf.
    """
    widths = _width_types()
    if any(v.dtype.itemsize not in widths or v.dtype.kind not in "fiub"
           or v.ndim == 0
           for v in map(np.asarray, host.values())):
        return None
    segs, bufs, off = [], [], 0
    for k, v in host.items():
        buf = np.ascontiguousarray(v).view(np.uint8).reshape(-1)
        bufs.append(buf)
        segs.append((k, np.asarray(v).dtype.str, np.asarray(v).shape, off,
                     buf.nbytes))
        off += buf.nbytes
    return (np.concatenate(bufs) if len(bufs) > 1 else bufs[0]), tuple(segs)


def unpack_program(segs):
    """UNJITTED unpack for one :func:`pack_host` layout: flat uint8 buffer →
    leaf dict.  Call it inside your own ``jax.jit`` so the unpack fuses with
    the consuming program (static slice + bitcast + reshape per leaf)."""
    widths = _width_types()

    def unpack_fn(big):
        return {k: _unpack_leaf(big[o:o + n], np.dtype(dt), (),
                                widths).reshape(shape)
                for k, dt, shape, o, n in segs}

    return unpack_fn


def _unpack_leaf(seg, dtype, lead, widths):
    """uint8 byte segment → ``dtype`` leaf (device-side bitcast, no copy)."""
    if dtype.itemsize > 1:
        seg = jax.lax.bitcast_convert_type(
            seg.reshape(lead + (-1, dtype.itemsize)), widths[dtype.itemsize])
    if seg.dtype != dtype:
        seg = jax.lax.bitcast_convert_type(seg, dtype) \
            if dtype.kind in "fiu" else seg.astype(dtype)
    return seg


def _fallback_put(host: Dict, mesh: Optional[Mesh], batch_dim: int) -> Dict:
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in host.items()}
    from ..core.mesh import put_global_batch
    return put_global_batch(host, mesh, batch_dim=batch_dim)


def pack_and_put(out: Dict, mesh: Optional[Mesh] = None,
                 batch_dim: int = 0) -> Dict:
    """Place a host batch on the device(s) with ONE transfer (per process).

    Host leaves are serialized into a single uint8 buffer and unpacked by a
    jitted program compiled once per batch layout.  ``mesh=None`` targets the
    default device; with a mesh the buffer is packed per data-shard and the
    unpacked leaves come out sharded ``P(*, 'data', *)`` at ``batch_dim``.
    Device-array leaves (e.g. table-gathered guides) pass through untouched.
    """
    host, placed = {}, {}
    for k, v in out.items():
        if isinstance(v, jax.Array):
            placed[k] = v
        else:
            host[k] = np.ascontiguousarray(v)
    if not host:
        return placed

    widths = _width_types()
    from ..core.mesh import data_axis_size, mesh_addressable
    shards = 1 if mesh is None else data_axis_size(mesh)
    addressable = mesh is None or mesh_addressable(mesh)
    pcount = 1 if addressable else jax.process_count()
    local_shards = shards // pcount
    bad = (shards % pcount != 0 or local_shards < 1
           or any(v.dtype.itemsize not in widths
                  or v.dtype.kind not in "fiub"   # e.g. ml_dtypes bf16 is
                  # kind 'V': np.dtype(str) would NOT round-trip it and the
                  # unpack's astype would value-convert raw bit patterns
                  for v in host.values())
           or any(v.ndim <= batch_dim
                  or v.shape[batch_dim] % local_shards != 0
                  for v in host.values()))
    if bad:
        placed.update(_fallback_put(host, mesh, batch_dim))
        return placed

    # Serialize: per local data-shard, the concatenation of every leaf's
    # shard-slice bytes → local buffer (local_shards, bytes_per_shard).
    segs = []
    shard_bufs: list = [[] for _ in range(local_shards)]
    off = 0
    for k, v in host.items():
        rows = v.shape[batch_dim] // local_shards
        nbytes = 0
        for d in range(local_shards):
            sl = ((slice(None),) * batch_dim
                  + (slice(d * rows, (d + 1) * rows),))
            buf = np.ascontiguousarray(v[sl]).view(np.uint8).reshape(-1)
            shard_bufs[d].append(buf)
            nbytes = buf.nbytes
        global_shape = (v.shape[:batch_dim]
                        + (v.shape[batch_dim] * pcount,)
                        + v.shape[batch_dim + 1:])
        segs.append((k, v.dtype.str, global_shape, off, nbytes))
        off += nbytes
    local = np.stack([np.concatenate(b) if len(b) > 1 else b[0]
                      for b in shard_bufs])
    layout = (tuple(segs), mesh, batch_dim, shards)

    unpack = _UNPACK_CACHE.get(layout)
    if unpack is None:
        unpack = _UNPACK_CACHE[layout] = _build_unpack(
            tuple(segs), mesh, batch_dim, shards, widths)

    if mesh is None:
        placed.update(unpack(local[0]))
    else:
        sh = NamedSharding(mesh, P("data"))
        if addressable:
            big = jax.device_put(local, sh)
        else:
            big = jax.make_array_from_process_local_data(
                sh, local, (shards, off))
        placed.update(unpack(big))
    return placed


def _build_unpack(segs, mesh, batch_dim, shards, widths):
    """Jitted device-side unpack for one batch layout.

    mesh=None variant takes a flat (bytes,) buffer; the mesh variant takes
    (data_shards, bytes_per_shard) sharded over 'data' and keeps the leading
    shard dim intact through every reshape so XLA lowers it with zero
    collectives, emitting each leaf sharded at ``batch_dim``."""

    if mesh is None:
        def unpack_fn(big):
            res = {}
            for k, dt, shape, o, n in segs:
                res[k] = _unpack_leaf(big[o:o + n], np.dtype(dt), (),
                                      widths).reshape(shape)
            return res
        return jax.jit(unpack_fn)

    def unpack_fn(big):    # (shards, bytes_per_shard)
        res = {}
        for k, dt, shape, o, n in segs:
            x = _unpack_leaf(big[:, o:o + n], np.dtype(dt), (shards,), widths)
            pre = (shape[:batch_dim] + (shape[batch_dim] // shards,)
                   + shape[batch_dim + 1:])
            x = x.reshape((shards,) + pre)
            x = jnp.moveaxis(x, 0, batch_dim)
            res[k] = x.reshape(shape)
        return res

    in_sh = NamedSharding(mesh, P("data"))
    out_sh = {k: NamedSharding(mesh, P(*([None] * batch_dim), "data"))
              for k, _, _, _, _ in segs}
    return jax.jit(unpack_fn, in_shardings=in_sh, out_shardings=out_sh)


# ---------------------------------------------------------------------------
# Frozen-ResNet guide cache.


class GuideCache:
    """Per-image cache of frozen-ResNet stage guides.

    * keyed per (image_store, image_id): each split resolves its aux crops
      through its OWN aux_map/aux_dir (the reference uses per-split crop
      dirs/dicts — MTVAF_training.py:321-348);
    * host RAM is bounded (LRU over ``max_items`` images, ~245 KB each);
      evicted entries spill to a ``.npy`` disk cache next to the pixel cache
      (guides are ~600x smaller than the pixels they derive from);
    * with ``device_items > 0`` a DEVICE-RESIDENT bf16 table holds one row
      per image in HBM (~123 KB/image) and batches are assembled by an
      on-device gather: the guides are frozen per-image constants (the
      model casts them to bf16 at the prefix projector anyway), so after
      the one-time row insert NO guide bytes ever cross host↔device again.
      On a latency/bandwidth-bound link (the tunneled axon backend moves
      ~38 MB/s; per-example guides are 8 MB/batch) this takes the
      production train loop from upload-bound to step-bound.
    * with ``mesh`` set, the table lives replicated over the mesh and the
      gather emits arrays already sharded over 'data' (at dim ``accum>1``
      aware), so the fast path and the SPMD scale path are the same path.
    * on a MULTI-HOST mesh each process keeps its own table on its local
      data rows (``core.mesh.host_local_submesh``): gathers run
      process-locally and the shards are assembled into the global
      batch-sharded array with ``jax.make_array_from_single_device_arrays``
      — each host only ever holds guides for the images ITS data shard
      visits, and no guide bytes cross hosts (the reference instead
      recomputes 4 ResNet forwards per step on every rank,
      modules/train.py:341).
    """

    def __init__(self, resnet_params, depth: int, *, max_items: int = 8192,
                 cache_dir: Optional[str] = None, device_items: int = 0,
                 mesh: Optional[Mesh] = None):
        from collections import OrderedDict

        from ..nn.models import compute_visual_guides
        self._guide_fn = jax.jit(
            lambda imgs, aux: compute_visual_guides(resnet_params, imgs, aux,
                                                    depth=depth))
        self._cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self.max_items = max(int(max_items), 1)
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        # device guide table (lazy-allocated at first insert); on multi-host
        # meshes it lives on THIS host's submesh and gathers assemble global
        self.device_items = int(device_items)
        self.mesh = mesh
        self._store_mesh = mesh
        self._assemble_global = False
        if mesh is not None:
            from ..core.mesh import host_local_submesh, mesh_addressable
            if not mesh_addressable(mesh):
                sub = host_local_submesh(mesh)
                if sub is None:
                    if self.device_items > 0:
                        logger.warning(
                            "device guide table disabled: this process's "
                            "devices do not form whole contiguous data rows "
                            "of the mesh (host-path guides will upload per "
                            "batch)")
                    self.device_items = 0
                    self._store_mesh = None
                else:
                    self._store_mesh = sub
                    self._assemble_global = True
        store = self._store_mesh
        self._rep = NamedSharding(store, P()) if store is not None else None
        self._dev_main = None      # (N, 4, C) bf16 on device
        self._dev_aux = None       # (N, 3, 4, C) bf16 on device
        self._dev_rows: "OrderedDict[tuple, int]" = OrderedDict()  # key->row
        #                (insertion/recency order drives LRU row reuse)
        self._table_full_warned = False
        insert_kw = dict(donate_argnums=(0, 1))
        if self._rep is not None:
            insert_kw["out_shardings"] = (self._rep, self._rep)
        self._dev_insert = jax.jit(
            lambda tm, ta, i, rm, ra: (tm.at[i].set(rm), ta.at[i].set(ra)),
            **insert_kw)
        self._gather_fns: dict = {}

    def _gather(self, idx: np.ndarray):
        """Jitted table gather; compiled per idx rank (accum-shaped or flat).

        Under a mesh the output comes out sharded over 'data' at the batch
        dim (the last idx dim) — a gather from a replicated table into a
        batch-sharded result is local on every device, so no guide bytes
        cross the ICI either.  Multi-host: the gather runs on this host's
        submesh (its contiguous data rows) and the per-device shards are
        assembled into the global batch-sharded array without any copy."""
        fn = self._gather_fns.get(idx.ndim)
        if fn is None:
            kw = {}
            if self._store_mesh is not None:
                out = NamedSharding(
                    self._store_mesh, P(*([None] * (idx.ndim - 1)), "data"))
                kw["out_shardings"] = (out, out)
            fn = self._gather_fns[idx.ndim] = jax.jit(
                lambda tm, ta, i: (jnp.take(tm, i, axis=0),
                                   jnp.take(ta, i, axis=0)), **kw)
        main, aux = fn(self._dev_main, self._dev_aux,
                       jnp.asarray(idx, jnp.int32))
        if self._assemble_global:
            bd = idx.ndim - 1
            main = self._to_global(main, bd)
            aux = self._to_global(aux, bd)
        return main, aux

    def _to_global(self, x, bd: int):
        """Slot this host's submesh-sharded gather result into the GLOBAL
        batch-sharded array: each local device's shard is already the shard
        the global sharding expects on that device (the submesh is the
        process's contiguous slice of the global data axis), so the global
        array is assembled from the existing per-device buffers — zero
        copies, zero host bytes, zero collectives."""
        from ..core.mesh import data_axis_size
        factor = data_axis_size(self.mesh) // data_axis_size(self._store_mesh)
        gshape = (x.shape[:bd] + (x.shape[bd] * factor,) + x.shape[bd + 1:])
        gsh = NamedSharding(self.mesh, P(*([None] * bd), "data"))
        return jax.make_array_from_single_device_arrays(
            gshape, gsh, [s.data for s in x.addressable_shards])

    def _dev_put(self, key: tuple, value: tuple) -> bool:
        """Insert one image's guides into the device table (LRU row reuse
        when full — eval/test images cannot permanently crowd out train
        images); False only when the table is disabled."""
        if self.device_items <= 0:
            return False
        if key in self._dev_rows:
            self._dev_rows.move_to_end(key)
            return True
        if len(self._dev_rows) >= self.device_items:
            # evict the least-recently-used key and reuse its row (each
            # re-insert is one ~123 KB upload — still ~60x cheaper than a
            # full host-guide batch; safe because every gather captures
            # the table version it was dispatched with)
            _, row = self._dev_rows.popitem(last=False)
            if not self._table_full_warned:
                self._table_full_warned = True
                logger.warning(
                    "device guide table full (%d rows): evicting LRU rows; "
                    "raise --guide_cache_device_items if the working set "
                    "exceeds the table (one re-insert per evicted image "
                    "per revisit)", self.device_items)
        else:
            row = len(self._dev_rows)
        main, aux = value
        if self._dev_main is None:
            zm = jnp.zeros((self.device_items,) + main.shape, jnp.bfloat16)
            za = jnp.zeros((self.device_items,) + aux.shape, jnp.bfloat16)
            if self._rep is not None:
                zm = jax.device_put(zm, self._rep)
                za = jax.device_put(za, self._rep)
            self._dev_main, self._dev_aux = zm, za
        self._dev_main, self._dev_aux = self._dev_insert(
            self._dev_main, self._dev_aux, row,
            jnp.asarray(main, jnp.bfloat16), jnp.asarray(aux, jnp.bfloat16))
        self._dev_rows[key] = row
        return True

    @staticmethod
    def _store_key(store) -> str:
        return f"{store.img_dir}|{store.aux_dir}"

    def _disk_path(self, key: tuple) -> Optional[str]:
        if not self.cache_dir:
            return None
        import hashlib
        h = hashlib.md5(("|".join(key)).encode()).hexdigest()
        return os.path.join(self.cache_dir, h + ".npz")

    def _put(self, key: tuple, value: tuple, *, spill: bool = True):
        self._cache[key] = value
        self._cache.move_to_end(key)
        while len(self._cache) > self.max_items:
            old_key, old_val = self._cache.popitem(last=False)
            path = self._disk_path(old_key)
            if spill and path and not os.path.exists(path):
                np.savez(path, main=old_val[0], aux=old_val[1])

    def _get(self, key: tuple):
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        path = self._disk_path(key)
        if path and os.path.exists(path):
            with np.load(path) as z:
                value = (z["main"], z["aux"])
            self._put(key, value, spill=False)
            return value
        return None

    _UNSET = object()

    def batch(self, image_ids, store, accum: int = 1, for_mesh=_UNSET):
        """Guides for a batch of image ids: (main, aux) arrays.

        Returns DEVICE arrays (bf16, gathered from the resident table,
        micro-batched to ``(accum, bsz/accum, ...)`` when ``accum > 1`` and
        batch-sharded when a mesh is set) when every id has a table row,
        host fp32 ``(bsz, ...)`` arrays otherwise.  ``for_mesh`` names the
        mesh the batch is headed for: when it is not the mesh the table was
        built for (multi-host eval runs on a HOST-LOCAL mesh) the table is
        bypassed and host guides are returned."""
        if for_mesh is not GuideCache._UNSET and for_mesh is not self.mesh:
            return self._host_batch(image_ids, store)
        skey = self._store_key(store)
        keys = [(skey, i) for i in image_ids]
        local = self._fill(keys, store)
        if self.device_items > 0:
            # ensure a device row per key (one ~123 KB bf16 upload each;
            # LRU reuse when full).  A batch with more unique images than
            # the table self-evicts during the insert loop — the final
            # membership check catches that and falls back to host guides.
            all_resident = True
            for k in dict.fromkeys(keys):
                if not self._dev_put(k, local[k]):
                    all_resident = False
            all_resident = all_resident and all(
                k in self._dev_rows for k in keys)
            if all_resident:
                idx = np.asarray([self._dev_rows[k] for k in keys], np.int32)
                if accum > 1:
                    idx = idx.reshape(accum, -1)
                return self._gather(idx)
        main_g = np.stack([local[k][0] for k in keys])
        aux_g = np.stack([local[k][1] for k in keys])
        return main_g, aux_g

    def _host_batch(self, image_ids, store):
        """Host fp32 guides (cache-filled, no table)."""
        skey = self._store_key(store)
        keys = [(skey, i) for i in image_ids]
        local = self._fill(keys, store)
        return (np.stack([local[k][0] for k in keys]),
                np.stack([local[k][1] for k in keys]))

    def _fill(self, keys, store) -> dict:
        """Resolve every key to its guide value, computing misses.

        Holds this call's values locally so LRU eviction mid-batch (when
        max_items < unique ids per batch) can never drop a needed entry."""
        local = {}
        for k in dict.fromkeys(keys):
            v = self._get(k)
            if v is not None:
                local[k] = v
        missing = [k for k in dict.fromkeys(keys) if k not in local]
        if missing:
            main, aux = store.batch([k[1] for k in missing], with_aux=True)
            # Pad the miss-batch to a power-of-two bucket: the jitted ResNet
            # guide program compiles once per bucket (≤ log2(bsz) programs)
            # instead of once per distinct miss count — a cold cache would
            # otherwise trigger a fresh (minutes-long, remote) XLA compile
            # for nearly every early batch.
            n = len(missing)
            bucket = 1
            while bucket < n:
                bucket *= 2
            if bucket > n:
                pad = bucket - n
                main = np.concatenate([main, np.repeat(main[-1:], pad, 0)])
                aux = np.concatenate([aux, np.repeat(aux[-1:], pad, 0)])
            mg, ag = self._guide_fn(jnp.asarray(main), jnp.asarray(aux))
            mg, ag = np.asarray(mg)[:n], np.asarray(ag)[:n]
            for j, k in enumerate(missing):
                local[k] = (mg[j], ag[j])
                self._put(k, local[k])
        return local
