"""Multi-chip scaling: tile-sharded scoring over a `jax.sharding.Mesh`.

The reference scales with one OpenMP ``parallel for schedule(dynamic, 2048)`` over
vertices plus per-thread top-k heaps merged serially
(`/root/reference/inc/predict.hxx:287,440-459`).  The TPU-native equivalent:

* the work-balanced tile schedule (`plan.py`) is split round-robin across the mesh
  axis — tiles have near-equal slot counts by construction, so a static split
  load-balances like ``schedule(dynamic)`` did;
* each device scans its tiles under `lax.scan`, carrying a local top-k
  (the per-thread heap);
* one ``all_gather`` of the [M, k] buffers over ICI + per-metric 1-D
  sort-merges replaces the serial k-way heap merge — O(M · k · n_devices)
  bytes on the wire, independent of graph size.

Graph and plan arrays are replicated across the axis (read-only here); for
graphs beyond single-HBM capacity, shard the plan's slot stream by tile range
(tiles are already the unit of distribution) — round-2 work, see STATUS.md.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.topk import TopK
from ..predict.metrics import METRICS

__all__ = ["make_mesh", "pad_tiles_for_mesh", "score_tiles_sharded"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "workers") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_tiles_for_mesh(
    tile_edge_start: np.ndarray, n_devices: int,
    tile_src_start: Optional[np.ndarray] = None,
    empty_at: Optional[int] = None,
    tile_tbl_start: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split tile windows into per-device (starts, ends, src_starts, tbl_starts)
    of shape [T'], T' a multiple of ``n_devices``.  Padding tiles are empty
    windows (start == end), so they skip via the scan's `lax.cond`."""
    starts = np.asarray(tile_edge_start[:-1], dtype=np.int32)
    ends = np.asarray(tile_edge_start[1:], dtype=np.int32)
    if tile_src_start is None:
        srcs = np.zeros_like(starts)
    else:
        srcs = np.asarray(tile_src_start[:-1], dtype=np.int32)
    if tile_tbl_start is None:
        tbls = np.zeros_like(starts)
    else:
        tbls = np.asarray(tile_tbl_start[: starts.shape[0]], dtype=np.int32)
    t = starts.shape[0]
    tp = ((t + n_devices - 1) // n_devices) * n_devices
    if tp != t:
        fill = np.int32(tile_edge_start[-1] if empty_at is None else empty_at)
        starts = np.concatenate([starts, np.full(tp - t, fill, np.int32)])
        ends = np.concatenate([ends, np.full(tp - t, fill, np.int32)])
        srcs = np.concatenate([srcs, np.full(tp - t, srcs[-1] if t else 0, np.int32)])
        tbls = np.concatenate([tbls, np.full(tp - t, tbls[-1] if t else 0, np.int32)])
    # Round-robin assignment: device d takes tiles d, d+D, d+2D, ... so each
    # device sees an even mix of early (dense-row) and late (sparse-row) tiles.
    starts = starts.reshape(-1, n_devices).T.reshape(-1)
    ends = ends.reshape(-1, n_devices).T.reshape(-1)
    srcs = srcs.reshape(-1, n_devices).T.reshape(-1)
    tbls = tbls.reshape(-1, n_devices).T.reshape(-1)
    return starts, ends, srcs, tbls


@partial(
    jax.jit,
    static_argnames=("metric_names", "cap", "k", "maxf2", "w_bits", "packed",
                     "deg16", "upper_only", "local_w", "mesh", "axis"),
)
def score_tiles_sharded(
    offsets, indices, degrees, wt_tables,
    stream,
    tile_starts, tile_ends, tile_srcs, tile_tbls,
    min_score,
    *, metric_names, cap: int, k: int, maxf2: int = 0, w_bits: int = 0,
    packed: bool = False, deg16: bool = False, upper_only: bool = True,
    local_w: bool = False, mesh: Mesh, axis: str = "workers",
) -> TopK:
    """Sharded scoring: per-device tile scan → local top-k → all_gather merge.
    Multi-metric like `scoring.score_tiles`; returns a replicated [M, k] TopK.

    ``stream`` is the plan's device stream (slot arrays when ``packed`` else
    edge arrays) — see `plan.py`.
    ``tile_starts``/``tile_ends``/``tile_srcs`` must be length-multiple-of-mesh-
    size (see ``pad_tiles_for_mesh``).
    """
    from ..predict.scoring import _make_stream_fn, scan_tiles

    metrics = tuple(METRICS[name] for name in metric_names)

    def local_scan(tile_s, tile_e, tile_src, tile_tbl, offsets, indices,
                   degrees, wt_tables, stream, min_score):
        stream_fn = _make_stream_fn(
            offsets, indices, degrees, wt_tables, stream,
            metrics, cap, maxf2, min_score, w_bits, packed, deg16, upper_only,
            local_w)
        local = scan_tiles(stream_fn, tile_s, tile_e, tile_src, tile_tbl,
                           k, len(metrics), cap)
        # Hierarchical merge over ICI: [M, k]-sized buffers only.
        gathered = jax.lax.all_gather(local, axis, axis=1, tiled=True)
        # leaves: [M, n_dev * k]; batched descending sort-merge back to [M, k]
        merged_s, merged_u, merged_v = [], [], []
        for i in range(gathered.scores.shape[0]):
            nsi, u2i, v2i = jax.lax.sort(
                (-gathered.scores[i], gathered.u[i], gathered.v[i]),
                num_keys=1, is_stable=False)
            merged_s.append(-nsi[:k]); merged_u.append(u2i[:k]); merged_v.append(v2i[:k])
        return TopK(jnp.stack(merged_s), jnp.stack(merged_u), jnp.stack(merged_v))

    rep = P()
    fn = jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  rep, rep, rep,
                  jax.tree.map(lambda _: rep, wt_tables),
                  jax.tree.map(lambda _: rep, stream), rep),
        out_specs=TopK(rep, rep, rep),
        check_vma=False,
    )
    return fn(tile_starts, tile_ends, tile_srcs, tile_tbls, offsets, indices,
              degrees, wt_tables, stream, min_score)
