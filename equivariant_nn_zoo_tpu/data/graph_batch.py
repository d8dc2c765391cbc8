"""GraphBatch — the TPU-facing, statically-shaped view of a batch of graphs.

This is the single biggest architectural inversion vs the reference: the
reference concatenates graphs without padding (e3_layers/data/batch.py,
README "no padding"), which is hostile to XLA.  Here every batch is padded to
fixed ``(n_graphs, node_capacity, edge_capacity)`` so the whole train step
compiles once:

- nodes:  ``[node_capacity, d]`` with the LAST slot reserved as a dummy node;
- edges:  ``[edge_capacity, ...]``; padded edges point src=dst=dummy node, so
  gathers read zeros/inert values and scatters land in the dummy row;
- graphs: ``[n_graphs, d]`` plus a ``_graph_mask`` (a batch may carry fewer
  real graphs, e.g. after capacity overflow dropping);
- ``_node_segment``/``_edge_segment`` map into ``n_graphs + 1`` segments, the
  last being the padding segment (dropped after each segment reduction).

GraphBatch is a pytree: arrays are leaves, (attrs, capacities) are static, so
it flows through jit/pjit/scan and can be sharded over a mesh on the graph
axis for data parallelism.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from .batch import Batch


@jax.tree_util.register_pytree_node_class
class GraphBatch:
    __slots__ = (
        "data", "attrs", "n_graphs", "node_capacity", "edge_capacity", "dropped",
    )

    def __init__(self, data, attrs, n_graphs, node_capacity, edge_capacity,
                 dropped: int = 0):
        self.data: Dict = data
        self.attrs: Dict[str, Tuple[str, str]] = attrs
        self.n_graphs = n_graphs
        self.node_capacity = node_capacity
        self.edge_capacity = edge_capacity
        # host-side bookkeeping only (not part of the pytree): graphs that did
        # not fit the static capacities when this batch was padded
        self.dropped = dropped

    # -- pytree protocol ----------------------------------------------------

    def tree_flatten(self):
        keys = tuple(sorted(self.data.keys()))
        leaves = tuple(self.data[k] for k in keys)
        aux = (
            keys,
            tuple(sorted((k, tuple(v)) for k, v in self.attrs.items())),
            self.n_graphs,
            self.node_capacity,
            self.edge_capacity,
        )
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        keys, attrs, n_graphs, node_capacity, edge_capacity = aux
        return cls(
            dict(zip(keys, leaves)),
            {k: v for k, v in attrs},
            n_graphs,
            node_capacity,
            edge_capacity,
        )

    # -- dict-ish access ----------------------------------------------------

    def __getitem__(self, key):
        return self.data[key]

    def __contains__(self, key):
        return key in self.data

    def keys(self):
        return self.data.keys()

    def replace(self, **updates) -> "GraphBatch":
        data = dict(self.data)
        data.update(updates)
        return GraphBatch(
            data, dict(self.attrs), self.n_graphs, self.node_capacity,
            self.edge_capacity,
        )

    @property
    def dummy_node(self) -> int:
        return self.node_capacity - 1

    @property
    def padding_segment(self) -> int:
        return self.n_graphs

    # -- wire format ---------------------------------------------------------
    #
    # The tunneled TPU backend pays per-array RPC latency on every
    # host->device transfer: a ~14-leaf GraphBatch costs ~8 ms/batch of
    # producer-thread time even though the bytes are small.  to_wire()
    # flattens the batch into ONE contiguous buffer per dtype (all leaves
    # are f32 or i32 by from_batch's coercion), so device_put issues 2
    # RPCs instead of 14; from_wire() re-slices the blobs with static
    # offsets INSIDE the step jit, where XLA fuses the slices for free.

    _WIRE_KEY = "_wire_spec"

    def to_wire(self) -> "GraphBatch":
        """Host-side: pack every leaf into one 1-D numpy blob per dtype."""
        if self._WIRE_KEY in self.attrs:
            return self
        blobs: Dict[str, list] = {}
        spec = []
        offs: Dict[str, int] = {}
        for key in sorted(self.data.keys()):
            a = np.asarray(self.data[key])
            kind = "f" if a.dtype.kind == "f" else "i"
            a = a.astype(np.float32 if kind == "f" else np.int32,
                         copy=False)
            off = offs.get(kind, 0)
            spec.append((key, kind, tuple(int(s) for s in a.shape), off))
            offs[kind] = off + a.size
            blobs.setdefault(kind, []).append(a.reshape(-1))
        data = {
            f"_wire_{kind}": np.concatenate(parts)
            for kind, parts in blobs.items()
        }
        attrs = dict(self.attrs)
        attrs[self._WIRE_KEY] = tuple(spec)
        return GraphBatch(data, attrs, self.n_graphs, self.node_capacity,
                          self.edge_capacity, dropped=self.dropped)

    def from_wire(self) -> "GraphBatch":
        """Unpack a wire batch (identity on a regular one); jit-traceable."""
        spec = self.attrs.get(self._WIRE_KEY)
        if spec is None:
            return self
        data = {}
        for key, kind, shape, off in spec:
            size = int(np.prod(shape)) if shape else 1
            blob = self.data[f"_wire_{kind}"]
            data[key] = jax.lax.slice(blob, (off,), (off + size,)).reshape(
                shape
            )
        attrs = {k: v for k, v in self.attrs.items() if k != self._WIRE_KEY}
        return GraphBatch(data, attrs, self.n_graphs, self.node_capacity,
                          self.edge_capacity, dropped=self.dropped)

    # -- conversion ---------------------------------------------------------

    @classmethod
    def from_batch(
        cls,
        batch: Batch,
        node_capacity: int,
        edge_capacity: int,
        n_graphs: int = None,
        edge_tile: int = None,
        window: int = 128,
    ) -> "GraphBatch":
        """Pad a host Batch to static capacities (numpy; no device transfer).

        Graphs that don't fit the capacities are dropped from the tail and
        the count is recorded in ``.dropped`` (never silently ignored —
        the dataloader logs it).

        ``edge_tile``: lay edges out in per-graph blocks padded to a
        multiple of ``edge_tile`` so every tile of that many edges belongs
        to one graph whose nodes fit a ``window``-node window.  This is the
        batch invariant the Pallas full-conv kernel needs to turn
        gather/scatter into windowed one-hot matmuls; it adds the arrays
        ``_edge_tile_win`` [E/T] (window start per tile) and
        ``_edge_src_local``/``_edge_dst_local`` [E] (window-relative edge
        indices).  Requires every kept graph to have <= ``window`` nodes.
        """
        if edge_tile:
            return cls._from_batch_tiled(
                batch, node_capacity, edge_capacity, n_graphs,
                edge_tile, window,
            )
        batch.computeCumsums()
        g_total = batch.n_graphs
        n_graphs = g_total if n_graphs is None else n_graphs

        n_nodes = batch.data["_n_nodes"][:, 0].astype(np.int64)
        has_edges = "_n_edges" in batch.data
        n_edges = (
            batch.data["_n_edges"][:, 0].astype(np.int64)
            if has_edges
            else np.zeros(g_total, np.int64)
        )
        # how many graphs fit (one node slot reserved for the dummy node)
        g_keep = 0
        nodes_used = edges_used = 0
        for i in range(min(g_total, n_graphs)):
            if (
                nodes_used + n_nodes[i] <= node_capacity - 1
                and edges_used + n_edges[i] <= edge_capacity
            ):
                nodes_used += int(n_nodes[i])
                edges_used += int(n_edges[i])
                g_keep += 1
            else:
                break
        dropped = min(g_total, n_graphs) - g_keep

        N, E, G = node_capacity, edge_capacity, n_graphs
        dummy = N - 1
        data: Dict[str, np.ndarray] = {}
        node_seg = np.full((N,), G, dtype=np.int32)
        node_seg[:nodes_used] = batch.nodeSegment()[:nodes_used]
        data["_node_segment"] = node_seg
        edge_seg = np.full((E,), G, dtype=np.int32)
        if has_edges:
            edge_seg[:edges_used] = batch.edgeSegment()[:edges_used]
        data["_edge_segment"] = edge_seg
        node_mask = np.zeros((N, 1), np.float32)
        node_mask[:nodes_used] = 1.0
        data["_node_mask"] = node_mask
        edge_mask = np.zeros((E, 1), np.float32)
        edge_mask[:edges_used] = 1.0
        data["_edge_mask"] = edge_mask
        graph_mask = np.zeros((G, 1), np.float32)
        graph_mask[:g_keep] = 1.0
        data["_graph_mask"] = graph_mask

        def pad_to(a, rows, fill=0):
            out = np.full((rows,) + a.shape[1:], fill, dtype=a.dtype)
            out[: min(len(a), rows)] = a[: min(len(a), rows)]
            return out

        if "edge_index" not in batch.data:
            # no host-side edges: synthesize empty buffers at capacity so a
            # device-side edge layer (computeEdgeIndexDevice) can fill them
            data["edge_index"] = np.full((2, E), dummy, dtype=np.int32)
            data["_n_edges"] = np.zeros((G, 1), np.int32)

        for key, value in batch.data.items():
            if key in ("_node_segment", "_edge_segment"):
                continue
            if key == "edge_index":
                ei = np.full((2, E), dummy, dtype=np.int32)
                ei[:, :edges_used] = value[:, :edges_used]
                data[key] = ei
                continue
            per = batch.attrs.get(key, ("graph",))[0]
            if np.issubdtype(value.dtype, np.floating):
                value = value.astype(np.float32)
            elif np.issubdtype(value.dtype, np.integer):
                value = value.astype(np.int32)
            if per == "node":
                data[key] = pad_to(value[:nodes_used], N)
            elif per == "edge":
                data[key] = pad_to(value[:edges_used], E)
            else:  # graph
                data[key] = pad_to(value[:g_keep], G)

        return cls(data, dict(batch.attrs), G, N, E, dropped=dropped)

    @classmethod
    def _from_batch_tiled(cls, batch, node_capacity, edge_capacity, n_graphs,
                          T, window):
        """Tile-aligned layout (see from_batch docstring)."""
        batch.computeCumsums()
        g_total = batch.n_graphs
        n_graphs = g_total if n_graphs is None else n_graphs
        N, E, G = node_capacity, edge_capacity, n_graphs
        assert E % T == 0, f"edge capacity {E} not a multiple of tile {T}"
        assert N % window == 0, (
            f"node capacity {N} not a multiple of window {window}; the "
            "kernel's pl.multiple_of(win0, 8) alignment hint and the "
            "exclusive per-run node blocks both require window-aligned N"
        )
        dummy = N - 1

        n_nodes = batch.data["_n_nodes"][:, 0].astype(np.int64)
        has_edges = "_n_edges" in batch.data
        n_edges = (
            batch.data["_n_edges"][:, 0].astype(np.int64)
            if has_edges
            else np.zeros(g_total, np.int64)
        )
        def slots_of(e):
            return int((e + T - 1) // T) * T

        # pack consecutive graphs into window "runs": all graphs of a run
        # share node windows, so their edges concatenate with the tile
        # padding paid once per run instead of once per graph (~5% overhead
        # at QM9 scale instead of ~45%).  Each run owns an EXCLUSIVE
        # window-aligned node block [r*window, (r+1)*window): windows never
        # overlap, so the kernel's per-window accumulators map 1:1 onto
        # block-indexed outputs (see ops/pallas/fused_conv.py).  The last
        # window-sized block of the node capacity is the shared pad block
        # (dummy node at N-1).
        max_runs = N // window - 1
        runs = []  # list of [graph indices]
        g_keep = 0
        slots_used = 0
        cur_nodes = cur_edges = cur_slots = 0
        for i in range(min(g_total, n_graphs)):
            if n_nodes[i] > window:
                raise ValueError(
                    f"graph {i} has {n_nodes[i]} nodes > window ({window}); "
                    "tile-aligned batching requires graphs to fit the "
                    "scatter window"
                )
            extend = bool(runs) and cur_nodes + n_nodes[i] <= window
            if extend:
                new_slots = slots_of(cur_edges + n_edges[i])
                delta = new_slots - cur_slots
            else:
                if len(runs) >= max_runs:
                    break
                new_slots = slots_of(n_edges[i])
                delta = new_slots
            if slots_used + delta <= edge_capacity:
                if extend:
                    runs[-1].append(i)
                    cur_nodes += int(n_nodes[i])
                    cur_edges += int(n_edges[i])
                else:
                    runs.append([i])
                    cur_nodes = int(n_nodes[i])
                    cur_edges = int(n_edges[i])
                cur_slots = new_slots
                slots_used += delta
                g_keep += 1
            else:
                break
        # CONTRACT: the pack loop stops at the FIRST graph that does not fit,
        # so the dropped graphs are always a contiguous suffix of the input.
        # DataLoader._batches relies on this to re-queue exactly
        # items[len(items)-dropped:] for the next batch; a skip-and-continue
        # packing strategy would silently duplicate/lose graphs there.
        dropped = min(g_total, n_graphs) - g_keep

        src_ofs = np.concatenate([[0], np.cumsum(n_edges[:g_keep])])
        edges_real = int(src_ofs[-1])

        # node destinations: graph g of run r lands at r*window + intra-run
        # offset; everything per-node scatters through node_dest
        node_dest_of_graph = np.zeros(g_keep + 1, np.int64)
        for r, graphs in enumerate(runs):
            intra = 0
            for i in graphs:
                node_dest_of_graph[i] = r * window + intra
                intra += int(n_nodes[i])
        node_dest_parts = [
            np.arange(int(n_nodes[i])) + int(node_dest_of_graph[i])
            for r, graphs in enumerate(runs) for i in graphs
        ]
        node_dest = (
            np.concatenate(node_dest_parts).astype(np.int64)
            if node_dest_parts else np.zeros(0, np.int64)
        )
        nodes_real = len(node_dest)

        # run bookkeeping: slot offset, node start, slot span
        run_first = [r[0] for r in runs]
        run_edges = [int(sum(n_edges[i] for i in r)) for r in runs]
        run_slots = [slots_of(e) for e in run_edges]
        run_slot_ofs = np.concatenate([[0], np.cumsum(run_slots)]).astype(
            np.int64
        )
        assert not runs or int(run_slot_ofs[-1]) == slots_used

        # destination slot of each real edge, and the run of each tile
        dest_parts = []
        for r, graphs in enumerate(runs):
            e0 = int(src_ofs[graphs[0]])
            e1 = int(src_ofs[graphs[-1] + 1])
            dest_parts.append(
                np.arange(e1 - e0) + int(run_slot_ofs[r])
            )
        dest = (
            np.concatenate(dest_parts).astype(np.int64)
            if dest_parts else np.zeros(0, np.int64)
        )
        n_tiles = E // T
        tile_run = np.full(n_tiles, -1, np.int64)
        for r in range(len(runs)):
            tile_run[int(run_slot_ofs[r]) // T: int(run_slot_ofs[r + 1]) // T] = r

        data = {}
        node_seg = np.full((N,), G, dtype=np.int32)
        node_seg[node_dest] = batch.nodeSegment()[:nodes_real]
        data["_node_segment"] = node_seg
        edge_seg = np.full((E,), G, dtype=np.int32)
        if has_edges and g_keep:
            edge_seg[dest] = batch.edgeSegment()[:edges_real]
        data["_edge_segment"] = edge_seg
        node_mask = np.zeros((N, 1), np.float32)
        node_mask[node_dest] = 1.0
        data["_node_mask"] = node_mask
        edge_mask = np.zeros((E, 1), np.float32)
        if g_keep:
            edge_mask[dest] = 1.0
        data["_edge_mask"] = edge_mask
        graph_mask = np.zeros((G, 1), np.float32)
        graph_mask[:g_keep] = 1.0
        data["_graph_mask"] = graph_mask

        # per-tile window start: run r's exclusive node block [r*W, (r+1)*W);
        # trailing all-padding tiles window onto the shared pad block (the
        # dummy node lives there) so their zero messages and cotangents land
        # exactly where the reference layout puts them
        win0 = np.full(n_tiles, max(0, N - window), np.int32)
        for k in range(n_tiles):
            r = tile_run[k]
            if r >= 0:
                win0[k] = r * window
        data["_edge_tile_win"] = win0
        # run boundaries for the kernel's window accumulator: a tile is
        # "first" when it starts a run (scratch reset) and "last" when it
        # ends one (per-window mix flush); trailing all-padding tiles never
        # flush (their zero contributions have nowhere real to go)
        tile_last = np.zeros(n_tiles, np.int32)
        for k in range(n_tiles):
            if tile_run[k] >= 0 and (
                k == n_tiles - 1 or tile_run[k + 1] != tile_run[k]
            ):
                tile_last[k] = 1
        tile_first = np.zeros(n_tiles, np.int32)
        if n_tiles:
            tile_first[0] = 1
            tile_first[1:] = tile_last[:-1]
        data["_edge_tile_first"] = tile_first
        data["_edge_tile_last"] = tile_last

        # edge_index: padding edges point at their graph's first node (zero
        # contribution — radial weights are masked) so the whole tile stays
        # inside the window; trailing tiles point at the dummy node but get
        # window 0 / local 0 with mask 0.
        ei = np.full((2, E), dummy, dtype=np.int32)
        # trailing slots: local index of the dummy node inside the trailing
        # window [N - window, N)
        src_local = np.full(E, min(window, N) - 1, np.int32)
        dst_local = np.full(E, min(window, N) - 1, np.int32)
        if g_keep:
            # remap endpoints from the host batch's contiguous node ids to
            # the window-block layout
            node_shift = np.cumsum(np.concatenate([[0], n_nodes[:g_keep]]))
            remap = np.full(int(node_shift[-1]) + 1, dummy, np.int64)
            remap[:nodes_real] = node_dest
            orig = batch.data["edge_index"][:, :edges_real].astype(np.int64)
            ei[:, dest] = remap[orig]
            for r in range(len(runs)):
                lo, hi = int(run_slot_ofs[r]), int(run_slot_ofs[r + 1])
                n0 = r * window
                ei[:, lo:hi][ei[:, lo:hi] == dummy] = n0
            tile_of_slot = np.arange(E) // T
            w = win0[tile_of_slot]
            src_local[:slots_used] = ei[0, :slots_used] - w[:slots_used]
            dst_local[:slots_used] = ei[1, :slots_used] - w[:slots_used]
        data["edge_index"] = ei
        data["_edge_src_local"] = src_local
        data["_edge_dst_local"] = dst_local

        def pad_to(a, rows, fill=0):
            out = np.full((rows,) + a.shape[1:], fill, dtype=a.dtype)
            out[: min(len(a), rows)] = a[: min(len(a), rows)]
            return out

        for key, value in batch.data.items():
            if key in ("_node_segment", "_edge_segment", "edge_index"):
                continue
            per = batch.attrs.get(key, ("graph",))[0]
            if np.issubdtype(value.dtype, np.floating):
                value = value.astype(np.float32)
            elif np.issubdtype(value.dtype, np.integer):
                value = value.astype(np.int32)
            if per == "node":
                out = np.zeros((N,) + value.shape[1:], value.dtype)
                out[node_dest] = value[:nodes_real]
                data[key] = out
            elif per == "edge":
                out = np.zeros((E,) + value.shape[1:], value.dtype)
                if g_keep:
                    out[dest] = value[:edges_real]
                data[key] = out
            else:  # graph
                data[key] = pad_to(value[:g_keep], G)

        return cls(data, dict(batch.attrs), G, N, E, dropped=dropped)

    def to_batch(self) -> Batch:
        """Trim padding and return a host-side Batch (for dumps/analysis)."""
        data = {k: np.asarray(v) for k, v in self.data.items()}
        g = int(data["_graph_mask"][:, 0].sum())
        # tile-aligned batches scatter real nodes/edges between padding;
        # compact by mask (a prefix slice for the default layout, identical
        # result) and renumber edge endpoints to the compacted node ids
        n_sel = data["_node_mask"][:, 0] > 0
        e_sel = data["_edge_mask"][:, 0] > 0
        inv = np.zeros(len(n_sel), np.int64)
        inv[n_sel] = np.arange(int(n_sel.sum()))
        out = {}
        for key, value in data.items():
            if key.startswith("_") and key not in ("_n_nodes", "_n_edges"):
                continue
            if key == "edge_index":
                out[key] = inv[value[:, e_sel].astype(np.int64)]
                continue
            per = self.attrs.get(key, ("graph",))[0]
            if per == "node":
                out[key] = value[n_sel]
            elif per == "edge":
                out[key] = value[e_sel]
            else:
                out[key] = value[:g]
        return Batch(dict(self.attrs), **out)
