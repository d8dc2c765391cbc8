"""DataLoader: shuffled batching, collation to host Batch, padding to static
GraphBatch capacities, infinite auto-resetting iterators, per-process file
sharding for data parallelism.

Reference parity: e3_layers/data/dataloader.py (C4 in SURVEY.md §2).  The
torch multi-worker pipeline is replaced by a single-process numpy pipeline
with an optional background prefetch thread — QM9-scale preprocessing is
trivially cheap on host, and the padded batches keep the device graph static
(capacities are estimated once from a dataset sample and then frozen so jit
compiles exactly once).
"""

from __future__ import annotations

import logging
import math
import queue
import threading
from typing import List

import numpy as np

from .batch import Batch
from .data import Data
from .graph_batch import GraphBatch


class Collater:
    """Reference parity: dataloader.py:13-28."""

    @classmethod
    def for_dataset(cls, dataset):
        return cls()

    def collate(self, batch: List[Data]) -> Batch:
        return Batch.from_data_list(batch, attrs=dict(batch[0].attrs))

    def __call__(self, batch):
        return self.collate(batch)


def estimate_capacities(dataset, batch_size: int, sample: int = 256,
                        headroom: float = None, multiple: int = 128,
                        edge_tile: int = None, window: int = 128,
                        defer_overflow: bool = True):
    """Estimate static (node, edge) capacities from a dataset sample.

    Capacity = batch_size * mean-per-graph * headroom, rounded up; one node
    slot is reserved for the dummy node.  Overflowing graphs are dropped (and
    counted) at padding time — never silently.
    """
    if headroom is None:
        # batch sums concentrate as ~1/sqrt(B); small batches need more slack
        headroom = 1.1 + 2.0 / (batch_size ** 0.5)
    n = min(len(dataset), sample)
    idx = np.linspace(0, len(dataset) - 1, n).astype(np.int64)
    nodes, edges = [], []
    for i in idx:
        item = dataset[int(i)]
        if "_n_nodes" in item:
            nodes.append(int(np.asarray(item["_n_nodes"]).sum()))
        else:  # bare Data: count rows of any node-annotated key
            per_node = [k for k, (per, _) in item.attrs.items()
                        if per == "node"]
            nodes.append(int(np.asarray(item[per_node[0]]).shape[0]))
        if "_n_edges" in item:
            edges.append(int(np.asarray(item["_n_edges"]).sum()))
        elif "edge_index" in item:
            edges.append(int(np.asarray(item["edge_index"]).shape[-1]))
        else:
            edges.append(0)
    def round_up(x):
        return int(math.ceil(x / multiple) * multiple)
    node_cap = round_up(batch_size * float(np.mean(nodes)) * headroom + 1)
    max_graph_nodes = max(nodes)
    node_cap = max(node_cap, round_up(max_graph_nodes + 1))
    edge_cap = round_up(max(batch_size * float(np.mean(edges)) * headroom, 1))
    edge_cap = max(edge_cap, round_up(max(edges) + 1))
    if edge_tile:
        # tile-aligned layout: bootstrap-quantile capacity.  Simulate the
        # loader's window-run packing over resampled batches; with overflow
        # DEFERRAL available (single-shard loaders carry non-fitting graphs
        # to the next batch) the capacity sits at the ~q80 batch need —
        # occasional overflows cost nothing (the graphs ride along later),
        # while padding waste drops ~15% vs mean*headroom.  Without deferral
        # (sharded loaders) use the bootstrap max.
        rng = np.random.default_rng(0)
        all_slots, all_runs = [], []
        for _ in range(64):
            sel = rng.integers(0, len(nodes), size=batch_size)
            cur_nodes = window + 1  # force a new run at the first graph
            run_edges, slots, n_runs = 0, 0, 0
            for i in sel:
                if cur_nodes + nodes[i] <= window:
                    cur_nodes += nodes[i]
                    run_edges += edges[i]
                else:
                    slots += math.ceil(run_edges / edge_tile) * edge_tile
                    cur_nodes = nodes[i]
                    run_edges = edges[i]
                    n_runs += 1
                if nodes[i] > window:
                    raise ValueError(
                        f"graph with {nodes[i]} nodes exceeds the "
                        f"{window}-node scatter window"
                    )
            slots += math.ceil(run_edges / edge_tile) * edge_tile
            all_slots.append(slots)
            all_runs.append(n_runs)
        if defer_overflow:
            slots_cap = float(np.quantile(all_slots, 0.8))
            runs_cap = float(np.quantile(all_runs, 0.8))
        else:
            slots_cap = float(max(all_slots))
            runs_cap = float(max(all_runs))
        edge_cap = int(math.ceil(slots_cap / edge_tile) * edge_tile) + edge_tile
        # the tile-batched kernel (E3_PALLAS_TILEBATCH, fused_conv.py)
        # processes B edge tiles per grid step and needs E % (B*tile) == 0;
        # round the capacity up so the batched grid divides evenly (the
        # extra slots land in the trailing pad run, ~0.3% at QM9 scale)
        from ..ops.pallas.fused_conv import _tile_batch_env

        bt = edge_tile * _tile_batch_env()
        edge_cap = int(math.ceil(edge_cap / bt) * bt)
        # each run owns an exclusive window-sized node block, plus the
        # shared trailing pad block (dummy node)
        node_cap = (int(runs_cap) + 1) * window
    return node_cap, edge_cap


def _default_edge_tile(dataset):
    """Tile-aligned batches by default on TPU (the Pallas full-conv kernel
    consumes them; other paths ignore the extra arrays).  Host-side edges
    must exist — device-built edge workloads keep the plain layout."""
    import os

    if os.environ.get("E3_PALLAS", "1") != "1":
        return None
    if os.environ.get("E3_TILE_EDGES", "") == "0":
        return None
    try:
        import jax

        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    try:
        item = dataset[0]
        if "edge_index" not in item.keys() and "_n_edges" not in item.keys():
            return None
    except Exception:
        return None
    return 128


def _worker_get(dataset, idx_chunk):
    return [dataset[i] for i in idx_chunk]


class DataLoader:
    """Iterates padded GraphBatches over a CondensedDataset."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 seed: int = 0, node_capacity: int = None,
                 edge_capacity: int = None, drop_last: bool = True,
                 prefetch: int = 2, num_shards: int = 1,
                 edge_tile: int = None, window: int = 128,
                 num_workers: int = 0, worker_timeout: float = 120.0,
                 **kwargs):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.collater = Collater.for_dataset(dataset)
        self.num_shards = num_shards
        if edge_tile is None:
            edge_tile = _default_edge_tile(dataset)
        self.edge_tile = edge_tile or None
        self.window = window
        if num_shards > 1:
            assert batch_size % num_shards == 0, (
                "batch_size must divide evenly across shards"
            )
        if node_capacity is None or edge_capacity is None:
            node_capacity, edge_capacity = estimate_capacities(
                dataset, batch_size // num_shards, multiple=128,
                edge_tile=self.edge_tile, window=window,
                defer_overflow=(num_shards == 1),
            )
        else:
            if self.edge_tile and edge_capacity % self.edge_tile:
                edge_capacity = int(
                    math.ceil(edge_capacity / self.edge_tile) * self.edge_tile
                )
            # the tiled packer gives every window-run an exclusive
            # window-aligned node block (graph_batch._from_batch_tiled), so
            # an explicit override must also be a multiple of the window —
            # otherwise the pad block's win0 hint lies to the kernel
            if self.edge_tile and node_capacity % window:
                node_capacity = int(
                    math.ceil(node_capacity / window) * window
                )
        self.node_capacity = node_capacity
        self.edge_capacity = edge_capacity
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = int(num_workers or 0)
        self.worker_timeout = worker_timeout
        self._pool = None
        if self.num_workers > 0:
            # threads, not processes: preprocessed items are numpy-rich and
            # small-op-heavy, so process pools lose their parallel gains to
            # result pickling (measured 1.3-2x SLOWER than serial at QM9
            # scale); numpy releases the GIL in the distance/sort kernels,
            # which is where the time is
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="e3loader",
            )
        self.dropped_graphs = 0
        # overflow graphs deferred past the epoch's last batch roll into the
        # NEXT epoch's first batch (reference parity: the torch loader never
        # loses data, e3_layers/data/dataloader.py:109-117 just auto-resets).
        # In-memory only: a checkpoint resume restarts with an empty carry.
        self._carry: List = []

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _pad(self, host, n_graphs) -> GraphBatch:
        if self.edge_tile:
            try:
                return GraphBatch.from_batch(
                    host, self.node_capacity, self.edge_capacity, n_graphs,
                    edge_tile=self.edge_tile, window=self.window,
                )
            except ValueError as e:  # graphs too large for the window
                logging.warning(
                    "tile-aligned batching disabled: %s", e
                )
                self.edge_tile = None
        return GraphBatch.from_batch(
            host, self.node_capacity, self.edge_capacity, n_graphs
        )

    def _make_batch(self, indices) -> GraphBatch:
        items = [self.dataset[int(i)] for i in indices]
        return self._make_batch_items(items)

    def _make_batch_items(self, items) -> GraphBatch:
        if self.num_shards > 1:
            # one padded sub-batch per device, stacked on a leading axis
            from ..parallel.data_parallel import stack_shards

            per = self.batch_size // self.num_shards
            shards = []
            dropped = 0
            for s in range(self.num_shards):
                host = self.collater(items[s * per : (s + 1) * per])
                gb = self._pad(host, per)
                dropped += gb.dropped
                shards.append(gb)
            out = stack_shards(shards)
            out.dropped = dropped
        else:
            host = self.collater(items)
            out = self._pad(host, self.batch_size)
        return out

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        for b in range(nb):
            yield order[b * self.batch_size : (b + 1) * self.batch_size]

    # ------------------------------------------------ parallel item pipeline

    def _item_stream(self):
        """Preprocessed items in index order.  With ``num_workers`` > 0 the
        per-item preprocessing (radius graph, crop, masked2indexed — the
        actual host hotspot for protein workloads) runs on a thread pool
        (numpy releases the GIL in the hot ops; process pools lose to result
        pickling here) with a lookahead window and a timeout guard; batch
        assembly (collate/pad/deferral) stays sequential in the parent so
        semantics are identical to the serial path.  Note the timeout aborts
        the *loader* — a hung preprocess thread cannot be cancelled and is
        leaked (unlike the reference's killable worker processes).

        Reference parity: the torch DataLoader worker processes + timeout
        (e3_layers/run/trainer.py:286-299, data/dataloader.py:94).
        """
        flat = (int(i) for idx in self._index_batches() for i in idx)
        if self.num_workers <= 0:
            for i in flat:
                yield self.dataset[i]
            return
        import collections

        # chunked tasks: per-item futures drown in pool round-trip overhead
        # (QM9 items are ~0.3 ms); a chunk amortizes it ~chunk-fold
        chunk = max(8, self.batch_size // max(1, self.num_workers))
        lookahead = 2 * self.num_workers + 2
        pending: collections.deque = collections.deque()

        def chunks():
            buf = []
            for i in flat:
                buf.append(i)
                if len(buf) == chunk:
                    yield buf
                    buf = []
            if buf:
                yield buf

        try:
            for c in chunks():
                pending.append(self._pool.submit(_worker_get, self.dataset, c))
                if len(pending) >= lookahead:
                    yield from self._worker_result(pending.popleft())
            while pending:
                yield from self._worker_result(pending.popleft())
        finally:
            while pending:
                pending.popleft().cancel()

    def _worker_result(self, fut):
        from concurrent.futures import TimeoutError

        try:
            return fut.result(timeout=self.worker_timeout)
        except TimeoutError:
            raise RuntimeError(
                f"dataloader worker timed out after {self.worker_timeout}s "
                "(preprocess hang?) — reference parity with torch "
                "DataLoader(timeout=...)"
            )

    def _batches(self):
        """Batches with overflow deferral: graphs that don't fit the static
        capacities are carried to the FRONT of the next batch instead of
        dropped — tight (bootstrap-max) capacities then cost an occasional
        smaller effective batch, never data.  Graphs still deferred at epoch
        end persist in ``self._carry`` and lead the next epoch's first
        batch."""
        carry: List = self._carry
        self._carry = []
        items_it = self._item_stream()
        n_batches = len(self)
        _end = object()
        for _ in range(n_batches):
            # fill from the carry first so the backlog drains instead of
            # compounding; top up with fresh items to a full batch
            while len(carry) < self.batch_size:
                item = next(items_it, _end)
                if item is _end:
                    break
                carry.append(item)
            items = carry[: self.batch_size]
            carry = carry[self.batch_size:]
            out = self._make_batch_items(items)
            if out.dropped and self.num_shards == 1:
                nd = out.dropped
                if nd < len(items):  # oversize-alone batches drop for real
                    carry = items[len(items) - nd:] + carry
                    out.dropped = 0
                    logging.debug("deferred %d overflow graphs", nd)
            if out.dropped:
                self.dropped_graphs += out.dropped
                logging.warning(
                    f"batch overflowed static capacities; dropped "
                    f"{out.dropped} graphs (total {self.dropped_graphs})"
                )
            yield out
        # the epoch's unconsumed tail (deferred overflows plus the fresh
        # items they displaced) leads the next epoch — nothing is dropped
        carry.extend(items_it)
        if carry:
            self._carry = carry
            logging.info(
                "epoch end: %d deferred graphs carried into the next epoch",
                len(carry),
            )

    def __iter__(self):
        if self.prefetch and self.prefetch > 0:
            return self._prefetch_iter()
        return self._batches()

    def _prefetch_iter(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def worker():
            try:
                for batch in self._batches():
                    q.put(batch)
            except Exception as e:  # pragma: no cover
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort pool cleanup
        try:
            self.close()
        except Exception:
            pass

    def state_dict(self):
        return {"rng": self.rng.bit_generator.state,
                "dropped_graphs": self.dropped_graphs}

    def load_state_dict(self, state):
        self.rng.bit_generator.state = state["rng"]
        self.dropped_graphs = state.get("dropped_graphs", 0)


def shard_paths(path, process_index: int, process_count: int):
    """Partition a list of dataset files across data-parallel processes.

    Reference parity: dataloader.py:50-56 (rank % gcd file sharding).
    """
    if not isinstance(path, (list, tuple)):
        return path
    g = math.gcd(process_count, len(path))
    start = (process_index % g) * (len(path) // g)
    end = (process_index % g + 1) * (len(path) // g)
    return list(path)[start:end]


def getDataIters(config, seed: int = 0, process_index: int = 0,
                 process_count: int = 1):
    """Build infinite train/val iterators from a config.

    Reference parity: dataloader.py:46-119 (file sharding, train/val split,
    per-process RNG seeding, auto-resetting iterators).
    """
    from .dataset import CondensedDataset
    from ..utils.utils import pruneArgs

    data_config = dict(config.data_config)
    data_config["path"] = shard_paths(
        data_config.get("path"), process_index, process_count
    )
    ds_kwargs = pruneArgs(CondensedDataset, **data_config)
    dataset = CondensedDataset(**ds_kwargs)

    total_n = len(dataset)
    n_train, n_val = data_config["n_train"], data_config["n_val"]
    if isinstance(n_train, float):
        n_train = int(n_train * total_n)
    if isinstance(n_val, float):
        n_val = int(n_val * total_n)
    if (n_train + n_val) > total_n:
        raise ValueError(
            "too little data for training and validation. please reduce "
            "n_train and n_val"
        )
    split = data_config.get("train_val_split", "random")
    if split == "random":
        idcs = np.random.default_rng(seed).permutation(total_n)
    elif split == "sequential":
        idcs = np.arange(total_n)
    else:
        raise NotImplementedError(f"splitting mode {split} not implemented")
    train_ds = dataset.index_select(idcs[:n_train])
    eval_ds = dataset.index_select(idcs[n_train : n_train + n_val])

    edge_tile = _default_edge_tile(train_ds)
    node_cap, edge_cap = estimate_capacities(
        train_ds, config.batch_size, edge_tile=edge_tile
    )
    # explicit capacity overrides (needed when edges are built on device and
    # the host data carries none — e.g. protein diffusion configs)
    node_cap = data_config.get("node_capacity") or node_cap
    edge_cap = data_config.get("edge_capacity") or edge_cap
    dl_kwargs = dict(
        batch_size=config.batch_size,
        node_capacity=node_cap,
        edge_capacity=edge_cap,
        drop_last=True,
        seed=seed + process_index,
        num_workers=data_config.get("num_workers", 0),
    )
    train_dl = DataLoader(train_ds, shuffle=True, **dl_kwargs)
    eval_dl = DataLoader(eval_ds, shuffle=False, **dl_kwargs)

    def autoReset(dataloader):
        while True:
            it = iter(dataloader)
            for batch in it:
                yield batch

    return autoReset(train_dl), autoReset(eval_dl)
