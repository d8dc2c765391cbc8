"""Isolate the tunnel H2D cost: device_put of a regular GraphBatch (14
leaves) vs its to_wire() form (2 blobs).  Also times to_wire itself and a
full producer iteration (pack + put)."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import time

import numpy as np

from equivariant_nn_zoo_tpu.data import Batch, GraphBatch

import jax

RNG = np.random.default_rng(0)

items = []
for _ in range(128):
    n = int(RNG.integers(12, 24))
    e = int(RNG.integers(30, 60))
    ei = np.stack([RNG.integers(0, n, e), RNG.integers(0, n, e)])
    items.append({
        "pos": RNG.normal(size=(n, 3)).astype(np.float32),
        "species": RNG.integers(1, 5, size=(n, 1)),
        "edge_index": ei.astype(np.int64),
        "y": np.asarray([[1.5]], np.float32),
        "_n_nodes": n,
    })
attrs = {"pos": ("node", "1x1o"), "species": ("node", "1x0e"),
         "y": ("graph", "1x0e"), "_n_nodes": ("graph", "1x0e")}
gb = GraphBatch.from_batch(Batch.from_data_list(items, attrs), 2944, 7040,
                           128)
print("leaves:", len(jax.tree_util.tree_leaves(gb)),
      "bytes:", sum(np.asarray(v).nbytes for v in gb.data.values()))

w = gb.to_wire()
print("wire leaves:", len(jax.tree_util.tree_leaves(w)))

REP = 200


def timeit(label, fn):
    fn()  # warm
    outs = []
    t0 = time.perf_counter()
    for _ in range(REP):
        outs.append(fn())
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / REP * 1e3
    print(f"{label:28s} {dt:7.3f} ms")


timeit("device_put(gb)", lambda: jax.device_put(gb))
timeit("device_put(wire)", lambda: jax.device_put(w))
timeit("to_wire+device_put", lambda: jax.device_put(gb.to_wire()))
timeit("to_wire (host only)", lambda: gb.to_wire())
