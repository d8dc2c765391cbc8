"""Per-op profile of the bench.py train step (tile-aligned Pallas path)."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import collections
import glob
import gzip
import json
import time
from functools import partial

import numpy as np

import bench as B


def main():
    import jax
    import optax

    from equivariant_nn_zoo_tpu.data import Batch, GraphBatch
    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run.loss import Loss
    from equivariant_nn_zoo_tpu.utils import build

    from equivariant_nn_zoo_tpu.data.dataloader import estimate_capacities

    rng = np.random.default_rng(0)
    batch_size = 128
    cfg = get_config("config_energy")
    model = build(cfg.model_config)
    loss_obj = Loss(dict(cfg.loss_coeffs))
    mols = B.synthetic_qm9(batch_size * 4, rng)
    tile = 128 if jax.default_backend() == "tpu" else None
    node_cap, edge_cap = estimate_capacities(
        mols, batch_size, edge_tile=tile, window=128
    )
    while True:
        batches = []
        for b in range(4):
            host = Batch.from_data_list(
                mols[b * batch_size:(b + 1) * batch_size]
            )
            gb = GraphBatch.from_batch(host, node_cap, edge_cap, batch_size,
                                       edge_tile=tile)
            if gb.dropped:
                break
            batches.append(gb)
        if len(batches) == 4:
            break
        node_cap += 128
        edge_cap += tile or 128
    batches = [jax.device_put(gb) for gb in batches]

    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply(p, batch)
            loss, _ = loss_obj(out.data, batch.data)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, opt_state, loss = train_step(params, opt_state, batches[0])
    jax.block_until_ready(loss)
    for b in batches:
        params, opt_state, loss = train_step(params, opt_state, b)
    jax.block_until_ready(loss)

    n = 20
    with jax.profiler.trace("/tmp/p2trace"):
        for i in range(n):
            params, opt_state, loss = train_step(params, opt_state,
                                                 batches[i % 4])
        jax.block_until_ready(loss)
    time.sleep(1)
    tr = sorted(glob.glob("/tmp/p2trace/**/*.trace.json.gz", recursive=True))[-1]
    ev = json.load(gzip.open(tr)).get("traceEvents", [])
    by_src = collections.Counter()
    by_name = collections.Counter()
    by_cat = collections.Counter()
    tot = 0
    for e in ev:
        a = e.get("args", {})
        if e.get("ph") == "X" and "hlo_category" in a:
            d = int(a.get("device_duration_ps", "0")) / 1e9 / n
            by_src[a.get("source", "?")] += d
            by_name[e.get("name", "")[:52]] += d
            by_cat[a.get("hlo_category", "?")] += d
            tot += d
    print(f"total {tot:.2f} ms/step  ({128/ (tot/1e3):.0f} graphs/sec)")
    print("== by category ==")
    for s, d in by_cat.most_common(12):
        print(f"{d:8.2f}  {s}")
    print("== by source ==")
    for s, d in by_src.most_common(18):
        print(f"{d:8.2f}  {s}")
    print("== by op name ==")
    for s, d in by_name.most_common(28):
        print(f"{d:8.2f}  {s}")


if __name__ == "__main__":
    main()
