"""Per-op profile of the energy_force train step (grad_order=2 hybrid)."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import collections
import glob
import gzip
import json
import sys
import time
from functools import partial

import numpy as np

import bench as B


def main():
    import jax
    import optax

    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run.loss import Loss
    from equivariant_nn_zoo_tpu.utils import build

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    cfg = get_config("config_energy_force")
    model = build(cfg.model_config)
    loss_obj = Loss(dict(cfg.loss_coeffs))
    mols = B.synthetic_fragments(batch_size * 4, rng,
                                 r_max=cfg.model_config.r_max)
    batches, _, _ = B.make_batches(mols, batch_size)

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
    with jax.profiler.trace("/tmp/pforcetrace"):
        for i in range(n):
            params, opt_state, loss = train_step(params, opt_state,
                                                 batches[i % 4])
        jax.block_until_ready(loss)
    time.sleep(1)
    tr = sorted(glob.glob("/tmp/pforcetrace/**/*.trace.json.gz",
                          recursive=True))[-1]
    ev = json.load(gzip.open(tr)).get("traceEvents", [])
    by_src = collections.Counter()
    by_name = collections.Counter()
    by_cat = collections.Counter()
    tot = 0
    for e in ev:
        a = e.get("args", {})
        if e.get("ph") == "X" and "hlo_category" in a:
            d = int(a.get("device_duration_ps", "0")) / 1e9 / n
            by_src[a.get("source", "?")[:78]] += d
            by_name[e.get("name", "")[:56]] += d
            by_cat[a.get("hlo_category", "?")] += d
            tot += d
    print(f"total {tot:.2f} ms/step  ({batch_size / (tot/1e3):.0f} graphs/sec)")
    print("== by category ==")
    for s, d in by_cat.most_common(14):
        print(f"{d:8.3f}  {s}")
    print("== by source ==")
    for s, d in by_src.most_common(30):
        print(f"{d:8.3f}  {s}")
    print("== by op name ==")
    for s, d in by_name.most_common(36):
        print(f"{d:8.3f}  {s}")


if __name__ == "__main__":
    main()
