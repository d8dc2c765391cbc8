"""Measure hamiltonian train-step jaxpr/HLO size and compile time on CPU.

Usage: python _hcompile.py [batch] [stage]
  stage: lower | compile (default lower)
Env: E3_PALLAS_PAIRWISE=0|force to pick the head path.
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import sys
import time

import numpy as np


def main(batch=4, stage="lower"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from bench import make_batches, synthetic_h2o
    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run.loss import Loss
    from equivariant_nn_zoo_tpu.utils import build

    rng = np.random.default_rng(0)
    cfg = get_config("config_hamiltonian")
    loss_obj = Loss(dict(cfg.loss_coeffs))
    mols = synthetic_h2o(batch * 4, rng)
    batches, _, _ = make_batches(mols, batch)
    model = build(cfg.model_config)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def train_step(params, opt_state, b):
        def loss_fn(p):
            out = model.apply(p, b)
            loss, _ = loss_obj(out.data, b.data)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    lo = jax.jit(train_step, donate_argnums=(0, 1)).lower(
        params, opt_state, batches[0]
    )
    t_lower = time.time() - t0
    txt = lo.as_text()
    n_lines = txt.count("\n")
    print(f"lower: {t_lower:.1f}s, stablehlo lines={n_lines}", flush=True)
    if stage == "compile":
        t0 = time.time()
        lo.compile()
        print(f"compile: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    s = sys.argv[2] if len(sys.argv) > 2 else "lower"
    main(b, s)
