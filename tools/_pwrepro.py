"""Repro: run the hamiltonian train step with the pairwise kernel on TPU
and print the full error."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import sys
import traceback
from functools import partial

import numpy as np

sys.argv = ["bench.py", "hamiltonian", "16"]
import jax
import optax

from bench import make_batches, synthetic_h2o
from equivariant_nn_zoo_tpu.models import get_config
from equivariant_nn_zoo_tpu.run.loss import Loss
from equivariant_nn_zoo_tpu.utils import build

rng = np.random.default_rng(0)
cfg = get_config("config_hamiltonian")
batch_size = 16
loss_obj = Loss(dict(cfg.loss_coeffs))
mols = synthetic_h2o(batch_size * 4, rng)
batches, _, _ = make_batches(mols, batch_size)

model = build(cfg.model_config)
params = model.init(jax.random.PRNGKey(0))
optimizer = optax.adam(1e-3)
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


try:
    params, opt_state, l0 = train_step(params, opt_state, batches[0])
    jax.block_until_ready(l0)
    print("OK loss=", l0)
except Exception:
    traceback.print_exc()
