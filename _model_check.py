import os, time, numpy as np, jax, jax.numpy as jnp, optax
from functools import partial
from equivariant_nn_zoo_tpu.data import Batch, Data, GraphBatch, computeEdgeIndex
from equivariant_nn_zoo_tpu.models import get_config
from equivariant_nn_zoo_tpu.run.loss import Loss
from equivariant_nn_zoo_tpu.utils import build
import bench as B

rng = np.random.default_rng(0)
mols = B.synthetic_qm9(128, rng)
n_nodes = [int(np.asarray(m["pos"]).shape[0]) for m in mols]
n_edges = [int(np.asarray(m["edge_index"]).shape[-1]) for m in mols]
head = 1.1 + 2.0/(128**0.5)
ncap = int(np.ceil(128*np.mean(n_nodes)*head/128)*128)
ecap = int(np.ceil(128*np.mean(n_edges)*head/128)*128)
host = Batch.from_data_list(mols)
gb = jax.device_put(GraphBatch.from_batch(host, ncap, ecap, 128))
print("caps", ncap, ecap)

cfg = get_config("config_energy")
loss_obj = Loss(dict(cfg.loss_coeffs))
outs = {}
for mode in ["pallas", "xla"]:
    os.environ["E3_PALLAS"] = "1" if mode == "pallas" else "0"
    model = build(cfg.model_config)
    params = model.init(jax.random.PRNGKey(0))
    def loss_fn(p):
        out = model.apply(p, gb)
        return loss_obj(out.data, gb.data)[0]
    vg = jax.jit(jax.value_and_grad(loss_fn))
    t0=time.time(); l, g = vg(params); jax.block_until_ready(l)
    print(mode, "compile", round(time.time()-t0,1), "s loss", float(l))
    outs[mode] = (float(l), g)
    t0=time.time()
    for _ in range(100):
        l, g = vg(params)
    jax.block_until_ready(l)
    dt=(time.time()-t0)/100
    print(f"{mode}: {dt*1e3:.2f} ms/step fwd+bwd -> {128/dt:.0f} graphs/s (no opt)")
la, ga = outs["pallas"]; lb, gb_ = outs["xla"]
print("loss rel:", abs(la-lb)/abs(lb))
worst = 0
for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb_)):
    d = float(jnp.abs(a-b).max()); m = max(float(jnp.abs(b).max()), 1e-8)
    worst = max(worst, d/m)
print("grad worst rel:", worst)
