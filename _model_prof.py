import os, time, glob, gzip, json, collections, numpy as np, jax, jax.numpy as jnp
os.environ["E3_PALLAS"] = "1"
from equivariant_nn_zoo_tpu.data import Batch, GraphBatch
from equivariant_nn_zoo_tpu.models import get_config
from equivariant_nn_zoo_tpu.run.loss import Loss
from equivariant_nn_zoo_tpu.utils import build
import bench as B
rng = np.random.default_rng(0)
mols = B.synthetic_qm9(128, rng)
nn = [int(np.asarray(m["pos"]).shape[0]) for m in mols]
ne = [int(np.asarray(m["edge_index"]).shape[-1]) for m in mols]
head = 1.1 + 2.0/(128**0.5)
ncap = int(np.ceil(128*np.mean(nn)*head/128)*128)
ecap = int(np.ceil(128*np.mean(ne)*head/128)*128)
gb = jax.device_put(GraphBatch.from_batch(Batch.from_data_list(mols), ncap, ecap, 128))
cfg = get_config("config_energy")
loss_obj = Loss(dict(cfg.loss_coeffs))
model = build(cfg.model_config)
params = model.init(jax.random.PRNGKey(0))
def loss_fn(p):
    out = model.apply(p, gb)
    return loss_obj(out.data, gb.data)[0]
vg = jax.jit(jax.value_and_grad(loss_fn))
l, g = vg(params); jax.block_until_ready(l)
with jax.profiler.trace("/tmp/mtrace"):
    for _ in range(10):
        l, g = vg(params)
    jax.block_until_ready(l)
time.sleep(1)
tr = sorted(glob.glob("/tmp/mtrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(tr)).get("traceEvents", [])
by = collections.Counter(); tot=0
for e in ev:
    a = e.get("args", {})
    if e.get("ph") == "X" and "hlo_category" in a:
        d = int(a.get("device_duration_ps","0"))/1e9/10
        by[a.get("source","?")] += d; tot += d
print(f"total {tot:.1f} ms/step")
for s, d in by.most_common(20):
    print(f"{d:8.2f}  {s}")
