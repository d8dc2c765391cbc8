import time, numpy as np, jax, jax.numpy as jnp
from equivariant_nn_zoo_tpu.nn.message_passing import FactorizedConvolution
from equivariant_nn_zoo_tpu.ops.fused_tp import FusedUVUConv
from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasFullConv
import tests.test_pallas  # noqa - not used, keeps import parity
from equivariant_nn_zoo_tpu.data import Batch, Data, GraphBatch
from equivariant_nn_zoo_tpu.data.compute_edge import computeEdgeIndex

feats = "+".join(f"64x{l}{p}" for l in range(4) for p in "eo")
KW = dict(input_features=feats, output_features=feats,
          node_attrs="64x0e", edge_radial="8x0e",
          edge_spherical="1x0e+1x1o+1x2e", invariant_layers=2,
          invariant_neurons=64, avg_num_neighbors=9.0, use_sc=True)
conv = FactorizedConvolution(**KW, fused=True, compute_dtype="bfloat16")
params = conv.init(jax.random.PRNGKey(0))
tpe, fc = conv.tp, conv.fc
full = PallasFullConv(tpe, fc, compute_dtype=jnp.bfloat16, tile=128, window=128)
fused = FusedUVUConv(tpe, compute_dtype=jnp.bfloat16)

# QM9-scale tiled batch: 128 mols
rng = np.random.default_rng(0)
mols = []
for _ in range(128):
    n = int(rng.integers(8, 24))
    d = {"pos": rng.normal(size=(n, 3)) * 1.4,
         "species": rng.choice([1, 6, 7, 8], size=(n, 1))}
    out, attrs = computeEdgeIndex(d, {"pos": ("node", "1x1o"),
                                      "species": ("node", "1x0e")}, r_max=4.0)
    d.update(out)
    mols.append(Data(attrs, **d))
host = Batch.from_data_list(mols)
ne = np.asarray(host.data["_n_edges"]).reshape(-1)
nn = np.asarray(host.data["_n_nodes"]).reshape(-1)
# run-packed slot estimate: greedy pack by 121-node windows
slots, cur_n, cur_e = 0, 0, 0
for a, b in zip(nn, ne):
    if cur_n + a <= 121:
        cur_n += a; cur_e += b
    else:
        slots += int(np.ceil(cur_e / 128) * 128); cur_n, cur_e = a, b
slots += int(np.ceil(cur_e / 128) * 128)
ecap = int(np.ceil(slots * 1.05 / 128) * 128)
ncap = 2560
gb = GraphBatch.from_batch(host, ncap, ecap, 128, edge_tile=128, window=128)
print("ncap", ncap, "ecap", ecap, "dropped", gb.dropped,
      "real edges", int(np.asarray(gb["_edge_mask"]).sum()))
gb = jax.device_put(gb)
N, E = ncap, ecap
x = jnp.asarray(rng.normal(size=(N, tpe.tp.irreps_in1.dim)), jnp.float32)
sh = jnp.asarray(rng.normal(size=(E, 9)), jnp.float32)
er = jnp.asarray(rng.normal(size=(E, 8)) * np.asarray(gb["_edge_mask"]), jnp.float32)
lp, fcp = params["tp"]["linear"], params["fc"]
win = jnp.asarray(gb["_edge_tile_win"]); srcl = jnp.asarray(gb["_edge_src_local"]); dstl = jnp.asarray(gb["_edge_dst_local"])
src = jnp.asarray(gb["edge_index"][0]); dst = jnp.asarray(gb["edge_index"][1])

def loss_full(fcp_, lp_, x_, sh_, er_):
    out = full(fcp_, lp_, x_, er_, sh_, win, srcl, dstl, N, pre_scale=1/3.0)
    return jnp.sum(out * out)
def loss_ref(fcp_, lp_, x_, sh_, er_):
    w = fc.apply(fcp_, er_)
    out = fused(lp_, x_, src, dst, sh_, w, N, pre_scale=1/3.0)
    return jnp.sum(out * out)

for name, fn in [("full-pallas", loss_full), ("xla", loss_ref)]:
    f = jax.jit(jax.value_and_grad(fn, argnums=(0,1,2,3,4)))
    t0=time.time(); o = f(fcp, lp, x, sh, er); jax.block_until_ready(o[0])
    print(name, "compile", round(time.time()-t0,1), "s loss", float(o[0]))
    t0=time.time()
    for _ in range(100):
        o = f(fcp, lp, x, sh, er)
    jax.block_until_ready(o[0])
    dt=(time.time()-t0)/100
    print(f"{name}: {dt*1e3:.3f} ms per fwd+bwd (one layer, E={E})")
a = full(fcp, lp, x, er, sh, win, srcl, dstl, N, pre_scale=1/3.0)
w = fc.apply(fcp, er)
b = fused(lp, x, src, dst, sh, w, N, pre_scale=1/3.0)
print("rel:", float(jnp.abs(a-b).max()/jnp.abs(b).max()))

import glob, gzip, json, collections
f = jax.jit(jax.value_and_grad(loss_full, argnums=(0,1,2,3,4)))
o = f(fcp, lp, x, sh, er); jax.block_until_ready(o[0])
with jax.profiler.trace("/tmp/ftrace"):
    for _ in range(20):
        o = f(fcp, lp, x, sh, er)
    jax.block_until_ready(o[0])
time.sleep(1)
tr = sorted(glob.glob("/tmp/ftrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(tr)).get("traceEvents", [])
by = collections.Counter(); tot=0
for e in ev:
    a = e.get("args", {})
    if e.get("ph") == "X" and "hlo_category" in a:
        d = int(a.get("device_duration_ps","0"))/1e9/20
        by[(e.get("name","")[:36], a.get("source","?").split("/")[-1])] += d; tot += d
print(f"total {tot:.2f} ms")
for k, d in by.most_common(12):
    print(f"{d:8.3f}  {k}")
