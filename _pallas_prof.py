import time, gzip, json, glob, collections, numpy as np, jax, jax.numpy as jnp
from equivariant_nn_zoo_tpu.nn.message_passing import FactorizedConvolution
from equivariant_nn_zoo_tpu.ops.fused_tp import FusedUVUConv
from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasUVUConv

feats = "+".join(f"64x{l}{p}" for l in range(4) for p in "eo")
KW = dict(input_features=feats, output_features=feats,
          node_attrs="64x0e", edge_radial="8x0e",
          edge_spherical="1x0e+1x1o+1x2e", invariant_layers=2,
          invariant_neurons=64, avg_num_neighbors=9.0, use_sc=True)
conv = FactorizedConvolution(**KW, fused=True, compute_dtype="bfloat16")
params = conv.init(jax.random.PRNGKey(0))
tpe = conv.tp
pallas = PallasUVUConv(tpe, compute_dtype=jnp.bfloat16, tile=128)
N, E = 2560, 4480
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, tpe.tp.irreps_in1.dim)), jnp.float32)
sh = jnp.asarray(rng.normal(size=(E, 9)), jnp.float32)
w = jnp.asarray(rng.normal(size=(E, pallas.weight_numel)) * 0.3, jnp.float32)
src = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
dst = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
lp = params["tp"]["linear"]

def loss(lp_, x_, sh_, w_):
    out = pallas(lp_, x_, src, dst, sh_, w_, N, pre_scale=1/3.0)
    return jnp.sum(out * out)
f = jax.jit(jax.value_and_grad(loss, argnums=(0,1,2,3)))
o = f(lp, x, sh, w); jax.block_until_ready(o[0])
with jax.profiler.trace("/tmp/ptrace"):
    for _ in range(20):
        o = f(lp, x, sh, w)
    jax.block_until_ready(o[0])
time.sleep(1)
tr = sorted(glob.glob("/tmp/ptrace/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(tr)).get("traceEvents", [])
by = collections.Counter()
tot = 0.0
for e in ev:
    a = e.get("args", {})
    if e.get("ph") == "X" and "hlo_category" in a:
        d = int(a.get("device_duration_ps", "0"))/1e9/20
        nm = e.get("name","?")[:60]
        by[(a["hlo_category"], nm)] += d
        tot += d
print(f"total device {tot:.3f} ms/iter")
for (c, nm), d in by.most_common(18):
    print(f"{d:8.3f}  {c:22s} {nm}")
