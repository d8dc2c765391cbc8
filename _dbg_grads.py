import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax, jax.numpy as jnp
import tests.test_pallas as tp
conv, params, full, fused, fc, gb, x, sh, er, N = tp.setup_full(seed=3)
lp, fcp = params["tp"]["linear"], params["fc"]
win = jnp.asarray(gb["_edge_tile_win"]); srcl = jnp.asarray(gb["_edge_src_local"]); dstl = jnp.asarray(gb["_edge_dst_local"])
def loss_full(fcp_, lp_, x_, sh_, er_):
    out = full(fcp_, lp_, x_, er_, sh_, win, srcl, dstl, N, pre_scale=0.5)
    return jnp.sum(out * jnp.sin(0.1*jnp.arange(out.size)).reshape(out.shape))
def loss_ref(fcp_, lp_, x_, sh_, er_):
    out = tp._ref_out(fused, fc, fcp_, lp_, x_, sh_, er_, gb, N)
    return jnp.sum(out * jnp.sin(0.1*jnp.arange(out.size)).reshape(out.shape))
ga = jax.grad(loss_full, argnums=(0,1,2,3,4))(fcp, lp, x, sh, er)
gr = jax.grad(loss_ref, argnums=(0,1,2,3,4))(fcp, lp, x, sh, er)
names = ["fcp", "lp", "x", "sh", "er"]
for nm, a, b in zip(names, ga, gr):
    la = jax.tree_util.tree_leaves_with_path(a) if isinstance(a, dict) else [((nm,), a)]
    lb = jax.tree_util.tree_leaves(b) if isinstance(b, dict) else [b]
    for (pth, av), bv in zip(la, lb):
        d = float(jnp.abs(av-bv).max()); m = max(float(jnp.abs(bv).max()),1e-9)
        flag = "  <-- BAD" if d/m > 2e-4 else ""
        print(f"{nm} {pth}: rel {d/m:.2e}{flag}")
