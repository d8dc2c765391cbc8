"""Minimal real-TPU repro for the PallasPairwiseTP failure: forward only,
one tile, full traceback.  Usage: python _pwmin.py [M] [what]
  what: fwd | bwd | both (default fwd)
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import sys
import time
import traceback

import numpy as np


def main(M=128, what="fwd"):
    import jax
    import jax.numpy as jnp

    from equivariant_nn_zoo_tpu.nn.pointwise import TensorProductExpansion
    from equivariant_nn_zoo_tpu.ops import Irreps
    from equivariant_nn_zoo_tpu.ops.pallas.pairwise import PallasPairwiseTP

    spec = "+".join(f"64x{l}e+64x{l}o" for l in range(5))
    tpe = TensorProductExpansion(spec, spec, spec, "uvu",
                                 internal_weight=True)
    params = tpe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    dim = Irreps(spec).dim
    a = jnp.asarray(rng.normal(size=(M, dim)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(M, dim)), jnp.bfloat16)

    kern = PallasPairwiseTP(tpe, compute_dtype=jnp.bfloat16)
    print("kernel built; compiling fwd...", flush=True)
    t0 = time.time()
    try:
        if what in ("fwd", "both"):
            f = jax.jit(lambda p, x, y: kern(p, x, y))
            lo = f.lower(params, a, b)
            print(f"lowered in {time.time()-t0:.1f}s", flush=True)
            t1 = time.time()
            co = lo.compile()
            print(f"compiled fwd in {time.time()-t1:.1f}s", flush=True)
            out = co(params, a, b)
            out.block_until_ready()
            print("fwd OK", float(jnp.abs(out.astype(jnp.float32)).mean()),
                  flush=True)
        if what in ("bwd", "both"):
            g = jax.jit(jax.grad(
                lambda p, x, y: kern(p, x, y).astype(jnp.float32).sum(),
                argnums=(0, 1, 2)))
            t1 = time.time()
            lo = g.lower(params, a, b)
            print(f"bwd lowered in {time.time()-t1:.1f}s", flush=True)
            t1 = time.time()
            co = lo.compile()
            print(f"compiled bwd in {time.time()-t1:.1f}s", flush=True)
            go = co(params, a, b)
            jax.block_until_ready(go)
            print("bwd OK", flush=True)
    except Exception:
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    what = sys.argv[2] if len(sys.argv) > 2 else "fwd"
    main(M, what)
