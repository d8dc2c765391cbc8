#!/usr/bin/env python
"""Pairwise-TP kernel microbenchmark at the hamiltonian head's shapes.

Usage: python _pwbench.py [M] [mode]
  M     elements (edges), default 768 (batch-128 H2O off-diagonal)
  mode  kernel | xla | both (default both)

Measures forward and forward+backward of one internal-weight uvu expansion
(node_features x node_features -> node_features at l_max=4, n_dim=64) —
PallasPairwiseTP vs the XLA _expand_fused lowering.  Many iterations so the
dispatch queue applies backpressure (tunnel timing rule, CLAUDE.md).
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import sys
import time


def bench(fn, args, n=100):
    import jax

    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def main(M=768, mode="both"):
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    runs = {}
    if mode in ("kernel", "both"):
        kern = PallasPairwiseTP(tpe, compute_dtype=jnp.bfloat16)
        runs["kernel"] = lambda p, a_, b_: kern(p, a_, b_)
    if mode in ("xla", "both"):
        runs["xla"] = lambda p, a_, b_: tpe.expand(p, a_, b_)

    for name, f in runs.items():
        fwd = jax.jit(lambda p, a_, b_: jnp.sum(f(p, a_, b_)))
        t = bench(fwd, (params, a, b))
        print(f"{name} fwd:      {t * 1e3:8.3f} ms  ({M / t:,.0f} elem/s)")
        fb = jax.jit(jax.grad(lambda p, a_, b_: jnp.sum(
            jnp.cos(f(p, a_, b_))), argnums=(0, 1, 2)))
        t = bench(fb, (params, a, b))
        print(f"{name} fwd+bwd:  {t * 1e3:8.3f} ms  ({M / t:,.0f} elem/s)")


if __name__ == "__main__":
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    main(M, mode)
