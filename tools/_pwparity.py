#!/usr/bin/env python
"""On-device parity: PallasPairwiseTP vs the XLA _expand_fused lowering.

Runs on whatever backend jax selects (the real TPU under axon) — the
hardware-evidence counterpart of tests/test_pairwise_kernel.py, whose 8
cases run in interpret mode on CPU.  Checks forward and all three
gradients at the hamiltonian head's shapes (l_max=4, n_dim=64, uvu,
internal weights), in the head's compute dtype (bfloat16) against an
f32 XLA reference.

Usage: python _pwparity.py [M]   (default 768 = batch-128 H2O off-diag)
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs

import sys

import numpy as np


def main(M=768):
    import jax
    import jax.numpy as jnp

    from equivariant_nn_zoo_tpu.nn.pointwise import TensorProductExpansion
    from equivariant_nn_zoo_tpu.ops import Irreps
    from equivariant_nn_zoo_tpu.ops.pallas.pairwise import PallasPairwiseTP

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    spec = "+".join(f"64x{l}e+64x{l}o" for l in range(5))
    tpe = TensorProductExpansion(spec, spec, spec, "uvu",
                                 internal_weight=True)
    params = tpe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    dim = Irreps(spec).dim
    a = jnp.asarray(rng.normal(size=(M, dim)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(M, dim)), jnp.bfloat16)

    kern = PallasPairwiseTP(tpe, compute_dtype=jnp.bfloat16)
    p32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)

    out_k = jax.jit(kern)(params, a, b)
    out_x = jax.jit(tpe.expand)(p32, a32, b32)
    scale = float(jnp.max(jnp.abs(out_x))) or 1.0
    err = float(jnp.max(jnp.abs(out_k.astype(jnp.float32) - out_x))) / scale
    print(f"fwd   rel-linf: {err:.3e}  (scale {scale:.2f})")
    assert err < 3e-2, "forward parity failed on device"

    # cotangent-weighted scalar so every output position feeds the grads
    ct = jnp.asarray(rng.normal(size=out_x.shape), jnp.float32)

    def s_k(p, a_, b_):
        return jnp.sum(kern(p, a_, b_).astype(jnp.float32) * ct)

    def s_x(p, a_, b_):
        return jnp.sum(tpe.expand(p, a_, b_) * ct)

    gk = jax.jit(jax.grad(s_k, argnums=(0, 1, 2)))(params, a, b)
    gx = jax.jit(jax.grad(s_x, argnums=(0, 1, 2)))(p32, a32, b32)
    names = ("params", "left", "right")
    for n, k_, x_ in zip(names, gk, gx):
        kf, _ = jax.tree.flatten(jax.tree.map(
            lambda t: t.astype(jnp.float32).ravel(), k_))
        xf, _ = jax.tree.flatten(jax.tree.map(
            lambda t: t.astype(jnp.float32).ravel(), x_))
        kv, xv = jnp.concatenate(kf), jnp.concatenate(xf)
        scale = float(jnp.max(jnp.abs(xv))) or 1.0
        err = float(jnp.max(jnp.abs(kv - xv))) / scale
        print(f"grad-{n:6s} rel-linf: {err:.3e}  (scale {scale:.2f})")
        assert err < 3e-2, f"grad-{n} parity failed on device"
    print("PARITY OK on", jax.default_backend())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 768)
