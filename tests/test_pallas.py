"""Pallas fused-conv kernel vs the XLA fused path (interpret mode on CPU).

Forward and gradients (wrt node features, sh, radial weights, mix params)
must match FusedUVUConv, which itself is parity-tested against the unfused
per-path reference implementation (test_fused.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivariant_nn_zoo_tpu.nn.message_passing import FactorizedConvolution
from equivariant_nn_zoo_tpu.ops.fused_tp import FusedUVUConv
from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasUVUConv

KW = dict(
    input_features="8x0e+8x0o+8x1e+8x1o+8x2e+8x2o",
    output_features="8x0e+8x0o+8x1e+8x1o+8x2e+8x2o",
    node_attrs="4x0e",
    edge_radial="8x0e",
    edge_spherical="1x0e+1x1o+1x2e",
    invariant_layers=2,
    invariant_neurons=8,
    avg_num_neighbors=5.0,
    use_sc=True,
)


def setup(seed=0, N=32, E=128):
    conv = FactorizedConvolution(**KW, fused=True, compute_dtype="float32")
    params = conv.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    tpe = conv.tp
    fused = FusedUVUConv(tpe, compute_dtype=jnp.float32)
    pallas = PallasUVUConv(tpe, compute_dtype=jnp.float32, tile=32)
    x = jnp.asarray(rng.normal(size=(N, tpe.tp.irreps_in1.dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, 9)), jnp.float32)
    weight = jnp.asarray(
        rng.normal(size=(E, fused.weight_numel)) * 0.3, jnp.float32
    )
    edge_src = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    edge_dst = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    lp = params["tp"]["linear"]
    return fused, pallas, lp, x, edge_src, edge_dst, sh, weight, N


def test_pallas_forward_matches_fused():
    fused, pallas, lp, x, src, dst, sh, w, N = setup()
    a = pallas(lp, x, src, dst, sh, w, N, pre_scale=0.3)
    b = fused(lp, x, src, dst, sh, w, N, pre_scale=0.3)
    assert a.shape == b.shape
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel


def test_pallas_gradients_match_fused():
    fused, pallas, lp, x, src, dst, sh, w, N = setup(seed=1)

    def loss(conv, lp_, x_, sh_, w_):
        out = conv(lp_, x_, src, dst, sh_, w_, N)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    ga = jax.grad(lambda *a: loss(pallas, *a), argnums=(0, 1, 2, 3))(
        lp, x, sh, w
    )
    gb = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2, 3))(
        lp, x, sh, w
    )
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        denom = max(float(jnp.abs(b).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) / denom < 1e-4


def test_pallas_under_jit():
    fused, pallas, lp, x, src, dst, sh, w, N = setup(seed=2)
    f = jax.jit(lambda lp_, x_: pallas(lp_, x_, src, dst, sh, w, N))
    a = f(lp, x)
    b = fused(lp, x, src, dst, sh, w, N)
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel
