"""PallasPairwiseTP (interpret mode) vs TensorProductExpansion.expand.

The pairwise kernel lowers the hamiltonian head's internal-weight uvu
expansions (reference e3_layers/nn/output.py:77-164); forward and every
gradient leg (left, right, TP weights, mix linear) must match the XLA
expansion, which is itself parity-tested against the per-path reference
(test_fused.py / test_nn.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivariant_nn_zoo_tpu.nn.pointwise import TensorProductExpansion
from equivariant_nn_zoo_tpu.ops.irreps import Irreps
from equivariant_nn_zoo_tpu.ops.pallas.pairwise import PallasPairwiseTP


def make(spec_a, spec_b, spec_o, seed=0, M=48, tile=16):
    tpe = TensorProductExpansion(spec_a, spec_b, spec_o, "uvu",
                                 internal_weight=True)
    params = tpe.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.normal(size=(M, Irreps(spec_a).dim)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(M, Irreps(spec_b).dim)), jnp.float32)
    kern = PallasPairwiseTP(tpe, compute_dtype=jnp.float32, tile=tile)
    return tpe, kern, params, a, b


SPECS = [
    # square case (the Pairwise head: features x features -> features)
    ("8x0e+8x0o+8x1e+8x1o+8x2e+8x2o",) * 3,
    # rectangular right multiplicity (v contracted per path)
    ("8x0e+8x1o+8x2e", "4x0e+4x1o+4x1e", "8x0e+8x1o+8x1e+8x2e"),
]


@pytest.mark.parametrize("spec_a,spec_b,spec_o", SPECS)
def test_pairwise_forward_matches_expand(spec_a, spec_b, spec_o):
    tpe, kern, params, a, b = make(spec_a, spec_b, spec_o)
    ref = tpe.expand(params, a, b)
    out = kern(params, a, b)
    assert out.shape == ref.shape
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_pairwise_forward_pads_ragged_batch():
    # M not a multiple of the tile: zero-pad rows must not leak
    tpe, kern, params, a, b = make(*SPECS[0], M=41, tile=16)
    ref = tpe.expand(params, a, b)
    out = kern(params, a, b)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


@pytest.mark.parametrize("spec_a,spec_b,spec_o", SPECS)
def test_pairwise_gradients_match_expand(spec_a, spec_b, spec_o):
    tpe, kern, params, a, b = make(spec_a, spec_b, spec_o, seed=1)

    def loss(o):
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    ga = jax.grad(lambda p, a_, b_: loss(kern(p, a_, b_)),
                  argnums=(0, 1, 2))(params, a, b)
    gb = jax.grad(lambda p, a_, b_: loss(tpe.expand(p, a_, b_)),
                  argnums=(0, 1, 2))(params, a, b)
    for va, vb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        denom = max(float(jnp.abs(vb).max()), 1e-6)
        assert float(jnp.abs(va - vb).max()) / denom < 1e-4


def test_pairwise_under_jit():
    tpe, kern, params, a, b = make(*SPECS[0], seed=2)
    out = jax.jit(lambda p, a_, b_: kern(p, a_, b_))(params, a, b)
    ref = tpe.expand(params, a, b)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_pairwise_head_kernel_matches_xla(monkeypatch):
    """The Pairwise head with the kernel forced on (interpret mode) must
    match the XLA expansion path end-to-end, including the gathered-center
    gradient route."""
    import os

    from equivariant_nn_zoo_tpu.nn.output import Pairwise

    spec = "4x0e+4x1o+4x2e"
    kw = dict(
        node_features=spec,
        edge_radial="4x0e",
        edge_spherical="1x0e+1x1o+1x2e",
        diagonal=spec,
        off_diagonal=spec,
        conv=None,
    )
    head_xla = Pairwise(**kw)
    monkeypatch.setenv("E3_PALLAS_PAIRWISE", "force")
    head_k = Pairwise(**kw)
    assert head_k._pairwise_kernel is not None
    params = head_xla.init(jax.random.PRNGKey(3))
    params_k = head_k.init(jax.random.PRNGKey(3))
    for a_, b_ in zip(jax.tree_util.tree_leaves(params),
                      jax.tree_util.tree_leaves(params_k)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_))

    rng = np.random.default_rng(5)
    N, E = 12, 30
    x = jnp.asarray(rng.normal(size=(N, Irreps(spec).dim)), jnp.float32)
    ei = jnp.asarray(rng.integers(0, N, size=(2, E)), jnp.int32)
    data = {"node_features": x, "edge_index": ei}
    attrs = {"node_features": ("node", spec), "edge_index": ("edge", "1x0e")}

    def run(head, p):
        out, _ = head.apply(p, dict(data), dict(attrs))
        return out["diagonal"], out["off_diagonal"]

    da, oa = run(head_xla, params)
    db, ob = run(head_k, params)
    for a_, b_ in ((da, db), (oa, ob)):
        rel = float(jnp.abs(a_ - b_).max() / jnp.abs(a_).max())
        assert rel < 1e-5, rel

    def loss(head, p):
        d_, o_ = run(head, p)
        return jnp.sum(d_ * d_) + jnp.sum(jnp.cos(o_))

    ga = jax.grad(lambda p: loss(head_xla, p))(params)
    gb = jax.grad(lambda p: loss(head_k, p))(params)
    for va, vb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        denom = max(float(jnp.abs(va).max()), 1e-6)
        assert float(jnp.abs(va - vb).max()) / denom < 1e-4


def test_pairwise_bf16_within_training_tolerance():
    """Production runs the kernel in bfloat16 (f32 matmul accumulation);
    structural casting bugs show up far above honest bf16 rounding."""
    tpe, _, params, a, b = make(*SPECS[0], seed=4)
    kern16 = PallasPairwiseTP(tpe, compute_dtype=jnp.bfloat16, tile=16)
    ref = tpe.expand(params, a, b)
    out = kern16(params, a, b)
    scale = float(jnp.abs(ref).max())
    rel = float(jnp.abs(out - ref).max()) / scale
    assert rel < 3e-2, rel

    def loss(o):
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    ga = jax.grad(lambda a_: loss(kern16(params, a_, b)))(a)
    gb = jax.grad(lambda a_: loss(tpe.expand(params, a_, b)))(a)
    rel = float(jnp.abs(ga - gb).max()) / max(float(jnp.abs(gb).max()), 1e-6)
    assert rel < 5e-2, rel
