"""Fused MXU conv path vs the reference per-path einsum implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivariant_nn_zoo_tpu.nn.message_passing import FactorizedConvolution


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


def make_data(conv, N=32, E=128, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_features": jnp.asarray(
            rng.normal(size=(N, conv.tp.tp.irreps_in1.dim)), jnp.float32
        ),
        "node_attrs": jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
        "edge_radial": jnp.asarray(rng.normal(size=(E, 8)), jnp.float32),
        "edge_spherical": jnp.asarray(rng.normal(size=(E, 9)), jnp.float32),
        "edge_index": jnp.asarray(rng.integers(0, N, size=(2, E)), jnp.int32),
        "_edge_mask": jnp.asarray(
            (rng.random((E, 1)) < 0.8).astype(np.float32)
        ),
    }


def test_fused_matches_unfused():
    conv_f = FactorizedConvolution(**KW, fused=True, compute_dtype="float32")
    conv_u = FactorizedConvolution(**KW, fused=False)
    params = conv_f.init(jax.random.PRNGKey(0))
    data = make_data(conv_f)
    attrs = {"input_features": ("node", KW["input_features"])}
    o1, _ = conv_f.apply(params, data, attrs)
    o2, _ = conv_u.apply(params, data, attrs)
    a, b = o1["output_features"], o2["output_features"]
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel


def test_fused_bf16_close():
    conv_f = FactorizedConvolution(**KW, fused=True, compute_dtype="bfloat16")
    conv_u = FactorizedConvolution(**KW, fused=False)
    params = conv_f.init(jax.random.PRNGKey(0))
    data = make_data(conv_f)
    attrs = {"input_features": ("node", KW["input_features"])}
    o1, _ = conv_f.apply(params, data, attrs)
    o2, _ = conv_u.apply(params, data, attrs)
    a, b = o1["output_features"], o2["output_features"]
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 0.05, rel


def test_fused_gradients_match():
    conv_f = FactorizedConvolution(**KW, fused=True, compute_dtype="float32")
    conv_u = FactorizedConvolution(**KW, fused=False)
    params = conv_f.init(jax.random.PRNGKey(0))
    data = make_data(conv_f)
    attrs = {"input_features": ("node", KW["input_features"])}

    def loss(conv, p):
        out, _ = conv.apply(p, data, attrs)
        return jnp.sum(out["output_features"] ** 2)

    g1 = jax.grad(lambda p: loss(conv_f, p))(params)
    g2 = jax.grad(lambda p: loss(conv_u, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        denom = max(float(jnp.abs(b).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) / denom < 1e-4


def test_fused_reduce_false_matches_unfused():
    """The Pairwise head's per-edge conv (reduce=False) now rides the fused
    MXU path; it must match the per-path einsum path on the edge output."""
    kw = dict(KW, use_sc=False, node_attrs=None, avg_num_neighbors=1,
              reduce=False)
    conv_f = FactorizedConvolution(**kw, fused=True, compute_dtype="float32")
    conv_u = FactorizedConvolution(**kw, fused=False)
    assert conv_f.fused_conv is not None
    params = conv_f.init(jax.random.PRNGKey(0))
    data = make_data(conv_f)
    data.pop("node_attrs")
    attrs = {"input_features": ("node", kw["input_features"])}
    out_f, af = conv_f.apply(params, dict(data), dict(attrs))
    out_u, au = conv_u.apply(params, dict(data), dict(attrs))
    assert out_f["output_features"].shape[0] == data["edge_radial"].shape[0]
    assert af == au
    np.testing.assert_allclose(
        np.asarray(out_f["output_features"]),
        np.asarray(out_u["output_features"]),
        rtol=2e-4, atol=2e-4,
    )
