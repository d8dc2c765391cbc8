"""Kernel-layout (kl) inter-layer handoff parity (E3_KLAYOUT=1).

Each MessagePassing layer can emit its gated output BOTH as formatted
irreps columns and as the next conv's node-table layout
(fused_conv._prep_x_nodes); the next layer consumes the table, deleting
the per-layer (m, d) transpose round trip — format -> gate -> prep —
from the step (and its adjoint from the backward).  Under jit the
unconsumed branch is dead code.

These tests run the whole model on CPU with E3_PALLAS=force (interpret
kernels) and assert the kl path is numerically identical to the
formatted path — outputs and parameter gradients — and that it actually
engages (Linear.apply_kl is hit once per non-first layer).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _make_batch(seed=0, n_mol=6):
    from equivariant_nn_zoo_tpu.data import Batch, Data, GraphBatch
    from equivariant_nn_zoo_tpu.data.compute_edge import computeEdgeIndex

    rng = np.random.default_rng(seed)
    mols = []
    for _ in range(n_mol):
        n = int(rng.integers(5, 12))
        d = {"pos": rng.normal(size=(n, 3)) * 1.2,
             "species": rng.choice([1, 6, 7, 8], size=(n, 1))}
        d["atom_types"] = d["species"]
        out, attrs = computeEdgeIndex(
            d, {"pos": ("node", "1x1o"), "species": ("node", "1x0e"),
                "atom_types": ("node", "1x0e")},
            r_max=3.0,
        )
        d.update(out)
        mols.append(Data(attrs, **d))
    host = Batch.from_data_list(mols)
    gb = GraphBatch.from_batch(host, 256, 1024, n_mol,
                               edge_tile=128, window=128)
    assert gb.dropped == 0
    return gb


def _build_model(num_layers=3, n_dim=8, l_max=2):
    from equivariant_nn_zoo_tpu.models.layer_configs import (
        addEnergyOutput, featureModel,
    )
    from equivariant_nn_zoo_tpu.utils import build

    mc = featureModel(
        n_dim=n_dim, l_max=l_max, node_attrs="4x0e", edge_radial="4x0e",
        num_types=10, num_layers=num_layers, r_max=3.0,
    )
    mc = addEnergyOutput(mc, shifts=None, output_key="total_energy")
    return build(mc)


def test_klayout_parity(monkeypatch):
    import jax
    import jax.numpy as jnp

    import equivariant_nn_zoo_tpu.ops.tensor_product as tp_mod

    monkeypatch.setenv("E3_PALLAS", "force")
    num_layers = 3
    model = _build_model(num_layers=num_layers)
    params = model.init(jax.random.PRNGKey(0))
    gb = _make_batch()

    kl_calls = []
    orig_apply_kl = tp_mod.Linear.apply_kl

    def counting_apply_kl(self, *a, **k):
        kl_calls.append(1)
        return orig_apply_kl(self, *a, **k)

    monkeypatch.setattr(tp_mod.Linear, "apply_kl", counting_apply_kl)

    def loss(p):
        out = model.apply(p, gb)
        e = out["total_energy"] * out["_graph_mask"]
        return jnp.sum(e ** 2), out

    monkeypatch.setenv("E3_KLAYOUT", "0")
    (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(params)
    assert not kl_calls
    assert "node_features__kl" not in out0.data

    monkeypatch.setenv("E3_KLAYOUT", "1")
    (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(params)
    # layer 0 has no incoming table; layers 1..n-1 consume one each
    assert len(kl_calls) == num_layers - 1
    assert "node_features__kl" in out1.data

    e0 = np.asarray(out0["total_energy"])
    e1 = np.asarray(out1["total_energy"])
    scale = np.abs(e0).max() + 1e-30
    assert np.abs(e1 - e0).max() / scale < 1e-5, (e0, e1)

    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    gscale = max(float(jnp.abs(a).max()) for a in leaves0) + 1e-30
    rel = max(
        float(jnp.abs(a - b).max()) for a, b in zip(leaves0, leaves1)
    ) / gscale
    assert rel < 1e-5, rel


def test_klayout_grad2_parity(monkeypatch):
    """Force path (grad_order=2) klayout: kl on/off must agree in energy,
    forces AND parameter double-grads.  Every kl leg there is pure XLA
    (Linear.apply_kl, FusedScalarFCTP.apply_blocks, apply_grad2's table
    consumption), so the handoff is differentiable to any order; this
    asserts it both engages and stays exact."""
    import jax
    import jax.numpy as jnp

    import equivariant_nn_zoo_tpu.ops.fused_tp as ft_mod
    import equivariant_nn_zoo_tpu.ops.tensor_product as tp_mod
    from equivariant_nn_zoo_tpu.models.layer_configs import (
        addEnergyOutput, addForceOutput, featureModel,
    )
    from equivariant_nn_zoo_tpu.utils import build

    monkeypatch.setenv("E3_PALLAS", "force")
    num_layers = 3
    mc = featureModel(
        n_dim=8, l_max=2, node_attrs="4x0e", edge_radial="4x0e",
        num_types=10, num_layers=num_layers, r_max=3.0,
    )
    mc = addEnergyOutput(mc, shifts=None, output_key="energy")
    mc = addForceOutput(mc)                   # grad_order=2 conv path
    model = build(mc)
    params = model.init(jax.random.PRNGKey(0))
    gb = _make_batch()

    kl_calls, sc_calls = [], []
    orig_kl = tp_mod.Linear.apply_kl
    orig_blk = ft_mod.FusedScalarFCTP.apply_blocks

    def counting_kl(self, *a, **k):
        kl_calls.append(1)
        return orig_kl(self, *a, **k)

    def counting_blocks(self, *a, **k):
        sc_calls.append(1)
        return orig_blk(self, *a, **k)

    monkeypatch.setattr(tp_mod.Linear, "apply_kl", counting_kl)
    monkeypatch.setattr(
        ft_mod.FusedScalarFCTP, "apply_blocks", counting_blocks
    )

    def loss(p):
        out = model.apply(p, gb)
        e = out["energy"] * out["_graph_mask"]
        f = out["forces"] * out["_node_mask"]
        return jnp.sum(e ** 2) + jnp.sum(f ** 2), out

    monkeypatch.setenv("E3_KLAYOUT", "0")
    (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(params)
    assert not kl_calls and not sc_calls

    monkeypatch.setenv("E3_KLAYOUT", "1")
    (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(params)
    # layer 0 has no incoming table; layers 1..n-1 consume one each.
    # the sc folds as blocks on EVERY trunk layer (table or formatted in)
    assert len(kl_calls) == num_layers - 1
    assert len(sc_calls) == num_layers

    for key in ("energy", "forces"):
        a = np.asarray(out0[key])
        b = np.asarray(out1[key])
        scale = np.abs(a).max() + 1e-30
        assert np.abs(b - a).max() / scale < 1e-5, key

    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    gscale = max(float(jnp.abs(a).max()) for a in leaves0) + 1e-30
    rel = max(
        float(jnp.abs(a - b).max()) for a, b in zip(leaves0, leaves1)
    ) / gscale
    assert rel < 1e-5, rel


def test_klayout_table_matches_prep(monkeypatch):
    """The emitted kl table must BE the next layer's _prep_x_nodes of the
    formatted features — the invariant the whole handoff rests on."""
    import jax

    monkeypatch.setenv("E3_PALLAS", "force")
    monkeypatch.setenv("E3_KLAYOUT", "1")
    model = _build_model(num_layers=2)
    params = model.init(jax.random.PRNGKey(1))
    gb = _make_batch(seed=1)
    out = model.apply(params, gb)

    monkeypatch.setenv("E3_KLAYOUT", "0")
    out_ref = model.apply(params, gb)
    monkeypatch.setenv("E3_KLAYOUT", "1")
    # compare the table emitted by the LAST layer against the node-table
    # layout of its own formatted features (per-irrep (mul, d) -> (d, mul))
    from equivariant_nn_zoo_tpu.ops.irreps import Irreps

    layers = dict(model.layers)
    ir = Irreps(layers["layer1"].irreps_out["output_features"])
    x_fmt = np.asarray(out["node_features"], np.float32)
    N = x_fmt.shape[0]
    blocks, ofs = [], 0
    for mi in ir:
        d = mi.ir.dim
        b = x_fmt[:, ofs: ofs + mi.mul * d].reshape(N, mi.mul, d)
        blocks.append(np.transpose(b, (0, 2, 1)))
        ofs += mi.mul * d
    prep = np.concatenate(blocks, axis=1).reshape(N, -1)
    got = np.asarray(out["node_features__kl"], np.float32)
    np.testing.assert_allclose(got, prep, rtol=1e-5, atol=1e-6)
    # and the two runs agree end-to-end
    np.testing.assert_allclose(
        np.asarray(out["total_energy"]),
        np.asarray(out_ref["total_energy"]), rtol=1e-5, atol=1e-6,
    )
