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


# ---------------------------------------------------------------- tiled mode


def make_tiled(seed=0, n_mol=6, T=32, W=32):
    from equivariant_nn_zoo_tpu.data import Batch, Data, GraphBatch
    from equivariant_nn_zoo_tpu.data.compute_edge import computeEdgeIndex

    rng = np.random.default_rng(seed)
    mols = []
    for _ in range(n_mol):
        n = int(rng.integers(5, 12))
        d = {"pos": rng.normal(size=(n, 3)) * 1.2,
             "species": rng.choice([1, 6, 7, 8], size=(n, 1))}
        out, attrs = computeEdgeIndex(
            d, {"pos": ("node", "1x1o"), "species": ("node", "1x0e")},
            r_max=3.0,
        )
        d.update(out)
        mols.append(Data(attrs, **d))
    host = Batch.from_data_list(mols)
    gb = GraphBatch.from_batch(host, 128, 512, n_mol, edge_tile=T, window=W)
    assert gb.dropped == 0
    return gb


def test_tiled_graphbatch_invariants():
    T, W = 32, 32
    gb = make_tiled(T=T, W=W)
    E = gb.edge_capacity
    win = np.asarray(gb["_edge_tile_win"])
    srcl = np.asarray(gb["_edge_src_local"])
    dstl = np.asarray(gb["_edge_dst_local"])
    ei = np.asarray(gb["edge_index"])
    mask = np.asarray(gb["_edge_mask"])[:, 0]
    seg = np.asarray(gb["_edge_segment"])
    for k in range(E // T):
        sl = slice(k * T, (k + 1) * T)
        real = mask[sl] > 0
        if real.any():
            # locals consistent with globals and inside the window
            np.testing.assert_array_equal(
                srcl[sl][real] + win[k], ei[0, sl][real]
            )
            np.testing.assert_array_equal(
                dstl[sl][real] + win[k], ei[1, sl][real]
            )
            assert srcl[sl].max() < W and dstl[sl].max() < W
    # roundtrip drops padding correctly
    back = gb.to_batch()
    assert back.data["edge_index"].shape[1] == int(mask.sum())


def setup_full(seed=0, T=32, W=32):
    conv = FactorizedConvolution(**KW, fused=True, compute_dtype="float32")
    params = conv.init(jax.random.PRNGKey(seed))
    tpe, fc = conv.tp, conv.fc
    from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasFullConv

    full = PallasFullConv(tpe, fc, compute_dtype=jnp.float32, tile=T,
                          window=W, compute_dsh=True)
    fused = FusedUVUConv(tpe, compute_dtype=jnp.float32)
    gb = make_tiled(seed=seed, T=T, W=W)
    rng = np.random.default_rng(seed + 1)
    N, E = gb.node_capacity, gb.edge_capacity
    x = jnp.asarray(rng.normal(size=(N, tpe.tp.irreps_in1.dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(E, 9)), jnp.float32)
    er = jnp.asarray(
        rng.normal(size=(E, 8)) * np.asarray(gb["_edge_mask"]), jnp.float32
    )
    return conv, params, full, fused, fc, gb, x, sh, er, N


def _ref_out(fused, fc, fcp, lp, x, sh, er, gb, N):
    w = fc.apply(fcp, er, compute_dtype="float32")
    src = jnp.asarray(gb["edge_index"][0])
    dst = jnp.asarray(gb["edge_index"][1])
    return fused(lp, x, src, dst, sh, w, N, pre_scale=0.5)


def test_full_conv_forward_matches():
    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full()
    lp, fcp = params["tp"]["linear"], params["fc"]
    a = full(fcp, lp, x, er, sh, jnp.asarray(gb["_edge_tile_win"]),
             jnp.asarray(gb["_edge_tile_first"]),
             jnp.asarray(gb["_edge_tile_last"]),
             jnp.asarray(gb["_edge_src_local"]),
             jnp.asarray(gb["_edge_dst_local"]), N, pre_scale=0.5)
    b = _ref_out(fused, fc, fcp, lp, x, sh, er, gb, N)
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel


def test_full_conv_grads_match(monkeypatch):
    # pin the remat backward (SAVEMID defaults on; the streamed-mid path
    # has its own parity test below) so both backward variants stay covered
    monkeypatch.setenv("E3_PALLAS_SAVEMID", "0")
    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full(seed=3)
    lp, fcp = params["tp"]["linear"], params["fc"]
    win = jnp.asarray(gb["_edge_tile_win"])
    tfirst = jnp.asarray(gb["_edge_tile_first"])
    tlast = jnp.asarray(gb["_edge_tile_last"])
    srcl = jnp.asarray(gb["_edge_src_local"])
    dstl = jnp.asarray(gb["_edge_dst_local"])

    def loss_full(fcp_, lp_, x_, sh_, er_):
        out = full(fcp_, lp_, x_, er_, sh_, win, tfirst, tlast, srcl, dstl,
                   N, pre_scale=0.5)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    def loss_ref(fcp_, lp_, x_, sh_, er_):
        out = _ref_out(fused, fc, fcp_, lp_, x_, sh_, er_, gb, N)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    ga = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    gb_ = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb_)):
        denom = max(float(jnp.abs(b).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) / denom < 2e-4


@pytest.mark.parametrize("feats_str", [
    "8x0e+8x1o+8x2e",        # all distinct d: every slot runs solo
    "8x0e+8x0o+8x1e+8x1o",   # standard e/o layout: every slot paired
    "8x0e+8x0o+8x1e",        # 0e/0o pair + 1e solo (odd leftover)
])
def test_species_sc_matches_fused(feats_str):
    """SpeciesScalarFCTP == FusedScalarFCTP when attrs are species-pure,
    including gradients at the embedding-table level — across the slot
    pairing plans (solo, block-diagonal paired, and mixed)."""
    from equivariant_nn_zoo_tpu.ops.fused_tp import FusedScalarFCTP
    from equivariant_nn_zoo_tpu.ops.pallas.sc import SpeciesScalarFCTP
    from equivariant_nn_zoo_tpu.ops.irreps import Irreps
    from equivariant_nn_zoo_tpu.ops.tensor_product import fully_connected_tp

    rng = np.random.default_rng(0)
    N, types, m2 = 64, 5, 16
    feats = Irreps(feats_str)
    sc = fully_connected_tp(feats, Irreps(f"{m2}x0e"), feats)
    n_w = sum(int(np.prod(sc._weight_shape(i))) for i in sc.instructions)
    params = {"weight": jnp.asarray(rng.normal(size=(n_w,)), jnp.float32)}
    table = jnp.asarray(rng.normal(size=(types, m2)), jnp.float32)
    spec = jnp.asarray(rng.integers(0, types, size=(N, 1)), jnp.int32)
    x = jnp.asarray(rng.normal(size=(N, feats.dim)), jnp.float32)

    fast = FusedScalarFCTP(sc, compute_dtype=jnp.float32)
    spk = SpeciesScalarFCTP(sc, types, compute_dtype=jnp.float32, tile=32)

    def out_fast(w, x_, tb):
        attrs = tb[spec[:, 0]]
        return fast.apply({"weight": w}, x_, attrs)

    def out_spk(w, x_, tb):
        attrs = tb[spec[:, 0]]
        return spk.apply({"weight": w}, x_, attrs, spec)

    a = out_spk(params["weight"], x, table)
    b = out_fast(params["weight"], x, table)
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel

    def loss(fn, w, x_, tb):
        o = fn(w, x_, tb)
        return jnp.sum(o * jnp.cos(0.05 * jnp.arange(o.size)).reshape(o.shape))

    ga = jax.grad(lambda *args: loss(out_spk, *args), argnums=(0, 1, 2))(
        params["weight"], x, table
    )
    gb = jax.grad(lambda *args: loss(out_fast, *args), argnums=(0, 1, 2))(
        params["weight"], x, table
    )
    for u, v in zip(ga, gb):
        denom = max(float(jnp.abs(v).max()), 1e-6)
        assert float(jnp.abs(u - v).max()) / denom < 1e-4


def test_full_conv_tile_batched_matches(monkeypatch):
    """E3_PALLAS_TILEBATCH=2 — two edge tiles per kernel grid step (MXU/VPU
    interleaving across sub-tiles) — must match the XLA fused reference
    exactly like the per-tile grid does, values and grads.  E=512, T=32 so
    the batched grid (B*T=64) divides evenly and B=2 is actually taken."""
    monkeypatch.setenv("E3_PALLAS_TILEBATCH", "2")
    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full(seed=7)
    assert gb.edge_capacity % 64 == 0
    lp, fcp = params["tp"]["linear"], params["fc"]
    win = jnp.asarray(gb["_edge_tile_win"])
    tfirst = jnp.asarray(gb["_edge_tile_first"])
    tlast = jnp.asarray(gb["_edge_tile_last"])
    srcl = jnp.asarray(gb["_edge_src_local"])
    dstl = jnp.asarray(gb["_edge_dst_local"])

    a = full(fcp, lp, x, er, sh, win, tfirst, tlast, srcl, dstl, N,
             pre_scale=0.5)
    b = _ref_out(fused, fc, fcp, lp, x, sh, er, gb, N)
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel

    def loss_full(fcp_, lp_, x_, sh_, er_):
        out = full(fcp_, lp_, x_, er_, sh_, win, tfirst, tlast, srcl, dstl,
                   N, pre_scale=0.5)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    def loss_ref(fcp_, lp_, x_, sh_, er_):
        out = _ref_out(fused, fc, fcp_, lp_, x_, sh_, er_, gb, N)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    ga = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    gb_ = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    for a_, b_ in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb_)):
        denom = max(float(jnp.abs(b_).max()), 1e-6)
        assert float(jnp.abs(a_ - b_).max()) / denom < 2e-4


@pytest.mark.parametrize("savemid_ext", ["0", "1"])
def test_second_order_conv_double_grad_matches(monkeypatch, savemid_ext):
    """grad_order=2 routing (force training): the nested custom_vjp wrapper
    must give the same DOUBLE gradients as the pure-XLA fused path — the
    inner grad (forces, wrt sh/er standing in for positions) runs the
    Pallas backward kernel, the outer training grad differentiates it via
    the XLA implementation (FactorizedConvolution._second_order_conv).

    savemid_ext=1: the first-order backward streams its per-tile
    mid2/dw2d and the fused grad2 kernel loads them instead of
    recomputing (E3_PALLAS_SAVEMID_EXT) — must be bit-compatible math."""
    monkeypatch.setenv("E3_PALLAS_SAVEMID_EXT", savemid_ext)
    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full(seed=5)
    conv.grad_order = 2
    conv.full_conv = full        # interpret-mode kernels (compute_dsh=True)
    conv.fused_conv = fused
    lp, fcp = params["tp"]["linear"], params["fc"]
    tile_args = (
        jnp.asarray(gb["_edge_tile_win"]),
        jnp.asarray(gb["_edge_tile_first"]),
        jnp.asarray(gb["_edge_tile_last"]),
        jnp.asarray(gb["_edge_src_local"]),
        jnp.asarray(gb["_edge_dst_local"]),
    )
    src = jnp.asarray(gb["edge_index"][0])
    dst = jnp.asarray(gb["edge_index"][1])

    def e_so(fcp_, lp_, x_, er_, sh_):
        out = conv._second_order_conv(fcp_, lp_, x_, er_, sh_, tile_args,
                                      src, dst, N, 0.5)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    def e_ref(fcp_, lp_, x_, er_, sh_):
        out = _ref_out(fused, fc, fcp_, lp_, x_, sh_, er_, gb, N)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    def force_loss(e_fn, argnums):
        # inner grad = the "forces" (wrt the position channels; including
        # x mimics the multi-layer chain where dx cotangents are live);
        # outer loss is a weighted sum over them, differentiated wrt params
        def f(fcp_, lp_, x_, er_, sh_):
            gs = jax.grad(e_fn, argnums=argnums)(fcp_, lp_, x_, er_, sh_)
            tot = 0.0
            for k, g in enumerate(gs):
                w = jnp.cos((0.07 - 0.02 * k)
                            * jnp.arange(g.size)).reshape(g.shape)
                tot = tot + jnp.sum(g * w)
            return tot
        return f

    # inner force values must match (pallas first-order vjp vs XLA)
    fa = jax.grad(e_so, argnums=(3, 4))(fcp, lp, x, er, sh)
    fb = jax.grad(e_ref, argnums=(3, 4))(fcp, lp, x, er, sh)
    for a, b in zip(jax.tree_util.tree_leaves(fa),
                    jax.tree_util.tree_leaves(fb)):
        denom = max(float(jnp.abs(b).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) / denom < 2e-4

    # inner grad wrt (er, sh): the dx cotangent is symbolically zero, so
    # g2_bwd takes the general substituted-calls path.  Inner grad wrt
    # (x, er, sh): all three cotangents live -> the fused grad2 kernel.
    for argnums in ((3, 4), (2, 3, 4)):
        ga = jax.grad(force_loss(e_so, argnums), argnums=(0, 1, 2, 3))(
            fcp, lp, x, er, sh
        )
        gref = jax.grad(force_loss(e_ref, argnums), argnums=(0, 1, 2, 3))(
            fcp, lp, x, er, sh
        )
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gref)):
            denom = max(float(jnp.abs(b).max()), 1e-6)
            assert float(jnp.abs(a - b).max()) / denom < 5e-4, argnums


def test_full_conv_extra_io_matches_separate_add():
    """Folding the species self-connection into the conv's output
    formatting (extra_io, one shared transpose) must equal computing the
    two separately and adding."""
    from equivariant_nn_zoo_tpu.ops.pallas.sc import SpeciesScalarFCTP

    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full(seed=7)
    types = 5
    rng = np.random.default_rng(9)
    spk = SpeciesScalarFCTP(conv.sc, types, compute_dtype=jnp.float32,
                            tile=32)
    table = jnp.asarray(rng.normal(size=(types, 4)), jnp.float32)
    species = jnp.asarray(rng.integers(0, types, size=(N, 1)), jnp.int32)
    attrs = table[species[:, 0]]
    lp, fcp = params["tp"]["linear"], params["fc"]
    targs = (jnp.asarray(gb["_edge_tile_win"]),
             jnp.asarray(gb["_edge_tile_first"]),
             jnp.asarray(gb["_edge_tile_last"]),
             jnp.asarray(gb["_edge_src_local"]),
             jnp.asarray(gb["_edge_dst_local"]))

    raw = spk.apply_raw(params["sc"], x, attrs, species)
    merged = full(fcp, lp, x, er, sh, *targs, N, pre_scale=0.5,
                  extra_io=raw)
    separate = (
        full(fcp, lp, x, er, sh, *targs, N, pre_scale=0.5)
        + spk.apply(params["sc"], x, attrs, species)
    )
    rel = float(jnp.abs(merged - separate).max()
                / max(float(jnp.abs(separate).max()), 1e-6))
    assert rel < 1e-5, rel


def test_full_conv_sh0_const_matches():
    """sh0_const=True (production: Y00 == 1) must match the generic kernel
    and the XLA reference when fed sh whose scalar column is 1 — values
    AND gradients."""
    from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasFullConv

    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full(seed=11)
    sh = sh.at[:, 0].set(1.0)
    full0 = PallasFullConv(conv.tp, conv.fc, compute_dtype=jnp.float32,
                           tile=32, window=32, compute_dsh=True,
                           sh0_const=True)
    assert full0.sh0_const
    lp, fcp = params["tp"]["linear"], params["fc"]
    targs = (jnp.asarray(gb["_edge_tile_win"]),
             jnp.asarray(gb["_edge_tile_first"]),
             jnp.asarray(gb["_edge_tile_last"]),
             jnp.asarray(gb["_edge_src_local"]),
             jnp.asarray(gb["_edge_dst_local"]))

    def out_k(k, fcp_, lp_, x_, sh_, er_):
        return k(fcp_, lp_, x_, er_, sh_, *targs, N, pre_scale=0.5)

    a = out_k(full0, fcp, lp, x, sh, er)
    b = _ref_out(fused, fc, fcp, lp, x, sh, er, gb, N)
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel

    def loss(k):
        def f(fcp_, lp_, x_, sh_, er_):
            o = out_k(k, fcp_, lp_, x_, sh_, er_)
            return jnp.sum(o * jnp.sin(0.1 * jnp.arange(o.size)
                                       ).reshape(o.shape))
        return f

    ga = jax.grad(loss(full0), argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    gb_ = jax.grad(loss(full), argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    for u, v in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb_)):
        denom = max(float(jnp.abs(v).max()), 1e-6)
        assert float(jnp.abs(u - v).max()) / denom < 2e-4


def test_pallas_reduce_false_matches_fused():
    """Per-edge-output mode (the Pairwise head's neighbor conv): the v1
    kernel minus the segment sum must match the XLA fused edge output,
    values and gradients."""
    fused, pallas, lp, x, src, dst, sh, w, N = setup(seed=3)
    a = pallas(lp, x, src, dst, sh, w, N, reduce=False)
    b = fused(lp, x, src, dst, sh, w, N, reduce=False)
    assert a.shape == b.shape
    rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
    assert rel < 1e-5, rel

    def loss(conv, lp_, x_, sh_, w_):
        out = conv(lp_, x_, src, dst, sh_, w_, N, reduce=False)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

    ga = jax.grad(lambda *z: loss(pallas, *z), argnums=(0, 1, 2, 3))(
        lp, x, sh, w
    )
    gb = jax.grad(lambda *z: loss(fused, *z), argnums=(0, 1, 2, 3))(
        lp, x, sh, w
    )
    for a_, b_ in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        denom = max(float(jnp.abs(b_).max()), 1e-6)
        assert float(jnp.abs(a_ - b_).max()) / denom < 1e-4


def test_full_conv_section_pack_matches(monkeypatch):
    """E3_PALLAS_SECPACK=1 (block-diagonal super-section dots; measured
    slower on TPU, kept for narrow-section configs) stays parity-exact
    with the default per-section lowering, forward and all grads."""
    monkeypatch.setenv("E3_PALLAS_SECPACK", "1")
    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full(seed=5)
    assert any(len(pk["sis"]) > 1 for pk in full._packs), \
        "pack knob had no effect — test geometry never packs"
    lp, fcp = params["tp"]["linear"], params["fc"]
    win = jnp.asarray(gb["_edge_tile_win"])
    tfirst = jnp.asarray(gb["_edge_tile_first"])
    tlast = jnp.asarray(gb["_edge_tile_last"])
    srcl = jnp.asarray(gb["_edge_src_local"])
    dstl = jnp.asarray(gb["_edge_dst_local"])

    def loss_full(fcp_, lp_, x_, sh_, er_):
        out = full(fcp_, lp_, x_, er_, sh_, win, tfirst, tlast, srcl, dstl,
                   N, pre_scale=0.5)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    def loss_ref(fcp_, lp_, x_, sh_, er_):
        out = _ref_out(fused, fc, fcp_, lp_, x_, sh_, er_, gb, N)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    a = full(fcp, lp, x, er, sh, win, tfirst, tlast, srcl, dstl, N,
             pre_scale=0.5)
    b = _ref_out(fused, fc, fcp, lp, x, sh, er, gb, N)
    assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 1e-5
    ga = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(fcp, lp, x, sh, er)
    for ai, bi in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gref)):
        denom = max(float(jnp.abs(bi).max()), 1e-6)
        assert float(jnp.abs(ai - bi).max()) / denom < 2e-4


@pytest.mark.parametrize("dsh", [True, False])
def test_full_conv_savemid_matches(monkeypatch, dsh):
    """E3_PALLAS_SAVEMID=1 — the forward streams the per-tile TP
    intermediate to the backward, which then skips the x gather, the
    outer build and the fwd CG dots (and, at compute_dsh=False, drops the
    node table from its inputs entirely).  Values and every gradient must
    match the XLA fused reference."""
    from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasFullConv

    monkeypatch.setenv("E3_PALLAS_SAVEMID", "1")
    conv, params, full, fused, fc, gb, x, sh, er, N = setup_full(seed=11)
    if not dsh:
        full = PallasFullConv(conv.tp, fc, compute_dtype=jnp.float32,
                              tile=32, window=32, compute_dsh=False)
    lp, fcp = params["tp"]["linear"], params["fc"]
    win = jnp.asarray(gb["_edge_tile_win"])
    tfirst = jnp.asarray(gb["_edge_tile_first"])
    tlast = jnp.asarray(gb["_edge_tile_last"])
    srcl = jnp.asarray(gb["_edge_src_local"])
    dstl = jnp.asarray(gb["_edge_dst_local"])

    def loss_full(fcp_, lp_, x_, sh_, er_):
        out = full(fcp_, lp_, x_, er_, sh_, win, tfirst, tlast, srcl, dstl,
                   N, pre_scale=0.5)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    def loss_ref(fcp_, lp_, x_, sh_, er_):
        out = _ref_out(fused, fc, fcp_, lp_, x_, sh_, er_, gb, N)
        return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)
                                     ).reshape(out.shape))

    a = full(fcp, lp, x, er, sh, win, tfirst, tlast, srcl, dstl, N,
             pre_scale=0.5)
    b = _ref_out(fused, fc, fcp, lp, x, sh, er, gb, N)
    assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 1e-5
    # sh grads only exist on the compute_dsh build
    argnums = (0, 1, 2, 3, 4) if dsh else (0, 1, 2, 4)
    ga = jax.grad(loss_full, argnums=argnums)(fcp, lp, x, sh, er)
    gref = jax.grad(loss_ref, argnums=argnums)(fcp, lp, x, sh, er)
    for ai, bi in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gref)):
        denom = max(float(jnp.abs(bi).max()), 1e-6)
        assert float(jnp.abs(ai - bi).max()) / denom < 2e-4
