"""Edge construction.

Two flavors:

- ``computeEdgeIndex`` — host-side numpy preprocessing (radius graph with
  optional custom criteria and old-edge feature remapping).  Reference
  parity: e3_layers/data/compute_edge.py:38-113.
- ``computeEdgeVector`` — device-side model layer (plain callable in a layer
  list) that gathers displacement vectors; differentiable w.r.t. positions so
  force heads backprop through it.  Reference parity: compute_edge.py:13-36.
  The norm uses a tiny epsilon so padded zero-edges produce zero (not NaN)
  gradients.

For recomputing edges *inside* a jitted sampler step (diffusion), see
``radius_graph_fixed`` — a static-capacity radius graph that runs on device.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def computeEdgeVector(data: Dict, attrs: Dict, key: str = "pos",
                      with_lengths: bool = True):
    attrs = dict(attrs)
    attrs["edge_vector"] = ("edge", "1x1o")
    attrs["edge_length"] = ("edge", "1x0e")
    if "edge_vector" in data:
        if with_lengths and "edge_length" not in data:
            vec = data["edge_vector"]
            data = dict(data)
            data["edge_length"] = jnp.sqrt(
                jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-12
            )
        return data, attrs
    pos = data[key]
    edge_index = data["edge_index"]
    vec = pos[edge_index[1]] - pos[edge_index[0]]
    data = dict(data)
    data["edge_vector"] = vec
    if with_lengths:
        data["edge_length"] = jnp.sqrt(
            jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-12
        )
    return data, attrs


def computeEdgeIndex(data, attrs, r_max: float = None, key: str = "pos",
                     criteria=None):
    """Host-side radius graph (per graph, O(N^2) mask), merging pre-existing
    bonded edges and custom criteria; remaps old edge features to the new
    edge list with zero padding for new edges.

    Operates on dicts of numpy arrays (a Data's tensors).  Returns only the
    new ``edge_index`` (plus ``_n_edges``) like the reference, with edge
    features updated in-place in ``data``.
    """
    pos = np.asarray(data[key], dtype=np.float64).reshape(-1, 3)
    if "_n_nodes" in data:
        n_nodes_arr = np.asarray(data["_n_nodes"]).reshape(-1).astype(np.int64)
    else:  # a single graph
        n_nodes_arr = np.array([pos.shape[0]], dtype=np.int64)

    # per-graph fully connected candidate edges
    edge_index_lst = []
    cnt = 0
    for n_nodes in n_nodes_arr:
        n = int(n_nodes)
        idx = np.arange(cnt, cnt + n)
        src = np.repeat(idx, n)
        dst = np.tile(idx, n)
        edge_index_lst.append(np.stack([src, dst]))
        cnt += n
    edge_index = np.concatenate(edge_index_lst, axis=1)

    dist = np.linalg.norm(pos[edge_index[0]] - pos[edge_index[1]], axis=-1)
    mask = dist < r_max
    if criteria is not None:
        mask = np.logical_or(mask, np.asarray(criteria(data, edge_index)))
    mask = np.logical_and(mask, edge_index[0] != edge_index[1])

    old_edge_index = data.get("edge_index")

    def edge_positions(old, new):
        """Index of each old edge (2,K) inside new (2,M)."""
        new_keys = new[0] * (new.max() + 1) + new[1]
        old_keys = old[0] * (new.max() + 1) + old[1]
        order = np.argsort(new_keys, kind="stable")
        pos_in_sorted = np.searchsorted(new_keys[order], old_keys)
        return order[pos_in_sorted]

    if old_edge_index is not None:
        old_edge_index = np.asarray(old_edge_index, dtype=np.int64)
        mask[edge_positions(old_edge_index, edge_index)] = True

    new_edge_index = edge_index[:, mask]

    if old_edge_index is not None and old_edge_index.shape[1] > 0:
        edge_map = edge_positions(old_edge_index, new_edge_index)
        for k in list(attrs.keys()):
            if attrs[k][0] == "edge" and k in data:
                tmp = np.asarray(data[k])
                new = np.zeros((new_edge_index.shape[1], tmp.shape[1]), tmp.dtype)
                new[edge_map] = tmp
                data[k] = new

    if "_node_segment" in data:
        n_graphs = len(n_nodes_arr)
        seg = np.asarray(data["_node_segment"]).reshape(-1)
        n_edges = np.bincount(
            seg[new_edge_index[0]], minlength=n_graphs
        ).reshape(-1, 1)
    else:
        n_edges = np.full((len(n_nodes_arr), 1), new_edge_index.shape[1],
                          dtype=np.int64)

    attrs["_n_edges"] = ("graph", "1x0e")
    data["_n_edges"] = n_edges

    out = {"edge_index": new_edge_index.astype(np.int64)}
    return out, attrs


def computeEdgeIndexDevice(data, attrs, r_max: float = None, key: str = "pos",
                           criteria=None):
    """Device-side (jit-compatible) counterpart of ``computeEdgeIndex`` for
    use as a *model layer* — e.g. the first layer of the protein diffusion
    model, which rebuilds the radius graph from current positions on every
    forward (reference: config_diffusion_CA.py:190-191 + the sampler's
    edge-popping at sde_sampling.py:237-242).

    The edge capacity is inherited from the incoming ``edge_index`` buffer.
    ``criteria(data, src_idx, dst_idx, rng_key) -> [N, N] bool`` adds extra
    edges (e.g. chain neighbors + stochastic long-range).  Overflow beyond
    capacity drops edges deterministically by pair order.
    """
    import jax

    pos = data[key]
    n = pos.shape[0]
    edge_capacity = data["edge_index"].shape[-1]
    node_segment = data["_node_segment"]
    node_mask = data["_node_mask"]
    dummy = n - 1
    extra = None
    if criteria is not None:
        rng = data.get("_edge_rng")
        if rng is None:
            # deterministic per-step fold of the diffusion time
            t = data.get("t")
            salt = (
                jnp.asarray(t, jnp.float32).reshape(-1)[0] * 1e6
            ).astype(jnp.int32) if t is not None else jnp.int32(0)
            rng = jax.random.fold_in(jax.random.PRNGKey(0), salt)
        src_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        dst_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        extra = criteria(data, src_idx, dst_idx, rng)
    edge_index, edge_mask, edge_segment, n_candidates = radius_graph_fixed(
        pos, node_segment, node_mask, edge_capacity, r_max, dummy,
        extra_mask=extra,
    )
    g = data["_graph_mask"].shape[0]
    n_edges = jax.ops.segment_sum(
        edge_mask[:, 0].astype(jnp.int32), edge_segment, num_segments=g + 1
    )[:g][:, None]
    attrs = dict(attrs)
    attrs["_n_edges"] = ("graph", "1x0e")
    attrs["_edge_overflow"] = ("graph", "1x0e")
    out = {
        "edge_index": edge_index,
        "_edge_mask": edge_mask,
        "_edge_segment": edge_segment,
        "_n_edges": n_edges,
        # edges silently dropped when candidates exceeded the static buffer —
        # monitor this (should be 0; raise data_config.edge_capacity if not)
        "_edge_overflow": (
            jnp.maximum(n_candidates - edge_capacity, 0).astype(jnp.int32)
            * jnp.ones((g, 1), jnp.int32)
        ),
    }
    return out, attrs


def chain_criteria_device(data, src_idx, dst_idx, rng, window: int = 5,
                          p_random: float = 0.02):
    """Device version of the protein edge criteria: same-chain sequence
    neighbors (|i-j| < window) plus Bernoulli(p_random) long-range edges.

    Reference parity: config_diffusion_CA.py:58-64.
    """
    import jax

    chain = data["chain_id"].reshape(-1)
    idv = data["id"].reshape(-1) if "id" in data else jnp.arange(
        chain.shape[0]
    )
    same_chain = chain[src_idx] == chain[dst_idx]
    near = jnp.abs(idv[src_idx] - idv[dst_idx]) < window
    mask = same_chain & near
    rand = jax.random.uniform(rng, mask.shape) < p_random
    return mask | rand


def radius_graph_fixed(
    pos: jnp.ndarray,
    node_segment: jnp.ndarray,
    node_mask: jnp.ndarray,
    edge_capacity: int,
    r_max: float,
    dummy_node: int,
    extra_mask: jnp.ndarray = None,
):
    """Static-capacity radius graph, jit-compatible (for in-sampler edge
    recompute, reference behavior at e3_layers/run/sde_sampling.py:237-242).

    Considers all node pairs, keeps (same graph, dist < r_max, i != j) plus
    ``extra_mask`` [N, N] if given, and packs the surviving edges to the
    front of a fixed-size [2, edge_capacity] buffer (overflow edges beyond
    capacity are dropped deterministically by pair order).
    """
    n = pos.shape[0]
    diff = pos[None, :, :] - pos[:, None, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    same_graph = node_segment[:, None] == node_segment[None, :]
    valid = (node_mask[:, 0] > 0)[:, None] & (node_mask[:, 0] > 0)[None, :]
    eye = jnp.eye(n, dtype=bool)
    mask = same_graph & valid & (~eye) & (dist2 < r_max * r_max)
    if extra_mask is not None:
        mask = mask | (extra_mask & same_graph & valid & (~eye))
    flat = mask.reshape(-1)
    # pack True positions to the front: stable sort of (not flat)
    order = jnp.argsort(~flat, stable=True)
    take = order[:edge_capacity]
    ok = flat[take]
    src = take // n
    dst = take % n
    src = jnp.where(ok, src, dummy_node).astype(jnp.int32)
    dst = jnp.where(ok, dst, dummy_node).astype(jnp.int32)
    edge_index = jnp.stack([src, dst])
    edge_mask = ok.astype(jnp.float32)[:, None]
    # the dummy node always belongs to the padding segment
    edge_segment = node_segment[src].astype(jnp.int32)
    n_candidates = jnp.sum(flat.astype(jnp.int32))
    return edge_index, edge_mask, edge_segment, n_candidates
