"""Greedy max-degree graph reduction -> qp dedup mapping.

The reference shells out to networkx
(clustering/coarsegrain_dependency_network.py:59-90, invoked via system()
at FE_problem.h:1248-1262) to repeatedly take the highest-degree node of
the similarity graph, map the node and all its neighbours to it, delete
them, and emit mapping.csv.  Here the same algorithm runs either on device
(a lax.while_loop over the adjacency matrix — the graph is per-qp-count
sized, tiny next to the MD work) or on host (numpy, bit-identical).

Tie-breaking: lowest node id among max-degree nodes (deterministic; the
reference's dict-iteration order is glob-order-dependent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def reduce_graph(adj: jax.Array, max_picks: int = 512,
                 return_saturated: bool = False):
    """(n, n) bool adjacency -> (n,) int32 mapping (qp -> source qp).

    Nodes outside the graph (no edges) map to themselves.  With
    ``return_saturated`` also returns a scalar bool that is True when the
    pick cap truncated the reduction (nodes were still active after
    ``max_picks`` greedy picks) — surfaced to the run log so the
    extra-MD fallback is never silent.

    Implementation notes:
    * a static-bound fori_loop with a no-op guard instead of the natural
      while_loop — dynamic-trip-count loops nested under other control
      flow hang the axon TPU backend;
    * the loop is capped at ``max_picks`` greedy picks; qps not reached by
      then keep the identity mapping, i.e. they run their own MD — a
      conservative fallback that only costs extra MD, never wrong
      stresses.  Uncapped, the masked loop would be O(n^3) in flagged qps.
      Measured on v5e at 4608 qps with smooth strain fields (similarity
      thresholds spanning 1-10% of pair distances): convergence takes up
      to ~124 picks and a 512-pick loop costs 40-70 ms — so 512 is cheap
      insurance where the old 128 default was within 4 picks of
      truncating real dedup.
    """
    n = adj.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)

    def body(_, carry):
        mapping, active = carry
        any_active = jnp.any(active)
        live = adj & active[:, None] & active[None, :]
        deg = jnp.sum(live, axis=1)
        # pick the max-degree active node; argmax takes the lowest id on ties
        score = jnp.where(active, deg, -1)
        node = jnp.argmax(score).astype(jnp.int32)
        neigh = live[node]
        new_mapping = jnp.where(neigh, node, mapping)
        removed = neigh | (ids == node)
        new_active = active & ~removed
        mapping = jnp.where(any_active, new_mapping, mapping)
        active = jnp.where(any_active, new_active, active)
        return mapping, active

    active0 = jnp.any(adj, axis=1)
    mapping, active = jax.lax.fori_loop(
        0, min(n, max_picks), body, (ids, active0))
    if return_saturated:
        # saturated means dedup was actually truncated: an EDGE between
        # two still-active nodes remains.  Leftover active nodes with
        # zero live degree keep the identity mapping either way (their
        # neighbors were consumed by earlier picks) — not a truncation.
        live = adj & active[:, None] & active[None, :]
        return mapping, jnp.any(live)
    return mapping


def reduce_graph_host(adj: np.ndarray) -> np.ndarray:
    """Host (numpy) twin of reduce_graph, for testing against networkx."""
    n = adj.shape[0]
    adj = adj.copy()
    mapping = np.arange(n, dtype=np.int32)
    active = adj.any(axis=1)
    while active.any():
        live = adj & active[:, None] & active[None, :]
        deg = live.sum(axis=1)
        score = np.where(active, deg, -1)
        node = int(np.argmax(score))
        neigh = live[node]
        mapping[neigh] = node
        active &= ~neigh
        active[node] = False
    return mapping
