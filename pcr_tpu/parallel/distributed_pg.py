"""Distributed pose-graph solve: edges sharded over the mesh, normal equations
all-reduced with psum (SURVEY §2.4 / BASELINE north star).

Each device holds an edge shard (padded with masked-out edges), builds its
local (6n, 6n) H and (6n,) b contributions inside
``optimize_pose_graph_once(axis_name='pairs')``, psums them over ICI, and runs
the identical LM update replicated — so the result equals the single-device
solve bit-for-bit up to reduction order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.global_refine import pose_graph as pg


def pad_edges(graph: pg.PoseGraph, multiple: int) -> pg.PoseGraph:
    """Pad the edge arrays to a multiple of the mesh axis with dead edges."""
    E = graph.edge_src.shape[0]
    E_pad = ((E + multiple - 1) // multiple) * multiple
    if E_pad == E:
        return graph
    pad = E_pad - E

    def padi(x, value=0):
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], value, x.dtype)])

    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (pad, 4, 4))
    return graph._replace(
        edge_src=padi(graph.edge_src),
        edge_dst=padi(graph.edge_dst),
        edge_T=jnp.concatenate([graph.edge_T, eye]),
        edge_info=jnp.concatenate(
            [graph.edge_info, jnp.zeros((pad, 6, 6), jnp.float32)]
        ),
        uncertain=padi(graph.uncertain, False),
        edge_mask=padi(graph.edge_mask, False),
    )


def distributed_optimize(
    mesh: Mesh,
    graph: pg.PoseGraph,
    mu: float = 1.0,
    max_iterations: int = 100,
    solver: str | None = None,
) -> pg.LMResult:
    """Edge-sharded LM pass; returns an ``LMResult`` whose nodes/cost/
    iteration count are replicated and whose line-process weights cover the
    (padded) edge set.

    For circuit graphs the block-tridiagonal path psums only the reduced
    quantities — (n, 6, 6) band blocks + (n, 6) gradient, ~260 KB at n=901 —
    instead of the dense (6n)^2 H (117 MB per LM iteration)."""
    if solver is None:
        solver = "tridiag" if pg.is_circuit_graph(graph) else "dense"
    n_dev = mesh.shape["pairs"]
    graph = pad_edges(graph, n_dev)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pg.PoseGraph(
            nodes=P(), edge_src=P("pairs"), edge_dst=P("pairs"), edge_T=P("pairs"),
            edge_info=P("pairs"), uncertain=P("pairs"), edge_mask=P("pairs"),
        ),),
        out_specs=pg.LMResult(
            nodes=P(), final_cost=P(), iterations_used=P(),
            line_process=P("pairs"),
        ),
        check_vma=False,
    )
    def run(g: pg.PoseGraph):
        return pg.optimize_pose_graph_once(
            g, mu=mu, max_iterations=max_iterations, axis_name="pairs",
            solver=solver,
        )

    return run(graph)


def distributed_global_optimization(
    mesh: Mesh,
    graph: pg.PoseGraph,
    max_correspondence_distance: float = 0.2,
    edge_prune_threshold: float = 0.25,
    preference_loop_closure: float = 1.0,
    max_iterations: int = 100,
) -> pg.PoseGraph:
    """Distributed version of models.global_refine.global_optimization:
    optimize -> prune uncertain edges by the optimizer's final line-process
    weights -> re-optimize (re-seeded with the exact chain when pruning left
    a pure odometry circuit, matching the single-device path)."""
    mu = pg.line_process_weight(
        graph, preference_loop_closure, max_correspondence_distance
    )
    E = graph.edge_src.shape[0]
    res = distributed_optimize(mesh, graph, mu=mu, max_iterations=max_iterations)
    # Drop the explicit mesh sharding before mixing with host-side arrays
    nodes = jnp.asarray(np.asarray(res.nodes))
    w = jnp.asarray(np.asarray(res.line_process))[:E]
    keep = (~graph.uncertain) | (w >= edge_prune_threshold)
    pruned = graph._replace(nodes=nodes, edge_mask=graph.edge_mask & keep)
    if bool(jnp.any(graph.edge_mask & ~keep)) and pg.is_circuit_graph(graph):
        if not bool(jnp.any(pruned.uncertain & pruned.edge_mask)):
            pruned = pruned._replace(nodes=pg.chain_nodes_from_edges(pruned))
    res = distributed_optimize(mesh, pruned, mu=mu, max_iterations=max_iterations)
    return pruned._replace(nodes=jnp.asarray(np.asarray(res.nodes)))
