"""Iterative graph analytics — fixed-point PageRank over the
order-part bipartite graph (SURVEY.md §2 extension family; the
iterative-superstep pattern ops.connected_components pioneered,
generalized to value propagation).

PageRank is THE canonical distributed iterative op: per superstep,
every node sends rank/out_degree along its edges and the new rank is
damping' + damping * sum(incoming).  The engine expresses one
superstep as ONE co-partition join (edges x ranks on src) + ONE
partial-aggregated groupby (sum by dst) — both shuffles move one row
per edge / per node, nothing materializes on the driver, and each
superstep materializes so the plan stays shallow (Pregel shape).

All arithmetic is INTEGER fixed point (ranks in millionths, integer
floor division for the share, ``85 * s // 100`` for damping) so the
result is bit-exact against the DuckDB chained-CTE twin — float
PageRank sums are order-dependent in the last ulps and would flip the
driver's value hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from spider_ray import ops

PR_ITERATIONS = 5
PR_INIT = 1_000_000       # initial rank: 1.0 in millionths
PR_BASE = 150_000         # (1 - 0.85) in millionths
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def _edges_deg(sf_dir: str):
    """Distinct bidirectional (src, dst) edges of the order-part graph
    with the src out-degree attached — built once, reused every
    superstep.  Node ids are disjoint by parity: 2*orderkey vs
    2*partkey+1."""
    li = ops.read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def both_dirs(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([2 * o, 2 * p + 1])
        dst = np.concatenate([2 * p + 1, 2 * o])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = ops.exact_dedup(
        li.map_batches(both_dirs, batch_format="pyarrow"),
        keys=["src", "dst"], order_by=[],
    )
    deg = ops.partial_sum_agg(
        edges, keys=["src"], sums={}, counts="d", bounded=False
    )
    return ops.partitioned_hash_join(edges, deg, on="src").materialize()


def pagerank_order_part(sf_dir: str, iterations: int = PR_ITERATIONS):
    """Fixed-point PageRank, ``iterations`` supersteps.  Returns
    (node, pr) for every node; bit-exact vs the SQL twin."""
    edges_deg = _edges_deg(sf_dir)

    # r0: every node (= every src of the bidirectional edge set) at 1.0
    ranks = ops.partial_sum_agg(
        edges_deg, keys=["src"], sums={}, counts="_n", bounded=False
    ).map_batches(
        lambda t: pa.table(
            {"src": t.column("src"),
             "pr": pa.array(np.full(len(t), PR_INIT, np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        sends = ops.partitioned_hash_join(edges_deg, ranks, on="src")

        def contrib(t: pa.Table) -> pa.Table:
            pr = t.column("pr").to_numpy(zero_copy_only=False)
            d = t.column("d").to_numpy(zero_copy_only=False)
            return pa.table(
                {"dst": t.column("dst"), "c": pa.array(pr // d)}
            )

        sums = ops.partial_sum_agg(
            sends, pre=contrib, keys=["dst"], sums={"c": "s"}, counts=None,
            bounded=False,
        )
        ranks = sums.map_batches(
            lambda t: pa.table(
                {"src": t.column("dst"),
                 "pr": pa.array(
                     PR_BASE
                     + (PR_DAMP_NUM
                        * t.column("s").to_numpy(zero_copy_only=False))
                     // PR_DAMP_DEN)}
            ),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda t: t.rename_columns(["node", "pr"]), batch_format="pyarrow"
    ).sort("node")


def _pagerank_sql(iterations: int = PR_ITERATIONS) -> str:
    prev = "r0"
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f"""r{i} AS (
      SELECT e.dst AS node,
             CAST({PR_BASE} + ({PR_DAMP_NUM} * SUM(r.pr // dg.d))
                  // {PR_DAMP_DEN} AS BIGINT) AS pr
      FROM edges e
      JOIN {prev} r ON e.src = r.node
      JOIN deg dg ON e.src = dg.src
      GROUP BY e.dst
    )""")
        prev = f"r{i}"
    chained = ",\n    ".join(steps)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT 2 * l_orderkey AS src, 2 * l_partkey + 1 AS dst
      FROM lineitem
    ),
    edges AS (
      SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST({PR_INIT} AS BIGINT) AS pr FROM deg),
    {chained}
    SELECT node, pr FROM {prev}
    """


GRAPH_QUERIES = {
    "pagerank_order_part": pagerank_order_part,
}

GRAPH_ORACLE_SQL = {
    "pagerank_order_part": _pagerank_sql(),
}
