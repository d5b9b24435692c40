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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

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


def degree_distribution(sf_dir: str):
    """Degree histogram of the order-part graph: (degree, n_nodes).
    Two chained partial aggregates — the first (per-node degree) has a
    data-sized key domain so it range-partitions; the second's key
    domain is bounded by the max basket size, so it tree-combines into
    one block.  The classic 'aggregate of an aggregate' shape with the
    right bounded/unbounded choice at each level."""
    edges_deg = _edges_deg(sf_dir)
    deg_nodes = ops.exact_dedup(
        edges_deg.map_batches(
            lambda t: t.select(["src", "d"]), batch_format="pyarrow"
        ),
        keys=["src"], order_by=[],
    )
    dist = ops.partial_sum_agg(
        deg_nodes,
        pre=lambda t: pa.table({"d": t.column("d")}),
        keys=["d"], sums={}, counts="n_nodes",
    )
    return dist.sort("d")


BFS_HOPS = 3
BFS_SEED_MOD = 250        # seeds: part nodes with partkey % 250 == 0


def bfs_hops_order_part(sf_dir: str, hops: int = BFS_HOPS):
    """Multi-source BFS shortest hop counts over the order-part graph —
    the traversal sibling of pagerank's value propagation: (node, dist)
    for every node within ``hops`` of any seed, dist = MIN hops.

    Delta-frontier supersteps (the property that makes distributed BFS
    tractable): only NEWLY discovered nodes expand in the next round,
    so per superstep the engine runs (1) a semi join edges x frontier
    on src — neighbor expansion, ships nothing but the frontier key
    column on the probe side, (2) a distinct over the candidate
    neighbors, (3) an anti join against the discovered set — both
    right sides are key-only per partitioned_hash_join's semi/anti
    projection.  Frontiers shrink monotonically; the discovered table
    only ever receives unions (no rewrite).  The edge table re-enters
    the superstep join each round — at 100 TB you'd materialize edges
    ONCE into a src-partitioned layout (the ann.py IVF index pattern)
    and stream only the frontier through it; the semantics here are
    identical.

    Integer dist (hop level the node first appeared at) keeps the
    result bit-exact vs the unrolled-CTE DuckDB twin."""
    edges = _edges_deg(sf_dir).map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    ).materialize()

    # seeds: odd node ids are parts (node = 2*p + 1)
    def seed_batch(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        m = (src % 2 == 1) & (((src - 1) // 2) % BFS_SEED_MOD == 0)
        return pa.table({"node": pa.array(src[m], pa.int64())})

    frontier = ops.exact_dedup(
        edges.map_batches(seed_batch, batch_format="pyarrow"),
        keys=["node"], order_by=[],
    ).materialize()

    def with_dist(lvl: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": t.column("node"),
                 "dist": pa.array(np.full(len(t), lvl, np.int64))}
            )
        return f

    dist = frontier.map_batches(with_dist(0), batch_format="pyarrow").materialize()

    for lvl in range(1, hops + 1):
        probe = frontier.map_batches(
            lambda t: t.rename_columns(["src"]), batch_format="pyarrow"
        )
        # (1) neighbor expansion: edges rows whose src is in the frontier
        reached = ops.partitioned_hash_join(edges, probe, on="src", how="semi")
        cand = ops.exact_dedup(
            reached.map_batches(
                lambda t: pa.table({"node": t.column("dst")}),
                batch_format="pyarrow",
            ),
            keys=["node"], order_by=[],
        )
        # (3) keep only nodes not discovered at an earlier level
        new = ops.partitioned_hash_join(cand, dist, on="node", how="anti")
        new = new.materialize()
        if new.count() == 0:
            break
        dist = dist.union(
            new.map_batches(with_dist(lvl), batch_format="pyarrow")
        ).materialize()
        frontier = new

    return dist.sort("node")


def _bfs_sql(hops: int = BFS_HOPS) -> str:
    levels = ["SELECT node, 0 AS lvl FROM r0"]
    steps = []
    for i in range(1, hops + 1):
        steps.append(f"""r{i} AS (
      SELECT node FROM r{i - 1}
      UNION
      SELECT e.dst AS node FROM edges e JOIN r{i - 1} f ON e.src = f.node
    )""")
        levels.append(f"SELECT node, {i} AS lvl FROM r{i}")
    chained = ",\n    ".join(steps)
    lvl_union = "\n      UNION ALL ".join(levels)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT 2 * l_orderkey AS src, 2 * l_partkey + 1 AS dst
      FROM lineitem
    ),
    edges AS (
      SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
    ),
    r0 AS (
      SELECT DISTINCT 2 * l_partkey + 1 AS node FROM lineitem
      WHERE l_partkey % {BFS_SEED_MOD} = 0
    ),
    {chained}
    SELECT node, CAST(MIN(lvl) AS BIGINT) AS dist
    FROM ({lvl_union})
    GROUP BY node
    """


MIN_PAIR_COUNT = 2


def _distinct_items(sf_dir: str):
    """Distinct (order, item) rows, range-partitioned by the dedup sort
    so every basket is contiguous and block-complete — the shared
    co-partitioned input for pair generation AND item supports."""
    li = ops.read_table(sf_dir, "lineitem",
                        columns=["l_orderkey", "l_partkey"])
    return ops.exact_dedup(li, keys=["l_orderkey", "l_partkey"],
                           order_by=[])


def copurchase_pairs(sf_dir: str, min_count: int = MIN_PAIR_COUNT,
                     items=None):
    """Market-basket pair counting: part pairs co-occurring in at least
    ``min_count`` orders.  The self-join explosion is bounded BY DATA
    SHAPE: pairs are generated inside each order's basket (<= 7 items
    -> <= 21 pairs per order), never by a table-level self-join, so the
    expansion is O(rows x basket) regardless of corpus size.  The dedup
    sort that builds the distinct-items table IS the basket
    co-partition (its keys lead with l_orderkey), so pair generation
    rides those blocks with no extra shuffle; pair counts pre-aggregate
    per batch before the single pair-keyed shuffle.  Callers that also
    need item supports pass a shared (materialized) ``items``."""
    if items is None:
        items = _distinct_items(sf_dir)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        o = df["l_orderkey"].to_numpy(np.int64)
        p = df["l_partkey"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
        ends = np.r_[starts[1:], len(o)]
        p1s: list[int] = []
        p2s: list[int] = []
        # per-basket combination loop: bounded by the basket size (<=7
        # items), not by data volume — this is the documented contract
        for s, e in zip(starts, ends):
            basket = p[s:e]
            for i in range(len(basket) - 1):
                for j in range(i + 1, len(basket)):
                    p1s.append(int(basket[i]))
                    p2s.append(int(basket[j]))
        return pd.DataFrame({"p1": p1s, "p2": p2s})

    pair_rows = items.map_batches(pairs, batch_size=None,
                                  batch_format="pandas")
    counts = ops.partial_sum_agg(
        pair_rows, keys=["p1", "p2"], sums={}, counts="n_orders",
        bounded=False,
    )
    return counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_orders"), min_count)),
        batch_format="pyarrow",
    ).sort(["p1", "p2"])


def basket_rules_lift(sf_dir: str, min_count: int = MIN_PAIR_COUNT):
    """Association-rule mining over the co-purchase pairs: per pair,
    support count, both directed confidences, and lift — all in e6
    fixed point from exact integer counts (lift_e6 = 1e6 * N * c_xy
    // (c_x * c_y); every operand positive, so numpy floor division
    and DuckDB's truncating ``//`` agree).

    Scale shape: basket-bounded pair generation (copurchase kernel),
    item supports from ONE distinct-(order,item) dedup + combiner
    pass, the basket total N as a bounded scalar, and two
    co-partitioned joins to attach c_x / c_y — no stage touches the
    cross product of items."""
    # materialize the shared intermediates ONCE: pairs is edge-sized
    # (threshold-filtered) and items is distinct-(order,item)-sized;
    # without this each downstream consumer re-executes the whole
    # basket lineage (measured 14 s -> ~4 s at sf0.1).  items is shared
    # WITH the pair generation, so its dedup sort runs once total.
    items = _distinct_items(sf_dir).materialize()
    pairs = copurchase_pairs(sf_dir, min_count, items=items).materialize()
    ic = ops.partial_sum_agg(items, keys=["l_partkey"], sums={},
                             counts="c", bounded=False)
    n_baskets = ops.partial_sum_agg(
        items.select_columns(["l_orderkey"]), keys=["l_orderkey"],
        sums={}, counts="one", bounded=False,
    ).count()

    c1 = ic.map_batches(lambda t: t.rename_columns(["p1", "c1"]),
                        batch_format="pyarrow")
    c2 = ic.map_batches(lambda t: t.rename_columns(["p2", "c2"]),
                        batch_format="pyarrow")
    joined = ops.partitioned_hash_join(
        ops.partitioned_hash_join(pairs, c1, on="p1"), c2, on="p2")

    def rules(t: pa.Table) -> pa.Table:
        nxy = t.column("n_orders").to_numpy(zero_copy_only=False)
        cx = t.column("c1").to_numpy(zero_copy_only=False)
        cy = t.column("c2").to_numpy(zero_copy_only=False)
        return pa.table({
            "p1": t.column("p1"), "p2": t.column("p2"),
            "n_orders": t.column("n_orders"),
            "lift_e6": pa.array(1_000_000 * n_baskets * nxy // (cx * cy)),
            "conf_p1_to_p2_e6": pa.array(1_000_000 * nxy // cx),
            "conf_p2_to_p1_e6": pa.array(1_000_000 * nxy // cy),
        })

    return joined.map_batches(rules, batch_format="pyarrow")\
                 .sort(["p1", "p2"])


_BASKET_RULES_SQL = f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
           FROM items GROUP BY 1),
    e AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_COUNT}
    )
    SELECT e.p1, e.p2, e.n_orders,
           CAST(1000000 * (SELECT n FROM nb) * e.n_orders
                // (c1.c * c2.c) AS BIGINT) AS lift_e6,
           CAST(1000000 * e.n_orders // c1.c AS BIGINT)
               AS conf_p1_to_p2_e6,
           CAST(1000000 * e.n_orders // c2.c AS BIGINT)
               AS conf_p2_to_p1_e6
    FROM e JOIN ic c1 ON c1.l_partkey = e.p1
           JOIN ic c2 ON c2.l_partkey = e.p2
"""


def triangle_count_copurchase(sf_dir: str, min_count: int = MIN_PAIR_COUNT):
    """Exact triangle count on the co-purchase graph — the classic
    degree-ordered distributed algorithm (each triangle is counted at
    exactly ONE vertex: its minimum in the (degree, id) total order,
    so no post-hoc dividing by 3/6 and no double counting).

    Scale shape: edges come from the basket-bounded copurchase kernel;
    degrees are a combiner aggregate; two co-partitioned joins attach
    (d1, d2); wedges are generated per source INSIDE its range
    partition with work bounded by the ORIENTED out-degree (<=
    O(sqrt(m)) under degree ordering — the hub-node guard that id
    ordering lacks); the wedge->edge membership check is one more
    co-partitioned join on a packed (lo<<32|hi) key.  Nothing is ever
    all-pairs in the node count, and the only driver-side value is the
    final scalar count."""
    # edge-sized materialization: three consumers (degrees, the join
    # chain, the membership check) would otherwise each re-run the full
    # basket pass (measured 29 s -> ~5 s at sf0.1)
    edges = copurchase_pairs(sf_dir, min_count)        .select_columns(["p1", "p2"]).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        p1 = t.column("p1").to_numpy(zero_copy_only=False)
        p2 = t.column("p2").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.r_[p1, p2]),
            "one": pa.array(np.ones(2 * len(t), np.int64)),
        })

    deg = ops.partial_sum_agg(
        edges.map_batches(both_ends, batch_format="pyarrow"),
        keys=["node"], sums={"one": "d"}, counts=None,
        bounded=False,  # node domain is data-sized
    )
    d1 = deg.map_batches(
        lambda t: t.rename_columns(["p1", "d1"]), batch_format="pyarrow")
    d2 = deg.map_batches(
        lambda t: t.rename_columns(["p2", "d2"]), batch_format="pyarrow")
    e2 = ops.partitioned_hash_join(
        ops.partitioned_hash_join(edges, d1, on="p1"), d2, on="p2")

    def orient(t: pa.Table) -> pa.Table:
        p1 = t.column("p1").to_numpy(zero_copy_only=False)
        p2 = t.column("p2").to_numpy(zero_copy_only=False)
        dd1 = t.column("d1").to_numpy(zero_copy_only=False)
        dd2 = t.column("d2").to_numpy(zero_copy_only=False)
        first = (dd1 < dd2) | ((dd1 == dd2) & (p1 < p2))
        return pa.table({
            "src": pa.array(np.where(first, p1, p2)),
            "dst": pa.array(np.where(first, p2, p1)),
        })

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["src", "dst"], kind="mergesort")
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[starts[1:], len(s)]
        ks: list[int] = []
        # per-source combination loop: bounded by the ORIENTED
        # out-degree (the degree-ordering contract), not by data volume
        for a, b in zip(starts, ends):
            nb = d[a:b]
            for i in range(len(nb) - 1):
                for j in range(i + 1, len(nb)):
                    lo, hi = int(nb[i]), int(nb[j])
                    if lo > hi:
                        lo, hi = hi, lo
                    ks.append((lo << 32) | hi)
        return pd.DataFrame({"k": np.array(ks, np.int64)})

    wedge_keys = (
        # identity-coalesce before the sort (exact_dedup's idiom): the
        # thresholded edge set is tiny relative to its upstream block
        # count, and task-count partitions over it mint empty
        # (schema-less) blocks — volume-tracked blocks do not
        oriented.map_batches(lambda t: t, batch_size=32768,
                             batch_format="pyarrow")
        .sort("src")
        .map_batches(wedges, batch_size=None, batch_format="pandas")
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        p1 = t.column("p1").to_numpy(zero_copy_only=False)
        p2 = t.column("p2").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array((p1.astype(np.int64) << 32)
                                       | p2.astype(np.int64)),
                         "hit": pa.array(np.ones(len(t), np.int64))})

    closed = ops.partitioned_hash_join(
        wedge_keys, edges.map_batches(edge_keys, batch_format="pyarrow"),
        on="k")
    n = closed.count()
    return ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([n], pa.int64())}))


_TRIANGLE_SQL = f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_COUNT}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.p1 = e1.p1 AND e2.p2 > e1.p2
    JOIN e e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2
"""


GRAPH_QUERIES = {
    "basket_rules_lift": basket_rules_lift,
    "triangle_count_copurchase": triangle_count_copurchase,
    "pagerank_order_part": pagerank_order_part,
    "bfs_hops_order_part": bfs_hops_order_part,
    "degree_distribution": degree_distribution,
    "copurchase_pairs": copurchase_pairs,
}

GRAPH_ORACLE_SQL = {
    "basket_rules_lift": _BASKET_RULES_SQL,
    "triangle_count_copurchase": _TRIANGLE_SQL,
    "pagerank_order_part": _pagerank_sql(),
    "bfs_hops_order_part": _bfs_sql(),
    "degree_distribution": """
        WITH e0 AS (
          SELECT DISTINCT 2 * l_orderkey AS src, 2 * l_partkey + 1 AS dst
          FROM lineitem
        ),
        edges AS (
          SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
        SELECT d, COUNT(*) AS n_nodes FROM deg GROUP BY d
    """,
    "copurchase_pairs": f"""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_COUNT}
    """,
}
