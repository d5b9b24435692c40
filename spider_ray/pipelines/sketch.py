"""Distinct-count sketch (HyperLogLog) — SURVEY.md §2.5 A3's scale
path, made concrete: "exact at test scale; sketch (HLL-style) at 10^10
scale".

The exact `ds.unique()` distinct count shuffles every distinct key; at
10^10 URLs that is the data itself.  The HLL sketch shuffles at most
``m`` = 1024 (register, rho) rows per batch REGARDLESS of input size —
the classic trade: fixed 4 KB of state for ~3.2% standard error
(Flajolet et al. 2007, the public HyperLogLog paper).

Determinism: the hash is sha1 (pinned spec below), register folding is
max (order-free), and the final estimate is evaluated in one pinned
IEEE op order — so the distributed engine and the plain-Python
sequential twin in spider_ray.goldens produce the IDENTICAL estimate,
which is what lets a driver-gate hash compare an *approximate*
operator exactly.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa

# same tokenizer as freq.heavy_hitters_terms / tfidf's SQL twin:
# lowercase [a-z]+ runs of length >= 3
_TERM_RE = re.compile(r"[a-z]+")

from spider_ray import ops
from spider_ray.goldens import golden_sql

HLL_B = 10                 # register-index bits
HLL_M = 1 << HLL_B         # 1024 registers
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_W_BITS = 64 - HLL_B       # 54-bit suffix whose leading zeros we count


def hll_reg_rho(key: str) -> tuple[int, int]:
    """Pinned per-key spec: sha1 -> top-10-bit register, rho = leading
    zeros of the 54-bit suffix + 1 (55 for an all-zero suffix)."""
    h = int.from_bytes(hashlib.sha1(key.encode()).digest()[:8], "big")
    reg = h >> _W_BITS
    w = h & ((1 << _W_BITS) - 1)
    rho = _W_BITS + 1 if w == 0 else _W_BITS - w.bit_length() + 1
    return reg, rho


def hll_estimate(regs) -> int:
    """Pinned estimate: raw HLL with the standard small-range linear
    counting correction; summation in ascending register order so the
    float result is bit-identical everywhere."""
    s = 0.0
    for j in range(HLL_M):
        s += 2.0 ** (-float(regs[j]))
    e = HLL_ALPHA * HLL_M * HLL_M / s
    v = sum(1 for j in range(HLL_M) if regs[j] == 0)
    if e <= 2.5 * HLL_M and v > 0:
        e = HLL_M * math.log(HLL_M / v)
    return int(math.floor(e + 0.5))


def approx_distinct_orders_hll(sf_dir: str):
    """Approximate distinct l_orderkey over lineitem.

    Engine shape: each batch folds its keys into a local 1024-register
    array (np.maximum.at) and emits only its nonzero (register, rho)
    maxima — <= 1024 rows per batch into the shuffle no matter how many
    input rows.  A single-block Arrow max-combine folds the partials
    (registers are key-domain-bounded by construction), and the
    bounded 1024-row table yields the estimate on the driver."""
    ds = ops.read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, np.int64)
        for k in t.column("l_orderkey").to_pylist():
            r, rho = hll_reg_rho(str(k))
            if rho > regs[r]:
                regs[r] = rho
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "reg": pa.array(nz.astype(np.int64), pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        out = t.group_by(["reg"]).aggregate([("rho", "max")])
        return out.rename_columns(
            ["rho" if c == "rho_max" else c for c in out.column_names]
        ).select(["reg", "rho"])

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )  # bounded: <= 1024 rows
    regs = np.zeros(HLL_M, np.int64)
    regs[folded["reg"].to_numpy(np.int64)] = folded["rho"].to_numpy(np.int64)
    est = hll_estimate(regs)
    return pa.table(
        {
            "m": pa.array([HLL_M], pa.int64()),
            "n_distinct_est": pa.array([est], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005) — point-frequency
# estimates with fixed state; the approximate sibling of freq.py's
# exact Misra-Gries heavy hitters.
# ---------------------------------------------------------------------------

CMS_D = 4        # hash rows
CMS_W = 2048     # counters per row
CMS_THRESHOLD = 900  # report terms whose estimate reaches this


def cms_cols(term: str) -> list[int]:
    """Pinned per-term spec: row i probes column
    sha1(f"{i}:{term}")[:8] big-endian mod CMS_W."""
    return [
        int.from_bytes(
            hashlib.sha1(f"{i}:{term}".encode()).digest()[:8], "big"
        ) % CMS_W
        for i in range(CMS_D)
    ]


def cms_estimate(matrix: np.ndarray, term: str) -> int:
    """Point query = min over the D probed counters (never
    underestimates the true count)."""
    return int(min(matrix[i, c] for i, c in enumerate(cms_cols(term))))


def cms_term_counts(sf_dir: str, threshold: int = CMS_THRESHOLD):
    """Approximate term-frequency heavy hitters over documents via a
    Count-Min sketch: every term whose CMS estimate reaches
    ``threshold``, with its estimate.  Estimates never undercount, so
    the result is a SUPERSET of the true >= threshold terms — the
    classic sketch trade, deterministic by pinned spec so the gate can
    hash it.

    Scale shape: CMS is a LINEAR sketch — per-batch local d x w
    matrices merge by plain cell addition in any partitioning/order,
    so the count pass shuffles at most d*w = 8192 cells per batch
    regardless of corpus size, and the fold result is BIT-identical to
    a sequential build (goldens.cms_golden is that twin).  The probe
    pass broadcasts the folded 64 KB matrix via ray.put and streams
    per-batch-distinct terms through it; candidate rows entering the
    final dedupe are bounded by the terms above threshold (plus sketch
    false positives), not the vocabulary."""
    import ray as _ray

    ds = ops.read_table(sf_dir, "documents", columns=["text"])
    term_re = _TERM_RE

    def local_cms(t: pa.Table) -> pa.Table:
        # count FIRST, hash per DISTINCT term: sketch addition is
        # linear, so adding a term's total count once is identical to
        # adding 1 per occurrence — 4 sha1 calls per vocab word instead
        # of per token (~10x less hash work on real text)
        from collections import Counter

        cnt: Counter[str] = Counter()
        for txt in t.column("text").to_pylist():
            cnt.update(
                w for w in term_re.findall(txt.lower()) if len(w) >= 3
            )
        m = np.zeros((CMS_D, CMS_W), np.int64)
        for w, c in cnt.items():
            for i, col in enumerate(cms_cols(w)):
                m[i, col] += c
        cells = np.nonzero(m.ravel())[0]
        return pa.table(
            {
                "cell": pa.array(cells.astype(np.int64), pa.int64()),
                "cnt": pa.array(m.ravel()[cells], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        out = t.group_by(["cell"]).aggregate([("cnt", "sum")])
        return out.rename_columns(
            ["cnt" if c == "cnt_sum" else c for c in out.column_names]
        ).select(["cell", "cnt"])

    folded = (
        ds.map_batches(local_cms, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )  # bounded: <= d*w = 8192 rows
    matrix = np.zeros(CMS_D * CMS_W, np.int64)
    matrix[folded["cell"].to_numpy(np.int64)] = folded["cnt"].to_numpy(np.int64)
    matrix = matrix.reshape(CMS_D, CMS_W)
    m_ref = _ray.put(matrix)

    def probe(t: pa.Table) -> pa.Table:
        m = _ray.get(m_ref)
        seen: set[str] = set()
        for txt in t.column("text").to_pylist():
            for w in term_re.findall(txt.lower()):
                if len(w) >= 3:
                    seen.add(w)
        hits = [(w, int(min(m[i, c] for i, c in enumerate(cms_cols(w)))))
                for w in sorted(seen)]
        hits = [(w, e) for w, e in hits if e >= threshold]
        return pa.table(
            {
                "term": pa.array([w for w, _ in hits], pa.string()),
                "est_count": pa.array([e for _, e in hits], pa.int64()),
            }
        )

    # candidates repeat across batches with identical estimates; a
    # bounded min-fold dedupes them (domain = terms above threshold)
    return ops.partial_sum_agg(
        ds.map_batches(probe, batch_format="pyarrow"),
        keys=["term"], sums={}, counts=None,
        mins={"est_count": "est_count"}, bounded=True,
    )


SKETCH_QUERIES = {
    "approx_distinct_orders_hll": approx_distinct_orders_hll,
    "cms_term_counts": cms_term_counts,
}

SKETCH_ORACLE_SQL = {
    # pinned golden from the plain-Python sequential twin
    # (spider_ray.goldens.hll_golden) — valid for the gate's sf0.01
    "approx_distinct_orders_hll": golden_sql(
        "approx_distinct_orders_hll", "m, n_distinct_est"
    ),
    # linear-sketch twin: goldens.cms_golden builds the identical
    # matrix sequentially (merge of a linear sketch is exact under any
    # partitioning, so engine == sequential bit-for-bit)
    "cms_term_counts": golden_sql("cms_term_counts", "term, est_count"),
}
