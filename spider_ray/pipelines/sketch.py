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

import numpy as np
import pyarrow as pa

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


SKETCH_QUERIES = {
    "approx_distinct_orders_hll": approx_distinct_orders_hll,
}

SKETCH_ORACLE_SQL = {
    # pinned golden from the plain-Python sequential twin
    # (spider_ray.goldens.hll_golden) — valid for the gate's sf0.01
    "approx_distinct_orders_hll": golden_sql(
        "approx_distinct_orders_hll", "m, n_distinct_est"
    ),
}
