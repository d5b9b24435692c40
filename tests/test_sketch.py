"""HLL sketch: spec-level tests (no Ray) + the error-bound property
that makes an approximate operator trustworthy."""

import duckdb
import numpy as np

from spider_ray.pipelines.sketch import (
    HLL_M,
    hll_estimate,
    hll_reg_rho,
)


def test_reg_rho_ranges():
    for k in ["", "a", "http://x.example/", "12345"]:
        reg, rho = hll_reg_rho(k)
        assert 0 <= reg < HLL_M
        assert 1 <= rho <= 55


def test_estimate_monotone_in_registers():
    lo = hll_estimate([1] * HLL_M)
    hi = hll_estimate([5] * HLL_M)
    assert hi > lo > 0


def test_error_bound_synthetic():
    # fold 50k synthetic keys sequentially; HLL with m=1024 has ~3.25%
    # std error — assert within 4 sigma (13%)
    n = 50_000
    regs = [0] * HLL_M
    for i in range(n):
        r, rho = hll_reg_rho(f"key-{i}")
        if rho > regs[r]:
            regs[r] = rho
    est = hll_estimate(regs)
    assert abs(est - n) / n < 0.13


def test_matches_exact_within_bound_on_fixture():
    con = duckdb.connect()
    exact = con.execute(
        "SELECT count(DISTINCT l_orderkey) FROM "
        "read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
    ).fetchone()[0]
    keys = con.execute(
        "SELECT l_orderkey FROM "
        "read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
    ).df()["l_orderkey"]
    regs = np.zeros(HLL_M, np.int64)
    for k in keys:
        r, rho = hll_reg_rho(str(k))
        if rho > regs[r]:
            regs[r] = rho
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.13
