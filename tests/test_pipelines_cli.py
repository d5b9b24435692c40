"""Pipelines CLI: --list enumerates the full registry (the ray-owning
run path is exercised manually / by the verify recipe — pytest must
not spawn a second heavy ray session next to the fixture's)."""

import subprocess
import sys


def test_list_matches_registry():
    out = subprocess.run(
        [sys.executable, "-m", "spider_ray.pipelines", "--list"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout.split()
    import __ray_entry__ as e

    assert sorted(out) == sorted(e.queries())
    assert "minhash_lsh_pairs" in out


def test_unknown_query_is_an_error():
    p = subprocess.run(
        [sys.executable, "-m", "spider_ray.pipelines", "nope",
         "--out", "/tmp/never"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 2
    assert "unknown pipeline" in p.stderr
