"""PageRank operator invariants (q136 carries the oracle gate)."""

import pytest

from streaming_feature_store_spark.operators.graph import pagerank


def test_pagerank_mass_conservation_and_ordering(spark):
    # star graph: everyone points at 'hub' -> hub must rank highest;
    # total mass stays 1 (dangling hub redistributes uniformly)
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("a", "b")],
        "src string, dst string",
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=6).collect()}
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
    assert out["hub"] == max(out.values())
    assert out["c"] == min(out.values())  # no in-links beyond teleport


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    out = [r["rank"] for r in pagerank(edges, iterations=3).collect()]
    assert all(r == pytest.approx(1.0 / 3.0, abs=1e-9) for r in out)


def test_pagerank_weight_bias(spark):
    # b receives 9x the weight a's other edge carries -> b outranks c
    edges = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank(edges, weight="w", iterations=8).collect()
    }
    assert out["b"] > out["c"]
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
