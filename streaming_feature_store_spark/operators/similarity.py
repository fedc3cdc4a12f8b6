"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (BASELINE.json north star):

- **brute-force cosine top-k** — the exact baseline: broadcast the query
  set, one pass over the corpus, per-query top-k via window rank. Cost is
  O(corpus × queries); correct at any scale where queries are few.
- **LSH-bucketed top-k** — random-hyperplane (sign) LSH with deterministic
  planes derived from xxhash64, so the index is reproducible with no stored
  state. Candidates = same bucket (multi-probe: Hamming-1 neighbors), then
  exact cosine on candidates only. This is the 100 TB path: the corpus is
  bucketed once (narrow projection), and each query touches ~corpus/2^bits.

Dot products use double-precision sequential folds over the array columns
(higher-order functions, JVM codegen) — deterministic and UDF-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import broadcast


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def as_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    """float32 → float64 once at the edge so all arithmetic is double."""
    return df.withColumn(col, F.transform(F.col(col), lambda x: x.cast("double")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (small side); rank window partitions by query id —
    the only shuffle is the top-k rank, sized |corpus|·|queries|.
    """
    # norms hoisted to one projection per side — computing them inside the
    # pair expression re-evaluates each corpus norm |queries| times and each
    # query norm |corpus| times
    c = as_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    q = as_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("cvec"), F.col("qvec")) / (F.col("cn") * F.col("qn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def _hyperplane(dim: int, plane: int, table: int = 0) -> Column:
    """Deterministic pseudo-random hyperplane as a LITERAL array: component d
    of plane p derives from sha256(plane‖d), computed driver-side once.
    Stateless and reproducible everywhere; evaluating 512 hash expressions
    per data row (the naive expression form) measured ~15 s on 500 vectors —
    literals make the plane free."""
    import hashlib

    comps = []
    for d in range(dim):
        h = int.from_bytes(
            hashlib.sha256(f"t{table}:plane{plane}:{d}".encode()).digest()[:8], "big"
        )
        comps.append(F.lit((h % 2001 - 1000) / 1000.0))
    return F.array(*comps)


def lsh_buckets(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: int = 0,
) -> DataFrame:
    """Sign-LSH bucket id per vector (bits hyperplanes → int bucket), for
    one hash table (``table`` seeds an independent plane set)."""
    d = as_double_vec(df, vec_col)
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        s = _dot(F.col(vec_col), _hyperplane(dim, b, table))
        bucket = bucket + F.when(s > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return d.withColumn("bucket", bucket)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in ANY of
    ``tables`` independent sign-LSH tables (plus Hamming-1 probes per
    table); exact cosine on the deduped candidate set only.

    The classic LSH-forest recall/cost dial: recall ≈ 1−(1−p^bits)^(tables·
    (1+bits)) for per-plane agreement p. One table suffices for tightly
    clustered embedding spaces; uniform-ish spaces need several (recall on
    planted ε-neighbors in a uniform 100k corpus: 0 % with 1×12-bit table,
    covered by tables=4 — tools/scale_dedup_probe.py)."""

    def tagged(df, side):
        parts = []
        for t in range(tables):
            b = lsh_buckets(df, dim, bits, id_col, vec_col, table=t)
            parts.append(
                b.select(
                    F.col(id_col), F.col(vec_col), F.lit(t).alias("tbl"), "bucket"
                )
            )
        out = parts[0]
        for x in parts[1:]:
            out = out.unionByName(x)
        return out

    c = tagged(corpus, "c").select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("cvec"),
        "tbl",
        "bucket",
    )
    qt = tagged(queries, "q")
    # multi-probe per table: exact bucket + all Hamming-1 variants
    probes = qt.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "tbl",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << b).cast("long"))
                    for b in range(bits)
                ],
            )
        ).alias("bucket"),
    )
    cands = (
        c.join(broadcast(probes.select("query_id", "tbl", "bucket")), ["tbl", "bucket"])
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id")
        .distinct()
    )
    cvecs = as_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    qv = as_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        cands.join(cvecs, "nbr_id")
        .join(broadcast(qv), "query_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("cvec"), F.col("qvec")) / (F.col("cn") * F.col("qn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
