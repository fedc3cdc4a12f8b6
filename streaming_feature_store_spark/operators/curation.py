"""Corpus curation pipeline — the composition a training-data run actually
executes, end to end: exact dedup → near-dup removal → quality gate.

Each stage is one of the already-oracled primitives (dedup_exact,
dedup_survivors/jaccard_pairs, quality thresholds), composed in the fixed
order every large-scale curation pipeline uses:

1. **exact dedup first** — identical bytes are the cheapest to kill and
   doing it first shrinks every later stage's input (keep the lowest-id
   copy per md5 fingerprint);
2. **near-dup removal on the survivors** — pair detection never re-scores
   pairs of identical documents (they are already collapsed), so the
   inverted index is built over unique texts only;
3. **quality gate last** — token-count bounds and stopword-ratio cap
   (the reference point for thresholds is q20's definition), cheap
   per-row predicates that need no cross-row state.

Plan shape: stage 1 is one keyed shuffle on the 16-byte fingerprint;
stage 2 is the documented inverted-index/pair machinery plus a broadcast
anti-join; stage 3 is a codegen filter. The corpus text is shuffled
exactly once (stage 1); stages 2-3 move ids and grams only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from streaming_feature_store_spark.operators.dedup import (
    dedup_exact,
    dedup_survivors,
)


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    jaccard_threshold: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
) -> DataFrame:
    """The curated corpus: rows of ``df`` that survive exact dedup,
    near-dup removal (shingle-Jaccard ≥ ``jaccard_threshold`` drops the
    higher id), and the quality gate. Returns the surviving rows with
    their original columns plus ``n_tokens``."""
    uniq = dedup_exact(df, text_col, id_col)
    survivors = dedup_survivors(
        uniq, text_col, id_col, n=n, threshold=jaccard_threshold
    )
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    stop_ratio = F.size(
        F.filter(toks, lambda x: (x == "the") | (x == "a"))
    ) / n_tokens.cast("double")
    return (
        survivors.withColumn("n_tokens", n_tokens)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (stop_ratio < max_stopword_ratio)
        )
    )
