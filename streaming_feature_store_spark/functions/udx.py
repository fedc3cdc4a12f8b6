"""User-extension surface: the three Python extension points SURVEY §2.8
maps onto Spark (the reference hard-codes all logic; these are the hooks a
user of THIS engine extends it through).

- scalar ``pandas_udf`` — Series→Series Arrow kernels (the similarity /
  multimodal operators ship several; nothing to add here).
- **grouped-agg** ``pandas_udf`` — a custom aggregate usable in
  ``groupBy().agg(...)`` and over windows: ``mad_udf()`` (median absolute
  deviation), the robust dispersion measure the drift/outlier family
  lacks as a builtin.
- **Python UDTF** (``@udtf``, Spark 3.5+) — one input row → many output
  rows with arbitrary Python per row: ``chunk_text_udtf()``, the
  imperative twin of the codegen chunker ``curation.chunk_documents``
  (tested equal). The codegen form is the production path — the UDTF
  exists so custom row-expanding logic that CANNOT be expressed as
  sequence/explode (e.g. a real tokenizer) has a template with the same
  contract.

Factory functions, not module-level decorators: pandas_udf/udtf parse
their DDL return types against the ACTIVE session, so decorating at import
time would require a SparkSession before this module loads.

UDFs are the slow path (Arrow batch transfer, Python workers): everything
here is deliberately OPTIONAL surface; every hot-path operator in this
engine stays in codegen.
"""

from __future__ import annotations

import pandas as pd


def mad_udf():
    """Grouped-agg pandas UDF: median absolute deviation
    median(|x − median(x)|) — robust to the outliers that wreck
    stddev-based gates; null-skipping like SQL aggs.

    Works in ``groupBy(...).agg(mad("value"))`` and as a window aggregate.
    Scale note: each group's values come to one Python worker as Arrow
    batches — fine for per-entity groups; for a single global MAD at table
    scale use the two-pass percentile form instead.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        x = v.dropna()
        if x.empty:
            # SQL-agg semantics: empty/all-null group yields NULL, not NaN
            # (NaN compares/join-matches differently downstream — ADVICE r3)
            return None
        med = x.median()
        return float((x - med).abs().median())

    return mad


def chunk_text_udtf():
    """Python UDTF class: emit overlapping fixed-size token windows for one
    document per input row (identical contract to the codegen chunker —
    asserted in tests/test_udx.py — minus the id column, which the caller
    carries via ``lateralJoin`` / ``TABLE()`` syntax)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_chunk_tokens int")
    class ChunkText:
        def eval(self, text: str, chunk_size: int, stride: int):
            if text is None:
                return
            toks = text.split(" ")
            for idx, start in enumerate(range(0, len(toks), stride)):
                chunk = toks[start : start + chunk_size]
                if chunk:
                    yield idx, " ".join(chunk), len(chunk)

    return ChunkText
