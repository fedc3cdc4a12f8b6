"""Synthesize a larger scale factor by replicating /root/testdata/sf0.1
with consistent key shifts — the sf1.0 scaling-checkpoint input
(VERDICT r5 "next" #8). The rig has no network (DuckDB's tpch extension
cannot download) and /root/testdata is read-only, so scale-up data is
derived, not regenerated, and lands under /tmp.

Referential integrity is preserved per replica: every key column of
replica ``r`` is shifted by ``r * stride(table)``, with the SAME stride
used on both sides of each foreign key (orders.o_custkey moves with
customer.c_custkey, lineitem.l_orderkey with orders.o_orderkey, ...).
region/nation are fixed dims and copied once.

Content perturbation keeps the derived corpus honest for scaling
measurement (timing only — correctness gates stay at sf0.01):

- documents: replica r>0 prefixes every token with ``r{r}_`` so
  cross-replica shingles never collide — otherwise every doc would gain
  9 exact near-dup twins and the dedup queries would measure quadratic
  OUTPUT growth (45 pairs per 10-doc clone group) instead of plan cost.
  Within-replica structure is byte-identical to sf0.1.
- embeddings: replica r>0 adds deterministic per-row Gaussian noise
  (sigma=0.5) so cross-replica cosine drops below near-dup thresholds;
  within-replica geometry is unchanged.

Usage: python tools/make_sf_big.py [out_dir] [replicas]
(default /tmp/sf1.0, 10 -> ~6 M lineitem rows = TPC-H sf1-ish)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'"
        )

    def stride(table, key):
        return con.execute(
            f"SELECT max({key}) + 1 FROM {table}"
        ).fetchone()[0]

    ck = stride("customer", "c_custkey")
    sk = stride("supplier", "s_suppkey")
    pk = stride("part", "p_partkey")
    ok = stride("orders", "o_orderkey")
    ek = stride("events", "event_id")
    dk = stride("documents", "doc_id")
    # events.user_id is a CUSTOMER key (the events->customer/orders joins
    # in q14/q33/q34/q96 use it against c_custkey/o_custkey), so it must
    # shift by the CUSTOMER stride — shifting by its own max+1 would
    # alias every replica's events onto replica-0's customers and starve
    # replicas 1..n-1 of events entirely.
    uk = ck

    def copy(sql, name):
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {n:,} rows", flush=True)

    rep = f"range({reps}) rt(r)"
    copy("SELECT * FROM region", "region")
    copy("SELECT * FROM nation", "nation")
    copy(
        f"SELECT c_custkey + r*{ck} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM customer, {rep}",
        "customer",
    )
    copy(
        f"SELECT s_suppkey + r*{sk} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM supplier, {rep}",
        "supplier",
    )
    copy(
        f"SELECT p_partkey + r*{pk} AS p_partkey, p_name, p_brand, "
        f"p_type, p_size, p_retailprice FROM part, {rep}",
        "part",
    )
    copy(
        f"SELECT o_orderkey + r*{ok} AS o_orderkey, "
        f"o_custkey + r*{ck} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM orders, {rep}",
        "orders",
    )
    copy(
        f"SELECT l_orderkey + r*{ok} AS l_orderkey, "
        f"l_partkey + r*{pk} AS l_partkey, "
        f"l_suppkey + r*{sk} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM lineitem, {rep}",
        "lineitem",
    )
    copy(
        f"SELECT event_id + r*{ek} AS event_id, ts, "
        f"user_id + r*{uk} AS user_id, event_type, value, props "
        f"FROM events, {rep}",
        "events",
    )
    copy(
        f"SELECT doc_id + r*{dk} AS doc_id, "
        f"CASE WHEN r = 0 THEN text ELSE "
        f"  'r' || r || '_' || replace(text, ' ', ' r' || r || '_') "
        f"END AS text, lang, source, "
        f"CASE WHEN r = 0 THEN n_chars ELSE "
        f"  length('r' || r || '_' || replace(text, ' ', ' r' || r || '_')) "
        f"END AS n_chars FROM documents, {rep}",
        "documents",
    )

    # embeddings: numpy noise path (list<float32> column)
    rows = con.execute(
        "SELECT vec_id, embedding, label FROM embeddings ORDER BY vec_id"
    ).fetchall()
    vk = max(r[0] for r in rows) + 1
    base = np.array([r[1] for r in rows], dtype=np.float32)
    ids, vecs, labels = [], [], []
    for r in range(reps):
        rng = np.random.default_rng(1000 + r)
        noisy = base if r == 0 else base + rng.normal(
            0, 0.5, base.shape
        ).astype(np.float32)
        ids.extend(int(row[0]) + r * vk for row in rows)
        labels.extend(int(row[2]) for row in rows)
        vecs.extend(noisy)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(ids):,} rows", flush=True)
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
