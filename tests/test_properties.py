"""Property-based tests (hypothesis): the distributed operators must agree
with trivially-correct pure-Python oracles on arbitrary small inputs —
stronger than the reference's fixed-assertion suites (SURVEY §5)."""

import pytest
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

from streaming_feature_store_spark.operators.asof import asof_join
from streaming_feature_store_spark.operators.sessions import sessionize
from streaming_feature_store_spark.operators.skew import salted_agg

# (entity, ts_us, value) tuples; small domains to force key collisions
EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=25,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(feats=EVENTS, labels=EVENTS)
@SLOW
@pytest.mark.slow
def test_asof_matches_naive(spark, feats, labels):
    fdf = spark.createDataFrame(
        [(k, t, i, float(v)) for i, (k, t, v) in enumerate(feats)],
        "user_id long, us long, event_id long, fval double",
    )
    ldf = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t, _) in enumerate(labels)],
        "user_id long, us long, event_id long",
    )
    got = {
        r["label_key"]: r["asof_fval"]
        for r in asof_join(ldf, fdf, "user_id", "us", "us", ["fval"], [], "event_id").collect()
    }
    # naive oracle: latest feature (ts, then insertion id) at or before label ts
    for i, (k, t, _) in enumerate(labels):
        cands = [
            (ft, fi, float(fv))
            for fi, (fk, ft, fv) in enumerate(feats)
            if fk == k and ft <= t
        ]
        want = max(cands)[2] if cands else None
        assert got[1000 + i] == want, (k, t, cands)


@given(events=EVENTS)
@SLOW
def test_sessionize_matches_gaps_and_islands(spark, events):
    gap_us = 1000
    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _) in enumerate(events)],
        "user_id long, us long, event_id long",
    ).withColumn("ts", F.timestamp_micros(F.col("us")))
    got = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in sessionize(df, "user_id", gap=f"{gap_us} microseconds").collect()
    )
    # naive oracle: sort per key, split when diff > gap (Spark merges at ==)
    want = []
    by_key: dict[int, list[int]] = {}
    for k, t, _ in events:
        by_key.setdefault(k, []).append(t)
    for k, ts in by_key.items():
        ts.sort()
        start, n, prev = ts[0], 0, None
        for t in ts:
            if prev is not None and t - prev > gap_us:
                want.append((k, start, n))
                start, n = t, 0
            n += 1
            prev = t
        want.append((k, start, n))
    assert got == sorted(want)


@given(events=EVENTS, buckets=st.integers(min_value=1, max_value=8))
@SLOW
@pytest.mark.slow
def test_salted_agg_matches_plain(spark, events, buckets):
    df = spark.createDataFrame(
        [(k, float(v)) for k, _, v in events], "user_id long, value double"
    )
    salted = {
        r["user_id"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in salted_agg(
            df,
            "user_id",
            {"n": ("count", "*"), "total": ("sum", "value"),
             "vmin": ("min", "value"), "vmax": ("max", "value")},
            salt_buckets=buckets,
        ).collect()
    }
    plain = {
        r["user_id"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in df.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert salted == plain


@given(feats=EVENTS, labels=EVENTS)
@SLOW
@pytest.mark.slow
def test_asof_forward_matches_naive(spark, feats, labels):
    fdf = spark.createDataFrame(
        [(k, t, i, float(v)) for i, (k, t, v) in enumerate(feats)],
        "user_id long, us long, event_id long, fval double",
    )
    ldf = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t, _) in enumerate(labels)],
        "user_id long, us long, event_id long",
    )
    got = {
        r["label_key"]: r["asof_fval"]
        for r in asof_join(
            ldf, fdf, "user_id", "us", "us", ["fval"], [],
            "event_id", direction="forward",
        ).collect()
    }
    # naive oracle: earliest feature (ts, then insertion id) at or after
    # the label ts for the same entity
    for i, (k, t, _) in enumerate(labels):
        cands = [
            (ft, fi, float(fv))
            for fi, (fk, ft, fv) in enumerate(feats)
            if fk == k and ft >= t
        ]
        expect = min(cands)[2] if cands else None
        assert got[1000 + i] == expect, (k, t, cands)


@given(events=EVENTS)
@SLOW
def test_interpolate_linear_matches_naive(spark, events):
    from streaming_feature_store_spark.operators.windows import (
        interpolate_linear,
    )

    # every third insertion id carries a reading (mirrors q128/q134 carve)
    rows = [
        (k, t, i, float(v) if i % 3 == 0 else None)
        for i, (k, t, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, us long, event_id long, reading double"
    )
    got = {
        r["event_id"]: r["reading_interp"]
        for r in interpolate_linear(df, "user_id").collect()
    }
    # naive oracle over the per-entity (us, event_id) order
    by_key = {}
    for k, t, i, v in rows:
        by_key.setdefault(k, []).append((t, i, v))
    for k, seq in by_key.items():
        seq.sort()
        for pos, (t, i, v) in enumerate(seq):
            if v is not None:
                want = v
            else:
                prevs = [
                    (pt, pv) for pt, _, pv in seq[:pos] if pv is not None
                ]
                nexts = [
                    (nt, nv) for nt, _, nv in seq[pos + 1:] if nv is not None
                ]
                if not prevs and not nexts:
                    want = None
                elif not prevs:
                    want = nexts[0][1]
                elif not nexts:
                    want = prevs[-1][1]
                else:
                    (pt, pv), (nt, nv) = prevs[-1], nexts[0]
                    want = pv if nt == pt else pv + (nv - pv) * (t - pt) / (nt - pt)
            if want is None:
                assert got[i] is None, (k, t, i)
            else:
                assert got[i] is not None and abs(got[i] - want) < 1e-9, (
                    k, t, i, got[i], want,
                )


@given(events=EVENTS, k=st.integers(min_value=1, max_value=5))
@SLOW
def test_weighted_sample_is_topk_by_priority(spark, events, k):
    import hashlib

    from streaming_feature_store_spark.operators.curation import (
        weighted_priority_sample,
    )

    rows = [
        (i, k_ % 2, abs(v) + 1.0) for i, (k_, _, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, grp int, w double")
    got = {
        (r["grp"], r["event_id"]): r["samp_rank"]
        for r in weighted_priority_sample(
            df, k, "w", "event_id", "grp"
        ).collect()
    }

    def prio(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return w / ((h + 1.0) / 4294967296.0)

    by_grp = {}
    for i, g, w in rows:
        by_grp.setdefault(g, []).append((prio(i, w), -i))
    want = {}
    for g, ps in by_grp.items():
        ps.sort(reverse=True)
        for rank, (_, negi) in enumerate(ps[:k], 1):
            want[(g, -negi)] = rank
    assert got == want


WORDS = st.lists(
    st.text(alphabet="abcd", min_size=0, max_size=6),
    min_size=1,
    max_size=12,
)


@given(words=WORDS, k=st.integers(min_value=1, max_value=2))
@SLOW
@pytest.mark.slow
def test_edit_distance_pairs_matches_brute_force(spark, words, k):
    """SymSpell deletion-key blocking must find EXACTLY the pairs the
    quadratic levenshtein join finds — blocking is a completeness
    optimization, never a semantics change."""
    from streaming_feature_store_spark.operators.text import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame([(w,) for w in words], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, "name", max_dist=k).collect()
    }

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    vocab = sorted(set(words))
    want = {
        (a, b, lev(a, b))
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if 0 < lev(a, b) <= k
    }
    assert got == want


GRAPHS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=15,
)


@given(edges=GRAPHS, iters=st.integers(min_value=1, max_value=4))
@SLOW
@pytest.mark.slow
def test_pagerank_conserves_mass_and_matches_naive(spark, edges, iters):
    """Total rank mass must stay exactly 1 (±FP) every configuration, and
    the distributed fixed point must match a dict-based reference
    implementation of the same recurrence."""
    from streaming_feature_store_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, "src", "dst", weight="w", iterations=iters
        ).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # naive oracle in plain dicts
    out_w: dict = {}
    for s, d, w in edges:
        out_w.setdefault(s, {})
        out_w[s][d] = out_w[s].get(d, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(rank[v] for v in nodes if v not in out_w)
        contrib = {v: 0.0 for v in nodes}
        for s, outs in out_w.items():
            tot = sum(outs.values())
            for d, w in outs.items():
                contrib[d] += rank[s] * (w / tot)
        rank = {
            v: (1.0 - 0.85) / n + 0.85 * (contrib[v] + dm / n)
            for v in nodes
        }
    assert set(got) == set(rank)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])


PAIR_LISTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=30,
)


@given(pairs=PAIR_LISTS)
@SLOW
@pytest.mark.slow
def test_dedup_clusters_both_paths_match_transitive_closure(spark, pairs):
    """Both physical strategies — the driver union-find fast path AND the
    distributed min-label/pointer-jumping loop (forced with
    driver_threshold=0) — must label every node with the minimum id
    reachable from it, exactly as brute-force transitive closure does."""
    from streaming_feature_store_spark.operators.dedup import dedup_clusters

    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc_a long, doc_b long"
    )

    # brute-force oracle: repeated relaxation until fixpoint
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    label = {v: v for v in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            lo = min(label[a], label[b])
            if label[a] != lo or label[b] != lo:
                label[a] = label[b] = lo
                changed = True
    want = set(label.items())

    for thresh in (200_000, 0):
        got = {
            (r["node"], r["cluster_id"])
            for r in dedup_clusters(
                df, driver_threshold=thresh
            ).collect()
        }
        assert got == want, (thresh, sorted(got ^ want))


DOCS = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=14
    ),
    min_size=2,
    max_size=6,
)


@given(docs=DOCS, thr=st.sampled_from([0.3, 0.5, 0.9]))
@SLOW
@pytest.mark.slow
def test_winnow_containment_matches_quadratic(spark, docs, thr):
    """The inverted-index pair join must produce EXACTLY the pairs and
    scores of quadratic containment over per-doc fingerprint sets, and
    the fingerprint sets themselves must match a line-by-line Python
    replica of the winnowing algorithm (md5 grams, window minima) —
    including the guarantee that any shared token run of >= w+k-1 leaves
    a common fingerprint."""
    import hashlib

    from streaming_feature_store_spark.operators.text import (
        _winnow_sel,
        winnow_containment_pairs,
    )

    k, w = 2, 2
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )

    def py_winnow(toks):
        grams = [
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
            for i in range(len(toks) - k + 1)
        ]
        return {
            min(grams[p : p + w]) for p in range(len(grams) - w + 1)
        }

    want_fps = {i: py_winnow(toks) for i, toks in enumerate(docs)}

    got_fps: dict[int, set] = {i: set() for i in want_fps}
    for r in _winnow_sel(df, "text", "doc_id", k, w).collect():
        got_fps[r["doc_id"]].add(r["sel"])
    assert got_fps == want_fps

    # winnowing guarantee on the replica the engine just matched
    for i, ta in enumerate(docs):
        for j in range(i + 1, len(docs)):
            tb = docs[j]
            run = w + k - 1
            shares_run = any(
                ta[p : p + run] == tb[q : q + run]
                for p in range(len(ta) - run + 1)
                for q in range(len(tb) - run + 1)
            )
            if shares_run:
                assert want_fps[i] & want_fps[j], (i, j)

    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["containment"])
        for r in winnow_containment_pairs(
            df, k=k, w=w, threshold=thr
        ).collect()
    }
    want = {}
    for i in want_fps:
        for j in want_fps:
            if i < j and want_fps[i] and want_fps[j]:
                shared = len(want_fps[i] & want_fps[j])
                c = shared / min(len(want_fps[i]), len(want_fps[j]))
                if c >= thr:
                    want[(i, j)] = (shared, round(c, 6))
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z", "w", "v"]),
            min_size=4,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    ),
    n_dups=st.integers(min_value=1, max_value=3),
)
@SLOW
@pytest.mark.slow
def test_minhash_guarantees_exact_duplicates_and_verified_scores(
    spark, docs, n_dups
):
    """Two structural guarantees of the LSH pipeline, on arbitrary
    corpora: (1) a planted EXACT duplicate is ALWAYS reported — identical
    shingle sets give identical minhash signatures, so the pair shares
    every band and cannot be missed; (2) every reported pair's jaccard
    equals the brute-force shingle Jaccard and clears the threshold —
    the exact-verify stage admits no false positive."""
    from streaming_feature_store_spark.operators.dedup import (
        minhash_near_dups,
    )

    n = 3
    texts = [" ".join(t) for t in docs]
    # plant exact duplicates of the first n_dups docs (cycling)
    planted = []
    rows = [(i, t) for i, t in enumerate(texts)]
    for j in range(n_dups):
        src = j % len(texts)
        dup_id = 100 + j
        rows.append((dup_id, texts[src]))
        planted.append((src, dup_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_dups(
            df, n=n, threshold=0.5
        ).collect()
    }

    def shingles(t):
        toks = t.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sets = {i: shingles(t) for i, t in rows}
    # (1) planted exact dups always found (their docs have >= 1 shingle
    # at min_size 4 >= n)
    for a, b in planted:
        lo, hi = min(a, b), max(a, b)
        assert (lo, hi) in got, (lo, hi, sorted(got))
        assert got[(lo, hi)] == 1.0
    # (2) no false positives; scores exact
    for (a, b), j in got.items():
        sa, sb = sets[a], sets[b]
        true_j = len(sa & sb) / len(sa | sb)
        assert round(true_j, 6) == j and true_j >= 0.5, (a, b, j, true_j)


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-3, max_value=3),
            min_size=4,
            max_size=4,
        ).filter(lambda v: any(v)),
        min_size=2,
        max_size=10,
    ),
    k=st.integers(min_value=1, max_value=3),
)
@SLOW
@pytest.mark.slow
def test_cosine_topk_matches_numpy(spark, vecs, k):
    """Both exact cosine kernels — the codegen expression form
    (cosine_topk) and the Arrow GEMM form (cosine_topk_blas) — must
    produce the numpy brute-force neighbor ranking, including the
    rounded-score + id tiebreak discipline."""
    import numpy as np

    from streaming_feature_store_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_blas,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    mat = np.array(vecs, dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = (mat @ mat.T) / np.outer(norms, norms)

    def want_topk(q):
        cands = sorted(
            ((round(sims[q, j], 6), j) for j in range(len(vecs)) if j != q),
            key=lambda t: (-t[0], t[1]),
        )
        return [(j, s) for s, j in cands[:k]]

    got = {}
    for r in cosine_topk(df, df, k=k).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["nbr_id"], r["cosine"])
        )
    for q in range(len(vecs)):
        rows = sorted(got.get(q, []))
        assert [(n, s) for _, n, s in rows] == want_topk(q), (q, rows)

    got_blas = {}
    for r in cosine_topk_blas(df, k=k).collect():
        got_blas.setdefault(r["query_id"], []).append(
            (r["rank"], r["nbr_id"], r["cosine"])
        )
    for q in range(len(vecs)):
        rows = sorted(got_blas.get(q, []))
        assert [(n, s) for _, n, s in rows] == want_topk(q), (
            "blas", q, rows,
        )


@given(
    events=EVENTS,
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=2_000),
        ),
        min_size=1,
        max_size=10,
    ),
)
@SLOW
@pytest.mark.slow
def test_interval_join_matches_quadratic(spark, events, spans):
    """The equi-key + residual-range interval join must match the
    quadratic filter, including the half-open [start, end) boundaries."""
    from streaming_feature_store_spark.operators.enrich import interval_join

    ev = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _) in enumerate(events)],
        "user_id long, us long, event_id long",
    )
    sp = spark.createDataFrame(
        [(k, s, s + w, 500 + j) for j, (k, s, w) in enumerate(spans)],
        "span_user long, start_us long, end_us long, span_id long",
    )
    got = {
        (r["event_id"], r["span_id"])
        for r in interval_join(ev, sp, "user_id", "span_user").collect()
    }
    want = {
        (i, 500 + j)
        for i, (k, t, _) in enumerate(events)
        for j, (k2, s, w) in enumerate(spans)
        if k == k2 and s <= t < s + w
    }
    assert got == want


@given(
    feats=EVENTS,
    labels=EVENTS,
    tol=st.integers(min_value=0, max_value=5_000),
)
@SLOW
@pytest.mark.slow
def test_asof_tolerance_gates_per_column(spark, feats, labels, tol):
    """asof_join's tolerance must null out a value exactly when the row
    that SUPPLIED it is farther than tolerance_us — matching a naive
    per-label scan."""
    from streaming_feature_store_spark.operators.asof import asof_join

    fdf = spark.createDataFrame(
        [(k, t, i, float(v)) for i, (k, t, v) in enumerate(feats)],
        "user_id long, us long, event_id long, fval double",
    )
    ldf = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t, _) in enumerate(labels)],
        "user_id long, us long, event_id long",
    )
    got = {
        r["label_key"]: r["asof_fval"]
        for r in asof_join(
            ldf, fdf, "user_id", "us", "us", ["fval"], [],
            "event_id", tolerance_us=tol,
        ).collect()
    }
    for i, (k, t, _) in enumerate(labels):
        cands = [
            (ft, fi, float(fv))
            for fi, (fk, ft, fv) in enumerate(feats)
            if fk == k and ft <= t
        ]
        if not cands:
            want = None
        else:
            ft, fi, fv = max(cands)
            want = fv if (t - ft) <= tol else None
        assert got[1000 + i] == want, (i, k, t, tol, cands)


@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # entity
            st.integers(min_value=0, max_value=100), # ts
            st.integers(min_value=0, max_value=2),   # attr value
        ),
        min_size=1,
        max_size=20,
    ),
    collapse=st.booleans(),
)
@SLOW
def test_scd2_intervals_partition_time(spark, changes, collapse):
    """SCD2 invariants on arbitrary change logs: per entity the
    intervals are ordered, contiguous (valid_to == next valid_from),
    exactly one current row, and with collapse_unchanged the attr value
    differs between consecutive versions — all checked against a naive
    per-entity replay."""
    from streaming_feature_store_spark.operators.history import scd2_history

    df = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(changes)],
        "entity long, us long, event_id long, attr long",
    )
    rows = scd2_history(
        df, "entity", "us", ["attr"], collapse_unchanged=collapse
    ).collect()
    by_e: dict[int, list] = {}
    for r in rows:
        by_e.setdefault(r["entity"], []).append(r)

    # naive replay
    want: dict[int, list] = {}
    by_key: dict[int, list] = {}
    for i, (k, t, v) in enumerate(changes):
        by_key.setdefault(k, []).append((t, i, v))
    for k, evs in by_key.items():
        evs.sort()
        versions = []
        for t, i, v in evs:
            if collapse and versions and versions[-1][1] == v:
                continue
            versions.append((t, v))
        want[k] = versions

    assert set(by_e) == set(want)
    for k, vs in want.items():
        got = sorted(by_e[k], key=lambda r: (r["valid_from_us"], r["event_id"]))
        assert [(r["valid_from_us"], r["attr"]) for r in got] == vs
        # contiguity + exactly one current
        for a, b in zip(got, got[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
        assert [r["is_current"] for r in got].count(True) == 1
        assert got[-1]["is_current"] and got[-1]["valid_to_us"] is None


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # group
            st.integers(min_value=1, max_value=9),  # n tokens
        ),
        min_size=1,
        max_size=12,
    ),
    budget=st.integers(min_value=2, max_value=10),
)
@SLOW
def test_pack_sequences_offsets_match_scan(spark, docs, budget):
    """Packing placements must equal a sequential scan: start_offset is
    the sum of prior token counts in (group, id) order; first/last pack
    are the windows containing the document's first and last token."""
    from streaming_feature_store_spark.operators.curation import (
        pack_sequences,
    )

    rows = [
        (i, f"g{g}", " ".join(["w"] * n)) for i, (g, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["first_pack"],
            r["last_pack"], r["n_packs_spanned"],
        )
        for r in pack_sequences(df, budget=budget).collect()
    }
    offset: dict[str, int] = {}
    for i, (g, n) in enumerate(docs):  # ids ascend in generation order
        gname = f"g{g}"
        start = offset.get(gname, 0)
        first, last = start // budget, (start + n - 1) // budget
        assert got[i] == (n, start, first, last, last - first + 1), (
            i, got[i], (n, start, first, last),
        )
        offset[gname] = start + n


@given(
    series=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),    # day index
            st.integers(min_value=1, max_value=50),   # value
        ),
        min_size=1,
        max_size=30,
    ),
)
@SLOW
def test_cusum_matches_naive_recurrence(spark, series):
    """CUSUM must equal the textbook recurrence (cumulative deviation
    from the series mean) computed in Python over the daily aggregates,
    with the peak flag on the |CUSUM| argmax."""
    import datetime as dt

    from streaming_feature_store_spark.operators.drift import (
        cusum_changepoint,
    )

    base = dt.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [
            (base + dt.timedelta(days=d, hours=i % 24), float(v))
            for i, (d, v) in enumerate(series)
        ],
        "ts timestamp, value double",
    )
    got = {
        r["day"].isoformat(): (
            r["daily_metric"], r["deviation"], r["cusum"], r["is_peak"]
        )
        for r in cusum_changepoint(df, "ts", "value").collect()
    }
    daily: dict[int, float] = {}
    for d, v in series:
        daily[d] = daily.get(d, 0.0) + v
    days = sorted(daily)
    mean = sum(daily.values()) / len(days)
    run, want = 0.0, {}
    for d in days:
        run += daily[d] - mean
        key = (base + dt.timedelta(days=d)).date().isoformat()
        want[key] = (round(daily[d], 6), round(daily[d] - mean, 6) + 0.0,
                     round(run, 6) + 0.0)
    assert set(got) == set(want)
    peak = max(abs(c) for _, _, c in want.values())
    for k, (m, dev, c) in want.items():
        gm, gdev, gc, gpeak = got[k]
        assert (gm, gdev, gc) == (m, dev, c), (k, got[k], want[k])
        assert gpeak == (abs(c) == peak)


@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=20
    ),
    chunk_size=st.integers(min_value=1, max_value=6),
    stride=st.integers(min_value=1, max_value=6),
)
@SLOW
def test_chunk_documents_covers_every_token(spark, toks, chunk_size, stride):
    """Chunking invariants for any (size, stride): chunk i starts at
    i*stride and holds exactly the tokens [start, start+size); every
    token appears in at least one chunk; reconstruction from chunk 0's
    prefix + each subsequent chunk's tail equals the document when
    stride <= size."""
    from streaming_feature_store_spark.operators.curation import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(0, " ".join(toks))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(
            df, chunk_size=chunk_size, stride=stride
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    covered = set()
    for r in rows:
        start = r["chunk_idx"] * stride
        want = toks[start : start + chunk_size]
        assert r["chunk_text"].split(" ") == want, (r, want)
        assert r["n_chunk_tokens"] == len(want)
        covered.update(range(start, start + len(want)))
    if stride <= chunk_size:
        assert covered == set(range(len(toks)))


@given(
    n_pos=st.integers(min_value=50, max_value=120),
    n_neg=st.integers(min_value=50, max_value=120),
    seed=st.integers(min_value=0, max_value=5),
)
@SLOW
@pytest.mark.slow
def test_stratified_split_contracts(spark, n_pos, n_neg, seed):
    """The documented split contracts on arbitrary class balances:
    (1) the three splits partition the input exactly (disjoint ids,
    union = all); (2) the assignment is deterministic across calls;
    (3) it is STABLE under feature edits — recomputing a feature column
    moves no row between splits; (4) each label stratum lands near the
    requested fractions."""
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.ml.training import stratified_split

    rows = [(i, 1, float(i % 7)) for i in range(n_pos)] + [
        (1000 + i, 0, float(i % 5)) for i in range(n_neg)
    ]
    df = spark.createDataFrame(rows, "id long, label int, feat double")

    def ids(parts):
        return [
            {r["id"] for r in p.select("id").collect()} for p in parts
        ]

    a = ids(stratified_split(df, "label", seed=seed, id_cols=["id"]))
    all_ids = {r[0] for r in rows}
    assert a[0] | a[1] | a[2] == all_ids
    assert not (a[0] & a[1]) and not (a[0] & a[2]) and not (a[1] & a[2])

    b = ids(stratified_split(df, "label", seed=seed, id_cols=["id"]))
    assert a == b  # deterministic

    edited = df.withColumn("feat", F.col("feat") * 2 + 1)
    c = ids(stratified_split(edited, "label", seed=seed, id_cols=["id"]))
    assert a == c  # feature edits move no row

    for label, n in ((1, n_pos), (0, n_neg)):
        in_stratum = [
            len({i for i in s if (i < 1000) == (label == 1)}) / n
            for s in a
        ]
        for frac, want in zip(in_stratum, (0.6, 0.2, 0.2)):
            assert abs(frac - want) < 0.25, (label, in_stratum)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # entity
            st.integers(min_value=0, max_value=7200), # seconds offset
            st.sampled_from(["view", "click", "purchase", "signup", "error"]),
            st.integers(min_value=0, max_value=50),   # value
        ),
        min_size=1,
        max_size=25,
    ),
)
@SLOW
@pytest.mark.slow
def test_funnel_features_match_naive_sessions(spark, events):
    """funnel_features must agree with a naive gaps-and-islands replay:
    per-type counts, guarded conversion rate, decimal-exact value sum
    and session duration, for arbitrary event streams."""
    import datetime as dt

    from streaming_feature_store_spark.operators.sessions import (
        funnel_features,
    )

    base = dt.datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [
            (k, base + dt.timedelta(seconds=s), t, float(v))
            for k, s, t, v in events
        ],
        "user_id long, ts timestamp, event_type string, value double",
    )
    got = {
        (r["user_id"], r["session_start_us"]): r
        for r in funnel_features(df, "user_id", gap="30 minutes").collect()
    }

    # naive replay: sort per entity, split at gaps >= 1800 s
    by_key: dict[int, list] = {}
    for k, s, t, v in events:
        by_key.setdefault(k, []).append((s, t, v))
    want_count = 0
    for k, evs in by_key.items():
        evs.sort()
        sessions, cur = [], [evs[0]]
        for e in evs[1:]:
            if e[0] - cur[-1][0] >= 1800:
                sessions.append(cur)
                cur = [e]
            else:
                cur.append(e)
        sessions.append(cur)
        for sess in sessions:
            want_count += 1
            start_us = sess[0][0] * 1_000_000 + int(
                base.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
            )
            r = got[(k, start_us)]
            counts = {
                t: sum(1 for _, et, _ in sess if et == t)
                for t in ("view", "click", "purchase", "signup", "error")
            }
            assert r["n_events"] == len(sess)
            assert r["views"] == counts["view"]
            assert r["purchases"] == counts["purchase"]
            assert r["clicks"] == counts["click"]
            assert r["value_sum"] == sum(v for _, _, v in sess)
            assert r["conversion_rate"] == round(
                counts["purchase"] / max(counts["view"], 1), 6
            )
            assert r["session_minutes"] == round(
                (sess[-1][0] - sess[0][0]) / 60.0, 4
            )
    assert len(got) == want_count


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # stratum
            st.integers(min_value=0, max_value=500), # id
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=5),
)
@SLOW
@pytest.mark.slow
def test_sample_exact_per_group_quota_and_determinism(spark, rows, k):
    """Exact-quota sampling contracts: exactly min(k, |group|) rows per
    stratum, selection is the md5-of-id order prefix (engine-independent
    determinism), and repartitioning the input changes nothing."""
    import hashlib

    from streaming_feature_store_spark.operators.curation import (
        sample_exact_per_group,
    )

    df = spark.createDataFrame(rows, "g long, doc_id long")
    got = {
        (r["g"], r["doc_id"])
        for r in sample_exact_per_group(
            df, k, id_col="doc_id", strata_col="g"
        ).collect()
    }
    by_g: dict[int, list] = {}
    for g, i in rows:
        by_g.setdefault(g, []).append(i)
    want = set()
    for g, ids in by_g.items():
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        want.update((g, i) for i in ranked[:k])
    assert got == want
    got2 = {
        (r["g"], r["doc_id"])
        for r in sample_exact_per_group(
            df.repartition(7), k, id_col="doc_id", strata_col="g"
        ).collect()
    }
    assert got2 == got


# --- round-9 session-2 properties --------------------------------------------

_SESS_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # entity
        st.integers(min_value=0, max_value=2000),   # seconds offset
    ),
    min_size=1,
    max_size=30,
)


@given(base=_SESS_EVENTS, delta=_SESS_EVENTS, cut=st.integers(0, 2000),
       gap=st.integers(30, 400))
@SLOW
@pytest.mark.slow
def test_session_index_merge_matches_full_recompute(
    spark, base, delta, cut, gap
):
    """merge(sessions(base<cut), delta>=cut) ≡ sessions(all), for random
    event sets, random cutoffs and random gaps — including events landing
    EXACTLY one gap apart (the end-inclusive session_window boundary that
    broke the first draft) and exactly at the cutoff."""
    import datetime as dtm

    from streaming_feature_store_spark.operators.sessions import (
        session_index_merge,
        sessionize,
    )

    b0 = dtm.datetime(2024, 1, 1)
    rows = [
        (e, b0 + dtm.timedelta(seconds=s)) for e, s in base + delta
    ]
    cut_dt = b0 + dtm.timedelta(seconds=cut)
    base_rows = [(e, t) for e, t in rows if t < cut_dt]
    delta_rows = [(e, t) for e, t in rows if t >= cut_dt]
    schema = "user_id long, ts timestamp"
    all_df = spark.createDataFrame(rows, schema)
    gap_s = f"{gap} seconds"
    full = sessionize(all_df, "user_id", gap=gap_s)
    if not base_rows:
        idx = full.limit(0)
    else:
        idx = sessionize(
            spark.createDataFrame(base_rows, schema), "user_id", gap=gap_s
        )
    delta_df = (
        spark.createDataFrame(delta_rows, schema)
        if delta_rows
        else all_df.limit(0)
    )
    merged = session_index_merge(
        delta_df, idx, cut_dt.isoformat(sep=" "), "user_id", gap=gap_s
    )
    key = lambda df: sorted(
        (r["user_id"], r["n_events"], r["session_start_us"],
         r["session_end_us"])
        for r in df.collect()
    )
    assert key(merged) == key(full)


_CORPUS = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=10,
)


@given(corpus=_CORPUS, min_docs=st.integers(2, 4))
@SLOW
@pytest.mark.slow
def test_line_dedup_matches_naive(spark, corpus, min_docs):
    """line_dedup on random small corpora ≡ the obvious pure-Python
    screen: line survival is corpus-global, reassembly preserves order,
    counts are consistent."""
    from collections import defaultdict

    from streaming_feature_store_spark.operators.text import line_dedup

    docs = [(i, "\n".join(lines)) for i, lines in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_dedup(df, min_docs=min_docs).collect()}

    docs_per_line = defaultdict(set)
    for i, lines in enumerate(corpus):
        for ln in lines:
            docs_per_line[ln].add(i)
    boiler = {ln for ln, ds in docs_per_line.items() if len(ds) >= min_docs}
    for i, lines in enumerate(corpus):
        kept = [ln for ln in lines if ln not in boiler]
        assert got[i]["clean_text"] == "\n".join(kept)
        assert got[i]["n_lines"] == len(lines)
        assert got[i]["n_kept"] == len(kept)


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=2, max_size=60
    ),
    n_bins=st.integers(2, 8),
)
@SLOW
@pytest.mark.slow
def test_quantile_edges_match_naive(spark, vals, n_bins):
    """quantile_edges ≡ the sorted-list definition: edge_i = the element
    at 1-based position ceil(i*N/n_bins)."""
    from streaming_feature_store_spark.operators.drift import quantile_edges

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {r["i"]: r["edge"] for r in quantile_edges(df, "x", n_bins).collect()}
    s = sorted(vals)
    n = len(s)
    want = {
        i: float(s[(i * n + n_bins - 1) // n_bins - 1])
        for i in range(1, n_bins)
    }
    assert got == want


# --- round 10: corpus-statistics index merge algebra -------------------------

# small vocab + short docs to force term collisions across splits
DOCS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12),
    min_size=1,
    max_size=12,
)


@given(texts=DOCS, split=st.integers(min_value=1, max_value=11))
@SLOW
@pytest.mark.slow
def test_corpus_stats_merge_matches_full_and_python_oracle(
    spark, texts, split
):
    """merge(index(A), index(B)) == index(A ∪ B) for any disjoint split,
    and both equal a pure-Python count oracle."""
    from collections import Counter

    from streaming_feature_store_spark.operators.text import (
        corpus_stats_index,
        corpus_stats_index_merge,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.filter(F.col("doc_id") % 12 < split)
    b = df.filter(F.col("doc_id") % 12 >= split)
    merged = corpus_stats_index_merge(
        corpus_stats_index(a), corpus_stats_index(b)
    )
    got = {
        (r["kind"], r["term"]): r["n"] for r in merged.collect()
    }
    full = {
        (r["kind"], r["term"]): r["n"]
        for r in corpus_stats_index(df).collect()
    }
    assert got == full
    # pure-Python oracle (tokens = maximal alpha runs, lowercased)
    import re

    want: Counter = Counter()
    want[("docs", None)] = len(rows)
    for _, t in rows:
        toks = [w for w in re.sub(r"[^A-Za-z ]", " ", t or "").lower().split() if w]
        for w in set(toks):
            want[("df", w)] += 1
        for w in toks:
            want[("uni", w)] += 1
        for x, y in zip(toks, toks[1:]):
            want[("bi", f"{x} {y}")] += 1
    assert got == dict(want)


@given(texts=DOCS, split=st.integers(min_value=1, max_value=11))
@SLOW
@pytest.mark.slow
def test_postings_and_linefreq_merges_match_full(spark, texts, split):
    """Same merge algebra, the doc-keyed (postings) and distinct-doc
    (line frequency) variants: any disjoint split merges to the full
    build."""
    from streaming_feature_store_spark.operators.text import (
        line_freq_index,
        line_freq_index_merge,
        postings_index,
        postings_index_merge,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = df.filter(F.col("doc_id") % 12 < split)
    b = df.filter(F.col("doc_id") % 12 >= split)

    def canon(frame):
        return sorted(tuple(map(repr, r)) for r in frame.collect())

    pm = postings_index_merge(postings_index(a), postings_index(b))
    assert canon(pm) == canon(postings_index(df))
    lf = line_freq_index_merge(
        line_freq_index(a, line_sep=" "), line_freq_index(b, line_sep=" ")
    )
    assert canon(lf) == canon(line_freq_index(df, line_sep=" "))
