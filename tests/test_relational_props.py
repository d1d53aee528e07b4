"""Randomized reference-comparison tests for the round-3 relational /
text operators: distributed results must equal a straightforward
single-process pandas/numpy reference on arbitrary inputs."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from prclz_ray.stages import dedup as dd
from prclz_ray.stages import relational


def _ref_sessions(df: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    rows = []
    for uid, g in df.sort_values("ts").groupby("user_id"):
        ts = g["ts"].to_numpy()
        gaps = np.diff(ts.astype("datetime64[us]").astype(np.int64))
        new = np.r_[True, gaps > gap_sec * 1_000_000]
        sess = np.cumsum(new)
        for s in np.unique(sess):
            m = sess == s
            rows.append({
                "user_id": uid, "session_idx": int(s),
                "n_events": int(m.sum()),
                "start_ts": ts[m].min(), "end_ts": ts[m].max(),
            })
    return pd.DataFrame(rows)


def test_sessionize_matches_reference_on_random_stream():
    rng = np.random.default_rng(17)
    n = 3000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": base + rng.integers(0, 86_400_000_000 * 5, n)
        .astype("timedelta64[us]"),
    })
    got = relational.sessionize(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(7),
        "user_id", "ts", gap_sec=1800).to_pandas()
    want = _ref_sessions(df, 1800)
    key = ["user_id", "session_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got[key + ["n_events"]].to_numpy()
            == want[key + ["n_events"]].to_numpy()).all()
    assert (got["start_ts"].to_numpy() == want["start_ts"].to_numpy()).all()
    assert (got["end_ts"].to_numpy() == want["end_ts"].to_numpy()).all()


def test_paragraph_dedup_matches_reference_on_random_corpus():
    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    boiler = ["SHARE ME", "SUBSCRIBE"]
    docs = []
    for i in range(120):
        paras = [" ".join(rng.choice(vocab, 8))]  # unique-ish body
        if i % 4 == 0:
            paras.append(boiler[0])
        if i % 7 == 0:
            paras.append(boiler[1])
        if i % 11 == 0:
            paras.append(paras[0])  # self-duplicate body
        docs.append({"doc_id": i, "text": "\n\n".join(paras)})
    got = dd.paragraph_dedup_stats(rd.from_items(docs).repartition(5)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # reference
    from collections import Counter
    allp = Counter()
    for d in docs:
        allp.update(d["text"].split("\n\n"))
    ref = []
    for d in docs:
        ps = d["text"].split("\n\n")
        nd = sum(1 for p in ps if allp[p] >= 2)
        ref.append((d["doc_id"], len(ps), nd))
    assert [(int(r.doc_id), int(r.n_paras), int(r.n_dup_paras))
            for r in got.itertuples()] == ref


def test_grouped_quantile_random_uniform_keys():
    import duckdb
    rng = np.random.default_rng(31)
    n = 5000
    tbl = pa.table({"k": pa.array(rng.integers(0, 12, n), type=pa.int64()),
                    "v": pa.array(rng.standard_normal(n) * 100)})
    got = relational.grouped_quantile_disc(
        rd.from_arrow(tbl).repartition(9), "k", "v",
        qs=[0.25, 0.5, 0.75], bins=64)
    want = duckdb.connect().execute(
        "SELECT k, quantile_disc(v, 0.25) p25, quantile_disc(v, 0.5) p50, "
        "quantile_disc(v, 0.75) p75 FROM tbl GROUP BY k ORDER BY k").fetchdf()
    assert np.array_equal(got[["p25", "p50", "p75"]].to_numpy(),
                          want[["p25", "p50", "p75"]].to_numpy())


def test_grouped_corr_matches_duckdb_on_random():
    import duckdb
    rng = np.random.default_rng(7)
    n = 20000
    k = rng.integers(0, 6, n)
    x = rng.standard_normal(n) * 10 + 50
    y = 3 * x + rng.standard_normal(n) * 25
    tbl = pa.table({"k": pa.array(k, type=pa.int64()),
                    "x": pa.array(x), "y": pa.array(y)})
    got = relational.grouped_corr(rd.from_arrow(tbl).repartition(8),
                                  "k", "x", "y")
    want = duckdb.connect().execute(
        "SELECT k, COUNT(*) n, ROUND(corr(x,y),4) c FROM tbl "
        "GROUP BY k ORDER BY k").fetchdf()
    assert list(got["n"]) == list(want["n"])
    assert list(got["corr"]) == list(want["c"])


def test_bloom_semi_join_selective_and_exact():
    """Bloom prefilter must drop non-matching rows pre-shuffle and the
    final result must equal the exact semi join (false positives gone)."""
    from prclz_ray.stages import sketches
    big = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(5000), type=pa.int64()),
        "v": pa.array(np.arange(5000) * 2)})).repartition(6)
    keys = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 5000, 100), type=pa.int64())}))
    got = sketches.bloom_semi_join(big, keys, on="k").to_pandas()
    assert sorted(got["k"]) == list(range(0, 5000, 100))
    assert (got.sort_values("k")["v"].to_numpy()
            == np.arange(0, 5000, 100) * 2).all()


def test_grouped_top_n_ties_and_small_groups():
    from prclz_ray.stages import relational
    rows = [
        {"g": "a", "id": 1, "x": 10.0}, {"g": "a", "id": 2, "x": 10.0},
        {"g": "a", "id": 3, "x": 5.0}, {"g": "a", "id": 4, "x": 20.0},
        {"g": "b", "id": 5, "x": 1.0},
    ]
    out = relational.grouped_top_n(
        rd.from_items(rows).repartition(3), key_col="g", order_col="x",
        n=2, id_col="id").to_pandas().sort_values(["g", "rnk"]) \
        .reset_index(drop=True)
    # a: 20 (id4) then the x=10 tie resolves to min id (id1); b: singleton
    assert list(out.g) == ["a", "a", "b"]
    assert list(out.id) == [4, 1, 5]
    assert list(out.rnk) == [1, 2, 1]


def test_sliding_window_contains_each_event_r_times():
    from prclz_ray.stages import relational
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [{"user_id": 1, "ts": base + np.timedelta64(i * 613, "s"),
             "value": 1.0} for i in range(50)]
    out = relational.sliding_window_aggregate(
        rd.from_items(rows).repartition(4), "user_id", "ts", "value",
        window_sec=3600, slide_sec=900).to_pandas()
    # every event appears in exactly window/slide = 4 windows
    assert out["n_events"].sum() == 50 * 4
    # window membership is correct: event at t is inside [w, w+3600)
    epochs = np.array([(r["ts"] - np.datetime64(0, "s"))
                       / np.timedelta64(1, "s") for r in rows])
    for w, cnt in zip(out["window_start"], out["n_events"]):
        inside = ((epochs >= w) & (epochs < w + 3600)).sum()
        assert cnt == inside


def test_running_aggregate_matches_pandas_window():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "cents": rng.integers(1, 5_000, n).astype(np.int64),
    })
    out = relational.running_aggregate(
        rd.from_pandas(df).repartition(6), key_col="user_id",
        ts_col="ts", order_col="event_id", value_col="cents",
        num_buckets=4).to_pandas().sort_values("event_id")
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    g = ref.groupby("user_id", sort=False)
    ref["running_n"] = g.cumcount() + 1
    ref["running_sum"] = g["cents"].cumsum()
    ref = ref.sort_values("event_id")
    assert (out["running_n"].to_numpy()
            == ref["running_n"].to_numpy()).all()
    assert (out["running_sum"].to_numpy()
            == ref["running_sum"].to_numpy()).all()


def test_pivot_counts_matches_crosstab():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "prio": rng.choice(["hi", "mid", "lo"], 400),
        "status": rng.choice(["A", "B", "C", "D"], 400),
    })
    out = relational.pivot_counts(
        rd.from_pandas(df).repartition(5), row_col="prio",
        col_col="status", col_values=["A", "B", "Z"]).to_pandas() \
        .sort_values("prio").reset_index(drop=True)
    ct = pd.crosstab(df["prio"], df["status"])
    for _, r in out.iterrows():
        assert r["n_A"] == ct.loc[r["prio"], "A"]
        assert r["n_B"] == ct.loc[r["prio"], "B"]
        assert r["n_Z"] == 0  # listed but absent column -> zeros
        assert r["n_total"] == ct.loc[r["prio"]].sum()


def test_grouped_lag_first_row_null_and_gaps():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [7, 7, 7, 9, 9, 9],
        "ts": pd.to_datetime([10, 25, 25, 5, 6, 100], unit="s"),
    })
    out = relational.grouped_lag(
        rd.from_pandas(df).repartition(3), key_col="user_id",
        ts_col="ts", order_col="event_id", lag_cols=["event_id"],
        num_buckets=2).to_pandas().sort_values("event_id")
    # each user's first event has no predecessor
    assert out["prev_event_id"].isna().tolist() == [True, False, False,
                                                    True, False, False]
    # equal timestamps order by event_id (2 precedes 3)
    assert out.loc[out.event_id == 3, "prev_event_id"].iloc[0] == 2
    assert out.loc[out.event_id == 3, "gap_us"].iloc[0] == 0
    assert out.loc[out.event_id == 6, "gap_us"].iloc[0] == 94_000_000


def test_bucketed_hash_join_outer_keeps_unmatched_sides():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]}))
    right = rd.from_pandas(pd.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]}))
    out = relational.bucketed_hash_join(left, right, on="k", how="outer",
                                        num_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 4]  # key coalesced across sides
    assert out["a"].isna().tolist() == [False, False, False, True]
    assert out["b"].isna().tolist() == [True, False, False, False]


def test_approx_quantiles_error_bound_and_invariance():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import sketches

    rng = np.random.default_rng(9)
    vals = np.exp(rng.normal(4, 1.5, 20_000))  # lognormal, heavy tail
    df = pd.DataFrame({"v": vals})
    qs = [0.25, 0.5, 0.9, 0.99]
    out3 = sketches.approx_quantiles(rd.from_pandas(df).repartition(3),
                                     "v", qs, rel_err=0.01).to_pandas()
    out11 = sketches.approx_quantiles(rd.from_pandas(df).repartition(11),
                                      "v", qs, rel_err=0.01).to_pandas()
    # partitioning-invariant: identical sketch -> identical values
    assert out3["value"].tolist() == out11["value"].tolist()
    exact = np.quantile(vals, qs, method="inverted_cdf")
    rel = np.abs(out3["value"].to_numpy() - exact) / exact
    assert (rel <= 0.021).all()  # bin width bound: <= 2*rel_err (+eps)
    assert (out3["n"] == len(vals)).all()


def test_rollup_aggregate_levels():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", "q"],
        "v": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    out = relational.rollup_aggregate(
        rd.from_pandas(df).repartition(3), key_cols=["a", "b"],
        value_col="v").to_pandas()
    def row(a, b):
        ma = out["a"].isna() if a is None else (out["a"] == a)
        mb = out["b"].isna() if b is None else (out["b"] == b)
        m = out[ma & mb]
        assert len(m) == 1
        return m.iloc[0]
    assert row("x", "p")["sum_value"] == 1 and row("x", "p")["n"] == 1
    assert row("y", "p")["sum_value"] == 12 and row("y", "p")["n"] == 2
    assert row("x", None)["sum_value"] == 3
    assert row("y", None)["sum_value"] == 28
    assert row(None, None)["sum_value"] == 31 and row(None, None)["n"] == 5
    assert len(out) == 4 + 2 + 1  # finest + per-a + grand total


def test_windowed_distinct_counts():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 3, 1, 1],
        "ts": pd.to_datetime([10, 20, 30, 3610, 3620, 7300], unit="s"),
    })
    out = relational.windowed_distinct(
        rd.from_pandas(df).repartition(3), key_col="user_id",
        ts_col="ts", window_sec=3600).to_pandas().sort_values(
        "window_start").reset_index(drop=True)
    assert out["window_start"].tolist() == [0, 3600, 7200]
    assert out["n_distinct"].tolist() == [2, 2, 1]


def test_cube_aggregate_all_subsets():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    df = pd.DataFrame({
        "a": ["x", "x", "y"],
        "b": ["p", "q", "p"],
        "v": [1.0, 2.0, 4.0],
    })
    out = relational.cube_aggregate(
        rd.from_pandas(df).repartition(2), key_cols=["a", "b"],
        value_col="v").to_pandas()
    # 3 finest + 2 per-a + 2 per-b + 1 total = 8 rows
    assert len(out) == 8
    per_b = out[out["a"].isna() & out["b"].notna()].set_index("b")
    assert per_b.loc["p", "sum_value"] == 5 and per_b.loc["p", "n"] == 2
    assert per_b.loc["q", "sum_value"] == 2
    total = out[out["a"].isna() & out["b"].isna()]
    assert total["sum_value"].iloc[0] == 7 and total["n"].iloc[0] == 3


def test_grouped_zscore_both_paths():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    df = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                       "g": [0] * 5 + [1] * 4 + [2],
                       "x": [1.0, 2, 3, 4, 5, 10, 10, 10, 10, 7.5]})
    want = df.groupby("g").x.transform(
        lambda s: (s - s.mean()) / s.std(ddof=1)).round(4)
    for limit in (64 << 20, 0):  # broadcast path, then bucketed fallback
        out = relational.grouped_zscore(
            rd.from_pandas(df).repartition(3), "g", "x", "id",
            broadcast_limit_bytes=limit).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        # group 1 has zero variance, group 2 a single row -> both NULL
        assert out.zscore.isna().tolist() == [False] * 5 + [True] * 5
        assert np.allclose(out.zscore[:5], want[:5], atol=0)


def test_global_prefix_sum_matches_ordered_cumsum():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    rng = np.random.default_rng(11)
    ids = rng.permutation(500).astype(np.int64)  # arrives unordered
    vals = rng.integers(1, 50, 500).astype(np.int64)
    df = pd.DataFrame({"k": ids, "v": vals})
    want = df.sort_values("k").v.cumsum().to_numpy()
    for parts, nb in ((2, 4), (8, 64)):
        out = relational.global_prefix_sum(
            rd.from_pandas(df).repartition(parts), "k", "v",
            num_buckets=nb).to_pandas().sort_values("k")
        assert list(out.cum) == list(want)
    # sparse/negative key domain still ordered correctly
    df2 = pd.DataFrame({"k": [-100, 5, 7_000_000, 9], "v": [1, 2, 3, 4]})
    out2 = relational.global_prefix_sum(
        rd.from_pandas(df2), "k", "v").to_pandas().sort_values("k")
    assert list(out2.cum) == [1, 3, 7, 10]


def test_pagerank_matches_dense_reference():
    import collections

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import graph_ops

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)]
    nodes = [0, 1, 2, 3]  # node 3 has no in-links -> pure teleport rank
    outdeg = collections.Counter(s for s, _ in edges)
    r = np.round(np.full(4, 0.25), 9)
    for _ in range(3):
        c = np.zeros(4)
        for s, d in edges:
            c[d] += r[s] / outdeg[s]
        r = np.round((1.0 - 0.85) / 4 + 0.85 * c, 9)

    # limit 64MB -> broadcast fast path; limit 0 -> V-scale join path
    for parts, limit in ((1, 64 << 20), (4, 64 << 20), (4, 0)):
        e_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])) \
            .repartition(parts)
        n_ds = rd.from_pandas(pd.DataFrame({"v": nodes})).repartition(parts)
        out = graph_ops.pagerank(e_ds, n_ds, iters=3,
                                 broadcast_limit_bytes=limit).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert list(out.v) == nodes
        assert np.allclose(out.pagerank, r, atol=0), (out.pagerank, r)
    # in-linkless node holds exactly the teleport term
    assert out.pagerank.iloc[3] == np.round(0.15 / 4, 9)


def test_set_op_intersect_except():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    l = rd.from_pandas(pd.DataFrame({"k": [1, 1, 2, 3]})).repartition(2)
    r = rd.from_pandas(pd.DataFrame({"k": [2, 4, 4]})).repartition(2)
    inter = sorted(relational.set_op(l, r, "k", "intersect")
                   .to_pandas().k.tolist())
    exc = sorted(relational.set_op(l, r, "k", "except")
                 .to_pandas().k.tolist())
    assert inter == [2]
    assert exc == [1, 3]
    # distinct semantics: duplicates collapse; except of self is empty
    assert relational.set_op(l, l, "k", "except").to_pandas().empty
    assert sorted(relational.set_op(l, l, "k", "intersect")
                  .to_pandas().k.tolist()) == [1, 2, 3]


def test_new_ops_partition_invariance():
    """Round-3 additions must produce identical results at 2 vs 8 input
    partitions — the property the driver's value-hash gate relies on."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import dedup as dd
    from prclz_ray.stages import relational, text

    rng = np.random.default_rng(42)
    n = 600
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 50_000, n), unit="s"),
        "cents": rng.integers(1, 999, n).astype(np.int64),
        "cat": rng.choice(["u", "v", "w"], n),
    })
    docs = pd.DataFrame({
        "doc_id": np.arange(80, dtype=np.int64),
        "text": [" ".join(rng.choice(
            ["alpha", "beta", "gamma", "delta", "repeat repeat"], 12))
            for _ in range(80)],
    })

    def norm(df, sort_cols):
        return df.sort_values(sort_cols).reset_index(drop=True)

    def eq(fn, src, sort_cols):
        a = fn(rd.from_pandas(src).repartition(2)).to_pandas()
        b = fn(rd.from_pandas(src).repartition(8)).to_pandas()
        a, b = norm(a, sort_cols), norm(b, sort_cols)
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av = ["<null>" if pd.isna(v) else v for v in a[c].tolist()]
            bv = ["<null>" if pd.isna(v) else v for v in b[c].tolist()]
            assert av == bv, c

    eq(lambda d: relational.running_aggregate(
        d, "user_id", "ts", "event_id", "cents"), ev, ["event_id"])
    eq(lambda d: relational.grouped_lag(
        d, "user_id", "ts", "event_id", ["event_id"]), ev, ["event_id"])
    eq(lambda d: relational.pivot_counts(
        d, "cat", "user_id", [0, 1, 2]), ev, ["cat"])
    eq(lambda d: relational.rollup_aggregate(
        d, ["cat", "user_id"], "cents", round_to=0), ev,
       ["cat", "user_id", "n"])
    eq(lambda d: relational.windowed_distinct(
        d, "user_id", "ts", 3600), ev, ["window_start"])
    eq(lambda d: text.posting_lists(d, min_df=2, max_df=100), docs,
       ["word"])
    eq(lambda d: text.tfidf_top_terms(d, top_n=2), docs,
       ["doc_id", "rank"])
    eq(lambda d: dd.duplicate_span_stats(d, k=10, stride=3), docs,
       ["doc_id"])
    eq(lambda d: text.ngram_diversity_stats(d, k=6), docs, ["doc_id"])
    eq(lambda d: dd.decontaminate_ngrams(d, d, n=3), docs, ["doc_id"])
    docs_src = docs.assign(source=(docs.doc_id % 4).map("s{}".format))
    eq(lambda d: dd.domain_boilerplate_stats(
        d, text_col="text", sep=" ", min_frac=0.2), docs_src, ["source"])
    ev_steps = ev.assign(event_type=rng.choice(
        ["click", "purchase", "view"], n))
    eq(lambda d: relational.funnel_conversion(
        d, "user_id", "ts", "event_type", "click", "purchase", 3600),
       ev_steps, ["user_id"])
    eq(lambda d: relational.cohort_retention(d, "user_id", "ts"), ev,
       ["cohort_week", "week_offset"])
    eq(lambda d: relational.grouped_ranks(
        d, "user_id", "cents", "event_id"), ev, ["event_id"])
    eq(lambda d: relational.moving_aggregate(
        d, "user_id", "ts", "event_id", "cents", window_rows=2), ev,
       ["event_id"])


def test_funnel_conversion_matches_reference():
    """Distributed funnel equals a per-user pandas reference, including
    the strict-after / inclusive-bound window edges."""
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 20_000, n), unit="s"),
        "event_type": rng.choice(["click", "purchase", "view"], n),
    })
    # force window edge cases: a purchase exactly at first_ts (excluded)
    # and one exactly at first_ts + window (included)
    df = pd.concat([df, pd.DataFrame({
        "user_id": [100, 100, 101, 101],
        "ts": pd.to_datetime([0, 0, 10, 10 + 3600], unit="s"),
        "event_type": ["click", "purchase", "click", "purchase"],
    })], ignore_index=True)

    got = relational.funnel_conversion(
        rd.from_pandas(df).repartition(5), "user_id", "ts",
        "event_type", "click", "purchase", within_sec=3600) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)

    clicks = df[df.event_type == "click"].groupby("user_id").ts.min()
    purch = df[df.event_type == "purchase"]
    exp = []
    for uid, first in clicks.items():
        p = purch[purch.user_id == uid].ts
        conv = int(((p > first) &
                    (p <= first + pd.Timedelta(seconds=3600))).any())
        exp.append({"user_id": uid, "first_ts": first,
                    "converted": conv})
    exp = pd.DataFrame(exp).sort_values("user_id").reset_index(drop=True)
    assert got.user_id.tolist() == exp.user_id.tolist()
    assert got.first_ts.tolist() == exp.first_ts.tolist()
    assert got.converted.tolist() == exp.converted.tolist()
    assert int(got.loc[got.user_id == 100, "converted"].iloc[0]) == 0
    assert int(got.loc[got.user_id == 101, "converted"].iloc[0]) == 1


def test_cohort_retention_matches_reference():
    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 6 * 604800, n), unit="s"),
    })
    got = relational.cohort_retention(
        rd.from_pandas(df).repartition(6), "user_id", "ts") \
        .to_pandas().sort_values(["cohort_week", "week_offset"]) \
        .reset_index(drop=True)

    w = df.assign(week=df.ts.astype(np.int64) // (604800 * 10**9))
    cohort = w.groupby("user_id").week.min().rename("cohort_week")
    j = w.join(cohort, on="user_id")
    j["week_offset"] = j.week - j.cohort_week
    exp = j.drop_duplicates(["cohort_week", "week_offset", "user_id"]) \
        .groupby(["cohort_week", "week_offset"]).size() \
        .rename("n_users").reset_index() \
        .sort_values(["cohort_week", "week_offset"]) \
        .reset_index(drop=True)
    assert got.cohort_week.tolist() == exp.cohort_week.tolist()
    assert got.week_offset.tolist() == exp.week_offset.tolist()
    assert got.n_users.tolist() == exp.n_users.tolist()
    # offset 0 row exists for every cohort (the cohorting event itself)
    assert (got.groupby("cohort_week").week_offset.min() == 0).all()


def test_grouped_ntile_tile_sizes():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    # n=7, k=3 -> sizes 3,2,2 (front-loaded remainder); n=2, k=4 -> 1,2
    df = pd.DataFrame({
        "k": [1] * 7 + [2] * 2,
        "v": [10, 20, 30, 40, 50, 60, 70, 5, 6],
        "id": list(range(9)),
    })
    out = relational.grouped_ntile(
        rd.from_pandas(df).repartition(3), key_col="k", order_col="v",
        tiebreak_col="id", n_tiles=3).to_pandas()
    g1 = out[out.k == 1].sort_values("v")["tile"].tolist()
    assert g1 == [1, 1, 1, 2, 2, 3, 3]
    g2 = out[out.k == 2].sort_values("v")["tile"].tolist()
    assert g2 == [1, 2]  # n < k: one row per tile


def test_salted_join_equals_plain_join_and_spreads_hot_key():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    rng = np.random.default_rng(3)
    n = 2000
    k = np.where(rng.random(n) < 0.85, 0, rng.integers(1, 50, n))
    left = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                         "k": k.astype(np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "label": np.arange(50, dtype=np.int64) * 3})
    a = relational.salted_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(2), on="k", hot_keys=[0],
        salt=8).to_pandas().sort_values("id").reset_index(drop=True)
    b = relational.bucketed_hash_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(2), on="k") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert a[["id", "k", "label"]].to_numpy().tolist() \
        == b[["id", "k", "label"]].to_numpy().tolist()
    # left outer rows with unmatched keys also agree
    ao = relational.salted_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right.head(10)).repartition(2), on="k",
        hot_keys=[0], salt=4, how="left").to_pandas()
    bo = relational.bucketed_hash_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right.head(10)).repartition(2), on="k",
        how="left").to_pandas()
    key = ["id"]
    assert ao.sort_values(key)["label"].fillna(-1).tolist() \
        == bo.sort_values(key)["label"].fillna(-1).tolist()


def test_hash_split_exhaustive_disjoint_and_stable():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    df = pd.DataFrame({"k": np.arange(5000, dtype=np.int64)})
    splits = {"train": 800_000, "val": 100_000, "test": 100_000}
    a = relational.hash_split(rd.from_pandas(df).repartition(3),
                              "k", splits).to_pandas()
    b = relational.hash_split(rd.from_pandas(df).repartition(9),
                              "k", splits).to_pandas()
    # exhaustive: every row labeled; disjoint by construction
    assert len(a) == 5000 and a["split"].notna().all()
    # proportions near the ppm weights
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.02
    # parallelism-stable assignment
    assert a.sort_values("k")["split"].tolist() \
        == b.sort_values("k")["split"].tolist()
    import pytest
    with pytest.raises(ValueError):
        relational.hash_split(rd.from_pandas(df), "k", {"a": 5})


def test_grouped_approx_quantiles_error_and_invariance():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import sketches

    rng = np.random.default_rng(13)
    n = 30_000
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n).astype(np.int64),
        "v": np.exp(rng.normal(3, 1.0, n)),
    })
    qs = [0.5, 0.9, 0.99]
    a = sketches.grouped_approx_quantiles(
        rd.from_pandas(df).repartition(4), "k", "v", qs, rel_err=0.01)
    b = sketches.grouped_approx_quantiles(
        rd.from_pandas(df).repartition(13), "k", "v", qs, rel_err=0.01)
    ap, bp = a.to_pandas(), b.to_pandas()
    key = ["k", "q"]
    ap = ap.sort_values(key).reset_index(drop=True)
    bp = bp.sort_values(key).reset_index(drop=True)
    assert ap["value"].tolist() == bp["value"].tolist()  # invariant
    for kk, g in ap.groupby("k"):
        vals = df.loc[df.k == kk, "v"].to_numpy()
        exact = np.quantile(vals, qs, method="inverted_cdf")
        rel = np.abs(g.sort_values("q")["value"].to_numpy() - exact) / exact
        assert (rel <= 0.021).all(), kk
        assert (g["n"] == len(vals)).all()


def test_grouped_approx_distinct_error_and_invariance():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import sketches

    rng = np.random.default_rng(21)
    n = 40_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        # distinct cardinality differs per group
        "k": rng.integers(0, 3000, n).astype(np.int64),
    })
    df.loc[df.g == "b", "k"] %= 200
    df.loc[df.g == "c", "k"] %= 37
    a = sketches.grouped_approx_distinct(
        rd.from_pandas(df).repartition(3), "g", "k").to_pandas()
    b = sketches.grouped_approx_distinct(
        rd.from_pandas(df).repartition(11), "g", "k").to_pandas()
    a = a.sort_values("g").reset_index(drop=True)
    b = b.sort_values("g").reset_index(drop=True)
    assert a["approx_distinct"].tolist() == b["approx_distinct"].tolist()
    exact = df.groupby("g")["k"].nunique()
    for _, r in a.iterrows():
        assert abs(r["approx_distinct"] - exact[r["g"]]) \
            <= max(0.03 * exact[r["g"]], 2), r["g"]


def test_grouped_mode_ties_and_counts():
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 2, 2, 3],
        "v": ["b", "a", "b", "x", "y", "x", "y", "z"],
    })
    out = relational.grouped_mode(
        rd.from_pandas(df).repartition(3), key_col="k", val_col="v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # k=1: b wins 2-1; k=2: tie 2-2 -> smallest value x; k=3 singleton
    assert out.mode_value.tolist() == ["b", "x", "z"]
    assert out.n_mode.tolist() == [2, 2, 1]


def test_mixture_sample_hits_targets_and_keeps_binding_stratum():
    rng = np.random.default_rng(21)
    n = {"en": 3000, "de": 600, "fr": 500}
    rows = []
    i = 0
    for s, c in n.items():
        for _ in range(c):
            rows.append({"doc_id": i, "lang": s}); i += 1
    df = pd.DataFrame(rows)
    w = {"en": 0.5, "de": 0.25, "fr": 0.25}
    outs = []
    for parts in (2, 8):
        out = relational.mixture_sample(
            rd.from_pandas(df).repartition(parts), key_col="doc_id",
            strata_col="lang", weights=w).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    a, b = outs
    assert a.equals(b)  # deterministic across parallelism
    got = a.lang.value_counts()
    # binding stratum is fr (500/0.25 = 2000 = T): kept ~fully
    assert got["fr"] >= 480
    # output proportions within sampling noise of the targets
    tot = len(a)
    for s, ws in w.items():
        assert abs(got[s] / tot - ws) < 0.04, (s, got[s] / tot)
    # abundant stratum actually downsampled
    assert got["en"] < 1400


def test_interval_lookup_join_edges_and_left():
    ranges = pa.table({"lo": pa.array([0.0, 10.0, 50.0]),
                       "hi": pa.array([10.0, 50.0, 100.0]),
                       "band": pa.array(["a", "b", "c"])})
    df = pd.DataFrame({"id": np.arange(7),
                       "v": [-1.0, 0.0, 9.999, 10.0, 49.9, 100.0, 55.0]})
    ds = rd.from_pandas(df).repartition(2)
    inner = relational.interval_lookup_join(ds, "v", ranges) \
        .to_pandas().sort_values("id")
    # -1 and 100 (hi-exclusive) drop; boundaries lo-inclusive
    assert inner.id.tolist() == [1, 2, 3, 4, 6]
    assert inner.band.tolist() == ["a", "a", "b", "b", "c"]
    left = relational.interval_lookup_join(ds, "v", ranges, how="left") \
        .to_pandas().sort_values("id")
    assert len(left) == 7
    assert left.band.isna().tolist() == [True, False, False, False,
                                         False, True, False]
    # overlapping ranges rejected
    bad = pa.table({"lo": pa.array([0.0, 5.0]), "hi": pa.array([10.0, 8.0]),
                    "band": pa.array(["x", "y"])})
    import pytest
    with pytest.raises(ValueError):
        relational.interval_lookup_join(ds, "v", bad)


def test_cooccurrence_pairs_matches_reference():
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "k": rng.integers(0, 25, 600).astype(np.int64),
        "v": rng.choice(list("abcdef"), 600),
    })
    got = relational.cooccurrence_pairs(
        rd.from_pandas(df).repartition(5), key_col="k", val_col="v") \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    d = df.drop_duplicates()
    m = d.merge(d, on="k")
    m = m[m.v_x < m.v_y]
    exp = m.groupby(["v_x", "v_y"]).size().rename("n").reset_index() \
        .sort_values(["v_x", "v_y"]).reset_index(drop=True)
    assert got.a.tolist() == exp.v_x.tolist()
    assert got.b.tolist() == exp.v_y.tolist()
    assert got.n_keys.tolist() == exp.n.tolist()


def test_new_ops_tolerate_empty_input():
    """Degenerate shards happen at scale (a filter that drops a whole
    partition, a resume that skips everything): every round-3 operator
    must run on a 0-row dataset without crashing and return 0 rows."""
    ev = pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "cents": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
    })
    docs = pa.table({"doc_id": pa.array([], type=pa.int64()),
                     "text": pa.array([], type=pa.string())})
    e = rd.from_arrow(ev)
    d = rd.from_arrow(docs)

    from prclz_ray.stages import text as tx

    assert relational.funnel_conversion(
        e, "user_id", "ts", "event_type", "click", "purchase",
        3600).count() == 0
    assert relational.cohort_retention(e, "user_id", "ts").count() == 0
    assert relational.grouped_ranks(
        e, "user_id", "cents", "event_id").count() == 0
    assert relational.moving_aggregate(
        e, "user_id", "ts", "event_id", "cents", 3).count() == 0
    assert relational.grouped_mode(
        e, "user_id", "event_type").count() == 0
    assert relational.cooccurrence_pairs(
        e, "user_id", "event_type").count() == 0
    ranges = pa.table({"lo": pa.array([0.0]), "hi": pa.array([1.0]),
                       "band": pa.array(["x"])})
    assert relational.interval_lookup_join(
        e.map_batches(lambda t: t.append_column(
            "value", pa.array(np.zeros(len(t)))),
            batch_format="pyarrow"),
        "value", ranges).count() == 0
    assert tx.chunk_documents(d).count() == 0
    assert tx.reassemble_chunks(rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "chunk_idx": pa.array([], type=pa.int64()),
        "chunk_text": pa.array([], type=pa.string())}))).count() == 0
    assert d.map_batches(tx.char_entropy_batch,
                         batch_format="pyarrow").count() == 0
    assert tx.bigram_lm_scores(d).count() == 0


def test_grouped_regression_matches_duckdb():
    import duckdb
    rng = np.random.default_rng(3)
    n = 8000
    k = rng.integers(0, 5, n)
    x = rng.standard_normal(n) * 4 + 10
    y = 2.5 * x - 7 + rng.standard_normal(n) * 3
    tbl = pa.table({"k": pa.array(k, type=pa.int64()),
                    "x": pa.array(x), "y": pa.array(y)})
    got = relational.grouped_regression(
        rd.from_arrow(tbl).repartition(7), "k", "x", "y")
    want = duckdb.connect().execute(
        "SELECT k, COUNT(*) n, ROUND(REGR_SLOPE(y,x),4) s, "
        "ROUND(REGR_INTERCEPT(y,x),4) i FROM tbl GROUP BY k ORDER BY k"
    ).fetchdf()
    assert got.n.tolist() == want.n.tolist()
    assert got.slope.tolist() == want.s.tolist()
    assert got.intercept.tolist() == want.i.tolist()


def test_exact_size_sample_properties():
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64),
                       "v": np.arange(1000)})
    outs = []
    for parts in (2, 9):
        out = relational.exact_size_sample(
            rd.from_pandas(df).repartition(parts), "doc_id", n=50)
        outs.append(sorted(out["doc_id"].to_pylist()))
    assert outs[0] == outs[1]  # partition-invariant
    assert len(outs[0]) == 50 == len(set(outs[0]))  # exact size, no dup
    # a disjoint seed gives a (almost surely) different sample
    other = relational.exact_size_sample(
        rd.from_pandas(df).repartition(3), "doc_id", n=50, seed=7)
    assert sorted(other["doc_id"].to_pylist()) != outs[0]
    # n >= rows degenerates to the full set
    allr = relational.exact_size_sample(
        rd.from_pandas(df.head(30)).repartition(2), "doc_id", n=50)
    assert sorted(allr["doc_id"].to_pylist()) == list(range(30))


def test_profile_columns_with_nulls():
    df = pd.DataFrame({"a": [1.0, None, 3.0, None, 5.0],
                       "b": [10, 20, 30, 40, 50]})
    out = relational.profile_columns(
        rd.from_pandas(df).repartition(2), ["a", "b"]).to_pandas() \
        .set_index("column")
    assert out.loc["a", "n"] == 3 and out.loc["a", "n_null"] == 2
    assert out.loc["a", "min_val"] == 1.0 and out.loc["a", "max_val"] == 5.0
    assert out.loc["b", "n"] == 5 and out.loc["b", "n_null"] == 0
    assert out.loc["b", "max_val"] == 50.0


def test_triangle_count_known_graphs():
    from prclz_ray.stages import graph_ops

    def count(edge_list, parts=3):
        t = pa.table({"src": pa.array([a for a, b in edge_list],
                                      type=pa.int64()),
                      "dst": pa.array([b for a, b in edge_list],
                                      type=pa.int64())})
        return graph_ops.triangle_count(rd.from_arrow(t)
                                        .repartition(parts))

    # K4 has 4 triangles; duplicate + reversed + self-loop edges ignored
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert count(k4) == 4
    assert count(k4 + [(1, 0), (2, 2), (0, 1)]) == 4
    # a 5-cycle has none; adding one chord makes exactly one
    c5 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    assert count(c5) == 0
    assert count(c5 + [(0, 2)]) == 1


def test_triangle_count_skewed_star_bounded():
    """A star graph (one high-degree hub) must complete with a bounded
    wedge table: degree-ordered orientation gives every leaf out-degree 1
    and the hub out-degree 0, so wedges = 0 — not C(deg, 2) ≈ 5·10⁶ as
    naive common-neighbor counting would emit."""
    import numpy as np

    from prclz_ray.stages import graph_ops

    n = 3000  # hub 0 connected to 1..n
    leaves = np.arange(1, n + 1, dtype=np.int64)
    t = pa.table({"src": pa.array(np.zeros(n, dtype=np.int64)),
                  "dst": pa.array(leaves)})
    assert graph_ops.triangle_count(rd.from_arrow(t).repartition(4)) == 0

    # close two leaf pairs into triangles: the count stays exact
    extra = pa.table({"src": pa.array([1, 3], type=pa.int64()),
                      "dst": pa.array([2, 4], type=pa.int64())})
    ds = rd.from_arrow(pa.concat_tables([t, extra])).repartition(4)
    assert graph_ops.triangle_count(ds) == 2

    # V-scale fallback path (broadcast budget forced to 0) agrees
    assert graph_ops.triangle_count(ds, broadcast_limit_bytes=0) == 2


def test_skyline_matches_bruteforce_with_frontier_ties():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from prclz_ray.stages import relational as r

    rng = np.random.default_rng(11)
    price = rng.integers(0, 12, 400).astype(float)
    date = rng.integers(0, 12, 400).astype(float)
    # force duplicated frontier twins: two copies of the global best
    price[0] = price[1] = 99.0
    date[0] = date[1] = -5.0
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(400), type=pa.int64()),
        "p": price, "d": date})).repartition(8)
    got = sorted(r.skyline(ds, "p", "d", ["id"]).to_pandas()["id"])

    def dominated(i):
        return any(price[j] >= price[i] and date[j] <= date[i]
                   and (price[j] > price[i] or date[j] < date[i])
                   for j in range(400))

    exp = [i for i in range(400) if not dominated(i)]
    assert got == exp
    assert {0, 1} <= set(got)


def test_hits_star_and_path_paths_agree():
    """HITS on a directed star (hub → leaves): the hub is the unique
    max hub (score 1.0), leaves are the max authorities.  Broadcast and
    V-scale join legs must agree exactly (max-normalized + rounded)."""
    import numpy as np

    from prclz_ray.stages import graph_ops

    src = np.zeros(5, dtype=np.int64)
    dst = np.arange(1, 6, dtype=np.int64)
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    nodes = pa.table({"v": pa.array(np.arange(6, dtype=np.int64))})

    def run(limit):
        out = graph_ops.hits(rd.from_arrow(edges).repartition(2),
                             rd.from_arrow(nodes).repartition(2),
                             iters=2, broadcast_limit_bytes=limit) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        return out

    bc = run(64 << 20)
    assert bc.loc[bc.v == 0, "hub"].iloc[0] == 1.0
    assert bc.loc[bc.v == 0, "authority"].iloc[0] == 0.0
    assert (bc.loc[bc.v > 0, "authority"] == 1.0).all()
    assert (bc.loc[bc.v > 0, "hub"] == 0.0).all()

    js = run(0)
    pd.testing.assert_frame_equal(bc, js[["v", "hub", "authority"]])


def test_label_propagation_two_cliques_paths_agree():
    """Two triangles joined by one bridge edge: after 2 deterministic
    rounds every node carries its triangle's min label; broadcast and
    BSP join legs agree."""
    import numpy as np

    from prclz_ray.stages import graph_ops

    e = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    edges = pa.table({"src": pa.array([a for a, b in e], type=pa.int64()),
                      "dst": pa.array([b for a, b in e], type=pa.int64())})
    nodes = pa.table({"v": pa.array(np.arange(6, dtype=np.int64))})

    def run(limit):
        return graph_ops.label_propagation(
            rd.from_arrow(edges).repartition(3),
            rd.from_arrow(nodes).repartition(2), iters=2,
            broadcast_limit_bytes=limit) \
            .to_pandas().sort_values("v").reset_index(drop=True)

    bc = run(64 << 20)
    js = run(0)
    pd.testing.assert_frame_equal(bc, js[["v", "label"]])
    # deterministic: labels are drawn from node ids
    assert set(bc["label"]).issubset(set(range(6)))


def test_bucketed_join_null_keys_never_match():
    """SQL semantics pin for the Acero per-bucket merge: null join keys
    match NOTHING (a pandas merge would pair NaN with NaN) — inner drops
    them, left keeps them unmatched."""
    left = pa.table({"k": pa.array([1, 2, None, None], type=pa.int64()),
                     "a": pa.array([10, 20, 30, 40])})
    right = pa.table({"k": pa.array([1, None], type=pa.int64()),
                      "b": pa.array([100, 200])})
    inner = relational.bucketed_hash_join(
        rd.from_arrow(left).repartition(2),
        rd.from_arrow(right).repartition(2), on="k",
        num_buckets=4).to_pandas()
    assert sorted(inner["a"]) == [10]
    lo = relational.bucketed_hash_join(
        rd.from_arrow(left).repartition(2),
        rd.from_arrow(right).repartition(2), on="k", num_buckets=4,
        how="left").to_pandas().sort_values("a")
    assert list(lo["a"]) == [10, 20, 30, 40]
    assert lo["b"].notna().tolist() == [True, False, False, False]


def test_bucketed_join_combine_hook_full_aggregate_on_join_key():
    """combine= runs inside the bucket task; a groupby on the JOIN key
    there is a full aggregate (every key occurrence is in one bucket)."""
    import pyarrow.compute as pc
    left = pa.table({"k": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
                     "v": pa.array([1, 2, 3, 4, 5], type=pa.int64())})
    right = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                      "w": pa.array([10, 20, 30], type=pa.int64())})

    def comb(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum"), ("w", "max")])
        return pa.table({"k": g["k"], "sv": g["v_sum"],
                         "mw": g["w_max"]})

    out = relational.bucketed_hash_join(
        rd.from_arrow(left).repartition(3),
        rd.from_arrow(right).repartition(2), on="k",
        num_buckets=4, combine=comb).to_pandas().sort_values("k")
    assert list(out["k"]) == [1, 2, 3]
    assert list(out["sv"]) == [3, 7, 5]
    assert list(out["mw"]) == [10, 20, 30]


def test_worker_cached_builds_once_and_evicts_stale_kind():
    calls = []
    r1 = relational.worker_cached(("kind_a", "ref1"),
                                  lambda: calls.append(1) or "v1")
    r2 = relational.worker_cached(("kind_a", "ref1"),
                                  lambda: calls.append(2) or "v1b")
    assert r1 == r2 == "v1" and calls == [1]      # cached, not rebuilt
    r3 = relational.worker_cached(("kind_a", "ref2"),
                                  lambda: calls.append(3) or "v2")
    assert r3 == "v2"
    # stale same-kind entry evicted: re-asking for ref1 rebuilds
    r4 = relational.worker_cached(("kind_a", "ref1"),
                                  lambda: calls.append(4) or "v1c")
    assert r4 == "v1c" and calls == [1, 3, 4]
    # other kinds untouched
    relational.worker_cached(("kind_b", "x"), lambda: "b1")
    assert relational.worker_cached(("kind_b", "x"),
                                    lambda: "b2") == "b1"


def test_bucketed_join_randomized_parity_with_duckdb():
    """Core-infra pin: the Acero bucketed join must match DuckDB on
    random data with NULL keys, duplicate keys, and int32-vs-int64 key
    dtype promotion, for inner/left/outer."""
    import duckdb

    rng = np.random.default_rng(43)
    n = 2000
    lk = rng.integers(0, 300, n).astype(np.int64)
    lnull = rng.random(n) < 0.05
    left = pa.table({
        "k": pa.array([None if m else int(v)
                       for v, m in zip(lk, lnull)], type=pa.int64()),
        "a": pa.array(rng.integers(0, 10**6, n))})
    rk = rng.integers(0, 300, 400)
    rnull = rng.random(400) < 0.05
    right = pa.table({
        "k": pa.array([None if m else int(v)
                       for v, m in zip(rk, rnull)], type=pa.int32()),
        "b": pa.array(rng.integers(0, 10**6, 400))})

    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    for how, sql_join in [("inner", "JOIN"), ("left", "LEFT JOIN"),
                          ("outer", "FULL OUTER JOIN")]:
        got = relational.bucketed_hash_join(
            rd.from_arrow(left).repartition(5),
            rd.from_arrow(right).repartition(3), on="k",
            num_buckets=8, how=how).to_pandas()
        want = con.execute(
            f"SELECT l.a AS a, r.b AS b FROM l {sql_join} r "
            "ON l.k = r.k").fetchdf()
        ga = sorted((-1 if a != a else int(a),
                     -1 if b != b else int(b))
                    for a, b in zip(got["a"].fillna(-1),
                                    got["b"].fillna(-1)))
        wa = sorted((-1 if a != a else int(a),
                     -1 if b != b else int(b))
                    for a, b in zip(want["a"].fillna(-1),
                                    want["b"].fillna(-1)))
        assert ga == wa, how


def test_bfs_hops_both_legs_match_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import graph_ops

    rng = np.random.default_rng(7)
    n = 120
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    seeds = np.array([0, 1, 2])

    # python BFS reference (min hops, 3 rounds)
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
    dist = {int(s): 0 for s in seeds}
    frontier = set(int(s) for s in seeds)
    for r in range(1, 4):
        nxt = set()
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = r
                    nxt.add(w)
        frontier = nxt
    want = sorted(dist.items())

    for parts, approx_n in ((1, None), (4, None), (4, 1 << 60)):
        e_ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})) \
            .repartition(parts)
        s_ds = rd.from_pandas(pd.DataFrame({"v": seeds})).repartition(parts)
        out = graph_ops.bfs_hops(e_ds, s_ds, rounds=3,
                                 approx_num_nodes=approx_n).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        got = list(zip(out["v"].astype(int), out["hops"].astype(int)))
        assert got == want, (parts, approx_n)


def test_bfs_hops_frontier_exhausts_early():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import graph_ops

    # 0 -> 1, nothing else: frontier empties after round 1 on both legs
    e_ds = rd.from_pandas(pd.DataFrame({"src": [0], "dst": [1]}))
    s_ds = rd.from_pandas(pd.DataFrame({"v": [0]}))
    for approx_n in (None, 1 << 60):
        out = graph_ops.bfs_hops(e_ds, s_ds, rounds=5,
                                 approx_num_nodes=approx_n).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        assert list(zip(out["v"], out["hops"])) == [(0, 0), (1, 1)]


def test_ewma_bounded_matches_quadratic_reference_any_partitioning():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "ts": rng.permutation(n).astype("datetime64[s]"),
        "id": np.arange(n),
        "v": rng.integers(0, 100_000, n),
    })

    # O(n^2) reference: normalized dyadic-weight window of 24 rows
    ref = {}
    for k, g in df.sort_values(["k", "ts", "id"]).groupby("k"):
        v = g["v"].to_numpy(dtype=np.float64)
        for i, rid in enumerate(g["id"]):
            lo = max(0, i - 23)
            w = 0.5 ** np.arange(i - lo, -1, -1.0)
            ref[rid] = float((v[lo:i + 1] * w).sum() / w.sum())

    for parts in (1, 3, 16):
        out = relational.ewma_bounded(
            rd.from_pandas(df).repartition(parts), key_col="k",
            ts_col="ts", order_col="id", value_col="v",
            window_rows=24).to_pandas()
        got = dict(zip(out["id"], out["ewma"]))
        assert len(got) == n
        # dyadic arithmetic -> bit-exact equality, not allclose
        assert all(got[i] == ref[i] for i in range(n)), parts


def test_salted_join_null_keys_never_match():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    import pyarrow as pa
    left = pa.table({"id": pa.array([0, 1, 2, 3], type=pa.int64()),
                     "k": pa.array([0, None, 2, None], type=pa.int64())})
    right = pa.table({"k": pa.array([0, None, 2], type=pa.int64()),
                      "label": pa.array([10, 11, 12], type=pa.int64())})
    out = relational.salted_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        hot_keys=[0], salt=4).to_pandas().sort_values("id")
    # SQL semantics: null keys never match (ids 1 and 3 drop)
    assert out["id"].tolist() == [0, 2]
    assert out["label"].tolist() == [10, 12]
    # left outer keeps the null-key rows with null label
    outl = relational.salted_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k",
        hot_keys=[0], salt=4, how="left").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert outl["id"].tolist() == [0, 1, 2, 3]
    assert outl["label"].fillna(-1).tolist() == [10, -1, 12, -1]


def test_sssp_both_legs_match_bellman_ford_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import graph_ops

    rng = np.random.default_rng(13)
    n = 100
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    w = rng.integers(1, 10, 300)
    seeds = np.array([0, 5])

    INF = 1 << 60
    d = {int(s): 0 for s in seeds}
    for _ in range(3):                      # 3 bounded relaxation rounds
        nd = dict(d)
        for s, t, ww in zip(src, dst, w):
            s, t, ww = int(s), int(t), int(ww)
            if s in d and d[s] + ww < nd.get(t, INF):
                nd[t] = d[s] + ww
        d = nd
    want = sorted(d.items())

    for parts, approx_n in ((1, None), (4, None), (4, 1 << 60)):
        e_ds = rd.from_pandas(
            pd.DataFrame({"src": src, "dst": dst, "w": w})) \
            .repartition(parts)
        s_ds = rd.from_pandas(pd.DataFrame({"v": seeds})).repartition(parts)
        out = graph_ops.sssp_rounds(e_ds, s_ds, rounds=3,
                                    approx_num_nodes=approx_n) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        got = list(zip(out["v"].astype(int), out["dist"].astype(int)))
        assert got == want, (parts, approx_n)


def test_k_core_both_legs_match_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import graph_ops

    rng = np.random.default_rng(11)
    n = 80
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    K, R = 3, 3

    # python peel reference
    edges = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    edges |= {(b, a) for a, b in edges}
    surv = set()
    for _ in range(R):
        deg = {}
        for a, _b in edges:
            deg[a] = deg.get(a, 0) + 1
        surv = {v for v, c in deg.items() if c >= K}
        edges = {(a, b) for a, b in edges if a in surv and b in surv}
    fdeg = {}
    for a, _b in edges:
        fdeg[a] = fdeg.get(a, 0) + 1
    want = sorted((v, fdeg.get(v, 0)) for v in surv)

    for parts, blim in ((1, 64 << 20), (4, 64 << 20), (4, 0)):
        e_ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})) \
            .repartition(parts)
        out = graph_ops.k_core(e_ds, k=K, rounds=R,
                               broadcast_limit_bytes=blim).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        got = list(zip(out["v"].astype(int), out["deg"].astype(int)))
        assert got == want, (parts, blim)


def test_local_clustering_matches_reference_both_legs():
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import graph_ops

    rng = np.random.default_rng(5)
    n = 40
    src = rng.integers(0, n, 200)
    dst = rng.integers(0, n, 200)

    adj = {}
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    want = {}
    for v, nb in adj.items():
        deg = len(nb)
        tri = sum(1 for a, b in itertools.combinations(sorted(nb), 2)
                  if b in adj.get(a, ()))
        D = deg * (deg - 1)
        cc = (2 * (2 * tri * 10 ** 9) + D) // (2 * D) if deg >= 2 else 0
        want[v] = (tri, deg, cc)

    for parts, blim in ((1, 64 << 20), (4, 0)):
        e_ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})) \
            .repartition(parts)
        out = graph_ops.local_clustering(
            e_ds, broadcast_limit_bytes=blim).to_pandas()
        got = {int(r.v): (int(r.tri), int(r.deg), int(r.cc_nano))
               for r in out.itertuples()}
        assert got == want, (parts, blim)


def test_local_clustering_star_graph_zero_cc():
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import graph_ops

    # pure star: hub 0 with 50 leaves — no triangles anywhere, and the
    # wedge explosion must stay bounded (orientation gives the hub
    # out-degree 0)
    leaves = list(range(1, 51))
    e_ds = rd.from_pandas(pd.DataFrame(
        {"src": [0] * 50, "dst": leaves}))
    out = graph_ops.local_clustering(e_ds).to_pandas()
    assert int(out["tri"].sum()) == 0
    assert int(out["cc_nano"].sum()) == 0
    hub = out[out["v"] == 0].iloc[0]
    assert int(hub["deg"]) == 50


def test_adaptive_join_detection_and_parity():
    """Hot key detected on the skewed side -> salted plan; uniform keys
    -> plain plan; both produce exactly the bucketed join's result."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from prclz_ray.stages import relational

    rng = np.random.default_rng(3)
    n = 4000
    # 70% of rows on key 42, rest uniform over 1000 keys
    hotmask = rng.random(n) < 0.7
    k = np.where(hotmask, 42, rng.integers(0, 1000, n)).astype(np.int64)
    left = pd.DataFrame({"k": k, "v": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    right["w"] = right["k"] * 3

    l_ds = rd.from_pandas(left).repartition(4)
    r_ds = rd.from_pandas(right).repartition(2)

    hot = relational.detect_hot_keys(l_ds.materialize(), "k",
                                     hot_fraction=0.02)
    assert 42 in hot and len(hot) <= 5

    got = relational.adaptive_join(l_ds, r_ds, on="k").to_pandas() \
        .sort_values(["v"]).reset_index(drop=True)
    want = relational.bucketed_hash_join(l_ds, r_ds, on="k") \
        .to_pandas().sort_values(["v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    # uniform side: nothing detected, plain path, same parity
    u = pd.DataFrame({"k": rng.integers(0, 1000, n).astype(np.int64),
                      "v": np.arange(n)})
    u_ds = rd.from_pandas(u).repartition(4).materialize()
    assert relational.detect_hot_keys(u_ds, "k", hot_fraction=0.02) == []
    got2 = relational.adaptive_join(u_ds, r_ds, on="k").to_pandas() \
        .sort_values(["v"]).reset_index(drop=True)
    want2 = relational.bucketed_hash_join(u_ds, r_ds, on="k") \
        .to_pandas().sort_values(["v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got2[sorted(got2.columns)], want2[sorted(want2.columns)])
