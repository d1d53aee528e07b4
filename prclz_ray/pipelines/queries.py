"""Driver-facing query registry: every operator family from SURVEY §2 (plus
the training-data operator suite) as a named pipeline over the driver's
testdata tables, each with a DuckDB oracle where SQL can express it.

Conventions (driver compare contract):
  - every computed/aggregate column is NAMED IDENTICALLY in the Ray
    pipeline and the oracle SQL
  - money aggregates are ROUND(x, 2) on both sides (parallel-sum float
    fuzz is far below the rounding grain)
  - synthetic geometry derives from integer columns with half-open-cell
    placement (coords are k + 0.5, cell edges are integers) so PIP
    boundary semantics can never disagree with the SQL half-open ranges

Geometry derivation (shared by the geo queries + their oracles):
  point(key)  = ((key*7919) % 1000 + 0.5, (key*104729) % 1000 + 0.5)
  nation rect = [ (n%5)*200, (n%5+1)*200 ) × ( rows via n//5 )   — 5×5 grid
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..geom import wkb
from ..stages import dedup as dd
from ..stages import joins, relational, similarity, text
from ..stages.text import token_count_batch

# ----------------------------------------------------------------- helpers

PX = "((%(k)s * 7919) %% 1000 + 0.5)"
PY = "((%(k)s * 104729) %% 1000 + 0.5)"


def _points_batch(batch: pa.Table, key: str) -> pa.Table:
    k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
    px = (k * 7919) % 1000 + 0.5
    py = (k * 104729) % 1000 + 0.5
    out = batch.append_column("px", pa.array(px.astype(np.float64)))
    return out.append_column("py", pa.array(py.astype(np.float64)))


def _nation_rects(nation_tbl: pa.Table, max_key: int = 25) -> pa.Table:
    keys = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False)
    keep = keys < max_key
    keys = keys[keep]
    geoms = []
    for n in keys:
        col, row = int(n) % 5, int(n) // 5
        x0, y0 = col * 200.0, row * 200.0
        geoms.append(wkb.polygon(np.array(
            [(x0, y0), (x0 + 200, y0), (x0 + 200, y0 + 200), (x0, y0 + 200), (x0, y0)])))
    return pa.table({"n_nationkey": pa.array(keys),
                     "geometry": pa.array(geoms, type=pa.binary())})


def _round2(df: pd.DataFrame, cols) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(2)
    return df


def _read(sf_dir: str, table: str, columns=None, filter=None):
    """Column-pruned (and optionally predicate-pushed) parquet read.
    ``filter`` is a pyarrow.dataset expression evaluated INSIDE the
    scan — row groups whose statistics exclude the predicate never
    leave storage, the difference between reading a month and reading
    seven years at 100 TB."""
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           filter=filter)


def _read_table(sf_dir: str, table: str, columns=None) -> pa.Table:
    """Direct parquet read for DIMENSION tables that the query
    materializes driver-side anyway (region/nation/supplier maps):
    same memory footprint as ``ds_to_table(_read(...))`` but skips a
    whole Ray execution's scheduling latency (~0.3-0.5 s each — q5/q7/
    q8 pay it three times over)."""
    import pyarrow.parquet as pq
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# -------------------------------------------------------------- geo queries

def q_pip_points_nations(sf_dir: str):
    """PIP join (J1/J3 semantics): customer points × 25 nation rects."""
    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"), batch_format="pyarrow")
    nations = _nation_rects(pa.table(
        {"n_nationkey": pa.array(np.arange(25, dtype=np.int32))}))
    out = joins.pip_join(pts, nations, id_col="n_nationkey",
                         x_col="px", y_col="py", how="inner")
    return out.select_columns(["c_custkey", "n_nationkey"])


SQL_PIP = """
SELECT c_custkey, n_nationkey FROM customer, nation
WHERE CAST(FLOOR(((c_custkey * 7919) % 1000 + 0.5) / 200) AS INT) = n_nationkey % 5
  AND CAST(FLOOR(((c_custkey * 104729) % 1000 + 0.5) / 200) AS INT) = CAST(FLOOR(n_nationkey / 5) AS INT)
"""


def q_pip_tiled_points_nations(sf_dir: str):
    """Both-sides-large PIP join co-partitioned by S2 cell (the
    one-shuffle tiled variant; same semantics + oracle as the broadcast
    join). Coordinates scaled /20 into valid lng/lat range; level 6 tiles
    keep the per-rect replication factor small."""
    def scaled_points(b: pa.Table) -> pa.Table:
        b = _points_batch(b, "c_custkey")
        b = b.set_column(b.schema.get_field_index("px"), "px",
                         pc.divide(b["px"], 20.0))
        return b.set_column(b.schema.get_field_index("py"), "py",
                            pc.divide(b["py"], 20.0))

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        scaled_points, batch_format="pyarrow")
    keys = np.arange(25, dtype=np.int32)
    geoms = []
    for n in keys:
        col, row = int(n) % 5, int(n) // 5
        x0, y0 = col * 10.0, row * 10.0
        geoms.append(wkb.polygon(np.array(
            [(x0, y0), (x0 + 10, y0), (x0 + 10, y0 + 10), (x0, y0 + 10),
             (x0, y0)])))
    nations = pa.table({"n_nationkey": pa.array(keys),
                        "geometry": pa.array(geoms, type=pa.binary())})
    out = joins.pip_join_tiled(pts, rd.from_arrow(nations),
                               id_col="n_nationkey", x_col="px", y_col="py",
                               level=6)
    return out.select_columns(["c_custkey", "n_nationkey"])


def _pip_tiled_semi_anti(sf_dir: str, how: str):
    """Shared body for the tiled semi/anti queries: 20 rects (so ~20 %
    of points are unmatched), broadcast budget forced to 0 so the
    co-partitioned tiled path runs (VERDICT r3 item #3 driver-visible
    coverage)."""
    def scaled_points(b: pa.Table) -> pa.Table:
        b = _points_batch(b, "c_custkey")
        b = b.set_column(b.schema.get_field_index("px"), "px",
                         pc.divide(b["px"], 20.0))
        return b.set_column(b.schema.get_field_index("py"), "py",
                            pc.divide(b["py"], 20.0))

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        scaled_points, batch_format="pyarrow")
    keys = np.arange(20, dtype=np.int32)
    geoms = []
    for n in keys:
        col, row = int(n) % 5, int(n) // 5
        x0, y0 = col * 10.0, row * 10.0
        geoms.append(wkb.polygon(np.array(
            [(x0, y0), (x0 + 10, y0), (x0 + 10, y0 + 10),
             (x0, y0 + 10), (x0, y0)])))
    nations = pa.table({"n_nationkey": pa.array(keys),
                        "geometry": pa.array(geoms, type=pa.binary())})
    out = joins.pip_join_auto(pts, nations, id_col="n_nationkey",
                              x_col="px", y_col="py", how=how,
                              broadcast_limit_bytes=0, level=6)
    return out.select_columns(["c_custkey"])


def q_pip_semi_tiled(sf_dir: str):
    """Tiled PIP SEMI join (J5 orphan-QC semantics past the broadcast
    budget): points inside any of 20 rects, each point once."""
    return _pip_tiled_semi_anti(sf_dir, "semi")


def q_pip_anti_tiled(sf_dir: str):
    """Tiled PIP ANTI join: points outside every rect (the reference's
    orphan-building split, `_parcels.py:88-93`, at tiled scale)."""
    return _pip_tiled_semi_anti(sf_dir, "anti")


SQL_PIP_SEMI = """
SELECT c_custkey FROM customer WHERE EXISTS (
  SELECT 1 FROM nation WHERE n_nationkey < 20
  AND CAST(FLOOR(((c_custkey * 7919) % 1000 + 0.5) / 200) AS INT)
      = n_nationkey % 5
  AND CAST(FLOOR(((c_custkey * 104729) % 1000 + 0.5) / 200) AS INT)
      = CAST(FLOOR(n_nationkey / 5) AS INT))
"""

SQL_PIP_ANTI = """
SELECT c_custkey FROM customer WHERE NOT EXISTS (
  SELECT 1 FROM nation WHERE n_nationkey < 20
  AND CAST(FLOOR(((c_custkey * 7919) % 1000 + 0.5) / 200) AS INT)
      = n_nationkey % 5
  AND CAST(FLOOR(((c_custkey * 104729) % 1000 + 0.5) / 200) AS INT)
      = CAST(FLOOR(n_nationkey / 5) AS INT))
"""


def q_pip_left_unmatched(sf_dir: str):
    """LEFT PIP join (J2 'keep empty' semantics): only 20 rects → 20% of
    points carry a null nation."""
    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"), batch_format="pyarrow")
    nations = _nation_rects(pa.table(
        {"n_nationkey": pa.array(np.arange(25, dtype=np.int32))}), max_key=20)
    out = joins.pip_join(pts, nations, id_col="n_nationkey",
                         x_col="px", y_col="py", how="left")
    return out.select_columns(["c_custkey", "n_nationkey"])


SQL_PIP_LEFT = """
SELECT c_custkey, n_nationkey FROM customer LEFT JOIN nation
ON  n_nationkey < 20
AND CAST(FLOOR(((c_custkey * 7919) % 1000 + 0.5) / 200) AS INT) = n_nationkey % 5
AND CAST(FLOOR(((c_custkey * 104729) % 1000 + 0.5) / 200) AS INT) = CAST(FLOOR(n_nationkey / 5) AS INT)
"""


def q_knn_customer_supplier(sf_dir: str):
    """kNN join (J7 pattern): nearest supplier point per customer point,
    integer squared distance."""
    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"), batch_format="pyarrow")
    sup = _read_table(sf_dir, "supplier", ["s_suppkey"])
    sup = _points_batch(sup, "s_suppkey")
    out = joins.knn_join(pts, sup, k=1, id_col="s_suppkey",
                         x_col="px", y_col="py", tx_col="px", ty_col="py",
                         out_prefix="nn")

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["nn_dist"].to_numpy(zero_copy_only=False)
        d2 = np.rint(d * d).astype(np.int64)
        out = batch.select(["c_custkey"])
        out = out.append_column("nn_suppkey", pc.cast(batch["nn_id"], pa.int64()))
        return out.append_column("nn_dist2", pa.array(d2))

    return out.map_batches(finish, batch_format="pyarrow")


SQL_KNN = """
WITH cp AS (SELECT c_custkey, (c_custkey*7919)%1000 + 0.5 AS px, (c_custkey*104729)%1000 + 0.5 AS py FROM customer),
     sp AS (SELECT s_suppkey, (s_suppkey*7919)%1000 + 0.5 AS sx, (s_suppkey*104729)%1000 + 0.5 AS sy FROM supplier),
     d AS (SELECT c_custkey, s_suppkey,
                  CAST((px-sx)*(px-sx) + (py-sy)*(py-sy) AS BIGINT) AS dist2,
                  ROW_NUMBER() OVER (PARTITION BY c_custkey
                                     ORDER BY (px-sx)*(px-sx)+(py-sy)*(py-sy), s_suppkey) AS rn
           FROM cp, sp)
SELECT c_custkey, s_suppkey AS nn_suppkey, dist2 AS nn_dist2 FROM d WHERE rn = 1
"""


def q_zonal_acctbal_nation(sf_dir: str):
    """Zonal aggregate (raster↔vector family): per nation rect, point count
    + acctbal sum."""
    pts = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"), batch_format="pyarrow")
    nations = _nation_rects(pa.table(
        {"n_nationkey": pa.array(np.arange(25, dtype=np.int32))}))
    z = joins.zonal_stats(pts, nations, id_col="n_nationkey",
                          value_col="c_acctbal", x_col="px", y_col="py")
    df = z.to_pandas()[["n_nationkey", "n", "sum_value"]]
    df = df.rename(columns={"n": "n_points", "sum_value": "sum_acctbal"})
    return _round2(df, ["sum_acctbal"])


SQL_ZONAL = """
SELECT n_nationkey, COUNT(*) AS n_points, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer, nation
WHERE CAST(FLOOR(((c_custkey * 7919) % 1000 + 0.5) / 200) AS INT) = n_nationkey % 5
  AND CAST(FLOOR(((c_custkey * 104729) % 1000 + 0.5) / 200) AS INT) = CAST(FLOOR(n_nationkey / 5) AS INT)
GROUP BY n_nationkey
"""


def q_raster_grid_counts(sf_dir: str):
    """Vector→raster: rasterize customer points onto a 50-unit grid."""
    pts = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"), batch_format="pyarrow")
    r = joins.rasterize_points(pts, x_col="px", y_col="py",
                               value_col="c_acctbal", res=50.0)
    df = r.to_pandas()[["px", "py", "n", "value"]]
    df = df.rename(columns={"n": "n_points", "value": "sum_acctbal"})
    return _round2(df, ["sum_acctbal"])


SQL_RASTER = """
SELECT CAST(FLOOR(((c_custkey*7919)%1000 + 0.5)/50) AS BIGINT) AS px,
       CAST(FLOOR(((c_custkey*104729)%1000 + 0.5)/50) AS BIGINT) AS py,
       COUNT(*) AS n_points, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer GROUP BY 1, 2
"""


def q_raster_zonal_nation(sf_dir: str):
    """Raster→vector zonal: pixel aggregates joined back to nation rects."""
    pts = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"), batch_format="pyarrow")
    raster = joins.rasterize_points(pts, x_col="px", y_col="py",
                                    value_col="c_acctbal", res=50.0)
    nations = _nation_rects(pa.table(
        {"n_nationkey": pa.array(np.arange(25, dtype=np.int32))}))
    z = joins.raster_zonal(raster, nations, id_col="n_nationkey", res=50.0)
    df = z.to_pandas()[["n_nationkey", "zone_value", "zone_points", "zone_pixels"]]
    return _round2(df, ["zone_value"])


SQL_RASTER_ZONAL = """
WITH px AS (
  SELECT CAST(FLOOR(((c_custkey*7919)%1000 + 0.5)/50) AS BIGINT) AS gx,
         CAST(FLOOR(((c_custkey*104729)%1000 + 0.5)/50) AS BIGINT) AS gy,
         COUNT(*) AS n, SUM(c_acctbal) AS v
  FROM customer GROUP BY 1, 2)
SELECT n_nationkey, ROUND(SUM(v), 2) AS zone_value,
       CAST(SUM(n) AS BIGINT) AS zone_points,
       COUNT(*) AS zone_pixels
FROM px, nation
WHERE CAST(FLOOR((gx*50 + 25.0) / 200) AS INT) = n_nationkey % 5
  AND CAST(FLOOR((gy*50 + 25.0) / 200) AS INT) = CAST(FLOOR(n_nationkey / 5) AS INT)
GROUP BY n_nationkey
"""


# ------------------------------------------------- flagship (derived pages)

def _derived_pages(sf_dir: str, parallelism: int = 8):
    """Deterministic pages corpus derived from the documents table: url,
    warc_ts, html (geo meta + body from doc text), lang; 1% stale dups."""
    import datetime as _dt
    EPOCH = _dt.datetime(2026, 1, 1)

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        urls, ts, htmls, lg = [], [], [], []
        for i, t, lang in zip(ids, texts, langs):
            i = int(i)
            country = i % 3
            a = (i * 7919) % 1000
            b = (i * 104729) % 1000
            lng = (10 + 2 * country) + (a + 0.5) / 1000.0
            lat = 10 + (b + 0.5) / 1000.0
            html = (f'<html><head><meta name="geo" content="{lat:.6f};{lng:.6f}">'
                    f"</head><body><p>{t[:200]}</p></body></html>").encode()
            urls.append(f"https://example.org/doc/{i}")
            ts.append(EPOCH + _dt.timedelta(seconds=i))
            htmls.append(html)
            lg.append(lang)
            if i % 100 == 7:
                urls.append(f"https://example.org/doc/{i}")
                ts.append(EPOCH + _dt.timedelta(seconds=i) - _dt.timedelta(days=30))
                htmls.append(html.replace(b"<p>", b"<p>STALE "))
                lg.append(lang)
        return pa.table({"url": urls,
                         "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                         "html": pa.array(htmls, type=pa.binary()),
                         "lang": lg})

    return _read(sf_dir, "documents", ["doc_id", "text", "lang"]) \
        .map_batches(build, batch_format="pyarrow")


def _synth_region_rects() -> pa.Table:
    from ..io import synth
    return synth.regions_table()


def q_flagship_region_counts(sf_dir: str):
    """Headline pipeline: derived pages → parse (actor pool) → url dedup
    (latest wins) → S2 cells → PIP join vs regions → counts per region."""
    from .flagship import region_counts, run_flagship
    joined, _ = run_flagship(_derived_pages(sf_dir), _synth_region_rects())
    return region_counts(joined)[["gadm_code", "n_pages"]]


SQL_FLAGSHIP = """
WITH p AS (SELECT doc_id, doc_id % 3 AS country,
                  (doc_id*7919) % 1000 AS a, (doc_id*104729) % 1000 AS b
           FROM documents)
SELECT 'SYN' || CASE country WHEN 0 THEN 'A' WHEN 1 THEN 'B' ELSE 'C' END
       || '.' || CAST(CASE WHEN a < 500 THEN 1 ELSE 2 END AS VARCHAR)
       || '.' || CAST(CASE WHEN b < 500 THEN 1 ELSE 2 END AS VARCHAR)
       || '_1' AS gadm_code,
       COUNT(*) AS n_pages
FROM p GROUP BY 1
"""


def q_flagship_counts_streaming(sf_dir: str):
    """Single-execution flagship variant (the bench.py headline path):
    fused parse→tile→PIP emitting narrow columns, dedup-after-join +
    count in one bucketed groupby."""
    from .flagship import flagship_region_counts_streaming
    out = flagship_region_counts_streaming(_derived_pages(sf_dir),
                                           _synth_region_rects())
    return out[["gadm_code", "n_pages"]]


def q_dedup_url_latest(sf_dir: str):
    """url-exact dedup, latest warc_ts wins (D6) over the derived pages
    (with their 1% stale duplicates)."""
    from .flagship import PageParser, dedup_latest_by_url
    pages = _derived_pages(sf_dir)
    parsed = pages.map_batches(PageParser, batch_format="pyarrow",
                               batch_size=2048, concurrency=2,
                               zero_copy_batch=True)
    out = dedup_latest_by_url(parsed)
    return out.select_columns(["url", "warc_ts"])


SQL_DEDUP_URL = """
WITH base AS (
  SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
         TIMESTAMP '2026-01-01' + doc_id * INTERVAL 1 SECOND AS warc_ts,
         doc_id FROM documents),
 stale AS (
  SELECT url, warc_ts - INTERVAL 30 DAY AS warc_ts, doc_id FROM base
  WHERE doc_id % 100 = 7)
SELECT url, MAX(warc_ts) AS warc_ts
FROM (SELECT url, warc_ts FROM base UNION ALL SELECT url, warc_ts FROM stale)
GROUP BY url
"""


# ------------------------------------------------------- relational queries

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: partial per-batch aggregation before the groupby
    shuffle (guide §Aggregation at scale)."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch["l_shipdate"],
                                       pa.scalar(np.datetime64("1998-09-01", "us"))))
        df = t.to_pandas()
        df["disc_price"] = df.l_extendedprice * (1 - df.l_discount)
        agg = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("l_quantity", "sum"), p_base=("l_extendedprice", "sum"),
            p_disc=("disc_price", "sum"), p_n=("l_quantity", "count"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum
    out = li.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_base", alias_name="sum_base_price"),
            Sum("p_disc", alias_name="sum_disc_price"),
            Sum("p_n", alias_name="count_order"))
    df = out.to_pandas()
    df["count_order"] = df["count_order"].astype("int64")
    return _round2(df, ["sum_qty", "sum_base_price", "sum_disc_price"])


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders_by_revenue(sf_dir: str):
    """Top-k (O2 analogue): top 10 orders by lineitem revenue."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["rev"] = df.l_extendedprice * (1 - df.l_discount)
        agg = df.groupby("l_orderkey", as_index=False).agg(p_rev=("rev", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum
    per_order = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("p_rev", alias_name="revenue"))
    top = per_order.sort("revenue", descending=True).limit(10).to_pandas()
    return _round2(top[["l_orderkey", "revenue"]], ["revenue"])


SQL_TOP_ORDERS = """
SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_orderkey
ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, l_orderkey LIMIT 10
"""


def q_nation_order_totals(sf_dir: str):
    """Broadcast dimension join chain: customer ⋈ nation (broadcast) ⋈
    orders, totals per nation."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    nation = nation.rename_columns(["c_nationkey", "n_name"])
    enriched = relational.broadcast_join(cust, nation, on="c_nationkey")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    # chain the second (large×large at scale) join lazily through the
    # bucketed shuffle join — no driver-side materialize between the joins
    cust_keyed = enriched.map_batches(
        lambda t: t.select(["c_custkey", "n_name"])
                   .rename_columns(["o_custkey", "n_name"]),
        batch_format="pyarrow")
    def partial(t: pa.Table) -> pa.Table:
        # pre-aggregate INSIDE the bucket join task so the final groupby
        # shuffle moves <=25 rows per bucket instead of every joined row
        agg = t.group_by("n_name").aggregate(
            [("o_totalprice", "count"), ("o_totalprice", "sum")])
        return pa.table({"n_name": agg["n_name"],
                         "p_n": agg["o_totalprice_count"].cast(pa.int64()),
                         "p_total": agg["o_totalprice_sum"]})

    joined = relational.bucketed_hash_join(orders, cust_keyed, on="o_custkey",
                                           num_buckets=16, combine=partial)

    from ray.data.aggregate import Sum
    out = joined.groupby("n_name").aggregate(
        Sum("p_n", alias_name="n_orders"),
        Sum("p_total", alias_name="total"))
    df = out.to_pandas()
    df["n_orders"] = df["n_orders"].astype("int64")
    return _round2(df[["n_name", "n_orders", "total"]], ["total"])


SQL_NATION_TOTALS = """
SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_bucketed_join_segment_totals(sf_dir: str):
    """Large×large partitioned hash join (explicit bucket shuffle)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
                     batch_format="pyarrow")
    joined = relational.bucketed_hash_join(orders, cust, on="o_custkey",
                                           num_buckets=16)
    from ray.data.aggregate import Count, Sum
    out = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
    df = out.to_pandas()
    df["n_orders"] = df["n_orders"].astype("int64")
    return _round2(df[["c_mktsegment", "n_orders", "total"]], ["total"])


SQL_SEGMENT_TOTALS = """
SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_bucketed_join_string_key(sf_dir: str):
    """Large×large bucketed join on a STRING key — pins down bucket-hash
    process stability (a per-process-seeded hash would silently drop rows
    here because the two sides bucket in different worker processes)."""
    import pyarrow.compute as pc

    def add_skey(col):
        def f(t: pa.Table) -> pa.Table:
            s = pc.binary_join_element_wise(
                "C", pc.cast(t[col], pa.string()), "-")
            return t.append_column("skey", s).drop_columns([col])
        return f

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(add_skey("o_custkey"), batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(add_skey("c_custkey"), batch_format="pyarrow")
    joined = relational.bucketed_hash_join(orders, cust, on="skey",
                                           num_buckets=16)
    from ray.data.aggregate import Count, Sum
    out = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
    df = out.to_pandas()
    df["n_orders"] = df["n_orders"].astype("int64")
    return _round2(df[["c_mktsegment", "n_orders", "total"]], ["total"])


SQL_SEGMENT_TOTALS_STR = """
SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
FROM orders JOIN customer
  ON ('C-' || CAST(o_custkey AS VARCHAR)) = ('C-' || CAST(c_custkey AS VARCHAR))
GROUP BY c_mktsegment
"""


def q_orders_status_counts(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    from ray.data.aggregate import Count, Sum
    out = orders.groupby("o_orderstatus").aggregate(
        Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
    df = out.to_pandas()
    df["n"] = df["n"].astype("int64")
    return _round2(df[["o_orderstatus", "n", "total"]], ["total"])


SQL_STATUS = """
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
"""


def q_topk_parts_by_price(sf_dir: str):
    parts = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    top = parts.sort(["p_retailprice", "p_partkey"],
                     descending=[True, False]).limit(20)
    return top.to_pandas()


SQL_TOPK_PARTS = """
SELECT p_partkey, p_retailprice FROM part
ORDER BY p_retailprice DESC, p_partkey LIMIT 20
"""


def q_distinct_event_types(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_type"])
    out = ev.groupby("event_type").count().to_pandas()
    out = out.rename(columns={"count()": "n"})
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "n"]]


SQL_EVENT_TYPES = "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"


def q_semi_customers_with_orders(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_custkey"])
    keys = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow")
    return relational.semi_join(cust, keys, on="c_custkey")


SQL_SEMI = """
SELECT c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_anti_customers_without_orders(sf_dir: str):
    """Anti join via the SHUFFLE semi-join path (key side too large to
    broadcast at scale) — also oracle coverage for bucketed_semi_join."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    keys = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow")
    df = relational.bucketed_semi_join(cust, keys, on="c_custkey",
                                       anti=True).to_pandas()
    if df.empty:  # keep the schema on an empty result
        df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return df


SQL_ANTI = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_window_user_activity(sf_dir: str):
    """Tumbling 1-hour windows per user over the events stream table
    (streaming-shaped workload; guide §Streaming-shaped)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = relational.windowed_aggregate(ev, "user_id", "ts", "value", 3600)
    df = out.to_pandas()
    df["n_events"] = df["n_events"].astype("int64")
    df = df.rename(columns={"window": "win"})
    return _round2(df[["user_id", "win", "sum_value", "n_events", "max_value"]],
                   ["sum_value", "max_value"])


SQL_WINDOW = """
SELECT user_id, CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS win,
       ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n_events,
       ROUND(MAX(value), 2) AS max_value
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------------ text / dedup / sim

def q_asof_last_purchase(sf_dir: str):
    """As-of join: every click matched to the SAME user's latest prior
    purchase (inner semantics).  The right side's join timestamp is carried
    through as a plain int64 epoch-us column computed arrow-side before any
    pandas conversion, so no datetime-unit coercion can touch it."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts"])

    def prep_right(t: pa.Table) -> pa.Table:
        t = t.append_column("purchase_ts_us", t["ts"].cast(pa.int64()))
        t = t.append_column("purchase_value", t["value"])
        return t.select(["user_id", "ts", "purchase_ts_us", "purchase_value"])

    purchases = ev.filter(expr="event_type == 'purchase'") \
        .map_batches(prep_right, batch_format="pyarrow")
    out = relational.asof_join(clicks, purchases, on="ts", by="user_id",
                               num_buckets=16)
    return out.select_columns(["event_id", "user_id", "purchase_ts_us",
                               "purchase_value"])


SQL_ASOF = """
SELECT c.event_id, c.user_id,
       epoch_us(p.ts) AS purchase_ts_us, p.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT user_id, ts, value FROM events
           WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_band_join_click_purchase(sf_dir: str):
    """Range (band) join: every click × purchase pair within ±15 minutes,
    across all users — exercises the neighbor-bucket replication path
    (bucket width == radius) that makes a non-equi join shuffle-safe."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def prep(name):
        def f(t: pa.Table) -> pa.Table:
            t = t.append_column("ts_us", t["ts"].cast(pa.int64()))
            return t.select(["event_id", "ts_us"]) \
                .rename_columns([name, "ts_us"])
        return f

    clicks = ev.filter(expr="event_type == 'click'") \
        .map_batches(prep("click_id"), batch_format="pyarrow")
    purch = ev.filter(expr="event_type == 'purchase'") \
        .map_batches(prep("purchase_id"), batch_format="pyarrow")
    out = relational.band_join(clicks, purch, on="ts_us",
                               radius=900_000_000)

    def finish(t: pa.Table) -> pa.Table:
        dt = pc.subtract(t["ts_us_r"], t["ts_us"])
        return pa.table({"click_id": t["click_id"],
                         "purchase_id": t["purchase_id"],
                         "dt_us": dt})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_BAND = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS dt_us
FROM (SELECT event_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 900000000
"""


def q_sample_documents(sf_dir: str):
    """Deterministic 5% hash sample of the corpus — reproducible, shuffle-free
    subsampling (rate in ppm so the arithmetic is exact on both sides)."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return relational.deterministic_sample(docs, key_col="doc_id",
                                           rate_ppm=50_000, seed=1)


SQL_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
       % 18446744073709551616) % 1000000 < 50000
"""


def q_exact_dedup_documents(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dd.exact_dedup(docs, text_col="text", key_col="doc_id") \
        .select_columns(["doc_id"])


SQL_EXACT_DEDUP = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


def q_token_counts_by_lang(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    counted = docs.map_batches(token_count_batch, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum
    out = counted.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("tokens_ws", alias_name="sum_tokens_ws"),
        Sum("tokens_re", alias_name="sum_tokens_re"))
    df = out.to_pandas()
    for c in ("n_docs", "sum_tokens_ws", "sum_tokens_re"):
        df[c] = df[c].astype("int64")
    return df[["lang", "n_docs", "sum_tokens_ws", "sum_tokens_re"]]


SQL_TOKENS = r"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens_ws,
       CAST(SUM(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT)
         AS sum_tokens_re
FROM documents GROUP BY lang
"""


def q_quality_stats_by_lang(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    scored = docs.map_batches(text.QualityScorer, batch_format="pandas",
                              concurrency=2)
    from ray.data.aggregate import Count, Sum
    out = scored.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("q_chars", alias_name="sum_chars"),
        Sum("q_words", alias_name="sum_words"))
    df = out.to_pandas()
    for c in ("n_docs", "sum_chars", "sum_words"):
        df[c] = df[c].astype("int64")
    return df[["lang", "n_docs", "sum_chars", "sum_words"]]


SQL_QUALITY = r"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(len(regexp_extract_all(text, '\w+'))) AS BIGINT) AS sum_words
FROM documents GROUP BY lang
"""


def q_pii_redaction(sf_dir: str):
    """PII redaction (emails / phones / IPv4 → typed placeholders, with
    per-doc counts).  The raw word-salad corpus carries no PII, so each
    doc is first seeded with deterministic synthetic PII derived from
    doc_id — the same derivation the SQL oracle performs — making the
    replacement semantics hash-checkable end to end.  Redaction itself is
    ``redact_pii_batch``: chained RE2 count+replace, arrow-native."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        idn = ids.to_numpy(zero_copy_only=False)
        j = pc.binary_join_element_wise
        email = j(" contact user", pc.cast(ids, pa.string()),
                  "@mail.example.com now", "")
        phone = j(" call 415-555-",
                  pc.utf8_lpad(pc.cast(pa.array(idn % 10000), pa.string()),
                               4, padding="0"), "")
        ip = j(" from 10.0.", pc.cast(pa.array(idn % 256), pa.string()),
               ".25", "")
        z = pa.scalar("")
        t0 = j(batch["text"],
               pc.if_else(pa.array(idn % 3 == 0), email, z),
               pc.if_else(pa.array(idn % 5 == 0), phone, z),
               pc.if_else(pa.array(idn % 7 == 0), ip, z), "")
        return pa.table({"doc_id": ids, "text": t0})

    out = docs.map_batches(enrich, batch_format="pyarrow") \
        .map_batches(text.redact_pii_batch, batch_format="pyarrow")
    return out.select_columns(
        ["doc_id", "n_email", "n_phone", "n_ipv4", "text_redacted"])


SQL_PII = r"""
WITH e AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail.example.com now' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.'
            || CAST(doc_id % 256 AS VARCHAR) || '.25' ELSE '' END AS t0
  FROM documents),
 s1 AS (SELECT doc_id,
        len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM e),
 s2 AS (SELECT *, len(regexp_extract_all(t1, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
        regexp_replace(t1, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS t2 FROM s1),
 s3 AS (SELECT *, len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
        regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t3 FROM s2)
SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
       CAST(n_phone AS BIGINT) AS n_phone,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4, t3 AS text_redacted
FROM s3
"""


def q_url_canonical_dedup(sf_dir: str):
    """URL canonicalization + variant-collapse report: each group of 4
    docs yields 4 raw-URL variants of one logical page (tracking params,
    fragment, uppercase host + trailing slash); canonicalization must
    collapse them to a single key with n_variants=4."""
    from ..stages import urls as us
    docs = _read(sf_dir, "documents", ["doc_id"])

    def synth_urls(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        base = ids // 4
        v = ids % 4
        b_str = pc.cast(pa.array(base), pa.string())
        j = pc.binary_join_element_wise
        plain = j("https://example.org/doc/", b_str, "")
        track = j("https://example.org/doc/", b_str,
                  "/?utm_source=feed&utm_campaign=x", "")
        frag = j("https://example.org/doc/", b_str, "#section-2", "")
        upper = j("HTTPS://EXAMPLE.org/doc/", b_str, "/", "")
        u = pc.if_else(pa.array(v == 1), track,
                       pc.if_else(pa.array(v == 2), frag,
                                  pc.if_else(pa.array(v == 3), upper, plain)))
        return pa.table({"doc_id": batch["doc_id"], "url": u})

    out = docs.map_batches(synth_urls, batch_format="pyarrow")
    df = us.canonical_url_groups(out, url_col="url", id_col="doc_id") \
        .to_pandas()
    df["n_variants"] = df["n_variants"].astype("int64")
    return df[["canonical_url", "n_variants", "min_doc_id"]]


SQL_URL_CANON = r"""
WITH raw AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 1 THEN 'https://example.org/doc/' || CAST(doc_id // 4 AS VARCHAR)
                       || '/?utm_source=feed&utm_campaign=x'
           WHEN 2 THEN 'https://example.org/doc/' || CAST(doc_id // 4 AS VARCHAR)
                       || '#section-2'
           WHEN 3 THEN 'HTTPS://EXAMPLE.org/doc/' || CAST(doc_id // 4 AS VARCHAR) || '/'
           ELSE 'https://example.org/doc/' || CAST(doc_id // 4 AS VARCHAR)
         END AS url
  FROM documents),
 canon AS (
  SELECT doc_id,
   regexp_replace(
    regexp_replace(
     regexp_replace(
      regexp_replace(
       regexp_replace(
        CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://')
             THEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)', 1)) || '://'
                  || lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)', 2))
                  || regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)
             ELSE url END,
        '#.*$', ''),
       '[?&]utm_[A-Za-z_]*=[^&#]*', '', 'g'),
      '^([^?]*)&', '\1?'),
     '[?&]$', ''),
    '(://[^/?#]*/[^?#]*?)/+$', '\1') AS canonical_url
  FROM raw)
SELECT canonical_url, COUNT(*) AS n_variants, MIN(doc_id) AS min_doc_id
FROM canon GROUP BY canonical_url
"""


def q_paragraph_dedup(sf_dir: str):
    """Paragraph-level duplication profile (CCNet semantics): docs are
    given 0-2 deterministic boilerplate paragraphs (social-share on
    doc_id%3, subscribe on doc_id%5) so corpus-wide duplicate paragraphs
    exist; the operator must flag exactly those and leave each doc's
    unique body paragraph unflagged."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        idn = ids.to_numpy(zero_copy_only=False)
        j = pc.binary_join_element_wise
        z = pa.scalar("")
        share = pa.scalar("\n\nShare this article on social media")
        subsc = pa.scalar("\n\nSubscribe to our newsletter today")
        t0 = j(batch["text"],
               pc.if_else(pa.array(idn % 3 == 0), share, z),
               pc.if_else(pa.array(idn % 5 == 0), subsc, z), "")
        return pa.table({"doc_id": ids, "text": t0})

    out = dd.paragraph_dedup_stats(
        docs.map_batches(enrich, batch_format="pyarrow"))
    return out.select_columns(["doc_id", "n_paras", "n_dup_paras",
                               "dup_frac"])


SQL_PARA_DEDUP = """
WITH e AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0
            THEN chr(10) || chr(10) || 'Share this article on social media'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN chr(10) || chr(10) || 'Subscribe to our newsletter today'
            ELSE '' END AS t0
  FROM documents),
 paras AS (
  SELECT doc_id, unnest(string_split(t0, chr(10) || chr(10))) AS para FROM e),
 cnt AS (
  SELECT para, COUNT(*) AS c FROM paras GROUP BY para)
SELECT p.doc_id, COUNT(*) AS n_paras,
       CAST(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       ROUND(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS dup_frac
FROM paras p JOIN cnt c ON p.para = c.para
GROUP BY p.doc_id
"""


def q_acctbal_quantiles(sf_dir: str):
    """Exact per-nation acctbal quartiles via the two-pass histogram
    selection operator (no per-group full sort; see
    ``grouped_quantile_disc``).  quantile_disc semantics — the oracle's
    native aggregate."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    df = relational.grouped_quantile_disc(
        cust, key_col="c_nationkey", val_col="c_acctbal",
        qs=[0.25, 0.5, 0.75])
    df["c_nationkey"] = df["c_nationkey"].astype("int32")
    return df[["c_nationkey", "p25", "p50", "p75"]]


SQL_QUANTILES = """
SELECT c_nationkey,
       quantile_disc(c_acctbal, 0.25) AS p25,
       quantile_disc(c_acctbal, 0.5)  AS p50,
       quantile_disc(c_acctbal, 0.75) AS p75
FROM customer GROUP BY c_nationkey
"""


def q_sessionize_events(sf_dir: str):
    """Gap-based sessionization of the event stream (8 h inactivity gap):
    one row per (user, session ordinal) with event count, bounds and
    duration — single-shuffle operator, oracle = the classic
    LAG/SUM-OVER window-function sessionization."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    out = relational.sessionize(ev, user_col="user_id", ts_col="ts",
                                gap_sec=28800)
    return out.select_columns(["user_id", "session_idx", "n_events",
                               "start_ts", "end_ts", "duration_sec"])


SQL_SESSIONIZE = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 28800
              THEN 1 ELSE 0 END AS new_s
  FROM events),
 s AS (SELECT user_id, ts,
              SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess
       FROM o)
SELECT user_id, CAST(sess AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       CAST(FLOOR(epoch(MAX(ts) - MIN(ts))) AS BIGINT) AS duration_sec
FROM s GROUP BY user_id, sess
"""


#: decomposed-unicode + messy-whitespace suffix appended to even doc_ids so
#: normalization has real work (NFC composition, case fold, run collapse,
#: trim); embedded verbatim into the SQL literal too
_NORM_SUFFIX = "   Cafe\u0301  NAI\u0308VE\t"  # decomposed accents: NFC composes them


def q_normalize_text(sf_dir: str):
    """Unicode/whitespace normalization profile: NFC, lowercase, collapse
    whitespace runs, trim — with a per-doc changed flag.  Even doc_ids get
    a decomposed-accent messy-whitespace suffix so the kernels are
    exercised; odd docs must come back unchanged (changed=0)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        idn = batch["doc_id"].to_numpy(zero_copy_only=False)
        t0 = pc.binary_join_element_wise(
            batch["text"],
            pc.if_else(pa.array(idn % 2 == 0), pa.scalar(_NORM_SUFFIX),
                       pa.scalar("")), "")
        return pa.table({"doc_id": batch["doc_id"], "text": t0})

    out = docs.map_batches(enrich, batch_format="pyarrow") \
        .map_batches(text.normalize_text_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "text_norm", "changed"])


SQL_NORMALIZE = r"""
WITH e AS (
  SELECT doc_id,
         text || CASE WHEN doc_id %% 2 = 0 THEN '%s' ELSE '' END AS t0
  FROM documents),
 n AS (
  SELECT doc_id, t0,
         regexp_replace(
           regexp_replace(lower(nfc_normalize(t0)), '\s+', ' ', 'g'),
           '^ +| +$', '', 'g') AS text_norm
  FROM e)
SELECT doc_id, text_norm,
       CASE WHEN t0 <> text_norm THEN 1 ELSE 0 END AS changed
FROM n
""" % _NORM_SUFFIX


def q_top_words(sf_dir: str):
    """Corpus heavy hitters: global top-20 words (partial counts →
    vocab groupby → per-block prune → tiny sort)."""
    docs = _read(sf_dir, "documents", ["text"])
    return text.top_k_words(docs, k=20).select(["word", "n"])


SQL_TOP_WORDS = """
SELECT w AS word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY n DESC, word ASC LIMIT 20
"""


def q_zipf_slope(sf_dir: str):
    """Corpus-statistics fit: OLS slope of ln(freq) over ln(rank) for
    the top-200 words — the Zipf exponent a healthy natural-language
    corpus keeps near −1 (a monitoring signal for template/boilerplate
    collapse).  Reuses the heavy-hitter machinery (partial counts →
    vocab groupby → prune); the 200-point regression finishes on the
    driver with exact-int counts and deterministic (n DESC, word ASC)
    ranks."""
    docs = _read(sf_dir, "documents", ["text"])
    top = text.top_k_words(docs, k=200).select(["word", "n"]) \
        .to_pandas().sort_values(["n", "word"],
                                 ascending=[False, True])
    r = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    f = np.log(top["n"].to_numpy(dtype=np.float64))
    rm, fm = r.mean(), f.mean()
    slope = ((r - rm) * (f - fm)).sum() / ((r - rm) ** 2).sum()
    return pd.DataFrame([{"n_words": len(top),
                          "zipf_slope": float(np.round(slope, 4))}])


SQL_ZIPF = """
WITH c AS (
  SELECT w, COUNT(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w ORDER BY n DESC, w ASC LIMIT 200),
r AS (SELECT ln(n) AS lf,
             ln(ROW_NUMBER() OVER (ORDER BY n DESC, w ASC)) AS lr
      FROM c)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       ROUND(SUM((lr - (SELECT AVG(lr) FROM r))
                 * (lf - (SELECT AVG(lf) FROM r)))
             / SUM((lr - (SELECT AVG(lr) FROM r))
                   * (lr - (SELECT AVG(lr) FROM r))), 4) AS zipf_slope
FROM r
"""


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users over the event stream —
    the COUNT(DISTINCT) scale path (16 KiB sketch per block, max-merge;
    no key shuffle).  Deterministic across parallelism (register merge is
    partitioning-invariant) but approximate by construction, so
    rows-only: the error bound and determinism are pinned by pytest
    instead of a SQL oracle."""
    from ..stages import sketches
    ev = _read(sf_dir, "events", ["user_id"])
    return sketches.approx_distinct(ev, key_col="user_id")


def q_grouped_approx_distinct(sf_dir: str):
    """Per-event-type approximate distinct users via sparse-register HLL
    (one narrow (group, register) shuffle — COUNT(DISTINCT) per key with
    no key-column exchange).  Rows-only: approximate; the ≈1 % error
    bound and partition invariance are pytest-pinned."""
    from ..stages import sketches
    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return sketches.grouped_approx_distinct(ev, group_col="event_type",
                                            key_col="user_id") \
        .to_pandas()


def q_corr_qty_price(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs extended price
    from mergeable sufficient statistics (one narrow shuffle)."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    df = relational.grouped_corr(li, "l_returnflag", "l_quantity",
                                 "l_extendedprice")
    return df[["l_returnflag", "n", "corr"]]


SQL_CORR = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr
FROM lineitem GROUP BY l_returnflag
"""


def q_top_orders_per_priority(sf_dir: str):
    """Top-3 orders per order-priority by total price (ROW_NUMBER <= n
    window pattern; per-batch prune keeps the shuffle at n*groups rows
    per batch)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = relational.grouped_top_n(orders, key_col="o_orderpriority",
                                   order_col="o_totalprice", n=3,
                                   id_col="o_orderkey")
    df = out.to_pandas()
    return df[["o_orderpriority", "rnk", "o_orderkey", "o_totalprice"]]


SQL_TOP_PER_PRIORITY = """
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3
"""


def q_semi_customers_bloom(sf_dir: str):
    """Same semantics as semi_customers_with_orders, executed through the
    Bloom-prefiltered semi join: the keys side folds to a fixed bitmap,
    non-matching customers drop BEFORE the shuffle, the exact bucketed
    semi join removes Bloom false positives."""
    from ..stages import sketches
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"]) \
        .map_batches(lambda t: t.rename_columns(["c_custkey"]),
                     batch_format="pyarrow")
    return sketches.bloom_semi_join(cust, orders, on="c_custkey")


SQL_SEMI_BLOOM = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def q_sliding_window_activity(sf_dir: str):
    """Sliding 1-hour windows every 15 minutes per user: each event lands
    in 4 windows via a vectorized membership explode collapsed by
    in-batch partial aggregation before the shuffle."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = relational.sliding_window_aggregate(ev, "user_id", "ts", "value",
                                              window_sec=3600,
                                              slide_sec=900)
    df = out.to_pandas()
    return _round2(df[["user_id", "window_start", "sum_value", "n_events"]],
                   ["sum_value"])


SQL_SLIDING = """
WITH e AS (
  SELECT user_id, value,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 900 AS tidx
  FROM events),
 m AS (
  SELECT user_id, value, (tidx - j) * 900 AS window_start
  FROM e, unnest(generate_series(0, 3)) AS t(j))
SELECT user_id, window_start, ROUND(SUM(value), 2) AS sum_value,
       COUNT(*) AS n_events
FROM m GROUP BY user_id, window_start
"""


def q_rare_word_stats(sf_dir: str):
    """Hapax/low-DF word-type density per doc.  The tiny natural
    vocabulary makes every raw word common, so each doc gains one
    df=2 'duo' token (shared with its pair doc) and even docs gain one
    df=1 'uq' hapax - exercising both rarity classes while the common
    head flags through the broadcast path."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        idn = ids.to_numpy(zero_copy_only=False)
        j = pc.binary_join_element_wise
        duo = j(" duo", pc.cast(pa.array(idn // 2), pa.string()), "")
        uq = j(" uq", pc.cast(ids, pa.string()), "")
        t0 = j(batch["text"], duo,
               pc.if_else(pa.array(idn % 2 == 0), uq, pa.scalar("")), "")
        return pa.table({"doc_id": ids, "text": t0})

    out = text.rare_word_stats(
        docs.map_batches(enrich, batch_format="pyarrow"))
    return out.select_columns(["doc_id", "n_types", "n_rare_types",
                               "rare_frac"])


SQL_RARE_WORDS = """
WITH e AS (
  SELECT doc_id, text || ' duo' || CAST(doc_id // 2 AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0
                 THEN ' uq' || CAST(doc_id AS VARCHAR) ELSE '' END AS t0
  FROM documents),
 w AS (SELECT DISTINCT doc_id, unnest(string_split(t0, ' ')) AS w FROM e),
 df AS (SELECT w, COUNT(*) AS df FROM w GROUP BY w),
 j AS (SELECT doc_id, CASE WHEN df.df <= 2 THEN 1 ELSE 0 END AS rare
       FROM w JOIN df ON w.w = df.w)
SELECT doc_id, COUNT(*) AS n_types,
       CAST(SUM(rare) AS BIGINT) AS n_rare_types,
       FLOOR(SUM(rare) * 10000.0 / COUNT(*)) / 10000 AS rare_frac
FROM j GROUP BY doc_id
"""


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality filters over the raw corpus: the
    word-salad documents carry natural repetition (small vocabulary), so
    no enrichment is needed — per-doc top-word / top-bigram dominance is a
    direct measure, hash-checked against the string-counting SQL twin."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(text.repetition_stats_batch,
                           batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_words", "top_word_n",
                               "top_bigram_n", "top_word_frac",
                               "top_bigram_frac"])


SQL_REPETITION = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
 wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
 tw AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(MAX(c) AS BIGINT) AS top_word_n FROM wc GROUP BY doc_id),
 lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
 bg AS (SELECT doc_id, l[k] || ' ' || l[k+1] AS b
        FROM lists, unnest(generate_series(1, len(l)-1)) AS t(k)),
 bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
 tb AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n
        FROM bc GROUP BY doc_id)
SELECT tw.doc_id, tw.n_words, tw.top_word_n,
       COALESCE(tb.top_bigram_n, 0) AS top_bigram_n,
       FLOOR(tw.top_word_n * 10000.0 / GREATEST(tw.n_words, 1)) / 10000
         AS top_word_frac,
       FLOOR(COALESCE(tb.top_bigram_n, 0) * 10000.0
             / GREATEST(tw.n_words - 1, 1)) / 10000 AS top_bigram_frac
FROM tw LEFT JOIN tb ON tw.doc_id = tb.doc_id
"""


_FILT_MIN_TOKENS, _FILT_MAX_TWF = 20, 0.13


def q_corpus_filter_decision(sf_dir: str):
    """The capstone corpus-hygiene decision (C4/Gopher-style): language
    known, document long enough, not top-word-dominated — one fused map
    chaining LangId → token counts → repetition stats → a vectorized
    keep/reason verdict per doc (reason is a bitmask: 1 = too short,
    2 = repetitive, 4 = language unknown).  Every heuristic reuses an
    already-oracled kernel, and the SQL twin reassembles the identical
    expressions, so the final DECISION is hash-checked end to end."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = docs.map_batches(text.LangId, batch_format="pandas",
                          concurrency=(1, 4))
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    ds = ds.map_batches(text.repetition_stats_batch,
                        batch_format="pyarrow")

    ds = ds.map_batches(
        lambda t: text.filter_decision_batch(
            t, min_tokens=_FILT_MIN_TOKENS,
            max_top_word_frac=_FILT_MAX_TWF),
        batch_format="pyarrow")
    out = ds.to_pandas()
    out = out[["doc_id", "lang_pred", "tokens_ws", "top_word_frac",
               "keep", "reason"]]
    return out.astype({"tokens_ws": "int64", "keep": "int64",
                       "reason": "int64"})


def _corpus_filter_sql() -> str:
    langs = list(text._LANG_PROFILES)
    pats = {
        lg: r"\b(?:" + "|".join(sorted(prof, key=len, reverse=True)) + r")\b"
        for lg, prof in text._LANG_PROFILES.items()}
    counts = ",\n    ".join(
        f"length(regexp_extract_all(lower(text), '{pats[lg]}')) AS c_{lg}"
        for lg in langs)
    all_c = ", ".join(f"c_{lg}" for lg in langs)
    branches = []
    for i, lg in enumerate(langs):
        conds = " AND ".join(f"c_{lg} >= c_{other}" for other in langs[i + 1:])
        branches.append(f"WHEN {conds or 'TRUE'} THEN '{lg}'")
    case = "\n      ".join(branches)
    return f"""
WITH scored AS (
  SELECT doc_id, text,
    {counts}
  FROM documents
),
pred AS (
  SELECT doc_id, text,
    CASE WHEN GREATEST({all_c}) = 0 THEN 'und'
      {case}
    END AS lang_pred,
    len(string_split(text, ' ')) AS tokens_ws
  FROM scored
),
wc AS (SELECT doc_id, w, COUNT(*) AS c
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents) GROUP BY doc_id, w),
tw AS (SELECT doc_id,
              FLOOR(MAX(c) * 10000.0 / GREATEST(SUM(c), 1)) / 10000
                AS top_word_frac
       FROM wc GROUP BY doc_id),
j AS (
  SELECT p.doc_id, p.lang_pred, p.tokens_ws, tw.top_word_frac,
         (CASE WHEN p.tokens_ws < {_FILT_MIN_TOKENS} THEN 1 ELSE 0 END
          + CASE WHEN tw.top_word_frac > {_FILT_MAX_TWF} THEN 2 ELSE 0 END
          + CASE WHEN p.lang_pred = 'und' THEN 4 ELSE 0 END) AS reason
  FROM pred p JOIN tw ON tw.doc_id = p.doc_id
)
SELECT doc_id, lang_pred, CAST(tokens_ws AS BIGINT) AS tokens_ws,
       top_word_frac,
       CAST(CASE WHEN reason = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(reason AS BIGINT) AS reason
FROM j
"""


SQL_CORPUS_FILTER = _corpus_filter_sql()


def q_order_share_by_status(sf_dir: str):
    """Percent-of-total (SUM OVER () window): order-value share per
    status, exact on integer cents — per-batch partials, one tiny
    groupby, scalar total broadcast in the final map."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                    pa.int64())
        g = pa.table({"o_orderstatus": t["o_orderstatus"], "pc": c}) \
            .group_by("o_orderstatus").aggregate([("pc", "sum")])
        return pa.table({"o_orderstatus": g["o_orderstatus"],
                         "pcs": g["pc_sum"].cast(pa.int64())})

    agg = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(Sum("pcs", alias_name="c")) \
        .to_pandas()
    total = int(agg["c"].sum())
    agg["revenue"] = agg["c"] / 100.0
    agg["share"] = (agg["c"] / total).round(6)
    return agg[["o_orderstatus", "revenue", "share"]] \
        .sort_values("o_orderstatus").reset_index(drop=True)


SQL_ORDER_SHARE = """
SELECT o_orderstatus,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
         AS revenue,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) * 1.0
             / SUM(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)))
                 OVER (), 6) AS share
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_corpus_diff(sf_dir: str):
    """Snapshot diff (crawl-over-crawl CDC): compare the corpus with a
    deterministic 'next crawl' (drop doc_id%7==0, change text of %5==0,
    add 50 new ids) and emit per-doc status added/removed/changed/same
    — ONE full-outer bucketed join + a vectorized status map."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()

    def next_crawl(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 7 != 0
        tt = t.filter(pa.array(keep))
        ids2 = tt["doc_id"].to_numpy(zero_copy_only=False)
        changed = ids2 % 5 == 0
        txt = tt["text"].to_pandas()
        txt[changed] = txt[changed] + " v2"
        return pa.table({"doc_id": tt["doc_id"],
                         "text_new": pa.array(txt)})

    new = docs.map_batches(next_crawl, batch_format="pyarrow")
    extra = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, n + 50, dtype=np.int64)),
        "text_new": pa.array(["brand new page"] * 50)}))
    new = new.union(extra)

    j = relational.bucketed_hash_join(
        docs.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "text_old": t["text"]}),
            batch_format="pyarrow"),
        new, on="doc_id", how="outer")

    def status(t: pa.Table) -> pa.Table:
        old = t["text_old"].to_pandas()
        nw = t["text_new"].to_pandas()
        st = np.where(old.isna(), "added",
                      np.where(nw.isna(), "removed",
                               np.where(old == nw, "same", "changed")))
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "status": pa.array(st.astype(object),
                                            type=pa.string())})

    return j.map_batches(status, batch_format="pyarrow")


SQL_CORPUS_DIFF = """
WITH nw AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0 THEN ' v2' ELSE '' END
           AS text_new
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT (SELECT COUNT(*) FROM documents) + g AS doc_id,
         'brand new page' AS text_new
  FROM generate_series(0, 49) t(g))
SELECT COALESCE(d.doc_id, nw.doc_id) AS doc_id,
       CASE WHEN d.doc_id IS NULL THEN 'added'
            WHEN nw.doc_id IS NULL THEN 'removed'
            WHEN d.text = nw.text_new THEN 'same'
            ELSE 'changed' END AS status
FROM documents d FULL OUTER JOIN nw ON nw.doc_id = d.doc_id
"""


def q_sample_n_per_lang(sf_dir: str):
    """Exact-N-per-group sampling (3 docs per lang): deterministic
    golden-ratio hash order + the per-batch-pruned grouped top-n — the
    fixed-budget stratified variant."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    mix = np.uint64(relational.SAMPLE_MIX)

    def add_hash(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k + np.uint64(1)) * mix
        return t.append_column("h", pa.array(h, type=pa.uint64()))

    out = relational.grouped_top_n(
        docs.map_batches(add_hash, batch_format="pyarrow"),
        key_col="lang", order_col="h", n=3, id_col="doc_id",
        descending=False).to_pandas()
    return out[["lang", "doc_id", "rnk"]]


SQL_SAMPLE_PER_LANG = """
SELECT lang, doc_id, rnk FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
           ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
            % 18446744073709551616), doc_id) AS rnk
  FROM documents)
WHERE rnk <= 3
"""


def q_refinery_funnel(sf_dir: str):
    """End-to-end corpus-refinery funnel — the composition a web-corpus
    user actually runs, with per-stage survivor counts: total →
    C4/Gopher keep-filter → exact dedup → deterministic 50% sample →
    train/val/test split.  Every stage reuses an already-oracled kernel
    and the SQL twin chains the identical CTE fragments, so the WHOLE
    pipeline's counts are hash-checked end to end.  (At 100 TB the
    counts ride the checkpoint manifest's lineage counters instead of
    re-counting; here each stage is counted directly.)"""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_total = docs.count()

    ds = docs.map_batches(text.LangId, batch_format="pandas",
                          concurrency=(1, 4))
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow")
    ds = ds.map_batches(text.repetition_stats_batch,
                        batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: text.filter_decision_batch(
            t, min_tokens=_FILT_MIN_TOKENS,
            max_top_word_frac=_FILT_MAX_TWF),
        batch_format="pyarrow")
    kept = ds.filter(expr="keep == 1") \
        .map_batches(lambda t: t.select(["doc_id", "text"]),
                     batch_format="pyarrow").materialize()
    n_kept = kept.count()

    deduped = dd.exact_dedup(kept, text_col="text", key_col="doc_id") \
        .materialize()
    n_dedup = deduped.count()

    sampled = relational.deterministic_sample(
        deduped, key_col="doc_id", rate_ppm=500_000).materialize()
    n_sample = sampled.count()

    split = relational.hash_split(
        sampled, key_col="doc_id",
        splits={"train": 800_000, "val": 100_000, "test": 100_000})
    sc = split.groupby("split").count().to_pandas() \
        .set_index("split")["count()"]

    rows = [("00_total", n_total), ("01_filtered", n_kept),
            ("02_deduped", n_dedup), ("03_sampled", n_sample),
            ("04_train", int(sc.get("train", 0))),
            ("04_val", int(sc.get("val", 0))),
            ("04_test", int(sc.get("test", 0)))]
    return pd.DataFrame(rows, columns=["stage", "n"])


def _refinery_funnel_sql() -> str:
    filt = _corpus_filter_sql().strip().rstrip()
    return f"""
WITH decision AS ({filt}),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN decision x ON x.doc_id = d.doc_id AND x.keep = 1),
deduped AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
sampled AS (
  SELECT doc_id FROM deduped
  WHERE ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
         % 18446744073709551616) % 1000000 < 500000),
split AS (
  SELECT doc_id,
         CASE WHEN h < 800000 THEN 'train'
              WHEN h < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id,
               ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
                % 18446744073709551616) % 1000000 AS h
        FROM sampled))
SELECT '00_total' AS stage, COUNT(*) AS n FROM documents
UNION ALL SELECT '01_filtered', COUNT(*) FROM kept
UNION ALL SELECT '02_deduped', COUNT(*) FROM deduped
UNION ALL SELECT '03_sampled', COUNT(*) FROM sampled
UNION ALL SELECT '04_train', COUNT(*) FROM split WHERE split = 'train'
UNION ALL SELECT '04_val', COUNT(*) FROM split WHERE split = 'val'
UNION ALL SELECT '04_test', COUNT(*) FROM split WHERE split = 'test'
"""


def q_ann_topk_cosine(sf_dir: str):
    """Brute-force exact top-5 cosine for 3 query vectors (the ANN
    baseline; float64 end-to-end so ordering matches the SQL oracle)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(emb.filter(expr="vec_id < 3").take_all(),
                   key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    out = similarity.ann_bruteforce(emb, queries, qids, k=5)
    return out.select_columns(["query_id", "match_id"])


SQL_ANN = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
     s AS (SELECT q.qid, e.vec_id,
                  ROW_NUMBER() OVER (PARTITION BY q.qid
                      ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                               e.vec_id) AS rnk
           FROM q, embeddings e)
SELECT qid AS query_id, vec_id AS match_id FROM s WHERE rnk <= 5
"""


def q_minhash_dedup_documents(sf_dir: str):
    """MinHash+LSH near-dup, checked against an EXHAUSTIVE SQL oracle:
    DuckDB computes the full 5-gram-Jaccard duplicate graph (shingle
    self-join) and its connected components (recursive-CTE transitive
    closure), keeping each component's min doc_id — the same keep rule.
    LSH banding is probabilistic in general; at 16 bands × 4 rows the
    miss probability for a pair at j=0.8 is ≈2e-4 and the fixtures' dup
    pairs sit far above threshold, so the LSH answer equals the
    exhaustive one (verified set-exact at sf0.001 and sf0.01)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(32)
    kept, _ = dd.minhash_lsh_dedup(docs, key_col="doc_id", text_col="text",
                                   jaccard_threshold=0.8)
    return kept.select_columns(["doc_id"])


SQL_MINHASH_DEDUP = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
        FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS ni
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT i.a, i.b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a
  JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.8),
sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
reach(node, anc) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.anc
)
SELECT doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM reach r
                  WHERE r.node = d.doc_id AND r.anc < d.doc_id)
"""


def q_simhash_candidate_pairs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(32)
    return dd.simhash_dedup(docs, key_col="doc_id", text_col="text",
                            hamming_radius=3)


def _simhash_sql() -> str:
    """SQL twin of stages.dedup.simhash_dedup: per-word polynomial fold
    (list_reduce over hex-extracted UTF-8 bytes, identical constants via
    dedup.SIMHASH_PRIME/SIMHASH_MIX), 64 per-bit majority votes, 4 16-bit
    bands; candidate pairs share >=1 band and pass hamming<=3 (bit_count of
    per-band xor).  The finalizing mix multiply is split into lo/hi 32-bit
    halves so no intermediate exceeds INT128.  Docs with zero \\w+ tokens
    would be absent here but hash to 0 in the engine — the corpus fixture
    has none (min text length 48)."""
    M = 1 << 64
    mix = dd.SIMHASH_MIX
    mixhi = (mix << 32) % M
    votes = ",\n    ".join(
        f"CASE WHEN SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN 1 ELSE 0 END AS b{b}"
        for b in range(64))
    bands = ",\n    ".join(
        "(" + " + ".join(f"b{16 * k + j}*{1 << j}" for j in range(16))
        + f") AS band{k}" for k in range(4))
    return rf"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
  FROM documents
),
folded AS (
  SELECT doc_id,
    list_reduce(
      [CAST(CAST('0x'||substr(hex(encode(w)),2*i-1,2) AS INT) AS HUGEINT)
       for i in generate_series(1, octet_length(encode(w)))],
      (a,b) -> (a*{dd.SIMHASH_PRIME} + b) % {M}) AS f
  FROM words
),
wh AS (
  SELECT doc_id,
    ((f % 4294967296) * {mix} % {M}
     + (f // 4294967296) * {mixhi} % {M}) % {M} AS h
  FROM folded
),
bits AS (
  SELECT doc_id,
    {votes}
  FROM wh GROUP BY doc_id
),
bands AS (
  SELECT doc_id,
    {bands}
  FROM bits
)
SELECT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y ON x.doc_id < y.doc_id
WHERE (x.band0=y.band0 OR x.band1=y.band1 OR x.band2=y.band2 OR x.band3=y.band3)
  AND bit_count(xor(x.band0, y.band0)) + bit_count(xor(x.band1, y.band1))
    + bit_count(xor(x.band2, y.band2)) + bit_count(xor(x.band3, y.band3)) <= 3
"""


SQL_SIMHASH = _simhash_sql()


def q_embedding_dup_pairs(sf_dir: str):
    """Banded hyperplane-LSH near-dup over embeddings augmented with 20
    seeded exact copies (vec_id + 1_000_000) so the oracle pins a
    non-trivial result: exact copies share every band bucket, so LSH
    recall on them is 1 and the output equals the exhaustive SQL scan
    (natural pairs sit far below the 0.95 threshold — max cosine in the
    synthetic table is ~0.51)."""
    import pyarrow.compute as pc
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    seeded = emb.filter(expr="vec_id < 20").map_batches(
        lambda t: pa.table({"vec_id": pc.add(t["vec_id"], 1_000_000),
                            "embedding": t["embedding"]}),
        batch_format="pyarrow")
    df = dd.embedding_dedup_pairs(emb.union(seeded),
                                  cosine_threshold=0.95).to_pandas()
    if df.empty:  # keep a stable schema on an empty result
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    return df[["a", "b", "cosine"]]


SQL_EMB_DUP = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
  WHERE vec_id < 20
)
SELECT x.vec_id AS a, y.vec_id AS b,
       CAST(ROUND(list_cosine_similarity(x.embedding, y.embedding), 4)
            AS DOUBLE) AS cosine
FROM aug x JOIN aug y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.95
"""


_SEM_K, _SEM_DIM, _SEM_SEED = 8, 64, 7


def q_kmeans_assign(sf_dir: str):
    """Distributed cluster assignment (argmax cosine to a broadcast
    centroid matrix) — the map half of k-means / SemDeDup.  Centroids are
    fixed seeded unit vectors shared with the SQL twin as exact-repr
    literals, so the oracle pins every row's cluster id (no floats in the
    output)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = similarity.fixed_centroids(_SEM_K, _SEM_DIM, _SEM_SEED)
    out = similarity.kmeans_assign(emb, C).to_pandas()
    return out.astype({"vec_id": "int64", "cluster": "int64"})


def _kmeans_assign_sql() -> str:
    from ..stages.similarity import centroid_sql_values, fixed_centroids
    vals = centroid_sql_values(fixed_centroids(_SEM_K, _SEM_DIM, _SEM_SEED))
    return f"""
WITH cents(cid, c) AS (VALUES
    {vals}),
sims AS (
  SELECT e.vec_id, c.cid,
         list_cosine_similarity(e.embedding, c.c) AS s
  FROM embeddings e CROSS JOIN cents c
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster
FROM (SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY s DESC, cid) AS rn
      FROM sims)
WHERE rn = 1
"""


SQL_KMEANS_ASSIGN = _kmeans_assign_sql()


def q_kmeans_fit_sizes(sf_dir: str):
    """Distributed spherical k-means TRAINING (Lloyd's over the full
    dataset, per-batch partial sums) followed by assignment — emits
    (cluster, n_vecs) sizes.  Rows-only: trained centroids are
    float-iterative (no SQL twin); determinism and partition invariance
    are pytest-pinned, objective monotonicity asserted here too."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    C, hist = similarity.kmeans_fit(emb, n_clusters=8, iters=5, seed=3)
    assert all(b >= a - 1e-12 for a, b in zip(hist, hist[1:]))
    out = similarity.kmeans_assign(emb, C).to_pandas()
    sizes = out.groupby("cluster").size().reset_index(name="n_vecs")
    return sizes.astype({"cluster": "int64", "n_vecs": "int64"})


def q_semantic_dup_pairs(sf_dir: str):
    """SemDeDup over embeddings augmented with 20 seeded exact copies
    (vec_id + 1_000_000): cluster-partition by fixed centroids, exact
    within-cluster cosine ≥ 0.95.  Exact copies share their original's
    cluster by construction, so within-cluster recall on them is 1 and the
    oracle's cluster-restricted exhaustive scan is set-equal."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    seeded = emb.filter(expr="vec_id < 20").map_batches(
        lambda t: pa.table({"vec_id": pc.add(t["vec_id"], 1_000_000),
                            "embedding": t["embedding"]}),
        batch_format="pyarrow")
    C = similarity.fixed_centroids(_SEM_K, _SEM_DIM, _SEM_SEED)
    df = dd.semantic_dup_pairs(emb.union(seeded), C,
                               cosine_threshold=0.95).to_pandas()
    if df.empty:
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64"),
                           "cluster": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    return df[["a", "b", "cluster", "cosine"]]


def _semantic_dup_sql() -> str:
    from ..stages.similarity import centroid_sql_values, fixed_centroids
    vals = centroid_sql_values(fixed_centroids(_SEM_K, _SEM_DIM, _SEM_SEED))
    return f"""
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
  WHERE vec_id < 20
),
cents(cid, c) AS (VALUES
    {vals}),
sims AS (
  SELECT a.vec_id, c.cid,
         list_cosine_similarity(a.embedding, c.c) AS s
  FROM aug a CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid
  FROM (SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, cid) AS rn
        FROM sims)
  WHERE rn = 1
)
SELECT x.vec_id AS a, y.vec_id AS b, CAST(ax.cid AS BIGINT) AS cluster,
       CAST(ROUND(list_cosine_similarity(x.embedding, y.embedding), 4)
            AS DOUBLE) AS cosine
FROM aug x
JOIN aug y ON x.vec_id < y.vec_id
JOIN assign ax ON ax.vec_id = x.vec_id
JOIN assign ay ON ay.vec_id = y.vec_id AND ay.cid = ax.cid
WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.95
"""


SQL_SEMANTIC_DUP = _semantic_dup_sql()


def q_running_total_user(sf_dir: str):
    """Cumulative window — per-user running event count and running value
    total ordered by (ts, event_id).  The sum runs on integer cents so the
    result is accumulation-order-exact on both engines; the output divides
    back to currency (same integer numerator ⇒ identical doubles)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"], "ts": t["ts"],
                         "cents": cents})

    out = relational.running_aggregate(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", order_col="event_id",
        value_col="cents").to_pandas()
    out["running_value"] = out["running_sum"] / 100.0
    out = out.drop(columns=["ts", "running_sum"])
    return out[["event_id", "user_id", "running_n",
                "running_value"]].astype({"running_n": "int64"})


SQL_RUNNING_TOTAL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS running_n,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w / 100.0
         AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
"""


def q_top_bigrams(sf_dir: str):
    """Corpus top-20 word bigrams (LM n-gram statistics) — heavy-hitter
    shape: partial counts, one vocab groupby, per-block prune."""
    docs = _read(sf_dir, "documents", ["text"])
    t = text.top_k_ngrams(docs, text_col="text", n=2, k=20)
    return t.to_pandas().rename(columns={"gram": "bigram"})


SQL_TOP_BIGRAMS = """
SELECT w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram,
       COUNT(*) AS n
FROM (
  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 2)
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 TF-IDF keywords: inverted-index double shuffle
    (tf explode → df groupby → bucketed word join → per-doc top-n)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = text.tfidf_top_terms(docs, key_col="doc_id", text_col="text",
                               top_n=3).to_pandas()
    return out[["doc_id", "rank", "word", "score"]] \
        .astype({"rank": "int64"})


SQL_TFIDF = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w AS word, COUNT(*) AS tf
  FROM words WHERE w <> '' GROUP BY doc_id, w
),
df AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
),
n AS (SELECT COUNT(*) AS n FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.word,
         tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)
                                     DESC, tf.word) AS rank
  FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, word,
       CAST(ROUND(score, 4) AS DOUBLE) AS score
FROM ranked WHERE rank <= 3
"""


def q_posting_lists(sf_dir: str):
    """Inverted index: per-word document frequency + sorted posting list
    over the doc_id < 100 slice (the synthetic vocab is tiny and
    stopword-like — the slice keeps every posting string bounded while
    still pinning ~30 exact sorted lists); 2 ≤ df ≤ 100."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .filter(expr="doc_id < 100")
    out = text.posting_lists(docs, key_col="doc_id", text_col="text",
                             min_df=2, max_df=100).to_pandas()
    return out[["word", "df", "postings"]].astype({"df": "int64"})


SQL_POSTINGS = """
WITH pairs AS (
  SELECT DISTINCT doc_id, w AS word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < 100)
  WHERE w <> ''
)
SELECT word, COUNT(*) AS df,
       string_agg(doc_id, ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY word HAVING COUNT(*) BETWEEN 2 AND 100
"""


def q_stratified_sample_docs(sf_dir: str):
    """Stratified deterministic sample: rebalance the corpus by language —
    downsample English to 10 %, keep 50 % of the rest (zh dropped
    entirely via the default rate)."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = relational.stratified_sample(
        docs, key_col="doc_id", strata_col="lang",
        rates_ppm={"en": 100_000, "de": 500_000, "es": 500_000,
                   "fr": 500_000}, default_ppm=0, seed=1)
    return out.to_pandas()


SQL_STRATIFIED = """
SELECT doc_id, lang, n_chars FROM documents
WHERE ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
       % 18446744073709551616) % 1000000
      < CASE lang WHEN 'en' THEN 100000
                  WHEN 'de' THEN 500000
                  WHEN 'es' THEN 500000
                  WHEN 'fr' THEN 500000
                  ELSE 0 END
"""


def q_json_field_stats(sf_dir: str):
    """Structured-field extraction from the semi-structured ``props``
    JSON column (one arrow RE2 extract pass, no per-row json.loads),
    aggregated per event type."""
    ev = _read(sf_dir, "events", ["event_type", "props"])
    ext = text.extract_regex_field(ev, col="props",
                                   pattern=r'"k":\s*(?P<k>\d+)',
                                   out_col="k", cast_to=pa.int64())

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("k", "sum"), ("k", "max"), ([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "ps": g["k_sum"], "pm": g["k_max"],
                         "pn": g["count_all"].cast(pa.int64())})

    from ray.data.aggregate import Max, Sum
    agg = ext.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("ps", alias_name="sum_k"), Max("pm", alias_name="max_k"),
            Sum("pn", alias_name="n"))
    out = agg.to_pandas()
    return out[["event_type", "n", "sum_k", "max_k"]] \
        .astype({"n": "int64", "sum_k": "int64", "max_k": "int64"})


SQL_JSON_FIELD = """
SELECT event_type, COUNT(*) AS n,
       SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT))
         AS sum_k,
       MAX(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT))
         AS max_k
FROM events GROUP BY event_type
"""


def q_duplicate_spans(sf_dir: str):
    """Exact substring-duplication profile (Lee et al. 2022): 32-char
    windows at stride 8, per-doc duplicated-window counts.  The oracle
    groups by the window substring itself; the engine groups by a
    vectorized codepoint-polynomial hash (identical semantics absent a
    2^-64 collision)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dd.duplicate_span_stats(docs, key_col="doc_id", text_col="text",
                                  k=32, stride=8).to_pandas()
    return out[["doc_id", "n_spans", "n_dup_spans", "dup_frac"]] \
        .astype({"n_spans": "int64", "n_dup_spans": "int64"})


SQL_DUP_SPANS = """
WITH spans AS (
  SELECT doc_id, substr(text, CAST(p AS INT), 32) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, GREATEST(length(text) - 31, 1),
                                      8)) AS p
        FROM documents)
),
cnt AS (SELECT g, COUNT(*) AS c FROM spans GROUP BY g)
SELECT s.doc_id, COUNT(*) AS n_spans,
       SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS n_dup_spans,
       ROUND(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS dup_frac
FROM spans s JOIN cnt ON cnt.g = s.g
GROUP BY s.doc_id
"""


def q_rollup_orders(sf_dir: str):
    """ROLLUP multi-granularity aggregate: order counts + totals at
    (status, priority), per status, and grand total — one pass over the
    raw rows, coarser levels derived from the finest partials."""
    orders = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    t = relational.rollup_aggregate(
        orders, key_cols=["o_orderstatus", "o_orderpriority"],
        value_col="o_totalprice", round_to=2)
    return t.to_pandas()


SQL_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_value
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def q_ngram_diversity(sf_dir: str):
    """Within-doc character-8-gram diversity (Gopher repetition signal):
    pure map, no shuffle.  Oracle counts distinct substr windows."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = text.ngram_diversity_stats(docs, key_col="doc_id",
                                     text_col="text", k=8).to_pandas()
    return out[["doc_id", "n_grams", "n_distinct", "distinct_frac"]] \
        .astype({"n_grams": "int64", "n_distinct": "int64"})


SQL_NGRAM_DIVERSITY = """
WITH grams AS (
  SELECT doc_id, substr(text, CAST(p AS INT), 8) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, GREATEST(length(text) - 7, 1),
                                      1)) AS p
        FROM documents)
)
SELECT doc_id, COUNT(*) AS n_grams,
       COUNT(DISTINCT g) AS n_distinct,
       FLOOR(COUNT(DISTINCT g) / CAST(COUNT(*) AS DOUBLE) * 10000)
         / 10000 AS distinct_frac
FROM grams GROUP BY doc_id
"""


def q_salted_join_hot_key(sf_dir: str):
    """Skew-safe salted join: 80 % of left rows share one scorching key
    (derived: k = user_id when event_id % 5 = 0 else 0); the hot key's
    rows spread across 8 salt sub-buckets while the right side's hot row
    replicates into each — identical results to a plain join (the SQL
    twin), without the single-reducer hot spot."""
    ev = _read(sf_dir, "events", ["event_id", "user_id"])

    def derive(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        k = np.where(eid % 5 == 0, uid, 0).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "k": pa.array(k)})

    left = ev.map_batches(derive, batch_format="pyarrow")

    def users(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["user_id"]}).group_by("k").aggregate([])

    right = ev.map_batches(users, batch_format="pyarrow") \
        .groupby("k").count().map_batches(
            lambda t: pa.table({"k": t["k"],
                                "label": pc.multiply(t["k"], 7)}),
            batch_format="pyarrow")
    out = relational.salted_join(left, right, on="k", hot_keys=[0],
                                 salt=8).to_pandas()
    return out[["event_id", "k", "label"]].astype({"label": "int64"})


SQL_SALTED = """
WITH l AS (
  SELECT event_id,
         CASE WHEN event_id % 5 = 0 THEN user_id ELSE 0 END AS k
  FROM events
),
r AS (SELECT DISTINCT user_id AS k, user_id * 7 AS label FROM events)
SELECT l.event_id, l.k, r.label FROM l JOIN r ON l.k = r.k
"""


def q_ntile_user_value(sf_dir: str):
    """NTILE(4) window — quartile assignment of each user's events by
    value (ties broken by event_id, SQL's ORDER BY value, event_id)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    out = relational.grouped_ntile(ev, key_col="user_id",
                                   order_col="value",
                                   tiebreak_col="event_id",
                                   n_tiles=4).to_pandas()
    out = out[["event_id", "user_id", "tile"]]
    return out.astype({"tile": "int64"})


SQL_NTILE = """
SELECT event_id, user_id,
       NTILE(4) OVER (PARTITION BY user_id
                      ORDER BY value, event_id) AS tile
FROM events
"""


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE — all four grouping sets of (status, priority) from
    one pass of finest partials."""
    orders = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    t = relational.cube_aggregate(
        orders, key_cols=["o_orderstatus", "o_orderpriority"],
        value_col="o_totalprice", round_to=2)
    return t.to_pandas()


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_value
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_window_distinct_users(sf_dir: str):
    """Tumbling-window COUNT(DISTINCT user): distinct pairs collapse
    per batch BEFORE the shuffle."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    t = relational.windowed_distinct(ev, key_col="user_id", ts_col="ts",
                                     window_sec=3600)
    return t.to_pandas()


SQL_WINDOW_DISTINCT = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY window_start
"""


def q_approx_quantiles_price(sf_dir: str):
    """Approximate quantiles of order totals via the one-pass log-binned
    histogram sketch (rows-only: approximate by construction — the ≤ 2 %
    relative error bound and partitioning invariance are pytest-pinned,
    like the HLL sketch)."""
    from ..stages import sketches
    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return sketches.approx_quantiles(orders, "o_totalprice",
                                     qs=[0.25, 0.5, 0.9, 0.99],
                                     rel_err=0.01).to_pandas()


def q_hash_split_docs(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split by doc_id hash — a
    disjoint exhaustive partition (every doc gets exactly one label),
    stable across parallelism and resume; identical HUGEINT arithmetic in
    the SQL twin."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    out = relational.hash_split(
        docs, key_col="doc_id",
        splits={"train": 800_000, "val": 100_000, "test": 100_000})
    return out.to_pandas()


SQL_HASH_SPLIT = """
SELECT doc_id,
       CASE WHEN h < 800000 THEN 'train'
            WHEN h < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
              % 18446744073709551616) % 1000000 AS h
      FROM documents)
"""


def q_grouped_approx_quantiles(sf_dir: str):
    """Per-priority approximate order-total quantiles via the distributed
    log-histogram sketch (one narrow (key, bin) shuffle — the 100-TB
    alternative to the exact two-pass selection).  Rows-only:
    approximate by construction; the ≤ 2 % error bound and partition
    invariance are pytest-pinned."""
    from ..stages import sketches
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = sketches.grouped_approx_quantiles(
        orders, key_col="o_orderpriority", val_col="o_totalprice",
        qs=[0.5, 0.9, 0.99], rel_err=0.01)
    return out.to_pandas()


def q_lag_user_events(sf_dir: str):
    """LAG window — for every event, the previous event id of the same
    user and the exact microsecond gap since it (NULL on each user's first
    event)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = relational.grouped_lag(ev, key_col="user_id", ts_col="ts",
                                 order_col="event_id",
                                 lag_cols=["event_id"]).to_pandas()
    out = out[["event_id", "user_id", "prev_event_id", "gap_us"]]
    # float64-with-NaN nullables: the driver compare normalizes NaN→NULL
    # and integral floats→ints, pd.NA it cannot
    return out.astype({"prev_event_id": "float64", "gap_us": "float64"})


SQL_LAG_EVENTS = """
SELECT event_id, user_id,
       LAG(event_id) OVER w AS prev_event_id,
       date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_lead_user_events(sf_dir: str):
    """LEAD window — the next event id of the same user and the exact
    microsecond gap until it (NULL on each user's last event)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = relational.grouped_lag(ev, key_col="user_id", ts_col="ts",
                                 order_col="event_id",
                                 lag_cols=["event_id"],
                                 lead=True).to_pandas()
    out = out[["event_id", "user_id", "next_event_id", "gap_us"]]
    return out.astype({"next_event_id": "float64", "gap_us": "float64"})


SQL_LEAD_EVENTS = """
SELECT event_id, user_id,
       LEAD(event_id) OVER w AS next_event_id,
       date_diff('microsecond', ts, LEAD(ts) OVER w) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_full_outer_click_purchase(sf_dir: str):
    """FULL OUTER join — per-user click counts vs purchase counts, keeping
    users present on either side only (nulls on the missing side).
    Exercises the bucketed hash join's outer mode: both sides co-shuffle
    on the key, per-bucket outer merge, key coalesced."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def counts(etype, name):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], etype))
            return pa.table({"user_id": t["user_id"]}) \
                .group_by("user_id").aggregate([([], "count_all")]) \
                .rename_columns(["user_id", name])
        # partial counts per batch, tiny final groupby to merge partials
        part = ev.map_batches(f, batch_format="pyarrow")
        g = part.groupby("user_id").sum(name)
        return g.map_batches(
            lambda t, n=name: pa.table(
                {"user_id": t["user_id"],
                 n: t[f"sum({n})"].cast(pa.int64())}),
            batch_format="pyarrow")

    clicks = counts("click", "n_clicks")
    purch = counts("purchase", "n_purchases")
    out = relational.bucketed_hash_join(clicks, purch, on="user_id",
                                        how="outer").to_pandas()
    out = out[["user_id", "n_clicks", "n_purchases"]]
    return out.astype({"user_id": "int64", "n_clicks": "float64",
                       "n_purchases": "float64"})


SQL_FULL_OUTER = """
WITH c AS (SELECT user_id, COUNT(*) AS n_clicks
           FROM events WHERE event_type = 'click' GROUP BY user_id),
p AS (SELECT user_id, COUNT(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT COALESCE(c.user_id, p.user_id) AS user_id, n_clicks, n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""


def q_pivot_orders(sf_dir: str):
    """Pivot / wide conditional aggregation: order counts per priority
    spread across one column per order status."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    out = relational.pivot_counts(orders, row_col="o_orderpriority",
                                  col_col="o_orderstatus",
                                  col_values=["F", "O", "P"]).to_pandas()
    cols = ["o_orderpriority", "n_F", "n_O", "n_P", "n_total"]
    return out[cols].astype({c: "int64" for c in cols[1:]})


SQL_PIVOT_ORDERS = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_P,
       COUNT(*) AS n_total
FROM orders
GROUP BY o_orderpriority
"""


def q_ngram_jaccard_sampled(sf_dir: str):
    """Exact 5-gram Jaccard over a deterministic pair sample
    (doc_id i ↔ i+250): the n-gram-Jaccard dedup primitive with a full
    DuckDB oracle (shingle explode + set sizes).  Distributed shape = the
    same candidate-pair↔text bucketed joins the minhash verify uses."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = docs.filter(expr="doc_id < 250").map_batches(
        lambda t: pa.table({"a": t["doc_id"],
                            "b": pc.add(t["doc_id"], 250)}),
        batch_format="pyarrow")
    out = dd.jaccard_verify_pairs(pairs, docs, key_col="doc_id",
                                  text_col="text", shingle_k=5,
                                  emit_score=True).to_pandas()
    out["jaccard"] = out["jaccard"].round(4)
    return out[["a", "b", "jaccard"]]


SQL_NGRAM_JACCARD = """
WITH pairs AS (
  SELECT doc_id AS a, doc_id + 250 AS b FROM documents WHERE doc_id < 250
),
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
    FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, COUNT(*) AS ni
  FROM pairs p
  JOIN sh x ON x.doc_id = p.a
  JOIN sh y ON y.doc_id = p.b AND y.g = x.g
  GROUP BY p.a, p.b
)
SELECT p.a, p.b,
       ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(i.ni, 0)), 4) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.a
JOIN sizes sb ON sb.doc_id = p.b
LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
"""


def q_langid_documents(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(text.LangId, batch_format="pandas", concurrency=2)
    counts = out.groupby("lang_pred").count().to_pandas()
    counts = counts.rename(columns={"count()": "n"})
    return counts[["lang_pred", "n"]]


def _langid_sql() -> str:
    """SQL twin of stages.text.LangId: one regexp count per language profile,
    argmax with first-in-profile-order tie-breaking (the CASE chain mirrors
    numpy argmax's first-max semantics), 'und' when every count is zero.
    Alternation patterns are built from the SAME _LANG_PROFILES dict so the
    two sides cannot drift."""
    langs = list(text._LANG_PROFILES)
    pats = {
        lg: r"\b(?:" + "|".join(sorted(prof, key=len, reverse=True)) + r")\b"
        for lg, prof in text._LANG_PROFILES.items()}
    counts = ",\n    ".join(
        f"length(regexp_extract_all(lower(text), '{pats[lg]}')) AS c_{lg}"
        for lg in langs)
    all_c = ", ".join(f"c_{lg}" for lg in langs)
    branches = []
    for i, lg in enumerate(langs):
        conds = " AND ".join(f"c_{lg} >= c_{other}" for other in langs[i + 1:])
        branches.append(f"WHEN {conds or 'TRUE'} THEN '{lg}'")
    case = "\n      ".join(branches)
    return f"""
WITH scored AS (
  SELECT doc_id,
    {counts}
  FROM documents
),
pred AS (
  SELECT doc_id,
    CASE WHEN GREATEST({all_c}) = 0 THEN 'und'
      {case}
    END AS lang_pred
  FROM scored
)
SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY lang_pred
"""


SQL_LANGID = _langid_sql()


def q_fingerprint_documents(sf_dir: str):
    """Winnowing fingerprint per doc (min rolling-hash over 8-byte windows),
    emitted as int64 (two's-complement view of the u64 hash) so the DuckDB
    oracle — which computes the identical polynomial mod 2^64 in HUGEINT —
    lands on the same wire type.  The blake2b content_hash column stays on
    the stage output (exact dedup pins that path via SQL_EXACT_DEDUP) but is
    not SQL-expressible, so this query selects only the rolling fingerprint."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(text.fingerprint_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "fingerprint"])


def _fingerprint_sql(window: int = 8) -> str:
    """SQL twin of stages.text.fingerprint_batch: the rolling hash
    h(i) = fold(h*p + byte) mod 2^64 equals sum(byte_j * p^(w-1-j)) mod 2^64
    (mod is a ring hom), so each window is 8 lead() taps dotted with the
    precomputed powers p^(w-1-j) mod 2^64 — each term reduced before the sum
    so everything fits HUGEINT.  Bytes come from hex(encode(text)) pairs
    (UTF-8 bytes, same as Python .encode())."""
    M = 1 << 64
    prime = 1099511628211
    pows = [pow(prime, window - 1 - j, M) for j in range(window)]
    terms = [f"(CAST(byte AS HUGEINT) * {pows[0]}) % {M}"] + [
        f"(CAST(lead(byte, {j}) OVER win AS HUGEINT) * {pows[j]}) % {M}"
        for j in range(1, window)]
    terms_sql = "\n      + ".join(terms)
    return f"""
WITH b AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         octet_length(encode(text)) AS n,
         CAST('0x' || substr(hex(encode(text)), 2*CAST(i AS INT)-1, 2) AS INT) AS byte
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, octet_length(encode(text)))) AS i
        FROM documents)
),
w AS (
  SELECT doc_id, i, n,
    ( {terms_sql}
    ) % {M} AS h
  FROM b
  WINDOW win AS (PARTITION BY doc_id ORDER BY i)
),
m AS (
  SELECT doc_id, MIN(h) AS mh FROM w WHERE i <= n - {window - 1} GROUP BY doc_id
)
SELECT doc_id,
       CAST(CASE WHEN mh >= {1 << 63} THEN mh - {M} ELSE mh END AS BIGINT)
         AS fingerprint
FROM m
"""


SQL_FINGERPRINT = _fingerprint_sql()


def q_ann_ivf_recall(sf_dir: str):
    """IVF quality pin: recall@5 of the IVF probe vs the exact brute-force
    top-k, per query vector (rows-only; the recall floor is asserted in
    tests/test_training_ops.py)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(emb.filter(expr="vec_id < 3").take_all(),
                   key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    bf = similarity.ann_bruteforce(emb, queries, qids, k=5).to_pandas()
    C = similarity.train_centroids(emb, n_centroids=8)
    ivf = similarity.ann_ivf(emb, queries, qids, C, k=5, nprobe=4).to_pandas()
    rows = []
    for qid in qids:
        truth = set(bf.loc[bf.query_id == qid, "match_id"])
        got = set(ivf.loc[ivf.query_id == qid, "match_id"])
        rows.append({"query_id": qid,
                     "recall_at_5": len(truth & got) / max(1, len(truth))})
    return pd.DataFrame(rows)


def q_ann_ivf(sf_dir: str):
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(emb.filter(expr="vec_id < 3").take_all(),
                   key=lambda r: r["vec_id"])
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    C = similarity.train_centroids(emb, n_centroids=8)
    return similarity.ann_ivf(emb, queries, qids, C, k=5, nprobe=3)


# --------------------------------------------- geospatial fixture pipelines

# The synth grid is closed-form (io/synth.py: 3 countries × 2×2 regions ×
# 4×4 grid cells, 5 buildings per block, every block the identical
# layout), so block extraction, the constant k, and the
# one-parcel-per-building invariant are all SQL-expressible without any
# input table — the oracle derives the expected rows from the same
# constants the generator uses.
_SQL_SYNTH_BLOCKS = """
WITH countries(country) AS (VALUES ('SYNA'), ('SYNB'), ('SYNC')),
regions AS (
  SELECT country || '.' || CAST(a AS VARCHAR) || '.' || CAST(b AS VARCHAR)
         || '_1' AS gadm_code
  FROM countries, generate_series(1, 2) t1(a), generate_series(1, 2) t2(b)
),
blocks AS (
  SELECT gadm_code || '_' || CAST(i AS VARCHAR) AS block_id, gadm_code
  FROM regions, generate_series(0, 15) t3(i)
)
"""

SQL_BLOCKS_FIXTURE = _SQL_SYNTH_BLOCKS + \
    "SELECT block_id, gadm_code FROM blocks"

# every fixture block holds the same 5-building layout (1 center + ring of
# 4 at 40% radius) whose weak-dual sequence depth is 2
SQL_COMPLEXITY_FIXTURE = _SQL_SYNTH_BLOCKS + \
    "SELECT block_id, CAST(2 AS INTEGER) AS complexity FROM blocks"

# tessellation invariant: exactly one parcel per building, assigned to the
# building's own block
SQL_PARCELS_FIXTURE = _SQL_SYNTH_BLOCKS + """
SELECT block_id, block_id || '_b' || CAST(j AS VARCHAR) AS bldg_id
FROM blocks, generate_series(0, 4) t4(j)
"""

# reblock: every fixture block emits one 'new' and one 'summary' row; the
# 58-block set that ALSO emits 'existing' rows (steiner path touching
# zero-weight perimeter edges) is a RUN-PINNED GOLDEN, not closed-form —
# it depends on float-level snap geometry per block position. Verified
# deterministic across parallelism (identical at num_cpus 3 and 8) before
# committing; regenerate via q_reblock_fixture if the reblock kernel's
# semantics intentionally change.
SQL_REBLOCK_FIXTURE = _SQL_SYNTH_BLOCKS + """
, existing_ids(block_id) AS (VALUES
  ('SYNA.1.1_1_0'), ('SYNA.1.1_1_10'), ('SYNA.1.1_1_15'), ('SYNA.1.1_1_5'),
  ('SYNA.1.2_1_1'), ('SYNA.1.2_1_11'), ('SYNA.1.2_1_6'), ('SYNA.2.1_1_14'),
  ('SYNA.2.1_1_4'), ('SYNA.2.1_1_9'), ('SYNA.2.2_1_0'), ('SYNA.2.2_1_10'),
  ('SYNA.2.2_1_15'), ('SYNA.2.2_1_5'), ('SYNB.1.1_1_0'), ('SYNB.1.1_1_1'),
  ('SYNB.1.1_1_14'), ('SYNB.1.1_1_6'), ('SYNB.1.2_1_1'), ('SYNB.1.2_1_13'),
  ('SYNB.1.2_1_3'), ('SYNB.1.2_1_6'), ('SYNB.2.1_1_1'), ('SYNB.2.1_1_13'),
  ('SYNB.2.1_1_3'), ('SYNB.2.1_1_4'), ('SYNB.2.1_1_6'), ('SYNB.2.1_1_9'),
  ('SYNB.2.2_1_0'), ('SYNB.2.2_1_10'), ('SYNB.2.2_1_14'), ('SYNB.2.2_1_2'),
  ('SYNB.2.2_1_5'), ('SYNB.2.2_1_7'), ('SYNC.1.1_1_1'), ('SYNC.1.1_1_10'),
  ('SYNC.1.1_1_13'), ('SYNC.1.1_1_15'), ('SYNC.1.1_1_5'), ('SYNC.1.1_1_8'),
  ('SYNC.1.2_1_11'), ('SYNC.1.2_1_12'), ('SYNC.1.2_1_14'), ('SYNC.1.2_1_2'),
  ('SYNC.1.2_1_6'), ('SYNC.1.2_1_9'), ('SYNC.2.1_1_0'), ('SYNC.2.1_1_12'),
  ('SYNC.2.1_1_14'), ('SYNC.2.1_1_2'), ('SYNC.2.1_1_5'), ('SYNC.2.1_1_9'),
  ('SYNC.2.2_1_1'), ('SYNC.2.2_1_10'), ('SYNC.2.2_1_13'), ('SYNC.2.2_1_15'),
  ('SYNC.2.2_1_3'), ('SYNC.2.2_1_6')
)
SELECT block_id, 'new' AS road_type FROM blocks
UNION ALL SELECT block_id, 'summary' AS road_type FROM blocks
UNION ALL SELECT block_id, 'existing' AS road_type FROM existing_ids
"""


def q_blocks_fixture(sf_dir: str):
    from ..io import synth
    from ..stages.blocks import extract_blocks
    ds = extract_blocks(rd.from_arrow(synth.regions_table()),
                        rd.from_arrow(synth.lines_table()))
    return ds.select_columns(["block_id", "gadm_code"])


def q_complexity_fixture(sf_dir: str):
    import pyarrow as _pa

    from ..io import synth
    from ..stages.blocks import extract_blocks
    from ..stages.complexity import complexity_pipeline
    blocks = _pa.Table.from_pylist(
        extract_blocks(rd.from_arrow(synth.regions_table()),
                       rd.from_arrow(synth.lines_table())).take_all())
    out = complexity_pipeline(blocks, rd.from_arrow(synth.buildings_table()))
    return out.select_columns(["block_id", "complexity"])


def q_parcels_fixture(sf_dir: str):
    import pyarrow as _pa

    from ..io import synth
    from ..stages.blocks import extract_blocks
    from ..stages.parcels import parcels_pipeline
    blocks = _pa.Table.from_pylist(
        extract_blocks(rd.from_arrow(synth.regions_table()),
                       rd.from_arrow(synth.lines_table())).take_all())
    out = parcels_pipeline(blocks, rd.from_arrow(synth.buildings_table()))
    # parcel seq numbering depends on a float-noise-level centroid sort tie
    # between the three x-aligned ring buildings, so the hashable contract
    # is the (block, building) assignment — exactly one parcel per building
    return out.select_columns(["block_id", "bldg_id"])


def q_reblock_fixture(sf_dir: str):
    import pyarrow as _pa

    from ..io import synth
    from ..stages.blocks import extract_blocks
    from ..stages.parcels import parcels_pipeline
    from ..stages.reblock import reblock_pipeline
    blocks = _pa.Table.from_pylist(
        extract_blocks(rd.from_arrow(synth.regions_table()),
                       rd.from_arrow(synth.lines_table())).take_all())
    parcels = _pa.Table.from_pylist(parcels_pipeline(
        blocks, rd.from_arrow(synth.buildings_table())).take_all())
    out = reblock_pipeline(blocks, rd.from_arrow(parcels),
                           rd.from_arrow(synth.buildings_table()))
    return out.select_columns(["block_id", "road_type"])


def q_multimodal_decode(sf_dir: str):
    from ..stages.multimodal import decode_pipeline, synth_media_table
    ds = rd.from_arrow(synth_media_table(64))
    return decode_pipeline(ds)


def q_media_perceptual_pairs(sf_dir: str):
    """Perceptual media near-dup: dHash (images) / spectral fingerprint
    (audio) in an actor pool, then the generic 4×16-bit banded-hamming
    pair shuffle — catches RESIZED/re-encoded copies the exact-payload
    path misses.  Rows-only (binary source); resize-pairing pinned by
    pytest."""
    from ..stages.multimodal import (encode_bmp, perceptual_dup_pairs,
                                     resize_nearest, synth_media_table)
    from ..stages.multimodal import decode_bmp
    base = synth_media_table(60)
    # add RESIZED copies of the first 5 images (ids r1000x) — not byte
    # duplicates, only perceptual ones
    extra = []
    bt = base.to_pylist()
    n_added = 0
    for row in bt:
        if row["kind"] == "image" and n_added < 5:
            px = decode_bmp(row["payload"])
            big = resize_nearest(px, px.shape[1] * 2, px.shape[0] * 2)
            extra.append({**row,
                          "media_id": f"r{1000 + n_added:05d}",
                          "payload": encode_bmp(big),
                          "width": px.shape[1] * 2,
                          "height": px.shape[0] * 2})
            n_added += 1
    ds = rd.from_items(bt + extra)
    out = perceptual_dup_pairs(ds, max_hamming=2).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_media_dup_pairs(sf_dir: str):
    """Multimodal near-dup: decode (real BMP/WAV, digest-fallback video)
    → feature vectors → banded hyperplane-LSH dup pairs over the decoded
    features, with 10 seeded exact payload copies (media i ↔ i+1000).
    Rows-only (binary source, no SQL twin); the expected pair set is
    pytest-pinned.  The end-to-end composition a media-dedup user runs:
    actor-pool decode feeding the embedding dedup shuffle."""
    from ..stages.multimodal import decode_pipeline, synth_media_table
    base = synth_media_table(60)
    dup = base.slice(0, 10)
    dup = dup.set_column(
        dup.schema.get_field_index("media_id"), "media_id",
        pa.array([f"m{1000 + i:05d}" for i in range(10)]))
    ds = rd.from_arrow(pa.concat_tables([base, dup]))
    feats = decode_pipeline(ds)

    def to_vec(t: pa.Table) -> pa.Table:
        ids = [int(m[1:]) for m in t["media_id"].to_pylist()]
        return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                         "embedding": t["features"]})

    vecs = feats.map_batches(to_vec, batch_format="pyarrow")
    out = dd.embedding_dedup_pairs(vecs, cosine_threshold=0.9999) \
        .to_pandas()
    if out.empty:
        out = pd.DataFrame({"a": pd.Series(dtype="int64"),
                            "b": pd.Series(dtype="int64"),
                            "cosine": pd.Series(dtype="float64")})
    return out[["a", "b", "cosine"]]


# ------------------------------------------------------------------ registry

def q_decontaminate_ngrams(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix C / Dodge et al.): docs
    with doc_id%50==0 form the held-out benchmark set; a deterministic
    7-word canary sentence is appended to docs with doc_id%17==0 on BOTH
    sides, so train docs carrying it share a 5-gram with the benchmark
    and must be flagged.  Per train doc: n-gram count, benchmark-
    overlapping n-gram count, contaminated fraction."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        idn = batch["doc_id"].to_numpy(zero_copy_only=False)
        canary = pa.scalar(" the quick benchmark canary sentence for eval")
        t0 = pc.binary_join_element_wise(
            batch["text"],
            pc.if_else(pa.array(idn % 17 == 0), canary, pa.scalar("")), "")
        return pa.table({"doc_id": batch["doc_id"], "text": t0})

    enriched = docs.map_batches(enrich, batch_format="pyarrow")

    def side(keep_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            idn = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (idn % 50 == 0) if keep_bench else (idn % 50 != 0)
            return batch.filter(pa.array(m))
        return f

    bench = enriched.map_batches(side(True), batch_format="pyarrow")
    train = enriched.map_batches(side(False), batch_format="pyarrow")
    out = dd.decontaminate_ngrams(train, bench, key_col="doc_id",
                                  text_col="text", n=5)
    return out.select_columns(["doc_id", "n_ngrams", "n_contam",
                               "contam_frac"])


SQL_DECONTAMINATE = """
WITH e AS (
  SELECT doc_id, text || CASE WHEN doc_id % 17 = 0
         THEN ' the quick benchmark canary sentence for eval'
         ELSE '' END AS t0
  FROM documents),
w AS (SELECT doc_id, string_split(t0, ' ') AS w FROM e),
g AS (SELECT doc_id,
             w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] || ' ' ||
             w[CAST(i AS INT) + 2] || ' ' || w[CAST(i AS INT) + 3] || ' ' ||
             w[CAST(i AS INT) + 4] AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
            FROM w WHERE len(w) >= 5)),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
t AS (SELECT * FROM g WHERE doc_id % 50 <> 0)
SELECT t.doc_id, COUNT(*) AS n_ngrams,
       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contam,
       ROUND(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS contam_frac
FROM t LEFT JOIN bench b USING (gram)
GROUP BY t.doc_id
"""


def q_domain_boilerplate(sf_dir: str):
    """Per-domain boilerplate detection: a per-source copyright footer is
    injected on doc_id%2==0 (~50% of each source's docs — boilerplate at
    the 30% threshold) and a rare promo banner on doc_id%7==0 (~14% —
    below it); the operator must count exactly the former per source."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        idn = batch["doc_id"].to_numpy(zero_copy_only=False)
        j = pc.binary_join_element_wise
        z = pa.scalar("")
        foot = j(pa.array(np.full(len(idn), "\n\n(c) ")),
                 batch["source"],
                 pa.array(np.full(len(idn), " all rights reserved")), "")
        t0 = j(batch["text"],
               pc.if_else(pa.array(idn % 2 == 0), foot, z),
               pc.if_else(pa.array(idn % 7 == 0),
                          pa.scalar("\n\nRare promo banner"), z), "")
        return pa.table({"doc_id": batch["doc_id"],
                         "source": batch["source"], "text": t0})

    out = dd.domain_boilerplate_stats(
        docs.map_batches(enrich, batch_format="pyarrow"),
        min_frac=0.3, min_docs=2)
    return out.select_columns(["source", "n_docs", "n_boiler"])


SQL_DOMAIN_BOILER = """
WITH e AS (
  SELECT doc_id, source, text
    || CASE WHEN doc_id % 2 = 0
            THEN chr(10) || chr(10) || '(c) ' || source
                 || ' all rights reserved' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN chr(10) || chr(10) || 'Rare promo banner' ELSE '' END AS t0
  FROM documents),
p AS (
  SELECT DISTINCT doc_id, source, para
  FROM (SELECT doc_id, source,
               unnest(string_split(t0, chr(10) || chr(10))) AS para
        FROM e)),
cnt AS (SELECT source, para, COUNT(*) AS nd FROM p GROUP BY source, para),
tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT t.source, t.n_docs,
       CAST(COALESCE(SUM(CASE WHEN c.nd >= 2 AND c.nd >= 0.3 * t.n_docs
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_boiler
FROM tot t LEFT JOIN cnt c USING (source)
GROUP BY t.source, t.n_docs
"""


def q_heavy_hitter_words(sf_dir: str):
    """Misra-Gries heavy hitters (mergeable-summaries merge, Agarwal et
    al. PODS'12): bounded-memory corpus top-k — shuffle width is capped
    at capacity×batches no matter how wide the vocabulary.  At
    capacity=4096 ≥ the test vocabulary no decrement fires, so the
    sketch is exact and oracle-checkable; the N/(capacity+1) error bound
    at small capacity is pytest-pinned."""
    from ..stages import sketches
    docs = _read(sf_dir, "documents", ["text"])
    return sketches.heavy_hitter_words(docs, k=20, capacity=4096) \
        .select(["word", "n"])


SQL_HEAVY_HITTERS = """
SELECT w AS word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY n DESC, word ASC LIMIT 20
"""


def _set_op_sides(sf_dir: str):
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def side(etype: str):
        def f(batch: pa.Table) -> pa.Table:
            m = pc.and_(pc.equal(batch["event_type"], etype),
                        pc.greater(batch["value"], 200.0))
            return pa.table({"user_id": batch["user_id"].filter(m)})
        return f

    return (ev.map_batches(side("purchase"), batch_format="pyarrow"),
            ev.map_batches(side("error"), batch_format="pyarrow"))


def q_intersect_users(sf_dir: str):
    """SQL INTERSECT as a single-shuffle set op: users with a >200-value
    purchase AND a >200-value error event (distinct semantics)."""
    left, right = _set_op_sides(sf_dir)
    return relational.set_op(left, right, on="user_id", op="intersect")


def q_except_users(sf_dir: str):
    """SQL EXCEPT as the same single-shuffle set op: big purchasers with
    NO big error event."""
    left, right = _set_op_sides(sf_dir)
    return relational.set_op(left, right, on="user_id", op="except")


SQL_INTERSECT_USERS = """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 200
"""

SQL_EXCEPT_USERS = """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 200
"""


def q_compression_quality(sf_dir: str):
    """Per-doc zlib compression-ratio quality signal (pure map, no
    shuffle).  Deterministic but not SQL-expressible — rows-only check;
    the repetitive<prose<noise ordering is pytest-pinned."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(text.compression_ratio_batch,
                           batch_format="pyarrow")
    return out.select_columns(["doc_id", "raw_bytes", "comp_bytes",
                               "compression_ratio"])


def q_triangle_count(sf_dir: str):
    """Distributed triangle counting over the same synthetic link graph
    PageRank uses: degree-ordered edge orientation (wedges enumerated at
    the lower-(deg, id) endpoint only — O(m^1.5) total, skew-proof) via
    the vectorized pair kernel.  Oracle: the classic 3-way self-join."""
    from ..stages import graph_ops
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    tri = graph_ops.triangle_count(
        docs.map_batches(edges, batch_format="pyarrow"))
    return pd.DataFrame([{"n_triangles": tri}])


SQL_TRIANGLES = """
WITH raw AS (
  SELECT doc_id AS src,
         (doc_id * 7919 + k * 104729)
           % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(k)),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst)
SELECT COUNT(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_pagerank_links(sf_dir: str):
    """Distributed PageRank (3 power-iteration rounds, d=0.85) over a
    deterministic synthetic link graph: every doc links to
    (doc_id*7919 + k*104729) % N for k=1..3.  Per round: one bucketed
    co-shuffle join (edges×ranks on src) + one groupby(dst) sum; ranks
    round to 9dp per round so the float trajectory matches the oracle's
    unrolled CTEs exactly."""
    from ..stages import graph_ops
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    nodes = docs.map_batches(
        lambda b: pa.table({"v": b["doc_id"]}), batch_format="pyarrow")
    out = graph_ops.pagerank(docs.map_batches(edges, batch_format="pyarrow"),
                             nodes, iters=3, damping=0.85, round_dp=9)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "pagerank": b["pagerank"]}),
        batch_format="pyarrow")


SQL_PAGERANK = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS v FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT v, ROUND(1.0 / nn.n, 9) AS r FROM nodes, nn),
c1 AS (SELECT e.dst AS v, SUM(r0.r / deg.outdeg) AS c
       FROM edges e JOIN deg USING (src) JOIN r0 ON r0.v = e.src
       GROUP BY e.dst),
r1 AS (SELECT nodes.v,
              ROUND((1 - 0.85) / nn.n + 0.85 * COALESCE(c1.c, 0), 9) AS r
       FROM nodes LEFT JOIN c1 USING (v), nn),
c2 AS (SELECT e.dst AS v, SUM(r1.r / deg.outdeg) AS c
       FROM edges e JOIN deg USING (src) JOIN r1 ON r1.v = e.src
       GROUP BY e.dst),
r2 AS (SELECT nodes.v,
              ROUND((1 - 0.85) / nn.n + 0.85 * COALESCE(c2.c, 0), 9) AS r
       FROM nodes LEFT JOIN c2 USING (v), nn),
c3 AS (SELECT e.dst AS v, SUM(r2.r / deg.outdeg) AS c
       FROM edges e JOIN deg USING (src) JOIN r2 ON r2.v = e.src
       GROUP BY e.dst),
r3 AS (SELECT nodes.v,
              ROUND((1 - 0.85) / nn.n + 0.85 * COALESCE(c3.c, 0), 9) AS r
       FROM nodes LEFT JOIN c3 USING (v), nn)
SELECT v AS doc_id, r AS pagerank FROM r3
"""


def q_connected_components_chain(sf_dir: str):
    """Generic distributed connected components (iterated min-label
    propagation — the operator minhash dedup uses internally) exposed
    over a synthetic chain graph: edge (i, i+1) whenever i%5 < 4, so
    components are runs of 5 consecutive ids with diameter 4 (several
    propagation rounds needed) and the min label is closed-form:
    i - i%5."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = d[(d % 5 < 4) & (d + 1 < n)]
        return pa.table({"a": pa.array(a), "b": pa.array(a + 1)})

    out = dd.connected_components_min_label(
        docs.map_batches(edges, batch_format="pyarrow"))
    return out.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["label"]}),
        batch_format="pyarrow")


SQL_COMPONENTS_CHAIN = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id AS node, doc_id - (doc_id % 5) AS label
FROM documents, nn
WHERE (doc_id % 5 > 0) OR (doc_id % 5 < 4 AND doc_id + 1 < nn.n)
"""


def q_pack_sequences(sf_dir: str):
    """LM sequence packing: concatenate the token stream in doc_id order
    and chunk into 256-token training windows; per doc report its token
    count and the first/last window it lands in.  Built on the
    distributed two-pass prefix sum (range buckets → driver exclusive
    scan over ≤64 bucket totals → per-bucket cumsum) — the global
    ORDER BY running total with no single-node sort."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(batch["text"], pattern=" ")).cast(pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    cum = relational.global_prefix_sum(
        docs.map_batches(toks, batch_format="pyarrow"),
        order_col="doc_id", value_col="n_tokens")

    def windows(batch: pa.Table) -> pa.Table:
        c = batch["cum"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(n),
                         "first_window": pa.array((c - n) // 256),
                         "last_window": pa.array((c - 1) // 256)})

    return cum.map_batches(windows, batch_format="pyarrow")


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       (cum - n_tokens) // 256 AS first_window,
       (cum - 1) // 256 AS last_window
FROM c
"""


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (8 merge rounds).  The corpus
    is touched once (word-frequency groupby); merge rounds iterate over
    the vocabulary-sized table.  Greedy iterative argmax isn't
    SQL-expressible — rows-only check; equality with a single-process
    reference BPE is pytest-pinned at two parallelism levels."""
    docs = _read(sf_dir, "documents", ["text"])
    return text.bpe_train(docs, num_merges=8)


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 (shipping priority, adapted to the synth schema): the
    10 unshipped BUILDING-segment orders with the highest revenue.
    Shape: segment semi-join (narrow key broadcast) → date-filtered
    orders ⋈ lineitem via ONE bucketed orderkey join with per-batch
    revenue pre-aggregation → tiny groupby → top-10.  Revenue in exact
    cents so the hash matches."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])
    cut = np.datetime64("1998-01-01T00:00:00")

    keys = cust.map_batches(
        lambda t: pa.table({"o_custkey": t.filter(
            pc.equal(t["c_mktsegment"], "BUILDING"))["c_custkey"]}),
        batch_format="pyarrow")
    ords = relational.semi_join(
        orders.map_batches(
            lambda t: t.filter(pc.less(t["o_orderdate"],
                                       pa.scalar(cut))),
            batch_format="pyarrow"),
        keys, on="o_custkey") \
        .map_batches(lambda t: t.select(["o_orderkey", "o_orderdate"]),
                     batch_format="pyarrow")

    def li_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        # DuckDB ROUND is half-away-from-zero; arrow defaults to
        # half-to-even — products CAN land exactly on .5 cents here
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])),
            100.0), round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"l_orderkey": t["l_orderkey"], "rc": rev}) \
            .group_by("l_orderkey").aggregate([("rc", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rc": g["rc_sum"].cast(pa.int64())})

    def comb(t: pa.Table) -> pa.Table:
        # join key == groupby key: every orderkey's rows are entirely in
        # this bucket, so this is the FULL per-order aggregate and the
        # bucket-local top-10 is globally exact — the downstream
        # groupby+sort shuffles are deleted (VERDICT r3 item #1).
        g = t.group_by("l_orderkey").aggregate(
            [("rc", "sum"), ("o_orderdate", "max")])
        df = pd.DataFrame({
            "l_orderkey": g["l_orderkey"].to_numpy(zero_copy_only=False),
            "rc": g["rc_sum"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "od": g["o_orderdate_max"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["rc", "l_orderkey"],
                            ascending=[False, True]).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    j = relational.bucketed_hash_join(
        li.map_batches(li_cents, batch_format="pyarrow"),
        ords.map_batches(
            lambda t: t.rename_columns(["l_orderkey", "o_orderdate"]),
            batch_format="pyarrow"),
        on="l_orderkey", combine=comb)

    top = relational.ds_to_table(j).to_pandas() \
        .sort_values(["rc", "l_orderkey"],
                     ascending=[False, True]).head(10)
    top["revenue"] = top["rc"] / 100.0
    top = top.rename(columns={"l_orderkey": "o_orderkey",
                              "od": "o_orderdate"})
    return top[["o_orderkey", "revenue", "o_orderdate"]].reset_index(
        drop=True)


SQL_Q3 = """
SELECT l_orderkey AS o_orderkey,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) / 100.0 AS revenue,
       MAX(o_orderdate) AS o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 (local supplier volume, adapted): revenue per ASIA
    nation from lineitems where supplier and customer share the nation.
    Shape: region→nation→supplier/customer dims broadcast; orders
    date-filter + broadcast customer-nation attach; ONE bucketed
    orderkey join lineitem⋈orders; supplier-nation attach from the
    broadcast map; equality filter; per-batch cents partials → tiny
    nation groupby."""
    nation_t = _read_table(sf_dir, "nation",
                           ["n_nationkey", "n_name", "n_regionkey"])
    region_t = _read_table(sf_dir, "region", ["r_regionkey", "r_name"])
    cust_dim = _read_table(sf_dir, "customer",
                           ["c_custkey", "c_nationkey"])
    supp_dim = _read_table(sf_dir, "supplier",
                           ["s_suppkey", "s_nationkey"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])
    lo = np.datetime64("1996-01-01T00:00:00")
    hi = np.datetime64("1999-01-01T00:00:00")

    rt = region_t.to_pandas()
    asia = int(rt.loc[rt.r_name == "ASIA", "r_regionkey"].iloc[0])
    nt = nation_t.to_pandas()
    nt = nt[nt.n_regionkey == asia]
    nkeys = set(nt.n_nationkey.tolist())

    ords = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)))),
        batch_format="pyarrow")
    cust_t = cust_dim
    mask = pc.is_in(cust_t["c_nationkey"],
                    value_set=pa.array(sorted(nkeys),
                                       type=cust_t["c_nationkey"].type))
    cust_t = cust_t.filter(mask)
    o2 = relational.broadcast_join(
        ords.map_batches(
            lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                                "c_custkey": t["o_custkey"]}),
            batch_format="pyarrow"),
        cust_t, on="c_custkey")

    # fused bucket tail (VERDICT r3 item #1): the supplier→nation map is
    # dim-sized, so it rides along as a broadcast ref and the supplier
    # attach + same-nation filter + nation partial all run INSIDE the
    # bucket join task — joined rows never re-enter the object store;
    # each bucket emits ≤ |nations| partial rows.
    supp_pd = supp_dim.to_pandas()
    sref = ray.put(supp_pd.set_index("s_suppkey")["s_nationkey"]
                   .astype(np.int64))

    def comb(t: pa.Table) -> pa.Table:
        smap = relational.worker_cached(("q5_supp", sref),
                                        lambda: ray.get(sref))
        snat = smap.reindex(
            t["l_suppkey"].to_numpy(zero_copy_only=False)).to_numpy()
        cnat = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = snat == cnat
        g = pa.table({"n_nationkey": pa.array(cnat[keep]),
                      "rc": pa.array(t["rc"].to_numpy(
                          zero_copy_only=False).astype(np.int64)[keep])}) \
            .group_by("n_nationkey").aggregate([("rc", "sum")])
        return pa.table({"n_nationkey": g["n_nationkey"],
                         "prc": g["rc_sum"].cast(pa.int64())})

    j = relational.bucketed_hash_join(
        li.map_batches(
            lambda t: pa.table({
                "o_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rc": pc.cast(pc.round(pc.multiply(pc.multiply(
                    t["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), t["l_discount"])),
                    100.0), round_mode="half_towards_infinity"),
                    pa.int64())}),
            batch_format="pyarrow"),
        o2.map_batches(
            lambda t: t.select(["o_orderkey", "c_nationkey"]),
            batch_format="pyarrow"),
        on="o_orderkey", combine=comb)

    # ≤ buckets × |nations| partial rows: finish on the driver
    agg = relational.ds_to_table(j).to_pandas() \
        .groupby("n_nationkey", as_index=False)["prc"].sum() \
        .rename(columns={"prc": "rc"})
    out = agg.merge(nt[["n_nationkey", "n_name"]], on="n_nationkey")
    out["revenue"] = out["rc"] / 100.0
    out = out.sort_values(["revenue", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["n_name", "revenue"]]


SQL_Q5 = """
SELECT n_name,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) / 100.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 (forecasting revenue change, adapted): one
    filter-and-aggregate streaming pass — per-batch cents partials,
    single Sum, no shuffle of rows at all."""
    from ray.data.aggregate import Sum
    import pyarrow.dataset as pds
    lo = np.datetime64("1996-01-01T00:00:00")
    hi = np.datetime64("1997-01-01T00:00:00")
    # predicate pushed into the scan: row groups outside the window /
    # discount band never leave storage (the batch filter below stays —
    # pushdown is row-group-granular, the residual filter is row-exact)
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"],
               filter=((pds.field("l_shipdate") >= pa.scalar(lo))
                       & (pds.field("l_shipdate") < pa.scalar(hi))
                       & (pds.field("l_discount") >= 0.02)
                       & (pds.field("l_discount") <= 0.06)
                       & (pds.field("l_quantity") < 24.0)))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], 0.02),
                        pc.less_equal(t["l_discount"], 0.06)),
                pc.less(t["l_quantity"], 24.0)))
        t = t.filter(m)
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"], t["l_discount"]), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        s = pc.sum(rc).as_py() or 0
        return pa.table({"prc": pa.array([s], type=pa.int64())})

    agg = li.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("prc", alias_name="rc"))
    return pd.DataFrame([{"revenue": (agg["rc"] or 0) / 100.0}])


SQL_Q6 = """
SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
         / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 (volume shipping, adapted): bilateral trade revenue
    between NATION_1 and NATION_2 per ship year.  Shape: customer and
    supplier nation maps broadcast (dim-sized), orders pre-filtered to
    the two customer nations via the broadcast inner join, ONE bucketed
    orderkey join lineitem⋈orders, supplier attach from the broadcast
    map, pair filter, cents partials → tiny (nation, nation, year)
    groupby."""
    from ray.data.aggregate import Sum
    n1, n2 = "NATION_1", "NATION_2"
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"])
    lo = np.datetime64("1996-01-01T00:00:00")
    hi = np.datetime64("1998-01-01T00:00:00")

    nt = _read_table(sf_dir, "nation",
                     ["n_nationkey", "n_name"]).to_pandas()
    nmap = nt[nt.n_name.isin([n1, n2])]
    cust_t = _read_table(sf_dir, "customer",
                         ["c_custkey", "c_nationkey"]).to_pandas() \
        .merge(nmap, left_on="c_nationkey", right_on="n_nationkey") \
        .rename(columns={"n_name": "cust_nation"})[
            ["c_custkey", "cust_nation"]]
    supp_t = _read_table(sf_dir, "supplier",
                         ["s_suppkey", "s_nationkey"]).to_pandas() \
        .merge(nmap, left_on="s_nationkey", right_on="n_nationkey") \
        .rename(columns={"n_name": "supp_nation"})[
            ["s_suppkey", "supp_nation"]]

    o2 = relational.broadcast_join(
        orders.map_batches(
            lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                                "c_custkey": t["o_custkey"]}),
            batch_format="pyarrow"),
        cust_t, on="c_custkey")

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))))
        d = t["l_shipdate"].to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "s_suppkey": t["l_suppkey"],
                         "l_year": pa.array(year), "rc": rc})

    # fused bucket tail (VERDICT r3 item #1): supplier-nation attach +
    # bilateral pair filter + (supp, cust, year) partial run inside the
    # bucket join task; each bucket emits ≤ 2 × |years| partial rows.
    sref = ray.put(supp_t.set_index("s_suppkey")["supp_nation"])

    def comb(t: pa.Table) -> pa.Table:
        smap = relational.worker_cached(("q7_supp", sref),
                                        lambda: ray.get(sref))
        sn = smap.reindex(t["s_suppkey"].to_numpy(
            zero_copy_only=False)).to_numpy(dtype=object)
        cn = t["cust_nation"].to_numpy(zero_copy_only=False)
        keep = ((sn == n1) & (cn == n2)) | ((sn == n2) & (cn == n1))
        g = pa.table({
            "supp_nation": pa.array(sn[keep], type=pa.string()),
            "cust_nation": pa.array(cn[keep], type=pa.string()),
            "l_year": pa.array(t["l_year"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]),
            "rc": pa.array(t["rc"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep])}) \
            .group_by(["supp_nation", "cust_nation", "l_year"]) \
            .aggregate([("rc", "sum")])
        return pa.table({"supp_nation": g["supp_nation"],
                         "cust_nation": g["cust_nation"],
                         "l_year": g["l_year"],
                         "prc": g["rc_sum"].cast(pa.int64())})

    j = relational.bucketed_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        o2.map_batches(lambda t: t.select(["o_orderkey", "cust_nation"]),
                       batch_format="pyarrow"),
        on="o_orderkey", combine=comb)

    agg = relational.ds_to_table(j).to_pandas() \
        .groupby(["supp_nation", "cust_nation", "l_year"],
                 as_index=False)["prc"].sum() \
        .rename(columns={"prc": "rc"})
    agg["revenue"] = agg["rc"] / 100.0
    agg = agg.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)
    return agg[["supp_nation", "cust_nation", "l_year", "revenue"]]


SQL_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) / 100.0 AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q8_market_share(sf_dir: str):
    """TPC-H Q8 (national market share, adapted): NATION_1 suppliers'
    share of ECONOMY-part revenue sold to AMERICA-region customers per
    order year.  Shape: the type-filtered part KEY SET and the
    region-filtered customer map broadcast; lineitem prunes on the part
    set per batch; ONE bucketed orderkey join; supplier-nation attach
    from the broadcast map; numerator/denominator cent partials per
    year → 2-row-per-year final combine → share ratio."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])
    lo = np.datetime64("1996-01-01T00:00:00")
    hi = np.datetime64("1998-01-01T00:00:00")

    rt = _read_table(sf_dir, "region",
                     ["r_regionkey", "r_name"]).to_pandas()
    amer = int(rt.loc[rt.r_name == "AMERICA", "r_regionkey"].iloc[0])
    nt = _read_table(sf_dir, "nation", ["n_nationkey", "n_name",
                                        "n_regionkey"]).to_pandas()
    amer_nations = set(nt.loc[nt.n_regionkey == amer,
                              "n_nationkey"].tolist())
    brazil = int(nt.loc[nt.n_name == "NATION_1", "n_nationkey"].iloc[0])

    pt = _read_table(sf_dir, "part", ["p_partkey", "p_type"])
    pkeys = pt.filter(pc.equal(pt["p_type"], "ECONOMY"))["p_partkey"]
    pset = pa.array(sorted(pkeys.to_pylist()), type=pa.int64())

    cust_t = _read_table(sf_dir, "customer",
                         ["c_custkey", "c_nationkey"]).to_pandas()
    cust_t = cust_t[cust_t.c_nationkey.isin(amer_nations)][["c_custkey"]]

    def ord_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_custkey": t["o_custkey"],
                         "o_year": pa.array(year)})

    o2 = relational.broadcast_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        cust_t, on="c_custkey")

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"].cast(pa.int64()),
                              value_set=pset))
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "s_suppkey": t["l_suppkey"], "rc": rc})

    # fused bucket tail (VERDICT r3 item #1): supplier-nation attach +
    # numerator/denominator cents partials per year run inside the bucket
    # join task; each bucket emits ≤ |years| rows.
    supp_pd = _read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]).to_pandas()
    sref = ray.put(supp_pd.set_index("s_suppkey")["s_nationkey"]
                   .astype(np.int64))

    def comb(t: pa.Table) -> pa.Table:
        smap = relational.worker_cached(("q8_supp", sref),
                                        lambda: ray.get(sref))
        snat = smap.reindex(t["s_suppkey"].to_numpy(
            zero_copy_only=False)).to_numpy()
        rc = t["rc"].to_numpy(zero_copy_only=False).astype(np.int64)
        nrc = np.where(snat == brazil, rc, 0)
        g = pa.table({"o_year": pa.array(t["o_year"].to_numpy(
                          zero_copy_only=False).astype(np.int64)),
                      "rc": pa.array(rc), "nrc": pa.array(nrc)}) \
            .group_by("o_year").aggregate([("rc", "sum"), ("nrc", "sum")])
        return pa.table({"o_year": g["o_year"],
                         "prc": g["rc_sum"].cast(pa.int64()),
                         "pnrc": g["nrc_sum"].cast(pa.int64())})

    j = relational.bucketed_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        o2.map_batches(lambda t: t.select(["o_orderkey", "o_year"]),
                       batch_format="pyarrow"),
        on="o_orderkey", combine=comb)

    agg = relational.ds_to_table(j).to_pandas() \
        .groupby("o_year", as_index=False)[["prc", "pnrc"]].sum() \
        .rename(columns={"prc": "rc", "pnrc": "nrc"})
    agg["mkt_share"] = np.round(agg["nrc"] / agg["rc"], 4)
    agg = agg.sort_values("o_year").reset_index(drop=True)
    return agg[["o_year", "mkt_share"]]


SQL_Q8 = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nat = 'NATION_1' THEN rc ELSE 0 END)
             / (SUM(rc) * 1.0), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
              AS BIGINT) AS rc,
         n2.n_name AS nat
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01') t
GROUP BY o_year ORDER BY o_year
"""


def q10_returned_items(sf_dir: str):
    """TPC-H Q10 (returned item reporting, adapted): top-20 customers
    by revenue lost to returns in 1996Q1.  Shape: date-filtered orders,
    returnflag-filtered lineitem cents, ONE bucketed orderkey join,
    per-batch custkey partials → custkey groupby → per-batch top-20
    prune → tiny driver-side finish with broadcast customer/nation
    attach."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])
    lo = np.datetime64("1996-01-01T00:00:00")
    hi = np.datetime64("1996-04-01T00:00:00")

    def ord_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        return t.select(["o_orderkey", "o_custkey"])

    ords = orders.map_batches(ord_prep, batch_format="pyarrow")

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"o_orderkey": t["l_orderkey"], "rc": rc})

    def partial(t: pa.Table) -> pa.Table:
        # custkey ≠ join key, so this is a bucket-local PARTIAL — fused
        # into the join task it shrinks the custkey shuffle to aggregate
        # rows instead of joined lineitem rows (VERDICT r3 item #1)
        g = pa.table({"c_custkey": t["o_custkey"].cast(pa.int64()),
                      "rc": t["rc"].cast(pa.int64())}) \
            .group_by("c_custkey").aggregate([("rc", "sum")])
        g = g.rename_columns(["c_custkey", "prc"])
        return pa.table({"c_custkey": g["c_custkey"],
                         "prc": g["prc"].cast(pa.int64())})

    j = relational.bucketed_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"), ords,
        on="o_orderkey", combine=partial)

    agg = j.groupby("c_custkey").aggregate(Sum("prc", alias_name="rc"))

    def top20(t: pa.Table) -> pa.Table:
        if t.num_rows > 20:
            rc = t["rc"].to_numpy(zero_copy_only=False)
            # cutoff by VALUE, keeping every row tied with the 20th-largest
            # revenue: an argpartition-only prune breaks 20th-place cents
            # ties arbitrarily and can drop the customer the final
            # (revenue DESC, c_custkey ASC) order would pick (ADVICE r3)
            cut = np.partition(rc, len(rc) - 20)[len(rc) - 20]
            t = t.filter(pa.array(rc >= cut))
        return t

    cand = relational.ds_to_table(
        agg.map_batches(top20, batch_format="pyarrow")).to_pandas()
    cand = cand.sort_values(["rc", "c_custkey"],
                            ascending=[False, True]).head(20)
    ct = _read_table(sf_dir, "customer",
                     ["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nt = _read_table(sf_dir, "nation",
                     ["n_nationkey", "n_name"]).to_pandas()
    out = cand.merge(ct, on="c_custkey") \
        .merge(nt, left_on="c_nationkey", right_on="n_nationkey")
    out["revenue"] = out["rc"] / 100.0
    out = out.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["c_custkey", "c_name", "n_name", "revenue"]]


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) / 100.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q12_shipmode_priority(sf_dir: str):
    """TPC-H Q12 (shipping-mode priority, adapted to the synth schema:
    l_returnflag stands in for shipmode): per flag, counts of
    high-priority (1-URGENT/2-HIGH) vs other orders among 1997-shipped
    lineitems — one bucketed orderkey join, pure integer output."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"])
    lo = np.datetime64("1997-01-01T00:00:00")
    hi = np.datetime64("1998-01-01T00:00:00")

    lif = li.map_batches(
        lambda t: pa.table({
            "o_orderkey": t.filter(pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi))))["l_orderkey"],
            "l_returnflag": t.filter(pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi))))
            ["l_returnflag"]}),
        batch_format="pyarrow")
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # bucket-local partial fused into the join task: the flag groupby
        # then shuffles ≤ buckets × |flags| rows
        hi_m = pc.is_in(t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "ph": pc.cast(hi_m, pa.int64()),
            "pl": pc.cast(pc.invert(hi_m), pa.int64())}) \
            .group_by("l_returnflag") \
            .aggregate([("ph", "sum"), ("pl", "sum")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "ph": g["ph_sum"].cast(pa.int64()),
                         "pl": g["pl_sum"].cast(pa.int64())})

    j = relational.bucketed_hash_join(lif, orders, on="o_orderkey",
                                      combine=partial)
    return j.groupby("l_returnflag") \
        .aggregate(Sum("ph", alias_name="high_line_count"),
                   Sum("pl", alias_name="low_line_count"))


SQL_Q12 = """
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


def q_profile_orders(sf_dir: str):
    """ANALYZE-style column profiling of the orders table: one
    streaming pass, per-batch column partials, tiny groupby merge."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    return relational.profile_columns(
        orders, ["o_orderkey", "o_custkey", "o_totalprice"])


SQL_PROFILE = """
SELECT 'o_orderkey' AS column, COUNT(o_orderkey) AS n,
       COUNT(*) - COUNT(o_orderkey) AS n_null,
       CAST(MIN(o_orderkey) AS DOUBLE) AS min_val,
       CAST(MAX(o_orderkey) AS DOUBLE) AS max_val FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(o_custkey), COUNT(*) - COUNT(o_custkey),
       CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(o_totalprice),
       COUNT(*) - COUNT(o_totalprice),
       CAST(MIN(o_totalprice) AS DOUBLE),
       CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
"""


def q_bm25_search(sf_dir: str):
    """BM25 ranked retrieval (Lucene's idf form) for the query
    'hash join batch': query-term explode filter inside the arrow pass,
    df/avglen from tiny partials, one (docs-with-terms)-sized scoring
    groupby, top-10."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.bm25_topk(docs, ["hash", "join", "batch"], k=10)


SQL_BM25 = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents),
stats AS (SELECT COUNT(*) AS n, AVG(len(w)) AS avglen FROM toks),
tf AS (
  SELECT doc_id, x AS word, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS x FROM toks)
  WHERE x IN ('hash', 'join', 'batch')
  GROUP BY doc_id, x),
df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
dl AS (SELECT doc_id, len(w) AS dl FROM toks),
sc AS (
  SELECT tf.doc_id,
         SUM(LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75
                               + 0.75 * dl.dl / stats.avglen)))
           AS s
  FROM tf JOIN df USING (word) JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id)
SELECT doc_id, ROUND(s, 4) AS score FROM sc
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_clean_lines(sf_dir: str):
    """Boilerplate line cleaning (jusText/Trafilatura shape): docs get
    deterministic nav-menu and number-row lines (like the paragraph
    fixture) and the cleaner must drop exactly those, keeping the body
    rejoined in order."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def enrich(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        idn = ids.to_numpy(zero_copy_only=False)
        j = pc.binary_join_element_wise
        z = pa.scalar("")
        nav = pa.scalar("\nHome | About | Contact")
        nums = pa.scalar("\n12 345 6789 01")
        t0 = j(batch["text"],
               pc.if_else(pa.array(idn % 2 == 0), nav, z),
               pc.if_else(pa.array(idn % 7 == 0), nums, z), "")
        return pa.table({"doc_id": ids, "text": t0})

    return text.clean_lines(docs.map_batches(enrich,
                                             batch_format="pyarrow"))


SQL_CLEAN_LINES = """
WITH e AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 2 = 0
            THEN chr(10) || 'Home | About | Contact' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN chr(10) || '12 345 6789 01' ELSE '' END AS t0
  FROM documents),
t AS (SELECT doc_id, string_split(t0, chr(10)) AS ls FROM e),
l AS (SELECT doc_id, i, ls[CAST(i AS INT)] AS line, len(ls) AS n_lines
      FROM (SELECT doc_id, ls,
                   unnest(generate_series(1, len(ls))) AS i FROM t)),
k AS (SELECT doc_id, i, line, n_lines,
             CASE WHEN len(regexp_extract_all(line, '\\S+')) >= 3
                   AND 2 * len(regexp_extract_all(line, '\\d'))
                       <= length(line)
                   AND NOT regexp_matches(line,
                       '[|' || chr(8226) || chr(187) || chr(183) || ']')
                  THEN 1 ELSE 0 END AS keep
      FROM l)
SELECT doc_id,
       COALESCE(STRING_AGG(CASE WHEN keep = 1 THEN line END,
                           chr(10) ORDER BY i), '') AS text_clean,
       MAX(n_lines) AS n_lines,
       CAST(SUM(keep) AS BIGINT) AS n_kept
FROM k GROUP BY doc_id
"""


def q_sample_fixed_docs(sf_dir: str):
    """Exact-size uniform sample (fixed token/doc budget): the 100 docs
    with the smallest golden-ratio key hash — a distributed top-n, only
    n·blocks candidates leave the workers."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return relational.exact_size_sample(docs, key_col="doc_id", n=100)


SQL_SAMPLE_FIXED = """
SELECT doc_id, lang FROM documents
ORDER BY ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
          % 18446744073709551616), doc_id
LIMIT 100
"""


def q_latest_event_per_user(sf_dir: str):
    """DISTINCT ON / latest-row-per-key: each user's most recent event
    (ts DESC, event_id tie-break) via the per-batch-pruned grouped
    top-n — the shuffle carries ≤ 1 row per (user, batch)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = relational.grouped_top_n(ev, key_col="user_id",
                                   order_col="ts", n=1,
                                   id_col="event_id").to_pandas()
    return out[["user_id", "event_id", "ts"]]


SQL_LATEST_EVENT = """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id) AS rn
  FROM events)
WHERE rn = 1
"""


def q_regr_price_quantity(sf_dir: str):
    """Per-returnflag linear fit of extended price on quantity
    (REGR_SLOPE/REGR_INTERCEPT) from one sufficient-statistics pass."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    return relational.grouped_regression(
        li, key_col="l_returnflag", x_col="l_quantity",
        y_col="l_extendedprice")


SQL_REGR = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4)
         AS intercept
FROM lineitem GROUP BY l_returnflag
"""


def q_bpe_token_counts(sf_dir: str):
    """Tokenizer application: count tokens per doc under the corpus's
    own trained BPE merges (the token-budget metric).  Merge table ships
    in the task closure; per-batch encoding runs over distinct words
    only.  Iterative merges aren't SQL-expressible — rows-only check;
    reference equality pytest-pinned."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = text.bpe_train(docs, num_merges=8)
    return text.bpe_encode(docs, merges)


def q_zscore_acctbal(sf_dir: str):
    """Per-nation z-score standardization of customer balances (the
    feature-normalization primitive): two sufficient-statistic passes,
    size-guarded broadcast of the per-key stats."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    return relational.grouped_zscore(
        cust, key_col="c_nationkey", val_col="c_acctbal",
        id_col="c_custkey")


SQL_ZSCORE = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ROUND((c_acctbal - AVG(c_acctbal)
                OVER (PARTITION BY c_nationkey))
             / STDDEV_SAMP(c_acctbal)
                OVER (PARTITION BY c_nationkey), 4) AS zscore
FROM customer
"""


def _doc_features(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def feats(batch: pa.Table) -> pa.Table:
        x1 = batch["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.float64) / 1000.0
        x2 = pc.list_value_length(
            pc.split_pattern(batch["text"], pattern=" ")) \
            .to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
        lbl = (batch["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0) \
            .astype(np.float64)
        return pa.table({"doc_id": batch["doc_id"], "x1": pa.array(x1),
                         "x2": pa.array(x2), "label": pa.array(lbl)})

    return docs.map_batches(feats, batch_format="pyarrow")


def q_logreg_score(sf_dir: str):
    """Broadcast-weights model inference: vectorized sigmoid(b + X·w)
    over per-doc features with fixed weights; the oracle computes the
    identical sigmoid in SQL."""
    from ..stages import ml
    feats = _doc_features(sf_dir)
    out = ml.logreg_score(feats, ["x1", "x2"], weights=[0.8, -0.5],
                          bias=0.25)
    return out.select_columns(["doc_id", "score"])


SQL_LOGREG_SCORE = """
WITH f AS (
  SELECT doc_id, n_chars / 1000.0 AS x1,
         len(string_split(text, ' ')) / 100.0 AS x2
  FROM documents)
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-(0.25 + 0.8 * x1 - 0.5 * x2))), 6) AS score
FROM f
"""


def q_logreg_train(sf_dir: str):
    """Distributed logistic-regression training (5 full-batch GD epochs;
    each epoch ONE streaming pass reducing k-vector gradient partials —
    data never shuffles).  Iterative — rows-only; equality with a
    single-process numpy reference is pytest-pinned at two
    parallelisms."""
    from ..stages import ml
    feats = _doc_features(sf_dir)
    fit = ml.logreg_train(feats, ["x1", "x2"], "label", epochs=5, lr=0.5)
    return pd.DataFrame([{"bias": fit["bias"], "w1": fit["weights"][0],
                          "w2": fit["weights"][1], "n": fit["n"]}])


def q_funnel_click_purchase(sf_dir: str):
    """Two-step conversion funnel: per user, the first click and whether
    a purchase follows within 24 h (strictly after, inclusive bound).
    Rows filter to the two step types BEFORE the single user-bucket
    shuffle."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return relational.funnel_conversion(
        ev, user_col="user_id", ts_col="ts", type_col="event_type",
        first_step="click", second_step="purchase", within_sec=86400)


SQL_FUNNEL = """
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events
  WHERE event_type = 'click' GROUP BY user_id)
SELECT f.user_id, f.first_ts,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM events p
         WHERE p.user_id = f.user_id AND p.event_type = 'purchase'
           AND p.ts > f.first_ts
           AND p.ts <= f.first_ts + INTERVAL 1 DAY)
       THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM f
"""


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention triangle: users cohorted by the
    epoch-week of their first event; distinct active users per
    (cohort_week, week_offset)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return relational.cohort_retention(ev, user_col="user_id",
                                       ts_col="ts")


SQL_COHORT = """
WITH w AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
c AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id),
t AS (SELECT DISTINCT c.cohort_week, w.week - c.cohort_week AS week_offset,
             w.user_id
      FROM w JOIN c USING (user_id))
SELECT cohort_week, week_offset, COUNT(*) AS n_users
FROM t GROUP BY cohort_week, week_offset
"""


def q_rank_events_user(sf_dir: str):
    """Rank windows per user over event value (cents): ROW_NUMBER /
    RANK / DENSE_RANK / PERCENT_RANK in one bucket-shuffle kernel.
    PERCENT_RANK is one exact-int division so the doubles are
    bit-identical across engines."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"], "cents": cents})

    return relational.grouped_ranks(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        key_col="user_id", order_col="cents", id_col="event_id")


SQL_RANKS = """
SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY ROUND(value * 100), event_id)
         AS row_number,
       RANK() OVER w AS rank,
       DENSE_RANK() OVER w AS dense_rank,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ROUND(value * 100))
"""


def q_moving_sum_user(sf_dir: str):
    """Bounded row window: per-user 4-row moving spend total (ROWS
    BETWEEN 3 PRECEDING AND CURRENT ROW), exact on integer cents."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"], "ts": t["ts"],
                         "cents": cents})

    out = relational.moving_aggregate(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", order_col="event_id",
        value_col="cents", window_rows=3).to_pandas()
    out["mov_value"] = out["mov_sum"] / 100.0
    return out[["event_id", "user_id", "mov_n", "mov_value"]] \
        .astype({"mov_n": "int64"})


SQL_MOVING = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS mov_n,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w / 100.0
         AS mov_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q_nb_predict_lang(sf_dir: str):
    """Naive-Bayes bag-of-words classifier (the fastText-style corpus
    filter shape): train add-1-smoothed word likelihoods on the corpus
    with lang as the label, then re-score every doc — broadcast model,
    one vectorized merge + segment-sum per batch, integer/string output
    (argmax is robust to last-ulp drift, so this hash-matches)."""
    from ..stages import ml
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    model = ml.nb_train(docs, text_col="text", label_col="lang")
    return ml.nb_predict(docs, model, text_col="text", id_col="doc_id")


SQL_NB_PREDICT = """
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM documents),
wc AS (SELECT lang AS label, w, COUNT(*) AS c
       FROM words GROUP BY label, w),
tot AS (SELECT label, SUM(c) AS t FROM wc GROUP BY label),
cls AS (SELECT lang AS label, COUNT(*) AS nd FROM documents
        GROUP BY lang),
nv AS (SELECT COUNT(DISTINCT w) AS v,
              (SELECT COUNT(*) FROM documents) AS n FROM words),
sc AS (
  SELECT tk.doc_id, c.label,
         LN(CAST(c.nd AS DOUBLE) / nv.n)
           + SUM(LN((COALESCE(wc.c, 0) + 1.0) / (tot.t + nv.v))) AS s
  FROM words tk
  CROSS JOIN cls c
  CROSS JOIN nv
  JOIN tot ON tot.label = c.label
  LEFT JOIN wc ON wc.label = c.label AND wc.w = tk.w
  GROUP BY tk.doc_id, c.label, c.nd, nv.n, nv.v),
r AS (SELECT doc_id, label,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY s DESC, label) AS rn
      FROM sc)
SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_tokens,
       r.label AS pred_label
FROM documents d JOIN r ON r.doc_id = d.doc_id AND r.rn = 1
"""


def q_lm_perplexity(sf_dir: str):
    """CCNet-style bigram-LM fluency scoring: add-1-smoothed bigram
    model trained on the corpus, mean negative log-likelihood per doc
    (rounded 4dp)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.bigram_lm_scores(docs, key_col="doc_id",
                                 text_col="text")


SQL_LM_PERPLEXITY = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents),
big AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM toks WHERE len(w) >= 2)),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
cc AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY w1),
nv AS (SELECT COUNT(DISTINCT x) AS v
       FROM (SELECT unnest(w) AS x FROM toks)),
sc AS (
  SELECT b.doc_id, COUNT(*) AS n_bigrams,
         ROUND(-AVG(LN((bc.c12 + 1.0) / (cc.c1 + nv.v))), 4) AS nll
  FROM big b
  JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
  JOIN cc ON cc.w1 = b.w1
  CROSS JOIN nv
  GROUP BY b.doc_id)
SELECT t.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       COALESCE(sc.nll, 0.0) AS nll
FROM toks t LEFT JOIN sc ON sc.doc_id = t.doc_id
"""


def q_char_entropy(sf_dir: str):
    """Per-doc codepoint Shannon entropy (bits) — gibberish/binary-noise
    quality signal; pure vectorized map."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(text.char_entropy_batch,
                            batch_format="pyarrow")


SQL_CHAR_ENTROPY = """
WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).'))
              AS c FROM documents),
cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
n AS (SELECT doc_id, SUM(k) AS nc FROM cnt GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(ROUND(-SUM((CAST(k AS DOUBLE) / n.nc)
                           * LOG2(CAST(k AS DOUBLE) / n.nc)), 4), 0.0)
         AS entropy
FROM documents d
LEFT JOIN cnt ON cnt.doc_id = d.doc_id
LEFT JOIN n ON n.doc_id = d.doc_id
GROUP BY d.doc_id
"""


def q_chunk_documents(sf_dir: str):
    """Context-window chunking: 32-token windows, 8-token overlap —
    the pre-tokenization flat-map for LM training / embedding indexing.
    Pure per-batch op, no shuffle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)


SQL_CHUNKS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (SELECT doc_id, w,
             unnest(generate_series(
               0, CAST((GREATEST(len(w), 1) - 1) // 24 AS BIGINT))) AS j
      FROM t)
SELECT doc_id, j AS chunk_idx,
       array_to_string(w[CAST(j * 24 + 1 AS INT)
                         : CAST(j * 24 + 32 AS INT)], ' ') AS chunk_text,
       LEAST(j * 24 + 32, len(w)) - j * 24 AS n_tokens
FROM c
"""


def q_reassemble_roundtrip(sf_dir: str):
    """Chunk (zero overlap) then reassemble: ordered grouped
    concatenation (STRING_AGG ORDER BY) recovers every doc byte-exactly
    — ' '.join ∘ split(' ') is the identity, so the oracle is the
    documents table itself plus the closed-form chunk count."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = text.chunk_documents(docs, chunk_tokens=16,
                                  overlap_tokens=0)
    return text.reassemble_chunks(chunks)


SQL_REASSEMBLE = """
SELECT doc_id, text,
       CAST((GREATEST(len(string_split(text, ' ')), 1) - 1) // 16 + 1
            AS BIGINT) AS n_chunks
FROM documents
"""


def q_length_batches(sf_dir: str):
    """Length-bucketed batch assignment (padding-efficient LM batching):
    power-of-two token-length buckets, batches of 32 in doc order —
    distributed rank via the per-bucket range-partition prefix scan."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def toklen(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(t["text"], pattern=" ")).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n})

    return relational.length_bucket_batches(
        docs.map_batches(toklen, batch_format="pyarrow"),
        id_col="doc_id", len_col="n_tokens", batch_size=32)


SQL_LENGTH_BATCHES = """
WITH t AS (SELECT doc_id,
                  len(string_split(text, ' ')) AS n_tokens
           FROM documents),
b AS (SELECT doc_id, n_tokens,
             CAST(length(bin(GREATEST(n_tokens, 1))) - 1 AS BIGINT)
               AS len_bucket
      FROM t)
SELECT doc_id, n_tokens, len_bucket,
       (ROW_NUMBER() OVER (PARTITION BY len_bucket ORDER BY doc_id)
          - 1) // 32 AS batch_idx
FROM b
"""


def q_geohash_points(sf_dir: str):
    """Geohash tiling (the third cell index next to S2 and the raster
    grid): precision-6 cell + precision-4 parent per synthetic customer
    point — bit-interleave encode is pure vectorized map, hash-checked
    against the identical quantization arithmetic in SQL."""
    from ..index import geohash as gh
    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"), batch_format="pyarrow")

    def encode(t: pa.Table) -> pa.Table:
        lon = pc.subtract(pc.multiply(t["px"], 0.36), 180.0)
        lat = pc.subtract(pc.multiply(t["py"], 0.18), 90.0)
        out = pa.table({"c_custkey": t["c_custkey"],
                        "lon": lon, "lat": lat})
        out = gh.geohash_batch(out, "lon", "lat", precision=6,
                               out_col="gh6")
        g6 = out["gh6"]
        return pa.table({"c_custkey": out["c_custkey"], "gh6": g6,
                         "gh4": pc.utf8_slice_codeunits(g6, 0, 4)})

    return pts.map_batches(encode, batch_format="pyarrow")


def _sql_geohash_points() -> str:
    from ..index.geohash import geohash_sql_expr
    lon = "((c_custkey * 7919) % 1000 + 0.5) * 0.36 - 180.0"
    lat = "((c_custkey * 104729) % 1000 + 0.5) * 0.18 - 90.0"
    e = geohash_sql_expr(lon, lat, 6)
    return f"""
SELECT c_custkey, gh6, substr(gh6, 1, 4) AS gh4
FROM (SELECT c_custkey, {e} AS gh6 FROM customer)
"""


def q_geohash_cell_counts(sf_dir: str):
    """Spatial aggregation on the geohash index: point count per
    precision-4 cell (the density histogram that feeds skew/salt
    planning, as cell_histogram does for S2)."""
    from ray.data.aggregate import Sum
    pts = q_geohash_points(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["gh4"]).group_by("gh4") \
            .aggregate([([], "count_all")])
        return pa.table({"gh4": g["gh4"],
                         "pn": g["count_all"].cast(pa.int64())})

    return pts.map_batches(partial, batch_format="pyarrow") \
        .groupby("gh4").aggregate(Sum("pn", alias_name="n_points"))


def _sql_geohash_cell_counts() -> str:
    from ..index.geohash import geohash_sql_expr
    lon = "((c_custkey * 7919) % 1000 + 0.5) * 0.36 - 180.0"
    lat = "((c_custkey * 104729) % 1000 + 0.5) * 0.18 - 90.0"
    e = geohash_sql_expr(lon, lat, 4)
    return f"""
SELECT {e} AS gh4, COUNT(*) AS n_points FROM customer GROUP BY gh4
"""


def q_mixture_sample(sf_dir: str):
    """Corpus-mixture sampling (LM data-recipe step): target lang
    proportions en .3 / de .2 / es .2 / fr .2 / zh .1; per-stratum keep
    rates derived from ONE tiny counting pass so the output hits the
    targets at the max supportable size; then a pure per-row hash
    filter."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return relational.mixture_sample(
        docs, key_col="doc_id", strata_col="lang",
        weights={"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.2,
                 "zh": 0.1})


SQL_MIXTURE = """
WITH n AS (SELECT lang, COUNT(*) AS ns FROM documents GROUP BY lang),
w(lang, w) AS (VALUES ('en', 0.3), ('de', 0.2), ('es', 0.2),
                      ('fr', 0.2), ('zh', 0.1)),
t AS (SELECT MIN(ns / w) AS t FROM n JOIN w USING (lang)),
r AS (SELECT lang, CAST(FLOOR(1000000.0 * w * t.t / ns) AS BIGINT)
        AS rate
      FROM n JOIN w USING (lang) CROSS JOIN t)
SELECT d.doc_id, d.lang FROM documents d JOIN r ON r.lang = d.lang
WHERE ((CAST(d.doc_id + 1 AS HUGEINT) * 11400714819323198485)
       % 18446744073709551616) % 1000000 < r.rate
"""


def q_mode_event_per_user(sf_dir: str):
    """MODE() per key: each user's most frequent event type (ties →
    lexicographically smallest).  Count partials shrink the exchange
    before the one argmax shuffle."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return relational.grouped_mode(ev, key_col="user_id",
                                   val_col="event_type")


SQL_MODE = """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
           FROM events GROUP BY user_id, event_type),
r AS (SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type AS mode_value, n AS n_mode
FROM r WHERE rn = 1
"""


def q_docs_above_median(sf_dir: str):
    """Quantile-threshold corpus filter: keep docs at or above the
    exact corpus median length — the quality-cutoff shape (threshold
    from the two-pass histogram selector, then a pure broadcast-scalar
    filter; nothing sorts globally)."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def const_key(t: pa.Table) -> pa.Table:
        return t.append_column("_k", pa.array(
            np.zeros(len(t), dtype=np.int64)))

    med = relational.grouped_quantile_disc(
        docs.map_batches(const_key, batch_format="pyarrow"),
        key_col="_k", val_col="n_chars", qs=[0.5])["p50"].iloc[0]

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_chars"], float(med)))

    return docs.map_batches(keep, batch_format="pyarrow")


SQL_ABOVE_MEDIAN = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars >= (SELECT PERCENTILE_DISC(0.5)
                    WITHIN GROUP (ORDER BY n_chars) FROM documents)
"""


def q_value_band_lookup(sf_dir: str):
    """Interval-containment lookup join (the IP-range / price-band
    shape): each event's value resolves to its [lo, hi) band via one
    broadcast searchsorted per batch — no shuffle."""
    ev = _read(sf_dir, "events", ["event_id", "value"])
    ranges = pa.table({
        "lo": pa.array([0.0, 10.0, 50.0, 200.0, 500.0]),
        "hi": pa.array([10.0, 50.0, 200.0, 500.0, 1e9]),
        "band": pa.array(["micro", "small", "mid", "large", "huge"]),
    })
    return relational.interval_lookup_join(ev, "value", ranges,
                                           how="inner")


SQL_VALUE_BAND = """
SELECT event_id, value, band
FROM events
JOIN (VALUES (0.0, 10.0, 'micro'), (10.0, 50.0, 'small'),
             (50.0, 200.0, 'mid'), (200.0, 500.0, 'large'),
             (500.0, 1000000000.0, 'huge')) AS r(lo, hi, band)
  ON value >= lo AND value < hi
"""


def q_event_type_pairs(sf_dir: str):
    """Market-basket co-occurrence: for every unordered pair of event
    types, the number of users who performed both — vectorized
    triangular pair explosion per user bucket, |V|²-bounded output."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return relational.cooccurrence_pairs(ev, key_col="user_id",
                                         val_col="event_type")


SQL_EVENT_PAIRS = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS a, b.event_type AS b, COUNT(*) AS n_keys
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


def q_pmi_unigram_collocations(sf_dir: str):
    """Collocation extraction: corpus top-20 adjacent pairs by PMI
    (min count 5) — one bigram groupby, vocabulary-sized margins,
    heavy-hitter prune tail."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return text.top_pmi_collocations(docs, k=20, min_count=5)


SQL_PMI_UNIGRAM = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents),
big AS (
  SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM toks WHERE len(w) >= 2)),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
l AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY w1),
r AS (SELECT w2, SUM(c12) AS c2 FROM bc GROUP BY w2),
w AS (SELECT SUM(c12) AS tot FROM bc)
SELECT bc.w1, bc.w2, bc.c12,
       ROUND(LN(bc.c12 * (tot * 1.0) / ((c1 * 1.0) * c2)), 4) AS pmi
FROM bc JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN w
WHERE bc.c12 >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


def _fuzzy_entity_nm(t: pa.Table) -> pa.Array:
    """Entity display name: p_name || ' #' || zero-padded key — the
    high-entropy tail makes blocking selective while the word head keeps
    realistic fuzzy collisions."""
    key_s = pc.cast(t["p_partkey"], pa.string())
    pad = pc.utf8_lpad(key_s, 6, "0")
    return pc.binary_join_element_wise(
        t["p_name"].combine_chunks().cast(pa.string()), " #", pad, "")


def _fuzzy_sides(sf_dir: str):
    """Clean vs dirty entity tables for record linkage: the dirty side
    applies ONE deterministic golden-hash edit per record (delete /
    substitute-'q' / identity at position (h//3) % len) so the DuckDB
    twin reconstructs the identical corrupted catalog."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    mix = np.uint64(relational.SAMPLE_MIX)

    def clean_b(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["p_partkey"].combine_chunks().cast(pa.int64()),
            "nm": _fuzzy_entity_nm(t)})

    def dirty_b(t: pa.Table) -> pa.Table:
        keys = t["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        nms = _fuzzy_entity_nm(t).to_pylist()
        with np.errstate(over="ignore"):
            h = (keys + np.uint64(1)) * mix
        op = (h % np.uint64(3)).astype(np.int64)
        lens = np.fromiter((len(s) for s in nms), np.uint64, len(nms))
        pos = ((h // np.uint64(3)) % np.maximum(lens, 1)).astype(np.int64)
        out = []
        # bounded per-row string surgery: fixture enrichment, not the
        # operator hot path (the join verifies via batch_edit_distance)
        for nm, o, p in zip(nms, op, pos):
            if o == 0:
                out.append(nm[:p] + nm[p + 1:])
            elif o == 1:
                out.append(nm[:p] + "q" + nm[p + 1:])
            else:
                out.append(nm)
        return pa.table({
            "id": pa.array(keys.astype(np.int64) + 1_000_000,
                           type=pa.int64()),
            "nm": pa.array(out, type=pa.string())})

    return (part.map_batches(clean_b, batch_format="pyarrow"),
            part.map_batches(dirty_b, batch_format="pyarrow"))


def q_fuzzy_match_pairs(sf_dir: str):
    """Blocked fuzzy join (record linkage): clean catalog x corrupted
    catalog, prefix-6 + suffix-6 multi-pass blocking, vectorized
    Levenshtein verify at distance <= 1.  For single-edit corruption on
    names >= 12 chars the two-pass blocking is recall-COMPLETE (one edit
    cannot alter both windows), so the oracle's blocked join enumerates
    the identical pair set."""
    from ..stages import fuzzy
    clean, dirty = _fuzzy_sides(sf_dir)
    return fuzzy.blocked_fuzzy_pairs(clean, dirty, id_col="id",
                                     text_col="nm", max_dist=1,
                                     block_len=6)


_FUZZY_LABELS_MEMO: dict = {}


def _fuzzy_cluster_labels(sf_dir: str) -> pd.DataFrame:
    """Resolved (node, label) entity clusters, memoized per input
    fingerprint — the fuzzy blocking + Levenshtein verify + connected
    components run ONCE per corpus and feed both the clusters query
    and the golden-record survivorship (same pattern as the LangId
    confusion memo)."""
    from ..stages import fuzzy
    memo_key = _fingerprint_cache_dir(sf_dir, "part", "fuzzylbl")
    hit = _FUZZY_LABELS_MEMO.get(memo_key)
    if hit is not None:
        return hit.copy()
    clean, dirty = _fuzzy_sides(sf_dir)
    pairs = fuzzy.blocked_fuzzy_pairs(clean, dirty, id_col="id",
                                      text_col="nm", max_dist=1,
                                      block_len=6)
    out = dd.connected_components(
        pairs.select_columns(["a", "b"])).to_pandas()
    _FUZZY_LABELS_MEMO.clear()         # one entry: bounded memory
    _FUZZY_LABELS_MEMO[memo_key] = out.copy()
    return out


def q_fuzzy_entity_clusters(sf_dir: str):
    """Entity resolution end-to-end: the fuzzy pairs feed the existing
    connected-components kernel; every matched record gets the min
    reachable id as its entity label (clean ids < 1e6 < dirty ids, so
    labels are the canonical clean record where one exists)."""
    return _fuzzy_cluster_labels(sf_dir)


def q_ab_test_event_value(sf_dir: str):
    """A/B comparison: Welch's t statistic for event value (cents)
    between user cohorts (user_id % 2) per event type.  One narrow
    sufficient-statistics shuffle (n, Σ, Σ²) — integer cents make the
    partials EXACT, and the variance numerator n·Σ² − Σ² stays an exact
    integer on both sides (HUGEINT / python int), so the doubles after
    the single cast are bit-identical to the oracle's."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "cohort": (t["user_id"].to_numpy(zero_copy_only=False) % 2)
            .astype(np.int64),
            "n": 1, "s1": cents, "s2": cents * cents})
        g = df.groupby(["event_type", "cohort"], sort=False) \
            .agg(n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "cohort"]) \
        .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                   Sum("s2", alias_name="s2")).to_pandas()

    rows = []
    for et, g in stats.groupby("event_type"):
        by = {int(r.cohort): r for r in g.itertuples()}
        if 0 not in by or 1 not in by:
            continue
        a, b = by[0], by[1]
        # exact-integer variance numerators (python ints — no 2^53 loss)
        va = float(int(a.n) * int(a.s2) - int(a.s1) ** 2) \
            / (int(a.n) * (int(a.n) - 1.0))
        vb = float(int(b.n) * int(b.s2) - int(b.s1) ** 2) \
            / (int(b.n) * (int(b.n) - 1.0))
        ma = int(a.s1) / int(a.n)
        mb = int(b.s1) / int(b.n)
        t_stat = (ma - mb) / np.sqrt(va / int(a.n) + vb / int(b.n))
        rows.append({"event_type": et, "n_a": int(a.n), "n_b": int(b.n),
                     "t_stat": round(float(t_stat), 4)})
    return pd.DataFrame(rows).sort_values("event_type") \
        .reset_index(drop=True)


def q_event_transition_matrix(sf_dir: str):
    """User-journey Markov chain: P(next event type | current) from
    per-user ts-ordered transitions.  One user-bucket shuffle; per
    bucket a vectorized sort + shift builds (cur, nxt) pairs, partial
    counts collapse before the tiny pair groupby; probabilities
    normalize against the pair table's own margins (exact-int division
    → ROUND-4-identical doubles)."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pa.array(relational.stable_bucket(t["user_id"], 64)))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"])
        same = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        cur = df["event_type"].to_numpy()[:-1][same]
        nxt = df["event_type"].to_numpy()[1:][same]
        g = pd.DataFrame({"cur": cur, "nxt": nxt, "n": 1}) \
            .groupby(["cur", "nxt"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas") \
        .groupby(["cur", "nxt"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    tot = counts.groupby("cur")["n"].transform("sum")
    counts["p"] = np.round(counts["n"] / tot, 4)
    return counts.sort_values(["cur", "nxt"]).reset_index(drop=True)[
        ["cur", "nxt", "n", "p"]]


SQL_TRANSITIONS = """
WITH t AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (SELECT cur, nxt, COUNT(*) AS n FROM t
      WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT cur, nxt, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY cur), 4) AS p
FROM c ORDER BY cur, nxt
"""


def q_repeat_orders_1d(sf_dir: str):
    """Per-key temporal self-join: pairs of orders by the SAME customer
    placed within 1 day of each other (rapid-repeat detection).  One
    customer-bucket shuffle; per bucket a vectorized sort +
    searchsorted window sweep — never a quadratic per-customer loop.
    Distinct from asof (nearest-only) and the global band join."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    day_us = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pa.array(relational.stable_bucket(t["o_custkey"], 64)))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cust = df["o_custkey"].to_numpy()
        dts = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64) // day_us
        keys = df["o_orderkey"].to_numpy()
        n = len(df)
        if n == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        # composite monotone key: group id spaced wider than any
        # intra-group day span, so ONE global searchsorted finds each
        # row's (same customer, <= +1 day) window end
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        g = np.cumsum(new) - 1
        comp = g * 1_000_000 + dts
        hi = np.searchsorted(comp, comp + 1, side="right")
        cnt = hi - np.arange(n) - 1
        ia = np.repeat(np.arange(n), cnt)
        ib = relational._ragged_arange(cnt) + ia + 1
        a, b = keys[ia], keys[ib]
        return pa.table({"a": pa.array(np.minimum(a, b),
                                       type=pa.int64()),
                         "b": pa.array(np.maximum(a, b),
                                       type=pa.int64())})

    return orders.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas")


SQL_REPEAT_ORDERS = """
SELECT LEAST(x.o_orderkey, y.o_orderkey) AS a,
       GREATEST(x.o_orderkey, y.o_orderkey) AS b
FROM orders x JOIN orders y
  ON x.o_custkey = y.o_custkey
 AND x.o_orderkey < y.o_orderkey
 AND ABS(date_diff('day', CAST(x.o_orderdate AS DATE),
                    CAST(y.o_orderdate AS DATE))) <= 1
"""


def q_merge_upsert_documents(sf_dir: str):
    """MERGE / CDC-apply: a deterministic change set (updates for
    doc_id%5==0, deletes for %7==0, 50 inserts) applies to the corpus
    snapshot via ONE full-outer bucketed join + vectorized CASE — the
    upsert primitive behind incremental corpus refreshes.  Returns the
    merged corpus's per-lang doc count + total chars so the whole merge
    result is hash-checked."""
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents",
                 ["doc_id", "text", "lang", "n_chars"])
    n_total = docs.count()

    def changes(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        upd = d % 5 == 0
        dele = d % 7 == 0
        keep = upd | dele
        op = np.where(dele[keep], "D", "U")
        txt = pc.binary_join_element_wise(
            t["text"].filter(pa.array(keep)), " v2", "")
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(keep)),
                         "op": pa.array(op),
                         "new_text": txt,
                         "new_lang": t["lang"].filter(pa.array(keep))})

    def inserts(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = d < 50
        return pa.table({
            "doc_id": pa.array(d[keep] + n_total, type=pa.int64()),
            "op": pa.array(np.full(keep.sum(), "I", dtype=object)),
            "new_text": pa.array(["fresh doc"] * int(keep.sum())),
            "new_lang": pa.array(["en"] * int(keep.sum()))})

    chg = docs.map_batches(changes, batch_format="pyarrow") \
        .union(docs.map_batches(inserts, batch_format="pyarrow"))

    joined = relational.bucketed_hash_join(
        docs.select_columns(["doc_id", "text", "lang"]), chg,
        on="doc_id", how="outer")

    def apply_merge(df: pd.DataFrame) -> pa.Table:
        op = df["op"].astype(object)
        keep = op != "D"
        df = df[keep]
        is_new = df["op"].isin(["U", "I"]).to_numpy()
        text = np.where(is_new, df["new_text"].to_numpy(dtype=object),
                        df["text"].to_numpy(dtype=object))
        lang = np.where(is_new, df["new_lang"].to_numpy(dtype=object),
                        df["lang"].to_numpy(dtype=object))
        lens = np.fromiter((len(s) for s in text), np.int64, len(df))
        g = pd.DataFrame({"lang": lang, "n": 1, "chars": lens}) \
            .groupby("lang", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return joined.map_batches(apply_merge, batch_format="pandas") \
        .groupby("lang") \
        .aggregate(Sum("n", alias_name="n_docs"),
                   Sum("chars", alias_name="total_chars"))


SQL_MERGE_UPSERT = """
WITH chg AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         text || ' v2' AS new_text, lang AS new_lang
  FROM documents WHERE doc_id % 5 = 0 OR doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + (SELECT COUNT(*) FROM documents) AS doc_id,
         'I' AS op, 'fresh doc' AS new_text, 'en' AS new_lang
  FROM documents WHERE doc_id < 50),
m AS (
  SELECT COALESCE(c.doc_id, d.doc_id) AS doc_id,
         CASE WHEN c.op IN ('U', 'I') THEN c.new_text
              ELSE d.text END AS text,
         CASE WHEN c.op IN ('U', 'I') THEN c.new_lang
              ELSE d.lang END AS lang
  FROM documents d FULL OUTER JOIN chg c ON c.doc_id = d.doc_id
  WHERE c.op IS NULL OR c.op <> 'D')
SELECT lang, COUNT(*) AS n_docs, SUM(length(text)) AS total_chars
FROM m GROUP BY lang
"""


def q_harmonized_union_counts(sf_dir: str):
    """Schema-evolution union: a legacy catalog arrives as
    (id, body, language-UPPERCASED); harmonize the column names and
    normalize the lang casing, union with the modern corpus, count per
    lang.  The mapping is the operator — mismatched schemas are the
    default state of multi-source corpus builds."""
    from ray.data.aggregate import Sum
    modern = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    legacy_src = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def to_legacy(t: pa.Table) -> pa.Table:
        # deterministic legacy shard: every 4th doc re-keyed + uppercased
        keep = pc.equal(pc.bit_wise_and(t["doc_id"], 3), 0)
        t = t.filter(keep)
        return pa.table({"id": pc.add(t["doc_id"], 1_000_000),
                         "body": t["text"],
                         "language": pc.utf8_upper(t["lang"])})

    def harmonize(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["id"], "text": t["body"],
                         "lang": pc.utf8_lower(t["language"])})

    legacy = legacy_src.map_batches(to_legacy, batch_format="pyarrow") \
        .map_batches(harmonize, batch_format="pyarrow")
    unioned = modern.union(legacy)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t["lang"]}).group_by("lang") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    return unioned.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("n", alias_name="n_docs"))


SQL_HARMONIZED_UNION = """
WITH u AS (
  SELECT doc_id, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, lower(upper(lang)) AS lang
  FROM documents WHERE doc_id % 4 = 0)
SELECT lang, COUNT(*) AS n_docs FROM u GROUP BY lang
"""


def q_minmax_scale_acctbal(sf_dir: str):
    """Per-nation min-max feature scaling: one (min, max) stats shuffle
    → dimension-sized scale map broadcast → pure per-row map.  Constant
    groups scale to 0 like the SQL twin's NULLIF guard avoids /0."""
    from ray.data.aggregate import Max, Min
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    mm = cust.groupby("c_nationkey") \
        .aggregate(Min("c_acctbal", alias_name="lo"),
                   Max("c_acctbal", alias_name="hi")).to_pandas() \
        .set_index("c_nationkey")
    lo = mm["lo"].to_dict()
    hi = mm["hi"].to_dict()

    def f(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        lo_a = np.array([lo[k] for k in nk])
        hi_a = np.array([hi[k] for k in nk])
        span = hi_a - lo_a
        scaled = np.where(span > 0, (v - lo_a) / np.where(span > 0, span,
                                                          1.0), 0.0)
        return pa.table({"c_custkey": t["c_custkey"],
                         "scaled": pa.array(np.round(scaled, 6),
                                            type=pa.float64())})

    return cust.map_batches(f, batch_format="pyarrow")


SQL_MINMAX_SCALE = """
SELECT c_custkey,
       ROUND(COALESCE((c_acctbal - MIN(c_acctbal) OVER w)
             / NULLIF(MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w, 0),
             0), 6) AS scaled
FROM customer WINDOW w AS (PARTITION BY c_nationkey)
"""


def q_dup_cluster_size_histogram(sf_dir: str):
    """Dedup reporting: histogram of exact-duplicate cluster sizes
    (how much of the corpus is 1x, 2x, ...).  Two partial-combined
    count shuffles over u64 content hashes — text never shuffles."""
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents", ["text"])

    def h1(t: pa.Table) -> pa.Table:
        hs = dd._stable_u64(t["text"].to_pylist())
        g, c = np.unique(hs, return_counts=True)
        return pa.table({"h": pa.array(g, type=pa.uint64()),
                         "c": pa.array(c.astype(np.int64)),
                         "_b": pa.array((g % np.uint64(64))
                                        .astype(np.int32))})

    def h2(df: pd.DataFrame) -> pa.Table:
        s = df.groupby("h", sort=False)["c"].sum()
        g, c = np.unique(s.to_numpy(dtype=np.int64), return_counts=True)
        return pa.table({"cluster_size": pa.array(g),
                         "pn": pa.array(c.astype(np.int64))})

    return docs.map_batches(h1, batch_format="pyarrow") \
        .groupby("_b").map_groups(h2, batch_format="pandas") \
        .groupby("cluster_size").aggregate(Sum("pn",
                                               alias_name="n_clusters"))


SQL_DUP_HISTOGRAM = """
SELECT cnt AS cluster_size, COUNT(*) AS n_clusters
FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY text)
GROUP BY cnt
"""


def q_chi2_event_cohort(sf_dir: str):
    """Chi-squared independence test: event_type x cohort contingency
    table from one partial-combined count shuffle; the cells-sized
    driver finish computes observed-vs-expected exactly as the SQL
    twin (absent zero cells are skipped identically on both sides)."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "cohort": (t["user_id"].to_numpy(zero_copy_only=False) % 2)
            .astype(np.int64)})
        g = df.groupby(["event_type", "cohort"], sort=False).size() \
            .rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    c = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "cohort"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    grand = c["n"].sum()
    rt = c.groupby("event_type")["n"].transform("sum").to_numpy()
    ct = c.groupby("cohort")["n"].transform("sum").to_numpy()
    o = c["n"].to_numpy(dtype=np.float64)
    e = rt * ct * 1.0 / grand
    chi2 = float(((o - e) * (o - e) / e).sum())
    dof = (c["event_type"].nunique() - 1) * (c["cohort"].nunique() - 1)
    return pd.DataFrame([{"chi2": round(chi2, 4),
                          "dof": np.int64(dof)}])


SQL_CHI2 = """
WITH c AS (SELECT event_type, user_id % 2 AS cohort, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
t AS (SELECT SUM(n) AS g FROM c),
r AS (SELECT event_type, SUM(n) AS rt FROM c GROUP BY 1),
k AS (SELECT cohort, SUM(n) AS ct FROM c GROUP BY 1)
SELECT ROUND(SUM((c.n - rt * ct * 1.0 / g) * (c.n - rt * ct * 1.0 / g)
                 / (rt * ct * 1.0 / g)), 4) AS chi2,
       (SELECT COUNT(DISTINCT event_type) - 1 FROM c)
         * (SELECT COUNT(DISTINCT cohort) - 1 FROM c) AS dof
FROM c JOIN r USING (event_type) JOIN k USING (cohort) CROSS JOIN t
"""


SQL_AB_TEST = """
WITH e AS (
  SELECT event_type, user_id % 2 AS cohort,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events),
s AS (SELECT event_type, cohort, COUNT(*) AS n, SUM(cents) AS s1,
             SUM(cents * cents) AS s2
      FROM e GROUP BY 1, 2)
SELECT a.event_type, a.n AS n_a, b.n AS n_b,
       ROUND((a.s1 * 1.0 / a.n - b.s1 * 1.0 / b.n)
             / sqrt(CAST(a.n * a.s2 - a.s1 * a.s1 AS DOUBLE)
                    / (a.n * (a.n - 1.0)) / a.n
                    + CAST(b.n * b.s2 - b.s1 * b.s1 AS DOUBLE)
                    / (b.n * (b.n - 1.0)) / b.n), 4) AS t_stat
FROM s a JOIN s b ON a.event_type = b.event_type
WHERE a.cohort = 0 AND b.cohort = 1
ORDER BY a.event_type
"""


def q_jsonl_source_stats(sf_dir: str):
    """JSONL source/sink parity: documents round-trip through the
    line-delimited JSON interchange format (written once to /tmp,
    _DONE-marked), then aggregate per lang from the JSONL READ — the
    oracle aggregates the original parquet, so any reader/writer
    corruption breaks the hash."""
    import glob
    import hashlib
    import os
    import uuid

    from ray.data.aggregate import Sum

    from ..io import codecs
    # cache keyed by a CONTENT fingerprint of the input parquet (name +
    # size + mtime per file): regenerated-in-place fixtures get a fresh
    # cache dir instead of silently reusing a stale one, and the
    # write-to-unique-tmp + atomic rename makes concurrent runs safe
    # (ADVICE r3)
    h = hashlib.md5()
    for f in sorted(glob.glob(os.path.join(sf_dir, "documents*"))):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:"
                 f"{st.st_mtime_ns}".encode())
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/prclz_ray_jsonl_{tag}_{h.hexdigest()[:12]}"
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        codecs.write_jsonl(_read(sf_dir, "documents",
                                 ["doc_id", "text", "lang", "n_chars"]),
                           tmp)
        try:
            os.rename(tmp, out)
        except OSError:            # concurrent run won the rename race
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    docs = codecs.read_jsonl(out)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            "tlen": pc.utf8_length(t["text"])
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("lang", sort=False).agg(
            n_docs=("lang", "size"), sum_chars=("n_chars", "sum"),
            sum_text_len=("tlen", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang") \
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"),
                   Sum("sum_text_len", alias_name="sum_text_len"))


SQL_JSONL_STATS = """
SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars,
       SUM(length(text)) AS sum_text_len
FROM documents GROUP BY lang
"""


def _doc_logreg_scored(sf_dir: str):
    """Shared logreg-scored document Dataset (6-dp sigmoid ``score`` +
    length-derived ``label``) behind the classifier-evaluation family
    (AUC, ROC operating points, Brier decomposition): one feature
    extraction + scoring definition so every metric evaluates the SAME
    model, and the 6-dp quantization keeps downstream score groupbys
    bounded AND the SQL twins bit-mirrorable."""
    from ..stages import ml
    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def feats(batch: pa.Table) -> pa.Table:
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        x1 = nch.astype(np.float64) / 1000.0
        x2 = pc.list_value_length(
            pc.split_pattern(batch["text"], pattern=" ")) \
            .to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
        lbl = (nch > 297).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "x1": pa.array(x1), "x2": pa.array(x2),
                         "label": pa.array(lbl)})

    return ml.logreg_score(docs.map_batches(feats,
                                            batch_format="pyarrow"),
                           ["x1", "x2"], weights=[0.8, -0.5], bias=0.25)


def q_auc_doc_score(sf_dir: str):
    """Exact distributed ROC AUC (Mann-Whitney U, tie-corrected) of the
    logreg document scorer against a length-derived label: per-batch
    (score, pos, neg) partials, one bounded groupby (6-dp sigmoid
    scores quantize to <=1e6 distinct values), single vectorized sweep.
    Per-score contributions are half-integers — exact in float64 — so
    the oracle's window-function twin rounds identically."""
    from ..stages import ml
    return ml.distributed_auc(_doc_logreg_scored(sf_dir), "score",
                              "label")


SQL_AUC = """
WITH f AS (
  SELECT n_chars / 1000.0 AS x1,
         len(string_split(text, ' ')) / 100.0 AS x2,
         CASE WHEN n_chars > 297 THEN 1 ELSE 0 END AS label
  FROM documents),
s AS (SELECT ROUND(1.0 / (1.0 + exp(-(0.25 + 0.8 * x1 - 0.5 * x2))), 6)
        AS score, label FROM f),
g AS (SELECT score, SUM(label) AS np, SUM(1 - label) AS nn
      FROM s GROUP BY score),
o AS (SELECT score, np, nn,
             COALESCE(SUM(nn) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cneg
      FROM g)
SELECT ROUND(SUM(np * (cneg + nn / 2.0))
             / ((SELECT SUM(np) FROM g) * (SELECT SUM(nn) FROM g)), 6)
         AS auc
FROM o
"""


def q_embedding_mean_by_label(sf_dir: str):
    """Per-class embedding centroid (nearest-class-mean front): one
    streaming pass of per-batch (label, sum-vector, count) partials —
    the driver combine sees labels x batches small matrices, never
    rows.  Output long-form (label, dim, mean_val) so the oracle is a
    plain AVG per (label, element)."""
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        from ..stages.similarity import _as_matrix
        m = _as_matrix(t["embedding"]).astype(np.float64)
        lab = t["label"].to_numpy(zero_copy_only=False)
        labs, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(labs), m.shape[1]))
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv)
        k, d = sums.shape
        return pa.table({
            "label": pa.array(np.repeat(labs.astype(np.int64), d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1), k)),
            "s": pa.array(sums.reshape(-1), type=pa.float64()),
            "c": pa.array(np.repeat(cnt.astype(np.int64), d))})

    def combine(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["label", "dim"], sort=False) \
            .agg(s=("s", "sum"), c=("c", "sum")).reset_index()
        return pa.table({
            "label": pa.array(g["label"].to_numpy(dtype=np.int64)),
            "dim": pa.array(g["dim"].to_numpy(dtype=np.int64)),
            "mean_val": pa.array(
                np.round(g["s"].to_numpy() / g["c"].to_numpy(), 6),
                type=pa.float64())})

    return emb.map_batches(partial, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(lambda t: combine(t.to_pandas()),
                     batch_format="pyarrow", batch_size=None)


SQL_EMB_MEAN = """
SELECT label, CAST(i AS BIGINT) AS dim,
       ROUND(AVG(CAST(embedding[CAST(i AS INT)] AS DOUBLE)), 6)
         AS mean_val
FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) t
GROUP BY 1, 2
"""


def q_acctbal_outliers(sf_dir: str):
    """IQR outlier detection per nation (Tukey fence): exact grouped
    quartiles via the two-pass histogram selector, fences broadcast as
    a dimension-sized map, pure per-row filter.  Fence multiplier 0.4:
    the synthetic acctbal is uniform, where the classic 1.5x fence
    provably catches nothing (q1 - 1.5*IQR < min) — 0.4 pins the real
    tail rows so the oracle checks actual selections."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    qdf = relational.grouped_quantile_disc(
        cust.select_columns(["c_nationkey", "c_acctbal"]),
        key_col="c_nationkey", val_col="c_acctbal", qs=[0.25, 0.75])
    qdf = qdf.set_index("c_nationkey")
    iqr = qdf["p75"] - qdf["p25"]
    lo = (qdf["p25"] - 0.4 * iqr).to_dict()
    hi = (qdf["p75"] + 0.4 * iqr).to_dict()

    def f(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        lo_a = np.array([lo[k] for k in nk])
        hi_a = np.array([hi[k] for k in nk])
        keep = (v < lo_a) | (v > hi_a)
        return pa.table({
            "c_custkey": t["c_custkey"].filter(pa.array(keep)),
            "c_nationkey": t["c_nationkey"].filter(pa.array(keep)),
            "c_acctbal": t["c_acctbal"].filter(pa.array(keep))})

    return cust.map_batches(f, batch_format="pyarrow")


SQL_ACCTBAL_OUTLIERS = """
WITH q AS (
  SELECT c_nationkey,
         PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY c_acctbal) AS q1,
         PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY c_acctbal) AS q3
  FROM customer GROUP BY c_nationkey)
SELECT c_custkey, c.c_nationkey, c_acctbal
FROM customer c JOIN q ON c.c_nationkey = q.c_nationkey
WHERE c_acctbal < q1 - 0.4 * (q3 - q1)
   OR c_acctbal > q3 + 0.4 * (q3 - q1)
"""


def q_monthly_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth: the calendar rollup's cents
    series (distributed partials) finished with a driver-side LAG over
    the months-sized result — the standard reporting composition."""
    monthly = q_monthly_order_stats(sf_dir)
    df = relational.ds_to_table(monthly).to_pandas() \
        .sort_values("month").reset_index(drop=True)
    prev = df["revenue"].shift(1)
    growth = np.round((df["revenue"] - prev) / prev, 4)
    out = df.assign(growth=growth).dropna(subset=["growth"])
    return out[["month", "revenue", "growth"]]


SQL_MONTHLY_GROWTH = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               / 100.0, 2) AS revenue
  FROM orders GROUP BY month)
SELECT month, revenue,
       ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
             / LAG(revenue) OVER (ORDER BY month), 4) AS growth
FROM m QUALIFY growth IS NOT NULL
"""


def q_longest_daily_streak(sf_dir: str):
    """Gaps-and-islands: each user's longest run of consecutive active
    days (the engagement-streak window no plain groupby expresses)."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return relational.longest_consecutive_run(ev, key_col="user_id",
                                              ts_col="ts")


SQL_DAILY_STREAK = """
WITH d AS (SELECT DISTINCT user_id,
                  date_diff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS day
           FROM events),
i AS (SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY day) AS island
      FROM d),
runs AS (SELECT user_id, island, COUNT(*) AS len
         FROM i GROUP BY user_id, island)
SELECT user_id, MAX(len) AS longest_streak FROM runs GROUP BY user_id
"""


def q_jaccard_dup_clusters(sf_dir: str):
    """Near-dup clusters from the EXACT Jaccard >= 0.8 join: the
    recall-complete pair set feeds the shared components kernel — the
    deterministic alternative to MinHash clustering when misses are
    unacceptable."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(32)
    pairs = dd.allpairs_jaccard(docs, key_col="doc_id", text_col="text",
                                jaccard_threshold=0.8, shingle_k=5)
    return dd.connected_components(pairs)


SQL_JACCARD_CLUSTERS = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
        FROM documents)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS ni
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT i.a, i.b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a
  JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.8),
sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
reach(node, anc) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.anc)
SELECT node, MIN(lbl) AS label FROM (
  SELECT node, node AS lbl
  FROM (SELECT a AS node FROM edges UNION SELECT b AS node FROM edges)
  UNION ALL
  SELECT node, anc AS lbl FROM reach)
GROUP BY node
"""


def q_weighted_sample_docs(sf_dir: str):
    """Weighted sampling without replacement (A-ES exponential keys):
    100 docs weighted by n_chars — longer docs proportionally likelier,
    fully deterministic (golden-hash uniforms, no RNG state)."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = relational.weighted_sample(docs, key_col="doc_id",
                                     weight_col="n_chars", n=100)
    return out.to_pandas() if hasattr(out, "to_pandas") else out


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
          % 18446744073709551616) AS hv
  FROM documents)
ORDER BY ln((CAST(hv AS DOUBLE) + 1) / 18446744073709551616.0)
         / n_chars DESC, doc_id
LIMIT 100
"""


_PROJ_SEED_MATRIX = np.random.default_rng(42).standard_normal((64, 4))


def q_embedding_projection(sf_dir: str):
    """Johnson-Lindenstrauss random projection: 64-dim embeddings onto 4
    fixed Gaussian directions (seeded once at module load; the SQL twin
    embeds the identical float64 literals).  Pure per-batch matmul — the
    dimensionality-reduction front of every embedding pipeline."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    proj = _PROJ_SEED_MATRIX

    def f(t: pa.Table) -> pa.Table:
        from ..stages.similarity import _as_matrix
        m = _as_matrix(t["embedding"]).astype(np.float64)
        p = np.round(m @ proj, 6)
        cols = {"vec_id": t["vec_id"]}
        for j in range(proj.shape[1]):
            cols[f"p{j}"] = pa.array(p[:, j], type=pa.float64())
        return pa.table(cols)

    return emb.map_batches(f, batch_format="pyarrow")


def _sql_embedding_projection() -> str:
    cols = ", ".join(
        "ROUND(" + " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * "
            f"{float(_PROJ_SEED_MATRIX[i, j])!r}"
            for i in range(64)) + f", 6) AS p{j}"
        for j in range(4))
    return f"SELECT vec_id, {cols} FROM embeddings"


SQL_EMB_PROJECTION = _sql_embedding_projection()


def q_degree_histogram_links(sf_dir: str):
    """In-degree distribution of the synthetic link graph (same edge
    derivation as pagerank_links): two partial-combined groupbys —
    count per dst, then node-count per degree.  Zero-in-degree nodes
    are absent on both sides by construction."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        # partial combine: per-batch dst counts before the shuffle
        g, c = np.unique(dst, return_counts=True)
        return pa.table({"dst": pa.array(g),
                         "c": pa.array(c.astype(np.int64)),
                         "_b": pa.array((g % 64).astype(np.int32))})

    def deg_per_dst(df: pd.DataFrame) -> pa.Table:
        s = df.groupby("dst", sort=False)["c"].sum()
        g, c = np.unique(s.to_numpy(dtype=np.int64), return_counts=True)
        return pa.table({"deg": pa.array(g),
                         "nc": pa.array(c.astype(np.int64)),
                         "_b2": pa.array((g % 16).astype(np.int32))})

    def hist(df: pd.DataFrame) -> pa.Table:
        s = df.groupby("deg", sort=False)["nc"].sum()
        return pa.table({"deg": pa.array(s.index.to_numpy(dtype=np.int64)),
                         "n_nodes": pa.array(s.to_numpy(dtype=np.int64))})

    return docs.map_batches(edges, batch_format="pyarrow") \
        .groupby("_b").map_groups(deg_per_dst, batch_format="pandas") \
        .groupby("_b2").map_groups(hist, batch_format="pandas")


SQL_DEGREE_HIST = """
WITH nn AS (SELECT COUNT(*) AS cnt FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 7919 + k * 104729) % cnt AS dst
  FROM documents, nn, (SELECT unnest([1, 2, 3]) AS k) t),
indeg AS (SELECT dst, COUNT(*) AS deg FROM e GROUP BY dst)
SELECT deg, COUNT(*) AS n_nodes FROM indeg GROUP BY deg
"""


def q_monthly_order_stats(sf_dir: str):
    """Calendar aggregation: per-month order count + revenue (cents
    partial-summed per batch, ONE tiny month-keyed final combine)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice",
                                      "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]")
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        df = pd.DataFrame({"m": d, "cents": cents})
        g = df.groupby("m", sort=False)["cents"].agg(["count", "sum"])
        return pa.table({
            "month": pa.array(g.index.to_numpy().astype("datetime64[us]")),
            "n_orders": pa.array(g["count"].to_numpy(dtype=np.int64)),
            "cents": pa.array(g["sum"].to_numpy(dtype=np.int64))})

    def combine(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("month", sort=False).agg(
            n_orders=("n_orders", "sum"), cents=("cents", "sum"))
        return pa.table({
            "month": pa.array(g.index.to_numpy().astype("datetime64[us]")),
            "n_orders": pa.array(g["n_orders"].to_numpy(dtype=np.int64)),
            "revenue": pa.array(
                np.round(g["cents"].to_numpy(dtype=np.int64) / 100.0, 2),
                type=pa.float64())})

    return orders.map_batches(partial, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(lambda t: combine(t.to_pandas()),
                     batch_format="pyarrow", batch_size=None)


SQL_MONTHLY_ORDERS = """
SELECT date_trunc('month', o_orderdate) AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM orders GROUP BY month
"""


def q_user_event_paths(sf_dir: str):
    """Clickstream path analysis: every user's full ordered event-type
    sequence as one path string (the ordered-STRING_AGG shape; also how
    anchor texts aggregate per target URL in a web graph)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    return relational.grouped_ordered_concat(
        ev, key_col="user_id", order_cols=["ts", "event_id"],
        val_col="event_type", sep=">", out_col="path")


SQL_EVENT_PATHS = """
SELECT user_id,
       STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def q_jaccard_threshold_pairs(sf_dir: str):
    """EXACT Jaccard >= 0.8 self-join over documents via AllPairs prefix
    filtering — recall-complete (every true pair is a candidate, unlike
    MinHash banding), verified by the candidate-restricted jaccard
    verifier.  The oracle is the exhaustive shingle self-join."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(32)
    return dd.allpairs_jaccard(docs, key_col="doc_id", text_col="text",
                               jaccard_threshold=0.8, shingle_k=5)


SQL_JACCARD_PAIRS = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
        FROM documents)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS ni
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2)
SELECT i.a, i.b FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.8
"""


def q_pareto_orders(sf_dir: str):
    """Skyline / Pareto frontier: orders not dominated on
    (o_totalprice max, o_orderdate min).  The per-batch prune is a
    combiner — each block collapses to its own frontier before the
    single-task final prune, so the shuffle moves frontier-sized data
    only."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderdate"])
    return relational.skyline(orders, max_col="o_totalprice",
                              min_col="o_orderdate",
                              keep_cols=["o_orderkey", "o_totalprice",
                                         "o_orderdate"])


SQL_PARETO = """
SELECT o_orderkey, o_totalprice, o_orderdate FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders x
  WHERE x.o_totalprice >= o.o_totalprice
    AND x.o_orderdate <= o.o_orderdate
    AND (x.o_totalprice > o.o_totalprice
         OR x.o_orderdate < o.o_orderdate))
"""


SQL_FUZZY_BASE = """
WITH RECURSIVE clean AS (
  SELECT p_partkey AS id,
         p_name || ' #' || lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS nm
  FROM part),
hv AS (
  SELECT id, nm,
         ((CAST(id + 1 AS HUGEINT) * 11400714819323198485)
          % 18446744073709551616) AS h
  FROM clean),
dirty AS (
  SELECT id + 1000000 AS id,
         CASE WHEN h % 3 = 0 THEN
                substr(nm, 1, CAST((h // 3) % length(nm) AS INT))
                || substr(nm, CAST((h // 3) % length(nm) AS INT) + 2)
              WHEN h % 3 = 1 THEN
                substr(nm, 1, CAST((h // 3) % length(nm) AS INT))
                || 'q' || substr(nm, CAST((h // 3) % length(nm) AS INT) + 2)
              ELSE nm END AS nm
  FROM hv),
pairs AS (
  SELECT c.id AS a, d.id AS b,
         CAST(levenshtein(c.nm, d.nm) AS BIGINT) AS dist
  FROM clean c JOIN dirty d
    ON (substr(c.nm, 1, 6) = substr(d.nm, 1, 6)
        OR substr(c.nm, length(c.nm) - 5) = substr(d.nm, length(d.nm) - 5))
  WHERE levenshtein(c.nm, d.nm) <= 1)
"""

SQL_FUZZY_PAIRS = SQL_FUZZY_BASE + "SELECT a, b, dist FROM pairs"

SQL_FUZZY_CLUSTERS = SQL_FUZZY_BASE + """,
sym AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
reach(node, anc) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.anc)
SELECT node, MIN(lbl) AS label FROM (
  SELECT node, node AS lbl
  FROM (SELECT a AS node FROM pairs UNION SELECT b AS node FROM pairs)
  UNION ALL
  SELECT node, anc AS lbl FROM reach)
GROUP BY node
"""


def _link_graph(sf_dir: str):
    """The deterministic synthetic link graph every graph query shares:
    doc → (doc*7919 + k*104729) % N for k = 1..3."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    nodes = docs.map_batches(
        lambda b: pa.table({"v": b["doc_id"]}), batch_format="pyarrow")
    return docs.map_batches(edges, batch_format="pyarrow"), nodes


def q_hits_links(sf_dir: str):
    """HITS hubs/authorities (2 rounds, max-normalized, 9dp rounding)
    over the shared synthetic link graph.  Max normalization keeps the
    float trajectory partition-order-independent so the unrolled-CTE
    oracle matches at the compare grain."""
    from ..stages import graph_ops
    edges, nodes = _link_graph(sf_dir)
    out = graph_ops.hits(edges, nodes, iters=2, round_dp=9)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "hub": b["hub"],
                            "authority": b["authority"]}),
        batch_format="pyarrow")


SQL_HITS = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS v FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d CROSS JOIN (VALUES (1), (2), (3)) k(k)
  CROSS JOIN nn),
a1r AS (SELECT n.v, CAST(COUNT(e.src) AS DOUBLE) AS c
        FROM nodes n LEFT JOIN edges e ON e.dst = n.v GROUP BY n.v),
a1 AS (SELECT v, ROUND(c / COALESCE(NULLIF(
          (SELECT MAX(c) FROM a1r), 0), 1), 9) AS s FROM a1r),
h1r AS (SELECT n.v, COALESCE(SUM(a1.s), 0) AS c
        FROM nodes n LEFT JOIN edges e ON e.src = n.v
        LEFT JOIN a1 ON a1.v = e.dst GROUP BY n.v),
h1 AS (SELECT v, ROUND(c / COALESCE(NULLIF(
          (SELECT MAX(c) FROM h1r), 0), 1), 9) AS s FROM h1r),
a2r AS (SELECT n.v, COALESCE(SUM(h1.s), 0) AS c
        FROM nodes n LEFT JOIN edges e ON e.dst = n.v
        LEFT JOIN h1 ON h1.v = e.src GROUP BY n.v),
a2 AS (SELECT v, ROUND(c / COALESCE(NULLIF(
          (SELECT MAX(c) FROM a2r), 0), 1), 9) AS s FROM a2r),
h2r AS (SELECT n.v, COALESCE(SUM(a2.s), 0) AS c
        FROM nodes n LEFT JOIN edges e ON e.src = n.v
        LEFT JOIN a2 ON a2.v = e.dst GROUP BY n.v),
h2 AS (SELECT v, ROUND(c / COALESCE(NULLIF(
          (SELECT MAX(c) FROM h2r), 0), 1), 9) AS s FROM h2r)
SELECT n.v AS doc_id, h2.s AS hub, a2.s AS authority
FROM nodes n JOIN h2 ON h2.v = n.v JOIN a2 ON a2.v = n.v
"""


def q_label_propagation_links(sf_dir: str):
    """Deterministic synchronous label propagation (2 rounds: most
    frequent neighbor label, count ties → min label) over the shared
    link graph.  All-int state — the unrolled SQL twin is exact at any
    partitioning."""
    from ..stages import graph_ops
    edges, nodes = _link_graph(sf_dir)
    out = graph_ops.label_propagation(edges, nodes, iters=2)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "label": b["label"]}),
        batch_format="pyarrow")


SQL_LABEL_PROP = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS v FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d CROSS JOIN (VALUES (1), (2), (3)) k(k)
  CROSS JOIN nn),
sym AS (SELECT src AS node, dst AS nbr FROM edges WHERE src <> dst
        UNION ALL
        SELECT dst AS node, src AS nbr FROM edges WHERE src <> dst),
l0 AS (SELECT v, v AS lbl FROM nodes),
c1 AS (SELECT s.node, l.lbl, COUNT(*) AS cnt
       FROM sym s JOIN l0 l ON l.v = s.nbr GROUP BY s.node, l.lbl),
m1 AS (SELECT node, lbl FROM (
         SELECT node, lbl, ROW_NUMBER() OVER (
           PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
         FROM c1) WHERE rn = 1),
l1 AS (SELECT n.v, COALESCE(m1.lbl, n.v) AS lbl
       FROM nodes n LEFT JOIN m1 ON m1.node = n.v),
c2 AS (SELECT s.node, l.lbl, COUNT(*) AS cnt
       FROM sym s JOIN l1 l ON l.v = s.nbr GROUP BY s.node, l.lbl),
m2 AS (SELECT node, lbl FROM (
         SELECT node, lbl, ROW_NUMBER() OVER (
           PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
         FROM c2) WHERE rn = 1),
l2 AS (SELECT n.v, COALESCE(m2.lbl, n.v) AS lbl
       FROM nodes n LEFT JOIN m2 ON m2.node = n.v)
SELECT v AS doc_id, lbl AS label FROM l2
"""


def q_debounce_events(sf_dir: str):
    """Stream-hygiene debounce: drop an event arriving < 60 s after the
    previous event of the same (user, type) — the classic dup-fire /
    double-click filter.  One composite-key LAG pass (the existing
    bucketed ``grouped_lag``), then a pure filter; output is the kept
    event stream."""
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t["user_id"], pa.string()), t["event_type"], "|")
        return t.append_column("_k", k)

    lagged = relational.grouped_lag(
        ev.map_batches(keyed, batch_format="pyarrow"), key_col="_k",
        ts_col="ts", order_col="event_id", lag_cols=["event_id"],
        carry_cols=["user_id", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        gap = t["gap_us"]
        mask = pc.or_kleene(pc.is_null(gap),
                            pc.greater_equal(gap, pa.scalar(60_000_000)))
        t = t.filter(pc.fill_null(mask, False))
        return t.select(["event_id", "user_id", "event_type", "ts"])

    return lagged.map_batches(keep, batch_format="pyarrow")


SQL_DEBOUNCE = """
SELECT event_id, user_id, event_type, ts FROM (
  SELECT event_id, user_id, event_type, ts,
         date_diff('microsecond',
                   LAG(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id), ts) AS gap_us
  FROM events)
WHERE gap_us IS NULL OR gap_us >= 60000000
"""


def q_trending_events_hourly(sf_dir: str):
    """Trending dashboard: top-3 event types per hour by count (count
    ties → type ASC).  Per-batch (hour, type) partials → one tiny
    groupby — the shuffled payload is hours × types, never events —
    and the rank finish runs on the driver-sized count table."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        hr = pc.floor_temporal(t["ts"], unit="hour")
        g = pa.table({"hour": hr, "event_type": t["event_type"]}) \
            .group_by(["hour", "event_type"]).aggregate(
                [("event_type", "count")])
        return pa.table({"hour": g["hour"],
                         "event_type": g["event_type"],
                         "pn": g["event_type_count"].cast(pa.int64())})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["hour", "event_type"]) \
        .aggregate(Sum("pn", alias_name="n")).to_pandas()
    agg = agg.sort_values(["hour", "n", "event_type"],
                          ascending=[True, False, True])
    agg["rnk"] = agg.groupby("hour").cumcount() + 1
    out = agg[agg["rnk"] <= 3].reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    out["rnk"] = out["rnk"].astype("int64")
    return out[["hour", "event_type", "n", "rnk"]]


SQL_TRENDING = """
SELECT hour, event_type, n, rnk FROM (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY COUNT(*) DESC, event_type) AS rnk
  FROM events GROUP BY 1, 2)
WHERE rnk <= 3
"""


def q_audience_overlap(sf_dir: str):
    """HLL sketch algebra: approximate per-event-type distinct users,
    pairwise unions (register-max merge) and inclusion-exclusion
    overlaps, from ONE streaming pass over events.  No SQL oracle by
    design (approximate); pytest pins the error bound against the exact
    overlap and partition-invariance."""
    from ..stages import sketches
    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return sketches.hll_overlap_matrix(ev, group_col="event_type",
                                       key_col="user_id")


def q_ccnet_ppl_filter(sf_dir: str):
    """CCNet head-selection: keep documents whose bigram-LM score (mean
    NLL, 4dp) is at or below their LANGUAGE's median — the per-lang
    perplexity quality gate CCNet runs before training-data export.
    Composition of three existing operators: corpus-trained LM scoring,
    one doc_id-bucketed lang attach (large×large), exact grouped
    discrete median, broadcast threshold filter."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    scores = text.bigram_lm_scores(
        docs.map_batches(lambda t: t.select(["doc_id", "text"]),
                         batch_format="pyarrow"),
        key_col="doc_id", text_col="text")
    langs = docs.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow")
    # pinned: consumed twice (median pass, then the filter) — narrow
    # (doc_id, nll, lang) rows, object-store-resident/spillable
    scored = relational.bucketed_hash_join(scores, langs,
                                           on="doc_id").materialize()

    med = relational.grouped_quantile_disc(
        scored.map_batches(lambda t: t.select(["lang", "nll"]),
                           batch_format="pyarrow"),
        key_col="lang", val_col="nll", qs=[0.5])
    thr = dict(zip(med["lang"], med["p50"]))
    tref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        th = relational.worker_cached(("ccnet_thr", tref),
                                      lambda: ray.get(tref))
        lv = np.array([th[x] for x in
                       t["lang"].to_pylist()])
        mask = t["nll"].to_numpy(zero_copy_only=False) <= lv
        return t.filter(pa.array(mask)) \
            .select(["doc_id", "lang", "nll"])

    return scored.map_batches(keep, batch_format="pyarrow")


SQL_CCNET_FILTER = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents),
big AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM toks WHERE len(w) >= 2)),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
cc AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY w1),
nv AS (SELECT COUNT(DISTINCT x) AS v
       FROM (SELECT unnest(w) AS x FROM toks)),
sc AS (
  SELECT b.doc_id,
         ROUND(-AVG(LN((bc.c12 + 1.0) / (cc.c1 + nv.v))), 4) AS nll
  FROM big b
  JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
  JOIN cc ON cc.w1 = b.w1
  CROSS JOIN nv
  GROUP BY b.doc_id),
scored AS (
  SELECT d.doc_id, d.lang, COALESCE(sc.nll, 0.0) AS nll
  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
med AS (SELECT lang, quantile_disc(nll, 0.5) AS m
        FROM scored GROUP BY lang)
SELECT s.doc_id, s.lang, s.nll
FROM scored s JOIN med USING (lang)
WHERE s.nll <= med.m
"""


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 (order-priority checking, adapted: the 'late' predicate
    is l_shipdate > o_orderdate — the synthetic lineitem has no
    commit/receipt dates): orders in 1996Q3 with at least one late
    line, counted per priority.  Shape: ONE bucketed orderkey join
    lineitem⋈(date-filtered orders); the EXISTS (distinct orderkey) and
    the priority partials fuse into the join's bucket tail — every line
    of an order lands in its bucket, so the final exchange is
    ≤ buckets × |priorities| rows."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    lo = np.datetime64("1996-07-01T00:00:00")
    hi = np.datetime64("1996-10-01T00:00:00")

    ords = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        .rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow")

    def comb(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], t["o_orderdate"]))
        d = t.select(["l_orderkey", "o_orderpriority"]) \
            .group_by(["l_orderkey", "o_orderpriority"]).aggregate([])
        g = d.group_by("o_orderpriority").aggregate(
            [("l_orderkey", "count")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "pn": g["l_orderkey_count"].cast(pa.int64())})

    j = relational.bucketed_hash_join(li, ords, on="l_orderkey",
                                      combine=comb)
    agg = relational.ds_to_table(j).to_pandas() \
        .groupby("o_orderpriority", as_index=False)["pn"].sum() \
        .rename(columns={"pn": "order_count"})
    return agg.sort_values("o_orderpriority").reset_index(drop=True)


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q9_product_profit(sf_dir: str):
    """TPC-H Q9 (product-type profit, adapted: the synthetic schema has
    no partsupp, so supply cost is the PURE FUNCTION
    cost_cents(p, s) = (p*31 + s*17) % 90000 + 10000 — identical
    arithmetic in the SQL twin, no join needed for the cost side):
    profit per (supplier nation, order year) over 'red' parts.  Shape:
    selective part-name filter broadcast → per-batch profit cents →
    ONE bucketed orderkey join with the supplier-nation attach + the
    (nation, year) partial fused into the bucket tail."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    pt = _read_table(sf_dir, "part", ["p_partkey", "p_name"])
    keys = pa.array(sorted(
        pt.filter(pc.match_substring(pt["p_name"], "red"))
        ["p_partkey"].to_pylist()), type=pa.int64())

    nt = _read_table(sf_dir, "nation",
                     ["n_nationkey", "n_name"]).to_pandas()
    supp_pd = _read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]).to_pandas() \
        .merge(nt, left_on="s_nationkey", right_on="n_nationkey")
    sref = ray.put(supp_pd.set_index("s_suppkey")["n_name"])

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"].cast(pa.int64()),
                              value_set=keys))
        p = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0)), ndigits=0,
            round_mode="half_towards_infinity"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cost = (p * 31 + s * 17) % 90000 + 10000
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "s_suppkey": pa.array(s),
                         "pc_": pa.array(rc - cost * q)})

    def ord_prep(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pa.array(year)})

    def comb(t: pa.Table) -> pa.Table:
        smap = relational.worker_cached(("q9_supp", sref),
                                        lambda: ray.get(sref))
        nat = smap.reindex(t["s_suppkey"].to_numpy(
            zero_copy_only=False)).to_numpy(dtype=object)
        g = pa.table({"nation": pa.array(nat, type=pa.string()),
                      "o_year": t["o_year"], "pc_": t["pc_"]}) \
            .group_by(["nation", "o_year"]).aggregate([("pc_", "sum")])
        return pa.table({"nation": g["nation"], "o_year": g["o_year"],
                         "ppc": g["pc__sum"].cast(pa.int64())})

    j = relational.bucketed_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        on="o_orderkey", combine=comb)
    agg = relational.ds_to_table(j).to_pandas() \
        .groupby(["nation", "o_year"], as_index=False)["ppc"].sum()
    agg["sum_profit"] = np.round(agg["ppc"] / 100.0, 2)
    agg["o_year"] = agg["o_year"].astype("int64")
    agg = agg.sort_values(["nation", "o_year"],
                          ascending=[True, False]).reset_index(drop=True)
    return agg[["nation", "o_year", "sum_profit"]]


SQL_Q9 = """
WITH lp AS (
  SELECT l_orderkey, l_suppkey,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         - ((l_partkey * 31 + l_suppkey * 17) % 90000 + 10000)
           * CAST(l_quantity AS BIGINT) AS pc
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'),
j AS (SELECT lp.l_suppkey, lp.pc,
             EXTRACT(year FROM o_orderdate) AS o_year
      FROM lp JOIN orders ON o_orderkey = l_orderkey)
SELECT n_name AS nation, CAST(o_year AS BIGINT) AS o_year,
       ROUND(SUM(pc) / 100.0, 2) AS sum_profit
FROM j JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def _derive_partsupp(pt: pa.Table, n_supp: int) -> pa.Table:
    """The shared synthetic partsupp convention (the synth schema has
    none): 2 suppliers per part, suppkey/cost/availqty all pure
    functions of (p_partkey, k) — reproduced verbatim as a CTE in the
    SQL twins."""
    p = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = np.repeat(p, 2)
    k = np.tile(np.array([1, 2], dtype=np.int64), len(p))
    return pa.table({
        "ps_partkey": pa.array(pk),
        "ps_suppkey": pa.array((pk * 7919 + k * 104729) % n_supp),
        "cost_c": pa.array((pk * 31 + k * 53) % 90000 + 10000),
        "avail": pa.array((pk * 7 + k * 13) % 1000 + 1)})


SQL_PARTSUPP_CTE = """
ns AS (SELECT COUNT(*) AS n FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7919 + k.k * 104729) % ns.n AS ps_suppkey,
         (p_partkey * 31 + k.k * 53) % 90000 + 10000 AS cost_c,
         (p_partkey * 7 + k.k * 13) % 1000 + 1 AS avail
  FROM part CROSS JOIN (VALUES (1), (2)) k(k) CROSS JOIN ns)
"""


def q11_important_stock(sf_dir: str):
    """TPC-H Q11 (important stock, adapted to the derived partsupp):
    per-part stock value (cost × availqty summed over the part's
    suppliers) restricted to NATION_7 suppliers, keeping parts whose
    value exceeds 0.01 % of the total.  Both suppliers of a part are
    DERIVED in the same batch row-pair, so the per-part sum needs NO
    shuffle at all — one streamed pass emits exact per-part values,
    a scalar total gates the driver-side filter."""
    part = _read(sf_dir, "part", ["p_partkey"])
    n_supp = _read_table(sf_dir, "supplier", ["s_suppkey"]).num_rows
    nt = _read_table(sf_dir, "nation",
                     ["n_nationkey", "n_name"]).to_pandas()
    nat7 = int(nt.loc[nt.n_name == "NATION_7", "n_nationkey"].iloc[0])
    supp_pd = _read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]).to_pandas()
    nref = ray.put(supp_pd.set_index("s_suppkey")["s_nationkey"]
                   .astype(np.int64))

    def values(t: pa.Table) -> pa.Table:
        ps = _derive_partsupp(t, n_supp)
        smap = relational.worker_cached(("q11_supp", nref),
                                        lambda: ray.get(nref))
        nat = smap.reindex(ps["ps_suppkey"].to_numpy(
            zero_copy_only=False)).to_numpy()
        keep = nat == nat7
        pk = ps["ps_partkey"].to_numpy(zero_copy_only=False)[keep]
        v = (ps["cost_c"].to_numpy(zero_copy_only=False)
             * ps["avail"].to_numpy(zero_copy_only=False))[keep]
        uniq, inv = np.unique(pk, return_inverse=True)
        return pa.table({"ps_partkey": pa.array(uniq),
                         "val_c": pa.array(np.bincount(
                             inv, weights=v).astype(np.int64))})

    vals = relational.ds_to_table(
        part.map_batches(values, batch_format="pyarrow")).to_pandas()
    tot = vals["val_c"].sum()
    out = vals[vals["val_c"] > tot * 0.0001].copy()
    out["value"] = np.round(out["val_c"] / 100.0, 2)
    out = out.sort_values(["value", "ps_partkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["ps_partkey", "value"]]


SQL_Q11 = f"""
WITH {SQL_PARTSUPP_CTE.strip()},
v AS (SELECT ps_partkey, SUM(cost_c * avail) AS val_c
      FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY ps_partkey),
t AS (SELECT SUM(val_c) AS tot FROM v)
SELECT ps_partkey, ROUND(val_c / 100.0, 2) AS value
FROM v, t WHERE val_c > tot * 0.0001
ORDER BY value DESC, ps_partkey
"""


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 (minimum-cost supplier, adapted to the derived
    partsupp): for SMALL-type parts of size ≤ 15, the cheapest of the
    part's suppliers whose nation sits in region EUROPE — ties on cost
    break by supplier key; top 100 by (cost, partkey).  The part's two
    candidate rows derive in-batch (no shuffle); supplier→nation→region
    is a broadcast dim chain."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type", "p_size"])
    n_supp = _read_table(sf_dir, "supplier", ["s_suppkey"]).num_rows
    rt = _read_table(sf_dir, "region",
                     ["r_regionkey", "r_name"]).to_pandas()
    europe = int(rt.loc[rt.r_name == "EUROPE", "r_regionkey"].iloc[0])
    nt = _read_table(sf_dir, "nation",
                     ["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    eu_nations = set(nt.loc[nt.n_regionkey == europe,
                            "n_nationkey"].tolist())
    supp_pd = _read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_name", "s_nationkey"]) \
        .to_pandas()
    sref = ray.put(supp_pd.set_index("s_suppkey")["s_nationkey"]
                   .astype(np.int64))

    def best(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t["p_type"], "SMALL"),
                             pc.less_equal(t["p_size"], 15)))
        if t.num_rows == 0:
            return pa.table({"ps_partkey": pa.array([], pa.int64()),
                             "ps_suppkey": pa.array([], pa.int64()),
                             "cost_c": pa.array([], pa.int64())})
        ps = _derive_partsupp(t, n_supp)
        smap = relational.worker_cached(("q2_supp", sref),
                                        lambda: ray.get(sref))
        nat = smap.reindex(ps["ps_suppkey"].to_numpy(
            zero_copy_only=False)).to_numpy()
        keep = np.isin(nat, list(eu_nations))
        df = pd.DataFrame({
            "ps_partkey": ps["ps_partkey"].to_numpy(
                zero_copy_only=False)[keep],
            "ps_suppkey": ps["ps_suppkey"].to_numpy(
                zero_copy_only=False)[keep],
            "cost_c": ps["cost_c"].to_numpy(
                zero_copy_only=False)[keep]})
        df = df.sort_values(["ps_partkey", "cost_c", "ps_suppkey"]) \
            .drop_duplicates("ps_partkey", keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = relational.ds_to_table(
        part.map_batches(best, batch_format="pyarrow")).to_pandas()
    out = cand.sort_values(["cost_c", "ps_partkey"]).head(100) \
        .merge(supp_pd[["s_suppkey", "s_name"]],
               left_on="ps_suppkey", right_on="s_suppkey")
    out["supplycost"] = np.round(out["cost_c"] / 100.0, 2)
    out = out.sort_values(["supplycost", "ps_partkey"]) \
        .reset_index(drop=True)
    return out[["ps_partkey", "s_name", "supplycost"]]


SQL_Q2 = f"""
WITH {SQL_PARTSUPP_CTE.strip()},
eu AS (SELECT n_nationkey FROM nation JOIN region
       ON region.r_regionkey = nation.n_regionkey
       WHERE r_name = 'EUROPE'),
cand AS (
  SELECT ps.ps_partkey, ps.ps_suppkey, ps.cost_c,
         ROW_NUMBER() OVER (PARTITION BY ps.ps_partkey
                            ORDER BY ps.cost_c, ps.ps_suppkey) AS rn
  FROM partsupp ps
  JOIN part ON p_partkey = ps.ps_partkey
  JOIN supplier ON s_suppkey = ps.ps_suppkey
  JOIN eu ON eu.n_nationkey = supplier.s_nationkey
  WHERE p_type = 'SMALL' AND p_size <= 15)
SELECT ps_partkey, s_name, ROUND(cost_c / 100.0, 2) AS supplycost
FROM (SELECT * FROM cand WHERE rn = 1
      ORDER BY cost_c, ps_partkey LIMIT 100)
JOIN supplier ON s_suppkey = ps_suppkey
ORDER BY supplycost, ps_partkey
"""


def q16_supplier_part_counts(sf_dir: str):
    """TPC-H Q16 (supplier counts per part attribute, adapted: the
    excluded-supplier predicate is s_acctbal < 0 — no comment column —
    over the derived partsupp): distinct suppliers per (brand, type,
    size) for small parts.  The (attrs × supplier) pair domain is
    bounded by the attribute cross-product, never by data volume, so
    per-batch distinct partials collapse driver-side."""
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"])
    supp_pd = _read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_acctbal"]).to_pandas()
    n_supp = len(supp_pd)
    excl = pa.array(sorted(
        supp_pd.loc[supp_pd.s_acctbal < 0, "s_suppkey"]
        .astype(np.int64)), type=pa.int64())

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["p_size"], 25))
        ps = _derive_partsupp(t, n_supp)
        attrs = t.select(["p_partkey", "p_brand", "p_type", "p_size"])
        j = ps.join(attrs.combine_chunks(), keys="ps_partkey",
                    right_keys="p_partkey", join_type="inner")
        j = j.filter(pc.invert(pc.is_in(j["ps_suppkey"],
                                        value_set=excl)))
        return j.select(["p_brand", "p_type", "p_size", "ps_suppkey"]) \
            .group_by(["p_brand", "p_type", "p_size", "ps_suppkey"]) \
            .aggregate([])

    pp = relational.ds_to_table(
        part.map_batches(pairs, batch_format="pyarrow")).to_pandas() \
        .drop_duplicates()
    out = pp.groupby(["p_brand", "p_type", "p_size"], as_index=False) \
        .agg(supplier_cnt=("ps_suppkey", "nunique"))
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)
    return out[["p_brand", "p_type", "p_size", "supplier_cnt"]]


SQL_Q16 = f"""
WITH {SQL_PARTSUPP_CTE.strip()}
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_size <= 25
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_inventory(sf_dir: str):
    """TPC-H Q20 (suppliers with excess inventory, adapted to the
    derived partsupp): NATION_3 suppliers holding, for some 'red'-named
    part, availqty > half the 1997-shipped quantity of that
    (part, supplier) pair.  Shape: selective part filter broadcast →
    shipped-pair partials + derived partsupp rows co-shuffle on ONE
    composite-key bucketed LEFT join whose bucket tail does the
    comparison and emits distinct suppkey partials."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    n_supp = _read_table(sf_dir, "supplier", ["s_suppkey"]).num_rows
    nt = _read_table(sf_dir, "nation",
                     ["n_nationkey", "n_name"]).to_pandas()
    nat3 = int(nt.loc[nt.n_name == "NATION_3", "n_nationkey"].iloc[0])
    supp_pd = _read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_name", "s_nationkey"]) \
        .to_pandas()
    pt = _read_table(sf_dir, "part", ["p_partkey", "p_name"])
    red = pa.array(sorted(
        pt.filter(pc.starts_with(pt["p_name"], "red"))
        ["p_partkey"].to_pylist()), type=pa.int64())
    lo = np.datetime64("1997-01-01T00:00:00")
    hi = np.datetime64("1998-01-01T00:00:00")

    def pk(p, s):
        return pc.binary_join_element_wise(
            pc.cast(p, pa.string()), pc.cast(s, pa.string()), "|")

    def shipped(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))))
        t = t.filter(pc.is_in(t["l_partkey"].cast(pa.int64()),
                              value_set=red))
        g = pa.table({"_pk": pk(t["l_partkey"], t["l_suppkey"]),
                      "q": t["l_quantity"].cast(pa.int64())}) \
            .group_by("_pk").aggregate([("q", "sum")])
        return pa.table({"_pk": g["_pk"],
                         "q": g["q_sum"].cast(pa.int64())})

    def ps_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["p_partkey"].cast(pa.int64()),
                              value_set=red))
        ps = _derive_partsupp(t, n_supp)
        return pa.table({"_pk": pk(ps["ps_partkey"], ps["ps_suppkey"]),
                         "ps_suppkey": ps["ps_suppkey"],
                         "avail": ps["avail"]})

    def comb(t: pa.Table) -> pa.Table:
        av = t["avail"].to_numpy(zero_copy_only=False)
        q = t["q"].to_numpy(zero_copy_only=False)
        q = np.where(np.isnan(q.astype(np.float64)), 0, q)
        keep = av > 0.5 * q
        sk = np.unique(t["ps_suppkey"].to_numpy(
            zero_copy_only=False)[keep])
        return pa.table({"ps_suppkey": pa.array(sk.astype(np.int64))})

    # shipped pairs may not cover every partsupp pair → LEFT from the
    # partsupp side with the comparison fused into the bucket tail
    j = relational.bucketed_hash_join(
        part.map_batches(ps_rows, batch_format="pyarrow"),
        li.map_batches(shipped, batch_format="pyarrow"),
        on="_pk", how="left", combine=comb)
    sks = relational.ds_to_table(j).to_pandas()["ps_suppkey"].unique()
    out = supp_pd[(supp_pd.s_suppkey.isin(sks))
                  & (supp_pd.s_nationkey == nat3)] \
        .sort_values("s_name").reset_index(drop=True)
    return out[["s_name"]]


SQL_Q20 = f"""
WITH {SQL_PARTSUPP_CTE.strip()},
shipped AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN part ON p_partkey = ps_partkey
  LEFT JOIN shipped ON shipped.l_partkey = ps_partkey
                   AND shipped.l_suppkey = ps_suppkey
  WHERE p_name LIKE 'red%'
    AND avail > 0.5 * COALESCE(shipped.q, 0))
SELECT s_name FROM supplier
JOIN cand ON ps_suppkey = s_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_3'
ORDER BY s_name
"""


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 (customer order-count distribution) WITHOUT the
    customer⋈orders join: per-batch order partials → one custkey
    groupby → tiny histogram partials merged on the driver; the zero
    bucket is |customer| − |custkeys with orders| (FK guarantees the
    subset), so the customer table contributes one distributed count
    instead of a join side."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        out = pa.table({"o_custkey": g["o_custkey"],
                        "pn": g["o_custkey_count"].cast(pa.int64())})
        return out.append_column("_b", pa.array(
            relational.stable_bucket(out["o_custkey"], 64)))

    def hist(df: pd.DataFrame) -> pa.Table:
        # per-bucket: full per-customer counts (a custkey lives in one
        # bucket), then the tiny histogram partial
        s = df.groupby("o_custkey", sort=False)["pn"].sum() \
            .value_counts()
        return pa.table({
            "c_count": pa.array(s.index.to_numpy(dtype=np.int64)),
            "pn": pa.array(s.to_numpy(dtype=np.int64))})

    parts = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("_b").map_groups(hist, batch_format="pandas")) \
        .to_pandas()
    agg = parts.groupby("c_count", as_index=False)["pn"].sum() \
        .rename(columns={"pn": "custdist"})
    zero = int(cust.count()) - int(agg["custdist"].sum())
    if zero > 0:
        agg = pd.concat([agg, pd.DataFrame(
            [{"c_count": 0, "custdist": zero}])], ignore_index=True)
    agg = agg.sort_values(["custdist", "c_count"],
                          ascending=[False, False]).reset_index(drop=True)
    return agg[["c_count", "custdist"]]


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 (promo revenue share, March 1997): one bucketed
    partkey join (month-filtered lineitem cents)⋈(part promo flag)
    with BOTH cents sums fused into the bucket tail — each bucket
    emits one partial row; the driver finishes a single division."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    import pyarrow.dataset as pds
    lo = np.datetime64("1997-03-01T00:00:00")
    hi = np.datetime64("1997-04-01T00:00:00")
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_shipdate"],
               filter=((pds.field("l_shipdate") >= pa.scalar(lo))
                       & (pds.field("l_shipdate") < pa.scalar(hi))))

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))))
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0)), ndigits=0,
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"p_partkey": t["l_partkey"], "rc": rc})

    pf = part.map_batches(
        lambda t: pa.table({
            "p_partkey": t["p_partkey"],
            "promo": pc.cast(pc.equal(t["p_type"], "PROMO"),
                             pa.int64())}),
        batch_format="pyarrow")

    def comb(t: pa.Table) -> pa.Table:
        rc = t["rc"].to_numpy(zero_copy_only=False)
        pr = t["promo"].to_numpy(zero_copy_only=False)
        return pa.table({"p": pa.array([int((rc * pr).sum())],
                                       type=pa.int64()),
                         "t": pa.array([int(rc.sum())],
                                       type=pa.int64())})

    j = relational.bucketed_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"), pf,
        on="p_partkey", combine=comb)
    tot = relational.ds_to_table(j).to_pandas()
    p, t = int(tot["p"].sum()), int(tot["t"].sum())
    return pd.DataFrame([{"promo_revenue": float(np.round(
        100.0 * p / t, 4))}])


SQL_Q14 = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) ELSE 0 END)
       / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 (top supplier): per-supplier revenue over 1996Q1,
    keeping every supplier tied at the maximum.  Per-batch cents
    partials → one suppkey groupby (≤ |suppliers| rows) → driver-scalar
    max + filter → broadcast name attach."""
    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"])
    lo = np.datetime64("1996-01-01T00:00:00")
    hi = np.datetime64("1996-04-01T00:00:00")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))))
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0)), ndigits=0,
            round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"s_suppkey": t["l_suppkey"], "rc": rc}) \
            .group_by("s_suppkey").aggregate([("rc", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"],
                         "prc": g["rc_sum"].cast(pa.int64())})

    rev = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Sum("prc", alias_name="rc")) \
        .to_pandas()
    top = rev[rev["rc"] == rev["rc"].max()]
    st = _read_table(sf_dir, "supplier",
                     ["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(st, on="s_suppkey").sort_values("s_suppkey") \
        .reset_index(drop=True)
    out["total_revenue"] = np.round(out["rc"] / 100.0, 2)
    return out[["s_suppkey", "s_name", "total_revenue"]]


SQL_Q15 = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS rc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, ROUND(rc / 100.0, 2) AS total_revenue
FROM r JOIN supplier USING (s_suppkey)
WHERE rc = (SELECT MAX(rc) FROM r)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 (small-quantity revenue, adapted: the selective part
    filter is brand + size — the synthetic part table has no
    container — and the fraction is 0.5·avg): the filtered part keys
    are a SELECTIVE dim subset, so they broadcast; their lineitems
    (small vs the corpus) materialize once and feed both the per-part
    quantity average and the final filtered cents sum."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    pt = relational.ds_to_table(part)
    pt = pt.filter(pc.and_(pc.equal(pt["p_brand"], "Brand#3"),
                           pc.less_equal(pt["p_size"], 10)))
    keys = pa.array(sorted(pt["p_partkey"].to_pylist()),
                    type=pt["p_partkey"].type)

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=keys))
        rc = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0)), ndigits=0,
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_partkey": t["l_partkey"],
                         "q": t["l_quantity"].cast(pa.int64()),
                         "rc": rc})

    sub = li.map_batches(li_prep, batch_format="pyarrow").materialize()
    g = relational.ds_to_table(sub).to_pandas()
    avg = g.groupby("l_partkey")["q"].mean()     # exact-int sum / count
    lim = 0.5 * avg.reindex(g["l_partkey"]).to_numpy()
    cents = int(g.loc[g["q"].to_numpy() < lim, "rc"].sum())
    return pd.DataFrame([{"avg_yearly": float(np.round(
        cents / 700.0, 2))}])


SQL_Q17 = """
WITH p AS (SELECT p_partkey FROM part
           WHERE p_brand = 'Brand#3' AND p_size <= 10),
l AS (SELECT l_partkey, l_quantity,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS rc
      FROM lineitem JOIN p ON l_partkey = p_partkey),
a AS (SELECT l_partkey, AVG(l_quantity) AS aq FROM l
      GROUP BY l_partkey)
SELECT ROUND(SUM(l.rc) / 700.0, 2) AS avg_yearly
FROM l JOIN a USING (l_partkey)
WHERE l.l_quantity < 0.5 * a.aq
"""


def q18_large_orders(sf_dir: str):
    """TPC-H Q18 (large-volume orders, threshold 300): per-batch
    quantity partials → ONE coarse-bucket shuffle (hash(orderkey) % 64
    — a 64-group exchange, not a 150k-key global sort; measured 11.7 s
    → ~1 s at sf0.1) with the per-order sum + HAVING filter vectorized
    per bucket → tiny survivor set → broadcast semi against orders for
    the customer/date/price columns."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"o_orderkey": t["l_orderkey"],
                      "q": t["l_quantity"].cast(pa.int64())}) \
            .group_by("o_orderkey").aggregate([("q", "sum")])
        out = pa.table({"o_orderkey": g["o_orderkey"],
                        "pq": g["q_sum"].cast(pa.int64())})
        return out.append_column("_b", pa.array(
            relational.stable_bucket(out["o_orderkey"], 64)))

    def finish(df: pd.DataFrame) -> pa.Table:
        s = df.groupby("o_orderkey", sort=False)["pq"].sum()
        s = s[s > 300]
        return pa.table({
            "o_orderkey": pa.array(s.index.to_numpy(dtype=np.int64)),
            "sum_qty": pa.array(s.to_numpy(dtype=np.int64))})

    big = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("_b").map_groups(finish, batch_format="pandas")) \
        .to_pandas()
    keys = pa.array(sorted(big["o_orderkey"].tolist()), type=pa.int64())
    ords = relational.ds_to_table(orders.map_batches(
        lambda t: t.filter(pc.is_in(
            t["o_orderkey"].cast(pa.int64()), value_set=keys)),
        batch_format="pyarrow")).to_pandas()
    out = ords.merge(big, on="o_orderkey") \
        .sort_values(["o_totalprice", "o_orderkey"],
                     ascending=[False, True]).head(100) \
        .reset_index(drop=True)
    out = _round2(out, ["o_totalprice"])
    return out[["o_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]]


SQL_Q18 = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 300
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 (disjunctive brand/size/quantity predicates): one
    bucketed partkey join with the three-way OR filter + cents sum
    fused into the bucket tail — one partial row per bucket."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        rc = pc.cast(pc.round(pc.multiply(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0)), ndigits=0,
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"p_partkey": t["l_partkey"],
                         "q": t["l_quantity"].cast(pa.int64()),
                         "rc": rc})

    def comb(t: pa.Table) -> pa.Table:
        br = t["p_brand"].to_numpy(zero_copy_only=False)
        sz = t["p_size"].to_numpy(zero_copy_only=False)
        q = t["q"].to_numpy(zero_copy_only=False)
        keep = (((br == "Brand#1") & (sz >= 1) & (sz <= 15)
                 & (q >= 1) & (q <= 20))
                | ((br == "Brand#2") & (sz >= 10) & (sz <= 25)
                   & (q >= 10) & (q <= 30))
                | ((br == "Brand#3") & (sz >= 20) & (sz <= 40)
                   & (q >= 20) & (q <= 40)))
        rc = t["rc"].to_numpy(zero_copy_only=False)
        return pa.table({"p": pa.array([int(rc[keep].sum())],
                                       type=pa.int64())})

    j = relational.bucketed_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        part, on="p_partkey", combine=comb)
    cents = int(relational.ds_to_table(j).to_pandas()["p"].sum())
    return pd.DataFrame([{"revenue": float(np.round(cents / 100.0, 2))}])


SQL_Q19 = """
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
       AND l_quantity BETWEEN 20 AND 40)
"""


def q21_blocking_supplier(sf_dir: str):
    """TPC-H Q21 (suppliers who kept orders waiting, adapted: 'late'
    is holding the order's MAX l_shipdate — the synthetic tables have
    no receipt/commit dates): for multi-supplier orders whose latest
    shipment comes from exactly one supplier, count blocked orders per
    supplier.  Everything is per-orderkey, so ONE bucketed groupby
    computes it; supplier names attach from a broadcast dim."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def tag(t: pa.Table) -> pa.Table:
        b = relational.stable_bucket(t["l_orderkey"], 32)
        return t.append_column("_bucket", pa.array(b))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        mx = df.groupby("l_orderkey")["l_shipdate"].transform("max")
        ns = df.groupby("l_orderkey")["l_suppkey"].transform("nunique")
        at_max = df[(df["l_shipdate"] == mx) & (ns >= 2)]
        per_o = at_max.groupby("l_orderkey")["l_suppkey"] \
            .agg(["nunique", "min"])
        solo = per_o[per_o["nunique"] == 1]["min"]
        vc = solo.value_counts()
        return pa.table({
            "s_suppkey": pa.array(vc.index.to_numpy(dtype=np.int64)),
            "pn": pa.array(vc.to_numpy(dtype=np.int64))})

    parts = li.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
    agg = relational.ds_to_table(parts).to_pandas() \
        .groupby("s_suppkey", as_index=False)["pn"].sum() \
        .rename(columns={"pn": "numwait"})
    st = _read_table(sf_dir, "supplier",
                     ["s_suppkey", "s_name"]).to_pandas()
    out = agg.merge(st, on="s_suppkey") \
        .sort_values(["numwait", "s_name"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)
    return out[["s_name", "numwait"]]


SQL_Q21 = """
WITH o AS (SELECT l_orderkey, MAX(l_shipdate) AS mx,
                  COUNT(DISTINCT l_suppkey) AS ns
           FROM lineitem GROUP BY l_orderkey),
blockers AS (
  SELECT l.l_orderkey, MIN(l.l_suppkey) AS s,
         COUNT(DISTINCT l.l_suppkey) AS nmax
  FROM lineitem l JOIN o ON l.l_orderkey = o.l_orderkey
                        AND l.l_shipdate = o.mx
  WHERE o.ns >= 2
  GROUP BY l.l_orderkey)
SELECT s_name, COUNT(*) AS numwait
FROM blockers JOIN supplier ON s_suppkey = s
WHERE nmax = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_sales_opportunity(sf_dir: str):
    """TPC-H Q22 (global sales opportunity, adapted: grouped by nation
    name — the synthetic customer has no phone country code — and
    'no orders' means none since 2001-01-01, since every synthetic
    customer has lifetime orders): DORMANT customers with
    above-positive-average balance, counted and summed per nation.
    Shape: exact-cents average from one streamed partial pass; the
    rich-customer stream anti-joins the recent-order custkey set in
    ONE bucketed exchange; nation partials finish tiny."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    cutoff = np.datetime64("2001-01-01T00:00:00")

    def bal_partial(t: pa.Table) -> pa.Table:
        bc = pc.cast(pc.round(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0)), ndigits=0,
            round_mode="half_towards_infinity"), pa.int64())
        keep = pc.greater(bc, 0)
        s = pc.sum(pc.if_else(keep, bc, 0)).as_py() or 0
        n = pc.sum(pc.cast(keep, pa.int64())).as_py() or 0
        return pa.table({"s": pa.array([s], type=pa.int64()),
                         "n": pa.array([n], type=pa.int64())})

    bp = relational.ds_to_table(
        cust.map_batches(bal_partial, batch_format="pyarrow")).to_pandas()
    av = (bp["s"].sum() / 100.0) / bp["n"].sum()   # dollars, double

    def rich_f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["c_acctbal"], pa.scalar(av)))
        bc = pc.cast(pc.round(pc.multiply(
            t["c_acctbal"], pa.scalar(100.0)), ndigits=0,
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"], "bc": bc})

    rich = cust.map_batches(rich_f, batch_format="pyarrow")
    okeys = orders.map_batches(
        lambda t: pa.table({"c_custkey": t.filter(
            pc.greater_equal(t["o_orderdate"],
                             pa.scalar(cutoff)))["o_custkey"]}),
        batch_format="pyarrow")
    no_orders = relational.bucketed_semi_join(rich, okeys,
                                              on="c_custkey", anti=True)

    def nat_partial(t: pa.Table) -> pa.Table:
        g = t.select(["c_nationkey", "bc"]).group_by("c_nationkey") \
            .aggregate([("bc", "sum"), ("bc", "count")])
        return pa.table({"c_nationkey": g["c_nationkey"],
                         "pb": g["bc_sum"].cast(pa.int64()),
                         "pn": g["bc_count"].cast(pa.int64())})

    agg = no_orders.map_batches(nat_partial, batch_format="pyarrow") \
        .groupby("c_nationkey") \
        .aggregate(Sum("pn", alias_name="numcust"),
                   Sum("pb", alias_name="bc")).to_pandas()
    nt = _read_table(sf_dir, "nation",
                     ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(nt, left_on="c_nationkey", right_on="n_nationkey")
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = np.round(out["bc"] / 100.0, 2)
    out = out.sort_values("n_name").reset_index(drop=True)
    return out[["n_name", "numcust", "totacctbal"]]


SQL_Q22 = """
WITH a AS (SELECT AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0
                  AS av
           FROM customer WHERE ROUND(c_acctbal * 100) > 0),
r AS (SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bc
      FROM customer, a WHERE c_acctbal > a.av),
n0 AS (SELECT r.* FROM r
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = r.c_custkey
                           AND o_orderdate >= TIMESTAMP '2001-01-01'))
SELECT n_name, COUNT(*) AS numcust,
       ROUND(SUM(bc) / 100.0, 2) AS totacctbal
FROM n0 JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def q_bfs_hops_links(sf_dir: str):
    """Multi-source BFS hop distance (crawl-frontier / link-distance
    shape) over the same deterministic synthetic link graph as
    pagerank_links: seeds are every 97th doc, 3 expansion rounds, each
    node reports its MIN hop count.  Frontier-only bucketed expansion —
    round r's exchange is proportional to the newly-reached surface,
    not the visited set (graph_ops.bfs_hops; size-guarded broadcast leg
    at this scale, bucketed BSP leg past 4M nodes)."""
    from ..stages import graph_ops
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    def seed_rows(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(d[d % 97 == 0])})

    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")
    out = graph_ops.bfs_hops(
        docs.map_batches(edges, batch_format="pyarrow"), seeds,
        rounds=3, approx_num_nodes=n)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "hops": b["hops"]}),
        batch_format="pyarrow")


SQL_BFS_HOPS = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
d0 AS (SELECT doc_id AS v, CAST(0 AS BIGINT) AS hops
       FROM documents WHERE doc_id % 97 = 0),
f1 AS (SELECT DISTINCT e.dst AS v FROM edges e
       JOIN d0 ON d0.v = e.src AND d0.hops = 0),
d1 AS (SELECT v, MIN(hops) AS hops FROM (
         SELECT v, hops FROM d0
         UNION ALL SELECT v, CAST(1 AS BIGINT) FROM f1) GROUP BY v),
f2 AS (SELECT DISTINCT e.dst AS v FROM edges e
       JOIN d1 ON d1.v = e.src AND d1.hops = 1),
d2 AS (SELECT v, MIN(hops) AS hops FROM (
         SELECT v, hops FROM d1
         UNION ALL SELECT v, CAST(2 AS BIGINT) FROM f2) GROUP BY v),
f3 AS (SELECT DISTINCT e.dst AS v FROM edges e
       JOIN d2 ON d2.v = e.src AND d2.hops = 2),
d3 AS (SELECT v, MIN(hops) AS hops FROM (
         SELECT v, hops FROM d2
         UNION ALL SELECT v, CAST(3 AS BIGINT) FROM f3) GROUP BY v)
SELECT v AS doc_id, hops FROM d3
"""


def q_mad_outliers_acctbal(sf_dir: str):
    """Robust per-group outlier detection: flag customers whose account
    balance deviates from their nation's MEDIAN by more than 3× the
    nation's MAD (median absolute deviation) — the robust-statistics
    filter that survives the heavy tails a mean/stddev z-score drowns
    in.  Two exact distributed median passes on integer cents
    (grouped_quantile_disc: histogram-refine, no per-group sort of the
    full data), one counting pass; group-sized maps ride in the task
    closure.  All-int arithmetic end to end."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": t["c_nationkey"],
            "cents": pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                             pa.int64())})

    cents = cust.map_batches(to_cents, batch_format="pyarrow") \
        .materialize()
    med_df = relational.grouped_quantile_disc(
        cents, key_col="c_nationkey", val_col="cents", qs=[0.5])
    med = dict(zip(med_df["c_nationkey"], med_df["p50"].astype(np.int64)))

    def to_dev(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.vectorize(med.get, otypes=[np.int64])(nk)
        return pa.table({"c_nationkey": t["c_nationkey"],
                         "dev": pa.array(np.abs(c - m))})

    dev = cents.map_batches(to_dev, batch_format="pyarrow").materialize()
    mad_df = relational.grouped_quantile_disc(
        dev, key_col="c_nationkey", val_col="dev", qs=[0.5])
    mad = dict(zip(mad_df["c_nationkey"], mad_df["p50"].astype(np.int64)))

    def count_outliers(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        d = t["dev"].to_numpy(zero_copy_only=False).astype(np.int64)
        thr = np.vectorize(mad.get, otypes=[np.int64])(nk)
        g = pa.table({"c_nationkey": t["c_nationkey"],
                      "o": pa.array((d > 3 * thr).astype(np.int64))}) \
            .group_by("c_nationkey").aggregate([("o", "sum")])
        return pa.table({"c_nationkey": g["c_nationkey"],
                         "po": g["o_sum"]})

    from ray.data.aggregate import Sum
    agg = dev.map_batches(count_outliers, batch_format="pyarrow") \
        .groupby("c_nationkey").aggregate(Sum("po", alias_name="n")) \
        .to_pandas().sort_values("c_nationkey").reset_index(drop=True)
    agg["n_outliers"] = agg["n"].astype("int64")
    agg["median_acctbal"] = agg["c_nationkey"].map(med) / 100.0
    agg["mad_acctbal"] = agg["c_nationkey"].map(mad) / 100.0
    return agg[["c_nationkey", "n_outliers", "median_acctbal",
                "mad_acctbal"]]


SQL_MAD_OUTLIERS = """
WITH c AS (SELECT c_nationkey,
                  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
m AS (SELECT c_nationkey, quantile_disc(cents, 0.5) AS med
      FROM c GROUP BY c_nationkey),
d AS (SELECT c.c_nationkey, ABS(c.cents - m.med) AS dev, m.med
      FROM c JOIN m USING (c_nationkey)),
md AS (SELECT c_nationkey, quantile_disc(dev, 0.5) AS mad
       FROM d GROUP BY c_nationkey)
SELECT d.c_nationkey,
       COUNT(*) FILTER (WHERE d.dev > 3 * md.mad) AS n_outliers,
       MIN(d.med) / 100.0 AS median_acctbal,
       MIN(md.mad) / 100.0 AS mad_acctbal
FROM d JOIN md USING (c_nationkey)
GROUP BY d.c_nationkey
ORDER BY d.c_nationkey
"""


def q_sssp_links(sf_dir: str):
    """Bounded-hop weighted shortest path (min-plus Bellman-Ford, 3
    relaxation rounds) over the synthetic link graph with deterministic
    integer weights w = 1 + (src*31 + dst*17) % 9; seeds are every
    101st doc.  Changed-only frontier: a node whose distance did not
    improve is not re-expanded (graph_ops.sssp_rounds — broadcast leg
    here, bucketed BSP leg past the guard)."""
    from ..stages import graph_ops
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        w = 1 + (src * 31 + dst * 17) % 9
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "w": pa.array(w)})

    def seed_rows(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(d[d % 101 == 0])})

    out = graph_ops.sssp_rounds(
        docs.map_batches(edges, batch_format="pyarrow"),
        docs.map_batches(seed_rows, batch_format="pyarrow"),
        rounds=3, approx_num_nodes=n)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "dist": b["dist"]}),
        batch_format="pyarrow")


SQL_SSSP = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
e AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
ew AS (SELECT src, dst, 1 + (src * 31 + dst * 17) % 9 AS w FROM e),
d0 AS (SELECT doc_id AS v, CAST(0 AS BIGINT) AS dist
       FROM documents WHERE doc_id % 101 = 0),
c1 AS (SELECT e.dst AS v, d0.dist + e.w AS dist
       FROM ew e JOIN d0 ON d0.v = e.src),
d1 AS (SELECT v, MIN(dist) AS dist FROM (
         SELECT * FROM d0 UNION ALL SELECT * FROM c1) GROUP BY v),
c2 AS (SELECT e.dst AS v, d1.dist + e.w AS dist
       FROM ew e JOIN d1 ON d1.v = e.src),
d2 AS (SELECT v, MIN(dist) AS dist FROM (
         SELECT * FROM d1 UNION ALL SELECT * FROM c2) GROUP BY v),
c3 AS (SELECT e.dst AS v, d2.dist + e.w AS dist
       FROM ew e JOIN d2 ON d2.v = e.src),
d3 AS (SELECT v, MIN(dist) AS dist FROM (
         SELECT * FROM d2 UNION ALL SELECT * FROM c3) GROUP BY v)
SELECT v AS doc_id, dist FROM d3
"""


def q_ewma_user_value(sf_dir: str):
    """Per-user bounded-history exponential moving average of spend
    (decay 1/2 over the last 24 events) — the streaming-telemetry
    smoothing shape.  Dyadic weights on integer cents keep every
    intermediate EXACT in float64 at any partitioning/summation order,
    so the SQL twin matches with no rounding pin
    (relational.ewma_bounded: one coarse-bucket shuffle, 24 shifted-add
    vector ops per bucket)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"], "cents": cents})

    out = relational.ewma_bounded(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts", order_col="event_id",
        value_col="cents", window_rows=24).to_pandas()
    out["ewma_value"] = out["ewma"] / 100.0
    return out[["event_id", "user_id", "ewma_value"]] \
        .sort_values("event_id").reset_index(drop=True)


SQL_EWMA = """
WITH c AS (
  SELECT event_id, user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT a.event_id, a.user_id,
       SUM(b.cents * POWER(0.5, a.rn - b.rn))
         / SUM(POWER(0.5, a.rn - b.rn)) / 100.0 AS ewma_value
FROM c a JOIN c b
  ON b.user_id = a.user_id AND b.rn <= a.rn AND b.rn > a.rn - 24
GROUP BY a.event_id, a.user_id
ORDER BY a.event_id
"""


def q_k_core_links(sf_dir: str):
    """Bounded k-core peel (k=5, 3 rounds) over the pagerank_links
    synthetic graph (doc -> (doc*7919 + k*104729) % N, k=1..3,
    symmetrized): each round drops nodes whose degree in the surviving
    subgraph is < 5 — the cohesive-subgraph / spam-farm filter a link
    corpus runs before ranking.  Survivors report their degree in the
    final filtered edge set (graph_ops.k_core; size-guarded broadcast
    leg at this scale, bucketed-semi-join BSP leg past the node
    budget).  All-int state, unrolled-CTE SQL twin."""
    from ..stages import graph_ops
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    out = graph_ops.k_core(
        docs.map_batches(edges, batch_format="pyarrow"), k=5, rounds=3)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "deg": b["deg"]}),
        batch_format="pyarrow")


def _sql_k_core(k: int = 5, rounds: int = 3) -> str:
    """Unrolled peel rounds: degree -> survivors -> edge filter per
    round, mirroring graph_ops.k_core exactly (all-int)."""
    sql = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + kk.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) kk, nn),
e0 AS (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM raw
  UNION ALL SELECT dst AS a, src AS b FROM raw) WHERE a <> b),
"""
    prev = "e0"
    for r in range(1, rounds + 1):
        sql += (f"d{r} AS (SELECT a, COUNT(*) AS dg FROM {prev} "
                f"GROUP BY a),\n")
        sql += f"s{r} AS (SELECT a FROM d{r} WHERE dg >= {k}),\n"
        sql += (f"e{r} AS (SELECT e.a, e.b FROM {prev} e "
                f"JOIN s{r} x ON x.a = e.a "
                f"JOIN s{r} y ON y.a = e.b),\n")
        prev = f"e{r}"
    sql += (f"fd AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg "
            f"FROM {prev} GROUP BY a)\n"
            f"SELECT s.a AS doc_id, COALESCE(fd.deg, 0) AS deg\n"
            f"FROM s{rounds} s LEFT JOIN fd ON fd.a = s.a")
    return sql


def q_gap_fill_daily_revenue(sf_dir: str):
    """Calendar gap-fill + running cumulative (the dense-time-series
    prep every forecasting pipeline needs): per order status, daily
    revenue over the DENSE calendar from the global min to max order
    date — days with no orders emit 0 — plus the per-status running
    cumulative over that dense calendar.  Distributed part: per-batch
    (status, day, cents) partials -> one bounded groupby (statuses ×
    days, independent of row count); the densify + cumsum runs on that
    bounded aggregate.  Exact integer cents end to end."""
    from ray.data.aggregate import Sum
    ords = _read(sf_dir, "orders",
                 ["o_orderstatus", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_orderstatus":
                          t["o_orderstatus"].to_numpy(zero_copy_only=False),
                          "day": day, "pc_": cents}) \
            .groupby(["o_orderstatus", "day"], sort=False)["pc_"] \
            .sum().reset_index()
        return pa.table({
            "o_orderstatus": pa.array(g["o_orderstatus"]),
            "day": pa.array(g["day"].to_numpy().astype("datetime64[us]")),
            "pc_": pa.array(g["pc_"].to_numpy(dtype=np.int64))})

    agg = ords.map_batches(partial, batch_format="pyarrow") \
        .groupby(["o_orderstatus", "day"]) \
        .aggregate(Sum("pc_", alias_name="cents"))
    df = relational.ds_to_table(agg).to_pandas()
    days = pd.date_range(df["day"].min(), df["day"].max(), freq="D")
    statuses = sorted(df["o_orderstatus"].unique())
    full = pd.MultiIndex.from_product(
        [statuses, days], names=["o_orderstatus", "day"]) \
        .to_frame(index=False)
    m = full.merge(df, on=["o_orderstatus", "day"], how="left")
    m["cents"] = m["cents"].fillna(0).astype(np.int64)
    m = m.sort_values(["o_orderstatus", "day"]).reset_index(drop=True)
    cum = m.groupby("o_orderstatus", sort=False)["cents"].cumsum() \
        .to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "o_orderstatus": m["o_orderstatus"],
        "day": m["day"],
        "revenue": np.round(m["cents"].to_numpy(dtype=np.int64)
                            / 100.0, 2),
        "cum_revenue": np.round(cum / 100.0, 2)})


SQL_GAP_FILL = """
WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
                  MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
cal AS (SELECT CAST(unnest(generate_series(
          (SELECT lo FROM b), (SELECT hi FROM b),
          INTERVAL 1 DAY)) AS TIMESTAMP) AS day),
st AS (SELECT DISTINCT o_orderstatus FROM orders),
daily AS (SELECT o_orderstatus,
                 CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY 1, 2),
dense AS (SELECT st.o_orderstatus, cal.day,
                 COALESCE(d.cents, 0) AS cents
          FROM st CROSS JOIN cal
          LEFT JOIN daily d ON d.o_orderstatus = st.o_orderstatus
                           AND d.day = cal.day)
SELECT o_orderstatus, day,
       ROUND(cents / 100.0, 2) AS revenue,
       ROUND(SUM(cents) OVER (PARTITION BY o_orderstatus ORDER BY day)
             / 100.0, 2) AS cum_revenue
FROM dense
"""


def q_top_parts_per_brand_ties(sf_dir: str):
    """Grouped top-k WITH TIES: the 3 highest retail prices per brand
    under RANK() semantics — every row tied with a kept rank survives
    (row_number-style top-k silently drops tied rows; downstream "best
    sellers" reports need the tie-complete set).  Per-batch rank prune
    is a safe superset (a batch-local rank is never larger than the
    global one), then one bounded per-brand finish."""
    parts = _read(sf_dir, "part", ["p_brand", "p_partkey",
                                   "p_retailprice"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        r = df.groupby("p_brand")["p_retailprice"] \
            .rank(method="min", ascending=False)
        return df[r <= 3]

    def fin(df: pd.DataFrame) -> pa.Table:
        r = df["p_retailprice"].rank(method="min", ascending=False) \
            .astype(np.int64)
        out = df.assign(rnk=r)
        out = out[out["rnk"] <= 3].sort_values(["rnk", "p_partkey"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return parts.map_batches(prune, batch_format="pandas") \
        .groupby("p_brand").map_groups(fin, batch_format="pandas")


SQL_TOP_BRAND_TIES = """
SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT p_brand, p_partkey, p_retailprice,
             RANK() OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC) AS rnk
      FROM part)
WHERE rnk <= 3
"""


def q_sentence_stats_by_lang(sf_dir: str):
    """Sentence segmentation stats (the doc-shape profile a curriculum
    / quality pass reads): per lang, doc count, total sentences
    (nonempty [.!?]+-delimited segments), avg sentences per doc and avg
    sentence char length.  Pure per-batch arrow pass — RE2 split via
    pc.split_pattern_regex, per-doc counts from list offsets with a
    cumsum-diff (reduceat mis-handles empty lists), whitespace set
    pinned to match the SQL twin's trim charset — then a lang-keyed
    partial combine."""
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents", ["lang", "text"])
    ws = " \t\n\r\x0b\x0c"

    def stats(t: pa.Table) -> pa.Table:
        col = t["text"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks == 1 else \
                pa.concat_arrays(col.chunks)
        parts = pc.split_pattern_regex(col, pattern="[.!?]+")
        offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pc.utf8_trim(parts.values, characters=ws)
        lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ne = (lens > 0).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(ne)])
        ns = cs[offs[1:]] - cs[offs[:-1]]
        csl = np.concatenate([[0], np.cumsum(lens * ne)])
        tc = csl[offs[1:]] - csl[offs[:-1]]
        g = pd.DataFrame({"lang": t["lang"].to_numpy(zero_copy_only=False),
                          "pn": 1, "ps": ns, "ptc": tc}) \
            .groupby("lang", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = docs.map_batches(stats, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("pn", alias_name="n_docs"),
                                   Sum("ps", alias_name="sentences"),
                                   Sum("ptc", alias_name="tc"))

    def fin(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = t["sentences"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = t["tc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "lang": t["lang"],
            "n_docs": pa.array(nd),
            "sentences": pa.array(ns),
            "avg_doc_sentences": pa.array(np.round(ns * 1.0 / nd, 4)),
            "avg_sentence_chars": pa.array(
                np.round(tc * 1.0 / np.maximum(ns, 1), 4))})

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_SENTENCE_STATS = """
WITH s AS (
  SELECT lang,
         list_filter(list_transform(
           regexp_split_to_array(text, '[.!?]+'),
           x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)
                     || chr(11) || chr(12))),
           x -> length(x) > 0) AS sl
  FROM documents),
p AS (SELECT lang, len(sl) AS ns,
             COALESCE(list_sum(list_transform(sl, x -> length(x))), 0)
               AS tc
      FROM s)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ns) AS BIGINT) AS sentences,
       ROUND(SUM(ns) * 1.0 / COUNT(*), 4) AS avg_doc_sentences,
       ROUND(SUM(tc) * 1.0 / GREATEST(SUM(ns), 1), 4)
         AS avg_sentence_chars
FROM p GROUP BY lang
"""


def q_stationary_event_dist(sf_dir: str):
    """Markov stationary distribution of the user-journey chain: the
    transition matrix from per-user ts-ordered event pairs (the same
    one-shuffle count as event_transition_matrix), row-normalized to
    integer NANO-probabilities (round-half-up of n*1e9/total — exact
    int arithmetic, no float division), then 6 power-iteration steps
    from the uniform vector with the same nano-int rounding each step.
    Every operation is integer, so the trajectory is bit-identical at
    any partitioning and the unrolled SQL twin (HUGEINT sums) matches
    exactly.  The matrix is |event_types|² — bounded driver math; the
    data-scaled work is the transition-count shuffle."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pa.array(relational.stable_bucket(t["user_id"], 64)))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"])
        same = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        cur = df["event_type"].to_numpy()[:-1][same]
        nxt = df["event_type"].to_numpy()[1:][same]
        g = pd.DataFrame({"cur": cur, "nxt": nxt, "n": 1}) \
            .groupby(["cur", "nxt"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas") \
        .groupby(["cur", "nxt"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    NANO = 10 ** 9
    tot = counts.groupby("cur")["n"].transform("sum")
    # round-half-up(n * 1e9 / tot) in exact ints
    pn = [(2 * int(n) * NANO + int(t)) // (2 * int(t))
          for n, t in zip(counts["n"], tot)]
    types = sorted(set(counts["cur"]).union(counts["nxt"]))
    idx = {t: i for i, t in enumerate(types)}
    nt = len(types)
    P = [[0] * nt for _ in range(nt)]
    for c, x, p in zip(counts["cur"], counts["nxt"], pn):
        P[idx[c]][idx[x]] = p
    v = [(2 * NANO + nt) // (2 * nt)] * nt
    for _ in range(6):
        v = [(2 * sum(v[i] * P[i][j] for i in range(nt)) + NANO)
             // (2 * NANO) for j in range(nt)]
    return pd.DataFrame({"event_type": types,
                         "p_nano": np.array(v, dtype=np.int64)})


def _sql_stationary(iters: int = 6) -> str:
    """Unrolled integer power iteration twinning
    q_stationary_event_dist (HUGEINT keeps the v·P products exact)."""
    sql = """
WITH t AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (SELECT cur, nxt, COUNT(*) AS n FROM t
      WHERE nxt IS NOT NULL GROUP BY 1, 2),
p AS (SELECT cur, nxt,
             CAST((2 * CAST(n AS HUGEINT) * 1000000000
                   + SUM(n) OVER (PARTITION BY cur))
                  // (2 * SUM(n) OVER (PARTITION BY cur)) AS BIGINT)
               AS pn
      FROM c),
ty AS (SELECT cur AS et FROM c UNION SELECT nxt FROM c),
v0 AS (SELECT et, CAST((2 * CAST(1000000000 AS HUGEINT)
                        + (SELECT COUNT(*) FROM ty))
                       // (2 * (SELECT COUNT(*) FROM ty)) AS BIGINT)
                  AS v FROM ty),
"""
    prev = "v0"
    for r in range(1, iters + 1):
        sql += (f"s{r} AS (SELECT p.nxt AS et, "
                f"CAST((2 * SUM(CAST({prev}.v AS HUGEINT) * p.pn) "
                f"+ 1000000000) // 2000000000 AS BIGINT) AS v "
                f"FROM p JOIN {prev} ON {prev}.et = p.cur "
                f"GROUP BY p.nxt),\n")
        sql += (f"v{r} AS (SELECT ty.et, COALESCE(s{r}.v, 0) AS v "
                f"FROM ty LEFT JOIN s{r} ON s{r}.et = ty.et),\n")
        prev = f"v{r}"
    sql = sql.rstrip(",\n") + "\n"
    sql += f"SELECT et AS event_type, v AS p_nano FROM v{iters}"
    return sql


def q_rrf_fusion_search(sf_dir: str):
    """Reciprocal-rank fusion of two retrieval channels (the standard
    hybrid-search merge): BM25 top-100 for 'hash join batch' over
    documents, and int-quantized dot-product (MIPS, the int8-style
    quantized retrieval real ANN systems run) top-100 vs the vec_id-0
    embedding — fused(id) = Σ_channels 1/(60+rank), top-15 by
    (fused DESC, id).  The MIPS channel quantizes each float to
    floor(x*1000 + 0.5) and ranks by the EXACT integer dot product, so
    channel ranks are bit-stable vs the SQL twin (float cosine rank
    order at k=100 is not); BM25 ranks use the 4dp-rounded scores the
    hash-green bm25 pipeline pins.  Both channels are the existing
    scale-safe shapes (per-batch partial top-k, bounded merges); the
    fusion itself touches 200 rows."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bm = text.bm25_topk(docs, ["hash", "join", "batch"], k=100,
                        round_to=4)
    bm = bm.sort_values(["score", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    bm_rank = {int(d): r + 1 for r, d in enumerate(bm["doc_id"])}

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrow = emb.filter(expr="vec_id == 0").take_all()
    qv = np.floor(np.asarray(qrow[0]["embedding"], dtype=np.float64)
                  * 1000.0 + 0.5).astype(np.int64)
    qref = ray.put(qv)

    def mips_partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        arr = t["embedding"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks == 1 else \
                pa.concat_arrays(arr.chunks)
        offs = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        m = np.floor(flat * 1000.0 + 0.5).astype(np.int64) \
            .reshape(len(offs), offs[0] if len(offs) else 0)
        s = m @ q
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) > 100:                      # batch-local safe prune
            order = np.lexsort((ids, -s))[:100]
            ids, s = ids[order], s[order]
        return pa.table({"doc_id": pa.array(ids), "s": pa.array(s)})

    mt = relational.ds_to_table(
        emb.map_batches(mips_partial, batch_format="pyarrow")).to_pandas()
    mt = mt.sort_values(["s", "doc_id"],
                        ascending=[False, True]).head(100) \
        .reset_index(drop=True)
    mips_rank = {int(d): r + 1 for r, d in enumerate(mt["doc_id"])}

    fused = {}
    for d, r in bm_rank.items():
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + r)
    for d, r in mips_rank.items():
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + r)
    out = pd.DataFrame({"doc_id": list(fused), "rrf_score":
                        [fused[d] for d in fused]})
    out = out.sort_values(["rrf_score", "doc_id"],
                          ascending=[False, True]).head(15)
    return out.reset_index(drop=True)


SQL_RRF = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents),
stats AS (SELECT COUNT(*) AS n, AVG(len(w)) AS avglen FROM toks),
tf AS (SELECT doc_id, x AS word, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest(w) AS x FROM toks)
       WHERE x IN ('hash', 'join', 'batch') GROUP BY doc_id, x),
df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
dl AS (SELECT doc_id, len(w) AS dl FROM toks),
sc AS (SELECT tf.doc_id,
              SUM(LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                  * tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75
                                    + 0.75 * dl.dl / stats.avglen)))
                AS s
       FROM tf JOIN df USING (word) JOIN dl USING (doc_id)
       CROSS JOIN stats GROUP BY tf.doc_id),
bq AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ROUND(s, 4) DESC,
                                         doc_id) AS r
       FROM sc QUALIFY r <= 100),
qv AS (SELECT list_transform(embedding,
              x -> FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)) AS qe
       FROM embeddings WHERE vec_id = 0),
mips AS (SELECT e.vec_id AS doc_id,
                CAST(list_dot_product(qv.qe, list_transform(e.embedding,
                     x -> FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)))
                     AS BIGINT) AS s
         FROM embeddings e, qv),
cq AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
       FROM mips QUALIFY r <= 100),
u AS (SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + b.r), 0.0)
               + COALESCE(1.0 / (60 + c.r), 0.0) AS f
      FROM bq b FULL OUTER JOIN cq c ON b.doc_id = c.doc_id)
SELECT doc_id, f AS rrf_score FROM u
ORDER BY f DESC, doc_id LIMIT 15
"""


def q_embedding_var_by_label(sf_dir: str):
    """Per-label per-dimension embedding variance (the feature-drift /
    cluster-shape profile an embedding store monitors): floats quantize
    to milli-units (floor(x*1000 + 0.5)) so the power sums are EXACT
    integers at any partitioning; mean/variance derive from (n, Σx,
    Σx²) with the identical double expression the SQL twin uses.
    Per-batch vectorized partials (one pandas groupby over the
    reshaped matrix), one bounded (labels × dims) final combine."""
    from ray.data.aggregate import Sum
    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks == 1 else \
                pa.concat_arrays(arr.chunks)
        offs = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        d = int(offs[0]) if len(offs) else 0
        q = np.floor(arr.flatten().to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1000.0 + 0.5) \
            .astype(np.int64).reshape(len(offs), d)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = pd.DataFrame(q).groupby(lab, sort=False).sum()
        sxx = pd.DataFrame(q * q).groupby(lab, sort=False).sum()
        cnt = pd.Series(1, index=lab).groupby(level=0, sort=False).sum()
        labs = sx.index.to_numpy()
        return pa.table({
            "label": pa.array(np.repeat(labs, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(labs))),
            "psx": pa.array(sx.to_numpy(dtype=np.int64).ravel()),
            "psxx": pa.array(sxx.to_numpy(dtype=np.int64).ravel()),
            "pn": pa.array(np.repeat(cnt.loc[labs].to_numpy(
                dtype=np.int64), d))})

    agg = emb.map_batches(partial, batch_format="pyarrow") \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("psx", alias_name="sx"),
                   Sum("psxx", alias_name="sxx"),
                   Sum("pn", alias_name="n"))

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "label": pa.array(t["label"].to_numpy(zero_copy_only=False)
                              .astype(np.int64)),
            "dim": t["dim"],
            "n": pa.array(t["n"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)),
            "mean_milli": pa.array(np.round(sx / n, 6)),
            "var_milli": pa.array(np.round((n * sxx - sx * sx)
                                           / (n * n), 6))})

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_EMB_VAR = """
WITH q AS (SELECT label,
                  list_transform(embedding, x -> CAST(FLOOR(
                    CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
           FROM embeddings),
u AS (SELECT label, unnest(generate_series(1, len(qe))) AS i, qe FROM q),
v AS (SELECT label, i - 1 AS dim, qe[i] AS v FROM u),
a AS (SELECT label, dim, COUNT(*) AS n,
             SUM(CAST(v AS HUGEINT)) AS sx,
             SUM(CAST(v AS HUGEINT) * v) AS sxx
      FROM v GROUP BY 1, 2)
SELECT CAST(label AS BIGINT) AS label, dim, CAST(n AS BIGINT) AS n,
       ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_milli,
       ROUND((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_milli
FROM a
"""


def q_trimmed_mean_acctbal(sf_dir: str):
    """Per-nation 10 % two-sided trimmed mean of account balance — the
    outlier-robust location estimate (drop the lowest and highest
    floor(0.1·n) rows by (cents, custkey) rank, average the rest).
    All-int: cents in, round-half-up micro-dollar mean out — bit-exact
    at any partitioning.  One nation-bucket shuffle; per bucket a
    vectorized sort (nations are bounded, each group fits a task)."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return pa.table({"c_nationkey": t["c_nationkey"],
                         "c_custkey": t["c_custkey"],
                         "cents": pa.array(cents)})

    def per_nation(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["cents", "c_custkey"])
        n = len(df)
        cut = int(0.1 * n)
        kept = df["cents"].to_numpy(dtype=np.int64)[cut:n - cut]
        s, c = int(kept.sum()), len(kept)
        micro = (2 * s * 100 + c) // (2 * c) if c else 0
        return pa.table({
            "c_nationkey": pa.array([int(df["c_nationkey"].iloc[0])],
                                    type=pa.int32()),
            "n_kept": pa.array([c], type=pa.int64()),
            "trimmed_mean_micro": pa.array([micro], type=pa.int64())})

    return cust.map_batches(to_cents, batch_format="pyarrow") \
        .groupby("c_nationkey").map_groups(per_nation,
                                           batch_format="pandas")


SQL_TRIMMED_MEAN = """
WITH c AS (SELECT c_nationkey, c_custkey,
                  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
r AS (SELECT c_nationkey, cents,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY cents, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      FROM c)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST((2 * SUM(CAST(cents AS HUGEINT)) * 100 + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS trimmed_mean_micro
FROM r
WHERE rn > CAST(FLOOR(0.1 * n) AS BIGINT)
  AND rn <= n - CAST(FLOOR(0.1 * n) AS BIGINT)
GROUP BY c_nationkey
"""


def q_within_doc_line_dedup(sf_dir: str):
    """Within-document repeated-line removal (in-page boilerplate strip:
    repeated nav rows / footer lines collapse to their first
    occurrence, order otherwise preserved).  Pure per-batch map — arrow
    RE2-free split on newline, one vectorized drop_duplicates per
    batch, per-doc rejoin — no shuffle, the 100-TB-friendliest shape
    there is."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["text"], pattern="\n")
        col = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) \
            else parts
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks == 1 else \
                pa.concat_arrays(col.chunks)
        offs = np.diff(col.offsets.to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        idx = np.repeat(np.arange(len(offs)), offs)
        lines = col.values.to_pandas()
        df = pd.DataFrame({"i": idx, "line": lines})
        kept = df.drop_duplicates(["i", "line"], keep="first")
        joined = kept.groupby("i", sort=True)["line"].agg("\n".join)
        nk = kept.groupby("i", sort=True).size()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        full = np.arange(len(offs))
        out_text = pd.Series("", index=full, dtype=object)
        out_text.loc[joined.index] = joined
        out_k = pd.Series(0, index=full, dtype=np.int64)
        out_k.loc[nk.index] = nk
        return pa.table({
            "doc_id": pa.array(ids),
            "text_clean": pa.array(out_text.to_numpy(dtype=object),
                                   type=pa.string()),
            "n_lines": pa.array(offs.astype(np.int64)),
            "n_kept": pa.array(out_k.to_numpy(dtype=np.int64))})

    return docs.map_batches(f, batch_format="pyarrow")


SQL_WITHIN_DOC_DEDUP = """
WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS ls
           FROM documents),
u AS (SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM l),
x AS (SELECT doc_id, i, ls[i] AS line FROM u),
k AS (SELECT doc_id, i, line,
             MIN(i) OVER (PARTITION BY doc_id, line) AS fi FROM x)
SELECT doc_id,
       COALESCE(string_agg(line, chr(10) ORDER BY i)
                FILTER (WHERE i = fi), '') AS text_clean,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(*) FILTER (WHERE i = fi) AS BIGINT) AS n_kept
FROM k GROUP BY doc_id
"""


def q_acctbal_histogram_nation(sf_dir: str):
    """Per-nation equi-width histogram of account balance (the feature
    profile a binning/monitoring pass emits): 20 global bins over
    [min, max] cents, width = ceil(span/20) — all-int bin ids, so the
    per-batch bincount partials combine exactly.  Two passes: one tiny
    min/max aggregate, one streaming bincount + bounded
    (nations × bins) groupby."""
    from ray.data.aggregate import Max, Min, Sum
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def cents_t(t: pa.Table) -> pa.Table:
        c = np.round(t["c_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({"c_nationkey": t["c_nationkey"],
                         "cents": pa.array(c)})

    cc = cust.map_batches(cents_t, batch_format="pyarrow")
    mm = cc.aggregate(Min("cents", alias_name="lo"),
                      Max("cents", alias_name="hi"))
    lo, hi = int(mm["lo"]), int(mm["hi"])
    w = max(1, -(-(hi - lo + 1) // 20))

    def partial(t: pa.Table) -> pa.Table:
        b = (t["cents"].to_numpy(zero_copy_only=False) - lo) // w
        g = pd.DataFrame({"c_nationkey":
                          t["c_nationkey"].to_numpy(zero_copy_only=False),
                          "bin": b, "pn": 1}) \
            .groupby(["c_nationkey", "bin"], sort=False).sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return cc.map_batches(partial, batch_format="pyarrow") \
        .groupby(["c_nationkey", "bin"]) \
        .aggregate(Sum("pn", alias_name="cnt"))


SQL_ACCTBAL_HIST = """
WITH c AS (SELECT c_nationkey,
                  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi,
             GREATEST(1, CAST(CEIL((MAX(cents) - MIN(cents) + 1)
                                   / 20.0) AS BIGINT)) AS w
      FROM c)
SELECT c.c_nationkey, (c.cents - b.lo) // b.w AS bin,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM c, b GROUP BY 1, 2
"""


def q_local_clustering_links(sf_dir: str):
    """Per-node triangle count + local clustering coefficient over the
    pagerank_links synthetic graph: degree-ordered wedge enumeration
    with pivot identity kept, closed wedges credit all three corners
    (graph_ops.local_clustering — O(m^1.5) wedges regardless of skew).
    cc_nano is round-half-up(2·tri·1e9 / (deg·(deg−1))) in exact ints,
    so the 3-way-self-join SQL twin matches bit-for-bit."""
    from ..stages import graph_ops
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    out = graph_ops.local_clustering(
        docs.map_batches(edges, batch_format="pyarrow"))
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "tri": b["tri"],
                            "deg": b["deg"], "cc_nano": b["cc_nano"]}),
        batch_format="pyarrow")


SQL_LOCAL_CLUSTERING = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + kk.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) kk, nn),
o AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst),
sym AS (SELECT a, b FROM o UNION ALL SELECT b AS a, a AS b FROM o),
dg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS deg
       FROM sym GROUP BY a),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM o e1 JOIN o e2 ON e2.a = e1.b
      JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
cr AS (SELECT x AS v FROM t UNION ALL SELECT y FROM t
       UNION ALL SELECT z FROM t),
tc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tri FROM cr GROUP BY v)
SELECT dg.v AS doc_id, COALESCE(tc.tri, 0) AS tri, dg.deg,
       CASE WHEN dg.deg >= 2 THEN CAST(
         (2 * (2 * CAST(COALESCE(tc.tri, 0) AS HUGEINT) * 1000000000)
          + dg.deg * (dg.deg - 1))
         // (2 * dg.deg * (dg.deg - 1)) AS BIGINT)
       ELSE 0 END AS cc_nano
FROM dg LEFT JOIN tc ON tc.v = dg.v
"""


def q_fk_integrity_audit(sf_dir: str):
    """Cross-table data-quality audit (the referential-integrity gate a
    warehouse ingest runs): violation counts for orders→customer and
    lineitem→orders foreign keys (distributed bucketed ANTI-joins on
    narrow key columns), plus null-user events and empty-text
    documents (streaming filter counts).  Output is one bounded row
    per check."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    okeys = _read(sf_dir, "orders", ["o_orderkey"])
    ev = _read(sf_dir, "events", ["user_id"])
    docs = _read(sf_dir, "documents", ["text"])

    orphan_orders = relational.bucketed_semi_join(
        orders.map_batches(lambda t: pa.table({"k": t["o_custkey"]}),
                           batch_format="pyarrow"),
        cust.map_batches(lambda t: pa.table({"k": t["c_custkey"]}),
                         batch_format="pyarrow"),
        on="k", anti=True).count()
    orphan_li = relational.bucketed_semi_join(
        li.map_batches(lambda t: pa.table({"k": t["l_orderkey"]}),
                       batch_format="pyarrow"),
        okeys.map_batches(lambda t: pa.table({"k": t["o_orderkey"]}),
                          batch_format="pyarrow"),
        on="k", anti=True).count()
    null_users = ev.map_batches(
        lambda t: pa.table({"c": pa.array(
            [t["user_id"].null_count], type=pa.int64())}),
        batch_format="pyarrow").sum("c") or 0
    empty_docs = docs.map_batches(
        lambda t: pa.table({"c": pa.array(
            [int(pc.sum(pc.cast(pc.equal(
                t["text"].fill_null(""), ""), pa.int64())).as_py() or 0)
             + t["text"].null_count], type=pa.int64())}),
        batch_format="pyarrow").sum("c") or 0
    return pd.DataFrame({
        "check_name": ["orders_without_customer",
                       "lineitem_without_order",
                       "events_null_user", "documents_empty_text"],
        "violations": np.array([orphan_orders, orphan_li,
                                null_users, empty_docs],
                               dtype=np.int64)})


SQL_FK_AUDIT = """
SELECT 'orders_without_customer' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS violations
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_without_order',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'events_null_user', CAST(COUNT(*) AS BIGINT)
FROM events WHERE user_id IS NULL
UNION ALL
SELECT 'documents_empty_text', CAST(COUNT(*) AS BIGINT)
FROM documents WHERE text IS NULL OR text = ''
"""


def q_systematic_sample_events(sf_dir: str):
    """Systematic (every k-th) sampling in GLOBAL event_id order — the
    deterministic grid sample QA teams prefer over hash sampling when
    coverage must be uniform over the keyspace.  Uses the two-pass
    distributed prefix-sum (range-bucket counts → driver exclusive
    scan of ≤64 bucket totals → within-bucket cumsum), never a global
    sort: rows whose global rank is a multiple of 997 survive."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    ranked = relational.global_prefix_sum(
        ev.map_batches(one, batch_format="pyarrow"),
        order_col="event_id", value_col="one", out_col="rn")

    def pick(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        keep = (rn % 997) == 0
        t = t.filter(pa.array(keep))
        return t.select(["event_id", "user_id", "event_type", "rn"])

    return ranked.map_batches(pick, batch_format="pyarrow")


SQL_SYSTEMATIC_SAMPLE = """
SELECT event_id, user_id, event_type, rn FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (ORDER BY event_id) AS rn
  FROM events)
WHERE rn % 997 = 0
"""


def q_daily_revenue_anomalies(sf_dir: str):
    """Rolling anomaly detection on the dense daily revenue series: a
    day is anomalous when |x − mean₇| > 2·std₇ over the 7 PRIOR
    calendar days (gap-filled with 0).  The test evaluates in EXACT
    integers — (7x − S)² > 4·(7·SS − S²) with S, SS the prior-window
    cents sums — so no float sqrt/variance can diverge from the SQL
    twin.  Distributed part: the per-batch daily cents partials + one
    bounded groupby; the calendar-sized rolling pass runs on the
    bounded aggregate with Python ints (overflow-proof)."""
    from ray.data.aggregate import Sum
    ords = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        g = pd.DataFrame({"day": day, "pc_": cents}) \
            .groupby("day", sort=False)["pc_"].sum().reset_index()
        return pa.table({
            "day": pa.array(g["day"].to_numpy().astype("datetime64[us]")),
            "pc_": pa.array(g["pc_"].to_numpy(dtype=np.int64))})

    agg = ords.map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("pc_", alias_name="cents"))
    df = relational.ds_to_table(agg).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    days = pd.date_range(df["day"].min(), df["day"].max(), freq="D")
    dense = pd.DataFrame({"day": days}).merge(df, on="day", how="left")
    c = [int(x) if x == x else 0 for x in dense["cents"]]
    flags = []
    for i in range(len(c)):
        if i < 7:
            flags.append(0)
            continue
        w = c[i - 7:i]
        S, SS = sum(w), sum(x * x for x in w)
        x = c[i]
        flags.append(int((7 * x - S) ** 2 > 4 * (7 * SS - S * S)))
    return pd.DataFrame({
        "day": days,
        "revenue": np.round(np.array(c, dtype=np.float64) / 100.0, 2),
        "is_anomaly": np.array(flags, dtype=np.int64)})


SQL_DAILY_ANOMALIES = """
WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
                  MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
cal AS (SELECT CAST(unnest(generate_series(
          (SELECT lo FROM b), (SELECT hi FROM b),
          INTERVAL 1 DAY)) AS TIMESTAMP) AS day),
daily AS (SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY 1),
dense AS (SELECT cal.day, COALESCE(d.cents, 0) AS cents
          FROM cal LEFT JOIN daily d ON d.day = cal.day),
w AS (SELECT day, cents,
             SUM(CAST(cents AS HUGEINT)) OVER
               (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS s,
             SUM(CAST(cents AS HUGEINT) * cents) OVER
               (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS ss,
             COUNT(*) OVER
               (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS n
      FROM dense)
SELECT day, ROUND(cents / 100.0, 2) AS revenue,
       CASE WHEN n = 7 AND
                 (7 * CAST(cents AS HUGEINT) - s)
                 * (7 * CAST(cents AS HUGEINT) - s)
                 > 4 * (7 * ss - s * s)
            THEN 1 ELSE 0 END AS is_anomaly
FROM w
"""


def q_value_rank_distribution_events(sf_dir: str):
    """Global RANK() distribution at scale: for every DISTINCT event
    value (cents), its global rank (1 + count of strictly smaller
    values, RANK semantics over the full table) and its multiplicity —
    the exact-CDF building block (percentiles, calibration curves)
    computed WITHOUT a global row sort: distinct-value counts reduce
    via one groupby, then the two-pass range-bucket prefix sum ranks
    the (bounded-domain) distinct table.  rank = cum − cnt + 1, all
    ints."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["value"])

    def cents_count(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cents": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    dist = ev.map_batches(cents_count, batch_format="pyarrow") \
        .groupby("cents").aggregate(Sum("pn", alias_name="cnt"))
    ranked = relational.global_prefix_sum(
        dist, order_col="cents", value_col="cnt", out_col="cum")

    def fin(t: pa.Table) -> pa.Table:
        cum = t["cum"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cents": t["cents"],
                         "cnt": pa.array(cnt),
                         "rnk": pa.array(cum - cnt + 1)})

    return ranked.map_batches(fin, batch_format="pyarrow")


SQL_VALUE_RANKS = """
WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY 1)
SELECT cents, cnt,
       CAST(SUM(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
            - cnt + 1 AS BIGINT) AS rnk
FROM g
"""


def q_morton_index_points(sf_dir: str):
    """Z-order (Morton) curve index for the synthetic customer points —
    the locality-preserving key a tiled store sorts/partitions by so
    spatially-near rows land in the same file (the Hilbert/Z-order
    clustering trick every lakehouse exposes).  10-bit x and y
    interleave into a 20-bit code via vectorized shift/mask; the SQL
    twin unrolls the same 10 bit positions arithmetically.  Output is
    (key, cell count) per Morton cell at a 4-bit-truncated level so
    the result is bounded (the full code would be row-scaled)."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def morton(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (k * 7919) % 1000
        y = (k * 104729) % 1000
        z = np.zeros(len(k), dtype=np.int64)
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        cell = z >> 8                       # truncate to 12-bit cells
        u, n = np.unique(cell, return_counts=True)
        return pa.table({"zcell": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    return cust.map_batches(morton, batch_format="pyarrow") \
        .groupby("zcell").aggregate(Sum("pn", alias_name="cnt"))


def _sql_morton() -> str:
    """Unrolled bit-interleave twin of q_morton_index_points."""
    xs = " + ".join(f"(((x // {1 << i}) % 2) * {1 << (2 * i)})"
                    for i in range(10))
    ys = " + ".join(f"(((y // {1 << i}) % 2) * {1 << (2 * i + 1)})"
                    for i in range(10))
    return f"""
WITH p AS (SELECT (c_custkey * 7919) % 1000 AS x,
                  (c_custkey * 104729) % 1000 AS y FROM customer),
z AS (SELECT ({xs} + {ys}) // 256 AS zcell FROM p)
SELECT zcell, CAST(COUNT(*) AS BIGINT) AS cnt FROM z GROUP BY zcell
"""


def q_k_anonymity_audit(sf_dir: str):
    """Privacy audit: group size of every quasi-identifier combination
    (c_nationkey, c_mktsegment) with a suppression flag for cohorts
    below k=5 — the re-identifiability gate a data release runs (the
    full per-combo report, not just violators, so the result is
    non-degenerate at any scale and the suppressed fraction is
    auditable).  One bounded groupby (QI domain ≤ nations×segments),
    per-batch count partials."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_nationkey", "c_mktsegment"]) \
            .aggregate([([], "count_all")])
        return pa.table({"c_nationkey": g["c_nationkey"],
                         "c_mktsegment": g["c_mktsegment"],
                         "pn": g["count_all"].cast(pa.int64())})

    agg = cust.map_batches(partial, batch_format="pyarrow") \
        .groupby(["c_nationkey", "c_mktsegment"]) \
        .aggregate(Sum("pn", alias_name="group_size"))

    def flag(t: pa.Table) -> pa.Table:
        gs = t["group_size"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"c_nationkey": t["c_nationkey"],
                         "c_mktsegment": t["c_mktsegment"],
                         "group_size": pa.array(gs),
                         "suppress": pa.array(
                             (gs < 5).astype(np.int64))})

    return agg.map_batches(flag, batch_format="pyarrow")


SQL_K_ANONYMITY = """
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS BIGINT)
         AS suppress
FROM customer GROUP BY 1, 2
"""


def q_score_calibration_bins(sf_dir: str):
    """Model reliability diagram (calibration curve): the logreg_score
    pipeline's 6dp-rounded scores bucket into 10 equal-width bins;
    each bin reports n, positive rate and mean score — the ECE inputs
    every model-quality gate computes.  Scores quantize to EXACT
    micro-ints before summing (float means would be order-sensitive);
    positive counts are ints; both means are round-half-up micro
    ints.  Per-batch partials, one ≤10-row combine."""
    from ray.data.aggregate import Sum
    from ..stages import ml
    feats = _doc_features(sf_dir)
    scored = ml.logreg_score(feats, ["x1", "x2"], weights=[12.0, -8.0],
                             bias=2.0)

    def partial(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        micro = np.rint(s * 1e6).astype(np.int64)
        b = np.minimum(micro // 100000, 9)
        pos = (t["doc_id"].to_numpy(zero_copy_only=False) % 3 == 0) \
            .astype(np.int64)
        g = pd.DataFrame({"bin": b, "pn": 1, "pp": pos, "ps": micro}) \
            .groupby("bin", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = scored.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("pn", alias_name="n"),
                                  Sum("pp", alias_name="pos"),
                                  Sum("ps", alias_name="smicro"))

    def fin(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = t["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        sm = t["smicro"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = np.array([(2 * int(p) * 10 ** 6 + int(c)) // (2 * int(c))
                       for p, c in zip(pos, n)], dtype=np.int64)
        ms = np.array([(2 * int(s) + int(c)) // (2 * int(c))
                       for s, c in zip(sm, n)], dtype=np.int64)
        return pa.table({"bin": t["bin"], "n": pa.array(n),
                         "pos_rate_micro": pa.array(pr),
                         "mean_score_micro": pa.array(ms)})

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_CALIBRATION = """
WITH f AS (
  SELECT doc_id, n_chars / 1000.0 AS x1,
         len(string_split(text, ' ')) / 100.0 AS x2
  FROM documents),
s AS (SELECT doc_id,
             CAST(ROUND(ROUND(1.0 / (1.0 + exp(
               -(2.0 + 12.0 * x1 - 8.0 * x2))), 6) * 1000000)
               AS BIGINT) AS micro
      FROM f),
b AS (SELECT LEAST(micro // 100000, 9) AS bin,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS pos,
             micro
      FROM s)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST((2 * SUM(CAST(pos AS HUGEINT)) * 1000000 + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS pos_rate_micro,
       CAST((2 * SUM(CAST(micro AS HUGEINT)) + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS mean_score_micro
FROM b GROUP BY bin
"""


def q_doc_length_percentiles(sf_dir: str):
    """Row-wise global-CDF apply: every document gets its length's
    exact RANK-based percentile, pct_nano = round-half-up((rnk−1)·1e9
    / (N−1)) — the feature-normalization that maps a skewed column
    onto [0,1] by its own empirical CDF.  The distinct-length rank
    table builds via groupby + the range-bucket prefix sum (bounded
    value domain), broadcasts (it is domain-sized, not row-sized),
    and applies in one streaming searchsorted pass."""
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    n_total = docs.count()

    def counts(t: pa.Table) -> pa.Table:
        u, n = np.unique(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"n_chars": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    dist = docs.map_batches(counts, batch_format="pyarrow") \
        .groupby("n_chars").aggregate(Sum("pn", alias_name="cnt"))
    ranked = relational.global_prefix_sum(
        dist, order_col="n_chars", value_col="cnt", out_col="cum")
    rt = relational.ds_to_table(ranked).to_pandas()
    vals = rt["n_chars"].to_numpy(dtype=np.int64)
    rnk = (rt["cum"].to_numpy(dtype=np.int64)
           - rt["cnt"].to_numpy(dtype=np.int64) + 1)
    order = np.argsort(vals)
    # pct in exact ints (python — the table is domain-sized)
    denom = max(n_total - 1, 1)
    pct = np.array([(2 * (int(r) - 1) * 10 ** 9 + denom) // (2 * denom)
                    for r in rnk[order]], dtype=np.int64)
    ref = ray.put((vals[order], pct))

    def apply(t: pa.Table) -> pa.Table:
        v, p = relational.worker_cached(("doclen_pct", ref),
                                        lambda: ray.get(ref))
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "n_chars": pa.array(x),
                         "pct_nano": pa.array(p[np.searchsorted(v, x)])})

    return docs.map_batches(apply, batch_format="pyarrow")


SQL_DOC_PERCENTILES = """
WITH r AS (SELECT doc_id, n_chars,
                  RANK() OVER (ORDER BY n_chars) AS rnk,
                  COUNT(*) OVER () AS n
           FROM documents)
SELECT doc_id, n_chars,
       CAST((2 * (rnk - 1) * 1000000000
             + GREATEST(n - 1, 1))
            // (2 * GREATEST(n - 1, 1)) AS BIGINT) AS pct_nano
FROM r
"""


def q_churn_labels(sf_dir: str):
    """Label generation for churn modeling: a user counts as churned
    when their LAST event precedes the corpus's final 30 days.  One
    per-user max-ts groupby (per-batch max partials first), the global
    horizon from a tiny aggregate — the standard target-label pass of
    a training-data pipeline."""
    from ray.data.aggregate import Max
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts": t["ts"].to_numpy(zero_copy_only=False)})
        g = df.groupby("user_id", sort=False)["ts"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Max("ts", alias_name="last_ts"))
    hi = ev.aggregate(Max("ts", alias_name="m"))["m"]
    cut = pd.Timestamp(hi) - pd.Timedelta(days=30)
    cut64 = np.datetime64(cut, "us")

    def flag(t: pa.Table) -> pa.Table:
        last = t["last_ts"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "last_ts": t["last_ts"],
            "churned": pa.array((last < cut64).astype(np.int64))})

    return per_user.map_batches(flag, batch_format="pyarrow")


SQL_CHURN = """
WITH h AS (SELECT MAX(ts) - INTERVAL 30 DAY AS cut FROM events)
SELECT user_id, MAX(ts) AS last_ts,
       CAST(CASE WHEN MAX(ts) < (SELECT cut FROM h) THEN 1 ELSE 0 END
            AS BIGINT) AS churned
FROM events GROUP BY user_id
"""


def q_degree_assortativity_links(sf_dir: str):
    """Degree assortativity (Pearson correlation of endpoint degrees
    over undirected edges — the one-number structure probe: positive
    = hubs link hubs, negative = hub-and-spoke): every sum is an
    EXACT integer (degrees are ints; each undirected edge contributes
    both orientations), and the final coefficient evaluates the
    identical double expression as the SQL twin.  Degree attach is
    the size-guarded broadcast; per-batch int partials, one-row
    output."""
    from ray.data.aggregate import Count, Sum
    from ..stages.relational import ds_to_table, worker_cached
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        m = src != dst
        a = np.minimum(src[m], dst[m])
        b = np.maximum(src[m], dst[m])
        t = pa.table({"ea": pa.array(a), "eb": pa.array(b)})
        return t.group_by(["ea", "eb"]).aggregate([])

    und = docs.map_batches(edges, batch_format="pyarrow") \
        .groupby(["ea", "eb"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["ea", "eb"]),
                     batch_format="pyarrow").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        nn = np.concatenate(
            [t["ea"].to_numpy(zero_copy_only=False),
             t["eb"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        u, c = np.unique(nn, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    deg_t = ds_to_table(
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("pn", alias_name="deg")))
    ids = deg_t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = deg_t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(ids)
    ref = ray.put((ids[o], dv[o]))

    def sums(t: pa.Table) -> pa.Table:
        _ids, _dv = worker_cached(("assort_deg", ref),
                                  lambda: ray.get(ref))
        a = _dv[np.searchsorted(_ids, t["ea"].to_numpy(
            zero_copy_only=False).astype(np.int64))]
        b = _dv[np.searchsorted(_ids, t["eb"].to_numpy(
            zero_copy_only=False).astype(np.int64))]
        # both orientations of each undirected edge
        x = np.concatenate([a, b]).astype(np.int64)
        y = np.concatenate([b, a]).astype(np.int64)
        return pa.table({
            "m": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([int(x.sum())], type=pa.int64()),
            "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
            "sxy": pa.array([int((x * y).sum())], type=pa.int64())})

    p = ds_to_table(und.map_batches(sums, batch_format="pyarrow")) \
        .to_pandas()
    m = float(p["m"].sum())
    sx = float(p["sx"].sum())
    sxx = float(p["sxx"].sum())
    sxy = float(p["sxy"].sum())
    # symmetric: sy = sx, syy = sxx
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    return pd.DataFrame({"m_directed": [np.int64(m)],
                         "assortativity": [np.round(num / den, 6)]})


SQL_ASSORTATIVITY = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + kk.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) kk, nn),
o AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst),
sym AS (SELECT a, b FROM o UNION ALL SELECT b AS a, a AS b FROM o),
dg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS deg
       FROM sym GROUP BY a),
e AS (SELECT da.deg AS x, db.deg AS y
      FROM sym JOIN dg da ON da.v = sym.a JOIN dg db ON db.v = sym.b),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM e)
SELECT m AS m_directed,
       ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
  AS assortativity
FROM s
"""


def q_dedup_keep_best(sf_dir: str):
    """Quality-keyed near-dup resolution: the exact Jaccard >= 0.8
    cluster graph (recall-complete AllPairs prefix join) resolved by
    keeping each cluster's HIGHEST-QUALITY member (max n_chars, doc_id
    tiebreak) instead of the min-id convention — the policy a training
    corpus actually wants (keep the longest/cleanest copy, drop the
    rest).  Cluster labels attach their quality via a bucketed join;
    the per-cluster argmax runs in bounded map_groups; the drop set
    (duplicates only) anti-semi-joins back against the corpus."""
    docs = _read(sf_dir, "documents",
                 ["doc_id", "text", "n_chars"]).repartition(32)
    pairs = dd.allpairs_jaccard(
        docs.select_columns(["doc_id", "text"]), key_col="doc_id",
        text_col="text", jaccard_threshold=0.8, shingle_k=5)
    labels = dd.connected_components(pairs)
    if hasattr(labels, "materialize"):
        labels = labels.materialize()

    meta = docs.map_batches(
        lambda t: pa.table({"node": t["doc_id"],
                            "n_chars": t["n_chars"]}),
        batch_format="pyarrow")
    nl = relational.bucketed_hash_join(labels, meta, on="node")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pa.array(relational.stable_bucket(t["label"], 64)))

    def drops(df: pd.DataFrame) -> pa.Table:
        # per coarse BUCKET (vectorized over all its clusters — never a
        # python call per cluster): keep-best = first row per label
        # under (n_chars DESC, node ASC); everything else drops
        df = df.sort_values(["label", "n_chars", "node"],
                            ascending=[True, False, True],
                            kind="mergesort")
        dup = df.duplicated("label", keep="first").to_numpy()
        return pa.table({"doc_id": pa.array(
            df["node"].to_numpy(dtype=np.int64)[dup])})

    drop_ds = nl.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(drops, batch_format="pandas")
    kept = relational.semi_join(docs, drop_ds, on="doc_id", anti=True)
    return kept.select_columns(["doc_id"])


SQL_DEDUP_KEEP_BEST = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
        FROM documents)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS ni
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT i.a, i.b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a
  JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.8),
sym AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges),
reach(node, anc) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.anc
),
comp AS (SELECT node, LEAST(node, MIN(anc)) AS c
         FROM reach GROUP BY node),
m AS (SELECT comp.node, comp.c, d.n_chars
      FROM comp JOIN documents d ON d.doc_id = comp.node),
best AS (SELECT node FROM (
  SELECT node, ROW_NUMBER() OVER (PARTITION BY c
      ORDER BY n_chars DESC, node) AS rn FROM m) WHERE rn = 1)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp)
UNION ALL
SELECT node AS doc_id FROM best
"""


def q_readability_scores(sf_dir: str):
    """Per-document Flesch-style readability (the curriculum /
    difficulty signal a data-mixing pass uses): words (\\S+ runs),
    sentences (nonempty [.!?]+ segments, trim charset pinned to the
    twin), vowel-group syllable proxy, and
    flesch = 206.835 − 1.015·(w/s) − 84.6·(vg/w) rounded to 4dp —
    pure per-row arrow RE2 counts + per-row double arithmetic (no
    aggregation, so no float-order risk), zero shuffle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ws = " \t\n\r\x0b\x0c"

    def f(t: pa.Table) -> pa.Table:
        col = t["text"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks == 1 else \
                pa.concat_arrays(col.chunks)
        w = pc.count_substring_regex(col, pattern=r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        vg = pc.count_substring_regex(col, pattern="[aeiouAEIOU]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        parts = pc.split_pattern_regex(col, pattern="[.!?]+")
        offs = parts.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lens = pc.utf8_length(pc.utf8_trim(parts.values, characters=ws)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ne = (lens > 0).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(ne)])
        s = cs[offs[1:]] - cs[offs[:-1]]
        wd = np.maximum(w, 1).astype(np.float64)
        sd = np.maximum(s, 1).astype(np.float64)
        flesch = np.round(206.835 - 1.015 * (w / sd) - 84.6 * (vg / wd),
                          4)
        return pa.table({"doc_id": t["doc_id"], "words": pa.array(w),
                         "sentences": pa.array(s),
                         "vowel_groups": pa.array(vg),
                         "flesch": pa.array(flesch)})

    return docs.map_batches(f, batch_format="pyarrow")


SQL_READABILITY = """
WITH f AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS words,
         CAST(len(list_filter(list_transform(
           regexp_split_to_array(text, '[.!?]+'),
           x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)
                     || chr(11) || chr(12))),
           x -> length(x) > 0)) AS BIGINT) AS sentences,
         CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT)
           AS vowel_groups
  FROM documents)
SELECT doc_id, words, sentences, vowel_groups,
       ROUND(206.835
             - 1.015 * (words / CAST(GREATEST(sentences, 1) AS DOUBLE))
             - 84.6 * (vowel_groups / CAST(GREATEST(words, 1) AS DOUBLE)),
             4) AS flesch
FROM f
"""


def q_type_affinity_lift(sf_dir: str):
    """Market-basket affinity between part TYPES within an order:
    lift(a,b) = P(a,b) / (P(a)·P(b)) over distinct-type baskets —
    the cross-sell / co-occurrence-strength analysis.  One bucketed
    lineitem×part join attaches types; basket pair counts ride the
    cooccurrence kernel (per-batch distinct partials, vectorized pair
    explosion, type domain is bounded so the cap is safely off);
    singles and the basket count come from the same distinct partials.
    All counts are exact ints; lift divides identically both sides."""
    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    j = relational.bucketed_hash_join(
        li.map_batches(lambda t: pa.table(
            {"p_partkey": t["l_partkey"], "l_orderkey": t["l_orderkey"]}),
            batch_format="pyarrow"),
        part, on="p_partkey").map_batches(
            lambda t: t.select(["l_orderkey", "p_type"]),
            batch_format="pyarrow").materialize()

    pairs = relational.cooccurrence_pairs(
        j, key_col="l_orderkey", val_col="p_type",
        max_vals_per_key=None)

    def distinct_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "p_type"]).aggregate([])

    def single_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("p_type").aggregate([([], "count_all")])
        return pa.table({"p_type": g["p_type"],
                         "pn": g["count_all"].cast(pa.int64())})

    # distinct (order, type) rows reduce once; reused for singles + N
    from ray.data.aggregate import Count
    dot = j.map_batches(distinct_partial, batch_format="pyarrow") \
        .groupby(["l_orderkey", "p_type"]) \
        .aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["l_orderkey", "p_type"]),
                     batch_format="pyarrow").materialize()
    singles = relational.ds_to_table(
        dot.map_batches(single_partial, batch_format="pyarrow")
        .groupby("p_type").aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas().set_index("p_type")["n"]
    n_orders = int(dot.map_batches(
        lambda t: pa.table({"k": pc.unique(t["l_orderkey"])}),
        batch_format="pyarrow")
        .groupby("k").aggregate(Count(alias_name="_n")).count())

    pt = relational.ds_to_table(pairs).to_pandas()
    na = pt["a"].map(singles).to_numpy(dtype=np.int64)
    nb = pt["b"].map(singles).to_numpy(dtype=np.int64)
    nab = pt["n_keys"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "type_a": pt["a"], "type_b": pt["b"], "n_ab": nab,
        "lift": np.round(nab.astype(np.float64) * n_orders
                         / (na.astype(np.float64) * nb), 6)})


SQL_TYPE_AFFINITY = """
WITH jt AS (SELECT DISTINCT l.l_orderkey, p.p_type
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM jt),
s AS (SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n FROM jt GROUP BY 1),
pr AS (SELECT x.p_type AS type_a, y.p_type AS type_b,
              CAST(COUNT(*) AS BIGINT) AS n_ab
       FROM jt x JOIN jt y
         ON x.l_orderkey = y.l_orderkey AND x.p_type < y.p_type
       GROUP BY 1, 2)
SELECT pr.type_a, pr.type_b, pr.n_ab,
       ROUND(CAST(pr.n_ab AS DOUBLE) * nn.n
             / (CAST(sa.n AS DOUBLE) * sb.n), 6) AS lift
FROM pr JOIN s sa ON sa.p_type = pr.type_a
JOIN s sb ON sb.p_type = pr.type_b, nn
"""


def q_adaptive_join_detects_skew(sf_dir: str):
    """Skew-ADAPTIVE join plan selection end-to-end: the same
    80 %-one-key workload as salted_join_hot_key, but the engine
    detects the scorching key itself (streaming heavy-key partials)
    and routes through the salted plan automatically — the
    measure-then-salt loop folded into one operator
    (relational.adaptive_join).  The SQL twin is the plain join:
    plan choice must never change results."""
    ev = _read(sf_dir, "events", ["event_id", "user_id"])

    def derive(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        k = np.where(eid % 5 == 0, uid, 0).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "k": pa.array(k)})

    left = ev.map_batches(derive, batch_format="pyarrow")

    def users(t: pa.Table) -> pa.Table:
        u = pc.unique(t["user_id"])
        return pa.table({"k": u, "label": pc.multiply(u, 7)})

    from ray.data.aggregate import Max
    right = ev.map_batches(users, batch_format="pyarrow") \
        .groupby("k").aggregate(Max("label", alias_name="label"))
    out = relational.adaptive_join(left, right, on="k",
                                   hot_fraction=0.02).to_pandas()
    return out[["event_id", "k", "label"]].astype({"label": "int64"})


SQL_ADAPTIVE_JOIN = """
WITH l AS (
  SELECT event_id,
         CASE WHEN event_id % 5 = 0 THEN user_id ELSE 0 END AS k
  FROM events),
r AS (SELECT DISTINCT user_id AS k, user_id * 7 AS label FROM events)
SELECT l.event_id, l.k, CAST(r.label AS BIGINT) AS label
FROM l JOIN r ON r.k = l.k
"""


def q_negative_samples_docs(sf_dir: str):
    """Deterministic negative sampling for contrastive training: each
    doc gets 4 pseudo-random negatives ((doc_id·7919 + j·337) % N,
    self-collisions skip to the next slot) — the in-batch-negatives
    prep an embedding trainer consumes.  Pure per-batch vectorized
    map, zero shuffle; the arithmetic twin reproduces it exactly."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def negs(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 4)
        j = np.tile(np.arange(1, 5, dtype=np.int64), len(d))
        neg = (src * 7919 + j * 337) % n
        neg = np.where(neg == src, (neg + 1) % n, neg)
        return pa.table({"doc_id": pa.array(src),
                         "j": pa.array(j),
                         "neg_id": pa.array(neg)})

    return docs.map_batches(negs, batch_format="pyarrow")


SQL_NEGATIVE_SAMPLES = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
r AS (SELECT d.doc_id, jj.j,
             (d.doc_id * 7919 + jj.j * 337) % nn.n AS neg0
      FROM documents d, (SELECT unnest([1, 2, 3, 4]) AS j) jj, nn)
SELECT doc_id, j,
       CASE WHEN neg0 = doc_id
            THEN (neg0 + 1) % (SELECT n FROM nn)
            ELSE neg0 END AS neg_id
FROM r
"""


def q_preference_pairs(sf_dir: str):
    """DPO/RLHF-style preference-pair prep: within each source, docs
    order by quality (n_chars DESC, doc_id ASC) and each doc pairs
    with its immediate lower-quality neighbor as (chosen, rejected) —
    adjacent-quality pairs are the hard negatives preference tuning
    wants.  One source-bucket shuffle, vectorized sort + shift per
    bucket (the grouped-LAG shape)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pa.array(relational.stable_bucket(t["source"], 32)))

    def pairs(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        same = df["source"].to_numpy()[1:] == df["source"].to_numpy()[:-1]
        chosen = df["doc_id"].to_numpy(dtype=np.int64)[:-1][same]
        rejected = df["doc_id"].to_numpy(dtype=np.int64)[1:][same]
        src = df["source"].to_numpy()[:-1][same]
        return pa.table({"source": pa.array(src),
                         "chosen": pa.array(chosen),
                         "rejected": pa.array(rejected)})

    return docs.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(pairs, batch_format="pandas")


SQL_PREFERENCE_PAIRS = """
WITH o AS (
  SELECT source, doc_id,
         LEAD(doc_id) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS nxt
  FROM documents)
SELECT source, doc_id AS chosen, nxt AS rejected
FROM o WHERE nxt IS NOT NULL
"""


def q_ipc_source_stats(sf_dir: str):
    """Arrow IPC (Feather v2) source/sink parity: documents round-trip
    through the zero-copy interchange format (written once per input
    fingerprint to /tmp, same cache discipline as the JSONL twin),
    then aggregate per lang FROM THE IPC READ — the oracle aggregates
    the original parquet, so any writer/reader corruption breaks the
    hash."""
    import glob
    import hashlib
    import os
    import uuid

    from ray.data.aggregate import Sum

    from ..io import codecs

    h = hashlib.md5()
    for f in sorted(glob.glob(os.path.join(sf_dir, "documents*"))):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:"
                 f"{st.st_mtime_ns}".encode())
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/prclz_ray_ipc_{tag}_{h.hexdigest()[:12]}"
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        codecs.write_ipc(_read(sf_dir, "documents",
                               ["doc_id", "lang", "n_chars"]), tmp)
        try:
            os.rename(tmp, out)
        except OSError:            # concurrent run won the rename
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    docs = codecs.read_ipc(out)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t["lang"], "nc": t["n_chars"]}) \
            .group_by("lang").aggregate([("nc", "sum"),
                                         ([], "count_all")])
        return pa.table({"lang": g["lang"],
                         "pc_": g["nc_sum"].cast(pa.int64()),
                         "pn": g["count_all"].cast(pa.int64())})

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("pn", alias_name="n_docs"),
                                   Sum("pc_", alias_name="total_chars"))


SQL_IPC_STATS = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def q_fulfillment_latency_histogram(sf_dir: str):
    """Order-fulfillment latency distribution: days from order date to
    the order's FIRST ship date, histogrammed — the supply-chain SLA
    profile.  One bucketed orderkey join whose per-bucket combine
    collapses straight to latency-day count partials (≤ days-domain
    rows leave each bucket), then a bounded day groupby."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_min(t: pa.Table) -> pa.Table:
        g = pa.table({"o_orderkey": t["l_orderkey"],
                      "ship": t["l_shipdate"]}) \
            .group_by("o_orderkey").aggregate([("ship", "min")])
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "ship": g["ship_min"]})

    def comb(t: pa.Table) -> pa.Table:
        # per bucket: finish the per-order min (orderkey is bucket-local)
        # then collapse to latency-day partials
        g = t.group_by("o_orderkey").aggregate([("ship", "min"),
                                                ("o_orderdate", "min")])
        s = g["ship_min"].to_numpy(zero_copy_only=False)
        o = g["o_orderdate_min"].to_numpy(zero_copy_only=False)
        days = ((s - o) // np.timedelta64(1, "D")).astype(np.int64)
        u, c = np.unique(days, return_counts=True)
        return pa.table({"latency_days": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    j = relational.bucketed_hash_join(
        li.map_batches(li_min, batch_format="pyarrow"), orders,
        on="o_orderkey", combine=comb)
    return j.groupby("latency_days").aggregate(
        Sum("pn", alias_name="n_orders"))


SQL_FULFILLMENT = """
WITH f AS (SELECT l_orderkey, MIN(l_shipdate) AS ship
           FROM lineitem GROUP BY 1)
SELECT CAST(date_diff('day', o.o_orderdate, f.ship) AS BIGINT)
         AS latency_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM f JOIN orders o ON o.o_orderkey = f.l_orderkey
GROUP BY 1
"""


def q_gini_customer_revenue(sf_dir: str):
    """Gini coefficient of customer revenue concentration — computed
    EXACTLY at any scale WITHOUT a global sort: per-customer revenue
    cents reduce once, the distinct-revenue-value count table ranks
    via the range-bucket prefix sum, and Σ rank·x over a tie block is
    v·(c·p + c·(c−1)/2) (tie-invariant, all ints) — so
    G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n evaluates the identical double
    expression as the SQL twin.  Output in nano units."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def per_cust(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_custkey":
                          t["o_custkey"].to_numpy(zero_copy_only=False),
                          "pc_": cents}) \
            .groupby("o_custkey", sort=False)["pc_"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = orders.map_batches(per_cust, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("pc_", alias_name="r"))

    def val_counts(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["r"].to_numpy(zero_copy_only=False)
                         .astype(np.int64), return_counts=True)
        return pa.table({"r": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    dist = rev.map_batches(val_counts, batch_format="pyarrow") \
        .groupby("r").aggregate(Sum("pn", alias_name="cnt"))
    ranked = relational.ds_to_table(relational.global_prefix_sum(
        dist, order_col="r", value_col="cnt", out_col="cum")).to_pandas()
    v = ranked["r"].to_numpy(dtype=np.int64)
    c = ranked["cnt"].to_numpy(dtype=np.int64)
    cum = ranked["cum"].to_numpy(dtype=np.int64)
    p = cum - c + 1                    # 1-based start rank of each block
    # exact ints via python (values × ranks can pass int64 at 100×)
    swx = sum(int(vi) * (int(ci) * int(pi)
                         + int(ci) * (int(ci) - 1) // 2)
              for vi, ci, pi in zip(v, c, p))
    sx = sum(int(vi) * int(ci) for vi, ci in zip(v, c))
    n = int(c.sum())
    gini = 2.0 * float(swx) / (float(n) * float(sx)) \
        - (float(n) + 1.0) / float(n)
    return pd.DataFrame({"n_customers": np.array([n], dtype=np.int64),
                         "gini_nano": np.array(
                             [int(round(gini * 1e9))], dtype=np.int64)})


SQL_GINI = """
WITH rev AS (SELECT o_custkey,
                    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS r
             FROM orders GROUP BY 1),
d AS (SELECT r, COUNT(*) AS c FROM rev GROUP BY r),
w AS (SELECT r, c,
             SUM(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
               - c + 1 AS p
      FROM d),
s AS (SELECT SUM(CAST(r AS HUGEINT) * (c * p + c * (c - 1) // 2))
               AS swx,
             SUM(CAST(r AS HUGEINT) * c) AS sx,
             CAST(SUM(c) AS BIGINT) AS n
      FROM w)
SELECT n AS n_customers,
       CAST(ROUND((2.0 * CAST(swx AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                   - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
                  * 1000000000) AS BIGINT) AS gini_nano
FROM s
"""


def q_fano_event_type(sf_dir: str):
    """Burstiness profile: the Fano factor (variance/mean of DAILY
    event counts over the dense calendar) per event type — the
    over-dispersion probe that separates steady telemetry from bursty
    incident traffic.  Daily counts are exact ints; variance and mean
    derive from integer power sums over the (types × days)-bounded
    aggregate with the identical double expression both sides."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        g = pd.DataFrame({"event_type":
                          t["event_type"].to_numpy(zero_copy_only=False),
                          "day": day, "pn": 1}) \
            .groupby(["event_type", "day"], sort=False)["pn"] \
            .sum().reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "day": pa.array(g["day"].to_numpy()
                            .astype("datetime64[us]")),
            "pn": pa.array(g["pn"].to_numpy(dtype=np.int64))})

    agg = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    days = pd.date_range(agg["day"].min(), agg["day"].max(), freq="D")
    n_days = len(days)
    out = []
    for et, g in agg.groupby("event_type"):
        cnts = g["n"].to_numpy(dtype=np.int64)
        s = int(cnts.sum())                     # zero days contribute 0
        ss = int((cnts * cnts).sum())
        mean = float(s) / n_days
        var = (float(n_days) * float(ss) - float(s) * float(s)) \
            / (float(n_days) * float(n_days))
        out.append({"event_type": et, "n_events": s,
                    "fano": round(var / mean, 6)})
    return pd.DataFrame(out).sort_values("event_type") \
        .reset_index(drop=True)


SQL_FANO = """
WITH b AS (SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS lo,
                  CAST(MAX(CAST(ts AS DATE)) AS DATE) AS hi
           FROM events),
nd AS (SELECT date_diff('day', lo, hi) + 1 AS n FROM b),
d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
s AS (SELECT event_type,
             SUM(n) AS s, SUM(CAST(n AS HUGEINT) * n) AS ss
      FROM d GROUP BY 1)
SELECT s.event_type, CAST(s.s AS BIGINT) AS n_events,
       ROUND(((CAST(nd.n AS DOUBLE) * CAST(s.ss AS DOUBLE)
               - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE))
              / (CAST(nd.n AS DOUBLE) * CAST(nd.n AS DOUBLE)))
             / (CAST(s.s AS DOUBLE) / CAST(nd.n AS DOUBLE)), 6)
         AS fano
FROM s, nd ORDER BY s.event_type
"""


def q_source_overlap_jaccard(sf_dir: str):
    """Corpus-comparison matrix: vocabulary Jaccard between every pair
    of SOURCES (which crawls/feeds cover the same language surface) —
    J = |Va∩Vb| / |Va∪Vb| over each source's distinct word set.
    Distinct (word, source) rows reduce once; pair intersections ride
    the cooccurrence kernel keyed by word (source domain is bounded,
    so pairs are |sources|²); per-source vocabulary sizes come from
    the same distinct rows.  Exact ints, mirrored division."""
    from ray.data.aggregate import Count, Sum
    docs = _read(sf_dir, "documents", ["source", "text"])

    def words(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], pattern=" ")
        idx = pc.list_parent_indices(parts)
        flat = pc.list_flatten(parts)
        src = t["source"].take(idx)
        g = pa.table({"word": flat, "source": src}) \
            .group_by(["word", "source"]).aggregate([])
        return g

    ws = docs.map_batches(words, batch_format="pyarrow") \
        .groupby(["word", "source"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["word", "source"]),
                     batch_format="pyarrow").materialize()

    pairs = relational.ds_to_table(relational.cooccurrence_pairs(
        ws, key_col="word", val_col="source",
        max_vals_per_key=None)).to_pandas()

    def single_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([([], "count_all")])
        return pa.table({"source": g["source"],
                         "pn": g["count_all"].cast(pa.int64())})

    sizes = relational.ds_to_table(
        ws.map_batches(single_partial, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("pn", alias_name="n"))) \
        .to_pandas().set_index("source")["n"]

    na = pairs["a"].map(sizes).to_numpy(dtype=np.int64)
    nb = pairs["b"].map(sizes).to_numpy(dtype=np.int64)
    ni = pairs["n_keys"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "source_a": pairs["a"], "source_b": pairs["b"],
        "n_shared": ni,
        "jaccard": np.round(ni.astype(np.float64)
                            / (na + nb - ni).astype(np.float64), 6)})


SQL_SOURCE_OVERLAP = """
WITH ws AS (SELECT DISTINCT x AS word, source
            FROM (SELECT unnest(string_split(text, ' ')) AS x, source
                  FROM documents)),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
       FROM ws GROUP BY 1),
pr AS (SELECT x.source AS source_a, y.source AS source_b,
              CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM ws x JOIN ws y
         ON x.word = y.word AND x.source < y.source
       GROUP BY 1, 2)
SELECT pr.source_a, pr.source_b, pr.n_shared,
       ROUND(CAST(pr.n_shared AS DOUBLE)
             / (sa.n + sb.n - pr.n_shared), 6) AS jaccard
FROM pr JOIN sz sa ON sa.source = pr.source_a
JOIN sz sb ON sb.source = pr.source_b
"""


# --------------------------------------------------- round-4C operator batch


def q_benford_leading_digit(sf_dir: str):
    """Benford's-law fraud/synthetic-data audit: the leading-digit
    distribution of order totals vs the log10(1+1/d) expectation — the
    standard first screen for fabricated numeric columns in an ingest
    QC gate.  Digit extraction is exact integer repeated-division (no
    float log10 at the boundary 10^k values); counts reduce to 9 rows
    via one bounded groupby; shares are single exact-int divisions."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        d = cents.copy()
        while (d >= 10).any():       # ≤ 19 vectorized passes for int64
            big = d >= 10
            d[big] //= 10
        u, c = np.unique(d, return_counts=True)
        return pa.table({"digit": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    g = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("digit").aggregate(Sum("pn", alias_name="n"))).to_pandas()
    g = g.sort_values("digit").reset_index(drop=True)
    tot = int(g["n"].sum())
    dig = g["digit"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "digit": g["digit"].to_numpy(dtype=np.int64),
        "n": g["n"].to_numpy(dtype=np.int64),
        "obs_share": np.round(g["n"].to_numpy(np.float64) / tot, 6),
        "benford_share": np.round(np.log10(1.0 + 1.0 / dig), 6)})


SQL_BENFORD = """
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        AS digit FROM c),
g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT SUM(n) AS tot FROM g)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS obs_share,
       ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
         AS benford_share
FROM g, t ORDER BY digit
"""


def q_hhi_nation_revenue(sf_dir: str):
    """Market-concentration audit: per-nation Herfindahl–Hirschman index
    of customer revenue shares, HHI = Σrᵢ² / (Σrᵢ)² over each nation's
    customers.  Revenue squares overflow int64 under batch summation at
    100× (r ≤ ~5·10⁸ cents ⇒ r² ≤ 2.5·10¹⁷ per element), so partials
    carry 128-bit sums as (hi, lo) = (r² >> 32, r² & 0xFFFFFFFF) int64
    column pairs — exact at any scale — recombined as python ints on
    the 25-row driver finish.  The per-nation reduce rides the join's
    combine hook (customer key lands in exactly one bucket), so the
    downstream exchange moves ≤ buckets × 25 rows."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def per_cust(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_custkey":
                          t["o_custkey"].to_numpy(zero_copy_only=False),
                          "pr": cents}) \
            .groupby("o_custkey", sort=False)["pr"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = orders.map_batches(per_cust, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("pr", alias_name="r"))
    cust2 = cust.map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nationkey"]),
        batch_format="pyarrow")

    def combine(tbl: pa.Table) -> pa.Table:
        r = tbl["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = r * r
        df = pd.DataFrame({
            "c_nationkey": tbl["c_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "psr": r, "phi": rr >> 32, "plo": rr & 0xFFFFFFFF,
            "pnc": np.ones(len(r), dtype=np.int64)})
        g = df.groupby("c_nationkey", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    j = relational.bucketed_hash_join(rev, cust2, on="o_custkey",
                                      combine=combine)
    agg = relational.ds_to_table(
        j.groupby("c_nationkey").aggregate(
            Sum("psr", alias_name="sr"), Sum("phi", alias_name="hi"),
            Sum("plo", alias_name="lo"), Sum("pnc", alias_name="nc"))
    ).to_pandas().sort_values("c_nationkey").reset_index(drop=True)
    hhi = []
    for _, row in agg.iterrows():
        s2 = int(row["hi"]) * (1 << 32) + int(row["lo"])   # exact 128-bit
        sr = int(row["sr"])
        hhi.append(int(round(float(s2) / (float(sr) * float(sr)) * 1e9)))
    return pd.DataFrame({
        "c_nationkey": agg["c_nationkey"].to_numpy(dtype=np.int64),
        "n_customers": agg["nc"].to_numpy(dtype=np.int64),
        "hhi_nano": np.array(hhi, dtype=np.int64)})


SQL_HHI = """
WITH rev AS (SELECT o_custkey,
                    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS r
             FROM orders GROUP BY 1),
j AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, r
      FROM rev JOIN customer ON c_custkey = o_custkey),
s AS (SELECT c_nationkey, SUM(CAST(r AS HUGEINT) * r) AS s2,
             SUM(CAST(r AS HUGEINT)) AS sr,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM j GROUP BY 1)
SELECT c_nationkey, n_customers,
       CAST(ROUND(CAST(s2 AS DOUBLE)
                  / (CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
                  * 1000000000) AS BIGINT) AS hhi_nano
FROM s ORDER BY c_nationkey
"""


def q_event_entropy_user(sf_dir: str):
    """Behavioral-diversity scoring: Shannon entropy of each user's
    event-type distribution, top 100 users by volume (bot/monoculture
    accounts score near 0, diverse organic users near log2(|types|)).
    Counts stay exact ints through both exchanges; the per-user finish
    is the coarse-bucket vectorized pattern (one C-speed pandas groupby
    per bucket, rows pre-sorted so the float reduction order is
    pinned); entropy = log2(n) − Σc·log2(c)/n evaluates the identical
    double expression as the SQL twin.  The (n desc, user asc) prune is
    a strict total order, so per-bucket head(100) is exact."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"user_id":
                          t["user_id"].to_numpy(zero_copy_only=False),
                          "event_type":
                          t["event_type"].to_numpy(zero_copy_only=False),
                          "pn": 1}) \
            .groupby(["user_id", "event_type"], sort=False)["pn"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["user_id", "event_type"]) \
        .aggregate(Sum("pn", alias_name="c"))

    def tag(t: pa.Table) -> pa.Table:
        b = relational.stable_bucket(t["user_id"], 64)
        return t.append_column("_b", pa.array(b))

    def finish(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "event_type"])
        c = df["c"].to_numpy(dtype=np.float64)
        key = df["user_id"]
        n = df.groupby(key, sort=True)["c"].sum()
        s = pd.Series(c * np.log2(c), index=df.index) \
            .groupby(key, sort=True).sum()
        nv = n.to_numpy(dtype=np.float64)
        ent = np.log2(nv) - s.to_numpy() / nv
        out = pd.DataFrame({"user_id": n.index.to_numpy(dtype=np.int64),
                            "n_events": n.to_numpy(dtype=np.int64),
                            "entropy": np.round(ent, 4)})
        out = out.sort_values(["n_events", "user_id"],
                              ascending=[False, True]).head(100)
        return pa.Table.from_pandas(out, preserve_index=False)

    per_user = cnt.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(finish, batch_format="pandas")
    res = relational.ds_to_table(per_user).to_pandas()
    return res.sort_values(["n_events", "user_id"],
                           ascending=[False, True]).head(100) \
        .reset_index(drop=True)


SQL_EVENT_ENTROPY = """
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
u AS (SELECT user_id, SUM(c) AS n,
             SUM(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE))) AS s
      FROM c GROUP BY 1)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       ROUND(LOG2(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 4)
         AS entropy
FROM u ORDER BY n DESC, user_id LIMIT 100
"""


def q_open_orders_per_day(sf_dir: str):
    """Concurrent-interval sweep: how many orders are IN FLIGHT (first
    line-item shipment through last) on each change day — the classic
    interval-overlap count done as a ±1 delta sweep + distributed
    prefix sum, NEVER an interval×day explode (at 100 TB an order
    spanning 90 days must not emit 90 rows) and never a join: both
    interval endpoints derive from lineitem alone, so ONE coarse
    orderkey-bucket stage finishes the per-order (min, max) and emits
    day-bounded ±1 counts.  The running count reuses the range-bucket
    prefix-sum kernel over the materialized (days-bounded) delta
    table.  Exact ints end to end."""
    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def per_order_partial(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        g = pd.DataFrame({"o_orderkey":
                          t["l_orderkey"].to_numpy(zero_copy_only=False),
                          "ps": day, "pm": day}) \
            .groupby("o_orderkey", sort=False) \
            .agg(ps=("ps", "min"), pm=("pm", "max")).reset_index()
        out = pa.Table.from_pandas(g, preserve_index=False)
        return out.append_column("_ob", pa.array(
            relational.stable_bucket(out["o_orderkey"], 64)))

    def bucket_deltas(df: pd.DataFrame) -> pa.Table:
        # all partials of an order land in this one bucket: finish the
        # (min, max), emit ±1 counts — output is days-bounded
        g = df.groupby("o_orderkey", sort=False) \
            .agg(ps=("ps", "min"), pm=("pm", "max"))
        start = g["ps"].to_numpy(dtype=np.int64)
        end = g["pm"].to_numpy(dtype=np.int64) + 1   # half-open
        su, sc = np.unique(start, return_counts=True)
        eu, ec = np.unique(end, return_counts=True)
        return pa.table({
            "day": pa.array(np.concatenate([su, eu])),
            "pd_": pa.array(np.concatenate(
                [sc.astype(np.int64), -ec.astype(np.int64)]))})

    deltas = li.map_batches(per_order_partial, batch_format="pyarrow") \
        .groupby("_ob").map_groups(bucket_deltas, batch_format="pandas") \
        .groupby("day").aggregate(Sum("pd_", alias_name="delta")) \
        .materialize()      # days-bounded; prefix sum consumes it twice
    cum = relational.global_prefix_sum(deltas, order_col="day",
                                       value_col="delta", out_col="open")
    out = relational.ds_to_table(cum).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    return pd.DataFrame({
        "day": out["day"].to_numpy(dtype=np.int64)
        .astype("datetime64[D]").astype("datetime64[us]"),
        "open_orders": out["open"].to_numpy(dtype=np.int64)})


SQL_OPEN_ORDERS = """
WITH iv AS (SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS s,
                   MAX(CAST(l_shipdate AS DATE)) AS m
            FROM lineitem GROUP BY 1),
dl AS (SELECT s AS day, 1 AS delta FROM iv
       UNION ALL
       SELECT CAST(m + INTERVAL 1 DAY AS DATE) AS day, -1 AS delta
       FROM iv),
g AS (SELECT day, SUM(delta) AS delta FROM dl GROUP BY 1)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS open_orders
FROM g ORDER BY day
"""


def q_weighted_median_price(sf_dir: str):
    """Weighted median (quantity-weighted) of line-item price per
    return flag — EXACT at any scale via the value-distribution trick:
    per-batch (flag, cents) weight partials reduce to a table bounded
    by the VALUE DOMAIN (distinct prices × 3 flags, independent of row
    count); the driver finds the smallest value whose doubled running
    weight reaches the total.  No global sort, no quantile sketch
    approximation."""
    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        w = np.round(t["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        g = pd.DataFrame({"l_returnflag":
                          t["l_returnflag"].to_numpy(zero_copy_only=False),
                          "cents": cents, "pw": w}) \
            .groupby(["l_returnflag", "cents"], sort=False)["pw"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    vw = li.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "cents"]) \
        .aggregate(Sum("pw", alias_name="w"))
    df = relational.ds_to_table(vw).to_pandas() \
        .sort_values(["l_returnflag", "cents"])
    rows = []
    for flag, g in df.groupby("l_returnflag", sort=True):
        w = g["w"].to_numpy(dtype=np.int64)
        v = g["cents"].to_numpy(dtype=np.int64)
        cum = np.cumsum(w)
        tot = int(cum[-1])
        med = int(v[relational.exact_quantile_idx(cum, 1, 2)])
        rows.append({"l_returnflag": flag, "total_w": tot,
                     "wmedian_cents": med})
    return pd.DataFrame(rows)


SQL_WEIGHTED_MEDIAN = """
WITH vw AS (SELECT l_returnflag,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
            FROM lineitem GROUP BY 1, 2),
c AS (SELECT l_returnflag, cents, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM vw)
SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS total_w,
       CAST(MIN(CASE WHEN 2 * cum >= tot THEN cents END) AS BIGINT)
         AS wmedian_cents
FROM c GROUP BY 1 ORDER BY 1
"""


def q_event_trigrams(sf_dir: str):
    """Sequential-pattern mining: the 50 most common consecutive
    event-type TRIGRAMS across user journeys (the order-3 Markov
    evidence behind funnel design).  One coarse-bucket shuffle on
    user_id; per-bucket vectorized sort + double groupby-shift builds
    trigrams at C speed; count partials reduce via one bounded groupby
    (≤ |types|³ rows); the (n desc, trigram asc) prune is a strict
    total order so per-batch head(50) is exact."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        b = relational.stable_bucket(t["user_id"], 64)
        return t.append_column("_b", pa.array(b))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)["event_type"]
        t2 = g.shift(-1)
        t3 = g.shift(-2)
        ok = t3.notna().to_numpy() & t2.notna().to_numpy()
        tri = (df["event_type"].to_numpy()[ok].astype(object) + ">"
               + t2.to_numpy()[ok].astype(object) + ">"
               + t3.to_numpy()[ok].astype(object))
        u, c = np.unique(tri.astype(str), return_counts=True)
        return pa.table({"trigram": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    cnt = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pandas") \
        .groupby("trigram").aggregate(Sum("pn", alias_name="n"))

    def prune(t: pa.Table) -> pa.Table:
        d = t.to_pandas().sort_values(["n", "trigram"],
                                      ascending=[False, True]).head(50)
        return pa.Table.from_pandas(d, preserve_index=False)

    res = relational.ds_to_table(
        cnt.map_batches(prune, batch_format="pyarrow")).to_pandas()
    return res.sort_values(["n", "trigram"], ascending=[False, True]) \
        .head(50).reset_index(drop=True)


SQL_EVENT_TRIGRAMS = """
WITH s AS (SELECT event_type AS t1,
                  LEAD(event_type, 1) OVER w AS t2,
                  LEAD(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1 || '>' || t2 || '>' || t3 AS trigram,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, trigram LIMIT 50
"""


def q_kaplan_meier_retention(sf_dir: str):
    """Kaplan–Meier survival of customer lifetime (days from first to
    last order), right-censored at the corpus horizon: a customer whose
    last order is within 90 days of the max order date is still-alive
    (censored), otherwise it churned at its observed duration.
    Per-customer first/last reduce once (exact day ints) and map
    straight into (duration, churned) count partials — nothing
    customer-scaled ever reaches the driver; only the KM table
    (bounded by DISTINCT durations) does, where at-risk counts and the
    survival cumulative product run with the identical multiply order
    as the SQL window PRODUCT (sequential over t ascending)."""
    from ray.data.aggregate import Max, Min, Sum
    ev = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        g = pd.DataFrame({"o_custkey":
                          t["o_custkey"].to_numpy(zero_copy_only=False),
                          "pf": day, "pl": day}) \
            .groupby("o_custkey", sort=False) \
            .agg(pf=("pf", "min"), pl=("pl", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    # horizon from a tiny bounds pass (== max over customers of l)
    mx = int(_read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda t: pa.table({"d": pa.array(
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64))}),
        batch_format="pyarrow").aggregate(Max("d", alias_name="m"))["m"])

    def to_km_partials(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        l = t["l"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"t": l - f,
                          "pd_": ((mx - l) >= 90).astype(np.int64),
                          "pc_": 1}) \
            .groupby("t", sort=False) \
            .agg(pd_=("pd_", "sum"), pc_=("pc_", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    km = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Min("pf", alias_name="f"),
                                        Max("pl", alias_name="l"))
        .map_batches(to_km_partials, batch_format="pyarrow")
        .groupby("t").aggregate(Sum("pd_", alias_name="d"),
                                Sum("pc_", alias_name="c"))
    ).to_pandas().sort_values("t").reset_index(drop=True)
    n = int(km["c"].sum())
    seen_before = np.cumsum(km["c"].to_numpy(np.int64)) \
        - km["c"].to_numpy(np.int64)
    r = n - seen_before                      # at risk: duration >= t
    d = km["d"].to_numpy(dtype=np.int64)
    surv = np.cumprod(1.0 - d.astype(np.float64) / r.astype(np.float64))
    keep = d > 0
    return pd.DataFrame({"t_days": km["t"].to_numpy(np.int64)[keep],
                         "at_risk": r[keep], "events": d[keep],
                         "survival": np.round(surv[keep], 6)})


SQL_KAPLAN_MEIER = """
WITH u AS (SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS f,
                  MAX(CAST(o_orderdate AS DATE)) AS l
           FROM orders GROUP BY 1),
m AS (SELECT MAX(l) AS mx FROM u),
d AS (SELECT date_diff('day', f, l) AS t,
             CASE WHEN date_diff('day', l, mx) >= 90
                  THEN 1 ELSE 0 END AS ev
      FROM u, m),
tot AS (SELECT COUNT(*) AS n FROM d),
g AS (SELECT t, SUM(ev) AS d, COUNT(*) AS c FROM d GROUP BY t),
k AS (SELECT t, d,
             n - (SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  - c) AS r
      FROM g, tot),
s AS (SELECT t, d, r,
             PRODUCT(1.0 - CAST(d AS DOUBLE) / r)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS surv
      FROM k)
SELECT CAST(t AS BIGINT) AS t_days, CAST(r AS BIGINT) AS at_risk,
       CAST(d AS BIGINT) AS events, ROUND(surv, 6) AS survival
FROM s WHERE d > 0 ORDER BY t
"""


def q_part_copurchase_pairs(sf_dir: str):
    """Market-basket mining on the order contents: the 50 part pairs
    most often bought together in one order.  Rides the cooccurrence
    kernel (distinct (order, part) partials → one order-bucket shuffle
    → vectorized triangular pair unranking → bounded (a, b) groupby);
    parts-per-order is naturally small so the per-key explosion is
    k(k−1)/2 ≈ 21 rows max.  (n desc, part_a, part_b) is a strict
    total order, so the per-batch top-50 prune is exact."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    pairs = relational.cooccurrence_pairs(li, key_col="l_orderkey",
                                          val_col="l_partkey")

    def prune(t: pa.Table) -> pa.Table:
        d = t.to_pandas().sort_values(
            ["n_keys", "a", "b"],
            ascending=[False, True, True]).head(50)
        return pa.Table.from_pandas(d, preserve_index=False)

    res = relational.ds_to_table(
        pairs.map_batches(prune, batch_format="pyarrow")).to_pandas()
    res = res.sort_values(["n_keys", "a", "b"],
                          ascending=[False, True, True]).head(50) \
        .reset_index(drop=True)
    return res.rename(columns={"a": "part_a", "b": "part_b",
                               "n_keys": "n_orders"})


SQL_COPURCHASE = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM d x JOIN d y ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey < y.l_partkey
GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 50
"""


def q_nation_revenue_share_in_region(sf_dir: str):
    """Percent-of-parent rollup: each nation's share of its REGION's
    order revenue.  The 25-row nation⋈region dimension broadcasts onto
    customer; the customer⋈orders join pre-aggregates per (region,
    nation) inside the bucket tasks (≤ buckets × 25 rows exchanged);
    cents stay exact ints until the single share division on the
    25-row driver finish."""
    from ray.data.aggregate import Sum
    nation = _read_table(sf_dir, "nation",
                         ["n_nationkey", "n_name", "n_regionkey"])
    region = _read_table(sf_dir, "region", ["r_regionkey", "r_name"])
    dim = nation.to_pandas().merge(
        region.to_pandas(), left_on="n_regionkey",
        right_on="r_regionkey")[["n_nationkey", "n_name", "r_name"]]
    dim = pa.Table.from_pandas(
        dim.rename(columns={"n_nationkey": "c_nationkey"}),
        preserve_index=False)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    enriched = relational.broadcast_join(cust, dim, on="c_nationkey") \
        .map_batches(lambda t: t.select(["c_custkey", "n_name", "r_name"])
                     .rename_columns(["o_custkey", "n_name", "r_name"]),
                     batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def combine(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        g = pd.DataFrame({"n_name": t["n_name"].to_numpy(
            zero_copy_only=False),
            "r_name": t["r_name"].to_numpy(zero_copy_only=False),
            "pc_": cents}) \
            .groupby(["r_name", "n_name"], sort=False)["pc_"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        relational.bucketed_hash_join(orders, enriched, on="o_custkey",
                                      combine=combine)
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("pc_", alias_name="cents"))).to_pandas()
    reg = agg.groupby("r_name")["cents"].transform("sum")
    out = pd.DataFrame({
        "r_name": agg["r_name"], "n_name": agg["n_name"],
        "revenue": np.round(agg["cents"].to_numpy(np.int64) / 100.0, 2),
        "share_pct": np.round(agg["cents"].to_numpy(np.float64)
                              / reg.to_numpy(np.float64) * 100.0, 6)})
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


SQL_NATION_SHARE = """
WITH a AS (SELECT r_name, n_name,
                  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           JOIN region ON r_regionkey = n_regionkey
           GROUP BY 1, 2),
r AS (SELECT r_name, SUM(cents) AS rc FROM a GROUP BY 1)
SELECT a.r_name, a.n_name,
       ROUND(CAST(a.cents AS DOUBLE) / 100.0, 2) AS revenue,
       ROUND(CAST(a.cents AS DOUBLE) / CAST(r.rc AS DOUBLE) * 100.0, 6)
         AS share_pct
FROM a JOIN r ON a.r_name = r.r_name
ORDER BY a.r_name, a.n_name
"""


def q_psi_price_drift(sf_dir: str):
    """Population Stability Index — the standard train/serve drift
    gate — between the first and second calendar half of orders, over
    10 equal-width price bins.  Bin assignment is pure integer
    arithmetic ((c−lo)·10 // (hi−lo+1), no float boundary ambiguity);
    counts are Laplace-smoothed exact ints; only the final
    (pa−pb)·ln(pa/pb) contribution is floating point.  Two tiny
    bounds passes + one bounded (bin × half) groupby — no shuffle of
    row-scaled data."""
    from ray.data.aggregate import Max, Min, Sum
    ords = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"cents": pa.array(cents),
                         "day": pa.array(day)})

    base = ords.map_batches(prep, batch_format="pyarrow")
    b = base.aggregate(Min("cents", alias_name="clo"),
                       Max("cents", alias_name="chi"),
                       Min("day", alias_name="dlo"),
                       Max("day", alias_name="dhi"))
    clo, chi = int(b["clo"]), int(b["chi"])
    mid = (int(b["dlo"]) + int(b["dhi"])) // 2

    def partial(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        d = t["day"].to_numpy(zero_copy_only=False)
        bin_ = (c - clo) * 10 // (chi - clo + 1)
        half = (d > mid).astype(np.int64)        # 0 = first, 1 = second
        g = pd.DataFrame({"bin": bin_, "half": half, "pn": 1}) \
            .groupby(["bin", "half"], sort=False)["pn"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        base.map_batches(partial, batch_format="pyarrow")
        .groupby(["bin", "half"]).aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    grid = pd.MultiIndex.from_product(
        [range(10), (0, 1)], names=["bin", "half"]).to_frame(index=False)
    m = grid.merge(agg, on=["bin", "half"], how="left")
    m["n"] = m["n"].fillna(0).astype(np.int64)
    w = m.pivot(index="bin", columns="half", values="n")
    na = w[0].to_numpy(np.int64)
    nb = w[1].to_numpy(np.int64)
    pa_ = (na + 1.0) / (na.sum() + 10.0)         # Laplace +1 per bin
    pb_ = (nb + 1.0) / (nb.sum() + 10.0)
    contrib = (pa_ - pb_) * np.log(pa_ / pb_)
    return pd.DataFrame({"bin": np.arange(10, dtype=np.int64),
                         "n_first": na, "n_second": nb,
                         "psi_contrib": np.round(contrib, 6)})


SQL_PSI = """
WITH p AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                  date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS d
           FROM orders),
b AS (SELECT MIN(c) AS clo, MAX(c) AS chi,
             (MIN(d) + MAX(d)) // 2 AS mid FROM p),
h AS (SELECT (c - clo) * 10 // (chi - clo + 1) AS bin,
             CASE WHEN d > mid THEN 1 ELSE 0 END AS half
      FROM p, b),
bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
g AS (SELECT bins.bin,
             SUM(CASE WHEN h.half = 0 THEN 1 ELSE 0 END) AS n_first,
             SUM(CASE WHEN h.half = 1 THEN 1 ELSE 0 END) AS n_second
      FROM bins LEFT JOIN h ON h.bin = bins.bin GROUP BY 1),
t AS (SELECT SUM(n_first) AS ta, SUM(n_second) AS tb FROM g)
SELECT CAST(g.bin AS BIGINT) AS bin,
       CAST(g.n_first AS BIGINT) AS n_first,
       CAST(g.n_second AS BIGINT) AS n_second,
       ROUND(((g.n_first + 1.0) / (t.ta + 10.0)
              - (g.n_second + 1.0) / (t.tb + 10.0))
             * LN(((g.n_first + 1.0) / (t.ta + 10.0))
                  / ((g.n_second + 1.0) / (t.tb + 10.0))), 6)
         AS psi_contrib
FROM g, t ORDER BY g.bin
"""


def q_activity_bitmap_users(sf_dir: str):
    """Per-user activity bitmap: a single int64 whose bit i is set iff
    the user was active i days before the corpus horizon (i ≤ 62) —
    the compact retention feature a recommender precomputes instead of
    63 boolean columns.  A bitmap OR of distinct single-bit values IS
    their integer sum, so the whole reduce is one exact-int groupby
    Sum (max value 2⁶³−1 fits int64); active-day count is the same
    distinct row count.  No bit-twiddling UDF crosses the wire."""
    from ray.data.aggregate import Count, Max, Sum
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        # 0-or-1 row per batch; empty blocks emit nothing (a bare .max()
        # on a zero-row block would raise)
        d = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"d": pa.array(d[:0] if len(d) == 0
                                       else d.max(keepdims=True))})

    mx = int(ev.map_batches(day_partial, batch_format="pyarrow")
             .aggregate(Max("d", alias_name="m"))["m"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        idx = mx - day
        keep = idx <= 62
        g = pa.table({"user_id": t["user_id"].take(
            pa.array(np.nonzero(keep)[0])),
            "idx": pa.array(idx[keep])}) \
            .group_by(["user_id", "idx"]).aggregate([])
        return g

    distinct = ev.map_batches(distinct_partial, batch_format="pyarrow") \
        .groupby(["user_id", "idx"]).aggregate(Count())

    def to_bits(t: pa.Table) -> pa.Table:
        bit = np.int64(1) << t["idx"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pd.DataFrame({"user_id":
                          t["user_id"].to_numpy(zero_copy_only=False),
                          "pm": bit, "pa_": 1}) \
            .groupby("user_id", sort=False) \
            .agg(pm=("pm", "sum"), pa_=("pa_", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        distinct.map_batches(to_bits, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("pm", alias_name="activity_mask"),
                   Sum("pa_", alias_name="n_active_days"))
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    return out.astype({"activity_mask": np.int64,
                       "n_active_days": np.int64})


SQL_ACTIVITY_BITMAP = """
WITH m AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events),
d AS (SELECT DISTINCT user_id,
             date_diff('day', CAST(ts AS DATE), mx) AS idx
      FROM events, m
      WHERE date_diff('day', CAST(ts AS DATE), mx) <= 62)
SELECT user_id,
       CAST(SUM(1::BIGINT << CAST(idx AS INT)) AS BIGINT)
         AS activity_mask,
       CAST(COUNT(*) AS BIGINT) AS n_active_days
FROM d GROUP BY 1 ORDER BY 1
"""


def q_late_events_watermark(sf_dir: str):
    """Streaming watermark semantics replayed over the log: an event is
    LATE iff its event time is more than 10 minutes behind the
    high-water event time among everything that ARRIVED before it
    (arrival order = event_id) — the allowed-lateness rule of every
    streaming engine's window operator.  The watermark is a global
    running max over arrival order, computed with the range-bucket
    prefix-MAX kernel (no single-node sort); late flags then reduce
    into tumbling 1-hour windows with exact int counts."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "ts_us": pa.array(t["ts"].to_numpy(zero_copy_only=False)
                              .astype("datetime64[us]").astype(np.int64))})

    wm = relational.global_prefix_max(
        ev.map_batches(prep, batch_format="pyarrow"),
        order_col="event_id", value_col="ts_us", out_col="wm")

    HOUR = 3_600_000_000
    LATENESS = 600_000_000          # 10 min in µs

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        w = t["wm"].to_numpy(zero_copy_only=False)
        hour = ts // HOUR * HOUR
        late = (ts < w - LATENESS).astype(np.int64)
        g = pd.DataFrame({"h": hour, "pn": 1, "pl": late}) \
            .groupby("h", sort=False) \
            .agg(pn=("pn", "sum"), pl=("pl", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        wm.map_batches(partial, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("pn", alias_name="n_events"),
                                Sum("pl", alias_name="n_late"))
    ).to_pandas().sort_values("h").reset_index(drop=True)
    return pd.DataFrame({
        "window_start": out["h"].to_numpy(np.int64)
        .astype("datetime64[us]"),
        "n_events": out["n_events"].to_numpy(np.int64),
        "n_late": out["n_late"].to_numpy(np.int64)})


SQL_LATE_EVENTS = """
WITH w AS (SELECT ts,
                  MAX(ts) OVER (ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS wm
           FROM events)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ts < wm - INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY 1 ORDER BY 1
"""


def q_first_touch_attribution(sf_dir: str):
    """Windowed first-touch attribution: each purchase credits the
    user's EARLIEST click in the 7 days up to the purchase — the
    marketing-attribution primitive (as-of joins answer \"latest state
    BEFORE\"; this is \"first event AFTER a window opens\").  Runs on
    the distributed as-of join with direction='forward' from the window
    start, tolerance bounding the window length, and an event-id
    tie-break so equal-timestamp clicks resolve deterministically.
    Purchases with no click in window drop (inner semantics)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def mk_purchases(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        f = t.filter(m)
        ts = f["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        return pa.table({
            "purchase_id": f["event_id"], "user_id": f["user_id"],
            "purchase_ts": pa.array(ts),
            "anchor_ts": pa.array(ts - np.timedelta64(7, "D"))})

    def mk_clicks(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "click")
        f = t.filter(m)
        ts = f["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        return pa.table({
            "click_id": f["event_id"], "user_id": f["user_id"],
            "click_ts": pa.array(ts), "anchor_ts": pa.array(ts)})

    j = relational.asof_join(
        ev.map_batches(mk_purchases, batch_format="pyarrow"),
        ev.map_batches(mk_clicks, batch_format="pyarrow"),
        on="anchor_ts", by="user_id", direction="forward",
        tolerance=pd.Timedelta(days=7), right_order_cols=["click_id"])

    def finish(t: pa.Table) -> pa.Table:
        pts = t["purchase_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cts = t["click_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"purchase_id": t["purchase_id"],
                         "user_id": t["user_id"],
                         "click_id": t["click_id"],
                         "latency_us": pa.array(pts - cts)})

    return relational.ds_to_table(
        j.map_batches(finish, batch_format="pyarrow")).to_pandas() \
        .sort_values("purchase_id").reset_index(drop=True)


SQL_FIRST_TOUCH = """
WITH j AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         c.event_id AS click_id,
         date_diff('microsecond', c.ts, p.ts) AS latency_us,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts, c.event_id) AS rn
  FROM events p
  JOIN events c ON c.user_id = p.user_id AND c.event_type = 'click'
               AND c.ts >= p.ts - INTERVAL 7 DAY AND c.ts <= p.ts
  WHERE p.event_type = 'purchase')
SELECT purchase_id, user_id, click_id, latency_us
FROM j WHERE rn = 1 ORDER BY purchase_id
"""


def q_graph_reciprocity(sf_dir: str):
    """Directed-graph reciprocity: the fraction of distinct non-loop
    edges (u→v) whose reverse (v→u) also exists — the standard
    social-vs-web graph diagnostic.  Each edge maps to its unordered
    pair key with a direction flag; distinct (pair, dir) partials
    reduce through ONE pair-bucket shuffle where a vectorized groupby
    counts pairs carrying both directions.  Exact ints; the ratio is a
    single mirrored division."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        keep = src != dst
        src, dst = src[keep], dst[keep]
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        fwd = (src < dst).astype(np.int64)      # dir bit within the pair
        g = pd.DataFrame({"lo": lo, "hi": hi, "fwd": fwd}) \
            .drop_duplicates()
        g["_pb"] = ((g["lo"].to_numpy(np.int64) * 2654435761
                     + g["hi"].to_numpy(np.int64)) % 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(["lo", "hi", "fwd"])
        g = d.groupby(["lo", "hi"], sort=False)["fwd"].agg(["count"])
        ndir = g["count"].to_numpy(np.int64)    # 1 or 2 directions
        m = int(ndir.sum())                     # distinct directed edges
        recip = int((ndir == 2).sum()) * 2      # both directions count
        return pa.table({"m": pa.array([m], type=pa.int64()),
                         "recip": pa.array([recip], type=pa.int64())})

    agg = relational.ds_to_table(
        docs.map_batches(edges, batch_format="pyarrow")
        .groupby("_pb").map_groups(per_bucket, batch_format="pandas")
    ).to_pandas()                   # ≤ 64 one-row bucket partials
    m = int(agg["m"].sum())
    recip = int(agg["recip"].sum())
    return pd.DataFrame({
        "n_edges": np.array([m], dtype=np.int64),
        "n_reciprocal": np.array([recip], dtype=np.int64),
        "reciprocity": np.array(
            [round(float(recip) / float(m), 6)], dtype=np.float64)})


SQL_RECIPROCITY = """
WITH nn AS (SELECT COUNT(*) AS cnt FROM documents),
e2 AS (SELECT DISTINCT src, dst FROM (
        SELECT doc_id AS src,
               (doc_id * 7919 + k * 104729) % cnt AS dst
        FROM documents, nn, (SELECT unnest([1, 2, 3]) AS k) t)
       WHERE src <> dst),
r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reciprocal
      FROM e2 a JOIN e2 b ON a.src = b.dst AND a.dst = b.src),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e2)
SELECT t.n_edges, r.n_reciprocal,
       ROUND(CAST(r.n_reciprocal AS DOUBLE)
             / CAST(t.n_edges AS DOUBLE), 6) AS reciprocity
FROM t, r
"""


def q_twap_user_value(sf_dir: str):
    """Time-weighted average value per user (the TWAP/metering
    primitive: each reading holds until the next one): weights are
    exact microsecond gaps from LEAD, values quantize to micro-units,
    and the value×duration products — up to ~10²¹, past int64 — are
    BUILT in (hi, lo) split form (v·(dh·2³²+dl) with v < 2³¹ keeps
    every intermediate inside int64) and ride that split through the
    groupby; the final division evaluates the identical double
    expression as the SQL twin (hi·2³² + lo stays under 2⁵³ per
    component, so the doubles are bit-identical).  One coarse-bucket
    shuffle (grouped_lag) + one bounded per-user groupby."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    led = relational.grouped_lag(ev, key_col="user_id", ts_col="ts",
                                 order_col="event_id",
                                 lag_cols=["event_id"], lead=True,
                                 carry_cols=["value"])

    def partial(t: pa.Table) -> pa.Table:
        gap = t["gap_us"].to_numpy(zero_copy_only=False)
        keep = ~np.isnan(gap.astype(np.float64))    # last event: no hold
        dt = gap[keep].astype(np.int64)
        v = np.round(t["value"].to_numpy(zero_copy_only=False)[keep]
                     * 1e6).astype(np.int64)
        if len(v) and np.abs(v).max() >= 1 << 31:
            # abs(): a negative v of magnitude >= 2^31 would wrap the
            # split multiply SILENTLY (v.max() alone never fires when
            # every value is negative)
            raise ValueError("twap v overflows the 31-bit split bound")
        # v·dt reaches ~1.3e21 — past int64 — so the product itself is
        # built in split form: with dt = dh·2³² + dl and v < 2³¹ every
        # intermediate (v·dh, v·dl ≤ 2⁶³−1) stays in int64
        dh, dl = dt >> 32, dt & 0xFFFFFFFF
        vdl = v * dl
        hi = v * dh + (vdl >> 32)
        lo = vdl & 0xFFFFFFFF
        g = pd.DataFrame({"user_id":
                          t["user_id"].to_numpy(
                              zero_copy_only=False)[keep],
                          "phi": hi, "plo": lo, "pw": dt}) \
            .groupby("user_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        led.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Sum("phi", alias_name="hi"),
                                      Sum("plo", alias_name="lo"),
                                      Sum("pw", alias_name="w"))
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    num = agg["hi"].to_numpy(np.float64) * 4294967296.0 \
        + agg["lo"].to_numpy(np.float64)
    return pd.DataFrame({
        "user_id": agg["user_id"].to_numpy(np.int64),
        "held_us": agg["w"].to_numpy(np.int64),
        "twap": np.round(num / agg["w"].to_numpy(np.float64) / 1e6, 4)})


SQL_TWAP = """
WITH l AS (SELECT user_id,
                  CAST(ROUND(value * 1000000) AS BIGINT) AS v,
                  date_diff('microsecond', ts,
                            LEAD(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                    AS dt
           FROM events),
p AS (SELECT user_id, dt,
             CAST(v AS HUGEINT) * dt AS prod
      FROM l WHERE dt IS NOT NULL),
s AS (SELECT user_id,
             SUM(prod // 4294967296) AS hi,
             SUM(prod % 4294967296) AS lo,
             SUM(dt) AS w
      FROM p GROUP BY 1)
SELECT user_id, CAST(w AS BIGINT) AS held_us,
       ROUND((CAST(hi AS DOUBLE) * 4294967296.0 + CAST(lo AS DOUBLE))
             / CAST(w AS DOUBLE) / 1000000.0, 4) AS twap
FROM s ORDER BY user_id
"""


def q_largest_id_gaps(sf_dir: str):
    """Sequence-gap audit: the 100 largest missing ranges in the
    click-stream's event-id subsequence (the islands-and-gaps pattern —
    which id ranges carry no clicks / did ingestion drop a shard?).
    Ids range-bucket (order-preserving); each bucket finds its internal
    gaps vectorized (diff on the sorted uniques) and prunes to its top
    100 under the strict (len desc, start asc) total order, emitting
    also its (min, max) edge row; the driver stitches ONLY the ≤
    buckets cross-boundary gaps and re-prunes.  Nothing row-scaled
    leaves a bucket."""
    import pyarrow.dataset as pads
    ev = _read(sf_dir, "events", ["event_id"],
               filter=pads.field("event_type") == "click")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_pb", pa.array(
            (t["event_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64) >> 14)))       # 16k-id ranges

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        ids = np.unique(df["event_id"].to_numpy(np.int64))
        d = np.diff(ids)
        gi = np.nonzero(d > 1)[0]
        gaps = pd.DataFrame({
            "gap_start": ids[gi] + 1,
            "gap_len": d[gi] - 1,
            "edge": np.zeros(len(gi), dtype=np.int64)})
        gaps = gaps.sort_values(["gap_len", "gap_start"],
                                ascending=[False, True]).head(100)
        edge = pd.DataFrame({"gap_start": [int(ids[0])],
                             "gap_len": [int(ids[-1])],
                             "edge": [1]})     # (min, max) marker row
        return pa.Table.from_pandas(pd.concat([gaps, edge]),
                                    preserve_index=False)

    parts = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_pb").map_groups(per_bucket, batch_format="pandas")
    ).to_pandas()
    inner = parts[parts["edge"] == 0][["gap_start", "gap_len"]]
    edges = parts[parts["edge"] == 1].rename(
        columns={"gap_start": "mn", "gap_len": "mx"}) \
        .sort_values("mn")
    mx_prev = edges["mx"].to_numpy(np.int64)[:-1]
    mn_next = edges["mn"].to_numpy(np.int64)[1:]
    blen = mn_next - mx_prev - 1
    k = blen > 0
    boundary = pd.DataFrame({"gap_start": mx_prev[k] + 1,
                             "gap_len": blen[k]})
    out = pd.concat([inner, boundary]) \
        .sort_values(["gap_len", "gap_start"],
                     ascending=[False, True]).head(100) \
        .reset_index(drop=True)
    return out.astype({"gap_start": np.int64, "gap_len": np.int64})


SQL_ID_GAPS = """
WITH ids AS (SELECT DISTINCT event_id AS id FROM events
             WHERE event_type = 'click'),
g AS (SELECT id + 1 AS gap_start,
             LEAD(id) OVER (ORDER BY id) - id - 1 AS gap_len
      FROM ids)
SELECT gap_start, gap_len FROM g WHERE gap_len > 0
ORDER BY gap_len DESC, gap_start LIMIT 100
"""


def q_equidepth_deciles_price(sf_dir: str):
    """Equi-depth (equal-count) decile histogram of line-item price —
    the query-planner statistics primitive equi-WIDTH histograms can't
    replace on skewed data.  Boundaries come EXACTLY from the value-
    distribution table (bounded by the value domain, independent of row
    count) under the pure-integer rule 10·cum ≥ decile·N (no float
    quantile ambiguity); per-bin counts are differences of the same
    running counts.  No sort, no sketch."""
    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pc_": pa.array(c.astype(np.int64))})

    vc = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("pc_", alias_name="c"))
    ).to_pandas().sort_values("v").reset_index(drop=True)
    cum = np.cumsum(vc["c"].to_numpy(np.int64))
    v = vc["v"].to_numpy(np.int64)
    rows = []
    prev_cum = 0
    for d in range(1, 11):
        i = relational.exact_quantile_idx(cum, d, 10)
        rows.append({"decile": d, "hi_cents": int(v[i]),
                     "n": int(cum[i] - prev_cum)})
        prev_cum = int(cum[i])
    return pd.DataFrame(rows).astype(
        {"decile": np.int64, "hi_cents": np.int64, "n": np.int64})


SQL_EQUIDEPTH = """
WITH vc AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1),
w AS (SELECT v, c,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER () AS n
      FROM vc),
q AS (SELECT unnest(generate_series(1, 10)) AS decile),
b AS (SELECT q.decile, MIN(w.v) AS hi_cents
      FROM q JOIN w ON 10 * w.cum >= q.decile * w.n GROUP BY 1),
cb AS (SELECT b.decile, b.hi_cents, w.cum
       FROM b JOIN w ON w.v = b.hi_cents)
SELECT decile, hi_cents,
       CAST(cum - COALESCE(LAG(cum) OVER (ORDER BY decile), 0)
            AS BIGINT) AS n
FROM cb ORDER BY decile
"""


def q_trailing_30d_revenue(sf_dir: str):
    """RANGE-frame window (vs the ROWS frames elsewhere in the
    registry): per customer per order DAY, revenue over the trailing
    30-day interval [day−30, day] — peers at the same date aggregate
    together, which a ROWS frame cannot express.  Per-(customer, day)
    cents reduce once; inside each customer bucket the trailing sum is
    ONE global searchsorted on a composite (customer·K + day) key over
    the bucket-wide cumsum (no per-customer Python loop): the composite
    span K exceeds the day range, so a probe can never cross into the
    previous customer's segment.  Exact ints end to end."""
    from ray.data.aggregate import Sum
    ords = _read(sf_dir, "orders",
                 ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_custkey":
                          t["o_custkey"].to_numpy(zero_copy_only=False),
                          "day": day, "pc_": cents}) \
            .groupby(["o_custkey", "day"], sort=False)["pc_"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ords.map_batches(partial, batch_format="pyarrow") \
        .groupby(["o_custkey", "day"]) \
        .aggregate(Sum("pc_", alias_name="cents"))

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_cb", pa.array(
            relational.stable_bucket(t["o_custkey"], 64)))

    def trailing(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["o_custkey", "day"])
        cust = df["o_custkey"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        dmin = int(day.min())
        dnorm = day - dmin + 31                  # ≥ 31, no underflow
        K = int(dnorm.max()) + 64
        comp = cust * K + dnorm                  # sorted by construction
        cum = np.cumsum(cents)
        lo = np.searchsorted(comp, cust * K + (dnorm - 30), side="left")
        rev30 = cum - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        return pa.table({
            "o_custkey": pa.array(cust),
            "day": pa.array(day.astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "rev30_cents": pa.array(rev30.astype(np.int64))})

    return relational.ds_to_table(
        daily.map_batches(tag, batch_format="pyarrow")
        .groupby("_cb").map_groups(trailing, batch_format="pandas")
    ).to_pandas().sort_values(["o_custkey", "day"]).reset_index(drop=True)


SQL_TRAILING_30D = """
WITH d AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS cents
           FROM orders GROUP BY 1, 2)
SELECT o_custkey, CAST(day AS TIMESTAMP) AS day,
       CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                             RANGE BETWEEN INTERVAL 30 DAY PRECEDING
                                   AND CURRENT ROW) AS BIGINT)
         AS rev30_cents
FROM d ORDER BY o_custkey, day
"""


def q_winsorized_mean_acctbal(sf_dir: str):
    """Winsorized mean — the robust-statistics clip at exact p5/p95
    (outlier-resistant pipelines clip, they don't drop): both bounds
    come from the value-distribution table under the pure-integer rule
    20·cum ≥ k·N (k = 1, 19), then one streaming pass clips and
    reduces per-nation micro-int sums.  Mean stays exact ints until the
    single division."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def vparts(t: pa.Table) -> pa.Table:
        v = np.round(t["c_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pc_": pa.array(c.astype(np.int64))})

    vc = relational.ds_to_table(
        cust.map_batches(vparts, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("pc_", alias_name="c"))
    ).to_pandas().sort_values("v").reset_index(drop=True)
    cum = np.cumsum(vc["c"].to_numpy(np.int64))
    v = vc["v"].to_numpy(np.int64)
    lo_b = int(v[relational.exact_quantile_idx(cum, 1, 20)])
    hi_b = int(v[relational.exact_quantile_idx(cum, 19, 20)])

    def clipped(t: pa.Table) -> pa.Table:
        x = np.round(t["c_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        x = np.clip(x, lo_b, hi_b)
        g = pd.DataFrame({"c_nationkey":
                          t["c_nationkey"].to_numpy(zero_copy_only=False)
                          .astype(np.int64),
                          "ps": x, "pn": 1}) \
            .groupby("c_nationkey", sort=False) \
            .agg(ps=("ps", "sum"), pn=("pn", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        cust.map_batches(clipped, batch_format="pyarrow")
        .groupby("c_nationkey").aggregate(Sum("ps", alias_name="s"),
                                          Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("c_nationkey").reset_index(drop=True)
    return pd.DataFrame({
        "c_nationkey": agg["c_nationkey"].to_numpy(np.int64),
        "n_customers": agg["n"].to_numpy(np.int64),
        "lo_cents": np.full(len(agg), lo_b, dtype=np.int64),
        "hi_cents": np.full(len(agg), hi_b, dtype=np.int64),
        "winsorized_mean": np.round(
            agg["s"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64)
            / 100.0, 4)})


SQL_WINSORIZED = """
WITH vc AS (SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM customer GROUP BY 1),
w AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS cum, SUM(c) OVER () AS n
      FROM vc),
b AS (SELECT (SELECT MIN(v) FROM w WHERE 20 * cum >= 1 * n) AS lo,
             (SELECT MIN(v) FROM w WHERE 20 * cum >= 19 * n) AS hi),
cl AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
              LEAST(GREATEST(CAST(ROUND(c_acctbal * 100) AS BIGINT),
                             b.lo), b.hi) AS x, b.lo, b.hi
       FROM customer, b)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(lo) AS BIGINT) AS lo_cents,
       CAST(MIN(hi) AS BIGINT) AS hi_cents,
       ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*) / 100.0, 4)
         AS winsorized_mean
FROM cl GROUP BY 1 ORDER BY 1
"""


def q_skewness_acctbal_nation(sf_dir: str):
    """Per-nation distribution skewness from EXACT integer power sums —
    the third-moment member of the power-sum family (variance/Fano/
    assortativity are second-moment).  Cubes of cents reach ~1.3·10¹⁸
    (per element inside int64, but NOT under batch summation), so Σx³
    rides the (hi, lo) 128-bit split; x can be negative (acctbal), and
    the arithmetic->floor shift / nonneg mask decomposition stays exact
    for negatives (p = (p>>32)·2³² + (p & 2³²−1) is the floor/mod
    identity).  The final skew evaluates the identical double
    expression as the SQL twin."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.round(t["c_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        x2 = x * x
        x3 = x2 * x                      # |x| ≤ ~1.1e6 → |x³| ≤ 1.4e18
        g = pd.DataFrame({"c_nationkey":
                          t["c_nationkey"].to_numpy(zero_copy_only=False)
                          .astype(np.int64),
                          "ps1": x, "ps2": x2,
                          "ph3": x3 >> 32, "pl3": x3 & 0xFFFFFFFF,
                          "pn": 1}) \
            .groupby("c_nationkey", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey").aggregate(
            Sum("ps1", alias_name="s1"), Sum("ps2", alias_name="s2"),
            Sum("ph3", alias_name="h3"), Sum("pl3", alias_name="l3"),
            Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("c_nationkey").reset_index(drop=True)
    rows = []
    for _, r in agg.iterrows():
        n = float(int(r["n"]))
        s1 = float(int(r["s1"]))
        s2 = float(int(r["s2"]))
        s3 = float(int(r["h3"]) * (1 << 32) + int(r["l3"]))
        mu = s1 / n
        m2 = s2 / n - mu * mu
        # association mirrors the SQL text exactly (3·μ·(s2/n), not
        # (3·μ·s2)/n) so the doubles are bit-identical, not 1-ulp off
        m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
        # zero variance (single customer / all-equal balances): the
        # SQL twin's x/0.0 is NULL in DuckDB, not a crash — mirror it
        sk = None if m2 == 0.0 else round(m3 / m2 ** 1.5, 6)
        rows.append({"c_nationkey": int(r["c_nationkey"]),
                     "n_customers": int(r["n"]),
                     "skewness": sk})
    return pd.DataFrame(rows).astype({"c_nationkey": np.int64,
                                      "n_customers": np.int64})


SQL_SKEWNESS = """
WITH x AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
           FROM customer),
s AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS HUGEINT)) AS s1,
             SUM(CAST(v AS HUGEINT) * v) AS s2,
             SUM(CAST(v AS HUGEINT) * v * v) AS s3
      FROM x GROUP BY 1)
SELECT c_nationkey, n AS n_customers,
       ROUND((CAST(s3 AS DOUBLE) / n
              - 3.0 * (CAST(s1 AS DOUBLE) / n)
                * (CAST(s2 AS DOUBLE) / n)
              + 2.0 * (CAST(s1 AS DOUBLE) / n)
                * (CAST(s1 AS DOUBLE) / n)
                * (CAST(s1 AS DOUBLE) / n))
             / POWER(CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                       * (CAST(s1 AS DOUBLE) / n), 1.5), 6)
         AS skewness
FROM s ORDER BY c_nationkey
"""


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT) per group — the fundamental cardinality
    reduce (the exact twin of the registry's HLL sketches): per-batch
    distinct (type, user) partials collapse duplicates before the
    shuffle, one (type, user) groupby finishes the dedup, per-batch
    count partials reduce to the type-bounded result."""
    from ray.data.aggregate import Count, Sum
    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("user_id", "count")])
        return pa.table({"event_type": g["event_type"],
                         "pn": g["user_id_count"].cast(pa.int64())})

    out = relational.ds_to_table(
        ev.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"]).aggregate(Count())
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("event_type").aggregate(Sum("pn", alias_name="n_users"))
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    return out.astype({"n_users": np.int64})


SQL_DISTINCT_USERS = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


def q_ivm_orders_status(sf_dir: str):
    """Incremental view maintenance: the per-status revenue view is
    computed as BASE (first calendar half, the \"already-materialized\"
    aggregate) merged with DELTA partials (second half, the \"newly
    ingested\" batch) — and must equal the full recompute, which is
    exactly what the oracle checks.  Both legs push their date
    predicate INTO the parquet scan; the merge is a bounded
    per-status add of exact ints (sums/counts are self-commutative —
    the IVM property the demo exercises)."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Max, Min, Sum

    bounds = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda t: pa.table({"d": pa.array(
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64))}),
        batch_format="pyarrow").aggregate(Min("d", alias_name="lo"),
                                          Max("d", alias_name="hi"))
    mid_day = (int(bounds["lo"]) + int(bounds["hi"])) // 2
    mid_ts = np.int64(mid_day).astype("datetime64[D]") \
        .astype("datetime64[us]")

    def leg(filt):
        ds = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_totalprice"], filter=filt)

        def partial(t: pa.Table) -> pa.Table:
            cents = np.round(t["o_totalprice"]
                             .to_numpy(zero_copy_only=False)
                             * 100.0).astype(np.int64)
            g = pd.DataFrame({"o_orderstatus":
                              t["o_orderstatus"].to_numpy(
                                  zero_copy_only=False),
                              "pc_": cents, "pn": 1}) \
                .groupby("o_orderstatus", sort=False) \
                .agg(pc_=("pc_", "sum"), pn=("pn", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return relational.ds_to_table(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderstatus")
            .aggregate(Sum("pc_", alias_name="cents"),
                       Sum("pn", alias_name="n"))).to_pandas()

    base = leg(pads.field("o_orderdate") <= mid_ts)
    delta = leg(pads.field("o_orderdate") > mid_ts)
    merged = pd.concat([base, delta]) \
        .groupby("o_orderstatus", sort=True).sum().reset_index()
    return pd.DataFrame({
        "o_orderstatus": merged["o_orderstatus"],
        "n_orders": merged["n"].to_numpy(np.int64),
        "revenue": np.round(merged["cents"].to_numpy(np.int64)
                            / 100.0, 2)})


SQL_IVM = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0, 2) AS revenue
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_order_total_reconciliation(sf_dir: str):
    """Cross-table consistency audit — does the denormalized order
    total equal the lineitem-derived total?  Per-order derived cents
    reduce inside the join's bucket combine, the signed diff buckets
    by its exact DECIMAL DIGIT COUNT (repeated integer division — the
    audit must not trust float log10 at magnitude boundaries), and
    only the (sign × digits)-bounded histogram leaves the buckets."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])

    def li_partial(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
            * (1.0 + t["l_tax"].to_numpy(zero_copy_only=False))
            * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_orderkey":
                          t["l_orderkey"].to_numpy(zero_copy_only=False),
                          "pd_": cents}) \
            .groupby("o_orderkey", sort=False)["pd_"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    derived = li.map_batches(li_partial, batch_format="pyarrow")

    def comb(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderkey").aggregate([("pd_", "sum"),
                                                ("o_totalprice", "min")])
        dv = g["pd__sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        ot = np.round(g["o_totalprice_min"]
                      .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        diff = ot - dv
        mag = np.abs(diff)
        digits = np.zeros(len(mag), dtype=np.int64)
        m = mag.copy()
        while (m > 0).any():                 # exact digit count
            nz = m > 0
            digits[nz] += 1
            m[nz] //= 10
        bucket = np.sign(diff) * digits      # 0 = exact match
        u, c = np.unique(bucket, return_counts=True)
        return pa.table({"diff_bucket": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    j = relational.bucketed_hash_join(derived, orders, on="o_orderkey",
                                      combine=comb)
    out = relational.ds_to_table(
        j.groupby("diff_bucket").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("diff_bucket").reset_index(drop=True)
    return out.astype({"diff_bucket": np.int64, "n": np.int64})


SQL_RECONCILIATION = """
WITH d AS (SELECT l_orderkey,
                  SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount)
                                 * (1.0 + l_tax) * 100) AS BIGINT))
                    AS dv
           FROM lineitem GROUP BY 1),
j AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) - d.dv AS diff
      FROM orders JOIN d ON l_orderkey = o_orderkey),
b AS (SELECT CASE WHEN diff = 0 THEN 0
                  ELSE CAST(SIGN(diff) AS BIGINT)
                       * LENGTH(CAST(ABS(diff) AS VARCHAR)) END
        AS diff_bucket
      FROM j)
SELECT diff_bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1 ORDER BY 1
"""


def q_fulfillment_latency_percentiles(sf_dir: str):
    """SLA percentiles (p50/p90/p99) of order-fulfillment latency —
    exact, via the same join-fused latency-day distribution as the
    histogram plus the pure-integer rule 100·cum ≥ k·N on the
    days-bounded aggregate.  No quantile sketch; a latency domain is
    always small enough for the exact distribution."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_min(t: pa.Table) -> pa.Table:
        g = pa.table({"o_orderkey": t["l_orderkey"],
                      "ship": t["l_shipdate"]}) \
            .group_by("o_orderkey").aggregate([("ship", "min")])
        return pa.table({"o_orderkey": g["o_orderkey"],
                         "ship": g["ship_min"]})

    def comb(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderkey").aggregate([("ship", "min"),
                                                ("o_orderdate", "min")])
        s = g["ship_min"].to_numpy(zero_copy_only=False)
        o = g["o_orderdate_min"].to_numpy(zero_copy_only=False)
        days = ((s - o) // np.timedelta64(1, "D")).astype(np.int64)
        u, c = np.unique(days, return_counts=True)
        return pa.table({"latency_days": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    dist = relational.ds_to_table(
        relational.bucketed_hash_join(
            li.map_batches(li_min, batch_format="pyarrow"), orders,
            on="o_orderkey", combine=comb)
        .groupby("latency_days").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("latency_days").reset_index(drop=True)
    cum = np.cumsum(dist["n"].to_numpy(np.int64))
    v = dist["latency_days"].to_numpy(np.int64)
    rows = [{"pct": k,
             "latency_days": int(
                 v[relational.exact_quantile_idx(cum, k, 100)])}
            for k in (50, 90, 99)]
    return pd.DataFrame(rows).astype({"pct": np.int64,
                                      "latency_days": np.int64})


SQL_FULFILLMENT_PCT = """
WITH f AS (SELECT l_orderkey, MIN(l_shipdate) AS ship
           FROM lineitem GROUP BY 1),
lat AS (SELECT CAST(date_diff('day', o_orderdate, ship) AS BIGINT)
          AS d
        FROM orders JOIN f ON l_orderkey = o_orderkey),
vc AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM lat GROUP BY 1),
w AS (SELECT d, SUM(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS cum, SUM(c) OVER () AS n
      FROM vc),
q AS (SELECT unnest([50, 90, 99]) AS pct)
SELECT q.pct, MIN(w.d) AS latency_days
FROM q JOIN w ON 100 * w.cum >= q.pct * w.n
GROUP BY 1 ORDER BY 1
"""


def q_csv_quarantine_stats(sf_dir: str):
    """Torn-line-tolerant CSV ingest: the corpus exports to headerless
    CSV with DETERMINISTIC corruption (every doc_id % 97 == 7 row loses
    its last field — a 100 TB crawl always contains torn lines), then
    the quarantine reader routes malformed rows aside in the same
    streaming pass and the good rows aggregate per lang.  The oracle
    aggregates the original parquet under the same % 97 rule, so a
    reader that silently accepts or drops the wrong rows breaks the
    hash.  Validation is vectorized (Arrow split + list-length, pandas
    coerce) — no per-row try/except."""
    import glob
    import hashlib
    import os
    import uuid

    from ray.data.aggregate import Sum

    from ..io import codecs
    h = hashlib.md5()
    for f in sorted(glob.glob(os.path.join(sf_dir, "documents*"))):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:"
                 f"{st.st_mtime_ns}".encode())
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/prclz_ray_csvq_{tag}_{h.hexdigest()[:12]}"
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"

        def to_csv_lines(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            langs = t["lang"].to_numpy(zero_copy_only=False)
            nch = t["n_chars"].to_numpy(zero_copy_only=False)
            torn = (ids % 97) == 7
            full = np.char.add(np.char.add(np.char.add(np.char.add(
                ids.astype("U20"), ","), langs.astype("U8")), ","),
                nch.astype("U20"))
            short = np.char.add(np.char.add(
                ids.astype("U20"), ","), langs.astype("U8"))
            return pa.table({"text": pa.array(
                np.where(torn, short, full))})

        ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]) \
            .map_batches(to_csv_lines, batch_format="pyarrow")
        os.makedirs(tmp, exist_ok=True)

        def write_block(t: pa.Table) -> pa.Table:
            # raw-text block writer (a CSV writer would quote the
            # already-joined lines); manifest row per block
            name = os.path.join(tmp, f"part-{uuid.uuid4().hex}.txt")
            with open(name, "w") as f:
                f.write("\n".join(t["text"].to_pylist()) + "\n")
            return pa.table({"path": pa.array([name])})

        mani = relational.ds_to_table(
            ds.map_batches(write_block, batch_format="pyarrow"))
        # side-effect writes are NOT exactly-once under Ray retries /
        # schema probes — only files the MANIFEST names are real (the
        # write_ipc contract); orphans from replayed tasks get dropped
        # with the tmp dir
        import shutil
        fin = f"{out}.fin-{uuid.uuid4().hex}"
        os.makedirs(fin)
        for i, p in enumerate(sorted(mani["path"].to_pylist())):
            os.rename(p, os.path.join(fin, f"part-{i:05d}.txt"))
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            os.rename(fin, out)
        except OSError:
            shutil.rmtree(fin, ignore_errors=True)

    parsed = codecs.read_csv_quarantine(
        [os.path.join(out, f) for f in sorted(os.listdir(out))],
        columns=["doc_id", "lang", "n_chars"],
        int_cols=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        good = df[~df["_quarantined"]]
        g = good.groupby("lang", sort=False).agg(
            pn=("lang", "size"), pc_=("n_chars", "sum")).reset_index()
        g["pc_"] = g["pc_"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    res = relational.ds_to_table(
        parsed.map_batches(partial, batch_format="pyarrow")
        .groupby("lang").aggregate(Sum("pn", alias_name="n_docs"),
                                   Sum("pc_", alias_name="sum_chars"))
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    return res.astype({"n_docs": np.int64, "sum_chars": np.int64})


SQL_CSV_QUARANTINE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 97 <> 7
GROUP BY 1 ORDER BY 1
"""


def q_border_distance_nation(sf_dir: str):
    """Geo QC: per nation, the mean distance from its customer points
    to the nearest nation border — edge-hugging points flag geocoding
    snap artifacts.  The 5×5 rect grid makes the border distance PURE
    ARITHMETIC (min of the four edge offsets inside the containing
    cell — no polygon join at all), and half-open-cell placement makes
    every distance an exact half-integer: doubled distances are ints,
    so the sums are exact and only the final mean divides."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        px2 = (k * 7919) % 1000 * 2 + 1        # doubled coords: ints
        py2 = (k * 104729) % 1000 * 2 + 1
        cx2 = px2 // 400 * 400                 # cell origin, doubled
        cy2 = py2 // 400 * 400
        nation = (py2 // 400) * 5 + (px2 // 400)
        d2 = np.minimum.reduce([px2 - cx2, cx2 + 400 - px2,
                                py2 - cy2, cy2 + 400 - py2])
        g = pd.DataFrame({"n_nationkey": nation, "pd2": d2, "pn": 1}) \
            .groupby("n_nationkey", sort=False) \
            .agg(pd2=("pd2", "sum"), pn=("pn", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey").aggregate(Sum("pd2", alias_name="s2"),
                                          Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    return pd.DataFrame({
        "n_nationkey": agg["n_nationkey"].to_numpy(np.int64),
        "n_points": agg["n"].to_numpy(np.int64),
        "mean_border_dist": np.round(
            agg["s2"].to_numpy(np.float64)
            / agg["n"].to_numpy(np.float64) / 2.0, 4)})


SQL_BORDER_DIST = """
WITH p AS (SELECT (c_custkey * 7919) % 1000 * 2 + 1 AS px2,
                  (c_custkey * 104729) % 1000 * 2 + 1 AS py2
           FROM customer),
c AS (SELECT px2, py2, px2 // 400 * 400 AS cx2, py2 // 400 * 400 AS cy2,
             (py2 // 400) * 5 + (px2 // 400) AS n_nationkey
      FROM p),
d AS (SELECT n_nationkey,
             LEAST(px2 - cx2, cx2 + 400 - px2,
                   py2 - cy2, cy2 + 400 - py2) AS d2
      FROM c)
SELECT n_nationkey, CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(CAST(SUM(d2) AS DOUBLE) / COUNT(*) / 2.0, 4)
         AS mean_border_dist
FROM d GROUP BY 1 ORDER BY 1
"""


def q_user_path_length(sf_dir: str):
    """Trajectory odometry: total great-circle distance each user
    travels across their event sequence (events map to deterministic
    lon/lat via the synthetic-point convention) — the geo × window
    combination (haversine M14 under a LEAD).  One coarse user-bucket
    shuffle; per-bucket vectorized sort + shift + haversine; per-user
    float sums run in pinned (ts, event_id) order and the SQL twin
    spells the identical formula, so 2-dp metre rounding is far above
    any trig ulp."""
    from ..geom.crs import haversine_m
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_b", pa.array(
            relational.stable_bucket(t["user_id"], 64)))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"])
        e = df["event_id"].to_numpy(np.int64)
        lng = ((e * 7919) % 1000 + 0.5) / 1000.0 * 360.0 - 180.0
        lat = ((e * 104729) % 1000 + 0.5) / 1000.0 * 160.0 - 80.0
        g = df.groupby("user_id", sort=False)
        nxt = g.cumcount(ascending=False).to_numpy() > 0   # has next row
        lng1 = np.roll(lng, -1)
        lat1 = np.roll(lat, -1)
        dist = haversine_m(lng[nxt], lat[nxt], lng1[nxt], lat1[nxt])
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy()[nxt],
                            "pm": dist, "pn": 1}) \
            .groupby("user_id", sort=True) \
            .agg(pm=("pm", "sum"), pn=("pn", "sum")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    out = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_b").map_groups(per_bucket, batch_format="pandas")
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    return pd.DataFrame({
        "user_id": out["user_id"].to_numpy(np.int64),
        "n_legs": out["pn"].to_numpy(np.int64),
        "path_km": np.round(out["pm"].to_numpy(np.float64) / 1000.0,
                            2)})


SQL_USER_PATH = """
WITH p AS (SELECT user_id, ts, event_id,
                  ((event_id * 7919) % 1000 + 0.5) / 1000.0 * 360.0
                    - 180.0 AS lng,
                  ((event_id * 104729) % 1000 + 0.5) / 1000.0 * 160.0
                    - 80.0 AS lat
           FROM events),
l AS (SELECT user_id, lng, lat,
             LEAD(lng) OVER w AS lng1, LEAD(lat) OVER w AS lat1
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
d AS (SELECT user_id,
             2 * 6371008.8 * ASIN(SQRT(LEAST(GREATEST(
               POWER(SIN((RADIANS(lat1) - RADIANS(lat)) / 2), 2)
               + COS(RADIANS(lat)) * COS(RADIANS(lat1))
                 * POWER(SIN((RADIANS(lng1) - RADIANS(lng)) / 2), 2),
               0.0), 1.0))) AS m
      FROM l WHERE lng1 IS NOT NULL)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_legs,
       ROUND(SUM(m) / 1000.0, 2) AS path_km
FROM d GROUP BY 1 ORDER BY 1
"""


def q_scd2_user_type(sf_dir: str):
    """SCD type-2 dimension build (the warehouse current+history
    pattern) from the event log: per user, consecutive same-type events
    collapse into one versioned validity interval; the open current row
    has NULL valid_to.  One user-bucket shuffle via the
    ``relational.scd2_intervals`` primitive; intervals emitted as epoch
    microseconds so the hash compare is integer-exact."""
    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type"])
    out = relational.ds_to_table(relational.scd2_intervals(
        ev, key_col="user_id", ts_col="ts", order_col="event_id",
        state_col="event_type")).to_pandas()
    out = out.sort_values(["user_id", "valid_from_us"]) \
        .reset_index(drop=True)
    # float64 (NaN = open row), matching DuckDB's nullable-BIGINT →
    # pandas dtype; epoch_us ~1.7e15 < 2^53 so the value stays exact.
    out["valid_to_us"] = out["valid_to_us"].astype(np.float64)
    return out[["user_id", "event_type", "valid_from_us",
                "valid_to_us", "version"]]


SQL_SCD2 = """
WITH o AS (SELECT user_id, ts, event_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS pt
           FROM events),
ch AS (SELECT user_id, ts, event_id, event_type FROM o
       WHERE pt IS NULL OR event_type <> pt)
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from_us,
       epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)) AS valid_to_us,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS version
FROM ch ORDER BY user_id, valid_from_us
"""


def q_hopping_window_counts(sf_dir: str):
    """Hopping-window stream aggregation: 1-hour windows advancing
    every 15 minutes — each event lands in exactly 4 overlapping
    windows.  Per-batch vectorized 4× expansion (repeat + offset) into
    (window_slot, count) partials, then one tiny groupby; the shuffled
    payload is windows, never events.  Window identified by its 15-min
    start slot (epoch_us // 9e8) — pure-integer on both sides."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        slot = us // 900_000_000
        w = np.repeat(slot, 4) - np.tile(
            np.arange(4, dtype=np.int64), len(slot))
        u, c = np.unique(w, return_counts=True)
        return pa.table({"window_slot": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    out = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("window_slot").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("window_slot").reset_index(drop=True)
    return out.astype({"window_slot": np.int64, "n": np.int64})


SQL_HOPPING = """
SELECT (epoch_us(ts) // 900000000) - k.k AS window_slot,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
GROUP BY 1 ORDER BY 1
"""


def _daily_revenue_cents(sf_dir: str) -> pd.DataFrame:
    """Shared daily exact-cents revenue reduce (epoch day → Σ cents):
    per-batch pandas partials → one day-keyed groupby.  ONE home for
    the cents-rounding / epoch-day kernel used by the ACF, CUSUM,
    drawdown, seasonality and control-chart series ops — the SQL twins
    all mirror this exact text."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"day": day, "pc_": cents}) \
            .groupby("day", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("pc_", alias_name="rev"))
    ).to_pandas().sort_values("day").reset_index(drop=True)


def q_acf_daily_revenue(sf_dir: str):
    """Lag-k autocorrelation (k = 1..7) of the gap-filled daily order
    revenue series — the seasonality diagnostic behind every demand
    forecast.  The distributed part is the daily exact-cents reduction
    (per-batch partials, day-keyed groupby); the ACF finish runs on the
    DAYS-bounded series with arbitrary-precision integer power sums
    (daily cents² overflows int64), one float expression per k written
    to mirror the SQL text exactly."""
    import math

    d = _daily_revenue_cents(sf_dir)
    days = d["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    series = np.zeros(hi - lo + 1, dtype=np.int64)
    series[days - lo] = d["rev"].to_numpy(np.int64)
    xs = [int(v) for v in series]        # python ints: exact squares
    rows = []
    for k in range(1, 8):
        a, b = xs[:-k], xs[k:]
        n = len(a)
        sx, sy = sum(a), sum(b)
        sxy = sum(p * q for p, q in zip(a, b))
        sxx = sum(p * p for p in a)
        syy = sum(q * q for q in b)
        num = float(n * sxy - sx * sy)
        den = math.sqrt(float(n * sxx - sx * sx)) \
            * math.sqrt(float(n * syy - sy * sy))
        rows.append({"k": k, "acf": round(num / den, 6)})
    return pd.DataFrame(rows).astype({"k": np.int64})


SQL_ACF = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS rev
           FROM orders GROUP BY 1),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS day FROM bounds),
s AS (SELECT cal.day, COALESCE(d.rev, 0) AS rev
      FROM cal LEFT JOIN d USING (day)),
p AS (SELECT k.k, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(a.rev) AS sx, SUM(b.rev) AS sy,
             SUM(a.rev * b.rev) AS sxy,
             SUM(a.rev * a.rev) AS sxx, SUM(b.rev * b.rev) AS syy
      FROM s a
      CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) k(k)
      JOIN s b ON b.day = a.day + k.k
      GROUP BY 1)
SELECT k, ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                   * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
FROM p ORDER BY k
"""


def q_mannwhitney_value_by_type(sf_dir: str):
    """Mann-Whitney U between the 'click' and 'purchase' event-value
    distributions — the nonparametric two-sample test, computed EXACTLY
    (tie-corrected) from the value-distribution table: 2·U₁ =
    Σ_v n₁(v)·(2·cum₂<(v) + n₂(v)), all integers, no rank floats.  The
    shuffled payload is bounded by the value DOMAIN, never rows."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        v = np.round(t["value"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        is1 = (et[keep] == "click").astype(np.int64)
        g = pd.DataFrame({"v": v, "p1": is1, "p2": 1 - is1}) \
            .groupby("v", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    vc = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("p1", alias_name="n1"),
                                Sum("p2", alias_name="n2"))
    ).to_pandas().sort_values("v").reset_index(drop=True)
    n1v = vc["n1"].to_numpy(np.int64)
    n2v = vc["n2"].to_numpy(np.int64)
    cum2l = np.cumsum(n2v) - n2v
    u1_x2 = int(np.sum(n1v * (2 * cum2l + n2v)))
    return pd.DataFrame([{"n1": int(n1v.sum()), "n2": int(n2v.sum()),
                          "u1_x2": u1_x2}])


SQL_MANNWHITNEY = """
WITH x AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                  SUM(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS n1,
                  SUM(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS n2
           FROM events WHERE event_type IN ('click', 'purchase')
           GROUP BY 1),
w AS (SELECT n1, n2,
             SUM(n2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               - n2 AS cum2l
      FROM x)
SELECT CAST(SUM(n1) AS BIGINT) AS n1, CAST(SUM(n2) AS BIGINT) AS n2,
       CAST(SUM(n1 * (2 * cum2l + n2)) AS BIGINT) AS u1_x2
FROM w
"""


def q_percentile_cont_price(sf_dir: str):
    """Continuous-interpolation percentiles (p25/p50/p75/p90) of
    l_extendedprice — ``quantile_cont`` semantics: position
    h = (n−1)·q over the sorted multiset, linear interpolation between
    the straddling elements.  Ranks and the interpolation fraction are
    EXACT rationals from the value-distribution table ((n−1)·k // 100
    and its remainder); only the final interpolated value is a float,
    rounded 6dp against the oracle's double path."""
    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pc_": pa.array(c.astype(np.int64))})

    vc = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("pc_", alias_name="c"))
    ).to_pandas().sort_values("v").reset_index(drop=True)
    cum = np.cumsum(vc["c"].to_numpy(np.int64))
    v = vc["v"].to_numpy(np.int64)
    n = int(cum[-1])
    rows = []
    for k in (25, 50, 75, 90):
        h_lo, rem = divmod((n - 1) * k, 100)
        lo_c = int(v[np.searchsorted(cum, h_lo + 1, side="left")])
        hi_c = lo_c if rem == 0 else \
            int(v[np.searchsorted(cum, h_lo + 2, side="left")])
        val = (lo_c + (rem / 100.0) * (hi_c - lo_c)) / 100.0
        rows.append({"pct": k, "price": round(val, 6)})
    return pd.DataFrame(rows).astype({"pct": np.int64})


SQL_PERCENTILE_CONT = """
SELECT 25 AS pct, ROUND(quantile_cont(l_extendedprice, 0.25), 6)
         AS price FROM lineitem
UNION ALL SELECT 50, ROUND(quantile_cont(l_extendedprice, 0.50), 6)
         FROM lineitem
UNION ALL SELECT 75, ROUND(quantile_cont(l_extendedprice, 0.75), 6)
         FROM lineitem
UNION ALL SELECT 90, ROUND(quantile_cont(l_extendedprice, 0.90), 6)
         FROM lineitem
ORDER BY 1
"""


def q_target_encoding_loo(sf_dir: str):
    """Leave-one-out target encoding of c_nationkey against the
    positive-balance label — the ML-prep categorical encoder that
    avoids self-leakage: te_i = (pos_g − y_i) / (n_g − 1).  Per-batch
    partials → 25-row stats groupby → broadcast dict → one streaming
    encode pass; exact integers until the single division (NULL for
    singleton groups, matching SQL's x/0)."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = (t["c_acctbal"].to_numpy(zero_copy_only=False) > 0) \
            .astype(np.int64)
        g = pd.DataFrame({"c_nationkey": nk, "ppos": y, "pn": 1}) \
            .groupby("c_nationkey", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = relational.ds_to_table(
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey").aggregate(Sum("ppos", alias_name="pos"),
                                          Sum("pn", alias_name="n"))
    ).to_pandas()
    pos_map = dict(zip(stats["c_nationkey"].astype(np.int64),
                       stats["pos"].astype(np.int64)))
    n_map = dict(zip(stats["c_nationkey"].astype(np.int64),
                     stats["n"].astype(np.int64)))

    def encode(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        y = (t["c_acctbal"].to_numpy(zero_copy_only=False) > 0) \
            .astype(np.int64)
        pos = np.array([pos_map[x] for x in nk], dtype=np.int64)
        n = np.array([n_map[x] for x in nk], dtype=np.int64)
        ok = n > 1
        te = np.where(ok, np.round(
            (pos - y).astype(np.float64)
            / np.where(ok, n - 1, 1).astype(np.float64), 6), 0.0)
        return pa.table({"c_custkey": t["c_custkey"],
                         "te": pa.array(te, mask=~ok)})

    out = cust.map_batches(encode, batch_format="pyarrow")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)


SQL_TARGET_ENC = """
SELECT c_custkey,
       ROUND(CAST(SUM(y) OVER w - y AS DOUBLE)
             / (COUNT(*) OVER w - 1), 6) AS te
FROM (SELECT c_custkey, c_nationkey,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
      FROM customer)
WINDOW w AS (PARTITION BY c_nationkey)
ORDER BY c_custkey
"""


def q_spearman_qty_discount(sf_dir: str):
    """Spearman rank correlation between l_quantity and l_discount with
    EXACT average-tie ranks — Pearson over doubled midranks
    2r(v) = 2·cum<(v) + n(v) + 1 (always integer), computed from the
    DOMAIN-bounded joint distribution (50 qty × 11 discount ≤ 550
    cells): the shuffle moves cells, never rows, and every power sum is
    a python int until the one mirrored float expression."""
    import math

    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.round(t["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        d = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"q": q, "d": d, "pn": 1}) \
            .groupby(["q", "d"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["q", "d"]).aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    qv = cells["q"].to_numpy(np.int64)
    dv = cells["d"].to_numpy(np.int64)
    nc = cells["n"].to_numpy(np.int64)

    def doubled_midranks(vals, counts):
        # per distinct value: 2r = 2·cum< + n + 1
        order = np.argsort(vals)
        u, inv = np.unique(vals, return_inverse=True)
        marg = np.zeros(len(u), dtype=np.int64)
        np.add.at(marg, inv, counts)
        cumlt = np.cumsum(marg) - marg
        return (2 * cumlt + marg + 1)[inv]

    x = doubled_midranks(qv, nc)          # doubled midrank per cell
    y = doubled_midranks(dv, nc)
    N = int(nc.sum())
    sx = sum(int(n) * int(a) for n, a in zip(nc, x))
    sy = sum(int(n) * int(b) for n, b in zip(nc, y))
    sxy = sum(int(n) * int(a) * int(b) for n, a, b in zip(nc, x, y))
    sxx = sum(int(n) * int(a) * int(a) for n, a in zip(nc, x))
    syy = sum(int(n) * int(b) * int(b) for n, b in zip(nc, y))
    num = float(N * sxy - sx * sy)
    den = math.sqrt(float(N * sxx - sx * sx)) \
        * math.sqrt(float(N * syy - sy * sy))
    return pd.DataFrame([{"n": N, "rho": round(num / den, 6)}]) \
        .astype({"n": np.int64})


SQL_SPEARMAN = """
WITH cells AS (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
                      CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
                      CAST(COUNT(*) AS HUGEINT) AS n
               FROM lineitem GROUP BY 1, 2),
mq AS (SELECT q, SUM(n) AS nq FROM cells GROUP BY 1),
rq AS (SELECT q, 2 * (SUM(nq) OVER (ORDER BY q
                      ROWS UNBOUNDED PRECEDING) - nq) + nq + 1 AS r2
       FROM mq),
md AS (SELECT d, SUM(n) AS nd FROM cells GROUP BY 1),
rd AS (SELECT d, 2 * (SUM(nd) OVER (ORDER BY d
                      ROWS UNBOUNDED PRECEDING) - nd) + nd + 1 AS r2
       FROM md),
s AS (SELECT SUM(c.n) AS nn,
             SUM(c.n * rq.r2) AS sx, SUM(c.n * rd.r2) AS sy,
             SUM(c.n * rq.r2 * rd.r2) AS sxy,
             SUM(c.n * rq.r2 * rq.r2) AS sxx,
             SUM(c.n * rd.r2 * rd.r2) AS syy
      FROM cells c JOIN rq USING (q) JOIN rd USING (d))
SELECT CAST(nn AS BIGINT) AS n,
       ROUND(CAST(nn * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(nn * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(nn * syy - sy * sy AS DOUBLE))), 6) AS rho
FROM s
"""


def q_kendall_tau_discount_tax(sf_dir: str):
    """Kendall tau-b between l_discount and l_tax — EXACT from the
    domain-bounded joint distribution (11 × 9 ≤ 99 cells): concordant /
    discordant pair counts by an O(cells²) dominance broadcast, tie
    terms from the marginals, all python-int; tau's two square roots
    mirror the SQL text."""
    import math

    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        x = np.round(t["l_tax"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"d": d, "t": x, "pn": 1}) \
            .groupby(["d", "t"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "t"]).aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    d = cells["d"].to_numpy(np.int64)
    t_ = cells["t"].to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    # ordered-pair strict dominance counts each unordered concordant /
    # discordant pair exactly once (object dtype → python-int sums)
    no = n.astype(object)
    conc = int(np.sum(no[:, None] * no[None, :]
                      * ((d[:, None] > d[None, :])
                         & (t_[:, None] > t_[None, :]))))
    disc = int(np.sum(no[:, None] * no[None, :]
                      * ((d[:, None] > d[None, :])
                         & (t_[:, None] < t_[None, :]))))
    N = int(n.sum())
    n0 = N * (N - 1) // 2
    n1 = 0
    for _, grp in pd.DataFrame({"d": d, "n": n}).groupby("d"):
        s = int(grp["n"].sum())
        n1 += s * (s - 1) // 2
    n2 = 0
    for _, grp in pd.DataFrame({"t": t_, "n": n}).groupby("t"):
        s = int(grp["n"].sum())
        n2 += s * (s - 1) // 2
    tau = float(conc - disc) / (math.sqrt(float(n0 - n1))
                                * math.sqrt(float(n0 - n2)))
    return pd.DataFrame([{"n": N, "conc": conc, "disc": disc,
                          "tau_b": round(tau, 6)}]) \
        .astype({"n": np.int64, "conc": np.int64, "disc": np.int64})


SQL_KENDALL = """
WITH cells AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
                      CAST(ROUND(l_tax * 100) AS BIGINT) AS t,
                      CAST(COUNT(*) AS HUGEINT) AS n
               FROM lineitem GROUP BY 1, 2),
pairs AS (SELECT SUM(CASE WHEN b.d < a.d AND b.t < a.t
                     THEN a.n * b.n ELSE 0 END) AS conc,
                 SUM(CASE WHEN b.d < a.d AND b.t > a.t
                     THEN a.n * b.n ELSE 0 END) AS disc
          FROM cells a CROSS JOIN cells b),
tot AS (SELECT SUM(n) AS nn,
               SUM(n * (n - 1)) // 2 AS cellt FROM cells),
t1 AS (SELECT SUM(s * (s - 1)) // 2 AS n1
       FROM (SELECT SUM(n) AS s FROM cells GROUP BY d)),
t2 AS (SELECT SUM(s * (s - 1)) // 2 AS n2
       FROM (SELECT SUM(n) AS s FROM cells GROUP BY t))
SELECT CAST(nn AS BIGINT) AS n, CAST(conc AS BIGINT) AS conc,
       CAST(disc AS BIGINT) AS disc,
       ROUND(CAST(conc - disc AS DOUBLE)
             / (SQRT(CAST(nn * (nn - 1) // 2 - n1 AS DOUBLE))
                * SQRT(CAST(nn * (nn - 1) // 2 - n2 AS DOUBLE))), 6)
         AS tau_b
FROM pairs, tot, t1, t2
"""


def q_percent_rank_acctbal(sf_dir: str):
    """Per-customer PERCENT_RANK of account balance within its nation —
    the window-function rank normalized to [0, 1]: (rank−1)/(n−1) with
    min-rank ties.  Nation is a natural ≤25-way partition key, so the
    shape is ONE small groupby with a per-nation vectorized searchsorted
    rank — no broadcast CDF, no driver loop."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(g["c_acctbal"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        sc = np.sort(cents)
        rank = np.searchsorted(sc, cents, side="left") + 1
        n = len(g)
        pr = np.zeros(n, dtype=np.float64) if n == 1 else \
            (rank - 1).astype(np.float64) / float(n - 1)
        return pd.DataFrame({"c_custkey": g["c_custkey"].to_numpy(),
                             "pr": np.round(pr, 6)})

    out = cust.groupby("c_nationkey").map_groups(
        per_nation, batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)


SQL_PERCENT_RANK = """
SELECT c_custkey,
       ROUND(PERCENT_RANK() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT)), 6) AS pr
FROM customer ORDER BY c_custkey
"""


def q_isoweek_revenue(sf_dir: str):
    """Fiscal-calendar rollup: exact-cents order revenue per ISO 8601
    (iso_year, iso_week) — the week-boundary semantics (Monday start,
    week 1 holds the first Thursday) that plain YYYY-WW truncation gets
    wrong at year boundaries.  Per-batch vectorized isocalendar() via
    pandas' C datetime kernel feeding week-bounded partials; the global
    groupby moves (year, week) cells, never orders."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dt = pd.DatetimeIndex(t["o_orderdate"].to_numpy(
            zero_copy_only=False))
        iso = dt.isocalendar()
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"iso_year": iso["year"].to_numpy(np.int64),
                          "iso_week": iso["week"].to_numpy(np.int64),
                          "pc_": cents}) \
            .groupby(["iso_year", "iso_week"], sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["iso_year", "iso_week"])
        .aggregate(Sum("pc_", alias_name="cents"))
    ).to_pandas().sort_values(["iso_year", "iso_week"]) \
        .reset_index(drop=True)
    out["revenue"] = np.round(
        out["cents"].to_numpy(np.float64) / 100.0, 2)
    return out[["iso_year", "iso_week", "revenue"]] \
        .astype({"iso_year": np.int64, "iso_week": np.int64})


SQL_ISOWEEK = """
SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                  AS DOUBLE) / 100.0, 2) AS revenue
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_cusum_daily_revenue(sf_dir: str):
    """CUSUM upward level-shift detector over gap-filled daily revenue
    — the classic recursive s_i = max(0, s_{i−1} + (x_i − μ)) rewritten
    CLOSED-FORM as cumsum − running-min(cumsum) (exact identity, proven
    by induction), so it needs only window scans, no recursion.  Work
    in n-scaled cents (y_i = n·x_i − S) to keep μ rational: every value
    is an exact python int until the final ROUND(s/n/100, 4).  The
    distributed part is the daily exact-cents reduce; the finish is
    DAYS-bounded."""
    d = _daily_revenue_cents(sf_dir)
    days = d["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    series = np.zeros(hi - lo + 1, dtype=np.int64)
    series[days - lo] = d["rev"].to_numpy(np.int64)
    xs = [int(v) for v in series]
    n, total = len(xs), sum(xs)
    cum, runmin, out = 0, 0, []
    for i, x in enumerate(xs):
        cum += n * x - total           # scaled deviation, exact int
        if cum < runmin:
            runmin = cum
        s = cum - runmin
        out.append({"day": lo + i,
                    "cusum": round(float(s) / n / 100.0, 4)})
    return pd.DataFrame(out).astype({"day": np.int64})


SQL_CUSUM = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS rev
           FROM orders GROUP BY 1),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT UNNEST(generate_series(lo, hi)) AS day FROM bounds),
s AS (SELECT cal.day, COALESCE(d.rev, 0) AS rev
      FROM cal LEFT JOIN d USING (day)),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(rev) AS total
        FROM s),
c AS (SELECT day, SUM(n * rev - total) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS cum
      FROM s, tot),
m AS (SELECT day, cum, LEAST(CAST(0 AS HUGEINT),
             MIN(cum) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING)) AS runmin
      FROM c)
SELECT day, ROUND(CAST(cum - runmin AS DOUBLE)
                  / (SELECT CAST(n AS DOUBLE) FROM tot) / 100.0, 4)
         AS cusum
FROM m ORDER BY day
"""


def q_welch_ttest_value(sf_dir: str):
    """Welch's unequal-variance t-test between the 'click' and
    'purchase' event-value distributions, with the Welch–Satterthwaite
    degrees of freedom — exact integer power sums per group (Σx² in
    cents rides the (hi, lo) 128-bit split, same as skewness), then one
    float finish whose association mirrors the SQL text."""
    import math

    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        v = np.round(t["value"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        v2 = v * v
        g = pd.DataFrame({"grp": et[keep], "ps1": v,
                          "ph2": v2 >> 32, "pl2": v2 & 0xFFFFFFFF,
                          "pn": 1}) \
            .groupby("grp", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("grp").aggregate(
            Sum("ps1", alias_name="s1"), Sum("ph2", alias_name="h2"),
            Sum("pl2", alias_name="l2"), Sum("pn", alias_name="n"))
    ).to_pandas().set_index("grp")

    def stats(g):
        r = agg.loc[g]
        n = int(r["n"])
        s1 = float(int(r["s1"]))
        s2 = float(int(r["h2"]) * (1 << 32) + int(r["l2"]))
        m = s1 / n
        var = (s2 - s1 * m) / (n - 1)
        return n, m, var

    n1, m1, v1 = stats("click")
    n2, m2, v2 = stats("purchase")
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                      + (v2 / n2) * (v2 / n2) / (n2 - 1))
    return pd.DataFrame([{"n1": n1, "n2": n2,
                          "t_stat": round(t, 6),
                          "df_welch": round(df, 6)}]) \
        .astype({"n1": np.int64, "n2": np.int64})


SQL_WELCH = """
WITH x AS (SELECT event_type AS grp,
                  CAST(ROUND(value * 100) AS BIGINT) AS v
           FROM events WHERE event_type IN ('click', 'purchase')),
s AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS HUGEINT)) AS s1,
             SUM(CAST(v AS HUGEINT) * v) AS s2
      FROM x GROUP BY 1),
f AS (SELECT grp, n, CAST(s1 AS DOUBLE) AS s1d,
             CAST(s2 AS DOUBLE) AS s2d,
             CAST(s1 AS DOUBLE) / n AS m
      FROM s),
v AS (SELECT grp, n, m, (s2d - s1d * m) / (n - 1) AS var FROM f),
j AS (SELECT a.n AS n1, b.n AS n2, a.m AS m1, b.m AS m2,
             a.var / a.n AS q1, b.var / b.n AS q2
      FROM v a, v b WHERE a.grp = 'click' AND b.grp = 'purchase')
SELECT n1, n2,
       ROUND((m1 - m2) / SQRT(q1 + q2), 6) AS t_stat,
       ROUND((q1 + q2) * (q1 + q2)
             / (q1 * q1 / (n1 - 1) + q2 * q2 / (n2 - 1)), 6)
         AS df_welch
FROM j
"""


def q_ks_test_2sample(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov statistic between the 'click' and
    'purchase' value distributions — EXACT via the integer identity
    D·n1·n2 = max_v |cum1(v)·n2 − cum2(v)·n1| over the value-DOMAIN-
    bounded distribution table (same shuffle shape as Mann-Whitney);
    the only float is the final division."""
    from ray.data.aggregate import Sum
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        v = np.round(t["value"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        is1 = (et[keep] == "click").astype(np.int64)
        g = pd.DataFrame({"v": v, "p1": is1, "p2": 1 - is1}) \
            .groupby("v", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    vc = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("p1", alias_name="n1"),
                                Sum("p2", alias_name="n2"))
    ).to_pandas().sort_values("v").reset_index(drop=True)
    c1 = np.cumsum(vc["n1"].to_numpy(np.int64)).astype(object)
    c2 = np.cumsum(vc["n2"].to_numpy(np.int64)).astype(object)
    n1, n2 = int(c1[-1]), int(c2[-1])
    d_num = int(np.max(np.abs(c1 * n2 - c2 * n1)))
    return pd.DataFrame([{
        "n1": n1, "n2": n2, "d_num": d_num,
        "d_stat": round(float(d_num) / (float(n1) * float(n2)), 6)}]) \
        .astype({"n1": np.int64, "n2": np.int64, "d_num": np.int64})


SQL_KS_TEST = """
WITH x AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                  SUM(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS n1,
                  SUM(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS n2
           FROM events WHERE event_type IN ('click', 'purchase')
           GROUP BY 1),
w AS (SELECT CAST(SUM(n1) OVER o AS HUGEINT) AS c1,
             CAST(SUM(n2) OVER o AS HUGEINT) AS c2
      FROM x WINDOW o AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
tot AS (SELECT CAST(SUM(n1) AS HUGEINT) AS t1,
               CAST(SUM(n2) AS HUGEINT) AS t2 FROM x)
SELECT CAST(t1 AS BIGINT) AS n1, CAST(t2 AS BIGINT) AS n2,
       CAST(MAX(ABS(c1 * t2 - c2 * t1)) AS BIGINT) AS d_num,
       ROUND(CAST(MAX(ABS(c1 * t2 - c2 * t1)) AS DOUBLE)
             / (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)), 6) AS d_stat
FROM w, tot GROUP BY t1, t2
"""


def q_max_drawdown_revenue(sf_dir: str):
    """Maximum drawdown of the cumulative daily-revenue curve —
    max(running-max(cum) − cum), the risk metric behind every equity
    curve.  Same scan family as CUSUM (windows, no recursion); missing
    days can't change cum or its running max, so no gap-fill is needed
    and everything is exact cents."""
    d = _daily_revenue_cents(sf_dir)
    cum = 0
    runmax = 0
    dd = 0
    for x in d["rev"].to_numpy(np.int64):
        cum += int(x)
        if cum > runmax:
            runmax = cum
        if runmax - cum > dd:
            dd = runmax - cum
    return pd.DataFrame([{"n_days": len(d),
                          "max_drawdown": round(dd / 100.0, 2)}]) \
        .astype({"n_days": np.int64})


SQL_MAX_DRAWDOWN = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS rev
           FROM orders GROUP BY 1),
c AS (SELECT day, SUM(rev) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS cum FROM d),
m AS (SELECT cum, GREATEST(CAST(0 AS HUGEINT),
             MAX(cum) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING)) AS runmax
      FROM c)
SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
       ROUND(CAST(MAX(runmax - cum) AS DOUBLE) / 100.0, 2)
         AS max_drawdown
FROM m
"""


def q_ohlc_daily_value(sf_dir: str):
    """Daily OHLC candles over the event-value stream: open = value at
    the earliest (ts, event_id), close = at the latest, high/low =
    extremes, all exact cents.  Per-batch partials carry ONE candidate
    row per day (first/last by composite order + min/max + count), so
    the groupby moves days×batches rows, never events; ties are
    deterministic via the unique event_id."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = ts_us // 86_400_000_000
        cents = np.round(t["value"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        df = pd.DataFrame({
            "day": day,
            "ts_us": ts_us,
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "v": cents}).sort_values(["day", "ts_us", "eid"])
        first = df.groupby("day", sort=False).head(1) \
            .rename(columns={"ts_us": "o_ts", "eid": "o_id", "v": "o_v"})
        last = df.groupby("day", sort=False).tail(1) \
            .rename(columns={"ts_us": "c_ts", "eid": "c_id", "v": "c_v"})
        mm = df.groupby("day", sort=False) \
            .agg(lo=("v", "min"), hi=("v", "max"),
                 pn=("v", "size")).reset_index()
        out = first.merge(last, on="day").merge(mm, on="day")
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_ts", "o_id"])
        open_v = int(g["o_v"].iloc[0])
        g2 = g.sort_values(["c_ts", "c_id"])
        close_v = int(g2["c_v"].iloc[-1])
        return pd.DataFrame([{
            "day": int(g["day"].iloc[0]),
            "open_c": open_v, "high_c": int(g["hi"].max()),
            "low_c": int(g["lo"].min()), "close_c": close_v,
            "n": int(g["pn"].sum())}])

    out = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("day").map_groups(finish, batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("day").reset_index(drop=True) \
        .astype({"day": np.int64, "open_c": np.int64,
                 "high_c": np.int64, "low_c": np.int64,
                 "close_c": np.int64, "n": np.int64})


SQL_OHLC = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(ROUND(value * 100) AS BIGINT) AS v,
                  ROW_NUMBER() OVER (PARTITION BY
                      epoch_us(ts) // 86400000000
                      ORDER BY ts, event_id) AS ra,
                  ROW_NUMBER() OVER (PARTITION BY
                      epoch_us(ts) // 86400000000
                      ORDER BY ts DESC, event_id DESC) AS rd
           FROM events)
SELECT day, MAX(CASE WHEN ra = 1 THEN v END) AS open_c,
       MAX(v) AS high_c, MIN(v) AS low_c,
       MAX(CASE WHEN rd = 1 THEN v END) AS close_c,
       CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY day ORDER BY day
"""


def q_longest_event_run(sf_dir: str):
    """Per-user longest run of consecutive same-type events in
    (ts, event_id) order — the gaps-and-islands pattern.  One coarse
    user-bucket shuffle, per-bucket vectorized change-flag cumsum →
    bincount run lengths → per-user max; no per-user Python loop."""
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        change = np.ones(len(df), dtype=bool)
        change[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        run_id = np.cumsum(change) - 1
        lengths = np.bincount(run_id)
        run_user = u[change]
        out = pd.DataFrame({"user_id": run_user, "len": lengths}) \
            .groupby("user_id", sort=False)["len"].max().reset_index()
        return out.rename(columns={"len": "max_run"})

    out = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": np.int64, "max_run": np.int64})


SQL_LONGEST_RUN = """
WITH o AS (SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn2
           FROM events),
runs AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
         FROM o GROUP BY user_id, event_type, rn - rn2)
SELECT user_id, MAX(len) AS max_run
FROM runs GROUP BY user_id ORDER BY user_id
"""


def q_jarque_bera_discount(sf_dir: str):
    """Jarque–Bera normality test of the l_discount distribution —
    the 4th-moment member of the power-sum family.  The domain is tiny
    (11 discount levels), so Σv⁴ stays minuscule and every raw moment
    is an exact python int from the DOMAIN-bounded distribution table;
    central moments expand via raw moments with the float association
    mirroring the SQL text term by term."""
    import math

    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    vc = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    v = vc["v"].to_numpy(np.int64)
    n_ = vc["n"].to_numpy(np.int64)
    N = int(n_.sum())
    s1 = sum(int(c) * int(x) for c, x in zip(n_, v))
    s2 = sum(int(c) * int(x) ** 2 for c, x in zip(n_, v))
    s3 = sum(int(c) * int(x) ** 3 for c, x in zip(n_, v))
    s4 = sum(int(c) * int(x) ** 4 for c, x in zip(n_, v))
    n = float(N)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
    m4 = s4 / n - 4.0 * mu * (s3 / n) \
        + 6.0 * mu * mu * (s2 / n) - 3.0 * mu * mu * mu * mu
    skew = m3 / m2 ** 1.5
    kurt = m4 / (m2 * m2)
    jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    return pd.DataFrame([{"n": N, "skew": round(skew, 6),
                          "kurtosis": round(kurt, 6),
                          "jb_stat": round(jb, 6)}]) \
        .astype({"n": np.int64})


SQL_JARQUE_BERA = """
WITH x AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS v,
                  CAST(COUNT(*) AS HUGEINT) AS c
           FROM lineitem GROUP BY 1),
s AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
             SUM(c * v) AS s1, SUM(c * v * v) AS s2,
             SUM(c * v * v * v) AS s3,
             SUM(c * v * v * v * v) AS s4
      FROM x),
m AS (SELECT nn, CAST(nn AS DOUBLE) AS n,
             CAST(s1 AS DOUBLE) / nn AS mu,
             CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
             CAST(s4 AS DOUBLE) AS s4d
      FROM s),
cm AS (SELECT nn, n, s2d / n - mu * mu AS m2,
              s3d / n - 3.0 * mu * (s2d / n)
                + 2.0 * mu * mu * mu AS m3,
              s4d / n - 4.0 * mu * (s3d / n)
                + 6.0 * mu * mu * (s2d / n)
                - 3.0 * mu * mu * mu * mu AS m4
       FROM m),
f AS (SELECT nn, n, m3 / POWER(m2, 1.5) AS skew,
             m4 / (m2 * m2) AS kurt
      FROM cm)
SELECT nn AS n, ROUND(skew, 6) AS skew, ROUND(kurt, 6) AS kurtosis,
       ROUND(n / 6.0 * (skew * skew
             + (kurt - 3.0) * (kurt - 3.0) / 4.0), 6) AS jb_stat
FROM f
"""


def q_unpivot_lineitem_measures(sf_dir: str):
    """Wide→long UNPIVOT of the four lineitem measures into
    (variable, value) rows via the ``relational.unpivot`` primitive
    (per-batch Arrow concat, no shuffle), then a 4-group exact-cents
    profile — the melt/long-format building block the pivot stage
    inverts.  Values quantized to cents BEFORE the unpivot so the long
    column is a single int64 type."""
    from ray.data.aggregate import Max, Min, Sum
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice",
                                    "l_discount", "l_tax"])

    def to_cents(t: pa.Table) -> pa.Table:
        cols = {}
        for c in t.column_names:
            v = np.round(t[c].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
            cols[c] = pa.array(v)
        return pa.table(cols)

    long = relational.unpivot(
        li.map_batches(to_cents, batch_format="pyarrow"),
        id_cols=[], value_cols=["l_quantity", "l_extendedprice",
                                "l_discount", "l_tax"],
        var_name="measure", value_name="cents")

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "measure": t["measure"].to_numpy(zero_copy_only=False),
            "c": t["cents"].to_numpy(zero_copy_only=False)})
        g = df.groupby("measure", sort=False).agg(
            pn=("c", "size"), ps=("c", "sum"),
            pmin=("c", "min"), pmax=("c", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        long.map_batches(partial, batch_format="pyarrow")
        .groupby("measure").aggregate(
            Sum("pn", alias_name="n"), Sum("ps", alias_name="sum_c"),
            Min("pmin", alias_name="min_c"),
            Max("pmax", alias_name="max_c"))
    ).to_pandas().sort_values("measure").reset_index(drop=True)
    return out.astype({"n": np.int64, "sum_c": np.int64,
                       "min_c": np.int64, "max_c": np.int64})


SQL_UNPIVOT = """
WITH long AS (
  SELECT 'l_quantity' AS measure,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS c FROM lineitem
  UNION ALL SELECT 'l_extendedprice',
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) FROM lineitem
  UNION ALL SELECT 'l_discount',
         CAST(ROUND(l_discount * 100) AS BIGINT) FROM lineitem
  UNION ALL SELECT 'l_tax',
         CAST(ROUND(l_tax * 100) AS BIGINT) FROM lineitem)
SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS sum_c,
       MIN(c) AS min_c, MAX(c) AS max_c
FROM long GROUP BY measure ORDER BY measure
"""


def q_grouped_percentile_cont(sf_dir: str):
    """Per-nation continuous-interpolation quartiles of account balance
    — grouped ``quantile_cont`` semantics.  The distribution table
    (nation, cents) is bounded by the VALUE DOMAIN × 25 nations, never
    by the row count; the per-nation exact (n−1)·q rank/remainder
    finish runs inside a 25-group map_groups, not on the driver."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.round(t["c_acctbal"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"c_nationkey": nk, "v": cents, "pn": 1}) \
            .groupby(["c_nationkey", "v"], sort=False).sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    dist = cust.map_batches(partial, batch_format="pyarrow") \
        .groupby(["c_nationkey", "v"]).aggregate(
            Sum("pn", alias_name="c"))

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v")
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        v = g["v"].to_numpy(np.int64)
        n = int(cum[-1])
        row = {"c_nationkey": int(g["c_nationkey"].iloc[0])}
        for name, k in (("p25", 25), ("p50", 50), ("p75", 75)):
            h_lo, rem = divmod((n - 1) * k, 100)
            lo_c = int(v[np.searchsorted(cum, h_lo + 1, side="left")])
            hi_c = lo_c if rem == 0 else \
                int(v[np.searchsorted(cum, h_lo + 2, side="left")])
            row[name] = round(
                (lo_c + (rem / 100.0) * (hi_c - lo_c)) / 100.0, 6)
        return pd.DataFrame([row])

    out = dist.groupby("c_nationkey").map_groups(
        per_nation, batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True) \
        .astype({"c_nationkey": np.int64})


SQL_GROUPED_PCTL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       ROUND(quantile_cont(c_acctbal, 0.25), 6) AS p25,
       ROUND(quantile_cont(c_acctbal, 0.50), 6) AS p50,
       ROUND(quantile_cont(c_acctbal, 0.75), 6) AS p75
FROM customer GROUP BY 1 ORDER BY 1
"""


def q_pca_top_component(sf_dir: str):
    """Top principal component of the embeddings table via the
    exact-integer-covariance PCA stage: quantized Gram/sum partials
    ride the (hi, lo) split, so the reduction is bit-identical at ANY
    partitioning — the eigensolve runs once on the d×d driver-side
    covariance (d = embedding width, never rows).  Not SQL-expressible
    (eigendecomposition); pinned instead by partition-invariance +
    reconstruction pytest."""
    from ..stages import similarity
    emb = _read(sf_dir, "embeddings", ["embedding"])
    vecs, ratio, n = similarity.embeddings_pca(emb, "embedding", top=1)
    d = vecs.shape[0]
    return pd.DataFrame({
        "dim": np.arange(d, dtype=np.int64),
        "loading": np.round(vecs[:, 0], 6),
        "evr": np.round(np.full(d, ratio[0]), 6),
        "n_rows": np.full(d, n, dtype=np.int64)})


def _fingerprint_cache_dir(sf_dir: str, table: str, kind: str) -> str:
    """Content-fingerprinted /tmp cache path for format-roundtrip
    queries (name+size+mtime per input file — regenerated fixtures get
    a fresh dir; see the JSONL twin for the rationale)."""
    import glob
    import hashlib
    import os
    h = hashlib.md5()
    for f in sorted(glob.glob(os.path.join(sf_dir, f"{table}*"))):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:"
                 f"{st.st_mtime_ns}".encode())
    tag = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/prclz_ray_{kind}_{tag}_{h.hexdigest()[:12]}"


def q_orc_source_stats(sf_dir: str):
    """Apache ORC source/sink parity: documents round-trip through ORC
    (manifest-adopted files only, fingerprint-cached once per input),
    then aggregate per source FROM THE ORC READ — the oracle aggregates
    the original parquet, so any writer/reader corruption breaks the
    hash."""
    import json
    import os
    import uuid

    from ray.data.aggregate import Max, Sum

    from ..io import codecs

    out = _fingerprint_cache_dir(sf_dir, "documents", "orc")
    manifest = os.path.join(out, "_MANIFEST.json")
    if not os.path.isfile(manifest):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        m = codecs.write_orc(_read(sf_dir, "documents",
                                   ["doc_id", "source", "n_chars"]),
                             tmp).to_pandas()
        files = [os.path.basename(f) for f in m["file"]]
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as fh:
            json.dump(files, fh)
        try:
            os.rename(tmp, out)
        except OSError:            # concurrent run won the rename
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    with open(manifest) as fh:
        files = [os.path.join(out, f) for f in json.load(fh)]

    docs = codecs.read_orc(files)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "nc": t["n_chars"].to_numpy(zero_copy_only=False)})
        g = df.groupby("source", sort=False).agg(
            pn=("nc", "size"), pc_=("nc", "sum"),
            pm=("nc", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(
            Sum("pn", alias_name="n_docs"),
            Sum("pc_", alias_name="total_chars"),
            Max("pm", alias_name="max_chars"))
    ).to_pandas().sort_values("source").reset_index(drop=True)
    return o.astype({"n_docs": np.int64, "total_chars": np.int64,
                     "max_chars": np.int64})


SQL_ORC_STATS = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source ORDER BY source
"""


def q_hive_pruned_scan(sf_dir: str):
    """Hive-style partitioned write + partition-PRUNED read-back:
    orders land under ``o_orderstatus=<v>/`` directories (Ray's native
    ``partition_cols`` writer), then the scan reads ONLY the 'F'
    directory — bytes from the other partitions never leave storage,
    which is the point of hive layout at 100 TB.  The oracle filters
    the original table, so a wrong partition routing breaks the
    hash."""
    import os
    import uuid

    from ray.data.aggregate import Sum

    out = _fingerprint_cache_dir(sf_dir, "orders", "hive")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderstatus", "o_orderpriority",
               "o_totalprice"]) \
            .write_parquet(tmp, partition_cols=["o_orderstatus"])
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    import ray.data as rd
    part = rd.read_parquet(os.path.join(out, "o_orderstatus=F"),
                           columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_orderpriority":
                          t["o_orderpriority"].to_numpy(
                              zero_copy_only=False),
                          "pn": 1, "pc_": cents}) \
            .groupby("o_orderpriority", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        part.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority").aggregate(
            Sum("pn", alias_name="n"),
            Sum("pc_", alias_name="revenue_c"))
    ).to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    return o.astype({"n": np.int64, "revenue_c": np.int64})


SQL_HIVE_PRUNED = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
         AS revenue_c
FROM orders WHERE o_orderstatus = 'F'
GROUP BY 1 ORDER BY 1
"""


def q_schema_evolution_stats(sf_dir: str):
    """Schema-evolution read: half the corpus is re-written at an
    OLDER schema version (no n_chars column), the other half at the
    current one; ``read_parquet_union_by_name`` aligns by column name
    and null-fills the missing column — the v1/v2-mixed-lake situation
    every long-lived pipeline hits.  Split rule doc_id % 2 so the
    oracle can reproduce the null pattern from the original table."""
    import os
    import uuid

    from ray.data.aggregate import Count, Sum

    from ..io import codecs

    out = _fingerprint_cache_dir(sf_dir, "documents", "schevo")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        os.makedirs(tmp, exist_ok=True)
        t = relational.ds_to_table(
            _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]))
        even = pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
        import pyarrow.parquet as pq_
        pq_.write_table(t.filter(even).select(["doc_id", "lang"]),
                        os.path.join(tmp, "v1.parquet"))
        pq_.write_table(t.filter(pc.invert(even)),
                        os.path.join(tmp, "v2.parquet"))
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    files = [os.path.join(out, "v1.parquet"),
             os.path.join(out, "v2.parquet")]
    docs = codecs.read_parquet_union_by_name(files)

    def partial(t: pa.Table) -> pa.Table:
        nc = t["n_chars"]
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "pn": 1,
            "pmiss": pc.is_null(nc).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "pc_": nc.fill_null(0).to_numpy(zero_copy_only=False)})
        g = df.groupby("lang", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("lang").aggregate(
            Sum("pn", alias_name="n_docs"),
            Sum("pmiss", alias_name="n_missing"),
            Sum("pc_", alias_name="chars_known"))
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    return o.astype({"n_docs": np.int64, "n_missing": np.int64,
                     "chars_known": np.int64})


SQL_SCHEMA_EVOLUTION = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE n_chars END)
            AS BIGINT) AS chars_known
FROM documents GROUP BY lang ORDER BY lang
"""


def q_pmi_collocations(sf_dir: str):
    """Top-20 PMI collocations over the document corpus — see
    ``text.pmi_collocations`` for the two-vocabulary-aggregation scale
    shape (rare-bigram filter BEFORE any join; size-guarded unigram
    broadcast with bucketed fallback)."""
    docs = _read(sf_dir, "documents", ["text"])
    t = text.pmi_collocations(docs, text_col="text", min_count=5, k=20)
    out = t.to_pandas()
    out["pmi"] = np.round(out["pmi"], 6)
    return out.astype({"c_ab": np.int64})


SQL_PMI = """
WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
big AS (SELECT w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
          AS bigram,
               w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
        FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
              FROM toks WHERE len(w) >= 2)),
bc AS (SELECT bigram, MIN(w1) AS w1, MIN(w2) AS w2,
              CAST(COUNT(*) AS BIGINT) AS c_ab
       FROM big GROUP BY bigram),
uni AS (SELECT u AS word, CAST(COUNT(*) AS BIGINT) AS c_w
        FROM (SELECT unnest(w) AS u FROM toks) GROUP BY 1),
tot AS (SELECT (SELECT SUM(c_ab) FROM bc) AS nb,
               (SELECT SUM(c_w) FROM uni) AS nw)
SELECT bigram, c_ab,
       ROUND(LN((CAST(c_ab AS DOUBLE) / nb)
                / ((CAST(a.c_w AS DOUBLE) / nw)
                   * (CAST(b.c_w AS DOUBLE) / nw))), 6) AS pmi
FROM bc JOIN uni a ON bc.w1 = a.word
        JOIN uni b ON bc.w2 = b.word, tot
WHERE c_ab >= 5
ORDER BY LN((CAST(c_ab AS DOUBLE) / nb)
            / ((CAST(a.c_w AS DOUBLE) / nw)
               * (CAST(b.c_w AS DOUBLE) / nw))) DESC, bigram ASC
LIMIT 20
"""


def q_grouping_sets_orders(sf_dir: str):
    """GROUP BY GROUPING SETS ((status), (priority), ()) in one pass:
    the finest (status, priority) partials reduce once (≤ 3×5 cells);
    every requested grouping set derives from those cells — the same
    derive-coarse-from-finest contract as the rollup/cube stages, with
    an explicit grouping-id column."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderstatus",
                                      "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({
            "st": t["o_orderstatus"].to_numpy(zero_copy_only=False),
            "pr": t["o_orderpriority"].to_numpy(zero_copy_only=False),
            "pn": 1, "pc_": cents}) \
            .groupby(["st", "pr"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["st", "pr"]).aggregate(
            Sum("pn", alias_name="n"), Sum("pc_", alias_name="c"))
    ).to_pandas()
    rows = []
    for st, g in cells.groupby("st"):
        rows.append({"gid": 0, "o_orderstatus": st,
                     "o_orderpriority": None,
                     "n": int(g["n"].sum()), "revenue_c": int(g["c"].sum())})
    for pr, g in cells.groupby("pr"):
        rows.append({"gid": 1, "o_orderstatus": None,
                     "o_orderpriority": pr,
                     "n": int(g["n"].sum()), "revenue_c": int(g["c"].sum())})
    rows.append({"gid": 2, "o_orderstatus": None, "o_orderpriority": None,
                 "n": int(cells["n"].sum()),
                 "revenue_c": int(cells["c"].sum())})
    return pd.DataFrame(rows).sort_values(
        ["gid", "o_orderstatus", "o_orderpriority"],
        na_position="last").reset_index(drop=True) \
        .astype({"gid": np.int64, "n": np.int64, "revenue_c": np.int64})


SQL_GROUPING_SETS = """
SELECT 0 AS gid, o_orderstatus, CAST(NULL AS VARCHAR)
         AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
         AS revenue_c
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT 1, CAST(NULL AS VARCHAR), o_orderpriority,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 2, NULL, NULL, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
FROM orders
ORDER BY gid, o_orderstatus, o_orderpriority
"""


def q_user_event_journey(sf_dir: str):
    """Per-user ordered event-type journey string (the collect_list /
    STRING_AGG ORDER BY surface): one coarse user-bucket shuffle, then
    a per-bucket vectorized sort + pandas grouped join — the string
    assembly is necessarily per-user, but the output (and the python
    work) is USER-bounded, never event-bounded."""
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts", "event_id"])
        out = df.groupby("user_id", sort=False)["event_type"] \
            .agg([(">".join), "size"]).reset_index()
        out.columns = ["user_id", "journey", "n_events"]
        return out

    out = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": np.int64, "n_events": np.int64})


SQL_JOURNEY = """
SELECT user_id,
       STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS journey,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


def _synthetic_links(sf_dir: str):
    """The deterministic 3-out synthetic link graph shared by the
    pagerank / triangle / k-core query family (src·7919 + k·104729
    mod n) — reproduced as a CTE in every SQL twin."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return docs.map_batches(edges, batch_format="pyarrow"), n


_SQL_LINKS_CTE = """
raw AS (
  SELECT doc_id AS src,
         (doc_id * 7919 + k * 104729)
           % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents
  CROSS JOIN (VALUES (1), (2), (3)) t(k)),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM raw WHERE src <> dst),
sym AS (SELECT a AS u, b AS v FROM und
        UNION ALL SELECT b, a FROM und)
"""


def _sym_adjacency(t: pa.Table) -> pa.Table:
    """(pivot, leaf) symmetric adjacency rows from an (ea, eb)
    undirected edge table — shared by the link-prediction family."""
    a = t["ea"].to_numpy(zero_copy_only=False)
    b = t["eb"].to_numpy(zero_copy_only=False)
    return pa.table({
        "pivot": pa.array(np.concatenate([a, b])),
        "leaf": pa.array(np.concatenate([b, a]))})


def q_link_prediction_cn(sf_dir: str):
    """Link prediction by common-neighbor count: for every NON-edge
    vertex pair with ≥1 common neighbor, cn(u,v) = |N(u) ∩ N(v)| —
    exact integers via the cooccurrence kernel over the symmetric
    adjacency (each common neighbor w pivots the pair once), then an
    anti-join against the edge set and a (cn DESC, a, b) top-25.
    The Σ deg² wedge explosion is the exact-semantics cost — the
    kernel's per-key cap is OFF here because exactness is the contract
    (cap it for power-law graphs and document the recall tradeoff)."""
    from ray.data.aggregate import Sum
    edges, n = _synthetic_links(sf_dir)

    from ..stages.graph_ops import _normalize_undirected
    und = _normalize_undirected(edges, "src", "dst").materialize()

    sym = _sym_adjacency

    pairs = relational.cooccurrence_pairs(
        und.map_batches(sym, batch_format="pyarrow"),
        key_col="pivot", val_col="leaf", max_vals_per_key=None)

    # anti-join against existing edges on the (a, b) pair key
    und_t = relational.ds_to_table(und)
    edge_keys = np.sort(
        und_t["ea"].to_numpy(zero_copy_only=False).astype(np.int64)
        * (1 << 32)
        + und_t["eb"].to_numpy(zero_copy_only=False).astype(np.int64))
    import ray
    ek_ref = ray.put(edge_keys)

    def drop_edges(t: pa.Table) -> pa.Table:
        from ..stages.relational import worker_cached
        ek = worker_cached(("lp_edges", ek_ref), lambda: ray.get(ek_ref))
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = a * (1 << 32) + b
        pos = np.minimum(np.searchsorted(ek, key), len(ek) - 1)
        keep = ek[pos] != key              # vectorized non-membership
        out = t.filter(pa.array(keep))
        # per-block prune to k so the driver merge is blocks×k
        return out.rename_columns(["a", "b", "cn"]) \
            .sort_by([("cn", "descending"), ("a", "ascending"),
                      ("b", "ascending")]).slice(0, 25)

    pruned = relational.ds_to_table(
        pairs.map_batches(drop_edges, batch_format="pyarrow"))
    top = pruned.sort_by([("cn", "descending"), ("a", "ascending"),
                          ("b", "ascending")]).slice(0, 25)
    return top.to_pandas().astype({"a": np.int64, "b": np.int64,
                                   "cn": np.int64})


SQL_LINK_PRED = f"""
WITH {_SQL_LINKS_CTE},
cn AS (SELECT e1.v AS a, e2.v AS b, CAST(COUNT(*) AS BIGINT) AS cn
       FROM sym e1 JOIN sym e2 ON e1.u = e2.u AND e1.v < e2.v
       GROUP BY 1, 2),
nonedge AS (SELECT cn.* FROM cn
            LEFT JOIN und ON cn.a = und.a AND cn.b = und.b
            WHERE und.a IS NULL)
SELECT a, b, cn FROM nonedge
ORDER BY cn DESC, a, b LIMIT 25
"""


def q_neighbor_jaccard_topk(sf_dir: str):
    """Structural-similarity top-k: Jaccard of neighborhoods
    cn / (deg_u + deg_v − cn) over vertex pairs with ≥1 common
    neighbor — the common-neighbor table from the cooccurrence kernel
    plus a broadcast degree attach; exact ints until the one mirrored
    division, ordered (jacc DESC, a, b)."""
    from ray.data.aggregate import Sum
    edges, n = _synthetic_links(sf_dir)

    from ..stages.graph_ops import _normalize_undirected
    und = _normalize_undirected(edges, "src", "dst").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        nn = np.concatenate(
            [t["ea"].to_numpy(zero_copy_only=False),
             t["eb"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        uniq, cnt = np.unique(nn, return_counts=True)
        return pa.table({"node": pa.array(uniq),
                         "pn": pa.array(cnt.astype(np.int64))})

    deg = relational.ds_to_table(
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node").aggregate(Sum("pn", alias_name="deg")))
    ids = deg["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = deg["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids)
    import ray
    ref = ray.put((ids[order], dv[order]))

    sym = _sym_adjacency

    pairs = relational.cooccurrence_pairs(
        und.map_batches(sym, batch_format="pyarrow"),
        key_col="pivot", val_col="leaf", max_vals_per_key=None)

    def score(t: pa.Table) -> pa.Table:
        from ..stages.relational import worker_cached
        _ids, _dv = worker_cached(("nj_deg", ref), lambda: ray.get(ref))
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = t["n_keys"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        da = _dv[np.searchsorted(_ids, a)]
        db = _dv[np.searchsorted(_ids, b)]
        jacc = cn.astype(np.float64) / (da + db - cn).astype(np.float64)
        # sort on the UNROUNDED double (the SQL ORDER BY does too);
        # rounding happens only on the returned column
        out = pa.table({"a": pa.array(a), "b": pa.array(b),
                        "cn": pa.array(cn),
                        "jacc": pa.array(jacc)})
        return out.sort_by([("jacc", "descending"), ("a", "ascending"),
                            ("b", "ascending")]).slice(0, 25)

    pruned = relational.ds_to_table(
        pairs.map_batches(score, batch_format="pyarrow"))
    top = pruned.sort_by([("jacc", "descending"), ("a", "ascending"),
                          ("b", "ascending")]).slice(0, 25).to_pandas()
    top["jacc"] = np.round(top["jacc"], 6)
    return top.astype({"a": np.int64, "b": np.int64, "cn": np.int64})


SQL_NEIGHBOR_JACCARD = f"""
WITH {_SQL_LINKS_CTE},
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1),
cn AS (SELECT e1.v AS a, e2.v AS b, CAST(COUNT(*) AS BIGINT) AS cn
       FROM sym e1 JOIN sym e2 ON e1.u = e2.u AND e1.v < e2.v
       GROUP BY 1, 2)
SELECT a, b, cn,
       ROUND(CAST(cn AS DOUBLE)
             / CAST(da.deg + db.deg - cn AS DOUBLE), 6) AS jacc
FROM cn JOIN deg da ON cn.a = da.node
        JOIN deg db ON cn.b = db.node
ORDER BY CAST(cn AS DOUBLE)
         / CAST(da.deg + db.deg - cn AS DOUBLE) DESC, a, b
LIMIT 25
"""


def q_json_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` field out of
    the events ``props`` JSON column with ONE vectorized Arrow regex
    (no per-row json.loads), then exact per-type stats — the
    JSON-column pattern every event pipeline hits.  Rows whose props
    don't carry the key count as nulls."""
    from ray.data.aggregate import Max, Min, Sum
    ev = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        # float-tolerant capture; round half-away like SQL CAST(x AS
        # BIGINT) so "k": 3.5 agrees with the oracle's 4, not a
        # truncated 3
        ex = pc.extract_regex(t["props"],
                              r'"k":\s*(?P<k>-?\d+(?:\.\d+)?)')
        k = pc.struct_field(ex, "k")
        kn = pd.to_numeric(pd.Series(
            k.to_pandas()), errors="coerce")
        rounded = np.sign(kn.to_numpy(np.float64)) * np.floor(
            np.abs(kn.to_numpy(np.float64)) + 0.5)
        kr = pd.Series(rounded)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(
                zero_copy_only=False),
            "pn": 1,
            "pmiss": kn.isna().to_numpy().astype(np.int64),
            "pk": kr.fillna(0).to_numpy().astype(np.int64)})
        # sentinels survive only while SOME row in the group has k;
        # the all-missing case is repaired to NULL at the finish
        df["pmin"] = kr.fillna(np.iinfo(np.int64).max).to_numpy() \
            .astype(np.int64)
        df["pmax"] = kr.fillna(np.iinfo(np.int64).min).to_numpy() \
            .astype(np.int64)
        g = df.groupby("event_type", sort=False).agg(
            pn=("pn", "sum"), pmiss=("pmiss", "sum"),
            pk=("pk", "sum"), pmin=("pmin", "min"),
            pmax=("pmax", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type").aggregate(
            Sum("pn", alias_name="n"),
            Sum("pmiss", alias_name="n_missing"),
            Sum("pk", alias_name="sum_k"),
            Min("pmin", alias_name="min_k"),
            Max("pmax", alias_name="max_k"))
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    o = o.astype({"n": np.int64, "n_missing": np.int64,
                  "sum_k": np.int64})
    # all-missing group: SQL MIN/MAX over NULLs is NULL, not sentinel
    allmiss = o["n_missing"] == o["n"]
    o["min_k"] = o["min_k"].astype(np.float64)
    o["max_k"] = o["max_k"].astype(np.float64)
    o.loc[allmiss, ["min_k", "max_k"]] = np.nan
    return o


SQL_JSON_PROPS = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       CAST(SUM(COALESCE(CAST(json_extract(props, '$.k') AS BIGINT),
                         0)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1 ORDER BY 1
"""


def q_mst_links(sf_dir: str):
    """Borůvka minimum spanning forest over the synthetic link graph
    (deterministic hash weights) — rounds are O(log V), each round one
    streaming edge pass + a component-bounded driver union-find; see
    ``graph_ops.minimum_spanning_forest``.  Not SQL-expressible;
    pinned by a pytest Kruskal cross-check (identical total weight and
    edge count on the same weighted fixture graph)."""
    from ..stages import graph_ops
    edges, n = _synthetic_links(sf_dir)
    mst, total, comps = graph_ops.minimum_spanning_forest(edges)
    return pd.DataFrame([{
        "n_nodes_spanned": int(mst.num_rows + comps),
        "n_edges": int(mst.num_rows),
        "total_weight": int(total),
        "n_components": int(comps)}])


def q_k_truss_links(sf_dir: str):
    """3-truss of the synthetic link graph (every surviving edge in
    ≥ 1 triangle within the SURVIVING subgraph — the fixed point, not
    a one-shot filter) — iterative support peel on degree-oriented
    wedges; see ``graph_ops.k_truss``.  k=3 because the sparse 3-out
    synthetic graph has triangles but no 4-truss.  Not SQL-expressible
    (iterative fixed point); pinned by golden-graph pytests (K4
    survives the 4-truss with support 2, C5 empties, pendants drop)."""
    from ..stages import graph_ops
    edges, n = _synthetic_links(sf_dir)
    t = graph_ops.k_truss(edges, k=3)
    df = t.to_pandas().sort_values(["ea", "eb"]).reset_index(drop=True)
    return df.astype({"ea": np.int64, "eb": np.int64,
                      "support": np.int64})


def q_cume_dist_acctbal(sf_dir: str):
    """CUME_DIST within nation — the ≤-fraction sibling of
    PERCENT_RANK: cd = |{rows with value ≤ v}| / n, max-rank ties.
    Same natural ≤25-way partition shape: per-nation vectorized
    searchsorted(side='right'), one division mirrored against SQL."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(g["c_acctbal"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        sc = np.sort(cents)
        le = np.searchsorted(sc, cents, side="right")
        cd = le.astype(np.float64) / float(len(g))
        return pd.DataFrame({"c_custkey": g["c_custkey"].to_numpy(),
                             "cd": np.round(cd, 6)})

    out = cust.groupby("c_nationkey").map_groups(
        per_nation, batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)


SQL_CUME_DIST = """
SELECT c_custkey,
       ROUND(CUME_DIST() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT)), 6) AS cd
FROM customer ORDER BY c_custkey
"""


def q_cdc_soft_delete_read(sf_dir: str):
    """Deletion-vector read (the lakehouse CDC soft-delete pattern):
    the base table stays immutable; a separate delete-key set (here the
    deterministic o_orderkey % 97 == 0 tombstones) is broadcast once
    via ``ray.put`` and applied per batch with a vectorized
    searchsorted anti-filter at SCAN time — no rewrite of the base
    files.  The oracle applies the same predicate, so a leaky mask
    breaks the hash."""
    import ray

    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_totalprice"])
    # the "deletion vector": key set from a side scan (tombstone table)
    def tombstones(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"o_orderkey": pa.array(k[k % 97 == 0])})

    dels = relational.ds_to_table(
        orders.select_columns(["o_orderkey"])
        .map_batches(tombstones, batch_format="pyarrow"))
    dkeys = np.sort(dels["o_orderkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
    dref = ray.put(dkeys)

    def apply_dv(t: pa.Table) -> pa.Table:
        from ..stages.relational import worker_cached
        dk = worker_cached(("dv_orders", dref), lambda: ray.get(dref))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.minimum(np.searchsorted(dk, k),
                         max(len(dk) - 1, 0))
        live = dk[pos] != k if len(dk) else np.ones(len(k), bool)
        t = t.filter(pa.array(live))
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_orderstatus":
                          t["o_orderstatus"].to_numpy(
                              zero_copy_only=False),
                          "pn": 1, "pc_": cents}) \
            .groupby("o_orderstatus", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        orders.map_batches(apply_dv, batch_format="pyarrow")
        .groupby("o_orderstatus").aggregate(
            Sum("pn", alias_name="n"),
            Sum("pc_", alias_name="revenue_c"))
    ).to_pandas().sort_values("o_orderstatus").reset_index(drop=True)
    return o.astype({"n": np.int64, "revenue_c": np.int64})


SQL_CDC_SOFT_DELETE = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
         AS revenue_c
FROM orders WHERE o_orderkey % 97 <> 0
GROUP BY 1 ORDER BY 1
"""


def _ensure_clustered_orders(sf_dir: str) -> str:
    """Materialize (once per input fingerprint) the day-range-clustered
    orders layout shared by the zone-map scan and the layout audit —
    factored out so the audit doesn't piggyback on another query's
    side effect."""
    import glob
    import os
    import uuid

    from ..runtime.checkpoint import write_clustered

    out = _fingerprint_cache_dir(sf_dir, "orders", "zonemap")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"

        def add_day(t: pa.Table) -> pa.Table:
            day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64) \
                // 86_400_000_000
            return t.append_column("day", pa.array(day))

        write_clustered(
            _read(sf_dir, "orders",
                  ["o_orderdate", "o_orderpriority", "o_totalprice"])
            .map_batches(add_day, batch_format="pyarrow"),
            tmp, key_col="day", num_ranges=16)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_zonemap_pruned_scan(sf_dir: str):
    """Zone-map (min/max statistics) file skipping: orders are written
    once through ``write_clustered`` (range-partitioned on the epoch
    day, globally ordered files), a min/max manifest is built from the
    parquet FOOTERS, and a date-range query then opens ONLY the files
    whose [min, max] overlaps the predicate — stats-based skipping,
    the complement of hive value-partition pruning.  The pruned file
    count is asserted in pytest; the oracle runs the same predicate on
    the original table."""
    import glob
    import os
    import uuid

    import pyarrow.parquet as pq_
    import ray.data as rd

    from ray.data.aggregate import Sum
    from ..runtime.checkpoint import write_clustered

    out = _ensure_clustered_orders(sf_dir)
    files = sorted(glob.glob(os.path.join(out, "part=*", "*.parquet")))
    # zone map from footers only (no data read on the driver)
    lo_day = int(pd.Timestamp("1995-01-01").value // 1000
                 // 86_400_000_000)
    hi_day = int(pd.Timestamp("1995-12-31").value // 1000
                 // 86_400_000_000)
    keep = []
    for f in files:
        md = pq_.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}["day"]
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if min(mins) <= hi_day and max(maxs) >= lo_day:
            keep.append(f)
    q_zonemap_pruned_scan._last_prune = (len(files), len(keep))

    part = rd.read_parquet(keep, columns=["day", "o_orderpriority",
                                          "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["day"].to_numpy(zero_copy_only=False)
        m = (day >= lo_day) & (day <= hi_day)
        t = t.filter(pa.array(m))
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"o_orderpriority":
                          t["o_orderpriority"].to_numpy(
                              zero_copy_only=False),
                          "pn": 1, "pc_": cents}) \
            .groupby("o_orderpriority", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        part.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority").aggregate(
            Sum("pn", alias_name="n"),
            Sum("pc_", alias_name="revenue_c"))
    ).to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    return o.astype({"n": np.int64, "revenue_c": np.int64})


SQL_ZONEMAP = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
         AS revenue_c
FROM orders
WHERE epoch_us(o_orderdate) // 86400000000
      BETWEEN epoch_us(TIMESTAMP '1995-01-01') // 86400000000
          AND epoch_us(TIMESTAMP '1995-12-31') // 86400000000
GROUP BY 1 ORDER BY 1
"""


def _langid_pred_sql_body() -> str:
    """The shared scored→pred CTE body for langid-derived oracles —
    generated from the SAME ``text._LANG_PROFILES`` dict as the Ray
    stage, so the two sides cannot drift (same contract as
    ``_langid_sql``)."""
    langs = list(text._LANG_PROFILES)
    pats = {
        lg: r"\b(?:" + "|".join(sorted(prof, key=len, reverse=True))
        + r")\b"
        for lg, prof in text._LANG_PROFILES.items()}
    counts = ",\n    ".join(
        f"length(regexp_extract_all(lower(text), '{pats[lg]}')) AS c_{lg}"
        for lg in langs)
    all_c = ", ".join(f"c_{lg}" for lg in langs)
    branches = []
    for i, lg in enumerate(langs):
        conds = " AND ".join(f"c_{lg} >= c_{other}"
                             for other in langs[i + 1:])
        branches.append(f"WHEN {conds or 'TRUE'} THEN '{lg}'")
    case = "\n      ".join(branches)
    return f"""
scored AS (
  SELECT lang,
    {counts}
  FROM documents
),
pred AS (
  SELECT lang,
    CASE WHEN GREATEST({all_c}) = 0 THEN 'und'
      {case}
    END AS lang_pred
  FROM scored
)"""


_LANGID_CONF_MEMO: dict = {}


def q_langid_confusion(sf_dir: str):
    """Classifier-evaluation confusion matrix: true ``lang`` × LangId
    prediction counts — the model-eval surface over the same stateful
    actor-pool stage `langid_documents` benches; exact counts, tiny
    (langs²-bounded) shuffle.  Memoized per input fingerprint so the
    precision/recall query doesn't re-classify the corpus."""
    memo_key = _fingerprint_cache_dir(sf_dir, "documents", "langconf")
    hit = _LANGID_CONF_MEMO.get(memo_key)
    if hit is not None:
        return hit.copy()
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents", ["lang", "text"])
    pred = docs.map_batches(text.LangId, batch_format="pandas",
                            concurrency=2)

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "lang_pred": t["lang_pred"].to_numpy(zero_copy_only=False),
            "pn": 1}).groupby(["lang", "lang_pred"], sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        pred.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"]).aggregate(
            Sum("pn", alias_name="n"))
    ).to_pandas().sort_values(["lang", "lang_pred"]) \
        .reset_index(drop=True)
    o = o.astype({"n": np.int64})
    _LANGID_CONF_MEMO.clear()          # one entry: bounded memory
    _LANGID_CONF_MEMO[memo_key] = o.copy()
    return o


def _langid_confusion_sql() -> str:
    return f"""
WITH {_langid_pred_sql_body()}
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


SQL_LANGID_CONFUSION = _langid_confusion_sql()


def q_langid_precision_recall(sf_dir: str):
    """Per-language precision / recall / F1 of the LangId classifier
    against the true labels — the evaluation-metrics finish over the
    langs²-bounded confusion matrix; tp/fp/fn are exact ints, each
    metric is ONE mirrored division (F1 from the same p and r
    doubles), NULL when the denominator is zero like SQL x/0."""
    conf = q_langid_confusion(sf_dir)
    langs = sorted(set(conf["lang"]) | set(conf["lang_pred"]))
    rows = []
    for lg in langs:
        tp = int(conf.loc[(conf["lang"] == lg)
                          & (conf["lang_pred"] == lg), "n"].sum())
        fp = int(conf.loc[(conf["lang"] != lg)
                          & (conf["lang_pred"] == lg), "n"].sum())
        fn = int(conf.loc[(conf["lang"] == lg)
                          & (conf["lang_pred"] != lg), "n"].sum())
        p = None if tp + fp == 0 else tp / (tp + fp)
        r = None if tp + fn == 0 else tp / (tp + fn)
        f1 = None if p is None or r is None or p + r == 0 \
            else 2.0 * p * r / (p + r)
        rows.append({
            "lang": lg, "tp": tp, "fp": fp, "fn": fn,
            "precision": None if p is None else round(p, 6),
            "recall": None if r is None else round(r, 6),
            "f1": None if f1 is None else round(f1, 6)})
    return pd.DataFrame(rows).astype({"tp": np.int64, "fp": np.int64,
                                      "fn": np.int64})


def _langid_pr_sql() -> str:
    return f"""
WITH {_langid_pred_sql_body()},
conf AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
         FROM pred GROUP BY 1, 2),
cls AS (SELECT lang AS lg FROM conf
        UNION SELECT lang_pred FROM conf),
m AS (SELECT lg,
             COALESCE((SELECT SUM(n) FROM conf
                       WHERE lang = lg AND lang_pred = lg), 0) AS tp,
             COALESCE((SELECT SUM(n) FROM conf
                       WHERE lang <> lg AND lang_pred = lg), 0) AS fp,
             COALESCE((SELECT SUM(n) FROM conf
                       WHERE lang = lg AND lang_pred <> lg), 0) AS fn
      FROM cls),
pr AS (SELECT lg, tp, fp, fn,
              CASE WHEN tp + fp = 0 THEN NULL
                   ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS p,
              CASE WHEN tp + fn = 0 THEN NULL
                   ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS r
       FROM m)
SELECT lg AS lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       ROUND(p, 6) AS precision, ROUND(r, 6) AS recall,
       CASE WHEN p IS NULL OR r IS NULL OR p + r = 0 THEN NULL
            ELSE ROUND(2.0 * p * r / (p + r), 6) END AS f1
FROM pr ORDER BY lang
"""


SQL_LANGID_PR = _langid_pr_sql()


def q_media_thumbnails(sf_dir: str):
    """Thumbnail generation over the deterministic synthetic media
    table: actor-pool decode → 8×8 nearest-resize → BMP re-encode,
    exact per-channel pixel sums as the integrity signal.  Rows-only
    (binary source isn't SQL-visible); the resize/re-encode round trip
    is pinned by pytest (re-decoding the emitted thumb reproduces the
    sums)."""
    from ..stages.multimodal import ThumbnailEncoder, synth_media_table
    ds = rd.from_arrow(synth_media_table(64))
    out = ds.map_batches(ThumbnailEncoder, batch_format="pyarrow",
                         batch_size=16, concurrency=(1, 2),
                         zero_copy_batch=True)
    df = relational.ds_to_table(
        out.select_columns(["media_id", "sum_r", "sum_g", "sum_b",
                            "is_image"])
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    return df.astype({"sum_r": np.int64, "sum_g": np.int64,
                      "sum_b": np.int64})


def q_time_travel_read(sf_dir: str):
    """Snapshot / time-travel reads: two manifest versions over the
    same immutable file pool (v1 = the early half of the order stream,
    v2 = v1 + the late files, nothing rewritten), then the SAME
    aggregate executed AS OF each version — the lakehouse property
    that a reader pins a manifest, not a directory.  The oracle
    replicates both snapshots by predicate, so manifest-routing bugs
    break the hash."""
    import json
    import os
    import uuid

    import pyarrow.parquet as pq_
    import ray.data as rd

    from ray.data.aggregate import Sum

    out = _fingerprint_cache_dir(sf_dir, "orders", "timetravel")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        os.makedirs(tmp, exist_ok=True)
        t = relational.ds_to_table(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                     "o_totalprice"]))
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        lo, hi = int(day.min()), int(day.max())
        mid = lo + (hi - lo) // 2
        early = pa.array(day <= mid)
        pq_.write_table(t.filter(early),
                        os.path.join(tmp, "early.parquet"))
        pq_.write_table(t.filter(pc.invert(early)),
                        os.path.join(tmp, "late.parquet"))
        with open(os.path.join(tmp, "manifest-v1.json"), "w") as fh:
            json.dump({"files": ["early.parquet"], "mid_day": mid}, fh)
        with open(os.path.join(tmp, "manifest-v2.json"), "w") as fh:
            json.dump({"files": ["early.parquet", "late.parquet"],
                       "mid_day": mid}, fh)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    def snapshot(version: int) -> pd.Series:
        with open(os.path.join(out, f"manifest-v{version}.json")) as fh:
            m = json.load(fh)
        files = [os.path.join(out, f) for f in m["files"]]
        ds = rd.read_parquet(files, columns=["o_totalprice"])

        def partial(t: pa.Table) -> pa.Table:
            cents = np.round(t["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            return pa.table({"pn": pa.array([len(cents)]),
                             "pc_": pa.array([int(cents.sum())])})

        agg = ds.map_batches(partial, batch_format="pyarrow") \
            .aggregate(Sum("pn", alias_name="n"),
                       Sum("pc_", alias_name="c"))
        return int(agg["n"]), int(agg["c"])

    rows = []
    for v in (1, 2):
        n, c = snapshot(v)
        rows.append({"version": v, "n": n, "revenue_c": c})
    return pd.DataFrame(rows).astype({"version": np.int64,
                                      "n": np.int64,
                                      "revenue_c": np.int64})


SQL_TIME_TRAVEL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(ROUND(o_totalprice * 100) AS HUGEINT) AS c
           FROM orders),
b AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid FROM d)
SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS revenue_c
FROM d, b WHERE day <= mid
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT) FROM d
ORDER BY version
"""


def q_stratified_kfold(sf_dir: str):
    """Stratified k-fold assignment: within each lang stratum, docs
    round-robin into 5 folds in doc_id order, so every fold holds
    ⌈n_s/5⌉-or-⌊n_s/5⌋ rows of EVERY stratum (the property plain hash
    splitting only approaches in expectation).  Rank-within-stratum
    comes from the per-(lang)-bucket sort — one bounded shuffle; the
    output here is the (lang, fold) size matrix."""
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values("doc_id")
        fold = np.arange(len(df), dtype=np.int64) % 5
        out = pd.DataFrame({"lang": df["lang"].to_numpy(),
                            "fold": fold, "pn": 1})
        return out.groupby(["lang", "fold"], sort=False).sum() \
            .reset_index()

    o = relational.ds_to_table(
        docs.groupby("lang").map_groups(per_lang,
                                        batch_format="pandas")
        .groupby(["lang", "fold"]).aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values(["lang", "fold"]).reset_index(drop=True)
    return o.astype({"fold": np.int64, "n": np.int64})


SQL_STRATIFIED_KFOLD = """
WITH r AS (SELECT lang,
                  (ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY doc_id) - 1) % 5 AS fold
           FROM documents)
SELECT lang, CAST(fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_shuffle_skew_report(sf_dir: str):
    """Join-key skew introspection — the report the adaptive join
    planner acts on: per-key counts for l_orderkey reduce to
    DISTRIBUTION-OF-COUNTS form (how many keys have multiplicity m),
    plus max/mean ratio per bucket — all exact ints, bounded by the
    multiplicity domain (≤ 7 for TPC-H lineitem), never by keys."""
    from ray.data.aggregate import Sum
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, c = np.unique(k, return_counts=True)
        g = pd.DataFrame({"l_orderkey": u, "pm": c.astype(np.int64)})
        return pa.Table.from_pandas(g, preserve_index=False)

    mult = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("pm", alias_name="m"))

    def hist_partial(t: pa.Table) -> pa.Table:
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(m, return_counts=True)
        return pa.table({"multiplicity": pa.array(u),
                         "pk": pa.array(c.astype(np.int64))})

    o = relational.ds_to_table(
        mult.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("multiplicity").aggregate(Sum("pk",
                                               alias_name="n_keys"))
    ).to_pandas().sort_values("multiplicity").reset_index(drop=True)
    return o.astype({"multiplicity": np.int64, "n_keys": np.int64})


SQL_SKEW_REPORT = """
WITH m AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS mult
           FROM lineitem GROUP BY 1)
SELECT mult AS multiplicity, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM m GROUP BY 1 ORDER BY 1
"""


def q_rfm_segmentation(sf_dir: str):
    """RFM customer segmentation: NTILE(5) scores for Recency (last
    order day), Frequency (order count) and Monetary (exact cents),
    each over the deterministic (metric, custkey) total order.  NTILE
    itself is pure integer arithmetic under the FRONT-LOADED-remainder
    rule (base = n//k, rem = n%k, the first rem tiles hold base+1 rows
    — exactly SQL's semantics; the interleaving floor(rank·k/n)
    formula diverges whenever n % k ∈ {2, 3}, see
    ``relational.grouped_ntile``'s docstring) — and rn
    comes from the range-bucket ``global_prefix_sum`` over the UNIQUE
    composite key metric·2³² + custkey (no global sort, nothing
    row-scaled on the driver; composite packing bounds metric < 2³¹,
    documented).  Three prefix passes over a DIMENSION-sized table."""
    from ray.data.aggregate import Max, Sum
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"c": t["o_custkey"].to_numpy(
            zero_copy_only=False).astype(np.int64),
            "pd_": day, "pn": 1, "pm": cents}) \
            .groupby("c", sort=False) \
            .agg(pd_=("pd_", "max"), pn=("pn", "sum"),
                 pm=("pm", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("c").aggregate(
            Max("pd_", alias_name="r_day"),
            Sum("pn", alias_name="f_cnt"),
            Sum("pm", alias_name="m_cents")).materialize()
    n = m.count()

    def with_key(col):
        def f(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            if v.size and (v.max() >= 1 << 31 or c.max() >= 1 << 32):
                raise ValueError("RFM composite packing bound")
            k = v * (1 << 32) + c
            return pa.table({"c": pa.array(c), "one": pa.array(
                np.ones(len(c), dtype=np.int64)), "key": pa.array(k)})
        return f

    scores = {}
    for col, name in (("r_day", "r_score"), ("f_cnt", "f_score"),
                      ("m_cents", "m_score")):
        ranked = relational.global_prefix_sum(
            m.map_batches(with_key(col), batch_format="pyarrow"),
            order_col="key", value_col="one", out_col="rn")

        def tile(t: pa.Table, _name=name) -> pa.Table:
            rank0 = t["rn"].to_numpy(zero_copy_only=False) \
                .astype(np.int64) - 1
            base, rem = divmod(n, 5)
            cutoff = rem * (base + 1)
            tl = np.where(rank0 < cutoff,
                          rank0 // max(base + 1, 1),
                          rem + (rank0 - cutoff) // max(base, 1)) + 1
            return pa.table({"c": t["c"], _name: pa.array(
                tl.astype(np.int64))})

        scores[name] = relational.ds_to_table(
            ranked.map_batches(tile, batch_format="pyarrow")
        ).to_pandas().set_index("c")[name]

    out = pd.DataFrame(scores).reset_index() \
        .rename(columns={"c": "c_custkey"}) \
        .sort_values("c_custkey").reset_index(drop=True)
    return out.astype({"c_custkey": np.int64, "r_score": np.int64,
                       "f_score": np.int64, "m_score": np.int64})


SQL_RFM = """
WITH m AS (SELECT o_custkey AS c,
                  MAX(epoch_us(o_orderdate) // 86400000000) AS r_day,
                  CAST(COUNT(*) AS BIGINT) AS f_cnt,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                       AS BIGINT) AS m_cents
           FROM orders GROUP BY 1)
SELECT c AS c_custkey,
       CAST(NTILE(5) OVER (ORDER BY r_day, c) AS BIGINT) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY f_cnt, c) AS BIGINT) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY m_cents, c) AS BIGINT) AS m_score
FROM m ORDER BY c_custkey
"""


def q_skipgram_event_pairs(sf_dir: str):
    """Sequence mining: skip-gram event-type pairs — (aᵢ, aⱼ) counts
    for 1 ≤ j−i ≤ 3 within a user's (ts, event_id)-ordered stream (the
    co-occurrence-with-order statistic behind sequence embeddings).
    One user-bucket shuffle; per bucket the three gap distances are
    pure vectorized shifts; output is bounded by event-type² × 3."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        parts = []
        for d in (1, 2, 3):
            same = u[d:] == u[:-d]
            parts.append(pd.DataFrame({
                "a": et[:-d][same], "b": et[d:][same],
                "gap": np.int64(d), "pn": 1}))
        allp = pd.concat(parts)
        return allp.groupby(["a", "b", "gap"], sort=False).sum() \
            .reset_index()

    o = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
        .groupby(["a", "b", "gap"]).aggregate(Sum("pn",
                                                  alias_name="n"))
    ).to_pandas().sort_values(["a", "b", "gap"]).reset_index(drop=True)
    return o.astype({"gap": np.int64, "n": np.int64})


SQL_SKIPGRAM = """
WITH o AS (SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events)
SELECT x.event_type AS a, y.event_type AS b,
       CAST(y.rn - x.rn AS BIGINT) AS gap,
       CAST(COUNT(*) AS BIGINT) AS n
FROM o x JOIN o y ON x.user_id = y.user_id
     AND y.rn - x.rn BETWEEN 1 AND 3
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_mom_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth: exact-cents monthly reduce,
    then the MONTHS-bounded LAG finish — growth = (cur − prev)/prev as
    the one mirrored division (NULL on the first month like SQL
    LAG)."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dt = pd.DatetimeIndex(t["o_orderdate"].to_numpy(
            zero_copy_only=False))
        month = (dt.year * 100 + dt.month).to_numpy(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"month": month, "pc_": cents}) \
            .groupby("month", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    d = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("month").aggregate(Sum("pc_", alias_name="rev"))
    ).to_pandas().sort_values("month").reset_index(drop=True)
    rev = d["rev"].to_numpy(np.int64)
    growth = np.full(len(d), np.nan)
    if len(d) > 1:
        growth[1:] = np.round(
            (rev[1:] - rev[:-1]).astype(np.float64)
            / rev[:-1].astype(np.float64), 6)
    return pd.DataFrame({"month": d["month"].astype(np.int64),
                         "rev_c": rev, "growth": growth})


SQL_MOM_GROWTH = """
WITH m AS (SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                       AS BIGINT) AS month,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                       AS BIGINT) AS rev_c
           FROM orders GROUP BY 1)
SELECT month, rev_c,
       ROUND(CAST(rev_c - LAG(rev_c) OVER (ORDER BY month) AS DOUBLE)
             / LAG(rev_c) OVER (ORDER BY month), 6) AS growth
FROM m ORDER BY month
"""


def q_dow_seasonality_index(sf_dir: str):
    """Day-of-week seasonality index of order revenue: mean daily
    revenue per weekday ÷ overall mean daily revenue — the additive
    seasonal-decomposition diagnostic.  Exact cents and day counts all
    the way; the index is ONE mirrored division chain.  Weekday from
    pure epoch-day arithmetic ((day + 3) % 7 + 1: 1970-01-01 was a
    Thursday → isodow 4; ISO Monday=1 … Sunday=7, matching DuckDB
    isodow)."""
    d = _daily_revenue_cents(sf_dir)
    day = d["day"].to_numpy(np.int64)
    isodow = (day + 3) % 7 + 1            # 1970-01-01 Thu → isodow 4
    rev = d["rev"].to_numpy(np.int64)
    g = pd.DataFrame({"isodow": isodow, "rev": rev}) \
        .groupby("isodow").agg(n_days=("rev", "size"),
                               rev_c=("rev", "sum")).reset_index()
    total_c = int(g["rev_c"].sum())
    total_d = int(g["n_days"].sum())
    idx = (g["rev_c"].to_numpy(np.float64)
           / g["n_days"].to_numpy(np.float64)) \
        / (float(total_c) / float(total_d))
    out = g.assign(season_idx=np.round(idx, 6)) \
        .sort_values("isodow").reset_index(drop=True)
    return out.astype({"isodow": np.int64, "n_days": np.int64,
                       "rev_c": np.int64})


SQL_DOW_SEASONALITY = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
g AS (SELECT (day + 3) % 7 + 1 AS isodow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(rev) AS BIGINT) AS rev_c
      FROM d GROUP BY 1),
tot AS (SELECT SUM(rev_c) AS tc, SUM(n_days) AS td FROM g)
SELECT isodow, n_days, rev_c,
       ROUND((CAST(rev_c AS DOUBLE) / CAST(n_days AS DOUBLE))
             / (CAST(tc AS DOUBLE) / CAST(td AS DOUBLE)), 6)
         AS season_idx
FROM g, tot ORDER BY isodow
"""


def q_funnel_conversion_1h(sf_dir: str):
    """Time-constrained funnel: of users whose stream contains a
    'click', how many 'purchase' within ONE HOUR of their FIRST click
    — the windowed-conversion metric attribution systems report.  One
    user-bucket shuffle; per bucket the first-click and the
    first-qualifying-purchase come from vectorized groupby mins; the
    output is a single exact-int row."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        t = batch.filter(pa.array(keep))
        b = stable_bucket(t["user_id"], 64)
        return t.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "et": g["event_type"].to_numpy(),
                           "ts": us})
        clicks = df[df["et"] == "click"].groupby("u")["ts"].min()
        if clicks.empty:
            return pd.DataFrame({"pclk": [0], "pconv": [0]})
        pur = df[df["et"] == "purchase"]
        m = pur.merge(clicks.rename("c0"), left_on="u",
                      right_index=True)
        hit = m[(m["ts"] >= m["c0"])
                & (m["ts"] <= m["c0"] + 3_600_000_000)]
        return pd.DataFrame({
            "pclk": [int(len(clicks))],
            "pconv": [int(hit["u"].nunique())]})

    agg = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas") \
        .aggregate(Sum("pclk", alias_name="n_clickers"),
                   Sum("pconv", alias_name="n_converted"))
    n_clk = int(agg["n_clickers"])
    n_conv = int(agg["n_converted"])
    return pd.DataFrame([{
        "n_clickers": n_clk, "n_converted": n_conv,
        "conv_rate": round(float(n_conv) / float(n_clk), 6)}]) \
        .astype({"n_clickers": np.int64, "n_converted": np.int64})


SQL_FUNNEL_1H = """
WITH c AS (SELECT user_id, MIN(ts) AS c0 FROM events
           WHERE event_type = 'click' GROUP BY 1),
conv AS (SELECT DISTINCT c.user_id
         FROM c JOIN events e ON e.user_id = c.user_id
         WHERE e.event_type = 'purchase'
           AND e.ts >= c.c0
           AND e.ts <= c.c0 + INTERVAL 1 HOUR)
SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clickers,
       CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_converted,
       ROUND(CAST((SELECT COUNT(*) FROM conv) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM c) AS DOUBLE), 6)
         AS conv_rate
"""


def q_abc_analysis_parts(sf_dir: str):
    """ABC / Pareto inventory classification: parts ranked by exact
    lineitem revenue (cents), class A = the head reaching 80 % of
    cumulative revenue, B to 95 %, C the tail — thresholds applied as
    the pure-integer rule 20·cum ≤ 16·total / 20·cum ≤ 19·total (no
    float shares).  Rank order is the deterministic (revenue DESC,
    partkey ASC); the running total comes from ``global_prefix_sum``
    over the order-preserving composite (maxrev−rev)·2³² + partkey —
    no global sort.  Output: per-class part counts + revenue."""
    from ray.data.aggregate import Max, Sum
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"p": t["l_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64), "pc_": cents}) \
            .groupby("p", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("p").aggregate(Sum("pc_", alias_name="rev")) \
        .materialize()
    mx = int(rev.aggregate(Max("rev", alias_name="m"))["m"])
    total = int(rev.aggregate(Sum("rev", alias_name="s"))["s"])

    def with_key(t: pa.Table) -> pa.Table:
        from ..stages.relational import pack_desc_rank_key
        r = t["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = pack_desc_rank_key(r, mx, p)  # revenue DESC, partkey ASC
        return pa.table({"rev": pa.array(r), "key": pa.array(key)})

    ranked = relational.global_prefix_sum(
        rev.map_batches(with_key, batch_format="pyarrow"),
        order_col="key", value_col="rev", out_col="cum")

    def classify(t: pa.Table) -> pa.Table:
        cum = t["cum"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        cls = np.where(20 * cum <= 16 * total, "A",
                       np.where(20 * cum <= 19 * total, "B", "C"))
        g = pd.DataFrame({"abc_class": cls, "pn": 1, "pc_": r}) \
            .groupby("abc_class", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        ranked.map_batches(classify, batch_format="pyarrow")
        .groupby("abc_class").aggregate(
            Sum("pn", alias_name="n_parts"),
            Sum("pc_", alias_name="revenue_c"))
    ).to_pandas().sort_values("abc_class").reset_index(drop=True)
    return o.astype({"n_parts": np.int64, "revenue_c": np.int64})


SQL_ABC = """
WITH rev AS (SELECT l_partkey AS p,
                    CAST(SUM(CAST(ROUND(l_extendedprice * 100)
                                  AS HUGEINT)) AS BIGINT) AS rev
             FROM lineitem GROUP BY 1),
r AS (SELECT rev, SUM(rev) OVER (ORDER BY rev DESC, p
                                 ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT SUM(rev) FROM rev) AS total
      FROM rev)
SELECT CASE WHEN 20 * cum <= 16 * total THEN 'A'
            WHEN 20 * cum <= 19 * total THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_c
FROM r GROUP BY 1 ORDER BY 1
"""


def q_encoding_anomaly_scan(sf_dir: str):
    """Data-quality encoding scan: per source, documents containing
    non-ASCII codepoints and the exact non-ASCII character total — the
    mojibake / encoding-drift detector a crawl ingest runs.  One
    vectorized Arrow regex count per batch (no per-row decode
    probing)."""
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        total = pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ascii_only = pc.count_substring_regex(
            t["text"], r"[\x00-\x7F]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        non_ascii = total - ascii_only
        g = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "pn": 1,
            "pdocs": (non_ascii > 0).astype(np.int64),
            "pchars": non_ascii}) \
            .groupby("source", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(
            Sum("pn", alias_name="n_docs"),
            Sum("pdocs", alias_name="docs_non_ascii"),
            Sum("pchars", alias_name="chars_non_ascii"))
    ).to_pandas().sort_values("source").reset_index(drop=True)
    return o.astype({"n_docs": np.int64, "docs_non_ascii": np.int64,
                     "chars_non_ascii": np.int64})


SQL_ENCODING_SCAN = """
WITH x AS (SELECT source,
                  length(text)
                    - length(regexp_replace(text, '[^\\x00-\\x7F]',
                                            '', 'g')) AS na
           FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_non_ascii,
       CAST(SUM(na) AS BIGINT) AS chars_non_ascii
FROM x GROUP BY 1 ORDER BY 1
"""


def q_two_proportion_ztest(sf_dir: str):
    """A/B two-proportion z-test: users split into deterministic arms
    by user_id parity; 'conversion' = the user logged MORE purchase
    than error events (a per-user comparison that never saturates —
    every synthetic user has ≥1 purchase, so presence-based conversion
    would give zero pooled variance).
    Pooled-variance z = (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2)) — user-level
    tallies are exact ints from one user-bucket pass, the z float
    mirrors the SQL text.  Completes the testing family (Welch on
    means, KS / Mann-Whitney on distributions, χ² on categories,
    this on proportions)."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64),
            "p": (et == "purchase").astype(np.int64),
            "e": (et == "error").astype(np.int64)})
        users = df.groupby("u")[["p", "e"]].sum().reset_index()
        arm = users["u"].to_numpy(np.int64) % 2
        conv = (users["p"].to_numpy(np.int64)
                > users["e"].to_numpy(np.int64)).astype(np.int64)
        return pd.DataFrame({
            "pn1": [int((arm == 0).sum())],
            "px1": [int(conv[arm == 0].sum())],
            "pn2": [int((arm == 1).sum())],
            "px2": [int(conv[arm == 1].sum())]})

    agg = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas") \
        .aggregate(Sum("pn1", alias_name="n1"),
                   Sum("px1", alias_name="x1"),
                   Sum("pn2", alias_name="n2"),
                   Sum("px2", alias_name="x2"))
    import math
    n1, x1 = int(agg["n1"]), int(agg["x1"])
    n2, x2 = int(agg["n2"]), int(agg["x2"])
    p1 = x1 / n1
    p2 = x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1.0 - pp)
                              * (1.0 / n1 + 1.0 / n2))
    return pd.DataFrame([{
        "n1": n1, "x1": x1, "n2": n2, "x2": x2,
        "z_stat": round(z, 6)}]) \
        .astype({"n1": np.int64, "x1": np.int64,
                 "n2": np.int64, "x2": np.int64})


SQL_TWO_PROP_Z = """
WITH u AS (SELECT user_id % 2 AS arm,
                  CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END)
                          > SUM(CASE WHEN event_type = 'error'
                                THEN 1 ELSE 0 END)
                       THEN 1 ELSE 0 END AS conv
           FROM events GROUP BY user_id),
s AS (SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                  AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                  AS BIGINT) AS x2
      FROM u),
f AS (SELECT n1, x1, n2, x2,
             CAST(x1 AS DOUBLE) / n1 AS p1,
             CAST(x2 AS DOUBLE) / n2 AS p2,
             CAST(x1 + x2 AS DOUBLE) / (n1 + n2) AS pp
      FROM s)
SELECT n1, x1, n2, x2,
       ROUND((p1 - p2) / SQRT(pp * (1.0 - pp)
                              * (1.0 / n1 + 1.0 / n2)), 6) AS z_stat
FROM f
"""


def q_bearing_sector_histogram(sf_dir: str):
    """Compass-sector histogram of trajectory leg bearings: initial
    great-circle bearing θ = atan2(sin Δλ·cos φ₂, cos φ₁·sin φ₂ −
    sin φ₁·cos φ₂·cos Δλ) per leg (same synthetic lon/lat convention
    and LEAD window as `user_path_length`), normalized with the
    sign-of-dividend fmod chain ((θ%360)+360)%360 — numpy ``fmod``
    matches SQL's ``%`` exactly, ``np.mod`` does NOT — then
    floor(/45) sectors 0–7.  Identical doubles both sides ⇒ identical
    sector assignment; counts exact."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_b", pa.array(
            stable_bucket(t["user_id"], 64)))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"])
        e = df["event_id"].to_numpy(np.int64)
        lng = ((e * 7919) % 1000 + 0.5) / 1000.0 * 360.0 - 180.0
        lat = ((e * 104729) % 1000 + 0.5) / 1000.0 * 160.0 - 80.0
        g = df.groupby("user_id", sort=False)
        nxt = g.cumcount(ascending=False).to_numpy() > 0
        p1 = np.radians(lat[nxt])
        p2 = np.radians(np.roll(lat, -1)[nxt])
        dl = np.radians(np.roll(lng, -1)[nxt]) - np.radians(lng[nxt])
        theta = np.degrees(np.arctan2(
            np.sin(dl) * np.cos(p2),
            np.cos(p1) * np.sin(p2)
            - np.sin(p1) * np.cos(p2) * np.cos(dl)))
        norm = np.fmod(np.fmod(theta, 360.0) + 360.0, 360.0)
        sector = np.floor(norm / 45.0).astype(np.int64)
        u, c = np.unique(sector, return_counts=True)
        return pa.table({"sector": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    o = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_b").map_groups(per_bucket, batch_format="pandas")
        .groupby("sector").aggregate(Sum("pn", alias_name="n_legs"))
    ).to_pandas().sort_values("sector").reset_index(drop=True)
    return o.astype({"sector": np.int64, "n_legs": np.int64})


SQL_BEARING_SECTORS = """
WITH p AS (SELECT user_id, ts, event_id,
                  ((event_id * 7919) % 1000 + 0.5) / 1000.0 * 360.0
                    - 180.0 AS lng,
                  ((event_id * 104729) % 1000 + 0.5) / 1000.0 * 160.0
                    - 80.0 AS lat
           FROM events),
l AS (SELECT user_id, lng, lat,
             LEAD(lng) OVER w AS lng1, LEAD(lat) OVER w AS lat1
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
b AS (SELECT DEGREES(ATAN2(
               SIN(RADIANS(lng1) - RADIANS(lng)) * COS(RADIANS(lat1)),
               COS(RADIANS(lat)) * SIN(RADIANS(lat1))
                 - SIN(RADIANS(lat)) * COS(RADIANS(lat1))
                   * COS(RADIANS(lng1) - RADIANS(lng)))) AS theta
      FROM l WHERE lng1 IS NOT NULL)
SELECT CAST(FLOOR((((theta % 360.0) + 360.0) % 360.0) / 45.0)
            AS BIGINT) AS sector,
       CAST(COUNT(*) AS BIGINT) AS n_legs
FROM b GROUP BY 1 ORDER BY 1
"""


def q_control_chart_revenue(sf_dir: str):
    """Shewhart 3σ control chart over daily revenue: days whose exact
    cents fall outside mean ± 3·σ (population σ from exact power sums
    — cents² rides the (hi, lo) split).  The bounds are ONE mirrored
    float expression; day membership compares identical doubles, so
    the flagged-day set matches SQL exactly."""
    d = _daily_revenue_cents(sf_dir).sort_values("day").reset_index(drop=True)
    rev = [int(v) for v in d["rev"]]
    n = len(rev)
    s1, s2 = sum(rev), sum(v * v for v in rev)
    # round each operand to double FIRST, exactly like the SQL twin's
    # CAST(s AS DOUBLE)/CAST(n AS DOUBLE): python int/int true division
    # is correctly-rounded exact-rational division and diverges 1 ulp
    # once s exceeds 2^53 (s2 is ~1e17 at sf0.001 already)
    mu = float(s1) / float(n)
    sigma = float(np.sqrt(float(s2) / float(n) - mu * mu))
    lo, hi = mu - 3.0 * sigma, mu + 3.0 * sigma
    rv = d["rev"].to_numpy(np.float64)
    out = d[(rv < lo) | (rv > hi)].copy()
    out["rev"] = out["rev"].astype(np.int64)
    return out.rename(columns={"rev": "rev_c"}) \
        .astype({"day": np.int64}).reset_index(drop=True)


SQL_CONTROL_CHART = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                       AS BIGINT) AS rev_c
           FROM orders GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(rev_c AS HUGEINT)) AS s1,
             SUM(CAST(rev_c AS HUGEINT) * rev_c) AS s2 FROM d),
b AS (SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             SQRT(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
               AS sigma
      FROM s)
SELECT day, rev_c FROM d, b
WHERE CAST(rev_c AS DOUBLE) < mu - 3.0 * sigma
   OR CAST(rev_c AS DOUBLE) > mu + 3.0 * sigma
ORDER BY day
"""


def q_join_cardinality_exact(sf_dir: str):
    """Join-size estimation made exact: |orders ⋈ lineitem| on
    orderkey equals Σ_k c_orders(k)·c_lineitem(k) over the key
    distributions — computed WITHOUT executing the join (two bounded
    per-key count aggregations + one co-bucket multiply), verified
    against the oracle's actual COUNT(*).  The primitive a cost-based
    planner needs before choosing broadcast vs shuffle."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def counts(col):
        def f(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(k, return_counts=True)
            return pa.table({"k": pa.array(u),
                             "pc_": pa.array(c.astype(np.int64))})
        return f

    co = orders.map_batches(counts("o_orderkey"),
                            batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("pc_", alias_name="ca"))
    cl = li.map_batches(counts("l_orderkey"), batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("pc_", alias_name="cb"))

    joined = relational.bucketed_hash_join(co, cl, on="k")

    def mul(t: pa.Table) -> pa.Table:
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pp": pa.array([int((ca * cb).sum())])})

    agg = joined.map_batches(mul, batch_format="pyarrow") \
        .aggregate(Sum("pp", alias_name="rows"))
    return pd.DataFrame([{"join_rows": int(agg["rows"])}]) \
        .astype({"join_rows": np.int64})


SQL_JOIN_CARD = """
SELECT CAST(COUNT(*) AS BIGINT) AS join_rows
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""


def q_reorder_interval_histogram(sf_dir: str):
    """Customer reorder-interval distribution: day gaps between each
    customer's consecutive orders (LAG over (orderdate, orderkey)),
    bucketed to weeks — the repeat-purchase behavior curve.  One
    customer-bucket shuffle, vectorized shift per bucket; output is
    week-domain-bounded."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_b", pa.array(
            stable_bucket(t["o_custkey"], 64)))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        day = df["o_orderdate"].to_numpy() \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        df = df.assign(day=day) \
            .sort_values(["o_custkey", "day", "o_orderkey"])
        c = df["o_custkey"].to_numpy(np.int64)
        dy = df["day"].to_numpy(np.int64)
        same = c[1:] == c[:-1]
        gap = (dy[1:] - dy[:-1])[same]
        weeks = gap // 7
        u, n = np.unique(weeks, return_counts=True)
        return pa.table({"gap_weeks": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    o = relational.ds_to_table(
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("_b").map_groups(per_bucket, batch_format="pandas")
        .groupby("gap_weeks").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("gap_weeks").reset_index(drop=True)
    return o.astype({"gap_weeks": np.int64, "n": np.int64})


SQL_REORDER_INTERVALS = """
WITH o AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 86400000000 AS day,
                  o_orderkey
           FROM orders),
g AS (SELECT day - LAG(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey) AS gap
      FROM o)
SELECT gap // 7 AS gap_weeks, CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE gap IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_catalog_row_counts(sf_dir: str):
    """Catalog-level profile: exact row counts per table from parquet
    FOOTER metadata only — zero data rows read, the warehouse
    information_schema surface."""
    import glob
    import os

    import pyarrow.parquet as pq_
    rows = []
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]:
        # the engine's single-file contract ({t}.parquet exactly) —
        # a prefix glob would fold name-prefixed siblings into the count
        f = os.path.join(sf_dir, f"{t}.parquet")
        n = pq_.read_metadata(f).num_rows if os.path.exists(f) else 0
        rows.append({"table_name": t, "n_rows": n})
    return pd.DataFrame(rows).sort_values("table_name") \
        .reset_index(drop=True).astype({"n_rows": np.int64})


SQL_CATALOG_COUNTS = """
SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM customer
UNION ALL SELECT 'documents', COUNT(*) FROM documents
UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
UNION ALL SELECT 'events', COUNT(*) FROM events
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'region', COUNT(*) FROM region
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
ORDER BY table_name
"""


def q_cumulative_unique_users(sf_dir: str):
    """User-growth curve: cumulative distinct users by day — each
    user counts once, at their FIRST event day.  One user-bucket pass
    takes per-user min day, a days-bounded histogram + prefix sum
    finishes; the classic DAU-accumulation metric without any
    per-day COUNT(DISTINCT) rescan."""
    from ray.data.aggregate import Min, Sum
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        g = pd.DataFrame({"user_id": t["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64), "pd_": day}) \
            .groupby("user_id", sort=False).min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    first = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("pd_", alias_name="d0"))

    def hist(t: pa.Table) -> pa.Table:
        d = t["d0"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u),
                         "pn": pa.array(c.astype(np.int64))})

    o = relational.ds_to_table(
        first.map_batches(hist, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("pn", alias_name="new_users"))
    ).to_pandas().sort_values("day").reset_index(drop=True)
    o["cum_users"] = np.cumsum(o["new_users"].to_numpy(np.int64))
    return o.astype({"day": np.int64, "new_users": np.int64,
                     "cum_users": np.int64})


SQL_CUM_UNIQUE_USERS = """
WITH f AS (SELECT user_id,
                  MIN(epoch_us(ts) // 86400000000) AS day
           FROM events GROUP BY 1),
g AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM f GROUP BY 1)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM g ORDER BY day
"""


def q_top1pct_revenue_share(sf_dir: str):
    """Revenue concentration: the share of total revenue held by the
    top ⌈n/100⌉ customers (revenue DESC, custkey ASC rank) — the
    whale-concentration KPI.  Rank via the composite-key
    ``global_prefix_sum`` (same machinery as ABC analysis), head size
    from pure integer ceil division, ONE mirrored share division."""
    from ray.data.aggregate import Max, Sum
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"c": t["o_custkey"].to_numpy(
            zero_copy_only=False).astype(np.int64), "pc_": cents}) \
            .groupby("c", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("c").aggregate(Sum("pc_", alias_name="rev")) \
        .materialize()
    n = rev.count()
    head = (n + 99) // 100                  # ceil(n / 100)
    mx = int(rev.aggregate(Max("rev", alias_name="m"))["m"])
    total = int(rev.aggregate(Sum("rev", alias_name="s"))["s"])

    def with_key(t: pa.Table) -> pa.Table:
        from ..stages.relational import pack_desc_rank_key
        r = t["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = pack_desc_rank_key(r, mx, c)  # revenue DESC, custkey ASC
        return pa.table({"rev": pa.array(r), "one": pa.array(
            np.ones(len(r), dtype=np.int64)), "key": pa.array(key)})

    ranked = relational.global_prefix_sum(
        rev.map_batches(with_key, batch_format="pyarrow"),
        order_col="key", value_col="one", out_col="rn")

    def head_sum(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ph": pa.array([int(r[rn <= head].sum())])})

    agg = ranked.map_batches(head_sum, batch_format="pyarrow") \
        .aggregate(Sum("ph", alias_name="head_c"))
    head_c = int(agg["head_c"])
    return pd.DataFrame([{
        "n_customers": n, "head_n": int(head), "head_rev_c": head_c,
        "total_rev_c": total,
        "share": round(float(head_c) / float(total), 6)}]) \
        .astype({"n_customers": np.int64, "head_n": np.int64,
                 "head_rev_c": np.int64, "total_rev_c": np.int64})


SQL_TOP1PCT = """
WITH rev AS (SELECT o_custkey AS c,
                    CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                  AS HUGEINT)) AS BIGINT) AS rev
             FROM orders GROUP BY 1),
r AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev DESC, c) AS rn
      FROM rev),
s AS (SELECT CAST((SELECT COUNT(*) FROM rev) AS BIGINT) AS n,
             CAST(((SELECT COUNT(*) FROM rev) + 99) // 100 AS BIGINT)
               AS head_n)
SELECT n AS n_customers, head_n,
       CAST((SELECT SUM(rev) FROM r, s WHERE rn <= head_n) AS BIGINT)
         AS head_rev_c,
       CAST((SELECT SUM(rev) FROM rev) AS BIGINT) AS total_rev_c,
       ROUND(CAST((SELECT SUM(rev) FROM r, s WHERE rn <= head_n)
                  AS DOUBLE)
             / CAST((SELECT SUM(rev) FROM rev) AS DOUBLE), 6) AS share
FROM s
"""


def q_median_order_by_segment(sf_dir: str):
    """Exact median order value per market segment — the join ×
    grouped-quantile combination: the (custkey→segment) dim side
    attaches via a broadcast map, per-(segment, cents) distribution
    reduces once, and each segment's lower median reads off the shared
    ``exact_quantile_idx`` integer rule (K=2) inside a 5-group
    map_groups.  SQL twin uses quantile_disc(0.5) — the same
    lower-median convention."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = relational.ds_to_table(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))
    seg_series = pd.Series(
        cust["c_mktsegment"].to_pylist(),
        index=cust["c_custkey"].to_numpy(
            zero_copy_only=False).astype(np.int64))
    import ray
    ref = ray.put(seg_series)

    def partial(t: pa.Table) -> pa.Table:
        from ..stages.relational import worker_cached
        m = worker_cached(("seg_of", ref), lambda: ray.get(ref))
        c = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        # vectorized reindex attach (no per-row dict lookups); an
        # orphan custkey reindexes to NaN and drops — the SQL twin's
        # inner-join semantics, not a KeyError
        seg = m.reindex(c).to_numpy()
        ok = pd.notna(seg)
        g = pd.DataFrame({"seg": seg[ok], "v": cents[ok], "pn": 1}) \
            .groupby(["seg", "v"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    dist = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby(["seg", "v"]).aggregate(Sum("pn", alias_name="c"))

    def per_seg(g: pd.DataFrame) -> pd.DataFrame:
        from ..stages.relational import exact_quantile_idx
        g = g.sort_values("v")
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        i = exact_quantile_idx(cum, 1, 2)
        return pd.DataFrame([{
            "c_mktsegment": g["seg"].iloc[0],
            "n_orders": int(cum[-1]),
            "median_c": int(g["v"].to_numpy(np.int64)[i])}])

    out = dist.groupby("seg").map_groups(per_seg,
                                         batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("c_mktsegment").reset_index(drop=True) \
        .astype({"n_orders": np.int64, "median_c": np.int64})


SQL_MEDIAN_SEGMENT = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5)
         AS median_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def q_weekday_priority_heatmap(sf_dir: str):
    """Reporting heatmap: order counts by (ISO weekday × priority) —
    the 7×5 pivot grid a dashboard renders; exact counts, domain-
    bounded shuffle, weekday from pure epoch-day arithmetic."""
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        isodow = (day + 3) % 7 + 1
        g = pd.DataFrame({"isodow": isodow,
                          "o_orderpriority":
                          t["o_orderpriority"].to_numpy(
                              zero_copy_only=False),
                          "pn": 1}) \
            .groupby(["isodow", "o_orderpriority"], sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    o = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["isodow", "o_orderpriority"]).aggregate(
            Sum("pn", alias_name="n"))
    ).to_pandas().sort_values(["isodow", "o_orderpriority"]) \
        .reset_index(drop=True)
    return o.astype({"isodow": np.int64, "n": np.int64})


SQL_WEEKDAY_HEATMAP = """
SELECT (epoch_us(o_orderdate) // 86400000000 + 3) % 7 + 1 AS isodow,
       o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_clustered_layout_audit(sf_dir: str):
    """Storage-layout QC: audit a ``write_clustered`` output from
    parquet FOOTERS only — per-file (min, max) key stats must be
    internally consistent and globally NON-OVERLAPPING in file order
    (the property range scans and merge readers rely on), and the file
    row counts must sum to the input row count.  Reuses the zonemap
    cache dir; zero data rows read.  Rows-only (the layout isn't
    SQL-visible); the invariants are also pytest-asserted."""
    import glob
    import os

    import pyarrow.parquet as pq_

    out = _ensure_clustered_orders(sf_dir)
    files = sorted(glob.glob(os.path.join(out, "part=*", "*.parquet")))
    mins, maxs, rows = [], [], 0
    for f in files:
        md = pq_.read_metadata(f)
        col = {md.schema.column(i).name: i
               for i in range(md.num_columns)}["day"]
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        mins.append(fmin)
        maxs.append(fmax)
        rows += md.num_rows
    # STRICT: write_clustered guarantees file i's keys < file i+1's —
    # a duplicated boundary key (two files must open for one point
    # lookup) is exactly the defect this audit exists to catch
    ordered = all(maxs[i] < mins[i + 1]
                  for i in range(len(files) - 1))
    total = sum(pq_.read_metadata(f).num_rows for f in sorted(
        glob.glob(os.path.join(sf_dir, "orders*.parquet"))))
    return pd.DataFrame([{
        "n_files": len(files),
        "globally_ordered": bool(ordered),
        "rows_match_input": bool(rows == total),
        "n_rows": rows}]).astype({"n_files": np.int64,
                                  "n_rows": np.int64})


def q_bloom_pruned_scan(sf_dir: str):
    """Bloom-filter file skipping: the POINT-LOOKUP complement of the
    zone-map scan.  Orders are laid out range-clustered on the epoch
    DAY (``_ensure_clustered_orders``' layout, plus the key columns),
    so every file's o_custkey [min, max] spans the whole customer
    domain and min/max statistics prune NOTHING for a customer probe —
    exactly the case per-file Bloom sidecars exist for.  A 1 KiB bloom
    per file is built once in one distributed projected pass
    (``sketches.build_file_blooms``), and an equality probe then opens
    ONLY the files whose bloom may contain the key; no false negatives,
    so the exact in-file filter sees every true row.  Pruning counts
    are pytest-asserted; the oracle runs the same probe on the raw
    table with the probe key derived by the same deterministic rule
    (smallest custkey in the upper half of the key range)."""
    import glob
    import os
    import uuid

    from ray.data.aggregate import Max, Min
    from ..runtime.checkpoint import write_clustered
    from ..stages import sketches

    M_BITS, K_HASH = 8192, 5
    out = _fingerprint_cache_dir(sf_dir, "orders", "bloomscan")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"

        def add_day(t: pa.Table) -> pa.Table:
            day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64) \
                // 86_400_000_000
            cents = np.round(t["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            return pa.table({"o_orderkey": t["o_orderkey"],
                             "o_custkey": t["o_custkey"],
                             "day": pa.array(day),
                             "cents": pa.array(cents)})

        write_clustered(
            _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate",
                   "o_totalprice"])
            .map_batches(add_day, batch_format="pyarrow"),
            tmp, key_col="day", num_ranges=16)
        files = sorted(glob.glob(os.path.join(tmp, "part=*",
                                              "*.parquet")))
        blooms = sketches.build_file_blooms(files, "o_custkey",
                                            m_bits=M_BITS,
                                            num_hashes=K_HASH)
        np.savez(os.path.join(tmp, "blooms.npz"),
                 **{os.path.relpath(p, tmp): bm
                    for p, bm in blooms.items()})
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    # deterministic probe: smallest custkey in the upper half of the
    # key range (mirrored verbatim in the SQL twin)
    cust = _read(sf_dir, "orders", ["o_custkey"])
    lohi = cust.aggregate(Min("o_custkey", alias_name="lo"),
                          Max("o_custkey", alias_name="hi"))
    mid = (int(lohi["lo"]) + int(lohi["hi"])) // 2
    probe = int(cust.map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_custkey"], mid)),
        batch_format="pyarrow")
        .aggregate(Min("o_custkey", alias_name="k"))["k"])

    side = np.load(os.path.join(out, "blooms.npz"))
    files = sorted(side.files)
    keep = [f for f in files
            if sketches.bloom_may_contain(side[f], probe, M_BITS,
                                          K_HASH)]
    part = rd.read_parquet([os.path.join(out, f) for f in keep],
                           columns=["o_orderkey", "o_custkey", "day",
                                    "cents"], include_paths=True)
    hit = relational.ds_to_table(part.map_batches(
        lambda t: t.filter(pc.equal(t["o_custkey"], probe)),
        batch_format="pyarrow")).to_pandas()
    n_true = hit["path"].map(
        lambda p: os.path.relpath(p, out)).nunique()
    q_bloom_pruned_scan._last_prune = (len(files), len(keep),
                                       int(n_true))
    res = hit[["o_orderkey", "day", "cents"]] \
        .sort_values("o_orderkey").reset_index(drop=True)
    return res.astype({"o_orderkey": np.int64, "day": np.int64,
                       "cents": np.int64})


SQL_BLOOM_SCAN = """
WITH b AS (SELECT (MIN(o_custkey) + MAX(o_custkey)) // 2 AS mid
           FROM orders),
p AS (SELECT MIN(o_custkey) AS k FROM orders, b
      WHERE o_custkey >= b.mid)
SELECT o_orderkey,
       epoch_us(o_orderdate) // 86400000000 AS day,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
FROM orders, p WHERE o_custkey = p.k
ORDER BY o_orderkey
"""


def q_manifest_vacuum(sf_dir: str):
    """Snapshot expiration + orphan-file GC (`VACUUM`), the maintenance
    op that completes the lakehouse lifecycle next to time-travel,
    compaction and CDC reads: a versioned-manifest table is built with
    an early/late file pool, an ORPHAN file from an aborted write
    (present on disk, referenced by no manifest), and snapshots v1 ⊂
    v2; expiring v1 must delete the orphan and the v1 manifest while
    every file v2 references survives byte-identically — the safety
    invariant ``vacuum_manifests`` enforces.  The returned aggregate
    reads the POST-VACUUM v2 snapshot; the oracle aggregates the raw
    table, so a vacuum that touches a live file breaks the hash (and
    the accounting is pytest-asserted)."""
    import json
    import os
    import shutil
    import uuid

    import pyarrow.parquet as pq_
    from ray.data.aggregate import Sum
    from ..runtime.checkpoint import vacuum_manifests

    root = f"/tmp/prclz_ray_vacuum_{uuid.uuid4().hex}"
    os.makedirs(root)
    try:
        t = relational.ds_to_table(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                     "o_totalprice"]))
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        lo, hi = int(day.min()), int(day.max())
        mid_day = lo + (hi - lo) // 2
        early = pa.array(day <= mid_day)
        pq_.write_table(t.filter(early),
                        os.path.join(root, "early.parquet"))
        pq_.write_table(t.filter(pc.invert(early)),
                        os.path.join(root, "late.parquet"))
        # aborted write: same rows as a prefix of early, never committed
        pq_.write_table(t.filter(early).slice(0, 10),
                        os.path.join(root, "orphan.parquet"))
        with open(os.path.join(root, "manifest-v1.json"), "w") as fh:
            json.dump({"files": ["early.parquet"]}, fh)
        with open(os.path.join(root, "manifest-v2.json"), "w") as fh:
            json.dump({"files": ["early.parquet", "late.parquet"]}, fh)

        acct = vacuum_manifests(root, retain_versions=[2])
        q_manifest_vacuum._last_vacuum = acct

        with open(os.path.join(root, "manifest-v2.json")) as fh:
            m = json.load(fh)
        ds = rd.read_parquet([os.path.join(root, f)
                              for f in m["files"]],
                             columns=["o_totalprice"])

        def partial(tt: pa.Table) -> pa.Table:
            cents = np.round(tt["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            return pa.table({"pn": pa.array([len(cents)]),
                             "pc_": pa.array([int(cents.sum())])})

        agg = ds.map_batches(partial, batch_format="pyarrow") \
            .aggregate(Sum("pn", alias_name="n"),
                       Sum("pc_", alias_name="c"))
        return pd.DataFrame([{"n": int(agg["n"]),
                              "revenue_c": int(agg["c"])}]) \
            .astype({"n": np.int64, "revenue_c": np.int64})
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_MANIFEST_VACUUM = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
         AS revenue_c
FROM orders
"""


def q_rolling_median_7d(sf_dir: str):
    """Rolling 7-row exact MEDIAN of daily order revenue — the robust
    sibling of the rolling-mean anomaly window (a holistic window
    aggregate: no decomposable partial exists, which is why engines
    special-case it).  The distributed part is the shared exact-cents
    daily reduce; the finish is days-bounded.  Odd windows pick the
    middle element exactly; the first six (shorter, even) windows
    average two int cents — a .5-exact float both here and in the SQL
    twin's interpolation, so the hash compares raw doubles safely."""
    d = _daily_revenue_cents(sf_dir)
    med = d["rev"].astype(np.float64).rolling(7, min_periods=1) \
        .median()
    return pd.DataFrame({"day": d["day"].to_numpy(np.int64),
                         "med7": med.to_numpy(np.float64)})


SQL_ROLLING_MEDIAN = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1)
SELECT day,
       CAST(MEDIAN(rev) OVER (ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS med7
FROM d ORDER BY day
"""


def q_interval_overlap_degree(sf_dir: str):
    """Interval self-overlap-JOIN cardinality, computed WITHOUT the
    join: every order is an interval [orderdate, orderdate + 2·priority
    days]; the answer is the histogram of each interval's overlap
    degree (how many other orders were concurrently open).  The naive
    form is an inequality self-join (|orders|² comparisons — the
    oracle runs exactly that); the engine form uses the sweep identity
    degree(i) = #{starts ≤ eᵢ} − #{ends < sᵢ} − 1 over two DAYS-bounded
    prefix-count arrays, so the distributed work is two histogram
    passes and a vectorized lookup — no pairwise anything, any
    partitioning, exact."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def spans(t: pa.Table) -> pa.Table:
        s = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        dur = 2 * np.array(
            [int(p[0]) for p in
             t["o_orderpriority"].to_pylist()], dtype=np.int64)
        return pa.table({"s": pa.array(s), "e": pa.array(s + dur)})

    def day_hists(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "day": np.concatenate([t["s"].to_numpy(),
                                   t["e"].to_numpy()]),
            "kind": np.repeat(np.array([0, 1], dtype=np.int64),
                              t.num_rows),
            "pn": 1}).groupby(["day", "kind"], sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    iv = orders.map_batches(spans, batch_format="pyarrow")
    hist = relational.ds_to_table(
        iv.map_batches(day_hists, batch_format="pyarrow")
        .groupby(["day", "kind"]).aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    lo = int(hist["day"].min())
    hi = int(hist["day"].max())
    n_days = hi - lo + 1
    starts = np.zeros(n_days, dtype=np.int64)
    ends = np.zeros(n_days, dtype=np.int64)
    for _, r in hist.iterrows():
        (starts if r["kind"] == 0 else ends)[int(r["day"]) - lo] \
            += int(r["n"])
    cum_s, cum_e = np.cumsum(starts), np.cumsum(ends)

    def degree_hist(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy()
        e = t["e"].to_numpy()
        n_le_e = cum_s[np.clip(e - lo, 0, n_days - 1)]
        before = s - 1 - lo
        n_lt_s = np.where(before < 0, 0,
                          cum_e[np.clip(before, 0, n_days - 1)])
        deg = n_le_e - n_lt_s - 1
        g = pd.DataFrame({"degree": deg, "pn": 1}) \
            .groupby("degree", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        iv.map_batches(degree_hist, batch_format="pyarrow")
        .groupby("degree").aggregate(Sum("pn", alias_name="n_orders"))
    ).to_pandas().sort_values("degree").reset_index(drop=True)
    return out.astype({"degree": np.int64, "n_orders": np.int64})


SQL_OVERLAP_DEGREE = """
WITH iv AS (SELECT o_orderkey,
                   epoch_us(o_orderdate) // 86400000000 AS s,
                   epoch_us(o_orderdate) // 86400000000
                   + 2 * CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                     AS e
            FROM orders),
deg AS (SELECT a.o_orderkey, COUNT(*) - 1 AS degree
        FROM iv a JOIN iv b ON b.s <= a.e AND b.e >= a.s
        GROUP BY 1)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM deg GROUP BY 1 ORDER BY 1
"""


# Cramer expansion for the 3×3 normal equations of
# y ~ b0 + b1·q + b2·d, written ONCE: the Ray side eval()s these over
# exact python-int power sums, the SQL twin substitutes the same text
# over HUGEINT sums — the two sides cannot drift.
_OLS2_DETS = {
    "det": ("n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd)"
            " + sd*(sq*sqd - sqq*sd)"),
    "det0": ("sp*(sqq*sdd - sqd*sqd) - sq*(sqp*sdd - sqd*sdp)"
             " + sd*(sqp*sqd - sqq*sdp)"),
    "det1": ("n*(sqp*sdd - sqd*sdp) - sp*(sq*sdd - sqd*sd)"
             " + sd*(sq*sdp - sqp*sd)"),
    "det2": ("n*(sqq*sdp - sqd*sqp) - sq*(sq*sdp - sqp*sd)"
             " + sp*(sq*sqd - sqq*sd)"),
}


def q_ols2_price_model(sf_dir: str):
    """Two-feature exact OLS (multiple linear regression):
    extendedprice-cents ~ quantity + discount-pct over lineitem, by the
    normal equations with EXACT integer power sums — per-batch int64
    partials (bounded: the largest term is qty·cents ≤ 5·10⁸/row, so
    int64 holds ~10¹⁰ rows), Cramer determinants in arbitrary-precision
    python ints, and ONE float division per coefficient at the end,
    mirrored as CAST(det AS DOUBLE)/CAST(det AS DOUBLE) in the twin.
    Bit-identical at any partitioning — the grouped-Gram sibling of the
    single-feature regr kernel and the PCA Gram pass."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               ["l_quantity", "l_discount", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.round(t["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        d = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        p = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "n": pa.array([len(q)]), "sq": pa.array([int(q.sum())]),
            "sd": pa.array([int(d.sum())]),
            "sp": pa.array([int(p.sum())]),
            "sqq": pa.array([int((q * q).sum())]),
            "sdd": pa.array([int((d * d).sum())]),
            "sqd": pa.array([int((q * d).sum())]),
            "sqp": pa.array([int((q * p).sum())]),
            "sdp": pa.array([int((d * p).sum())])})

    agg = li.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in
          ("n", "sq", "sd", "sp", "sqq", "sdd", "sqd", "sqp", "sdp")])
    sums = {k: int(v) for k, v in agg.items()}
    dets = {name: eval(expr, {}, sums)          # exact python ints
            for name, expr in _OLS2_DETS.items()}
    det = float(dets["det"])
    return pd.DataFrame([{
        "n": sums["n"],
        "intercept": np.round(float(dets["det0"]) / det, 6),
        "b_qty": np.round(float(dets["det1"]) / det, 6),
        "b_disc": np.round(float(dets["det2"]) / det, 6)}]) \
        .astype({"n": np.int64})


def _sql_ols2() -> str:
    e = {k: v for k, v in _OLS2_DETS.items()}
    return f"""
WITH s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sq,
    SUM(CAST(ROUND(l_discount * 100) AS HUGEINT)) AS sd,
    SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sp,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_quantity) AS HUGEINT)) AS sqq,
    SUM(CAST(ROUND(l_discount * 100) AS HUGEINT)
        * CAST(ROUND(l_discount * 100) AS HUGEINT)) AS sdd,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_discount * 100) AS HUGEINT)) AS sqd,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sqp,
    SUM(CAST(ROUND(l_discount * 100) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sdp
  FROM lineitem),
d AS (SELECT n, {e["det"]} AS det, {e["det0"]} AS det0,
             {e["det1"]} AS det1, {e["det2"]} AS det2 FROM s)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE), 6)
         AS intercept,
       ROUND(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_qty,
       ROUND(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_disc
FROM d
"""


def q_grid_dbscan_clusters(sf_dir: str):
    """Grid-DBSCAN spatial clustering (the distributed approximation
    every geo engine ships: density per fixed cell, core cells =
    count ≥ minPts, clusters = 8-connected components of core cells):
    cell counts reduce distributedly to a GRID-bounded table, the
    component pass is a union-find on ≤ grid² nodes (driver-trivial by
    construction — the whole point of trading eps-balls for cells),
    labels are the component's min cell id.  The oracle replays the
    same integer cell arithmetic and closes connectivity with a
    recursive min-label CTE."""
    from ray.data.aggregate import Sum

    G, CELL, MINPTS = 10, 100, 3
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def cells(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cx = ((k * 7919) % 1000) // CELL
        cy = ((k * 104729) % 1000) // CELL
        g = pd.DataFrame({"cell": cx * G + cy, "pn": 1}) \
            .groupby("cell", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = relational.ds_to_table(
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby("cell").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    core = counts[counts["n"] >= MINPTS]
    cell_ids = core["cell"].to_numpy(np.int64)
    n_pts = dict(zip(cell_ids, core["n"].to_numpy(np.int64)))
    parent = {int(c): int(c) for c in cell_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cset = set(parent)
    for c in cell_ids:
        cx, cy = int(c) // G, int(c) % G
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx) * G + (cy + dy)
                if 0 <= cx + dx < G and 0 <= cy + dy < G \
                        and nb in cset:
                    ra, rb = find(int(c)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    rows: dict[int, list[int]] = {}
    for c in cell_ids:
        lab = find(int(c))
        agg = rows.setdefault(lab, [0, 0])
        agg[0] += 1
        agg[1] += int(n_pts[c])
    out = pd.DataFrame(
        [{"cluster": lab, "n_cells": v[0], "n_points": v[1]}
         for lab, v in sorted(rows.items())])
    return out.astype({"cluster": np.int64, "n_cells": np.int64,
                       "n_points": np.int64})


SQL_GRID_DBSCAN = """
WITH RECURSIVE
c AS (SELECT ((c_custkey * 7919) % 1000) // 100 AS cx,
             ((c_custkey * 104729) % 1000) // 100 AS cy,
             COUNT(*) AS n
      FROM customer GROUP BY 1, 2),
core AS (SELECT cx * 10 + cy AS cell, cx, cy, n FROM c WHERE n >= 3),
e AS (SELECT a.cell AS src, b.cell AS dst
      FROM core a JOIN core b
      ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
reach(src, dst) AS (
  SELECT cell, cell FROM core
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst),
lbl AS (SELECT src AS cell, MIN(dst) AS lab FROM reach GROUP BY 1)
SELECT l.lab AS cluster, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(core.n) AS BIGINT) AS n_points
FROM core JOIN lbl l ON core.cell = l.cell
GROUP BY 1 ORDER BY 1
"""


def q_phrase_search(sf_dir: str):
    """Exact phrase query over a positional token stream (the retrieval
    op a positional inverted index exists for): the corpus's most
    frequent bigram is found first (reusing the bounded top-k n-gram
    kernel), then each batch counts ADJACENT-position matches with one
    vectorized shift-compare that never crosses a document boundary —
    no per-row tokenize loop, no index materialization beyond the
    1-row phrase broadcast.  Output is every matching doc with its
    occurrence count."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    top = text.top_k_ngrams(docs, text_col="text", n=2, k=1)
    w1, w2 = top["gram"][0].as_py().split(" ")

    def count(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["text"], pattern=" ")
        flat = pc.list_flatten(parts).combine_chunks()
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        toks = flat.to_numpy(zero_copy_only=False)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "pn": pa.array([], type=pa.int64())})
        if len(toks) < 2:
            return empty
        m = (toks[:-1] == w1) & (toks[1:] == w2) \
            & (parent[:-1] == parent[1:])
        if not m.any():
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"doc_id": ids[parent[:-1][m]], "pn": 1}) \
            .groupby("doc_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        docs.map_batches(count, batch_format="pyarrow")
        .groupby("doc_id").aggregate(Sum("pn", alias_name="n_occur"))
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": np.int64, "n_occur": np.int64})


SQL_PHRASE_SEARCH = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM t WHERE len(w) >= 2),
big AS (SELECT w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
          AS bigram, COUNT(*) AS n
        FROM pos GROUP BY 1 ORDER BY n DESC, bigram LIMIT 1)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occur
FROM pos, big
WHERE w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] = big.bigram
GROUP BY doc_id ORDER BY doc_id
"""


def q_window_cooccurrence(sf_dir: str):
    """Skip-gram word co-occurrence within a ±3-token window (the
    GloVe/word2vec X-matrix build, pooled over distances): one token
    explode per batch, three vectorized shift-compares gated on the
    document-parent index (pairs never cross a doc boundary), partial
    counts, one vocabulary-bounded groupby, per-block top-30 prune —
    the strict (n desc, wa, wb) order makes the prune provably
    lossless."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["text"], pattern=" ")
        flat = pc.list_flatten(parts).combine_chunks()
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        toks = flat.to_numpy(zero_copy_only=False)
        frames = []
        for d in (1, 2, 3):
            if len(toks) <= d:
                continue
            same = parent[:-d] == parent[d:]
            frames.append(pd.DataFrame({"wa": toks[:-d][same],
                                        "wb": toks[d:][same]}))
        if not frames:
            return pa.table({"wa": pa.array([], type=pa.string()),
                             "wb": pa.array([], type=pa.string()),
                             "pn": pa.array([], type=pa.int64())})
        g = pd.concat(frames).groupby(["wa", "wb"], sort=False) \
            .size().reset_index(name="pn")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["wa", "wb"]).aggregate(Sum("pn", alias_name="n"))

    def prune(t: pa.Table) -> pa.Table:
        t = pa.table({"wa": t["wa"], "wb": t["wb"],
                      "n": t["n"].cast(pa.int64())})
        return t.sort_by([("n", "descending"), ("wa", "ascending"),
                          ("wb", "ascending")]).slice(0, 30)

    cand = relational.ds_to_table(
        counts.map_batches(prune, batch_format="pyarrow"))
    return cand.sort_by([("n", "descending"), ("wa", "ascending"),
                         ("wb", "ascending")]).slice(0, 30).to_pandas()


SQL_WINDOW_COOCCUR = """
WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
pos AS (SELECT w, unnest(generate_series(1, len(w))) AS i FROM t),
pairs AS (
  SELECT w[CAST(i AS INT)] AS wa, w[CAST(i AS INT) + 1] AS wb
  FROM pos WHERE i + 1 <= len(w)
  UNION ALL
  SELECT w[CAST(i AS INT)], w[CAST(i AS INT) + 2]
  FROM pos WHERE i + 2 <= len(w)
  UNION ALL
  SELECT w[CAST(i AS INT)], w[CAST(i AS INT) + 3]
  FROM pos WHERE i + 3 <= len(w))
SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY 1, 2 ORDER BY n DESC, wa, wb LIMIT 30
"""


def q_keyness_by_source(sf_dir: str):
    """Corpus-comparison keyness (Dunning log-likelihood G², the
    standard which-words-characterize-this-slice statistic): per
    (source, word) observed counts vs the expectation under
    source-independence, top-3 words per source by G².  The distributed
    part is one token explode into a (sources × vocabulary)-bounded
    count table; the G² finish is driver-trivial BY that bound.
    Ranking uses the unrounded double exactly like the SQL ORDER BY;
    the 4dp round happens on return."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["text"], pattern=" ")
        flat = pc.list_flatten(parts).combine_chunks()
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"source": src[parent],
                          "word": flat.to_numpy(zero_copy_only=False),
                          "pn": 1}) \
            .groupby(["source", "word"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    sw = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "word"]).aggregate(Sum("pn",
                                                   alias_name="a"))
    ).to_pandas()
    sw["a"] = sw["a"].astype(np.int64)
    ns = sw.groupby("source")["a"].transform("sum").to_numpy(np.int64)
    nw = sw.groupby("word")["a"].transform("sum").to_numpy(np.int64)
    N = int(sw["a"].sum())
    a = sw["a"].to_numpy(np.int64)
    b = nw - a
    e1 = ns.astype(np.float64) * nw.astype(np.float64) / float(N)
    e2 = (N - ns).astype(np.float64) * nw.astype(np.float64) / float(N)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = np.where(a > 0, a * np.log(a / e1), 0.0)
        t2 = np.where(b > 0, b * np.log(b / e2), 0.0)
    sw["g2"] = 2.0 * (t1 + t2)
    sw["rank"] = sw.sort_values(["g2", "word"],
                                ascending=[False, True]) \
        .groupby("source").cumcount() + 1
    out = sw[sw["rank"] <= 3].sort_values(["source", "rank"])
    return pd.DataFrame({
        "source": out["source"].to_numpy(),
        "rank": out["rank"].to_numpy(np.int64),
        "word": out["word"].to_numpy(),
        "g2": np.round(out["g2"].to_numpy(np.float64), 4)})


SQL_KEYNESS = """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
sw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS a
       FROM w GROUP BY 1, 2),
tot AS (SELECT SUM(a) AS n FROM sw),
s AS (SELECT source, SUM(a) AS ns FROM sw GROUP BY 1),
v AS (SELECT word, SUM(a) AS nw FROM sw GROUP BY 1),
g AS (SELECT sw.source, sw.word, sw.a,
             v.nw - sw.a AS b,
             CAST(s.ns AS DOUBLE) * CAST(v.nw AS DOUBLE)
               / CAST(tot.n AS DOUBLE) AS e1,
             CAST(tot.n - s.ns AS DOUBLE) * CAST(v.nw AS DOUBLE)
               / CAST(tot.n AS DOUBLE) AS e2
      FROM sw JOIN s USING (source) JOIN v USING (word)
      CROSS JOIN tot),
scored AS (SELECT source, word,
                  2.0 * (CASE WHEN a > 0
                              THEN a * ln(a / e1) ELSE 0.0 END
                         + CASE WHEN b > 0
                                THEN b * ln(b / e2) ELSE 0.0 END)
                    AS g2,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY 2.0 * (CASE WHEN a > 0
                       THEN a * ln(a / e1) ELSE 0.0 END
                       + CASE WHEN b > 0
                              THEN b * ln(b / e2) ELSE 0.0 END) DESC,
                                     word) AS rank
           FROM g)
SELECT source, CAST(rank AS BIGINT) AS rank, word,
       ROUND(g2, 4) AS g2
FROM scored WHERE rank <= 3 ORDER BY source, rank
"""


def q_merkle_replica_diff(sf_dir: str):
    """Merkle-style anti-entropy table diff: two replicas of orders
    (replica B diverges by +1 cent on every o_orderkey % 997 == 0 row
    — the Ray side does NOT know the rule) are reconciled by comparing
    256 order-independent bucket digests (XOR of per-row hashes —
    commutative, so ANY partitioning yields the identical digest),
    then re-reading ONLY the differing buckets for the key-level diff.
    At 100 TB this is the difference between shipping 256 × 8 bytes
    per replica and re-scanning the table; the buckets-scanned count
    is pytest-asserted.  The oracle states the expected divergent key
    set from the mutation rule."""
    N_BUCKETS = 256

    def load(mutate: bool):
        ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

        def prep(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cents = np.round(t["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            if mutate:
                cents = cents + (k % 997 == 0)
            return pa.table({"k": pa.array(k),
                             "cents": pa.array(cents)})

        return ds.map_batches(prep, batch_format="pyarrow")

    def digests(rep) -> dict[int, int]:
        def partial(t: pa.Table) -> pa.Table:
            k = t["k"].to_numpy()
            h = (pd.util.hash_array(k)
                 * np.uint64(0x9E3779B97F4A7C15)
                 ^ pd.util.hash_array(t["cents"].to_numpy()))
            b = (k % N_BUCKETS).astype(np.int64)
            out_b, out_d = [], []
            for bb in np.unique(b):
                out_b.append(int(bb))
                out_d.append(int(np.bitwise_xor.reduce(h[b == bb])))
            return pa.table({"b": pa.array(out_b, type=pa.int64()),
                             "d": pa.array(out_d, type=pa.uint64())})

        agg: dict[int, int] = {}
        for t in rep.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for bb, dd in zip(t["b"].to_pylist(), t["d"].to_pylist()):
                agg[bb] = agg.get(bb, 0) ^ dd
        return agg

    with np.errstate(over="ignore"):
        da, db = digests(load(False)), digests(load(True))
    diff_buckets = sorted(b for b in set(da) | set(db)
                          if da.get(b) != db.get(b))
    q_merkle_replica_diff._last_scan = (N_BUCKETS, len(diff_buckets))

    def bucket_rows(rep) -> pd.DataFrame:
        def keep(t: pa.Table) -> pa.Table:
            b = (t["k"].to_numpy() % N_BUCKETS).astype(np.int64)
            return t.filter(pa.array(np.isin(b, diff_buckets)))

        return relational.ds_to_table(
            rep.map_batches(keep, batch_format="pyarrow")).to_pandas()

    ra, rb = bucket_rows(load(False)), bucket_rows(load(True))
    merged = ra.merge(rb, on="k", suffixes=("_a", "_b"))
    bad = merged.loc[merged["cents_a"] != merged["cents_b"], ["k"]] \
        .rename(columns={"k": "o_orderkey"}) \
        .sort_values("o_orderkey").reset_index(drop=True)
    return bad.astype({"o_orderkey": np.int64})


SQL_MERKLE_DIFF = """
SELECT o_orderkey FROM orders WHERE o_orderkey % 997 = 0
ORDER BY o_orderkey
"""


def q_staypoints_daily_cells(sf_dir: str):
    """Trajectory staypoint detection on the daily-cell model (a user
    occupies cell (31·user + epoch-day) % 25 — position changes by
    day): per user, runs of consecutive same-cell events in (ts,
    event_id) order are dwell segments; a staypoint is a run of ≥ 3
    events.  Same gaps-and-islands kernel as the event-run op — one
    coarse user-bucket shuffle, vectorized change-flag cumsum, zero
    per-user Python — applied to the geo-cell column instead of the
    event type."""
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def tag(batch: pa.Table) -> pa.Table:
        day = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        u = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cell = (31 * u + day) % 25
        b = stable_bucket(batch["user_id"], 64)
        return pa.table({"user_id": batch["user_id"],
                         "ts": batch["ts"],
                         "event_id": batch["event_id"],
                         "cell": pa.array(cell),
                         "_bucket": pa.array(b)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        c = df["cell"].to_numpy(np.int64)
        change = np.ones(len(df), dtype=bool)
        change[1:] = (u[1:] != u[:-1]) | (c[1:] != c[:-1])
        run_id = np.cumsum(change) - 1
        lengths = np.bincount(run_id)
        runs = pd.DataFrame({"user_id": u[change], "len": lengths})
        stay = runs[runs["len"] >= 3]
        if stay.empty:
            return pd.DataFrame({"user_id": pd.Series([],
                                                      dtype=np.int64),
                                 "n_staypoints": pd.Series(
                                     [], dtype=np.int64),
                                 "longest_dwell": pd.Series(
                                     [], dtype=np.int64)})
        out = stay.groupby("user_id", sort=False)["len"] \
            .agg(n_staypoints="count", longest_dwell="max") \
            .reset_index()
        return out

    out = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
    return relational.ds_to_table(out).to_pandas() \
        .sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": np.int64, "n_staypoints": np.int64,
                 "longest_dwell": np.int64})


SQL_STAYPOINTS = """
WITH e AS (SELECT user_id, ts, event_id,
                  (31 * user_id
                   + epoch_us(ts) // 86400000000) % 25 AS cell
           FROM events),
o AS (SELECT user_id, cell,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, cell
                                ORDER BY ts, event_id) AS rn2
      FROM e),
runs AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
         FROM o GROUP BY user_id, cell, rn - rn2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_staypoints,
       MAX(len) AS longest_dwell
FROM runs WHERE len >= 3
GROUP BY user_id ORDER BY user_id
"""


def q_holt_forecast_revenue(sf_dir: str):
    """Holt double exponential smoothing (level + trend) over the
    daily revenue series, α = β = 0.5, h = 1..7 forecasts.  The
    distributed part is the shared exact-cents daily reduce; the
    recursion is DAYS-bounded and runs on the driver in EXACTLY the
    float order the SQL twin's recursive CTE uses (level first, then
    trend from the new level), so both sides are bit-identical before
    the 4dp round.  Missing calendar days are skipped (the recursion
    steps over observed days in order, like the CTE's rn + 1 join)."""
    d = _daily_revenue_cents(sf_dir)
    rev = d["rev"].to_numpy(np.int64)
    lvl = float(rev[0])
    trd = 0.0
    for y in rev[1:]:
        new_lvl = 0.5 * float(y) + 0.5 * (lvl + trd)
        trd = 0.5 * (new_lvl - lvl) + 0.5 * trd
        lvl = new_lvl
    rows = [{"h": h, "forecast": np.round(lvl + h * trd, 4)}
            for h in range(1, 8)]
    return pd.DataFrame(rows).astype({"h": np.int64})


SQL_HOLT_FORECAST = """
WITH RECURSIVE
d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                  AS DOUBLE) AS rev
      FROM orders GROUP BY 1),
s AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
n AS (SELECT MAX(rn) AS n FROM s),
rec(rn, lvl, trd) AS (
  SELECT CAST(1 AS BIGINT), (SELECT rev FROM s WHERE rn = 1),
         CAST(0.0 AS DOUBLE)
  UNION ALL
  SELECT r.rn + 1,
         0.5 * s.rev + 0.5 * (r.lvl + r.trd),
         0.5 * ((0.5 * s.rev + 0.5 * (r.lvl + r.trd)) - r.lvl)
           + 0.5 * r.trd
  FROM rec r JOIN s ON s.rn = r.rn + 1),
fin AS (SELECT lvl, trd FROM rec, n WHERE rn = n.n)
SELECT CAST(h AS BIGINT) AS h, ROUND(lvl + h * trd, 4) AS forecast
FROM fin, unnest(generate_series(1, 7)) AS t(h)
ORDER BY h
"""


def _morton_interleave(x: np.ndarray, y: np.ndarray,
                       bits: int = 10) -> np.ndarray:
    """Vectorized bit-interleave (the same 10-bit kernel as
    q_morton_index_points, factored for reuse by the z-order layout)."""
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _morton_box_cover(x0: int, x1: int, y0: int, y1: int,
                      bits: int = 10) -> list[tuple[int, int]]:
    """Quadtree covering of the inclusive box [x0,x1]×[y0,y1] as a list
    of CONTIGUOUS morton ranges: recurse quadrants, emit a whole
    quadrant when fully inside (a bit-aligned quadrant is a contiguous
    z range — the property z-order clustering exists for), split when
    partial.  O(perimeter·bits) ranges, merged where adjacent."""
    out: list[tuple[int, int]] = []

    def rec(qx: int, qy: int, level: int) -> None:
        s = bits - level
        cx0, cx1 = qx << s, ((qx + 1) << s) - 1
        cy0, cy1 = qy << s, ((qy + 1) << s) - 1
        if cx1 < x0 or cx0 > x1 or cy1 < y0 or cy0 > y1:
            return
        if cx0 >= x0 and cx1 <= x1 and cy0 >= y0 and cy1 <= y1:
            a = np.array([cx0], dtype=np.int64)
            b = np.array([cy0], dtype=np.int64)
            zlo = int(_morton_interleave(a, b, bits)[0])
            out.append((zlo, zlo + (1 << (2 * s)) - 1))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(qx * 2 + dx, qy * 2 + dy, level + 1)

    rec(0, 0, 0)
    out.sort()
    merged = [out[0]]
    for lo, hi in out[1:]:
        if lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def q_zorder_pruned_scan(sf_dir: str):
    """Z-order-clustered 2D range scan with file skipping — the
    spatial-layout trick every lakehouse exposes (cluster by the
    interleaved key so a 2D box decomposes into FEW contiguous key
    ranges, then footer min/max prunes whole files): customer points
    are written once range-clustered on the 20-bit morton code, the
    query box [200,399]×[100,299] covers into contiguous z ranges by
    quadtree decomposition, and only files whose [min,max] intersects
    a covering range are opened (counts pytest-asserted; the covering
    itself has an exhaustive small-grid proof test).  The oracle runs
    the raw box predicate."""
    import glob
    import os
    import uuid

    import pyarrow.parquet as pq_
    from ..runtime.checkpoint import write_clustered

    X0, X1, Y0, Y1 = 200, 399, 100, 299
    out = _fingerprint_cache_dir(sf_dir, "customer", "zorder")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"

        def add_z(t: pa.Table) -> pa.Table:
            k = t["c_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            x = (k * 7919) % 1000
            y = (k * 104729) % 1000
            return pa.table({"c_custkey": t["c_custkey"],
                             "x": pa.array(x), "y": pa.array(y),
                             "z": pa.array(
                                 _morton_interleave(x, y))})

        write_clustered(
            _read(sf_dir, "customer", ["c_custkey"])
            .map_batches(add_z, batch_format="pyarrow"),
            tmp, key_col="z", num_ranges=16)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    cover = _morton_box_cover(X0, X1, Y0, Y1)
    files = sorted(glob.glob(os.path.join(out, "part=*", "*.parquet")))
    keep = []
    for f in files:
        md = pq_.read_metadata(f)
        col = {md.schema.column(i).name: i
               for i in range(md.num_columns)}["z"]
        fmin = min(md.row_group(rg).column(col).statistics.min
                   for rg in range(md.num_row_groups))
        fmax = max(md.row_group(rg).column(col).statistics.max
                   for rg in range(md.num_row_groups))
        if any(lo <= fmax and hi >= fmin for lo, hi in cover):
            keep.append(f)
    q_zorder_pruned_scan._last_prune = (len(files), len(keep),
                                        len(cover))

    part = rd.read_parquet(keep, columns=["c_custkey", "x", "y"])

    def box(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        m = (x >= X0) & (x <= X1) & (y >= Y0) & (y <= Y1)
        return pa.table({"c_custkey":
                         t["c_custkey"].filter(pa.array(m))})

    res = relational.ds_to_table(
        part.map_batches(box, batch_format="pyarrow")).to_pandas()
    return res.sort_values("c_custkey").reset_index(drop=True) \
        .astype({"c_custkey": np.int64})


SQL_ZORDER_SCAN = """
SELECT c_custkey FROM customer
WHERE ((c_custkey * 7919) % 1000) BETWEEN 200 AND 399
  AND ((c_custkey * 104729) % 1000) BETWEEN 100 AND 299
ORDER BY c_custkey
"""


def q_tile_pyramid_counts(sf_dir: str):
    """Tile-pyramid rollup (the zoom-level aggregation a map-tile
    service precomputes): point counts at zoom 3/2/1 (64/16/4 morton
    cells), ALL levels derived from ONE finest-level distributed pass —
    parents are prefix truncations (z >> 2 per zoom step), so the
    rollup is a 64-row driver fold, never a rescan.  The twin
    recomputes each level's cell id arithmetically and stacks them
    with UNION ALL."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def finest(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = ((k * 7919) % 1000) // 125          # 3-bit x (0..7)
        y = ((k * 104729) % 1000) // 125        # 3-bit y
        z = _morton_interleave(x, y, bits=3)
        u, n = np.unique(z, return_counts=True)
        return pa.table({"z": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    z3 = relational.ds_to_table(
        cust.map_batches(finest, batch_format="pyarrow")
        .groupby("z").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    z3["n"] = z3["n"].astype(np.int64)
    frames = []
    cur = z3.rename(columns={"z": "cell"})
    for zoom in (3, 2, 1):
        g = cur.groupby("cell", sort=True)["n"].sum().reset_index()
        g.insert(0, "zoom", zoom)
        frames.append(g)
        cur = pd.DataFrame({"cell": g["cell"] // 4, "n": g["n"]})
    out = pd.concat(frames).sort_values(["zoom", "cell"]) \
        .reset_index(drop=True)
    return out.astype({"zoom": np.int64, "cell": np.int64,
                       "n": np.int64})


def _sql_tile_pyramid() -> str:
    x = "((c_custkey * 7919) % 1000) // 125"
    y = "((c_custkey * 104729) % 1000) // 125"
    z = " + ".join(f"(({x} >> {i}) & 1) * {1 << (2 * i)}"
                   f" + (({y} >> {i}) & 1) * {1 << (2 * i + 1)}"
                   for i in range(3))
    return f"""
WITH f AS (SELECT {z} AS z3 FROM customer)
SELECT 3 AS zoom, z3 AS cell, CAST(COUNT(*) AS BIGINT) AS n
FROM f GROUP BY 2
UNION ALL
SELECT 2, z3 // 4, CAST(COUNT(*) AS BIGINT) FROM f GROUP BY 2
UNION ALL
SELECT 1, z3 // 16, CAST(COUNT(*) AS BIGINT) FROM f GROUP BY 2
ORDER BY zoom, cell
"""


def q_vocab_drift_psi(sf_dir: str):
    """Vocabulary drift monitoring: Population Stability Index between
    the word distributions of the corpus's early and late halves
    (doc_id split at the key-range midpoint) — the drop-in drift alarm
    for an LM ingest pipeline.  One token explode into a
    (half × vocab)-bounded count table; PSI terms (p−q)·ln(p/q)
    computed on the driver in the exact float order of the twin; the
    top-10 contributing words rank on the UNROUNDED double."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    lohi = docs.aggregate(
        __import__("ray").data.aggregate.Min("doc_id",
                                             alias_name="lo"),
        __import__("ray").data.aggregate.Max("doc_id",
                                             alias_name="hi"))
    mid = (int(lohi["lo"]) + int(lohi["hi"])) // 2

    def partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["text"], pattern=" ")
        flat = pc.list_flatten(parts).combine_chunks()
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"half": (ids[parent] > mid).astype(np.int64),
                          "word": flat.to_numpy(zero_copy_only=False),
                          "pn": 1}) \
            .groupby(["half", "word"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    hw = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["half", "word"]).aggregate(Sum("pn",
                                                 alias_name="a"))
    ).to_pandas()
    piv = hw.pivot_table(index="word", columns="half", values="a",
                         fill_value=0).reset_index()
    ref = piv[0].to_numpy(np.int64)
    cur = piv[1].to_numpy(np.int64)
    both = (ref > 0) & (cur > 0)        # PSI defined on shared support
    words = piv["word"].to_numpy()[both]
    p = ref[both].astype(np.float64) / float(ref.sum())
    q = cur[both].astype(np.float64) / float(cur.sum())
    term = (p - q) * np.log(p / q)
    order = np.lexsort((words, -term))[:10]
    return pd.DataFrame({
        "word": words[order],
        "p_ref": np.round(p[order], 6),
        "p_cur": np.round(q[order], 6),
        "psi_term": np.round(term[order], 6)})


SQL_VOCAB_PSI = """
WITH b AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS mid
           FROM documents),
w AS (SELECT CASE WHEN doc_id > b.mid THEN 1 ELSE 0 END AS half,
             unnest(string_split(text, ' ')) AS word
      FROM documents, b),
hw AS (SELECT half, word, CAST(COUNT(*) AS BIGINT) AS a
       FROM w GROUP BY 1, 2),
piv AS (SELECT word,
               SUM(CASE WHEN half = 0 THEN a ELSE 0 END) AS r,
               SUM(CASE WHEN half = 1 THEN a ELSE 0 END) AS c
        FROM hw GROUP BY 1),
tot AS (SELECT SUM(r) AS tr, SUM(c) AS tc FROM piv),
t AS (SELECT word,
             CAST(r AS DOUBLE) / tot.tr AS p,
             CAST(c AS DOUBLE) / tot.tc AS q
      FROM piv, tot WHERE r > 0 AND c > 0)
SELECT word, ROUND(p, 6) AS p_ref, ROUND(q, 6) AS p_cur,
       ROUND((p - q) * ln(p / q), 6) AS psi_term
FROM t ORDER BY (p - q) * ln(p / q) DESC, word LIMIT 10
"""


def _skyline_2d(cents: np.ndarray, size: np.ndarray,
                keys: np.ndarray) -> np.ndarray:
    """Row mask of the 2D Pareto frontier (minimize cents, maximize
    size; a point survives iff no other has cents ≤ AND size ≥ with at
    least one strict).  Vectorized sweep: per ascending-cents group the
    survivors are the rows at the group max size, and only when that
    max strictly beats every cheaper group's best."""
    order = np.lexsort((keys, -size, cents))
    c, s = cents[order], size[order]
    grp_start = np.ones(len(c), dtype=bool)
    grp_start[1:] = c[1:] != c[:-1]
    gid = np.cumsum(grp_start) - 1
    gmax = np.zeros(gid[-1] + 1 if len(gid) else 0, dtype=np.int64)
    np.maximum.at(gmax, gid, s)
    best_before = np.concatenate(
        ([np.iinfo(np.int64).min],
         np.maximum.accumulate(gmax)[:-1]))
    keep_sorted = (s == gmax[gid]) & (gmax[gid] > best_before[gid])
    mask = np.zeros(len(c), dtype=bool)
    mask[order] = keep_sorted
    return mask


def q_skyline_parts(sf_dir: str):
    """Skyline (Pareto-frontier) operator over parts: the cheapest-for-
    their-size set, minimizing price-cents and maximizing size.  The
    classic distributed decomposition: each block computes its LOCAL
    skyline (a global survivor is non-dominated in its block, so the
    union of local skylines is a provable superset), then one exact
    pass on the candidates-bounded union — dominance is transitive, so
    any global dominator is represented in the union.  Equal (price,
    size) duplicates are mutually non-dominating and all kept, exactly
    like the twin's strict NOT EXISTS."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_size",
                                   "p_retailprice"])

    def local(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.round(t["p_retailprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        size = t["p_size"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _skyline_2d(cents, size, k)
        return pa.table({"p_partkey": pa.array(k[m]),
                         "cents": pa.array(cents[m]),
                         "p_size": pa.array(size[m])})

    cand = relational.ds_to_table(
        parts.map_batches(local, batch_format="pyarrow")).to_pandas()
    m = _skyline_2d(cand["cents"].to_numpy(np.int64),
                    cand["p_size"].to_numpy(np.int64),
                    cand["p_partkey"].to_numpy(np.int64))
    out = cand[m].sort_values("p_partkey").reset_index(drop=True)
    return out.astype({"p_partkey": np.int64, "cents": np.int64,
                       "p_size": np.int64})


SQL_SKYLINE = """
WITH p AS (SELECT p_partkey,
                  CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
                  CAST(p_size AS BIGINT) AS p_size
           FROM part)
SELECT p_partkey, cents, p_size FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.cents <= a.cents AND b.p_size >= a.p_size
    AND (b.cents < a.cents OR b.p_size > a.p_size))
ORDER BY p_partkey
"""


def q_funnel_3step_strict(sf_dir: str):
    """Strictly-ordered 3-step funnel (click → view → purchase): a user
    converts at step k when an event of type k exists STRICTLY after
    their earliest completion of step k−1 — the sequential-pattern
    semantics a 2-step funnel can't express (a view before the first
    click must not count).  One user-bucket shuffle; inside each bucket
    the three anchor times come from vectorized per-user min/merge
    passes, and only three partial counters leave the bucket."""
    from ..stages.relational import stable_bucket
    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t1 = g[g["event_type"] == "click"] \
            .groupby("user_id")["ts"].min()
        v = g[g["event_type"] == "view"][["user_id", "ts"]] \
            .merge(t1.rename("t1"), on="user_id")
        t2 = v[v["ts"] > v["t1"]].groupby("user_id")["ts"].min()
        p = g[g["event_type"] == "purchase"][["user_id", "ts"]] \
            .merge(t2.rename("t2"), on="user_id")
        t3 = p[p["ts"] > p["t2"]].groupby("user_id")["ts"].min()
        return pd.DataFrame([{"pc": len(t1), "pv": len(t2),
                              "pp": len(t3)}])

    from ray.data.aggregate import Sum
    agg = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas") \
        .aggregate(Sum("pc", alias_name="n_click"),
                   Sum("pv", alias_name="n_click_view"),
                   Sum("pp", alias_name="n_full"))
    return pd.DataFrame([{"n_click": int(agg["n_click"]),
                          "n_click_view": int(agg["n_click_view"]),
                          "n_full": int(agg["n_full"])}]) \
        .astype(np.int64)


SQL_FUNNEL_3STEP = """
WITH c AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'click' GROUP BY 1),
v AS (SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > c.t1 GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t2 GROUP BY 1)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_click_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full
"""


def q_range_rebalance_layout(sf_dir: str):
    """Equi-COUNT layout rebalance (the OPTIMIZE half zone maps rely
    on): orders' day key is skewed across the calendar, so a UNIFORM
    [min, max] range split gives lopsided files; this op derives 7
    exact-quantile cut points (the integer 8·cum ≥ k·N rule on the
    days-bounded day histogram — no sort, no sampling) and rewrites
    through ``write_clustered(boundaries=...)``, preserving global
    file order.  Returned per-range row counts come from the WRITTEN
    FILES' footers, so the oracle (same quantile rule in SQL) checks
    the actual layout, and pytest pins the balance improvement vs the
    uniform split."""
    import glob
    import os
    import uuid

    import pyarrow.parquet as pq_
    from ray.data.aggregate import Sum
    from ..runtime.checkpoint import write_clustered

    N_RANGES = 8

    def add_day(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        return pa.table({"day": pa.array(day),
                         "o_totalprice": t["o_totalprice"]})

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(add_day, batch_format="pyarrow")

    def day_counts(t: pa.Table) -> pa.Table:
        u, n = np.unique(t["day"].to_numpy(), return_counts=True)
        return pa.table({"day": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    hist = relational.ds_to_table(
        orders.map_batches(day_counts, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("day")
    days = hist["day"].to_numpy(np.int64)
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    N = int(cum[-1])
    bnds = [int(days[np.searchsorted(cum, -(-k * N // N_RANGES))])
            for k in range(1, N_RANGES)]

    out = _fingerprint_cache_dir(sf_dir, "orders", "rebalance")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        write_clustered(orders, tmp, key_col="day",
                        boundaries=bnds)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    files = sorted(glob.glob(os.path.join(out, "part=*",
                                          "*.parquet")))
    # range_id from the committed range LABEL (part=000k), not the
    # file enumeration — duplicate quantile boundaries leave a range
    # empty, and the SQL twin skips that id too
    rows = [{"range_id": int(os.path.basename(
                 os.path.dirname(f)).split("=")[1]),
             "n_rows": pq_.read_metadata(f).num_rows}
            for f in files]
    q_range_rebalance_layout._last_boundaries = bnds
    return pd.DataFrame(rows).astype({"range_id": np.int64,
                                      "n_rows": np.int64})


SQL_RANGE_REBALANCE = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day
           FROM orders),
h AS (SELECT day, COUNT(*) AS n FROM d GROUP BY 1),
c AS (SELECT day, SUM(n) OVER (ORDER BY day) AS cum,
             (SELECT SUM(n) FROM h) AS tot
      FROM h),
b AS (SELECT k, MIN(day) AS bday
      FROM c, unnest(generate_series(1, 7)) AS t(k)
      WHERE 8 * cum >= k * tot GROUP BY k)
SELECT CAST((SELECT COUNT(*) FROM b WHERE b.bday < d.day) AS BIGINT)
         AS range_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM d GROUP BY 1 ORDER BY 1
"""


def q_cuped_adjusted_ab(sf_dir: str):
    """CUPED variance-reduced A/B read-out (the experimentation-
    platform standard): per-user PRE-period event value is the
    covariate for the POST-period metric, θ = cov(x,y)/var(x) pooled,
    and the arm contrast is adjusted by −θ·(x̄₁−x̄₀).  One user-bucket
    shuffle builds (xᵢ, yᵢ) per user; cov/var come from exact int64
    cents power sums; the single float finish mirrors the twin's CAST
    order.  Arms are the deterministic user-id parity, the time split
    is the epoch-day midpoint — both mirrored verbatim."""
    from ray.data.aggregate import Max, Min, Sum
    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "user_id", "value"])
    lohi = ev.aggregate(Min("ts", alias_name="lo"),
                        Max("ts", alias_name="hi"))
    lo_d = int(pd.Timestamp(lohi["lo"]).value // 1000
               // 86_400_000_000)
    hi_d = int(pd.Timestamp(lohi["hi"]).value // 1000
               // 86_400_000_000)
    mid = (lo_d + hi_d) // 2

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        cents = np.round(g["value"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        u = g["user_id"].to_numpy(np.int64)
        df = pd.DataFrame({"u": u, "x": np.where(day <= mid, cents, 0),
                           "y": np.where(day > mid, cents, 0)})
        per_u = df.groupby("u", sort=False).sum().reset_index()
        x = per_u["x"].to_numpy(np.int64)
        y = per_u["y"].to_numpy(np.int64)
        arm = (per_u["u"].to_numpy(np.int64) % 2)
        out = {"n": len(per_u), "sx": int(x.sum()),
               "sy": int(y.sum()), "sxx": int((x * x).sum()),
               "sxy": int((x * y).sum())}
        for a in (0, 1):
            m = arm == a
            out[f"n{a}"] = int(m.sum())
            out[f"sx{a}"] = int(x[m].sum())
            out[f"sy{a}"] = int(y[m].sum())
        return pd.DataFrame([out])

    cols = ["n", "sx", "sy", "sxx", "sxy",
            "n0", "sx0", "sy0", "n1", "sx1", "sy1"]
    agg = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas") \
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    s = {c: int(agg[c]) for c in cols}
    theta = float(s["n"] * s["sxy"] - s["sx"] * s["sy"]) \
        / float(s["n"] * s["sxx"] - s["sx"] * s["sx"])
    raw = float(s["sy1"]) / s["n1"] - float(s["sy0"]) / s["n0"]
    adj = raw - theta * (float(s["sx1"]) / s["n1"]
                         - float(s["sx0"]) / s["n0"])
    return pd.DataFrame([{
        "n_users": s["n"], "theta": np.round(theta, 6),
        "raw_diff": np.round(raw, 4),
        "cuped_diff": np.round(adj, 4)}]).astype({"n_users": np.int64})


SQL_CUPED = """
WITH b AS (SELECT (MIN(epoch_us(ts) // 86400000000)
                   + MAX(epoch_us(ts) // 86400000000)) // 2 AS mid
           FROM events),
pu AS (SELECT user_id,
              SUM(CASE WHEN epoch_us(ts) // 86400000000 <= b.mid
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) AS x,
              SUM(CASE WHEN epoch_us(ts) // 86400000000 > b.mid
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) AS y
       FROM events, b GROUP BY user_id),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END) AS sx0,
             SUM(CASE WHEN user_id % 2 = 0 THEN y ELSE 0 END) AS sy0,
             SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END) AS sx1,
             SUM(CASE WHEN user_id % 2 = 1 THEN y ELSE 0 END) AS sy1
      FROM pu)
SELECT CAST(n AS BIGINT) AS n_users,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
       ROUND(CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0, 4)
         AS raw_diff,
       ROUND(CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE))
               * (CAST(sx1 AS DOUBLE) / n1
                  - CAST(sx0 AS DOUBLE) / n0), 4) AS cuped_diff
FROM s
"""


# ordered first-match-wins routing rules; the SQL CASE is generated
# from THIS list so the two sides cannot drift
_ROUTING_RULES = [
    ("ops", "error|fail"),
    ("query", "scan|join|sort"),
    ("stream", "window|batch|stream"),
]


def q_regex_routing_table(sf_dir: str):
    """Rules-engine routing: an ORDERED multi-pattern table classifies
    every document by its FIRST matching RE2 rule (default route
    'other') — the content-router every ingest pipeline runs.  One
    vectorized ``match_substring_regex`` pass per rule (rules-bounded,
    never per-row Python), an unassigned mask enforcing first-match
    precedence, and a routes-bounded count groupby.  The twin's CASE
    chain is generated from the same rule list."""
    from ray.data.aggregate import Sum
    docs = _read(sf_dir, "documents", ["text"])

    def route(t: pa.Table) -> pa.Table:
        n = t.num_rows
        routes = np.full(n, "other", dtype=object)
        unassigned = np.ones(n, dtype=bool)
        for name, pat in _ROUTING_RULES:
            m = pc.match_substring_regex(t["text"], pat) \
                .to_numpy(zero_copy_only=False)
            hit = unassigned & m
            routes[hit] = name
            unassigned &= ~m
        g = pd.DataFrame({"route": routes, "pn": 1}) \
            .groupby("route", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        docs.map_batches(route, batch_format="pyarrow")
        .groupby("route").aggregate(Sum("pn", alias_name="n_docs"))
    ).to_pandas().sort_values("route").reset_index(drop=True)
    return out.astype({"n_docs": np.int64})


def _sql_routing() -> str:
    whens = "\n         ".join(
        f"WHEN regexp_matches(text, '{pat}') THEN '{name}'"
        for name, pat in _ROUTING_RULES)
    return f"""
SELECT CASE {whens}
         ELSE 'other' END AS route,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_paginate_orders_page6(sf_dir: str):
    """Deep pagination WITHOUT a global sort: rows 101–120 of orders by
    (revenue DESC, orderkey ASC).  The composite order packs into one
    int64 (``pack_desc_rank_key``); a coarse 4096-bucket histogram of
    the packed key locates which buckets hold global ranks 101–120
    (buckets-bounded driver state), ONLY those buckets' rows are
    re-read and locally sorted, and the page is sliced at its exact
    offset — the OFFSET/LIMIT the oracle runs, at a scan cost of
    page-covering buckets instead of a full shuffle."""
    from ray.data.aggregate import Sum
    from ..stages.relational import pack_desc_rank_key

    LO_RANK, HI_RANK = 100, 120          # half-open [100, 120)
    SHIFT = 52                           # 4096 coarse buckets

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def packed(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        key = pack_desc_rank_key(cents, 1 << 30, k)
        return pa.table({"key": pa.array(key),
                         "o_orderkey": pa.array(k),
                         "cents": pa.array(cents)})

    ds = orders.map_batches(packed, batch_format="pyarrow")

    def bucket_hist(t: pa.Table) -> pa.Table:
        b = t["key"].to_numpy() >> SHIFT
        u, n = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    hist = relational.ds_to_table(
        ds.map_batches(bucket_hist, batch_format="pyarrow")
        .groupby("b").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("b")
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    before = np.concatenate(([0], cum[:-1]))
    need = (cum > LO_RANK) & (before < HI_RANK)
    want_b = hist["b"].to_numpy(np.int64)[need]
    offset_before = int(before[need][0]) if need.any() else 0
    q_paginate_orders_page6._last_scan = (len(hist), int(need.sum()))

    def keep(t: pa.Table) -> pa.Table:
        b = t["key"].to_numpy() >> SHIFT
        return t.filter(pa.array(np.isin(b, want_b)))

    cand = relational.ds_to_table(
        ds.map_batches(keep, batch_format="pyarrow")).to_pandas() \
        .sort_values("key").reset_index(drop=True)
    page = cand.iloc[LO_RANK - offset_before:
                     HI_RANK - offset_before]
    return pd.DataFrame({
        "rank": np.arange(LO_RANK + 1, LO_RANK + 1 + len(page),
                          dtype=np.int64),
        "o_orderkey": page["o_orderkey"].to_numpy(np.int64),
        "cents": page["cents"].to_numpy(np.int64)})


SQL_PAGINATE = """
SELECT CAST(100 + ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey)
            AS BIGINT) AS rank,
       o_orderkey, cents
FROM (SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      ORDER BY cents DESC, o_orderkey LIMIT 20 OFFSET 100)
"""


_EXPECTATION_RULES = [
    # (rule name, kind) — thresholds live in the kernels below and the
    # generated SQL mirrors them; counts are FLAGGED rows (0 = clean)
    "orderkey_unique_dup_rows",
    "price_nonpositive",
    "status_outside_domain",
    "custkey_fk_orphans",
    "price_above_50k",
    "date_before_1996",
]


def q_expectations_audit(sf_dir: str):
    """Data-contract expectations suite (the Great-Expectations-style
    validation gate an ingest runs before publishing): six rules over
    orders — key uniqueness, positivity, a categorical domain, an FK
    into customer, and two business flags — each answered with ONE
    flagged-row count.  Scan rules fold per batch; uniqueness rides an
    exact key-bucket distinct (count − distinct, shuffle on hashes
    only); the FK is a size-guarded broadcast of the customer key set.
    Rules whose count is 0 prove cleanliness; the two business flags
    fire on real rows so the suite's plumbing is visibly exercised."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice", "o_orderdate"])
    cust_keys = set(relational.ds_to_table(
        _read(sf_dir, "customer", ["c_custkey"]))["c_custkey"]
        .to_pylist())
    ck_ref = ray.put(np.array(sorted(cust_keys), dtype=np.int64))
    cutoff = int(pd.Timestamp("1996-01-01").value // 1000)

    def scan(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        status = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys = ray.get(ck_ref)
        pos = np.searchsorted(keys, ck)
        pos_ok = (pos < len(keys))
        fk_bad = ~pos_ok
        fk_bad[pos_ok] = keys[pos[pos_ok]] != ck[pos_ok]
        return pa.table({
            "p_nonpos": pa.array([int((price <= 0).sum())]),
            "p_status": pa.array([int(
                (~np.isin(status, ["O", "F", "P"])).sum())]),
            "p_fk": pa.array([int(fk_bad.sum())]),
            "p_50k": pa.array([int((price > 50_000.0).sum())]),
            "p_date": pa.array([int((ts < cutoff).sum())]),
            "p_n": pa.array([t.num_rows])})

    agg = orders.map_batches(scan, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in
          ("p_nonpos", "p_status", "p_fk", "p_50k", "p_date", "p_n")])

    def key_partial(t: pa.Table) -> pa.Table:
        u = np.unique(t["o_orderkey"].to_numpy())
        return pa.table({"k": pa.array(u)})

    # exact distinct: per-batch distinct → one hash groupby → count
    n_distinct = orders.map_batches(key_partial,
                                    batch_format="pyarrow") \
        .groupby("k").count().count()
    rows = [
        ("orderkey_unique_dup_rows", int(agg["p_n"]) - int(n_distinct)),
        ("price_nonpositive", int(agg["p_nonpos"])),
        ("status_outside_domain", int(agg["p_status"])),
        ("custkey_fk_orphans", int(agg["p_fk"])),
        ("price_above_50k", int(agg["p_50k"])),
        ("date_before_1996", int(agg["p_date"])),
    ]
    return pd.DataFrame(rows, columns=["rule", "n_flagged"]) \
        .sort_values("rule").reset_index(drop=True) \
        .astype({"n_flagged": np.int64})


SQL_EXPECTATIONS = """
WITH r AS (
  SELECT 'orderkey_unique_dup_rows' AS rule,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS n FROM orders
  UNION ALL
  SELECT 'price_nonpositive', COUNT(*) FILTER (o_totalprice <= 0)
  FROM orders
  UNION ALL
  SELECT 'status_outside_domain',
         COUNT(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
  FROM orders
  UNION ALL
  SELECT 'custkey_fk_orphans', COUNT(*)
  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
  UNION ALL
  SELECT 'price_above_50k', COUNT(*) FILTER (o_totalprice > 50000.0)
  FROM orders
  UNION ALL
  SELECT 'date_before_1996',
         COUNT(*) FILTER (o_orderdate < TIMESTAMP '1996-01-01')
  FROM orders)
SELECT rule, CAST(n AS BIGINT) AS n_flagged FROM r ORDER BY rule
"""


def q_changepoint_daily_revenue(sf_dir: str):
    """Single changepoint detection (binary segmentation, first split):
    the day index that maximizes the between-segment sum of squares
    B(k) = S²ₗ/k + S²ᵣ/(n−k) over the observed daily-revenue sequence —
    equivalent to minimizing total SSE, no variance computed anywhere.
    The distributed part is the shared daily-cents reduce; the argmax
    runs on the DAYS-bounded prefix sums with arbitrary-precision
    squares (S² overflows int64 past ~sf0.1) and the exact float
    expression the twin uses; float ties break to the earliest day on
    both sides."""
    d = _daily_revenue_cents(sf_dir)
    rev = [int(v) for v in d["rev"].to_numpy(np.int64)]
    days = d["day"].to_numpy(np.int64)
    n = len(rev)
    total = sum(rev)
    best = None
    cum = 0
    for k in range(1, n):                 # split after position k
        cum += rev[k - 1]
        b = float(cum * cum) / k \
            + float((total - cum) * (total - cum)) / (n - k)
        if best is None or b > best[0]:
            best = (b, k, cum)
    _, k, sl = best
    return pd.DataFrame([{
        "split_day": int(days[k]),        # first day of the RIGHT part
        "n_left": k, "n_right": n - k,
        "mean_left": np.round(float(sl) / k, 4),
        "mean_right": np.round(float(total - sl) / (n - k), 4)}]) \
        .astype({"split_day": np.int64, "n_left": np.int64,
                 "n_right": np.int64})


SQL_CHANGEPOINT = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
s AS (SELECT day, rev,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             SUM(rev) OVER (ORDER BY day) AS cum,
             (SELECT SUM(rev) FROM d) AS tot,
             (SELECT COUNT(*) FROM d) AS n
      FROM d),
b AS (SELECT LEAD(day) OVER (ORDER BY day) AS split_day,
             rn AS k, cum, tot, n,
             CAST(cum * cum AS DOUBLE) / rn
             + CAST((tot - cum) * (tot - cum) AS DOUBLE) / (n - rn)
               AS bss
      FROM s QUALIFY rn < n)
SELECT split_day,
       CAST(k AS BIGINT) AS n_left, CAST(n - k AS BIGINT) AS n_right,
       ROUND(CAST(cum AS DOUBLE) / k, 4) AS mean_left,
       ROUND(CAST(tot - cum AS DOUBLE) / (n - k), 4) AS mean_right
FROM b ORDER BY bss DESC, k LIMIT 1
"""


def q_next_event_prediction_acc(sf_dir: str):
    """Sequence-model baseline evaluation: a first-order Markov
    next-event predictor is FIT on the early half of every user's
    stream (argmax next-type per current type, ties alphabetical) and
    SCORED on the late half — train/test split at the global time
    midpoint, the leakage-free protocol.  Transitions reduce to a
    types²-bounded matrix per split; scoring is one vectorized map
    over test transitions.  Output: per current-type test accuracy."""
    from ray.data.aggregate import Max, Min, Sum
    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id",
                                  "event_type"])
    lohi = ev.aggregate(Min("ts", alias_name="lo"),
                        Max("ts", alias_name="hi"))
    mid_us = (int(pd.Timestamp(lohi["lo"]).value // 1000)
              + int(pd.Timestamp(lohi["hi"]).value // 1000)) // 2

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = u[1:] == u[:-1]
        # a transition belongs to the split of its SOURCE event
        src, dst = et[:-1][same], et[1:][same]
        half = (ts[:-1][same] > mid_us).astype(np.int64)
        out = pd.DataFrame({"half": half, "src": src, "dst": dst,
                            "pn": 1}) \
            .groupby(["half", "src", "dst"], sort=False).sum() \
            .reset_index()
        return out

    tm = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(transitions,
                                       batch_format="pandas")
        .groupby(["half", "src", "dst"])
        .aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    train = tm[tm["half"] == 0]
    pred = train.sort_values(["src", "n", "dst"],
                             ascending=[True, False, True]) \
        .groupby("src").head(1).set_index("src")["dst"]
    # like the twin's JOIN pred USING (src): a test src with no
    # trained prediction contributes nothing
    test = tm[(tm["half"] == 1) & tm["src"].isin(pred.index)].copy()
    test["hit"] = (test["dst"]
                   == test["src"].map(pred)).astype(np.int64) \
        * test["n"].astype(np.int64)
    out = test.groupby("src").agg(
        n_test=("n", "sum"), n_hit=("hit", "sum")).reset_index()
    out["accuracy"] = np.round(
        out["n_hit"].to_numpy(np.float64)
        / out["n_test"].to_numpy(np.float64), 4)
    return out.rename(columns={"src": "event_type"}) \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"n_test": np.int64, "n_hit": np.int64})


SQL_NEXT_EVENT = """
WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
           FROM events),
t AS (SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst,
             CASE WHEN epoch_us(ts) > b.mid THEN 1 ELSE 0 END AS half
      FROM events, b),
tm AS (SELECT half, src, dst, COUNT(*) AS n
       FROM t WHERE dst IS NOT NULL GROUP BY 1, 2, 3),
pred AS (SELECT src, dst FROM (
           SELECT src, dst,
                  ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY n DESC, dst) AS r
           FROM tm WHERE half = 0) WHERE r = 1),
test AS (SELECT tm.src, SUM(tm.n) AS n_test,
                SUM(CASE WHEN tm.dst = pred.dst THEN tm.n
                         ELSE 0 END) AS n_hit
         FROM tm JOIN pred USING (src)
         WHERE tm.half = 1 GROUP BY tm.src)
SELECT src AS event_type, CAST(n_test AS BIGINT) AS n_test,
       CAST(n_hit AS BIGINT) AS n_hit,
       ROUND(CAST(n_hit AS DOUBLE) / CAST(n_test AS DOUBLE), 4)
         AS accuracy
FROM test ORDER BY event_type
"""


def q_k_anon_generalize(sf_dir: str):
    """k-anonymity GENERALIZATION (the transform, not just the audit):
    walk a fixed coarsening ladder over the quasi-identifiers
    (nation, acctbal band) — L0 $100 bands, L1 $1000 bands, L2 synth-
    region × $1000, L3 region × sign — and publish at the FIRST level
    where every equivalence class holds ≥ 5 rows.  Each level is one
    bounded count groupby; negative balances shift before the band
    division (DuckDB // truncates toward zero where numpy floors — the
    shift keeps both sides in positive territory).  Output: chosen
    level + its class stats."""
    from ray.data.aggregate import Sum

    K = 5
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def level_stats(level: int):
        def partial(t: pa.Table) -> pa.Table:
            nk = t["c_nationkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cents = np.round(t["c_acctbal"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            shifted = cents + 100_000
            if level == 0:
                g1, g2 = nk, shifted // 10_000
            elif level == 1:
                g1, g2 = nk, shifted // 100_000
            elif level == 2:
                g1, g2 = nk // 5, shifted // 100_000
            else:
                g1, g2 = nk // 5, (shifted >= 100_000).astype(np.int64)
            g = pd.DataFrame({"g1": g1, "g2": g2, "pn": 1}) \
                .groupby(["g1", "g2"], sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        t = relational.ds_to_table(
            cust.map_batches(partial, batch_format="pyarrow")
            .groupby(["g1", "g2"]).aggregate(Sum("pn",
                                                 alias_name="n"))
        ).to_pandas()
        return len(t), int(t["n"].min())

    for level in (0, 1, 2, 3):
        n_groups, min_size = level_stats(level)
        if min_size >= K:
            break
    return pd.DataFrame([{"chosen_level": level,
                          "n_groups": n_groups,
                          "min_group_size": min_size}]) \
        .astype(np.int64)


SQL_K_ANON = """
WITH c AS (SELECT c_nationkey AS nk,
                  CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000
                    AS sc
           FROM customer),
l0 AS (SELECT COUNT(*) AS gs FROM c GROUP BY nk, sc // 10000),
l1 AS (SELECT COUNT(*) AS gs FROM c GROUP BY nk, sc // 100000),
l2 AS (SELECT COUNT(*) AS gs FROM c
       GROUP BY nk // 5, sc // 100000),
l3 AS (SELECT COUNT(*) AS gs FROM c
       GROUP BY nk // 5, CASE WHEN sc >= 100000 THEN 1 ELSE 0 END),
s AS (SELECT 0 AS lvl, COUNT(*) AS n_groups, MIN(gs) AS mn FROM l0
      UNION ALL SELECT 1, COUNT(*), MIN(gs) FROM l1
      UNION ALL SELECT 2, COUNT(*), MIN(gs) FROM l2
      UNION ALL SELECT 3, COUNT(*), MIN(gs) FROM l3)
SELECT CAST(lvl AS BIGINT) AS chosen_level,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(mn AS BIGINT) AS min_group_size
FROM s WHERE mn >= 5 OR lvl = 3
ORDER BY lvl LIMIT 1
"""


def q_theilsen_slope_revenue(sf_dir: str):
    """Theil–Sen robust trend estimator over daily revenue: the MEDIAN
    of all pairwise slopes (rⱼ−rᵢ)/(dⱼ−dᵢ) — outlier days cannot move
    it, unlike the OLS slope.  The distributed part is the shared
    daily-cents reduce; the O(days²) pair enumeration is DAYS-bounded
    by construction (~3M float slopes per decade of data — driver-
    trivial), matching the twin's inequality self-join + MEDIAN."""
    d = _daily_revenue_cents(sf_dir)
    rev = d["rev"].to_numpy(np.float64)
    day = d["day"].to_numpy(np.int64)
    i, j = np.triu_indices(len(rev), k=1)
    slopes = (rev[j] - rev[i]) / (day[j] - day[i])
    return pd.DataFrame([{
        "n_pairs": len(slopes),
        "slope": np.round(float(np.median(slopes)), 6)}]) \
        .astype({"n_pairs": np.int64})


SQL_THEILSEN = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                       AS DOUBLE) AS rev
           FROM orders GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MEDIAN((b.rev - a.rev) / (b.day - a.day)), 6) AS slope
FROM d a JOIN d b ON a.day < b.day
"""


def q_poststratification_weights(sf_dir: str):
    """Post-stratification calibration: after the standard 20 % hash
    sample of documents, per-language weights re-align the sample to
    the population (wₗ = pop-shareₗ / sample-shareₗ) — the survey-
    statistics fix every eval-set builder applies when a cheap sampler
    under- or over-draws a stratum.  Two bounded count aggregates (one
    per frame), a langs-bounded driver division mirroring the twin's
    CAST order; languages the sample missed drop like the INNER
    join."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def counts(sample_only: bool):
        def partial(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            keep = np.ones(len(ids), dtype=bool)
            if sample_only:
                with np.errstate(over="ignore"):
                    h = (ids + np.uint64(1)) \
                        * np.uint64(11400714819323198485)
                keep = (h % np.uint64(1_000_000)) \
                    < np.uint64(200_000)
            g = pd.DataFrame({"lang": t["lang"].to_numpy(
                zero_copy_only=False)[keep], "pn": 1}) \
                .groupby("lang", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return relational.ds_to_table(
            docs.map_batches(partial, batch_format="pyarrow")
            .groupby("lang").aggregate(Sum("pn", alias_name="n"))
        ).to_pandas()

    pop = counts(False).rename(columns={"n": "pop_n"})
    smp = counts(True).rename(columns={"n": "samp_n"})
    out = pop.merge(smp, on="lang")
    tp = float(out["pop_n"].sum())
    tsm = float(out["samp_n"].sum())
    out["weight"] = np.round(
        (out["pop_n"].to_numpy(np.float64) / tp)
        / (out["samp_n"].to_numpy(np.float64) / tsm), 6)
    return out.sort_values("lang").reset_index(drop=True) \
        .astype({"pop_n": np.int64, "samp_n": np.int64})


SQL_POSTSTRAT = """
WITH pop AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS pop_n
             FROM documents GROUP BY 1),
smp AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS samp_n
        FROM documents
        WHERE ((CAST(doc_id + 1 AS HUGEINT) * 11400714819323198485)
               % 18446744073709551616) % 1000000 < 200000
        GROUP BY 1),
t AS (SELECT SUM(pop_n) AS tp FROM pop),
u AS (SELECT SUM(samp_n) AS ts FROM smp)
SELECT lang, pop_n, samp_n,
       ROUND((CAST(pop_n AS DOUBLE) / t.tp)
             / (CAST(samp_n AS DOUBLE) / u.ts), 6) AS weight
FROM pop JOIN smp USING (lang), t, u
ORDER BY lang
"""


def _monotone_chain_hull(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the strictly-convex hull (Andrew monotone chain,
    collinear points dropped) in counter-clockwise order over integer
    coordinates — exact cross products, no floats anywhere."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)
    n = len(pts)
    if n <= 2:
        return pts
    def half(p):
        out = []
        for q in p:
            while len(out) >= 2:
                ax, ay = out[-2]
                bx, by = out[-1]
                if (int(bx) - ax) * (int(q[1]) - ay) \
                        - (int(by) - ay) * (int(q[0]) - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append((int(q[0]), int(q[1])))
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    return np.array(hull, dtype=np.int64)


def q_convex_hull_nations(sf_dir: str):
    """Per-nation convex hull of the customer points — the geo
    aggregate behind coverage footprints and service areas.  Hull is a
    SUPERSET-reduction like the skyline: hull(S) = hull(∪ hull(Sᵢ)),
    so each batch emits only its local hull vertices per nation and
    the exact finish runs on the candidates-bounded union (25 nations
    × O(hull) points).  Integer cross products throughout — no float
    orientation tests; doubled shoelace area stays an exact int.
    Geometry has no SQL twin; correctness is pinned by the brute-force
    hull cross-check and the all-points-inside property test."""
    from ray.data.aggregate import Sum  # noqa: F401 (symmetry)

    pts = _read(sf_dir, "customer", ["c_custkey"])

    def local(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = (k * 7919) % 1000
        y = (k * 104729) % 1000
        nat = (x // 200) + 5 * (y // 200)
        out_n, out_x, out_y = [], [], []
        for n in np.unique(nat):
            m = nat == n
            hull = _monotone_chain_hull(x[m], y[m])
            out_n.extend([int(n)] * len(hull))
            out_x.extend(hull[:, 0].tolist())
            out_y.extend(hull[:, 1].tolist())
        return pa.table({"nat": pa.array(out_n, type=pa.int64()),
                         "hx": pa.array(out_x, type=pa.int64()),
                         "hy": pa.array(out_y, type=pa.int64())})

    cand = relational.ds_to_table(
        pts.map_batches(local, batch_format="pyarrow")).to_pandas()
    rows = []
    for n, g in cand.groupby("nat"):
        hull = _monotone_chain_hull(g["hx"].to_numpy(np.int64),
                                    g["hy"].to_numpy(np.int64))
        hx, hy = hull[:, 0], hull[:, 1]
        area2 = int(np.dot(hx, np.roll(hy, -1))
                    - np.dot(hy, np.roll(hx, -1))) if len(hull) >= 3 \
            else 0
        rows.append({"n_nationkey": int(n),
                     "n_vertices": len(hull),
                     "area2": abs(area2)})
    q_convex_hull_nations._last_hulls = {
        r["n_nationkey"]: r for r in rows}
    return pd.DataFrame(rows).sort_values("n_nationkey") \
        .reset_index(drop=True).astype(np.int64)


def q_type_daily_corr(sf_dir: str):
    """Cross-series Pearson correlation matrix of the DAILY event
    counts, one row per unordered type pair — the co-movement
    diagnostic next to the single-series ACF.  Per-(day, type) counts
    reduce distributedly; the calendar gap-fill (a day with no events
    of a type counts 0 for it) and the 10-pair power-sum finish are
    days-bounded.  Integer sums, one mirrored float expression per
    pair."""
    import math
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        g = pd.DataFrame({"day": day,
                          "et": t["event_type"].to_numpy(
                              zero_copy_only=False), "pn": 1}) \
            .groupby(["day", "et"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "et"]).aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    lo, hi = int(cnt["day"].min()), int(cnt["day"].max())
    n_days = hi - lo + 1
    types = sorted(cnt["et"].unique())
    series = {}
    for t_ in types:
        s = np.zeros(n_days, dtype=np.int64)
        g = cnt[cnt["et"] == t_]
        s[g["day"].to_numpy(np.int64) - lo] = g["n"].to_numpy(np.int64)
        series[t_] = s
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            xa, xb = series[a], series[b]
            sx, sy = int(xa.sum()), int(xb.sum())
            sxx = int((xa * xa).sum())
            syy = int((xb * xb).sum())
            sxy = int((xa * xb).sum())
            num = float(n_days * sxy - sx * sy)
            den = math.sqrt(float(n_days * sxx - sx * sx)) \
                * math.sqrt(float(n_days * syy - sy * sy))
            rows.append({"type_a": a, "type_b": b,
                         "r": np.round(num / den, 6)})
    return pd.DataFrame(rows)


SQL_TYPE_CORR = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type
           FROM events),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
ty AS (SELECT DISTINCT event_type AS et FROM e),
cnt AS (SELECT day, et,
               (SELECT COUNT(*) FROM e
                WHERE e.day = cal.day AND e.event_type = ty.et) AS n
        FROM cal, ty),
nd AS (SELECT COUNT(*) AS n_days FROM cal),
p AS (SELECT a.et AS type_a, c.et AS type_b,
             SUM(a.n) AS sx, SUM(c.n) AS sy,
             SUM(a.n * a.n) AS sxx, SUM(c.n * c.n) AS syy,
             SUM(a.n * c.n) AS sxy
      FROM cnt a JOIN cnt c ON a.day = c.day AND a.et < c.et
      GROUP BY 1, 2)
SELECT type_a, type_b,
       ROUND(CAST(nd.n_days * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(nd.n_days * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(nd.n_days * syy - sy * sy AS DOUBLE))),
             6) AS r
FROM p, nd ORDER BY type_a, type_b
"""


def q_nn_distance_histogram(sf_dir: str):
    """Exact all-points nearest-neighbor distance histogram (the
    spatial-statistics primitive behind clustering diagnostics and
    Ripley-style tests): each customer point's distance to its nearest
    OTHER point, bucketed by 10 units.  Grid-accelerated exactly: a
    3×3 cell neighborhood (cell = 50 units) resolves a point only when
    the best candidate is PROVABLY nearest (d ≤ cell size, so no
    closer point can hide outside the ring); the unresolved minority
    falls back to an exact pass against the full (broadcast) point
    set.  Integer squared distances throughout; the oracle brute-
    forces the |N|² join."""
    pts_tbl = relational.ds_to_table(
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            lambda t: pa.table({
                "k": t["c_custkey"],
                "x": pa.array((t["c_custkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64) * 7919)
                    % 1000),
                "y": pa.array((t["c_custkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64) * 104729)
                    % 1000)}),
            batch_format="pyarrow"))
    # the per-cell candidate index is grid-bounded (≤ 400 cells) and
    # broadcast once — the scale path shards the 3×3 probe by cell
    allx = pts_tbl["x"].to_numpy(zero_copy_only=False)
    ally = pts_tbl["y"].to_numpy(zero_copy_only=False)
    allk = pts_tbl["k"].to_numpy(zero_copy_only=False)
    CELL = 50
    cells: dict[tuple[int, int], np.ndarray] = {}
    cid = np.stack([allx // CELL, ally // CELL], axis=1)
    for c in np.unique(cid, axis=0):
        m = (cid[:, 0] == c[0]) & (cid[:, 1] == c[1])
        cells[(int(c[0]), int(c[1]))] = np.where(m)[0]

    def nn_d2(idx: np.ndarray) -> np.ndarray:
        """Exact NN squared distance for the point indices given."""
        best = np.full(len(idx), np.iinfo(np.int64).max,
                       dtype=np.int64)
        for pos, i in enumerate(idx):
            cx, cy = int(allx[i]) // CELL, int(ally[i]) // CELL
            cand = np.concatenate([
                cells.get((cx + dx, cy + dy), np.empty(0, np.int64))
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
            cand = cand[allk[cand] != allk[i]]
            if len(cand):
                d2 = (allx[cand] - allx[i]) ** 2 \
                    + (ally[cand] - ally[i]) ** 2
                best[pos] = int(d2.min())
            if best[pos] > CELL * CELL:      # ring can't prove it
                d2 = (allx - allx[i]) ** 2 + (ally - ally[i]) ** 2
                d2 = d2[allk != allk[i]]
                best[pos] = int(d2.min())
        return best

    d2 = nn_d2(np.arange(len(allx)))
    bucket = (np.floor(np.sqrt(d2.astype(np.float64)))
              .astype(np.int64)) // 10
    u, n = np.unique(bucket, return_counts=True)
    return pd.DataFrame({"bucket": u.astype(np.int64),
                         "n_points": n.astype(np.int64)})


SQL_NN_HISTOGRAM = """
WITH p AS (SELECT c_custkey AS k,
                  (c_custkey * 7919) % 1000 AS x,
                  (c_custkey * 104729) % 1000 AS y
           FROM customer),
nn AS (SELECT a.k,
              MIN((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)) AS d2
       FROM p a JOIN p b ON a.k <> b.k GROUP BY a.k)
SELECT CAST(FLOOR(SQRT(CAST(d2 AS DOUBLE))) AS BIGINT) // 10
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM nn GROUP BY 1 ORDER BY 1
"""


def q_dau_overlap_jaccard(sf_dir: str):
    """Day-over-day active-user stickiness: |DAU_d ∩ DAU_{d+1}| and
    its Jaccard, per consecutive day pair — the retention pulse chart.
    No set is ever materialized: one user-bucket shuffle sorts each
    user's distinct active days, consecutive-day presence emits
    (day, 1) partials vectorized (diff == 1), and per-day DAU sizes
    come from the same distinct pass; the Jaccard finish is
    days-bounded."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def tag(batch: pa.Table) -> pa.Table:
        day = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        b = stable_bucket(batch["user_id"], 64)
        return pa.table({"user_id": batch["user_id"],
                         "day": pa.array(day),
                         "_bucket": pa.array(b)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        du = g[["user_id", "day"]].drop_duplicates()
        du = du.sort_values(["user_id", "day"])
        u = du["user_id"].to_numpy(np.int64)
        d = du["day"].to_numpy(np.int64)
        consec = (u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)
        out = pd.concat([
            pd.DataFrame({"day": d, "pn": 1, "pi": 0}),
            pd.DataFrame({"day": d[:-1][consec], "pn": 0, "pi": 1})])
        return out.groupby("day", sort=False).sum().reset_index()

    agg = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
        .groupby("day").aggregate(Sum("pn", alias_name="dau"),
                                  Sum("pi", alias_name="inter"))
    ).to_pandas().sort_values("day").reset_index(drop=True)
    day = agg["day"].to_numpy(np.int64)
    dau = agg["dau"].to_numpy(np.int64)
    inter = agg["inter"].to_numpy(np.int64)
    nxt = dict(zip(day, dau))
    rows = []
    for i in range(len(day)):
        nb = nxt.get(int(day[i]) + 1)
        if nb is None:
            continue
        it = int(inter[i])
        rows.append({
            "day": int(day[i]), "dau_a": int(dau[i]), "dau_b": nb,
            "n_inter": it,
            "jaccard": np.round(
                float(it) / float(int(dau[i]) + nb - it), 6)})
    return pd.DataFrame(rows).astype({
        "day": np.int64, "dau_a": np.int64, "dau_b": np.int64,
        "n_inter": np.int64})


SQL_DAU_OVERLAP = """
WITH a AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                           user_id
           FROM events),
s AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
      FROM a GROUP BY 1),
i AS (SELECT x.day, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM a x JOIN a y ON x.user_id = y.user_id
                       AND y.day = x.day + 1
      GROUP BY 1)
SELECT s1.day, s1.dau AS dau_a, s2.dau AS dau_b,
       COALESCE(i.n_inter, 0) AS n_inter,
       ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / CAST(s1.dau + s2.dau - COALESCE(i.n_inter, 0)
                    AS DOUBLE), 6) AS jaccard
FROM s s1 JOIN s s2 ON s2.day = s1.day + 1
LEFT JOIN i ON i.day = s1.day
ORDER BY s1.day
"""


def q_grouped_ols_by_flag(sf_dir: str):
    """The GROUPED variant of the exact 2-feature OLS: one price ~
    quantity + discount fit PER returnflag — same int64 power-sum
    partials keyed by the group, same shared Cramer expansion
    (``_OLS2_DETS``), a groups-bounded driver finish.  Shows the Gram
    kernel generalizes to grouped models with one extra groupby key
    and zero new math."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_discount",
                "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.round(t["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        d = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        p = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        df = pd.DataFrame({
            "flag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "n": 1, "sq": q, "sd": d, "sp": p, "sqq": q * q,
            "sdd": d * d, "sqd": q * d, "sqp": q * p, "sdp": d * p})
        g = df.groupby("flag", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cols = ["n", "sq", "sd", "sp", "sqq", "sdd", "sqd", "sqp", "sdp"]
    agg = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("flag").aggregate(
            *[Sum(c, alias_name=c) for c in cols])).to_pandas()
    rows = []
    for r in agg.itertuples():
        sums = {c: int(getattr(r, c)) for c in cols}
        dets = {name: eval(expr, {}, sums)
                for name, expr in _OLS2_DETS.items()}
        det = float(dets["det"])
        rows.append({
            "l_returnflag": r.flag, "n": sums["n"],
            "intercept": np.round(float(dets["det0"]) / det, 6),
            "b_qty": np.round(float(dets["det1"]) / det, 6),
            "b_disc": np.round(float(dets["det2"]) / det, 6)})
    return pd.DataFrame(rows).sort_values("l_returnflag") \
        .reset_index(drop=True).astype({"n": np.int64})


def _sql_grouped_ols() -> str:
    e = _OLS2_DETS
    return f"""
WITH s AS (SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sq,
    SUM(CAST(ROUND(l_discount * 100) AS HUGEINT)) AS sd,
    SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sp,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_quantity) AS HUGEINT)) AS sqq,
    SUM(CAST(ROUND(l_discount * 100) AS HUGEINT)
        * CAST(ROUND(l_discount * 100) AS HUGEINT)) AS sdd,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_discount * 100) AS HUGEINT)) AS sqd,
    SUM(CAST(ROUND(l_quantity) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sqp,
    SUM(CAST(ROUND(l_discount * 100) AS HUGEINT)
        * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sdp
  FROM lineitem GROUP BY 1),
d AS (SELECT l_returnflag, n, {e["det"]} AS det, {e["det0"]} AS det0,
             {e["det1"]} AS det1, {e["det2"]} AS det2 FROM s)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE), 6)
         AS intercept,
       ROUND(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_qty,
       ROUND(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b_disc
FROM d ORDER BY l_returnflag
"""


def q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank: the restart distribution concentrates on
    the seed set {doc_id % 10 == 0} instead of the uniform vector —
    the relevance-propagation primitive behind related-item and
    trust-rank scoring.  The kernel's ``teleport_fn`` makes the
    restart mass a FUNCTION of the node id, evaluated per batch on
    both the broadcast and the join path, so no personalization
    vector ever ships; the same synthetic 3-out-link graph and 9dp
    per-round rounding as the uniform twin, oracle unrolled per
    round."""
    from ..stages import graph_ops
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()
    n_seed = (n + 9) // 10              # ids 0, 10, ... < n

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    def teleport(v: np.ndarray) -> np.ndarray:
        return np.where(v % 10 == 0, 0.15 / n_seed, 0.0)

    nodes = docs.map_batches(
        lambda b: pa.table({"v": b["doc_id"]}), batch_format="pyarrow")
    out = graph_ops.pagerank(
        docs.map_batches(edges, batch_format="pyarrow"), nodes,
        iters=3, damping=0.85, round_dp=9, teleport_fn=teleport)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["v"], "ppr": b["pagerank"]}),
        batch_format="pyarrow")


def _sql_personalized_pagerank() -> str:
    tele = ("CASE WHEN nodes.v % 10 = 0 THEN 0.15 / ns.s"
            " ELSE 0.0 END")
    rounds = []
    prev = "r0"
    for i in range(1, 4):
        rounds.append(f"""
c{i} AS (SELECT e.dst AS v, SUM({prev}.r / deg.outdeg) AS c
       FROM edges e JOIN deg USING (src)
       JOIN {prev} ON {prev}.v = e.src
       GROUP BY e.dst),
r{i} AS (SELECT nodes.v,
              ROUND({tele} + 0.85 * COALESCE(c{i}.c, 0), 9) AS r
       FROM nodes LEFT JOIN c{i} USING (v), ns)""")
        prev = f"r{i}"
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
ns AS (SELECT (n + 9) // 10 AS s FROM nn),
nodes AS (SELECT doc_id AS v FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT nodes.v, ROUND({tele}, 9) AS r FROM nodes, ns),
{','.join(rounds)}
SELECT v AS doc_id, r AS ppr FROM r3
"""


def q_partition_evolution_read(sf_dir: str):
    """Partition-SPEC evolution (Iceberg's headline feature next to
    schema evolution): early files were laid out by MONTH, the spec
    later evolved to DAY, and a correct reader must scan BOTH
    generations through the manifest's per-file spec — without
    rewriting the old files.  The layout is built once (fingerprint-
    cached); the read reconstructs the partition column per file from
    its path under the spec the manifest records, prunes by predicate
    under EACH spec (whole months vs single days), and aggregates.
    The oracle runs the same predicate on the raw table."""
    import glob
    import json
    import os
    import uuid

    import pyarrow.parquet as pq_
    from ray.data.aggregate import Sum

    out = _fingerprint_cache_dir(sf_dir, "orders", "specevo")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        os.makedirs(tmp, exist_ok=True)
        t = relational.ds_to_table(
            _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]))
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        month = day // 31                  # deterministic month-ish
        lo, hi = int(day.min()), int(day.max())
        mid = lo + (hi - lo) // 2          # spec evolves here
        manifest = []
        early = day <= mid
        for m in np.unique(month[early]):
            sel = early & (month == m)
            f = f"month={int(m)}.parquet"
            pq_.write_table(t.filter(pa.array(sel)),
                            os.path.join(tmp, f))
            manifest.append({"file": f, "spec": "month",
                             "value": int(m)})
        for d_ in np.unique(day[~early]):
            sel = (~early) & (day == d_)
            f = f"day={int(d_)}.parquet"
            pq_.write_table(t.filter(pa.array(sel)),
                            os.path.join(tmp, f))
            manifest.append({"file": f, "spec": "day",
                             "value": int(d_)})
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump({"files": manifest, "mid": mid}, fh)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    with open(os.path.join(out, "manifest.json")) as fh:
        man = json.load(fh)
    # predicate: day in [mid - 200, mid + 200] — spans BOTH specs
    mid = man["mid"]
    lo_p, hi_p = mid - 200, mid + 200
    keep = []
    for e in man["files"]:
        if e["spec"] == "day":
            ok = lo_p <= e["value"] <= hi_p
        else:                              # month spec: keep if the
            m = e["value"]                 # month RANGE overlaps
            ok = m * 31 <= hi_p and (m + 1) * 31 - 1 >= lo_p
        if ok:
            keep.append(os.path.join(out, e["file"]))
    q_partition_evolution_read._last_prune = (len(man["files"]),
                                              len(keep))
    part = rd.read_parquet(keep)

    def agg(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        m = (day >= lo_p) & (day <= hi_p)
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        return pa.table({"pn": pa.array([int(m.sum())]),
                         "pc_": pa.array([int(cents.sum())])})

    a = part.map_batches(agg, batch_format="pyarrow") \
        .aggregate(Sum("pn", alias_name="n"),
                   Sum("pc_", alias_name="c"))
    return pd.DataFrame([{"n": int(a["n"]),
                          "revenue_c": int(a["c"])}]).astype(np.int64)


SQL_SPEC_EVOLUTION = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(ROUND(o_totalprice * 100) AS HUGEINT) AS c
           FROM orders),
b AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid FROM d)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS revenue_c
FROM d, b WHERE day BETWEEN b.mid - 200 AND b.mid + 200
"""


def q_bucketed_layout_scan(sf_dir: str):
    """Hash-BUCKETED layout point lookup — the third physical layout
    next to value partitioning (hive) and range clustering (zone
    maps): orders are written into 16 files by a mirrorable hash of
    o_custkey, so an equality probe computes its bucket and opens
    EXACTLY ONE file, no statistics or sidecar needed.  The probe key
    is the same deterministic upper-half-min rule as the Bloom scan;
    the oracle runs the raw predicate."""
    import glob
    import os
    import uuid

    import pyarrow.parquet as pq_
    from ray.data.aggregate import Max, Min

    N_BUCKETS = 16

    def bucket_of(k: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (k.astype(np.uint64) + np.uint64(1)) \
                * np.uint64(11400714819323198485)
        return (h % np.uint64(N_BUCKETS)).astype(np.int64)

    out = _fingerprint_cache_dir(sf_dir, "orders", "hashbucket")
    if not os.path.isdir(out):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        os.makedirs(tmp, exist_ok=True)
        t = relational.ds_to_table(
            _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_totalprice"]))
        b = bucket_of(t["o_custkey"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        for bb in range(N_BUCKETS):
            pq_.write_table(t.filter(pa.array(b == bb)),
                            os.path.join(tmp, f"bucket={bb}.parquet"))
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    cust = _read(sf_dir, "orders", ["o_custkey"])
    lohi = cust.aggregate(Min("o_custkey", alias_name="lo"),
                          Max("o_custkey", alias_name="hi"))
    mid = (int(lohi["lo"]) + int(lohi["hi"])) // 2
    probe = int(cust.map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_custkey"], mid)),
        batch_format="pyarrow")
        .aggregate(Min("o_custkey", alias_name="k"))["k"])
    bb = int(bucket_of(np.array([probe], dtype=np.int64))[0])
    q_bucketed_layout_scan._last_scan = (N_BUCKETS, 1)
    part = rd.read_parquet([os.path.join(out,
                                         f"bucket={bb}.parquet")])
    hit = relational.ds_to_table(part.map_batches(
        lambda t: t.filter(pc.equal(t["o_custkey"], probe)),
        batch_format="pyarrow")).to_pandas()
    cents = np.round(hit["o_totalprice"].to_numpy(np.float64)
                     * 100.0).astype(np.int64)
    res = pd.DataFrame({"o_orderkey": hit["o_orderkey"]
                        .to_numpy(np.int64), "cents": cents}) \
        .sort_values("o_orderkey").reset_index(drop=True)
    return res.astype({"o_orderkey": np.int64, "cents": np.int64})


SQL_BUCKETED_SCAN = """
WITH b AS (SELECT (MIN(o_custkey) + MAX(o_custkey)) // 2 AS mid
           FROM orders),
p AS (SELECT MIN(o_custkey) AS k FROM orders, b
      WHERE o_custkey >= b.mid)
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
FROM orders, p WHERE o_custkey = p.k
ORDER BY o_orderkey
"""


def q_analyze_column_stats(sf_dir: str):
    """ANALYZE — the statistics-refresh maintenance op a cost-based
    planner feeds on: per column of orders, the EXACT distinct count
    (per-batch distinct → one hash groupby per column, values
    themselves shuffle — no hash-collision undercount) and the null
    count (one folded scan pass for all columns).  Column-bounded
    output; the twin is a UNION ALL of COUNT(DISTINCT)s."""
    from ray.data.aggregate import Sum

    cols = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate"]
    orders = _read(sf_dir, "orders", cols)

    def null_partial(t: pa.Table) -> pa.Table:
        return pa.table({f"n_{c}": pa.array([t[c].null_count])
                         for c in cols})

    nulls = orders.map_batches(null_partial, batch_format="pyarrow") \
        .aggregate(*[Sum(f"n_{c}", alias_name=f"n_{c}")
                     for c in cols])

    rows = []
    for c in cols:
        def distinct_partial(t: pa.Table, _c=c) -> pa.Table:
            # COUNT(DISTINCT) semantics: NULL is not a value
            return pa.table({_c: pc.drop_null(pc.unique(t[_c]))})

        nd = orders.map_batches(distinct_partial,
                                batch_format="pyarrow") \
            .groupby(c).count().count()
        rows.append({"column": c, "n_distinct": int(nd),
                     "n_nulls": int(nulls[f"n_{c}"])})
    return pd.DataFrame(rows).sort_values("column") \
        .reset_index(drop=True).astype({"n_distinct": np.int64,
                                        "n_nulls": np.int64})


SQL_ANALYZE = """
SELECT * FROM (
  SELECT 'o_orderkey' AS "column",
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
         CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT)
           AS n_nulls FROM orders
  UNION ALL
  SELECT 'o_custkey', COUNT(DISTINCT o_custkey),
         COUNT(*) FILTER (o_custkey IS NULL) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', COUNT(DISTINCT o_orderstatus),
         COUNT(*) FILTER (o_orderstatus IS NULL) FROM orders
  UNION ALL
  SELECT 'o_totalprice', COUNT(DISTINCT o_totalprice),
         COUNT(*) FILTER (o_totalprice IS NULL) FROM orders
  UNION ALL
  SELECT 'o_orderdate', COUNT(DISTINCT o_orderdate),
         COUNT(*) FILTER (o_orderdate IS NULL) FROM orders)
ORDER BY "column"
"""


def q_dp_noisy_counts(sf_dir: str):
    """Differentially-private count release (Laplace mechanism,
    ε = 1): per-nation customer counts plus Laplace(1/ε) noise drawn
    by INVERSE-CDF from the nation's own golden-ratio hash uniform —
    fully deterministic, so the release is reproducible and the twin
    reproduces it bit-for-bit (the repo's no-RNG-state convention,
    same as the weighted sampler).  True counts never leave in the
    output; the noise formula −b·sign(u−½)·ln(1−2|u−½|) is mirrored
    verbatim."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_nationkey"])

    def partial(t: pa.Table) -> pa.Table:
        u, n = np.unique(t["c_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"nk": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    agg = relational.ds_to_table(
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("nk").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas()
    nk = agg["nk"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    with np.errstate(over="ignore"):
        hv = (nk.astype(np.uint64) + np.uint64(1)) \
            * np.uint64(11400714819323198485)
    u = hv.astype(np.float64) / 18446744073709551616.0
    sign = np.where(u >= 0.5, 1.0, -1.0)
    noise = -1.0 * sign * np.log(1.0 - 2.0 * np.abs(u - 0.5))
    out = pd.DataFrame({"n_nationkey": nk,
                        "noisy_count": np.round(n + noise, 4)})
    return out.sort_values("n_nationkey").reset_index(drop=True) \
        .astype({"n_nationkey": np.int64})


SQL_DP_COUNTS = """
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n
           FROM customer GROUP BY 1),
h AS (SELECT nk, n,
             CAST(((CAST(nk + 1 AS HUGEINT) * 11400714819323198485)
                   % 18446744073709551616) AS DOUBLE)
               / 18446744073709551616.0 AS u
      FROM c)
SELECT nk AS n_nationkey,
       ROUND(n + (-1.0) * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                 * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS noisy_count
FROM h ORDER BY nk
"""


def q_dict_encode_priority(sf_dir: str):
    """Order-preserving global dictionary encoding (the narrow-int
    column trick every shuffle-heavy engine applies to low-cardinality
    strings): the distinct o_orderpriority values reduce to a bounded
    sorted dictionary, codes are assigned in VALUE order (so
    code order == value order and range predicates survive encoding),
    and one broadcast-searchsorted pass encodes the column.  Output
    proves the property: (code, value, n) with codes dense from 0 in
    value order — the twin's DENSE_RANK − 1."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        u, n = np.unique(t["o_orderpriority"].to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({"value": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    counts = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("value").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("value").reset_index(drop=True)
    dict_vals = counts["value"].to_numpy()
    dv_ref = ray.put(dict_vals)

    # the encode pass itself (what a real pipeline would fuse into its
    # shuffle write) — verified here by re-counting per CODE
    def encode(t: pa.Table) -> pa.Table:
        dv = ray.get(dv_ref)
        codes = np.searchsorted(dv, t["o_orderpriority"].to_numpy(
            zero_copy_only=False)).astype(np.int8)
        u, n = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(u.astype(np.int64)),
                         "pn": pa.array(n.astype(np.int64))})

    by_code = relational.ds_to_table(
        orders.map_batches(encode, batch_format="pyarrow")
        .groupby("code").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("code").reset_index(drop=True)
    out = pd.DataFrame({
        "code": by_code["code"].to_numpy(np.int64),
        "value": dict_vals[by_code["code"].to_numpy(np.int64)],
        "n": by_code["n"].to_numpy(np.int64)})
    return out.astype({"code": np.int64, "n": np.int64})


SQL_DICT_ENCODE = """
WITH c AS (SELECT o_orderpriority AS value, COUNT(*) AS n
           FROM orders GROUP BY 1)
SELECT CAST(DENSE_RANK() OVER (ORDER BY value) - 1 AS BIGINT)
         AS code,
       value, CAST(n AS BIGINT) AS n
FROM c ORDER BY code
"""


def q_rectangle_count_links(sf_dir: str):
    """Exact 4-cycle (rectangle) counting over the shared synthetic
    link graph — the motif one step up from triangles, the backbone of
    bipartite-ish community scores: #C4 = Σ_{u<v} C(cn(u,v), 2) / 2
    (each rectangle is counted once per diagonal pair).  Common-
    neighbor counts ride the same symmetric-adjacency cooccurrence
    kernel as link prediction; integer arithmetic end to end.  The
    wedge pass is Σdeg²-shaped like every exact cn computation —
    fine on this near-regular graph; a skewed deployment caps it with
    the kernel's per-key limit at the cost of exactness."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def sym_edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    und = relational.ds_to_table(
        docs.map_batches(sym_edges, batch_format="pyarrow")
    ).to_pandas().drop_duplicates()
    both = pd.concat([
        und.rename(columns={"a": "u", "b": "w"}),
        und.rename(columns={"b": "u", "a": "w"})])
    sym = rd.from_pandas(both)
    cn = relational.cooccurrence_pairs(sym, key_col="w", val_col="u")
    t = relational.ds_to_table(cn).to_pandas()
    c = t["n_keys"].to_numpy(np.int64)
    total = int((c * (c - 1) // 2).sum()) // 2
    return pd.DataFrame([{"n_rectangles": total}]) \
        .astype({"n_rectangles": np.int64})


SQL_RECTANGLES = """
WITH raw AS (
  SELECT doc_id AS src,
         (doc_id * 7919 + k * 104729)
           % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(k)),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst),
sym AS (SELECT a AS u, b AS w FROM e
        UNION ALL SELECT b, a FROM e),
cn AS (SELECT s1.u AS x, s2.u AS y, COUNT(*) AS c
       FROM sym s1 JOIN sym s2 ON s1.w = s2.w AND s1.u < s2.u
       GROUP BY 1, 2)
SELECT CAST(SUM(c * (c - 1) // 2) // 2 AS BIGINT) AS n_rectangles
FROM cn
"""


def q_mase_seasonal_naive(sf_dir: str):
    """Forecast-quality metric: MASE of the 7-day seasonal-naive
    forecast on the gap-filled daily revenue series — the scale-free
    standard for judging any forecaster (a MASE < 1 beats the naive
    baseline).  Absolute-difference sums stay exact ints on the
    days-bounded series; one mirrored float ratio at the end."""
    d = _daily_revenue_cents(sf_dir)
    days = d["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    series = np.zeros(hi - lo + 1, dtype=np.int64)
    series[days - lo] = d["rev"].to_numpy(np.int64)
    s7 = int(np.abs(series[7:] - series[:-7]).sum())
    s1 = int(np.abs(series[1:] - series[:-1]).sum())
    n7, n1 = len(series) - 7, len(series) - 1
    mase = (float(s7) / n7) / (float(s1) / n1)
    return pd.DataFrame([{
        "n_days": len(series), "sum_abs7": s7, "sum_abs1": s1,
        "mase": np.round(mase, 6)}]) \
        .astype({"n_days": np.int64, "sum_abs7": np.int64,
                 "sum_abs1": np.int64})


SQL_MASE = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
f AS (SELECT cal.day, COALESCE(d.rev, 0) AS rev
      FROM cal LEFT JOIN d USING (day)),
l AS (SELECT rev,
             LAG(rev, 7) OVER (ORDER BY day) AS r7,
             LAG(rev, 1) OVER (ORDER BY day) AS r1
      FROM f),
s AS (SELECT CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_days,
             CAST(SUM(ABS(rev - r7)) FILTER (r7 IS NOT NULL)
                  AS BIGINT) AS sum_abs7,
             CAST(SUM(ABS(rev - r1)) FILTER (r1 IS NOT NULL)
                  AS BIGINT) AS sum_abs1
      FROM l)
SELECT n_days, sum_abs7, sum_abs1,
       ROUND((CAST(sum_abs7 AS DOUBLE) / (n_days - 7))
             / (CAST(sum_abs1 AS DOUBLE) / (n_days - 1)), 6) AS mase
FROM s
"""


def q_occupied_cell_perimeter(sf_dir: str):
    """Raster morphology: per-nation boundary length of the OCCUPIED
    cell region (10-unit cells inside each nation's 200×200 rect) —
    the erosion-boundary measure behind coverage and coastline
    statistics.  Perimeter = 4·cells − 2·within-nation 4-adjacent
    pairs, all from one distributed (nation, cell) count reduce
    (grid-bounded: ≤ 25 × 400 rows); set arithmetic on the driver."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def cells(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = (k * 7919) % 1000
        y = (k * 104729) % 1000
        nat = (x // 200) + 5 * (y // 200)
        cx, cy = x // 10, y // 10
        g = pd.DataFrame({"nat": nat, "cell": cx * 100 + cy,
                          "pn": 1}) \
            .groupby(["nat", "cell"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    occ = relational.ds_to_table(
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby(["nat", "cell"]).aggregate(Sum("pn",
                                                alias_name="n"))
    ).to_pandas()
    rows = []
    for nat, g in occ.groupby("nat"):
        cs = set(g["cell"].astype(int))
        adj = 0
        for c in cs:
            cx, cy = c // 100, c % 100
            # count each pair once (right + up neighbors only)
            if (cx + 1) * 100 + cy in cs \
                    and (cx + 1) // 20 == cx // 20:
                adj += 1
            if cx * 100 + cy + 1 in cs and (cy + 1) // 20 == cy // 20:
                adj += 1
        rows.append({"n_nationkey": int(nat), "n_cells": len(cs),
                     "perimeter": 4 * len(cs) - 2 * adj})
    return pd.DataFrame(rows).sort_values("n_nationkey") \
        .reset_index(drop=True).astype(np.int64)


SQL_CELL_PERIMETER = """
WITH p AS (SELECT (c_custkey * 7919) % 1000 AS x,
                  (c_custkey * 104729) % 1000 AS y
           FROM customer),
o AS (SELECT DISTINCT (x // 200) + 5 * (y // 200) AS nat,
                      x // 10 AS cx, y // 10 AS cy
      FROM p),
n AS (SELECT nat, CAST(COUNT(*) AS BIGINT) AS n_cells FROM o
      GROUP BY 1),
a AS (SELECT o.nat, CAST(COUNT(*) AS BIGINT) AS n_adj
      FROM o JOIN o q
        ON o.nat = q.nat
       AND ((q.cx = o.cx + 1 AND q.cy = o.cy
             AND q.cx // 20 = o.cx // 20)
            OR (q.cx = o.cx AND q.cy = o.cy + 1
                AND q.cy // 20 = o.cy // 20))
      GROUP BY 1)
SELECT n.nat AS n_nationkey, n.n_cells,
       4 * n.n_cells - 2 * COALESCE(a.n_adj, 0) AS perimeter
FROM n LEFT JOIN a ON a.nat = n.nat
ORDER BY n_nationkey
"""


def q_median_ci_orderstats(sf_dir: str):
    """Distribution-free 95 % confidence interval for the MEDIAN via
    order statistics (the nonparametric textbook bound — no normality
    assumed anywhere): ranks come from the mirrored
    (n ± 1.96·√n)/2 formula, and the k-th order statistics are
    selected WITHOUT a global sort from the distributed value
    distribution (sorted distinct cents + cumulative counts, the same
    shape every exact-quantile op here uses).  The twin selects by
    ORDER BY … OFFSET."""
    import math
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        u, n = np.unique(cents, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    dist = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("pn", alias_name="n"))
    ).to_pandas().sort_values("v").reset_index(drop=True)
    vals = dist["v"].to_numpy(np.int64)
    cum = np.cumsum(dist["n"].to_numpy(np.int64))
    n = int(cum[-1])

    lo_k = max(1, int(math.floor((n - 1.96 * math.sqrt(n)) / 2.0)))
    hi_k = min(n, int(math.ceil((n + 2 + 1.96 * math.sqrt(n))
                                / 2.0)))
    med_k = (n + 1) // 2

    def kth(k: int) -> int:                 # 1-indexed order stat
        return int(vals[np.searchsorted(cum, k)])

    return pd.DataFrame([{
        "n": n, "lo_cents": kth(lo_k), "median_cents": kth(med_k),
        "hi_cents": kth(hi_k)}]).astype(np.int64)


SQL_MEDIAN_CI = """
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
           FROM orders),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
k AS (SELECT n,
             GREATEST(1, CAST(FLOOR((n - 1.96 * SQRT(n)) / 2.0)
                              AS BIGINT)) AS lo_k,
             LEAST(n, CAST(CEIL((n + 2 + 1.96 * SQRT(n)) / 2.0)
                           AS BIGINT)) AS hi_k,
             (n + 1) // 2 AS med_k
      FROM n),
ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM c)
SELECT k.n,
       MAX(CASE WHEN rn = k.lo_k THEN v END) AS lo_cents,
       MAX(CASE WHEN rn = k.med_k THEN v END) AS median_cents,
       MAX(CASE WHEN rn = k.hi_k THEN v END) AS hi_cents
FROM ranked, k GROUP BY k.n
"""


def q_attribution_rules_compare(sf_dir: str):
    """Multi-rule marketing attribution in ONE pass: for every user
    with a purchase, the touches strictly before their FIRST purchase
    (composite (ts, event_id) order) earn credit under first-touch,
    last-touch and linear rules side by side — the comparison table an
    attribution migration needs.  Linear credit is integer
    MICRO-credits (round(1e6·cnt/k)) so cross-user sums stay exact
    under any partitioning; one user-bucket shuffle, types-bounded
    output."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id",
                                  "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts", "event_id"])
        pur = df[df["event_type"] == "purchase"] \
            .groupby("user_id").head(1) \
            .set_index("user_id")[["ts", "event_id"]]
        df = df.join(pur, on="user_id", rsuffix="_p")
        m = df["ts_p"].notna() \
            & ((df["ts"] < df["ts_p"])
               | ((df["ts"] == df["ts_p"])
                  & (df["event_id"] < df["event_id_p"])))
        t = df[m]
        if t.empty:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=str),
                "pf": pd.Series([], dtype=np.int64),
                "pl": pd.Series([], dtype=np.int64),
                "pm": pd.Series([], dtype=np.int64)})
        first = t.groupby("user_id").head(1)
        last = t.groupby("user_id").tail(1)
        k = t.groupby("user_id").size().rename("k")
        per_ut = t.groupby(["user_id", "event_type"]).size() \
            .rename("cnt").reset_index().join(k, on="user_id")
        per_ut["pm"] = np.round(
            1_000_000.0 * per_ut["cnt"].to_numpy(np.float64)
            / per_ut["k"].to_numpy(np.float64)).astype(np.int64)
        out = pd.DataFrame({
            "event_type": pd.concat([first["event_type"],
                                     last["event_type"],
                                     per_ut["event_type"]]),
            "pf": np.concatenate([np.ones(len(first), np.int64),
                                  np.zeros(len(last), np.int64),
                                  np.zeros(len(per_ut), np.int64)]),
            "pl": np.concatenate([np.zeros(len(first), np.int64),
                                  np.ones(len(last), np.int64),
                                  np.zeros(len(per_ut), np.int64)]),
            "pm": np.concatenate([np.zeros(len(first), np.int64),
                                  np.zeros(len(last), np.int64),
                                  per_ut["pm"].to_numpy(np.int64)])})
        return out.groupby("event_type", sort=False).sum() \
            .reset_index()

    agg = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
        .groupby("event_type").aggregate(
            Sum("pf", alias_name="first_touch"),
            Sum("pl", alias_name="last_touch"),
            Sum("pm", alias_name="linear_micro"))
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    return agg.astype({"first_touch": np.int64,
                       "last_touch": np.int64,
                       "linear_micro": np.int64})


SQL_ATTRIBUTION = """
WITH pp AS (SELECT user_id, ts AS tp, event_id AS ip FROM (
         SELECT user_id, ts, event_id,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS r
         FROM events WHERE event_type = 'purchase') WHERE r = 1),
t AS (SELECT e.user_id, e.event_type, e.ts, e.event_id
      FROM events e JOIN pp ON pp.user_id = e.user_id
      WHERE e.ts < pp.tp
         OR (e.ts = pp.tp AND e.event_id < pp.ip)),
r AS (SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC)
               AS rl,
             COUNT(*) OVER (PARTITION BY user_id) AS k
      FROM t),
lin AS (SELECT user_id, event_type, COUNT(*) AS cnt, MAX(k) AS k
        FROM r GROUP BY 1, 2)
SELECT event_type,
       CAST((SELECT COUNT(*) FROM r x
             WHERE x.event_type = lin.event_type AND x.rf = 1)
            AS BIGINT) AS first_touch,
       CAST((SELECT COUNT(*) FROM r x
             WHERE x.event_type = lin.event_type AND x.rl = 1)
            AS BIGINT) AS last_touch,
       CAST(SUM(CAST(ROUND(1000000.0 * cnt / k) AS BIGINT))
            AS BIGINT) AS linear_micro
FROM lin GROUP BY event_type ORDER BY event_type
"""


def q_pip_donut_nations(sf_dir: str):
    """PIP join against polygons WITH HOLES: each nation becomes a
    donut (its 200×200 rect minus a centered 100×100 hole), and the
    join must keep rect points while REJECTING hole points — the
    interior-ring path of the ray-casting kernel exercised through the
    real broadcast PIP join, not a unit test.  Counts per nation; the
    oracle applies the same outer-minus-open-hole arithmetic (the
    0.5-offset points never sit on a ring, so boundary conventions
    cannot blur the hash)."""
    from ray.data.aggregate import Sum
    from ..geom import wkb as wkbm

    polys = []
    for nkey in range(25):
        col, row = nkey % 5, nkey // 5
        x0, y0 = col * 200.0, row * 200.0
        outer = np.array([[x0, y0], [x0 + 200, y0],
                          [x0 + 200, y0 + 200], [x0, y0 + 200],
                          [x0, y0]])
        hole = np.array([[x0 + 50, y0 + 50], [x0 + 150, y0 + 50],
                         [x0 + 150, y0 + 150], [x0 + 50, y0 + 150],
                         [x0 + 50, y0 + 50]])
        polys.append(wkbm.polygon([outer, hole]))
    donuts = pa.table({"n_nationkey": pa.array(list(range(25)),
                                               type=pa.int32()),
                       "geometry": pa.array(polys, type=pa.binary())})

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"),
        batch_format="pyarrow")
    hits = joins.pip_join(pts, donuts, id_col="n_nationkey",
                          x_col="px", y_col="py", how="inner")

    def partial(t: pa.Table) -> pa.Table:
        u, n = np.unique(t["n_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"n_nationkey": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    out = relational.ds_to_table(
        hits.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey").aggregate(Sum("pn",
                                              alias_name="n_points"))
    ).to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    return out.astype({"n_nationkey": np.int64,
                       "n_points": np.int64})


SQL_PIP_DONUT = """
WITH p AS (SELECT (c_custkey * 7919) % 1000 + 0.5 AS px,
                  (c_custkey * 104729) % 1000 + 0.5 AS py
           FROM customer),
n AS (SELECT CAST(nk AS BIGINT) AS n_nationkey,
             (nk % 5) * 200.0 AS x0, (nk // 5) * 200.0 AS y0
      FROM (SELECT unnest(generate_series(0, 24)) AS nk))
SELECT n.n_nationkey, CAST(COUNT(*) AS BIGINT) AS n_points
FROM p, n
WHERE px >= n.x0 AND px <= n.x0 + 200
  AND py >= n.y0 AND py <= n.y0 + 200
  AND NOT (px > n.x0 + 50 AND px < n.x0 + 150
           AND py > n.y0 + 50 AND py < n.y0 + 150)
GROUP BY 1 ORDER BY 1
"""


def q_vocab_growth_checkpoints(sf_dir: str):
    """Vocabulary growth curve (the Heaps'-law measurement an LM data
    recipe reads before sizing a tokenizer): distinct-word and total-
    token counts over nested corpus prefixes at 20/40/60/80/100 % of
    the doc-id range.  Each checkpoint is one projected filtered pass:
    token counts fold per batch; vocabulary counts shuffle distinct
    WORDS (vocabulary-bounded), never documents."""
    from ray.data.aggregate import Max, Min, Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    lohi = docs.aggregate(Min("doc_id", alias_name="lo"),
                          Max("doc_id", alias_name="hi"))
    lo, hi = int(lohi["lo"]), int(lohi["hi"])
    span = hi - lo + 1
    rows = []
    for k in range(1, 6):
        cut = lo + -(-k * span // 5)      # ceil — mirrored in SQL
        sub = docs.filter(expr=f"doc_id < {cut}")

        def tok_partial(t: pa.Table) -> pa.Table:
            parts = pc.split_pattern(t["text"], pattern=" ")
            flat = pc.list_flatten(parts)
            return pa.table({"pn": pa.array([len(flat)])})

        n_tok = int(sub.map_batches(tok_partial,
                                    batch_format="pyarrow")
                    .aggregate(Sum("pn", alias_name="n"))["n"])

        def vocab_partial(t: pa.Table) -> pa.Table:
            parts = pc.split_pattern(t["text"], pattern=" ")
            return pa.table({"w": pc.unique(pc.list_flatten(parts))})

        n_vocab = sub.map_batches(vocab_partial,
                                  batch_format="pyarrow") \
            .groupby("w").count().count()
        rows.append({"checkpoint": k, "n_tokens": n_tok,
                     "n_vocab": int(n_vocab)})
    return pd.DataFrame(rows).astype(np.int64)


SQL_VOCAB_GROWTH = """
WITH b AS (SELECT MIN(doc_id) AS lo,
                  MAX(doc_id) - MIN(doc_id) + 1 AS span
           FROM documents),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents)
SELECT k AS checkpoint,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM w, b
        WHERE doc_id < b.lo + (k * b.span + 4) // 5) AS n_tokens,
       (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) FROM w, b
        WHERE doc_id < b.lo + (k * b.span + 4) // 5) AS n_vocab
FROM (SELECT unnest(generate_series(1, 5)) AS k)
ORDER BY checkpoint
"""


def q_anti_join_null_semantics(sf_dir: str):
    """The NOT IN / NOT EXISTS null trap as an executable contract:
    against a key list that CONTAINS A NULL (negative-balance
    customers ∪ {NULL}), NOT EXISTS returns the true anti-join while
    NOT IN returns ZERO rows (three-valued logic: x <> NULL is
    unknown, so no row ever passes).  The engine implements both
    semantics explicitly — the broadcast anti-set for NOT EXISTS, the
    SQL null rule for NOT IN — and the twin executes the literal SQL,
    so an engine that silently treats them alike breaks the hash."""
    from ray.data.aggregate import Sum

    neg = relational.ds_to_table(
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
        .filter(expr="c_acctbal < 0")
        .map_batches(lambda t: t.select(["c_custkey"]),
                     batch_format="pyarrow"))
    neg_keys = np.sort(neg["c_custkey"].to_numpy(
        zero_copy_only=False).astype(np.int64))
    keys_ref = ray.put(neg_keys)
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def count_not_exists(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(ks, ck)
        hit = pos < len(ks)
        hit[hit] = ks[pos[hit]] == ck[hit]
        return pa.table({"pn": pa.array([int((~hit).sum())])})

    n_ne = int(orders.map_batches(count_not_exists,
                                  batch_format="pyarrow")
               .aggregate(Sum("pn", alias_name="n"))["n"])
    # NOT IN against a list containing NULL: three-valued logic makes
    # every membership test UNKNOWN-or-TRUE, never TRUE for the NOT —
    # zero rows by rule, no scan needed (the list provably has a NULL)
    n_ni = 0
    return pd.DataFrame([
        {"semantics": "not_exists", "n_rows": n_ne},
        {"semantics": "not_in_with_null", "n_rows": n_ni}]) \
        .astype({"n_rows": np.int64})


SQL_ANTI_NULL = """
WITH keys AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0
              UNION ALL SELECT NULL)
SELECT 'not_exists' AS semantics,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM keys k
                  WHERE k.c_custkey = o.o_custkey)
UNION ALL
SELECT 'not_in_with_null', CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM keys)
ORDER BY semantics
"""


def q_morans_i_nation_revenue(sf_dir: str):
    """Moran's I spatial autocorrelation of nation revenue on the 5×5
    nation grid (rook adjacency) — THE do-rich-nations-border-rich-
    nations statistic.  Revenue reduces through one bucketed
    customer⋈orders join with per-bucket cents pre-aggregation; the
    25-node finish uses the scale-cancelling identity
    I = (n/S₀)·Σw(nxᵢ−S)(nxⱼ−S) / Σ(nxᵢ−S)² with arbitrary-precision
    INTEGER numerator and denominator — no float enters until the one
    mirrored division, so SQL's unordered SUM cannot drift the hash."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: pa.table({
            "o_custkey": t["c_custkey"],
            "nk": t["c_nationkey"].cast(pa.int64())}),
            batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def combine(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"nk": t["nk"].to_numpy(
            zero_copy_only=False), "pc_": cents}) \
            .groupby("nk", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = relational.ds_to_table(
        relational.bucketed_hash_join(orders, cust, on="o_custkey",
                                      combine=combine)
        .groupby("nk").aggregate(Sum("pc_", alias_name="cents"))
    ).to_pandas()
    x = {int(r.nk): int(r.cents) for r in agg.itertuples()}
    xs = [x.get(nk, 0) for nk in range(25)]
    n = 25
    S = sum(xs)
    dev = [n * v - S for v in xs]          # exact ints, scale cancels
    edges = []
    for nk in range(25):
        c, r = nk % 5, nk // 5
        if c + 1 < 5:
            edges.append((nk, nk + 1))
        if r + 1 < 5:
            edges.append((nk, nk + 5))
    s0 = 2 * len(edges)                    # symmetric weight sum
    num = sum(dev[a] * dev[b] for a, b in edges) * 2
    den = sum(d * d for d in dev)
    morans_i = float(n * num) / float(s0 * den)
    return pd.DataFrame([{"n_nations": n, "s0": s0,
                          "morans_i": np.round(morans_i, 6)}]) \
        .astype({"n_nations": np.int64, "s0": np.int64})


SQL_MORANS_I = """
WITH rev AS (SELECT c_nationkey AS nk,
                    SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                      AS cents
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY 1),
grid AS (SELECT nk, COALESCE(rev.cents, 0) AS x
         FROM (SELECT unnest(generate_series(0, 24)) AS nk)
         LEFT JOIN rev USING (nk)),
s AS (SELECT SUM(x) AS sx FROM grid),
d AS (SELECT nk, 25 * x - s.sx AS dev FROM grid, s),
e AS (SELECT a.dev AS da, b.dev AS db
      FROM d a JOIN d b
        ON (b.nk = a.nk + 1 AND a.nk % 5 < 4)
        OR (b.nk = a.nk + 5 AND a.nk // 5 < 4)),
agg AS (SELECT (SELECT 2 * COUNT(*) FROM e) AS s0,
               (SELECT 2 * SUM(da * db) FROM e) AS num,
               (SELECT SUM(dev * dev) FROM d) AS den)
SELECT CAST(25 AS BIGINT) AS n_nations, CAST(s0 AS BIGINT) AS s0,
       ROUND(CAST(25 * num AS DOUBLE) / CAST(s0 * den AS DOUBLE), 6)
         AS morans_i
FROM agg
"""


def q_cohens_kappa_langid(sf_dir: str):
    """Chance-corrected classifier agreement: Cohen's κ of the LangId
    predictions against the true labels, computed from the SAME
    memoized confusion matrix the precision/recall query reads —
    κ = (p₀ − pₑ)/(1 − pₑ) with p₀ the trace share and pₑ the
    marginal-product share, all exact ints until two mirrored float
    divisions.  The twin regenerates the classifier from the shared
    profile dict (the no-drift contract)."""
    conf = q_langid_confusion(sf_dir)
    N = int(conf["n"].sum())
    po_num = int(conf.loc[conf["lang"] == conf["lang_pred"],
                          "n"].sum())
    row = conf.groupby("lang")["n"].sum()
    col = conf.groupby("lang_pred")["n"].sum()
    labels = sorted(set(row.index) | set(col.index))
    pe_num = sum(int(row.get(l, 0)) * int(col.get(l, 0))
                 for l in labels)
    po = float(po_num) / N
    pe = float(pe_num) / (N * N)
    kappa = (po - pe) / (1.0 - pe)
    return pd.DataFrame([{
        "n_docs": N, "po": np.round(po, 6), "pe": np.round(pe, 6),
        "kappa": np.round(kappa, 6)}]).astype({"n_docs": np.int64})


def _sql_cohens_kappa() -> str:
    return f"""
WITH {_langid_pred_sql_body().lstrip()},
conf AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
         FROM pred GROUP BY 1, 2),
t AS (SELECT SUM(n) AS nn,
             SUM(CASE WHEN lang = lang_pred THEN n ELSE 0 END) AS tr
      FROM conf),
m AS (SELECT COALESCE(r.lab, c.lab) AS lab,
             COALESCE(r.rn, 0) AS rn, COALESCE(c.cn, 0) AS cn
      FROM (SELECT lang AS lab, SUM(n) AS rn FROM conf GROUP BY 1) r
      FULL OUTER JOIN
           (SELECT lang_pred AS lab, SUM(n) AS cn FROM conf
            GROUP BY 1) c
        ON r.lab = c.lab),
pe AS (SELECT SUM(rn * cn) AS pen FROM m)
SELECT CAST(t.nn AS BIGINT) AS n_docs,
       ROUND(CAST(t.tr AS DOUBLE) / t.nn, 6) AS po,
       ROUND(CAST(pe.pen AS DOUBLE) / (t.nn * t.nn), 6) AS pe,
       ROUND((CAST(t.tr AS DOUBLE) / t.nn
              - CAST(pe.pen AS DOUBLE) / (t.nn * t.nn))
             / (1.0 - CAST(pe.pen AS DOUBLE) / (t.nn * t.nn)), 6)
         AS kappa
FROM t, pe
"""


def q_tsp_nn_tour(sf_dir: str):
    """Nearest-neighbor TSP tour per nation — the routing baseline a
    delivery planner starts from: from each nation's min-key point,
    repeatedly hop to the nearest unvisited point (ties to the smaller
    key), then close the loop.  Per-nation work is bounded by the
    nation's point count (O(k²) vectorized hops); nations run in
    parallel via one grid-bucket shuffle.  An iterative heuristic has
    no SQL twin — correctness is pinned by the unit-square golden and
    the tour ≥ 2·diameter lower bound."""
    ns = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: _points_batch(b, "c_custkey"),
        batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        x = t["px"].to_numpy(zero_copy_only=False)
        y = t["py"].to_numpy(zero_copy_only=False)
        nat = (x // 200).astype(np.int64) \
            + 5 * (y // 200).astype(np.int64)
        return pa.table({"k": t["c_custkey"], "x": t["px"],
                         "y": t["py"], "nat": pa.array(nat)})

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("k")
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        n = len(g)
        if n == 1:
            return pd.DataFrame([{"n_nationkey": int(g["nat"].iloc[0]),
                                  "n_points": 1, "tour_len": 0.0}])
        visited = np.zeros(n, dtype=bool)
        cur = 0                              # min-key start
        visited[0] = True
        total = 0.0
        for _ in range(n - 1):
            d2 = (x - x[cur]) ** 2 + (y - y[cur]) ** 2
            d2[visited] = np.inf
            nxt = int(np.argmin(d2))         # ties → smallest index
            total += float(np.sqrt(d2[nxt]))
            visited[nxt] = True
            cur = nxt
        total += float(np.hypot(x[cur] - x[0], y[cur] - y[0]))
        return pd.DataFrame([{"n_nationkey": int(g["nat"].iloc[0]),
                              "n_points": n,
                              "tour_len": round(total, 4)}])

    out = relational.ds_to_table(
        ns.map_batches(tag, batch_format="pyarrow")
        .groupby("nat").map_groups(per_nation, batch_format="pandas")
    ).to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    return out.astype({"n_nationkey": np.int64,
                       "n_points": np.int64})


def q_users_all_event_types(sf_dir: str):
    """Relational division — the classic "supplier who stocks EVERY
    part" shape (Codd's ÷, the one join SQL has no keyword for):
    users whose event history covers EVERY distinct event type.
    Per-batch pair dedup shrinks the stream, one (user, type) groupby
    finishes the exact dedup, then a second users×types-bounded
    groupby counts coverage per user; the divisor (total distinct
    types) is a types-bounded reduce — no driver-side row loop, and
    the only corpus-wide shuffle carries unique pairs."""
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def pair_dedup(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_numpy(
                zero_copy_only=False)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ev.map_batches(pair_dedup, batch_format="pyarrow") \
        .groupby(["user_id", "event_type"]) \
        .aggregate(Count(alias_name="_c"))
    n_types = len(relational.ds_to_table(
        ev.map_batches(
            lambda t: pa.table({"event_type":
                                pc.unique(t["event_type"])}),
            batch_format="pyarrow")
        .groupby("event_type").aggregate(Count(alias_name="_c"))))

    def per_user_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"user_id": t["user_id"].to_numpy(
            zero_copy_only=False), "nt": 1}) \
            .groupby("user_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cover = relational.ds_to_table(
        pairs.map_batches(per_user_partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Sum("nt", alias_name="n"))
    ).to_pandas()
    out = cover.loc[cover["n"] == n_types, ["user_id"]] \
        .sort_values("user_id").reset_index(drop=True)
    return out.astype({"user_id": np.int64})


SQL_DIVISION = """
SELECT user_id
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY user_id
HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM events)
ORDER BY user_id
"""


def q_cluster_merge_join(sf_dir: str):
    """Shuffle-free sort-merge join over CO-CLUSTERED layouts: both
    sides are range-partitioned on the join key with IDENTICAL
    boundaries (`write_clustered(boundaries=)` — the layout investment
    a lakehouse makes once), so the join itself runs as independent
    per-range merge tasks, each reading exactly two files and probing
    with one sorted searchsorted pass — NO hash shuffle of either
    table at query time.  At 100 TB this converts the per-query
    all-to-all exchange into a one-time clustering write amortized
    over every custkey join; the layouts are content-fingerprint
    cached and resumable (manifest-committed ranges skip on rerun)."""
    import os

    from ray.data.aggregate import Max, Min, Sum

    from ..runtime import checkpoint as ckpt

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    lohi = cust.aggregate(Min("c_custkey", alias_name="lo"),
                          Max("c_custkey", alias_name="hi"))
    lo, hi = int(lohi["lo"]), int(lohi["hi"])
    nr = 8
    span = max(1, (hi - lo + nr) // nr)
    bnds = [lo + i * span for i in range(1, nr)]

    dir_c = _fingerprint_cache_dir(sf_dir, "customer", "cmjc")
    dir_o = _fingerprint_cache_dir(sf_dir, "orders", "cmjo")
    # resumable layout build: committed ranges are skipped on rerun,
    # so a warm cache costs two manifest reads and zero tasks
    ckpt.write_clustered(cust, dir_c, "c_custkey", boundaries=bnds)
    ckpt.write_clustered(orders, dir_o, "o_custkey", boundaries=bnds)
    keys = sorted(ckpt.committed_keys(dir_c)
                  & ckpt.committed_keys(dir_o))

    def merge_range(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq
        frames = []
        for key in t["key"].to_pylist():
            tc = _pq.read_table(
                os.path.join(dir_c, f"part={key}", "data.parquet"))
            to = _pq.read_table(
                os.path.join(dir_o, f"part={key}", "data.parquet"))
            ck = tc["c_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            seg = tc["c_mktsegment"].to_numpy(zero_copy_only=False)
            ok = to["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cents = np.round(to["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            pos = np.searchsorted(ck, ok)        # both files sorted
            hit = pos < len(ck)
            hit[hit] = ck[pos[hit]] == ok[hit]
            frames.append(pd.DataFrame({
                "mktsegment": seg[pos[hit]], "cents": cents[hit],
                "pn": 1}).groupby("mktsegment", sort=False)
                .sum().reset_index())
        if not frames:
            return pa.table({"mktsegment": pa.array([], pa.string()),
                             "cents": pa.array([], pa.int64()),
                             "pn": pa.array([], pa.int64())})
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = relational.ds_to_table(
        rd.from_items([{"key": k} for k in keys],
                      override_num_blocks=max(1, len(keys)))
        .map_batches(merge_range, batch_format="pyarrow")
        .groupby("mktsegment").aggregate(
            Sum("cents", alias_name="cents"),
            Sum("pn", alias_name="n_orders"))
    ).to_pandas().sort_values("mktsegment").reset_index(drop=True)
    agg["total_revenue"] = (agg["cents"] / 100.0).round(2)
    return agg[["mktsegment", "n_orders", "total_revenue"]] \
        .astype({"n_orders": np.int64})


SQL_CLUSTER_MERGE = """
SELECT c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def q_mcc_langid(sf_dir: str):
    """Multiclass Matthews correlation (the Rₖ statistic) of the
    LangId classifier — the single-number eval that stays honest under
    class imbalance where accuracy and even κ inflate.  Reads the SAME
    memoized confusion matrix as the κ/precision-recall queries;
    trace, total and the marginal power sums stay exact ints until the
    one mirrored float expression num / (√(s²−Σp²)·√(s²−Σt²))."""
    import math

    conf = q_langid_confusion(sf_dir)
    s = int(conf["n"].sum())
    c = int(conf.loc[conf["lang"] == conf["lang_pred"], "n"].sum())
    row = conf.groupby("lang")["n"].sum()          # true marginals t_k
    col = conf.groupby("lang_pred")["n"].sum()     # pred marginals p_k
    labels = sorted(set(row.index) | set(col.index))
    stp = sum(int(row.get(l, 0)) * int(col.get(l, 0)) for l in labels)
    stt = sum(int(v) * int(v) for v in row)
    spp = sum(int(v) * int(v) for v in col)
    num = c * s - stp
    denx = s * s - spp
    deny = s * s - stt
    if denx == 0 or deny == 0:                     # single-class edge
        mcc = float("nan")
    else:
        mcc = float(num) / (math.sqrt(float(denx))
                            * math.sqrt(float(deny)))
    return pd.DataFrame([{"n_docs": s, "mcc": np.round(mcc, 6)}]) \
        .astype({"n_docs": np.int64})


def _sql_mcc_langid() -> str:
    return f"""
WITH {_langid_pred_sql_body().lstrip()},
conf AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
         FROM pred GROUP BY 1, 2),
t AS (SELECT SUM(n) AS s,
             SUM(CASE WHEN lang = lang_pred THEN n ELSE 0 END) AS c
      FROM conf),
rm AS (SELECT SUM(tt * tt) AS stt
       FROM (SELECT SUM(n) AS tt FROM conf GROUP BY lang)),
pm AS (SELECT SUM(pp * pp) AS spp
       FROM (SELECT SUM(n) AS pp FROM conf GROUP BY lang_pred)),
tp AS (SELECT SUM(a.rn * b.cn) AS stp
       FROM (SELECT lang AS lab, SUM(n) AS rn FROM conf
             GROUP BY 1) a
       JOIN (SELECT lang_pred AS lab, SUM(n) AS cn FROM conf
             GROUP BY 1) b ON a.lab = b.lab)
SELECT CAST(t.s AS BIGINT) AS n_docs,
       CASE WHEN (t.s * t.s - pm.spp) = 0
              OR (t.s * t.s - rm.stt) = 0 THEN NULL
            ELSE ROUND(CAST(t.c * t.s - tp.stp AS DOUBLE)
                       / (sqrt(CAST(t.s * t.s - pm.spp AS DOUBLE))
                          * sqrt(CAST(t.s * t.s - rm.stt AS DOUBLE))),
                       6)
       END AS mcc
FROM t, rm, pm, tp
"""


def q_bom_explosion(sf_dir: str):
    """Bill-of-materials explosion — the manufacturing transitive
    closure: every part's total unit requirement at its root assembly
    is the PRODUCT of the child-edge quantities along its ancestor
    chain.  The hierarchy is a deterministic formula over p_partkey
    (parent = k // 8, edge qty = k % 3 + 1 for k ≥ 8; parts < 8 are
    roots), so the chase needs NO edge shuffle at all: each batch
    pointer-walks its own keys vectorized in O(depth) = O(log₈ N)
    numpy passes, then a roots-bounded groupby folds the partials —
    the whole explosion is one streaming scan regardless of corpus
    size.  The twin runs the literal WITH RECURSIVE climb."""
    from ray.data.aggregate import Max, Sum

    parts = _read(sf_dir, "part", ["p_partkey"])

    def chase(t: pa.Table) -> pa.Table:
        node = t["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).copy()
        qty = np.ones(len(node), dtype=np.int64)
        while True:
            m = node >= 8
            if not m.any():
                break
            qty[m] *= node[m] % 3 + 1
            node[m] //= 8
        g = pd.DataFrame({"root": node, "q": qty, "pn": 1}) \
            .groupby("root", sort=False) \
            .agg(n_parts=("pn", "sum"), total_units=("q", "sum"),
                 max_units=("q", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        parts.map_batches(chase, batch_format="pyarrow")
        .groupby("root").aggregate(
            Sum("n_parts", alias_name="n_parts"),
            Sum("total_units", alias_name="total_units"),
            Max("max_units", alias_name="max_units"))
    ).to_pandas().sort_values("root").reset_index(drop=True)
    return out.astype({"root": np.int64, "n_parts": np.int64,
                       "total_units": np.int64,
                       "max_units": np.int64})


SQL_BOM = """
WITH RECURSIVE climb AS (
  SELECT p_partkey AS node, CAST(1 AS HUGEINT) AS qty FROM part
  UNION ALL
  SELECT node // 8, qty * (node % 3 + 1) FROM climb WHERE node >= 8
)
SELECT node AS root, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(qty) AS BIGINT) AS total_units,
       CAST(MAX(qty) AS BIGINT) AS max_units
FROM climb WHERE node < 8 GROUP BY 1 ORDER BY 1
"""


def q_stump_candidates_discount(sf_dir: str):
    """Decision-stump split evaluation — the inner loop of every tree
    learner: for each candidate threshold on l_discount (cents), the
    exact left/right class-count power sums and the weighted Gini
    impurity of the split on l_returnflag.  The distributed part is a
    (value × class)-bounded count reduce (11 × 3 here — the feature's
    distinct values, NOT the row count); the cumulative scan and Gini
    finish run on that tiny table with Python-int exactness, one
    mirrored float division chain per row.  The argmin (the trained
    stump) is pytest-pinned against a brute-force split evaluator;
    the hash-checked surface is the exact candidate table, so float
    near-ties can never flip the comparison."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_discount", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"d": d, "f": t["l_returnflag"].to_numpy(
            zero_copy_only=False), "n": 1}) \
            .groupby(["d", "f"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "f"]).aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    grid = cnt.pivot_table(index="d", columns="f", values="n",
                           aggfunc="sum", fill_value=0).sort_index()
    cum = grid.cumsum()
    tot = grid.sum()
    N = int(tot.sum())
    rows = []
    for thr in cum.index[:-1]:             # max value → empty right
        cl = [int(v) for v in cum.loc[thr]]
        nt = [int(v) for v in tot]
        n_l = sum(cl)
        n_r = N - n_l
        ssl = sum(v * v for v in cl)
        ssr = sum((t - v) * (t - v) for t, v in zip(nt, cl))
        gnl = n_l * n_l - ssl
        gnr = n_r * n_r - ssr
        wg = (float(gnl) / n_l + float(gnr) / n_r) / N
        rows.append({"thr_cents": int(thr), "n_left": n_l,
                     "n_right": n_r, "gini_num_left": gnl,
                     "gini_num_right": gnr,
                     "wgini": np.round(wg, 6)})
    return pd.DataFrame(rows).astype({
        "thr_cents": np.int64, "n_left": np.int64,
        "n_right": np.int64, "gini_num_left": np.int64,
        "gini_num_right": np.int64})


SQL_STUMP = """
WITH pts AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
                    l_returnflag AS f FROM lineitem),
cnt AS (SELECT d, f, CAST(COUNT(*) AS HUGEINT) AS n
        FROM pts GROUP BY 1, 2),
grid AS (SELECT ds.d, fs.f, COALESCE(cnt.n, 0) AS n
         FROM (SELECT DISTINCT d FROM cnt) ds
         CROSS JOIN (SELECT DISTINCT f FROM cnt) fs
         LEFT JOIN cnt ON cnt.d = ds.d AND cnt.f = fs.f),
cum AS (SELECT d, f, SUM(n) OVER (PARTITION BY f ORDER BY d) AS cl
        FROM grid),
tot AS (SELECT f, SUM(n) AS nt FROM grid GROUP BY 1),
per AS (SELECT c.d, SUM(c.cl) AS n_l, SUM(c.cl * c.cl) AS ssl,
               SUM(t.nt - c.cl) AS n_r,
               SUM((t.nt - c.cl) * (t.nt - c.cl)) AS ssr
        FROM cum c JOIN tot t ON c.f = t.f GROUP BY 1),
nn AS (SELECT SUM(nt) AS n FROM tot)
SELECT d AS thr_cents,
       CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
       CAST(n_l * n_l - ssl AS BIGINT) AS gini_num_left,
       CAST(n_r * n_r - ssr AS BIGINT) AS gini_num_right,
       ROUND((CAST(n_l * n_l - ssl AS DOUBLE) / n_l
              + CAST(n_r * n_r - ssr AS DOUBLE) / n_r) / nn.n, 6)
         AS wgini
FROM per, nn WHERE n_r > 0 ORDER BY 1
"""


def q_seasonal_decompose_revenue(sf_dir: str):
    """Classical additive seasonal decomposition of daily revenue:
    trend = centered 7-day moving sum on the GAP-FILLED calendar,
    seasonal(dow) = mean detrended value per ISO weekday over interior
    days (full windows only).  Mean of (x − s7/7) is evaluated as the
    integer identity Σ(7x − s7) / (7·count) — exact cents arithmetic
    end to end, ONE mirrored division per weekday row.  Distributed
    part: the shared daily-cents reduce; the finish is days-bounded."""
    d = _daily_revenue_cents(sf_dir)
    days = d["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[days - lo] = d["rev"].to_numpy(np.int64)
    n = len(dense)
    out_rows = []
    if n >= 7:
        csum = np.concatenate([[0], np.cumsum(dense)])
        s7 = csum[7:] - csum[:-7]          # window [i-3, i+3] at i+3
        centers = np.arange(3, n - 3)
        dt = 7 * dense[centers] - s7       # 7x − Σwindow, exact ints
        isodow = ((centers + lo) + 3) % 7 + 1
        for dow in range(1, 8):
            m = isodow == dow
            if not m.any():
                continue
            num = int(sum(int(v) for v in dt[m]))
            cnt = int(m.sum())
            out_rows.append({
                "isodow": dow, "n_days": cnt,
                "seasonal": np.round(float(num) / (7.0 * cnt), 4)})
    return pd.DataFrame(out_rows).astype({"isodow": np.int64,
                                          "n_days": np.int64})


SQL_SEASONAL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
f AS (SELECT cal.day, COALESCE(d.rev, 0) AS x
      FROM cal LEFT JOIN d USING (day)),
w AS (SELECT day, x,
             SUM(x) OVER (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS s7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS c7
      FROM f),
det AS (SELECT (day + 3) % 7 + 1 AS isodow, 7 * x - s7 AS dt
        FROM w WHERE c7 = 7)
SELECT isodow, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(dt) AS DOUBLE) / (7.0 * COUNT(*)), 4)
         AS seasonal
FROM det GROUP BY 1 ORDER BY 1
"""


#: count-min sketch geometry + row-hash constants (splitmix64 odd
#: multipliers, public constants) — shared verbatim with the SQL twin
_CMS_W_BITS = 10                        # 1024 buckets per row
_CMS_A = (0xBF58476D1CE4E5B9, 0x94D049BB133111EB)


def _cms_buckets(h: np.ndarray, a: int) -> np.ndarray:
    """Multiply-shift bucket: top _CMS_W_BITS bits of h·a mod 2⁶⁴."""
    with np.errstate(over="ignore"):
        return ((h * np.uint64(a)) >> np.uint64(64 - _CMS_W_BITS)) \
            .astype(np.int64)


def q_countmin_word_freq(sf_dir: str):
    """Count-min sketch word frequencies — the fixed-memory heavy-
    hitter counter every streaming ingest keeps — with an EXACT SQL
    twin: the sketch is deterministic (2 multiply-shift rows × 1024
    counters over the shared SQL-mirrorable word hash), so DuckDB can
    recompute every counter cell and the per-word estimate
    min(row₀[b₀(w)], row₁[b₁(w)]) bit-for-bit.  Distributed shape:
    one vocab groupby (the exact counts), then a 2048-bounded
    (row, bucket) fold — counters are sums, so partials merge at any
    partitioning.  Output: the exact top-20 words with their exact
    count AND the sketch estimate (≥ exact by construction — the
    overestimate-only contract is also pytest-pinned)."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["text"], pattern=" ")
        words = pc.list_flatten(parts)
        words = words.filter(pc.not_equal(words, ""))
        g = pa.table({"w": words}).group_by("w") \
            .aggregate([("w", "count")])
        return pa.table({"w": g["w"],
                         "pcnt": g["w_count"].cast(pa.int64())})

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("pcnt", alias_name="n")) \
        .materialize()                 # vocab-bounded, consumed twice

    def bucketize(t: pa.Table) -> pa.Table:
        ws = t["w"].to_pylist()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = dd.word_hashes_u64(ws)
        rows, buckets, cnts = [], [], []
        for j, a in enumerate(_CMS_A):
            rows.append(np.full(len(ws), j, dtype=np.int64))
            buckets.append(_cms_buckets(h, a))
            cnts.append(n)
        g = pd.DataFrame({"row": np.concatenate(rows),
                          "bucket": np.concatenate(buckets),
                          "pc_": np.concatenate(cnts)}) \
            .groupby(["row", "bucket"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ctr = relational.ds_to_table(
        counts.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["row", "bucket"]).aggregate(Sum("pc_",
                                                  alias_name="c"))
    ).to_pandas()
    cmap = {(int(r.row), int(r.bucket)): int(r.c)
            for r in ctr.itertuples()}

    def prune(t: pa.Table) -> pa.Table:
        t = pa.table({"w": t["w"], "n": t["n"].cast(pa.int64())})
        return t.sort_by([("n", "descending"), ("w", "ascending")]) \
            .slice(0, 20)

    top = relational.ds_to_table(
        counts.map_batches(prune, batch_format="pyarrow")) \
        .sort_by([("n", "descending"), ("w", "ascending")]) \
        .slice(0, 20).to_pandas()
    h = dd.word_hashes_u64(top["w"].tolist())
    bks = [_cms_buckets(h, a) for a in _CMS_A]
    est = [min(cmap[(j, int(bks[j][i]))]
               for j in range(len(_CMS_A)))
           for i in range(len(top))]
    out = pd.DataFrame({"word": top["w"], "n_exact": top["n"],
                        "cms_est": est})
    return out.astype({"n_exact": np.int64, "cms_est": np.int64})


def _sql_countmin() -> str:
    M = 1 << 64
    mix = dd.SIMHASH_MIX
    mixhi = (mix << 32) % M
    shift = 1 << (64 - _CMS_W_BITS)
    bcols = []
    for j, a in enumerate(_CMS_A):
        ahi = (a << 32) % M
        bcols.append(f"((h % 4294967296) * {a} % {M}"
                     f" + (h // 4294967296) * {ahi} % {M}) % {M}"
                     f" // {shift} AS b{j}")
    return rf"""
WITH words AS (SELECT unnest(string_split(text, ' ')) AS w
               FROM documents),
wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM words
       WHERE w <> '' GROUP BY w),
folded AS (
  SELECT w, n,
    list_reduce(
      [CAST(CAST('0x'||substr(hex(encode(w)),2*i-1,2) AS INT) AS HUGEINT)
       for i in generate_series(1, octet_length(encode(w)))],
      (a,b) -> (a*{dd.SIMHASH_PRIME} + b) % {M}) AS f
  FROM wc),
wh AS (SELECT w, n,
              ((f % 4294967296) * {mix} % {M}
               + (f // 4294967296) * {mixhi} % {M}) % {M} AS h
       FROM folded),
bk AS (SELECT w, n, {bcols[0]}, {bcols[1]} FROM wh),
c0 AS (SELECT b0 AS b, SUM(n) AS c FROM bk GROUP BY 1),
c1 AS (SELECT b1 AS b, SUM(n) AS c FROM bk GROUP BY 1),
top AS (SELECT w, n, b0, b1 FROM bk ORDER BY n DESC, w ASC LIMIT 20)
SELECT top.w AS word, top.n AS n_exact,
       CAST(LEAST(c0.c, c1.c) AS BIGINT) AS cms_est
FROM top JOIN c0 ON c0.b = top.b0 JOIN c1 ON c1.b = top.b1
ORDER BY n_exact DESC, word ASC
"""


def q_locf_impute_value(sf_dir: str):
    """Last-observation-carried-forward imputation — the time-series
    gap repair every sensor/metrics pipeline runs: 'error' events
    carry no usable value (treated as NULL), each gets the user's most
    recent non-null value under composite (ts, event_id) order.  One
    user-bucket shuffle; per bucket the fill is a vectorized pandas
    groupby-ffill (no per-row Python), and because a user lives in
    exactly one bucket the per-user aggregate is final — no second
    shuffle.  Exact-cents sums of the filled values; the twin is the
    window idiom LAST_VALUE(v IGNORE NULLS)."""
    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id",
                                  "event_type", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "ts": ts,
            "eid": g["event_id"].to_numpy(np.int64),
            "v": np.where(g["event_type"].to_numpy() == "error",
                          np.nan, g["value"].to_numpy(np.float64))}) \
            .sort_values(["u", "ts", "eid"])
        fv = df.groupby("u", sort=False)["v"].ffill()
        isnull = df["v"].isna()
        filled = isnull & fv.notna()
        cents = np.where(filled,
                         np.round(fv.to_numpy() * 100.0), 0.0)
        out = pd.DataFrame({
            "user_id": df["u"], "nn": isnull.astype(np.int64),
            "nf": filled.astype(np.int64),
            "fc": cents.astype(np.int64)}) \
            .groupby("user_id", sort=False) \
            .agg(n_null=("nn", "sum"), n_filled=("nf", "sum"),
                 filled_cents=("fc", "sum")).reset_index()
        return out

    out = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    return out.astype({"user_id": np.int64, "n_null": np.int64,
                       "n_filled": np.int64,
                       "filled_cents": np.int64})


SQL_LOCF = """
WITH e AS (SELECT user_id, ts, event_id,
                  CASE WHEN event_type = 'error' THEN NULL
                       ELSE value END AS v
           FROM events),
f AS (SELECT user_id, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS fv
      FROM e)
SELECT user_id,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(SUM(CASE WHEN v IS NULL AND fv IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(SUM(CASE WHEN v IS NULL AND fv IS NOT NULL
                     THEN CAST(ROUND(fv * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS filled_cents
FROM f GROUP BY 1 ORDER BY 1
"""


def q_bipartite_check_links(sf_dir: str):
    """Two-colorability probe of the synthetic link graph within the
    4-hop crawl horizon: color(v) = parity of the MIN hop distance
    from the multi-source seed set (every 97th doc), conflict = an
    edge whose endpoints are both reached and share a parity — zero
    conflicts ⇔ the reached subgraph is bipartite under BFS layering.
    Frontier-only BFS (graph_ops.bfs_hops) plus two bucketed joins to
    attach endpoint parities — no broadcast of the visited set, so the
    check scales to web-graph V.  The twin unrolls the same 4 rounds
    and counts conflicts over the identical edge bag."""
    from ray.data.aggregate import Sum

    from ..stages import graph_ops

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    def seed_rows(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"v": pa.array(d[d % 97 == 0])})

    edges_ds = docs.map_batches(edges, batch_format="pyarrow")
    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")
    hops = graph_ops.bfs_hops(edges_ds, seeds, rounds=4,
                              approx_num_nodes=n).materialize()

    par = hops.map_batches(
        lambda t: pa.table({
            "v": t["v"],
            "even": pc.cast(pc.equal(
                pc.bit_wise_and(t["hops"].cast(pa.int64()), 1), 0),
                pa.int64())}),
        batch_format="pyarrow")
    reach = par.map_batches(lambda t: pa.table({
        "nr": pa.array([t.num_rows]),
        "ne": pa.array([pc.sum(t["even"]).as_py() or 0])}),
        batch_format="pyarrow") \
        .aggregate(Sum("nr", alias_name="nr"),
                   Sum("ne", alias_name="ne"))
    n_reached = int(reach["nr"])
    n_even = int(reach["ne"])

    src_par = par.map_batches(
        lambda t: pa.table({"src": t["v"], "p_src": t["even"]}),
        batch_format="pyarrow")
    dst_par = par.map_batches(
        lambda t: pa.table({"dst": t["v"], "p_dst": t["even"]}),
        batch_format="pyarrow")
    j1 = relational.bucketed_hash_join(edges_ds, src_par, on="src")
    j2 = relational.bucketed_hash_join(j1, dst_par, on="dst")
    conf = j2.map_batches(lambda t: pa.table({
        "c": pa.array([pc.sum(pc.cast(pc.equal(
            t["p_src"], t["p_dst"]), pa.int64())).as_py() or 0])}),
        batch_format="pyarrow") \
        .aggregate(Sum("c", alias_name="c"))
    conflicts = int(conf["c"])
    return pd.DataFrame([{
        "n_reached": n_reached, "n_even": n_even,
        "n_odd": n_reached - n_even, "conflict_edges": conflicts,
        "bipartite_horizon": 1 if conflicts == 0 else 0}]) \
        .astype({"n_reached": np.int64, "n_even": np.int64,
                 "n_odd": np.int64, "conflict_edges": np.int64,
                 "bipartite_horizon": np.int64})


SQL_BIPARTITE = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
d0 AS (SELECT doc_id AS v, CAST(0 AS BIGINT) AS hops
       FROM documents WHERE doc_id % 97 = 0),
f1 AS (SELECT DISTINCT e.dst AS v FROM edges e
       JOIN d0 ON d0.v = e.src AND d0.hops = 0),
d1 AS (SELECT v, MIN(hops) AS hops FROM (
         SELECT v, hops FROM d0
         UNION ALL SELECT v, CAST(1 AS BIGINT) FROM f1) GROUP BY v),
f2 AS (SELECT DISTINCT e.dst AS v FROM edges e
       JOIN d1 ON d1.v = e.src AND d1.hops = 1),
d2 AS (SELECT v, MIN(hops) AS hops FROM (
         SELECT v, hops FROM d1
         UNION ALL SELECT v, CAST(2 AS BIGINT) FROM f2) GROUP BY v),
f3 AS (SELECT DISTINCT e.dst AS v FROM edges e
       JOIN d2 ON d2.v = e.src AND d2.hops = 2),
d3 AS (SELECT v, MIN(hops) AS hops FROM (
         SELECT v, hops FROM d2
         UNION ALL SELECT v, CAST(3 AS BIGINT) FROM f3) GROUP BY v),
f4 AS (SELECT DISTINCT e.dst AS v FROM edges e
       JOIN d3 ON d3.v = e.src AND d3.hops = 3),
d4 AS (SELECT v, MIN(hops) AS hops FROM (
         SELECT v, hops FROM d3
         UNION ALL SELECT v, CAST(4 AS BIGINT) FROM f4) GROUP BY v),
conf AS (SELECT COUNT(*) AS c FROM edges e
         JOIN d4 a ON a.v = e.src JOIN d4 b ON b.v = e.dst
         WHERE a.hops % 2 = b.hops % 2)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d4) AS n_reached,
       (SELECT CAST(SUM(CASE WHEN hops % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) FROM d4) AS n_even,
       (SELECT CAST(SUM(CASE WHEN hops % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) FROM d4) AS n_odd,
       CAST(conf.c AS BIGINT) AS conflict_edges,
       CAST(CASE WHEN conf.c = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS bipartite_horizon
FROM conf
"""


def q_frequent_triples_events(sf_dir: str):
    """Frequent-itemset mining (the market-basket classic) over
    (user, day) baskets of event types: support of every 3-type
    combination.  The scale trick is the BITMASK FOLD: after one exact
    (user, day, type) distinct, each basket's type set reduces to a
    Σ2^bit integer via an ordinary SUM aggregate, and the support of
    every triple is a subset-sum over the ≤2^|types| mask histogram —
    so the corpus-wide shuffles carry only distinct triples and then
    (user, day, mask) rows, never candidate itemsets (the a-priori
    explosion stays on the driver over a types³-bounded lattice).
    The twin runs the literal three-way self-join."""
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def pair_dedup(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "day": day,
            "event_type": t["event_type"].to_numpy(
                zero_copy_only=False)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    trip = ev.map_batches(pair_dedup, batch_format="pyarrow") \
        .groupby(["user_id", "day", "event_type"]) \
        .aggregate(Count(alias_name="_c")).materialize()
    types = sorted(relational.ds_to_table(
        trip.map_batches(
            lambda t: pa.table({"event_type":
                                pc.unique(t["event_type"])}),
            batch_format="pyarrow")
        .groupby("event_type").aggregate(Count(alias_name="_c"))
    )["event_type"].to_pylist())
    bit = {t: 1 << i for i, t in enumerate(types)}

    def to_bits(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        b = np.array([bit[x] for x in et], dtype=np.int64)
        return pa.table({"user_id": t["user_id"], "day": t["day"],
                         "b": pa.array(b)})

    masks = trip.map_batches(to_bits, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(Sum("b",
                                                   alias_name="mask"))

    def mask_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"mask": t["mask"].to_numpy(
            zero_copy_only=False), "n": 1}) \
            .groupby("mask", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = relational.ds_to_table(
        masks.map_batches(mask_partial, batch_format="pyarrow")
        .groupby("mask").aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    mcount = {int(r.mask): int(r.n) for r in hist.itertuples()}
    rows = []
    k = len(types)
    for i in range(k):
        for j in range(i + 1, k):
            for l in range(j + 1, k):
                need = (1 << i) | (1 << j) | (1 << l)
                sup = sum(n for m, n in mcount.items()
                          if m & need == need)
                if sup >= 1:
                    rows.append({"t1": types[i], "t2": types[j],
                                 "t3": types[l], "support": sup})
    out = pd.DataFrame(rows).sort_values(["t1", "t2", "t3"]) \
        .reset_index(drop=True)
    return out.astype({"support": np.int64})


SQL_TRIPLES = """
WITH s AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day,
                  event_type AS t
           FROM events)
SELECT a.t AS t1, b.t AS t2, c.t AS t3,
       CAST(COUNT(*) AS BIGINT) AS support
FROM s a
JOIN s b ON a.user_id = b.user_id AND a.day = b.day AND a.t < b.t
JOIN s c ON a.user_id = c.user_id AND a.day = c.day AND b.t < c.t
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_diff_in_diff_value(sf_dir: str):
    """Difference-in-differences — the quasi-experimental estimator:
    treatment arm by deterministic user-id parity (the fixture's
    standing A/B convention), pre/post periods split at epoch day
    19738 (2024-01-16), outcome = event value in exact cents.
    DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre).  One streaming
    pass folds the four (arm, period) cells' exact-int sums/counts;
    the four means and the estimate are the only float ops, written
    to mirror the SQL text."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["ts", "user_id", "value"])
    SPLIT = 19738

    def cells(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        arm = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64) % 2)
        post = (day >= SPLIT).astype(np.int64)
        cents = np.round(t["value"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"arm": arm, "post": post, "s": cents,
                          "n": 1}).groupby(["arm", "post"],
                                           sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    c = relational.ds_to_table(
        ev.map_batches(cells, batch_format="pyarrow")
        .groupby(["arm", "post"]).aggregate(
            Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    ).to_pandas().set_index(["arm", "post"])

    def cell(a, p):
        return int(c.loc[(a, p), "s"]), int(c.loc[(a, p), "n"])

    st0, nt0 = cell(1, 0)
    st1, nt1 = cell(1, 1)
    sc0, nc0 = cell(0, 0)
    sc1, nc1 = cell(0, 1)
    did = (float(st1) / nt1 - float(st0) / nt0) \
        - (float(sc1) / nc1 - float(sc0) / nc0)
    return pd.DataFrame([{
        "n_t_pre": nt0, "n_t_post": nt1, "n_c_pre": nc0,
        "n_c_post": nc1, "did_cents": np.round(did, 4)}]) \
        .astype({"n_t_pre": np.int64, "n_t_post": np.int64,
                 "n_c_pre": np.int64, "n_c_post": np.int64})


SQL_DID = """
WITH e AS (SELECT user_id % 2 AS arm,
                  CASE WHEN epoch_us(ts) // 86400000000 >= 19738
                       THEN 1 ELSE 0 END AS post,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
c AS (SELECT arm, post, SUM(cents) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
w AS (SELECT
        MAX(CASE WHEN arm = 1 AND post = 0 THEN s END) AS st0,
        MAX(CASE WHEN arm = 1 AND post = 0 THEN n END) AS nt0,
        MAX(CASE WHEN arm = 1 AND post = 1 THEN s END) AS st1,
        MAX(CASE WHEN arm = 1 AND post = 1 THEN n END) AS nt1,
        MAX(CASE WHEN arm = 0 AND post = 0 THEN s END) AS sc0,
        MAX(CASE WHEN arm = 0 AND post = 0 THEN n END) AS nc0,
        MAX(CASE WHEN arm = 0 AND post = 1 THEN s END) AS sc1,
        MAX(CASE WHEN arm = 0 AND post = 1 THEN n END) AS nc1
      FROM c)
SELECT nt0 AS n_t_pre, nt1 AS n_t_post, nc0 AS n_c_pre,
       nc1 AS n_c_post,
       ROUND((CAST(st1 AS DOUBLE) / nt1 - CAST(st0 AS DOUBLE) / nt0)
             - (CAST(sc1 AS DOUBLE) / nc1
                - CAST(sc0 AS DOUBLE) / nc0), 4) AS did_cents
FROM w
"""


def q_mutual_info_discount_flag(sf_dir: str):
    """Mutual information (nats) between l_discount and l_returnflag —
    the model-free feature-relevance screen that catches what a linear
    correlation misses.  One (feature-values × classes)-bounded count
    reduce (11 × 3 here), exact-int marginals, then MI and the two
    entropies finish on the tiny joint table with per-cell float terms
    mirroring the SQL text (33 cells → double-rounding-safe at 6 dp)."""
    import math

    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_discount", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        d = np.round(t["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"d": d, "f": t["l_returnflag"].to_numpy(
            zero_copy_only=False), "n": 1}) \
            .groupby(["d", "f"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "f"]).aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    N = int(cnt["n"].sum())
    r = cnt.groupby("d")["n"].sum()
    cl = cnt.groupby("f")["n"].sum()
    mi = sum((int(row.n) / N)
             * math.log(int(row.n) * N
                        / (int(r[row.d]) * int(cl[row.f])))
             for row in cnt.itertuples())
    hx = -sum((int(v) / N) * math.log(int(v) / N) for v in r)
    hy = -sum((int(v) / N) * math.log(int(v) / N) for v in cl)
    return pd.DataFrame([{
        "n": N, "mi_nats": np.round(mi, 6),
        "h_discount": np.round(hx, 6),
        "h_flag": np.round(hy, 6)}]).astype({"n": np.int64})


SQL_MUTUAL_INFO = """
WITH pts AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
                    l_returnflag AS f FROM lineitem),
cnt AS (SELECT d, f, CAST(COUNT(*) AS BIGINT) AS n
        FROM pts GROUP BY 1, 2),
nn AS (SELECT SUM(n) AS n FROM cnt),
r AS (SELECT d, SUM(n) AS rn FROM cnt GROUP BY 1),
c AS (SELECT f, SUM(n) AS cn FROM cnt GROUP BY 1)
SELECT CAST(nn.n AS BIGINT) AS n,
       ROUND((SELECT SUM((CAST(cnt.n AS DOUBLE) / nn.n)
                         * ln(CAST(cnt.n AS DOUBLE) * nn.n
                              / (CAST(r.rn AS DOUBLE) * c.cn)))
              FROM cnt JOIN r ON cnt.d = r.d
                       JOIN c ON cnt.f = c.f), 6) AS mi_nats,
       ROUND((SELECT -SUM((CAST(rn AS DOUBLE) / nn.n)
                          * ln(CAST(rn AS DOUBLE) / nn.n))
              FROM r), 6) AS h_discount,
       ROUND((SELECT -SUM((CAST(cn AS DOUBLE) / nn.n)
                          * ln(CAST(cn AS DOUBLE) / nn.n))
              FROM c), 6) AS h_flag
FROM nn
"""


#: character-class patterns shared verbatim by the Ray kernels and the
#: SQL twin (both RE2) — mixed-script detection catches mojibake and
#: script-spoofing spam that per-language filters miss
_SCRIPT_CLASSES = [("latin", "[A-Za-z]"), ("digit", "[0-9]"),
                   ("space", r"[ \t\n\r]"),
                   ("accent", "[À-ɏ]")]


def q_script_mix_by_source(sf_dir: str):
    """Unicode script/character-class mix per source — the corpus-
    hygiene profile that surfaces mojibake, script-spoofing and
    markup-heavy sources before they poison a tokenizer.  One
    streaming pass: per batch, one arrow C++ ``count_substring_regex``
    per class (RE2, shared pattern text with the DuckDB twin's
    ``regexp_extract_all``) + a utf8_length total, folded through a
    sources-bounded groupby.  ``other`` is the exact remainder of the
    disjoint classes."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        cols = {"source": t["source"],
                "n_docs": pa.array(np.ones(t.num_rows,
                                           dtype=np.int64)),
                "chars": pc.utf8_length(t["text"]).cast(pa.int64())}
        for name, pat in _SCRIPT_CLASSES:
            cols[name] = pc.count_substring_regex(
                t["text"], pattern=pat).cast(pa.int64())
        g = pa.table(cols).group_by("source").aggregate(
            [(c, "sum") for c in cols if c != "source"])
        return g.rename_columns(["source"] + [c for c in cols
                                              if c != "source"])

    out = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("chars", alias_name="chars"),
            *[Sum(n, alias_name=n) for n, _ in _SCRIPT_CLASSES])
    ).to_pandas().sort_values("source").reset_index(drop=True)
    out["other"] = out["chars"] - sum(out[n] for n, _
                                      in _SCRIPT_CLASSES)
    ints = {c: np.int64 for c in out.columns if c != "source"}
    return out.astype(ints)


def _sql_script_mix() -> str:
    cls = ",\n       ".join(
        f"CAST(SUM(length(regexp_extract_all(text, '{pat}')))"
        f" AS BIGINT) AS {name}" for name, pat in _SCRIPT_CLASSES)
    rem = " - ".join(["CAST(SUM(length(text)) AS BIGINT)"]
                     + [f"CAST(SUM(length(regexp_extract_all(text,"
                        f" '{pat}'))) AS BIGINT)"
                        for _, pat in _SCRIPT_CLASSES])
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS chars,
       {cls},
       {rem} AS other
FROM documents GROUP BY source ORDER BY source
"""


def q_golden_record_entities(sf_dir: str):
    """Golden-record construction (MDM survivorship): after fuzzy
    entity resolution, each cluster publishes ONE canonical record —
    longest name wins (corruption deletes characters), ties break
    lexicographically; unmatched records survive as their own
    singleton golden record.  Cluster labels ride a bucketed LEFT
    join back onto the full clean ∪ dirty catalog (no broadcast of
    the entity set), survivorship picks per label inside a bucketed
    group pass.  Reuses the fuzzy-pairs + connected-components
    kernels; the twin composes the identical recursive closure."""
    clean, dirty = _fuzzy_sides(sf_dir)
    lbl = _fuzzy_cluster_labels(sf_dir)
    labels = rd.from_pandas(pd.DataFrame({
        "id": lbl["node"].astype(np.int64),
        "label": lbl["label"].astype(np.int64)}))
    ents = clean.union(dirty)
    j = relational.bucketed_hash_join(ents, labels, on="id",
                                      how="left")

    from ..stages.relational import stable_bucket

    def finish(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False)
        lab = np.where(pd.isna(lab), ids, lab).astype(np.int64)
        out = pa.table({"label": pa.array(lab), "id": t["id"],
                        "nm": t["nm"]})
        return out.append_column(
            "_bucket", pa.array(stable_bucket(out["label"], 64)))

    def survive(g: pd.DataFrame) -> pd.DataFrame:
        # label-bucket group: every cluster lives whole in one bucket,
        # so ONE vectorized sort + first-per-label is the full
        # survivorship pick (no per-cluster python — a label-keyed
        # map_groups here cost 26 s at sf0.1 for ~33 k tiny groups)
        g = g.assign(ln=g["nm"].str.len()) \
            .sort_values(["label", "ln", "nm"],
                         ascending=[True, False, True])
        agg = g.groupby("label", sort=False) \
            .agg(n_records=("nm", "size"),
                 canonical_nm=("nm", "first")).reset_index()
        return agg

    # pin the labeled catalog (entity-dimension bounded): the groupby's
    # schema probe otherwise re-executes the whole two-sort join DAG
    # with limit 1 — measured 6.5 s of pure re-derivation at sf0.1
    labeled = j.map_batches(finish,
                            batch_format="pyarrow").materialize()
    out = relational.ds_to_table(
        labeled.groupby("_bucket").map_groups(survive,
                                              batch_format="pandas")
    ).to_pandas().sort_values("label").reset_index(drop=True)
    return out.astype({"label": np.int64, "n_records": np.int64})


SQL_GOLDEN_RECORD = SQL_FUZZY_BASE + """,
sym AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b
        FROM pairs),
reach(node, anc) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.anc),
lbl AS (SELECT node, MIN(l) AS label FROM (
          SELECT node, node AS l
          FROM (SELECT a AS node FROM pairs
                UNION SELECT b AS node FROM pairs)
          UNION ALL SELECT node, anc AS l FROM reach)
        GROUP BY node),
ents AS (SELECT id, nm FROM clean UNION ALL SELECT id, nm FROM dirty),
tagged AS (SELECT e.id, e.nm, COALESCE(l.label, e.id) AS label
           FROM ents e LEFT JOIN lbl l ON l.node = e.id),
ranked AS (SELECT label, nm,
                  ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY length(nm) DESC, nm ASC)
                    AS rk,
                  COUNT(*) OVER (PARTITION BY label) AS n
           FROM tagged)
SELECT label, CAST(n AS BIGINT) AS n_records, nm AS canonical_nm
FROM ranked WHERE rk = 1 ORDER BY label
"""


def q_bag_intersect_users(sf_dir: str):
    """INTERSECT ALL as an executable contract — bag semantics, the
    variant set-algebra queries silently get wrong: the multiset
    intersection of the click-user bag and the purchase-user bag
    keeps each user min(#clicks, #purchases) times (SQL's INTERSECT
    would collapse to distinct).  One (user × {click,purchase}) count
    reduce, then the Σ min fold — no row-level intersection ever
    materializes."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        isc = (et[keep] == "click").astype(np.int64)
        g = pd.DataFrame({"user_id": u, "nc": isc, "np_": 1 - isc}) \
            .groupby("user_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("nc", alias_name="nc"),
                                      Sum("np_", alias_name="np_"))

    def fold(t: pa.Table) -> pa.Table:
        nc = t["nc"].to_numpy(zero_copy_only=False)
        npp = t["np_"].to_numpy(zero_copy_only=False)
        mn = np.minimum(nc, npp)
        return pa.table({"r": pa.array([int(mn.sum())]),
                         "u": pa.array([int((mn > 0).sum())])})

    agg = per_user.map_batches(fold, batch_format="pyarrow") \
        .aggregate(Sum("r", alias_name="r"), Sum("u", alias_name="u"))
    return pd.DataFrame([{"n_rows": int(agg["r"]),
                          "n_users": int(agg["u"])}]) \
        .astype({"n_rows": np.int64, "n_users": np.int64})


SQL_BAG_INTERSECT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM (SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase')
"""


def q_bootstrap_ci_daily_revenue(sf_dir: str):
    """Bootstrap 95 % CI for total daily revenue — WITHOUT A SINGLE
    FLOAT: 200 deterministic resamples of the daily-cents series
    (pick(r,i) = ((r·n+i+1)·φ₆₄ mod 2⁶⁴) mod n, the fixture's standing
    golden-ratio RNG, reproduced verbatim in HUGEINT by the twin),
    each rep's resampled TOTAL stays an exact integer, and the CI is
    the 5th / 196th order statistic of the 200 rep totals.  The
    distributed part is the shared daily reduce; the resample matrix
    is days×reps-bounded."""
    d = _daily_revenue_cents(sf_dir)
    cents = d["rev"].to_numpy(np.int64)
    n = len(cents)
    B = 200
    r = np.arange(B, dtype=np.uint64)[:, None]
    i = np.arange(n, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pick = ((r * np.uint64(n) + i + np.uint64(1))
                * np.uint64(relational.SAMPLE_MIX)) % np.uint64(n)
    sums = np.sort(cents[pick.astype(np.int64)].sum(axis=1))
    return pd.DataFrame([{
        "n_days": n, "n_reps": B,
        "total_cents": int(cents.sum()),
        "ci_lo_cents": int(sums[4]),       # 5th smallest  (2.5 %)
        "ci_hi_cents": int(sums[195]),     # 196th smallest (97.5 %)
    }]).astype({c: np.int64 for c in
                ["n_days", "n_reps", "total_cents", "ci_lo_cents",
                 "ci_hi_cents"]})


SQL_BOOTSTRAP = f"""
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
i AS (SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx, rev FROM d),
nn AS (SELECT COUNT(*) AS n FROM i),
g AS (SELECT r.r,
             CAST((CAST(r.r AS HUGEINT) * nn.n + s.idx + 1)
                  * {relational.SAMPLE_MIX}
                  % 18446744073709551616 % nn.n AS BIGINT) AS pick
      FROM (SELECT unnest(generate_series(0, 199)) AS r) r, i s, nn),
reps AS (SELECT g.r, SUM(i2.rev) AS s
         FROM g JOIN i i2 ON i2.idx = g.pick GROUP BY 1),
rk AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS k FROM reps)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
       CAST(200 AS BIGINT) AS n_reps,
       (SELECT CAST(SUM(rev) AS BIGINT) FROM d) AS total_cents,
       (SELECT CAST(s AS BIGINT) FROM rk WHERE k = 5) AS ci_lo_cents,
       (SELECT CAST(s AS BIGINT) FROM rk WHERE k = 196) AS ci_hi_cents
"""


def _sql_bfs_rounds(seed_pred: str, src: str, dst: str,
                    rounds: int, p: str = "d") -> str:
    """Unrolled multi-round BFS CTE chain (frontier expand + MIN-merge
    per round) over the shared synthetic link graph, parameterized by
    direction and CTE-name prefix — the twin generator for every
    bounded-BFS query."""
    out = [f"{p}0 AS (SELECT doc_id AS v, CAST(0 AS BIGINT) AS hops\n"
           f"       FROM documents WHERE {seed_pred})"]
    for r in range(1, rounds + 1):
        out.append(
            f"{p}f{r} AS (SELECT DISTINCT e.{dst} AS v FROM edges e\n"
            f"       JOIN {p}{r-1} p ON p.v = e.{src}"
            f" AND p.hops = {r-1})")
        out.append(
            f"{p}{r} AS (SELECT v, MIN(hops) AS hops FROM (\n"
            f"         SELECT v, hops FROM {p}{r-1}\n"
            f"         UNION ALL SELECT v, CAST({r} AS BIGINT)"
            f" FROM {p}f{r}) GROUP BY v)")
    return ",\n".join(out)


def q_pivot_scc_links(sf_dir: str):
    """Strongly-connected-component membership probe for the pivot
    node (doc 0) within a 4-hop horizon — the FW-BW primitive every
    distributed SCC algorithm (e.g. Orzan/FB-Trim) is built from:
    forward BFS on the edges, backward BFS on the REVERSED edges, and
    the SCC candidates are the intersection.  Both legs reuse the
    frontier-only bfs_hops kernel; the intersection is one bucketed
    semi-join (no reached-set broadcast).  The twin unrolls both
    4-round chains over the identical edge bag."""
    from ..stages import graph_ops, relational as rel

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(flip: bool):
        def f(batch: pa.Table) -> pa.Table:
            d = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            src = np.repeat(d, 3)
            k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
            dst = (src * 7919 + k * 104729) % n
            if flip:
                src, dst = dst, src
            return pa.table({"src": pa.array(src),
                             "dst": pa.array(dst)})
        return f

    seeds = rd.from_items([{"v": 0}])
    fwd = graph_ops.bfs_hops(
        docs.map_batches(edges(False), batch_format="pyarrow"),
        seeds, rounds=4, approx_num_nodes=n)
    bwd = graph_ops.bfs_hops(
        docs.map_batches(edges(True), batch_format="pyarrow"),
        seeds, rounds=4, approx_num_nodes=n)
    n_fwd, n_bwd = fwd.count(), bwd.count()
    scc = relational.bucketed_semi_join(
        fwd.select_columns(["v"]), bwd.select_columns(["v"]),
        on="v")
    return pd.DataFrame([{
        "n_fwd": n_fwd, "n_bwd": n_bwd, "n_scc": scc.count()}]) \
        .astype({"n_fwd": np.int64, "n_bwd": np.int64,
                 "n_scc": np.int64})


SQL_PIVOT_SCC = f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
{_sql_bfs_rounds("doc_id = 0", "src", "dst", 4, p="d")},
{_sql_bfs_rounds("doc_id = 0", "dst", "src", 4, p="r")}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d4) AS n_fwd,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM r4) AS n_bwd,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM d4 JOIN r4 ON d4.v = r4.v) AS n_scc
"""


def q_activity_decay_curve(sf_dir: str):
    """User-activity decay curve: for each gap k = 1..14 days, the
    exact number of (user, day) presence pairs that recur k days later
    — the raw curve behind every retention half-life fit.  One exact
    (user, day) distinct, then a user-bucket shuffle where each bucket
    answers all 14 gaps with vectorized self-merges (presence arrays
    never leave their bucket); zero-pair gaps still emit a row.  The
    exponential-decay fit itself is pytest-pinned (float OLS has no
    place in a hash surface)."""
    from ray.data.aggregate import Sum
    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "user_id"])
    GAPS = list(range(1, 15))

    def pres(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(
            zero_copy_only=False), "day": day}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Count
    presence = ev.map_batches(pres, batch_format="pyarrow") \
        .groupby(["user_id", "day"]) \
        .aggregate(Count(alias_name="_c"))

    def tag(t: pa.Table) -> pa.Table:
        b = stable_bucket(t["user_id"], 64)
        return t.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = g[["user_id", "day"]]
        rows = []
        for k in GAPS:
            shifted = base.assign(day=base["day"] + k)
            m = base.merge(shifted, on=["user_id", "day"])
            rows.append({"k": k, "n_k": len(m)})
        return pd.DataFrame(rows)

    out = relational.ds_to_table(
        presence.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
        .groupby("k").aggregate(Sum("n_k", alias_name="n_k"))
    ).to_pandas().sort_values("k").reset_index(drop=True)
    return out.astype({"k": np.int64, "n_k": np.int64})


SQL_ACTIVITY_DECAY = """
WITH p AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
           FROM events),
ks AS (SELECT unnest(generate_series(1, 14)) AS k),
hits AS (SELECT ks.k AS k, COUNT(*) AS n
         FROM ks, p a, p b
         WHERE a.user_id = b.user_id AND b.day = a.day + ks.k
         GROUP BY 1)
SELECT ks.k, CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_k
FROM ks LEFT JOIN hits ON hits.k = ks.k ORDER BY ks.k
"""


def q_l_diversity_audit(sf_dir: str):
    """l-diversity audit — the privacy check k-anonymity misses: a
    quasi-identifier class can be k-large yet expose everyone in it if
    the SENSITIVE attribute (mktsegment) is homogeneous.  Classes are
    (nation, $1000 balance band); the band uses the shift-then-divide
    trick ((cents + 1 000 000) // 100 000) so numpy floor division and
    SQL // agree on negative balances.  One (class × segment)-bounded
    count reduce; per class the distinct-sensitive count and the l ≥ 3
    verdict are exact ints."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal",
                                      "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        band = (cents + 1_000_000) // 100_000
        g = pd.DataFrame({
            "nation": t["c_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "band": band,
            "seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
            "n": 1}).groupby(["nation", "band", "seg"],
                             sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby(["nation", "band", "seg"]).aggregate(
            Sum("n", alias_name="n"))
    ).to_pandas()
    cls = cnt.groupby(["nation", "band"]) \
        .agg(n_rows=("n", "sum"), l_count=("seg", "nunique")) \
        .reset_index().sort_values(["nation", "band"]) \
        .reset_index(drop=True)
    cls["meets_l3"] = (cls["l_count"] >= 3).astype(np.int64)
    return cls.astype({"nation": np.int64, "band": np.int64,
                       "n_rows": np.int64, "l_count": np.int64})


SQL_L_DIVERSITY = """
WITH c AS (SELECT c_nationkey AS nation,
                  (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000)
                    // 100000 AS band,
                  c_mktsegment AS seg
           FROM customer)
SELECT nation, band, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS l_count,
       CAST(CASE WHEN COUNT(DISTINCT seg) >= 3 THEN 1 ELSE 0 END
            AS BIGINT) AS meets_l3
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_asof_forward_click_purchase(sf_dir: str):
    """FORWARD as-of join — 'the next purchase AFTER each click', the
    time-to-convert primitive (the mirror of asof_last_purchase's
    backward direction): each click matches the same user's EARLIEST
    following purchase.  Exercises the asof kernel's forward leg
    (smallest right.on ≥ left.on, first-in-sort tie semantics — the
    docstring contract) against DuckDB's native forward ASOF JOIN
    (`c.ts <= p.ts`).  Same one-sort-shuffle bucket shape."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts"])

    def prep_right(t: pa.Table) -> pa.Table:
        t = t.append_column("purchase_ts_us",
                            t["ts"].cast(pa.int64()))
        t = t.append_column("purchase_value", t["value"])
        return t.select(["user_id", "ts", "purchase_ts_us",
                         "purchase_value"])

    purchases = ev.filter(expr="event_type == 'purchase'") \
        .map_batches(prep_right, batch_format="pyarrow")
    out = relational.asof_join(clicks, purchases, on="ts",
                               by="user_id", num_buckets=16,
                               direction="forward")
    return out.select_columns(["event_id", "user_id",
                               "purchase_ts_us", "purchase_value"])


SQL_ASOF_FORWARD = """
SELECT c.event_id, c.user_id,
       epoch_us(p.ts) AS purchase_ts_us, p.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click') c
ASOF JOIN (SELECT user_id, ts, value FROM events
           WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def q_windowed_dedup_events(sf_dir: str):
    """Tumbling-window ingestion dedup — the bounded-state dedup a
    streaming sink runs (exactly-once per key per hour, state expires
    with the window): events collapse to one survivor per
    (user, type, hour window).  Per-batch distinct shrinks the stream,
    one exact triple groupby finishes it, and the per-type report
    (rows in vs survivors kept) folds from bounded partials."""
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        win = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 3_600_000_000
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(
                zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "win": win})
        g = df.groupby(["event_type", "user_id", "win"],
                       sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    triples = ev.map_batches(prep, batch_format="pyarrow") \
        .groupby(["event_type", "user_id", "win"]) \
        .aggregate(Sum("n", alias_name="n"))

    def fold(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(
                zero_copy_only=False),
            "n_in": t["n"].to_numpy(zero_copy_only=False),
            "n_kept": 1}).groupby("event_type", sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        triples.map_batches(fold, batch_format="pyarrow")
        .groupby("event_type").aggregate(
            Sum("n_in", alias_name="n_in"),
            Sum("n_kept", alias_name="n_kept"))
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    return out.astype({"n_in": np.int64, "n_kept": np.int64})


SQL_WINDOWED_DEDUP = """
WITH w AS (SELECT event_type, user_id,
                  epoch_us(ts) // 3600000000 AS win
           FROM events)
SELECT a.event_type, a.n_in, b.n_kept
FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_in
      FROM w GROUP BY 1) a
JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM (SELECT DISTINCT event_type, user_id, win FROM w)
      GROUP BY 1) b USING (event_type)
ORDER BY a.event_type
"""


def q_code_switch_docs(sf_dir: str):
    """Code-switching detection — the corpus-hygiene signal language-ID
    alone misses: a doc whose stopword profile fires for TWO OR MORE
    languages (≥3 hits each) is mixed-language (translation pairs,
    spam, boilerplate splices) and most LLM-data recipes route it
    separately.  Same six vectorized alternation-count passes as
    LangId (shared `_LANG_PROFILES`, so the twin is GENERATED from the
    same dict and cannot drift); primary language by first-max argmax,
    per-language (n_docs, n_switched) from a langs-bounded fold."""
    import re as _re

    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["text"])
    langs = list(text._LANG_PROFILES)
    res = [
        _re.compile(r"\b(?:" + "|".join(
            sorted(text._LANG_PROFILES[lg], key=len, reverse=True))
            + r")\b") for lg in langs]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        low = b["text"].str.lower()
        counts = np.stack([low.str.count(r).to_numpy()
                           for r in res], axis=1)
        best = counts.argmax(axis=1)        # first max wins
        pred = np.where(counts.max(axis=1) == 0, "und",
                        np.array(langs)[best])
        switched = ((counts >= 3).sum(axis=1) >= 2).astype(np.int64)
        return pd.DataFrame({"lang": pred, "n_docs": 1,
                             "n_switched": switched}) \
            .groupby("lang", sort=False).sum().reset_index()

    out = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_switched", alias_name="n_switched"))
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    return out.astype({"n_docs": np.int64, "n_switched": np.int64})


def _sql_code_switch() -> str:
    langs = list(text._LANG_PROFILES)
    pats = {lg: r"\b(?:" + "|".join(
        sorted(prof, key=len, reverse=True)) + r")\b"
        for lg, prof in text._LANG_PROFILES.items()}
    counts = ",\n    ".join(
        f"length(regexp_extract_all(lower(text), '{pats[lg]}'))"
        f" AS c_{lg}" for lg in langs)
    all_c = ", ".join(f"c_{lg}" for lg in langs)
    branches = []
    for i, lg in enumerate(langs):
        conds = " AND ".join(f"c_{lg} >= c_{o}"
                             for o in langs[i + 1:])
        branches.append(f"WHEN {conds or 'TRUE'} THEN '{lg}'")
    case = "\n      ".join(branches)
    sw = " + ".join(f"CASE WHEN c_{lg} >= 3 THEN 1 ELSE 0 END"
                    for lg in langs)
    return f"""
WITH scored AS (
  SELECT doc_id,
    {counts}
  FROM documents),
pred AS (
  SELECT CASE WHEN GREATEST({all_c}) = 0 THEN 'und'
      {case}
    END AS lang,
    CASE WHEN {sw} >= 2 THEN 1 ELSE 0 END AS sw
  FROM scored)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sw) AS BIGINT) AS n_switched
FROM pred GROUP BY 1 ORDER BY 1
"""


def q_interarrival_stats_by_type(sf_dir: str):
    """Inter-arrival time statistics per event type — the Poisson-rate
    diagnostic behind capacity planning and bot detection: gaps
    between consecutive events of the same (user, type) stream under
    composite (ts, event_id) order.  One user-bucket shuffle; per
    bucket the gaps are one vectorized diff with group-boundary
    masking; gap seconds floor to exact ints (// mirrored), the mean
    is the single division."""
    from ray.data.aggregate import Sum

    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id",
                                  "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64),
            "t": g["event_type"].to_numpy(),
            "ts": g["ts"].to_numpy().astype("datetime64[us]")
            .astype(np.int64),
            "eid": g["event_id"].to_numpy(np.int64)}) \
            .sort_values(["u", "t", "ts", "eid"])
        us = df["ts"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = (df["u"].to_numpy()[1:] ==
                        df["u"].to_numpy()[:-1]) \
                & (df["t"].to_numpy()[1:] == df["t"].to_numpy()[:-1])
        gap = np.zeros(len(df), dtype=np.int64)
        gap[1:] = us[1:] - us[:-1]
        gs = gap // 1_000_000               # floor-seconds, mirrored
        out = pd.DataFrame({"event_type": df["t"].to_numpy()[same],
                            "n_gaps": 1, "sum_gap_sec": gs[same]}) \
            .groupby("event_type", sort=False).sum().reset_index()
        return out

    out = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
        .groupby("event_type").aggregate(
            Sum("n_gaps", alias_name="n_gaps"),
            Sum("sum_gap_sec", alias_name="sum_gap_sec"))
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    out["mean_gap_sec"] = np.round(
        out["sum_gap_sec"].astype(np.float64)
        / out["n_gaps"].astype(np.float64), 4)
    return out.astype({"n_gaps": np.int64, "sum_gap_sec": np.int64})


SQL_INTERARRIVAL = """
WITH o AS (SELECT event_type, ts,
                  LAG(ts) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS pts
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM((epoch_us(ts) - epoch_us(pts)) // 1000000) AS BIGINT)
         AS sum_gap_sec,
       ROUND(CAST(SUM((epoch_us(ts) - epoch_us(pts)) // 1000000)
                  AS DOUBLE) / COUNT(*), 4) AS mean_gap_sec
FROM o WHERE pts IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def q_roc_points_doc_score(sf_dir: str):
    """ROC operating points for the logreg document scorer at 19 fixed
    thresholds (0.05 … 0.95) — the threshold-selection table behind
    every deployed classifier (AUC alone can't pick a cutoff).  One
    streaming pass: per batch a (rows × 19) vectorized comparison
    folds into exact (tp, fp) partials per threshold; tn/fn derive
    from the exact class totals; tpr/fpr are the mirrored divisions."""
    from ray.data.aggregate import Sum

    THR = [round(0.05 * i, 2) for i in range(1, 20)]
    scored = _doc_logreg_scored(sf_dir)
    thr = np.array(THR)

    def partial(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        lbl = t["label"].to_numpy(zero_copy_only=False)
        ge = s[:, None] >= thr[None, :]
        tp = (ge & (lbl == 1)[:, None]).sum(axis=0)
        fp = (ge & (lbl == 0)[:, None]).sum(axis=0)
        return pa.table({"thr": pa.array(thr),
                         "tp": pa.array(tp.astype(np.int64)),
                         "fp": pa.array(fp.astype(np.int64)),
                         "np_": pa.array(np.full(19, int(
                             (lbl == 1).sum()), dtype=np.int64)),
                         "nn_": pa.array(np.full(19, int(
                             (lbl == 0).sum()), dtype=np.int64))})

    agg = relational.ds_to_table(
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("thr").aggregate(
            Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
            Sum("np_", alias_name="npos"),
            Sum("nn_", alias_name="nneg"))
    ).to_pandas().sort_values("thr").reset_index(drop=True)
    agg["fn"] = agg["npos"] - agg["tp"]
    agg["tn"] = agg["nneg"] - agg["fp"]
    agg["tpr"] = np.round(agg["tp"].astype(np.float64)
                          / agg["npos"].astype(np.float64), 6)
    agg["fpr"] = np.round(agg["fp"].astype(np.float64)
                          / agg["nneg"].astype(np.float64), 6)
    out = agg[["thr", "tp", "fp", "fn", "tn", "tpr", "fpr"]]
    return out.astype({c: np.int64 for c in
                       ["tp", "fp", "fn", "tn"]})


def _sql_roc_points() -> str:
    thrs = ", ".join(repr(round(0.05 * i, 2)) for i in range(1, 20))
    return f"""
WITH f AS (
  SELECT n_chars / 1000.0 AS x1,
         len(string_split(text, ' ')) / 100.0 AS x2,
         CASE WHEN n_chars > 297 THEN 1 ELSE 0 END AS label
  FROM documents),
s AS (SELECT ROUND(1.0 / (1.0 + exp(-(0.25 + 0.8 * x1 - 0.5 * x2))),
             6) AS score, label FROM f),
t AS (SELECT unnest([{thrs}]) AS thr),
c AS (SELECT t.thr,
             CAST(SUM(CASE WHEN s.score >= t.thr AND s.label = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN s.score >= t.thr AND s.label = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(s.label) AS BIGINT) AS npos,
             CAST(SUM(1 - s.label) AS BIGINT) AS nneg
      FROM t, s GROUP BY 1)
SELECT thr, tp, fp, npos - tp AS fn, nneg - fp AS tn,
       ROUND(CAST(tp AS DOUBLE) / npos, 6) AS tpr,
       ROUND(CAST(fp AS DOUBLE) / nneg, 6) AS fpr
FROM c ORDER BY thr
"""


def q_dow_adjusted_anomalies(sf_dir: str):
    """Seasonally-adjusted anomaly counts: a day is anomalous when its
    revenue deviates from ITS WEEKDAY's mean by more than 3 weekday
    standard deviations — the adjustment that stops every Sunday from
    tripping a naive 3σ rule.  The test is the exact-integer
    inequality (n·x − S)² > 9·(n·SS − S²) per weekday (S, SS the
    weekday's cents sums — arbitrary-precision ints, S² overflows
    int64 past ~sf0.1), so no float variance can diverge from the
    twin.  Distributed part: the shared daily reduce; the finish is
    days-bounded."""
    d = _daily_revenue_cents(sf_dir)
    days = d["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[days - lo] = d["rev"].to_numpy(np.int64)
    isodow = ((np.arange(lo, hi + 1)) + 3) % 7 + 1
    rows = []
    for w in range(1, 8):
        xs = [int(v) for v in dense[isodow == w]]
        n = len(xs)
        if n == 0:
            continue
        S = sum(xs)
        SS = sum(x * x for x in xs)
        n_anom = sum(1 for x in xs
                     if (n * x - S) ** 2 > 9 * (n * SS - S * S))
        rows.append({"isodow": w, "n_days": n,
                     "n_anomalies": n_anom})
    return pd.DataFrame(rows).astype({"isodow": np.int64,
                                      "n_days": np.int64,
                                      "n_anomalies": np.int64})


SQL_DOW_ANOMALIES = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
f AS (SELECT cal.day, (cal.day + 3) % 7 + 1 AS isodow,
             COALESCE(d.rev, 0) AS x
      FROM cal LEFT JOIN d USING (day)),
m AS (SELECT isodow, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS ss
      FROM f GROUP BY 1)
SELECT m.isodow, CAST(m.n AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN (m.n * f.x - m.s) * (m.n * f.x - m.s)
                          > 9 * (m.n * m.ss - m.s * m.s)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM f JOIN m ON f.isodow = m.isodow
GROUP BY 1, 2 ORDER BY 1
"""


def q_temporal_reachability_links(sf_dir: str):
    """Time-respecting reachability — the temporal-network primitive
    (disease spread, information cascades, log forensics): an edge is
    usable only at its departure time t(e) = (src + k) % 30, and a
    path must have NON-DECREASING times, so plain BFS overcounts.
    Earliest-arrival propagation from doc 0 (arrival 0), 3 bounded
    rounds: each round is ONE streaming edge pass against the
    broadcast (node → arrival) state (size-guarded like the BFS
    kernel's broadcast leg — nodes-bounded, 16 B/node), new arrivals
    MIN-merge per round.  Output: the arrival-time histogram.  The
    twin unrolls the identical 3 rounds."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        dst = (src * 7919 + k * 104729) % n
        t = (src + k) % 30
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "t": pa.array(t)})

    # consumed once per round: pin so the edge build runs once
    edges_materialized = docs.map_batches(
        edges, batch_format="pyarrow").materialize()
    state_v = np.array([0], dtype=np.int64)
    state_arr = np.array([0], dtype=np.int64)
    for _ in range(3):
        ref_v, ref_a = ray.put(state_v), ray.put(state_arr)

        def expand(t: pa.Table) -> pa.Table:
            sv, sa = ray.get(ref_v), ray.get(ref_a)
            src = t["src"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(sv, src)
            hit = pos < len(sv)
            hit[hit] = sv[pos[hit]] == src[hit]
            te = t["t"].to_numpy(zero_copy_only=False)
            ok = hit & (te >= np.where(hit, sa[np.minimum(
                pos, len(sa) - 1)], 0))
            if not ok.any():
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "arr": pa.array([], pa.int64())})
            g = pd.DataFrame({
                "dst": t["dst"].to_numpy(zero_copy_only=False)[ok],
                "arr": te[ok]}).groupby("dst", sort=False) \
                .min().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Min
        new = relational.ds_to_table(
            edges_materialized.map_batches(expand,
                                           batch_format="pyarrow")
            .groupby("dst").aggregate(Min("arr", alias_name="arr"))
        ).to_pandas()
        # MIN-merge new arrivals into the (nodes-bounded) state
        merged = pd.DataFrame({"v": state_v, "arr": state_arr})
        merged = pd.concat([merged, new.rename(
            columns={"dst": "v"})], ignore_index=True) \
            .groupby("v")["arr"].min().reset_index() \
            .sort_values("v")
        state_v = merged["v"].to_numpy(np.int64)
        state_arr = merged["arr"].to_numpy(np.int64)
    hist = pd.DataFrame({"arr": state_arr}).groupby("arr") \
        .size().rename("n_nodes").reset_index()
    return hist.astype({"arr": np.int64, "n_nodes": np.int64})


def _sql_temporal_reach() -> str:
    body = ["a0 AS (SELECT CAST(0 AS BIGINT) AS v,"
            " CAST(0 AS BIGINT) AS arr)"]
    for r in range(1, 4):
        body.append(
            f"e{r} AS (SELECT e.dst AS v, MIN(e.t) AS arr\n"
            f"       FROM edges e JOIN a{r-1} s ON s.v = e.src"
            f" AND e.t >= s.arr GROUP BY 1)")
        body.append(
            f"a{r} AS (SELECT v, MIN(arr) AS arr FROM (\n"
            f"         SELECT v, arr FROM a{r-1}\n"
            f"         UNION ALL SELECT v, arr FROM e{r})"
            f" GROUP BY v)")
    chain = ",\n".join(body)
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst,
         (d.doc_id + k.k) % 30 AS t
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
{chain}
SELECT arr, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM a3 GROUP BY 1 ORDER BY 1
"""


def q_source_cosine_similarity(sf_dir: str):
    """Pairwise cosine similarity between sources' unigram count
    vectors — the corpus-mixture diagnostic (which crawls duplicate
    each other?).  All cross terms stay EXACT INTEGERS: one
    (source, word) count reduce, then a WORD-bucket shuffle where each
    bucket's local sources×words pivot contributes an integer partial
    Gram matrix; the 190 pair dots and the per-source norms fold
    exactly, and the cosine is one mirrored float expression per
    pair."""
    from ray.data.aggregate import Sum

    from ..stages.relational import stable_bucket

    docs = _read(sf_dir, "documents", ["source", "text"])

    def wc(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], pattern=" ")
        n = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False),
                        n)
        g = pd.DataFrame({"source": src,
                          "w": pc.list_flatten(parts).to_numpy(
                              zero_copy_only=False), "n": 1}) \
            .groupby(["source", "w"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = docs.map_batches(wc, batch_format="pyarrow") \
        .groupby(["source", "w"]).aggregate(Sum("n", alias_name="n"))

    def tag(t: pa.Table) -> pa.Table:
        b = stable_bucket(t["w"], 64)
        return t.append_column("_bucket", pa.array(b))

    def gram(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.pivot_table(index="w", columns="source", values="n",
                            aggfunc="sum", fill_value=0)
        m = piv.to_numpy(dtype=np.int64)
        gram = m.T @ m                      # sources × sources ints
        srcs = list(piv.columns)
        rows = []
        for i, a in enumerate(srcs):
            for j, b in enumerate(srcs):
                if a <= b:
                    rows.append({"s1": a, "s2": b,
                                 "dot": int(gram[i, j])})
        return pd.DataFrame(rows)

    parts = relational.ds_to_table(
        counts.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(gram, batch_format="pandas")
        .groupby(["s1", "s2"]).aggregate(Sum("dot",
                                             alias_name="dot"))
    ).to_pandas()
    norms = {r.s1: int(r.dot) for r in parts.itertuples()
             if r.s1 == r.s2}
    # drop zero dots: the twin's inner join on shared words only
    # emits pairs with ≥1 common word, so a bucket-co-residency row
    # whose partials folded to 0 must not survive here either
    out = parts[(parts["s1"] < parts["s2"])
                & (parts["dot"] > 0)].copy() \
        .sort_values(["s1", "s2"]).reset_index(drop=True)
    out["cosine"] = [
        np.round(float(d) / (np.sqrt(float(norms[a]))
                             * np.sqrt(float(norms[b]))), 6)
        for a, b, d in zip(out["s1"], out["s2"], out["dot"])]
    return out.astype({"dot": np.int64})


SQL_SOURCE_COSINE = """
WITH wc AS (SELECT source, w, CAST(COUNT(*) AS HUGEINT) AS n
            FROM (SELECT source,
                         unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY 1, 2),
dots AS (SELECT a.source AS s1, b.source AS s2,
                SUM(a.n * b.n) AS dot
         FROM wc a JOIN wc b ON a.w = b.w AND a.source < b.source
         GROUP BY 1, 2),
norms AS (SELECT source, SUM(n * n) AS ss FROM wc GROUP BY 1)
SELECT d.s1, d.s2, CAST(d.dot AS BIGINT) AS dot,
       ROUND(CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.ss AS DOUBLE))
                * sqrt(CAST(nb.ss AS DOUBLE))), 6) AS cosine
FROM dots d JOIN norms na ON na.source = d.s1
            JOIN norms nb ON nb.source = d.s2
ORDER BY 1, 2
"""


def _shingle_set_u64(t: str, k: int = 5) -> np.ndarray:
    """Sorted unique u64 hashes of the character k-grams (the same
    codepoint polynomial fold the jaccard kernel uses — equality to a
    string-shingle oracle holds up to a 2⁻⁶⁴ collision)."""
    b = np.frombuffer(t.encode("utf-32-le"),
                      dtype=np.uint32).astype(np.uint64)
    if len(b) < k:
        return np.unique(dd.word_hashes_u64([t]))
    n = len(b) - k + 1
    hs = np.zeros(n, dtype=np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for j in range(k):
            hs = hs * prime + b[j:j + n]
    return np.unique(hs)


def q_containment_pairs_sampled(sf_dir: str):
    """Asymmetric set CONTAINMENT |A∩B|/|A| over the deterministic
    pair sample (i ↔ i+250) — the quote/excerpt detector symmetric
    Jaccard misses: a short doc fully embedded in a long one scores
    containment 1.0 but Jaccard ≈ |A|/|B|.  Candidate texts (exactly
    doc_ids < 500, pruned AT THE READ) broadcast once; shingle sets
    are the shared codepoint polynomial; intersection and both sizes
    stay exact ints with the two directed ratios as the mirrored
    divisions."""
    import pyarrow.dataset as pads

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 filter=pads.field("doc_id") < 500)
    texts = relational.ds_to_table(docs)
    tref = ray.put(texts)
    pairs = docs.filter(expr="doc_id < 250").map_batches(
        lambda t: pa.table({"a": t["doc_id"],
                            "b": pc.add(t["doc_id"], 250)}),
        batch_format="pyarrow")
    _idx: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        state = _idx.get("t")
        if state is None:
            tbl = ray.get(tref)
            state = _idx["t"] = (
                {k: i for i, k in enumerate(
                    tbl["doc_id"].to_pylist())}, tbl["text"])
        pos, txt = state
        rows = []
        for a, b in zip(batch["a"].to_pylist(),
                        batch["b"].to_pylist()):
            sa = _shingle_set_u64(txt[pos[a]].as_py())
            sb = _shingle_set_u64(txt[pos[b]].as_py())
            ni = int(np.intersect1d(sa, sb,
                                    assume_unique=True).size)
            rows.append({"a": a, "b": b, "ni": ni,
                         "na": int(sa.size), "nb": int(sb.size)})
        df = pd.DataFrame(rows)
        df["c_ab"] = np.round(df["ni"] / df["na"], 4)
        df["c_ba"] = np.round(df["ni"] / df["nb"], 4)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = relational.ds_to_table(
        pairs.map_batches(score, batch_format="pyarrow")
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return out.astype({"a": np.int64, "b": np.int64, "ni": np.int64,
                       "na": np.int64, "nb": np.int64})


SQL_CONTAINMENT = """
WITH pairs AS (
  SELECT doc_id AS a, doc_id + 250 AS b FROM documents
  WHERE doc_id < 250),
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, GREATEST(length(text) - 4,
                                                  1))) AS i
        FROM documents WHERE doc_id < 500)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, CAST(COUNT(*) AS BIGINT) AS ni
  FROM pairs p JOIN sh x ON x.doc_id = p.a
               JOIN sh y ON y.doc_id = p.b AND y.g = x.g
  GROUP BY 1, 2)
SELECT p.a, p.b, COALESCE(i.ni, 0) AS ni, sa.n AS na, sb.n AS nb,
       ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE) / sa.n, 4) AS c_ab,
       ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE) / sb.n, 4) AS c_ba
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.a
JOIN sizes sb ON sb.doc_id = p.b
LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
ORDER BY 1, 2
"""


def q_length_percentile_by_source(sf_dir: str):
    """Mean GLOBAL length percentile per source — the drift detector
    that catches a crawl whose documents sit systematically high or
    low in the corpus length distribution.  percent_rank's numerator
    (RANK − 1 = docs strictly shorter) is an exact integer, so the
    per-source sums fold exactly from one (source × distinct-length)
    bounded count reduce + the global value histogram; the mean is
    ONE mirrored division per source."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "len": t["n_chars"].to_numpy(zero_copy_only=False),
            "n": 1}).groupby(["source", "len"], sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "len"]).aggregate(Sum("n",
                                                  alias_name="n"))
    ).to_pandas()
    glob = cnt.groupby("len")["n"].sum().sort_index()
    below = glob.cumsum().shift(1, fill_value=0)   # strictly shorter
    N = int(glob.sum())
    cnt["rb"] = cnt["len"].map(below).astype(np.int64) * cnt["n"]
    out = cnt.groupby("source") \
        .agg(n_docs=("n", "sum"), sum_rank_below=("rb", "sum")) \
        .reset_index().sort_values("source").reset_index(drop=True)
    out["mean_pct"] = np.round(
        out["sum_rank_below"].astype(np.float64)
        / (out["n_docs"].astype(np.float64) * (N - 1)), 6)
    return out.astype({"n_docs": np.int64,
                       "sum_rank_below": np.int64})


SQL_LENGTH_PCT = """
WITH r AS (SELECT source,
                  RANK() OVER (ORDER BY n_chars) - 1 AS rb
           FROM documents),
nn AS (SELECT COUNT(*) AS n FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(rb) AS BIGINT) AS sum_rank_below,
       ROUND(CAST(SUM(rb) AS DOUBLE) / (COUNT(*) * (nn.n - 1)), 6)
         AS mean_pct
FROM r, nn GROUP BY source, nn.n ORDER BY source
"""


def q_lorenz_deciles_nation(sf_dir: str):
    """Lorenz concentration deciles per nation: customers ranked by
    order revenue (ties by custkey), split with SQL NTILE's
    front-loaded-remainder rule (first n%10 deciles take the extra
    row — the arithmetic pinned by the RFM op), exact cents per
    decile, share = the one mirrored division.  One bucketed
    orders⋈customer join with per-bucket custkey pre-aggregation,
    then a nation-bucket shuffle where each nation's decile split is
    a single vectorized sort."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: pa.table({
            "o_custkey": t["c_custkey"],
            "nation": t["c_nationkey"].cast(pa.int64())}),
            batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def combine(t: pa.Table) -> pa.Table:
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"ck": t["o_custkey"].to_numpy(
            zero_copy_only=False), "nation": t["nation"].to_numpy(
            zero_copy_only=False), "cents": cents}) \
            .groupby(["ck", "nation"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rc = relational.bucketed_hash_join(orders, cust, on="o_custkey",
                                       combine=combine) \
        .groupby(["ck", "nation"]).aggregate(Sum("cents",
                                                 alias_name="cents"))

    def deciles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "ck"]).reset_index(drop=True)
        n = len(g)
        q, r = divmod(n, 10)
        sizes = [q + 1] * r + [q] * (10 - r)   # NTILE front-loading
        dec = np.repeat(np.arange(1, 11), sizes)
        tot = int(g["cents"].sum())
        out = g.assign(decile=dec).groupby("decile") \
            .agg(n_cust=("ck", "size"), cents=("cents", "sum")) \
            .reset_index()
        out = out[out["n_cust"] > 0]
        out["nation"] = int(g["nation"].iloc[0])
        out["share"] = np.round(
            out["cents"].astype(np.float64) / float(tot), 6)
        return out[["nation", "decile", "n_cust", "cents", "share"]]

    out = relational.ds_to_table(
        rc.groupby("nation").map_groups(deciles,
                                        batch_format="pandas")
    ).to_pandas().sort_values(["nation", "decile"]) \
        .reset_index(drop=True)
    return out.astype({"nation": np.int64, "decile": np.int64,
                       "n_cust": np.int64, "cents": np.int64})


SQL_LORENZ = """
WITH rc AS (SELECT o_custkey AS ck,
                   CAST(c_nationkey AS BIGINT) AS nation,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2),
d AS (SELECT nation, cents,
             NTILE(10) OVER (PARTITION BY nation
                             ORDER BY cents, ck) AS decile
      FROM rc),
t AS (SELECT nation, SUM(cents) AS tot FROM rc GROUP BY 1)
SELECT d.nation, CAST(d.decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(d.cents) AS BIGINT) AS cents,
       ROUND(CAST(SUM(d.cents) AS DOUBLE) / t.tot, 6) AS share
FROM d JOIN t USING (nation) GROUP BY 1, 2, t.tot ORDER BY 1, 2
"""


def q_wasserstein_length_drift(sf_dir: str):
    """Exact Wasserstein-1 (earth-mover) distance between each
    source's document-length distribution and the REST of the corpus
    — the drift metric that, unlike KS (sup of CDF gap) or PSI
    (binned), integrates the WHOLE CDF gap and so catches broad
    small shifts.  One (source × distinct-length)-bounded count
    reduce; the finish runs on the tiny histogram with ARBITRARY
    PRECISION ints: W1·n_s·n_r = Σ_v |cum_s(v)·n_r − cum_r(v)·n_s|
    ·gap(v), so the one mirrored division per source is the only
    float (the SQL twin folds the same identity in HUGEINT)."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "len": t["n_chars"].to_numpy(zero_copy_only=False),
            "n": 1}).groupby(["source", "len"], sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "len"]).aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    sup = np.sort(cnt["len"].unique())          # global union support
    gap = np.diff(sup).astype(object)           # python-int gaps
    glob = cnt.groupby("len")["n"].sum().reindex(sup, fill_value=0)
    cum_g = glob.cumsum().to_numpy(dtype=np.int64).astype(object)
    N = int(glob.sum())
    rows = []
    for src, g in cnt.groupby("source"):
        ns = int(g["n"].sum())
        nr = N - ns
        if nr == 0:                  # single-source corpus: no "rest"
            continue
        cs = g.set_index("len")["n"].reindex(sup, fill_value=0) \
            .cumsum().to_numpy(dtype=np.int64).astype(object)
        cr = cum_g - cs
        scaled = int(np.sum(np.abs(cs[:-1] * nr - cr[:-1] * ns)
                            * gap))             # exact, unbounded ints
        rows.append({"source": src, "n_docs": ns, "scaled": scaled,
                     "w1": round(scaled / (ns * nr), 6)})
    out = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    return out.astype({"n_docs": np.int64, "scaled": np.int64})


SQL_WASSERSTEIN = """
WITH c AS (SELECT source, n_chars AS len, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
g AS (SELECT len, SUM(n) AS n FROM c GROUP BY 1),
nn AS (SELECT SUM(n) AS n FROM g),
s AS (SELECT source, SUM(n) AS ns FROM c GROUP BY 1),
sup AS (SELECT s.source, s.ns, g.len, COALESCE(c.n, 0) AS cs_at,
               g.n AS cg_at
        FROM s CROSS JOIN g
        LEFT JOIN c ON c.source = s.source AND c.len = g.len),
cum AS (SELECT source, ns, len,
               SUM(cs_at) OVER (PARTITION BY source ORDER BY len) AS cs,
               SUM(cg_at) OVER (PARTITION BY source ORDER BY len) AS cg,
               LEAD(len) OVER (PARTITION BY source ORDER BY len) AS nxt
        FROM sup)
SELECT source, CAST(ns AS BIGINT) AS n_docs,
       CAST(SUM(ABS(CAST(cs AS HUGEINT) * (nn.n - ns)
                    - CAST(cg - cs AS HUGEINT) * ns)
                * (nxt - len)) AS BIGINT) AS scaled,
       ROUND(CAST(SUM(ABS(CAST(cs AS HUGEINT) * (nn.n - ns)
                          - CAST(cg - cs AS HUGEINT) * ns)
                      * (nxt - len)) AS DOUBLE)
             / (ns * (nn.n - ns)), 6) AS w1
FROM cum, nn
WHERE nxt IS NOT NULL AND ns < nn.n
GROUP BY source, ns, nn.n
ORDER BY source
"""


def q_powerlaw_alpha_links(sf_dir: str):
    """Continuous-approximation MLE of the power-law exponent of the
    link graph's in-degree distribution (Clauset-Shalizi-Newman with
    x_min = 1): α = 1 + N / Σ_d c_d·ln(d/0.5).  The fold runs over
    the DEGREE HISTOGRAM (bounded by max in-degree, not node count) —
    counts exact from the shared two-stage degree reduce, per-degree
    ln terms mirrored against the SQL text, division the one float
    finish (the mutual-info convention)."""
    h = relational.ds_to_table(
        q_degree_histogram_links(sf_dir)).to_pandas()
    deg = h["deg"].to_numpy(dtype=np.int64)
    nc = h["n_nodes"].to_numpy(dtype=np.int64)
    N = int(nc.sum())
    s = float(np.sum(nc.astype(np.float64) * np.log(2.0 * deg)))
    return pd.DataFrame([{
        "n_nodes": N, "max_deg": int(deg.max()),
        "sum_log": np.round(s, 6),
        "alpha": np.round(1.0 + N / s, 6)}]) \
        .astype({"n_nodes": np.int64, "max_deg": np.int64})


SQL_POWERLAW_ALPHA = """
WITH nn AS (SELECT COUNT(*) AS cnt FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 7919 + k * 104729) % cnt AS dst
  FROM documents, nn, (SELECT unnest([1, 2, 3]) AS k) t),
indeg AS (SELECT dst, COUNT(*) AS deg FROM e GROUP BY dst),
h AS (SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM indeg GROUP BY deg),
t AS (SELECT SUM(n_nodes) AS n, MAX(deg) AS md,
             SUM(n_nodes * LN(2.0 * deg)) AS s FROM h)
SELECT CAST(n AS BIGINT) AS n_nodes, CAST(md AS BIGINT) AS max_deg,
       ROUND(s, 6) AS sum_log, ROUND(1.0 + n / s, 6) AS alpha
FROM t
"""


def q_revenue_recognition_daily(sf_dir: str):
    """Subscription revenue recognition: each order's cents spread
    over a (o_orderkey % 14 + 1)-day term starting at o_orderdate,
    integer-exactly — base quota cents//span per day, the remainder
    cents%span allocated +1 to the EARLIEST days (largest-remainder).
    NEVER an order×day explode: the allocation decomposes into TWO
    ±delta sweeps (quota ±q at the term edges, remainder ±1 over the
    first r days), so each order emits ≤4 delta rows regardless of
    term length and the running totals finish on the days-bounded
    change table.  Output = the step function at its change days."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderdate"])

    def deltas(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        span = okey % 14 + 1
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        d0 = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        q, r = cents // span, cents % span
        rm = r > 0
        day = np.concatenate([d0, d0 + span, d0[rm], (d0 + r)[rm]])
        dc = np.concatenate([q, -q, np.ones(rm.sum(), np.int64),
                             -np.ones(rm.sum(), np.int64)])
        dn = np.concatenate([np.ones(len(d0), np.int64),
                             -np.ones(len(d0), np.int64),
                             np.zeros(rm.sum(), np.int64),
                             np.zeros(rm.sum(), np.int64)])
        g = pd.DataFrame({"day": day, "dc": dc, "dn": dn}) \
            .groupby("day", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    red = relational.ds_to_table(
        orders.map_batches(deltas, batch_format="pyarrow")
        .groupby("day").aggregate(Sum("dc", alias_name="dc"),
                                  Sum("dn", alias_name="dn"))
    ).to_pandas().sort_values("day").reset_index(drop=True)
    return pd.DataFrame({
        "day": red["day"].to_numpy(dtype=np.int64)
        .astype("datetime64[D]").astype("datetime64[us]"),
        "cents_per_day": red["dc"].cumsum().to_numpy(dtype=np.int64),
        "n_active": red["dn"].cumsum().to_numpy(dtype=np.int64)})


SQL_REVENUE_RECOGNITION = """
WITH o AS (SELECT o_orderkey % 14 + 1 AS span,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(o_orderdate AS DATE) AS d0
           FROM orders),
p AS (SELECT d0, CAST(span AS INT) AS span,
             cents // span AS q, cents % span AS r FROM o),
dl AS (
  SELECT d0 AS day, q AS dc, 1 AS dn FROM p
  UNION ALL SELECT d0 + span, -q, -1 FROM p
  UNION ALL SELECT d0, 1, 0 FROM p WHERE r > 0
  UNION ALL SELECT d0 + CAST(r AS INT), -1, 0 FROM p WHERE r > 0),
g AS (SELECT day, SUM(dc) AS dc, SUM(dn) AS dn FROM dl GROUP BY 1)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(SUM(dc) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cents_per_day,
       CAST(SUM(dn) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS n_active
FROM g ORDER BY day
"""


def q_brier_decomposition(sf_dir: str):
    """Murphy decomposition of the Brier score for the shared logreg
    document scorer: reliability (calibration gap), resolution
    (discrimination) and uncertainty over 10 equal-width score bins,
    plus the raw Brier itself.  Every aggregate is EXACT integers —
    6-dp scores make s6 = score·10⁶ an int, so Σ(s6−10⁶·label)², bin
    counts, bin label sums and bin score sums all fold losslessly in
    one bounded (10-bin) reduce; the four metrics finish with per-bin
    float terms mirroring the SQL text (int64 partials bound the safe
    corpus at ~10⁷ docs per run; the twin's HUGEINT has no bound)."""
    from ray.data.aggregate import Sum

    scored = _doc_logreg_scored(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        s6 = np.round(t["score"].to_numpy(zero_copy_only=False)
                      * 1e6).astype(np.int64)
        lbl = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = s6 - 1000000 * lbl
        g = pd.DataFrame({"bin": np.minimum(s6 // 100000, 9),
                          "n": 1, "l": lbl, "ss": s6, "sq": d * d}) \
            .groupby("bin", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    b = relational.ds_to_table(
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("bin").aggregate(Sum("n", alias_name="n"),
                                  Sum("l", alias_name="l"),
                                  Sum("ss", alias_name="ss"),
                                  Sum("sq", alias_name="sq"))
    ).to_pandas()
    N, L = int(b["n"].sum()), int(b["l"].sum())
    brier = sum(float(v) for v in b["sq"]) / (1e12 * N)
    rel = sum(float(int(r.ss) - 1000000 * int(r.l))
              * (int(r.ss) - 1000000 * int(r.l)) / (1e12 * int(r.n))
              for r in b.itertuples()) / N
    res = sum(float(int(r.l) * N - L * int(r.n))
              * (int(r.l) * N - L * int(r.n)) / int(r.n)
              for r in b.itertuples()) / (float(N) * N * N)
    unc = float(L) * (N - L) / (float(N) * N)
    return pd.DataFrame([{
        "n": N, "n_pos": L, "brier": np.round(brier, 6),
        "reliability": np.round(rel, 6),
        "resolution": np.round(res, 6),
        "uncertainty": np.round(unc, 6)}]) \
        .astype({"n": np.int64, "n_pos": np.int64})


SQL_BRIER = """
WITH f AS (
  SELECT n_chars / 1000.0 AS x1,
         len(string_split(text, ' ')) / 100.0 AS x2,
         CASE WHEN n_chars > 297 THEN 1 ELSE 0 END AS label
  FROM documents),
s AS (SELECT CAST(ROUND(1.0 / (1.0 + exp(-(0.25 + 0.8 * x1 - 0.5 * x2)))
                        * 1000000) AS BIGINT) AS s6,
             CAST(label AS BIGINT) AS label FROM f),
b AS (SELECT LEAST(s6 // 100000, 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS l,
             CAST(SUM(s6) AS BIGINT) AS ss,
             SUM(CAST(s6 - 1000000 * label AS HUGEINT)
                 * (s6 - 1000000 * label)) AS sq
      FROM s GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(l) AS BIGINT) AS ll FROM b)
SELECT t.nn AS n, t.ll AS n_pos,
       ROUND(CAST(SUM(sq) AS DOUBLE) / (1e12 * t.nn), 6) AS brier,
       ROUND(SUM(CAST(ss - 1000000 * l AS DOUBLE)
                 * (ss - 1000000 * l) / (1e12 * n)) / t.nn, 6)
         AS reliability,
       ROUND(SUM(CAST(l * t.nn - t.ll * n AS DOUBLE)
                 * (l * t.nn - t.ll * n) / n)
             / (CAST(t.nn AS DOUBLE) * t.nn * t.nn), 6) AS resolution,
       ROUND(CAST(t.ll AS DOUBLE) * (t.nn - t.ll)
             / (CAST(t.nn AS DOUBLE) * t.nn), 6) AS uncertainty
FROM b, t GROUP BY t.nn, t.ll
"""


def q_sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood record linkage over the clean∪dirty part
    catalog — THE alternative blocking strategy to SymSpell deletion
    variants: sort everything by name, compare only records within a
    sliding rank window (w = 4 ⇒ rank gaps 1–3), verify with the
    shared vectorized Levenshtein.  Distribution: range-partition by
    the 2-char sort-key prefix (prefix order IS global name order),
    window pairs emitted per partition; pairs that CROSS a partition
    edge involve only each partition's first/last 3 rows, so those
    strips (plus exact partition sizes for global-rank reconstruction)
    stitch on the driver — partitions-bounded, never corpus-bounded."""
    from ..stages import fuzzy

    W = 3                                     # max rank gap
    clean, dirty = _fuzzy_sides(sf_dir)

    def pfx(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pfx", pc.utf8_slice_codeunits(t["nm"], 0, 2))

    grouped = clean.union(dirty) \
        .map_batches(pfx, batch_format="pyarrow").groupby("_pfx")

    def window_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["nm", "id"]).reset_index(drop=True)
        ids = g["id"].to_numpy(np.int64)
        nms = g["nm"].tolist()
        a, b, d = [], [], []
        for gap in range(1, W + 1):
            if len(g) <= gap:
                break
            dist = fuzzy.batch_edit_distance(nms[:-gap], nms[gap:])
            ok = dist <= 1
            a.append(ids[:-gap][ok])
            b.append(ids[gap:][ok])
            d.append(dist[ok].astype(np.int64))
        if not a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.int64)})
        aa, bb = np.concatenate(a), np.concatenate(b)
        return pd.DataFrame({"a": np.minimum(aa, bb),
                             "b": np.maximum(aa, bb),
                             "dist": np.concatenate(d)})

    def strips(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["nm", "id"]).reset_index(drop=True)
        n = len(g)
        keep = sorted(set(range(min(W, n)))
                      | set(range(max(0, n - W), n)))
        return pd.DataFrame({
            "pfx": g["_pfx"].iloc[keep].to_numpy(),
            "id": g["id"].iloc[keep].to_numpy(np.int64),
            "nm": g["nm"].iloc[keep].to_numpy(),
            "rk": np.asarray(keep, dtype=np.int64),
            "bn": np.full(len(keep), n, dtype=np.int64)})

    inner = grouped.map_groups(window_pairs, batch_format="pandas")
    st = relational.ds_to_table(
        grouped.map_groups(strips, batch_format="pandas")).to_pandas()
    # reconstruct global ranks: offsets = prefix-ordered partition sizes
    sizes = st.groupby("pfx")["bn"].first().sort_index()
    offs = sizes.cumsum().shift(1, fill_value=0)
    st["grk"] = st["pfx"].map(offs).astype(np.int64) + st["rk"]
    st = st.sort_values("grk").reset_index(drop=True)
    cross = []
    for gap in range(1, W + 1):
        if len(st) <= gap:
            break
        lo, hi = st.iloc[:-gap], st.iloc[gap:]
        m = ((hi["grk"].to_numpy() - lo["grk"].to_numpy() == gap)
             & (hi["pfx"].to_numpy() != lo["pfx"].to_numpy()))
        if not m.any():
            continue
        from ..stages import fuzzy as _f
        dist = _f.batch_edit_distance(
            lo["nm"].to_numpy()[m].tolist(),
            hi["nm"].to_numpy()[m].tolist())
        ok = dist <= 1
        la = lo["id"].to_numpy(np.int64)[m][ok]
        lb = hi["id"].to_numpy(np.int64)[m][ok]
        cross.append(pd.DataFrame({"a": np.minimum(la, lb),
                                   "b": np.maximum(la, lb),
                                   "dist": dist[ok].astype(np.int64)}))
    out = pd.concat([relational.ds_to_table(inner).to_pandas()]
                    + cross, ignore_index=True) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    return out.astype({"a": np.int64, "b": np.int64,
                       "dist": np.int64})


SQL_SNM_PAIRS = SQL_FUZZY_BASE + """,
u AS (SELECT id, nm FROM clean UNION ALL SELECT id, nm FROM dirty),
r AS (SELECT id, nm, ROW_NUMBER() OVER (ORDER BY nm, id) AS rn FROM u),
cand AS (
  SELECT r1.id AS ia, r2.id AS ib, r1.nm AS na, r2.nm AS nb
  FROM r r1 JOIN r r2 ON r2.rn - r1.rn BETWEEN 1 AND 3)
SELECT LEAST(ia, ib) AS a, GREATEST(ia, ib) AS b,
       CAST(levenshtein(na, nb) AS BIGINT) AS dist
FROM cand WHERE levenshtein(na, nb) <= 1 ORDER BY 1, 2
"""


def q_interp_impute_value(sf_dir: str):
    """Linear-interpolation imputation — the gap repair LOCF can't do
    honestly on trending series: each 'error' event (value treated as
    NULL) takes vp + (vn−vp)·(t−tp)/(tn−tp) between the user's nearest
    non-null neighbours under composite (ts, event_id) order; edge
    nulls (no neighbour on one side) stay unfilled.  One user-bucket
    shuffle, vectorized ffill/bfill of value AND timestamp per bucket;
    interpolated values quantize to integer micro-units so the
    per-user sums fold exactly (the only floats are the mirrored
    per-row interpolation expression and its ROUND)."""
    from ..stages.relational import stable_bucket

    ev = _read(sf_dir, "events", ["ts", "event_id", "user_id",
                                  "event_type", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["user_id"], 64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "ts": ts,
            "eid": g["event_id"].to_numpy(np.int64),
            "v": np.where(g["event_type"].to_numpy() == "error",
                          np.nan, g["value"].to_numpy(np.float64))}) \
            .sort_values(["u", "ts", "eid"]).reset_index(drop=True)
        df["tsv"] = np.where(df["v"].notna(), df["ts"].astype(
            np.float64), np.nan)
        gb = df.groupby("u", sort=False)
        vp, tp = gb["v"].ffill(), gb["tsv"].ffill()
        vn, tn = gb["v"].bfill(), gb["tsv"].bfill()
        isnull = df["v"].isna()
        can = isnull & vp.notna() & vn.notna()
        t, tpv, tnv = (df["ts"].to_numpy(np.float64),
                       tp.to_numpy(), tn.to_numpy())
        with np.errstate(invalid="ignore", divide="ignore"):
            vi = np.where(tnv == tpv, vp.to_numpy(),
                          vp.to_numpy() + (vn.to_numpy() - vp.to_numpy())
                          * (t - tpv) / (tnv - tpv))
        i6 = np.where(can, np.round(np.where(can, vi, 0.0) * 1e6),
                      0.0).astype(np.int64)
        out = pd.DataFrame({
            "user_id": df["u"], "nn": isnull.astype(np.int64),
            "ni": can.astype(np.int64), "i6": i6}) \
            .groupby("user_id", sort=False) \
            .agg(n_null=("nn", "sum"), n_interp=("ni", "sum"),
                 interp_sum6=("i6", "sum")).reset_index()
        return out

    out = relational.ds_to_table(
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket").map_groups(per_bucket,
                                       batch_format="pandas")
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    return out.astype({"user_id": np.int64, "n_null": np.int64,
                       "n_interp": np.int64, "interp_sum6": np.int64})


SQL_INTERP_IMPUTE = """
WITH e AS (SELECT user_id, ts, event_id,
                  CASE WHEN event_type = 'error' THEN NULL
                       ELSE value END AS v
           FROM events),
w AS (SELECT user_id, ts, v,
             LAST_VALUE(v IGNORE NULLS) OVER win AS vp,
             LAST_VALUE(CASE WHEN v IS NOT NULL
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER win AS tp,
             FIRST_VALUE(v IGNORE NULLS) OVER winf AS vn,
             FIRST_VALUE(CASE WHEN v IS NOT NULL
                              THEN epoch_us(ts) END IGNORE NULLS)
               OVER winf AS tn
      FROM e
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING),
             winf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 1 FOLLOWING
                               AND UNBOUNDED FOLLOWING)),
i AS (SELECT user_id,
             CASE WHEN v IS NULL THEN 1 ELSE 0 END AS isn,
             CASE WHEN v IS NULL AND vp IS NOT NULL
                       AND vn IS NOT NULL THEN 1 ELSE 0 END AS isi,
             CASE WHEN v IS NULL AND vp IS NOT NULL
                       AND vn IS NOT NULL THEN
               CAST(ROUND((CASE WHEN tn = tp THEN vp
                           ELSE vp + (vn - vp) * (epoch_us(ts) - tp)
                                / (tn - tp) END) * 1000000) AS BIGINT)
             ELSE 0 END AS i6
      FROM w)
SELECT user_id, CAST(SUM(isn) AS BIGINT) AS n_null,
       CAST(SUM(isi) AS BIGINT) AS n_interp,
       CAST(SUM(i6) AS BIGINT) AS interp_sum6
FROM i GROUP BY 1 ORDER BY 1
"""


def q_source_set_cover(sf_dir: str):
    """Greedy weighted set cover: which 5 crawl sources cover the most
    vocabulary — the data-curation question behind 'which feeds can we
    drop'.  One corpus pass builds distinct (source, word) pairs; the
    word-bucket fold packs each word's source set into a ≤2²⁰ BITMASK
    (Σ 2^idx over distinct sources = OR), and the mask HISTOGRAM — the
    only thing the driver sees — is bounded by distinct masks, never
    vocabulary.  The 5 greedy rounds then run vectorized on that tiny
    table with exact integer coverage counts; ties break to the
    lexicographically first source on BOTH sides.  The twin unrolls
    the same 5 rounds as chained scalar-subquery CTEs."""
    from ray.data.aggregate import Count, Sum

    docs = _read(sf_dir, "documents", ["source", "text"])

    def pw(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], pattern=" ")
        n = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "source": np.repeat(
                t["source"].to_numpy(zero_copy_only=False), n),
            "w": pc.list_flatten(parts).to_numpy(
                zero_copy_only=False)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = docs.map_batches(pw, batch_format="pyarrow") \
        .groupby(["source", "w"]).aggregate(Count()) \
        .select_columns(["source", "w"]).materialize()
    srcs = sorted(
        relational.ds_to_table(
            pairs.map_batches(
                lambda t: pa.table({"source": pc.unique(t["source"])}),
                batch_format="pyarrow")
            .groupby("source").aggregate(Count())
        )["source"].to_pylist())
    idx_of = {s: i for i, s in enumerate(srcs)}

    def bits(t: pa.Table) -> pa.Table:
        b = np.array([1 << idx_of[s]
                      for s in t["source"].to_pylist()],
                     dtype=np.int64)
        return pa.table({"w": t["w"], "bit": pa.array(b)})

    def mask_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"mask": t["sum(bit)"].to_numpy(
            zero_copy_only=False).astype(np.int64), "c": 1}) \
            .groupby("mask", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    mh = relational.ds_to_table(
        pairs.map_batches(bits, batch_format="pyarrow")
        .groupby("w").aggregate(Sum("bit"))
        .map_batches(mask_partial, batch_format="pyarrow")
        .groupby("mask").aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    masks = mh["mask"].to_numpy(np.int64)
    cnts = mh["c"].to_numpy(np.int64)
    cov, cum, rows = 0, 0, []
    for rnd in range(1, min(5, len(srcs)) + 1):
        uncovered = (masks & cov) == 0
        inc = np.array([
            int(cnts[uncovered & ((masks >> j) & 1 == 1)].sum())
            if not (cov >> j) & 1 else -1
            for j in range(len(srcs))], dtype=np.int64)
        pick = int(np.argmax(inc))          # first max = smallest idx
        cum += int(inc[pick])
        rows.append({"round": rnd, "source": srcs[pick],
                     "new_words": int(inc[pick]), "cum_words": cum})
        cov |= 1 << pick
    return pd.DataFrame(rows).astype({
        "round": np.int64, "new_words": np.int64,
        "cum_words": np.int64})


def _sql_setcover_rounds(k: int = 5) -> str:
    """Unrolled greedy set-cover twin: round r's incremental coverage
    conditions on the scalar covered-mask CTE c{r-1} (picked sources
    excluded via their own bit), mirroring the Ray argmax tie rule
    with ORDER BY inc DESC, idx."""
    parts = ["""WITH pw AS (
  SELECT DISTINCT source, w
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents)),
si AS (SELECT source,
              CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT)
                AS idx
       FROM (SELECT DISTINCT source FROM pw)),
wm AS (SELECT w, SUM(CAST(1 AS BIGINT) << idx) AS mask
       FROM pw JOIN si USING (source) GROUP BY w),
mh AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM wm
       GROUP BY mask),
c0 AS (SELECT CAST(0 AS BIGINT) AS m)"""]
    for r in range(1, k + 1):
        parts.append(f""",
g{r} AS (SELECT i.idx,
                SUM(CASE WHEN (mh.mask >> i.idx) & 1 = 1
                          AND (mh.mask & (SELECT m FROM c{r - 1})) = 0
                         THEN mh.c ELSE 0 END) AS inc
         FROM si i CROSS JOIN mh
         WHERE ((SELECT m FROM c{r - 1}) >> i.idx) & 1 = 0
         GROUP BY i.idx),
p{r} AS (SELECT idx, inc FROM g{r} ORDER BY inc DESC, idx LIMIT 1),
c{r} AS (SELECT (SELECT m FROM c{r - 1})
                | (CAST(1 AS BIGINT) << (SELECT idx FROM p{r})) AS m)""")
    union = "\nUNION ALL ".join(
        f"SELECT {r} AS round, idx, inc FROM p{r}"
        for r in range(1, k + 1))
    parts.append(f""",
u AS ({union})
SELECT u.round, si.source, CAST(u.inc AS BIGINT) AS new_words,
       CAST(SUM(u.inc) OVER (ORDER BY u.round
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_words
FROM u JOIN si USING (idx) ORDER BY u.round""")
    return "".join(parts)


def q_seasonal_residual_outliers(sf_dir: str):
    """Seasonality-aware anomaly detection — the production composite
    of the decompose + robust-spread kernels: daily revenue is
    detrended (7-day centered window) and deseasonalized (per-weekday
    mean), then each weekday's residuals are screened with the MAD
    rule dev > 3·1.4826·MAD.  Within a weekday every residual shares
    the denominator 7·cnt, so median/MAD/deviation all evaluate on the
    EXACT integer dt·cnt − num (medians are selections, not sums — no
    float-order hazard); the reported resid is the one mirrored
    division.  Weekdays with MAD = 0 are skipped (the degenerate-MAD
    guard every robust detector needs)."""
    d = _daily_revenue_cents(sf_dir)
    days = d["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[days - lo] = d["rev"].to_numpy(np.int64)
    n = len(dense)
    rows = []
    if n >= 7:
        csum = np.concatenate([[0], np.cumsum(dense)])
        s7 = csum[7:] - csum[:-7]
        centers = np.arange(3, n - 3)
        dt = 7 * dense[centers] - s7
        dow = ((centers + lo) + 3) % 7 + 1
        for w in range(1, 8):
            m = dow == w
            if not m.any():
                continue
            cnt = int(m.sum())
            num = int(dt[m].sum())
            r = dt[m] * cnt - num                 # exact ints
            med = float(np.median(r))
            dev = np.abs(r.astype(np.float64) - med)
            mad = float(np.median(dev))
            if mad == 0.0:
                continue
            out = dev > 4.4478 * mad
            for day_i, rv in zip((centers[m] + lo)[out], r[out]):
                rows.append({
                    "day": np.int64(day_i), "isodow": w,
                    "resid": np.round(float(rv) / (7.0 * cnt), 4)})
    out = pd.DataFrame(rows, columns=["day", "isodow", "resid"]) \
        .sort_values("day").reset_index(drop=True)
    out["day"] = out["day"].to_numpy(dtype=np.int64) \
        .astype("datetime64[D]").astype("datetime64[us]") \
        if len(out) else pd.Series([], dtype="datetime64[us]")
    return out.astype({"isodow": np.int64})


SQL_SEASONAL_OUTLIERS = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
f AS (SELECT cal.day, COALESCE(d.rev, 0) AS x
      FROM cal LEFT JOIN d USING (day)),
w AS (SELECT day, x,
             SUM(x) OVER (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS s7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS c7
      FROM f),
det AS (SELECT day, (day + 3) % 7 + 1 AS isodow, 7 * x - s7 AS dt
        FROM w WHERE c7 = 7),
st AS (SELECT isodow, CAST(COUNT(*) AS BIGINT) AS cnt,
              SUM(dt) AS num
       FROM det GROUP BY 1),
r AS (SELECT det.day, det.isodow, st.cnt,
             CAST(det.dt * st.cnt - st.num AS DOUBLE) AS rv
      FROM det JOIN st USING (isodow)),
m AS (SELECT isodow, MEDIAN(rv) AS med FROM r GROUP BY 1),
dv AS (SELECT r.day, r.isodow, r.cnt, r.rv,
              ABS(r.rv - m.med) AS dev
       FROM r JOIN m USING (isodow)),
md AS (SELECT isodow, MEDIAN(dev) AS mad FROM dv GROUP BY 1)
SELECT CAST(DATE '1970-01-01' + CAST(dv.day AS INT) AS TIMESTAMP)
         AS day,
       CAST(dv.isodow AS BIGINT) AS isodow,
       ROUND(dv.rv / (7.0 * dv.cnt), 4) AS resid
FROM dv JOIN md USING (isodow)
WHERE md.mad > 0 AND dv.dev > 4.4478 * md.mad
ORDER BY 1
"""


def q_anf_effective_diameter(sf_dir: str):
    """Approximate neighborhood function + effective diameter of the
    link graph via HyperBall (per-node 256-register HLL sketches,
    max-merged along edges each round — the linear-memory alternative
    to the O(n·m) exact all-pairs BFS, the algorithm behind every
    published web-graph diameter number).  No SQL oracle: the sketch
    is approximate BY DESIGN; pytest pins each N(h) against the exact
    dense BFS neighborhood function at fixture scale and the
    monotonicity contract."""
    from ..stages import graph_ops

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()
    nodes = docs.map_batches(
        lambda t: pa.table({"v": t["doc_id"].cast(pa.int64())}),
        batch_format="pyarrow")

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        return pa.table({"src": pa.array(src),
                         "dst": pa.array((src * 7919 + k * 104729) % n)})

    totals = graph_ops.hyperball_nf(
        docs.map_batches(edges, batch_format="pyarrow"), nodes,
        rounds=4)
    nf_max = totals[-1]
    eff = next(h for h, t in enumerate(totals) if t >= 0.9 * nf_max)
    return pd.DataFrame([{
        "h": h, "nf": np.round(t, 2),
        "ratio": np.round(t / nf_max, 4),
        "is_effective_diameter": bool(h == eff)}
        for h, t in enumerate(totals)]).astype({"h": np.int64})


def q_mmr_diversified_topk(sf_dir: str):
    """Maximal Marginal Relevance retrieval: pick 5 of the query's
    top-20 cosine neighbours maximizing 0.7·relevance −
    0.3·max-similarity-to-already-picked — the diversified re-ranking
    every RAG pipeline bolts onto raw ANN (raw top-k returns 5 copies
    of the same passage).  Distributed leg: one streaming relevance
    scan against the broadcast query vector with per-batch local
    top-20 prune (exact — any global top-20 row is in its batch's
    top-20); the greedy runs on the 20 survivors.  The twin unrolls
    the same 5 rounds with scalar-subquery MAX over the picked CTEs;
    output is ids only (float cosines stay out of the hash, the ANN
    precedent)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrow = emb.filter(expr="vec_id == 0").take_all()
    qv = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    qn = np.linalg.norm(qv)

    def local_top(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids != 0
        if not keep.any():
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "rel": pa.array([], type=pa.float64()),
                             "embedding": t["embedding"].slice(0, 0)})
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v, k in zip(t["embedding"].to_pylist(), keep)
                      if k])
        ids = ids[keep]
        rel = (m @ qv) / (np.linalg.norm(m, axis=1) * qn)
        order = np.lexsort((ids, -rel))[:20]
        idx_all = np.flatnonzero(keep)[order]
        return pa.table({"vec_id": pa.array(ids[order]),
                         "rel": pa.array(rel[order]),
                         "embedding": t["embedding"].take(
                             pa.array(idx_all))})

    cand = relational.ds_to_table(
        emb.map_batches(local_top, batch_format="pyarrow")).to_pandas()
    cand = cand.sort_values(["rel", "vec_id"],
                            ascending=[False, True]).head(20) \
        .reset_index(drop=True)
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in cand["embedding"]])
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    rel = cand["rel"].to_numpy(np.float64)
    ids = cand["vec_id"].to_numpy(np.int64)
    picked: list[int] = []
    rows = []
    for rnd in range(1, min(5, len(ids)) + 1):   # <5 candidates: the
        if picked:                               # twin emits no row
            sc = 0.7 * rel - 0.3 * sims[:, picked].max(axis=1)
        else:
            sc = rel.copy()
        sc[picked] = -np.inf
        # argmax with vec_id tiebreak = first max in (sc desc, id asc)
        order = np.lexsort((ids, -sc))
        pick = int(order[0])
        picked.append(pick)
        rows.append({"rnk": rnd, "vec_id": int(ids[pick])})
    return pd.DataFrame(rows).astype({"rnk": np.int64,
                                      "vec_id": np.int64})


def _sql_mmr_rounds(k: int = 5) -> str:
    """Unrolled MMR twin: round r scores every unpicked top-20
    candidate 0.7·rel − 0.3·MAX(sim to the picked-so-far union CTE);
    round 1 is pure relevance (the Ray side's empty-picked branch)."""
    parts = ["""WITH q AS (SELECT embedding AS qe FROM embeddings
           WHERE vec_id = 0),
rel AS (SELECT e.vec_id, e.embedding,
               list_cosine_similarity(q.qe, e.embedding) AS rel
        FROM embeddings e, q WHERE e.vec_id <> 0),
top AS (SELECT vec_id, embedding, rel
        FROM (SELECT vec_id, embedding, rel,
                     ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id)
                       AS rn
              FROM rel)
        WHERE rn <= 20),
p1 AS (SELECT vec_id, embedding FROM top
       ORDER BY rel DESC, vec_id LIMIT 1)"""]
    for r in range(2, k + 1):
        union = "\n            UNION ALL ".join(
            f"SELECT vec_id, embedding FROM p{i}"
            for i in range(1, r))
        parts.append(f""",
g{r} AS (SELECT t.vec_id, t.embedding,
                0.7 * t.rel
                - 0.3 * (SELECT MAX(list_cosine_similarity(
                                      t.embedding, pk.embedding))
                         FROM ({union}) pk) AS sc
         FROM top t
         WHERE t.vec_id NOT IN (SELECT vec_id FROM ({union}) px)),
p{r} AS (SELECT vec_id, embedding FROM g{r}
         ORDER BY sc DESC, vec_id LIMIT 1)""")
    union_out = "\nUNION ALL ".join(
        f"SELECT {r} AS rnk, vec_id FROM p{r}" for r in range(1, k + 1))
    parts.append(f"""
SELECT CAST(rnk AS BIGINT) AS rnk, vec_id FROM ({union_out})
ORDER BY rnk""")
    return "".join(parts)


def q_quantile_treatment_effect(sf_dir: str):
    """Quantile treatment effects at P10/P50/P90 of event value
    between the id-parity A/B arms — where the mean-difference test
    (welch/CUPED) hides heterogeneous effects, the quantile deltas
    expose them.  Event values are cents-quantized, so the per-arm
    distribution table is VALUE-DOMAIN-bounded and each quantile is
    the exact (n−1)·q/100 divmod interpolation (the
    grouped-percentile kernel's rule); the deltas are mirrored
    subtractions of the rounded quantiles."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        arm = (t["user_id"].to_numpy(zero_copy_only=False) % 2) \
            .astype(np.int64)
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        g = pd.DataFrame({"arm": arm, "v": cents, "pn": 1}) \
            .groupby(["arm", "v"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    dist = relational.ds_to_table(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["arm", "v"]).aggregate(Sum("pn", alias_name="c"))
    ).to_pandas()
    qs = {}
    for arm, g in dist.groupby("arm"):
        g = g.sort_values("v")
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        v = g["v"].to_numpy(np.int64)
        n = int(cum[-1])
        for k in (10, 50, 90):
            h_lo, rem = divmod((n - 1) * k, 100)
            lo_c = int(v[np.searchsorted(cum, h_lo + 1, side="left")])
            hi_c = lo_c if rem == 0 else \
                int(v[np.searchsorted(cum, h_lo + 2, side="left")])
            qs[(int(arm), k)] = round(
                (lo_c + (rem / 100.0) * (hi_c - lo_c)) / 100.0, 6)
    rows = [{"q": k, "control": qs[(0, k)], "treat": qs[(1, k)],
             "qte": round(qs[(1, k)] - qs[(0, k)], 6)}
            for k in (10, 50, 90)]
    return pd.DataFrame(rows).astype({"q": np.int64})


SQL_QTE = """
WITH e AS (SELECT user_id % 2 AS arm, value FROM events),
p AS (SELECT arm,
             ROUND(quantile_cont(value, 0.10), 6) AS p10,
             ROUND(quantile_cont(value, 0.50), 6) AS p50,
             ROUND(quantile_cont(value, 0.90), 6) AS p90
      FROM e GROUP BY 1),
c AS (SELECT p10, p50, p90 FROM p WHERE arm = 0),
t AS (SELECT p10, p50, p90 FROM p WHERE arm = 1)
SELECT CAST(10 AS BIGINT) AS q, c.p10 AS control, t.p10 AS treat,
       ROUND(t.p10 - c.p10, 6) AS qte FROM c, t
UNION ALL
SELECT CAST(50 AS BIGINT), c.p50, t.p50, ROUND(t.p50 - c.p50, 6)
FROM c, t
UNION ALL
SELECT CAST(90 AS BIGINT), c.p90, t.p90, ROUND(t.p90 - c.p90, 6)
FROM c, t
ORDER BY 1
"""


def q_exact_heavy_hitters(sf_dir: str):
    """Top-10 corpus words by EXACT count at bounded memory — the
    sketch-then-verify pattern: pass 1's Misra-Gries summary (4096
    counters) provably contains every word with frequency >
    N/4097; pass 2 re-counts ONLY the ≤4096 candidates exactly
    (broadcast membership, one more streaming pass), and the
    certificate `provably_complete` = (10th exact count > N/4097)
    turns the approximate sketch into an exact, PROVEN top-k without
    ever shuffling the full vocabulary.  Ties break (count DESC, word
    ASC) on both sides."""
    from ray.data.aggregate import Sum

    from ..stages import sketches

    docs = _read(sf_dir, "documents", ["text"])
    mg = sketches.mg_word_summary(docs, text_col="text",
                                  capacity=4096)
    cand = set(mg["word"].to_pylist())
    cref = ray.put(cand)
    _state: dict = {}

    def recount(t: pa.Table) -> pa.Table:
        cs = _state.get("c")
        if cs is None:
            cs = _state["c"] = ray.get(cref)
        flat = pc.list_flatten(pc.split_pattern(t["text"],
                                                pattern=" "))
        w = flat.to_numpy(zero_copy_only=False)
        total = len(w)
        mask = np.fromiter((x in cs for x in w), np.bool_, total)
        g = pd.DataFrame({"word": w[mask], "n": 1}) \
            .groupby("word", sort=False).sum().reset_index()
        g = pd.concat([g, pd.DataFrame(
            [{"word": "\x00total", "n": total}])], ignore_index=True)
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        docs.map_batches(recount, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    N = int(cnt.loc[cnt["word"] == "\x00total", "n"].iloc[0])
    cnt = cnt[cnt["word"] != "\x00total"]
    top = cnt.sort_values(["n", "word"],
                          ascending=[False, True]).head(10) \
        .reset_index(drop=True)
    proven = bool(float(top["n"].iloc[-1]) > N / 4097.0)
    return pd.DataFrame({
        "rnk": np.arange(1, len(top) + 1, dtype=np.int64),
        "word": top["word"].to_numpy(),
        "cnt": top["n"].to_numpy(np.int64),
        "provably_complete": np.full(len(top), proven)})


SQL_EXACT_HH = """
WITH wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY w),
nn AS (SELECT SUM(c) AS n FROM wc),
top AS (SELECT w, c,
               ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
        FROM wc)
SELECT CAST(rn AS BIGINT) AS rnk, w AS word, c AS cnt,
       (SELECT MIN(c) FROM top WHERE rn <= 10)
         > (SELECT n FROM nn) / 4097.0 AS provably_complete
FROM top WHERE rn <= 10 ORDER BY rn
"""


def q_harmonic_centrality_pivots(sf_dir: str):
    """Harmonic centrality (bounded 3-hop) for 5 pivot nodes: h(p) =
    Σ_{d(p,v)≤3} 1/d — the centrality that, unlike closeness, stays
    well-defined on disconnected graphs.  Per pivot one frontier-only
    BFS (the shared bfs_hops kernel); hop-ring sizes n1/n2/n3 are
    exact ints and the harmonic score is the one mirrored float
    expression n1 + n2/2 + n3/3.  The twin unrolls five 3-round BFS
    chains from the shared generator."""
    import ray.data as rd

    from ..stages import graph_ops

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        return pa.table({"src": pa.array(src),
                         "dst": pa.array((src * 7919 + k * 104729) % n)})

    e = docs.map_batches(edges, batch_format="pyarrow").materialize()
    rows = []
    for p in range(5):
        seeds = rd.from_arrow(pa.table({"v": pa.array([p],
                                                      type=pa.int64())}))
        t = relational.ds_to_table(
            graph_ops.bfs_hops(e, seeds, rounds=3,
                               approx_num_nodes=n)).to_pandas()
        hc = t["hops"].value_counts()
        n1, n2, n3 = (int(hc.get(1, 0)), int(hc.get(2, 0)),
                      int(hc.get(3, 0)))
        rows.append({"pv": p, "n1": n1, "n2": n2, "n3": n3,
                     "harmonic": round(n1 + n2 / 2.0 + n3 / 3.0, 6)})
    return pd.DataFrame(rows).astype({
        "pv": np.int64, "n1": np.int64, "n2": np.int64,
        "n3": np.int64})


def _sql_harmonic_pivots() -> str:
    chains = ",\n".join(
        _sql_bfs_rounds(f"doc_id = {p}", "src", "dst", 3, p=f"h{p}_")
        for p in range(5))
    union = "\nUNION ALL ".join(
        f"SELECT {p} AS pv, v, hops FROM h{p}_3" for p in range(5))
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 7919 + k.k * 104729) % nn.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS k) k, nn),
{chains},
u AS ({union})
SELECT CAST(pv AS BIGINT) AS pv,
       CAST(SUM(CASE WHEN hops = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(SUM(CASE WHEN hops = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       CAST(SUM(CASE WHEN hops = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       ROUND(SUM(CASE WHEN hops = 1 THEN 1 ELSE 0 END)
             + SUM(CASE WHEN hops = 2 THEN 1 ELSE 0 END) / 2.0
             + SUM(CASE WHEN hops = 3 THEN 1 ELSE 0 END) / 3.0, 6)
         AS harmonic
FROM u GROUP BY pv ORDER BY pv
"""


def q_item_item_recs(sf_dir: str):
    """Item-item collaborative filtering: top-3 recommendations for 5
    target parts by co-purchase cosine c/√(nᵢ·nⱼ) over order baskets —
    the classic Amazon-style recommender expressed as counts.  The
    distinct (order, part) reduce runs once; only orders containing a
    TARGET join back (targets broadcast as a 5-key filter, never a
    parts×parts blow-up); nᵢ·nⱼ stays an exact int < 2⁵³ so the one
    mirrored sqrt-division orders identically on both sides."""
    from ray.data.aggregate import Count, Sum

    TGT = (1, 2, 3, 4, 5)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dpair(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "p": t["l_partkey"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    op = li.map_batches(dpair, batch_format="pyarrow") \
        .groupby(["o", "p"]).aggregate(Count()) \
        .select_columns(["o", "p"]).materialize()
    ni = relational.ds_to_table(
        op.groupby("p").aggregate(Count())).to_pandas() \
        .rename(columns={"count()": "n"})
    tgt_orders = op.filter(
        expr=f"p in {list(TGT)}").map_batches(
        lambda t: pa.table({"o": t["o"], "tgt": t["p"]}),
        batch_format="pyarrow")
    j = relational.bucketed_hash_join(tgt_orders, op, on="o")

    def cc_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "tgt": t["tgt"].to_numpy(zero_copy_only=False),
            "rec": t["p"].to_numpy(zero_copy_only=False), "c": 1})
        df = df[df["tgt"] != df["rec"]]
        g = df.groupby(["tgt", "rec"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cc = relational.ds_to_table(
        j.map_batches(cc_partial, batch_format="pyarrow")
        .groupby(["tgt", "rec"]).aggregate(Sum("c", alias_name="c"))
    ).to_pandas()
    nmap = ni.set_index("p")["n"]
    cc["sim"] = cc["c"].to_numpy(np.int64) / np.sqrt(
        (cc["tgt"].map(nmap).to_numpy(np.int64)
         * cc["rec"].map(nmap).to_numpy(np.int64)).astype(np.float64))
    out_rows = []
    for tgt, g in cc.groupby("tgt"):
        g = g.sort_values(["sim", "rec"],
                          ascending=[False, True]).head(3)
        for i, r in enumerate(g.itertuples(), start=1):
            out_rows.append({"part": int(tgt), "rnk": i,
                             "rec": int(r.rec), "n_cooc": int(r.c),
                             "sim": round(float(r.sim), 6)})
    return pd.DataFrame(out_rows).astype({
        "part": np.int64, "rnk": np.int64, "rec": np.int64,
        "n_cooc": np.int64})


SQL_ITEM_RECS = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
ni AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM op GROUP BY 1),
t AS (SELECT o, p AS tgt FROM op WHERE p IN (1, 2, 3, 4, 5)),
cc AS (SELECT t.tgt, op.p AS rec, CAST(COUNT(*) AS BIGINT) AS c
       FROM t JOIN op USING (o) WHERE op.p <> t.tgt GROUP BY 1, 2),
s AS (SELECT cc.tgt, cc.rec, cc.c,
             cc.c / sqrt(CAST(a.n * b.n AS DOUBLE)) AS sim
      FROM cc JOIN ni a ON a.p = cc.tgt JOIN ni b ON b.p = cc.rec),
r AS (SELECT tgt, rec, c, sim,
             ROW_NUMBER() OVER (PARTITION BY tgt
                                ORDER BY sim DESC, rec) AS rnk
      FROM s)
SELECT tgt AS part, CAST(rnk AS BIGINT) AS rnk, rec,
       c AS n_cooc, ROUND(sim, 6) AS sim
FROM r WHERE rnk <= 3 ORDER BY 1, 2
"""


def q_blocking_recall_compare(sf_dir: str):
    """Head-to-head blocking-strategy evaluation: SymSpell
    deletion-variant blocking vs sorted-neighborhood, measured on the
    KNOWN ground truth (every clean record k has a ≤1-edit dirty twin
    k+10⁶ by construction) — candidate volume vs true-match recall,
    the tradeoff every entity-resolution deployment tunes.  Reuses
    both pipelines verbatim; counts are exact, recall the one
    mirrored division."""
    fuzzy_pairs = relational.ds_to_table(
        q_fuzzy_match_pairs(sf_dir)).to_pandas()
    snm = q_sorted_neighborhood_pairs(sf_dir)
    import pyarrow.parquet as pqt
    n_true = pqt.read_metadata(
        f"{sf_dir}/part.parquet").num_rows
    rows = []
    for method, df in (("fuzzy_block", fuzzy_pairs),
                       ("sorted_neighborhood", snm)):
        found = int((df["b"].to_numpy(np.int64)
                     == df["a"].to_numpy(np.int64) + 1000000).sum())
        rows.append({"method": method, "n_pairs": len(df),
                     "n_true_found": found, "n_true_total": n_true,
                     "recall": round(found / float(n_true), 6)})
    return pd.DataFrame(rows).astype({
        "n_pairs": np.int64, "n_true_found": np.int64,
        "n_true_total": np.int64})


SQL_BLOCKING_RECALL = SQL_FUZZY_BASE + """,
u AS (SELECT id, nm FROM clean UNION ALL SELECT id, nm FROM dirty),
r AS (SELECT id, nm, ROW_NUMBER() OVER (ORDER BY nm, id) AS rn FROM u),
cand AS (SELECT r1.id AS ia, r2.id AS ib, r1.nm AS na, r2.nm AS nb
         FROM r r1 JOIN r r2 ON r2.rn - r1.rn BETWEEN 1 AND 3),
snm AS (SELECT LEAST(ia, ib) AS a, GREATEST(ia, ib) AS b FROM cand
        WHERE levenshtein(na, nb) <= 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM clean)
SELECT 'fuzzy_block' AS method,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs
        WHERE b = a + 1000000) AS n_true_found,
       tot.n AS n_true_total,
       ROUND((SELECT COUNT(*) FROM pairs WHERE b = a + 1000000)
             / CAST(tot.n AS DOUBLE), 6) AS recall
FROM tot
UNION ALL
SELECT 'sorted_neighborhood',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM snm),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM snm
        WHERE b = a + 1000000),
       tot.n,
       ROUND((SELECT COUNT(*) FROM snm WHERE b = a + 1000000)
             / CAST(tot.n AS DOUBLE), 6)
FROM tot
ORDER BY 1
"""


def q_getis_ord_hotspots(sf_dir: str):
    """Getis-Ord Gi* hotspot statistic over the 10×10 customer grid —
    THE local spatial statistic behind every 'crime/demand hotspot'
    map (Moran's I says clustering exists; Gi* says WHERE).  Cell
    counts reduce distributedly to the grid-bounded table (empties
    count as 0 over the fixed n = 100 study area); the per-cell 3×3
    neighborhood sums, W, T = Σx and SS = Σx² are exact ints, and Gi*
    is ONE mirrored float expression of them.  Hotspots flag at the
    one-sided 5 % normal critical value 1.645."""
    from ray.data.aggregate import Sum

    G, CELL = 10, 100
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def cells(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cx = ((k * 7919) % 1000) // CELL
        cy = ((k * 104729) % 1000) // CELL
        g = pd.DataFrame({"cell": cx * G + cy, "pn": 1}) \
            .groupby("cell", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby("cell").aggregate(Sum("pn", alias_name="c"))
    ).to_pandas()
    dense = np.zeros(G * G, dtype=np.int64)
    dense[cnt["cell"].to_numpy(np.int64)] = cnt["c"].to_numpy(np.int64)
    x = dense.reshape(G, G)
    T, SS, n = int(dense.sum()), int((dense ** 2).sum()), G * G
    rows = []
    for cx in range(G):
        for cy in range(G):
            x0, x1 = max(0, cx - 1), min(G, cx + 2)
            y0, y1 = max(0, cy - 1), min(G, cy + 2)
            sn = int(x[x0:x1, y0:y1].sum())
            w = (x1 - x0) * (y1 - y0)
            gi = (sn - w * T / 100.0) / (
                np.sqrt(SS / 100.0 - (T / 100.0) * (T / 100.0))
                * np.sqrt((100.0 * w - w * w) / 99.0))
            rows.append({"cell": cx * G + cy, "cnt": int(x[cx, cy]),
                         "w": w, "sum_nbhd": sn,
                         "gi": np.round(gi, 6),
                         "is_hotspot": bool(gi > 1.645)})
    return pd.DataFrame(rows).astype({
        "cell": np.int64, "cnt": np.int64, "w": np.int64,
        "sum_nbhd": np.int64})


SQL_GETIS_ORD = """
WITH pts AS (SELECT ((c_custkey * 7919) % 1000) // 100 AS cx,
                    ((c_custkey * 104729) % 1000) // 100 AS cy
             FROM customer),
cc AS (SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2),
grid AS (SELECT gx.i AS cx, gy.i AS cy
         FROM (SELECT unnest(generate_series(0, 9)) AS i) gx,
              (SELECT unnest(generate_series(0, 9)) AS i) gy),
dense AS (SELECT g.cx, g.cy, COALESCE(cc.c, 0) AS c
          FROM grid g LEFT JOIN cc USING (cx, cy)),
tot AS (SELECT SUM(c) AS t, SUM(c * c) AS ss FROM dense),
nb AS (SELECT a.cx, a.cy, a.c,
              CAST(SUM(b.c) AS BIGINT) AS sn,
              CAST(COUNT(*) AS BIGINT) AS w
       FROM dense a JOIN dense b
         ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       GROUP BY 1, 2, 3)
SELECT CAST(cx * 10 + cy AS BIGINT) AS cell, c AS cnt, w,
       sn AS sum_nbhd,
       ROUND((sn - w * tot.t / 100.0)
             / (sqrt(tot.ss / 100.0 - (tot.t / 100.0) * (tot.t / 100.0))
                * sqrt((100.0 * w - w * w) / 99.0)), 6) AS gi,
       (sn - w * tot.t / 100.0)
         / (sqrt(tot.ss / 100.0 - (tot.t / 100.0) * (tot.t / 100.0))
            * sqrt((100.0 * w - w * w) / 99.0)) > 1.645 AS is_hotspot
FROM nb, tot ORDER BY cell
"""


def q_rolling_origin_backtest(sf_dir: str):
    """Rolling-origin backtest of the 7-day seasonal-naive forecaster:
    14 consecutive origins, horizons h = 1..7, MAE per horizon — the
    out-of-sample evaluation protocol (one train/test split lies;
    rolling origins don't).  Forecast ŷ(o+h) = y(o+h−7) on the
    gap-filled calendar; per-horizon Σ|err| stays exact cents from the
    shared daily reduce, the MAE is one mirrored division."""
    d = _daily_revenue_cents(sf_dir)
    days = d["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[days - lo] = d["rev"].to_numpy(np.int64)
    origins = np.arange(hi - 20, hi - 6)          # 14 origins
    rows = []
    for h in range(1, 8):
        t = origins + h                           # target days
        err = np.abs(dense[t - lo] - dense[t - 7 - lo])
        rows.append({"h": h, "n_origins": len(origins),
                     "sum_abs_err_cents": int(err.sum()),
                     "mae": round(float(err.sum()) / len(origins), 4)})
    return pd.DataFrame(rows).astype({
        "h": np.int64, "n_origins": np.int64,
        "sum_abs_err_cents": np.int64})


SQL_ROLLING_ORIGIN = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT))
                    AS rev
           FROM orders GROUP BY 1),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b),
f AS (SELECT cal.day, COALESCE(d.rev, 0) AS x
      FROM cal LEFT JOIN d USING (day)),
o AS (SELECT unnest(generate_series(b.hi - 20, b.hi - 7)) AS org
      FROM b),
hs AS (SELECT unnest(generate_series(1, 7)) AS h),
e AS (SELECT hs.h, ABS(ft.x - fp.x) AS err
      FROM o CROSS JOIN hs
      JOIN f ft ON ft.day = o.org + hs.h
      JOIN f fp ON fp.day = o.org + hs.h - 7)
SELECT CAST(h AS BIGINT) AS h,
       CAST(COUNT(*) AS BIGINT) AS n_origins,
       CAST(SUM(err) AS BIGINT) AS sum_abs_err_cents,
       ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 4) AS mae
FROM e GROUP BY h ORDER BY h
"""


def q_ivm_join_view_nation(sf_dir: str):
    """Incremental maintenance of a JOIN view — the step past
    aggregate-only IVM: V = Γ_nation(orders ⋈ customer) maintained as
    base-aggregate ⊕ delta-aggregate, where the 'overnight base' is
    even orderkeys and the 'morning inserts' are odd ones.  Each side
    runs its own bucketed join with per-bucket cents pre-aggregation
    (the delta leg joins ONLY the delta fact rows against the
    dimension — the whole point: maintenance cost scales with the
    delta, not the base); the merge is one exact-int add.  The oracle
    recomputes the full join, proving merge ≡ recompute."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: pa.table({
            "o_custkey": t["c_custkey"],
            "nation": t["c_nationkey"].cast(pa.int64())}),
            batch_format="pyarrow")

    def leg(parity: int):
        def par(t: pa.Table) -> pa.Table:     # vectorized: Ray's
            ok = t["o_orderkey"].to_numpy(    # filter-expr can't do %
                zero_copy_only=False) % 2 == parity
            return t.filter(pa.array(ok))

        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_totalprice"]) \
            .map_batches(par, batch_format="pyarrow")

        def combine(t: pa.Table) -> pa.Table:
            cents = np.round(t["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            g = pd.DataFrame({
                "nation": t["nation"].to_numpy(zero_copy_only=False),
                "n": 1, "cents": cents}) \
                .groupby("nation", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return relational.ds_to_table(
            relational.bucketed_hash_join(
                orders, cust, on="o_custkey", combine=combine)
            .groupby("nation").aggregate(
                Sum("n", alias_name="n"),
                Sum("cents", alias_name="cents"))
        ).to_pandas().set_index("nation")

    base, delta = leg(0), leg(1)
    merged = base.add(delta, fill_value=0).reset_index() \
        .sort_values("nation").reset_index(drop=True)
    return merged.astype({"nation": np.int64, "n": np.int64,
                          "cents": np.int64})


SQL_IVM_JOIN = """
SELECT CAST(c_nationkey AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def q_logrank_test_retention(sf_dir: str):
    """Log-rank test between the custkey-parity arms on the
    Kaplan-Meier lifetime scheme (duration = first→last order day,
    churn iff the last order is ≥90 days before the horizon) — the
    standard significance test for 'did the treatment change
    retention', which comparing two KM curves by eye cannot give.
    One (duration × arm) count reduce bounded by distinct durations;
    at-risk counts are suffix sums, O−E and the hypergeometric
    variance fold per event time with mirrored float terms, χ² is the
    one squared ratio."""
    from ray.data.aggregate import Max, Sum

    ev = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        g = pd.DataFrame({"o_custkey":
                          t["o_custkey"].to_numpy(zero_copy_only=False),
                          "pf": day, "pl": day}) \
            .groupby("o_custkey", sort=False) \
            .agg(pf=("pf", "min"), pl=("pl", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Min
    per_cust = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Min("pf", alias_name="f"),
                                        Max("pl", alias_name="l"))
    mx = int(_read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda t: pa.table({"d": pa.array(
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64))}),
        batch_format="pyarrow").aggregate(Max("d", alias_name="m"))["m"])

    def to_counts(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        l = t["l"].to_numpy(zero_copy_only=False).astype(np.int64)
        arm = (t["o_custkey"].to_numpy(zero_copy_only=False)
               % 2).astype(np.int64)
        g = pd.DataFrame({"t": l - f, "arm": arm,
                          "pd_": ((mx - l) >= 90).astype(np.int64),
                          "pc_": 1}) \
            .groupby(["t", "arm"], sort=False) \
            .agg(pd_=("pd_", "sum"), pc_=("pc_", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        per_cust.map_batches(to_counts, batch_format="pyarrow")
        .groupby(["t", "arm"]).aggregate(Sum("pd_", alias_name="d"),
                                         Sum("pc_", alias_name="c"))
    ).to_pandas()
    ts = np.sort(cnt["t"].unique())
    piv_d = cnt.pivot_table(index="t", columns="arm", values="d",
                            fill_value=0, aggfunc="sum") \
        .reindex(ts, fill_value=0).reindex(columns=[0, 1], fill_value=0)
    piv_c = cnt.pivot_table(index="t", columns="arm", values="c",
                            fill_value=0, aggfunc="sum") \
        .reindex(ts, fill_value=0).reindex(columns=[0, 1], fill_value=0)
    # at-risk = customers with duration >= t (suffix sums, exact)
    n0 = piv_c[0].to_numpy(np.int64)[::-1].cumsum()[::-1]
    n1 = piv_c[1].to_numpy(np.int64)[::-1].cumsum()[::-1]
    d0, d1 = (piv_d[0].to_numpy(np.int64), piv_d[1].to_numpy(np.int64))
    dt, nt = d0 + d1, n0 + n1
    ev_m = dt > 0
    o1 = int(d1[ev_m].sum())
    e1 = float(sum(int(a) * int(b) / int(c)
                   for a, b, c in zip(n1[ev_m], dt[ev_m], nt[ev_m])))
    var = float(sum(
        int(a) * int(b) * int(c) * (int(d) - int(c))
        / (int(d) * int(d) * (int(d) - 1))
        for a, b, c, d in zip(n0[ev_m], n1[ev_m], dt[ev_m], nt[ev_m])
        if d > 1))
    chi2 = (o1 - e1) * (o1 - e1) / var if var > 0 else 0.0
    return pd.DataFrame([{
        "n_arm0": int(piv_c[0].sum()), "n_arm1": int(piv_c[1].sum()),
        "obs1": o1, "exp1": np.round(e1, 6),
        "var": np.round(var, 6), "chi2": np.round(chi2, 6)}]) \
        .astype({"n_arm0": np.int64, "n_arm1": np.int64,
                 "obs1": np.int64})


SQL_LOGRANK = """
WITH pc AS (SELECT o_custkey,
                   MIN(epoch_us(o_orderdate) // 86400000000) AS f,
                   MAX(epoch_us(o_orderdate) // 86400000000) AS l
            FROM orders GROUP BY 1),
hz AS (SELECT MAX(l) AS mx FROM pc),
obs AS (SELECT l - f AS t, o_custkey % 2 AS arm,
               CASE WHEN hz.mx - l >= 90 THEN 1 ELSE 0 END AS d
        FROM pc, hz),
g AS (SELECT t, arm, CAST(SUM(d) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM obs GROUP BY 1, 2),
ts AS (SELECT DISTINCT t FROM g),
cells AS (SELECT ts.t, a.arm,
                 COALESCE(g.d, 0) AS d, COALESCE(g.c, 0) AS c
          FROM ts CROSS JOIN (SELECT unnest([0, 1]) AS arm) a
          LEFT JOIN g ON g.t = ts.t AND g.arm = a.arm),
ar AS (SELECT t, arm, d,
              SUM(c) OVER (PARTITION BY arm ORDER BY t DESC
                           ROWS UNBOUNDED PRECEDING) AS n
       FROM cells),
w AS (SELECT a0.t, a0.d AS d0, a1.d AS d1, a0.n AS n0, a1.n AS n1
      FROM ar a0 JOIN ar a1 ON a0.t = a1.t
      WHERE a0.arm = 0 AND a1.arm = 1 AND a0.d + a1.d > 0)
SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM cells WHERE arm = 0)
         AS n_arm0,
       (SELECT CAST(SUM(c) AS BIGINT) FROM cells WHERE arm = 1)
         AS n_arm1,
       CAST(SUM(d1) AS BIGINT) AS obs1,
       ROUND(SUM(n1 * (d0 + d1) / CAST(n0 + n1 AS DOUBLE)), 6)
         AS exp1,
       ROUND(SUM(CASE WHEN n0 + n1 > 1 THEN
                 n0 * n1 * (d0 + d1)
                 * ((n0 + n1) - (d0 + d1))
                 / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1)
                    * ((n0 + n1) - 1))
                 ELSE 0 END), 6) AS var,
       ROUND((SUM(d1) - SUM(n1 * (d0 + d1)
                            / CAST(n0 + n1 AS DOUBLE)))
             * (SUM(d1) - SUM(n1 * (d0 + d1)
                              / CAST(n0 + n1 AS DOUBLE)))
             / SUM(CASE WHEN n0 + n1 > 1 THEN
                   n0 * n1 * (d0 + d1) * ((n0 + n1) - (d0 + d1))
                   / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1)
                      * ((n0 + n1) - 1))
                   ELSE 0 END), 6) AS chi2
FROM w
"""


_CDC_P, _CDC_W, _CDC_MASK = 1099511628211, 8, 64


def q_cdc_chunking_stats(sf_dir: str):
    """Content-defined chunking (the rsync/backup-dedup primitive):
    cut after every 8-byte window whose FNV rolling hash ≡ 0 mod 64
    (avg chunk ≈64 B) — boundaries depend only on LOCAL content, so an
    insertion reshifts one chunk, not every fixed-width block.  The
    corpus-wide report (chunks, distinct chunks, dup ratio, mean
    length) folds from per-batch chunk partials through ONE
    chunk-identity groupby; the twin replays the identical byte-level
    polynomial (the fingerprint twin's ring-homomorphism trick) in
    HUGEINT.  Chunk identity here is the chunk content itself —
    the 100-TB path would ship 16-byte digests instead (noted, not
    needed for the bounded fixtures)."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["text"])
    M = np.uint64(0xFFFFFFFFFFFFFFFF)      # implicit via uint64 wrap

    def chunks_of(bts: bytes) -> list[bytes]:
        b = np.frombuffer(bts, dtype=np.uint8).astype(np.uint64)
        n = len(b)
        if n < _CDC_W:
            return [bts] if n else []
        nw = n - _CDC_W + 1
        h = np.zeros(nw, dtype=np.uint64)
        p = np.uint64(_CDC_P)
        with np.errstate(over="ignore"):
            for j in range(_CDC_W):
                h = h * p + b[j:j + nw]
        cuts = np.flatnonzero(h % np.uint64(_CDC_MASK) == 0) + _CDC_W
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [n]])
        return [bts[s:e] for s, e in zip(starts, ends) if e > s]

    def partial(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for txt in t["text"].to_pylist():
            for ch in chunks_of(txt.encode()):
                if ch in agg:
                    agg[ch] += 1
                else:
                    agg[ch] = 1
        return pa.table({
            "ch": pa.array(list(agg.keys()), type=pa.binary()),
            "ln": pa.array([len(c) for c in agg],
                           type=pa.int64()),
            "c": pa.array(list(agg.values()), type=pa.int64())})

    red = relational.ds_to_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("ch").aggregate(Sum("c", alias_name="c"))
        .map_batches(lambda t: pa.table({
            "nd": pa.array([t.num_rows], type=pa.int64()),
            "nc": pa.array([int(np.sum(
                t["c"].to_numpy(zero_copy_only=False)))],
                type=pa.int64()),
            "tb": pa.array([int(np.sum(
                pc.binary_length(t["ch"]).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                * t["c"].to_numpy(zero_copy_only=False)))],
                type=pa.int64())}), batch_format="pyarrow")
    ).to_pandas().sum()
    nd, nch, tb = (int(red["nd"]), int(red["nc"]), int(red["tb"]))
    return pd.DataFrame([{
        "n_chunks": nch, "n_distinct": nd, "total_bytes": tb,
        "dup_ratio": np.round(1.0 - nd / nch, 6),
        "mean_len": np.round(tb / nch, 4)}]) \
        .astype({"n_chunks": np.int64, "n_distinct": np.int64,
                 "total_bytes": np.int64})


def _sql_cdc_stats() -> str:
    M = 1 << 64
    pows = [pow(_CDC_P, _CDC_W - 1 - j, M) for j in range(_CDC_W)]
    terms = [f"(CAST(byte AS HUGEINT) * {pows[0]}) % {M}"] + [
        f"(CAST(lead(byte, {j}) OVER win AS HUGEINT) * {pows[j]}) % {M}"
        for j in range(1, _CDC_W)]
    terms_sql = "\n      + ".join(terms)
    return f"""
WITH b AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx,
         CAST('0x' || substr(hex(encode(text)),
                             2 * CAST(i AS INT) - 1, 2) AS INT) AS byte
  FROM (SELECT doc_id, text,
               unnest(generate_series(1,
                 octet_length(encode(text)))) AS i
        FROM documents)),
w AS (
  SELECT doc_id, i, n, hx,
    ( {terms_sql}
    ) % {M} AS h
  FROM b
  WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
cuts AS (SELECT doc_id, i + {_CDC_W - 1} AS cut
         FROM w WHERE i <= n - {_CDC_W - 1} AND h % {_CDC_MASK} = 0),
dn AS (SELECT DISTINCT doc_id, n, hx FROM b WHERE n > 0),
starts AS (SELECT doc_id, 0 AS st FROM dn
           UNION ALL SELECT doc_id, cut FROM cuts WHERE cut <
             (SELECT n FROM dn d WHERE d.doc_id = cuts.doc_id)),
ch AS (SELECT s.doc_id,
              substr(dn.hx, 2 * s.st + 1,
                     2 * (COALESCE(LEAD(s.st) OVER
                            (PARTITION BY s.doc_id ORDER BY s.st),
                          dn.n) - s.st)) AS chunk,
              COALESCE(LEAD(s.st) OVER
                         (PARTITION BY s.doc_id ORDER BY s.st),
                       dn.n) - s.st AS ln
       FROM starts s JOIN dn USING (doc_id)),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc,
               CAST(COUNT(DISTINCT chunk) AS BIGINT) AS nd,
               CAST(SUM(ln) AS BIGINT) AS tb
        FROM ch WHERE ln > 0)
SELECT nc AS n_chunks, nd AS n_distinct, tb AS total_bytes,
       ROUND(1.0 - nd / CAST(nc AS DOUBLE), 6) AS dup_ratio,
       ROUND(CAST(tb AS DOUBLE) / nc, 4) AS mean_len
FROM agg
"""


def q_mutual_nn_pairs(sf_dir: str):
    """Mutual nearest neighbours over the embedding table: pairs
    (i, j) where each is the other's top-1 cosine neighbour — the MNN
    anchor-pairing primitive behind batch-effect correction and
    cross-lingual alignment (one-directional NN gives hubs; mutuality
    filters them).  One streaming pass computes every vector's NN
    against the broadcast matrix (per-batch matmul, exact ties to the
    smaller id); the mutuality close is a self-join on the tiny
    (n × 2) NN table."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    tbl = relational.ds_to_table(emb)
    ids_all = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids_all)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in tbl["embedding"].to_pylist()])[order]
    ids_all = ids_all[order]
    mref = ray.put((ids_all, mat / np.linalg.norm(
        mat, axis=1, keepdims=True)))
    _st: dict = {}

    def nn(t: pa.Table) -> pa.Table:
        st = _st.get("m")
        if st is None:
            st = _st["m"] = ray.get(mref)
        cand_ids, cm = st
        ids = t["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ cm.T
        sims[np.arange(len(ids)),
             np.searchsorted(cand_ids, ids)] = -np.inf  # exclude self
        best = np.argmax(sims, axis=1)   # first max = smallest id
        return pa.table({"src": pa.array(ids),
                         "nn": pa.array(cand_ids[best])})

    nnt = relational.ds_to_table(
        emb.map_batches(nn, batch_format="pyarrow")).to_pandas()
    m = nnt.set_index("src")["nn"]
    a = nnt["src"].to_numpy(np.int64)
    b = nnt["nn"].to_numpy(np.int64)
    mutual = (m.reindex(b).to_numpy() == a) & (a < b)
    out = pd.DataFrame({"a": a[mutual], "b": b[mutual]}) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    return out.astype({"a": np.int64, "b": np.int64})


SQL_MUTUAL_NN = """
WITH nnq AS (
  SELECT a.vec_id AS src, b.vec_id AS nn,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.embedding,
                                             b.embedding) DESC,
                      b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
n1 AS (SELECT src, nn FROM nnq WHERE rn = 1)
SELECT x.src AS a, x.nn AS b
FROM n1 x JOIN n1 y ON y.src = x.nn AND y.nn = x.src
WHERE x.src < x.nn ORDER BY 1, 2
"""


#: business-day partial-week table: _BD_W[dow0][r] = weekdays among
#: the r days FOLLOWING a day whose (epoch_day + 3) % 7 is dow0
#: (0 = Monday … 6 = Sunday); shared verbatim by the SQL generator.
_BD_W = [[sum(1 for o in range(1, r + 1) if (d + o) % 7 < 5)
          for r in range(7)] for d in range(7)]


def q_business_days_to_ship(sf_dir: str):
    """Promised lead time in BUSINESS days per order priority — the
    calendar-intelligence histogram (5 calendar days Fri→Wed ≠ 5
    days Mon→Fri on an SLA): promise span s = o_orderkey % 28 days
    from o_orderdate, business days = (s//7)·5 + W[dow₀][s%7] with W
    the shared 7×7 partial-week table — a PURE integer formula, no
    calendar explode, identical CASE chain in the twin.  One
    (priority × bd)-bounded count reduce."""
    from ray.data.aggregate import Sum

    W = np.array(_BD_W, dtype=np.int64)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        day = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        s = okey % 28
        dow0 = (day + 3) % 7
        bd = (s // 7) * 5 + W[dow0, s % 7]
        g = pd.DataFrame({
            "priority": t["o_orderpriority"].to_numpy(
                zero_copy_only=False),
            "bd": bd, "n": 1}) \
            .groupby(["priority", "bd"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["priority", "bd"]).aggregate(Sum("n",
                                                   alias_name="n"))
    ).to_pandas().sort_values(["priority", "bd"]) \
        .reset_index(drop=True)
    return out.astype({"bd": np.int64, "n": np.int64})


def _sql_business_days() -> str:
    w_case = " ".join(
        f"WHEN dow0 = {d} AND pr = {r} THEN {_BD_W[d][r]}"
        for d in range(7) for r in range(7))
    return f"""
WITH o AS (SELECT o_orderpriority AS priority,
                  o_orderkey % 28 AS s,
                  (epoch_us(o_orderdate) // 86400000000 + 3) % 7
                    AS dow0
           FROM orders),
b AS (SELECT priority, s // 7 * 5 +
             (CASE {w_case} ELSE 0 END) AS bd
      FROM (SELECT priority, s, dow0, s % 7 AS pr FROM o))
SELECT priority, CAST(bd AS BIGINT) AS bd,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_deterministic_random_walks(sf_dir: str):
    """Node2vec-style walk corpus over the link graph with
    DETERMINISTIC next-step choice (edge k = 1 + hash(node, step) % 3
    of the node's three formula out-edges) — the reproducible walk
    generator a distributed embedding trainer needs (seeded walks =
    re-runnable training data).  Walks start at every 50th doc and
    take 3 steps; each step is one vectorized map over the walk
    frontier (the graph is a FORMULA, so steps need no edge shuffle
    at all — the degenerate-best case of the walk join).  The twin
    unrolls the same three steps as column expressions."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def walk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v0 = d[d % 50 == 0]
        cols = {"start": v0, "v0": v0}
        cur = v0
        for step in range(1, 4):
            k = 1 + (cur * 2654435761 + step * 40503) % 3
            cur = (cur * 7919 + k * 104729) % n
            cols[f"v{step}"] = cur
        return pa.table({c: pa.array(v) for c, v in cols.items()})

    out = relational.ds_to_table(
        docs.map_batches(walk, batch_format="pyarrow")
    ).to_pandas().sort_values("start").reset_index(drop=True)
    return out.astype({c: np.int64 for c in out.columns})


SQL_RANDOM_WALKS = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
w0 AS (SELECT doc_id AS start, doc_id AS v0 FROM documents
       WHERE doc_id % 50 = 0),
w1 AS (SELECT start, v0,
              (v0 * 7919 + (1 + (v0 * 2654435761 + 1 * 40503) % 3)
               * 104729) % nn.n AS v1
       FROM w0, nn),
w2 AS (SELECT start, v0, v1,
              (v1 * 7919 + (1 + (v1 * 2654435761 + 2 * 40503) % 3)
               * 104729) % nn.n AS v2
       FROM w1, nn),
w3 AS (SELECT start, v0, v1, v2,
              (v2 * 7919 + (1 + (v2 * 2654435761 + 3 * 40503) % 3)
               * 104729) % nn.n AS v3
       FROM w2, nn)
SELECT start, v0, v1, v2, v3 FROM w3 ORDER BY start
"""


def q_cohort_ltv_curve(sf_dir: str):
    """Cumulative lifetime value per monthly cohort and cohort age —
    the unit-economics curve (retention says WHO came back; LTV says
    what they were WORTH).  Per-customer first-order month from one
    reduce, revenue cents fold into (cohort, age)-bounded cells
    through a bucketed join, cumulative over age runs on the tiny
    pivot — exact cents end to end."""
    from ray.data.aggregate import Min, Sum

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])

    def per_cust(t: pa.Table) -> pa.Table:
        m = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        g = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(
            zero_copy_only=False), "pm": m}) \
            .groupby("o_custkey", sort=False).min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    first = orders.map_batches(per_cust, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Min("pm", alias_name="cohort"))

    def combine(t: pa.Table) -> pa.Table:
        m = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        coh = t["cohort"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"cohort": coh, "age": m - coh,
                          "cents": cents, "n": 1}) \
            .groupby(["cohort", "age"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = relational.ds_to_table(
        relational.bucketed_hash_join(orders, first, on="o_custkey",
                                      combine=combine)
        .groupby(["cohort", "age"]).aggregate(
            Sum("cents", alias_name="cents"),
            Sum("n", alias_name="n_orders"))
    ).to_pandas().sort_values(["cohort", "age"]).reset_index(drop=True)
    cells["cum_cents"] = cells.groupby("cohort")["cents"].cumsum()
    cells["cohort"] = cells["cohort"].to_numpy(np.int64) \
        .astype("datetime64[M]").astype("datetime64[us]")
    return cells[["cohort", "age", "n_orders", "cents",
                  "cum_cents"]].astype({
                      "age": np.int64, "n_orders": np.int64,
                      "cents": np.int64, "cum_cents": np.int64})


SQL_COHORT_LTV = """
WITH f AS (SELECT o_custkey,
                  MIN(date_trunc('month', o_orderdate)) AS cohort
           FROM orders GROUP BY 1),
c AS (SELECT f.cohort,
             (EXTRACT(year FROM o.o_orderdate) * 12
              + EXTRACT(month FROM o.o_orderdate))
             - (EXTRACT(year FROM f.cohort) * 12
                + EXTRACT(month FROM f.cohort)) AS age,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN f USING (o_custkey)),
g AS (SELECT cohort, age, CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM c GROUP BY 1, 2)
SELECT CAST(cohort AS TIMESTAMP) AS cohort, CAST(age AS BIGINT) AS age,
       n_orders, cents,
       CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_cents
FROM g ORDER BY 1, 2
"""


def q_conformal_threshold_fpr(sf_dir: str):
    """Split-conformal decision threshold for the shared logreg doc
    scorer: calibrate on the NEGATIVE even-doc_id docs (threshold =
    the ⌈(n+1)(1−α)⌉-th smallest calibration score, α = 0.1 — the
    distribution-free guarantee P(FP) ≤ α under exchangeability),
    then measure the realized false-positive rate on the held-out odd
    negatives.  Scores are 6-dp ints, so the order statistic and all
    counts are exact; the FPR is the one mirrored division.  The twin
    selects the k-th order statistic via the ROW_NUMBER pivot
    (correlated OFFSET is unsupported)."""
    from ray.data.aggregate import Sum

    scored = _doc_logreg_scored(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        s6 = np.round(t["score"].to_numpy(zero_copy_only=False)
                      * 1e6).astype(np.int64)
        lbl = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        neg = lbl == 0
        cal = neg & (did % 2 == 0)
        ev = neg & (did % 2 == 1)
        g = pd.DataFrame({"s6": s6, "cal": cal.astype(np.int64),
                          "ev": ev.astype(np.int64)})
        g = g[cal | ev].groupby("s6", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    dist = relational.ds_to_table(
        scored.map_batches(partial, batch_format="pyarrow")
        .groupby("s6").aggregate(Sum("cal", alias_name="cal"),
                                 Sum("ev", alias_name="ev"))
    ).to_pandas().sort_values("s6").reset_index(drop=True)
    n_cal = int(dist["cal"].sum())
    k = min(n_cal, -(-((n_cal + 1) * 9) // 10))    # ceil 0.9(n+1)
    cum = dist["cal"].cumsum()
    thr = int(dist.loc[cum >= k, "s6"].iloc[0])
    n_ev = int(dist["ev"].sum())
    fp = int(dist.loc[dist["s6"] > thr, "ev"].sum())
    return pd.DataFrame([{
        "n_cal": n_cal, "k": k, "thr_s6": thr, "n_eval_neg": n_ev,
        "fp": fp, "fpr": round(fp / float(n_ev), 6)}]).astype({
            "n_cal": np.int64, "k": np.int64, "thr_s6": np.int64,
            "n_eval_neg": np.int64, "fp": np.int64})


SQL_CONFORMAL = """
WITH f AS (
  SELECT doc_id, n_chars / 1000.0 AS x1,
         len(string_split(text, ' ')) AS wl,
         CASE WHEN n_chars > 297 THEN 1 ELSE 0 END AS label
  FROM documents),
s AS (SELECT doc_id,
             CAST(ROUND(ROUND(1.0 / (1.0 + exp(-(0.25 + 0.8 * x1
                   - 0.5 * (wl / 100.0)))), 6) * 1000000) AS BIGINT)
               AS s6,
             label FROM f),
cal AS (SELECT s6 FROM s WHERE label = 0 AND doc_id % 2 = 0),
ev AS (SELECT s6 FROM s WHERE label = 0 AND doc_id % 2 = 1),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cal),
kk AS (SELECT LEAST(n, CAST(CEIL((n + 1) * 0.9) AS BIGINT)) AS k,
              n FROM nc),
rk AS (SELECT s6, ROW_NUMBER() OVER (ORDER BY s6) AS rn FROM cal),
th AS (SELECT MAX(CASE WHEN rn = kk.k THEN s6 END) AS thr
       FROM rk, kk GROUP BY kk.k)
SELECT kk.n AS n_cal, kk.k AS k, CAST(th.thr AS BIGINT) AS thr_s6,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ev) AS n_eval_neg,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ev
        WHERE s6 > th.thr) AS fp,
       ROUND((SELECT COUNT(*) FROM ev WHERE s6 > th.thr)
             / CAST((SELECT COUNT(*) FROM ev) AS DOUBLE), 6) AS fpr
FROM kk, th
"""


def q_selectivity_independence_audit(sf_dir: str):
    """Query-optimizer cardinality audit: for every
    (l_returnflag × l_linestatus) conjunction, the ACTUAL row count
    vs the independence-assumption estimate n·p(a)·p(b) — the error a
    learned-cardinality model exists to fix; ratio > 1 means the
    optimizer under-estimates the conjunction.  One (flag × status)
    bounded count reduce gives actuals AND both marginals; expected
    and ratio are the mirrored float expressions."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "flag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "status": t["l_linestatus"].to_numpy(
                zero_copy_only=False), "n": 1}) \
            .groupby(["flag", "status"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = relational.ds_to_table(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["flag", "status"]).aggregate(Sum("n",
                                                   alias_name="n"))
    ).to_pandas()
    N = int(cnt["n"].sum())
    mf = cnt.groupby("flag")["n"].sum()
    ms = cnt.groupby("status")["n"].sum()
    cnt["expected"] = np.round(
        cnt["flag"].map(mf).to_numpy(np.float64)
        * cnt["status"].map(ms).to_numpy(np.int64) / N, 4)
    cnt["ratio"] = np.round(
        cnt["n"].to_numpy(np.int64)
        / (cnt["flag"].map(mf).to_numpy(np.float64)
           * cnt["status"].map(ms).to_numpy(np.int64) / N), 6)
    out = cnt.sort_values(["flag", "status"]).reset_index(drop=True) \
        .rename(columns={"n": "actual"})
    return out.astype({"actual": np.int64})


SQL_SELECTIVITY = """
WITH c AS (SELECT l_returnflag AS flag, l_linestatus AS status,
                  CAST(COUNT(*) AS BIGINT) AS actual
           FROM lineitem GROUP BY 1, 2),
nn AS (SELECT SUM(actual) AS n FROM c),
mf AS (SELECT flag, SUM(actual) AS n FROM c GROUP BY 1),
ms AS (SELECT status, SUM(actual) AS n FROM c GROUP BY 1)
SELECT c.flag, c.status, c.actual,
       ROUND(CAST(mf.n AS DOUBLE) * ms.n / nn.n, 4) AS expected,
       ROUND(c.actual / (CAST(mf.n AS DOUBLE) * ms.n / nn.n), 6)
         AS ratio
FROM c JOIN mf USING (flag) JOIN ms USING (status), nn
ORDER BY 1, 2
"""


def q_er_transitivity_audit(sf_dir: str):
    """Entity-resolution transitivity audit: inside each fuzzy
    cluster, how many record pairs are IMPLIED by the clustering
    (ΣC(size,2)) vs DIRECTLY verified (edit distance ≤ 1)?  The gap
    is the chain-merge risk every ER deployment monitors — a cluster
    glued by A~B~C with A≁C may be an over-merge.  Reuses the
    memoized cluster labels and the pair pipeline; the twin composes
    the identical recursive closure."""
    lbl = _fuzzy_cluster_labels(sf_dir)
    sizes = lbl.groupby("label")["node"].size()
    implied = int((sizes * (sizes - 1) // 2).sum())
    n_clusters = int((sizes > 1).sum())
    direct = int(relational.ds_to_table(
        q_fuzzy_match_pairs(sf_dir)).num_rows)
    return pd.DataFrame([{
        "n_clusters": n_clusters, "implied_pairs": implied,
        "direct_pairs": direct,
        "transitive_only": implied - direct,
        "violation_ratio": round((implied - direct) / float(implied),
                                 6)}]).astype({
            "n_clusters": np.int64, "implied_pairs": np.int64,
            "direct_pairs": np.int64, "transitive_only": np.int64})


SQL_ER_TRANSITIVITY = SQL_FUZZY_CLUSTERS.replace(
    "SELECT node, MIN(lbl) AS label FROM (", """, labels AS (
SELECT node, MIN(lbl) AS label FROM (""") + """
),
sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS s
       FROM labels GROUP BY label)
SELECT CAST(SUM(CASE WHEN s > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clusters,
       CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS implied_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS direct_pairs,
       CAST(SUM(s * (s - 1) // 2)
            - (SELECT COUNT(*) FROM pairs) AS BIGINT)
         AS transitive_only,
       ROUND((SUM(s * (s - 1) // 2)
              - (SELECT COUNT(*) FROM pairs))
             / CAST(SUM(s * (s - 1) // 2) AS DOUBLE), 6)
         AS violation_ratio
FROM sz
"""


def q_ransac_price_line(sf_dir: str):
    """Deterministic RANSAC line fit of extended price on quantity:
    candidate lines come from 5 DATA-DRIVEN point pairs (the first 10
    rows with l_orderkey % 100 = 1 ∧ l_linenumber = 1 in orderkey
    order, paired consecutively — reproducible, no RNG), the winner
    maximizes inliers |resid| ≤ $5 over the WHOLE table.  Slopes and
    residuals derive from exact cents ints through identical float
    ops on both sides, so the inlier comparisons cannot flip; one
    streaming inlier-count pass scores all candidates at once."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice"])
    seed_t = relational.ds_to_table(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_quantity",
               "l_extendedprice"],
              filter=(pads.field("l_linenumber") == 1))
    ).to_pandas()
    seed_t = seed_t[seed_t["l_orderkey"] % 100 == 1] \
        .sort_values("l_orderkey").head(10).reset_index(drop=True)
    cands = []
    for c in range(len(seed_t) // 2):
        p1, p2 = seed_t.iloc[2 * c], seed_t.iloc[2 * c + 1]
        x1, y1 = float(p1["l_quantity"]), round(
            float(p1["l_extendedprice"]) * 100.0)
        x2, y2 = float(p2["l_quantity"]), round(
            float(p2["l_extendedprice"]) * 100.0)
        if x1 == x2:
            continue
        cands.append((c + 1, x1, y1, (y2 - y1) / (x2 - x1)))

    def count_inliers(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0)
        rows = {"cand": [], "inl": []}
        for cid, x1, y1, slope in cands:
            resid = y - (y1 + slope * (x - x1))
            rows["cand"].append(cid)
            rows["inl"].append(int((np.abs(resid) <= 500.0).sum()))
        return pa.table({"cand": pa.array(rows["cand"],
                                          type=pa.int64()),
                         "inl": pa.array(rows["inl"],
                                         type=pa.int64())})

    inl = relational.ds_to_table(
        li.map_batches(count_inliers, batch_format="pyarrow")
        .groupby("cand").aggregate(Sum("inl", alias_name="inliers"))
    ).to_pandas().set_index("cand")["inliers"]
    best = max(cands, key=lambda c: (int(inl[c[0]]), -c[0]))[0]
    out = pd.DataFrame([{
        "cand": cid, "slope": np.round(slope, 6),
        "inliers": int(inl[cid]), "is_best": bool(cid == best)}
        for cid, x1, y1, slope in cands])
    return out.astype({"cand": np.int64, "inliers": np.int64})


SQL_RANSAC = """
WITH seed AS (
  SELECT l_quantity AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
         ROW_NUMBER() OVER (ORDER BY l_orderkey) AS rn
  FROM lineitem
  WHERE l_orderkey % 100 = 1 AND l_linenumber = 1
  QUALIFY rn <= 10),
cand AS (
  SELECT CAST((a.rn + 1) // 2 AS BIGINT) AS cand,
         a.x AS x1, a.y AS y1,
         (b.y - a.y) / (b.x - a.x) AS slope
  FROM seed a JOIN seed b ON b.rn = a.rn + 1
  WHERE a.rn % 2 = 1 AND a.x <> b.x),
inl AS (
  SELECT c.cand, c.slope,
         CAST(SUM(CASE WHEN ABS(
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             - (c.y1 + c.slope * (l.l_quantity - c.x1)))
             <= 500.0 THEN 1 ELSE 0 END) AS BIGINT) AS inliers
  FROM cand c CROSS JOIN lineitem l GROUP BY 1, 2),
best AS (SELECT cand FROM inl ORDER BY inliers DESC, cand LIMIT 1)
SELECT i.cand, ROUND(i.slope, 6) AS slope, i.inliers,
       i.cand = (SELECT cand FROM best) AS is_best
FROM inl i ORDER BY i.cand
"""


def q_boolean_and_search(sf_dir: str):
    """Conjunctive boolean retrieval: documents containing ALL of
    {'window', 'merge', 'spark'} — the posting-list intersection
    behind every search AND-query.  Per batch each doc emits its
    matched-term count from three vectorized substring-token tests;
    the intersection is `matched = 3`, never a 3-way join.  Output is
    the matching doc ids plus per-term document frequencies."""
    TERMS = ("window", "merge", "spark")
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def match(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], pattern=" ")
        lens = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts)
        row = np.repeat(np.arange(len(lens)), lens)
        hits = []
        for term in TERMS:
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            h = np.zeros(len(lens), dtype=bool)
            np.logical_or.at(h, row, eq)     # per-doc ANY, vectorized
            hits.append(h.astype(np.int64))
        m = np.stack(hits)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_terms": pa.array(m.sum(axis=0)),
            "h0": pa.array(m[0]), "h1": pa.array(m[1]),
            "h2": pa.array(m[2])})

    scored = docs.map_batches(match, batch_format="pyarrow") \
        .materialize()
    from ray.data.aggregate import Sum
    dfs = scored.aggregate(Sum("h0"), Sum("h1"), Sum("h2"))
    hit_ids = relational.ds_to_table(
        scored.filter(expr="n_terms == 3")
        .select_columns(["doc_id"])).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    hit_ids["df_window"] = int(dfs["sum(h0)"])
    hit_ids["df_merge"] = int(dfs["sum(h1)"])
    hit_ids["df_spark"] = int(dfs["sum(h2)"])
    return hit_ids.astype({c: np.int64 for c in hit_ids.columns})


SQL_BOOLEAN_AND = """
WITH tok AS (SELECT doc_id,
                    unnest(string_split(text, ' ')) AS w
             FROM documents),
hit AS (SELECT doc_id,
               MAX(CASE WHEN w = 'window' THEN 1 ELSE 0 END) AS h0,
               MAX(CASE WHEN w = 'merge' THEN 1 ELSE 0 END) AS h1,
               MAX(CASE WHEN w = 'spark' THEN 1 ELSE 0 END) AS h2
        FROM tok GROUP BY 1),
dfs AS (SELECT CAST(SUM(h0) AS BIGINT) AS d0,
               CAST(SUM(h1) AS BIGINT) AS d1,
               CAST(SUM(h2) AS BIGINT) AS d2 FROM hit)
SELECT doc_id, d0 AS df_window, d1 AS df_merge, d2 AS df_spark
FROM hit, dfs WHERE h0 + h1 + h2 = 3 ORDER BY doc_id
"""


def q_snapshot_aggregate_diff(sf_dir: str):
    """Semantic diff between two time-travel snapshots: monthly
    revenue AS OF manifest v1 vs v2 with per-month deltas — the
    'what changed since yesterday's snapshot' report a lakehouse
    answers from manifests alone (no row diffing).  Reuses the
    time-travel fixture (v1 = early half, v2 = everything); months
    present only in v2 surface as pure additions.  Exact cents."""
    import json
    import os

    import ray.data as rd

    from ray.data.aggregate import Sum

    q_time_travel_read(sf_dir)              # ensure fixture exists
    root = _fingerprint_cache_dir(sf_dir, "orders", "timetravel")

    def monthly(files: list[str]):
        ds = rd.read_parquet([os.path.join(root, f) for f in files])

        def part(t: pa.Table) -> pa.Table:
            m = t["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[M]").astype(np.int64)
            cents = np.round(t["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            g = pd.DataFrame({"m": m, "c": cents}) \
                .groupby("m", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return relational.ds_to_table(
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("m").aggregate(Sum("c", alias_name="c"))
        ).to_pandas().set_index("m")["c"]

    with open(os.path.join(root, "manifest-v1.json")) as fh:
        v1_files = json.load(fh)["files"]
    with open(os.path.join(root, "manifest-v2.json")) as fh:
        v2_files = json.load(fh)["files"]
    a, b = monthly(v1_files), monthly(v2_files)
    months = sorted(set(a.index) | set(b.index))
    out = pd.DataFrame({
        "month": np.array(months, dtype=np.int64)
        .astype("datetime64[M]").astype("datetime64[us]"),
        "cents_v1": [int(a.get(m, 0)) for m in months],
        "cents_v2": [int(b.get(m, 0)) for m in months]})
    out["delta"] = out["cents_v2"] - out["cents_v1"]
    out = out[out["delta"] != 0].reset_index(drop=True)
    return out.astype({"cents_v1": np.int64, "cents_v2": np.int64,
                       "delta": np.int64})


SQL_SNAPSHOT_DIFF = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  date_trunc('month', o_orderdate) AS month,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
b AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid FROM d),
v1 AS (SELECT month, CAST(SUM(c) AS BIGINT) AS c FROM d, b
       WHERE day <= mid GROUP BY 1),
v2 AS (SELECT month, CAST(SUM(c) AS BIGINT) AS c FROM d GROUP BY 1)
SELECT CAST(v2.month AS TIMESTAMP) AS month,
       COALESCE(v1.c, 0) AS cents_v1, v2.c AS cents_v2,
       v2.c - COALESCE(v1.c, 0) AS delta
FROM v2 LEFT JOIN v1 USING (month)
WHERE v2.c - COALESCE(v1.c, 0) <> 0
ORDER BY month
"""


def q_cross_source_dup_matrix(sf_dir: str):
    """Cross-source duplication matrix: which crawls copy which —
    exact Jaccard ≥ 0.8 near-dup pairs (the recall-complete AllPairs
    kernel) rolled up to (source, source) counts via two bucketed
    joins of the pair list against the doc→source map (never a
    corpus-sized broadcast).  The inter-source cells are the mixing
    diagnostic; the diagonal is within-crawl redundancy."""
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .repartition(32)
    pairs = dd.allpairs_jaccard(docs, key_col="doc_id",
                                text_col="text",
                                jaccard_threshold=0.8, shingle_k=5)
    smap = _read(sf_dir, "documents", ["doc_id", "source"])
    j1 = relational.bucketed_hash_join(
        pairs.map_batches(lambda t: pa.table(
            {"doc_id": t["a"], "b": t["b"]}),
            batch_format="pyarrow"),
        smap, on="doc_id").map_batches(
        lambda t: pa.table({"doc_id": t["b"], "sa": t["source"]}),
        batch_format="pyarrow")
    j2 = relational.bucketed_hash_join(j1, smap, on="doc_id")

    def cell(t: pa.Table) -> pa.Table:
        sa = t["sa"].to_numpy(zero_copy_only=False)
        sb = t["source"].to_numpy(zero_copy_only=False)
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        g = pd.DataFrame({"s1": lo, "s2": hi, "n": 1}) \
            .groupby(["s1", "s2"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = relational.ds_to_table(
        j2.map_batches(cell, batch_format="pyarrow")
        .groupby(["s1", "s2"]).aggregate(Sum("n", alias_name="n"))
    ).to_pandas().sort_values(["s1", "s2"]).reset_index(drop=True)
    return out.astype({"n": np.int64})


SQL_CROSS_SOURCE_DUP = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
        FROM documents)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS ni
  FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
p AS (SELECT i.a, i.b FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a
      JOIN sizes sb ON sb.doc_id = i.b
      WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.8)
SELECT LEAST(da.source, db.source) AS s1,
       GREATEST(da.source, db.source) AS s2,
       CAST(COUNT(*) AS BIGINT) AS n
FROM p JOIN documents da ON da.doc_id = p.a
       JOIN documents db ON db.doc_id = p.b
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_corr_matrix_lineitem(sf_dir: str):
    """Full Pearson correlation matrix of four line-item measures
    (quantity, dollar price, discount %, tax %) from ONE streaming
    pass: every power sum and all six cross sums fold as exact ints
    (dollar quantization bounds Σprice² under int64 to ~10⁹ rows; the
    twin's HUGEINT has no bound), the finish evaluates each r with
    arbitrary-precision numerators cast to double exactly once —
    computing 6 correlations for the price of one table scan is the
    point."""
    from ray.data.aggregate import Sum

    COLS = ("qty", "price", "disc", "tax")
    li = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount",
                "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        v = {"qty": np.round(t["l_quantity"].to_numpy(
                zero_copy_only=False)).astype(np.int64),
             "price": np.round(t["l_extendedprice"].to_numpy(
                 zero_copy_only=False)).astype(np.int64),
             "disc": np.round(t["l_discount"].to_numpy(
                 zero_copy_only=False) * 100.0).astype(np.int64),
             "tax": np.round(t["l_tax"].to_numpy(
                 zero_copy_only=False) * 100.0).astype(np.int64)}
        row = {"n": np.array([len(v["qty"])], dtype=np.int64)}
        for i, a in enumerate(COLS):
            row[f"s_{a}"] = np.array([v[a].sum()])
            for b in COLS[i:]:
                row[f"s_{a}_{b}"] = np.array([(v[a] * v[b]).sum()])
        return pa.table({k: pa.array(x) for k, x in row.items()})

    aggs = [Sum("n", alias_name="n")]
    for i, a in enumerate(COLS):
        aggs.append(Sum(f"s_{a}", alias_name=f"s_{a}"))
        for b in COLS[i:]:
            aggs.append(Sum(f"s_{a}_{b}", alias_name=f"s_{a}_{b}"))
    tot = li.map_batches(partial, batch_format="pyarrow") \
        .aggregate(*aggs)
    n = int(tot["n"])
    s = {a: int(tot[f"s_{a}"]) for a in COLS}
    ss = {}
    for i, a in enumerate(COLS):
        for b in COLS[i:]:
            ss[(a, b)] = int(tot[f"s_{a}_{b}"])
    rows = []
    for i, a in enumerate(COLS):
        for b in COLS[i + 1:]:
            num = n * ss[(a, b)] - s[a] * s[b]
            va = n * ss[(a, a)] - s[a] * s[a]
            vb = n * ss[(b, b)] - s[b] * s[b]
            rows.append({
                "x": a, "y": b,
                "r": np.round(float(num)
                              / (np.sqrt(float(va))
                                 * np.sqrt(float(vb))), 6)})
    return pd.DataFrame(rows).sort_values(["x", "y"]) \
        .reset_index(drop=True)


SQL_CORR_MATRIX = """
WITH q AS (SELECT CAST(ROUND(l_quantity) AS HUGEINT) AS qty,
                  CAST(ROUND(l_extendedprice) AS HUGEINT) AS price,
                  CAST(ROUND(l_discount * 100) AS HUGEINT) AS disc,
                  CAST(ROUND(l_tax * 100) AS HUGEINT) AS tax
           FROM lineitem),
t AS (SELECT COUNT(*) AS n,
             SUM(qty) AS s_qty, SUM(price) AS s_price,
             SUM(disc) AS s_disc, SUM(tax) AS s_tax,
             SUM(qty * qty) AS s_qty_qty,
             SUM(qty * price) AS s_qty_price,
             SUM(qty * disc) AS s_qty_disc,
             SUM(qty * tax) AS s_qty_tax,
             SUM(price * price) AS s_price_price,
             SUM(price * disc) AS s_price_disc,
             SUM(price * tax) AS s_price_tax,
             SUM(disc * disc) AS s_disc_disc,
             SUM(disc * tax) AS s_disc_tax,
             SUM(tax * tax) AS s_tax_tax
      FROM q)
SELECT x, y, ROUND(CAST(num AS DOUBLE)
                   / (sqrt(CAST(va AS DOUBLE))
                      * sqrt(CAST(vb AS DOUBLE))), 6) AS r
FROM (
  SELECT 'qty' AS x, 'disc' AS y,
         n * s_qty_disc - s_qty * s_disc AS num,
         n * s_qty_qty - s_qty * s_qty AS va,
         n * s_disc_disc - s_disc * s_disc AS vb FROM t
  UNION ALL SELECT 'disc', 'tax',
         n * s_disc_tax - s_disc * s_tax,
         n * s_disc_disc - s_disc * s_disc,
         n * s_tax_tax - s_tax * s_tax FROM t
  UNION ALL SELECT 'price', 'disc',
         n * s_price_disc - s_price * s_disc,
         n * s_price_price - s_price * s_price,
         n * s_disc_disc - s_disc * s_disc FROM t
  UNION ALL SELECT 'price', 'tax',
         n * s_price_tax - s_price * s_tax,
         n * s_price_price - s_price * s_price,
         n * s_tax_tax - s_tax * s_tax FROM t
  UNION ALL SELECT 'qty', 'price',
         n * s_qty_price - s_qty * s_price,
         n * s_qty_qty - s_qty * s_qty,
         n * s_price_price - s_price * s_price FROM t
  UNION ALL SELECT 'qty', 'tax',
         n * s_qty_tax - s_qty * s_tax,
         n * s_qty_qty - s_qty * s_qty,
         n * s_tax_tax - s_tax * s_tax FROM t)
ORDER BY x, y
"""


def q_triangle_null_model(sf_dir: str):
    """Observed triangles vs the configuration-model expectation
    E[T] ≈ (Σd(d−1) / Σd)³ / 6 — the null-model ratio that says
    whether the link graph's clustering is real structure or just a
    degree-sequence artifact.  Degree moments fold exactly over the
    undirected simple graph (the same LEAST/GREATEST dedup the
    triangle kernel uses); the observed count reuses the
    degree-ordered O(m^1.5) kernel; the ratio is the one mirrored
    float expression."""
    from ray.data.aggregate import Sum

    from ..stages import graph_ops

    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(d, 3)
        k = np.tile(np.array([1, 2, 3], dtype=np.int64), len(d))
        return pa.table({"src": pa.array(src),
                         "dst": pa.array((src * 7919 + k * 104729) % n)})

    e = docs.map_batches(edges, batch_format="pyarrow")
    tri = int(graph_ops.triangle_count(e))
    und = graph_ops._normalize_undirected(e, "src", "dst")

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([
            t["ea"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["eb"].to_numpy(zero_copy_only=False).astype(np.int64)])
        g, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(g),
                         "c": pa.array(c.astype(np.int64))})

    degs = relational.ds_to_table(
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("c", alias_name="d"))
    ).to_pandas()["d"].to_numpy(np.int64)
    m1 = int(degs.sum())
    m2 = int((degs * (degs - 1)).sum())
    expected = (m2 / float(m1)) ** 3 / 6.0
    return pd.DataFrame([{
        "n_triangles": tri, "sum_deg": m1, "sum_deg2": m2,
        "expected": np.round(expected, 4),
        "ratio": np.round(tri / expected, 4)}]).astype({
            "n_triangles": np.int64, "sum_deg": np.int64,
            "sum_deg2": np.int64})


SQL_TRIANGLE_NULL = """
WITH raw AS (
  SELECT doc_id AS src,
         (doc_id * 7919 + k * 104729)
           % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(k)),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM e e1 JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
dg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d
       FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
       GROUP BY v),
mm AS (SELECT CAST(SUM(d) AS BIGINT) AS m1,
              CAST(SUM(d * (d - 1)) AS BIGINT) AS m2 FROM dg)
SELECT tri.t AS n_triangles, mm.m1 AS sum_deg, mm.m2 AS sum_deg2,
       ROUND(pow(mm.m2 / CAST(mm.m1 AS DOUBLE), 3) / 6.0, 4)
         AS expected,
       ROUND(tri.t / (pow(mm.m2 / CAST(mm.m1 AS DOUBLE), 3) / 6.0), 4)
         AS ratio
FROM tri, mm
"""


def q_secondary_index_lookup(sf_dir: str):
    """Secondary-index point lookup on a NON-clustered column — the
    layout-free complement to hash bucketing: orders stay physically
    range-split by o_orderkey (16 files), a sidecar inverted index
    (custkey → file) is built in one distributed per-file distinct
    pass, and an equality probe on o_custkey reads the index (pruned
    at the read) then opens ONLY the listed files.  files_opened is
    mirrorable because the file of a row is the value-range formula
    (o_orderkey − 1) // ⌈max/16⌉ on both sides; the probe key is
    MAX(o_custkey)."""
    import glob
    import os
    import uuid

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_
    import ray.data as rd

    from ray.data.aggregate import Max

    root = _fingerprint_cache_dir(sf_dir, "orders", "secindex")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    mx = int(orders.aggregate(Max("o_orderkey", alias_name="m"))["m"])
    per = -(-mx // 16)                         # ceil(max/16)
    if not os.path.isdir(root):
        tmp = f"{root}.tmp-{uuid.uuid4().hex}"
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        t = relational.ds_to_table(orders)
        f = (t["o_orderkey"].to_numpy(zero_copy_only=False)
             .astype(np.int64) - 1) // per
        for ff in np.unique(f):
            pq_.write_table(t.filter(pa.array(f == ff)),
                            os.path.join(tmp, "data",
                                         f"part={ff}.parquet"))
        # distributed index build: per-file distinct custkeys
        def per_file(t2: pa.Table) -> pa.Table:
            fk = (t2["o_orderkey"].to_numpy(zero_copy_only=False)
                  .astype(np.int64) - 1) // per
            g = pd.DataFrame({"o_custkey": t2["o_custkey"].to_numpy(
                zero_copy_only=False), "f": fk}).drop_duplicates()
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Count
        idx = relational.ds_to_table(
            orders.map_batches(per_file, batch_format="pyarrow")
            .groupby(["o_custkey", "f"]).aggregate(Count()))
        pq_.write_table(idx.select(["o_custkey", "f"]),
                        os.path.join(tmp, "index.parquet"))
        try:
            os.rename(tmp, root)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    probe = int(orders.aggregate(Max("o_custkey", alias_name="m"))["m"])
    hits = rd.read_parquet(os.path.join(root, "index.parquet"),
                           filter=(pads.field("o_custkey") == probe))
    files = sorted(int(f) for f in relational.ds_to_table(
        hits)["f"].to_pylist())
    ds = rd.read_parquet(
        [os.path.join(root, "data", f"part={f}.parquet")
         for f in files],
        filter=(pads.field("o_custkey") == probe))
    t = relational.ds_to_table(ds)
    cents = int(np.sum(np.round(
        t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0)
        .astype(np.int64)))
    return pd.DataFrame([{
        "probe_custkey": probe, "files_opened": len(files),
        "n_orders": t.num_rows, "cents": cents}]).astype({
            "probe_custkey": np.int64, "files_opened": np.int64,
            "n_orders": np.int64, "cents": np.int64})


SQL_SECONDARY_INDEX = """
WITH mx AS (SELECT MAX(o_orderkey) AS m,
                   MAX(o_custkey) AS probe FROM orders),
per AS (SELECT -((-m) // 16) AS p, probe FROM mx),
hit AS (SELECT o.*, (o.o_orderkey - 1) // per.p AS f
        FROM orders o, per WHERE o.o_custkey = per.probe)
SELECT (SELECT probe FROM per) AS probe_custkey,
       CAST(COUNT(DISTINCT f) AS BIGINT) AS files_opened,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM hit
"""


def q_codec_comparison_report(sf_dir: str):
    """Physical-design codec bake-off: the orders table written three
    times (uncompressed, snappy, zstd) through the DISTRIBUTED parquet
    writer, with on-disk bytes and compression ratios — the
    storage-tuning report every lakehouse team runs before picking a
    table default.  No SQL oracle (byte sizes are codec/build
    specific); pytest pins the ratio ordering and the row-count
    roundtrip."""
    import glob
    import os
    import shutil
    import uuid

    import ray.data as rd

    orders = _read(sf_dir, "orders", None)
    base = f"/tmp/prclz_codec_{uuid.uuid4().hex}"
    rows_in = orders.count()
    out_rows = []
    sizes = {}
    try:
        for codec in ("none", "snappy", "zstd"):
            d = os.path.join(base, codec)
            orders.write_parquet(d, compression=codec)
            sizes[codec] = sum(
                os.path.getsize(f)
                for f in glob.glob(os.path.join(d, "*.parquet")))
            rows_back = rd.read_parquet(d).count()
            out_rows.append({"codec": codec, "bytes": sizes[codec],
                             "rows": rows_back})
    finally:
        shutil.rmtree(base, ignore_errors=True)
    out = pd.DataFrame(out_rows)
    out["ratio_vs_none"] = np.round(
        out["bytes"] / float(sizes["none"]), 4)
    assert (out["rows"] == rows_in).all()
    return out.astype({"bytes": np.int64, "rows": np.int64})


def q_shingle_novelty_by_source(sf_dir: str):
    """Shingle novelty per source: of each source's distinct 5-gram
    slots, how many are FIRST INTRODUCTIONS (global min doc_id owns
    the shingle) — the marginal-diversity curve that says which crawl
    still adds new content and which only repeats the corpus.  One
    (shingle → min doc) reduce over the shared u64 polynomial, first
    counts ride a bucketed join back to the doc→source map; ratios
    are the one mirrored division per source."""
    from ray.data.aggregate import Min, Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids, gs, tot = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            hs = _shingle_set_u64(txt)
            gs.append(hs)
            ids.append(np.full(len(hs), did, dtype=np.int64))
            tot.append(len(hs))
        gall = (np.concatenate(gs) if gs
                else np.zeros(0, np.uint64)).view(np.int64)
        return pa.table({          # int64 REINTERPRET: the groupby
            "g": pa.array(gall),   # only needs equality, and pandas
            "doc_id": pa.array(    # blocks choke on u64 > 2^63
                np.concatenate(ids) if ids else np.zeros(0, np.int64))})

    intro = docs.map_batches(explode, batch_format="pyarrow") \
        .groupby("g").aggregate(Min("doc_id", alias_name="doc_id")) \
        .map_batches(lambda t: pa.table({
            "doc_id": t["doc_id"],
            "fi": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow")

    def tot_partial(t: pa.Table) -> pa.Table:
        rows = [(did, len(_shingle_set_u64(txt)))
                for did, txt in zip(t["doc_id"].to_pylist(),
                                    t["text"].to_pylist())]
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ns": pa.array([r[1] for r in rows], type=pa.int64())})

    totals = docs.map_batches(tot_partial, batch_format="pyarrow")
    smap = _read(sf_dir, "documents", ["doc_id", "source"])
    j1 = relational.bucketed_hash_join(totals, smap, on="doc_id")
    j2 = relational.bucketed_hash_join(intro, smap, on="doc_id")

    def agg(ds, col):
        def p(t: pa.Table) -> pa.Table:
            g = pd.DataFrame({
                "source": t["source"].to_numpy(zero_copy_only=False),
                col: t[col].to_numpy(zero_copy_only=False)}) \
                .groupby("source", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)
        return relational.ds_to_table(
            ds.map_batches(p, batch_format="pyarrow")
            .groupby("source").aggregate(Sum(col, alias_name=col))
        ).to_pandas().set_index("source")[col]

    ts, fs = agg(j1, "ns"), agg(j2, "fi")
    srcs = sorted(ts.index)
    out = pd.DataFrame({
        "source": srcs,
        "n_shingle_slots": [int(ts[s]) for s in srcs],
        "n_introduced": [int(fs.get(s, 0)) for s in srcs]})
    out["novelty"] = np.round(
        out["n_introduced"] / out["n_shingle_slots"].astype(
            np.float64), 6)
    return out.astype({"n_shingle_slots": np.int64,
                       "n_introduced": np.int64})


SQL_SHINGLE_NOVELTY = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
  FROM (SELECT doc_id, text,
        unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
        FROM documents)),
intro AS (SELECT g, MIN(doc_id) AS doc_id FROM sh GROUP BY g),
fi AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS fi
       FROM intro GROUP BY 1),
ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ns
       FROM sh GROUP BY 1),
per AS (SELECT d.source, SUM(ns.ns) AS slots,
               SUM(COALESCE(fi.fi, 0)) AS fsum FROM documents d
        JOIN ns USING (doc_id) LEFT JOIN fi USING (doc_id)
        GROUP BY 1)
SELECT source, CAST(slots AS BIGINT) AS n_shingle_slots,
       CAST(fsum AS BIGINT) AS n_introduced,
       ROUND(fsum / CAST(slots AS DOUBLE), 6) AS novelty
FROM per ORDER BY source
"""


def registry():
    """name → (ray_callable, oracle_sql | None)"""
    return {
        "pip_points_nations": (q_pip_points_nations, SQL_PIP),
        "pip_tiled_points_nations": (q_pip_tiled_points_nations, SQL_PIP),
        "pip_left_unmatched": (q_pip_left_unmatched, SQL_PIP_LEFT),
        "pip_semi_tiled": (q_pip_semi_tiled, SQL_PIP_SEMI),
        "pip_anti_tiled": (q_pip_anti_tiled, SQL_PIP_ANTI),
        "knn_customer_supplier": (q_knn_customer_supplier, SQL_KNN),
        "zonal_acctbal_nation": (q_zonal_acctbal_nation, SQL_ZONAL),
        "raster_grid_counts": (q_raster_grid_counts, SQL_RASTER),
        "raster_zonal_nation": (q_raster_zonal_nation, SQL_RASTER_ZONAL),
        "flagship_region_counts": (q_flagship_region_counts, SQL_FLAGSHIP),
        "flagship_counts_streaming": (q_flagship_counts_streaming, SQL_FLAGSHIP),
        "dedup_url_latest": (q_dedup_url_latest, SQL_DEDUP_URL),
        "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
        "top_orders_by_revenue": (q_top_orders_by_revenue, SQL_TOP_ORDERS),
        "nation_order_totals": (q_nation_order_totals, SQL_NATION_TOTALS),
        "bucketed_join_segment_totals": (q_bucketed_join_segment_totals, SQL_SEGMENT_TOTALS),
        "bucketed_join_string_key": (q_bucketed_join_string_key, SQL_SEGMENT_TOTALS_STR),
        "orders_status_counts": (q_orders_status_counts, SQL_STATUS),
        "topk_parts_by_price": (q_topk_parts_by_price, SQL_TOPK_PARTS),
        "distinct_event_types": (q_distinct_event_types, SQL_EVENT_TYPES),
        "semi_customers_with_orders": (q_semi_customers_with_orders, SQL_SEMI),
        "anti_customers_without_orders": (q_anti_customers_without_orders, SQL_ANTI),
        "window_user_activity": (q_window_user_activity, SQL_WINDOW),
        "asof_last_purchase": (q_asof_last_purchase, SQL_ASOF),
        "band_join_click_purchase": (q_band_join_click_purchase, SQL_BAND),
        "sample_documents": (q_sample_documents, SQL_SAMPLE),
        "exact_dedup_documents": (q_exact_dedup_documents, SQL_EXACT_DEDUP),
        "token_counts_by_lang": (q_token_counts_by_lang, SQL_TOKENS),
        "quality_stats_by_lang": (q_quality_stats_by_lang, SQL_QUALITY),
        "pii_redaction": (q_pii_redaction, SQL_PII),
        "url_canonical_dedup": (q_url_canonical_dedup, SQL_URL_CANON),
        "paragraph_dedup": (q_paragraph_dedup, SQL_PARA_DEDUP),
        "repetition_stats": (q_repetition_stats, SQL_REPETITION),
        "refinery_funnel": (q_refinery_funnel, _refinery_funnel_sql()),
        "order_share_by_status": (q_order_share_by_status, SQL_ORDER_SHARE),
        "corpus_diff": (q_corpus_diff, SQL_CORPUS_DIFF),
        "sample_n_per_lang": (q_sample_n_per_lang, SQL_SAMPLE_PER_LANG),
        "corpus_filter_decision": (q_corpus_filter_decision,
                                   SQL_CORPUS_FILTER),
        "acctbal_quantiles_nation": (q_acctbal_quantiles, SQL_QUANTILES),
        "sessionize_events": (q_sessionize_events, SQL_SESSIONIZE),
        "normalize_text": (q_normalize_text, SQL_NORMALIZE),
        "top_words": (q_top_words, SQL_TOP_WORDS),
        "approx_distinct_users": (q_approx_distinct_users, None),
        "grouped_approx_distinct": (q_grouped_approx_distinct, None),
        "corr_qty_price": (q_corr_qty_price, SQL_CORR),
        "top_orders_per_priority": (q_top_orders_per_priority, SQL_TOP_PER_PRIORITY),
        "semi_customers_bloom": (q_semi_customers_bloom, SQL_SEMI_BLOOM),
        "sliding_window_activity": (q_sliding_window_activity, SQL_SLIDING),
        "rare_word_stats": (q_rare_word_stats, SQL_RARE_WORDS),
        "ann_topk_cosine": (q_ann_topk_cosine, SQL_ANN),
        "minhash_dedup_documents": (q_minhash_dedup_documents,
                                    SQL_MINHASH_DEDUP),
        "simhash_candidate_pairs": (q_simhash_candidate_pairs, SQL_SIMHASH),
        "embedding_dup_pairs": (q_embedding_dup_pairs, SQL_EMB_DUP),
        "kmeans_assign_embeddings": (q_kmeans_assign, SQL_KMEANS_ASSIGN),
        "kmeans_fit_sizes": (q_kmeans_fit_sizes, None),
        "semantic_dup_pairs": (q_semantic_dup_pairs, SQL_SEMANTIC_DUP),
        "running_total_user": (q_running_total_user, SQL_RUNNING_TOTAL),
        "lag_user_events": (q_lag_user_events, SQL_LAG_EVENTS),
        "top_bigrams": (q_top_bigrams, SQL_TOP_BIGRAMS),
        "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF),
        "posting_lists": (q_posting_lists, SQL_POSTINGS),
        "stratified_sample_docs": (q_stratified_sample_docs,
                                   SQL_STRATIFIED),
        "hash_split_docs": (q_hash_split_docs, SQL_HASH_SPLIT),
        "rollup_orders": (q_rollup_orders, SQL_ROLLUP),
        "cube_orders": (q_cube_orders, SQL_CUBE),
        "ngram_diversity": (q_ngram_diversity, SQL_NGRAM_DIVERSITY),
        "ntile_user_value": (q_ntile_user_value, SQL_NTILE),
        "salted_join_hot_key": (q_salted_join_hot_key, SQL_SALTED),
        "json_field_stats": (q_json_field_stats, SQL_JSON_FIELD),
        "duplicate_spans": (q_duplicate_spans, SQL_DUP_SPANS),
        "window_distinct_users": (q_window_distinct_users,
                                  SQL_WINDOW_DISTINCT),
        "approx_quantiles_price": (q_approx_quantiles_price, None),
        "grouped_approx_quantiles": (q_grouped_approx_quantiles, None),
        "full_outer_click_purchase": (q_full_outer_click_purchase,
                                      SQL_FULL_OUTER),
        "pivot_orders_status": (q_pivot_orders, SQL_PIVOT_ORDERS),
        "langid_documents": (q_langid_documents, SQL_LANGID),
        "ngram_jaccard_sampled": (q_ngram_jaccard_sampled, SQL_NGRAM_JACCARD),
        "fingerprint_documents": (q_fingerprint_documents, SQL_FINGERPRINT),
        "ann_ivf_topk": (q_ann_ivf, None),
        "ann_ivf_recall": (q_ann_ivf_recall, None),
        "blocks_fixture": (q_blocks_fixture, SQL_BLOCKS_FIXTURE),
        "complexity_fixture": (q_complexity_fixture, SQL_COMPLEXITY_FIXTURE),
        "parcels_fixture": (q_parcels_fixture, SQL_PARCELS_FIXTURE),
        "reblock_fixture": (q_reblock_fixture, SQL_REBLOCK_FIXTURE),
        "decontaminate_ngrams": (q_decontaminate_ngrams, SQL_DECONTAMINATE),
        "domain_boilerplate": (q_domain_boilerplate, SQL_DOMAIN_BOILER),
        "heavy_hitter_words": (q_heavy_hitter_words, SQL_HEAVY_HITTERS),
        "intersect_users": (q_intersect_users, SQL_INTERSECT_USERS),
        "except_users": (q_except_users, SQL_EXCEPT_USERS),
        "compression_quality": (q_compression_quality, None),
        "triangle_count_links": (q_triangle_count, SQL_TRIANGLES),
        "pagerank_links": (q_pagerank_links, SQL_PAGERANK),
        "connected_components_chain": (q_connected_components_chain,
                                       SQL_COMPONENTS_CHAIN),
        "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
        "bpe_merges": (q_bpe_merges, None),
        "lead_user_events": (q_lead_user_events, SQL_LEAD_EVENTS),
        "zscore_acctbal": (q_zscore_acctbal, SQL_ZSCORE),
        "logreg_score": (q_logreg_score, SQL_LOGREG_SCORE),
        "logreg_train": (q_logreg_train, None),
        "funnel_click_purchase": (q_funnel_click_purchase, SQL_FUNNEL),
        "cohort_retention": (q_cohort_retention, SQL_COHORT),
        "rank_events_user": (q_rank_events_user, SQL_RANKS),
        "moving_sum_user": (q_moving_sum_user, SQL_MOVING),
        "nb_predict_lang": (q_nb_predict_lang, SQL_NB_PREDICT),
        "chunk_documents": (q_chunk_documents, SQL_CHUNKS),
        "reassemble_roundtrip": (q_reassemble_roundtrip,
                                 SQL_REASSEMBLE),
        "length_batches_docs": (q_length_batches, SQL_LENGTH_BATCHES),
        "geohash_points": (q_geohash_points, _sql_geohash_points()),
        "geohash_cell_counts": (q_geohash_cell_counts,
                                _sql_geohash_cell_counts()),
        "mixture_sample_langs": (q_mixture_sample, SQL_MIXTURE),
        "mode_event_per_user": (q_mode_event_per_user, SQL_MODE),
        "docs_above_median": (q_docs_above_median, SQL_ABOVE_MEDIAN),
        "value_band_lookup": (q_value_band_lookup, SQL_VALUE_BAND),
        "event_type_pairs": (q_event_type_pairs, SQL_EVENT_PAIRS),
        "pmi_unigram_collocations": (q_pmi_unigram_collocations,
                                     SQL_PMI_UNIGRAM),
        "bpe_token_counts": (q_bpe_token_counts, None),
        "sample_fixed_docs": (q_sample_fixed_docs, SQL_SAMPLE_FIXED),
        "q3_shipping_priority": (q3_shipping_priority, SQL_Q3),
        "q5_local_supplier_volume": (q5_local_supplier_volume, SQL_Q5),
        "q6_forecast_revenue": (q6_forecast_revenue, SQL_Q6),
        "profile_orders": (q_profile_orders, SQL_PROFILE),
        "bm25_search": (q_bm25_search, SQL_BM25),
        "clean_lines_docs": (q_clean_lines, SQL_CLEAN_LINES),
        "q12_shipmode_priority": (q12_shipmode_priority, SQL_Q12),
        "q7_volume_shipping": (q7_volume_shipping, SQL_Q7),
        "q8_market_share": (q8_market_share, SQL_Q8),
        "q10_returned_items": (q10_returned_items, SQL_Q10),
        "latest_event_per_user": (q_latest_event_per_user,
                                  SQL_LATEST_EVENT),
        "regr_price_quantity": (q_regr_price_quantity, SQL_REGR),
        "lm_perplexity_documents": (q_lm_perplexity, SQL_LM_PERPLEXITY),
        "char_entropy_documents": (q_char_entropy, SQL_CHAR_ENTROPY),
        "multimodal_decode": (q_multimodal_decode, None),
        "media_dup_pairs": (q_media_dup_pairs, None),
        "media_perceptual_pairs": (q_media_perceptual_pairs, None),
        "pareto_orders": (q_pareto_orders, SQL_PARETO),
        "jaccard_threshold_pairs": (q_jaccard_threshold_pairs,
                                    SQL_JACCARD_PAIRS),
        "user_event_paths": (q_user_event_paths, SQL_EVENT_PATHS),
        "auc_doc_score": (q_auc_doc_score, SQL_AUC),
        "jsonl_source_stats": (q_jsonl_source_stats, SQL_JSONL_STATS),
        "ab_test_event_value": (q_ab_test_event_value, SQL_AB_TEST),
        "chi2_event_cohort": (q_chi2_event_cohort, SQL_CHI2),
        "repeat_orders_1d": (q_repeat_orders_1d, SQL_REPEAT_ORDERS),
        "event_transition_matrix": (q_event_transition_matrix,
                                    SQL_TRANSITIONS),
        "merge_upsert_documents": (q_merge_upsert_documents,
                                   SQL_MERGE_UPSERT),
        "harmonized_union_counts": (q_harmonized_union_counts,
                                    SQL_HARMONIZED_UNION),
        "minmax_scale_acctbal": (q_minmax_scale_acctbal,
                                 SQL_MINMAX_SCALE),
        "dup_cluster_size_histogram": (q_dup_cluster_size_histogram,
                                       SQL_DUP_HISTOGRAM),
        "embedding_mean_by_label": (q_embedding_mean_by_label,
                                    SQL_EMB_MEAN),
        "acctbal_outliers": (q_acctbal_outliers, SQL_ACCTBAL_OUTLIERS),
        "monthly_revenue_growth": (q_monthly_revenue_growth,
                                   SQL_MONTHLY_GROWTH),
        "longest_daily_streak": (q_longest_daily_streak,
                                 SQL_DAILY_STREAK),
        "jaccard_dup_clusters": (q_jaccard_dup_clusters,
                                 SQL_JACCARD_CLUSTERS),
        "weighted_sample_docs": (q_weighted_sample_docs,
                                 SQL_WEIGHTED_SAMPLE),
        "embedding_projection": (q_embedding_projection,
                                 SQL_EMB_PROJECTION),
        "degree_histogram_links": (q_degree_histogram_links,
                                   SQL_DEGREE_HIST),
        "monthly_order_stats": (q_monthly_order_stats,
                                SQL_MONTHLY_ORDERS),
        "fuzzy_match_pairs": (q_fuzzy_match_pairs, SQL_FUZZY_PAIRS),
        "fuzzy_entity_clusters": (q_fuzzy_entity_clusters,
                                  SQL_FUZZY_CLUSTERS),
        "q4_order_priority": (q4_order_priority, SQL_Q4),
        "q13_customer_distribution": (q13_customer_distribution,
                                      SQL_Q13),
        "q14_promo_revenue": (q14_promo_revenue, SQL_Q14),
        "q15_top_supplier": (q15_top_supplier, SQL_Q15),
        "q9_product_profit": (q9_product_profit, SQL_Q9),
        "q11_important_stock": (q11_important_stock, SQL_Q11),
        "q2_min_cost_supplier": (q2_min_cost_supplier, SQL_Q2),
        "q16_supplier_part_counts": (q16_supplier_part_counts, SQL_Q16),
        "q20_excess_inventory": (q20_excess_inventory, SQL_Q20),
        "q17_small_quantity_revenue": (q17_small_quantity_revenue,
                                       SQL_Q17),
        "q18_large_orders": (q18_large_orders, SQL_Q18),
        "q19_disjunctive_revenue": (q19_disjunctive_revenue, SQL_Q19),
        "q21_blocking_supplier": (q21_blocking_supplier, SQL_Q21),
        "q22_sales_opportunity": (q22_sales_opportunity, SQL_Q22),
        "ccnet_ppl_filter": (q_ccnet_ppl_filter, SQL_CCNET_FILTER),
        "audience_overlap": (q_audience_overlap, None),
        "zipf_slope": (q_zipf_slope, SQL_ZIPF),
        "debounce_events": (q_debounce_events, SQL_DEBOUNCE),
        "trending_events_hourly": (q_trending_events_hourly,
                                   SQL_TRENDING),
        "hits_links": (q_hits_links, SQL_HITS),
        "label_propagation_links": (q_label_propagation_links,
                                    SQL_LABEL_PROP),
        "bfs_hops_links": (q_bfs_hops_links, SQL_BFS_HOPS),
        "ewma_user_value": (q_ewma_user_value, SQL_EWMA),
        "sssp_links": (q_sssp_links, SQL_SSSP),
        "mad_outliers_acctbal": (q_mad_outliers_acctbal,
                                 SQL_MAD_OUTLIERS),
        "k_core_links": (q_k_core_links, _sql_k_core()),
        "gap_fill_daily_revenue": (q_gap_fill_daily_revenue,
                                   SQL_GAP_FILL),
        "top_parts_per_brand_ties": (q_top_parts_per_brand_ties,
                                     SQL_TOP_BRAND_TIES),
        "sentence_stats_by_lang": (q_sentence_stats_by_lang,
                                   SQL_SENTENCE_STATS),
        "stationary_event_dist": (q_stationary_event_dist,
                                  _sql_stationary()),
        "rrf_fusion_search": (q_rrf_fusion_search, SQL_RRF),
        "embedding_var_by_label": (q_embedding_var_by_label,
                                   SQL_EMB_VAR),
        "trimmed_mean_acctbal": (q_trimmed_mean_acctbal,
                                 SQL_TRIMMED_MEAN),
        "within_doc_line_dedup": (q_within_doc_line_dedup,
                                  SQL_WITHIN_DOC_DEDUP),
        "acctbal_histogram_nation": (q_acctbal_histogram_nation,
                                     SQL_ACCTBAL_HIST),
        "local_clustering_links": (q_local_clustering_links,
                                   SQL_LOCAL_CLUSTERING),
        "fk_integrity_audit": (q_fk_integrity_audit, SQL_FK_AUDIT),
        "systematic_sample_events": (q_systematic_sample_events,
                                     SQL_SYSTEMATIC_SAMPLE),
        "daily_revenue_anomalies": (q_daily_revenue_anomalies,
                                    SQL_DAILY_ANOMALIES),
        "value_rank_distribution_events": (
            q_value_rank_distribution_events, SQL_VALUE_RANKS),
        "morton_index_points": (q_morton_index_points, _sql_morton()),
        "k_anonymity_audit": (q_k_anonymity_audit, SQL_K_ANONYMITY),
        "score_calibration_bins": (q_score_calibration_bins,
                                   SQL_CALIBRATION),
        "doc_length_percentiles": (q_doc_length_percentiles,
                                   SQL_DOC_PERCENTILES),
        "churn_labels": (q_churn_labels, SQL_CHURN),
        "degree_assortativity_links": (q_degree_assortativity_links,
                                       SQL_ASSORTATIVITY),
        "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
        "readability_scores": (q_readability_scores, SQL_READABILITY),
        "type_affinity_lift": (q_type_affinity_lift,
                               SQL_TYPE_AFFINITY),
        "adaptive_join_detects_skew": (q_adaptive_join_detects_skew,
                                       SQL_ADAPTIVE_JOIN),
        "negative_samples_docs": (q_negative_samples_docs,
                                  SQL_NEGATIVE_SAMPLES),
        "preference_pairs": (q_preference_pairs,
                             SQL_PREFERENCE_PAIRS),
        "ipc_source_stats": (q_ipc_source_stats, SQL_IPC_STATS),
        "fulfillment_latency_histogram": (
            q_fulfillment_latency_histogram, SQL_FULFILLMENT),
        "gini_customer_revenue": (q_gini_customer_revenue, SQL_GINI),
        "fano_event_type": (q_fano_event_type, SQL_FANO),
        "source_overlap_jaccard": (q_source_overlap_jaccard,
                                   SQL_SOURCE_OVERLAP),
        "benford_leading_digit": (q_benford_leading_digit, SQL_BENFORD),
        "hhi_nation_revenue": (q_hhi_nation_revenue, SQL_HHI),
        "event_entropy_user": (q_event_entropy_user, SQL_EVENT_ENTROPY),
        "open_orders_per_day": (q_open_orders_per_day, SQL_OPEN_ORDERS),
        "weighted_median_price": (q_weighted_median_price,
                                  SQL_WEIGHTED_MEDIAN),
        "event_trigrams": (q_event_trigrams, SQL_EVENT_TRIGRAMS),
        "kaplan_meier_retention": (q_kaplan_meier_retention,
                                   SQL_KAPLAN_MEIER),
        "part_copurchase_pairs": (q_part_copurchase_pairs,
                                  SQL_COPURCHASE),
        "nation_revenue_share_in_region": (
            q_nation_revenue_share_in_region, SQL_NATION_SHARE),
        "psi_price_drift": (q_psi_price_drift, SQL_PSI),
        "activity_bitmap_users": (q_activity_bitmap_users,
                                  SQL_ACTIVITY_BITMAP),
        "late_events_watermark": (q_late_events_watermark,
                                  SQL_LATE_EVENTS),
        "first_touch_attribution": (q_first_touch_attribution,
                                    SQL_FIRST_TOUCH),
        "graph_reciprocity": (q_graph_reciprocity, SQL_RECIPROCITY),
        "twap_user_value": (q_twap_user_value, SQL_TWAP),
        "largest_id_gaps": (q_largest_id_gaps, SQL_ID_GAPS),
        "equidepth_deciles_price": (q_equidepth_deciles_price,
                                    SQL_EQUIDEPTH),
        "trailing_30d_revenue": (q_trailing_30d_revenue,
                                 SQL_TRAILING_30D),
        "winsorized_mean_acctbal": (q_winsorized_mean_acctbal,
                                    SQL_WINSORIZED),
        "skewness_acctbal_nation": (q_skewness_acctbal_nation,
                                    SQL_SKEWNESS),
        "distinct_users_per_type": (q_distinct_users_per_type,
                                    SQL_DISTINCT_USERS),
        "ivm_orders_status": (q_ivm_orders_status, SQL_IVM),
        "order_total_reconciliation": (q_order_total_reconciliation,
                                       SQL_RECONCILIATION),
        "fulfillment_latency_percentiles": (
            q_fulfillment_latency_percentiles, SQL_FULFILLMENT_PCT),
        "csv_quarantine_stats": (q_csv_quarantine_stats,
                                 SQL_CSV_QUARANTINE),
        "border_distance_nation": (q_border_distance_nation,
                                   SQL_BORDER_DIST),
        "user_path_length": (q_user_path_length, SQL_USER_PATH),
        "scd2_user_type": (q_scd2_user_type, SQL_SCD2),
        "hopping_window_counts": (q_hopping_window_counts, SQL_HOPPING),
        "acf_daily_revenue": (q_acf_daily_revenue, SQL_ACF),
        "mannwhitney_value_by_type": (q_mannwhitney_value_by_type,
                                      SQL_MANNWHITNEY),
        "percentile_cont_price": (q_percentile_cont_price,
                                  SQL_PERCENTILE_CONT),
        "target_encoding_loo": (q_target_encoding_loo, SQL_TARGET_ENC),
        "spearman_qty_discount": (q_spearman_qty_discount, SQL_SPEARMAN),
        "kendall_tau_discount_tax": (q_kendall_tau_discount_tax,
                                     SQL_KENDALL),
        "percent_rank_acctbal": (q_percent_rank_acctbal,
                                 SQL_PERCENT_RANK),
        "isoweek_revenue": (q_isoweek_revenue, SQL_ISOWEEK),
        "cusum_daily_revenue": (q_cusum_daily_revenue, SQL_CUSUM),
        "welch_ttest_value": (q_welch_ttest_value, SQL_WELCH),
        "ks_test_2sample": (q_ks_test_2sample, SQL_KS_TEST),
        "max_drawdown_revenue": (q_max_drawdown_revenue,
                                 SQL_MAX_DRAWDOWN),
        "ohlc_daily_value": (q_ohlc_daily_value, SQL_OHLC),
        "longest_event_run": (q_longest_event_run, SQL_LONGEST_RUN),
        "jarque_bera_discount": (q_jarque_bera_discount,
                                 SQL_JARQUE_BERA),
        "unpivot_lineitem_measures": (q_unpivot_lineitem_measures,
                                      SQL_UNPIVOT),
        "grouped_percentile_cont": (q_grouped_percentile_cont,
                                    SQL_GROUPED_PCTL),
        "pca_top_component": (q_pca_top_component, None),
        "orc_source_stats": (q_orc_source_stats, SQL_ORC_STATS),
        "hive_pruned_scan": (q_hive_pruned_scan, SQL_HIVE_PRUNED),
        "schema_evolution_stats": (q_schema_evolution_stats,
                                   SQL_SCHEMA_EVOLUTION),
        "pmi_collocations": (q_pmi_collocations, SQL_PMI),
        "grouping_sets_orders": (q_grouping_sets_orders,
                                 SQL_GROUPING_SETS),
        "user_event_journey": (q_user_event_journey, SQL_JOURNEY),
        "link_prediction_cn": (q_link_prediction_cn, SQL_LINK_PRED),
        "neighbor_jaccard_topk": (q_neighbor_jaccard_topk,
                                  SQL_NEIGHBOR_JACCARD),
        "json_props_stats": (q_json_props_stats, SQL_JSON_PROPS),
        "mst_links": (q_mst_links, None),
        "k_truss_links": (q_k_truss_links, None),
        "cume_dist_acctbal": (q_cume_dist_acctbal, SQL_CUME_DIST),
        "cdc_soft_delete_read": (q_cdc_soft_delete_read,
                                 SQL_CDC_SOFT_DELETE),
        "zonemap_pruned_scan": (q_zonemap_pruned_scan, SQL_ZONEMAP),
        "langid_confusion": (q_langid_confusion, SQL_LANGID_CONFUSION),
        "langid_precision_recall": (q_langid_precision_recall,
                                    SQL_LANGID_PR),
        "media_thumbnails": (q_media_thumbnails, None),
        "time_travel_read": (q_time_travel_read, SQL_TIME_TRAVEL),
        "stratified_kfold": (q_stratified_kfold, SQL_STRATIFIED_KFOLD),
        "shuffle_skew_report": (q_shuffle_skew_report, SQL_SKEW_REPORT),
        "rfm_segmentation": (q_rfm_segmentation, SQL_RFM),
        "skipgram_event_pairs": (q_skipgram_event_pairs, SQL_SKIPGRAM),
        "mom_revenue_growth": (q_mom_revenue_growth, SQL_MOM_GROWTH),
        "dow_seasonality_index": (q_dow_seasonality_index,
                                  SQL_DOW_SEASONALITY),
        "funnel_conversion_1h": (q_funnel_conversion_1h, SQL_FUNNEL_1H),
        "abc_analysis_parts": (q_abc_analysis_parts, SQL_ABC),
        "encoding_anomaly_scan": (q_encoding_anomaly_scan,
                                  SQL_ENCODING_SCAN),
        "two_proportion_ztest": (q_two_proportion_ztest,
                                 SQL_TWO_PROP_Z),
        "bearing_sector_histogram": (q_bearing_sector_histogram,
                                     SQL_BEARING_SECTORS),
        "control_chart_revenue": (q_control_chart_revenue,
                                  SQL_CONTROL_CHART),
        "join_cardinality_exact": (q_join_cardinality_exact,
                                   SQL_JOIN_CARD),
        "reorder_interval_histogram": (q_reorder_interval_histogram,
                                       SQL_REORDER_INTERVALS),
        "catalog_row_counts": (q_catalog_row_counts,
                               SQL_CATALOG_COUNTS),
        "cumulative_unique_users": (q_cumulative_unique_users,
                                    SQL_CUM_UNIQUE_USERS),
        "top1pct_revenue_share": (q_top1pct_revenue_share,
                                  SQL_TOP1PCT),
        "median_order_by_segment": (q_median_order_by_segment,
                                    SQL_MEDIAN_SEGMENT),
        "weekday_priority_heatmap": (q_weekday_priority_heatmap,
                                     SQL_WEEKDAY_HEATMAP),
        "clustered_layout_audit": (q_clustered_layout_audit, None),
        "bloom_pruned_scan": (q_bloom_pruned_scan, SQL_BLOOM_SCAN),
        "manifest_vacuum": (q_manifest_vacuum, SQL_MANIFEST_VACUUM),
        "rolling_median_7d": (q_rolling_median_7d, SQL_ROLLING_MEDIAN),
        "interval_overlap_degree": (q_interval_overlap_degree,
                                    SQL_OVERLAP_DEGREE),
        "ols2_price_model": (q_ols2_price_model, _sql_ols2()),
        "grid_dbscan_clusters": (q_grid_dbscan_clusters,
                                 SQL_GRID_DBSCAN),
        "phrase_search": (q_phrase_search, SQL_PHRASE_SEARCH),
        "window_cooccurrence": (q_window_cooccurrence,
                                SQL_WINDOW_COOCCUR),
        "keyness_by_source": (q_keyness_by_source, SQL_KEYNESS),
        "merkle_replica_diff": (q_merkle_replica_diff, SQL_MERKLE_DIFF),
        "staypoints_daily_cells": (q_staypoints_daily_cells,
                                   SQL_STAYPOINTS),
        "holt_forecast_revenue": (q_holt_forecast_revenue,
                                  SQL_HOLT_FORECAST),
        "zorder_pruned_scan": (q_zorder_pruned_scan, SQL_ZORDER_SCAN),
        "tile_pyramid_counts": (q_tile_pyramid_counts,
                                _sql_tile_pyramid()),
        "vocab_drift_psi": (q_vocab_drift_psi, SQL_VOCAB_PSI),
        "skyline_parts": (q_skyline_parts, SQL_SKYLINE),
        "funnel_3step_strict": (q_funnel_3step_strict,
                                SQL_FUNNEL_3STEP),
        "range_rebalance_layout": (q_range_rebalance_layout,
                                   SQL_RANGE_REBALANCE),
        "cuped_adjusted_ab": (q_cuped_adjusted_ab, SQL_CUPED),
        "regex_routing_table": (q_regex_routing_table, _sql_routing()),
        "paginate_orders_page6": (q_paginate_orders_page6,
                                  SQL_PAGINATE),
        "expectations_audit": (q_expectations_audit, SQL_EXPECTATIONS),
        "changepoint_daily_revenue": (q_changepoint_daily_revenue,
                                      SQL_CHANGEPOINT),
        "next_event_prediction_acc": (q_next_event_prediction_acc,
                                      SQL_NEXT_EVENT),
        "k_anon_generalize": (q_k_anon_generalize, SQL_K_ANON),
        "theilsen_slope_revenue": (q_theilsen_slope_revenue,
                                   SQL_THEILSEN),
        "poststratification_weights": (q_poststratification_weights,
                                       SQL_POSTSTRAT),
        "convex_hull_nations": (q_convex_hull_nations, None),
        "type_daily_corr": (q_type_daily_corr, SQL_TYPE_CORR),
        "nn_distance_histogram": (q_nn_distance_histogram,
                                  SQL_NN_HISTOGRAM),
        "dau_overlap_jaccard": (q_dau_overlap_jaccard,
                                SQL_DAU_OVERLAP),
        "grouped_ols_by_flag": (q_grouped_ols_by_flag,
                                _sql_grouped_ols()),
        "personalized_pagerank": (q_personalized_pagerank,
                                  _sql_personalized_pagerank()),
        "partition_evolution_read": (q_partition_evolution_read,
                                     SQL_SPEC_EVOLUTION),
        "bucketed_layout_scan": (q_bucketed_layout_scan,
                                 SQL_BUCKETED_SCAN),
        "analyze_column_stats": (q_analyze_column_stats, SQL_ANALYZE),
        "dp_noisy_counts": (q_dp_noisy_counts, SQL_DP_COUNTS),
        "dict_encode_priority": (q_dict_encode_priority,
                                 SQL_DICT_ENCODE),
        "rectangle_count_links": (q_rectangle_count_links,
                                  SQL_RECTANGLES),
        "mase_seasonal_naive": (q_mase_seasonal_naive, SQL_MASE),
        "occupied_cell_perimeter": (q_occupied_cell_perimeter,
                                    SQL_CELL_PERIMETER),
        "median_ci_orderstats": (q_median_ci_orderstats,
                                 SQL_MEDIAN_CI),
        "attribution_rules_compare": (q_attribution_rules_compare,
                                      SQL_ATTRIBUTION),
        "pip_donut_nations": (q_pip_donut_nations, SQL_PIP_DONUT),
        "vocab_growth_checkpoints": (q_vocab_growth_checkpoints,
                                     SQL_VOCAB_GROWTH),
        "anti_join_null_semantics": (q_anti_join_null_semantics,
                                     SQL_ANTI_NULL),
        "morans_i_nation_revenue": (q_morans_i_nation_revenue,
                                    SQL_MORANS_I),
        "cohens_kappa_langid": (q_cohens_kappa_langid,
                                _sql_cohens_kappa()),
        "tsp_nn_tour": (q_tsp_nn_tour, None),
        "users_all_event_types": (q_users_all_event_types,
                                  SQL_DIVISION),
        "cluster_merge_join": (q_cluster_merge_join,
                               SQL_CLUSTER_MERGE),
        "mcc_langid": (q_mcc_langid, _sql_mcc_langid()),
        "bom_explosion": (q_bom_explosion, SQL_BOM),
        "stump_candidates_discount": (q_stump_candidates_discount,
                                      SQL_STUMP),
        "seasonal_decompose_revenue": (q_seasonal_decompose_revenue,
                                       SQL_SEASONAL),
        "countmin_word_freq": (q_countmin_word_freq,
                               _sql_countmin()),
        "locf_impute_value": (q_locf_impute_value, SQL_LOCF),
        "bipartite_check_links": (q_bipartite_check_links,
                                  SQL_BIPARTITE),
        "frequent_triples_events": (q_frequent_triples_events,
                                    SQL_TRIPLES),
        "diff_in_diff_value": (q_diff_in_diff_value, SQL_DID),
        "mutual_info_discount_flag": (q_mutual_info_discount_flag,
                                      SQL_MUTUAL_INFO),
        "script_mix_by_source": (q_script_mix_by_source,
                                 _sql_script_mix()),
        "golden_record_entities": (q_golden_record_entities,
                                   SQL_GOLDEN_RECORD),
        "bag_intersect_users": (q_bag_intersect_users,
                                SQL_BAG_INTERSECT),
        "bootstrap_ci_daily_revenue": (q_bootstrap_ci_daily_revenue,
                                       SQL_BOOTSTRAP),
        "pivot_scc_links": (q_pivot_scc_links, SQL_PIVOT_SCC),
        "activity_decay_curve": (q_activity_decay_curve,
                                 SQL_ACTIVITY_DECAY),
        "l_diversity_audit": (q_l_diversity_audit, SQL_L_DIVERSITY),
        "asof_forward_click_purchase": (q_asof_forward_click_purchase,
                                        SQL_ASOF_FORWARD),
        "windowed_dedup_events": (q_windowed_dedup_events,
                                  SQL_WINDOWED_DEDUP),
        "code_switch_docs": (q_code_switch_docs, _sql_code_switch()),
        "interarrival_stats_by_type": (q_interarrival_stats_by_type,
                                       SQL_INTERARRIVAL),
        "roc_points_doc_score": (q_roc_points_doc_score,
                                 _sql_roc_points()),
        "dow_adjusted_anomalies": (q_dow_adjusted_anomalies,
                                   SQL_DOW_ANOMALIES),
        "temporal_reachability_links": (q_temporal_reachability_links,
                                        _sql_temporal_reach()),
        "source_cosine_similarity": (q_source_cosine_similarity,
                                     SQL_SOURCE_COSINE),
        "containment_pairs_sampled": (q_containment_pairs_sampled,
                                      SQL_CONTAINMENT),
        "length_percentile_by_source": (q_length_percentile_by_source,
                                        SQL_LENGTH_PCT),
        "lorenz_deciles_nation": (q_lorenz_deciles_nation,
                                  SQL_LORENZ),
        "wasserstein_length_drift": (q_wasserstein_length_drift,
                                     SQL_WASSERSTEIN),
        "powerlaw_alpha_links": (q_powerlaw_alpha_links,
                                 SQL_POWERLAW_ALPHA),
        "revenue_recognition_daily": (q_revenue_recognition_daily,
                                      SQL_REVENUE_RECOGNITION),
        "brier_decomposition": (q_brier_decomposition, SQL_BRIER),
        "sorted_neighborhood_pairs": (q_sorted_neighborhood_pairs,
                                      SQL_SNM_PAIRS),
        "interp_impute_value": (q_interp_impute_value,
                                SQL_INTERP_IMPUTE),
        "source_set_cover": (q_source_set_cover,
                             _sql_setcover_rounds(5)),
        "seasonal_residual_outliers": (q_seasonal_residual_outliers,
                                       SQL_SEASONAL_OUTLIERS),
        "anf_effective_diameter": (q_anf_effective_diameter, None),
        "mmr_diversified_topk": (q_mmr_diversified_topk,
                                 _sql_mmr_rounds(5)),
        "quantile_treatment_effect": (q_quantile_treatment_effect,
                                      SQL_QTE),
        "exact_heavy_hitters": (q_exact_heavy_hitters, SQL_EXACT_HH),
        "harmonic_centrality_pivots": (q_harmonic_centrality_pivots,
                                       _sql_harmonic_pivots()),
        "item_item_recs": (q_item_item_recs, SQL_ITEM_RECS),
        "blocking_recall_compare": (q_blocking_recall_compare,
                                    SQL_BLOCKING_RECALL),
        "getis_ord_hotspots": (q_getis_ord_hotspots, SQL_GETIS_ORD),
        "rolling_origin_backtest": (q_rolling_origin_backtest,
                                    SQL_ROLLING_ORIGIN),
        "ivm_join_view_nation": (q_ivm_join_view_nation,
                                 SQL_IVM_JOIN),
        "logrank_test_retention": (q_logrank_test_retention,
                                   SQL_LOGRANK),
        "cdc_chunking_stats": (q_cdc_chunking_stats,
                               _sql_cdc_stats()),
        "mutual_nn_pairs": (q_mutual_nn_pairs, SQL_MUTUAL_NN),
        "business_days_to_ship": (q_business_days_to_ship,
                                  _sql_business_days()),
        "deterministic_random_walks": (q_deterministic_random_walks,
                                       SQL_RANDOM_WALKS),
        "cohort_ltv_curve": (q_cohort_ltv_curve, SQL_COHORT_LTV),
        "conformal_threshold_fpr": (q_conformal_threshold_fpr,
                                    SQL_CONFORMAL),
        "selectivity_independence_audit": (
            q_selectivity_independence_audit, SQL_SELECTIVITY),
        "er_transitivity_audit": (q_er_transitivity_audit,
                                  SQL_ER_TRANSITIVITY),
        "ransac_price_line": (q_ransac_price_line, SQL_RANSAC),
        "boolean_and_search": (q_boolean_and_search, SQL_BOOLEAN_AND),
        "snapshot_aggregate_diff": (q_snapshot_aggregate_diff,
                                    SQL_SNAPSHOT_DIFF),
        "cross_source_dup_matrix": (q_cross_source_dup_matrix,
                                    SQL_CROSS_SOURCE_DUP),
        "corr_matrix_lineitem": (q_corr_matrix_lineitem,
                                 SQL_CORR_MATRIX),
        "triangle_null_model": (q_triangle_null_model,
                                SQL_TRIANGLE_NULL),
        "secondary_index_lookup": (q_secondary_index_lookup,
                                   SQL_SECONDARY_INDEX),
        "codec_comparison_report": (q_codec_comparison_report, None),
        "shingle_novelty_by_source": (q_shingle_novelty_by_source,
                                      SQL_SHINGLE_NOVELTY),
    }
