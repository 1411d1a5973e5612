"""Driver-contract queries: each named pipeline + its DuckDB oracle twin.

Every entry is a Ray-Data-first implementation of an operator family from
SURVEY.md §2 or a training-data op (dedup / similarity / text analysis /
multimodal), over the driver's TPC-H-ish parquet tables.  Column names are
IDENTICAL between the Ray pipeline and the SQL twin (the driver's compare
sorts columns by name and value-hashes).  Floating aggregates are rounded
on both sides so the hash compare is exact.

Ray is initialised by the DRIVER — nothing here calls ray.init().
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions._partitions import auto_num_partitions, coarse_part_key


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _round_col(t: pa.Table, name: str, dp: int) -> pa.Table:
    i = t.column_names.index(name)
    return t.set_column(i, name, pc.round(t.column(name), ndigits=dp))


def _half_away(m: np.ndarray) -> np.ndarray:
    """DuckDB ``round()``: half AWAY from zero (np.round is half-to-even)."""
    return (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)


def _int_scale_col(t: pa.Table, name: str, scale: int) -> pa.Table:
    """Float column -> scaled BIGINT (x*scale rounded). Integer outputs make
    the driver's string-based value-hash immune to 1-ulp float divergence
    between pyarrow and DuckDB rounding."""
    i = t.column_names.index(name)
    scaled = pc.round(pc.multiply(t.column(name), float(scale)))
    return t.set_column(i, name, pc.cast(scaled, pa.int64()))


# ---------------------------------------------------------------------------
# relational core (reference operator families: aggregation, filter/project,
# broadcast join, sort/top-k — SURVEY.md §2.3, §2.6, §2.7)
# ---------------------------------------------------------------------------


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with per-batch PRE-AGGREGATION
    (combiner before the shuffle — SURVEY.md §7.3 / ray_guide 'Aggregation
    at scale')."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("revenue", rev)
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_price=("l_extendedprice", "sum"),
            revenue=("revenue", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price", alias_name="sum_price"),
            Sum("revenue", alias_name="revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )
    return out.map_batches(
        lambda t: _int_scale_col(_int_scale_col(_int_scale_col(t, "sum_qty", 100), "sum_price", 100), "revenue", 100),
        batch_format="pyarrow",
    )


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 100) AS BIGINT)                           AS sum_qty,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT)                      AS sum_price,
       CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT) AS revenue,
       count(*)                                               AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_filter_revenue(sf_dir: str):
    """Vectorized filter + computed projection (column-pruned read)."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], 45))
        rev = pc.cast(pc.round(pc.multiply(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])), 10000.0)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "l_linenumber": t["l_linenumber"], "revenue": rev})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_FILTER_REVENUE = """
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT) AS revenue
FROM lineitem WHERE l_quantity > 45
"""


def q_top_customers(sf_dir: str):
    """Top-10 customers by order total — aggregate FIRST, then decorate the
    10-row result (SURVEY.md §2.6).  The corpus-scaled customer dim is
    never materialized on the driver: the 10 winning custkeys are
    broadcast (closure literal, ~80 bytes) into a distributed filter
    over `customer`, so only ≤10 dim rows ever reach the driver.  The
    nation dim is a constant-size table (25 rows) and is read the same
    filtered way for symmetry."""
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    totals = orders.groupby("o_custkey").aggregate(Sum("o_totalprice", alias_name="total_spent"), Count(alias_name="n_orders"))
    top = (
        totals.sort(["total_spent", "o_custkey"], descending=[True, False])
        .limit(10)
        .map_batches(lambda t: _int_scale_col(t, "total_spent", 100), batch_format="pyarrow")
        .to_pandas()  # 10 rows — the legal kind of driver materialization
    )
    if top.empty:  # empty orders: the all-empty result loses its schema
        return pd.DataFrame(
            {c: pd.Series(dtype=d) for c, d in
             [("o_custkey", "int64"), ("total_spent", "int64"), ("n_orders", "int64"),
              ("c_name", "object"), ("nation_name", "object")]}
        )

    keys = pa.array(top["o_custkey"].to_numpy(), pa.int64())
    cust = (
        rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_nationkey"])
        .map_batches(lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=keys)), batch_format="pyarrow")
        .to_pandas()  # ≤10 rows survive the distributed filter
    )
    nkeys = pa.array(cust["c_nationkey"].to_numpy(), pa.int64())
    nation = (
        rd.read_parquet(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
        .map_batches(lambda t: t.filter(pc.is_in(t["n_nationkey"], value_set=nkeys)), batch_format="pyarrow")
        .to_pandas()
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.rename(columns={"n_name": "nation_name"})
    out = out.sort_values(["total_spent", "o_custkey"], ascending=[False, True], kind="mergesort")
    return out[["o_custkey", "total_spent", "n_orders", "c_name", "nation_name"]].reset_index(drop=True)


SQL_TOP_CUSTOMERS = """
SELECT o_custkey, CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_spent, count(*) AS n_orders,
       c_name, n_name AS nation_name
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
GROUP BY o_custkey, c_name, n_name
ORDER BY sum(o_totalprice) DESC, o_custkey
LIMIT 10
"""


def q_region_customer_counts(sf_dir: str):
    """customer ⋈ nation ⋈ region via broadcast dicts + partial-agg counts."""
    import ray

    nation = rd.read_parquet(_p(sf_dir, "nation")).to_pandas()
    region = rd.read_parquet(_p(sf_dir, "region")).to_pandas()
    n2r = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey").set_index("n_nationkey")["r_name"]
    # broadcast the dim as a key/value Arrow array pair: the lookup is then
    # one pc.index_in + pc.take per batch, no per-row Python
    ref = ray.put((pa.array(n2r.index.to_numpy(), pa.int64()), pa.array(n2r.to_numpy(), pa.string())))

    def tag(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        idx = pc.index_in(t.column("c_nationkey").combine_chunks(), value_set=keys)
        vc = pc.value_counts(pc.take(vals, idx))  # partial agg inside the batch
        return pa.table({"r_name": vc.field("values"), "n_customers": pc.cast(vc.field("counts"), pa.int64())})

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_nationkey"])
    return cust.map_batches(tag, batch_format="pyarrow").groupby("r_name").aggregate(Sum("n_customers", alias_name="n_customers"))


SQL_REGION_CUSTOMER_COUNTS = """
SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_parts_by_brand(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_brand", "p_retailprice", "p_size"])
    out = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"),
        Max("p_size", alias_name="max_size"),
    )
    return out.map_batches(lambda t: _int_scale_col(t, "avg_price", 100), batch_format="pyarrow")


SQL_PARTS_BY_BRAND = """
SELECT p_brand, count(*) AS n_parts, CAST(round(avg(p_retailprice) * 100) AS BIGINT) AS avg_price,
       max(p_size) AS max_size
FROM part GROUP BY p_brand
"""


def q_sorted_topn(sf_dir: str):
    """Global sort + limit (range-shuffle top-k — the reference's csvsort
    export parity, SURVEY.md §2.7)."""
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(100)


SQL_SORTED_TOPN = """
SELECT doc_id, lang, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 100
"""


def q_sorted_page(sf_dir: str):
    """LIMIT/OFFSET pagination (page 2 of the sorted export, rows
    101-200): the range-shuffle sort stops at limit(offset+page), and
    the offset slice is a driver-side skip of the 200-row result — the
    only sound distributed shape, since OFFSET is defined by the global
    order and the prefix must exist somewhere; nothing corpus-sized
    leaves the sort."""
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])
    page = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(200).to_pandas()
    return page.iloc[100:200].reset_index(drop=True)


SQL_SORTED_PAGE = """
SELECT doc_id, lang, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 100 OFFSET 100
"""


# ---------------------------------------------------------------------------
# events (stream-shaped: windows, top-k per key, json props)
# ---------------------------------------------------------------------------


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type (groupby on truncated ts)."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"event_type": t["event_type"], "window_start": win, "value": t["value"]})

    out = (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return out.map_batches(lambda t: _int_scale_col(t, "sum_value", 100), batch_format="pyarrow")


SQL_EVENTS_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events, CAST(round(sum(value) * 100) AS BIGINT) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_events_rollup(sf_dir: str):
    """Hierarchical ROLLUP totals — (event_type, hour) -> (event_type) ->
    grand total, the three-level report shape of ``GROUP BY ROLLUP``.
    Expressed Ray-Data-first as three groupby aggregates UNIONed (each a
    partial-combined shuffle over the same scan), with rollup levels
    marked by sentinel values ('__all__' / hour -1) plus an unambiguous
    ``lvl`` marker column (0/1/3 == ``grouping(a)*2 + grouping(b)``, so
    real data colliding with a sentinel value can never masquerade as a
    total).  The two coarser levels re-aggregate the FINE level's tiny
    output (never the raw table), so the corpus is scanned and shuffled
    exactly once — and the fine float sums are scaled to int64
    centi-units BEFORE the rollup, so the coarser levels are exact
    integer sums (order-independent; hierarchical float re-addition
    could flip ``round(sum*100)`` by an ulp at scale).  The SQL twin
    mirrors the same fine-CTE + integer re-sum shape."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        hour = pc.cast(pc.divide(pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64()), 3_600_000_000), pa.int64())
        return pa.table({"event_type": t["event_type"], "hour_epoch": hour, "value": t["value"]})

    fine = (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "hour_epoch"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        # int64 centi-units HERE, so every coarser level is an exact integer sum
        .map_batches(lambda t: _int_scale_col(t, "sum_value", 100), batch_format="pyarrow")
        .materialize()  # tiny (types x hours); feeds both coarser levels
    )
    by_type = (
        # consolidate the tiny input to ONE block first: Ray's aggregate
        # emits schema-less empty blocks when groups < input blocks (a
        # single distinct event_type would still trip a 2-block input)
        fine.repartition(1)
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .map_batches(
            lambda t: t.append_column("hour_epoch", pa.array(np.full(t.num_rows, -1), pa.int64()))
            .append_column("lvl", pa.array(np.full(t.num_rows, 1), pa.int64()))
            .select(["event_type", "hour_epoch", "lvl", "n_events", "sum_value"]),
            batch_format="pyarrow",
        )
        .materialize()  # tiny (one row per type); feeds both the union and grand
    )
    grand = by_type.repartition(1).groupby(None).aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")).map_batches(
        lambda t: pa.table(
            {
                "event_type": pa.array(["__all__"] * t.num_rows, pa.string()),
                "hour_epoch": pa.array([-1] * t.num_rows, pa.int64()),
                "lvl": pa.array([3] * t.num_rows, pa.int64()),
                "n_events": t.column("n_events"),
                "sum_value": t.column("sum_value"),
            }
        ),
        batch_format="pyarrow",
    )
    fine_sel = fine.map_batches(
        lambda t: t.append_column("lvl", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())).select(
            ["event_type", "hour_epoch", "lvl", "n_events", "sum_value"]
        ),
        batch_format="pyarrow",
    )
    return fine_sel.union(by_type).union(grand)


SQL_EVENTS_ROLLUP = """
WITH fine AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS hour_epoch,
         count(*) AS n_events,
         CAST(round(sum(value) * 100) AS BIGINT) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_epoch, CAST(0 AS BIGINT) AS lvl, n_events, sum_value FROM fine
UNION ALL
SELECT event_type, CAST(-1 AS BIGINT), CAST(1 AS BIGINT),
       CAST(sum(n_events) AS BIGINT), CAST(sum(sum_value) AS BIGINT)
FROM fine GROUP BY event_type
UNION ALL
SELECT '__all__', CAST(-1 AS BIGINT), CAST(3 AS BIGINT),
       CAST(sum(n_events) AS BIGINT), CAST(sum(sum_value) AS BIGINT)
FROM fine
"""


def q_events_cube(sf_dir: str):
    """Full CUBE over (event_type, hour) — all FOUR grouping sets, i.e.
    ROLLUP (`q_events_rollup`) plus the by-hour marginal.  Same shape:
    the corpus is scanned and shuffled exactly ONCE into the fine level
    (int64 centi-units there), and every coarser level re-aggregates the
    tiny fine output with exact integer sums; `lvl` =
    ``grouping(event_type)*2 + grouping(hour)`` disambiguates sentinel
    collisions."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        hour = pc.cast(pc.divide(pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64()), 3_600_000_000), pa.int64())
        return pa.table({"event_type": t["event_type"], "hour_epoch": hour, "value": t["value"]})

    fine = (
        ds.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "hour_epoch"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .map_batches(lambda t: _int_scale_col(t, "sum_value", 100), batch_format="pyarrow")
        .materialize()  # tiny (types x hours); feeds all three coarser levels
    )

    def _lvl_cols(t: pa.Table, et, hour, lvl: int) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "event_type": t.column("event_type") if et is None else pa.array([et] * n, pa.string()),
                "hour_epoch": t.column("hour_epoch") if hour is None else pa.array([hour] * n, pa.int64()),
                "lvl": pa.array(np.full(n, lvl), pa.int64()),
                "n_events": t.column("n_events").cast(pa.int64()),
                "sum_value": t.column("sum_value").cast(pa.int64()),
            }
        )

    by_type = (
        fine.repartition(1)
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .map_batches(lambda t: _lvl_cols(t, None, -1, 1), batch_format="pyarrow")
    )
    by_hour = (
        fine.repartition(1)
        .groupby("hour_epoch")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .map_batches(lambda t: _lvl_cols(t, "__all__", None, 2), batch_format="pyarrow")
    )
    grand = (
        fine.repartition(1)
        .groupby(None)
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .map_batches(lambda t: _lvl_cols(t, "__all__", -1, 3), batch_format="pyarrow")
    )
    fine_sel = fine.map_batches(lambda t: _lvl_cols(t, None, None, 0), batch_format="pyarrow")
    return fine_sel.union(by_type).union(by_hour).union(grand)


SQL_EVENTS_CUBE = """
WITH fine AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS hour_epoch,
         count(*) AS n_events,
         CAST(round(sum(value) * 100) AS BIGINT) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_epoch, CAST(0 AS BIGINT) AS lvl,
       CAST(n_events AS BIGINT) AS n_events, CAST(sum_value AS BIGINT) AS sum_value FROM fine
UNION ALL
SELECT event_type, CAST(-1 AS BIGINT), CAST(1 AS BIGINT),
       CAST(sum(n_events) AS BIGINT), CAST(sum(sum_value) AS BIGINT)
FROM fine GROUP BY event_type
UNION ALL
SELECT '__all__', hour_epoch, CAST(2 AS BIGINT),
       CAST(sum(n_events) AS BIGINT), CAST(sum(sum_value) AS BIGINT)
FROM fine GROUP BY hour_epoch
UNION ALL
SELECT '__all__', CAST(-1 AS BIGINT), CAST(3 AS BIGINT),
       CAST(sum(n_events) AS BIGINT), CAST(sum(sum_value) AS BIGINT)
FROM fine
"""


def q_events_funnel(sf_dir: str):
    """Ordered funnel analysis (view -> click -> purchase): the stage each
    user reached, where every later step must occur STRICTLY after the
    user's first occurrence of the previous step — see
    :func:`~goto_eater_crawler_ray.functions.window.funnel_stages`
    (one coarse hash shuffle, segment-vectorized reduceat passes)."""
    from ..functions.window import funnel_stages

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "event_type"])
    return funnel_stages(ds, "user_id", "ts", "event_type", ["view", "click", "purchase"])


SQL_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def q_events_top_users(sf_dir: str):
    """Per-event-type top-3 users by total value (groupby + map_groups —
    the window-function shape)."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["event_type", "user_id"], as_index=False).agg(user_total=("value", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("user_total", alias_name="user_total"))
    )

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_total", "user_id"], ascending=[False, True]).head(3)
        return df.assign(user_total=np.round(df["user_total"].to_numpy() * 100).astype(np.int64), rnk=np.arange(1, len(df) + 1))

    return totals.groupby("event_type").map_groups(top3, batch_format="pandas")


SQL_EVENTS_TOP_USERS = """
SELECT event_type, user_id, CAST(round(user_total * 100) AS BIGINT) AS user_total, rnk FROM (
  SELECT event_type, user_id, sum(value) AS user_total,
         row_number() OVER (PARTITION BY event_type ORDER BY sum(value) DESC, user_id) AS rnk
  FROM events GROUP BY event_type, user_id
) WHERE rnk <= 3
"""


def q_events_json_props(sf_dir: str):
    """Extract int prop k from the JSON props column (regex-vectorized —
    the reference's JS/JSON payload extraction family, SURVEY.md §2.3)."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, [0]), pa.int64())
        return pa.table({"event_id": t["event_id"], "prop_k": k})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_EVENTS_JSON_PROPS = """
SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS prop_k
FROM events
"""




def q_events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the streaming-
    shaped op Ray Data lacks natively, in the repo's segment-vectorized
    window shape (`functions/window.py` pattern): ONE coarse hash
    shuffle (user_id % n_parts) instead of a per-user group call, then
    each of the ~n_parts partitions computes every user's sessions with
    numpy (lexsort + gap mask + cumsum session ids + one `reduceat`
    pass per aggregate) — no per-user Python at any corpus size."""
    N_PARTS = 64
    GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])

    part_key = coarse_part_key("user_id", "_key_part", N_PARTS)

    def sessionize(part: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                pa.field("user_id", part.schema.field("user_id").type),
                pa.field("session_id", pa.int64()),
                pa.field("session_start", part.schema.field("ts").type),
                pa.field("n_events", pa.int64()),
                pa.field("session_value", pa.int64()),
            ]
        )
        n = part.num_rows
        if n == 0:
            return out_schema.empty_table()
        users = part.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = part.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = part.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ts_us, users))
        u, t_, v = users[order], ts_us[order], vals[order]
        seg_start = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([False], (t_[1:] - t_[:-1]) > GAP_US))
        is_new = gap & ~seg_start
        cum = np.cumsum(is_new)
        first_idx = np.maximum.accumulate(np.where(seg_start, np.arange(n), 0))
        sid = cum - cum[first_idx]  # session index within each user segment
        b = seg_start | is_new  # one row per (user, session)
        starts = np.flatnonzero(b)
        n_events = np.diff(np.append(starts, n))
        sv = np.add.reduceat(v, starts) * 100.0
        sv_i = (np.sign(sv) * np.floor(np.abs(sv) + 0.5)).astype(np.int64)
        ts_sorted = pc.take(part.column("ts").combine_chunks(), pa.array(order[starts]))
        return pa.Table.from_arrays(
            [
                pa.array(u[starts]).cast(out_schema.field("user_id").type),
                pa.array(sid[starts], pa.int64()),
                ts_sorted,
                pa.array(n_events, pa.int64()),
                pa.array(sv_i, pa.int64()),
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(part_key, batch_format="pyarrow")
        .groupby("_key_part")
        .map_groups(sessionize, batch_format="pyarrow")
    )


SQL_EVENTS_SESSIONIZE = """
SELECT user_id, session_id, min(ts) AS session_start, count(*) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS session_value
FROM (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
    FROM events
  )
) GROUP BY user_id, session_id
"""


def q_bucket_join(sf_dir: str):
    """Large⋈large hash join via explicit bucketing: add bucket =
    hash(key) % B to both sides, co-locate with one groupby, pandas-merge
    inside each bucket (ray_guide 'Joins — both sides large').  Output:
    order count + revenue per market segment."""
    B = 16
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])

    def tag_orders(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["o_custkey"], B - 1), pa.int32())
        return t.append_column("bucket", b).append_column("side", pa.array(["o"] * len(t), pa.string()))

    def tag_cust(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["c_custkey"], B - 1), pa.int32())
        return t.append_column("bucket", b).append_column("side", pa.array(["c"] * len(t), pa.string()))

    both = orders.map_batches(tag_orders, batch_format="pyarrow").union(cust.map_batches(tag_cust, batch_format="pyarrow"))

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == "o"][["o_custkey", "o_totalprice"]]
        c = df[df["side"] == "c"][["c_custkey", "c_mktsegment"]]
        j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        return j.groupby("c_mktsegment", as_index=False).agg(n_orders=("o_totalprice", "size"), revenue=("o_totalprice", "sum"))

    partial = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    out = partial.groupby("c_mktsegment").aggregate(Sum("n_orders", alias_name="n_orders"), Sum("revenue", alias_name="revenue"))
    return out.map_batches(lambda t: _int_scale_col(t, "revenue", 100), batch_format="pyarrow")


SQL_BUCKET_JOIN = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_asof_join(sf_dir: str):
    """As-of join: for each 'error' event, the user's most recent 'click'
    at or before it — the repo's coarse-hash window shape (ray_guide
    'As-of / range join'): ONE shuffle on user_id % n_parts, then a
    single `pd.merge_asof(..., by="user_id")` per partition (vectorized
    across ALL users in the partition — no per-user group call); DuckDB
    twin uses native ASOF JOIN."""
    N_PARTS = 64
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"])

    def part_key(t: pa.Table) -> pa.Table:
        # only error/click rows participate — drop the rest BEFORE the shuffle
        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(["error", "click"])))
        k = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("_key_part", pa.array((k % N_PARTS).astype(np.int32), pa.int32()))

    def asof_part(df: pd.DataFrame) -> pd.DataFrame:
        err = df[df["event_type"] == "error"].sort_values(["ts", "event_id"], kind="mergesort")
        if err.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype=df["user_id"].dtype),
                    "error_ts": pd.Series([], dtype=df["ts"].dtype),
                    "last_click_ts": pd.Series([], dtype=df["ts"].dtype),
                }
            )
        clk = df[df["event_type"] == "click"].sort_values("ts", kind="mergesort")
        j = pd.merge_asof(
            err[["event_id", "user_id", "ts"]].rename(columns={"ts": "error_ts"}),
            clk[["user_id", "ts"]].rename(columns={"ts": "last_click_ts"}),
            left_on="error_ts",
            right_on="last_click_ts",
            by="user_id",
            direction="backward",
        )
        j["event_id"] = j["event_id"].astype("int64")
        return j[["event_id", "user_id", "error_ts", "last_click_ts"]]

    return (
        ds.map_batches(part_key, batch_format="pyarrow")
        .groupby("_key_part")
        .map_groups(asof_part, batch_format="pandas")
    )


SQL_ASOF_JOIN = """
SELECT e.event_id, e.user_id, e.ts AS error_ts, c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def q_distinct_pairs(sf_dir: str):
    """Distinct (user_id, event_type) count — the set-op family."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])
    distinct = ds.groupby(["user_id", "event_type"]).aggregate(Count(alias_name="n"))
    n = distinct.count()
    return pa.table({"n_distinct_pairs": pa.array([n], pa.int64())})


SQL_DISTINCT_PAIRS = """
SELECT count(*) AS n_distinct_pairs FROM (SELECT DISTINCT user_id, event_type FROM events)
"""


def q_events_moving_avg(sf_dir: str):
    """Per-user ROWS-window rolling mean of event value (window 3, ordered
    by ts then event_id) — the windowed-aggregate operator: one coarse
    hash shuffle on user_id, segment-vectorized windows inside."""
    from ..functions.window import rolling_mean_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"])
    return rolling_mean_per_key(ds, key_col="user_id", order_cols=["ts", "event_id"], value_col="value", window=3)


SQL_EVENTS_MOVING_AVG = """
SELECT user_id, ts, event_id,
       CAST(round(avg(value) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100) AS BIGINT) AS mov_avg_c
FROM events
"""


def q_events_rolling_median(sf_dir: str):
    """Per-user ROWS-window rolling MEDIAN (window 5, ordered by ts then
    event_id) — the order-statistic window op a robust-smoothing
    pipeline needs; see window.rolling_median_per_key for the exact
    2x-median integer contract and the staircase-matrix vectorization."""
    from ..functions.window import rolling_median_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts", "user_id", "value"])
    return rolling_median_per_key(ds, key_col="user_id", order_cols=["ts", "event_id"], value_col="value", window=5)


SQL_EVENTS_ROLLING_MEDIAN = """
WITH v AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS vc FROM events
)
SELECT user_id, ts, event_id,
       CAST(2 * median(vc) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS med_x2_c
FROM v
"""


def q_events_new_vs_returning(sf_dir: str):
    """Daily new-vs-returning user counts — the activation dashboard op:
    a user is 'new' on their first-ever active day, 'returning' on every
    later active day.  Single-shuffle shape (contrast with
    q_user_retention's two-aggregate + hash-join shape): distinct
    (user, day) pairs are deduped batch-locally, hash-partitioned by
    user (so each user's full history is co-located), and ONE
    segment-vectorized pass marks each user's first day and emits
    per-day partial (n_new, n_returning) counts — the final groupby
    touches only day-cardinality rows."""
    N_PARTS = 64
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "user_id"])

    def to_days(t: pa.Table) -> pa.Table:
        days = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us"))
        epoch_days = pc.divide(pc.cast(days, pa.int64()), 86_400_000_000)
        out = pa.table({"user_id": t.column("user_id").cast(pa.int64()), "day": epoch_days.cast(pa.int64())})
        out = out.group_by(["user_id", "day"]).aggregate([])  # batch-local dedup
        k = out.column("user_id").to_numpy(zero_copy_only=False)
        return out.append_column("_key_part", pa.array((k % N_PARTS).astype(np.int32), pa.int32()))

    def classify(part: pa.Table) -> pa.Table:
        schema = pa.schema([("day", pa.int64()), ("n_new", pa.int64()), ("n_returning", pa.int64())])
        if part.num_rows == 0:
            return schema.empty_table()
        u = part.column("user_id").to_numpy(zero_copy_only=False)
        d = part.column("day").to_numpy(zero_copy_only=False)
        o = np.lexsort((d, u))
        u, d = u[o], d[o]
        # cross-batch dedup of (user, day) then first-day flag
        keep = np.concatenate(([True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])))
        u, d = u[keep], d[keep]
        is_new = np.concatenate(([True], u[1:] != u[:-1]))
        days_u, inv = np.unique(d, return_inverse=True)
        n_new = np.bincount(inv[is_new], minlength=days_u.size)
        n_ret = np.bincount(inv[~is_new], minlength=days_u.size)
        return pa.table(
            {
                "day": pa.array(days_u, pa.int64()),
                "n_new": pa.array(n_new, pa.int64()),
                "n_returning": pa.array(n_ret, pa.int64()),
            }
        )

    return (
        ds.map_batches(to_days, batch_format="pyarrow")
        .groupby("_key_part")
        .map_groups(classify, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n_new", alias_name="n_new"), Sum("n_returning", alias_name="n_returning"))
    )


SQL_EVENTS_NEW_VS_RETURNING = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) / 86400) AS BIGINT) AS day
  FROM events
), f AS (
  SELECT user_id, min(day) AS first_day FROM d GROUP BY 1
)
SELECT d.day,
       count(*) FILTER (WHERE d.day = f.first_day) AS n_new,
       count(*) FILTER (WHERE d.day > f.first_day) AS n_returning
FROM d JOIN f ON d.user_id = f.user_id
GROUP BY 1
"""


def q_events_gap_fill(sf_dir: str):
    """Dense-grid gap fill: every (event_type, hour) cell between the
    corpus's global min and max hour, zero-filled where no events exist —
    the report/time-series densification op (downstream charting and
    windowing assume no missing buckets).  The corpus is reduced to a
    tiny (type x hour) count aggregate FIRST; the dense grid is then
    generated per type inside ``map_groups`` from two broadcast scalar
    bounds, so grid construction is output-sized, never corpus-sized."""
    counts = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t.column("event_type"),
                    "hour_epoch": pc.divide(
                        pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("us")), pa.int64()),
                        3_600_000_000,
                    ).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["event_type", "hour_epoch"])
        .aggregate(Count(alias_name="n_events"))
        .materialize()  # tiny: |types| x |hours|; read twice (bounds + fill)
    )
    lo, hi = counts.min("hour_epoch"), counts.max("hour_epoch")  # two scalars to the driver

    def fill(g: pa.Table) -> pa.Table:
        h = g.column("hour_epoch").to_numpy(zero_copy_only=False)
        n = g.column("n_events").to_numpy(zero_copy_only=False)
        grid = np.zeros(hi - lo + 1, np.int64)
        grid[h - lo] = n
        et = g.column("event_type")[0].as_py()
        return pa.table(
            {
                "event_type": pa.array([et] * grid.size, pa.string()),
                "hour_epoch": pa.array(np.arange(lo, hi + 1), pa.int64()),
                "n_events": pa.array(grid, pa.int64()),
            }
        )

    return counts.groupby("event_type").map_groups(fill, batch_format="pyarrow")


SQL_EVENTS_GAP_FILL = """
WITH c AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         count(*) AS n
  FROM events GROUP BY 1, 2
), b AS (
  SELECT min(h) AS lo, max(h) AS hi FROM c
), g AS (
  SELECT t.event_type, gs.h
  FROM (SELECT DISTINCT event_type FROM c) t
  CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS h FROM b) gs
)
SELECT g.event_type, g.h AS hour_epoch, coalesce(c.n, 0) AS n_events
FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
"""


def q_orders_topn_per_cust(sf_dir: str):
    """Per-customer top-3 orders by totalprice (row_number window with a
    deterministic orderkey tie-break): per-batch local top-N pre-prune,
    one coarse hash shuffle, segment-vectorized rank inside."""
    from ..functions.window import top_n_per_key

    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_totalprice"])
    top = top_n_per_key(ds, key_col="o_custkey", order_col="o_totalprice", n=3, tiebreak_col="o_orderkey")

    def scale(batch: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"), 100)), pa.int64())
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "o_orderkey": batch.column("o_orderkey"),
                "price_c": price_c,
                "rn": batch.column("rn"),
            }
        )

    return top.map_batches(scale, batch_format="pyarrow")


SQL_ORDERS_TOPN_PER_CUST = """
SELECT o_custkey, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_value_quantiles(sf_dir: str):
    """p50/p90/p99 of event value via the mergeable fixed-bin histogram
    sketch — the oracle runs the SAME sketch in SQL, so the compare is an
    exact hash match of the distributed implementation (accuracy vs
    np.percentile is pytest-asserted separately)."""
    from ..functions.quantiles import histogram_quantiles

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["value"])
    return histogram_quantiles(ds, "value", pcts=[50, 90, 99], n_bins=1024)


SQL_VALUE_QUANTILES = """
WITH stats AS (SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM events),
hist AS (
  SELECT LEAST(CAST(floor((e.value - s.lo) / ((s.hi - s.lo) / 1024.0)) AS BIGINT), 1023) AS bin,
         count(*) AS c
  FROM events e, stats s GROUP BY 1),
cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM hist)
SELECT CAST(p.pct AS BIGINT) AS pct,
       (SELECT min(bin) FROM cum, stats s WHERE cum >= (p.pct * s.n + 99) // 100) AS bin,
       (SELECT CAST(round(lo * 100) AS BIGINT) FROM stats) AS lo_c,
       (SELECT CAST(round(hi * 100) AS BIGINT) FROM stats) AS hi_c
FROM (VALUES (50), (90), (99)) AS p(pct)
"""


# ---------------------------------------------------------------------------
# documents: text analysis + dedup
# ---------------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    from ..functions.text import token_count_batch

    return rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(token_count_batch, batch_format="pyarrow")


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       len(regexp_split_to_array(text, '\\s+'))                          AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^\\sa-z0-9]'))       AS re_tokens
FROM documents
"""


def q_quality(sf_dir: str):
    from ..functions.text import quality_score_batch

    return rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(quality_score_batch, batch_format="pyarrow")


SQL_QUALITY = """
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
       round(len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(regexp_extract_all(text, '\\b(the|a|of|to|and)\\b')) * 1.0
             / len(regexp_split_to_array(text, '\\s+')), 6) AS stop_ratio
FROM documents
"""


def q_fingerprint(sf_dir: str):
    from ..functions.text import fingerprint_batch

    return rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(fingerprint_batch, batch_format="pyarrow")


SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def q_exact_dedup(sf_dir: str):
    from ..functions.dedup import exact_dedup

    return exact_dedup(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]))


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def q_dedup_filter(sf_dir: str):
    """Semi-join survivor filter: keep only first doc per distinct text.
    True hash-shuffle semi-join (Dataset.join on doc_id == keep_id) — the
    keep-set is corpus-sized at scale, so it must never be a driver
    broadcast set; only (hash, id) rows shuffle."""
    from ..functions.dedup import exact_dedup

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    keep = exact_dedup(docs.select_columns(["doc_id", "text"])).select_columns(["keep_id"])
    # shuffle partitions sized to the corpus (parquet row count is
    # metadata-cheap): ~100k rows/partition, like the CC auto-sizing
    n_parts = auto_num_partitions(docs.count())
    joined = docs.join(keep, join_type="inner", num_partitions=n_parts, on=("doc_id",), right_on=("keep_id",))
    return joined.select_columns(["doc_id", "text", "lang"])


SQL_DEDUP_FILTER = """
SELECT doc_id, text, lang FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
"""


def q_char_jaccard(sf_dir: str):
    from ..functions.dedup import char_jaccard_pairs

    return char_jaccard_pairs(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), id_limit=100, threshold=0.5)


SQL_CHAR_JACCARD = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(jaccard(a.text, b.text), 6) AS jaccard_sim
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE a.doc_id < 100 AND b.doc_id < 100
  AND round(jaccard(a.text, b.text), 6) >= 0.5
"""


def q_edit_distance_pairs(sf_dir: str):
    """Levenshtein<=1 pair mining over 16-char lowercased title prefixes —
    SymSpell deletion-neighborhood buckets (see dedup.edit_distance_pairs),
    ORACLE-PINNED against DuckDB's levenshtein() quadratic self-join.
    The deletion-variant construction is EXACT for radius 1 (two strings
    within edit distance 1 always share a member of the deletion
    neighborhood), so the hash compare proves the distributed
    explode->bucket->verify->pair-dedup path end-to-end."""
    from ..functions.dedup import edit_distance_pairs

    return edit_distance_pairs(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), prefix_len=16)


SQL_EDIT_DISTANCE_PAIRS = """
WITH t AS (
  SELECT doc_id, substr(lower(text), 1, 16) AS p FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE levenshtein(a.p, b.p) <= 1
"""


def q_allpairs_jaccard(sf_dir: str):
    """EXACT word-3-shingle Jaccard self-join at threshold 0.5 — the
    AllPairs/PPJoin prefix-filter algorithm (recall 1.0, unlike
    MinHash-LSH), ORACLE-PINNED against DuckDB's quadratic
    unnest-self-join.  See dedup.allpairs_jaccard_pairs for the
    distributed shape (df-ranked prefixes, bucket-local vectorized
    set intersection, pair-keyed dedup)."""
    from ..functions.dedup import allpairs_jaccard_pairs

    return allpairs_jaccard_pairs(
        rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), threshold=0.5, shingle_k=3
    )


SQL_ALLPAIRS_JACCARD = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)])) AS tok
  FROM w
), sets AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id,
       CAST(round(i.c * 1000000.0 / (sa.sz + sb.sz - i.c)) AS BIGINT) AS jaccard_6dp
FROM inter i
JOIN sets sa ON sa.doc_id = i.a_id
JOIN sets sb ON sb.doc_id = i.b_id
WHERE CAST(round(i.c * 1000000.0 / (sa.sz + sb.sz - i.c)) AS BIGINT) >= 500000
"""


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidates (no SQL twin: probabilistic op —
    driver records rows-only; correctness covered by planted-dup tests)."""
    from ..functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), threshold=0.5)


def q_simhash_groups(sf_dir: str):
    from ..functions.dedup import simhash_dup_groups

    return simhash_dup_groups(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]))


def q_simhash_near_pairs(sf_dir: str):
    """Hamming<=3 SimHash near-dup pairs via pigeonhole banding (exact for
    the radius, bucket-local verification).  Non-SQL (bit-level op);
    correctness via planted bit-flip pytest."""
    from ..functions.dedup import simhash_near_pairs

    return simhash_near_pairs(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), max_hamming=3)


def q_fingerprint_hamming_pairs(sf_dir: str):
    """Hamming<=20 pairs over 64-bit md5 fingerprints, run through the SAME
    pigeonhole-banding machinery as simhash_near_pairs
    (dedup.hamming_near_pairs) — and ORACLE-PINNED: DuckDB computes the
    identical fingerprint (``md5_number_upper`` == first 8 md5 bytes,
    little-endian) and the identical radius with a quadratic
    ``bit_count(xor(a,b))`` self-join.  Banding is exact for the radius
    (recall 1.0), so the hash compare proves the distributed
    explode->bucket->verify->dedup path end-to-end, the same trick
    embedding_dup_groups uses for connected components.

    radius 20 needs n_pieces=32 (pigeonhole: max_hamming < n_pieces); the
    wide radius exists to give random 64-bit fingerprints a non-empty
    answer at test scale — production simhash radii (<=3) use the same
    code with 4 pieces."""
    import hashlib

    from ..functions.dedup import hamming_near_pairs

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fp64(t: pa.Table) -> pa.Table:
        h = np.array(
            [int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little") for s in t.column("text").to_pylist()],
            dtype=np.uint64,
        )
        return pa.table({"doc_id": t.column("doc_id"), "simhash": pa.array(h, pa.uint64())})

    # hot-bucket star guard disabled in the ORACLE variant (it trades
    # recall for bounded work on degenerate buckets; the twin is exact)
    pairs = hamming_near_pairs(
        ds.map_batches(fp64, batch_format="pyarrow"), max_hamming=20, n_pieces=32, hot_bucket_cap=1 << 30
    )
    return pairs.map_batches(
        lambda t: t.set_column(t.column_names.index("hamming"), "hamming", pc.cast(t.column("hamming"), pa.int64())),
        batch_format="pyarrow",
    )


SQL_FINGERPRINT_HAMMING_PAIRS = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(md5_number_upper(a.text), md5_number_upper(b.text))) AS BIGINT) AS hamming
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE bit_count(xor(md5_number_upper(a.text), md5_number_upper(b.text))) <= 20
"""


def q_langid(sf_dir: str):
    """Language-ID heuristic (vectorized Unicode-block script pass +
    latin stopword vote) — ORACLE-pinned: the DuckDB twin replicates the
    exact decision function (script-block regexp counts in the same
    precedence order, distinct-token overlap with the verbatim stopword
    lists, ties resolved to the earlier language in en>de>fr>es order,
    matching the strict-> comparison over the Python dict iteration)."""
    from ..functions.text import LangId

    return rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))


SQL_LANGID = """
WITH toks AS (
  SELECT doc_id, text,
         list_distinct(regexp_extract_all(lower(text), '[a-zà-ÿäöüß]+')) AS ws
  FROM documents
),
scores AS (
  SELECT doc_id, text,
    len(list_filter(ws, w -> w IN ('the','of','and','to','in','is','you','that','it','he','was','for','on','are','as','with','his','they','at','be','this'))) AS s_en,
    len(list_filter(ws, w -> w IN ('der','die','das','und','ist','du','dass','es','er','war','für','auf','sind','als','mit','sein','sie','bei','sei','nicht','ein','eine'))) AS s_de,
    len(list_filter(ws, w -> w IN ('le','la','les','de','et','est','tu','que','il','était','pour','sur','sont','comme','avec','son','ils','à','être','ce','une','dans'))) AS s_fr,
    len(list_filter(ws, w -> w IN ('el','la','los','de','y','es','tú','que','él','era','para','en','son','como','con','su','ellos','ser','esta','una','las','del'))) AS s_es
  FROM toks
)
SELECT doc_id,
  CASE
    WHEN len(regexp_extract_all(text, '[\\x{3040}-\\x{30FF}]')) > 0 THEN 'ja'
    WHEN len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}]')) > 0 THEN 'zh'
    WHEN len(regexp_extract_all(text, '[\\x{AC00}-\\x{D7AF}]')) > 0 THEN 'ko'
    WHEN len(regexp_extract_all(text, '[\\x{0400}-\\x{04FF}]')) > 0 THEN 'ru'
    WHEN len(regexp_extract_all(text, '[\\x{0600}-\\x{06FF}]')) > 0 THEN 'ar'
    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
    WHEN s_fr >= s_es THEN 'fr'
    ELSE 'es'
  END AS lang_pred
FROM scores
"""




def q_dedup_groups(sf_dir: str):
    """Near-dup GROUPS: MinHash-LSH candidate pairs resolved to connected
    components via the fully DISTRIBUTED label-propagation path (join +
    groupby rounds; nothing corpus-sized on the driver). Non-SQL
    (probabilistic + iterative); correctness via planted-duplicate tests
    and driver/distributed equivalence tests."""
    from ..functions.dedup import connected_components_distributed, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), threshold=0.5)
    return connected_components_distributed(pairs)


# ---------------------------------------------------------------------------
# md5-family LSH dedup: the FULL near-dup pipeline, hash-checked.
#
# The production default hash family is crc32 (cheap, but DuckDB can't
# compute it); `minhash_sigs` proved the signature CORE is SQL-exact under
# the md5 family (md5_number_upper == first 8 md5 bytes LE).  These
# variants run the IDENTICAL pipeline code — MinHasher -> explode_bands ->
# bucket_verified_pairs -> pair dedup -> connected components -> anti-join
# — over md5-family signatures, so every downstream stage of the LSH
# machinery gets an exact DuckDB twin too.  The only semantic difference
# vs the SQL twin is the 64-bit band-hash bucketing (a band-hash collision
# between docs whose band values differ could admit a spurious candidate
# that then passes est_jaccard verification — probability ~2^-64, the same
# accepted risk the banding design itself carries).
# ---------------------------------------------------------------------------


def _minhash_pairs_md5_ds(sf_dir: str):
    from ..functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]),
        threshold=0.5,
        hash_family="md5",
    )


def q_minhash_pairs_md5(sf_dir: str):
    """MinHash-LSH near-dup pairs under the md5 hash family — ORACLE-pinned:
    the DuckDB twin recomputes the 64-perm signatures (the `minhash_sigs`
    CTE), forms the same 8 bands, joins docs on exact band equality, and
    verifies est_jaccard = (#agreeing perms)/64 >= 0.5.  k/64 is exactly
    representable in 6 decimal digits (10^6/64 is an integer), so the
    float column hash-compares exactly.  This converts the LSH candidate
    machinery (explode_bands, bucket_verified_pairs, cross-band pair
    dedup) from rows-only to hash-checked."""
    return _minhash_pairs_md5_ds(sf_dir)


def q_dedup_groups_md5(sf_dir: str):
    """Near-dup GROUPS under the md5 hash family — the full
    pairs -> distributed-connected-components path ORACLE-pinned against a
    DuckDB recursive-CTE transitive closure over the same pair set (the
    trick `embedding_dup_groups` uses, now over the LSH pair generator
    instead of bounded cosine pairs)."""
    from ..functions.dedup import connected_components_distributed

    return connected_components_distributed(_minhash_pairs_md5_ds(sf_dir))


def q_near_dedup_md5(sf_dir: str):
    """END-TO-END near-dup curation (LSH pairs -> connected components ->
    keep each group's min doc_id -> anti-join losers out of the corpus)
    under the md5 hash family — the whole curation op hash-checked,
    including the surviving rows' text.  Components resolve through the
    size-gated path (`connected_components_gated`): LSH pair graphs are
    corpus-tiny, so below the gate the driver's vectorized numpy rounds
    replace the 2-joins-per-round exchange (the distributed path stays
    oracle-pinned via `dedup_groups_md5`)."""
    from ..functions.dedup import connected_components_gated

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    pairs = _minhash_pairs_md5_ds(sf_dir)
    groups = connected_components_gated(pairs)

    loser_schema = pa.schema([("loser_id", pa.int64()), ("is_dup", pa.int8())])

    def losers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_id"), t.column("group_id")))
        return pa.table(
            {
                "loser_id": t.column("doc_id").cast(pa.int64()),
                "is_dup": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
            },
            schema=loser_schema,
        )

    losers_ds = groups.map_batches(losers, batch_format="pyarrow")
    if losers_ds.count() == 0:
        return docs
    n_parts = auto_num_partitions(docs.count(), cap=64)
    return _null_anti_join(docs, losers_ds, n_parts, on="doc_id", right_on="loser_id", marker="is_dup")


def _minhash_pairs_md5_cte() -> str:
    """Shared CTE prefix: documents -> 64-perm md5-family signatures ->
    bands -> exact-band-equality candidates -> verified pairs.  Reuses the
    `minhash_sigs` arithmetic (HUGEINT % 2^64 wrapping, Mersenne mod) with
    the SAME seeded permutation parameters the production MinHasher
    builds."""
    from ..functions.dedup import _perm_params

    a, b = _perm_params(64, seed=42)
    values = ",\n    ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(64))
    return f"""toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, len(ws) - 1), i ->
              array_to_string(list_slice(ws, i, i + 2), ' ')) END) AS s
  FROM toks
),
p(perm, a, b) AS (
  SELECT * FROM (VALUES
    {values}
  )
),
vals AS (
  SELECT sh.doc_id, p.perm,
         ((CAST(md5_number_upper(sh.s) AS HUGEINT) * p.a) % 18446744073709551616 + p.b)
         % 18446744073709551616 % 2305843009213693951 AS v
  FROM sh CROSS JOIN p
),
sigs AS (SELECT doc_id, perm, CAST(min(v) AS BIGINT) AS sig FROM vals GROUP BY doc_id, perm),
bands AS (
  SELECT doc_id, perm // 8 AS band, string_agg(CAST(sig AS VARCHAR), ',' ORDER BY perm) AS bkey
  FROM sigs GROUP BY doc_id, perm // 8
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS DOUBLE) / 64 AS est_jaccard
  FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a
              JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.perm = sa.perm
  GROUP BY c.doc_a, c.doc_b
  HAVING sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) >= 32
)"""


SQL_MINHASH_PAIRS_MD5 = f"""
WITH {_minhash_pairs_md5_cte()}
SELECT doc_a, doc_b, est_jaccard FROM pairs
"""


_SQL_DEDUP_CLOSURE = """
edges AS (SELECT doc_a AS n, doc_b AS p FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
reach(n, r) AS (
  SELECT n, p FROM edges
  UNION
  SELECT e.n, r.r FROM edges e JOIN reach r ON r.n = e.p
),
groups AS (
  SELECT n AS doc_id, CAST(LEAST(n, MIN(r)) AS BIGINT) AS group_id FROM reach GROUP BY n
)"""


SQL_DEDUP_GROUPS_MD5 = f"""
WITH RECURSIVE {_minhash_pairs_md5_cte()},
{_SQL_DEDUP_CLOSURE.strip()}
SELECT doc_id, group_id FROM groups
"""


SQL_NEAR_DEDUP_MD5 = f"""
WITH RECURSIVE {_minhash_pairs_md5_cte()},
{_SQL_DEDUP_CLOSURE.strip()}
SELECT d.doc_id, d.text, d.lang FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM groups WHERE doc_id != group_id)
"""


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate count(distinct user_id) over events — mergeable
    per-batch sketches, one tiny reduce, returned alongside the exact count
    so the error is readable directly.  NOW ORACLE-pinned: the sketch is
    deterministic (splitmix64 over the value set), so the DuckDB twin
    replays the identical hash (UBIGINT xor/shift + 32-bit-split wrapping
    multiplies), register indexing, rank, and estimator — including the
    small-range linear-counting correction, whose ``m*ln(m/zeros)`` is
    bit-equal across numpy and DuckDB on this libm.  Rounding is the
    repo's half-away idiom to match SQL round()."""
    from ray.data.aggregate import Count

    from ..functions.text import hll_sketch

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"])
    est = hll_sketch(ds, "user_id").estimate()
    exact = ds.groupby("user_id").aggregate(Count(alias_name="n")).count()
    rel = abs(est - exact) / max(exact, 1)
    return pa.table(
        {
            "hll_estimate": pa.array([np.floor(est * 10.0 + 0.5) / 10.0], pa.float64()),
            "exact_distinct": pa.array([exact], pa.int64()),
            "rel_error": pa.array([np.floor(rel * 10_000.0 + 0.5) / 10_000.0], pa.float64()),
        }
    )


def q_hll_registers(sf_dir: str):
    """The HLL sketch's REGISTER STATE as a hash-checked row set — the
    integer-exact core of the approx-distinct family (the analogue of
    `minhash_sigs` for HLL): every non-zero register's (index, max rank)
    over events.user_id.  The DuckDB twin recomputes splitmix64 with
    UBIGINT bitwise ops (multiplies split at 32 bits so the HUGEINT
    intermediate never overflows INT128), takes the top-12-bit register
    index, and derives rank = leading-zeros+1 positionally via bin().
    All integers — no float estimator in the compare at all."""
    from ..functions.text import hll_sketch

    merged = hll_sketch(rd.read_parquet(_p(sf_dir, "events"), columns=["user_id"]), "user_id")
    nz = np.flatnonzero(merged.registers)
    return pa.table(
        {
            "reg": pa.array(nz.astype(np.int64), pa.int64()),
            "max_rank": pa.array(merged.registers[nz].astype(np.int64), pa.int64()),
        }
    )


def _hll_sql(select: str) -> str:
    """Shared splitmix64 + register CTE prefix for the HLL twins."""
    from ..functions.text import _HLL_SEED

    m64 = 18446744073709551616

    def mulwrap(x: str, c: int) -> str:
        # (x * c) mod 2^64 via 32-bit split: each HUGEINT product < 2^96
        return (
            f"CAST(((CAST(({x}) & 4294967295 AS HUGEINT) * {c}) % {m64} + "
            f"((CAST(({x}) >> 32 AS HUGEINT) * {c}) % 4294967296) * 4294967296) % {m64} AS UBIGINT)"
        )

    return f"""
WITH d AS (SELECT DISTINCT CAST(user_id AS UBIGINT) AS v FROM events),
s0 AS (SELECT xor(v, CAST({int(_HLL_SEED)} AS UBIGINT)) AS x FROM d),
s1 AS (SELECT xor(x, x >> 30) AS x FROM s0),
s2 AS (SELECT {mulwrap('x', 0xBF58476D1CE4E5B9)} AS x FROM s1),
s3 AS (SELECT xor(x, x >> 27) AS x FROM s2),
s4 AS (SELECT {mulwrap('x', 0x94D049BB133111EB)} AS x FROM s3),
h AS (SELECT xor(x, x >> 31) AS x FROM s4),
rr AS (
  SELECT CAST(x >> 52 AS BIGINT) AS reg,
         CAST(65 - length(ltrim(bin(CAST((CAST(x AS HUGEINT) * 4096) % {m64} AS UBIGINT) | 4095), '0')) AS BIGINT) AS rank
  FROM h
),
regs AS (SELECT reg, max(rank) AS max_rank FROM rr GROUP BY reg)
{select}
"""


SQL_HLL_REGISTERS = _hll_sql("SELECT reg, max_rank FROM regs")


SQL_APPROX_DISTINCT_USERS = _hll_sql(
    """,
est AS (
  SELECT (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0 /
         (sum(power(2.0, -max_rank)) + (4096 - count(*))) AS e_raw,
         4096 - count(*) AS zeros
  FROM regs
),
fin AS (
  SELECT CASE WHEN e_raw <= 2.5 * 4096 AND zeros > 0
              THEN 4096.0 * ln(4096.0 / zeros) ELSE e_raw END AS e
  FROM est
)
SELECT round(e, 1) AS hll_estimate,
       (SELECT count(*) FROM d) AS exact_distinct,
       round(abs(e - (SELECT count(*) FROM d)) / greatest((SELECT count(*) FROM d), 1), 4) AS rel_error
FROM fin"""
)


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------


def q_ann_topk(sf_dir: str):
    from ..functions.similarity import brute_force_topk

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return brute_force_topk(emb, query_ids=list(range(10)), k=5)


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS raw_score
  FROM q JOIN embeddings e ON e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, raw_score,
         row_number() OVER (PARTITION BY query_id ORDER BY raw_score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(raw_score, 4) AS score
FROM ranked WHERE rank <= 5
"""


def q_cosine_dups(sf_dir: str):
    from ..functions.similarity import cosine_near_dup_pairs

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return cosine_near_dup_pairs(emb, threshold=0.3, id_limit=300)


SQL_COSINE_DUPS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 300 AND b.vec_id < 300
  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3
"""


def q_embedding_dup_groups(sf_dir: str):
    """Embedding near-dup GROUPS, fully oracle-checked: exact bounded
    cosine pairs (the same pair set as ``cosine_dups``) resolved to
    connected components by the DISTRIBUTED label-propagation path —
    verified value-for-value against a DuckDB recursive-CTE transitive
    closure.  This pins the distributed CC implementation to an
    independent exact algorithm, not just planted-case pytests."""
    from ..functions.dedup import connected_components_distributed
    from ..functions.similarity import cosine_near_dup_pairs

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    pairs = cosine_near_dup_pairs(emb, threshold=0.3, id_limit=300)

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch.column("vec_a"), "doc_b": batch.column("vec_b")})

    groups = connected_components_distributed(pairs.map_batches(to_edges, batch_format="pyarrow"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id": batch.column("doc_id"), "group_id": batch.column("group_id")})

    return groups.map_batches(rename, batch_format="pyarrow")


SQL_EMBEDDING_DUP_GROUPS = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 300 AND b.vec_id < 300
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
edges AS (SELECT va AS n, vb AS p FROM pairs UNION SELECT vb, va FROM pairs),
reach(n, r) AS (
  SELECT n, p FROM edges
  UNION
  SELECT e.n, r.r FROM edges e JOIN reach r ON r.n = e.p
)
SELECT n AS vec_id, CAST(LEAST(n, MIN(r)) AS BIGINT) AS group_id FROM reach GROUP BY n
"""


def q_lsh_ann(sf_dir: str):
    """Sign-LSH bucketed ANN.  Approximate BY DESIGN but fully
    deterministic (seeded hyperplanes), so it has an exact SQL twin:
    the oracle rebuilds the SAME 8 hyperplanes from the same seeded
    generator as literals, reproduces the sign-bit bucket codes, the
    same-bucket candidate sets, and the (cosine DESC, neighbor_id)
    ranking — the approximation error itself is hash-checked.  Recall
    vs brute force additionally measured in tests."""
    from ..functions.similarity import lsh_ann_topk

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    dim = len(emb.take(1)[0]["embedding"])
    return lsh_ann_topk(emb, query_ids=list(range(10)), dim=dim, k=5)


def _lsh_ann_sql() -> str:
    # the IDENTICAL planes SignLSH(dim=64, n_planes=8, seed=7) builds
    planes = np.random.default_rng(7).standard_normal((64, 8))
    values = ",\n    ".join(
        "({}, CAST([{}] AS DOUBLE[]))".format(j, ", ".join(repr(float(v)) for v in planes[:, j]))
        for j in range(8)
    )
    return f"""
WITH planes(pid, v) AS (
  SELECT * FROM (VALUES
    {values}
  )
),
b AS (
  SELECT vec_id, embedding,
         (SELECT CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.v) > 0
                               THEN 1 << pid ELSE 0 END) AS BIGINT)
          FROM planes p) AS bucket
  FROM embeddings e
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, c.embedding) AS raw_score
  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, raw_score,
         row_number() OVER (PARTITION BY query_id ORDER BY raw_score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(raw_score, 4) AS score
FROM ranked WHERE rank <= 5
"""


SQL_LSH_ANN = _lsh_ann_sql()


def q_ivf_ann(sf_dir: str):
    """IVF (trained coarse quantizer) ANN — approximate; recall vs brute
    force asserted in tests, so rows-only here."""
    from ..functions.similarity import ivf_ann_topk

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ivf_ann_topk(emb, query_ids=list(range(10)), k=5, n_centroids=16, n_probe=3)


def q_ivf_ann_frozen(sf_dir: str):
    """IVF ANN against a FROZEN coarse quantizer (`_ivf_frozen.py`, 16
    centroids trained offline) — the production index shape (train once,
    search online), which makes the whole approximate search a
    deterministic function with an exact SQL twin: assignment is argmax
    over the same 16x64 literals, each query probes its top-3 lists,
    candidates score by cosine inside probed lists only, top-5 per query
    with the (score DESC, neighbor_id) tie-break.  The twin reproduces
    list routing AND ranking, so even the approximation error is
    hash-checked."""
    from ..functions.similarity import ivf_ann_topk
    from ._ivf_frozen import CENTROIDS

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ivf_ann_topk(emb, query_ids=list(range(10)), k=5, n_probe=3, centroids=CENTROIDS)


def _ivf_ann_frozen_sql() -> str:
    from ._ivf_frozen import CENTROIDS

    values = ",\n    ".join(
        "({}, CAST([{}] AS DOUBLE[]))".format(i, ", ".join(repr(float(v)) for v in row))
        for i, row in enumerate(CENTROIDS)
    )
    return f"""
WITH cent(cid, v) AS (
  SELECT * FROM (VALUES
    {values}
  )
),
asn AS (  -- corpus vector -> nearest frozen centroid (argmax dot, lowest cid on ties)
  SELECT vec_id, embedding,
         (SELECT cid FROM (
            SELECT c.cid, list_inner_product(CAST(e.embedding AS DOUBLE[]), c.v) AS s
            FROM cent c) ORDER BY s DESC, cid LIMIT 1) AS list_id
  FROM embeddings e
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
probes AS (  -- each query's top-3 lists by the same dot ordering
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_inner_product(CAST(q.qe AS DOUBLE[]), c.v) DESC, c.cid) AS pr
    FROM q CROSS JOIN cent c)
  WHERE pr <= 3
),
scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, a.embedding) AS raw_score
  FROM q JOIN probes p USING (query_id)
         JOIN asn a ON a.list_id = p.cid AND a.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, raw_score,
         row_number() OVER (PARTITION BY query_id ORDER BY raw_score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(raw_score, 4) AS score
FROM ranked WHERE rank <= 5
"""


SQL_IVF_ANN_FROZEN = _ivf_ann_frozen_sql()


# ---------------------------------------------------------------------------
# multimodal (binary column plumbing; codecs stubbed)
# ---------------------------------------------------------------------------


def _docs_as_media(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "media_bytes": pc.cast(t["text"], pa.binary())}),
        batch_format="pyarrow",
    )


def q_media_metadata(sf_dir: str):
    from ..functions.multimodal import binary_metadata_batch

    return _docs_as_media(sf_dir).map_batches(binary_metadata_batch, batch_format="pyarrow")


SQL_MEDIA_METADATA = """
SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_md5 FROM documents
"""


def q_media_decode(sf_dir: str):
    """STUB image decode over binary column (actor pool, small batches) —
    ORACLE-pinned: the deterministic fake derives (width, height) from the
    payload's first two md5 digest bytes, which the DuckDB twin reproduces
    with ``md5_number_upper`` (first 8 md5 bytes, little-endian — the same
    identity `fingerprint_hamming_pairs` pins).  Valid while the codec
    seam routes every row to the fake (no Pillow in this container and
    the corpus payloads are utf-8 text, not image containers); a real
    codec would re-route magic-byte rows and the twin would then pin only
    the non-image remainder."""
    from ..functions.multimodal import DecodeImage

    return _docs_as_media(sf_dir).map_batches(DecodeImage, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))


SQL_MEDIA_DECODE = """
SELECT doc_id,
       CAST(64 + (md5_number_upper(text) & 255) AS INTEGER) AS width,
       CAST(64 + ((md5_number_upper(text) >> 8) & 255) AS INTEGER) AS height,
       'RGB' AS mode
FROM documents
"""


def q_media_audio(sf_dir: str):
    """STUB audio decode over the binary column (actor pool, small
    batches) — ORACLE-pinned like `media_decode`: the deterministic fake
    derives (n_channels, sample_rate, n_frames) from the payload's first
    four md5 digest bytes, reproduced by the twin with
    ``md5_number_upper`` byte arithmetic; duration is exact integer
    division both sides.  Real RIFF/WAVE PCM bodies would re-route
    through the CLOSED stdlib decoder (`wav_decode_stdlib`) — the corpus
    payloads are utf-8 text, so every row pins the fake path."""
    from ..functions.multimodal import DecodeAudio

    return _docs_as_media(sf_dir).map_batches(DecodeAudio, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))


SQL_MEDIA_AUDIO = """
SELECT doc_id,
       CAST(1 + (md5_number_upper(text) & 1) AS BIGINT) AS n_channels,
       CAST(8000 + 100 * ((md5_number_upper(text) >> 8) & 255) AS BIGINT) AS sample_rate,
       CAST(1000 + ((md5_number_upper(text) >> 16) & 255) + 256 * ((md5_number_upper(text) >> 24) & 255) AS BIGINT) AS n_frames,
       CAST((1000 + ((md5_number_upper(text) >> 16) & 255) + 256 * ((md5_number_upper(text) >> 24) & 255)) * 1000
            // (8000 + 100 * ((md5_number_upper(text) >> 8) & 255)) AS BIGINT) AS duration_ms
FROM documents
"""


def q_media_features(sf_dir: str):
    from ..functions.multimodal import ExtractFeatures

    return _docs_as_media(sf_dir).map_batches(ExtractFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))


def q_media_features_u32(sf_dir: str):
    """The media feature-extraction stage's pre-normalization integers,
    flat (doc_id, dim, feat_u32) — the ORACLE projection of
    `media_features`: the stub model's feature d is the little-endian
    uint32 at byte offset (4d mod 32) of sha256(payload), which the
    DuckDB twin recomputes from the sha256 hex digest with per-byte hex
    arithmetic.  Flat integers sidestep the float32-list hash-compare
    hazard while pinning the exact bytes the float features divide."""
    from ..functions.multimodal import ExtractFeatures

    dim = 16
    stage = ExtractFeatures(dim=dim)

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.schema([("doc_id", pa.int64()), ("dim", pa.int64()), ("feat_u32", pa.int64())]).empty_table()
        raws = [stage.raw_u32(b) for b in t.column("media_bytes").to_pylist()]
        doc_ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n), pa.int64()),
                "feat_u32": pa.array(np.concatenate(raws).astype(np.int64), pa.int64()),
            }
        )

    return _docs_as_media(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=256)


def _media_features_u32_sql(dim: int = 16) -> str:
    hexb = (
        "((strpos('0123456789abcdef', substr(hx, 2*({p})+1, 1))-1)*16"
        " + (strpos('0123456789abcdef', substr(hx, 2*({p})+2, 1))-1))"
    )
    word = " + ".join(
        f"{hexb.format(p=f'((dim*4)%32)+{k}')} * {1 << (8 * k)}" for k in range(4)
    )
    return f"""
WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents),
d AS (SELECT unnest(range({dim})) AS dim)
SELECT doc_id, CAST(dim AS BIGINT) AS dim, CAST({word} AS BIGINT) AS feat_u32
FROM h, d
"""


SQL_MEDIA_FEATURES_U32 = _media_features_u32_sql()


def site_items_dataset(site_names: list[str] | None = None):
    """Registry-driven parse of the concrete site specs' fixture pages ->
    flat items dataset (prefecture, source_url, 12 item cols).  ``site_names``
    filters which crawlers run (CLI ``--sites`` surface); None = all."""
    import ray.data as rdata

    from ..sites import fixtures, reference_sites_registry

    wanted = None if site_names is None else set(site_names)
    rows = [
        {"prefecture": site, "url": url, "body": body}
        for site, pages in sorted(fixtures.pages().items())
        if wanted is None or site in wanted
        for url, body in pages
    ]
    reg = reference_sites_registry()

    def run_parse(batch: pa.Table) -> pa.Table:
        items = []
        for pref, url, body in zip(
            batch.column("prefecture").to_pylist(),
            batch.column("url").to_pylist(),
            batch.column("body").to_pylist(),
        ):
            res = reg.parse(pref, "parse", url, body, {}, 0)
            for it in res.items:
                items.append({"prefecture": pref, "source_url": url, **it})
        from ..stages.parse import _EMPTY_ITEM

        fields = [("prefecture", pa.string()), ("source_url", pa.string())] + [(k, pa.string()) for k in _EMPTY_ITEM]
        return pa.Table.from_pylist(items, schema=pa.schema(fields))

    return rdata.from_items(rows).map_batches(run_parse, batch_format="pyarrow", batch_size=16)


def q_site_items(sf_dir: str):
    """Concrete per-site extractor configurations (all 49 modules in
    sites/) run registry-driven over their reference-DOM-shaped fixture
    pages as a map_batches stage.  Non-SQL (fixture input, not an sf
    table); goldens in tests/test_sites.py; hash-pinned via
    `site_items_md5`."""
    return site_items_dataset()


# frozen from the deterministic fixture corpus (sf-independent); re-freeze
# with tools/freeze_crawl_pins.py if a site spec or fixture changes
SITE_ITEMS_PIN_MD5 = "6ed66bd49d6abbc0e5a5c18475733988"


def q_site_items_md5(sf_dir: str):
    """Determinism PIN for the 49-site extractor suite: the canonical
    content hash (driver-shaped: columns sorted, rows sorted, md5) of the
    full `site_items` table.  The fixture corpus is deterministic and
    sf-independent, so the hash is a CONSTANT and the oracle twin is the
    frozen literal — the same contract as `crawl_determinism`, turning
    the per-site golden coverage into a driver-visible hash-checked row."""
    import ray

    tabs = [t for t in ray.get(site_items_dataset().to_arrow_refs()) if t.num_rows > 0]
    t = pa.concat_tables(tabs)
    return pa.table({"metric": pa.array(["site_items_md5"], pa.string()), "value": pa.array([_canonical_table_md5(t)], pa.string())})


SQL_SITE_ITEMS_MD5 = f"SELECT 'site_items_md5' AS metric, '{SITE_ITEMS_PIN_MD5}' AS value"


# ---------------------------------------------------------------------------
# crawl-engine queries (non-SQL: full engine semantics)
# ---------------------------------------------------------------------------


def q_crawl_lineage(sf_dir: str):
    """Golden-scale end-to-end crawl; returns the lineage table (URL-seen
    set + visit order). Non-SQL (stateful iterative engine); invariants are
    pytest-verified (tests/test_crawl_e2e.py)."""
    import tempfile

    from ..sources.pagestore import ScaleSpec
    from .crawl import CrawlEngine

    out = tempfile.mkdtemp(prefix="crawl_q_")
    eng = CrawlEngine(ScaleSpec.golden(), out, n_seen_shards=2, n_sched_shards=2, n_parts=4)
    eng.run()
    eng.shutdown()
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(out, "lineage")).to_table()
    return t.select(["url", "host", "depth", "wave", "visit_seq"]).sort_by([("host", "ascending"), ("visit_seq", "ascending")])


def q_crawl_documents(sf_dir: str):
    """Golden-scale crawl -> the engine's interleaved span documents table
    (EXACTLY the BASELINE.json input_hint shape, produced by the real
    fetch->parse->emit path). Non-SQL; per-row span-sequence equality is
    pytest-verified (test_documents_span_invariant)."""
    import tempfile

    from ..sources.pagestore import ScaleSpec
    from .crawl import CrawlEngine

    out = tempfile.mkdtemp(prefix="crawl_docs_")
    eng = CrawlEngine(ScaleSpec.golden(), out, n_seen_shards=2, n_sched_shards=2, n_parts=4)
    eng.run()
    eng.shutdown()
    import pyarrow.dataset as pads

    return pads.dataset(os.path.join(out, "documents")).to_table().sort_by("doc_id")


def _canonical_table_md5(t: pa.Table) -> str:
    """Canonical content hash of a (small) table: columns sorted by name,
    each row rendered as '|'-joined ``str()`` values, rows sorted — the
    same shape as the driver's value-hash, so a pin here is a pin of
    exactly what the correctness gate would see."""
    import hashlib

    cols = sorted(t.column_names)
    lists = [t.column(c).to_pylist() for c in cols]
    rows = sorted("|".join(str(v) for v in vals) for vals in zip(*lists))
    return hashlib.md5("\n".join(rows).encode("utf-8")).hexdigest()


def q_crawl_determinism(sf_dir: str):
    """Determinism PIN for the crawl engine: runs the golden-scale crawl
    end-to-end and returns the canonical content hashes of its lineage
    and documents tables as data.  The engine is bit-identical across
    widths and runs (virtual clocks, never-expiring page store — the
    reference's cached-rerun determinism, README.md:71-72), so the
    hashes are CONSTANTS; the oracle twin is the frozen expected set,
    which turns the e2e determinism invariant into a hash-checked
    correctness row.  Also pins the PageRank ranks over the crawl's own
    link graph (micro-unit ints — the iterative-float op gets its
    oracle through the same determinism contract).  If engine semantics
    change intentionally, re-freeze via tools/freeze_crawl_pins.py."""
    lineage = q_crawl_lineage(sf_dir)
    documents = q_crawl_documents(sf_dir)
    pr = q_crawl_pagerank(sf_dir)
    pr_t = pr if isinstance(pr, pa.Table) else pa.concat_tables([pa.table(b) for b in pr.iter_batches(batch_format="pyarrow")])
    return pa.table(
        {
            "metric": pa.array(["documents_md5", "lineage_md5", "pagerank_md5"], pa.string()),
            "value": pa.array(
                [
                    _canonical_table_md5(documents),
                    _canonical_table_md5(lineage),
                    _canonical_table_md5(pr_t),
                ],
                pa.string(),
            ),
        }
    )


# frozen by tools/freeze_crawl_pins.py (golden-scale crawl, any width)
CRAWL_PIN_DOCUMENTS_MD5 = "d19e7f29ac448495423ed2ee83f19226"
CRAWL_PIN_LINEAGE_MD5 = "09c90d430c4fb8e610d85acca8dda000"
CRAWL_PIN_PAGERANK_MD5 = "87aaf2103f077d259fa171dc1846e25e"
# wave-free lineage (url, host, depth, visit_seq) — identical between the
# chain-following and strict-wave engines (the wave column legitimately
# differs: chains fold a host's hops into the seed's wave)
CRAWL_PIN_LINEAGE_NOWAVE_MD5 = "4cce0de973ace977a1382191aa343791"


def q_crawl_determinism_strict(sf_dir: str):
    """Determinism PIN for the OTHER engine path — strict waves
    (chain_mode=False, one global barrier per hop) with forced
    DISTRIBUTED admission (driver_admit_max_pages=0, the dataset-native
    explode -> first_per_key dedup -> admit -> schedule path every
    wave).  The chain-vs-wave equivalence contract (same visit order,
    same seen set, same documents) becomes a driver-visible hash row:
    documents must hash to the SAME frozen constant as the chain path,
    and lineage is pinned wave-free."""
    import os as _os
    import tempfile

    import pyarrow.dataset as pads

    from ..sources.pagestore import ScaleSpec
    from .crawl import CrawlEngine

    out = tempfile.mkdtemp(prefix="crawl_strict_")
    eng = CrawlEngine(
        ScaleSpec.golden(), out, n_seen_shards=2, n_sched_shards=2, n_parts=4,
        chain_mode=False, driver_admit_max_pages=0,
    )
    eng.run()
    eng.shutdown()
    docs = pads.dataset(_os.path.join(out, "documents")).to_table().sort_by("doc_id")
    lin = (
        pads.dataset(_os.path.join(out, "lineage"))
        .to_table()
        .select(["url", "host", "depth", "visit_seq"])
        .sort_by([("host", "ascending"), ("visit_seq", "ascending")])
    )
    return pa.table(
        {
            "metric": pa.array(["documents_md5", "lineage_nowave_md5"], pa.string()),
            "value": pa.array([_canonical_table_md5(docs), _canonical_table_md5(lin)], pa.string()),
        }
    )


SQL_CRAWL_DETERMINISM_STRICT = f"""
SELECT 'documents_md5' AS metric, '{CRAWL_PIN_DOCUMENTS_MD5}' AS value
UNION ALL
SELECT 'lineage_nowave_md5', '{CRAWL_PIN_LINEAGE_NOWAVE_MD5}'
"""

SQL_CRAWL_DETERMINISM = f"""
SELECT 'documents_md5' AS metric, '{CRAWL_PIN_DOCUMENTS_MD5}' AS value
UNION ALL
SELECT 'lineage_md5', '{CRAWL_PIN_LINEAGE_MD5}'
UNION ALL
SELECT 'pagerank_md5', '{CRAWL_PIN_PAGERANK_MD5}'
"""


def q_doc_spans(sf_dir: str):
    """documents -> interleaved span documents (input_hint shape): text
    split into 10-word text spans with media refs every 5th span.
    Non-SQL (nested list<struct> output).

    Fully vectorized (the crawl path's flat-accumulator pattern,
    crawl.py span emitter): one Arrow whitespace split, numpy offset
    arithmetic, and exactly one ``ListArray.from_arrays`` per batch — no
    per-row Python.  Semantics identical to ``" ".join(text.split()[i:i+10])``
    chunking: span k of a doc is words [10k, 10k+10) joined by single
    spaces, kind="image" + a media ref on every 5th span."""
    from ..schemas import SPAN_STRUCT

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        doc_id_str = pc.cast(t.column("doc_id"), pa.string()).combine_chunks()
        if n_docs == 0:
            return pa.table({"doc_id": pa.array([], pa.string()), "spans": pa.array([], pa.list_(SPAN_STRUCT))})
        # words per doc — Arrow's split keeps empty tokens at boundaries
        # (Python str.split drops them), so trim then drop zero-length words
        # with a cumsum offset rebuild (reduceat is unsafe on empty docs)
        wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text"))).combine_chunks()
        flat = wl.flatten()
        off = wl.offsets.to_numpy().astype(np.int64)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        csum = np.concatenate(([0], np.cumsum(keep)))
        word_off = csum[off]  # per-doc offsets into the kept-words array
        flat_kept = flat.filter(pa.array(keep))
        n_words = np.diff(word_off)
        # span layout: ceil(n_words/10) spans per doc, contiguous in the
        # kept-words array -> span boundaries ARE a valid offsets vector
        n_spans = (n_words + 9) // 10
        doc_off = np.concatenate(([0], np.cumsum(n_spans)))
        total = int(doc_off[-1])
        doc_idx = np.repeat(np.arange(n_docs), n_spans)
        span_ord = np.arange(total) - np.repeat(doc_off[:-1], n_spans)
        starts = word_off[doc_idx] + span_ord * 10
        span_word_off = np.append(starts, word_off[-1])
        span_words = pa.ListArray.from_arrays(pa.array(span_word_off, pa.int32()), flat_kept)
        span_text = pc.binary_join(span_words, " ")
        is_image = span_ord % 5 == 4
        kind = pc.if_else(pa.array(is_image), "image", "text")
        ref_all = pc.binary_join_element_wise(
            "media://", pc.take(doc_id_str, pa.array(doc_idx)), "/", pc.cast(pa.array(span_ord), pa.string()), ""
        )
        media_ref = pc.if_else(pa.array(is_image), ref_all, "")
        struct = pa.StructArray.from_arrays(
            [kind, span_text, media_ref, pa.array(span_ord, pa.int32())],
            fields=list(SPAN_STRUCT),
        )
        spans = pa.ListArray.from_arrays(pa.array(doc_off, pa.int32()), struct)
        return pa.table({"doc_id": doc_id_str, "spans": spans})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_doc_spans_flat(sf_dir: str):
    """Flattened projection of the flagship span pipeline — and its ORACLE:
    one row per span, which DuckDB reproduces exactly with
    string_split_regex + list_slice 10-word chunking, so the vectorized
    offset arithmetic in q_doc_spans is hash-checked end-to-end (the
    nested form itself stays rows-only: list<struct> output)."""

    def flatten(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        return pa.table(
            {
                "doc_id": pc.take(t.column("doc_id").combine_chunks(), parents),
                "offset": flat.field("offset"),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
            }
        )

    return q_doc_spans(sf_dir).map_batches(flatten, batch_format="pyarrow")


SQL_DOC_SPANS_FLAT = """
WITH words AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS w
  FROM documents
),
spans AS (
  SELECT doc_id,
         CAST(i AS INTEGER) AS "offset",
         array_to_string(list_slice(w, i*10+1, i*10+10), ' ') AS text
  FROM words, LATERAL (SELECT UNNEST(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS i)
)
SELECT doc_id, "offset",
       CASE WHEN "offset" % 5 = 4 THEN 'image' ELSE 'text' END AS kind,
       text,
       CASE WHEN "offset" % 5 = 4 THEN 'media://' || doc_id || '/' || CAST("offset" AS VARCHAR) ELSE '' END AS media_ref
FROM spans
"""


def q_doc_chunks(sf_dir: str):
    """Sliding-window chunking with overlap (window 50 words, stride 25)
    — the standard long-document training-data op: overlapping windows
    so no boundary context is lost (BERT/stride convention: windows at
    0, S, 2S, ...; the last window starts at the smallest multiple of S
    whose window reaches the document end).

    Overlap means chunk word-ranges are NOT a valid Arrow offsets
    vector (offsets must tile), so unlike ``q_doc_spans`` this builds
    an explicit flat gather index (repeat/cumsum arithmetic), then one
    ``pc.take`` + one ``ListArray.from_arrays`` + one ``pc.binary_join``
    per batch — still no per-row Python.  Oracle: the identical
    list_slice windows in DuckDB."""
    W, S = 50, 25
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    empty = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("chunk_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("chunk_text", pa.string()),
        ]
    )

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty.empty_table()
        wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text"))).combine_chunks()
        flat = wl.flatten()
        off = wl.offsets.to_numpy().astype(np.int64)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        csum = np.concatenate(([0], np.cumsum(keep)))
        word_off = csum[off]  # per-doc offsets into kept-words
        flat_kept = flat.filter(pa.array(keep))
        n_words = np.diff(word_off)
        n_chunks = np.where(n_words > 0, 1 + np.ceil(np.maximum(n_words - W, 0) / S).astype(np.int64), 0)
        total = int(n_chunks.sum())
        if total == 0:
            return empty.empty_table()
        doc_idx = np.repeat(np.arange(t.num_rows), n_chunks)
        chunk_off = np.concatenate(([0], np.cumsum(n_chunks)))
        chunk_id = np.arange(total) - np.repeat(chunk_off[:-1], n_chunks)
        starts = chunk_id * S
        ends = np.minimum(starts + W, n_words[doc_idx])
        clens = ends - starts
        # explicit flat gather (windows overlap -> can't reuse offsets)
        nflat = int(clens.sum())
        base = word_off[doc_idx] + starts
        flat_idx = np.repeat(base, clens) + (np.arange(nflat) - np.repeat(np.cumsum(clens) - clens, clens))
        chunk_words = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(clens))), pa.int32()),
            pc.take(flat_kept, pa.array(flat_idx)),
        )
        return pa.table(
            {
                "doc_id": pc.take(t.column("doc_id").combine_chunks(), pa.array(doc_idx)).cast(pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "n_tokens": pa.array(clens, pa.int64()),
                "chunk_text": pc.binary_join(chunk_words, " "),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOC_CHUNKS = """
WITH words AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS w
  FROM documents
),
meta AS (SELECT doc_id, w, len(w) AS n FROM words WHERE len(w) > 0)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(least(i*25 + 50, n) - i*25 AS BIGINT) AS n_tokens,
       array_to_string(list_slice(w, i*25 + 1, least(i*25 + 50, n)), ' ') AS chunk_text
FROM meta, LATERAL (SELECT UNNEST(range(CAST(1 + ceil(greatest(n - 50, 0) / 25.0) AS BIGINT))) AS i)
"""


def q_embedding_quantize(sf_dir: str):
    """Int8-style scalar quantization of the embedding column (per-dim
    corpus min/max -> 0..255 codes) — the standard ANN-index compression
    step (4x smaller vectors before IVF/HNSW build).  Two streaming
    passes: per-dim min/max partials per batch (d rows each) -> one tiny
    groupby, then the 64-entry scale table rides in the closure while a
    second pass quantizes every vector.  Oracle: identical
    ``(x - mn) * 255 / (mx - mn)`` arithmetic over the UNNESTed column in
    DuckDB, half-away rounding on both sides."""
    from ray.data.aggregate import Max, Min

    from ..functions.similarity import _as_matrix

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()), "mn": pa.array([], pa.float64()), "mx": pa.array([], pa.float64())}
            )
        m = _as_matrix(t.column("embedding"))
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "mn": pa.array(m.min(axis=0), pa.float64()),
                "mx": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    mm = (
        ds.map_batches(minmax, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .take_all()
    )  # d rows — broadcast in the closure
    mm.sort(key=lambda r: r["dim"])
    mn = np.array([r["mn"] for r in mm])
    mx = np.array([r["mx"] for r in mm])
    span = mx - mn

    def quantize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()), "q": pa.array([], pa.int64())}
            )
        m = _as_matrix(t.column("embedding"))
        n, d = m.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            x = (m - mn) * 255.0 / span
        x = np.where(span == 0, 0.0, x)
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)  # DuckDB round: half away
        vec_ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vec_ids, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n), pa.int64()),
                "q": pa.array(q.ravel(), pa.int64()),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow")


SQL_EMBEDDING_QUANTIZE = """
WITH e AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS i)
),
mm AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim)
SELECT e.vec_id, e.dim,
       CAST(CASE WHEN mm.mx = mm.mn THEN 0
                 ELSE round((e.x - mm.mn) * 255.0 / (mm.mx - mm.mn)) END AS BIGINT) AS q
FROM e JOIN mm USING (dim)
"""


def q_events_pct_rank(sf_dir: str):
    """Global percent_rank of value within event type — the full-ordering
    window op, computed without materializing a global sort: see
    :func:`~goto_eater_crawler_ray.functions.window.percent_rank_per_key`
    (value-range partitions + a bounded per-(key,bin) count table scanned
    on the driver + exact local min-ranks; ties never span partitions)."""
    from ..functions.window import percent_rank_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    return percent_rank_per_key(ds, "event_type", "value", "event_id")


SQL_EVENTS_PCT_RANK = """
SELECT event_id, event_type,
       CAST(round(1000000 * percent_rank() OVER (PARTITION BY event_type ORDER BY value)) AS BIGINT)
       AS pct_rank_6dp
FROM events
"""


def q_minhash_sigs(sf_dir: str):
    """MinHash SIGNATURES with an exact SQL oracle — the mathematical
    core of the near-dup family, hash-checked: 8 permutations of the
    md5-family shingle hash (``_shingle_hashes(family="md5")``, whose
    64-bit value IS DuckDB's ``md5_number_upper``), flat
    ``(doc_id, perm, sig)`` rows.  The twin reproduces the permutation
    arithmetic exactly — uint64 WRAPPING multiply/add via HUGEINT
    ``% 2^64`` then the Mersenne ``% (2^61 - 1)`` — with the a/b
    parameters frozen as literals from the same seeded generator the
    production (crc32-family, 64-perm) LSH pipeline uses.  Sig values
    are < 2^61 so they fit BIGINT on both sides."""
    from ..functions.dedup import MinHasher

    N_PERM = 8
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"n_perm": N_PERM, "hash_family": "md5"},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def flatten(t: pa.Table) -> pa.Table:
        m = t.column("minhash").combine_chunks()
        flat = m.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(m)
        return pa.table(
            {
                "doc_id": pc.take(t.column("doc_id").combine_chunks(), pa.array(np.repeat(np.arange(n), N_PERM))),
                "perm": pa.array(np.tile(np.arange(N_PERM, dtype=np.int64), n), pa.int64()),
                "sig": pa.array(flat, pa.int64()),
            }
        )

    return sigs.map_batches(flatten, batch_format="pyarrow")


def _minhash_sigs_sql() -> str:
    from ..functions.dedup import _perm_params

    a, b = _perm_params(8, seed=42)
    values = ",\n    ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(8))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, len(ws) - 1), i ->
              array_to_string(list_slice(ws, i, i + 2), ' ')) END) AS s
  FROM toks
),
p(perm, a, b) AS (
  SELECT * FROM (VALUES
    {values}
  )
),
vals AS (
  SELECT sh.doc_id, p.perm,
         ((CAST(md5_number_upper(sh.s) AS HUGEINT) * p.a) % 18446744073709551616 + p.b)
         % 18446744073709551616 % 2305843009213693951 AS v
  FROM sh CROSS JOIN p
)
SELECT doc_id, CAST(perm AS BIGINT) AS perm, CAST(min(v) AS BIGINT) AS sig
FROM vals GROUP BY doc_id, perm
"""


SQL_MINHASH_SIGS = _minhash_sigs_sql()


def q_simhash_sigs(sf_dir: str):
    """SimHash SIGNATURES with an exact SQL oracle — the bit-vote core
    of the simhash family (Charikar 2002), hash-checked like
    `minhash_sigs`: per doc, each DISTINCT token votes ±1 on all 64 bits
    of its md5-family hash (``md5_number_upper``-compatible), the sign
    of each bit's vote total forms the signature, emitted as four
    16-bit pieces so every value stays BIGINT-safe on both sides.
    Batch path is the production SimHasher shape: factorize tokens,
    hash once per distinct batch token, one int8 scatter-add."""
    from ..functions.sampling import md5_u64

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    BITS = np.arange(64, dtype=np.uint64)

    empty = pa.schema([("doc_id", pa.int64()), ("piece", pa.int64()), ("value", pa.int64())])

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty.empty_table()
        # distinct non-empty tokens per doc (lowered), flat with parents
        wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(pc.utf8_lower(t.column("text")))).combine_chunks()
        flat = wl.flatten()
        parents = pc.list_parent_indices(wl).to_numpy(zero_copy_only=False)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        words = flat.filter(pa.array(keep)).to_pandas().to_numpy()
        parents = parents[keep]
        pair = pd.DataFrame({"p": parents, "w": words}).drop_duplicates()
        parents, words = pair["p"].to_numpy(), pair["w"].to_numpy()
        codes, uniq = pd.factorize(pd.Series(words), sort=False)
        h_uniq = md5_u64(uniq.to_numpy())
        contrib = (2 * ((h_uniq[:, None] >> BITS[None, :]) & np.uint64(1)).astype(np.int8) - 1)
        acc = np.zeros((n, 64), np.int64)
        np.add.at(acc, parents, contrib[codes])
        bits = (acc > 0).astype(np.int64)
        piece_vals = np.zeros((n, 4), np.int64)
        for p in range(4):
            piece_vals[:, p] = (bits[:, 16 * p : 16 * (p + 1)] * (1 << np.arange(16, dtype=np.int64))[None, :]).sum(axis=1)
        doc_ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, 4), pa.int64()),
                "piece": pa.array(np.tile(np.arange(4, dtype=np.int64), n), pa.int64()),
                "value": pa.array(piece_vals.ravel(), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_SIMHASH_SIGS = """
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> len(w) > 0)) AS ws
  FROM documents
),
w AS (SELECT doc_id, unnest(ws) AS t FROM toks),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (md5_number_upper(w.t) >> j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM w, (SELECT unnest(range(64)) AS j) GROUP BY doc_id, j
)
SELECT doc_id, CAST(j // 16 AS BIGINT) AS piece,
       CAST(sum(CASE WHEN acc > 0 THEN 1 << (j % 16) ELSE 0 END) AS BIGINT) AS value
FROM bits GROUP BY doc_id, j // 16
"""


def _simhash_md5_ds(sf_dir: str, as_uint64: bool = False):
    """Shared md5-family SimHash signature dataset: (doc_id int64,
    simhash).  The same distinct-token bit-vote core as q_simhash_sigs,
    assembled to one 64-bit value — int64 two's-complement by default
    (matching the DuckDB HUGEINT-wrap twins), uint64 when feeding
    `hamming_near_pairs` (which XORs in uint64)."""
    from ..functions.sampling import md5_u64

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    BITS = np.arange(64, dtype=np.uint64)
    out_type = pa.uint64() if as_uint64 else pa.int64()
    empty = pa.schema([("doc_id", pa.int64()), ("simhash", out_type)])

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty.empty_table()
        wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(pc.utf8_lower(t.column("text")))).combine_chunks()
        flat = wl.flatten()
        parents = pc.list_parent_indices(wl).to_numpy(zero_copy_only=False)
        keep = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
        words = flat.filter(pa.array(keep)).to_pandas().to_numpy()
        parents = parents[keep]
        pair = pd.DataFrame({"p": parents, "w": words}).drop_duplicates()
        parents, words = pair["p"].to_numpy(), pair["w"].to_numpy()
        codes, uniq = pd.factorize(pd.Series(words), sort=False)
        h_uniq = md5_u64(uniq.to_numpy())
        contrib = 2 * ((h_uniq[:, None] >> BITS[None, :]) & np.uint64(1)).astype(np.int8) - 1
        acc = np.zeros((n, 64), np.int64)
        np.add.at(acc, parents, contrib[codes])
        sims = ((acc > 0).astype(np.uint64) << BITS[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "simhash": pa.array(sims if as_uint64 else sims.view(np.int64), out_type),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_simhash_groups_md5(sf_dir: str):
    """Exact-simhash collision groups (hamming-0 near-dups) under the md5
    hash family — `simhash_dup_groups`'s groupby-Min/Count machinery
    ORACLE-pinned: the DuckDB twin recomputes the 64-bit signature from
    the `simhash_sigs` bit-vote CTE, assembles the four BIGINT-safe
    16-bit pieces into one HUGEINT, wraps to two's-complement int64
    (matching the batch path's uint64 -> int64 bit reinterpretation), and
    groups by the assembled value."""
    from ray.data.aggregate import Count, Min

    grouped = (
        _simhash_md5_ds(sf_dir)
        .groupby("simhash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_docs"))
    )
    return grouped.filter(lambda r: r["n_docs"] > 1)


def q_simhash_near_pairs_md5(sf_dir: str):
    """Hamming<=3 SimHash near-dup pairs under the md5 hash family —
    the `simhash_near_pairs` pigeonhole-banding machinery with the
    oracle-replicable signature, so the whole explode->bucket->verify->
    dedup path is hash-checked: the DuckDB twin recomputes the md5-family
    simhash per doc (the `simhash_groups_md5` vals CTE) and forms the
    exact radius with a quadratic ``bit_count(xor(a,b)) <= 3`` self-join
    (banding has recall 1.0 for the radius, so the sets are equal — the
    same trick as `fingerprint_hamming_pairs`, now over the production
    SimHash bit-vote signature instead of a raw fingerprint).  The
    ORACLE variant disables the hot-bucket star guard
    (``hot_bucket_cap``): the guard intentionally trades recall for
    bounded work on degenerate mega-collision buckets, which would
    diverge from the exact twin; the production default
    (`simhash_near_pairs`) keeps it."""
    from ..functions.dedup import hamming_near_pairs

    return hamming_near_pairs(_simhash_md5_ds(sf_dir, as_uint64=True), max_hamming=3, hot_bucket_cap=1 << 30)


# shared md5-family simhash value CTE chain: documents -> per-doc 64-bit
# signature, wrapped to two's-complement BIGINT (matches the batch path's
# uint64 -> int64 bit reinterpretation)
_SIMHASH_MD5_VALS_CTE = """
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> len(w) > 0)) AS ws
  FROM documents
),
w AS (SELECT doc_id, unnest(ws) AS t FROM toks),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (md5_number_upper(w.t) >> j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM w, (SELECT unnest(range(64)) AS j) GROUP BY doc_id, j
),
pieces AS (
  SELECT doc_id, j // 16 AS piece,
         sum(CASE WHEN acc > 0 THEN 1 << (j % 16) ELSE 0 END) AS value
  FROM bits GROUP BY doc_id, j // 16
),
vals AS (
  SELECT doc_id,
         sum(CAST(value AS HUGEINT) * CASE piece WHEN 0 THEN 1 WHEN 1 THEN 65536
             WHEN 2 THEN 4294967296 ELSE 281474976710656 END) AS h
  FROM pieces GROUP BY doc_id
),
sigs AS (
  SELECT doc_id,
         CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616 ELSE h END AS BIGINT) AS simhash
  FROM vals
)"""

SQL_SIMHASH_GROUPS_MD5 = f"""
{_SIMHASH_MD5_VALS_CTE}
SELECT simhash, min(doc_id) AS keep_id, count(*) AS n_docs
FROM sigs GROUP BY simhash HAVING count(*) > 1
"""

SQL_SIMHASH_NEAR_PAIRS_MD5 = f"""
{_SIMHASH_MD5_VALS_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_span_reassemble(sf_dir: str):
    """Render each interleaved span document back to one training-ready
    string — text spans verbatim, media spans as ``<media_ref>``
    placeholders, joined in offset order (the doc-to-tokenizer-input
    step of a multimodal pipeline; the inverse of the chunker).

    Shape: ONE coarse hash shuffle by doc_id % 64, then per partition a
    single lexsort + ``ListArray.from_arrays`` + ``pc.binary_join`` —
    order-aware string aggregation with no per-doc Python call (the
    same one-ListArray-per-batch idiom as the flagship span builder).
    ORACLE: ``string_agg(..., ' ' ORDER BY offset)`` over the shared
    span-chunking CTE."""
    flat = q_doc_spans_flat(sf_dir)

    def part_key(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        return t.append_column("_part", pc.cast(pc.bit_wise_and(ids, 63), pa.int32()))

    out_schema = pa.schema([("doc_id", pa.string()), ("rendered", pa.string())])

    def render(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return out_schema.empty_table()
        ids = part.column("doc_id").to_pandas().to_numpy()
        offs = part.column("offset").to_numpy(zero_copy_only=False)
        kinds = part.column("kind").to_pandas().to_numpy()
        texts = part.column("text").to_pandas().to_numpy()
        refs = part.column("media_ref").to_pandas().to_numpy()
        order = np.lexsort((offs, ids))
        ids, kinds, texts, refs = ids[order], kinds[order], texts[order], refs[order]
        pieces = np.where(kinds == "image", "<" + refs + ">", texts)
        starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
        offsets = np.append(starts, n).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), pa.array(pieces, pa.string()))
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.string()),
                "rendered": pc.binary_join(lists, " "),
            },
            schema=out_schema,
        )

    return flat.map_batches(part_key, batch_format="pyarrow").groupby("_part").map_groups(render, batch_format="pyarrow")


def _span_reassemble_sql() -> str:
    # share the span-chunking CTE with SQL_DOC_SPANS_FLAT: flat spans ->
    # order-aware string_agg per doc
    flat_body = SQL_DOC_SPANS_FLAT.strip()
    return f"""
WITH flat AS (
{flat_body}
)
SELECT doc_id,
       string_agg(CASE WHEN kind = 'image' THEN '<' || media_ref || '>' ELSE text END, ' ' ORDER BY "offset") AS rendered
FROM flat GROUP BY doc_id
"""


SQL_SPAN_REASSEMBLE = _span_reassemble_sql()


def q_span_dedup(sf_dir: str):
    """Span-level exact dedup over the interleaved corpus — dedup at the
    SPAN granularity (the multimodal-corpus variant of exact dedup:
    boilerplate text spans repeat across pages even when whole documents
    differ).  A span is a duplicate unless it is the global-first
    ``(doc_id, offset)`` occurrence of its text; output is the per-doc
    audit ``(doc_id, n_spans, n_dup_spans)``.

    Shape: spans flow as (64-bit text key, packed position) rows — the
    groupby(key) exchange never carries span text; first-wins is a
    single ``Min`` over the packed position (doc_id·2^20 + offset, the
    same first-occurrence total order the SQL twin computes).  The two
    per-doc counts (total spans, first-occurrence spans) meet in ONE
    union+groupby — two-column partials instead of a per-doc hash join
    (a join here is pure fixed overhead: both sides share the doc_id
    key and the aggregate is a sum)."""
    from ray.data.aggregate import Min

    from ..functions.sampling import md5_u64

    flat = q_doc_spans_flat(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        key = md5_u64(t.column("text")).astype(np.int64)
        doc = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        off = t.column("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "packed": pa.array(doc * (1 << 20) + off, pa.int64()),  # assumes < 2^20 spans/doc
            }
        )

    k = flat.map_batches(keyed, batch_format="pyarrow").materialize()

    def count_partial(docs_np: np.ndarray, col: str) -> pa.Table:
        ids, counts = np.unique(docs_np, return_counts=True)
        z = np.zeros(len(ids), np.int64)
        total = counts if col == "n_spans" else z
        first = counts if col == "n_first" else z
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_spans": pa.array(total, pa.int64()),
                "n_first": pa.array(first, pa.int64()),
            }
        )

    per_doc = k.map_batches(
        lambda t: count_partial(t.column("doc_id").to_numpy(zero_copy_only=False), "n_spans"),
        batch_format="pyarrow",
    )
    firsts = (
        k.groupby("key")
        .aggregate(Min("packed", alias_name="packed"))
        .map_batches(
            lambda t: count_partial(
                (t.column("packed").to_numpy(zero_copy_only=False) // (1 << 20)), "n_first"
            ),
            batch_format="pyarrow",
        )
    )
    out = per_doc.union(firsts).groupby("doc_id").aggregate(
        Sum("n_spans", alias_name="n_spans"), Sum("n_first", alias_name="n_first")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_spans": t.column("n_spans"),
                "n_dup_spans": pc.subtract(t.column("n_spans"), t.column("n_first")),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_SPAN_DEDUP = """
WITH words AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS w
  FROM documents
),
sp AS (
  SELECT doc_id, CAST(i AS INTEGER) AS off,
         array_to_string(list_slice(w, i*10+1, i*10+10), ' ') AS text
  FROM words, LATERAL (SELECT UNNEST(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS i)
),
k AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         md5_number_upper(text) AS key,
         CAST(doc_id AS BIGINT) * 1048576 + off AS packed
  FROM sp
),
firsts AS (SELECT key, min(packed) AS packed FROM k GROUP BY key),
per_doc AS (SELECT doc_id, count(*) AS n_spans FROM k GROUP BY doc_id),
first_per_doc AS (SELECT packed // 1048576 AS doc_id, count(*) AS n_first FROM firsts GROUP BY 1)
SELECT p.doc_id, p.n_spans,
       CAST(p.n_spans - COALESCE(f.n_first, 0) AS BIGINT) AS n_dup_spans
FROM per_doc p LEFT JOIN first_per_doc f USING (doc_id)
"""


def q_events_sample_per_type(sf_dir: str):
    """Deterministic fixed-k sample PER GROUP (3 events per event_type,
    chosen by md5-of-id priority) — the 'k examples per class' sampler
    eval-set construction and per-source corpus capping use; see
    :func:`~goto_eater_crawler_ray.functions.sampling.sample_topk_per_group`.
    ORACLE: the DuckDB twin is the identical priority order as a
    ``row_number() OVER (PARTITION BY ... ORDER BY md5_number_upper(...))``
    window."""
    from ..functions.sampling import sample_topk_per_group

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "event_id"])
    return sample_topk_per_group(ds, "event_type", "event_id", k=3)


SQL_EVENTS_SAMPLE_PER_TYPE = """
SELECT event_type, event_id, rk FROM (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5_number_upper(CAST(event_id AS VARCHAR)), event_id
         ) AS rk
  FROM events
) WHERE rk <= 3
"""


def q_doc_sample_weighted(sf_dir: str):
    """Length-weighted deterministic corpus sample (top-50 by A-Res
    priority, weight = character length) — see
    :func:`~goto_eater_crawler_ray.functions.sampling.weighted_topk`.
    Long documents are proportionally more likely in; membership is a
    pure function of doc_id, reproducible at any width."""
    from ..functions.sampling import weighted_topk

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def with_weight(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"), "w": pc.cast(pc.utf8_length(t.column("text")), pa.int64())}
        )

    return weighted_topk(ds.map_batches(with_weight, batch_format="pyarrow"), "doc_id", "w", k=50)


SQL_DOC_SAMPLE_WEIGHTED = """
WITH pri AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS weight,
         pow((md5_number_upper(CAST(doc_id AS VARCHAR)) % 9007199254740992)
             / 9007199254740992.0,
             1.0 / CAST(length(text) AS DOUBLE)) AS p
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, weight,
       CAST(round(p * 1000000000) AS BIGINT) AS priority_9dp
FROM pri ORDER BY p DESC, doc_id LIMIT 50
"""


def q_events_users_by_type(sf_dir: str):
    """EXACT distinct users per event type — count-distinct as a
    two-level aggregate (the exact counterpart of the HLL sketch in
    `approx_distinct_users`): batch-local (type, user) dedup partials,
    one groupby(type, user) distinct exchange, then a tiny per-type
    count.  The exchange carries distinct pairs, never the event
    stream."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t.column("event_type").to_pandas(), "user_id": t.column("user_id").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        return pa.table(
            {"event_type": pa.array(df["event_type"], pa.string()), "user_id": pa.array(df["user_id"].to_numpy(), pa.int64())}
        )

    distinct = ds.map_batches(pairs, batch_format="pyarrow").groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_c"))

    def per_type(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t.column("event_type").to_pandas()})
        g = df.groupby("event_type", as_index=False).size()
        return pa.table({"event_type": pa.array(g["event_type"], pa.string()), "n": pa.array(g["size"].to_numpy(), pa.int64())})

    return (
        distinct.map_batches(per_type, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_users"))
    )


SQL_EVENTS_USERS_BY_TYPE = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


def q_events_bucketize(sf_dir: str):
    """Equi-depth quartile bucketing of a numeric feature — the standard
    feature-discretization op (quantile binning for GBDT-style models /
    balanced sampling strata).  The quartile cuts come from the SAME
    mergeable fixed-bin histogram sketch `value_quantiles` uses (two
    tiny passes: min/max/count aggregate, then <=1024 partial bin rows
    per batch), broadcast in the closure; a stateless third pass assigns
    bucket = #cuts below the event's bin.  All-integer bin/cut
    arithmetic mirrored in the SQL twin, so the assignment is
    hash-exact."""
    from ray.data.aggregate import Count, Max, Min

    N_BINS = 1024
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "value"])
    stats = ds.aggregate(Min("value", alias_name="lo"), Max("value", alias_name="hi"), Count(alias_name="n"))
    lo, hi, n = float(stats["lo"] or 0.0), float(stats["hi"] or 0.0), int(stats["n"])
    width = (hi - lo) / float(N_BINS)
    if n == 0 or width == 0.0:
        # empty or constant column: one degenerate bucket (the sketch has
        # no spread to cut; the SQL twin's division would be undefined, so
        # this edge is guarded here, not oracle-compared)
        return ds.map_batches(
            lambda t: pa.table(
                {"event_id": t.column("event_id"), "bucket": pa.array(np.zeros(t.num_rows, np.int64), pa.int64())}
            ),
            batch_format="pyarrow",
        )

    def bins_of(v: np.ndarray) -> np.ndarray:
        return np.minimum(np.floor((v - lo) / width), N_BINS - 1).astype(np.int64)

    def bin_counts(t: pa.Table) -> pa.Table:
        b = bins_of(t.column("value").to_numpy(zero_copy_only=False).astype(np.float64))
        bins, counts = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(bins, pa.int64()), "c": pa.array(counts, pa.int64())})

    hdf = (
        ds.map_batches(bin_counts, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("bin")
    )  # <= 1024 rows: driver-safe by construction
    cum = hdf["c"].cumsum().to_numpy()
    bins_sorted = hdf["bin"].to_numpy()
    cuts = []
    for pct in (25, 50, 75):
        rank = (pct * n + 99) // 100  # ceil in pure ints, FP-identity-proof
        idx = int(np.searchsorted(cum, rank, side="left"))
        cuts.append(int(bins_sorted[min(idx, len(bins_sorted) - 1)]))
    cuts_arr = np.array(cuts, np.int64)

    def assign(t: pa.Table) -> pa.Table:
        b = bins_of(t.column("value").to_numpy(zero_copy_only=False).astype(np.float64))
        bucket = (b[:, None] > cuts_arr[None, :]).sum(axis=1).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"), "bucket": pa.array(bucket, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def q_events_clip(sf_dir: str):
    """Winsorization — clip the value column at the corpus's approximate
    p05/p95 (outlier clamping before feature scaling, the standard
    robust-preprocessing op).  The cut VALUES come from the same
    mergeable fixed-bin histogram sketch `events_bucketize` uses (two
    tiny passes), converted to bin left-edges with the one shared
    ``lo + bin*width`` expression on both sides; the clip itself is a
    stateless third pass, emitted as 4-dp scaled ints so the one
    float multiply-add is ulp-safe under the hash compare."""
    from ray.data.aggregate import Count, Max, Min

    N_BINS = 1024
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "value"])
    stats = ds.aggregate(Min("value", alias_name="lo"), Max("value", alias_name="hi"), Count(alias_name="n"))
    lo, hi, n = float(stats["lo"] or 0.0), float(stats["hi"] or 0.0), int(stats["n"])
    width = (hi - lo) / float(N_BINS)

    def emit(t: pa.Table, clipped: np.ndarray) -> pa.Table:
        m = clipped * 10_000.0
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "clipped_4dp": pa.array((np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64), pa.int64()),
            }
        )

    if n == 0 or width == 0.0:
        # constant/empty column: nothing to clip (guarded here, as in bucketize)
        return ds.map_batches(
            lambda t: emit(t, t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)),
            batch_format="pyarrow",
        )

    def bins_of(v: np.ndarray) -> np.ndarray:
        return np.minimum(np.floor((v - lo) / width), N_BINS - 1).astype(np.int64)

    def bin_counts(t: pa.Table) -> pa.Table:
        b = bins_of(t.column("value").to_numpy(zero_copy_only=False).astype(np.float64))
        bins, counts = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(bins, pa.int64()), "c": pa.array(counts, pa.int64())})

    hdf = (
        ds.map_batches(bin_counts, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("bin")
    )  # <= 1024 rows: driver-safe by construction
    cum = hdf["c"].cumsum().to_numpy()
    bins_sorted = hdf["bin"].to_numpy()
    cut_edges = []
    for pct in (5, 95):
        rank = (pct * n + 99) // 100  # ceil in pure ints (bucketize idiom)
        idx = int(np.searchsorted(cum, rank, side="left"))
        cut_bin = float(bins_sorted[min(idx, len(bins_sorted) - 1)])
        cut_edges.append(lo + cut_bin * width)  # the ONE shared float expression
    lo_cut, hi_cut = cut_edges

    def clip(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        return emit(t, np.minimum(np.maximum(v, lo_cut), hi_cut))

    return ds.map_batches(clip, batch_format="pyarrow")


SQL_EVENTS_CLIP = """
WITH stats AS (SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM events),
hist AS (
  SELECT LEAST(CAST(floor((e.value - s.lo) / ((s.hi - s.lo) / 1024.0)) AS BIGINT), 1023) AS bin,
         count(*) AS c
  FROM events e, stats s GROUP BY 1),
cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM hist),
cuts AS (
  SELECT s.lo + (SELECT min(bin) FROM cum, stats s2 WHERE cum >= (5 * s2.n + 99) // 100) * ((s.hi - s.lo) / 1024.0) AS lo_cut,
         s.lo + (SELECT min(bin) FROM cum, stats s2 WHERE cum >= (95 * s2.n + 99) // 100) * ((s.hi - s.lo) / 1024.0) AS hi_cut
  FROM stats s)
SELECT e.event_id,
       CAST(round(LEAST(GREATEST(e.value, c.lo_cut), c.hi_cut) * 10000) AS BIGINT) AS clipped_4dp
FROM events e, cuts c
"""


def q_events_dedup_latest(sf_dir: str):
    """Latest-state compaction (CDC upsert semantics): per (user, type)
    keep the most recent event — the changelog→snapshot materialization
    (the reference's cached-rerun store implies the same latest-fetch-
    wins-per-URL rule, README.md:71-72).  Shape:
    :func:`~goto_eater_crawler_ray.functions.window.latest_per_key` —
    per-batch pre-prune, one coarse hash shuffle, segment-vectorized
    final pick."""
    from ..functions.window import latest_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts", "value"])
    out = latest_per_key(ds, key_cols=["user_id", "event_type"], order_cols=["ts", "event_id"], part_col="user_id")

    def emit(t: pa.Table) -> pa.Table:
        m = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "event_id": t.column("event_id").cast(pa.int64()),
                "last_ts": t.column("ts"),
                "value_c": pa.array((np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64), pa.int64()),
            }
        )

    return out.map_batches(emit, batch_format="pyarrow")


SQL_EVENTS_DEDUP_LATEST = """
SELECT user_id, event_type, event_id, ts AS last_ts,
       CAST(round(value * 100) AS BIGINT) AS value_c
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
"""


def q_events_corr(sf_dir: str):
    """Per-group Pearson CORRELATION (value vs hour-of-day) from exact
    integer sufficient statistics — the two-variable moment family
    (cov/corr) next to `events_zscore`'s one-variable moments.

    Exactness: value is scaled to int64 centi-units BEFORE the shuffle,
    hour-of-day is already integral, so the five sufficient sums
    (sx, sy, sxx, syy, sxy) are order-independent exact integers at any
    width; the final corr is ONE float expression over those integers,
    written token-identically in the SQL twin (DuckDB sums ints as
    HUGEINT — the driver-side finish uses Python arbitrary-precision
    ints for the numerator/denominator products so both sides convert
    the SAME exact integer to double).  One combiner-backed groupby is
    the only exchange; the finish runs over ≤|types| rows."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        m = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        x = _half_away(m)
        y = pc.hour(t.column("ts")).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "xx": pa.array(x * x, pa.int64()),
                "yy": pa.array(y * y, pa.int64()),
                "xy": pa.array(x * y, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"),
            Sum("xx", alias_name="sxx"),
            Sum("yy", alias_name="syy"),
            Sum("xy", alias_name="sxy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        types, corrs = [], []
        for r in t.to_pylist():  # <= |event types| rows
            n, sx, sy, sxx, syy, sxy = (int(r[k]) for k in ("n", "sx", "sy", "sxx", "syy", "sxy"))
            den_x, den_y = n * sxx - sx * sx, n * syy - sy * sy
            if n < 2 or den_x <= 0 or den_y <= 0:
                continue  # degenerate: correlation undefined (SQL twin drops too)
            corr = float(n * sxy - sx * sy) / np.sqrt(float(den_x * den_y))
            types.append(r["event_type"])
            corrs.append(int(_half_away(np.array([corr * 1_000_000.0]))[0]))
        return pa.table({"event_type": pa.array(types, pa.string()), "corr_6dp": pa.array(corrs, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_CORR = """
WITH m AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS x,
         CAST(extract(hour FROM ts) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
  FROM m GROUP BY event_type
)
SELECT event_type,
       CAST(round( (n*sxy - sx*sy) / sqrt( CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE) )
                   * 1000000 ) AS BIGINT) AS corr_6dp
FROM s
WHERE n >= 2 AND (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
"""


def q_events_regression(sf_dir: str):
    """Per-group ordinary-least-squares fit (value regressed on
    hour-of-day): slope + intercept per event_type, the trend-line
    companion to ``events_corr``'s correlation.

    Same exactness contract: x = hour (already integral), y = value in
    int64 centi-units (half-away scaled BEFORE the shuffle), so the five
    sufficient sums are order-independent exact integers at any width.
    slope = (n·sxy − sx·sy)/(n·sxx − sx²) and
    intercept = (sy·den − num·sx)/(n·den) are each ONE double division
    of exact (arbitrary-precision) integers — written token-identically
    in the SQL twin, where the HUGEINT→DOUBLE cast performs the same
    round-to-nearest conversion as Python's ``float(int)``.  One
    combiner-backed groupby is the only exchange; the finish runs over
    ≤|types| rows on the driver side of the plan."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        x = pc.hour(t.column("ts")).to_numpy(zero_copy_only=False).astype(np.int64)
        m = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        y = _half_away(m)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "xx": pa.array(x * x, pa.int64()),
                "xy": pa.array(x * y, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"),
            Sum("xx", alias_name="sxx"),
            Sum("xy", alias_name="sxy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        types, slopes, intercepts = [], [], []
        for r in t.to_pylist():  # <= |event types| rows
            n, sx, sy, sxx, sxy = (int(r[k]) for k in ("n", "sx", "sy", "sxx", "sxy"))
            den = n * sxx - sx * sx
            if n < 2 or den <= 0:
                continue  # degenerate: single point or constant x (SQL twin drops too)
            num = n * sxy - sx * sy
            slope = float(num) / float(den)
            intercept = float(sy * den - num * sx) / float(n * den)
            types.append(r["event_type"])
            slopes.append(int(_half_away(np.array([slope * 1_000_000.0]))[0]))
            intercepts.append(int(_half_away(np.array([intercept * 10_000.0]))[0]))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "slope_6dp": pa.array(slopes, pa.int64()),
                "intercept_4dp": pa.array(intercepts, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_REGRESSION = """
WITH m AS (
  SELECT event_type,
         CAST(extract(hour FROM ts) AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
  FROM m GROUP BY event_type
)
SELECT event_type,
       CAST(round( CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
                   * 1000000 ) AS BIGINT) AS slope_6dp,
       CAST(round( CAST(sy*(n*sxx - sx*sx) - (n*sxy - sx*sy)*sx AS DOUBLE)
                   / CAST(n*(n*sxx - sx*sx) AS DOUBLE)
                   * 10000 ) AS BIGINT) AS intercept_4dp
FROM s
WHERE n >= 2 AND (n*sxx - sx*sx) > 0
"""


def q_orders_shipping_priority(sf_dir: str):
    """TPC-H-Q3-flavored shipping-priority report: unshipped revenue per
    order for one market segment, top 10 by revenue.  Three pruned
    scans; lineitem collapses to per-ORDER revenue (exact int64
    centi-units) BEFORE any join so the two hash exchanges carry totals
    and order headers, never the fact stream; the segment filter prunes
    customer to keys-only before its join.  The corpus-scaled joined
    result never reaches the driver: each output block pre-prunes to its
    LOCAL top 10 (same tuple order as the final sort) so the global
    ``sort().limit(10)`` ranges over <=10 x n_parts rows."""
    CUTOFF = np.datetime64("1998-06-01", "us")
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)

    rev = (
        rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(
            lambda t: (
                lambda f: pa.table(
                    {
                        "l_orderkey": f.column("l_orderkey").cast(pa.int64()),
                        "rev_c": pa.array(
                            _half_away(
                                f.column("l_extendedprice").to_numpy(zero_copy_only=False)
                                * (1.0 - f.column("l_discount").to_numpy(zero_copy_only=False))
                                * 100.0
                            ),
                            pa.int64(),
                        ),
                    }
                )
            )(t.filter(pc.greater(t["l_shipdate"], pa.scalar(CUTOFF)))),
            batch_format="pyarrow",
        )
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c", alias_name="revenue_c"))
        .repartition(n_parts)  # scrub empty-partition blocks before the join
    )
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    ords = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
        .map_batches(
            lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(CUTOFF))),
            batch_format="pyarrow",
        )
        .join(cust, join_type="inner", num_partitions=n_parts, on=("o_custkey",), right_on=("c_custkey",))
    )
    joined = rev.join(ords, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",))

    def local_top(t: pa.Table) -> pa.Table:
        # per-block prune to the same (rev desc, date asc, key asc) order
        # the global sort uses -- keeps <=10 rows per block
        df = t.select(["l_orderkey", "revenue_c", "o_orderdate", "o_orderpriority"]).to_pandas()
        df = df.sort_values(
            ["revenue_c", "o_orderdate", "l_orderkey"], ascending=[False, True, True], kind="mergesort"
        ).head(10)
        df = df.rename(columns={"l_orderkey": "o_orderkey"})
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        joined.map_batches(local_top, batch_format="pyarrow")
        .sort(["revenue_c", "o_orderdate", "o_orderkey"], descending=[True, False, False])
        .limit(10)
    )


SQL_ORDERS_SHIPPING_PRIORITY = """
WITH rev AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS revenue_c
  FROM lineitem
  WHERE l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY 1
)
SELECT o_orderkey, CAST(revenue_c AS BIGINT) AS revenue_c, o_orderdate, o_orderpriority
FROM rev
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate < TIMESTAMP '1998-06-01' AND c_mktsegment = 'BUILDING'
ORDER BY revenue_c DESC, o_orderdate, o_orderkey
LIMIT 10
"""


def q_promo_revenue_share(sf_dir: str):
    """TPC-H-Q14-flavored promotion effect: per ship-month share of
    revenue from PROMO-type parts over a one-year window.  Lineitem
    pre-aggregates to exact int64 centi-revenue per (partkey, month)
    BEFORE the join (the combiner-backed groupby is the only fact-sized
    exchange), then one hash join against the part dim projected to a
    (p_partkey, is_promo) flag pair — part is corpus-scaled in TPC-H so
    it joins, never broadcasts.  Month totals are exact integer sums;
    the share is ONE double division written token-identically in the
    SQL twin."""
    LO, HI = np.datetime64("1997-01-01", "us"), np.datetime64("1998-01-01", "us")
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(LO)), pc.less(t["l_shipdate"], pa.scalar(HI)))
        )
        ym = (
            pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64) * 100
            + pc.month(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "l_partkey": t.column("l_partkey").cast(pa.int64()),
                "ship_month": pa.array(ym, pa.int64()),
                "rev_c": pa.array(
                    _half_away(
                        t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                        * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
                        * 100.0
                    ),
                    pa.int64(),
                ),
            }
        )

    lr = (
        rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(rev, batch_format="pyarrow")
        .groupby(["l_partkey", "ship_month"])
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .repartition(n_parts)  # scrub empty-partition blocks before the join
    )
    flags = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t.column("p_partkey").cast(pa.int64()),
                "is_promo": pc.equal(t["p_type"], "PROMO").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = lr.join(flags, join_type="inner", num_partitions=n_parts, on=("l_partkey",), right_on=("p_partkey",))

    def split(t: pa.Table) -> pa.Table:
        r = t.column("rev_c").to_numpy(zero_copy_only=False).astype(np.int64)
        f = t.column("is_promo").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ship_month": t.column("ship_month").cast(pa.int64()),
                "promo_rev_c": pa.array(r * f, pa.int64()),
                "total_rev_c": pa.array(r, pa.int64()),
            }
        )

    monthly = (
        joined.map_batches(split, batch_format="pyarrow")
        .groupby("ship_month")
        .aggregate(Sum("promo_rev_c", alias_name="promo_rev_c"), Sum("total_rev_c", alias_name="total_rev_c"))
    )

    def finish(t: pa.Table) -> pa.Table:
        p = t.column("promo_rev_c").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = t.column("total_rev_c").to_numpy(zero_copy_only=False).astype(np.float64)
        share = _half_away(p / tot * 1_000_000.0)
        return pa.table(
            {
                "ship_month": t.column("ship_month").cast(pa.int64()),
                "promo_rev_c": t.column("promo_rev_c").cast(pa.int64()),
                "total_rev_c": t.column("total_rev_c").cast(pa.int64()),
                "promo_share_6dp": pa.array(share, pa.int64()),
            }
        )

    return monthly.map_batches(finish, batch_format="pyarrow")


SQL_PROMO_REVENUE_SHARE = """
WITH lr AS (
  SELECT CAST(extract(year FROM l_shipdate)*100 + extract(month FROM l_shipdate) AS BIGINT) AS ship_month,
         l_partkey,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
), m AS (
  SELECT ship_month,
         sum(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS promo_rev_c,
         sum(rev_c) AS total_rev_c
  FROM lr JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT ship_month,
       CAST(promo_rev_c AS BIGINT) AS promo_rev_c,
       CAST(total_rev_c AS BIGINT) AS total_rev_c,
       CAST(round(CAST(promo_rev_c AS DOUBLE) / CAST(total_rev_c AS DOUBLE) * 1000000) AS BIGINT) AS promo_share_6dp
FROM m
"""


def q_user_retention(sf_dir: str):
    """Weekly cohort retention matrix — the product-analytics staple:
    for each signup cohort (a user's first active ISO week) and each
    week offset k, how many of that cohort's users were active k weeks
    later.  Ray-Data-first in three exact-integer steps: (1) distinct
    (user, week) pairs via groupby-Count over epoch-week ints (one
    combiner-backed shuffle of the fact stream, already deduped
    batch-locally); (2) per-user first week via groupby-Min over those
    pairs (user-sized, not fact-sized); (3) one hash join of the two
    user-keyed tables, then a tiny (cohort, offset) count.  Nothing
    corpus-sized reaches the driver; every exchange after step 1 is
    user-cardinality or smaller.  Weeks are ``floor(epoch_days / 7)``
    ints (not ISO calendars) so both engines compute the identical
    bucket."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "events")).metadata.num_rows, cap=64)

    def to_weeks(t: pa.Table) -> pa.Table:
        days = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us"))
        epoch_days = pc.divide(pc.cast(days, pa.int64()), 86_400_000_000)
        wk = pc.divide(epoch_days, 7)
        return pa.table({"user_id": t.column("user_id").cast(pa.int64()), "week": wk.cast(pa.int64())})

    pairs = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "user_id"])
        .map_batches(to_weeks, batch_format="pyarrow")
        .map_batches(  # batch-local dedup before the shuffle
            lambda t: t.group_by(["user_id", "week"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["user_id", "week"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["user_id", "week"]), batch_format="pyarrow")
        .repartition(n_parts)  # scrub empty-partition blocks before the join
    )
    first = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "user_id"])
        .map_batches(to_weeks, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("week", alias_name="cohort_week"))
        .repartition(n_parts)
        .map_batches(
            lambda t: pa.table(
                {"fu_user_id": t.column("user_id").cast(pa.int64()), "cohort_week": t.column("cohort_week").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    joined = pairs.join(first, join_type="inner", num_partitions=n_parts, on=("user_id",), right_on=("fu_user_id",))

    def offsets(t: pa.Table) -> pa.Table:
        w = t.column("week").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("cohort_week").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cohort_week": pa.array(c, pa.int64()), "week_offset": pa.array(w - c, pa.int64())})

    return (
        joined.map_batches(offsets, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


SQL_USER_RETENTION = """
WITH w AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) / 86400 / 7) AS BIGINT) AS week
  FROM events
), f AS (
  SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1
)
SELECT f.cohort_week, w.week - f.cohort_week AS week_offset, count(*) AS n_users
FROM w JOIN f ON w.user_id = f.user_id
GROUP BY 1, 2
"""


def q_events_transitions(sf_dir: str):
    """Markov transition-count matrix over per-user event sequences:
    for every consecutive (A -> B) pair in a user's timeline, how often
    it occurs corpus-wide — the sequence-mining shape behind session
    modelling and next-event prediction.

    Same scale pattern as ``lag_delta_per_key`` (functions/window.py):
    ONE coarse hash shuffle (user_id % n_key_parts -> ~n_key_parts
    groups, never per-user groups), then inside each part a single
    lexsort over (user, ts, event_id) and a fully vectorized adjacency
    pass — event types dictionary-encoded so pair counting is one
    ``np.unique`` over int64 pair codes, no Python per row.  Each part
    emits its LOCAL (from, to, n) counts (<= |types|^2 rows), so the
    final groupby-Sum exchanges a few hundred rows.  Deterministic
    total order: ties on ts break by unique event_id, mirrored in the
    twin's ``ORDER BY ts, event_id``."""
    N_KEY_PARTS = 64
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])

    def part_key(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("_key_part", pa.array((u % N_KEY_PARTS).astype(np.int32), pa.int32()))

    out_schema = pa.schema(
        [pa.field("from_type", pa.string()), pa.field("to_type", pa.string()), pa.field("n", pa.int64())]
    )

    def transitions(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return out_schema.empty_table()
        users = part.column("user_id").to_numpy(zero_copy_only=False)
        ts = part.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = part.column("event_id").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(part.column("event_type").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        sort_idx = np.lexsort((eid, ts, users))
        users, codes = users[sort_idx], codes[sort_idx]
        same = users[1:] == users[:-1]
        k = len(vocab)
        pair = codes[:-1][same] * k + codes[1:][same]
        if pair.size == 0:
            return out_schema.empty_table()
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.Table.from_arrays(
            [
                pc.take(vocab, pa.array(uniq // k, pa.int64())).cast(pa.string()),
                pc.take(vocab, pa.array(uniq % k, pa.int64())).cast(pa.string()),
                pa.array(cnt.astype(np.int64), pa.int64()),
            ],
            schema=out_schema,
        )

    return (
        ds.map_batches(part_key, batch_format="pyarrow")
        .groupby("_key_part")
        .map_groups(transitions, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_EVENTS_TRANSITIONS = """
WITH s AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, count(*) AS n
FROM s WHERE to_type IS NOT NULL
GROUP BY 1, 2
"""


def q_events_entropy(sf_dir: str):
    """Per-type Shannon entropy (nats) of the hour-of-day distribution —
    the diversity / uniformity signal used to flag bot-like traffic
    (entropy ~ ln 24 = uniform) vs bursty types (entropy -> 0).

    Distributed part is EXACT: one combiner-backed groupby to
    (event_type, hour) integer counts, <= |types| x 24 rows.  The float
    finish H = ln(N) - (SUM c*ln c)/N is inherently a multi-term float
    sum, and float addition is not associative — so BOTH engines sum the
    per-hour terms in the SAME explicit hour order: here a plain
    left-to-right accumulation over hour-sorted rows; in the twin a
    ``list_aggregate(list(... ORDER BY hour), 'sum')`` whose list order
    pins the accumulation order.  With identical order and libm the
    doubles match bit-for-bit; the result rounds to 6dp micro-nats."""
    import math

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])

    def to_hours(t: pa.Table) -> pa.Table:
        h = pc.hour(t["ts"]).cast(pa.int64())
        return pa.table({"event_type": t.column("event_type"), "hour": h})

    counts = (
        ds.map_batches(to_hours, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="c"))
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["event_type", "hour"], kind="mergesort")
        types, ns, ents = [], [], []
        for et, g in df.groupby("event_type", sort=True):
            n = int(g["c"].sum())
            s = 0.0
            for c in g["c"]:  # hour-ascending: accumulation order pinned
                s += float(int(c)) * math.log(float(int(c)))
            h = math.log(float(n)) - s / float(n)
            types.append(et)
            ns.append(n)
            ents.append(int(_half_away(np.array([h * 1_000_000.0]))[0]))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n_events": pa.array(ns, pa.int64()),
                "entropy_6dp": pa.array(ents, pa.int64()),
            }
        )

    # the counts table is <= |types| x 24 rows: collapse to one block so the
    # ordered accumulation sees every hour of a type together
    return counts.repartition(1).map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ENTROPY = """
WITH c AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour, count(*) AS c
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_events,
         list_aggregate(list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY hour), 'sum') AS plogp
  FROM c GROUP BY 1
)
SELECT event_type, n_events,
       CAST(round((ln(CAST(n_events AS DOUBLE)) - plogp / CAST(n_events AS DOUBLE)) * 1000000) AS BIGINT) AS entropy_6dp
FROM s
"""


def q_sliding_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per trailing 3-hour window, one row per
    hour present in the data — the sliding-window distinct op (DAU/HAU
    style), which no running-sum trick can express because distinct
    doesn't decompose over overlapping windows.  Exact-and-distributed
    via window EXPANSION: the fact stream first collapses to distinct
    (hour, user) pairs (batch-local dedup, then one combiner groupby);
    each pair is then replicated to the <=3 windows it can serve
    (output-of-stage ~ 3x the PAIR count, corpus-independent), deduped
    per (window, user) — a user active in several source hours of one
    window counts once — and counted.  Window hours not present in the
    data are dropped via a broadcast membership filter on the tiny
    distinct-hour set."""
    import ray

    def to_pairs(t: pa.Table) -> pa.Table:
        h = pc.divide(
            pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("us")), pa.int64()),
            3_600_000_000,
        ).cast(pa.int64())
        out = pa.table({"h": h, "user_id": t.column("user_id").cast(pa.int64())})
        return out.group_by(["h", "user_id"]).aggregate([])  # batch-local dedup

    pairs = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "user_id"])
        .map_batches(to_pairs, batch_format="pyarrow")
        .groupby(["h", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["h", "user_id"]), batch_format="pyarrow")
        .materialize()  # pair-sized, read twice (hour domain + expansion)
    )
    hours = sorted({r["h"] for r in pairs.groupby("h").aggregate(Count(alias_name="_n")).select_columns(["h"]).take_all()})
    hours_ref = ray.put(pa.array(hours, pa.int64()))

    def expand(t: pa.Table) -> pa.Table:
        present = ray.get(hours_ref)
        h = t.column("h").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        tgt = np.concatenate([h, h + 1, h + 2])
        uu = np.concatenate([u, u, u])
        keep = pc.is_in(pa.array(tgt, pa.int64()), value_set=present).to_numpy(zero_copy_only=False)
        return pa.table({"hour_epoch": pa.array(tgt[keep], pa.int64()), "user_id": pa.array(uu[keep], pa.int64())})

    return (
        pairs.map_batches(expand, batch_format="pyarrow")
        .groupby(["hour_epoch", "user_id"])
        .aggregate(Count(alias_name="_n"))  # dedup (window, user)
        .groupby("hour_epoch")
        .aggregate(Count(alias_name="n_users"))
    )


SQL_SLIDING_DISTINCT_USERS = """
WITH d AS (
  SELECT DISTINCT CAST(floor(epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
         user_id
  FROM events
), hrs AS (
  SELECT DISTINCT h FROM d
)
SELECT hrs.h AS hour_epoch, count(DISTINCT d.user_id) AS n_users
FROM hrs JOIN d ON d.h BETWEEN hrs.h - 2 AND hrs.h
GROUP BY 1
"""


def q_cooccur_topk(sf_dir: str):
    """Top-20 within-doc co-occurring token PAIRS among the global
    top-50-df tokens — the market-basket / collocation-mining op (vs
    top_bigrams' ADJACENT pairs, this counts set co-presence).  The
    df-cap is the scale contract: candidate pairs are bounded at
    50*49/2 regardless of corpus size, so the pair space never explodes
    on stopwords.  Shape: one postings scan -> tiny df groupby ->
    broadcast top-50 list -> second scan counts each batch's pairs
    LOCALLY into the <=1225-cell space (segment-triu over per-doc sorted
    local ids, one bincount) -> one tiny pair groupby -> sort/limit."""
    import ray

    def postings(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        out_i, out_t = [], []
        for i, txt in zip(ids, t.column("text").to_pylist()):
            for tok in set(txt.split(" ")):
                out_i.append(i)
                out_t.append(tok)
        return pa.table({"doc_id": pa.array(out_i, pa.int64()), "tok": pa.array(out_t, pa.string())})

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    df = docs.map_batches(postings, batch_format="pyarrow").groupby("tok").aggregate(Count(alias_name="df"))
    top = df.sort(["df", "tok"], descending=[True, False]).limit(50).to_pandas()  # <=50 rows
    top_arr = pa.array(sorted(top["tok"]), pa.string())  # lexicographic local ids
    top_ref = ray.put(top_arr)
    K = len(top_arr)

    def pair_counts(t: pa.Table) -> pa.Table:
        vocab = ray.get(top_ref)
        counts = np.zeros(K * K, np.int64)
        # flatten all docs' distinct tokens, ONE index_in for the batch,
        # then segment-triu per doc (no per-doc arrow calls)
        flat, docof = [], []
        for d, txt in enumerate(t.column("text").to_pylist()):
            s = set(txt.split(" "))
            flat.extend(s)
            docof.extend([d] * len(s))
        if flat:
            idx = pc.fill_null(pc.index_in(pa.array(flat, pa.string()), value_set=vocab), -1)
            ids = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            docof = np.asarray(docof, np.int64)
            keep = ids >= 0
            ids, docof = ids[keep], docof[keep]
            o = np.lexsort((ids, docof))
            ids, docof = ids[o], docof[o]
            starts = np.flatnonzero(np.concatenate(([True], docof[1:] != docof[:-1])))
            ends = np.append(starts[1:], ids.size)
            for s0, e0 in zip(starts, ends):
                if e0 - s0 >= 2:
                    li, lj = np.triu_indices(e0 - s0, 1)
                    np.add.at(counts, ids[s0 + li] * K + ids[s0 + lj], 1)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "ai": pa.array(nz // K, pa.int64()),
                "bi": pa.array(nz % K, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    agg = docs.map_batches(pair_counts, batch_format="pyarrow").groupby(["ai", "bi"]).aggregate(Sum("n", alias_name="n_docs"))

    def to_names(t: pa.Table) -> pa.Table:
        vocab = ray.get(top_ref)
        return pa.table(
            {
                "tok_a": pc.take(vocab, t.column("ai")),
                "tok_b": pc.take(vocab, t.column("bi")),
                "n_docs": t.column("n_docs"),
            }
        )

    return agg.map_batches(to_names, batch_format="pyarrow").sort(["n_docs", "tok_a", "tok_b"], descending=[True, False, False]).limit(20)


SQL_COOCCUR_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents
), df AS (
  SELECT tok, count(*) AS df FROM toks GROUP BY 1
), top AS (
  SELECT tok FROM df ORDER BY df DESC, tok LIMIT 50
), ft AS (
  SELECT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM top)
)
SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
GROUP BY 1, 2
ORDER BY n_docs DESC, tok_a, tok_b
LIMIT 20
"""


def q_user_paths(sf_dir: str):
    """Top-100 most common per-user event-type PATH signatures (full
    ordered journey, '>'-joined) — the funnel-discovery / sequence-mining
    op.  One coarse hash shuffle co-locates each user's history; inside,
    path strings are built for ALL users of the partition at once with
    arrow kernels (lexsort -> per-segment ListArray -> one
    ``pc.binary_join`` call — no per-user Python), then a signature
    groupby counts users per path.  Path length is input-proportional
    (a user's own history), never corpus-proportional."""
    N_PARTS = 64
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type"])

    part_key = coarse_part_key("user_id", "_key_part", N_PARTS)

    def paths(part: pa.Table) -> pa.Table:
        schema = pa.schema([("path", pa.string()), ("n", pa.int64())])
        n = part.num_rows
        if n == 0:
            return schema.empty_table()
        u = part.column("user_id").to_numpy(zero_copy_only=False)
        ts = part.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = part.column("event_id").to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts, u))
        et = pc.take(part.column("event_type").combine_chunks(), pa.array(o, pa.int64()))
        starts = np.flatnonzero(np.concatenate(([True], u[o][1:] != u[o][:-1])))
        offs = np.append(starts, n).astype(np.int32)
        joined = pc.binary_join(pa.ListArray.from_arrays(pa.array(offs, pa.int32()), et), ">")
        tbl = pa.table({"path": joined}).group_by(["path"]).aggregate([("path", "count")])
        return pa.table({"path": tbl.column("path"), "n": tbl.column("path_count").cast(pa.int64())})

    return (
        ds.map_batches(part_key, batch_format="pyarrow")
        .groupby("_key_part")
        .map_groups(paths, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n_users"))
        .sort(["n_users", "path"], descending=[True, False])
        .limit(100)
    )


SQL_USER_PATHS = """
WITH p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY 1
)
SELECT path, count(*) AS n_users
FROM p GROUP BY 1
ORDER BY n_users DESC, path
LIMIT 100
"""


def q_supplier_variety(sf_dir: str):
    """COUNT(DISTINCT supplier) per (brand, size) — the TPC-H Q16 shape:
    a fact->dim join feeding a grouped distinct-count.  Distinct-count
    does not partial-aggregate, so the shape is: batch-local dedup of
    (part, supplier) pairs at the scan (the join input carries pairs,
    not line items), hash join to the part dim, then ONE
    (brand, size)-keyed exchange whose reducer dedupes suppliers —
    several parts of one brand/size can share a supplier — and counts
    in-partition.  Two exchanges total; a global pair-distinct groupby
    before the join would only remove cross-batch dupes at the cost of
    a third all-to-all."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    pairs = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"]).map_batches(
        lambda t: pa.table(
            {"l_partkey": t.column("l_partkey").cast(pa.int64()), "l_suppkey": t.column("l_suppkey").cast(pa.int64())}
        )
        .group_by(["l_partkey", "l_suppkey"])
        .aggregate([]),
        batch_format="pyarrow",
    )
    part_dim = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"])
    joined = pairs.join(part_dim, join_type="inner", num_partitions=n_parts, on=("l_partkey",), right_on=("p_partkey",))

    def count_suppliers(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": [df["p_brand"].iloc[0]],
                "p_size": [df["p_size"].iloc[0]],
                "supplier_cnt": np.array([df["l_suppkey"].nunique()], np.int64),
            }
        )

    return joined.groupby(["p_brand", "p_size"]).map_groups(count_suppliers, batch_format="pandas")


SQL_SUPPLIER_VARIETY = """
SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1, 2
"""


def q_events_mutual_info(sf_dir: str):
    """Mutual information I(event_type; hour-of-day) in nats — the
    dependence / drift signal between a categorical column and a time
    bucket (complement of q_events_entropy's per-type view).  The
    distributed part is ONE exact integer contingency aggregate
    (<= |types| x 24 cells); marginals and N derive from those cells.
    The float finish sums per-cell terms (c/N)*ln(c*N/(ct*ch)) in
    PINNED (type, hour) order on both engines (here: left-to-right over
    the sorted cells; twin: list_aggregate over an ORDER BY list), so
    the doubles agree bit-for-bit and round stably to micro-nats."""
    import math

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])

    def to_cells(t: pa.Table) -> pa.Table:
        return pa.table({"t": t.column("event_type"), "h": pc.hour(t["ts"]).cast(pa.int64())})

    cells = ds.map_batches(to_cells, batch_format="pyarrow").groupby(["t", "h"]).aggregate(Count(alias_name="c"))

    def finish(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas().sort_values(["t", "h"], kind="mergesort")
        ct = df.groupby("t")["c"].sum().to_dict()
        ch = df.groupby("h")["c"].sum().to_dict()
        n = int(df["c"].sum())
        s = 0.0
        for t_, h_, c_ in zip(df["t"], df["h"], df["c"]):
            c_ = int(c_)
            s += (c_ / float(n)) * math.log(c_ * float(n) / float(int(ct[t_]) * int(ch[h_])))
        return pa.table(
            {
                "mi_6dp": pa.array([int(_half_away(np.array([s * 1_000_000.0]))[0])], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
            }
        )

    # the cell table is tiny: one block so the pinned-order accumulation
    # sees every cell
    return cells.repartition(1).map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_MUTUAL_INFO = """
WITH c AS (
  SELECT event_type AS t, CAST(extract(hour FROM ts) AS BIGINT) AS h, count(*) AS c
  FROM events GROUP BY 1, 2
), m AS (
  SELECT t, CAST(sum(c) AS BIGINT) AS ct FROM c GROUP BY 1
), hh AS (
  SELECT h, CAST(sum(c) AS BIGINT) AS ch FROM c GROUP BY 1
), n AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM c
), terms AS (
  SELECT c.t, c.h,
         (c.c / CAST(n.n AS DOUBLE)) * ln(c.c * CAST(n.n AS DOUBLE) / CAST(m.ct * hh.ch AS DOUBLE)) AS term
  FROM c
  CROSS JOIN n
  JOIN m ON m.t = c.t
  JOIN hh ON hh.h = c.h
)
SELECT CAST(round(list_aggregate(list(term ORDER BY t, h), 'sum') * 1000000) AS BIGINT) AS mi_6dp,
       (SELECT n FROM n) AS n_events
FROM terms
"""


def q_orders_large(sf_dir: str):
    """TPC-H Q18 shape — 'large volume' orders: per-order lineitem
    quantity totals, HAVING > 200, joined back to orders + customer.
    The HAVING-derived key set is corpus-scaled (not broadcastable), so
    the shape is aggregate-first + two hash joins that carry only the
    qualifying totals: lineitem collapses to (orderkey, sum_qty) in one
    combiner groupby, the filter drops ~99% of orders BEFORE any join,
    and customer is joined last against the already-small result.
    Quantities are integral by data contract — summed as exact int64."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    big = (
        rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])
        .map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                    "qty": pa.array(_half_away(t.column("l_quantity").to_numpy(zero_copy_only=False)), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("l_orderkey")
        .aggregate(Sum("qty", alias_name="sum_qty"))
        .map_batches(lambda t: t.filter(pc.greater(t["sum_qty"], 200)), batch_format="pyarrow")
        .repartition(n_parts)  # scrub empty-partition blocks before the join
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "totalprice_c": pa.array(
                    _half_away(t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    j1 = big.join(orders, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",))
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"]).map_batches(
        lambda t: pa.table({"c_custkey": t.column("c_custkey").cast(pa.int64()), "c_name": t.column("c_name")}),
        batch_format="pyarrow",
    )
    j2 = j1.repartition(n_parts).join(cust, join_type="inner", num_partitions=n_parts, on=("o_custkey",), right_on=("c_custkey",))
    return j2.map_batches(
        lambda t: t.select(["c_name", "o_custkey", "l_orderkey", "totalprice_c", "sum_qty"]), batch_format="pyarrow"
    )


SQL_ORDERS_LARGE = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum_qty > 200
)
SELECT c.c_name, o.o_custkey, b.l_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_c,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


def q_parts_above_brand_avg(sf_dir: str):
    """Correlated-subquery shape — parts priced strictly above their own
    brand's average retail price.  The per-brand averages are a
    BOUNDED-DOMAIN aggregate (|brands| rows), broadcast back into a
    second distributed scan as a ``pc.index_in`` lookup — never a join
    shuffle.  The comparison is EXACT integer cross-multiplication:
    ``price_c * n_brand > sum_c`` (both sides int64), so no float
    average ever exists to disagree with the SQL twin at the boundary."""
    import ray

    prices = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_retailprice"]).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t.column("p_partkey").cast(pa.int64()),
                "p_brand": t.column("p_brand"),
                "price_c": pa.array(_half_away(t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    stats = prices.groupby("p_brand").aggregate(Sum("price_c", alias_name="sum_c"), Count(alias_name="n")).to_pandas()
    stats_ref = ray.put(
        pa.table(
            {
                "p_brand": pa.array(stats["p_brand"], pa.string()),
                "sum_c": pa.array(stats["sum_c"].astype(np.int64), pa.int64()),
                "n": pa.array(stats["n"].astype(np.int64), pa.int64()),
            }
        )
    )

    def above(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        idx = pc.index_in(t.column("p_brand").combine_chunks(), value_set=st.column("p_brand").combine_chunks())
        i = idx.to_numpy(zero_copy_only=False).astype(np.int64)  # every brand exists in stats
        s = st.column("sum_c").to_numpy(zero_copy_only=False)[i]
        n = st.column("n").to_numpy(zero_copy_only=False)[i]
        price = t.column("price_c").to_numpy(zero_copy_only=False)
        keep = price * n > s
        return t.filter(pa.array(keep))

    return prices.map_batches(above, batch_format="pyarrow")


SQL_PARTS_ABOVE_BRAND_AVG = """
WITH p AS (
  SELECT p_partkey, p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c FROM part
), s AS (
  SELECT p_brand, CAST(sum(price_c) AS BIGINT) AS sum_c, count(*) AS n FROM p GROUP BY 1
)
SELECT p.p_partkey, p.p_brand, p.price_c
FROM p JOIN s ON s.p_brand = p.p_brand
WHERE p.price_c * s.n > s.sum_c
"""


def q_cumulative_distinct_users(sf_dir: str):
    """Running DISTINCT user count over days — the growth-curve op.
    Naively this is a distinct-over-expanding-window (quadratic); the
    exact linear decomposition is: cumulative distinct at day d ==
    cumulative SUM of first-appearance counts — so the corpus collapses
    to per-user first days (one combiner groupby-Min over batch-deduped
    pairs), then to per-day new-user counts (day-sized), and the running
    total is one vectorized cumsum over the tiny day table.  Days are
    reported for the first-day domain (days contributing new users)."""
    pairs = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "user_id"])
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "day": pc.divide(
                        pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")), pa.int64()),
                        86_400_000_000,
                    ).cast(pa.int64()),
                }
            ).group_by(["user_id", "day"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
    )
    per_day = pairs.groupby("first_day").aggregate(Count(alias_name="n_new"))

    def running(t: pa.Table) -> pa.Table:
        d = t.column("first_day").to_numpy(zero_copy_only=False)
        n = t.column("n_new").to_numpy(zero_copy_only=False)
        o = np.argsort(d)
        return pa.table(
            {
                "day": pa.array(d[o], pa.int64()),
                "cum_users": pa.array(np.cumsum(n[o]).astype(np.int64), pa.int64()),
            }
        )

    # day-cardinality table: one block for the ordered scan
    return per_day.repartition(1).map_batches(running, batch_format="pyarrow")


SQL_CUMULATIVE_DISTINCT_USERS = """
WITH f AS (
  SELECT user_id,
         min(CAST(floor(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) / 86400) AS BIGINT)) AS first_day
  FROM events GROUP BY 1
), d AS (
  SELECT first_day AS day, count(*) AS n_new FROM f GROUP BY 1
)
SELECT day, CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
"""


def q_disjunctive_join_revenue(sf_dir: str):
    """TPC-H Q19 shape — revenue under an OR-of-ANDs predicate spanning
    BOTH join sides: (brand, size-band, quantity-band) alternatives.
    Each side is pre-pruned by the UNION of its own clauses at the scan
    (brand IN (...), quantity BETWEEN overall bounds) — the disjunction
    can't be fully pushed down, but the join input shrinks to the
    clause-relevant slice; the exact clause logic runs vectorized on the
    joined rows.  Revenue is the repo's exact int64 centi-unit sum."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    def li_prune(t: pa.Table) -> pa.Table:
        qty = _half_away(t.column("l_quantity").to_numpy(zero_copy_only=False))
        rev = _half_away(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
            * 100.0
        )
        keep = (qty >= 1) & (qty <= 30)  # union of the clauses' quantity bands
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()).filter(pa.array(keep)),
                "qty": pa.array(qty[keep], pa.int64()),
                "rev_c": pa.array(rev[keep], pa.int64()),
            }
        )

    li = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]).map_batches(
        li_prune, batch_format="pyarrow"
    )
    def pt_prune(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["p_brand"], value_set=pa.array(["Brand#12", "Brand#23"])))
        return pa.table(
            {
                "p_partkey": pc.cast(f["p_partkey"], pa.int64()),
                "p_brand": f["p_brand"],
                "p_size": pc.cast(f["p_size"], pa.int64()),
            }
        )

    pt = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"]).map_batches(pt_prune, batch_format="pyarrow")
    j = li.join(pt, join_type="inner", num_partitions=n_parts, on=("l_partkey",), right_on=("p_partkey",))

    def clause(t: pa.Table) -> pa.Table:
        brand = t.column("p_brand").to_pandas().to_numpy()
        size = t.column("p_size").to_numpy(zero_copy_only=False)
        qty = t.column("qty").to_numpy(zero_copy_only=False)
        c1 = (brand == "Brand#12") & (size <= 10) & (qty >= 1) & (qty <= 20)
        c2 = (brand == "Brand#23") & (size <= 25) & (qty >= 5) & (qty <= 30)
        keep = c1 | c2
        return pa.table({"rev_c": pa.array(t.column("rev_c").to_numpy(zero_copy_only=False)[keep], pa.int64())})

    agg = j.map_batches(clause, batch_format="pyarrow").aggregate(Sum("rev_c", alias_name="revenue_c"), Count(alias_name="n_lines"))
    return pd.DataFrame({"revenue_c": [int(agg["revenue_c"])], "n_lines": [int(agg["n_lines"])]})


SQL_DISJUNCTIVE_JOIN_REVENUE = """
SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size <= 10
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size <= 25
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 5 AND 30)
"""


def q_time_to_convert(sf_dir: str):
    """Histogram of first-view -> first-purchase latency per user (whole
    hours) — the conversion-lag op.  Entirely aggregate-shaped: ONE
    conditional-min groupby collapses the corpus to two timestamps per
    user (non-matching events ride as an int64 sentinel the Min ignores
    by construction), then a tiny bucket count.  No join, no window, no
    per-user Python."""
    BIG = np.int64(2**62)

    def split_mins(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_pandas().to_numpy()
        v = np.where(et == "view", ts, BIG)
        p = np.where(et == "purchase", ts, BIG)
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "v": pa.array(v, pa.int64()),
                "p": pa.array(p, pa.int64()),
            }
        )

    mins = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "user_id", "event_type"])
        .map_batches(split_mins, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("v", alias_name="v"), Min("p", alias_name="p"))
    )

    def buckets(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        keep = (v < BIG) & (p < BIG) & (p >= v)
        hours = (p[keep] - v[keep]) // 3_600_000_000
        return pa.table({"hours_bucket": pa.array(hours, pa.int64())})

    return mins.map_batches(buckets, batch_format="pyarrow").groupby("hours_bucket").aggregate(Count(alias_name="n_users"))


SQL_TIME_TO_CONVERT = """
WITH m AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view') AS v,
         min(ts) FILTER (WHERE event_type = 'purchase') AS p
  FROM events GROUP BY 1
)
SELECT CAST(floor(epoch(p - v) / 3600) AS BIGINT) AS hours_bucket, count(*) AS n_users
FROM m
WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
GROUP BY 1
"""


def q_events_burst(sf_dir: str):
    """Peak traffic burst per event type: the maximum event count in ANY
    trailing 10-minute RANGE window — the rate-limiter / anomaly-alarm
    op.  The corpus collapses to (type, minute) integer counts first
    (one combiner groupby); the RANGE-frame sliding sum then runs
    per type over the sorted minute list with two vectorized
    passes (cumsum + searchsorted of window lower bounds), which
    handles GAPS in the minute domain exactly like SQL's RANGE frame —
    no dense grid is ever materialized."""

    def to_minutes(t: pa.Table) -> pa.Table:
        m = pc.divide(
            pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="minute"), pa.timestamp("us")), pa.int64()),
            60_000_000,
        ).cast(pa.int64())
        return pa.table({"event_type": t.column("event_type"), "minute": m})

    counts = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(to_minutes, batch_format="pyarrow")
        .groupby(["event_type", "minute"])
        .aggregate(Count(alias_name="n"))
    )

    def burst(g: pa.Table) -> pa.Table:
        m = g.column("minute").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        o = np.argsort(m)
        m, n = m[o], n[o]
        cum = np.cumsum(n)
        left = np.searchsorted(m, m - 9, side="left")
        s = cum - np.where(left > 0, cum[left - 1], 0)
        return pa.table(
            {
                "event_type": pa.array([g.column("event_type")[0].as_py()], pa.string()),
                "max_10min": pa.array([int(s.max())], pa.int64()),
            }
        )

    return counts.groupby("event_type").map_groups(burst, batch_format="pyarrow")


SQL_EVENTS_BURST = """
WITH c AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(date_trunc('minute', ts) AS TIMESTAMP)) / 60) AS BIGINT) AS minute,
         count(*) AS n
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY minute
              RANGE BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS s
  FROM c
)
SELECT event_type, max(s) AS max_10min FROM w GROUP BY 1
"""


def q_top_tokens_per_lang(sf_dir: str):
    """Top-3 whitespace tokens per language (count desc, token asc) —
    the grouped-top-k-over-aggregates op.  Token counts pre-aggregate
    batch-locally before the one (lang, token) shuffle; the per-lang
    top-3 runs vectorized over the already vocab-sized count table
    (languages are a bounded domain, so the per-group call count is
    bounded)."""

    def tok_counts(t: pa.Table) -> pa.Table:
        langs, toks, ns = [], [], []
        acc: dict = {}
        for lang, txt in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
            for tok in txt.split(" "):
                k = (lang, tok)
                acc[k] = acc.get(k, 0) + 1
        for (lang, tok), n in acc.items():
            langs.append(lang)
            toks.append(tok)
            ns.append(n)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "tok": pa.array(toks, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    counts = (
        rd.read_parquet(_p(sf_dir, "documents"), columns=["lang", "text"])
        .map_batches(tok_counts, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["n", "tok"], ascending=[False, True], kind="mergesort").head(3)
        df = df.assign(rn=np.arange(1, len(df) + 1, dtype=np.int64))
        return pa.Table.from_pandas(df[["lang", "tok", "n", "rn"]], preserve_index=False)

    return counts.groupby("lang").map_groups(topk, batch_format="pyarrow")


SQL_TOP_TOKENS_PER_LANG = """
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT lang, tok, count(*) AS n FROM t GROUP BY 1, 2
), r AS (
  SELECT lang, tok, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rn
  FROM c
)
SELECT lang, tok, n, rn FROM r WHERE rn <= 3
"""


def q_orders_exists_late_ship(sf_dir: str):
    """TPC-H Q4 shape — EXISTS semi-join: count orders per priority that
    have at least one lineitem shipped AFTER the order date.  The EXISTS
    collapses to an aggregate: EXISTS(l_shipdate > o_orderdate) ==
    max(l_shipdate) > o_orderdate.  ONE corpus-sized exchange (the
    reduce-side union idiom, same as ``late_priority_counts``):
    per-batch max-shipdate partials union with the order stream on
    orderkey % P, each partition compares vectorized and emits
    per-priority count partials; the final groupby moves a handful of
    rows.  Timestamps compare as int64 microseconds."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows)

    def li_partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64),
                "ship_us": t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(),
            }
        )
        g = df.groupby("l_orderkey", as_index=False)["ship_us"].max()
        g["odate_us"] = np.int64(-1)
        g["o_orderpriority"] = ""
        return pa.Table.from_pandas(g, preserve_index=False)

    li = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]).map_batches(
        li_partials, batch_format="pyarrow"
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "ship_us": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                "odate_us": t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )

    part_key = coarse_part_key("l_orderkey", "_op", n_parts)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        om = df[df["odate_us"] >= 0].set_index("l_orderkey")
        mx = df[df["odate_us"] < 0].groupby("l_orderkey")["ship_us"].max()
        mx = mx[mx.index.isin(om.index)]  # inner-join semantics
        om = om.loc[mx.index]
        late = mx.to_numpy() > om["odate_us"].to_numpy()
        g = (
            pd.DataFrame({"o_orderpriority": om["o_orderpriority"].to_numpy()[late]})
            .groupby("o_orderpriority")
            .size()
            .reset_index(name="n_orders")
        )
        g["n_orders"] = g["n_orders"].astype(np.int64)
        return g

    return (
        li.union(orders)
        .map_batches(part_key, batch_format="pyarrow")
        .groupby("_op")
        .map_groups(per_part, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .map_batches(
            lambda t: pa.table(
                {"o_orderpriority": t.column("o_orderpriority"), "n_orders": t.column("n_orders").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )


SQL_ORDERS_EXISTS_LATE_SHIP = """
WITH m AS (
  SELECT l_orderkey, max(l_shipdate) AS mx FROM lineitem GROUP BY 1
)
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o JOIN m ON m.l_orderkey = o.o_orderkey
WHERE m.mx > o.o_orderdate
GROUP BY 1
"""


def q_doc_length_deciles(sf_dir: str):
    """Per-decile corpus length profile: NTILE(10) over (n_chars, doc_id)
    with exact per-tile (count, sum, min, max) of n_chars — the corpus
    sizing report.  The insight that makes this aggregate-only: the
    requested per-tile statistics depend ONLY on the value HISTOGRAM —
    when a tile boundary splits a run of equal values, every straddling
    row contributes the same value — so the corpus collapses to a
    bounded-domain (n_chars, count) table (value-domain-sized, not
    corpus-sized) and the exact SQL NTILE size formula (first n%k tiles
    get n//k+1 rows) is applied to cumulative counts with three
    searchsorted calls.  No row-level tile assignment ever happens."""
    hist = (
        rd.read_parquet(_p(sf_dir, "documents"), columns=["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # value-domain-sized (distinct n_chars), not corpus-sized
        .sort_values("n_chars")
    )
    K = 10
    v = hist["n_chars"].to_numpy(np.int64)
    c = hist["c"].to_numpy(np.int64)
    n = int(c.sum())
    if n == 0:
        return pd.DataFrame({"decile": [], "n_docs": [], "sum_chars": [], "min_chars": [], "max_chars": []}).astype(np.int64)
    q, r = divmod(n, K)
    sizes = np.where(np.arange(1, K + 1) <= r, q + 1, q)
    hi_b = np.cumsum(sizes)  # inclusive upper row_number per tile
    lo_b = hi_b - sizes + 1
    cum = np.cumsum(c)
    pre_sum = np.concatenate(([0], np.cumsum(v * c)))
    pre_cnt = np.concatenate(([0], cum))

    def sum_upto(rank):  # exact sum of n_chars over the first `rank` rows
        i = np.searchsorted(cum, rank)  # value index containing row `rank`
        return pre_sum[i] + (rank - pre_cnt[i]) * v[np.minimum(i, v.size - 1)]

    keep = sizes > 0
    tiles = np.arange(1, K + 1)[keep]
    lo_b, hi_b = lo_b[keep], hi_b[keep]
    return pd.DataFrame(
        {
            "decile": tiles.astype(np.int64),
            "n_docs": (hi_b - lo_b + 1).astype(np.int64),
            "sum_chars": np.array([sum_upto(h) - sum_upto(l - 1) for l, h in zip(lo_b, hi_b)], np.int64),
            "min_chars": v[np.searchsorted(cum, lo_b)].astype(np.int64),
            "max_chars": v[np.searchsorted(cum, hi_b)].astype(np.int64),
        }
    )


SQL_DOC_LENGTH_DECILES = """
WITH r AS (
  SELECT doc_id, n_chars, ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents
)
SELECT decile, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM r GROUP BY 1
"""


def q_events_day_over_day(sf_dir: str):
    """Day-over-day percent change of event volume per type (vs the
    PREVIOUS PRESENT day, LAG semantics) — the trend-report op.  The
    corpus collapses to the tiny (type, day) count table first; the lag
    and the ratio run segment-vectorized per type in one pass over that
    aggregate.  The change is an exact-input float ratio emitted 6dp
    (the single shared expression ``(n - prev) * 1000000.0 / prev``)."""
    counts = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t.column("event_type"),
                    "day": pc.divide(
                        pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")), pa.int64()),
                        86_400_000_000,
                    ).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"))
    )

    def lag_pct(g: pa.Table) -> pa.Table:
        d = g.column("day").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(d)
        d, n = d[o], n[o]
        prev = np.concatenate(([0], n[:-1]))
        chg = _half_away((n[1:] - prev[1:]) * 1_000_000.0 / prev[1:]) if n.size > 1 else np.zeros(0, np.int64)
        et = g.column("event_type")[0].as_py()
        return pa.table(
            {
                "event_type": pa.array([et] * (n.size - 1), pa.string()),
                "day": pa.array(d[1:], pa.int64()),
                "n": pa.array(n[1:], pa.int64()),
                "chg_6dp": pa.array(chg, pa.int64()),
            }
        )

    return counts.groupby("event_type").map_groups(lag_pct, batch_format="pyarrow")


SQL_EVENTS_DAY_OVER_DAY = """
WITH c AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, day, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM c
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       CAST(round((n - prev) * 1000000.0 / prev) AS BIGINT) AS chg_6dp
FROM l WHERE prev IS NOT NULL
"""


def q_events_histogram(sf_dir: str):
    """Equi-WIDTH 20-bin histogram of event value per type over the
    GLOBAL [min, max] range (contrast with events_bucketize's equi-depth
    quantile bins) — the profiling op.  Two streaming passes: a 3-scalar
    Min/Max/Count aggregate, then vectorized bin assignment with the
    single shared float expression ``floor((v - lo) * 20 / (hi - lo))``
    (top edge clamped into the last bin) and a tiny (type, bin) count.
    Empty bins are NOT emitted (both engines agree)."""
    NB = 20
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    stats = ds.aggregate(Min("value", alias_name="lo"), Max("value", alias_name="hi"), Count(alias_name="n"))
    lo, hi, n = float(stats["lo"] or 0.0), float(stats["hi"] or 0.0), int(stats["n"])
    if n == 0 or hi == lo:
        return pd.DataFrame({"event_type": pd.Series(dtype="str"), "bin": pd.Series(dtype="int64"), "n_events": pd.Series(dtype="int64")})

    def assign(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.minimum(np.floor((v - lo) * float(NB) / (hi - lo)), NB - 1).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"), "bin": pa.array(b, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow").groupby(["event_type", "bin"]).aggregate(Count(alias_name="n_events"))


SQL_EVENTS_HISTOGRAM = """
WITH b AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
)
SELECT event_type,
       CAST(least(floor((value - b.lo) * 20.0 / (b.hi - b.lo)), 19) AS BIGINT) AS bin,
       count(*) AS n_events
FROM events, b
GROUP BY 1, 2
"""


def q_users_modal_type(sf_dir: str):
    """Grouped MODE (per-key argmax): each user's most frequent event
    type, ties broken to the lexicographically smallest type — the
    majority-label op (dominant language per domain, modal genre per
    shop) expressed as a distributed argmax, NOT a global sort.

    Shape: ONE combiner-backed groupby((user, type)) count — the only
    corpus-sized exchange — then the tiny per-user candidate rows (≤
    |types| per user) are hash-partitioned on user and the winner picked
    with one mixed-order ``pc.sort_indices`` + first-of-segment mask per
    partition (64 map_groups calls total, no per-user Python)."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])
    counts = (
        ds.groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
        # consolidate: the aggregate emits zero-column empty blocks when
        # groups < input blocks; scrub them before the key-part stage
        .repartition(auto_num_partitions(10_000, rows_per_part=50_000))
    )

    def part_key(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_key_part", pa.array((u % 64).astype(np.int32), pa.int32()))

    def pick(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_key_part"])
        if part.num_rows == 0:
            return part.rename_columns(["user_id", "modal_type", "n"])
        idx = pc.sort_indices(
            part,
            sort_keys=[("user_id", "ascending"), ("n", "descending"), ("event_type", "ascending")],
        )
        t = part.take(idx)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], u[1:] != u[:-1]))
        t = t.filter(pa.array(first))
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "modal_type": t.column("event_type"),
                "n": t.column("n").cast(pa.int64()),
            }
        )

    return counts.map_batches(part_key, batch_format="pyarrow").groupby("_key_part").map_groups(pick, batch_format="pyarrow")


def q_users_intersect(sf_dir: str):
    """Set INTERSECTION (completes the set-op family next to union /
    except-anti-join): users who both viewed AND purchased.  Ray-Data
    shape: ONE pruned scan (not one per side), per-batch membership
    flags combined batch-locally by a vectorized Arrow groupby-max (the
    exchange carries ≤ one row per distinct batch user, never the event
    stream), then a single global groupby(user).Max per flag and a
    filter — no join, no second scan, no distinct-per-side shuffle."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])
    schema = pa.schema([("user_id", pa.int64()), ("v", pa.int64()), ("p", pa.int64())])

    def flags(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.or_(pc.equal(et, "view"), pc.equal(et, "purchase"))
        t = t.filter(keep)
        if t.num_rows == 0:
            return schema.empty_table()
        local = pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "v": pc.cast(pc.equal(t.column("event_type"), "view"), pa.int64()),
                "p": pc.cast(pc.equal(t.column("event_type"), "purchase"), pa.int64()),
            }
        )
        g = pa.TableGroupBy(local, "user_id").aggregate([("v", "max"), ("p", "max")])
        return g.rename_columns(["user_id", "v", "p"])

    agg = ds.map_batches(flags, batch_format="pyarrow").groupby("user_id").aggregate(
        Max("v", alias_name="v"), Max("p", alias_name="p")
    )

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t.column("v"), 1), pc.equal(t.column("p"), 1)))
        return pa.table({"user_id": t.column("user_id").cast(pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_USERS_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


SQL_USERS_MODAL_TYPE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS modal_type, CAST(n AS BIGINT) AS n
FROM c
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) = 1
"""


def q_events_cumsum(sf_dir: str):
    """Per-user running total over time — the cumulative window scan
    (`SUM ... ROWS UNBOUNDED PRECEDING`).  Values scaled to exact int64
    centi-units BEFORE the scan so the running sums are order-exact at
    any corpus size; one coarse hash shuffle + one `np.cumsum` per
    partition (:func:`~goto_eater_crawler_ray.functions.window.cumsum_per_key`)."""
    from ..functions.window import cumsum_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])
    return cumsum_per_key(ds, key_col="user_id", order_cols=["ts", "event_id"], value_col="value")


SQL_EVENTS_CUMSUM = """
SELECT user_id, ts, event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c
FROM events
"""


def q_events_ntile(sf_dir: str):
    """Equal-frequency quartiles of value within each event type —
    ``ntile(4)`` with a deterministic (value, event_id) order, computed
    WITHOUT a global sort via the percent-rank machinery's value-range
    partitions + broadcast base offsets
    (:func:`~goto_eater_crawler_ray.functions.window.ntile_per_key`)."""
    from ..functions.window import ntile_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    return ntile_per_key(ds, key_col="event_type", value_col="value", id_col="event_id", k=4)


SQL_EVENTS_NTILE = """
SELECT event_id, event_type,
       ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS tile
FROM events
"""


def q_users_csv_by_type(sf_dir: str):
    """Collect op (``string_agg`` / array_agg shape): the sorted distinct
    user list per event type as one CSV string — the vocab-collect /
    membership-manifest op.  Distinct pairs are reduced batch-locally
    then via one (type, user) groupby BEFORE the collect, so the final
    per-type group holds only distinct members; event_type is a bounded
    category set (the documented boundedness assumption of any collect)."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    def local_distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )

    def collect(part: pa.Table) -> pa.Table:
        users = np.sort(part.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "event_type": pa.array([part.column("event_type")[0].as_py()], pa.string()),
                "users_csv": pa.array([",".join(map(str, users))], pa.string()),
                "n_users": pa.array([len(users)], pa.int64()),
            }
        )

    return pairs.groupby("event_type").map_groups(collect, batch_format="pyarrow")


SQL_USERS_CSV_BY_TYPE = """
SELECT event_type,
       string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS users_csv,
       count(*) AS n_users
FROM (SELECT DISTINCT event_type, user_id FROM events)
GROUP BY event_type
"""


SQL_EVENTS_BUCKETIZE = """
WITH stats AS (SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM events),
hist AS (
  SELECT LEAST(CAST(floor((e.value - s.lo) / ((s.hi - s.lo) / 1024.0)) AS BIGINT), 1023) AS bin,
         count(*) AS c
  FROM events e, stats s GROUP BY 1),
cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM hist),
cuts AS (
  SELECT (SELECT min(bin) FROM cum, stats s WHERE cum >= (25 * s.n + 99) // 100) AS c25,
         (SELECT min(bin) FROM cum, stats s WHERE cum >= (50 * s.n + 99) // 100) AS c50,
         (SELECT min(bin) FROM cum, stats s WHERE cum >= (75 * s.n + 99) // 100) AS c75)
SELECT e.event_id,
       CAST((CASE WHEN b > c.c25 THEN 1 ELSE 0 END)
          + (CASE WHEN b > c.c50 THEN 1 ELSE 0 END)
          + (CASE WHEN b > c.c75 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
FROM (SELECT event_id,
             LEAST(CAST(floor((value - s.lo) / ((s.hi - s.lo) / 1024.0)) AS BIGINT), 1023) AS b
      FROM events, stats s) e, cuts c
"""


def q_doc_redact(sf_dir: str):
    """Deny-list term redaction — the PII-scrub / contamination-term
    removal shape of corpus curation: every deny-listed word is replaced
    with a ``[REDACTED]`` marker and the per-document replacement count
    is emitted for audit.  Stateless batch-local pass, zero shuffle; the
    regex is compiled once per worker by Arrow's RE2 (same engine DuckDB
    uses, so ``\\b`` word-boundary semantics are identical on both
    sides)."""
    PATTERN = r"\b(customer|supplier)\b"
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"), pattern=PATTERN)
        red = pc.replace_substring_regex(t.column("text"), pattern=PATTERN, replacement="[REDACTED]")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_redacted": pc.cast(n, pa.int64()),
                "redacted_text": red,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_DOC_REDACT = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\b(customer|supplier)\\b')) AS BIGINT) AS n_redacted,
       regexp_replace(text, '\\b(customer|supplier)\\b', '[REDACTED]', 'g') AS redacted_text
FROM documents
"""


def q_events_hopping(sf_dir: str):
    """Hopping (sliding) window counts — 15-minute windows advancing
    every 5 minutes, the standard streaming-analytics window Ray Data
    has no native operator for.  Each event lands in exactly W/S = 3
    windows: the windows are materialized batch-locally (one tiled
    numpy subtraction), pre-aggregated inside the batch (np.unique on
    the (type, window) pair codes), and ONE small groupby-Sum carries
    per-batch partials — the exchange is O(types x windows), never
    O(events)."""
    HOP, NWIN = 300, 3  # 5-min hop, 15-min window = 3 hops
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        sec = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        base = (sec // HOP) * HOP
        types = t.column("event_type").combine_chunks()
        codes, uniq = pd.factorize(types.to_pandas(), sort=False)
        # window starts for every event x hop offset, then batch-local agg
        ws = (base[:, None] - HOP * np.arange(NWIN)[None, :]).ravel()
        tc = np.repeat(codes.astype(np.int64), NWIN)
        pair = tc * (1 << 40) + (ws - ws.min())  # collision-free pair code
        upair, counts = np.unique(pair, return_counts=True)
        ut = upair >> 40
        uw = (upair & ((1 << 40) - 1)) + ws.min()
        return pa.table(
            {
                "event_type": pa.array(uniq[ut], pa.string()),
                "window_start": pa.array(uw, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n_events"))
    )


SQL_EVENTS_HOPPING = """
SELECT event_type, ws AS window_start, count(*) AS n_events
FROM (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 - 300 * i AS ws
  FROM events, LATERAL (SELECT UNNEST(range(3)) AS i)
)
GROUP BY event_type, ws
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# corpus curation: deterministic sampling / splits / tf-idf / clustering
# ---------------------------------------------------------------------------


def q_doc_sample(sf_dir: str):
    """Deterministic ~10% corpus sample: md5-bucket(doc_id) < 10.
    Membership is a pure function of the key (reproducible across runs,
    widths, partitionings); zero shuffle.  Oracle: the identical
    md5_number_upper bucket expression in SQL — hash-checks MEMBERSHIP,
    not just the sampled row count."""
    from ..functions.sampling import hash_sample

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])
    return hash_sample(ds, "doc_id", pct=10)


SQL_DOC_SAMPLE = """
SELECT doc_id, lang,
       CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 AS BIGINT) AS bucket
FROM documents
WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 10
"""


def q_lang_temperature_sample(sf_dir: str):
    """Temperature-based language rebalancing (tau=0.5, the XLM/mBERT
    mixture rule p_lang ~ q_lang^0.5): per-lang quota
    200 * sqrt(n_lang) / sum(sqrt(n)) — low-resource languages keep a
    relatively larger share, high-resource ones are downsampled; keep
    rate capped at 1 (no replication).  One tiny per-lang count
    aggregate to the driver (rows = language domain), thresholds
    broadcast into a stateless per-batch md5 filter — the corpus never
    shuffles.  Thresholds are integer-exact (floor-sqrt scaled ints, see
    `functions/sampling.temperature_thresholds`), so the SQL twin
    hash-checks MEMBERSHIP."""
    from ..functions.sampling import temperature_sample

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])
    return temperature_sample(ds, "doc_id", "lang", target=200)


SQL_LANG_TEMPERATURE_SAMPLE = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
s AS (SELECT lang, n,
             CAST(floor(sqrt(CAST(n * 1000000000000 AS DOUBLE))) AS BIGINT) AS sq
      FROM c),
th AS (SELECT lang,
              least(CAST(1000000 AS HUGEINT),
                    (CAST(1000000 AS HUGEINT) * 200 * sq)
                      // ((SELECT sum(sq) FROM s) * n)) AS thr
       FROM s)
SELECT d.doc_id, d.lang
FROM documents d JOIN th USING (lang)
WHERE md5_number_upper(CAST(d.doc_id AS VARCHAR)) % 1000000 < thr
"""


def q_doc_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split by key-hash bucket
    ranges — disjoint, exhaustive, stable under re-partitioning."""
    from ..functions.sampling import hash_split

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id"])
    return hash_split(ds, "doc_id", [("train", 80), ("val", 10), ("test", 10)])


SQL_DOC_SPLIT = """
SELECT doc_id,
       CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 80 THEN 'train'
            WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_doc_stratified_sample(sf_dir: str):
    """Language-balanced downsample: per-stratum keep rates (en is the
    majority class -> 10%, minority langs -> 50%), still a stateless
    per-batch filter (the classic corpus-rebalancing op)."""
    from ..functions.sampling import stratified_sample

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])
    return stratified_sample(ds, "doc_id", "lang", rates={"en": 10, "de": 50, "fr": 50, "es": 50, "zh": 50})


SQL_DOC_STRATIFIED_SAMPLE = """
SELECT doc_id, lang,
       CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 AS BIGINT) AS bucket
FROM documents
WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100
      < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50 WHEN 'fr' THEN 50
                  WHEN 'es' THEN 50 WHEN 'zh' THEN 50 ELSE 0 END
"""


def q_tfidf(sf_dir: str):
    """Distributed TF-IDF statistics (doc_id, term, tf, df) — exact
    integers so the unnest/GROUP-BY SQL twin hash-matches; see
    functions.text.tfidf_terms for the combiner/shuffle shape."""
    from ..functions.text import tfidf_terms

    return tfidf_terms(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]))


SQL_TFIDF = """
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0)) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT tf.doc_id, tf.term, tf.tf, df.df FROM tf JOIN df USING (term)
"""


def q_kmeans_clusters(sf_dir: str):
    """Spherical k-means assignment over the embedding column (bounded
    driver-sample training, broadcast centroids, one matmul per batch).
    Non-SQL (iterative training) -> rows-only; determinism + coherence
    pytest in tests/test_dataops.py."""
    from ..functions.similarity import kmeans_clusters

    return kmeans_clusters(rd.read_parquet(_p(sf_dir, "embeddings")), n_clusters=8)


def q_kmeans_assign(sf_dir: str):
    """K-means ASSIGNMENT against a frozen, offline-trained model (the
    production curation shape: train once, score the whole corpus) —
    unlike `kmeans_clusters`, the centroids here are literals
    (`_kmeans_frozen.py`, trained by `ivf_train_centroids` on the
    sf0.01 embeddings, k=8 seed=3), which makes the assignment a pure
    per-row argmax expressible in DuckDB: the oracle twin scores
    `list_inner_product` against the SAME 8x64 literals.  Argmax of
    dot(x, c_i) — the l2-normalization of x scales every centroid's
    score identically, so it is omitted on both sides and the arithmetic
    is a plain float64 inner product.  Ties (near-impossible with
    continuous data) break to the lowest cluster id on both sides."""
    from ..functions.similarity import _as_matrix
    from ._kmeans_frozen import CENTROIDS

    C = np.asarray(CENTROIDS, np.float64)  # (8, 64) — closure literal, ~4 KB

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
        mat = _as_matrix(t.column("embedding"))
        lab = (mat @ C.T).argmax(axis=1).astype(np.int64)  # argmax -> lowest index on ties
        return pa.table({"vec_id": t.column("vec_id"), "cluster": pa.array(lab, pa.int64())})

    return rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )


def q_pca_project_frozen(sf_dir: str):
    """PCA projection against a frozen, offline-fitted projector (the
    production shape: fit the component once, project the whole corpus) —
    unlike `embedding_pca` (which solves the eigenproblem in-pipeline and
    is rows-only), MEAN/PC1/C0 here are literals (`_pca_frozen.py`, fitted
    on the sf0.01 embeddings), making the projection the pure affine map
    ``x . PC1 - C0`` that DuckDB evaluates with `list_inner_product`
    against the SAME 64 literals.  Both sides emit the 4-dp scaled-int
    half-away rounding; the cross-engine float dot differs by <=1 ulp
    (measured 1.7e-16), far inside the rounding guard band."""
    from ..functions.similarity import _as_matrix
    from ._pca_frozen import C0, PC1

    w = np.asarray(PC1, np.float64)  # (64,) closure literal

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "pc1_proj_4dp": pa.array([], pa.int64())})
        proj = _as_matrix(t.column("embedding")).astype(np.float64, copy=False) @ w - C0
        m = proj * 10_000.0
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "pc1_proj_4dp": pa.array((np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64), pa.int64()),
            }
        )

    return rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow"
    )


def _pca_project_frozen_sql() -> str:
    from ._pca_frozen import C0, PC1

    wlit = ", ".join(repr(float(v)) for v in PC1)
    return f"""
SELECT vec_id,
       CAST(round((list_inner_product(CAST(embedding AS DOUBLE[]), [{wlit}]) - {C0!r}) * 10000) AS BIGINT) AS pc1_proj_4dp
FROM embeddings
"""


SQL_PCA_PROJECT_FROZEN = _pca_project_frozen_sql()


def _kmeans_assign_sql() -> str:
    from ._kmeans_frozen import CENTROIDS

    values = ",\n    ".join(
        "({}, CAST([{}] AS DOUBLE[]))".format(i, ", ".join(repr(float(v)) for v in row))
        for i, row in enumerate(CENTROIDS)
    )
    return f"""
WITH cent(cid, v) AS (
  SELECT * FROM (VALUES
    {values}
  )
),
sims AS (
  SELECT e.vec_id, c.cid,
         list_inner_product(CAST(e.embedding AS DOUBLE[]), c.v) AS s
  FROM embeddings e CROSS JOIN cent c
)
SELECT vec_id, CAST(min(cid) FILTER (WHERE s = ms) AS BIGINT) AS cluster
FROM (SELECT vec_id, cid, s, max(s) OVER (PARTITION BY vec_id) AS ms FROM sims)
GROUP BY vec_id
"""


SQL_KMEANS_ASSIGN = _kmeans_assign_sql()


def q_media_frames(sf_dir: str):
    """STUB video frame sampling (every-Nth-chunk flat_map shape) over the
    binary media column — actor pool, one-to-many output.  ORACLE-pinned
    on THIS corpus: DuckDB has no BLOB substring, but the synthetic
    documents are pure ASCII (verified per sf), so the byte chunks the
    sampler hashes equal character `substr` windows and the twin can
    `md5(substr(text, 1 + frame_no*1024, 256))` per sampled frame (chunk
    256 B, every 4th).  A non-ASCII doc would make the twin's char/byte
    equivalence assumption fail loudly at the gate — the correct outcome."""
    from ..functions.multimodal import FrameSampler

    return _docs_as_media(sf_dir).map_batches(FrameSampler, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))


# chunk 256 bytes, every 4th chunk (FrameSampler defaults) -> selected
# chunk k starts at byte 1024*k; n_frames = ceil(n_chunks / 4)
SQL_MEDIA_FRAMES = """
WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
f AS (
  SELECT doc_id, text, unnest(range(((n + 255) // 256 + 3) // 4)) AS frame_no
  FROM d
)
SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
       md5(substr(text, CAST(1 + frame_no * 1024 AS BIGINT), 256)) AS frame_md5
FROM f
"""


BM25_TERMS = ["query", "join", "stream"]  # mirrored verbatim in the SQL twin


def q_bm25_topk(sf_dir: str):
    """Distributed BM25 ranked retrieval (inverted-stats shape: batch-local
    tf/doclen pass -> tiny corpus-constant aggregate -> broadcast-scored
    second pass -> pre-pruned top-k).  Oracle: DuckDB computes the
    identical formula with the same literals and evaluation order, ranked
    on the same scaled-integer score (ties broken by doc_id on both
    sides), so the hash compare is exact."""
    from ..functions.text import bm25_topk

    return bm25_topk(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), BM25_TERMS, k=10)


SQL_BM25_TOPK = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
stats AS (
  SELECT doc_id, len(ws) AS dl,
         len(list_filter(ws, w -> w = 'query'))  AS tf0,
         len(list_filter(ws, w -> w = 'join'))   AS tf1,
         len(list_filter(ws, w -> w = 'stream')) AS tf2
  FROM toks
),
corp AS (
  SELECT count(*) AS n, sum(dl) AS sumdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM stats
),
scored AS (
  SELECT s.doc_id,
         CAST(round(1000000 * (
             (ln((g.n - g.df0 + 0.5) / (g.df0 + 0.5) + 1.0) * s.tf0) * 2.2
               / (s.tf0 + 1.2 * (1.0 - 0.75 + 0.75 * (s.dl / (g.sumdl * 1.0 / g.n))))
           + (ln((g.n - g.df1 + 0.5) / (g.df1 + 0.5) + 1.0) * s.tf1) * 2.2
               / (s.tf1 + 1.2 * (1.0 - 0.75 + 0.75 * (s.dl / (g.sumdl * 1.0 / g.n))))
           + (ln((g.n - g.df2 + 0.5) / (g.df2 + 0.5) + 1.0) * s.tf2) * 2.2
               / (s.tf2 + 1.2 * (1.0 - 0.75 + 0.75 * (s.dl / (g.sumdl * 1.0 / g.n))))
         )) AS BIGINT) AS score
  FROM stats s CROSS JOIN corp g
)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (word/unique/top-unigram/
    top-bigram counts) — batch-local explode+count, zero shuffle; integer
    outputs hash-match the DuckDB unnest/GROUP BY twin."""
    from ..functions.text import repetition_stats_batch

    return rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        repetition_stats_batch, batch_format="pyarrow"
    )


SQL_DOC_REPETITION = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
uni AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM toks)
  GROUP BY doc_id, term
),
uagg AS (
  SELECT doc_id, sum(tf) AS n_words, count(*) AS n_unique, max(tf) AS top_tf
  FROM uni GROUP BY doc_id
),
bi AS (
  SELECT doc_id, bg, count(*) AS tf
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM toks)
  GROUP BY doc_id, bg
),
bagg AS (SELECT doc_id, max(tf) AS top_bigram_tf FROM bi GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(u.n_words, 0) AS BIGINT)        AS n_words,
       CAST(coalesce(u.n_unique, 0) AS BIGINT)       AS n_unique,
       CAST(coalesce(u.top_tf, 0) AS BIGINT)         AS top_tf,
       CAST(coalesce(b.top_bigram_tf, 0) AS BIGINT)  AS top_bigram_tf
FROM toks t LEFT JOIN uagg u USING (doc_id) LEFT JOIN bagg b USING (doc_id)
"""


def q_quality_filter(sf_dir: str):
    """Corpus quality GATE: threshold filter over the vectorized quality
    signals (the curation op on top of ``quality``) — keep mid-length
    documents with a minimum stopword ratio.  Thresholds compare the
    6-dp-rounded ratio on both sides, so the filter set is exact."""
    from ..functions.text import quality_score_batch

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pyarrow"
    )

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t.column("n_tokens"), 30), pc.less_equal(t.column("n_tokens"), 80)),
            pc.greater_equal(t.column("stop_ratio"), 0.05),
        )
        return t.filter(m)

    return ds.map_batches(keep, batch_format="pyarrow")


SQL_QUALITY_FILTER = f"""
SELECT * FROM ({SQL_QUALITY}) q
WHERE n_tokens BETWEEN 30 AND 80 AND stop_ratio >= 0.05
"""


def _null_anti_join(left, right_keys, n_parts: int, on: str, right_on: str, marker: str):
    """Hash anti-join: left LEFT OUTER JOIN (key, marker) rows, keep rows
    whose marker is null, drop the marker.  The right side must carry a
    non-null ``marker`` column because Ray's hash join merges the key
    columns themselves (an unmatched left row keeps its own key — only a
    payload column goes null).  Both sides shuffle by key hash — nothing
    is ever a driver set (SURVEY §7.3 shuffle discipline)."""
    joined = left.join(right_keys, join_type="left_outer", num_partitions=n_parts, on=(on,), right_on=(right_on,))

    def only_unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(marker))).drop_columns([marker])

    return joined.map_batches(only_unmatched, batch_format="pyarrow")


def q_anti_join_customers(sf_dir: str):
    """ANTI JOIN (the relational family the reference lacks but any
    curation pipeline needs): customers with no completed ('F') order.
    Distinct order keys come from a groupby (not a driver set), then one
    hash left-outer join + null filter."""
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_mktsegment"])
    f_orders = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus"])
        .filter(expr="o_orderstatus == 'F'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_o"))
    )
    n_parts = auto_num_partitions(cust.count(), cap=64)
    return _null_anti_join(cust, f_orders, n_parts, on="c_custkey", right_on="o_custkey", marker="n_o")


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def q_customer_orders_left(sf_dir: str):
    """LEFT OUTER join enrichment — every customer decorated with order
    count and total spend, zero-order customers KEPT with coalesced 0s
    (the report shape inner joins silently drop).  Aggregate-first: the
    order side shrinks to one row per customer BEFORE the join, so the
    exchange carries totals, not the order stream; nulls from the outer
    side are coalesced in a stateless pass."""
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    totals = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_spent"))
        .map_batches(lambda t: _int_scale_col(t, "total_spent", 100), batch_format="pyarrow")
    )
    n_parts = auto_num_partitions(cust.count(), cap=64)
    j = cust.join(totals, join_type="left_outer", num_partitions=n_parts, on=("c_custkey",), right_on=("o_custkey",))

    def coalesce(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").cast(pa.int64()),
                "c_name": t.column("c_name"),
                "n_orders": pc.fill_null(t.column("n_orders"), 0).cast(pa.int64()),
                "total_spent": pc.fill_null(t.column("total_spent"), 0).cast(pa.int64()),
            }
        )

    return j.map_batches(coalesce, batch_format="pyarrow")


SQL_CUSTOMER_ORDERS_LEFT = """
SELECT c.c_custkey, c.c_name,
       COALESCE(t.n_orders, 0) AS n_orders,
       COALESCE(t.total_spent, 0) AS total_spent
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_spent
  FROM orders GROUP BY 1
) t ON t.o_custkey = c.c_custkey
"""


def q_events_exact_quartiles(sf_dir: str):
    """EXACT per-type quartiles (order statistics, not a sketch): the
    value at rank ``floor((n-1)·q/4)+1`` for q in 1..3, computed with
    no global sort via the value-range rank machinery
    (:func:`~goto_eater_crawler_ray.functions.window.exact_order_stats_per_key`).
    Complements `events_quantiles_by_type` (mergeable sketch, approx):
    this is the exact path, same single-exchange cost."""
    from ..functions.window import exact_order_stats_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    out = exact_order_stats_per_key(ds, key_col="event_type", value_col="value", id_col="event_id")
    return out.map_batches(lambda t: _int_scale_col(t, "value", 10_000), batch_format="pyarrow").rename_columns(
        {"value": "value_4dp"}
    )


SQL_EVENTS_EXACT_QUARTILES = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type, q.quarter, CAST(round(value * 10000) AS BIGINT) AS value_4dp
FROM r, (VALUES (1), (2), (3)) AS q(quarter)
WHERE rn = ((n - 1) * q.quarter) // 4 + 1
"""


def q_events_mad_outliers(sf_dir: str):
    """Robust outlier detection: rows with ``|x - median| > 3·MAD``
    within their event type — median and MAD are EXACT order statistics
    (two passes of the value-range rank machinery; MAD = exact median
    of |x - med|), so unlike a z-score the flag is immune to the
    outliers it hunts.  Both medians are exact input values and every
    float expression (`abs(x - med)`, `3*mad`) is written identically
    in the twin, so the comparison is bit-deterministic on both sides."""
    from ..functions.window import exact_order_stats_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])

    def _broadcast(rows, val_col):
        keys = pa.array([r["event_type"] for r in rows], pa.string())
        vals = np.asarray([float(r[val_col]) for r in rows], np.float64)
        return keys, vals

    med_rows = exact_order_stats_per_key(
        ds, key_col="event_type", value_col="value", id_col="event_id", quarters=(2,)
    ).take_all()  # |event types| rows
    med_keys, med_vals = _broadcast(med_rows, "value")

    def with_dev(t: pa.Table) -> pa.Table:
        idx = (
            pc.fill_null(pc.index_in(t.column("event_type"), value_set=med_keys), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        dv = np.abs(v - med_vals[idx])
        return t.append_column("dv", pa.array(dv, pa.float64()))

    dev = ds.map_batches(with_dev, batch_format="pyarrow")
    mad_rows = exact_order_stats_per_key(
        dev, key_col="event_type", value_col="dv", id_col="event_id", quarters=(2,)
    ).take_all()
    mad_keys, mad_vals = _broadcast(mad_rows, "value")

    def flag(t: pa.Table) -> pa.Table:
        idx = (
            pc.fill_null(pc.index_in(t.column("event_type"), value_set=mad_keys), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = t.column("dv").to_numpy(zero_copy_only=False) > 3.0 * mad_vals[idx]
        mask = pa.array(keep)
        m = t.column("value").to_numpy(zero_copy_only=False)[keep] * 10_000.0
        return pa.table(
            {
                "event_id": pc.filter(t.column("event_id"), mask).cast(pa.int64()),
                "event_type": pc.filter(t.column("event_type"), mask),
                "value_4dp": pa.array(_half_away(m), pa.int64()),
            }
        )

    return dev.map_batches(flag, batch_format="pyarrow")


SQL_EVENTS_MAD_OUTLIERS = """
WITH r1 AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (SELECT event_type, value AS med FROM r1 WHERE rn = ((n - 1) * 2) // 4 + 1),
d AS (
  SELECT e.event_id, e.event_type, e.value, abs(e.value - med.med) AS dv
  FROM events e JOIN med USING (event_type)),
r2 AS (
  SELECT event_type, dv,
         row_number() OVER (PARTITION BY event_type ORDER BY dv, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d),
mad AS (SELECT event_type, dv AS mad FROM r2 WHERE rn = ((n - 1) * 2) // 4 + 1)
SELECT d.event_id, d.event_type,
       CAST(round(d.value * 10000) AS BIGINT) AS value_4dp
FROM d JOIN mad USING (event_type)
WHERE d.dv > 3 * mad.mad
"""


def q_orders_priority_share(sf_dir: str):
    """Ratio-to-report: each order priority's share of total revenue —
    the percentage-of-total window op (``sum(x) / sum(x) OVER ()``),
    computed as one partial-combined groupby over exact centi-unit
    ints; the share division is the ONE float expression, written
    identically in the twin over the same exact integers."""
    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "rev_c": pa.array(
                    _half_away(t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0), pa.int64()
                ),
            }
        )

    g = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("rev_c", alias_name="revenue_c"))
        .to_pandas()  # bounded: one row per priority level
    )
    total = float(g["revenue_c"].sum())
    share = 1_000_000.0 * (g["revenue_c"].to_numpy(np.float64) / total)
    out = pd.DataFrame(
        {
            "o_orderpriority": g["o_orderpriority"],
            "revenue_c": g["revenue_c"].astype(np.int64),
            "share_6dp": _half_away(share),
        }
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_ORDERS_PRIORITY_SHARE = """
WITH g AS (
  SELECT o_orderpriority,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_c
  FROM orders GROUP BY 1)
SELECT o_orderpriority,
       CAST(revenue_c AS BIGINT) AS revenue_c,
       CAST(round(1000000 * (revenue_c / (SELECT sum(revenue_c) FROM g))) AS BIGINT) AS share_6dp
FROM g
"""


def q_events_first_last(sf_dir: str):
    """User-journey endpoints: the FIRST and LAST event (by ts,
    tie-broken by event_id) per user — the arg_min/arg_max family.
    Same shape as latest_per_key: a per-batch pre-prune keeps only each
    batch's candidate endpoint rows (≤2 per user per batch) before ONE
    coarse hash shuffle; the final pass is a segment-vectorized sort."""
    N_PARTS = 64
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"])

    def _end_indices(t: pa.Table):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        su = u[order]
        seg_start = np.concatenate(([True], su[1:] != su[:-1]))
        seg_end = np.concatenate((seg_start[1:], [True]))
        return order, seg_start, seg_end

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_key_part", pa.array([], pa.int32()))
        order, seg_start, seg_end = _end_indices(t)
        keep = np.sort(np.unique(np.concatenate((order[seg_start], order[seg_end]))))
        out = t.take(pa.array(keep))
        k = out.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return out.append_column("_key_part", pa.array((k % N_PARTS).astype(np.int32), pa.int32()))

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("first_type", pa.string()),
            ("first_ts", pa.timestamp("us")),
            ("last_type", pa.string()),
            ("last_ts", pa.timestamp("us")),
        ]
    )

    def ends(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_key_part"])
        if part.num_rows == 0:
            return out_schema.empty_table()
        order, seg_start, seg_end = _end_indices(part)
        first_i, last_i = pa.array(order[seg_start]), pa.array(order[seg_end])
        et = part.column("event_type").combine_chunks()
        ts = part.column("ts").combine_chunks()
        return pa.Table.from_arrays(
            [
                pc.take(part.column("user_id").combine_chunks(), first_i).cast(pa.int64()),
                pc.take(et, first_i),
                pc.take(ts, first_i).cast(pa.timestamp("us")),
                pc.take(et, last_i),
                pc.take(ts, last_i).cast(pa.timestamp("us")),
            ],
            schema=out_schema,
        )

    return ds.map_batches(prune, batch_format="pyarrow").groupby("_key_part").map_groups(ends, batch_format="pyarrow")


SQL_EVENTS_FIRST_LAST = """
SELECT user_id,
       first(event_type ORDER BY ts, event_id) AS first_type,
       first(ts ORDER BY ts, event_id) AS first_ts,
       last(event_type ORDER BY ts, event_id) AS last_type,
       last(ts ORDER BY ts, event_id) AS last_ts
FROM events GROUP BY user_id
"""


def q_events_minmax(sf_dir: str):
    """Per-group min-max normalization (the [0,1] feature scaler that
    complements z-score): one tiny Min/Max-per-type aggregate broadcast
    into a stateless second pass via ``pc.index_in``; degenerate groups
    (hi == lo) are dropped on both sides.  The twin evaluates the
    IDENTICAL ``(value - lo) / (hi - lo)`` expression."""
    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    stats = ds.groupby("event_type").aggregate(Min("value", alias_name="lo"), Max("value", alias_name="hi")).take_all()
    keys, los, his = [], [], []
    for r in stats:
        if float(r["hi"]) > float(r["lo"]):
            keys.append(r["event_type"])
            los.append(float(r["lo"]))
            his.append(float(r["hi"]))
    key_arr = pa.array(keys, pa.string())
    lo_arr, hi_arr = np.asarray(los, np.float64), np.asarray(his, np.float64)

    def norm(t: pa.Table) -> pa.Table:
        # fill_null(-1): a dropped (degenerate) group gives index_in a NULL,
        # which to_numpy would surface as float NaN, not an int index
        idx = (
            pc.fill_null(pc.index_in(t.column("event_type"), value_set=key_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = idx >= 0
        idx = idx[keep]
        v = t.column("value").to_numpy(zero_copy_only=False)[keep]
        m = 1_000_000.0 * (v - lo_arr[idx]) / (hi_arr[idx] - lo_arr[idx])
        mask = pa.array(keep)
        return pa.table(
            {
                "event_id": pc.filter(t.column("event_id"), mask).cast(pa.int64()),
                "event_type": pc.filter(t.column("event_type"), mask),
                "mm_6dp": pa.array((np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


SQL_EVENTS_MINMAX = """
WITH s AS (SELECT event_type, min(value) AS lo, max(value) AS hi FROM events GROUP BY 1)
SELECT event_id, e.event_type,
       CAST(round(1000000 * (e.value - s.lo) / (s.hi - s.lo)) AS BIGINT) AS mm_6dp
FROM events e JOIN s USING (event_type)
WHERE s.hi > s.lo
"""


def q_events_dense_rank(sf_dir: str):
    """Distributed ``dense_rank()`` within event type — ties collapse to
    one rank, computed WITHOUT a global sort: distinct (key, value)
    pairs (combiner + one groupby), row_number over the distinct values
    via the percent-rank value-range machinery, then one hash join back
    to the rows (:func:`~goto_eater_crawler_ray.functions.window.dense_rank_per_key`)."""
    from ..functions.window import dense_rank_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    return dense_rank_per_key(ds, key_col="event_type", value_col="value", id_col="event_id")


SQL_EVENTS_DENSE_RANK = """
SELECT event_id, event_type,
       dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS drank
FROM events
"""


def q_revenue_by_nation(sf_dir: str):
    """TPC-H-Q5-flavored 4-table chain: lineitem revenue → orders (date
    window) → customer → nation.  Aggregate-first at every step — line
    revenue collapses to per-ORDER totals before the first join, order
    revenue to per-CUSTOMER totals before the second — so each exchange
    carries totals, not the fact stream; the 25-row nation dim resolves
    via a broadcast ``pc.index_in`` lookup, never a shuffle.  Revenue is
    exact int64 centi-units from the one shared float expression
    ``round(extendedprice * (1 - discount) * 100)``."""
    # join/shuffle width sized to the fact table from parquet METADATA
    # (no scan, no ray pass) so the same code is 2-way at test scale and
    # 64-way against a 100x corpus
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    lr = (
        rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                    "rev_c": pa.array(
                        _half_away(
                            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
                            * 100.0
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .repartition(n_parts)  # scrub empty-partition blocks before the join
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
                pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1998-01-01", "us"))),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    # the per-customer groupby is load-bearing here (unlike the Q7/Q8
    # chains): n_custs counts one row per customer, and the orders join
    # partitions by ORDER key, so batch partials alone would leave a
    # customer's rows spread across partitions and overcount
    cr = (
        lr.join(orders, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",))
        .groupby("o_custkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .repartition(n_parts)
    )
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    by_nation = (
        cr.join(cust, join_type="inner", num_partitions=n_parts, on=("o_custkey",), right_on=("c_custkey",))
        .groupby("c_nationkey")
        .aggregate(Sum("rev_c", alias_name="revenue_c"), Count(alias_name="n_custs"))
        .repartition(2)
    )
    nation = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])  # 25 rows: constant dim

    def name_lookup(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("c_nationkey").cast(pa.int64()), value_set=nation.column("n_nationkey").combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                "nation_name": pc.take(nation.column("n_name").combine_chunks(), idx),
                "revenue_c": t.column("revenue_c").cast(pa.int64()),
                "n_custs": t.column("n_custs").cast(pa.int64()),
            }
        )

    return by_nation.map_batches(name_lookup, batch_format="pyarrow")


SQL_REVENUE_BY_NATION = """
WITH lr AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY 1),
o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
cr AS (
  SELECT o_custkey, sum(rev_c) AS rev_c
  FROM lr JOIN o ON l_orderkey = o_orderkey GROUP BY 1)
SELECT n_name AS nation_name,
       CAST(sum(cr.rev_c) AS BIGINT) AS revenue_c,
       count(*) AS n_custs
FROM cr JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


def q_purchase_error_full(sf_dir: str):
    """FULL OUTER join reconciliation — per-user purchase totals vs
    per-user error totals, keeping users present on EITHER side (the
    audit shape: "who bought but never errored, who errored but never
    bought").  Both sides aggregate FIRST (exact int64 centi-units per
    row, so the sums are order-independent), then one
    ``Dataset.join(full_outer)`` over the shrunken totals; nulls from
    either outer side coalesce in a stateless pass.

    Each side does its OWN pruned scan (two scans, like the twin's two
    CTEs): Ray's hash-shuffle join mis-plans a diamond DAG where both
    join sequences alias one upstream Dataset object (the aggregator
    sees blocks without the key column and the Arrow join fails)."""
    N_JOIN_PARTS = 16

    def side(event_type: str, alias: str):
        ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type", "value"])
        def pick(t: pa.Table, et=event_type) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], et))
            m = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
            return pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "v_c": pa.array((np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64), pa.int64()),
                }
            )

        return (
            ds.map_batches(pick, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Count(alias_name=f"n_{alias}"), Sum("v_c", alias_name=f"v_{alias}_c"))
            # scrub the hash aggregate's ZERO-COLUMN empty-partition blocks
            # (key domain < partition count): they bypass map_batches (the
            # fn is never called on empty blocks) and poison the Arrow
            # join ("no match for key field user_id"); repartition
            # coalesces them away and matches the join's partitioning
            .repartition(N_JOIN_PARTS)
        )

    p = side("purchase", "purchase")
    e = side("error", "error")
    j = p.join(
        e,
        join_type="full_outer",
        num_partitions=N_JOIN_PARTS,
        on=("user_id",),
        right_on=("user_id",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def coalesce(t: pa.Table) -> pa.Table:
        names = t.schema.names
        ul = t.column("user_id_l" if "user_id_l" in names else "user_id")
        ur = t.column("user_id_r") if "user_id_r" in names else ul
        return pa.table(
            {
                "user_id": pc.coalesce(ul, ur).cast(pa.int64()),
                "n_purchase": pc.fill_null(t.column("n_purchase"), 0).cast(pa.int64()),
                "v_purchase_c": pc.fill_null(t.column("v_purchase_c"), 0).cast(pa.int64()),
                "n_error": pc.fill_null(t.column("n_error"), 0).cast(pa.int64()),
                "v_error_c": pc.fill_null(t.column("v_error_c"), 0).cast(pa.int64()),
            }
        )

    return j.map_batches(coalesce, batch_format="pyarrow")


SQL_PURCHASE_ERROR_FULL = """
WITH p AS (
  SELECT user_id, count(*) AS n_purchase,
         sum(CAST(round(value * 100) AS BIGINT)) AS v_purchase_c
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
e AS (
  SELECT user_id, count(*) AS n_error,
         sum(CAST(round(value * 100) AS BIGINT)) AS v_error_c
  FROM events WHERE event_type = 'error' GROUP BY 1)
SELECT COALESCE(p.user_id, e.user_id) AS user_id,
       COALESCE(p.n_purchase, 0) AS n_purchase,
       CAST(COALESCE(p.v_purchase_c, 0) AS BIGINT) AS v_purchase_c,
       COALESCE(e.n_error, 0) AS n_error,
       CAST(COALESCE(e.v_error_c, 0) AS BIGINT) AS v_error_c
FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
"""


def q_sparse_cosine_pairs(sf_dir: str):
    """Sparse similarity JOIN: cosine over term-count vectors via the
    inverted-index self-join (term -> docs -> pair partial dots), the
    text-side near-dup shape that needs no embeddings.  Exactness: tf
    vectors and norms are batch-local integers (a doc lives in one
    row); partial dot products are exact int64 and combine through one
    (doc1, doc2) groupby; the ONLY float math is the final
    ``1e6·dot/(sqrt(s1)·sqrt(s2))`` scalar, written identically in the
    SQL twin.  Scale: terms with df > n_docs/10 are dropped inside the
    term-group pass (the standard common-term prune — they dominate
    pair-explosion cost and carry no discriminative signal; norms stay
    full-vector so the estimate only shrinks), and each doc's norm
    rides WITH its tf rows so no corpus-sized norm join exists."""
    SCALE = 1_000_000
    MIN_SIM_6DP = 100_000  # report pairs with cosine >= 0.1 (rounded)

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = ds.count()  # one scalar to the driver
    # ABSOLUTE ceiling on top of the relative prune: per-term pair work is
    # C(df, 2), so a relative-only cap (n/10) grows the worst term's group
    # QUADRATICALLY with the corpus; clamping df at a constant bounds the
    # whole exchange at vocab * C(100, 2) rows — linear in vocab, corpus-
    # size-independent (the prefix-filtering discipline of similarity joins)
    df_cap = max(2, min(n_docs // 10, 100))

    tf_schema = pa.schema([("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()), ("s", pa.int64())])

    def tf_batch(t: pa.Table) -> pa.Table:
        from ..functions.text import _split_tokens

        # terms are word BIGRAMS (shingles): unigram vocab is tiny and
        # uniformly common, bigrams carry the discriminative signal —
        # the same reason the MinHash family shingles before hashing
        parents, toks = _split_tokens(t)
        words = toks.to_pandas().to_numpy()
        if len(words) < 2:
            return tf_schema.empty_table()
        same = parents[1:] == parents[:-1]  # bigrams never cross documents
        grams = np.char.add(np.char.add(words[:-1].astype(str), " "), words[1:].astype(str))[same]
        gparents = parents[:-1][same]
        if len(grams) == 0:
            return tf_schema.empty_table()
        df = pd.DataFrame(
            {
                "doc_id": pc.take(t.column("doc_id").combine_chunks(), pa.array(gparents)).to_numpy(
                    zero_copy_only=False
                ),
                "term": grams,
            }
        )
        g = df.groupby(["doc_id", "term"], as_index=False, sort=False).size().rename(columns={"size": "tf"})
        s = g.assign(t2=g["tf"] ** 2).groupby("doc_id")["t2"].sum()
        g["s"] = s.loc[g["doc_id"]].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(g["term"], pa.string()),
                "tf": pa.array(g["tf"].to_numpy(), pa.int64()),
                "s": pa.array(g["s"].to_numpy(), pa.int64()),
            }
        )

    pair_schema = pa.schema(
        [("doc1", pa.int64()), ("doc2", pa.int64()), ("s1", pa.int64()), ("s2", pa.int64()), ("p", pa.int64())]
    )

    def pair_dots(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2 or n > df_cap:  # common-term prune, mirrored in the twin's HAVING
            return pair_schema.empty_table()
        order = pc.sort_indices(g.column("doc_id"))
        d = g.column("doc_id").take(order).to_numpy(zero_copy_only=False)
        tfv = g.column("tf").take(order).to_numpy(zero_copy_only=False)
        s = g.column("s").take(order).to_numpy(zero_copy_only=False)
        ii, jj = np.triu_indices(n, k=1)  # doc ids unique per term; sorted, so d[ii] < d[jj]
        return pa.Table.from_arrays(
            [
                pa.array(d[ii], pa.int64()),
                pa.array(d[jj], pa.int64()),
                pa.array(s[ii], pa.int64()),
                pa.array(s[jj], pa.int64()),
                pa.array(tfv[ii] * tfv[jj], pa.int64()),
            ],
            schema=pair_schema,
        )

    dots = (
        ds.map_batches(tf_batch, batch_format="pyarrow")
        .groupby("term")
        .map_groups(pair_dots, batch_format="pyarrow")
        .groupby(["doc1", "doc2", "s1", "s2"])
        .aggregate(Sum("p", alias_name="dot"))
    )

    def emit(t: pa.Table) -> pa.Table:
        dot = t.column("dot").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t.column("s1").to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t.column("s2").to_numpy(zero_copy_only=False).astype(np.float64)
        sim = (float(SCALE) * dot) / (np.sqrt(s1) * np.sqrt(s2))  # the ONE float expression, as in SQL
        sim_i = (np.sign(sim) * np.floor(np.abs(sim) + 0.5)).astype(np.int64)
        keep = sim_i >= MIN_SIM_6DP
        mask = pa.array(keep)
        return pa.table(
            {
                "doc1": pc.filter(t.column("doc1"), mask).cast(pa.int64()),
                "doc2": pc.filter(t.column("doc2"), mask).cast(pa.int64()),
                "cos_6dp": pa.array(sim_i[keep], pa.int64()),
            }
        )

    return dots.map_batches(emit, batch_format="pyarrow")


SQL_SPARSE_COSINE_PAIRS = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS term
  FROM toks, unnest(range(1, len(ws))) AS t(i)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM grams GROUP BY doc_id, term),
norm AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS s FROM tf GROUP BY doc_id),
rare AS (
  SELECT term FROM tf GROUP BY term
  HAVING count(*) BETWEEN 2
     AND greatest(2, least((SELECT count(*) FROM documents) // 10, 100))),
dots AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM tf a JOIN rare USING (term) JOIN tf b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2),
sims AS (
  SELECT doc1, doc2,
         CAST(round(1000000 * dot / (sqrt(CAST(n1.s AS DOUBLE)) * sqrt(CAST(n2.s AS DOUBLE)))) AS BIGINT) AS cos_6dp
  FROM dots JOIN norm n1 ON doc1 = n1.doc_id JOIN norm n2 ON doc2 = n2.doc_id)
SELECT doc1, doc2, cos_6dp FROM sims WHERE cos_6dp >= 100000
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # closed set, mirrored in SQL


def q_events_pivot(sf_dir: str):
    """PIVOT (long -> wide counts per user x event_type): batch-local
    crosstab combiner, then ONE groupby-user Sum per pivot column — the
    exchange carries at most |users| x |types| partial rows, never the
    event stream."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        piv = pd.crosstab(df["user_id"], df["event_type"])
        piv = piv.reindex(columns=EVENT_TYPES, fill_value=0).fillna(0).astype(np.int64).reset_index()
        piv.columns = ["user_id"] + [f"n_{c}" for c in EVENT_TYPES]
        return pa.Table.from_pandas(piv, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{c}", alias_name=f"n_{c}") for c in EVENT_TYPES])
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def q_events_time_delta(sf_dir: str):
    """LAG window op: per-user inter-arrival time in microseconds
    (``epoch_us(ts) - lag(...)``), first event per user coalesced to -1 so
    the output stays pure int64.  One coarse hash shuffle + vectorized
    shifted subtraction (functions.window.lag_delta_per_key)."""
    from ..functions.window import lag_delta_per_key

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())  # timestamp[us] -> microsecond ticks
        return pa.table({"user_id": t.column("user_id"), "event_id": t.column("event_id"), "ts_us": us})

    return lag_delta_per_key(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key_col="user_id",
        order_cols=["ts_us", "event_id"],
        value_col="ts_us",
        out_col="delta_us",
        first_value=-1,
    )


SQL_EVENTS_TIME_DELTA = """
SELECT user_id, epoch_us(ts) AS ts_us, event_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS delta_us
FROM events
"""


def q_doc_pack(sf_dir: str):
    """LLM sequence packing: distributed prefix-sum gives each document
    its global token start offset in doc_id order; seq_id = offset //
    seq_len is the training sequence where the doc begins when the
    corpus is concatenated and sliced every 512 tokens.  Two-pass scan
    (functions.scan): one groupby shuffle + n_parts scalars to the
    driver.  All-integer -> exact window-function oracle."""
    from ..functions.scan import pack_sequences
    from ..functions.text import _split_tokens

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        parents, _ = _split_tokens(t)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(np.bincount(parents, minlength=t.num_rows), pa.int64()),
            }
        )

    return pack_sequences(ds.map_batches(counts, batch_format="pyarrow"), key_col="doc_id", n_tokens_col="n_tokens", seq_len=512)


SQL_DOC_PACK = """
WITH stats AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0)) AS BIGINT) AS n_tokens
  FROM documents
),
scanned AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM stats
)
SELECT doc_id, n_tokens, start_offset, CAST(start_offset // 512 AS BIGINT) AS seq_id FROM scanned
"""


def q_events_quantiles_by_type(sf_dir: str):
    """Per-GROUP sketch percentiles (p50/p90/p99 of value per event
    type) — grouped form of value_quantiles: same mergeable fixed-bin
    histogram, per-group (lo,hi,n) broadcast, per-group bin selection
    inside map_groups.  Oracle runs the identical sketch in SQL."""
    from ..functions.quantiles import grouped_histogram_quantiles

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    return grouped_histogram_quantiles(ds, "event_type", "value", pcts=[50, 90, 99], n_bins=256)


SQL_EVENTS_QUANTILES_BY_TYPE = """
WITH s AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi, count(*) AS n
  FROM events GROUP BY event_type
),
b AS (
  SELECT e.event_type,
         CAST(CASE WHEN s.hi = s.lo THEN 0
                   ELSE least(floor((e.value - s.lo) / ((s.hi - s.lo) / 256.0)), 255)
              END AS BIGINT) AS bin
  FROM events e JOIN s USING (event_type)
),
h AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY event_type, bin),
cum AS (
  SELECT event_type, bin,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cumc
  FROM h
),
r AS (
  SELECT s.event_type, p.pct, (p.pct * s.n + 99) // 100 AS rnk, s.lo, s.hi
  FROM s CROSS JOIN (SELECT unnest([50, 90, 99]) AS pct) p
)
SELECT r.event_type, CAST(r.pct AS BIGINT) AS pct, CAST(min(cum.bin) AS BIGINT) AS bin,
       CAST(round(r.lo * 100) AS BIGINT) AS lo_c, CAST(round(r.hi * 100) AS BIGINT) AS hi_c
FROM r JOIN cum ON cum.event_type = r.event_type AND cum.cumc >= r.rnk
GROUP BY r.event_type, r.pct, r.lo, r.hi
"""


def q_top_bigrams(sf_dir: str):
    """Corpus-wide top-20 bigram counts (combiner -> one groupby(bigram)
    Sum -> pruned global sort); ties broken by bigram text, mirrored in
    the SQL twin, so the hash compare is exact."""
    from ..functions.text import top_ngrams

    return top_ngrams(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), n_top=20)


SQL_TOP_BIGRAMS = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
)
SELECT bigram, count(*) AS c
FROM (SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM toks)
GROUP BY bigram ORDER BY c DESC, bigram LIMIT 20
"""


def q_bigram_pmi(sf_dir: str):
    """Collocation extraction — top-50 adjacent-word bigrams by PMI
    (c12 >= 5), see :func:`~goto_eater_crawler_ray.functions.text.bigram_pmi`.
    ORACLE: the twin reproduces the identical integer counts, the same
    one-division ln argument and the 6-dp scaled-int rounding, with ties
    broken (pmi, w1, w2) on both sides."""
    from ..functions.text import bigram_pmi

    return bigram_pmi(rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]), min_count=5, n_top=50)


SQL_BIGRAM_PMI = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
uni AS (SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
bi AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2, count(*) AS c12
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i)
  GROUP BY 1, 2
),
tot AS (SELECT sum(c12) AS n FROM bi),
scored AS (
  SELECT b.w1, b.w2, b.c12,
         CAST(round(ln(CAST(t.n * b.c12 AS DOUBLE) / (u1.c * u2.c)) * 1000000) AS BIGINT) AS pmi_6dp
  FROM bi b
  JOIN uni u1 ON u1.w = b.w1
  JOIN uni u2 ON u2.w = b.w2
  CROSS JOIN tot t
  WHERE b.c12 >= 5
)
SELECT w1, w2, c12, pmi_6dp FROM scored ORDER BY pmi_6dp DESC, w1, w2 LIMIT 50
"""


def q_tokenize_flat(sf_dir: str):
    """Tokenization to hash-vocab token IDs — the actual artifact an LLM
    pipeline ships (not just counts): one row per (doc, position) with
    token_id = md5-bucket(token) % 32768, the hashing-trick vocabulary.
    Batch-local explode (positions computed segment-vectorized, one md5
    per DISTINCT token in the batch via a pandas factorize), zero
    shuffle; the SQL twin evaluates the identical id expression
    (md5_number_upper == first 8 md5 bytes little-endian)."""
    from ..functions.sampling import md5_buckets
    from ..functions.text import _split_tokens

    V = 32768
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def tokenize(t: pa.Table) -> pa.Table:
        parents, toks = _split_tokens(t)
        if len(parents) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64()), "token_id": pa.array([], pa.int64())}
            )
        words = toks.to_pandas()
        # position within document: index minus segment start
        idx = np.arange(len(parents))
        seg_start = np.concatenate(([True], parents[1:] != parents[:-1]))
        pos = idx - np.maximum.accumulate(np.where(seg_start, idx, 0))
        # hash once per DISTINCT token in the batch, then scatter
        codes, uniques = pd.factorize(words, sort=False)
        ids = md5_buckets(uniques.to_numpy(), mod=V)[codes]
        doc_ids = pc.take(t.column("doc_id").combine_chunks(), pa.array(parents))
        return pa.table(
            {
                "doc_id": doc_ids.cast(pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "token_id": pa.array(ids, pa.int64()),
            }
        )

    return ds.map_batches(tokenize, batch_format="pyarrow")


SQL_TOKENIZE_FLAT = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       CAST(md5_number_upper(ws[i]) % 32768 AS BIGINT) AS token_id
FROM toks, LATERAL (SELECT UNNEST(range(1, len(ws) + 1)) AS i)
"""


BPE_K = 12

# frozen by tools/freeze_bpe_pins.py from the INDEPENDENT single-process
# reference implementation (functions/bpe.bpe_train_local — textbook
# Sennrich scan, no Ray, no code shared with the distributed trainer),
# keyed by sum(n_chars) of each gate scale's documents table (the two
# gate corpora have the same row COUNT, so the char total is the
# discriminating corpus stat).  Re-freeze when the test corpus or BPE_K
# changes.
BPE_PINS: dict[int, list] = {
    153156: [  # /root/testdata/sf0.001
        (1, "e", "r", "er", 4650),
        (2, "e", "</w>", "e</w>", 4644),
        (3, "n", "</w>", "n</w>", 2898),
        (4, "o", "r", "or", 2880),
        (5, "t", "</w>", "t</w>", 2850),
        (6, "er", "</w>", "er</w>", 2781),
        (7, "o", "w", "ow", 2763),
        (8, "ow", "</w>", "ow</w>", 2763),
        (9, "l", "u", "lu", 1928),
        (10, "i", "n", "in", 1922),
        (11, "y", "</w>", "y</w>", 1879),
        (12, "a", "r", "ar", 1873),
    ],
    149174: [  # /root/testdata/sf0.01
        (1, "e", "r", "er", 4568),
        (2, "e", "</w>", "e</w>", 4473),
        (3, "n", "</w>", "n</w>", 2834),
        (4, "er", "</w>", "er</w>", 2779),
        (5, "o", "w", "ow", 2747),
        (6, "ow", "</w>", "ow</w>", 2747),
        (7, "o", "r", "or", 2696),
        (8, "s", "t", "st", 2676),
        (9, "h", "</w>", "h</w>", 1884),
        (10, "a", "t", "at", 1845),
        (11, "l", "u", "lu", 1831),
        (12, "i", "n", "in", 1796),
    ],
}


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer TRAINING (`functions/bpe.py`): learn the
    first 12 merges over the documents corpus — word-freq vocab table
    once (the only corpus-scaled pass), then per merge one
    alphabet-bounded pair-count groupby (combiner-first; global pair
    domain <= (|alphabet|+k)^2 rows regardless of corpus size) and one
    segment-vectorized merge rewrite of the vocab's symbol sequences.
    Exact int64 counts + (count DESC, left, right) tie-break make the
    merge table bit-identical across widths; the oracle twin serves the
    merge table computed by the independent local reference
    implementation, frozen per gate scale (a true cross-implementation
    compare, the frozen-model contract)."""
    from ..functions.bpe import bpe_train

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    return bpe_train(docs, BPE_K)


# frozen by tools/freeze_bpe_pins.py (reference bpe_train_local +
# bpe_encode_local), keyed like BPE_PINS
BPE_TOKEN_PINS: dict[int, list] = {
    153156: [  # /root/testdata/sf0.001
        ('</w>', 10124),
        ('a', 11076),
        ('ar', 1873),
        ('b', 2703),
        ('c', 4692),
        ('d', 2876),
        ('e', 2795),
        ('e</w>', 4644),
        ('er', 1869),
        ('er</w>', 2781),
        ('f', 1830),
        ('g', 4665),
        ('h', 3666),
        ('i', 2743),
        ('in', 1922),
        ('j', 936),
        ('k', 1855),
        ('l', 5483),
        ('lu', 1928),
        ('m', 4619),
        ('n</w>', 2898),
        ('o', 3737),
        ('or', 2880),
        ('ow</w>', 2763),
        ('p', 2836),
        ('q', 934),
        ('r', 2719),
        ('s', 8331),
        ('t', 7275),
        ('t</w>', 2850),
        ('u', 2786),
        ('v', 1881),
        ('w', 976),
        ('y</w>', 1879),
    ],
    149174: [  # /root/testdata/sf0.01
        ('</w>', 12448),
        ('a', 10805),
        ('at', 1845),
        ('b', 2721),
        ('c', 4653),
        ('d', 2732),
        ('e', 2696),
        ('e</w>', 4473),
        ('er', 1789),
        ('er</w>', 2779),
        ('f', 1787),
        ('g', 4474),
        ('h', 1787),
        ('h</w>', 1884),
        ('i', 2773),
        ('in', 1796),
        ('j', 964),
        ('k', 1776),
        ('l', 5525),
        ('lu', 1831),
        ('m', 4602),
        ('n</w>', 2834),
        ('o', 3710),
        ('or', 2696),
        ('ow</w>', 2747),
        ('p', 2662),
        ('q', 871),
        ('r', 4467),
        ('s', 5481),
        ('st', 2676),
        ('t', 5343),
        ('u', 2709),
        ('v', 1809),
        ('w', 886),
        ('y', 1767),
    ],
}


def q_bpe_token_counts(sf_dir: str):
    """End-to-end BPE train+APPLY: learn the BPE_K merges, then tokenize
    the whole corpus with them and count tokens (`functions/bpe.py`
    bpe_token_counts).  The apply side is the corpus-scaled stage: per
    batch, k segment-vectorized merge passes over the flattened symbol
    stream, then a batch-local count — output rows are bounded by the
    token vocabulary (<= |alphabet| + k), so the global groupby is tiny
    and the text never shuffles.  Oracle: the token-count table from the
    independent local reference (train + textbook scan-encode), frozen
    per gate scale."""
    from ..functions.bpe import bpe_token_counts, bpe_train

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    merges_t = bpe_train(docs, BPE_K)
    merges = list(zip(merges_t.column("pair_left").to_pylist(), merges_t.column("pair_right").to_pylist()))
    return bpe_token_counts(docs, merges).sort("token")


def _bpe_token_counts_sql() -> str:
    blocks = []
    for n_chars, rows in BPE_TOKEN_PINS.items():
        values = ",\n    ".join(f"('{tok}', {n})" for tok, n in rows)
        blocks.append(
            f"SELECT * FROM (VALUES\n    {values}\n) t(token, n)\n"
            f"WHERE (SELECT sum(n_chars) FROM documents) = {n_chars}"
        )
    return "\nUNION ALL\n".join(blocks)


def _bpe_merges_sql() -> str:
    blocks = []
    for n_chars, rows in BPE_PINS.items():
        values = ",\n    ".join(f"({rank}, '{a}', '{b}', '{m}', {c})" for rank, a, b, m, c in rows)
        blocks.append(
            f"SELECT * FROM (VALUES\n    {values}\n) t(rank, pair_left, pair_right, merged, pair_count)\n"
            f"WHERE (SELECT sum(n_chars) FROM documents) = {n_chars}"
        )
    return "\nUNION ALL\n".join(blocks)


def q_events_zscore(sf_dir: str):
    """Per-group feature normalization (z-score of value within its event
    type) — the standard ML feature-scaling op.  One tiny groupby
    aggregate (sum, sum-of-squares, count per type) broadcast into a
    stateless second pass; the SQL twin evaluates the IDENTICAL
    sum-based formula (mu = s1/n, var = (s2 - s1^2/n)/(n-1)) rather than
    DuckDB's built-in stddev, so both sides share one algebraic
    definition and the 4-dp scaled-integer hash compare is exact."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.assign(v2=df["value"] ** 2).groupby("event_type", as_index=False).agg(
            s1=("value", "sum"), n=("value", "size"), s2=("v2", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"), Sum("n", alias_name="n"))
        .take_all()
    )  # |event types| rows — bounded category set, broadcast in the closure
    # Degenerate groups (n < 2, or zero variance) have no defined z-score;
    # drop them here and in the SQL twin's WHERE so neither side emits
    # inf/nan cast to garbage int64 rows.
    keys, mus, sds = [], [], []
    for r in stats:
        n, s1, s2 = float(r["n"]), float(r["s1"]), float(r["s2"])
        if n < 2.0:
            continue
        var = (s2 - s1 * s1 / n) / (n - 1.0)
        if var <= 0.0:
            continue
        keys.append(r["event_type"])
        mus.append(s1 / n)
        sds.append(float(np.sqrt(var)))
    key_arr = pa.array(keys, pa.string())
    mu_arr = np.asarray(mus, np.float64)
    sd_arr = np.asarray(sds, np.float64)

    def zscore(t: pa.Table) -> pa.Table:
        # tiny-table lookup via pc.index_in — no per-row Python
        # fill_null(-1): rows of dropped degenerate groups give index_in a
        # NULL, which to_numpy would surface as float NaN, not an int index
        idx = (
            pc.fill_null(pc.index_in(t.column("event_type"), value_set=key_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = idx >= 0  # rows of degenerate groups are skipped
        idx = idx[keep]
        v = t.column("value").to_numpy(zero_copy_only=False)[keep]
        z = (v - mu_arr[idx]) / sd_arr[idx]
        zi = np.sign(z * 10_000.0) * np.floor(np.abs(z * 10_000.0) + 0.5)  # DuckDB round: half away from zero
        mask = pa.array(keep)
        return pa.table(
            {
                "event_id": pc.filter(t.column("event_id"), mask).cast(pa.int64()),
                "event_type": pc.filter(t.column("event_type"), mask),
                "z_4dp": pa.array(zi.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(zscore, batch_format="pyarrow")


SQL_EVENTS_ZSCORE = """
WITH s AS (
  SELECT event_type, sum(value) AS s1, sum(value * value) AS s2, count(*) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CAST(round(10000 * ((e.value - s.s1 / s.n)
            / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1.0)))) AS BIGINT) AS z_4dp
FROM events e JOIN s USING (event_type)
WHERE s.n > 1 AND (s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1.0) > 0
"""


def q_doc_compress_ratio(sf_dir: str):
    """Compression-ratio quality signal (zlib bytes-out / bytes-in per
    document, 4-dp scaled int) — the standard cheap detector for
    repetitive / boilerplate text in web-corpus curation (highly
    compressible docs are low quality).  Batch-local, zero shuffle.
    Non-SQL (no zlib in DuckDB) -> rows-only; monotonicity
    (repetitive < random) and determinism pinned in pytest."""
    import zlib

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def ratios(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        out = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):  # doc-granular by necessity (zlib is per-blob)
            raw = s.encode("utf-8")
            out[i] = round(10_000 * len(zlib.compress(raw, 6)) / max(len(raw), 1))
        return pa.table({"doc_id": t.column("doc_id"), "compress_ratio_4dp": pa.array(out, pa.int64())})

    return ds.map_batches(ratios, batch_format="pyarrow")


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (class-centroid curation statistic)
    — see :func:`~goto_eater_crawler_ray.functions.similarity.grouped_centroids`
    for the combiner shape (≤ labels×d partial rows per batch; the
    groupby never moves embeddings)."""
    from ..functions.similarity import grouped_centroids

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["embedding", "label"])
    return grouped_centroids(ds)


SQL_LABEL_CENTROIDS = """
WITH flat AS (
  SELECT label, unnest(embedding) AS e, unnest(range(len(embedding))) AS i
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
       CAST(round(sum(CAST(e AS DOUBLE)) / count(*) * 10000) AS BIGINT) AS centroid_4dp
FROM flat GROUP BY label, i
"""


def q_embedding_pca(sf_dir: str):
    """Top-principal-component projection of every embedding (distributed
    two-moment PCA; the d×d eigenproblem is corpus-size-independent).
    Non-SQL (eigendecomposition) -> rows-only; subspace-equivalence
    pytest vs full-matrix numpy PCA."""
    from ..functions.similarity import pca_project

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return pca_project(ds)


def q_bloom_join_revenue(sf_dir: str):
    """Bloom-filter semi-join reduction (``functions/bloomjoin.py``):
    revenue per high-value order.  The small side (orders >400k) builds a
    broadcast bloom; the corpus-sized lineitem probe drops non-matching
    rows batch-locally BEFORE any exchange, the bounded false positives
    are removed exactly by a broadcast sorted-key membership stage (the
    build side is driver-collected under the same gate that makes the
    bloom buildable, so the exact resolve needs no shuffle join), and
    per-batch revenue partials feed ONE small groupby — the only
    exchange carries ~matching partials.  Result identical to the plain
    SQL join; above the build gate, shard the bloom and use the shuffle
    join instead (see build_bloom_and_keys)."""
    import ray

    from ..functions.bloomjoin import ExactResolve, bloom_filter_probe, build_bloom_and_keys

    orders_small = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)).select(["o_orderkey"]),
            batch_format="pyarrow",
        )
        .materialize()  # small by contract
    )
    bloom_bytes, keys = build_bloom_and_keys(orders_small, "o_orderkey")
    bloom_ref = ray.put(bloom_bytes)
    keys_ref = ray.put(keys)
    probe = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"])
    pruned = bloom_filter_probe(probe, "l_orderkey", bloom_ref).map_batches(
        ExactResolve,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_args=("l_orderkey", keys_ref),
    )

    def partial_rev(t: pa.Table) -> pa.Table:
        # per-ROW integer scaling (the filter_revenue formula verbatim):
        # integer partials sum order-independently, so the distributed
        # aggregation is hash-exact against the SQL twin by construction
        rev = pc.cast(
            pc.round(pc.multiply(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])), 10000.0)),
            pa.int64(),
        )
        df = pd.DataFrame(
            {"l_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False), "rev": rev.to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.table({"l_orderkey": pa.array(g["l_orderkey"].to_numpy(), pa.int64()), "rev": pa.array(g["rev"].to_numpy(), pa.int64())})

    partials = pruned.map_batches(partial_rev, batch_format="pyarrow")
    out = partials.groupby("l_orderkey").aggregate(Sum("rev", alias_name="revenue"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t.column("l_orderkey"), "revenue": pc.cast(t.column("revenue"), pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_BLOOM_JOIN_REVENUE = """
SELECT o.o_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 400000
GROUP BY o.o_orderkey
"""


def q_doc_shuffle(sf_dir: str):
    """Deterministic GLOBAL training-data shuffle: every document's
    position in the md5-keyed pseudo-random order — reproducible across
    runs, widths and repartitioning (position is a pure function of the
    corpus, like the hash splits).  Ranks come from the distributed
    two-pass scan (``functions/scan.py``): key-range partition on the
    64-bit hash, n_parts partition counts to the driver, broadcast
    offsets + local cumsum — one shuffle, no global sort materialized.
    SQL twin: ``row_number() OVER (ORDER BY md5_number_upper(...))``."""
    from ..functions.sampling import md5_u64
    from ..functions.scan import prefix_sum

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id"])

    def with_key(t: pa.Table) -> pa.Table:
        k = md5_u64(t.column("doc_id"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "_skey": pa.array(k, pa.uint64()),
                "_one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )

    ranked = prefix_sum(docs.map_batches(with_key, batch_format="pyarrow"), "_skey", "_one", out_col="shuffle_pos")
    return ranked.select_columns(["doc_id", "shuffle_pos"])


SQL_DOC_SHUFFLE = """
SELECT doc_id,
       row_number() OVER (ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR))) - 1 AS shuffle_pos
FROM documents
"""


def q_heavy_hitters(sf_dir: str):
    """Exact corpus top-20 tokens via the mergeable heavy-hitter sketch +
    exact-recount two-pass (see
    :func:`~goto_eater_crawler_ray.functions.text.heavy_hitter_topk`) —
    the scale path where a full-domain ``groupby(token)`` would shuffle
    every distinct token at 100 TB.  Exact output, so the SQL twin is a
    plain GROUP BY top-k with the same (count DESC, token ASC) tiebreak."""
    from ..functions.text import heavy_hitter_topk

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    return heavy_hitter_topk(ds, k=20, capacity=4096)


SQL_HEAVY_HITTERS = """
WITH toks AS (
  SELECT UNNEST(list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0)) AS token
  FROM documents
)
SELECT token, count(*) AS c FROM toks GROUP BY token ORDER BY c DESC, token LIMIT 20
"""


def q_span_media_resolve(sf_dir: str):
    """Interleaved-payload media-ref resolution: flatten the span documents
    (input_hint shape), keep the image spans, parse the referenced doc id
    OUT of the ``media://{doc}/{offset}`` URI (vectorized regex), and
    hash-join it against the media blob table to attach each blob's byte
    length — the span -> blob-store resolution step every interleaved
    text+media corpus needs before decode.  Both sides are corpus-sized,
    so this is a true distributed hash join with partitions sized to the
    corpus (never a driver lookup)."""
    spans = q_doc_spans_flat(sf_dir)

    def image_refs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "image"))
        ref_doc = pc.struct_field(pc.extract_regex(t.column("media_ref"), r"media://(?P<d>\d+)/"), "d")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "offset": t.column("offset"),
                "media_ref": t.column("media_ref"),
                "ref_doc_id": pc.cast(ref_doc, pa.int64()),
            }
        )

    img = spans.map_batches(image_refs, batch_format="pyarrow")
    media = _docs_as_media(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "m_doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "media_len": pc.cast(pc.binary_length(t.column("media_bytes")), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    n_docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id"]).count()
    n_parts = auto_num_partitions(n_docs)
    joined = img.join(media, join_type="inner", num_partitions=n_parts, on=("ref_doc_id",), right_on=("m_doc_id",))
    return joined.select_columns(["doc_id", "offset", "media_ref", "media_len"])


SQL_SPAN_MEDIA_RESOLVE = """
WITH flat AS (
  WITH words AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS w
    FROM documents
  ),
  spans AS (
    SELECT doc_id,
           CAST(i AS INTEGER) AS "offset"
    FROM words, LATERAL (SELECT UNNEST(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS i)
  )
  SELECT doc_id, "offset",
         'media://' || doc_id || '/' || CAST("offset" AS VARCHAR) AS media_ref
  FROM spans WHERE "offset" % 5 = 4
),
media AS (
  SELECT doc_id AS m_doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS media_len
  FROM documents
)
SELECT f.doc_id, f."offset", f.media_ref, m.media_len
FROM flat f JOIN media m
  ON CAST(regexp_extract(f.media_ref, 'media://(\\d+)/', 1) AS BIGINT) = m.m_doc_id
"""


def q_interval_join_events(sf_dir: str):
    """Broadcast interval (range) join — NO equality key: every event whose
    ts falls inside a 1-hour attribution window anchored at the sampled
    anchor events (event_id % 100 == 0) rolls up into that window's
    (count, sum).  The windows side is distributed-filtered then
    broadcast (hard-gated small); the probe side streams — see
    :func:`~goto_eater_crawler_ray.functions.window.broadcast_interval_join_agg`
    for the scale contract and the large-large binning variant."""
    from ..functions.window import broadcast_interval_join_agg

    # anchor pass prunes to the two columns it needs, and the ts -> int64
    # conversion happens in Arrow (timestamp[us] cast) BEFORE to_pandas, so
    # the unit can never silently diverge from the probe side's cast
    anchors = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "ts"])
        .map_batches(
            lambda t: pa.table(
                {
                    "event_id": t.column("event_id"),
                    "ts_us": pc.cast(t.column("ts"), pa.int64()),
                }
            ).filter(pa.array(t.column("event_id").to_numpy(zero_copy_only=False) % 100 == 0)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    hour_us = 3_600_000_000
    win = pa.table(
        {
            "window_id": pa.array(anchors["event_id"].to_numpy(), pa.int64()),
            "start": pa.array(anchors["ts_us"].to_numpy(), pa.int64()),
            "end": pa.array(anchors["ts_us"].to_numpy() + hour_us, pa.int64()),
        }
    )
    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "value"])
    out = broadcast_interval_join_agg(ev, win, ts_col="ts", value_col="value")
    return out.map_batches(lambda t: _int_scale_col(t, "sum_value", 100), batch_format="pyarrow")


SQL_INTERVAL_JOIN_EVENTS = """
WITH w AS (
  SELECT event_id AS window_id, ts AS ws FROM events WHERE event_id % 100 = 0
)
SELECT w.window_id,
       count(*) AS n_events,
       CAST(round(sum(e.value) * 100) AS BIGINT) AS sum_value
FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 1 HOUR
GROUP BY w.window_id
"""


def q_crawl_pagerank(sf_dir: str):
    """PageRank over the crawl's own link graph (lineage parent -> child
    edges) — the classic crawl-prioritization signal, computed with the
    dataset-native power iteration in functions.graph (one join + one
    groupby-Sum per iteration, dangling mass redistributed).  Returns the
    top pages by rank (url, rank in micro-units).  Non-SQL (iterative
    float) -> rows-only; formula pinned against a local numpy power
    iteration in tests/test_dataops.py::TestPageRank."""
    import tempfile

    from ..functions.graph import pagerank
    from ..sources.pagestore import ScaleSpec
    from .crawl import CrawlEngine

    out = tempfile.mkdtemp(prefix="crawl_pr_")
    eng = CrawlEngine(ScaleSpec.golden(), out, n_seen_shards=2, n_sched_shards=2, n_parts=4)
    eng.run()
    eng.shutdown()
    # sf_dir unused: crawl queries synthesize their corpus.  Lineage is
    # read as a DATASET (never a driver table) so the shape survives a
    # web-scale lineage; sha1 keys fold to int64 node ids per batch.
    lin = rd.read_parquet(os.path.join(out, "lineage"))

    def key64(col) -> np.ndarray:
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        raw = b"".join(v.as_py() or b"\x00" * 20 for v in a)
        if not raw:
            return np.zeros(0, np.int64)
        return np.frombuffer(raw, dtype=np.uint8).reshape(-1, 20)[:, :8].copy().view(np.int64).ravel()

    def to_edges(t: pa.Table) -> pa.Table:
        uk, pk = key64(t.column("url_key")), key64(t.column("parent_key"))
        roots = np.array([(v.as_py() is None) or (v.as_py() == b"\x00" * 20) for v in t.column("parent_key").combine_chunks()], dtype=bool) if t.num_rows else np.zeros(0, bool)
        return pa.table({"src": pa.array(pk[~roots], pa.int64()), "dst": pa.array(uk[~roots], pa.int64())})

    ranks = pagerank(lin.map_batches(to_edges, batch_format="pyarrow"), n_iter=10)

    def to_urls(t: pa.Table) -> pa.Table:
        return pa.table({"node_id": pa.array(key64(t.column("url_key")), pa.int64()), "url": t.column("url")})

    urls = lin.map_batches(to_urls, batch_format="pyarrow")
    named = ranks.join(urls, join_type="inner", num_partitions=4, on=("node",), right_on=("node_id",))

    def scale_rank(t: pa.Table) -> pa.Table:
        micro = pc.cast(pc.round(pc.multiply(t.column("rank"), 1_000_000.0)), pa.int64())
        return pa.table({"url": t.column("url"), "rank_micro": micro})

    return named.map_batches(scale_rank, batch_format="pyarrow").sort(["rank_micro", "url"], descending=[True, False]).limit(50)


def q_decontaminate(sf_dir: str):
    """Train/test DECONTAMINATION (eval-leakage check): which documents
    of the hash-split test set share at least one word 4-gram with the
    train set, and how many distinct 4-grams leak.  The standard
    pre-training hygiene op.

    Shape: 4-grams are exploded batch-locally (windows never cross
    documents); each side is made distinct by ONE groupby (test by
    (doc_id, gram), train by gram), then a single hash join on the gram
    key and a groupby(doc_id) count.  Exchange carries distinct gram
    rows only — never the token stream.  Split membership is the same
    md5-bucket pure function as doc_split, so the SQL twin reproduces
    the exact sets and the hash compare is exact."""
    from ..functions.sampling import md5_buckets
    from ..functions.text import _split_tokens

    N = 4
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    gram_schema = pa.schema([("doc_id", pa.int64()), ("gram", pa.string())])

    def make_grams(lo: int, hi: int, dedup_cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            b = md5_buckets(t.column("doc_id").to_numpy(zero_copy_only=False))
            t = t.filter(pa.array((b >= lo) & (b < hi)))
            if t.num_rows == 0:
                return gram_schema.empty_table()
            parents, toks = _split_tokens(t)
            words = toks.to_pandas().to_numpy()
            m = len(words) - N + 1
            if m <= 0:
                return gram_schema.empty_table()
            ok = np.ones(m, bool)
            for j in range(1, N):
                ok &= parents[j : m + j] == parents[:m]
            s = pd.Series(words[:m][ok])
            for j in range(1, N):
                s = s + " " + pd.Series(words[j : m + j][ok])
            doc_ids_np = t.column("doc_id").to_numpy(zero_copy_only=False)[parents[:m][ok]]
            # batch-LOCAL distinct (the combiner trick): repeated phrases
            # never leave the task, so the exchange carries per-batch
            # DISTINCT gram rows, not every window — measured 40% faster
            # at sf0.1 and the bound that matters at corpus scale
            df = pd.DataFrame({"doc_id": doc_ids_np, "gram": s.to_numpy()}).drop_duplicates(dedup_cols)
            return pa.table(
                {
                    "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                    "gram": pa.array(df["gram"].to_numpy(), pa.string()),
                }
            )

        return fn

    test_g = (
        docs.map_batches(make_grams(90, 100, ["doc_id", "gram"]), batch_format="pyarrow")
        .groupby(["doc_id", "gram"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["doc_id", "gram"])
    )
    train_g = (
        docs.map_batches(make_grams(0, 80, ["gram"]), batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Count(alias_name="_tc"))
        .select_columns(["gram"])
        .map_batches(
            lambda t: t.append_column("_tr", pa.array(np.ones(t.num_rows, np.int8), pa.int8())),
            batch_format="pyarrow",
        )
    )
    # join shuffle sized to the corpus (gram rows ~ tokens - 3 per doc)
    n_parts = auto_num_partitions(docs.count(), rows_per_part=10_000)
    joined = test_g.join(train_g, join_type="inner", num_partitions=n_parts, on=("gram",))
    return joined.groupby("doc_id").aggregate(Count(alias_name="n_shared"))


SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 AS b,
         list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, b,
         unnest(list_transform(range(1, len(ws) - 2), i ->
                list_aggregate(list_slice(ws, i, i + 3), 'string_agg', ' '))) AS gram
  FROM toks
),
test_g AS (SELECT DISTINCT doc_id, gram FROM grams WHERE b >= 90),
train_g AS (SELECT DISTINCT gram FROM grams WHERE b < 80)
SELECT t.doc_id, count(*) AS n_shared
FROM test_g t JOIN train_g USING (gram) GROUP BY t.doc_id
"""


def q_dup_passages(sf_dir: str):
    """Exact duplicate-PASSAGE detection — substring-granularity dedup
    (the Lee-et-al 'Deduplicating Training Data' shape at word-8-gram
    granularity): every 8-gram appearing in >= 2 DISTINCT documents,
    with its distinct-doc and total-occurrence counts — the passages a
    substring-dedup pass would cut out of a pre-training corpus.

    Shape: 8-gram windows exploded batch-locally (windows never cross
    documents, and a document never spans batches, so a per-batch
    (gram, doc_id) combine is globally complete per doc); the exchange
    carries one row per (gram, doc) with its local occurrence count —
    never the token stream — then ONE groupby(gram) yields
    ``n_docs = COUNT(rows)`` and ``n_occ = SUM(occ)``.  At 100-TB scale
    the exchange key would be a u64 content hash with the gram text
    dropped before the shuffle (the md5-family trick used by
    `minhash_pairs_md5`); the string key here keeps the oracle compare
    exact at the same exchange-row count."""
    from ..functions.text import _split_tokens

    N = 8
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    gram_schema = pa.schema([("gram", pa.string()), ("doc_id", pa.int64()), ("occ", pa.int64())])

    def make_grams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return gram_schema.empty_table()
        parents, toks = _split_tokens(t)
        words = toks.to_pandas().to_numpy()
        m = len(words) - N + 1
        if m <= 0:
            return gram_schema.empty_table()
        # parents is nondecreasing (flat token order), so window-start ==
        # window-end parent implies the whole window is one document
        ok = parents[N - 1 : m + N - 1] == parents[:m]
        s = pd.Series(words[:m][ok])
        for j in range(1, N):
            s = s + " " + pd.Series(words[j : m + j][ok])
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[parents[:m][ok]]
        # batch-local (gram, doc) combine: within-doc repeats never leave
        # the task; the exchange carries distinct (gram, doc) rows only
        g = (
            pd.DataFrame({"gram": s.to_numpy(), "doc_id": doc_ids})
            .groupby(["gram", "doc_id"], sort=False)
            .size()
            .reset_index(name="occ")
        )
        return pa.table(
            {
                "gram": pa.array(g["gram"].to_numpy(), pa.string()),
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "occ": pa.array(g["occ"].to_numpy(), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(make_grams, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Count(alias_name="n_docs"), Sum("occ", alias_name="n_occ"))
    )

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n_docs"), 2))
        return pa.table(
            {
                "gram": t.column("gram"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "n_occ": t.column("n_occ").cast(pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_DUP_PASSAGES = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 6), i ->
                list_aggregate(list_slice(ws, i, i + 7), 'string_agg', ' '))) AS gram
  FROM toks
)
SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_occ
FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
"""


def q_near_dedup_filter(sf_dir: str):
    """End-to-end near-dup CURATION: MinHash-LSH pairs -> distributed
    connected components -> keep only each group's minimum doc_id ->
    anti-join the losers out of the corpus.  The op a real training-data
    pipeline runs (dedup_filter's exact twin is oracle-green; this one is
    probabilistic -> rows-only + planted-dup pytest).  Components resolve
    through the size-gated path — see `near_dedup_md5`."""
    from ..functions.dedup import connected_components_gated, minhash_lsh_pairs

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    pairs = minhash_lsh_pairs(docs.select_columns(["doc_id", "text"]), threshold=0.5)
    groups = connected_components_gated(pairs)

    loser_schema = pa.schema([("loser_id", pa.int64()), ("is_dup", pa.int8())])

    def losers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_id"), t.column("group_id")))
        return pa.table(
            {
                "loser_id": t.column("doc_id").cast(pa.int64()),
                "is_dup": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
            },
            schema=loser_schema,
        )

    losers_ds = groups.map_batches(losers, batch_format="pyarrow")
    # an already-clean corpus (zero near-dup pairs) must be a no-op, not a
    # crash: an all-empty losers side reaches the join with no schema
    if losers_ds.count() == 0:
        return docs
    n_parts = auto_num_partitions(docs.count(), cap=64)
    return _null_anti_join(docs, losers_ds, n_parts, on="doc_id", right_on="loser_id", marker="is_dup")


def q_cust_order_distribution(sf_dir: str):
    """TPC-H Q13 shape — distribution of per-customer order counts
    INCLUDING the zero bucket, without ever running the LEFT JOIN the
    SQL spells: orders collapse to (custkey, c_count) in one combiner
    groupby, the distribution is a second tiny groupby over that, and
    the zero-order customer count is pure scalar arithmetic
    (total customers − customers that appear in orders) — every custkey
    in orders references a customer row by data contract, so the two
    engines agree.  Exchanges carry per-customer counts, never orders."""
    per_cust = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
        .materialize()  # feeds BOTH the scalar count and the distribution groupby
    )
    n_with_orders = per_cust.count()
    n_customers = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey"]).count()
    dist = (
        per_cust.groupby("c_count").aggregate(Count(alias_name="custdist"))
        # the aggregate's count columns are int64 on both engines
        .map_batches(
            lambda t: pa.table(
                {"c_count": t.column("c_count").cast(pa.int64()), "custdist": t.column("custdist").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    n_zero = n_customers - n_with_orders
    if n_zero > 0:
        zero = rd.from_arrow(pa.table({"c_count": pa.array([0], pa.int64()), "custdist": pa.array([n_zero], pa.int64())}))
        dist = dist.union(zero)
    return dist


SQL_CUST_ORDER_DISTRIBUTION = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
GROUP BY 1
"""


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — revenue lost to small-quantity orders: total
    extended price of Brand#2 lineitems whose quantity is below 20% of
    that part's average lineitem quantity.  The correlated AVG subquery
    becomes aggregate-first: lineitem is semi-joined to the brand's
    partkeys ONCE (per-part averages are unchanged by the partkey
    restriction, since partkey determines brand), per-part (sum_qc, n)
    come from a combiner groupby of that narrowed stream, and the
    correlated comparison runs as the EXACT integer cross-multiply
    ``5 * qty_c * n < sum_qc`` (q < 0.2·(sum/n) with no float division
    on either engine).  The stats "self-join" never runs as a second
    scan: the branded stream hash-partitions ONCE by partkey % P, and
    each partition computes its parts' (sum, n) AND the correlated
    filter locally in two vectorized passes (per-part stats are complete
    within a partition by construction), emitting one revenue partial.
    Output is the exact centi-unit revenue total."""
    n_rows = pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows
    n_parts = auto_num_partitions(n_rows, cap=64)
    coarse = auto_num_partitions(n_rows)  # the one stats+filter exchange
    brand_parts = (
        rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_brand"])
        .filter(expr="p_brand == 'Brand#2'")
        .map_batches(
            lambda t: pa.table({"p_partkey": t.column("p_partkey").cast(pa.int64())}), batch_format="pyarrow"
        )
    )
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t.column("l_partkey").cast(pa.int64()),
                "qty_c": pa.array(
                    _half_away(t.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0), pa.int64()
                ),
                "price_c": pa.array(
                    _half_away(t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    j = li.join(brand_parts, join_type="inner", num_partitions=n_parts, on=("l_partkey",), right_on=("p_partkey",))

    part_key = coarse_part_key("l_partkey", "_pp", coarse)

    def qualify_part(df: pd.DataFrame) -> pd.DataFrame:
        st = df.groupby("l_partkey")[["qty_c"]].agg(sum_qc=("qty_c", "sum"), n=("qty_c", "size"))
        sum_qc = df["l_partkey"].map(st["sum_qc"]).to_numpy()
        n = df["l_partkey"].map(st["n"]).to_numpy()
        keep = 5 * df["qty_c"].to_numpy() * n < sum_qc
        rev = int(df["price_c"].to_numpy()[keep].sum())
        return pd.DataFrame({"revenue_c": np.array([rev], np.int64)})

    total = (
        j.map_batches(part_key, batch_format="pyarrow")
        .groupby("_pp")
        .map_groups(qualify_part, batch_format="pandas")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
    )
    return pa.table({"revenue_c": pa.array([int(total["revenue_c"] or 0)], pa.int64())})


SQL_SMALL_QTY_REVENUE = """
WITH li AS (
  SELECT l.l_partkey,
         CAST(round(l.l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#2'
), stats AS (
  SELECT l_partkey, CAST(sum(qty_c) AS BIGINT) AS sum_qc, CAST(count(*) AS BIGINT) AS n
  FROM li GROUP BY 1
)
SELECT CAST(coalesce(sum(li.price_c), 0) AS BIGINT) AS revenue_c
FROM li JOIN stats s ON s.l_partkey = li.l_partkey
WHERE 5 * li.qty_c * s.n < s.sum_qc
"""


def q_only_late_supplier(sf_dir: str):
    """TPC-H Q21 shape — suppliers who were the ONLY late supplier on a
    multi-supplier order ("late" = shipped more than 60 days after the
    order date; the synthetic schema has no commit/receipt dates, so the
    lateness predicate adapts while the EXISTS / NOT-EXISTS structure
    is preserved).  Both quantified subqueries collapse to aggregates:
    lineitems dedup to (orderkey, supplier, any-late) pairs, then one
    per-order pass computes distinct-supplier count, distinct-late
    count, and (via a sentinel Max) the identity of the single late
    supplier — EXISTS(other supplier) == n_supp > 1, NOT EXISTS(other
    late supplier) == n_late == 1.  ONE corpus-sized exchange total: the
    lineitem pair-partials and the order dates union into a single
    reduce-side join keyed on orderkey % P (the repo's coarse-hash
    idiom), each partition resolves pair-dedup, lateness, and the
    per-order quantifiers for ALL its orders vectorized, and only the
    bounded (supplier, count) partials leave it.  Top 10 by wait-count."""
    n_rows = pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows
    n_parts = auto_num_partitions(n_rows)  # cap 256: the one big exchange
    LATE_US = 60 * 86_400_000_000  # 60 days in microseconds

    def li_partials(t: pa.Table) -> pa.Table:
        # batch-local pair reduce; sentinel order_us=-1 marks lineitem rows
        df = pd.DataFrame(
            {
                "l_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64),
                "l_suppkey": t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64),
                # normalize the timestamp unit BEFORE int64 (ns-unit inputs
                # would otherwise compare nanoseconds against microseconds)
                "ship_us": t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(),
            }
        )
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False)["ship_us"].max()
        g["order_us"] = np.int64(-1)
        return pa.Table.from_pandas(g, preserve_index=False)

    li = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        li_partials, batch_format="pyarrow"
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "l_suppkey": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                "ship_us": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                "order_us": t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    part_key = coarse_part_key("l_orderkey", "_op", n_parts)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        dates = df[df["order_us"] >= 0].set_index("l_orderkey")["order_us"]
        pairs = df[df["order_us"] < 0].groupby(["l_orderkey", "l_suppkey"], as_index=False)["ship_us"].max()
        # inner-join semantics: drop orphan lines BEFORE the map — a single
        # unmatched key makes Series.map emit NaN and promote the whole
        # cutoff column to float64 AT MAP TIME, and epoch-microseconds
        # (~8e17) exceed 2^53, a ~128µs quantization footgun if sub-second
        # timestamps ever appear; filtering first keeps the lookup int64
        pairs = pairs[pairs["l_orderkey"].isin(dates.index).to_numpy()]
        cutoff = pairs["l_orderkey"].map(dates).to_numpy()
        assert cutoff.dtype == np.int64, cutoff.dtype  # all keys matched -> no float promotion
        late = (pairs["ship_us"].to_numpy() > cutoff + LATE_US).astype(np.int64)
        # masked max: the late supplier's identity, exact when n_late == 1
        pairs = pairs.assign(late=late, ls=np.where(late == 1, pairs["l_suppkey"].to_numpy(), -1))
        po = pairs.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_late=("late", "sum"), late_supp=("ls", "max")
        )
        q = po[(po["n_supp"] > 1) & (po["n_late"] == 1)]
        w = q.groupby("late_supp").size().reset_index(name="numwait").rename(columns={"late_supp": "s_suppkey"})
        return pd.DataFrame(
            {"s_suppkey": w["s_suppkey"].astype(np.int64), "numwait": w["numwait"].astype(np.int64)}
        )

    waits = (
        li.union(orders)
        .map_batches(part_key, batch_format="pyarrow")
        .groupby("_op")
        .map_groups(per_part, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
        .map_batches(
            lambda t: pa.table(
                {"s_suppkey": t.column("s_suppkey").cast(pa.int64()), "numwait": t.column("numwait").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    # ≤10 rows to the driver (the legal kind), then decorate via the
    # broadcast-keys distributed filter over the corpus-scaled supplier
    # dim — same shape as q_top_customers; a distributed join for a
    # 10-row left side would only re-trip the zero-column-block hazard.
    top = waits.sort(["numwait", "s_suppkey"], descending=[True, False]).limit(10).to_pandas()
    if top.empty:  # nobody qualifies → the empty aggregate loses its schema
        return pa.table({"s_suppkey": pa.array([], pa.int64()), "s_name": pa.array([], pa.string()), "numwait": pa.array([], pa.int64())})
    keys = pa.array(top["s_suppkey"].to_numpy(), pa.int64())
    supp = (
        rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["s_suppkey"].cast(pa.int64()), value_set=keys)), batch_format="pyarrow"
        )
        .to_pandas()  # ≤10 dim rows survive the distributed filter
    )
    supp["s_suppkey"] = supp["s_suppkey"].astype(np.int64)
    out = top.merge(supp, on="s_suppkey").sort_values(
        ["numwait", "s_suppkey"], ascending=[False, True], kind="mergesort"
    )
    return out[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


SQL_ONLY_LATE_SUPPLIER = """
WITH pairs AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp, CAST(sum(late) AS BIGINT) AS n_late,
         CAST(max(CASE WHEN late = 1 THEN l_suppkey ELSE -1 END) AS BIGINT) AS late_supp
  FROM pairs GROUP BY 1
), waits AS (
  SELECT late_supp AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
  FROM per_order WHERE n_supp > 1 AND n_late = 1
  GROUP BY 1
  ORDER BY numwait DESC, s_suppkey ASC
  LIMIT 10
)
SELECT w.s_suppkey, s.s_name, w.numwait
FROM waits w JOIN supplier s ON s.s_suppkey = w.s_suppkey
"""


def q_rich_inactive_custs(sf_dir: str):
    """TPC-H Q22 shape — per-nation count and balance total of customers
    whose account balance beats the average POSITIVE balance and who
    never placed an URGENT-priority order (the synthetic schema has no
    phone column, so nationkey stands in for the country-code prefix;
    every synthetic customer has SOME order, so the NOT-EXISTS
    predicate filters on priority to stay non-degenerate).  The scalar AVG
    subquery is a two-scalar aggregate whose comparison runs as the
    exact integer cross-multiply ``bal_c * n > sum_c`` (no float average
    exists on either engine); the NOT EXISTS is Ray's native hash
    LEFT ANTI join against the distinct order-custkey set (both sides
    shuffle by key — no driver set, SURVEY §7.3)."""
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("c_custkey").cast(pa.int64()),
                "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                "bal_c": pa.array(_half_away(t.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # read once, feed the scalar aggregate AND the anti-join
    pos = cust.filter(expr="bal_c > 0")
    agg = pos.aggregate(Sum("bal_c", alias_name="sum_c"), Count(alias_name="n"))
    sum_c, n = int(agg["sum_c"] or 0), int(agg["n"] or 0)
    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(t["bal_c"], n), sum_c)), batch_format="pyarrow"
    )
    ordered = (
        rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])
        .filter(expr="o_orderpriority == '1-URGENT'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_o"))
    )
    n_parts = auto_num_partitions(cust.count(), cap=64)
    # scrub zero-column empty aggregate blocks before the anti-join
    inactive = rich.repartition(n_parts).join(
        ordered.repartition(n_parts), join_type="left_anti", num_partitions=n_parts, on=("c_custkey",), right_on=("o_custkey",)
    )
    return (
        inactive.groupby("c_nationkey")
        .aggregate(Count(alias_name="numcust"), Sum("bal_c", alias_name="totacctbal_c"))
        .map_batches(
            lambda t: pa.table(
                {
                    "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                    "numcust": t.column("numcust").cast(pa.int64()),
                    "totacctbal_c": t.column("totacctbal_c").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


SQL_RICH_INACTIVE_CUSTS = """
WITH c AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
), avgpos AS (
  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, CAST(count(*) AS BIGINT) AS n FROM c WHERE bal_c > 0
)
SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust, CAST(sum(c.bal_c) AS BIGINT) AS totacctbal_c
FROM c, avgpos
WHERE c.bal_c * avgpos.n > avgpos.sum_c
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def _rev_c(t: pa.Table) -> np.ndarray:
    """The one shared revenue expression: round(extprice*(1-disc)*100)."""
    return _half_away(
        t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
        * 100.0
    )


def _nation_names(sf_dir: str) -> tuple[pa.Array, pa.Array]:
    """The 25-row constant nation dim as (keys, names) broadcast arrays."""
    nation = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    return (
        nation.column("n_nationkey").combine_chunks().cast(pa.int64()),
        nation.column("n_name").combine_chunks(),
    )


def q_nation_pair_volume(sf_dir: str):
    """TPC-H Q7 shape — shipping volume between supplier-nation /
    customer-nation pairs by ship year (1996-1997, pairs with distinct
    nations).  The deepest join chain in the suite — lineitem ⋈ supplier
    ⋈ orders ⋈ customer — expressed aggregate-first: after each hash
    join a batch-local pandas combiner collapses the stream to
    (key, supp_nation, year) partials, so every later exchange carries
    partial sums, never the fact stream; the 25-row nation dim resolves
    both name columns via broadcast ``pc.index_in``, never a shuffle."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "l_orderkey": f.column("l_orderkey").cast(pa.int64()),
                    "l_suppkey": f.column("l_suppkey").cast(pa.int64()),
                    "l_year": pc.year(f["l_shipdate"]).cast(pa.int64()),
                    "rev_c": pa.array(_rev_c(f), pa.int64()),
                }
            )
        )(
            t.filter(
                pc.and_(
                    pc.greater_equal(t["l_shipdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
                    pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1998-01-01", "us"))),
                )
            )
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("s_suppkey").cast(pa.int64()), "supp_nat": t.column("s_nationkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def to_order_partials(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_orderkey", "supp_nat", "l_year", "rev_c"])
            .to_pandas()
            .groupby(["l_orderkey", "supp_nat", "l_year"], as_index=False)["rev_c"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # empty ship-date window -> all-empty join side emits zero-column
    # blocks (hazard #1); the probe reads until one row
    if li.limit(1).count() == 0:
        return pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "revenue_c": pa.array([], pa.int64()),
            }
        )
    a = li.join(supp, join_type="inner", num_partitions=n_parts, on=("l_suppkey",), right_on=("s_suppkey",)).map_batches(
        to_order_partials, batch_format="pyarrow"
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t.column("o_orderkey").cast(pa.int64()), "o_custkey": t.column("o_custkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def to_cust_partials(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_custkey", "supp_nat", "l_year", "rev_c"])
            .to_pandas()
            .groupby(["o_custkey", "supp_nat", "l_year"], as_index=False)["rev_c"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # batch-local partials only — a full (custkey, nation, year) groupby
    # here would add a hash all-to-all that the final bounded-domain
    # aggregate makes redundant; the repartition is the zero-column
    # empty-block scrub the next join needs (block coalesce, no hash)
    b = (
        a.join(orders, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",))
        .map_batches(to_cust_partials, batch_format="pyarrow")
        .repartition(n_parts)
    )
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": t.column("c_custkey").cast(pa.int64()), "cust_nat": t.column("c_nationkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    pairs = (
        b.join(cust, join_type="inner", num_partitions=n_parts, on=("o_custkey",), right_on=("c_custkey",))
        .map_batches(
            lambda t: t.select(["supp_nat", "cust_nat", "l_year", "rev_c"]).filter(
                pc.not_equal(t["supp_nat"], t["cust_nat"])
            ),
            batch_format="pyarrow",
        )
        .groupby(["supp_nat", "cust_nat", "l_year"])
        .aggregate(Sum("rev_c", alias_name="revenue_c"))
    )
    keys, names = _nation_names(sf_dir)

    def decorate(t: pa.Table) -> pa.Table:
        si = pc.index_in(t.column("supp_nat").cast(pa.int64()), value_set=keys)
        ci = pc.index_in(t.column("cust_nat").cast(pa.int64()), value_set=keys)
        return pa.table(
            {
                "supp_nation": pc.take(names, si),
                "cust_nation": pc.take(names, ci),
                "l_year": t.column("l_year").cast(pa.int64()),
                "revenue_c": t.column("revenue_c").cast(pa.int64()),
            }
        )

    return pairs.map_batches(decorate, batch_format="pyarrow")


SQL_NATION_PAIR_VOLUME = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND s.s_nationkey != c.c_nationkey
GROUP BY 1, 2, 3
"""


def q_nation_market_share(sf_dir: str):
    """TPC-H Q8 shape — NATION_7's share of revenue sold to ASIA-region
    customers, per order year (orders 1996-1997).  Same aggregate-first
    chain as Q7, but the quotient never leaves integers until the last
    two-row step: per-order partials carry (rev_c, num_c) where num_c is
    the revenue portion from the chosen supplier nation, the customer's
    region resolves from the 25-row broadcast nation dim, and the final
    per-year share is the exact scaled division
    ``round(num_c * 1e6 / den_c)`` (parts-per-million) — the identical
    expression the SQL twin evaluates."""
    SHARE_NATION = 7
    REGION = "ASIA"
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
                "rev_c": pa.array(_rev_c(t), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("s_suppkey").cast(pa.int64()), "supp_nat": t.column("s_nationkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def to_order_partials(t: pa.Table) -> pa.Table:
        rev = t.column("rev_c").to_numpy(zero_copy_only=False)
        nat = t.column("supp_nat").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False),
                "rev_c": rev,
                "num_c": np.where(nat == SHARE_NATION, rev, 0),
            }
        )
        g = df.groupby("l_orderkey", as_index=False)[["rev_c", "num_c"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    a = li.join(supp, join_type="inner", num_partitions=n_parts, on=("l_suppkey",), right_on=("s_suppkey",)).map_batches(
        to_order_partials, batch_format="pyarrow"
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "o_orderkey": f.column("o_orderkey").cast(pa.int64()),
                    "o_custkey": f.column("o_custkey").cast(pa.int64()),
                    "o_year": pc.year(f["o_orderdate"]).cast(pa.int64()),
                }
            )
        )(
            t.filter(
                pc.and_(
                    pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
                    pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1998-01-01", "us"))),
                )
            )
        ),
        batch_format="pyarrow",
    )

    # empty window -> the all-empty right side poisons the join with
    # zero-column blocks (hazard #1); the probe reads until one row
    if orders.limit(1).count() == 0:
        return pa.table({"o_year": pa.array([], pa.int64()), "share_ppm": pa.array([], pa.int64())})

    def to_cust_partials(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_custkey", "o_year", "rev_c", "num_c"])
            .to_pandas()
            .groupby(["o_custkey", "o_year"], as_index=False)[["rev_c", "num_c"]]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # batch-local partials only — the final per-year aggregate is
    # bounded-domain, so a full per-customer groupby before the join
    # would be a redundant hash all-to-all; the repartition is the
    # zero-column empty-block scrub the next join needs
    b = (
        a.join(orders, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",))
        .map_batches(to_cust_partials, batch_format="pyarrow")
        .repartition(n_parts)
    )
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": t.column("c_custkey").cast(pa.int64()), "cust_nat": t.column("c_nationkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    # bounded-domain region membership: 25-row nation ⋈ 5-row region on the driver
    nation = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rmap = {r["r_regionkey"]: r["r_name"] for r in region.to_pylist()}
    asia_keys = pa.array(
        [r["n_nationkey"] for r in nation.to_pylist() if rmap[r["n_regionkey"]] == REGION], pa.int64()
    )
    per_year = (
        b.join(cust, join_type="inner", num_partitions=n_parts, on=("o_custkey",), right_on=("c_custkey",))
        .map_batches(
            lambda t: t.filter(pc.is_in(t["cust_nat"].cast(pa.int64()), value_set=asia_keys)).select(
                ["o_year", "rev_c", "num_c"]
            ),
            batch_format="pyarrow",
        )
        .groupby("o_year")
        .aggregate(Sum("rev_c", alias_name="den_c"), Sum("num_c", alias_name="num_c"))
        .to_pandas()  # |years| rows — bounded, the legal driver materialization
    )
    share = _half_away(per_year["num_c"].to_numpy() * 1e6 / per_year["den_c"].to_numpy())
    out = pa.table(
        {
            "o_year": pa.array(per_year["o_year"].to_numpy(), pa.int64()),
            "share_ppm": pa.array(share, pa.int64()),
        }
    )
    return out


SQL_NATION_MARKET_SHARE = """
WITH per_year AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS den_c,
         CAST(sum(CASE WHEN s.s_nationkey = 7
                       THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS num_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT o_year, CAST(round(num_c * 1e6 / den_c) AS BIGINT) AS share_ppm FROM per_year
"""


def q_part_profit_by_nation(sf_dir: str):
    """TPC-H Q9 shape — revenue from parts whose name contains 'gear' by
    supplier nation and order year (the synthetic schema has no partsupp
    supplycost, so profit degrades to revenue while the join structure —
    part-name restriction, supplier-nation attribution, order-year
    grouping — is preserved).  The part restriction is applied AT THE
    SCAN side and semi-joins lineitem first, so the two later joins see
    only qualifying lines; partials collapse per (order, nation) before
    the orders join."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    gears = (
        rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_name"])
        .map_batches(
            lambda t: pa.table(
                {"p_partkey": t.filter(pc.match_substring(t["p_name"], "gear")).column("p_partkey").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "l_partkey": t.column("l_partkey").cast(pa.int64()),
                "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
                "rev_c": pa.array(_rev_c(t), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    # no matching parts -> all-empty join side emits zero-column blocks
    if gears.limit(1).count() == 0:
        return pa.table(
            {"nation": pa.array([], pa.string()), "o_year": pa.array([], pa.int64()), "profit_c": pa.array([], pa.int64())}
        )
    a = li.join(gears, join_type="inner", num_partitions=n_parts, on=("l_partkey",), right_on=("p_partkey",))
    supp = rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.column("s_suppkey").cast(pa.int64()), "supp_nat": t.column("s_nationkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def to_order_partials(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_orderkey", "supp_nat", "rev_c"])
            .to_pandas()
            .groupby(["l_orderkey", "supp_nat"], as_index=False)["rev_c"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    b = a.join(supp, join_type="inner", num_partitions=n_parts, on=("l_suppkey",), right_on=("s_suppkey",)).map_batches(
        to_order_partials, batch_format="pyarrow"
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "o_year": pc.year(t["o_orderdate"]).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    by_nat = (
        b.join(orders, join_type="inner", num_partitions=n_parts, on=("l_orderkey",), right_on=("o_orderkey",))
        .map_batches(lambda t: t.select(["supp_nat", "o_year", "rev_c"]), batch_format="pyarrow")
        .groupby(["supp_nat", "o_year"])
        .aggregate(Sum("rev_c", alias_name="profit_c"))
    )
    keys, names = _nation_names(sf_dir)

    def decorate(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("supp_nat").cast(pa.int64()), value_set=keys)
        return pa.table(
            {
                "nation": pc.take(names, idx),
                "o_year": t.column("o_year").cast(pa.int64()),
                "profit_c": t.column("profit_c").cast(pa.int64()),
            }
        )

    return by_nat.map_batches(decorate, batch_format="pyarrow")


SQL_PART_PROFIT_BY_NATION = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS profit_c
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
"""


def q_returned_item_customers(sf_dir: str):
    """TPC-H Q10 shape — top-20 customers by revenue on RETURNED
    lineitems (l_returnflag = 'R') for orders placed in 1996Q1.
    Aggregate-first: returned-line revenue collapses per ORDER inside a
    reduce-side union exchange with the window-filtered order stream
    (the ``late_priority_counts`` idiom — the join never runs as its own
    all-to-all), per-customer partials consolidate in one groupby with a
    local top-20 pre-prune before the tiny sort, and the 20 winners
    decorate through the broadcast-keys distributed dim filter (the
    q_top_customers shape — no corpus-sized table ever reaches the
    driver)."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows)

    def li_partials(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], "R"))
        df = pd.DataFrame(
            {
                "l_orderkey": f.column("l_orderkey").cast(pa.int64()).to_numpy(zero_copy_only=False),
                "rev_c": _rev_c(f),
            }
        )
        g = df.groupby("l_orderkey", as_index=False)["rev_c"].sum()
        g["o_custkey"] = np.int64(-1)  # sentinel: lineitem-side row
        return pa.Table.from_pandas(g, preserve_index=False)

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    ).map_batches(li_partials, batch_format="pyarrow")
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "l_orderkey": f.column("o_orderkey").cast(pa.int64()),
                    "rev_c": pa.array(np.zeros(f.num_rows, np.int64), pa.int64()),
                    "o_custkey": f.column("o_custkey").cast(pa.int64()),
                }
            )
        )(
            t.filter(
                pc.and_(
                    pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
                    pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1996-04-01", "us"))),
                )
            )
        ),
        batch_format="pyarrow",
    )

    part_key = coarse_part_key("l_orderkey", "_op", n_parts)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        om = df[df["o_custkey"] >= 0].set_index("l_orderkey")["o_custkey"]
        lv = df[df["o_custkey"] < 0].groupby("l_orderkey")["rev_c"].sum()
        lv = lv[lv.index.isin(om.index)]  # window filter via inner-join semantics
        g = pd.DataFrame({"o_custkey": om.loc[lv.index].to_numpy(), "rev_c": lv.to_numpy()}).groupby(
            "o_custkey", as_index=False
        )["rev_c"].sum()
        return pd.DataFrame({"o_custkey": g["o_custkey"].astype(np.int64), "revenue_c": g["rev_c"].astype(np.int64)})

    totals = (
        li.union(orders)
        .map_batches(part_key, batch_format="pyarrow")
        .groupby("_op")
        .map_groups(per_part, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
    )

    def local_top(t: pa.Table) -> pa.Table:
        # per-block top-20 pre-prune under the (revenue desc, custkey asc)
        # total order — the global top-20 is contained in the union
        df = t.to_pandas().sort_values(["revenue_c", "o_custkey"], ascending=[False, True]).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = (
        totals.map_batches(local_top, batch_format="pyarrow")
        .sort(["revenue_c", "o_custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()  # 20 rows — the legal kind of driver materialization
    )
    if top.empty:
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "revenue_c": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "nation_name": pa.array([], pa.string()),
            }
        )
    keys = pa.array(top["o_custkey"].to_numpy(), pa.int64())
    cust = (
        rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_nationkey"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["c_custkey"].cast(pa.int64()), value_set=keys)), batch_format="pyarrow"
        )
        .to_pandas()  # ≤20 dim rows survive the distributed filter
    )
    cust["c_custkey"] = cust["c_custkey"].astype(np.int64)
    nkeys, nnames = _nation_names(sf_dir)
    nmap = dict(zip(nkeys.to_pylist(), nnames.to_pylist()))
    cust["nation_name"] = cust["c_nationkey"].map(nmap)
    out = (
        top.rename(columns={"o_custkey": "c_custkey"})
        .merge(cust[["c_custkey", "c_name", "nation_name"]], on="c_custkey")
        .sort_values(["revenue_c", "c_custkey"], ascending=[False, True], kind="mergesort")
    )
    return out[["c_custkey", "revenue_c", "c_name", "nation_name"]].reset_index(drop=True)


SQL_RETURNED_ITEM_CUSTOMERS = """
WITH lr AS (
  SELECT l_orderkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
), per_cust AS (
  SELECT o.o_custkey AS c_custkey, CAST(sum(lr.rev_c) AS BIGINT) AS revenue_c
  FROM lr JOIN orders o ON o.o_orderkey = lr.l_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
  ORDER BY revenue_c DESC, c_custkey ASC
  LIMIT 20
)
SELECT p.c_custkey, p.revenue_c, c.c_name, n.n_name AS nation_name
FROM per_cust p JOIN customer c ON c.c_custkey = p.c_custkey
                JOIN nation n   ON n.n_nationkey = c.c_nationkey
ORDER BY p.revenue_c DESC, p.c_custkey ASC
"""


def q_late_priority_counts(sf_dir: str):
    """TPC-H Q12 shape — order counts by lateness class × priority band
    (the synthetic schema has no ship mode or commit date, so the class
    is late/ontime: ANY line shipped more than 60 days after the order
    date).  ONE corpus-sized exchange: per-batch max-shipdate partials
    union with the order (date, priority) stream into a reduce-side
    join keyed on orderkey % P; each partition classifies all its
    orders vectorized and emits 2×2 count partials, so the final
    groupby moves a handful of rows.  Timestamps normalize to int64 µs
    so ns-unit inputs can't skew the comparison."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows)
    LATE_US = 60 * 86_400_000_000

    def li_partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64),
                "ship_us": t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(),
            }
        )
        g = df.groupby("l_orderkey", as_index=False)["ship_us"].max()
        g["order_us"] = np.int64(-1)
        g["o_orderpriority"] = ""
        return pa.Table.from_pandas(g, preserve_index=False)

    li = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]).map_batches(
        li_partials, batch_format="pyarrow"
    )
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "ship_us": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                "order_us": t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )

    part_key = coarse_part_key("l_orderkey", "_op", n_parts)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        om = df[df["order_us"] >= 0].set_index("l_orderkey")
        ls = df[df["order_us"] < 0].groupby("l_orderkey")["ship_us"].max()
        ls = ls[ls.index.isin(om.index)]  # inner-join semantics
        om = om.loc[ls.index]
        late = ls.to_numpy() > om["order_us"].to_numpy() + LATE_US
        high = np.isin(om["o_orderpriority"].to_numpy(), np.array(["1-URGENT", "2-HIGH"]))
        out = pd.DataFrame({"lateness": np.where(late, "late", "ontime"), "high": high, "low": ~high})
        g = out.groupby("lateness", as_index=False).agg(high_orders=("high", "sum"), low_orders=("low", "sum"))
        g["high_orders"] = g["high_orders"].astype(np.int64)
        g["low_orders"] = g["low_orders"].astype(np.int64)
        return g

    return (
        li.union(orders)
        .map_batches(part_key, batch_format="pyarrow")
        .groupby("_op")
        .map_groups(per_part, batch_format="pandas")
        .groupby("lateness")
        .aggregate(Sum("high_orders", alias_name="high_orders"), Sum("low_orders", alias_name="low_orders"))
        .map_batches(
            lambda t: pa.table(
                {
                    "lateness": t.column("lateness"),
                    "high_orders": t.column("high_orders").cast(pa.int64()),
                    "low_orders": t.column("low_orders").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


SQL_LATE_PRIORITY_COUNTS = """
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship FROM lineitem GROUP BY 1
)
SELECT CASE WHEN ls.max_ship > o.o_orderdate + INTERVAL 60 DAY THEN 'late' ELSE 'ontime' END AS lateness,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_orders,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_orders
FROM last_ship ls JOIN orders o ON o.o_orderkey = ls.l_orderkey
GROUP BY 1
"""


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15 shape — the supplier(s) with MAXIMUM revenue in 1996Q1,
    tie-safe like the reference view formulation.  Per-supplier totals
    from one combiner groupby; the global max is a one-scalar aggregate
    to the driver (the legal kind); winners filter distributed against
    that scalar, then the ≤|ties| rows decorate via the broadcast-keys
    dim filter."""
    li = (
        rd.read_parquet(
            _p(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
        )
        .map_batches(
            lambda t: (
                lambda f: pa.table(
                    {"l_suppkey": f.column("l_suppkey").cast(pa.int64()), "rev_c": pa.array(_rev_c(f), pa.int64())}
                )
            )(
                t.filter(
                    pc.and_(
                        pc.greater_equal(t["l_shipdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
                        pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1996-04-01", "us"))),
                    )
                )
            ),
            batch_format="pyarrow",
        )
        .groupby("l_suppkey")
        .aggregate(Sum("rev_c", alias_name="total_revenue_c"))
        .materialize()  # per-supplier totals feed the scalar max AND the winner filter
    )
    mx = li.aggregate(Max("total_revenue_c", alias_name="mx"))["mx"]
    if mx is None:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue_c": pa.array([], pa.int64()),
            }
        )
    winners = li.map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "s_suppkey": f.column("l_suppkey").cast(pa.int64()),
                    "total_revenue_c": f.column("total_revenue_c").cast(pa.int64()),
                }
            )
        )(t.filter(pc.equal(t["total_revenue_c"], mx))),
        batch_format="pyarrow",
    ).to_pandas()  # ≤|ties| rows
    keys = pa.array(winners["s_suppkey"].to_numpy(), pa.int64())
    supp = (
        rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["s_suppkey"].cast(pa.int64()), value_set=keys)), batch_format="pyarrow"
        )
        .to_pandas()
    )
    supp["s_suppkey"] = supp["s_suppkey"].astype(np.int64)
    out = winners.merge(supp, on="s_suppkey").sort_values("s_suppkey", kind="mergesort")
    return out[["s_suppkey", "s_name", "total_revenue_c"]].reset_index(drop=True)


SQL_TOP_SUPPLIER_REVENUE = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT r.s_suppkey, s.s_name, r.total_revenue_c
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_revenue_c = (SELECT max(total_revenue_c) FROM rev)
ORDER BY r.s_suppkey
"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for each query
    embedding, the top-3 most-similar corpus vectors with a DIFFERENT
    label (the near-miss examples a contrastive loss needs).  Same
    broadcast-query matmul + per-batch top-k pre-prune as ``ann_topk``
    (`functions/similarity.py` brute_force_topk) with the label
    constraint applied inside the batch mask — exact, oracle-twinned."""
    from ..functions.similarity import brute_force_topk

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])
    return brute_force_topk(emb, query_ids=list(range(10)), k=3, exclude_same_label=True)


SQL_HARD_NEGATIVES = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS raw_score
  FROM q JOIN embeddings e ON e.vec_id != q.query_id AND e.label != q.ql
),
ranked AS (
  SELECT query_id, neighbor_id, raw_score,
         row_number() OVER (PARTITION BY query_id ORDER BY raw_score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(raw_score, 4) AS score
FROM ranked WHERE rank <= 3
"""


def q_vocab_growth(sf_dir: str):
    """Vocabulary growth curve — cumulative distinct token count over
    doc_id-ordered corpus prefixes (the tokenizer-design op: how fast
    the vocab saturates as the corpus grows).  Same exact linear
    decomposition as ``cumulative_distinct_users``: distinct-over-prefix
    collapses to per-token FIRST doc (one groupby-Min over batch-deduped
    (term, doc) pairs), then per-doc new-token counts, then one
    vectorized cumsum over the tiny first-appearance table (its
    cardinality is bounded by vocab saturation, not the corpus).
    Tokenization is the repo's SQL-twin whitespace split
    (`functions/text.py` _split_tokens)."""
    from ..functions.text import _split_tokens

    def pairs(t: pa.Table) -> pa.Table:
        parents, toks = _split_tokens(t)
        doc = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)[parents]
        return (
            pa.table({"term": toks, "doc": pa.array(doc, pa.int64())})
            .group_by(["term", "doc"])
            .aggregate([])
        )

    first = (
        rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Min("doc", alias_name="fd"))
    )
    per_doc = first.groupby("fd").aggregate(Count(alias_name="n_new"))

    def running(t: pa.Table) -> pa.Table:
        b = t.column("fd").to_numpy(zero_copy_only=False)
        n = t.column("n_new").to_numpy(zero_copy_only=False)
        o = np.argsort(b)
        return pa.table(
            {
                "first_doc": pa.array(b[o], pa.int64()),
                "vocab_size": pa.array(np.cumsum(n[o]).astype(np.int64), pa.int64()),
            }
        )

    # first-appearance-cardinality table: one block for the ordered scan
    return per_doc.repartition(1).map_batches(running, batch_format="pyarrow")


SQL_VOCAB_GROWTH = """
WITH words AS (
  SELECT CAST(doc_id AS BIGINT) AS doc,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0)) AS term
  FROM documents
), f AS (SELECT term, min(doc) AS fd FROM words GROUP BY 1),
d AS (SELECT fd AS first_doc, count(*) AS n_new FROM f GROUP BY 1)
SELECT first_doc, CAST(sum(n_new) OVER (ORDER BY first_doc) AS BIGINT) AS vocab_size FROM d
"""


# the one SQL rendering of _gear_supplier_edges, shared by the three
# graph twins so the Python and SQL graph constructions can't drift apart
_GEAR_EDGES_CTE = """WITH pairs AS (
  SELECT DISTINCT l.l_partkey AS p, l.l_suppkey AS s
  FROM lineitem l JOIN part pt ON pt.p_partkey = l.l_partkey
  WHERE pt.p_name LIKE '%gear%'
),
edges AS (
  SELECT 2 * p AS src, 2 * s + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * s + 1, 2 * p FROM pairs
),"""


def _gear_supplier_edges(sf_dir: str):
    """The bidirectional 'gear'-part ↔ supplier incidence graph shared by
    the three oracle-pinned graph queries (node id = 2·partkey for parts,
    2·suppkey+1 for suppliers — the encoding the SQL twins' pairs/edges
    CTEs mirror).  Distinct pairs from lineitem semi-joined to the
    name-filtered part dim; bidirectional ⇒ dangling-free."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    gears = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_name"]).map_batches(
        lambda t: pa.table(
            {"p_partkey": t.filter(pc.match_substring(t["p_name"], "gear")).column("p_partkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    li = rd.read_parquet(_p(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"]).map_batches(
        lambda t: pa.table(
            {"l_partkey": t.column("l_partkey").cast(pa.int64()), "l_suppkey": t.column("l_suppkey").cast(pa.int64())}
        )
        .group_by(["l_partkey", "l_suppkey"])
        .aggregate([]),
        batch_format="pyarrow",
    )
    pairs = (
        li.join(gears, join_type="inner", num_partitions=n_parts, on=("l_partkey",), right_on=("p_partkey",))
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .repartition(n_parts)  # zero-column empty-block scrub
    )

    def both_ways(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([2 * p, 2 * s + 1]), pa.int64()),
                "dst": pa.array(np.concatenate([2 * s + 1, 2 * p]), pa.int64()),
            }
        )

    return pairs.map_batches(both_ways, batch_format="pyarrow")


def q_supplier_pagerank(sf_dir: str):
    """ORACLE-PINNED distributed PageRank — the iterative graph algorithm
    made hash-checkable: ranks are nano-unit int64 and every edge
    contribution rounds BEFORE the sum (`functions/graph.py`
    pagerank_exact), so integer addition's order-independence makes the
    result bit-identical across partitionings, widths and engines, and
    the DuckDB twin is a 5-iteration unrolled CTE chain evaluating the
    token-identical formula.  Graph: `_gear_supplier_edges` (dangling-
    free by construction).  Output: top-20 suppliers by rank."""
    from ..functions.graph import pagerank_exact

    ranks = pagerank_exact(_gear_supplier_edges(sf_dir), n_iter=5)
    supps = ranks.map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "s_suppkey": pc.divide(pc.subtract(f["node"], 1), 2).cast(pa.int64()),
                    "rank_nano": f.column("rank_nano").cast(pa.int64()),
                }
            )
        )(t.filter(pc.equal(pc.bit_wise_and(t["node"], 1), 1))),
        batch_format="pyarrow",
    )
    return supps.sort(["rank_nano", "s_suppkey"], descending=[True, False]).limit(20)


def _supplier_pagerank_sql(n_iter: int = 5) -> str:
    prev = "pr0"
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(
            # LEFT JOIN + COALESCE keeps nodes with no in-edges at the base
            # term each iteration — matching pagerank_exact's left-outer
            # semantics on legal asymmetric (dangling-free) graphs instead
            # of silently dropping them from the CTE chain
            f"""pr{i} AS (
  SELECT n.node, n.outdeg,
         CAST(150000000 + COALESCE(sum(CAST(round(0.85 * p.r / p.outdeg) AS BIGINT)), 0) AS BIGINT) AS r
  FROM nodes n LEFT JOIN edges e ON e.dst = n.node
               LEFT JOIN {prev} p ON p.node = e.src
  GROUP BY 1, 2
)"""
        )
        prev = f"pr{i}"
    chain = ",\n".join(iters)
    return f"""
{_GEAR_EDGES_CTE}
nodes AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
pr0 AS (SELECT node, outdeg, CAST(1000000000 AS BIGINT) AS r FROM nodes),
{chain}
SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey, r AS rank_nano
FROM {prev} WHERE node % 2 = 1
ORDER BY r DESC, s_suppkey LIMIT 20
"""


SQL_SUPPLIER_PAGERANK = _supplier_pagerank_sql()


def q_supplier_reach(sf_dir: str):
    """ORACLE-PINNED distributed BFS — bounded-hop reachability from a
    seed set: minimum hop distance (0..3) from nation-7 suppliers
    through `_gear_supplier_edges`, reported as a (distance, node-count)
    histogram.  All-integer (hop counts + groupby-Min), so bit-identical
    across widths and engines; the DuckDB twin unrolls the three hops as
    CTEs (`functions/graph.py` bfs_hops; frontier, never graph, is the
    iterated state)."""
    from ..functions.graph import bfs_hops

    seeds = rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "node": pc.add(
                    pc.multiply(
                        t.filter(pc.equal(t["s_nationkey"].cast(pa.int64()), 7)).column("s_suppkey").cast(pa.int64()),
                        2,
                    ),
                    1,
                )
            }
        ),
        batch_format="pyarrow",
    )
    dist = bfs_hops(_gear_supplier_edges(sf_dir), seeds, n_hops=3)
    # ≤n_hops+1 rows — pin_small so an EMPTY seed set (sf0.001 has no
    # nation-7 supplier) can't erase the (d, n_nodes) schema via the
    # aggregate's zero-column empty blocks
    from ..functions.guards import pin_small

    return pin_small(
        dist.groupby("d").aggregate(Count(alias_name="n_nodes")),
        pa.schema([("d", pa.int64()), ("n_nodes", pa.int64())]),
    )


def _supplier_reach_sql(n_hops: int = 3) -> str:
    prev = "d0"
    hops = []
    for i in range(1, n_hops + 1):
        hops.append(
            f"""d{i} AS (
  SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
    SELECT node, d FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.d + 1 AS d FROM {prev} p JOIN edges e ON e.src = p.node
  ) GROUP BY 1
)"""
        )
        prev = f"d{i}"
    chain = ",\n".join(hops)
    return f"""
{_GEAR_EDGES_CTE}
d0 AS (SELECT 2 * s_suppkey + 1 AS node, CAST(0 AS BIGINT) AS d FROM supplier WHERE s_nationkey = 7),
{chain}
SELECT d, CAST(count(*) AS BIGINT) AS n_nodes FROM {prev} GROUP BY 1
"""


SQL_SUPPLIER_REACH = _supplier_reach_sql()


def q_supplier_hits(sf_dir: str):
    """ORACLE-PINNED distributed HITS (Kleinberg hubs/authorities) over
    `_gear_supplier_edges` — the third iterative graph algorithm under
    the exact-oracle gate (after PageRank and BFS): nano-unit int64
    scores, exact integer sum passes, and a per-iteration
    renormalization to max 1e9 via the one shared
    ``round(1e9 * raw / max_raw)`` expression (`functions/graph.py`
    hits_exact).  Output: top-20 suppliers by authority."""
    from ..functions.graph import hits_exact

    scores = hits_exact(_gear_supplier_edges(sf_dir), n_iter=4)
    supps = scores.map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "s_suppkey": pc.divide(pc.subtract(f["node"], 1), 2).cast(pa.int64()),
                    "auth_nano": f.column("auth_nano").cast(pa.int64()),
                }
            )
        )(t.filter(pc.equal(pc.bit_wise_and(t["node"], 1), 1))),
        batch_format="pyarrow",
    )
    return supps.sort(["auth_nano", "s_suppkey"], descending=[True, False]).limit(20)


def _supplier_hits_sql(n_iter: int = 4) -> str:
    prev_h = "h0"
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(
            f"""a{i}r AS (
  SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS raw
  FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY 1
),
h{i}r AS (
  SELECT e.src AS node, CAST(sum(a.raw) AS BIGINT) AS raw
  FROM edges e JOIN a{i}r a ON a.node = e.dst GROUP BY 1
),
a{i} AS (
  SELECT node, CAST(round(1e9 * raw / (SELECT max(raw) FROM a{i}r)) AS BIGINT) AS a FROM a{i}r
),
h{i} AS (
  SELECT node, CAST(round(1e9 * raw / (SELECT max(raw) FROM h{i}r)) AS BIGINT) AS h FROM h{i}r
)"""
        )
        prev_h = f"h{i}"
    chain = ",\n".join(iters)
    return f"""
{_GEAR_EDGES_CTE}
h0 AS (SELECT DISTINCT src AS node, CAST(1000000000 AS BIGINT) AS h FROM edges),
{chain}
SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey, a AS auth_nano
FROM a{n_iter} WHERE node % 2 = 1
ORDER BY a DESC, s_suppkey LIMIT 20
"""


SQL_SUPPLIER_HITS = _supplier_hits_sql()


def q_events_unpivot(sf_dir: str):
    """UNPIVOT / melt (wide -> long): the inverse of ``events_pivot`` —
    the per-user count matrix melts back to (user_id, event_type, n)
    rows, zero cells dropped.  The melt itself is the interesting
    operator: a stateless per-batch numpy repeat/tile over the wide
    rows, embarrassingly parallel, no exchange beyond the pivot's own.
    Round-trip property: unpivot(pivot(events)) == groupby counts."""
    wide = q_events_pivot(sf_dir)
    cols = [f"n_{c}" for c in EVENT_TYPES]
    types_arr = np.array(EVENT_TYPES)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        users = np.repeat(t.column("user_id").to_numpy(zero_copy_only=False), len(cols))
        types = np.tile(types_arr, n)
        vals = np.stack([t.column(c).to_numpy(zero_copy_only=False) for c in cols], axis=1).reshape(-1)
        keep = vals > 0
        return pa.table(
            {
                "user_id": pa.array(users[keep], pa.int64()),
                "event_type": pa.array(types[keep], pa.string()),
                "n": pa.array(vals[keep].astype(np.int64), pa.int64()),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


SQL_EVENTS_UNPIVOT = """
WITH p AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
  FROM events GROUP BY user_id
)
SELECT user_id, replace(event_type, 'n_', '') AS event_type, n
FROM (UNPIVOT p ON n_click, n_error, n_purchase, n_signup, n_view INTO NAME event_type VALUE n)
WHERE n > 0
"""


def q_source_checksum(sf_dir: str):
    """Order-independent per-source content checksum — the pipeline
    data-integrity op (compare two runs / two engines / pre- and
    post-migration copies without sorting anything): per row,
    md5("doc_id:n_chars") reduced mod the Mersenne prime 2^31-1; per
    source, the modular SUM of those row digests.  Modular addition is
    a homomorphism (Σ(h mod M) mod M == (Σh) mod M), so batch partials
    sum mod M locally and one bounded-domain groupby finishes —
    order-, width- and partitioning-independent by construction.  The
    md5 convention is the repo's sampler hash (`functions/sampling.py`
    md5_u64 == DuckDB md5_number_upper)."""
    from ..functions.sampling import md5_u64

    M = 2_147_483_647  # 2^31 - 1: partial sums stay far from int64 overflow

    def partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = [f"{i}:{c}" for i, c in zip(ids, nch)]
        h = (md5_u64(keys) % np.uint64(M)).astype(np.int64)
        df = pd.DataFrame({"source": t.column("source").to_pandas(), "h": h})
        g = df.groupby("source", as_index=False)["h"].sum()
        g["h"] %= M
        return pa.Table.from_pandas(g.assign(n_docs=df.groupby("source").size().to_numpy()), preserve_index=False)

    agg = (
        rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "n_chars", "source"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("h", alias_name="h"), Sum("n_docs", alias_name="n_docs"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "source": t.column("source"),
                "checksum": pa.array(
                    t.column("h").cast(pa.int64()).to_numpy(zero_copy_only=False) % M, pa.int64()
                ),
                "n_docs": t.column("n_docs").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_SOURCE_CHECKSUM = """
SELECT source,
       CAST(sum(md5_number_upper(CAST(doc_id AS VARCHAR) || ':' || CAST(n_chars AS VARCHAR))
                % 2147483647) % 2147483647 AS BIGINT) AS checksum,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1
"""


def q_events_anomaly_days(sf_dir: str):
    """Aggregate-level outlier detection: days whose event count exceeds
    mean + 2·stddev of the per-day counts.  The corpus collapses to the
    tiny per-day count table (one combiner groupby); the threshold test
    then runs driver-side in EXACT integer arithmetic — c > μ + 2σ
    (sample stddev) is cross-multiplied to
    ``d > 0 AND d²·(n−1) > 4·n·(n·S2 − S²)`` with ``d = n·c − S`` —
    python bigints here, HUGEINT in the twin, so no float ever exists
    on either engine."""
    per_day = (
        rd.read_parquet(_p(sf_dir, "events"), columns=["ts"])
        .map_batches(
            lambda t: pa.table(
                {
                    "day": pc.divide(
                        pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")), pa.int64()),
                        86_400_000_000,
                    ).cast(pa.int64())
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()  # |days| rows — bounded, the legal driver materialization
    )
    days = per_day["day"].to_numpy()
    counts = [int(c) for c in per_day["n_events"]]
    n, s, s2 = len(counts), sum(counts), sum(c * c for c in counts)
    out_days, out_counts = [], []
    if n >= 2:
        for d_, c_ in zip(days, counts):
            dd = n * c_ - s
            if dd > 0 and dd * dd * (n - 1) > 4 * n * (n * s2 - s * s):
                out_days.append(int(d_))
                out_counts.append(c_)
    order = np.argsort(out_days) if out_days else []
    return pa.table(
        {
            "day": pa.array([out_days[i] for i in order], pa.int64()),
            "n_events": pa.array([out_counts[i] for i in order], pa.int64()),
        }
    )


SQL_EVENTS_ANOMALY_DAYS = """
WITH d AS (
  SELECT CAST(floor(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), st AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(n_events) AS HUGEINT) AS s,
         CAST(sum(n_events * n_events) AS HUGEINT) AS s2
  FROM d
)
SELECT d.day, d.n_events
FROM d, st
WHERE st.n >= 2
  AND (st.n * d.n_events - st.s) > 0
  AND (st.n * d.n_events - st.s) * (st.n * d.n_events - st.s) * (st.n - 1)
      > 4 * st.n * (st.n * st.s2 - st.s * st.s)
"""


# ---------------------------------------------------------------------------
# TPC-H Q2/Q11/Q20 over a DERIVED partsupp: the synthetic schema has no
# partsupp table, so both engines derive the identical pair-level view from
# lineitem — cost_c = min centi-price, qty = total shipped quantity per
# (partkey, suppkey) — and the three queries' join/quantifier structure runs
# unchanged on top of it.  With these, all 22 TPC-H query shapes exist.
# ---------------------------------------------------------------------------


def _partsupp_partials(sf_dir: str):
    """BATCH-LOCAL pair partials (l_partkey, l_suppkey, cost_c, qty) of
    the derived partsupp view — min-of-batch cost / sum-of-batch qty per
    pair, NOT globally combined: every consumer finishes the reduction
    inside its own partkey-keyed exchange anyway (min of minima / sum of
    sums are associative), so a global (partkey, suppkey) groupby here
    would be a redundant all-to-all."""

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t.column("l_partkey").cast(pa.int64()).to_numpy(zero_copy_only=False),
                "l_suppkey": t.column("l_suppkey").cast(pa.int64()).to_numpy(zero_copy_only=False),
                "cost_c": _half_away(t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0),
                "qty": _half_away(t.column("l_quantity").to_numpy(zero_copy_only=False)),
            }
        )
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
            cost_c=("cost_c", "min"), qty=("qty", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    ).map_batches(partials, batch_format="pyarrow")


def _derived_partsupp(sf_dir: str, n_parts: int):
    """(l_partkey, l_suppkey, cost_c, qty) — the fully combined derived
    partsupp view, for consumers that need EXACT DISTINCT pairs (the
    graph edge lists); aggregate-first consumers should take
    :func:`_partsupp_partials` and fold the combine into their own
    partkey exchange."""
    return (
        _partsupp_partials(sf_dir)
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Min("cost_c", alias_name="cost_c"), Sum("qty", alias_name="qty"))
        .repartition(n_parts)  # scrub zero-column empty aggregate blocks before joins
    )


SQL_DERIVED_PARTSUPP = """
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cost_c,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
"""


def _nation_supplier_keys(sf_dir: str, nations: list[int]) -> pa.Array:
    """Suppkeys of the given nations via the distributed broadcast filter
    (supplier is corpus-scaled; only the matching keys reach the driver
    — bounded by the nation's supplier share)."""
    nk = pa.array(nations, pa.int64())
    keys = (
        rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
        .map_batches(
            lambda t: pa.table(
                {"k": t.filter(pc.is_in(t["s_nationkey"].cast(pa.int64()), value_set=nk)).column("s_suppkey").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if "k" not in keys.columns:  # all-empty result loses its schema (Ray empty-block quirk)
        return pa.array([], pa.int64())
    return pa.array(keys["k"].to_numpy(), pa.int64())


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape — for each size-15 'gear' part, the EUROPE supplier
    offering the MINIMUM derived cost, top-100 by (balance desc, …).
    The correlated MIN subquery collapses to a per-part Min aggregate
    joined back on equality; region membership broadcasts as a suppkey
    filter (bounded by the region's supplier share); the ≤100 winners
    decorate via the broadcast-keys dim filter."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    # EUROPE nation keys from the 25-row constant dims
    nation = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey", "n_name"])
    region = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rmap = {r["r_regionkey"]: r["r_name"] for r in region.to_pylist()}
    eu_nations = [r["n_nationkey"] for r in nation.to_pylist() if rmap[r["n_regionkey"]] == "EUROPE"]
    eu_supps = _nation_supplier_keys(sf_dir, eu_nations)

    target_parts = (
        rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_name", "p_size"])
        .map_batches(
            lambda t: pa.table(
                {
                    "p_partkey": t.filter(
                        pc.and_(pc.match_substring(t["p_name"], "gear"), pc.equal(t["p_size"], 15))
                    )
                    .column("p_partkey")
                    .cast(pa.int64())
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(2)  # zero-column empty-block scrub: at tiny scale the
        # gear+size-15 filter can empty EVERY block, and the join's shuffle
        # then loses the right side's p_partkey schema (ArrowInvalid)
    )
    # batch-local pair partials only — the per-part reducer below combines
    # them (min of minima) inside the same partkey exchange, so the global
    # pair groupby the derived view would run is a redundant all-to-all
    ps = _partsupp_partials(sf_dir).map_batches(
        lambda t: t.filter(pc.is_in(t["l_suppkey"].cast(pa.int64()), value_set=eu_supps)), batch_format="pyarrow"
    )
    ps = ps.join(target_parts, join_type="inner", num_partitions=max(2, n_parts // 4), on=("l_partkey",), right_on=("p_partkey",))

    # coarse-hash the partkey domain (the small_qty_revenue idiom): the
    # group-call count is O(coarse), not O(parts), and per-part minima are
    # complete within a coarse group by construction
    coarse = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows)

    part_key = coarse_part_key("l_partkey", "_pp", coarse)

    def min_per_part(df: pd.DataFrame) -> pd.DataFrame:
        # combine pair partials (min of batch minima), then each part's
        # min cost + the winning suppliers at that cost
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)["cost_c"].min()
        m = g.groupby("l_partkey")["cost_c"].transform("min")
        w = g[g["cost_c"] == m.to_numpy()]
        return pd.DataFrame(
            {
                "p_partkey": w["l_partkey"].astype(np.int64).to_numpy(),
                "s_suppkey": w["l_suppkey"].astype(np.int64).to_numpy(),
                "cost_c": w["cost_c"].astype(np.int64).to_numpy(),
            }
        )

    winners = (
        ps.map_batches(part_key, batch_format="pyarrow")
        .groupby("_pp")
        .map_groups(min_per_part, batch_format="pandas")
        .to_pandas()
    )
    if winners.empty:
        return pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "s_suppkey": pa.array([], pa.int64()),
                "cost_c": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "bal_c": pa.array([], pa.int64()),
                "nation_name": pa.array([], pa.string()),
            }
        )
    keys = pa.array(winners["s_suppkey"].unique(), pa.int64())
    supp = (
        rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["s_suppkey"].cast(pa.int64()), value_set=keys)), batch_format="pyarrow"
        )
        .to_pandas()
    )
    supp["s_suppkey"] = supp["s_suppkey"].astype(np.int64)
    supp["bal_c"] = _half_away(supp["s_acctbal"].to_numpy() * 100.0)
    nmap = {r["n_nationkey"]: r["n_name"] for r in nation.to_pylist()}
    supp["nation_name"] = supp["s_nationkey"].map(nmap)
    out = winners.merge(supp[["s_suppkey", "s_name", "bal_c", "nation_name"]], on="s_suppkey")
    out = out.sort_values(
        ["bal_c", "nation_name", "s_name", "p_partkey"], ascending=[False, True, True, True], kind="mergesort"
    ).head(100)
    return out[["p_partkey", "s_suppkey", "cost_c", "s_name", "bal_c", "nation_name"]].reset_index(drop=True)


SQL_MIN_COST_SUPPLIER = f"""
WITH ps AS ({SQL_DERIVED_PARTSUPP}),
eu AS (
  SELECT s.s_suppkey, s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_c, n.n_name AS nation_name
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
                  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
tp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%' AND p_size = 15),
cand AS (
  SELECT ps.l_partkey AS p_partkey, ps.l_suppkey AS s_suppkey, ps.cost_c
  FROM ps JOIN tp ON tp.p_partkey = ps.l_partkey
          JOIN eu ON eu.s_suppkey = ps.l_suppkey
),
win AS (
  SELECT c.* FROM cand c
  WHERE c.cost_c = (SELECT min(c2.cost_c) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
)
SELECT w.p_partkey, w.s_suppkey, w.cost_c, e.s_name, e.bal_c, e.nation_name
FROM win w JOIN eu e ON e.s_suppkey = w.s_suppkey
ORDER BY e.bal_c DESC, e.nation_name, e.s_name, w.p_partkey
LIMIT 100
"""


def q_important_stock(sf_dir: str):
    """TPC-H Q11 shape — parts whose derived stock value (Σ cost_c·qty
    over one nation's suppliers) exceeds 1/10000 of that nation's total.
    The scalar-subquery threshold is a one-scalar aggregate compared by
    exact integer cross-multiply ``value_c * 10000 > total_c`` (python
    bigints / HUGEINT — value products overflow int64 by design)."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    supps = _nation_supplier_keys(sf_dir, [7])

    def part_value(df: pd.DataFrame) -> pd.DataFrame:
        # combine pair partials in-partition (min cost / sum qty per
        # pair), THEN value = cost·qty — the product needs the combined
        # pair, so the fold must happen before it; cost_c·qty fits int64
        # comfortably (≤ 2^47 per pair), the 10000× threshold products
        # run as python bigints below
        g = df.groupby("l_suppkey").agg(cost_c=("cost_c", "min"), qty=("qty", "sum"))
        v = int((g["cost_c"].to_numpy() * g["qty"].to_numpy()).sum())
        return pd.DataFrame(
            {"l_partkey": np.array([df["l_partkey"].iloc[0]], np.int64), "value_c": np.array([v], np.int64)}
        )

    per_part = (
        _partsupp_partials(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.is_in(t["l_suppkey"].cast(pa.int64()), value_set=supps)),
            batch_format="pyarrow",
        )
        .groupby("l_partkey")
        .map_groups(part_value, batch_format="pandas")
        .to_pandas()  # |parts-with-nation-7-suppliers| rows — dim-bounded
    )
    if per_part.empty or "value_c" not in per_part.columns:  # no nation-7 pairs: schema-losing empty result
        return pa.table({"p_partkey": pa.array([], pa.int64()), "value_c": pa.array([], pa.int64())})
    total = sum(int(v) for v in per_part["value_c"])
    keep = [
        (int(p), int(v)) for p, v in zip(per_part["l_partkey"], per_part["value_c"]) if int(v) * 10000 > total
    ]
    keep.sort(key=lambda r: (-r[1], r[0]))
    return pa.table(
        {
            "p_partkey": pa.array([r[0] for r in keep], pa.int64()),
            "value_c": pa.array([r[1] for r in keep], pa.int64()),
        }
    )


SQL_IMPORTANT_STOCK = f"""
WITH ps AS ({SQL_DERIVED_PARTSUPP}),
nat AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = 7),
pv AS (
  SELECT ps.l_partkey AS p_partkey, CAST(sum(ps.cost_c * ps.qty) AS BIGINT) AS value_c
  FROM ps JOIN nat ON nat.s_suppkey = ps.l_suppkey
  GROUP BY 1
)
SELECT p_partkey, value_c FROM pv
WHERE CAST(value_c AS HUGEINT) * 10000 > (SELECT CAST(sum(value_c) AS HUGEINT) FROM pv)
ORDER BY value_c DESC, p_partkey
"""


def q_dominant_suppliers(sf_dir: str):
    """TPC-H Q20 shape — MAJOR suppliers of nation 7 for 'gear' parts:
    their derived pair volume exceeds a tenth of the part's total
    shipped volume (the availqty-threshold quantifier adapted to the
    derived view; the synthetic data spreads parts near-uniformly over
    many suppliers, so a majority threshold would be vacuous).  Per-part totals ride with the pairs through ONE
    (partkey)-keyed map_groups — in-partition by construction — and the
    qualifying supplier set dedups in a bounded groupby before the
    broadcast-keys name decorate."""
    n_parts = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows, cap=64)
    supps = _nation_supplier_keys(sf_dir, [7])
    gears = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_name"]).map_batches(
        lambda t: pa.table(
            {"p_partkey": t.filter(pc.match_substring(t["p_name"], "gear")).column("p_partkey").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    # batch-local pair partials only — the reducer combines them (sum of
    # sums) inside the same partkey exchange the quantifier needs anyway
    ps = _partsupp_partials(sf_dir).join(
        gears, join_type="inner", num_partitions=max(2, n_parts // 4), on=("l_partkey",), right_on=("p_partkey",)
    )
    supp_set = set(supps.to_pylist())
    # coarse-hash the partkey domain (the small_qty_revenue idiom): the
    # group-call count is O(coarse), not O(parts in corpus), and per-part
    # stats stay complete within a coarse group by construction
    coarse = auto_num_partitions(pq.ParquetFile(_p(sf_dir, "lineitem")).metadata.num_rows)

    part_key = coarse_part_key("l_partkey", "_pp", coarse)

    def dominant(df: pd.DataFrame) -> pd.DataFrame:
        # combine pair partials, then each part's FULL volume needs every
        # supplier's qty — co-located here by the coarse hash — while only
        # nation-7 pairs can qualify
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)["qty"].sum()
        tot = g.groupby("l_partkey")["qty"].transform("sum")
        w = g[g["l_suppkey"].isin(supp_set) & (10 * g["qty"] > tot.to_numpy())]
        return pd.DataFrame({"s_suppkey": w["l_suppkey"].astype(np.int64).to_numpy()})

    q = (
        ps.map_batches(part_key, batch_format="pyarrow")
        .groupby("_pp")
        .map_groups(dominant, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Count(alias_name="n_parts_dominated"))
        .to_pandas()  # ≤|nation-7 suppliers| rows
    )
    if q.empty:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "n_parts_dominated": pa.array([], pa.int64()),
            }
        )
    keys = pa.array(q["s_suppkey"].to_numpy(), pa.int64())
    supp = (
        rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["s_suppkey"].cast(pa.int64()), value_set=keys)), batch_format="pyarrow"
        )
        .to_pandas()
    )
    supp["s_suppkey"] = supp["s_suppkey"].astype(np.int64)
    out = q.merge(supp, on="s_suppkey").sort_values("s_suppkey", kind="mergesort")
    out["n_parts_dominated"] = out["n_parts_dominated"].astype(np.int64)
    return out[["s_suppkey", "s_name", "n_parts_dominated"]].reset_index(drop=True)


SQL_DOMINANT_SUPPLIERS = f"""
WITH ps AS ({SQL_DERIVED_PARTSUPP}),
gear AS (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'),
gp AS (SELECT ps.* FROM ps JOIN gear g ON g.p_partkey = ps.l_partkey),
tot AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS tot_qty FROM gp GROUP BY 1),
q AS (
  SELECT gp.l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS n_parts_dominated
  FROM gp JOIN tot ON tot.l_partkey = gp.l_partkey
          JOIN supplier s ON s.s_suppkey = gp.l_suppkey
  WHERE s.s_nationkey = 7 AND 10 * gp.qty > tot.tot_qty
  GROUP BY 1
)
SELECT q.s_suppkey, s.s_name, q.n_parts_dominated
FROM q JOIN supplier s ON s.s_suppkey = q.s_suppkey
ORDER BY q.s_suppkey
"""


def q_doc_fluency(sf_dir: str, max_vocab: int = 4_000_000):
    """Corpus-LM fluency scoring — the perplexity-filter shape of a
    training-data pipeline (train an n-gram LM on the corpus, score
    every document, drop the gibberish tail) with EXACT cross-engine
    arithmetic: per adjacent token pair, the add-one-smoothed bigram
    probability ``(c_bigram+1)/(c_context+V)`` scaled to ppm — division
    and multiplication are correctly-rounded IEEE ops, so the doubles
    agree bit-for-bit where a transcendental log (true perplexity)
    would not — and per doc the mean term, both roundings shared with
    the twin.  Shape: two count groupbys train the LM; the count tables
    (vocabulary-scale, HARD-GATED by ``max_vocab``) broadcast once via
    ``ray.put``; scoring is a stateless pass — a doc's pairs live
    inside its own batch row, so per-doc sums are batch-local and no
    scoring exchange exists.  Docs with < 2 tokens have no bigrams and
    are excluded (mirrored by the twin's join)."""
    import ray

    from ..functions.text import _split_tokens

    def pair_partials(t: pa.Table) -> pa.Table:
        parents, toks = _split_tokens(t)
        tk = toks.to_numpy(zero_copy_only=False)
        same = parents[1:] == parents[:-1]  # adjacent within the same doc
        df = pd.DataFrame({"w1": tk[:-1][same], "w2": tk[1:][same]})
        g = df.groupby(["w1", "w2"], as_index=False).size().rename(columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    big = (
        docs.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
        .materialize()  # feeds the gate count AND the broadcast pull
    )
    n_big = big.count()
    if n_big > max_vocab:
        raise ValueError(
            f"doc_fluency: {n_big} distinct bigrams exceeds max_vocab={max_vocab}; "
            "swap the broadcast for a distributed join of pairs on (w1, w2)"
        )
    big_pd = big.to_pandas()  # vocabulary-scale (gated), NOT corpus-scale
    # context counts and V derive from the same bigram table (tiny, local)
    uni_pd = big_pd.groupby("w1", as_index=False)["c"].sum()
    v_total = int(
        docs.map_batches(
            lambda t: pa.table({"term": _split_tokens(t)[1]}).group_by("term").aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Count(alias_name="_n"))
        .count()
    )
    key_arr = pa.array((big_pd["w1"] + "\x00" + big_pd["w2"]).to_numpy(), pa.string())
    cb_arr = big_pd["c"].to_numpy().astype(np.int64)
    uni_key = pa.array(uni_pd["w1"].to_numpy(), pa.string())
    cu_arr = uni_pd["c"].to_numpy().astype(np.int64)
    ref = ray.put((key_arr, cb_arr, uni_key, cu_arr))

    def score(t: pa.Table) -> pa.Table:
        kb, cb, ku, cu = ray.get(ref)
        parents, toks = _split_tokens(t)
        tk = toks.to_numpy(zero_copy_only=False)
        same = parents[1:] == parents[:-1]
        p_doc = parents[:-1][same]
        w1, w2 = tk[:-1][same], tk[1:][same]
        if len(w1) == 0:  # batch of bigram-less docs: nothing to score
            return pa.table({"doc_id": pa.array([], pa.int64()), "fluency_ppm": pa.array([], pa.int64())})
        bi = pc.fill_null(
            pc.index_in(
                pa.array(np.char.add(np.char.add(w1.astype(str), "\x00"), w2.astype(str)), pa.string()),
                value_set=kb,
            ),
            -1,
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        un = pc.fill_null(pc.index_in(pa.array(w1, pa.string()), value_set=ku), -1).to_numpy(zero_copy_only=False).astype(np.int64)
        c_b = np.where(bi >= 0, cb[bi], 0).astype(np.float64)
        c_u = np.where(un >= 0, cu[un], 0).astype(np.float64)
        term = _half_away(1e6 * (c_b + 1.0) / (c_u + float(v_total)))
        n = t.num_rows
        sums = np.bincount(p_doc, weights=term, minlength=n).astype(np.int64)
        cnts = np.bincount(p_doc, minlength=n).astype(np.int64)
        keep = cnts > 0
        flu = _half_away(sums[keep].astype(np.float64) / cnts[keep])
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()).filter(pa.array(keep)),
                "fluency_ppm": pa.array(flu, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


SQL_DOC_FLUENCY = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS t
  FROM documents
),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2),
uni AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c FROM big GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS n
      FROM (SELECT unnest(t) AS term FROM toks)),
terms AS (
  SELECT p.doc_id,
         CAST(round(1e6 * (b.c + 1) / (u.c + v.n)) AS BIGINT) AS term
  FROM pairs p
  JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
  JOIN uni u ON u.w1 = p.w1
  CROSS JOIN v
)
SELECT doc_id, CAST(round(CAST(sum(term) AS DOUBLE) / count(*)) AS BIGINT) AS fluency_ppm
FROM terms GROUP BY 1
"""


def q_gopher_quality(sf_dir: str):
    """Gopher-style multi-rule quality signals + conjunctive gate (Rae et
    al. 2021 §A1.1 adapted to this corpus): word-count bounds, mean/max
    word-length rules and a minimum stopword count, all vectorized in one
    whitespace split per batch (``functions/text.py gopher_rules_batch``)
    with the flag emitted as int64 so the cross-engine hash is exact."""
    from ..functions.text import gopher_rules_batch

    return rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        gopher_rules_batch, batch_format="pyarrow"
    )


def q_gopher_filter(sf_dir: str):
    """The curation GATE on top of ``gopher_quality``: keep only documents
    passing every Gopher rule (the corpus-shrinking step of a training-
    data pipeline) — a stateless vectorized filter, no exchange."""

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("gopher_pass"), 1))

    return q_gopher_quality(sf_dir).map_batches(keep, batch_format="pyarrow")


SQL_GOPHER_QUALITY = """
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       round(list_sum(list_transform(words, w -> length(w))) * 1.0 / greatest(len(words), 1), 6) AS mean_word_len,
       CAST(coalesce(list_max(list_transform(words, w -> length(w))), 0) AS BIGINT) AS max_word_len,
       CAST(len(regexp_extract_all(text, '\\b(the|a|of|to|and)\\b')) AS BIGINT) AS n_stop,
       CAST((len(words) BETWEEN 30 AND 80)
        AND round(list_sum(list_transform(words, w -> length(w))) * 1.0 / greatest(len(words), 1), 6) BETWEEN 4.2 AND 4.8
        AND coalesce(list_max(list_transform(words, w -> length(w))), 0) <= 7
        AND len(regexp_extract_all(text, '\\b(the|a|of|to|and)\\b')) >= 2 AS BIGINT) AS gopher_pass
FROM (SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS words
      FROM documents)
"""

SQL_GOPHER_FILTER = f"SELECT * FROM ({SQL_GOPHER_QUALITY}) g WHERE gopher_pass = 1"


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) — cluster-bucketed embedding
    near-duplicate REMOVAL, the scale path for semantic dedup: assign
    every vector to its nearest frozen centroid (`_kmeans_frozen.py`
    literals, the same model `kmeans_assign` pins), shuffle once by
    cluster, resolve exact pairwise cosine INSIDE each cluster, and keep
    a row iff no earlier row of its cluster has cosine >= 0.35.  The
    quadratic search is bounded to cluster-local blocks (hard-gated;
    at corpus scale k grows so clusters stay bounded).  Deterministic
    end-to-end, so the keep-set is fully oracle-checked: the DuckDB twin
    rebuilds the assignment from the same centroid literals and takes
    the same within-cluster earlier-neighbor rule."""
    from ..functions.dedup import semantic_dedup_keep
    from ._kmeans_frozen import CENTROIDS

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return semantic_dedup_keep(emb, CENTROIDS, threshold=0.35)


def _semantic_dedup_sql(threshold: float = 0.35) -> str:
    from ._kmeans_frozen import CENTROIDS

    values = ",\n    ".join(
        "({}, CAST([{}] AS DOUBLE[]))".format(i, ", ".join(repr(float(v)) for v in row))
        for i, row in enumerate(CENTROIDS)
    )
    return f"""
WITH cent(cid, v) AS (
  SELECT * FROM (VALUES
    {values}
  )
),
sims AS (
  SELECT e.vec_id, c.cid,
         list_inner_product(CAST(e.embedding AS DOUBLE[]), c.v) AS s
  FROM embeddings e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, CAST(min(cid) FILTER (WHERE s = ms) AS BIGINT) AS cluster
  FROM (SELECT vec_id, cid, s, max(s) OVER (PARTITION BY vec_id) AS ms FROM sims)
  GROUP BY vec_id
),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) >= {threshold!r}
)
SELECT a.vec_id, a.cluster FROM assign a
WHERE a.vec_id NOT IN (SELECT vec_id FROM dup)
"""


SQL_SEMANTIC_DEDUP = _semantic_dedup_sql()


def q_dsir_score(sf_dir: str):
    """DSIR importance scoring (Xie et al. 2023, arXiv:2302.03169) —
    end-to-end IN-PIPELINE: pass 1 estimates the hashed unigram+bigram
    bucket distributions of the TARGET domain (lang='en') and the RAW
    corpus in one streaming combiner pass (≤256 partial rows per batch,
    one tiny groupby), pass 2 broadcast-scores every document as the
    exact int64 sum of per-bucket micro-unit log importance weights
    round(1e6·ln(((t_b+1)(R+B))/((r_b+1)(T+B)))) — one ln of one double
    ratio of exact-int products, so the DuckDB twin hash-checks the
    whole trained-then-applied model (`functions/importance.py`)."""
    from ..functions.importance import dsir_score, dsir_weights, gram_distribution

    dist_in = rd.read_parquet(_p(sf_dir, "documents"), columns=["text", "lang"])
    n_target, n_raw = gram_distribution(dist_in, target_langs=("en",))
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return dsir_score(docs, dsir_weights(n_target, n_raw))


# shared CTE chain: tokenize → gram occurrences → dense bucket counts →
# micro-unit log weights → per-doc integer score (0 for gram-less docs)
_SQL_DSIR_SCORES_CTE = """
WITH toks AS (
  SELECT doc_id, lang, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, lang, unnest(ws) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i)
),
occ AS (SELECT doc_id, lang, CAST(md5_number_upper(g) % 256 AS BIGINT) AS b FROM grams),
cnt AS (
  SELECT r.b,
         coalesce(sum(CASE WHEN o.lang = 'en' THEN 1 ELSE 0 END), 0) AS t,
         count(o.b) AS r_
  FROM (SELECT unnest(range(256)) AS b) r LEFT JOIN occ o ON o.b = r.b
  GROUP BY r.b
),
tot AS (SELECT sum(t) AS tt, sum(r_) AS rr FROM cnt),
w AS (
  SELECT c.b, CAST(round(ln(CAST((c.t + 1) * (tot.rr + 256) AS DOUBLE)
                          / CAST((c.r_ + 1) * (tot.tt + 256) AS DOUBLE)) * 1000000) AS BIGINT) AS wt
  FROM cnt c CROSS JOIN tot
),
scores AS (
  SELECT d.doc_id, CAST(coalesce(s.sc, 0) AS BIGINT) AS dsir_score
  FROM documents d LEFT JOIN (
    SELECT o.doc_id, sum(w.wt) AS sc FROM occ o JOIN w USING (b) GROUP BY 1
  ) s USING (doc_id)
)
"""

SQL_DSIR_SCORE = _SQL_DSIR_SCORES_CTE + "SELECT doc_id, dsir_score FROM scores"


def q_dsir_select(sf_dir: str):
    """Greedy top-k DSIR selection: the 200 documents with the highest
    importance score (ties → doc_id asc) — the deterministic selection
    variant; per-block top-k pre-prune bounds the global sort input."""
    scored = q_dsir_score(sf_dir)
    k = 200

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        df = t.to_pandas().sort_values(["dsir_score", "doc_id"], ascending=[False, True], kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .sort(["dsir_score", "doc_id"], descending=[True, False])
        .limit(k)
    )


SQL_DSIR_SELECT = _SQL_DSIR_SCORES_CTE + "SELECT doc_id, dsir_score FROM scores ORDER BY dsir_score DESC, doc_id LIMIT 200"


def q_dsir_resample(sf_dir: str):
    """DSIR Gumbel-top-k RESAMPLING (the paper's sampler, sampling
    ∝ exp(score), made deterministic): resample_key = dsir_score +
    round(1e6·(-ln(-ln(u)))) with u a per-doc md5 uniform — exact int64
    addition, so membership is a pure function of the corpus + keys and
    the twin hash-checks the SAMPLE, not just its size."""
    from ..functions.importance import dsir_resample, dsir_weights, gram_distribution

    dist_in = rd.read_parquet(_p(sf_dir, "documents"), columns=["text", "lang"])
    n_target, n_raw = gram_distribution(dist_in, target_langs=("en",))
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return dsir_resample(docs, dsir_weights(n_target, n_raw), k=200)


SQL_DSIR_RESAMPLE = _SQL_DSIR_SCORES_CTE + """,
noise AS (
  SELECT doc_id,
         CAST(round(-ln(-ln((md5_number_upper(CAST(doc_id AS VARCHAR)) % 1000000 + 0.5) / 1000000.0)) * 1000000) AS BIGINT) AS gm
  FROM documents
)
SELECT s.doc_id, s.dsir_score, CAST(s.dsir_score + n.gm AS BIGINT) AS resample_key
FROM scores s JOIN noise n USING (doc_id)
ORDER BY resample_key DESC, s.doc_id LIMIT 200
"""


def q_nb_classify(sf_dir: str):
    """Multinomial Naive Bayes language classifier, trained AND applied
    in-pipeline over the same hashed unigram+bigram feature space as DSIR
    (`functions/importance.py:nb_train/nb_predict`): training is ONE
    streaming combiner pass (per-batch (label,bucket,n) partials, ≤C×256
    rows/batch, one tiny groupby — NB's weights are closed-form from
    counts, no iterations), prediction broadcasts the C×256 int64 weight
    matrix and takes an exact integer argmax (ties → lexicographically
    smallest label).  The twin re-derives the identical model in SQL, so
    the hash check covers train + apply end-to-end."""
    from ..functions.importance import nb_predict, nb_train

    train = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    labels, w, bias = nb_train(train, label_col="lang")
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return nb_predict(docs, labels, w, bias, emit_score=True)


# shared NB CTE chain: tokenize → gram occurrences → per-(label, bucket)
# counts → dense micro-unit log-likelihood weights + log-prior bias →
# per-(doc, label) integer score → argmax prediction
_SQL_NB_PRED_CTE = """
WITH toks AS (
  SELECT doc_id, lang, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, lang, unnest(ws) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i)
),
occ AS (SELECT doc_id, lang, CAST(md5_number_upper(g) % 256 AS BIGINT) AS b FROM grams),
classes AS (SELECT lang AS label, count(*) AS n_docs FROM documents GROUP BY 1),
gcnt AS (SELECT lang AS label, b, count(*) AS n FROM occ GROUP BY 1, 2),
w AS (
  SELECT c.label, r.b,
         CAST(round(ln(CAST(coalesce(g.n, 0) + 1 AS DOUBLE)
                     / CAST(coalesce(t.t, 0) + 256 AS DOUBLE)) * 1000000) AS BIGINT) AS wt
  FROM classes c
  CROSS JOIN (SELECT unnest(range(256)) AS b) r
  LEFT JOIN gcnt g ON g.label = c.label AND g.b = r.b
  LEFT JOIN (SELECT label, sum(n) AS t FROM gcnt GROUP BY 1) t ON t.label = c.label
),
bias AS (
  SELECT label,
         CAST(round(ln(CAST(n_docs AS DOUBLE)
                     / CAST((SELECT sum(n_docs) FROM classes) AS DOUBLE)) * 1000000) AS BIGINT) AS bz
  FROM classes
),
cscore AS (
  SELECT d.doc_id, bi.label, CAST(bi.bz + coalesce(s.sc, 0) AS BIGINT) AS score
  FROM documents d CROSS JOIN bias bi
  LEFT JOIN (
    SELECT o.doc_id, w.label, sum(w.wt) AS sc FROM occ o JOIN w USING (b) GROUP BY 1, 2
  ) s ON s.doc_id = d.doc_id AND s.label = bi.label
),
pred AS (
  SELECT doc_id, label AS pred, score AS nb_score
  FROM cscore
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label ASC) = 1
)
"""

SQL_NB_CLASSIFY = _SQL_NB_PRED_CTE + "SELECT doc_id, pred, nb_score FROM pred"


def q_nb_confusion(sf_dir: str):
    """Confusion matrix of the self-trained NB classifier: (true lang,
    predicted label, n_docs) — the tiny end-to-end aggregate a curation
    run reports to judge whether the cheap classifier is usable."""
    from ray.data.aggregate import Count

    from ..functions.importance import nb_predict, nb_train

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    labels, w, bias = nb_train(docs, label_col="lang")
    return nb_predict(docs, labels, w, bias, carry_cols=("lang",)).groupby(["lang", "pred"]).aggregate(
        Count(alias_name="n_docs")
    )


SQL_NB_CONFUSION = _SQL_NB_PRED_CTE + """
SELECT d.lang, p.pred, count(*) AS n_docs
FROM pred p JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


def q_lm_perplexity(sf_dir: str):
    """CCNet-style LM perplexity scoring (Wenzek et al., LREC 2020),
    trained AND applied in-pipeline: pass 1 fits an add-one-smoothed
    hashed-bucket BIGRAM LM in ONE streaming combiner pass (per-batch
    (u,v,n) pair-count partials, ≤B²+B rows/batch, one tiny groupby —
    the LM is closed-form from counts), pass 2 broadcasts the B+B² int64
    micro-unit NLL tables (~0.5 MB in the task closure) and emits each
    document's exact integer total NLL and half-away-rounded average —
    the deterministic stand-in for log-perplexity, so the DuckDB twin
    hash-checks the whole train-then-score model (`functions/lm.py`)."""
    from ..functions.lm import lm_doc_nll, lm_nll_weights, lm_train

    train = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    nll1, nll2 = lm_nll_weights(*lm_train(train))
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return lm_doc_nll(docs, nll1, nll2)


# shared CTE chain: tokenize → bucketed token occurrences + adjacent
# pairs → dense add-one NLL weight tables (B + B² rows) → per-doc exact
# integer NLL + half-away-rounded average (0 for token-less docs)
_SQL_LM_SCORED_CTE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
occ AS (
  SELECT doc_id, CAST(md5_number_upper(unnest(ws)) % 256 AS BIGINT) AS b FROM toks
),
prs AS (
  SELECT doc_id,
         CAST(md5_number_upper(ws[i]) % 256 AS BIGINT) AS u,
         CAST(md5_number_upper(ws[i + 1]) % 256 AS BIGINT) AS v
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i)
),
c1 AS (SELECT b, count(*) AS c FROM occ GROUP BY 1),
tot AS (SELECT count(*) AS n FROM occ),
c2 AS (SELECT u, v, count(*) AS c FROM prs GROUP BY 1, 2),
ctx AS (SELECT u, sum(c) AS c FROM c2 GROUP BY 1),
w1 AS (
  SELECT r.b,
         CAST(round(ln(CAST(tot.n + 256 AS DOUBLE) / CAST(coalesce(c1.c, 0) + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS wt
  FROM (SELECT unnest(range(256)) AS b) r CROSS JOIN tot LEFT JOIN c1 USING (b)
),
w2 AS (
  SELECT uu.b AS u, vv.b AS v,
         CAST(round(ln(CAST(coalesce(ctx.c, 0) + 256 AS DOUBLE) / CAST(coalesce(c2.c, 0) + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS wt
  FROM (SELECT unnest(range(256)) AS b) uu
  CROSS JOIN (SELECT unnest(range(256)) AS b) vv
  LEFT JOIN ctx ON ctx.u = uu.b
  LEFT JOIN c2 ON c2.u = uu.b AND c2.v = vv.b
),
firsts AS (SELECT doc_id, CAST(md5_number_upper(ws[1]) % 256 AS BIGINT) AS b FROM toks WHERE len(ws) > 0),
doc_n AS (SELECT doc_id, count(*) AS n FROM occ GROUP BY 1),
doc_nll AS (
  SELECT d.doc_id,
         CAST(coalesce(o.n, 0) AS BIGINT) AS n_toks,
         CAST(coalesce(f.wt, 0) + coalesce(p.wt, 0) AS BIGINT) AS nll_micro
  FROM documents d
  LEFT JOIN (SELECT fs.doc_id, w1.wt FROM firsts fs JOIN w1 ON w1.b = fs.b) f USING (doc_id)
  LEFT JOIN (SELECT prs.doc_id, sum(w2.wt) AS wt FROM prs JOIN w2 ON w2.u = prs.u AND w2.v = prs.v GROUP BY 1) p USING (doc_id)
  LEFT JOIN doc_n o USING (doc_id)
),
scored AS (
  SELECT doc_id, n_toks, nll_micro,
         CASE WHEN n_toks > 0
              THEN CAST(round(CAST(nll_micro AS DOUBLE) / CAST(n_toks AS DOUBLE)) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS avg_nll_micro
  FROM doc_nll
)
"""

SQL_LM_PERPLEXITY = _SQL_LM_SCORED_CTE + "SELECT doc_id, n_toks, nll_micro, avg_nll_micro FROM scored"


def q_ccnet_buckets(sf_dir: str):
    """CCNet's head/middle/tail quality partitioning (Wenzek et al.,
    LREC 2020 §3): score every document with the in-pipeline bigram LM
    (`q_lm_perplexity`), compute per-language TERTILE thresholds as
    EXACT order statistics (rank floor((n-1)·q/3)+1 via the value-range
    rank machinery — the scored table is exchanged once, no global
    sort, only |langs|×2 threshold rows reach the driver), then a
    stateless labeling pass.  The twin re-derives LM + thresholds +
    labels in SQL, so the hash check covers the full curation split."""
    from ..functions.lm import ccnet_buckets, lm_doc_nll, lm_nll_weights, lm_train

    train = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    nll1, nll2 = lm_nll_weights(*lm_train(train))
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    return ccnet_buckets(lm_doc_nll(docs, nll1, nll2, carry_cols=("lang",)))


def q_winnow_fingerprints(sf_dir: str):
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — MOSS): word 4-gram md5 hashes, window of 8, rightmost
    minimum per window; any shared ≥11-word substring between two docs
    is guaranteed to share a fingerprint while only ~2/(w+1) of the
    k-grams are kept.  ONE streaming map_batches pass — selection is
    batch-local (windows never cross documents), the token stream never
    shuffles (`functions/winnow.py`).  The twin replays the selection
    with a window-function min + rightmost-position join, so the hash
    check pins the exact selected sets."""
    from ..functions.winnow import winnow_fingerprints

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return winnow_fingerprints(docs)


# shared CTE: tokenize → 4-gram hashes at 1-based positions → winnowing
# window starts j (all full windows; short docs get the single j=1
# truncated window) → rightmost minimum per window → distinct selections
_SQL_WINNOW_FPS_CTE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
kg AS (
  SELECT doc_id, i AS pos,
         CAST(md5_number_upper(list_aggregate(list_slice(ws, i, i + 3), 'string_agg', ' '))
              % 2305843009213693952 AS BIGINT) AS h
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i)
),
wins AS (
  SELECT doc_id, pos AS j,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mn,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM kg
  QUALIFY j <= greatest(m - 7, 1)
),
sel AS (
  SELECT w.doc_id, w.j, max(k.pos) AS pos, w.mn AS fp
  FROM wins w JOIN kg k ON k.doc_id = w.doc_id AND k.pos BETWEEN w.j AND w.j + 7 AND k.h = w.mn
  GROUP BY 1, 2, 4
),
fps AS (SELECT DISTINCT doc_id, pos, fp FROM sel)
"""

SQL_WINNOW_FINGERPRINTS = _SQL_WINNOW_FPS_CTE + "SELECT doc_id, pos, fp FROM fps"


def q_winnow_dup_pairs(sf_dir: str):
    """MOSS similarity report over the winnowing fingerprints: document
    pairs sharing >= 2 distinct fingerprints with the shared count —
    fingerprints made distinct per (doc, fp) by one groupby, pairs
    emitted inside COARSE fp-hash partitions (O(coarse) group calls,
    pandas self-merge inside), counted by one groupby.  Hot-fingerprint
    f² fan-out is the documented band-bucket hazard; at corpus scale a
    doc-frequency cap drops boilerplate fingerprints before pairing."""
    from ..functions.winnow import winnow_dup_pairs

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return winnow_dup_pairs(docs, min_shared=2)


SQL_WINNOW_DUP_PAIRS = _SQL_WINNOW_FPS_CTE + """,
dfp AS (SELECT DISTINCT doc_id, fp FROM fps)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM dfp a JOIN dfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking (LBFS/FastCDC shape, Muthitacharoen et
    al. SOSP 2001): token-level chunks cut where md5(token) % 16 == 0
    or at doc end, identified by the md5 of the chunk text — the
    storage-dedup primitive under a corpus store; shared content keeps
    producing identical chunks across documents regardless of offset.
    ONE streaming map_batches pass, batch-local, the text never
    shuffles (`functions/cdc.py`)."""
    from ..functions.cdc import cdc_chunks

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return cdc_chunks(docs)


# shared CTE: tokenize → per-token close flags → within-doc exclusive
# cumulative chunk index → per-chunk token count + md5 identity
_SQL_CDC_CHUNKS_CTE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
tk AS (
  SELECT doc_id, i, ws[i] AS w,
         CASE WHEN md5_number_upper(ws[i]) % 16 = 0 OR i = len(ws) THEN 1 ELSE 0 END AS closes
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i)
),
ck AS (
  SELECT doc_id, i, w,
         CAST(1 + coalesce(sum(closes) OVER (PARTITION BY doc_id ORDER BY i
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_idx
  FROM tk
),
chunks AS (
  SELECT doc_id, chunk_idx, count(*) AS n_toks,
         CAST(md5_number_upper(string_agg(w, ' ' ORDER BY i)) % 2305843009213693952 AS BIGINT) AS chunk_hash
  FROM ck GROUP BY 1, 2
)
"""

SQL_CDC_CHUNKS = _SQL_CDC_CHUNKS_CTE + "SELECT doc_id, chunk_idx, n_toks, chunk_hash FROM chunks"


def q_cdc_dedup_ratio(sf_dir: str):
    """CDC dedup accounting over the whole corpus, ONE summary row:
    total chunks, distinct chunk identities, total tokens, and tokens
    saved by single-instancing each distinct chunk (min-length
    occurrence kept — deterministic under hash collision, mirrored in
    the twin).  Exchange = one row per chunk keyed by the 8-byte hash,
    combiner-first; 4 scalars reach the driver."""
    from ..functions.cdc import cdc_dedup_stats

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return cdc_dedup_stats(docs)


SQL_CDC_DEDUP_RATIO = _SQL_CDC_CHUNKS_CTE + """,
per_hash AS (
  SELECT chunk_hash, count(*) AS n_occ, sum(n_toks) AS sum_t, min(n_toks) AS min_t
  FROM chunks GROUP BY 1
)
SELECT CAST(sum(n_occ) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(sum_t) AS BIGINT) AS n_toks_total,
       CAST(sum(sum_t - min_t) AS BIGINT) AS n_toks_saved
FROM per_hash
"""


def q_source_overlap(sf_dir: str):
    """Cross-SOURCE contamination matrix (the between-dump overlap
    check a Common-Crawl-style pipeline runs before mixing snapshots):
    for every pair of sources, the number of distinct word 8-grams they
    share and the exact gram-set Jaccard in micro-units.

    Shape: 8-grams exploded batch-locally with a per-batch (source,
    gram) combine; ONE groupby makes the sets distinct; per-source set
    sizes are a |sources|-row broadcast; pairs are emitted inside
    COARSE gram-hash partitions (O(coarse) group calls, pandas
    self-merge inside — the per-gram fan-out is bounded by |sources|²)
    and counted by one groupby.  The token stream never shuffles."""
    from ..functions.importance import _round_half_away
    from ..functions.sampling import md5_u64
    from ..functions.text import _split_tokens

    N = 8
    coarse = 256
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])
    gram_schema = pa.schema([("source", pa.string()), ("gram", pa.string())])

    def make_grams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return gram_schema.empty_table()
        parents, toks = _split_tokens(t)
        words = toks.to_pandas().to_numpy()
        m = len(words) - N + 1
        if m <= 0:
            return gram_schema.empty_table()
        ok = parents[N - 1 : m + N - 1] == parents[:m]
        s = pd.Series(words[:m][ok])
        for j in range(1, N):
            s = s + " " + pd.Series(words[j : m + j][ok])
        srcs = t.column("source").to_pandas().to_numpy()[parents[:m][ok]]
        df = pd.DataFrame({"source": srcs, "gram": s.to_numpy()}).drop_duplicates()
        return pa.table(
            {"source": pa.array(df["source"].to_numpy(), pa.string()), "gram": pa.array(df["gram"].to_numpy(), pa.string())}
        )

    dg = (
        docs.map_batches(make_grams, batch_format="pyarrow")
        .groupby(["source", "gram"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["source", "gram"])
        .materialize()  # branch point: set sizes + pair emission
    )
    # per-source distinct-gram set sizes: |sources| rows — legal driver step
    sizes = {r["source"]: int(r["n"]) for r in dg.groupby("source").aggregate(Count(alias_name="n")).take_all()}

    def add_coarse(t: pa.Table) -> pa.Table:
        g = t.column("gram").to_pandas().to_numpy()
        return t.append_column("_pp", pa.array((md5_u64(g) % np.uint64(coarse)).astype(np.int64), pa.int64()))

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        p = df[["gram", "source"]].merge(df[["gram", "source"]], on="gram", suffixes=("_a", "_b"))
        p = p[p["source_a"] < p["source_b"]]
        g = p.groupby(["source_a", "source_b"], sort=False).size().reset_index(name="n")
        return pd.DataFrame({"source_a": g["source_a"], "source_b": g["source_b"], "n": g["n"].to_numpy(np.int64)})

    pairs = (
        dg.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_pp")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                    "jaccard_micro": pa.array([], pa.int64()),
                }
            )
        a = t.column("source_a").to_pandas().map(sizes).to_numpy(np.float64)
        b = t.column("source_b").to_pandas().map(sizes).to_numpy(np.float64)
        s = t.column("n_shared").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = _round_half_away(1_000_000.0 * s / (a + b - s))
        return t.append_column("jaccard_micro", pa.array(jac, pa.int64()))

    return pairs.map_batches(fin, batch_format="pyarrow")


SQL_SOURCE_OVERLAP = """
WITH toks AS (
  SELECT source, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT source,
         unnest(list_transform(range(1, len(ws) - 6), i ->
                list_aggregate(list_slice(ws, i, i + 7), 'string_agg', ' '))) AS gram
  FROM toks
),
dg AS (SELECT DISTINCT source, gram FROM grams),
sizes AS (SELECT source, count(*) AS n FROM dg GROUP BY 1),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM dg a JOIN dg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.n_shared,
       CAST(round(1000000.0 * s.n_shared / CAST(pa.n + pb.n - s.n_shared AS DOUBLE)) AS BIGINT) AS jaccard_micro
FROM shared s JOIN sizes pa ON pa.source = s.source_a JOIN sizes pb ON pb.source = s.source_b
"""


def q_pq_codes(sf_dir: str):
    """Product-quantization ENCODE against frozen codebooks
    (Jégou/Douze/Schmid TPAMI 2011; `_pq_frozen.py`: m=8 subspaces ×
    k=16 codes × 8 dims, trained offline on the sf0.01 embeddings):
    every vector compresses 64 float32 → 8 bytes of codes.  One
    streaming pass, one (n,16) matmul per subspace against the ~8 KB
    broadcast codebooks; argmin ||x_s−c||² == argmin(||c||²−2·x_s·c)
    with ties to the lowest code.  The twin scores the IDENTICAL
    literals (`functions/similarity.py:pq_encode`)."""
    from ..functions.similarity import pq_encode
    from ._pq_frozen import CC, CODEBOOKS

    return pq_encode(rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]), CODEBOOKS, cc=CC)


def _pq_cb_values() -> str:
    from ._pq_frozen import CC, CODEBOOKS

    return ",\n    ".join(
        "({}, {}, {}, CAST([{}] AS DOUBLE[]))".format(
            s, c, repr(float(CC[s][c])), ", ".join(repr(float(v)) for v in CODEBOOKS[s][c])
        )
        for s in range(len(CODEBOOKS))
        for c in range(len(CODEBOOKS[s]))
    )


def _pq_codes_cte() -> str:
    # scored: ||c||² - 2·x_s·c per (vector, subspace, codeword) from the
    # frozen literals; best: lowest score, ties to the lowest code
    return f"""
WITH cb(s, c, cc, cent) AS (
  SELECT * FROM (VALUES
    {_pq_cb_values()}
  )
),
scored AS (
  SELECT e.vec_id, cb.s AS subspace, cb.c AS code,
         cb.cc - 2.0 * list_inner_product(list_slice(CAST(e.embedding AS DOUBLE[]), cb.s * 8 + 1, cb.s * 8 + 8), cb.cent) AS score
  FROM embeddings e CROSS JOIN cb
),
best AS (
  SELECT vec_id, subspace, code
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id, subspace ORDER BY score, code) = 1
)
"""


def _pq_codes_sql() -> str:
    return _pq_codes_cte() + "SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(subspace AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code FROM best"


SQL_PQ_CODES = _pq_codes_sql()


def q_pq_adc_topk(sf_dir: str):
    """PQ asymmetric-distance search (the PQ paper's ADC): top-10
    corpus vectors nearest the frozen query, distance = exact int64 sum
    of the frozen per-subspace micro-unit lookup entries
    ``LUT[s, code_s]`` — codes and distance computed in the same batch
    pass (no shuffle), per-block top-k prune bounds the global sort.
    The integer sum is order-independent, so the twin joining the
    identical LUT literals hash-matches exactly."""
    from ..functions.similarity import pq_adc_topk
    from ._pq_frozen import CC, CODEBOOKS, LUT

    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return pq_adc_topk(emb, CODEBOOKS, CC, LUT, k_top=10)


def _pq_adc_sql() -> str:
    from ._pq_frozen import LUT

    lut_values = ",\n    ".join(
        f"({s}, {c}, {int(LUT[s][c])})" for s in range(LUT.shape[0]) for c in range(LUT.shape[1])
    )
    return (
        _pq_codes_cte()
        + f""",
lut(s, c, d_micro) AS (
  SELECT * FROM (VALUES
    {lut_values}
  )
)
SELECT CAST(b.vec_id AS BIGINT) AS vec_id, CAST(sum(l.d_micro) AS BIGINT) AS adc_micro
FROM best b JOIN lut l ON l.s = b.subspace AND l.c = b.code
GROUP BY 1
ORDER BY adc_micro, vec_id
LIMIT 10
"""
    )


SQL_PQ_ADC_TOPK = _pq_adc_sql()


def q_source_kl(sf_dir: str):
    """Per-SOURCE distribution drift: KL(source ‖ corpus) over the
    hashed unigram+bigram bucket space (the domain-mixture monitor a
    pretraining pipeline runs to spot a snapshot whose content shifted
    — the same 256-bucket feature space as DSIR).  ONE streaming
    combiner pass (per-batch (source, bucket, n) partials, ≤|srcs|×256
    rows/batch, one tiny groupby); the ≤|srcs|×256 count table reaches
    the driver and the KL is closed-form from it.

    EXACT protocol: with add-one smoothing, per (source, bucket)
    term_micro = round(1e6 · p_b · ln(p_b/q_b)) where
    p_b = (s_b+1)/(S+B), q_b = (c_b+1)/(C+B) — ONE double expression
    of exact-int ratios, half-away rounded, summed as int64 (order-
    independent), so the DuckDB twin hash-checks every source's score.
    Output: (source, kl_micro, n_grams)."""
    from ..functions.importance import _EXACT_DOUBLE, _round_half_away, gram_buckets_batch

    n_buckets = 256
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def partials(t: pa.Table) -> pa.Table:
        parents, buckets = gram_buckets_batch(t, n_buckets)
        if len(buckets) == 0:
            return pa.table(
                {"source": pa.array([], pa.string()), "b": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        srcs = t.column("source").to_pandas().to_numpy()[parents]
        g = pd.DataFrame({"source": srcs, "b": buckets}).groupby(["source", "b"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "source": pa.array(g["source"].to_numpy(), pa.string()),
                "b": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    cnt = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |sources| × 256 rows — the legal small driver materialization
    )
    sources = sorted(cnt["source"].unique())
    si = pd.Categorical(cnt["source"], categories=sources).codes.astype(np.int64)
    mat = np.zeros((len(sources), n_buckets), np.int64)
    np.add.at(mat, (si, cnt["b"].to_numpy()), cnt["n"].to_numpy())
    corpus = mat.sum(axis=0)
    S = mat.sum(axis=1)  # per-source gram totals
    C = int(corpus.sum())
    assert C + n_buckets < _EXACT_DOUBLE
    p = (mat + 1).astype(np.float64) / (S + n_buckets)[:, None].astype(np.float64)
    q = (corpus + 1).astype(np.float64) / np.float64(C + n_buckets)
    terms = _round_half_away(1e6 * p * np.log(p / q[None, :]))
    kl = terms.sum(axis=1)
    return pa.table(
        {
            "source": pa.array(sources, pa.string()),
            "kl_micro": pa.array(kl, pa.int64()),
            "n_grams": pa.array(S, pa.int64()),
        }
    )


SQL_SOURCE_KL = """
WITH toks AS (
  SELECT source, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT source, unnest(ws) AS g FROM toks
  UNION ALL
  SELECT source, ws[i] || ' ' || ws[i + 1] AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i)
),
occ AS (SELECT source, CAST(md5_number_upper(g) % 256 AS BIGINT) AS b FROM grams),
srcs AS (SELECT DISTINCT source FROM documents),
cnt AS (
  SELECT s.source, r.b, CAST(count(o.b) AS BIGINT) AS n
  FROM srcs s CROSS JOIN (SELECT unnest(range(256)) AS b) r
  LEFT JOIN occ o ON o.source = s.source AND o.b = r.b
  GROUP BY 1, 2
),
stot AS (SELECT source, sum(n) AS st FROM cnt GROUP BY 1),
ctot AS (SELECT b, sum(n) AS cb FROM cnt GROUP BY 1),
tot AS (SELECT sum(n) AS ct FROM cnt),
terms AS (
  SELECT c.source,
         CAST(round(1000000 * (CAST(c.n + 1 AS DOUBLE) / CAST(s.st + 256 AS DOUBLE))
                    * ln((CAST(c.n + 1 AS DOUBLE) / CAST(s.st + 256 AS DOUBLE))
                         / (CAST(ct2.cb + 1 AS DOUBLE) / CAST(t.ct + 256 AS DOUBLE)))) AS BIGINT) AS term
  FROM cnt c
  JOIN stot s USING (source)
  JOIN ctot ct2 USING (b)
  CROSS JOIN tot t
)
SELECT tm.source, CAST(sum(tm.term) AS BIGINT) AS kl_micro, CAST(s.st AS BIGINT) AS n_grams
FROM terms tm JOIN stot s USING (source)
GROUP BY 1, 3
"""


def q_zipf_fit(sf_dir: str):
    """Zipf's-law fit of the corpus token-frequency curve: log-log OLS
    slope over the TOP-100 tokens (rank by count desc, ties by token
    asc) — the power-law health check a corpus report runs (natural
    text ⇒ slope ≈ −1; a slope collapsing toward 0 flags boilerplate
    floods).  Token counting is combiner-first (per-batch value_counts
    partials, one groupby); the top-100 is a per-block prune + tiny
    sort; ONLY 100 rows reach the driver.

    EXACT protocol: per-rank terms x=round(1e6·ln(rank)),
    y=round(1e6·ln(count)) are int64; Σx, Σy, Σxy, Σx² are exact int64
    sums (order-independent); the slope/intercept are ONE shared double
    expression of those ints, micro-rounded — mirrored token-identically
    in the twin.  Output one row: (n_top, slope_micro,
    intercept_micro)."""
    from ..functions.importance import _round_half_away
    from ..functions.text import _split_tokens

    n_top = 100
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def partials(t: pa.Table) -> pa.Table:
        _, toks = _split_tokens(t)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        vc = toks.to_pandas().value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()), "n": pa.array(vc.to_numpy(np.int64), pa.int64())})

    counts = docs.map_batches(partials, batch_format="pyarrow").groupby("token").aggregate(Sum("n", alias_name="n"))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= n_top:
            return t
        df = t.to_pandas().sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(n_top)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = (
        counts.map_batches(local_topk, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(n_top)
        .take_all()
    )
    c = np.array([r["n"] for r in top], np.int64)
    n = len(c)
    if n < 2:  # token-less corpus: no fit (schema-pinned degenerate row)
        return pa.table(
            {
                "n_top": pa.array([n], pa.int64()),
                "slope_micro": pa.array([0], pa.int64()),
                "intercept_micro": pa.array([0], pa.int64()),
            }
        )
    rank = np.arange(1, n + 1, dtype=np.int64)
    x = _round_half_away(1e6 * np.log(rank.astype(np.float64)))
    y = _round_half_away(1e6 * np.log(c.astype(np.float64)))
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx)
    slope = num / den
    slope_micro = int(_round_half_away(np.float64(1e6 * slope)))
    intercept_micro = int(_round_half_away(np.float64((sy - slope * sx) / n)))
    return pa.table(
        {
            "n_top": pa.array([n], pa.int64()),
            "slope_micro": pa.array([slope_micro], pa.int64()),
            "intercept_micro": pa.array([intercept_micro], pa.int64()),
        }
    )


SQL_ZIPF_FIT = """
WITH toks AS (
  SELECT list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
tc AS (SELECT token, count(*) AS n FROM (SELECT unnest(ws) AS token FROM toks) GROUP BY 1),
top AS (
  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rnk
  FROM tc QUALIFY rnk <= 100
),
terms AS (
  SELECT CAST(round(1000000 * ln(CAST(rnk AS DOUBLE))) AS BIGINT) AS x,
         CAST(round(1000000 * ln(CAST(n AS DOUBLE))) AS BIGINT) AS y
  FROM top
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM terms
)
SELECT n AS n_top,
       CAST(round(1000000 * (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS slope_micro,
       CAST(round((CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_micro
FROM sums
"""


def q_embedding_outliers(sf_dir: str):
    """Label-noise detection by centroid distance: the 10 vectors per
    label FARTHEST (lowest cosine) from their own label's centroid —
    the embedding-space mislabel/outlier sweep a curation run does
    before training a classifier on weak labels.

    Shape: per-label dim-sums in one combiner pass (|labels|×d partial
    rows per batch → one tiny groupby → driver); the centroid matrix is
    FROZEN to 4dp integers (the `label_centroids` protocol) and both
    sides derive cosine from that SAME rounded table, so drift is
    bounded to final-cosine ulps under the shared 4dp round (the
    `cosine_dups` precedent); scoring is one broadcast matmul per
    batch; per-label bottom-k via batch-local prune + one tiny
    groupby."""
    from ..functions.similarity import _as_matrix

    k = 10
    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])

    def sums(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()), "s": pa.array([], pa.float64()), "n": pa.array([], pa.int64())}
            )
        mat = _as_matrix(t.column("embedding"))
        labs = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labs, return_inverse=True)
        acc = np.zeros((len(uniq), mat.shape[1]), np.float64)
        np.add.at(acc, inv, mat)
        cnt = np.bincount(inv)
        d = mat.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq)), pa.int64()),
                "s": pa.array(acc.reshape(-1), pa.float64()),
                "n": pa.array(np.repeat(cnt, d).astype(np.int64), pa.int64()),
            }
        )

    cent_df = (
        emb.map_batches(sums, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()  # |labels| × d rows — the legal small driver materialization
    )
    empty_out = pa.table(
        {"label": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cos_4dp": pa.array([], pa.float64())}
    )
    if cent_df.empty:  # no vectors at all: schema-pinned empty
        return empty_out
    labels = np.sort(cent_df["label"].unique())
    d = int(cent_df["dim"].max()) + 1
    C = np.zeros((len(labels), d), np.float64)
    li = np.searchsorted(labels, cent_df["label"].to_numpy())
    # FROZEN 4dp centroid (shared with the twin): round(sum/count * 1e4)
    C[li, cent_df["dim"].to_numpy()] = np.round(cent_df["s"].to_numpy() / cent_df["n"].to_numpy() * 1e4) / 1e4
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cos_4dp": pa.array([], pa.float64())}
            )
        mat = _as_matrix(t.column("embedding"))
        labs = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        lidx = np.searchsorted(labels, labs)
        xn = np.linalg.norm(mat, axis=1)
        xn[xn == 0] = 1.0
        cos = (mat * C[lidx]).sum(axis=1) / (xn * cn[lidx])
        out = pa.table(
            {
                "label": pa.array(labs, pa.int64()),
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "cos_4dp": pa.array(np.round(cos, 4), pa.float64()),
            }
        )
        # batch-local bottom-k per label before the tiny final reduce
        df = out.to_pandas()
        df = df.sort_values(["label", "cos_4dp", "vec_id"], kind="mergesort").groupby("label", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    bottom_schema = pa.schema([("label", pa.int64()), ("vec_id", pa.int64()), ("cos_4dp", pa.float64())])

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cos_4dp", "vec_id"], kind="mergesort").head(k)

    out = emb.map_batches(score, batch_format="pyarrow").groupby("label").map_groups(bottomk, batch_format="pandas")
    return out.map_batches(
        lambda t: t if t.num_rows else bottom_schema.empty_table(), batch_format="pyarrow"
    )


SQL_EMBEDDING_OUTLIERS = """
WITH flat AS (
  SELECT label, unnest(embedding) AS e, unnest(range(len(embedding))) AS i
  FROM embeddings
),
cent AS (
  SELECT label, i AS dim, round(sum(CAST(e AS DOUBLE)) / count(*) * 10000) / 10000 AS c
  FROM flat GROUP BY 1, 2
),
cvec AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY 1),
scored AS (
  SELECT e.label, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cv.cv), 4) AS cos_4dp
  FROM embeddings e JOIN cvec cv USING (label)
)
SELECT CAST(label AS BIGINT) AS label, CAST(vec_id AS BIGINT) AS vec_id, cos_4dp
FROM scored
QUALIFY row_number() OVER (PARTITION BY label ORDER BY cos_4dp, vec_id) <= 10
"""


def q_doc_novelty(sf_dir: str):
    """Per-document NOVELTY: the share of a document's distinct word
    8-grams that appear in NO other document — the memorization-risk /
    uniqueness score dual to `dup_passages` (novel ≈ safe to weight up;
    low novelty ≈ boilerplate).  Output (doc_id, n_grams, n_novel,
    novelty_micro = round(1e6·novel/grams), 0 for gram-less docs).

    Shape: distinct (gram, doc) made batch-locally (a doc never spans
    batches); global gram doc-frequency inside COARSE gram-hash
    partitions (O(coarse) group calls), emitting per-doc novel-count
    partials; per-doc totals ride a parallel batch-local stream; both
    streams UNION into ONE groupby(doc_id) — no join, and the token
    stream never shuffles."""
    from ..functions.importance import _round_half_away
    from ..functions.sampling import md5_u64
    from ..functions.text import _split_tokens

    N = 8
    coarse = 256
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    part_schema = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_novel", pa.int64())])

    def doc_grams(t: pa.Table):
        parents, toks = _split_tokens(t)
        words = toks.to_pandas().to_numpy()
        m = len(words) - N + 1
        if m <= 0:
            return None
        ok = parents[N - 1 : m + N - 1] == parents[:m]
        s = pd.Series(words[:m][ok])
        for j in range(1, N):
            s = s + " " + pd.Series(words[j : m + j][ok])
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[parents[:m][ok]]
        return pd.DataFrame({"doc_id": doc_ids, "gram": s.to_numpy()}).drop_duplicates()

    def totals(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        df = doc_grams(t)
        cnt = np.zeros(t.num_rows, np.int64)
        if df is not None:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            vc = df.groupby("doc_id").size()
            pos = pd.Index(ids).get_indexer(vc.index)  # batch row order is arbitrary
            cnt[pos] = vc.to_numpy()
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_grams": pa.array(cnt, pa.int64()),
                "n_novel": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            }
        )

    def gram_rows(t: pa.Table) -> pa.Table:
        df = doc_grams(t) if t.num_rows else None
        if df is None:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "gram": pa.array([], pa.string()), "_pp": pa.array([], pa.int64())}
            )
        pp = (md5_u64(df["gram"].to_numpy()) % np.uint64(coarse)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "gram": pa.array(df["gram"].to_numpy(), pa.string()),
                "_pp": pa.array(pp, pa.int64()),
            }
        )

    def novel_partials(df: pd.DataFrame) -> pd.DataFrame:
        # rows are globally-distinct (gram, doc): a gram's doc-frequency
        # is its row count inside this (complete) hash partition
        freq = df.groupby("gram")["gram"].transform("size")
        nov = df[freq == 1].groupby("doc_id").size().reset_index(name="n_novel")
        return pd.DataFrame(
            {
                "doc_id": nov["doc_id"].to_numpy(np.int64),
                "n_grams": np.zeros(len(nov), np.int64),
                "n_novel": nov["n_novel"].to_numpy(np.int64),
            }
        )

    novel = (
        docs.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("_pp")
        .map_groups(novel_partials, batch_format="pandas")
        # union() requires homogeneous block types: re-block as Arrow
        # (schema-pinned when a partition emitted the zero-row frame)
        .map_batches(
            lambda t: t if t.num_rows else part_schema.empty_table(),
            batch_format="pyarrow",
        )
    )
    agg = (
        docs.map_batches(totals, batch_format="pyarrow")
        .union(novel)
        .groupby("doc_id")
        .aggregate(Sum("n_grams", alias_name="n_grams"), Sum("n_novel", alias_name="n_novel"))
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_novel": pa.array([], pa.int64()),
                    "novelty_micro": pa.array([], pa.int64()),
                }
            )
        g = t.column("n_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("n_novel").to_numpy(zero_copy_only=False).astype(np.int64)
        nov = np.zeros(len(g), np.int64)
        nz = g > 0
        nov[nz] = _round_half_away(1e6 * v[nz].astype(np.float64) / g[nz].astype(np.float64))
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_grams": pa.array(g, pa.int64()),
                "n_novel": pa.array(v, pa.int64()),
                "novelty_micro": pa.array(nov, pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_DOC_NOVELTY = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 6), i ->
                list_aggregate(list_slice(ws, i, i + 7), 'string_agg', ' '))) AS gram
  FROM toks
),
dg AS (SELECT DISTINCT doc_id, gram FROM grams),
gcnt AS (SELECT gram, count(*) AS df FROM dg GROUP BY 1),
per_doc AS (
  SELECT d.doc_id, count(*) AS n_grams,
         coalesce(sum(CASE WHEN g.df = 1 THEN 1 ELSE 0 END), 0) AS n_novel
  FROM dg d JOIN gcnt g USING (gram)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN coalesce(p.n_grams, 0) > 0
            THEN CAST(round(1000000 * CAST(p.n_novel AS DOUBLE) / CAST(p.n_grams AS DOUBLE)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS novelty_micro
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def q_doc_token_entropy(sf_dir: str):
    """Per-document token Shannon ENTROPY in micro-nats — the
    repetitiveness signal quality pipelines threshold on (low entropy =
    keyword-stuffed / template text): H = ln(n) − (Σ c·ln c)/n over the
    doc's token counts.  Fully batch-local (one value_counts per doc
    segment, vectorized over the batch), no shuffle.

    EXACT protocol: per-distinct-token term_micro = round(1e6·c·ln c)
    is int64 (order-independent sum); H_micro = round(1e6·ln n − s/n)
    is ONE shared double expression of exact ints, mirrored
    token-identically in the twin.  Token-less docs emit H_micro=0."""
    from ..functions.importance import _round_half_away
    from ..functions.text import _split_tokens

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def entropy(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_toks": pa.array([], pa.int64()), "entropy_micro": pa.array([], pa.int64())}
            )
        parents, toks = _split_tokens(t)
        n = np.zeros(t.num_rows, np.int64)
        s = np.zeros(t.num_rows, np.int64)
        if len(parents):
            np.add.at(n, parents, 1)
            df = pd.DataFrame({"p": parents, "w": toks.to_pandas().to_numpy()})
            g = df.groupby(["p", "w"], sort=False).size()
            c = g.to_numpy(np.int64)
            terms = _round_half_away(1e6 * c.astype(np.float64) * np.log(c.astype(np.float64)))
            np.add.at(s, g.index.get_level_values(0).to_numpy(np.int64), terms)
        h = np.zeros(t.num_rows, np.int64)
        nz = n > 0
        h[nz] = _round_half_away(
            1e6 * np.log(n[nz].astype(np.float64)) - s[nz].astype(np.float64) / n[nz].astype(np.float64)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_toks": pa.array(n, pa.int64()),
                "entropy_micro": pa.array(h, pa.int64()),
            }
        )

    return docs.map_batches(entropy, batch_format="pyarrow")


SQL_DOC_TOKEN_ENTROPY = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0) AS ws
  FROM documents
),
occ AS (SELECT doc_id, unnest(ws) AS w FROM toks),
tc AS (SELECT doc_id, w, count(*) AS c FROM occ GROUP BY 1, 2),
terms AS (
  SELECT doc_id, sum(CAST(round(1000000 * CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS s,
         sum(c) AS n
  FROM tc GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(t.n, 0) AS BIGINT) AS n_toks,
       CASE WHEN coalesce(t.n, 0) > 0
            THEN CAST(round(1000000 * ln(CAST(t.n AS DOUBLE)) - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS entropy_micro
FROM documents d LEFT JOIN terms t USING (doc_id)
"""


def q_doc_clean(sf_dir: str):
    """Corpus TEXT NORMALIZATION as a dataset op (the pre-tokenization
    clean every pipeline runs): lowercase, collapse runs of whitespace
    to single spaces, trim — zero-copy Arrow kernels end-to-end
    (utf8_lower + RE2 replace + trim; DuckDB's regexp engine is RE2
    too, so the twin is expression-identical).  Emits the cleaned text
    plus the characters-removed accounting column."""
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def clean(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        out = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(txt), pattern=r"\s+", replacement=" ")
        )
        removed = pc.subtract(pc.utf8_length(txt), pc.utf8_length(out))
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "clean_text": out,
                "n_chars_removed": removed.cast(pa.int64()),
            }
        )

    return docs.map_batches(clean, batch_format="pyarrow")


SQL_DOC_CLEAN = """
SELECT doc_id,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS clean_text,
       CAST(len(text) - len(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_removed
FROM documents
"""


def q_curate_pipeline(sf_dir: str):
    """The END-TO-END curation run a pretraining corpus goes through,
    composed from this repo's oracle-twinned stages in the CCNet order:
    (1) Gopher multi-rule quality GATE (stateless batch filter),
    (2) exact DEDUP among survivors (md5 groupby-Min keep-set + hash
    semi-join — only (hash, id) rows shuffle, the text never does),
    (3) bigram-LM perplexity scoring TRAINED ON THE SURVIVORS and
    per-language head/middle/tail tertile bucketing, keeping
    head+middle.  Output: (doc_id, lang, avg_nll_micro, bucket) of the
    curated set.  The deduped stream is consumed twice (LM train, then
    score) and recomputed rather than materialized — at corpus scale a
    mid-pipeline text materialization is the thing to avoid; the gate
    and hash join are cheap relative to holding the corpus.  The twin
    replays gate → dedup → LM → tertiles in one CTE chain, so the hash
    check covers the whole composition."""
    from ray.data.aggregate import Min

    from ..functions.dedup import content_hash_batch
    from ..functions.lm import ccnet_buckets, lm_doc_nll, lm_nll_weights, lm_train
    from ..functions.text import gopher_rules_batch

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def gate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pc.equal(gopher_rules_batch(t).column("gopher_pass"), 1))

    kept = docs.map_batches(gate, batch_format="pyarrow")
    keep_ids = (
        kept.map_batches(
            lambda t: content_hash_batch(t, "text").select(["content_hash", "doc_id"]), batch_format="pyarrow"
        )
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"))
        .select_columns(["keep_id"])
    )
    n_parts = auto_num_partitions(docs.count())
    deduped = kept.join(keep_ids, join_type="inner", num_partitions=n_parts, on=("doc_id",), right_on=("keep_id",)).select_columns(
        ["doc_id", "text", "lang"]
    )
    nll1, nll2 = lm_nll_weights(*lm_train(deduped))
    out = ccnet_buckets(lm_doc_nll(deduped, nll1, nll2, carry_cols=("lang",)))
    return out.filter(expr="bucket != 'tail'")


def _curate_sql() -> str:
    lm_inner = _SQL_LM_SCORED_CTE.strip()
    assert lm_inner.startswith("WITH")
    lm_inner = lm_inner[len("WITH") :].replace("FROM documents", "FROM kept_docs")
    return f"""
WITH gpass AS (SELECT doc_id FROM ({SQL_GOPHER_QUALITY}) WHERE gopher_pass = 1),
g1 AS (SELECT d.doc_id, d.text, d.lang FROM documents d JOIN gpass USING (doc_id)),
keepset AS (SELECT min(doc_id) AS doc_id FROM g1 GROUP BY md5(text)),
kept_docs AS (SELECT g1.* FROM g1 JOIN keepset USING (doc_id)),
{lm_inner},
ranked AS (
  SELECT s.doc_id, k.lang, s.avg_nll_micro,
         row_number() OVER (PARTITION BY k.lang ORDER BY s.avg_nll_micro, s.doc_id) AS rn,
         count(*) OVER (PARTITION BY k.lang) AS n
  FROM scored s JOIN kept_docs k USING (doc_id)
),
th AS (
  SELECT lang,
         max(CASE WHEN rn = (n - 1) * 1 // 3 + 1 THEN avg_nll_micro END) AS t1,
         max(CASE WHEN rn = (n - 1) * 2 // 3 + 1 THEN avg_nll_micro END) AS t2
  FROM ranked GROUP BY 1
)
SELECT r.doc_id, r.lang, r.avg_nll_micro,
       CASE WHEN r.avg_nll_micro <= th.t1 THEN 'head' ELSE 'middle' END AS bucket
FROM ranked r JOIN th USING (lang)
WHERE r.avg_nll_micro <= th.t2
"""


def q_curate_export(sf_dir: str):
    """The curated corpus WRITTEN as resumable partitioned parquet —
    the sink contract a 100-TB run needs (one directory per
    (lang, bucket) partition so a failed run skips finished
    partitions; never one giant file): runs `curate_pipeline`, streams
    it to ``write_parquet(partition_cols=["lang", "bucket"])`` under a
    scratch dir, then reports the written MANIFEST (lang, bucket,
    n_docs) from parquet FILE METADATA ONLY (no data re-read).  The
    twin aggregates the same chain in SQL, so the hash check verifies
    the partitioned sink actually wrote every curated row to the right
    partition."""
    import shutil as _sh
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="curate_export_", dir="/tmp")
    try:
        q_curate_pipeline(sf_dir).write_parquet(out_dir, partition_cols=["lang", "bucket"])
        import glob as _glob

        import pyarrow.parquet as _pq

        rows = {}
        for f in _glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True):
            rel = os.path.relpath(f, out_dir).split(os.sep)
            lang = next(p.split("=", 1)[1] for p in rel if p.startswith("lang="))
            bucket = next(p.split("=", 1)[1] for p in rel if p.startswith("bucket="))
            rows[(lang, bucket)] = rows.get((lang, bucket), 0) + _pq.ParquetFile(f).metadata.num_rows
        keys = sorted(rows)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "bucket": pa.array([k[1] for k in keys], pa.string()),
                "n_docs": pa.array([rows[k] for k in keys], pa.int64()),
            }
        )
    finally:
        _sh.rmtree(out_dir, ignore_errors=True)


def _curate_export_sql() -> str:
    return f"SELECT lang, bucket, count(*) AS n_docs FROM ({_curate_sql()}) GROUP BY 1, 2"


def q_dsir_auc(sf_dir: str):
    """Exact ROC-AUC of the DSIR importance score as an 'is-target-
    domain' classifier (lang='en' positives) — the eval a curation run
    uses to judge whether a cheap scorer separates the target before
    trusting it for selection.  Tie-aware rank-sum (Mann-Whitney):
    AUC = (Σ avg-rank(pos) − n⁺(n⁺+1)/2)/(n⁺n⁻).

    Distributed shape: score-join-label, ONE groupby to per-DISTINCT-
    score (n, n_pos) rows, then the two-pass distributed prefix-sum
    (`functions/scan.py`) gives every score its exact count-below —
    no global sort, no corpus-sized driver table; 3 scalars reach the
    driver.  All rank arithmetic is integer (2·Σavg-rank stays int64);
    the final AUC is ONE shared double expression, micro-rounded —
    mirrored token-identically in the twin's window-sum SQL."""
    from ..functions.importance import _round_half_away, dsir_weights, gram_buckets_batch, gram_distribution
    from ..functions.scan import prefix_sum

    # score and label in ONE pass (lang rides the scoring batch), so no
    # corpus-sized join is needed before the per-score aggregate
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["text", "lang"])
    w = np.asarray(dsir_weights(*gram_distribution(docs, target_langs=("en",))), np.int64)

    def mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"sc": pa.array([], pa.int64()), "p": pa.array([], pa.int64())})
        s = np.zeros(t.num_rows, np.int64)
        parents, buckets = gram_buckets_batch(t, len(w))
        if len(buckets):
            np.add.at(s, parents, w[buckets])
        return pa.table(
            {
                "sc": pa.array(s, pa.int64()),
                "p": pc.cast(pc.equal(t.column("lang"), "en"), pa.int64()),
            }
        )

    per = docs.map_batches(mark, batch_format="pyarrow").groupby("sc").aggregate(
        Count(alias_name="n"), Sum("p", alias_name="np")
    )
    mn = per.aggregate(Min("sc", alias_name="m"))["m"]
    mn = int(mn) if mn is not None else 0
    shifted = per.map_batches(
        lambda t: t.append_column("_k", pc.cast(pc.subtract(t.column("sc"), mn), pa.int64())),
        batch_format="pyarrow",
    )
    ranked = prefix_sum(shifted, key_col="_k", value_col="n", out_col="cl")

    def partials(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        np_ = t.column("np").to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t.column("cl").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s2": pa.array([int((np_ * (2 * cl + 1 + n)).sum())], pa.int64()),
                "npos": pa.array([int(np_.sum())], pa.int64()),
                "ntot": pa.array([int(n.sum())], pa.int64()),
            }
        )

    agg = ranked.map_batches(partials, batch_format="pyarrow").to_pandas().sum()
    s2, npos, ntot = int(agg["s2"]), int(agg["npos"]), int(agg["ntot"])
    nneg = ntot - npos
    auc = int(_round_half_away(np.float64(1e6 * float(s2 - npos * (npos + 1)) / float(2 * npos * nneg)))) if npos and nneg else 0
    return pa.table(
        {
            "n_pos": pa.array([npos], pa.int64()),
            "n_neg": pa.array([nneg], pa.int64()),
            "auc_micro": pa.array([auc], pa.int64()),
        }
    )


SQL_DSIR_AUC = _SQL_DSIR_SCORES_CTE + """,
lab AS (
  SELECT s.dsir_score AS sc, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS p
  FROM scores s JOIN documents d USING (doc_id)
),
per AS (SELECT sc, count(*) AS n, sum(p) AS np FROM lab GROUP BY 1),
wk AS (
  SELECT sc, n, np,
         coalesce(sum(n) OVER (ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl
  FROM per
),
agg AS (SELECT sum(np * (2 * cl + 1 + n)) AS s2, sum(np) AS npos, sum(n) AS ntot FROM wk)
SELECT CAST(npos AS BIGINT) AS n_pos,
       CAST(ntot - npos AS BIGINT) AS n_neg,
       CAST(round(1000000 * CAST(s2 - npos * (npos + 1) AS DOUBLE)
                  / CAST(2 * npos * (ntot - npos) AS DOUBLE)) AS BIGINT) AS auc_micro
FROM agg
"""


def q_user_streaks(sf_dir: str):
    """Per-user activity STREAKS — the gaps-and-islands pattern over
    consecutive CALENDAR DAYS (distinct from `events_sessionize`'s
    time-gap sessions): for each user, the number of maximal runs of
    consecutive active days, the longest run, and total active days.

    Shape: ONE groupby to distinct (user, day) rows (day = epoch-micros
    // 86400e6, exact int both sides), then the coarse-hash partition
    idiom — each partition holds ALL of its users' rows, so the island
    detection (day − per-user row_number = island anchor) is
    segment-vectorized pandas inside O(coarse) group calls and the
    per-user outputs are final with no second exchange."""
    coarse = 256
    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()), "day": pa.array([], pa.int64())})
        d = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy() // 86_400_000_000
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(zero_copy_only=False), "day": d}).drop_duplicates()
        return pa.table(
            {"user_id": pa.array(df["user_id"].to_numpy(np.int64), pa.int64()), "day": pa.array(df["day"].to_numpy(np.int64), pa.int64())}
        )

    distinct = (
        ev.map_batches(days, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["user_id", "day"]).append_column(
                "_pp", pc.cast(pc.bit_wise_and(t.column("user_id"), coarse - 1), pa.int64())
            ),
            batch_format="pyarrow",
        )
    )

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        rn = df.groupby("user_id", sort=False).cumcount()
        anchor = df["day"].to_numpy() - rn.to_numpy()
        runs = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "a": anchor})
            .groupby(["user_id", "a"], sort=False)
            .size()
            .reset_index(name="len")
        )
        g = runs.groupby("user_id", sort=False)["len"]
        out = pd.DataFrame(
            {
                "user_id": g.count().index.to_numpy(np.int64),
                "n_streaks": g.count().to_numpy(np.int64),
                "longest_streak": g.max().to_numpy(np.int64),
                "n_active_days": g.sum().to_numpy(np.int64),
            }
        )
        return out

    return distinct.groupby("_pp").map_groups(islands, batch_format="pandas")


SQL_USER_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day
  FROM events
),
r AS (
  SELECT user_id, day, day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
  FROM d
),
i AS (SELECT user_id, anchor, count(*) AS len FROM r GROUP BY 1, 2)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM i GROUP BY 1
"""


def q_doc_length_gini(sf_dir: str):
    """EXACT Gini coefficient of document lengths (n_chars) in
    micro-units — the corpus-balance inequality report (G→0: uniform
    docs; G→1: a few giants carry the mass).  Ties handled by the
    grouped closed form: with distinct lengths v (count c, count-below
    cl), Σ rank·x = Σ v·(c·cl + c(c+1)/2) under ANY within-tie order,
    so G = (2·Σrank·x − (n+1)·T)/(n·T) is a pure integer expression.

    Shape: one groupby to per-distinct-length rows, the distributed
    prefix-sum for count-below (no global sort), int64 partials, 3
    scalars to the driver; the final G is ONE shared double expression,
    micro-rounded and twin-mirrored.  Intermediates are exact while
    n·T < 2^63 (asserted) — beyond that the accumulators need 128-bit
    arithmetic (DuckDB's HUGEINT side is already fine)."""
    from ..functions.importance import _round_half_away
    from ..functions.scan import prefix_sum

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["n_chars"])
    per = (
        docs.map_batches(
            lambda t: pa.table({"v": t.column("n_chars").cast(pa.int64())}), batch_format="pyarrow"
        )
        .groupby("v")
        .aggregate(Count(alias_name="c"))
    )
    ranked = prefix_sum(per, key_col="v", value_col="c", out_col="cl")

    def partials(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t.column("cl").to_numpy(zero_copy_only=False).astype(np.int64)
        s = int((v * (c * cl + c * (c + 1) // 2)).sum())
        return pa.table(
            {
                "s": pa.array([s], pa.int64()),
                "t": pa.array([int((v * c).sum())], pa.int64()),
                "n": pa.array([int(c.sum())], pa.int64()),
            }
        )

    agg = ranked.map_batches(partials, batch_format="pyarrow").to_pandas().sum()
    s, total, n = int(agg["s"]), int(agg["t"]), int(agg["n"])
    assert n * max(total, 1) < (1 << 63), "gini accumulators need 128-bit arithmetic at this scale"
    gini = int(_round_half_away(np.float64(1e6 * float(2 * s - (n + 1) * total) / float(n * total)))) if n and total else 0
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "total_chars": pa.array([total], pa.int64()),
            "gini_micro": pa.array([gini], pa.int64()),
        }
    )


SQL_DOC_LENGTH_GINI = """
WITH per AS (SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c FROM documents GROUP BY 1),
wk AS (
  SELECT v, c,
         coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl
  FROM per
),
agg AS (
  SELECT sum(v * (c * cl + c * (c + 1) // 2)) AS s, sum(v * c) AS t, sum(c) AS n FROM wk
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(t AS BIGINT) AS total_chars,
       CAST(round(1000000 * CAST(2 * s - (n + 1) * t AS DOUBLE) / CAST(n * t AS DOUBLE)) AS BIGINT) AS gini_micro
FROM agg
"""


def q_events_autocorr(sf_dir: str):
    """Lag-1 AUTOCORRELATION of the hourly event-volume series — the
    time-series health diagnostic (r₁→1: smooth load; r₁→0: white
    noise; r₁<0: alternating bursts).  The series is the gap-filled
    hour grid from min to max hour (missing hours count 0, the
    `events_gap_fill` convention).

    Shape: ONE distributed groupby to per-hour counts; the hour grid is
    time-range-sized, not corpus-sized (the bounded-domain driver step,
    same justification as `events_gap_fill`), so r₁ is computed on the
    driver from six integer sums (S11=Σcₜcₜ₊₁, A, B, T, S2, n) with the
    mean-centered expansion num = S11 − m(A+B) + (n−1)m²,
    den = S2 − T²/n, m = T/n — ONE shared double expression of exact
    ints, micro-rounded and twin-mirrored."""
    from ..functions.importance import _round_half_away

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["ts"])

    def hours(t: pa.Table) -> pa.Table:
        h = pc.floor_temporal(t.column("ts").cast(pa.timestamp("us")), unit="hour").cast(pa.int64())
        return pa.table({"h": pc.divide(h, 3_600_000_000)})

    per = ev.map_batches(hours, batch_format="pyarrow").groupby("h").aggregate(Count(alias_name="c")).to_pandas()
    if len(per) < 2:
        return pa.table({"n_hours": pa.array([len(per)], pa.int64()), "r1_micro": pa.array([0], pa.int64())})
    per = per.sort_values("h")
    lo, hi = int(per["h"].iloc[0]), int(per["h"].iloc[-1])
    c = np.zeros(hi - lo + 1, np.int64)
    c[per["h"].to_numpy(np.int64) - lo] = per["c"].to_numpy(np.int64)
    n = len(c)
    s11 = int((c[:-1] * c[1:]).sum())
    a, b = int(c[:-1].sum()), int(c[1:].sum())
    t_, s2 = int(c.sum()), int((c * c).sum())
    m = t_ / n
    num = float(s11) - m * float(a + b) + (n - 1) * m * m
    den = float(s2) - float(t_) * float(t_) / n
    r1 = int(_round_half_away(np.float64(1e6 * num / den))) if den != 0 else 0
    return pa.table({"n_hours": pa.array([n], pa.int64()), "r1_micro": pa.array([r1], pa.int64())})


SQL_EVENTS_AUTOCORR = """
WITH per AS (
  SELECT CAST(epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600000000 AS BIGINT) AS h,
         count(*) AS c
  FROM events GROUP BY 1
),
grid AS (
  SELECT g.h, coalesce(p.c, 0) AS c
  FROM (SELECT unnest(range((SELECT min(h) FROM per), (SELECT max(h) FROM per) + 1)) AS h) g
  LEFT JOIN per p USING (h)
),
lagd AS (SELECT h, c, lead(c) OVER (ORDER BY h) AS cn FROM grid),
sums AS (
  SELECT sum(c * cn) FILTER (WHERE cn IS NOT NULL) AS s11,
         sum(c) FILTER (WHERE cn IS NOT NULL) AS a,
         sum(cn) FILTER (WHERE cn IS NOT NULL) AS b,
         sum(c) AS t, sum(c * c) AS s2, count(*) AS n
  FROM lagd
)
SELECT CAST(n AS BIGINT) AS n_hours,
       CAST(round(1000000 * (CAST(s11 AS DOUBLE) - (CAST(t AS DOUBLE) / n) * CAST(a + b AS DOUBLE)
                             + (n - 1) * (CAST(t AS DOUBLE) / n) * (CAST(t AS DOUBLE) / n))
                  / (CAST(s2 AS DOUBLE) - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / n)) AS BIGINT) AS r1_micro
FROM sums
"""


def q_langid_confusion(sf_dir: str):
    """Confusion matrix of the heuristic language-ID against the true
    labels — the accuracy report a curation run produces before
    trusting the cheap classifier for routing: (true lang, predicted,
    n_docs).  The classifier pass is stateless and batch-local; the
    matrix is |langs|² rows from ONE groupby."""
    from ..functions.text import LangId

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    lid = LangId()  # compile the script/stopword machinery once, in the closure

    def pred(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()), "lang_pred": pa.array([], pa.string())})
        out = lid(t)
        return pa.table({"lang": t.column("lang"), "lang_pred": out.column("lang_pred")})

    return docs.map_batches(pred, batch_format="pyarrow").groupby(["lang", "lang_pred"]).aggregate(
        Count(alias_name="n_docs")
    )


SQL_LANGID_CONFUSION = f"""
SELECT d.lang, p.lang_pred, count(*) AS n_docs
FROM ({SQL_LANGID}) p JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


SQL_CCNET_BUCKETS = _SQL_LM_SCORED_CTE + """,
ranked AS (
  SELECT s.doc_id, d.lang, s.avg_nll_micro,
         row_number() OVER (PARTITION BY d.lang ORDER BY s.avg_nll_micro, s.doc_id) AS rn,
         count(*) OVER (PARTITION BY d.lang) AS n
  FROM scored s JOIN documents d USING (doc_id)
),
th AS (
  SELECT lang,
         max(CASE WHEN rn = (n - 1) * 1 // 3 + 1 THEN avg_nll_micro END) AS t1,
         max(CASE WHEN rn = (n - 1) * 2 // 3 + 1 THEN avg_nll_micro END) AS t2
  FROM ranked GROUP BY 1
)
SELECT r.doc_id, r.lang, r.avg_nll_micro,
       CASE WHEN r.avg_nll_micro <= th.t1 THEN 'head'
            WHEN r.avg_nll_micro <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked r JOIN th USING (lang)
"""


QUERIES = {
    "lineitem_agg": q_lineitem_agg,
    "filter_revenue": q_filter_revenue,
    "top_customers": q_top_customers,
    "region_customer_counts": q_region_customer_counts,
    "parts_by_brand": q_parts_by_brand,
    "sorted_topn": q_sorted_topn,
    "sorted_page": q_sorted_page,
    "events_hourly": q_events_hourly,
    "events_rollup": q_events_rollup,
    "events_funnel": q_events_funnel,
    "events_top_users": q_events_top_users,
    "events_json_props": q_events_json_props,
    "events_sessionize": q_events_sessionize,
    "events_moving_avg": q_events_moving_avg,
    "events_rolling_median": q_events_rolling_median,
    "events_new_vs_returning": q_events_new_vs_returning,
    "events_gap_fill": q_events_gap_fill,
    "orders_topn_per_cust": q_orders_topn_per_cust,
    "value_quantiles": q_value_quantiles,
    "bucket_join": q_bucket_join,
    "asof_join": q_asof_join,
    "distinct_pairs": q_distinct_pairs,
    "token_counts": q_token_counts,
    "quality": q_quality,
    "fingerprint": q_fingerprint,
    "exact_dedup": q_exact_dedup,
    "dedup_filter": q_dedup_filter,
    "char_jaccard": q_char_jaccard,
    "minhash_pairs_md5": q_minhash_pairs_md5,
    "simhash_near_pairs_md5": q_simhash_near_pairs_md5,
    "fingerprint_hamming_pairs": q_fingerprint_hamming_pairs,
    "simhash_groups_md5": q_simhash_groups_md5,
    "langid": q_langid,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "dedup_groups_md5": q_dedup_groups_md5,
    "approx_distinct_users": q_approx_distinct_users,
    "hll_registers": q_hll_registers,
    "ann_topk": q_ann_topk,
    "cosine_dups": q_cosine_dups,
    "embedding_dup_groups": q_embedding_dup_groups,
    "lsh_ann": q_lsh_ann,
    "ivf_ann_frozen": q_ivf_ann_frozen,
    "media_metadata": q_media_metadata,
    "media_decode": q_media_decode,
    "media_features_u32": q_media_features_u32,
    "crawl_determinism": q_crawl_determinism,
    "crawl_determinism_strict": q_crawl_determinism_strict,
    "near_dedup_md5": q_near_dedup_md5,
    "site_items_md5": q_site_items_md5,
    "minhash_sigs": q_minhash_sigs,
    "doc_spans_flat": q_doc_spans_flat,
    "doc_sample": q_doc_sample,
    "lang_temperature_sample": q_lang_temperature_sample,
    # --- beyond the driver's 50-row correctness window ---
    "doc_split": q_doc_split,
    "doc_stratified_sample": q_doc_stratified_sample,
    "tfidf": q_tfidf,
    "kmeans_clusters": q_kmeans_clusters,
    "kmeans_assign": q_kmeans_assign,
    # rows-only variants (each family's oracle twin sits in the window above)
    "minhash_pairs": q_minhash_pairs,
    "simhash_near_pairs": q_simhash_near_pairs,
    "simhash_groups": q_simhash_groups,
    "dedup_groups": q_dedup_groups,
    "ivf_ann": q_ivf_ann,
    "media_features": q_media_features,
    "crawl_lineage": q_crawl_lineage,
    "crawl_documents": q_crawl_documents,
    "site_items": q_site_items,
    "doc_spans": q_doc_spans,
    "pca_project_frozen": q_pca_project_frozen,
    "doc_chunks": q_doc_chunks,
    "embedding_quantize": q_embedding_quantize,
    "events_hopping": q_events_hopping,
    "doc_sample_weighted": q_doc_sample_weighted,
    "events_sample_per_type": q_events_sample_per_type,
    "doc_redact": q_doc_redact,
    "span_dedup": q_span_dedup,
    "span_reassemble": q_span_reassemble,
    "simhash_sigs": q_simhash_sigs,
    "events_pct_rank": q_events_pct_rank,
    "events_bucketize": q_events_bucketize,
    "events_clip": q_events_clip,
    "events_dedup_latest": q_events_dedup_latest,
    "events_cumsum": q_events_cumsum,
    "events_ntile": q_events_ntile,
    "users_csv_by_type": q_users_csv_by_type,
    "purchase_error_full": q_purchase_error_full,
    "sparse_cosine_pairs": q_sparse_cosine_pairs,
    "events_minmax": q_events_minmax,
    "events_dense_rank": q_events_dense_rank,
    "revenue_by_nation": q_revenue_by_nation,
    "orders_priority_share": q_orders_priority_share,
    "events_first_last": q_events_first_last,
    "events_exact_quartiles": q_events_exact_quartiles,
    "events_mad_outliers": q_events_mad_outliers,
    "events_cube": q_events_cube,
    "dup_passages": q_dup_passages,
    "users_modal_type": q_users_modal_type,
    "users_intersect": q_users_intersect,
    "events_corr": q_events_corr,
    "events_regression": q_events_regression,
    "orders_shipping_priority": q_orders_shipping_priority,
    "promo_revenue_share": q_promo_revenue_share,
    "user_retention": q_user_retention,
    "events_transitions": q_events_transitions,
    "events_entropy": q_events_entropy,
    "edit_distance_pairs": q_edit_distance_pairs,
    "allpairs_jaccard": q_allpairs_jaccard,
    "events_users_by_type": q_events_users_by_type,
    "sliding_distinct_users": q_sliding_distinct_users,
    "cooccur_topk": q_cooccur_topk,
    "user_paths": q_user_paths,
    "supplier_variety": q_supplier_variety,
    "events_mutual_info": q_events_mutual_info,
    "orders_large": q_orders_large,
    "parts_above_brand_avg": q_parts_above_brand_avg,
    "cumulative_distinct_users": q_cumulative_distinct_users,
    "disjunctive_join_revenue": q_disjunctive_join_revenue,
    "time_to_convert": q_time_to_convert,
    "events_burst": q_events_burst,
    "top_tokens_per_lang": q_top_tokens_per_lang,
    "orders_exists_late_ship": q_orders_exists_late_ship,
    "doc_length_deciles": q_doc_length_deciles,
    "events_day_over_day": q_events_day_over_day,
    "events_histogram": q_events_histogram,
    "cust_order_distribution": q_cust_order_distribution,
    "small_qty_revenue": q_small_qty_revenue,
    "only_late_supplier": q_only_late_supplier,
    "rich_inactive_custs": q_rich_inactive_custs,
    "nation_pair_volume": q_nation_pair_volume,
    "nation_market_share": q_nation_market_share,
    "part_profit_by_nation": q_part_profit_by_nation,
    "returned_item_customers": q_returned_item_customers,
    "late_priority_counts": q_late_priority_counts,
    "top_supplier_revenue": q_top_supplier_revenue,
    "hard_negatives": q_hard_negatives,
    "vocab_growth": q_vocab_growth,
    "supplier_pagerank": q_supplier_pagerank,
    "supplier_reach": q_supplier_reach,
    "supplier_hits": q_supplier_hits,
    "events_unpivot": q_events_unpivot,
    "source_checksum": q_source_checksum,
    "events_anomaly_days": q_events_anomaly_days,
    "min_cost_supplier": q_min_cost_supplier,
    "important_stock": q_important_stock,
    "dominant_suppliers": q_dominant_suppliers,
    "doc_fluency": q_doc_fluency,
    "media_frames": q_media_frames,
    "bm25_topk": q_bm25_topk,
    "doc_repetition": q_doc_repetition,
    "quality_filter": q_quality_filter,
    "anti_join_customers": q_anti_join_customers,
    "customer_orders_left": q_customer_orders_left,
    "events_pivot": q_events_pivot,
    "events_time_delta": q_events_time_delta,
    "doc_pack": q_doc_pack,
    "events_quantiles_by_type": q_events_quantiles_by_type,
    "top_bigrams": q_top_bigrams,
    "bigram_pmi": q_bigram_pmi,
    "decontaminate": q_decontaminate,
    "tokenize_flat": q_tokenize_flat,
    "events_zscore": q_events_zscore,
    "doc_compress_ratio": q_doc_compress_ratio,
    "interval_join_events": q_interval_join_events,
    "span_media_resolve": q_span_media_resolve,
    "heavy_hitters": q_heavy_hitters,
    "doc_shuffle": q_doc_shuffle,
    "bloom_join_revenue": q_bloom_join_revenue,
    "label_centroids": q_label_centroids,
    "embedding_pca": q_embedding_pca,
    "crawl_pagerank": q_crawl_pagerank,
    "near_dedup_filter": q_near_dedup_filter,
    "gopher_quality": q_gopher_quality,
    "gopher_filter": q_gopher_filter,
    "semantic_dedup": q_semantic_dedup,
    "dsir_score": q_dsir_score,
    "dsir_select": q_dsir_select,
    "dsir_resample": q_dsir_resample,
    "nb_classify": q_nb_classify,
    "nb_confusion": q_nb_confusion,
    "lm_perplexity": q_lm_perplexity,
    "ccnet_buckets": q_ccnet_buckets,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_dup_pairs": q_winnow_dup_pairs,
    "cdc_chunks": q_cdc_chunks,
    "cdc_dedup_ratio": q_cdc_dedup_ratio,
    "source_overlap": q_source_overlap,
    "pq_codes": q_pq_codes,
    "pq_adc_topk": q_pq_adc_topk,
    "source_kl": q_source_kl,
    "zipf_fit": q_zipf_fit,
    "embedding_outliers": q_embedding_outliers,
    "doc_novelty": q_doc_novelty,
    "media_audio": q_media_audio,
    "doc_token_entropy": q_doc_token_entropy,
    "doc_clean": q_doc_clean,
    "curate_pipeline": q_curate_pipeline,
    "curate_export": q_curate_export,
    "dsir_auc": q_dsir_auc,
    "user_streaks": q_user_streaks,
    "doc_length_gini": q_doc_length_gini,
    "events_autocorr": q_events_autocorr,
    "langid_confusion": q_langid_confusion,
}

ORACLES = {
    "lineitem_agg": SQL_LINEITEM_AGG,
    "filter_revenue": SQL_FILTER_REVENUE,
    "top_customers": SQL_TOP_CUSTOMERS,
    "region_customer_counts": SQL_REGION_CUSTOMER_COUNTS,
    "parts_by_brand": SQL_PARTS_BY_BRAND,
    "sorted_topn": SQL_SORTED_TOPN,
    "sorted_page": SQL_SORTED_PAGE,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_rollup": SQL_EVENTS_ROLLUP,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_top_users": SQL_EVENTS_TOP_USERS,
    "events_json_props": SQL_EVENTS_JSON_PROPS,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_moving_avg": SQL_EVENTS_MOVING_AVG,
    "events_rolling_median": SQL_EVENTS_ROLLING_MEDIAN,
    "events_new_vs_returning": SQL_EVENTS_NEW_VS_RETURNING,
    "events_gap_fill": SQL_EVENTS_GAP_FILL,
    "orders_topn_per_cust": SQL_ORDERS_TOPN_PER_CUST,
    "value_quantiles": SQL_VALUE_QUANTILES,
    "bucket_join": SQL_BUCKET_JOIN,
    "asof_join": SQL_ASOF_JOIN,
    "distinct_pairs": SQL_DISTINCT_PAIRS,
    "token_counts": SQL_TOKEN_COUNTS,
    "quality": SQL_QUALITY,
    "fingerprint": SQL_FINGERPRINT,
    "exact_dedup": SQL_EXACT_DEDUP,
    "dedup_filter": SQL_DEDUP_FILTER,
    "char_jaccard": SQL_CHAR_JACCARD,
    "fingerprint_hamming_pairs": SQL_FINGERPRINT_HAMMING_PAIRS,
    "ann_topk": SQL_ANN_TOPK,
    "cosine_dups": SQL_COSINE_DUPS,
    "embedding_dup_groups": SQL_EMBEDDING_DUP_GROUPS,
    "media_metadata": SQL_MEDIA_METADATA,
    "media_decode": SQL_MEDIA_DECODE,
    "media_frames": SQL_MEDIA_FRAMES,
    "media_features_u32": SQL_MEDIA_FEATURES_U32,
    "site_items_md5": SQL_SITE_ITEMS_MD5,
    "simhash_near_pairs_md5": SQL_SIMHASH_NEAR_PAIRS_MD5,
    "doc_spans_flat": SQL_DOC_SPANS_FLAT,
    "doc_sample": SQL_DOC_SAMPLE,
    "lang_temperature_sample": SQL_LANG_TEMPERATURE_SAMPLE,
    "doc_split": SQL_DOC_SPLIT,
    "doc_stratified_sample": SQL_DOC_STRATIFIED_SAMPLE,
    "tfidf": SQL_TFIDF,
    "bm25_topk": SQL_BM25_TOPK,
    "doc_repetition": SQL_DOC_REPETITION,
    "quality_filter": SQL_QUALITY_FILTER,
    "anti_join_customers": SQL_ANTI_JOIN_CUSTOMERS,
    "customer_orders_left": SQL_CUSTOMER_ORDERS_LEFT,
    "events_pivot": SQL_EVENTS_PIVOT,
    "events_time_delta": SQL_EVENTS_TIME_DELTA,
    "doc_pack": SQL_DOC_PACK,
    "langid": SQL_LANGID,
    "bpe_merges": _bpe_merges_sql(),
    "bpe_token_counts": _bpe_token_counts_sql(),
    "events_quantiles_by_type": SQL_EVENTS_QUANTILES_BY_TYPE,
    "top_bigrams": SQL_TOP_BIGRAMS,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "decontaminate": SQL_DECONTAMINATE,
    "tokenize_flat": SQL_TOKENIZE_FLAT,
    "events_zscore": SQL_EVENTS_ZSCORE,
    "interval_join_events": SQL_INTERVAL_JOIN_EVENTS,
    "span_media_resolve": SQL_SPAN_MEDIA_RESOLVE,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "doc_shuffle": SQL_DOC_SHUFFLE,
    "bloom_join_revenue": SQL_BLOOM_JOIN_REVENUE,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "kmeans_assign": SQL_KMEANS_ASSIGN,
    "pca_project_frozen": SQL_PCA_PROJECT_FROZEN,
    "crawl_determinism": SQL_CRAWL_DETERMINISM,
    "crawl_determinism_strict": SQL_CRAWL_DETERMINISM_STRICT,
    "doc_chunks": SQL_DOC_CHUNKS,
    "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
    "events_hopping": SQL_EVENTS_HOPPING,
    "doc_sample_weighted": SQL_DOC_SAMPLE_WEIGHTED,
    "events_sample_per_type": SQL_EVENTS_SAMPLE_PER_TYPE,
    "doc_redact": SQL_DOC_REDACT,
    "span_dedup": SQL_SPAN_DEDUP,
    "span_reassemble": SQL_SPAN_REASSEMBLE,
    "minhash_sigs": SQL_MINHASH_SIGS,
    "simhash_sigs": SQL_SIMHASH_SIGS,
    "minhash_pairs_md5": SQL_MINHASH_PAIRS_MD5,
    "dedup_groups_md5": SQL_DEDUP_GROUPS_MD5,
    "near_dedup_md5": SQL_NEAR_DEDUP_MD5,
    "simhash_groups_md5": SQL_SIMHASH_GROUPS_MD5,
    "approx_distinct_users": SQL_APPROX_DISTINCT_USERS,
    "hll_registers": SQL_HLL_REGISTERS,
    "events_pct_rank": SQL_EVENTS_PCT_RANK,
    "ivf_ann_frozen": SQL_IVF_ANN_FROZEN,
    "lsh_ann": SQL_LSH_ANN,
    "events_bucketize": SQL_EVENTS_BUCKETIZE,
    "events_clip": SQL_EVENTS_CLIP,
    "events_dedup_latest": SQL_EVENTS_DEDUP_LATEST,
    "events_cumsum": SQL_EVENTS_CUMSUM,
    "events_ntile": SQL_EVENTS_NTILE,
    "users_csv_by_type": SQL_USERS_CSV_BY_TYPE,
    "purchase_error_full": SQL_PURCHASE_ERROR_FULL,
    "sparse_cosine_pairs": SQL_SPARSE_COSINE_PAIRS,
    "events_minmax": SQL_EVENTS_MINMAX,
    "events_dense_rank": SQL_EVENTS_DENSE_RANK,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "orders_priority_share": SQL_ORDERS_PRIORITY_SHARE,
    "events_first_last": SQL_EVENTS_FIRST_LAST,
    "events_exact_quartiles": SQL_EVENTS_EXACT_QUARTILES,
    "events_mad_outliers": SQL_EVENTS_MAD_OUTLIERS,
    "events_cube": SQL_EVENTS_CUBE,
    "dup_passages": SQL_DUP_PASSAGES,
    "users_modal_type": SQL_USERS_MODAL_TYPE,
    "users_intersect": SQL_USERS_INTERSECT,
    "events_corr": SQL_EVENTS_CORR,
    "events_regression": SQL_EVENTS_REGRESSION,
    "orders_shipping_priority": SQL_ORDERS_SHIPPING_PRIORITY,
    "promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
    "user_retention": SQL_USER_RETENTION,
    "events_transitions": SQL_EVENTS_TRANSITIONS,
    "events_entropy": SQL_EVENTS_ENTROPY,
    "edit_distance_pairs": SQL_EDIT_DISTANCE_PAIRS,
    "allpairs_jaccard": SQL_ALLPAIRS_JACCARD,
    "events_users_by_type": SQL_EVENTS_USERS_BY_TYPE,
    "sliding_distinct_users": SQL_SLIDING_DISTINCT_USERS,
    "cooccur_topk": SQL_COOCCUR_TOPK,
    "user_paths": SQL_USER_PATHS,
    "supplier_variety": SQL_SUPPLIER_VARIETY,
    "events_mutual_info": SQL_EVENTS_MUTUAL_INFO,
    "orders_large": SQL_ORDERS_LARGE,
    "parts_above_brand_avg": SQL_PARTS_ABOVE_BRAND_AVG,
    "cumulative_distinct_users": SQL_CUMULATIVE_DISTINCT_USERS,
    "disjunctive_join_revenue": SQL_DISJUNCTIVE_JOIN_REVENUE,
    "time_to_convert": SQL_TIME_TO_CONVERT,
    "events_burst": SQL_EVENTS_BURST,
    "top_tokens_per_lang": SQL_TOP_TOKENS_PER_LANG,
    "orders_exists_late_ship": SQL_ORDERS_EXISTS_LATE_SHIP,
    "doc_length_deciles": SQL_DOC_LENGTH_DECILES,
    "events_day_over_day": SQL_EVENTS_DAY_OVER_DAY,
    "events_histogram": SQL_EVENTS_HISTOGRAM,
    "cust_order_distribution": SQL_CUST_ORDER_DISTRIBUTION,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "only_late_supplier": SQL_ONLY_LATE_SUPPLIER,
    "rich_inactive_custs": SQL_RICH_INACTIVE_CUSTS,
    "nation_pair_volume": SQL_NATION_PAIR_VOLUME,
    "nation_market_share": SQL_NATION_MARKET_SHARE,
    "part_profit_by_nation": SQL_PART_PROFIT_BY_NATION,
    "returned_item_customers": SQL_RETURNED_ITEM_CUSTOMERS,
    "late_priority_counts": SQL_LATE_PRIORITY_COUNTS,
    "top_supplier_revenue": SQL_TOP_SUPPLIER_REVENUE,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "vocab_growth": SQL_VOCAB_GROWTH,
    "supplier_pagerank": SQL_SUPPLIER_PAGERANK,
    "supplier_reach": SQL_SUPPLIER_REACH,
    "supplier_hits": SQL_SUPPLIER_HITS,
    "events_unpivot": SQL_EVENTS_UNPIVOT,
    "source_checksum": SQL_SOURCE_CHECKSUM,
    "events_anomaly_days": SQL_EVENTS_ANOMALY_DAYS,
    "min_cost_supplier": SQL_MIN_COST_SUPPLIER,
    "important_stock": SQL_IMPORTANT_STOCK,
    "dominant_suppliers": SQL_DOMINANT_SUPPLIERS,
    "doc_fluency": SQL_DOC_FLUENCY,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "gopher_filter": SQL_GOPHER_FILTER,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "dsir_score": SQL_DSIR_SCORE,
    "dsir_select": SQL_DSIR_SELECT,
    "dsir_resample": SQL_DSIR_RESAMPLE,
    "nb_classify": SQL_NB_CLASSIFY,
    "nb_confusion": SQL_NB_CONFUSION,
    "lm_perplexity": SQL_LM_PERPLEXITY,
    "ccnet_buckets": SQL_CCNET_BUCKETS,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "winnow_dup_pairs": SQL_WINNOW_DUP_PAIRS,
    "cdc_chunks": SQL_CDC_CHUNKS,
    "cdc_dedup_ratio": SQL_CDC_DEDUP_RATIO,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "pq_codes": SQL_PQ_CODES,
    "pq_adc_topk": SQL_PQ_ADC_TOPK,
    "source_kl": SQL_SOURCE_KL,
    "zipf_fit": SQL_ZIPF_FIT,
    "embedding_outliers": SQL_EMBEDDING_OUTLIERS,
    "doc_novelty": SQL_DOC_NOVELTY,
    "media_audio": SQL_MEDIA_AUDIO,
    "doc_token_entropy": SQL_DOC_TOKEN_ENTROPY,
    "doc_clean": SQL_DOC_CLEAN,
    "curate_pipeline": _curate_sql(),
    "curate_export": _curate_export_sql(),
    "dsir_auc": SQL_DSIR_AUC,
    "user_streaks": SQL_USER_STREAKS,
    "doc_length_gini": SQL_DOC_LENGTH_GINI,
    "events_autocorr": SQL_EVENTS_AUTOCORR,
    "langid_confusion": SQL_LANGID_CONFUSION,
    # minhash_pairs / simhash_groups / lsh_ann / ivf_ann / media_decode /
    # media_features / crawl_lineage / doc_spans: non-SQL-expressible
    # (probabilistic, stateful, or nested output) -> rows-only check.
}
