"""Driver-contract query catalog: one entry per operator/pipeline, each
with a DuckDB oracle-SQL twin (see __ray_entry__.py).

Conventions that make the driver's order-insensitive value-hash compare
work:

* every computed column is NAMED identically in the Ray code and the SQL;
* float aggregates whose accumulation ORDER differs between engines are
  rounded on BOTH sides with half-away-from-zero (DuckDB ``ROUND``
  semantics — numpy's ``round`` is half-even and would disagree on exact
  boundaries);
* exact integer ratios / copies are NOT rounded (same float64 division on
  both sides is bit-identical);
* tie-prone orderings always carry a deterministic tiebreak column.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SESSION_GAP_S = 1800
ROLL_WINDOW_S = 3600


def _rd():
    import ray.data as rd

    return rd


def read_table(sf_dir: str, name: str, columns=None, num_blocks: int | None = None):
    """``num_blocks`` caps the read split for SMALL tables where
    per-block pipeline overhead exceeds the compute (measured: a
    handful of chunky blocks is ~2-3x faster than the min-blocks
    default on few-MB inputs). Leave unset for anything that grows
    with scale — real reads split by bytes."""
    kwargs = {}
    if num_blocks is not None:
        kwargs["override_num_blocks"] = num_blocks
    return _rd().read_parquet(f"{sf_dir}/{name}.parquet", columns=columns,
                              **kwargs)


#: compiled flatten plans per (spec, scale dir) — discovery is a
#: driver-side constant a repeated pipeline should pay once. Backed by a
#: DISK cache so FRESH processes (driver sweeps, bench levels) skip the
#: 1-3 s schema-sample too; safe because every fixture is deterministic
#: per directory path, which is part of the key.
_PLAN_CACHE: dict = {}
_PLAN_DISK_ROOT = "/tmp/transmog_ray_plans"


def _cached_plan(key: tuple, compute):
    """Process cache → disk cache → compute (and persist)."""
    import hashlib
    import os
    import pickle

    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    digest = hashlib.sha256(repr(key).encode()).hexdigest()[:20]
    path = os.path.join(_PLAN_DISK_ROOT, f"{digest}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                plan = pickle.load(f)
            _PLAN_CACHE[key] = plan
            return plan
        except Exception:
            pass  # torn/stale cache file → recompute below
    plan = compute()
    _PLAN_CACHE[key] = plan
    os.makedirs(_PLAN_DISK_ROOT, exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump(plan, f)
        os.replace(tmp, path)
    except Exception:
        pass  # cache write is best-effort
    return plan


def read_small(sf_dir: str, name: str, columns=None) -> pd.DataFrame:
    """Driver-side pandas load of a SMALL (dimension/broadcast) table via
    pyarrow directly — no Dataset, no task launch. Only for sides that
    are about to be broadcast (ray.put) anyway; fact tables go through
    :func:`read_table` and stay distributed."""
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{sf_dir}/{name}.parquet", columns=list(columns) if columns else None
    ).to_pandas()


def round_half_away(x, decimals: int):
    """DuckDB ROUND semantics (half away from zero)."""
    m = 10.0 ** decimals
    return np.trunc(np.asarray(x, dtype=np.float64) * m + np.copysign(0.5, x)) / m


# ================================================================ TPC-H-ish


def q_pricing_summary(sf_dir: str):
    """Q1-style pricing summary over lineitem (partial pre-agg + groupby)."""
    from ..functions.relational import grouped_agg

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
        num_blocks=16,
    )

    def revenue(t):
        import datetime

        import pyarrow.compute as pc

        t = t.filter(pc.less(t["l_shipdate"],
                             datetime.datetime(1998, 9, 1)))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(revenue, batch_format="pyarrow")
    # 6 output groups: a handful of combine buckets beats 64 (the
    # combine input is one row per key per upstream block)
    agg = grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "avg_qty": ("l_quantity", "mean"),
            "avg_price": ("l_extendedprice", "mean"),
            "count_order": ("l_orderkey", "count"),
        },
        num_buckets=8,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_price"):
            df[c] = round_half_away(df[c], 2)
        return df

    return agg.map_batches(finish, batch_format="pandas")


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       ROUND(SUM(l_quantity) / COUNT(l_quantity), 2)      AS avg_qty,
       ROUND(SUM(l_extendedprice) / COUNT(l_extendedprice), 2) AS avg_price,
       COUNT(l_orderkey)                                  AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_user_top_type(sf_dir: str):
    """Per-user dominant event type: argmax of counts with a
    deterministic smaller-value tie-break (grouped_mode)."""
    from ..functions.relational import grouped_mode

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"], num_blocks=8)
    return grouped_mode(ev, ["user_id"], "event_type", out_col="top_type")


SQL_USER_TOP_TYPE = """
SELECT user_id, event_type AS top_type, CAST(cnt AS BIGINT) AS n
FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type ASC) AS rn
  FROM events WHERE event_type IS NOT NULL
  GROUP BY user_id, event_type
)
WHERE rn = 1
"""


def q_suppliers_by_region(sf_dir: str):
    """supplier ⋈ nation ⋈ region rollup: supplier count + mean account
    balance per region. The two-hop dimension chain is merged driver-side
    and broadcast once; the fact side streams through one tiny exchange."""
    from ..functions.relational import broadcast_join, grouped_agg

    sup = read_table(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ].rename(columns={"n_nationkey": "s_nationkey"})
    joined = broadcast_join(sup, dim, on="s_nationkey")
    agg = grouped_agg(joined, ["r_name"], {
        "n_suppliers": ("s_suppkey", "count"),
        "sum_balance": ("s_acctbal", "sum"),
    }, num_buckets=8)
    # round the SUM, not the mean: acctbal is fixed-2-decimal, so the true
    # sum sits ON the 0.01 grid and a ≤1e-4 accumulation-order skew can't
    # cross a rounding boundary — whereas the mean can land exactly on a
    # half boundary and flip between engines (seen at sf0.1)
    return agg.map_batches(
        lambda df: df.assign(
            avg_balance=round_half_away(df["sum_balance"], 2) / df["n_suppliers"]
        ).drop(columns=["sum_balance"]),
        batch_format="pandas",
    )


SQL_SUPPLIERS_BY_REGION = """
SELECT r_name,
       CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers,
       ROUND(SUM(s_acctbal), 2) / COUNT(s_suppkey) AS avg_balance
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus): finest grain +
    per-returnflag subtotals + grand total via the aggregation lattice
    (raw rows shuffled once; subtotal levels re-aggregate partials)."""
    from ..functions.relational import rollup_agg

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"],
                    num_blocks=16)
    out = rollup_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("l_quantity", "sum"), "n_items": ("l_quantity", "count")},
    )
    return out.map_batches(
        lambda df: df.assign(sum_qty=round_half_away(df["sum_qty"], 2)),
        batch_format="pandas",
    )


SQL_ROLLUP_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)            AS sum_qty,
       CAST(COUNT(l_quantity) AS BIGINT)    AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_pricing(sf_dir: str):
    """GROUP BY CUBE (l_returnflag, l_linestatus): all four grouping
    sets via the aggregation lattice — raw rows shuffle once at the
    finest grain; each subset re-aggregates a one-key-larger,
    already-aggregated parent (the per-linestatus level costs a
    group-cardinality exchange, not a second scan)."""
    from ..functions.relational import cube_agg

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"],
                    num_blocks=16)
    out = cube_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("l_quantity", "sum"), "n_items": ("l_quantity", "count")},
    )
    return out.map_batches(
        lambda df: df.assign(sum_qty=round_half_away(df["sum_qty"], 2)),
        batch_format="pandas",
    )


SQL_CUBE_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)            AS sum_qty,
       CAST(COUNT(l_quantity) AS BIGINT)    AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: promo-part revenue share per month — broadcast
    part dimension (ray.put once), conditional partial aggregation below
    the combine, exact to the SQL conditional-SUM form."""
    from ..functions.relational import broadcast_join, grouped_agg

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice", "l_discount",
                             "l_shipdate"],
                    num_blocks=8)
    part = read_small(sf_dir, "part", columns=["p_partkey", "p_type"])
    part = part.rename(columns={"p_partkey": "l_partkey"})
    joined = broadcast_join(li, part, on="l_partkey")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        return pd.DataFrame({
            "month": df["l_shipdate"].dt.strftime("%Y-%m"),
            "rev": rev,
            "promo_rev": rev.where(df["p_type"] == "PROMO", 0.0),
        })

    agg = grouped_agg(
        joined.map_batches(prep, batch_format="pandas"),
        ["month"],
        {"sum_rev": ("rev", "sum"), "sum_promo": ("promo_rev", "sum")},
        num_buckets=8,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # round each SUM, not the ratio: true revenue sums are exact
        # 4-decimal multiples (2-dec price × 2-dec (1-discount)), so the
        # ~1e-8 accumulation skew can never flip ROUND(sum, 4); the
        # division of identical rounded float64s is then bit-identical
        # on both sides — rounding the RATIO can land on a half boundary
        return pd.DataFrame({
            "month": df["month"],
            "promo_share": 100.0 * round_half_away(df["sum_promo"], 4)
            / round_half_away(df["sum_rev"], 4),
        })

    return agg.map_batches(finish, batch_format="pandas")


SQL_PROMO_REVENUE = """
SELECT strftime(l_shipdate, '%Y-%m') AS month,
       100.0 * ROUND(SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 4)
             / ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
           AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY month
"""


def q_late_orders(sf_dir: str):
    """TPC-H Q4 shape (EXISTS → distributed semi join): orders with at
    least one lineitem shipped more than 90 days after the order date,
    counted per priority. The late-orderkey set comes from a
    distributed join (order dates broadcast to the lineitem scan), is
    distinct-compressed per batch, and drives a broadcast semi join."""
    import ray

    from ..functions.relational import broadcast_join, grouped_agg, semi_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"],
                        num_blocks=8)
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"], num_blocks=8)
    dates = read_small(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    dates = dates.rename(columns={"o_orderkey": "l_orderkey"})
    tagged = broadcast_join(li, dates, on="l_orderkey")
    late_keys = (
        tagged.map_batches(
            lambda df: df.loc[
                df["l_shipdate"] > df["o_orderdate"] + pd.Timedelta(days=90),
                ["l_orderkey"],
            ].drop_duplicates().rename(columns={"l_orderkey": "o_orderkey"}),
            batch_format="pandas",
        ).to_pandas().drop_duplicates()
    )
    kept = semi_join(orders, late_keys, on="o_orderkey")
    return grouped_agg(kept, ["o_orderpriority"],
                       {"n_late": ("o_orderkey", "count")}, num_buckets=4)


SQL_LATE_ORDERS = """
SELECT o_orderpriority, CAST(COUNT(o_orderkey) AS BIGINT) AS n_late
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
"""


def q_revenue_by_nation(sf_dir: str):
    """lineitem ⋈ orders ⋈ customer ⋈ nation revenue rollup. Both FACT
    tables (lineitem, orders) stay distributed — they meet in a
    partitioned hash join; only the customer→nation dimension chain is
    broadcast (small side, shipped once via ray.put)."""
    from ..functions.relational import broadcast_join, grouped_agg, hash_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"],
                    num_blocks=8)
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ].rename(columns={"c_custkey": "o_custkey"})

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8)
    order_nation = broadcast_join(orders, dim, on="o_custkey").map_batches(
        lambda df: df[["o_orderkey", "n_name"]].rename(
            columns={"o_orderkey": "l_orderkey"}
        ),
        batch_format="pandas",
    )

    # aggregate pushdown BELOW the join: a map-side (no-shuffle) partial
    # per (batch, orderkey) shrinks the fact side to ~one row per order
    # before the exchange — sums/counts decompose exactly, so the result
    # is identical while the join moves ~4x fewer rows
    def per_order_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.assign(rev=rev).groupby("l_orderkey", sort=False)
        return pd.DataFrame({
            "rev_part": g["rev"].sum(),
            "n_part": g["rev"].size(),
        }).reset_index()

    # join+aggregate FUSION: the per-nation rollup decomposes, so it
    # runs inside each join reduce task (post_fn) — only ≤25 partial
    # rows per bucket ever leave the join; the joined rows never do
    def per_nation_partial(out: pd.DataFrame) -> pd.DataFrame:
        g = out.groupby("n_name", sort=False)
        return pd.DataFrame({
            "rev_part": g["rev_part"].sum(min_count=1),
            "n_part": g["n_part"].sum(min_count=1),
        }).reset_index()

    li_part = li.map_batches(per_order_partial, batch_format="pandas")
    ds = hash_join(li_part, order_nation, on="l_orderkey", num_buckets=16,
                   post_fn=per_nation_partial)
    agg = grouped_agg(ds, ["n_name"], {"revenue": ("rev_part", "sum"),
                                       "n_items": ("n_part", "sum")},
                      num_buckets=8)
    return agg.map_batches(
        lambda df: df.assign(revenue=round_half_away(df["revenue"], 2),
                             n_items=df["n_items"].astype("int64")),
        batch_format="pandas",
    )


SQL_REVENUE_NATION = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(l_orderkey) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_customers(sf_dir: str):
    """Top-10 customers by total order value (groupby + global top-k)."""
    from ..functions.relational import grouped_agg, topk

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderkey"])
    agg = grouped_agg(
        orders, ["o_custkey"],
        {"total_spent": ("o_totalprice", "sum"), "n_orders": ("o_orderkey", "count")}, num_buckets=8,)
    agg = agg.map_batches(
        lambda df: df.assign(total_spent=round_half_away(df["total_spent"], 2)),
        batch_format="pandas",
    )
    return topk(agg, by=["total_spent", "o_custkey"], k=10, descending=True)


SQL_TOP_CUSTOMERS = """
SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spent,
       COUNT(o_orderkey) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY total_spent DESC, o_custkey DESC LIMIT 10
"""


def q_filter_high_value(sf_dir: str):
    """Vectorized filter + projection."""
    import pyarrow.compute as pc

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"])
    return ev.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["value"], 30),
                    pc.equal(t["event_type"], "purchase"))
        ).select(["event_id", "user_id", "ts", "value"]),
        batch_format="pyarrow",
    )


SQL_FILTER_HIGH_VALUE = """
SELECT event_id, user_id, ts, value FROM events
WHERE value > 30 AND event_type = 'purchase'
"""


def q_events_by_type(sf_dir: str):
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])
    agg = grouped_agg(
        ev, ["event_type"],
        {
            "n": ("event_id", "count"),
            "sum_value": ("value", "sum"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        }, num_buckets=8,)
    return agg.map_batches(
        lambda df: df.assign(sum_value=round_half_away(df["sum_value"], 2)),
        batch_format="pandas",
    )


SQL_EVENTS_BY_TYPE = """
SELECT event_type, COUNT(event_id) AS n, ROUND(SUM(value), 2) AS sum_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type
"""


def q_salted_revenue(sf_dir: str):
    """Hot-key aggregation via explicit salting (l_returnflag has only 3
    values — the degenerate-skew case); result equals the unsalted path."""
    from ..functions.skew import salted_grouped_agg

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    agg = salted_grouped_agg(
        li, ["l_returnflag"],
        {
            "sum_price": ("l_extendedprice", "sum"),
            "n": ("l_quantity", "count"),
            "max_qty": ("l_quantity", "max"),
        },
        num_salts=8, num_buckets=8,)
    return agg.map_batches(
        lambda df: df.assign(sum_price=round_half_away(df["sum_price"], 2)),
        batch_format="pandas",
    )


SQL_SALTED_REVENUE = """
SELECT l_returnflag, ROUND(SUM(l_extendedprice), 2) AS sum_price,
       COUNT(l_quantity) AS n, MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


def q_distinct_langs(sf_dir: str):
    """Distinct values (set op) — Ray ``unique`` over a projected read."""
    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    vals = sorted(docs.unique("source"))
    return pd.DataFrame({"source": pd.Series(vals, dtype="object")})


SQL_DISTINCT_LANGS = """
SELECT DISTINCT source FROM documents
"""


def q_orders_by_month(sf_dir: str):
    """Date-function scalar work (month truncation) + aggregation."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice", "o_orderkey"])
    orders = orders.map_batches(
        lambda df: df.assign(
            month=df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
            .astype("datetime64[us]")  # match DuckDB timestamp precision
        ),
        batch_format="pandas",
    )
    agg = grouped_agg(
        orders, ["month"],
        {"n_orders": ("o_orderkey", "count"), "revenue": ("o_totalprice", "sum")}, num_buckets=8,)
    return agg.map_batches(
        lambda df: df.assign(revenue=round_half_away(df["revenue"], 2)),
        batch_format="pandas",
    )


SQL_ORDERS_BY_MONTH = """
SELECT date_trunc('month', o_orderdate) AS month,
       COUNT(o_orderkey) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-style: segment filter, 3-table join, revenue rollup,
    top-10. The orders FACT side stays distributed (semi-join against the
    broadcast BUILDING customer-key set, then a partitioned hash join
    with lineitem); only the customer key set is broadcast."""
    from ..functions.relational import grouped_agg, hash_join, semi_join, topk

    cust = read_small(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    building = cust[cust["c_mktsegment"] == "BUILDING"][["c_custkey"]].rename(
        columns={"c_custkey": "o_custkey"}
    )
    cutoff = pd.Timestamp("1997-06-30")
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"],
                        num_blocks=8)
    dim = semi_join(orders, building, on="o_custkey").map_batches(
        lambda df: df.loc[df["o_orderdate"] < cutoff,
                          ["o_orderkey", "o_orderdate"]].rename(
            columns={"o_orderkey": "l_orderkey"}
        ),
        batch_format="pandas",
    )

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount", "l_shipdate"], num_blocks=8)

    def per_order_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cutoff]
        rev = (df["l_extendedprice"] * (1 - df["l_discount"]))
        return (pd.DataFrame({"l_orderkey": df["l_orderkey"],
                              "rev_part": rev})
                .groupby("l_orderkey", sort=False)["rev_part"]
                .sum(min_count=1).reset_index())

    li_part = li.map_batches(per_order_partial, batch_format="pandas")

    # join+aggregate FUSION: the group key starts with the join key, so
    # each bucket's rollup is COMPLETE — no second aggregate exchange,
    # only ≤10-candidate top-k partials leave each join task
    def per_bucket(out: pd.DataFrame) -> pd.DataFrame:
        g = (out.groupby(["l_orderkey", "o_orderdate"], sort=False)
             ["rev_part"].sum(min_count=1).reset_index())
        g["revenue"] = round_half_away(g["rev_part"], 2)
        return g[["l_orderkey", "o_orderdate", "revenue"]]

    joined = hash_join(li_part, dim, on="l_orderkey", num_buckets=16,
                       post_fn=per_bucket)
    return topk(joined, by=["revenue", "l_orderkey"], k=10,
                descending=True)


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-30'
  AND l_shipdate  > TIMESTAMP '1997-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey DESC
LIMIT 10
"""


MEDIA_FIXTURE_ROOT = "/tmp/transmog_ray_media"
MEDIA_CURRENT = f"{MEDIA_FIXTURE_ROOT}/current"


def _media_fixture(sf_dir: str) -> str:
    """Scale-keyed deterministic media fixture + stable symlink the static
    oracle SQL reads (same pattern as the pages fixture)."""
    import os

    from ..stages.multimodal import write_media

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(scale, 64)
    media_dir = write_media(f"{MEDIA_FIXTURE_ROOT}/{scale}", n=n)
    _repoint_current(media_dir, MEDIA_CURRENT)
    return media_dir


def q_media_features(sf_dir: str):
    """Multimodal plumbing: exact byte-histogram sufficient statistics over
    the media BLOB table via the actor-pool decode stage (codec stubbed;
    the integer histogram IS the deterministic fallback decode). Exploded
    all-integer rows hash-compare against a DuckDB oracle that recomputes
    the histogram from per-byte fixture rows."""
    from ..stages.multimodal import media_histogram

    media_dir = _media_fixture(sf_dir)
    media = _rd().read_parquet(f"{media_dir}/media.parquet")
    return media_histogram(media, concurrency=2, batch_size=32)


SQL_MEDIA_FEATURES = f"""
SELECT b.id,
       m.media_type,
       'byte-histogram-stub' AS decoder,
       b.byteval // 16 AS bucket,
       COUNT(*) AS count,
       octet_length(m.payload) AS blob_len
FROM read_parquet('{MEDIA_CURRENT}/media_bytes_v2.parquet') b
JOIN read_parquet('{MEDIA_CURRENT}/media.parquet') m USING (id)
GROUP BY b.id, m.media_type, octet_length(m.payload), b.byteval // 16
"""


def q_audio_features(sf_dir: str):
    """Multimodal AUDIO path: windowed energy statistics per 256-sample
    int16 window over audio-typed payloads (actor-pool stage; the
    'decode' is the deterministic PCM interpretation — real codecs are
    stubbed). All-integer exploded rows hash-compare against a DuckDB
    oracle that re-decodes the same samples from per-byte fixture rows
    (byte parity → int16, two's complement)."""
    from ..stages.multimodal import audio_features

    media_dir = _media_fixture(sf_dir)
    media = _rd().read_parquet(f"{media_dir}/media.parquet")
    audio = media.map_batches(
        lambda df: df[df["media_type"] == "audio"], batch_format="pandas"
    )
    return audio_features(audio, window=256, concurrency=2, batch_size=32)


SQL_AUDIO_FEATURES = f"""
WITH b AS (
  SELECT t.id, t.pos, t.byteval
  FROM read_parquet('{MEDIA_CURRENT}/media_bytes_v2.parquet') t
  JOIN read_parquet('{MEDIA_CURRENT}/media.parquet') m USING (id)
  WHERE m.media_type = 'audio'
), lo AS (
  SELECT id, pos // 2 AS si, byteval AS v FROM b WHERE pos % 2 = 0
), hi AS (
  SELECT id, pos // 2 AS si, byteval AS v FROM b WHERE pos % 2 = 1
), s AS (
  SELECT lo.id, lo.si,
         lo.v + 256 * hi.v
         - CASE WHEN hi.v >= 128 THEN 65536 ELSE 0 END AS sample
  FROM lo JOIN hi ON lo.id = hi.id AND lo.si = hi.si
)
SELECT id,
       si // 256 AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(ABS(sample)) AS BIGINT) AS sum_abs,
       CAST(MAX(ABS(sample)) AS BIGINT) AS max_abs
FROM s GROUP BY id, si // 256
"""


def q_video_frame_plan(sf_dir: str):
    """Multimodal VIDEO path: the frame-sampling PLAN (which frames a
    real decoder would extract, from the meta JSON sidecar's duration
    and fps) for video-typed media — one row per sampled frame. Exact
    integer/float arithmetic on both sides (durations are whole
    seconds, fps 25.0), so the plan hash-matches a DuckDB oracle that
    parses the same JSON."""
    from ..stages.multimodal import FrameSampleStage

    media_dir = _media_fixture(sf_dir)
    media = _rd().read_parquet(f"{media_dir}/media.parquet")
    video = media.map_batches(
        lambda df: df[df["media_type"] == "video"], batch_format="pandas"
    )
    return video.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_n_seconds": 1.0, "max_frames": 8},
        batch_format="pandas",
        batch_size=32,
        concurrency=2,
    )


SQL_VIDEO_FRAME_PLAN = f"""
WITH v AS (
  SELECT id,
         CAST(json_extract(meta, '$.duration_s') AS DOUBLE) AS duration,
         CAST(json_extract(meta, '$.fps') AS DOUBLE) AS fps
  FROM read_parquet('{MEDIA_CURRENT}/media.parquet')
  WHERE media_type = 'video'
), n AS (
  SELECT id, fps,
         LEAST(8, GREATEST(1, CAST(FLOOR(duration / 1.0) AS BIGINT))) AS nf
  FROM v
)
SELECT id,
       CAST(FLOOR(u.k * 1.0 * fps) AS BIGINT) AS frame_index,
       u.k * 1.0 AS frame_ts_s
FROM n, unnest(range(0, nf)) AS u(k)
"""


def q_bloom_urgent_lineitems(sf_dir: str):
    """Bloom pre-filter + exact verify: lineitems of URGENT orders,
    rolled up per returnflag. The Bloom filter (fixed-size bit array
    regardless of key-set size, zero false negatives) drops ~all
    non-matching rows before the exact membership probe — the broadcast
    shape when the key SET is too big to ship; the exact verify keeps
    the result identical to a plain semi join."""
    from ..functions.relational import (
        bloom_prefilter, grouped_agg, semi_join,
    )

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity", "l_returnflag"],
                    num_blocks=8)
    orders = read_small(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])
    keys = orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_orderkey"]
    pre = bloom_prefilter(li, keys, on="l_orderkey")
    exact = semi_join(pre, keys.to_frame("l_orderkey"), on="l_orderkey")
    agg = grouped_agg(
        exact, ["l_returnflag"],
        {"n_items": ("l_orderkey", "count"), "sum_qty": ("l_quantity", "sum")},
        num_buckets=4,
    )
    return agg.map_batches(
        lambda df: df.assign(sum_qty=round_half_away(df["sum_qty"], 2)),
        batch_format="pandas",
    )


SQL_BLOOM_URGENT = """
SELECT l_returnflag,
       CAST(COUNT(l_orderkey) AS BIGINT) AS n_items,
       ROUND(SUM(l_quantity), 2)         AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


def q_semi_anti_purchasers(sf_dir: str):
    """Semi + anti join via a broadcast key set: each event is flagged
    semi/anti against the (small, deduped) purchaser key set inside
    ``map_batches``, then ONE distributed grouped aggregation produces
    both per-user counts — no driver-side merge of user-cardinality
    frames."""
    import ray

    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    purchasers = set(
        ev.map_batches(
            lambda df: df[df["event_type"] == "purchase"][["user_id"]]
            .drop_duplicates(),
            batch_format="pandas",
        ).unique("user_id")
    )
    ref = ray.put(purchasers)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        is_semi = df["user_id"].isin(ray.get(ref))
        return df.assign(semi=is_semi.astype("int64"),
                         anti=(~is_semi).astype("int64"))

    flagged = ev.map_batches(flag, batch_format="pandas")
    agg = grouped_agg(flagged, ["user_id"],
                      {"n_semi": ("semi", "sum"), "n_anti": ("anti", "sum")}, num_buckets=8)
    return agg.map_batches(
        lambda df: df.astype({"n_semi": "int64", "n_anti": "int64"}),
        batch_format="pandas",
    )


SQL_SEMI_ANTI = """
SELECT user_id,
       SUM(CASE WHEN user_id IN (SELECT user_id FROM events
                                 WHERE event_type = 'purchase')
                THEN 1 ELSE 0 END)::BIGINT AS n_semi,
       SUM(CASE WHEN user_id NOT IN (SELECT user_id FROM events
                                     WHERE event_type = 'purchase')
                THEN 1 ELSE 0 END)::BIGINT AS n_anti
FROM events GROUP BY user_id
"""


# ============================================================== flattening


def q_flatten_events(sf_dir: str):
    """transmog-style flatten of the props JSON column (main table)."""
    from ..core.config import FlattenConfig
    from ..stages.flatten import FlattenSpec, flatten_dataset

    # the events table is a few MB at every test sf: a handful of
    # chunky blocks beats the min-blocks default (per-block pipeline
    # overhead > flatten compute here; measured 2x at sf0.1). Real
    # 100 TB inputs size blocks by bytes, not this override.
    ev = _rd().read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"],
        override_num_blocks=8,
    )
    spec = FlattenSpec(
        entity="events",
        config=FlattenConfig(id_generation=("event_id",), time_field=None),
        json_col="props",
        record_cols=("event_id",),
        passthrough=("event_id",),
    )
    # plan discovery is a per-call driver-side constant (schema sample);
    # a production pipeline compiles once — cached per scale dir, disk-
    # backed so fresh processes skip it too
    from ..stages.flatten import plan_from_dataset

    plan = _cached_plan(("events_props", sf_dir),
                        lambda: plan_from_dataset(ev, spec))
    flat, plan = flatten_dataset(ev, spec, emit="main", plan=plan)
    return flat.map_batches(
        lambda df: df[["event_id", "props_k"]].astype(
            {"props_k": "int64" if df["props_k"].notna().all() else "Int64"}
        ),
        batch_format="pandas",
    )


SQL_FLATTEN_EVENTS = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
FROM events
"""


# ======================================================== windowed features


def q_lag_lead_events(sf_dir: str):
    from ..stages.partition import apply_sorted
    from ..stages.window import with_lag, with_lead

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = with_lag(df, "user_id", ["value"])
        return with_lead(df, "user_id", ["value"])

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_LAG_LEAD = """
SELECT event_id, user_id, ts, value,
       LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lag1,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lead1
FROM events
"""


def q_sessionize_events(sf_dir: str):
    from ..stages.partition import apply_sorted
    from ..stages.window import sessionize

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"], num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return sessionize(df, "user_id", "ts", gap_seconds=SESSION_GAP_S)

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_SESSIONIZE = f"""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT event_id, user_id, ts,
         CAST(SUM(is_new) OVER w2 - 1 AS BIGINT) AS session_seq,
         MAX(CASE WHEN is_new = 1 THEN ts END) OVER w2 AS session_start
  FROM flagged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id, ts, session_seq,
       CAST(user_id AS VARCHAR) || '|' || CAST(epoch_us(session_start) AS VARCHAR)
           AS session_id
FROM numbered
"""


def q_session_summary(sf_dir: str):
    """Sessionize + per-session aggregate FUSED in one sorted-partition
    pass (sessions are key-local, so no second shuffle)."""
    from ..stages.partition import apply_sorted
    from ..stages.window import sessionize

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"], num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = sessionize(df, "user_id", "ts", gap_seconds=SESSION_GAP_S)
        g = df.groupby(["user_id", "session_id"], sort=False)
        out = pd.DataFrame(
            {
                "n_events": g["event_id"].count().astype("int64"),
                "duration_us": (
                    (g["ts"].max().astype("datetime64[ns]").astype("int64")
                     - g["ts"].min().astype("datetime64[ns]").astype("int64"))
                    // 1000
                ),
                "sum_value": g["value"].sum(),
            }
        ).reset_index()
        out["sum_value"] = round_half_away(out["sum_value"], 2)
        return out

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_SESSION_SUMMARY = f"""
WITH flagged AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT event_id, user_id, ts, value,
         MAX(CASE WHEN is_new = 1 THEN ts END) OVER w2 AS session_start
  FROM flagged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)
)
SELECT user_id,
       CAST(user_id AS VARCHAR) || '|' || CAST(epoch_us(session_start) AS VARCHAR)
           AS session_id,
       COUNT(event_id) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       ROUND(SUM(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


def q_union_lang_counts(sf_dir: str):
    """Set op: UNION ALL of two readings of documents, then aggregate."""
    from ..functions.relational import grouped_agg

    a = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    b = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return grouped_agg(a.union(b), ["lang"], {"n_docs": ("doc_id", "count")}, num_buckets=8)


SQL_UNION_LANG = """
SELECT lang, COUNT(doc_id) AS n_docs
FROM (SELECT doc_id, lang FROM documents
      UNION ALL SELECT doc_id, lang FROM documents)
GROUP BY lang
"""


def _user_days_of_type(sf_dir: str, event_type: str):
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"],
                    num_blocks=8)

    def project(df: pd.DataFrame, t=event_type) -> pd.DataFrame:
        df = df[df["event_type"] == t]
        return pd.DataFrame({
            "user_id": df["user_id"],
            "day": df["ts"].dt.floor("D"),
        })

    return ev.map_batches(project, batch_format="pandas")


def q_intersect_users(sf_dir: str):
    """Distributed INTERSECT (distinct set semantics) on a composite
    row: (user, day) pairs with BOTH a click and a purchase — one
    co-bucketed exchange, bucket-local min/max-of-side resolve."""
    from ..functions.relational import set_op

    return set_op(_user_days_of_type(sf_dir, "click"),
                  _user_days_of_type(sf_dir, "purchase"),
                  "intersect", num_buckets=8)


SQL_INTERSECT_USERS = """
SELECT user_id, date_trunc('day', ts) AS day FROM events
WHERE event_type = 'click'
INTERSECT
SELECT user_id, date_trunc('day', ts) AS day FROM events
WHERE event_type = 'purchase'
"""


def q_except_users(sf_dir: str):
    """Distributed EXCEPT: (user, day) pairs that clicked but did NOT
    purchase that day — the churn/negative-cohort complement of the
    INTERSECT query, same single exchange."""
    from ..functions.relational import set_op

    return set_op(_user_days_of_type(sf_dir, "click"),
                  _user_days_of_type(sf_dir, "purchase"),
                  "except", num_buckets=8)


SQL_EXCEPT_USERS = """
SELECT user_id, date_trunc('day', ts) AS day FROM events
WHERE event_type = 'click'
EXCEPT
SELECT user_id, date_trunc('day', ts) AS day FROM events
WHERE event_type = 'purchase'
"""


def q_profile_orders(sf_dir: str):
    """ANALYZE-style column profile of the orders table (row/null
    counts, exact distinct counts via the value-lattice exchange, raw
    typed min/max rendered to VARCHAR at the end). BIGINT and VARCHAR
    columns only — their str() rendering is DuckDB-CAST-exact."""
    from ..functions.relational import profile_table

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
        num_blocks=8,
    )
    return profile_table(
        orders, ["o_orderkey", "o_custkey", "o_orderpriority"]
    )


SQL_PROFILE_ORDERS = """
SELECT * FROM (
  SELECT 'o_orderkey' AS "column",
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
         CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
         CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
  FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
         MIN(o_orderpriority), MAX(o_orderpriority)
  FROM orders
)
ORDER BY "column"
"""


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds 250, with the customer key attached —
    join+aggregate fusion computes per-order sums INSIDE the join
    reduce tasks, the HAVING filter runs on the tiny aggregate."""
    from ..functions.relational import hash_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity"], num_blocks=8)
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"],
                        num_blocks=8).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby(["l_orderkey", "o_custkey"], sort=False)["l_quantity"]
            .agg(["sum", "size"]).reset_index()
        )
        agg = agg[agg["sum"] > 250]
        return pd.DataFrame({
            "o_orderkey": agg["l_orderkey"].astype("int64"),
            "o_custkey": agg["o_custkey"].astype("int64"),
            "total_qty": agg["sum"].astype("int64"),
            "n_items": agg["size"].astype("int64"),
        })

    return hash_join(li, orders, on="l_orderkey", num_buckets=16,
                     post_fn=per_order)


SQL_BIG_ORDERS = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_custkey
HAVING SUM(l_quantity) > 250
"""


def q_triangle_suppliers(sf_dir: str):
    """Distributed triangle counting (node-iterator / wedge closure)
    over the supplier co-occurrence graph: suppliers are connected when
    they supply the same order (URGENT orders of 1995-H1 keep the graph
    sparse). Three bounded exchanges — edge dedup, wedge generation by
    center node, wedge closure co-bucketed with the edge set — and only
    O(nodes) partials reach the final combine. Oracle: a 3-way SQL
    self-join over the same distinct edge list."""
    from ..functions.graph import triangle_counts

    return triangle_counts(_supplier_coedges(sf_dir), num_buckets=16)


def _supplier_coedges(sf_dir: str):
    """Supplier co-occurrence edge Dataset (src < dst pairs supplying
    the same 1995-H1 URGENT order) — shared by the triangle-count and
    clustering-coefficient queries."""
    from ..stages.partition import bucket_exchange

    sel = read_small(sf_dir, "orders",
                     columns=["o_orderkey", "o_orderpriority", "o_orderdate"])
    sel = sel[(sel["o_orderpriority"] == "1-URGENT")
              & (sel["o_orderdate"] >= pd.Timestamp("1995-01-01"))
              & (sel["o_orderdate"] < pd.Timestamp("1995-07-01"))]
    keys = set(sel["o_orderkey"])

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"],
                    num_blocks=8)
    li = li.map_batches(
        lambda df: df[df["l_orderkey"].isin(keys)], batch_format="pandas"
    )

    def order_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in df.groupby("l_orderkey", sort=False):
            sup = np.unique(grp["l_suppkey"].to_numpy())
            if len(sup) < 2:
                continue
            ai, bi = np.triu_indices(len(sup), k=1)
            out_a.append(sup[ai])
            out_b.append(sup[bi])
        if not out_a:
            return pd.DataFrame({"src": pd.Series(dtype="int64"),
                                 "dst": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "src": np.concatenate(out_a).astype(np.int64),
            "dst": np.concatenate(out_b).astype(np.int64),
        }).drop_duplicates()

    return bucket_exchange(li, ["l_orderkey"], order_pairs, 16)


SQL_TRIANGLE_SUPPLIERS = """
WITH sel AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1995-07-01'
), pairs AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
  JOIN sel ON a.l_orderkey = sel.o_orderkey
), tri AS (
  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.s1 = e1.s2
  JOIN pairs e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY node
"""


def q_heavy_users(sf_dir: str):
    """Exact share-threshold heavy hitters: users owning ≥ 0.75% of all
    events, found without a full distinct-key shuffle (per-batch
    local-share candidates by pigeonhole, then an exact recount of the
    candidate set only)."""
    from ..functions.skew import heavy_hitters

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"],
                    num_blocks=8).materialize()  # two passes by design
    return heavy_hitters(ev, "user_id", share=0.0075, num_buckets=8)


SQL_HEAVY_USERS = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id
HAVING COUNT(*) >= 0.0075 * (SELECT COUNT(*) FROM events)
"""


def q_pagerank_trade(sf_dir: str):
    """Distributed PageRank (2 power iterations, d=0.85) over the
    customer↔supplier trade graph derived from lineitem⋈orders (both
    arc directions, so no dangling nodes). Every step is a partitioned
    hash join + decomposable aggregation with join+agg fusion — ranks
    never sit on the driver."""
    from ..functions.graph import pagerank
    from ..functions.relational import hash_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"],
                    num_blocks=8)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(li, orders, on="l_orderkey", num_buckets=16)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        c = "c" + df["o_custkey"].astype(str)
        s = "s" + df["l_suppkey"].astype(str)
        fwd = pd.DataFrame({"src": c, "dst": s})
        rev = pd.DataFrame({"src": s, "dst": c})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = joined.map_batches(to_edges, batch_format="pandas")
    out = pagerank(edges, iterations=2, damping=0.85, num_buckets=16)
    return out.map_batches(
        lambda df: df.assign(pr=round_half_away(df["pr"], 6)),
        batch_format="pandas",
    )


SQL_PAGERANK_TRADE = """
WITH base AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
           FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn),
r1 AS (
  SELECT nd.node,
         (1.0 - 0.85) / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(r0.r / od.deg), 0) AS r
  FROM nodes nd
  LEFT JOIN edges e ON e.dst = nd.node
  LEFT JOIN r0 ON r0.node = e.src
  LEFT JOIN outdeg od ON od.src = e.src
  GROUP BY nd.node
),
r2 AS (
  SELECT nd.node,
         (1.0 - 0.85) / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(r1.r / od.deg), 0) AS r
  FROM nodes nd
  LEFT JOIN edges e ON e.dst = nd.node
  LEFT JOIN r1 ON r1.node = e.src
  LEFT JOIN outdeg od ON od.src = e.src
  GROUP BY nd.node
)
SELECT node, ROUND(r, 6) AS pr FROM r2
"""


def q_backfill_events(sf_dir: str):
    """Null out 'error' readings, forward-fill from the past per user."""
    from ..stages.partition import apply_sorted
    from ..stages.window import backfill

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"], num_blocks=8)
    ev = ev.map_batches(
        lambda df: df.assign(x=df["value"].where(df["event_type"] != "error")),
        batch_format="pandas",
    )

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return backfill(df, "user_id", ["x"])

    out = apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                       tiebreak=["event_id"])
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "ts", "x", "x_filled"]],
        batch_format="pandas",
    )


SQL_BACKFILL = """
WITH base AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type <> 'error' THEN value END AS x
  FROM events
)
SELECT event_id, user_id, ts, x,
       LAST_VALUE(x IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
       ) AS x_filled
FROM base
"""


def q_rolling_events(sf_dir: str):
    from ..stages.partition import apply_sorted
    from ..stages.window import rolling_agg

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = rolling_agg(df, "user_id", "ts", "value", ROLL_WINDOW_S,
                         aggs=("count", "mean"))
        df[f"value_w{ROLL_WINDOW_S}s_count"] = df[
            f"value_w{ROLL_WINDOW_S}s_count"
        ].astype("int64")
        df[f"value_w{ROLL_WINDOW_S}s_mean"] = round_half_away(
            df[f"value_w{ROLL_WINDOW_S}s_mean"], 4
        )
        return df

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_ROLLING = f"""
SELECT event_id, user_id, ts, value,
       COUNT(value) OVER w AS value_w{ROLL_WINDOW_S}s_count,
       ROUND(SUM(value) OVER w / COUNT(value) OVER w, 4)
           AS value_w{ROLL_WINDOW_S}s_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {ROLL_WINDOW_S} SECOND PRECEDING
                   AND CURRENT ROW)
"""


def q_running_events(sf_dir: str):
    """Expanding (cumulative) per-user aggregates: running sum / count /
    max of value in deterministic (ts, event_id) order — the SQL ROWS
    UNBOUNDED PRECEDING frame, computed in the same fused sorted pass as
    the other window features."""
    from ..stages.partition import apply_sorted
    from ..stages.window import running_agg

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return running_agg(df, "user_id", "value", aggs=("sum", "count", "max"))

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_RUNNING = """
SELECT event_id, user_id, ts, value,
       SUM(value) OVER w AS value_run_sum,
       CAST(COUNT(value) OVER w AS BIGINT) AS value_run_count,
       MAX(value) OVER w AS value_run_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_novelty_events(sf_dir: str):
    """Behavioral novelty: expanding COUNT(DISTINCT event_type) per user
    — not a SQL window aggregate, but equal to the running SUM of
    first-occurrence flags, computed in the same fused sorted pass."""
    from ..stages.partition import apply_sorted
    from ..stages.window import running_distinct

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"],
                    num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return running_distinct(df, "user_id", "event_type",
                                out_col="n_types_seen")

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_NOVELTY = """
SELECT event_id, user_id, ts, event_type,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
)
"""


def q_target_encode_events(sf_dir: str):
    """Point-in-time target encoding: each event gets the mean of the
    user's STRICTLY PRIOR values — the leakage-free mean-encoding a
    training pipeline needs (a row never sees its own target or a
    future one). Same fused sorted-bucket pass as the other windows."""
    from ..stages.partition import apply_sorted
    from ..stages.window import target_encode

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"],
                    num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # mean = ROUND(sum, 2) / count: the inputs are 2-decimal, so the
        # true prior sum is always ≥0.005 from a rounding boundary (the
        # ~1e-8 accumulation-order skew can't flip it), and the division
        # of identical float64s is bit-identical on both sides — rounding
        # the MEAN instead can land exactly on a boundary and amplify a
        # 1e-14 skew to 1e-4 (seen at sf0.01: 55.30625).
        df = target_encode(df, "user_id", "value", out_col="value_prior_mean")
        gkey = df["user_id"]
        ok = df["value"].notna().astype(np.int64)
        cnt = (
            ok.groupby(gkey, sort=False).cumsum()
            .groupby(gkey, sort=False).shift(1).fillna(0).to_numpy(np.int64)
        )
        psum = round_half_away(df["value_prior_mean"].to_numpy() * cnt, 2)
        with np.errstate(invalid="ignore"):
            df["value_prior_mean"] = np.where(cnt > 0, psum / cnt, np.nan)
        return df

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_TARGET_ENCODE = """
SELECT event_id, user_id, ts, value,
       ROUND(SUM(value) OVER w, 2) / COUNT(value) OVER w
           AS value_prior_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def q_first_touch_events(sf_dir: str):
    """First-touch features per user: the value at the user's first
    event (SQL FIRST_VALUE, respecting nulls) and integer microseconds
    elapsed since that first event — the 'account age' / acquisition
    features of a behavioral pipeline."""
    from ..stages.partition import apply_sorted
    from ..stages.window import first_touch

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"],
                    num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return first_touch(df, "user_id", "value", "ts",
                           value_out="value_first",
                           since_out="us_since_first")

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_FIRST_TOUCH = """
SELECT event_id, user_id, ts, value,
       FIRST_VALUE(value) OVER w AS value_first,
       epoch_us(ts) - epoch_us(FIRST_VALUE(ts) OVER w) AS us_since_first
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_tumbling_hourly(sf_dir: str):
    """Event-time tumbling windows (1h) per user: vectorized floor +
    pre-aggregated groupby — the batch-engine form of a streaming
    tumbling window."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ev = ev.map_batches(
        lambda df: df.assign(window_start=df["ts"].dt.floor("h")),
        batch_format="pandas",
    )
    agg = grouped_agg(
        ev, ["user_id", "window_start"],
        {"n_events": ("event_id", "count"), "sum_value": ("value", "sum")}, num_buckets=8,)
    return agg.map_batches(
        lambda df: df.assign(sum_value=round_half_away(df["sum_value"], 2)),
        batch_format="pandas",
    )


SQL_TUMBLING = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       COUNT(event_id) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY user_id, window_start
"""


def q_hopping_events(sf_dir: str):
    """Hopping (sliding) windows: 1h windows advancing every 30min — each
    event lands in 2 windows (vectorized explode + pre-aggregated
    combine). window_start is epoch seconds for engine/SQL exactness."""
    from ..functions.relational import hopping_window_agg

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    agg = hopping_window_agg(ev, "user_id", "ts", "value",
                             window_seconds=3600, hop_seconds=1800,
                             id_col="event_id")
    return agg.map_batches(
        lambda df: df.assign(sum_value=round_half_away(df["sum_value"], 2)),
        batch_format="pandas",
    )


SQL_HOPPING = """
WITH hops AS (
  SELECT user_id, event_id, value,
         (epoch_us(ts) // 1000000 // 1800) * 1800 - k.k * 1800
             AS window_start
  FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
)
SELECT user_id, window_start, COUNT(event_id) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM hops GROUP BY user_id, window_start
"""


def q_price_quantiles(sf_dir: str):
    """Exact grouped quantiles (holistic aggregate — values co-located by
    one bucket exchange): median and p90 extended price per return flag."""
    from ..functions.relational import grouped_quantile

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice"])
    out = grouped_quantile(li, ["l_returnflag"], "l_extendedprice",
                           quantiles=(0.5, 0.9),
                           aliases=["p50_price", "p90_price"])
    return out.map_batches(
        lambda df: df.assign(p50_price=round_half_away(df["p50_price"], 4),
                             p90_price=round_half_away(df["p90_price"], 4)),
        batch_format="pandas",
    )


SQL_PRICE_QUANTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem GROUP BY l_returnflag
"""


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog SKETCH over events.user_id, md5-hashed so the final
    register table (the mergeable distributed state an approximate
    COUNT(DISTINCT) actually ships) is integer-exact and SQL-replayable
    — register = top p hash bits, max_rank = max leading-zero rank.
    Per-batch partials (≤2^p nonzero rows each) merge with one tiny
    ``max`` exchange; the derived cardinality estimate (whose
    bias-correction branch needs ``ln``) is pinned vs the exact count in
    tests instead."""
    from ..functions.relational import hll_md5_registers

    ev = read_table(sf_dir, "events", columns=["user_id"])
    return hll_md5_registers(ev, "user_id", p=12)


SQL_APPROX_DISTINCT_USERS = """
WITH u AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS uid
           FROM events WHERE user_id IS NOT NULL),
h AS (SELECT CAST(CONCAT('0x', substring(md5(uid), 1, 16)) AS UBIGINT) AS h
      FROM u),
parts AS (
  SELECT CAST(h >> 52 AS BIGINT) AS register,
         -- masked-then-scaled (DuckDB << is BIGINT-bound; UBIGINT * stays
         -- UBIGINT): rest = (h mod 2^52) * 2^12, the low 52 bits
         -- left-aligned — identical to the engine's (h & mask) << p
         (h % CAST(4503599627370496 AS UBIGINT)) * CAST(4096 AS UBIGINT)
             AS rest
  FROM h
), ranked AS (
  SELECT register, rest,
         COALESCE(MIN(CASE WHEN ((rest >> (63 - b)) & 1) = 1
                           THEN b + 1 END), 53) AS rank
  FROM parts CROSS JOIN unnest(range(52)) t(b)
  GROUP BY register, rest
)
SELECT register, CAST(MAX(rank) AS BIGINT) AS max_rank
FROM ranked GROUP BY register
"""


def q_customer_order_quantiles(sf_dir: str):
    """Per-customer order-price quantiles via the MERGEABLE centroid
    sketch (:func:`approx_grouped_quantile`) — the 100 TB quantile path
    where sketches move through the shuffle, not raw value rows.
    Per-customer order counts are bounded (a few dozen at ANY scale
    factor), so every group rides the sketch's exact passthrough and the
    result hash-matches SQL ``quantile_cont``; the compression path is
    pinned separately by error-bound tests."""
    from ..functions.relational import approx_grouped_quantile

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = approx_grouped_quantile(
        orders, ["o_custkey"], "o_totalprice", quantiles=(0.5, 0.9),
        sketch_size=256, aliases=["p50_order", "p90_order"])
    return out.map_batches(
        lambda df: df.assign(p50_order=round_half_away(df["p50_order"], 4),
                             p90_order=round_half_away(df["p90_order"], 4)),
        batch_format="pandas",
    )


SQL_CUSTOMER_ORDER_QUANTILES = """
SELECT o_custkey,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_order,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_order
FROM orders GROUP BY o_custkey
"""


def q_rows_window_events(sf_dir: str):
    """Count-based sliding window (ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW) per user — the fixed-ROWS complement of the time-RANGE rolling
    window, via prefix-sum differences in one sorted bucket pass. The
    SUM is rounded at 2 (fixed-decimal inputs → grid-safe) and the mean
    derived from it, per the half-boundary lesson."""
    from ..stages.partition import apply_sorted
    from ..stages.window import rows_window_agg

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"],
                    num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = rows_window_agg(df, "user_id", "value", preceding=3,
                             aggs=("count", "sum", "mean"))
        s = round_half_away(df["value_rows3_sum"], 2)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "w_count": df["value_rows3_count"].astype("int64"),
            "w_sum": s,
            "w_mean": s / df["value_rows3_count"],
        })

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_ROWS_WINDOW = """
SELECT event_id,
       CAST(COUNT(value) OVER w AS BIGINT) AS w_count,
       ROUND(SUM(value) OVER w, 2) AS w_sum,
       ROUND(SUM(value) OVER w, 2) / COUNT(value) OVER w AS w_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def _purchase_features(t):
    """Arrow-native purchase filter+projection (zero-copy; an empty
    result keeps its typed schema — no zero-row pandas filler blocks)."""
    import pyarrow.compute as pc

    t = t.filter(pc.equal(t["event_type"], "purchase"))
    return t.select(["user_id", "ts", "value"]).rename_columns(
        ["user_id", "p_ts", "p_value"])


def q_asof_purchase(sf_dir: str):
    """Point-in-time: latest purchase at or before each event (per user)."""
    from ..stages.asof import asof_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"],
                    num_blocks=8,  # few-MB table: chunky blocks, see read_table
                    ).materialize()  # consumed twice: left side + purchase filter
    purchases = ev.map_batches(_purchase_features, batch_format="pyarrow")
    return asof_join(
        ev, purchases,
        key="user_id", left_ts="ts", right_ts="p_ts", right_cols=["p_value"],
        num_buckets=16,
    )


SQL_ASOF_PURCHASE = """
SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value, p.p_ts, p.p_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts AS p_ts, value AS p_value FROM events
  WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.p_ts
"""


def _replay_blocks(ds, sort_cols):
    """Replay a Dataset as an event-time-ordered stream of pandas batches
    with BOUNDED driver memory: distributed range-partition sort, then
    fetch ONE sorted block at a time from its ref bundles (blocks of a
    materialized sorted Dataset come back in key order). The driver never
    holds the whole table — the scale-safe replacement for the old
    to_pandas + np.array_split stream simulation."""
    import ray
    from ray.data.block import BlockAccessor

    sorted_ds = ds.sort(sort_cols).materialize()
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            blk = BlockAccessor.for_block(ray.get(ref))
            if blk.num_rows() == 0:
                continue
            yield blk.to_pandas()


def q_asof_purchase_streaming(sf_dir: str):
    """The SAME point-in-time join under STREAMING ingest: events and
    purchase-feature batches replayed in event-time order through
    actor-held StreamingAsofState shards (hash-routed by user). Each
    event is emitted only once the feature watermark passes its
    timestamp — zero leakage and zero missed features — and the
    concatenated emissions are pinned to the SAME ASOF SQL oracle as
    the batch path. The replay itself streams sorted dataset blocks
    (one in driver memory at a time); each block's purchase rows are
    delivered as features just before the block's events, so features
    still arrive in event-time order ahead of the events they serve."""
    from ..state.streaming import streaming_asof

    ev = read_table(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
        num_blocks=8,
    )

    def stream():
        for df in _replay_blocks(ev, "ts"):
            f = (
                df[df["event_type"] == "purchase"][["user_id", "ts", "value"]]
                .rename(columns={"ts": "p_ts", "value": "p_value"})
            )
            if len(f):
                yield ("feature", f)
            yield ("event", df)

    out = pd.concat(
        list(streaming_asof(stream(), "user_id", "ts", "p_ts", ["p_value"],
                            num_shards=8)),
        ignore_index=True,
    )
    return out[["event_id", "user_id", "ts", "event_type", "value",
                "p_ts", "p_value"]]


def q_asof_purchase_tol(sf_dir: str):
    """Tolerance-bounded point-in-time join: the latest purchase at or
    before each event only counts when it is at most 1 hour old —
    merge_asof tolerance semantics (the latest row IS the closest, so
    nulling matches older than the bound is exact)."""
    from ..stages.asof import asof_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"],
                    num_blocks=8).materialize()
    purchases = ev.map_batches(_purchase_features, batch_format="pyarrow")
    return asof_join(
        ev, purchases,
        key="user_id", left_ts="ts", right_ts="p_ts", right_cols=["p_value"],
        num_buckets=16, tolerance_seconds=3600,
    )


SQL_ASOF_PURCHASE_TOL = """
SELECT event_id, user_id, ts, event_type, value,
       CASE WHEN ts - p_ts <= INTERVAL 1 HOUR THEN p_ts END    AS p_ts,
       CASE WHEN ts - p_ts <= INTERVAL 1 HOUR THEN p_value END AS p_value
FROM (
  SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
         p.p_ts, p.p_value
  FROM events e
  ASOF LEFT JOIN (
    SELECT user_id, ts AS p_ts, value AS p_value FROM events
    WHERE event_type = 'purchase'
  ) p ON e.user_id = p.user_id AND e.ts >= p.p_ts
)
"""


def q_asof_next_purchase(sf_dir: str):
    """FORWARD as-of: the earliest purchase at or after each event — the
    look-ahead join that builds prediction TARGETS (time-to-next-purchase
    labels), deliberately not a feature."""
    from ..stages.asof import asof_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"],
                    num_blocks=8,
                    ).materialize()
    purchases = ev.map_batches(
        lambda t: _purchase_features(t).rename_columns(
            ["user_id", "np_ts", "np_value"]),
        batch_format="pyarrow",
    )
    return asof_join(
        ev, purchases,
        key="user_id", left_ts="ts", right_ts="np_ts", right_cols=["np_value"],
        num_buckets=16, direction="forward",
    )


SQL_ASOF_NEXT_PURCHASE = """
SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value, p.np_ts, p.np_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts AS np_ts, value AS np_value FROM events
  WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts <= p.np_ts
"""


def q_dedup_user_type(sf_dir: str):
    """Exact dedup: first event per (user, type) by time."""
    from ..stages.dedup import dedup_exact

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"],
                    num_blocks=8)
    return dedup_exact(ev, keys=["user_id", "event_type"],
                       order_by=["ts", "event_id"], num_buckets=16)


SQL_DEDUP_USER_TYPE = """
SELECT event_id, user_id, ts, event_type, value FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
"""


# ============================================================ text analysis


def q_token_stats(sf_dir: str):
    from ..functions.text import token_stats_arrow

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    return docs.map_batches(
        lambda t: token_stats_arrow(t).select(
            ["doc_id", "n_tokens", "n_chars_computed"]),
        batch_format="pyarrow",
    )


SQL_TOKEN_STATS = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_computed
FROM documents
"""


def q_quality_docs(sf_dir: str):
    from ..functions.text import quality_score

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda df: quality_score(df)[
            ["doc_id", "n_words", "mean_word_len", "stopword_ratio"]
        ],
        batch_format="pandas",
    )


SQL_QUALITY = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       (length(text) - (len(string_split(text, ' ')) - 1))
             / len(string_split(text, ' ')) AS mean_word_len,
       len(list_filter(string_split(text, ' '),
                       t -> t IN ('the', 'a', 'and', 'of', 'to')))
             / len(string_split(text, ' ')) AS stopword_ratio
FROM documents
"""


def q_running_quantity(sf_dir: str):
    """GLOBAL ordered prefix sum (SUM OVER (ORDER BY l_orderkey)) with NO
    global sort — the distributed scan: deterministic range cuts from a
    sample, one cheap per-range-totals pass, broadcast offsets, one
    range exchange. l_orderkey repeats across lineitems, so SQL RANGE
    peer semantics (all peers carry the group's full sum) are exercised;
    quantities cast to int64 keep the sum exact in any order."""
    from ..functions.relational import ordered_scan

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity"],
                    num_blocks=8)
    li = li.map_batches(
        lambda df: df.assign(qty=df["l_quantity"].astype("int64")).drop(
            columns=["l_quantity"]
        ),
        batch_format="pandas",
    )
    return ordered_scan(li, "l_orderkey", "qty", out_col="running_qty",
                        num_buckets=16)


SQL_RUNNING_QUANTITY = """
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) AS qty,
       CAST(SUM(CAST(l_quantity AS BIGINT))
            OVER (ORDER BY l_orderkey) AS BIGINT) AS running_qty
FROM lineitem
"""


def q_block_spans_docs(sf_dir: str):
    """GPT-style concat-and-chunk packing: documents concatenate in
    doc_id order into one token stream cut into 1000-token blocks; one
    span row per (doc, block) overlap, offsets local to the doc.
    Global offsets come from the distributed ordered scan; the explode
    is a pure vectorized map. All-integer — SQL-exact."""
    from ..functions.packing import concat_block_spans

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8)
    return concat_block_spans(docs, "doc_id", "n_chars",
                              block_tokens=1000, num_buckets=16)


SQL_BLOCK_SPANS = """
WITH c AS (
  SELECT doc_id, n_chars,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cend
  FROM documents
), s AS (
  SELECT doc_id, n_chars AS n, cend - n_chars AS cstart, cend
  FROM c WHERE n_chars > 0
)
SELECT doc_id,
       u.b AS block_id,
       GREATEST(u.b * 1000, cstart) - cstart AS tok_start,
       LEAST((u.b + 1) * 1000, cend) - cstart AS tok_end
FROM s, unnest(range(cstart // 1000, (cend - 1) // 1000 + 1)) AS u(b)
"""


def q_gopher_docs(sf_dir: str):
    """Gopher-style quality gate: word-count bounds + mean-word-length
    bound + distinct-stopword minimum + duplicate-bigram-mass bound,
    emitted as per-rule signals plus keep (1/0). Map-only, zero shuffle;
    every signal is an exact count or integer-ratio division, so the
    whole gate hash-matches the SQL oracle."""
    from ..functions.text import gopher_rules

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(gopher_rules, batch_format="pandas")


SQL_GOPHER_DOCS = """
WITH t AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w
  FROM documents
), base AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         (length(array_to_string(w, ' ')) - (len(w) - 1))
               / len(w) AS mean_word_len,
         CAST(len(list_distinct(list_filter(
             w, x -> x IN ('the', 'a', 'and', 'of', 'to')))) AS BIGINT)
               AS n_stop_distinct
  FROM t
), bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS b
  FROM t, unnest(range(1, len(w))) AS u(i)
), bc AS (
  SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
), rep AS (
  SELECT doc_id,
         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) / SUM(c) AS dup_bigram_frac
  FROM bc GROUP BY doc_id
)
SELECT base.doc_id, n_words, mean_word_len, n_stop_distinct,
       COALESCE(rep.dup_bigram_frac, 0.0) AS dup_bigram_frac,
       CAST(n_words >= 30 AND n_words <= 90
            AND mean_word_len <= 4.6
            AND n_stop_distinct >= 2
            AND COALESCE(rep.dup_bigram_frac, 0.0) <= 0.08
            AS BIGINT) AS keep
FROM base LEFT JOIN rep ON base.doc_id = rep.doc_id
"""


def q_fingerprint_docs(sf_dir: str):
    from ..functions.text import fingerprint

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda df: fingerprint(df)[["doc_id", "fp"]], batch_format="pandas"
    )


SQL_FINGERPRINT = """
SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
"""


def q_dedup_docs(sf_dir: str):
    """Exact dedup of documents per (lang, source): lowest doc_id wins."""
    from ..stages.dedup import dedup_exact

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "source", "n_chars"])
    return dedup_exact(docs, keys=["lang", "source"], order_by=["doc_id"],
                       num_buckets=16)


SQL_DEDUP_DOCS = """
SELECT doc_id, lang, source, n_chars FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) = 1
"""


# ======================================================= similarity / ANN


def _query_vectors(sf_dir: str, n: int = 10) -> pd.DataFrame:
    """The first-``n`` query vectors, loaded DRIVER-side via pyarrow with a
    row filter. They become the broadcast query matrix inside the ANN
    kernels anyway, so a Ray map + to_pandas would only add a task launch
    and zero-row pandas filler blocks (which spam Ray's size estimator on
    object columns — round-4 fact)."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < n,
    )
    return tbl.to_pandas().rename(columns={"vec_id": "query_id"})


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-5 neighbors for the first 10 vectors."""
    from ..functions.ann import brute_topk

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     num_blocks=8)
    queries = _query_vectors(sf_dir)
    out = brute_topk(emb, queries, k=5)
    out["cos_sim"] = round_half_away(out["cos_sim"], 6)
    out["rank"] = out["rank"].astype("int64")
    return out


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS s
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, neighbor_id, ROUND(s, 6) AS cos_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY s DESC, neighbor_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
"""


def q_cosine_pairs(sf_dir: str):
    """All-pairs embedding near-dup candidates at cosine ≥ 0.4."""
    from ..functions.neardup import cosine_pairs

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = cosine_pairs(emb, threshold=0.4)
    return out.map_batches(
        lambda df: df.assign(cos_sim=round_half_away(df["cos_sim"], 6)).astype(
            {"id_a": "int64", "id_b": "int64"}
        ),
        batch_format="pandas",
    )


SQL_COSINE_PAIRS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


NEARDUP_EMB_ROOT = "/tmp/transmog_ray_neardup_emb"
NEARDUP_EMB_CURRENT = f"{NEARDUP_EMB_ROOT}/current"


def _neardup_emb_fixture(sf_dir: str) -> str:
    """Planted-near-dup embedding fixture (the base embeddings table is
    near-orthogonal noise — zero pairs above cosine 0.55 at sf0.01, which
    made clustering over it trivially all-singletons)."""
    import os

    from ..sources.embeddings import write_neardup_embeddings

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n_groups, n_bg = {
        "sf0.001": (40, 280), "sf0.01": (100, 700), "sf0.1": (300, 2100),
    }.get(scale, (40, 280))
    emb_dir = write_neardup_embeddings(
        f"{NEARDUP_EMB_ROOT}/{scale}", n_groups=n_groups, n_background=n_bg
    )
    _repoint_current(emb_dir, NEARDUP_EMB_CURRENT)
    return emb_dir


def q_cosine_clusters(sf_dir: str):
    """Embedding near-dup CLUSTERS over the planted-near-dup fixture:
    connected components of the cosine ≥ 0.85 graph, labels = min vec_id
    per component. Edges come from the banded-LSH + exact-verify scale
    path (NOT the all-pairs oracle); the fixture's wide margin (planted
    pairs ≳ 0.94, background ≲ 0.7) makes the LSH edge set equal the
    all-pairs edge set, so the distributed min-label propagation is
    pinned against an all-pairs DuckDB recursive CTE."""
    from ..functions.neardup import cosine_neardup_clusters

    emb_dir = _neardup_emb_fixture(sf_dir)
    emb = _rd().read_parquet(f"{emb_dir}/embeddings.parquet")
    out = cosine_neardup_clusters(emb, threshold=0.85, edges="lsh",
                                  num_buckets=8)
    return out.map_batches(
        lambda df: df.astype({"vec_id": "int64", "cluster": "int64"}),
        batch_format="pandas",
    )


#: connected components as a recursive min-label fixpoint: `reach` holds
#: every (node, label-of-a-node-that-reaches-it) pair — UNION dedups, so
#: the recursion terminates — and MIN(label) per node is the component's
#: minimum id, exactly the engine's propagation result
SQL_COSINE_CLUSTERS = f"""
WITH RECURSIVE emb AS (
  SELECT vec_id, embedding
  FROM read_parquet('{NEARDUP_EMB_CURRENT}/embeddings.parquet')
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]) >= 0.85
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT vec_id, vec_id FROM emb
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS vec_id, MIN(label) AS cluster
FROM reach GROUP BY node
"""


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup-style representative selection: near-dup clusters via
    the banded-LSH cosine path, then keep ONE document per cluster (the
    min-id representative, i.e. rows whose id equals their cluster
    label) — the embedding-space REMOVAL operator (Abbas et al. 2023
    shape). Map-only on top of the cluster labels; the dropped-count
    per kept representative rides along for audit."""
    from ..functions.neardup import cosine_neardup_clusters
    from ..stages.partition import bucket_exchange

    emb_dir = _neardup_emb_fixture(sf_dir)
    emb = _rd().read_parquet(f"{emb_dir}/embeddings.parquet")
    labeled = cosine_neardup_clusters(emb, threshold=0.85, edges="lsh",
                                      num_buckets=8)

    def keep_reps(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("cluster", sort=False)["vec_id"].size()
        reps = df[df["vec_id"] == df["cluster"]].copy()
        reps["n_dropped"] = (
            reps["cluster"].map(sizes - 1).astype("int64")
        )
        return reps[["vec_id", "n_dropped"]].astype("int64")

    # co-bucket by cluster so each cluster's size is counted in one task
    return bucket_exchange(labeled, ["cluster"], keep_reps, 8)


SQL_SEMDEDUP = f"""
WITH RECURSIVE emb AS (
  SELECT vec_id, embedding
  FROM read_parquet('{NEARDUP_EMB_CURRENT}/embeddings.parquet')
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]) >= 0.85
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT vec_id, vec_id FROM emb
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
), clusters AS (
  SELECT node AS vec_id, MIN(label) AS cluster FROM reach GROUP BY node
)
SELECT cluster AS vec_id, COUNT(*) - 1 AS n_dropped
FROM clusters GROUP BY cluster
"""


def q_jaccard_pairs(sf_dir: str):
    """Character-set Jaccard duplicate pairs (== DuckDB jaccard())."""
    from ..functions.neardup import char_jaccard_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = char_jaccard_pairs(docs, threshold=1.0)
    return out.map_batches(
        lambda df: df[["id_a", "id_b"]].astype("int64"), batch_format="pandas"
    )


SQL_JACCARD_PAIRS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM documents a CROSS JOIN documents b
WHERE a.doc_id < b.doc_id AND jaccard(a.text, b.text) >= 1.0
"""


def q_ngram_jaccard_pairs(sf_dir: str):
    """Word 3-gram Jaccard near-dup pairs ≥ 0.5 (exact all-pairs oracle;
    MinHash-LSH is the scale path)."""
    from ..functions.neardup import ngram_jaccard_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.5, n=3)


SQL_NGRAM_JACCARD = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS gs
  FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
             len(list_distinct(a.gs || b.gs)), 6) AS jac
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
      len(list_distinct(a.gs || b.gs)) >= 0.5
"""


# ==================================================== rows-only pipelines
# (no faithful SQL form — driver records a rows-only check)


def q_minhash_dedup(sf_dir: str):
    from ..functions.neardup import minhash_clusters

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    return minhash_clusters(docs, n_perm=32, n_bands=8, jaccard_threshold=0.8,
                            num_buckets=16)


def q_minhash_dedup_incremental(sf_dir: str):
    """INCREMENTAL near-dup maintenance: the corpus arrives as two crawl
    shards (doc_id parity split, so dup families span shards); each
    ingest signs/bands/verifies only ITS shard against the persistent
    band/edge cache. Equality with the one-shot batch clustering is
    pinned by tests (tests/test_round5_ops.py); a fresh cache per call
    keeps the driver run deterministic."""
    import tempfile

    import pyarrow.compute as pc

    from ..functions.neardup import minhash_ingest

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8).materialize()
    shard0 = docs.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow")
    shard1 = docs.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)),
        batch_format="pyarrow")
    cache = tempfile.mkdtemp(prefix="mh_ingest_", dir="/tmp")
    kw = dict(n_perm=32, n_bands=8, jaccard_threshold=0.8, num_buckets=16)
    minhash_ingest(cache, shard0, shard0, **kw)
    return minhash_ingest(cache, shard1, docs, **kw)


def q_simhash_docs(sf_dir: str):
    """Per-doc 64-bit SimHash with the md5 token hash — the signature is
    SQL-replayable (token md5 → ±1 bit matrix → sign), so the whole
    fingerprint computation gets a value-hash oracle instead of the
    rows-only check the siphash kernel needs. Emitted as a decimal
    STRING (uint64 exceeds int64). Map-only, zero shuffle."""
    from ..functions.neardup import simhash_md5_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig(df):
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "simhash": [str(int(s))
                        for s in simhash_md5_batch(list(df["text"]))],
        })

    return docs.map_batches(sig, batch_format="pandas")


SQL_SIMHASH_DOCS = """
WITH RECURSIVE pow2(b, v) AS (
  SELECT 0, CAST(1 AS UBIGINT)
  UNION ALL
  SELECT b + 1, v * CAST(2 AS UBIGINT) FROM pow2 WHERE b < 63
), th AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substring(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM (SELECT doc_id,
               unnest(string_split(COALESCE(text, ''), ' ')) AS tok
        FROM documents)
), acc AS (
  SELECT doc_id, b,
         SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN unnest(range(64)) AS t(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(CAST(SUM(CASE WHEN s > 0 THEN v ELSE CAST(0 AS UBIGINT) END)
                 AS UBIGINT) AS VARCHAR) AS simhash
FROM acc JOIN pow2 USING (b) GROUP BY doc_id
"""


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup pairs at Hamming ≤ 3 (pigeonhole block buckets +
    vectorized popcount verify; exactness pinned vs brute force in tests)."""
    from ..functions.neardup import simhash_neardup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_neardup(docs, max_hamming=3)


def q_line_dedup_docs(sf_dir: str):
    """C4-style corpus-level line dedup: the documents text (word soup)
    is first chunked into deterministic 3-word lines (one vectorized
    regex, SQL-mirrored via list slicing), then every line that repeats
    anywhere in the corpus survives only at its lowest (doc_id, line_no)
    and documents are reassembled from their surviving lines."""
    from ..stages.dedup import line_dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    chunked = _chunk_3word_lines(docs)
    return line_dedup(chunked, "doc_id", "text")


def _chunk_3word_lines(docs):
    """Rewrite every 3rd space to a newline — the deterministic 3-word
    line chunking shared by ALL line-structured doc queries; the three
    SQL oracles assume this exact regex, so there is ONE copy of it."""
    return docs.map_batches(
        lambda df: df.assign(
            text=df["text"].str.replace(
                r"((?:\S+ ){2}\S+) ", "\\1\n", regex=True
            )
        ),
        batch_format="pandas",
    )


def q_line_filtered_docs(sf_dir: str):
    """C4-style line-quality filter: chunk each doc into deterministic
    3-word lines (same chunking as line_dedup), drop short lines and
    lines containing the blocklisted token, drop docs with < 2
    surviving lines, reassemble — entirely batch-local (zero shuffle;
    a document is one row)."""
    from ..functions.text import line_quality_filter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    chunked = _chunk_3word_lines(docs)
    return chunked.map_batches(
        lambda df: line_quality_filter(
            df, min_words=3, blocklist=("the",), min_lines=2
        ),
        batch_format="pandas",
    )


SQL_LINE_FILTERED = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL
), lines AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS line_no,
         unnest(list_transform(
             range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT)),
             i -> array_to_string(ws[(i*3+1):(i*3+3)], ' '))) AS line
  FROM w
), kept AS (
  SELECT doc_id, line_no, line FROM lines
  WHERE len(string_split(line, ' ')) >= 3
    AND NOT list_contains(string_split(line, ' '), 'the')
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM kept GROUP BY doc_id HAVING COUNT(*) >= 2
"""


def q_curate_docs(sf_dir: str):
    """End-to-end corpus curation — the composed training-data pipeline,
    every stage an existing operator: 3-word line chunking → C4-style
    line-quality filter (zero shuffle) → corpus-level line dedup (two
    bucket exchanges) → quality-weighted deterministic sampling →
    leakage-safe entity split → boundary-start sequence packing (one
    identity-routed exchange). The whole chain is reproduced in ONE
    composed SQL oracle — stage interactions (filtered line positions
    feeding the dedup winner rule, post-dedup lengths feeding the
    sampler and packer) are pinned exactly, not just each stage alone."""
    from ..functions.sampling import assign_split, weighted_sample
    from ..functions.packing import pack_offsets
    from ..functions.text import line_quality_filter
    from ..stages.dedup import line_dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    chunked = _chunk_3word_lines(docs)
    filtered = chunked.map_batches(
        lambda df: line_quality_filter(
            df, min_words=3, blocklist=("the",), min_lines=2
        ).drop(columns=["n_lines"]),
        batch_format="pandas",
    )
    deduped = line_dedup(filtered, "doc_id", "text", num_buckets=8)
    sized = deduped.map_batches(
        lambda df: df.assign(
            n_chars_final=df["text"].str.len().astype("int64")
        ),
        batch_format="pandas",
    )
    sampled = weighted_sample(
        sized, "doc_id",
        lambda df: pd.Series(np.sqrt(np.minimum(
            df["n_chars_final"].to_numpy(np.float64) / 500.0, 1.0
        ))),
    )
    split = assign_split(sampled, "doc_id",
                         {"train": 90, "valid": 5, "test": 5})
    packed = pack_offsets(split, "doc_id", "n_chars_final", budget=512,
                          num_streams=4)
    return packed.map_batches(
        lambda df: df[["doc_id", "n_chars_final", "split", "stream",
                       "pack_no", "pack_pos"]],
        batch_format="pandas",
    )


SQL_CURATE_DOCS = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL
), lines AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS line_no,
         unnest(list_transform(
             range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT)),
             i -> array_to_string(ws[(i*3+1):(i*3+3)], ' '))) AS line
  FROM w
), kept AS (
  SELECT doc_id, line_no, line,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY line_no) - 1 AS fpos
  FROM lines
  WHERE len(string_split(line, ' ')) >= 3
    AND NOT list_contains(string_split(line, ' '), 'the')
), fdoc AS (  -- docs surviving the quality filter (>= 2 kept lines)
  SELECT doc_id FROM kept GROUP BY doc_id HAVING COUNT(*) >= 2
), winners AS (  -- corpus line dedup over FILTERED positions
  SELECT k.doc_id, k.fpos, k.line,
         ROW_NUMBER() OVER (PARTITION BY k.line
                            ORDER BY k.doc_id, k.fpos) AS rn
  FROM kept k JOIN fdoc USING (doc_id)
), dedup AS (
  SELECT doc_id,
         length(string_agg(line, chr(10) ORDER BY fpos)) AS n_chars_final
  FROM winners WHERE rn = 1 GROUP BY doc_id
), sampled AS (
  SELECT doc_id, n_chars_final,
         CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90
              THEN 'train'
              WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 95
              THEN 'valid' ELSE 'test' END AS split,
         ((doc_id * 2654435761) % 4294967296) % 4 AS stream
  FROM dedup
  WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0
        < sqrt(LEAST(n_chars_final / 500.0, 1.0))
), packed AS (
  SELECT doc_id, n_chars_final, split, stream,
         CAST(COALESCE(SUM(n_chars_final) OVER (
             PARTITION BY stream ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum
  FROM sampled
)
SELECT doc_id, n_chars_final, split, stream,
       cum // 512 AS pack_no, cum % 512 AS pack_pos
FROM packed
"""


SQL_LINE_DEDUP = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL
), lines AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS line_no,
         unnest(list_transform(
             range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT)),
             i -> array_to_string(ws[(i*3+1):(i*3+3)], ' '))) AS line
  FROM w
), keep AS (
  SELECT doc_id, line_no, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM lines
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
FROM keep WHERE rn = 1 GROUP BY doc_id
"""


def q_bm25_docs(sf_dir: str):
    """Seed-query retrieval scoring: BM25-shaped relevance (rational-idf
    variant — every op is +,×,÷ of exactly-agreed inputs, so the oracle
    reproduces scores bit-for-bit) of each doc against a 3-term seed
    query. Two passes: exact-int stats sweep, broadcast-idf scoring."""
    from ..functions.text import bm25_scores

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8).materialize()  # two passes by design
    out = bm25_scores(docs, ("spark", "ray", "query"))
    return out.map_batches(
        lambda df: df.assign(bm25=round_half_away(df["bm25"], 6)),
        batch_format="pandas",
    )


SQL_BM25_DOCS = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL
), st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(len(ws)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avglen
  FROM d
), tf AS (
  SELECT doc_id, t.term,
         CAST(len(list_filter(ws, x -> x = t.term)) AS DOUBLE) AS tf,
         CAST(len(ws) AS DOUBLE) AS doclen
  FROM d CROSS JOIN (VALUES ('spark'), ('ray'), ('query')) AS t(term)
  WHERE list_contains(ws, t.term)
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfc FROM tf GROUP BY term
)
SELECT tf.doc_id,
       ROUND(SUM(
         ((SELECT n FROM st) - dfreq.dfc + 0.5) / (dfreq.dfc + 0.5)
         * tf.tf * (1.2 + 1.0)
         / (tf.tf + 1.2 * (1.0 - 0.75
                           + 0.75 * tf.doclen / (SELECT avglen FROM st)))
       ), 6) AS bm25
FROM tf JOIN dfreq USING (term)
GROUP BY tf.doc_id
"""


def q_hashed_terms_docs(sf_dir: str):
    """Hashing-trick featurization: sparse (doc, bucket, count) triples
    with md5-prefix bucketing — fixed feature width, no vocabulary
    build, zero shuffle (counts are doc-local)."""
    from ..functions.text import hashed_term_counts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda df: hashed_term_counts(df, dim=64), batch_format="pandas"
    )


SQL_HASHED_TERMS = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(CONCAT('0x', substring(md5(w), 1, 8)) AS BIGINT) % 64 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM words GROUP BY doc_id, bucket
"""


def q_bpe_token_docs(sf_dir: str):
    """Token counting both ways: whitespace split + a BPE-ish
    pre-tokenizer regex (GPT-2-style runs, RE2-safe so the oracle's
    regexp_extract_all counts identically). The regex compiles once per
    actor (actor-pool stage), not per batch."""
    from ..functions.text import BpeTokenCount, token_stats

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(BpeTokenCount, batch_format="pandas",
                           concurrency=2)
    return out.map_batches(
        lambda df: token_stats(df, "text")[
            ["doc_id", "n_tokens", "n_bpe_tokens"]
        ],
        batch_format="pandas",
    )


SQL_BPE_TOKENS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(
           text, ' ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+')) AS BIGINT)
           AS n_bpe_tokens
FROM documents
"""


def q_langid_docs(sf_dir: str):
    from ..functions.text import LangId

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(LangId, batch_format="pandas", concurrency=2).map_batches(
        lambda df: df[["doc_id", "lang_guess"]], batch_format="pandas"
    )


def q_lsh_ann(sf_dir: str):
    from ..functions.ann import lsh_topk

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_topk(emb, _query_vectors(sf_dir), k=5)



def _repoint_current(target_dir: str, current_link: str) -> None:
    """Atomically re-point a stable symlink (which static oracle SQL
    reads) at a scale-keyed fixture directory."""
    import os

    tmp = f"{current_link}.tmp.{os.getpid()}"
    if os.path.islink(tmp) or os.path.exists(tmp):
        os.remove(tmp)
    os.symlink(target_dir, tmp)
    os.replace(tmp, current_link)


PAGES_FIXTURE_ROOT = "/tmp/transmog_ray_pages"
#: stable alias the static oracle SQL reads — repointed (atomically) at the
#: scale-specific fixture dir each time a pages query runs, so one SQL
#: string works at every sf the driver/selfcheck picks
PAGES_CURRENT = f"{PAGES_FIXTURE_ROOT}/current"
PAGE_GAP_S = 7 * 86400
PAGE_ROLL_S = 30 * 86400


def _pages_fixture(sf_dir: str) -> str:
    import os

    from ..sources.pages import write_pages

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    shards = {"sf0.001": 2, "sf0.01": 4, "sf0.1": 8}.get(scale, 2)
    urls = {"sf0.001": 50, "sf0.01": 250, "sf0.1": 1500}.get(scale, 50)
    pages_dir = write_pages(f"{PAGES_FIXTURE_ROOT}/{scale}", n_shards=shards,
                            n_urls_per_shard=urls)
    _repoint_current(pages_dir, PAGES_CURRENT)
    return pages_dir


#: the scalar feature columns the flagship is graded on (list columns like
#: meta_tags and the uuid5 _id — not SQL-reproducible — stay internal)
PAGES_PROJ = [
    "url", "warc_ts", "text", "lang", "meta_title",
    "meta_headers_content_type", "meta_headers_server",
    "feature_ts", "n_links", "mean_link_depth",
    "n_links_lag1", "n_links_lead1", "session_seq", "session_id",
    "mean_link_depth_filled",
    f"n_links_w{PAGE_ROLL_S}s_count", f"n_links_w{PAGE_ROLL_S}s_mean",
]


def _pages_proj(df: pd.DataFrame) -> pd.DataFrame:
    df = df[PAGES_PROJ].copy()
    df["session_seq"] = df["session_seq"].astype("int64")
    df[f"n_links_w{PAGE_ROLL_S}s_count"] = df[
        f"n_links_w{PAGE_ROLL_S}s_count"
    ].astype("int64")
    # all-matched buckets would otherwise emit int64 blocks (schema drift)
    for c in ("n_links", "n_links_lag1", "n_links_lead1"):
        df[c] = df[c].astype("float64")
    for c in ("mean_link_depth", "mean_link_depth_filled",
              f"n_links_w{PAGE_ROLL_S}s_mean"):
        df[c] = round_half_away(df[c], 6)
    return df


def q_quantized_embeddings(sf_dir: str):
    """Symmetric per-vector int8 quantization of the embedding table,
    exploded to (id, pos, q, scale) rows for an exact oracle hash —
    the 4× ANN-index memory cut; scale = max|x| is a pure selection,
    so it compares bit-identically."""
    from ..functions.ann import int8_quantize

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     num_blocks=8)
    return int8_quantize(emb)


SQL_QUANTIZED_EMB = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), s AS (
  SELECT vec_id, emb,
         list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS scale
  FROM e
)
SELECT vec_id,
       unnest(range(0, len(emb))) AS pos,
       unnest(list_transform(emb, x ->
           CASE WHEN scale = 0 THEN 0
                ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                   -127) AS BIGINT) END)) AS q,
       scale
FROM s
"""


def q_ivf_ann(sf_dir: str):
    """IVF approximate top-k: spherical-kmeans codebook (driver sample,
    broadcast) + per-cell scoring; recall pinned vs brute in tests."""
    from ..functions.ann import ivf_topk

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(emb, _query_vectors(sf_dir), k=5, n_centroids=16,
                    nprobe=4)


def q_pages_features(sf_dir: str):
    """Flagship: synthetic Common-Crawl-style pages → point-in-time
    features (read+flatten+bucket-split fused into one map task per
    shard — the peak-throughput map-side shuffle — then one fused
    dedup + as-of + lag/lead + sessionize + backfill + rolling reduce
    per url bucket). Pages are synthesized deterministically per scale
    (no external data). The driver's oracle compare runs against THIS
    path; the Dataset-exchange variant is pinned by
    ``pages_features_tagged`` and the parity tests."""
    import glob

    from ..pipelines.features import page_features_pushdown_fused

    pages_dir = _pages_fixture(sf_dir)
    files = glob.glob(f"{pages_dir}/pages-*.parquet")

    def compute_plan():
        from ..pipelines.features import PAGE_SPEC_PUSHDOWN
        from ..stages.flatten import plan_from_dataset

        ds = _rd().read_parquet(
            files, columns=["url", "warc_ts", "text", "lang", "meta"]
        )
        return plan_from_dataset(ds, PAGE_SPEC_PUSHDOWN)

    plan = _cached_plan(("pages_pushdown", pages_dir), compute_plan)
    out = page_features_pushdown_fused(files, num_buckets=16, plan=plan)
    return out.map_batches(_pages_proj, batch_format="pandas")


def q_pages_features_tagged(sf_dir: str):
    """The tagged-union flagship path (child link rows shuffle alongside
    main rows): must produce EXACTLY the same features as the pushdown
    path — both are pinned to the same oracle SQL."""
    from ..pipelines.features import page_features

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(
        pages_dir,
        columns=["url", "warc_ts", "text", "lang", "meta"],
        override_num_blocks=64,
    )
    out = page_features(ds, num_buckets=32, exchange="tasks")
    return out.map_batches(_pages_proj, batch_format="pandas")


def q_pages_features_incremental(sf_dir: str):
    """Incremental feature-store ingest: the fixture's shards arrive in
    TWO batches; the second ingest recomputes only the url-hash buckets
    its shards touch and reuses every other feature partition
    byte-untouched. The accumulated store must equal the batch flagship
    — pinned to the SAME oracle SQL as pages_features."""
    import glob
    import os
    import shutil

    from ..pipelines.features import ingest_pages_increment
    from ..state.checkpoint import fingerprint

    pages_dir = _pages_fixture(sf_dir)
    files = sorted(glob.glob(f"{pages_dir}/pages-*.parquet"))
    # store keyed by the input set: a fixture change rebuilds from scratch
    out = f"/tmp/transmog_ray_incr/{fingerprint(tuple(files))}"
    if not os.path.exists(f"{out}/_state.json"):
        shutil.rmtree(out, ignore_errors=True)
        ingest_pages_increment(out, files[: max(1, len(files) // 2)],
                               num_buckets=16)
    ingest_pages_increment(out, files, num_buckets=16)  # rest (dedup-safe)
    feats = _rd().read_parquet(
        sorted(glob.glob(f"{out}/features/part=*/data.parquet"))
    )
    return feats.map_batches(
        # Ray infers a hive-partition column from part=N dirs — drop it
        lambda df: _pages_proj(
            df.drop(columns=[c for c in ("part",) if c in df.columns])
        ),
        batch_format="pandas",
    )


def q_page_changes(sf_dir: str):
    """Crawl change detection (SCD-style delta flags): per url, snapshots
    in (warc_ts, text) order — text is the tiebreak, making duplicate
    (url, warc_ts) rows deterministically ordered — with ``changed=1``
    when the text differs from the previous snapshot (first snapshot
    counts as changed). One sorted bucket pass; the recrawl-delta /
    skip-unchanged primitive of an incremental crawl pipeline."""
    from ..stages.partition import apply_sorted

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "text"],
                            override_num_blocks=16)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        prev = df.groupby("url", sort=False)["text"].shift(1)
        same = prev.notna() & (df["text"] == prev)
        # null text: SQL `text IS NOT DISTINCT FROM prev` — both null
        # counts as unchanged
        same |= prev.isna() & df["text"].isna() & (
            df.groupby("url", sort=False).cumcount() > 0
        )
        df["changed"] = (~same).astype("int64")
        return df

    return apply_sorted(ds, ["url"], "warc_ts", fn, num_buckets=16,
                        tiebreak=["text"])


def q_retention_pages(sf_dir: str):
    """Snapshot retention policy: keep the latest 3 snapshots per url
    (crawl-store compaction). One sorted bucket pass; rank ties resolve
    by text DESC so the engine's reversed ascending sort and the SQL
    ROW_NUMBER order are the same total order."""
    from ..stages.partition import apply_sorted

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "text"],
                            override_num_blocks=16)

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("url", sort=False)
        rn_desc = (g["url"].transform("size")
                   - g.cumcount()).astype("int64")
        out = df[rn_desc <= 3].copy()
        out["rn_desc"] = rn_desc[rn_desc <= 3]
        return out

    return apply_sorted(ds, ["url"], "warc_ts", keep_latest,
                        num_buckets=16, tiebreak=["text"])


SQL_RETENTION_PAGES = f"""
SELECT url, warc_ts, text,
       CAST(ROW_NUMBER() OVER (PARTITION BY url
                               ORDER BY warc_ts DESC, text DESC)
            AS BIGINT) AS rn_desc
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
QUALIFY rn_desc <= 3
"""


#: robots-style disallow rules (host, path-prefix) — a deterministic
#: constant mirrored verbatim in the SQL oracle's VALUES list
ROBOTS_RULES = (
    ("hot0.example.com", "/p/1"),
    ("hot1.example.com", "/p/3"),
    ("site40.example.org", "/p/40"),
)


def q_robots_filtered_pages(sf_dir: str):
    """Robots-style disallow filtering: drop pages whose (host, path)
    matches any disallow prefix rule. Rules broadcast (tiny side never
    shuffles); host/path split by plain string slicing so the engine and
    SQL decompose urls identically; per-rule vectorized startswith."""
    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts"],
                            override_num_blocks=16)
    rules = ROBOTS_RULES

    def allowed(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.split("//", n=1).str[1]
        host = rest.str.split("/", n=1).str[0]
        path = "/" + rest.str.split("/", n=1).str[1].fillna("")
        blocked = pd.Series(False, index=df.index)
        for rhost, rprefix in rules:
            blocked |= (host == rhost) & path.str.startswith(rprefix)
        return df[~blocked][["url", "warc_ts"]]

    return ds.map_batches(allowed, batch_format="pandas")


SQL_ROBOTS_FILTERED = f"""
WITH rules(rhost, rprefix) AS (
  VALUES ('hot0.example.com', '/p/1'),
         ('hot1.example.com', '/p/3'),
         ('site40.example.org', '/p/40')
), p AS (
  SELECT url, warc_ts,
         split_part(split_part(url, '//', 2), '/', 1) AS host,
         substr(url, 9 + length(split_part(split_part(url, '//', 2),
                                           '/', 1))) AS path
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
)
SELECT url, warc_ts FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM rules r
  WHERE p.host = r.rhost AND starts_with(p.path, r.rprefix)
)
"""


def q_recrawl_cadence(sf_dir: str):
    """Recrawl-cadence features per url: snapshot count and the
    mean/max inter-snapshot gap (µs, exact integers) — the crawl
    scheduler's priority signal. One sorted bucket pass; the gaps are
    integer diffs so mean = Σgap/n is an exact ratio on both sides."""
    from ..stages.partition import apply_sorted

    pages_dir = _pages_fixture(sf_dir)
    # no text column / tiebreak: the per-url gap MULTISET is fully
    # determined by the warc_ts sort (ties give 0-gaps in any order),
    # so the fixture's fattest column never leaves storage
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts"],
                            override_num_blocks=16)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (
            df["warc_ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
            // 1000
        )
        work = pd.DataFrame({"url": df["url"], "t": t_us})
        gap = work.groupby("url", sort=False)["t"].diff()
        work["gap"] = gap
        g = work.groupby("url", sort=False)
        out = pd.DataFrame({
            "n_snaps": g.size().astype("int64"),
            "mean_gap_us": g["gap"].sum() / g["gap"].count(),
            # nullable Int64: single-snapshot urls have no gap, and the
            # oracle's MAX(gap) is a nullable BIGINT
            "max_gap_us": g["gap"].max().astype("Int64"),
        }).reset_index()
        return out

    return apply_sorted(ds, ["url"], "warc_ts", fn, num_buckets=16)


SQL_RECRAWL_CADENCE = f"""
WITH s AS (
  SELECT url,
         epoch_us(warc_ts) - epoch_us(LAG(warc_ts) OVER (
             PARTITION BY url ORDER BY warc_ts)) AS gap
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
)
SELECT url,
       CAST(COUNT(*) AS BIGINT) AS n_snaps,
       CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS mean_gap_us,
       MAX(gap) AS max_gap_us
FROM s GROUP BY url
"""


SQL_PAGE_CHANGES = f"""
SELECT url, warc_ts, text,
       CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
            WHEN text IS DISTINCT FROM LAG(text) OVER w THEN 1
            ELSE 0 END AS changed
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
WINDOW w AS (PARTITION BY url ORDER BY warc_ts, text ASC NULLS LAST)
"""


SQL_PAGES_FEATURES = f"""
WITH pages AS (
  SELECT url, warc_ts, text, lang, meta
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), dedup AS (
  SELECT * FROM pages
  QUALIFY ROW_NUMBER() OVER (PARTITION BY url, warc_ts
                             ORDER BY text ASC NULLS LAST) = 1
), links AS (
  SELECT d.url, d.warc_ts,
         json_extract_string(l.link, '$.href') AS href,
         TRY_CAST(json_extract(l.link, '$.depth') AS DOUBLE) AS depth
  FROM dedup d, UNNEST(CAST(json_extract(d.meta, '$.links') AS JSON[])) AS l(link)
), feats AS (
  SELECT url, warc_ts AS feature_ts,
         COUNT(href) AS n_links, AVG(depth) AS mean_link_depth
  FROM links GROUP BY url, warc_ts HAVING COUNT(href) > 0
), joined AS (
  SELECT d.url, d.warc_ts, d.text, d.lang,
         json_extract_string(d.meta, '$.title') AS meta_title,
         json_extract_string(d.meta, '$.headers.content_type')
             AS meta_headers_content_type,
         NULLIF(json_extract_string(d.meta, '$.headers.server'), '')
             AS meta_headers_server,
         f.feature_ts, CAST(f.n_links AS DOUBLE) AS n_links,
         f.mean_link_depth
  FROM dedup d ASOF LEFT JOIN feats f
    ON d.url = f.url AND d.warc_ts >= f.feature_ts
), flagged AS (
  SELECT *,
         CASE WHEN LAG(warc_ts) OVER w IS NULL
                   OR warc_ts - LAG(warc_ts) OVER w > INTERVAL {PAGE_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM joined
  WINDOW w AS (PARTITION BY url ORDER BY warc_ts)
), sessions AS (
  SELECT *,
         CAST(SUM(is_new) OVER w2 - 1 AS BIGINT) AS session_seq,
         MAX(CASE WHEN is_new = 1 THEN warc_ts END) OVER w2 AS session_start
  FROM flagged
  WINDOW w2 AS (PARTITION BY url ORDER BY warc_ts ROWS UNBOUNDED PRECEDING)
)
SELECT url, warc_ts, text, lang, meta_title, meta_headers_content_type,
       meta_headers_server, feature_ts, n_links,
       ROUND(mean_link_depth, 6) AS mean_link_depth,
       LAG(n_links)  OVER w AS n_links_lag1,
       LEAD(n_links) OVER w AS n_links_lead1,
       session_seq,
       url || '|' || CAST(epoch_us(session_start) AS VARCHAR) AS session_id,
       ROUND(LAST_VALUE(mean_link_depth IGNORE NULLS) OVER
             (PARTITION BY url ORDER BY warc_ts ROWS UNBOUNDED PRECEDING), 6)
           AS mean_link_depth_filled,
       COUNT(n_links) OVER wr AS n_links_w{PAGE_ROLL_S}s_count,
       ROUND(SUM(n_links) OVER wr / COUNT(n_links) OVER wr, 6)
           AS n_links_w{PAGE_ROLL_S}s_mean
FROM sessions
WINDOW w  AS (PARTITION BY url ORDER BY warc_ts),
       wr AS (PARTITION BY url ORDER BY warc_ts
              RANGE BETWEEN INTERVAL {PAGE_ROLL_S} SECOND PRECEDING
                    AND CURRENT ROW)
"""


# ================================================================ registry

# ===================================== range join / ranks / corpus stats


def q_range_join_events(sf_dir: str):
    """Interval join: every event of a user that falls inside ANY 24 h
    window opened by one of that user's purchase events (windows overlap —
    the general interval-join case, not as-of). Both sides are the
    distributed events table; they meet in ONE bucket exchange keyed on
    user_id and a vectorized merge-rank kernel emits the pairs
    (functions.relational.range_join)."""
    from ..functions.relational import range_join

    left = read_table(sf_dir, "events",
                      columns=["event_id", "ts", "user_id", "event_type"])

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"]
        return pd.DataFrame({
            "user_id": p["user_id"].to_numpy(),
            "win_id": p["event_id"].to_numpy(),
            "win_start": p["ts"].to_numpy(),
            "win_end": (p["ts"] + pd.Timedelta(hours=24)).to_numpy(),
        })

    right = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    ).map_batches(windows, batch_format="pandas")
    joined = range_join(left, right, on="user_id", left_ts="ts",
                        right_start="win_start", right_end="win_end")
    return joined.map_batches(
        lambda df: df[["event_id", "ts", "event_type", "win_id"]],
        batch_format="pandas",
    )


SQL_RANGE_JOIN = """
SELECT e.event_id, e.ts, e.event_type, p.event_id AS win_id
FROM events e JOIN events p
  ON e.user_id = p.user_id AND p.event_type = 'purchase'
 AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 24 HOUR
"""


def q_ewma_events(sf_dir: str):
    """Per-user EWMA of value in event-time order — a recursive decay
    feature (y = a*x + (1-a)*y_prev), not ANSI-SQL expressible, so
    rows-only here; pinned by the loop oracle in tests."""
    from ..stages.partition import apply_sorted
    from ..stages.window import ewma

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"], num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return ewma(df, "user_id", "value", alpha=0.3)

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


def q_session_funnel(sf_dir: str):
    """Per-user conversion funnel: of the user's gap-sessions, how many
    contain the ordered view → click → purchase subsequence. One sorted
    pass: sessionize + per-session path + vectorized subsequence flag +
    per-user rollup, all inside the bucket."""
    from ..stages.partition import apply_sorted
    from ..stages.window import sessionize

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"], num_blocks=8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = sessionize(df, "user_id", "ts", SESSION_GAP_S)
        paths = (
            df.groupby(["user_id", "session_seq"], sort=False)["event_type"]
            .agg(",".join)
            .reset_index(name="path")
        )
        conv = paths["path"].str.contains(
            "view.*click.*purchase", regex=True
        ).astype("int64")
        out = (
            paths.assign(conv=conv)
            .groupby("user_id", sort=False)
            .agg(n_sessions=("path", "size"), n_converted=("conv", "sum"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_converted"] = out["n_converted"].astype("int64")
        return out

    return apply_sorted(ev, ["user_id"], "ts", fn, num_buckets=16,
                        tiebreak=["event_id"])


SQL_SESSION_FUNNEL = f"""
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {{gap}} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(SUM(is_new) OVER w2 - 1 AS BIGINT) AS session_seq
  FROM flagged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)
), paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, ',' ORDER BY ts, event_id) AS path
  FROM numbered GROUP BY user_id, session_seq
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN path LIKE '%view%click%purchase%'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM paths GROUP BY user_id
""".replace("{gap}", str(SESSION_GAP_S))


def q_histogram_chars(sf_dir: str):
    """Corpus length-distribution histogram (fixed 100-char bins) — the
    standard first diagnostic over a text corpus; map-side bin + partial
    counts, one tiny exchange."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["n_chars"])
    binned = docs.map_batches(
        lambda df: pd.DataFrame(
            {"bin": (df["n_chars"] // 100).astype("int64")}
        ),
        batch_format="pandas",
    )
    return grouped_agg(binned, ["bin"], {"n_docs": ("bin", "count")}, num_buckets=8)


SQL_HISTOGRAM_CHARS = """
SELECT CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""


def q_user_split(sf_dir: str):
    """Leakage-safe 90/5/5 split: the USER is hashed, not the row, so
    every event of one user lands in the same split — the anti-leak
    contract a training pipeline needs."""
    from ..functions.sampling import assign_split

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"], num_blocks=8)
    return assign_split(ev, "user_id", {"train": 90, "valid": 5, "test": 5})


def q_global_rank_docs(sf_dir: str):
    """Corpus-global PERCENT_RANK of document length WITHOUT a global
    sort: a value histogram aggregates in one exchange, the cumulative
    distribution broadcasts, rows map to exact rows-below / (N-1)
    integer ratios — bit-identical to the SQL window."""
    from ..functions.relational import global_percent_rank

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8).map_batches(
        # NULL guard on BOTH sides: the engine excludes NULLs from N
        # while SQL PERCENT_RANK orders them into the frame
        lambda df: df[df["n_chars"].notna()], batch_format="pandas",
    )
    return global_percent_rank(docs, "n_chars", num_buckets=8)


SQL_GLOBAL_RANK = """
SELECT doc_id, n_chars,
       PERCENT_RANK() OVER (ORDER BY n_chars) AS pct_rank
FROM documents WHERE n_chars IS NOT NULL
"""


def q_scaled_docs(sf_dir: str):
    """Leakage-safe standardization: split docs 80/10/10 by hashed
    doc_id, fit mean/std_pop of n_chars on the TRAIN rows only (one
    no-shuffle sufficient-statistics pass, exact integer sums), z-score
    every row with the train stats — valid/test rows never influence
    the transform applied to them."""
    from ..functions.sampling import assign_split
    from ..functions.scaling import apply_standardizer, fit_standardizer

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8)
    split = assign_split(
        docs, "doc_id", {"train": 80, "valid": 10, "test": 10}
    ).materialize()  # consumed twice (fit + apply): pin the sub-DAG
    train = split.map_batches(
        lambda df: df[df["split"] == "train"], batch_format="pandas"
    )
    stats = fit_standardizer(train, ["n_chars"])
    return apply_standardizer(split, stats)


def q_mixture_plan(sf_dir: str):
    """Data-mixing plan: per-source sampling rates hitting a 60k-token
    budget under deterministic weights (1 + source_number % 3). Exact
    integer token sums; the rate arithmetic is the same float ops on
    both sides, so no rounding is needed."""
    from ..functions.sampling import plan_mixture

    docs = read_table(sf_dir, "documents", columns=["source", "n_chars"],
                      num_blocks=8)
    sources = read_small(sf_dir, "documents", columns=["source"])
    weights = {
        s: float(int(s[3:]) % 3 + 1) for s in sources["source"].unique()
    }
    return plan_mixture(docs, "source", "n_chars",
                        target_tokens=60000, weights=weights)


SQL_MIXTURE_PLAN = """
WITH avail AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS available_tokens
  FROM documents GROUP BY source
), w AS (
  SELECT source, available_tokens,
         CAST(CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS DOUBLE) AS wt
  FROM avail
), tot AS (SELECT SUM(wt) AS W FROM w)
SELECT source, available_tokens,
       LEAST(1.0, 60000 * wt / (SELECT W FROM tot) / available_tokens)
           AS rate,
       LEAST(1.0, 60000 * wt / (SELECT W FROM tot) / available_tokens)
           * available_tokens AS planned_tokens
FROM w
"""


def q_weighted_sample_docs(sf_dir: str):
    """Quality-weighted corpus mixing: keep each doc with probability
    sqrt(min(n_chars/1000, 1)) — longer docs survive at a higher rate,
    temperature-flattened. Deterministic Bernoulli via the Knuth hash
    (no RNG state; same rows survive at any parallelism / on re-run).
    sqrt (not pow) on both sides: IEEE sqrt is correctly rounded, so
    the hash-uniform comparison is bit-identical to the SQL."""
    from ..functions.sampling import weighted_sample

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8)
    return weighted_sample(
        docs, "doc_id",
        lambda df: pd.Series(
            np.sqrt(np.minimum(df["n_chars"].to_numpy(np.float64) / 1000.0,
                               1.0))
        ),
    )


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0
      < sqrt(LEAST(n_chars / 1000.0, 1.0))
"""


def q_packed_docs(sf_dir: str):
    """Deterministic training-sequence packing (boundary-start variant):
    docs route to 8 independent packing streams by hashed id, each
    stream orders by doc_id and assigns pack_no/pack_pos from one exact
    integer prefix sum — byte-identical on re-run at any parallelism."""
    from ..functions.packing import pack_offsets

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8)
    return pack_offsets(docs, "doc_id", "n_chars", budget=2048,
                        num_streams=8)


SQL_PACKED_DOCS = """
WITH s AS (
  SELECT doc_id, n_chars,
         ((doc_id * 2654435761) % 4294967296) % 8 AS stream
  FROM documents
), w AS (
  SELECT doc_id, n_chars, stream,
         CAST(COALESCE(SUM(n_chars) OVER (
             PARTITION BY stream ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum
  FROM s
)
SELECT doc_id, n_chars, stream,
       cum // 2048 AS pack_no, cum % 2048 AS pack_pos
FROM w
"""


SQL_SCALED_DOCS = """
WITH s AS (
  SELECT doc_id, n_chars,
         CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
              WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'valid'
              ELSE 'test' END AS split
  FROM documents
), t AS (
  -- variance numerator in EXACT integer arithmetic (HUGEINT), the same
  -- (n·Σx² - (Σx)²)/n² form the engine computes — the naive
  -- Σx²/n - mean² form cancels catastrophically for large means
  SELECT CAST(SUM(n_chars) AS DOUBLE) AS sx,
         CAST(COUNT(*) AS DOUBLE)     AS n,
         CAST(CAST(COUNT(*) AS HUGEINT)
                * CAST(SUM(n_chars * n_chars) AS HUGEINT)
              - CAST(SUM(n_chars) AS HUGEINT)
                * CAST(SUM(n_chars) AS HUGEINT) AS DOUBLE) AS var_num
  FROM s WHERE split = 'train'
)
SELECT doc_id, n_chars, split,
       (n_chars - sx / n) / sqrt(var_num / (n * n)) AS n_chars_z
FROM s, t
"""


SQL_USER_SPLIT = """
SELECT event_id, user_id,
       CASE WHEN ((user_id * 2654435761) % 4294967296) % 100 < 90 THEN 'train'
            WHEN ((user_id * 2654435761) % 4294967296) % 100 < 95 THEN 'valid'
            ELSE 'test' END AS split
FROM events
"""


def q_user_folds(sf_dir: str):
    """Leakage-safe 5-fold CV assignment: the USER is hashed to a fold,
    so no entity straddles train/holdout in any CV round."""
    from ..functions.sampling import assign_folds

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"],
                    num_blocks=8)
    return assign_folds(ev, "user_id", k=5)


SQL_USER_FOLDS = """
SELECT event_id, user_id,
       ((user_id * 2654435761) % 4294967296) % 5 AS fold
FROM events
"""


def q_temporal_split_events(sf_dir: str):
    """Embargo-aware temporal (purged) split: train strictly before
    cutoff−1d, test at/after cutoff, a labeled 1-day embargo gap between
    — the guard against trailing-window features at the end of train
    overlapping the start of test."""
    from ..functions.sampling import temporal_split

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"],
                    num_blocks=8)
    return temporal_split(ev, "ts", "2024-01-20", embargo_seconds=86400)


SQL_TEMPORAL_SPLIT = """
SELECT event_id, user_id, ts,
       CASE WHEN ts <  TIMESTAMP '2024-01-19' THEN 'train'
            WHEN ts >= TIMESTAMP '2024-01-20' THEN 'test'
            ELSE 'embargo' END AS split
FROM events
"""


def q_user_event_paths(sf_dir: str):
    """Ordered event-sequence (collect-list) per user: the
    comma-joined event types in deterministic (ts, event_id) order —
    the sessions-to-sequences step of a behavioral feature pipeline.
    One sorted-bucket pass; the aggregation happens inside the bucket."""
    from ..stages.partition import apply_sorted

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"], num_blocks=8)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].notna()]
        g = df.groupby("user_id", sort=False)
        out = g["event_type"].agg(",".join).reset_index()
        out = out.rename(columns={"event_type": "path"})
        out["n_events"] = g.size().to_numpy(dtype=np.int64)
        return out

    return apply_sorted(ev, ["user_id"], "ts", kernel, tiebreak=["event_id"])


SQL_USER_EVENT_PATHS = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS path,
       CAST(COUNT(event_type) AS BIGINT) AS n_events
FROM events
WHERE event_type IS NOT NULL
GROUP BY user_id
"""


def q_rank_events(sf_dir: str):
    """SQL window-rank functions per user: ROW_NUMBER over (ts, event_id),
    running SUM(value), and RANK by value desc — one sorted-bucket pass."""
    from ..stages.partition import apply_sorted

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"], num_blocks=8)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        g = df.groupby("user_id", sort=False)
        df["rn"] = (g.cumcount() + 1).astype("int64")
        df["running_value"] = round_half_away(g["value"].cumsum(), 2)
        rank_min = g["value"].rank(method="min", ascending=False)
        df["value_rank"] = rank_min.astype("int64")
        n = g["value"].transform("size").to_numpy(dtype=np.int64)
        # PERCENT_RANK: (rank-1)/(n-1), single-row partitions pin to 0
        df["value_pr"] = np.where(
            n > 1, (rank_min.to_numpy() - 1) / np.maximum(n - 1, 1), 0.0
        )
        # NTILE(4) under the deterministic (value DESC, event_id) order:
        # position within the re-sorted key group, then the SQL bucket
        # split (first n%k buckets get one extra row)
        order_pos = df.sort_values(
            ["user_id", "value", "event_id"], ascending=[True, False, True],
            kind="mergesort",
        ).index.to_numpy()
        p = np.empty(len(df), dtype=np.int64)
        p[order_pos] = (
            df.iloc[order_pos].groupby("user_id", sort=False).cumcount().to_numpy()
        )
        base, rem = n // 4, n % 4
        cut = rem * (base + 1)
        df["value_ntile4"] = np.where(
            p < cut,
            p // np.maximum(base + 1, 1),
            rem + (p - cut) // np.maximum(base, 1),
        ) + 1
        return df[["event_id", "rn", "running_value", "value_rank",
                   "value_pr", "value_ntile4"]]

    return apply_sorted(ev, ["user_id"], "ts", kernel, tiebreak=["event_id"])


SQL_RANK_EVENTS = """
SELECT event_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value,
       CAST(RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS BIGINT)
           AS value_rank,
       PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value DESC)
           AS value_pr,
       CAST(NTILE(4) OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id) AS BIGINT)
           AS value_ntile4
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_repetition_docs(sf_dir: str):
    """Gopher-style bigram repetition signals per document (boilerplate /
    machine-repetition filter). Embarrassingly parallel map_batches."""
    from ..functions.text import repetition_stats

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(repetition_stats, batch_format="pandas")


SQL_REPETITION = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents
), bg AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
), counts AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac,
       CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
           / CAST(SUM(c) AS DOUBLE) AS dup_bigram_frac
FROM counts GROUP BY doc_id
"""


def q_top_terms(sf_dir: str):
    """Corpus-wide top-20 terms: per-batch partial counts (one row per
    term per batch — rows never shuffle raw), distributed combine, then
    the standard bounded top-k (each block prunes to 20, driver sees
    ≤ 20 × blocks rows). Tie-broken by term for determinism."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].fillna("").str.split(" ").explode().value_counts()
        return pd.DataFrame({"term": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy()})

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "term"], ascending=[False, True],
                              kind="mergesort").head(20)

    parts = docs.map_batches(partial, batch_format="pandas")
    agg = grouped_agg(parts, ["term"], {"cnt": ("cnt", "sum")}, num_buckets=8)
    tops = agg.map_batches(local_top, batch_format="pandas")
    out = local_top(tops.to_pandas()).reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return out[["term", "cnt"]]


SQL_TOP_TERMS = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
ORDER BY cnt DESC, term ASC LIMIT 20
"""


def q_sample_docs(sf_dir: str):
    """Deterministic 10% sample via a Knuth multiplicative hash of doc_id
    — reproducible across engines/runs (unlike ``ds.random_sample``) and
    embarrassingly parallel. Contract: ids < 2^33 so the BIGINT product
    can't overflow on the SQL side (cast to HUGEINT beyond that)."""
    from ..functions.sampling import hash_sample

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "source", "n_chars"])
    return hash_sample(ds, "doc_id", 10)


SQL_SAMPLE_DOCS = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) % 100 < 10
"""


def q_stratified_docs(sf_dir: str):
    """Corpus rebalancing: downsample the dominant language (en → 5%),
    partially keep mid strata (zh → 30%), keep the tail at 60% — each
    stratum a deterministic hash sample, zero shuffle."""
    from ..functions.sampling import stratified_sample

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "source", "n_chars"])
    return stratified_sample(ds, "doc_id", "lang",
                             rates={"en": 5, "zh": 30}, default_rate=60)


SQL_STRATIFIED_DOCS = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) % 100 <
      CASE lang WHEN 'en' THEN 5 WHEN 'zh' THEN 30 ELSE 60 END
"""


def q_reservoir_docs(sf_dir: str):
    """Exactly 20 docs per language — deterministic distributed
    reservoir (n smallest Knuth hashes per stratum; per-batch partial
    top-n bounds the shuffle at n × strata × batches)."""
    from ..functions.sampling import stratified_topn

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_topn(ds, "doc_id", "lang", n=20)


SQL_RESERVOIR_DOCS = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents) t
WHERE rn <= 20
"""


def q_training_shards(sf_dir: str):
    """Resumable training output: deterministic global shuffle of the
    corpus into 16 hash shards (one atomic parquet + manifest per shard,
    rows ordered by (knuth_hash, id) inside each), then a distributed
    read-back that recovers the shard number from the partition path.
    Re-running skips every completed shard driver-side; the oracle
    recomputes the assignment arithmetically."""
    import re

    from ..state.checkpoint import (fingerprint, input_lineage,
                                    write_training_shards)

    src = f"{sf_dir}/documents.parquet"
    key = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/transmog_ray_shards/{key}"
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    write_training_shards(
        docs, out_dir, "doc_id", 16,
        run_fingerprint=fingerprint({"inputs": input_lineage([src]),
                                     "num_shards": 16}),
    )
    files = sorted(
        f"{out_dir}/{d}/data.parquet"
        for d in os.listdir(out_dir) if d.startswith("part=")
    )
    # hive-style part=NNNNN dirs surface as a partition column "part"
    ds = _rd().read_parquet(files)

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["shard"] = df["part"].astype("int64")
        return df.drop(columns=["part"])

    return ds.map_batches(add_shard, batch_format="pandas")


SQL_TRAINING_SHARDS = """
SELECT doc_id, lang,
       CAST(((doc_id * 2654435761) % 4294967296) % 16 AS BIGINT) AS shard
FROM documents
"""


def q_centroid_assign(sf_dir: str):
    """Nearest-centroid assignment over the embedding column (the
    E-step of distributed k-means): centroids = embeddings of the 8
    smallest vec_ids, broadcast once; per-batch integer squared-L2
    matmul + argmin. Embeddings quantized to an int grid on BOTH sides
    so the argmin is exact (no float-tie divergence vs the oracle)."""
    from ..functions.ann import assign_centroids

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return assign_centroids(emb, k=8)


SQL_CENTROID_ASSIGN = """
WITH qe AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, q AS cq FROM qe ORDER BY vec_id LIMIT 8
)
SELECT vec_id, centroid FROM (
  SELECT qe.vec_id, c.cid AS centroid,
         ROW_NUMBER() OVER (
           PARTITION BY qe.vec_id
           ORDER BY list_sum(list_transform(list_zip(qe.q, c.cq),
                     p -> (p[1]-p[2])*(p[1]-p[2]))), c.cid) AS rn
  FROM qe CROSS JOIN c) t
WHERE rn = 1
"""


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means over the embedding corpus (iterative —
    no SQL form; rows-only driver check, blob-recovery pinned in unit
    tests). Each iteration: broadcast centroids, one map pass emitting
    k partial (count, sum) rows per batch; driver combine is O(k ×
    batches)."""
    from ..functions.ann import kmeans_fit

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, assign = kmeans_fit(emb, k=8, n_iter=5)
    return assign


def q_pii_redacted_docs(sf_dir: str):
    """PII redaction over synthetic-but-deterministic contact strings
    (derived from doc_id so the oracle can rebuild them): emails →
    [EMAIL], IPv4 → [IP], phones → [PHONE], one vectorized regex sweep
    per kind. Pattern strings are RE2-compatible and run verbatim in
    the DuckDB oracle's regexp_replace(..., 'g')."""
    from ..functions.text import redact_pii

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64")
        df["text"] = (
            df["text"].fillna("") + " contact user" + i.astype(str)
            + "@mail" + (i % 7).astype(str) + ".org ip 10."
            + (i % 256).astype(str) + "." + ((i * 7) % 256).astype(str)
            + "." + (i % 100).astype(str) + " tel +1 555-"
            + (i % 10000).astype(str).str.zfill(4)
        )
        return df

    return ds.map_batches(synth, batch_format="pandas").map_batches(
        redact_pii, batch_format="pandas")


SQL_PII_REDACTED = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        COALESCE(text, '') || ' contact user' || doc_id || '@mail'
          || (doc_id % 7) || '.org ip 10.' || (doc_id % 256) || '.'
          || ((doc_id * 7) % 256) || '.' || (doc_id % 100)
          || ' tel +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
    '\+\d[\d -]{6,}\d', '[PHONE]', 'g') AS text
FROM documents
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(sf_dir: str):
    """Per-user event-type pivot: one count column per type (static
    schema from the known category list)."""
    from ..functions.relational import pivot_count

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_count(ev, "user_id", "event_type", EVENT_TYPES)


SQL_PIVOT_EVENTS = """
SELECT user_id,
       SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS n_click,
       SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS n_error,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
       SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS n_signup,
       SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS n_view
FROM events GROUP BY user_id
"""


def q_corr_quantity_price(sf_dir: str):
    """Pearson corr(l_quantity, l_extendedprice) per return flag from
    distributed sufficient statistics (six doubles per key per batch move
    through the shuffle, never rows). Rounded to 6 on both sides — the
    naive-sums closed form and DuckDB's one-pass CORR differ in low-order
    bits."""
    from ..functions.relational import grouped_corr

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = grouped_corr(li, "l_returnflag", "l_quantity", "l_extendedprice",
                       out_col="corr_qty_price")
    return out.map_batches(
        lambda df: df.assign(corr_qty_price=round_half_away(df["corr_qty_price"], 6)),
        batch_format="pandas",
    )


SQL_CORR = """
SELECT l_returnflag, ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""


def q_tfidf_docs(sf_dir: str):
    """Top-3 TF-IDF keywords per document (distributed tf/df/join/topk —
    see functions.text.tfidf_topk)."""
    from ..functions.text import tfidf_topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(docs, n_docs=docs.count(), k=3)


SQL_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
), n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS raw
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
)
SELECT doc_id, term, ROUND(raw, 6) AS tfidf FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw DESC, term ASC) <= 3
"""


def q_domain_stats(sf_dir: str):
    """Per-domain crawl stats over the Common-Crawl-style pages fixture:
    page count, distinct-url count, non-null-text count. Vectorized host
    extraction, then ONE exchange: per-batch partials collapse to the
    (domain, url) lattice — so the two hot domains (~30% of rows) shuffle
    one row per url per batch, not one per page — and the per-bucket
    kernel folds url partials into exact per-domain counts."""
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "domain": df["url"].str.extract(r"^https?://([^/]+)",
                                            expand=False),
            "url": df["url"],
            "has_text": df["text"].notna().astype("int64"),
        })
        out = (
            g.groupby(["domain", "url"], sort=False)
            .agg(n_pages=("url", "size"), n_text=("has_text", "sum"))
            .reset_index()
        )
        out["n_pages"] = out["n_pages"].astype("int64")
        out["n_text"] = out["n_text"].astype("int64")
        return out

    part = ds.map_batches(partial, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = (
            df.groupby(["domain", "url"], sort=False)
            .agg(n_pages=("n_pages", "sum"), n_text=("n_text", "sum"))
            .reset_index()
        )
        out = (
            u.groupby("domain", sort=False)
            .agg(n_pages=("n_pages", "sum"), n_urls=("url", "size"),
                 n_text=("n_text", "sum"))
            .reset_index()
        )
        for c in ("n_pages", "n_urls", "n_text"):
            out[c] = out[c].astype("int64")
        return out

    return bucket_exchange(part, ["domain"], per_bucket)


SQL_DOMAIN_STATS = f"""
SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
       COUNT(*) AS n_pages,
       COUNT(DISTINCT url) AS n_urls,
       COUNT(text) AS n_text
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
GROUP BY 1
"""


def q_user_event_types(sf_dir: str):
    """Exact per-user COUNT(DISTINCT event_type) — per-batch pair dedup
    bounds the shuffle at the (user, type) lattice, one exchange."""
    from ..functions.relational import grouped_count_distinct

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    return grouped_count_distinct(ev, "user_id", "event_type",
                                  out_col="n_types")


SQL_USER_EVENT_TYPES = """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
"""


def q_customer_order_counts(sf_dir: str):
    """LEFT join: every customer with their order count, zero for the
    ~1/3 of customers with no orders — partial pre-agg below the join,
    then a partitioned hash join with ``how='left'``."""
    from ..functions.relational import grouped_agg, hash_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    agg = grouped_agg(
        orders.map_batches(
            lambda d: d.rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas",
        ),
        ["c_custkey"], {"n_orders": ("c_custkey", "count")}, num_buckets=8,)
    joined = hash_join(cust, agg, on="c_custkey", how="left", num_buckets=8)
    return joined.map_batches(
        lambda d: d.assign(n_orders=d["n_orders"].fillna(0).astype("int64")),
        batch_format="pandas",
    )


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c.c_custkey, COALESCE(n.n_orders, 0) AS n_orders
FROM customer c
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders
           FROM orders GROUP BY o_custkey) n
       ON c.c_custkey = n.o_custkey
"""


def q_events_orders_outer(sf_dir: str):
    """FULL OUTER join of two aggregates keyed on disjoint-but-overlapping
    id domains (event users vs order customers) — ``hash_join`` with
    ``how='outer'``; missing sides coalesce to 0."""
    from ..functions.relational import grouped_agg, hash_join

    ev = read_table(sf_dir, "events", columns=["user_id"], num_blocks=8)
    orders = read_table(sf_dir, "orders", columns=["o_custkey"],
                        num_blocks=8)
    ne = grouped_agg(
        ev.map_batches(lambda d: d.rename(columns={"user_id": "id"}),
                       batch_format="pandas"),
        ["id"], {"n_events": ("id", "count")}, num_buckets=8,
    )
    no = grouped_agg(
        orders.map_batches(lambda d: d.rename(columns={"o_custkey": "id"}),
                           batch_format="pandas"),
        ["id"], {"n_orders": ("id", "count")}, num_buckets=8,
    )
    joined = hash_join(ne, no, on="id", how="outer", num_buckets=8)
    return joined.map_batches(
        lambda d: d.assign(
            n_events=d["n_events"].fillna(0).astype("int64"),
            n_orders=d["n_orders"].fillna(0).astype("int64"),
        ),
        batch_format="pandas",
    )


SQL_EVENTS_ORDERS_OUTER = """
SELECT COALESCE(e.id, o.id) AS id,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(o.n_orders, 0) AS n_orders
FROM (SELECT user_id AS id, COUNT(*) AS n_events
      FROM events GROUP BY user_id) e
FULL OUTER JOIN (SELECT o_custkey AS id, COUNT(*) AS n_orders
                 FROM orders GROUP BY o_custkey) o
  ON e.id = o.id
"""


def q_contamination_docs(sf_dir: str):
    """Benchmark decontamination: distinct word 5-gram overlap of every
    document against a broadcast eval set (docs with doc_id % 23 == 0
    stand in for a held-out benchmark). Eval grams are built once on the
    driver from the tiny eval slice; the sweep itself is shuffle-free."""
    from ..functions.text import ngram_contamination, word_ngrams

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ev_df = docs.map_batches(
        lambda d: d[d["doc_id"] % 23 == 0], batch_format="pandas"
    ).to_pandas()
    eval_grams = (
        frozenset(word_ngrams(ev_df, 5)["g"]) if len(ev_df) else frozenset()
    )
    return ngram_contamination(docs, eval_grams, n=5)


SQL_CONTAMINATION = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i.i:i.i+4], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) i
  WHERE len(w) >= 5
), eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 23 = 0
)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contam,
       CAST(SUM(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS contam_frac
FROM grams g LEFT JOIN eval_grams eg ON g.g = eg.g
GROUP BY g.doc_id
"""


def q_dup_ngram_docs(sf_dir: str):
    """Corpus-level duplicate-trigram fraction per doc (the Lee et al.
    dedup signal): occurrences → corpus counts → join with per-doc
    aggregation FUSED into the join reduce tasks. dup_frac is an exact
    integer ratio."""
    from ..functions.text import dup_ngram_fraction

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    return dup_ngram_fraction(docs, n=3, num_buckets=8)


SQL_DUP_NGRAM = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id, array_to_string(w[i.i:i.i+2], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) i
  WHERE len(w) >= 3
), counts AS (
  SELECT g, COUNT(*) AS c FROM grams GROUP BY g
)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN counts.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup,
       CAST(SUM(CASE WHEN counts.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS dup_frac
FROM grams JOIN counts USING (g)
GROUP BY grams.doc_id
"""


def q_length_filtered_docs(sf_dir: str):
    """Quantile-based quality filter: keep documents whose length sits
    inside the per-language [p05, p95] band. Two passes: exact grouped
    quantiles (one exchange over a small per-lang stats read), bands
    pulled to the driver (one row per language) and broadcast into a
    shuffle-free filter sweep."""
    from ..functions.relational import grouped_quantile

    stats = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    bands = grouped_quantile(
        stats, ["lang"], "n_chars", quantiles=(0.05, 0.95),
        aliases=["lo", "hi"],
    ).to_pandas()
    lo = dict(zip(bands["lang"], bands["lo"]))
    hi = dict(zip(bands["lang"], bands["hi"]))

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "n_chars"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        lo_v = df["lang"].map(lo).to_numpy(np.float64)
        hi_v = df["lang"].map(hi).to_numpy(np.float64)
        n = df["n_chars"].to_numpy(np.float64)
        return df[(n >= lo_v) & (n <= hi_v)]

    return docs.map_batches(keep, batch_format="pandas")


SQL_LENGTH_FILTERED = """
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
JOIN (SELECT lang,
             quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents GROUP BY lang) b
  ON d.lang = b.lang
WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
"""


def q_user_top_events(sf_dir: str):
    """Grouped top-k: each user's 3 highest-value events, via per-batch
    per-group pruning + ONE bucket exchange (never a global sort)."""
    from ..functions.relational import grouped_topk

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "value"], num_blocks=8)
    return grouped_topk(ev, ["user_id"], "value", k=3,
                        tiebreak=["event_id"], num_buckets=16)


SQL_USER_TOP_EVENTS = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events WHERE value IS NOT NULL
) WHERE rn <= 3
"""


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20. lineitem(R) ⋈ orders is the fact-fact task exchange with a
    per-custkey partial rollup FUSED into the join reduce (joined rows
    never leave the task); the tiny customer dimension broadcasts."""
    import pyarrow.compute as pc

    from ..functions.relational import broadcast_join, grouped_agg, \
        hash_join, topk

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
    ).map_batches(
        lambda t: t.filter(pc.equal(t["l_returnflag"], "R"))
        .drop_columns(["l_returnflag"]),
        batch_format="pyarrow",
    ).map_batches(
        lambda df: df.assign(
            rev=df["l_extendedprice"] * (1.0 - df["l_discount"])
        )[["l_orderkey", "rev"]],
        batch_format="pandas",
    )
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("o_custkey", sort=False)["rev"]
                .sum(min_count=1).reset_index())

    partials = hash_join(li, orders, on="l_orderkey", num_buckets=16,
                         post_fn=rollup)
    per_cust = grouped_agg(partials, ["o_custkey"],
                           {"revenue": ("rev", "sum")}, num_buckets=8)
    per_cust = per_cust.map_batches(
        lambda df: df.assign(
            revenue=round_half_away(df["revenue"], 2),
            # descending custkey tiebreak under one descending topk sort
            __tb=-df["o_custkey"],
        ),
        batch_format="pandas",
    )
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust = cust.rename(columns={"c_custkey": "o_custkey"})
    out = broadcast_join(per_cust, cust, on="o_custkey")
    out = topk(out, ["revenue", "__tb"], k=20)
    return out.map_batches(
        lambda df: df.rename(columns={"o_custkey": "c_custkey"})[
            ["c_custkey", "c_name", "revenue"]
        ],
        batch_format="pandas",
    )


SQL_RETURNED_REVENUE = """
SELECT c_custkey, c_name, revenue FROM (
  SELECT c_custkey, c_name,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name
) ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_resampled_events(sf_dir: str):
    """Feature-store grid regularization: each user's irregular event
    values resampled onto a 15-minute grid with as-of forward fill —
    one exchange by user, then a fully vectorized per-bucket kernel
    (repeat/arange grid + ONE merge_asof; no per-key loop)."""
    from ..stages.partition import apply_sorted
    from ..stages.window import resample_ffill

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"],
                    num_blocks=8)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return resample_ffill(df, "user_id", "ts", "value", every_s=900,
                              order_col="event_id")

    return apply_sorted(ev, ["user_id"], "ts", kernel, num_buckets=16,
                        tiebreak=["event_id"])


SQL_RESAMPLED_EVENTS = """
WITH dedup AS (
  SELECT user_id, epoch_us(ts) AS ts_us, arg_max(value, event_id) AS value
  FROM events GROUP BY user_id, epoch_us(ts)
), bounds AS (
  SELECT user_id,
         (MIN(ts_us) // 900000000) * 900000000 AS g0,
         (MAX(ts_us) // 900000000) * 900000000 AS g1
  FROM dedup GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(range(g0, g1 + 1, 900000000)) AS g_us
  FROM bounds
)
SELECT g.user_id, g.g_us // 1000000 AS grid_ts_s, d.value AS value
FROM grid g ASOF LEFT JOIN dedup d
  ON g.user_id = d.user_id AND g.g_us >= d.ts_us
"""


def q_unpivot_pricing(sf_dir: str):
    """Wide → long melt (SQL UNPIVOT): per-flag quantity/price sums
    unpivoted to (flag, metric, amount) rows — the melt itself is a
    zero-shuffle map stage usable on any Dataset."""
    from ..functions.relational import grouped_agg, unpivot

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])
    s = grouped_agg(li, ["l_returnflag"],
                    {"sum_qty": ("l_quantity", "sum"),
                     "sum_price": ("l_extendedprice", "sum")},
                    num_buckets=4)
    s = s.map_batches(
        lambda df: df.assign(sum_qty=round_half_away(df["sum_qty"], 2),
                             sum_price=round_half_away(df["sum_price"], 2)),
        batch_format="pandas",
    )
    return unpivot(s, ["l_returnflag"], ["sum_qty", "sum_price"],
                   var_name="metric", value_name="amount")


SQL_UNPIVOT_PRICING = """
WITH s AS (
  SELECT l_returnflag,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, amount
FROM s UNPIVOT (amount FOR metric IN (sum_qty, sum_price))
"""


def q_skew_join_orders(sf_dir: str):
    """Skew-aware fact join: orders ⋈ customer where sampled hot
    custkeys take a broadcast path (no shuffle for the heavy rows) and
    the cold remainder rides the partitioned hash join — identical
    result either route, so the oracle is the plain join."""
    from ..functions.relational import grouped_agg
    from ..functions.skew import skew_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
    )
    joined = skew_join(orders, cust, on="o_custkey",
                       sample_fraction=0.2, hot_share=0.002,
                       num_buckets=16)
    out = grouped_agg(joined, ["c_mktsegment"],
                      {"n_orders": ("o_totalprice", "count"),
                       "revenue": ("o_totalprice", "sum")}, num_buckets=4)
    return out.map_batches(
        lambda df: df.assign(revenue=round_half_away(df["revenue"], 2)),
        batch_format="pandas",
    )


SQL_SKEW_JOIN_ORDERS = """
SELECT c_mktsegment,
       CAST(COUNT(o_totalprice) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_boilerplate_docs(sf_dir: str):
    """Per-source template-line (boilerplate) removal: after the shared
    3-word chunking, any line present in ≥2 docs and ≥5% of a source's
    docs is stripped from EVERY doc of that source (keep-none — the
    crawl-cleanup complement of line_dedup's keep-first)."""
    from ..stages.dedup import boilerplate_removal

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text"])
    chunked = _chunk_3word_lines(docs)
    return boilerplate_removal(chunked, "doc_id", "text", "source",
                               min_df=2, min_frac=0.05, num_buckets=16)


SQL_BOILERPLATE_DOCS = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL
), lines AS (
  SELECT doc_id, source,
         unnest(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS line_no,
         unnest(list_transform(
             range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT)),
             i -> array_to_string(ws[(i*3+1):(i*3+3)], ' '))) AS line
  FROM w
), totals AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), freq AS (
  SELECT source, line, COUNT(DISTINCT doc_id) AS df
  FROM lines GROUP BY source, line
), boiler AS (
  SELECT f.source, f.line
  FROM freq f JOIN totals t USING (source)
  WHERE f.df >= 2 AND CAST(f.df AS DOUBLE) / t.n >= 0.05
)
SELECT l.doc_id,
       string_agg(l.line, chr(10) ORDER BY l.line_no) AS text,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM lines l
LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
WHERE b.line IS NULL
GROUP BY l.doc_id
"""


def q_sessionize_streaming(sf_dir: str):
    """The SAME gap-sessionization under STREAMING ingest: event-time
    ordered batches replayed through hash-routed SessionState actors
    (state carries across batches); the concatenated emissions are
    pinned to the SAME window SQL oracle as the batch path."""
    from ..state.streaming import streaming_sessionize

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"],
                    num_blocks=8)
    out = pd.concat(
        list(streaming_sessionize(_replay_blocks(ev, ["ts", "event_id"]),
                                  "user_id", "ts",
                                  SESSION_GAP_S, num_buckets=8)),
        ignore_index=True,
    )
    return out[["event_id", "user_id", "ts", "session_seq", "session_id"]]


def q_exact_price_quantiles(sf_dir: str):
    """EXACT global order statistics with NO global sort: iterative
    histogram refinement over streaming scans (drivers see only
    O(num_bins) counters per batch), final in-bin selection of the
    actual element — float-bit-exact vs SQL quantile_disc."""
    from ..functions.relational import exact_quantiles

    li = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    p25, p50, p75, p90 = exact_quantiles(
        li, "l_extendedprice", (0.25, 0.5, 0.75, 0.9), num_bins=4096)
    return pd.DataFrame({"p25": [p25], "p50": [p50],
                         "p75": [p75], "p90": [p90]})


SQL_EXACT_PRICE_QUANTILES = """
SELECT quantile_disc(l_extendedprice, 0.25) AS p25,
       quantile_disc(l_extendedprice, 0.5)  AS p50,
       quantile_disc(l_extendedprice, 0.75) AS p75,
       quantile_disc(l_extendedprice, 0.9)  AS p90
FROM lineitem
"""


def q_mad_outlier_events(sf_dir: str):
    """Robust per-type outliers: |value − median| > 3·MAD — median
    absolute deviation, the robust z-score. One exchange co-locates
    each type's values; median/MAD/filter run in-kernel and only the
    outlier rows come back. Lower-median SELECTION keeps every
    comparison float-bit-exact vs SQL quantile_disc."""
    from ..functions.relational import grouped_mad_outliers

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"],
                    num_blocks=8)
    return grouped_mad_outliers(ev, ["event_type"], "value", thresh=3.0,
                                num_buckets=8)


SQL_MAD_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value, ABS(e.value - m.med) AS ad
  FROM events e JOIN med m USING (event_type)
  WHERE e.value IS NOT NULL
), mad AS (
  SELECT event_type, quantile_disc(ad, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value
FROM dev d JOIN mad m USING (event_type)
WHERE d.ad > 3.0 * m.mad
"""


def q_collocations_docs(sf_dir: str):
    """Top-50 corpus collocations by PMI lift (rational form —
    (N·c_xy)/(c_x·c_y); log is libm-unreproducible, its argument is
    bit-exact). Distributed unigram/bigram counting + two hash joins;
    no driver-side vocabulary."""
    from ..functions.text import pmi_collocations

    docs = read_table(sf_dir, "documents", columns=["text"], num_blocks=8)
    return pmi_collocations(docs, "text", min_count=5, k=50,
                            num_buckets=8)


SQL_COLLOCATIONS = """
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
uni AS (SELECT unnest(ws) AS wd FROM w),
cx AS (SELECT wd, COUNT(*) AS c FROM uni GROUP BY wd),
big AS (
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
  FROM w
), bg AS (
  SELECT w1, w2, COUNT(*) AS n_xy FROM big GROUP BY w1, w2
  HAVING COUNT(*) >= 5
), tot AS (SELECT COUNT(*) AS n FROM big)
SELECT w1, w2, CAST(n_xy AS BIGINT) AS n_xy,
       (CAST(t.n AS DOUBLE) * n_xy) / (CAST(c1.c AS DOUBLE) * c2.c) AS lift
FROM bg CROSS JOIN tot t
JOIN cx c1 ON bg.w1 = c1.wd
JOIN cx c2 ON bg.w2 = c2.wd
ORDER BY lift DESC, w1, w2 LIMIT 50
"""


def q_pit_features_multi(sf_dir: str):
    """Feature-store multi-table point-in-time read: every event gets
    the latest purchase AND the latest view feature in ONE exchange
    (asof_join_multi) — chaining per-table as-of joins would shuffle
    the growing left side once per feature table."""
    from ..stages.asof import asof_join_multi

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"],
                    num_blocks=8).materialize()  # left + two filters
    purchases = ev.map_batches(
        lambda df: df[df["event_type"] == "purchase"][
            ["user_id", "ts", "value"]
        ].rename(columns={"ts": "p_ts", "value": "p_value"}),
        batch_format="pandas",
    )
    views = ev.map_batches(
        lambda df: df[df["event_type"] == "view"][
            ["user_id", "ts", "value"]
        ].rename(columns={"ts": "v_ts", "value": "v_value"}),
        batch_format="pandas",
    )
    return asof_join_multi(
        ev,
        [(purchases, "p_ts", ["p_value"]), (views, "v_ts", ["v_value"])],
        key="user_id", left_ts="ts", num_buckets=16,
    )


SQL_PIT_MULTI = """
SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
       p.p_ts, p.p_value, v.v_ts, v.v_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts AS p_ts, value AS p_value FROM events
  WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.p_ts
ASOF LEFT JOIN (
  SELECT user_id, ts AS v_ts, value AS v_value FROM events
  WHERE event_type = 'view'
) v ON e.user_id = v.user_id AND e.ts >= v.v_ts
"""


def q_weighted_avg_discount(sf_dir: str):
    """Revenue-weighted mean discount per flag: ratio of two
    decomposable sums (Σ d·p / Σ p), each rounded on its own exact
    decimal grid BEFORE the division so the ratio is bit-identical
    across engines (rounding a MEAN directly can land on a half
    boundary — round the SUMS, divide after)."""
    from ..functions.relational import grouped_agg

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice",
                             "l_discount"])
    li = li.map_batches(
        lambda df: df.assign(dp=df["l_discount"] * df["l_extendedprice"]),
        batch_format="pandas",
    )
    agg = grouped_agg(li, ["l_returnflag"],
                      {"dsum": ("dp", "sum"),
                       "psum": ("l_extendedprice", "sum")}, num_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = round_half_away(df["dsum"], 4)
        p = round_half_away(df["psum"], 2)
        return pd.DataFrame({"l_returnflag": df["l_returnflag"],
                             "w_avg_discount": d / p})

    return agg.map_batches(finish, batch_format="pandas")


SQL_WEIGHTED_AVG_DISCOUNT = """
SELECT l_returnflag,
       ROUND(SUM(l_discount * l_extendedprice), 4)
           / ROUND(SUM(l_extendedprice), 2) AS w_avg_discount
FROM lineitem GROUP BY l_returnflag
"""


def q_upsert_user_state(sf_dir: str):
    """CDC compaction: a per-user state snapshot is built from the
    pre-cutoff half of the change log (merge_upsert bootstrap), then
    the post-cutoff log is APPLIED to it (merge_upsert with tombstones:
    'click' = delete). The two-stage composition equals the latest-op
    rule over the whole log — which is exactly the SQL oracle."""
    from ..stages.dedup import merge_upsert

    def tag_op(t: pa.Table) -> pa.Table:
        op = pc.if_else(pc.equal(t["event_type"], "click"),
                        pa.scalar("delete"), pa.scalar("upsert"))
        return t.drop_columns(["event_type"]).append_column("op", op)

    # pyarrow batches throughout: zero-row pandas object blocks trip
    # Ray's block size estimator (np.vectorize on size-0 input)
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"],
                    num_blocks=8).map_batches(
        tag_op, batch_format="pyarrow",
    ).materialize()  # consumed by both halves
    cutoff = pa.scalar(pd.Timestamp("2024-01-16"), type=pa.timestamp("us"))
    pre = ev.map_batches(lambda t: t.filter(pc.less(t["ts"], cutoff)),
                         batch_format="pyarrow")
    post = ev.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ts"], cutoff)),
        batch_format="pyarrow")
    base = merge_upsert(None, pre, key="user_id",
                        seq=["ts", "event_id"], num_buckets=8)
    state = merge_upsert(base, post, key="user_id",
                         seq=["ts", "event_id"], op_col="op",
                         num_buckets=8)
    return state.map_batches(
        lambda df: df[["user_id", "ts", "value"]], batch_format="pandas")


SQL_UPSERT_USER_STATE = """
SELECT user_id, ts, value FROM (
  SELECT user_id, ts, value, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'click'
"""


def q_fixed_n_per_lang(sf_dir: str):
    """EXACT-n stratified sample: 5 docs per language, chosen by
    deterministic knuth-hash order (not a rate — a fixed budget per
    stratum). grouped_topk machinery, ascending by hash."""
    from ..functions.relational import grouped_topk
    from ..functions.sampling import knuth_hash

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    hashed = docs.map_batches(
        lambda df: df.assign(
            h=knuth_hash(df["doc_id"].to_numpy()).astype("int64")),
        batch_format="pandas",
    )
    out = grouped_topk(hashed, ["lang"], "h", k=5, descending=False,
                       tiebreak=["doc_id"], num_buckets=4)
    return out.map_batches(lambda df: df[["doc_id", "lang"]],
                           batch_format="pandas")


SQL_FIXED_N_PER_LANG = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents
) WHERE rn <= 5
"""


def q_domain_capped_pages(sf_dir: str):
    """Per-domain quota cap — the CommonCrawl curation move that stops
    two hot domains owning the corpus: distinct urls, ≤3 per domain,
    chosen by deterministic md5 order (so the cap is reproducible
    across runs/shards, not first-seen). dedup + grouped_topk: two
    bucketed exchanges, no global sort; the text/html columns never
    leave storage."""
    import hashlib

    from ..functions.relational import grouped_topk
    from ..stages.dedup import dedup_exact

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)
    urls = dedup_exact(ds, ["url"], num_buckets=16)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.split("//", n=1).str[1]
        df = df.assign(
            domain=rest.str.split("/", n=1).str[0],
            # rows are distinct post-dedup → one md5 per row is the
            # floor; int(hex[:8],16) == DuckDB CAST(CONCAT('0x',...))
            h=[int(hashlib.md5(u.encode()).hexdigest()[:8], 16)
               for u in df["url"]],
        )
        df["h"] = df["h"].astype("int64")
        return df

    tagged = urls.map_batches(tag, batch_format="pandas")
    out = grouped_topk(tagged, ["domain"], "h", k=3, descending=False,
                       tiebreak=["url"], num_buckets=16)
    return out.map_batches(lambda df: df[["domain", "url"]],
                           batch_format="pandas")


SQL_DOMAIN_CAPPED = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), d AS (
  SELECT url,
         split_part(split_part(url, '//', 2), '/', 1) AS domain,
         CAST(CONCAT('0x', substring(md5(url), 1, 8)) AS BIGINT) AS h
  FROM u
)
SELECT domain, url FROM (
  SELECT domain, url,
         ROW_NUMBER() OVER (PARTITION BY domain ORDER BY h, url) AS rn
  FROM d
) WHERE rn <= 3
"""


def q_decontam_exact_docs(sf_dir: str):
    """EXACT-substring benchmark decontamination (the strict variant of
    the n-gram check): needles = 40-char prefixes of a deterministic
    doc subset, broadcast once; a doc is contaminated if ANY needle
    occurs verbatim anywhere in its text. Returns (doc_id, n_hits) for
    contaminated docs. Zero shuffle: needles ride the closure, the
    corpus streams; per-needle vectorized str.contains(regex=False)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8).materialize()  # needle pass + scan

    def pick_needles(df: pd.DataFrame) -> pa.Table:
        m = ((df["doc_id"] % 97 == 0) & df["text"].notna()
             & (df["text"].str.len() >= 40))
        # typed arrow output: a zero-needle batch as a pandas object
        # column would trip Ray's block size estimator
        return pa.Table.from_arrays(
            [pa.array(df.loc[m, "text"].str[:40].tolist(), pa.string())],
            names=["s"])

    # needle extraction runs DISTRIBUTED; only the tiny needle set
    # (1/97 of doc ids) is pulled driver-side for the broadcast
    needles = docs.map_batches(pick_needles,
                               batch_format="pandas").to_pandas()
    needles = [] if needles.empty else needles["s"].tolist()

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        ok = text.notna()
        n = np.zeros(len(df), dtype=np.int64)
        for s in needles:
            n[ok.to_numpy()] += (
                text[ok].str.contains(s, regex=False).to_numpy(np.int64)
            )
        out = df.loc[n > 0, ["doc_id"]].copy()
        out["n_hits"] = n[n > 0]
        return out

    return docs.map_batches(hits, batch_format="pandas")


SQL_DECONTAM_EXACT = """
WITH needles AS (
  SELECT substring(text, 1, 40) AS s FROM documents
  WHERE doc_id % 97 = 0 AND text IS NOT NULL AND length(text) >= 40
)
SELECT d.doc_id, COUNT(*) AS n_hits
FROM documents d, needles n
WHERE d.text IS NOT NULL AND position(n.s IN d.text) > 0
GROUP BY d.doc_id
"""


def q_transition_counts(sf_dir: str):
    """Event-type Markov transition matrix: global count of each
    (prev_type → type) pair under per-user (ts, event_id) order — the
    behavioral-model sufficient statistic. One exchange co-locates each
    user's history; per-bucket partial counts (≤ |types|² rows) combine
    in a second, tiny exchange — full rows never re-shuffle."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        pairs = pd.DataFrame({"prev_type": prev,
                              "event_type": df["event_type"]})
        pairs = pairs[pairs["prev_type"].notna()]
        out = (pairs.groupby(["prev_type", "event_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    partials = bucket_exchange(ev, ["user_id"], per_user_bucket,
                               num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["prev_type", "event_type"], sort=False)["n"]
               .sum().astype("int64").reset_index())
        return out

    return bucket_exchange(partials, ["prev_type", "event_type"], combine,
                           num_buckets=2)


SQL_TRANSITION_COUNTS = """
WITH t AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM t WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def q_lang_length_quantiles(sf_dir: str):
    """PER-GROUP exact order statistics (quantile_disc semantics:
    element at 0-indexed rank ceil(q·n)−1, probed empirically — NOT
    the floor(q·(n−1)) convention) — doc-length quartiles
    per language, the per-stratum length-filter calibration. One
    exchange co-locates each language's lengths; the kernel selects
    ranks from a single sort per group. Selecting ACTUAL elements keeps
    int64 exactness — no interpolation, no rounding pact."""
    from ..stages.partition import bucket_exchange

    QS = [0.25, 0.5, 0.75]
    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["lang"].is_valid(),
                                   t["n_chars"].is_valid())),
        batch_format="pyarrow",
    )

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang", sort=False):
            v = np.sort(g["n_chars"].to_numpy(np.int64))
            for q in QS:
                rows.append((lang, q,
                             v[min(int(np.ceil(q * len(v))) - 1,
                                   len(v) - 1)]))
        return pd.DataFrame(rows, columns=["lang", "q", "v"]).astype(
            {"q": "float64", "v": "int64"})

    return bucket_exchange(docs, ["lang"], per_lang, num_buckets=4)


SQL_LANG_LENGTH_QUANTILES = """
SELECT lang,
       unnest([0.25, 0.5, 0.75]) AS q,
       unnest(quantile_disc(n_chars, [0.25, 0.5, 0.75])) AS v
FROM documents
WHERE lang IS NOT NULL AND n_chars IS NOT NULL
GROUP BY lang
"""


def q_systematic_sample_events(sf_dir: str):
    """Systematic (every k-th in GLOBAL order) sampling — the classic
    survey design, and a determinism stress test: global ROW_NUMBER
    without a global sort, via the distributed ordered scan (range cuts
    + broadcast offsets). event_id is unique so the scan's RANGE-frame
    peer rule degenerates to exact row positions."""
    from ..functions.relational import ordered_scan

    K = 50
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"],
                    num_blocks=8).map_batches(
        lambda t: t.append_column("one", pa.array([1] * t.num_rows,
                                                  pa.int64())),
        batch_format="pyarrow",
    )
    scanned = ordered_scan(ev, "event_id", "one", out_col="rn",
                           num_buckets=8)
    return scanned.map_batches(
        lambda df: df.loc[df["rn"] % K == 1,
                          ["event_id", "user_id", "ts", "rn"]],
        batch_format="pandas",
    )


SQL_SYSTEMATIC_SAMPLE = """
SELECT event_id, user_id, ts, rn FROM (
  SELECT event_id, user_id, ts,
         ROW_NUMBER() OVER (ORDER BY event_id) AS rn
  FROM events
) WHERE rn % 50 = 1
"""


def q_table_diff_orders(sf_dir: str):
    """Cross-run reconciliation: diff two runs of a pipeline on a unique
    key (here: orders vs a deterministically perturbed rebuild — 1/997
    keys dropped, 1/61 prices bumped, 1/991 rows added under new keys).
    One co-bucketed exchange; output is one row per DIFFERING key only,
    so it stays tiny when the runs mostly agree — the regression-check
    shape a 100-TB rebuild needs."""
    from ..functions.relational import table_diff

    base = read_table(sf_dir, "orders",
                      columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
                      num_blocks=8).map_batches(
        lambda t: t.rename_columns(["k", "status_c", "price"]),
        batch_format="pyarrow",
    ).materialize()  # consumed as side A and twice for building side B

    def perturb(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        t = t.filter(pa.array(k % 997 != 0))
        k = t["k"].to_numpy()
        price = t["price"].to_numpy(zero_copy_only=False).copy()
        price[k % 61 == 0] += 1.0
        return t.set_column(t.schema.get_field_index("price"), "price",
                            pa.array(price, pa.float64()))

    def extra(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t["k"].to_numpy() % 991 == 0))
        return t.set_column(t.schema.get_field_index("k"), "k",
                            pc.add(t["k"], pa.scalar(900_000_000,
                                                     pa.int64())))

    b = base.map_batches(perturb, batch_format="pyarrow").union(
        base.map_batches(extra, batch_format="pyarrow"))
    return table_diff(base, b, keys="k", num_buckets=8)


SQL_TABLE_DIFF_ORDERS = """
WITH a AS (
  SELECT o_orderkey AS k, o_orderstatus AS status_c,
         o_totalprice AS price
  FROM orders
), b0 AS (
  SELECT k, status_c,
         CASE WHEN k % 61 = 0 THEN price + 1.0 ELSE price END AS price
  FROM a WHERE k % 997 <> 0
), bx AS (
  SELECT k + 900000000 AS k, status_c, price FROM a WHERE k % 991 = 0
), b AS (
  SELECT * FROM b0 UNION ALL SELECT * FROM bx
)
SELECT COALESCE(a.k, b.k) AS k,
       CASE WHEN a.k IS NULL THEN 'only_b'
            WHEN b.k IS NULL THEN 'only_a'
            ELSE 'changed' END AS status,
       CASE WHEN a.k IS NULL OR b.k IS NULL THEN 0
            ELSE CAST(a.status_c IS DISTINCT FROM b.status_c AS BIGINT)
               + CAST(a.price IS DISTINCT FROM b.price AS BIGINT)
       END AS n_cols_changed
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL
   OR a.status_c IS DISTINCT FROM b.status_c
   OR a.price IS DISTINCT FROM b.price
"""


def q_winsorized_events(sf_dir: str):
    """Winsorization at EXACT global p05/p95 (actual elements via the
    histogram-refinement quantile pass — no global sort), then a
    map-only clip. Selecting real elements keeps the clip float-bit-
    exact against SQL; NULL values pass through untouched."""
    from ..functions.relational import exact_quantiles

    ev = read_table(sf_dir, "events", columns=["event_id", "value"],
                    num_blocks=8).materialize()  # quantile scans + clip
    lo, hi = exact_quantiles(ev, "value", (0.05, 0.95))

    def clip(t: pa.Table) -> pa.Table:
        v = t["value"]
        w = pc.if_else(pc.less(v, lo), pa.scalar(lo, pa.float64()),
                       pc.if_else(pc.greater(v, hi),
                                  pa.scalar(hi, pa.float64()), v))
        return t.drop_columns(["value"]).append_column("value_w", w)

    return ev.map_batches(clip, batch_format="pyarrow")


SQL_WINSORIZED_EVENTS = """
WITH q AS (
  SELECT quantile_disc(value, 0.05) AS lo,
         quantile_disc(value, 0.95) AS hi
  FROM events
)
SELECT event_id,
       CASE WHEN value < lo THEN lo
            WHEN value > hi THEN hi
            ELSE value END AS value_w
FROM events, q
"""


def q_scd2_user_tier(sf_dir: str):
    """SCD-2 validity-interval lookup — the feature-store dimension
    join: each user's purchases define tier versions with
    [valid_from, valid_to) intervals (tier = purchase ordinal,
    valid_to = next purchase); every click joins the tier valid AT its
    timestamp. One exchange co-locates a user's full history; the
    kernel is fully vectorized: sort with purchases BEFORE clicks at
    equal ts (interval start is inclusive), cumsum purchase flags, take
    clicks. Clicks before any purchase drop out (inner join)."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"],
                                    pa.array(["click", "purchase"]))),
        batch_format="pyarrow",
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        is_click = (df["event_type"] == "click").to_numpy()
        # purchases sort BEFORE clicks at equal (user, ts): a purchase
        # at exactly a click's ts starts an interval the click is in
        df = df.assign(_c=is_click.astype(np.int8)).sort_values(
            ["user_id", "ts", "_c", "event_id"], kind="mergesort")
        is_p = (df["event_type"] == "purchase").to_numpy(np.int64)
        tier = (pd.Series(is_p, index=df.index)
                .groupby(df["user_id"], sort=False).cumsum())
        out = df[(df["_c"] == 1)].assign(tier=tier[df["_c"] == 1])
        out = out[out["tier"] > 0]
        return out[["event_id", "user_id", "ts", "tier"]].astype(
            {"tier": "int64"})

    return bucket_exchange(ev, ["user_id"], kernel, num_buckets=8)


SQL_SCD2_USER_TIER = """
WITH purch AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS tier
  FROM events WHERE event_type = 'purchase'
), dim AS (
  SELECT user_id, tier, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM purch
)
SELECT c.event_id, c.user_id, c.ts, d.tier
FROM events c JOIN dim d
  ON c.user_id = d.user_id AND c.ts >= d.valid_from
 AND (d.valid_to IS NULL OR c.ts < d.valid_to)
WHERE c.event_type = 'click'
"""


CHUNK_W, CHUNK_S = 32, 24  # window / stride (8-word overlap)


def q_chunked_docs(sf_dir: str):
    """RAG-style overlapping word-window chunking: each doc splits into
    windows of CHUNK_W words at stride CHUNK_S (trailing partial window
    kept). Map-only — zero shuffle; chunk text is assembled per chunk
    (inherent: the output string must be built), everything else rides
    the split list. Output (doc_id, chunk_no, chunk)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def chunk(df: pd.DataFrame) -> pa.Table:
        df = df[df["text"].notna() & (df["text"].str.len() > 0)]
        ids, nos, chunks = [], [], []
        for did, txt in zip(df["doc_id"].to_numpy(), df["text"]):
            words = txt.split(" ")
            for ci, start in enumerate(range(0, len(words), CHUNK_S)):
                ids.append(did)
                nos.append(ci)
                chunks.append(" ".join(words[start:start + CHUNK_W]))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(nos, pa.int64()),
             pa.array(chunks, pa.string())],
            names=["doc_id", "chunk_no", "chunk"])

    return docs.map_batches(chunk, batch_format="pandas")


SQL_CHUNKED_DOCS = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
)
SELECT doc_id, i // {CHUNK_S} AS chunk_no, chunk FROM (
  SELECT doc_id,
         unnest(range(0, len(words), {CHUNK_S})) AS i,
         unnest(list_transform(range(0, len(words), {CHUNK_S}),
                i -> array_to_string(list_slice(words, i + 1,
                                                i + {CHUNK_W}), ' ')))
           AS chunk
  FROM w
)
"""


def q_weighted_price_quantiles(sf_dir: str):
    """Quantity-WEIGHTED price quantiles (weighted median + quartiles):
    the smallest price whose cumulative quantity reaches q·Σqty — what
    'median price per unit sold' actually means. Exact via the weighted
    histogram-refinement pass; int64 weight sums, actual elements."""
    from ..functions.relational import weighted_quantiles

    li = read_table(sf_dir, "lineitem",
                    columns=["l_extendedprice", "l_quantity"],
                    num_blocks=8).materialize()  # multi-pass refinement
    p25, p50, p75 = weighted_quantiles(
        li, "l_extendedprice", "l_quantity", (0.25, 0.5, 0.75))
    return pd.DataFrame({"wp25": [p25], "wp50": [p50], "wp75": [p75]})


SQL_WEIGHTED_PRICE_QUANTILES = """
WITH c AS (
  SELECT l_extendedprice AS v, SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY v
), cum AS (
  SELECT v, SUM(w) OVER (ORDER BY v) AS cw,
         SUM(w) OVER () AS tot
  FROM c
)
SELECT MIN(CASE WHEN cw >= 0.25 * tot THEN v END) AS wp25,
       MIN(CASE WHEN cw >= 0.50 * tot THEN v END) AS wp50,
       MIN(CASE WHEN cw >= 0.75 * tot THEN v END) AS wp75
FROM cum
"""


def q_typo_pairs_docs(sf_dir: str):
    """Distance-1 string similarity join over the corpus vocabulary
    (typo/variant detection) on FastSS deletion-variant blocking — no
    all-pairs compare. The vocabulary is augmented with deterministic
    first-char-dropped forms (len>3) on BOTH sides so the fixture
    actually contains distance-1 pairs; the oracle is a literal
    levenshtein()=1 join."""
    from ..functions.neardup import edit_distance_pairs
    from ..stages.dedup import dedup_exact

    docs = read_table(sf_dir, "documents", columns=["text"], num_blocks=8)

    def explode(df: pd.DataFrame) -> pa.Table:
        words = df["text"].dropna().str.split(" ").explode().dropna()
        u = set(words.unique())
        u |= {w[1:] for w in u if len(w) > 3}
        return pa.Table.from_arrays(
            [pa.array(sorted(u), pa.string())], names=["w"])

    toks = dedup_exact(docs.map_batches(explode, batch_format="pandas"),
                       ["w"], num_buckets=8)
    return edit_distance_pairs(toks, "w", num_buckets=8)


SQL_TYPO_PAIRS = """
WITH base AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
), tok AS (
  SELECT DISTINCT w FROM (
    SELECT w FROM base
    UNION ALL SELECT substring(w, 2) FROM base WHERE length(w) > 3
  )
)
SELECT a.w AS w_a, b.w AS w_b
FROM tok a JOIN tok b ON a.w < b.w AND levenshtein(a.w, b.w) = 1
"""


DUPSPAN_N = 5


def q_dup_span_docs(sf_dir: str):
    """Exact duplicate-span coverage (the Lee-et-al. marking pass):
    per doc, how many word positions fall inside ANY corpus-duplicated
    5-gram window — the union mass a span-removal pass would cut."""
    from ..functions.text import duplicate_span_stats

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    return duplicate_span_stats(docs, n=DUPSPAN_N, num_buckets=8)


SQL_DUP_SPAN_DOCS = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
), d AS (
  SELECT doc_id, len(w) AS n_words, w FROM t WHERE len(w) >= {DUPSPAN_N}
), g AS (
  SELECT doc_id,
         unnest(range(0, n_words - {DUPSPAN_N} + 1)) AS s,
         unnest(list_transform(range(0, n_words - {DUPSPAN_N} + 1),
                i -> array_to_string(list_slice(w, i + 1,
                                                i + {DUPSPAN_N}), ' ')))
           AS gram
  FROM d
), dupstarts AS (
  SELECT doc_id, s FROM g
  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2)
), covered AS (
  SELECT DISTINCT p.doc_id, p.p FROM
    (SELECT doc_id, unnest(range(0, n_words)) AS p FROM d) p
    JOIN dupstarts s
      ON p.doc_id = s.doc_id AND p.p >= s.s AND p.p < s.s + {DUPSPAN_N}
)
SELECT d.doc_id, d.n_words, COALESCE(c.n, 0) AS n_covered
FROM d LEFT JOIN (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM covered GROUP BY doc_id
) c USING (doc_id)
"""


def q_incremental_event_totals(sf_dir: str):
    """Materialized-aggregate maintenance: per-user totals built from
    the pre-cutoff log are REFRESHED with the post-cutoff delta by
    merging decomposable partials (sum adds, count adds, max maxes) —
    the base log is never rescanned. The merged view equals the
    full-log GROUP BY, which is exactly the oracle. Sum rounded on the
    0.01 input grid (boundary-safe; see events_by_type)."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"],
                    num_blocks=8).materialize()
    cutoff = pa.scalar(pd.Timestamp("2024-01-16"), type=pa.timestamp("us"))
    pre = ev.map_batches(lambda t: t.filter(pc.less(t["ts"], cutoff)),
                         batch_format="pyarrow")
    post = ev.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ts"], cutoff)),
        batch_format="pyarrow")
    spec = {"sum_value": ("value", "sum"), "n": ("event_id", "count"),
            "max_value": ("value", "max")}
    base = grouped_agg(pre, ["user_id"], spec, num_buckets=8)
    delta = grouped_agg(post, ["user_id"], spec, num_buckets=8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)
        out = pd.DataFrame({
            "sum_value": round_half_away(g["sum_value"].sum(), 2),
            "n": g["n"].sum().astype("int64"),
            "max_value": g["max_value"].max(),
        }).reset_index()
        return out

    return bucket_exchange(base.union(delta), ["user_id"], merge,
                           num_buckets=8)


SQL_INCREMENTAL_EVENT_TOTALS = """
SELECT user_id, ROUND(SUM(value), 2) AS sum_value,
       CAST(COUNT(event_id) AS BIGINT) AS n,
       MAX(value) AS max_value
FROM events GROUP BY user_id
"""


def q_linear_score_docs(sf_dir: str):
    """Broadcast-model batch inference, SQL-paired: a 64-dim
    integer-weight linear classifier over hashing-trick features scores
    every doc in one map pass — the weight vector rides the task
    closure (at real scale: ray.put once), the corpus streams, the
    margin is an exact int64 dot product (no sigmoid — monotone in the
    margin, and libm-free so the oracle compares bit-exactly)."""
    from ..functions.text import hashed_term_counts

    dim = 64
    # deterministic "trained" weights, mirrored literally in the SQL
    weights = np.array([(b * 7) % 13 - 6 for b in range(dim)],
                       dtype=np.int64)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def score(df: pd.DataFrame) -> pa.Table:
        feats = hashed_term_counts(df, dim=dim)
        m = (feats["n"].to_numpy(np.int64)
             * weights[feats["bucket"].to_numpy(np.int64)])
        margin = (pd.Series(m).groupby(feats["doc_id"].to_numpy())
                  .sum())
        return pa.Table.from_arrays(
            [pa.array(margin.index.to_numpy(np.int64)),
             pa.array(margin.to_numpy(np.int64))],
            names=["doc_id", "margin"])

    return docs.map_batches(score, batch_format="pandas")


SQL_LINEAR_SCORE_DOCS = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
), feats AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substring(md5(w), 1, 8)) AS BIGINT) % 64
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM words GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(SUM(n * ((bucket * 7) % 13 - 6)) AS BIGINT) AS margin
FROM feats GROUP BY doc_id
"""


def q_epoch_order_docs(sf_dir: str):
    """Deterministic global TRAINING ORDER (epoch shuffle): every doc's
    position under knuth-hash order for an epoch salt — reproducible
    across runs and resumable mid-epoch, with NO global sort: the
    distributed ordered scan ranks a collision-free composite key
    (hash·2³¹ + doc_id, lexicographically equal to ORDER BY hash,
    doc_id)."""
    from ..functions.relational import ordered_scan
    from ..functions.sampling import knuth_hash

    EPOCH = 1
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      num_blocks=8)

    def key(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy(np.int64)
        h = knuth_hash(ids + EPOCH).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ids),
             pa.array(h * (1 << 31) + ids),
             pa.array(np.ones(len(ids), np.int64))],
            names=["doc_id", "k", "one"])

    scanned = ordered_scan(docs.map_batches(key, batch_format="pandas"),
                           "k", "one", out_col="pos", num_buckets=8)
    return scanned.map_batches(lambda df: df[["doc_id", "pos"]],
                               batch_format="pandas")


SQL_EPOCH_ORDER_DOCS = """
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY ((doc_id + 1) * 2654435761) % 4294967296, doc_id
       ) AS pos
FROM documents
"""


def q_canonical_urls(sf_dir: str):
    """URL canonicalization — the crawl-frontier normalizer: strip
    fragments, drop utm_* tracking params (keeping the rest, order
    preserved), lowercase the host. The fixture's clean urls are first
    deterministically messified (md5-hash-gated fragment / tracking
    query / uppercased host) so the op is non-vacuous; the SQL oracle
    mirrors BOTH the messify and the canonicalize, string-op for
    string-op. Param filtering is explode-based (vectorized per param,
    not per url); zero shuffle after the distinct."""
    import hashlib

    from ..stages.dedup import dedup_exact

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)
    urls = dedup_exact(ds, ["url"], num_buckets=16)

    def messify_canon(df: pd.DataFrame) -> pd.DataFrame:
        u = df["url"]
        h = pd.Series(
            [int(hashlib.md5(x.encode()).hexdigest()[:8], 16) for x in u],
            index=df.index, dtype="int64")
        rest = u.str.split("//", n=1).str[1]
        host = rest.str.split("/", n=1).str[0]
        path = "/" + rest.str.split("/", n=1).str[1].fillna("")
        q = pd.Series("", index=df.index, dtype=object)
        q[h % 5 == 0] = "?utm_source=x&id=" + (h % 10).astype(str)
        q[h % 11 == 0] = "?id=" + (h % 10).astype(str)  # priority branch
        frag = pd.Series("", index=df.index, dtype=object)
        frag[h % 3 == 0] = "#frag"
        mhost = host.where(h % 7 != 0, host.str.upper())
        messy = "https://" + mhost + path + q + frag

        # --- canonicalize (receives only `messy`) ---
        nofrag = messy.str.split("#", n=1).str[0]
        base = nofrag.str.split("?", n=1).str[0]
        qs = nofrag.str.split("?", n=1).str[1].fillna("")
        params = qs.str.split("&").explode()
        kept = params[~params.str.startswith("utm_")]
        kq = kept.groupby(level=0).agg("&".join).reindex(
            df.index, fill_value="")
        rest2 = base.str.split("//", n=1).str[1]
        host2 = rest2.str.split("/", n=1).str[0].str.lower()
        path2 = "/" + rest2.str.split("/", n=1).str[1].fillna("")
        canon = "https://" + host2 + path2 + np.where(kq != "", "?" + kq,
                                                      "")
        return pd.DataFrame({"url_in": messy.astype(object),
                             "url_canonical": canon.astype(object)})

    return urls.map_batches(messify_canon, batch_format="pandas")


SQL_CANONICAL_URLS = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), hh AS (
  SELECT url,
         CAST(CONCAT('0x', substring(md5(url), 1, 8)) AS BIGINT) AS h,
         split_part(split_part(url, '//', 2), '/', 1) AS host,
         substr(url, 9 + length(split_part(split_part(url, '//', 2),
                                           '/', 1))) AS path
  FROM u
), m AS (
  SELECT 'https://'
         || CASE WHEN h % 7 = 0 THEN upper(host) ELSE host END || path
         || CASE WHEN h % 11 = 0 THEN '?id=' || CAST(h % 10 AS VARCHAR)
                 WHEN h % 5 = 0
                   THEN '?utm_source=x&id=' || CAST(h % 10 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN h % 3 = 0 THEN '#frag' ELSE '' END AS url_in
  FROM hh
), c AS (
  SELECT url_in,
         split_part(split_part(url_in, '#', 1), '?', 1) AS base,
         array_to_string(
           list_filter(
             string_split(split_part(split_part(url_in, '#', 1), '?', 2),
                          '&'),
             p -> NOT starts_with(p, 'utm_')), '&') AS kq
  FROM m
)
SELECT url_in,
       'https://'
       || lower(split_part(split_part(base, '//', 2), '/', 1))
       || substr(base, 9 + length(split_part(split_part(base, '//', 2),
                                             '/', 1)))
       || CASE WHEN kq <> '' THEN '?' || kq ELSE '' END AS url_canonical
FROM c
"""


def q_user_type_gini(sf_dir: str):
    """Behavioral diversity per user as GINI impurity of the event-type
    distribution (1 − Σp²) — the libm-free stand-in for entropy (ln is
    not reproducible across engines; Σn²/N² is exact integer arithmetic
    plus one correctly-rounded division on both sides). Two-level
    aggregation: (user, type) counts from one pre-aggregated exchange,
    then a per-user combine of ≤|types| rows."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type"], num_blocks=8)
    counts = grouped_agg(ev, ["user_id", "event_type"],
                         {"n": ("event_type", "count")}, num_buckets=8)

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"], "n": n,
                          "nn": n * n}).groupby("user_id", sort=False)
        ss, tot = g["nn"].sum(), g["n"].sum()
        out = pd.DataFrame({
            "gini": 1.0 - ss.to_numpy(np.float64)
            / (tot * tot).to_numpy(np.float64),
        }, index=ss.index).reset_index()
        return out

    return bucket_exchange(counts, ["user_id"], gini, num_buckets=8)


SQL_USER_TYPE_GINI = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
), g AS (
  SELECT user_id, SUM(n * n) AS ss, SUM(n) AS tot FROM c GROUP BY user_id
)
SELECT user_id,
       1.0 - CAST(ss AS DOUBLE) / CAST(tot * tot AS DOUBLE) AS gini
FROM g
"""


def q_neighbor_pairs_docs(sf_dir: str):
    """Sorted-neighborhood ER blocking: candidate pairs of docs within
    rank distance < 3 in global (n_chars, doc_id) order — overlapping
    rank-range buckets, no global sort, no all-pairs."""
    from ..functions.relational import sorted_neighborhood_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(t["n_chars"].is_valid()),
        batch_format="pyarrow",
    )
    return sorted_neighborhood_pairs(docs, "n_chars", "doc_id", window=3,
                                     num_buckets=8)


SQL_NEIGHBOR_PAIRS_DOCS = """
WITH r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM r a JOIN r b ON b.rn > a.rn AND b.rn < a.rn + 3
"""


def q_assoc_rules_sessions(sf_dir: str):
    """Market-basket association rules over gap-sessionized events:
    support = #sessions containing BOTH types, confidence =
    support / #sessions containing the antecedent — exact integer
    counts plus one correctly-rounded division. One exchange
    co-locates each user's history; the kernel sessionizes (the same
    gap rule as sessionize_events), builds distinct (session, type)
    pairs via a vectorized self-merge, and emits partial counts; a
    tiny second exchange combines ≤|types|² rows."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        gap = df.groupby("user_id", sort=False)["ts"].diff()
        is_new = (gap.isna()
                  | (gap > pd.Timedelta(seconds=SESSION_GAP_S)))
        sid = is_new.cumsum()  # globally unique within this bucket
        d = pd.DataFrame({"sid": sid, "t": df["event_type"]})
        d = d.drop_duplicates()
        pairs = d.merge(d, on="sid")
        pairs = pairs[pairs["t_x"] < pairs["t_y"]]
        pc_ = (pairs.groupby(["t_x", "t_y"], sort=False).size()
               .rename("n_pair").reset_index())
        ac = (d.groupby("t", sort=False).size()
              .rename("n_ante").reset_index())
        pc_["kind"] = "p"
        ac = ac.rename(columns={"t": "t_x"})
        ac["t_y"] = ""
        ac["kind"] = "a"
        ac["n_pair"] = ac.pop("n_ante")
        return pd.concat([pc_[["t_x", "t_y", "n_pair", "kind"]],
                          ac[["t_x", "t_y", "n_pair", "kind"]]],
                         ignore_index=True)

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        tot = (df.groupby(["kind", "t_x", "t_y"], sort=False)["n_pair"]
               .sum().reset_index())
        ante = tot[tot["kind"] == "a"].set_index("t_x")["n_pair"]
        out = tot[tot["kind"] == "p"].copy()
        out["support"] = out["n_pair"].astype("int64")
        out["confidence"] = (out["support"].to_numpy(np.float64)
                             / ante.reindex(out["t_x"]).to_numpy(
                                 np.float64))
        return out[["t_x", "t_y", "support", "confidence"]].rename(
            columns={"t_x": "type_a", "t_y": "type_b"})

    # single combine bucket: the lattice is ≤ |types|² rows and the
    # antecedent totals must be co-located with every pair row
    return bucket_exchange(partials, ["kind"], combine, 1)


SQL_ASSOC_RULES = f"""
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_type,
         SUM(is_new) OVER w2 AS session_seq
  FROM flagged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)
), d AS (
  SELECT DISTINCT user_id, session_seq, event_type FROM numbered
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM d a JOIN d b
    ON a.user_id = b.user_id AND a.session_seq = b.session_seq
   AND a.event_type < b.event_type
  GROUP BY 1, 2
), ante AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
)
SELECT p.type_a, p.type_b, p.support,
       CAST(p.support AS DOUBLE) / CAST(a.n AS DOUBLE) AS confidence
FROM pairs p JOIN ante a ON a.event_type = p.type_a
"""


def q_skyline_lineitems(sf_dir: str):
    """Distributed exact 2-D Pareto frontier (skyline) of lineitems,
    maximizing extended price AND discount: per-block vectorized
    frontier prefilter (lossless — dominance is transitive), then an
    exact pass over the tiny candidate union. No shuffle, no all-pairs;
    the oracle's NOT-EXISTS semantics via an O(n log n) window rewrite."""
    from ..functions.relational import pareto_frontier

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber",
                             "l_extendedprice", "l_discount"], num_blocks=8)
    out = pareto_frontier(li, "l_extendedprice", "l_discount")
    out["l_linenumber"] = out["l_linenumber"].astype("int64")
    return out


SQL_SKYLINE_LINEITEMS = """
WITH p AS (
  SELECT l_extendedprice AS price, MAX(l_discount) AS gmax
  FROM lineitem GROUP BY 1
), r AS (
  SELECT price, gmax,
         MAX(gmax) OVER (ORDER BY price DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS m1
  FROM p
)
SELECT a.l_orderkey, CAST(a.l_linenumber AS BIGINT) AS l_linenumber,
       a.l_extendedprice, a.l_discount
FROM lineitem a JOIN r ON a.l_extendedprice = r.price
WHERE a.l_discount = r.gmax AND (r.m1 IS NULL OR r.m1 < a.l_discount)
"""


def q_audit_orders(sf_dir: str):
    """Deequ-style data-quality audit over orders: NULL completeness,
    range bounds, allowed-value sets, and key uniqueness — exact
    violation counts, all scalar checks fused into ONE map-only pass
    (per-batch vectorized partials), uniqueness as one pre-aggregated
    (key, count) exchange. Output is ≤ a handful of rows at any scale."""
    from ..functions.relational import audit_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                                 "o_totalprice", "o_orderdate"], num_blocks=8)
    return audit_table(
        orders,
        null_cols=["o_custkey", "o_orderdate"],
        range_checks={"o_totalprice": (0.01, 300000.0)},
        set_checks={"o_orderstatus": ["O", "F", "P"]},
        unique_cols=["o_orderkey"],
    )


SQL_AUDIT_ORDERS = """
SELECT 'null:o_custkey' AS check_name,
       CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'null:o_orderdate',
       CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT) FROM orders
UNION ALL
SELECT 'range:o_totalprice',
       CAST(COUNT(*) FILTER (o_totalprice IS NOT NULL
            AND (o_totalprice < 0.01 OR o_totalprice > 300000.0)) AS BIGINT)
FROM orders
UNION ALL
SELECT 'in_set:o_orderstatus',
       CAST(COUNT(*) FILTER (o_orderstatus IS NOT NULL
            AND o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique:o_orderkey',
       CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
"""


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix: distinct users per (first-seen week ×
    active week). Weeks are integer epoch-µs // 604800e6 (the only
    timestamp encoding that hash-compares exactly across engine/SQL).
    Map-side thinning to distinct (user, week) pairs, ONE exchange by
    user computes each user's cohort and re-emits its distinct pairs as
    (cohort, week) partial counts; a tiny second combine sums them —
    rows never cross the wire twice."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)

    def thin(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
        return pd.DataFrame({"user_id": df["user_id"],
                             "wk": us // 604800000000}).drop_duplicates()

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # re-dedup across batch partials
        cohort = df.groupby("user_id", sort=False)["wk"].transform("min")
        return (pd.DataFrame({"cohort_week": cohort,
                              "active_week": df["wk"]})
                .groupby(["cohort_week", "active_week"], sort=False)
                .size().rename("n_users").reset_index())

    pairs = ev.map_batches(thin, batch_format="pandas")
    part = bucket_exchange(pairs, ["user_id"], per_user, num_buckets=8)
    return grouped_agg(part, ["cohort_week", "active_week"],
                       {"n_users": ("n_users", "sum")}, num_buckets=8)


SQL_COHORT_RETENTION = """
WITH w AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
), f AS (
  SELECT user_id, MIN(wk) AS cohort_week FROM w GROUP BY user_id
), a AS (
  SELECT DISTINCT w.user_id, f.cohort_week, w.wk AS active_week
  FROM w JOIN f USING (user_id)
)
SELECT cohort_week, active_week, CAST(COUNT(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort_week, active_week
"""


#: fixed absolute token budget for q_token_budget_docs: the deterministic
#: md5 order is uniform, so a fixed budget admits ~budget/avg_tokens docs
#: at EVERY scale (a proper subset at sf0.001 and up)
DOC_TOKEN_BUDGET = 15_000


def q_token_budget_docs(sf_dir: str):
    """Token-budget corpus selection: take documents in a deterministic
    md5-shuffled order until the cumulative token count reaches a fixed
    budget — the 'cut a uniform 10B-token subset' curation op. Tokens
    are \\S+ runs (regexp-exact on both sides); the cumulative count is
    the distributed ordered scan (range cuts + broadcast offsets — no
    global sort), and the 48-bit md5 prefix of doc_id is the
    collision-free order key."""
    import hashlib

    from ..functions.relational import ordered_scan

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
             for i in df["doc_id"]), np.int64, len(df))
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
            "h": h,
        })

    t = docs.map_batches(prep, batch_format="pandas")
    scanned = ordered_scan(t, "h", "n_tokens", out_col="cum_tokens",
                           num_buckets=8)
    return scanned.map_batches(
        lambda df: df[df["cum_tokens"] <= DOC_TOKEN_BUDGET][
            ["doc_id", "n_tokens", "cum_tokens"]],
        batch_format="pandas",
    )


SQL_TOKEN_BUDGET_DOCS = f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
             AS n_tokens,
         CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY h) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, cum_tokens FROM s
WHERE cum_tokens <= {DOC_TOKEN_BUDGET}
"""


def q_winnow_docs(sf_dir: str):
    """MOSS winnowing fingerprints over documents: k=3-word shingles,
    w=4 hash windows, rightmost-min selection — distinct (doc, pos,
    hash) triples that any shared ≥6-word run is guaranteed to expose.
    Map-only (zero shuffle); the SQL oracle replays the shingle md5 and
    the rightmost-min via window MIN + a positional join-back."""
    from ..functions.text import winnow_fingerprints

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    return docs.map_batches(winnow_fingerprints, batch_format="pandas")


SQL_WINNOW_DOCS = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
), g AS (
  SELECT doc_id,
         unnest(range(0, len(ws) - 2)) AS pos,
         unnest(list_transform(range(0, len(ws) - 2),
             i -> CAST(CONCAT('0x', substring(md5(
                  ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]),
                  1, 8)) AS BIGINT))) AS h
  FROM w WHERE len(ws) >= 3
), m AS (
  SELECT doc_id, pos AS e,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mh
  FROM g
  QUALIFY pos >= 3
), sel AS (
  SELECT m.doc_id, MAX(g.pos) AS pos
  FROM m JOIN g ON g.doc_id = m.doc_id
               AND g.pos BETWEEN m.e - 3 AND m.e AND g.h = m.mh
  GROUP BY m.doc_id, m.e
)
SELECT DISTINCT s.doc_id, s.pos, g.h
FROM sel s JOIN g ON g.doc_id = s.doc_id AND g.pos = s.pos
"""


def q_projected_embeddings(sf_dir: str):
    """Achlioptas ±1 sparse random projection of int8-quantized
    embeddings to 8 dims — integer-exact JL-style reduction (sums of
    ints are order-independent; a float matmul would not hash-compare).
    One broadcast matrix + one int matmul per batch; exploded output."""
    from ..functions.ann import random_project_int8

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     num_blocks=8)
    return random_project_int8(emb, d_out=8)


SQL_PROJECTED_EMB = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), s AS (
  SELECT vec_id, emb,
         list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS scale
  FROM e
), q AS (
  SELECT vec_id,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                     -127) AS BIGINT) END)) AS qv
  FROM s
), d AS (
  SELECT unnest(range(0, 8)) AS out_dim
), r AS (
  SELECT q.vec_id, d.out_dim, q.qv,
         CAST(CONCAT('0x', substring(md5(
              CAST(q.pos AS VARCHAR) || '_' || CAST(d.out_dim AS VARCHAR)),
              1, 8)) AS BIGINT) % 6 AS hm
  FROM q CROSS JOIN d
)
SELECT vec_id, out_dim,
       CAST(SUM(CASE WHEN hm = 0 THEN qv
                     WHEN hm = 1 THEN -qv ELSE 0 END) AS BIGINT) AS y
FROM r GROUP BY vec_id, out_dim
"""


def q_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions per hour, sampled at session starts
    (concurrency only increases at a start, so start-point samples
    capture every peak): sessionize per user (one sorted-partition
    pass), emit ±1 sweep-line points keyed by epoch-µs·2 (+1 for
    starts, ends at ·2+1 so a start at t counts a session ending at t
    as still open), run the distributed ordered scan over the points,
    and take the max running sum per hour of the start. Only two tiny
    rows per session ever re-shuffle."""
    from ..functions.relational import grouped_agg, ordered_scan
    from ..stages.partition import apply_sorted
    from ..stages.window import sessionize

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"], num_blocks=8)

    def sess_points(df: pd.DataFrame) -> pd.DataFrame:
        df = sessionize(df, "user_id", "ts", gap_seconds=SESSION_GAP_S)
        g = df.groupby(["user_id", "session_id"], sort=False)["ts"]
        st = g.min().astype("datetime64[ns]").astype("int64") // 1000
        en = g.max().astype("datetime64[ns]").astype("int64") // 1000
        return pd.DataFrame({
            "k": np.concatenate([st.to_numpy() * 2,
                                 en.to_numpy() * 2 + 1]),
            "d": np.concatenate([np.ones(len(st), np.int64),
                                 -np.ones(len(en), np.int64)]),
        })

    points = apply_sorted(ev, ["user_id"], "ts", sess_points,
                          num_buckets=16, tiebreak=["event_id"])
    scanned = ordered_scan(points, "k", "d", out_col="conc", num_buckets=8)
    starts = scanned.map_batches(
        lambda df: pd.DataFrame(
            {"hour": (df.loc[df["d"] == 1, "k"] // 2) // 3600000000,
             "conc": df.loc[df["d"] == 1, "conc"]}),
        batch_format="pandas",
    )
    return grouped_agg(starts, ["hour"],
                       {"peak_concurrency": ("conc", "max")}, num_buckets=8)


SQL_PEAK_CONCURRENCY = f"""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         MAX(CASE WHEN is_new = 1 THEN ts END) OVER w2 AS session_start
  FROM flagged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING)
), sess AS (
  SELECT user_id, session_start,
         epoch_us(MIN(ts)) AS st, epoch_us(MAX(ts)) AS en
  FROM numbered GROUP BY user_id, session_start
), pts AS (
  SELECT st * 2 AS k, 1 AS d FROM sess
  UNION ALL
  SELECT en * 2 + 1, -1 FROM sess
), run AS (
  SELECT k, d, CAST(SUM(d) OVER (ORDER BY k) AS BIGINT) AS conc FROM pts
)
SELECT (k // 2) // 3600000000 AS hour,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency
FROM run WHERE d = 1 GROUP BY 1
"""


def q_trend_per_customer(sf_dir: str):
    """Per-customer spend TREND: least-squares slope of order value
    (cents) over order date (epoch days), emitted as an exact rational
    (slope_num/slope_den strings — the values outgrow int64; HUGEINT in
    the oracle). Naive float covariance sums cancel catastrophically
    (Σx·Σy ≫ covariance); the engine keeps every sum an unbounded
    Python int. One partial pass + one tiny exchange of per-group
    sufficient statistics."""
    from ..functions.relational import grouped_linear_trend

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"],
                        num_blocks=8)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        x = (df["o_orderdate"].astype("datetime64[ns]").astype("int64")
             // 86_400_000_000_000)
        y = np.floor(
            df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0 + 0.5
        ).astype("int64")
        return pd.DataFrame({"o_custkey": df["o_custkey"].astype("int64"),
                             "x": x.astype("int64"), "y": y})

    return grouped_linear_trend(
        orders.map_batches(prep, batch_format="pandas"),
        ["o_custkey"], "x", "y", num_buckets=8)


SQL_TREND_PER_CUSTOMER = """
WITH q AS (
  SELECT o_custkey,
         CAST(epoch_us(o_orderdate) // 86400000000 AS HUGEINT) AS x,
         CAST(ROUND(o_totalprice * 100) AS HUGEINT) AS y
  FROM orders
), s AS (
  SELECT o_custkey, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM q GROUP BY o_custkey
)
SELECT o_custkey, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
       CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den
FROM s
"""


def q_rrf_docs(sf_dir: str):
    """Reciprocal-rank fusion per language: documents ranked by
    n_chars and by token count independently (ROW_NUMBER ties → lowest
    doc_id), fused as 1/(60+r1) + 1/(60+r2), top 10 per lang. Each term
    is one IEEE division of small ints added left-to-right, so the
    float score hash-matches DuckDB bit-for-bit. One exchange by lang."""
    from ..functions.relational import rrf_fuse

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang", "n_chars"],
                      num_blocks=8)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"],
            "doc_id": df["doc_id"].astype("int64"),
            "n_chars": df["n_chars"].astype("int64"),
            "n_tokens": df["text"].str.count(r"\S+").fillna(0).astype("int64"),
        })

    return rrf_fuse(docs.map_batches(prep, batch_format="pandas"),
                    ["lang"], "doc_id", ["n_chars", "n_tokens"],
                    k=60, top_n=10, num_buckets=8)


SQL_RRF_DOCS = """
WITH t AS (
  SELECT lang, doc_id, n_chars,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens
  FROM documents
), r AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS r1,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_tokens DESC, doc_id) AS r2
  FROM t
), s AS (
  SELECT lang, doc_id,
         CAST(1 AS DOUBLE) / (60 + r1)
         + CAST(1 AS DOUBLE) / (60 + r2) AS rrf_score
  FROM r
)
SELECT lang, doc_id, rrf_score FROM s
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY rrf_score DESC, doc_id) <= 10
"""


JOIN_DELTA_CUTOFF = "2000-01-01"


def q_join_delta_orders(sf_dir: str):
    """Insert-only incremental JOIN maintenance: the orders⋈lineitem
    view is refreshed by computing ONLY this tick's new join rows —
    ΔA⋈B_new (new orders probe the full lineitem stream) ∪ A_old⋈ΔB
    (newly-shipped lineitems probe the old-order stream). Both deltas
    broadcast once via ray.put; both base tables stream map-only (zero
    shuffle). The oracle is the definitional multiset difference
    full-join EXCEPT ALL old-join."""
    from ..functions.relational import join_delta

    cutoff = np.datetime64(JOIN_DELTA_CUTOFF)

    def order_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_custkey": df["o_custkey"].astype("int64"),
        })

    def line_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["l_orderkey"].astype("int64"),
            "line_no": df["l_linenumber"].astype("int64"),
            "qty": df["l_quantity"].astype("int64"),
            "ship_day": (df["l_shipdate"].astype("datetime64[ns]")
                         .astype("int64") // 86_400_000_000_000),
        })

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"],
                        num_blocks=8)
    a_old = orders.map_batches(
        lambda df: order_cols(df[df["o_orderdate"] < cutoff]),
        batch_format="pandas")
    a_delta = order_cols(
        read_small(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .query("o_orderdate >= @cutoff"))
    line = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"],
        num_blocks=8)
    b_new = line.map_batches(line_cols, batch_format="pandas")
    b_delta = line_cols(
        read_small(sf_dir, "lineitem",
                   columns=["l_orderkey", "l_linenumber", "l_quantity",
                            "l_shipdate"])
        .query("l_shipdate >= @cutoff"))
    return join_delta(a_old, a_delta, b_new, b_delta, on="o_orderkey")


SQL_JOIN_DELTA_ORDERS = f"""
WITH b AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS ship_day,
         l_shipdate
  FROM lineitem
)
SELECT o_orderkey, o_custkey, line_no, qty, ship_day
FROM orders JOIN b ON o_orderkey = l_orderkey
EXCEPT ALL
SELECT o_orderkey, o_custkey, line_no, qty, ship_day
FROM orders JOIN b ON o_orderkey = l_orderkey
WHERE o_orderdate < DATE '{JOIN_DELTA_CUTOFF}'
  AND l_shipdate < DATE '{JOIN_DELTA_CUTOFF}'
"""


def q_grid_clusters(sf_dir: str):
    """Grid-density (cell-DBSCAN) clustering of embeddings: int8
    quantize + Achlioptas ±1 project to 2 integer dims, bin into
    100-unit cells, core cell = ≥3 points, clusters = 8-neighborhood
    components of core cells (label = min cell id), non-core points are
    noise (−1). Points only ever stream through map stages; everything
    that shuffles is CELL-sized. Oracle: the same integer projection +
    a recursive-CTE component closure."""
    from ..functions.ann import grid_density_clusters

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     num_blocks=8)
    return grid_density_clusters(emb, cell=100, min_pts=3, num_buckets=8)


SQL_GRID_CLUSTERS = """
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), s AS (
  SELECT vec_id, emb,
         list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS scale
  FROM e
), q AS (
  SELECT vec_id,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                     -127) AS BIGINT) END)) AS qv
  FROM s
), d AS (
  SELECT unnest(range(0, 2)) AS out_dim
), r AS (
  SELECT q.vec_id, d.out_dim, q.qv,
         CAST(CONCAT('0x', substring(md5(
              CAST(q.pos AS VARCHAR) || '_' || CAST(d.out_dim AS VARCHAR)),
              1, 8)) AS BIGINT) % 6 AS hm
  FROM q CROSS JOIN d
), y AS (
  SELECT vec_id, out_dim,
         CAST(SUM(CASE WHEN hm = 0 THEN qv
                       WHEN hm = 1 THEN -qv ELSE 0 END) AS BIGINT) AS yv
  FROM r GROUP BY vec_id, out_dim
), pts AS (
  SELECT vec_id,
         MAX(CASE WHEN out_dim = 0 THEN (yv + 1048576) // 100 END) AS cx,
         MAX(CASE WHEN out_dim = 1 THEN (yv + 1048576) // 100 END) AS cy
  FROM y GROUP BY vec_id
), cells AS (
  SELECT cx, cy, cx * 4194304 + cy AS cid, COUNT(*) AS n
  FROM pts GROUP BY cx, cy
), core AS (
  SELECT cx, cy, cid FROM cells WHERE n >= 3
), edges AS (
  SELECT a.cid AS src, b.cid AS dst
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.cid <> b.cid
), reach(node, label) AS (
  SELECT cid, cid FROM core
  UNION
  SELECT ed.dst, rc.label FROM reach rc JOIN edges ed ON ed.src = rc.node
), labels AS (
  SELECT node, MIN(label) AS label FROM reach GROUP BY node
)
SELECT p.vec_id, p.cx, p.cy,
       COALESCE(l.label, CAST(-1 AS BIGINT)) AS cluster
FROM pts p
LEFT JOIN core c ON c.cx = p.cx AND c.cy = p.cy
LEFT JOIN labels l ON l.node = c.cid
"""


def q_cms_user_counts(sf_dir: str):
    """Count-min sketch frequency estimates for every user (depth 4 ×
    width 512, md5 row-hashes): exact count n next to the sketch
    estimate cms_est = min over rows of the user's cell — always ≥ n.
    Map side carries fixed O(d·w) state per batch; the merged grid
    broadcasts once. The oracle replays the sketch cell-for-cell."""
    from ..functions.skew import count_min_sketch

    ev = read_table(sf_dir, "events", columns=["user_id"], num_blocks=8)
    return count_min_sketch(ev, "user_id", depth=4, width=512,
                            num_buckets=8)


SQL_CMS_USER_COUNTS = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
), rows_ AS (
  SELECT unnest(range(0, 4)) AS j
), hashed AS (
  SELECT c.user_id, c.n, r.j,
         CAST(CONCAT('0x', substring(md5(
              CAST(r.j AS VARCHAR) || '_' || CAST(c.user_id AS VARCHAR)),
              1, 8)) AS BIGINT) % 512 AS b
  FROM counts c CROSS JOIN rows_ r
), cells AS (
  SELECT j, b, SUM(n) AS cell FROM hashed GROUP BY j, b
)
SELECT h.user_id, h.n, CAST(MIN(cells.cell) AS BIGINT) AS cms_est
FROM hashed h JOIN cells ON cells.j = h.j AND cells.b = h.b
GROUP BY h.user_id, h.n
"""


def q_seasonal_backtest(sf_dir: str):
    """Seasonal-naive forecast backtest: hourly event counts per type,
    forecast = same hour yesterday (period 24), exact integer error
    sums per type. Hourly counts from one partial-agg exchange; the
    pairing join is per-key inside a second exchange."""
    from ..functions.relational import grouped_agg, seasonal_naive_backtest

    ev = read_table(sf_dir, "events", columns=["event_type", "ts"],
                    num_blocks=8)

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "h": (df["ts"].astype("datetime64[ns]").astype("int64")
                  // 3_600_000_000_000),
        })

    hourly = grouped_agg(
        ev.map_batches(hours, batch_format="pandas"),
        ["event_type", "h"], {"y": ("h", "count")}, num_buckets=8)
    return seasonal_naive_backtest(hourly, ["event_type"], "h", "y",
                                   period=24, num_buckets=8)


SQL_SEASONAL_BACKTEST = """
WITH c AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), j AS (
  SELECT a.event_type, abs(a.y - b.y) AS ae
  FROM c a JOIN c b ON a.event_type = b.event_type AND b.h = a.h - 24
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ae) AS BIGINT) AS sae, CAST(MAX(ae) AS BIGINT) AS max_ae
FROM j GROUP BY event_type
"""


def q_attribution_events(sf_dir: str):
    """Linear multi-touch attribution: each purchase's cents split
    equally (largest-remainder, integer-exact) over the user's
    non-purchase events in the preceding 7 days. One user-keyed sorted
    exchange; per-purchase ranges explode vectorized."""
    from ..stages.partition import apply_sorted
    from ..stages.window import attribute_linear

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"], num_blocks=8)
    return apply_sorted(ev, ["user_id"], "ts", attribute_linear,
                        num_buckets=16, tiebreak=["event_id"])


SQL_ATTRIBUTION_EVENTS = """
WITH p AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type <> 'purchase'
), j AS (
  SELECT p.event_id AS purchase_id, t.event_id AS touch_id, p.cents,
         COUNT(*) OVER (PARTITION BY p.event_id) AS n,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY t.ts, t.event_id) AS rn
  FROM p JOIN t ON t.user_id = p.user_id
       AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
)
SELECT purchase_id, touch_id,
       CAST(cents // n + CASE WHEN rn <= cents % n THEN 1 ELSE 0 END
            AS BIGINT) AS credit_cents
FROM j
"""


def q_temperature_mix_docs(sf_dir: str):
    """√-share (T=2) temperature resampling of the corpus mix: source
    share s keeps rows at min(1, 0.5·sqrt(s)) — tail sources up-weight.
    sqrt is the ONE temperature exponent that is IEEE-exact on both
    engines. Count pass → broadcast rates → zero-shuffle knuth-hash
    Bernoulli filter."""
    from ..functions.sampling import temperature_resample

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"],
                      num_blocks=8)
    return temperature_resample(docs, "source", "doc_id", coef=0.5,
                                num_buckets=8)


SQL_TEMPERATURE_MIX = """
WITH c AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n) AS total FROM c
), r AS (
  SELECT source,
         LEAST(1.0, 0.5 * sqrt(n / CAST(total AS DOUBLE))) AS p
  FROM c, tot
)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE ((d.doc_id * 2654435761) % 4294967296) / 4294967296.0 < r.p
"""


def q_t5_spans_docs(sf_dir: str):
    """Deterministic T5 span-corruption plan: every full 20-token block
    masks a 3-token span at md5-derived offset — 15% corruption,
    non-overlapping by construction, reproducible on any cluster size.
    Map-only."""
    from ..functions.text import span_corruption_plan

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    return docs.map_batches(span_corruption_plan, batch_format="pandas")


SQL_T5_SPANS = """
WITH w AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\S+')) // 20 AS nb
  FROM documents
)
SELECT doc_id,
       unnest(range(0, nb)) AS block_no,
       unnest(list_transform(range(0, nb), i ->
           i * 20 + CAST(CONCAT('0x', substring(md5(
               CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR)),
               1, 8)) AS BIGINT) % 18)) AS start_tok,
       unnest(list_transform(range(0, nb), i -> CAST(3 AS BIGINT)))
           AS mask_len
FROM w WHERE nb > 0
"""


#: ordered for a budget-bounded driver sweep: the flagship pair + the
#: near-dup family first (the r3 verification gap — they MUST get driver
#: rows), then every other query CHEAPEST-FIRST by measured sf0.01 wall
#: time (scripts/selfcheck.py prints per-query timings) so the sweep
#: maximizes green correctness rows before the budget ends
def q_bpe_pairs_docs(sf_dir: str):
    """Top-20 BPE merge candidates (corpus adjacent char-pair counts
    within words) — the first tokenizer-training iteration, distributed
    as two vocabulary-sized exchanges (see
    :func:`transmog_ray.functions.text.bpe_pair_counts`)."""
    from ..functions.text import bpe_pair_counts

    docs = read_table(sf_dir, "documents", columns=["text"])
    return bpe_pair_counts(docs, k=20)


SQL_BPE_PAIRS_DOCS = """
WITH words AS (
  SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS w FROM documents
), wc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM words GROUP BY w
), pairs AS (
  SELECT substring(w, CAST(i + 1 AS INT), 2) AS pair, c
  FROM wc, unnest(range(length(w) - 1)) t(i)
)
SELECT pair, CAST(SUM(c) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT 20
"""


def q_inverted_index_docs(sf_dir: str):
    """Search-index build: token → document frequency + sorted posting
    list (comma-joined string). One token-partitioned exchange of
    (doc_id, token) pairs; text never shuffles."""
    from ..functions.text import inverted_index

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_index(docs)


SQL_INVERTED_INDEX_DOCS = """
WITH pairs AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tok
    FROM documents)
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY tok
"""


_SEARCH_TERMS = ("data", "the", "join")


def q_boolean_search_docs(sf_dir: str):
    """Conjunctive token search (docs containing every query term as a
    whole token) — broadcast terms, map-only padded-substring filter,
    zero shuffle."""
    from ..functions.text import boolean_search

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return boolean_search(docs, _SEARCH_TERMS)


SQL_BOOLEAN_SEARCH_DOCS = """
SELECT doc_id FROM documents
WHERE POSITION(' data ' IN ' ' || COALESCE(text, '') || ' ') > 0
  AND POSITION(' the '  IN ' ' || COALESCE(text, '') || ' ') > 0
  AND POSITION(' join ' IN ' ' || COALESCE(text, '') || ' ') > 0
"""


def q_ppjoin_docs(sf_dir: str):
    """EXACT word-3-gram Jaccard similarity self-join ≥ 0.5 via PPJoin
    prefix filtering — lossless candidates (rarest-first prefixes +
    length filter) then the bucketed two-probe verify; output is
    bit-identical to the guarded all-pairs oracle, with no O(n²)
    stage."""
    from ..functions.neardup import ppjoin_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ppjoin_pairs(docs, threshold=0.5, n=3, num_buckets=16)


# its oracle is SQL_NGRAM_JACCARD verbatim: PPJoin is the exact scale
# path for the same join, so both registry entries share one SQL twin


def q_chi2_lang_source(sf_dir: str):
    """Chi-square association cells between documents.lang and .source
    (feature-selection / drift-detection statistic): observed count,
    expected count under independence, and the per-cell chi² term.

    Distributed shape: cell counts combine in one tiny exchange
    (cardinality ≤ |langs|·|sources| — category-product bounded), then
    the margins and per-cell terms finish driver-side on that bounded
    frame. Per-CELL terms (not the summed statistic) are emitted
    because each is a fixed op-order float expression —
    ``e = (r·c)/n; ((o−e)·(o−e))/e`` — that DuckDB reproduces exactly,
    while a cross-cell SUM would be order-sensitive."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    cells = grouped_agg(
        docs.map_batches(
            lambda d: d.dropna(subset=["lang", "source"])
                       .assign(o=np.int64(1))[["lang", "source", "o"]],
            batch_format="pandas",
        ),
        ["lang", "source"], {"o": ("o", "sum")}, num_buckets=8,
    ).to_pandas()
    r = cells.groupby("lang")["o"].sum().rename("r")
    c = cells.groupby("source")["o"].sum().rename("c")
    n = np.int64(cells["o"].sum())
    out = cells.merge(r, on="lang").merge(c, on="source")
    e = (out["r"].to_numpy(np.int64) * out["c"].to_numpy(np.int64)).astype(
        np.float64) / np.float64(n)
    o = out["o"].to_numpy(np.int64).astype(np.float64)
    out["expected"] = e
    out["chi2_cell"] = ((o - e) * (o - e)) / e
    return out[["lang", "source", "o", "expected", "chi2_cell"]]


SQL_CHI2_LANG_SOURCE = """
WITH base AS (
  SELECT lang, source FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
), cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM base GROUP BY lang, source
), rl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS r FROM base GROUP BY lang),
cs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY source),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base)
SELECT lang, source, o,
       CAST(r * c AS DOUBLE) / n AS expected,
       ((o - CAST(r * c AS DOUBLE) / n) * (o - CAST(r * c AS DOUBLE) / n))
           / (CAST(r * c AS DOUBLE) / n) AS chi2_cell
FROM cells JOIN rl USING (lang) JOIN cs USING (source) CROSS JOIN tot
"""


def q_kwic_docs(sf_dir: str):
    """Keyword-in-context (concordance) extraction for the token
    'data': every occurrence position with its left/right neighbor
    tokens ('' at document edges). Vectorized explode + grouped shift —
    map-only, zero shuffle; the classic corpus-linguistics view of a
    term's usage."""
    term = "data"
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def kwic(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ")
        ex = toks.explode()
        grp = ex.groupby(level=0)
        pos = grp.cumcount()
        left = grp.shift(1)
        right = grp.shift(-1)
        m = (ex == term).to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].loc[ex.index].to_numpy()[m],
            "pos": pos.to_numpy(dtype=np.int64)[m],
            "left_tok": left.fillna("").to_numpy(dtype=object)[m],
            "right_tok": right.fillna("").to_numpy(dtype=object)[m],
        })

    return docs.map_batches(kwic, batch_format="pandas")


SQL_KWIC_DOCS = """
WITH tl AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS l FROM documents
), toks AS (
  SELECT doc_id, l, CAST(unnest(range(len(l))) AS BIGINT) AS pos,
         unnest(l) AS tok
  FROM tl
)
SELECT doc_id, pos,
       CASE WHEN pos > 0 THEN l[pos] ELSE '' END AS left_tok,
       COALESCE(l[pos + 2], '') AS right_tok
FROM toks WHERE tok = 'data'
"""


def q_clustering_coeff(sf_dir: str):
    """Local clustering coefficient per supplier node over the same
    co-order graph as ``triangle_suppliers``: coeff = 2·T(v) /
    (deg·(deg−1)) — one distinct-edge exchange feeds BOTH the degree
    combine and the wedge-closure triangle count, then a left join
    fills triangle-free nodes with 0. The coefficient is a single
    integer-ratio division (exact cross-engine)."""
    from ..functions.graph import triangle_counts
    from ..functions.relational import grouped_agg, hash_join
    from ..stages.partition import BUCKET_COL, bucket_exchange

    edges = bucket_exchange(
        _supplier_coedges(sf_dir), ["src", "dst"],
        lambda d: d.drop(columns=[BUCKET_COL], errors="ignore")
                   .drop_duplicates(["src", "dst"]),
        16,
    ).materialize()

    def symmetric(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["src"].to_numpy(np.int64),
                                    df["dst"].to_numpy(np.int64)]),
            "degree": np.int64(1),
        })

    deg = grouped_agg(
        edges.map_batches(symmetric, batch_format="pandas"),
        ["node"], {"degree": ("degree", "sum")}, num_buckets=16,
    )
    tri = triangle_counts(edges, num_buckets=16)
    joined = hash_join(deg, tri, on="node", how="left", num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["degree"] >= 2].copy()
        t = df["n_triangles"].fillna(0).astype("int64")
        d = df["degree"].astype("int64")
        df["n_triangles"] = t
        df["coeff"] = (2 * t).to_numpy(np.int64).astype(np.float64) / (
            d * (d - 1)).to_numpy(np.int64)
        return df[["node", "degree", "n_triangles", "coeff"]]

    return joined.map_batches(finish, batch_format="pandas")


SQL_CLUSTERING_COEFF = """
WITH sel AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1995-07-01'
), pairs AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
  JOIN sel ON a.l_orderkey = sel.o_orderkey
), tri AS (
  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.s1 = e1.s2
  JOIN pairs e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
), tc AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT s1 AS node FROM pairs UNION ALL SELECT s2 FROM pairs)
  GROUP BY node
)
SELECT d.node, d.degree, COALESCE(tc.n_triangles, 0) AS n_triangles,
       CAST(2 * COALESCE(tc.n_triangles, 0) AS DOUBLE)
           / (d.degree * (d.degree - 1)) AS coeff
FROM deg d LEFT JOIN tc ON d.node = tc.node
WHERE d.degree >= 2
"""


def q_ohlc_daily(sf_dir: str):
    """Time-series resampling to per-(user, day) OHLC bars: open/close
    are the first/last value in (ts, event_id) order, high/low the
    extremes, n the bar volume. One exchange keyed by user (days
    re-grouped INSIDE the kernel — never trust small-domain bucket
    collisions); day is epoch-seconds//86400·86400 BIGINT, the one
    sub-second-safe cross-engine encoding."""
    from ..stages.partition import BUCKET_COL, bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def ohlc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        df = df[df["value"].notna()].copy()
        ts_s = (df["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
                // 1_000_000_000)
        df["day"] = (ts_s // 86400) * 86400
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        g = df.groupby(["user_id", "day"], sort=False)
        out = g.agg(
            open=("value", "first"), high=("value", "max"),
            low=("value", "min"), close=("value", "last"),
            n=("value", "size"),
        ).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    return bucket_exchange(ev, ["user_id"], ohlc, 16)


SQL_OHLC_DAILY = """
SELECT user_id,
       (CAST(epoch_us(ts) AS BIGINT) // 1000000 // 86400) * 86400 AS day,
       first(value ORDER BY ts, event_id) AS open,
       MAX(value) AS high, MIN(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY user_id, day
"""


def q_snapshot_recall_pages(sf_dir: str):
    """Crawl text-evolution measurement: per url, the word-BIGRAM
    recall of each snapshot against its previous snapshot (how much of
    the old page survives) — distinct-bigram intersection over the
    previous snapshot's distinct bigrams. One sorted bucket pass
    (url-partitioned, (warc_ts, text) order like page_changes); only
    rows WITH a predecessor emit."""
    from ..stages.partition import apply_sorted

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "text"],
                            override_num_blocks=16)

    def grams(t) -> frozenset:
        # SQL-faithful: string_split('') is [''] so a short/empty text
        # yields the ONE joined gram (never an empty set — the recall
        # denominator stays nonzero, matching len(pg) ≥ 1 in the twin)
        toks = (t if isinstance(t, str) else "").split(" ")
        if len(toks) < 2:
            return frozenset([" ".join(toks)])
        return frozenset(f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        prev = df.groupby("url", sort=False)["text"].shift(1)
        has_prev = df.groupby("url", sort=False).cumcount() > 0
        recalls = np.full(len(df), np.nan)
        cur_np = df["text"].to_numpy(dtype=object)
        prev_np = prev.to_numpy(dtype=object)
        idx = np.flatnonzero(has_prev.to_numpy())
        for i in idx:
            p = grams(prev_np[i])
            c = grams(cur_np[i])
            recalls[i] = round_half_away(len(p & c) / len(p), 6)
        out = df.loc[has_prev, ["url", "warc_ts"]].copy()
        out["recall"] = recalls[idx]
        return out

    return apply_sorted(ds, ["url"], "warc_ts", fn, num_buckets=16,
                        tiebreak=["text"])


SQL_SNAPSHOT_RECALL = f"""
WITH snaps AS (
  SELECT url, warc_ts,
         string_split(COALESCE(text, ''), ' ') AS w,
         LAG(string_split(COALESCE(text, ''), ' ')) OVER win AS pw
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WINDOW win AS (PARTITION BY url ORDER BY warc_ts, text ASC NULLS LAST)
), grams AS (
  SELECT url, warc_ts,
         CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1]))
         END AS cg,
         CASE WHEN len(pw) < 2 THEN [array_to_string(pw, ' ')]
              ELSE list_distinct(list_transform(range(1, len(pw)),
                                 i -> pw[i] || ' ' || pw[i+1]))
         END AS pg
  FROM snaps WHERE pw IS NOT NULL
)
SELECT url, warc_ts,
       ROUND(CAST(len(list_intersect(pg, cg)) AS DOUBLE) / len(pg), 6)
           AS recall
FROM grams
"""


def q_two_hop_suppliers(sf_dir: str):
    """Friends-of-friends: distinct 2-hop neighbor count per supplier on
    the co-order graph — wedge candidates anti-joined against the edge
    set in one co-bucketed pass (see
    :func:`transmog_ray.functions.graph.two_hop_counts`)."""
    from ..functions.graph import two_hop_counts

    out = two_hop_counts(_supplier_coedges(sf_dir), num_buckets=16)
    out = out.materialize()
    if out.count() == 0:
        # tiny scale factors make the co-order graph a clique union with
        # NO 2-hop pairs; a zero-row Dataset loses its columns through
        # to_pandas, so return the typed empty frame ourselves
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "n_two_hop": pd.Series(dtype="int64")})
    return out


SQL_TWO_HOP_SUPPLIERS = """
WITH sel AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1995-07-01'
), pairs AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
  JOIN sel ON a.l_orderkey = sel.o_orderkey
), sym AS (
  SELECT s1 AS node, s2 AS nbr FROM pairs
  UNION ALL SELECT s2, s1 FROM pairs
), two AS (
  SELECT DISTINCT x.nbr AS a, y.nbr AS b
  FROM sym x JOIN sym y ON x.node = y.node AND x.nbr < y.nbr
), nond AS (
  SELECT a, b FROM two EXCEPT SELECT s1, s2 FROM pairs
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_two_hop
FROM (SELECT a AS node FROM nond UNION ALL SELECT b FROM nond)
GROUP BY node
"""


def q_golden_page_record(sf_dir: str):
    """Golden-record survivorship (MDM-style) per url from crawl
    snapshots: the LATEST NON-NULL text and lang (independently —
    different snapshots may each contribute a field), the latest
    warc_ts, and the snapshot count. One url-keyed exchange; inside the
    kernel a vectorized sorted forward-fill makes the last row per url
    carry every survivor."""
    from ..stages.partition import BUCKET_COL, bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir,
                            columns=["url", "warc_ts", "text", "lang"],
                            override_num_blocks=16)

    def golden(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        df = df.sort_values(["url", "warc_ts", "text"], kind="mergesort",
                            na_position="last")
        g = df.groupby("url", sort=False)
        df = df.assign(
            golden_text=g["text"].ffill(),
            golden_lang=g["lang"].ffill(),
            n_snapshots=g.cumcount() + 1,
        )
        out = df.groupby("url", sort=False).tail(1)
        out = out.rename(columns={"warc_ts": "last_ts"})
        out["n_snapshots"] = out["n_snapshots"].astype("int64")
        return out[["url", "last_ts", "golden_text", "golden_lang",
                    "n_snapshots"]]

    return bucket_exchange(ds, ["url"], golden, 16)


SQL_GOLDEN_PAGE_RECORD = f"""
SELECT url,
       MAX(warc_ts) AS last_ts,
       last(text ORDER BY warc_ts, text ASC NULLS LAST)
           FILTER (WHERE text IS NOT NULL) AS golden_text,
       last(lang ORDER BY warc_ts, text ASC NULLS LAST)
           FILTER (WHERE lang IS NOT NULL) AS golden_lang,
       CAST(COUNT(*) AS BIGINT) AS n_snapshots
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
GROUP BY url
"""


def q_tag_pairs_pages(sf_dir: str):
    """Tag co-occurrence mining over the crawl metadata: distinct
    unordered tag pairs per page row, counted corpus-wide (the folksonomy
    / related-tags primitive). JSON parse + pair explode are map-side;
    only (t1, t2, partial count) rows shuffle into one tag-pair-domain
    combine."""
    import json as _json

    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["meta"],
                            override_num_blocks=16)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for m in df["meta"]:
            if not isinstance(m, str):
                continue
            tags = sorted(set(_json.loads(m).get("tags", [])))
            for i in range(len(tags)):
                for j in range(i + 1, len(tags)):
                    out_a.append(tags[i])
                    out_b.append(tags[j])
        part = pd.DataFrame({"t1": pd.Series(out_a, dtype=object),
                             "t2": pd.Series(out_b, dtype=object)})
        part["n"] = np.int64(1)
        return part.groupby(["t1", "t2"], as_index=False)["n"].sum()

    return grouped_agg(
        ds.map_batches(pairs, batch_format="pandas"),
        ["t1", "t2"], {"n": ("n", "sum")}, num_buckets=8,
    )


SQL_TAG_PAIRS_PAGES = f"""
WITH t AS (
  SELECT list_distinct(CAST(json_extract(meta, '$.tags') AS VARCHAR[]))
             AS tags
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
)
SELECT u1.t1, u2.t2, CAST(COUNT(*) AS BIGINT) AS n
FROM t, UNNEST(tags) AS u1(t1), UNNEST(tags) AS u2(t2)
WHERE u1.t1 < u2.t2
GROUP BY u1.t1, u2.t2
"""


def q_vocab_growth_docs(sf_dir: str):
    """Heaps-law vocabulary growth curve over word BIGRAMS (the unigram
    vocabulary saturates within a few fixture docs): after each document
    (in doc_id order), how many DISTINCT bigrams the corpus has seen —
    the tokenizer-planning statistic. Each bigram is attributed to its
    FIRST document (one vocab-domain min exchange), new-vocab counts
    combine per doc, and the distributed ordered scan turns them into
    the cumulative curve (rows emitted only where the vocabulary
    grows)."""
    from ..functions.relational import grouped_agg, ordered_scan

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for d, t in zip(df["doc_id"], df["text"]):
            w = (t if isinstance(t, str) else "").split(" ")
            for i in range(len(w) - 1):
                ids.append(d)
                toks.append(f"{w[i]} {w[i+1]}")
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "tok": pd.Series(toks, dtype=object),
        }).drop_duplicates()

    first = grouped_agg(
        docs.map_batches(pairs, batch_format="pandas"),
        ["tok"], {"doc_id": ("doc_id", "min")}, num_buckets=16,
    )
    per_doc = grouped_agg(
        first.map_batches(
            lambda d: d.assign(n_new=np.int64(1))[["doc_id", "n_new"]],
            batch_format="pandas",
        ),
        ["doc_id"], {"n_new": ("n_new", "sum")}, num_buckets=8,
    )
    return ordered_scan(per_doc, "doc_id", "n_new", out_col="vocab_size",
                        num_buckets=8)


SQL_VOCAB_GROWTH_DOCS = """
WITH tl AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), pairs AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w)),
                  i -> w[i] || ' ' || w[i+1])) AS tok
    FROM tl)
), f AS (
  SELECT tok, MIN(doc_id) AS doc_id FROM pairs GROUP BY tok
), c AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new FROM f GROUP BY doc_id
)
SELECT doc_id, n_new,
       CAST(SUM(n_new) OVER (ORDER BY doc_id) AS BIGINT) AS vocab_size
FROM c
"""


def q_hapax_docs(sf_dir: str):
    """Hapax legomena per source over word BIGRAMS (the unigram
    vocabulary of the fixture is saturated — every word repeats):
    corpus-frequency-1 bigrams attributed to the one source that
    produced them, beside the source's total bigram occurrences and the
    hapax rate (single exact division). Bigram counts + a min-source tag
    combine in ONE exchange (a hapax's min source IS its source); the
    per-source finish is category-bounded."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def occ(df: pd.DataFrame) -> pd.DataFrame:
        toks, srcs = [], []
        for s, t in zip(df["source"], df["text"]):
            w = (t if isinstance(t, str) else "").split(" ")
            for i in range(len(w) - 1):
                toks.append(f"{w[i]} {w[i+1]}")
                srcs.append(s)
        return pd.DataFrame({
            "tok": pd.Series(toks, dtype=object),
            "source": pd.Series(srcs, dtype=object),
            "n": np.int64(1),
        })

    occ_ds = docs.map_batches(occ, batch_format="pandas").materialize()
    tok_counts = grouped_agg(
        occ_ds, ["tok"], {"n": ("n", "sum"), "src": ("source", "min")},
        num_buckets=16,
    )
    hapax = grouped_agg(
        tok_counts.map_batches(
            lambda d: d[d["n"] == 1].assign(n_hapax=np.int64(1))[
                ["src", "n_hapax"]].rename(columns={"src": "source"}),
            batch_format="pandas",
        ),
        ["source"], {"n_hapax": ("n_hapax", "sum")}, num_buckets=4,
    ).to_pandas()
    if "source" not in hapax.columns:  # zero hapax: columns lost
        hapax = pd.DataFrame({"source": pd.Series(dtype=object),
                              "n_hapax": pd.Series(dtype="int64")})
    totals = grouped_agg(
        occ_ds, ["source"], {"n_occ": ("n", "sum")}, num_buckets=4,
    ).to_pandas()
    out = totals.merge(hapax, on="source", how="left")
    out["n_hapax"] = out["n_hapax"].fillna(0).astype("int64")
    out["hapax_rate"] = out["n_hapax"].to_numpy(np.int64).astype(
        np.float64) / out["n_occ"].to_numpy(np.int64)
    return out[["source", "n_occ", "n_hapax", "hapax_rate"]]


SQL_HAPAX_DOCS = """
WITH tl AS (
  SELECT source, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), occ AS (
  SELECT source,
         unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS tok
  FROM tl
), tc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n, MIN(source) AS src
  FROM occ GROUP BY tok
), hx AS (
  SELECT src AS source, CAST(COUNT(*) AS BIGINT) AS n_hapax
  FROM tc WHERE n = 1 GROUP BY src
), tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_occ FROM occ GROUP BY source
)
SELECT tot.source, tot.n_occ, COALESCE(hx.n_hapax, 0) AS n_hapax,
       CAST(COALESCE(hx.n_hapax, 0) AS DOUBLE) / tot.n_occ AS hapax_rate
FROM tot LEFT JOIN hx ON tot.source = hx.source
"""


def q_ks_drift_events(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov statistic between the 'purchase'
    and 'click' value distributions — the exact drift test an ML data
    pipeline gates retraining on. Per-value group counts combine in one
    exchange, the distributed ordered scan produces BOTH running CDFs
    (two chained range passes, no global sort), and the max |ΔCDF| row
    is a k=1 top-k. All float ops are single divisions/subtractions —
    cross-engine exact."""
    from ..functions.relational import grouped_agg, ordered_scan, topk

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    ev = ev.map_batches(
        lambda df: df[df["event_type"].isin(["purchase", "click"])
                      & df["value"].notna()],
        batch_format="pandas",
    )

    def per_value(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "value": df["value"].to_numpy(),
            "na": (df["event_type"] == "purchase").to_numpy(np.int64),
            "nb": (df["event_type"] == "click").to_numpy(np.int64),
        })

    f = grouped_agg(
        ev.map_batches(per_value, batch_format="pandas"),
        ["value"], {"na": ("na", "sum"), "nb": ("nb", "sum")},
        num_buckets=8,
    ).materialize()
    tots = f.map_batches(
        lambda d: pd.DataFrame({"ta": [d["na"].sum()], "tb": [d["nb"].sum()]}),
        batch_format="pandas",
    ).to_pandas()
    ta = np.int64(tots["ta"].sum())
    tb = np.int64(tots["tb"].sum())
    scanned = ordered_scan(f, "value", "na", out_col="ca", num_buckets=8)
    scanned = ordered_scan(scanned, "value", "nb", out_col="cb",
                           num_buckets=8)

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        d = np.abs(
            df["ca"].to_numpy(np.int64).astype(np.float64) / np.float64(ta)
            - df["cb"].to_numpy(np.int64).astype(np.float64) / np.float64(tb)
        )
        return pd.DataFrame({"at_value": df["value"].to_numpy(), "ks": d})

    return topk(scanned.map_batches(diff, batch_format="pandas"),
                ["ks", "at_value"], 1, descending=[True, False])


SQL_KS_DRIFT_EVENTS = """
WITH f AS (
  SELECT value,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS na,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS nb
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
  GROUP BY value
), c AS (
  SELECT value,
         CAST(SUM(na) OVER w AS BIGINT) AS ca,
         CAST(SUM(nb) OVER w AS BIGINT) AS cb
  FROM f WINDOW w AS (ORDER BY value)
), t AS (
  SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb FROM f
)
SELECT value AS at_value,
       ABS(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb) AS ks
FROM c CROSS JOIN t
ORDER BY ks DESC, value LIMIT 1
"""


def q_benford_orders(sf_dir: str):
    """Benford's-law audit: leading-digit histogram of FLOOR(
    o_totalprice) — fraud/data-quality screening. The digit comes from
    the INTEGER part's decimal string (int→string is identical across
    engines; float formatting is not). Map-side digit extraction, one
    9-row combine."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def digit(df: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(df["o_totalprice"].to_numpy(np.float64)).astype(np.int64)
        lead = np.array([int(str(x)[0]) for x in v], dtype=np.int64)
        return pd.DataFrame({"digit": lead, "n": np.int64(1)})

    return grouped_agg(
        orders.map_batches(digit, batch_format="pandas"),
        ["digit"], {"n": ("n", "sum")}, num_buckets=4,
    )


SQL_BENFORD_ORDERS = """
SELECT CAST(LEFT(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1)
            AS BIGINT) AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY digit
"""


def q_bigram_lm_docs(sf_dir: str):
    """Bigram language-model table: P(w2 | w1) as exact conditional
    counts over the corpus (n_pair / n_ctx — ONE division, cross-engine
    exact), pruned to pairs seen ≥ 5 times. Pair counts combine in one
    pair-domain exchange; context counts derive from the PAIR counts
    (Σ over w2 — no second corpus pass) and re-attach by a distributed
    hash join on w1. The n-gram-LM / next-token-statistics primitive."""
    from ..functions.relational import grouped_agg, hash_join

    docs = read_table(sf_dir, "documents", columns=["text"])

    def bigrams(df: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for t in df["text"]:
            w = (t if isinstance(t, str) else "").split(" ")
            for i in range(len(w) - 1):
                a.append(w[i])
                b.append(w[i + 1])
        part = pd.DataFrame({"w1": pd.Series(a, dtype=object),
                             "w2": pd.Series(b, dtype=object)})
        part["n_pair"] = np.int64(1)
        return part.groupby(["w1", "w2"], as_index=False)["n_pair"].sum()

    pc = grouped_agg(
        docs.map_batches(bigrams, batch_format="pandas"),
        ["w1", "w2"], {"n_pair": ("n_pair", "sum")}, num_buckets=16,
    ).materialize()
    cc = grouped_agg(
        pc.map_batches(lambda d: d.rename(columns={"n_pair": "n_ctx"})[
            ["w1", "n_ctx"]], batch_format="pandas"),
        ["w1"], {"n_ctx": ("n_ctx", "sum")}, num_buckets=8,
    )
    joined = hash_join(pc, cc, on="w1", num_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_pair"] >= 5].copy()
        df["p"] = df["n_pair"].to_numpy(np.int64).astype(np.float64) / df[
            "n_ctx"].to_numpy(np.int64)
        return df[["w1", "w2", "n_pair", "n_ctx", "p"]]

    return joined.map_batches(finish, batch_format="pandas")


SQL_BIGRAM_LM_DOCS = """
WITH tl AS (
  SELECT string_split(COALESCE(text, ''), ' ') AS w FROM documents
), bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM tl, unnest(range(1, len(w))) t(i)
), pc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM bg GROUP BY w1, w2
), cc AS (
  SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_ctx FROM pc GROUP BY w1
)
SELECT pc.w1, pc.w2, n_pair, n_ctx,
       CAST(n_pair AS DOUBLE) / n_ctx AS p
FROM pc JOIN cc USING (w1) WHERE n_pair >= 5
"""


def q_kappa_docs(sf_dir: str):
    """Cohen's kappa between two deterministic binary labelers (doc
    char-length ≥ 300 vs token-count ≥ 50) — the inter-annotator
    agreement statistic of labeling pipelines. The 2×2 agreement cells
    combine distributed; po, pe and kappa are INTEGER-ratio expressions
    evaluated in one fixed op order each (exact cross-engine):
    po = (n11+n00)/n, pe = (ra1·rb1 + ra0·rb0)/(n·n),
    kappa = (po − pe)/(1 − pe)."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text", "n_chars"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        a = (df["n_chars"].fillna(0) >= 300).to_numpy()
        ntok = df["text"].fillna("").str.split(" ").str.len().to_numpy()
        b = ntok >= 50
        return pd.DataFrame({
            "a": a.astype(np.int64), "b": b.astype(np.int64),
            "n": np.int64(1),
        })

    g = grouped_agg(
        docs.map_batches(cells, batch_format="pandas"),
        ["a", "b"], {"n": ("n", "sum")}, num_buckets=4,
    ).to_pandas()
    get = lambda ai, bi: np.int64(  # noqa: E731
        g.loc[(g["a"] == ai) & (g["b"] == bi), "n"].sum())
    n11, n10, n01, n00 = get(1, 1), get(1, 0), get(0, 1), get(0, 0)
    n = n11 + n10 + n01 + n00
    po = np.float64(n11 + n00) / np.float64(n)
    pe = np.float64((n11 + n10) * (n11 + n01)
                    + (n01 + n00) * (n10 + n00)) / np.float64(n * n)
    kappa = (po - pe) / (np.float64(1.0) - pe)
    return pd.DataFrame({
        "n11": [n11], "n10": [n10], "n01": [n01], "n00": [n00],
        "po": [po], "pe": [pe], "kappa": [kappa],
    })


SQL_KAPPA_DOCS = """
WITH lab AS (
  SELECT CASE WHEN COALESCE(n_chars, 0) >= 300 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(string_split(COALESCE(text, ''), ' ')) >= 50
              THEN 1 ELSE 0 END AS b
  FROM documents
), c AS (
  SELECT CAST(SUM(CASE WHEN a=1 AND b=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(SUM(CASE WHEN a=1 AND b=0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN a=0 AND b=1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN a=0 AND b=0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lab
), k AS (
  SELECT n11, n10, n01, n00,
         CAST(n11 + n00 AS DOUBLE) / n AS po,
         CAST((n11 + n10) * (n11 + n01)
              + (n01 + n00) * (n10 + n00) AS DOUBLE) / (n * n) AS pe
  FROM c
)
SELECT n11, n10, n01, n00, po, pe, (po - pe) / (1.0 - pe) AS kappa FROM k
"""


def q_ab_test_events(sf_dir: str):
    """Two-proportion z-test for an A/B split (user_id parity arms,
    conversion = user has ≥ 1 purchase with value ≥ 120 — every user has
    SOME purchase in this fixture, so an unthresholded conversion
    degenerates to pp=1 and z=0/0): per-arm user and
    converter counts combine distributed; p1, p2, the pooled rate and z
    are fixed-op-order float expressions over exact integers — and sqrt
    is IEEE-correctly-rounded on both engines (unlike pow/ln), so the
    whole statistic hash-matches SQL."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "conv": ((df["event_type"] == "purchase")
                     & (df["value"].fillna(0) >= 120)).to_numpy(np.int64),
        })

    users = grouped_agg(
        ev.map_batches(per_user, batch_format="pandas"),
        ["user_id"], {"conv": ("conv", "max")}, num_buckets=8,
    )
    arms = grouped_agg(
        users.map_batches(
            lambda d: pd.DataFrame({
                "arm": (d["user_id"].to_numpy(np.int64) % 2),
                "n": np.int64(1),
                "c": d["conv"].to_numpy(np.int64),
            }),
            batch_format="pandas",
        ),
        ["arm"], {"n": ("n", "sum"), "c": ("c", "sum")}, num_buckets=2,
    ).to_pandas().set_index("arm")
    n1, c1 = np.int64(arms.loc[0, "n"]), np.int64(arms.loc[0, "c"])
    n2, c2 = np.int64(arms.loc[1, "n"]), np.int64(arms.loc[1, "c"])
    p1 = np.float64(c1) / np.float64(n1)
    p2 = np.float64(c2) / np.float64(n2)
    pp = np.float64(c1 + c2) / np.float64(n1 + n2)
    se = np.sqrt(pp * (np.float64(1.0) - pp)
                 * (np.float64(1.0) / n1 + np.float64(1.0) / n2))
    z = (p1 - p2) / se
    return pd.DataFrame({
        "n1": [n1], "c1": [c1], "n2": [n2], "c2": [c2],
        "p1": [p1], "p2": [p2], "z": [z],
    })


SQL_AB_TEST_EVENTS = """
WITH u AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'purchase'
                        AND COALESCE(value, 0) >= 120
                       THEN 1 ELSE 0 END) AS BIGINT) AS conv
  FROM events GROUP BY user_id
), arms AS (
  SELECT user_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS c
  FROM u GROUP BY arm
), w AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n1,
         MAX(CASE WHEN arm = 0 THEN c END) AS c1,
         MAX(CASE WHEN arm = 1 THEN n END) AS n2,
         MAX(CASE WHEN arm = 1 THEN c END) AS c2
  FROM arms
), s AS (
  SELECT n1, c1, n2, c2,
         CAST(c1 AS DOUBLE) / n1 AS p1,
         CAST(c2 AS DOUBLE) / n2 AS p2,
         CAST(c1 + c2 AS DOUBLE) / (n1 + n2) AS pp
  FROM w
)
SELECT n1, c1, n2, c2, p1, p2,
       (p1 - p2) / sqrt(pp * (1.0 - pp)
                        * (1.0 / n1 + 1.0 / n2)) AS z
FROM s
"""


def q_coverage_docs(sf_dir: str):
    """Greedy maximum-coverage selection of 3 documents by distinct
    word-bigram coverage — the submodular corpus-curation primitive
    ((1−1/e)-greedy). Three distributed rounds: broadcast covered set,
    count uncovered grams per doc in one combine, top-1 winner; only
    the winner's grams return to the driver. Oracle: the same greedy
    unrolled as a 3-step CTE chain."""
    from ..functions.text import greedy_max_coverage

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return greedy_max_coverage(docs, k=3, n=2)


SQL_COVERAGE_DOCS = """
WITH tl AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), pairs AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                     ELSE list_transform(range(1, len(w)),
                          i -> w[i] || ' ' || w[i+1]) END) AS g
  FROM tl
), w1 AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
  FROM pairs GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1
), c1 AS (
  SELECT DISTINCT g FROM pairs JOIN w1 USING (doc_id)
), p2 AS (
  SELECT doc_id, g FROM pairs
  WHERE g NOT IN (SELECT g FROM c1)
    AND doc_id NOT IN (SELECT doc_id FROM w1)
), w2 AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
  FROM p2 GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1
), c2 AS (
  SELECT g FROM c1
  UNION SELECT g FROM pairs JOIN w2 USING (doc_id)
), p3 AS (
  SELECT doc_id, g FROM pairs
  WHERE g NOT IN (SELECT g FROM c2)
    AND doc_id NOT IN (SELECT doc_id FROM w1
                       UNION SELECT doc_id FROM w2)
), w3 AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
  FROM p3 GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1
)
SELECT CAST(1 AS BIGINT) AS rank, doc_id, gain FROM w1
UNION ALL SELECT CAST(2 AS BIGINT), doc_id, gain FROM w2
UNION ALL SELECT CAST(3 AS BIGINT), doc_id, gain FROM w3
"""


def q_bfs_levels_suppliers(sf_dir: str):
    """BFS levels (shortest-path hop counts) from the minimum supplier
    node over the co-order graph, bounded at 3 hops — the seed-expansion
    traversal (taint/reachability analysis). Per round the frontier set
    broadcasts and the distributed symmetric edge table is filtered
    map-side; only newly reached nodes return to the driver (node-domain
    bounded, the same driver-holds-label-map contract as pagerank /
    grid clustering). Oracle: recursive CTE with MIN(lvl)."""
    import ray

    from ..stages.partition import BUCKET_COL, bucket_exchange

    edges = bucket_exchange(
        _supplier_coedges(sf_dir), ["src", "dst"],
        lambda d: d.drop(columns=[BUCKET_COL], errors="ignore")
                   .drop_duplicates(["src", "dst"]),
        16,
    )

    def symmetric(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["src"].to_numpy(np.int64),
                                    df["dst"].to_numpy(np.int64)]),
            "nbr": np.concatenate([df["dst"].to_numpy(np.int64),
                                   df["src"].to_numpy(np.int64)]),
        })

    sym = edges.map_batches(symmetric, batch_format="pandas").materialize()
    seed = int(sym.min("node"))
    levels = {seed: 0}
    frontier = {seed}
    for lvl in (1, 2, 3):
        f_ref = ray.put(frontier)

        def expand(df: pd.DataFrame, _f=f_ref) -> pd.DataFrame:
            f = ray.get(_f)
            return df.loc[df["node"].isin(f), ["nbr"]].drop_duplicates()

        reached = sym.map_batches(expand, batch_format="pandas").to_pandas()
        new = set(reached["nbr"].astype("int64")) - set(levels)
        if not new:
            break
        levels.update({n: lvl for n in new})
        frontier = new
    out = pd.DataFrame(sorted(levels.items()), columns=["node", "lvl"])
    return out.astype({"node": "int64", "lvl": "int64"})


SQL_BFS_LEVELS = """
WITH RECURSIVE sel AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1995-07-01'
), pairs AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
  JOIN sel ON a.l_orderkey = sel.o_orderkey
), sym AS (
  SELECT s1 AS node, s2 AS nbr FROM pairs
  UNION ALL SELECT s2, s1 FROM pairs
), seed AS (
  SELECT MIN(node) AS s FROM sym
), reach(node, lvl) AS (
  SELECT s, 0 FROM seed
  UNION
  SELECT sym.nbr, reach.lvl + 1
  FROM reach JOIN sym ON sym.node = reach.node
  WHERE reach.lvl < 3
)
SELECT node, CAST(MIN(lvl) AS BIGINT) AS lvl FROM reach GROUP BY node
"""


def q_overdue_pages(sf_dir: str):
    """Crawl-scheduler priority queue: top-20 most OVERDUE urls — time
    since last snapshot measured in units of the url's own mean
    inter-snapshot gap. The telescoping trick makes it one combine:
    Σgaps = t_max − t_min, so score = (horizon − t_max)·(n−1) /
    (t_max − t_min) needs only per-url min/max/count (exact integers,
    ONE float division). Urls with all-tied snapshots (zero gap span)
    are excluded on both sides."""
    from ..functions.relational import grouped_agg, topk

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts"],
                            override_num_blocks=16)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["warc_ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        return pd.DataFrame({"url": df["url"].to_numpy(dtype=object),
                             "t": t_us, "n": np.int64(1)})

    prepped = ds.map_batches(prep, batch_format="pandas").materialize()
    stats = grouped_agg(
        prepped, ["url"],
        {"n": ("n", "sum"), "tmax": ("t", "max"), "tmin": ("t", "min")},
        num_buckets=16,
    )
    horizon = np.int64(prepped.max("t"))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["n"] >= 2) & (df["tmax"] > df["tmin"])].copy()
        num = (horizon - df["tmax"].to_numpy(np.int64)) * (
            df["n"].to_numpy(np.int64) - 1)
        df["overdue_score"] = num.astype(np.float64) / (
            df["tmax"].to_numpy(np.int64) - df["tmin"].to_numpy(np.int64))
        df = df.rename(columns={"tmax": "last_ts_us"})
        return df[["url", "n", "last_ts_us", "overdue_score"]]

    return topk(stats.map_batches(score, batch_format="pandas"),
                ["overdue_score", "url"], 20, descending=[True, False])


SQL_OVERDUE_PAGES = f"""
WITH s AS (
  SELECT url, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(epoch_us(MAX(warc_ts)) AS BIGINT) AS tmax,
         CAST(epoch_us(MIN(warc_ts)) AS BIGINT) AS tmin
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  GROUP BY url
), h AS (
  SELECT CAST(epoch_us(MAX(warc_ts)) AS BIGINT) AS hz
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
)
SELECT url, n, tmax AS last_ts_us,
       CAST((hz - tmax) * (n - 1) AS DOUBLE) / (tmax - tmin)
           AS overdue_score
FROM s CROSS JOIN h
WHERE n >= 2 AND tmax > tmin
ORDER BY overdue_score DESC, url LIMIT 20
"""


def q_shard_moves(sf_dir: str):
    """Consistent-hashing rebalance accounting: distinct urls assigned
    to 8 vs 9 modulo-hash shards, movement matrix (old_shard, new_shard,
    n) — the data-migration costing of a shard-count change (and a
    demonstration of WHY mod-hashing rebalances badly: ~8/9 of keys
    move). One url-dedup exchange, then a tiny shard-pair combine; md5
    prefix hashing replays exactly in SQL."""
    import hashlib

    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)
    urls = grouped_agg(
        ds.map_batches(lambda d: d.drop_duplicates().assign(n=np.int64(1)),
                       batch_format="pandas"),
        ["url"], {"n": ("n", "sum")}, num_buckets=8,
    )

    def shards(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:8], 16)
             for u in df["url"]),
            dtype=np.int64, count=len(df),
        )
        return pd.DataFrame({"old_shard": h % 8, "new_shard": h % 9,
                             "n": np.int64(1)})

    return grouped_agg(
        urls.map_batches(shards, batch_format="pandas"),
        ["old_shard", "new_shard"], {"n": ("n", "sum")}, num_buckets=4,
    )


SQL_SHARD_MOVES = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), s AS (
  SELECT CAST(CONCAT('0x', substring(md5(url), 1, 8)) AS BIGINT) AS h
  FROM u
)
SELECT h % 8 AS old_shard, h % 9 AS new_shard,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s GROUP BY old_shard, new_shard
"""


def q_dwell_by_type(sf_dir: str):
    """Per-event dwell time (gap to the user's NEXT event, the
    engagement-duration proxy) aggregated per event type — exact µs
    BIGINT sums so the hash compare never sees float accumulation.
    One user exchange computes every LEAD; per-bucket partials
    (≤ |types| rows each) combine in a tiny second exchange."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        df = df.assign(t_us=t_us)
        nxt = df.groupby("user_id", sort=False)["t_us"].shift(-1)
        dwell = nxt.to_numpy() - t_us
        keep = ~np.isnan(nxt.to_numpy())
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy()[keep],
                            "dwell_us": dwell[keep].astype(np.int64)})
        agg = (out.groupby("event_type", sort=False)["dwell_us"]
               .agg(n_dwells="size", total_dwell_us="sum").reset_index())
        agg["n_dwells"] = agg["n_dwells"].astype("int64")
        agg["total_dwell_us"] = agg["total_dwell_us"].astype("int64")
        return agg

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("event_type", sort=False)
                .agg(n_dwells=("n_dwells", "sum"),
                     total_dwell_us=("total_dwell_us", "sum"))
                .astype("int64").reset_index())

    return bucket_exchange(partials, ["event_type"], combine, num_buckets=2)


SQL_DWELL_BY_TYPE = """
WITH t AS (
  SELECT event_type,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS dwell_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_dwells,
       CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us
FROM t WHERE dwell_us IS NOT NULL
GROUP BY event_type
"""


def q_decayed_user_activity(sf_dir: str):
    """Exponentially time-decayed activity score per user (half-life =
    1 day on day buckets, anchored at the user's own last active day)
    — the recency-weighted engagement feature — made SQL-EXACT by
    dyadic arithmetic: each event contributes 2^(40−k) integer UNITS
    of 2⁻⁴⁰ (k = days before the anchor, k > 40 contributes 0), so the
    sum is an exact BIGINT on both engines; no pow(), no float
    accumulation. One user exchange; vectorized shifts."""
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        df = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                           "day": t_us // DAY_US})
        last = df.groupby("user_id", sort=False)["day"].transform("max")
        k = (last - df["day"]).to_numpy(np.int64)
        units = np.where(k <= 40,
                         np.left_shift(np.int64(1),
                                       np.maximum(40 - k, 0)),
                         np.int64(0))
        df = df.assign(units=units, n=np.int64(1))
        return (df.groupby("user_id", sort=False)
                .agg(n_events=("n", "sum"),
                     decayed_units=("units", "sum"))
                .astype("int64").reset_index())

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_DECAYED_ACTIVITY = """
WITH t AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), m AS (
  SELECT user_id, MAX(day) AS last_day FROM t GROUP BY user_id
)
SELECT t.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN m.last_day - t.day <= 40
                THEN CAST(1 AS BIGINT)
                       << CAST(40 - (m.last_day - t.day) AS INTEGER)
                ELSE 0 END) AS BIGINT) AS decayed_units
FROM t JOIN m USING (user_id)
GROUP BY t.user_id
"""


def q_crawl_schedule(sf_dir: str):
    """Politeness-aware crawl schedule: distinct urls get a per-domain
    rank, then a GLOBAL round-robin slot (all domains' rank-1 urls
    first, then rank-2, ...) so no domain is hammered consecutively —
    the frontier-scheduling move. No global sort: the distinct domain
    list is tiny (broadcast as dense ids) and the slot comes from the
    distributed ordered scan over the collision-free composite key
    rank·2³² + domain_id ≡ ORDER BY rank_in_domain, domain."""
    from ..functions.relational import ordered_scan
    from ..stages.dedup import dedup_exact
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)
    urls = dedup_exact(ds, ["url"], num_buckets=16)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.split("//", n=1).str[1]
        return df.assign(domain=rest.str.split("/", n=1).str[0])

    tagged = urls.map_batches(tag, batch_format="pandas")

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["domain", "url"], kind="mergesort")
        df = df.assign(rank_in_domain=(
            df.groupby("domain", sort=False).cumcount() + 1).astype("int64"))
        return df

    ranked = bucket_exchange(tagged, ["domain"], rank,
                             num_buckets=16).materialize()

    doms = (ranked.map_batches(
        lambda df: df[["domain"]].drop_duplicates(),
        batch_format="pandas").to_pandas()["domain"].unique())
    dom_idx = {d: np.int64(i) for i, d in enumerate(sorted(doms))}

    def key(df: pd.DataFrame) -> pd.DataFrame:
        idx = df["domain"].map(dom_idx).to_numpy(np.int64)
        k = df["rank_in_domain"].to_numpy(np.int64) * (1 << 32) + idx
        return df.assign(k=k, one=np.int64(1))

    scanned = ordered_scan(ranked.map_batches(key, batch_format="pandas"),
                           "k", "one", out_col="slot", num_buckets=8)
    return scanned.map_batches(
        lambda df: df[["url", "domain", "rank_in_domain", "slot"]],
        batch_format="pandas")


SQL_CRAWL_SCHEDULE = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), d AS (
  SELECT url, split_part(split_part(url, '//', 2), '/', 1) AS domain
  FROM u
), r AS (
  SELECT url, domain,
         CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY url)
              AS BIGINT) AS rank_in_domain
  FROM d
)
SELECT url, domain, rank_in_domain,
       CAST(ROW_NUMBER() OVER (ORDER BY rank_in_domain, domain)
            AS BIGINT) AS slot
FROM r
"""


def q_split_leakage_docs(sf_dir: str):
    """Cross-split contamination report — the eval-integrity check every
    training pipeline needs: after a deterministic hash split
    (train 80 / val 20 on knuth(doc_id+7)), find VAL docs whose 60-char
    text prefix also opens some TRAIN doc, with the offending train-doc
    count. One exchange co-buckets prefix groups; texts never shuffle
    (only the 60-char key + id travel)."""
    from ..functions.sampling import knuth_hash
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash(df["doc_id"].to_numpy(np.int64) + 7)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "prefix": df["text"].fillna("").str.slice(0, 60),
            "is_val": (h % np.uint64(10) >= 8),
        })

    def per_prefix(df: pd.DataFrame) -> pd.DataFrame:
        n_train = (df.groupby("prefix", sort=False)["is_val"]
                   .transform(lambda s: (~s).sum()))
        hit = df["is_val"] & (n_train > 0)
        out = pd.DataFrame({
            "doc_id": df.loc[hit, "doc_id"].to_numpy(np.int64),
            "n_train_dups": n_train[hit].to_numpy(np.int64),
        })
        if out.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_train_dups": pd.Series([], dtype="int64")})
        return out

    return bucket_exchange(docs.map_batches(prep, batch_format="pandas"),
                           ["prefix"], per_prefix, num_buckets=8)


SQL_SPLIT_LEAKAGE = """
WITH s AS (
  SELECT doc_id, substring(text, 1, 60) AS prefix,
         ((doc_id + 7) * 2654435761) % 4294967296 % 10 >= 8 AS is_val
  FROM documents
)
SELECT v.doc_id, CAST(COUNT(*) AS BIGINT) AS n_train_dups
FROM s v JOIN s t ON t.prefix = v.prefix AND NOT t.is_val
WHERE v.is_val
GROUP BY v.doc_id
"""


def q_vocab_ids(sf_dir: str):
    """Tokenizer-style VOCABULARY construction: every distinct term gets
    a dense global id under (count DESC, term ASC) order — with NO
    global sort. The count histogram (one tiny row per distinct count
    value) broadcasts as rank offsets; a count-keyed exchange then
    ranks terms within each count group locally. Equivalent to
    ROW_NUMBER() OVER (ORDER BY cnt DESC, term)."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["text"], num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].fillna("").str.split(" ").explode().value_counts()
        return pd.DataFrame({"term": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(np.int64)})

    counts = grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                         ["term"], {"cnt": ("cnt", "sum")},
                         num_buckets=8).materialize()

    # count histogram: ≤ |distinct cnt values| rows per block — tiny
    hist = (counts.map_batches(
        lambda df: df.groupby("cnt", sort=False).size()
        .rename("n_terms").reset_index(),
        batch_format="pandas").to_pandas()
        .groupby("cnt")["n_terms"].sum().sort_index(ascending=False))
    starts = hist.cumsum().shift(fill_value=0)  # terms with larger cnt
    offset = {int(c): int(v) for c, v in starts.items()}

    def rank_within(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cnt", "term"], ascending=[False, True],
                            kind="mergesort")
        base = df["cnt"].map(offset).to_numpy(np.int64)
        within = df.groupby("cnt", sort=False).cumcount().to_numpy(np.int64)
        df = df.assign(vocab_id=base + within + 1)
        df["cnt"] = df["cnt"].astype("int64")
        return df

    return bucket_exchange(counts, ["cnt"], rank_within, num_buckets=8)


SQL_VOCAB_IDS = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term)
SELECT term, cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS vocab_id
FROM c
"""


def q_sliding_distinct_types(sf_dir: str):
    """Trailing-window COUNT(DISTINCT) — the sliding-window novelty
    feature SQL window frames can't express (DISTINCT isn't allowed in
    a window aggregate). Per event: distinct event types in the user's
    last hour, RANGE semantics ((t−1h, t], ties share). Vectorized via
    the last-occurrence trick as TWO interval-stabbing passes: a type
    occurrence j covers query times [t_j, nxt_j) (in-window-present)
    minus [t_j+W, nxt_j) (stale part), so the answer is a difference of
    two difference-array prefix sums — no per-row loop, no per-query
    rescan. One user exchange; users vectorized together on a
    composite user-offset time axis."""
    from ..stages.partition import bucket_exchange

    W_US = np.int64(ROLL_WINDOW_S) * 1_000_000

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        t0 = t_us.min() if len(t_us) else np.int64(0)
        # per-user slot sized to the bucket's actual time span, so the
        # composite axis never overflows regardless of calendar range
        span = (t_us.max() - t0 if len(t_us) else np.int64(0)) + W_US + 2
        ucode = pd.factorize(df["user_id"].to_numpy(np.int64))[0]
        tt = ucode.astype(np.int64) * span + (t_us - t0)
        df = df.assign(_tt=tt)
        nxt = (df.groupby(["user_id", "event_type"], sort=False)["_tt"]
               .shift(-1).to_numpy())
        # open occurrences run to the next same-type event (or +inf,
        # clamped to the user's slot end so intervals never cross users)
        slot_end = (ucode.astype(np.int64) + 1) * span - 1
        nxt = np.where(np.isnan(nxt), slot_end, nxt).astype(np.int64)

        n = len(df)
        cover = np.zeros(n + 1, np.int64)
        lo1 = np.searchsorted(tt, tt, side="left")
        hi1 = np.searchsorted(tt, nxt, side="left")
        np.add.at(cover, lo1, 1)
        np.add.at(cover, hi1, -1)
        start2 = tt + W_US
        ok = start2 < nxt  # empty stale intervals drop out
        lo2 = np.searchsorted(tt, start2[ok], side="left")
        hi2 = np.searchsorted(tt, nxt[ok], side="left")
        np.add.at(cover, lo2, -1)
        np.add.at(cover, hi2, 1)
        n_types = np.cumsum(cover[:-1])
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "n_types": n_types.astype(np.int64),
        })

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_SLIDING_DISTINCT = """
SELECT e.event_id, e.user_id,
       CAST(COUNT(DISTINCT e2.event_type) AS BIGINT) AS n_types
FROM events e JOIN events e2
  ON e2.user_id = e.user_id
 AND e2.ts <= e.ts
 AND e2.ts > e.ts - INTERVAL 1 HOUR
GROUP BY e.event_id, e.user_id
"""


def q_ma_crossover_events(sf_dir: str):
    """Moving-average CROSSOVER detection (the trading-signal / trend-
    change primitive) per user over event values: fast ROWS-3 vs slow
    ROWS-10 trailing sums, a signal fires where the fast mean crosses
    strictly above the slow mean. SQL-exact: values enter as
    FLOOR(value·100) integer cents (events.value is NOT fixed-decimal)
    and means compare as cross-multiplied integers (f·10 vs s·3), so no
    float accumulation or division exists on either side. One user
    exchange; prefix-sum windows."""
    from ..stages.partition import bucket_exchange

    FAST, SLOW = 3, 10

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.floor(df["value"].to_numpy(np.float64) * 100).astype(
            np.int64)
        out = []
        for uid, idx in df.groupby("user_id", sort=False).indices.items():
            c = cents[idx]
            n = len(c)
            if n < SLOW + 1:
                continue
            ps = np.concatenate(([0], np.cumsum(c)))
            pos = np.arange(SLOW - 1, n)
            fast = ps[pos + 1] - ps[pos + 1 - FAST]
            slow = ps[pos + 1] - ps[pos + 1 - SLOW]
            diff = fast * SLOW - slow * FAST
            cross = (diff[1:] > 0) & (diff[:-1] <= 0)
            hit = pos[1:][cross]
            if len(hit):
                out.append(pd.DataFrame({
                    "user_id": np.int64(uid),
                    "event_id": df["event_id"].to_numpy(np.int64)[idx][hit],
                    "diff_x100": diff[1:][cross],
                }))
        if not out:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "event_id": pd.Series([], dtype="int64"),
                                 "diff_x100": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_MA_CROSSOVER = """
WITH w AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fast,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS slow
  FROM events
), d AS (
  SELECT user_id, event_id, rn,
         CAST(fast * 10 - slow * 3 AS BIGINT) AS diff_x100,
         LAG(CAST(fast * 10 - slow * 3 AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY rn) AS prev_diff
  FROM w WHERE rn >= 10
)
SELECT user_id, event_id, diff_x100
FROM d WHERE diff_x100 > 0 AND prev_diff <= 0
"""


def q_event_runs(sf_dir: str):
    """Gaps-and-islands RUN-LENGTH encoding: maximal runs of consecutive
    same-type events per user (the classic state-streak feature). One
    user exchange; the island id is the vectorized cumsum of
    type-change flags — no ROW_NUMBER subtraction dance needed
    engine-side, though the SQL oracle uses exactly that classic
    rn − rn_by_type trick."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        new_type = df["event_type"].ne(df["event_type"].shift())
        island = (new_user | new_type).cumsum()
        g = df.groupby(island, sort=False)
        out = pd.DataFrame({
            "user_id": g["user_id"].first().astype("int64"),
            "event_type": g["event_type"].first(),
            "run_len": g.size().astype("int64"),
            "start_event_id": g["event_id"].first().astype("int64"),
        }).reset_index(drop=True)
        return out

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_EVENT_RUNS = """
WITH t AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS run_len,
       CAST(arg_min(event_id, rn) AS BIGINT) AS start_event_id
FROM t
GROUP BY user_id, event_type, rn - rnt
"""


def q_trending_types(sf_dir: str):
    """Per-hour TRENDING event types: tumbling hourly windows, top-3
    types per window by count (ties broken by type) — the
    leaderboard-over-windows shape. Counts pre-aggregate per batch (one
    (window, type) partial per batch), combine in one exchange, then
    the distributed grouped top-k — raw events never re-shuffle."""
    from ..functions.relational import grouped_agg, grouped_topk

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        win = (t_us // 3_600_000_000) * 3600  # epoch-seconds window start
        out = (pd.DataFrame({"window_start": win,
                             "event_type": df["event_type"]})
               .groupby(["window_start", "event_type"], sort=False)
               .size().rename("cnt").reset_index())
        out["cnt"] = out["cnt"].astype("int64")
        return out

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["window_start", "event_type"],
                         {"cnt": ("cnt", "sum")}, num_buckets=8)
    return grouped_topk(counts, ["window_start"], "cnt", k=3,
                        descending=True, tiebreak=["event_type"],
                        num_buckets=8)


SQL_TRENDING_TYPES = """
WITH c AS (
  SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start,
         event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY window_start, event_type
)
SELECT window_start, event_type, cnt FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                               ORDER BY cnt DESC, event_type) AS rn
  FROM c
) WHERE rn <= 3
"""


def q_oov_rate_docs(sf_dir: str):
    """Tokenizer-coverage audit: per-doc OOV counts against the corpus
    vocabulary (terms with global count ≥ 100). The vocab is built
    distributed (partial counts + one combine) but broadcast as a tiny
    frozenset — the docs pass is then zero-shuffle. Counts only, no
    division: rates are the consumer's one cheap op away and the hash
    compare stays integer-exact."""
    from ..functions.relational import grouped_agg

    MIN_CNT = 100
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8).materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].fillna("").str.split(" ").explode().value_counts()
        return pd.DataFrame({"term": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(np.int64)})

    counts = grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                         ["term"], {"cnt": ("cnt", "sum")}, num_buckets=8)
    vocab_df = counts.map_batches(
        lambda df: df[df["cnt"] >= MIN_CNT][["term"]],
        batch_format="pandas").to_pandas()
    vocab = frozenset(vocab_df["term"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ")
        exploded = toks.explode()
        oov = ~exploded.isin(vocab)
        per_doc = oov.groupby(level=0).agg(["size", "sum"]).reindex(df.index)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tokens": per_doc["size"].to_numpy(np.int64),
            "n_oov": per_doc["sum"].to_numpy(np.int64),
        })

    return docs.map_batches(score, batch_format="pandas")


SQL_OOV_RATE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), vocab AS (
  SELECT term FROM toks GROUP BY term HAVING COUNT(*) >= 100
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM toks t LEFT JOIN vocab v USING (term)
GROUP BY t.doc_id
"""


def q_burst_windows(sf_dir: str):
    """Burst detection over the hourly count series per event type: a
    window BURSTS when its count, cross-multiplied exactly, exceeds 2×
    the mean of the previous 6 PRESENT windows (cnt·n_prev > 2·Σprev —
    integer, no division). The count series is tiny (windows × types),
    so partials pre-aggregate map-side and the series assembles in one
    exchange keyed by type."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        win = (t_us // 3_600_000_000) * 3600
        out = (pd.DataFrame({"window_start": win,
                             "event_type": df["event_type"]})
               .groupby(["window_start", "event_type"], sort=False)
               .size().rename("cnt").reset_index())
        out["cnt"] = out["cnt"].astype("int64")
        return out

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["window_start", "event_type"],
                         {"cnt": ("cnt", "sum")}, num_buckets=8)

    def detect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "window_start"],
                            kind="mergesort")
        g = df.groupby("event_type", sort=False)["cnt"]
        prev_sum = (g.transform(
            lambda s: s.shift(1).rolling(6, min_periods=1).sum())
            .fillna(0).astype("int64"))
        prev_n = (g.transform(
            lambda s: s.shift(1).rolling(6, min_periods=1).count())
            .fillna(0).astype("int64"))
        hit = (prev_n > 0) & (df["cnt"] * prev_n > 2 * prev_sum)
        out = df.loc[hit, ["event_type", "window_start", "cnt"]].copy()
        out["prev_sum"] = prev_sum[hit]
        out["prev_n"] = prev_n[hit]
        return out

    res = bucket_exchange(counts, ["event_type"], detect,
                          num_buckets=4).materialize()
    if res.count() == 0:
        # a provably-empty result (no bursts at this scale) would lose
        # its columns through to_pandas — return the typed empty frame
        return pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "window_start": pd.Series([], dtype="int64"),
            "cnt": pd.Series([], dtype="int64"),
            "prev_sum": pd.Series([], dtype="int64"),
            "prev_n": pd.Series([], dtype="int64"),
        })
    return res


SQL_BURST_WINDOWS = """
WITH c AS (
  SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start,
         event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY window_start, event_type
), w AS (
  SELECT event_type, window_start, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY event_type
             ORDER BY window_start
             ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS prev_sum,
         CAST(COALESCE(COUNT(cnt) OVER (PARTITION BY event_type
             ORDER BY window_start
             ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS prev_n
  FROM c
)
SELECT event_type, window_start, cnt, prev_sum, prev_n
FROM w WHERE prev_n > 0 AND cnt * prev_n > 2 * prev_sum
"""


def q_cdc_chunks_docs(sf_dir: str):
    """Content-defined chunking (the rsync/LBFS dedup-friendly
    chunker): boundaries fall where a rolling window function of the
    CONTENT (sum of the last 8 codepoints mod 16 == 0) fires, so an
    insertion re-chunks only its neighborhood instead of shifting every
    fixed-width boundary after it. Emits (doc_id, chunk_no, start_pos,
    chunk_len), 1-based positions. Zero shuffle; codepoints vectorize
    per doc via utf-32 reinterpretation (no per-char Python). The SQL
    twin replays the window sum per exploded position."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    W, MOD = 8, 16

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        ids, chunk_no, start, length = [], [], [], []
        for did, text in zip(df["doc_id"].to_numpy(np.int64),
                             df["text"].fillna("")):
            n = len(text)
            if n == 0:
                continue
            cp = np.frombuffer(text.encode("utf-32-le"),
                               dtype=np.uint32).astype(np.int64)
            ps = np.concatenate(([0], np.cumsum(cp)))
            pos = np.arange(1, n + 1)
            lo = np.maximum(pos - W, 0)
            wsum = ps[pos] - ps[lo]
            bnd = (wsum % MOD == 0)
            bnd[-1] = True  # last position always closes a chunk
            ends = pos[bnd]
            starts = np.concatenate(([1], ends[:-1] + 1))
            k = len(ends)
            ids.append(np.full(k, did, np.int64))
            chunk_no.append(np.arange(1, k + 1, dtype=np.int64))
            start.append(starts.astype(np.int64))
            length.append((ends - starts + 1).astype(np.int64))
        if not ids:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_no": pd.Series([], dtype="int64"),
                "start_pos": pd.Series([], dtype="int64"),
                "chunk_len": pd.Series([], dtype="int64")})
        return pd.DataFrame({"doc_id": np.concatenate(ids),
                             "chunk_no": np.concatenate(chunk_no),
                             "start_pos": np.concatenate(start),
                             "chunk_len": np.concatenate(length)})

    return docs.map_batches(chunk, batch_format="pandas")


SQL_CDC_CHUNKS = """
WITH pos AS (
  SELECT doc_id, length(text) AS n, text,
         unnest(range(1, length(text) + 1)) AS p
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
), w AS (
  SELECT doc_id, n, p,
         SUM(ascii(substring(text, p, 1)))
           OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wsum
  FROM pos
), b AS (
  SELECT doc_id, p,
         CASE WHEN wsum % 16 = 0 OR p = n THEN 1 ELSE 0 END AS is_end
  FROM w
), e AS (
  SELECT doc_id, p AS end_pos,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS chunk_no,
         LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev_end
  FROM b WHERE is_end = 1
)
SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       CAST(COALESCE(prev_end, 0) + 1 AS BIGINT) AS start_pos,
       CAST(end_pos - COALESCE(prev_end, 0) AS BIGINT) AS chunk_len
FROM e
"""


def q_snapshot_char_drift(sf_dir: str):
    """Content-drift MAGNITUDE between consecutive snapshots of each
    url: L1 distance of character histograms (exact integers — the
    cheap structural-change meter that hash equality can't grade).
    Snapshot order is (warc_ts, md5(text)) — the fixture has tied
    timestamps with different texts, and the md5 tiebreak is the only
    ordering both engines replay exactly. One url exchange; codepoint
    histograms vectorize via utf-32 + np.unique; texts never leave
    their bucket."""
    import hashlib

    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "text"],
                            override_num_blocks=16)

    def per_url(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            t_us=(df["warc_ts"].to_numpy().astype("datetime64[ns]")
                  .astype(np.int64) // 1000),
            md5=[hashlib.md5(t.encode()).hexdigest()
                 for t in df["text"].fillna("")],
        )
        df = df.sort_values(["url", "t_us", "md5"], kind="mergesort")
        urls, snaps, t_out, drift = [], [], [], []
        for url, g in df.groupby("url", sort=False):
            prev = None
            for snap_no, (_, row) in enumerate(g.iterrows(), start=1):
                cp = np.frombuffer(
                    (row["text"] or "").encode("utf-32-le"), np.uint32)
                vals, cnts = np.unique(cp, return_counts=True)
                cur = dict(zip(vals.tolist(), cnts.tolist()))
                if prev is not None:
                    keys = set(cur) | set(prev)
                    l1 = sum(abs(cur.get(k, 0) - prev.get(k, 0))
                             for k in keys)
                    urls.append(url)
                    snaps.append(snap_no)
                    t_out.append(row["t_us"])
                    drift.append(l1)
                prev = cur
        return pd.DataFrame({
            "url": pd.Series(urls, dtype=object),
            "snap_no": pd.Series(snaps, dtype="int64"),
            "warc_us": pd.Series(t_out, dtype="int64"),
            "l1_drift": pd.Series(drift, dtype="int64")})

    return bucket_exchange(ds, ["url"], per_url, num_buckets=16)


SQL_SNAPSHOT_CHAR_DRIFT = f"""
WITH snaps AS (
  SELECT url, epoch_us(warc_ts) AS warc_us, COALESCE(text, '') AS text,
         ROW_NUMBER() OVER (PARTITION BY url
                            ORDER BY warc_ts, md5(COALESCE(text, '')))
           AS rn,
         COUNT(*) OVER (PARTITION BY url) AS n_snaps
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), chars AS (
  SELECT url, rn, substring(text, unnest(range(1, length(text) + 1)), 1)
           AS ch
  FROM snaps
), counts AS (
  SELECT url, rn, ch, COUNT(*) AS cnt FROM chars GROUP BY url, rn, ch
), diffs AS (
  SELECT COALESCE(a.url, b.url) AS url,
         COALESCE(a.rn, b.rn + 1) AS rn,
         COALESCE(a.cnt, 0) - COALESCE(b.cnt, 0) AS d
  FROM counts a FULL JOIN counts b
    ON a.url = b.url AND a.ch = b.ch AND a.rn = b.rn + 1
)
SELECT s.url, CAST(s.rn AS BIGINT) AS snap_no, s.warc_us,
       CAST(COALESCE(SUM(ABS(d.d)), 0) AS BIGINT) AS l1_drift
FROM snaps s LEFT JOIN diffs d ON d.url = s.url AND d.rn = s.rn
WHERE s.rn >= 2
GROUP BY s.url, s.rn, s.warc_us
"""


def q_length_gini_sources(sf_dir: str):
    """Inequality of doc lengths within each source — the Lorenz/Gini
    audit that flags a source whose token budget is owned by a few huge
    docs. Emitted as the exact integer pair (gini_num, gini_den) with
    gini = num/den = Σ(2i−n−1)·x_(i) / (n·Σx): rank-weighted sums are
    permutation-invariant under ties, so no float or tiebreak ambiguity
    exists on either side. One source exchange; int64 holds up to ~10⁹
    docs·chars per source — beyond that, ship python-int strings like
    fit_standardizer does."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["source", "n_chars"],
                      num_blocks=8)

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in df.groupby("source", sort=False):
            x = np.sort(g["n_chars"].to_numpy(np.int64))
            n = np.int64(len(x))
            i = np.arange(1, n + 1, dtype=np.int64)
            num = int(((2 * i - n - 1) * x).sum())
            rows.append((src, int(n), num, int(n * x.sum())))
        return pd.DataFrame(rows, columns=["source", "n_docs",
                                           "gini_num", "gini_den"]).astype(
            {"n_docs": "int64", "gini_num": "int64", "gini_den": "int64"})

    return bucket_exchange(docs, ["source"], per_source, num_buckets=4)


SQL_LENGTH_GINI = """
WITH r AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS i,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM((2 * i - n - 1) * n_chars) AS BIGINT) AS gini_num,
       CAST(MAX(n) * SUM(n_chars) AS BIGINT) AS gini_den
FROM r GROUP BY source
"""


def q_peak_hour_types(sf_dir: str):
    """Seasonality profile reduced to its argmax: each event type's
    peak UTC hour-of-day (ties → smallest hour, explicit on both
    sides). Partial (type, hour) counts pre-aggregate map-side — 24
    rows per type per batch ceiling — then one combine and a grouped
    top-1."""
    from ..functions.relational import grouped_agg, grouped_topk

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        hod = (t_us // 3_600_000_000) % 24
        out = (pd.DataFrame({"event_type": df["event_type"], "peak_hod": hod})
               .groupby(["event_type", "peak_hod"], sort=False)
               .size().rename("peak_cnt").reset_index())
        out["peak_cnt"] = out["peak_cnt"].astype("int64")
        out["peak_hod"] = out["peak_hod"].astype("int64")
        return out

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "peak_hod"],
                         {"peak_cnt": ("peak_cnt", "sum")}, num_buckets=8)
    return grouped_topk(counts, ["event_type"], "peak_cnt", k=1,
                        descending=True, tiebreak=["peak_hod"],
                        num_buckets=4)


SQL_PEAK_HOUR_TYPES = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 3600000000 % 24 AS peak_hod,
         CAST(COUNT(*) AS BIGINT) AS peak_cnt
  FROM events GROUP BY event_type, peak_hod
)
SELECT event_type, peak_hod, peak_cnt FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY peak_cnt DESC, peak_hod) AS rn
  FROM c
) WHERE rn = 1
"""


def q_abc_parts(sf_dir: str):
    """ABC / Pareto inventory classification: parts ranked by revenue,
    class A while the cumulative share ≤ 80%, B ≤ 95%, else C — with
    NO global sort (distributed ordered scan over negated cents) and NO
    division (share thresholds compare as cum·100 vs pct·total, exact
    BIGINT cents via nearest-int recovery of the fixed-decimal price —
    a *.5 tie can't occur, so half-even vs half-away is moot).
    Revenue ties share their cumulative sum on both sides (RANGE frame
    ≡ the scan's tie rule)."""
    from ..functions.relational import grouped_agg, ordered_scan

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice"],
                    num_blocks=8)

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                    ).astype(np.int64)
        return (pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy(np.int64),
                              "rev_cents": c})
                .groupby("l_partkey", sort=False)["rev_cents"].sum()
                .astype("int64").reset_index())

    per_part = grouped_agg(li.map_batches(cents, batch_format="pandas"),
                           ["l_partkey"], {"rev_cents": ("rev_cents", "sum")},
                           num_buckets=8).materialize()
    total = int(per_part.sum("rev_cents"))

    keyed = per_part.map_batches(
        lambda df: df.assign(neg=-df["rev_cents"].to_numpy(np.int64)),
        batch_format="pandas")
    scanned = ordered_scan(keyed, "neg", "rev_cents", out_col="cum_cents",
                           num_buckets=8)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        cum = df["cum_cents"].to_numpy(np.int64)
        cls = np.where(cum * 100 <= 80 * total, "A",
                       np.where(cum * 100 <= 95 * total, "B", "C"))
        return pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy(np.int64),
                             "rev_cents": df["rev_cents"].to_numpy(np.int64),
                             "cum_cents": cum,
                             "abc_class": cls})

    return scanned.map_batches(classify, batch_format="pandas")


SQL_ABC_PARTS = """
WITH p AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY l_partkey
), s AS (
  SELECT l_partkey, rev_cents,
         CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC) AS BIGINT)
           AS cum_cents,
         CAST((SELECT SUM(rev_cents) FROM p) AS BIGINT) AS total
  FROM p
)
SELECT l_partkey, rev_cents, cum_cents,
       CASE WHEN cum_cents * 100 <= 80 * total THEN 'A'
            WHEN cum_cents * 100 <= 95 * total THEN 'B'
            ELSE 'C' END AS abc_class
FROM s
"""


def q_novel_bigrams_daily(sf_dir: str):
    """Behavioral-drift monitor: how many NEVER-SEEN-BEFORE event-type
    bigrams (per-user consecutive pairs) first appear on each day. One
    user exchange builds the pairs with their µs-exact first times,
    a tiny pair-keyed combine takes the global MIN, and the per-day
    count is a third, even tinier combine — at most |types|² rows ever
    re-shuffle."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        df = df.assign(t_us=t_us)
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        keep = prev.notna()
        pairs = pd.DataFrame({"prev_type": prev[keep],
                              "event_type": df["event_type"][keep],
                              "first_us": df["t_us"][keep]})
        return (pairs.groupby(["prev_type", "event_type"], sort=False)
                ["first_us"].min().astype("int64").reset_index())

    firsts = grouped_agg(
        bucket_exchange(ev, ["user_id"], per_user, num_buckets=8),
        ["prev_type", "event_type"], {"first_us": ("first_us", "min")},
        num_buckets=4)

    def per_day(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["first_us"].to_numpy(np.int64) // DAY_US) * 86400
        out = (pd.DataFrame({"day_start": day}).groupby("day_start")
               .size().rename("n_novel_bigrams").reset_index())
        return out.astype({"day_start": "int64",
                           "n_novel_bigrams": "int64"})

    return grouped_agg(
        firsts.map_batches(per_day, batch_format="pandas"),
        ["day_start"], {"n_novel_bigrams": ("n_novel_bigrams", "sum")},
        num_buckets=2)


SQL_NOVEL_BIGRAMS = """
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type, epoch_us(ts) AS t_us
  FROM events
), firsts AS (
  SELECT prev_type, event_type, MIN(t_us) AS first_us
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT first_us // 86400000000 * 86400 AS day_start,
       CAST(COUNT(*) AS BIGINT) AS n_novel_bigrams
FROM firsts GROUP BY day_start
"""


def q_tld_stats(sf_dir: str):
    """Crawl composition by top-level domain: pages, distinct urls and
    distinct hosts per TLD — the corpus-mix dashboard row. Distinct
    counting runs as one url-keyed dedup exchange then a tiny TLD
    combine; hosts parse vectorized."""
    from ..functions.relational import grouped_agg
    from ..stages.dedup import dedup_exact

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)

    def n_pages_partial(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].str.split("//", n=1).str[1]
                .str.split("/", n=1).str[0])
        tld = host.str.rsplit(".", n=1).str[-1]
        out = (pd.DataFrame({"tld": tld}).groupby("tld", sort=False)
               .size().rename("n_pages").reset_index())
        out["n_pages"] = out["n_pages"].astype("int64")
        return out

    pages_per_tld = grouped_agg(
        ds.map_batches(n_pages_partial, batch_format="pandas"),
        ["tld"], {"n_pages": ("n_pages", "sum")}, num_buckets=2)

    urls = dedup_exact(ds, ["url"], num_buckets=16)

    def url_partial(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].str.split("//", n=1).str[1]
                .str.split("/", n=1).str[0])
        tld = host.str.rsplit(".", n=1).str[-1]
        g = (pd.DataFrame({"tld": tld, "host": host})
             .groupby("tld", sort=False)
             .agg(n_urls=("host", "size"),
                  hosts=("host", lambda s: list(set(s)))).reset_index())
        g["n_urls"] = g["n_urls"].astype("int64")
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tld, g in df.groupby("tld", sort=False):
            hosts = set()
            for h in g["hosts"]:
                hosts.update(h)
            rows.append((tld, int(g["n_urls"].sum()), len(hosts)))
        return pd.DataFrame(rows, columns=["tld", "n_urls", "n_hosts"]
                            ).astype({"n_urls": "int64",
                                      "n_hosts": "int64"})

    from ..functions.relational import hash_join
    from ..stages.partition import bucket_exchange

    url_stats = bucket_exchange(
        urls.map_batches(url_partial, batch_format="pandas"),
        ["tld"], combine, num_buckets=2)
    return hash_join(pages_per_tld, url_stats, on=["tld"], num_buckets=2)


SQL_TLD_STATS = f"""
WITH p AS (
  SELECT url,
         split_part(split_part(url, '//', 2), '/', 1) AS host
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), t AS (
  SELECT url, host, string_split(host, '.')[-1] AS tld FROM p
)
SELECT tld,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
FROM t GROUP BY tld
"""


def q_rfm_customers(sf_dir: str):
    """RFM segmentation — the classic behavioral feature triple: each
    customer's Recency (last order day), Frequency (orders) and
    Monetary (exact cents) quintile-bucketed by GLOBAL rank with no
    global sort: three chained ordered scans over collision-free
    composite keys (metric·2²¹ + custkey ≡ ORDER BY metric, custkey;
    custkey < 2²¹ — re-shard the key width beyond that). Buckets are
    the exact integer ((rn−1)·5)//n + 1, so engines can't disagree on
    NTILE remainder placement."""
    from ..functions.relational import grouped_agg, ordered_scan

    DAY_US = 86_400_000_000

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"],
                        num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["o_orderdate"].to_numpy().astype("datetime64[ns]")
               .astype(np.int64) // 1000) // DAY_US
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        out = (pd.DataFrame({"o_custkey": df["o_custkey"].to_numpy(np.int64),
                             "last_day": day, "freq": np.int64(1),
                             "cents": cents})
               .groupby("o_custkey", sort=False)
               .agg(last_day=("last_day", "max"), freq=("freq", "sum"),
                    cents=("cents", "sum")).astype("int64").reset_index())
        return out

    per_cust = grouped_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        {"last_day": ("last_day", "max"), "freq": ("freq", "sum"),
         "cents": ("cents", "sum")},
        num_buckets=8).materialize()
    n = per_cust.count()

    SHIFT = np.int64(1) << 21

    def key(col):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(
                _k=df[col].to_numpy(np.int64) * SHIFT
                + df["o_custkey"].to_numpy(np.int64),
                _one=np.int64(1))
        return fn

    ds = per_cust
    for col, rn_col in (("last_day", "r_rn"), ("freq", "f_rn"),
                        ("cents", "m_rn")):
        ds = ordered_scan(ds.map_batches(key(col), batch_format="pandas"),
                          "_k", "_one", out_col=rn_col, num_buckets=8)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        def b(rn):
            return (rn.to_numpy(np.int64) - 1) * 5 // n + 1
        r, f, m = b(df["r_rn"]), b(df["f_rn"]), b(df["m_rn"])
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "r_bucket": r, "f_bucket": f, "m_bucket": m,
            "rfm_segment": 100 * r + 10 * f + m})

    return ds.map_batches(bucketize, batch_format="pandas")


SQL_RFM_CUSTOMERS = """
WITH c AS (
  SELECT o_custkey,
         MAX(epoch_us(o_orderdate) // 86400000000) AS last_day,
         COUNT(*) AS freq,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER (ORDER BY last_day, o_custkey) AS r_rn,
         ROW_NUMBER() OVER (ORDER BY freq, o_custkey) AS f_rn,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS m_rn,
         COUNT(*) OVER () AS n
  FROM c
)
SELECT o_custkey,
       CAST((r_rn - 1) * 5 // n + 1 AS BIGINT) AS r_bucket,
       CAST((f_rn - 1) * 5 // n + 1 AS BIGINT) AS f_bucket,
       CAST((m_rn - 1) * 5 // n + 1 AS BIGINT) AS m_bucket,
       CAST(((r_rn - 1) * 5 // n + 1) * 100
            + ((f_rn - 1) * 5 // n + 1) * 10
            + ((m_rn - 1) * 5 // n + 1) AS BIGINT) AS rfm_segment
FROM r
"""


def q_dense_daily_counts(sf_dir: str):
    """Calendar GAP-FILL: the dense per-type daily count series
    (missing days exist as explicit zeros — what every
    forecasting/backtest consumer actually needs; the seasonal-naive
    backtest skips gaps instead). Counts pre-aggregate map-side; one
    type exchange explodes each type's own [min_day, max_day] range
    vectorized and left-fills zeros."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        out = (pd.DataFrame({"event_type": df["event_type"],
                             "day": t_us // DAY_US})
               .groupby(["event_type", "day"], sort=False)
               .size().rename("cnt").reset_index())
        return out.astype({"day": "int64", "cnt": "int64"})

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "day"], {"cnt": ("cnt", "sum")},
                         num_buckets=8)

    def densify(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for etype, g in df.groupby("event_type", sort=False):
            days = np.arange(g["day"].min(), g["day"].max() + 1,
                             dtype=np.int64)
            s = (g.set_index("day")["cnt"]
                 .reindex(days, fill_value=0).astype("int64"))
            frames.append(pd.DataFrame({
                "event_type": etype,
                "day_start": days * 86400,
                "cnt": s.to_numpy(np.int64)}))
        if not frames:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "day_start": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    return bucket_exchange(counts, ["event_type"], densify, num_buckets=4)


SQL_DENSE_DAILY = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, day
), b AS (
  SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM c
  GROUP BY event_type
), g AS (
  SELECT event_type, unnest(range(mn, mx + 1)) AS day FROM b
)
SELECT g.event_type, CAST(g.day * 86400 AS BIGINT) AS day_start,
       CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.day = g.day
"""


def q_ttr_langs(sf_dir: str):
    """Type-token ratio per language — the corpus-linguistics lexical-
    diversity audit — kept integer-exact as the (n_types, n_tokens)
    pair. Distinct terms count in a (lang, term)-keyed exchange (terms
    hash-spread, so one giant language can't hot-spot a bucket); token
    totals ride the same partial pass."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "text"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.assign(term=df["text"].fillna("").str.split(" "))[
            ["lang", "term"]].explode("term")
        out = (toks.groupby(["lang", "term"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    per_term = grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                           ["lang", "term"], {"n": ("n", "sum")},
                           num_buckets=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("lang", sort=False)
               .agg(n_types=("term", "size"), n_tokens=("n", "sum"))
               .astype("int64").reset_index())
        return out

    return grouped_agg(
        per_term.map_batches(fold, batch_format="pandas"),
        ["lang"], {"n_types": ("n_types", "sum"),
                   "n_tokens": ("n_tokens", "sum")},
        num_buckets=2)


SQL_TTR_LANGS = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT lang,
       CAST(COUNT(DISTINCT term) AS BIGINT) AS n_types,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM toks GROUP BY lang
"""


def q_distinctive_terms(sf_dir: str):
    """Keyness: the top-5 most DISTINCTIVE terms per language — highest
    lift = (term share in lang) / (term share in corpus), min count 5.
    The only float op is the one final division, identical on both
    engines from identical integers (and replayed, never re-derived),
    so ordering can't diverge; ties break on the term. Two partial-
    aggregated exchanges + a grouped top-k; corpus totals broadcast."""
    from ..functions.relational import grouped_agg, grouped_topk

    MIN_CNT = 5
    docs = read_table(sf_dir, "documents", columns=["lang", "text"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.assign(term=df["text"].fillna("").str.split(" "))[
            ["lang", "term"]].explode("term")
        out = (toks.groupby(["lang", "term"], sort=False)
               .size().rename("cnt").reset_index())
        out["cnt"] = out["cnt"].astype("int64")
        return out

    lt = grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                     ["lang", "term"], {"cnt": ("cnt", "sum")},
                     num_buckets=8).materialize()

    # corpus-wide term totals and per-lang token totals: both tiny
    term_tot = (lt.map_batches(
        lambda df: df.groupby("term", sort=False)["cnt"].sum()
        .reset_index(), batch_format="pandas").to_pandas()
        .groupby("term")["cnt"].sum())
    lang_tot = (lt.map_batches(
        lambda df: df.groupby("lang", sort=False)["cnt"].sum()
        .reset_index(), batch_format="pandas").to_pandas()
        .groupby("lang")["cnt"].sum())
    total = int(term_tot.sum())
    term_tot_d = term_tot.to_dict()
    lang_tot_d = lang_tot.to_dict()

    def lift(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["cnt"] >= MIN_CNT].copy()
        ct = df["term"].map(term_tot_d).to_numpy(np.int64)
        tl = df["lang"].map(lang_tot_d).to_numpy(np.int64)
        num = df["cnt"].to_numpy(np.int64) * total
        den = ct * tl
        df["lift"] = num.astype(np.float64) / den.astype(np.float64)
        df["cnt"] = df["cnt"].astype("int64")
        return df[["lang", "term", "cnt", "lift"]]

    scored = lt.map_batches(lift, batch_format="pandas")
    return grouped_topk(scored, ["lang"], "lift", k=5, descending=True,
                        tiebreak=["term"], num_buckets=4)


SQL_DISTINCTIVE_TERMS = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
), lt AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY lang, term
), tt AS (SELECT term, SUM(cnt) AS ct FROM lt GROUP BY term),
lg AS (SELECT lang, SUM(cnt) AS tl FROM lt GROUP BY lang),
tot AS (SELECT SUM(cnt) AS total FROM lt),
scored AS (
  SELECT lt.lang, lt.term, lt.cnt,
         CAST(lt.cnt * tot.total AS DOUBLE)
           / CAST(tt.ct * lg.tl AS DOUBLE) AS lift
  FROM lt JOIN tt USING (term) JOIN lg USING (lang) CROSS JOIN tot
  WHERE lt.cnt >= 5
)
SELECT lang, term, cnt, lift FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY lift DESC, term) AS rn
  FROM scored
) WHERE rn <= 5
"""


def q_returning_users_daily(sf_dir: str):
    """The DAU quality split every growth dashboard runs: per day,
    active users vs RETURNING users (first seen on an earlier day).
    First-seen days come from one user-keyed min-combine (partials
    pre-aggregate map-side); the daily rollup is a second, tiny
    exchange — raw events shuffle zero times."""
    from ..functions.relational import grouped_agg

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[us]")
                .astype("datetime64[ns]").astype(np.int64) // 1000)
        out = (pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "day": t_us // DAY_US})
               .drop_duplicates())
        out["first_day"] = out["day"]
        return out.astype({"day": "int64", "first_day": "int64"})

    user_days = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id", "day"], {"first_day": ("first_day", "min")},
        num_buckets=8)

    def per_user_daily(df: pd.DataFrame) -> pd.DataFrame:
        fd = df.groupby("user_id", sort=False)["day"].transform("min")
        df = df.assign(returning=(df["day"] > fd))
        out = (df.groupby("day", sort=False)
               .agg(n_active=("user_id", "size"),
                    n_returning=("returning", "sum"))
               .astype("int64").reset_index())
        out["day_start"] = out.pop("day") * 86400
        return out[["day_start", "n_active", "n_returning"]]

    from ..stages.partition import bucket_exchange

    daily_partials = bucket_exchange(user_days, ["user_id"],
                                     per_user_daily, num_buckets=8)
    return grouped_agg(
        daily_partials,
        ["day_start"], {"n_active": ("n_active", "sum"),
                        "n_returning": ("n_returning", "sum")},
        num_buckets=2)


SQL_RETURNING_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), f AS (
  SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
)
SELECT CAST(ud.day * 86400 AS BIGINT) AS day_start,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning
FROM ud JOIN f USING (user_id)
GROUP BY ud.day
"""


def q_changepoint_types(sf_dir: str):
    """Single change-point detection on each type's daily count series:
    the split day maximizing |mean-before − mean-after|, scored with
    the EXACT integer cross-product |pre_sum·n_post − post_sum·n_pre|
    (no division, no float — engines cannot disagree on an argmax over
    integers; ties → earliest split). Series assemble per type in one
    exchange; scoring is a vectorized prefix-sum sweep."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        out = (pd.DataFrame({"event_type": df["event_type"],
                             "day": t_us // DAY_US})
               .groupby(["event_type", "day"], sort=False)
               .size().rename("cnt").reset_index())
        return out.astype({"day": "int64", "cnt": "int64"})

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "day"], {"cnt": ("cnt", "sum")},
                         num_buckets=8)

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            g = g.sort_values("day", kind="mergesort")
            c = g["cnt"].to_numpy(np.int64)
            n = len(c)
            if n < 2:
                continue
            ps = np.cumsum(c)
            total = ps[-1]
            k = np.arange(1, n, dtype=np.int64)  # split after k days
            pre, post = ps[:-1], total - ps[:-1]
            score = np.abs(pre * (n - k) - post * k)
            best = int(np.argmax(score))  # first max → earliest split
            rows.append((etype, int(g["day"].to_numpy(np.int64)[best]
                                    * 86400), int(score[best])))
        return pd.DataFrame(rows, columns=["event_type", "split_day_start",
                                           "score"]).astype(
            {"split_day_start": "int64", "score": "int64"})

    return bucket_exchange(counts, ["event_type"], sweep, num_buckets=4)


SQL_CHANGEPOINT_TYPES = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, day
), w AS (
  SELECT event_type, day,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY day) AS pre,
         SUM(cnt) OVER (PARTITION BY event_type) AS total,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
), s AS (
  SELECT event_type, day,
         ABS(pre * (n - k) - (total - pre) * k) AS score
  FROM w WHERE k < n
)
SELECT event_type, CAST(day * 86400 AS BIGINT) AS split_day_start,
       CAST(score AS BIGINT) AS score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY score DESC, day) AS rn
  FROM s
) WHERE rn = 1
"""


def q_top_paths_3(sf_dir: str):
    """Sequential-pattern SUPPORT counting (the GSP/PrefixSpan
    primitive at length 3): for every consecutive event-type trigram,
    the number of DISTINCT users who ever produce it; top-10 by
    (support DESC, path). One user exchange emits each user's distinct
    trigrams once (set semantics inside the kernel), a tiny combine
    sums supports, then bounded top-k."""
    from ..functions.relational import grouped_agg, topk
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)["event_type"]
        t1 = g.shift(2)
        t2 = g.shift(1)
        keep = t1.notna()
        tri = pd.DataFrame({
            "user_id": df["user_id"][keep],
            "path": (t1[keep] + ">" + t2[keep] + ">"
                     + df["event_type"][keep]),
        }).drop_duplicates()
        out = (tri.groupby("path", sort=False).size()
               .rename("support").reset_index())
        out["support"] = out["support"].astype("int64")
        return out

    support = grouped_agg(
        bucket_exchange(ev, ["user_id"], per_user, num_buckets=8),
        ["path"], {"support": ("support", "sum")}, num_buckets=4)
    return topk(support, ["support", "path"], k=10,
                descending=[True, False])


SQL_TOP_PATHS_3 = """
WITH tri AS (
  SELECT DISTINCT user_id,
         LAG(event_type, 2) OVER w || '>' ||
         LAG(event_type, 1) OVER w || '>' || event_type AS path
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS support
FROM tri WHERE path IS NOT NULL
GROUP BY path
ORDER BY support DESC, path
LIMIT 10
"""


def q_time_to_value_users(sf_dir: str):
    """Milestone latency — the LTV/activation feature: per user, the
    first event at which cumulative value reaches 10,000 cents, with µs
    elapsed since the user's first event. Exact integer cents cumsum
    inside one user exchange; users that never reach the bar are
    excluded on both sides."""
    from ..stages.partition import bucket_exchange

    BAR = 10_000

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        cents = np.rint(df["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        df = df.assign(t_us=t_us, cents=cents)
        g = df.groupby("user_id", sort=False)
        cum = g["cents"].cumsum()
        first_t = g["t_us"].transform("min")
        hit = cum >= BAR
        # first qualifying row per user
        firsts = df[hit].groupby("user_id", sort=False).head(1)
        cum_hit = cum[hit].groupby(df["user_id"][hit], sort=False).head(1)
        return pd.DataFrame({
            "user_id": firsts["user_id"].to_numpy(np.int64),
            "event_id": firsts["event_id"].to_numpy(np.int64),
            "cum_cents": cum_hit.to_numpy(np.int64),
            "us_to_value": (firsts["t_us"]
                            - first_t[hit].groupby(
                                df["user_id"][hit], sort=False).head(1)
                            ).to_numpy(np.int64),
        })

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_TIME_TO_VALUE = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS cum_cents,
         MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS first_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), hits AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS hn
  FROM c WHERE cum_cents >= 10000
)
SELECT user_id, event_id, CAST(cum_cents AS BIGINT) AS cum_cents,
       CAST(t_us - first_us AS BIGINT) AS us_to_value
FROM hits WHERE hn = 1
"""


def q_url_shape_domains(sf_dir: str):
    """URL-shape profile per domain — the crawl-frontier triage stats:
    distinct urls, max path depth (path '/' segments) and how many
    carry a query string. One dedup exchange then a tiny per-domain
    combine; all string ops vectorized."""
    from ..functions.relational import grouped_agg
    from ..stages.dedup import dedup_exact

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)
    urls = dedup_exact(ds, ["url"], num_buckets=16)

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.split("//", n=1).str[1]
        domain = rest.str.split("/", n=1).str[0]
        tail = rest.str.split("/", n=1).str[1].fillna("")
        path = tail.str.split("?", n=1).str[0]
        depth = np.where(path.str.len() > 0,
                         path.str.count("/") + 1, 0).astype(np.int64)
        has_q = df["url"].str.contains("?", regex=False)
        out = (pd.DataFrame({"domain": domain, "depth": depth,
                             "has_q": has_q})
               .groupby("domain", sort=False)
               .agg(n_urls=("depth", "size"), max_depth=("depth", "max"),
                    n_with_query=("has_q", "sum"))
               .astype("int64").reset_index())
        return out

    return grouped_agg(
        urls.map_batches(shape, batch_format="pandas"),
        ["domain"],
        {"n_urls": ("n_urls", "sum"), "max_depth": ("max_depth", "max"),
         "n_with_query": ("n_with_query", "sum")},
        num_buckets=4)


SQL_URL_SHAPE = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), t AS (
  SELECT url,
         split_part(split_part(url, '//', 2), '/', 1) AS domain,
         CASE WHEN strpos(split_part(url, '//', 2), '/') = 0 THEN ''
              ELSE split_part(
                substring(split_part(url, '//', 2),
                          strpos(split_part(url, '//', 2), '/') + 1),
                '?', 1)
         END AS path,
         CASE WHEN strpos(url, '?') > 0 THEN 1 ELSE 0 END AS has_q
  FROM u
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(MAX(CASE WHEN length(path) > 0
                THEN length(path) - length(replace(path, '/', '')) + 1
                ELSE 0 END) AS BIGINT) AS max_depth,
       CAST(SUM(has_q) AS BIGINT) AS n_with_query
FROM t GROUP BY domain
"""


def q_partitioned_docs(sf_dir: str):
    """The hive-partitioned resumable SINK as a driver-checkable
    pipeline: write documents under ``lang=<v>/data.parquet`` (one
    atomic partition + manifest per language, finished partitions
    skipped on resume — see tests/test_round4g_ops.py for the resume
    property), then report per-partition row counts read back from the
    manifests. Oracle: the same counts straight off the table."""
    import os

    from ..state.checkpoint import (fingerprint, input_lineage, load_metrics,
                                    write_hive_partitioned)

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/transmog_ray_hive/{scale}"
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "text"], num_blocks=8)
    # input lineage in the fingerprint: a changed source parquet must
    # invalidate every partition, not silently resume over stale output
    fp = fingerprint({
        "job": "partitioned-docs",
        "inputs": input_lineage([f"{sf_dir}/documents.parquet"]),
    })
    write_hive_partitioned(docs, out_dir, "lang",
                           run_fingerprint=fp,
                           order_by=["doc_id"])
    m = load_metrics(out_dir)
    out = pd.DataFrame({
        "lang": m["partition_value"].astype(object),
        "n_docs": m["rows_out"].astype("int64")})
    return out.sort_values("lang").reset_index(drop=True)


SQL_PARTITIONED_DOCS = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents WHERE lang IS NOT NULL
GROUP BY lang
"""


def q_inter_session_gaps(sf_dir: str):
    """Histogram of BETWEEN-session gaps (hours between consecutive
    session starts per user) — the re-engagement curve sessionization
    exists to feed. Session starts derive in the same one sorted
    user pass as sessionize (gap > 30 min), their diffs bucket to
    hours, and only the tiny histogram partials re-shuffle."""
    from ..stages.partition import bucket_exchange

    GAP_US = SESSION_GAP_S * 1_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        df = df.assign(t_us=t_us)
        prev = df.groupby("user_id", sort=False)["t_us"].shift(1)
        is_start = prev.isna() | ((df["t_us"] - prev) > GAP_US)
        starts = df[is_start]
        prev_start = (starts.groupby("user_id", sort=False)["t_us"]
                      .shift(1))
        gaps = (starts["t_us"] - prev_start).dropna().astype(np.int64)
        hours = gaps // 3_600_000_000
        out = (pd.DataFrame({"gap_hours": hours}).groupby("gap_hours")
               .size().rename("n").reset_index())
        return out.astype({"gap_hours": "int64", "n": "int64"})

    from ..functions.relational import grouped_agg

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    return grouped_agg(partials, ["gap_hours"], {"n": ("n", "sum")},
                       num_buckets=2)


SQL_INTER_SESSION_GAPS = f"""
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w
                        > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), starts AS (
  SELECT user_id, t_us,
         LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
           AS prev_start
  FROM flagged WHERE is_start = 1
)
SELECT (t_us - prev_start) // 3600000000 AS gap_hours,
       CAST(COUNT(*) AS BIGINT) AS n
FROM starts WHERE prev_start IS NOT NULL
GROUP BY gap_hours
"""


def q_corpus_card(sf_dir: str):
    """The one-row DATASET CARD: corpus-level totals every release
    ships with (docs, languages, sources, chars, whitespace tokens,
    largest doc). Single map pass emitting one partial row per batch;
    the combine folds a handful of rows — nothing else moves."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "source", "text",
                               "n_chars"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ").str.len()
        return pd.DataFrame({
            "n_docs": [np.int64(len(df))],
            "total_chars": [np.int64(df["n_chars"].sum())],
            "total_tokens": [np.int64(toks.sum())],
            "max_doc_chars": [np.int64(df["n_chars"].max())],
            "langs": [sorted(df["lang"].dropna().unique().tolist())],
            "sources": [sorted(df["source"].dropna().unique().tolist())],
        })

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    langs = set()
    sources = set()
    for l in parts["langs"]:
        langs.update(l)
    for s in parts["sources"]:
        sources.update(s)
    return pd.DataFrame({
        "n_docs": [np.int64(parts["n_docs"].sum())],
        "n_langs": [np.int64(len(langs))],
        "n_sources": [np.int64(len(sources))],
        "total_chars": [np.int64(parts["total_chars"].sum())],
        "total_tokens": [np.int64(parts["total_tokens"].sum())],
        "max_doc_chars": [np.int64(parts["max_doc_chars"].max())],
    })


SQL_CORPUS_CARD = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(string_split(COALESCE(text, ''), ' ')))
            AS BIGINT) AS total_tokens,
       CAST(MAX(n_chars) AS BIGINT) AS max_doc_chars
FROM documents
"""


def q_copurchase_parts(sf_dir: str):
    """Market-basket co-occurrence on the fact table: top-20 part PAIRS
    appearing in the same order. One order-keyed exchange; pair
    generation is a vectorized self-merge per bucket (a.part < b.part
    kills mirrors and self-pairs), distinct within order first so
    multi-line parts can't double-count; then partial counts, a tiny
    pair combine, bounded top-k."""
    from ..functions.relational import grouped_agg, topk
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"],
                    num_blocks=8)

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        out = (m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    pairs = bucket_exchange(li, ["l_orderkey"], per_order, num_buckets=8)
    counts = grouped_agg(pairs, ["l_partkey_a", "l_partkey_b"],
                         {"n": ("n", "sum")}, num_buckets=8)
    return topk(counts, ["n", "l_partkey_a", "l_partkey_b"], k=20,
                descending=[True, False, False])


SQL_COPURCHASE_PARTS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS l_partkey_a, b.l_partkey AS l_partkey_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n DESC, l_partkey_a, l_partkey_b
LIMIT 20
"""


def q_autocorr7_types(sf_dir: str):
    """Weekly-seasonality strength: per event type, the lag-7
    autocovariance SUFFICIENT STATS of the dense daily count series
    (gap days count as explicit zeros, or the lag would silently skip
    them) — emitted as exact BIGINT sums (n_pairs, sxy, sx, sy, sxx,
    syy) so the correlation itself is one float op downstream and the
    hash compare never sees accumulation order. One type exchange;
    the lag pairing is an aligned-slice product on the densified
    vector."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000
    LAG = 7

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        out = (pd.DataFrame({"event_type": df["event_type"],
                             "day": t_us // DAY_US})
               .groupby(["event_type", "day"], sort=False)
               .size().rename("cnt").reset_index())
        return out.astype({"day": "int64", "cnt": "int64"})

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "day"], {"cnt": ("cnt", "sum")},
                         num_buckets=8)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            days = np.arange(g["day"].min(), g["day"].max() + 1,
                             dtype=np.int64)
            c = (g.set_index("day")["cnt"].reindex(days, fill_value=0)
                 .to_numpy(np.int64))
            if len(c) <= LAG:
                continue
            x, y = c[LAG:], c[:-LAG]
            rows.append((etype, len(x), int((x * y).sum()),
                         int(x.sum()), int(y.sum()),
                         int((x * x).sum()), int((y * y).sum())))
        return pd.DataFrame(rows, columns=[
            "event_type", "n_pairs", "sxy", "sx", "sy", "sxx", "syy"]
        ).astype({c: "int64" for c in ["n_pairs", "sxy", "sx", "sy",
                                       "sxx", "syy"]})

    return bucket_exchange(counts, ["event_type"], stats, num_buckets=4)


SQL_AUTOCORR7_TYPES = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, day
), b AS (
  SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM c
  GROUP BY event_type
), g AS (
  SELECT event_type, unnest(range(mn, mx + 1)) AS day FROM b
), dense AS (
  SELECT g.event_type, g.day, COALESCE(c.cnt, 0) AS cnt
  FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.day = g.day
), pairs AS (
  SELECT x.event_type, x.cnt AS xv, y.cnt AS yv
  FROM dense x JOIN dense y
    ON y.event_type = x.event_type AND y.day = x.day - 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(xv * yv) AS BIGINT) AS sxy,
       CAST(SUM(xv) AS BIGINT) AS sx,
       CAST(SUM(yv) AS BIGINT) AS sy,
       CAST(SUM(xv * xv) AS BIGINT) AS sxx,
       CAST(SUM(yv * yv) AS BIGINT) AS syy
FROM pairs GROUP BY event_type
"""


def q_quantile_norm_lengths(sf_dir: str):
    """Quantile NORMALIZATION across sources (the batch-effect
    remover): each doc's length maps to the pooled corpus length at the
    same quantile, so every source ends up with the pooled
    distribution. Exact integers end to end: per-source rank r (ties
    broken by doc_id), target pooled rank ⌈r·N/n_src⌉, and the pooled
    value looked up through the VALUE-HISTOGRAM CDF (lengths are a
    small integer domain, so the CDF broadcasts in a few KB — no global
    sort, no pooled array shipping)."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"],
                      num_blocks=8).materialize()

    hist = (docs.map_batches(
        lambda df: df.groupby("n_chars", sort=False).size()
        .rename("n").reset_index(), batch_format="pandas").to_pandas()
        .groupby("n_chars")["n"].sum().sort_index())
    values = hist.index.to_numpy(np.int64)
    cdf = hist.cumsum().to_numpy(np.int64)
    N = int(cdf[-1])

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            kind="mergesort")
        r = (df.groupby("source", sort=False).cumcount()
             .to_numpy(np.int64) + 1)
        n_src = (df.groupby("source", sort=False)["doc_id"]
                 .transform("size").to_numpy(np.int64))
        tr = (r * N + n_src - 1) // n_src  # ceil(r*N/n_src)
        idx = np.searchsorted(cdf, tr, side="left")
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "source": df["source"].to_numpy(object),
            "n_chars": df["n_chars"].to_numpy(np.int64),
            "norm_chars": values[idx],
        })

    return bucket_exchange(docs, ["source"], per_source, num_buckets=4)


SQL_QUANTILE_NORM = """
WITH pooled AS (
  SELECT n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS pos
  FROM documents
), r AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n_src,
         (SELECT COUNT(*) FROM documents) AS n
  FROM documents
)
SELECT r.doc_id, r.source, r.n_chars,
       CAST(p.n_chars AS BIGINT) AS norm_chars
FROM r JOIN pooled p ON p.pos = (r.rnk * r.n + r.n_src - 1) // r.n_src
"""


def q_negsample_weights(sf_dir: str):
    """word2vec-style NEGATIVE-SAMPLING weights: count^0.75 per term —
    made cross-engine bit-exact by computing it as
    sqrt(sqrt(c·c·c)) (sqrt is correctly rounded on both libms;
    pow() is NOT — the round-3 lesson). Distributed term counts, then
    a map; requires c³ < 2⁵³ (term counts < ~208k — assert loudly
    beyond)."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text"], num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].fillna("").str.split(" ").explode().value_counts()
        return pd.DataFrame({"term": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(np.int64)})

    counts = grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                         ["term"], {"cnt": ("cnt", "sum")}, num_buckets=8)

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cnt"].to_numpy(np.int64)
        if (c >= 208_000).any():
            raise ValueError("term count too large for exact c^3 in "
                             "float64; shard the corpus first")
        cf = c.astype(np.float64)
        w = np.sqrt(np.sqrt(cf * cf * cf))
        df = df.copy()
        df["cnt"] = df["cnt"].astype("int64")
        df["weight"] = w
        return df

    return counts.map_batches(weigh, batch_format="pandas")


SQL_NEGSAMPLE_WEIGHTS = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term)
SELECT term, cnt,
       SQRT(SQRT(CAST(cnt AS DOUBLE) * cnt * cnt)) AS weight
FROM c
"""


def q_k_anonymity_docs(sf_dir: str):
    """Privacy-release audit: quasi-identifier groups (lang, source)
    holding FEWER than k=25 docs — the k-anonymity violations that must
    be suppressed or generalized before publication. Partial counts
    map-side; only the tiny group table shuffles."""
    from ..functions.relational import grouped_agg

    K = 25
    docs = read_table(sf_dir, "documents", columns=["lang", "source"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["lang", "source"], sort=False)
               .size().rename("n_docs").reset_index())
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    counts = grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                         ["lang", "source"], {"n_docs": ("n_docs", "sum")},
                         num_buckets=4)
    return counts.map_batches(
        lambda t: t.filter(pc.less(t["n_docs"], K)),
        batch_format="pyarrow")


SQL_K_ANONYMITY = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang, source
HAVING COUNT(*) < 25
"""


def q_nation_share_region(sf_dir: str):
    """Share-of-parent in the geo hierarchy: each nation's supplier
    revenue next to its region's total (exact BIGINT cents both — the
    share is the consumer's one division). Dimension chain
    supplier→nation→region broadcasts driver-side (tiny); lineitem
    streams through one partial-agg pass; one small nation combine and
    a region fold that rides the same broadcast."""
    from ..functions.relational import grouped_agg

    sup = read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = read_small(sf_dir, "nation",
                     ["n_nationkey", "n_name", "n_regionkey"])
    reg = read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    sup_to_nat = sup.set_index("s_suppkey")["s_nationkey"].to_dict()
    natkey_to_name = nat.set_index("n_nationkey")["n_name"].to_dict()
    nat_to_regname = (nat.merge(reg, left_on="n_regionkey",
                                right_on="r_regionkey")
                      .set_index("n_nationkey")["r_name"].to_dict())

    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_extendedprice"], num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        natk = df["l_suppkey"].map(sup_to_nat)
        out = (pd.DataFrame({"natk": natk, "cents": cents})
               .groupby("natk", sort=False)["cents"].sum()
               .astype("int64").reset_index())
        out["n_name"] = out["natk"].map(natkey_to_name)
        out["r_name"] = out["natk"].map(nat_to_regname)
        return out[["n_name", "r_name", "cents"]].rename(
            columns={"cents": "nation_cents"})

    nations = grouped_agg(li.map_batches(partial, batch_format="pandas"),
                          ["n_name", "r_name"],
                          {"nation_cents": ("nation_cents", "sum")},
                          num_buckets=4)

    def add_region_total(df: pd.DataFrame) -> pd.DataFrame:
        reg_tot = (df.groupby("r_name", sort=False)["nation_cents"]
                   .transform("sum"))
        return df.assign(region_cents=reg_tot.astype("int64"))

    from ..stages.partition import bucket_exchange

    return bucket_exchange(nations, ["r_name"], add_region_total,
                           num_buckets=2)


SQL_NATION_SHARE_REGION = """
WITH n AS (
  SELECT n.n_name, r.r_name,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS nation_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY n.n_name, r.r_name
)
SELECT n_name, r_name, nation_cents,
       CAST(SUM(nation_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS region_cents
FROM n
"""


def q_revenue_concentration(sf_dir: str):
    """Revenue concentration — the whale metric: how many cents the top
    1% of customers (⌈n/100⌉, ranked by exact order-revenue cents,
    custkey tiebreak) account for, vs the total. One per-customer
    combine, one distributed ordered scan over the negated-cents
    composite key, then a single-row fold — no global sort, nothing
    big on the driver."""
    from ..functions.relational import grouped_agg, ordered_scan

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"], num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        return (pd.DataFrame({"o_custkey": df["o_custkey"]
                              .to_numpy(np.int64), "cents": cents})
                .groupby("o_custkey", sort=False)["cents"].sum()
                .astype("int64").reset_index())

    per_cust = grouped_agg(orders.map_batches(partial,
                                              batch_format="pandas"),
                           ["o_custkey"], {"cents": ("cents", "sum")},
                           num_buckets=8).materialize()
    n = per_cust.count()
    top_n = -(-n // 100)  # ceil(n/100)

    SHIFT = np.int64(1) << 21

    keyed = per_cust.map_batches(
        lambda df: df.assign(
            _k=-df["cents"].to_numpy(np.int64) * SHIFT
            + df["o_custkey"].to_numpy(np.int64),
            _one=np.int64(1)),
        batch_format="pandas")
    scanned = ordered_scan(keyed, "_k", "_one", out_col="rn", num_buckets=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        top = df.loc[df["rn"] <= top_n, "cents"].sum()
        return pd.DataFrame({"top_cents": [np.int64(top)],
                             "total_cents": [np.int64(df["cents"].sum())]})

    parts = scanned.map_batches(fold, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_customers": [np.int64(n)],
        "top_n": [np.int64(top_n)],
        "top_cents": [np.int64(parts["top_cents"].sum())],
        "total_cents": [np.int64(parts["total_cents"].sum())],
    })


SQL_REVENUE_CONCENTRATION = """
WITH c AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn,
         COUNT(*) OVER () AS n
  FROM c
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST((MAX(n) + 99) // 100 AS BIGINT) AS top_n,
       CAST(SUM(CASE WHEN rn <= (n + 99) // 100 THEN cents ELSE 0 END)
            AS BIGINT) AS top_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM r
"""


def q_log_length_histogram(sf_dir: str):
    """Power-of-two doc-length histogram — the long-tail profile
    dashboards draw on a log axis — with the bucket computed EXACTLY as
    the integer bit length (numpy frexp exponent == DuckDB
    length(printf('%b', n))), never floor(log2(x)), whose float
    rounding can misbucket exact powers of two. Zero shuffle but the
    tiny histogram combine."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["n_chars"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        x = x[x > 0]
        bl = np.frexp(x.astype(np.float64))[1].astype(np.int64)
        out = (pd.DataFrame({"bit_length": bl}).groupby("bit_length")
               .size().rename("n_docs").reset_index())
        return out.astype({"bit_length": "int64", "n_docs": "int64"})

    return grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                       ["bit_length"], {"n_docs": ("n_docs", "sum")},
                       num_buckets=2)


SQL_LOG_LENGTH_HISTOGRAM = """
SELECT CAST(length(printf('%b', n_chars)) AS BIGINT) AS bit_length,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents WHERE n_chars > 0
GROUP BY bit_length
"""


def q_rolling_max_events(sf_dir: str):
    """Trailing-hour rolling MAX and MIN per user (SQL RANGE frame,
    both ends inclusive) — the window aggregate prefix sums canNOT
    compute. Vectorized with the classic TWO-BUFFER trick: a trailing
    window of width w spans at most two w-aligned tiles, so the answer
    is max(suffix-cummax of the previous tile evaluated at the window
    start, prefix-cummax of the current tile) — no deque, no per-row
    loop. Float comparisons only (no arithmetic), so engines agree
    bit-for-bit."""
    from ..stages.partition import bucket_exchange

    W_US = np.int64(ROLL_WINDOW_S) * 1_000_000

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        v = df["value"].to_numpy(np.float64)
        uid = df["user_id"].to_numpy(np.int64)
        # per-user dynamic slot axis (same device as sliding_distinct)
        t0 = t_us.min() if len(t_us) else np.int64(0)
        span = ((t_us.max() - t0 if len(t_us) else np.int64(0))
                // W_US + 3) * W_US  # tile-aligned so tiles never span users
        ucode = pd.factorize(uid)[0].astype(np.int64)
        tt = ucode * span + (t_us - t0)

        tile = tt // W_US
        seg = pd.Series(tile)
        pre_max = pd.Series(v).groupby(seg).cummax().to_numpy()
        pre_min = pd.Series(v).groupby(seg).cummin().to_numpy()
        suf_max = (pd.Series(v[::-1]).groupby(pd.Series(tile[::-1]))
                   .cummax().to_numpy()[::-1])
        suf_min = (pd.Series(v[::-1]).groupby(pd.Series(tile[::-1]))
                   .cummin().to_numpy()[::-1])
        # window start index (inclusive): first row of same user with
        # tt >= tt_i - W; user slots are tile-aligned and padded, so the
        # searchsorted can never cross into another user's rows
        lo = np.searchsorted(tt, tt - W_US, side="left")
        seg_start_idx = np.flatnonzero(np.concatenate(
            ([True], tile[1:] != tile[:-1])))
        seg_of = np.searchsorted(seg_start_idx, np.arange(len(tt)),
                                 side="right") - 1
        start_of_tile = seg_start_idx[seg_of]
        has_prev = lo < start_of_tile
        prev_max = np.where(has_prev, suf_max[np.minimum(lo, len(tt) - 1)],
                            -np.inf)
        prev_min = np.where(has_prev, suf_min[np.minimum(lo, len(tt) - 1)],
                            np.inf)
        out = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "roll_max": np.maximum(pre_max, prev_max),
            "roll_min": np.minimum(pre_min, prev_min),
        })
        # SQL RANGE frames include ALL peers of the current ts — tied
        # rows must share the tie group's extremes (raw values are
        # monotone within a tie group, so the group extreme IS the full
        # frame's value)
        ties = pd.Series(tt)
        out["roll_max"] = out.groupby([pd.Series(uid), ties],
                                      sort=False)["roll_max"].transform("max")
        out["roll_min"] = out.groupby([pd.Series(uid), ties],
                                      sort=False)["roll_min"].transform("min")
        return out

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_ROLLING_MAX = """
SELECT event_id, user_id,
       MAX(value) OVER w AS roll_max,
       MIN(value) OVER w AS roll_min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_length_clusters_docs(sf_dir: str):
    """1-D single-linkage clustering of doc lengths (gap-based: a new
    cluster starts where the sorted DISTINCT-value gap exceeds 20) —
    the natural-breaks binning that fixed-width histograms get wrong.
    The distinct-length table is tiny (values, not docs), so boundaries
    derive from a broadcast histogram; docs then map to cluster ids in
    a zero-shuffle pass. Everything integer."""
    GAP = 20

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8).materialize()

    vals = np.sort(docs.map_batches(
        lambda df: df[["n_chars"]].drop_duplicates(),
        batch_format="pandas").to_pandas()["n_chars"].unique()
        .astype(np.int64))
    new_cluster = np.concatenate(([True], np.diff(vals) > GAP))
    cluster_id = np.cumsum(new_cluster).astype(np.int64)  # 1-based
    starts = vals[new_cluster]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        cid = np.searchsorted(starts, x, side="right").astype(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chars": x,
            "cluster_id": cid,
            "cluster_start": starts[cid - 1],
        })

    return docs.map_batches(assign, batch_format="pandas")


SQL_LENGTH_CLUSTERS = """
WITH v AS (
  SELECT DISTINCT n_chars FROM documents
), f AS (
  SELECT n_chars,
         CASE WHEN n_chars - LAG(n_chars) OVER (ORDER BY n_chars) > 20
                   OR LAG(n_chars) OVER (ORDER BY n_chars) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM v
), c AS (
  SELECT n_chars,
         CAST(SUM(is_new) OVER (ORDER BY n_chars
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cluster_id,
         MAX(CASE WHEN is_new = 1 THEN n_chars END) OVER (
             ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cluster_start
  FROM f
)
SELECT d.doc_id, d.n_chars, c.cluster_id,
       CAST(c.cluster_start AS BIGINT) AS cluster_start
FROM documents d JOIN c USING (n_chars)
"""


def q_active_time_users(sf_dir: str):
    """Active-time coverage: per user, the total µs covered by the
    UNION of [event, event+5min) intervals — the engagement-duration
    measure naive Σdurations double-counts. The union is the classic
    running-max-end sweep (contribution = max(0, end − max(start,
    cummax of previous ends))), vectorized per user in one exchange;
    exact integer µs."""
    from ..stages.partition import bucket_exchange

    DUR_US = np.int64(300) * 1_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t = (df["ts"].to_numpy().astype("datetime64[ns]")
             .astype(np.int64) // 1000)
        end = t + DUR_US
        g = df.assign(_end=end).groupby("user_id", sort=False)
        prev_max_end = g["_end"].transform(
            lambda s: s.cummax().shift(1)).to_numpy()
        covered = np.maximum(
            end - np.maximum(t, np.nan_to_num(prev_max_end,
                                              nan=-np.inf)), 0)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                            "c": covered.astype(np.int64)})
        return (out.groupby("user_id", sort=False)["c"].sum()
                .astype("int64").rename("active_us").reset_index())

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_ACTIVE_TIME = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e,
         event_id
  FROM events
), sw AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_end
  FROM iv
)
SELECT user_id,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(prev_end, 0)), 0))
            AS BIGINT) AS active_us
FROM sw GROUP BY user_id
"""


def q_spearman_types(sf_dir: str):
    """Spearman rank-correlation SUFFICIENT stats per event type
    (value-vs-time monotonicity): both rankings are ROW_NUMBERs with
    the event_id tiebreak, so ranks are exact permutations and Σd² is
    an exact BIGINT — ρ = 1 − 6Σd²/(n(n²−1)) is the consumer's one
    float op. One type exchange; ranks via double argsort."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "event_id", "value"],
                    num_blocks=8)

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            t = (g["ts"].to_numpy().astype("datetime64[ns]")
                 .astype(np.int64) // 1000)
            eid = g["event_id"].to_numpy(np.int64)
            v = g["value"].to_numpy(np.float64)
            n = len(g)
            rank_t = np.empty(n, np.int64)
            rank_t[np.lexsort((eid, t))] = np.arange(1, n + 1)
            rank_v = np.empty(n, np.int64)
            rank_v[np.lexsort((eid, v))] = np.arange(1, n + 1)
            d = rank_v - rank_t
            rows.append((etype, n, int((d * d).sum())))
        return pd.DataFrame(rows, columns=["event_type", "n", "sum_d2"]
                            ).astype({"n": "int64", "sum_d2": "int64"})

    return bucket_exchange(ev, ["event_type"], per_type, num_buckets=4)


SQL_SPEARMAN_TYPES = """
WITH r AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rank_t,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rank_v
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((rank_v - rank_t) * (rank_v - rank_t)) AS BIGINT)
         AS sum_d2
FROM r GROUP BY event_type
"""


def q_pps_sample_docs(sf_dir: str):
    """Systematic probability-proportional-to-size sampling — the
    survey-design corpus sampler: k=100 evenly spaced lattice points
    over the cumulative n_chars axis; a doc is drawn once per lattice
    point inside its interval (big docs can draw multiple hits — that
    IS the PPS weight). Exact: hit counts come from integer ceil
    arithmetic over the distributed ordered scan's cumulative sums; no
    floats anywhere. Docs order by doc_id so the lattice is stable
    across runs and cluster sizes."""
    from ..functions.relational import ordered_scan

    K = 100
    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8)
    scanned = ordered_scan(docs, "doc_id", "n_chars", out_col="cum",
                           num_buckets=8).materialize()
    total = int(scanned.max("cum"))

    def hits_below(c: np.ndarray) -> np.ndarray:
        # |{j in [0,K): (2j+1)·total < 2K·c}| — pure integer
        num = 2 * K * c - total - 1
        cnt = np.where(num >= 0, num // (2 * total) + 1, 0)
        return np.clip(cnt, 0, K)

    def select(df: pd.DataFrame) -> pd.DataFrame:
        cum = df["cum"].to_numpy(np.int64)
        prev = cum - df["n_chars"].to_numpy(np.int64)
        n_hits = hits_below(cum) - hits_below(prev)
        keep = n_hits > 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
            "n_chars": df["n_chars"].to_numpy(np.int64)[keep],
            "n_hits": n_hits[keep].astype(np.int64)})

    return scanned.map_batches(select, batch_format="pandas")


SQL_PPS_SAMPLE = """
WITH s AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (ORDER BY doc_id) AS cum,
         (SELECT SUM(n_chars) FROM documents) AS total
  FROM documents
), h AS (
  SELECT doc_id, n_chars,
         LEAST(GREATEST(CASE WHEN 200 * cum - total - 1 >= 0
               THEN (200 * cum - total - 1) // (2 * total) + 1
               ELSE 0 END, 0), 100)
         - LEAST(GREATEST(CASE WHEN 200 * (cum - n_chars) - total - 1 >= 0
               THEN (200 * (cum - n_chars) - total - 1) // (2 * total) + 1
               ELSE 0 END, 0), 100) AS n_hits
  FROM s
)
SELECT doc_id, n_chars, CAST(n_hits AS BIGINT) AS n_hits
FROM h WHERE n_hits > 0
"""


def _explode_hrefs(df: pd.DataFrame) -> pd.DataFrame:
    """(url, href) pairs from the meta JSON links array — the link
    extraction every web-graph build starts from. json.loads per page
    (C parser, same shape as the flatten stage); vectorized from there."""
    import json as _json

    srcs, hrefs = [], []
    for url, meta in zip(df["url"], df["meta"]):
        if not meta:
            continue
        links = _json.loads(meta).get("links") or []
        for lk in links:
            h = lk.get("href")
            if h:
                srcs.append(url)
                hrefs.append(h)
    return pd.DataFrame({"url": pd.Series(srcs, dtype=object),
                         "href": pd.Series(hrefs, dtype=object)})


def q_link_domain_edges(sf_dir: str):
    """The WEB GRAPH at domain granularity: (src_domain → dst_domain)
    edge counts extracted from every page's meta links — the input
    PageRank/BFS-style graph ops consume. Links explode map-side into
    (src, dst) partials (one row per edge per batch ceiling); only the
    tiny edge table shuffles."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = _explode_hrefs(df)
        src = (pairs["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        dst = (pairs["href"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        out = (pd.DataFrame({"src": src, "dst": dst})
               .groupby(["src", "dst"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    return grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                       ["src", "dst"], {"n": ("n", "sum")}, num_buckets=8)


SQL_LINK_DOMAIN_EDGES = f"""
WITH l AS (
  SELECT url, unnest(CAST(json_extract(meta, '$.links') AS JSON[]))
           AS link
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
)
SELECT split_part(split_part(url, '//', 2), '/', 1) AS src,
       split_part(split_part(json_extract_string(link, '$.href'),
                             '//', 2), '/', 1) AS dst,
       CAST(COUNT(*) AS BIGINT) AS n
FROM l WHERE json_extract_string(link, '$.href') IS NOT NULL
GROUP BY src, dst
"""


def q_dangling_links(sf_dir: str):
    """Frontier DISCOVERY: outlink targets never crawled (href not in
    the url set), counted per target domain — what the crawler queues
    next. One href↔url co-bucketed anti-join exchange: both sides
    route by the url string, the kernel drops hrefs whose bucket
    contains their target."""
    from ..functions.relational import grouped_agg
    from ..stages.dedup import dedup_exact
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    pages = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                               override_num_blocks=16)

    hrefs = pages.map_batches(
        lambda df: _explode_hrefs(df)[["href"]]
        .rename(columns={"href": "u"}).assign(side="l"),
        batch_format="pandas")
    crawled = dedup_exact(
        pages.map_batches(lambda df: df[["url"]], batch_format="pandas"),
        ["url"], num_buckets=16).map_batches(
        lambda df: df.rename(columns={"url": "u"}).assign(side="r"),
        batch_format="pandas")

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        have = set(df.loc[df["side"] == "r", "u"])
        miss = df.loc[(df["side"] == "l") & ~df["u"].isin(have), "u"]
        dom = miss.str.split("//", n=1).str[1].str.split("/", n=1).str[0]
        out = (pd.DataFrame({"dst_domain": dom})
               .groupby("dst_domain", sort=False)
               .size().rename("n_dangling").reset_index())
        out["n_dangling"] = out["n_dangling"].astype("int64")
        return out

    partials = bucket_exchange(hrefs.union(crawled), ["u"], anti,
                               num_buckets=16)
    return grouped_agg(partials, ["dst_domain"],
                       {"n_dangling": ("n_dangling", "sum")}, num_buckets=2)


SQL_DANGLING_LINKS = f"""
WITH l AS (
  SELECT json_extract_string(
           unnest(CAST(json_extract(meta, '$.links') AS JSON[])),
           '$.href') AS href
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
), u AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
)
SELECT split_part(split_part(l.href, '//', 2), '/', 1) AS dst_domain,
       CAST(COUNT(*) AS BIGINT) AS n_dangling
FROM l LEFT JOIN u ON u.url = l.href
WHERE l.href IS NOT NULL AND u.url IS NULL
GROUP BY dst_domain
"""


def q_user_retention_curve(sf_dir: str):
    """Classic retention curve: distinct users still active k days
    after their own first day, for every observed offset k (0 =
    everyone's first day). One user exchange derives each user's
    offsets locally; only (offset, 1) partials combine."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "day": t_us // DAY_US}).drop_duplicates()
        first = d.groupby("user_id", sort=False)["day"].transform("min")
        off = (d["day"] - first).astype("int64")
        out = (pd.DataFrame({"day_offset": off}).groupby("day_offset")
               .size().rename("n_users").reset_index())
        return out.astype({"day_offset": "int64", "n_users": "int64"})

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    return grouped_agg(partials, ["day_offset"],
                       {"n_users": ("n_users", "sum")}, num_buckets=2)


SQL_USER_RETENTION_CURVE = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), f AS (
  SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
)
SELECT CAST(ud.day - f.first_day AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN f USING (user_id)
GROUP BY day_offset
"""


def q_domain_degrees(sf_dir: str):
    """Hub/authority raw material: per domain, weighted OUT-degree
    (links it emits), weighted IN-degree (links pointing at it) and
    self-links — straight off the domain edge table, two tiny partial
    combines joined on the domain (the edge table never re-shuffles
    whole)."""
    from ..functions.relational import grouped_agg, hash_join

    edges = q_link_domain_edges(sf_dir).materialize()

    outs = grouped_agg(
        edges.map_batches(
            lambda df: df.rename(columns={"src": "domain"})[
                ["domain", "n"]].rename(columns={"n": "out_deg"}),
            batch_format="pandas"),
        ["domain"], {"out_deg": ("out_deg", "sum")}, num_buckets=4)
    ins = grouped_agg(
        edges.map_batches(
            lambda df: df.rename(columns={"dst": "domain"})[
                ["domain", "n"]].rename(columns={"n": "in_deg"}),
            batch_format="pandas"),
        ["domain"], {"in_deg": ("in_deg", "sum")}, num_buckets=4)
    selfs = grouped_agg(
        edges.map_batches(
            lambda df: df[df["src"] == df["dst"]]
            .rename(columns={"src": "domain"})[["domain", "n"]]
            .rename(columns={"n": "self_links"}),
            batch_format="pandas"),
        ["domain"], {"self_links": ("self_links", "sum")}, num_buckets=4)

    j = hash_join(outs, ins, on=["domain"], how="outer", num_buckets=4)
    j = hash_join(j, selfs, on=["domain"], how="outer", num_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("out_deg", "in_deg", "self_links"):
            df[c] = df[c].fillna(0).astype("int64")
        return df[["domain", "out_deg", "in_deg", "self_links"]]

    return j.map_batches(finish, batch_format="pandas")


SQL_DOMAIN_DEGREES = f"""
WITH l AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS src,
         split_part(split_part(json_extract_string(
           unnest(CAST(json_extract(meta, '$.links') AS JSON[])),
           '$.href'), '//', 2), '/', 1) AS dst
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
), e AS (SELECT src, dst FROM l WHERE dst IS NOT NULL AND dst != ''),
o AS (SELECT src AS domain, COUNT(*) AS out_deg FROM e GROUP BY src),
i AS (SELECT dst AS domain, COUNT(*) AS in_deg FROM e GROUP BY dst),
s AS (SELECT src AS domain, COUNT(*) AS self_links FROM e
      WHERE src = dst GROUP BY src)
SELECT COALESCE(o.domain, i.domain, s.domain) AS domain,
       CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(s.self_links, 0) AS BIGINT) AS self_links
FROM o FULL JOIN i ON i.domain = o.domain
FULL JOIN s ON s.domain = COALESCE(o.domain, i.domain)
"""


def q_link_locality_pages(sf_dir: str):
    """Link LOCALITY per page snapshot: internal (same-domain) vs
    external outlink counts — the template/navigation-heaviness signal
    content classifiers use. Snapshot identity is (url, warc_us); the
    fixture holds full-duplicate snapshot rows, so counts aggregate
    over them identically on both sides. Map pass + one tiny combine
    keyed by the snapshot."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "meta"],
                            override_num_blocks=16)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        df = df[df["meta"].notna()]
        warc_us = (df["warc_ts"].to_numpy().astype("datetime64[ns]")
                   .astype(np.int64) // 1000)
        n_int = np.zeros(len(df), np.int64)
        n_ext = np.zeros(len(df), np.int64)
        for i, (url, meta) in enumerate(zip(df["url"], df["meta"])):
            dom = url.split("//", 1)[1].split("/", 1)[0]
            for lk in _json.loads(meta).get("links") or []:
                h = lk.get("href")
                if not h:
                    continue
                if h.split("//", 1)[1].split("/", 1)[0] == dom:
                    n_int[i] += 1
                else:
                    n_ext[i] += 1
        return pd.DataFrame({"url": df["url"].to_numpy(object),
                             "warc_us": warc_us,
                             "n_internal": n_int, "n_external": n_ext})

    return grouped_agg(
        ds.map_batches(score, batch_format="pandas"),
        ["url", "warc_us"],
        {"n_internal": ("n_internal", "sum"),
         "n_external": ("n_external", "sum")},
        num_buckets=8)


SQL_LINK_LOCALITY = f"""
WITH l AS (
  SELECT url, epoch_us(warc_ts) AS warc_us,
         split_part(split_part(url, '//', 2), '/', 1) AS dom,
         json_extract_string(
           unnest(CAST(json_extract(meta, '$.links') AS JSON[])),
           '$.href') AS href
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
), p AS (
  SELECT DISTINCT url, epoch_us(warc_ts) AS warc_us
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
)
SELECT p.url, p.warc_us,
       CAST(COALESCE(SUM(CASE WHEN
         split_part(split_part(l.href, '//', 2), '/', 1) = l.dom
         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_internal,
       CAST(COALESCE(SUM(CASE WHEN l.href IS NOT NULL AND
         split_part(split_part(l.href, '//', 2), '/', 1) != l.dom
         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_external
FROM p LEFT JOIN l ON l.url = p.url AND l.warc_us = p.warc_us
GROUP BY p.url, p.warc_us
"""


def q_politeness_violations(sf_dir: str):
    """Crawl-politeness audit: per domain, fetch pairs closer than 1s
    (consecutive warc_ts after sorting the domain's fetches) — what a
    crawler's rate limiter should have prevented. One domain exchange,
    vectorized diff; only domains with violations emit."""
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts"],
                            override_num_blocks=16)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.split("//", n=1).str[1]
        t_us = (df["warc_ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        return pd.DataFrame({"domain": rest.str.split("/", n=1).str[0],
                             "t_us": t_us})

    def per_domain(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["domain", "t_us"], kind="mergesort")
        prev = df.groupby("domain", sort=False)["t_us"].shift(1)
        viol = (df["t_us"] - prev) < 1_000_000
        out = (pd.DataFrame({"domain": df["domain"], "v": viol})
               .groupby("domain", sort=False)["v"].sum()
               .astype("int64").rename("n_violations").reset_index())
        return out[out["n_violations"] > 0]

    return bucket_exchange(ds.map_batches(tag, batch_format="pandas"),
                           ["domain"], per_domain, num_buckets=8)


SQL_POLITENESS = f"""
WITH t AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,
         epoch_us(warc_ts) AS t_us
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), d AS (
  SELECT domain,
         t_us - LAG(t_us) OVER (PARTITION BY domain ORDER BY t_us)
           AS gap
  FROM t
)
SELECT domain, CAST(SUM(CASE WHEN gap < 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
FROM d GROUP BY domain
HAVING SUM(CASE WHEN gap < 1000000 THEN 1 ELSE 0 END) > 0
"""


def q_url_templates(sf_dir: str):
    """URL TEMPLATE mining — the crawl-scheduler's structural dedup:
    digit runs normalize to 'N' so /p/37/out/0 and /p/42/out/1 collapse
    to one template; per template, page count and distinct-url count.
    The regex is RE2-safe (no lookaround) so DuckDB replays it
    verbatim. Distinct urls count through a (template, url)-keyed
    dedup exchange — no driver-side set ever builds."""
    import re

    from ..functions.relational import grouped_agg
    from ..stages.dedup import dedup_exact

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)
    pat = re.compile(r"[0-9]+")

    def tmpl(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(template=df["url"].str.replace(pat, "N",
                                                        regex=True))

    tagged = ds.map_batches(tmpl, batch_format="pandas").materialize()

    n_pages = grouped_agg(
        tagged.map_batches(
            lambda df: df.groupby("template", sort=False).size()
            .rename("n_pages").reset_index().astype({"n_pages": "int64"}),
            batch_format="pandas"),
        ["template"], {"n_pages": ("n_pages", "sum")}, num_buckets=4)

    distinct_urls = dedup_exact(tagged, ["template", "url"],
                                num_buckets=16)
    n_urls = grouped_agg(
        distinct_urls.map_batches(
            lambda df: df.groupby("template", sort=False).size()
            .rename("n_urls").reset_index().astype({"n_urls": "int64"}),
            batch_format="pandas"),
        ["template"], {"n_urls": ("n_urls", "sum")}, num_buckets=4)

    from ..functions.relational import hash_join

    return hash_join(n_pages, n_urls, on=["template"], num_buckets=4)


SQL_URL_TEMPLATES = f"""
SELECT regexp_replace(url, '[0-9]+', 'N', 'g') AS template,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
GROUP BY template
"""


def q_max_rate_users(sf_dir: str):
    """Bot-detection signal: each user's MAX events within any trailing
    60-second window ([t−60s, t], RANGE semantics — tied-ts rows share
    the count of all their peers). The trailing count is positions
    i − searchsorted(t−60s) on the user-offset composite axis (no
    per-row loop); tie groups take their last row's count. Only
    (user, max) rows leave the exchange."""
    from ..stages.partition import bucket_exchange

    W_US = np.int64(60) * 1_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        t0 = t_us.min() if len(t_us) else np.int64(0)
        span = (t_us.max() - t0 if len(t_us) else np.int64(0)) + W_US + 2
        ucode = pd.factorize(df["user_id"].to_numpy(np.int64))[0].astype(
            np.int64)
        tt = ucode * span + (t_us - t0)
        lo = np.searchsorted(tt, tt - W_US, side="left")
        # RANGE frame [t-W, t] includes later peers too
        hi = np.searchsorted(tt, tt, side="right")
        cnt = (hi - lo).astype(np.int64)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                            "cnt": cnt})
        return (out.groupby("user_id", sort=False)["cnt"].max()
                .astype("int64").rename("max_per_min").reset_index())

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_MAX_RATE_USERS = """
WITH c AS (
  SELECT user_id,
         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 60 SECOND PRECEDING
              AND CURRENT ROW) AS BIGINT) AS cnt
  FROM events
)
SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS max_per_min
FROM c GROUP BY user_id
"""


def q_props_k_stats(sf_dir: str):
    """Semi-structured payload stats: the 'k' field inside the props
    JSON per event type (n, sum, min, max — exact ints). The JSON
    parse (C parser per row, flatten-stage shape) happens map-side;
    only |types| partial rows shuffle. Parity: python json.loads ==
    DuckDB json_extract on integer fields."""
    import json as _json

    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["event_type", "props"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = np.fromiter(
            (_json.loads(p).get("k", 0) if p else 0 for p in df["props"]),
            dtype=np.int64, count=len(df))
        out = (pd.DataFrame({"event_type": df["event_type"], "k": ks})
               .groupby("event_type", sort=False)["k"]
               .agg(n="size", sum_k="sum", min_k="min", max_k="max")
               .astype("int64").reset_index())
        return out

    return grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"n": ("n", "sum"), "sum_k": ("sum_k", "sum"),
         "min_k": ("min_k", "min"), "max_k": ("max_k", "max")},
        num_buckets=2)


SQL_PROPS_K_STATS = """
WITH t AS (
  SELECT event_type,
         COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), 0) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM t GROUP BY event_type
"""


def q_novel_edges_daily(sf_dir: str):
    """Web-graph EVOLUTION: how many never-seen-before domain→domain
    edges each crawl day discovers (the first-seen attribution pattern,
    here on link structure). Links explode map-side with their µs
    timestamps; one edge-keyed min-combine finds each edge's first
    sighting; a tiny day rollup follows."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "meta"],
                            override_num_blocks=16)
    DAY_US = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        t_us = (df["warc_ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        srcs, dsts, ts = [], [], []
        for url, meta, t in zip(df["url"], df["meta"], t_us):
            if not meta:
                continue
            sdom = url.split("//", 1)[1].split("/", 1)[0]
            for lk in _json.loads(meta).get("links") or []:
                h = lk.get("href")
                if h:
                    srcs.append(sdom)
                    dsts.append(h.split("//", 1)[1].split("/", 1)[0])
                    ts.append(t)
        out = pd.DataFrame({"src": pd.Series(srcs, dtype=object),
                            "dst": pd.Series(dsts, dtype=object),
                            "first_us": pd.Series(ts, dtype="int64")})
        return (out.groupby(["src", "dst"], sort=False)["first_us"]
                .min().astype("int64").reset_index())

    firsts = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                         ["src", "dst"], {"first_us": ("first_us", "min")},
                         num_buckets=8)

    def per_day(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["first_us"].to_numpy(np.int64) // DAY_US) * 86400
        out = (pd.DataFrame({"day_start": day}).groupby("day_start")
               .size().rename("n_novel_edges").reset_index())
        return out.astype({"day_start": "int64", "n_novel_edges": "int64"})

    return grouped_agg(firsts.map_batches(per_day, batch_format="pandas"),
                       ["day_start"],
                       {"n_novel_edges": ("n_novel_edges", "sum")},
                       num_buckets=2)


SQL_NOVEL_EDGES_DAILY = f"""
WITH l AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS src,
         split_part(split_part(json_extract_string(
           unnest(CAST(json_extract(meta, '$.links') AS JSON[])),
           '$.href'), '//', 2), '/', 1) AS dst,
         epoch_us(warc_ts) AS t_us
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
), f AS (
  SELECT src, dst, MIN(t_us) AS first_us
  FROM l WHERE dst IS NOT NULL AND dst != ''
  GROUP BY src, dst
)
SELECT first_us // 86400000000 * 86400 AS day_start,
       CAST(COUNT(*) AS BIGINT) AS n_novel_edges
FROM f GROUP BY day_start
"""


def q_domain_dup_content(sf_dir: str):
    """Duplicate-content rate per domain: snapshots vs distinct text
    bodies (md5 identity) — the canonicalization-miss dashboard a
    crawl operator watches. One domain exchange; md5 per snapshot
    (already the dedup identity everywhere else in this repo)."""
    import hashlib

    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "text"],
                            override_num_blocks=16)

    def per_domain(df: pd.DataFrame) -> pd.DataFrame:
        md5 = [hashlib.md5((t or "").encode()).hexdigest()
               for t in df["text"]]
        g = pd.DataFrame({"domain": df["domain"], "md5": md5})
        return (g.groupby("domain", sort=False)
                .agg(n_snapshots=("md5", "size"),
                     n_distinct_texts=("md5", "nunique"))
                .astype("int64").reset_index())

    tagged = ds.map_batches(
        lambda df: df.assign(
            domain=df["url"].str.split("//", n=1).str[1]
            .str.split("/", n=1).str[0]),
        batch_format="pandas")
    return bucket_exchange(tagged, ["domain"], per_domain, num_buckets=8)


SQL_DOMAIN_DUP_CONTENT = f"""
SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_snapshots,
       CAST(COUNT(DISTINCT md5(COALESCE(text, ''))) AS BIGINT)
         AS n_distinct_texts
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
GROUP BY domain
"""


def q_unchanged_streaks(sf_dir: str):
    """Recrawl DEPRIORITIZATION input: per url, the trailing streak of
    snapshots whose text is identical to the latest (md5 identity;
    snapshot order (warc_ts, md5) — the fixture's tied timestamps make
    the md5 tiebreak mandatory). A url stuck at streak ≥ 3 belongs on a
    slower schedule. One url exchange; reversed-scan first-difference,
    vectorized."""
    import hashlib

    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "text"],
                            override_num_blocks=16)

    def per_url(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["warc_ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        md5 = [hashlib.md5((t or "").encode()).hexdigest()
               for t in df["text"]]
        df = df.assign(_t=t_us, _m=md5)
        df = df.sort_values(["url", "_t", "_m"], kind="mergesort")
        rows = []
        for url, g in df.groupby("url", sort=False):
            m = g["_m"].to_numpy(object)
            diff = np.flatnonzero(m != m[-1])
            streak = len(m) - (diff[-1] + 1 if len(diff) else 0)
            rows.append((url, len(m), streak))
        return pd.DataFrame(rows, columns=["url", "n_snaps",
                                           "streak_len"]).astype(
            {"n_snaps": "int64", "streak_len": "int64"})

    return bucket_exchange(ds, ["url"], per_url, num_buckets=16)


SQL_UNCHANGED_STREAKS = f"""
WITH s AS (
  SELECT url, md5(COALESCE(text, '')) AS m,
         ROW_NUMBER() OVER (PARTITION BY url
             ORDER BY warc_ts, md5(COALESCE(text, ''))) AS rn,
         COUNT(*) OVER (PARTITION BY url) AS n
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), lastm AS (
  SELECT url, m AS last_m FROM s WHERE rn = n
)
SELECT s.url, CAST(MAX(s.n) AS BIGINT) AS n_snaps,
       CAST(MAX(s.n) - COALESCE(MAX(CASE WHEN s.m != l.last_m
                                     THEN s.rn END), 0) AS BIGINT)
         AS streak_len
FROM s JOIN lastm l USING (url)
GROUP BY s.url
"""


def q_term_positions(sf_dir: str):
    """Snippet-generation primitive: the FIRST character position of
    each query term in each doc (1-based, docs without the term
    drop out). Terms broadcast in the closure; the scan is a
    vectorized str.find per term — zero shuffle. Parity: pandas find+1
    == DuckDB strpos."""
    TERMS = ["data", "model", "the", "stream"]

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        frames = []
        for term in TERMS:
            pos = text.str.find(term).to_numpy(np.int64) + 1
            hit = pos > 0
            frames.append(pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64)[hit],
                "term": term,
                "first_pos": pos[hit]}))
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "term": pd.Series([], dtype=object),
                          "first_pos": pd.Series([], dtype="int64")})

    return docs.map_batches(scan, batch_format="pandas")


SQL_TERM_POSITIONS = """
WITH t AS (SELECT unnest(['data', 'model', 'the', 'stream']) AS term)
SELECT d.doc_id, t.term,
       CAST(strpos(COALESCE(d.text, ''), t.term) AS BIGINT) AS first_pos
FROM documents d CROSS JOIN t
WHERE strpos(COALESCE(d.text, ''), t.term) > 0
"""


def q_day_churn_overlap(sf_dir: str):
    """Day-over-day stickiness: per day, active users and how many were
    also active the PREVIOUS calendar day (the adjacent-day overlap
    churn velocity reads off). One user exchange derives both flags
    locally from the user's own day set; only (day, counts) partials
    combine."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        d = (pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                           "day": t_us // DAY_US})
             .drop_duplicates()
             .sort_values(["user_id", "day"], kind="mergesort"))
        prev = d.groupby("user_id", sort=False)["day"].shift(1)
        d = d.assign(also_prev=(d["day"] - prev == 1).astype("int64"))
        out = (d.groupby("day", sort=False)
               .agg(n_active=("user_id", "size"),
                    n_also_prev=("also_prev", "sum"))
               .astype("int64").reset_index())
        out["day_start"] = out.pop("day") * 86400
        return out[["day_start", "n_active", "n_also_prev"]]

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    return grouped_agg(partials, ["day_start"],
                       {"n_active": ("n_active", "sum"),
                        "n_also_prev": ("n_also_prev", "sum")},
                       num_buckets=2)


SQL_DAY_CHURN_OVERLAP = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
)
SELECT CAST(a.day * 86400 AS BIGINT) AS day_start,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_also_prev
FROM ud a LEFT JOIN ud b
  ON b.user_id = a.user_id AND b.day = a.day - 1
GROUP BY a.day
"""


def q_price_dispersion_parts(sf_dir: str):
    """Per-part price DISPERSION sufficient stats over lineitems —
    exact BIGINT (n, sum_cents, sum_sq_cents); variance is the
    consumer's (n·Σx²−(Σx)²)/n² float away, never hashed. Map-side
    partials, one combine; Σx² of ~10⁷-cent prices stays well inside
    int64 at fixture scale (ship python-int strings beyond, the
    fit_standardizer pattern)."""
    from ..functions.relational import grouped_agg

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice"], num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                    ).astype(np.int64)
        out = (pd.DataFrame({"l_partkey": df["l_partkey"]
                             .to_numpy(np.int64),
                             "n": np.int64(1), "sum_cents": c,
                             "sum_sq_cents": c * c})
               .groupby("l_partkey", sort=False)
               .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum"),
                    sum_sq_cents=("sum_sq_cents", "sum"))
               .astype("int64").reset_index())
        return out

    return grouped_agg(
        li.map_batches(partial, batch_format="pandas"),
        ["l_partkey"],
        {"n": ("n", "sum"), "sum_cents": ("sum_cents", "sum"),
         "sum_sq_cents": ("sum_sq_cents", "sum")},
        num_buckets=8)


SQL_PRICE_DISPERSION = """
WITH c AS (
  SELECT l_partkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(cents * cents) AS BIGINT) AS sum_sq_cents
FROM c GROUP BY l_partkey
"""


def q_multi_grain_counts(sf_dir: str):
    """Multi-resolution time rollup from ONE fact pass: hourly partials
    compute once; day and week grains re-aggregate the TINY hourly
    table (decomposable counts — the rollup-lattice idea applied to
    time). Output carries a grain column; epoch-seconds starts
    hash-compare exactly."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        hour = (t_us // 3_600_000_000) * 3600
        out = (pd.DataFrame({"event_type": df["event_type"],
                             "hour_start": hour})
               .groupby(["event_type", "hour_start"], sort=False)
               .size().rename("cnt").reset_index())
        return out.astype({"hour_start": "int64", "cnt": "int64"})

    hourly = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "hour_start"],
                         {"cnt": ("cnt", "sum")}, num_buckets=8
                         ).materialize()

    def regrain(seconds: int, grain: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            start = (df["hour_start"].to_numpy(np.int64)
                     // seconds) * seconds
            out = (pd.DataFrame({"event_type": df["event_type"],
                                 "bucket_start": start,
                                 "cnt": df["cnt"].to_numpy(np.int64)})
                   .groupby(["event_type", "bucket_start"], sort=False)
                   ["cnt"].sum().astype("int64").reset_index())
            out["grain"] = grain
            return out
        return fn

    grains = []
    for seconds, grain in ((3600, "hour"), (86400, "day"),
                           (604800, "week")):
        grains.append(grouped_agg(
            hourly.map_batches(regrain(seconds, grain),
                               batch_format="pandas"),
            ["event_type", "bucket_start", "grain"],
            {"cnt": ("cnt", "sum")}, num_buckets=4))
    out = grains[0]
    for g in grains[1:]:
        out = out.union(g)
    return out


SQL_MULTI_GRAIN = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 * 3600 AS hour_start,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, hour_start
)
SELECT event_type, hour_start AS bucket_start, 'hour' AS grain, cnt
FROM h
UNION ALL
SELECT event_type, hour_start // 86400 * 86400, 'day',
       CAST(SUM(cnt) AS BIGINT)
FROM h GROUP BY event_type, hour_start // 86400 * 86400
UNION ALL
SELECT event_type, hour_start // 604800 * 604800, 'week',
       CAST(SUM(cnt) AS BIGINT)
FROM h GROUP BY event_type, hour_start // 604800 * 604800
"""


def q_crosscorr_types(sf_dir: str):
    """Lead-lag discovery: for every ORDERED type pair, the lag-1
    cross-covariance sufficient stats of their dense daily count
    series (does A's activity today predict B's tomorrow?). All exact
    BIGINTs. The per-(type, day) table is tiny, so pairing happens in
    ONE constant-key bucket (the data has already collapsed to
    |types|×|days| rows — no fact rows move)."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        out = (pd.DataFrame({"event_type": df["event_type"],
                             "day": t_us // DAY_US})
               .groupby(["event_type", "day"], sort=False)
               .size().rename("cnt").reset_index())
        return out.astype({"day": "int64", "cnt": "int64"})

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "day"], {"cnt": ("cnt", "sum")},
                         num_buckets=8).map_batches(
        lambda df: df.assign(_all=np.int64(0)), batch_format="pandas")

    def pair_stats(df: pd.DataFrame) -> pd.DataFrame:
        lo = int(df["day"].min())
        hi = int(df["day"].max())
        days = np.arange(lo, hi + 1, dtype=np.int64)
        series = {}
        for etype, g in df.groupby("event_type", sort=False):
            series[etype] = (g.set_index("day")["cnt"]
                             .reindex(days, fill_value=0)
                             .to_numpy(np.int64))
        rows = []
        for a in series:
            for b in series:
                if a == b:
                    continue
                x = series[a][:-1]  # A today
                y = series[b][1:]   # B tomorrow
                rows.append((a, b, len(x), int((x * y).sum()),
                             int(x.sum()), int(y.sum())))
        return pd.DataFrame(rows, columns=[
            "type_a", "type_b", "n_pairs", "sxy", "sx", "sy"]).astype(
            {"n_pairs": "int64", "sxy": "int64", "sx": "int64",
             "sy": "int64"})

    return bucket_exchange(counts, ["_all"], pair_stats, num_buckets=1)


SQL_CROSSCORR_TYPES = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, day
), b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM c),
g AS (SELECT unnest(range(mn, mx + 1)) AS day FROM b),
t AS (SELECT DISTINCT event_type FROM c),
dense AS (
  SELECT t.event_type, g.day, COALESCE(c.cnt, 0) AS cnt
  FROM t CROSS JOIN g
  LEFT JOIN c ON c.event_type = t.event_type AND c.day = g.day
), mx AS (SELECT MAX(day) AS mx FROM dense)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS sxy,
       CAST(SUM(a.cnt) AS BIGINT) AS sx,
       CAST(SUM(b.cnt) AS BIGINT) AS sy
FROM dense a JOIN dense b
  ON b.day = a.day + 1 AND b.event_type != a.event_type
GROUP BY a.event_type, b.event_type
"""


def q_front_coding_savings(sf_dir: str):
    """Front-coding compression estimate per domain: with urls sorted,
    the bytes a trie/front-coded index saves = Σ LCP(adjacent pairs) —
    the URL-store sizing number. One domain exchange (sorting urls
    within a domain is local by construction); the SQL twin computes
    each adjacent LCP as MIN(first differing position)−1 over an
    exploded position range."""
    import os as _os

    from ..stages.dedup import dedup_exact
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)
    urls = dedup_exact(ds, ["url"], num_buckets=16)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.split("//", n=1).str[1]
        return df.assign(domain=rest.str.split("/", n=1).str[0])

    def per_domain(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for dom, g in df.groupby("domain", sort=False):
            us = sorted(g["url"])
            total = sum(len(u) for u in us)
            lcp = sum(len(_os.path.commonprefix([a, b]))
                      for a, b in zip(us, us[1:]))
            rows.append((dom, len(us), total, lcp))
        return pd.DataFrame(rows, columns=[
            "domain", "n_urls", "total_chars", "lcp_savings"]).astype(
            {"n_urls": "int64", "total_chars": "int64",
             "lcp_savings": "int64"})

    return bucket_exchange(urls.map_batches(tag, batch_format="pandas"),
                           ["domain"], per_domain, num_buckets=8)


SQL_FRONT_CODING = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), d AS (
  SELECT url, split_part(split_part(url, '//', 2), '/', 1) AS domain
  FROM u
), pairs AS (
  SELECT domain, url,
         LAG(url) OVER (PARTITION BY domain ORDER BY url) AS prev
  FROM d
), pos AS (
  SELECT domain, url, prev,
         least(length(url), length(prev)) AS ml,
         unnest(range(1, least(length(url), length(prev)) + 1)) AS i
  FROM pairs WHERE prev IS NOT NULL
), lcp AS (
  SELECT domain, url,
         COALESCE(MIN(CASE WHEN substring(url, i, 1)
                           != substring(prev, i, 1) THEN i END) - 1,
                  MAX(ml)) AS lcp_len
  FROM pos GROUP BY domain, url, prev
)
SELECT d.domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(length(d.url)) AS BIGINT) AS total_chars,
       CAST(COALESCE((SELECT SUM(lcp_len) FROM lcp
                      WHERE lcp.domain = d.domain), 0) AS BIGINT)
         AS lcp_savings
FROM d GROUP BY d.domain
"""


def q_onboarding_paths(sf_dir: str):
    """Onboarding-order mining: each user's event types in FIRST-
    OCCURRENCE order joined into a path string, counted corpus-wide,
    top-10 by (count DESC, path). One user exchange builds paths
    locally; only (path, 1) partials combine; bounded top-k."""
    from ..functions.relational import grouped_agg, topk
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        firsts = df.drop_duplicates(["user_id", "event_type"],
                                    keep="first")
        paths = (firsts.groupby("user_id", sort=False)["event_type"]
                 .agg(">".join).rename("path").reset_index())
        out = (paths.groupby("path", sort=False).size()
               .rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype("int64")
        return out

    counts = grouped_agg(
        bucket_exchange(ev, ["user_id"], per_user, num_buckets=8),
        ["path"], {"n_users": ("n_users", "sum")}, num_buckets=4)
    return topk(counts, ["n_users", "path"], k=10,
                descending=[True, False])


SQL_ONBOARDING_PATHS = """
WITH f AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM f WHERE rn = 1 GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path
LIMIT 10
"""


def q_snapshots_per_url_hist(sf_dir: str):
    """Crawl-depth distribution: COUNT-OF-COUNTS — how many urls have k
    snapshots. Two tiny combines (per-url counts, then the histogram);
    double aggregation never touches page payloads."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("url", sort=False).size()
               .rename("n_snaps").reset_index())
        out["n_snaps"] = out["n_snaps"].astype("int64")
        return out

    per_url = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                          ["url"], {"n_snaps": ("n_snaps", "sum")},
                          num_buckets=8)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("n_snaps", sort=False).size()
               .rename("n_urls").reset_index())
        return out.astype({"n_snaps": "int64", "n_urls": "int64"})

    return grouped_agg(per_url.map_batches(hist, batch_format="pandas"),
                       ["n_snaps"], {"n_urls": ("n_urls", "sum")},
                       num_buckets=2)


SQL_SNAPSHOTS_PER_URL = f"""
WITH c AS (
  SELECT url, CAST(COUNT(*) AS BIGINT) AS n_snaps
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  GROUP BY url
)
SELECT n_snaps, CAST(COUNT(*) AS BIGINT) AS n_urls
FROM c GROUP BY n_snaps
"""


def q_session_length_hist(sf_dir: str):
    """Session-depth distribution: histogram of events-per-session —
    the engagement shape sessionization feeds into sizing decisions.
    Sessions derive in the same fused sorted user pass as sessionize
    (gap > 30 min); only (length, 1) partials leave the exchange."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    GAP_US = SESSION_GAP_S * 1_000_000

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        df = df.assign(t_us=t_us)
        prev = df.groupby("user_id", sort=False)["t_us"].shift(1)
        new_sess = (prev.isna()
                    | ((df["t_us"] - prev) > GAP_US)).to_numpy()
        sess_id = np.cumsum(new_sess)
        lens = np.bincount(sess_id)[1:]
        out = (pd.DataFrame({"session_len": lens[lens > 0]})
               .groupby("session_len").size().rename("n_sessions")
               .reset_index())
        return out.astype({"session_len": "int64", "n_sessions": "int64"})

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    return grouped_agg(partials, ["session_len"],
                       {"n_sessions": ("n_sessions", "sum")}, num_buckets=2)


SQL_SESSION_LENGTH_HIST = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w
                        > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
), lens AS (
  SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS session_len
  FROM numbered GROUP BY user_id, sess
)
SELECT session_len, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM lens GROUP BY session_len
"""


def q_q6_revenue(sf_dir: str):
    """TPC-H Q6 shape — the forecast-revenue-change scan: one filtered
    pass over lineitem, revenue = Σ price·discount kept EXACT as
    cents × basis-points integer products (micro-cents BIGINT; the
    float product never exists on either side). Columns-pruned read,
    map-side partials, one single-row fold."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_extendedprice", "l_discount",
                             "l_quantity", "l_shipdate"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ship = df["l_shipdate"].to_numpy().astype("datetime64[ns]")
        yr = pd.DatetimeIndex(ship).year
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        bp = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                     ).astype(np.int64)
        qty = df["l_quantity"].to_numpy(np.float64)
        keep = ((yr == 1995) & (bp >= 5) & (bp <= 7) & (qty < 24))
        rev = (cents[keep] * bp[keep]).sum()
        return pd.DataFrame({"revenue_microcents": [np.int64(rev)],
                             "n_items": [np.int64(keep.sum())]})

    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "revenue_microcents": [np.int64(parts["revenue_microcents"]
                                        .sum())],
        "n_items": [np.int64(parts["n_items"].sum())]})


SQL_Q6_REVENUE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_microcents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE EXTRACT(year FROM l_shipdate) = 1995
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_value_bins_types(sf_dir: str):
    """Equal-width value histogram per event type INCLUDING empty bins
    (width 10, floor binning) — the fixed-axis chart feed where a
    missing bin must be an explicit zero. Partial counts map-side; the
    per-type densify explodes each type's own [min_bin, max_bin]
    vectorized in one exchange."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["event_type", "value"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = (np.floor(df["value"].to_numpy(np.float64) / 10)
             .astype(np.int64) * 10)
        out = (pd.DataFrame({"event_type": df["event_type"], "bin_lo": b})
               .groupby(["event_type", "bin_lo"], sort=False)
               .size().rename("cnt").reset_index())
        return out.astype({"bin_lo": "int64", "cnt": "int64"})

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "bin_lo"], {"cnt": ("cnt", "sum")},
                         num_buckets=8)

    def densify(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for etype, g in df.groupby("event_type", sort=False):
            bins = np.arange(g["bin_lo"].min(), g["bin_lo"].max() + 10,
                             10, dtype=np.int64)
            s = (g.set_index("bin_lo")["cnt"].reindex(bins, fill_value=0)
                 .astype("int64"))
            frames.append(pd.DataFrame({"event_type": etype,
                                        "bin_lo": bins,
                                        "cnt": s.to_numpy(np.int64)}))
        if not frames:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "bin_lo": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    return bucket_exchange(counts, ["event_type"], densify, num_buckets=4)


SQL_VALUE_BINS = """
WITH c AS (
  SELECT event_type,
         CAST(FLOOR(value / 10) AS BIGINT) * 10 AS bin_lo,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, bin_lo
), b AS (
  SELECT event_type, MIN(bin_lo) AS mn, MAX(bin_lo) AS mx FROM c
  GROUP BY event_type
), g AS (
  SELECT event_type, unnest(range(mn, mx + 10, 10)) AS bin_lo FROM b
)
SELECT g.event_type, CAST(g.bin_lo AS BIGINT) AS bin_lo,
       CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
FROM g LEFT JOIN c ON c.event_type = g.event_type
                  AND c.bin_lo = g.bin_lo
"""


def q_fulfillment_latency_hist(sf_dir: str):
    """Order-fulfillment latency: days from order date to the FIRST
    lineitem shipment, as a histogram — the operations SLA curve. One
    fact-fact hash join with the min-shipdate aggregation FUSED into
    the join reduce (joined rows never leave the task); the day-gap
    histogram is a tiny second combine."""
    from ..functions.relational import grouped_agg, hash_join

    DAY_US = 86_400_000_000

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"], num_blocks=8)
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"],
                        num_blocks=8).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")

    def post(df: pd.DataFrame) -> pd.DataFrame:
        ship = (df["l_shipdate"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000) // DAY_US
        odate = (df["o_orderdate"].to_numpy().astype("datetime64[ns]")
                 .astype(np.int64) // 1000) // DAY_US
        g = (pd.DataFrame({"k": df["l_orderkey"], "ship": ship,
                           "od": odate})
             .groupby("k", sort=False)
             .agg(first_ship=("ship", "min"), od=("od", "first")))
        gap = (g["first_ship"] - g["od"]).astype("int64")
        out = (pd.DataFrame({"gap_days": gap}).groupby("gap_days")
               .size().rename("n_orders").reset_index())
        return out.astype({"gap_days": "int64", "n_orders": "int64"})

    joined = hash_join(li, orders, on="l_orderkey", num_buckets=16,
                       post_fn=post)
    return grouped_agg(joined, ["gap_days"],
                       {"n_orders": ("n_orders", "sum")}, num_buckets=2)


SQL_FULFILLMENT_LATENCY = """
WITH f AS (
  SELECT l.l_orderkey,
         MIN(epoch_us(l.l_shipdate) // 86400000000)
           - MIN(epoch_us(o.o_orderdate) // 86400000000) AS gap_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_orderkey
)
SELECT CAST(gap_days AS BIGINT) AS gap_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM f GROUP BY gap_days
"""


def q_sentence_stats_docs(sf_dir: str):
    """Per-doc sentence statistics: sentence count (RE2-safe
    '[.!?] ' split — python re.split and DuckDB regexp_split_to_array
    agree segment-for-segment, verified incl. empty segments) and
    token count. Zero shuffle; compiled regex, vectorized str ops."""
    import re

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)
    pat = re.compile(r"[.!?] ")

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_sent = text.str.split(pat, regex=True).str.len().to_numpy(
            np.int64)
        n_tok = text.str.split(" ").str.len().to_numpy(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_sentences": n_sent,
                             "n_tokens": n_tok})

    return docs.map_batches(stats, batch_format="pandas")


SQL_SENTENCE_STATS = """
SELECT doc_id,
       CAST(length(regexp_split_to_array(COALESCE(text, ''), '[.!?] '))
            AS BIGINT) AS n_sentences,
       CAST(length(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
         AS n_tokens
FROM documents
"""


def q_bucket_skew_report(sf_dir: str):
    """Skew DIAGNOSTICS for a planned 32-way url partitioning: per
    md5-hash bucket, row count plus a hot flag where bucket·32 >
    2·total (count > 2× the mean, exact cross-multiplied). The same
    report an operator runs before choosing salting — and md5 routing
    replays verbatim in SQL."""
    import hashlib

    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:8], 16)
             for u in df["url"]), dtype=np.int64, count=len(df))
        out = (pd.DataFrame({"bucket": h % 32}).groupby("bucket")
               .size().rename("n_rows").reset_index())
        return out.astype({"bucket": "int64", "n_rows": "int64"})

    counts = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                         ["bucket"], {"n_rows": ("n_rows", "sum")},
                         num_buckets=2).materialize()
    total = int(counts.sum("n_rows"))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_rows"].to_numpy(np.int64)
        return df.assign(is_hot=(n * 32 > 2 * total))

    return counts.map_batches(flag, batch_format="pandas")


SQL_BUCKET_SKEW = f"""
WITH b AS (
  SELECT CAST(CONCAT('0x', substring(md5(url), 1, 8)) AS BIGINT) % 32
           AS bucket
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), c AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows FROM b
  GROUP BY bucket
)
SELECT bucket, n_rows,
       n_rows * 32 > 2 * (SELECT SUM(n_rows) FROM c) AS is_hot
FROM c
"""


def q_region_priority_grid(sf_dir: str):
    """Coverage GRID: orders per (customer region × order priority),
    including explicit zero cells — the completeness matrix a
    dashboard pivots. Customer→nation→region broadcast driver-side
    (tiny dims); the full cell grid derives from the same broadcast,
    so absent combinations surface as zeros instead of missing rows."""
    from ..functions.relational import grouped_agg

    cust = read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nat = read_small(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    reg = read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    nat_to_reg = (nat.merge(reg, left_on="n_regionkey",
                            right_on="r_regionkey")
                  .set_index("n_nationkey")["r_name"].to_dict())
    cust_to_reg = {int(c): nat_to_reg[int(n)]
                   for c, n in zip(cust["c_custkey"], cust["c_nationkey"])}
    all_regions = sorted(reg["r_name"])

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority"],
                        num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        r = df["o_custkey"].map(cust_to_reg)
        out = (pd.DataFrame({"r_name": r,
                             "o_orderpriority": df["o_orderpriority"]})
               .groupby(["r_name", "o_orderpriority"], sort=False)
               .size().rename("n_orders").reset_index())
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    counts = (grouped_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["r_name", "o_orderpriority"], {"n_orders": ("n_orders", "sum")},
        num_buckets=4).to_pandas())

    all_prios = sorted(counts["o_orderpriority"].unique())
    grid = pd.MultiIndex.from_product(
        [all_regions, all_prios], names=["r_name", "o_orderpriority"])
    out = (counts.set_index(["r_name", "o_orderpriority"])["n_orders"]
           .reindex(grid, fill_value=0).astype("int64").reset_index())
    return out


SQL_REGION_PRIORITY_GRID = """
WITH c AS (
  SELECT r.r_name, o.o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o
  JOIN customer cu ON cu.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = cu.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, o.o_orderpriority
), g AS (
  SELECT r.r_name, p.o_orderpriority
  FROM (SELECT DISTINCT r_name FROM region) r
  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
)
SELECT g.r_name, g.o_orderpriority,
       CAST(COALESCE(c.n_orders, 0) AS BIGINT) AS n_orders
FROM g LEFT JOIN c ON c.r_name = g.r_name
                  AND c.o_orderpriority = g.o_orderpriority
"""


def q_twap_users(sf_dir: str):
    """Time-weighted average VALUE sufficient stats per user (each
    event's value held until the next event — the TWAP/e-commerce
    exposure feature): Σ cents·Δt_µs and Σ Δt_µs as exact BIGINTs, the
    weighted mean being the consumer's one division. One user
    exchange; last events (no successor) drop on both sides. int64
    holds ~400× the sf0.1 per-user maximum (2.2e16); ship python-int
    strings (the fit_standardizer pattern) past ~10¹⁸."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        cents = np.rint(df["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        df = df.assign(t_us=t_us, cents=cents)
        nxt = df.groupby("user_id", sort=False)["t_us"].shift(-1)
        dt = (nxt - df["t_us"])
        keep = dt.notna()
        dt_i = dt[keep].astype(np.int64)
        out = pd.DataFrame({
            "user_id": df["user_id"][keep].to_numpy(np.int64),
            "sum_cdt": (df["cents"][keep] * dt_i).to_numpy(np.int64),
            "sum_dt": dt_i.to_numpy(np.int64),
            "n": np.int64(1),
        })
        return (out.groupby("user_id", sort=False)
                .agg(n=("n", "sum"), sum_cdt=("sum_cdt", "sum"),
                     sum_dt=("sum_dt", "sum"))
                .astype("int64").reset_index())

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_TWAP_USERS = """
WITH t AS (
  SELECT user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS dt
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents * dt) AS BIGINT) AS sum_cdt,
       CAST(SUM(dt) AS BIGINT) AS sum_dt
FROM t WHERE dt IS NOT NULL
GROUP BY user_id
"""


def q_domain_lang_gini(sf_dir: str):
    """Language CONCENTRATION per domain as the exact rational pair
    (Σn_lang², n_total²) — Gini impurity 1−Σp² without a single float
    (the libm-free diversity metric again, now over the crawl). One
    tiny (domain, lang) combine then a per-domain fold."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "lang"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"].notna()]  # NULL langs excluded on BOTH sides
        dom = (df["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        out = (pd.DataFrame({"domain": dom, "lang": df["lang"]})
               .groupby(["domain", "lang"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    dl = grouped_agg(ds.map_batches(partial, batch_format="pandas"),
                     ["domain", "lang"], {"n": ("n", "sum")},
                     num_buckets=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("domain", sort=False)["n"]
        out = pd.DataFrame({
            "n_pages": g.sum().astype("int64"),
            "sum_sq": g.apply(lambda s: int((s.to_numpy(np.int64) ** 2)
                                            .sum())).astype("int64"),
        }).reset_index()
        return out

    return bucket_exchange(dl, ["domain"], fold, num_buckets=4)


SQL_DOMAIN_LANG_GINI = f"""
WITH c AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain, lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE lang IS NOT NULL
  GROUP BY domain, lang
)
SELECT domain,
       CAST(SUM(n) AS BIGINT) AS n_pages,
       CAST(SUM(n * n) AS BIGINT) AS sum_sq
FROM c GROUP BY domain
"""


def q_type_coverage_masks(sf_dir: str):
    """Feature-completeness BITMASKS: each user's set of event types as
    an integer mask (bit i = i-th type in sorted order), counted per
    mask — the one-glance answer to "which behavioral segments
    exist?". The type→bit map is a tiny broadcast (sorted distinct
    types); masks OR together inside one user exchange."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"],
                    num_blocks=8).materialize()

    types = sorted(ev.map_batches(
        lambda df: df[["event_type"]].drop_duplicates(),
        batch_format="pandas").to_pandas()["event_type"].unique())
    bit = {t: np.int64(1) << i for i, t in enumerate(types)}

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].map(bit).astype("int64")
        masks = (pd.DataFrame({"user_id": df["user_id"]
                               .to_numpy(np.int64), "m": m})
                 .groupby("user_id", sort=False)["m"]
                 .agg(lambda s: int(np.bitwise_or.reduce(
                     s.to_numpy(np.int64)))))
        out = (masks.rename("mask").reset_index()
               .groupby("mask", sort=False).size()
               .rename("n_users").reset_index())
        return out.astype({"mask": "int64", "n_users": "int64"})

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    return grouped_agg(partials, ["mask"],
                       {"n_users": ("n_users", "sum")}, num_buckets=2)


SQL_TYPE_COVERAGE_MASKS = """
WITH b AS (
  SELECT event_type,
         ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS bit
  FROM (SELECT DISTINCT event_type FROM events)
), m AS (
  SELECT e.user_id,
         SUM(DISTINCT CAST(1 AS BIGINT) << CAST(b.bit AS INTEGER))
           AS mask
  FROM events e JOIN b USING (event_type)
  GROUP BY e.user_id
)
SELECT CAST(mask AS BIGINT) AS mask,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM m GROUP BY mask
"""


def q_gap_quartiles_types(sf_dir: str):
    """Inter-event gap quartiles per event type (gap attributed to the
    EARLIER event's type — the dwell distribution behind rate-limit and
    timeout tuning). Two exchanges: the user pass derives µs gaps, the
    type pass selects exact quantile_disc ranks (ceil(q·n)−1) from one
    sort per type. Integer µs end to end."""
    from ..stages.partition import bucket_exchange

    QS = [0.25, 0.5, 0.75]

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        df = df.assign(t_us=t_us)
        nxt = df.groupby("user_id", sort=False)["t_us"].shift(-1)
        gap = nxt - df["t_us"]
        keep = gap.notna()
        return pd.DataFrame({
            "event_type": df["event_type"][keep].to_numpy(object),
            "gap_us": gap[keep].astype(np.int64)})

    gaps = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            v = np.sort(g["gap_us"].to_numpy(np.int64))
            for q in QS:
                rows.append((etype, q,
                             v[min(int(np.ceil(q * len(v))) - 1,
                                   len(v) - 1)]))
        return pd.DataFrame(rows, columns=["event_type", "q", "gap_us"]
                            ).astype({"q": "float64", "gap_us": "int64"})

    return bucket_exchange(gaps, ["event_type"], per_type, num_buckets=4)


SQL_GAP_QUARTILES = """
WITH g AS (
  SELECT event_type,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
)
SELECT event_type,
       unnest([0.25, 0.5, 0.75]) AS q,
       unnest(quantile_disc(gap_us, [0.25, 0.5, 0.75])) AS gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


def q_next_type_recs(sf_dir: str):
    """Next-event RECOMMENDATION baseline: for each type, the most
    frequent immediate successor (Markov argmax; count DESC, type
    tiebreak). Rides the transition-count machinery, then a grouped
    top-1 — the classic counts→policy reduction."""
    from ..functions.relational import grouped_topk

    trans = q_transition_counts(sf_dir)
    return grouped_topk(trans, ["prev_type"], "n", k=1, descending=True,
                        tiebreak=["event_type"], num_buckets=2)


SQL_NEXT_TYPE_RECS = """
WITH t AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), c AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM t WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
                               ORDER BY n DESC, event_type) AS rn
  FROM c
) WHERE rn = 1
"""


def q_domain_bytes(sf_dir: str):
    """Storage accounting over the BINARY column: per domain, total
    html bytes, page count and max page size — the crawl-cost model
    input. Byte lengths vectorize map-side (bytes never re-shuffle);
    OCTET_LENGTH is the SQL twin."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "html"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dom = (df["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        nb = np.fromiter((len(h) if h is not None else 0
                          for h in df["html"]),
                         dtype=np.int64, count=len(df))
        out = (pd.DataFrame({"domain": dom, "nb": nb})
               .groupby("domain", sort=False)["nb"]
               .agg(n_pages="size", total_bytes="sum",
                    max_bytes="max").astype("int64").reset_index())
        return out

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["domain"],
        {"n_pages": ("n_pages", "sum"),
         "total_bytes": ("total_bytes", "sum"),
         "max_bytes": ("max_bytes", "max")},
        num_buckets=4)


SQL_DOMAIN_BYTES = f"""
SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(COALESCE(OCTET_LENGTH(html), 0)) AS BIGINT)
         AS total_bytes,
       CAST(MAX(COALESCE(OCTET_LENGTH(html), 0)) AS BIGINT)
         AS max_bytes
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
GROUP BY domain
"""


def q_weekend_share_types(sf_dir: str):
    """Weekday/weekend split per event type — the coarse seasonality
    contrast. Day-of-week derives arithmetically from the epoch day
    ((day+4) % 7 with 0=Monday — no calendar library, no timezone),
    identically on both engines. Map-side partials, one tiny
    combine."""
    from ..functions.relational import grouped_agg

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        dow = ((t_us // DAY_US) + 4) % 7  # 0=Monday
        wk = (dow >= 5).astype(np.int64)
        out = (pd.DataFrame({"event_type": df["event_type"],
                             "is_weekend": wk, "n": np.int64(1)})
               .groupby(["event_type"], sort=False)
               .agg(n_events=("n", "sum"), n_weekend=("is_weekend", "sum"))
               .astype("int64").reset_index())
        return out

    return grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"n_events": ("n_events", "sum"),
         "n_weekend": ("n_weekend", "sum")},
        num_buckets=2)


SQL_WEEKEND_SHARE = """
WITH t AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN dow >= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_weekend
FROM t GROUP BY event_type
"""


def q_top_count_swings(sf_dir: str):
    """Anomaly shortlist: the 10 largest day-over-day count swings
    across all (type, day) cells of the DENSE daily series (gap days
    are explicit zeros, so a type going quiet registers as a negative
    swing instead of a missing row). Integer deltas, |Δ| DESC with
    (type, day) tiebreak — engines cannot disagree on an integer
    argsort."""
    from ..functions.relational import grouped_agg, topk
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        out = (pd.DataFrame({"event_type": df["event_type"],
                             "day": t_us // DAY_US})
               .groupby(["event_type", "day"], sort=False)
               .size().rename("cnt").reset_index())
        return out.astype({"day": "int64", "cnt": "int64"})

    counts = grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                         ["event_type", "day"], {"cnt": ("cnt", "sum")},
                         num_buckets=8)

    def swings(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for etype, g in df.groupby("event_type", sort=False):
            days = np.arange(g["day"].min(), g["day"].max() + 1,
                             dtype=np.int64)
            c = (g.set_index("day")["cnt"].reindex(days, fill_value=0)
                 .to_numpy(np.int64))
            if len(c) < 2:
                continue
            delta = c[1:] - c[:-1]
            frames.append(pd.DataFrame({
                "event_type": etype,
                "day_start": days[1:] * 86400,
                "delta": delta,
                "abs_delta": np.abs(delta)}))
        if not frames:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "day_start": pd.Series([], dtype="int64"),
                "delta": pd.Series([], dtype="int64"),
                "abs_delta": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    deltas = bucket_exchange(counts, ["event_type"], swings, num_buckets=4)
    out = topk(deltas, ["abs_delta", "event_type", "day_start"], k=10,
               descending=[True, False, False])
    return out.map_batches(
        lambda df: df[["event_type", "day_start", "delta"]],
        batch_format="pandas")


SQL_TOP_COUNT_SWINGS = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, day
), b AS (
  SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM c
  GROUP BY event_type
), g AS (
  SELECT event_type, unnest(range(mn, mx + 1)) AS day FROM b
), dense AS (
  SELECT g.event_type, g.day, COALESCE(c.cnt, 0) AS cnt
  FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.day = g.day
), d AS (
  SELECT event_type, CAST(day * 86400 AS BIGINT) AS day_start,
         CAST(cnt - LAG(cnt) OVER (PARTITION BY event_type
                                   ORDER BY day) AS BIGINT) AS delta
  FROM dense
)
SELECT event_type, day_start, delta
FROM d WHERE delta IS NOT NULL
ORDER BY ABS(delta) DESC, event_type, day_start
LIMIT 10
"""


def q_value_extremes_daily(sf_dir: str):
    """Daily value EXTREMES (min/max/count) — the monitoring floor
    every metrics pipeline ships. Min/max are comparisons, not
    arithmetic, so floats hash-compare exactly; map-side partials,
    one tiny day combine."""
    from ..functions.relational import grouped_agg

    DAY_US = 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["ts", "value"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        day = (t_us // DAY_US) * 86400
        out = (pd.DataFrame({"day_start": day, "value": df["value"]})
               .groupby("day_start", sort=False)["value"]
               .agg(n_events="size", min_value="min", max_value="max")
               .reset_index())
        out["day_start"] = out["day_start"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["day_start"],
        {"n_events": ("n_events", "sum"),
         "min_value": ("min_value", "min"),
         "max_value": ("max_value", "max")},
        num_buckets=2)


SQL_VALUE_EXTREMES_DAILY = """
SELECT CAST(epoch_us(ts) // 86400000000 * 86400 AS BIGINT) AS day_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY day_start
"""


def q_user_lifespan_stats(sf_dir: str):
    """Per-user LIFESPAN: first/last event µs, active span and event
    count — the tenure feature underneath every cohort split. One
    map-side partial pass + one tiny user combine (min/max/count all
    decomposable)."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t_us = (df["ts"].to_numpy().astype("datetime64[ns]")
                .astype(np.int64) // 1000)
        out = (pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                             "first_us": t_us, "last_us": t_us,
                             "n": np.int64(1)})
               .groupby("user_id", sort=False)
               .agg(first_us=("first_us", "min"),
                    last_us=("last_us", "max"), n_events=("n", "sum"))
               .astype("int64").reset_index())
        return out

    agg = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        {"first_us": ("first_us", "min"), "last_us": ("last_us", "max"),
         "n_events": ("n_events", "sum")},
        num_buckets=8)
    return agg.map_batches(
        lambda df: df.assign(
            span_us=(df["last_us"] - df["first_us"]).astype("int64")),
        batch_format="pandas")


SQL_USER_LIFESPAN = """
SELECT user_id,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us
FROM events GROUP BY user_id
"""


# ============================================================= round 5


def q_inlink_stats(sf_dir: str):
    """Inbound-link AUTHORITY rollup per link target: total inlinks,
    follow-rel inlinks, and exact depth sufficient statistics
    (sum + non-null count — division stays downstream so the rollup is
    decomposable) from every snapshot's meta links. Links explode
    map-side into per-batch partials; only the per-target partial rows
    shuffle — the raw link stream never does."""
    import json as _json

    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["meta"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dst, follow, depth = [], [], []
        for meta in df["meta"]:
            if not meta:
                continue
            for lk in _json.loads(meta).get("links") or []:
                h = lk.get("href")
                if not h:
                    continue
                dst.append(h)
                follow.append(1 if lk.get("rel") == "follow" else 0)
                depth.append(lk.get("depth"))
        out = pd.DataFrame({
            "dst": pd.Series(dst, dtype=object),
            "follow": pd.Series(follow, dtype="int64"),
            # link depths are small integers (exact as float64 in any
            # summation order); pandas sum treats the nulls as 0, which
            # the oracle mirrors with COALESCE(SUM(..), 0)
            "depth": pd.Series(depth, dtype="float64"),
        })
        if out.empty:
            return pd.DataFrame({
                "dst": pd.Series([], dtype=object),
                "n_inlinks": pd.Series([], dtype="int64"),
                "n_follow": pd.Series([], dtype="int64"),
                "depth_sum": pd.Series([], dtype="float64"),
                "n_depth": pd.Series([], dtype="int64"),
            })
        g = (out.groupby("dst", sort=False)
             .agg(n_inlinks=("follow", "size"), n_follow=("follow", "sum"),
                  depth_sum=("depth", "sum"), n_depth=("depth", "count"))
             .reset_index())
        g["n_inlinks"] = g["n_inlinks"].astype("int64")
        g["n_depth"] = g["n_depth"].astype("int64")
        return g

    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"), ["dst"],
        {"n_inlinks": ("n_inlinks", "sum"), "n_follow": ("n_follow", "sum"),
         "depth_sum": ("depth_sum", "sum"), "n_depth": ("n_depth", "sum")},
        num_buckets=8)


SQL_INLINK_STATS = f"""
WITH l AS (
  SELECT unnest(CAST(json_extract(meta, '$.links') AS JSON[])) AS link
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
)
SELECT json_extract_string(link, '$.href') AS dst,
       CAST(COUNT(*) AS BIGINT) AS n_inlinks,
       CAST(SUM(CASE WHEN json_extract_string(link, '$.rel') = 'follow'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_follow,
       COALESCE(SUM(TRY_CAST(json_extract_string(link, '$.depth')
                             AS DOUBLE)), 0) AS depth_sum,
       CAST(COUNT(TRY_CAST(json_extract_string(link, '$.depth')
                           AS DOUBLE)) AS BIGINT) AS n_depth
FROM l WHERE json_extract_string(link, '$.href') IS NOT NULL
GROUP BY dst
"""


LEN_BUCKET_W = 256
LEN_BATCH_B = 32


def q_length_batches_docs(sf_dir: str):
    """Sequence-length-bucketed BATCH ASSIGNMENT (training batching:
    same-length docs batch together to minimize padding): docs bucket by
    ``n_chars // 256``; within a bucket docs order by doc_id and pack
    into fixed batches of 32 (the tail batch stays short). ONE exchange
    routed by the bucket id; distinct small-domain bucket ids can
    hash-collide into one task, so the kernel re-groups by bucket
    internally (round-3 fact). All-integer — SQL-exact."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "len_bucket": (df["n_chars"] // LEN_BUCKET_W).astype("int64"),
        })

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["len_bucket", "doc_id"],
                            kind="mergesort").reset_index(drop=True)
        r = df.groupby("len_bucket", sort=False).cumcount()
        df["batch_id"] = (r // LEN_BATCH_B).astype("int64")
        df["pos_in_batch"] = (r % LEN_BATCH_B).astype("int64")
        return df

    return bucket_exchange(docs.map_batches(tag, batch_format="pandas"),
                           ["len_bucket"], pack, 8)


SQL_LENGTH_BATCHES = f"""
WITH r AS (
  SELECT doc_id, n_chars // {LEN_BUCKET_W} AS len_bucket,
         ROW_NUMBER() OVER (PARTITION BY n_chars // {LEN_BUCKET_W}
                            ORDER BY doc_id) - 1 AS rk
  FROM documents
)
SELECT doc_id, len_bucket,
       CAST(rk // {LEN_BATCH_B} AS BIGINT) AS batch_id,
       CAST(rk % {LEN_BATCH_B} AS BIGINT) AS pos_in_batch
FROM r
"""


def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape — shipping volume between supplier and customer
    nations per year. Both nation dimensions broadcast (supplier⋈nation
    and customer⋈nation merged driver-side, shipped once via ray.put);
    the only big exchange is the lineitem⋈orders hash join, with the
    (supp_nation, cust_nation, yr) rollup fused INSIDE each reduce task
    (post_fn) so joined rows never leave the join task. Revenue is kept
    exact as cents × (100 − basis-points) integer micro-cents."""
    from ..functions.relational import broadcast_join, grouped_agg, hash_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount", "l_shipdate"],
                    num_blocks=8)
    sup = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp_dim = sup.merge(nation, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"s_suppkey": "l_suppkey", "n_name": "supp_nation"})
    cust_dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ].rename(columns={"c_custkey": "o_custkey", "n_name": "cust_nation"})

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        yr = df["l_shipdate"].dt.year.to_numpy(np.int64)
        keep = (yr >= 1995) & (yr <= 1996)
        df = df[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        bp = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                     ).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "supp_nation": df["supp_nation"].to_numpy(),
            "yr": yr[keep],
            "mc": cents * (100 - bp),
        })

    li_side = broadcast_join(li, supp_dim, on="l_suppkey").map_batches(
        prep_li, batch_format="pandas")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8)
    orders_side = broadcast_join(orders, cust_dim, on="o_custkey").map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"})[
            ["l_orderkey", "cust_nation"]],
        batch_format="pandas")

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["supp_nation"] != df["cust_nation"]]
        out = (df.groupby(["supp_nation", "cust_nation", "yr"], sort=False)
               .agg(revenue_microcents=("mc", "sum"), n_items=("mc", "size"))
               .reset_index())
        out["revenue_microcents"] = out["revenue_microcents"].astype("int64")
        out["n_items"] = out["n_items"].astype("int64")
        return out

    joined = hash_join(li_side, orders_side, on="l_orderkey", post_fn=rollup,
                       num_buckets=16)
    final = grouped_agg(joined, ["supp_nation", "cust_nation", "yr"], {
        "revenue_microcents": ("revenue_microcents", "sum"),
        "n_items": ("n_items", "sum"),
    }, num_buckets=4)
    return final.map_batches(
        lambda df: df.assign(
            revenue_microcents=df["revenue_microcents"].astype("int64"),
            n_items=df["n_items"].astype("int64")),
        batch_format="pandas")


SQL_NATION_TRADE_VOLUME = """
SELECT supp_nation, cust_nation, yr,
       CAST(SUM(mc) AS BIGINT) AS revenue_microcents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS mc
  FROM lineitem
  JOIN orders   ON l_orderkey  = o_orderkey
  JOIN supplier ON l_suppkey   = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE EXTRACT(year FROM l_shipdate) BETWEEN 1995 AND 1996
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, yr
"""


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape — one supplier nation's share of PROMO-part revenue
    sold to one customer region, per year. The share is reported in
    RATIONAL form (numerator + denominator micro-cent BIGINTs) so no
    cross-engine float division exists; part/supplier/customer-region
    dimensions broadcast, lineitem⋈orders is the one big exchange with
    the conditional rollup fused into the reduce tasks."""
    from ..functions.relational import broadcast_join, grouped_agg, hash_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount", "l_shipdate"],
                    num_blocks=8)
    part = read_small(sf_dir, "part", columns=["p_partkey", "p_type"])
    promo = set(part.loc[part["p_type"] == "PROMO", "p_partkey"])
    sup = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = read_small(sf_dir, "nation",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    region = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp_dim = sup.merge(nation, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"s_suppkey": "l_suppkey", "n_name": "supp_nation"})
    cust_region = (cust.merge(nation, left_on="c_nationkey",
                              right_on="n_nationkey")
                   .merge(region, left_on="n_regionkey",
                          right_on="r_regionkey"))[["c_custkey", "r_name"]]
    target_cust = set(cust_region.loc[cust_region["r_name"] == "EUROPE",
                                      "c_custkey"])

    import ray

    promo_ref = ray.put(promo)

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["l_partkey"].isin(ray.get(promo_ref)).to_numpy()
        df = df[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        bp = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                     ).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "yr": df["l_shipdate"].dt.year.to_numpy(np.int64),
            "supp_nation": df["supp_nation"].to_numpy(),
            "mc": cents * (100 - bp),
        })

    li_side = broadcast_join(li, supp_dim, on="l_suppkey").map_batches(
        prep_li, batch_format="pandas")

    cust_ref = ray.put(target_cust)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8)

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["o_custkey"].isin(ray.get(cust_ref)).to_numpy()
        return pd.DataFrame(
            {"l_orderkey": df.loc[keep, "o_orderkey"].to_numpy(np.int64)})

    orders_side = orders.map_batches(prep_orders, batch_format="pandas")

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        num = df["mc"].where(df["supp_nation"] == "NATION_0", 0)
        out = (pd.DataFrame({"yr": df["yr"], "num": num, "den": df["mc"]})
               .groupby("yr", sort=False).agg(
                   num_microcents=("num", "sum"),
                   den_microcents=("den", "sum")).reset_index())
        out["num_microcents"] = out["num_microcents"].astype("int64")
        out["den_microcents"] = out["den_microcents"].astype("int64")
        return out

    joined = hash_join(li_side, orders_side, on="l_orderkey", post_fn=rollup,
                       num_buckets=16)
    final = grouped_agg(joined, ["yr"], {
        "num_microcents": ("num_microcents", "sum"),
        "den_microcents": ("den_microcents", "sum"),
    }, num_buckets=2)
    return final.map_batches(
        lambda df: df.assign(
            num_microcents=df["num_microcents"].astype("int64"),
            den_microcents=df["den_microcents"].astype("int64")),
        batch_format="pandas")


SQL_MARKET_SHARE = """
SELECT yr,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_0' THEN mc ELSE 0 END)
            AS BIGINT) AS num_microcents,
       CAST(SUM(mc) AS BIGINT) AS den_microcents
FROM (
  SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         n1.n_name AS supp_nation,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS mc
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
)
GROUP BY yr
"""


def q_order_count_hist(sf_dir: str):
    """TPC-H Q13 shape — distribution of customers by order count,
    INCLUDING the zero-order bucket. Orders aggregate per customer in one
    exchange; the histogram re-aggregates the ≤|customer| partials; the
    zero bucket is total-customers − customers-with-orders (dimension
    cardinality read driver-side — the only driver-side number)."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8)
    counts = grouped_agg(orders, ["o_custkey"],
                         {"n_orders": ("o_orderkey", "count")},
                         num_buckets=16)
    hist = grouped_agg(counts, ["n_orders"],
                       {"n_customers": ("o_custkey", "count")},
                       num_buckets=4).to_pandas()
    hist["n_orders"] = hist["n_orders"].astype("int64")
    hist["n_customers"] = hist["n_customers"].astype("int64")
    n_total = len(read_small(sf_dir, "customer", columns=["c_custkey"]))
    zero = n_total - int(hist["n_customers"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"n_orders": [np.int64(0)],
                                 "n_customers": [np.int64(zero)]})],
            ignore_index=True)
    return hist


SQL_ORDER_COUNT_HIST = """
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
"""


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape — for every order shipped by ≥2 distinct
    suppliers, the supplier who shipped LAST (latest l_shipdate, ties to
    the smallest suppkey) "kept the order waiting"; count wins per
    supplier. One exchange co-locates each order's lineitems; per-bucket
    winners emit ≤|suppliers| partial counts into a tiny second
    exchange."""
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_shipdate"],
                    num_blocks=8)

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        nsupp = df.groupby("l_orderkey", sort=False)["l_suppkey"].nunique()
        multi = nsupp[nsupp >= 2].index
        d = df[df["l_orderkey"].isin(multi)]
        if d.empty:
            return pd.DataFrame({"l_suppkey": pd.Series([], dtype="int64"),
                                 "n_orders_won": pd.Series([], dtype="int64")})
        d = d.sort_values(["l_orderkey", "l_shipdate", "l_suppkey"],
                          ascending=[True, False, True], kind="mergesort")
        w = d.drop_duplicates("l_orderkey", keep="first")
        out = (w.groupby("l_suppkey", sort=False).size()
               .rename("n_orders_won").reset_index())
        out["n_orders_won"] = out["n_orders_won"].astype("int64")
        return out

    partials = bucket_exchange(li, ["l_orderkey"], per_order, num_buckets=16)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("l_suppkey", sort=False)["n_orders_won"].sum()
               .astype("int64").reset_index())
        return out

    return bucket_exchange(partials, ["l_suppkey"], combine, num_buckets=4)


SQL_WAITING_SUPPLIERS = """
WITH ns AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS nsupp
  FROM lineitem GROUP BY l_orderkey
),
w AS (
  SELECT l_orderkey, l_suppkey,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_shipdate DESC, l_suppkey ASC) AS rn
  FROM lineitem
)
SELECT w.l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders_won
FROM w JOIN ns USING (l_orderkey)
WHERE rn = 1 AND nsupp >= 2
GROUP BY w.l_suppkey
"""


def q_dormant_rich_customers(sf_dir: str):
    """TPC-H Q22 shape — customers with above-average positive balance
    and NO orders since 2001 ("dormant rich"), rolled up by market
    segment. The mean threshold is carried as an exact integer-cents
    RATIONAL (acctbal_cents · count > total_cents — no float division on
    either side); active custkeys derive distributedly and anti-probe as
    a broadcast set."""
    from ..functions.relational import grouped_agg, semi_join

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_acctbal", "c_mktsegment"],
                      num_blocks=4)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        pos = cents[cents > 0]
        return pd.DataFrame({"s": [np.int64(pos.sum())],
                             "c": [np.int64(len(pos))]})

    folded = cust.map_batches(partial, batch_format="pandas").to_pandas()
    total_cents = int(folded["s"].sum())
    n_pos = int(folded["c"].sum())

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
                        num_blocks=8)
    recent = orders.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["o_orderdate"],
                             pd.Timestamp("2001-01-01"))).select(["o_custkey"]),
        batch_format="pyarrow")
    active = grouped_agg(recent, ["o_custkey"],
                         {"n": ("o_custkey", "count")},
                         num_buckets=8).to_pandas()[["o_custkey"]]
    active = active.rename(columns={"o_custkey": "c_custkey"})

    def rich(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["c_acctbal"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        keep = cents * n_pos > total_cents
        out = df[keep].copy()
        out["cents"] = cents[keep]
        return out[["c_custkey", "c_mktsegment", "cents"]]

    dormant = semi_join(cust.map_batches(rich, batch_format="pandas"),
                        active, on="c_custkey", anti=True)
    agg = grouped_agg(dormant, ["c_mktsegment"], {
        "n_customers": ("c_custkey", "count"),
        "balance_cents": ("cents", "sum"),
    }, num_buckets=2)
    return agg.map_batches(
        lambda df: df.assign(
            n_customers=df["n_customers"].astype("int64"),
            balance_cents=df["balance_cents"].astype("int64")),
        batch_format="pandas")


SQL_DORMANT_RICH = """
WITH t AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM customer WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
),
act AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS balance_cents
FROM customer, t
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * t.c > t.s
  AND c_custkey NOT IN (SELECT o_custkey FROM act)
GROUP BY c_mktsegment
"""


def q_trimmed_mean_segments(sf_dir: str):
    """Count-based two-sided trimmed aggregate: per market segment, drop
    the n//10 cheapest and n//10 priciest orders (ties broken by
    orderkey) and report the surviving total in EXACT integer cents plus
    the kept count (rational form — no float mean crosses engines). The
    segment dimension broadcasts onto orders; each segment's rows
    co-locate in one exchange and the trim is a per-segment in-kernel
    sort (segments are a tiny domain, so the kernel groups by segment
    INSIDE the bucket frame — hashed small domains collide buckets)."""
    from ..functions.relational import broadcast_join
    from ..stages.partition import bucket_exchange

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"],
                        num_blocks=8)
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename(columns={"c_custkey": "o_custkey", "c_mktsegment": "seg"})
    joined = broadcast_join(orders, cust, on="o_custkey")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        return pd.DataFrame({"seg": df["seg"].to_numpy(),
                             "cents": cents,
                             "o_orderkey": df["o_orderkey"].to_numpy(np.int64)})

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seg, g in df.groupby("seg", sort=False):
            g = g.sort_values(["cents", "o_orderkey"], kind="mergesort")
            n = len(g)
            k = n // 10
            kept = g.iloc[k: n - k]
            rows.append((seg, np.int64(kept["cents"].sum()),
                         np.int64(len(kept))))
        return pd.DataFrame(rows, columns=["seg", "trimmed_sum_cents",
                                           "n_kept"])

    return bucket_exchange(joined.map_batches(prep, batch_format="pandas"),
                           ["seg"], trim, num_buckets=4)


SQL_TRIMMED_MEAN_SEGMENTS = """
WITH j AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT seg, cents,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM j
)
SELECT seg, CAST(SUM(cents) AS BIGINT) AS trimmed_sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM r WHERE rn > n // 10 AND rn <= n - n // 10
GROUP BY seg
"""


def q_followed_pairs(sf_dir: str):
    """Skip-gram event sequences: count of (type_a → type_b) pairs where
    b occurs 1–3 positions after a in the same user's (ts, event_id)
    order — the behavioral co-occurrence statistic beyond immediate
    transitions. One exchange co-locates per-user history; vectorized
    group-shift per gap; ≤|types|² partials combine in a tiny second
    exchange."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)["event_type"]
        parts = []
        for gap in (1, 2, 3):
            nxt = g.shift(-gap)
            pairs = pd.DataFrame({"type_a": df["event_type"], "type_b": nxt})
            parts.append(pairs[pairs["type_b"].notna()])
        out = (pd.concat(parts, ignore_index=True)
               .groupby(["type_a", "type_b"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["type_a", "type_b"], sort=False)["n"].sum()
                .astype("int64").reset_index())

    return bucket_exchange(partials, ["type_a", "type_b"], combine,
                           num_buckets=2)


SQL_FOLLOWED_PAIRS = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r a JOIN r b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn + 1 AND a.rn + 3
GROUP BY a.event_type, b.event_type
"""


def q_wau_daily(sf_dir: str):
    """Trailing-7-day active users (WAU) per observed day — the sliding
    COUNT(DISTINCT user) every analytics stack needs. Each user's
    distinct active days expand to the ≤7 observed days they cover
    (cover days filtered against the broadcast observed-day set); the
    exchange is keyed on user_id so a user contributes exactly once per
    cover day, and only (day, partial-count) pairs re-shuffle."""
    import ray

    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"], num_blocks=8)

    def to_days(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.divide(us, 86_400_000_000)
        return pa.table({"user_id": t["user_id"], "day": day})

    days_ds = ev.map_batches(to_days, batch_format="pyarrow")
    day_parts = days_ds.map_batches(
        lambda df: pd.DataFrame({"day": df["day"].unique()}),
        batch_format="pandas").to_pandas()
    day_set = set(day_parts["day"].astype("int64"))
    day_ref = ray.put(np.array(sorted(day_set), dtype=np.int64))

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        obs = ray.get(day_ref)
        d = df.drop_duplicates(["user_id", "day"])
        cover = pd.DataFrame({
            "user_id": np.repeat(d["user_id"].to_numpy(np.int64), 7),
            "day": (np.repeat(d["day"].to_numpy(np.int64), 7)
                    + np.tile(np.arange(7, dtype=np.int64), len(d))),
        })
        keep = cover["day"].isin(obs)
        cover = cover[keep].drop_duplicates()
        out = (cover.groupby("day", sort=False).size().rename("wau")
               .reset_index())
        out["wau"] = out["wau"].astype("int64")
        return out

    partials = bucket_exchange(days_ds, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("day", sort=False)["wau"].sum().astype("int64")
                .reset_index())

    return bucket_exchange(partials, ["day"], combine, num_buckets=4)


SQL_WAU_DAILY = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
  FROM events
),
days AS (SELECT DISTINCT d FROM act)
SELECT days.d AS day, CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS wau
FROM days JOIN act ON act.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d
"""


def q_join_size_by_type(sf_dir: str):
    """Exact self-join cardinality by key-degree products — the planner
    statistic |A ⋈_u B| = Σ_u deg_A(u)·deg_B(u), here per (type_a,
    type_b) pair of the events self-join on user_id. One exchange
    builds per-user type-count vectors; each kernel emits the in-bucket
    outer-product partials (≤|types|² rows) into a tiny combine — the
    quadratic join itself is never materialized."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        c = (df.groupby(["user_id", "event_type"], sort=False).size()
             .rename("n").reset_index())
        m = c.merge(c, on="user_id", suffixes=("_a", "_b"))
        out = (pd.DataFrame({
            "type_a": m["event_type_a"], "type_b": m["event_type_b"],
            "prod": m["n_a"].to_numpy(np.int64) * m["n_b"].to_numpy(np.int64),
        }).groupby(["type_a", "type_b"], sort=False)["prod"].sum()
            .rename("join_size").astype("int64").reset_index())
        return out

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["type_a", "type_b"], sort=False)["join_size"]
                .sum().astype("int64").reset_index())

    return bucket_exchange(partials, ["type_a", "type_b"], combine,
                           num_buckets=2)


SQL_JOIN_SIZE_BY_TYPE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(SUM(a.n * b.n) AS BIGINT) AS join_size
FROM c a JOIN c b ON a.user_id = b.user_id
GROUP BY a.event_type, b.event_type
"""


def q_trigram_diversity_docs(sf_dir: str):
    """Per-document character-trigram diversity (distinct trigrams vs
    total) — the cheap repetition/quality signal, reported as two exact
    BIGINTs (no float ratio crosses engines). Map-only: trigram codes
    are packed 21-bit codepoint triples counted with np.unique per row;
    codepoint semantics match DuckDB substring exactly."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        ids, totals, distincts = [], [], []
        for doc_id, text in zip(df["doc_id"].to_numpy(np.int64),
                                df["text"].to_numpy()):
            cp = np.frombuffer(str(text).encode("utf-32-le"), dtype=np.uint32
                               ).astype(np.int64)
            if len(cp) < 3:
                continue
            codes = (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
            ids.append(doc_id)
            totals.append(len(codes))
            distincts.append(len(np.unique(codes)))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_trigrams": pd.Series(totals, dtype="int64"),
            "n_distinct": pd.Series(distincts, dtype="int64"),
        })

    return docs.map_batches(stats, batch_format="pandas")


SQL_TRIGRAM_DIVERSITY = """
WITH t AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) - 1),
                               i -> substring(text, CAST(i AS INT), 3))) AS tri
  FROM documents WHERE length(text) >= 3
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(COUNT(DISTINCT tri) AS BIGINT) AS n_distinct
FROM t GROUP BY doc_id
"""


def q_clamped_balance_users(sf_dir: str):
    """Floor-at-zero running balance per user (credits minus purchase
    debits, lost withdrawals forfeited) — the classic inventory/wallet
    recursion, computed CLOSED-FORM as B_k = S_k − min(0, running-min
    S_j) so it stays one vectorized pass over each user's sorted
    history instead of an iterative loop. Cents stay exact BIGINTs."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type",
                             "value"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.rint(df["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        delta = np.where(df["event_type"].to_numpy() == "purchase",
                         -cents, cents)
        out_ids, out_bal = [], []
        for _, g in df.assign(_delta=delta).groupby("user_id", sort=False):
            s = g["_delta"].to_numpy(np.int64).cumsum()
            runmin = np.minimum.accumulate(s)
            bal = s - np.minimum(runmin, 0)
            out_ids.append(g["event_id"].to_numpy(np.int64))
            out_bal.append(bal)
        return pd.DataFrame({
            "event_id": np.concatenate(out_ids) if out_ids else
            np.array([], dtype=np.int64),
            "balance_cents": np.concatenate(out_bal) if out_bal else
            np.array([], dtype=np.int64),
        })

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_CLAMPED_BALANCE = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN -CAST(ROUND(value * 100) AS BIGINT)
              ELSE CAST(ROUND(value * 100) AS BIGINT) END AS delta
  FROM events
),
p AS (
  SELECT user_id, ts, event_id,
         SUM(delta) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS run
  FROM s
)
SELECT event_id,
       CAST(run - LEAST(0, MIN(run) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))
            AS BIGINT) AS balance_cents
FROM p
"""


def q_throttled_events(sf_dir: str):
    """Trailing-gap throttle (debounce): keep an event only if ≥30 min
    passed since the previous RAW event of the same (user, type) — the
    standard notification/rate-limit filter. LAG semantics (gap vs the
    previous raw event, not the previous kept one) keep it one
    vectorized group-diff; per-user histories co-locate in one
    exchange."""
    from ..stages.partition import bucket_exchange

    GAP_US = 30 * 60 * 1_000_000
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"],
                            kind="mergesort")
        us = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
        prev = (pd.Series(us.to_numpy(), index=df.index)
                .groupby([df["user_id"], df["event_type"]]).shift(1))
        keep = prev.isna() | ((us - prev) >= GAP_US)
        kept = df[keep.to_numpy()]
        return pd.DataFrame({
            "event_id": kept["event_id"].to_numpy(np.int64),
            "event_type": kept["event_type"].to_numpy(),
        })

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_THROTTLED_EVENTS = """
WITH g AS (
  SELECT event_id, event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT event_id, event_type
FROM g WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
"""


def q_knn_confusion(sf_dir: str):
    """1-NN label confusion matrix over int8-quantized embeddings — the
    embedding-quality eval. Quantization (per-vector max-abs scale,
    half-away rounding) is replayed identically in SQL, so squared-L2
    distances are INTEGER and the argmin (tiebreak smaller vec_id) is
    exact on both sides. Queries broadcast once as an int64 matrix;
    each batch emits one (query, best-key, label) partial via an int
    matmul; only 50×n_batches partial rows reach the driver."""
    import pyarrow.parquet as pq
    import ray

    def quantize(mat: np.ndarray) -> np.ndarray:
        xd = mat.astype(np.float64)
        scale = np.abs(xd).max(axis=1)
        safe = np.where(scale == 0, 1.0, scale)
        q = round_half_away((xd * 127.0) / safe[:, None], 0)
        q = np.clip(q, -127, 127)
        q[scale == 0] = 0
        return q.astype(np.int64)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"],
                      filters=[("vec_id", "<", 50)])
    qids = t["vec_id"].to_numpy()
    qlabels = t["label"].to_numpy().astype(np.int64)
    qmat = quantize(np.stack(t["embedding"].to_pylist()))
    qref = ray.put((qids, qmat))

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, mat = ray.get(qref)
        b = quantize(np.stack(df["embedding"].to_numpy()))
        vid = df["vec_id"].to_numpy(np.int64)
        lab = df["label"].to_numpy().astype(np.int64)
        # |q|^2 + |b|^2 - 2 q·b, all int64 — exact
        d = (np.square(mat).sum(axis=1)[:, None]
             + np.square(b).sum(axis=1)[None, :]
             - 2 * (mat @ b.T))
        key = (d << 32) | vid[None, :]
        # self-exclusion: a query never matches itself
        key = np.where(ids[:, None] == vid[None, :], np.iinfo(np.int64).max,
                       key)
        j = key.argmin(axis=1)
        return pd.DataFrame({
            "qid": ids.astype(np.int64),
            "key": key[np.arange(len(ids)), j],
            "pred_label": lab[j],
        })

    parts = emb.map_batches(partial, batch_format="pandas").to_pandas()
    best = (parts.sort_values(["qid", "key"], kind="mergesort")
            .drop_duplicates("qid", keep="first"))
    true_map = pd.Series(qlabels, index=qids)
    out = pd.DataFrame({
        "label_true": best["qid"].map(true_map).astype("int64"),
        "label_pred": best["pred_label"].astype("int64"),
    }).groupby(["label_true", "label_pred"], sort=False).size().rename(
        "n").astype("int64").reset_index()
    return out


SQL_KNN_CONFUSION = """
WITH s AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         list_aggregate(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE))), 'max')
           AS scale
  FROM embeddings
),
qz AS (
  SELECT vec_id, label,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                     -127) AS BIGINT) END)) AS q
  FROM s
),
d AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
         SUM((a.q - b.q) * (a.q - b.q)) AS dist
  FROM qz a JOIN qz b ON a.pos = b.pos AND b.vec_id <> a.vec_id
  WHERE a.vec_id < 50
  GROUP BY a.vec_id, b.vec_id
),
best AS (
  SELECT qid, vid,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vid) AS rn
  FROM d
)
SELECT CAST(eq.label AS BIGINT) AS label_true,
       CAST(ev.label AS BIGINT) AS label_pred,
       CAST(COUNT(*) AS BIGINT) AS n
FROM best
JOIN embeddings eq ON best.qid = eq.vec_id
JOIN embeddings ev ON best.vid = ev.vec_id
WHERE rn = 1
GROUP BY label_true, label_pred
"""


def q_degree_assortativity(sf_dir: str):
    """Directed degree-assortativity sufficient statistics of the
    URL-level web graph: per distinct (src→dst) edge (self-links
    dropped), x = out-degree(src), y = in-degree(dst); reports n, Σx,
    Σy, Σxy, Σx², Σy² as exact BIGINTs (the Pearson r is a client-side
    division — no float crosses engines). FULLY distributed: distinct
    edges and both degree tables are exchanges; degrees join back onto
    edges via two hash joins; only single-row partials reach the
    driver — nothing here is bounded-cardinality-dependent at 100 TB."""
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = _explode_hrefs(df)
        out = (pd.DataFrame({"src": pairs["url"], "dst": pairs["href"]})
               .drop_duplicates())
        return out[out["src"] != out["dst"]]

    # exchange 1 on src: ALL of a src's pairs co-locate, so global edge
    # dedup AND its out-degree happen in one kernel — no separate
    # degree table or join-back exchange
    def by_src(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["src", "dst"])
        dx = d.groupby("src", sort=False)["dst"].transform("size")
        return pd.DataFrame({"dst": d["dst"], "dx": dx.to_numpy(np.int64)})

    withdx = bucket_exchange(ds.map_batches(partial, batch_format="pandas"),
                             ["src"], by_src, num_buckets=8)

    # exchange 2 on dst: in-degree per dst in-kernel, then the whole
    # bucket folds to ONE partial row of sufficient statistics
    def by_dst(df: pd.DataFrame) -> pd.DataFrame:
        x = df["dx"].to_numpy(np.int64)
        y = (df.groupby("dst", sort=False)["dx"].transform("size")
             .to_numpy(np.int64))
        return pd.DataFrame({
            "n_edges": [np.int64(len(df))],
            "sum_x": [np.int64(x.sum())], "sum_y": [np.int64(y.sum())],
            "sum_xy": [np.int64((x * y).sum())],
            "sum_x2": [np.int64((x * x).sum())],
            "sum_y2": [np.int64((y * y).sum())],
        })

    parts = bucket_exchange(withdx, ["dst"], by_dst,
                            num_buckets=8).to_pandas()
    return pd.DataFrame({c: [np.int64(parts[c].sum())]
                         for c in ("n_edges", "sum_x", "sum_y", "sum_xy",
                                   "sum_x2", "sum_y2")})


SQL_DEGREE_ASSORT = f"""
WITH l AS (
  SELECT url, unnest(CAST(json_extract(meta, '$.links') AS JSON[]))
           AS link
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
),
edges AS (
  SELECT DISTINCT url AS src,
         json_extract_string(link, '$.href') AS dst
  FROM l WHERE json_extract_string(link, '$.href') IS NOT NULL
    AND url <> json_extract_string(link, '$.href')
),
o AS (SELECT src, COUNT(*) AS dx FROM edges GROUP BY src),
i AS (SELECT dst, COUNT(*) AS dy FROM edges GROUP BY dst)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(dx) AS BIGINT) AS sum_x,
       CAST(SUM(dy) AS BIGINT) AS sum_y,
       CAST(SUM(dx * dy) AS BIGINT) AS sum_xy,
       CAST(SUM(dx * dx) AS BIGINT) AS sum_x2,
       CAST(SUM(dy * dy) AS BIGINT) AS sum_y2
FROM edges JOIN o USING (src) JOIN i USING (dst)
"""


def q_unconverted_events(sf_dir: str):
    """Temporal anti-join: non-purchase events with NO purchase by the
    same user in the following 24 h, counted per type — the conversion
    failure funnel. One user-keyed exchange; inside the kernel each
    user's purchase timestamps form a sorted array and a two-sided
    searchsorted answers every event's EXISTS in O(log n) — no
    event×purchase pair materializes."""
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"], num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
        df = df.assign(_us=us.to_numpy())
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            p = np.sort(g.loc[g["event_type"] == "purchase", "_us"]
                        .to_numpy(np.int64))
            e = g[g["event_type"] != "purchase"]
            ts = e["_us"].to_numpy(np.int64)
            lo = np.searchsorted(p, ts, side="right")
            hi = np.searchsorted(p, ts + DAY_US, side="right")
            rows.append(e.loc[hi <= lo, ["event_type"]])
        if not rows:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "n_unconverted": pd.Series([], dtype="int64")})
        out = (pd.concat(rows).groupby("event_type", sort=False).size()
               .rename("n_unconverted").astype("int64").reset_index())
        return out

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("event_type", sort=False)["n_unconverted"].sum()
                .astype("int64").reset_index())

    return bucket_exchange(partials, ["event_type"], combine, num_buckets=2)


SQL_UNCONVERTED_EVENTS = """
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_unconverted
FROM events e
WHERE e.event_type <> 'purchase' AND NOT EXISTS (
  SELECT 1 FROM events p
  WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
    AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 24 HOUR
)
GROUP BY e.event_type
"""


def q_lang_profile_dots(sf_dir: str):
    """Exact cosine sufficient statistics between per-language unigram
    profiles: for every lang pair (a ≤ b, diagonal = squared norm) the
    INTEGER dot product Σ_w c_a(w)·c_b(w) of word-count vectors — the
    corpus-similarity matrix with no float crossing engines. Per-batch
    partial counts, one word-keyed exchange whose kernel emits
    ≤|langs|² partial dots, tiny combine."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["lang", "text"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"].notna() & df["text"].notna()]
        toks = df.assign(term=df["text"].str.split(" "))[
            ["lang", "term"]].explode("term")
        out = (toks.groupby(["lang", "term"], sort=False).size()
               .rename("n").astype("int64").reset_index())
        return out

    counts = grouped_agg(docs.map_batches(partial, batch_format="pandas"),
                         ["lang", "term"], {"n": ("n", "sum")},
                         num_buckets=8)

    def dots(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="term", suffixes=("_a", "_b"))
        m = m[m["lang_a"] <= m["lang_b"]]
        out = (pd.DataFrame({
            "lang_a": m["lang_a"], "lang_b": m["lang_b"],
            "prod": m["n_a"].to_numpy(np.int64) * m["n_b"].to_numpy(np.int64),
        }).groupby(["lang_a", "lang_b"], sort=False)["prod"].sum()
            .rename("dot").astype("int64").reset_index())
        return out

    partials = bucket_exchange(counts, ["term"], dots, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["lang_a", "lang_b"], sort=False)["dot"].sum()
                .astype("int64").reset_index())

    return bucket_exchange(partials, ["lang_a", "lang_b"], combine,
                           num_buckets=2)


SQL_LANG_PROFILE_DOTS = """
WITH c AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL)
  GROUP BY lang, term
)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(SUM(a.n * b.n) AS BIGINT) AS dot
FROM c a JOIN c b ON a.term = b.term AND a.lang <= b.lang
GROUP BY a.lang, b.lang
"""


def q_cheapest_supplier_per_part(sf_dir: str):
    """TPC-H Q2 shape — the minimum-unit-price supplier per part
    (argmin join-back). Unit price compares as the IEEE double
    cents/quantity — identical division on identical inputs on both
    sides — with a full deterministic tiebreak (suppkey, cents, qty).
    One part-keyed exchange; the kernel's sort-and-take-first emits one
    row per part."""
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice",
                             "l_quantity"],
                    num_blocks=8)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        unit = cents / df["l_quantity"].to_numpy(np.float64)
        d = pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
            "price_cents": cents,
            "l_quantity": df["l_quantity"].to_numpy(np.float64),
            "_unit": unit,
        })
        d = d.sort_values(["l_partkey", "_unit", "l_suppkey", "price_cents",
                           "l_quantity"], kind="mergesort")
        return d.drop_duplicates("l_partkey", keep="first").drop(
            columns=["_unit"])

    return bucket_exchange(li, ["l_partkey"], per_part, num_buckets=16)


SQL_CHEAPEST_SUPPLIER = """
WITH r AS (
  SELECT l_partkey, l_suppkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         l_quantity,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      / l_quantity,
                    l_suppkey,
                    CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                    l_quantity) AS rn
  FROM lineitem
)
SELECT l_partkey, l_suppkey, price_cents, l_quantity FROM r WHERE rn = 1
"""


def q_curate_pages(sf_dir: str):
    """END-TO-END crawl curation: robots disallow filter → golden-record
    survivorship per url (latest non-null text/lang, text tiebreak on
    tied warc_ts) → quality gate (length ≥ 100 AND space share ≥ 5 %,
    integer cross-multiplied). The composed SQL oracle pins every stage
    interaction, like curate_docs does for the documents corpus. Robots
    rules broadcast map-side; one url-keyed exchange total."""
    from ..stages.partition import BUCKET_COL, bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir,
                            columns=["url", "warc_ts", "text", "lang"],
                            override_num_blocks=16)
    rules = ROBOTS_RULES

    def allowed(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.split("//", n=1).str[1]
        host = rest.str.split("/", n=1).str[0]
        path = "/" + rest.str.split("/", n=1).str[1].fillna("")
        blocked = pd.Series(False, index=df.index)
        for rhost, rprefix in rules:
            blocked |= (host == rhost) & path.str.startswith(rprefix)
        return df[~blocked]

    def golden_and_gate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        df = df.sort_values(["url", "warc_ts", "text"], kind="mergesort",
                            na_position="last")
        g = df.groupby("url", sort=False)
        df = df.assign(
            golden_text=g["text"].ffill(),
            golden_lang=g["lang"].ffill(),
            n_snapshots=g.cumcount() + 1,
        )
        out = df.groupby("url", sort=False).tail(1)
        out = out.rename(columns={"warc_ts": "last_ts"})
        out = out[out["golden_text"].notna()]
        n_chars = out["golden_text"].str.len().to_numpy(np.int64)
        n_spaces = out["golden_text"].str.count(" ").to_numpy(np.int64)
        keep = (n_chars >= 100) & (n_spaces * 100 >= n_chars * 5)
        out = out.assign(n_chars=n_chars)[keep]
        out["n_snapshots"] = out["n_snapshots"].astype("int64")
        return out[["url", "last_ts", "golden_lang", "n_chars",
                    "n_snapshots"]]

    return bucket_exchange(ds.map_batches(allowed, batch_format="pandas"),
                           ["url"], golden_and_gate, 16)


SQL_CURATE_PAGES = f"""
WITH rules(rhost, rprefix) AS (
  VALUES ('hot0.example.com', '/p/1'),
         ('hot1.example.com', '/p/3'),
         ('site40.example.org', '/p/40')
), p AS (
  SELECT url, warc_ts, text, lang,
         split_part(split_part(url, '//', 2), '/', 1) AS host,
         substr(url, 9 + length(split_part(split_part(url, '//', 2),
                                           '/', 1))) AS path
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), allowed AS (
  SELECT url, warc_ts, text, lang FROM p
  WHERE NOT EXISTS (
    SELECT 1 FROM rules r
    WHERE p.host = r.rhost AND starts_with(p.path, r.rprefix)
  )
), golden AS (
  SELECT url,
         MAX(warc_ts) AS last_ts,
         last(text ORDER BY warc_ts, text ASC NULLS LAST)
             FILTER (WHERE text IS NOT NULL) AS golden_text,
         last(lang ORDER BY warc_ts, text ASC NULLS LAST)
             FILTER (WHERE lang IS NOT NULL) AS golden_lang,
         CAST(COUNT(*) AS BIGINT) AS n_snapshots
  FROM allowed GROUP BY url
)
SELECT url, last_ts, golden_lang,
       CAST(length(golden_text) AS BIGINT) AS n_chars, n_snapshots
FROM golden
WHERE golden_text IS NOT NULL
  AND length(golden_text) >= 100
  AND (length(golden_text) - length(replace(golden_text, ' ', ''))) * 100
        >= length(golden_text) * 5
"""


def q_conversion_delay_quartiles(sf_dir: str):
    """Signup→purchase conversion delay quartiles (exact
    ``quantile_disc`` rank convention ceil(q·n)−1): per user the FIRST
    purchase strictly after the first signup, delays in µs, then the
    multi-rank shared-scan exact quantile refinement — no global
    sort. Per-user delays derive in one user-keyed exchange."""
    from ..functions.relational import exact_quantiles
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"], num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
        df = df.assign(_us=us.to_numpy())
        delays = []
        for _, g in df.groupby("user_id", sort=False):
            s = g.loc[g["event_type"] == "signup", "_us"]
            if s.empty:
                continue
            s0 = s.min()
            p = g.loc[(g["event_type"] == "purchase") & (g["_us"] > s0),
                      "_us"]
            if p.empty:
                continue
            delays.append(p.min() - s0)
        return pd.DataFrame({"delay_us": pd.Series(delays, dtype="int64")})

    delays = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    qs = [0.25, 0.5, 0.75]
    vals = exact_quantiles(delays, "delay_us", qs)
    return pd.DataFrame({"q": qs,
                         "delay_us": np.asarray(vals).astype(np.int64)})


SQL_CONVERSION_DELAY = """
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id,
         MIN(epoch_us(e.ts) - epoch_us(s.s_ts)) AS delay_us
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
  GROUP BY e.user_id
)
SELECT unnest([0.25, 0.5, 0.75]) AS q,
       unnest(quantile_disc(delay_us, [0.25, 0.5, 0.75])) AS delay_us
FROM p
"""


def q_theta_sketch_types(sf_dir: str):
    """KMV (k-minimum-values) theta sketch per event type over the
    distinct-user domain — the mergeable distinct sketch BEYOND HLL/CMS,
    md5-hashed so the SQL oracle replays it value-for-value: each
    partial keeps the k=32 lexicographically smallest distinct user
    hashes; merge = union + re-truncate (associative/commutative, the
    property that makes it cluster-safe). Exact distinct count attached
    for calibration."""
    import hashlib

    from ..stages.partition import bucket_exchange

    K = 32
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            users = g["user_id"].drop_duplicates().to_numpy(np.int64)
            hh = sorted(hashlib.md5(str(u).encode()).hexdigest()
                        for u in users)
            top = hh[:K]
            rows.append((et, np.int64(len(users)), np.int64(len(top)),
                         top[-1]))
        return pd.DataFrame(rows, columns=["event_type", "n_distinct",
                                           "n_in_sketch", "kth_hash"])

    # per-batch pair dedup bounds the exchange to distinct (type, user)
    # pairs per batch (the count-distinct shape); all of a type's pairs
    # co-locate so the kernel's dedup, count and K-smallest are global
    return bucket_exchange(ev.map_batches(partial, batch_format="pandas"),
                           ["event_type"], merge, num_buckets=2)


SQL_THETA_SKETCH = """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hh FROM d),
r AS (
  SELECT event_type, hh,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM h
)
SELECT event_type, CAST(MIN(nd) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
       MAX(hh) AS kth_hash
FROM r WHERE rn <= 32 GROUP BY event_type
"""


def q_fd_violations(sf_dir: str):
    """Functional-dependency discovery audit: for candidate FDs
    det → dep over lineitem, the number of determinant groups and how
    many are VIOLATED (>1 distinct dependent) — the data-profiling
    primitive behind key detection. Distinct (det, dep) pairs reduce in
    one exchange per FD; the per-det distinct count is a second,
    group-cardinality exchange; only two counters reach the driver."""
    from ..functions.relational import grouped_agg

    fds = [("l_partkey", "l_extendedprice"),
           ("l_orderkey", "l_returnflag"),
           ("l_suppkey", "l_linestatus")]
    rows = []
    for det, dep in fds:
        li = read_table(sf_dir, "lineitem", columns=[det, dep], num_blocks=8)
        pairs = grouped_agg(li, [det, dep], {"n": (dep, "count")},
                            num_buckets=8)
        per_det = grouped_agg(pairs, [det], {"nd": (dep, "count")},
                              num_buckets=8)

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            nd = df["nd"].to_numpy(np.int64)
            return pd.DataFrame({"n_groups": [np.int64(len(df))],
                                 "n_violating": [np.int64((nd > 1).sum())]})

        parts = per_det.map_batches(fold, batch_format="pandas").to_pandas()
        rows.append((f"{det}->{dep}",
                     np.int64(parts["n_groups"].sum()),
                     np.int64(parts["n_violating"].sum())))
    return pd.DataFrame(rows, columns=["fd", "n_groups", "n_violating"])


SQL_FD_VIOLATIONS = """
SELECT 'l_partkey->l_extendedprice' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_violating
FROM (SELECT l_partkey, COUNT(DISTINCT l_extendedprice) AS nd
      FROM lineitem GROUP BY l_partkey)
UNION ALL
SELECT 'l_orderkey->l_returnflag',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT)
FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS nd
      FROM lineitem GROUP BY l_orderkey)
UNION ALL
SELECT 'l_suppkey->l_linestatus',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT)
FROM (SELECT l_suppkey, COUNT(DISTINCT l_linestatus) AS nd
      FROM lineitem GROUP BY l_suppkey)
"""


def q_out_of_order_stats(sf_dir: str):
    """Event-time disorder diagnosis per user: treating event_id as
    ARRIVAL order, an event is late if its ts is below the running max
    of everything that arrived before it — the statistic that sizes
    streaming watermarks. One user-keyed exchange, vectorized
    shifted-cummax kernel."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"], kind="mergesort")
        us = (df["ts"].astype("datetime64[ns]").astype("int64") // 1000
              ).to_numpy()
        rows = []
        for uid, g in df.assign(_us=us).groupby("user_id", sort=False):
            t = g["_us"].to_numpy(np.int64)
            prev_max = np.maximum.accumulate(t)[:-1]
            late = int((t[1:] < prev_max).sum())
            rows.append((uid, np.int64(len(t)), np.int64(late)))
        return pd.DataFrame(rows, columns=["user_id", "n_events", "n_late"])

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_OUT_OF_ORDER = """
WITH w AS (
  SELECT user_id, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE ts < prev_max) AS BIGINT) AS n_late
FROM w GROUP BY user_id
"""


def q_proportional_split_docs(sf_dir: str):
    """Per-language EXACT 80/10/10 train/val/test split by cumulative
    integer quotas: rows order by the Knuth hash, bucket boundaries are
    n·8//10 and n·9//10 — counts always sum to n and each is within one
    row of proportional (the ordered-bucket largest-remainder form),
    with ZERO float arithmetic. Language groups co-locate in one
    exchange; the tiny lang domain is grouped INSIDE the kernel (hashed
    small domains collide buckets)."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"],
                      num_blocks=8)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"].notna()].copy()
        key = (df["doc_id"].to_numpy(np.int64) * 2654435761) % 4294967296
        df = df.assign(_k=key).sort_values(["lang", "_k", "doc_id"],
                                           kind="mergesort")
        g = df.groupby("lang", sort=False)
        rn = g.cumcount().to_numpy(np.int64) + 1
        n = g["doc_id"].transform("size").to_numpy(np.int64)
        split = np.where(rn <= n * 8 // 10, "train",
                         np.where(rn <= n * 9 // 10, "val", "test"))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "lang": df["lang"].to_numpy(),
                             "split": split})

    return bucket_exchange(docs, ["lang"], split, num_buckets=4)


SQL_PROPORTIONAL_SPLIT = """
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents WHERE lang IS NOT NULL
)
SELECT doc_id, lang,
       CASE WHEN rn <= n * 8 // 10 THEN 'train'
            WHEN rn <= n * 9 // 10 THEN 'val'
            ELSE 'test' END AS split
FROM r
"""


def q_label_centroid_sums(sf_dir: str):
    """Per-label centroid SUFFICIENT STATISTICS over int8-quantized
    embeddings: Σ q[pos] and n per (label, pos) as exact BIGINTs (the
    centroid itself is a client-side division). Quantization replays
    the SQL recipe bit-for-bit; per-batch label-masked integer column
    sums are the only shuffle payload (|labels|·dim rows per batch)."""
    from ..functions.relational import grouped_agg

    def quantize(mat: np.ndarray) -> np.ndarray:
        xd = mat.astype(np.float64)
        scale = np.abs(xd).max(axis=1)
        safe = np.where(scale == 0, 1.0, scale)
        q = round_half_away((xd * 127.0) / safe[:, None], 0)
        q = np.clip(q, -127, 127)
        q[scale == 0] = 0
        return q.astype(np.int64)

    emb = read_table(sf_dir, "embeddings",
                     columns=["embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qm = quantize(np.stack(df["embedding"].to_numpy()))
        lab = df["label"].to_numpy().astype(np.int64)
        frames = []
        for lv in np.unique(lab):
            sel = qm[lab == lv]
            frames.append(pd.DataFrame({
                "label": np.int64(lv),
                "pos": np.arange(qm.shape[1], dtype=np.int64),
                "sum_q": sel.sum(axis=0),
                "n": np.int64(len(sel)),
            }))
        return pd.concat(frames, ignore_index=True)

    agg = grouped_agg(emb.map_batches(partial, batch_format="pandas"),
                      ["label", "pos"],
                      {"sum_q": ("sum_q", "sum"), "n": ("n", "sum")},
                      num_buckets=8)
    return agg.map_batches(
        lambda df: df.assign(sum_q=df["sum_q"].astype("int64"),
                             n=df["n"].astype("int64")),
        batch_format="pandas")


SQL_LABEL_CENTROID_SUMS = """
WITH s AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         list_aggregate(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE))), 'max')
           AS scale
  FROM embeddings
),
qz AS (
  SELECT label,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                     -127) AS BIGINT) END)) AS q
  FROM s
)
SELECT CAST(label AS BIGINT) AS label, pos,
       CAST(SUM(q) AS BIGINT) AS sum_q, CAST(COUNT(*) AS BIGINT) AS n
FROM qz GROUP BY label, pos
"""


def q_crawl_budget_allocation(sf_dir: str):
    """Recrawl budget planning: 1000 crawl slots allocated per domain
    proportional to its observed CHANGE count (first snapshot counts as
    a change), by exact largest-remainder integer division — Σ budgets
    == 1000 always. Change detection runs in one url-keyed exchange
    emitting per-domain partials; the bounded domain table folds
    driver-side for the rank step (same bounded-cardinality posture as
    grid-DBSCAN)."""
    from ..stages.partition import bucket_exchange

    BUDGET = 1000
    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "text"],
                            override_num_blocks=16)

    def per_url(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts", "text"], kind="mergesort",
                            na_position="last")
        g = df.groupby("url", sort=False)
        prev = g["text"].shift(1)
        first = g.cumcount() == 0
        changed = first | (df["text"].ne(prev)
                           & ~(df["text"].isna() & prev.isna()))
        dom = (df["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        out = (pd.DataFrame({"domain": dom, "c": changed.astype("int64")})
               .groupby("domain", sort=False)["c"].sum().astype("int64")
               .rename("n_changes").reset_index())
        return out

    parts = bucket_exchange(ds, ["url"], per_url, num_buckets=16).to_pandas()
    wgt = (parts.groupby("domain", sort=False)["n_changes"].sum()
           .astype("int64").reset_index())
    w = wgt["n_changes"].to_numpy(np.int64)
    tw = int(w.sum())
    base = (BUDGET * w) // tw
    rem = (BUDGET * w) % tw
    leftover = BUDGET - int(base.sum())
    order = np.lexsort((wgt["domain"].to_numpy(), -rem))
    extra = np.zeros(len(wgt), dtype=np.int64)
    extra[order[:leftover]] = 1
    return pd.DataFrame({"domain": wgt["domain"],
                         "n_changes": w,
                         "budget": base + extra})


SQL_CRAWL_BUDGET = f"""
WITH ch AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,
         CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
              WHEN text IS DISTINCT FROM LAG(text) OVER w THEN 1
              ELSE 0 END AS changed
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WINDOW w AS (PARTITION BY url ORDER BY warc_ts, text ASC NULLS LAST)
),
wgt AS (
  SELECT domain, CAST(SUM(changed) AS BIGINT) AS w
  FROM ch GROUP BY domain
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wgt),
alloc AS (
  SELECT domain, w, (1000 * w) // tw AS base, (1000 * w) % tw AS rem
  FROM wgt, tot
),
lv AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS leftover FROM alloc),
lr AS (
  SELECT domain, w, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, domain ASC) AS rk
  FROM alloc
)
SELECT domain, w AS n_changes,
       CAST(base + CASE WHEN rk <= lv.leftover THEN 1 ELSE 0 END AS BIGINT)
         AS budget
FROM lr, lv
"""


def q_greedy_policy_replay(sf_dir: str):
    """Offline policy evaluation: replay a "recommend the user's
    most-frequent-so-far type" policy against what actually happened —
    hits per actual type. The expanding argmax is a vectorized one-hot
    prefix-sum per user (candidate columns sorted by name so np.argmax's
    first-max IS the lexicographic tiebreak); the global candidate type
    list broadcasts; per-user histories co-locate in one exchange."""
    import ray

    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)
    types_df = grouped_agg(
        ev.map_batches(lambda df: df[["event_type"]].drop_duplicates(),
                       batch_format="pandas"),
        ["event_type"], {"n": ("event_type", "count")},
        num_buckets=2).to_pandas()
    types = sorted(types_df["event_type"].dropna())
    tref = ray.put(types)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(tref)
        tix = {t: i for i, t in enumerate(cand)}
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            codes = g["event_type"].map(tix).to_numpy()
            onehot = np.zeros((len(g), len(cand)), dtype=np.int64)
            onehot[np.arange(len(g)), codes] = 1
            prior = np.vstack([np.zeros(len(cand), dtype=np.int64),
                               onehot.cumsum(axis=0)[:-1]])
            pred = prior.argmax(axis=1)
            rows.append(pd.DataFrame({"event_type": g["event_type"],
                                      "hit": (pred == codes)}))
        if not rows:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "n_hits": pd.Series([], dtype="int64")})
        cat = pd.concat(rows, ignore_index=True)
        out = (cat.groupby("event_type", sort=False)
               .agg(n_events=("hit", "size"), n_hits=("hit", "sum"))
               .reset_index())
        out["n_events"] = out["n_events"].astype("int64")
        out["n_hits"] = out["n_hits"].astype("int64")
        return out

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("event_type", sort=False)
                .agg(n_events=("n_events", "sum"), n_hits=("n_hits", "sum"))
                .astype("int64").reset_index())

    return bucket_exchange(partials, ["event_type"], combine, num_buckets=2)


SQL_GREEDY_POLICY_REPLAY = """
WITH t AS (SELECT DISTINCT event_type FROM events),
x AS (
  SELECT e.user_id, e.ts, e.event_id, e.event_type AS actual,
         t.event_type AS cand,
         CASE WHEN e.event_type = t.event_type THEN 1 ELSE 0 END AS hit
  FROM events e CROSS JOIN t
),
c AS (
  SELECT user_id, ts, event_id, actual, cand,
         COALESCE(SUM(hit) OVER (PARTITION BY user_id, cand
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS pc
  FROM x
),
b AS (
  SELECT user_id, event_id, actual, cand,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_id
                            ORDER BY pc DESC, cand ASC) AS rn
  FROM c
)
SELECT actual AS event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE cand = actual) AS BIGINT) AS n_hits
FROM b WHERE rn = 1
GROUP BY actual
"""


def q_bloom_fp_audit(sf_dir: str):
    """Bloom filter with its false-positive rate measured EXACTLY: an
    m=65536/k=3 filter over urgent orderkeys (bit positions from md5
    prefixes, replayed value-for-value in SQL), probed by every
    distinct lineitem orderkey; reports probes / passes / true and
    false positives as BIGINTs. The bit set broadcasts (fixed size
    regardless of key count — the whole point of the structure); probes
    dedup in one exchange, md5 only on per-bucket distinct keys."""
    import hashlib

    import ray

    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    M, K = 65536, 3

    def positions(key: int) -> list[int]:
        return [int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:8], 16)
                % M for i in range(1, K + 1)]

    orders = read_small(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])
    needles = set(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                             "o_orderkey"].astype(int))
    bits = frozenset(p for k in needles for p in positions(k))
    bref = ray.put((bits, needles))

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"], num_blocks=8)
    distinct = grouped_agg(
        li.map_batches(lambda df: df.drop_duplicates(),
                       batch_format="pandas"),
        ["l_orderkey"], {"n": ("l_orderkey", "count")}, num_buckets=8)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bset, nset = ray.get(bref)
        keys = df["l_orderkey"].to_numpy(np.int64)
        passed = np.fromiter(
            (all(p in bset for p in positions(int(k))) for k in keys),
            dtype=bool, count=len(keys))
        truth = np.fromiter((int(k) in nset for k in keys), dtype=bool,
                            count=len(keys))
        return pd.DataFrame({
            "n_probes": [np.int64(len(keys))],
            "n_pass": [np.int64(passed.sum())],
            "n_true_pos": [np.int64((passed & truth).sum())],
            "n_false_pos": [np.int64((passed & ~truth).sum())],
        })

    parts = distinct.map_batches(probe, batch_format="pandas").to_pandas()
    return pd.DataFrame({c: [np.int64(parts[c].sum())]
                         for c in ("n_probes", "n_pass", "n_true_pos",
                                   "n_false_pos")})


SQL_BLOOM_FP_AUDIT = """
WITH needles AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT'
),
idx(i) AS (VALUES (1), (2), (3)),
bits AS (
  SELECT DISTINCT
         CAST(CONCAT('0x', substring(md5(CAST(k AS VARCHAR) || ':'
                                         || CAST(i AS VARCHAR)), 1, 8))
              AS BIGINT) % 65536 AS b
  FROM needles, idx
),
probes AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
pp AS (
  SELECT p.k,
         CAST(CONCAT('0x', substring(md5(CAST(p.k AS VARCHAR) || ':'
                                         || CAST(i.i AS VARCHAR)), 1, 8))
              AS BIGINT) % 65536 AS b
  FROM probes p, idx i
),
pass AS (
  SELECT k FROM pp JOIN bits USING (b) GROUP BY k HAVING COUNT(*) = 3
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pass) AS n_pass,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM pass JOIN needles USING (k)) AS n_true_pos,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pass
        WHERE k NOT IN (SELECT k FROM needles)) AS n_false_pos
"""


def q_rolling_corr7_types(sf_dir: str):
    """Trailing-7-day JOINT sufficient statistics of two daily count
    series (click vs purchase): per grid day, window n, Σx, Σy, Σxy,
    Σx², Σy² as exact BIGINTs — the rolling correlation is a
    client-side formula, nothing float crosses engines. Daily counts
    reduce distributed; the BOUNDED (days × 2) series folds driver-side
    where prefix-sum differences produce every window in O(days)."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"],
                    num_blocks=8)

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        return pa.table({"event_type": t["event_type"], "day": day})

    days = ev.map_batches(partial, batch_format="pyarrow")
    counts = grouped_agg(days, ["event_type", "day"],
                         {"cnt": ("day", "count")}, num_buckets=8
                         ).to_pandas()
    mn, mx = int(counts["day"].min()), int(counts["day"].max())
    grid = np.arange(mn, mx + 1, dtype=np.int64)

    def series(et: str) -> np.ndarray:
        s = counts[counts["event_type"] == et].set_index("day")["cnt"]
        return (pd.Series(0, index=grid, dtype="int64")
                .add(s, fill_value=0).to_numpy(np.int64))

    x, y = series("click"), series("purchase")

    def win(v: np.ndarray) -> np.ndarray:
        c = np.concatenate([[0], np.cumsum(v)])
        lo = np.maximum(np.arange(len(v)) - 6, 0)
        return c[np.arange(1, len(v) + 1)] - c[lo]

    n = np.minimum(np.arange(len(grid)) + 1, 7).astype(np.int64)
    return pd.DataFrame({
        "day": grid, "n": n,
        "sum_x": win(x), "sum_y": win(y), "sum_xy": win(x * y),
        "sum_x2": win(x * x), "sum_y2": win(y * y),
    })


SQL_ROLLING_CORR7 = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, day
),
b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM c),
g AS (SELECT unnest(range(mn, mx + 1)) AS day FROM b),
xy AS (
  SELECT g.day, COALESCE(x.cnt, 0) AS x, COALESCE(y.cnt, 0) AS y
  FROM g LEFT JOIN c x ON x.day = g.day AND x.event_type = 'click'
         LEFT JOIN c y ON y.day = g.day AND y.event_type = 'purchase'
)
SELECT day,
       CAST(COUNT(*) OVER w AS BIGINT)      AS n,
       CAST(SUM(x) OVER w AS BIGINT)        AS sum_x,
       CAST(SUM(y) OVER w AS BIGINT)        AS sum_y,
       CAST(SUM(x * y) OVER w AS BIGINT)    AS sum_xy,
       CAST(SUM(x * x) OVER w AS BIGINT)    AS sum_x2,
       CAST(SUM(y * y) OVER w AS BIGINT)    AS sum_y2
FROM xy
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_repeat_purchase_parts(sf_dir: str):
    """Repeat-purchase analysis: per part, how many customers bought it
    in ≥2 DISTINCT orders. (part, customer, order) triples dedup INSIDE
    the orderkey-bucketed join (each triple lives in exactly one
    bucket, so the in-bucket dedup is global); per-pair order counts
    and the ≥2 filter are two group-cardinality exchanges."""
    from ..functions.relational import grouped_agg, hash_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"],
                    num_blocks=8)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8)
    orders_sel = orders.map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")

    def dedup_triples(df: pd.DataFrame) -> pd.DataFrame:
        return df[["l_partkey", "o_custkey", "l_orderkey"]].drop_duplicates()

    j = hash_join(li, orders_sel, on="l_orderkey", post_fn=dedup_triples,
                  num_buckets=16)
    pairs = grouped_agg(j, ["l_partkey", "o_custkey"],
                        {"n_orders": ("l_orderkey", "count")},
                        num_buckets=8)
    rep = pairs.map_batches(
        lambda df: df[df["n_orders"] >= 2][["l_partkey", "o_custkey"]],
        batch_format="pandas")
    out = grouped_agg(rep, ["l_partkey"],
                      {"n_repeat_customers": ("o_custkey", "count")},
                      num_buckets=4)
    return out.map_batches(
        lambda df: df.assign(
            n_repeat_customers=df["n_repeat_customers"].astype("int64")),
        batch_format="pandas")


SQL_REPEAT_PURCHASE = """
WITH t AS (
  SELECT DISTINCT l_partkey, o_custkey, l_orderkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
p AS (
  SELECT l_partkey, o_custkey, COUNT(*) AS n_orders
  FROM t GROUP BY l_partkey, o_custkey
)
SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_repeat_customers
FROM p WHERE n_orders >= 2 GROUP BY l_partkey
"""


def q_part_supplier_hhi(sf_dir: str):
    """Supplier-concentration (Herfindahl) sufficient statistics per
    part: total shipped quantity (×100 ints) and Σ (per-supplier
    total)² as exact BIGINTs — HHI = hhi_num/total² client-side. One
    part-keyed exchange, per-(part, supplier) sums in-kernel."""
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"],
                    num_blocks=8)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(df["l_quantity"].to_numpy(np.float64) * 100
                    ).astype(np.int64)
        s = (df.assign(_q=q)
             .groupby(["l_partkey", "l_suppkey"], sort=False)["_q"].sum())
        per = s.reset_index()
        out = (per.groupby("l_partkey", sort=False)["_q"]
               .agg(total_q100="sum", hhi_num=lambda v: np.int64(
                   (v.to_numpy(np.int64) ** 2).sum())).reset_index())
        out["total_q100"] = out["total_q100"].astype("int64")
        out["hhi_num"] = out["hhi_num"].astype("int64")
        return out

    return bucket_exchange(li, ["l_partkey"], per_part, num_buckets=16)


SQL_PART_SUPPLIER_HHI = """
WITH s AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS total_q100,
       CAST(SUM(q * q) AS BIGINT) AS hhi_num
FROM s GROUP BY l_partkey
"""


def q_loo_target_encode(sf_dir: str):
    """Leave-one-out target encoding (the leakage-safe variant when the
    row itself must be excluded): per event, (Σ type cents − own cents,
    n(type) − 1) as the exact integer RATIONAL — the mean is a
    client-side division. Per-type totals reduce distributed and
    broadcast (|types| rows); the encode itself is a zero-shuffle map."""
    import ray

    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"],
                    num_blocks=8)

    def cents_col(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        return df.assign(cents=cents)

    with_cents = ev.map_batches(cents_col, batch_format="pandas")
    totals = grouped_agg(with_cents, ["event_type"],
                         {"sum_cents": ("cents", "sum"),
                          "n": ("cents", "count")},
                         num_buckets=2).to_pandas()
    tref = ray.put(totals.set_index("event_type")[["sum_cents", "n"]])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tref)
        s = df["event_type"].map(t["sum_cents"]).to_numpy(np.int64)
        n = df["event_type"].map(t["n"]).to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "loo_num_cents": s - df["cents"].to_numpy(np.int64),
            "loo_den": n - 1,
        })

    return with_cents.map_batches(encode, batch_format="pandas")


SQL_LOO_TARGET_ENCODE = """
SELECT event_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
              OVER (PARTITION BY event_type)
            - CAST(ROUND(value * 100) AS BIGINT) AS BIGINT) AS loo_num_cents,
       CAST(COUNT(*) OVER (PARTITION BY event_type) - 1 AS BIGINT) AS loo_den
FROM events
"""


def q_churned_users(sf_dir: str):
    """Churn flags: users whose LAST event is ≥7 days before the end of
    the observation window (the global max ts). Per-user max reduces in
    one exchange; the single global max folds from per-bucket partials —
    no full pass is repeated."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)
    per_user = grouped_agg(ev, ["user_id"], {"last_ts": ("ts", "max")},
                           num_buckets=8).to_pandas()
    gmax = per_user["last_ts"].max()
    last_us = (per_user["last_ts"].astype("datetime64[ns]").astype("int64")
               // 1000)
    gmax_us = int(pd.Timestamp(gmax).value // 1000)
    churned = (gmax_us - last_us) >= 7 * 86_400_000_000
    return pd.DataFrame({
        "user_id": per_user["user_id"].astype("int64"),
        "days_silent": ((gmax_us - last_us) // 86_400_000_000
                        ).astype("int64"),
        "churned": churned.astype(bool),
    })


SQL_CHURNED_USERS = """
WITH u AS (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id),
g AS (SELECT MAX(last_ts) AS gmax FROM u)
SELECT user_id,
       CAST((epoch_us(g.gmax) - epoch_us(last_ts)) // 86400000000
            AS BIGINT) AS days_silent,
       (epoch_us(g.gmax) - epoch_us(last_ts)) >= 7 * 86400000000 AS churned
FROM u, g
"""


def q_salient_dims(sf_dir: str):
    """Per-embedding salient dimensions: the 5 largest |q| positions of
    the int8-quantized vector (ties to the smaller position) — the
    interpretability probe. Map-only vectorized argsort per batch;
    quantization replays the SQL recipe exactly."""

    def quantize(mat: np.ndarray) -> np.ndarray:
        xd = mat.astype(np.float64)
        scale = np.abs(xd).max(axis=1)
        safe = np.where(scale == 0, 1.0, scale)
        q = round_half_away((xd * 127.0) / safe[:, None], 0)
        q = np.clip(q, -127, 127)
        q[scale == 0] = 0
        return q.astype(np.int64)

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def top5(df: pd.DataFrame) -> pd.DataFrame:
        qm = quantize(np.stack(df["embedding"].to_numpy()))
        vid = df["vec_id"].to_numpy(np.int64)
        aq = np.abs(qm)
        # lexsort on (-|q|, pos): stable ascending pos within equal |q|
        order = np.argsort(-aq, axis=1, kind="stable")[:, :5]
        rows = np.repeat(vid, 5)
        ranks = np.tile(np.arange(1, 6, dtype=np.int64), len(vid))
        pos = order.ravel().astype(np.int64)
        vals = np.take_along_axis(qm, order, axis=1).ravel()
        return pd.DataFrame({"vec_id": rows, "rank": ranks, "pos": pos,
                             "q": vals})

    return emb.map_batches(top5, batch_format="pandas")


SQL_SALIENT_DIMS = """
WITH s AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         list_aggregate(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE))), 'max')
           AS scale
  FROM embeddings
),
qz AS (
  SELECT vec_id,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                     -127) AS BIGINT) END)) AS q
  FROM s
),
r AS (
  SELECT vec_id, pos, q,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY abs(q) DESC, pos ASC) AS rank
  FROM qz
)
SELECT vec_id, CAST(rank AS BIGINT) AS rank, pos, q
FROM r WHERE rank <= 5
"""


def q_domain_staleness(sf_dir: str):
    """Crawl staleness per domain: the last snapshot anywhere in the
    domain and how many whole days it lags the crawl frontier (global
    max warc_ts) — what a scheduler reads to pick recrawl victims.
    Domain maxima reduce in one exchange; the frontier folds from those
    partials."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts"],
                            override_num_blocks=16)

    def dom(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["url"].str.split("//", n=1).str[1]
             .str.split("/", n=1).str[0])
        return pd.DataFrame({"domain": d, "warc_ts": df["warc_ts"]})

    per_dom = grouped_agg(ds.map_batches(dom, batch_format="pandas"),
                          ["domain"], {"last_ts": ("warc_ts", "max")},
                          num_buckets=8).to_pandas()
    last_us = (per_dom["last_ts"].astype("datetime64[ns]").astype("int64")
               // 1000)
    gmax_us = int(last_us.max())
    return pd.DataFrame({
        "domain": per_dom["domain"],
        "days_behind": ((gmax_us - last_us) // 86_400_000_000
                        ).astype("int64"),
    })


SQL_DOMAIN_STALENESS = f"""
WITH d AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,
         MAX(warc_ts) AS last_ts
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  GROUP BY domain
),
g AS (SELECT MAX(last_ts) AS gmax FROM d)
SELECT domain,
       CAST((epoch_us(g.gmax) - epoch_us(last_ts)) // 86400000000
            AS BIGINT) AS days_behind
FROM d, g
"""


def q_range_join_streaming(sf_dir: str):
    """The SAME interval join as range_join_events under STREAMING
    ingest: purchase windows and events replayed in event-time order
    through actor-held StreamingIntervalState shards (hash-routed by
    user). An event emits only once the window watermark strictly
    passes its timestamp — every window that could contain it has
    arrived, none leaks from the future — and the concatenated
    emissions are pinned to the SAME SQL oracle as the batch path.
    Window state self-evicts behind the event watermark."""
    from ..state.streaming import streaming_interval_join

    ev = read_table(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type"],
        num_blocks=8,
    )

    def stream():
        for df in _replay_blocks(ev, "ts"):
            p = df[df["event_type"] == "purchase"]
            if len(p):
                yield ("window", pd.DataFrame({
                    "user_id": p["user_id"].to_numpy(),
                    "win_id": p["event_id"].to_numpy(),
                    "win_start": p["ts"].to_numpy(),
                    "win_end": (p["ts"] + pd.Timedelta(hours=24)).to_numpy(),
                }))
            yield ("event", df)

    out = pd.concat(
        list(streaming_interval_join(stream(), "user_id", "ts",
                                     "win_start", "win_end", ["win_id"],
                                     num_shards=8)),
        ignore_index=True,
    )
    return out[["event_id", "ts", "event_type", "win_id"]]


def q_hits_scores(sf_dir: str):
    """One HITS iteration over the URL web graph with INTEGER scores:
    authority = in-degree, hub(u) = Σ in-degree(dst) over u's distinct
    outlinks — exact BIGINTs, no float power iteration. Same
    two-exchange shape as degree_assortativity: dst-keyed kernel
    attaches each target's in-degree, src-keyed kernel sums."""
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                            override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = _explode_hrefs(df)
        out = (pd.DataFrame({"src": pairs["url"], "dst": pairs["href"]})
               .drop_duplicates())
        return out[out["src"] != out["dst"]]

    def by_dst(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["src", "dst"])
        indeg = (d.groupby("dst", sort=False)["src"].transform("size")
                 .to_numpy(np.int64))
        return pd.DataFrame({"src": d["src"], "indeg": indeg})

    withdeg = bucket_exchange(ds.map_batches(partial, batch_format="pandas"),
                              ["dst"], by_dst, num_buckets=8)

    def by_src(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("src", sort=False)["indeg"]
               .agg(out_deg="size", hub_score="sum").reset_index()
               .rename(columns={"src": "url"}))
        out["out_deg"] = out["out_deg"].astype("int64")
        out["hub_score"] = out["hub_score"].astype("int64")
        return out

    return bucket_exchange(withdeg, ["src"], by_src, num_buckets=8)


SQL_HITS_SCORES = f"""
WITH l AS (
  SELECT url, unnest(CAST(json_extract(meta, '$.links') AS JSON[]))
           AS link
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
),
edges AS (
  SELECT DISTINCT url AS src,
         json_extract_string(link, '$.href') AS dst
  FROM l WHERE json_extract_string(link, '$.href') IS NOT NULL
    AND url <> json_extract_string(link, '$.href')
),
ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg
        FROM edges GROUP BY dst)
SELECT src AS url, CAST(COUNT(*) AS BIGINT) AS out_deg,
       CAST(SUM(indeg) AS BIGINT) AS hub_score
FROM edges JOIN ind USING (dst)
GROUP BY src
"""


def q_contract_violations_events(sf_dir: str):
    """Declarative data-contract validation: a rule list (range checks,
    enum membership, non-null) evaluated vectorized per batch, violation
    counts per rule — the CI gate a pipeline runs before publishing a
    table. One combine of ≤|rules| partial rows; rows never shuffle."""
    ALLOWED = ("click", "view", "purchase", "signup", "error")
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"],
                    num_blocks=8)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"]
        ts = df["ts"]
        rules = {
            "value_in_range_0_1000": ~(v.notna() & (v >= 0) & (v <= 1000)),
            "event_type_enum": ~df["event_type"].isin(ALLOWED),
            "event_id_nonnull": df["event_id"].isna(),
            "ts_in_window": ~(ts.notna()
                              & (ts >= pd.Timestamp("2020-01-01"))
                              & (ts < pd.Timestamp("2027-01-01"))),
            "user_id_positive": ~(df["user_id"].notna()
                                  & (df["user_id"] > 0)),
        }
        return pd.DataFrame({
            "rule": list(rules),
            "n_violations": [np.int64(m.sum()) for m in rules.values()],
            "n_checked": np.int64(len(df)),
        })

    parts = ev.map_batches(check, batch_format="pandas").to_pandas()
    out = (parts.groupby("rule", sort=False)
           .agg(n_violations=("n_violations", "sum"),
                n_checked=("n_checked", "sum")).reset_index())
    out["n_violations"] = out["n_violations"].astype("int64")
    out["n_checked"] = out["n_checked"].astype("int64")
    return out


SQL_CONTRACT_VIOLATIONS = """
SELECT 'value_in_range_0_1000' AS rule,
       CAST(COUNT(*) FILTER (WHERE NOT (value IS NOT NULL AND value >= 0
                                        AND value <= 1000)) AS BIGINT)
         AS n_violations,
       CAST(COUNT(*) AS BIGINT) AS n_checked
FROM events
UNION ALL
SELECT 'event_type_enum',
       CAST(COUNT(*) FILTER (WHERE event_type NOT IN
              ('click', 'view', 'purchase', 'signup', 'error')
              OR event_type IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM events
UNION ALL
SELECT 'event_id_nonnull',
       CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM events
UNION ALL
SELECT 'ts_in_window',
       CAST(COUNT(*) FILTER (WHERE NOT (ts IS NOT NULL
              AND ts >= TIMESTAMP '2020-01-01'
              AND ts < TIMESTAMP '2027-01-01')) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM events
UNION ALL
SELECT 'user_id_positive',
       CAST(COUNT(*) FILTER (WHERE NOT (user_id IS NOT NULL
                                        AND user_id > 0)) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM events
"""


def q_top_prices_with_ties(sf_dir: str):
    """Per-segment top-3 order prices WITH TIES (RANK semantics, not
    ROW_NUMBER — every order tied with the 3rd price survives): the
    segment dimension broadcasts; segments co-locate in one exchange and
    the competition rank is an in-kernel sorted scan (grouped inside the
    kernel — small domains collide buckets)."""
    from ..functions.relational import broadcast_join
    from ..stages.partition import bucket_exchange

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"],
                        num_blocks=8)
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename(columns={"c_custkey": "o_custkey",
                                "c_mktsegment": "seg"})
    joined = broadcast_join(orders, cust, on="o_custkey")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        return pd.DataFrame({"seg": df["seg"].to_numpy(),
                             "price_cents": cents,
                             "o_orderkey": df["o_orderkey"].to_numpy(np.int64)})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for seg, g in df.groupby("seg", sort=False):
            g = g.sort_values(["price_cents", "o_orderkey"],
                              ascending=[False, True], kind="mergesort")
            pc_ = g["price_cents"].to_numpy()
            # competition rank: 1 + count of STRICTLY greater prices
            rank = np.searchsorted(-pc_, -pc_, side="left") + 1
            keep = rank <= 3
            outs.append(g[keep].assign(rnk=rank[keep].astype(np.int64)))
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            {"seg": pd.Series([], dtype=object),
             "price_cents": pd.Series([], dtype="int64"),
             "o_orderkey": pd.Series([], dtype="int64"),
             "rnk": pd.Series([], dtype="int64")})

    return bucket_exchange(joined.map_batches(prep, batch_format="pandas"),
                           ["seg"], topk, num_buckets=4)


SQL_TOP_PRICES_WITH_TIES = """
SELECT seg, price_cents, o_orderkey, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderkey,
         RANK() OVER (PARTITION BY c_mktsegment
                      ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        DESC) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rnk <= 3
"""


def q_top_parts_share_nation(sf_dir: str):
    """Revenue concentration per supplier nation: the top-5 parts by
    micro-cent revenue (ties to the smaller partkey) and each part's
    share in RATIONAL form (part_microcents, nation_microcents). The
    nation dim broadcasts; one (nation, part) rollup exchange, then the
    tiny per-nation top-k — no global sort."""
    from ..functions.relational import broadcast_join, grouped_agg
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice",
                             "l_discount"],
                    num_blocks=8)
    sup = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    dim = sup.merge(nation, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"s_suppkey": "l_suppkey", "n_name": "nation"})
    joined = broadcast_join(li, dim, on="l_suppkey")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        bp = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                     ).astype(np.int64)
        return pd.DataFrame({"nation": df["nation"].to_numpy(),
                             "l_partkey": df["l_partkey"].to_numpy(np.int64),
                             "mc": cents * (100 - bp)})

    per_part = grouped_agg(joined.map_batches(prep, batch_format="pandas"),
                           ["nation", "l_partkey"], {"part_mc": ("mc", "sum")},
                           num_buckets=8)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part_mc"] = df["part_mc"].astype("int64")
        outs = []
        for nat, g in df.groupby("nation", sort=False):
            total = np.int64(g["part_mc"].sum())
            g = g.sort_values(["part_mc", "l_partkey"],
                              ascending=[False, True],
                              kind="mergesort").head(5)
            outs.append(g.assign(nation_mc=total))
        if not outs:  # a bucket can hold zero nations at tiny scales
            return pd.DataFrame({"nation": pd.Series([], dtype=object),
                                 "l_partkey": pd.Series([], dtype="int64"),
                                 "part_mc": pd.Series([], dtype="int64"),
                                 "nation_mc": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return bucket_exchange(per_part, ["nation"], topk, num_buckets=4)


SQL_TOP_PARTS_SHARE_NATION = """
WITH r AS (
  SELECT n_name AS nation, l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS part_mc
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_partkey
),
t AS (
  SELECT nation, l_partkey, part_mc,
         CAST(SUM(part_mc) OVER (PARTITION BY nation) AS BIGINT)
           AS nation_mc,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY part_mc DESC, l_partkey ASC) AS rn
  FROM r
)
SELECT nation, l_partkey, part_mc, nation_mc FROM t WHERE rn <= 5
"""


def q_value_gini_orders(sf_dir: str):
    """Gini sufficient statistics of order values: n, Σcents, and the
    rank-weighted Σ rn·cents (global ROW_NUMBER by (cents, orderkey))
    — Gini = (2W − (n+1)S)/(nS) client-side. The global rank comes from
    the distributed ordered scan over a COLLISION-FREE composite key
    (cents·2³² + orderkey), so the scan's RANGE tie rule degenerates to
    exact row numbers; the rank-weighted sum accumulates as Python ints
    shipped as strings (it overflows int64 beyond ~sf0.3) and is
    mirrored by HUGEINT in SQL."""
    from ..functions.relational import ordered_scan

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"], num_blocks=8)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        key = (cents << np.int64(32)) + df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({"composite": key, "cents": cents,
                             "one": np.int64(1)})

    scanned = ordered_scan(orders.map_batches(prep, batch_format="pandas"),
                           "composite", "one", out_col="rn", num_buckets=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rn"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        w = sum(int(a) * int(b) for a, b in zip(rn, cents))
        return pd.DataFrame({"n": [np.int64(len(df))],
                             "s": [np.int64(cents.sum())],
                             "w": [str(w)]})

    parts = scanned.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n": [np.int64(parts["n"].sum())],
        "sum_cents": [np.int64(parts["s"].sum())],
        "rank_weighted": [str(sum(int(x) for x in parts["w"]))],
    })


SQL_VALUE_GINI_ORDERS = """
WITH r AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS rn
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(rn AS HUGEINT) * CAST(cents AS HUGEINT)) AS VARCHAR)
         AS rank_weighted
FROM r
"""


def q_expanding_z_events(sf_dir: str):
    """Leakage-safe expanding standardization per user: for every event,
    the PRIOR-ONLY count, Σcents and Σcents² in event order — the exact
    integer sufficient statistics of a point-in-time z-score (the float
    z is a client-side formula). One user-keyed exchange, shifted
    cumulative sums in-kernel."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.rint(df["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        g = df.assign(_c=cents, _c2=cents * cents).groupby("user_id",
                                                           sort=False)
        n_prior = g.cumcount().to_numpy(np.int64)
        sum_prior = (g["_c"].cumsum() - cents).to_numpy(np.int64)
        c2 = cents * cents
        sumsq_prior = (g["_c2"].cumsum().to_numpy(np.int64) - c2)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "n_prior": n_prior,
            "sum_prior_cents": sum_prior,
            "sumsq_prior_cents": sumsq_prior,
        })

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_EXPANDING_Z = """
SELECT event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_prior,
       CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w, 0)
            AS BIGINT) AS sum_prior_cents,
       CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)
                         * CAST(ROUND(value * 100) AS BIGINT)) OVER w, 0)
            AS BIGINT) AS sumsq_prior_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def q_hierarchical_median_lengths(sf_dir: str):
    """Hierarchical statistical backoff: per (lang, source) cell the
    exact median doc length (quantile_disc rank ceil(n/2)−1) — unless
    the cell has <8 docs, in which case it FALLS BACK to the lang-level
    median (small-cell smoothing, the standard encode-with-backoff
    move). Language groups co-locate in one exchange; both levels
    compute in the same kernel."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents",
                      columns=["lang", "source", "n_chars"], num_blocks=8)

    def med(v: np.ndarray) -> int:
        v = np.sort(v)
        return int(v[(len(v) + 1) // 2 - 1])

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"].notna() & df["source"].notna()]
        rows = []
        for lang, g in df.groupby("lang", sort=False):
            lang_med = med(g["n_chars"].to_numpy(np.int64))
            for src, c in g.groupby("source", sort=False):
                n = len(c)
                use_cell = n >= 8
                rows.append((lang, src, np.int64(n),
                             np.int64(med(c["n_chars"].to_numpy(np.int64))
                                      if use_cell else lang_med),
                             "cell" if use_cell else "lang"))
        return pd.DataFrame(rows, columns=["lang", "source", "n_cell",
                                           "median_used", "level"])

    return bucket_exchange(docs, ["lang"], per_lang, num_buckets=4)


SQL_HIERARCHICAL_MEDIAN = """
WITH cell AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_cell,
         quantile_disc(n_chars, 0.5) AS cell_med
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang, source
),
lm AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS lang_med
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang
)
SELECT cell.lang, source, n_cell,
       CAST(CASE WHEN n_cell >= 8 THEN cell_med ELSE lang_med END
            AS BIGINT) AS median_used,
       CASE WHEN n_cell >= 8 THEN 'cell' ELSE 'lang' END AS level
FROM cell JOIN lm ON cell.lang = lm.lang
"""


def q_html_byte_stats(sf_dir: str):
    """Raw-payload profiling over the BINARY html column: per page the
    byte length, distinct byte count and modal byte count — the cheap
    encoding/compressibility probe a crawl pipeline runs before
    decode. Map-only np.frombuffer histograms; the SQL twin walks the
    decoded codepoints (the fixture html is pure ASCII, where bytes ==
    codepoints — asserted in the kernel). Duplicate (url, warc_ts)
    snapshots are keyed by a deterministic copy_rank (html byte order),
    so per-row outputs hash-compare — that needs one url-keyed
    exchange."""
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts", "html"],
                            override_num_blocks=16)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["html"].notna()]
        df = df[df["html"].map(len) > 0]
        df = df.sort_values(["url", "warc_ts", "html"], kind="mergesort")
        rank = (df.groupby(["url", "warc_ts"], sort=False).cumcount() + 1
                ).to_numpy(np.int64)
        n_bytes, n_distinct, top = [], [], []
        for h in df["html"].to_numpy():
            b = np.frombuffer(h, dtype=np.uint8)
            assert (b < 128).all(), "fixture html must be ASCII"
            counts = np.bincount(b, minlength=128)
            n_bytes.append(len(b))
            n_distinct.append(int((counts > 0).sum()))
            top.append(int(counts.max()))
        return pd.DataFrame({
            "url": df["url"].to_numpy(),
            "warc_ts": df["warc_ts"].to_numpy(),
            "copy_rank": rank,
            "n_bytes": pd.Series(n_bytes, dtype="int64").to_numpy(),
            "n_distinct_bytes": pd.Series(n_distinct,
                                          dtype="int64").to_numpy(),
            "modal_byte_count": pd.Series(top, dtype="int64").to_numpy(),
        })

    return bucket_exchange(ds, ["url"], stats, num_buckets=16)


SQL_HTML_BYTE_STATS = f"""
WITH p AS (
  SELECT url, warc_ts, html,
         ROW_NUMBER() OVER (PARTITION BY url, warc_ts
                            ORDER BY decode(html)) AS copy_rank
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE html IS NOT NULL AND octet_length(html) > 0
),
c AS (
  SELECT url, warc_ts, copy_rank,
         unnest(string_split(decode(html), '')) AS ch
  FROM p
),
h AS (
  SELECT url, warc_ts, copy_rank, ch, COUNT(*) AS n
  FROM c GROUP BY url, warc_ts, copy_rank, ch
)
SELECT url, warc_ts, CAST(copy_rank AS BIGINT) AS copy_rank,
       CAST(SUM(n) AS BIGINT) AS n_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
       CAST(MAX(n) AS BIGINT) AS modal_byte_count
FROM h GROUP BY url, warc_ts, copy_rank
"""


def q_hash_collision_stats(sf_dir: str):
    """Feature-hashing collision audit for the 64-bucket hashing trick:
    how many DISTINCT terms land in each bucket, the bucket-occupancy
    histogram the dimensionality choice is judged by. Distinct terms
    reduce in one exchange (term-keyed); per-bucket distinct counts and
    the occupancy histogram are two tiny combines."""
    import hashlib

    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text"], num_blocks=8)

    def terms(df: pd.DataFrame) -> pd.DataFrame:
        t = (df["text"].dropna().str.split(" ").explode()
             .drop_duplicates())
        return pd.DataFrame({"term": t.to_numpy(dtype=object)})

    distinct = grouped_agg(docs.map_batches(terms, batch_format="pandas"),
                           ["term"], {"n": ("term", "count")}, num_buckets=8)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = [int(hashlib.md5(str(w).encode()).hexdigest()[:8], 16) % 64
             for w in df["term"].to_numpy()]
        out = (pd.DataFrame({"bucket": pd.Series(b, dtype="int64")})
               .groupby("bucket", sort=False).size().rename("n_terms")
               .astype("int64").reset_index())
        return out

    per_bucket = grouped_agg(
        distinct.map_batches(bucketize, batch_format="pandas"),
        ["bucket"], {"n_terms": ("n_terms", "sum")}, num_buckets=2
    ).to_pandas()
    per_bucket["n_terms"] = per_bucket["n_terms"].astype("int64")
    hist = (per_bucket.groupby("n_terms", sort=False).size()
            .rename("n_buckets").astype("int64").reset_index())
    return hist


SQL_HASH_COLLISION_STATS = """
WITH terms AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT CAST(CONCAT('0x', substring(md5(w), 1, 8)) AS BIGINT) % 64
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM terms GROUP BY bucket
)
SELECT n_terms, CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM b GROUP BY n_terms
"""


def q_activity_streaks(sf_dir: str):
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands: island id = day − dense day rank, vectorized per
    user inside one user-keyed exchange over DISTINCT (user, day)
    pairs."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)

    def to_days(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "day": pc.divide(us, 86_400_000_000)})

    days = ev.map_batches(to_days, batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.drop_duplicates(["user_id", "day"])
             .sort_values(["user_id", "day"], kind="mergesort"))
        rk = d.groupby("user_id", sort=False).cumcount().to_numpy(np.int64)
        island = d["day"].to_numpy(np.int64) - rk
        streaks = (d.assign(_i=island)
                   .groupby(["user_id", "_i"], sort=False).size())
        out = (streaks.groupby(level=0).agg(["max", "count"])
               .reset_index())
        per_user_days = (d.groupby("user_id", sort=False).size()
                         .reset_index(name="n_active_days"))
        out.columns = ["user_id", "longest_streak", "n_islands"]
        out = out.merge(per_user_days, on="user_id")
        for c in ("longest_streak", "n_islands", "n_active_days"):
            out[c] = out[c].astype("int64")
        return out

    return bucket_exchange(days, ["user_id"], per_user, num_buckets=8)


SQL_ACTIVITY_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
i AS (
  SELECT user_id, day,
         day - (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) - 1)
           AS island
  FROM d
),
s AS (
  SELECT user_id, island, COUNT(*) AS len
  FROM i GROUP BY user_id, island
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id
"""


def q_order_value_share(sf_dir: str):
    """Percent-of-total feature: each order's share of its customer's
    lifetime spend — the classic normalize-by-entity-total feature.
    Cents are exact int64 (fixed-2-decimal input); the share is ONE
    IEEE double division of two exact integers, so it compares
    bit-identically cross-engine. Per-customer totals combine in one
    small exchange and re-attach with a distributed hash join — order
    rows move exactly once."""
    from ..functions.relational import grouped_agg, hash_join

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"], num_blocks=8)

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "cents": np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                             ).astype(np.int64),
        })

    o = orders.map_batches(cents, batch_format="pandas").materialize()
    totals = grouped_agg(
        o.map_batches(
            lambda d: d[["o_custkey", "cents"]].rename(
                columns={"cents": "cust_cents"}),
            batch_format="pandas"),
        ["o_custkey"], {"cust_cents": ("cust_cents", "sum")}, num_buckets=8)
    joined = hash_join(o, totals, on="o_custkey", num_buckets=8)

    def share(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["share"] = (df["cents"].to_numpy(np.int64).astype(np.float64)
                       / df["cust_cents"].to_numpy(np.int64))
        return df[["o_orderkey", "o_custkey", "cents", "cust_cents",
                   "share"]]

    return joined.map_batches(share, batch_format="pandas")


SQL_ORDER_VALUE_SHARE = """
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), t AS (
  SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS cust_cents
  FROM c GROUP BY o_custkey
)
SELECT c.o_orderkey, c.o_custkey, c.cents, t.cust_cents,
       CAST(c.cents AS DOUBLE) / t.cust_cents AS share
FROM c JOIN t USING (o_custkey)
"""


def q_order_gap_stats(sf_dir: str):
    """Inter-order cadence features per customer: exact integer
    sufficient statistics (n, Σgap, Σgap², max) of the day gaps between
    consecutive orders — the recency/regularity signal behind churn and
    reorder models. Gap days are exact BIGINTs (epoch-µs diff // 1 day;
    dates are day-truncated); Σgap² of ≤ ~2400-day gaps cannot overflow
    int64 at any per-customer cardinality that fits an order table. Ties
    on o_orderdate break by o_orderkey, but the gap MULTISET of a sorted
    multiset is tie-order-invariant anyway. One exchange co-locates each
    customer's orders; only per-customer stat rows leave the task."""
    from ..stages.partition import bucket_exchange

    DAY_US = 86_400_000_000
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate", "o_orderkey"],
                        num_blocks=8)

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        day = (df["o_orderdate"].to_numpy().astype("datetime64[ns]")
               .astype(np.int64) // 1000) // DAY_US
        cust = df["o_custkey"].to_numpy(np.int64)
        prev_day = np.roll(day, 1)
        same = np.roll(cust, 1) == cust
        gaps = pd.DataFrame({
            "o_custkey": cust[same],
            "gap": day[same] - prev_day[same],
        })
        if gaps.empty:
            return pd.DataFrame({
                "o_custkey": pd.Series([], dtype="int64"),
                "n_gaps": pd.Series([], dtype="int64"),
                "sum_gap": pd.Series([], dtype="int64"),
                "sumsq_gap": pd.Series([], dtype="int64"),
                "max_gap": pd.Series([], dtype="int64"),
            })
        gaps["sq"] = gaps["gap"] * gaps["gap"]
        out = (gaps.groupby("o_custkey", sort=False)
               .agg(n_gaps=("gap", "size"), sum_gap=("gap", "sum"),
                    sumsq_gap=("sq", "sum"), max_gap=("gap", "max"))
               .astype("int64").reset_index())
        return out

    return bucket_exchange(orders, ["o_custkey"], per_cust, num_buckets=8)


SQL_ORDER_GAP_STATS = """
WITH g AS (
  SELECT o_custkey,
         (epoch_us(o_orderdate)
          - epoch_us(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate,
                                                     o_orderkey)))
           // 86400000000 AS gap
  FROM orders
)
SELECT o_custkey,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS sum_gap,
       CAST(SUM(gap * gap) AS BIGINT) AS sumsq_gap,
       CAST(MAX(gap) AS BIGINT) AS max_gap
FROM g WHERE gap IS NOT NULL
GROUP BY o_custkey
"""


def q_token_fertility_langs(sf_dir: str):
    """Tokenizer-fertility calibration per language: corpus-level
    tokens-per-char ratio (whitespace tokens; the BPE-budget planning
    number). Arrow-native map-side partials (pc.count_substring +
    pc.utf8_length — codepoint semantics match DuckDB length()), one
    |langs|-row combine; fertility is one double division of two exact
    int64 sums."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "text"],
                      num_blocks=8)

    def counts(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        return pa.table({
            "lang": t.column("lang"),
            "tokens": pc.cast(pc.add(pc.count_substring(txt, " "), 1),
                              pa.int64()),
            "chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    agg = grouped_agg(
        docs.map_batches(counts, batch_format="pyarrow"),
        ["lang"],
        {"tokens": ("tokens", "sum"), "chars": ("chars", "sum"),
         "n_docs": ("tokens", "count")},
        num_buckets=4)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fertility"] = (df["tokens"].to_numpy(np.int64)
                           .astype(np.float64)
                           / df["chars"].to_numpy(np.int64))
        return df[["lang", "tokens", "chars", "n_docs", "fertility"]]

    return agg.map_batches(fin, batch_format="pandas")


SQL_TOKEN_FERTILITY_LANGS = """
WITH c AS (
  SELECT lang,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
           AS tok,
         CAST(length(COALESCE(text, '')) AS BIGINT) AS ch
  FROM documents
)
SELECT lang, CAST(SUM(tok) AS BIGINT) AS tokens,
       CAST(SUM(ch) AS BIGINT) AS chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CAST(SUM(tok) AS BIGINT) AS DOUBLE)
         / CAST(SUM(ch) AS BIGINT) AS fertility
FROM c GROUP BY lang
"""


def q_early_activity_profile(sf_dir: str):
    """Cold-start features: event-type counts within each user's FIRST
    five events ((ts, event_id) order — deterministic under tied
    timestamps) — the onboarding-signal profile used before enough
    history accumulates. One exchange co-locates each user; the kernel
    ranks with a stable sort + cumcount and emits only (user, type,
    n ≤ 5) rows."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        rn = df.groupby("user_id", sort=False).cumcount()
        head = df[rn < 5]
        out = (head.groupby(["user_id", "event_type"], sort=False)
               .size().rename("n").astype("int64").reset_index())
        out["user_id"] = out["user_id"].astype("int64")
        return out

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_EARLY_ACTIVITY_PROFILE = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM r WHERE rn <= 5
GROUP BY user_id, event_type
"""


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 analog: revenue from lineitems whose CUSTOMER and
    SUPPLIER share a nation (the local-supplier volume report), orders
    in 1996, grouped by nation. Revenue in exact integer microcents
    (cents × (100 − discount%); both factors fixed-2-decimal). The two
    fact tables meet in ONE partitioned hash join with the rollup fused
    into the reduce tasks (post_fn) — joined rows never leave the join
    task; the customer→nation and supplier→nation dimensions broadcast
    once via ray.put."""
    from ..functions.relational import broadcast_join, grouped_agg, hash_join

    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"],
                        num_blocks=8)

    def order_proj(df: pd.DataFrame) -> pd.DataFrame:
        y = df["o_orderdate"].dt.year.to_numpy()
        keep = df[y == 1996]
        return keep[["o_orderkey", "o_custkey"]]

    o96 = broadcast_join(
        orders.map_batches(order_proj, batch_format="pandas"),
        cust.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey",
    ).map_batches(
        lambda d: d[["o_orderkey", "c_nationkey"]].rename(
            columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        num_blocks=8)

    smap = supp.set_index("s_suppkey")["s_nationkey"]

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "s_nationkey": df["l_suppkey"].map(smap).to_numpy(np.int64),
            "microcents": cents * (100 - d100),
        })

    def local_rollup(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["s_nationkey"].to_numpy(np.int64)
               == df["c_nationkey"].to_numpy(np.int64)]
        out = (m.groupby("s_nationkey", sort=False)["microcents"].sum()
               .astype("int64").rename("revenue_microcents").reset_index()
               .rename(columns={"s_nationkey": "nationkey"}))
        return out

    joined = hash_join(
        li.map_batches(li_proj, batch_format="pandas"), o96,
        on="l_orderkey", num_buckets=8, post_fn=local_rollup)
    partial = grouped_agg(
        joined, ["nationkey"],
        {"revenue_microcents": ("revenue_microcents", "sum")}, num_buckets=4)

    nmap = nation.set_index("n_nationkey")["n_name"]

    def name_it(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_name"] = df["nationkey"].map(nmap)
        return df[["n_name", "revenue_microcents"]]

    return partial.map_batches(name_it, batch_format="pandas")


SQL_LOCAL_SUPPLIER_REVENUE = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_microcents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
  AND date_part('year', o.o_orderdate) = 1996
GROUP BY n.n_name
"""


def q_q16_part_suppliers(sf_dir: str):
    """TPC-H Q16 analog: distinct-supplier counts per part attribute
    group (brand, type-prefix class, size), excluding one brand and one
    type class — the supplier-diversity report. lineitem stands in for
    partsupp (the schema has no partsupp table). Two bounded exchanges:
    (1) the fact table dedups to distinct (partkey, suppkey) pairs,
    (2) after a broadcast join onto part attrs, distinct (attr, supp)
    rows dedup and count in a second exchange — raw lineitems never
    re-shuffle."""
    from ..functions.relational import broadcast_join, grouped_agg
    from ..stages.dedup import dedup_exact

    part = read_small(sf_dir, "part",
                      columns=["p_partkey", "p_brand", "p_type", "p_size"])
    part = part[(part["p_brand"] != "Brand#45")
                & (part["p_type"] != "MEDIUM")].copy()

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"],
                    num_blocks=8)
    pairs = dedup_exact(li, ["l_partkey", "l_suppkey"], num_buckets=8)
    attrs = broadcast_join(
        pairs, part.rename(columns={"p_partkey": "l_partkey"}),
        on="l_partkey",
    ).map_batches(
        lambda d: d[["p_brand", "p_type", "p_size", "l_suppkey"]],
        batch_format="pandas",
    )
    distinct_supp = dedup_exact(
        attrs, ["p_brand", "p_type", "p_size", "l_suppkey"], num_buckets=8)
    counted = grouped_agg(
        distinct_supp.map_batches(
            lambda d: d.assign(supplier_cnt=np.int64(1)),
            batch_format="pandas"),
        ["p_brand", "p_type", "p_size"],
        {"supplier_cnt": ("supplier_cnt", "sum")}, num_buckets=8)
    return counted


SQL_Q16_PART_SUPPLIERS = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
GROUP BY p_brand, p_type, p_size
"""


def q_session_handoff_matrix(sf_dir: str):
    """Cross-session behavior handoff: global counts of (last event
    type of session k → first event type of session k+1) per user,
    with 30-minute-gap sessionization — the re-engagement transition
    matrix (what users come BACK to do). One exchange co-locates each
    user's history; the kernel sessionizes, takes session endpoints,
    and emits bounded |types|² partials that combine in a tiny second
    exchange."""
    from ..stages.partition import bucket_exchange

    GAP_US = 1_800_000_000
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = (df["ts"].to_numpy().astype("datetime64[ns]")
              .astype(np.int64) // 1000)
        uid = df["user_id"].to_numpy(np.int64)
        prev_us = np.roll(us, 1)
        new_sess = (np.roll(uid, 1) != uid) | (us - prev_us > GAP_US)
        new_sess[0] = True
        sid = np.cumsum(new_sess)
        typ = df["event_type"].to_numpy(object)
        # session endpoints: first/last positions of each sid run
        first_pos = np.flatnonzero(new_sess)
        last_pos = np.r_[first_pos[1:] - 1, len(df) - 1]
        f = pd.DataFrame({
            "user_id": uid[first_pos],
            "sid": sid[first_pos],
            "first_type": typ[first_pos],
            "last_type": typ[last_pos],
        })
        f = f.sort_values(["user_id", "sid"], kind="mergesort")
        prev_last = f.groupby("user_id", sort=False)["last_type"].shift(1)
        h = pd.DataFrame({"from_type": prev_last,
                          "to_type": f["first_type"]})
        h = h[h["from_type"].notna()]
        out = (h.groupby(["from_type", "to_type"], sort=False)
               .size().rename("n").astype("int64").reset_index())
        return out

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["from_type", "to_type"], sort=False)["n"]
                .sum().astype("int64").reset_index())

    return bucket_exchange(partials, ["from_type", "to_type"], combine,
                           num_buckets=2)


SQL_SESSION_HANDOFF_MATRIX = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), r AS (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM s
), fl AS (
  SELECT user_id, sid,
         MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
         MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_type
  FROM r GROUP BY user_id, sid
), h AS (
  SELECT first_type AS to_type,
         LAG(last_type) OVER (PARTITION BY user_id ORDER BY sid)
           AS from_type
  FROM fl
)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM h WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
"""


def q_priority_mix_drift(sf_dir: str):
    """Month-over-month order-priority mix drift: the L1 distance
    between consecutive months' priority DISTRIBUTIONS, kept exact by
    cross-multiplying instead of dividing — Σ_p |c_m[p]·N_{m−1} −
    c_{m−1}[p]·N_m| is a pure BIGINT (shares would need per-cell
    divisions whose SUM is float-order-sensitive). Distribution-shift
    monitoring for pipeline drift alarms. Cell counts combine in one
    tiny exchange (≤ months × priorities rows); the month-lag join
    finishes driver-side on that bounded frame, chi2-style."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_orderpriority"],
                        num_blocks=8)

    def cell(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"].dt.year.to_numpy(np.int64) * 12
             + df["o_orderdate"].dt.month.to_numpy(np.int64))
        return pd.DataFrame({"m": m,
                             "pri": df["o_orderpriority"].to_numpy(object),
                             "c": np.int64(1)})

    cells = grouped_agg(
        orders.map_batches(cell, batch_format="pandas"),
        ["m", "pri"], {"c": ("c", "sum")}, num_buckets=4,
    ).to_pandas()

    totals = cells.groupby("m")["c"].sum().rename("n").reset_index()
    pris = cells["pri"].unique()
    grid = (totals[["m"]].merge(pd.DataFrame({"pri": pris}), how="cross")
            .merge(cells, on=["m", "pri"], how="left")
            .fillna({"c": 0}))
    grid["c"] = grid["c"].astype("int64")
    grid = grid.merge(totals, on="m")
    prev = grid.copy()
    prev["m"] = prev["m"] + 1
    both = grid.merge(prev, on=["m", "pri"], suffixes=("", "_prev"))
    num = np.abs(both["c"].to_numpy(np.int64)
                 * both["n_prev"].to_numpy(np.int64)
                 - both["c_prev"].to_numpy(np.int64)
                 * both["n"].to_numpy(np.int64))
    both["term"] = num
    out = (both.groupby("m", sort=False)
           .agg(drift_num=("term", "sum"), n=("n", "max"),
                n_prev=("n_prev", "max"))
           .astype("int64").reset_index())
    return out


SQL_PRIORITY_MIX_DRIFT = """
WITH mc AS (
  SELECT CAST(date_part('year', o_orderdate) * 12
              + date_part('month', o_orderdate) AS BIGINT) AS m,
         o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY m, pri
), mt AS (
  SELECT m, CAST(SUM(c) AS BIGINT) AS n FROM mc GROUP BY m
), grid AS (
  SELECT mt.m, p.pri, COALESCE(mc.c, 0) AS c, mt.n
  FROM mt CROSS JOIN (SELECT DISTINCT pri FROM mc) p
  LEFT JOIN mc ON mc.m = mt.m AND mc.pri = p.pri
)
SELECT cur.m,
       CAST(SUM(ABS(cur.c * prv.n - prv.c * cur.n)) AS BIGINT)
         AS drift_num,
       CAST(MAX(cur.n) AS BIGINT) AS n,
       CAST(MAX(prv.n) AS BIGINT) AS n_prev
FROM grid cur JOIN grid prv ON cur.pri = prv.pri AND prv.m = cur.m - 1
GROUP BY cur.m
"""


def q_nations_trade_flow(sf_dir: str):
    """TPC-H Q7 analog: shipped-revenue flow between every DISTINCT
    (supplier nation → customer nation) pair for ship-years 1996-1997 —
    the cross-border trade matrix. Same single-hash-join shape as
    local_supplier_revenue: both nation keys ride the fact rows into
    ONE partitioned join (dims broadcast once), and the ≠-pair rollup
    fuses into the reduce tasks so joined rows never leave them; only
    |nations|²×2 partials re-combine."""
    from ..functions.relational import grouped_agg, hash_join

    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    cmap = cust.set_index("c_custkey")["c_nationkey"]
    smap = supp.set_index("s_suppkey")["s_nationkey"]

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8)

    def order_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "cust_nation": df["o_custkey"].map(cmap).to_numpy(np.int64),
        })

    o_nat = orders.map_batches(order_proj, batch_format="pandas")

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        num_blocks=8)

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        y = df["l_shipdate"].dt.year.to_numpy(np.int64)
        keep = (y == 1996) | (y == 1997)
        df = df[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "supp_nation": df["l_suppkey"].map(smap).to_numpy(np.int64),
            "l_year": y[keep],
            "microcents": cents * (100 - d100),
        })

    def flow_rollup(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["supp_nation"].to_numpy(np.int64)
               != df["cust_nation"].to_numpy(np.int64)]
        return (m.groupby(["supp_nation", "cust_nation", "l_year"],
                          sort=False)["microcents"]
                .sum().astype("int64").rename("revenue_microcents")
                .reset_index())

    joined = hash_join(li.map_batches(li_proj, batch_format="pandas"), o_nat,
                       on="l_orderkey", num_buckets=8, post_fn=flow_rollup)
    return grouped_agg(
        joined, ["supp_nation", "cust_nation", "l_year"],
        {"revenue_microcents": ("revenue_microcents", "sum")}, num_buckets=4)


SQL_NATIONS_TRADE_FLOW = """
SELECT CAST(s.s_nationkey AS BIGINT) AS supp_nation,
       CAST(c.c_nationkey AS BIGINT) AS cust_nation,
       CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_microcents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE s.s_nationkey <> c.c_nationkey
  AND date_part('year', l_shipdate) IN (1996, 1997)
GROUP BY 1, 2, 3
"""


def q_part_type_margin(sf_dir: str):
    """TPC-H Q9 analog: per (supplier nation, ship year) margin on
    'red' parts — discounted revenue minus catalog value (quantity ×
    retail price; the schema has no partsupp/supplycost, retail stands
    in). Pure map + tiny combine: both dimension maps broadcast, every
    arithmetic term an exact BIGINT (microcents), zero fact-table
    shuffle — the Q9 join tree collapses because every joined attribute
    is dimension-derived."""
    from ..functions.relational import grouped_agg

    part = read_small(sf_dir, "part", columns=["p_partkey", "p_name",
                                               "p_retailprice"])
    part = part[part["p_name"].str.contains("red", regex=False)]
    rmap = (np.rint(part["p_retailprice"].to_numpy(np.float64) * 100)
            .astype(np.int64))
    rmap = pd.Series(rmap, index=part["p_partkey"].to_numpy(np.int64))
    supp = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap = supp.set_index("s_suppkey")["s_nationkey"]

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
                 "l_extendedprice", "l_discount"],
        num_blocks=8)

    def margin(df: pd.DataFrame) -> pd.DataFrame:
        retail = df["l_partkey"].map(rmap)
        keep = retail.notna().to_numpy()
        df = df[keep]
        retail_cents = retail.to_numpy(np.float64)[keep].astype(np.int64)
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
        qty = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        m = cents * (100 - d100) - qty * retail_cents * 100
        out = pd.DataFrame({
            "supp_nation": df["l_suppkey"].map(smap).to_numpy(np.int64),
            "l_year": df["l_shipdate"].dt.year.to_numpy(np.int64),
            "margin_microcents": m,
        })
        return (out.groupby(["supp_nation", "l_year"], sort=False)
                ["margin_microcents"].sum().astype("int64").reset_index())

    partials = li.map_batches(margin, batch_format="pandas")
    return grouped_agg(partials, ["supp_nation", "l_year"],
                       {"margin_microcents": ("margin_microcents", "sum")},
                       num_buckets=4)


SQL_PART_TYPE_MARGIN = """
SELECT CAST(s_nationkey AS BIGINT) AS supp_nation,
       CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                - CAST(ROUND(l_quantity) AS BIGINT)
                  * CAST(ROUND(p_retailprice * 100) AS BIGINT) * 100)
            AS BIGINT) AS margin_microcents
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q_important_parts(sf_dir: str):
    """TPC-H Q11 analog: parts whose shipped catalog value (quantity ×
    retail cents, lineitem standing in for partsupp) from suppliers in
    nations 0-4 exceeds TWICE the average per-part value — the
    'important stock' report. The threshold is average-relative
    (v·n_parts > 2·total, all BIGINT) rather than a fixed share
    because Q11's fixed fraction must shrink 1/SF to stay selective;
    this form is scale-free. Per-part values combine in one bounded
    exchange (≤|part| rows); the global comparison runs driver-side on
    that dimension-bounded frame, all integers."""
    from ..functions.relational import grouped_agg

    part = read_small(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    rmap = pd.Series(
        np.rint(part["p_retailprice"].to_numpy(np.float64) * 100
                ).astype(np.int64),
        index=part["p_partkey"].to_numpy(np.int64))
    supp = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nset = set(supp[supp["s_nationkey"] < 5]["s_suppkey"].tolist())

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"],
                    num_blocks=8)

    def value(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_suppkey"].isin(nset)]
        qty = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        pk = df["l_partkey"].to_numpy(np.int64)
        out = pd.DataFrame({
            "l_partkey": pk,
            "value_cents": qty * df["l_partkey"].map(rmap).to_numpy(np.int64),
        })
        return (out.groupby("l_partkey", sort=False)["value_cents"].sum()
                .astype("int64").reset_index())

    per_part = grouped_agg(
        li.map_batches(value, batch_format="pandas"),
        ["l_partkey"], {"value_cents": ("value_cents", "sum")},
        num_buckets=8).to_pandas()
    total = int(per_part["value_cents"].sum())
    n_parts = len(per_part)
    keep = per_part[per_part["value_cents"].to_numpy(np.int64) * n_parts
                    > 2 * total]
    return keep.reset_index(drop=True)


SQL_IMPORTANT_PARTS = """
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                  * CAST(ROUND(p_retailprice * 100) AS BIGINT))
              AS BIGINT) AS value_cents
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey < 5
  GROUP BY l_partkey
)
SELECT l_partkey, value_cents
FROM pv, (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                 CAST(SUM(value_cents) AS BIGINT) AS total FROM pv) t
WHERE value_cents * n_parts > 2 * total
"""


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15 analog: the supplier(s) with MAXIMUM shipped revenue
    in 1996H1, ties included — the 'top supplier' award query. Per-
    supplier revenue combines in one bounded exchange (≤|supplier|
    rows); the argmax + name join finish driver-side on that
    dimension-bounded frame. Revenue in exact integer microcents."""
    from ..functions.relational import grouped_agg

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-07-01")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_shipdate",
                             "l_extendedprice", "l_discount"],
                    num_blocks=8)

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["l_shipdate"].to_numpy().astype("datetime64[ns]")
        keep = (ts >= lo) & (ts < hi)
        df = df[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
        out = pd.DataFrame({"s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                            "total_revenue": cents * (100 - d100)})
        return (out.groupby("s_suppkey", sort=False)["total_revenue"].sum()
                .astype("int64").reset_index())

    per_supp = grouped_agg(
        li.map_batches(rev, batch_format="pandas"),
        ["s_suppkey"], {"total_revenue": ("total_revenue", "sum")},
        num_buckets=4).to_pandas()
    best = int(per_supp["total_revenue"].max())
    win = per_supp[per_supp["total_revenue"] == best]
    names = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return win.merge(names, on="s_suppkey").reset_index(drop=True)


SQL_TOP_SUPPLIER_REVENUE = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY 1
)
SELECT r.s_suppkey, r.total_revenue, s.s_name
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 analog: revenue locked in small-quantity orders of one
    brand — lineitems whose quantity is below 1/5 of that part's
    average order quantity. The fractional-average comparison is kept
    exact by cross-multiplying (5·q·n_p < Σq_p, all BIGINT — a float
    avg would be accumulation-order-sensitive). Two bounded passes:
    per-part (n, Σq) partials combine in a brand-sized exchange and
    broadcast back for the second scan's filter."""
    from ..functions.relational import grouped_agg

    part = read_small(sf_dir, "part", columns=["p_partkey", "p_brand"])
    brand_parts = set(
        part[part["p_brand"] == "Brand#23"]["p_partkey"].tolist())

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice"],
                    num_blocks=8)

    def pstats(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_partkey"].isin(brand_parts)]
        qty = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        out = pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy(np.int64),
                            "n_p": np.int64(1), "sum_q": qty})
        return (out.groupby("l_partkey", sort=False)
                .agg(n_p=("n_p", "sum"), sum_q=("sum_q", "sum"))
                .astype("int64").reset_index())

    stats = grouped_agg(
        li.map_batches(pstats, batch_format="pandas"),
        ["l_partkey"],
        {"n_p": ("n_p", "sum"), "sum_q": ("sum_q", "sum")},
        num_buckets=4).to_pandas()
    nmap = stats.set_index("l_partkey")["n_p"]
    qmap = stats.set_index("l_partkey")["sum_q"]

    def small(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_partkey"].isin(brand_parts)]
        qty = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        n_p = df["l_partkey"].map(nmap).to_numpy(np.int64)
        sum_q = df["l_partkey"].map(qmap).to_numpy(np.int64)
        keep = 5 * qty * n_p < sum_q
        cents = np.rint(
            df["l_extendedprice"].to_numpy(np.float64)[keep] * 100
        ).astype(np.int64)
        return pd.DataFrame({"g": np.zeros(1, np.int64),
                             "total_cents": [int(cents.sum())],
                             "n_lines": [int(keep.sum())]})

    out = grouped_agg(
        li.map_batches(small, batch_format="pandas"),
        ["g"], {"total_cents": ("total_cents", "sum"),
                "n_lines": ("n_lines", "sum")}, num_buckets=1).to_pandas()
    return out[["total_cents", "n_lines"]]


SQL_SMALL_QTY_REVENUE = """
WITH pq AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_p,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23'
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE 5 * CAST(ROUND(l_quantity) AS BIGINT) * n_p < sum_q
"""


def q_ored_brand_revenue(sf_dir: str):
    """TPC-H Q19 analog: discounted revenue from three disjunctive
    (brand, size range, quantity range) predicates — the OR-of-ANDs
    shape that defeats naive predicate pushdown. The three brands'
    (partkey → size) maps broadcast once; the whole query is one
    vectorized scan with per-batch one-row partials, no shuffle."""
    from ..functions.relational import grouped_agg

    CASES = [("Brand#12", 5, 1, 11), ("Brand#23", 10, 10, 20),
             ("Brand#24", 15, 20, 30)]
    part = read_small(sf_dir, "part",
                      columns=["p_partkey", "p_brand", "p_size"])
    part = part[part["p_brand"].isin([c[0] for c in CASES])]
    bmap = part.set_index("p_partkey")["p_brand"]
    szmap = part.set_index("p_partkey")["p_size"]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice", "l_discount"],
                    num_blocks=8)

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        brand = df["l_partkey"].map(bmap)
        hit = brand.notna().to_numpy()
        df, brand = df[hit], brand[hit]
        size = df["l_partkey"].map(szmap).to_numpy(np.int64)
        qty = np.rint(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        b = brand.to_numpy(object)
        keep = np.zeros(len(df), bool)
        for bname, szmax, qlo, qhi in CASES:
            keep |= ((b == bname) & (size >= 1) & (size <= szmax)
                     & (qty >= qlo) & (qty <= qhi))
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64)[keep]
                        * 100).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(np.float64)[keep]
                       * 100).astype(np.int64)
        return pd.DataFrame({
            "g": np.zeros(1, np.int64),
            "revenue_microcents": [int((cents * (100 - d100)).sum())],
            "n_lines": [int(keep.sum())],
        })

    out = grouped_agg(
        li.map_batches(rev, batch_format="pandas"),
        ["g"], {"revenue_microcents": ("revenue_microcents", "sum"),
                "n_lines": ("n_lines", "sum")}, num_buckets=1).to_pandas()
    return out[["revenue_microcents", "n_lines"]]


SQL_ORED_BRAND_REVENUE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_microcents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_sales_opportunity(sf_dir: str):
    """TPC-H Q22 analog: per-nation count + balance of above-average-
    balance customers with NO order since 2000-07-01 — the lapsed-
    high-value-customer report. The avg comparison cross-multiplies
    exact FLOOR-cents (cents·n_pos > Σ_pos; acctbal is NOT fixed-
    decimal, so FLOOR — identical on IEEE doubles in numpy and DuckDB —
    is the only safe grid). Recent custkeys dedup in one bounded
    exchange and broadcast into an anti semi-join probe; customers
    stream, nothing materializes beyond dimension-bounded frames."""
    from ..functions.relational import grouped_agg, semi_join
    from ..stages.dedup import dedup_exact

    cutoff = pd.Timestamp("2000-07-01")
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"], num_blocks=8)
    recent = dedup_exact(
        orders.map_batches(
            lambda d: d[d["o_orderdate"] >= cutoff][["o_custkey"]].rename(
                columns={"o_custkey": "c_custkey"}),
            batch_format="pandas"),
        ["c_custkey"], num_buckets=4).to_pandas()

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"],
                      num_blocks=4)

    def pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["c_acctbal"].to_numpy(np.float64) * 100
                         ).astype(np.int64)
        pos = cents[cents > 0]
        return pd.DataFrame({"g": np.zeros(1, np.int64),
                             "n_pos": [len(pos)],
                             "sum_pos": [int(pos.sum())]})

    pos = grouped_agg(
        cust.map_batches(pos_partial, batch_format="pandas"),
        ["g"], {"n_pos": ("n_pos", "sum"), "sum_pos": ("sum_pos", "sum")},
        num_buckets=1).to_pandas()
    n_pos = int(pos["n_pos"].iloc[0])
    sum_pos = int(pos["sum_pos"].iloc[0])

    lapsed = semi_join(cust, recent, on="c_custkey", anti=True)

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["c_acctbal"].to_numpy(np.float64) * 100
                         ).astype(np.int64)
        keep = cents * n_pos > sum_pos
        out = pd.DataFrame({
            "c_nationkey": df["c_nationkey"].to_numpy(np.int64)[keep],
            "numcust": np.int64(1), "total_cents": cents[keep]})
        return (out.groupby("c_nationkey", sort=False)
                .agg(numcust=("numcust", "sum"),
                     total_cents=("total_cents", "sum"))
                .astype("int64").reset_index())

    return grouped_agg(
        lapsed.map_batches(per_nation, batch_format="pandas"),
        ["c_nationkey"], {"numcust": ("numcust", "sum"),
                          "total_cents": ("total_cents", "sum")},
        num_buckets=4)


SQL_SALES_OPPORTUNITY = """
WITH pos AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_pos
  FROM customer WHERE FLOOR(c_acctbal * 100) > 0
), recent AS (
  SELECT DISTINCT o_custkey
  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-07-01'
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM customer, pos
WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) * n_pos > sum_pos
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY 1
"""


def q_type_lift_pairs(sf_dir: str):
    """Bipartite co-incidence projection with exact lift terms: for
    every unordered event-type pair, how many users did BOTH, alongside
    each type's user count and the global user count — lift compares as
    n_both·N vs n_a·n_b without a single division (all BIGINT). The
    user–type incidence dedups in one exchange; a second exchange
    co-locates each user's (≤|types|) rows and self-merges them into
    C(T,2) pair partials, so raw events never pair up."""
    from ..functions.relational import grouped_agg
    from ..stages.dedup import dedup_exact
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"],
                    num_blocks=8)
    d = dedup_exact(ev, ["user_id", "event_type"], num_buckets=8)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"type_a": pd.Series([], dtype=object),
                                 "type_b": pd.Series([], dtype=object),
                                 "n_both": pd.Series([], dtype="int64")})
        m = df[["user_id", "event_type"]].merge(
            df[["user_id", "event_type"]], on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        return (m.groupby(["event_type_x", "event_type_y"], sort=False)
                .size().rename("n_both").astype("int64").reset_index()
                .rename(columns={"event_type_x": "type_a",
                                 "event_type_y": "type_b"}))

    pair_counts = grouped_agg(
        bucket_exchange(d, ["user_id"], pairs, num_buckets=8),
        ["type_a", "type_b"], {"n_both": ("n_both", "sum")},
        num_buckets=2).to_pandas()

    totals = grouped_agg(
        d.map_batches(lambda f: f.assign(n=np.int64(1)),
                      batch_format="pandas"),
        ["event_type"], {"n": ("n", "sum")}, num_buckets=2).to_pandas()
    tmap = totals.set_index("event_type")["n"]
    n_users = int(dedup_exact(d, ["user_id"], num_buckets=8).count())

    out = pair_counts.copy()
    out["n_a"] = out["type_a"].map(tmap).astype("int64")
    out["n_b"] = out["type_b"].map(tmap).astype("int64")
    out["n_users"] = np.int64(n_users)
    return out


SQL_TYPE_LIFT_PAIRS = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM d a JOIN d b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM d)
SELECT type_a, type_b, n_both, t1.n AS n_a, t2.n AS n_b, n_users
FROM p
JOIN t t1 ON t1.event_type = type_a
JOIN t t2 ON t2.event_type = type_b, u
"""


def q_cheapest_two_hop(sf_dir: str):
    """Min-plus (tropical) path relaxation over the nation trade graph:
    cheapest single lineitem per (supplier nation → customer nation)
    edge, then the cheapest TWO-hop route per ordered pair via one
    min-plus step — the semiring generalization of a 2-hop join.
    Edge extraction is the same fused hash join as nations_trade_flow
    with MIN fused into the reduce tasks; the min-plus step runs
    driver-side on the |V|²-bounded edge list (625 rows)."""
    from ..functions.relational import grouped_agg, hash_join

    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    cmap = cust.set_index("c_custkey")["c_nationkey"]
    smap = supp.set_index("s_suppkey")["s_nationkey"]

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                        num_blocks=8)
    o_nat = orders.map_batches(
        lambda df: pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "cust_nation": df["o_custkey"].map(cmap).to_numpy(np.int64)}),
        batch_format="pandas")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"],
                    num_blocks=8)

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "supp_nation": df["l_suppkey"].map(smap).to_numpy(np.int64),
            "microcents": cents * (100 - d100)})

    def min_edge(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["supp_nation"].to_numpy(np.int64)
               != df["cust_nation"].to_numpy(np.int64)]
        return (m.groupby(["supp_nation", "cust_nation"], sort=False)
                ["microcents"].min().astype("int64")
                .rename("edge_microcents").reset_index())

    edges = grouped_agg(
        hash_join(li.map_batches(li_proj, batch_format="pandas"), o_nat,
                  on="l_orderkey", num_buckets=8, post_fn=min_edge),
        ["supp_nation", "cust_nation"],
        {"edge_microcents": ("edge_microcents", "min")},
        num_buckets=2).to_pandas()

    a = edges.rename(columns={"supp_nation": "src", "cust_nation": "mid",
                              "edge_microcents": "m1"})
    b = edges.rename(columns={"supp_nation": "mid", "cust_nation": "dst",
                              "edge_microcents": "m2"})
    two = a.merge(b, on="mid")
    two = two[two["src"] != two["dst"]]
    two["hop_sum"] = two["m1"] + two["m2"]
    best = (two.groupby(["src", "dst"], sort=False)["hop_sum"].min()
            .astype("int64").rename("two_hop_microcents").reset_index())
    direct = edges.rename(columns={"supp_nation": "src",
                                   "cust_nation": "dst",
                                   "edge_microcents": "direct_microcents"})
    return best.merge(direct, on=["src", "dst"], how="left")


SQL_CHEAPEST_TWO_HOP = """
WITH e AS (
  SELECT CAST(s.s_nationkey AS BIGINT) AS supp_nation,
         CAST(c.c_nationkey AS BIGINT) AS cust_nation,
         CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS m
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
),
t AS (
  SELECT a.supp_nation AS src, b.cust_nation AS dst,
         CAST(MIN(a.m + b.m) AS BIGINT) AS two_hop_microcents
  FROM e a JOIN e b ON a.cust_nation = b.supp_nation
  WHERE a.supp_nation <> b.cust_nation
  GROUP BY 1, 2
)
SELECT t.src, t.dst, t.two_hop_microcents, e.m AS direct_microcents
FROM t LEFT JOIN e ON e.supp_nation = t.src AND e.cust_nation = t.dst
"""


def q_label_inertia(sf_dir: str):
    """Exact within-cluster scatter (k-means inertia) per embedding
    label on the int8-quantized vectors: n²·Σ_d Q_d − n·Σ_d S_d² equals
    n² × Σ_rows‖q − mean‖² without ever forming the fractional mean —
    pure BIGINT. Partials are (label, pos, Σq, Σq², count) rows
    (labels×dims bounded) from one vectorized pass; one tiny exchange
    combines them. At ≫1e5 rows per label the n³-scaled term would
    need the unbounded-int-as-string pattern (grouped_linear_trend)."""
    from ..functions.ann import _quantize_rows
    from ..functions.relational import grouped_agg

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding", "label"], num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        M = np.asarray(list(df["embedding"]), dtype=np.float64)
        q, _ = _quantize_rows(M)
        q = q.astype(np.int64)
        lab = df["label"].to_numpy(np.int64)
        frames = []
        for lb in np.unique(lab):
            rows = q[lab == lb]
            d = rows.shape[1]
            frames.append(pd.DataFrame({
                "label": np.full(d, lb, np.int64),
                "pos": np.arange(d, dtype=np.int64),
                "s_d": rows.sum(axis=0),
                "q2_d": (rows * rows).sum(axis=0),
                "n": np.full(d, len(rows), np.int64)}))
        return pd.concat(frames, ignore_index=True)

    agg = grouped_agg(
        emb.map_batches(partial, batch_format="pandas"),
        ["label", "pos"],
        {"s_d": ("s_d", "sum"), "q2_d": ("q2_d", "sum"), "n": ("n", "sum")},
        num_buckets=2).to_pandas()

    out_rows = []
    for lb, g in agg.groupby("label"):
        n = int(g["n"].iloc[0])
        inertia = n * n * int(g["q2_d"].sum()) - n * int(
            (g["s_d"].astype(object) ** 2).sum())
        out_rows.append({"label": int(lb), "n": n,
                         "inertia_scaled": inertia})
    out = pd.DataFrame(out_rows)
    out["label"] = out["label"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["inertia_scaled"] = out["inertia_scaled"].astype("int64")
    return out


SQL_LABEL_INERTIA = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), s AS (
  SELECT vec_id, label, emb,
         list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS scale
  FROM e
), qv AS (
  SELECT label,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                     -127) AS BIGINT) END)) AS q
  FROM s
), a AS (
  SELECT label, pos, CAST(SUM(q) AS BIGINT) AS s_d,
         CAST(SUM(q * q) AS BIGINT) AS q2_d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM qv GROUP BY label, pos
)
SELECT CAST(label AS BIGINT) AS label, MAX(n) AS n,
       CAST(MAX(n) * MAX(n) * SUM(q2_d) - MAX(n) * SUM(s_d * s_d)
            AS BIGINT) AS inertia_scaled
FROM a GROUP BY label
"""


def q_order_total_reconciliation(sf_dir: str):
    """Cross-table financial reconciliation: per order status, how many
    orders' stored o_totalprice disagrees (> $1) with the total
    RECOMPUTED from its lineitems as Σ cents·(100−disc)·(100+tax) —
    both sides in exact integer microdollars, so the tolerance test is
    deterministic. One partitioned hash join co-locates each order with
    its lineitems; the per-order compare and the per-status counts fuse
    into the reduce tasks (post_fn), so only |status| partials leave."""
    from ..functions.relational import grouped_agg, hash_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderstatus",
                                 "o_totalprice"], num_blocks=8)

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "status": df["o_orderstatus"].to_numpy(object),
            "total_units": np.rint(
                df["o_totalprice"].to_numpy(np.float64) * 100
            ).astype(np.int64) * 10000})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount", "l_tax"], num_blocks=8)

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
        t100 = np.rint(df["l_tax"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "calc_units": cents * (100 - d100) * (100 + t100)})

    def reconcile(df: pd.DataFrame) -> pd.DataFrame:
        per = (df.groupby("l_orderkey", sort=False)
               .agg(status=("status", "first"),
                    total_units=("total_units", "first"),
                    calc_units=("calc_units", "sum")))
        bad = (np.abs(per["calc_units"].to_numpy(np.int64)
                      - per["total_units"].to_numpy(np.int64))
               > 1_000_000)
        per = per.assign(n_orders=np.int64(1),
                         n_mismatch=bad.astype(np.int64))
        return (per.groupby("status", sort=False)
                .agg(n_orders=("n_orders", "sum"),
                     n_mismatch=("n_mismatch", "sum"))
                .astype("int64").reset_index())

    joined = hash_join(orders.map_batches(o_proj, batch_format="pandas"),
                       li.map_batches(li_proj, batch_format="pandas"),
                       on="l_orderkey", num_buckets=8, post_fn=reconcile)
    return grouped_agg(joined, ["status"],
                       {"n_orders": ("n_orders", "sum"),
                        "n_mismatch": ("n_mismatch", "sum")}, num_buckets=2)


SQL_ORDER_TOTAL_RECONCILIATION = """
WITH per AS (
  SELECT o.o_orderkey, o.o_orderstatus AS status,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000 AS total_units,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                  * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
              AS BIGINT) AS calc_units
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN ABS(calc_units - total_units) > 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
FROM per GROUP BY status
"""


def q_decile_revenue_share(sf_dir: str):
    """Customer revenue deciles (NTILE(10) over total order value,
    custkey tiebreak): customer count and exact revenue cents per
    decile — the concentration-curve table behind 'top decile drives X%
    of revenue'. Per-customer revenue combines in one bounded exchange
    (≤|customer| rows); NTILE bucketing replicates DuckDB's
    first-buckets-get-the-remainder convention on that dimension-
    bounded frame driver-side."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"], num_blocks=8)

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "rev": np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                           ).astype(np.int64)})
        return (out.groupby("o_custkey", sort=False)["rev"].sum()
                .astype("int64").reset_index())

    per_cust = grouped_agg(
        orders.map_batches(rev, batch_format="pandas"),
        ["o_custkey"], {"rev": ("rev", "sum")}, num_buckets=8).to_pandas()

    per_cust = per_cust.sort_values(["rev", "o_custkey"],
                                    kind="mergesort").reset_index(drop=True)
    n, k = len(per_cust), 10
    q, r = divmod(n, k)
    i = np.arange(n)
    # NTILE: first r buckets get q+1 rows, the rest get q
    decile = np.where(i < r * (q + 1),
                      i // (q + 1),
                      r + (i - r * (q + 1)) // max(q, 1)) + 1
    per_cust["decile"] = decile.astype(np.int64)
    out = (per_cust.groupby("decile", sort=False)
           .agg(n_custs=("o_custkey", "size"),
                revenue_cents=("rev", "sum"))
           .astype("int64").reset_index())
    return out


SQL_DECILE_REVENUE_SHARE = """
WITH cr AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
), nt AS (
  SELECT o_custkey, rev,
         NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
  FROM cr
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents
FROM nt GROUP BY 1
"""


def q_zorder_parts(sf_dir: str):
    """Z-order (Morton) space-filling-curve bucketing — the layout
    primitive behind multi-dimensional data clustering (Delta/Iceberg
    OPTIMIZE ZORDER): interleave the bits of two dimensions so ranges of
    the curve are 2-D-local, then stat each curve block. p_size (6 bits)
    and $2 price buckets (6 bits) interleave to a 12-bit code; blocks of
    16 cells aggregate in one tiny exchange. The bit interleave is pure
    integer arithmetic, replayed operator-for-operator in SQL."""
    from ..functions.relational import grouped_agg

    parts = read_table(sf_dir, "part",
                       columns=["p_size", "p_retailprice"], num_blocks=8)

    def morton(df: pd.DataFrame) -> pd.DataFrame:
        x = df["p_size"].to_numpy(np.int64)
        cents = np.rint(df["p_retailprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        y = np.clip((cents - 90000) // 200, 0, 63)
        z = np.zeros(len(df), np.int64)
        for i in range(6):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return pd.DataFrame({"z_block": (z >> 4).astype(np.int64),
                             "n_parts": np.ones(len(df), np.int64),
                             "sum_cents": cents})

    return grouped_agg(
        parts.map_batches(morton, batch_format="pandas"),
        ["z_block"],
        {"n_parts": ("n_parts", "sum"), "sum_cents": ("sum_cents", "sum")},
        num_buckets=2)


SQL_ZORDER_PARTS = """
WITH m AS (
  SELECT CAST(p_size AS BIGINT) AS x,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
         GREATEST(LEAST((CAST(ROUND(p_retailprice * 100) AS BIGINT)
                         - 90000) // 200, 63), 0) AS y
  FROM part
), z AS (
  SELECT cents,
         (((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1)
       | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)
       | (((x >> 2) & 1) << 4) | (((y >> 2) & 1) << 5)
       | (((x >> 3) & 1) << 6) | (((y >> 3) & 1) << 7)
       | (((x >> 4) & 1) << 8) | (((y >> 4) & 1) << 9)
       | (((x >> 5) & 1) << 10) | (((y >> 5) & 1) << 11) AS zc
  FROM m
)
SELECT CAST(zc >> 4 AS BIGINT) AS z_block,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM z GROUP BY 1
"""


_TF_COSINE_DF_CAP = 5
_TF_COSINE_NUM = 1  # sim >= 1/2:  4*dot^2 >= norm_a*norm_b
_TF_COSINE_DEN = 4


def q_tf_cosine_pairs_docs(sf_dir: str):
    """Integer term-frequency cosine similarity join, EXACT at a
    rational threshold: doc pairs whose word-TRIGRAM TF-cosine is
    >= 1/2, tested as 4·dot² >= ‖a‖²·‖b‖² — no square root, no float.
    Vectors live on trigrams with document frequency in [2, 5] (df-1
    dims contribute nothing to any dot), so the trigram-partitioned
    inverted index is LOSSLESS (any pair with dot > 0 shares a rare
    trigram) and each trigram contributes <= C(5,2) pair partials. Dot
    products and norms combine in bounded exchanges; two partitioned
    hash joins attach the norms — text never pairs up."""
    from ..functions.relational import grouped_agg, hash_join
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for did, txt in zip(df["doc_id"].to_numpy(np.int64),
                            df["text"].fillna("")):
            ws = txt.split(" ")
            for i in range(len(ws) - 2):
                ids.append(did)
                toks.append(" ".join(ws[i:i + 3]))
        out = pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                            "tok": np.asarray(toks, object)})
        return (out.groupby(["doc_id", "tok"], sort=False)
                .size().rename("tf").astype("int64").reset_index())

    tf = grouped_agg(
        docs.map_batches(tf_rows, batch_format="pandas"),
        ["doc_id", "tok"], {"tf": ("tf", "sum")}, num_buckets=16)

    def per_token(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, g in df.groupby("tok", sort=False):
            if not 2 <= len(g) <= _TF_COSINE_DF_CAP:
                continue
            g = g.sort_values("doc_id", kind="mergesort")
            d = g["doc_id"].to_numpy(np.int64)
            t = g["tf"].to_numpy(np.int64)
            # norm contributions (rare tokens only define the vectors)
            parts.append(pd.DataFrame({
                "doc_a": d, "doc_b": d, "dot": np.int64(0),
                "nrm": t * t}))
            if len(g) > 1:
                ia, ib = np.triu_indices(len(g), k=1)
                parts.append(pd.DataFrame({
                    "doc_a": d[ia], "doc_b": d[ib],
                    "dot": t[ia] * t[ib],
                    "nrm": np.zeros(len(ia), np.int64)}))
        if not parts:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "dot": pd.Series([], dtype="int64"),
                                 "nrm": pd.Series([], dtype="int64")})
        return pd.concat(parts, ignore_index=True)

    partials = bucket_exchange(tf, ["tok"], per_token, num_buckets=16)
    combined = grouped_agg(
        partials, ["doc_a", "doc_b"],
        {"dot": ("dot", "sum"), "nrm": ("nrm", "sum")}, num_buckets=16)

    both = combined.materialize()  # three consumers below
    dots = both.map_batches(
        lambda t: t.filter(pc.not_equal(t["doc_a"], t["doc_b"]))
        .select(["doc_a", "doc_b", "dot"]),
        batch_format="pyarrow")
    norms_a = both.map_batches(
        lambda t: pa.table({"doc_a": t.filter(
            pc.equal(t["doc_a"], t["doc_b"]))["doc_a"],
            "norm_a": t.filter(
                pc.equal(t["doc_a"], t["doc_b"]))["nrm"]}),
        batch_format="pyarrow")
    norms_b = both.map_batches(
        lambda t: pa.table({"doc_b": t.filter(
            pc.equal(t["doc_a"], t["doc_b"]))["doc_a"],
            "norm_b": t.filter(
                pc.equal(t["doc_a"], t["doc_b"]))["nrm"]}),
        batch_format="pyarrow")

    j1 = hash_join(dots, norms_a, on="doc_a", num_buckets=8)
    j2 = hash_join(j1, norms_b, on="doc_b", num_buckets=8)

    def accept(t: pa.Table) -> pa.Table:
        # int64-safe: dot < 1e6 here, so 25*dot^2 < 2.5e13 << 2^63
        dot = t["dot"]
        lhs = pc.multiply(pc.multiply(dot, dot),
                          pa.scalar(_TF_COSINE_DEN, pa.int64()))
        rhs = pc.multiply(pc.multiply(t["norm_a"], t["norm_b"]),
                          pa.scalar(_TF_COSINE_NUM, pa.int64()))
        keep = pc.and_(pc.greater_equal(lhs, rhs),
                       pc.greater(dot, pa.scalar(0, pa.int64())))
        return t.select(["doc_a", "doc_b", "dot", "norm_a",
                         "norm_b"]).filter(keep)

    return j2.map_batches(accept, batch_format="pyarrow")


SQL_TF_COSINE_PAIRS_DOCS = """
WITH words AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
  FROM documents
), toks AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id,
           ws[CAST(i + 1 AS INT)] || ' ' || ws[CAST(i + 2 AS INT)]
             || ' ' || ws[CAST(i + 3 AS INT)] AS tok
    FROM words, unnest(range(len(ws) - 2)) t(i))
  GROUP BY 1, 2
), rare AS (
  SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) BETWEEN 2 AND 5
), v AS (
  SELECT t.doc_id, t.tok, t.tf FROM toks t JOIN rare r ON t.tok = r.tok
), norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS nrm FROM v GROUP BY 1
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM v a JOIN v b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot, na.nrm AS norm_a, nb.nrm AS norm_b
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE 4 * dot * dot >= na.nrm * nb.nrm AND dot > 0
"""


def q_rle_runs_events(sf_dir: str):
    """Run-length profile of the GLOBAL event-time order — how many
    value runs each column would RLE-compress to if the table were laid
    out sorted by (ts, event_id): the statistic behind sort-key /
    clustering-layout decisions. Distributed as range partitions over
    ts (cuts from a thin sample, exact regardless of balance): each
    range sorts locally and counts internal changes; only per-range
    (count, first, last) summaries — 2·buckets rows — reach the driver,
    which stitches the range boundaries."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "event_type", "user_id"],
                    num_blocks=8)
    ev = ev.materialize()  # consumed twice: sample + exchange

    sample = ev.map_batches(
        lambda df: df[["ts"]].iloc[:: max(1, len(df) // 32)],
        batch_format="pandas").to_pandas()
    keys = np.sort(sample["ts"].to_numpy())
    nb = 8
    if len(keys) > 1:
        qpos = (np.linspace(0, 1, nb + 1)[1:-1] * (len(keys) - 1)).astype(int)
        cuts = np.unique(keys[qpos])
    else:
        cuts = keys[:0]
    n_ranges = len(cuts) + 1

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(cuts, df["ts"].to_numpy(), side="right")
        return df.assign(_rng=b.astype(np.int64))

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["_rng", "n_rows", "type_changes", "user_changes",
                "first_type", "last_type", "first_user", "last_user"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in cols})
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        t = df["event_type"].to_numpy(object)
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "_rng": [int(df["_rng"].iloc[0])],
            "n_rows": [len(df)],
            "type_changes": [int((t[1:] != t[:-1]).sum())],
            "user_changes": [int((u[1:] != u[:-1]).sum())],
            "first_type": [t[0]], "last_type": [t[-1]],
            "first_user": [int(u[0])], "last_user": [int(u[-1])]})

    summaries = bucket_exchange(
        ev.map_batches(with_bucket, batch_format="pandas"),
        ["_rng"], per_range, num_buckets=n_ranges,
        bucket_col="_rng").to_pandas()
    summaries = summaries.dropna(subset=["_rng"]).sort_values("_rng")

    n_rows = int(summaries["n_rows"].sum())
    type_runs = int(summaries["type_changes"].sum())
    user_runs = int(summaries["user_changes"].sum())
    prev = None
    for _, row in summaries.iterrows():
        if prev is not None:
            type_runs += int(row["first_type"] != prev["last_type"])
            user_runs += int(row["first_user"] != prev["last_user"])
        else:
            type_runs += 1  # the very first row opens a run
            user_runs += 1
        prev = row
    return pd.DataFrame({"n_rows": [np.int64(n_rows)],
                         "type_runs": [np.int64(type_runs)],
                         "user_runs": [np.int64(user_runs)]})


SQL_RLE_RUNS_EVENTS = """
WITH o AS (
  SELECT event_type, user_id,
         LAG(event_type) OVER (ORDER BY ts, event_id) AS pt,
         LAG(user_id) OVER (ORDER BY ts, event_id) AS pu
  FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN pt IS NULL OR event_type <> pt
                     THEN 1 ELSE 0 END) AS BIGINT) AS type_runs,
       CAST(SUM(CASE WHEN pu IS NULL OR user_id <> pu
                     THEN 1 ELSE 0 END) AS BIGINT) AS user_runs
FROM o
"""


def q_order_line_signature(sf_dir: str):
    """Distributed ORDERED string aggregation (SQL string_agg with an
    ORDER BY): per order, the concatenation of its one-char linestatus
    flags in (linenumber, flag) order — the flag itself is the final
    sort key, so duplicate linenumbers commute and the signature is
    deterministic — then the global signature histogram. One order-keyed
    exchange builds signatures; a tiny second exchange counts them."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_linestatus"],
                    num_blocks=8)

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"signature": pd.Series([], dtype=object),
                                 "n_orders": pd.Series([], dtype="int64")})
        df = df.sort_values(["l_orderkey", "l_linenumber", "l_linestatus"],
                            kind="mergesort")
        sig = (df.groupby("l_orderkey", sort=False)["l_linestatus"]
               .agg("".join))
        return (sig.value_counts().rename("n_orders").astype("int64")
                .rename_axis("signature").reset_index())

    partials = bucket_exchange(li, ["l_orderkey"], sigs, num_buckets=8)
    return grouped_agg(partials, ["signature"],
                       {"n_orders": ("n_orders", "sum")}, num_buckets=2)


SQL_ORDER_LINE_SIGNATURE = """
WITH s AS (
  SELECT l_orderkey,
         string_agg(l_linestatus, ''
                    ORDER BY l_linenumber, l_linestatus) AS signature
  FROM lineitem GROUP BY 1
)
SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM s GROUP BY 1
"""


_BPE_SEP = "\x1f"


def bpe_train_reference(texts, n_merges: int = 5):
    """Single-process BPE merge training (Sennrich et al. 2016
    semantics, word-internal, greedy left-to-right non-overlapping
    application) — the equality oracle for :func:`q_bpe_train_docs`."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                wc[w] += 1
    seqs = {w: _BPE_SEP.join(w) for w in wc}
    merges = []
    for it in range(1, n_merges + 1):
        pairs = Counter()
        for w, c in wc.items():
            syms = seqs[w].split(_BPE_SEP)
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        left, right = min(p for p, c in pairs.items() if c == best_n)
        merges.append((it, left, right, best_n))
        pat = left + _BPE_SEP + right
        rep = left + right
        for w in seqs:
            seqs[w] = seqs[w].replace(pat, rep)
    return pd.DataFrame(merges,
                        columns=["iteration", "left", "right", "n"])


def q_bpe_train_docs(sf_dir: str):
    """Distributed BPE tokenizer TRAINING (5 merge iterations): the
    iterative heart of subword-vocab construction. The word-frequency
    table is built once (one exchange) and stays distributed; each
    iteration is a vectorizable pair-count map over vocab rows, a tiny
    (symbol-pair-bounded) combine, a 1-row argmax pulled driver-side,
    and a broadcast merge applied map-side — per-iteration traffic is
    pair partials, never the corpus. Greedy left-to-right
    non-overlapping merge application (Sennrich et al. 2016). Rows-only
    driver check; pinned vs the single-process reference by test."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text"])

    def words(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c = Counter()
        for t in df["text"].fillna(""):
            for w in t.split(" "):
                if w:
                    c[w] += 1
        return pd.DataFrame({"word": list(c.keys()),
                             "n": np.fromiter(c.values(), np.int64,
                                              len(c))})

    wc = grouped_agg(docs.map_batches(words, batch_format="pandas"),
                     ["word"], {"n": ("n", "sum")}, num_buckets=8)
    wc = wc.map_batches(
        lambda df: df.assign(syms=[_BPE_SEP.join(w) for w in df["word"]]),
        batch_format="pandas").materialize()

    merges = []
    for it in range(1, 6):
        def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
            from collections import Counter

            c = Counter()
            for syms, n in zip(df["syms"], df["n"].to_numpy(np.int64)):
                parts = syms.split(_BPE_SEP)
                for a, b in zip(parts, parts[1:]):
                    c[(a, b)] += int(n)
            if not c:
                return pd.DataFrame({"left": pd.Series([], dtype=object),
                                     "right": pd.Series([], dtype=object),
                                     "pn": pd.Series([], dtype="int64")})
            ks = list(c.keys())
            return pd.DataFrame({
                "left": [k[0] for k in ks],
                "right": [k[1] for k in ks],
                "pn": np.fromiter(c.values(), np.int64, len(ks))})

        pairs = grouped_agg(
            wc.map_batches(pair_rows, batch_format="pandas"),
            ["left", "right"], {"pn": ("pn", "sum")},
            num_buckets=4).to_pandas()
        if pairs.empty:
            break
        best_n = int(pairs["pn"].max())
        top = pairs[pairs["pn"] == best_n].sort_values(
            ["left", "right"], kind="mergesort").iloc[0]
        left, right = str(top["left"]), str(top["right"])
        merges.append((it, left, right, best_n))
        pat, rep = left + _BPE_SEP + right, left + right

        def apply_merge(df: pd.DataFrame, pat=pat, rep=rep) -> pd.DataFrame:
            return df.assign(
                syms=df["syms"].str.replace(pat, rep, regex=False))

        wc = wc.map_batches(apply_merge, batch_format="pandas").materialize()

    out = pd.DataFrame(merges, columns=["iteration", "left", "right", "n"])
    out["iteration"] = out["iteration"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_busday_latency_orders(sf_dir: str):
    """Business-day fulfillment latency (order date → first ship date,
    weekends excluded) per order priority — the calendar-aware SLA
    metric. numpy's ``busday_count`` half-open [order, ship) convention
    is mirrored in SQL as an exploded weekday count, so the integers
    hash-compare exactly. First-ship MINs combine in the lineitem
    exchange; the per-priority partials fuse into the hash-join reduce
    tasks (post_fn) — joined rows never leave the task."""
    from ..functions.relational import grouped_agg, hash_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"], num_blocks=8)
    o_proj = orders.map_batches(
        lambda df: pd.DataFrame({
            "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "od": df["o_orderdate"].astype("datetime64[ns]"),
            "priority": df["o_orderpriority"].to_numpy(object)}),
        batch_format="pandas")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"], num_blocks=8)
    first_ship = grouped_agg(
        li.map_batches(
            lambda df: pd.DataFrame({
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "ship": df["l_shipdate"].astype("datetime64[ns]")}),
            batch_format="pandas"),
        ["l_orderkey"], {"ship": ("ship", "min")}, num_buckets=8)

    def latency(df: pd.DataFrame) -> pd.DataFrame:
        od = df["od"].to_numpy("datetime64[D]")
        ship = df["ship"].to_numpy("datetime64[D]")
        keep = ship >= od
        if not keep.any():
            return pd.DataFrame({
                "priority": pd.Series([], dtype=object),
                "n_orders": pd.Series([], dtype="int64"),
                "sum_busdays": pd.Series([], dtype="int64"),
                "max_busdays": pd.Series([], dtype="int64")})
        bus = np.busday_count(od[keep], ship[keep]).astype(np.int64)
        out = pd.DataFrame({"priority": df["priority"].to_numpy(object)[keep],
                            "busdays": bus})
        return (out.groupby("priority", sort=False)["busdays"]
                .agg(n_orders="size", sum_busdays="sum", max_busdays="max")
                .astype("int64").reset_index())

    joined = hash_join(o_proj, first_ship, on="l_orderkey",
                       num_buckets=8, post_fn=latency)
    return grouped_agg(joined, ["priority"],
                       {"n_orders": ("n_orders", "sum"),
                        "sum_busdays": ("sum_busdays", "sum"),
                        "max_busdays": ("max_busdays", "max")},
                       num_buckets=2)


SQL_BUSDAY_LATENCY_ORDERS = """
WITH f AS (
  SELECT l_orderkey, MIN(l_shipdate) AS ship FROM lineitem GROUP BY 1
), x AS (
  SELECT o.o_orderkey, o.o_orderpriority AS priority,
         o.o_orderdate AS od, f.ship
  FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
  WHERE f.ship >= o.o_orderdate
), e AS (
  SELECT o_orderkey,
         CAST(SUM(CASE WHEN isodow(od + i * INTERVAL 1 DAY) <= 5
                       THEN 1 ELSE 0 END) AS BIGINT) AS busdays
  FROM x, unnest(range(date_diff('day', od, ship))) t(i)
  GROUP BY 1
), b AS (
  SELECT x.priority, COALESCE(e.busdays, 0) AS busdays
  FROM x LEFT JOIN e ON e.o_orderkey = x.o_orderkey
)
SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(busdays) AS BIGINT) AS sum_busdays,
       CAST(MAX(busdays) AS BIGINT) AS max_busdays
FROM b GROUP BY 1
"""


def q_typo_clusters_docs(sf_dir: str):
    """Entity-resolution CLUSTERS over the distance-1 typo/variant
    pairs: connected components of the FastSS edge set by distributed
    min-label propagation (iterative, two bucket exchanges per wave,
    driver holds only changed-counts), then component sizes. Label =
    lexicographically smallest member. Oracle: the same edge SQL plus a
    recursive-CTE closure."""
    from ..functions.neardup import _min_label_propagation, edit_distance_pairs
    from ..functions.relational import grouped_agg
    from ..stages.dedup import dedup_exact

    docs = read_table(sf_dir, "documents", columns=["text"], num_blocks=8)

    def explode(df: pd.DataFrame) -> pa.Table:
        words = df["text"].dropna().str.split(" ").explode().dropna()
        u = set(words.unique())
        u |= {w[1:] for w in u if len(w) > 3}
        return pa.Table.from_arrays(
            [pa.array(sorted(u), pa.string())], names=["w"])

    toks = dedup_exact(docs.map_batches(explode, batch_format="pandas"),
                       ["w"], num_buckets=8)
    edges = edit_distance_pairs(toks, "w", num_buckets=8).map_batches(
        lambda df: df.rename(columns={"w_a": "id_a", "w_b": "id_b"}),
        batch_format="pandas")
    labels = _min_label_propagation(edges, num_buckets=8, id_is_int=False)
    sizes = labels.map_batches(
        lambda df: pd.DataFrame({"cluster": df["label"].astype(object),
                                 "n_words": np.ones(len(df), np.int64)}),
        batch_format="pandas")
    return grouped_agg(sizes, ["cluster"], {"n_words": ("n_words", "sum")},
                       num_buckets=4)


SQL_TYPO_CLUSTERS_DOCS = """
WITH RECURSIVE base AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
), tok AS (
  SELECT DISTINCT w FROM (
    SELECT w FROM base
    UNION ALL SELECT substring(w, 2) FROM base WHERE length(w) > 3
  )
), pe AS (
  SELECT a.w AS w_a, b.w AS w_b
  FROM tok a JOIN tok b ON a.w < b.w AND levenshtein(a.w, b.w) = 1
), edges AS (
  SELECT w_a AS src, w_b AS dst FROM pe
  UNION ALL SELECT w_b, w_a FROM pe
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
), lab AS (
  SELECT node, MIN(label) AS label FROM reach GROUP BY node
)
SELECT label AS cluster, CAST(COUNT(*) AS BIGINT) AS n_words
FROM lab GROUP BY 1
"""


CORE_K = 3
CORE_ROUNDS = 12
CORE_MIN_W = 2


def _copurchase_pair_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized within-order unordered PAIR explode shared by the
    k-core and Apriori kernels: dedup + sort (order, part), then emit
    each order group's upper triangle with the repeat/offset explode —
    no per-order Python loop (the loop version cost ~6 s per query at
    sf0.1; this is the attribute_linear range-explode pattern). Sorted
    parts guarantee pa < pb."""
    f = pd.DataFrame({
        "o": df["l_orderkey"].to_numpy(np.int64),
        "p": df["l_partkey"].to_numpy(np.int64)}).drop_duplicates()
    f = f.sort_values(["o", "p"], kind="mergesort")
    o = f["o"].to_numpy()
    p = f["p"].to_numpy()
    n = len(f)
    empty = pd.DataFrame({"pa": pd.Series([], dtype="int64"),
                          "pb": pd.Series([], dtype="int64")})
    if n == 0:
        return empty
    seg_start = np.concatenate(([True], o[1:] != o[:-1]))
    starts = np.flatnonzero(seg_start)
    sizes = np.diff(np.concatenate((starts, [n])))
    seg_end = np.repeat(starts + sizes, sizes)
    idx = np.arange(n)
    c = seg_end - idx - 1  # pairs this row opens as the smaller part
    total = int(c.sum())
    if total == 0:
        return empty
    first = np.repeat(idx, c)
    offs = np.repeat(np.cumsum(c) - c, c)
    second = np.repeat(idx + 1, c) + (np.arange(total) - offs)
    return pd.DataFrame({"pa": p[first], "pb": p[second]})


def q_core3_parts(sf_dir: str):
    """k-core decomposition (k=3) of the part co-purchase graph by
    iterative degree peeling — the classic dense-subgraph primitive.
    Edges are part pairs co-purchased in >= 2 orders (pair counts from
    one order-keyed exchange + one combine); each peel round is one
    degree exchange plus a broadcast survivor-set filter (node-scale —
    swap for a Bloom filter at web scale, same call shape). Rounds are
    FIXED at 12 on both sides (monotone peeling makes extra rounds
    no-ops once converged; the engine early-exits at the fixpoint, the
    SQL unrolls all 12), so engine and oracle agree even mid-peel.
    Output: surviving nodes with their in-core degree."""
    import ray

    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"], num_blocks=8)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = _copurchase_pair_frame(df)
        if out.empty:
            return pd.DataFrame({"pa": pd.Series([], dtype="int64"),
                                 "pb": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        return (out.groupby(["pa", "pb"], sort=False)
                .size().rename("w").astype("int64").reset_index())

    weighted = grouped_agg(
        bucket_exchange(li, ["l_orderkey"], pairs, num_buckets=8),
        ["pa", "pb"], {"w": ("w", "sum")}, num_buckets=8)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["w"] >= CORE_MIN_W]
        return pd.DataFrame({
            "src": np.concatenate([keep["pa"].to_numpy(np.int64),
                                   keep["pb"].to_numpy(np.int64)]),
            "dst": np.concatenate([keep["pb"].to_numpy(np.int64),
                                   keep["pa"].to_numpy(np.int64)])})

    und = weighted.map_batches(sym, batch_format="pandas").materialize()

    # gate-hybrid (the grid_clusters precedent): the thresholded edge
    # table is graph-scale, far below the raw data — under the cap the
    # peel loop runs driver-side on numpy (each DISTRIBUTED round costs
    # a fixed exchange latency that dwarfs the tiny frame); above it,
    # rounds run as degree exchanges + broadcast survivor probes
    CORE_DRIVER_EDGE_CAP = 2_000_000
    n_edges = int(und.count())
    if n_edges <= CORE_DRIVER_EDGE_CAP:
        e = und.to_pandas()
        src = e["src"].to_numpy(np.int64)
        dst = e["dst"].to_numpy(np.int64)
        for _ in range(CORE_ROUNDS):
            nodes, deg = np.unique(src, return_counts=True)
            keep = nodes[deg >= CORE_K]
            if len(keep) == len(nodes):
                break
            m = np.isin(src, keep) & np.isin(dst, keep)
            src, dst = src[m], dst[m]
        nodes, deg = np.unique(src, return_counts=True)
        return pd.DataFrame({"p_partkey": nodes.astype(np.int64),
                             "degree": deg.astype(np.int64)})

    prev_nodes = None
    for _ in range(CORE_ROUNDS):
        dd = grouped_agg(
            und.map_batches(
                lambda df: df.assign(deg=np.int64(1))[["src", "deg"]],
                batch_format="pandas"),
            ["src"], {"deg": ("deg", "sum")}, num_buckets=8).to_pandas()
        keep = set(dd.loc[dd["deg"] >= CORE_K, "src"].tolist())
        if prev_nodes is not None and len(keep) == prev_nodes:
            break  # fixpoint: every later round is a no-op
        prev_nodes = len(keep)
        keep_ref = ray.put(keep)

        def probe(df: pd.DataFrame, _ref=keep_ref) -> pd.DataFrame:
            kp = ray.get(_ref)
            # one broadcast probe filters BOTH endpoints (survivor set
            # is node-scale; swap for a Bloom filter at web scale)
            return df[df["src"].isin(kp).to_numpy()
                      & df["dst"].isin(kp).to_numpy()]

        und = und.map_batches(probe, batch_format="pandas").materialize()

    final_deg = grouped_agg(
        und.map_batches(
            lambda df: df.assign(degree=np.int64(1))[["src", "degree"]],
            batch_format="pandas"),
        ["src"], {"degree": ("degree", "sum")}, num_buckets=4)
    return final_deg.map_batches(
        lambda df: df.rename(columns={"src": "p_partkey"}),
        batch_format="pandas")


def _core3_sql() -> str:
    head = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pr AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), w AS (
  SELECT pa, pb FROM pr GROUP BY pa, pb HAVING COUNT(*) >= {CORE_MIN_W}
), e0 AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM w
  UNION ALL SELECT pb, pa FROM w
)"""
    # MATERIALIZED is load-bearing: each round references the previous
    # edge CTE three times, so DuckDB's default CTE inlining would
    # expand e0 3^rounds times
    rounds = []
    for i in range(1, CORE_ROUNDS + 1):
        rounds.append(f""",
k{i} AS MATERIALIZED (
  SELECT src FROM e{i - 1} GROUP BY src HAVING COUNT(*) >= {CORE_K}
), e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i - 1} e
  JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src
)""")
    tail = f"""
SELECT src AS p_partkey, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{CORE_ROUNDS} GROUP BY 1
"""
    return head + "".join(rounds) + tail


SQL_CORE3_PARTS = _core3_sql()


def q_bounce_rate_sessions(sf_dir: str):
    """Bounce analysis: sessions (30-min inactivity gap) grouped by
    their ENTRY event type — how many sessions start with each type and
    how many of those are single-event bounces. One user-keyed exchange;
    the kernel re-groups by user INSIDE the bucket (small-domain ids
    hash-collide into shared buckets), sessionizes vectorized, and emits
    per-entry-type partials only."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type"],
                    num_blocks=8)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "entry_type": pd.Series([], dtype=object),
                "n_sessions": pd.Series([], dtype="int64"),
                "n_bounce": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        ts = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy(np.int64)
        new_user = np.empty(len(df), bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(df), np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        is_new = new_user | (gap > SESSION_GAP_S * 1_000_000_000)
        sid = np.cumsum(is_new)
        out = pd.DataFrame({
            "sid": sid, "event_type": df["event_type"].to_numpy(object)})
        g = out.groupby("sid", sort=False)["event_type"]
        per = pd.DataFrame({"entry_type": g.first(), "n": g.size()})
        per["n_sessions"] = np.int64(1)
        per["n_bounce"] = (per["n"] == 1).astype("int64")
        return (per.groupby("entry_type", sort=False)
                [["n_sessions", "n_bounce"]].sum()
                .astype("int64").reset_index())

    partials = bucket_exchange(ev, ["user_id"], per_bucket, num_buckets=8)
    return grouped_agg(partials, ["entry_type"],
                       {"n_sessions": ("n_sessions", "sum"),
                        "n_bounce": ("n_bounce", "sum")}, num_buckets=2)


SQL_BOUNCE_RATE_SESSIONS = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), ranked AS (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, sid) AS n
  FROM numbered
)
SELECT event_type AS entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
FROM ranked WHERE rn = 1
GROUP BY 1
"""


CONT_QS = (0.25, 0.5, 0.75)


def q_cont_price_quantiles(sf_dir: str):
    """INTERPOLATED global quantiles (SQL ``quantile_cont`` /
    numpy 'linear': value at virtual index (n−1)·q) of lineitem price
    cents, via the multi-rank shared-scan histogram refinement — the
    engine fetches the two order statistics straddling each virtual
    index (all ranks share every scan) and interpolates driver-side.
    Quartile fractions are dyadic and the inputs are integer cents, so
    v_lo + (v_hi−v_lo)·frac is float-EXACT on both engines — no
    rounding pact. Complements the quantile_disc family
    (exact_price_quantiles)."""
    from ..functions.relational import exact_quantiles

    li = read_table(sf_dir, "lineitem", columns=["l_extendedprice"],
                    num_blocks=8)
    cents = li.map_batches(
        lambda df: pd.DataFrame({
            "cents": np.rint(df["l_extendedprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)}),
        batch_format="pandas").materialize()

    n = int(cents.count())
    ranks, fracs = [], []
    for q in CONT_QS:
        r = (n - 1) * q
        lo = int(np.floor(r))
        ranks.extend([lo, min(lo + 1, n - 1)])
        fracs.append(r - lo)
    vals = exact_quantiles(cents, "cents", qs=[], ranks=ranks)
    out_vals = []
    for i, frac in enumerate(fracs):
        v_lo, v_hi = vals[2 * i], vals[2 * i + 1]
        out_vals.append(v_lo + (v_hi - v_lo) * frac)
    return pd.DataFrame({"q": np.asarray(CONT_QS, np.float64),
                         "value": np.asarray(out_vals, np.float64)})


SQL_CONT_PRICE_QUANTILES = """
WITH c AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
SELECT CAST(0.25 AS DOUBLE) AS q, quantile_cont(cents, 0.25) AS value
FROM c
UNION ALL
SELECT CAST(0.5 AS DOUBLE), quantile_cont(cents, 0.5) FROM c
UNION ALL
SELECT CAST(0.75 AS DOUBLE), quantile_cont(cents, 0.75) FROM c
"""


UNIONFIX_ROOT = "/tmp/transmog_ray_unionfix"
UNIONFIX_CURRENT = f"{UNIONFIX_ROOT}/current"


def _unionfix_fixture(sf_dir: str) -> str:
    """Two-schema-version parquet fixture derived deterministically from
    the documents table: version A (even doc_ids) has (doc_id, lang,
    n_chars); version B (odd doc_ids) dropped n_chars and added a score
    column — the drift read_parquet_union harmonizes."""
    import os

    import pyarrow.parquet as pq

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"{UNIONFIX_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    a_path, b_path = f"{out_dir}/a.parquet", f"{out_dir}/b.parquet"
    if not (os.path.exists(a_path) and os.path.exists(b_path)):
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "n_chars"])
        d = docs.to_pandas()
        a = d[d["doc_id"] % 2 == 0][["doc_id", "lang", "n_chars"]]
        b = d[d["doc_id"] % 2 == 1][["doc_id", "lang"]].assign(
            score=(d.loc[d["doc_id"] % 2 == 1, "n_chars"] * 2)
            .astype("int64"))
        pq.write_table(pa.Table.from_pandas(a, preserve_index=False),
                       a_path)
        pq.write_table(pa.Table.from_pandas(b, preserve_index=False),
                       b_path)
    _repoint_current(out_dir, UNIONFIX_CURRENT)
    return out_dir


def q_union_schema_read(sf_dir: str):
    """Schema-evolution read: one Dataset over parquet files whose
    schemas DRIFTED (a column dropped, another added), harmonized by
    name via :func:`transmog_ray.sources.union_read.read_parquet_union`
    (one Ray read per distinct schema VERSION, typed-null padding
    map-side), then a per-lang rollup where each column sums over the
    files that carry it. Oracle: DuckDB ``union_by_name=true``."""
    from ..functions.relational import grouped_agg
    from ..sources.union_read import read_parquet_union

    fix_dir = _unionfix_fixture(sf_dir)
    ds = read_parquet_union(fix_dir)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("lang", dropna=False, sort=False)
        out = pd.DataFrame({
            "n_rows": g.size().astype("int64"),
            "sum_chars": g["n_chars"].sum().fillna(0).astype("int64"),
            "sum_score": g["score"].sum().fillna(0).astype("int64"),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        {"n_rows": ("n_rows", "sum"), "sum_chars": ("sum_chars", "sum"),
         "sum_score": ("sum_score", "sum")}, num_buckets=2)


SQL_UNION_SCHEMA_READ = f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
       CAST(COALESCE(SUM(score), 0) AS BIGINT) AS sum_score
FROM read_parquet(['{UNIONFIX_CURRENT}/a.parquet',
                   '{UNIONFIX_CURRENT}/b.parquet'], union_by_name=true)
GROUP BY 1
"""


def q_cdc_join_delta(sf_dir: str):
    """Incremental view maintenance WITH DELETES: the net change to the
    per-nation (order count, revenue cents) join view orders⋈customer
    under a CDC batch — deleted orders (key%37), inserted orders
    (key%41 clones), and customers MOVED between nations (key%53, a
    delete+insert pair on the dim side). The engine never recomputes
    the view: ΔV = ΔL⋈R_new + L_old⋈ΔR (signed multiplicities), so
    only the delta stream and the old fact stream are scanned once
    each, with the dim maps broadcast. Oracle recomputes both view
    versions wholesale and subtracts."""
    from ..functions.relational import grouped_agg

    cust = read_small(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey"])
    moved = cust[cust["c_custkey"] % 53 == 0]
    new_map = cust.set_index("c_custkey")["c_nationkey"].copy()
    new_map.loc[moved["c_custkey"].to_numpy()] = (
        (moved["c_nationkey"].to_numpy(np.int64) + 1) % 25)
    # ΔR as a signed lookup: moved custkey -> [(old_nation,-1),(new,+1)]
    delta_r = {
        int(k): [(int(old), -1), (int((old + 1) % 25), +1)]
        for k, old in zip(moved["c_custkey"].to_numpy(np.int64),
                          moved["c_nationkey"].to_numpy(np.int64))
    }

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"],
                        num_blocks=8)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        okey = df["o_orderkey"].to_numpy(np.int64)
        ckey = df["o_custkey"].to_numpy(np.int64)
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        rows = {"nation": [], "d_orders": [], "d_cents": []}

        def emit(nations, weights, cent_vals):
            rows["nation"].extend(nations)
            rows["d_orders"].extend(weights)
            rows["d_cents"].extend(w * c for w, c in zip(weights, cent_vals))

        # ΔL ⋈ R_new: deletes carry -1, insert clones carry +1, both
        # resolved against the POST-move customer map
        dele = okey % 37 == 0
        ins = okey % 41 == 0
        emit(new_map.loc[ckey[dele]].to_numpy(np.int64),
             [-1] * int(dele.sum()), cents[dele])
        emit(new_map.loc[ckey[ins]].to_numpy(np.int64),
             [+1] * int(ins.sum()), cents[ins])
        # L_old ⋈ ΔR: every OLD order of a moved customer contributes a
        # signed pair (leave old nation, enter new nation)
        for ck, w_list in delta_r.items():
            m = ckey == ck
            cnt = int(m.sum())
            if not cnt:
                continue
            for nat, w in w_list:
                emit([nat] * cnt, [w] * cnt, cents[m])
        out = pd.DataFrame({
            "nation": np.asarray(rows["nation"], np.int64),
            "d_orders": np.asarray(rows["d_orders"], np.int64),
            "d_cents": np.asarray(rows["d_cents"], np.int64)})
        return (out.groupby("nation", sort=False)
                [["d_orders", "d_cents"]].sum()
                .astype("int64").reset_index())

    agg = grouped_agg(
        orders.map_batches(partials, batch_format="pandas"),
        ["nation"],
        {"d_orders": ("d_orders", "sum"), "d_cents": ("d_cents", "sum")},
        num_buckets=2).to_pandas()
    out = agg[(agg["d_orders"] != 0) | (agg["d_cents"] != 0)]
    return out.reset_index(drop=True)


SQL_CDC_JOIN_DELTA = """
WITH old_l AS (
  SELECT o_custkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), new_l AS (
  SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 37 <> 0
  UNION ALL
  SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 41 = 0
), old_r AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation FROM customer
), new_r AS (
  SELECT c_custkey,
         CAST(CASE WHEN c_custkey % 53 = 0
                   THEN (c_nationkey + 1) % 25
                   ELSE c_nationkey END AS BIGINT) AS nation
  FROM customer
), vo AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS c
  FROM old_l JOIN old_r ON old_l.o_custkey = old_r.c_custkey GROUP BY 1
), vn AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS c
  FROM new_l JOIN new_r ON new_l.o_custkey = new_r.c_custkey GROUP BY 1
), d AS (
  SELECT COALESCE(vn.nation, vo.nation) AS nation,
         COALESCE(vn.n, 0) - COALESCE(vo.n, 0) AS d_orders,
         COALESCE(vn.c, 0) - COALESCE(vo.c, 0) AS d_cents
  FROM vn FULL OUTER JOIN vo ON vn.nation = vo.nation
)
SELECT nation, CAST(d_orders AS BIGINT) AS d_orders,
       CAST(d_cents AS BIGINT) AS d_cents
FROM d WHERE d_orders <> 0 OR d_cents <> 0
"""


def q_division_customers(sf_dir: str):
    """Relational DIVISION (Codd's ÷) with a DATA-DERIVED divisor:
    customers who ordered parts of EVERY brand carried at the maximum
    part size — the 'bought the whole catalog' query. The divisor set
    is computed distributed (filter + dedup on the part dim, a handful
    of rows) and broadcast; each customer's distinct-matched-brand
    count combines in one order-keyed + one customer-keyed exchange and
    the division is a count == |divisor| filter."""
    from ..functions.relational import grouped_agg
    from ..stages.dedup import dedup_exact

    parts = read_small(sf_dir, "part", columns=["p_partkey", "p_size",
                                                "p_brand"])
    max_size = int(parts["p_size"].max())
    divisor = sorted(parts.loc[parts["p_size"] == max_size, "p_brand"]
                     .unique())
    bmap = parts.set_index("p_partkey")["p_brand"]
    div_set = set(divisor)

    orders = read_small(sf_dir, "orders", columns=["o_orderkey",
                                                   "o_custkey"])
    omap = orders.set_index("o_orderkey")["o_custkey"]

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"], num_blocks=8)

    def matched(df: pd.DataFrame) -> pd.DataFrame:
        brand = df["l_partkey"].map(bmap)
        keep = brand.isin(div_set).to_numpy()
        out = pd.DataFrame({
            "o_custkey": df["l_orderkey"].map(omap).to_numpy(np.int64)[keep],
            "brand": brand.to_numpy(object)[keep]})
        return out.drop_duplicates()

    pairs = dedup_exact(
        li.map_batches(matched, batch_format="pandas"),
        ["o_custkey", "brand"], num_buckets=8)
    counts = grouped_agg(
        pairs.map_batches(
            lambda df: df.assign(n_brands=np.int64(1))[
                ["o_custkey", "n_brands"]],
            batch_format="pandas"),
        ["o_custkey"], {"n_brands": ("n_brands", "sum")},
        num_buckets=8).to_pandas()
    out = counts[counts["n_brands"] == len(divisor)][["o_custkey"]]
    out = out.sort_values("o_custkey").reset_index(drop=True)
    out["o_custkey"] = out["o_custkey"].astype("int64")
    return out


SQL_DIVISION_CUSTOMERS = """
WITH divisor AS (
  SELECT DISTINCT p_brand FROM part
  WHERE p_size = (SELECT MAX(p_size) FROM part)
), matched AS (
  SELECT DISTINCT o.o_custkey, p.p_brand
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN divisor d ON d.p_brand = p.p_brand
)
SELECT o_custkey FROM matched
GROUP BY o_custkey
HAVING COUNT(*) = (SELECT COUNT(*) FROM divisor)
"""


STUMP_POS_TYPE = "purchase"


def q_stump_split_events(sf_dir: str):
    """Exact decision-stump training on one feature: the threshold t
    (over event value cents) minimizing MISCLASSIFICATIONS of the rule
    'predict purchase iff cents >= t' — errors are pure integers, so
    the argmin (tie → smallest t) is deterministic on both engines.
    One pass emits (cents, n_pos, n_neg) partials; the combine is
    value-domain bounded; the prefix-sum error sweep runs on that tiny
    frame driver-side."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["event_type", "value"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        pos = (df["event_type"].to_numpy(object)
               == STUMP_POS_TYPE).astype(np.int64)
        out = pd.DataFrame({"cents": cents, "n_pos": pos, "n_neg": 1 - pos})
        return (out.groupby("cents", sort=False)[["n_pos", "n_neg"]]
                .sum().astype("int64").reset_index())

    hist = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["cents"], {"n_pos": ("n_pos", "sum"), "n_neg": ("n_neg", "sum")},
        num_buckets=4).to_pandas().sort_values("cents")

    pos_below = hist["n_pos"].cumsum().shift(fill_value=0).to_numpy()
    neg_below = hist["n_neg"].cumsum().shift(fill_value=0).to_numpy()
    total_neg = int(hist["n_neg"].sum())
    errors = pos_below + (total_neg - neg_below)
    best = int(np.argmin(errors))  # np.argmin keeps the FIRST minimum
    return pd.DataFrame({
        "threshold_cents": [np.int64(hist["cents"].iloc[best])],
        "errors": [np.int64(errors[best])],
        "n_pos": [np.int64(hist["n_pos"].sum())],
        "n_neg": [np.int64(total_neg)]})


SQL_STUMP_SPLIT_EVENTS = f"""
WITH h AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN event_type = '{STUMP_POS_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN event_type = '{STUMP_POS_TYPE}'
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM events GROUP BY 1
), sweep AS (
  SELECT cents,
         COALESCE(SUM(n_pos) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (SELECT SUM(n_neg) FROM h)
           - COALESCE(SUM(n_neg) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS err
  FROM h
)
SELECT CAST(cents AS BIGINT) AS threshold_cents,
       CAST(err AS BIGINT) AS errors,
       (SELECT CAST(SUM(n_pos) AS BIGINT) FROM h) AS n_pos,
       (SELECT CAST(SUM(n_neg) AS BIGINT) FROM h) AS n_neg
FROM sweep ORDER BY err, cents LIMIT 1
"""


def q_price_gcd_brand(sf_dir: str):
    """Custom DECOMPOSABLE aggregate the SQL standard lacks: per-brand
    GCD of part prices in cents — the price-granularity detector (a
    GCD of 10 means every price sits on a dime grid). GCD is
    associative+commutative, so per-batch ``np.gcd.reduce`` partials
    combine in one tiny exchange exactly like sum/min. Oracle:
    ``list_reduce(list(...), gcd)``."""
    from ..functions.relational import grouped_agg

    parts = read_table(sf_dir, "part",
                       columns=["p_brand", "p_retailprice"], num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["p_retailprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        out = pd.DataFrame({"p_brand": df["p_brand"].to_numpy(object),
                            "cents": cents})
        g = out.groupby("p_brand", sort=False)["cents"]
        return pd.DataFrame({
            "gcd_cents": g.agg(lambda s: np.gcd.reduce(s.to_numpy())),
            "n_parts": g.size().astype("int64")}).reset_index()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_brand", sort=False)
        return pd.DataFrame({
            "gcd_cents": g["gcd_cents"].agg(
                lambda s: np.gcd.reduce(s.to_numpy())),
            "n_parts": g["n_parts"].sum().astype("int64")}).reset_index()

    from ..stages.partition import bucket_exchange

    return bucket_exchange(
        parts.map_batches(partial, batch_format="pandas"),
        ["p_brand"], combine, num_buckets=4)


SQL_PRICE_GCD_BRAND = """
SELECT p_brand,
       CAST(list_reduce(list(CAST(ROUND(p_retailprice * 100) AS BIGINT)),
                        (a, b) -> gcd(a, b)) AS BIGINT) AS gcd_cents,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part GROUP BY 1
"""


def q_tukey_outliers_langs(sf_dir: str):
    """Integerized Tukey-fence outlier detection per language: doc
    lengths outside [q1 − 1.5·IQR, q3 + 1.5·IQR], with the fences
    cross-multiplied into pure-integer tests (2·x < 5·q1 − 3·q3 /
    2·x > 5·q3 − 3·q1) so no 1.5 float ever appears. Quartiles are
    exact order statistics (quantile_disc ceil-rank convention); one
    language-keyed exchange computes quartiles and outlier counts in
    the same kernel."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["lang"].is_valid(),
                                   t["n_chars"].is_valid())),
        batch_format="pyarrow")

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang", sort=False):
            v = np.sort(g["n_chars"].to_numpy(np.int64))
            n = len(v)
            q1 = v[min(int(np.ceil(0.25 * n)) - 1, n - 1)]
            q3 = v[min(int(np.ceil(0.75 * n)) - 1, n - 1)]
            below = int((2 * v < 5 * q1 - 3 * q3).sum())
            above = int((2 * v > 5 * q3 - 3 * q1).sum())
            rows.append((lang, q1, q3, below, above, n))
        return pd.DataFrame(
            rows, columns=["lang", "q1", "q3", "n_below", "n_above",
                           "n_docs"]).astype(
            {c: "int64" for c in ("q1", "q3", "n_below", "n_above",
                                  "n_docs")})

    return bucket_exchange(docs, ["lang"], per_lang, num_buckets=4)


SQL_TUKEY_OUTLIERS_LANGS = """
WITH d AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
), q AS (
  SELECT lang,
         CAST(quantile_disc(x, 0.25) AS BIGINT) AS q1,
         CAST(quantile_disc(x, 0.75) AS BIGINT) AS q3,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM d GROUP BY 1
)
SELECT q.lang, q.q1, q.q3,
       CAST(SUM(CASE WHEN 2 * d.x < 5 * q.q1 - 3 * q.q3
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       CAST(SUM(CASE WHEN 2 * d.x > 5 * q.q3 - 3 * q.q1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       q.n_docs
FROM d JOIN q ON d.lang = q.lang
GROUP BY q.lang, q.q1, q.q3, q.n_docs
"""


def q_stock_span_daily(sf_dir: str):
    """Stock-span (monotone stack) over daily revenue: for each day,
    how many consecutive trailing days (itself included) had revenue
    <= that day's — the streak-length behind 'highest in N days'
    banners. Daily totals combine distributed (one bounded exchange);
    the stack sweep runs on the date-cardinality frame driver-side.
    Day ids are epoch-day BIGINTs (the timestamp encoding that
    hash-compares exactly)."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"],
                        num_blocks=8)

    def daily(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["o_orderdate"].astype("datetime64[ns]")
               .to_numpy("datetime64[D]").astype(np.int64))
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        out = pd.DataFrame({"day_id": day, "total_cents": cents})
        return (out.groupby("day_id", sort=False)["total_cents"].sum()
                .astype("int64").reset_index())

    tot = grouped_agg(
        orders.map_batches(daily, batch_format="pandas"),
        ["day_id"], {"total_cents": ("total_cents", "sum")},
        num_buckets=4).to_pandas().sort_values("day_id")

    vals = tot["total_cents"].to_numpy(np.int64)
    span = np.empty(len(vals), np.int64)
    stack: list[int] = []  # indices with strictly greater totals
    for i, v in enumerate(vals):
        while stack and vals[stack[-1]] <= v:
            stack.pop()
        span[i] = i - (stack[-1] if stack else -1)
        stack.append(i)
    tot = tot.reset_index(drop=True)
    tot["span"] = span
    tot["day_id"] = tot["day_id"].astype("int64")
    return tot


SQL_STOCK_SPAN_DAILY = """
WITH d AS (
  SELECT date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY 1
), r AS (
  SELECT day_id, total_cents,
         ROW_NUMBER() OVER (ORDER BY day_id) AS i
  FROM d
)
SELECT a.day_id, a.total_cents,
       CAST(a.i - COALESCE(MAX(b.i), 0) AS BIGINT) AS span
FROM r a LEFT JOIN r b ON b.i < a.i AND b.total_cents > a.total_cents
GROUP BY a.day_id, a.total_cents, a.i
"""


def q_content_fingerprint_langs(sf_dir: str):
    """Content-addressed partition fingerprints (dataset versioning /
    integrity audit): per language, the left-fold md5 chain over its
    docs' md5(text) digests in doc_id order — any single changed byte
    anywhere in the partition changes the fingerprint. One
    language-keyed exchange; the fold is sequential per group but
    groups fold in parallel. Oracle: ``list_reduce(list(md5(text)
    ORDER BY doc_id), md5(a||b))``."""
    import hashlib

    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "text"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["lang"].is_valid(),
                                   t["text"].is_valid())),
        batch_format="pyarrow")

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang", sort=False):
            g = g.sort_values("doc_id", kind="mergesort")
            acc = None
            for t in g["text"]:
                h = hashlib.md5(t.encode("utf-8")).hexdigest()
                acc = h if acc is None else hashlib.md5(
                    (acc + h).encode("ascii")).hexdigest()
            rows.append((lang, acc, len(g)))
        return pd.DataFrame(rows,
                            columns=["lang", "fingerprint", "n_docs"]
                            ).astype({"n_docs": "int64"})

    return bucket_exchange(docs, ["lang"], per_lang, num_buckets=4)


SQL_CONTENT_FINGERPRINT_LANGS = """
WITH d AS (
  SELECT lang, doc_id, md5(text) AS h FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL
)
SELECT lang,
       list_reduce(list(h ORDER BY doc_id),
                   (a, b) -> md5(a || b)) AS fingerprint,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY 1
"""


ROWGROUP_ROOT = "/tmp/transmog_ray_rowgroups"
ROWGROUP_CURRENT = f"{ROWGROUP_ROOT}/current"
ROWGROUP_SIZE = 4096
SKIP_PRED_QTY = 45


def _rowgroup_fixture(sf_dir: str) -> str:
    """Two physical LAYOUTS of the same lineitem projection, written
    with small row groups: 'clustered' is sorted by l_quantity (zone
    maps become selective), 'unsorted' keeps source order (zone maps
    span the domain). What a layout-advisor compares."""
    import os

    import pyarrow.parquet as pq

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"{ROWGROUP_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    c_path, u_path = (f"{out_dir}/clustered.parquet",
                      f"{out_dir}/unsorted.parquet")
    if not (os.path.exists(c_path) and os.path.exists(u_path)):
        t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_linenumber",
                                   "l_quantity"])
        df = t.to_pandas()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       u_path, row_group_size=ROWGROUP_SIZE)
        cl = df.sort_values(["l_quantity", "l_orderkey", "l_linenumber"],
                            kind="mergesort")
        pq.write_table(pa.Table.from_pandas(cl, preserve_index=False),
                       c_path, row_group_size=ROWGROUP_SIZE)
    _repoint_current(out_dir, ROWGROUP_CURRENT)
    return out_dir


def q_rowgroup_skip_stats(sf_dir: str):
    """Zone-map (row-group min/max) skip-rate audit straight from REAL
    parquet footers: for the predicate ``l_quantity >= 45``, how many
    row groups each physical layout would let a reader skip. Footer
    reads are metadata-only Ray tasks (one per file — a lake audit
    never touches data pages); the per-group rows that shuffle are
    row-group-cardinality. The layout advisory behind sort-key /
    OPTIMIZE decisions. Oracle: DuckDB ``parquet_metadata()``."""
    from ..functions.relational import grouped_agg

    fix_dir = _rowgroup_fixture(sf_dir)
    files = [{"path": f"{fix_dir}/clustered.parquet",
              "layout": "clustered"},
             {"path": f"{fix_dir}/unsorted.parquet", "layout": "unsorted"}]

    def footer(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        rows = []
        for path, layout in zip(df["path"], df["layout"]):
            md = pq.ParquetFile(path).metadata
            qty_idx = md.schema.names.index("l_quantity")
            for g in range(md.num_row_groups):
                col = md.row_group(g).column(qty_idx)
                rows.append((layout, md.row_group(g).num_rows,
                             int(col.statistics.max)))
        out = pd.DataFrame(rows, columns=["layout", "n_rows", "qty_max"])
        out["n_groups"] = np.int64(1)
        out["n_skippable"] = (out["qty_max"]
                              < SKIP_PRED_QTY).astype("int64")
        out["skip_rows"] = out["n_rows"] * out["n_skippable"]
        return (out.groupby("layout", sort=False)
                [["n_groups", "n_skippable", "skip_rows"]].sum()
                .astype("int64").reset_index())

    ds = _rd().from_items(files)
    return grouped_agg(
        ds.map_batches(footer, batch_format="pandas"),
        ["layout"],
        {"n_groups": ("n_groups", "sum"),
         "n_skippable": ("n_skippable", "sum"),
         "skip_rows": ("skip_rows", "sum")}, num_buckets=2)


SQL_ROWGROUP_SKIP_STATS = f"""
WITH m AS (
  SELECT 'clustered' AS layout, row_group_id, row_group_num_rows,
         CAST(stats_max_value AS BIGINT) AS qty_max
  FROM parquet_metadata('{ROWGROUP_CURRENT}/clustered.parquet')
  WHERE path_in_schema = 'l_quantity'
  UNION ALL
  SELECT 'unsorted', row_group_id, row_group_num_rows,
         CAST(stats_max_value AS BIGINT)
  FROM parquet_metadata('{ROWGROUP_CURRENT}/unsorted.parquet')
  WHERE path_in_schema = 'l_quantity'
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN qty_max < {SKIP_PRED_QTY}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
       CAST(SUM(CASE WHEN qty_max < {SKIP_PRED_QTY}
                     THEN row_group_num_rows ELSE 0 END) AS BIGINT)
         AS skip_rows
FROM m GROUP BY 1
"""


def q_column_compression_stats(sf_dir: str):
    """Physical storage audit from parquet footers: per (layout,
    column), compressed vs uncompressed bytes — the clustered layout
    compresses the sort column visibly better (runs of equal values),
    which is exactly what this audit exists to surface. Same
    metadata-only task shape as the zone-map audit."""
    from ..functions.relational import grouped_agg

    fix_dir = _rowgroup_fixture(sf_dir)
    files = [{"path": f"{fix_dir}/clustered.parquet",
              "layout": "clustered"},
             {"path": f"{fix_dir}/unsorted.parquet", "layout": "unsorted"}]

    def footer(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        rows = []
        for path, layout in zip(df["path"], df["layout"]):
            md = pq.ParquetFile(path).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    rows.append((layout, col.path_in_schema,
                                 col.total_compressed_size,
                                 col.total_uncompressed_size))
        out = pd.DataFrame(rows, columns=["layout", "column",
                                          "compressed", "uncompressed"])
        out["n_chunks"] = np.int64(1)
        return (out.groupby(["layout", "column"], sort=False)
                [["compressed", "uncompressed", "n_chunks"]].sum()
                .astype("int64").reset_index())

    ds = _rd().from_items(files)
    return grouped_agg(
        ds.map_batches(footer, batch_format="pandas"),
        ["layout", "column"],
        {"compressed": ("compressed", "sum"),
         "uncompressed": ("uncompressed", "sum"),
         "n_chunks": ("n_chunks", "sum")}, num_buckets=2)


SQL_COLUMN_COMPRESSION_STATS = f"""
WITH m AS (
  SELECT 'clustered' AS layout, path_in_schema AS "column",
         total_compressed_size, total_uncompressed_size
  FROM parquet_metadata('{ROWGROUP_CURRENT}/clustered.parquet')
  UNION ALL
  SELECT 'unsorted', path_in_schema,
         total_compressed_size, total_uncompressed_size
  FROM parquet_metadata('{ROWGROUP_CURRENT}/unsorted.parquet')
)
SELECT layout, "column",
       CAST(SUM(total_compressed_size) AS BIGINT) AS compressed,
       CAST(SUM(total_uncompressed_size) AS BIGINT) AS uncompressed,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM m GROUP BY 1, 2
"""


def q_gram_matrix_embeddings(sf_dir: str):
    """Distributed Gram matrix X·Xᵀ-prep (covariance/PCA precursor):
    the d×d upper triangle of Σ_rows qᵢ·qⱼ over int8-quantized
    embeddings — each batch contributes one integer ``q.T @ q`` matmul
    partial and the combine is a (d²-bounded) sum, the canonical
    data-parallel ML sufficient statistic. Oracle replays the
    quantization and self-joins the exploded positions."""
    from ..functions.ann import _quantize_rows
    from ..functions.relational import grouped_agg

    emb = read_table(sf_dir, "embeddings", columns=["embedding"],
                     num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        M = np.asarray(list(df["embedding"]), dtype=np.float64)
        q, _ = _quantize_rows(M)
        g = q.astype(np.int64).T @ q.astype(np.int64)
        d = g.shape[0]
        ii, jj = np.triu_indices(d)
        return pd.DataFrame({"pos_i": ii.astype(np.int64),
                             "pos_j": jj.astype(np.int64),
                             "dot": g[ii, jj]})

    return grouped_agg(
        emb.map_batches(partial, batch_format="pandas"),
        ["pos_i", "pos_j"], {"dot": ("dot", "sum")}, num_buckets=4)


SQL_GRAM_MATRIX_EMBEDDINGS = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), s AS (
  SELECT vec_id, emb,
         list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS scale
  FROM e
), qv AS (
  SELECT vec_id,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale), 127),
                                     -127) AS BIGINT) END)) AS q
  FROM s
)
SELECT a.pos AS pos_i, b.pos AS pos_j,
       CAST(SUM(a.q * b.q) AS BIGINT) AS dot
FROM qv a JOIN qv b ON a.vec_id = b.vec_id AND a.pos <= b.pos
GROUP BY 1, 2
"""


TRIPLE_MIN_SUPPORT = 2


def q_frequent_triples_parts(sf_dir: str):
    """Apriori level-3 frequent-itemset mining: part TRIPLES
    co-purchased in >= 2 orders, with candidate pruning by the frequent
    PAIRS (support monotonicity makes the pruning lossless — a frequent
    triple's sub-pairs are frequent). Pairs count in one order-keyed
    exchange + combine; the frequent-pair set broadcasts; per-order
    triple generation only emits candidates whose three sub-pairs
    survive, so the counted stream is pruned at the map."""
    import ray

    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"], num_blocks=8)
    li = li.materialize()  # consumed by the pair pass AND the triple pass

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = _copurchase_pair_frame(df)
        if out.empty:
            return pd.DataFrame({"pa": pd.Series([], dtype="int64"),
                                 "pb": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        return (out.groupby(["pa", "pb"], sort=False)
                .size().rename("w").astype("int64").reset_index())

    weighted = grouped_agg(
        bucket_exchange(li, ["l_orderkey"], pairs, num_buckets=8),
        ["pa", "pb"], {"w": ("w", "sum")}, num_buckets=8).to_pandas()
    freq = weighted[weighted["w"] >= TRIPLE_MIN_SUPPORT]
    _empty_triples = pd.DataFrame(
        {"p1": pd.Series([], dtype="int64"),
         "p2": pd.Series([], dtype="int64"),
         "p3": pd.Series([], dtype="int64"),
         "support": pd.Series([], dtype="int64")})
    if freq.empty:  # Apriori level-2 empty ⇒ level 3 provably empty
        return _empty_triples
    fp_parts = np.unique(np.concatenate(
        [freq["pa"].to_numpy(np.int64), freq["pb"].to_numpy(np.int64)]))
    fp_ref = ray.put((set(zip(freq["pa"].to_numpy(np.int64),
                              freq["pb"].to_numpy(np.int64))), fp_parts))

    def triples(df: pd.DataFrame) -> pd.DataFrame:
        from itertools import combinations

        fp, parts_arr = ray.get(fp_ref)
        rows = []
        for _, g in df.groupby("l_orderkey", sort=False):
            ps = np.unique(g["l_partkey"].to_numpy(np.int64))
            # Apriori prune BEFORE the cubic loop: a triple member must
            # appear in some frequent pair at all
            ps = ps[np.isin(ps, parts_arr)]
            if len(ps) < 3:
                continue
            for a, b, c in combinations(ps.tolist(), 3):
                if ((a, b) in fp and (a, c) in fp and (b, c) in fp):
                    rows.append((a, b, c))
        out = pd.DataFrame(rows, columns=["p1", "p2", "p3"])
        if out.empty:
            return pd.DataFrame({"p1": pd.Series([], dtype="int64"),
                                 "p2": pd.Series([], dtype="int64"),
                                 "p3": pd.Series([], dtype="int64"),
                                 "support": pd.Series([], dtype="int64")})
        return (out.groupby(["p1", "p2", "p3"], sort=False)
                .size().rename("support").astype("int64").reset_index())

    counted = grouped_agg(
        bucket_exchange(li, ["l_orderkey"], triples, num_buckets=8),
        ["p1", "p2", "p3"], {"support": ("support", "sum")},
        num_buckets=4).to_pandas()
    out = counted[counted["support"] >= TRIPLE_MIN_SUPPORT]
    return out.reset_index(drop=True)


SQL_FREQUENT_TRIPLES_PARTS = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), fp AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT}
), tr AS (
  SELECT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2,
         c.l_partkey AS p3
  FROM op a
  JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN op c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  JOIN fp f1 ON f1.pa = a.l_partkey AND f1.pb = b.l_partkey
  JOIN fp f2 ON f2.pa = a.l_partkey AND f2.pb = c.l_partkey
  JOIN fp f3 ON f3.pa = b.l_partkey AND f3.pb = c.l_partkey
)
SELECT p1, p2, p3, CAST(COUNT(*) AS BIGINT) AS support
FROM tr GROUP BY 1, 2, 3
HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT}
"""


def q_bitmap_distinct_users(sf_dir: str):
    """EXACT distinct counting by bitmap OR — the roaring-bitmap
    mechanism: per event type, user ids set bits in 64-bit words
    ((id//64, OR of 1<<(id%64)) partials), OR is
    associative+commutative so words combine like sums in one tiny
    exchange, and the popcount sum is the exact distinct count. For
    dense int keys this ships O(domain/64) words instead of O(distinct)
    values. Oracle: plain COUNT(DISTINCT)."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        word = uid >> 6
        bit = np.uint64(1) << (uid % 64).astype(np.uint64)
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                            "word": word,
                            "mask": bit.astype(np.uint64)})
        g = (out.groupby(["event_type", "word"], sort=False)["mask"]
             .agg(lambda s: np.bitwise_or.reduce(s.to_numpy(np.uint64))))
        res = g.reset_index()
        # ship masks as int64 via a view: Arrow int64 round-trips the
        # raw bits, uint64 columns would upcast in pandas unions
        res["mask"] = res["mask"].to_numpy(np.uint64).view(np.int64)
        return res

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n_users": pd.Series([], dtype="int64")})
        g = (df.groupby(["event_type", "word"], sort=False)["mask"]
             .agg(lambda s: np.bitwise_or.reduce(
                 s.to_numpy(np.int64).view(np.uint64)).view(np.int64)))
        words = g.reset_index()
        pops = np.array([int(m).bit_count()
                         for m in words["mask"].to_numpy(np.int64)
                         .view(np.uint64)], dtype=np.int64)
        words["n_users"] = pops
        return (words.groupby("event_type", sort=False)["n_users"].sum()
                .astype("int64").reset_index())

    partials = ev.map_batches(partial, batch_format="pandas")
    per_bucket = bucket_exchange(partials, ["event_type"], combine,
                                 num_buckets=4)
    return grouped_agg(per_bucket, ["event_type"],
                       {"n_users": ("n_users", "sum")}, num_buckets=2)


SQL_BITMAP_DISTINCT_USERS = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""


def q_merge_join_segments(sf_dir: str):
    """Sort-MERGE join physical path (range co-partitioning by key
    VALUE, searchsorted gather, zero hash tables — see
    :func:`transmog_ray.functions.relational.sorted_merge_join`):
    orders⋈customer on custkey with the per-segment revenue rollup
    fused into the merge reduce tasks. Same answer as a hash join —
    the point is the alternative physical operator whose output stays
    key-ordered for downstream ordered scans."""
    from ..functions.relational import grouped_agg, sorted_merge_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"],
                        num_blocks=8).map_batches(
        lambda df: pd.DataFrame({
            "c_custkey": df["o_custkey"].to_numpy(np.int64),
            "cents": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)}),
        batch_format="pandas")
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"], num_blocks=4)

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype=object),
                "n_orders": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64")})
        g = df.groupby("c_mktsegment", sort=False)["cents"]
        return pd.DataFrame({"n_orders": g.size().astype("int64"),
                             "sum_cents": g.sum().astype("int64")}
                            ).reset_index()

    joined = sorted_merge_join(orders, cust, on="c_custkey",
                               num_buckets=8, post_fn=rollup)
    return grouped_agg(joined, ["c_mktsegment"],
                       {"n_orders": ("n_orders", "sum"),
                        "sum_cents": ("sum_cents", "sum")}, num_buckets=2)


SQL_MERGE_JOIN_SEGMENTS = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1
"""


COMPACT_TARGET_BYTES = 256 * 1024


def q_compaction_plan(sf_dir: str):
    """Small-file compaction PLANNING from parquet footers: pages shard
    files (ordered by name) pack into ~256 KiB output groups with the
    boundary-start rule (group = floor(bytes-before-me / target) — the
    prefix-sum convention that is SQL-exact, unlike first-fit). File
    sizes come from footer column-chunk compressed sizes (metadata-only
    tasks); the plan says which input files each compaction task
    merges. Oracle: ``parquet_metadata()`` + a window prefix sum."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    import glob as _glob
    import os as _os

    files = [{"path": p, "file_name": _os.path.basename(p)}
             for p in sorted(_glob.glob(f"{pages_dir}/pages-*.parquet"))]

    def footer(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        rows = []
        for path, name in zip(df["path"], df["file_name"]):
            md = pq.ParquetFile(path).metadata
            total = 0
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                total += sum(rg.column(c).total_compressed_size
                             for c in range(rg.num_columns))
            rows.append((name, total))
        return pd.DataFrame(rows, columns=["file_name", "bytes"]).astype(
            {"bytes": "int64"})

    sizes = grouped_agg(
        _rd().from_items(files).map_batches(footer, batch_format="pandas"),
        ["file_name"], {"bytes": ("bytes", "sum")},
        num_buckets=2).to_pandas().sort_values("file_name")

    before = sizes["bytes"].cumsum().shift(fill_value=0).to_numpy()
    sizes = sizes.reset_index(drop=True)
    sizes["grp"] = (before // COMPACT_TARGET_BYTES).astype("int64")
    sizes["bytes"] = sizes["bytes"].astype("int64")
    return sizes[["file_name", "bytes", "grp"]]


SQL_COMPACTION_PLAN = f"""
WITH m AS (
  SELECT file_name, CAST(SUM(total_compressed_size) AS BIGINT) AS bytes
  FROM parquet_metadata('{PAGES_CURRENT}/pages-*.parquet')
  GROUP BY 1
), s AS (
  SELECT regexp_extract(file_name, '[^/]+$') AS file_name, bytes,
         COALESCE(SUM(bytes) OVER (
             ORDER BY regexp_extract(file_name, '[^/]+$')
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before_me
  FROM m
)
SELECT file_name, bytes,
       CAST(before_me // {COMPACT_TARGET_BYTES} AS BIGINT) AS grp
FROM s
"""


def q_iso_week_revenue(sf_dir: str):
    """ISO-8601 week rollup — the calendar-parity trap done right:
    pandas ``isocalendar()`` and DuckDB ``isoyear``/``weekofyear`` both
    implement ISO 8601 (probed equal across the fixture's year
    boundaries, where week 1 can start in December and week 52/53 can
    end in January). Per (iso_year, iso_week): orders and exact revenue
    cents, combined in one bounded exchange."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"],
                        num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        iso = df["o_orderdate"].dt.isocalendar()
        out = pd.DataFrame({
            "iso_year": iso["year"].to_numpy(np.int64),
            "iso_week": iso["week"].to_numpy(np.int64),
            "n_orders": np.ones(len(df), np.int64),
            "cents": np.rint(df["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)})
        return (out.groupby(["iso_year", "iso_week"], sort=False)
                [["n_orders", "cents"]].sum().astype("int64")
                .reset_index())

    return grouped_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["iso_year", "iso_week"],
        {"n_orders": ("n_orders", "sum"), "cents": ("cents", "sum")},
        num_buckets=2)


SQL_ISO_WEEK_REVENUE = """
SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders GROUP BY 1, 2
"""


def q_quarantine_parse_docs(sf_dir: str):
    """Dead-letter-queue ingest: JSON lines (deterministically
    corrupted for doc_id % 13 — truncation that always severs the
    closing brace) parse through
    :func:`transmog_ray.stages.quarantine.quarantine_map` — bad rows
    route to the DLQ with their exception instead of killing the task,
    good rows roll up per lang. Output unions the per-lang ok counts
    with one '(dlq)' accounting row. Oracle rebuilds the identical
    lines in SQL and splits on ``json_valid``."""
    from ..functions.relational import grouped_agg
    from ..stages.quarantine import dlq_rows, ok_rows, quarantine_map

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "n_chars"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["lang"].is_valid(),
                                   t["n_chars"].is_valid())),
        batch_format="pyarrow")

    def make_lines(df: pd.DataFrame) -> pd.DataFrame:
        lines = [
            f'{{"doc_id": {d}, "lang": "{lg}", "n_chars": {n}}}'
            for d, lg, n in zip(df["doc_id"].to_numpy(np.int64),
                                df["lang"],
                                df["n_chars"].to_numpy(np.int64))
        ]
        ids = df["doc_id"].to_numpy(np.int64)
        lines = [ln[:-5] if i % 13 == 0 else ln
                 for ln, i in zip(lines, ids)]
        return pd.DataFrame({"line": pd.array(lines, dtype=object)})

    import json

    tagged = quarantine_map(
        docs.map_batches(make_lines, batch_format="pandas"),
        json.loads, "line").materialize()

    def ok_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "sum_chars": pd.Series([], dtype="int64")})
        out = pd.DataFrame({
            "lang": df["lang"].to_numpy(object),
            "n": np.ones(len(df), np.int64),
            "sum_chars": pd.array(df["n_chars"],
                                  dtype=object).to_numpy(np.int64)})
        return (out.groupby("lang", sort=False)[["n", "sum_chars"]]
                .sum().astype("int64").reset_index())

    ok = grouped_agg(
        ok_rows(tagged).map_batches(ok_partial, batch_format="pandas"),
        ["lang"], {"n": ("n", "sum"), "sum_chars": ("sum_chars", "sum")},
        num_buckets=2).to_pandas()
    n_dlq = int(dlq_rows(tagged, "line").count())
    ok["status"] = "ok"
    dlq_row = pd.DataFrame({"lang": ["(dlq)"], "n": [np.int64(n_dlq)],
                            "sum_chars": [np.int64(0)],
                            "status": ["error"]})
    out = pd.concat([ok, dlq_row], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out[["status", "lang", "n", "sum_chars"]]


SQL_QUARANTINE_PARSE_DOCS = """
WITH src AS (
  SELECT doc_id, lang, n_chars,
         '{"doc_id": ' || doc_id || ', "lang": "' || lang
           || '", "n_chars": ' || n_chars || '}' AS full_line
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
), lines AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN substring(full_line, 1, length(full_line) - 5)
              ELSE full_line END AS line
  FROM src
), parsed AS (
  SELECT line, json_valid(line) AS ok,
         json_extract_string(line, '$.lang') AS lang,
         CAST(json_extract(line, '$.n_chars') AS BIGINT) AS n_chars
  FROM lines
)
SELECT 'ok' AS status, lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM parsed WHERE ok GROUP BY 2
UNION ALL
SELECT 'error', '(dlq)', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
FROM parsed WHERE NOT ok
"""


def q_auto_join_types(sf_dir: str):
    """Adaptive join planning (
    :func:`transmog_ray.functions.relational.auto_join`): the part dim
    probes under the broadcast limit at this scale, so the join runs
    map-side with zero shuffle and the per-type rollup fused per batch;
    had the dim outgrown the limit the SAME call degrades to the
    partitioned hash join. Per part type: items and exact quantity."""
    from ..functions.relational import auto_join, grouped_agg

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity"],
                    num_blocks=8).map_batches(
        lambda df: pd.DataFrame({
            "p_partkey": df["l_partkey"].to_numpy(np.int64),
            "qty": np.rint(df["l_quantity"].to_numpy(np.float64))
            .astype(np.int64)}),
        batch_format="pandas")
    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_type"],
                       num_blocks=4)

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"p_type": pd.Series([], dtype=object),
                                 "n_items": pd.Series([], dtype="int64"),
                                 "sum_qty": pd.Series([], dtype="int64")})
        g = df.groupby("p_type", sort=False)["qty"]
        return pd.DataFrame({"n_items": g.size().astype("int64"),
                             "sum_qty": g.sum().astype("int64")}
                            ).reset_index()

    joined = auto_join(li, parts, on="p_partkey", post_fn=rollup)
    return grouped_agg(joined, ["p_type"],
                       {"n_items": ("n_items", "sum"),
                        "sum_qty": ("sum_qty", "sum")}, num_buckets=2)


SQL_AUTO_JOIN_TYPES = """
SELECT p.p_type, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
"""


MW_LANG_A, MW_LANG_B = "en", "de"


def q_mannwhitney_langs(sf_dir: str):
    """Exact Mann-Whitney U (the nonparametric two-sample location
    test) comparing doc lengths between two languages, kept INTEGER by
    reporting 2U (ties contribute the half-count twice): 2U =
    2·Σ_{x<y} nA(x)·nB(y) + Σ_x nA(x)·nB(x) over the shared value
    HISTOGRAM — only value-domain-bounded (length, count) partials
    shuffle, never rows, so the test costs one combine regardless of
    group sizes. Oracle mirrors the histogram convolution."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["lang"].isin([MW_LANG_A, MW_LANG_B])
               & df["n_chars"].notna()]
        out = pd.DataFrame({
            "x": m["n_chars"].to_numpy(np.int64),
            "n_a": (m["lang"] == MW_LANG_A).to_numpy().astype(np.int64),
            "n_b": (m["lang"] == MW_LANG_B).to_numpy().astype(np.int64)})
        return (out.groupby("x", sort=False)[["n_a", "n_b"]]
                .sum().astype("int64").reset_index())

    hist = grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["x"], {"n_a": ("n_a", "sum"), "n_b": ("n_b", "sum")},
        num_buckets=4).to_pandas().sort_values("x")

    na = hist["n_a"].to_numpy(np.int64)
    nb = hist["n_b"].to_numpy(np.int64)
    nb_above = nb[::-1].cumsum()[::-1] - nb  # Σ n_b at strictly larger x
    u2 = int(2 * (na * nb_above).sum() + (na * nb).sum())
    return pd.DataFrame({"u2": [np.int64(u2)],
                         "n_a": [np.int64(na.sum())],
                         "n_b": [np.int64(nb.sum())]})


SQL_MANNWHITNEY_LANGS = f"""
WITH h AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(SUM(CASE WHEN lang = '{MW_LANG_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN lang = '{MW_LANG_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b
  FROM documents
  WHERE lang IN ('{MW_LANG_A}', '{MW_LANG_B}') AND n_chars IS NOT NULL
  GROUP BY 1
)
SELECT CAST(2 * COALESCE((SELECT SUM(a.n_a * b.n_b)
                          FROM h a JOIN h b ON b.x > a.x), 0)
            + COALESCE((SELECT SUM(n_a * n_b) FROM h), 0)
            AS BIGINT) AS u2,
       (SELECT CAST(SUM(n_a) AS BIGINT) FROM h) AS n_a,
       (SELECT CAST(SUM(n_b) AS BIGINT) FROM h) AS n_b
"""


SURVIVAL_CENSOR_DAYS = 7


def q_survival_table_users(sf_dir: str):
    """Kaplan-Meier survival TABLE (the exact-integer input the KM
    product-limit estimator consumes): per observed lifetime day —
    users 'dying' (last activity that day, not censored), users
    censored (still active within 7 days of the corpus end), and the
    at-risk count (suffix sum over the day histogram). Per-user
    lifetimes combine in one exchange; the day table is bounded by the
    corpus span."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"],
                    num_blocks=8)
    ev = ev.materialize()  # max-ts pass + lifetime exchange

    gmax = ev.map_batches(
        lambda df: pd.DataFrame({"m": [df["ts"].max()]}),
        batch_format="pandas").to_pandas()["m"].max()
    gmax_ns = pd.Timestamp(gmax).value
    cutoff_ns = gmax_ns - SURVIVAL_CENSOR_DAYS * 86_400_000_000_000

    def lifetimes(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="int64"),
                "n_event": pd.Series([], dtype="int64"),
                "n_censored": pd.Series([], dtype="int64")})
        ts = df["ts"].astype("datetime64[ns]").astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "ts": ts}).groupby("user_id", sort=False)["ts"]
        first, last = g.min(), g.max()
        day = ((last - first) // 86_400_000_000_000).astype("int64")
        censored = (last > cutoff_ns).astype("int64")
        out = pd.DataFrame({"day": day, "n_event": 1 - censored,
                            "n_censored": censored})
        return (out.groupby("day", sort=False)[["n_event", "n_censored"]]
                .sum().astype("int64").reset_index())

    hist = grouped_agg(
        bucket_exchange(ev, ["user_id"], lifetimes, num_buckets=8),
        ["day"], {"n_event": ("n_event", "sum"),
                  "n_censored": ("n_censored", "sum")},
        num_buckets=2).to_pandas().sort_values("day")

    leaving = (hist["n_event"] + hist["n_censored"]).to_numpy(np.int64)
    hist["n_at_risk"] = leaving[::-1].cumsum()[::-1]
    hist = hist.reset_index(drop=True)
    for c in ("day", "n_event", "n_censored", "n_at_risk"):
        hist[c] = hist[c].astype("int64")
    return hist


SQL_SURVIVAL_TABLE_USERS = f"""
WITH bounds AS (
  SELECT MAX(ts) AS gmax FROM events
), lt AS (
  SELECT user_id,
         CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
           // 86400000000 AS day,
         CASE WHEN epoch_us(MAX(ts)) >
                   (SELECT epoch_us(gmax) FROM bounds)
                   - {SURVIVAL_CENSOR_DAYS} * CAST(86400000000 AS BIGINT)
              THEN 1 ELSE 0 END AS censored
  FROM events GROUP BY user_id
), h AS (
  SELECT day, CAST(SUM(1 - censored) AS BIGINT) AS n_event,
         CAST(SUM(censored) AS BIGINT) AS n_censored
  FROM lt GROUP BY 1
)
SELECT day, n_event, n_censored,
       CAST(SUM(n_event + n_censored) OVER (
           ORDER BY day DESC ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS n_at_risk
FROM h
"""


IMG_FIXTURE_ROOT = "/tmp/transmog_ray_images"
IMG_CURRENT = f"{IMG_FIXTURE_ROOT}/current"
IMG_HW = 32


def _image_fixture(sf_dir: str) -> str:
    """REAL encoded image payloads (BMP for even ids, binary PPM for
    odd) whose pixels follow the closed form (7·id + 3·y + x) % 256 —
    so the oracle regenerates pixels from the formula and any decode
    bug in the engine's codec path breaks the hash."""
    import os

    from ..stages.multimodal import encode_bmp, encode_ppm

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n = {"sf0.001": 64, "sf0.01": 128, "sf0.1": 256}.get(scale, 64)
    out_dir = f"{IMG_FIXTURE_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/images.parquet"
    if not os.path.exists(path):
        import pyarrow.parquet as pq

        y, x = np.mgrid[0:IMG_HW, 0:IMG_HW]
        payloads, ids = [], []
        for i in range(n):
            gray = ((7 * i + 3 * y + x) % 256).astype(np.uint8)
            enc = encode_bmp if i % 2 == 0 else encode_ppm
            ids.append(i)
            payloads.append(enc(gray))
        tbl = pa.table({"id": np.asarray(ids, np.int64),
                        "payload": pa.array(payloads, pa.binary())})
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    _repoint_current(out_dir, IMG_CURRENT)
    return out_dir


def q_image_thumbnail_stats(sf_dir: str):
    """END-TO-END real image decode: sniff the container (BMP vs binary
    PPM), decode through the pure-Python codec paths
    (stages/multimodal.py), then average-pool each 32×32 grayscale to a
    4×4 integer thumbnail (cell = Σblock // 64 — exact floor mean).
    Decode state lives in an actor pool (__init__ once per actor). The
    oracle regenerates the pixels from the fixture's closed form, so a
    wrong byte ANYWHERE in sniff → decode → pool mismatches."""
    media_dir = _image_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/images.parquet")

    class ThumbStage:
        def __init__(self):
            from ..stages.multimodal import (decode_bmp, decode_ppm,
                                             sniff_image)

            self._decoders = {"bmp": decode_bmp, "ppm": decode_ppm}
            self._sniff = sniff_image

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, cys, cxs, means = [], [], [], []
            for i, payload in zip(df["id"].to_numpy(np.int64),
                                  df["payload"]):
                raw = bytes(payload)
                kind = self._sniff(raw)
                gray = self._decoders[kind](raw).astype(np.int64)
                h, w = gray.shape
                pooled = (gray.reshape(h // 8, 8, w // 8, 8)
                          .sum(axis=(1, 3)) // 64)
                cy, cx = np.mgrid[0:h // 8, 0:w // 8]
                ids.append(np.full(pooled.size, i, np.int64))
                cys.append(cy.ravel().astype(np.int64))
                cxs.append(cx.ravel().astype(np.int64))
                means.append(pooled.ravel())
            if not ids:
                return pd.DataFrame({
                    "id": pd.Series([], dtype="int64"),
                    "cell_y": pd.Series([], dtype="int64"),
                    "cell_x": pd.Series([], dtype="int64"),
                    "cell_mean": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "id": np.concatenate(ids),
                "cell_y": np.concatenate(cys),
                "cell_x": np.concatenate(cxs),
                "cell_mean": np.concatenate(means)})

    return ds.map_batches(ThumbStage, concurrency=2, batch_size=32,
                          batch_format="pandas")


SQL_IMAGE_THUMBNAIL_STATS = f"""
WITH px AS (
  SELECT id, CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
         (7 * id + 3 * t1.y + t2.x) % 256 AS g
  FROM read_parquet('{IMG_CURRENT}/images.parquet'),
       unnest(range({IMG_HW})) t1(y), unnest(range({IMG_HW})) t2(x)
)
SELECT id, y // 8 AS cell_y, x // 8 AS cell_x,
       CAST(SUM(g) // 64 AS BIGINT) AS cell_mean
FROM px GROUP BY 1, 2, 3
"""


WAV_FIXTURE_ROOT = "/tmp/transmog_ray_wavs"
WAV_CURRENT = f"{WAV_FIXTURE_ROOT}/current"
WAV_N_SAMPLES = 1024
WAV_WINDOW = 256


def _wav_fixture(sf_dir: str) -> str:
    """REAL RIFF/WAVE containers (16-bit PCM) whose samples follow the
    closed form ((13·id + 5·i) % 4001) − 2000, so the oracle
    regenerates the waveform from the formula and any header-walk or
    sample-decode bug in parse_wav breaks the hash."""
    import os

    from ..stages.multimodal import encode_wav

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n = {"sf0.001": 32, "sf0.01": 64, "sf0.1": 128}.get(scale, 32)
    out_dir = f"{WAV_FIXTURE_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/wavs.parquet"
    if not os.path.exists(path):
        import pyarrow.parquet as pq

        i = np.arange(WAV_N_SAMPLES, dtype=np.int64)
        ids, payloads = [], []
        for k in range(n):
            samples = ((13 * k + 5 * i) % 4001 - 2000).astype(np.int16)
            ids.append(k)
            payloads.append(encode_wav(samples))
        tbl = pa.table({"id": np.asarray(ids, np.int64),
                        "payload": pa.array(payloads, pa.binary())})
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    _repoint_current(out_dir, WAV_CURRENT)
    return out_dir


def q_wav_energy_stats(sf_dir: str):
    """END-TO-END real audio-container decode: sniff RIFF/WAVE, walk
    the chunk list, decode 16-bit PCM (stages/multimodal.parse_wav),
    then per 256-sample window emit integer |energy| sums and peak —
    the VAD/loudness front-end shape. Actor-pool stage; the oracle
    regenerates the waveform from the fixture's closed form."""
    media_dir = _wav_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/wavs.parquet")

    class WavStage:
        def __init__(self):
            from ..stages.multimodal import parse_wav, sniff_wav

            self._parse = parse_wav
            self._sniff = sniff_wav

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, wins, sums, peaks = [], [], [], []
            for i, payload in zip(df["id"].to_numpy(np.int64),
                                  df["payload"]):
                raw = bytes(payload)
                if not self._sniff(raw):
                    continue
                samples, _rate, _ch = self._parse(raw)
                a = np.abs(samples.astype(np.int64))
                nw = len(a) // WAV_WINDOW
                w = a[: nw * WAV_WINDOW].reshape(nw, WAV_WINDOW)
                ids.append(np.full(nw, i, np.int64))
                wins.append(np.arange(nw, dtype=np.int64))
                sums.append(w.sum(axis=1))
                peaks.append(w.max(axis=1))
            if not ids:
                return pd.DataFrame({
                    "id": pd.Series([], dtype="int64"),
                    "win": pd.Series([], dtype="int64"),
                    "abs_sum": pd.Series([], dtype="int64"),
                    "abs_peak": pd.Series([], dtype="int64")})
            return pd.DataFrame({
                "id": np.concatenate(ids),
                "win": np.concatenate(wins),
                "abs_sum": np.concatenate(sums),
                "abs_peak": np.concatenate(peaks)})

    return ds.map_batches(WavStage, concurrency=2, batch_size=32,
                          batch_format="pandas")


SQL_WAV_ENERGY_STATS = f"""
WITH s AS (
  SELECT id, CAST(t.i AS BIGINT) AS i,
         (13 * id + 5 * t.i) % 4001 - 2000 AS v
  FROM read_parquet('{WAV_CURRENT}/wavs.parquet'),
       unnest(range({WAV_N_SAMPLES})) t(i)
)
SELECT id, i // {WAV_WINDOW} AS win,
       CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum,
       CAST(MAX(ABS(v)) AS BIGINT) AS abs_peak
FROM s GROUP BY 1, 2
"""


def q_emd_langs(sf_dir: str):
    """1-D earth mover's distance between two languages' doc-length
    distributions, EXACT as an integer: EMD = Σ_gaps |CDF_a·n_b −
    CDF_b·n_a| · gap_width over the merged value histogram (the
    cross-multiplication clears both normalizations — no division
    ever). Only the value-domain-bounded histogram shuffles; the gap
    sweep runs on that bounded frame. The drift metric KS misses
    (magnitude-weighted, not sup-norm)."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["lang"].isin([MW_LANG_A, MW_LANG_B])
               & df["n_chars"].notna()]
        out = pd.DataFrame({
            "x": m["n_chars"].to_numpy(np.int64),
            "n_a": (m["lang"] == MW_LANG_A).to_numpy().astype(np.int64),
            "n_b": (m["lang"] == MW_LANG_B).to_numpy().astype(np.int64)})
        return (out.groupby("x", sort=False)[["n_a", "n_b"]]
                .sum().astype("int64").reset_index())

    hist = grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["x"], {"n_a": ("n_a", "sum"), "n_b": ("n_b", "sum")},
        num_buckets=4).to_pandas().sort_values("x")

    x = hist["x"].to_numpy(np.int64)
    ca = hist["n_a"].cumsum().to_numpy(np.int64)
    cb = hist["n_b"].cumsum().to_numpy(np.int64)
    na, nb = int(ca[-1]), int(cb[-1])
    gaps = x[1:] - x[:-1]
    emd = int((np.abs(ca[:-1] * nb - cb[:-1] * na) * gaps).sum())
    return pd.DataFrame({"emd_scaled": [np.int64(emd)],
                         "n_a": [np.int64(na)], "n_b": [np.int64(nb)]})


SQL_EMD_LANGS = f"""
WITH h AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(SUM(CASE WHEN lang = '{MW_LANG_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN lang = '{MW_LANG_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b
  FROM documents
  WHERE lang IN ('{MW_LANG_A}', '{MW_LANG_B}') AND n_chars IS NOT NULL
  GROUP BY 1
), c AS (
  SELECT x,
         SUM(n_a) OVER (ORDER BY x) AS ca,
         SUM(n_b) OVER (ORDER BY x) AS cb,
         LEAD(x) OVER (ORDER BY x) AS next_x
  FROM h
), t AS (
  SELECT (SELECT SUM(n_a) FROM h) AS na, (SELECT SUM(n_b) FROM h) AS nb
)
SELECT CAST(COALESCE(SUM(ABS(ca * t.nb - cb * t.na)
                         * (next_x - x)), 0) AS BIGINT) AS emd_scaled,
       CAST(MAX(t.na) AS BIGINT) AS n_a,
       CAST(MAX(t.nb) AS BIGINT) AS n_b
FROM c, t WHERE next_x IS NOT NULL
"""


def q_hist_intersection_langs(sf_dir: str):
    """Histogram-intersection similarity for EVERY language pair over
    the doc-length histogram: Σ_x min(cnt_a(x), cnt_b(x)) — the integer
    overlap mass. One (lang, length)-grain combine; the pair sweep runs
    on the langs×values bounded frame."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"],
                      num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["lang"].notna() & df["n_chars"].notna()]
        out = pd.DataFrame({"lang": m["lang"].to_numpy(object),
                            "x": m["n_chars"].to_numpy(np.int64),
                            "n": np.ones(len(m), np.int64)})
        return (out.groupby(["lang", "x"], sort=False)["n"].sum()
                .astype("int64").reset_index())

    hist = grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang", "x"], {"n": ("n", "sum")}, num_buckets=4).to_pandas()

    wide = hist.pivot_table(index="x", columns="lang", values="n",
                            fill_value=0, aggfunc="sum")
    langs = sorted(wide.columns)
    rows = []
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            inter = int(np.minimum(wide[a].to_numpy(np.int64),
                                   wide[b].to_numpy(np.int64)).sum())
            rows.append((a, b, inter,
                         int(wide[a].sum()), int(wide[b].sum())))
    out = pd.DataFrame(rows, columns=["lang_a", "lang_b",
                                      "intersection", "n_a", "n_b"])
    for c in ("intersection", "n_a", "n_b"):
        out[c] = out[c].astype("int64")
    return out


SQL_HIST_INTERSECTION_LANGS = """
WITH h AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2
), langs AS (
  SELECT DISTINCT lang FROM h
), pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b
  FROM langs a JOIN langs b ON a.lang < b.lang
), xs AS (
  SELECT DISTINCT x FROM h
), grid AS (
  SELECT p.lang_a, p.lang_b, xs.x,
         COALESCE(ha.n, 0) AS na, COALESCE(hb.n, 0) AS nb
  FROM pairs p CROSS JOIN xs
  LEFT JOIN h ha ON ha.lang = p.lang_a AND ha.x = xs.x
  LEFT JOIN h hb ON hb.lang = p.lang_b AND hb.x = xs.x
)
SELECT lang_a, lang_b,
       CAST(SUM(LEAST(na, nb)) AS BIGINT) AS intersection,
       CAST(SUM(na) AS BIGINT) AS n_a,
       CAST(SUM(nb) AS BIGINT) AS n_b
FROM grid GROUP BY 1, 2
"""


def pava_pools(values, counts=None):
    """Pool-adjacent-violators (isotonic regression, non-decreasing) on
    integer (sum, count) pairs — pools merge while mean_prev > mean_next,
    compared CROSS-MULTIPLIED (s_a·n_b > s_b·n_a), so the fit is exact
    rational arithmetic with no float means. Returns (start_idx,
    pool_sum, pool_n) triples. The single-process reference for
    :func:`q_isotonic_daily` (and the in-kernel implementation — PAVA is
    one linear stack pass)."""
    sums = [int(v) for v in values]
    ns = [1] * len(sums) if counts is None else [int(c) for c in counts]
    starts: list[int] = []
    ps: list[int] = []
    pn: list[int] = []
    for i, (s, n) in enumerate(zip(sums, ns)):
        starts.append(i)
        ps.append(s)
        pn.append(n)
        while (len(ps) > 1
               and ps[-2] * pn[-1] > ps[-1] * pn[-2]):
            s2, n2 = ps.pop(), pn.pop()
            starts.pop()
            ps[-1] += s2
            pn[-1] += n2
    return list(zip(starts, ps, pn))


def q_isotonic_daily(sf_dir: str):
    """EXACT isotonic regression (PAVA) of daily revenue against time —
    the monotone-trend fit behind calibration curves and trend repair —
    kept rational: pools compare as s_a·n_b vs s_b·n_a, never float
    means. Daily totals combine distributed; the linear stack pass runs
    on the date-bounded frame. Rows-only (SQL has no PAVA); pinned by a
    brute-force reference test."""
    from ..functions.relational import grouped_agg

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"],
                        num_blocks=8)

    def daily(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["o_orderdate"].astype("datetime64[ns]")
               .to_numpy("datetime64[D]").astype(np.int64))
        cents = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        out = pd.DataFrame({"day_id": day, "cents": cents})
        return (out.groupby("day_id", sort=False)["cents"].sum()
                .astype("int64").reset_index())

    tot = grouped_agg(
        orders.map_batches(daily, batch_format="pandas"),
        ["day_id"], {"cents": ("cents", "sum")},
        num_buckets=4).to_pandas().sort_values("day_id")

    pools = pava_pools(tot["cents"].to_numpy(np.int64))
    days = tot["day_id"].to_numpy(np.int64)
    out = pd.DataFrame({
        "pool_start_day": [np.int64(days[s]) for s, _, _ in pools],
        "pool_sum_cents": [np.int64(s) for _, s, _ in pools],
        "pool_n_days": [np.int64(n) for _, _, n in pools]})
    return out


SESSION_SWEEP_GAPS = (300, 900, 1800, 3600)


def q_session_threshold_sweep(sf_dir: str):
    """Parameter-sweep FUSION: session counts at four inactivity
    thresholds from ONE scan — per user the sorted gap array serves
    every threshold (sessions(t) = users + Σ gaps > t), so a 4-point
    sensitivity analysis costs one exchange instead of four
    sessionization runs. The calibration table behind choosing the
    30-minute default."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id"], num_blocks=8)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "gap_s": pd.Series([], dtype="int64"),
                "n_sessions": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        ts = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy(np.int64)
        same_user = np.empty(len(df), bool)
        same_user[0] = False
        same_user[1:] = uid[1:] == uid[:-1]
        gaps = np.empty(len(df), np.int64)
        gaps[0] = 0
        gaps[1:] = ts[1:] - ts[:-1]
        gaps = gaps[same_user]  # within-user inter-event gaps only
        n_users = int((~same_user).sum())
        rows = [(int(t), n_users
                 + int((gaps > t * 1_000_000_000).sum()))
                for t in SESSION_SWEEP_GAPS]
        return pd.DataFrame(rows, columns=["gap_s", "n_sessions"]
                            ).astype("int64")

    partials = bucket_exchange(ev, ["user_id"], per_bucket, num_buckets=8)
    return grouped_agg(partials, ["gap_s"],
                       {"n_sessions": ("n_sessions", "sum")},
                       num_buckets=2)


SQL_SESSION_THRESHOLD_SWEEP = f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
), t AS (
  SELECT unnest([{", ".join(str(t) for t in SESSION_SWEEP_GAPS)}]) AS gap_s
)
SELECT CAST(t.gap_s AS BIGINT) AS gap_s,
       CAST(SUM(CASE WHEN g.gap_us IS NULL
                       OR g.gap_us > t.gap_s * CAST(1000000 AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM g CROSS JOIN t
GROUP BY 1
"""


def q_mirror_detection_pages(sf_dir: str):
    """MIRROR detection: text bodies (md5 identity) served from >= 2
    DIFFERENT domains — the cross-host duplication canonicalization
    can't see (same path mirrored on www./cdn./regional hosts). One
    hash-keyed exchange of (md5, domain, url) triples; text never
    shuffles. Output per mirrored body: domain and url spread plus
    total snapshot copies."""
    import hashlib

    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "text"],
                            override_num_blocks=16)

    def triples(df: pd.DataFrame) -> pd.DataFrame:
        md5 = [hashlib.md5((t or "").encode()).hexdigest()
               for t in df["text"]]
        dom = (df["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        out = pd.DataFrame({"md5": md5, "domain": dom.to_numpy(object),
                            "url": df["url"].to_numpy(object)})
        out["n_copies"] = np.int64(1)
        return (out.groupby(["md5", "domain", "url"], sort=False)
                ["n_copies"].sum().astype("int64").reset_index())

    grain = grouped_agg(
        ds.map_batches(triples, batch_format="pandas"),
        ["md5", "domain", "url"], {"n_copies": ("n_copies", "sum")},
        num_buckets=8)

    def per_hash(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("md5", sort=False)
        out = pd.DataFrame({
            "n_domains": g["domain"].nunique().astype("int64"),
            "n_urls": g["url"].nunique().astype("int64"),
            "n_copies": g["n_copies"].sum().astype("int64"),
        }).reset_index()
        return out[out["n_domains"] >= 2]

    return bucket_exchange(grain, ["md5"], per_hash, num_buckets=8)


SQL_MIRROR_DETECTION_PAGES = f"""
WITH t AS (
  SELECT md5(COALESCE(text, '')) AS md5,
         split_part(split_part(url, '//', 2), '/', 1) AS domain,
         url
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
)
SELECT md5, CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM t GROUP BY 1
HAVING COUNT(DISTINCT domain) >= 2
"""


def q_crawl_fairness_daily(sf_dir: str):
    """Jain's fairness index of the crawl's per-domain fetch shares,
    per day, in EXACT integer rational form: fairness = (Σx)²/(n·Σx²)
    reported as the two BIGINT terms (num = (Σx)², den = n·Σx²) — 1/n
    means one domain hogged the day, 1 means perfectly even. Per-day
    per-domain counts combine in one exchange; the index terms fold on
    the (day × domain)-bounded frame."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    ds = _rd().read_parquet(pages_dir, columns=["url", "warc_ts"],
                            override_num_blocks=16)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["warc_ts"].astype("datetime64[ns]")
               .to_numpy("datetime64[D]").astype(np.int64))
        dom = (df["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        out = pd.DataFrame({"day_id": day, "domain": dom.to_numpy(object)})
        out["x"] = np.int64(1)
        return (out.groupby(["day_id", "domain"], sort=False)["x"].sum()
                .astype("int64").reset_index())

    grain = grouped_agg(
        ds.map_batches(counts, batch_format="pandas"),
        ["day_id", "domain"], {"x": ("x", "sum")}, num_buckets=8)

    def per_day(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day_id", sort=False)["x"]
        tot = g.sum().astype("int64")
        sq = g.apply(lambda s: int((s.to_numpy(np.int64) ** 2).sum()))
        n = g.size().astype("int64")
        out = pd.DataFrame({
            "day_id": tot.index.to_numpy(np.int64),
            "n_domains": n.to_numpy(np.int64),
            "fair_num": (tot.to_numpy(np.int64) ** 2),
            "fair_den": n.to_numpy(np.int64) * sq.to_numpy(np.int64)})
        return out

    return bucket_exchange(grain, ["day_id"], per_day, num_buckets=4)


SQL_CRAWL_FAIRNESS_DAILY = f"""
WITH c AS (
  SELECT date_diff('day', TIMESTAMP '1970-01-01',
                   CAST(warc_ts AS TIMESTAMP)) AS day_id,
         split_part(split_part(url, '//', 2), '/', 1) AS domain,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  GROUP BY 1, 2
)
SELECT day_id, CAST(COUNT(*) AS BIGINT) AS n_domains,
       CAST(SUM(x) * SUM(x) AS BIGINT) AS fair_num,
       CAST(COUNT(*) * SUM(x * x) AS BIGINT) AS fair_den
FROM c GROUP BY 1
"""


def q_overlapping_shipments(sf_dir: str):
    """Interval-overlap PAIR COUNT per supplier without materializing
    pairs: each lineitem occupies the closed day window [shipdate,
    shipdate + quantity days]; two shipments of one supplier overlap
    iff a.start <= b.end AND b.start <= a.end. The kernel counts the
    COMPLEMENT — for every interval, how many others END strictly
    before it STARTS (one searchsorted against the sorted end days;
    for an unordered pair exactly one side can satisfy it) — so the
    per-group cost is O(n log n) while the SQL oracle pays the
    quadratic self-join. One supplier-keyed exchange."""
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_shipdate", "l_quantity"],
                    num_blocks=8)

    def per_supp(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["l_shipdate"].astype("datetime64[ns]")
               .to_numpy("datetime64[D]").astype(np.int64))
        qty = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        frame = pd.DataFrame({"s": df["l_suppkey"].to_numpy(np.int64),
                              "st": day, "en": day + qty})
        rows = []
        for s, g in frame.groupby("s", sort=False):
            st = g["st"].to_numpy(np.int64)
            en = np.sort(g["en"].to_numpy(np.int64))
            n = len(st)
            disjoint = int(np.searchsorted(en, st, side="left").sum())
            rows.append((s, n, n * (n - 1) // 2 - disjoint))
        return pd.DataFrame(
            rows, columns=["l_suppkey", "n_shipments", "overlap_pairs"]
        ).astype("int64")

    return bucket_exchange(li, ["l_suppkey"], per_supp, num_buckets=8)


SQL_OVERLAPPING_SHIPMENTS = """
WITH d AS (
  -- (l_orderkey, l_linenumber) is NOT unique in the synthetic table;
  -- any unique row id works as the pair-dedup key because the pair
  -- COUNT is invariant to which member of the pair owns it.
  SELECT l_suppkey AS s,
         ROW_NUMBER() OVER () AS k,
         date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) AS st,
         date_diff('day', TIMESTAMP '1970-01-01', l_shipdate)
           + CAST(l_quantity AS BIGINT) AS en
  FROM lineitem
), base AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n_shipments FROM d GROUP BY 1
), p AS (
  SELECT a.s, CAST(COUNT(*) AS BIGINT) AS overlap_pairs
  FROM d a JOIN d b
    ON a.s = b.s AND a.k < b.k AND a.st <= b.en AND b.st <= a.en
  GROUP BY 1
)
SELECT base.s AS l_suppkey, base.n_shipments,
       CAST(COALESCE(p.overlap_pairs, 0) AS BIGINT) AS overlap_pairs
FROM base LEFT JOIN p ON base.s = p.s
"""


def q_max_drawdown_users(sf_dir: str):
    """Maximum drawdown per user over the (ts, event_id)-ordered event
    value series: max over time of running-peak minus current value —
    the classic risk statistic, an expanding-max scan. Values are
    integerized with FLOOR(value*100) on BOTH sides (events.value is
    not fixed-decimal, so ROUND could straddle a half boundary; float64
    *100 then floor is the same IEEE op sequence in numpy and DuckDB).
    One user-keyed exchange; numpy maximum.accumulate per group."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["value"].is_valid()),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        ts = (df["ts"].astype("datetime64[ns]").to_numpy(np.int64))
        cents = np.floor(
            df["value"].to_numpy(np.float64) * 100).astype(np.int64)
        frame = pd.DataFrame({"u": df["user_id"].to_numpy(np.int64),
                              "ts": ts,
                              "eid": df["event_id"].to_numpy(np.int64),
                              "c": cents})
        frame = frame.sort_values(["u", "ts", "eid"], kind="mergesort")
        rows = []
        for u, g in frame.groupby("u", sort=False):
            c = g["c"].to_numpy(np.int64)
            peak = np.maximum.accumulate(c)
            rows.append((u, len(c), int((peak - c).max()),
                         int(peak[-1])))
        return pd.DataFrame(
            rows, columns=["user_id", "n_events", "max_dd_cents",
                           "peak_cents"]).astype("int64")

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_MAX_DRAWDOWN_USERS = """
WITH d AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT user_id, c,
         MAX(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM d
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(peak - c) AS BIGINT) AS max_dd_cents,
       CAST(MAX(CASE WHEN rn = 1 THEN peak END) AS BIGINT) AS peak_cents
FROM r GROUP BY 1
"""


def q_holt_forecast_types(sf_dir: str):
    """Holt double-exponential smoothing (level+trend) per event type
    over its day-ordered daily totals, alpha=1/2 beta=1/4: level' =
    x/2 + (level+trend)/2; trend' = (level'-level)/4 + 3*trend/4.
    Cross-engine exactness: both engines run the IDENTICAL left-fold
    op sequence on float64 (+ and * are correctly rounded), so the
    smoothed floats are bit-equal — the oracle folds with DuckDB
    ``list_reduce`` over STRUCT(lv, tr) elements, whose first element
    is the initial state (level=first total, trend=0), exactly like
    the kernel. Daily totals combine distributed (one bounded
    exchange); the fold runs on the tiny type×day frame."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["value"].is_valid(),
                                   t["event_type"].is_valid())),
        batch_format="pyarrow")

    def daily(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("datetime64[ns]")
               .to_numpy("datetime64[D]").astype(np.int64))
        cents = np.floor(
            df["value"].to_numpy(np.float64) * 100).astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"],
                            "day_id": day, "c": cents})
        return (out.groupby(["event_type", "day_id"], sort=False)["c"]
                .sum().astype("int64").reset_index())

    tot = grouped_agg(
        ev.map_batches(daily, batch_format="pandas"),
        ["event_type", "day_id"], {"c": ("c", "sum")},
        num_buckets=4).to_pandas()
    tot = tot.sort_values(["event_type", "day_id"], kind="mergesort")

    rows = []
    for etype, g in tot.groupby("event_type", sort=False):
        xs = g["c"].to_numpy(np.float64)
        lv, tr = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (lv + tr)
            tr = 0.25 * (nl - lv) + 0.75 * tr
            lv = nl
        rows.append((etype, len(xs), lv, tr, lv + tr))
    return pd.DataFrame(rows, columns=["event_type", "n_days", "level",
                                       "trend", "forecast_next"]).astype(
        {"n_days": "int64"})


SQL_HOLT_FORECAST_TYPES = """
-- Recursive-CTE fold, NOT list_reduce: DuckDB's list_reduce mutates
-- the struct accumulator field-by-field inside struct_pack (the trend
-- expression would see the already-updated level), so a struct fold
-- silently computes the wrong recurrence. The CTE advances every
-- event_type one day per round with standard SQL semantics.
WITH RECURSIVE d AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY day_id) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         x
  FROM (
    SELECT event_type,
           date_diff('day', TIMESTAMP '1970-01-01',
                     CAST(ts AS DATE)::TIMESTAMP) AS day_id,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) AS x
    FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    GROUP BY 1, 2
  )
), h AS (
  SELECT event_type, i, n, x AS lv, CAST(0 AS DOUBLE) AS tr
  FROM d WHERE i = 1
  UNION ALL
  SELECT d.event_type, d.i, d.n,
         0.5 * d.x + 0.5 * (h.lv + h.tr) AS lv,
         0.25 * ((0.5 * d.x + 0.5 * (h.lv + h.tr)) - h.lv)
           + 0.75 * h.tr AS tr
  FROM h JOIN d ON d.event_type = h.event_type AND d.i = h.i + 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, lv AS level,
       tr AS trend, lv + tr AS forecast_next
FROM h WHERE i = n
"""


def q_pr_curve_docs(sf_dir: str):
    """Exact precision-recall curve points for a deterministic integer
    scorer (2*count('e') + count(' ') per doc) against the lang='en'
    label: one row per DISTINCT score with cumulative TP/FP for the
    'predict positive at score >= t' rule. Per-score (pos, neg) counts
    combine distributed; the cumulative sweep runs on the
    score-cardinality frame. pc.count_substring matches SQL's
    occurrence count exactly (codepoint semantics)."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents",
                      columns=["text", "lang"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(t["text"].is_valid()),
        batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        s = pc.add(pc.multiply(pc.count_substring(t["text"], "e"),
                               pa.scalar(2, pa.int32())),
                   pc.count_substring(t["text"], " "))
        is_en = pc.equal(pc.coalesce(t["lang"], pa.scalar("")), "en")
        pos = pc.cast(is_en, pa.int64())
        return pa.table({
            "score": pc.cast(s, pa.int64()),
            "pos": pos,
            "neg": pc.subtract(pa.scalar(1, pa.int64()), pos)})

    counts = grouped_agg(
        docs.map_batches(score, batch_format="pyarrow"),
        ["score"], {"pos": ("pos", "sum"), "neg": ("neg", "sum")},
        num_buckets=4).to_pandas().sort_values("score",
                                               ascending=False)
    counts["tp"] = counts["pos"].cumsum()
    counts["fp"] = counts["neg"].cumsum()
    out = counts[["score", "tp", "fp"]].astype("int64")
    return out


SQL_PR_CURVE_DOCS = """
WITH d AS (
  SELECT 2 * (length(text) - length(replace(text, 'e', '')))
           + (length(text) - length(replace(text, ' ', ''))) AS score,
         CASE WHEN COALESCE(lang, '') = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT score, SUM(pos) AS p, SUM(1 - pos) AS n
  FROM d GROUP BY 1
)
SELECT CAST(score AS BIGINT) AS score,
       CAST(SUM(p) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
       CAST(SUM(n) OVER (ORDER BY score DESC) AS BIGINT) AS fp
FROM g
"""


def q_graph_walks_pages(sf_dir: str):
    """Deterministic node2vec-style RANDOM-WALK CORPUS over the page
    link graph — the sequence generator graph-embedding training
    consumes. One walk per source url, 2 hops; the step function is
    md5-derived (next = neighbors_sorted[h(start|step|cur) % deg]), so
    the walk is reproducible and SQL-replayable (the md5-prefix BIGINT
    trick). Distributed shape: edges rank once per src in a bucketed
    exchange; each hop is ONE frontier↔adjacency co-bucketed exchange
    (frontier rows route by their current node) — no driver loop over
    nodes, and hop state is one row per walk regardless of graph size.
    Walks ending at a dangling node (no outlinks) emit hop2 = NULL."""
    import hashlib

    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    pages = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                               override_num_blocks=16)

    edges = pages.map_batches(
        lambda df: _explode_hrefs(df)
        .rename(columns={"url": "node", "href": "dst"})
        .drop_duplicates(),
        batch_format="pandas").materialize()

    def _h(start: str, step: int, cur: str) -> int:
        key = f"{start}|{step}|{cur}".encode()
        return int(hashlib.md5(key).hexdigest()[:8], 16)

    def _hop(frontier, step: int):
        """One walk step: frontier rows (start, node=cur) and adjacency
        rows (node=src, dst) meet in the node-routed bucket; the kernel
        picks neighbors_sorted[h % deg] per walk. The empty-string
        sentinel (urls are never empty) keeps the unioned columns
        string-typed — an all-None pad column would go Arrow-null and
        break the union. Python-str ordering == DuckDB binary collation
        on ASCII urls."""
        # reset_index before mixing column Series with fresh Series:
        # upstream drop_duplicates leaves GAPPED indexes and the
        # DataFrame constructor aligns on index, padding NaN rows
        fr = frontier.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"].reset_index(drop=True).astype(object),
                "walk_start": df["walk_start"].reset_index(
                    drop=True).astype(object),
                "dst": pd.Series([""] * len(df), dtype=object)}),
            batch_format="pandas")
        ed = edges.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"].reset_index(drop=True).astype(object),
                "walk_start": pd.Series([""] * len(df), dtype=object),
                "dst": df["dst"].reset_index(drop=True).astype(object)}),
            batch_format="pandas")

        def kernel(df: pd.DataFrame) -> pd.DataFrame:
            adj = df[df["walk_start"] == ""]
            # np.unique sorts AND dedups: the map-side drop_duplicates
            # is per-batch only (the same edge recurs across page
            # SNAPSHOTS in different batches), while the oracle's
            # DISTINCT is global — the kernel owns every copy of its
            # node's edges, so the in-kernel unique is exact.
            nbrs = {n: np.unique(g["dst"].to_numpy(object))
                    for n, g in adj.groupby("node", sort=False)}
            outs, outn = [], []
            walks = df[df["walk_start"] != ""]
            for start, cur in zip(walks["walk_start"], walks["node"]):
                cands = nbrs.get(cur)
                if cands is None:
                    continue
                outs.append(start)
                outn.append(cands[_h(start, step, cur) % len(cands)])
            return pd.DataFrame({
                "walk_start": pd.Series(outs, dtype=object),
                "node": pd.Series(outn, dtype=object)})

        return bucket_exchange(fr.union(ed), ["node"], kernel,
                               num_buckets=8)

    starts = edges.map_batches(
        lambda df: pd.DataFrame({
            "walk_start": df["node"].drop_duplicates().astype(object)})
        .assign(node=lambda d: d["walk_start"]),
        batch_format="pandas")
    h1 = _hop(starts, 1).materialize()
    h2 = _hop(h1, 2).to_pandas()
    if "walk_start" not in h2.columns:
        # provably-empty hop (every hop1 target dangling): a zero-row
        # Dataset loses its columns through to_pandas()
        h2 = pd.DataFrame({"walk_start": pd.Series(dtype=object),
                           "node": pd.Series(dtype=object)})

    out = h1.to_pandas().rename(columns={"node": "hop1"})
    out = out.merge(h2.rename(columns={"node": "hop2"}),
                    on="walk_start", how="left")
    # merge pads missing hop2 with float NaN — normalize to None so the
    # object column round-trips as a string-typed Arrow null
    out["hop2"] = out["hop2"].where(out["hop2"].notna(), None)
    # starts dedup across blocks: drop_duplicates per batch is partial
    return out.drop_duplicates(["walk_start"]).reset_index(drop=True)[
        ["walk_start", "hop1", "hop2"]]


SQL_GRAPH_WALKS_PAGES = f"""
WITH l AS (
  SELECT url AS src,
         json_extract_string(
           unnest(CAST(json_extract(meta, '$.links') AS JSON[])),
           '$.href') AS dst
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
), e AS (
  SELECT DISTINCT src, dst FROM l WHERE dst IS NOT NULL
), r AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM e
), h1 AS (
  SELECT s.walk_start, r.dst AS hop1
  FROM (SELECT DISTINCT src AS walk_start FROM e) s
  JOIN r ON r.src = s.walk_start
   AND r.rk = 1 + CAST(CONCAT('0x',
         substring(md5(s.walk_start || '|1|' || s.walk_start), 1, 8))
         AS BIGINT) % r.deg
)
SELECT h1.walk_start, h1.hop1, r.dst AS hop2
FROM h1 LEFT JOIN r ON r.src = h1.hop1
 AND r.rk = 1 + CAST(CONCAT('0x',
       substring(md5(h1.walk_start || '|2|' || h1.hop1), 1, 8))
       AS BIGINT) % r.deg
"""


CONTAIN_MAX_DF = 50


def q_containment_pairs_docs(sf_dir: str):
    """Near-dup by n-gram CONTAINMENT (|A∩B| / |A| ≥ 0.8) — catches a
    doc embedded inside a larger one, which symmetric Jaccard misses.
    Rare-gram semantics: word 3-grams appearing in more than
    CONTAIN_MAX_DF docs are dropped on BOTH sides (standard df filter;
    bounds every inverted-index group at df², the same posture as
    PPJoin's prefix filter). Two bounded exchanges: gram-routed pair
    partials (the x==y diagonal doubles as the per-doc rare-gram
    size), then an id_a-routed combine + rational threshold compare
    (5·shared ≥ 4·size_a — no float division)."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        ids, gs = [], []
        for i, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            w = (text or "").split(" ")
            if len(w) < 3:
                uniq = {" ".join(w)}
            else:
                uniq = {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
            ids.extend([i] * len(uniq))
            gs.extend(uniq)
        return pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                             "ngram": pd.Series(gs, dtype=object)})

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        outa, outb, outn = [], [], []
        for _, g in df.groupby("ngram", sort=False):
            d = g["doc_id"].to_numpy(np.int64)
            if len(d) > CONTAIN_MAX_DF:
                continue
            a = np.repeat(d, len(d))
            b = np.tile(d, len(d))
            outa.append(a)
            outb.append(b)
            outn.append(np.ones(len(a), np.int64))
        if not outa:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        out = pd.DataFrame({"id_a": np.concatenate(outa),
                            "id_b": np.concatenate(outb),
                            "n": np.concatenate(outn)})
        return (out.groupby(["id_a", "id_b"], sort=False)["n"]
                .sum().astype("int64").reset_index())

    partials = bucket_exchange(
        docs.map_batches(grams, batch_format="pandas"),
        ["ngram"], pair_partials, num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = (df.groupby(["id_a", "id_b"], sort=False)["n"]
               .sum().reset_index())
        size = (tot[tot["id_a"] == tot["id_b"]]
                .set_index("id_a")["n"])
        out = tot[tot["id_a"] != tot["id_b"]].copy()
        out["size_a"] = out["id_a"].map(size).astype("int64")
        out = out[5 * out["n"] >= 4 * out["size_a"]]
        out = out.rename(columns={"n": "shared"})
        return out[["id_a", "id_b", "shared", "size_a"]].astype("int64")

    return bucket_exchange(partials, ["id_a"], finish, num_buckets=8)


SQL_CONTAINMENT_PAIRS_DOCS = f"""
WITH t AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w
  FROM documents
), g AS (
  SELECT doc_id, unnest(
           CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
           END) AS ngram
  FROM t
), rare AS (
  SELECT ngram FROM g GROUP BY 1 HAVING COUNT(*) <= {CONTAIN_MAX_DF}
), gr AS (
  SELECT g.doc_id, g.ngram FROM g JOIN rare USING (ngram)
), sz AS (
  SELECT doc_id, COUNT(*) AS size_a FROM gr GROUP BY 1
), sh AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
  FROM gr a JOIN gr b USING (ngram)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
       CAST(size_a AS BIGINT) AS size_a
FROM sh JOIN sz ON sz.doc_id = sh.id_a
WHERE 5 * shared >= 4 * size_a
"""


def q_calibration_bins_docs(sf_dir: str):
    """Reliability-diagram bins for the deterministic integer scorer
    (2·count('e') + count(' ')) against the lang='en' label: fixed
    width-64 score bins, per bin n / positives / score sum — all exact
    BIGINTs (the plot's x̄ and ŷ are ratios of these; shipping sums
    avoids cross-engine float division entirely). Map-side partial
    combine, one tiny grouped exchange."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text", "lang"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(t["text"].is_valid()),
        batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.add(
            pc.multiply(pc.count_substring(t["text"], "e"),
                        pa.scalar(2, pa.int32())),
            pc.count_substring(t["text"], " ")), pa.int64())
        pos = pc.cast(pc.equal(pc.coalesce(t["lang"], pa.scalar("")),
                               "en"), pa.int64())
        return pa.table({
            "bin": pc.divide(s, pa.scalar(64, pa.int64())),
            "n": pa.array(np.ones(len(s), np.int64)),
            "pos": pos,
            "score_sum": s})

    return grouped_agg(
        docs.map_batches(score, batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum"), "pos": ("pos", "sum"),
                  "score_sum": ("score_sum", "sum")},
        num_buckets=4)


SQL_CALIBRATION_BINS_DOCS = """
WITH d AS (
  SELECT (2 * (length(text) - length(replace(text, 'e', '')))
          + (length(text) - length(replace(text, ' ', '')))) AS score,
         CASE WHEN COALESCE(lang, '') = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents WHERE text IS NOT NULL
)
SELECT CAST(score // 64 AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(pos) AS BIGINT) AS pos,
       CAST(SUM(score) AS BIGINT) AS score_sum
FROM d GROUP BY 1
"""


def q_meta_key_census_pages(sf_dir: str):
    """Schema-on-read KEY CENSUS over the pages meta JSON: how many
    pages carry each top-level key — the discovery pass that sizes a
    flatten plan / detects schema drift in semi-structured feeds
    before committing to a projection. Map-side json.loads + partial
    counts; one key-cardinality exchange."""
    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    pages = _rd().read_parquet(pages_dir, columns=["meta"],
                               override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        keys = []
        for meta in df["meta"]:
            if not meta:
                continue
            keys.extend(_json.loads(meta).keys())
        out = (pd.DataFrame({"meta_key": pd.Series(keys, dtype=object)})
               .groupby("meta_key", sort=False).size()
               .rename("n_pages").reset_index())
        out["n_pages"] = out["n_pages"].astype("int64")
        return out

    return grouped_agg(pages.map_batches(partial, batch_format="pandas"),
                       ["meta_key"], {"n_pages": ("n_pages", "sum")},
                       num_buckets=2)


SQL_META_KEY_CENSUS_PAGES = f"""
SELECT meta_key, CAST(COUNT(*) AS BIGINT) AS n_pages
FROM (
  SELECT unnest(json_keys(meta)) AS meta_key
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
)
GROUP BY 1
"""


WAV_QUIET_THRESHOLD = 250_000


def q_silence_runs_audio(sf_dir: str):
    """Silence-run SEGMENTATION over decoded WAV audio — the
    voice-activity front-end that splits a recording into speech/quiet
    spans: per 256-sample window, quiet = Σ|pcm| < threshold; per clip
    emit window count, quiet count, number of maximal quiet runs and
    the longest run (gaps-and-islands over the window index). The
    decode runs in the actor-pool codec stage; runs are computed
    in-clip (windows of one clip never split across batches), so zero
    shuffle. Oracle regenerates the waveform from the fixture's closed
    form and replays the islands with win − ROW_NUMBER()."""
    media_dir = _wav_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/wavs.parquet")

    class SilenceStage:
        def __init__(self):
            from ..stages.multimodal import parse_wav, sniff_wav

            self._parse = parse_wav
            self._sniff = sniff_wav

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for i, payload in zip(df["id"].to_numpy(np.int64),
                                  df["payload"]):
                raw = bytes(payload)
                if not self._sniff(raw):
                    continue
                samples, _rate, _ch = self._parse(raw)
                a = np.abs(samples.astype(np.int64))
                nw = len(a) // WAV_WINDOW
                sums = a[: nw * WAV_WINDOW].reshape(nw, WAV_WINDOW).sum(1)
                q = sums < WAV_QUIET_THRESHOLD
                runs = []
                cur = 0
                for flag in q:
                    if flag:
                        cur += 1
                    elif cur:
                        runs.append(cur)
                        cur = 0
                if cur:
                    runs.append(cur)
                rows.append((i, nw, int(q.sum()), len(runs),
                             max(runs) if runs else 0))
            return pd.DataFrame(
                rows, columns=["id", "n_windows", "n_quiet", "n_runs",
                               "max_run"]).astype("int64")

    return ds.map_batches(SilenceStage, concurrency=2, batch_size=32,
                          batch_format="pandas")


SQL_SILENCE_RUNS_AUDIO = f"""
WITH s AS (
  SELECT id, CAST(t.i AS BIGINT) AS i,
         (13 * id + 5 * t.i) % 4001 - 2000 AS v
  FROM read_parquet('{WAV_CURRENT}/wavs.parquet'),
       unnest(range({WAV_N_SAMPLES})) t(i)
), w AS (
  SELECT id, i // {WAV_WINDOW} AS win,
         CASE WHEN SUM(ABS(v)) < {WAV_QUIET_THRESHOLD}
              THEN 1 ELSE 0 END AS q
  FROM s GROUP BY 1, 2
), isl AS (
  SELECT id, q,
         win - ROW_NUMBER() OVER (PARTITION BY id, q ORDER BY win)
           AS grp
  FROM w
), runs AS (
  SELECT id, COUNT(*) AS run_len
  FROM isl WHERE q = 1 GROUP BY id, grp
), per AS (
  SELECT id, COUNT(*) AS n_windows, CAST(SUM(q) AS BIGINT) AS n_quiet
  FROM w GROUP BY 1
)
SELECT per.id, CAST(per.n_windows AS BIGINT) AS n_windows, per.n_quiet,
       CAST(COALESCE(COUNT(runs.run_len), 0) AS BIGINT) AS n_runs,
       CAST(COALESCE(MAX(runs.run_len), 0) AS BIGINT) AS max_run
FROM per LEFT JOIN runs ON runs.id = per.id
GROUP BY 1, 2, 3
"""


def q_ahash_groups_images(sf_dir: str):
    """Perceptual near-dup IMAGE grouping via average-hash: decode
    (real BMP/PPM codec paths), pool to the 4×4 integer thumbnail,
    then bit k = (16·cell_k ≥ Σcells) — the rational form of
    "cell above thumbnail mean", no float division — packed into a
    16-bit aHash; images sharing a hash are perceptual-duplicate
    candidates. Per-image work is local to the codec actor; only the
    (hash, 1) partials shuffle. Oracle replays pixels from the
    fixture's closed form and packs bits with << in SQL."""
    from ..functions.relational import grouped_agg

    media_dir = _image_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/images.parquet")

    class AHashStage:
        def __init__(self):
            from ..stages.multimodal import (decode_bmp, decode_ppm,
                                             sniff_image)

            self._decoders = {"bmp": decode_bmp, "ppm": decode_ppm}
            self._sniff = sniff_image

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hashes = []
            for payload in df["payload"]:
                raw = bytes(payload)
                gray = self._decoders[self._sniff(raw)](raw).astype(
                    np.int64)
                h, w = gray.shape
                cells = (gray.reshape(h // 8, 8, w // 8, 8)
                         .sum(axis=(1, 3)) // 64).ravel()
                total = int(cells.sum())
                bits = 16 * cells >= total
                hashes.append(int((bits << np.arange(16)).sum()))
            return pd.DataFrame({
                "ahash": pd.Series(hashes, dtype="int64"),
                "n_images": np.ones(len(hashes), np.int64)})

    sigs = ds.map_batches(AHashStage, concurrency=2, batch_size=32,
                          batch_format="pandas")
    return grouped_agg(sigs, ["ahash"],
                       {"n_images": ("n_images", "sum")}, num_buckets=2)


SQL_AHASH_GROUPS_IMAGES = f"""
WITH px AS (
  SELECT id, CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
         (7 * id + 3 * t1.y + t2.x) % 256 AS g
  FROM read_parquet('{IMG_CURRENT}/images.parquet'),
       unnest(range({IMG_HW})) t1(y), unnest(range({IMG_HW})) t2(x)
), cells AS (
  SELECT id, (y // 8) * 4 + (x // 8) AS k, SUM(g) // 64 AS m
  FROM px GROUP BY 1, 2
), tot AS (
  SELECT id, SUM(m) AS total FROM cells GROUP BY 1
), sig AS (
  SELECT c.id,
         SUM(CASE WHEN 16 * c.m >= t.total
             THEN CAST(1 AS BIGINT) << c.k ELSE 0 END) AS ahash
  FROM cells c JOIN tot t ON t.id = c.id
  GROUP BY c.id
)
SELECT CAST(ahash AS BIGINT) AS ahash,
       CAST(COUNT(*) AS BIGINT) AS n_images
FROM sig GROUP BY 1
"""


MLM_MAX_SLOTS = 64


def q_mlm_mask_plan_docs(sf_dir: str):
    """BERT-style MLM MASK PLAN, deterministic and SQL-replayable: for
    each of a doc's first 64 token slots, slot j is selected iff
    md5(doc_id|j) % 100 < 15; a selected slot becomes [MASK] when
    md5(doc_id|j|a) % 10 < 8, a random token on 8, kept on 9 — the
    standard 15% / 80-10-10 recipe with the md5-prefix BIGINT as the
    randomness source, so the exact plan (not a distributional claim)
    hash-matches the oracle. Map-only, zero shuffle; the slot cap
    bounds per-doc hashing work."""
    import hashlib

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def _h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            n_tok = len((text or "").split(" "))
            slots = min(n_tok, MLM_MAX_SLOTS)
            n_sel = n_mask = n_rand = n_keep = 0
            for j in range(1, slots + 1):
                if _h(f"{i}|{j}") % 100 < 15:
                    n_sel += 1
                    a = _h(f"{i}|{j}|a") % 10
                    if a < 8:
                        n_mask += 1
                    elif a == 8:
                        n_rand += 1
                    else:
                        n_keep += 1
            rows.append((i, n_tok, slots, n_sel, n_mask, n_rand, n_keep))
        return pd.DataFrame(
            rows, columns=["doc_id", "n_tokens", "n_slots", "n_selected",
                           "n_mask", "n_random", "n_keep"]).astype("int64")

    return docs.map_batches(plan, batch_format="pandas")


SQL_MLM_MASK_PLAN_DOCS = f"""
WITH d AS (
  SELECT doc_id, len(string_split(COALESCE(text, ''), ' ')) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         LEAST(n_tokens, {MLM_MAX_SLOTS}) AS n_slots,
         CAST(t.j AS BIGINT) AS j
  FROM d, unnest(range(1, LEAST(n_tokens, {MLM_MAX_SLOTS}) + 1)) t(j)
), m AS (
  SELECT doc_id, n_tokens, n_slots,
         CASE WHEN CAST(CONCAT('0x', substring(
                md5(doc_id || '|' || j), 1, 8)) AS BIGINT) % 100 < 15
              THEN CAST(CONCAT('0x', substring(
                md5(doc_id || '|' || j || '|a'), 1, 8)) AS BIGINT) % 10
              ELSE NULL END AS act
  FROM s
)
SELECT doc_id,
       CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MAX(n_slots) AS BIGINT) AS n_slots,
       CAST(COUNT(act) AS BIGINT) AS n_selected,
       CAST(COALESCE(SUM(CASE WHEN act < 8 THEN 1 END), 0) AS BIGINT)
         AS n_mask,
       CAST(COALESCE(SUM(CASE WHEN act = 8 THEN 1 END), 0) AS BIGINT)
         AS n_random,
       CAST(COALESCE(SUM(CASE WHEN act = 9 THEN 1 END), 0) AS BIGINT)
         AS n_keep
FROM m GROUP BY 1
"""


def q_readability_docs(sf_dir: str):
    """Corpus READABILITY sufficient statistics per language — the
    integer inputs every Flesch-style score is a ratio of: docs, words,
    sentence-ish splits ([.!?]+ runs, RE2-safe so DuckDB
    regexp_extract_all counts identically), vowel-group count (the
    classic syllable proxy) and codepoints. Shipping the SUMS keeps it
    division-free/exact; map-side partials, one lang-cardinality
    exchange."""
    import re

    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text", "lang"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["text"].is_valid(),
                                   t["lang"].is_valid())),
        batch_format="pyarrow")

    sent_re = re.compile(r"[.!?]+")
    vowel_re = re.compile(r"[aeiou]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        out = pd.DataFrame({
            "lang": df["lang"],
            "n_docs": np.ones(len(df), np.int64),
            "words": (texts.str.count(" ") + 1).astype("int64"),
            "sentences": texts.map(
                lambda t: len(sent_re.findall(t))).astype("int64"),
            "vowel_groups": texts.map(
                lambda t: len(vowel_re.findall(t))).astype("int64"),
            "chars": texts.str.len().astype("int64")})
        return (out.groupby("lang", sort=False).sum(numeric_only=True)
                .reset_index())

    return grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang"], {"n_docs": ("n_docs", "sum"), "words": ("words", "sum"),
                   "sentences": ("sentences", "sum"),
                   "vowel_groups": ("vowel_groups", "sum"),
                   "chars": ("chars", "sum")}, num_buckets=2)


SQL_READABILITY_DOCS = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
         AS BIGINT) AS words,
       CAST(SUM(len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
         AS sentences,
       CAST(SUM(len(regexp_extract_all(text, '[aeiou]+'))) AS BIGINT)
         AS vowel_groups,
       CAST(SUM(length(text)) AS BIGINT) AS chars
FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
GROUP BY 1
"""


def q_auc_scorer_docs(sf_dir: str):
    """EXACT ROC-AUC of the deterministic quality scorer against the
    lang='en' label, as the integer 2U (ties count once): 2U =
    Σ_scores pos_v · (2·negatives_below + neg_v); AUC = 2U / (2·P·N)
    is the consumer's division. Per-score (pos, neg) counts combine
    distributed; the rank sweep runs on the score-cardinality frame —
    the same shared-scan shape as the PR curve, no global sort of raw
    rows."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text", "lang"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(t["text"].is_valid()),
        batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.add(
            pc.multiply(pc.count_substring(t["text"], "e"),
                        pa.scalar(2, pa.int32())),
            pc.count_substring(t["text"], " ")), pa.int64())
        pos = pc.cast(pc.equal(pc.coalesce(t["lang"], pa.scalar("")),
                               "en"), pa.int64())
        return pa.table({"score": s, "pos": pos,
                         "neg": pc.subtract(pa.scalar(1, pa.int64()),
                                            pos)})

    counts = grouped_agg(
        docs.map_batches(score, batch_format="pyarrow"),
        ["score"], {"pos": ("pos", "sum"), "neg": ("neg", "sum")},
        num_buckets=4).to_pandas().sort_values("score")
    p = counts["pos"].to_numpy(np.int64)
    n = counts["neg"].to_numpy(np.int64)
    below = np.concatenate(([0], np.cumsum(n)[:-1]))
    u2 = int((p * (2 * below + n)).sum())
    return pd.DataFrame({"u2": [np.int64(u2)],
                         "n_pos": [np.int64(p.sum())],
                         "n_neg": [np.int64(n.sum())]})


SQL_AUC_SCORER_DOCS = """
WITH d AS (
  SELECT (2 * (length(text) - length(replace(text, 'e', '')))
          + (length(text) - length(replace(text, ' ', '')))) AS score,
         CASE WHEN COALESCE(lang, '') = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT score, SUM(pos) AS p, SUM(1 - pos) AS n FROM d GROUP BY 1
), sweep AS (
  SELECT p, n,
         COALESCE(SUM(n) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below
  FROM g
)
SELECT CAST(SUM(p * (2 * below + n)) AS BIGINT) AS u2,
       CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(n) AS BIGINT) AS n_neg
FROM sweep
"""


def q_media_type_census(sf_dir: str):
    """File-TYPE census over an opaque binary media column: sniff each
    payload's magic bytes (the engine reads real container headers via
    stages/multimodal.sniff_image) and roll up count + byte volume per
    container kind — the triage pass before routing payloads to
    per-format decode pools. The oracle replays the fixture's
    id-parity closed form (even=BMP, odd=PPM) and sums
    octet_length."""
    from ..functions.relational import grouped_agg

    media_dir = _image_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/images.parquet")

    class SniffStage:
        def __init__(self):
            from ..stages.multimodal import sniff_image

            self._sniff = sniff_image

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            kinds, sizes = [], []
            for payload in df["payload"]:
                raw = bytes(payload)
                kinds.append(self._sniff(raw))
                sizes.append(len(raw))
            return pd.DataFrame({
                "kind": pd.Series(kinds, dtype=object),
                "n": np.ones(len(kinds), np.int64),
                "total_bytes": np.asarray(sizes, np.int64)})

    return grouped_agg(
        ds.map_batches(SniffStage, concurrency=2, batch_size=32,
                       batch_format="pandas"),
        ["kind"], {"n": ("n", "sum"),
                   "total_bytes": ("total_bytes", "sum")}, num_buckets=2)


SQL_MEDIA_TYPE_CENSUS = f"""
SELECT CASE WHEN id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS kind,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes
FROM read_parquet('{IMG_CURRENT}/images.parquet')
GROUP BY 1
"""


def q_nofollow_share_domains(sf_dir: str):
    """Per-source-domain link-policy profile: total outlinks vs
    rel=nofollow outlinks from the page meta — what a crawler uses to
    budget frontier expansion per host (nofollow-heavy domains yield
    few crawlable edges). Map-side JSON explode to per-domain partials;
    one domain-cardinality exchange."""
    import json as _json

    from ..functions.relational import grouped_agg

    pages_dir = _pages_fixture(sf_dir)
    pages = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                               override_num_blocks=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        doms, nofollow = [], []
        for url, meta in zip(df["url"], df["meta"]):
            if not meta:
                continue
            dom = url.split("//", 1)[1].split("/", 1)[0]
            for lk in _json.loads(meta).get("links") or []:
                doms.append(dom)
                nofollow.append(1 if lk.get("rel") == "nofollow" else 0)
        out = pd.DataFrame({
            "src_domain": pd.Series(doms, dtype=object),
            "n_links": np.ones(len(doms), np.int64),
            "n_nofollow": np.asarray(nofollow, np.int64)})
        return (out.groupby("src_domain", sort=False).sum(
            numeric_only=True).reset_index())

    return grouped_agg(
        pages.map_batches(partial, batch_format="pandas"),
        ["src_domain"], {"n_links": ("n_links", "sum"),
                         "n_nofollow": ("n_nofollow", "sum")},
        num_buckets=2)


SQL_NOFOLLOW_SHARE_DOMAINS = f"""
WITH l AS (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS src_domain,
         json_extract_string(
           unnest(CAST(json_extract(meta, '$.links') AS JSON[])),
           '$.rel') AS rel
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
)
SELECT src_domain, CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(SUM(CASE WHEN rel = 'nofollow' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_nofollow
FROM l GROUP BY 1
"""


def q_reject_reasons_docs(sf_dir: str):
    """Quality-gate AUDIT census: every Gopher-style rule failure per
    doc packed into a reasons BITMASK (bit0 too-short, bit1 too-long,
    bit2 long-words, bit3 few-stopwords, bit4 repetitive), rolled up
    to docs per mask — the table a curation run publishes to explain
    WHAT it dropped and why. Every rule is a cross-multiplied integer
    compare (10·letters > 46·words; 100·dup_mass > 8·bigrams), so no
    float ratio ever crosses engines. Map-side bitmask + partial
    counts; one mask-cardinality exchange."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text"],
                      num_blocks=8)

    STOP = {"the", "a", "and", "of", "to"}

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        masks = []
        for text in df["text"]:
            w = (text or "").split(" ")
            n = len(w)
            letters = len(text or "") - (n - 1)
            n_stop = len(STOP.intersection(w))
            cnt = {}
            for j in range(n - 1):
                b = w[j] + " " + w[j + 1]
                cnt[b] = cnt.get(b, 0) + 1
            total_bg = max(n - 1, 0)
            dup_mass = sum(c for c in cnt.values() if c >= 2)
            m = 0
            if n < 30:
                m |= 1
            if n > 90:
                m |= 2
            if 10 * letters > 46 * n:
                m |= 4
            if n_stop < 2:
                m |= 8
            if 100 * dup_mass > 8 * total_bg:
                m |= 16
            masks.append(m)
        return pd.DataFrame({
            "reason_mask": pd.Series(masks, dtype="int64"),
            "n_docs": np.ones(len(masks), np.int64)})

    return grouped_agg(docs.map_batches(mask, batch_format="pandas"),
                       ["reason_mask"], {"n_docs": ("n_docs", "sum")},
                       num_buckets=2)


SQL_REJECT_REASONS_DOCS = """
WITH t AS (
  SELECT string_split(COALESCE(text, ''), ' ') AS w FROM documents
), base AS (
  SELECT ROW_NUMBER() OVER () AS rid,
         len(w) AS n,
         length(array_to_string(w, ' ')) - (len(w) - 1) AS letters,
         len(list_distinct(list_filter(
           w, x -> x IN ('the', 'a', 'and', 'of', 'to')))) AS n_stop,
         w
  FROM t
), bg AS (
  SELECT rid, w[i] || ' ' || w[i + 1] AS b
  FROM base, unnest(range(1, len(w))) AS u(i)
), rep AS (
  SELECT rid, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_mass,
         SUM(c) AS total_bg
  FROM (SELECT rid, b, COUNT(*) AS c FROM bg GROUP BY 1, 2)
  GROUP BY 1
), m AS (
  SELECT CASE WHEN n < 30 THEN 1 ELSE 0 END
       + CASE WHEN n > 90 THEN 2 ELSE 0 END
       + CASE WHEN 10 * letters > 46 * n THEN 4 ELSE 0 END
       + CASE WHEN n_stop < 2 THEN 8 ELSE 0 END
       + CASE WHEN 100 * COALESCE(rep.dup_mass, 0)
               > 8 * COALESCE(rep.total_bg, 0) THEN 16 ELSE 0 END
         AS reason_mask
  FROM base LEFT JOIN rep ON rep.rid = base.rid
)
SELECT CAST(reason_mask AS BIGINT) AS reason_mask,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM m GROUP BY 1
"""


def q_posting_gap_bits(sf_dir: str):
    """Inverted-index STORAGE planning: per term (df ≥ 2), the posting
    count and the exact delta-encoded bit budget Σ bit_length(gap)
    over consecutive sorted doc_ids (first gap = doc_id+1, so every
    gap ≥ 1) — the number an Elias-γ/VByte sizing model starts from.
    bit_length via the np.frexp exponent == DuckDB
    length(printf('%b', g)) (never floor(log2) — off-by-one at exact
    powers of two). One term-routed exchange of (term, doc_id) pairs;
    gaps are computed per term inside the bucket."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, terms = [], []
        for i, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            for t in set((text or "").split(" ")):
                ids.append(i)
                terms.append(t)
        return pd.DataFrame({"term": pd.Series(terms, dtype=object),
                             "doc_id": np.asarray(ids, np.int64)})

    def per_term(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for term, g in df.groupby("term", sort=False):
            d = np.sort(g["doc_id"].to_numpy(np.int64))
            if len(d) < 2:
                continue
            gaps = np.concatenate(([d[0] + 1], np.diff(d)))
            bits = np.frexp(gaps.astype(np.float64))[1].astype(np.int64)
            rows.append((term, len(d), int(bits.sum())))
        return pd.DataFrame(
            rows, columns=["term", "n_postings", "gap_bits"]).astype(
            {"n_postings": "int64", "gap_bits": "int64"})

    return bucket_exchange(
        docs.map_batches(explode, batch_format="pandas"),
        ["term"], per_term, num_buckets=8)


SQL_POSTING_GAP_BITS = """
WITH g AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(COALESCE(text, ''), ' ')) AS term
  FROM documents
), f AS (
  SELECT term, doc_id,
         COALESCE(doc_id - LAG(doc_id) OVER (PARTITION BY term
                                             ORDER BY doc_id),
                  doc_id + 1) AS gap,
         COUNT(*) OVER (PARTITION BY term) AS df
  FROM g
)
SELECT term, CAST(df AS BIGINT) AS n_postings,
       CAST(SUM(length(printf('%b', gap))) AS BIGINT) AS gap_bits
FROM f WHERE df >= 2
GROUP BY term, df
"""


def q_hourweek_heatmap_events(sf_dir: str):
    """The 168-cell HOUR-OF-WEEK activity heatmap (ISO dow × UTC hour):
    event count and exact cent volume per cell — the seasonality
    surface capacity planning and anomaly baselines read. Map-side
    partials bounded at 168 rows per batch; one tiny exchange. pandas
    dayofweek+1 == DuckDB isodow (both ISO); FLOOR(value·100) is the
    documented non-fixed-decimal integerization."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["ts", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["value"].is_valid()),
        batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[ns]")
        out = pd.DataFrame({
            "dow": (ts.dt.dayofweek + 1).astype("int64"),
            "hour": ts.dt.hour.astype("int64"),
            "n": np.ones(len(df), np.int64),
            "cents": np.floor(
                df["value"].to_numpy(np.float64) * 100).astype(np.int64)})
        return (out.groupby(["dow", "hour"], sort=False)
                .sum(numeric_only=True).reset_index())

    return grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                       ["dow", "hour"],
                       {"n": ("n", "sum"), "cents": ("cents", "sum")},
                       num_buckets=2)


SQL_HOURWEEK_HEATMAP_EVENTS = """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2
"""


def q_char_class_langs(sf_dir: str):
    """Character-CLASS composition per language — letters, digits,
    spaces, punctuation-ish remainder as exact counts (the corpus-QC
    fingerprint that flags OCR noise, boilerplate markup, or
    mis-tagged languages). Vectorized str.count with RE2-safe classes
    (identical counting in DuckDB regexp_extract_all); remainder by
    subtraction. Map-side partials; one lang-cardinality exchange."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text", "lang"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["text"].is_valid(),
                                   t["lang"].is_valid())),
        batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        total = texts.str.len().astype("int64")
        letters = texts.str.count(r"[a-zA-Z]").astype("int64")
        digits = texts.str.count(r"[0-9]").astype("int64")
        spaces = texts.str.count(" ").astype("int64")
        out = pd.DataFrame({
            "lang": df["lang"],
            "n_docs": np.ones(len(df), np.int64),
            "letters": letters,
            "digits": digits,
            "spaces": spaces,
            "other": total - letters - digits - spaces})
        return (out.groupby("lang", sort=False).sum(numeric_only=True)
                .reset_index())

    return grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang"], {"n_docs": ("n_docs", "sum"),
                   "letters": ("letters", "sum"),
                   "digits": ("digits", "sum"),
                   "spaces": ("spaces", "sum"),
                   "other": ("other", "sum")}, num_buckets=2)


SQL_CHAR_CLASS_LANGS = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]'))) AS BIGINT)
         AS letters,
       CAST(SUM(len(regexp_extract_all(text, '[0-9]'))) AS BIGINT)
         AS digits,
       CAST(SUM(length(text) - length(replace(text, ' ', ''))) AS BIGINT)
         AS spaces,
       CAST(SUM(length(text)
                - len(regexp_extract_all(text, '[a-zA-Z]'))
                - len(regexp_extract_all(text, '[0-9]'))
                - (length(text) - length(replace(text, ' ', ''))))
         AS BIGINT) AS other
FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
GROUP BY 1
"""


def q_gate_parity_langs(sf_dir: str):
    """Curation-FAIRNESS audit: the Gopher-style keep decision broken
    down per language — docs seen vs docs kept, as exact counts (the
    keep-RATE gap across languages is the consumer's division). The
    gate reuses the exact integer-compare rules of
    reject_reasons_docs, so a doc is kept iff its reason mask is 0.
    Map-side partials; one lang-cardinality exchange."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["text", "lang"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["text"].is_valid(),
                                   t["lang"].is_valid())),
        batch_format="pyarrow")

    STOP = {"the", "a", "and", "of", "to"}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keeps = []
        for text in df["text"]:
            w = text.split(" ")
            n = len(w)
            letters = len(text) - (n - 1)
            cnt = {}
            for j in range(n - 1):
                b = w[j] + " " + w[j + 1]
                cnt[b] = cnt.get(b, 0) + 1
            dup_mass = sum(c for c in cnt.values() if c >= 2)
            keep = (30 <= n <= 90
                    and 10 * letters <= 46 * n
                    and len(STOP.intersection(w)) >= 2
                    and 100 * dup_mass <= 8 * max(n - 1, 0))
            keeps.append(1 if keep else 0)
        out = pd.DataFrame({
            "lang": df["lang"],
            "n_docs": np.ones(len(df), np.int64),
            "n_keep": np.asarray(keeps, np.int64)})
        return (out.groupby("lang", sort=False).sum(numeric_only=True)
                .reset_index())

    return grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang"], {"n_docs": ("n_docs", "sum"),
                   "n_keep": ("n_keep", "sum")}, num_buckets=2)


SQL_GATE_PARITY_LANGS = """
WITH t AS (
  SELECT lang, string_split(text, ' ') AS w,
         ROW_NUMBER() OVER () AS rid
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
), base AS (
  SELECT rid, lang, len(w) AS n,
         length(array_to_string(w, ' ')) - (len(w) - 1) AS letters,
         len(list_distinct(list_filter(
           w, x -> x IN ('the', 'a', 'and', 'of', 'to')))) AS n_stop,
         w
  FROM t
), rep AS (
  SELECT rid, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_mass,
         SUM(c) AS total_bg
  FROM (SELECT rid, w[i] || ' ' || w[i + 1] AS b, COUNT(*) AS c
        FROM base, unnest(range(1, len(w))) AS u(i)
        GROUP BY 1, 2)
  GROUP BY 1
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n >= 30 AND n <= 90
                  AND 10 * letters <= 46 * n
                  AND n_stop >= 2
                  AND 100 * COALESCE(rep.dup_mass, 0)
                      <= 8 * COALESCE(rep.total_bg, 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM base LEFT JOIN rep ON rep.rid = base.rid
GROUP BY 1
"""


def q_pre_post_types(sf_dir: str):
    """Interrupted-time-series SUFFICIENT STATS per event type: the
    observation window splits at its own midpoint day ((min+max)//2,
    integer floor — both engines derive it from the data, no wall
    clock), and each phase ships exact n / cent-sum (the pre-vs-post
    lift estimate is the consumer's division). The min/max scan is a
    cheap first pass; phase tagging is map-side; one (type×2)-row
    exchange."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["value"].is_valid(),
                                   t["event_type"].is_valid())),
        batch_format="pyarrow").materialize()

    def days(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].astype("datetime64[ns]")
             .to_numpy("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"lo": [int(d.min())], "hi": [int(d.max())]})

    mm = ev.map_batches(days, batch_format="pandas").to_pandas()
    mid = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].astype("datetime64[ns]")
             .to_numpy("datetime64[D]").astype(np.int64))
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "phase": np.where(d <= mid, "pre", "post"),
            "n": np.ones(len(df), np.int64),
            "cents": np.floor(
                df["value"].to_numpy(np.float64) * 100).astype(np.int64)})
        return (out.groupby(["event_type", "phase"], sort=False)
                .sum(numeric_only=True).reset_index())

    return grouped_agg(ev.map_batches(partial, batch_format="pandas"),
                       ["event_type", "phase"],
                       {"n": ("n", "sum"), "cents": ("cents", "sum")},
                       num_buckets=2)


SQL_PRE_POST_TYPES = """
WITH d AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), b AS (
  SELECT (MIN(day_id) + MAX(day_id)) // 2 AS mid FROM d
)
SELECT event_type,
       CASE WHEN day_id <= b.mid THEN 'pre' ELSE 'post' END AS phase,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM d, b GROUP BY 1, 2
"""


def q_duplicate_titles_pages(sf_dir: str):
    """Cross-domain DUPLICATE-TITLE detection — the cheap cousin of
    content mirror detection a crawler runs first: titles (from the
    meta JSON) served by ≥ 2 distinct domains, with distinct-url and
    distinct-domain counts. Map-side (title, url, domain) triples
    dedup per batch; one title-routed exchange computes global
    distincts."""
    import json as _json

    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    pages = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                               override_num_blocks=16)

    def triples(df: pd.DataFrame) -> pd.DataFrame:
        titles, urls, doms = [], [], []
        for url, meta in zip(df["url"], df["meta"]):
            if not meta:
                continue
            title = _json.loads(meta).get("title")
            if not title:
                continue
            titles.append(title)
            urls.append(url)
            doms.append(url.split("//", 1)[1].split("/", 1)[0])
        return pd.DataFrame({
            "title": pd.Series(titles, dtype=object),
            "url": pd.Series(urls, dtype=object),
            "dom": pd.Series(doms, dtype=object)}).drop_duplicates()

    def per_title(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("title", sort=False).agg(
            n_urls=("url", "nunique"), n_domains=("dom", "nunique"))
        g = g[g["n_domains"] >= 2].reset_index()
        return g.astype({"n_urls": "int64", "n_domains": "int64"})

    out = bucket_exchange(
        pages.map_batches(triples, batch_format="pandas"),
        ["title"], per_title, num_buckets=8).to_pandas()
    if "title" not in out.columns:
        # provably-empty result (no cross-domain titles at this scale):
        # a zero-row Dataset loses its columns through to_pandas()
        out = pd.DataFrame({"title": pd.Series([], dtype=object),
                            "n_urls": pd.Series([], dtype="int64"),
                            "n_domains": pd.Series([], dtype="int64")})
    return out


SQL_DUPLICATE_TITLES_PAGES = f"""
WITH t AS (
  SELECT DISTINCT json_extract_string(meta, '$.title') AS title, url,
         split_part(split_part(url, '//', 2), '/', 1) AS dom
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
)
SELECT title, CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT dom) AS BIGINT) AS n_domains
FROM t WHERE title IS NOT NULL
GROUP BY 1 HAVING COUNT(DISTINCT dom) >= 2
"""


def q_session_entry_exit(sf_dir: str):
    """Session ENTRY→EXIT type matrix: for every session (standard
    1800 s gap rule over typed events, (ts, event_id) order), the
    first and last event type, counted per (entry, exit) pair — the
    landing/abandonment surface funnel analysis starts from. One
    user-routed exchange; sessions split vectorized in-kernel; only
    the |types|² partial matrix re-shuffles."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["event_type"].is_valid()),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "entry_type": pd.Series([], dtype=object),
                "exit_type": pd.Series([], dtype=object),
                "n_sessions": pd.Series([], dtype="int64")})
        d = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort")
        ts = d["ts"].astype("datetime64[ns]").to_numpy(np.int64)
        uid = d["user_id"].to_numpy(np.int64)
        new = np.ones(len(d), bool)
        if len(d) > 1:
            new[1:] = (uid[1:] != uid[:-1]) | (
                ts[1:] - ts[:-1] > SESSION_GAP_S * 1_000_000_000)
        sid = np.cumsum(new)
        types = d["event_type"].to_numpy(object)
        first_idx = np.flatnonzero(new)
        last_idx = np.concatenate((first_idx[1:] - 1, [len(d) - 1]))
        out = pd.DataFrame({
            "entry_type": types[first_idx],
            "exit_type": types[last_idx],
            "n_sessions": np.ones(len(first_idx), np.int64)})
        return (out.groupby(["entry_type", "exit_type"], sort=False)
                .sum(numeric_only=True).reset_index())

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=16)
    return grouped_agg(partials, ["entry_type", "exit_type"],
                       {"n_sessions": ("n_sessions", "sum")},
                       num_buckets=2)


SQL_SESSION_ENTRY_EXIT = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS s
  FROM flagged
), ranked AS (
  SELECT user_id, s, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, s
                            ORDER BY ts, event_id) AS ra,
         ROW_NUMBER() OVER (PARTITION BY user_id, s
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM numbered
), sess AS (
  SELECT user_id, s,
         MAX(CASE WHEN ra = 1 THEN event_type END) AS entry_type,
         MAX(CASE WHEN rd = 1 THEN event_type END) AS exit_type
  FROM ranked GROUP BY 1, 2
)
SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM sess GROUP BY 1, 2
"""


AMS_SALTS = 8


def q_ams_f2_events(sf_dir: str):
    """AMS second-moment (F2) SKETCH over the per-user event-count
    distribution, md5-derandomized so the sketch itself is
    SQL-replayable: for salt s, z_s = Σ_events sign(md5(s|user_id))
    (each event contributes its user's ±1 once — linearity means NO
    per-user pre-aggregation is needed), and z_s² estimates Σ_u c_u².
    The classic one-pass join-size/self-join estimator: map-side ±1
    partial sums per salt, one 8-row combine."""
    import hashlib

    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["user_id"],
                    num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        uids = df["user_id"].to_numpy(np.int64)
        uniq, inv = np.unique(uids, return_inverse=True)
        counts = np.bincount(inv).astype(np.int64)
        rows = []
        for s in range(AMS_SALTS):
            signs = np.array(
                [1 if int(hashlib.md5(f"{s}|{u}".encode())
                          .hexdigest()[:8], 16) % 2 == 0 else -1
                 for u in uniq], np.int64)
            rows.append((s, int((signs * counts).sum())))
        return pd.DataFrame(rows, columns=["salt", "z"]).astype("int64")

    sketch = grouped_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["salt"], {"z": ("z", "sum")}, num_buckets=2).to_pandas()
    sketch["z2"] = (sketch["z"] * sketch["z"]).astype("int64")
    return sketch[["salt", "z", "z2"]]


SQL_AMS_F2_EVENTS = f"""
WITH s AS (
  SELECT CAST(t.s AS BIGINT) AS salt, user_id
  FROM events, unnest(range({AMS_SALTS})) t(s)
), z AS (
  SELECT salt,
         SUM(CASE WHEN CAST(CONCAT('0x', substring(
               md5(salt || '|' || user_id), 1, 8)) AS BIGINT) % 2 = 0
             THEN 1 ELSE -1 END) AS z
  FROM s GROUP BY 1
)
SELECT salt, CAST(z AS BIGINT) AS z, CAST(z * z AS BIGINT) AS z2
FROM z
"""


def q_curriculum_phases_docs(sf_dir: str):
    """Length-CURRICULUM phase assignment: docs split into 4 phases at
    the EXACT n_chars quartiles (distributed histogram-refinement
    order statistics, DuckDB quantile_disc ceil(q·n)−1 convention —
    no global sort), then per-phase doc and char totals — the plan a
    short-to-long training curriculum consumes. Thresholds broadcast;
    phase tagging is map-side."""
    from ..functions.relational import exact_quantiles, grouped_agg

    docs = read_table(sf_dir, "documents", columns=["n_chars"],
                      num_blocks=8).materialize()
    q1, q2, q3 = exact_quantiles(docs, "n_chars", [0.25, 0.5, 0.75])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        phase = np.full(len(x), 3, np.int64)
        phase[x <= q3] = 2
        phase[x <= q2] = 1
        phase[x <= q1] = 0
        out = pd.DataFrame({"phase": phase,
                            "n_docs": np.ones(len(x), np.int64),
                            "total_chars": x})
        return (out.groupby("phase", sort=False).sum(numeric_only=True)
                .reset_index())

    return grouped_agg(docs.map_batches(tag, batch_format="pandas"),
                       ["phase"], {"n_docs": ("n_docs", "sum"),
                                   "total_chars": ("total_chars", "sum")},
                       num_buckets=2)


SQL_CURRICULUM_PHASES_DOCS = """
WITH q AS (
  SELECT quantile_disc(n_chars, 0.25) AS q1,
         quantile_disc(n_chars, 0.5) AS q2,
         quantile_disc(n_chars, 0.75) AS q3
  FROM documents
)
SELECT CAST(CASE WHEN n_chars <= q.q1 THEN 0
            WHEN n_chars <= q.q2 THEN 1
            WHEN n_chars <= q.q3 THEN 2
            ELSE 3 END AS BIGINT) AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents, q GROUP BY 1
"""


CONTRASTIVE_CHUNK = 100


def q_contrastive_pairs_docs(sf_dir: str):
    """Self-supervised (anchor, positive) PAIR MINING plan: each doc
    splits into fixed 100-char chunks and every consecutive chunk pair
    becomes a contrastive training pair, emitted as exact integer
    offsets (pair_id, a_start, b_start, b_end) — the mining pass a
    contrastive text-embedding run executes before batching. Pure
    positional arithmetic from n_chars (map-only explode, zero
    shuffle); zipped-unnest oracle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"],
                      num_blocks=8)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        n = df["n_chars"].to_numpy(np.int64)
        n_chunks = -(-n // CONTRASTIVE_CHUNK)
        n_pairs = np.maximum(n_chunks - 1, 0)
        rep_ids = np.repeat(ids, n_pairs)
        rep_n = np.repeat(n, n_pairs)
        pair = np.concatenate(
            [np.arange(k, dtype=np.int64) for k in n_pairs]) \
            if len(n_pairs) else np.array([], np.int64)
        a_start = pair * CONTRASTIVE_CHUNK
        b_start = a_start + CONTRASTIVE_CHUNK
        b_end = np.minimum(b_start + CONTRASTIVE_CHUNK, rep_n)
        return pd.DataFrame({
            "doc_id": rep_ids, "pair_id": pair, "a_start": a_start,
            "b_start": b_start, "b_end": b_end}).astype("int64")

    return docs.map_batches(explode, batch_format="pandas")


SQL_CONTRASTIVE_PAIRS_DOCS = f"""
WITH d AS (
  SELECT doc_id, n_chars,
         CAST((n_chars + {CONTRASTIVE_CHUNK} - 1)
              // {CONTRASTIVE_CHUNK} AS BIGINT) AS n_chunks
  FROM documents
)
SELECT doc_id, CAST(u.p AS BIGINT) AS pair_id,
       CAST(u.p * {CONTRASTIVE_CHUNK} AS BIGINT) AS a_start,
       CAST((u.p + 1) * {CONTRASTIVE_CHUNK} AS BIGINT) AS b_start,
       CAST(LEAST((u.p + 2) * {CONTRASTIVE_CHUNK}, n_chars) AS BIGINT)
         AS b_end
FROM d, unnest(range(GREATEST(n_chunks - 1, 0))) AS u(p)
"""


def q_fano_daily_types(sf_dir: str):
    """Burstiness SUFFICIENT STATS per event type over its daily
    counts, zero-filled across the type's own [first, last] active-day
    span: n_days, Σc and Σc² as exact BIGINTs — the Fano factor
    (variance/mean, the burstiness index) is the consumer's division
    via (n·Σc² − (Σc)²)/(n·Σc). Daily partial counts combine
    distributed; the span fill runs on the tiny type×day frame."""
    from ..functions.relational import grouped_agg

    ev = read_table(sf_dir, "events", columns=["event_type", "ts"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["event_type"].is_valid()),
        batch_format="pyarrow")

    def daily(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("datetime64[ns]")
               .to_numpy("datetime64[D]").astype(np.int64))
        out = pd.DataFrame({"event_type": df["event_type"],
                            "day_id": day,
                            "c": np.ones(len(df), np.int64)})
        return (out.groupby(["event_type", "day_id"], sort=False)
                .sum(numeric_only=True).reset_index())

    tot = grouped_agg(
        ev.map_batches(daily, batch_format="pandas"),
        ["event_type", "day_id"], {"c": ("c", "sum")},
        num_buckets=4).to_pandas()

    rows = []
    for etype, g in tot.groupby("event_type", sort=False):
        span = int(g["day_id"].max() - g["day_id"].min()) + 1
        c = g["c"].to_numpy(np.int64)
        rows.append((etype, span, int(c.sum()), int((c * c).sum())))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "sum_c",
                                      "sum_c2"])
    return out.astype({"n_days": "int64", "sum_c": "int64",
                       "sum_c2": "int64"})


SQL_FANO_DAILY_TYPES = """
WITH d AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_id,
         COUNT(*) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(MAX(day_id) - MIN(day_id) + 1 AS BIGINT) AS n_days,
       CAST(SUM(c) AS BIGINT) AS sum_c,
       CAST(SUM(c * c) AS BIGINT) AS sum_c2
FROM d GROUP BY 1
"""


def q_rolling_median_events(sf_dir: str):
    """Per-user ROLLING MEDIAN of event value (ROWS 6 PRECEDING, order
    (ts, event_id)) — the robust-baseline smoother outlier detectors
    subtract before thresholding. Exactness: values are integer cents,
    so every window median is either an integer or sits exactly on the
    .5 grid (even window = mean of two ints) — np.median and DuckDB's
    interpolating median agree bit-for-bit. One exchange co-locates each
    user's history; full windows are vectorized via sliding_window_view
    and only the ≤6 expanding head rows per user run scalar."""
    from numpy.lib.stride_tricks import sliding_window_view

    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["value"].is_valid()),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        ids = df["event_id"].to_numpy(np.int64)
        cents = np.floor(
            df["value"].to_numpy(np.float64) * 100).astype(np.int64)
        med = np.empty(len(df), dtype=np.float64)
        start = 0
        uid = df["user_id"].to_numpy(np.int64)
        bounds = np.flatnonzero(np.diff(uid)) + 1
        for end in list(bounds) + [len(df)]:
            v = cents[start:end]
            head = min(6, len(v))
            for i in range(head):
                med[start + i] = np.median(v[: i + 1])
            if len(v) >= 7:
                w = sliding_window_view(v, 7)
                med[start + 6:end] = np.median(w, axis=1)
            start = end
        return pd.DataFrame({"event_id": ids, "med": med})

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_ROLLING_MEDIAN_EVENTS = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
)
SELECT event_id,
       median(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med
FROM e
"""


def q_zero_crossings_audio(sf_dir: str):
    """Zero-crossing-rate front-end over decoded WAV audio — the classic
    cheap voiced/unvoiced discriminator: per clip, count sign changes
    between consecutive PCM samples (sign = v < 0, so a 0 sample counts
    as non-negative; integer-exact on both engines). Decode runs in the
    actor-pool codec stage, counting is a vectorized boolean diff, zero
    shuffle. Oracle regenerates the fixture's closed-form waveform and
    replays the comparison with LAG."""
    media_dir = _wav_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/wavs.parquet")

    class ZcrStage:
        def __init__(self):
            from ..stages.multimodal import parse_wav, sniff_wav

            self._parse = parse_wav
            self._sniff = sniff_wav

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for i, payload in zip(df["id"].to_numpy(np.int64),
                                  df["payload"]):
                raw = bytes(payload)
                if not self._sniff(raw):
                    continue
                s = self._parse(raw)[0] < 0
                rows.append((i, len(s), int((s[1:] != s[:-1]).sum())))
            return pd.DataFrame(
                rows, columns=["id", "n_samples", "n_cross"]).astype(
                "int64")

    return ds.map_batches(ZcrStage, concurrency=2, batch_size=32,
                          batch_format="pandas")


SQL_ZERO_CROSSINGS_AUDIO = f"""
WITH s AS (
  SELECT id, CAST(t.i AS BIGINT) AS i,
         (13 * id + 5 * t.i) % 4001 - 2000 AS v
  FROM read_parquet('{WAV_CURRENT}/wavs.parquet'),
       unnest(range({WAV_N_SAMPLES})) t(i)
), lagged AS (
  SELECT id, v,
         LAG(v) OVER (PARTITION BY id ORDER BY i) AS pv
  FROM s
)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(COUNT(*) FILTER (pv IS NOT NULL
                             AND (pv < 0) <> (v < 0)) AS BIGINT)
         AS n_cross
FROM lagged GROUP BY id
"""


def q_dup_weight_docs(sf_dir: str):
    """Soft-dedup TRAINING WEIGHTS: each doc gets weight 1/n where n is
    the size of its exact-content duplicate cluster (keyed by a 60-bit
    md5 prefix of the text — the collision-free-at-corpus-scale key
    both engines compute identically). The down-weighting alternative
    to dropping duplicates outright, per the data-mixture literature.
    Only (doc_id, h) pairs shuffle — never the text; one exchange,
    cluster sizes assigned in-bucket. 1.0/n is a single IEEE division,
    bit-identical cross-engine."""
    import hashlib

    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(t["text"].is_valid()),
        batch_format="pyarrow")

    def hash_text(df: pd.DataFrame) -> pd.DataFrame:
        h = [int(hashlib.md5(x.encode()).hexdigest()[:15], 16)
             for x in df["text"]]
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "h": np.asarray(h, dtype=np.int64)})

    pairs = docs.map_batches(hash_text, batch_format="pandas")

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby("h", sort=False)["doc_id"].transform("size")
        n = n.to_numpy(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_dup": n, "weight": 1.0 / n})

    return bucket_exchange(pairs, ["h"], per_cluster, num_buckets=8)


SQL_DUP_WEIGHT_DOCS = """
WITH h AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substring(md5(text), 1, 15)) AS BIGINT) AS hk
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, CAST(COUNT(*) OVER (PARTITION BY hk) AS BIGINT) AS n_dup,
       1.0 / COUNT(*) OVER (PARTITION BY hk) AS weight
FROM h
"""


def q_orphan_keys_audit(sf_dir: str):
    """Referential-integrity AUDIT: per foreign-key relation, total
    child rows and orphan rows (child key with no parent). Distributed
    as one co-bucketed exchange per relation over tagged (key, side)
    rows — parent keys and child keys of the same value land in the
    same bucket, so orphan-ness is decided locally and only
    per-relation partial counts (≤ buckets rows) return to the driver.
    No broadcast of the parent key set (it is NOT small at scale)."""
    from ..stages.partition import bucket_exchange

    def audit(child, ckey: str, parent, pkey: str):
        c = child.map_batches(
            lambda t: pa.table({
                "k": pc.cast(t[ckey], pa.int64()),
                "is_parent": pa.array([0] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")
        p = parent.map_batches(
            lambda t: pa.table({
                "k": pc.cast(t[pkey], pa.int64()),
                "is_parent": pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            parents = set(df.loc[df["is_parent"] == 1, "k"])
            ch = df[df["is_parent"] == 0]
            orphan = int((~ch["k"].isin(parents)).sum())
            return pd.DataFrame({"n_child": [len(ch)],
                                 "n_orphan": [orphan]})

        parts = bucket_exchange(c.union(p), ["k"], per_bucket,
                                num_buckets=8).to_pandas()
        return int(parts["n_child"].sum()), int(parts["n_orphan"].sum())

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"],
                    num_blocks=8)
    od = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey"], num_blocks=8)
    cu = read_table(sf_dir, "customer", columns=["c_custkey"],
                    num_blocks=4)
    rows = [("lineitem.l_orderkey",) + audit(li, "l_orderkey",
                                             od, "o_orderkey"),
            ("orders.o_custkey",) + audit(od, "o_custkey",
                                          cu, "c_custkey")]
    return pd.DataFrame(rows, columns=["relation", "n_child",
                                       "n_orphan"]).astype(
        {"n_child": "int64", "n_orphan": "int64"})


SQL_ORPHAN_KEYS_AUDIT = """
SELECT 'lineitem.l_orderkey' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(COUNT(*) FILTER (o.o_orderkey IS NULL) AS BIGINT) AS n_orphan
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders.o_custkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) FILTER (c.c_custkey IS NULL) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""

FUNNEL_STEP_US = 3_600_000_000  # each funnel step must land within 1h


def q_timed_funnel_events(sf_dir: str):
    """STRICT TIMED FUNNEL — the conversion metric product analytics
    runs: per user, stage reached along first-view → first qualifying
    click (strictly after the view, within 1h) → first qualifying
    purchase (strictly after that click, within 1h). Earliest-event
    anchoring makes the funnel deterministic (MIN is order-free). One
    exchange co-locates each user's history; the three stage minima are
    vectorized groupby-mins over the bucket frame. Timestamps compare
    as integer µs — exact on both engines."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["user_id"].is_valid()),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        t = (df["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        f = pd.DataFrame({"uid": df["user_id"].to_numpy(np.int64),
                          "t": t, "typ": df["event_type"]})
        a = f[f["typ"] == "view"].groupby("uid")["t"].min()
        fb = f[f["typ"] == "click"].copy()
        fb["a"] = fb["uid"].map(a)
        fb = fb[(fb["t"] > fb["a"])
                & (fb["t"] <= fb["a"] + FUNNEL_STEP_US)]
        b = fb.groupby("uid")["t"].min()
        fc = f[f["typ"] == "purchase"].copy()
        fc["b"] = fc["uid"].map(b)
        fc = fc[(fc["t"] > fc["b"])
                & (fc["t"] <= fc["b"] + FUNNEL_STEP_US)]
        c = fc.groupby("uid")["t"].min()
        users = f["uid"].drop_duplicates()
        stage = (users.isin(a.index).astype(np.int64)
                 + users.isin(b.index).astype(np.int64)
                 + users.isin(c.index).astype(np.int64))
        return pd.DataFrame({"user_id": users.to_numpy(np.int64),
                             "stage": stage.to_numpy(np.int64)})

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_TIMED_FUNNEL_EVENTS = """
WITH u AS (
  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
), a AS (
  SELECT user_id, MIN(ts) AS ts FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
), b AS (
  SELECT e.user_id, MIN(e.ts) AS ts
  FROM events e JOIN a ON e.user_id = a.user_id
  WHERE e.event_type = 'click' AND e.ts > a.ts
    AND e.ts <= a.ts + INTERVAL 1 HOUR GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS ts
  FROM events e JOIN b ON e.user_id = b.user_id
  WHERE e.event_type = 'purchase' AND e.ts > b.ts
    AND e.ts <= b.ts + INTERVAL 1 HOUR GROUP BY 1
)
SELECT u.user_id,
       CAST(CASE WHEN c.user_id IS NOT NULL THEN 3
                 WHEN b.user_id IS NOT NULL THEN 2
                 WHEN a.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM u LEFT JOIN a ON u.user_id = a.user_id
       LEFT JOIN b ON u.user_id = b.user_id
       LEFT JOIN c ON u.user_id = c.user_id
"""

BOLLINGER_W = 20


def q_bollinger_breakouts(sf_dir: str):
    """Bollinger-band BREAKOUT counts per event type: over the
    (ts, event_id)-ordered value stream, a full 20-row trailing window
    defines mean ± 2σ; count points breaking above/below. σ comes from
    integer window sums (n·Σx²−(Σx)², exact in int64), so the float
    band is the SAME short op sequence on both engines: int→double
    casts are exact, sqrt/÷/× are correctly rounded IEEE — the
    comparison is deterministic cross-engine. One exchange per type
    (small-domain key: types sharing a bucket are re-grouped inside
    the kernel); prefix sums make the window O(n)."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "event_id", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["value"].is_valid(),
                                   t["event_type"].is_valid())),
        batch_format="pyarrow")

    W = BOLLINGER_W

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            c = np.floor(
                g["value"].to_numpy(np.float64) * 100).astype(np.int64)
            if len(c) < W:
                rows.append((etype, 0, 0, 0))
                continue
            s1 = np.concatenate(([0], np.cumsum(c)))
            s2 = np.concatenate(([0], np.cumsum(c * c)))
            S1 = s1[W:] - s1[:-W]
            S2 = s2[W:] - s2[:-W]
            num = (W * S2 - S1 * S1).astype(np.float64)
            mean = S1 / float(W)
            band = (2.0 * np.sqrt(num)) / float(W)
            cur = c[W - 1:].astype(np.float64)
            rows.append((etype, len(cur),
                         int((cur > mean + band).sum()),
                         int((cur < mean - band).sum())))
        return pd.DataFrame(rows, columns=["event_type", "n_full",
                                           "n_above", "n_below"]).astype(
            {"n_full": "int64", "n_above": "int64", "n_below": "int64"})

    return bucket_exchange(ev, ["event_type"], per_type, num_buckets=4)


SQL_BOLLINGER_BREAKOUTS = f"""
WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), w AS (
  SELECT event_type, c,
         CAST(SUM(c) OVER win AS BIGINT) AS s1,
         CAST(SUM(c * c) OVER win AS BIGINT) AS s2,
         COUNT(*) OVER win AS n
  FROM e WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN {BOLLINGER_W - 1} PRECEDING
                        AND CURRENT ROW)
)
SELECT event_type,
       CAST(COUNT(*) FILTER (n = {BOLLINGER_W}) AS BIGINT) AS n_full,
       CAST(COUNT(*) FILTER (n = {BOLLINGER_W} AND CAST(c AS DOUBLE) >
         CAST(s1 AS DOUBLE) / {BOLLINGER_W}
           + 2 * sqrt(CAST({BOLLINGER_W} * s2 - s1 * s1 AS DOUBLE))
             / {BOLLINGER_W}) AS BIGINT) AS n_above,
       CAST(COUNT(*) FILTER (n = {BOLLINGER_W} AND CAST(c AS DOUBLE) <
         CAST(s1 AS DOUBLE) / {BOLLINGER_W}
           - 2 * sqrt(CAST({BOLLINGER_W} * s2 - s1 * s1 AS DOUBLE))
             / {BOLLINGER_W}) AS BIGINT) AS n_below
FROM w GROUP BY 1
"""


def q_sortedness_audit(sf_dir: str):
    """Physical-layout SORTEDNESS audit: per layout of the row-group
    fixture, how many adjacent row pairs (in FILE order) are
    non-descending on l_quantity — the statistic a layout advisor reads
    before recommending a sort key (clustered ≈ all pairs, unsorted ≈
    half). Distributed one task per ROW GROUP: each task scans only its
    group's pairs and reports boundary (first, last) values; cross-group
    boundary pairs stitch in the per-layout combine from
    group-cardinality rows — the RLE boundary-stitch pattern, so no
    task ever needs its neighbor's pages."""
    from ..functions.relational import grouped_agg

    fix_dir = _rowgroup_fixture(sf_dir)
    import pyarrow.parquet as pq

    items = []
    for layout in ("clustered", "unsorted"):
        path = f"{fix_dir}/{layout}.parquet"
        for g in range(pq.ParquetFile(path).metadata.num_row_groups):
            items.append({"path": path, "layout": layout, "rg": g})

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path, layout, g in zip(df["path"], df["layout"], df["rg"]):
            v = (pq.ParquetFile(path)
                 .read_row_group(int(g), columns=["l_quantity"])
                 ["l_quantity"].to_numpy())
            rows.append((layout, int(g), len(v) - 1,
                         int((v[1:] >= v[:-1]).sum()),
                         float(v[0]), float(v[-1])))
        return pd.DataFrame(rows, columns=["layout", "rg", "n_in",
                                           "n_sorted_in", "first",
                                           "last"])

    parts = _rd().from_items(items).map_batches(
        scan, batch_format="pandas").to_pandas()

    out = []
    for layout, g in parts.groupby("layout", sort=False):
        g = g.sort_values("rg", kind="mergesort")
        boundary_ok = int((g["first"].to_numpy()[1:]
                           >= g["last"].to_numpy()[:-1]).sum())
        out.append((layout,
                    int(g["n_in"].sum()) + (len(g) - 1),
                    int(g["n_sorted_in"].sum()) + boundary_ok))
    return pd.DataFrame(out, columns=["layout", "n_pairs",
                                      "n_sorted"]).astype(
        {"n_pairs": "int64", "n_sorted": "int64"})


SQL_SORTEDNESS_AUDIT = f"""
WITH q AS (
  SELECT 'clustered' AS layout, file_row_number AS i, l_quantity
  FROM read_parquet('{ROWGROUP_CURRENT}/clustered.parquet',
                    file_row_number=true)
  UNION ALL
  SELECT 'unsorted', file_row_number, l_quantity
  FROM read_parquet('{ROWGROUP_CURRENT}/unsorted.parquet',
                    file_row_number=true)
), lagged AS (
  SELECT layout, l_quantity,
         LAG(l_quantity) OVER (PARTITION BY layout ORDER BY i) AS prev
  FROM q
)
SELECT layout,
       CAST(COUNT(prev) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) FILTER (prev IS NOT NULL
                             AND l_quantity >= prev) AS BIGINT)
         AS n_sorted
FROM lagged GROUP BY 1
"""

GZJSONL_ROOT = "/tmp/transmog_ray_gzjsonl"
GZJSONL_CURRENT = f"{GZJSONL_ROOT}/current"
GZJSONL_SHARDS = 4


def _gzjsonl_fixture(sf_dir: str) -> str:
    """Events re-materialized as gzip JSONL shards (the lake-ingest
    wire format), scale-keyed + atomically symlinked so the static
    oracle SQL reads whatever scale ran last."""
    import gzip
    import json
    import os

    import pyarrow.parquet as pq

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"{GZJSONL_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    done = [f"{out_dir}/events-{i}.jsonl.gz" for i in range(GZJSONL_SHARDS)]
    if not all(os.path.exists(p) for p in done):
        t = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["event_id", "user_id", "event_type",
                                   "props"])
        df = t.to_pandas()
        ks = []
        for p in df["props"]:
            if p is None:
                ks.append(None)
            else:
                ks.append(json.loads(p).get("k"))
        df = df.drop(columns=["props"]).assign(k=ks)
        shards = np.array_split(df, GZJSONL_SHARDS)
        for i, shard in enumerate(shards):
            tmp = done[i] + ".tmp"
            with gzip.open(tmp, "wt", encoding="utf-8") as f:
                for row in shard.itertuples(index=False):
                    f.write(json.dumps({
                        "event_id": int(row.event_id),
                        "user_id": (None if pd.isna(row.user_id)
                                    else int(row.user_id)),
                        "event_type": (None if row.event_type is None
                                       else str(row.event_type)),
                        "k": (None if row.k is None or pd.isna(row.k)
                              else int(row.k))}) + "\n")
            os.replace(tmp, done[i])
    _repoint_current(out_dir, GZJSONL_CURRENT)
    return out_dir


def q_jsonl_gz_events(sf_dir: str):
    """End-to-end exercise of the DISTRIBUTED gzip-JSONL source
    (sources/jsonl_gz.py): decode one shard per task (gzip is not
    splittable — the file is the shard), parse to the union-of-keys
    Arrow schema, then aggregate per event type. The shape every
    lake-ingest job has: wire-format shards → columnar → rollup.
    Oracle reads the SAME .jsonl.gz files via DuckDB read_json."""
    from ..functions.relational import grouped_agg
    from ..sources.jsonl_gz import read_jsonl_gz

    fix_dir = _gzjsonl_fixture(sf_dir)
    paths = [f"{fix_dir}/events-{i}.jsonl.gz"
             for i in range(GZJSONL_SHARDS)]
    ds = read_jsonl_gz(paths)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].notna()]
        return pd.DataFrame({
            "event_type": df["event_type"],
            "one": np.ones(len(df), np.int64),
            "k": df["k"].to_numpy(np.float64)})

    agg = grouped_agg(ds.map_batches(project, batch_format="pandas"),
                      ["event_type"],
                      {"n": ("one", "sum"), "sum_k": ("k", "sum")},
                      num_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # all-null k groups: pandas sum() yields 0, mirror COALESCE(.,0)
        df["n"] = df["n"].astype("int64")
        df["sum_k"] = df["sum_k"].fillna(0).astype("int64")
        return df

    return agg.map_batches(finish, batch_format="pandas")


SQL_JSONL_GZ_EVENTS = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k
FROM read_json_auto('{GZJSONL_CURRENT}/events-*.jsonl.gz')
WHERE event_type IS NOT NULL
GROUP BY 1
"""

DEBOUNCE_US = 60_000_000  # 60s tumbling debounce window


def q_debounced_events(sf_dir: str):
    """Tumbling-window DEBOUNCE — the telemetry dedup that keeps the
    FIRST event per (user, type, 60s window) and drops rapid repeats:
    the kept-event set every at-least-once ingest pipeline computes.
    Deterministic winner via (ts, event_id) order. One exchange routes
    by user; window membership is integer µs division, exact on both
    engines."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["user_id"].is_valid(),
                                   t["event_type"].is_valid())),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        t = (df["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        f = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "event_type": df["event_type"],
                          "win": t // DEBOUNCE_US,
                          "ts_us": t,
                          "event_id": df["event_id"].to_numpy(np.int64)})
        f = f.sort_values(["ts_us", "event_id"], kind="mergesort")
        kept = f.drop_duplicates(["user_id", "event_type", "win"],
                                 keep="first")
        return kept[["user_id", "event_type", "win", "event_id"]]

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_DEBOUNCED_EVENTS = f"""
WITH w AS (
  SELECT user_id, event_type, epoch_us(ts) // {DEBOUNCE_US} AS win,
         event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type,
                        epoch_us(ts) // {DEBOUNCE_US}
           ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
)
SELECT user_id, event_type, CAST(win AS BIGINT) AS win, event_id
FROM w WHERE rn = 1
"""

NEG_EDGES_PER_SRC = 2


def q_negative_edges_pages(sf_dir: str):
    """Deterministic NEGATIVE SAMPLING for link prediction — the
    contrastive counterpart every graph-embedding trainer needs: for
    each crawled url, propose 2 md5-derived candidate targets from the
    global url universe and REJECT true edges and self-loops. No
    driver-held url array: urls get a dense rank via the distributed
    ordered scan (rank = position in md5-of-url order — unique because
    md5 hex is), candidates join to their target url by rank in one
    co-bucketed exchange, and the true-edge rejection is a second
    co-bucketed anti-join. Everything that shuffles is (string, int)
    pairs."""
    import hashlib

    from ..functions.relational import hash_join, ordered_scan
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    pages = _rd().read_parquet(pages_dir, columns=["url", "meta"],
                               override_num_blocks=16)

    def url_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[["url"]].drop_duplicates()

    urls = bucket_exchange(
        pages.map_batches(url_only, batch_format="pandas"), ["url"],
        lambda df: df.drop_duplicates(["url"]), num_buckets=8)

    def with_md5(df: pd.DataFrame) -> pd.DataFrame:
        hh = [hashlib.md5(u.encode()).hexdigest() for u in df["url"]]
        return pd.DataFrame({"url": df["url"], "hh": hh,
                             "one": np.ones(len(df), np.int64)})

    ranked = ordered_scan(
        urls.map_batches(with_md5, batch_format="pandas"),
        "hh", "one", out_col="pos", num_buckets=8).materialize()
    n = ranked.count()

    def cands(df: pd.DataFrame) -> pd.DataFrame:
        src = np.repeat(df["url"].to_numpy(object), NEG_EDGES_PER_SRC)
        j = np.tile(np.arange(NEG_EDGES_PER_SRC, dtype=np.int64),
                    len(df))
        rnk = np.asarray(
            [int(hashlib.md5(f"{s}|{jj}".encode()).hexdigest()[:8], 16)
             % n for s, jj in zip(src, j)], dtype=np.int64)
        return pd.DataFrame({"src": src, "j": j, "rnk": rnk})

    cand = ranked.map_batches(
        lambda df: cands(df[["url"]]), batch_format="pandas")
    rank_tbl = ranked.map_batches(
        lambda df: pd.DataFrame({"rnk": df["pos"].to_numpy(np.int64) - 1,
                                 "dst": df["url"]}),
        batch_format="pandas")
    joined = hash_join(cand, rank_tbl, on=["rnk"], num_buckets=8)

    edges = pages.map_batches(
        lambda df: _explode_hrefs(df)
        .rename(columns={"url": "src", "href": "dst"})[["src", "dst"]]
        .drop_duplicates(),
        batch_format="pandas")

    def keep_non_self(df: pd.DataFrame) -> pd.DataFrame:
        out = df.loc[df["src"] != df["dst"],
                     ["src", "j", "dst"]].copy()
        out["is_edge"] = np.zeros(len(out), np.int64)
        return out

    neg = joined.map_batches(keep_non_self, batch_format="pandas")
    tagged_edges = edges.map_batches(
        lambda df: pd.DataFrame({"src": df["src"],
                                 "j": np.full(len(df), -1, np.int64),
                                 "dst": df["dst"],
                                 "is_edge": np.ones(len(df), np.int64)}),
        batch_format="pandas")

    def reject(df: pd.DataFrame) -> pd.DataFrame:
        true_pairs = df[df["is_edge"] == 1]
        key = pd.MultiIndex.from_frame(true_pairs[["src", "dst"]])
        cand_rows = df[df["is_edge"] == 0]
        mask = ~pd.MultiIndex.from_frame(
            cand_rows[["src", "dst"]]).isin(key)
        out = cand_rows.loc[mask, ["src", "j", "dst"]].copy()
        out["j"] = out["j"].astype("int64")
        return out

    return bucket_exchange(neg.union(tagged_edges), ["src", "dst"],
                           reject, num_buckets=8)


SQL_NEGATIVE_EDGES_PAGES = f"""
WITH urls AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), r AS (
  SELECT url, ROW_NUMBER() OVER (ORDER BY md5(url)) - 1 AS rnk FROM urls
), n AS (SELECT COUNT(*) AS c FROM urls),
cand AS (
  SELECT u.url AS src, j.j,
         CAST(CONCAT('0x', substring(
           md5(u.url || '|' || CAST(j.j AS VARCHAR)), 1, 8)) AS BIGINT)
           % (SELECT c FROM n) AS rnk
  FROM urls u, (SELECT unnest(range({NEG_EDGES_PER_SRC})) AS j) j
), l AS (
  SELECT url, unnest(CAST(json_extract(meta, '$.links') AS JSON[]))
           AS link
  FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
  WHERE meta IS NOT NULL
), e AS (
  SELECT DISTINCT url AS src, json_extract_string(link, '$.href') AS dst
  FROM l WHERE json_extract_string(link, '$.href') IS NOT NULL
), neg AS (
  SELECT c.src, CAST(c.j AS BIGINT) AS j, r.url AS dst
  FROM cand c JOIN r ON c.rnk = r.rnk
)
SELECT src, j, dst FROM neg
WHERE src <> dst
  AND NOT EXISTS (SELECT 1 FROM e
                  WHERE e.src = neg.src AND e.dst = neg.dst)
"""


def q_theilsen_trend_parts(sf_dir: str):
    """Theil–Sen ROBUST trend per part: the LOWER median (discrete
    order statistic at ceil(n/2)−1 — no interpolation, so no
    engine-specific midpoint formula) of all pairwise
    (quantity-diff / shipdate-day-diff) slopes. The outlier-immune
    alternative to the least-squares trend already in the catalog.
    Per-part groups are bounded (~30 lineitems regardless of scale —
    TPC-H keeps lineitems/part constant), so the O(k²) pair kernel is
    per-group constant work after ONE exchange. Each slope is a single
    int→double division — bit-identical cross-engine; pairs with equal
    ship days are excluded (undefined slope) on both sides."""
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_shipdate", "l_quantity"],
                    num_blocks=8)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        x_all = (df["l_shipdate"].to_numpy().astype("datetime64[D]")
                 .astype(np.int64))
        y_all = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        keys = df["l_partkey"].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        keys, x_all, y_all = keys[order], x_all[order], y_all[order]
        bounds = np.flatnonzero(np.diff(keys)) + 1
        rows, start = [], 0
        for end in list(bounds) + [len(keys)]:
            x, y = x_all[start:end], y_all[start:end]
            dx = x[None, :] - x[:, None]
            dy = y[None, :] - y[:, None]
            mask = dx > 0
            n_pairs = int(mask.sum())
            if n_pairs:
                slopes = np.sort(dy[mask].astype(np.float64) / dx[mask])
                rows.append((keys[start], n_pairs,
                             slopes[-(-n_pairs // 2) - 1]))
            start = end
        return pd.DataFrame(rows, columns=["p", "n_pairs",
                                           "slope_med"]).astype(
            {"p": "int64", "n_pairs": "int64"})

    return bucket_exchange(li, ["l_partkey"], per_part, num_buckets=8)


SQL_THEILSEN_TREND_PARTS = """
WITH pts AS (
  SELECT l_partkey AS p,
         date_diff('day', DATE '1970-01-01',
                   CAST(l_shipdate AS DATE)) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
), pairs AS (
  SELECT a.p, CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
  FROM pts a JOIN pts b ON a.p = b.p AND b.x > a.x
)
SELECT p, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       quantile_disc(s, 0.5) AS slope_med
FROM pairs GROUP BY p
"""


def q_max_gain_users(sf_dir: str):
    """Per-user MAXIMUM-GAIN WINDOW (Kadane): the largest contiguous
    sum of event-value cents over the (ts, event_id)-ordered stream —
    the best-burst statistic anomaly/trading analyses ask for. Kadane
    re-expressed as prefix sums minus the running prefix minimum
    (S_i − min(0, min_{j<i} S_j)), so the kernel is two vectorized
    scans and the SQL oracle is two window functions — integer-exact
    on both engines. One exchange per user."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["value"].is_valid(),
                                   t["user_id"].is_valid())),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # sparse buckets at tiny scales arrive empty
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "max_gain": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        c = np.floor(
            df["value"].to_numpy(np.float64) * 100).astype(np.int64)
        bounds = np.flatnonzero(np.diff(uid)) + 1
        rows, start = [], 0
        for end in list(bounds) + [len(uid)]:
            s = np.cumsum(c[start:end])
            prev_min = np.minimum.accumulate(
                np.concatenate(([0], s[:-1])))
            prev_min = np.minimum(prev_min, 0)
            rows.append((uid[start], int((s - prev_min).max())))
            start = end
        return pd.DataFrame(rows, columns=["user_id",
                                           "max_gain"]).astype("int64")

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_MAX_GAIN_USERS = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
), p AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
  FROM e
), m AS (
  SELECT user_id,
         s - LEAST(COALESCE(
           MIN(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0), 0) AS gain
  FROM p
)
SELECT user_id, CAST(MAX(gain) AS BIGINT) AS max_gain
FROM m GROUP BY 1
"""

_COEDGE_SQL_CTES = """
WITH sel AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1995-07-01'
), pairs AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
  JOIN sel ON a.l_orderkey = sel.o_orderkey
), und AS (
  SELECT s1 AS a, s2 AS b FROM pairs
  UNION ALL SELECT s2, s1 FROM pairs
)"""


def q_edge_support_suppliers(sf_dir: str):
    """Per-EDGE triangle support (the k-truss sufficient statistic):
    for every supplier co-occurrence edge, how many common neighbors
    its endpoints share. Wedge generation per center node (the
    node-iterator bound — same work the SQL self-join pays), partial
    wedge counts combine co-bucketed with the edge set keyed by the
    (lo, hi) pair; edges with zero support still emit. Two exchanges,
    only (int, int, count) triples move."""
    from ..stages.partition import bucket_exchange

    edges = _supplier_coedges(sf_dir)

    und = edges.map_batches(
        lambda df: pd.concat([
            df.rename(columns={"src": "a", "dst": "b"}),
            df.rename(columns={"src": "b", "dst": "a"})[["a", "b"]]],
            ignore_index=True),
        batch_format="pandas")

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["a", "b"])
        outs = []
        for _, grp in df.groupby("a", sort=False):
            nbrs = np.sort(grp["b"].to_numpy(np.int64))
            if len(nbrs) >= 2:
                xi, yi = np.triu_indices(len(nbrs), k=1)
                outs.append(pd.DataFrame({"x": nbrs[xi], "y": nbrs[yi]}))
        # the undirected edge set itself (a<b rows), tagged is_edge
        e = df[df["a"] < df["b"]]
        tagged = pd.DataFrame({"x": e["a"].to_numpy(np.int64),
                               "y": e["b"].to_numpy(np.int64),
                               "n": np.zeros(len(e), np.int64),
                               "is_edge": np.ones(len(e), np.int64)})
        if outs:
            w = (pd.concat(outs, ignore_index=True)
                 .groupby(["x", "y"], sort=False).size()
                 .rename("n").reset_index())
            w["n"] = w["n"].astype("int64")
            w["is_edge"] = np.zeros(len(w), np.int64)
            return pd.concat([tagged, w], ignore_index=True)
        return tagged

    parts = bucket_exchange(und, ["a"], wedges, num_buckets=8)

    def support(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["x", "y"], sort=False).agg(
            support=("n", "sum"), has_edge=("is_edge", "max")).reset_index()
        g = g[g["has_edge"] == 1]
        return pd.DataFrame({"s1": g["x"].to_numpy(np.int64),
                             "s2": g["y"].to_numpy(np.int64),
                             "support": g["support"].to_numpy(np.int64)})

    return bucket_exchange(parts, ["x", "y"], support, num_buckets=8)


SQL_EDGE_SUPPORT_SUPPLIERS = _COEDGE_SQL_CTES + """
, wedge AS (
  SELECT u1.b AS x, u2.b AS y
  FROM und u1 JOIN und u2 ON u1.a = u2.a AND u1.b < u2.b
)
SELECT p.s1, p.s2, CAST(COUNT(w.x) AS BIGINT) AS support
FROM pairs p LEFT JOIN wedge w ON w.x = p.s1 AND w.y = p.s2
GROUP BY p.s1, p.s2
"""


def q_wl_hash_suppliers(sf_dir: str):
    """One Weisfeiler–Lehman REFINEMENT round over the supplier
    co-occurrence graph — the structural node fingerprint graph-ML
    featurizers start from: wl(v) = md5(deg(v) | sorted multiset of
    neighbor degrees). md5 over a canonically-ordered string is the
    engine↔SQL-replayable hash (string_agg ORDER BY on the oracle
    side). Two exchanges: one attaches each edge's center degree, one
    folds per node; only (int, int) rows move."""
    import hashlib

    from ..stages.partition import bucket_exchange

    edges = _supplier_coedges(sf_dir)
    und = edges.map_batches(
        lambda df: pd.concat([
            df.rename(columns={"src": "a", "dst": "b"}),
            df.rename(columns={"src": "b", "dst": "a"})[["a", "b"]]],
            ignore_index=True),
        batch_format="pandas")

    def attach_center_deg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["a", "b"])
        d = df.groupby("a", sort=False)["b"].transform("size")
        return pd.DataFrame({"a": df["a"].to_numpy(np.int64),
                             "b": df["b"].to_numpy(np.int64),
                             "da": d.to_numpy(np.int64)})

    with_deg = bucket_exchange(und, ["a"], attach_center_deg,
                               num_buckets=8)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for node, grp in df.groupby("b", sort=False):
            dn = np.sort(grp["da"].to_numpy(np.int64))
            key = f"{len(dn)}|" + ",".join(str(x) for x in dn)
            wl = hashlib.md5(key.encode()).hexdigest()
            rows.append((node, len(dn), wl))
        out = pd.DataFrame(rows, columns=["node", "deg", "wl"])
        return out.astype({"node": "int64", "deg": "int64"})

    return bucket_exchange(with_deg, ["b"], fold, num_buckets=8)


SQL_WL_HASH_SUPPLIERS = _COEDGE_SQL_CTES + """
, deg AS (
  SELECT a AS node, COUNT(*) AS d FROM und GROUP BY 1
), nb AS (
  SELECT u.b AS node, d.d AS dn
  FROM und u JOIN deg d ON d.node = u.a
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS deg,
       md5(CAST(COUNT(*) AS VARCHAR) || '|' ||
           string_agg(CAST(dn AS VARCHAR), ',' ORDER BY dn)) AS wl
FROM nb GROUP BY node
"""


def q_decay_attribution_events(sf_dir: str):
    """Time-decay multi-touch attribution (stages/window.py
    ``attribute_decay``): touch weight halves per whole day of age —
    dyadic, so weights are exact small integers and the
    largest-remainder cent allocation is integer bit-exact on both
    engines. One user-keyed sorted exchange, per-purchase ranges
    explode vectorized; only (purchase, touch, cents) triples emit."""
    from ..stages.partition import apply_sorted
    from ..stages.window import attribute_decay

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"], num_blocks=8)
    return apply_sorted(ev, ["user_id"], "ts", attribute_decay,
                        num_buckets=16, tiebreak=["event_id"])


SQL_DECAY_ATTRIBUTION_EVENTS = """
WITH p AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type <> 'purchase'
), j AS (
  SELECT p.event_id AS purchase_id, t.event_id AS touch_id, p.cents,
         1 << (6 - LEAST((epoch_us(p.ts) - epoch_us(t.ts))
                           // 86400000000, 6)) AS w,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY t.ts, t.event_id) AS rn
  FROM p JOIN t ON t.user_id = p.user_id
       AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
), s AS (
  SELECT *, CAST(SUM(w) OVER (PARTITION BY purchase_id) AS BIGINT) AS sw
  FROM j
), r AS (
  SELECT *, cents * w // sw AS base, (cents * w) % sw AS rem FROM s
), o AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY purchase_id
                            ORDER BY rem DESC, rn) AS rr,
         CAST(SUM(rem) OVER (PARTITION BY purchase_id) AS BIGINT)
           // sw AS extra
  FROM r
)
SELECT purchase_id, touch_id,
       CAST(base + CASE WHEN rr <= extra THEN 1 ELSE 0 END AS BIGINT)
         AS credit_cents
FROM o
"""

BITEMPORAL_DELAY_MOD_S = 7200


def q_bitemporal_asof_events(sf_dir: str):
    """BITEMPORAL as-of join — the feature-store correctness semantics
    for LATE-ARRIVING data: each view event picks the purchase-derived
    feature with the greatest event time (f_ts) among features whose
    event time AND ingest time are both ≤ the view's timestamp. A
    feature that happened before the view but landed in the store
    after it is invisible — the leak the plain as-of join misses.
    Ingest delay is md5-derived (0–2h), so both engines compute the
    identical bitemporal visibility. One exchange co-locates each
    user's events and features; the kernel resolves visibility with a
    bounded per-user mask (per-user histories are small by
    construction; at scale, range-partition time within user)."""
    import hashlib

    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["user_id"].is_valid()),
        batch_format="pyarrow")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = (df["ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64))
        is_f = ((df["event_type"] == "purchase")
                & df["value"].notna()).to_numpy()
        is_v = (df["event_type"] == "view").to_numpy()
        ids = df["event_id"].to_numpy(np.int64)
        delays = np.asarray(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             % BITEMPORAL_DELAY_MOD_S for i in ids], dtype=np.int64)
        c = np.floor(np.nan_to_num(
            df["value"].to_numpy(np.float64)) * 100).astype(np.int64)
        keep = is_f | is_v
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64)[keep],
            "event_id": ids[keep],
            "t": ts_us[keep],
            "i_ts": np.where(is_f, ts_us + delays * 1_000_000, 0)[keep],
            "c": c[keep],
            "is_f": is_f[keep].astype(np.int64)})

    tagged = ev.map_batches(tag, batch_format="pandas")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("user_id", sort=False):
            f = g[g["is_f"] == 1].sort_values(["t", "event_id"],
                                              kind="mergesort")
            v = g[g["is_f"] == 0]
            if len(v) == 0:
                continue
            vt = v["t"].to_numpy(np.int64)
            if len(f) == 0:
                outs.append(pd.DataFrame({
                    "event_id": v["event_id"].to_numpy(np.int64),
                    "f_event_id": np.full(len(v), -1, np.int64),
                    "f_cents": np.zeros(len(v), np.int64)}))
                continue
            ft = f["t"].to_numpy(np.int64)
            fi = f["i_ts"].to_numpy(np.int64)
            fid = f["event_id"].to_numpy(np.int64)
            fc = f["c"].to_numpy(np.int64)
            mask = (ft[None, :] <= vt[:, None]) & \
                   (fi[None, :] <= vt[:, None])
            idx = np.where(mask, np.arange(len(f))[None, :], -1).max(1)
            outs.append(pd.DataFrame({
                "event_id": v["event_id"].to_numpy(np.int64),
                "f_event_id": np.where(idx >= 0, fid[idx], -1),
                "f_cents": np.where(idx >= 0, fc[idx], 0)}))
        if not outs:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "f_event_id": pd.Series([], dtype="int64"),
                "f_cents": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return bucket_exchange(tagged, ["user_id"], per_user, num_buckets=8)


SQL_BITEMPORAL_ASOF_EVENTS = f"""
WITH f AS (
  SELECT user_id, ts AS f_ts,
         ts + to_microseconds(
           (CAST(CONCAT('0x', substring(
              md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % {BITEMPORAL_DELAY_MOD_S}) * 1000000) AS i_ts,
         event_id AS f_id, CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
    AND user_id IS NOT NULL
), v AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL
), j AS (
  SELECT v.event_id, f.f_id, f.c,
         ROW_NUMBER() OVER (PARTITION BY v.event_id
                            ORDER BY f.f_ts DESC, f.f_id DESC) AS rn
  FROM v JOIN f ON f.user_id = v.user_id
       AND f.f_ts <= v.ts AND f.i_ts <= v.ts
)
SELECT v.event_id, COALESCE(j.f_id, -1) AS f_event_id,
       COALESCE(j.c, 0) AS f_cents
FROM v LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
     ON j.event_id = v.event_id
"""


def q_dhash_groups_images(sf_dir: str):
    """Difference-hash (dHash) perceptual IMAGE grouping — the
    gradient-sign cousin of aHash, robust to global brightness shifts:
    over the 4×4 integer thumbnail, 12 horizontal + 12 vertical
    adjacent-cell comparisons pack into a 24-bit signature; equal
    signatures are near-dup candidates. Integer comparisons only
    (cell means are floor-divided sums), so the SQL oracle replays the
    hash bit-for-bit from the fixture's closed-form pixels. Decode
    runs in the codec actor pool; only (hash, 1) partials shuffle."""
    from ..functions.relational import grouped_agg

    media_dir = _image_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/images.parquet")

    class DHashStage:
        def __init__(self):
            from ..stages.multimodal import (decode_bmp, decode_ppm,
                                             sniff_image)

            self._decoders = {"bmp": decode_bmp, "ppm": decode_ppm}
            self._sniff = sniff_image

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hashes = []
            for payload in df["payload"]:
                raw = bytes(payload)
                gray = self._decoders[self._sniff(raw)](raw).astype(
                    np.int64)
                h, w = gray.shape
                m = (gray.reshape(h // 8, 8, w // 8, 8)
                     .sum(axis=(1, 3)) // 64)
                hb = (m[:, 1:] > m[:, :-1]).ravel()  # 4×3, bits 0-11
                vb = (m[1:, :] > m[:-1, :]).ravel()  # 3×4, bits 12-23
                bits = np.concatenate([hb, vb])
                hashes.append(int((bits << np.arange(24)).sum()))
            return pd.DataFrame({
                "dhash": pd.Series(hashes, dtype="int64"),
                "n_images": np.ones(len(hashes), np.int64)})

    sigs = ds.map_batches(DHashStage, concurrency=2, batch_size=32,
                          batch_format="pandas")
    return grouped_agg(sigs, ["dhash"],
                       {"n_images": ("n_images", "sum")}, num_buckets=2)


SQL_DHASH_GROUPS_IMAGES = f"""
WITH px AS (
  SELECT id, CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
         (7 * id + 3 * t1.y + t2.x) % 256 AS g
  FROM read_parquet('{IMG_CURRENT}/images.parquet'),
       unnest(range({IMG_HW})) t1(y), unnest(range({IMG_HW})) t2(x)
), cells AS (
  SELECT id, y // 8 AS r, x // 8 AS c, SUM(g) // 64 AS m
  FROM px GROUP BY 1, 2, 3
), bits AS (
  SELECT a.id, a.r * 3 + a.c AS k,
         CASE WHEN b.m > a.m THEN 1 ELSE 0 END AS bit
  FROM cells a JOIN cells b ON b.id = a.id AND b.r = a.r
                           AND b.c = a.c + 1
  UNION ALL
  SELECT a.id, 12 + a.r * 4 + a.c,
         CASE WHEN b.m > a.m THEN 1 ELSE 0 END
  FROM cells a JOIN cells b ON b.id = a.id AND b.c = a.c
                           AND b.r = a.r + 1
), sig AS (
  SELECT id,
         SUM(CASE WHEN bit = 1
             THEN CAST(1 AS BIGINT) << k ELSE 0 END) AS dhash
  FROM bits GROUP BY id
)
SELECT CAST(dhash AS BIGINT) AS dhash,
       CAST(COUNT(*) AS BIGINT) AS n_images
FROM sig GROUP BY 1
"""


def q_importance_weights_langs(sf_dir: str):
    """DoReMi-lite importance REWEIGHTING: per language, the ratio of
    its share in a target sub-corpus (sources src0–src4) to its share
    in the base corpus — the per-domain multiplier a mixture trainer
    applies. Counts combine distributed (one tiny exchange of
    lang-cardinality partials); the weight is ONE float division of
    exact integer cross-products, bit-identical cross-engine. Langs
    absent from either side are dropped on both."""
    from ..functions.relational import grouped_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "source"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["lang"].is_valid(),
                                   t["source"].is_valid())),
        batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        is_t = pc.is_in(t["source"], value_set=pa.array(
            [f"src{i}" for i in range(5)]))
        tgt = pc.cast(is_t, pa.int64())
        return pa.table({"lang": t["lang"], "n_t": tgt,
                         "n_b": pc.subtract(pa.scalar(1, pa.int64()),
                                            tgt)})

    counts = grouped_agg(docs.map_batches(tag, batch_format="pyarrow"),
                         ["lang"],
                         {"n_t": ("n_t", "sum"), "n_b": ("n_b", "sum")},
                         num_buckets=4).to_pandas()
    counts = counts[(counts["n_t"] > 0) & (counts["n_b"] > 0)]
    tot_t = int(counts["n_t"].sum())
    tot_b = int(counts["n_b"].sum())
    out = counts.astype({"n_t": "int64", "n_b": "int64"}).copy()
    out["w"] = ((out["n_t"].to_numpy(np.int64) * tot_b).astype(
        np.float64)
        / (out["n_b"].to_numpy(np.int64) * tot_t))
    return out[["lang", "n_t", "n_b", "w"]]


SQL_IMPORTANCE_WEIGHTS_LANGS = """
WITH d AS (
  SELECT lang,
         CASE WHEN source IN ('src0','src1','src2','src3','src4')
              THEN 1 ELSE 0 END AS t
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
), c AS (
  SELECT lang, CAST(SUM(t) AS BIGINT) AS n_t,
         CAST(SUM(1 - t) AS BIGINT) AS n_b
  FROM d GROUP BY 1
), kept AS (SELECT * FROM c WHERE n_t > 0 AND n_b > 0),
tot AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS tt,
         CAST(SUM(n_b) AS BIGINT) AS tb
  FROM kept
)
SELECT lang, n_t, n_b,
       CAST(n_t * tb AS DOUBLE) / (n_b * tt) AS w
FROM kept, tot
"""


def q_pushdown_read_lineitem(sf_dir: str):
    """PRUNE-AT-THE-READ demonstration: the row filter and the column
    list ride INTO ``read_parquet`` (pyarrow dataset expression), so
    only qualifying row groups and two columns leave storage — the
    shape every 100-TB scan must take (a read that loads all columns
    for a two-column rollup is wrong). Downstream is one combine-only
    exchange of 3-row partials."""
    import pyarrow.dataset as pads

    from ..functions.relational import grouped_agg

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"],
        filter=(pads.field("l_quantity") >= 45),
        override_num_blocks=8)

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "n": pa.array([1] * t.num_rows, pa.int64()),
                         "sum_qty": q})

    return grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["l_returnflag"],
                       {"n": ("n", "sum"), "sum_qty": ("sum_qty", "sum")},
                       num_buckets=2)


SQL_PUSHDOWN_READ_LINEITEM = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity >= 45
GROUP BY 1
"""

AHASH_HAM_K = 2


def q_ahash_neardup_images(sf_dir: str):
    """Perceptual near-dup IMAGE PAIRS at Hamming ≤ 2 over the 16-bit
    aHash — pigeonhole-EXACT banding: 3 bands (6/5/5 bits) guarantee
    any pair within distance 2 shares at least one band, so candidates
    have NO false negatives; an exact popcount verify in the band
    bucket and a pair-keyed dedup exchange (the same pair can collide
    in several bands) finish the job. Only (id, hash) rows shuffle.
    Oracle: the all-pairs bit_count(xor) cross join — fine at
    image-fixture cardinality, the banded path is the scale story."""
    from ..stages.partition import bucket_exchange

    media_dir = _image_fixture(sf_dir)
    ds = _rd().read_parquet(f"{media_dir}/images.parquet")

    class SigStage:
        def __init__(self):
            from ..stages.multimodal import (decode_bmp, decode_ppm,
                                             sniff_image)

            self._decoders = {"bmp": decode_bmp, "ppm": decode_ppm}
            self._sniff = sniff_image

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, hashes = [], []
            for i, payload in zip(df["id"].to_numpy(np.int64),
                                  df["payload"]):
                raw = bytes(payload)
                gray = self._decoders[self._sniff(raw)](raw).astype(
                    np.int64)
                h, w = gray.shape
                cells = (gray.reshape(h // 8, 8, w // 8, 8)
                         .sum(axis=(1, 3)) // 64).ravel()
                total = int(cells.sum())
                bits = 16 * cells >= total
                ids.append(i)
                hashes.append(int((bits << np.arange(16)).sum()))
            return pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                 "h": pd.Series(hashes, dtype="int64")})

    sigs = ds.map_batches(SigStage, concurrency=2, batch_size=32,
                          batch_format="pandas")

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        h = df["h"].to_numpy(np.int64)
        ids = df["id"].to_numpy(np.int64)
        frames = []
        for b, (shift, mask) in enumerate(((0, 63), (6, 31), (11, 31))):
            frames.append(pd.DataFrame({
                "band": np.full(len(h), b, np.int64),
                "bv": (h >> shift) & mask, "id": ids, "h": h}))
        return pd.concat(frames, ignore_index=True)

    pop = np.array([bin(x).count("1") for x in range(1 << 16)],
                   dtype=np.int64)

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby(["band", "bv"], sort=False):
            if len(g) < 2:
                continue
            ids = g["id"].to_numpy(np.int64)
            h = g["h"].to_numpy(np.int64)
            ai, bi = np.triu_indices(len(ids), k=1)
            d = pop[np.bitwise_xor(h[ai], h[bi])]
            keep = d <= AHASH_HAM_K
            lo = np.minimum(ids[ai[keep]], ids[bi[keep]])
            hi = np.maximum(ids[ai[keep]], ids[bi[keep]])
            outs.append(pd.DataFrame({"id_a": lo, "id_b": hi,
                                      "hamming": d[keep]}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    cands = bucket_exchange(
        sigs.map_batches(bands, batch_format="pandas"),
        ["band", "bv"], candidates, num_buckets=8)
    return bucket_exchange(
        cands, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]), num_buckets=4)


SQL_AHASH_NEARDUP_IMAGES = f"""
WITH px AS (
  SELECT id, CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
         (7 * id + 3 * t1.y + t2.x) % 256 AS g
  FROM read_parquet('{IMG_CURRENT}/images.parquet'),
       unnest(range({IMG_HW})) t1(y), unnest(range({IMG_HW})) t2(x)
), cells AS (
  SELECT id, (y // 8) * 4 + (x // 8) AS k, SUM(g) // 64 AS m
  FROM px GROUP BY 1, 2
), tot AS (
  SELECT id, SUM(m) AS total FROM cells GROUP BY 1
), sig AS (
  SELECT c.id,
         CAST(SUM(CASE WHEN 16 * c.m >= t.total
             THEN CAST(1 AS BIGINT) << c.k ELSE 0 END) AS BIGINT) AS h
  FROM cells c JOIN tot t ON t.id = c.id GROUP BY c.id
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.id < b.id
WHERE bit_count(xor(a.h, b.h)) <= {AHASH_HAM_K}
"""


def q_fallback_asof_events(sf_dir: str):
    """As-of join with GLOBAL FALLBACK — the feature-store cold-start
    rule: each view takes the user's own latest purchase value at ts,
    else the latest purchase value across ALL users, else a default.
    The user side is one co-bucketed exchange (searchsorted ffill per
    user). The global side is a distributed RUNNING LAST-VALUE: range
    cuts on ts, per-range last purchases fold into broadcast offsets
    (range-cardinality driver data), then one range exchange resolves
    every view locally — no global sort and no row ever leaves its
    range. Sides meet in an event-keyed join exchange."""
    from ..functions.relational import hash_join
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["user_id"].is_valid()),
        batch_format="pyarrow")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = (df["ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64))
        is_f = ((df["event_type"] == "purchase")
                & df["value"].notna()).to_numpy()
        is_v = (df["event_type"] == "view").to_numpy()
        c = np.floor(np.nan_to_num(
            df["value"].to_numpy(np.float64)) * 100).astype(np.int64)
        keep = is_f | is_v
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64)[keep],
            "event_id": df["event_id"].to_numpy(np.int64)[keep],
            "t": ts_us[keep], "c": c[keep],
            "is_f": is_f[keep].astype(np.int64)})

    tagged = ev.map_batches(tag, batch_format="pandas").materialize()

    def user_side(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("user_id", sort=False):
            f = g[g["is_f"] == 1].sort_values(["t", "event_id"],
                                              kind="mergesort")
            v = g[g["is_f"] == 0]
            if len(v) == 0:
                continue
            vt = v["t"].to_numpy(np.int64)
            pos = np.searchsorted(f["t"].to_numpy(np.int64), vt,
                                  side="right") - 1
            fc = f["c"].to_numpy(np.int64)
            outs.append(pd.DataFrame({
                "event_id": v["event_id"].to_numpy(np.int64),
                "user_c": np.where(pos >= 0, fc[np.maximum(pos, 0)],
                                   -1)}))
        if not outs:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_c": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    u_side = bucket_exchange(tagged, ["user_id"], user_side,
                             num_buckets=8)

    # ---- global running last-value: cuts → offsets → range exchange
    sample = tagged.map_batches(
        lambda df: df[["t"]].iloc[:: max(1, len(df) // 32)],
        batch_format="pandas").to_pandas()
    keys = np.sort(sample["t"].to_numpy(np.int64))
    nb = 8
    if len(keys) > 1:
        qpos = (np.linspace(0, 1, nb + 1)[1:-1]
                * (len(keys) - 1)).astype(int)
        cuts = np.unique(keys[qpos])
    else:
        cuts = keys[:0]
    n_ranges = len(cuts) + 1

    ranged = tagged.map_batches(
        lambda df: df.assign(_rg=np.searchsorted(
            cuts, df["t"].to_numpy(np.int64), side="right")
            .astype(np.int64)),
        batch_format="pandas").materialize()

    last_per_range = ranged.map_batches(
        lambda df: df[df["is_f"] == 1]
        .sort_values(["t", "event_id"]).groupby("_rg", sort=False)
        .tail(1)[["_rg", "t", "event_id", "c"]],
        batch_format="pandas").to_pandas()
    # fold per-range maxima into "last purchase BEFORE range r"
    best = last_per_range.sort_values(["t", "event_id"]).groupby(
        "_rg", sort=False).tail(1).set_index("_rg")
    offsets = np.full(n_ranges, -1, np.int64)
    run = -1
    for r in range(n_ranges):
        offsets[r] = run
        if r in best.index:
            run = int(best.loc[r, "c"])
    import ray as _ray

    off_ref = _ray.put(offsets)

    def global_side(df: pd.DataFrame, bucket: int) -> pd.DataFrame:
        offs = _ray.get(off_ref)
        f = df[df["is_f"] == 1].sort_values(["t", "event_id"],
                                            kind="mergesort")
        v = df[df["is_f"] == 0]
        if len(v) == 0:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "global_c": pd.Series([], dtype="int64")})
        vt = v["t"].to_numpy(np.int64)
        pos = np.searchsorted(f["t"].to_numpy(np.int64), vt,
                              side="right") - 1
        fc = f["c"].to_numpy(np.int64)
        local = np.where(pos >= 0, fc[np.maximum(pos, 0)], offs[bucket])
        return pd.DataFrame({
            "event_id": v["event_id"].to_numpy(np.int64),
            "global_c": local})

    g_side = bucket_exchange(ranged, ["_rg"], global_side,
                             num_buckets=n_ranges, bucket_col="_rg",
                             with_bucket=True)

    joined = hash_join(u_side, g_side, on="event_id", num_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        uc = df["user_c"].to_numpy(np.int64)
        gc = df["global_c"].to_numpy(np.int64)
        val = np.where(uc >= 0, uc, np.where(gc >= 0, gc, 0))
        src = np.where(uc >= 0, 2, np.where(gc >= 0, 1, 0))
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "src": src.astype(np.int64), "val": val.astype(np.int64)})

    return joined.map_batches(finish, batch_format="pandas")


SQL_FALLBACK_ASOF_EVENTS = """
-- ASOF joins over per-(key, ts) deduped feature streams (latest
-- event_id wins a tied timestamp) keep the oracle linear — the naive
-- "all preceding purchases" join is quadratic at sf0.1.
WITH p AS (
  SELECT user_id, ts, event_id, CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
    AND user_id IS NOT NULL
), v AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL
), pu1 AS (
  SELECT user_id, ts, c FROM (
    SELECT user_id, ts, c,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM p) WHERE rn = 1
), pg1 AS (
  SELECT ts, c FROM (
    SELECT ts, c, ROW_NUMBER() OVER (PARTITION BY ts
                                     ORDER BY ts DESC, event_id DESC,
                                              user_id DESC) AS rn
    FROM p) WHERE rn = 1
), u1 AS (
  SELECT v.event_id, pu1.c
  FROM v ASOF LEFT JOIN pu1
    ON v.user_id = pu1.user_id AND v.ts >= pu1.ts
), g1 AS (
  SELECT v.event_id, pg1.c
  FROM v ASOF LEFT JOIN pg1 ON v.ts >= pg1.ts
)
SELECT v.event_id,
       CAST(CASE WHEN u1.c IS NOT NULL THEN 2
                 WHEN g1.c IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS src,
       CAST(COALESCE(u1.c, g1.c, 0) AS BIGINT) AS val
FROM v LEFT JOIN u1 ON u1.event_id = v.event_id
       LEFT JOIN g1 ON g1.event_id = v.event_id
"""


def q_join_cardinality_estimate(sf_dir: str):
    """Optimizer-grade JOIN CARDINALITY from key histograms:
    |lineitem ⋈ orders| = Σ_k c_li(k)·c_ord(k), plus the matched-key
    count — the statistic a planner consults before picking
    broadcast-vs-shuffle (exactly what ``auto_join`` thresholds on).
    Per-side counts pre-aggregate map-side; the two histograms meet in
    ONE co-bucketed exchange and only per-bucket (est, n_keys) partial
    scalars return to the driver. Integer throughout."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"],
                    num_blocks=8).map_batches(
        lambda t: pa.table({"k": pc.cast(t["l_orderkey"], pa.int64()),
                            "one": pa.array([1] * t.num_rows,
                                            pa.int64())}),
        batch_format="pyarrow")
    od = read_table(sf_dir, "orders", columns=["o_orderkey"],
                    num_blocks=8).map_batches(
        lambda t: pa.table({"k": pc.cast(t["o_orderkey"], pa.int64()),
                            "one": pa.array([1] * t.num_rows,
                                            pa.int64())}),
        batch_format="pyarrow")
    ca = grouped_agg(li, ["k"], {"n_a": ("one", "sum")}, num_buckets=8)
    cb = grouped_agg(od, ["k"], {"n_b": ("one", "sum")}, num_buckets=8)

    a_tag = ca.map_batches(
        lambda df: pd.DataFrame({"k": df["k"].to_numpy(np.int64),
                                 "n": df["n_a"].to_numpy(np.int64),
                                 "side": np.zeros(len(df), np.int64)}),
        batch_format="pandas")
    b_tag = cb.map_batches(
        lambda df: pd.DataFrame({"k": df["k"].to_numpy(np.int64),
                                 "n": df["n_b"].to_numpy(np.int64),
                                 "side": np.ones(len(df), np.int64)}),
        batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0].set_index("k")["n"]
        b = df[df["side"] == 1].set_index("k")["n"]
        both = a.index.intersection(b.index)
        est = int((a.loc[both].to_numpy(np.int64)
                   * b.loc[both].to_numpy(np.int64)).sum())
        return pd.DataFrame({"n_keys": [len(both)], "est": [est]})

    parts = bucket_exchange(a_tag.union(b_tag), ["k"], merge,
                            num_buckets=8).to_pandas()
    return pd.DataFrame({"n_keys": [int(parts["n_keys"].sum())],
                         "est": [int(parts["est"].sum())]}).astype(
        "int64")


SQL_JOIN_CARDINALITY_ESTIMATE = """
WITH a AS (
  SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1
), b AS (
  SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(a.n * b.n) AS BIGINT) AS est
FROM a JOIN b ON a.k = b.k
"""

KMV_K = 64


def q_kmv_sketch_users(sf_dir: str):
    """KMV (k-minimum-values) DISTINCT sketch, the mergeable bottom-k
    structure behind theta sketches: the 64 smallest 60-bit md5 hashes
    of distinct user ids. Every batch ships at most k rows (its local
    bottom-k), partials merge associatively in one single-bucket
    reduce — the textbook mergeable-sketch shuffle shape. The sketch
    CONTENT (rank, hash) is exactly SQL-replayable; the cardinality
    estimate (k−1)·2⁶⁰/h_k is one derived division the consumer applies."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events", columns=["user_id"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["user_id"].is_valid()),
        batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        uids = pd.unique(df["user_id"].to_numpy(np.int64))
        h = np.asarray(
            [int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15], 16)
             for u in uids], dtype=np.int64)
        h = np.unique(h)[:KMV_K]
        return pd.DataFrame({"h": h,
                             "b": np.zeros(len(h), np.int64)})

    parts = ev.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(df["h"].to_numpy(np.int64))[:KMV_K]
        return pd.DataFrame({
            "rank": np.arange(1, len(h) + 1, dtype=np.int64), "h": h})

    return bucket_exchange(parts, ["b"], combine, num_buckets=1,
                           bucket_col="b")


SQL_KMV_SKETCH_USERS = f"""
WITH h AS (
  SELECT DISTINCT CAST(CONCAT('0x', substring(
           md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
)
SELECT ROW_NUMBER() OVER (ORDER BY h) AS rank, h
FROM h ORDER BY h LIMIT {KMV_K}
"""


def q_dod_bits_users(sf_dir: str):
    """DELTA-OF-DELTA bit-width census — the Gorilla-style time-series
    compression planner's statistic: per user, second differences of
    the sorted event timestamps (seconds), histogrammed by bit length
    (np.frexp exponent == DuckDB length(printf('%b', n)), zero handled
    explicitly). Regular streams concentrate at low widths; the
    histogram sizes the variable-length encoding. One exchange per
    user, then a bit-cardinality combine."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["user_id"].is_valid()),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bits": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        t_s = (df["ts"].to_numpy().astype("datetime64[us]")
               .astype(np.int64)) // 1_000_000
        d = np.diff(t_s)
        dod = np.abs(np.diff(d))
        # drop pairs crossing a user boundary: positions i and i+1 of d
        # must belong to the same user triple
        same3 = (uid[2:] == uid[:-2])
        dod = dod[same3]
        nz = dod > 0
        bits = np.zeros(len(dod), np.int64)
        if nz.any():
            bits[nz] = np.frexp(dod[nz].astype(np.float64))[1]
        out = (pd.DataFrame({"bits": bits})
               .groupby("bits", sort=False).size().rename("n")
               .reset_index())
        return out.astype({"bits": "int64", "n": "int64"})

    partials = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    return grouped_agg(partials, ["bits"], {"n": ("n", "sum")},
                       num_buckets=2)


SQL_DOD_BITS_USERS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS t_s, ts, event_id
  FROM events WHERE user_id IS NOT NULL
), d1 AS (
  SELECT user_id, ts, event_id,
         t_s - LAG(t_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS d
  FROM e
), d2 AS (
  SELECT ABS(d - LAG(d) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)) AS dod
  FROM d1 WHERE d IS NOT NULL
)
SELECT CAST(CASE WHEN dod = 0 THEN 0
            ELSE length(printf('%b', dod)) END AS BIGINT) AS bits,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d2 WHERE dod IS NOT NULL
GROUP BY 1
"""

RENDEZVOUS_SHARDS = 8


def q_rendezvous_shards_pages(sf_dir: str):
    """Rendezvous (highest-random-weight) SHARD OWNERSHIP census: each
    distinct url belongs to the shard with the max md5(url|shard)
    weight — the assignment scheme whose key property is minimal
    movement when shards join/leave (vs mod-N, which remaps ~all).
    Zero shuffle beyond the per-shard count partials: ownership is
    decided map-side with 8 hashes per url. Ties are impossible in
    practice (128-bit space) and broken by shard index on both
    engines."""
    import hashlib

    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    pages_dir = _pages_fixture(sf_dir)
    pages = _rd().read_parquet(pages_dir, columns=["url"],
                               override_num_blocks=16)
    urls = bucket_exchange(
        pages.map_batches(lambda df: df[["url"]].drop_duplicates(),
                          batch_format="pandas"),
        ["url"], lambda df: df.drop_duplicates(["url"]), num_buckets=8)

    def owner(df: pd.DataFrame) -> pd.DataFrame:
        shards = []
        for u in df["url"]:
            ws = [(int(hashlib.md5(f"{u}|{s}".encode()).hexdigest()[:15],
                       16), -s) for s in range(RENDEZVOUS_SHARDS)]
            shards.append(-max(ws)[1])
        out = (pd.DataFrame({"shard": pd.Series(shards, dtype="int64")})
               .groupby("shard", sort=False).size().rename("n_urls")
               .reset_index())
        return out.astype({"shard": "int64", "n_urls": "int64"})

    partials = urls.map_batches(owner, batch_format="pandas")
    return grouped_agg(partials, ["shard"], {"n_urls": ("n_urls", "sum")},
                       num_buckets=2)


SQL_RENDEZVOUS_SHARDS_PAGES = f"""
WITH urls AS (
  SELECT DISTINCT url FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
), w AS (
  SELECT url, CAST(s.s AS BIGINT) AS shard,
         CAST(CONCAT('0x', substring(
           md5(url || '|' || CAST(s.s AS VARCHAR)), 1, 15)) AS BIGINT)
           AS wt
  FROM urls, (SELECT unnest(range({RENDEZVOUS_SHARDS})) AS s) s
), pick AS (
  SELECT url, shard,
         ROW_NUMBER() OVER (PARTITION BY url
                            ORDER BY wt DESC, shard) AS rn
  FROM w
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_urls
FROM pick WHERE rn = 1 GROUP BY 1
"""

BUCKETED_ROOT = "/tmp/transmog_ray_bucketed"
BUCKETED_CURRENT = f"{BUCKETED_ROOT}/current"
BUCKETED_N = 8


def _bucketed_fixture(sf_dir: str) -> str:
    """Both join sides PRE-BUCKETED on the join key (orderkey % N, one
    parquet file per bucket per table) — the lakehouse layout that
    turns a repeated join into per-bucket map tasks with NO exchange."""
    import os

    import pyarrow.parquet as pq

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"{BUCKETED_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    done = ([f"{out_dir}/lineitem-{b}.parquet" for b in range(BUCKETED_N)]
            + [f"{out_dir}/orders-{b}.parquet" for b in range(BUCKETED_N)])
    if not all(os.path.exists(p) for p in done):
        li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_extendedprice",
                                    "l_discount"]).to_pandas()
        od = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey",
                                    "o_orderpriority"]).to_pandas()
        for b in range(BUCKETED_N):
            part = li[li["l_orderkey"] % BUCKETED_N == b]
            tmp = f"{out_dir}/lineitem-{b}.parquet.tmp"
            pq.write_table(pa.Table.from_pandas(part,
                                                preserve_index=False), tmp)
            os.replace(tmp, f"{out_dir}/lineitem-{b}.parquet")
            part = od[od["o_orderkey"] % BUCKETED_N == b]
            tmp = f"{out_dir}/orders-{b}.parquet.tmp"
            pq.write_table(pa.Table.from_pandas(part,
                                                preserve_index=False), tmp)
            os.replace(tmp, f"{out_dir}/orders-{b}.parquet")
    _repoint_current(out_dir, BUCKETED_CURRENT)
    return out_dir


def q_bucketed_join_orders(sf_dir: str):
    """SHUFFLE-FREE join over STORAGE-BUCKETED tables: both sides were
    written pre-hashed on the join key (one file per bucket), so the
    join is N independent map tasks — each reads its matching file
    pair, joins, and pre-aggregates; NOTHING crosses the wire but the
    per-priority partials. The layout-aware fast path every lakehouse
    engine (Hive/Spark bucketing, Iceberg bucket transform) ships; at
    100 TB this converts the nightly fact⋈dim join from an all-to-all
    exchange into pure map work. Revenue microcents stay integer."""
    fix_dir = _bucketed_fixture(sf_dir)

    items = [{"li": f"{fix_dir}/lineitem-{b}.parquet",
              "od": f"{fix_dir}/orders-{b}.parquet"}
             for b in range(BUCKETED_N)]

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        outs = []
        for li_path, od_path in zip(df["li"], df["od"]):
            li = pq.read_table(li_path).to_pandas()
            od = pq.read_table(od_path).to_pandas()
            m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
            price_uc = np.round(
                m["l_extendedprice"].to_numpy(np.float64) * 100
            ).astype(np.int64) * 100
            disc_c = np.round(
                m["l_discount"].to_numpy(np.float64) * 100
            ).astype(np.int64)
            rev_uc = price_uc // 100 * (100 - disc_c)
            g = (pd.DataFrame({"o_orderpriority": m["o_orderpriority"],
                               "rev_uc": rev_uc})
                 .groupby("o_orderpriority", sort=False)["rev_uc"]
                 .agg(["sum", "size"]).reset_index())
            g.columns = ["o_orderpriority", "rev_uc", "n"]
            outs.append(g)
        out = pd.concat(outs, ignore_index=True)
        return out.astype({"rev_uc": "int64", "n": "int64"})

    from ..functions.relational import grouped_agg

    parts = _rd().from_items(items).map_batches(
        join_bucket, batch_format="pandas")
    return grouped_agg(parts, ["o_orderpriority"],
                       {"rev_uc": ("rev_uc", "sum"), "n": ("n", "sum")},
                       num_buckets=2)


SQL_BUCKETED_JOIN_ORDERS = """
SELECT o_orderpriority,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS rev_uc,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

KNN_GRAPH_CAP = 200


def q_knn_graph_int8(sf_dir: str):
    """k-NN GRAPH over int8-quantized embeddings — the neighbor lists
    HNSW/NN-descent builders start from, on a bounded probe set
    (vec_id < 200, constant at any scale so the oracle's pairwise join
    stays linear-ish). Quantized dot products are INTEGER, so top-3
    ranking (dot DESC, id ASC) is exactly deterministic cross-engine —
    the float-embedding version could never hash-match. The probe
    matrix broadcasts once via ray.put; each batch scores against it
    with one int matmul (the documented brute-force ANN shape)."""
    import ray as _ray

    from ..functions.ann import _quantize_rows

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"],
                     num_blocks=4).map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], KNN_GRAPH_CAP)),
        batch_format="pyarrow")

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "qrow": pd.Series([], dtype=object)})
        M = np.asarray(list(df["embedding"]), dtype=np.float64)
        q, _scale = _quantize_rows(M)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "qrow": list(q.astype(np.int64))})

    qds = emb.map_batches(quant, batch_format="pandas").materialize()
    probe = qds.to_pandas().sort_values("vec_id")
    probe_ids = probe["vec_id"].to_numpy(np.int64)
    probe_mat = np.stack(probe["qrow"].to_numpy())  # (n, d) int64
    ref = _ray.put((probe_ids, probe_mat))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "nbr_id": pd.Series([], dtype="int64"),
                "dot": pd.Series([], dtype="int64")})
        ids_p, mat = _ray.get(ref)
        ids = df["vec_id"].to_numpy(np.int64)
        Q = np.stack(df["qrow"].to_numpy())
        dots = Q @ mat.T  # exact int64
        outs = []
        for r in range(len(ids)):
            row = dots[r]
            mask = ids_p != ids[r]
            cand_ids, cand = ids_p[mask], row[mask]
            order = np.lexsort((cand_ids, -cand))[:3]
            outs.append(pd.DataFrame({
                "vec_id": np.full(len(order), ids[r], np.int64),
                "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                "nbr_id": cand_ids[order],
                "dot": cand[order]}))
        return pd.concat(outs, ignore_index=True)

    return qds.map_batches(topk, batch_format="pandas")


SQL_KNN_GRAPH_INT8 = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings WHERE vec_id < {KNN_GRAPH_CAP}
), s AS (
  SELECT vec_id, emb,
         list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS scale
  FROM e
), qv AS (
  SELECT vec_id,
         unnest(range(0, len(emb))) AS pos,
         unnest(list_transform(emb, x ->
             CASE WHEN scale = 0 THEN 0
                  ELSE CAST(GREATEST(LEAST(ROUND(x * 127.0 / scale),
                                           127), -127) AS BIGINT)
             END)) AS q
  FROM s
), d AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM qv a JOIN qv b ON a.pos = b.pos AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
), r AS (
  SELECT va, vb, dot,
         ROW_NUMBER() OVER (PARTITION BY va
                            ORDER BY dot DESC, vb) AS rn
  FROM d
)
SELECT va AS vec_id, CAST(rn AS BIGINT) AS rank, vb AS nbr_id, dot
FROM r WHERE rn <= 3
"""

LDIV_BUCKET_CHARS = 500
LDIV_L = 3


def q_l_diversity_docs(sf_dir: str):
    """l-DIVERSITY privacy audit (k-anonymity's stronger sibling): per
    quasi-identifier group (lang × length bucket), the count of rows
    and of DISTINCT sensitive values (source); groups with fewer than
    l = 3 distinct sources are re-identification risks even when k is
    large — the release gate a privacy review runs before publishing a
    corpus slice. One exchange, nunique folds in-bucket."""
    from ..stages.partition import bucket_exchange

    docs = read_table(sf_dir, "documents",
                      columns=["lang", "source", "n_chars"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(pc.and_(t["lang"].is_valid(),
                                           t["source"].is_valid()),
                                   t["n_chars"].is_valid())),
        batch_format="pyarrow")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": df["lang"],
            "len_bucket": (df["n_chars"].to_numpy(np.int64)
                           // LDIV_BUCKET_CHARS),
            "source": df["source"]})

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "len_bucket"], sort=False)["source"].agg(
            ["size", "nunique"]).reset_index()
        g.columns = ["lang", "len_bucket", "k", "l"]
        g["risky"] = (g["l"] < LDIV_L).astype("int64")
        return g.astype({"len_bucket": "int64", "k": "int64",
                         "l": "int64"})

    return bucket_exchange(docs.map_batches(tag, batch_format="pandas"),
                           ["lang", "len_bucket"], per_group,
                           num_buckets=8)


SQL_L_DIVERSITY_DOCS = f"""
SELECT lang, n_chars // {LDIV_BUCKET_CHARS} AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS l,
       CAST(CASE WHEN COUNT(DISTINCT source) < {LDIV_L}
            THEN 1 ELSE 0 END AS BIGINT) AS risky
FROM documents
WHERE lang IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
GROUP BY 1, 2
"""

RBO_K = 8  # depth; with p = 1/2 every RBO term is dyadic·(1/d)


def q_rbo_rankings_docs(sf_dir: str):
    """Rank-biased overlap (RBO, Webber et al.) between two retrieval
    rankings — the ranking-agreement metric IR evals report. Rankings:
    top-8 docs by two deterministic integer scorers ('e'-count vs
    space-count, ties by doc_id). With persistence p = 1/2 each term
    is overlap_d/(d·2^d), so the WHOLE metric is one exact rational:
    numerator Σ overlap_d·(840/d)·2^(8−d) over denominator 840·256 —
    integers on both engines, no float summation order to disagree on.
    Each ranking is a distributed top-k (per-batch top-8 partials, one
    single-bucket combine); the 8×8 overlap math is driver-side on
    16 rows. Output: per-depth overlaps + the exact fraction."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8).map_batches(
        lambda t: t.filter(t["text"].is_valid()),
        batch_format="pyarrow")

    def scores(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "sa": pc.cast(pc.count_substring(t["text"], "e"),
                          pa.int64()),
            "sb": pc.cast(pc.count_substring(t["text"], " "),
                          pa.int64())})

    scored = docs.map_batches(scores, batch_format="pyarrow")

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        a = df.sort_values(["sa", "doc_id"],
                           ascending=[False, True]).head(RBO_K)
        b = df.sort_values(["sb", "doc_id"],
                           ascending=[False, True]).head(RBO_K)
        return pd.concat([a, b], ignore_index=True).drop_duplicates(
            "doc_id")

    # partials are ≤2k rows per batch; the combine is one tiny frame
    top = local_top(
        scored.map_batches(local_top, batch_format="pandas").to_pandas())
    merged = pd.concat([top], ignore_index=True)
    a_ids = (merged.sort_values(["sa", "doc_id"],
                                ascending=[False, True])
             .head(RBO_K)["doc_id"].to_numpy(np.int64))
    b_ids = (merged.sort_values(["sb", "doc_id"],
                                ascending=[False, True])
             .head(RBO_K)["doc_id"].to_numpy(np.int64))
    rows = []
    num = 0
    for d in range(1, RBO_K + 1):
        ov = len(set(a_ids[:d]) & set(b_ids[:d]))
        term = ov * (840 // d) * (1 << (RBO_K - d))
        num += term
        rows.append((d, ov, term))
    out = pd.DataFrame(rows, columns=["depth", "overlap", "term_num"])
    out["rbo_num"] = np.int64(num)
    out["rbo_den"] = np.int64(840 * (1 << RBO_K))
    return out.astype({"depth": "int64", "overlap": "int64",
                       "term_num": "int64"})


SQL_RBO_RANKINGS_DOCS = f"""
WITH s AS (
  SELECT doc_id,
         length(text) - length(replace(text, 'e', '')) AS sa,
         length(text) - length(replace(text, ' ', '')) AS sb
  FROM documents WHERE text IS NOT NULL
), a AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sa DESC, doc_id) AS rn
  FROM s QUALIFY rn <= {RBO_K}
), b AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sb DESC, doc_id) AS rn
  FROM s QUALIFY rn <= {RBO_K}
), depths AS (
  SELECT CAST(unnest(range(1, {RBO_K} + 1)) AS BIGINT) AS depth
), ov AS (
  SELECT d.depth,
         (SELECT COUNT(*) FROM a JOIN b USING (doc_id)
          WHERE a.rn <= d.depth AND b.rn <= d.depth) AS overlap
  FROM depths d
), terms AS (
  SELECT depth, CAST(overlap AS BIGINT) AS overlap,
         CAST(overlap * (840 // depth)
              * (CAST(1 AS BIGINT) << ({RBO_K} - depth)) AS BIGINT)
           AS term_num
  FROM ov
)
SELECT depth, overlap, term_num,
       CAST(SUM(term_num) OVER () AS BIGINT) AS rbo_num,
       CAST(840 * (CAST(1 AS BIGINT) << {RBO_K}) AS BIGINT) AS rbo_den
FROM terms
"""

DRIFT_BIN_CENTS = 2000


def q_value_drift_types(sf_dir: str):
    """Distribution DRIFT between the first and second time half, per
    event type: the cross-multiplied integer L1 distance
    Σ_b |n1_b·N2 − n2_b·N1| between value-bin histograms — the
    train/serve skew monitor, kept exact by clearing denominators
    (per-half totals) instead of dividing. The split point is the
    integer midpoint of the global ts span (one cheap min/max pass);
    histograms fold per type in one exchange (small-domain key: types
    sharing a bucket re-group inside the kernel)."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["value"].is_valid(),
                                   t["event_type"].is_valid())),
        batch_format="pyarrow").materialize()

    span = ev.map_batches(
        lambda df: pd.DataFrame({
            "lo": [df["ts"].min()], "hi": [df["ts"].max()]}),
        batch_format="pandas").to_pandas()
    lo = span["lo"].min().to_datetime64().astype("datetime64[us]")
    hi = span["hi"].max().to_datetime64().astype("datetime64[us]")
    mid = (lo.astype(np.int64) + hi.astype(np.int64)) // 2

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n1": pd.Series([], dtype="int64"),
                "n2": pd.Series([], dtype="int64"),
                "l1_num": pd.Series([], dtype="int64")})
        t = (df["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        b = (np.floor(df["value"].to_numpy(np.float64) * 100)
             .astype(np.int64) // DRIFT_BIN_CENTS)
        f = pd.DataFrame({"event_type": df["event_type"], "bin": b,
                          "h2": (t > mid).astype(np.int64)})
        rows = []
        for etype, g in f.groupby("event_type", sort=False):
            piv = (g.groupby(["bin", "h2"]).size().unstack(
                fill_value=0).reindex(columns=[0, 1], fill_value=0))
            n1, n2 = int(piv[0].sum()), int(piv[1].sum())
            d = int(np.abs(piv[0].to_numpy(np.int64) * n2
                           - piv[1].to_numpy(np.int64) * n1).sum())
            rows.append((etype, n1, n2, d))
        return pd.DataFrame(rows, columns=["event_type", "n1", "n2",
                                           "l1_num"]).astype(
            {"n1": "int64", "n2": "int64", "l1_num": "int64"})

    return bucket_exchange(ev, ["event_type"], per_type, num_buckets=4)


SQL_VALUE_DRIFT_TYPES = f"""
WITH mid AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS m
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), e AS (
  SELECT event_type,
         CAST(FLOOR(value * 100) AS BIGINT) // {DRIFT_BIN_CENTS} AS bin,
         CASE WHEN epoch_us(ts) > (SELECT m FROM mid)
              THEN 1 ELSE 0 END AS h2
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), h AS (
  SELECT event_type, bin,
         SUM(1 - h2) AS c1, SUM(h2) AS c2
  FROM e GROUP BY 1, 2
), tot AS (
  SELECT event_type, SUM(c1) AS n1, SUM(c2) AS n2
  FROM h GROUP BY 1
)
SELECT h.event_type, CAST(t.n1 AS BIGINT) AS n1,
       CAST(t.n2 AS BIGINT) AS n2,
       CAST(SUM(ABS(h.c1 * t.n2 - h.c2 * t.n1)) AS BIGINT) AS l1_num
FROM h JOIN tot t ON t.event_type = h.event_type
GROUP BY 1, 2, 3
"""

LTV_WEEK_US = 7 * 86_400 * 1_000_000
LTV_MAX_K = 4


def q_cohort_ltv_users(sf_dir: str):
    """Cohort LTV CURVE: users cohorted by signup week (first event),
    revenue from purchases in weeks 0..3 since signup, reported as the
    CUMULATIVE cents per (cohort_week, k) — the growth-team curve.
    One exchange co-locates each user (signup and purchases resolve
    locally); only (cohort, k, cents) partials shuffle again, and the
    cumulative fold runs on the group-cardinality frame."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["user_id"].is_valid()),
        batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "cohort_week": pd.Series([], dtype="int64"),
                "k": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64")})
        t = (df["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        f = pd.DataFrame({"uid": df["user_id"].to_numpy(np.int64),
                          "t": t, "typ": df["event_type"],
                          "v": df["value"]})
        signup = f.groupby("uid")["t"].min()
        p = f[(f["typ"] == "purchase") & f["v"].notna()].copy()
        p["s"] = p["uid"].map(signup)
        p["k"] = (p["t"] - p["s"]) // LTV_WEEK_US
        p = p[p["k"] < LTV_MAX_K]
        p["cohort_week"] = p["s"] // LTV_WEEK_US
        p["cents"] = np.floor(
            p["v"].to_numpy(np.float64) * 100).astype(np.int64)
        out = (p.groupby(["cohort_week", "k"], sort=False)["cents"]
               .sum().reset_index())
        return out.astype({"cohort_week": "int64", "k": "int64",
                           "cents": "int64"})

    parts = bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)
    agg = grouped_agg(parts, ["cohort_week", "k"],
                      {"cents": ("cents", "sum")},
                      num_buckets=2).to_pandas()
    agg = agg.sort_values(["cohort_week", "k"], kind="mergesort")
    agg["cum_cents"] = agg.groupby("cohort_week")["cents"].cumsum()
    return agg.astype({"cohort_week": "int64", "k": "int64",
                       "cents": "int64", "cum_cents": "int64"})


SQL_COHORT_LTV_USERS = f"""
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
), p AS (
  SELECT e.user_id,
         s.s_us // {LTV_WEEK_US} AS cohort_week,
         (epoch_us(e.ts) - s.s_us) // {LTV_WEEK_US} AS k,
         CAST(FLOOR(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
), g AS (
  SELECT cohort_week, k, CAST(SUM(cents) AS BIGINT) AS cents
  FROM p WHERE k < {LTV_MAX_K} GROUP BY 1, 2
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week, CAST(k AS BIGINT)
         AS k, cents,
       CAST(SUM(cents) OVER (PARTITION BY cohort_week ORDER BY k
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_cents
FROM g
"""

WARC_FIX_ROOT = "/tmp/transmog_ray_warc"
WARC_FIX_SHARDS = 4


def _warc_fixture(sf_dir: str) -> str:
    """The pages table re-materialized as gzipped WARC/1.0 response
    shards — the actual Common-Crawl wire format — so the WARC source
    is exercised end-to-end against an INDEPENDENT oracle path (the
    parquet the records derive from)."""
    import os

    pages_dir = _pages_fixture(sf_dir)
    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"{WARC_FIX_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    done = [f"{out_dir}/crawl-{i}.warc.gz" for i in range(WARC_FIX_SHARDS)]
    if not all(os.path.exists(p) for p in done):
        import glob

        import pyarrow.parquet as pq

        from ..sources.warc import write_warc

        files = sorted(glob.glob(f"{pages_dir}/pages-*.parquet"))
        t = pa.concat_tables([
            pq.read_table(f, columns=["url", "warc_ts", "text"])
            for f in files])
        df = t.to_pandas()
        df = df[df["text"].notna()].sort_values(
            ["url", "warc_ts"], kind="mergesort")
        shards = np.array_split(df, WARC_FIX_SHARDS)
        for i, shard in enumerate(shards):
            # tmp name must KEEP the .gz suffix — write_warc picks its
            # opener from the extension
            tmp = f"{out_dir}/.tmp-crawl-{i}.warc.gz"
            write_warc(
                ({"url": r.url,
                  "warc_date": pd.Timestamp(r.warc_ts).isoformat(),
                  "payload": str(r.text).encode("utf-8")}
                 for r in shard.itertuples(index=False)), tmp)
            os.replace(tmp, done[i])
    return out_dir


def q_warc_domain_census(sf_dir: str):
    """End-to-end WARC SOURCE exercise (sources/warc.py): parse gzipped
    WARC/1.0 response shards — one record per (url, warc_ts) page
    snapshot — and roll up records + payload bytes per domain. The
    oracle takes the INDEPENDENT path: the parquet pages the fixture
    was written from, with octet_length(encode(text)) as the byte
    count — so a parser bug (truncated payload, header drift, gzip
    member handling) breaks the hash."""
    from ..functions.relational import grouped_agg
    from ..sources.warc import read_warc

    fix_dir = _warc_fixture(sf_dir)
    paths = [f"{fix_dir}/crawl-{i}.warc.gz"
             for i in range(WARC_FIX_SHARDS)]
    ds = read_warc(paths)

    def census(df: pd.DataFrame) -> pd.DataFrame:
        dom = (df["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        out = pd.DataFrame({"domain": dom,
                            "n_records": np.ones(len(df), np.int64),
                            "total_bytes": df["length"]
                            .to_numpy(np.int64)})
        return (out.groupby("domain", sort=False)
                [["n_records", "total_bytes"]].sum().reset_index())

    return grouped_agg(ds.map_batches(census, batch_format="pandas"),
                       ["domain"],
                       {"n_records": ("n_records", "sum"),
                        "total_bytes": ("total_bytes", "sum")},
                       num_buckets=4)


SQL_WARC_DOMAIN_CENSUS = f"""
SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
WHERE text IS NOT NULL
GROUP BY 1
"""


def q_warc_token_stats(sf_dir: str):
    """Wire-format → FEATURES in one pass: whitespace token counts per
    domain computed directly from parsed WARC payloads (decode utf-8 in
    the parse task, count with the codepoint-exact pc.count_substring
    rule) — the ingest shape a crawl-to-training pipeline runs without
    ever materializing an intermediate table. Oracle: the independent
    parquet path with the established count(' ')+1 formula."""
    from ..functions.relational import grouped_agg
    from ..sources.warc import read_warc

    fix_dir = _warc_fixture(sf_dir)
    paths = [f"{fix_dir}/crawl-{i}.warc.gz"
             for i in range(WARC_FIX_SHARDS)]
    ds = read_warc(paths)

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        dom = (df["url"].str.split("//", n=1).str[1]
               .str.split("/", n=1).str[0])
        text = df["payload"].map(lambda b: bytes(b).decode("utf-8"))
        toks = text.str.count(" ").to_numpy(np.int64) + 1
        out = pd.DataFrame({"domain": dom,
                            "n_pages": np.ones(len(df), np.int64),
                            "n_tokens": toks})
        return (out.groupby("domain", sort=False)
                [["n_pages", "n_tokens"]].sum().reset_index())

    return grouped_agg(ds.map_batches(tokens, batch_format="pandas"),
                       ["domain"],
                       {"n_pages": ("n_pages", "sum"),
                        "n_tokens": ("n_tokens", "sum")},
                       num_buckets=4)


SQL_WARC_TOKEN_STATS = f"""
SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
            AS BIGINT) AS n_tokens
FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
WHERE text IS NOT NULL
GROUP BY 1
"""


def q_boruvka_round_parts(sf_dir: str):
    """One Borůvka MST ROUND over the weighted part co-occurrence
    graph (weight = 1/co-purchase-count proxy, i.e. PREFER frequent
    pairs ⇒ min edge by (−w, neighbor)): each node's cheapest incident
    edge — the contraction set the first round of every distributed
    MST computes. Deterministic tie-break by neighbor id. Pair weights
    come from the order-keyed exchange + combine; the argmin is one
    node-keyed exchange of (node, w, nbr) triples."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"], num_blocks=8)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = _copurchase_pair_frame(df)
        if out.empty:
            return pd.DataFrame({"pa": pd.Series([], dtype="int64"),
                                 "pb": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        return (out.groupby(["pa", "pb"], sort=False)
                .size().rename("w").astype("int64").reset_index())

    weighted = grouped_agg(
        bucket_exchange(li, ["l_orderkey"], pairs, num_buckets=8),
        ["pa", "pb"], {"w": ("w", "sum")}, num_buckets=8)

    und = weighted.map_batches(
        lambda df: pd.concat([
            df.rename(columns={"pa": "node", "pb": "nbr"}),
            df.rename(columns={"pb": "node", "pa": "nbr"})[
                ["node", "nbr", "w"]]],
            ignore_index=True)[["node", "nbr", "w"]],
        batch_format="pandas")

    def argmin_edge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64"),
                                 "nbr": pd.Series([], dtype="int64")})
        df = df.sort_values(["node", "w", "nbr"],
                            ascending=[True, False, True],
                            kind="mergesort")
        best = df.drop_duplicates("node", keep="first")
        return best[["node", "w", "nbr"]].astype("int64")

    return bucket_exchange(und, ["node"], argmin_edge, num_buckets=8)


SQL_BORUVKA_ROUND_PARTS = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pw AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), und AS (
  SELECT pa AS node, pb AS nbr, w FROM pw
  UNION ALL SELECT pb, pa, w FROM pw
), pick AS (
  SELECT node, nbr, w,
         ROW_NUMBER() OVER (PARTITION BY node
                            ORDER BY w DESC, nbr) AS rn
  FROM und
)
SELECT node, w, nbr FROM pick WHERE rn = 1
"""

BOOTSTRAP_B = 16


def q_bootstrap_means_events(sf_dir: str):
    """Deterministic BOOTSTRAP replicates for the mean event value —
    the resampling machinery behind distributed confidence intervals:
    replicate b reweights each event by knuth_hash(event_id + salt_b)
    mod 3 ∈ {0,1,2} (mean 1 — the integer stand-in for Poisson(1)
    weights), so every replicate is a single weighted pass and all 16
    replicates ship ONE partial row per batch each. Sufficient stats
    (Σw, Σw·cents) stay integer — the consumer divides. The hash grid
    replays exactly in SQL (the epoch-order knuth recipe)."""
    from ..functions.relational import grouped_agg
    from ..functions.sampling import knuth_hash

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "value"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(t["value"].is_valid()),
        batch_format="pyarrow")

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy(np.int64)
        cents = np.floor(
            df["value"].to_numpy(np.float64) * 100).astype(np.int64)
        rows = []
        for b in range(BOOTSTRAP_B):
            w = (knuth_hash(ids + 1000 * (b + 1)).astype(np.int64)) % 3
            rows.append((b, int(w.sum()), int((w * cents).sum())))
        return pd.DataFrame(rows, columns=["b", "n_eff", "sum_cents"])

    return grouped_agg(
        ev.map_batches(replicate, batch_format="pandas"),
        ["b"], {"n_eff": ("n_eff", "sum"),
                "sum_cents": ("sum_cents", "sum")}, num_buckets=2)


SQL_BOOTSTRAP_MEANS_EVENTS = f"""
WITH e AS (
  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT b.b,
         ((e.event_id + 1000 * (b.b + 1)) * 2654435761)
           % 4294967296 % 3 AS w,
         e.c
  FROM e, (SELECT unnest(range({BOOTSTRAP_B})) AS b) b
)
SELECT CAST(b AS BIGINT) AS b,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(SUM(w * c) AS BIGINT) AS sum_cents
FROM r GROUP BY 1
"""

FUNNEL_CANON = "vcp"  # view → click → purchase
FUNNEL_SEQ_LEN = 8


def q_funnel_distance_users(sf_dir: str):
    """SEQUENCE-ALIGNMENT conformance: per user, the Levenshtein
    distance between their first-8-event type string (one char per
    type, (ts, event_id) order) and the canonical view→click→purchase
    path — the behavioral-clustering feature that ranks how far each
    journey deviates from the funnel. Unit-cost edit distance matches
    DuckDB's levenshtein() exactly; strings are ≤8 chars so the DP is
    constant work per user after one exchange."""
    from ..stages.partition import bucket_exchange

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=8).map_batches(
        lambda t: t.filter(pc.and_(t["user_id"].is_valid(),
                                   t["event_type"].is_valid())),
        batch_format="pyarrow")

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "seq": pd.Series([], dtype=object),
                                 "dist": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        ch = df["event_type"].str[0]
        rows = []
        for uid, g in ch.groupby(df["user_id"].to_numpy(np.int64),
                                 sort=False):
            seq = "".join(g.iloc[:FUNNEL_SEQ_LEN])
            rows.append((uid, seq, lev(seq, FUNNEL_CANON)))
        return pd.DataFrame(rows, columns=["user_id", "seq",
                                           "dist"]).astype(
            {"user_id": "int64", "dist": "int64"})

    return bucket_exchange(ev, ["user_id"], per_user, num_buckets=8)


SQL_FUNNEL_DISTANCE_USERS = f"""
WITH o AS (
  SELECT user_id, substring(event_type, 1, 1) AS ch,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), s AS (
  SELECT user_id,
         string_agg(ch, '' ORDER BY rn) AS seq
  FROM o WHERE rn <= {FUNNEL_SEQ_LEN} GROUP BY 1
)
SELECT user_id, seq,
       CAST(levenshtein(seq, '{FUNNEL_CANON}') AS BIGINT) AS dist
FROM s
"""

ZSKIP_ROOT = "/tmp/transmog_ray_zskip"
ZSKIP_CURRENT = f"{ZSKIP_ROOT}/current"
ZSKIP_RG = 512
# 2-D box predicate the audit evaluates against the zone maps
ZSKIP_SIZE_LO, ZSKIP_SIZE_HI = 10, 20
ZSKIP_PB_LO, ZSKIP_PB_HI = 16, 31


def _zskip_fixture(sf_dir: str) -> str:
    """The part table in two physical orders — Z-ORDER (Morton) sorted
    vs natural key order — with small row groups, so the audit can
    show the curve layout turning a 2-D box predicate into zone-map
    skips that a 1-D sort can never give."""
    import os

    import pyarrow.parquet as pq

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"{ZSKIP_ROOT}/{scale}"
    os.makedirs(out_dir, exist_ok=True)
    z_path, n_path = (f"{out_dir}/zorder.parquet",
                      f"{out_dir}/natural.parquet")
    if not (os.path.exists(z_path) and os.path.exists(n_path)):
        t = pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_size",
                                   "p_retailprice"])
        df = t.to_pandas()
        cents = np.rint(
            df["p_retailprice"].to_numpy(np.float64) * 100).astype(
            np.int64)
        x = df["p_size"].to_numpy(np.int64)
        y = np.clip((cents - 90000) // 200, 0, 63)
        z = np.zeros(len(df), np.int64)
        for i in range(6):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        out = pd.DataFrame({"p_partkey": df["p_partkey"]
                            .to_numpy(np.int64),
                            "p_size": x, "pb": y, "z": z})
        nat = out.sort_values("p_partkey", kind="mergesort")
        pq.write_table(pa.Table.from_pandas(
            nat.drop(columns=["z"]), preserve_index=False),
            n_path, row_group_size=ZSKIP_RG)
        zo = out.sort_values(["z", "p_partkey"], kind="mergesort")
        pq.write_table(pa.Table.from_pandas(
            zo.drop(columns=["z"]), preserve_index=False),
            z_path, row_group_size=ZSKIP_RG)
    _repoint_current(out_dir, ZSKIP_CURRENT)
    return out_dir


def q_zorder_skip_stats(sf_dir: str):
    """LAYOUT PAYOFF audit: for the 2-D box predicate (p_size ∈
    [10,20] AND price-bucket ∈ [16,31]), how many row groups each
    physical layout lets a reader SKIP from zone maps alone — the
    measurement behind an OPTIMIZE ZORDER recommendation (a Morton
    layout keeps both dimensions local per row group; a key-ordered
    layout spans the full domain of both). Metadata-only Ray tasks,
    one per file; oracle = parquet_metadata() stats self-joined across
    the two columns."""
    from ..functions.relational import grouped_agg

    fix_dir = _zskip_fixture(sf_dir)
    files = [{"path": f"{fix_dir}/zorder.parquet", "layout": "zorder"},
             {"path": f"{fix_dir}/natural.parquet", "layout": "natural"}]

    def footer(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        rows = []
        for path, layout in zip(df["path"], df["layout"]):
            md = pq.ParquetFile(path).metadata
            names = md.schema.names
            i_size, i_pb = names.index("p_size"), names.index("pb")
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                s, b = rg.column(i_size).statistics, \
                    rg.column(i_pb).statistics
                skip = (s.max < ZSKIP_SIZE_LO or s.min > ZSKIP_SIZE_HI
                        or b.max < ZSKIP_PB_LO or b.min > ZSKIP_PB_HI)
                rows.append((layout, 1, int(skip),
                             rg.num_rows * int(skip)))
        return pd.DataFrame(rows, columns=["layout", "n_groups",
                                           "n_skippable", "skip_rows"])

    ds = _rd().from_items(files)
    return grouped_agg(
        ds.map_batches(footer, batch_format="pandas"), ["layout"],
        {"n_groups": ("n_groups", "sum"),
         "n_skippable": ("n_skippable", "sum"),
         "skip_rows": ("skip_rows", "sum")}, num_buckets=2)


SQL_ZORDER_SKIP_STATS = f"""
WITH m AS (
  SELECT 'zorder' AS layout, row_group_id, row_group_num_rows,
         path_in_schema,
         CAST(stats_min_value AS BIGINT) AS mn,
         CAST(stats_max_value AS BIGINT) AS mx
  FROM parquet_metadata('{ZSKIP_CURRENT}/zorder.parquet')
  WHERE path_in_schema IN ('p_size', 'pb')
  UNION ALL
  SELECT 'natural', row_group_id, row_group_num_rows, path_in_schema,
         CAST(stats_min_value AS BIGINT),
         CAST(stats_max_value AS BIGINT)
  FROM parquet_metadata('{ZSKIP_CURRENT}/natural.parquet')
  WHERE path_in_schema IN ('p_size', 'pb')
), g AS (
  SELECT s.layout, s.row_group_id, s.row_group_num_rows,
         CASE WHEN s.mx < {ZSKIP_SIZE_LO} OR s.mn > {ZSKIP_SIZE_HI}
                OR b.mx < {ZSKIP_PB_LO} OR b.mn > {ZSKIP_PB_HI}
              THEN 1 ELSE 0 END AS skip
  FROM (SELECT * FROM m WHERE path_in_schema = 'p_size') s
  JOIN (SELECT * FROM m WHERE path_in_schema = 'pb') b
    ON b.layout = s.layout AND b.row_group_id = s.row_group_id
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(skip) AS BIGINT) AS n_skippable,
       CAST(SUM(skip * row_group_num_rows) AS BIGINT) AS skip_rows
FROM g GROUP BY 1
"""

NULL_CENSUS_TABLES = {
    "events": ["event_id", "ts", "user_id", "event_type", "value",
               "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
}


def q_null_census_tables(sf_dir: str):
    """Cross-TABLE completeness census — the data-quality dashboard's
    backbone: per (table, column), row count and null count, computed
    with zero-copy Arrow null_count per batch (no value scan beyond
    validity bitmaps) and one tiny combine across all four tables'
    partials. The audit every ingest run should publish before
    downstream jobs trust a column."""
    from ..functions.relational import grouped_agg

    partials = []
    for tname, cols in NULL_CENSUS_TABLES.items():
        ds = read_table(sf_dir, tname, columns=cols, num_blocks=4)

        def census(t: pa.Table, tname=tname) -> pa.Table:
            names, n_nulls = [], []
            for c in t.column_names:
                names.append(c)
                n_nulls.append(t[c].null_count)
            k = len(names)
            return pa.table({
                "tbl": pa.array([tname] * k),
                "col": pa.array(names),
                "n": pa.array([t.num_rows] * k, pa.int64()),
                "n_null": pa.array(n_nulls, pa.int64())})

        partials.append(ds.map_batches(census, batch_format="pyarrow"))

    allp = partials[0]
    for p in partials[1:]:
        allp = allp.union(p)
    return grouped_agg(allp, ["tbl", "col"],
                       {"n": ("n", "sum"), "n_null": ("n_null", "sum")},
                       num_buckets=2)


def _null_census_sql() -> str:
    parts = []
    for tname, cols in NULL_CENSUS_TABLES.items():
        for c in cols:
            parts.append(
                f"SELECT '{tname}' AS tbl, '{c}' AS col,\n"
                f"       CAST(COUNT(*) AS BIGINT) AS n,\n"
                f"       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null\n"
                f"FROM {tname}")
    return "\nUNION ALL\n".join(parts)


SQL_NULL_CENSUS_TABLES = _null_census_sql()

FORGET_ROOT = "/tmp/transmog_ray_forget"
FORGET_BUCKETS = 8
FORGET_EVERY = 30  # forget users with user_id % 30 == 0


def q_forget_users_run(sf_dir: str):
    """Right-to-be-forgotten DELETION over bucketed storage — the
    GDPR/CCPA erasure job: events are bucketed by hash(user) into 8
    partition files; a deletion pass rewrites ONLY the buckets that
    contain a to-forget user (here the deterministic user_id % 30 == 0
    set) and leaves every other partition file untouched — at 100 TB
    the difference between rewriting 8/1024 partitions and a full-table
    rewrite. Output: per bucket, rows before/after and whether it was
    rewritten; the base store is never mutated (the rewrite lands in a
    fresh run dir), so the job is idempotent."""
    import os

    import pyarrow.parquet as pq

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base_dir = f"{FORGET_ROOT}/{scale}/base"
    os.makedirs(base_dir, exist_ok=True)
    done = [f"{base_dir}/bucket-{b}.parquet"
            for b in range(FORGET_BUCKETS)]
    if not all(os.path.exists(p) for p in done):
        t = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["event_id", "user_id"])
        df = t.to_pandas()
        df = df[df["user_id"].notna()]
        df["user_id"] = df["user_id"].astype("int64")
        b_of = df["user_id"].to_numpy(np.int64) % FORGET_BUCKETS
        for b in range(FORGET_BUCKETS):
            part = df[b_of == b]
            tmp = done[b] + ".tmp"
            pq.write_table(pa.Table.from_pandas(
                part, preserve_index=False), tmp)
            os.replace(tmp, done[b])

    out_dir = f"{FORGET_ROOT}/{scale}/after"
    os.makedirs(out_dir, exist_ok=True)

    items = [{"b": b, "path": done[b],
              "out": f"{out_dir}/bucket-{b}.parquet"}
             for b in range(FORGET_BUCKETS)]

    def erase(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, path, out in zip(df["b"], df["path"], df["out"]):
            t = pq.read_table(path)
            uid = t["user_id"].to_numpy()
            doomed = (uid % FORGET_EVERY) == 0
            n_before = t.num_rows
            if n_before == 0:  # hash gap: SQL's GROUP BY has no row
                continue
            if doomed.any():
                kept = t.filter(pa.array(~doomed))
                tmp = out + ".tmp"
                pq.write_table(kept, tmp)
                os.replace(tmp, out)
                rows.append((int(b), n_before, kept.num_rows, 1))
            else:
                # untouched partition: no rewrite, no new file
                rows.append((int(b), n_before, n_before, 0))
        return pd.DataFrame(rows, columns=["bucket", "n_before",
                                           "n_after", "rewritten"])

    out = _rd().from_items(items).map_batches(
        erase, batch_format="pandas").to_pandas()
    return out.sort_values("bucket").reset_index(drop=True).astype(
        "int64")


SQL_FORGET_USERS_RUN = f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id FROM events
  WHERE user_id IS NOT NULL
), g AS (
  SELECT user_id % {FORGET_BUCKETS} AS bucket,
         COUNT(*) AS n_before,
         COUNT(*) FILTER (user_id % {FORGET_EVERY} <> 0) AS n_kept,
         COUNT(*) FILTER (user_id % {FORGET_EVERY} = 0) AS n_doomed
  FROM e GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_before AS BIGINT) AS n_before,
       CAST(CASE WHEN n_doomed > 0 THEN n_kept
                 ELSE n_before END AS BIGINT) AS n_after,
       CAST(CASE WHEN n_doomed > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS rewritten
FROM g
"""

ENC_ADVISOR_COLS = ["l_orderkey", "l_linenumber", "l_quantity"]


def q_encoding_advisor_lineitem(sf_dir: str):
    """Columnar ENCODING ADVISOR from exact stats — the decision a
    lakehouse writer makes per column: NDV (dictionary candidate),
    adjacent-equal run count in FILE order (RLE candidate), and the
    max bit width of adjacent deltas (delta-encoding candidate),
    folded into a deterministic recommendation (dict if ndv·20 ≤ n,
    else rle if runs·3 ≤ n, else delta if ≤ 12 bits, else plain).
    Runs/deltas scan one task per ROW GROUP with cross-group boundary
    stitching (the sortedness-audit shape); NDV is a (col, value)
    dedup exchange — exact here, swap for HLL at 100 TB. Oracle
    replays runs via LAG over file_row_number and bit widths via
    printf('%b')."""
    from ..functions.relational import grouped_agg
    from ..stages.partition import bucket_exchange

    fix_dir = _rowgroup_fixture(sf_dir)
    import pyarrow.parquet as pq

    path = f"{fix_dir}/unsorted.parquet"
    n_rg = pq.ParquetFile(path).metadata.num_row_groups
    items = [{"path": path, "col": c, "rg": g}
             for c in ENC_ADVISOR_COLS for g in range(n_rg)]

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path, col, g in zip(df["path"], df["col"], df["rg"]):
            v = (pq.ParquetFile(path).read_row_group(int(g),
                                                     columns=[col])
                 [col].to_numpy().astype(np.int64))
            d = np.abs(np.diff(v))
            breaks = int((d != 0).sum())
            nz = d[d > 0]
            bits = int(np.frexp(nz.astype(np.float64))[1].max()) \
                if len(nz) else 0
            rows.append((col, int(g), len(v), breaks, bits,
                         int(v[0]), int(v[-1])))
        return pd.DataFrame(rows, columns=["col", "rg", "n", "breaks",
                                           "bits", "first", "last"])

    parts = _rd().from_items(items).map_batches(
        scan, batch_format="pandas").to_pandas()

    # exact NDV: (col, value) dedup exchange → per-col counts
    vals = read_table(sf_dir, "lineitem", columns=ENC_ADVISOR_COLS,
                      num_blocks=8)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({
            "col": c, "v": np.unique(df[c].to_numpy(np.float64)
                                     .astype(np.int64))})
            for c in ENC_ADVISOR_COLS]
        return pd.concat(frames, ignore_index=True)

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["col", "v"])
        out = (u.groupby("col", sort=False).size().rename("ndv")
               .reset_index())
        out["ndv"] = out["ndv"].astype("int64")
        return out

    ndv = grouped_agg(
        bucket_exchange(vals.map_batches(explode, batch_format="pandas"),
                        ["col", "v"], count_distinct, num_buckets=8),
        ["col"], {"ndv": ("ndv", "sum")}, num_buckets=2).to_pandas()

    rows = []
    for col, g in parts.groupby("col", sort=False):
        g = g.sort_values("rg", kind="mergesort")
        boundary_d = np.abs(g["first"].to_numpy(np.int64)[1:]
                            - g["last"].to_numpy(np.int64)[:-1])
        breaks = int(g["breaks"].sum()) + int((boundary_d != 0).sum())
        nzb = boundary_d[boundary_d > 0]
        bbits = int(np.frexp(nzb.astype(np.float64))[1].max()) \
            if len(nzb) else 0
        n = int(g["n"].sum())
        bits = max(int(g["bits"].max()), bbits)
        n_runs = breaks + 1
        nd = int(ndv.loc[ndv["col"] == col, "ndv"].iloc[0])
        if nd * 20 <= n:
            rec = "dict"
        elif n_runs * 3 <= n:
            rec = "rle"
        elif bits <= 12:
            rec = "delta"
        else:
            rec = "plain"
        rows.append((col, n, nd, n_runs, bits, rec))
    return pd.DataFrame(rows, columns=["col", "n", "ndv", "n_runs",
                                       "max_delta_bits", "rec"]).astype(
        {"n": "int64", "ndv": "int64", "n_runs": "int64",
         "max_delta_bits": "int64"})


def _enc_advisor_sql() -> str:
    parts = []
    for c in ENC_ADVISOR_COLS:
        parts.append(f"""
SELECT '{c}' AS col, stats.n, stats.ndv, stats.n_runs,
       stats.max_delta_bits,
       CASE WHEN stats.ndv * 20 <= stats.n THEN 'dict'
            WHEN stats.n_runs * 3 <= stats.n THEN 'rle'
            WHEN stats.max_delta_bits <= 12 THEN 'delta'
            ELSE 'plain' END AS rec
FROM (
  WITH q AS (
    SELECT file_row_number AS i, CAST({c} AS BIGINT) AS v
    FROM read_parquet('{{CUR}}/unsorted.parquet', file_row_number=true)
  ), lagged AS (
    SELECT v, LAG(v) OVER (ORDER BY i) AS pv FROM q
  )
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
         CAST(1 + COUNT(*) FILTER (pv IS NOT NULL AND v <> pv)
              AS BIGINT) AS n_runs,
         CAST(COALESCE(MAX(CASE WHEN pv IS NOT NULL AND v <> pv
              THEN length(printf('%b', ABS(v - pv))) END), 0)
              AS BIGINT) AS max_delta_bits
  FROM lagged
) stats""")
    return "\nUNION ALL".join(parts).replace("{CUR}", ROWGROUP_CURRENT)


SQL_ENCODING_ADVISOR_LINEITEM = _enc_advisor_sql()


def q_minhash_retract_incremental(sf_dir: str):
    """DECREMENTAL near-dup maintenance (functions/neardup.py
    ``minhash_retract``): ingest the corpus, then right-to-be-forgotten
    retract doc_id % 10 == 3 — tombstones filter the cumulative edge
    set at label time and mask future candidate generation; nothing is
    re-signed or re-verified. Equality with a fresh batch run over the
    survivors (and with retract/ingest interleavings) is pinned by
    tests; rows-only here like the other signature-keyed minhash
    entries."""
    import tempfile

    from ..functions.neardup import minhash_ingest, minhash_retract

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      num_blocks=8).materialize()
    survivors = docs.map_batches(
        lambda df: df[df["doc_id"] % 10 != 3], batch_format="pandas")
    forget = docs.map_batches(
        lambda df: df.loc[df["doc_id"] % 10 == 3, ["doc_id"]],
        batch_format="pandas").to_pandas()["doc_id"].tolist()
    cache = tempfile.mkdtemp(prefix="mh_retract_", dir="/tmp")
    kw = dict(n_perm=32, n_bands=8, jaccard_threshold=0.8,
              num_buckets=16)
    minhash_ingest(cache, docs, docs, **kw)
    return minhash_retract(cache, forget, survivors, **kw)


QUERIES = {
    "nation_trade_volume": q_nation_trade_volume,
    "curate_pages": q_curate_pages,
    "html_byte_stats": q_html_byte_stats,
    "hash_collision_stats": q_hash_collision_stats,
    "activity_streaks": q_activity_streaks,
    "value_gini_orders": q_value_gini_orders,
    "expanding_z_events": q_expanding_z_events,
    "hierarchical_median_lengths": q_hierarchical_median_lengths,
    "contract_violations_events": q_contract_violations_events,
    "top_prices_with_ties": q_top_prices_with_ties,
    "top_parts_share_nation": q_top_parts_share_nation,
    "range_join_streaming": q_range_join_streaming,
    "hits_scores": q_hits_scores,
    "loo_target_encode": q_loo_target_encode,
    "churned_users": q_churned_users,
    "salient_dims": q_salient_dims,
    "domain_staleness": q_domain_staleness,
    "rolling_corr7_types": q_rolling_corr7_types,
    "repeat_purchase_parts": q_repeat_purchase_parts,
    "part_supplier_hhi": q_part_supplier_hhi,
    "greedy_policy_replay": q_greedy_policy_replay,
    "bloom_fp_audit": q_bloom_fp_audit,
    "proportional_split_docs": q_proportional_split_docs,
    "label_centroid_sums": q_label_centroid_sums,
    "crawl_budget_allocation": q_crawl_budget_allocation,
    "conversion_delay_quartiles": q_conversion_delay_quartiles,
    "theta_sketch_types": q_theta_sketch_types,
    "fd_violations": q_fd_violations,
    "out_of_order_stats": q_out_of_order_stats,
    "unconverted_events": q_unconverted_events,
    "lang_profile_dots": q_lang_profile_dots,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "clamped_balance_users": q_clamped_balance_users,
    "throttled_events": q_throttled_events,
    "knn_confusion": q_knn_confusion,
    "degree_assortativity": q_degree_assortativity,
    "trimmed_mean_segments": q_trimmed_mean_segments,
    "followed_pairs": q_followed_pairs,
    "wau_daily": q_wau_daily,
    "join_size_by_type": q_join_size_by_type,
    "trigram_diversity_docs": q_trigram_diversity_docs,
    "market_share_promo": q_market_share,
    "order_count_hist": q_order_count_hist,
    "waiting_suppliers": q_waiting_suppliers,
    "dormant_rich_customers": q_dormant_rich_customers,
    "inlink_stats": q_inlink_stats,
    "length_batches_docs": q_length_batches_docs,
    "minhash_dedup_incremental": q_minhash_dedup_incremental,
    "value_extremes_daily": q_value_extremes_daily,
    "user_lifespan_stats": q_user_lifespan_stats,
    "weekend_share_types": q_weekend_share_types,
    "top_count_swings": q_top_count_swings,
    "gap_quartiles_types": q_gap_quartiles_types,
    "next_type_recs": q_next_type_recs,
    "domain_bytes": q_domain_bytes,
    "twap_users": q_twap_users,
    "domain_lang_gini": q_domain_lang_gini,
    "type_coverage_masks": q_type_coverage_masks,
    "sentence_stats_docs": q_sentence_stats_docs,
    "bucket_skew_report": q_bucket_skew_report,
    "region_priority_grid": q_region_priority_grid,
    "q6_revenue": q_q6_revenue,
    "value_bins_types": q_value_bins_types,
    "fulfillment_latency_hist": q_fulfillment_latency_hist,
    "onboarding_paths": q_onboarding_paths,
    "snapshots_per_url_hist": q_snapshots_per_url_hist,
    "session_length_hist": q_session_length_hist,
    "multi_grain_counts": q_multi_grain_counts,
    "crosscorr_types": q_crosscorr_types,
    "front_coding_savings": q_front_coding_savings,
    "term_positions": q_term_positions,
    "day_churn_overlap": q_day_churn_overlap,
    "price_dispersion_parts": q_price_dispersion_parts,
    "novel_edges_daily": q_novel_edges_daily,
    "domain_dup_content": q_domain_dup_content,
    "unchanged_streaks": q_unchanged_streaks,
    "url_templates": q_url_templates,
    "max_rate_users": q_max_rate_users,
    "props_k_stats": q_props_k_stats,
    "domain_degrees": q_domain_degrees,
    "link_locality_pages": q_link_locality_pages,
    "politeness_violations": q_politeness_violations,
    "link_domain_edges": q_link_domain_edges,
    "dangling_links": q_dangling_links,
    "user_retention_curve": q_user_retention_curve,
    "active_time_users": q_active_time_users,
    "spearman_types": q_spearman_types,
    "pps_sample_docs": q_pps_sample_docs,
    "rolling_max_events": q_rolling_max_events,
    "length_clusters_docs": q_length_clusters_docs,
    "nation_share_region": q_nation_share_region,
    "revenue_concentration": q_revenue_concentration,
    "log_length_histogram": q_log_length_histogram,
    "quantile_norm_lengths": q_quantile_norm_lengths,
    "negsample_weights": q_negsample_weights,
    "k_anonymity_docs": q_k_anonymity_docs,
    "copurchase_parts": q_copurchase_parts,
    "autocorr7_types": q_autocorr7_types,
    "partitioned_docs": q_partitioned_docs,
    "inter_session_gaps": q_inter_session_gaps,
    "corpus_card": q_corpus_card,
    "top_paths_3": q_top_paths_3,
    "time_to_value_users": q_time_to_value_users,
    "url_shape_domains": q_url_shape_domains,
    "distinctive_terms": q_distinctive_terms,
    "returning_users_daily": q_returning_users_daily,
    "changepoint_types": q_changepoint_types,
    "rfm_customers": q_rfm_customers,
    "dense_daily_counts": q_dense_daily_counts,
    "ttr_langs": q_ttr_langs,
    "abc_parts": q_abc_parts,
    "novel_bigrams_daily": q_novel_bigrams_daily,
    "tld_stats": q_tld_stats,
    "snapshot_char_drift": q_snapshot_char_drift,
    "length_gini_sources": q_length_gini_sources,
    "peak_hour_types": q_peak_hour_types,
    "oov_rate_docs": q_oov_rate_docs,
    "burst_windows": q_burst_windows,
    "cdc_chunks_docs": q_cdc_chunks_docs,
    "ma_crossover_events": q_ma_crossover_events,
    "event_runs": q_event_runs,
    "trending_types": q_trending_types,
    "split_leakage_docs": q_split_leakage_docs,
    "vocab_ids": q_vocab_ids,
    "sliding_distinct_types": q_sliding_distinct_types,
    "dwell_by_type": q_dwell_by_type,
    "decayed_user_activity": q_decayed_user_activity,
    "crawl_schedule": q_crawl_schedule,
    "coverage_docs": q_coverage_docs,
    "bfs_levels_suppliers": q_bfs_levels_suppliers,
    "overdue_pages": q_overdue_pages,
    "shard_moves": q_shard_moves,
    "bigram_lm_docs": q_bigram_lm_docs,
    "kappa_docs": q_kappa_docs,
    "ab_test_events": q_ab_test_events,
    "ppjoin_docs": q_ppjoin_docs,
    "clustering_coeff": q_clustering_coeff,
    "two_hop_suppliers": q_two_hop_suppliers,
    "vocab_growth_docs": q_vocab_growth_docs,
    "hapax_docs": q_hapax_docs,
    "ks_drift_events": q_ks_drift_events,
    "benford_orders": q_benford_orders,
    "golden_page_record": q_golden_page_record,
    "tag_pairs_pages": q_tag_pairs_pages,
    "ohlc_daily": q_ohlc_daily,
    "snapshot_recall_pages": q_snapshot_recall_pages,
    "chi2_lang_source": q_chi2_lang_source,
    "kwic_docs": q_kwic_docs,
    "bpe_pairs_docs": q_bpe_pairs_docs,
    "inverted_index_docs": q_inverted_index_docs,
    "boolean_search_docs": q_boolean_search_docs,
    "media_features": q_media_features,
    "audio_features": q_audio_features,
    "video_frame_plan": q_video_frame_plan,
    "rows_window_events": q_rows_window_events,
    "triangle_suppliers": q_triangle_suppliers,
    "profile_orders": q_profile_orders,
    "big_orders": q_big_orders,
    "pages_features": q_pages_features,
    "pages_features_tagged": q_pages_features_tagged,
    "minhash_dedup": q_minhash_dedup,
    "simhash_neardup": q_simhash_neardup,
    "cosine_clusters": q_cosine_clusters,
    "curate_docs": q_curate_docs,
    "pages_features_incremental": q_pages_features_incremental,
    "asof_purchase_streaming": q_asof_purchase_streaming,
    "ewma_events": q_ewma_events,
    "gopher_docs": q_gopher_docs,
    "running_quantity": q_running_quantity,
    "block_spans_docs": q_block_spans_docs,
    "retention_pages": q_retention_pages,
    "robots_filtered_pages": q_robots_filtered_pages,
    "semdedup_embeddings": q_semdedup_embeddings,
    "mixture_plan": q_mixture_plan,
    "packed_docs": q_packed_docs,
    "quantized_embeddings": q_quantized_embeddings,
    "rank_events": q_rank_events,
    "temporal_split_events": q_temporal_split_events,
    "token_stats": q_token_stats,
    "training_shards": q_training_shards,
    "user_event_paths": q_user_event_paths,
    "user_folds": q_user_folds,
    "user_split": q_user_split,
    "weighted_sample_docs": q_weighted_sample_docs,
    "approx_distinct_users": q_approx_distinct_users,
    "bm25_docs": q_bm25_docs,
    "dedup_docs": q_dedup_docs,
    "filter_high_value": q_filter_high_value,
    "fingerprint_docs": q_fingerprint_docs,
    "first_touch_events": q_first_touch_events,
    "hashed_terms_docs": q_hashed_terms_docs,
    "lag_lead_events": q_lag_lead_events,
    "page_changes": q_page_changes,
    "pii_redacted_docs": q_pii_redacted_docs,
    "quality_docs": q_quality_docs,
    "recrawl_cadence": q_recrawl_cadence,
    "reservoir_docs": q_reservoir_docs,
    "running_events": q_running_events,
    "sample_docs": q_sample_docs,
    "sessionize_events": q_sessionize_events,
    "simhash_docs": q_simhash_docs,
    "stratified_docs": q_stratified_docs,
    "target_encode_events": q_target_encode_events,
    "backfill_events": q_backfill_events,
    "distinct_sources": q_distinct_langs,
    "domain_stats": q_domain_stats,
    "global_rank_docs": q_global_rank_docs,
    "novelty_events": q_novelty_events,
    "repetition_docs": q_repetition_docs,
    "rolling_events": q_rolling_events,
    "scaled_docs": q_scaled_docs,
    "session_funnel": q_session_funnel,
    "session_summary": q_session_summary,
    "user_event_types": q_user_event_types,
    "ann_topk": q_ann_topk,
    "bloom_urgent_lineitems": q_bloom_urgent_lineitems,
    "centroid_assign": q_centroid_assign,
    "histogram_chars": q_histogram_chars,
    "line_filtered_docs": q_line_filtered_docs,
    "price_quantiles": q_price_quantiles,
    "pricing_summary": q_pricing_summary,
    "suppliers_by_region": q_suppliers_by_region,
    "asof_purchase": q_asof_purchase,
    "contamination_docs": q_contamination_docs,
    "cosine_pairs": q_cosine_pairs,
    "dedup_user_type": q_dedup_user_type,
    "length_filtered_docs": q_length_filtered_docs,
    "lsh_ann": q_lsh_ann,
    "asof_next_purchase": q_asof_next_purchase,
    "asof_purchase_tol": q_asof_purchase_tol,
    "customer_order_quantiles": q_customer_order_quantiles,
    "events_by_type": q_events_by_type,
    "flatten_events": q_flatten_events,
    "heavy_users": q_heavy_users,
    "jaccard_pairs": q_jaccard_pairs,
    "pivot_events": q_pivot_events,
    "promo_revenue": q_promo_revenue,
    "top_terms": q_top_terms,
    "ivf_ann": q_ivf_ann,
    "late_orders": q_late_orders,
    "line_dedup_docs": q_line_dedup_docs,
    "union_lang_counts": q_union_lang_counts,
    "corr_quantity_price": q_corr_quantity_price,
    "hopping_events": q_hopping_events,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "tumbling_hourly": q_tumbling_hourly,
    "dup_ngram_docs": q_dup_ngram_docs,
    "except_users": q_except_users,
    "intersect_users": q_intersect_users,
    "kmeans_embeddings": q_kmeans_embeddings,
    "range_join_events": q_range_join_events,
    "user_top_type": q_user_top_type,
    "pagerank_trade": q_pagerank_trade,
    "semi_anti_purchasers": q_semi_anti_purchasers,
    "bpe_token_docs": q_bpe_token_docs,
    "cube_pricing": q_cube_pricing,
    "langid_docs": q_langid_docs,
    "orders_by_month": q_orders_by_month,
    "revenue_by_nation": q_revenue_by_nation,
    "rollup_pricing": q_rollup_pricing,
    "top_customers": q_top_customers,
    "customer_order_counts": q_customer_order_counts,
    "salted_revenue": q_salted_revenue,
    "tfidf_docs": q_tfidf_docs,
    "events_orders_outer": q_events_orders_outer,
    "shipping_priority": q_shipping_priority,
    "user_top_events": q_user_top_events,
    "returned_revenue": q_returned_revenue,
    "resampled_events": q_resampled_events,
    "unpivot_pricing": q_unpivot_pricing,
    "skew_join_orders": q_skew_join_orders,
    "boilerplate_docs": q_boilerplate_docs,
    "sessionize_streaming": q_sessionize_streaming,
    "exact_price_quantiles": q_exact_price_quantiles,
    "mad_outlier_events": q_mad_outlier_events,
    "collocations_docs": q_collocations_docs,
    "pit_features_multi": q_pit_features_multi,
    "weighted_avg_discount": q_weighted_avg_discount,
    "upsert_user_state": q_upsert_user_state,
    "fixed_n_per_lang": q_fixed_n_per_lang,
    "domain_capped_pages": q_domain_capped_pages,
    "decontam_exact_docs": q_decontam_exact_docs,
    "transition_counts": q_transition_counts,
    "lang_length_quantiles": q_lang_length_quantiles,
    "systematic_sample_events": q_systematic_sample_events,
    "table_diff_orders": q_table_diff_orders,
    "winsorized_events": q_winsorized_events,
    "scd2_user_tier": q_scd2_user_tier,
    "chunked_docs": q_chunked_docs,
    "weighted_price_quantiles": q_weighted_price_quantiles,
    "typo_pairs_docs": q_typo_pairs_docs,
    "dup_span_docs": q_dup_span_docs,
    "incremental_event_totals": q_incremental_event_totals,
    "linear_score_docs": q_linear_score_docs,
    "epoch_order_docs": q_epoch_order_docs,
    "canonical_urls": q_canonical_urls,
    "user_type_gini": q_user_type_gini,
    "neighbor_pairs_docs": q_neighbor_pairs_docs,
    "assoc_rules_sessions": q_assoc_rules_sessions,
    "skyline_lineitems": q_skyline_lineitems,
    "audit_orders": q_audit_orders,
    "cohort_retention": q_cohort_retention,
    "token_budget_docs": q_token_budget_docs,
    "winnow_docs": q_winnow_docs,
    "projected_embeddings": q_projected_embeddings,
    "peak_concurrency": q_peak_concurrency,
    "trend_per_customer": q_trend_per_customer,
    "rrf_docs": q_rrf_docs,
    "join_delta_orders": q_join_delta_orders,
    "grid_clusters": q_grid_clusters,
    "cms_user_counts": q_cms_user_counts,
    "seasonal_backtest": q_seasonal_backtest,
    "attribution_events": q_attribution_events,
    "temperature_mix_docs": q_temperature_mix_docs,
    "t5_spans_docs": q_t5_spans_docs,
    "order_value_share": q_order_value_share,
    "order_gap_stats": q_order_gap_stats,
    "token_fertility_langs": q_token_fertility_langs,
    "early_activity_profile": q_early_activity_profile,
    "local_supplier_revenue": q_local_supplier_revenue,
    "q16_part_suppliers": q_q16_part_suppliers,
    "session_handoff_matrix": q_session_handoff_matrix,
    "priority_mix_drift": q_priority_mix_drift,
    "nations_trade_flow": q_nations_trade_flow,
    "part_type_margin": q_part_type_margin,
    "important_parts": q_important_parts,
    "top_supplier_revenue": q_top_supplier_revenue,
    "small_qty_revenue": q_small_qty_revenue,
    "ored_brand_revenue": q_ored_brand_revenue,
    "sales_opportunity": q_sales_opportunity,
    "type_lift_pairs": q_type_lift_pairs,
    "cheapest_two_hop": q_cheapest_two_hop,
    "label_inertia": q_label_inertia,
    "order_total_reconciliation": q_order_total_reconciliation,
    "decile_revenue_share": q_decile_revenue_share,
    "zorder_parts": q_zorder_parts,
    "tf_cosine_pairs_docs": q_tf_cosine_pairs_docs,
    "rle_runs_events": q_rle_runs_events,
    "order_line_signature": q_order_line_signature,
    "bpe_train_docs": q_bpe_train_docs,
    "busday_latency_orders": q_busday_latency_orders,
    "typo_clusters_docs": q_typo_clusters_docs,
    "core3_parts": q_core3_parts,
    "bounce_rate_sessions": q_bounce_rate_sessions,
    "cont_price_quantiles": q_cont_price_quantiles,
    "union_schema_read": q_union_schema_read,
    "cdc_join_delta": q_cdc_join_delta,
    "division_customers": q_division_customers,
    "stump_split_events": q_stump_split_events,
    "price_gcd_brand": q_price_gcd_brand,
    "tukey_outliers_langs": q_tukey_outliers_langs,
    "stock_span_daily": q_stock_span_daily,
    "content_fingerprint_langs": q_content_fingerprint_langs,
    "rowgroup_skip_stats": q_rowgroup_skip_stats,
    "column_compression_stats": q_column_compression_stats,
    "gram_matrix_embeddings": q_gram_matrix_embeddings,
    "frequent_triples_parts": q_frequent_triples_parts,
    "bitmap_distinct_users": q_bitmap_distinct_users,
    "merge_join_segments": q_merge_join_segments,
    "compaction_plan": q_compaction_plan,
    "iso_week_revenue": q_iso_week_revenue,
    "quarantine_parse_docs": q_quarantine_parse_docs,
    "auto_join_types": q_auto_join_types,
    "mannwhitney_langs": q_mannwhitney_langs,
    "survival_table_users": q_survival_table_users,
    "image_thumbnail_stats": q_image_thumbnail_stats,
    "wav_energy_stats": q_wav_energy_stats,
    "emd_langs": q_emd_langs,
    "hist_intersection_langs": q_hist_intersection_langs,
    "isotonic_daily": q_isotonic_daily,
    "session_threshold_sweep": q_session_threshold_sweep,
    "mirror_detection_pages": q_mirror_detection_pages,
    "crawl_fairness_daily": q_crawl_fairness_daily,
    "overlapping_shipments": q_overlapping_shipments,
    "max_drawdown_users": q_max_drawdown_users,
    "holt_forecast_types": q_holt_forecast_types,
    "pr_curve_docs": q_pr_curve_docs,
    "ams_f2_events": q_ams_f2_events,
    "curriculum_phases_docs": q_curriculum_phases_docs,
    "contrastive_pairs_docs": q_contrastive_pairs_docs,
    "fano_daily_types": q_fano_daily_types,
    "gate_parity_langs": q_gate_parity_langs,
    "pre_post_types": q_pre_post_types,
    "duplicate_titles_pages": q_duplicate_titles_pages,
    "session_entry_exit": q_session_entry_exit,
    "reject_reasons_docs": q_reject_reasons_docs,
    "posting_gap_bits": q_posting_gap_bits,
    "hourweek_heatmap_events": q_hourweek_heatmap_events,
    "char_class_langs": q_char_class_langs,
    "mlm_mask_plan_docs": q_mlm_mask_plan_docs,
    "readability_docs": q_readability_docs,
    "auc_scorer_docs": q_auc_scorer_docs,
    "media_type_census": q_media_type_census,
    "nofollow_share_domains": q_nofollow_share_domains,
    "graph_walks_pages": q_graph_walks_pages,
    "containment_pairs_docs": q_containment_pairs_docs,
    "calibration_bins_docs": q_calibration_bins_docs,
    "meta_key_census_pages": q_meta_key_census_pages,
    "silence_runs_audio": q_silence_runs_audio,
    "ahash_groups_images": q_ahash_groups_images,
    "rolling_median_events": q_rolling_median_events,
    "zero_crossings_audio": q_zero_crossings_audio,
    "dup_weight_docs": q_dup_weight_docs,
    "orphan_keys_audit": q_orphan_keys_audit,
    "timed_funnel_events": q_timed_funnel_events,
    "bollinger_breakouts": q_bollinger_breakouts,
    "sortedness_audit": q_sortedness_audit,
    "jsonl_gz_events": q_jsonl_gz_events,
    "debounced_events": q_debounced_events,
    "negative_edges_pages": q_negative_edges_pages,
    "theilsen_trend_parts": q_theilsen_trend_parts,
    "max_gain_users": q_max_gain_users,
    "edge_support_suppliers": q_edge_support_suppliers,
    "wl_hash_suppliers": q_wl_hash_suppliers,
    "decay_attribution_events": q_decay_attribution_events,
    "bitemporal_asof_events": q_bitemporal_asof_events,
    "dhash_groups_images": q_dhash_groups_images,
    "importance_weights_langs": q_importance_weights_langs,
    "pushdown_read_lineitem": q_pushdown_read_lineitem,
    "ahash_neardup_images": q_ahash_neardup_images,
    "fallback_asof_events": q_fallback_asof_events,
    "join_cardinality_estimate": q_join_cardinality_estimate,
    "kmv_sketch_users": q_kmv_sketch_users,
    "dod_bits_users": q_dod_bits_users,
    "rendezvous_shards_pages": q_rendezvous_shards_pages,
    "bucketed_join_orders": q_bucketed_join_orders,
    "knn_graph_int8": q_knn_graph_int8,
    "l_diversity_docs": q_l_diversity_docs,
    "rbo_rankings_docs": q_rbo_rankings_docs,
    "value_drift_types": q_value_drift_types,
    "cohort_ltv_users": q_cohort_ltv_users,
    "warc_domain_census": q_warc_domain_census,
    "warc_token_stats": q_warc_token_stats,
    "boruvka_round_parts": q_boruvka_round_parts,
    "bootstrap_means_events": q_bootstrap_means_events,
    "funnel_distance_users": q_funnel_distance_users,
    "zorder_skip_stats": q_zorder_skip_stats,
    "null_census_tables": q_null_census_tables,
    "forget_users_run": q_forget_users_run,
    "encoding_advisor_lineitem": q_encoding_advisor_lineitem,
    "minhash_retract_incremental": q_minhash_retract_incremental,
}

# Driver-visible ordering: the correctness driver samples the FIRST 50
# registry entries, so the load-bearing queries (flagship flatten+as-of
# family, the media family with its r1-r3 red history, the near-dup
# family, core window/relational operators, ANN) must lead the registry.
# Newer behavioral/web queries keep their relative order after them.
# (VERDICT r4 next-round item 1.)
_PRIORITY_ORDER = [
    "pages_features",
    "pages_features_tagged",
    "pages_features_incremental",
    "media_features",
    "audio_features",
    "video_frame_plan",
    "flatten_events",
    "minhash_dedup",
    "simhash_neardup",
    "simhash_docs",
    "cosine_clusters",
    "jaccard_pairs",
    "ngram_jaccard_pairs",
    "dup_ngram_docs",
    "semdedup_embeddings",
    "asof_purchase",
    "asof_purchase_tol",
    "asof_next_purchase",
    "asof_purchase_streaming",
    "pit_features_multi",
    "lag_lead_events",
    "sessionize_events",
    "sessionize_streaming",
    "backfill_events",
    "rolling_events",
    "running_events",
    "rows_window_events",
    "tumbling_hourly",
    "hopping_events",
    "ewma_events",
    "rank_events",
    "pricing_summary",
    "revenue_by_nation",
    "dedup_user_type",
    "dedup_docs",
    "salted_revenue",
    "skew_join_orders",
    "exact_price_quantiles",
    "heavy_users",
    "suppliers_by_region",
    "top_customers",
    "promo_revenue",
    "late_orders",
    "ann_topk",
    "lsh_ann",
    "ivf_ann",
    "kmeans_embeddings",
    "token_stats",
    "quality_docs",
    "curate_docs",
    # below position 50 but still operator-core — keep near the front so
    # partial sweeps reach them early
    "upsert_user_state",
    "pagerank_trade",
    "langid_docs",
    "line_dedup_docs",
    "contamination_docs",
    "decontam_exact_docs",
    "gopher_docs",
    "centroid_assign",
    "quantized_embeddings",
    "ppjoin_docs",
    "typo_pairs_docs",
    "dup_span_docs",
    "partitioned_docs",
]
_missing = [n for n in _PRIORITY_ORDER if n not in QUERIES]
if _missing:  # pragma: no cover - import-time typo guard
    raise RuntimeError(f"_PRIORITY_ORDER names absent from QUERIES: {_missing}")
QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY_ORDER},
    **{k: v for k, v in QUERIES.items() if k not in set(_PRIORITY_ORDER)},
}

ORACLE_SQL = {
    "nation_trade_volume": SQL_NATION_TRADE_VOLUME,
    "curate_pages": SQL_CURATE_PAGES,
    "html_byte_stats": SQL_HTML_BYTE_STATS,
    "hash_collision_stats": SQL_HASH_COLLISION_STATS,
    "activity_streaks": SQL_ACTIVITY_STREAKS,
    "value_gini_orders": SQL_VALUE_GINI_ORDERS,
    "expanding_z_events": SQL_EXPANDING_Z,
    "hierarchical_median_lengths": SQL_HIERARCHICAL_MEDIAN,
    "contract_violations_events": SQL_CONTRACT_VIOLATIONS,
    "top_prices_with_ties": SQL_TOP_PRICES_WITH_TIES,
    "top_parts_share_nation": SQL_TOP_PARTS_SHARE_NATION,
    "range_join_streaming": SQL_RANGE_JOIN,
    "hits_scores": SQL_HITS_SCORES,
    "loo_target_encode": SQL_LOO_TARGET_ENCODE,
    "churned_users": SQL_CHURNED_USERS,
    "salient_dims": SQL_SALIENT_DIMS,
    "domain_staleness": SQL_DOMAIN_STALENESS,
    "rolling_corr7_types": SQL_ROLLING_CORR7,
    "repeat_purchase_parts": SQL_REPEAT_PURCHASE,
    "part_supplier_hhi": SQL_PART_SUPPLIER_HHI,
    "greedy_policy_replay": SQL_GREEDY_POLICY_REPLAY,
    "bloom_fp_audit": SQL_BLOOM_FP_AUDIT,
    "proportional_split_docs": SQL_PROPORTIONAL_SPLIT,
    "label_centroid_sums": SQL_LABEL_CENTROID_SUMS,
    "crawl_budget_allocation": SQL_CRAWL_BUDGET,
    "conversion_delay_quartiles": SQL_CONVERSION_DELAY,
    "theta_sketch_types": SQL_THETA_SKETCH,
    "fd_violations": SQL_FD_VIOLATIONS,
    "out_of_order_stats": SQL_OUT_OF_ORDER,
    "unconverted_events": SQL_UNCONVERTED_EVENTS,
    "lang_profile_dots": SQL_LANG_PROFILE_DOTS,
    "cheapest_supplier_per_part": SQL_CHEAPEST_SUPPLIER,
    "clamped_balance_users": SQL_CLAMPED_BALANCE,
    "throttled_events": SQL_THROTTLED_EVENTS,
    "knn_confusion": SQL_KNN_CONFUSION,
    "degree_assortativity": SQL_DEGREE_ASSORT,
    "trimmed_mean_segments": SQL_TRIMMED_MEAN_SEGMENTS,
    "followed_pairs": SQL_FOLLOWED_PAIRS,
    "wau_daily": SQL_WAU_DAILY,
    "join_size_by_type": SQL_JOIN_SIZE_BY_TYPE,
    "trigram_diversity_docs": SQL_TRIGRAM_DIVERSITY,
    "market_share_promo": SQL_MARKET_SHARE,
    "order_count_hist": SQL_ORDER_COUNT_HIST,
    "waiting_suppliers": SQL_WAITING_SUPPLIERS,
    "dormant_rich_customers": SQL_DORMANT_RICH,
    "inlink_stats": SQL_INLINK_STATS,
    "length_batches_docs": SQL_LENGTH_BATCHES,
    "value_extremes_daily": SQL_VALUE_EXTREMES_DAILY,
    "user_lifespan_stats": SQL_USER_LIFESPAN,
    "weekend_share_types": SQL_WEEKEND_SHARE,
    "top_count_swings": SQL_TOP_COUNT_SWINGS,
    "gap_quartiles_types": SQL_GAP_QUARTILES,
    "next_type_recs": SQL_NEXT_TYPE_RECS,
    "domain_bytes": SQL_DOMAIN_BYTES,
    "twap_users": SQL_TWAP_USERS,
    "domain_lang_gini": SQL_DOMAIN_LANG_GINI,
    "type_coverage_masks": SQL_TYPE_COVERAGE_MASKS,
    "sentence_stats_docs": SQL_SENTENCE_STATS,
    "bucket_skew_report": SQL_BUCKET_SKEW,
    "region_priority_grid": SQL_REGION_PRIORITY_GRID,
    "q6_revenue": SQL_Q6_REVENUE,
    "value_bins_types": SQL_VALUE_BINS,
    "fulfillment_latency_hist": SQL_FULFILLMENT_LATENCY,
    "onboarding_paths": SQL_ONBOARDING_PATHS,
    "snapshots_per_url_hist": SQL_SNAPSHOTS_PER_URL,
    "session_length_hist": SQL_SESSION_LENGTH_HIST,
    "multi_grain_counts": SQL_MULTI_GRAIN,
    "crosscorr_types": SQL_CROSSCORR_TYPES,
    "front_coding_savings": SQL_FRONT_CODING,
    "term_positions": SQL_TERM_POSITIONS,
    "day_churn_overlap": SQL_DAY_CHURN_OVERLAP,
    "price_dispersion_parts": SQL_PRICE_DISPERSION,
    "novel_edges_daily": SQL_NOVEL_EDGES_DAILY,
    "domain_dup_content": SQL_DOMAIN_DUP_CONTENT,
    "unchanged_streaks": SQL_UNCHANGED_STREAKS,
    "url_templates": SQL_URL_TEMPLATES,
    "max_rate_users": SQL_MAX_RATE_USERS,
    "props_k_stats": SQL_PROPS_K_STATS,
    "domain_degrees": SQL_DOMAIN_DEGREES,
    "link_locality_pages": SQL_LINK_LOCALITY,
    "politeness_violations": SQL_POLITENESS,
    "link_domain_edges": SQL_LINK_DOMAIN_EDGES,
    "dangling_links": SQL_DANGLING_LINKS,
    "user_retention_curve": SQL_USER_RETENTION_CURVE,
    "active_time_users": SQL_ACTIVE_TIME,
    "spearman_types": SQL_SPEARMAN_TYPES,
    "pps_sample_docs": SQL_PPS_SAMPLE,
    "rolling_max_events": SQL_ROLLING_MAX,
    "length_clusters_docs": SQL_LENGTH_CLUSTERS,
    "nation_share_region": SQL_NATION_SHARE_REGION,
    "revenue_concentration": SQL_REVENUE_CONCENTRATION,
    "log_length_histogram": SQL_LOG_LENGTH_HISTOGRAM,
    "quantile_norm_lengths": SQL_QUANTILE_NORM,
    "negsample_weights": SQL_NEGSAMPLE_WEIGHTS,
    "k_anonymity_docs": SQL_K_ANONYMITY,
    "copurchase_parts": SQL_COPURCHASE_PARTS,
    "autocorr7_types": SQL_AUTOCORR7_TYPES,
    "partitioned_docs": SQL_PARTITIONED_DOCS,
    "inter_session_gaps": SQL_INTER_SESSION_GAPS,
    "corpus_card": SQL_CORPUS_CARD,
    "top_paths_3": SQL_TOP_PATHS_3,
    "time_to_value_users": SQL_TIME_TO_VALUE,
    "url_shape_domains": SQL_URL_SHAPE,
    "distinctive_terms": SQL_DISTINCTIVE_TERMS,
    "returning_users_daily": SQL_RETURNING_USERS,
    "changepoint_types": SQL_CHANGEPOINT_TYPES,
    "rfm_customers": SQL_RFM_CUSTOMERS,
    "dense_daily_counts": SQL_DENSE_DAILY,
    "ttr_langs": SQL_TTR_LANGS,
    "abc_parts": SQL_ABC_PARTS,
    "novel_bigrams_daily": SQL_NOVEL_BIGRAMS,
    "tld_stats": SQL_TLD_STATS,
    "snapshot_char_drift": SQL_SNAPSHOT_CHAR_DRIFT,
    "length_gini_sources": SQL_LENGTH_GINI,
    "peak_hour_types": SQL_PEAK_HOUR_TYPES,
    "oov_rate_docs": SQL_OOV_RATE,
    "burst_windows": SQL_BURST_WINDOWS,
    "cdc_chunks_docs": SQL_CDC_CHUNKS,
    "ma_crossover_events": SQL_MA_CROSSOVER,
    "event_runs": SQL_EVENT_RUNS,
    "trending_types": SQL_TRENDING_TYPES,
    "split_leakage_docs": SQL_SPLIT_LEAKAGE,
    "vocab_ids": SQL_VOCAB_IDS,
    "sliding_distinct_types": SQL_SLIDING_DISTINCT,
    "dwell_by_type": SQL_DWELL_BY_TYPE,
    "decayed_user_activity": SQL_DECAYED_ACTIVITY,
    "crawl_schedule": SQL_CRAWL_SCHEDULE,
    "pricing_summary": SQL_PRICING,
    "rollup_pricing": SQL_ROLLUP_PRICING,
    "cube_pricing": SQL_CUBE_PRICING,
    "user_top_type": SQL_USER_TOP_TYPE,
    "suppliers_by_region": SQL_SUPPLIERS_BY_REGION,
    "revenue_by_nation": SQL_REVENUE_NATION,
    "promo_revenue": SQL_PROMO_REVENUE,
    "late_orders": SQL_LATE_ORDERS,
    "top_customers": SQL_TOP_CUSTOMERS,
    "filter_high_value": SQL_FILTER_HIGH_VALUE,
    "events_by_type": SQL_EVENTS_BY_TYPE,
    "salted_revenue": SQL_SALTED_REVENUE,
    "distinct_sources": SQL_DISTINCT_LANGS,
    "orders_by_month": SQL_ORDERS_BY_MONTH,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "media_features": SQL_MEDIA_FEATURES,
    "audio_features": SQL_AUDIO_FEATURES,
    "video_frame_plan": SQL_VIDEO_FRAME_PLAN,
    "rows_window_events": SQL_ROWS_WINDOW,
    "triangle_suppliers": SQL_TRIANGLE_SUPPLIERS,
    "profile_orders": SQL_PROFILE_ORDERS,
    "big_orders": SQL_BIG_ORDERS,
    "semi_anti_purchasers": SQL_SEMI_ANTI,
    "bloom_urgent_lineitems": SQL_BLOOM_URGENT,
    "flatten_events": SQL_FLATTEN_EVENTS,
    "lag_lead_events": SQL_LAG_LEAD,
    "sessionize_events": SQL_SESSIONIZE,
    "session_summary": SQL_SESSION_SUMMARY,
    "union_lang_counts": SQL_UNION_LANG,
    "intersect_users": SQL_INTERSECT_USERS,
    "except_users": SQL_EXCEPT_USERS,
    "backfill_events": SQL_BACKFILL,
    "pagerank_trade": SQL_PAGERANK_TRADE,
    "heavy_users": SQL_HEAVY_USERS,
    "rolling_events": SQL_ROLLING,
    "running_events": SQL_RUNNING,
    "target_encode_events": SQL_TARGET_ENCODE,
    "novelty_events": SQL_NOVELTY,
    "first_touch_events": SQL_FIRST_TOUCH,
    "line_dedup_docs": SQL_LINE_DEDUP,
    "line_filtered_docs": SQL_LINE_FILTERED,
    "curate_docs": SQL_CURATE_DOCS,
    "tumbling_hourly": SQL_TUMBLING,
    "asof_purchase": SQL_ASOF_PURCHASE,
    "asof_purchase_streaming": SQL_ASOF_PURCHASE,
    "asof_purchase_tol": SQL_ASOF_PURCHASE_TOL,
    "asof_next_purchase": SQL_ASOF_NEXT_PURCHASE,
    "dedup_user_type": SQL_DEDUP_USER_TYPE,
    "token_stats": SQL_TOKEN_STATS,
    "bpe_token_docs": SQL_BPE_TOKENS,
    "hashed_terms_docs": SQL_HASHED_TERMS,
    "bm25_docs": SQL_BM25_DOCS,
    "quality_docs": SQL_QUALITY,
    "gopher_docs": SQL_GOPHER_DOCS,
    "running_quantity": SQL_RUNNING_QUANTITY,
    "block_spans_docs": SQL_BLOCK_SPANS,
    "retention_pages": SQL_RETENTION_PAGES,
    "robots_filtered_pages": SQL_ROBOTS_FILTERED,
    "semdedup_embeddings": SQL_SEMDEDUP,
    "fingerprint_docs": SQL_FINGERPRINT,
    "dedup_docs": SQL_DEDUP_DOCS,
    "ann_topk": SQL_ANN_TOPK,
    "quantized_embeddings": SQL_QUANTIZED_EMB,
    "cosine_pairs": SQL_COSINE_PAIRS,
    "cosine_clusters": SQL_COSINE_CLUSTERS,
    "hopping_events": SQL_HOPPING,
    "price_quantiles": SQL_PRICE_QUANTILES,
    "customer_order_quantiles": SQL_CUSTOMER_ORDER_QUANTILES,
    "jaccard_pairs": SQL_JACCARD_PAIRS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD,
    "pages_features": SQL_PAGES_FEATURES,
    "page_changes": SQL_PAGE_CHANGES,
    "recrawl_cadence": SQL_RECRAWL_CADENCE,
    "pages_features_tagged": SQL_PAGES_FEATURES,
    "pages_features_incremental": SQL_PAGES_FEATURES,
    "range_join_events": SQL_RANGE_JOIN,
    "rank_events": SQL_RANK_EVENTS,
    "user_event_paths": SQL_USER_EVENT_PATHS,
    "user_split": SQL_USER_SPLIT,
    "user_folds": SQL_USER_FOLDS,
    "temporal_split_events": SQL_TEMPORAL_SPLIT,
    "scaled_docs": SQL_SCALED_DOCS,
    "global_rank_docs": SQL_GLOBAL_RANK,
    "packed_docs": SQL_PACKED_DOCS,
    "weighted_sample_docs": SQL_WEIGHTED_SAMPLE,
    "mixture_plan": SQL_MIXTURE_PLAN,
    "session_funnel": SQL_SESSION_FUNNEL,
    "histogram_chars": SQL_HISTOGRAM_CHARS,
    "repetition_docs": SQL_REPETITION,
    "top_terms": SQL_TOP_TERMS,
    "sample_docs": SQL_SAMPLE_DOCS,
    "stratified_docs": SQL_STRATIFIED_DOCS,
    "reservoir_docs": SQL_RESERVOIR_DOCS,
    "pii_redacted_docs": SQL_PII_REDACTED,
    "training_shards": SQL_TRAINING_SHARDS,
    "centroid_assign": SQL_CENTROID_ASSIGN,
    "pivot_events": SQL_PIVOT_EVENTS,
    "corr_quantity_price": SQL_CORR,
    "tfidf_docs": SQL_TFIDF,
    "user_event_types": SQL_USER_EVENT_TYPES,
    "customer_order_counts": SQL_CUSTOMER_ORDER_COUNTS,
    "events_orders_outer": SQL_EVENTS_ORDERS_OUTER,
    "contamination_docs": SQL_CONTAMINATION,
    "dup_ngram_docs": SQL_DUP_NGRAM,
    "length_filtered_docs": SQL_LENGTH_FILTERED,
    "domain_stats": SQL_DOMAIN_STATS,
    "user_top_events": SQL_USER_TOP_EVENTS,
    "returned_revenue": SQL_RETURNED_REVENUE,
    "resampled_events": SQL_RESAMPLED_EVENTS,
    "unpivot_pricing": SQL_UNPIVOT_PRICING,
    "skew_join_orders": SQL_SKEW_JOIN_ORDERS,
    "boilerplate_docs": SQL_BOILERPLATE_DOCS,
    "sessionize_streaming": SQL_SESSIONIZE,
    "exact_price_quantiles": SQL_EXACT_PRICE_QUANTILES,
    "mad_outlier_events": SQL_MAD_OUTLIERS,
    "collocations_docs": SQL_COLLOCATIONS,
    "pit_features_multi": SQL_PIT_MULTI,
    "weighted_avg_discount": SQL_WEIGHTED_AVG_DISCOUNT,
    "upsert_user_state": SQL_UPSERT_USER_STATE,
    "fixed_n_per_lang": SQL_FIXED_N_PER_LANG,
    "domain_capped_pages": SQL_DOMAIN_CAPPED,
    "decontam_exact_docs": SQL_DECONTAM_EXACT,
    "transition_counts": SQL_TRANSITION_COUNTS,
    "lang_length_quantiles": SQL_LANG_LENGTH_QUANTILES,
    "systematic_sample_events": SQL_SYSTEMATIC_SAMPLE,
    "table_diff_orders": SQL_TABLE_DIFF_ORDERS,
    "winsorized_events": SQL_WINSORIZED_EVENTS,
    "scd2_user_tier": SQL_SCD2_USER_TIER,
    "chunked_docs": SQL_CHUNKED_DOCS,
    "weighted_price_quantiles": SQL_WEIGHTED_PRICE_QUANTILES,
    "typo_pairs_docs": SQL_TYPO_PAIRS,
    "dup_span_docs": SQL_DUP_SPAN_DOCS,
    "incremental_event_totals": SQL_INCREMENTAL_EVENT_TOTALS,
    "linear_score_docs": SQL_LINEAR_SCORE_DOCS,
    "epoch_order_docs": SQL_EPOCH_ORDER_DOCS,
    "canonical_urls": SQL_CANONICAL_URLS,
    "user_type_gini": SQL_USER_TYPE_GINI,
    "neighbor_pairs_docs": SQL_NEIGHBOR_PAIRS_DOCS,
    "assoc_rules_sessions": SQL_ASSOC_RULES,
    "skyline_lineitems": SQL_SKYLINE_LINEITEMS,
    "audit_orders": SQL_AUDIT_ORDERS,
    "cohort_retention": SQL_COHORT_RETENTION,
    "token_budget_docs": SQL_TOKEN_BUDGET_DOCS,
    "winnow_docs": SQL_WINNOW_DOCS,
    "projected_embeddings": SQL_PROJECTED_EMB,
    "peak_concurrency": SQL_PEAK_CONCURRENCY,
    "trend_per_customer": SQL_TREND_PER_CUSTOMER,
    "rrf_docs": SQL_RRF_DOCS,
    "join_delta_orders": SQL_JOIN_DELTA_ORDERS,
    "grid_clusters": SQL_GRID_CLUSTERS,
    "cms_user_counts": SQL_CMS_USER_COUNTS,
    "seasonal_backtest": SQL_SEASONAL_BACKTEST,
    "attribution_events": SQL_ATTRIBUTION_EVENTS,
    "temperature_mix_docs": SQL_TEMPERATURE_MIX,
    "t5_spans_docs": SQL_T5_SPANS,
    "order_value_share": SQL_ORDER_VALUE_SHARE,
    "order_gap_stats": SQL_ORDER_GAP_STATS,
    "token_fertility_langs": SQL_TOKEN_FERTILITY_LANGS,
    "early_activity_profile": SQL_EARLY_ACTIVITY_PROFILE,
    "local_supplier_revenue": SQL_LOCAL_SUPPLIER_REVENUE,
    "q16_part_suppliers": SQL_Q16_PART_SUPPLIERS,
    "session_handoff_matrix": SQL_SESSION_HANDOFF_MATRIX,
    "priority_mix_drift": SQL_PRIORITY_MIX_DRIFT,
    "nations_trade_flow": SQL_NATIONS_TRADE_FLOW,
    "part_type_margin": SQL_PART_TYPE_MARGIN,
    "important_parts": SQL_IMPORTANT_PARTS,
    "top_supplier_revenue": SQL_TOP_SUPPLIER_REVENUE,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "ored_brand_revenue": SQL_ORED_BRAND_REVENUE,
    "sales_opportunity": SQL_SALES_OPPORTUNITY,
    "type_lift_pairs": SQL_TYPE_LIFT_PAIRS,
    "cheapest_two_hop": SQL_CHEAPEST_TWO_HOP,
    "label_inertia": SQL_LABEL_INERTIA,
    "order_total_reconciliation": SQL_ORDER_TOTAL_RECONCILIATION,
    "decile_revenue_share": SQL_DECILE_REVENUE_SHARE,
    "zorder_parts": SQL_ZORDER_PARTS,
    "tf_cosine_pairs_docs": SQL_TF_COSINE_PAIRS_DOCS,
    "rle_runs_events": SQL_RLE_RUNS_EVENTS,
    "order_line_signature": SQL_ORDER_LINE_SIGNATURE,
    "busday_latency_orders": SQL_BUSDAY_LATENCY_ORDERS,
    "typo_clusters_docs": SQL_TYPO_CLUSTERS_DOCS,
    "core3_parts": SQL_CORE3_PARTS,
    "bounce_rate_sessions": SQL_BOUNCE_RATE_SESSIONS,
    "cont_price_quantiles": SQL_CONT_PRICE_QUANTILES,
    "union_schema_read": SQL_UNION_SCHEMA_READ,
    "cdc_join_delta": SQL_CDC_JOIN_DELTA,
    "division_customers": SQL_DIVISION_CUSTOMERS,
    "stump_split_events": SQL_STUMP_SPLIT_EVENTS,
    "price_gcd_brand": SQL_PRICE_GCD_BRAND,
    "tukey_outliers_langs": SQL_TUKEY_OUTLIERS_LANGS,
    "stock_span_daily": SQL_STOCK_SPAN_DAILY,
    "content_fingerprint_langs": SQL_CONTENT_FINGERPRINT_LANGS,
    "rowgroup_skip_stats": SQL_ROWGROUP_SKIP_STATS,
    "column_compression_stats": SQL_COLUMN_COMPRESSION_STATS,
    "gram_matrix_embeddings": SQL_GRAM_MATRIX_EMBEDDINGS,
    "frequent_triples_parts": SQL_FREQUENT_TRIPLES_PARTS,
    "bitmap_distinct_users": SQL_BITMAP_DISTINCT_USERS,
    "merge_join_segments": SQL_MERGE_JOIN_SEGMENTS,
    "compaction_plan": SQL_COMPACTION_PLAN,
    "iso_week_revenue": SQL_ISO_WEEK_REVENUE,
    "quarantine_parse_docs": SQL_QUARANTINE_PARSE_DOCS,
    "auto_join_types": SQL_AUTO_JOIN_TYPES,
    "mannwhitney_langs": SQL_MANNWHITNEY_LANGS,
    "survival_table_users": SQL_SURVIVAL_TABLE_USERS,
    "image_thumbnail_stats": SQL_IMAGE_THUMBNAIL_STATS,
    "wav_energy_stats": SQL_WAV_ENERGY_STATS,
    "emd_langs": SQL_EMD_LANGS,
    "hist_intersection_langs": SQL_HIST_INTERSECTION_LANGS,
    "session_threshold_sweep": SQL_SESSION_THRESHOLD_SWEEP,
    "mirror_detection_pages": SQL_MIRROR_DETECTION_PAGES,
    "crawl_fairness_daily": SQL_CRAWL_FAIRNESS_DAILY,
    "overlapping_shipments": SQL_OVERLAPPING_SHIPMENTS,
    "max_drawdown_users": SQL_MAX_DRAWDOWN_USERS,
    "holt_forecast_types": SQL_HOLT_FORECAST_TYPES,
    "pr_curve_docs": SQL_PR_CURVE_DOCS,
    "ams_f2_events": SQL_AMS_F2_EVENTS,
    "curriculum_phases_docs": SQL_CURRICULUM_PHASES_DOCS,
    "contrastive_pairs_docs": SQL_CONTRASTIVE_PAIRS_DOCS,
    "fano_daily_types": SQL_FANO_DAILY_TYPES,
    "gate_parity_langs": SQL_GATE_PARITY_LANGS,
    "pre_post_types": SQL_PRE_POST_TYPES,
    "duplicate_titles_pages": SQL_DUPLICATE_TITLES_PAGES,
    "session_entry_exit": SQL_SESSION_ENTRY_EXIT,
    "reject_reasons_docs": SQL_REJECT_REASONS_DOCS,
    "posting_gap_bits": SQL_POSTING_GAP_BITS,
    "hourweek_heatmap_events": SQL_HOURWEEK_HEATMAP_EVENTS,
    "char_class_langs": SQL_CHAR_CLASS_LANGS,
    "mlm_mask_plan_docs": SQL_MLM_MASK_PLAN_DOCS,
    "readability_docs": SQL_READABILITY_DOCS,
    "auc_scorer_docs": SQL_AUC_SCORER_DOCS,
    "media_type_census": SQL_MEDIA_TYPE_CENSUS,
    "nofollow_share_domains": SQL_NOFOLLOW_SHARE_DOMAINS,
    "graph_walks_pages": SQL_GRAPH_WALKS_PAGES,
    "containment_pairs_docs": SQL_CONTAINMENT_PAIRS_DOCS,
    "calibration_bins_docs": SQL_CALIBRATION_BINS_DOCS,
    "meta_key_census_pages": SQL_META_KEY_CENSUS_PAGES,
    "silence_runs_audio": SQL_SILENCE_RUNS_AUDIO,
    "ahash_groups_images": SQL_AHASH_GROUPS_IMAGES,
    "rolling_median_events": SQL_ROLLING_MEDIAN_EVENTS,
    "zero_crossings_audio": SQL_ZERO_CROSSINGS_AUDIO,
    "dup_weight_docs": SQL_DUP_WEIGHT_DOCS,
    "orphan_keys_audit": SQL_ORPHAN_KEYS_AUDIT,
    "timed_funnel_events": SQL_TIMED_FUNNEL_EVENTS,
    "bollinger_breakouts": SQL_BOLLINGER_BREAKOUTS,
    "sortedness_audit": SQL_SORTEDNESS_AUDIT,
    "jsonl_gz_events": SQL_JSONL_GZ_EVENTS,
    "debounced_events": SQL_DEBOUNCED_EVENTS,
    "negative_edges_pages": SQL_NEGATIVE_EDGES_PAGES,
    "theilsen_trend_parts": SQL_THEILSEN_TREND_PARTS,
    "max_gain_users": SQL_MAX_GAIN_USERS,
    "edge_support_suppliers": SQL_EDGE_SUPPORT_SUPPLIERS,
    "wl_hash_suppliers": SQL_WL_HASH_SUPPLIERS,
    "decay_attribution_events": SQL_DECAY_ATTRIBUTION_EVENTS,
    "bitemporal_asof_events": SQL_BITEMPORAL_ASOF_EVENTS,
    "dhash_groups_images": SQL_DHASH_GROUPS_IMAGES,
    "importance_weights_langs": SQL_IMPORTANCE_WEIGHTS_LANGS,
    "pushdown_read_lineitem": SQL_PUSHDOWN_READ_LINEITEM,
    "ahash_neardup_images": SQL_AHASH_NEARDUP_IMAGES,
    "fallback_asof_events": SQL_FALLBACK_ASOF_EVENTS,
    "join_cardinality_estimate": SQL_JOIN_CARDINALITY_ESTIMATE,
    "kmv_sketch_users": SQL_KMV_SKETCH_USERS,
    "dod_bits_users": SQL_DOD_BITS_USERS,
    "rendezvous_shards_pages": SQL_RENDEZVOUS_SHARDS_PAGES,
    "bucketed_join_orders": SQL_BUCKETED_JOIN_ORDERS,
    "knn_graph_int8": SQL_KNN_GRAPH_INT8,
    "l_diversity_docs": SQL_L_DIVERSITY_DOCS,
    "rbo_rankings_docs": SQL_RBO_RANKINGS_DOCS,
    "value_drift_types": SQL_VALUE_DRIFT_TYPES,
    "cohort_ltv_users": SQL_COHORT_LTV_USERS,
    "warc_domain_census": SQL_WARC_DOMAIN_CENSUS,
    "warc_token_stats": SQL_WARC_TOKEN_STATS,
    "boruvka_round_parts": SQL_BORUVKA_ROUND_PARTS,
    "bootstrap_means_events": SQL_BOOTSTRAP_MEANS_EVENTS,
    "funnel_distance_users": SQL_FUNNEL_DISTANCE_USERS,
    "zorder_skip_stats": SQL_ZORDER_SKIP_STATS,
    "null_census_tables": SQL_NULL_CENSUS_TABLES,
    "forget_users_run": SQL_FORGET_USERS_RUN,
    "encoding_advisor_lineitem": SQL_ENCODING_ADVISOR_LINEITEM,
    "simhash_docs": SQL_SIMHASH_DOCS,
    "approx_distinct_users": SQL_APPROX_DISTINCT_USERS,
    "ppjoin_docs": SQL_NGRAM_JACCARD,
    "chi2_lang_source": SQL_CHI2_LANG_SOURCE,
    "kwic_docs": SQL_KWIC_DOCS,
    "clustering_coeff": SQL_CLUSTERING_COEFF,
    "ohlc_daily": SQL_OHLC_DAILY,
    "snapshot_recall_pages": SQL_SNAPSHOT_RECALL,
    "two_hop_suppliers": SQL_TWO_HOP_SUPPLIERS,
    "golden_page_record": SQL_GOLDEN_PAGE_RECORD,
    "tag_pairs_pages": SQL_TAG_PAIRS_PAGES,
    "coverage_docs": SQL_COVERAGE_DOCS,
    "bfs_levels_suppliers": SQL_BFS_LEVELS,
    "overdue_pages": SQL_OVERDUE_PAGES,
    "shard_moves": SQL_SHARD_MOVES,
    "bigram_lm_docs": SQL_BIGRAM_LM_DOCS,
    "kappa_docs": SQL_KAPPA_DOCS,
    "ab_test_events": SQL_AB_TEST_EVENTS,
    "vocab_growth_docs": SQL_VOCAB_GROWTH_DOCS,
    "hapax_docs": SQL_HAPAX_DOCS,
    "ks_drift_events": SQL_KS_DRIFT_EVENTS,
    "benford_orders": SQL_BENFORD_ORDERS,
    "bpe_pairs_docs": SQL_BPE_PAIRS_DOCS,
    "inverted_index_docs": SQL_INVERTED_INDEX_DOCS,
    "boolean_search_docs": SQL_BOOLEAN_SEARCH_DOCS,
    # minhash_dedup / langid_docs / lsh_ann / ivf_ann / kmeans /
    # simhash_neardup / ewma_events: rows-only (no faithful ANSI-SQL form
    # — iterative float recursions or hash-clustering label maps)
}


__all__ = ["QUERIES", "ORACLE_SQL", "read_table", "round_half_away"]
