"""Relational engine primitives over the TPC-H-ish testdata — the
grouped-aggregate / broadcast-join / top-k / windowed shapes every
pipeline composes from, each built scale-first:

- money is converted to integer cents *before* aggregation so sums are
  exact and oracle-comparable (no float accumulation-order drift);
- grouped aggregates pre-aggregate per batch (combiner) before the
  shuffle, so the groupby moves one row per key per batch;
- dimension joins broadcast the small side via ``ray.put``;
- sessionization is a per-key ``map_groups`` over ts-sorted events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def q1_pricing_summary(lineitem):
    """TPC-H Q1 shape: per (returnflag, linestatus) — sum qty,
    sum base price, sum discounted price (cents), row count."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # integer money: cents for qty/price; discounted price in
        # cents*100 via integer percent — exact, no float-rounding-mode
        # (banker's vs half-away) divergence vs the SQL oracle
        df["qty_c"] = np.round(df["l_quantity"] * 100).astype("int64")
        df["price_c"] = np.round(df["l_extendedprice"] * 100).astype("int64")
        disc_pct = np.round(df["l_discount"] * 100).astype("int64")
        df["disc_price_c"] = df["price_c"] * (100 - disc_pct)
        g = (df.groupby(["l_returnflag", "l_linestatus"])
             .agg(sum_qty_c=("qty_c", "sum"),
                  sum_base_price_c=("price_c", "sum"),
                  sum_disc_price_c=("disc_price_c", "sum"),
                  n_rows=("qty_c", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = lineitem.map_batches(partial, batch_format="pyarrow",
                                    batch_size=65536)
    return (partials.groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty_c", alias_name="sum_qty_c"),
                       Sum("sum_base_price_c", alias_name="sum_base_price_c"),
                       Sum("sum_disc_price_c", alias_name="sum_disc_price_c"),
                       Sum("n_rows", alias_name="n_rows")))


def top_customers_by_revenue(orders, customer, k: int = 10):
    """Top-k customers by total order value: pre-aggregate orders per
    custkey per batch → bucketed exact per-custkey totals with the
    top-k cut applied INSIDE each bucket (a custkey's partials land
    whole in one hash bucket, so a per-bucket top-k is a correct
    candidate filter) → ≤ nb×k candidate rows merge on the driver →
    attach names for the k winners only.  No distributed sort: the
    only exchange is the bounded-bucket shuffle of per-batch partials.

    The customer dimension scales with the data, so it is never
    collected or broadcast: the top-k keys (k rows) are found before
    any name is touched, then the dimension is filtered distributedly
    for exactly those keys and only ≤ k (key, name) rows reach the
    driver."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["total_c"] = np.round(df["o_totalprice"] * 100).astype("int64")
        g = (df.groupby("o_custkey")
             .agg(revenue_c=("total_c", "sum"), n_orders=("total_c", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # custkey cardinality grows with the data → bounded-bucket shuffle,
    # not Ray's per-group aggregate (see ops/shuffle.py)
    from .shuffle import bucketed_groupby

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (pdf.groupby("o_custkey", sort=False)
             .agg(revenue_c=("revenue_c", "sum"),
                  n_orders=("n_orders", "sum"))
             .reset_index())
        g = g.sort_values(["revenue_c", "o_custkey"],
                          ascending=[False, True], kind="mergesort")
        return g.head(k)

    cand = bucketed_groupby(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
        "o_custkey", bucket_topk).to_pandas()       # ≤ nb×k rows

    top = (cand.sort_values(["revenue_c", "o_custkey"],
                            ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))

    keys = set(top["o_custkey"].tolist())

    key_arr = pa.array(sorted(keys), type=pa.int64())

    def pick_names(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.is_in(batch["c_custkey"], value_set=key_arr)
        return batch.select(["c_custkey", "c_name"]).filter(m)

    names = (customer.map_batches(pick_names, batch_format="pyarrow")
             .to_pandas())                        # ≤ k rows
    lookup = dict(zip(names["c_custkey"], names["c_name"]))
    top["c_name"] = top["o_custkey"].map(lookup)
    top["rank"] = np.arange(1, len(top) + 1, dtype="int64")
    return top[["rank", "o_custkey", "c_name", "revenue_c", "n_orders"]]


def shipping_priority(customer, orders, lineitem,
                      segment: str = "BUILDING",
                      cutoff: str = "2000-01-01", k: int = 10,
                      num_buckets: int | None = None):
    """TPC-H Q3 shape — top-k "open" orders by discounted revenue for
    one market segment: customers in ``segment``, orders placed before
    ``cutoff``, revenue from lineitems shipping after ``cutoff``.
    The three-join + top-k plan every relational pipeline composes:

    - the CUSTOMER dimension grows with the data, so it is never
      broadcast: qualifying orders come from a bucketed SEMI join on
      custkey (order rows with a segment match; customer columns never
      travel further);
    - the LINEITEM fact collapses to per-(orderkey) revenue partials
      inside each batch before anything moves (integer cents×100, the
      q1 convention — exact, no float accumulation drift);
    - revenue partials and qualifying orders meet in ONE bucketed
      exchange on orderkey where each bucket aggregates, inner-joins
      the order attributes, and cuts to its local top-``k`` — a key's
      rows land whole in one bucket, so the per-bucket cut is a
      correct candidate filter and only ≤ buckets×k rows reach the
      driver (no distributed sort, the ``top_customers`` argument).

    → pandas (rank, o_orderkey, o_orderdate, o_orderpriority,
    revenue_c), revenue desc, orderkey asc ties.
    """
    from .shuffle import bucketed_groupby, bucketed_join

    cut = pd.Timestamp(cutoff)

    def cust_keys(df: pd.DataFrame) -> pd.DataFrame:
        m = df["c_mktsegment"] == segment
        return pd.DataFrame(
            {"o_custkey": df.loc[m, "c_custkey"].astype("int64")})

    def ord_filter(df: pd.DataFrame) -> pd.DataFrame:
        m = df["o_orderdate"] < cut
        out = df.loc[m, ["o_custkey", "o_orderkey", "o_orderdate",
                         "o_orderpriority"]].copy()
        out["o_custkey"] = out["o_custkey"].astype("int64")
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        return out

    qualifying = bucketed_join(
        orders.map_batches(ord_filter, batch_format="pandas"),
        customer.map_batches(cust_keys, batch_format="pandas"),
        on="o_custkey",
        left_schema={"o_custkey": "int64", "o_orderkey": "int64",
                     "o_orderdate": "datetime64[us]",
                     "o_orderpriority": "object"},
        right_schema={"o_custkey": "int64"},
        num_buckets=num_buckets, how="semi")

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cut]
        if not len(df):
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "rev_c": pd.Series([], dtype="int64")})
        price_c = np.round(df["l_extendedprice"] * 100).astype("int64")
        disc_pct = np.round(df["l_discount"] * 100).astype("int64")
        return (pd.DataFrame({"o_orderkey": df["l_orderkey"].astype("int64"),
                              "rev_c": price_c * (100 - disc_pct)})
                .groupby("o_orderkey", sort=False)["rev_c"].sum()
                .reset_index())

    rev = lineitem.select_columns(
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pandas")

    # one exchange: revenue partials (side 0) + order attrs (side 1)
    # meet per orderkey; aggregate, join, local top-k cut
    def tag_rev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"], "rev_c": df["rev_c"],
            "o_orderdate": pd.Series([pd.Timestamp(0)] * len(df),
                                     dtype="datetime64[us]"),
            "o_orderpriority": [""] * len(df),
            "side": np.zeros(len(df), dtype=np.int8)})

    def tag_ord(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "rev_c": np.zeros(len(df), dtype=np.int64),
            "o_orderdate": df["o_orderdate"].astype("datetime64[us]"),
            "o_orderpriority": df["o_orderpriority"],
            "side": np.ones(len(df), dtype=np.int8)})

    EMPTY = pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_orderpriority": pd.Series([], dtype=object),
        "revenue_c": pd.Series([], dtype="int64")})

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        sides = pdf["side"].to_numpy()
        r = (pdf[sides == 0].groupby("o_orderkey", sort=False)["rev_c"]
             .sum().rename("revenue_c").reset_index())
        o = pdf[sides == 1][["o_orderkey", "o_orderdate",
                             "o_orderpriority"]]
        if r.empty or o.empty:
            return EMPTY
        m = o.merge(r, on="o_orderkey", how="inner")
        m = m.sort_values(["revenue_c", "o_orderkey"],
                          ascending=[False, True], kind="mergesort").head(k)
        return m[["o_orderkey", "o_orderdate", "o_orderpriority",
                  "revenue_c"]].reset_index(drop=True)

    tagged = (rev.map_batches(tag_rev, batch_format="pandas")
              .union(qualifying.map_batches(tag_ord,
                                            batch_format="pandas")))
    cand = bucketed_groupby(tagged, "o_orderkey", bucket_topk,
                            num_buckets).to_pandas()     # ≤ nb×k rows
    if cand.empty:
        out = EMPTY.copy()
    else:
        out = (cand.sort_values(["revenue_c", "o_orderkey"],
                                ascending=[False, True], kind="mergesort")
               .head(k).reset_index(drop=True))
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype="int64"))
    return out[["rank", "o_orderkey", "o_orderdate", "o_orderpriority",
                "revenue_c"]]


def shipping_priority_sql(segment: str = "BUILDING",
                          cutoff: str = "2000-01-01", k: int = 10) -> str:
    """DuckDB oracle for ``shipping_priority`` (same integer-cents
    revenue, same tie-break)."""
    return f"""
        WITH agg AS (
          SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                 CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                      AS BIGINT) AS revenue_c
          FROM customer c
          JOIN orders o ON c.c_custkey = o.o_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          WHERE c.c_mktsegment = '{segment}'
            AND o.o_orderdate < TIMESTAMP '{cutoff}'
            AND l.l_shipdate > TIMESTAMP '{cutoff}'
          GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue_c DESC, o_orderkey)
                    AS BIGINT) AS rank,
               o_orderkey, o_orderdate, o_orderpriority, revenue_c
        FROM agg
        ORDER BY revenue_c DESC, o_orderkey
        LIMIT {k}
    """


def returned_item_report(lineitem, orders, customer, nation,
                         date_from: str = "1996-01-01",
                         date_to: str = "1996-04-01", k: int = 20,
                         num_buckets: int | None = None):
    """TPC-H Q10 shape — top-k customers by revenue lost to RETURNED
    items in one quarter (the "who should support call first" report):
    lineitems with returnflag 'R' joined through their orders (date
    window) to the customer, grouped per customer, nation attached,
    top-k by revenue.

    Plan (no distributed sort, no dimension broadcast except nation):
    the LINEITEM fact collapses to per-(orderkey) returned-revenue
    partials inside each batch (integer cents×100, the q1/q3
    convention); partials meet the date-filtered orders in ONE
    orderkey-bucketed exchange that re-emits per-CUSTKEY partials;
    those meet the customer attributes in a second custkey-bucketed
    exchange whose buckets cut a local top-``k`` (≤ buckets×k candidate
    rows to the driver — the ``top_customers`` argument); the ≤25-row
    nation dim attaches driver-side.

    → pandas (rank, c_custkey, c_name, n_name, acctbal_c, revenue_c),
    revenue desc, custkey asc ties.
    """
    from .shuffle import bucketed_groupby

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"]
        if not len(df):
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "rev_c": pd.Series([], dtype="int64")})
        price_c = np.round(df["l_extendedprice"] * 100).astype("int64")
        disc_pct = np.round(df["l_discount"] * 100).astype("int64")
        return (pd.DataFrame({"o_orderkey": df["l_orderkey"].astype("int64"),
                              "rev_c": price_c * (100 - disc_pct)})
                .groupby("o_orderkey", sort=False)["rev_c"].sum()
                .reset_index())

    rev = lineitem.select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pandas")

    def ord_filter(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        out = df.loc[m, ["o_orderkey", "o_custkey"]].copy()
        return out.astype({"o_orderkey": "int64", "o_custkey": "int64"})

    ords = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_filter, batch_format="pandas")

    # exchange 1 (orderkey): revenue partials ⋈ qualifying orders →
    # per-custkey partials (each bucket pre-sums before re-emitting)
    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"], "rev_c": df["rev_c"],
            "o_custkey": np.zeros(len(df), dtype=np.int64),
            "side": np.zeros(len(df), dtype=np.int8)})

    def tag_ord(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "rev_c": np.zeros(len(df), dtype=np.int64),
            "o_custkey": df["o_custkey"],
            "side": np.ones(len(df), dtype=np.int8)})

    EMPTY_CP = pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                             "rev_c": pd.Series([], dtype="int64")})

    def fold_orders(pdf: pd.DataFrame) -> pd.DataFrame:
        sides = pdf["side"].to_numpy()
        r = (pdf[sides == 0].groupby("o_orderkey", sort=False)["rev_c"]
             .sum().reset_index())
        o = pdf[sides == 1][["o_orderkey", "o_custkey"]]
        if r.empty or o.empty:
            return EMPTY_CP
        m = o.merge(r, on="o_orderkey", how="inner")
        return (m.groupby("o_custkey", sort=False)["rev_c"].sum()
                .reset_index())

    tagged1 = (rev.map_batches(tag_li, batch_format="pandas")
               .union(ords.map_batches(tag_ord, batch_format="pandas")))
    cust_partials = bucketed_groupby(tagged1, "o_orderkey", fold_orders,
                                     num_buckets)

    # exchange 2 (custkey): per-cust partials ⋈ customer attrs → local
    # top-k candidates per bucket
    def tag_cp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["o_custkey"].astype("int64"),
            "rev_c": df["rev_c"],
            "c_name": [""] * len(df),
            "acctbal_c": np.zeros(len(df), dtype=np.int64),
            "c_nationkey": np.zeros(len(df), dtype=np.int64),
            "side": np.zeros(len(df), dtype=np.int8)})

    def cust_attrs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].astype("int64"),
            "rev_c": np.zeros(len(df), dtype=np.int64),
            "c_name": df["c_name"].astype(object),
            "acctbal_c": np.round(df["c_acctbal"] * 100).astype("int64"),
            "c_nationkey": df["c_nationkey"].astype("int64"),
            "side": np.ones(len(df), dtype=np.int8)})

    EMPTY = pd.DataFrame({
        "c_custkey": pd.Series([], dtype="int64"),
        "c_name": pd.Series([], dtype=object),
        "acctbal_c": pd.Series([], dtype="int64"),
        "c_nationkey": pd.Series([], dtype="int64"),
        "revenue_c": pd.Series([], dtype="int64")})

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        sides = pdf["side"].to_numpy()
        r = (pdf[sides == 0].groupby("c_custkey", sort=False)["rev_c"]
             .sum().rename("revenue_c").reset_index())
        c = pdf[sides == 1][["c_custkey", "c_name", "acctbal_c",
                             "c_nationkey"]]
        if r.empty or c.empty:
            return EMPTY
        m = c.merge(r, on="c_custkey", how="inner")
        m = m.sort_values(["revenue_c", "c_custkey"],
                          ascending=[False, True], kind="mergesort").head(k)
        return m[["c_custkey", "c_name", "acctbal_c", "c_nationkey",
                  "revenue_c"]].reset_index(drop=True)

    tagged2 = (cust_partials.map_batches(tag_cp, batch_format="pandas")
               .union(customer.select_columns(
                   ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
                   .map_batches(cust_attrs, batch_format="pandas")))
    cand = bucketed_groupby(tagged2, "c_custkey", bucket_topk,
                            num_buckets).to_pandas()    # ≤ nb×k rows
    if cand.empty:
        out = EMPTY.copy()
    else:
        out = (cand.sort_values(["revenue_c", "c_custkey"],
                                ascending=[False, True], kind="mergesort")
               .head(k).reset_index(drop=True))
    nmap = (nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
            .set_index("n_nationkey")["n_name"])        # ≤25 rows
    out["n_name"] = out["c_nationkey"].map(nmap).astype(object)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype="int64"))
    return out[["rank", "c_custkey", "c_name", "n_name", "acctbal_c",
                "revenue_c"]]


def returned_item_report_sql(date_from: str = "1996-01-01",
                             date_to: str = "1996-04-01",
                             k: int = 20) -> str:
    """DuckDB oracle for ``returned_item_report`` (same integer-cents
    revenue, same tie-break)."""
    return f"""
        WITH agg AS (
          SELECT c.c_custkey, c.c_name, n.n_name,
                 CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
                 CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                      AS BIGINT) AS revenue_c
          FROM customer c
          JOIN orders o ON c.c_custkey = o.o_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
            AND o.o_orderdate < TIMESTAMP '{date_to}'
            AND l.l_returnflag = 'R'
          GROUP BY 1, 2, 3, 4)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue_c DESC, c_custkey)
                    AS BIGINT) AS rank,
               c_custkey, c_name, n_name, acctbal_c, revenue_c
        FROM agg
        ORDER BY revenue_c DESC, c_custkey
        LIMIT {k}
    """


def parts_supplier_counts(lineitem, part, supplier,
                          num_buckets: int | None = None):
    """TPC-H Q16 shape — how many distinct suppliers can deliver each
    part profile (brand, type, size), excluding suppliers with
    complaints (negative account balance stands in for Q16's comment
    scan; the testdata has no partsupp table, so the part-supplier
    relation is lineitem's observed (l_partkey, l_suppkey) pairs).

    Plan: lineitem collapses to per-batch DISTINCT (partkey, suppkey)
    pairs at the source; a bucketed ANTI join removes complained
    suppliers (the supplier dim is never broadcast); a bucketed inner
    join attaches the part profile; the final profile-bucketed fold
    runs an exact ``nunique`` per (brand, type, size) — every row of a
    profile lands whole in its bucket, so the count is exact with no
    global pair-distinct exchange.

    → (p_brand, p_type, p_size, supplier_cnt), all integers/strings.
    """
    from .shuffle import bucketed_groupby, bucketed_join

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return (df[["l_partkey", "l_suppkey"]]
                .astype({"l_partkey": "int64", "l_suppkey": "int64"})
                .drop_duplicates())

    li_pairs = lineitem.select_columns(["l_partkey", "l_suppkey"]) \
        .map_batches(pairs, batch_format="pandas")

    def bad(df: pd.DataFrame) -> pd.DataFrame:
        m = df["s_acctbal"] < 0
        return pd.DataFrame(
            {"l_suppkey": df.loc[m, "s_suppkey"].astype("int64")})

    ok_pairs = bucketed_join(
        li_pairs,
        supplier.select_columns(["s_suppkey", "s_acctbal"])
                .map_batches(bad, batch_format="pandas"),
        on="l_suppkey",
        left_schema={"l_partkey": "int64", "l_suppkey": "int64"},
        right_schema={"l_suppkey": "int64"},
        num_buckets=num_buckets, how="anti")

    def part_attrs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["p_partkey"].astype("int64"),
            "p_brand": df["p_brand"].astype(object),
            "p_type": df["p_type"].astype(object),
            "p_size": df["p_size"].astype("int64")})

    profiled = bucketed_join(
        ok_pairs,
        part.select_columns(["p_partkey", "p_brand", "p_type", "p_size"])
            .map_batches(part_attrs, batch_format="pandas"),
        on="l_partkey",
        left_schema={"l_partkey": "int64", "l_suppkey": "int64"},
        right_schema={"l_partkey": "int64", "p_brand": "object",
                      "p_type": "object", "p_size": "int64"},
        num_buckets=num_buckets)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (pdf.groupby(["p_brand", "p_type", "p_size"], sort=False)
             ["l_suppkey"].nunique().rename("supplier_cnt").reset_index())
        g["supplier_cnt"] = g["supplier_cnt"].astype("int64")
        return g

    return bucketed_groupby(profiled, ["p_brand", "p_type", "p_size"],
                            fold, num_buckets)


def parts_supplier_counts_sql() -> str:
    """DuckDB oracle for ``parts_supplier_counts``."""
    return """
        SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3"""


def events_hourly(events):
    """Tumbling-window aggregate: (event_type, hour) → count + value
    cents.  Pre-aggregated per batch before the shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        df["value_c"] = np.round(df["value"] * 100).astype("int64")
        g = (df.groupby(["event_type", "hour"])
             .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # (type, hour) keys grow with the time range → bounded-bucket shuffle
    from .shuffle import bucketed_agg
    return bucketed_agg(
        events.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
        ["event_type", "hour"],
        {"n": ("n", "sum"), "sum_value_c": ("sum_value_c", "sum")})


def events_trend(events, num_buckets: int | None = None) -> pd.DataFrame:
    """Per-type activity trend: exact integer least-squares slope of
    DAILY event counts over the day index → pandas (event_type,
    n_days, slope_num, slope_den, slope_micro), event_type ascending.

    The regression points are (epoch_day, count) for days WITH events;
    slope = (n·Σdc − Σd·Σc) / (n·Σd² − (Σd)²) is carried as the exact
    int64 numerator/denominator pair plus a floor-divided micro-unit
    quotient — identical arithmetic in the SQL oracle, no float
    normal-equation solve on either side.  Types with < 2 distinct
    days report slope 0/0/0 (deterministic, not NULL).

    Scale shape: per-batch (type, day) count partials → ONE
    bounded-bucket (type, day) sum (the key set grows with types ×
    time range, never with event volume) → per-batch moment partials
    (all moments are linear in the completed day counts) → a ≤ #types
    driver fold."""
    from .shuffle import bucketed_agg

    US_PER_DAY = 86_400_000_000

    def day_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        # explicit µs view — pandas may surface the parquet ts as
        # datetime64[ns] or [us] depending on version.  TRUNCATING
        # day quotient (toward zero) to match DuckDB's integer `//`
        # for pre-1970 timestamps — numpy's floors (review finding)
        us = (df["ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        df["day"] = np.where(us >= 0, us // US_PER_DAY,
                             -((-us) // US_PER_DAY))
        return (df.groupby(["event_type", "day"], sort=False)
                .size().reset_index(name="c"))

    per_day = bucketed_agg(
        events.map_batches(day_partial, batch_format="pyarrow",
                           batch_size=65536),
        ["event_type", "day"], {"c": ("c", "sum")}, num_buckets)

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        d = b["day"].astype("int64")
        c = b["c"].astype("int64")
        g = pd.DataFrame({
            "event_type": b["event_type"],
            "n": 1, "sd": d, "sc": c, "sdc": d * c, "sdd": d * d})
        return (g.groupby("event_type", sort=False)
                .sum().reset_index())

    acc: dict[str, np.ndarray] = {}
    for p in per_day.map_batches(
            moments, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        for row in p.itertuples(index=False):
            cur = acc.setdefault(
                row.event_type, np.zeros(5, dtype=np.int64))
            cur += np.array([row.n, row.sd, row.sc, row.sdc, row.sdd],
                            dtype=np.int64)
    rows = []
    for et in sorted(acc):
        n, sd, sc, sdc, sdd = (int(v) for v in acc[et])
        num = n * sdc - sd * sc
        den = n * sdd - sd * sd
        # TRUNCATING division (toward zero) — DuckDB's integer `//`
        # truncates where Python's floors; they differ on negative
        # slopes by one micro-unit
        micro = (abs(1_000_000 * num) // den) * \
            (1 if num >= 0 else -1) if den else 0
        rows.append((et, n, num if den else 0, den, micro))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_days", "slope_num", "slope_den",
        "slope_micro"]).astype({"n_days": "int64", "slope_num": "int64",
                                "slope_den": "int64",
                                "slope_micro": "int64"})


def events_trend_sql(table: str = "events") -> str:
    """DuckDB oracle matching ``events_trend`` bit-for-bit (same
    integer normal-equation arithmetic, same floor division)."""
    return f"""
        WITH pd AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM {table} GROUP BY 1, 2),
        m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(day) AS BIGINT) AS sd,
                 CAST(SUM(c) AS BIGINT) AS sc,
                 CAST(SUM(day * c) AS BIGINT) AS sdc,
                 CAST(SUM(day * day) AS BIGINT) AS sdd
          FROM pd GROUP BY event_type)
        SELECT event_type, n AS n_days,
               CASE WHEN n * sdd - sd * sd = 0 THEN 0
                    ELSE n * sdc - sd * sc END AS slope_num,
               n * sdd - sd * sd AS slope_den,
               CASE WHEN n * sdd - sd * sd = 0 THEN 0
                    ELSE (1000000 * (n * sdc - sd * sc))
                         // (n * sdd - sd * sd) END AS slope_micro
        FROM m ORDER BY event_type"""


def events_sessions(events, gap_minutes: int = 30):
    """Sessionization: per user, events sorted by ts; a gap > 30 min
    starts a new session → (user_id, n_sessions, n_events).  The
    per-key ordered state lives inside ``map_groups`` — the streaming-
    window shape Ray Data expresses as a grouped sort."""

    def sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
        # one complete hash bucket of users; vectorized within it
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        new_user = pdf["user_id"] != pdf["user_id"].shift()
        gap = pdf["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        pdf = pdf.assign(new_s=(new_user | gap).astype("int64"))
        return (pdf.groupby("user_id", sort=False)
                .agg(n_sessions=("new_s", "sum"), n_events=("new_s", "size"))
                .reset_index())

    from .shuffle import bucketed_groupby
    return bucketed_groupby(
        events.select_columns(["user_id", "ts", "event_id"]),
        "user_id", sessionize)


def events_pivot(events) -> pd.DataFrame:
    """PIVOT / crosstab: event counts as a WIDE (event_type × hour-of-
    day) matrix → pandas (event_type, h0..h23), all 24 columns always
    present.  The classic activity-heatmap report SQL writes as
    ``SUM(CASE WHEN hour = h THEN 1 END)`` columns.

    Scale shape: each batch collapses to a ≤ #types × 24 crosstab
    partial inside ``map_batches`` (one C ``groupby``/``unstack``
    per batch); the driver folds the bounded partial stream — no
    shuffle at any event count.  The column set is FIXED by the pivot
    dimension (hour), not discovered from data, so the output schema
    is stable on any slice.
    """

    def part(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.assign(h=b["ts"].dt.hour.astype("int64"))
             .groupby(["event_type", "h"]).size().reset_index(name="n"))
        return g

    acc: dict[tuple, int] = {}
    for p in (events.map_batches(part, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        for t, h, n in zip(p["event_type"], p["h"], p["n"]):
            k = (t, int(h))
            acc[k] = acc.get(k, 0) + int(n)

    types = sorted({t for t, _ in acc})
    data = {"event_type": types}
    for h in range(24):
        data[f"h{h}"] = np.array([acc.get((t, h), 0) for t in types],
                                 dtype="int64")
    return pd.DataFrame(data)


def events_pivot_sql(table: str = "events") -> str:
    """DuckDB oracle: explicit CASE column per hour, bit-exact."""
    cols = ",\n".join(
        f"CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) = {h} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS h{h}"
        for h in range(24))
    return f"SELECT event_type, {cols} FROM {table} GROUP BY event_type"


def user_journeys(events, sep: str = ">", max_events: int = 0,
                  chunk_days: int | None = None,
                  num_buckets: int | None = None):
    """Ordered collect (SQL ``string_agg(... ORDER BY ...)`` /
    ``collect_list``): per user, the event-type sequence joined by
    ``sep`` in (ts, event_id) order → (user_id, n_events, journey).
    The sequence-mining prep step (funnel inputs, next-event models).

    ``max_events`` > 0 truncates each journey to its first k events
    (the bounded form for power users); 0 keeps everything.

    Scale shape: one bounded-bucket shuffle on user_id; per bucket a
    single vectorized lexsort + groupby-join (no Python loop over
    users).  ``chunk_days`` is the HOT-KEY escape hatch: with it set,
    the event exchange is keyed (user_id, time-chunk) so a supernode
    user's raw events never co-locate; per-chunk journey PARTIALS
    (already ``sep``-joined, and truncated against the carried
    prefix COUNT when ``max_events`` caps the journey) are all that
    reach the final per-user fold — see ``_user_journeys_chunked``.
    """
    if chunk_days is not None:
        return _user_journeys_chunked(events, sep, max_events,
                                      chunk_days, num_buckets)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        if max_events > 0:
            pdf = pdf.groupby("user_id", sort=False).head(max_events)
        g = pdf.groupby("user_id", sort=False)
        out = g.agg(n_events=("event_id", "size")).reset_index()
        out["journey"] = g["event_type"].agg(sep.join).to_numpy()
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from .shuffle import bucketed_groupby
    return bucketed_groupby(
        events.select_columns(["user_id", "ts", "event_id",
                               "event_type"]),
        "user_id", fold, num_buckets)


_US_PER_DAY = 86_400_000_000


def _chunk_prep(events, span_us: int, value: bool):
    """(user_id, chunk, ts_us, event_id, …) event rows + the per-
    (user, chunk) summary partials both chunked window ops need.
    Returns (event_rows_fn_input_cols, partials) — partials carry
    n (count), and with ``value`` also s (Σ value_c) and last_ts."""
    cols = ["user_id", "ts", "event_id"] + (
        ["value"] if value else ["event_type"])

    def prep(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        ts_us = (df["ts"].astype("datetime64[us]").astype("int64")
                 .to_numpy())
        out = {"user_id": df["user_id"].astype("int64"),
               "chunk": ts_us // span_us,
               "ts_us": ts_us,
               "event_id": df["event_id"].astype("int64")}
        if value:
            out["value_c"] = np.round(
                df["value"].to_numpy() * 100).astype("int64")
        else:
            out["event_type"] = df["event_type"].astype(object)
        return pd.DataFrame(out)

    ev = events.select_columns(cols).map_batches(
        prep, batch_format="pyarrow")

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        ts_us = (df["ts"].astype("datetime64[us]").astype("int64")
                 .to_numpy())
        t = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                          "chunk": ts_us // span_us,
                          "ts_us": ts_us})
        if value:
            t["value_c"] = np.round(
                df["value"].to_numpy() * 100).astype("int64")
            g = t.groupby(["user_id", "chunk"], sort=False).agg(
                n=("ts_us", "size"), s=("value_c", "sum"),
                last_ts=("ts_us", "max")).reset_index()
        else:
            g = t.groupby(["user_id", "chunk"], sort=False).agg(
                n=("ts_us", "size")).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    parts = events.select_columns(
        ["user_id", "ts"] + (["value"] if value else [])).map_batches(
        partial, batch_format="pyarrow")
    return ev, parts


def _user_journeys_chunked(events, sep, max_events, chunk_days,
                           num_buckets):
    """Hot-key form of ``user_journeys``: events exchange keyed
    (user_id, time-chunk); the carried state per chunk is the COUNT
    of the user's events in earlier chunks (exclusive prefix over a
    chunk-summary exchange that moves one row per (user, chunk), not
    per event), which both truncates against ``max_events`` and lets
    every chunk emit its journey PARTIAL independently; the final
    per-user fold concatenates ~n_chunks short strings."""
    from .shuffle import (bucketed_groupby, pad_frame,
                          typed_empty_if_blank)

    span_us = int(chunk_days) * _US_PER_DAY
    ev, parts = _chunk_prep(events, span_us, value=False)

    SCHEMA = {"user_id": "int64", "chunk": "int64", "side": "int8",
              "ts_us": "int64", "event_id": "int64",
              "event_type": "object", "n_before": "int64"}

    def prefixes(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (pdf.groupby(["user_id", "chunk"], sort=False)
             .agg(n=("n", "sum")).reset_index()
             .sort_values(["user_id", "chunk"], kind="mergesort"))
        gu = g.groupby("user_id", sort=False)
        g["n_before"] = (gu["n"].cumsum() - g["n"]).astype("int64")
        if max_events > 0:        # fully-truncated chunks: prunable
            g = g[g["n_before"] < max_events]
        g = g.assign(side=np.ones(len(g), np.int8))
        return pad_frame(g[["user_id", "chunk", "side", "n_before"]],
                         SCHEMA)

    pref = bucketed_groupby(parts, "user_id", prefixes, num_buckets)
    evt = ev.map_batches(
        lambda df: pad_frame(df.assign(
            side=np.zeros(len(df), np.int8)), SCHEMA),
        batch_format="pandas")

    PART_EMPTY = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "chunk": pd.Series([], dtype="int64"),
        "n_local": pd.Series([], dtype="int64"),
        "part": pd.Series([], dtype=object)})

    def chunk_fold(pdf: pd.DataFrame) -> pd.DataFrame:
        e = pdf[pdf["side"] == 0]
        if e.empty:
            return typed_empty_if_blank(PART_EMPTY)
        p = pdf.loc[pdf["side"] == 1,
                    ["user_id", "chunk", "n_before"]]
        e = e.drop(columns=["n_before"]).merge(
            p, on=["user_id", "chunk"], how="inner")
        if e.empty:               # chunk pruned by max_events
            return typed_empty_if_blank(PART_EMPTY)
        e = e.sort_values(["user_id", "chunk", "ts_us", "event_id"],
                          kind="mergesort")
        g = e.groupby(["user_id", "chunk"], sort=False)
        if max_events > 0:
            e = e[(g.cumcount() + e["n_before"]) < max_events]
            g = e.groupby(["user_id", "chunk"], sort=False)
        out = g.agg(n_local=("event_id", "size")).reset_index()
        out["part"] = g["event_type"].agg(sep.join).to_numpy()
        out["n_local"] = out["n_local"].astype("int64")
        return typed_empty_if_blank(
            out[["user_id", "chunk", "n_local", "part"]])

    chunked = bucketed_groupby(evt.union(pref), ["user_id", "chunk"],
                               chunk_fold, num_buckets)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "chunk"], kind="mergesort")
        g = pdf.groupby("user_id", sort=False)
        out = g.agg(n_events=("n_local", "sum")).reset_index()
        out["journey"] = g["part"].agg(sep.join).to_numpy()
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "n_events", "journey"]]

    return bucketed_groupby(chunked, "user_id", final, num_buckets)


def events_asof_orders(events, orders):
    """As-of join (the time-series join Ray Data has no primitive for):
    each event is matched to its user's LATEST order with
    ``o_orderdate <= ts``; ties on the date break toward the larger
    ``o_orderkey``; events with no prior order drop out (inner as-of).

    Scale shape: both sides stream into ONE bounded-bucket shuffle
    keyed by the user — per bucket, a pandas ``merge_asof`` over the
    ts-sorted slices does the backward search vectorized.  No side is
    broadcast, no per-event probe; the partitioning assumption is only
    that one user's events+orders fit a bucket (salt hot users if not).

    → (event_id, asof_orderkey), both int64.
    """

    def tag_events(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame({"u": df["user_id"].astype("int64"),
                             "ts": df["ts"],
                             "id": df["event_id"].astype("int64"),
                             "side": np.zeros(len(df), dtype=np.int8)})

    def tag_orders(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame({"u": df["o_custkey"].astype("int64"),
                             "ts": df["o_orderdate"],
                             "id": df["o_orderkey"].astype("int64"),
                             "side": np.ones(len(df), dtype=np.int8)})

    ev = events.select_columns(["user_id", "ts", "event_id"]).map_batches(
        tag_events, batch_format="pyarrow")
    od = orders.select_columns(["o_custkey", "o_orderdate", "o_orderkey"]) \
        .map_batches(tag_orders, batch_format="pyarrow")

    EMPTY = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                          "asof_orderkey": pd.Series([], dtype="int64")})

    def asof(pdf: pd.DataFrame) -> pd.DataFrame:
        sides = pdf["side"].to_numpy()
        e = pdf[sides == 0].sort_values("ts", kind="mergesort")
        o = pdf[sides == 1].sort_values(["ts", "id"], kind="mergesort")
        if e.empty or o.empty:
            return EMPTY
        m = pd.merge_asof(e, o, on="ts", by="u", direction="backward",
                          suffixes=("", "_o"))
        m = m.dropna(subset=["id_o"])
        if m.empty:
            return EMPTY
        return pd.DataFrame({"event_id": m["id"].astype("int64"),
                             "asof_orderkey": m["id_o"].astype("int64")})

    from .shuffle import bucketed_groupby
    return bucketed_groupby(ev.union(od), "u", asof)


def events_sliding(events, win_minutes: int = 30, slide_minutes: int = 10):
    """Sliding-window aggregate: overlapping ``win``-minute windows
    every ``slide`` minutes → (event_type, window_start, n,
    sum_value_c).  Each event fans out to ``win/slide`` windows inside
    the batch combiner (vectorized repeat, no row explosion through the
    shuffle beyond the pre-aggregated partials)."""
    assert win_minutes % slide_minutes == 0, "win must be a slide multiple"
    k = win_minutes // slide_minutes

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        base = df["ts"].dt.floor(f"{slide_minutes}min")
        frames = []
        for i in range(k):
            frames.append(pd.DataFrame({
                "event_type": df["event_type"],
                "window_start": base - pd.Timedelta(minutes=slide_minutes * i),
                "value_c": np.round(df["value"] * 100).astype("int64")}))
        g = (pd.concat(frames)
             .groupby(["event_type", "window_start"])
             .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    from .shuffle import bucketed_agg
    return bucketed_agg(
        events.select_columns(["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "window_start"],
        {"n": ("n", "sum"), "sum_value_c": ("sum_value_c", "sum")})


def bloom_semi_join(left, right, on: str,
                    left_schema: dict[str, str],
                    right_schema: dict[str, str],
                    how: str = "semi",
                    m_bits: int = 1 << 22, k_hashes: int = 4,
                    num_buckets: int | None = None):
    """Exact distributed semi/anti join with a Bloom pre-filter on the
    LEFT side — the shuffle-row-reduction pattern for "big fact ⋈
    selective dimension": right keys build a broadcast sketch
    (per-block partial bitmaps, streaming driver OR-reduce — the
    ``decontaminate_bloom`` machinery), and left rows whose key
    CANNOT be in right never enter the exchange.  The exact bucketed
    join then resolves the sketch's false positives, so output is
    bit-identical to ``bucketed_join(how=...)`` — the bloom only cuts
    shuffled bytes (by the left's non-matching fraction, the dominant
    term when the dimension is selective).

    ``semi``: bloom-fail rows are guaranteed non-members → dropped
    before the exchange.  ``anti``: bloom-fail rows are guaranteed
    RESULT rows → emitted directly (no exchange at all for them);
    only possible-members go through the exact anti join.

    At 100 TB: the sketch is m_bits/8 bytes (512 KiB default)
    regardless of corpus size; size m to the right's key count
    (~10 bits/key for ~1% false-positive rate).
    """
    import ray

    from .shuffle import bucketed_join, canon_series, typed_empty_if_blank
    from .textstats import _bloom_positions

    if how not in ("semi", "anti"):
        raise ValueError(f"bloom pre-filter only applies to semi/anti, "
                         f"got {how!r}")
    dt = left_schema[on]
    n_bytes = m_bits // 8

    def key_hashes(s: pd.Series) -> np.ndarray:
        # dtype-canonical (the bucketed-join rule): equal key VALUES
        # must hash equally on both sides across Arrow/pandas flips
        return pd.util.hash_array(canon_series(s, dt).to_numpy())

    def partial_bitmap(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"bitmap": pd.Series([], dtype=object)})
        bits = np.zeros(m_bits, dtype=bool)
        for idx in _bloom_positions(key_hashes(b[on]), m_bits, k_hashes):
            bits[idx] = True
        return pd.DataFrame({"bitmap": [np.packbits(bits).tobytes()]})

    merged = np.zeros(n_bytes, dtype=np.uint8)
    partials = right.map_batches(partial_bitmap, batch_format="pandas")
    for pdf in partials.iter_batches(batch_size=None,
                                     batch_format="pandas"):
        for buf in pdf["bitmap"]:            # one small row per block
            merged |= np.frombuffer(buf, dtype=np.uint8)
    sketch_ref = ray.put(merged.tobytes())

    def split(keep_possible: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            bits = np.unpackbits(
                np.frombuffer(ray.get(sketch_ref), dtype=np.uint8)
            ).view(bool)
            ok = np.ones(len(b), dtype=bool)
            if len(b):
                for idx in _bloom_positions(key_hashes(b[on]),
                                            m_bits, k_hashes):
                    ok &= bits[idx]
            out = b[ok] if keep_possible else b[~ok]
            return typed_empty_if_blank(out.reset_index(drop=True))
        return f

    possible = left.map_batches(split(True), batch_format="pandas")
    exact = bucketed_join(possible, right, on=on,
                          left_schema=left_schema,
                          right_schema=right_schema,
                          num_buckets=num_buckets, how=how)
    if how == "semi":
        return exact
    definite = left.map_batches(split(False), batch_format="pandas")
    return exact.union(definite)


def user_window_functions(events, num_buckets: int | None = None,
                          chunk_days: int | None = None):
    """Per-user window functions over the event stream — running sum,
    previous-event lag, and row number — i.e. the SQL

        SUM(value_c)  OVER (PARTITION BY user_id ORDER BY ts, event_id),
        LAG(ts)       OVER (...),
        ROW_NUMBER()  OVER (...)

    shape Ray Data has no primitive for.  The partition key (user_id)
    is the distribution key: by default ONE bounded-bucket shuffle
    lands each user's events whole in one bucket, where the ordered
    scan runs as vectorized pandas group ops (cumsum / shift /
    cumcount) — never a global sort, never per-row Python.

    ``chunk_days`` is the HOT-KEY escape hatch for supernode users
    (one user = half the corpus): the exchange is keyed
    (user_id, time-chunk) so no bucket ever holds a hot user whole,
    and the sequential frame is stitched back with carried prefix
    state — per chunk, the count / Σcents / last-ts of the user's
    earlier chunks, computed from per-(user, chunk) summary rows
    (one row per chunk, not per event) exchanged separately — the
    same carried-prefix pattern ``global_rank`` (ops/analytics.py)
    uses for the ORDER-BY-value case.  Output is bit-identical to
    the default path (pytest-pinned against the SQL oracle).

    → Dataset (event_id, user_id, seq, cum_value_c, delta_us):
    ``seq`` 1-based per user, ``delta_us`` microseconds since the
    user's previous event (-1 for the first), ``cum_value_c`` integer
    cents running total.
    """
    from .shuffle import bucketed_groupby

    if chunk_days is not None:
        return _user_windows_chunked(events, chunk_days, num_buckets)

    def windows(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        val_c = np.round(pdf["value"].to_numpy() * 100).astype("int64")
        pdf = pdf.assign(value_c=val_c,
                         ts_us=pdf["ts"].astype("datetime64[us]")
                         .astype("int64"))
        g = pdf.groupby("user_id", sort=False)
        prev = g["ts_us"].shift()
        delta = (pdf["ts_us"] - prev).fillna(-1).astype("int64")
        return pd.DataFrame({
            "event_id": pdf["event_id"].astype("int64"),
            "user_id": pdf["user_id"].astype("int64"),
            "seq": (g.cumcount() + 1).astype("int64"),
            "cum_value_c": g["value_c"].cumsum().astype("int64"),
            "delta_us": delta})

    return bucketed_groupby(
        events.select_columns(["user_id", "ts", "event_id", "value"]),
        "user_id", windows, num_buckets)


def _user_windows_chunked(events, chunk_days, num_buckets):
    """Hot-key form of ``user_window_functions`` (see its docstring):
    events exchange keyed (user_id, time-chunk); carried prefix state
    (n_before, s_before, prev_ts) rides one summary row per
    (user, chunk) through a separate small exchange and is unioned
    into the event buckets, where each chunk finishes its slice of
    the sequential frame independently."""
    from .shuffle import (bucketed_groupby, pad_frame,
                          typed_empty_if_blank)

    span_us = int(chunk_days) * _US_PER_DAY
    ev, parts = _chunk_prep(events, span_us, value=True)

    SCHEMA = {"user_id": "int64", "chunk": "int64", "side": "int8",
              "ts_us": "int64", "event_id": "int64",
              "value_c": "int64", "n_before": "int64",
              "s_before": "int64", "prev_ts": "int64"}

    def prefixes(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (pdf.groupby(["user_id", "chunk"], sort=False)
             .agg(n=("n", "sum"), s=("s", "sum"),
                  last_ts=("last_ts", "max")).reset_index()
             .sort_values(["user_id", "chunk"], kind="mergesort"))
        gu = g.groupby("user_id", sort=False)
        g["n_before"] = (gu["n"].cumsum() - g["n"]).astype("int64")
        g["s_before"] = (gu["s"].cumsum() - g["s"]).astype("int64")
        g["prev_ts"] = (gu["last_ts"].shift().fillna(-1)
                        .astype("int64"))
        g = g.assign(side=np.ones(len(g), np.int8))
        return pad_frame(
            g[["user_id", "chunk", "side", "n_before", "s_before",
               "prev_ts"]], SCHEMA)

    pref = bucketed_groupby(parts, "user_id", prefixes, num_buckets)
    evt = ev.map_batches(
        lambda df: pad_frame(df.assign(
            side=np.zeros(len(df), np.int8)), SCHEMA),
        batch_format="pandas")

    EMPTY = pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "seq": pd.Series([], dtype="int64"),
        "cum_value_c": pd.Series([], dtype="int64"),
        "delta_us": pd.Series([], dtype="int64")})

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        e = pdf[pdf["side"] == 0]
        if e.empty:
            return EMPTY
        p = pdf.loc[pdf["side"] == 1,
                    ["user_id", "chunk", "n_before", "s_before",
                     "prev_ts"]]
        e = (e.drop(columns=["n_before", "s_before", "prev_ts"])
             .merge(p, on=["user_id", "chunk"], how="inner")
             .sort_values(["user_id", "chunk", "ts_us", "event_id"],
                          kind="mergesort"))
        g = e.groupby(["user_id", "chunk"], sort=False)
        prev = g["ts_us"].shift()
        first = prev.isna().to_numpy()
        prev = prev.fillna(0).astype("int64").to_numpy()
        prev[first] = e["prev_ts"].to_numpy()[first]
        delta = e["ts_us"].to_numpy() - prev
        delta[first & (e["prev_ts"].to_numpy() < 0)] = -1
        return pd.DataFrame({
            "event_id": e["event_id"].astype("int64"),
            "user_id": e["user_id"].astype("int64"),
            "seq": (g.cumcount() + 1 + e["n_before"]).astype("int64"),
            "cum_value_c": (g["value_c"].cumsum()
                            + e["s_before"]).astype("int64"),
            "delta_us": delta.astype("int64")})

    return bucketed_groupby(evt.union(pref), ["user_id", "chunk"],
                            fold, num_buckets)


USER_WINDOW_SQL = """
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                AS BIGINT) AS cum_value_c,
           CAST(COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, -1)
                AS BIGINT) AS delta_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def global_prospects(customer, orders, nation,
                     dormant_since: str = "2000-01-01",
                     num_buckets: int | None = None):
    """TPC-H Q22 shape — untapped prospects per nation: customers whose
    account balance is above the average POSITIVE balance and who have
    placed no order since ``dormant_since``, counted and summed per
    nation.  The three relational moves every "find the dormant
    high-value accounts" report composes: a scalar-subquery threshold,
    a NOT EXISTS anti join, and a grouped aggregate.

    Exactness: the threshold test ``acctbal > avg(positive acctbal)``
    runs as an INTEGER cross-multiplication — ``acctbal_c · n > S``
    where (n, S) fold from per-batch (count, Σcents) partials — so
    there is no float average on either side and the SQL oracle
    matches bit-for-bit.  The order side pre-shrinks to per-batch
    distinct custkeys before the bucketed anti join (never broadcast);
    the per-nation fold is a bounded driver fold (≤ 25 keys), nation
    names attach from the tiny dim.

    → pandas (n_name, n_prospects, total_acctbal_c) sorted by n_name.
    """
    from .shuffle import bucketed_join

    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = np.round(b["c_acctbal"] * 100).astype("int64")
        pos = c[c > 0]
        return pd.DataFrame({"n": [np.int64(len(pos))],
                             "s": [np.int64(pos.sum())]})

    parts = (customer.select_columns(["c_acctbal"])
             .map_batches(bal_partial, batch_format="pandas").to_pandas())
    n_pos, s_pos = int(parts["n"].sum()), int(parts["s"].sum())

    def rich(b: pd.DataFrame) -> pd.DataFrame:
        c = np.round(b["c_acctbal"] * 100).astype("int64")
        m = c * n_pos > s_pos           # acctbal > S/n without the float
        out = b.loc[m, ["c_custkey", "c_nationkey"]].copy()
        out["acctbal_c"] = c[m]
        return out.astype({"c_custkey": "int64", "c_nationkey": "int64"})

    rich_ds = customer.select_columns(
        ["c_custkey", "c_nationkey", "c_acctbal"]) \
        .map_batches(rich, batch_format="pandas")

    cut = pd.Timestamp(dormant_since)

    def recent_keys(b: pd.DataFrame) -> pd.DataFrame:
        m = b["o_orderdate"] >= cut
        return pd.DataFrame(
            {"c_custkey": b.loc[m, "o_custkey"].drop_duplicates()
             .astype("int64")})

    okeys = orders.select_columns(["o_custkey", "o_orderdate"]) \
        .map_batches(recent_keys, batch_format="pandas")

    dormant = bucketed_join(
        rich_ds, okeys, on="c_custkey",
        left_schema={"c_custkey": "int64", "c_nationkey": "int64",
                     "acctbal_c": "int64"},
        right_schema={"c_custkey": "int64"},
        num_buckets=num_buckets, how="anti")

    def nat_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("c_nationkey", sort=False)["acctbal_c"] \
             .agg(["size", "sum"]).reset_index()
        return pd.DataFrame({"c_nationkey": g["c_nationkey"],
                             "n_prospects": g["size"].astype("int64"),
                             "total_acctbal_c": g["sum"].astype("int64")})

    folded = (dormant.map_batches(nat_partial, batch_format="pandas")
              .to_pandas())                       # ≤ 25 keys × blocks
    agg = (folded.groupby("c_nationkey")[["n_prospects",
                                          "total_acctbal_c"]]
           .sum().reset_index()) if len(folded) else pd.DataFrame(
        {"c_nationkey": pd.Series([], dtype="int64"),
         "n_prospects": pd.Series([], dtype="int64"),
         "total_acctbal_c": pd.Series([], dtype="int64")})
    nmap = (nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
            .set_index("n_nationkey")["n_name"])
    agg["n_name"] = agg["c_nationkey"].map(nmap).astype(object)
    out = (agg[["n_name", "n_prospects", "total_acctbal_c"]]
           .astype({"n_prospects": "int64", "total_acctbal_c": "int64"})
           .sort_values("n_name", kind="mergesort").reset_index(drop=True))
    return out


def global_prospects_sql(dormant_since: str = "2000-01-01") -> str:
    """DuckDB oracle for ``global_prospects`` (same integer
    cross-multiplied threshold, no float average)."""
    return f"""
        WITH bal AS (
          SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c, c_custkey,
                 c_nationkey
          FROM customer),
        thr AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
          FROM bal WHERE c > 0)
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_prospects,
               CAST(SUM(b.c) AS BIGINT) AS total_acctbal_c
        FROM bal b JOIN nation n ON b.c_nationkey = n.n_nationkey, thr
        WHERE b.c * thr.n > thr.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = b.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP '{dormant_since}')
        GROUP BY n.n_name
        ORDER BY n.n_name"""


def customers_without_events(customer, events, num_buckets: int | None = None):
    """Distributed NOT EXISTS → (c_custkey, c_name) for customers with
    no event activity.  Both sides ride the bucketed shuffle (a key's
    customer row and all its event keys land in one bucket), so no id
    set is ever broadcast or collected — the anti-join shape J6-style
    result reconciliation needs at corpus scale.

    The event side is pre-shrunk to per-batch distinct keys, so the
    shuffle moves at most one row per (user, block), not one per event.
    """
    from .shuffle import bucketed_join

    keys = events.map_batches(
        lambda b: pd.DataFrame(
            {"c_custkey": b["user_id"].drop_duplicates()
             .to_numpy(dtype="int64")}),
        batch_format="pandas")
    return bucketed_join(
        customer, keys, on="c_custkey",
        left_schema={"c_custkey": "int64", "c_name": "object"},
        right_schema={"c_custkey": "int64"},
        num_buckets=num_buckets, how="anti")


def funnel_counts(events, steps=("view", "click", "purchase"),
                  num_buckets: int | None = None):
    """Conversion funnel (ordered sequence-pattern matching, the event-
    analytics shape windowed aggregates can't express): a user reaches
    step k iff for every i<=k there is a step-i event STRICTLY after
    their chosen step-(i-1) event, greedily taking each step's earliest
    qualifying timestamp.

    → (step_idx, step, n_users): users reaching at least each step —
    n_users is non-increasing down the funnel.

    Scale shape: one bounded-bucket shuffle on user_id; each user's
    greedy walk runs inside their bucket over their ts-sorted events;
    the per-bucket output is at most len(steps) count rows, so the
    final fold touches buckets×steps tiny rows (returned as a pandas
    frame, like the other fixed-size summaries).
    """
    from .shuffle import bucketed_groupby

    step_list = list(steps)
    n_steps = len(step_list)

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        reached = np.zeros(n_steps, dtype=np.int64)
        for _, g in pdf.groupby("user_id", sort=False):
            types = g["event_type"].to_numpy()
            tss = g["ts"].to_numpy()
            cur = None
            for i, s in enumerate(step_list):
                m = (types == s) if cur is None else \
                    ((types == s) & (tss > cur))
                idx = np.flatnonzero(m)
                if not len(idx):
                    break
                cur = tss[idx[0]]
                reached[i] += 1
        return pd.DataFrame({
            "step_idx": np.arange(n_steps, dtype=np.int64),
            "n_users": reached})

    partials = bucketed_groupby(
        events.select_columns(["user_id", "ts", "event_type", "event_id"]),
        "user_id", walk, num_buckets).to_pandas()
    out = (partials.groupby("step_idx")["n_users"].sum().reset_index()
           .sort_values("step_idx").reset_index(drop=True))
    out["step"] = [step_list[i] for i in out["step_idx"]]
    out["n_users"] = out["n_users"].astype("int64")
    return out[["step_idx", "step", "n_users"]]


def revenue_by_nation(orders, customer, nation,
                      num_buckets: int | None = None):
    """Star-schema aggregate (revenue per nation): the three-way shape
    with one of each join strategy — the FACT side collapses through a
    per-batch combiner before anything moves, the MID dimension
    (customer: grows with the data, too big to broadcast) joins through
    the bounded-bucket hash join, and the TINY dimension (nation: fixed
    25 rows) is a ray.put broadcast lookup.

    → (n_name, revenue_c, n_orders), integer cents.
    """
    import ray

    from .shuffle import bucketed_agg, bucketed_join

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            total_c=np.round(df["o_totalprice"] * 100).astype("int64"))
        return (df.groupby("o_custkey")
                .agg(revenue_c=("total_c", "sum"),
                     n_orders=("total_c", "size"))
                .reset_index())

    per_cust = bucketed_agg(
        orders.map_batches(partial, batch_format="pandas"),
        "o_custkey",
        {"revenue_c": ("revenue_c", "sum"), "n_orders": ("n_orders", "sum")},
        num_buckets)

    cust = customer.map_batches(
        lambda d: pd.DataFrame({
            "o_custkey": d["c_custkey"].astype("int64"),
            "c_nationkey": d["c_nationkey"].astype("int64")}),
        batch_format="pandas")
    joined = bucketed_join(
        per_cust, cust, on="o_custkey",
        left_schema={"o_custkey": "int64", "revenue_c": "int64",
                     "n_orders": "int64"},
        right_schema={"o_custkey": "int64", "c_nationkey": "int64"},
        num_buckets=num_buckets, how="inner")

    nd = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    nref = ray.put(dict(zip(nd["n_nationkey"].astype("int64"),
                            nd["n_name"])))

    def attach(d: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(nref)
        return pd.DataFrame({"n_name": d["c_nationkey"].map(lookup),
                             "revenue_c": d["revenue_c"],
                             "n_orders": d["n_orders"]})

    return bucketed_agg(
        joined.map_batches(attach, batch_format="pandas"),
        "n_name",
        {"revenue_c": ("revenue_c", "sum"), "n_orders": ("n_orders", "sum")},
        num_buckets)


def promo_revenue_share(lineitem, part, promo_type: str = "ECONOMY",
                        year: int = 1996,
                        num_buckets: int | None = None) -> pd.DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one ship-year's
    revenue that came from parts of one type → one row
    (promo_cc, total_cc, share_micro) — exact centi-cent sums and an
    integer micro-unit ratio (promo·1e6 // total), all bit-exact.

    Scale shape: lineitem date-filters and collapses to per-batch
    (partkey, cents) partials before the ONE bucketed part join; each
    bucket folds to a single (promo, total) pair via ``post``, so the
    driver sums ≤ #buckets rows.
    """
    from .shuffle import bucketed_join

    def li_f(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"].dt.year == year]
        price_c = np.round(b["l_extendedprice"] * 100).astype("int64")
        disc_pct = np.round(b["l_discount"] * 100).astype("int64")
        g = pd.DataFrame({
            "p_partkey": b["l_partkey"].astype("int64"),
            "rev_cc": price_c * (100 - disc_pct)})
        return (g.groupby("p_partkey", sort=False)["rev_cc"].sum()
                .reset_index())

    def part_f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": b["p_partkey"].astype("int64"),
            "is_promo": (b["p_type"] == promo_type).astype("int64")})

    def fold(m: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "promo_cc": [int((m["rev_cc"] * m["is_promo"]).sum())],
            "total_cc": [int(m["rev_cc"].sum())]})

    joined = bucketed_join(
        lineitem.map_batches(li_f, batch_format="pandas"),
        part.map_batches(part_f, batch_format="pandas"),
        on="p_partkey",
        left_schema={"p_partkey": "int64", "rev_cc": "int64"},
        right_schema={"p_partkey": "int64", "is_promo": "int64"},
        num_buckets=num_buckets, post=fold, how="inner")

    promo = total = 0
    for p in joined.iter_batches(batch_format="pandas"):
        promo += int(p["promo_cc"].sum())
        total += int(p["total_cc"].sum())
    share = promo * 1_000_000 // total if total else 0
    return pd.DataFrame({"promo_cc": pd.array([promo], dtype="int64"),
                         "total_cc": pd.array([total], dtype="int64"),
                         "share_micro": pd.array([share],
                                                 dtype="int64")})


def local_supplier_volume(customer, orders, lineitem, supplier,
                          nation, region, region_name: str = "ASIA",
                          year: int = 1996,
                          num_buckets: int | None = None) -> pd.DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue from lineitems
    where the CUSTOMER and the SUPPLIER share a nation inside one
    region, for one order-date year → pandas (n_name, revenue_c)
    in exact centi-cent integers (cents × integer discount percent,
    the q1/q3 convention), revenue descending.  The deepest join tree
    in the repo — all six TPC-H tables, one of each strategy:

    - region ⋈ nation (25 × 5 rows) folds to a broadcast nationkey →
      name map on the driver;
    - orders date-filters in-batch, joins customer (mid dim) through
      a bucketed exchange on custkey;
    - lineitem collapses to (orderkey, suppkey, cents) rows in-batch,
      joins supplier (mid dim) on suppkey bucketed, then the order
      side on orderkey bucketed; the same-nation equality is a
      post-filter inside that last exchange;
    - the final per-nation sum is a bounded driver fold (≤ 25 keys).
    """
    import ray

    from .shuffle import bucketed_join

    nd = nation.select_columns(
        ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    rd_ = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    keep_regions = set(
        rd_.loc[rd_["r_name"] == region_name, "r_regionkey"]
        .astype("int64"))
    nd = nd[nd["n_regionkey"].astype("int64").isin(keep_regions)]
    name_of = dict(zip(nd["n_nationkey"].astype("int64"), nd["n_name"]))
    nref = ray.put(name_of)

    def ord_f(b: pd.DataFrame) -> pd.DataFrame:
        yr = b["o_orderdate"].dt.year
        b = b[yr == year]
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64"),
            "o_custkey": b["o_custkey"].astype("int64")})

    def cust_f(b: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(nref)
        nk = b["c_nationkey"].astype("int64")
        b = b[nk.isin(lookup.keys())]
        return pd.DataFrame({
            "o_custkey": b["c_custkey"].astype("int64"),
            "c_nationkey": b["c_nationkey"].astype("int64")})

    cust_orders = bucketed_join(
        orders.map_batches(ord_f, batch_format="pandas"),
        customer.map_batches(cust_f, batch_format="pandas"),
        on="o_custkey",
        left_schema={"o_orderkey": "int64", "o_custkey": "int64"},
        right_schema={"o_custkey": "int64", "c_nationkey": "int64"},
        num_buckets=num_buckets, how="inner").map_batches(
        lambda b: b[["o_orderkey", "c_nationkey"]],
        batch_format="pandas")

    def li_f(b: pd.DataFrame) -> pd.DataFrame:
        # cents × integer percent — exact, no float-rounding-mode
        # divergence vs the SQL oracle (the q1/q3 convention)
        price_c = np.round(b["l_extendedprice"] * 100).astype("int64")
        disc_pct = np.round(b["l_discount"] * 100).astype("int64")
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64"),
            "l_suppkey": b["l_suppkey"].astype("int64"),
            "rev_c": price_c * (100 - disc_pct)})

    def supp_f(b: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(nref)
        nk = b["s_nationkey"].astype("int64")
        b = b[nk.isin(lookup.keys())]
        return pd.DataFrame({
            "l_suppkey": b["s_suppkey"].astype("int64"),
            "s_nationkey": b["s_nationkey"].astype("int64")})

    li_supp = bucketed_join(
        lineitem.map_batches(li_f, batch_format="pandas"),
        supplier.map_batches(supp_f, batch_format="pandas"),
        on="l_suppkey",
        left_schema={"l_orderkey": "int64", "l_suppkey": "int64",
                     "rev_c": "int64"},
        right_schema={"l_suppkey": "int64", "s_nationkey": "int64"},
        num_buckets=num_buckets, how="inner").map_batches(
        lambda b: b.rename(columns={"l_orderkey": "o_orderkey"})
        [["o_orderkey", "s_nationkey", "rev_c"]],
        batch_format="pandas")

    def same_nation(m: pd.DataFrame) -> pd.DataFrame:
        m = m[m["c_nationkey"] == m["s_nationkey"]]
        return (m.groupby("s_nationkey", sort=False)["rev_c"].sum()
                .reset_index())

    joined = bucketed_join(
        li_supp, cust_orders, on="o_orderkey",
        left_schema={"o_orderkey": "int64", "s_nationkey": "int64",
                     "rev_c": "int64"},
        right_schema={"o_orderkey": "int64", "c_nationkey": "int64"},
        num_buckets=num_buckets, post=same_nation, how="inner")

    acc: dict[int, int] = {}
    for p in joined.iter_batches(batch_format="pandas"):
        for nk, rc in zip(p["s_nationkey"], p["rev_c"]):
            acc[int(nk)] = acc.get(int(nk), 0) + int(rc)
    out = pd.DataFrame(
        [(name_of[nk], rc) for nk, rc in acc.items()],
        columns=["n_name", "revenue_c"])
    out["revenue_c"] = out["revenue_c"].astype("int64")
    return (out.sort_values(["revenue_c", "n_name"],
                            ascending=[False, True], kind="mergesort")
            .reset_index(drop=True))


def large_volume_customers(customer, orders, lineitem,
                           threshold: int = 250, k: int = 100,
                           num_buckets: int | None = None) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds ``threshold``, joined to their customer,
    top-``k`` by (o_totalprice DESC, o_orderdate ASC, o_orderkey ASC)
    → pandas (rank, c_name, o_custkey, o_orderkey, o_orderdate,
    total_c, qty) with integer cents / integer quantity.

    Scale shape: the HAVING subquery collapses lineitem to per-batch
    (orderkey, qty) partials before ONE bucketed sum; the > threshold
    survivors (selective by construction) join orders then customer
    through bucketed exchanges; the top-k is the per-block k-candidate
    cut — no distributed sort anywhere.
    """
    from .shuffle import bucketed_agg, bucketed_join

    def qty_part(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.assign(qty=np.round(b["l_quantity"]).astype("int64"))
             .groupby("l_orderkey", sort=False)["qty"].sum()
             .reset_index())
        g["l_orderkey"] = g["l_orderkey"].astype("int64")
        return g

    per_order = bucketed_agg(
        lineitem.map_batches(qty_part, batch_format="pandas"),
        "l_orderkey", {"qty": ("qty", "sum")}, num_buckets)
    big = per_order.map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b.loc[b["qty"] > threshold,
                                "l_orderkey"].astype("int64"),
            "qty": b.loc[b["qty"] > threshold, "qty"].astype("int64")}),
        batch_format="pandas")

    ords = orders.map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64"),
            "o_custkey": b["o_custkey"].astype("int64"),
            "o_orderdate": b["o_orderdate"],
            "total_c": np.round(b["o_totalprice"] * 100)
            .astype("int64")}),
        batch_format="pandas")
    j1 = bucketed_join(
        ords, big, on="o_orderkey",
        left_schema={"o_orderkey": "int64", "o_custkey": "int64",
                     "o_orderdate": "datetime64[us]",
                     "total_c": "int64"},
        right_schema={"o_orderkey": "int64", "qty": "int64"},
        num_buckets=num_buckets, how="inner")

    cust = customer.map_batches(
        lambda b: pd.DataFrame({
            "o_custkey": b["c_custkey"].astype("int64"),
            "c_name": b["c_name"]}),
        batch_format="pandas")
    j2 = bucketed_join(
        j1, cust, on="o_custkey",
        left_schema={"o_orderkey": "int64", "o_custkey": "int64",
                     "o_orderdate": "datetime64[us]",
                     "total_c": "int64", "qty": "int64"},
        right_schema={"o_custkey": "int64", "c_name": "object"},
        num_buckets=num_buckets, how="inner")

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["total_c", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True], kind="mergesort").head(k)

    acc: pd.DataFrame | None = None
    for p in (j2.map_batches(cut, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        acc = p if acc is None else pd.concat([acc, p],
                                              ignore_index=True)
        if len(acc) > 4 * k:
            acc = cut(acc)
    if acc is None or acc.empty:
        return pd.DataFrame(columns=["rank", "c_name", "o_custkey",
                                     "o_orderkey", "o_orderdate",
                                     "total_c", "qty"])
    out = cut(acc).reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype="int64"))
    return out[["rank", "c_name", "o_custkey", "o_orderkey",
                "o_orderdate", "total_c", "qty"]]


def revenue_rollup(orders, customer, nation,
                   num_buckets: int | None = None) -> pd.DataFrame:
    """ROLLUP(n_name, order_year) revenue — the warehouse
    subtotal/grand-total shape (SQL ``GROUP BY ROLLUP``): one row per
    (nation, year), one subtotal row per nation (``order_year = -1``),
    one grand total (``n_name = 'ALL'``), integer cents.

    Rolled-up levels use explicit sentinels ('ALL' / -1) instead of
    NULLs so the comparison contract stays dtype-stable on both sides.

    Scale shape: fact rows collapse to per-batch (custkey, year)
    partials before the ONE bucketed exchange (the customer join);
    nation attaches via ray.put broadcast; the final fold is
    driver-side over ≤ blocks × (#nations × #years) bounded partial
    rows, and the coarser rollup levels are re-aggregates of that
    finest level (≤ 200 rows) — never a second pass over the fact.
    """
    import ray

    from .shuffle import bucketed_join

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.assign(
                order_year=df["o_orderdate"].dt.year.astype("int64"),
                c=np.round(df["o_totalprice"] * 100).astype("int64"))
             .groupby(["o_custkey", "order_year"])
             .agg(revenue_c=("c", "sum"), n_orders=("c", "size"))
             .reset_index())
        g["o_custkey"] = g["o_custkey"].astype("int64")
        return g

    cust = customer.map_batches(
        lambda d: pd.DataFrame({
            "o_custkey": d["c_custkey"].astype("int64"),
            "c_nationkey": d["c_nationkey"].astype("int64")}),
        batch_format="pandas")
    joined = bucketed_join(
        orders.map_batches(partial, batch_format="pandas"), cust,
        on="o_custkey",
        left_schema={"o_custkey": "int64", "order_year": "int64",
                     "revenue_c": "int64", "n_orders": "int64"},
        right_schema={"o_custkey": "int64", "c_nationkey": "int64"},
        num_buckets=num_buckets, how="inner")

    nd = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    nref = ray.put(dict(zip(nd["n_nationkey"].astype("int64"),
                            nd["n_name"])))

    def attach(d: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(nref)
        return (d.assign(n_name=d["c_nationkey"].map(lookup))
                .groupby(["n_name", "order_year"])
                .agg(revenue_c=("revenue_c", "sum"),
                     n_orders=("n_orders", "sum"))
                .reset_index())

    acc: dict[tuple, list] = {}
    for p in (joined.map_batches(attach, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        for name, yr, rev, n in zip(p["n_name"], p["order_year"],
                                    p["revenue_c"], p["n_orders"]):
            cur = acc.setdefault((name, int(yr)), [0, 0])
            cur[0] += int(rev)
            cur[1] += int(n)

    fine = pd.DataFrame(
        [(k[0], k[1], v[0], v[1]) for k, v in acc.items()],
        columns=["n_name", "order_year", "revenue_c", "n_orders"])
    sub = (fine.groupby("n_name", as_index=False)
           [["revenue_c", "n_orders"]].sum().assign(order_year=-1))
    total = pd.DataFrame({
        "n_name": ["ALL"], "order_year": [-1],
        "revenue_c": [fine["revenue_c"].sum()],
        "n_orders": [fine["n_orders"].sum()]})
    cols = ["n_name", "order_year", "revenue_c", "n_orders"]
    out = pd.concat([fine[cols], sub[cols], total[cols]],
                    ignore_index=True)
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    return (out.sort_values(["n_name", "order_year"], kind="mergesort")
            .reset_index(drop=True))


def retention_cohorts(events, signup_type: str = "signup",
                      num_buckets: int | None = None):
    """Retention-cohort matrix: users cohort by the Monday-aligned week
    of their FIRST ``signup_type`` event; a user is retained at offset
    k iff they have ANY event in cohort-week + k (events before signup
    don't count; users who never sign up are excluded).

    → (cohort_week, week_offset, n_users).  Weeks are integer indices
    ``(days_since_epoch + 3) // 7`` — identical arithmetic on both
    sides of the oracle, no date_trunc dialect to match.

    Scale shape: one user-bucketed shuffle (per-user cohort + distinct
    offsets computed bucket-locally), then a bounded-bucket count on
    the (cohort, offset) pair — both key spaces are calendar-bounded,
    orders of magnitude below user count.
    """
    from .shuffle import bucketed_agg, bucketed_groupby

    epoch = pd.Timestamp("1970-01-01")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        days = (pdf["ts"].dt.normalize() - epoch).dt.days.to_numpy()
        pdf = pdf.assign(wk=(days + 3) // 7)
        out_c, out_o = [], []
        for _, g in pdf.groupby("user_id", sort=False):
            su = g.loc[g["event_type"] == signup_type, "wk"]
            if not len(su):
                continue
            cwk = int(su.min())
            offs = np.unique(g.loc[g["wk"] >= cwk, "wk"].to_numpy() - cwk)
            out_c.extend([cwk] * len(offs))
            out_o.extend(offs.tolist())
        return pd.DataFrame({
            "cohort_week": np.array(out_c, dtype=np.int64),
            "week_offset": np.array(out_o, dtype=np.int64)})

    pairs = bucketed_groupby(
        events.select_columns(["user_id", "ts", "event_type"]),
        "user_id", per_user, num_buckets)
    return bucketed_agg(pairs, ["cohort_week", "week_offset"],
                        {"n_users": ("week_offset", "size")}, num_buckets)


def trade_volume(supplier, lineitem, orders, customer, nation,
                 nation_a: str = "NATION_1", nation_b: str = "NATION_2",
                 year_from: int = 1995, year_to: int = 1996,
                 num_buckets: int | None = None) -> pd.DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations — supplier in one, customer in the other, both directions
    — per lineitem SHIP year → pandas (supp_nation, cust_nation,
    l_year, revenue_c), exact centi-cent integers (the q1/q5
    convention), sorted by (supp_nation, cust_nation, l_year).

    Scale shape: nation is a tiny broadcast map; lineitem date-filters
    and collapses to (orderkey, suppkey, rev_c, year) in-batch; ONE
    bucketed exchange attaches the supplier nation (rows for the two
    nations only survive), orders+customer attach the customer nation
    through a custkey exchange, the final orderkey exchange post-
    filters the cross-nation pairs and pre-aggregates per bucket; the
    driver folds ≤ 2 × 2 × n_years keys.
    """
    import ray

    from .shuffle import bucketed_join

    nd = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    keep = nd[nd["n_name"].isin([nation_a, nation_b])]
    name_of = dict(zip(keep["n_nationkey"].astype("int64"),
                       keep["n_name"]))
    nref = ray.put(name_of)

    def li_f(b: pd.DataFrame) -> pd.DataFrame:
        yr = b["l_shipdate"].dt.year
        b = b[(yr >= year_from) & (yr <= year_to)]
        price_c = np.round(b["l_extendedprice"] * 100).astype("int64")
        disc_pct = np.round(b["l_discount"] * 100).astype("int64")
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64"),
            "l_suppkey": b["l_suppkey"].astype("int64"),
            "rev_c": price_c * (100 - disc_pct),
            "l_year": b["l_shipdate"].dt.year.astype("int64")})

    def supp_f(b: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(nref)
        nk = b["s_nationkey"].astype("int64")
        b = b[nk.isin(lookup.keys())]
        return pd.DataFrame({
            "l_suppkey": b["s_suppkey"].astype("int64"),
            "s_nationkey": b["s_nationkey"].astype("int64")})

    li_supp = bucketed_join(
        lineitem.map_batches(li_f, batch_format="pandas"),
        supplier.map_batches(supp_f, batch_format="pandas"),
        on="l_suppkey",
        left_schema={"l_orderkey": "int64", "l_suppkey": "int64",
                     "rev_c": "int64", "l_year": "int64"},
        right_schema={"l_suppkey": "int64", "s_nationkey": "int64"},
        num_buckets=num_buckets, how="inner").map_batches(
        lambda b: b[["l_orderkey", "s_nationkey", "rev_c", "l_year"]],
        batch_format="pandas")

    def cust_f(b: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(nref)
        nk = b["c_nationkey"].astype("int64")
        b = b[nk.isin(lookup.keys())]
        return pd.DataFrame({
            "o_custkey": b["c_custkey"].astype("int64"),
            "c_nationkey": b["c_nationkey"].astype("int64")})

    cust_orders = bucketed_join(
        orders.map_batches(
            lambda b: pd.DataFrame({
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_custkey": b["o_custkey"].astype("int64")}),
            batch_format="pandas"),
        customer.map_batches(cust_f, batch_format="pandas"),
        on="o_custkey",
        left_schema={"o_orderkey": "int64", "o_custkey": "int64"},
        right_schema={"o_custkey": "int64", "c_nationkey": "int64"},
        num_buckets=num_buckets, how="inner").map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"})
        [["l_orderkey", "c_nationkey"]],
        batch_format="pandas")

    def cross_pairs(m: pd.DataFrame) -> pd.DataFrame:
        m = m[m["s_nationkey"] != m["c_nationkey"]]
        return (m.groupby(["s_nationkey", "c_nationkey", "l_year"],
                          sort=False)["rev_c"].sum().reset_index())

    joined = bucketed_join(
        li_supp, cust_orders, on="l_orderkey",
        left_schema={"l_orderkey": "int64", "s_nationkey": "int64",
                     "rev_c": "int64", "l_year": "int64"},
        right_schema={"l_orderkey": "int64", "c_nationkey": "int64"},
        num_buckets=num_buckets, post=cross_pairs, how="inner")

    acc: dict[tuple, int] = {}
    for p in joined.iter_batches(batch_format="pandas"):
        for sk, ck, yr, rc in zip(p["s_nationkey"], p["c_nationkey"],
                                  p["l_year"], p["rev_c"]):
            k = (int(sk), int(ck), int(yr))
            acc[k] = acc.get(k, 0) + int(rc)
    out = pd.DataFrame(
        [(name_of[sk], name_of[ck], yr, rc)
         for (sk, ck, yr), rc in acc.items()],
        columns=["supp_nation", "cust_nation", "l_year", "revenue_c"])
    if not len(out):
        return pd.DataFrame({"supp_nation": pd.Series([], dtype=object),
                             "cust_nation": pd.Series([], dtype=object),
                             "l_year": pd.Series([], dtype="int64"),
                             "revenue_c": pd.Series([], dtype="int64")})
    out["l_year"] = out["l_year"].astype("int64")
    out["revenue_c"] = out["revenue_c"].astype("int64")
    return (out.sort_values(["supp_nation", "cust_nation", "l_year"],
                            kind="mergesort").reset_index(drop=True))


def market_share(part, supplier, lineitem, orders, customer, nation,
                 region, region_name: str = "ASIA",
                 nation_name: str = "NATION_3",
                 part_type: str = "STANDARD",
                 year_from: int = 1995, year_to: int = 1996,
                 num_buckets: int | None = None) -> pd.DataFrame:
    """TPC-H Q8 shape (national market share): among revenue from
    ``part_type`` parts ordered (in ``year_from..year_to``) by
    customers in ``region_name``, the share supplied by
    ``nation_name``, per ORDER year → pandas (o_year, nation_rev_c,
    total_rev_c, share_e6) with ``share_e6 = 10⁶·nation // total``
    exact integer — no float share on either side of the oracle.

    Scale shape: part filters to a keyset via an in-batch projection
    and joins lineitem through a partkey exchange (never broadcast —
    a type-filtered part set scales with the catalog); supplier
    attaches is-target-nation through a suppkey exchange; orders
    year-filter + customer region-filter meet through a custkey
    exchange; the final orderkey exchange pre-aggregates
    (o_year, is_target) partials; the driver folds ≤ 2·n_years keys.
    """
    import ray

    from .shuffle import bucketed_join

    nd = nation.select_columns(
        ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    rd_ = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(
        rd_.loc[rd_["r_name"] == region_name, "r_regionkey"]
        .astype("int64"))
    cust_nations = set(
        nd.loc[nd["n_regionkey"].astype("int64").isin(region_keys),
               "n_nationkey"].astype("int64"))
    target = set(nd.loc[nd["n_name"] == nation_name, "n_nationkey"]
                 .astype("int64"))
    cref = ray.put(cust_nations)
    tref = ray.put(target)

    li_part = bucketed_join(
        lineitem.map_batches(
            lambda b: pd.DataFrame({
                "l_partkey": b["l_partkey"].astype("int64"),
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "l_suppkey": b["l_suppkey"].astype("int64"),
                "rev_c": (np.round(b["l_extendedprice"] * 100)
                          .astype("int64")
                          * (100 - np.round(b["l_discount"] * 100)
                             .astype("int64")))}),
            batch_format="pandas"),
        part.map_batches(
            lambda b: b.loc[b["p_type"] == part_type,
                            ["p_partkey"]].rename(
                columns={"p_partkey": "l_partkey"})
            .astype("int64"),
            batch_format="pandas"),
        on="l_partkey",
        left_schema={"l_partkey": "int64", "l_orderkey": "int64",
                     "l_suppkey": "int64", "rev_c": "int64"},
        right_schema={"l_partkey": "int64"},
        num_buckets=num_buckets, how="semi").map_batches(
        lambda b: b[["l_orderkey", "l_suppkey", "rev_c"]],
        batch_format="pandas")

    def supp_f(b: pd.DataFrame) -> pd.DataFrame:
        tg = ray.get(tref)
        return pd.DataFrame({
            "l_suppkey": b["s_suppkey"].astype("int64"),
            "is_target": b["s_nationkey"].astype("int64")
            .isin(tg).astype("int64")})

    li_supp = bucketed_join(
        li_part, supplier.map_batches(supp_f, batch_format="pandas"),
        on="l_suppkey",
        left_schema={"l_orderkey": "int64", "l_suppkey": "int64",
                     "rev_c": "int64"},
        right_schema={"l_suppkey": "int64", "is_target": "int64"},
        num_buckets=num_buckets, how="inner").map_batches(
        lambda b: b[["l_orderkey", "rev_c", "is_target"]],
        batch_format="pandas")

    def ord_f(b: pd.DataFrame) -> pd.DataFrame:
        yr = b["o_orderdate"].dt.year
        b = b[(yr >= year_from) & (yr <= year_to)]
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64"),
            "o_custkey": b["o_custkey"].astype("int64"),
            "o_year": b["o_orderdate"].dt.year.astype("int64")})

    def cust_f(b: pd.DataFrame) -> pd.DataFrame:
        cn = ray.get(cref)
        b = b[b["c_nationkey"].astype("int64").isin(cn)]
        return pd.DataFrame({
            "o_custkey": b["c_custkey"].astype("int64")})

    region_orders = bucketed_join(
        orders.map_batches(ord_f, batch_format="pandas"),
        customer.map_batches(cust_f, batch_format="pandas"),
        on="o_custkey",
        left_schema={"o_orderkey": "int64", "o_custkey": "int64",
                     "o_year": "int64"},
        right_schema={"o_custkey": "int64"},
        num_buckets=num_buckets, how="semi").map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"})
        [["l_orderkey", "o_year"]],
        batch_format="pandas")

    def partials(m: pd.DataFrame) -> pd.DataFrame:
        return (m.groupby(["o_year", "is_target"], sort=False)["rev_c"]
                .sum().reset_index())

    joined = bucketed_join(
        li_supp, region_orders, on="l_orderkey",
        left_schema={"l_orderkey": "int64", "rev_c": "int64",
                     "is_target": "int64"},
        right_schema={"l_orderkey": "int64", "o_year": "int64"},
        num_buckets=num_buckets, post=partials, how="inner")

    acc: dict[tuple, int] = {}
    for p in joined.iter_batches(batch_format="pandas"):
        for yr, it, rc in zip(p["o_year"], p["is_target"], p["rev_c"]):
            k = (int(yr), int(it))
            acc[k] = acc.get(k, 0) + int(rc)
    years = sorted({yr for yr, _ in acc})
    rows = []
    for yr in years:
        nat = acc.get((yr, 1), 0)
        tot = nat + acc.get((yr, 0), 0)
        rows.append((yr, nat, tot, 1_000_000 * nat // tot if tot else 0))
    return pd.DataFrame(
        rows, columns=["o_year", "nation_rev_c", "total_rev_c",
                       "share_e6"]).astype(
        {"o_year": "int64", "nation_rev_c": "int64",
         "total_rev_c": "int64", "share_e6": "int64"})


_Q19_BRANCHES = (("Brand#2", 1, 11, 1, 5),
                 ("Brand#4", 10, 20, 1, 10),
                 ("Brand#19", 20, 30, 1, 15))


def discounted_revenue(lineitem, part,
                       branches=_Q19_BRANCHES,
                       num_buckets: int | None = None) -> pd.DataFrame:
    """TPC-H Q19 shape (discounted revenue): one revenue scalar over
    lineitem ⋈ part rows matching ANY (brand, quantity-window,
    size-window) branch → pandas one row (revenue_c), exact
    centi-cents.  The disjunctive-predicate join pattern: the branch
    test needs columns from BOTH sides, so it post-filters INSIDE the
    partkey exchange (vectorized per branch), after part pre-shrinks
    to the union of branch brands in-batch.

    ``branches``: iterable of (p_brand, qty_lo, qty_hi, size_lo,
    size_hi), all bounds inclusive.
    """
    from .shuffle import bucketed_join

    brands = sorted({b[0] for b in branches})

    def li_f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": b["l_partkey"].astype("int64"),
            "qty": b["l_quantity"].astype("int64"),
            "rev_c": (np.round(b["l_extendedprice"] * 100)
                      .astype("int64")
                      * (100 - np.round(b["l_discount"] * 100)
                         .astype("int64")))})

    def part_f(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["p_brand"].isin(brands)]
        return pd.DataFrame({
            "l_partkey": b["p_partkey"].astype("int64"),
            "p_brand": b["p_brand"].astype(object),
            "p_size": b["p_size"].astype("int64")})

    def branch_sum(m: pd.DataFrame) -> pd.DataFrame:
        if not len(m):
            return pd.DataFrame({"rev_c": pd.Series([], dtype="int64")})
        hit = np.zeros(len(m), dtype=bool)
        qty = m["qty"].to_numpy()
        size = m["p_size"].to_numpy()
        brand = m["p_brand"].to_numpy()
        for pb, qlo, qhi, slo, shi in branches:
            hit |= ((brand == pb) & (qty >= qlo) & (qty <= qhi)
                    & (size >= slo) & (size <= shi))
        s = int(m.loc[hit, "rev_c"].sum())
        return pd.DataFrame({"rev_c": pd.Series([s], dtype="int64")})

    joined = bucketed_join(
        lineitem.map_batches(li_f, batch_format="pandas"),
        part.map_batches(part_f, batch_format="pandas"),
        on="l_partkey",
        left_schema={"l_partkey": "int64", "qty": "int64",
                     "rev_c": "int64"},
        right_schema={"l_partkey": "int64", "p_brand": "object",
                      "p_size": "int64"},
        num_buckets=num_buckets, post=branch_sum, how="inner")

    total = 0
    for p in joined.iter_batches(batch_format="pandas"):
        total += int(p["rev_c"].sum())
    return pd.DataFrame({"revenue_c": pd.Series([total], dtype="int64")})
