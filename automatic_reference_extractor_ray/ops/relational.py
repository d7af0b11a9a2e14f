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
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = lineitem.map_batches(partial, batch_format="pyarrow",
                                    batch_size=65536)
    return (partials.groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty_c", alias_name="sum_qty_c"),
                       Sum("sum_base_price_c", alias_name="sum_base_price_c"),
                       Sum("sum_disc_price_c", alias_name="sum_disc_price_c"),
                       Sum("n_rows", alias_name="n_rows")))


def top_customers_by_revenue(orders, customer, k: int = 10):
    """Top-k customers by total order value: pre-aggregate orders per
    custkey per batch → small groupby → broadcast-join customer names →
    global top-k (sort on the tiny aggregate)."""
    import ray
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["total_c"] = np.round(df["o_totalprice"] * 100).astype("int64")
        g = (df.groupby("o_custkey")
             .agg(revenue_c=("total_c", "sum"), n_orders=("total_c", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    # custkey cardinality grows with the data → bounded-bucket shuffle,
    # not Ray's per-group aggregate (see ops/shuffle.py)
    from .shuffle import bucketed_agg
    per_cust = bucketed_agg(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
        "o_custkey",
        {"revenue_c": ("revenue_c", "sum"), "n_orders": ("n_orders", "sum")})

    names = customer.select_columns(["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(names["c_custkey"], names["c_name"])))

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(name_ref)
        batch["c_name"] = batch["o_custkey"].map(lookup)
        return batch

    joined = per_cust.map_batches(attach, batch_format="pandas")
    top = (joined.sort(["revenue_c", "o_custkey"], descending=[True, False])
           .limit(k).to_pandas())
    top["rank"] = np.arange(1, len(top) + 1, dtype="int64")
    return top[["rank", "o_custkey", "c_name", "revenue_c", "n_orders"]]


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
        return pa.Table.from_pandas(g, preserve_index=False)

    # (type, hour) keys grow with the time range → bounded-bucket shuffle
    from .shuffle import bucketed_agg
    return bucketed_agg(
        events.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
        ["event_type", "hour"],
        {"n": ("n", "sum"), "sum_value_c": ("sum_value_c", "sum")})


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
