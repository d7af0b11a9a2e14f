"""Table profiler: per-column stats in ONE streaming pass.

The "ANALYZE TABLE" utility a pipeline runs before trusting a new
corpus drop: row/null counts, min/max, and an exact integer sum per
column, computed from per-batch partials folded on the driver — no
shuffle, bounded driver state (#columns rows), any table width.

Typing contract (everything the oracle can reproduce bit-exact):
- int columns: min/max as decimal strings, sum as exact int64;
- float columns: values quantize to int64 MICRO-UNITS per row first
  (``round(v * 1e6)``), then min/max/sum over the integers — min/max
  and an integer sum are order-independent where a float sum is not;
- string columns: min/max by code point (UTF-8 byte order — the two
  agree because UTF-8 is order-preserving, so DuckDB's binary
  collation matches Python ``min``/``max``), sum = total LENGTH in
  code points.

Timestamps and nested types are out of scope (cast upstream).  NULL
handling matches SQL aggregates: nulls count in ``n_null`` and drop
from min/max/sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MICRO = 1_000_000.0


def _col_partial(name: str, s: pd.Series) -> dict | None:
    """One column's partial over one batch (None if no non-null
    values — counts still emit)."""
    n = int(len(s))
    nn = int(s.isna().sum())
    base = {"col_name": name, "n": n, "n_null": nn}
    v = s.dropna()
    if pd.api.types.is_float_dtype(s):
        kind = "float"
        if len(v):
            q = np.floor(v.to_numpy(dtype=np.float64) * _MICRO
                         + 0.5).astype(np.int64)
            base.update(min_repr=str(int(q.min())),
                        max_repr=str(int(q.max())),
                        sum_metric=int(q.sum()))
    elif pd.api.types.is_integer_dtype(s):
        kind = "int"
        if len(v):
            iv = v.to_numpy()
            base.update(min_repr=str(int(iv.min())),
                        max_repr=str(int(iv.max())),
                        sum_metric=int(iv.sum()))
    elif pd.api.types.is_object_dtype(s) or isinstance(
            s.dtype, pd.StringDtype):
        kind = "str"
        if len(v):
            vals = v.tolist()
            base.update(min_repr=min(vals), max_repr=max(vals),
                        sum_metric=int(sum(len(x) for x in vals)))
    else:
        raise ValueError(
            f"profile_table: unsupported dtype {s.dtype} for column "
            f"{name!r} (cast timestamps/nested upstream)")
    base["kind"] = kind
    return base


def profile_table(ds, columns: list[str] | None = None) -> pd.DataFrame:
    """→ pandas (col_name, kind, n, n_null, min_repr, max_repr,
    sum_metric), one row per column, sorted by name."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        cols = columns or list(b.columns)
        return pd.DataFrame([_col_partial(c, b[c]) for c in cols])

    acc: dict[str, dict] = {}
    for p in (ds.map_batches(part, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        for row in p.to_dict("records"):
            c = row["col_name"]
            cur = acc.get(c)
            if cur is None:
                acc[c] = dict(row)
                continue
            cur["n"] += row["n"]
            cur["n_null"] += row["n_null"]
            if pd.isna(row.get("min_repr")):
                continue
            if pd.isna(cur.get("min_repr")):
                cur.update(min_repr=row["min_repr"],
                           max_repr=row["max_repr"],
                           sum_metric=row["sum_metric"])
                continue
            if cur["kind"] == "str":
                cur["min_repr"] = min(cur["min_repr"], row["min_repr"])
                cur["max_repr"] = max(cur["max_repr"], row["max_repr"])
            else:   # numeric reprs compare as ints, not strings
                cur["min_repr"] = str(min(int(cur["min_repr"]),
                                          int(row["min_repr"])))
                cur["max_repr"] = str(max(int(cur["max_repr"]),
                                          int(row["max_repr"])))
            cur["sum_metric"] = int(cur["sum_metric"]) \
                + int(row["sum_metric"])

    cols = ["col_name", "kind", "n", "n_null", "min_repr", "max_repr",
            "sum_metric"]
    out = pd.DataFrame([acc[k] for k in sorted(acc)], columns=cols)
    out["n"] = out["n"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    # an all-null column has no sum (SQL would say NULL); report 0
    # with min/max left NA
    out["sum_metric"] = out["sum_metric"].fillna(0).astype("int64")
    return out


def profile_sql(table: str, int_cols: list[str], float_cols: list[str],
                str_cols: list[str]) -> str:
    """DuckDB oracle: one UNION ALL arm per column, same typing
    contract."""
    arms = []
    for c in int_cols:
        arms.append(f"""
          SELECT '{c}' AS col_name, 'int' AS kind,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
                 CAST(MIN({c}) AS VARCHAR) AS min_repr,
                 CAST(MAX({c}) AS VARCHAR) AS max_repr,
                 CAST(SUM({c}) AS BIGINT) AS sum_metric
          FROM {table}""")
    for c in float_cols:
        q = f"CAST(FLOOR({c} * 1000000.0 + 0.5) AS BIGINT)"
        arms.append(f"""
          SELECT '{c}', 'float', CAST(COUNT(*) AS BIGINT),
                 CAST(COUNT(*) - COUNT({c}) AS BIGINT),
                 CAST(MIN({q}) AS VARCHAR), CAST(MAX({q}) AS VARCHAR),
                 CAST(SUM({q}) AS BIGINT)
          FROM {table}""")
    for c in str_cols:
        arms.append(f"""
          SELECT '{c}', 'str', CAST(COUNT(*) AS BIGINT),
                 CAST(COUNT(*) - COUNT({c}) AS BIGINT),
                 MIN({c}), MAX({c}),
                 CAST(SUM(LENGTH({c})) AS BIGINT)
          FROM {table}""")
    return " UNION ALL ".join(arms)
