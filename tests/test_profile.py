"""Table profiler: typing contract (int raw / float micro / string
code-point), null handling, and the DuckDB oracle cross-check."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.ops.profile import (
    profile_sql, profile_table)


def _frame():
    return pd.DataFrame({
        "i": pd.array([3, -7, 12, None, 0], dtype="Int64"),
        "f": [1.25, -0.5, None, 2.0, 0.0000015],
        "s": ["b", None, "ä", "aa", ""],
    })


def test_profile_matches_sql_oracle(ray_session):
    import ray.data as rd
    df = _frame()
    got = profile_table(rd.from_pandas(df).repartition(3))
    con = duckdb.connect()
    con.register("t", df)
    exp = (con.sql(profile_sql("t", ["i"], ["f"], ["s"])).df()
           .sort_values("col_name").reset_index(drop=True))
    got = got.sort_values("col_name").reset_index(drop=True)
    for c in ["col_name", "kind", "n", "n_null", "min_repr",
              "max_repr", "sum_metric"]:
        assert got[c].astype(str).tolist() == \
            exp[c].astype(str).tolist(), c


def test_profile_values_hand_checked(ray_session):
    import ray.data as rd
    out = (profile_table(rd.from_pandas(_frame()).repartition(2))
           .set_index("col_name"))
    assert out.loc["i", "n"] == 5 and out.loc["i", "n_null"] == 1
    assert out.loc["i", "min_repr"] == "-7"
    assert out.loc["i", "max_repr"] == "12"
    assert out.loc["i", "sum_metric"] == 8
    # float micro-units: 1.25 -> 1250000, -0.5 -> -500000,
    # 0.0000015 -> 2 (half-up)
    assert out.loc["f", "min_repr"] == "-500000"
    assert out.loc["f", "max_repr"] == "2000000"
    assert out.loc["f", "sum_metric"] == 1250000 - 500000 + 2000000 + 2
    # strings: code-point order ('' < 'aa' < 'b' < 'ä'), LENGTH sums
    assert out.loc["s", "min_repr"] == ""
    assert out.loc["s", "max_repr"] == "ä"
    assert out.loc["s", "sum_metric"] == 1 + 1 + 2 + 0


def test_profile_rejects_timestamps(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"ts": pd.to_datetime(["2020-01-01"])})
    with pytest.raises(Exception, match="unsupported dtype"):
        profile_table(rd.from_pandas(df))
