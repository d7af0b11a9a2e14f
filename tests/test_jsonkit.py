"""JSON field extraction: fast path vs fallback agreement, typed NULL
contract, and the DuckDB oracle cross-check on the flat case."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.ops.jsonkit import (
    extract_json_field, json_field_sql)


def test_typed_extraction_contract(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"i": np.arange(8, dtype="int64"), "props": [
        '{"k": 69}',                      # fast path int
        '{"a": 1, "k": -3}',              # fast path, other keys
        '{"k": 1.5}',                     # non-integral -> NULL as int
        '{"k": "text"}',                  # wrong type -> NULL as int
        '{"nope": 1}',                    # missing key -> NULL
        'not json at all',                # malformed -> NULL
        '{"k":    7}',                    # whitespace
        '{"outer": {"k": 9}, "k": 4}',    # flat k wins
    ]})
    out = (extract_json_field(rd.from_pandas(df).repartition(3),
                              "props", "k", dtype="int64")
           .to_pandas().sort_values("i").reset_index(drop=True))
    got = out["k"].tolist()
    assert got[0] == 69 and got[1] == -3
    assert pd.isna(got[2]) and pd.isna(got[3])
    assert pd.isna(got[4]) and pd.isna(got[5])
    assert got[6] == 7 and got[7] == 4


def test_string_dtype_decodes_escapes(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"i": [0, 1, 2], "props": [
        '{"k": "plain"}',
        '{"k": "quo\\"te"}',     # escaped quote -> fallback path
        '{"k": 5}',              # number under str dtype -> NULL
    ]})
    out = (extract_json_field(rd.from_pandas(df), "props", "k",
                              dtype="str")
           .to_pandas().sort_values("i")["k"].tolist())
    assert out[0] == "plain"
    assert out[1] == 'quo"te'
    assert out[2] is None or pd.isna(out[2])


def test_matches_sql_on_flat_payloads(ray_session):
    import ray.data as rd
    rng = np.random.Generator(np.random.PCG64(5))
    df = pd.DataFrame({
        "i": np.arange(300, dtype="int64"),
        "props": [f'{{"k": {int(rng.integers(-50, 50))}}}'
                  for _ in range(300)]})
    got = (extract_json_field(rd.from_pandas(df).repartition(4),
                              "props", "k")
           .to_pandas().sort_values("i").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql(
        f"SELECT i, {json_field_sql('props', 'k')} AS k FROM t "
        "ORDER BY i").df()
    assert got["k"].astype("int64").tolist() == \
        exp["k"].astype("int64").tolist()
