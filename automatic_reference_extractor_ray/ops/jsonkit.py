"""Semi-structured column kit: typed field extraction from a JSON
string column.

Event/crawl tables carry a catch-all JSON ``props`` column; pipelines
need one field out of it, typed, without a Python-dict detour per row.
``extract_json_field`` is a pure streaming map with a compiled-regex
fast path for flat scalar fields (one C ``Series.str.extract`` per
batch) and a ``json.loads`` fallback for rows the regex can't see
(nesting, escapes, reordered keys) — the fallback touches only the
rows that need it, so well-formed flat payloads never parse
row-by-row.

DuckDB oracle parity: ``CAST(json_extract_string(col, '$.key') AS
<type>)`` — missing keys and malformed payloads yield NULL on both
sides.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

_NUM = r"-?\d+(?:\.\d+)?"


def _flat_pattern(key: str) -> re.Pattern:
    # a scalar value for "key" in a FLAT object: number, string, bool,
    # null — conservative: any suspicious neighborhood falls through
    # to json.loads
    k = re.escape(key)
    return re.compile(
        rf'"{k}"\s*:\s*({_NUM}|"(?:[^"\\]*)"|true|false|null)')


def extract_json_field(ds, col: str, key: str, dtype: str = "int64",
                       out_col: str | None = None):
    """→ input columns + ``out_col`` (default ``key``) with the
    extracted field cast to ``dtype`` ('int64' | 'float64' | 'str');
    missing key / malformed JSON / wrong-type values become NULL
    (pandas NA)."""
    out_name = out_col or key
    pat = _flat_pattern(key)

    def _coerce(raw: pd.Series) -> pd.Series:
        # raw: the matched JSON scalar TOKEN (or NA)
        if dtype == "str":
            # decode the token (handles \" escapes) — only string
            # literals qualify, numbers/bools stay NULL like TRY_CAST
            def dec(t):
                if isinstance(t, str) and t.startswith('"'):
                    try:
                        return json.loads(t)
                    except ValueError:
                        return None
                return None
            return raw.map(dec).astype("object")
        num = pd.to_numeric(raw, errors="coerce")
        if dtype == "int64":
            # non-integral numerics are NULL (TRY_CAST semantics, not
            # rounding)
            num = num.where(np.isfinite(num) & (np.floor(num) == num))
            return num.astype("Int64")
        return num.astype("float64")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        s = b[col].astype("string")
        raw = s.str.extract(pat, expand=False)
        # the regex is position-based: a nested object could shadow
        # the top-level key, so the fast path only stands for
        # visibly-flat payloads (exactly one '{'); everything else —
        # and every fast-path miss — goes through json.loads
        raw = raw.where(s.str.count("\\{") == 1)
        miss = raw.isna() & s.notna()
        if miss.any():
            vals = []
            for t in s[miss]:
                try:
                    v = json.loads(t).get(key)
                except (ValueError, AttributeError):
                    v = None
                vals.append(json.dumps(v) if v is not None else None)
            raw = raw.copy()
            raw[miss] = pd.array(vals, dtype="string")
        return b.assign(**{out_name: _coerce(raw)})

    return ds.map_batches(fn, batch_format="pandas")


def json_field_sql(col: str, key: str, dtype: str = "int64") -> str:
    """Oracle expression fragment for the same extraction.

    Parity caveat: ``json_extract_string`` erases the JSON type (a
    number 69 and a string "69" both come back as '69'), so the SQL
    fragment agrees with the stricter Ray op only when the field's
    JSON type matches ``dtype`` — true for the synthetic tables and
    any schema-disciplined payload; the Ray contract (wrong-type →
    NULL) is the documented one."""
    cast = {"int64": "BIGINT", "float64": "DOUBLE",
            "str": "VARCHAR"}[dtype]
    return f"TRY_CAST(json_extract_string({col}, '$.{key}') AS {cast})"
