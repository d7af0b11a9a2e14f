"""read_parquet_clean: blocks must carry a metadata-free (HASHABLE)
schema — pandas-written parquet otherwise trips pyarrow's
Schema.__hash__ and knocks every Ray block concat off the
hashed-schema dedup fast path (worker-side log flood)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from automatic_reference_extractor_ray.sources.readers import (
    clean_schema, read_parquet_clean)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_testdata_is_the_problem_case():
    # precondition for the whole module: the driver testdata really is
    # pandas-written and its schema really is unhashable
    s = pq.read_schema(DOCS)
    assert s.metadata and b"pandas" in s.metadata
    with pytest.raises(TypeError):
        hash(s)


def test_clean_schema_projected_and_hashable():
    s = clean_schema(DOCS, ["doc_id", "text"])
    assert s.names == ["doc_id", "text"]
    assert s.metadata is None
    hash(s)  # must not raise


def test_read_blocks_carry_clean_schema(ray_session):
    ds = read_parquet_clean(DOCS, columns=["doc_id", "text"])
    b = ds.take_batch(5, batch_format="pyarrow")
    assert b.schema.metadata is None
    hash(b.schema)
    assert b.num_rows == 5 and b.column_names == ["doc_id", "text"]


def test_values_identical_to_plain_read(ray_session):
    import ray.data as rd
    a = read_parquet_clean(DOCS, columns=["doc_id", "n_chars"]).to_pandas()
    b = rd.read_parquet(DOCS, columns=["doc_id", "n_chars"]).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))


def test_read_docs_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL corpus reads back equal to the parquet ground truth and
    feeds an op pipeline unchanged."""
    import json as _json

    import pyarrow.parquet as pq

    from automatic_reference_extractor_ray.ops.textstats import token_counts
    from automatic_reference_extractor_ray.sources.readers import (
        read_docs_jsonl, read_parquet_clean)

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text", "lang"]).to_pandas()
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for r in src.to_dict("records"):
            f.write(_json.dumps(r) + "\n")
    ds = read_docs_jsonl(str(p), columns=["doc_id", "text"],
                         dtypes={"doc_id": "int64"})
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = (read_parquet_clean(
               "/root/testdata/sf0.001/documents.parquet",
               columns=["doc_id", "text"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # the jsonl-sourced dataset drives an op like any other
    n = ds.map_batches(token_counts, batch_format="pyarrow").count()
    assert n == len(exp)


def test_read_docs_csv_roundtrip(ray_session, tmp_path):
    from automatic_reference_extractor_ray.sources.readers import (
        read_docs_csv)

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["alpha beta", "gamma", "delta"]})
    p = tmp_path / "docs.csv"
    df.to_csv(p, index=False)
    got = (read_docs_csv(str(p), columns=["doc_id", "text"],
                         dtypes={"doc_id": "int64"})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, df)


def test_write_docs_jsonl_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.sources.readers import (
        read_docs_jsonl, write_docs_jsonl)
    df = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["doc_id", "text", "lang"]).to_pandas()
    out = str(tmp_path / "dump")
    write_docs_jsonl(rd.from_pandas(df), out)
    back = (read_docs_jsonl(out, columns=["doc_id", "text", "lang"],
                            dtypes={"doc_id": df["doc_id"].dtype.name})
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = df.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, exp)
