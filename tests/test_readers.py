"""read_parquet_clean: blocks must carry a metadata-free (HASHABLE)
schema — pandas-written parquet otherwise trips pyarrow's
Schema.__hash__ and knocks every Ray block concat off the
hashed-schema dedup fast path (worker-side log flood)."""

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
