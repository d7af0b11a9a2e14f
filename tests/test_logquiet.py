"""The benign-Ray-Data log filter must drop exactly the three rendered
forms of the schema-less-empty-bundle warning (pandas, None, empty
Arrow schema) and the 0-row size-estimation error — and NOTHING else
(a real schema divergence between two non-empty schemas must still
surface)."""

import logging

from automatic_reference_extractor_ray.logquiet import (
    _BenignRayDataFilter, install_benign_log_filters)


def _rec(msg: str) -> logging.LogRecord:
    return logging.LogRecord("ray.data.test", logging.WARNING, __file__,
                             1, msg, None, None)


_PREFIX = ("Operator produced a RefBundle with a different schema than "
           "the previous one. Previous schema: doc_id: string, ")
_SUFFIX = ". This may lead to unexpected behavior."


def test_drops_all_three_empty_schema_forms():
    f = _BenignRayDataFilter()
    for empty in ("PandasBlockSchema(names=[], types=[])", "None", ""):
        assert not f.filter(_rec(f"{_PREFIX}new schema: {empty}{_SUFFIX}"))


def test_drops_size0_estimation_error():
    f = _BenignRayDataFilter()
    assert not f.filter(_rec(
        "Error calculating size for column 'text': cannot call "
        "`vectorize` on size 0 inputs unless `otypes` is set"))


def test_keeps_real_schema_divergence_and_other_messages():
    f = _BenignRayDataFilter()
    # two NON-empty schemas diverging is a real problem — must pass
    assert f.filter(_rec(
        f"{_PREFIX}new schema: PandasBlockSchema(names=['x'], "
        f"types=[int]){_SUFFIX}"))
    assert f.filter(_rec("some unrelated warning about spilling"))


def test_install_is_idempotent():
    install_benign_log_filters()
    install_benign_log_filters()
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    n = sum(isinstance(x, _BenignRayDataFilter) for x in lg.filters)
    assert n == 1
