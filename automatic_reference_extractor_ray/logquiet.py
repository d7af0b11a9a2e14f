"""Targeted filters for two benign Ray Data log messages.

Both messages are artifacts of Ray internals on SMALL inputs, not of
this package's code, and were investigated to the source (round 4):

1. ``Operator produced a RefBundle with a different schema ... new
   schema: PandasBlockSchema(names=[], types=[])`` — Ray's sort-based
   groupby emits schema-less EMPTY range partitions when a range holds
   no rows (streaming_executor_state.py warns on every such bundle).
   They cannot be typed from user code: a map task that yields nothing
   still emits one empty zero-column block, so even a fused
   empty-dropping generator stage reproduces the schema-less bundle.

2. ``Error calculating size for column '<c>': cannot call `vectorize`
   on size 0 inputs`` — Ray's pandas block size estimator calls
   ``np.vectorize`` over a sampled object/string column; on a 0-row
   block the sample is empty and ``np.vectorize`` raises.  Any
   legitimately empty filter/join output with a string column logs it.

The filters below drop EXACTLY those two shapes and nothing else — a
real schema divergence (two different non-empty schemas) or a real
size-estimation failure still surfaces.  Since round 5 the package
__init__ installs them at import time: the size-0 estimator message
is logged by WHICHEVER process sizes the block, and worker processes
(which import this package when unpickling its map functions) are
reachable no other way in this environment (worker_process_setup_hook
needs the absent ray[default] runtime-env agent).  Embedding
applications still see every other Ray log line; the CLI entry points
keep their explicit install calls for scripts that bypass the package
import.
"""

from __future__ import annotations

import logging
import re

# the schema-less bundle renders three ways depending on block type:
# a pandas block prints "PandasBlockSchema(names=[], types=[])", a
# missing schema prints "None", and an EMPTY ARROW SCHEMA str()s to ""
# (so the message reads "new schema: . This may lead ...")
_EMPTY_SCHEMA_RE = re.compile(
    r"different schema than the previous one.*"
    r"new schema: (?:PandasBlockSchema\(names=\[\], types=\[\]\)|None|)"
    r"\. This may lead",
    re.S)
_SIZE0_RE = re.compile(
    r"Error calculating size for column .*size 0 inputs")


class _BenignRayDataFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        if _EMPTY_SCHEMA_RE.search(msg):
            return False
        if _SIZE0_RE.search(msg):
            return False
        return True


_TARGET_LOGGERS = (
    "ray.data._internal.execution.streaming_executor_state",
    "ray.data._internal.pandas_block",
)


def install_benign_log_filters() -> None:
    """Attach the benign-message filter to the two Ray Data loggers
    that emit them.  Idempotent."""
    f = _BenignRayDataFilter("arx_benign_ray_data")
    for name in _TARGET_LOGGERS:
        lg = logging.getLogger(name)
        if not any(isinstance(x, _BenignRayDataFilter) for x in lg.filters):
            lg.addFilter(f)
