"""Streaming exact deduplication via ``applyInPandasWithState``.

The batch operator (``operators/dedup.py::dedup_exact``) dedups a
static corpus; a continuous ingestion pipeline needs the incremental
version: as documents arrive in micro-batches, emit each normalized-text
fingerprint's FIRST document and silently drop every later duplicate,
with the seen-set maintained as per-key streaming state across batches
(exactly-once under checkpointing). The reference has no streaming at
all (SURVEY.md §2.9); this is brief-scope (training-data pipeline).

Semantics pinned by tests/test_stateful_streaming.py:

- key = md5(lower/collapse-whitespace/trim text) — identical to the
  batch operator's fingerprint;
- within one micro-batch, "first" = min doc_id (arrival inside a batch
  is unordered in a distributed source, so the tie must be broken
  deterministically);
- across batches, first-arriving batch wins (stream order is the
  dedup authority, as in any log-ingestion pipeline).

Scale shape: state is hash-partitioned by fingerprint across executors
(the same shuffle key the batch groupBy uses), one state row per
distinct document ever seen — the streaming analogue of the batch
hash-shuffle, no driver-side structures.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.common import norm_text

OUTPUT_SCHEMA = "fingerprint string, doc_id bigint, n_chars bigint"
STATE_SCHEMA = "seen boolean"


def _first_seen(key, pdfs, state: GroupState):
    (fingerprint,) = key
    if state.exists:
        return  # fingerprint already emitted in an earlier batch
    best = None
    for pdf in pdfs:
        i = pdf["doc_id"].idxmin()
        row = (int(pdf["doc_id"][i]), int(pdf["n_chars"][i]))
        if best is None or row[0] < best[0]:
            best = row
    state.update((True,))
    yield pd.DataFrame(
        {
            "fingerprint": [fingerprint],
            "doc_id": [best[0]],
            "n_chars": [best[1]],
        }
    )


def stream_dedup_exact(docs_stream: DataFrame) -> DataFrame:
    """documents stream → first-seen row per text fingerprint."""
    keyed = docs_stream.select(
        F.md5(norm_text(F.col("text"))).alias("fingerprint"),
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
