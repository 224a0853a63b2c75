"""Streaming MinHash-LSH near-duplicate detection via
``applyInPandasWithState``.

The batch operator (``operators/dedup.py::dedup_minhash_lsh``) finds
all verified near-dup pairs in a static corpus; continuous ingestion
needs the incremental keep-first form: as documents arrive in
micro-batches, each LSH band bucket remembers the FIRST document that
landed in it, and every later arrival in the same bucket is exact-
Jaccard-verified against that first document and emitted as a
(keep_doc, dup_doc) pair. This is the streaming analogue of dedup's
keep-one-per-cluster decision — a cluster of k near-dups emits k-1
pairs against its first-seen representative, not the batch operator's
full pairwise set. The reference has no streaming at all
(SURVEY.md §2.9); this is brief-scope (training-data pipeline).

Signature/banding/verify are bit-identical to the batch operator
(the SAME fused shingle+md5("h:shingle")-signature pandas UDF —
``operators/dedup.py::_shingle_sig_df`` — same 2 bands × 4 rows, same
integer-crossed 2·|∩| ≥ |∪| threshold), pinned
by tests/test_streaming_neardup.py against a batch-computed
first-per-bucket oracle.

Determinism: within a micro-batch "first" = min doc_id (distributed
arrival inside a batch is unordered); across batches the earlier
batch wins (stream order is the dedup authority).

Scale shape: state is hash-partitioned by (band, bucket) — the same
key the batch candidate equi-join shuffles on. Each state row holds
the representative's doc_id plus its shingle set (needed for the
in-stream exact verify), so state is O(buckets × avg shingles). At
real corpus scale you would store the 8-hash signature instead and
accept the ~j⁴ band false-positive rate, or verify candidates in a
downstream batch join — both seams documented here, same bucket
keying either way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import (
    N_BANDS,
    ROWS_PER_BAND,
    _shingle_sig_df,
)

OUTPUT_SCHEMA = (
    "band int, bucket string, keep_doc bigint, dup_doc bigint, "
    "n_common bigint, n_union bigint"
)
# arrays are avoided in state for maximum state-store compatibility:
# the shingle set travels as one \x1f-joined string
STATE_SCHEMA = "keep_doc bigint, shingles string"
_SEP = "\x1f"


def _bucket_matcher(key, pdfs, state: GroupState):
    band, bucket = key
    rows = pd.concat(list(pdfs)).sort_values("doc_id")
    if state.exists:
        keep_doc, keep_joined = state.get
        keep = set(keep_joined.split(_SEP)) if keep_joined else set()
        rest = rows
    else:
        first = rows.iloc[0]
        keep_doc = int(first["doc_id"])
        keep = set(first["shingles"].split(_SEP))
        state.update((keep_doc, _SEP.join(sorted(keep))))
        rest = rows.iloc[1:]
    # columnar verify: one str.split over the whole bucket batch, then
    # set intersections against the representative (no per-row iterrows)
    out = []
    if len(rest):
        doc_ids = rest["doc_id"].to_numpy()
        sh_sets = rest["shingles"].str.split(_SEP).map(set).to_numpy()
        n_keep = len(keep)
        for d, sh in zip(doc_ids, sh_sets):
            if int(d) == keep_doc:
                continue
            n_common = len(keep & sh)
            n_union = n_keep + len(sh) - n_common
            if 2 * n_common >= n_union:
                out.append((band, bucket, keep_doc, int(d),
                            n_common, n_union))
    yield pd.DataFrame(
        out,
        columns=[
            "band", "bucket", "keep_doc", "dup_doc", "n_common", "n_union",
        ],
    )


def _banded(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket, shingles-joined) — the batch operator's
    signature/banding expressions, reused verbatim on a streaming DF.
    The input stream is processed VERBATIM: the synthetic planted-dup
    fixture rows the batch queries() entries inject live at the
    caller/fixture level (tests stage already-planted micro-batch
    files), never inside this public operator."""
    base = _shingle_sig_df(docs).select(
        "doc_id",
        F.array_join(F.array_sort("shingles"), _SEP).alias("shingles"),
        "sig",
    )
    return base.select(
        "doc_id",
        "shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.concat_ws(
                        "|",
                        F.slice(
                            F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND
                        ),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "shingles", "bb.band", "bb.bucket")


def stream_neardup_minhash(docs_stream: DataFrame) -> DataFrame:
    """documents stream → verified (keep_doc, dup_doc) near-dup pairs,
    one per LSH band bucket collision with the bucket's first doc."""
    return _banded(docs_stream).groupBy("band", "bucket").applyInPandasWithState(
        _bucket_matcher,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
