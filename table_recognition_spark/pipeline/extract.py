"""The distributed extraction pipeline (the engine's flagship "query").

Spark shape (SURVEY.md §3.1):

    docs ──explode(spans)──┬── text spans ──JVM regexp boilerplate strip ──┐
                           └── media spans ─┐                              │
    media ──(ocr_lines,w,h only; image      │ distinct(media_ref)          │
             bytes PRUNED from the scan) ───┴── join ── repartition ──     │
                 mapInPandas(GNN kernel, Arrow batches) ── cells ──        │
                 join back to span occurrences ────────────────────────────┤
                                                                           ▼
            groupBy(doc_id) → collect_list → array_sort → re-number offsets

Scale properties, deliberately:
- **Kernel runs once per distinct media_ref**, not per occurrence — shared
  images across documents cost one forward pass; results fan back out with
  an equi-join (AQE handles reference skew).
- **Column pruning**: the kernel needs only (ocr_lines, width, height); the
  potentially-huge ``image`` binary column never leaves the scan unless the
  caller asks for visual features.
- **Only Python boundary** is the Arrow-batched ``mapInPandas`` kernel (and
  optionally a pandas_udf text strip); boilerplate strip defaults to
  JVM-side ``regexp_replace`` inside whole-stage codegen.
- **One shuffle** for reassembly (groupBy doc_id); offsets are re-numbered
  inside the collected array with ``transform``, avoiding a per-row window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..core import boilerplate
from ..core.gnn import weights_from_bytes, weights_to_bytes

CELLS_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("cell_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

OUT_SPAN_STRUCT = "struct<kind:string,text:string,media_ref:string,offset:int>"

# per-worker weights cache: npz parse once per executor process, not per batch
_WEIGHTS_CACHE: dict = {}


def _kernel_fn(weights_bytes: bytes, strategy: str = "knn"):
    """Build the mapInPandas kernel. The closure ships the (small) weights
    artifact with the task binary — broadcast once per executor by Spark —
    and memoizes the parsed arrays in a module-level cache."""

    def fn(batches):
        from ..oracle.extract import run_kernel

        key = hash(weights_bytes)
        w = _WEIGHTS_CACHE.get(key)
        if w is None:
            w = weights_from_bytes(weights_bytes)
            _WEIGHTS_CACHE[key] = w

        for pdf in batches:
            refs, idxs, texts = [], [], []
            for ref, lines, width, height in zip(
                pdf["media_ref"], pdf["ocr_lines"], pdf["width"], pdf["height"]
            ):
                cells = run_kernel(
                    list(lines), int(width), int(height), w, strategy
                )
                for i, t in enumerate(cells):
                    refs.append(ref)
                    idxs.append(i)
                    texts.append(t)
            yield pd.DataFrame(
                {"media_ref": refs, "cell_idx": pd.array(idxs, dtype="int32"),
                 "text": texts}
            )

    return fn


def recognize_tables(
    media_df: DataFrame,
    weights: dict,
    kernel_partitions: int | None = None,
    strategy: str = "knn",
) -> DataFrame:
    """Distinct media rows → (media_ref, cell_idx, text) via the GNN kernel."""
    cols = media_df.select("media_ref", "ocr_lines", "width", "height")
    if kernel_partitions:
        cols = cols.repartition(kernel_partitions, "media_ref")
    return cols.mapInPandas(
        _kernel_fn(weights_to_bytes(weights), strategy), schema=CELLS_SCHEMA
    )


def _strip_text(df: DataFrame, engine: str) -> DataFrame:
    if engine == "pandas_udf":
        @F.pandas_udf(T.StringType())
        def strip(s: pd.Series) -> pd.Series:
            return boilerplate.strip_boilerplate_series(s)

        return df.withColumn("text", strip("text"))
    # default: JVM-side regexp chain (whole-stage codegen)
    return df.withColumn("text", boilerplate.spark_strip_expr(F.col("text")))


def extract(
    docs_df: DataFrame,
    media_df: DataFrame,
    weights: dict,
    text_engine: str = "jvm",
    kernel_partitions: int | None = None,
    broadcast_cells: bool | None = None,
    strategy: str = "knn",
) -> DataFrame:
    """docs + media → out(doc_id, spans) with re-numbered dense offsets.

    Canonical semantics == ``oracle.extract_corpus``: text spans →
    kind='main_text' (boilerplate-stripped), media spans → one kind='cell'
    span per assembled table cell; media_refs absent from ``media_df`` emit
    nothing (inner join).
    """
    spans = docs_df.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("orig_offset"),
    )

    text = _strip_text(spans.filter(F.col("kind") == "text"), text_engine).select(
        "doc_id",
        "orig_offset",
        F.lit(0).alias("sub_idx"),
        F.lit("main_text").alias("kind"),
        "text",
        F.lit("").alias("media_ref"),
    )

    media_spans = spans.filter(F.col("kind") == "media").select(
        "doc_id", "orig_offset", "media_ref"
    )

    # kernel once per distinct ref; the join to `media` prunes the image
    # bytes column at the scan
    refs = media_spans.select("media_ref").distinct()
    kernel_input = refs.join(
        media_df.select("media_ref", "ocr_lines", "width", "height"),
        "media_ref",
    )
    cells = recognize_tables(kernel_input, weights, kernel_partitions, strategy)
    if broadcast_cells:
        cells = F.broadcast(cells)

    media_out = media_spans.join(cells, "media_ref").select(
        "doc_id",
        "orig_offset",
        F.col("cell_idx").alias("sub_idx"),
        F.lit("cell").alias("kind"),
        "text",
        "media_ref",
    )

    all_spans = text.unionByName(media_out)

    return (
        all_spans.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("orig_offset", "sub_idx", "kind", "text", "media_ref")
                )
            ).alias("tmp")
        )
        .select(
            "doc_id",
            F.transform(
                "tmp",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).cast(f"array<{OUT_SPAN_STRUCT}>").alias("spans"),
        )
    )


def extract_flat(*args, **kwargs) -> DataFrame:
    """Same as :func:`extract` but exploded to one row per output span —
    a stable flat schema for correctness harnesses."""
    out = extract(*args, **kwargs)
    return out.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )
