"""Distributed bench-corpus generator.

``make_corpus`` (tests) draws from one sequential RNG — inherently
single-threaded. For benchmark-scale corpora the generator itself is a
Spark job: each media image / document derives its own
``default_rng([seed, idx])`` stream, so generation is embarrassingly
parallel, deterministic, and identical regardless of partitioning.
Output is cached as parquet and reused across bench rounds.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from .generate import DOCS_SCHEMA, MEDIA_SCHEMA, _make_table_image

_MAIN = [
    "Quarterly revenue grew by {} percent across regions.",
    "Observed {} distinct migration patterns last season.",
    "The committee approved {} infrastructure proposals.",
]


def _gen_media_fn(seed: int):
    def fn(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                m, _ = _make_table_image(rng, f"img_{int(i):06d}")
                rows.append(
                    {
                        "media_ref": m["media_ref"],
                        "image": m["image"],
                        "width": m["width"],
                        "height": m["height"],
                        "ocr_lines": m["ocr_lines"],
                    }
                )
            yield pd.DataFrame(rows)

    return fn


def _gen_docs_fn(seed: int, n_media: int):
    def fn(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                rng = np.random.default_rng([seed, 10**9 + d])
                if d == 0:
                    n_spans, media_pos = 100, set(range(100))
                elif rng.random() < 0.6:
                    n_spans = int(rng.integers(1, 13))
                    media_pos = set()
                else:
                    n_spans = int(rng.integers(1, 13))
                    k = int(rng.integers(1, min(4, n_spans + 1)))
                    media_pos = set(
                        int(x) for x in rng.choice(n_spans, k, replace=False)
                    )
                spans = []
                for s in range(n_spans):
                    if s in media_pos and n_media > 0:
                        ref = f"img_{int(rng.integers(0, n_media)):06d}"
                        spans.append(
                            {"kind": "media", "text": "", "media_ref": ref,
                             "offset": s}
                        )
                    else:
                        main = _MAIN[int(rng.integers(0, len(_MAIN)))].format(
                            int(rng.integers(2, 99))
                        )
                        text = (
                            f"<nav>menu {d}</nav><p>{main}</p>"
                            f"<footer>(c) {d}</footer>"
                        )
                        spans.append(
                            {"kind": "text", "text": text, "media_ref": "",
                             "offset": s}
                        )
                rows.append({"doc_id": f"doc_{d:08d}", "spans": spans})
            yield pd.DataFrame(rows)

    return fn


def generate_bench_corpus(
    spark: SparkSession,
    out_dir: str,
    n_docs: int,
    n_media: int,
    seed: int = 42,
):
    """Generate (or reuse cached) docs+media parquet; returns the paths."""
    docs_path = os.path.join(out_dir, "docs.parquet")
    media_path = os.path.join(out_dir, "media.parquet")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return docs_path, media_path

    par = spark.sparkContext.defaultParallelism
    spark.range(n_media).repartition(par).mapInPandas(
        _gen_media_fn(seed), MEDIA_SCHEMA
    ).write.mode("overwrite").parquet(media_path)
    spark.range(n_docs).repartition(par).mapInPandas(
        _gen_docs_fn(seed, n_media), DOCS_SCHEMA
    ).write.mode("overwrite").parquet(docs_path)
    with open(marker, "w") as f:
        f.write(f"n_docs={n_docs} n_media={n_media} seed={seed}\n")
    return docs_path, media_path
