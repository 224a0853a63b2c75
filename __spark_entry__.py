"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (interleaved
text+media docs derived from sf0.001 documents.parquet + seeded fixture
media → boilerplate strip + GNN table-recognition kernel → ordered spans).

``queries()`` exposes every implemented operator; ``oracle_sql()`` gives
the DuckDB-equivalent SQL where the operator is SQL-expressible. The
extraction/multimodal queries are non-SQL-expressible (GNN kernel, binary
image decode) → rows-only checks there; their strong correctness gate is
the span-sequence parity suite in tests/ (python -m pytest -x -q).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in __import__("sys").path:
    __import__("sys").path.insert(0, _REPO)

_WEIGHTS = None


def _weights():
    global _WEIGHTS
    if _WEIGHTS is None:
        from table_recognition_spark.core import gnn

        # prefer the trained artifact (96.2% held-out edge accuracy on
        # synthetic grids, weights/g2_trained_seed42.history.json); fall
        # back to the frozen seeded init
        for name in ("g2_trained_seed42.npz", "g2_seed42.npz"):
            path = os.path.join(_REPO, "weights", name)
            if os.path.exists(path):
                _WEIGHTS = gnn.load_weights(path)
                break
        else:
            _WEIGHTS = gnn.init_weights(42)
    return _WEIGHTS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction pipeline over sf0.001-derived interleaved docs."""
    from table_recognition_spark.pipeline.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001", _weights())


def _extract_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_recognition_spark.pipeline.flagship import flagship

    return flagship(spark, sf_dir, _weights())


def _extract_interleaved_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship with the reference's configured-default edge
    discovery (node-visibility ray casting, J2)."""
    from table_recognition_spark.pipeline.flagship import fixture_media, interleaved_docs
    from table_recognition_spark.pipeline.extract import extract_flat

    return extract_flat(
        interleaved_docs(spark, sf_dir),
        fixture_media(spark),
        _weights(),
        strategy="visibility",
    )


def _extract_interleaved_visual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship with the G3 visual model (numpy CNN over image crops) —
    the reference's configured-default architecture."""
    from table_recognition_spark.pipeline.extract import extract_flat
    from table_recognition_spark.pipeline.flagship import (
        fixture_media,
        interleaved_docs,
    )

    return extract_flat(
        interleaved_docs(spark, sf_dir),
        fixture_media(spark),
        _weights(),
        model="visual",
    )


def _media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_recognition_spark.operators.multimodal import image_stats
    from table_recognition_spark.pipeline.flagship import fixture_media

    # tiny fixture input: match partitions to data size (32 near-empty
    # tasks just churn python workers)
    return image_stats(fixture_media(spark).repartition(2))


def _media_patch_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # flat (media_ref, patch_idx, value) rows: array<float> columns are
    # unsortable in the driver's pandas canonicalizer (round-1 crash)
    from table_recognition_spark.operators.multimodal import (
        patch_embeddings_flat,
    )
    from table_recognition_spark.pipeline.flagship import fixture_media

    return patch_embeddings_flat(fixture_media(spark).repartition(2))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from table_recognition_spark.operators import dedup, similarity, textstats
    from table_recognition_spark.queries import relational

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(relational.QUERIES)
    q.update(textstats.QUERIES)
    q.update(dedup.QUERIES)
    q.update(similarity.QUERIES)
    # non-SQL-expressible (GNN kernel / binary decode) → rows-only checks
    q["extract_interleaved"] = _extract_interleaved
    q["extract_interleaved_visibility"] = _extract_interleaved_visibility
    q["extract_interleaved_visual"] = _extract_interleaved_visual
    q["media_image_stats"] = _media_image_stats
    q["media_patch_embeddings"] = _media_patch_embeddings
    return q


def oracle_sql() -> dict[str, str]:
    from table_recognition_spark.operators import dedup, similarity, textstats
    from table_recognition_spark.queries import relational

    o: dict[str, str] = {}
    o.update(relational.ORACLES)
    o.update(textstats.ORACLES)
    o.update(dedup.ORACLES)
    o.update(similarity.ORACLES)
    return o
