"""Measure JVM vs python-worker CPU seconds during the kernel stage."""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = int(sys.argv[1])
corpus = "BENCH/data/corpus_80000_40000_s42"

from table_recognition_spark.core import gnn
from table_recognition_spark.pipeline.extract import recognize_tables
from table_recognition_spark.session import get_spark
from pyspark.sql import functions as F

w = gnn.load_weights("weights/g2_seed42.npz")
spark = get_spark(f"cpusplit_{n}", parallelism=n,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
d = spark.read.parquet(os.path.join(corpus, "docs.parquet"))
m = spark.read.parquet(os.path.join(corpus, "media.parquet"))
spans = d.select("doc_id", F.explode("spans").alias("s")).select(
    F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind"))
refs = spans.filter(F.col("kind") == "media").select("media_ref").distinct()
ki = refs.join(m.select("media_ref", "ocr_lines", "width", "height"),
               "media_ref")
# warmup
recognize_tables(ki.limit(2000), w, strategy="visibility").count()


def cpu_secs():
    out = subprocess.check_output(
        ["ps", "-eo", "pid,comm,cputimes,args"], text=True
    )
    jvm = py = 0.0
    me = os.getpid()
    for line in out.splitlines()[1:]:
        parts = line.split(None, 3)
        if len(parts) < 4:
            continue
        pid, comm, secs, args = parts
        if int(pid) == me:
            continue
        if comm == "java":
            jvm += float(secs)
        elif "pyspark.daemon" in args or "pyspark.worker" in args:
            py += float(secs)
    return jvm, py


j0, p0 = cpu_secs()
t0 = time.time()
recognize_tables(ki, w, strategy="visibility").count()
wall = time.time() - t0
j1, p1 = cpu_secs()
print(f"CPUSPLIT n={n} wall={wall:.1f}s jvm_cpu={j1-j0:.1f}s "
      f"python_cpu={p1-p0:.1f}s total_cpu={(j1-j0)+(p1-p0):.1f}s "
      f"busy_cores={((j1-j0)+(p1-p0))/wall:.1f}")
spark.stop()
