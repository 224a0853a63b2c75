"""table_recognition_spark — PySpark-native main-content extraction engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (lpiwowar/table-recognition): given an Iceberg-style
table of interleaved text+media documents, text spans pass through a
vectorized boilerplate-strip classifier and media spans referencing table
images run a GNN table-recognition kernel (k-NN graph over OCR text-line
boxes, geometry features, message-passing node/edge classification, cell
text assembly) inside pandas/Arrow UDFs. Output is re-emitted as ordered
spans (kind, text, media_ref, offset).

Layout:
  core/       pure-numpy kernel primitives shared by the single-node oracle
              and the Spark executors (bit-exact parity by construction)
  oracle/     no-Spark reference implementation (the equality target)
  fixtures/   seeded synthetic corpus generator (docs / media / gt_cells)
  pipeline/   the distributed Spark pipeline + checkpoint/resume layer
  operators/  training-data-pipeline operators (dedup, similarity, text stats,
              multimodal plumbing)
  queries/    relational demonstration queries over the TPC-H-ish testdata
"""

__version__ = "0.1.0"
