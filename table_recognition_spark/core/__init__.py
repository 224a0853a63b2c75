"""Pure-numpy kernel primitives.

Everything in this package is Spark-free and deterministic. The single-node
oracle (``table_recognition_spark.oracle``) and the Spark executors
(``table_recognition_spark.pipeline``) import the *same* functions, so
span-sequence parity between them exercises only the distributed plumbing,
never floating-point drift.
"""
