"""hyperion_crawler_spark — a from-scratch PySpark-native URL-frontier +
fetch scheduler with the query/data-processing capabilities of the
reference ``fount-hyperion/hyperion_crawler`` (see SURVEY.md).

Built Spark-first: DataFrame/Catalyst plans, vectorized Arrow UDFs for
the scalar kernels (URL canonicalization, image codec, perceptual hash),
``applyInPandas``/``cogroup`` for the sharded Bloom URL-seen state, and a
snapshot-committing table store (Iceberg-style MERGE INTO semantics over
parquet manifests) for the frontier priority queue, so a killed crawl
resumes bit-identically from the last committed round.
"""

__version__ = "0.1.0"
