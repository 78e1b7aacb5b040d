"""Custom operators the reference (or the north star) needs that aren't a
single built-in DataFrame call: dedup (exact/MinHash-LSH/SimHash), similarity
search (exact top-k + hyperplane-LSH ANN), text analysis, multimodal column
plumbing, and batched ML inference. Everything is composed from built-in
pyspark.sql.functions (JVM-side, codegen'd) unless Python is genuinely
required (multimodal decode stubs, model inference) — then it's Arrow-batched
mapInPandas/pandas_udf, never row-at-a-time UDFs.
"""
