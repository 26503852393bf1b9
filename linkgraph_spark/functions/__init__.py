"""Scalar / relational building blocks for the training-data pipeline ops:
deterministic hashing (engine-portable), text analysis, deduplication,
similarity search, multimodal column plumbing. All hot paths are JVM-side
``pyspark.sql.functions`` expressions (whole-stage codegen); Python appears
only in Arrow-vectorized UDFs for genuinely non-relational work.
"""
