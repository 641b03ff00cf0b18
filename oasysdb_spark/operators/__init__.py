"""High-level operators over the fixture tables: deduplication, similarity
search, text analysis, multimodal plumbing. Each operator is a function
``(spark, sf_dir, ...) -> DataFrame`` so the driver harness and bench can
run them directly; every SQL-expressible one has a DuckDB oracle in
``__spark_entry__.py``.
"""
