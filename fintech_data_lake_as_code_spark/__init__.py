"""PySpark-native analytics engine with the query/data-processing surface of
the reference fintech data-lake (sathishc/fintech-data-lake-as-code).

The reference is an AWS CDK CDC ingestion pipeline (Aurora MySQL -> DMS ->
Kinesis -> Firehose -> S3, see reference lib/fin-transactions-stack.ts); its
analytical workload lives in declared rules (reference
resources/data/setupTables.py:29-44). This package re-expresses that entire
dataflow Spark-first: batch relational core, CDC changelog semantics,
Structured Streaming ingest, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for 100 TB
scale.

Layout:
    session.py    SparkSession builder (AQE, UTC, shuffle sizing)
    io.py         parquet loaders for the driver test tables
    registry.py   query registry: name -> (spark_fn, duckdb oracle SQL)
    operators/    scans, projections, joins, aggregates, windows, sorts,
                  rules (the reference's B1-B10 detectors), cdc, dedup,
                  similarity, text
    functions/    scalar-function family queries + UDF/UDAF/UDTF surface
    sources/      seeded data generators (customeractivity, CDC changelog)
    streaming/    Structured Streaming queries (bounded, deterministic)
    plans/        explain/plan-inspection helpers
"""

__version__ = "0.1.0"
