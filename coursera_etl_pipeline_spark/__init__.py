"""coursera_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference ETL pipeline (`levdalba/coursera-etl-pipeline`), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, executed
by Tungsten, with Structured Streaming for the incremental path.

Layout:
    session     SparkSession bootstrap (AQE, UTC, arrow, shuffle sizing)
    catalog     parquet table loading + temp-view registration
    registry    the query/oracle registry consumed by __spark_entry__
    operators/  relational core: filters, joins, aggs, windows, setops
    functions/  scalar function pack + vector/text helper expressions
    plans/      reference-parity pipeline (nested JSON -> 15-col table)
    sources/    file discovery, latest-partition selection, HTTP source
    streaming/  file-source ingest, watermarks, windowed aggs, dedup
    llm_ops/    dedup (exact/minhash/simhash/jaccard), similarity
                search, text analysis, multimodal column plumbing
"""

__version__ = "0.1.0"
