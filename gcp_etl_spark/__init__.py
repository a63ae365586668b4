"""gcp_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference ETL pipeline (camposvinicius/gcp-etl:
JSON→Parquet→SQL→Avro→warehouse medallion flow, see
``k8s/submit/etl-on-gcp-vinicius-campos.py`` in the reference), extended
with a full relational operator surface plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis), every
operator designed for a 100 TB / 1000-executor deployment.

Layout:
    session    SparkSession builder (AQE, shuffle sizing, Arrow, UTC)
    tables     testdata table loaders
    io         sources/sinks: json/csv/parquet/avro, partitioned writes
    pipeline   medallion pipeline (landing→processing→curated→serving) + gates
    operators  relational ops: joins, aggregates, windows, as-of, top-k, sets
    functions  scalar function corpus + text analysis
    llm        dedup (exact/minhash/simhash), similarity search, multimodal
    streaming  structured-streaming duals of the windowed aggregations
    queries    the declared query corpus driving the DuckDB-oracle gate
"""

__version__ = "0.1.0"
