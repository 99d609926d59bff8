"""PySpark-native analytics engine with the capabilities of
FredHutch/HDC-DataEngineering-SQLSync (an MS-SQL change-tracking table-sync
utility), re-expressed Spark-first, plus LLM-data-pipeline operators.

Built from public knowledge only: the Apache Spark / PySpark 4.x API and the
driver contract in ``__spark_entry__.py``. See SURVEY.md for the capability
reconstruction (the reference checkout was empty at survey time, SURVEY.md §0,
so no file:line citations into it are possible; SURVEY.md §2 is the contract).

Layout:
    session.py    SparkSession factory (AQE on, Arrow on, UTC)
    registry.py   table name -> StructType -> parquet path; fixed-schema model
    sources/      parquet/csv/json/jdbc readers and writers
    operators/    sync core (diff/merge/incremental/state), dedup, simsearch,
                  text analysis, as-of join, multimodal plumbing
    functions/    reusable column expressions (digests, vector math, text)
    plans/        the query catalog: one (spark_fn, oracle_sql) pair per qid
    streaming/    Structured Streaming forms of the batch operators
"""

__version__ = "0.1.0"
