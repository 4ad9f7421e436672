"""domanda_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `wu02067602/domanda-etl` (a single-node pandas ETL), re-expressed
Spark-first: declarative DataFrame plans optimized by Catalyst, native Column
expressions instead of row-wise Python, broadcast joins for small dimensions,
window-based dedup instead of global sorts, and versioned parquet sinks
instead of hand-rolled backup/restore SQL.

Layout:
    session    — SparkSession factory tuned for local testing / cluster scale
    sources    — parquet/catalog readers with schema conformance
    functions  — scalar expression library (reference F1-F17) + text/vector fns
    operators  — relational ops: conform, dedup, joins, windows, similarity
    plans      — the domanda flight-price pipeline recomposed from operators
    sinks      — versioned overwrite/append/restore (Delta-like, pure parquet)
    streaming  — structured-streaming surface (watermark dedup, incremental)
"""

__version__ = "0.1.0"
