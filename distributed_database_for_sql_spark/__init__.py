"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities the reference repo (harshitster/Distributed-Database-for-SQL,
/root/reference) was built to provide.  The reference snapshot is a Raft
consensus core carrying opaque SQL-command strings (see SURVEY.md §0); the
relational surface those commands imply is implemented here directly on
Spark SQL / DataFrame / Structured Streaming, with Catalyst + AQE as the
optimizer and the Spark platform as the distribution/fault-tolerance
substrate (SURVEY.md §1.3).

Layout:
    session    - SparkSession factory tuned for local test mode, scale-ready
    catalog    - table registry over the parquet test data
    engine     - SQL command entry point (the `LogEntry.Command` contract)
    queries/   - the query inventory (SURVEY.md §2.C), each with DuckDB oracle
    operators/ - custom operators Spark lacks (as-of join, MinHash LSH, ANN...)
    functions/ - scalar/vector/text helper expressions (JVM-side built-ins)
    sources/   - readers incl. multimodal binary-column plumbing
    streaming/ - Structured Streaming jobs over the events table
    plans/     - plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
