"""flaco_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of milesgranger/flaco.

The reference (``/root/reference``, flaco v0.6.0) is a PostgreSQL→Arrow
extract library: it pushes an arbitrary SQL string to the server
(``src/lib.rs:189``), transposes the streamed rows into Arrow columns
(``src/lib.rs:197-389``), and delivers them zero-copy to pyarrow
(``src/lib.rs:42-72``) or to Parquet / Feather files
(``src/lib.rs:116-168``).  Its user-visible contract is therefore
"any SQL the server can run" plus columnar sinks.

This package supplies that contract Spark-first:

- :mod:`flaco_spark.core` — the flaco-parity public API
  (``read_sql``, ``read_sql_to_pyarrow``, ``read_sql_to_file``,
  ``FileFormat``, ``EngineError``) implemented on Spark's JDBC source,
  Parquet sink, and a custom Arrow-IPC/Feather sink.
- :mod:`flaco_spark.operators` — the full relational query inventory
  (SURVEY.md §2.2) expressed with the DataFrame API so Catalyst plans
  it (pushdown, broadcast, AQE), plus large-scale training-data
  pipeline operators (dedup, similarity search, text analysis,
  multimodal columns).
- :mod:`flaco_spark.sources` — Parquet / Arrow-IPC / JDBC readers and
  writers designed for distributed execution.
- :mod:`flaco_spark.streaming` — Structured Streaming ingestion lane
  (extension; the reference is batch-only).

Everything is built on the public PySpark 4.x API.
"""

from flaco_spark.errors import EngineError
from flaco_spark.session import get_session
from flaco_spark.core import (
    FileFormat,
    read_sql,
    read_sql_to_file,
    read_sql_to_pyarrow,
    sql,
)

__version__ = "0.1.0"

__all__ = [
    "EngineError",
    "FileFormat",
    "get_session",
    "read_sql",
    "read_sql_to_file",
    "read_sql_to_pyarrow",
    "sql",
    "__version__",
]
