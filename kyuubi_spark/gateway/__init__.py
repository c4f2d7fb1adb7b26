"""Multi-tenant SQL gateway over PySpark.

Python re-creation of the reference gateway's session/operation model
(kyuubi-common Session.scala:24-99, Operation.scala:27-48) with the Spark
engine's statement operations (externals/kyuubi-spark-sql-engine), built
idiomatically on `pyspark.sql.SparkSession` instead of Thrift+Scala:

- `Engine` — one root SparkSession; per-connection sessions are
  `newSession()` clones sharing the SparkContext (isolated SQLConf/temp
  views), mirroring SparkSQLSessionManager.scala:126-138.
- `Session` — executeStatement + metadata operations + current catalog/db.
- `Operation` — async task with the reference's state machine
  (OperationState.scala:30-57) and paged fetch cursors
  (FetchIterator.scala:23-128).
"""

from kyuubi_spark.gateway.engine import Engine
from kyuubi_spark.gateway.state import OperationState, FetchOrientation

__all__ = ["Engine", "OperationState", "FetchOrientation"]
