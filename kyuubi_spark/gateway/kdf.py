"""Engine-defined functions (KDFs).

Counterpart of the reference's KDFRegistry
(externals/kyuubi-spark-sql-engine/.../udf/KDFRegistry.scala:39-108):
kyuubi_version(), engine_name(), engine_id(), engine_url(), system_user(),
session_user() — registered per session so `SELECT session_user()` works in
plain SQL. The session user is captured in the UDF closure, the Python
equivalent of the reference's job-local property propagation.
"""

from __future__ import annotations

import getpass

from pyspark.sql.types import StringType

ENGINE_VERSION = "1.0.0"
ENGINE_NAME = "kyuubi-spark-py"


def register_kdfs(spark, session_user: str) -> None:
    app_id = spark.sparkContext.applicationId
    ui_url = spark.sparkContext.uiWebUrl or ""
    system_user = getpass.getuser()
    for name, fn in {
        "kyuubi_version": lambda: ENGINE_VERSION,
        "engine_name": lambda: ENGINE_NAME,
        "engine_id": lambda: app_id,
        "engine_url": lambda: ui_url,
        "system_user": lambda: system_user,
        "session_user": lambda: session_user,
    }.items():
        spark.udf.register(name, fn, StringType())
