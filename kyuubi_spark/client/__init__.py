"""Client libraries for the gateway — the reference ships a Java JDBC
driver (kyuubi-hive-jdbc) and a Python client; this package is the
Python-first equivalent surface: a PEP 249 DBAPI driver over the thrift
frontend (``kyuubi_spark.client.dbapi``)."""
