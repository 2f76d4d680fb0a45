"""SQL serving endpoint (SURVEY.md §2.1 S9, §3.3): the BI socket.

The reference serves Superset dashboards through ClickHouse's HTTP/native
SQL endpoint (`superset/superset_config.py:1-5`, `docker-compose.yml:73-75`).
The Spark-native equivalent is the HiveServer2-protocol Thrift JDBC/ODBC
server embedded in the running SparkSession: any JDBC/ODBC BI tool
(Superset's `hive://` / `SparkSQL` dialects included) connects to the port
and issues SQL that executes as Catalyst plans over the SAME session state —
one engine for the DataFrame API, ``spark.sql`` and external dashboards.

Tables are exposed as GLOBAL temp views (``global_temp.<name>``): each JDBC
connection gets its own Spark session state, and global views are the
supported way to share catalog entries across those sessions without a Hive
metastore. (Alternative: ``spark.sql.hive.thriftServer.singleSession=true``
at session build.)

At cluster scale this server runs on the driver of a long-lived application
(or Spark Connect serves the same role for DataFrame-API clients); executors
fan out the queries exactly as for any other plan.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import SparkSession

from .catalog import TABLES, load_table


def register_global_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as ``global_temp.<name>`` so external
    JDBC sessions (each with isolated session state) can query them."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceGlobalTempView(t)


def start_sql_endpoint(
    spark: SparkSession,
    port: int = 10000,
    host: str = "127.0.0.1",
    startup_timeout_s: float = 60.0,
):
    """Start the embedded Thrift JDBC/ODBC server on ``spark`` and block
    until the socket accepts connections. Returns the server handle
    (``.stop()`` to shut down).

    Requires the ``spark-hive-thriftserver`` jar (bundled with the pyspark
    distribution). The port/host confs are read by HiveServer2 at start, so
    they can be set on a live session.
    """
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", host)
    jvm = spark._jvm
    server = jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    deadline = time.monotonic() + startup_timeout_s
    while True:
        try:
            socket.create_connection((host, port), timeout=1).close()
            return server
        except OSError:
            if time.monotonic() > deadline:
                server.stop()
                raise TimeoutError(
                    f"Thrift server did not listen on {host}:{port} "
                    f"within {startup_timeout_s}s"
                )
            time.sleep(0.5)


def jdbc_query(
    spark: SparkSession, sql: str, port: int = 10000, host: str = "127.0.0.1"
) -> list[tuple]:
    """Execute ``sql`` THROUGH the Thrift socket with the bundled Hive JDBC
    driver (via the session's JVM — no extra Python dependency) and return
    the rows as tuples of strings. This is the wire-protocol path a BI tool
    takes, exercised end-to-end."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:hive2://{host}:{port}/default", "", ""
    )
    try:
        rs = conn.createStatement().executeQuery(sql)
        n = rs.getMetaData().getColumnCount()
        rows = []
        while rs.next():
            rows.append(tuple(rs.getString(i + 1) for i in range(n)))
        return rows
    finally:
        conn.close()
