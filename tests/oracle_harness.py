"""Back-compat shim: the oracle harness is engine surface now
(vnavc_spark/oracle.py) so the CLI `verify` command and the tests
share one implementation."""

from vnavc_spark.oracle import (  # noqa: F401
    compare,
    duckdb_connect,
    value_hash,
)
