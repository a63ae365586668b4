from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcp_etl_spark.session import (  # noqa: E402
    _quiet_benign_warnings,
    get_spark,
)
from gcp_etl_spark.tables import TABLES  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    # log-layer filter for the known-benign WindowExec warning (all
    # global windows in the corpus run over documented bounded
    # relations; the plan-hygiene fingerprints police real growth)
    _quiet_benign_warnings(s)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_SMALL}/{name}.parquet')"
        )
    yield con
