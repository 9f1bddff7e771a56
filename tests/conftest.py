from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from commodity_price_forecasting_spark.session import get_spark

    s = get_spark(app_name="cpf-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _duck_connection(sf_dir):
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = _duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_sf001():
    """DuckDB views over sf0.01 — the DRIVER's correctness SF.
    Rounding-midpoint edge cases scale with row count, so float-heavy
    queries get a second oracle pass here (VERDICT r3 ask #4)."""
    con = _duck_connection(SF_CORRECT)
    yield con
    con.close()
