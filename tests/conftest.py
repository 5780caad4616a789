import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MED = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from neural_search_spark.session import get_spark

    s = get_spark(app_name="nss-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem", "orders", "events"]:
        p = os.path.join(SF_SMALL, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()
