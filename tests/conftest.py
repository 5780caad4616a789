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


@pytest.fixture(scope="session")
def positional_reader_ctx(spark, documents, tmp_path_factory):
    """One positional index over the sf0.001 documents, shared by the
    span and intervals indexed-dispatch suites."""
    from neural_search_spark.index.builder import build_index
    from neural_search_spark.query.dsl import SearchContext
    from neural_search_spark.query.wand import IndexReader

    d = str(tmp_path_factory.mktemp("pos_idx"))
    build_index(spark, documents, d, key_cols=["doc_id"], text_col="text",
                tokenizer="simple", num_segments=4, range_block=64,
                store_positions=True)
    return SearchContext(docs=documents,
                         reader=IndexReader(spark, d, cache_hot=True))
