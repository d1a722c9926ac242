import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from aeuc_vector_db_spark.session import get_spark

    s = get_spark(app_name="aeuc-tests", cpus=8, shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "16g"})
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from aeuc_vector_db_spark.sources.tables import load_all

    return load_all(spark, SF_DIR)


@pytest.fixture(scope="session")
def embeddings(tables):
    return tables["embeddings"]


@pytest.fixture(scope="session")
def documents(tables):
    return tables["documents"]


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'"
        )
    return con
