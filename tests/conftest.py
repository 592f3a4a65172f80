from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from aerovaldb_spark.session import get_spark

    spark = get_spark("tests", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def tmpdb(spark, tmp_path):
    from aerovaldb_spark.db import AerovalSparkDB

    return AerovalSparkDB(spark, str(tmp_path / "db"))
