import pytest

from gunrock_spark.session import build_session


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = build_session(
        app_name="gunrock_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
            # saveAsTable targets (sources/pages table route) land in a
            # throwaway warehouse, not ./spark-warehouse in the repo
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield s
    s.stop()
