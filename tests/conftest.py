import pytest

from gunrock_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="gunrock_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.execution.pyspark.udf.faulthandler.enabled": "true"},
    )
    yield s
    s.stop()
