import pytest

from aef_mosaic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="aef-mosaic-tests", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
