from __future__ import annotations

import pytest

from resolve_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="resolve_spark_tests", master="local[4]")
    yield spark
    spark.stop()


def rows_to_tuples(df):
    return [tuple(r) for r in df.collect()]
