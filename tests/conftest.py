import pytest


@pytest.fixture(scope="session")
def spark():
    from livre_spark.plans.job import build_session

    session = build_session(app_name="livre-spark-tests", cores=4,
                            shuffle_partitions=8)
    yield session
    session.stop()
