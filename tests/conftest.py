import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master(os.environ.get("SPARK_TEST_MASTER",
                                                   "local[4]"))
        .appName("pdf4py-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
        .config("spark.buffer.size", "1048576")
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield session
    session.stop()


# extended fuzz budget: `HYPOTHESIS_PROFILE=heavy pytest tests/*_fuzz*`
# multiplies every test's example budget 20x for soak runs; the default
# profile keeps CI fast
try:
    from hypothesis import settings

    settings.register_profile("heavy", max_examples=2000, deadline=None)
    import os as _os
    if _os.environ.get("HYPOTHESIS_PROFILE"):
        settings.load_profile(_os.environ["HYPOTHESIS_PROFILE"])
except ImportError:
    pass
