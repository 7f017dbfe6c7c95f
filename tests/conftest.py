import os
import sys

import pytest

# Make test modules importable on Spark python workers (mapInPandas UDFs
# defined in test files are pickled by reference).
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = (
    _TESTS_DIR + os.pathsep + os.environ.get("PYTHONPATH", ""))
if _TESTS_DIR not in sys.path:
    sys.path.insert(0, _TESTS_DIR)

from kiji_mapreduce_spark.session import make_session


@pytest.fixture(scope="session")
def spark():
    s = make_session(
        app_name="kiji-mr-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
