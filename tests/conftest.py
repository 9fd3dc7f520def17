import shutil
import tempfile

import pytest

from qwery_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("qwery-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="qwery_lake_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
