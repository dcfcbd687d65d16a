import shutil
import tempfile

import pytest

from debezium_partial_snapshotter_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dps-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="dps_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
