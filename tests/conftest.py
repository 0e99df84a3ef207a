import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_trill_shop_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # local[16] / 16 shuffle partitions: the suite's wall-clock is dominated
    # by the oracle-parity chunks (hundreds of tiny sf0.001 jobs submitted
    # from a thread pool); scheduling throughput scales with cores up to
    # about half the box (32 vcpus) before JVM contention eats the gain.
    s = get_spark(
        app_name="trillshop-tests", master="local[16]", shuffle_partitions=16
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    """Zero-row parquet twins of every table, schemas copied from the real
    testdata.  Fully-filtered shards and empty partitions are routine at
    100 TB; every registered query must return an empty (or
    degenerate-but-defined) result on them instead of crashing — the sweep
    that introduced this found one real bug (bm25 index search crashed
    schema inference on an empty query batch)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(SF_DIR, f))
            pq.write_table(schema.empty_table(), str(d / f))
    return str(d)
