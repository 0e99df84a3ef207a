import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_trill_shop_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_finish(session):
    """Launch the sibling sweep processes (oracle parity, degenerate-input
    robustness) as soon as collection settles, so they overlap the whole
    suite — but only when their consuming join tests actually survived
    selection and the run executes tests (ADVICE r6: the previous
    import-time Popen leaked an orphan Spark process on --collect-only and
    -k-deselected runs)."""
    if session.config.option.collectonly:
        return
    selected = {item.name for item in session.items}
    if "test_all_queries_match_oracle" in selected:
        from . import test_z_parity_join

        test_z_parity_join.launch()
    if "test_every_query_survives_empty_inputs" in selected:
        from . import test_zscale_empty_sweep

        test_zscale_empty_sweep.launch()
    if "test_pooled_scenarios_from_sibling" in selected:
        from . import test_z_scenarios_join

        test_z_scenarios_join.launch()


@pytest.fixture(scope="session")
def spark():
    # local[24] / 16 shuffle partitions: the suite's wall-clock is dominated
    # by the oracle-parity chunk (hundreds of tiny sf0.001 jobs submitted
    # from a thread pool); r6 A/B measured the chunk ~12% faster at 24 cores
    # + a 24-wide pool than at 16/16, and flat beyond that — the remaining
    # cost is GIL-bound py4j plan construction, not executor slots.
    s = get_spark(
        app_name="trillshop-tests", master="local[24]", shuffle_partitions=16
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


