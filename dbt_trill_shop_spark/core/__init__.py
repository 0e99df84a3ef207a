from .model import (
    AccessError,
    ContractError,
    Materialization,
    Model,
    check_access,
    enforce_contract,
)
from .dag import Project, select_nodes, topo_sort
from .docs import load_doc_blocks, load_properties, parse_doc_blocks, resolve_doc_refs
from .jinja_lite import compile_model_sql, extract_deps, sql_model
from .metrics import Metric, metric_frame, parse_metrics
from .quality import (
    FreshnessPolicy,
    UnitTest,
    UnitTestResult,
    check_freshness,
    run_unit_test,
)
from .snapshot import SnapshotStore, snapshot_delta, snapshot_delta_check
from .testing import (
    AcceptedRange,
    AcceptedValues,
    ConfiguredTest,
    DataTest,
    NotNull,
    Relationships,
    TestConfig,
    TestResult,
    Unique,
    UniqueCombination,
    run_tests,
)

__all__ = [
    "AccessError",
    "check_access",
    "ContractError",
    "enforce_contract",
    "Materialization",
    "Model",
    "Project",
    "topo_sort",
    "select_nodes",
    "sql_model",
    "Metric",
    "metric_frame",
    "parse_metrics",
    "compile_model_sql",
    "extract_deps",
    "FreshnessPolicy",
    "check_freshness",
    "UnitTest",
    "UnitTestResult",
    "run_unit_test",
    "parse_doc_blocks",
    "load_doc_blocks",
    "load_properties",
    "resolve_doc_refs",
    "DataTest",
    "NotNull",
    "AcceptedValues",
    "AcceptedRange",
    "Unique",
    "UniqueCombination",
    "Relationships",
    "ConfiguredTest",
    "TestConfig",
    "TestResult",
    "run_tests",
    "SnapshotStore",
    "snapshot_delta",
    "snapshot_delta_check",
]
