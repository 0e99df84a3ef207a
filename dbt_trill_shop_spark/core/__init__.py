from .model import Materialization, Model
from .dag import Project, select_nodes, topo_sort
from .jinja_lite import compile_model_sql, extract_deps, sql_model
from .snapshot import SnapshotStore, snapshot_delta
from .testing import (
    AcceptedRange,
    AcceptedValues,
    DataTest,
    NotNull,
    Relationships,
    TestResult,
    Unique,
    UniqueCombination,
    run_tests,
)

__all__ = [
    "Materialization",
    "Model",
    "Project",
    "topo_sort",
    "select_nodes",
    "sql_model",
    "compile_model_sql",
    "extract_deps",
    "DataTest",
    "NotNull",
    "AcceptedValues",
    "AcceptedRange",
    "Unique",
    "UniqueCombination",
    "Relationships",
    "TestResult",
    "run_tests",
    "SnapshotStore",
    "snapshot_delta",
]
