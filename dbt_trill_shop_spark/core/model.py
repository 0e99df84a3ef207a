"""Model abstraction — the Spark-native equivalent of a dbt model node.

Reference semantics being mirrored (SURVEY.md §3.1):

- a model is a named relation produced from other relations via ``ref()`` /
  ``source()`` (``models/marts/weekly_trends_summary.sql:13,27,41,55``);
- it has a materialization: staging -> ``view``, marts -> ``table``
  (``dbt_project.yml:33-38``);
- it may carry declarative data tests (``models/staging/stg_top_terms.yml``).

A model's ``builder`` is either a Python function ``(spark, resolve) ->
DataFrame`` (idiomatic DataFrame API — preferred) or a SQL string executed with
``spark.sql`` after its dependencies are registered as temp views.  Both forms
stay fully declarative: Catalyst sees one logical plan per model, so view
models are inlined into their consumers exactly like dbt views inside a
warehouse.
"""

from __future__ import annotations

import enum
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Union

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

    from .testing import DataTest

Resolver = Callable[[str], "DataFrame"]
Builder = Union[str, Callable[["SparkSession", Resolver], "DataFrame"]]


def _accepts_ctx(fn: Callable) -> bool:
    """True when the builder declares a third (context) parameter."""
    import inspect

    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False
    positional = [
        p
        for p in params.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]
    return len(positional) >= 3 or any(
        p.kind is p.VAR_POSITIONAL for p in params.values()
    )


class Materialization(str, enum.Enum):
    VIEW = "view"  # staging models: dbt_project.yml:35-36
    TABLE = "table"  # mart models:    dbt_project.yml:37-38
    EPHEMERAL = "ephemeral"  # inlined, never registered
    # dbt's incremental materialization (core dbt capability; the reference
    # project materializes only view/table but the execution model it rides on
    # supports incremental + snapshot, README.md dbt docs).  On rebuilds only
    # the new batch is computed and appended/merged — at 100 TB this is the
    # difference between reprocessing a day and reprocessing a decade.
    INCREMENTAL = "incremental"
    # table materialization through the transaction log
    # (sources/txn_table.py): every build is an ACID commit, so marts get
    # time travel ("what did this mart say before today's run?"), atomic
    # reader-safe swaps without the directory-rename dance, OCC against a
    # concurrent orchestrator, and a change-data-feed downstream hooks can
    # consume — the warehouse-grade storage dbt assumes under its
    # table/incremental semantics.
    TXN_TABLE = "txn_table"


@dataclass
class Model:
    name: str
    builder: Builder
    deps: tuple[str, ...] = ()
    materialization: Materialization = Materialization.VIEW
    schema: str | None = None  # custom schema, routed by resolve_schema()
    description: str = ""
    # column name -> resolved description (dbt property-YAML columns:, with
    # {{ doc(...) }} refs expanded at parse time — core/docs.py)
    columns: dict[str, str] = field(default_factory=dict)
    # dbt model contract (config: contract: enforced: true + per-column
    # data_type): when set, the built DataFrame's schema must match exactly —
    # same column set, declared Spark types — or the build fails before
    # materialization.  None = no contract.
    contract: dict[str, str] | None = None
    # content fingerprint for state comparison (dbt state:modified): SQL-file
    # models hash their raw text; Python builders hash their source when
    # introspectable.  Empty = no stable fingerprint (always "modified").
    checksum: str = ""
    tests: list["DataTest"] = field(default_factory=list)
    # incremental-only knobs (ignored otherwise):
    # merge upserts by unique_key (latest batch wins); append just appends.
    unique_key: str | None = None
    incremental_strategy: str = "merge"  # "merge" | "append"
    # dbt tags (config: tags:): free-form labels selectable via
    # Project.select("tag:<name>")
    tags: tuple[str, ...] = ()
    # dbt hooks: SQL statements run around materialization ({{ this }}
    # resolves to the model's relation); the warehouse-side audit/grant slot
    pre_hook: tuple[str, ...] = ()
    post_hook: tuple[str, ...] = ()
    # dbt model governance (dbt 1.5 groups/access): a model in a group with
    # access "private" may only be ref'd by models in the SAME group;
    # "protected" (default) is project-wide; "public" is the stable API
    # surface.  Enforced before every build (core/dag.py check_access).
    group: str | None = None
    access: str = "protected"  # "private" | "protected" | "public"
    # dbt model versions (dbt 1.6): a versioned model registers under
    # "<name>.v<version>"; bare-name refs resolve to the project's latest
    # version, pinned refs (ref("m", v=1)) to the exact one.  None = the
    # model is unversioned.  ``deprecation_date`` (ISO string) marks an old
    # version scheduled for removal — surfaced in the manifest, warned at
    # build.
    version: int | None = None
    deprecation_date: str | None = None

    @property
    def node_name(self) -> str:
        """DAG registry key: ``name.v<version>`` for versioned models."""
        return f"{self.name}.v{self.version}" if self.version is not None else self.name

    @property
    def safe_node_name(self) -> str:
        """``node_name`` with dots flattened — legal as a temp-view name and
        a filesystem path segment (keeps v1/v2 relations distinct)."""
        return self.node_name.replace(".", "__")

    def build(
        self, spark: "SparkSession", resolve: Resolver, ctx: dict | None = None
    ) -> "DataFrame":
        """``ctx`` is the dbt-style build context (``vars``,
        ``is_incremental``, ``this`` — supplied by ``Project.build``); plain
        two-argument builders ignore it, context-aware builders (SQL-file
        models with ``{% if is_incremental() %}`` / ``{{ var(...) }}``)
        declare a third parameter."""
        if callable(self.builder):
            if ctx is not None and _accepts_ctx(self.builder):
                return self.builder(spark, resolve, ctx)
            return self.builder(spark, resolve)
        # SQL-text model: dependencies must already be resolvable as views.
        return spark.sql(self.builder)


def content_checksum(content: str) -> str:
    """Stable md5 fingerprint of model content (dbt manifest checksum)."""
    import hashlib

    return hashlib.md5(content.encode()).hexdigest()


class ContractError(Exception):
    """A built model's schema violates its declared contract."""


class AccessError(Exception):
    """A model ref violates dbt group/access rules (private cross-group ref)."""


def check_access(models: dict[str, "Model"]) -> None:
    """dbt 1.5 group/access enforcement: a ``private`` model may only be
    referenced from models in its own group.  Raises :class:`AccessError`
    naming every violating edge; ``protected``/``public`` models are
    unrestricted within a single project (cross-project imports, where
    ``protected`` bites, don't exist here)."""
    problems: list[str] = []
    for name, model in models.items():
        for dep in model.deps:
            parent = models.get(dep)
            if parent is None:
                continue  # a source, not a model
            if parent.access == "private" and parent.group != model.group:
                problems.append(
                    f"{name!r} (group {model.group!r}) refs private {dep!r} "
                    f"(group {parent.group!r})"
                )
    if problems:
        raise AccessError("access violations: " + "; ".join(problems))


def enforce_contract(name: str, df: "DataFrame", contract: dict[str, str]) -> None:
    """dbt contract enforcement: the relation must expose exactly the
    declared columns with the declared types (compared on Spark's
    ``simpleString`` form, case-insensitive).  Raises :class:`ContractError`
    listing every violation — build-time schema drift fails fast instead of
    shipping a silently-changed table to consumers."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems: list[str] = []
    for col, declared in contract.items():
        if col not in actual:
            problems.append(f"missing column {col!r} (declared {declared})")
        elif actual[col] != declared.strip().lower():
            problems.append(
                f"column {col!r} is {actual[col]}, contract declares {declared}"
            )
    for col in actual:
        if col not in contract:
            problems.append(f"undeclared column {col!r} ({actual[col]})")
    if problems:
        raise ContractError(f"model {name!r} violates its contract: " + "; ".join(problems))


def resolve_schema(
    custom_schema: str | None,
    resource_type: str,
    target_name: str,
    default_schema: str,
) -> str:
    """Schema-routing rule, semantics of ``macros/generate_schema_name.sql:5-21``:

    seeds -> the custom schema verbatim (the global ``raw`` schema);
    no custom schema -> target default;
    prod -> ``<default>_<custom>``;
    any other target -> target default.
    """
    if resource_type == "seed" and custom_schema:
        return custom_schema.strip()
    if custom_schema is None:
        return default_schema
    if target_name == "prod":
        return f"{default_schema}_{custom_schema.strip()}"
    return default_schema
