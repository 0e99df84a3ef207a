"""dbt-SQL model authoring: a Jinja-lite compiler for the constructs the
reference's model files actually use (the complete list — verified against
``models/**/*.sql`` and ``macros/*.sql``):

- ``{{ ref('model') }}``            (marts, e.g. top_terms_comparison.sql:8)
- ``{{ source('src', 'table') }}``  (staging, e.g. stg_top_terms.sql:6)
- ``{{ macro(args) }}``             (cents_to_dollars, macros/cents_to_dollars.sql)
- ``{% if is_incremental() %} ... {% else %} ... {% endif %}`` — the dbt
  incremental idiom: the branch is chosen per build from the Project's
  context (first run vs. rebuild), like dbt's runtime flag;
- ``{{ this }}``                    — the model's own existing relation
  (incremental predicates: ``WHERE ts > (SELECT max(ts) FROM {{ this }})``);
- ``{{ var('name', default) }}``    — project vars (dbt --vars /
  dbt_project.yml ``vars:``, e.g. reference ``dbt_project.yml:24-25``);
- ``{# ... #}`` comments and other ``{% ... %}`` statement blocks
  (config/docs) — stripped; schema routing (generate_schema_name) happens at
  the Project layer, not in SQL text.

Deliberately NOT a Jinja engine: the grammar above is regular, so regexes
compile it exactly, with no template-execution surface.  Dependency
extraction (``extract_deps``) mirrors dbt's manifest graph building: the
DAG comes from the refs/sources in the text, never declared by hand.

Execution model: each dependency relation is registered as a temp view under
its model/source name, then the compiled text runs through ``spark.sql`` —
Catalyst inlines the views, so a view-materialized chain is ONE logical plan
end-to-end, exactly like dbt views in a warehouse.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from .model import Materialization, Model

_COMMENT_RE = re.compile(r"\{#.*?#\}", re.S)
_BLOCK_RE = re.compile(r"\{%-?.*?-?%\}", re.S)
_REF_RE = re.compile(r"\{\{\s*ref\(\s*['\"]([A-Za-z0-9_]+)['\"]\s*\)\s*\}\}")
_SOURCE_RE = re.compile(
    r"\{\{\s*source\(\s*['\"][A-Za-z0-9_]+['\"]\s*,\s*['\"]([A-Za-z0-9_]+)['\"]\s*\)\s*\}\}"
)
_MACRO_RE = re.compile(r"\{\{\s*([A-Za-z0-9_]+)\(([^()]*)\)\s*\}\}")
_CONFIG_RE = re.compile(r"\{\{\s*config\((.*?)\)\s*\}\}", re.S)
_CONFIG_KV_RE = re.compile(r"([A-Za-z_]+)\s*=\s*['\"]([^'\"]*)['\"]")
_IF_INC_RE = re.compile(
    r"\{%-?\s*if\s+is_incremental\(\)\s*-?%\}(.*?)"
    r"(?:\{%-?\s*else\s*-?%\}(.*?))?\{%-?\s*endif\s*-?%\}",
    re.S,
)
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_VAR_RE = re.compile(
    r"\{\{\s*var\(\s*['\"]([A-Za-z0-9_:]+)['\"]\s*(?:,\s*([^)]*?)\s*)?\)\s*\}\}"
)


def _render_var(value) -> str:
    """A var value as SQL text: bools lowercase (valid literals in both Spark
    and DuckDB), everything else via str() — dbt's raw-text insertion."""
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)

# SQL-text macro registry (name -> args... -> SQL fragment).  BigQuery-variant
# semantics to match functions/macros.py cents_to_dollars.
SQL_MACROS: dict[str, Callable[..., str]] = {
    "cents_to_dollars": lambda col: f"ROUND(({col}) / 100, 2)",
}


def parse_config(raw_sql: str) -> dict[str, str]:
    """String kwargs of the model's ``{{ config(...) }}`` header — the dbt
    in-file config surface (``materialized=``, ``schema=``), e.g.
    reference ``dbt_project.yml:33-38`` routes staging->view, marts->table."""
    m = _CONFIG_RE.search(raw_sql)
    return dict(_CONFIG_KV_RE.findall(m.group(1))) if m else {}


def extract_deps(raw_sql: str) -> tuple[str, ...]:
    """Model/source names referenced by the SQL — the model's DAG edges."""
    body = _COMMENT_RE.sub("", raw_sql)
    # strip {% %} statement blocks too — a ref() inside an un-taken Jinja
    # branch or macro definition must not register a phantom DAG edge
    # (compile_model_sql strips them in the same order)
    body = _BLOCK_RE.sub("", body)
    refs = _REF_RE.findall(body)
    sources = _SOURCE_RE.findall(body)
    seen: dict[str, None] = {}
    for n in refs + sources:
        seen.setdefault(n)
    return tuple(seen)


def compile_model_sql(
    raw_sql: str,
    macros: dict[str, Callable[..., str]] | None = None,
    is_incremental: bool = False,
    vars: dict | None = None,
    this_name: str | None = None,
) -> str:
    """Compile dbt-Jinja SQL text to plain Spark SQL: refs/sources become the
    bare relation name (registered as a temp view at build time), macros
    expand via the registry, ``is_incremental()`` branches resolve from the
    flag, ``{{ this }}`` becomes ``this_name``, ``{{ var(...) }}`` resolves
    from ``vars`` (falling back to the in-text default), and
    comments/remaining blocks are stripped."""
    body = _COMMENT_RE.sub("", raw_sql)
    # resolve {% if is_incremental() %} branches BEFORE the generic block
    # strip (which would otherwise keep both branches' SQL text)
    body = _IF_INC_RE.sub(
        lambda m: (m.group(1) if is_incremental else (m.group(2) or "")), body
    )

    def sub_var(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        if vars is not None and name in vars:
            return _render_var(vars[name])
        if default is None:
            raise ValueError(f"var {name!r} has no value and no default")
        return default.strip().strip("'\"")

    body = _VAR_RE.sub(sub_var, body)
    if _THIS_RE.search(body):
        if this_name is None:
            raise ValueError(
                "{{ this }} outside an incremental context — the model's "
                "existing relation is only defined on incremental rebuilds"
            )
        body = _THIS_RE.sub(this_name, body)
    body = _BLOCK_RE.sub("", body)
    # {{ config(...) }} is metadata for the Project layer (materialization,
    # schema) — inert in the compiled SQL text
    body = re.sub(r"\{\{\s*config\(.*?\)\s*\}\}", "", body, flags=re.S)
    body = _REF_RE.sub(lambda m: m.group(1), body)
    body = _SOURCE_RE.sub(lambda m: m.group(1), body)
    reg = {**SQL_MACROS, **(macros or {})}

    def expand(m: re.Match) -> str:
        name, argtext = m.group(1), m.group(2)
        if name not in reg:
            raise ValueError(f"unknown SQL macro {name!r} in model text")
        args = [a.strip().strip("'\"") for a in argtext.split(",") if a.strip()]
        return reg[name](*args)

    return _MACRO_RE.sub(expand, body)


def sql_model(
    name: str,
    raw_sql: str,
    materialization: Materialization | None = None,
    macros: dict[str, Callable[..., str]] | None = None,
    **model_kwargs,
) -> Model:
    """A dbt model from SQL text: deps auto-extracted, body compiled once,
    executed via temp-view registration + ``spark.sql``.  The in-file
    ``{{ config(...) }}`` supplies materialization/schema unless the caller
    overrides them explicitly (dbt precedence: in-file config < caller)."""
    cfg = parse_config(raw_sql)
    if materialization is None:
        materialization = Materialization(cfg.get("materialized", "view"))
    if "schema" not in model_kwargs and "schema" in cfg:
        model_kwargs["schema"] = cfg["schema"]
    for key in ("unique_key", "incremental_strategy"):
        if key not in model_kwargs and key in cfg:
            model_kwargs[key] = cfg[key]
    # tags='a,b' (string form of dbt's tags=[...] list)
    if "tags" not in model_kwargs and "tags" in cfg:
        model_kwargs["tags"] = tuple(
            t.strip() for t in cfg["tags"].split(",") if t.strip()
        )
    deps = extract_deps(raw_sql)

    def build(spark: SparkSession, resolve, ctx: dict | None = None) -> DataFrame:
        # compiled per build: the is_incremental()/var() context is only
        # known at run time (dbt compiles at runtime for the same reason)
        ctx = ctx or {}
        inc = bool(ctx.get("is_incremental"))
        this_view = None
        if inc and ctx.get("this") is not None:
            this_view = f"__this_{name}__"
            ctx["this"].createOrReplaceTempView(this_view)
        compiled = compile_model_sql(
            raw_sql,
            macros,
            is_incremental=inc,
            vars=ctx.get("vars"),
            this_name=this_view,
        )
        for dep in deps:
            resolve(dep).createOrReplaceTempView(dep)
        return spark.sql(compiled)

    from .model import content_checksum

    return Model(
        name,
        build,
        deps=deps,
        materialization=materialization,
        checksum=content_checksum(raw_sql),
        **model_kwargs,
    )


def load_sql_models(
    directory: str,
    materialization: Materialization | None = None,
    macros: dict[str, Callable[..., str]] | None = None,
) -> list[Model]:
    """dbt's models/ directory convention: every ``*.sql`` file under
    ``directory`` becomes a model named after the file stem, with each file's
    ``{{ config(...) }}`` choosing view/table unless ``materialization``
    overrides for all.  Deterministic (sorted) order; nesting is allowed
    (dbt subdirectory layout)."""
    import os

    out: list[Model] = []
    for root, _dirs, files in sorted(os.walk(directory)):
        for fname in sorted(files):
            if not fname.endswith(".sql"):
                continue
            name = fname[: -len(".sql")]
            with open(os.path.join(root, fname)) as fh:
                out.append(
                    sql_model(name, fh.read(), materialization=materialization, macros=macros)
                )
    return out


# ---------------------------------------------------------------------------
# {% macro %} file loading (dbt macros/ directory)
# ---------------------------------------------------------------------------

_MACRO_DEF_RE = re.compile(
    r"\{%-?\s*macro\s+(\w+)\s*\(([^)]*)\)\s*-?%\}(.*?)\{%-?\s*endmacro\s*-?%\}",
    re.S,
)
_DISPATCH_RE = re.compile(
    r"\{\{\s*return\(\s*adapter\.dispatch\(\s*'(\w+)'\s*\)\s*\(.*?\)\s*\)\s*\}\}",
    re.S,
)
_PARAM_SUB_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def parse_macro_defs(text: str) -> dict[str, tuple[list[str], str]]:
    """``{% macro name(a, b) %}body{% endmacro %}`` blocks -> name ->
    (param names, body text).  Comments stripped first."""
    text = _COMMENT_RE.sub("", text)
    out: dict[str, tuple[list[str], str]] = {}
    for name, params, body in _MACRO_DEF_RE.findall(text):
        plist = [p.split("=")[0].strip() for p in params.split(",") if p.strip()]
        out[name] = (plist, body)
    return out


def load_macro_files(
    paths: "Iterable[str]", adapter: str = "spark"
) -> dict[str, Callable[..., str]]:
    """dbt ``macros/`` directory loading: every ``{% macro %}`` in the given
    ``.sql`` files becomes a callable usable by ``compile_model_sql``.

    Supported macro shapes (the reference's own surface,
    ``macros/cents_to_dollars.sql:1-21``):

    - plain substitution bodies — ``{{ param }}`` occurrences replaced by
      the call's arguments;
    - the adapter-dispatch idiom — a body of
      ``{{ return(adapter.dispatch('x')(...)) }}`` resolves to
      ``<adapter>__x`` if defined, else ``default__x`` (dbt's own fallback
      chain, truncated to one adapter).

    Control-flow macros (``{% set %}``/``{% if %}`` over node metadata, like
    the reference's ``generate_schema_name``) are not expressible here —
    that one is implemented natively (``core/model.py resolve_schema``,
    citing ``macros/generate_schema_name.sql:5-21``).
    """
    defs: dict[str, tuple[list[str], str]] = {}
    for p in paths:
        with open(p) as f:
            defs.update(parse_macro_defs(f.read()))

    def make(name: str) -> Callable[..., str]:
        def call(*args, **kwargs) -> str:
            params, body = defs[name]
            m = _DISPATCH_RE.search(body)
            if m:
                base = m.group(1)
                target = (
                    f"{adapter}__{base}"
                    if f"{adapter}__{base}" in defs
                    else f"default__{base}"
                )
                params, body = defs[target]
            env = dict(zip(params, [str(a) for a in args]))
            env.update({k: str(v) for k, v in kwargs.items()})
            return _PARAM_SUB_RE.sub(
                lambda mm: env.get(mm.group(1), mm.group(0)), body
            ).strip()

        return call

    return {n: make(n) for n in defs if "__" not in n}
