"""``{% docs %}`` blocks + dbt property-YAML loading — the documentation
surface of the reference project.

Reference semantics being mirrored:

- ``models/docs/google_trends_docs.md:1-269`` defines named markdown blocks
  with ``{% docs name %} ... {% enddocs %}``;
- property YAMLs reference them from ``description: '{{ doc("name") }}'``
  (``models/staging/__sources.yml:6``, ``models/marts/*.yml``);
- dbt resolves every ``doc()`` ref at parse time and embeds the text in the
  manifest, erroring on unknown names.

The property YAML is also where the reference declares its entire test suite
(68 ``data_tests`` entries across the staging/mart YAMLs — SURVEY.md §5), so
``load_properties`` builds the :mod:`testing` objects from YAML too, exactly
like dbt's schema parser.  Test entries accept the dbt config surface
(``severity``, ``warn_if`` / ``error_if``, ``store_failures``).
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

from .quality import FreshnessPolicy, parse_unit_tests
from .testing import (
    AcceptedRange,
    Finite,
    AcceptedValues,
    ConfiguredTest,
    NotNull,
    TestConfig,
    Unique,
    UniqueCombination,
)

_DOCS_RE = re.compile(
    r"\{%-?\s*docs\s+([A-Za-z0-9_]+)\s*-?%\}(.*?)\{%-?\s*enddocs\s*-?%\}", re.S
)
_DOC_REF_RE = re.compile(r"\{\{\s*doc\(\s*['\"]([A-Za-z0-9_]+)['\"]\s*\)\s*\}\}")


def parse_doc_blocks(text: str) -> dict[str, str]:
    """``{% docs name %}body{% enddocs %}`` -> ``{name: body}`` (bodies
    stripped).  Duplicate names are an error, as in dbt."""
    out: dict[str, str] = {}
    for name, body in _DOCS_RE.findall(text):
        if name in out:
            raise ValueError(f"duplicate doc block {name!r}")
        out[name] = body.strip()
    return out


def load_doc_blocks(*paths: str) -> dict[str, str]:
    """Parse every ``{% docs %}`` block across one or more markdown files."""
    out: dict[str, str] = {}
    for path in paths:
        with open(path) as fh:
            blocks = parse_doc_blocks(fh.read())
        dup = set(out) & set(blocks)
        if dup:
            raise ValueError(f"doc blocks redefined across files: {sorted(dup)}")
        out.update(blocks)
    return out


def resolve_doc_refs(description: str, docs: dict[str, str]) -> str:
    """Expand ``{{ doc("name") }}`` references; unknown names raise, exactly
    like dbt's parse-time doc resolution."""

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in docs:
            raise KeyError(f"unknown doc block {name!r}")
        return docs[name]

    return _DOC_REF_RE.sub(sub, description or "")


# -- data_tests parsing (dbt schema-YAML test grammar) -----------------------

_TEST_BUILDERS = {
    "not_null": lambda col, kw: NotNull(col),
    "unique": lambda col, kw: Unique(col),
    "accepted_values": lambda col, kw: AcceptedValues(col, tuple(kw["values"])),
    "accepted_range": lambda col, kw: AcceptedRange(
        col,
        min_value=kw.get("min_value"),
        max_value=kw.get("max_value"),
        inclusive=kw.get("inclusive", True),
    ),
    "unique_combination_of_columns": lambda col, kw: UniqueCombination(
        tuple(kw["combination_of_columns"])
    ),
    "finite": lambda col, kw: Finite(col),
}


def _parse_config(kw: dict[str, Any]) -> TestConfig | None:
    cfg = kw.get("config") or {}
    # dbt also accepts severity at the top level of the test kwargs
    if "severity" in kw:
        cfg.setdefault("severity", kw["severity"])
    if not cfg:
        return None
    return TestConfig(
        severity=str(cfg.get("severity", "error")).lower(),
        warn_if=cfg.get("warn_if", ">0"),
        error_if=cfg.get("error_if", ">0"),
        store_failures=bool(cfg.get("store_failures", False)),
    )


def parse_test_entry(entry: str | dict, column: str | None):
    """One ``data_tests:`` list item -> a test object.

    Grammar (dbt schema YAML): a bare string (``- not_null``) or a one-key
    mapping with kwargs (``- accepted_values: {values: [...], config: {...}}``).
    """
    if isinstance(entry, str):
        name, kw = entry, {}
    elif isinstance(entry, dict) and len(entry) == 1:
        name, kw = next(iter(entry.items()))
        kw = kw or {}
    else:
        raise ValueError(f"malformed test entry {entry!r}")
    if name not in _TEST_BUILDERS:
        raise ValueError(f"unknown generic test {name!r}")
    test = _TEST_BUILDERS[name](column, kw)
    cfg = _parse_config(kw)
    return ConfiguredTest(test, cfg) if cfg else test


def _columns_meta(cols: list[dict], docs: dict[str, str]):
    columns: dict[str, str] = {}
    tests: list = []
    types: dict[str, str] = {}
    for c in cols or []:
        columns[c["name"]] = resolve_doc_refs(c.get("description", ""), docs)
        if "data_type" in c:
            types[c["name"]] = str(c["data_type"])
        # an empty `data_tests:` key parses as None — treat as no tests
        for entry in c.get("data_tests", c.get("tests")) or []:
            tests.append(parse_test_entry(entry, c["name"]))
    return columns, tests, types


def load_properties(path: str, docs: dict[str, str] | None = None) -> dict:
    """Parse a dbt property YAML (``version: 2`` grammar): sources + models
    with descriptions, column metadata, and data tests, all ``doc()`` refs
    resolved.

    Returns ``{"sources": {table: {...}}, "models": {name: {...}}}`` where
    each entry carries ``description``, ``columns`` (name -> resolved
    description) and ``tests`` (built test objects; sources' tests included).
    """
    docs = docs or {}
    with open(path) as fh:
        spec = yaml.safe_load(fh) or {}
    out: dict[str, dict] = {"sources": {}, "models": {}}
    for src in spec.get("sources", []) or []:
        src_fresh = src.get("freshness")
        src_loaded = src.get("loaded_at_field", "")
        for tbl in src.get("tables", []) or []:
            columns, tests, _types = _columns_meta(tbl.get("columns"), docs)
            fresh_spec = tbl.get("freshness", src_fresh)  # table overrides source
            freshness = None
            if fresh_spec:
                freshness = FreshnessPolicy.from_yaml(
                    {**fresh_spec, "loaded_at_field": tbl.get("loaded_at_field", src_loaded)}
                )
            out["sources"][tbl["name"]] = {
                "source": src["name"],
                "description": resolve_doc_refs(tbl.get("description", ""), docs),
                "source_description": resolve_doc_refs(src.get("description", ""), docs),
                "columns": columns,
                "tests": tests,
                "freshness": freshness,
            }
    for mdl in spec.get("models", []) or []:
        columns, tests, types = _columns_meta(mdl.get("columns"), docs)
        for entry in mdl.get("data_tests", mdl.get("tests")) or []:
            tests.append(parse_test_entry(entry, None))
        # dbt model contract: config.contract.enforced + per-column data_type
        enforced = bool(
            ((mdl.get("config") or {}).get("contract") or {}).get("enforced", False)
        )
        out["models"][mdl["name"]] = {
            "description": resolve_doc_refs(mdl.get("description", ""), docs),
            "columns": columns,
            "tests": tests,
            "contract": types if enforced else None,
        }
    out["unit_tests"] = parse_unit_tests(spec)
    return out


def default_docs_paths() -> list[str]:
    """The project's own doc-block markdown files (models/docs/*.md)."""
    d = os.path.join(os.path.dirname(os.path.dirname(__file__)), "models", "docs")
    if not os.path.isdir(d):
        return []
    return [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".md")]
