"""Static documentation site from the ``target/`` artifacts.

The reference workflow ends with ``dbt docs generate`` + ``dbt docs serve``
(reference README.md:139 area): manifest + catalog rendered as a browsable
site.  This module closes that last step for the Spark engine — it renders
the same three artifacts :meth:`Project.write_artifacts` emits
(``manifest.json``, ``catalog.json``, ``run_results.json``) into ONE
self-contained ``index.html`` (inline CSS, no external assets, no JS
dependencies), so ``python -m http.server`` over the target directory — or
just opening the file — is the whole "serve" step.

Driver-side only by construction: the site is built from the already-written
JSON artifacts (no Spark jobs, no data reads), so generating docs for a
100 TB deployment costs exactly what writing the artifacts cost — the
catalog's one profile pass per relation — plus string formatting.
"""

from __future__ import annotations

import html
import json
import os

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 0;
       color: #1a2030; background: #f7f8fa; }
header { background: #1a2030; color: #fff; padding: 14px 28px; }
header h1 { margin: 0; font-size: 18px; font-weight: 600; }
header .sub { color: #9aa3b5; font-size: 12px; margin-top: 2px; }
nav { position: fixed; top: 58px; bottom: 0; left: 0; width: 230px;
      overflow-y: auto; background: #fff; border-right: 1px solid #e2e5ea;
      padding: 12px 0; }
nav h2 { font-size: 11px; text-transform: uppercase; letter-spacing: .06em;
         color: #6b7280; margin: 14px 16px 6px; }
nav a { display: block; padding: 3px 16px; font-size: 13px; color: #2a4d8f;
        text-decoration: none; }
nav a:hover { background: #eef1f6; }
main { margin-left: 246px; padding: 20px 32px 60px; max-width: 980px; }
section { background: #fff; border: 1px solid #e2e5ea; border-radius: 6px;
          padding: 18px 22px; margin-bottom: 18px; }
section h2 { margin: 0 0 4px; font-size: 16px; }
.meta { font-size: 12px; color: #6b7280; margin-bottom: 8px; }
.meta b { color: #374151; font-weight: 600; }
.desc { font-size: 13px; margin: 8px 0; }
.lineage { font-size: 12px; margin: 6px 0; }
.lineage a { color: #2a4d8f; text-decoration: none; }
table { border-collapse: collapse; width: 100%; font-size: 12px;
        margin-top: 8px; }
th, td { text-align: left; padding: 4px 8px; border-bottom: 1px solid
         #eef0f3; vertical-align: top; }
th { color: #6b7280; font-weight: 600; }
.tag, .test { display: inline-block; border-radius: 3px; padding: 1px 6px;
              font-size: 11px; margin-right: 4px; }
.tag { background: #eef1f6; color: #374151; }
.test { background: #e7f3ec; color: #14632f; }
.status-pass, .status-success { color: #14632f; }
.status-fail, .status-error { color: #b3261e; }
.status-warn { color: #8a6100; }
code { background: #f0f2f5; border-radius: 3px; padding: 0 4px;
       font-size: 12px; }
"""


def _esc(v: object) -> str:
    return html.escape("" if v is None else str(v))


def _anchor(name: str) -> str:
    return f"node-{name}"


def _columns_table(
    cols_meta: dict, catalog_cols: dict, tests_by_col: dict[str, list[str]]
) -> str:
    """Merge manifest column docs with catalog types/stats into one table."""
    names = list(catalog_cols) if catalog_cols else list(cols_meta)
    if not names:
        return ""
    has_stats = any((catalog_cols.get(c) or {}).get("stats") for c in names)
    head = "<tr><th>column</th><th>type</th><th>description</th><th>tests</th>"
    head += "<th>non-null</th><th>~distinct</th><th>min</th><th>max</th></tr>" if has_stats else "</tr>"
    rows = [head]
    for c in names:
        cat = catalog_cols.get(c) or {}
        meta = cols_meta.get(c) or {}
        desc = meta.get("description", meta) if isinstance(meta, dict) else meta
        tests = "".join(f'<span class="test">{_esc(t)}</span>' for t in tests_by_col.get(c, []))
        row = (
            f"<tr><td><code>{_esc(c)}</code></td><td>{_esc(cat.get('type', ''))}</td>"
            f"<td>{_esc(desc)}</td><td>{tests}</td>"
        )
        if has_stats:
            st = cat.get("stats") or {}
            row += (
                f"<td>{_esc(st.get('non_null', ''))}</td>"
                f"<td>{_esc(st.get('approx_distinct', ''))}</td>"
                f"<td>{_esc(st.get('min', ''))}</td><td>{_esc(st.get('max', ''))}</td>"
            )
        rows.append(row + "</tr>")
    return "<table>" + "".join(rows) + "</table>"


def _split_args(inner: str) -> list[str]:
    """Split a repr's arg list on TOP-LEVEL commas only — a bare
    ``.split(',')`` fragments list/tuple/dict-valued args like
    ``values=['a', 'b']`` into broken pieces."""
    parts, depth, quote, start = [], 0, "", 0
    for i, ch in enumerate(inner):
        if quote:
            if ch == quote and inner[i - 1] != "\\":
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i])
            start = i + 1
    parts.append(inner[start:])
    return parts


def _tests_by_column(node: dict) -> dict[str, list[str]]:
    """Manifest test strings are dataclass reprs — ``NotNull(column='week')``,
    ``AcceptedValues(column='refresh_date', values=[...])`` — bucket them by
    the ``column=`` kwarg (falling back to the first positional) and compact
    the badge to the test name plus any non-column args."""
    out: dict[str, list[str]] = {}
    for t in node.get("tests") or []:
        s = str(t)
        name, inner = (s.split("(", 1) + [""])[:2]
        inner = inner.rsplit(")", 1)[0]
        col, extras = "", []
        for part in _split_args(inner):
            part = part.strip()
            if part.startswith(("column=", "columns=")) and not col:
                col = part.split("=", 1)[1].strip("'\"[] ")
            elif part:
                extras.append(part)
        if not col and extras:
            col = extras.pop(0).strip("'\"")
        label = name + (f"({', '.join(extras)})" if extras else "")
        out.setdefault(col, []).append(label)
    return out


def render_docs_site(
    manifest: dict,
    catalog: dict | None = None,
    run_results: dict | None = None,
) -> str:
    """Render the artifacts into a single self-contained HTML page."""
    cat_nodes = (catalog or {}).get("nodes", {})
    nodes: dict[str, dict] = manifest.get("nodes", {})
    sources: dict[str, dict] = manifest.get("sources", {})
    downstream: dict[str, list[str]] = {}
    for name, node in nodes.items():
        for dep in node.get("deps") or []:
            downstream.setdefault(dep, []).append(name)
    statuses: dict[str, dict] = {}
    for r in (run_results or {}).get("results", []):
        uid = str(r.get("unique_id", ""))
        parts = uid.split(".")
        if len(parts) >= 3 and parts[0] == "model":
            statuses[parts[2]] = r

    nav = ["<h2>Sources</h2>"]
    nav += [f'<a href="#{_anchor(s)}">{_esc(s)}</a>' for s in sorted(sources)]
    nav.append("<h2>Models</h2>")
    nav += [f'<a href="#{_anchor(n)}">{_esc(n)}</a>' for n in nodes]

    body: list[str] = []
    for name in sorted(sources):
        src = sources[name] or {}
        body.append(
            f'<section id="{_anchor(name)}"><h2>{_esc(name)}</h2>'
            f'<div class="meta"><b>source</b></div>'
            f'<div class="desc">{_esc(src.get("description", ""))}</div>'
            + _columns_table(src.get("columns") or {}, cat_nodes.get(name, {}).get("columns", {}), {})
            + _lineage_line("consumed by", downstream.get(name, []))
            + "</section>"
        )
    for name, node in nodes.items():
        run = statuses.get(name, {})
        status = str(run.get("status", ""))
        run_bits = ""
        if run:
            run_bits = (
                f' · <b>last run</b> <span class="status-{_esc(status)}">{_esc(status)}</span>'
                + (f" in {run['execution_time']:.2f}s" if isinstance(run.get("execution_time"), (int, float)) else "")
                + (
                    f" · {_esc(run['rows_affected'])} rows"
                    if run.get("rows_affected") is not None
                    else ""
                )
            )
        tags = "".join(f'<span class="tag">{_esc(t)}</span>' for t in node.get("tags") or [])
        stats = (cat_nodes.get(name) or {}).get("stats") or {}
        rowcount = (
            f" · <b>rows</b> {_esc(stats['row_count'])}" if "row_count" in stats else ""
        )
        version = node.get("version")
        vbits = f" · <b>v</b>{_esc(version)}" if version is not None else ""
        body.append(
            f'<section id="{_anchor(name)}"><h2>{_esc(name)}</h2>'
            f'<div class="meta"><b>{_esc(node.get("materialization", ""))}</b>'
            f' · schema <code>{_esc(node.get("schema", ""))}</code>{vbits}{rowcount}{run_bits}</div>'
            f"<div>{tags}</div>"
            f'<div class="desc">{_esc(node.get("description", ""))}</div>'
            + _lineage_line("depends on", node.get("deps") or [])
            + _lineage_line("consumed by", downstream.get(name, []))
            + _columns_table(
                node.get("columns") or {},
                (cat_nodes.get(name) or {}).get("columns", {}),
                _tests_by_column(node),
            )
            + "</section>"
        )

    project = _esc(manifest.get("project", ""))
    target = _esc(manifest.get("target", ""))
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{project} — docs</title><style>{_CSS}</style></head><body>"
        f"<header><h1>{project}</h1>"
        f'<div class="sub">target: {target} · {len(nodes)} models · {len(sources)} sources</div></header>'
        f"<nav>{''.join(nav)}</nav><main>{''.join(body)}</main></body></html>"
    )


def _lineage_line(label: str, names: list[str]) -> str:
    if not names:
        return ""
    links = ", ".join(f'<a href="#{_anchor(n)}">{_esc(n)}</a>' for n in sorted(names))
    return f'<div class="lineage"><b>{_esc(label)}</b>: {links}</div>'


def write_docs_site(directory: str) -> str:
    """``dbt docs generate``'s site step: read the JSON artifacts already in
    ``directory`` (manifest required; catalog/run_results optional) and write
    ``index.html`` next to them.  Returns the written path."""
    with open(os.path.join(directory, "manifest.json")) as fh:
        manifest = json.load(fh)
    catalog = run_results = None
    cat_path = os.path.join(directory, "catalog.json")
    if os.path.exists(cat_path):
        with open(cat_path) as fh:
            catalog = json.load(fh)
    rr_path = os.path.join(directory, "run_results.json")
    if os.path.exists(rr_path):
        with open(rr_path) as fh:
            run_results = json.load(fh)
    out = os.path.join(directory, "index.html")
    with open(out, "w") as fh:
        fh.write(render_docs_site(manifest, catalog, run_results))
    return out
