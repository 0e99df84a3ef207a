"""dbt-style command-line interface over the trends project — the entry
point a dbt user expects (``dbt build`` / ``run`` / ``test`` / ``seed`` /
``ls`` / ``compile`` / ``show`` / ``docs generate`` / ``run-operation``,
README.md:96-107 and Taskfile.yml of the reference), mapped onto
:class:`~dbt_trill_shop_spark.core.dag.Project`.

Examples::

    python -m dbt_trill_shop_spark build --sf-dir /root/testdata/sf0.001
    python -m dbt_trill_shop_spark run --select +weekly_trends_summary
    python -m dbt_trill_shop_spark ls --select tag:weekly+
    python -m dbt_trill_shop_spark seed --vars '{"load_source_data": true}'
    python -m dbt_trill_shop_spark show --inline \
        "select count(*) n from {{ ref('stg_top_terms') }}"
    python -m dbt_trill_shop_spark docs --target-path target

Relations live in the SparkSession (views) and the project warehouse dir
(tables), so ``test`` materializes its selection first — the dbt ``build``
semantics; a long-lived metastore would let ``test`` run standalone.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(prog="dbt_trill_shop_spark")
    sub = ap.add_subparsers(dest="command", required=True)

    def common(p: argparse.ArgumentParser, select: bool = True) -> None:
        p.add_argument("--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
        p.add_argument("--target", default="dev")
        p.add_argument("--warehouse-dir", default=None)
        p.add_argument("--vars", default="{}", help="JSON dict, dbt --vars")
        if select:
            p.add_argument("--select", "-s", nargs="*", default=None)
            p.add_argument("--exclude", nargs="*", default=None)

    for name in ("build", "run", "test"):
        p = sub.add_parser(name)
        common(p)
        p.add_argument("--full-refresh", action="store_true")
        p.add_argument("--threads", type=int, default=1)
        p.add_argument(
            "--fail-fast", action="store_true",
            help="abort on the first error-severity test failure",
        )

    p = sub.add_parser("ls")
    common(p)

    p = sub.add_parser("seed")
    common(p, select=False)
    p.add_argument("--seed-dir", default=None)

    for name in ("compile", "show"):
        p = sub.add_parser(name)
        common(p, select=False)
        p.add_argument("--inline", required=True)
        if name == "show":
            p.add_argument("--limit", type=int, default=5)

    p = sub.add_parser("docs")
    common(p)
    p.add_argument("--target-path", default="target")
    p.add_argument("--no-compile", action="store_true",
                   help="write manifest only, skip building + catalog")

    p = sub.add_parser("run-operation")
    common(p, select=False)
    p.add_argument("macro")
    p.add_argument("--args", default="{}", help="JSON kwargs for the macro")

    return ap.parse_args(argv)


def _project(args: argparse.Namespace, spark):
    from .fixtures.trends_fixtures import register_trends_sources
    from .models.trends import trends_project

    p = trends_project(target=args.target, warehouse_dir=args.warehouse_dir)
    p.vars.update(json.loads(args.vars))
    p.add_sources(register_trends_sources(spark, args.sf_dir))
    return p


def _subset(p, args: argparse.Namespace):
    if getattr(args, "select", None) is None and getattr(args, "exclude", None) is None:
        return None
    return p.select_many(select=args.select, exclude=args.exclude)


def _spark():
    from .session import get_spark

    return get_spark(app_name="dbt-trill-shop-cli")


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])

    if args.command == "ls":
        # pure-metadata command: no SparkSession needed for the graph, but
        # sources register through Spark — use a local session lazily only
        # if a selector needs source nodes (model selectors don't).
        from .models.trends import trends_project

        p = trends_project(target=args.target, warehouse_dir=args.warehouse_dir)
        names = _subset(p, args)
        names = set(p.models) if names is None else names
        for n in sorted(names):
            print(n)
        return 0

    spark = _spark()
    if args.command in ("build", "run", "test"):
        p = _project(args, spark)
        results = p.build(
            spark,
            run_tests=args.command in ("build", "test"),
            subset=_subset(p, args),
            on_test_failure="raise" if args.fail_fast else "skip_downstream",
            full_refresh=args.full_refresh,
            on_model_error="continue",
            threads=args.threads,
        )
        n_fail = 0
        for name, status in sorted(p.last_run_results.items()):
            line = f"{status.get('status', '?'):8s} {name}"
            t = status.get("execution_time")
            print(line + (f"  [{t}s]" if t is not None else ""))
            if status.get("status") not in ("success", "skipped"):
                n_fail += 1
        for name, trs in sorted(results.items()):
            for r in trs:
                print(f"{r.status:8s} test {name}.{r.test}")
                if r.status == "error":
                    n_fail += 1
        return 1 if n_fail else 0

    if args.command == "seed":
        from .sources.seeds import load_seeds

        if not args.seed_dir:
            print("seed: --seed-dir is required (a dir of typed *.csv seeds)")
            return 2
        loaded = load_seeds(
            spark, args.seed_dir, target=args.target, vars=json.loads(args.vars)
        )
        for name in sorted(loaded):
            print(f"loaded raw.{name}")
        if not loaded:
            print("no seeds loaded (load_source_data var is false?)")
        return 0

    if args.command == "compile":
        p = _project(args, spark)
        print(p.compile_sql(args.inline))
        return 0

    if args.command == "show":
        from .core.jinja_lite import extract_deps

        p = _project(args, spark)
        needed = set()
        for r in extract_deps(args.inline):
            if r in p.models:
                needed |= p.select(f"+{r}")
        p.build(spark, run_tests=False, subset=needed)
        p.show(spark, args.inline, limit=args.limit).show(truncate=False)
        return 0

    if args.command == "docs":
        p = _project(args, spark)
        results = None
        if not args.no_compile:
            results = p.build(spark, run_tests=True, subset=_subset(p, args))
        p.write_artifacts(
            args.target_path,
            test_results=results,
            with_catalog=not args.no_compile,
            with_docs_site=True,
        )
        names = ["manifest.json", "run_results.json", "index.html"] + (
            [] if args.no_compile else ["catalog.json"]
        )
        for n in names:
            print(os.path.join(args.target_path, n))
        return 0

    if args.command == "run-operation":
        p = _project(args, spark)
        p.build(spark, run_tests=False, subset=_subset(p, args))
        df = p.run_operation(spark, args.macro, **json.loads(args.args))
        if df is not None:
            df.show(truncate=False)
        return 0

    raise AssertionError(f"unhandled command {args.command}")


if __name__ == "__main__":
    sys.exit(main())
