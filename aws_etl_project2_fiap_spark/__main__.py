"""Command-line entry point: run any catalog query, ad-hoc SQL over the
star schema, or inspect plans — the ergonomic surface a user migrating
from the reference's scripts drives day-to-day.

    python -m aws_etl_project2_fiap_spark list
    python -m aws_etl_project2_fiap_spark run a1_top5_7day_sum \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m aws_etl_project2_fiap_spark explain join_star_revenue
    python -m aws_etl_project2_fiap_spark sql \
        "SELECT count(*) FROM lineitem" --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _session():
    from .session import build_session

    return build_session(app_name="aws-etl-project2-fiap-spark-cli")


def cmd_list(_args) -> int:
    from .workload import COMPONENTS, ordered_catalog

    cat = ordered_catalog()
    for i, (name, qd) in enumerate(cat.items(), start=1):
        kind = "oracle" if qd.oracle is not None else "rows-only"
        print(f"{i:3d}  {name:32s} [{kind}]")
    print(f"-- {len(cat)} catalog queries; {len(COMPONENTS)} suite components "
          f"(run components by name too)")
    return 0


def _lookup(name: str):
    from .workload import COMPONENTS, ordered_catalog

    defs = {**ordered_catalog(), **COMPONENTS}
    if name not in defs:
        close = [n for n in defs if name.lower() in n.lower()]
        hint = f"; close matches: {', '.join(close[:5])}" if close else ""
        print(f"unknown query {name!r}{hint}", file=sys.stderr)
        return None
    return defs[name]


def cmd_run(args) -> int:
    qd = _lookup(args.name)
    if qd is None:
        return 2
    spark = _session()
    df = qd.spark(spark, args.sf_dir)
    n = df.count()
    df.show(args.limit, truncate=not args.wide)
    print(f"-- {args.name}: {n} rows total (showing up to {args.limit})")
    return 0


def cmd_explain(args) -> int:
    qd = _lookup(args.name)
    if qd is None:
        return 2
    spark = _session()
    qd.spark(spark, args.sf_dir).explain(mode=args.mode)
    return 0


def cmd_sql(args) -> int:
    from .io.parquet import read_star_schema

    spark = _session()
    read_star_schema(spark, args.sf_dir)
    df = spark.sql(args.query)
    df.show(args.limit, truncate=not args.wide)
    return 0


def cmd_lakesql(args) -> int:
    """Lakehouse SQL: MERGE INTO / UPDATE / DELETE / SELECT with
    VERSION|TIMESTAMP AS OF / RESTORE / DESCRIBE HISTORY / OPTIMIZE /
    VACUUM over registered versioned tables (lakesql.LakeSQL)."""
    from .lakesql import LakeSQL

    tables = {}
    for spec in args.table or []:
        name, _, path = spec.partition("=")
        if not path:
            print(f"--table needs NAME=PATH, got {spec!r}", file=sys.stderr)
            return 2
        tables[name] = path
    # --catalog: file-backed name→path registry — bindings registered
    # by one invocation (CREATE TABLE, --table) survive to the next
    lk = LakeSQL(_session(), tables, catalog_path=args.catalog)
    # multi-statement scripts run sequentially; the last result shows
    df = lk.sql_script(args.query)
    df.show(args.limit, truncate=not args.wide)
    return 0


def cmd_history(args) -> int:
    """DESCRIBE HISTORY: one line per retained version (operation,
    commit time, file count, commit extras)."""
    import datetime
    import json

    from .io import versioned as V

    current = V.current_version(args.table)
    for rec in reversed(V.table_history(args.table)):
        mark = "*" if rec["version"] == current else " "
        ts = datetime.datetime.fromtimestamp(
            rec["timestamp"]
        ).strftime("%Y-%m-%d %H:%M:%S")
        extras = {
            k: v
            for k, v in rec.items()
            if k not in ("version", "operation", "timestamp", "n_files")
        }
        print(
            f"{mark} v{rec['version']:<4d} {ts}  "
            f"{(rec['operation'] or '-'):<24s} {rec['n_files']:4d} files"
            + (f"  {json.dumps(extras)}" if extras else "")
        )
    print(f"-- current: v{current}; read any version with "
          f"`table --version N`")
    return 0


def cmd_table(args) -> int:
    """Read a versioned table (optionally a historical version or a
    stats-pruned range)."""
    from .io import versioned as V

    spark = _session()
    between = None
    if args.between:
        col, lo, hi = args.between
        # numeric bounds when they parse; strings otherwise
        def _coerce(x):
            try:
                return int(x)
            except ValueError:
                try:
                    return float(x)
                except ValueError:
                    return x
        between = (col, _coerce(lo), _coerce(hi))
    df = V.read_table(spark, args.table, version=args.version, between=between)
    df.show(args.limit, truncate=not args.wide)
    print(f"-- {df.count()} rows (v{args.version or V.current_version(args.table)})")
    return 0


def cmd_vacuum(args) -> int:
    from .io import versioned as V

    removed = V.vacuum(
        args.table, keep_last=args.keep_last,
        keep_seconds=getattr(args, "keep_seconds", None),
    )
    for d in removed:
        print(f"removed {d}")
    print(f"-- {len(removed)} batch dirs reclaimed; "
          f"keeping last {args.keep_last} versions")
    return 0


def cmd_changes(args) -> int:
    """Change data feed between two versions (file-diff CDF)."""
    from .io import versioned as V

    spark = _session()
    ch = V.table_changes(spark, args.table, args.from_version, args.to_version)
    ch.show(args.limit, truncate=not args.wide)
    n_ins = ch.filter(ch["_change_type"] == "insert").count()
    n_del = ch.filter(ch["_change_type"] == "delete").count()
    print(f"-- v{args.from_version} -> v{args.to_version}: "
          f"{n_ins} inserts, {n_del} deletes")
    return 0


def cmd_consume(args) -> int:
    """One incremental consumption of a versioned table's change feed:
    new rows since the cursor print to stdout (the operational smoke
    form of io/versioned.consume_changes — real deployments pass a
    parquet/catalog sink)."""
    from .io import versioned as V

    spark = _session()

    def sink(df):
        df.show(args.limit, truncate=not args.wide)
        print(f"-- delivered {df.count()} rows")

    res = V.consume_changes(spark, args.table, args.cursor, sink)
    print(f"-- cursor v{res['from']} -> v{res['to']}"
          + ("" if res["delivered"] else " (nothing new)"))
    return 0


def cmd_replicate(args) -> int:
    """One incremental replication pass: apply the source table's
    change feed (upserts AND deletes, key-reconciled) to the replica
    (io/versioned.replicate_table)."""
    from .io import versioned as V

    spark = _session()
    res = V.replicate_table(
        spark, args.src, args.dst, args.keys.split(","), args.cursor
    )
    print(
        f"-- v{res['from']} -> v{res['to']}: "
        f"{res['upserted']} upserted, {res['deleted']} deleted"
    )
    return 0


def cmd_delete(args) -> int:
    """DELETE FROM a versioned table (SQL boolean predicate); mode dv
    commits only deletion-vector sidecars, auto decides per file."""
    from pyspark.sql import functions as F

    from .io import versioned as V

    spark = _session()
    res = V.delete_from(
        spark, args.table, F.expr(args.where), mode=args.mode,
        rewrite_threshold=args.rewrite_threshold,
    )
    print(json.dumps(res))
    return 0


def cmd_optimize(args) -> int:
    """OPTIMIZE a versioned table: full compaction (optionally
    z-ordered) or incremental small-file merge."""
    from .io import versioned as V

    spark = _session()
    res = V.compact_table(
        spark, args.table,
        target_files=args.target_files,
        zorder_by=args.zorder_by or None,
        small_only_bytes=args.small_only_bytes,
    )
    print(json.dumps(res))
    return 0


def cmd_constraint(args) -> int:
    """List / add / drop CHECK constraints on a versioned table."""
    from .io import versioned as V

    if args.action == "list":
        print(json.dumps(V.table_constraints(args.table), indent=2))
        return 0
    if not args.name or (args.action == "add" and not args.expr):
        print(
            f"constraint {args.action} needs NAME"
            + (" and EXPR" if args.action == "add" else ""),
            file=sys.stderr,
        )
        return 2
    if args.action == "add":
        spark = _session()
        V.add_constraint(spark, args.table, args.name, args.expr)
        print(f"added CHECK {args.name}: {args.expr}")
    else:
        V.drop_constraint(args.table, args.name)
        print(f"dropped CHECK {args.name}")
    return 0


def cmd_reorg(args) -> int:
    """REORG APPLY (PURGE): rewrite only DV-carrying files."""
    from .io import versioned as V

    spark = _session()
    res = V.reorg_table(
        spark, args.table, min_dv_fraction=args.min_dv_fraction
    )
    print(json.dumps(res))
    return 0


def cmd_describe(args) -> int:
    """DESCRIBE DETAIL of a versioned table — metadata only, no job."""
    from .io import versioned as V

    print(json.dumps(V.describe_table(args.table), indent=2))
    return 0


def cmd_column(args) -> int:
    """ALTER TABLE column surface: metadata-only rename/drop via the
    manifest column mapping (io/versioned.rename_column/drop_column) —
    zero data IO at any table size."""
    from .io import versioned as V

    if args.action == "rename":
        if not (args.name and args.new_name):
            print("column rename needs <old> <new>", file=sys.stderr)
            return 2
        v = V.rename_column(args.table, args.name, args.new_name)
        print(f"renamed {args.name} -> {args.new_name} (v{v}, metadata-only)")
    elif args.action == "drop":
        if not args.name:
            print("column drop needs <name>", file=sys.stderr)
            return 2
        v = V.drop_column(args.table, args.name)
        print(f"dropped {args.name} (v{v}, metadata-only)")
    else:  # list
        m = V.table_mapping(args.table)
        print(json.dumps(m if m is not None else "identity (no mapping)"))
    return 0


def cmd_cluster(args) -> int:
    """ALTER TABLE ... CLUSTER BY: partition-spec evolution via the
    manifest cluster spec (io/versioned.alter_clustering) — metadata-
    only; supports hidden-partitioning transforms like month(ts) /
    bucket(8,key). `none` un-clusters; with no columns, prints the
    current spec."""
    from .io import versioned as V

    if not args.columns:
        print(json.dumps(V.table_cluster_spec(args.table)))
        return 0
    cols = None if args.columns == ["none"] else args.columns
    v = V.alter_clustering(args.table, cols)
    print(
        f"cluster spec of {args.table} -> "
        f"{json.dumps(V.table_cluster_spec(args.table, version=v))} "
        f"(v{v}, metadata-only; OPTIMIZE migrates old files)"
    )
    return 0


def cmd_clone(args) -> int:
    from .io import versioned as V

    spark = _session()
    v = V.clone_table(
        spark, args.src, args.dst, version=args.version, deep=args.deep
    )
    kind = "deep" if args.deep else "shallow"
    print(f"{kind} clone of {args.src} -> {args.dst} (v{v})")
    return 0


def cmd_stage(args) -> int:
    from .io import wap as WAP

    if args.action == "abandon":
        target = args.stage or args.table  # one positional: the stage
        WAP.abandon_stage(target)
        print(f"abandoned {target}")
        return 0
    if not args.stage:
        print(f"stage {args.action} needs TABLE and STAGE paths")
        return 2
    spark = _session()
    if args.action == "begin":
        v = WAP.begin_stage(spark, args.table, args.stage)
        print(f"staged {args.table}@v{v} -> {args.stage}")
    else:  # publish
        r = WAP.publish_stage(
            spark, args.table, args.stage,
            mode=args.mode, keep_stage=args.keep,
        )
        print(
            f"published {args.stage} -> {args.table} "
            f"(v{r['version']}, {r['mode']}, "
            f"{r['moved_dirs']} dir(s) moved)"
        )
    return 0


def cmd_matview(args) -> int:
    from .io import matview as MV

    # refresh/read take one path: argparse binds it to `source`
    if args.view is None:
        args.view = args.source
    if args.action == "create" and (not args.source or not args.view
                                    or args.view == args.source):
        print("matview create needs SOURCE and VIEW paths")
        return 2
    if not args.view:
        print("matview needs a VIEW path")
        return 2
    spark = _session()
    if args.action == "create":
        aggs = {}
        for spec in args.agg:
            # out=fn:col (count may omit :col → count(*))
            out, rhs = spec.split("=", 1)
            fn, _, col = rhs.partition(":")
            aggs[out] = (fn, col or None)
        dims = []
        for spec in args.dim or []:
            # path:key1,key2 (star-schema dimension join)
            path, _, keys = spec.rpartition(":")
            dims.append({"path": path, "keys": keys.split(",")})
        v = MV.create_aggregate_view(
            spark, args.source, args.view, args.group_by, aggs,
            dims=dims or None,
        )
        print(f"created {args.view} over {args.source} (v{v})")
    elif args.action == "refresh":
        r = MV.refresh_aggregate_view(spark, args.view)
        print(
            f"{r['strategy']} refresh v{r['from_version']}->"
            f"v{r['to_version']}: {r['groups_changed']} group(s), "
            f"view v{r['view_version']}"
        )
    elif args.action == "evolve":
        r = MV.evolve_dimensions(spark, args.view)
        print(
            f"{r['strategy']} dim evolution: {r['dims_evolved']} dim(s) "
            f"re-pinned, {r['groups_changed']} group(s), "
            f"view v{r['view_version']}"
        )
    else:  # read
        MV.read_aggregate_view(spark, args.view).show(
            args.limit, truncate=False
        )
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="aws_etl_project2_fiap_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries").set_defaults(fn=cmd_list)

    for verb, fn in (("run", cmd_run), ("explain", cmd_explain)):
        p = sub.add_parser(verb, help=f"{verb} a catalog query by name")
        p.add_argument("name")
        p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if verb == "run":
            p.add_argument("--limit", type=int, default=20)
            p.add_argument("--wide", action="store_true")
        else:
            p.add_argument(
                "--mode", default="formatted",
                choices=["simple", "extended", "formatted", "cost", "codegen"],
            )
        p.set_defaults(fn=fn)

    p = sub.add_parser("sql", help="ad-hoc SQL over the star-schema views")
    p.add_argument("query")
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--wide", action="store_true")
    p.set_defaults(fn=cmd_sql)

    p = sub.add_parser(
        "lakesql",
        help="lakehouse SQL over versioned tables (MERGE INTO / UPDATE / "
        "DELETE / VERSION AS OF / RESTORE / DESCRIBE HISTORY / OPTIMIZE / "
        "VACUUM / CREATE TABLE|MATERIALIZED VIEW [with JOIN dims]|BRANCH "
        "/ REFRESH ... [EVOLVE] / ALTER TABLE / SHOW TABLES / SHOW "
        "CREATE TABLE / EXPLAIN "
        "SELECT|MERGE|UPDATE|DELETE / DROP TABLE|BRANCH)",
    )
    p.add_argument("query")
    p.add_argument(
        "--table", action="append", metavar="NAME=PATH",
        help="bind a table name to a versioned-table path (repeatable)",
    )
    p.add_argument(
        "--catalog", metavar="FILE", default=None,
        help="file-backed name→path catalog: bindings registered in "
        "one invocation (CREATE TABLE, --table) survive to the next",
    )
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--wide", action="store_true")
    p.set_defaults(fn=cmd_lakesql)

    p = sub.add_parser("history", help="versioned-table commit log")
    p.add_argument("table")
    p.set_defaults(fn=cmd_history)

    p = sub.add_parser("table", help="read a versioned table")
    p.add_argument("table")
    p.add_argument("--version", type=int, default=None)
    p.add_argument(
        "--between", nargs=3, metavar=("COL", "LO", "HI"), default=None,
        help="manifest-stats file skipping on COL BETWEEN LO AND HI",
    )
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--wide", action="store_true")
    p.set_defaults(fn=cmd_table)

    p = sub.add_parser("vacuum", help="reclaim old versioned-table batches")
    p.add_argument("table")
    p.add_argument("--keep-last", type=int, default=2)
    p.add_argument(
        "--keep-seconds", type=float, default=None,
        help="also retain every version newer than this wall-clock window",
    )
    p.set_defaults(fn=cmd_vacuum)

    p = sub.add_parser("describe", help="DESCRIBE DETAIL (metadata only)")
    p.add_argument("table")
    p.set_defaults(fn=cmd_describe)

    p = sub.add_parser("reorg", help="purge deletion vectors (REORG)")
    p.add_argument("table")
    p.add_argument("--min-dv-fraction", type=float, default=0.0)
    p.set_defaults(fn=cmd_reorg)

    p = sub.add_parser(
        "consume",
        help="incrementally consume a versioned table's change feed",
    )
    p.add_argument("table")
    p.add_argument("cursor", help="path to the consumer's cursor JSON")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--wide", action="store_true")
    p.set_defaults(fn=cmd_consume)

    p = sub.add_parser("changes", help="change data feed between versions")
    p.add_argument("table")
    p.add_argument("from_version", type=int)
    p.add_argument("to_version", type=int)
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--wide", action="store_true")
    p.set_defaults(fn=cmd_changes)

    p = sub.add_parser("delete", help="DELETE FROM a versioned table")
    p.add_argument("table")
    p.add_argument("where", help="SQL boolean predicate, e.g. \"v < 0\"")
    p.add_argument("--mode", default="cow", choices=["cow", "dv", "auto"])
    p.add_argument("--rewrite-threshold", type=float, default=0.5)
    p.set_defaults(fn=cmd_delete)

    p = sub.add_parser(
        "replicate", help="apply a table's change feed to a replica"
    )
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("cursor", help="cursor JSON path (replica's progress)")
    p.add_argument("--keys", required=True,
                   help="comma-separated unique key column(s)")
    p.set_defaults(fn=cmd_replicate)

    p = sub.add_parser("optimize", help="compact a versioned table")
    p.add_argument("table")
    p.add_argument("--target-files", type=int, default=None)
    p.add_argument("--zorder-by", nargs="*", default=None)
    p.add_argument("--small-only-bytes", type=int, default=None)
    p.set_defaults(fn=cmd_optimize)

    p = sub.add_parser("constraint", help="CHECK constraints on a table")
    p.add_argument("action", choices=["list", "add", "drop"])
    p.add_argument("table")
    p.add_argument("name", nargs="?")
    p.add_argument("expr", nargs="?")
    p.set_defaults(fn=cmd_constraint)

    p = sub.add_parser(
        "column", help="metadata-only column rename/drop (column mapping)"
    )
    p.add_argument("action", choices=["list", "rename", "drop"])
    p.add_argument("table")
    p.add_argument("name", nargs="?")
    p.add_argument("new_name", nargs="?")
    p.set_defaults(fn=cmd_column)

    p = sub.add_parser(
        "cluster",
        help="partition-spec evolution: show/set CLUSTER BY "
        "(metadata-only; transforms: month(ts), bucket(8,k), ...)",
    )
    p.add_argument("table")
    p.add_argument("columns", nargs="*")
    p.set_defaults(fn=cmd_cluster)

    p = sub.add_parser("clone", help="clone a versioned table")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--deep", action="store_true")
    p.set_defaults(fn=cmd_clone)

    p = sub.add_parser(
        "stage",
        help="write-audit-publish (begin TABLE STAGE; "
        "publish TABLE STAGE [--mode append]; abandon STAGE)",
    )
    p.add_argument("action", choices=["begin", "publish", "abandon"])
    p.add_argument("table", help="table path (or stage path for abandon)")
    p.add_argument("stage", nargs="?")
    p.add_argument("--mode", choices=["fail", "append"], default="fail")
    p.add_argument("--keep", action="store_true")
    p.set_defaults(fn=cmd_stage)

    p = sub.add_parser(
        "matview",
        help="incremental materialized view "
        "(create SRC VIEW --group-by k --agg total=sum:price; "
        "refresh VIEW; evolve VIEW; read VIEW)",
    )
    p.add_argument("action", choices=["create", "refresh", "evolve", "read"])
    p.add_argument("source", nargs="?", help="source table (create only)")
    p.add_argument("view", nargs="?", help="view path")
    p.add_argument("--group-by", nargs="+", default=[])
    p.add_argument(
        "--agg", nargs="+", default=[],
        help="out=fn:col (fn: sum/count/avg/min/max; count may omit :col)",
    )
    p.add_argument(
        "--dim", nargs="+", default=[],
        help="star-schema dimension: path:key1,key2 (create only)",
    )
    p.add_argument("--limit", type=int, default=50)
    p.set_defaults(fn=cmd_matview)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
