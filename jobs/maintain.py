"""spark-submit entrypoint for table MAINTENANCE — the operational verbs
around the replay job (jobs/replay.py), one exactly-where-you-expect-it
CLI per SnapTable operation:

    spark-submit --py-files dist/engine.zip jobs/maintain.py \
        <verb> --table /path/to/table [verb options]

Verbs:
    describe                       DESCRIBE DETAIL (one JSON object)
    history                        commit log, one JSON line per version
    files                          file inventory, one JSON line per file
    compact [--target-files N] [--cluster-by a,b]   bin-pack / (z-)cluster
    rebucket --num-buckets N       bucket-layout evolution
    restore --version V            metadata-only rollback
    tag --name N [--version V]     pin a snapshot (protected from expire)
    drop-tag --name N              remove a tag
    tags                           list tags (name -> version)
    create-branch --name N         fork a WAP branch from the head
    drop-branch --name N           delete a branch chain
    branches                       list branches
    fast-forward --name N          publish a branch's commits onto main
    expire [--keep-last N] [--max-age-sec S]   expire_snapshots
    vacuum [--older-than-sec S]    remove orphaned files
    delete-where --where SQL       row-level DELETE
    update-where --where SQL --set col=expr[,col=expr]   row-level UPDATE
    requeue --changes P --quarantine P [--fix-set col=expr]   DLQ redrive
                                   (repair + re-ingest quarantined rows
                                   under global LWW; watermark pinned)

All verbs are thin: parse, construct the session, call the one method.
The engine ships via --py-files exactly like the replay job; maintenance
services built from these verbs may safely RACE the replay (optimistic
concurrency resolves, see snaptable.py's conflict matrix).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_set(spec: str) -> dict:
    """col=expr[,col=expr] — splits on commas NOT inside parens/quotes so
    expressions like concat(a, b) survive."""
    out, buf, depth, quote = {}, "", 0, None
    parts = []
    for ch in spec:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(buf)
            buf = ""
            continue
        buf += ch
    if buf.strip():
        parts.append(buf)
    for p in parts:
        col, eq, expr = p.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise SystemExit(f"--set entry {p!r} is not col=expr")
        out[col.strip()] = expr.strip()
    return out


def run(spark, argv) -> int:
    """Verb dispatch against an existing session (pytest drives this
    directly; main() wraps it for spark-submit)."""
    ap = argparse.ArgumentParser(description="SnapTable maintenance")
    sub = ap.add_subparsers(dest="verb", required=True)

    def p(name):
        s = sub.add_parser(name)
        s.add_argument("--table", required=True)
        return s

    p("describe")
    p("history")
    p("files")
    c = p("compact")
    c.add_argument("--target-files", type=int, default=1)
    c.add_argument("--cluster-by", default=None,
                   help="one column = range clustering; comma-separated "
                   "columns = z-order")
    r = p("rebucket")
    r.add_argument("--num-buckets", type=int, required=True)
    rs = p("restore")
    rs.add_argument("--version", type=int, default=None)
    rs.add_argument("--tag", default=None)
    bc = p("create-branch")
    bc.add_argument("--name", required=True)
    bd = p("drop-branch")
    bd.add_argument("--name", required=True)
    p("branches")
    ff = p("fast-forward")
    ff.add_argument("--name", required=True)
    tg = p("tag")
    tg.add_argument("--name", required=True)
    tg.add_argument("--version", type=int, default=None)
    dt = p("drop-tag")
    dt.add_argument("--name", required=True)
    p("tags")
    e = p("expire")
    e.add_argument("--keep-last", type=int, default=2)
    e.add_argument("--max-age-sec", type=float, default=None,
                   help="also require committed_at older than now - N sec "
                   "(keep-last stays a floor)")
    e.add_argument("--dry-run", action="store_true")
    v = p("vacuum")
    v.add_argument("--older-than-sec", type=float, default=3600.0)
    v.add_argument("--dry-run", action="store_true")
    d = p("delete-where")
    d.add_argument("--where", required=True)
    u = p("update-where")
    u.add_argument("--where", required=True)
    u.add_argument("--set", required=True, dest="set_spec")
    rq = p("requeue")
    rq.add_argument("--changes", required=True,
                    help="the change-log root the pipeline replays (needed "
                    "for the global-LWW applied-offset guard)")
    rq.add_argument("--quarantine", required=True,
                    help="the dead-letter SnapTable path")
    rq.add_argument("--fix-set", default=None, dest="fix_spec",
                    help="col=expr rewrites applied to the quarantined "
                    "rows before re-ingest (the producer fix), e.g. "
                    "--fix-set \"payload=regexp_replace(payload, 'a', 'b')\""
                    "; omit to retry rows as-is")
    rq.add_argument("--no-evolve", action="store_true",
                    help="freeze the table schema during the redrive (pass "
                    "this if the production replay runs with --no-evolve — "
                    "otherwise a repair carrying a new payload key would "
                    "add a column the pipeline owner disabled)")
    rq.add_argument("--expect", action="append", default=[],
                    metavar="NAME:ACTION:PREDICATE",
                    help="data-quality expectations over redriven winners "
                    "(same algebra as the replay CLI) — pass the SAME "
                    "expectations the production pipeline runs with, or "
                    "redriven rows bypass them")
    args = ap.parse_args(argv)

    from embulk_filter_expand_json_spark.streaming.snaptable import SnapTable

    t = SnapTable(spark, args.table)
    if args.verb == "describe":
        print(json.dumps(t.describe_detail(), default=str))
    elif args.verb == "history":
        for h in t.history():
            print(json.dumps(h, default=str))
    elif args.verb == "files":
        for row in t.files_df().toLocalIterator():
            print(json.dumps(row.asDict(), default=str))
    elif args.verb == "compact":
        cb = args.cluster_by
        if cb and "," in cb:
            cb = [c for c in cb.split(",") if c]
        print(json.dumps(t.compact(
            target_files_per_bucket=args.target_files, cluster_by=cb
        )))
    elif args.verb == "rebucket":
        print(json.dumps(t.rebucket(args.num_buckets)))
    elif args.verb == "restore":
        print(json.dumps(t.restore(version=args.version, tag=args.tag)))
    elif args.verb == "create-branch":
        t.create_branch(args.name)
        print(json.dumps({"created": args.name}))
    elif args.verb == "drop-branch":
        t.drop_branch(args.name)
        print(json.dumps({"dropped": args.name}))
    elif args.verb == "branches":
        print(json.dumps(t.branches()))
    elif args.verb == "fast-forward":
        print(json.dumps(t.fast_forward(args.name)))
    elif args.verb == "tag":
        print(json.dumps(t.create_tag(args.name, version=args.version)))
    elif args.verb == "drop-tag":
        t.drop_tag(args.name)
        print(json.dumps({"dropped": args.name}))
    elif args.verb == "tags":
        print(json.dumps(t.tags()))
    elif args.verb == "expire":
        cutoff = (
            time.time() - args.max_age_sec
            if args.max_age_sec is not None else None
        )
        print(json.dumps(t.expire_snapshots(
            keep_last=args.keep_last, older_than=cutoff,
            dry_run=args.dry_run,
        )))
    elif args.verb == "vacuum":
        print(json.dumps(t.remove_orphans(
            older_than_sec=args.older_than_sec, dry_run=args.dry_run
        )))
    elif args.verb == "delete-where":
        print(json.dumps(t.delete_where(args.where)))
    elif args.verb == "update-where":
        print(json.dumps(t.update_where(args.where, _parse_set(args.set_spec))))
    elif args.verb == "requeue":
        from pyspark.sql import functions as F

        from embulk_filter_expand_json_spark.streaming.pipeline import (
            CdcPipeline,
        )

        expectations = []
        for s in args.expect:
            if s.count(":") < 2:
                raise SystemExit(f"--expect {s!r} is not NAME:ACTION:PREDICATE")
            name, action, pred = s.split(":", 2)
            expectations.append((name, pred, action))
        pipe = CdcPipeline(
            spark, args.changes, args.table, quarantine_path=args.quarantine,
            expectations=expectations, auto_evolve=not args.no_evolve,
        )
        fix = None
        if args.fix_spec:
            assigns = _parse_set(args.fix_spec)

            def fix(df, _assigns=assigns):
                for c, e in _assigns.items():
                    df = df.withColumn(c, F.expr(e))
                return df

        print(json.dumps(pipe.requeue_quarantine(fix)))
    return 0


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("snaptable-maintain")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        return run(spark, sys.argv[1:])
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
