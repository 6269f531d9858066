"""CLI entry point: ``python -m migration_pair_ray <task> --config job.json``.

The ``ray job submit`` shape of the reference's ``Program.Main``
(``Program.cs:17-34``): read config, dispatch one task, print its summary.
Owns the Ray session (guarded — the external driver imports the library
with Ray already initialised and never goes through here).
"""

from __future__ import annotations

import argparse
import json
import sys

from migration_pair_ray.config import JobConfig
from migration_pair_ray.tasks import TASKS, run_task


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="migration_pair_ray")
    p.add_argument("task", choices=sorted(TASKS))
    p.add_argument("--config", required=True, help="JobConfig JSON file")
    p.add_argument("--input", default="",
                   help="bulk_load/ingest_jsonl: input path; "
                        "replicate: SOURCE JobConfig JSON")
    p.add_argument("--out", default="", help="snapshot output dir")
    p.add_argument("--fmt", default="", help="snapshot/bulk_load format")
    p.add_argument("--base-pid", type=int, default=-1,
                   help="split: base partition to split; refill: the "
                        "partition to rebuild from the change log")
    p.add_argument("--fanout", type=int, default=2,
                   help="split: number of children")
    p.add_argument("--max-rows", type=int, default=0,
                   help="split: sweep every partition above this row count")
    p.add_argument("--min-rows", type=int, default=0,
                   help="merge: sweep every split base whose children's "
                        "total rows fell below this")
    p.add_argument("--retain", type=int, default=0,
                   help="vacuum: superseded passes to keep per partition")
    p.add_argument("--to-pass", default="",
                   help="rollback: retained pass_id to restore as the "
                        "lake's current state (metadata-only CoW flip)")
    p.add_argument("--where", default="",
                   help="delete: 'col=value' equality predicate on winners")
    p.add_argument("--tag", default="",
                   help="delete: idempotence tag (defaults to --where)")
    p.add_argument("--column", default="",
                   help="index: lake column to build postings for")
    p.add_argument("--consumer", default="",
                   help="feed/export_feed: changefeed consumer id; "
                        "replicate/bootstrap: register the replica on the "
                        "SOURCE under this id so truncate_log's retention "
                        "horizon protects its unconsumed passes")
    p.add_argument("--ack", type=int, default=-1,
                   help="feed: advance the consumer cursor to this pass seq")
    p.add_argument("--incremental", action="store_true",
                   help="snapshot: per-partition export, rewriting only "
                        "partitions whose state moved since the last run")
    p.add_argument("--deep", action="store_true",
                   help="fsck: re-read state files (hash/tombstones/"
                        "uniqueness/routing)")
    p.add_argument("--through-seq", type=int, default=-1,
                   help="truncate_log: delete change files of passes up "
                        "to this seq (still capped by consumer cursors)")
    p.add_argument("--dry-run", action="store_true",
                   help="truncate_log: report without deleting")
    p.add_argument("--sources", default="",
                   help="replay_multi: comma-separated source changelog "
                        "dirs (order IS the lsn namespace)")
    p.add_argument("--names", default="",
                   help="replay_multi: comma-separated source names "
                        "matching --sources (defaults to src0,src1,...)")
    p.add_argument("--cutoff-us", type=int, default=0,
                   help="expire: tombstone winners with ts before this "
                        "unix-microsecond cutoff")
    p.add_argument("--top-k", type=int, default=5,
                   help="hotspots: how many whale conversations to report")
    p.add_argument("--poll-s", type=float, default=5.0,
                   help="tail: seconds between change-log polls")
    p.add_argument("--max-polls", type=int, default=0,
                   help="tail: stop after this many polls (0 = forever)")
    p.add_argument("--num-cpus", type=int, default=0)
    args = p.parse_args(argv)

    cfg = JobConfig.from_json(args.config)
    kw: dict = {}
    if args.input:
        kw["input_path"] = args.input
    if args.out:
        kw["out_dir"] = args.out
    if args.fmt:
        kw["fmt"] = args.fmt
    if args.task == "split":
        kw.update(base_pid=args.base_pid, fanout=args.fanout,
                  max_rows=args.max_rows)
    if args.task == "merge":
        kw.update(base_pid=args.base_pid, min_rows=args.min_rows)
    if args.task == "fsck":
        kw["deep"] = args.deep
    if args.task == "vacuum":
        kw["retain"] = args.retain
    if args.task == "rollback":
        kw["to_pass"] = args.to_pass
    if args.task == "maintain":
        kw.update(max_rows=args.max_rows, min_rows=args.min_rows,
                  fanout=args.fanout,
                  retain=args.retain if args.retain > 0 else -1)
    if args.task == "delete":
        kw.update(where=args.where, tag=args.tag)
    if args.task == "index":
        kw["column"] = args.column
    if args.task in ("compact", "refill"):
        kw["base_pid"] = args.base_pid
    if args.task in ("feed", "export_feed"):
        kw.update(consumer=args.consumer, ack=args.ack)
    if args.task in ("replicate", "bootstrap") and args.consumer:
        kw["src_consumer"] = args.consumer
    if args.task in ("snapshot", "verify_replica") and args.incremental:
        kw["incremental"] = True
    if args.task == "expire":
        kw["cutoff_us"] = args.cutoff_us
    if args.task == "truncate_log":
        kw.update(through_seq=args.through_seq, dry_run=args.dry_run)
    if args.task == "merge_branch":
        kw["dry_run"] = args.dry_run
    if args.task == "view":
        kw.update(where=args.where, consumer=args.consumer)
    if args.task == "hotspots":
        kw["top_k"] = args.top_k
    if args.task == "replay_multi":
        kw.update(sources=args.sources, names=args.names)
    if args.task == "tail":
        kw.update(poll_s=args.poll_s, max_polls=args.max_polls)

    import ray
    if not ray.is_initialized():
        init_kw = dict(address="local", include_dashboard=False,
                       ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            init_kw["num_cpus"] = args.num_cpus
        ray.init(**init_kw)
    try:
        summary = run_task(args.task, cfg, **kw)
        print(json.dumps(summary, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
