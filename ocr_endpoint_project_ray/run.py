"""Job entry point — ``ray job submit -- python -m ocr_endpoint_project_ray.run ...``.

Runs the extraction pipeline over an interleaved-document corpus with
manifest-checkpointed, resumable output: each input shard (file) becomes one
output partition; a re-submitted job skips partitions the manifest marks
done, so a failed 100 TB run resumes from the gap instead of the start
(SURVEY.md §4 checkpoint/resume; the reference's analogue is append-only
SQLite + latest-snapshot dedup).

Owns its Ray session (guarded init) — unlike the library, which never does.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import ray


def _input_shards(path: str) -> list[str]:
    if os.path.isdir(path):
        shards = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if shards:
            return shards
    return [path]


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="ocr_endpoint_project_ray.run")
    sub = parser.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run the extraction pipeline, resumable")
    ex.add_argument("--input", required=True, help="corpus dir or parquet file (doc_id, spans)")
    ex.add_argument("--output", required=True, help="output dir (partitioned parquet + _manifest)")
    ex.add_argument("--num-partitions", type=int, default=None)
    ex.add_argument("--no-salt", action="store_true")
    ex.add_argument("--no-resume", action="store_true")
    ex.add_argument("--shards-per-partition", type=int, default=1)
    ex.add_argument(
        "--callback-url",
        default=None,
        help="POST the job summary JSON here when done (webhook sink, S9); "
        "delivery failures are recorded, never fatal",
    )
    ex.add_argument(
        "--report",
        action="store_true",
        help="write <output>/report.html: job summary + per-partition "
        "manifest metrics as a self-contained inline-SVG report "
        "(the reference's exports -> decision-report step)",
    )
    args = parser.parse_args(argv)

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from .pipelines.extraction import extract_documents
    from .sources.tables import read_docs
    from .state.manifest import manifest_metrics, run_partitioned

    shards = _input_shards(args.input)
    # fail fast on wrong inputs (e.g. a benchmark-tables dir): a shard
    # missing the corpus schema would otherwise surface as a KeyError deep
    # inside a Ray task minutes into the job
    for p in shards:
        if p.endswith(".parquet"):
            import pyarrow.parquet as pq

            names = pq.read_schema(p).names
            if "doc_id" not in names or "spans" not in names:
                parser.error(
                    f"{p} lacks the corpus schema (doc_id, spans); got {names}. "
                    "--input must point at an interleaved-document corpus."
                )
    groups = [
        shards[i : i + args.shards_per_partition]
        for i in range(0, len(shards), args.shards_per_partition)
    ]

    def process_one(group: list[str]):
        # read exactly this partition's shard files (read_parquet accepts a
        # path list) — never the whole input directory
        import ray.data

        ds = (
            read_docs(group[0])
            if len(group) == 1 and not group[0].endswith(".parquet")
            else ray.data.read_parquet(group)
        )
        # returned LAZY: run_partitioned consumes it with a distributed
        # write_parquet, so no partition is ever materialized on the driver
        # (memory bounded per block, not per shard)
        return extract_documents(
            ds, num_partitions=args.num_partitions, salted=not args.no_salt
        )

    def rows_in_of(group: list[str]) -> int | None:
        try:
            import pyarrow.parquet as pq

            parquet = [p for p in group if p.endswith(".parquet")]
            if not parquet:  # unknown input format → no lineage claim
                return None
            return sum(pq.read_metadata(p).num_rows for p in parquet)
        except Exception:
            return None

    t0 = time.time()
    results = run_partitioned(
        groups, args.output, process_one, resume=not args.no_resume, rows_in_fn=rows_in_of
    )
    metrics = manifest_metrics(args.output)
    summary = {
        "partitions": len(results),
        "skipped": sum(1 for r in results if r.skipped),
        "rows_out": int(sum(r.rows_out for r in results)),
        "wall_sec": round(time.time() - t0, 2),
        "manifest_rows": metrics.num_rows,
        "output": args.output,
    }
    if args.report:
        # per-partition lineage rendered for operators: wall/rows per
        # partition is where shuffle skew shows up first (≙ the reference's
        # exports -> generate_decision_report.py step, run on job state)
        from .pipelines.reports import render_html_report

        report_path = os.path.join(args.output, "report.html")
        title = (
            f"Extraction job: {summary['partitions']} partitions, "
            f"{summary['rows_out']} rows, {summary['wall_sec']}s"
        )
        with open(report_path, "w") as f:
            f.write(
                render_html_report(
                    title, [("partitions", metrics)], entity_col="partition"
                )
            )
        summary["report"] = report_path
    if args.callback_url:
        # one notification per job, after the manifest commits — the webhook
        # sink (S9, reference cv_api/main.py:199-220); never fatal
        from .state.notify import notify_callback, record_delivery

        receipt = notify_callback(args.callback_url, {"status": "succeeded", **summary})
        summary["callback_delivery"] = receipt
        record_delivery(args.output, receipt)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
