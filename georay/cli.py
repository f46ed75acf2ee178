"""Job entrypoint: ``python -m georay.cli run ...`` (the ``ray job
submit`` target — reference lifecycle §3.4 in SURVEY.md).

Owns the Ray session (guarded — under ``ray job submit`` the cluster
already exists and ``ray.init()`` attaches to it). Every stage writes
manifest-checkpointed parquet, so re-submitting the same command after
a failure resumes from the last committed stage.

Examples:
  python -m georay.cli run --pages /data/pages --out /data/georay_out
  python -m georay.cli run --sf-dir /root/testdata/sf0.01 --out /tmp/o --knn 3
  python -m georay.cli summary --file blob.kmz
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    return ray


def cmd_run(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .pages import pages_dir_for
    from .pipelines.flagship import geotag_pipeline

    pages_path = args.pages or pages_dir_for(args.sf_dir)
    t0 = time.perf_counter()
    res = geotag_pipeline(
        pages_path,
        out_dir=args.out,
        knn_k=args.knn,
        fingerprint=args.fingerprint,
    )
    counts = {
        "joined": res["joined"].count(),
        "tiles": res["tiles"].count(),
        "layers": res["layers"].count(),
    }
    if res["knn"] is not None:
        counts["knn"] = res["knn"].count()
    out = {
        "status": "ok",
        "out_dir": args.out,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "counts": counts,
        "timings": res["timings"],
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


def cmd_summary(args) -> int:
    from .summary import summarize_blob

    with open(args.file, "rb") as f:
        blob = f.read()
    blob_length = args.blob_length if args.blob_length is not None else len(blob)
    print(json.dumps(summarize_blob(blob, args.file, blob_length=blob_length)))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="georay", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run the geotag pipeline (resumable)")
    src = r.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages parquet directory")
    src.add_argument("--sf-dir", help="testdata sf dir (synthesizes the pages corpus)")
    r.add_argument("--out", required=True, help="output directory (checkpointed stages)")
    r.add_argument("--knn", type=int, default=0, help="kNN neighbors (0 = skip)")
    r.add_argument("--fingerprint", default="", help="input fingerprint for resume")
    r.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU count")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("summary", help="schema summary of one geo blob")
    s.add_argument("--file", required=True)
    s.add_argument("--blob-length", type=int, default=None, help="declared length (gates abbreviation)")
    s.set_defaults(fn=cmd_summary)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
