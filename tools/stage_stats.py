#!/usr/bin/env python
"""Print Ray Data ds.stats() for the flagship's stage datasets — the
"measure, don't guess" loop: run after changing a stage and check that
wall time is dominated by useful compute (udf time), not serialization
or scheduling. Usage: python tools/stage_stats.py [sf_dir]"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def condensed(stats: str, head: int = 18) -> str:
    """Keep the operator headlines + time totals, drop the histograms."""
    keep = []
    for line in stats.splitlines():
        if re.match(r"^(Operator|\s*\* (Remote wall time|Udf time|Total time)|Dataset)", line):
            keep.append(line.rstrip())
    return "\n".join(keep[: head * 3])


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from georay.pages import pages_dir_for
    from georay.pipelines.flagship import geotag_pipeline

    res = geotag_pipeline(pages_dir_for(SF_DIR))
    joined = res["joined"]
    joined.count()
    print("==== flagship joined stream ====")
    print(condensed(joined.stats()))
    print("\n==== stage timings (s) ====")
    for k, v in res["timings"].items():
        print(f"  {k:>16}: {v:.2f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
