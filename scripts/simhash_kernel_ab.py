#!/usr/bin/env python
"""Time the simhash signature kernel (VERDICT r3 item 3 done-criterion):
run simhash_signatures over the sf0.1 documents corpus in THIS tree and
report kernel wall time within one invocation. Run once from the repo root
(current vectorized kernel) and once from a worktree of the round-3 close
commit (per-doc Python token loop) to get the A/B:

    python scripts/simhash_kernel_ab.py <label>
"""

from __future__ import annotations

import json
import sys
import time

import ray


def main() -> int:
    label = sys.argv[1] if len(sys.argv) > 1 else "current"
    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, ".")
    from anonymization_ray.extras.dedup import simhash_signatures
    from anonymization_ray.queries import load

    docs = load("/root/testdata/sf0.1", "documents", ["doc_id", "text"]).materialize()
    docs.count()  # input fully staged: the timed section is the kernel
    t0 = time.perf_counter()
    sigs = simhash_signatures(docs, "text", "doc_id").materialize()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {"label": label, "kernel_sec": round(wall, 2), "rows": sigs.count()}
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
