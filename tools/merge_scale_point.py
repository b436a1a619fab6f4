"""Merge a SPARK_GRAFT_BENCH_ONLY partial re-measurement into a
scale-curve cache point (.scaledata/bench_<label>.json).

The curve caches exist so adding a scale point doesn't re-measure the
others; this tool is the sanctioned way to patch NEW keys into an
existing point without re-running its whole key set. Provenance is
mandatory: the partial run's {keys, git_head} record (bench.py emits
it whenever BENCH_ONLY is set) is appended to the cache's
``partial_reruns`` list, so a mixed-state artifact is auditable
(ADVICE r9 #3). The cache's ``value`` total is recomputed as the sum
of all per-query medians after the merge.

Usage: python tools/merge_scale_point.py LABEL PARTIAL_JSON
  e.g. python tools/merge_scale_point.py sf1.0 /tmp/scale_new_sf1.0.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    label, partial_path = sys.argv[1], sys.argv[2]
    cache_path = os.path.join(REPO, ".scaledata", f"bench_{label}.json")
    with open(cache_path) as f:
        cache = json.load(f)
    with open(partial_path) as f:
        partial = json.load(f)
    prov = partial.get("partial_rerun")
    if not prov:
        sys.exit("refusing: partial JSON has no partial_rerun record "
                 "(was SPARK_GRAFT_BENCH_ONLY set?)")
    if partial.get("errors"):
        sys.exit(f"refusing: partial run has errors {partial['errors']}")
    # A partial measured at the wrong SF (env-var typo) would silently
    # corrupt the curve — refuse unless the scale factors agree.
    cache_sf = cache.get("sf")
    partial_sf = partial.get("sf")
    if cache_sf is not None and partial_sf is not None and cache_sf != partial_sf:
        sys.exit(f"refusing: partial sf={partial_sf} does not match "
                 f"cache point {label} sf={cache_sf}")
    if partial_sf is not None:
        prov["sf"] = partial_sf
    before = set(cache["queries"])
    cache["queries"].update(partial["queries"])
    cache["value"] = round(sum(cache["queries"].values()), 3)
    if "stddev" in cache and "stddev" in partial:
        cache["stddev"].update(partial["stddev"])
    cache.setdefault("partial_reruns", []).append(prov)
    with open(cache_path, "w") as f:
        json.dump(cache, f)
    added = sorted(set(partial["queries"]) - before)
    print(f"{cache_path}: merged {len(partial['queries'])} keys "
          f"({len(added)} new: {added}) at head {prov['git_head']}")


if __name__ == "__main__":
    main()
