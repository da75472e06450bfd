"""Regenerate tests/golden/rows_only_anchors_sf0001.json — the content
anchors (row count + sha256 of canonically serialized values) for every
rows-only driver query over /root/testdata/sf0.001.

Run DELIBERATELY only when a semantic change to
shingling/hashing/clustering is intended (CLAUDE.md golden rule):

    python scripts/regen_rows_only_anchors.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = os.path.join(REPO, "tests", "golden", "rows_only_anchors_sf0001.json")
SF_DIR = "/root/testdata/sf0.001"


def anchor_of(df) -> dict:
    """Canonical content anchor: columns sorted by name, floats at .6f,
    rows sorted as '|'-joined strings, sha256 over the joined lines."""
    cols = sorted(df.columns)

    def fmt(v):
        if isinstance(v, (float, np.floating)):
            return f"{float(v):.6f}"
        if isinstance(v, (list, np.ndarray)):
            return ",".join(fmt(x) for x in v)
        return str(v)

    lines = sorted("|".join(fmt(r[c]) for c in cols) for _, r in df.iterrows())
    return {
        "n_rows": len(lines),
        "columns": cols,
        "sha256": hashlib.sha256("\n".join(lines).encode()).hexdigest(),
    }


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as m

    q = m.queries()
    # substring_edge_list keeps its own dedicated anchor file
    names = sorted(set(q) - set(m.oracle_sql()) - {"substring_edge_list"})
    out = {
        "comment": (
            "Content anchors for every rows-only driver query: full output "
            "over /root/testdata/sf0.001 as row count + sha256 of sorted "
            "'|'-joined values (columns sorted by name, floats .6f).  "
            "Regenerate DELIBERATELY only on semantic changes "
            "(scripts/regen_rows_only_anchors.py)."
        ),
        "sf_dir": SF_DIR,
        "queries": {},
    }
    for name in names:
        df = q[name](SF_DIR)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        out["queries"][name] = anchor_of(df)
        print(name, out["queries"][name]["n_rows"], out["queries"][name]["sha256"])
    with open(GOLDEN, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", GOLDEN)
    ray.shutdown()


if __name__ == "__main__":
    main()
