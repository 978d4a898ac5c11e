"""Weak-scaling push past 8M docs (r4 VERDICT #6): one leg at N docs on
local-cluster[4,4,16g], recording wall, docs/hour, per-stage seconds and
per-executor GC — extends the fixed-floor amortization trend
(BENCH/weak_scaling_8m_4x4.json) toward the 10^12-doc design point.

Usage: python tools/run_weak_scaling.py [n_docs]   (default 16_000_000)
Writes BENCH/weak_scaling_<n>m_4x4.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from run_scaling_cluster import run_one  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    res = run_one(4, n_docs, cores=4)
    out = REPO / "BENCH" / f"weak_scaling_{n_docs // 1_000_000}m_4x4.json"
    out.write_text(json.dumps(res, indent=1))
    print(json.dumps(res))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
