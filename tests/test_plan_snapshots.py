"""Plan-fingerprint regression guard (tools/plan_snapshot.py): the
operator mix of the scale-critical queries' executed plans must match the
reviewed baseline. A silent broadcast->sort-merge flip, an extra
exchange, or lost scan pushdown fails HERE with a readable diff instead
of surfacing as an unexplained bench regression later. Regenerate
intentionally with `python tools/plan_snapshot.py --write`."""

from __future__ import annotations

import json
from pathlib import Path

from tools.plan_snapshot import BASELINE_PATH, SNAPSHOT_QUERIES, compute_all


def test_plan_fingerprints_match_baseline(spark, sf_dir):
    baseline = json.loads(Path(BASELINE_PATH).read_text())
    current = compute_all(spark, sf_dir)
    diffs = {
        n: {"baseline": baseline.get(n), "current": current[n]}
        for n in current
        if baseline.get(n) != current[n]
    }
    assert not diffs, json.dumps(diffs, indent=2)
    assert set(baseline) == set(SNAPSHOT_QUERIES)
