"""Named-query registry backing ``__spark_entry__``.

Every operator from SURVEY.md §2.B is exposed as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent DuckDB oracle SQL string. The driver compares
row count + schema + order-insensitive value hash at sf0.01.

Conventions that make the differential comparison well-defined:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are ``round()``-ed (2 dp for money sums, 4-6 dp for
  ratios/avgs) so floating summation order can't flip the hash;
- timestamps in output are formatted to strings (DuckDB reads the ns
  ``events.ts`` truncated to µs exactly like Spark, but string output removes
  any dtype ambiguity in the comparison layer);
- top-k queries order by the *rounded* measure plus a unique key so the
  k-boundary is deterministic in both engines.
"""

from __future__ import annotations

import glob
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    since: int = 0  # build round that added the query (0 = rounds 1-6)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    since: int = 0,
):
    """Decorator: register ``fn`` as the named query ``name``. ``since``
    (the round that added the query) keys the attestation ordering:
    newer registrations join the BACK of the never-attested queue so a
    new row never displaces a longer-waiting one from the driver's
    50-query round sample (VERDICT r6 #4/#8)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), since)
        return fn

    return deco


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        curation,
        drift,
        functions2,
        graph_analytics,
        joins,
        llm_dedup,
        llm_quality,
        llm_similarity,
        llm_text,
        mlprep,
        recommend,
        relational,
        relational2,
        relational3,
        scalars,
        setops,
        sketches,
        timeseries,
        udfs,
        warehouse,
        windows,
    )

    _LOADED = True


def _driver_attested() -> frozenset[str]:
    """Query names that already have a row in any past driver CORRECTNESS
    artifact. The driver walks ``queries()`` in dict order and may stop early
    (round 1 attested only 50/132), so ``registry()`` orders never-attested
    queries first — across rounds every query accumulates an external
    driver-verified row."""
    names: set[str] = set()
    root = Path(__file__).resolve().parents[2]
    for p in glob.glob(str(root / "CORRECTNESS_r*.json")):
        try:
            with open(p) as fh:
                names |= set(json.load(fh))
        except (OSError, ValueError):
            continue
    return frozenset(names)


def registry() -> dict[str, QuerySpec]:
    _load_all()
    seen = _driver_attested()
    # Stable sort: never-attested first so each driver round's 50-row sample
    # is all-new; within never-attested, rows-only (no-oracle) names last so
    # a structurally-unattestable row never burns a driver slot while an
    # oracled query is still waiting (r5: ``sample_seeded_fraction``), and
    # newer registrations (``since``) after longer-waiting ones (r6 #4).
    ordered = sorted(
        _REGISTRY,
        key=lambda n: (
            n in seen,
            _REGISTRY[n].oracle is None,
            _REGISTRY[n].since,
        ),
    )
    return {name: _REGISTRY[name] for name in ordered}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }
