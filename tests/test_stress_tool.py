"""Unit pins for the sf1x/sf10x synthesis character maps
(tools/stress_sf1.py): the §13 scale-sweep claims (within-replica
duplicate geometry untouched, cross-replica decorrelated, factor-10
output stable across rounds) all rest on these pure-Python properties,
so they are pinned here instead of trusted.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from stress_sf1 import _cmap  # noqa: E402


def test_cmap_is_bijective_for_all_factor100_replicas():
    # translate(src->dst) preserves string equality within a replica only
    # if the map is a bijection on the mapped alphabet
    for r in range(100):
        src, dst = _cmap(r)
        assert len(src) == len(set(src)), f"replica {r}: src has dup chars"
        assert len(dst) == len(set(dst)), f"replica {r}: dst has dup chars"
        assert sorted(src) == sorted(dst), (
            f"replica {r}: dst is not a permutation of src"
        )


def test_cmap_distinct_across_composite_period():
    # 5 vowel x 5 consonant x 5 second-band rotations = 125 distinct maps;
    # identical maps across replicas would make those replicas exact text
    # copies, deepening duplicate clusters superlinearly in the sweep data
    maps = {_cmap(r) for r in range(100)}
    assert len(maps) == 100


def test_cmap_factor10_matches_round5_synthesis():
    # the third band must be inert for r < 25 so .benchdata/sf1x regenerated
    # with the factor-100-capable tool is bit-identical to the round-5 data
    # behind BENCH.md §13/§13b/§13c
    for r in range(10):
        src, dst = _cmap(r)
        m = dict(zip(src, dst))
        v, c = "aeiou", "bcdfg"
        rot_v = v[r % 5:] + v[: r % 5]
        rot_c = c[r // 5 % 5:] + c[: r // 5 % 5]
        for s, d in zip(v + c, rot_v + rot_c):
            assert m[s] == d, f"replica {r}: {s} maps to {m[s]}, round 5 had {d}"
        for ch in "hjklm":  # third band inert below r=25
            assert m[ch] == ch
