"""Count-grain audit twins vs their pair-grain parents (round 8,
VERDICT r7 #2): the twins must be exact rollups of the full pair
queries — counts, modular checksums, and measure sums recomputed from
the parent's own output at small SF."""

from __future__ import annotations

import pytest

from dataingestion_pt_ms_spark.queries import registry

P = 1_000_000_007


@pytest.fixture(scope="module")
def specs():
    return registry()


def _rows(specs, name, spark, sf_dir):
    return specs[name].fn(spark, sf_dir).collect()


def test_minhash_counts_match_pairs(spark, sf_dir, specs):
    pairs = _rows(specs, "dedup_minhash_lsh_pairs_md5", spark, sf_dir)
    twins = _rows(specs, "dedup_minhash_lsh_pairs_counts", spark, sf_dir)
    assert sum(t.n_pairs for t in twins) == len(pairs)
    expect_chk = {}
    for r in pairs:
        d = int(r.jaccard * 10)
        expect_chk[d] = expect_chk.get(d, 0) + (r.key_a * 1000003 + r.key_b) % P
    assert {t.j_decile: t.pair_checksum for t in twins} == expect_chk
    for t in twins:
        s = sum(r.jaccard for r in pairs if int(r.jaccard * 10) == t.j_decile)
        assert abs(t.sum_jaccard - s) < 1e-6


def test_containment_counts_match_pairs(spark, sf_dir, specs):
    pairs = _rows(specs, "dedup_containment_pairs", spark, sf_dir)
    twins = _rows(specs, "dedup_containment_pairs_counts", spark, sf_dir)
    assert sum(t.n_pairs for t in twins) == len(pairs)

    def direction(r):
        a, b = r.c_a_in_b >= 0.9, r.c_b_in_a >= 0.9
        return "both" if (a and b) else ("a_in_b" if a else "b_in_a")

    for t in twins:
        sel = [r for r in pairs if direction(r) == t.direction]
        assert t.n_pairs == len(sel)
        assert t.pair_checksum == sum(
            (r.key_a * 1000003 + r.key_b) % P for r in sel
        )
        assert abs(t.sum_c_a_in_b - sum(r.c_a_in_b for r in sel)) < 1e-6


def test_winnowing_counts_match_pairs(spark, sf_dir, specs):
    pairs = _rows(specs, "dedup_winnowing_overlap", spark, sf_dir)
    twins = _rows(specs, "dedup_winnowing_overlap_counts", spark, sf_dir)
    assert sum(t.n_pairs for t in twins) == len(pairs)
    assert sum(t.sum_shared_fp for t in twins) == sum(r.shared_fp for r in pairs)
    assert sum(t.sum_fp_sizes for t in twins) == sum(r.n_a + r.n_b for r in pairs)


def test_cross_corpus_counts_match_hits(spark, sf_dir, specs):
    hits = _rows(specs, "dedup_cross_corpus_minhash_md5", spark, sf_dir)
    twins = _rows(specs, "dedup_cross_corpus_minhash_counts", spark, sf_dir)
    assert sum(t.n_hits for t in twins) == len(hits)
    by_probe = {}
    for r in hits:
        by_probe.setdefault(r.probe_key, []).append(r)
    assert {t.probe_key for t in twins} == set(by_probe)
    for t in twins:
        sel = by_probe[t.probe_key]
        assert t.pair_checksum == sum(
            (r.corpus_key * 1000003 + r.probe_key) % P for r in sel
        )


def test_dbscan_counts_match_assignment(spark, sf_dir, specs):
    assign = _rows(specs, "sim_dbscan_capped", spark, sf_dir)
    twins = _rows(specs, "sim_dbscan_capped_counts", spark, sf_dir)
    by_grain = {t.grain: t for t in twins}
    # role grain: counts + membership checksum
    for role in ("core", "border", "noise"):
        sel = [r for r in assign if r.role == role]
        t = by_grain.get(f"role:{role}")
        if not sel:
            assert t is None
            continue
        assert t.n_points == len(sel)
        assert t.n_groups == len({r.cluster_id for r in sel})
        assert t.checksum == sum(
            (r.vec_id * 1000003 + r.cluster_id + 2) % P for r in sel
        )
    # size grain: histogram of cluster sizes over clustered points
    sizes = {}
    for r in assign:
        if r.cluster_id != -1:
            sizes[r.cluster_id] = sizes.get(r.cluster_id, 0) + 1
    hist = {}
    for cid, sz in sizes.items():
        hist.setdefault(sz, []).append(cid)
    for sz, cids in hist.items():
        t = by_grain[f"size:{sz:09d}"]
        assert t.n_groups == len(cids) and t.n_points == sz * len(cids)
        assert t.checksum == sum((c + 2) % P for c in cids)
