import numpy as np

from lexicmap_tpu.ops.chaining import (
    Anchors,
    ChainingOptions,
    chain,
    clear_substr_pairs,
    seed_weight,
    trim_substr_pairs,
)
from lexicmap_tpu.ops.chaining2 import Chaining2Options, chain2, chain3


def mk(pairs):
    qb = [p[0] for p in pairs]
    tb = [p[1] for p in pairs]
    ln = [p[2] for p in pairs]
    return Anchors(qb, tb, ln, np.zeros(len(pairs), bool), np.zeros(len(pairs), bool))


# options used by lexicmap search (ref: lib-index-search.go:702-708 with
# CLI defaults seed-max-gap 50, seed-max-dist 1000, -P 17)
SEARCH_OPTS = ChainingOptions(
    max_gap=50, min_score=float(seed_weight(17)), max_distance=1000, top_chains=0
)


def test_chain_single_colinear():
    a = mk([(50, 950, 31), (519, 1419, 31), (600, 1500, 31)]).sort_for_chaining()
    paths, score = chain(a, SEARCH_OPTS)
    assert len(paths) == 1
    assert paths[0].tolist() == [0, 1, 2]
    assert score > seed_weight(31)


def test_chain_two_clusters():
    a = mk(
        [
            (50, 950, 31),
            (100, 1000, 31),
            # cluster 2: far away in target (distance > max_dist)
            (60, 500000, 31),
            (110, 500050, 31),
        ]
    ).sort_for_chaining()
    paths, score = chain(a, SEARCH_OPTS)
    assert len(paths) == 2
    covered = sorted(i for p in paths for i in p.tolist())
    assert covered == [0, 1, 2, 3]


def test_chain_single_weak_anchor():
    # one anchor with Len < minSinglePrefix -> no chain, score < minScore
    a = mk([(10, 100, 15)])
    paths, score = chain(a, SEARCH_OPTS)
    assert paths == []
    assert score == seed_weight(15)
    a2 = mk([(10, 100, 17)])
    paths2, score2 = chain(a2, SEARCH_OPTS)
    assert len(paths2) == 1
    assert score2 == seed_weight(17)


def test_chain_reference_testcase_smoke():
    """Anchor set from ref lib-chaining_test.go:33-88 (log-only upstream);
    checks the dominant colinear cluster chains together."""
    pairs = [
        (552, 3798905, 17), (667, 3799019, 15), (1332, 3799686, 31),
        (1384, 628584, 31), (1490, 628690, 31), (1879, 900465, 31),
        (1879, 629079, 31), (1879, 627005, 31), (1910, 6123921, 23),
        (182, 1282695, 26), (182, 1769573, 26), (315, 1282830, 15),
        (315, 1769708, 15), (343, 1769724, 27), (10, 314159, 20),
        (60, 14234, 15), (61, 14235, 15), (60, 3395374, 15),
        (70, 3395384, 15), (50, 950, 31), (79, 3637976, 31),
        (100, 3637997, 31), (519, 1419, 31), (550, 3638447, 31),
        (647, 3638544, 31), (111, 1146311, 31), (136, 1146336, 31),
        (138, 1146338, 31), (139, 1146339, 31), (264, 1146464, 31),
        (1479, 1147679, 31), (1484, 1147684, 31), (1543, 1147743, 31),
        (1566, 1147766, 31), (1919, 1148119, 31),
    ]
    a = mk(pairs).sort_for_chaining()
    opts = ChainingOptions(max_gap=5000, min_score=40, max_distance=10000, top_chains=-1)
    paths, score = chain(a, opts)
    assert len(paths) >= 3
    # the big diagonal cluster (tbegin ~1146311-1148119) must be one chain
    big = None
    for p in paths:
        tbs = a.tbegin[p]
        if (tbs >= 1146000).all() and (tbs <= 1149000).all():
            if big is None or len(p) > len(big):
                big = p
    # 8 anchors: (136,...) and (138,...) are absorbed by the overlap-merge
    # scoring (higher telescoped weight straight from (111,...)), then
    # abandoned in backtrack — same behavior as the reference DP.
    assert big is not None and len(big) == 8
    # chains are strictly colinear in query
    for p in paths:
        if len(p) > 1:
            assert (np.diff(a.qbegin[p]) >= 0).all()


def test_clear_substr_pairs_nested():
    # anchor 1 nested in anchor 0; anchor 2 identical duplicate of 0
    a = mk([(10, 100, 31), (12, 102, 20), (10, 100, 31), (50, 140, 31)])
    out = clear_substr_pairs(a, 31)
    assert len(out) == 2
    assert out.qbegin.tolist() == [10, 50]


def test_clear_substr_pairs_keeps_shifted():
    a = mk([(10, 100, 31), (12, 202, 20), (50, 140, 31)])
    out = clear_substr_pairs(a, 31)
    assert len(out) == 3  # different target diagonal -> kept


def test_trim_substr_pairs_tandem_tail():
    # mirror of ref lib-seq_compare.go:534-552 case 1: repeated TBegin at tail
    pairs = [
        (156, 1163, 31), (157, 1164, 31), (158, 1165, 31), (168, 1168, 28),
        (175, 1168, 28), (182, 1168, 28), (189, 1168, 28), (196, 1168, 28),
        (203, 1168, 28), (210, 1168, 28), (217, 1168, 28),
    ]
    a = mk(pairs)
    out = trim_substr_pairs(a, 31, 100.0)
    # the repeated-TBegin tail run is trimmed to its first member
    assert len(out) < len(a)
    assert out.qbegin[-1] == 168


def test_chain2_colinear_dense():
    # dense colinear anchors: positions 0..49, len 31 each
    n = 50
    a = mk([(i, i + 1000, 31) for i in range(n)])
    opt = Chaining2Options()
    chains, matched, aligned_q, aligned_t, qB, qE, tB, tE = chain2(a, opt)
    assert chains is not None and len(chains) == 1
    c = chains[0]
    assert c.qbegin == 0 and c.qend == n - 1 + 30
    assert c.tbegin == 1000 and c.tend == 1000 + n - 1 + 30
    assert c.matched_bases == 31 + (n - 1)  # first anchor + 1 per step
    assert c.pident == 100.0
    assert matched == c.matched_bases


def test_chain2_two_regions():
    # two colinear clusters separated by a large indel (gap > max_gap)
    a1 = [(i, i + 1000, 31) for i in range(0, 40)]
    a2 = [(i, i + 3000, 31) for i in range(100, 140)]
    a = mk(a1 + a2)
    opt = Chaining2Options()
    chains, *_ = chain2(a, opt)
    assert chains is not None
    assert len(chains) == 2
    spans = sorted((c.tbegin, c.tend) for c in chains)
    assert spans[0][0] == 1000 and spans[1][0] == 3100


def test_chain2_single_anchor():
    a = mk([(5, 50, 31)])
    # len 31 >= min_score and >= min_align_len -> single-anchor chain
    chains, *_ = chain2(a, Chaining2Options(min_score=31, min_align_len=31))
    assert chains is not None and chains[0].matched_bases == 31
    # below threshold -> nothing
    chains2_, *_ = chain2(a, Chaining2Options(min_score=40, min_align_len=40))
    assert chains2_ is None


def test_chain3_simple():
    # 2-mer anchors along a diagonal
    a = mk([(0, 0, 2), (1, 1, 2), (2, 2, 2), (5, 5, 2)])
    res = chain3(a)
    assert res is not None
    qe, te = res
    # the distance penalty makes the isolated (5,5) anchor score lower than
    # the dense 0..2 run, so the best chain ends at (2,2)+len-1 = 3
    assert qe == 3 and te == 3
