"""Unit tests of the WAND kernel (_wand_shard) as a pure function:
randomized rank-identity vs brute force, and PRUNING EVIDENCE — the
block-max metadata must actually skip block decodes, not just exist."""

import math
import random

import numpy as np
import pytest

import bliss_rs_spark.operators.wand as wand_mod
from bliss_rs_spark.config import IndexConfig
from bliss_rs_spark.operators.pack import _pack_rows
from bliss_rs_spark.operators.wand import _wand_shard

K1, B, AVGDL = 1.2, 0.75, 40.0


def _mk_blocks(doc_ids, tfs, dls, block_size=8):
    cfg = IndexConfig(k1=K1, b=B, block_size=block_size)
    return _pack_rows(
        np.array(doc_ids, dtype=np.int64),
        np.array(tfs, dtype=np.uint64),
        np.array(dls, dtype=np.uint64),
        cfg,
        AVGDL,
    )


def _brute_force(term_postings, idfs, k):
    scores = {}
    for (term, plist), idf in zip(term_postings.items(), idfs):
        for doc, tf, dl in plist:
            tsc = tf * (K1 + 1.0) / (tf + K1 * ((1 - B) + B * dl / AVGDL))
            scores[doc] = scores.get(doc, 0.0) + idf * tsc
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def _run(term_postings, idfs, k, block_size=8):
    rows = [
        (_mk_blocks([d for d, _, _ in pl], [t for _, t, _ in pl], [l for _, _, l in pl], block_size), idf)
        for pl, idf in zip(term_postings.values(), idfs)
    ]
    return _wand_shard(rows, k, K1, B, AVGDL)


@pytest.mark.parametrize("seed", range(12))
def test_randomized_rank_identity(seed):
    rng = random.Random(seed)
    n_terms = rng.randint(1, 5)
    universe = list(range(-1000, 1000))
    postings = {}
    for t in range(n_terms):
        docs = sorted(rng.sample(universe, rng.randint(1, 400)))
        postings[f"t{t}"] = [(d, rng.randint(1, 9), rng.randint(5, 200)) for d in docs]
    idfs = [rng.uniform(0.1, 5.0) for _ in range(n_terms)]
    k = rng.choice([1, 3, 10, 50])

    got = _run(postings, idfs, k)
    exp = _brute_force(postings, idfs, k)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert math.isclose(gs, es, rel_tol=1e-12), (gd, gs, es)


def test_tie_break_on_doc_id():
    # identical postings -> identical scores; ranks must order by doc_id asc
    pl = [(d, 3, 40) for d in range(-5, 6)]
    got = _run({"t": pl}, [1.0], 5)
    assert [d for d, _ in got] == [-5, -4, -3, -2, -1]
    assert len({s for _, s in got}) == 1


def test_block_max_actually_prunes(monkeypatch):
    """A rare high-idf term + a long common low-value term: WAND must decode
    only a fraction of the common term's blocks."""
    decode_calls = {"n": 0}
    orig = wand_mod._Cursor._load

    def counting_load(self, bi):
        decode_calls["n"] += 1
        return orig(self, bi)

    monkeypatch.setattr(wand_mod._Cursor, "_load", counting_load)

    common = [(d, 1, 200) for d in range(0, 20000, 2)]      # 10k postings, low tsc
    rare = [(d, 9, 10) for d in range(0, 20000, 1999)]      # 11 postings, high tsc
    postings = {"common": common, "rare": rare}
    idfs = [0.05, 6.0]  # common barely matters; rare dominates

    got = _run(postings, idfs, 5, block_size=64)
    exp = _brute_force(postings, idfs, 5)
    assert [d for d, _ in got] == [d for d, _ in exp]

    total_blocks = math.ceil(len(common) / 64) + math.ceil(len(rare) / 64)
    assert decode_calls["n"] < 0.5 * total_blocks, (
        f"decoded {decode_calls['n']} of {total_blocks} blocks — no pruning"
    )


def test_exhausted_and_empty_edges():
    assert _run({"t": [(1, 1, 10)]}, [1.0], 10) == _brute_force({"t": [(1, 1, 10)]}, [1.0], 10)
    # k larger than candidates
    pl = [(d, 2, 30) for d in [3, 9, 27]]
    got = _run({"t": pl}, [2.0], 100)
    assert len(got) == 3


@pytest.mark.parametrize("seed", range(12))
def test_randomized_rank_identity_with_dead_docs(seed):
    """Segment-mode kernel contract: the dead filter (tombstoned docs dropped
    at block decode) must yield exactly brute-force-over-survivors — across
    random deletion patterns, including whole dead blocks, dead block tails
    (stale last_doc bounds), and dead pivots mid-seek."""
    rng = random.Random(1000 + seed)
    n_terms = rng.randint(1, 5)
    universe = list(range(-1000, 1000))
    postings = {}
    for t in range(n_terms):
        docs = sorted(rng.sample(universe, rng.randint(1, 400)))
        postings[f"t{t}"] = [(d, rng.randint(1, 9), rng.randint(5, 200)) for d in docs]
    idfs = [rng.uniform(0.1, 5.0) for _ in range(n_terms)]
    k = rng.choice([1, 3, 10, 50])

    all_docs = sorted({d for pl in postings.values() for d, _, _ in pl})
    frac = rng.choice([0.05, 0.3, 0.7, 0.95])
    dead = sorted(rng.sample(all_docs, int(len(all_docs) * frac)))
    dead_arr = np.array(dead, dtype=np.int64)
    dead_set = set(dead)

    alive_postings = {
        t: [(d, tf, dl) for d, tf, dl in pl if d not in dead_set]
        for t, pl in postings.items()
    }
    exp = _brute_force(alive_postings, idfs, k)

    rows = [
        (_mk_blocks([d for d, _, _ in pl], [t for _, t, _ in pl],
                    [l for _, _, l in pl], block_size=8), idf)
        for pl, idf in zip(postings.values(), idfs)
    ]
    got = _wand_shard(rows, k, K1, B, AVGDL, dead=dead_arr)
    assert [d for d, _ in got] == [d for d, _ in exp], (seed, frac)
    for (_, gs), (_, es) in zip(got, exp):
        assert math.isclose(gs, es, rel_tol=1e-12)


def test_all_docs_dead_returns_empty():
    pl = [(d, 1, 40) for d in range(100)]
    rows = [(_mk_blocks([d for d, _, _ in pl], [1] * 100, [40] * 100), 1.0)]
    dead = np.arange(100, dtype=np.int64)
    assert _wand_shard(rows, 10, K1, B, AVGDL, dead=dead) == []
    # multi-term variant exercises the cursor path
    rows2 = rows + [(_mk_blocks([5, 50, 95], [2, 2, 2], [40, 40, 40]), 2.0)]
    assert _wand_shard(rows2, 10, K1, B, AVGDL, dead=dead) == []


@pytest.mark.parametrize("seed", range(8))
def test_dense_path_identical_to_wand_and_brute(seed, monkeypatch):
    """The vectorized dense path (hot-term queries) must be bitwise-identical
    to both the WAND loop and brute force — scores included (same
    float-addition order by construction)."""
    rng = random.Random(2000 + seed)
    n_terms = rng.randint(2, 5)
    universe = list(range(-1000, 1000))
    postings = {}
    for t in range(n_terms):
        docs = sorted(rng.sample(universe, rng.randint(50, 600)))
        postings[f"t{t}"] = [(d, rng.randint(1, 9), rng.randint(5, 200)) for d in docs]
    idfs = [rng.uniform(0.1, 5.0) for _ in range(n_terms)]
    k = rng.choice([1, 10, 50])
    dead = None
    if seed % 2:
        all_docs = sorted({d for pl in postings.values() for d, _, _ in pl})
        dead = np.array(sorted(rng.sample(all_docs, len(all_docs) // 4)), dtype=np.int64)

    rows = [
        (_mk_blocks([d for d, _, _ in pl], [t for _, t, _ in pl],
                    [l for _, _, l in pl], block_size=8), idf)
        for pl, idf in zip(postings.values(), idfs)
    ]
    monkeypatch.setattr(wand_mod, "DENSE_TOTAL_POSTINGS", 1)
    dense = _wand_shard(rows, k, K1, B, AVGDL, dead=dead)
    monkeypatch.setattr(wand_mod, "DENSE_TOTAL_POSTINGS", 1 << 60)
    wand = _wand_shard(rows, k, K1, B, AVGDL, dead=dead)
    assert [d for d, _ in dense] == [d for d, _ in wand]
    assert [s for _, s in dense] == [s for _, s in wand]  # bitwise
