"""Golden-value tests for blocked nearest-neighbor record linkage."""

from marketpipe_spark.operators.linkage import nearest_field_match


def _run(spark, rows, max_block=2000):
    df = spark.createDataFrame(rows, "id long, f string, blk string")
    return {
        r["id"]: (r["match_id"], r["dist"])
        for r in nearest_field_match(df, "id", "f", "blk", max_block).collect()
    }


def test_nearest_match_basic_and_tiebreak(spark):
    rows = [
        (1, "abcd", "x"),
        (2, "abce", "x"),  # dist 1 from both 1 and 3
        (3, "abcf", "x"),
        (10, "zzzz", "y"),
        (11, "zz", "y"),
    ]
    got = _run(spark, rows)
    assert got[1] == (2, 1)  # abce at dist 1 beats abcf at dist 2
    assert got[2] == (1, 1)  # tie dist 1 with id 3 -> lower match_id wins
    assert got[3] == (1, 1)  # tie dist 1 (abcd, abce) -> lower match_id wins
    assert got[10] == (11, 2) and got[11] == (10, 2)  # cross-block isolated pair


def test_nearest_match_singleton_block_has_no_row(spark):
    rows = [(1, "aaaa", "x"), (2, "bbbb", "y")]
    assert _run(spark, rows) == {}


def test_nearest_match_cap_restricts_candidates_deterministically(spark):
    # cap 2: only ids 1 and 2 are candidates; id 3 still gets a row (its
    # candidates are 1/2) but can never BE a candidate for others.
    rows = [(1, "aaaa", "x"), (2, "aaab", "x"), (3, "aaaa", "x")]
    got = _run(spark, rows, max_block=2)
    assert got[1] == (2, 1)  # id 3 (dist 0) not a candidate under the cap
    assert got[2] == (1, 1)
    assert got[3] == (1, 0)


def test_nearest_match_equals_naive_reference(spark):
    # Randomized equivalence proof of the two-phase plan (dist-0 equality
    # prefilter + probe-derived length band) against a brute-force Python
    # reference, with variable-length strings so the band prune is live and
    # injected duplicates so phase 0 is live.
    import random

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(17)
    rows = []
    for i in range(90):
        f = "".join(rng.choice("abc") for _ in range(rng.randint(2, 12)))
        rows.append((i, f, rng.choice(["x", "y", "z"])))
    for i in range(90, 110):  # duplicates of earlier rows, same block
        src = rows[rng.randrange(90)]
        rows.append((i, src[1], src[2]))
    cap = 60  # below the largest block so the candidate cap is live too
    expect = {}
    by_blk: dict = {}
    for rid, f, blk in rows:
        by_blk.setdefault(blk, []).append((rid, f))
    for blk, members in by_blk.items():
        cands = sorted(members)[:cap]
        for rid, f in members:
            best = None
            for cid, cf in cands:
                if cid == rid:
                    continue
                key = (lev(f, cf), cid)
                if best is None or key < best:
                    best = key
            if best is not None:
                expect[rid] = (best[1], best[0])
    assert _run(spark, rows, max_block=cap) == expect


def test_nearest_match_partition_invariance(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(6)), rng.choice(["x", "y"]))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, f string, blk string")
    a = sorted(
        (r["id"], r["match_id"], r["dist"])
        for r in nearest_field_match(df, "id", "f", "blk").collect()
    )
    b = sorted(
        (r["id"], r["match_id"], r["dist"])
        for r in nearest_field_match(
            df.repartition(13, "f"), "id", "f", "blk"
        ).collect()
    )
    assert a == b and len(a) == 120


def test_blocked_similarity_pairs_exact_neighborhood(spark):
    from marketpipe_spark.operators.linkage import blocked_similarity_pairs

    rows = [
        (1, "alpha", "X"),    # pairs with 2 (dist 1) and 3 (dist 2)
        (2, "alphb", "X"),
        (3, "alpXY", "X"),    # dist 2 from alpha... (alpha->alpXY: h->X, a->Y = 2)
        (4, "zzzzzzzzzz", "X"),  # length band prunes vs all (|Δlen| 5 > 2)
        (5, "alpha", "Y"),    # identical text, different block: never paired
        (6, "gamma", "Y"),
    ]
    df = spark.createDataFrame(rows, "id long, f string, blk string")
    got = sorted(
        tuple(r)
        for r in blocked_similarity_pairs(df, "id", "f", ["blk"], max_dist=2).collect()
    )
    # Brute-force reference within blocks.
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    want = sorted(
        (x[0], y[0])
        for x, y in itertools.combinations(rows, 2)
        if x[2] == y[2] and lev(x[1], y[1]) <= 2
    )
    assert got == want
    assert (1, 2) in got and (1, 5) not in got and all(4 not in p for p in got)


def test_blocked_similarity_pairs_block_cap_is_deterministic(spark):
    from marketpipe_spark.operators.linkage import blocked_similarity_pairs

    # Cap 2 keeps only ids 1 and 2 in the block; the (2, 3) pair vanishes.
    rows = [(1, "aaaa", "X"), (2, "aaab", "X"), (3, "aabb", "X")]
    df = spark.createDataFrame(rows, "id long, f string, blk string")
    got = sorted(
        tuple(r)
        for r in blocked_similarity_pairs(
            df, "id", "f", ["blk"], max_dist=2, max_block=2
        ).collect()
    )
    assert got == [(1, 2)]
