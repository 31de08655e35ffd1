"""Bradley-Terry operator: pure-Python integer-replica parity + edge cases."""

from __future__ import annotations

from marketpipe_spark.operators.ranking import bradley_terry

SCALE = 1_000_000


def _bt_reference(matches: list[tuple[str, str]], iterations: int) -> dict:
    """Literal integer replica of the documented recurrence."""
    wab: dict[tuple[str, str], int] = {}
    for w, l in matches:
        wab[(w, l)] = wab.get((w, l), 0) + 1
    n: dict[tuple[str, str], int] = {}
    for (a, b), c in wab.items():
        n[(a, b)] = n.get((a, b), 0) + c
        n[(b, a)] = n.get((b, a), 0) + c
    players = sorted({p for pair in n for p in pair})
    wins = {p: 0 for p in players}
    for (w, _), c in wab.items():
        wins[w] += c
    games = {p: sum(c for (a, _), c in n.items() if a == p) for p in players}
    sq = SCALE * SCALE
    s = {p: SCALE for p in players}
    for _ in range(iterations):
        d = {p: 0 for p in players}
        for (a, b), c in n.items():
            d[a] += c * sq // (s[a] + s[b])
        u = {p: max(1, wins[p] * sq // d[p]) for p in players}
        tot = sum(u.values())
        s = {p: max(1, u[p] * len(players) * SCALE // tot) for p in players}
    return {
        p: (games[p], wins[p], s[p]) for p in players
    }


def test_bradley_terry_matches_reference(spark):
    # A beats B twice, B beats C twice, A beats C once, C beats A once,
    # and D loses every game (zero-win floor must engage).
    matches = [
        ("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
        ("A", "C"), ("C", "A"),
        ("A", "D"), ("B", "D"), ("C", "D"),
    ]
    df = spark.createDataFrame(matches, "winner string, loser string")
    got = {
        r["player"]: (r["games"], r["wins"], r["strength_micro"])
        for r in bradley_terry(df, iterations=4).collect()
    }
    assert got == _bt_reference(matches, 4)
    # The ordering must be sane: A (most wins) above D (no wins, floored >= 1).
    assert got["A"][2] > got["D"][2] >= 1


def test_bradley_terry_two_players(spark):
    matches = [("X", "Y")] * 3 + [("Y", "X")]
    df = spark.createDataFrame(matches, "winner string, loser string")
    got = {
        r["player"]: (r["games"], r["wins"], r["strength_micro"])
        for r in bradley_terry(df, iterations=3).collect()
    }
    assert got == _bt_reference(matches, 3)
    assert got["X"][0] == got["Y"][0] == 4
    assert got["X"][2] > got["Y"][2]


def test_bradley_terry_renorm_bound_enforced(spark):
    import pytest

    from marketpipe_spark.operators.ranking import bradley_terry

    m = spark.createDataFrame([("a", "b"), ("b", "c")], "winner string, loser string")
    with pytest.raises(ValueError, match="overflow"):
        bradley_terry(m, iterations=1, scale=2_000_000_000)
