"""URL canonicalization/dedup and event-transition matrix unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketpipe_spark.operators.sessions import event_transitions
from marketpipe_spark.operators.urls import canonical_url, url_dedup, url_host


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonical_url(F.col("url")).alias("c")).collect()[0]["c"]


def test_canonical_url_normalizes_every_axis(spark):
    # case, www, default port, trailing slash, fragment, utm params, sorting
    assert (
        _canon(spark, "HTTPS://WWW.Example.COM:443/a/b/?b=2&utm_source=x&a=1#frag")
        == "https://example.com/a/b?a=1&b=2"
    )
    # http default port; non-default port kept
    assert _canon(spark, "http://Example.com:80/x") == "http://example.com/x"
    assert _canon(spark, "http://example.com:8080/x") == "http://example.com:8080/x"
    # empty path becomes /; all-tracking query drops the '?'
    assert _canon(spark, "https://example.com?utm_a=1&gclid=z") == "https://example.com/"
    # path case is preserved (paths are case-sensitive), host case is not
    assert _canon(spark, "https://EXAMPLE.com/CaseSensitive") == "https://example.com/CaseSensitive"
    # fbclid stripped, surviving params sorted for order-independence
    assert (
        _canon(spark, "https://e.com/p?z=1&fbclid=abc&a=2")
        == _canon(spark, "https://e.com/p?a=2&z=1")
        == "https://e.com/p?a=2&z=1"
    )


def test_url_host_strips_port_and_www(spark):
    df = spark.createDataFrame([("https://WWW.News.Example.org:8443/x?y=1",)], "url string")
    assert df.select(url_host(F.col("url")).alias("h")).collect()[0]["h"] == "news.example.org"


def test_url_dedup_keeps_first_id_per_canonical(spark):
    rows = [
        (1, "https://example.com/a?utm_source=x"),
        (2, "HTTPS://WWW.EXAMPLE.COM:443/a/"),  # same canonical as 1
        (3, "https://example.com/b"),
        (4, "https://example.com/a#other"),  # same canonical as 1
    ]
    out = url_dedup(spark.createDataFrame(rows, "doc_id long, url string")).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["canonical_url"] == by_id[2]["canonical_url"] == by_id[4]["canonical_url"]
    assert [by_id[i]["keep"] for i in (1, 2, 3, 4)] == [True, False, True, False]
    assert by_id[2]["host"] == "example.com"


def test_event_transitions_matrix_exact(spark):
    # user 1: a->b->a ; user 2: a->b ; ties broken by event_id
    rows = [
        (1, 1, 100, "a"),
        (2, 1, 200, "b"),
        (3, 1, 300, "a"),
        (4, 2, 100, "a"),
        (5, 2, 100, "b"),  # same ts as event 4: event_id orders a before b
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    out = event_transitions(df, key="user_id", ts="ts", order_cols=["event_id"]).collect()
    m = {(r["from_type"], r["to_type"]): (r["n"], r["prob_ppm"]) for r in out}
    # transitions: u1 a->b, b->a ; u2 a->b  => a->b n=2 (p=1.0), b->a n=1 (p=1.0)
    assert m == {("a", "b"): (2, 1_000_000), ("b", "a"): (1, 1_000_000)}


def test_event_transitions_ppm_is_exact_integer_division(spark):
    rows = [(i, 1, i * 10, t) for i, t in enumerate("abaabac")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    out = event_transitions(df, key="user_id", ts="ts", order_cols=["event_id"]).collect()
    m = {(r["from_type"], r["to_type"]): (r["n"], r["prob_ppm"]) for r in out}
    # sequence a b a a b a c: from 'a': ->b x2, ->a x1, ->c x1 (total 4)
    assert m[("a", "b")] == (2, 500_000)
    assert m[("a", "a")] == (1, 250_000)
    assert m[("a", "c")] == (1, 250_000)
    # from 'b': ->a x2 (total 2)
    assert m[("b", "a")] == (2, 1_000_000)


def test_canonical_url_is_idempotent(spark):
    """canon(canon(u)) == canon(u): re-canonicalizing an already-canonical
    URL must be a no-op, so repeated pipeline passes can't churn keys."""
    urls = [
        "HTTPS://WWW.Example.COM:443/a/b/?b=2&utm_source=x&a=1#frag",
        "http://Example.com:80/",
        "http://example.com:8080/x?z=9&y=8",
        "https://e.com/p?fbclid=1",
        "https://WWW.e.com/Deep/Path/",
        "ftp://Files.Example.net:21/pub/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    from pyspark.sql import functions as F

    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(F.col("c").alias("a"), canonical_url(F.col("c")).alias("b"))
    assert twice.filter(F.col("a") != F.col("b")).count() == 0


def test_session_paths_counts_truncated_journeys(spark):
    from marketpipe_spark.operators.sessions import session_paths

    GAP = 100
    rows = [
        # user 1, session 1: a b c ; session 2 (after gap): d
        (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "c"), (4, 1, 500, "d"),
        # user 2, one session: a b c (same path as user 1's first)
        (5, 2, 10, "a"), (6, 2, 20, "b"), (7, 2, 30, "c"),
        # user 3, long session: 7 events, path truncated to first 5
        *[(8 + i, 3, 10 + i, t) for i, t in enumerate("abcdefg")],
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    out = {r["path"]: r["n_sessions"] for r in session_paths(
        df, key="user_id", ts="ts", gap=GAP, order_cols=["event_id"], max_steps=5
    ).collect()}
    assert out == {"a>b>c": 2, "d": 1, "a>b>c>d>e": 1}


def test_session_paths_partition_invariant(spark):
    from marketpipe_spark.operators.sessions import session_paths

    rows = [(i, i % 7, (i * 37) % 1000, "xyzw"[i % 4]) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    base = sorted(map(tuple, session_paths(df, ts="ts", gap=50, order_cols=["event_id"]).collect()))
    rep = sorted(map(tuple, session_paths(
        df.repartition(13, "event_id"), ts="ts", gap=50, order_cols=["event_id"]
    ).collect()))
    assert base == rep


def test_session_paths_mega_session_buffer_bounded(spark):
    """A single 20k-event session must produce the same truncated path as a
    small one — and the plan must filter to row_number <= max_steps BEFORE
    the collect_list, so the agg buffer holds <= max_steps structs per
    session no matter how long sessions get (the capped_basket_arrays
    buffer-bound class). Also exercises skew_span pass-through."""
    from marketpipe_spark.operators.sessions import session_paths

    rows = [(i, 1, 10 + i, "abcde"[min(i, 4)] if i < 5 else "z") for i in range(20_000)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    for span in (None, 1000):
        out = session_paths(
            df, key="user_id", ts="ts", gap=100, order_cols=["event_id"],
            max_steps=5, skew_span=span,
        ).collect()
        assert [(r["path"], r["n_sessions"]) for r in out] == [("a>b>c>d>e", 1)]
    # Plan proof: the row_number filter sits below the partial aggregate.
    plan = session_paths(
        df, key="user_id", ts="ts", gap=100, order_cols=["event_id"], max_steps=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "_rn" in plan and "row_number" in plan
