"""Gap-based sessionization: crafted-gap unit vectors (the sf-scale
oracle row `sessionize` pins the full DuckDB parity)."""

import datetime


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=m),
          u, "view", 1.25) for i, (u, m) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")


def test_sessionize_gap_splits(spark):
    from livre_spark.operators.sessions import session_stats, sessionize

    # u1: events at 0, 10, 50 min (gap 30 -> two sessions); u2: one event
    df = _events(spark, [(1, 0), (1, 10), (1, 50), (2, 5)])
    sess = {(r["user_id"], r["event_id"]): r["session_id"]
            for r in sessionize(df, gap_us=30 * 60 * 1_000_000).collect()}
    assert sess[(1, 0)] == 0 and sess[(1, 1)] == 0
    assert sess[(1, 2)] == 1          # 40-min gap opens session 1
    assert sess[(2, 3)] == 0

    stats = {(r["user_id"], r["session_id"]): r
             for r in session_stats(df).collect()}
    assert stats[(1, 0)]["n_events"] == 2
    assert stats[(1, 0)]["value_cents"] == 250
    assert stats[(1, 1)]["n_events"] == 1
    # exact microsecond span of session (1,0): 10 minutes
    assert stats[(1, 0)]["end_us"] - stats[(1, 0)]["start_us"] == 600_000_000


def test_sessionize_tie_break_deterministic(spark):
    from livre_spark.operators.sessions import sessionize

    # two events with IDENTICAL timestamps: event_id breaks the order
    df = _events(spark, [(7, 0), (7, 0)])
    got = sessionize(df).orderBy("event_id").collect()
    assert [r["session_id"] for r in got] == [0, 0]


def test_topk_cosine_many_crafted(spark):
    from livre_spark.functions.similarity import topk_cosine_many

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7]),
         (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])],
        "qid long, qv array<float>")
    got = {(r["qid"], r["rank"]): r["vec_id"]
           for r in topk_cosine_many(emb, q, k=2).collect()}
    assert got[(100, 1)] == 1      # exact match first
    assert got[(100, 2)] == 3      # 45-degree vector second
    assert got[(200, 1)] == 2
    assert got[(200, 2)] == 3
