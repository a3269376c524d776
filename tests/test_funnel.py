import datetime as dt


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _us(s):
    return int(dt.datetime(2024, 1, 1, 0, 0, s)
               .replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_funnel_reach_semantics(spark):
    from logunifier_spark.operators.funnel import funnel_reach
    rows = [
        # u1 completes in order
        (1, "signup", _ts(0)), (1, "view", _ts(10)), (1, "purchase", _ts(20)),
        # u2: purchase BEFORE view -> stalls at signup+view? view at 30,
        # purchase at 25 < 30 -> steps_completed 2
        (2, "signup", _ts(5)), (2, "purchase", _ts(25)), (2, "view", _ts(30)),
        # u3: view only, never signed up -> absent from the result
        (3, "view", _ts(1)),
        # u4: signup and view at the SAME instant -> strict > rejects
        (4, "signup", _ts(7)), (4, "view", _ts(7)),
        # u5: multiple candidates -> earliest valid each step
        (5, "signup", _ts(2)), (5, "signup", _ts(1)),
        (5, "view", _ts(3)), (5, "view", _ts(4)),
        (5, "purchase", _ts(3)),  # not after view(3) -> strict >
        (5, "purchase", _ts(9)),
    ]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, ts timestamp")
    out = {r["user"]: r for r in
           funnel_reach(df, ["signup", "view", "purchase"]).collect()}
    assert set(out) == {1, 2, 4, 5}
    assert out[1]["steps_completed"] == 3
    assert (out[1]["t1_us"], out[1]["t2_us"], out[1]["t3_us"]) == \
        (_us(0), _us(10), _us(20))
    assert out[2]["steps_completed"] == 2 and out[2]["t3_us"] is None
    assert out[4]["steps_completed"] == 1 and out[4]["t2_us"] is None
    assert out[5]["steps_completed"] == 3
    assert (out[5]["t1_us"], out[5]["t2_us"], out[5]["t3_us"]) == \
        (_us(1), _us(3), _us(9))


def test_funnel_counts_monotone(spark):
    from logunifier_spark.operators.funnel import funnel_counts
    rows = [(u, t, _ts(i)) for i, (u, t) in enumerate(
        [(1, "a"), (1, "b"), (1, "c"),
         (2, "a"), (2, "b"),
         (3, "a"), (4, "b")])]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, ts timestamp")
    out = {r["step"]: r for r in funnel_counts(df, ["a", "b", "c"]).collect()}
    assert [out[i]["users"] for i in (1, 2, 3)] == [3, 2, 1]
    assert out[2]["event_type"] == "b"


def test_cohort_retention_matrix(spark):
    from logunifier_spark.operators.funnel import cohort_retention
    day = 24 * 3600
    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1 first on day 0, active days 0, 1, 3 (two events day 1)
        (1, base), (1, base + dt.timedelta(days=1)),
        (1, base + dt.timedelta(days=1, hours=5)),
        (1, base + dt.timedelta(days=3)),
        # u2 first on day 1, active days 1, 3
        (2, base + dt.timedelta(days=1)), (2, base + dt.timedelta(days=3)),
        # u3 only day 0
        (3, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(df, bucket_s=day).collect()
    d0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    got = {(r["cohort_us"], r["week_offset"]): r["n_users"] for r in out}
    day_us = day * 1_000_000
    assert got == {
        (d0, 0): 2,                 # u1, u3 day-0 cohort
        (d0, 1): 1, (d0, 3): 1,     # u1 returns days 1 and 3
        (d0 + day_us, 0): 1,        # u2 day-1 cohort
        (d0 + day_us, 2): 1,        # u2 returns day 3 (offset 2)
    }
