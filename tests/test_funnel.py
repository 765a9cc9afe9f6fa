"""Funnel + retention (operators/funnel.py) on hand-built event logs."""

from datetime import datetime

from gpi_etl_spark.operators.funnel import funnel_steps, retention_cohorts


def ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1 completes all three in order
        (1, ts(1, 0), "view"), (1, ts(1, 2), "click"), (1, ts(1, 5), "purchase"),
        # user 2 clicks BEFORE viewing: click doesn't count, stops at 1
        (2, ts(2, 5), "view"), (2, ts(2, 1), "click"),
        # user 3 views and clicks, never purchases
        (3, ts(3, 0), "view"), (3, ts(3, 1), "click"),
        # user 4 never views: absent from the funnel
        (4, ts(4, 0), "purchase"),
    ]
    out = {
        r.user_id: r
        for r in funnel_steps(
            ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].reached == 3 and out[1].t3 == ts(1, 5)
    assert out[2].reached == 1 and out[2].t2 is None
    assert out[3].reached == 2


def test_funnel_conversion_window(spark):
    rows = [
        # click inside 72h, purchase outside -> reached 2
        (1, ts(1, 0), "view"), (1, ts(2, 0), "click"), (1, ts(5, 0), "purchase"),
        # everything inside the window
        (2, ts(1, 0), "view"), (2, ts(1, 1), "click"), (2, ts(3, 23), "purchase"),
    ]
    out = {
        r.user_id: r
        for r in funnel_steps(
            ev(spark, rows), ["view", "click", "purchase"], within_hours=72
        ).collect()
    }
    assert out[1].reached == 2 and out[1].t3 is None
    assert out[2].reached == 3


def test_funnel_uses_first_qualifying_occurrence(spark):
    rows = [
        (1, ts(1, 5), "view"), (1, ts(1, 3), "view"),   # first view: 3:00
        (1, ts(1, 2), "click"),                          # before t1: skip
        (1, ts(1, 4), "click"), (1, ts(1, 6), "click"),  # first after t1
    ]
    out = funnel_steps(ev(spark, rows), ["view", "click"]).collect()[0]
    assert out.t1 == ts(1, 3) and out.t2 == ts(1, 4) and out.reached == 2


def test_retention_cohorts_hand_computed(spark):
    rows = [
        # user 1 first active Mon-week of Jan 1, again week of Jan 8
        (1, ts(2), "view"), (1, ts(9), "click"),
        # user 2 same cohort, only week 0 (two events, one active week)
        (2, ts(3), "view"), (2, ts(4), "view"),
        # user 3 cohort of Jan 8, active weeks 0 and 2
        (3, ts(10), "view"), (3, ts(23), "view"),
    ]
    out = {
        (r.cohort, r.week_offset): r.n_users
        for r in retention_cohorts(ev(spark, rows)).collect()
    }
    w1, w2 = datetime(2024, 1, 1), datetime(2024, 1, 8)
    assert out == {
        (w1, 0): 2,
        (w1, 1): 1,
        (w2, 0): 1,
        (w2, 2): 1,
    }


def test_event_transitions_hand_computed(spark):
    from gpi_etl_spark.operators.funnel import event_transitions

    rows = [
        # user 1 path: view -> click -> view (ids give order)
        (1, ts(1, 1), "view", 10), (1, ts(1, 2), "click", 11),
        (1, ts(1, 3), "view", 12),
        # user 2: view -> view; simultaneous pair ordered by event_id
        (2, ts(2, 1), "view", 20), (2, ts(2, 1), "view", 21),
        # user 3: single event, no transition
        (3, ts(3, 1), "click", 30),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.p_r)
        for r in event_transitions(df).collect()
    }
    # user1 contributes view->click, click->view; user2 view->view
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }
