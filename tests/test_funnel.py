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


def test_attribution_hand_computed(spark):
    """One user, two touches before one purchase: first credit to the
    earlier channel, last credit (and revenue) to the later one,
    linear split 50/50."""
    import datetime as dt

    from gpi_etl_spark.operators.funnel import attribute_conversions

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        (1, at(0), 7, "click", 0.0),
        (2, at(30), 7, "view", 0.0),
        (3, at(60), 7, "purchase", 100.0),
        (4, at(0), 8, "view", 0.0),      # other user, no purchase
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    got = {r.channel: r for r in attribute_conversions(df).collect()}
    assert got["click"].n_first == 1 and got["click"].n_last == 0
    assert got["view"].n_first == 0 and got["view"].n_last == 1
    assert got["click"].credit_linear == 0.5
    assert got["view"].credit_linear == 0.5
    assert got["view"].rev_last == 100.0
    assert got["click"].rev_last is None


def test_attribution_lookback_excludes_stale_touches(spark):
    import datetime as dt

    from gpi_etl_spark.operators.funnel import attribute_conversions

    t0 = dt.datetime(2024, 1, 10, 0, 0, 0)
    rows = [
        (1, t0 - dt.timedelta(hours=30), 7, "click", 0.0),  # too old
        (2, t0 - dt.timedelta(hours=1), 7, "view", 0.0),
        (3, t0, 7, "purchase", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    got = {r.channel: r for r in attribute_conversions(df).collect()}
    assert "click" not in got
    assert got["view"].n_first == 1 and got["view"].n_last == 1
    assert got["view"].credit_linear == 1.0


def test_attribution_unattributed_conversion_dropped(spark):
    import datetime as dt

    from gpi_etl_spark.operators.funnel import attribute_conversions

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7, "purchase", 10.0)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    assert attribute_conversions(df).collect() == []
