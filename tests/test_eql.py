"""EQL sequence semantics: ordering, window bound, head matching,
range predicates, guards."""

from __future__ import annotations

import datetime as dt

import pytest

from bigdatasearchpro_spark.operators.eql import eql_sequence


def T(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture()
def ev(spark):
    rows = [
        # user 1: login(0) -> download(5) -> logout(9): full chain
        (1, T(0), 1, "login", 1.0),
        (2, T(5), 1, "download", 1.0),
        (3, T(9), 1, "logout", 1.0),
        # user 2: login at 0, download at 20 (outside 10m window)
        (4, T(0), 2, "login", 1.0),
        (5, T(20), 2, "download", 1.0),
        # user 3: download BEFORE login: order matters
        (6, T(0), 3, "download", 1.0),
        (7, T(5), 3, "login", 1.0),
        # user 4: two downloads after login: head matching picks the
        # EARLIEST
        (8, T(0), 4, "login", 1.0),
        (9, T(2), 4, "download", 5.0),
        (10, T(4), 4, "download", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )


def test_two_step_window_and_order(ev):
    out = eql_sequence(
        ev, [{"event_type": "login"}, {"event_type": "download"}],
        by="user_id", within_seconds=600,
    ).collect()
    got = {(r.user_id): (r.id_1, r.id_2) for r in out}
    # user 2 misses the window; user 3 has the wrong order;
    # user 4 head-matches the earliest download (id 9)
    assert got == {1: (1, 2), 4: (8, 9)}


def test_three_step_total_span(ev):
    out = eql_sequence(
        ev,
        [{"event_type": "login"}, {"event_type": "download"},
         {"event_type": "logout"}],
        by="user_id", within_seconds=600,
    ).collect()
    assert [(r.user_id, r.id_1, r.id_2, r.id_3) for r in out] == [
        (1, 1, 2, 3)
    ]
    # total span bound: 9 minutes > 8-minute window -> no match
    none = eql_sequence(
        ev,
        [{"event_type": "login"}, {"event_type": "download"},
         {"event_type": "logout"}],
        by="user_id", within_seconds=480,
    ).collect()
    assert none == []


def test_range_predicate_step(ev):
    out = eql_sequence(
        ev,
        [{"event_type": "login"},
         {"event_type": "download", "value": {"gte": 2.0}}],
        by="user_id", within_seconds=600,
    ).collect()
    # only the value>=2 download qualifies (user 4's id 9)
    assert [(r.user_id, r.id_2) for r in out] == [(4, 9)]


def test_guards(ev):
    with pytest.raises(ValueError, match="at least 2"):
        eql_sequence(ev, [{"event_type": "login"}], by="user_id",
                     within_seconds=60)
    with pytest.raises(ValueError, match="positive"):
        eql_sequence(ev, [{"event_type": "a"}, {"event_type": "b"}],
                     by="user_id", within_seconds=0)
    with pytest.raises(ValueError, match="range op"):
        eql_sequence(ev, [{"event_type": "a"},
                          {"value": {"between": [1, 2]}}],
                     by="user_id", within_seconds=60)


def test_until_and_missing_event_steps(spark):
    """until kills chains with an expiry event inside the span;
    ![...] kills chains with a matching event inside its gap."""
    from bigdatasearchpro_spark.operators.eql import eql_sequence

    rows = [
        # user 1: clean a->b chain (matches)
        (1, 1, "a", 100), (2, 1, "b", 200),
        # user 2: a->b but an x in between (negation kills it)
        (3, 2, "a", 100), (4, 2, "x", 150), (5, 2, "b", 200),
        # user 3: a->b but an expiry u in between (until kills it)
        (6, 3, "a", 100), (7, 3, "u", 150), (8, 3, "b", 200),
        # user 4: expiry AFTER completion (survives — strict band)
        (9, 4, "a", 100), (10, 4, "b", 200), (11, 4, "u", 300),
    ]
    ev = spark.createDataFrame(
        [(i, u, t, __import__("datetime").datetime(2024, 1, 1, 0, 0, s))
         for i, u, t, s in [(r[0], r[1], r[2], r[3] // 10) for r in rows]],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    out = eql_sequence(
        ev,
        [{"event_type": "a"}, {"not": {"event_type": "x"}},
         {"event_type": "b"}],
        by="user_id", within_seconds=3600,
        until={"event_type": "u"},
    )
    assert [r["user_id"] for r in out.collect()] == [1, 4]


def test_until_missing_event_validation(spark):
    import pytest as pt

    from bigdatasearchpro_spark.operators.eql import eql_sequence

    ev = spark.createDataFrame(
        [], "event_id long, user_id long, event_type string, ts timestamp")
    with pt.raises(ValueError, match="leading"):
        eql_sequence(ev, [{"not": {"event_type": "x"}},
                          {"event_type": "a"}, {"event_type": "b"}],
                     by="user_id", within_seconds=10)
    with pt.raises(ValueError, match="trailing"):
        eql_sequence(ev, [{"event_type": "a"}, {"event_type": "b"},
                          {"not": {"event_type": "x"}}],
                     by="user_id", within_seconds=10)
    with pt.raises(ValueError, match="2 positive"):
        eql_sequence(ev, [{"event_type": "a"},
                          {"not": {"event_type": "x"}}],
                     by="user_id", within_seconds=10)


def test_eql_sequence_matches_python_replay(spark):
    """Differential test: eql_sequence (3 positive steps, one interior
    negation, until) equals a straightforward Python head-matching
    replay across a seeded randomized event set."""
    import datetime
    import random

    from bigdatasearchpro_spark.operators.eql import eql_sequence

    rng = random.Random(8815)
    rows = []
    for eid in range(400):
        rows.append((
            eid,
            rng.randrange(12),                      # user
            rng.choice(["a", "b", "c", "x", "u"]),  # type
            datetime.datetime(2024, 1, 1) + datetime.timedelta(
                seconds=rng.randrange(0, 7200)),
        ))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    within = 1800

    got = [
        (r["user_id"], r["id_1"], r["id_2"], r["id_3"])
        for r in eql_sequence(
            ev,
            [{"event_type": "a"}, {"not": {"event_type": "x"}},
             {"event_type": "b"}, {"event_type": "c"}],
            by="user_id", within_seconds=within,
            until={"event_type": "u"},
        ).collect()
    ]

    # python replay: head-match each a with earliest b after it (span
    # bound), then earliest c after that b (same bound), then kill
    # chains with an x strictly inside (t1,t2) or a u inside (t1,t3)
    by_user = {}
    for eid, uid, t, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid, t))
    expect = []
    for uid, evs in by_user.items():
        evs.sort()
        a_list = [(ts, eid) for ts, eid, t in evs if t == "a"]
        for ta, ia in a_list:
            bs = [(ts, eid) for ts, eid, t in evs if t == "b"
                  and ts > ta and (ts - ta).total_seconds() <= within]
            if not bs:
                continue
            tb, ib = min(bs)
            cs = [(ts, eid) for ts, eid, t in evs if t == "c"
                  and ts > tb and (ts - ta).total_seconds() <= within]
            if not cs:
                continue
            tc, ic = min(cs)
            if any(t == "x" and ta < ts < tb for ts, eid, t in evs):
                continue
            if any(t == "u" and ta < ts < tc for ts, eid, t in evs):
                continue
            expect.append((uid, ia, ib, ic))
    assert sorted(got) == sorted(expect)
    assert len(expect) > 0  # the fixture must actually exercise matches
