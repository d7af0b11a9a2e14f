"""Relational events ops added in round 4 session 6."""

import pandas as pd


def test_events_trend_exact_slope(ray_session):
    """Planted trend: type 'up' grows one event per day (slope 1),
    'flat' stays constant (slope 0); exact integer normal equations,
    truncating micro division."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        events_trend)

    rows = []
    base = pd.Timestamp("1997-01-01")
    eid = 0
    for d in range(10):
        for _ in range(d + 1):
            rows.append({"event_id": eid, "ts": base + pd.Timedelta(days=d),
                         "event_type": "up"}); eid += 1
        for _ in range(3):
            rows.append({"event_id": eid, "ts": base + pd.Timedelta(days=d),
                         "event_type": "flat"}); eid += 1
    ev = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    out = events_trend(ev).set_index("event_type")
    assert out.loc["up", "slope_micro"] == 1_000_000
    assert out.loc["flat", "slope_micro"] == 0
    assert (out["n_days"] == 10).all()
    # slope as the exact rational: num/den == 1 for 'up'
    assert out.loc["up", "slope_num"] == out.loc["up", "slope_den"]
