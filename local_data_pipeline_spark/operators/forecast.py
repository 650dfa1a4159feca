"""Additive Holt-Winters forecasting (level + trend + seasonal).

The recurrence is SEQUENTIAL by nature, so the operator confines it to
per-series pandas groups (`applyInPandas`): the data-proportional work is
the upstream day-grain aggregate; each series' loop runs over a
CALENDAR-BOUNDED observation vector (~365 rows/year regardless of input
volume). Parallelism = #series, per-task state = one series — the same
shard-local-sequentiality design as ``packing.bin_pack_nfd``.

Cross-engine determinism: every float operation below is mirrored
operation-for-operation by the DuckDB recursive-CTE oracles in
``queries.py`` (`holt_winters_daily_forecast`, `holt_winters_by_type`).
Identical inputs (exact-decimal daily sums) through identical IEEE
operation order give bit-identical doubles — the compared outputs carry
NO rounding. Any edit here must keep the SQL twin in lockstep.
"""

from __future__ import annotations

SEASON = 7
HORIZON = 7
#: smoothing constants and their complements as independent literals —
#: (1 - 0.3) computed at runtime is not guaranteed to equal the 0.7
#: literal in both engines, so both sides spell out all six.
ALPHA, ONE_M_ALPHA = 0.3, 0.7
BETA, ONE_M_BETA = 0.1, 0.9
GAMMA, ONE_M_GAMMA = 0.2, 0.8


def hw_additive(days: list, ys: list[float]) -> list[tuple]:
    """Run the additive Holt-Winters recurrence over one series.

    Returns rows (day, h, actual, yhat): one-step-ahead fitted values
    (h=0) for observations past the two-week initialization window, then
    ``HORIZON`` forecast rows (h=1..7, actual None) dated after the last
    observation. Series shorter than 2*SEASON+1 observations yield no
    rows (not enough data to initialize level/trend/seasonals).

    Initialization: level = week-1 mean, trend = (week-2 mean − week-1
    mean)/7, seasonals = week-1 residuals; seasonality is
    observation-indexed (densify calendar gaps upstream if alignment
    matters)."""
    import datetime

    if len(ys) < 2 * SEASON + 1:
        return []
    week1 = ((((((ys[0] + ys[1]) + ys[2]) + ys[3]) + ys[4]) + ys[5]) + ys[6])
    week2 = ((((((ys[7] + ys[8]) + ys[9]) + ys[10]) + ys[11]) + ys[12]) + ys[13])
    l = week1 / 7.0
    b = (week2 / 7.0 - week1 / 7.0) / 7.0
    q = [ys[j] - week1 / 7.0 for j in range(SEASON)]
    out: list[tuple] = []
    for t in range(SEASON, len(ys)):
        y = ys[t]
        s_old = q.pop(0)
        fitted = (l + b) + s_old
        l_new = ALPHA * (y - s_old) + ONE_M_ALPHA * (l + b)
        b_new = BETA * (l_new - l) + ONE_M_BETA * b
        s_new = GAMMA * (y - l_new) + ONE_M_GAMMA * s_old
        q.append(s_new)
        l, b = l_new, b_new
        out.append((days[t], 0, y, fitted))
    last = days[-1]
    for h in range(1, HORIZON + 1):
        out.append((last + datetime.timedelta(days=h), h, None, (l + h * b) + q[h - 1]))
    return out
