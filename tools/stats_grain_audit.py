#!/usr/bin/env python
"""Stats-family sample-size audit (r11 VERDICT ask #8): the mirror's
VACUOUS gate catches 0-rows-both-sides; it cannot catch a statistic
computed over n=7 points that is formally green but statistically
meaningless. For every registered query tagged ``stats`` (plus the
named timeseries test lanes), run at sf0.001 and report:

- ``rows``  — result row count (the mirror's unit);
- ``min_n`` — the smallest value in any sample-size-shaped column
  (``n``, ``n_obs``, ``nobs``, ``n_*``, ``*_n``, ``count*``) — the
  statistic's actual evidence base.

Queries whose min_n at sf0.001 falls under 30 (the classic
small-sample floor) are flagged; the fix is the m11_ljung_box
precedent — move the lane to the shared hourly grain so every SF
feeds the tests enough observations. Prints one JSON line per query
then a summary line.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commodity_price_forecasting_spark.plans.registry import load_all  # noqa: E402
from commodity_price_forecasting_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: sample-size-shaped column names
N_COL = re.compile(r"^(n|nobs|n_[a-z0-9_]+|[a-z0-9_]+_n|count[a-z0-9_]*)$")

#: columns that LOOK like sample sizes but are count-valued
#: STATISTICS or diagnostic denominators — small values are the
#: measurement, not an evidence-starved test (reviewed r12; each entry
#: carries its justification so the exemption is auditable):
NOT_SAMPLE_SIZE = {
    "w19_var_es": {"n_viol": "violation COUNT — ~5% of n by design"},
    "m7_conformal_interval": {
        "n_eval": "coverage diagnostic's denominator; the estimated "
        "quantity is the quantile, calibrated on n_cal >= 30"
    },
    "behavior_event_pmi": {
        "n_users_both": "co-occurrence count — the PMI numerator"
    },
    "behavior_markov_transitions": {
        "n": "per-(from,to) transition count — the estimated numerator"
    },
    "m14_isotonic_calibration": {
        "n": "per-pooled-bin count — pooling small bins is what "
        "isotonic regression DOES"
    },
    "m7_calibration_bins": {"n": "per-bin count — the histogram value"},
    "ml_woe_iv": {
        "n_good": "per-category outcome count — the WOE numerator",
        "n_bad": "per-category outcome count — the WOE numerator",
    },
    "stat_kaplan_meier": {
        "n_events": "per-interval event count — the KM increment",
        "n_at_risk": "risk-set size at the LAST interval — shrinks to "
        "1 by construction",
    },
    "stat_mutual_info": {
        "n_cells": "contingency-table CELL count (grid size), not n"
    },
    "stat_gini_value": {
        "n_users": "the complete population at this SF — the Gini of "
        "a full population is exact, not a sample estimate"
    },
}

#: timeseries statistical-test lanes outside the "stats" tag
EXTRA = (
    "ts_acf",
    "ts_pacf",
    "ts_rescaled_range",
    "m11_df_test",
    "m11_kpss_level",
    "m11_ljung_box",
    "m5_ar_forecast",
    "m5_sarima_forecast",
)


def main() -> None:
    spark = get_spark(
        app_name="stats-grain-audit", master="local[8]", shuffle_partitions=8
    )
    registry = load_all()
    missing = [n for n in EXTRA if n not in registry]
    if missing:  # a typo'd EXTRA entry would be silently unaudited
        raise SystemExit(f"stats_grain_audit: unknown EXTRA lanes {missing}")
    names = sorted(
        name
        for name, spec in registry.items()
        if "stats" in spec.tags or name in EXTRA
    )
    flagged = []
    for name in names:
        try:
            rows = registry[name].fn(spark, SF_DIR).collect()
        except Exception as exc:  # report, don't stop the audit
            print(json.dumps({"query": name, "error": str(exc)[:120]}))
            flagged.append(name)
            continue
        exempt = NOT_SAMPLE_SIZE.get(name, {})
        n_cols = [
            c
            for c in (rows[0].asDict() if rows else {})
            if N_COL.match(c) and c not in exempt
        ]
        min_n = None
        for c in n_cols:
            vals = [r[c] for r in rows if r[c] is not None]
            if vals and isinstance(vals[0], (int, float)):
                m = min(vals)
                min_n = m if min_n is None else min(min_n, m)
        rec = {
            "query": name,
            "rows": len(rows),
            "n_cols": n_cols,
            "min_n": min_n,
        }
        if exempt:
            rec["exempt_cols"] = sorted(exempt)
        if len(rows) == 0 or (min_n is not None and min_n < 30):
            rec["flag"] = "UNDER_FLOOR"
            flagged.append(name)
        print(json.dumps(rec))
    print(
        json.dumps(
            {"audited": len(names), "flagged": flagged, "sf_dir": SF_DIR}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
