"""Unit tests for bench.py's scaling-pair selection policy.

The policy is measurement-layer, not engine, but it decides the archived
north-rule number (BENCH_r{N}.json -> scaling_n_to_4n), so a regression
here silently changes what the round claims. No Spark needed.

Reference idiom: repeated timed runs with contended samples discarded,
``ThroughputBenchmark.java:56-61``.
"""

import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    # guard: importing bench must not run main()
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _pair(eff, inflation, clean=True, calm=None):
    band = 1.2
    if calm is None:
        calm = clean and (1.0 / band <= inflation <= band)
    return {
        "build_eff": eff,
        "query_eff": eff,
        "build_eff_per_busy_core": eff,
        "busy_inflation": inflation,
        "hi_core_utilization": round(eff * inflation, 3),
        "clean": clean,
        "calm": calm,
    }


def test_calm_pairs_preferred(benchmod):
    # the archived round-5 run: one storm pair (inflation 1.78), one
    # lo-taxed pair (0.873), one moderate pair (1.243) — all steal-clean.
    rows = [_pair(0.493, 1.782), _pair(1.045, 0.873), _pair(0.736, 1.243)]
    used, sel = benchmod._select_pairs(rows)
    # only the 0.873 pair is calm -> <2 calm -> storm-excluded tier drops
    # the 1.782 pair (outside the 1.35 storm band) and keeps the other two
    assert sel == "storm_excluded"
    assert sorted(p["busy_inflation"] for p in used) == [0.873, 1.243]

    # add one genuinely calm pair: now two calm pairs carry the median
    rows.append(_pair(0.877, 1.03))
    used, sel = benchmod._select_pairs(rows)
    assert sel == "calm"
    assert sorted(p["build_eff"] for p in used) == [0.877, 1.045]


def test_calm_band_is_symmetric(benchmod):
    # inflation below 1/band (lo leg taxed, eff overstated) must NOT
    # count as calm even though the eff looks great
    rows = [_pair(1.30, 0.70), _pair(0.90, 1.01), _pair(0.88, 0.99)]
    used, sel = benchmod._select_pairs(rows)
    assert sel == "calm"
    assert all(1 / 1.2 <= p["busy_inflation"] <= 1.2 for p in used)
    assert benchmod._median_low(
        sorted(p["build_eff"] for p in used)) == 0.88


def test_fallback_chain(benchmod):
    # no calm, no clean -> all pairs, labeled contended
    rows = [_pair(0.5, 2.0, clean=False), _pair(0.6, 1.9, clean=False)]
    used, sel = benchmod._select_pairs(rows)
    assert sel == "all_contended"
    assert len(used) == 2
    # one clean (storm-inflated) -> steal_clean (storm tier needs >=2
    # in-band pairs and this one sits outside the band anyway)
    rows.append(_pair(0.63, 1.40, clean=True))
    used, sel = benchmod._select_pairs(rows)
    assert sel == "steal_clean"
    assert [p["build_eff"] for p in used] == [0.63]


def test_storm_excluded_tier(benchmod):
    # the round-5 full-default archive: 5 steal-clean pairs, inflations
    # [1.436, 0.928, 2.054, 1.261, 1.231], 1 calm. Old chain -> steal_clean
    # median 0.675 with two storm pairs inside it; the storm tier keeps the
    # three in-band pairs and medians those.
    rows = [
        _pair(0.603, 1.436), _pair(0.988, 0.928), _pair(0.406, 2.054),
        _pair(0.725, 1.261), _pair(0.675, 1.231),
    ]
    used, sel = benchmod._select_pairs(rows)
    assert sel == "storm_excluded"
    effs = sorted(p["build_eff"] for p in used)
    assert effs == [0.675, 0.725, 0.988]
    assert benchmod._median_low(effs) == 0.725
    # symmetric: a lo-taxed pair below 1/1.35 is excluded too
    rows2 = [_pair(1.30, 0.70), _pair(0.70, 1.30), _pair(0.72, 1.28)]
    used2, sel2 = benchmod._select_pairs(rows2)
    assert sel2 == "storm_excluded"
    assert all(1 / 1.35 <= p["busy_inflation"] <= 1.35 for p in used2)


def _qpair(query_eff, q_inflation, q_clean=True, build_eff=0.8):
    band = 1.2
    row = _pair(build_eff, 1.0)
    row.update({
        "query_eff": query_eff,
        "query_busy_inflation": q_inflation,
        "query_clean": q_clean,
        "query_calm": (
            q_clean and q_inflation is not None
            and 1.0 / band <= q_inflation <= band
        ),
    })
    return row


def test_query_selection_uses_query_instrument(benchmod):
    # the probe-policy validation run: a build-calm pair whose QUERY legs
    # were window-poisoned (inflation 1.260, eff 0.719) next to a
    # build-moderate pair whose query legs were calm (1.001, eff 0.959).
    # Probes (query_eff None) must not participate.
    rows = [
        _qpair(0.719, 1.260),
        _qpair(0.959, 1.001),
        {**_pair(0.87, 1.06), "query_eff": None,
         "query_busy_inflation": None, "query_clean": None,
         "query_calm": None, "probe": True},
    ]
    used, sel = benchmod._select_query_pairs(rows)
    # 1 query-calm pair -> storm tier keeps both samples (1.26 < 1.35)
    assert sel == "storm_excluded"
    assert sorted(p["query_eff"] for p in used) == [0.719, 0.959]
    # a second query-calm pair promotes the tier and drops the 1.26 sample
    rows.append(_qpair(0.93, 0.99))
    used, sel = benchmod._select_query_pairs(rows)
    assert sel == "calm"
    assert sorted(p["query_eff"] for p in used) == [0.93, 0.959]


def test_median_low_true_median_on_odd(benchmod):
    assert benchmod._median_low([0.493, 0.736, 1.045]) == 0.736
    assert benchmod._median_low([0.61, 0.81]) == 0.61  # conservative even


def test_utilization_identity_on_archived_pairs(benchmod):
    # the decomposition eff = utilization / inflation: the archived
    # round-5 pairs' eff x inflation collapse to ~0.9 (docs/HISTORY.md)
    for eff, infl in ((0.493, 1.782), (1.045, 0.873), (0.736, 1.243)):
        util = _pair(eff, infl)["hi_core_utilization"]
        assert 0.85 <= util <= 0.95
