"""Registry contract invariants: the driver checks the FIRST 50
queries in registration order, so the window priority list must stay
valid — a typo there silently drops a query out of the correctness
window."""

from __future__ import annotations

from social_media_data_pipeline_recession_political_sentiment_spark import registry


def test_window_priority_names_all_registered():
    qs = registry.queries()
    missing = [n for n in registry._WINDOW_PRIORITY if n not in qs]
    assert missing == [], f"priority names with no registration: {missing}"


def test_window_priority_leads_registration_order():
    names = list(registry.queries())
    assert names[: len(registry._WINDOW_PRIORITY)] == list(registry._WINDOW_PRIORITY)
    # oracles() must present the same ordering for the driver's zip
    onames = [n for n in registry.oracles()]
    in_priority = [n for n in onames if n in set(registry._WINDOW_PRIORITY)]
    expect = [n for n in registry._WINDOW_PRIORITY if n in set(onames)]
    assert in_priority == expect


def test_rows_only_queries_are_the_documented_approximate_set():
    qs, os_ = registry.queries(), registry.oracles()
    rows_only = sorted(set(qs) - set(os_))
    # genuinely non-SQL-expressible (approximate ANN) ops only
    assert rows_only == ["ext_dedup_embcos_lsh", "ext_sim_ivf", "ext_sim_lsh"]
