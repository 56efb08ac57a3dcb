"""bench.py stdout contract: the headline JSON line must fit the
driver's ~2000-char stdout tail at ANY registry size and value mix — the
r5 parsed-null truncation must be unreproducible (VERDICT r6 task 8).
No Spark session needed; pure formatting."""

from __future__ import annotations

import json

import bench


def _line(partial: bool = False, runs: int = 1) -> dict:
    d = {
        "metric": "tez_spark_total_wall_clock",
        "value": 123456.789,
        "unit": "sec",
        "queries": {},
        "sf": "/root/testdata/sf0.1",
        "steal_pct": 99.99,
        "runs": runs,
    }
    if partial:
        d["partial"] = True
    return d


def _real_names() -> list[str]:
    from tez_spark.plans.registry import all_queries

    return list(all_queries())


def test_headline_fits_tail_at_125_queries_3_digit_values():
    """125 realistically-named queries all burst-inflated to 999.99s —
    far beyond anything a physical window produces — must still
    serialize under 2000 chars, parse, and account for every query
    (entries present + queries_omitted == 125; omission is explicit,
    never silent)."""
    names = _real_names()
    names = names + [f"next_round_q{i:02d}" for i in range(125 - len(names))]
    assert len(names) == 125
    timings = {n: 999.99 for n in names}
    out = bench.format_headline(_line(), timings, names)
    assert len(out) < 2000, f"headline overflows the driver tail: {len(out)}"
    parsed = json.loads(out)
    assert parsed["metric"] == "tez_spark_total_wall_clock"
    assert parsed["value"] == 123456.789
    assert len(parsed["queries"]) + parsed.get("queries_omitted", 0) == 125
    assert all(v == 1000 for v in parsed["queries"].values())


def test_headline_partial_all_failed_fits_without_omission():
    """A driver-timeout partial emit (every query -1.0) at the CURRENT
    registry must fit with every query ACCOUNTED FOR and no successful
    timing omitted. Registry growth history: the all-"-1.0" emit was
    2105 chars at 109 names (r6 added the integral tier), and at 113
    names even the all-"-1" integer tier crossed 1980 — failed entries
    now collapse into an explicit "queries_failed" count instead
    (tier 5), which scales to any registry size because -1 entries
    carry no timing signal."""
    names = _real_names()
    out = bench.format_headline(_line(partial=True), {}, names)
    assert len(out) < 2000, f"partial emit overflows: {len(out)}"
    parsed = json.loads(out)
    assert parsed["partial"] is True
    assert "queries_omitted" not in parsed
    n_acct = len(parsed["queries"]) + parsed.get("queries_failed", 0)
    assert n_acct == len(names)
    assert all(v == -1 for v in parsed["queries"].values())


def _flat(parsed: dict) -> dict:
    """Per-query seconds across both maps: 'queries' (seconds) plus the
    tier-3d 'queries_ds' sibling (deciseconds)."""
    out = dict(parsed["queries"])
    for n, v in parsed.get("queries_ds", {}).items():
        assert n not in out  # exactly one map per query
        out[n] = v / 10.0
    return out


def test_headline_measured_r10_mix_never_prints_zero():
    """The MIX THAT ACTUALLY SHIPPED broken in BENCH_r10 (VERDICT r10
    item 2): at the live registry size, ~59% of queries in [0.05, 0.5)s,
    ~28% in [0.5, 0.95)s, the rest 1-10s (the r11 idle-measured
    distribution — ZERO sub-tick entries, so the drop-0.0-entries
    fallback frees nothing). Tier 3d must fire: every query appears by
    name with NONZERO sub-second signal (deciseconds in queries_ds or
    integer seconds in queries), within +/-0.05s for sub-second entries,
    and the line fits the driver tail."""
    import random

    names = _real_names()
    rng = random.Random(11)
    timings = {}
    for i, n in enumerate(sorted(names)):
        r = i / len(names)
        if r < 0.59:
            timings[n] = round(rng.uniform(0.05, 0.49), 3)
        elif r < 0.87:
            timings[n] = round(rng.uniform(0.5, 0.94), 3)
        else:
            timings[n] = round(rng.uniform(1.0, 10.0), 3)
    out = bench.format_headline(_line(), timings, names)
    assert len(out) <= 1980, f"headline overflows the driver tail: {len(out)}"
    parsed = json.loads(out)
    flat = _flat(parsed)
    # every query accounted for: by name, or (tier 3e overflow at fat
    # mixes) inside the explicit sub-second drop count — never silently
    dropped = parsed.get("queries_sub_sec", 0)
    assert len(flat) + dropped == len(names)
    assert set(flat) <= set(names)
    if dropped:
        # only sub-second entries may be dropped; integer-second names
        # always survive
        assert all(timings[n] >= 0.95 or n in flat or timings[n] < 0.5
                   for n in names)
    for n, v in flat.items():
        assert v != 0, (n, v, timings[n])  # >= tick: never prints 0
        assert abs(v - timings[n]) <= 0.551, (n, v, timings[n])
        if timings[n] < 0.45:  # decisecond entries: +/-0.05 signal
            assert abs(v - timings[n]) <= 0.051, (n, v, timings[n])


def test_headline_realistic_mix_keeps_subsecond_precision():
    """Today's realistic shape (0.2–3s values at the full registry) must
    NEVER print 0 for a query at or above the 1dp tick (t >= 0.05s) —
    integer rounding a 0.3s query to 0 would destroy the per-query
    BENCH record the judge compares across rounds. Precision degrades
    honestly with registry size (tier 3c keeps 1dp exactly where the
    integer would be 0); genuinely sub-tick queries may quantize to
    0.0 — honest rounding, not signal loss."""
    import random

    names = _real_names()
    rng = random.Random(3)
    timings = {n: round(rng.uniform(0.2, 3.0), 3) for n in names}
    # plant one sub-tick entry: it MAY print 0.0 (honest quantization)
    subtick = sorted(names)[0]
    timings[subtick] = 0.031
    out = bench.format_headline(_line(), timings, names)
    assert len(out) < 2000
    parsed = json.loads(out)
    assert "queries_omitted" not in parsed
    flat = _flat(parsed)
    assert len(flat) + parsed.get("queries_sub_sec", 0) == len(names)
    for n, v in flat.items():
        if n == subtick:
            assert abs(v - timings[n]) <= 0.051, (n, v, timings[n])
            continue
        assert v != 0, (n, v, timings[n])  # >= tick: never prints 0
        assert abs(v - timings[n]) <= 0.551, (n, v, timings[n])


def test_headline_keeps_2dp_precision_when_it_fits():
    """A smaller registry (or one with short names) keeps the 2dp tier
    untouched — the shrink tiers only fire on overflow."""
    names = _real_names()[:80]
    timings = {n: 1.23 for n in names}
    out = bench.format_headline(_line(), timings, names)
    assert len(out) < 2000
    parsed = json.loads(out)
    assert "queries_omitted" not in parsed
    assert all(v == 1.23 for v in parsed["queries"].values())


def test_headline_never_overflows_even_at_absurd_scale():
    """Property sweep: 200 long-named queries, mixed failed/3-digit
    values — the ladder must ALWAYS return a parseable line under
    budget with the contract fields intact."""
    names = [f"extremely_long_query_name_for_growth_{i:03d}" for i in range(200)]
    timings = {n: (999.99 if i % 2 else -1.0) for i, n in enumerate(names)}
    out = bench.format_headline(_line(partial=True), timings, names)
    assert len(out) <= 1980
    parsed = json.loads(out)
    assert parsed["metric"] == "tez_spark_total_wall_clock"
    assert parsed["unit"] == "sec"
    accounted = (
        len(parsed["queries"])
        + parsed.get("queries_omitted", 0)
        + parsed.get("queries_failed", 0)
    )
    assert accounted == 200
    # failed entries are dropped BEFORE any successful timing
    assert all(v >= 0 for v in parsed["queries"].values())


def test_headline_accounting_property():
    """Property sweep over random registry sizes and value mixes: every
    query is accounted for exactly once across queries / queries_ds /
    queries_failed / queries_omitted, the line always fits and parses,
    and whenever the ladder settled at tier 3d or better (no omission,
    no failure-collapse), a >= 0.05s query never reads as 0 anywhere."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    real = _real_names()

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=200),
        seed=st.integers(min_value=0, max_value=10**6),
        fail_rate=st.floats(min_value=0.0, max_value=1.0),
    )
    def check(n, seed, fail_rate):
        rng = random.Random(seed)
        names = (real * 3)[:n] if n <= len(real) * 3 else real
        names = [f"{nm}_{i}" if i >= len(real) else nm
                 for i, nm in enumerate(names)]
        timings = {}
        for nm in names:
            if rng.random() < fail_rate:
                timings[nm] = -1.0
            else:
                timings[nm] = round(rng.choice([
                    rng.uniform(0.0, 0.049),   # sub-tick
                    rng.uniform(0.05, 0.49),   # decisecond band
                    rng.uniform(0.5, 9.99),    # small seconds
                    rng.uniform(10, 999),      # heavy
                ]), 3)
        out = bench.format_headline(_line(), timings, names)
        assert len(out) <= 1980
        parsed = json.loads(out)
        qs = parsed["queries"]
        ds = parsed.get("queries_ds", {})
        assert not (set(qs) & set(ds))
        accounted = (len(qs) + len(ds)
                     + parsed.get("queries_sub_sec", 0)
                     + parsed.get("queries_failed", 0)
                     + parsed.get("queries_omitted", 0))
        assert accounted == len(names), (accounted, len(names))
        if "queries_omitted" not in parsed and "queries_failed" not in parsed:
            full_tier = len(qs) + len(ds) == len(names)
            for nm, t in timings.items():
                if t >= 0.05 and full_tier and (ds or nm in ds):
                    # tier 3d fired: sub-second signal must survive
                    v = ds.get(nm, qs.get(nm))
                    assert v != 0, (nm, t, v)

    check()


def test_headline_ms_enrichment_is_complete_on_small_registries():
    """r17 (VERDICT r16 item 1): when the registry is small enough that
    the line has slack, queries_ms carries EVERY ran query at integer
    milliseconds, self-documented in units, and the line still fits."""
    names = _real_names()[:12]
    timings = {n: 0.123 + i for i, n in enumerate(names)}
    out = bench.format_headline(_line(), timings, names)
    assert len(out) <= 1980
    parsed = json.loads(out)
    assert parsed["units"]["queries_ms"] == "ms"
    assert set(parsed["queries_ms"]) == set(names)
    for n in names:
        assert parsed["queries_ms"][n] == int(round(timings[n] * 1000))


def test_headline_ms_enrichment_is_additions_only():
    """The ms map may only ever be APPENDED into leftover budget: the
    ladder-fitted queries / queries_ds / queries_sub_sec maps must be
    byte-identical with and without the enrichment step (the driver's
    parser and the round-over-round comparison see the same shapes),
    and ms entries must prioritize the most expensive queries."""
    import random

    names = _real_names()
    rng = random.Random(17)
    timings = {n: round(rng.uniform(0.05, 4.0), 3) for n in names}
    out = bench.format_headline(_line(), dict(timings), names)
    parsed = json.loads(out)
    unenriched = bench._with_ms
    try:
        bench._with_ms = lambda line, t, nm, b, fitted: fitted
        base = json.loads(bench.format_headline(_line(), dict(timings), names))
    finally:
        bench._with_ms = unenriched
    assert parsed["queries"] == base["queries"]
    assert parsed.get("queries_ds", {}) == base.get("queries_ds", {})
    assert parsed.get("queries_sub_sec", 0) == base.get("queries_sub_sec", 0)
    assert len(out) <= 1980
    ms = parsed.get("queries_ms", {})
    if ms:
        # cost-descending greedy: every included entry is at least as
        # expensive as every excluded one (name-asc tiebreak aside)
        floor = min(timings[n] for n in ms)
        ceil_excluded = max(
            (timings[n] for n in names if n not in ms), default=-1.0
        )
        assert floor >= ceil_excluded - 1e-9
        for n, v in ms.items():
            assert v == int(round(timings[n] * 1000))


def test_headline_ms_enrichment_skips_failed_queries():
    """Failed (-1) queries carry no timing signal and must never appear
    in queries_ms; an all-failed emit carries no ms map at all."""
    names = _real_names()[:20]
    timings = {n: -1.0 for n in names}
    timings[names[0]] = 2.5
    out = bench.format_headline(_line(), timings, names)
    parsed = json.loads(out)
    assert set(parsed.get("queries_ms", {})) == {names[0]}
    out_all_failed = bench.format_headline(_line(partial=True), {}, names)
    assert "queries_ms" not in json.loads(out_all_failed)


def test_headline_carries_sample_count_through_every_tier():
    """VERDICT r11 item 4: a load-degraded driver window defaults to
    min-of-1 sampling — systematically inflated on this host — and the
    diagnostics line that records runs_policy is what the driver tail
    truncates first. The "runs" field must therefore survive in the
    HEADLINE at every precision tier, including the overflow ladder's
    deepest steps, so a one-sample artifact is classifiable alone."""
    names = _real_names()
    # realistic mix (forces the decisecond tiers at today's size)
    timings = {n: (0.4 if i % 2 else 3.0) for i, n in enumerate(names)}
    out = bench.format_headline(_line(runs=1), timings, names)
    assert json.loads(out)["runs"] == 1

    # absurd overflow mix (drives tier 5/6 omission) still keeps it
    big = names + [f"extra_q{i:03d}" for i in range(150)]
    timings = {n: 999.99 for n in big}
    out = bench.format_headline(_line(runs=2), timings, big)
    parsed = json.loads(out)
    assert len(out) < 2000
    assert parsed["runs"] == 2


def test_headline_partial_ds_drop_keeps_largest_subsecond_entries():
    """Tier 3e (r12): at the current 121-name registry the full
    decisecond split is ~25 chars over budget; the ladder must shed the
    SMALLEST-value ds entries (alphabetical tiebreak) into
    queries_sub_sec — not all of them — so expensive sub-second rows
    keep their round-over-round per-query signal."""
    import random

    names = _real_names()
    rng = random.Random(7)
    timings = {}
    for i, n in enumerate(sorted(names)):
        r = i / len(names)
        if r < 0.62:
            timings[n] = round(rng.uniform(0.05, 0.49), 3)
        elif r < 0.88:
            timings[n] = round(rng.uniform(0.5, 0.94), 3)
        else:
            timings[n] = round(rng.uniform(1.0, 10.0), 3)
    out = bench.format_headline(_line(runs=3), timings, names)
    assert len(out) <= 1980
    parsed = json.loads(out)
    qs, ds = parsed["queries"], parsed.get("queries_ds", {})
    dropped = parsed.get("queries_sub_sec", 0)
    assert len(qs) + len(ds) + dropped == len(names)
    if dropped:
        # the partial tier fired: names survive, and the shed policy is
        # smallest-(value, name)-first — every kept entry sorts at or
        # above every dropped one
        assert ds, "all-or-nothing drop regressed: ds emptied"
        sub = {n: int(timings[n] * 10 + 0.5) for n in names
               if int(round(timings[n])) == 0 and timings[n] > 0}
        dropped_names = set(sub) - set(ds)
        assert len(dropped_names) == dropped
        kept_min = min((v, n) for n, v in ds.items())
        dropped_max = max((sub[n], n) for n in dropped_names)
        assert dropped_max <= kept_min, (dropped_max, kept_min)
    # dropped entries are only ever sub-second; integer rows keep names
    for n in names:
        if int(round(timings[n])) != 0:
            assert n in qs


def test_achieved_runs_ignores_never_attempted_queries():
    """ADVICE r12 (low): on a SIGTERM-mid-sweep partial, queries never
    attempted carry n_samples 0 and must not stamp runs=0 when every
    query that actually ran was sampled 2-3x."""
    queries = ["a", "b", "c"]
    # partial emit: a and b ran (3 and 2 samples), c never attempted
    assert bench.achieved_runs({"a": 3, "b": 2, "c": 0}, queries, set()) == 2
    # failed queries are excluded regardless of samples
    assert bench.achieved_runs({"a": 3, "b": 1}, queries, {"b"}) == 3
    # nothing ran at all -> 0 (the partial flag marks incompleteness)
    assert bench.achieved_runs({}, queries, set()) == 0
    # complete run: the true min survives
    assert bench.achieved_runs({"a": 2, "b": 2, "c": 2}, queries, set()) == 2
