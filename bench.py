"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per BASELINE.md: session startup is excluded (Tez's own paper separates
cold AM launch from warm-session submission); each query is timed as the
full plan execution via a count-style action that cannot be
optimized away (df.write to a no-op is overkill locally; we collect a
digest).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time


def format_headline(line: dict, timings: dict, names, budget: int = 1980) -> str:
    """Serialize the headline JSON line GUARANTEED to fit the driver's
    ~2000-char stdout tail — the r5 parsed-null overflow must be
    unreproducible at ANY registry size and ANY value mix (unit-tested
    at 125 queries × 3-digit values in tests/test_bench_contract.py).

    Precision ladder, each tier only when the previous overflows (the
    registry's NAME mass alone is ~1.5KB at 109 queries, so the ladder
    optimizes value chars — names are the contract and never shrink):
    1. 2dp timings;
    2. 1dp, integers for values ≥10, and integral values as bare ints
       ("1.0" → "1") — the realistic steady state at today's registry
       size (~1.97KB measured; BENCH_r06 itself shipped at 1dp);
    3. integers for everything ≥1s, 1dp kept BELOW 1s — sub-second
       entries are where integer rounding destroys the signal (0.3 → 0),
       so they hold precision longest;
    3b. drop steal_pct (OUR host-noise diagnostic — not one of the
       driver's contract fields, and the full-precision diagnostics
       line keeps it) before any timing precision is sacrificed: at 117
       names the tier-3 realistic mix measured 1994 chars, 14 over
       budget, and steal_pct's ~20 chars are strictly cheaper than
       integer-rounding every sub-second entry (r10);
    3c. 1dp kept exactly where the integer would print 0 for a query
       that really ran (total signal loss), nearest integer everywhere
       else (error <= ~0.5) — an honest mid-step between full
       sub-second precision and tier 4's zeros (r10: at 118 names
       tier 3 no longer fit even with steal_pct shed). Contract bound:
       a query at or above the 1dp tick (t >= 0.05) never prints 0;
       genuinely sub-tick queries (t < 0.05) quantize to 0.0 — that is
       honest rounding, not signal loss, and inflating them to a fake
       0.1 would overstate a 5ms query 20x;
    3d. DECISECOND SPLIT (VERDICT r10 item 2: at 118 names the 3c line
       measured ~2068 chars — 69 of 118 real queries printed 0 in the
       shipped tier-4 artifact, losing all round-over-round sub-second
       signal; and the measured registry has ZERO sub-tick queries, so
       dropping 0.0 entries frees nothing): entries whose integer would
       print 0 move to a sibling "queries_ds" map holding DECISECONDS
       as ints (0.3s -> 3, one char instead of three — the same +/-0.05
       signal as 1dp at a third of the value chars; a ds value of 0 is
       the honest sub-tick quantization). Integer-second entries stay
       in "queries". Every query still appears by name exactly once
       across the two maps — nothing dropped, nothing prints a false 0;
    3e. PARTIAL decisecond drop (r12: at 121 names the full ds split
       measures ~25 chars over budget, and the old all-or-nothing
       fallback threw away ALL 75 sub-second per-query entries to save
       those 25 chars): shed ds entries SMALLEST-VALUE-FIRST
       (alphabetical tiebreak — deterministic) into an explicit
       "queries_sub_sec" count until the line fits. The least
       informative rows (those closest to the 0.05 s tick, where one
       ds of quantization is the largest relative error anyway) lose
       their names first; the expensive sub-second rows keep
       round-over-round signal;
    3f. if even an empty ds map overflows, every sub-second entry is in
       the count (the r11 behavior) — reachable only beyond ~130 names;
    4. integer seconds for everything and failed queries as -1 — at 109
       real names a partial emit full of "-1.0" was measured at 2105
       chars, over the tail, so the r6 tiers alone were not a guarantee;
    5. drop FAILED (-1) entries from the map, recording the count in
       "queries_failed" — at 113 names even the all-"-1" tier-4 partial
       emit crossed the budget, and dropping entries that carry no
       timing signal is strictly better than dropping successful ones
       (an all-failed partial now renders a near-empty map + count);
    6. drop remaining per-query entries from the (name-sorted) tail
       until the line fits, recording how many in "queries_omitted" —
       never silent, and the contract fields plus the total always
       survive. Only reachable in windows no physical run produces
       (every query 3-digit seconds); full precision for every query
       always stays in the diagnostics line either way.
    Mutates line["queries"]."""
    ordered = sorted(names)
    steal = line.get("steal_pct")

    def render(tier: float, keep_steal: bool = True) -> str:
        line.pop("queries_ds", None)
        line.pop("queries_sub_sec", None)
        line.pop("queries_ms", None)
        line.pop("units", None)
        if steal is not None:
            if keep_steal:
                line["steal_pct"] = steal
            else:
                line.pop("steal_pct", None)
        def v(n):
            t = timings.get(n, -1.0)
            if tier >= 4:
                return int(round(t))
            if tier == 3.5:
                # keyed on the OUTCOME, not a threshold: keep 1dp
                # exactly where the integer would print 0 (and the
                # query really ran) — "never print 0" is the contract
                i = int(round(t))
                return round(t, 1) if i == 0 and t > 0 else i
            if tier == 3:
                return int(round(t)) if abs(t) >= 0.95 else round(t, 1)
            if tier == 2:
                if t >= 9.95:
                    return int(round(t))
                r = round(t, 1)
                return int(r) if r == int(r) else r
            return round(t, 2)

        if tier in (3.8, 3.85, 3.9):
            qs: dict = {}
            ds: dict = {}
            sub = 0
            for n in ordered:
                t = timings.get(n, -1.0)
                i = int(round(t))
                if i == 0 and t > 0:
                    if tier == 3.9:
                        sub += 1
                    else:
                        # HALF-UP, not banker's: a query exactly at the
                        # 0.05s tick must round to 1 ds, never 0 (the
                        # contract bound), and round(0.5) == 0 in Python
                        ds[n] = int(t * 10 + 0.5)
                else:
                    qs[n] = i

            def emit_split() -> str:
                line["queries"] = qs
                line.pop("queries_ds", None)
                line.pop("queries_sub_sec", None)
                line.pop("units", None)
                if ds:
                    line["queries_ds"] = ds
                    # self-documenting units (VERDICT r13 item 8): the
                    # two maps carry DIFFERENT units and must never be
                    # summed as one — say so in the line itself
                    line["units"] = {"queries": "sec", "queries_ds": "decisec"}
                if sub:
                    line["queries_sub_sec"] = sub
                return json.dumps(line, separators=(",", ":"))

            out = emit_split()
            if tier == 3.85:
                # shed the least-informative ds entries (smallest value,
                # alphabetical tiebreak) into the count until it fits
                shed = sorted(ds.items(), key=lambda kv: (kv[1], kv[0]))
                while len(out) > budget and shed:
                    name, _ = shed.pop(0)
                    del ds[name]
                    sub += 1
                    out = emit_split()
            return out
        line["queries"] = {n: v(n) for n in ordered}
        return json.dumps(line, separators=(",", ":"))

    for tier, keep_steal in (
        (1, True), (2, True), (3, True), (3, False), (3.5, False),
        (3.8, False), (3.85, False), (3.9, False), (4, False),
    ):
        out = render(tier, keep_steal)
        if len(out) <= budget:
            return _with_ms(line, timings, ordered, budget, out)
    # tier 5: failed entries carry no timing signal — drop them (with an
    # explicit count) before any successful timing is sacrificed
    kept = [n for n in ordered if timings.get(n, -1.0) >= 0]
    if len(kept) < len(ordered):
        line["queries_failed"] = len(ordered) - len(kept)
    line["queries"] = {n: int(round(timings.get(n, -1.0))) for n in kept}
    out = json.dumps(line, separators=(",", ":"))
    if len(out) <= budget:
        return out
    # tier 6: tail omission of successful entries, never silent
    while kept:
        kept.pop()
        line["queries"] = {n: int(round(timings.get(n, -1.0))) for n in kept}
        line["queries_omitted"] = len(ordered) - len(kept) - line.get(
            "queries_failed", 0
        )
        out = json.dumps(line, separators=(",", ":"))
        if len(out) <= budget:
            return out
    return out


def _with_ms(
    line: dict, timings: dict, names, budget: int, fitted: str
) -> str:
    """Float-resolution enrichment (VERDICT r16 item 1, r17): once the
    precision ladder settles on a fitting rendering, spend any LEFTOVER
    budget on a "queries_ms" map — integer milliseconds, most expensive
    query first (cost desc, name asc tiebreak), adding entries only
    while the whole line still fits. Strictly additions-only: the
    fitted "queries"/"queries_ds" maps are byte-identical to the
    ladder's choice, so every existing consumer parses exactly what it
    parsed before; the ms entries de-quantize the rows that dominate
    the total (where 1 s buckets hid every win and regression). A
    subset run (TEZ_SPARK_BENCH_ONLY) or a smaller registry gets the
    complete map; at today's ~124-name registry the driver's
    ~2000-char stdout tail cannot hold a second full name mass
    (the ladder already sheds decisecond entries to fit), so the
    COMPLETE ms map additionally always travels in the diagnostics
    line, unconditionally and at full fleet width."""
    ran = sorted(
        (n for n in names if timings.get(n, -1.0) >= 0),
        key=lambda n: (-timings[n], n),
    )
    ms: dict[str, int] = {}
    prev_units = line.get("units")
    best = fitted
    for n in ran:
        ms[n] = int(round(timings[n] * 1000))
        line["queries_ms"] = ms
        line["units"] = dict(
            prev_units or {"queries": "sec"}, queries_ms="ms"
        )
        trial = json.dumps(line, separators=(",", ":"))
        if len(trial) <= budget:
            best = trial
        else:
            del ms[n]
            break
    if not ms:
        line.pop("queries_ms", None)
        if prev_units is None:
            line.pop("units", None)
        else:
            line["units"] = prev_units
    return best


def achieved_runs(n_samples: dict, queries, failed: set) -> int:
    """ACHIEVED sample floor for the headline "runs" stamp: the minimum
    sample count over queries that actually RAN. Never-attempted queries
    on a SIGTERM-mid-sweep partial have 0 samples and must not drag the
    stamp to runs=0 when every measured entry was sampled 2-3x — the
    `partial` flag already marks incompleteness (ADVICE r12, low)."""
    return min(
        (
            n_samples[n]
            for n in queries
            if n not in failed and n_samples.get(n, 0) > 0
        ),
        default=0,
    )


def _digest_action(df) -> None:
    """Force full execution of the plan. The noop sink executes everything
    including final sorts (count() would let Catalyst eliminate them), and
    transfers nothing to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from tez_spark.session import get_spark

    spark = get_spark(app_name="tez_spark_bench", cpus=cpus,
                      shuffle_partitions=cpus)

    from tez_spark.plans.registry import all_queries

    queries = all_queries()
    # debug aid: TEZ_SPARK_BENCH_ONLY=q08,dedup_minhash_lsh restricts the
    # run (the emitted JSON then covers only those queries — never ship it
    # as the round number).
    only = os.environ.get("TEZ_SPARK_BENCH_ONLY")
    if only:
        keep = {k.strip() for k in only.split(",")}
        queries = {k: v for k, v in queries.items() if k in keep}

    # Session-prewarm measurement (the Tez paper's headline mechanism:
    # prewarmed AM/containers cut DAG-submission latency — TezConfiguration
    # prewarm; BASELINE.md cites the paper's cold/warm split). cold =
    # first-ever plan build + execution on the just-started JVM (pays
    # analysis, codegen compile, Python-worker fleet start); warm = the
    # identical call after the warm-up loop below. Both run the flagship
    # entry query at sf0.001, so the delta is pure session state, not data.
    cold_submit = warm_submit = None
    try:
        import __spark_entry__ as _entry_mod

        t0 = time.monotonic()
        _digest_action(_entry_mod.entry(spark))
        cold_submit = round(time.monotonic() - t0, 3)
    except Exception:
        pass

    # warm the JVM/session once (container-reuse analog): one trivial
    # Python stage absorbs the Python-worker fleet startup, then every
    # query runs once at the SMALLEST fixture so each plan shape's
    # codegen is compiled before anything is timed (BASELINE.md's
    # warm-session convention — the first execution of a wide-agg plan
    # like minhash pays ~2s of janino compilation, which otherwise
    # contaminates its first timed sample). Generated code is data-size
    # independent, so the sf0.001 pass hits the same codegen cache.
    try:
        spark.range(1000).repartition(cpus).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    # Warm in the SAME sorted order the timing loop uses (registry order
    # previously decided who got warmed, so a registry rotation silently
    # changed which queries' first timed sample paid codegen — r5 saw
    # dedup_clusters 3.5s -> 16.5s from exactly that). Budget 150s: the
    # registry is ~95 queries and the expensive compiles (iterative CC,
    # 128-agg minhash, 32-term simhash) sit mid-alphabet.
    warm_dir = os.environ.get("TEZ_SPARK_BENCH_WARM_SF", "/root/testdata/sf0.001")
    warm_budget = float(os.environ.get("TEZ_SPARK_BENCH_WARM_BUDGET", "150"))
    if os.path.isdir(warm_dir):
        warm_t0 = time.monotonic()
        for name in sorted(queries):
            if time.monotonic() - warm_t0 > warm_budget:
                break  # never let warm-up starve the timing loop
            try:
                _digest_action(queries[name](spark, warm_dir))
            except Exception:
                pass
    try:
        if cold_submit is not None:
            t0 = time.monotonic()
            _digest_action(_entry_mod.entry(spark))
            warm_submit = round(time.monotonic() - t0, 3)
    except Exception:
        pass

    # Materialize the session-shared corpus artifacts (shingle / band /
    # winnow / corpus signature tables) at the BENCH sf before timing:
    # they are session state shared by seven queries (the warm-session
    # protocol this bench declares — Tez prewarm parity), and leaving the
    # build inside the timing loop just charges its one-time cost to
    # whichever consumer sorts first alphabetically (curation_pipeline
    # absorbed it in r5). The build cost itself is documented in PERF.md.
    prewarm_build_sec = None
    try:
        from tez_spark.operators.dedup import prewarm_corpus_artifacts

        # the one-time artifact-build cost the timing loop no longer pays,
        # recorded so the headline total can be reconstructed WITH it
        # (ADVICE r5: don't leave the protocol's prewarm cost PERF.md-only)
        prewarm_build_sec = prewarm_corpus_artifacts(spark, sf_dir)
    except Exception:
        pass

    # Steal-aware sampling protocol (BASELINE.md convention is 3x-median;
    # this host shows external CPU steal spikes of 10-40x with zero local
    # processes, so the sample count adapts to the load the box is under
    # when the bench starts, and the JSON records per-query sample counts
    # + the loadavg window so a contaminated run is visible as data):
    # - idle (load1 < 4): 3 samples, min (medians kept in diagnostics).
    # - moderate: 2 samples, min — the less-contaminated one.
    # - heavy steal: 1 sample; the loadavg field flags the number as dirty.
    # Slow queries keep their full sample count until HALF the global
    # budget is spent (a slow first sample is usually steal and needs the
    # de-noising repeats most), then drop to 2 samples; once the whole
    # budget is spent everything runs once — bounds total wall-clock
    # against any driver timeout.
    def _load1() -> float:
        try:
            return os.getloadavg()[0]
        except OSError:
            return 0.0

    def _cpu_jiffies() -> tuple[int, int]:
        """(steal, total) jiffies from /proc/stat — the direct hypervisor
        steal signal. loadavg conflates our own local[32] tasks with
        external contention; steal% separates them: a run with high load
        but ~0% steal is self-load (clean), steal in the double digits
        is the documented external-contention pathology."""
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            vals = [int(x) for x in parts[1:]]
            steal = vals[7] if len(vals) > 7 else 0
            return steal, sum(vals)
        except Exception:
            return 0, 0

    # Settle before deciding the policy: the 1-minute loadavg decays
    # slowly, so a just-finished local job (the warm-up above, or the
    # driver's own prior work) reads as "busy host" and would demote a
    # genuinely idle run to fewer samples. Wait briefly for load1 < 4
    # before sampling; give up after the settle budget (real steal).
    settle_s = float(os.environ.get("TEZ_SPARK_BENCH_SETTLE", "45"))
    settle_t0 = time.monotonic()
    while _load1() >= 4 and time.monotonic() - settle_t0 < settle_s:
        time.sleep(5)

    load_start = _load1()
    steal0, total0 = _cpu_jiffies()
    # passes, not samples: each pass executes a (sub-cutoff) query TWICE
    # and keeps the pair min, so 2 passes = 4 executions / 2
    # burst-separated warm samples — the wall-clock of the old 3
    # consecutive samples with strictly better noise behavior.
    default_runs = "1" if load_start > max(8, cpus / 2) else "2"
    runs = int(os.environ.get("TEZ_SPARK_BENCH_RUNS", default_runs))
    slow_cutoff = float(os.environ.get("TEZ_SPARK_BENCH_SLOW_CUTOFF", "5.0"))
    budget_s = float(os.environ.get("TEZ_SPARK_BENCH_BUDGET", "360"))
    bench_start = time.monotonic()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    n_samples: dict[str, int] = {}
    all_samples: dict[str, list[float]] = {n: [] for n in queries}
    failed: set[str] = set()

    def aggregate() -> None:
        """min/median per query from whatever samples exist so far —
        callable mid-run (SIGTERM partial emit) or at completion."""
        for name, s in all_samples.items():
            if name in failed or not s:
                timings[name] = -1.0
                n_samples[name] = len(s)
                continue
            # MIN of the samples: bursts only inflate, so the minimum is
            # the least-contaminated observation of the warm plan's true
            # cost and is what idle-box medians converge to. Medians stay
            # in the diagnostics line for cross-checking.
            s_sorted = sorted(s)
            timings[name] = round(s_sorted[0], 3)
            medians[name] = round(s_sorted[len(s_sorted) // 2], 3)
            n_samples[name] = len(s)

    def emit(partial: bool = False) -> None:
        # Two lines, diagnostics FIRST and the headline line LAST: the
        # driver keeps a bounded ~2000-char tail of stdout, so the LAST
        # line must fit the tail WHOLE or the driver records parsed:null
        # (r2's giant single line and r5's 99-query+prewarm line both
        # overflowed it). The headline therefore carries only the contract
        # fields (metric/value/unit/queries/sf) plus steal_pct, with
        # per-query timings at 2dp (~1.9KB at 99 queries); everything else
        # (loadavg, runs policy, prewarm latencies/build cost, 3dp
        # medians, protocol tag) lives in the diagnostics line. A shrink
        # fallback drops precision if the registry ever outgrows the
        # budget again.
        aggregate()
        total = round(sum(t for t in timings.values() if t >= 0), 3)
        # full-precision ORACLED subtotal (the paired-window numerator
        # vs tools/bench_oracle.py): summing the quantized headline map
        # instead mis-stated the r10 band by ~15% (69 zero-printed
        # entries) — the stamp must come from the raw mins (r11)
        try:
            from tez_spark.plans.registry import all_oracles

            ok = set(all_oracles())
            total_oracled = round(
                sum(t for n, t in timings.items() if t >= 0 and n in ok), 3
            )
        except Exception:
            total_oracled = None
        steal1, total1 = _cpu_jiffies()
        dt = total1 - total0
        steal_pct = round(100.0 * (steal1 - steal0) / dt, 2) if dt > 0 else 0.0
        diag = {
            "bench_diagnostics": {
                "protocol": "min-of-n-v4-paired-interleaved-prewarmed",
                "samples": {n: n_samples.get(n, 0) for n in sorted(queries)},
                "medians": {n: medians[n] for n in sorted(medians)},
                # full-fleet float resolution (r17): the headline's
                # integer/decisecond buckets exist only to fit the
                # driver's ~2000-char stdout tail; the per-query MINS in
                # milliseconds live here so every captured run (PERF.md
                # window stamps, the low-core scaling block, A/B sweeps)
                # has de-quantized per-query data
                "queries_ms": {
                    n: int(round(timings[n] * 1000))
                    for n in sorted(queries)
                    if timings.get(n, -1.0) >= 0
                },
                "loadavg": [round(load_start, 2), round(_load1(), 2)],
                # ALSO here, not just the headline: tier 3b sheds
                # steal_pct from the headline at >=117 names, and the
                # host-noise protocol must keep its signal somewhere
                # (r10 review)
                "steal_pct": steal_pct,
                "total_oracled": total_oracled,
                "runs_policy": runs,
                "prewarm": {
                    "cold_submit_sec": cold_submit,
                    "warm_submit_sec": warm_submit,
                    "artifact_build_sec": prewarm_build_sec,
                },
            }
        }
        print(json.dumps(diag, separators=(",", ":")), flush=True)
        line = {
            "metric": "tez_spark_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": {},
            "sf": sf,
            "steal_pct": steal_pct,
            # the sample count travels IN the headline (VERDICT r11 item
            # 4): a load-degraded driver window stamps min-of-1 timings —
            # systematically inflated on this host — and the diagnostics
            # line that records runs_policy is exactly what the driver's
            # 2000-char tail truncates first, so the shipped artifact
            # must be classifiable alone. ACHIEVED floor, not the
            # configured policy (r12 review: a burst that blows the
            # budget breaks the pass loop after one pass, and stamping
            # the policy's 2 would classify that min-of-1 artifact as
            # min-of-2): the minimum sample count over queries that RAN
            # (see achieved_runs — ADVICE r12, low — FIXED).
            "runs": achieved_runs(n_samples, queries, failed),
        }
        if partial:
            line["partial"] = True
        print(format_headline(line, timings, queries), flush=True)

    def on_term(signum, frame):  # killed by a driver timeout: still emit
        emit(partial=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    # INTERLEAVED PAIRED passes (r6 protocol hardening, two observed
    # pathologies, one schedule):
    # (1) contention BURSTS of 3-15 s that only ever INFLATE and cover
    #     CONSECUTIVE wall-clock spans — consecutive min-of-3 lets one
    #     burst poison all of a query's samples (measured dedup_simhash
    #     1.8 -> 7.9 s min-of-3 at 0.02% steal). Fix: one sample per FULL
    #     PASS over the registry, so a query's samples sit tens of
    #     seconds apart and a burst hits at most one.
    # (2) pure interleaving loses back-to-back warm state (JIT/cache
    #     locality of the just-run plan): a full interleaved window
    #     measured a UNIFORM ~1.3x on sub-second map-only queries vs the
    #     consecutive schedule on a same-steal box. Fix: within a pass
    #     each query executes TWICE back-to-back and the pass's sample is
    #     the pair's min — the second execution is the steady-state cost.
    # Net: samples are warm AND burst-separated. Slow queries
    # (> slow_cutoff) skip the pairing (data work dominates warm-state
    # effects and the repeat would burn budget) and skip their 3rd+ pass
    # once half the budget is spent; no new pass starts past the budget.
    for p in range(runs):
        elapsed = time.monotonic() - bench_start
        if p > 0 and elapsed > budget_s:
            break
        for name in sorted(queries):
            if name in failed:
                continue
            s = all_samples[name]
            slow = bool(s) and s[0] > slow_cutoff
            if p > 1 and slow and (
                time.monotonic() - bench_start > budget_s / 2
            ):
                continue
            try:
                t0 = time.monotonic()
                _digest_action(queries[name](spark, sf_dir))
                first = time.monotonic() - t0
                if first <= slow_cutoff:
                    t0 = time.monotonic()
                    _digest_action(queries[name](spark, sf_dir))
                    first = min(first, time.monotonic() - t0)
                s.append(first)
            except Exception as exc:  # never let one query kill the line
                failed.add(name)
                print(f"bench: {name} failed: {exc}", file=sys.stderr)

    emit()
    spark.stop()


if __name__ == "__main__":
    main()
