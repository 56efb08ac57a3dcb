"""Char-gram artifact storage-posture A/B (VERDICT r13 item 2).

The r13 char_gram_table persisted one row per corpus CHARACTER position
(~20-25 bytes/char): linear — the same complexity class as the
reference algorithm's ~8N suffix array — but a multi-PB distributed
cache at the 100TB target. This harness measures, at 1x/3x/10x the
bench SF on the scale_ab synthetic fixtures, the two alternatives the
verdict scheduled:

  instances — persist the full (doc_id, pos, g) explode (r13 shape);
              consumers read the cache, frequency agg re-runs per
              consumer.
  dupset    — persist ONLY the duplicated-gram set (count >= 2,
              dup-content-bounded, one 8-byte column); consumers
              recompute the instance stream map-side (one codegen
              explode per consumer) and the frequency agg runs once at
              artifact build.

Per (posture, scale): artifact build seconds, persisted artifact bytes
(memory + disk, from the session's RDD storage info), then min-of-2
warm walls for the three consumers (exactsubstr_chars,
exactsubstr_trim, decontaminate_chars) with shuffle bytes. Fitted
exponents between the smallest and largest scale land beside each
posture. Decision recorded in PERF.md r14; the shipped default is
GRAM_POSTURE in tez_spark/functions/text_queries.py. r14 extension:
the token-gram family (text_dup_spans, exactsubstr_spans) is measured
the same way — its instance table is the same corpus-position-linear
class, and the shipped posture applies to both sides.

Usage: python tools/gram_posture_ab.py [--scales 1,3,10]
       [--out /tmp/gram_posture_ab.json]
Run on an IDLE box (uptime first — see PERF.md host-noise protocol).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_ab import gen_fixture  # noqa: E402  (tools/ sibling import)


def storage_bytes(spark) -> int:
    """Total persisted bytes (memory + disk) across the session's RDDs."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def main() -> None:
    scales = [1, 3, 10]
    out_path = "/tmp/gram_posture_ab.json"
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--scales"):
            val = a.split("=", 1)[1] if "=" in a else args[i + 1]
            scales = [int(s) for s in val.split(",")]
            i += 1 if "=" in a else 2
        elif a.startswith("--out"):
            out_path = a.split("=", 1)[1] if "=" in a else args[i + 1]
            i += 1 if "=" in a else 2
        else:
            i += 1

    from tez_spark.functions import text_queries as tq
    from tez_spark.observability import capture
    from tez_spark.operators.core import release_caches, release_shared
    from tez_spark.plans.registry import all_queries
    from tez_spark.session import get_spark

    spark = get_spark(app_name="gram_posture_ab", cpus=32,
                      shuffle_partitions=32)
    reg = all_queries()
    consumers = ["exactsubstr_chars", "exactsubstr_trim",
                 "decontaminate_chars", "text_dup_spans",
                 "exactsubstr_spans"]

    results: dict[str, dict] = {}
    for scale in scales:
        sf_dir = gen_fixture(scale)
        print(f"=== scale x{scale}: {sf_dir}", file=sys.stderr, flush=True)
        for posture in ("instances", "dupset"):
            tq.GRAM_POSTURE = posture
            release_caches()
            release_shared(spark)
            base_bytes = storage_bytes(spark)

            t0 = time.monotonic()
            if posture == "instances":
                tq.char_gram_table(spark, sf_dir).count()
                tq.token_gram_table(spark, sf_dir).count()
            tq.dup_char_gram_set(spark, sf_dir).count()
            tq.dup_token_gram_set(spark, sf_dir).count()
            build_sec = time.monotonic() - t0
            # span table is a downstream memo consumed by trim in BOTH
            # postures; build it apart so trim rows measure the splice
            t0 = time.monotonic()
            tq.char_span_table(spark, sf_dir).count()
            span_sec = time.monotonic() - t0
            art_bytes = storage_bytes(spark) - base_bytes

            entry = results.setdefault(posture, {}).setdefault(
                "scales", {}
            ).setdefault(f"x{scale}", {
                "build_sec": round(build_sec, 3),
                "span_build_sec": round(span_sec, 3),
                "artifact_bytes": art_bytes,
                "consumers": {},
            })
            for name in consumers:
                fn = reg[name]
                # warm (codegen), then min-of-2 timed
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best, counters = None, None
                for _ in range(2):
                    t0 = time.monotonic()
                    _, c = capture(
                        spark,
                        lambda: fn(spark, sf_dir).write.format("noop")
                        .mode("overwrite").save(),
                    )
                    w = time.monotonic() - t0
                    if best is None or w < best:
                        best, counters = w, c
                entry["consumers"][name] = {
                    "wall_sec": round(best, 3),
                    "shuffle_bytes": counters.get("SHUFFLE_BYTES_WRITTEN", 0),
                }
                print(f"{posture}@x{scale} {name}: "
                      f"{entry['consumers'][name]}",
                      file=sys.stderr, flush=True)
            total = build_sec + span_sec + sum(
                v["wall_sec"] for v in entry["consumers"].values()
            )
            entry["total_sec"] = round(total, 3)
            print(f"{posture}@x{scale}: build={build_sec:.2f}s "
                  f"span={span_sec:.2f}s artifact={art_bytes/1e6:.1f}MB "
                  f"total={total:.2f}s", file=sys.stderr, flush=True)

    for posture, entry in results.items():
        by_scale = entry["scales"]
        ks = sorted(by_scale, key=lambda k: int(k[1:]))
        lo, hi = ks[0], ks[-1]
        r = int(hi[1:]) / int(lo[1:])
        if r > 1:
            exps: dict[str, float] = {}
            for metric in ("total_sec", "artifact_bytes"):
                a, b = by_scale[lo][metric], by_scale[hi][metric]
                if a and b:
                    exps[metric] = round(math.log(b / a) / math.log(r), 2)
            for name in consumers:
                a = by_scale[lo]["consumers"][name]["wall_sec"]
                b = by_scale[hi]["consumers"][name]["wall_sec"]
                if a and b:
                    exps[f"{name}_wall"] = round(
                        math.log(b / a) / math.log(r), 2
                    )
            entry["exponents"] = exps
    print(json.dumps(results, indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
