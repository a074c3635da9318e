"""Benchmark: headline catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines — a bulky detail line first, then the compact
summary line LAST:
  {"detail": {"raw_runs": {...}, "contended_first_pass": {...}}}
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ...,
   "meta": {host load, cpu count, pass_totals, ...},
   "regressions": {"q": {"now": s, "prev": s, "ratio": r}, ...}}

Floor-anchored headline (VERDICT r14 "what's wrong" #1): timing runs
PASS-WISE — every headline query once per pass, N passes — and
"value" is the MINIMUM per-pass total, with every pass's total
visible in meta.pass_totals. One committed artifact therefore shows
the calm floor AND the host band it was sampled from, instead of a
single noise draw from a ±16% band (the committed r14 artifact was
the round's second-worst of five calm passes, and three verdicts
have burned slots re-adjudicating exactly that). Pass-wise order
also gives each query time diversity: an interference episode lands
on one PASS (visible as an inflated entry in pass_totals), not on
all runs of one query. "queries" stays the per-query min across all
passes — the regression guard's baseline — so meta.sum_of_mins
(= sum(queries)) ≤ value by construction.

The driver records only the LAST ~2000 bytes of stdout and parses the
final line (BENCH_r09.json shipped `parsed: null` because the
contended-retry pass doubled raw_runs past that window and the line's
HEAD — the per-query minima — was cut; VERDICT r9 "what's wrong" #2).
Keeping raw_runs on their own earlier line means the decision-grade
summary always survives the tail capture whole; the detail line is
best-effort evidence for local variance analysis.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect overhead) — the number measures the engine, not
py4j transfer.

Round-over-round hygiene: per-query raw run times and the host load
averages ship in "meta" so a slow number can be attributed (host noise
shows as high load + high run variance; a real regression shows in the
min). If BENCH_r*.json files from earlier rounds exist, any headline
query slower than 1.5x its previous min is listed in "regressions".
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REGRESSION_RATIO = 1.5

# Host-contention guard (VERDICT r8 "what's wrong" #1): the committed
# r8 artifact was recorded inside one of this host's multi-minute
# interference episodes (load_1m 9.12 at end vs 0.5-1.3 in calm
# windows) and needed prose in ROTATION.md to correct it. The bench
# now self-corrects: if the 1-minute load average reads above
# LOAD_CALM_BEFORE when timing starts, or above LOAD_CALM_AFTER when
# it ends (the bench's own contribution decays to ~1 by then — r7/r8
# calm windows read 0.5-1.3 after), sleep CONTENTION_SLEEP_S and
# re-run the whole timing pass once, keep the per-query MIN across
# both passes (interference only ever inflates), and ship BOTH load
# readings in meta so the artifact explains itself.
LOAD_CALM_BEFORE = 3.0
LOAD_CALM_AFTER = 5.0
CONTENTION_SLEEP_S = 60

# Calm-START enforcement (VERDICT r12 "what's wrong" #1): the retry
# logic above can re-run a contended PASS, but it cannot retry a
# contended START — BENCH_r12.json was committed from a launch at
# ambient load 11.99 and recorded an episode, not a floor. Before the
# Spark session exists (so the reading is pure ambient), wait out the
# host until the 1-minute load is calm, bounded; the waits and an
# exhausted flag ship in meta so the artifact explains itself either
# way.
CALM_START_LOAD = 1.5
CALM_START_SLEEP_S = 60
CALM_START_MAX_WAITS = 10


def _salvage_tail_minima(tail: str) -> dict[str, float]:
    """Per-query minima recovered from a TRUNCATED driver tail capture.

    BENCH_r09.json shipped ``parsed: null`` (the pre-r10 single-line
    format let raw_runs push the summary head past the ~2000-byte tail
    window), but the surviving tail still holds complete
    ``"name": [runs...]`` fragments — the retry-pass raw_runs dict sits
    near the end. Regex those out and take the min per query, so the
    regression baseline can still see r9 instead of silently skipping
    it (VERDICT r10 action #8). Meta keys that happen to hold numeric
    lists are excluded by requiring >=2 runs and all-positive values.
    """
    minima: dict[str, float] = {}
    for m in re.finditer(r'"([a-z0-9_]+)":\s*\[([0-9.,\s]+)\]', tail):
        name, body = m.group(1), m.group(2)
        try:
            runs = [float(x) for x in body.split(",")]
        except ValueError:
            continue
        if len(runs) < 2 or any(r <= 0 for r in runs):
            continue
        lo = min(runs)
        minima[name] = min(minima.get(name, lo), lo)
    return minima


def previous_bench(repo_dir: str) -> tuple[str | None, dict[str, float]]:
    """Newest BENCH_r{N}.json that yields per-query mins.

    Walks rounds newest-first. An artifact that doesn't parse to a
    queries dict (the driver's ``parsed: null`` truncation case) falls
    back to regex-salvaging run minima from its recorded tail before
    being skipped — otherwise the regression guard silently compares
    against an older round than it should.
    """
    rounds: list[tuple[int, str]] = []
    for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    for _, path in sorted(rounds, reverse=True):
        try:
            with open(path) as f:
                data = json.load(f)
            # The driver records bench output wrapped ({"rc": ..., "tail":
            # ..., "parsed": {...}}); locally-written files are the bare
            # JSON line. Accept both.
            raw = data
            if "queries" not in data and isinstance(data.get("parsed"), dict):
                data = data["parsed"]
            queries = dict(data.get("queries", {}))
            if not queries and isinstance(raw.get("tail"), str):
                queries = _salvage_tail_minima(raw["tail"])
            if queries:
                return os.path.basename(path), queries
        except Exception:
            continue
    return None, {}


def main() -> None:
    # Ambient host load, sampled BEFORE the Spark session exists: the
    # JVM spin-up + warmup alone push the 1-minute average to ~3-4 on
    # this 32-CPU host, so load_1m_before (sampled at timing start,
    # after warmup) can never read "calm" even on an idle machine —
    # it measures bench self-load plus ambient. This field is the one
    # that answers "was the HOST calm?" (VERDICT r11 action #5).
    load_at_start = round(os.getloadavg()[0], 2)
    calm_waits = 0
    while load_at_start > CALM_START_LOAD and calm_waits < CALM_START_MAX_WAITS:
        time.sleep(CALM_START_SLEEP_S)
        calm_waits += 1
        load_at_start = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # >=3 runs so the reported min is noise-resistant: r2→r3 flagged
    # +7-19% drift on three queries that 2-run sampling couldn't
    # distinguish from host load (VERDICT.md r3, bench hygiene).
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from data_warehouse_migration_spark.catalog import REGISTRY
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {name: q for name, q in REGISTRY.items() if q.headline}

    # Warm the JVM/session once so q1 doesn't pay engine startup:
    # codegen pipeline via a trivial query, plus the parquet reader
    # stack (footer parsing, vectorized reader init) via a 1-row scan.
    # Data stays cold — only engine code paths are primed.
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    # N PASSES, each running every query once, report per-query min
    # AND per-pass totals: the first pass pays one-time
    # whole-stage-codegen compilation (~1-3s/query of JVM compiler work
    # that a long-lived cluster amortizes to zero), and any transient
    # host episode lands inside one pass — so min(pass_totals) is the
    # coherent end-to-end floor and the other entries show the band.
    def time_pass() -> tuple[
        dict[str, list[float]], list[float], float, float
    ]:
        runs_by_query: dict[str, list[float]] = {n: [] for n in headline}
        totals: list[float] = []
        before = round(os.getloadavg()[0], 2)
        for _ in range(n_runs):
            for name, q in headline.items():
                # Some queries persist() an intermediate stage (composed
                # pipelines materialize their silver layer); Spark's
                # cache is keyed by canonicalized plan, so without this
                # a repeat run would silently time the cached stage
                # instead of the full pipeline.
                spark.catalog.clearCache()
                t0 = time.time()
                q.spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs_by_query[name].append(round(time.time() - t0, 3))
            totals.append(
                round(sum(r[-1] for r in runs_by_query.values()), 3)
            )
        return runs_by_query, totals, before, round(os.getloadavg()[0], 2)

    raw_runs, pass_totals, load_before_1m, load_after_1m = time_pass()
    contended_pass: dict | None = None
    if load_before_1m > LOAD_CALM_BEFORE or load_after_1m > LOAD_CALM_AFTER:
        # Loaded host: the reading above is suspect. Record it, wait
        # out the episode, and time everything again — the min across
        # both passes is the reported number (see LOAD_CALM_* note).
        contended_pass = {
            "load_1m_before": load_before_1m,
            "load_1m_after": load_after_1m,
            "raw_runs": raw_runs,
        }
        time.sleep(CONTENTION_SLEEP_S)
        raw2, totals2, load_before_1m, load_after_1m = time_pass()
        raw_runs = {n: raw_runs[n] + raw2[n] for n in raw_runs}
        pass_totals = pass_totals + totals2

    timings: dict[str, float] = {n: min(r) for n, r in raw_runs.items()}

    prev_file, prev = previous_bench(os.path.dirname(os.path.abspath(__file__)))

    def flagged() -> list[str]:
        return [
            name
            for name, t in timings.items()
            if name in prev and prev[name] > 0 and t / prev[name] > REGRESSION_RATIO
        ]

    # Stall-resistant retry pass: this host shows episodic multi-minute
    # interference windows (SCALE.md round-6 note) — a query whose 3
    # runs all landed inside one reads 2-4× slow with an unchanged
    # plan. Before flagging a regression, give each flagged query up to
    # 3 extra runs and keep the global min. Retries SLEEP first: the
    # whole point is time diversity (later ⇒ likely outside the
    # episode), and back-to-back retries measured inside one episode
    # still flagged a verified-unchanged plan (curation_pipeline_v3,
    # r6 — both r5 and r6 code min at ~3.3-4.1 s in calm windows). A
    # REAL regression survives: its min is slow in calm windows too.
    for name in flagged():
        for _ in range(3):
            time.sleep(15)
            spark.catalog.clearCache()
            t0 = time.time()
            headline[name].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            run = round(time.time() - t0, 3)
            raw_runs[name].append(run)
            if run < timings[name]:
                timings[name] = run
            if timings[name] / prev[name] <= REGRESSION_RATIO:
                break

    regressions = {
        name: {
            "now": timings[name],
            "prev": prev[name],
            "ratio": round(timings[name] / prev[name], 2),
        }
        for name in flagged()
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Bulky evidence first (sacrificed to the driver's tail capture),
    # compact decision-grade summary as the FINAL line (always survives
    # whole — see module docstring).
    print(
        json.dumps(
            {
                "detail": {
                    "raw_runs": raw_runs,
                    # Non-null iff the first timing pass ran on a
                    # loaded host and a second calm pass was taken:
                    # holds the discarded pass's load readings + runs.
                    "contended_first_pass": contended_pass,
                }
            }
        )
    )
    # Key order is load-bearing: the tail capture keeps the END of the
    # line, so the decision-grade fields (queries, value) go LAST —
    # they survive even if an unusually long regressions map pushes
    # the line past the capture window.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "meta": {
                    "runs_per_query": n_runs,
                    # Every pass's end-to-end total: the headline
                    # "value" is min(pass_totals), and the spread here
                    # IS the host band the floor was sampled from.
                    "pass_totals": pass_totals,
                    # Continuity with rounds ≤14, whose "value" was
                    # this sum (≤ min(pass_totals) by construction).
                    "sum_of_mins": round(sum(timings.values()), 3),
                    "load_1m_at_start": load_at_start,
                    # Calm-start enforcement: how many 60 s waits the
                    # launch spent letting ambient load decay, and
                    # whether it gave up still-contended (in which
                    # case value records an episode, not a floor).
                    "calm_start_waits": calm_waits,
                    "calm_start_exhausted": load_at_start > CALM_START_LOAD,
                    "load_1m_before": load_before_1m,
                    "load_1m_after": load_after_1m,
                    # The core count the bench actually ran on: the
                    # driver sets $SPARK_GRAFT_CPUS and get_spark()
                    # builds local[$SPARK_GRAFT_CPUS] from it, so the
                    # env var (not os.cpu_count(), which always reads
                    # the host's 32 and misdescribed the 8-core
                    # control artifact BENCH_r15_c8.json) is the
                    # truthful value. Falls back to the host count
                    # when unset (local[*]).
                    "cpus": (
                        int(cpus_env)
                        if (cpus_env := os.environ.get("SPARK_GRAFT_CPUS", "")).isdigit()
                        else os.cpu_count()
                    ),
                    "baseline_file": prev_file,
                    # True iff the first timing pass was discarded for
                    # host load; its runs live on the detail line.
                    "contended_first_pass_taken": contended_pass is not None,
                },
                "regressions": regressions,
                # The floor: the best coherent single pass over all
                # headliners (VERDICT r14 what's-wrong #1).
                "value": min(pass_totals),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()


# Reference throughput framing: BASELINE.md publishes volumes/compute
# shapes only (no latencies), so cross-round deltas against our own
# BENCH_r{N}.json are the meaningful performance signal — see VERDICT
# round 1, "Performance vs baseline".
