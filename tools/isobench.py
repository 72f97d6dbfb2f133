"""Isolated-warm re-measure of bench entries — the MISS protocol tool.

bench.py's pins are calibrated from ISOLATED baselines (dedicated
session, n>=3 reps, cold rep dropped); a full-bench pin MISS is only a
real regression if it reproduces here (bench.py:50-53). This tool runs
any subset of entries in a dedicated session with the same per-rep
hygiene the bench applies (cache clear + JVM GC), prints every rep and
the warm median, and — with --profile — re-runs the last rep on a
UI-enabled session and prints the per-SQL-execution wall breakdown
(the scrape used for the round-13 phase attributions).

Usage:
    python tools/isobench.py [--reps N] [--profile] ENTRY [ENTRY ...]

ENTRY is any bench entry name: a queries() registry entry (timed with
the noop sink like the bench HEADLINE section), an odf_transform_*
single invocation, a stress_*_x10_3inv chained-invocation entry, or a
stamp_2m_* twin. Timings are wall seconds, same methodology as bench.py
(this tool exists so adjudication does not require a full suite run);
it changes nothing and writes nothing under the repo.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (module-level SQL constants + harness helpers)
import __spark_entry__ as entrymod  # noqa: E402
from kamu_engine_flink_spark.session import engine_session  # noqa: E402


def _parse_args(argv):
    reps, profile, as_json, names = 5, False, False, []
    it = iter(argv)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--profile":
            profile = True
        elif a == "--json":
            # One JSON object per entry on stdout (human lines move to
            # stderr) — the machine mode bench.py's pin-miss
            # self-adjudication consumes.
            as_json = True
        else:
            names.append(a)
    if not names:
        print(__doc__)
        raise SystemExit(2)
    return reps, profile, as_json, names


def _hygiene(spark):
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


class _Runner:
    """Lazily builds the bench's fixture ledgers once per session."""

    def __init__(self, spark, sf_dir, workdir):
        self.spark, self.sf_dir, self.workdir = spark, sf_dir, workdir
        self._cache = {}

    def _ledger(self, name, event_type=None, user_mod=None):
        key = (name, event_type, user_mod)
        if key not in self._cache:
            self._cache[key] = bench._odf_ledger(
                self.spark, self.sf_dir, self.workdir, name,
                event_type, user_mod=user_mod,
            )
        return self._cache[key]

    def _slices(self, name="events", event_type=None):
        key = ("x10", name, event_type)
        if key not in self._cache:
            if event_type is None:
                self._cache[key] = bench._x10_sliced_ledgers(
                    self.spark, self.sf_dir, self.workdir
                )
            else:
                self._cache[key] = bench._x10_sliced_ledgers(
                    self.spark, self.sf_dir, self.workdir, name, event_type
                )
        return self._cache[key]

    def _join_invs(self):
        p = self._slices("purchases", "purchase")
        c = self._slices("clicks", "click")
        return [
            [("purchases", pp, pwm), ("clicks", cp, cwm)]
            for (pp, pwm), (cp, cwm) in zip(p, c)
        ]

    # --- entry resolution -------------------------------------------------
    # Mirrors the (tag, sql, inputs) tables inline in bench.main(); kept in
    # one place here so a bench change shows up as a loud KeyError, not a
    # silently stale measurement.
    def run_once(self, name: str) -> float:
        qs = entrymod.queries()
        if name in qs:
            df = qs[name](self.spark, self.sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        if name.startswith("stress_") and name != "stress_minhash_cluster_x10":
            sqls = {
                "stress_interval_join_x10_3inv": bench.JOIN_SQL,
                "stress_full_join_x10_3inv": bench.FULL_JOIN_SQL,
                "stress_keyed_topn_x10_3inv": bench.KEYED_TOPN_SQL,
                "stress_over_agg_x10_3inv": bench.OVER_AGG_SQL,
                "stress_match_recognize_x10_3inv": bench.MATCH_RECOGNIZE_SQL,
                "stress_changelog_topn_x10_3inv": bench.CHANGELOG_TOPN_STEPS,
                "stress_changelog_stamp_x10_3inv": bench.CHANGELOG_STAMP_STEPS,
                "stress_changelog_asof_x10_3inv": bench.CHANGELOG_ASOF_STEPS,
                "stress_setop_except_x10_3inv": bench.SETOP_EXCEPT_STEPS,
            }
            sql = sqls[name]
            if name in (
                "stress_interval_join_x10_3inv",
                "stress_full_join_x10_3inv",
                "stress_changelog_asof_x10_3inv",
                "stress_setop_except_x10_3inv",
            ):
                invs = self._join_invs()
            elif name == "stress_changelog_topn_x10_3inv":
                invs = [
                    [("purchases", pp, pwm)]
                    for (pp, pwm) in self._slices("purchases", "purchase")
                ]
            else:
                invs = [[("events", p, wm)] for (p, wm) in self._slices()]
            tts = (
                [("rates", "user_id")]
                if sql is bench.CHANGELOG_ASOF_STEPS
                else ()
            )
            tag = f"{name}-iso{time.monotonic_ns()}"
            return bench._stress_transform_x10(
                self.spark, invs, sql, self.workdir, tag, temporal_tables=tts
            )

        if name == "stress_minhash_cluster_x10":
            return bench._stress_dedup_cluster(self.spark, self.sf_dir)

        if name.startswith("stamp_2m_"):
            return self._stamp_2m(forced=name.endswith("serial_forced"))

        raise KeyError(
            f"unknown entry {name!r} (not in queries() and no stress/stamp "
            f"mapping here — if bench.py gained an entry, add it above)"
        )

    def _stamp_2m(self, forced: bool) -> float:
        key = "stamp2m"
        if key not in self._cache:
            from pyspark.sql import functions as F

            from kamu_engine_flink_spark.sinks.parquet import (
                write_single_parquet,
            )

            ev = self.spark.read.parquet(f"{self.sf_dir}/events.parquet")
            big = (
                ev.crossJoin(
                    self.spark.range(20).select(F.col("id").alias("__rep"))
                ).select(
                    (F.col("event_id") * 20 + F.col("__rep")).alias("offset"),
                    F.lit(0).cast("int").alias("op"),
                    F.to_timestamp(F.lit("2020-01-01 00:00:00")).alias(
                        "system_time"
                    ),
                    F.col("ts").alias("event_time"),
                    F.concat(
                        F.col("user_id"), F.lit("#"), F.col("__rep"),
                        F.lit("#"), F.col("event_id"),
                    ).alias("k"),
                    F.floor(F.col("value") * 100).cast("long").alias("v"),
                )
            )
            path = os.path.join(self.workdir, "stamp2m.parquet")
            write_single_parquet(big, path)
            wm = (
                self.spark.read.parquet(path)
                .agg({"event_time": "max"})
                .collect()[0][0]
            )
            self._cache[key] = (path, wm)
        path, wm = self._cache[key]
        steps = [
            (
                "g",
                """SELECT cast(now() as timestamp(3)) as event_time,
  k, sum(v) as s FROM a GROUP BY k""",
            ),
            (None, "SELECT event_time, k, s FROM g"),
        ]
        if forced:
            self.spark.conf.set("spark.kamu.stampDistributedMinRows", str(1 << 60))
        try:
            return bench._stress_transform_x10(
                self.spark, [[("a", path, wm)]], steps, self.workdir,
                f"stamp2m-iso{time.monotonic_ns()}",
            )
        finally:
            if forced:
                self.spark.conf.unset("spark.kamu.stampDistributedMinRows")


def _sql_execs(ui, app_id):
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/sql?length=100000"
        )
    )


def main() -> None:
    reps, profile, as_json, names = _parse_args(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {"spark.ui.enabled": "true"} if profile else None
    spark = engine_session(app_name="isobench", extra_conf=extra)
    # Same session warmers as bench.main().
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import lit

    from kamu_engine_flink_spark.functions.minhash_pandas import (
        minhash_signature_fast,
        shingle_hashes_fast,
    )

    spark.range(0, 1000, 1, 32).select(
        shingle_hashes_fast(lit("warm up text"), 3),
        minhash_signature_fast(lit("warm up text"), 64, 3),
    ).count()

    ui = app_id = None
    if profile:
        ui = spark.sparkContext.uiWebUrl
        app_id = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications")
        )[0]["id"]

    workdir = tempfile.mkdtemp(prefix="isobench-")
    try:
        runner = _Runner(spark, sf_dir, workdir)
        for name in names:
            runs, pre_ids = [], set()
            for i in range(reps):
                _hygiene(spark)
                if profile and i == reps - 1:
                    pre_ids = {s["id"] for s in _sql_execs(ui, app_id)}
                runs.append(round(runner.run_once(name), 3))
            warm = runs[1:] or runs
            warm_median = round(statistics.median(warm), 3)
            print(
                f"{name}: runs={runs} warm_median={warm_median}",
                file=sys.stderr if as_json else sys.stdout,
            )
            if as_json:
                print(json.dumps(
                    {"entry": name, "runs": runs, "warm_median": warm_median}
                ))
                sys.stdout.flush()
            if profile:
                recent = [
                    s for s in _sql_execs(ui, app_id) if s["id"] not in pre_ids
                ]
                recent.sort(key=lambda s: -s["duration"])
                tot = sum(s["duration"] for s in recent) / 1000
                print(
                    f"  last rep: {len(recent)} SQL execs, sum {tot:.2f}s "
                    f"(sum >> wall means overlapped writes)"
                )
                for s in recent:
                    if s["duration"] < 80:
                        continue
                    d = s.get("description", "")[:80].replace("\n", " ")
                    print(f"    {s['duration']/1000:7.2f}s  {d}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
