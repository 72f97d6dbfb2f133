"""Drain-determinism of the availableNow twin harness (round-12 verdict
ask #1).

The banded twin entries attribute each output row to run 1 or run 2 by
which `run_available_now` call produced its file; the oracle pins
attribution to "the first run whose watermark covers the probe". That
equivalence holds only if every run drains — i.e. executes a batch at
its final watermark so all releasable event-time timeouts fire before
termination. The round-12 driver saw a run-1-eligible probe slip to run
2 under load (equal row counts, flipped `inv`, red hash).

These tests force that race DETERMINISTICALLY by disabling
`spark.sql.streaming.noDataMicroBatches` for the duration of the test:
with the trailing no-data batch suppressed on EVERY run, an undrained
harness misattributes on every run, not one driver run in fifty. This
is strictly stronger than the probabilistic loaded-session replay the
verdict sketched: the failure condition (final no-data batch skipped)
is forced rather than hoped for. Empirical facts the drain design rests
on (see `_run_available_now`):

  - a bare availableNow restart with NO new input constructs no batch
    at all, so "restart until no new files" alone cannot drain;
  - a zero-row tick parquet in an input dir forces a batch in which the
    checkpoint-restored watermark fires every pending timeout;
  - `_`/`.`-prefixed tick names are hidden to the file source and force
    no releasing batch — the tick must be a plainly-named file.

Reference parity: the kernel under test is the streaming twin of the
updating-probe temporal join (reference surface via Flink planner
delegation, TransformEngine.scala:252-262).
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kamu_engine_flink_spark.streaming.structured import (
    StreamingAsOfJoin,
    StreamingChangelogProbeAsOfJoin,
    StreamingWindowAgg,
    _job_input_dirs,
)

UTC = dt.timezone.utc


def _ts(hhmm: str) -> dt.datetime:
    h, m = hhmm.split(":")
    return dt.datetime(2024, 1, 1, int(h), int(m), tzinfo=UTC)


def _ms(hhmm: str) -> int:
    return int(_ts(hhmm).timestamp() * 1000)


def _write_versions(path: str, rows: list[tuple[int, str, float]]) -> None:
    pq.write_table(
        pa.table(
            {
                "pk": pa.array([r[0] for r in rows], pa.int64()),
                "event_time": pa.array(
                    [_ts(r[1]) for r in rows], pa.timestamp("ms", tz="UTC")
                ),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        path,
        compression="snappy",
    )


def _write_probes(path: str, rows: list[tuple[int, str, float, int, int]]) -> None:
    pq.write_table(
        pa.table(
            {
                "pk": pa.array([r[0] for r in rows], pa.int64()),
                "event_time": pa.array(
                    [_ts(r[1]) for r in rows], pa.timestamp("ms", tz="UTC")
                ),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "op": pa.array([r[3] for r in rows], pa.int32()),
                "seq": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        path,
        compression="snappy",
    )


@pytest.fixture()
def forced_race(spark):
    """Suppress trailing no-data batches: every availableNow run now
    terminates without firing the timeouts its own watermark advance
    armed — the exact condition the round-12 driver hit by timing."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield spark
    spark.conf.set(key, old)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("v", "p", "chk", "out")}
    for k in ("v", "p"):
        os.makedirs(d[k])
    return d


def _read_runs(spark, out_dir: str, files1: set[str]) -> tuple[set, set]:
    files2 = set(glob.glob(os.path.join(out_dir, "*.parquet"))) - files1

    def rows(files):
        nonempty = [f for f in files if pq.ParquetFile(f).metadata.num_rows]
        if not nonempty:
            return set()
        df = spark.read.parquet(*sorted(nonempty))
        has_op = "op" in df.columns
        return {
            (r.op if has_op else 0, r.pk, r.probe_ts_ms, r.probe_val, r.version_val)
            for r in df.collect()
        }

    return rows(files1), rows(files2)


def test_probe_asof_twin_attribution_under_forced_race(forced_race, dirs):
    """Two banded runs with the no-data batch suppressed on BOTH: run
    attribution must still match the watermark law (run 1 = probes at or
    below wm1 = min of the band-1 stream maxima). Without the drain loop
    this scenario emits run 1's rows in run 2 — the exact red-row
    signature from CORRECTNESS_r12."""
    spark = forced_race
    job = StreamingChangelogProbeAsOfJoin(
        version_dir=dirs["v"], probe_dir=dirs["p"],
        checkpoint_dir=dirs["chk"], output_dir=dirs["out"],
        pk_col="pk", how="inner",
    )
    # band 1: wm1 = min(max_v 02:00, max_p 03:00) = 02:00
    _write_versions(os.path.join(dirs["v"], "b1.parquet"),
                    [(1, "00:00", 10.0), (1, "02:00", 20.0)])
    _write_probes(
        os.path.join(dirs["p"], "b1.parquet"),
        [
            (1, "01:00", 100.0, 0, 2),   # releasable in run 1
            (1, "01:30", 100.0, 2, 4),   # correction pair, run 1
            (1, "01:30", 150.0, 3, 5),
            (1, "03:00", 150.0, 2, 6),   # above wm1 -> buffers to run 2
            (1, "03:00", 200.0, 3, 7),
        ],
    )
    # Schemas must be pinned before the first run (no tick inference drift).
    job.version_schema = spark.read.parquet(dirs["v"]).schema
    job.probe_schema = spark.read.parquet(dirs["p"]).schema
    job.run_available_now(spark)
    files1 = set(glob.glob(os.path.join(dirs["out"], "*.parquet")))

    # band 2: wm2 = min(max_v 04:00, max_p 03:30) = 03:30
    _write_versions(os.path.join(dirs["v"], "b2.parquet"), [(1, "04:00", 40.0)])
    _write_probes(os.path.join(dirs["p"], "b2.parquet"),
                  [(1, "03:30", 300.0, 0, 8)])
    job.run_available_now(spark)
    run1, run2 = _read_runs(spark, dirs["out"], files1)

    assert run1 == {
        (0, "1", _ms("01:00"), 100.0, 10.0),
        (2, "1", _ms("01:30"), 100.0, 10.0),
        (3, "1", _ms("01:30"), 150.0, 10.0),
    }
    assert run2 == {
        (2, "1", _ms("03:00"), 150.0, 20.0),
        (3, "1", _ms("03:00"), 200.0, 20.0),
        (0, "1", _ms("03:30"), 300.0, 20.0),
    }
    # The drain engaged (run 1's own trailing batch was suppressed, so
    # tick files must exist) and converged (bounded count).
    ticks = glob.glob(os.path.join(dirs["v"], "drain-tick-*.parquet"))
    assert 1 <= len(ticks) <= 4


def test_asof_twin_drained_result_matches_normal_run(spark, dirs, tmp_path):
    """The same banded scenario run twice — once on a normal session
    (trailing no-data batches enabled; drain fast-path) and once under
    the forced race (drain tick-path) — must produce identical per-run
    row sets: the drain changes WHEN rows flush, never what or where."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"

    def scenario(v_dir, p_dir, chk, out):
        _write_versions(os.path.join(v_dir, "b1.parquet"),
                        [(7, "00:00", 1.0), (7, "02:00", 2.0)])
        pq.write_table(
            pa.table(
                {
                    "pk": pa.array([7, 7], pa.int64()),
                    "event_time": pa.array(
                        [_ts("01:00"), _ts("03:00")], pa.timestamp("ms", tz="UTC")
                    ),
                    "value": pa.array([10.0, 20.0], pa.float64()),
                }
            ),
            os.path.join(p_dir, "b1.parquet"),
        )
        job = StreamingAsOfJoin(
            version_dir=v_dir, probe_dir=p_dir, checkpoint_dir=chk,
            output_dir=out, pk_col="pk", how="inner",
            version_schema=spark.read.parquet(v_dir).schema,
            probe_schema=spark.read.parquet(p_dir).schema,
        )
        job.run_available_now(spark)
        files1 = set(glob.glob(os.path.join(out, "*.parquet")))
        _write_versions(os.path.join(v_dir, "b2.parquet"), [(7, "04:00", 3.0)])
        pq.write_table(
            pa.table(
                {
                    "pk": pa.array([7], pa.int64()),
                    "event_time": pa.array([_ts("03:30")], pa.timestamp("ms", tz="UTC")),
                    "value": pa.array([30.0], pa.float64()),
                }
            ),
            os.path.join(p_dir, "b2.parquet"),
        )
        job.run_available_now(spark)
        return _read_runs(spark, out, files1)

    results = {}
    old = spark.conf.get(key, "true")
    try:
        for label, conf in (("normal", "true"), ("raced", "false")):
            spark.conf.set(key, conf)
            base = tmp_path / label
            d = {k: str(base / k) for k in ("v", "p", "chk", "out")}
            for k in ("v", "p"):
                os.makedirs(d[k])
            results[label] = scenario(d["v"], d["p"], d["chk"], d["out"])
    finally:
        spark.conf.set(key, old)
    assert results["normal"] == results["raced"]
    assert results["normal"][0]  # run 1 non-empty: the law is exercised


def test_job_input_dirs_reflection(tmp_path):
    two = StreamingChangelogProbeAsOfJoin(
        version_dir="/a/v", probe_dir="/a/p",
        checkpoint_dir="/a/chk", output_dir="/a/out",
    )
    assert _job_input_dirs(two) == ("/a/v", "/a/p")
    one = StreamingWindowAgg(
        input_dir="/b/in", checkpoint_dir="/b/chk", output_dir="/b/out"
    )
    assert _job_input_dirs(one) == ("/b/in",)


def test_over_agg_twin_drained_matches_normal_run(spark, tmp_path):
    """Forced-race drain regression for the MICROSECOND-path kernel
    (StreamingOverAgg arms its event-time timeout from µs row times
    floored to ms, clamped to the current watermark): the same banded
    scenario under a normal session and under the forced race must
    produce identical per-run row sets."""
    from kamu_engine_flink_spark.streaming.structured import StreamingOverAgg

    key = "spark.sql.streaming.noDataMicroBatches.enabled"

    def scenario(base):
        ind, chk, out = [str(base / k) for k in ("in", "chk", "out")]
        os.makedirs(ind)
        rows1 = [(5, "01:00", 10.0), (5, "02:00", 20.0), (5, "04:00", 40.0)]
        rows2 = [(5, "05:00", 50.0), (5, "07:00", 70.0)]

        def write(rows, name):
            pq.write_table(
                pa.table(
                    {
                        "k": pa.array([r[0] for r in rows], pa.int64()),
                        "event_time": pa.array(
                            [_ts(r[1]) for r in rows],
                            pa.timestamp("ms", tz="UTC"),
                        ),
                        "value": pa.array([r[2] for r in rows], pa.float64()),
                    }
                ),
                os.path.join(ind, name),
            )

        write(rows1, "b1.parquet")
        job = StreamingOverAgg(
            input_dir=ind, checkpoint_dir=chk, output_dir=out,
            frame="2 hours", partition_col="k",
            watermark_delay="1 minute",
        )
        job.schema = spark.read.parquet(ind).schema
        job.run_available_now(spark)
        files1 = set(glob.glob(os.path.join(out, "*.parquet")))
        write(rows2, "b2.parquet")
        job.run_available_now(spark)
        files2 = set(glob.glob(os.path.join(out, "*.parquet"))) - files1

        def rows(files):
            nonempty = [f for f in files if pq.ParquetFile(f).metadata.num_rows]
            if not nonempty:
                return set()
            return {
                (r.key, r.event_time, r.value, r.roll_sum, r.roll_cnt)
                for r in spark.read.parquet(*sorted(nonempty)).collect()
            }

        return rows(files1), rows(files2)

    results = {}
    old = spark.conf.get(key, "true")
    try:
        for label, conf in (("normal", "true"), ("raced", "false")):
            spark.conf.set(key, conf)
            base = tmp_path / label
            os.makedirs(base)
            results[label] = scenario(base)
    finally:
        spark.conf.set(key, old)
    assert results["normal"] == results["raced"]
    assert results["normal"][0], "run 1 emitted nothing — law not exercised"
