"""Streaming-twin throughput/state rehearsal (VERDICT r9 #3): every twin
in streaming/ts_stream.py is batch-equal PINNED, but the state contracts
("scalars per key", "category-domain-bounded") were claims, not
measurements. This drives the representative stateful twins — zscore
(array-of-window state), CUSUM (two scalars), the group-sequential SPRT
(r13 — six scalars per experiment key), category-mix + JSD drift
(watermarked windowed counts), and (r11, VERDICT r10 #5) the two-sided
stream-stream interval joins (inner + left-outer: watermark + range
condition, per-side buffered state) — over a sustained synthetic
file-source stream at increasing per-batch event rates and records, per
micro-batch, the trigger latency and the state store's row/byte size.

    python tools/streaming_rehearsal.py [rates...]   # events per batch

Defaults: 20k / 200k / 1M events per micro-batch, 10 batches each
(so the top rate sustains 10M events through every operator). The
claims a flat curve certifies:

- per-batch latency does NOT grow with CUMULATIVE events (no state
  leak, no lineage growth — the iterative-trap failure mode);
- state rows equal #KEYS (zscore/cusum) or #categories x in-horizon
  windows (category mix), at every rate — never event count;
- the drift monitor's batch half (jsd_drift_report) fires exactly on
  the planted mix shift (batches 7-9 drop half the category domain).

Sinks are ``noop`` (pure execution cost, no driver materialization);
per-batch metrics come from StreamingQueryProgress. Output: ONE compact
JSON line — committed as REHEARSAL_streaming_r10.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.emit import emit  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 10
N_KEYS = 2_000
CATS = ["view", "click", "cart", "purchase", "refund", "support"]


def gen_input(spark, root: str, per_batch: int) -> str:
    """One parquet file per micro-batch; 30 min of event time per batch;
    batches 7+ collapse the category mix to half the domain (the planted
    drift the JSD monitor must flag)."""
    path = os.path.join(root, f"in_{per_batch}")
    for b in range(N_BATCHES):
        n_cats = 6 if b < 7 else 3
        df = spark.range(per_batch).select(
            (F.lit(b) * per_batch + F.col("id")).alias("event_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000 + b * 1800) + (F.col("id") % 1800)
            ).alias("ts"),
            (F.col("id") % N_KEYS).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(c) for c in CATS[:n_cats]]),
                (F.col("id") % n_cats + 1).cast("int"),
            ).alias("event_type"),
            (((F.col("id") * 2654435761) % 1000) / 1000.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        df.coalesce(1).write.mode(
            "overwrite" if b == 0 else "append"
        ).parquet(path)
    return path


def drive(stream_df, name: str) -> dict:
    """Run to exhaustion on a noop sink; per-batch latency + state size."""
    q = (
        stream_df.writeStream.format("noop")
        .queryName(name)
        .outputMode("append" if "mix" not in name else "append")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix=f"ckpt_{name}_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    batches = []
    for p in prog:
        st = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "rows": p["numInputRows"],
                "ms": p["durationMs"]["triggerExecution"],
                "state_rows": st.get("numRowsTotal"),
                "state_bytes": st.get("memoryUsedBytes"),
            }
        )
    ms = [b["ms"] for b in batches]
    return {
        "n_batches": len(batches),
        "batch_ms": ms,
        "first_ms": ms[0] if ms else None,
        "median_ms": sorted(ms)[len(ms) // 2] if ms else None,
        "last_ms": ms[-1] if ms else None,
        # the plateau claim needs the whole curve: bounded state RISES
        # for (watermark + interval) worth of batches then flattens;
        # leaking state keeps climbing with cumulative events
        "state_rows_by_batch": [b["state_rows"] for b in batches],
        "state_rows_final": batches[-1]["state_rows"] if batches else None,
        "state_rows_max": max(
            (b["state_rows"] or 0) for b in batches
        ) if batches else None,
        "state_bytes_final": batches[-1]["state_bytes"] if batches else None,
    }


def main() -> None:
    rates = [int(float(x)) for x in sys.argv[1:]] or [
        20_000, 200_000, 1_000_000,
    ]
    from ixmp_spark.session import get_spark
    from ixmp_spark.streaming.ts_stream import (
        brier_bins_stream,
        category_mix_stream,
        confusion_cells_stream,
        cusum_stream,
        interval_join_stream,
        interval_join_stream_outer,
        jsd_drift_report,
        run_available_now,
        sprt_stream,
        stream_events,
        zscore_stream,
    )

    spark = get_spark("streaming_rehearsal")
    root = tempfile.mkdtemp(prefix="stream_rehearsal_")
    out: dict = {"n_batches": N_BATCHES, "n_keys": N_KEYS, "rates": []}
    try:
        for rate in rates:
            src = gen_input(spark, root, rate)
            row: dict = {"events_per_batch": rate}

            ev = stream_events(spark, src)
            row["zscore"] = drive(zscore_stream(ev), f"z_{rate}")

            ev = stream_events(spark, src)
            row["cusum"] = drive(
                cusum_stream(ev, baseline=(0.4995, 0.2887)), f"c_{rate}"
            )

            # r13 (VERDICT r12 Next #6): the streaming SPRT — six
            # scalars of state per experiment key, so state rows must
            # equal #experiments (8) at EVERY rate, never event count
            ev = stream_events(spark, src)
            row["sprt"] = drive(
                sprt_stream(
                    ev.select(
                        (F.col("user_id") % 8).alias("experiment"),
                        "ts",
                        (F.col("value") > 0.5).cast("double").alias("y"),
                    ),
                    p0=0.45,
                    p1=0.55,
                    grain="hour",
                ),
                f"sprt_{rate}",
            )

            # r14 (VERDICT r13 #6): the eval-metric twins — state keyed
            # by the CELL, so rows must equal |models|·|classes|² (≤
            # 4·6·6 = 144) for the confusion grid and |experiments|·
            # n_bins (8·10 = 80) for the calibration grid, at every
            # rate, never event count
            ev = stream_events(spark, src)
            row["confusion_cells"] = drive(
                confusion_cells_stream(
                    ev.select(
                        (F.col("user_id") % 4).alias("model"),
                        "ts",
                        F.col("event_type").alias("label"),
                        # a noisy classifier: wrong when value < 0.3
                        F.when(
                            F.col("value") < 0.3, F.lit("view")
                        ).otherwise(F.col("event_type")).alias("pred"),
                    ),
                    key_col="model",
                    grain="hour",
                ),
                f"conf_{rate}",
            )

            ev = stream_events(spark, src)
            row["brier_bins"] = drive(
                brier_bins_stream(
                    ev.select(
                        (F.col("user_id") % 8).alias("experiment"),
                        "ts",
                        F.col("value").alias("p"),
                        (F.col("value") > 0.45).cast("double").alias("y"),
                    ),
                    key_col="experiment",
                    grain="hour",
                ),
                f"brier_{rate}",
            )

            ev = stream_events(spark, src)
            row["category_mix"] = drive(
                category_mix_stream(ev), f"mix_{rate}"
            )

            # stream-stream interval joins (VERDICT r10 #5): the
            # riskiest state class — two-sided watermark + range
            # condition. The contract under sustained rate: per-side
            # buffered rows are bounded by rate x (watermark +
            # interval) of IN-WATERMARK rows — a plateau after ~4
            # batches (1 h watermark + 30 min interval over 30-min
            # batches), never cumulative events. Left/right from
            # SEPARATE readStream instances (the operators' caller
            # contract). view->click pairs: both types exist in every
            # batch incl. the post-drift half-domain batches.
            evl = stream_events(spark, src)
            evr = stream_events(spark, src)
            row["interval_join"] = drive(
                interval_join_stream(
                    evl.where(F.col("event_type") == "view"),
                    evr.where(F.col("event_type") == "click"),
                    interval="30 minutes",
                    watermark="1 hour",
                ),
                f"ij_{rate}",
            )
            evl = stream_events(spark, src)
            evr = stream_events(spark, src)
            row["interval_join_outer"] = drive(
                interval_join_stream_outer(
                    evl.where(F.col("event_type") == "view"),
                    evr.where(F.col("event_type") == "click"),
                    interval="30 minutes",
                    watermark="1 hour",
                ),
                f"ijo_{rate}",
            )
            # drift half: re-run the mix into a memory sink (tiny table:
            # windows x categories) and fold the JSD report over it
            ev = stream_events(spark, src)
            mix = run_available_now(
                category_mix_stream(ev), f"mixtbl_{rate}", mode="complete"
            )
            # the report self-joins its input; a memory-sink table's
            # attributes conflict under that — snap the (tiny:
            # windows x categories) table out of the sink's lineage
            mix = mix.localCheckpoint(eager=True)
            ref = spark.createDataFrame(
                [(c, 1.0 / 6) for c in CATS], "category string, ref_p double"
            )
            rep = jsd_drift_report(mix, ref, threshold=0.1).orderBy(
                "window_start"
            )
            rows = rep.collect()
            row["drift"] = {
                "n_windows": len(rows),
                "n_drifted": sum(1 for r in rows if r["is_drift"]),
                "jsd_norm_by_window": [
                    round(float(r["jsd_norm"]), 4) for r in rows
                ],
            }
            out["rates"].append(row)
            print(f"-- rate {rate} done", file=sys.stderr)
        emit(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
