"""Custom stateful streaming operator: per-polygon running EMA of wet
fraction over the observation stream.

Demonstrates the engine's arbitrary-stateful surface
(``applyInPandasWithState`` — input_hint: 'applyInPandasWithState for
custom stateful operators'): state = (last EMA, n observations) per
polygon, updated per micro-batch in event-time order, emitted in update
mode.  The reference has no true streaming state (SURVEY.md §2.I); this
is the engine-native extension for NRT monitoring dashboards.
"""

from __future__ import annotations

import pandas as pd

OBS_SCHEMA = ("poly_id string, ts timestamp, pc_wet double")
OUT_SCHEMA = ("poly_id string, ema_pc_wet double, n_obs long")
STATE_SCHEMA = "ema double, n long"


def ema_update_fn(alpha: float):
    def update(key, pdfs, state):
        if state.exists:
            ema, n = state.get
        else:
            ema, n = None, 0
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for v in rows["pc_wet"]:
            if v is None or pd.isna(v):
                continue
            ema = float(v) if ema is None else alpha * float(v) \
                + (1 - alpha) * ema
            n += 1
        state.update((ema, n))
        yield pd.DataFrame({"poly_id": [key[0]], "ema_pc_wet": [ema],
                            "n_obs": [n]})

    return update


def polygon_wetness_ema(spark, obs_path: str, checkpoint: str,
                        query_name: str = "wet_ema", alpha: float = 0.3,
                        sink_path: str | None = None):
    """Start the stateful query over a parquet-file observation stream.

    With ``sink_path`` the updates append to parquet via foreachBatch —
    the durable sink that supports checkpoint RECOVERY (a restarted query
    resumes the per-polygon state); otherwise updates land in the
    in-memory table ``query_name`` (inspection only — the memory sink
    cannot recover from a checkpoint)."""
    stream = (spark.readStream.schema(OBS_SCHEMA)
              .option("maxFilesPerTrigger", 4).parquet(obs_path))
    out = stream.groupBy("poly_id").applyInPandasWithState(
        ema_update_fn(alpha), OUT_SCHEMA, STATE_SCHEMA,
        "update", "NoTimeout")
    if sink_path is not None:
        def write_batch(df, epoch_id):
            df.write.mode("append").parquet(sink_path)

        writer = (out.writeStream.outputMode("update")
                  .foreachBatch(write_batch))
    else:
        writer = (out.writeStream.outputMode("update").format("memory")
                  .queryName(query_name))
    return (writer.option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
