"""applyInPandasWithState: per-polygon EMA matches a pandas oracle and
state persists across restarts via the checkpoint."""

import datetime as dt

import pandas as pd
import pytest

from dea_conflux_spark.streaming import stateful


def _obs(poly, day, v):
    return (poly, dt.datetime(2021, 1, day), v)


@pytest.fixture()
def obs_dir(spark, tmp_path):
    p = str(tmp_path / "obs")
    rows = [_obs("pA", d, v) for d, v in
            [(1, 0.1), (2, 0.5), (3, 0.3), (4, 0.9)]]
    rows += [_obs("pB", d, v) for d, v in [(1, 1.0), (2, 0.0)]]
    spark.createDataFrame(rows, stateful.OBS_SCHEMA).coalesce(1) \
        .write.parquet(p)
    return p


def _ema(vals, alpha=0.3):
    e = None
    for v in vals:
        e = v if e is None else alpha * v + (1 - alpha) * e
    return e


def test_ema_matches_pandas_oracle(spark, obs_dir, tmp_path):
    q = stateful.polygon_wetness_ema(spark, obs_dir,
                                     str(tmp_path / "ck"), "ema1")
    q.awaitTermination(120)
    out = spark.sql("select * from ema1").toPandas()
    last = out.groupby("poly_id").last()
    assert last.loc["pA", "ema_pc_wet"] == pytest.approx(
        _ema([0.1, 0.5, 0.3, 0.9]))
    assert last.loc["pB", "ema_pc_wet"] == pytest.approx(_ema([1.0, 0.0]))
    assert last.loc["pA", "n_obs"] == 4


def test_state_survives_restart(spark, obs_dir, tmp_path):
    ck = str(tmp_path / "ck2")
    sink = str(tmp_path / "sink")
    q = stateful.polygon_wetness_ema(spark, obs_dir, ck, sink_path=sink)
    q.awaitTermination(120)
    # new files arrive; restart with same checkpoint continues the state
    more = [("pA", dt.datetime(2021, 1, 5), 0.0)]
    spark.createDataFrame(more, stateful.OBS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(obs_dir)
    q2 = stateful.polygon_wetness_ema(spark, obs_dir, ck, sink_path=sink)
    q2.awaitTermination(120)
    out = spark.read.parquet(sink).toPandas()
    pa = out[out.poly_id == "pA"].sort_values("n_obs").iloc[-1]
    assert pa["n_obs"] == 5
    assert pa["ema_pc_wet"] == pytest.approx(
        _ema([0.1, 0.5, 0.3, 0.9, 0.0]))
