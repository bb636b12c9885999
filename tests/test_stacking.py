"""Stacking-suite tests (reference tests/test_stack.py parity: the 8-obs →
4-row dedup fixture, WIT normalisation, rounding)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dea_conflux_spark.operators import stacking


@pytest.fixture()
def dup_scenario(spark):
    """FIXTURES.md T5: one polygon, 8 observations -> 4 survivors."""
    P = "r3bz75m73"
    rows = [
        # same-day pair 1: keep pc_missing=0.05
        (P, dt.datetime(2021, 1, 5, 1, 0, 0), 10.0, 0.5, 0.30),
        (P, dt.datetime(2021, 1, 5, 9, 0, 0), 12.0, 0.6, 0.05),
        # same-day pair 2: keep pc_missing=0.00
        (P, dt.datetime(2021, 2, 1, 2, 0, 0), 20.0, 0.7, 0.00),
        (P, dt.datetime(2021, 2, 1, 22, 0, 0), 21.0, 0.8, 0.90),
        # midnight-wrap pair A (24 s apart): drop the earlier row
        (P, dt.datetime(2021, 3, 9, 23, 59, 54), 30.0, 0.1, 0.01),
        (P, dt.datetime(2021, 3, 10, 0, 0, 18), 31.0, 0.2, 0.02),
        # midnight-wrap pair B
        (P, dt.datetime(2021, 4, 20, 23, 59, 54), 40.0, 0.3, 0.03),
        (P, dt.datetime(2021, 4, 21, 0, 0, 18), 41.0, 0.4, 0.04),
    ]
    return spark.createDataFrame(
        rows, "poly_id string, ts timestamp, px_wet double, pc_wet double, "
              "pc_missing double")


def test_dedup_8_to_4(dup_scenario):
    out = stacking.dedup_timeseries(dup_scenario).toPandas()
    out = out.sort_values("ts").reset_index(drop=True)
    assert len(out) == 4
    assert list(out["px_wet"]) == [12.0, 20.0, 31.0, 41.0]


def test_dedup_keeps_best_quality(dup_scenario):
    out = stacking.dedup_timeseries(dup_scenario).toPandas()
    jan = out[out["ts"].dt.month == 1]
    assert len(jan) == 1 and jan.iloc[0]["pc_missing"] == 0.05


def test_wit_normalise(spark):
    df = spark.createDataFrame(
        [(0.2, 0.1, 60.0, 30.0, 30.0),  # total=120 -> normalised
         (0.2, 0.1, 0.0, 0.0, 0.0)],    # total=0 -> untouched
        "water double, wet double, pv double, npv double, bs double")
    out = stacking.wit_normalise(df).toPandas()
    veg = 1 - 0.2 - 0.1
    assert out.loc[0, "norm_pv"] == pytest.approx(60.0 / 120.0 * veg)
    assert out.loc[0, "norm_npv"] == pytest.approx(30.0 / 120.0 * veg)
    assert out.loc[1, "norm_pv"] == 0.0


def test_round_metrics(spark):
    df = spark.createDataFrame([(1.23456789,)], "v double")
    out = stacking.round_metrics(df, ["v"], 4).toPandas()
    assert out.loc[0, "v"] == 1.2346


def test_waterbodies_dim_geohash(spark, polygons):
    dim = stacking.waterbodies_dim(polygons).toPandas()
    assert len(dim) == polygons.count()
    assert dim["centroid_lat"].between(-90, 90).all()
    assert dim["centroid_lon"].between(-180, 180).all()


def test_stack_waterbodies_partitioned_csv(dup_scenario, tmp_path):
    out = str(tmp_path / "stacked")
    stacking.stack_waterbodies(dup_scenario, out)
    import glob
    parts = glob.glob(f"{out}/poly_id=*/*.csv")
    assert parts, "expected hive-partitioned per-polygon csv output"
    df = pd.concat([pd.read_csv(p) for p in parts])
    assert len(df) == 4


def test_single_file_delivery(dup_scenario, tmp_path):
    out = str(tmp_path / "delivery")
    stacking.single_file_delivery(dup_scenario, out,
                                  ["px_wet", "pc_wet", "pc_missing"],
                                  precision=2)
    import glob
    csvs = glob.glob(f"{out}/csv/*.csv")
    assert len(csvs) == 1  # coalesced single file
    df = pd.read_csv(csvs[0])
    assert len(df) == 8 and round(df["pc_wet"].iloc[0], 2) == df["pc_wet"].iloc[0]


@pytest.fixture()
def wit_dup_scenario(spark):
    """WIT analogue of the duplicate fixture (reference
    tests/test_stack.py:112-124 semantics): one polygon, 8 WIT drill rows
    (two same-day pairs + two midnight-wrap pairs) -> 4 survivors."""
    P = "r3bz75m73"
    rows = []
    for k, (ts, keepme) in enumerate([
        (dt.datetime(2021, 1, 5, 1, 0, 0), False),
        (dt.datetime(2021, 1, 5, 9, 0, 0), True),    # lower pc_missing
        (dt.datetime(2021, 2, 1, 2, 0, 0), True),
        (dt.datetime(2021, 2, 1, 22, 0, 0), False),
        (dt.datetime(2021, 3, 9, 23, 59, 54), False),  # wrap: earlier drops
        (dt.datetime(2021, 3, 10, 0, 0, 18), True),
        (dt.datetime(2021, 4, 20, 23, 59, 54), False),
        (dt.datetime(2021, 4, 21, 0, 0, 18), True),
    ]):
        pv, npv, bs = 0.5 + 0.01 * k, 0.2, 0.3
        rows.append((P, ts, 0.10, 0.05, pv, npv, bs,
                     0.01 if keepme else 0.50))
    return spark.createDataFrame(
        rows, "poly_id string, ts timestamp, water double, wet double, "
              "pv double, npv double, bs double, pc_missing double")


def test_stack_wit_end_to_end(wit_dup_scenario, tmp_path):
    """WIT stack parity: dedup (8 -> 4) + normalisation + per-uid CSV in
    one pipeline, values allclose vs an independent pandas oracle
    implementing reference save_df_as_csv:254-286."""
    import glob

    import numpy as np

    out = str(tmp_path / "wit_stacked")
    stacking.stack_wit(wit_dup_scenario, out)
    parts = glob.glob(f"{out}/poly_id=*/*.csv")
    assert len(parts) >= 1
    got = pd.concat([pd.read_csv(p) for p in parts]).sort_values(
        "ts").reset_index(drop=True)
    assert len(got) == 4

    # pandas oracle: quality day-dedup + 60 s rule, then normalisation
    pdf = wit_dup_scenario.toPandas().sort_values("ts")
    pdf["day"] = pdf["ts"].dt.strftime("%Y-%m-%d")
    best = (pdf.sort_values(["pc_missing", "ts"])
            .drop_duplicates("day", keep="first").sort_values("ts"))
    nxt = best["ts"].shift(-1)
    keep = nxt.isna() | ((nxt - best["ts"]).dt.total_seconds() >= 60)
    exp = best[keep].reset_index(drop=True)
    veg = 1 - exp["water"] - exp["wet"]
    total = exp["pv"] + exp["npv"] + exp["bs"]
    for band in ("pv", "npv", "bs"):
        exp[f"norm_{band}"] = np.where(total != 0,
                                       exp[band] / total * veg, exp[band])
    got_ts = pd.to_datetime(got["ts"], utc=True).dt.tz_localize(None)
    assert list(got_ts) == list(exp["ts"])
    for band in ("pv", "npv", "bs"):
        np.testing.assert_allclose(got[f"norm_{band}"], exp[f"norm_{band}"],
                                   rtol=1e-9, err_msg=band)
    # the reference CSV column complement (feature_id == hive partition key)
    assert {"water", "wet", "pv", "npv", "bs", "pc_missing",
            "norm_pv", "norm_npv", "norm_bs", "ts"} <= set(got.columns)


def test_db_to_csv_sharded(spark, tmp_path):
    """Sharded export: 5 polygons split into 2 chunks (np.array_split
    semantics: sizes 3 + 2); each shard writes only its polygons under
    the {uid[:4]}/{uid} layout."""
    import glob

    rows = []
    for i, pid in enumerate(["aaaa1", "bbbb2", "cccc3", "dddd4", "eeee5"]):
        for d in range(3):
            rows.append((pid, dt.datetime(2021, 1, 1 + d, 12, 0, 0),
                         float(i), 0.1 * i, 0.01))
    obs = spark.createDataFrame(
        rows, "poly_id string, ts timestamp, px_wet double, pc_wet double, "
              "pc_missing double")
    out0 = str(tmp_path / "shard0")
    out1 = str(tmp_path / "shard1")
    sel0 = stacking.db_to_csv(obs, out0, split_num=2, index_num=0)
    sel1 = stacking.db_to_csv(obs, out1, split_num=2, index_num=1)
    ids0 = sorted(r.poly_id for r in sel0.collect())
    ids1 = sorted(r.poly_id for r in sel1.collect())
    assert ids0 == ["aaaa1", "bbbb2", "cccc3"] and ids1 == ["dddd4", "eeee5"]
    got0 = {p.split("poly_id=")[1].split("/")[0]
            for p in glob.glob(f"{out0}/uid4=*/poly_id=*/*.csv")}
    got1 = {p.split("poly_id=")[1].split("/")[0]
            for p in glob.glob(f"{out1}/uid4=*/poly_id=*/*.csv")}
    assert got0 == set(ids0) and got1 == set(ids1)
    # uid[:4] prefix layout (reference stack.py:702-706)
    assert glob.glob(f"{out0}/uid4=aaaa/poly_id=aaaa1/*.csv")


def test_jdbc_sink_fails_on_missing_driver_only(spark, tmp_path):
    """A driver jar that is genuinely absent (postgres) must fail on the
    DRIVER, not on the pipeline/schema — the documented boundary."""
    obs = stacking.observations_fact(spark.createDataFrame(
        [("p1", 1.0, 0.1, 0.0, dt.datetime(2021, 1, 1))],
        "poly_id string, px_wet double, pc_wet double, pc_missing double, "
        "ts timestamp"))
    with pytest.raises(Exception, match="ClassNotFound|No suitable driver"):
        stacking.jdbc_write_observations(
            obs, "jdbc:postgresql://localhost:5432/waterbodies",
            properties={"driver": "org.postgresql.Driver"})


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """A14 end-to-end: the observations fact table moves through REAL JDBC
    (embedded Apache Derby, bundled with Spark) and reads back
    row-identical (reference stack.py:509-592 stack_waterbodies_db)."""
    rows = [("p1", 1.0, 0.1, 0.0, dt.datetime(2021, 1, 1)),
            ("p2", 7.0, 0.7, 0.05, dt.datetime(2021, 1, 2)),
            ("p3", 0.0, 0.0, 1.0, dt.datetime(2021, 1, 3))]
    obs = stacking.observations_fact(spark.createDataFrame(
        rows,
        "poly_id string, px_wet double, pc_wet double, pc_missing double, "
        "ts timestamp"))
    url = f"jdbc:derby:{tmp_path}/obsdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    stacking.jdbc_write_observations(obs, url, table="waterbody_obs",
                                     mode="overwrite", properties=props)
    back = spark.read.jdbc(url=url, table="waterbody_obs", properties=props)
    got = back.toPandas().sort_values("poly_id").reset_index(drop=True)
    exp = obs.toPandas().sort_values("poly_id").reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
