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
