import numpy as np
import pytest

from dea_conflux_spark.config import get_spark
from dea_conflux_spark import datagen


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="conflux-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def grid():
    return datagen.GridSpec(G=4, T=3, w=64, h=64)


@pytest.fixture(scope="session")
def polys(grid):
    return datagen.make_polygons(grid, n_small=18, n_medium=3, n_huge=1)


@pytest.fixture(scope="session")
def tiles_pdf(grid, polys):
    return datagen.make_tiles_pdf(grid, polys)


@pytest.fixture(scope="session")
def tiles(spark, grid, polys, tiles_pdf):
    return spark.createDataFrame(tiles_pdf, schema=datagen.TILE_SCHEMA).cache()


@pytest.fixture(scope="session")
def polygons(spark, polys):
    return datagen.polygons_df(spark, polys).cache()
