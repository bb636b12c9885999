"""dea_conflux_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reproduces the bulk polygon-drill semantics of GeoscienceAustralia/dea-conflux
(reference at /root/reference, studied for behaviour only) re-expressed as an
idiomatic Spark DataFrame pipeline:

* waterbody polygons get compact hierarchical cell covers at adaptive
  resolution (H3/S2-style, pure numpy — see ``core.cells``),
* image tiles from a Parquet/Iceberg table of image+caption pairs are
  cell-encoded JVM-side (``operators.tilecells``) and joined to polygon
  covers with broadcast-or-shuffle hash joins keyed on cell id,
* exact pixel→polygon assignment uses vectorized ray-casting
  point-in-polygon refinement inside Arrow-batched pandas UDFs
  (``operators.drill``), matching rasterio's pixel-center / last-wins
  rasterisation rule (reference drill.py:32-101),
* zonal summaries are partial-aggregated per (polygon, tile) inside the
  UDF and combined with native Spark aggregate expressions.
"""

__version__ = "0.1.0"

from .config import get_spark  # noqa: E402,F401
from .datagen import GridSpec  # noqa: E402,F401


def drill(*args, **kwargs):
    """Convenience re-export of :func:`operators.drill.drill`."""
    from .operators.drill import drill as _drill

    return _drill(*args, **kwargs)
