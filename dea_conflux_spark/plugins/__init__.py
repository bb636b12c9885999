"""Drill-spec (plugin) registry.

The reference's entire user-function surface is the ``*.conflux.py`` plugin
module (reference __main__.py:198-235): ``transform(xr.Dataset)`` runs
per-pixel over a whole scene and ``summarise(xr.Dataset)`` reduces one
polygon's pixel bag to scalars.  Here a plugin is a :class:`DrillSpec`:

* ``transform`` — vectorized numpy over one decoded tile (runs inside the
  Arrow-batched mapInPandas drill UDF; no per-row Python),
* ``partials`` — per-(polygon, tile) partial sums computed in the same UDF
  (Spark's map-side combine, SURVEY.md §2.D1), and
* ``final_aggs`` — native Spark aggregate expressions that combine partials
  into the plugin's published metrics (whole-stage-codegen'd).

This decomposition replaces the reference's per-polygon Python summarise
loop (reference drill.py:675-686) with Spark's partial/final agg contract.
"""

from __future__ import annotations

from .waterbodies import WaterbodiesC3
from .sum_wet import SumWet
from .wit import WitLs9
from .wo_flags import WoFlags
from .variants import (WaterbodiesC2, WitLs5, WitLs7, WitLs8,
                       WofsAlbersFlags)

REGISTRY = {
    "waterbodies_c3": WaterbodiesC3(),
    "waterbodies": WaterbodiesC2(),
    "sum_wet": SumWet(),
    "ga_ls_wo_3_flags": WoFlags(),
    "wofs_albers_flags": WofsAlbersFlags(),
    "wit_ls9": WitLs9(),
    "wit_ls8": WitLs8(),
    "wit_ls7": WitLs7(),
    "wit_ls5": WitLs5(),
}


def get_plugin(name: str):
    return REGISTRY[name]
