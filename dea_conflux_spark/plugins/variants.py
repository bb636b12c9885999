"""Per-product plugin variants.

The reference ships one ``*.conflux.py`` module per satellite/product whose
``transform``/``summarise`` bodies are identical to a sibling — only the
product wiring (input product name, collection, resolution) differs:

* ``wit_ls5`` / ``wit_ls7`` / ``wit_ls8`` vs ``wit_ls9``
  (reference examples/wit_ls5.conflux.py:4,19 / wit_ls7…:4,19 /
  wit_ls8…:4,19 — the diff vs wit_ls9 is the ARD product name only),
* ``wofs_albers_flags`` vs ``ga_ls_wo_3_flags``
  (reference examples/wofs_albers_flags.conflux.py:19-28: same bit
  positions, C2 flag NAMES — ``sea`` at bit 2, ``terrain_or_low_angle``
  at bit 3 — and 25 m resolution),
* ``waterbodies`` (C2) vs ``waterbodies_c3``
  (reference examples/waterbodies.conflux.py:14-37: identical transform +
  summarise, ``wofs_albers`` input at 25 m).

Here each variant is a subclass carrying its product wiring; the drill
semantics are inherited, so one golden test per variant certifies the
whole family.
"""

from __future__ import annotations

from .waterbodies import WaterbodiesC3
from .wit import WitLs9
from .wo_flags import WoFlags


class WitLs5(WitLs9):
    name = "wit_ls5"
    ard_product = "ga_ls5t_ard_3"  # reference examples/wit_ls5.conflux.py:19


class WitLs7(WitLs9):
    name = "wit_ls7"
    ard_product = "ga_ls7e_ard_3"  # reference examples/wit_ls7.conflux.py:19


class WitLs8(WitLs9):
    name = "wit_ls8"
    ard_product = "ga_ls8c_ard_3"  # reference examples/wit_ls8.conflux.py:19


class WofsAlbersFlags(WoFlags):
    """C2 WOfS flag counts (reference examples/wofs_albers_flags.conflux.py:
    19-28): same bit layout as ga_ls_wo_3_flags, C2 flag names, 25 m."""

    name = "wofs_albers_flags"
    input_product = "wofs_albers"
    resolution = (-25, 25)
    FLAGS = {
        "nodata": 0,
        "noncontiguous": 1,
        "sea": 2,
        "terrain_or_low_angle": 3,
        "high_slope": 4,
        "cloud_shadow": 5,
        "cloud": 6,
        "water_observed": 7,
    }


class WaterbodiesC2(WaterbodiesC3):
    """C2 waterbodies (reference examples/waterbodies.conflux.py): identical
    wet/dry/missing semantics over the ``wofs_albers`` product at 25 m."""

    name = "waterbodies"
    input_product = "wofs_albers"
    resolution = (-25, 25)
