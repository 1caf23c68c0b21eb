"""Loader for the VALUES-literal oracle pins (seeded k-means / ANN /
SemDeDup / codec queries whose outputs are bit-deterministic but not
SQL-expressible).

The pin DATA — auto-generated SQL literals captured at each driver SF
by tools/pin_oracles.py — lives in tests/fixtures/oracle_pins.json,
not in this module, so ~29k lines of generated VALUES text don't
inflate the repo's hand-written Python surface (r8 verdict task #6).
The public names are unchanged: `PINNED` is the flat dict
oracle_sql() merges for the driver's correctness SF; `PINNED_BY_SF`
carries every captured SF for the scale-diff gate.

Regenerate after any change to the pinned operators:
    python tools/pin_oracles.py
"""

import json
import os

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tests", "fixtures", "oracle_pins.json")

with open(_PATH) as _f:
    _data = json.load(_f)

PIN_SF: str = _data["pin_sf"]
PINNED_BY_SF: dict = _data["pinned_by_sf"]
PINNED: dict = PINNED_BY_SF[PIN_SF]
