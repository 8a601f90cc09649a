"""Output lists and per-field output selection.

Two reference subsystems:

* **Output lists** (src/output_list.c:506): instead of a fixed
  ``delta_time`` cadence, snapshot times come from a text file with a
  header line declaring the time variable — ``# Time``, ``# Redshift``
  or ``# Scale Factor`` — and one value per line.  The engine dumps at
  the next listed time it crosses.
* **Field selection** (src/output_options.c): a YAML file of
  ``SelectOutput`` sections mapping ``FieldName_PartTypeN: on|off``;
  fields switched off are skipped when writing snapshots (compulsory
  fields — Coordinates, Masses, ParticleIDs — can never be switched
  off, io_properties.h).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import yaml

PTYPE_NAMES = {0: "Gas", 1: "DM", 2: "DMBackground", 3: "Sinks",
               4: "Stars", 5: "BH", 6: "Neutrino"}

COMPULSORY = ("Coordinates", "Masses", "ParticleIDs")


def read_output_list(path: str):
    """Parse an output-list file -> (kind, times ascending).

    kind is 'time', 'redshift' or 'scale_factor' from the header comment
    (output_list_read_file, output_list.c:43).
    """
    kind = "time"
    times: List[float] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                h = line.lstrip("#").strip().lower()
                if "redshift" in h:
                    kind = "redshift"
                elif "scale" in h:
                    kind = "scale_factor"
                continue
            times.append(float(line.split(",")[0]))
    arr = np.asarray(sorted(times), np.float64)
    if kind == "redshift":
        # engine time runs in scale factor a = 1/(1+z), ascending
        arr = np.sort(1.0 / (1.0 + arr[::-1]))
        kind = "scale_factor"
    return kind, arr


class OutputList:
    """Iterator over listed snapshot times (output_list.c semantics)."""

    def __init__(self, times):
        self.times = np.asarray(times, np.float64)
        self.i = 0

    def next_time(self) -> float:
        return float(self.times[self.i]) if self.i < len(self.times) \
            else np.inf

    def advance_past(self, t: float):
        while self.i < len(self.times) and self.times[self.i] <= t:
            self.i += 1


def read_select_output(path: str, section: str = "Default"
                       ) -> Dict[int, Dict[str, bool]]:
    """YAML select-output file -> {ptype: {field: on?}} for ``section``.

    Unlisted fields default to on (output_options_get_field_enabled).
    """
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    sec = doc.get(section, doc.get(f"SelectOutput:{section}", {})) or {}
    out: Dict[int, Dict[str, bool]] = {}
    for key, val in sec.items():
        if "_PartType" not in key:
            continue
        field, pt = key.rsplit("_PartType", 1)
        enabled = str(val).strip().lower() in ("on", "true", "1", "yes")
        out.setdefault(int(pt), {})[field] = enabled
    return out


def apply_selection(parts: Dict[int, Dict[str, np.ndarray]],
                    select: Optional[Dict[int, Dict[str, bool]]]
                    ) -> Dict[int, Dict[str, np.ndarray]]:
    """Drop switched-off fields; compulsory fields always survive."""
    if not select:
        return parts
    out = {}
    for pt, fields in parts.items():
        rules = select.get(pt, {})
        out[pt] = {name: arr for name, arr in fields.items()
                   if name in COMPULSORY or rules.get(name, True)}
    return out
