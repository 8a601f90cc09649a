"""SWIFT-compatible parameter files.

The reference parses a YAML subset by hand (src/parser.c:1-1435) with
``Section:param`` lookups, required vs optional getters, ``-P sec:par:val``
command-line overrides (swift.c:316) and a dump of used/unused parameters
(``used_parameters.yml``).  We read full YAML via PyYAML but preserve that
exact API surface so the reference's parameter files work unchanged.
"""

from __future__ import annotations

import io
from typing import Any, Dict, Iterable, Optional

import yaml


class ParamError(KeyError):
    pass


class Params:
    """A parsed parameter file with used/unused tracking.

    Equivalent of the reference's ``struct swift_params`` + parser_get_param_*
    / parser_get_opt_param_* family (src/parser.h:50-114).
    """

    def __init__(self, data: Optional[Dict[str, Dict[str, Any]]] = None,
                 filename: str = "<memory>"):
        self._data: Dict[str, Dict[str, Any]] = data or {}
        self._used: set = set()
        self.filename = filename

    # --- construction -------------------------------------------------------
    @classmethod
    def from_file(cls, path: str, overrides: Iterable[str] = ()) -> "Params":
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        p = cls(data, filename=path)
        for ov in overrides:
            p.apply_override(ov)
        return p

    @classmethod
    def from_string(cls, text: str, overrides: Iterable[str] = ()) -> "Params":
        data = yaml.safe_load(io.StringIO(text)) or {}
        p = cls(data)
        for ov in overrides:
            p.apply_override(ov)
        return p

    def apply_override(self, spec: str) -> None:
        """Apply a ``Section:param:value`` override (reference swift.c:316)."""
        try:
            section, param, value = spec.split(":", 2)
        except ValueError:
            raise ParamError(
                f"Invalid override '{spec}', expected Section:param:value")
        parsed = yaml.safe_load(value)
        self._data.setdefault(section, {})[param] = parsed

    # --- getters -------------------------------------------------------------
    def _get(self, section: str, name: str):
        sec = self._data.get(section)
        if sec is None or name not in sec:
            raise ParamError(
                f"Missing parameter '{section}:{name}' in {self.filename}")
        self._used.add((section, name))
        return sec[name]

    def get_int(self, section: str, name: str) -> int:
        return int(self._get(section, name))

    def get_float(self, section: str, name: str) -> float:
        return float(self._get(section, name))

    def get_string(self, section: str, name: str) -> str:
        return str(self._get(section, name))

    def get_array(self, section: str, name: str, n: Optional[int] = None):
        v = self._get(section, name)
        if not isinstance(v, (list, tuple)):
            v = [v]
        v = [float(x) for x in v]
        if n is not None and len(v) != n:
            raise ParamError(
                f"Parameter '{section}:{name}' expected {n} values, got {len(v)}")
        return v

    def opt_int(self, section: str, name: str, default: int) -> int:
        try:
            return self.get_int(section, name)
        except ParamError:
            return default

    def opt_float(self, section: str, name: str, default: float) -> float:
        try:
            return self.get_float(section, name)
        except ParamError:
            return default

    def opt_string(self, section: str, name: str, default: str) -> str:
        try:
            return self.get_string(section, name)
        except ParamError:
            return default

    def opt_array(self, section: str, name: str, default):
        try:
            return self.get_array(section, name)
        except ParamError:
            return list(default)

    def has(self, section: str, name: Optional[str] = None) -> bool:
        if name is None:
            return section in self._data
        return section in self._data and name in self._data[section]

    def section(self, section: str) -> Dict[str, Any]:
        return dict(self._data.get(section, {}))

    # --- used/unused dumps (reference parser_write_params_to_file) ----------
    def used_params(self) -> Dict[str, Dict[str, Any]]:
        out: Dict[str, Dict[str, Any]] = {}
        for (sec, name) in sorted(self._used):
            out.setdefault(sec, {})[name] = self._data[sec][name]
        return out

    def unused_params(self) -> Dict[str, Dict[str, Any]]:
        out: Dict[str, Dict[str, Any]] = {}
        for sec, entries in self._data.items():
            for name, val in entries.items():
                if (sec, name) not in self._used:
                    out.setdefault(sec, {})[name] = val
        return out

    def dump_used(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.used_params(), f, sort_keys=True)

    def dump_unused(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.unused_params(), f, sort_keys=True)
