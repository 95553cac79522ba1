"""Simulation-config registry + curated unit-file application.

Mirrors the reference's config layer: per-simulation identifiers in
``configfiles/simulations.yaml`` (reference
src/scida/configfiles/simulations.yaml:17-40, matched by
``check_config_for_dataset``, src/scida/misc.py:238-343) and curated
unit files like ``units/gadget_cosmological.yaml`` applied at load
(reference src/scida/interfaces/mixins/units.py:122-203,340-430).

Everything here is driver-side Python over small dicts — no Spark jobs.
"""

from __future__ import annotations

import math
import os
from typing import Any

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configfiles")

_cache: dict[str, dict] = {}


def get_config_fromfile(relpath: str) -> dict:
    """Load a YAML config bundled under ``configfiles/`` (reference
    ``get_config_fromfile``; paths like ``units/gadget_cosmological.yaml``
    resolve relative to the config dir)."""
    if relpath in _cache:
        return _cache[relpath]
    import yaml

    full = relpath if os.path.isabs(relpath) else os.path.join(CONFIG_DIR, relpath)
    with open(full) as fh:
        conf = yaml.safe_load(fh) or {}
    _cache[relpath] = conf
    return conf


def get_simulationconfig() -> dict:
    return get_config_fromfile("simulations.yaml")


def _group_attrs(metadata: dict, group: str) -> dict | None:
    """Fetch a metadata attr group, accepting both ``Header`` and
    ``/Header`` spellings (HDF5 walks emit the slashed form)."""
    for key in (group, "/" + group):
        v = metadata.get(key)
        if isinstance(v, dict):
            return v
    attrs = metadata.get("attrs")
    if isinstance(attrs, dict):
        return _group_attrs(attrs, group)
    return None


def _value_matches(expected: Any, actual: Any) -> bool:
    if isinstance(expected, dict):  # {'content': ..., 'match': 'substring'}
        mode = expected.get("match", "equal")
        content = expected.get("content")
        if mode == "substring":
            return isinstance(actual, str) and str(content) in actual
        expected = content
    if isinstance(actual, bytes):
        actual = actual.decode("utf-8", "replace")
    if isinstance(expected, float) or isinstance(actual, float):
        try:
            return math.isclose(float(expected), float(actual), rel_tol=1e-6)
        except (TypeError, ValueError):
            return False
    return expected == actual


def identify_simulation(metadata: dict, path: str | None = None) -> list[str]:
    """Names of simulations whose identifiers all match (reference
    ``check_config_for_dataset``, misc.py:238-343: ``name_contains``
    checks the last path elements; attr-group keys check metadata)."""
    conf = get_simulationconfig().get("simulations") or {}
    matches: list[str] = []
    for name, props in conf.items():
        idtfrs = (props or {}).get("identifiers")
        if not idtfrs:
            continue
        ok = True
        for key, spec in idtfrs.items():
            if key == "name_contains":
                if path is None:
                    ok = False
                    break
                parts = [p for p in os.path.normpath(path).split(os.sep) if p][-3:]
                if not any(str(spec).lower() in p.lower() for p in parts):
                    ok = False
                    break
                continue
            attrs = _group_attrs(metadata, key)
            if attrs is None:
                ok = False
                break
            for akey, aval in (spec or {}).items():
                if akey not in attrs or not _value_matches(aval, attrs[akey]):
                    ok = False
                    break
            if not ok:
                break
        if ok:
            matches.append(name)
    return matches


def simulation_properties(name: str) -> dict:
    return (get_simulationconfig().get("simulations") or {}).get(name) or {}


def apply_unitfile(
    ureg, unitfile: str | dict, expected_missing: tuple[str, ...] = ()
) -> dict:
    """Define the unit file's ``units:`` entries into the registry (in
    file order — later definitions may reference earlier ones, e.g.
    ``code_length: ckpc / h`` after ``ckpc: a * kpc``) and return the
    full unit-hints dict (incl. ``fields:``). Mirrors the reference's
    ``update_unitregistry_fromdict`` (mixins/units.py:280-325).

    A curated definition that references units NOT yet in the registry
    is SKIPPED with a warning instead of being silently defined against
    the scale-1 'unknown' unit — a wrong conversion factor (e.g. a
    dropped 1/h) is far worse than a missing unit name. Callers that
    KNOW some units are legitimately absent pass ``expected_missing``
    (e.g. ``("a", "h")`` for a non-cosmological dataset that matched a
    path-based curated entry): those skips are silent — they are the
    policy working, not a config defect worth a UserWarning per load."""
    import warnings

    hints = get_config_fromfile(unitfile) if isinstance(unitfile, str) else unitfile
    # Skips cascade (ckpc needs a; code_length needs ckpc): a definition
    # skipped because of an expected-missing unit becomes expected-
    # missing itself, so only the true ROOT of an unexpected failure
    # warns, once.
    missing = set(expected_missing)
    for uname, expr in (hints.get("units") or {}).items():
        if expr is None:
            continue
        prev = ureg.missing_units
        ureg.missing_units = "raise"
        try:
            val = ureg.parse(str(expr))
        except (KeyError, ValueError) as e:
            if not any(f"unknown unit: '{m}'" in str(e) for m in missing):
                warnings.warn(
                    f"unit file defines {uname!r} = {expr!r} referencing an "
                    f"unknown unit or malformed expression ({e}); skipping "
                    "the definition",
                    stacklevel=2,
                )
            missing.add(uname)
            continue
        finally:
            ureg.missing_units = prev
        ureg.define(uname, val)
    return hints


def field_unit_hints(
    hints: dict, container: str, detailed: bool = False
) -> dict[str, str] | dict[str, tuple[str, bool]]:
    """Per-container field→unit map: ``_all`` overlaid by the
    container-named section (reference combine order,
    mixins/units.py:410-420). With ``detailed=True`` values are
    ``(unit, override)`` tuples — the yaml ``{'units': ...,
    'override': true}`` form marks hints that beat stored metadata
    (reference mixins/units.py:478)."""
    fields = hints.get("fields") or {}
    out: dict[str, tuple[str, bool]] = {}
    for section in ("_all", container):
        sec = fields.get(section)
        if sec == "no_units":
            return {}
        if isinstance(sec, dict):
            for fname, u in sec.items():
                if u is None or u == "none":
                    continue
                override = False
                if isinstance(u, dict):  # {'units': ..., 'override': true}
                    override = bool(u.get("override", False))
                    u = u.get("units")
                    if u is None:
                        continue
                out[fname] = (str(u), override)
    if detailed:
        return out
    return {k: v[0] for k, v in out.items()}
