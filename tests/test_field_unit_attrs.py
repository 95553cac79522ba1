"""Per-field HDF5 unit-attribute path + round-3 ADVICE fixes:

* ``to_cgs``/``*_scaling`` dataset attrs resolve into field_units with
  NO simulations.yaml match (reference extract_units_from_attrs,
  mixins/units.py:122-260)
* curated-vs-metadata mismatch check at ~1e-3 rtol raises/warns per
  the missing_units policy (reference check_unit_mismatch,
  units.py:668-733)
* load(units=False) attaches nothing on the HDF5 path
* field_unit_hints carries the yaml override flag; override beats
  stored units (reference mixins/units.py:478)
* apply_unitfile skips definitions referencing unknown units instead
  of silently defining them against scale-1 'unknown'
* the unit parser raises on malformed token sequences instead of
  routing them through the missing-unit policy
* units/general.yaml really is applied before curated files
"""

from __future__ import annotations

import json
import warnings

import numpy as np
import pytest

from scida_spark.sources.hdf5 import load_hdf5_dataset
from scida_spark.units import Unit, UnitRegistry, unit_from_field_attrs, unit_to_expr

SHIM = "scida_spark.sources.h5_shim"

KPC_CM = 3.085678e21
MSUN_G = 1.989e33


def _snap_with_field_attrs(root, n=50, header=None, mass_attrs=None):
    pt0 = root / "PartType0"
    pt0.mkdir(parents=True)
    rng = np.random.RandomState(0)
    np.save(pt0 / "Masses.npy", rng.uniform(0.1, 2.0, n))
    np.save(pt0 / "ParticleIDs.npy", np.arange(n, dtype=np.int64))
    if mass_attrs is not None:
        (pt0 / "Masses.attrs.json").write_text(json.dumps(mass_attrs))
    # ID fields: to_cgs=1, zero scalings → explicitly unitless
    (pt0 / "ParticleIDs.attrs.json").write_text(
        json.dumps({"to_cgs": 1.0, "a_scaling": 0.0, "h_scaling": 0.0})
    )
    if header is not None:
        hdr = root / "Header"
        hdr.mkdir()
        (hdr / "_attrs.json").write_text(json.dumps(header))
    return root


# --------------------------------------------------------------------------
# unit_from_field_attrs
# --------------------------------------------------------------------------


def test_unit_from_attrs_tng_style_scalings():
    ureg = UnitRegistry()
    ureg.define("h", 0.7)
    ureg.define("a", 0.5)
    # TNG mass: to_cgs = 1e10 Msun in g; h_scaling=-1
    u = unit_from_field_attrs(
        ureg, {"to_cgs": 1e10 * MSUN_G, "mass_scaling": 1.0, "h_scaling": -1.0}
    )
    assert isinstance(u, Unit)
    expect = ureg.parse("1e10 * Msun / h")
    assert u.isclose(expect, rtol=1e-6)
    # serialization round-trips through the parser
    assert ureg.parse(unit_to_expr(u)).isclose(expect, rtol=1e-6)


def test_unit_from_attrs_unitless_and_unresolvable():
    ureg = UnitRegistry()
    assert unit_from_field_attrs(ureg, {"to_cgs": 1.0, "a_scaling": 0.0}) == "none"
    # h exponent without a cosmology definition → unresolvable, None
    assert (
        unit_from_field_attrs(ureg, {"to_cgs": 2.0, "h_scaling": -1.0}) is None
    )
    assert unit_from_field_attrs(ureg, {}) is None


def test_unit_from_attrs_explicit_strings():
    ureg = UnitRegistry()
    u = unit_from_field_attrs(ureg, {"cgsunits": "km / s"})
    assert u.isclose(ureg.parse("km / s"), rtol=1e-9)
    assert unit_from_field_attrs(ureg, {"cgsunits": None}) == "none"
    u = unit_from_field_attrs(ureg, {"description": "Velocity dispersion [km / s]"})
    assert u.isclose(ureg.parse("km / s"), rtol=1e-9)
    # SWIFT-style bracketed expression
    u = unit_from_field_attrs(
        ureg, {"Expression for physical CGS units": "a^0 [ cm ]"}
    )
    assert u.isclose(ureg.parse("cm"), rtol=1e-9)


def test_unit_from_attrs_swift_factor_plus_expression():
    """SWIFT files carry BOTH the float cgs factor and a CGS expression
    string: the factor must seed the parsed unit, not shadow it with a
    dimensionless pure-scale Unit (reference mixins/units.py:159-196;
    round-3 ADVICE medium)."""
    ureg = UnitRegistry()
    attrs = {
        "Conversion factor to physical CGS (including cosmological corrections)":
            2.5e64,
        "Expression for physical CGS units": "cm**3",
    }
    u = unit_from_field_attrs(ureg, attrs)
    assert isinstance(u, Unit)
    assert u.same_dimensions(ureg.parse("cm^3"))  # dims preserved
    assert u.scale == pytest.approx(2.5e64)
    # factor of exactly 1.0 with a string: string alone
    u = unit_from_field_attrs(
        ureg,
        {
            "Conversion factor to physical CGS (including cosmological corrections)": 1.0,
            "Expression for physical CGS units": "cm / s",
        },
    )
    assert u.isclose(ureg.parse("cm / s"), rtol=1e-9)
    # factor with an unparseable string: pure-scale fallback survives
    u = unit_from_field_attrs(
        ureg,
        {
            "to_cgs": 7.0,
            "units": "florps",
        },
    )
    assert isinstance(u, Unit) and u.dims == () and u.scale == pytest.approx(7.0)


# --------------------------------------------------------------------------
# end-to-end through the HDF5 loader
# --------------------------------------------------------------------------


def test_field_attr_units_resolve_without_sim_match(spark, tmp_path):
    """No simulations.yaml entry matches this header, but the per-field
    to_cgs/scaling attrs alone must resolve Masses' unit."""
    snap = _snap_with_field_attrs(
        tmp_path / "snap",
        header={"NothingRecognizable": 1.0, "HubbleParam": 0.7, "Redshift": 1.0,
                "Time": 0.5},
        mass_attrs={"to_cgs": 1e10 * MSUN_G, "mass_scaling": 1.0, "h_scaling": -1.0},
    )
    ds = load_hdf5_dataset(str(snap), spark, backend=SHIM)
    assert ds.metadata.get("simulation") is None
    cont = ds["PartType0"]
    u = cont.ureg.parse(cont.field_units["Masses"])
    assert u.isclose(cont.ureg.parse("1e10 * Msun / h"), rtol=1e-3)
    # explicitly unitless ID field gets NO unit
    assert "ParticleIDs" not in cont.field_units


def test_field_attr_units_mismatch_warns_and_raises(spark, tmp_path):
    """Deliberately mismatched attr (2x the curated cgs factor) warns
    under the default policy and raises under missing_units='raise'
    (reference check at rtol 1e-3)."""
    header = {"BoxSize": 35000.0, "HubbleParam": 0.6774, "Redshift": 0.0,
              "Time": 1.0}  # matches TNG50 → curated code_mass hint
    snap = _snap_with_field_attrs(
        tmp_path / "snap",
        header=header,
        mass_attrs={"to_cgs": 2e10 * MSUN_G, "mass_scaling": 1.0, "h_scaling": -1.0},
    )
    with pytest.warns(UserWarning, match="unit mismatch"):
        ds = load_hdf5_dataset(str(snap), spark, backend=SHIM)
    # curated value wins on mismatch (reference keeps the unitfile unit)
    assert ds["PartType0"].field_units["Masses"] == "code_mass"

    ds2 = load_hdf5_dataset(str(tmp_path / "snap"), spark, backend=SHIM, units=False)
    ds2.ureg.missing_units = "raise"
    from scida_spark.dataset import apply_simulation_config

    with pytest.raises(ValueError, match="unit mismatch"):
        apply_simulation_config(ds2, units=True)


def test_field_attr_units_agree_with_curated(spark, tmp_path):
    """Matching attrs (within 1e-3) produce no warning and keep the
    curated name."""
    header = {"BoxSize": 35000.0, "HubbleParam": 0.6774, "Redshift": 0.0,
              "Time": 1.0}
    snap = _snap_with_field_attrs(
        tmp_path / "snap",
        header=header,
        mass_attrs={"to_cgs": 1e10 * MSUN_G, "mass_scaling": 1.0, "h_scaling": -1.0},
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        ds = load_hdf5_dataset(str(snap), spark, backend=SHIM)
    assert ds["PartType0"].field_units["Masses"] == "code_mass"


def test_load_units_false_attaches_nothing(spark, tmp_path):
    snap = _snap_with_field_attrs(
        tmp_path / "snap",
        header={"BoxSize": 35000.0, "HubbleParam": 0.6774, "Redshift": 0.0,
                "Time": 1.0},
        mass_attrs={"to_cgs": 1e10 * MSUN_G, "mass_scaling": 1.0, "h_scaling": -1.0},
    )
    ds = load_hdf5_dataset(str(snap), spark, backend=SHIM, units=False)
    for cont in ds.containers.values():
        assert cont.field_units == {}
    # simulation identification + cosmology metadata still happen
    assert ds.metadata.get("simulation") == "TNG50"
    assert ds.redshift == pytest.approx(0.0)


# --------------------------------------------------------------------------
# config-layer ADVICE fixes
# --------------------------------------------------------------------------


def test_field_unit_hints_override_flag():
    from scida_spark.config import field_unit_hints

    hints = {
        "fields": {
            "_all": {"Masses": {"units": "code_mass", "override": True}},
            "PartType0": {"Density": "code_mass / code_length^3"},
        }
    }
    detailed = field_unit_hints(hints, "PartType0", detailed=True)
    assert detailed["Masses"] == ("code_mass", True)
    assert detailed["Density"] == ("code_mass / code_length^3", False)
    # plain form unchanged for existing callers
    assert field_unit_hints(hints, "PartType0")["Masses"] == "code_mass"


def test_apply_unitfile_skips_unknown_referencing_defs():
    from scida_spark.config import apply_unitfile

    ureg = UnitRegistry()
    with pytest.warns(UserWarning, match="skipping"):
        apply_unitfile(ureg, {"units": {"ckpc": "a * kpc"}})  # 'a' undefined
    assert "ckpc" not in ureg._units
    # conversion factors never silently lose the factor: parsing 'ckpc'
    # now follows the missing-unit policy instead of returning scale 1*kpc
    ureg.missing_units = "raise"
    with pytest.raises(KeyError):
        ureg.parse("ckpc")


def test_parser_raises_on_malformed_token_sequence():
    ureg = UnitRegistry(missing_units="warn")
    with pytest.raises(ValueError):
        ureg.parse("km ^ / s")
    with pytest.raises(ValueError):
        ureg.parse("(km")


def test_general_yaml_applied_before_curated(spark, tmp_path):
    """Myr/pc/km_s come from units/general.yaml, which
    apply_simulation_config now loads for every dataset."""
    snap = _snap_with_field_attrs(tmp_path / "snap", header={"Dummy": 1})
    ds = load_hdf5_dataset(str(snap), spark, backend=SHIM)
    myr = ds.ureg.parse("Myr")
    assert myr.isclose(ds.ureg.parse("1e6 * yr"), rtol=1e-9)
    assert ds.ureg.parse("pc").isclose(Unit(3.085678e18, (("length", 1),)), rtol=1e-9)
