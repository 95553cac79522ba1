"""Simulation-config registry, curated unit files, cosmology metadata,
and the default Arepo alias map (reference configfiles/simulations.yaml,
units/gadget_cosmological.yaml, mixins/{units,cosmology}.py,
customs/arepo/dataset.py:90-103,190-198)."""

from __future__ import annotations

import json

import pytest

from scida_spark.config import (
    field_unit_hints,
    get_config_fromfile,
    identify_simulation,
)
from scida_spark.cosmology import (
    Cosmology,
    check_redshift_consistency,
    cosmology_from_metadata,
    is_cosmological,
)
from scida_spark.dataset import load, merge_catalog
from scida_spark.units import UnitRegistry

H = 0.6774
MSUN_G = 1.989e33
KPC_CM = 3.085678e21


# --------------------------------------------------------------------------
# Unit-expression parser (pint-syntax subset used by the curated YAMLs)
# --------------------------------------------------------------------------


def _ureg() -> UnitRegistry:
    u = UnitRegistry(missing_units="raise")
    u.define("h", H)
    u.define("a", 0.5)
    return u


def test_parse_code_mass():
    u = _ureg().parse("1e10 * Msun / h")
    assert u.scale == pytest.approx(1e10 * MSUN_G / H, rel=1e-12)
    assert dict(u.dims) == {"mass": 1}


def test_parse_parenthesized_and_caret():
    ureg = _ureg()
    v2 = ureg.parse("(km / s)^2")
    assert dict(v2.dims) == {"length": 2, "time": -2}
    assert v2.scale == pytest.approx(1e10)
    t = ureg.parse("kpc / (km / s)")  # exact Arepo code_time
    assert dict(t.dims) == {"time": 1}
    assert t.scale == pytest.approx(KPC_CM / 1e5)


def test_parse_fractional_exponent_and_implicit_mul():
    ureg = _ureg()
    v = ureg.parse("km * a^(1/2) / s")
    assert v.scale == pytest.approx(1e5 * 0.5 ** 0.5)
    assert ureg.parse("1e10 Msun").scale == pytest.approx(1e10 * MSUN_G)


def test_parse_errors():
    ureg = _ureg()
    with pytest.raises(ValueError):
        ureg.parse("(km / s")
    with pytest.raises(KeyError):
        ureg.parse("not_a_unit * kpc")


# --------------------------------------------------------------------------
# Simulation identification
# --------------------------------------------------------------------------


def test_identify_by_header_boxsize():
    md = {"Header": {"BoxSize": 35000.0}}
    assert "TNG50" in identify_simulation(md, "/data/sims/L35n2160TNG/output")
    md100 = {"/Header": {"BoxSize": 75000.0}}  # slashed spelling too
    assert "TNG100" in identify_simulation(md100, None)
    assert identify_simulation({"Header": {"BoxSize": 1.0}}, None) == []


def test_identify_by_name_contains():
    assert "gadget-generic" in identify_simulation({}, "/sims/run42/snapdir_099")
    assert "gadget-generic" not in identify_simulation({}, "/sims/run42/output_099")


def test_field_unit_hints_container_overrides_all():
    hints = get_config_fromfile("units/gadget_cosmological.yaml")
    all_hints = field_unit_hints(hints, "PartType1")
    assert all_hints["Masses"] == "code_mass"
    gas = field_unit_hints(hints, "PartType0")
    assert gas["Density"] == "code_mass / code_length^3"
    assert gas["Masses"] == "code_mass"  # inherited from _all


# --------------------------------------------------------------------------
# Cosmology metadata
# --------------------------------------------------------------------------


def test_cosmology_detection_and_extraction():
    z = 2.0
    md = {"Header": {"HubbleParam": H, "Redshift": z, "Time": 1.0 / (1.0 + z)}}
    assert is_cosmological(md)
    c = cosmology_from_metadata(md)
    assert c.h == H and c.a == pytest.approx(1.0 / 3.0)
    assert c.redshift == pytest.approx(z)
    # Non-cosmological: Time is just time, inconsistent with 1/(1+z)
    assert not is_cosmological({"Header": {"Time": 12.0, "Redshift": 0.0}})
    # Config flag wins regardless
    assert is_cosmological({"Config": {"ComovingIntegrationOn": 1}})


def test_redshift_consistency_check():
    check_redshift_consistency(2.0, 2.0)
    check_redshift_consistency(None, 2.0)  # missing side → no-op
    with pytest.raises(ValueError, match="Redshift mismatch"):
        check_redshift_consistency(2.0, 0.0)


# --------------------------------------------------------------------------
# End-to-end: TNG-shaped snapshot load resolves curated units + aliases
# --------------------------------------------------------------------------


def _write_snapshot(spark, path, z=2.0, with_catalog=False, boxsize=35000.0):
    path.mkdir(parents=True, exist_ok=True)
    spark.createDataFrame(
        [(0, 1.5, 0.1, 900.0), (1, 2.5, 0.2, 1100.0)],
        "uid long, Masses double, ElectronAbundance double, InternalEnergy double",
    ).write.mode("overwrite").parquet(str(path / "PartType0.parquet"))
    spark.createDataFrame(
        [(0, 10.0)], "uid long, Masses double"
    ).write.mode("overwrite").parquet(str(path / "PartType1.parquet"))
    if with_catalog:
        spark.createDataFrame(
            [(0, 100.0)], "GroupID long, GroupMass double"
        ).write.mode("overwrite").parquet(str(path / "Group.parquet"))
    meta = {
        "Header": {
            "BoxSize": boxsize,
            "HubbleParam": H,
            "Redshift": z,
            "Time": 1.0 / (1.0 + z),
        }
    }
    (path / "_metadata.json").write_text(json.dumps(meta))
    return str(path)


def test_load_applies_simulation_units_and_aliases(spark, tmp_path):
    ds = load(_write_snapshot(spark, tmp_path / "snap"), spark)
    assert ds.metadata["simulation"] == "TNG50"
    assert ds.redshift == pytest.approx(2.0)
    assert ds.cosmology.h == H
    # Curated units resolved from the YAML:
    assert ds.containers["PartType0"].field_units["Masses"] == "code_mass"
    code_mass = ds.ureg["code_mass"]
    assert code_mass.conversion_factor(ds.ureg["Msun"]) == pytest.approx(
        1e10 / H, rel=1e-12
    )
    # a enters comoving lengths: code_length = a * kpc / h
    assert ds.ureg["code_length"].conversion_factor(ds.ureg["kpc"]) == pytest.approx(
        (1.0 / 3.0) / H, rel=1e-12
    )
    # Default Arepo aliases wired on load:
    assert ds["gas"] is ds.containers["PartType0"]
    assert ds["dm"] is ds.containers["PartType1"]
    m = ds["gas"]["Masses"]  # field access through the alias
    assert m is not None


def test_load_units_false_skips_config(spark, tmp_path):
    ds = load(_write_snapshot(spark, tmp_path / "snap2"), spark, units=False)
    assert "simulation" not in ds.metadata
    assert ds.containers["PartType0"].field_units == {}


def test_merge_catalog_redshift_gate(spark, tmp_path):
    snap = load(_write_snapshot(spark, tmp_path / "snapA"), spark)
    cat_ok = load(
        _write_snapshot(spark, tmp_path / "catA", z=2.0, with_catalog=True), spark
    )
    merged = merge_catalog(snap, cat_ok)
    assert "Group" in merged.containers
    assert merged["gas"] is merged.containers["PartType0"]

    snap2 = load(_write_snapshot(spark, tmp_path / "snapB"), spark)
    cat_bad = load(
        _write_snapshot(spark, tmp_path / "catB", z=0.0, with_catalog=True), spark
    )
    with pytest.raises(ValueError, match="Redshift mismatch"):
        merge_catalog(snap2, cat_bad)


def test_unit_mismatch_raises_at_build_time(spark, tmp_path):
    """Dimensional analysis is eager: adding a mass to a length raises
    before any Spark job runs (reference pint semantics,
    docs/units.md:43-57)."""
    ds = load(_write_snapshot(spark, tmp_path / "snap3"), spark)
    gas = ds.containers["PartType0"]
    gas.field_units["InternalEnergy"] = "(km / s)^2"
    with pytest.raises(ValueError, match="incompatible dimensions"):
        _ = gas.with_units("Masses") + gas.with_units("InternalEnergy")
