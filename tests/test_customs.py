"""Family detection (arepo/gizmo/swift/eagle/rockstar) over shim-format
stores, mirroring the reference's validate_path semantics:
customs/gizmo/dataset.py:61-97, customs/swift/dataset.py:46-71,
customs/rockstar/dataset.py:33-66, simulations.yaml EAGLEtype."""

from __future__ import annotations

import json
import math

import numpy as np
import pytest

from scida_spark.customs import (
    ArepoType,
    EagleType,
    GadgetStyleType,
    GizmoType,
    RockstarCatalogType,
    SwiftType,
)
from scida_spark.dataset import determine_type, load

RNG = np.random.default_rng(7)

COSMO_HDR = {
    "HubbleParam": 0.7,
    "Redshift": 1.0,
    "Omega0": 0.3,
    "OmegaLambda": 0.7,
    "BoxSize": 25000.0,
}


def _group(store, name, attrs=None, arrays=None):
    g = store / name if name else store
    g.mkdir(parents=True, exist_ok=True)
    if attrs:
        (g / "_attrs.json").write_text(json.dumps(attrs))
    for aname, arr in (arrays or {}).items():
        np.save(g / f"{aname}.npy", arr)
    return g


def _snapshot(store, header, extra_groups=(), n=50, field_attrs=None):
    """Minimal gadget-style shim store: /Header attrs + PartType0 data."""
    store.mkdir(parents=True, exist_ok=True)
    _group(store, "Header", attrs=header)
    _group(
        store,
        "PartType0",
        arrays={
            "Coordinates": RNG.random((n, 3)).astype(np.float32) * 100,
            "Masses": np.ones(n, dtype=np.float32),
        },
    )
    for gname, gattrs in extra_groups:
        _group(store, gname, attrs=gattrs)
    if field_attrs:
        for fname, fa in field_attrs.items():
            (store / "PartType0" / f"{fname}.attrs.json").write_text(json.dumps(fa))
    return store


@pytest.fixture()
def gizmo_store(tmp_path):
    hdr = {"GIZMO_version": 2022.0, "NumPart_ThisFile": [50, 0], **COSMO_HDR}
    return str(_snapshot(tmp_path / "gizmo_snap.h5dir", hdr))


def test_gizmo_marker_detected(gizmo_store):
    assert determine_type(gizmo_store) is GizmoType


def test_gizmo_elimination_path(tmp_path):
    """No GIZMO_version, but Flag_IC_Info present and none of arepo's
    fingerprints (Git_commit, /Config, /Parameters) — reference
    customs/gizmo/dataset.py:88-96."""
    hdr = {"Flag_IC_Info": 3, "NumPart_ThisFile": [50, 0], **COSMO_HDR}
    store = _snapshot(tmp_path / "snap.h5dir", hdr)
    assert determine_type(str(store)) is GizmoType


def test_arepo_beats_gizmo_elimination(tmp_path):
    """Git_commit or /Config+/Parameters flips the same header to arepo
    (reference gizmo eliminates on exactly these)."""
    hdr = {"Flag_IC_Info": 3, "Git_commit": "abc123", "NumPart_ThisFile": [50, 0], **COSMO_HDR}
    assert determine_type(str(_snapshot(tmp_path / "a.h5dir", hdr))) is ArepoType
    hdr2 = {"Flag_IC_Info": 3, "NumPart_ThisFile": [50, 0], **COSMO_HDR}
    store = _snapshot(
        tmp_path / "b.h5dir", hdr2,
        extra_groups=[("Config", {"NTYPES": 6}), ("Parameters", {"BoxSize": 25000.0})],
    )
    assert determine_type(str(store)) is ArepoType


def test_swift_code_marker(tmp_path):
    hdr = {"NumPart_ThisFile": [50, 0], **COSMO_HDR}
    store = _snapshot(
        tmp_path / "swift.h5dir", hdr, extra_groups=[("Code", {"Code": "SWIFT v0.9.0"})]
    )
    assert determine_type(str(store)) is SwiftType


def test_eagle_runlabel_beats_gizmo_elimination(tmp_path):
    """An EAGLE header also carrying Flag_IC_Info must resolve to the
    explicit RunLabel marker (specificity 4) over gizmo's elimination
    vote (specificity 3) at equal confidence and MRO depth."""
    hdr = {"RunLabel": '"Eagle 25Mpc box"', "Flag_IC_Info": 1,
           "NumPart_ThisFile": [50, 0], **COSMO_HDR}
    assert determine_type(str(_snapshot(tmp_path / "eagle.h5dir", hdr))) is EagleType


def test_plain_gadgetstyle_base(tmp_path):
    """No family marker at all → the gadget-style base wins over the
    generic Hdf5 vote (deeper MRO at equal confidence)."""
    hdr = {"NumPart_ThisFile": [50, 0], **COSMO_HDR}
    assert determine_type(str(_snapshot(tmp_path / "g.h5dir", hdr))) is GadgetStyleType


@pytest.fixture()
def rockstar_store(tmp_path):
    store = tmp_path / "rockstar.h5dir"
    n = 40
    _group(
        store, "",
        arrays={
            "cosmology:omega_dm": np.array(0.26),
            "mvir": (RNG.random(n).astype(np.float64) + 0.1) * 1e12,
            "rvir": RNG.random(n).astype(np.float64) * 300,
            "x": RNG.random(n).astype(np.float64) * 25,
            "vx": RNG.standard_normal(n).astype(np.float64) * 200,
        },
    )
    (store / "_attrs.json").write_text(json.dumps({"HubbleParam": 0.7, "Redshift": 0.5}))
    return str(store)


def test_rockstar_detected(rockstar_store):
    assert determine_type(rockstar_store) is RockstarCatalogType


def test_gizmo_load_units(spark, gizmo_store):
    """load() on a detected gizmo snapshot records the family and
    resolves code units from units/gizmo.yaml (Gadget code-unit system:
    code_mass = 1e10 Msun/h → cgs with h=0.7)."""
    ds = load(gizmo_store, spark=spark)
    assert ds.metadata["family"] == "gizmo"
    cont = ds.containers["PartType0"]
    assert cont.field_units["Masses"] == "code_mass"
    assert cont.field_units["Coordinates"] == "code_length"
    u = ds.ureg.parse("code_mass")
    assert math.isclose(u.scale, 1e10 * 1.989e33 / 0.7, rel_tol=1e-3)
    assert ds.containers["PartType0"].df.count() == 50


def test_rockstar_load_units(spark, rockstar_store):
    """Flat root datasets surface as the 'halos' container with the
    rockstar unit conventions (Msun/h, comoving Mpc/h)."""
    ds = load(rockstar_store, spark=spark)
    assert ds.metadata["family"] == "rockstar"
    halos = ds.containers["halos"]
    assert halos.df.count() == 40
    assert set(halos.df.columns) >= {"uid", "mvir", "rvir", "x", "vx"}
    assert halos.field_units["mvir"] == "code_mass"
    assert halos.field_units["x"] == "code_length"
    u = ds.ureg.parse("code_mass")
    assert math.isclose(u.scale, 1.989e33 / 0.7, rel_tol=1e-3)
    # scalar root dataset demoted to an attribute, not a column
    assert "cosmology:omega_dm" not in halos.df.columns


def test_swift_field_attr_units(spark, tmp_path):
    """SWIFT stores carry per-field cgs factors + unit expressions; the
    existing attr parser (units.py:412-465) resolves them with no
    curated unit file."""
    hdr = {"NumPart_ThisFile": [50, 0], **COSMO_HDR}
    store = _snapshot(
        tmp_path / "swift.h5dir", hdr,
        extra_groups=[("Code", {"Code": "SWIFT v0.9.0"})],
        field_attrs={
            "Coordinates": {
                "Conversion factor to physical CGS (including cosmological corrections)": 3.085678e24,
                "Expression for physical CGS units": "cm",
            }
        },
    )
    ds = load(str(store), spark=spark)
    assert ds.metadata["family"] == "swift"
    ustr = ds.containers["PartType0"].field_units["Coordinates"]
    u = ds.ureg.parse(ustr)
    assert math.isclose(u.scale, 3.085678e24, rel_tol=1e-6)  # 1 Mpc in cm
    assert u.dims == (("length", 1.0),)


def test_eagle_field_attr_units(spark, tmp_path):
    """EAGLE-style cgsunits attrs resolve through the same parser."""
    hdr = {"RunLabel": '"Eagle L0025"', "NumPart_ThisFile": [50, 0], **COSMO_HDR}
    store = _snapshot(
        tmp_path / "eagle.h5dir", hdr,
        field_attrs={"Masses": {"cgsunits": "g"}},
    )
    ds = load(str(store), spark=spark)
    assert ds.metadata["family"] == "eagle"
    u = ds.ureg.parse(ds.containers["PartType0"].field_units["Masses"])
    assert u.scale == 1.0 and u.dims == (("mass", 1.0),)


def test_rockstar_merge_into_gizmo(spark, gizmo_store, rockstar_store):
    """load(gizmo, catalog_rockstar_halo=...) merges the rockstar
    catalog under the rockstar_halo root group with its fields directly
    below it (reference gizmo/dataset.py:52-59)."""
    snap = load(gizmo_store, spark=spark, catalog_rockstar_halo=rockstar_store)
    assert "PartType0" in snap.containers and "rockstar_halo" in snap.containers
    halos = snap.data["rockstar_halo"]
    assert halos.df.count() == 40
    assert "mvir" in halos.df.columns  # fields at rockstar_halo/<field>
    assert halos.field_units["mvir"] == "code_mass"
    # explicit merge_data on an already-loaded pair works the same way
    snap2 = load(gizmo_store, spark=spark)
    snap2.merge_data(load(rockstar_store, spark=spark), root_group="rockstar_halo")
    assert snap2.data["rockstar_halo"].df.count() == 40
    with pytest.raises(ValueError, match="already present"):
        snap2.merge_data(load(rockstar_store, spark=spark), root_group="rockstar_halo")


def test_simulation_dir_load_returns_series(spark, tmp_path):
    """load() on a simulation RUN directory (output/snapdir_XXX members)
    returns a DatasetSeries, like the reference's convenience.load on a
    run folder (GadgetStyleSimulation discovery)."""
    from scida_spark.dataset import Dataset
    from scida_spark.fields import FieldContainer
    from scida_spark.customs import SimulationDirType
    from scida_spark.series import DatasetSeries

    out = tmp_path / "run42" / "output"
    for i, z in enumerate([3.0, 1.0, 0.0]):
        p = str(out / f"snapdir_{i:03d}")
        root = FieldContainer(name=f"s{i}")
        root["PartType0"] = FieldContainer(spark.range(10 + i), name="PartType0")
        Dataset(path=p, data=root, metadata={"redshift": z}).save(p)
    run = str(tmp_path / "run42")
    assert determine_type(run) is SimulationDirType
    series = load(run, spark=spark)
    assert isinstance(series, DatasetSeries)
    assert len(series) == 3
    ds = series.get_dataset(redshift=1.0)
    assert ds.metadata["redshift"] == 1.0
    # members numeric-sorted: snapdir_000 first
    assert series.paths[0].endswith("snapdir_000")


def test_gizmo_save_load_roundtrip_units(spark, gizmo_store, tmp_path):
    """Family-loaded dataset → engine-native save → reload: the
    resolved unit strings survive the parquet round trip (column
    metadata), so downstream sessions need neither the family voter
    nor the curated unit file."""
    ds = load(gizmo_store, spark=spark)
    out = str(tmp_path / "native_copy")
    ds.save(out)
    back = load(out, spark=spark)
    cont = back.containers["PartType0"]
    assert cont.df.count() == 50
    assert cont.field_units.get("Masses") == "code_mass"
    assert cont.field_units.get("Coordinates") == "code_length"


def test_explain_detection_surfaces_evidence(gizmo_store):
    """explain_detection ranks votes winner-first with the marker each
    vote rests on (reference DetectionResult evidence)."""
    from scida_spark.dataset import explain_detection

    lines = explain_detection(gizmo_store)
    assert lines and lines[0].startswith("GizmoType: CERTAIN")
    assert "GIZMO_version" in lines[0]
    assert any(line.startswith("GadgetStyleType") for line in lines[1:])
