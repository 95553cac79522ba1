"""Unit layer: algebra, code units, parsing, mismatch policy, column
metadata round-trip (mirrors reference tests/integration/
test_units_loading.py semantics at the algebra level)."""

import math
import warnings

import pytest

from scida_spark.units import Unit, UnitRegistry, get_column_unit, set_column_unit


def test_algebra():
    reg = UnitRegistry()
    kpc, msun, s = reg["kpc"], reg["Msun"], reg["s"]
    rho = msun / kpc**3
    assert rho.same_dimensions(reg["g"] / reg["cm"] ** 3)
    v = kpc / s
    assert not v.same_dimensions(rho)
    with pytest.raises(ValueError):
        v.conversion_factor(rho)


def test_code_units_gadget():
    """FIXTURES.md §6: UnitLength=3.085678e21 cm (kpc), UnitMass=1.989e43 g
    (1e10 Msun), h=0.7 → code_length = kpc/h, code_mass = 1e10 Msun/h."""
    reg = UnitRegistry()
    reg.define_code_units(
        h=0.7, a=1.0, unit_length_cm=3.085678e21, unit_mass_g=1.989e43,
        unit_velocity_cm_s=1e5,
    )
    cl = reg["code_length"]
    assert cl.conversion_factor(reg["kpc"]) == pytest.approx(1 / 0.7)
    cm_ = reg["code_mass"]
    assert cm_.conversion_factor(reg["Msun"]) == pytest.approx(1e10 / 0.7)
    assert reg["h"].scale == pytest.approx(0.7)


def test_parse_expressions():
    reg = UnitRegistry()
    u = reg.parse("Msun / kpc**3")
    assert u.same_dimensions(reg["g"] / reg["cm"] ** 3)
    u2 = reg.parse("1e10 * Msun")
    assert u2.scale == pytest.approx(1e10 * 1.989e33)
    assert reg.parse("").same_dimensions(Unit.dimensionless())


def test_isclose_rtol():
    a = Unit(1.0, (("length", 1),))
    b = Unit(1.0005, (("length", 1),))
    c = Unit(1.01, (("length", 1),))
    assert a.isclose(b)  # within 1e-3 (reference units.py:668-733)
    assert not a.isclose(c)


def test_missing_policy():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        reg = UnitRegistry(missing_units="warn")
        u = reg.parse("frobnicate")
        assert u.name == "unknown"
        assert any("frobnicate" in str(x.message) for x in w)
    reg2 = UnitRegistry(missing_units="raise")
    with pytest.raises(KeyError):
        reg2.parse("frobnicate")
    reg3 = UnitRegistry(missing_units="ignore")
    assert reg3.parse("frobnicate").name == "unknown"


def test_column_metadata_roundtrip(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "Masses")
    df = set_column_unit(df, "Masses", "code_mass")
    assert get_column_unit(df, "Masses") == "code_mass"
    p = str(tmp_path / "u.parquet")
    df.write.mode("overwrite").parquet(p)
    df2 = spark.read.parquet(p)
    assert get_column_unit(df2, "Masses") == "code_mass"


# --- UnitColumn wrapper ----------------------------------------------------


def test_unitcolumn_propagation(spark):
    from pyspark.sql import functions as F
    from scida_spark.units import UnitColumn, UnitRegistry

    ureg = UnitRegistry()
    df = spark.createDataFrame([(2.0, 3.0)], "d double, t double")
    dist = UnitColumn(F.col("d"), "km", ureg)
    dur = UnitColumn(F.col("t"), "s", ureg)
    speed = dist / dur
    assert speed.unit.same_dimensions(ureg.parse("cm") / ureg.parse("s"))
    # km/s -> cm/s is a factor of 1e5.
    v = df.select(speed.to("cm / s").alias("v")).first()["v"]
    assert v == pytest.approx(2.0 / 3.0 * 1e5)


def test_unitcolumn_addition_autoconverts(spark):
    from pyspark.sql import functions as F
    from scida_spark.units import UnitColumn, UnitRegistry

    ureg = UnitRegistry()
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    km = UnitColumn(F.col("a"), "km", ureg)
    cm = UnitColumn(F.col("b"), "cm", ureg)
    total = km + cm  # right side auto-converted to km
    got = df.select(total.alias("x")).first()["x"]
    assert got == pytest.approx(1.0 + 2.0 / 1e5)
    assert str(total.unit) == "km"


def test_unitcolumn_incompatible_raises(spark):
    from pyspark.sql import functions as F
    from scida_spark.units import UnitColumn, UnitRegistry

    ureg = UnitRegistry()
    with pytest.raises(ValueError, match="incompatible"):
        _ = UnitColumn(F.col("a"), "km", ureg) + UnitColumn(F.col("b"), "g", ureg)


def test_unitcolumn_power_and_scalar(spark):
    from pyspark.sql import functions as F
    from scida_spark.units import UnitColumn, UnitRegistry

    ureg = UnitRegistry()
    df = spark.createDataFrame([(3.0,)], "x double")
    r = UnitColumn(F.col("x"), "cm", ureg)
    area = (r ** 2) * 2.0
    assert dict(area.unit.dims)["length"] == 2
    assert df.select(area.alias("a")).first()["a"] == pytest.approx(18.0)


def test_container_with_units(spark):
    from scida_spark.fields import FieldContainer
    from scida_spark.units import UnitRegistry

    ureg = UnitRegistry()
    df = spark.createDataFrame([(4.0,)], "Masses double")
    cont = FieldContainer(df, name="gas", ureg=ureg)
    cont.field_units["Masses"] = "Msun"
    m = cont.with_units("Masses")
    grams = df.select(m.to("g").alias("g")).first()["g"]
    assert grams == pytest.approx(4.0 * 1.989e33)


def test_grouped_unit_propagation_builtin(spark):
    """VERDICT r2 item #4: grouped() results carry unit metadata for
    unit-bearing inputs (reference probes func output units,
    arepo/dataset.py:1529-1576; reductions propagate analytically)."""
    from scida_spark.operators import catalog as C
    from scida_spark.units import get_column_unit, set_column_unit

    df = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (1, 3.0)], "GroupID long, Masses double"
    )
    df = set_column_unit(df, "Masses", "code_mass")
    for op, col in [("sum", "sum_Masses"), ("min", "min_Masses"),
                    ("max", "max_Masses"), ("mean", "mean_Masses")]:
        out = getattr(C.grouped(df, ["Masses"]), op)().evaluate()
        assert get_column_unit(out, col) == "code_mass", op
    # count is dimensionless -> no unit metadata
    out = C.grouped(df, ["Masses"]).count().evaluate()
    assert get_column_unit(out, "count_Masses") is None
    # chained half->sum goes through applyInPandas and still preserves
    out = C.grouped(df, ["Masses"]).half().sum().evaluate()
    assert get_column_unit(out, "Masses") == "code_mass"
    assert out.count() == 2


def test_grouped_unit_propagation_apply(spark):
    from scida_spark.operators import catalog as C
    from scida_spark.units import get_column_unit, set_column_unit

    df = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (1, 3.0)], "GroupID long, Masses double"
    )
    df = set_column_unit(df, "Masses", "code_mass")
    # declared units dict
    out = C.grouped(df, ["Masses"]).apply(
        lambda p: p.head(1), "GroupID long, Masses double", units={"Masses": "Msun"}
    ).evaluate()
    assert get_column_unit(out, "Masses") == "Msun"
    # probe mode: func declares units on its output frame's attrs
    def fn(p):
        o = p.head(1).copy()
        o.attrs["units"] = {"Masses": "kg"}
        return o

    out = C.grouped(df, ["Masses"]).apply(
        fn, "GroupID long, Masses double", units="probe"
    ).evaluate()
    assert get_column_unit(out, "Masses") == "kg"
    assert out.count() == 2
    # no units declared -> no metadata
    out = C.grouped(df, ["Masses"]).apply(
        lambda p: p.head(1), "GroupID long, Masses double"
    ).evaluate()
    assert get_column_unit(out, "Masses") is None
