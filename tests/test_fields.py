"""FieldContainer semantics — mirrors the reference's unit tier
(tests/unit/test_fieldcontainer.py, test_field_recipes.py): set/get/del,
keys filtering, aliases, recipe registration/evaluation/memoization,
merge keep-first policy, laziness."""

import pytest
from pyspark.sql import functions as F

from scida_spark.fields import FieldContainer, FieldRecipe


@pytest.fixture()
def cont(spark):
    df = spark.range(10).select(
        F.col("id").alias("uid"),
        (F.col("id") * 2.0).alias("Masses"),
        (F.col("id") + 0.5).alias("Density"),
    )
    return FieldContainer(df, name="PartType0")


def test_get_set_del(spark, cont):
    assert "Masses" in cont
    cont["Volume"] = F.col("Masses") / F.col("Density")
    vals = cont.df.select("Volume").orderBy("uid").collect()
    assert vals[2]["Volume"] == pytest.approx(4.0 / 2.5)
    del cont["Volume"]
    assert "Volume" not in cont
    with pytest.raises(KeyError):
        del cont["nope"]


def test_subcontainers_and_keys(spark, cont):
    sub = FieldContainer(spark.range(3), name="sub")
    cont["Sub"] = sub
    assert cont["Sub"] is sub
    assert "Sub" in cont.keys(withgroups=True)
    assert "Sub" not in cont.keys(withgroups=False)
    assert "Masses" in cont.keys(withfields=True)
    assert "Masses" not in cont.keys(withfields=False, withgroups=False, withrecipes=True)


def test_aliases(cont):
    cont.add_alias("mass", "Masses")
    assert cont._resolve("mass") == "Masses"
    # chained alias
    cont.add_alias("m", "mass")
    assert cont._resolve("m") == "Masses"
    col = cont["m"]
    assert col is not None


def test_recipe_evaluation_and_memoization(cont):
    calls = []

    @cont.register_field(units="code_mass")
    def DoubleMass(c):
        calls.append(1)
        return F.col("Masses") * 2

    assert "DoubleMass" in cont.keys(withrecipes=True)
    assert "DoubleMass" not in cont.df.columns  # lazy until touched
    _ = cont["DoubleMass"]
    assert "DoubleMass" in cont.df.columns
    _ = cont["DoubleMass"]
    assert len(calls) == 1  # memoized (reference fields.py:659-661)
    assert cont.field_units["DoubleMass"] == "code_mass"
    rows = cont.df.select("DoubleMass").orderBy("uid").collect()
    assert rows[3]["DoubleMass"] == 12.0


def test_recipe_dependency_chain(cont):
    @cont.register_field()
    def A(c):
        return F.col("Masses") + 1

    @cont.register_field()
    def B(c):
        return c["A"] * 10  # touching A materializes it first

    # single expression: works even though cont.df is evaluated BEFORE
    # cont["B"] materializes (recipes return composed expressions)
    rows = cont.df.withColumn("B_", cont["B"]).orderBy("uid").collect()
    assert rows[1]["B_"] == (2.0 + 1) * 10
    assert "B" in cont.df.columns  # and the container df gained the field


def test_recipe_ureg_injection(spark, cont):
    from scida_spark.units import UnitRegistry

    cont.ureg = UnitRegistry()

    @cont.register_field()
    def WithU(c, ureg):
        assert ureg is cont.ureg
        return F.lit(1.0)

    _ = cont["WithU"]


def test_merge_keep_first(spark, cont):
    other = FieldContainer(spark.range(5), name="other")
    sub_a = FieldContainer(spark.range(2), name="A")
    other["Group"] = sub_a
    other._recipes["R"] = FieldRecipe("R", lambda c: F.lit(0))
    cont._recipes["R"] = FieldRecipe("R", lambda c: F.lit(1))
    cont.merge(other)
    assert cont["Group"] is sub_a
    # keep-first: our R wins (reference gadgetstyle/dataset.py:190-193)
    assert cont._recipes["R"].func(None) is not None
    df = cont.df.select(cont._recipes["R"].func(None).alias("r"))
    assert df.first()["r"] == 1
