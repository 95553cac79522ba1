"""FieldContainer — the reference's core data-model abstraction
(src/scida/fields.py:83-137) re-expressed on DataFrames.

A container is a mutable namespace of:
  * fields          → columns of one backing DataFrame (all fields of a
                      container share the row count, cf. ``fieldlength``
                      fields.py:272-299)
  * sub-containers  → nested FieldContainers (particle types, catalogs)
  * field recipes   → named deferred column definitions evaluated and
                      memoized on first access (fields.py:627-663,
                      :665-734)
  * aliases         → alternative names (fields.py:121, :531-547)

Laziness is free: a "field" is a Spark Column expression on a lazy
DataFrame, so nothing executes until an action — the same guarantee the
reference gets from dask, with Catalyst doing projection pruning (only
touched fields reach the scan; mirrors tests/external/test_fields.py's
<10-fields-instantiated assertion).
"""

from __future__ import annotations

import inspect
from collections.abc import Callable, MutableMapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FieldRecipe:
    """Named deferred field: ``func(container) -> Column`` (reference
    FieldRecipe/DerivedFieldRecipe, fields.py:31-80). ``units`` is the
    declared output unit string (fields.py:52)."""

    def __init__(self, name: str, func: Callable, units: str | None = None,
                 description: str = ""):
        self.name = name
        self.func = func
        self.units = units
        self.description = description


class FieldContainer(MutableMapping):
    def __init__(self, df: DataFrame | None = None, *, name: str = "",
                 aliases: dict[str, str] | None = None, ureg=None):
        self._df = df
        self.name = name
        self._containers: dict[str, FieldContainer] = {}
        self._recipes: dict[str, FieldRecipe] = {}
        self._aliases: dict[str, str] = dict(aliases or {})
        self._materialized: set[str] = set()
        self._expressions: dict[str, Column] = {}
        self.field_units: dict[str, str] = {}
        # Per-field on-disk unit attributes (``to_cgs``/``*_scaling``
        # etc., collected during the HDF5 schema walk — reference
        # mixins/units.py:122-260); resolved into field_units by
        # apply_simulation_config with the curated-YAML mismatch check.
        self.field_unit_attrs: dict[str, dict] = {}
        self.ureg = ureg

    # -- DataFrame access ---------------------------------------------------

    @property
    def df(self) -> DataFrame:
        if self._df is None:
            raise ValueError(f"container {self.name!r} has no backing DataFrame")
        return self._df

    def to_dataframe(self) -> DataFrame:
        """The reference's ``get_dataframe`` bridge (fields.py:466-529) —
        trivially native here; materializes all recipes first."""
        for r in list(self._recipes):
            self._materialize(r)
        return self.df

    # -- alias / name resolution -------------------------------------------

    def add_alias(self, alias: str, target: str) -> None:
        self._aliases[alias] = target

    def _resolve(self, key: str) -> str:
        seen = set()
        while key in self._aliases and key not in seen:
            seen.add(key)
            key = self._aliases[key]
        return key

    # -- recipes ------------------------------------------------------------

    def register_field(self, name: str | None = None, *, units: str | None = None,
                       description: str = ""):
        """Decorator registering a derived-field recipe (reference
        ``register_field``, fields.py:381-434). The function receives the
        container and, if its signature asks for them, ``ureg``/``df``
        (kwargs injection by signature inspection, helpers_misc.py:79-119).
        """

        def deco(func: Callable):
            fname = name or func.__name__
            self._recipes[fname] = FieldRecipe(fname, func, units, description)
            self._materialized.discard(fname)
            return func

        return deco

    def _materialize(self, key: str) -> None:
        if key in self._materialized or key not in self._recipes:
            return
        recipe = self._recipes[key]
        params = inspect.signature(recipe.func).parameters
        kwargs = {}
        if "ureg" in params:
            kwargs["ureg"] = self.ureg
        if "df" in params:
            kwargs["df"] = self._df
        col = recipe.func(self, **kwargs)
        # Keep the composed *expression*: it resolves against any
        # DataFrame carrying the base columns, so callers that captured
        # ``container.df`` before first access aren't broken (Python
        # evaluates ``cont.df.withColumn("x", cont["recipe"])`` left to
        # right). The df is also updated so ``.df`` exposes the field.
        self._expressions[key] = col
        self._df = self._df.withColumn(key, col)
        self._materialized.add(key)
        if recipe.units is not None:
            self.field_units[key] = recipe.units

    # -- mapping protocol ---------------------------------------------------

    def __getitem__(self, key: str):
        key = self._resolve(key)
        if key in self._containers:
            return self._containers[key]
        if key in self._recipes and key not in self._materialized:
            self._materialize(key)
        if key in self._expressions:
            return self._expressions[key]
        if self._df is not None and key in self._df.columns:
            return F.col(key)
        raise KeyError(key)

    def __setitem__(self, key: str, value) -> None:
        if isinstance(value, FieldContainer):
            self._containers[key] = value
        elif isinstance(value, Column):
            self._df = self.df.withColumn(key, value)
        elif isinstance(value, FieldRecipe):
            self._recipes[key] = value
        else:
            self._df = self.df.withColumn(key, F.lit(value))

    def __delitem__(self, key: str) -> None:
        key = self._resolve(key)
        if key in self._containers:
            del self._containers[key]
        elif key in self._recipes:
            del self._recipes[key]
            self._materialized.discard(key)
        elif self._df is not None and key in self._df.columns:
            self._df = self._df.drop(key)
        else:
            raise KeyError(key)

    def keys(self, withrecipes: bool = True, withgroups: bool = True,
             withfields: bool = True) -> list[str]:
        """Mirrors the reference's keys() filtering switches
        (fields.py, tests/unit/test_fieldcontainer.py)."""
        out: list[str] = []
        if withfields and self._df is not None:
            out.extend(self._df.columns)
        if withrecipes:
            out.extend(k for k in self._recipes if k not in out)
        if withgroups:
            out.extend(self._containers)
        return out

    def __iter__(self):
        return iter(self.keys())

    def __len__(self) -> int:
        return len(self.keys())

    def __contains__(self, key) -> bool:
        key = self._resolve(key)
        return (
            key in self._containers
            or key in self._recipes
            or (self._df is not None and key in self._df.columns)
        )

    # -- info (reference fields.py:189-223) ----------------------------------

    def info(self, level: int = 0, name: str | None = None,
             counts: bool = False) -> str:
        """Indented tree summary: per container, field / recipe /
        sub-container counts (reference ``FieldContainer.info``,
        fields.py:189-223). ``counts=True`` additionally runs a Spark
        ``count()`` per backed container for entry counts — off by
        default because on a 100 TB table that is a full scan job, not
        a metadata lookup (the reference reads lengths from dask chunk
        metadata; parquet row-counts are only as cheap when the footer
        is already cached)."""
        if name is None:
            name = self.name or "root"
        stats = []
        nfields = len(self._df.columns) if self._df is not None else 0
        if nfields:
            stats.append(f"fields: {nfields}")
        if counts and self._df is not None:
            stats.append(f"entries: {self._df.count()}")
        if self._recipes:
            stats.append(f"recipes: {len(self._recipes)}")
        if self._containers:
            stats.append(f"containers: {len(self._containers)}")
        rep = "%s+ %s (%s)\n" % ("  " * level, name, ", ".join(stats))
        for k, cntr in self._containers.items():
            rep += cntr.info(level + 1, name=k, counts=counts)
        return rep

    # -- merge (reference fields.py:224-255) --------------------------------

    def merge(self, other: "FieldContainer", overwrite: bool = False) -> None:
        """Merge another container's sub-containers and recipes; on name
        collision keep-first unless overwrite (reference keep-first policy,
        customs/gadgetstyle/dataset.py:190-193)."""
        for k, v in other._containers.items():
            if overwrite or k not in self._containers:
                self._containers[k] = v
        for k, v in other._recipes.items():
            if overwrite or k not in self._recipes:
                self._recipes[k] = v
        if self._df is None:
            self._df = other._df
        self._aliases.update(
            {k: v for k, v in other._aliases.items() if overwrite or k not in self._aliases}
        )

    def with_units(self, key: str):
        """Field as a :class:`~scida_spark.units.UnitColumn` (pint-
        Quantity surface): unit taken from ``field_units`` (declared by
        recipes or read from column metadata), dimensionless if absent.
        """
        from scida_spark.units import UnitColumn

        col = self[key]
        unit = self.field_units.get(self._resolve(key), "dimensionless")
        return UnitColumn(col, unit, self.ureg)

    def split_vector_field(self, key: str, names: list[str] | None = None) -> list[str]:
        """Split a 2-D (array-typed) field into scalar columns
        ``key0, key1, ...`` — the reference's DataFrame-bridge behavior
        for 2-D fields (fields.py:516-521). Returns the new column names.
        """
        key = self._resolve(key)
        dt = dict(zip(self.df.columns, [f.dataType for f in self.df.schema.fields]))[key]
        if dt.typeName() != "array":
            raise TypeError(f"{key} is not an array column")
        k = self.df.select(F.size(F.col(key)).alias("k")).first()["k"]
        out_names = names or [f"{key}{i}" for i in range(k)]
        df = self.df
        for i, nm in enumerate(out_names):
            df = df.withColumn(nm, F.col(key).getItem(i))
        self._df = df
        return out_names

    def copy_skeleton(self) -> "FieldContainer":
        new = FieldContainer(self._df, name=self.name, aliases=dict(self._aliases),
                             ureg=self.ureg)
        new._containers = dict(self._containers)
        new._recipes = dict(self._recipes)
        return new
