"""DatasetSeries — ordered collection of datasets (simulation snapshots)
with metadata-based member selection (reference src/scida/series.py:
85-163; nearest-metadata lookup :343-446; JSON metadata cache :448-524).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Sequence


class DatasetSeries:
    def __init__(self, paths: Sequence[str], spark=None, lazy: bool = True,
                 cache_dir: str | None = None, **load_kwargs):
        self.paths = list(paths)
        self._spark = spark
        self._load_kwargs = load_kwargs
        self._datasets: dict[int, object] = {}
        self._metadata: list[dict] | None = None
        self._cache_dir = cache_dir
        if not lazy:
            for i in range(len(self.paths)):
                self.get_dataset(index=i)

    def __len__(self) -> int:
        return len(self.paths)

    def info(self) -> None:
        """Print a series summary (reference ``DatasetSeries.info``,
        series.py:206-230): class, dataset count, and per-dataset
        metadata highlights from the (cached) metadata sweep."""
        lines = [f"class: {type(self).__name__}", f"datasets: {len(self.paths)}"]
        meta = self.metadata
        for i, (p, m) in enumerate(zip(self.paths, meta)):
            z = m.get("redshift")
            ztxt = f" z={float(z):.4g}" if z is not None else ""
            lines.append(f"  [{i}] {p}{ztxt}")
        print("\n".join(lines))

    def __getitem__(self, i: int):
        return self.get_dataset(index=i)

    def _open(self, i: int):
        if i not in self._datasets:
            from scida_spark.dataset import load

            self._datasets[i] = load(self.paths[i], spark=self._spark, **self._load_kwargs)
        return self._datasets[i]

    # -- metadata cache (reference series.py:448-524) -----------------------

    def _cache_path(self) -> str | None:
        if self._cache_dir is None:
            return None
        key = hashlib.md5("|".join(sorted(self.paths)).encode()).hexdigest()[:16]
        return os.path.join(self._cache_dir, f"series_meta_{key}.json")

    @property
    def metadata(self) -> list[dict]:
        if self._metadata is not None:
            return self._metadata
        cp = self._cache_path()
        if cp and os.path.exists(cp):
            # Corrupt/truncated cache (killed process mid-write, disk
            # hiccup) must not wedge the series: fall through to a
            # rebuild that overwrites the bad file (reference behavior,
            # tests/external/test_load.py:114 test_load_cachefail).
            try:
                with open(cp) as fh:
                    loaded = json.load(fh)
                if isinstance(loaded, list) and len(loaded) == len(self.paths):
                    self._metadata = loaded
                    return self._metadata
            except (json.JSONDecodeError, OSError):
                pass
        metas = []
        for i in range(len(self.paths)):
            mpath = os.path.join(self.paths[i], "_metadata.json")
            if os.path.exists(mpath):
                with open(mpath) as fh:
                    metas.append(json.load(fh))
            else:
                metas.append({})
        self._metadata = metas
        if cp:
            os.makedirs(os.path.dirname(cp), exist_ok=True)
            with open(cp, "w") as fh:
                json.dump(metas, fh)
        return metas

    # -- selection (reference series.py:343-446) ----------------------------

    def get_dataset(self, index: int | None = None, name: str | None = None,
                    reltol: float = 1e-2, **metadata_proximity):
        """Select by index, by path name, or by nearest metadata value
        (e.g. ``redshift=2.0``) within relative tolerance."""
        if index is not None:
            return self._open(index)
        if name is not None:
            for i, p in enumerate(self.paths):
                if os.path.basename(p.rstrip("/")) == name:
                    return self._open(i)
            raise KeyError(name)
        if metadata_proximity:
            (key, target), *rest = metadata_proximity.items()
            if rest:
                raise ValueError("one metadata key at a time")
            best_i, best_d = None, float("inf")
            for i, m in enumerate(self.metadata):
                if key not in m:
                    continue
                d = abs(float(m[key]) - float(target))
                if d < best_d:
                    best_i, best_d = i, d
            if best_i is None:
                raise KeyError(f"no member has metadata {key!r}")
            denom = max(abs(float(target)), 1e-300)
            if best_d / denom > reltol and best_d > reltol:
                raise ValueError(
                    f"nearest {key}={self.metadata[best_i][key]} is outside "
                    f"tolerance of target {target}"
                )
            return self._open(best_i)
        raise ValueError("provide index, name, or a metadata key")


def discover_simulation_members(path: str, prefixes: tuple[str, ...] = ("snapdir", "snapshot", "snap")) -> list[str]:
    """Member dataset paths of a simulation directory, numeric-sorted.

    Reference layout (customs/gadgetstyle/series.py:52-120): the run
    folder usually holds an ``output`` subfolder with per-snapshot
    members ``snapdir_XXX`` (or single-file ``snapshot_XXX.hdf5``);
    subbox-style runs keep members directly in the folder. Catalog
    siblings (``groups_XXX``) are NOT members — each member's own load
    discovers and merges its catalog (dataset.discover_catalog_path).
    """
    base = os.path.join(path, "output")
    if not os.path.isdir(base):
        base = path
    members: list[tuple[int, str]] = []
    if not os.path.isdir(base):
        return []
    for entry in os.listdir(base):
        stem = entry
        for ext in (".hdf5", ".h5", ".h5dir", ".zarr"):
            if stem.endswith(ext):
                stem = stem[: -len(ext)]
                break
        parts = stem.split("_")
        if len(parts) < 2 or parts[0] not in prefixes or not parts[-1].isdigit():
            continue
        members.append((int(parts[-1]), os.path.join(base, entry)))
    return [p for _, p in sorted(members)]


def from_directory(path: str, spark=None, lazy: bool = True,
                   cache_dir: str | None = None, **load_kwargs) -> "DatasetSeries":
    """Build a DatasetSeries from a simulation run directory (reference
    ``DatasetSeries.from_directory`` + GadgetStyleSimulation discovery).
    Raises if no members are found — a wrong path should fail loudly,
    not produce an empty series."""
    members = discover_simulation_members(path)
    if not members:
        raise ValueError(f"no snapshot members found under {path!r}")
    return DatasetSeries(members, spark=spark, lazy=lazy, cache_dir=cache_dir,
                         **load_kwargs)


DatasetSeries.from_directory = staticmethod(from_directory)
