"""Detection-ladder tests mirroring the reference's
tests/unit/test_discovertypes.py:48-142: confidence beats specificity,
more-derived classes win ties, unknown paths raise."""

from __future__ import annotations

import json

import numpy as np
import pytest

from scida_spark.dataset import (
    CandidateStatus,
    CatalogAwareParquetType,
    Confidence,
    DatasetType,
    Hdf5Type,
    NpyDirType,
    ParquetDirType,
    ZarrType,
    determine_type,
)


def _touch(p):
    p.write_bytes(b"")


def test_parquet_dir_detected(tmp_path):
    _touch(tmp_path / "lineitem.parquet")
    assert determine_type(str(tmp_path)) is ParquetDirType


def test_catalog_aware_beats_generic_parquet(tmp_path):
    """Equal confidence → more-derived class wins (reference MRO
    tie-break, discovertypes.py:303-334)."""
    _touch(tmp_path / "particles.parquet")
    _touch(tmp_path / "group.parquet")
    _touch(tmp_path / "subhalo.parquet")
    assert determine_type(str(tmp_path)) is CatalogAwareParquetType


def test_zarr_marker_detected(tmp_path):
    (tmp_path / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    assert determine_type(str(tmp_path)) is ZarrType


def test_confidence_beats_specificity(tmp_path):
    """A CERTAIN vote wins over LIKELY regardless of specificity
    (reference test: confidence dominates)."""
    # Directory holds BOTH npy files (LIKELY) and a .zgroup (CERTAIN).
    np.save(tmp_path / "x.npy", np.ones(3))
    (tmp_path / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    assert determine_type(str(tmp_path)) is ZarrType


def test_npy_dir_detected(tmp_path):
    np.save(tmp_path / "Masses.npy", np.ones(3))
    assert determine_type(str(tmp_path)) is NpyDirType


def test_hdf5_by_extension():
    assert determine_type("/data/snap_099.hdf5") is Hdf5Type


def test_unknown_path_raises(tmp_path):
    (tmp_path / "readme.txt").write_text("hi")
    with pytest.raises(ValueError, match="no dataset type"):
        determine_type(str(tmp_path))


def test_custom_type_registration(tmp_path):
    class MagicType(DatasetType):
        @classmethod
        def validate_path(cls, path):
            if path.endswith(".magic"):
                return CandidateStatus(Confidence.CERTAIN, specificity=9)
            return CandidateStatus(Confidence.UNSUPPORTED)

    try:
        assert determine_type("/x/y.magic") is MagicType
    finally:
        DatasetType.registry.remove(MagicType)
