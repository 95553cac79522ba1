"""Pure-Python FITS source tests (astropy gated — the parsing/planning
layer is real; byte reads require astropy)."""

from __future__ import annotations

import pytest

from scida_spark.sources.fits import (
    HAS_ASTROPY,
    parse_tform,
    schema_from_bintable_header,
)
from scida_spark.sources.hdf5 import plan_splits, prune_splits_for_uid_range


def test_parse_tform():
    from pyspark.sql.types import DoubleType, FloatType, IntegerType, LongType

    assert parse_tform("D") == (1, DoubleType())
    assert parse_tform("3D") == (3, DoubleType())
    assert parse_tform("E") == (1, FloatType())
    assert parse_tform("J") == (1, IntegerType())
    assert parse_tform("1K") == (1, LongType())
    assert parse_tform("16X")[1] is None  # bit array → skipped
    assert parse_tform("PE(100)")[1] is None  # variable-length → skipped


def test_schema_from_bintable_header():
    cards = {
        "TFIELDS": 5,
        "NAXIS2": 1234,
        "TTYPE1": "ra",
        "TFORM1": "D",
        "TTYPE2": "dec",
        "TFORM2": "D",
        "TTYPE3": "flux",
        "TFORM3": "3E",
        "TTYPE4": "source_id",
        "TFORM4": "K",
        "TTYPE5": "flags",
        "TFORM5": "16X",  # unsupported → skipped
    }
    schema, nrows, kept = schema_from_bintable_header(cards)
    assert nrows == 1234
    assert kept == ["ra", "dec", "flux", "source_id"]
    assert schema.fieldNames() == ["uid", "ra", "dec", "flux", "source_id"]
    assert schema["flux"].dataType.typeName() == "array"


def test_split_plan_and_pruning_shared_with_hdf5():
    splits = plan_splits([("f.fits", 1000)], "hdu1", 300)
    assert [(s.row_start, s.row_stop, s.uid_start) for s in splits] == [
        (0, 300, 0),
        (300, 600, 300),
        (600, 900, 600),
        (900, 1000, 900),
    ]
    pruned = prune_splits_for_uid_range(splits, 350, 650)
    assert [(s.uid_start) for s in pruned] == [300, 600]


def test_gate_message_without_astropy():
    if HAS_ASTROPY:
        pytest.skip("astropy available")
    from scida_spark.sources.fits import _require_astropy

    with pytest.raises(ImportError, match="astropy"):
        _require_astropy()
