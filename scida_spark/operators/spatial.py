"""Spatial operators: periodic-boundary distances and rectangular cutouts.

Reference: ``get_box_mask`` / rectangular cutout with periodic wrap
(src/scida/misc.py:181-231, exposed via
src/scida/interfaces/mixins/spatial.py:96-113):
``d = |x - c|; d = where(d > box/2, box - d, d); mask = all(d < w/2)``.

Pure Column arithmetic — stays inside whole-stage codegen; with a
spatially-bucketed layout the same predicate prunes partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pbc_distance_1d(x: Column, center: float, box_size: float) -> Column:
    """Periodic minimum-image distance along one axis."""
    d = F.abs(x - F.lit(center))
    return F.when(d > box_size / 2.0, F.lit(box_size) - d).otherwise(d)


def box_mask(
    coords: list[Column], center: list[float], widths: list[float], box_size: float
) -> Column:
    """Boolean mask: inside an axis-aligned box with periodic wrap."""
    mask = F.lit(True)
    for x, c, w in zip(coords, center, widths):
        mask = mask & (pbc_distance_1d(x, c, box_size) < w / 2.0)
    return mask


def rect_cutout(
    df: DataFrame,
    coord_col: str,
    center: list[float],
    widths: list[float],
    box_size: float,
) -> DataFrame:
    """Rectangular spatial cutout over an ARRAY<DOUBLE> coordinate column."""
    coords = [F.col(coord_col)[i] for i in range(len(center))]
    return df.filter(box_mask(coords, center, widths, box_size))


def pbc_radial_distance(coords: list[Column], center: list[float], box_size: float) -> Column:
    """Euclidean distance under the minimum-image convention."""
    total = F.lit(0.0)
    for x, c in zip(coords, center):
        d = pbc_distance_1d(x, c, box_size)
        total = total + d * d
    return F.sqrt(total)
