"""Histogram operators: 1-D / 2-D fixed-bin histograms as bucketed groupBy.

Reference usage: ``da.histogram`` / ``da.histogram2d``
(docs/tutorial/observations.md:120-160, docs/visualization.md:41-55).

Spark form: ``floor((x - lo) / width)`` bucket keys + groupBy count —
one shuffle over O(bins) keys with map-side combine; the grid never
materializes on the driver. Matches numpy bin conventions: values on
the upper edge of the last bin are included in it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_index(x: Column, lo: float, hi: float, nbins: int) -> Column:
    width = (hi - lo) / nbins
    raw = F.floor((x - F.lit(lo)) / F.lit(width)).cast("long")
    # numpy convention: x == hi falls in the last bin; the least() also
    # clips in-range values whose inexact division rounds up to nbins
    # (possible when width is not exactly representable).
    return F.least(raw, F.lit(nbins - 1))


def histogram1d(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int, weight_col: str | None = None
) -> DataFrame:
    """Returns (bin, count[, weight_sum]); out-of-range rows are dropped."""
    x = F.col(col)
    binned = df.filter((x >= lo) & (x <= hi)).withColumn("bin", _bin_index(x, lo, hi, nbins))
    aggs = [F.count("*").alias("count")]
    if weight_col:
        aggs.append(F.sum(weight_col).alias("weight_sum"))
    return binned.groupBy("bin").agg(*aggs)


def histogram2d(
    df: DataFrame,
    xcol: str,
    ycol: str,
    xrange: tuple[float, float],
    yrange: tuple[float, float],
    bins: tuple[int, int],
    weight_col: str | None = None,
) -> DataFrame:
    """Returns (xbin, ybin, count[, weight_sum])."""
    x, y = F.col(xcol), F.col(ycol)
    in_range = (x >= xrange[0]) & (x <= xrange[1]) & (y >= yrange[0]) & (y <= yrange[1])
    binned = (
        df.filter(in_range)
        .withColumn("xbin", _bin_index(x, xrange[0], xrange[1], bins[0]))
        .withColumn("ybin", _bin_index(y, yrange[0], yrange[1], bins[1]))
    )
    aggs = [F.count("*").alias("count")]
    if weight_col:
        aggs.append(F.sum(weight_col).alias("weight_sum"))
    return binned.groupBy("xbin", "ybin").agg(*aggs)
