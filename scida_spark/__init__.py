"""scida_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference (cbyrohl/scida), rebuilt
Spark-first: DataFrames + Catalyst instead of dask arrays + hand-rolled
chunk planning.

Public surface:
  * ``load(path)`` → :class:`Dataset` (dict-of-DataFrames handle)
  * ``get_spark()`` → tuned SparkSession
  * ``operators`` / ``functions`` / ``streaming`` subpackages
"""

from scida_spark.session import ensure_session_defaults, get_spark

__all__ = ["get_spark", "ensure_session_defaults", "load", "Dataset"]
__version__ = "0.1.0"


def load(path, spark=None, **kwargs):
    """Open a dataset directory/file → Dataset handle (lazy DataFrames).

    Mirrors ``scida.load()`` (reference src/scida/convenience.py:287-396)
    but dispatches on storage format to a Spark reader.
    """
    from scida_spark.dataset import load as _load

    return _load(path, spark=spark, **kwargs)


def __getattr__(name):
    if name == "Dataset":
        from scida_spark.dataset import Dataset

        return Dataset
    raise AttributeError(name)
