"""rust_dataframe_spark — a PySpark-native engine with the query and
data-processing capabilities of RubyOnWorld/rust-dataframe (see SURVEY.md).

Public surface:

* :class:`~rust_dataframe_spark.context.Context` / :func:`get_spark`
* :class:`~rust_dataframe_spark.frame.Frame` — the reference's dataframe verbs
* :mod:`rust_dataframe_spark.functions` — scalar/aggregate/array/window catalogs
* :mod:`rust_dataframe_spark.operators` — joins, dedup, similarity, text, histogram
* :mod:`rust_dataframe_spark.sources` — csv/json/parquet/jdbc readers & writers
* :mod:`rust_dataframe_spark.streaming` — structured-streaming helpers
"""

from .context import Context, get_spark
from .frame import Frame, JoinCriteria, SortCriteria

__all__ = ["Context", "get_spark", "Frame", "JoinCriteria", "SortCriteria"]
__version__ = "0.1.0"
