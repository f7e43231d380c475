"""Column helpers + scalar utilities (SURVEY §2.8): dtype promotion, nodata,
id/string functions, date helpers, band set ops."""

from geedim_spark.functions.dtypes import promote_dtype, nodata_for  # noqa: F401
