"""Function catalogs mapping the reference's scalar/aggregate/array/window
names (SURVEY §2.8-2.10) to pyspark.sql.functions built-ins."""
