"""meza_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of reubano/meza, re-expressed Spark-first.

The reference (meza, /root/reference) is a pure-Python, row-at-a-time,
generator-of-dicts ETL toolkit (see SURVEY.md). This package provides the
same surface — readers, messy-string type casts, sampling type inference,
and ~20 relational/dataflow operators — as declarative DataFrame
transformations so Catalyst/Tungsten handle optimization, shuffling,
codegen, and scale-out. Nothing here materializes data on the driver
unless the result is explicitly small (e.g. ``peek``/``detect_types``
samples).

Layout:
    meza_spark.process    relational/dataflow operators (ref: meza/process.py)
    meza_spark.convert    messy-string cast expression pack (ref: meza/convert.py)
    meza_spark.typetools  sampling type inference (ref: meza/typetools.py)
    meza_spark.functions  scalar helpers (ref: meza/fntools.py)
    meza_spark.io         readers/writers (ref: meza/io.py)
    meza_spark.llm        LLM-data-pipeline ops (dedup, similarity, text)
    meza_spark.streaming  Structured Streaming variants
    meza_spark.session    SparkSession factory tuned for the engine
"""

__version__ = "0.1.0"

ENCODING = "utf-8"

# Currency symbols stripped by the numeric casts (ref: meza/__init__.py:31)
CURRENCIES = ("$", "£", "€")

# Null-word list recognized by the casts (ref: meza/fntools.py:572)
NULL_WORDS = ("na", "n/a", "none", "null", ".")

# Truthy/falsy word lists for to_bool (ref: meza/fntools.py:47-48)
BOOL_TRUE = ("yes", "y", "true", "t")
BOOL_FALSE = ("no", "n", "false", "f")
