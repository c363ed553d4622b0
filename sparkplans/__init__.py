"""sparkplans — a PySpark-native optimal-plans analytics engine.

A brand-new engine with the query and data-processing capabilities of
``NGA-TRAN/datafusion-optimal-plans`` (see ``SURVEY.md``), built
Spark-first: the DataFrame/SQL API declares logical plans, Catalyst +
AQE pick physical strategies, and a thin order-aware layer on top
tracks declared file sort orders (the reference's ``WITH ORDER``
feature, ``docs/2_cli_create_tables.md:17-23``) to elide redundant
sorts and shuffles that Catalyst cannot know about.

Public surface::

    from sparkplans import Engine, EngineOptions
    eng = Engine()                       # builds/configures a SparkSession
    eng.create_external_table("dim", path, format="parquet",
                              with_order=["env", "service", "host"])
    df = eng.table("dim").order_by("env", "service").df   # sort elided
    eng.sql("SELECT ...")                # plain Spark SQL over registered tables
    eng.explain(df, mode="analyze")      # plan inspection surface
"""

from sparkplans.session import EngineOptions, build_session, configure_session
from sparkplans.ordering import SortKey, normalize_sort_keys, ordering_satisfies
from sparkplans.catalog import Catalog, TableSpec
from sparkplans.engine import Engine, OrderedFrame
from sparkplans import plans

__all__ = [
    "Engine",
    "EngineOptions",
    "OrderedFrame",
    "Catalog",
    "TableSpec",
    "SortKey",
    "normalize_sort_keys",
    "ordering_satisfies",
    "build_session",
    "configure_session",
    "plans",
]

__version__ = "0.1.0"
