from opl_spark.sources.registry import (  # noqa: F401
    TABLES,
    load_table,
    register_sources,
)
from opl_spark.sources.formats import (  # noqa: F401
    infer_format,
    load_any,
    save_any,
)
