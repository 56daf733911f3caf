"""pyrml_spark — a from-scratch, PySpark-native RML/R2RML knowledge-graph
construction engine with the query/data-processing capabilities of the
reference pyRML engine (anuzzolese/pyrml, studied read-only at
/root/reference), re-expressed Spark-first:

* mapping Turtle → driver-side MappingPlan IR (:mod:`parse_mapping`)
* TriplesMaps → DataFrame DAG, term maps as native Column expressions
  (:mod:`compiler`, :mod:`terms`)
* GREL/IdLab function library as Column builders + pandas-UDF fallbacks
  (:mod:`functions.registry`)
* (s,p,o,g) string-table output, N-Quads sink, partitioned Parquet sink
* the 10^12-document-scale KG pipeline (mention extraction, entity
  canonicalization via connected components, lineage/checkpointing)
  in :mod:`pyrml_spark.kg`
"""

from .compiler import RMLCompiler, convert  # noqa: F401
from .streaming.rml_stream import convert_stream  # noqa: F401
from .functions.registry import FunctionRegistry, default_registry  # noqa: F401
from .parse_mapping import parse_mapping, parse_mapping_file  # noqa: F401
from .kg.query import kg_query, predicate_stats  # noqa: F401
from .kg.sparql import (sparql_ask, sparql_construct,  # noqa: F401
                        sparql_describe, sparql_select)

__version__ = "0.1.0"
