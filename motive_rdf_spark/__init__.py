"""motive_rdf_spark — a from-scratch PySpark-native knowledge-graph
construction + motif-induction engine with the query/data-processing
capabilities of MaestroGraph/motive-rdf.

Spark-first design: all set-at-a-time work is DataFrame/Catalyst; only
pattern bookkeeping, MDL coders over tiny collected vectors, and the
search control loop live on the driver.

Reference semantics: /root/reference (motive-rdf, Java). Citations in
docstrings use ``file:line`` of that repo.
"""

from motive_rdf_spark.patterns import Pattern
from motive_rdf_spark.session import get_spark

__all__ = ["Pattern", "get_spark"]
__version__ = "0.1.0"
