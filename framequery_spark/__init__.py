"""framequery_spark — a PySpark-native SQL-over-DataFrames engine.

Re-expresses the capabilities of chmp/framequery (pg-flavored SQL over an
ad-hoc table scope) on Spark: parse ourselves, plan with Catalyst. Plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.
"""

from .executor.executor import Executor, execute
from .parser import parse

__version__ = "0.1.0"
__all__ = ["execute", "Executor", "parse", "__version__"]
