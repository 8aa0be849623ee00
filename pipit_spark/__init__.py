"""pipit-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of hpcgroup/pipit (reference at
/root/reference, MIT), re-architected for distributed execution —
DataFrame/SQL plans optimized by Catalyst, grouped-map pandas UDFs only
where per-location sequential semantics demand it, plus LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
designed for the 100 TB scale point.
"""

from .trace import Trace
from .session import get_spark
from .config import (
    get_option,
    set_option,
    reset_option,
    reset_all_options,
)

__all__ = [
    "Trace",
    "get_spark",
    "get_option",
    "set_option",
    "reset_option",
    "reset_all_options",
]
__version__ = "0.1.0"
