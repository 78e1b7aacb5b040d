"""The declared query surface (SURVEY.md section 2).

Importing this package populates the registry; `all_queries()` is what
`__spark_entry__.queries()` / `oracle_sql()` and the tests consume.
"""

from .registry import QuerySpec, all_queries, query  # noqa: F401

# Import side-effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import setops  # noqa: E402,F401
from . import text_json  # noqa: E402,F401
from . import llm_pipeline  # noqa: E402,F401
from . import pipelines  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import features  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import profiling  # noqa: E402,F401
from . import lakehouse  # noqa: E402,F401
from . import diagnostics  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import matching  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import intervals  # noqa: E402,F401
from . import cooccurrence  # noqa: E402,F401
from . import evaluation  # noqa: E402,F401
from . import audit  # noqa: E402,F401
from . import modelops  # noqa: E402,F401
from . import survival  # noqa: E402,F401
from . import mdm  # noqa: E402,F401
from . import maintenance  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import spatial  # noqa: E402,F401
from . import linalg  # noqa: E402,F401
from . import learning  # noqa: E402,F401
from . import stats_inference  # noqa: E402,F401
