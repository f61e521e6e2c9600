"""Plan surface: query AST + compilation entry points.

The query "plan" of this engine mirrors miru's (SURVEY.md §3.1): a filter
AST (`parse_query`) compiled either to a declarative DataFrame program
(`search_distributed` — Catalyst owns scans/joins/top-k) or to the serving
kernel (`search_local` — block-max WAND over postings). No custom Catalyst
rules are required (SURVEY.md §4).
"""

from miru_spark.query.parser import (  # noqa: F401
    And,
    Not,
    Or,
    Prefix,
    Term,
    all_terms,
    parse_query,
    positive_terms,
    prefixes,
    required_terms,
)
from miru_spark.query.scorer import search_distributed, search_local  # noqa: F401
