"""Query side: parse → filter AST → candidate set → BM25 top-k (SURVEY.md §2.2-2.6)."""
