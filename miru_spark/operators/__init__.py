"""miru plugin surface re-expressed as DataFrame programs (SURVEY.md §2.4-2.7)."""
