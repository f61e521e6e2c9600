"""Index build/merge/manifest — the write side (SURVEY.md §2.1 S3-S8, S14-S15)."""
