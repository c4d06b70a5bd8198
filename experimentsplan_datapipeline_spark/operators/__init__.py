"""DataFrame operator library (SURVEY.md §2)."""
