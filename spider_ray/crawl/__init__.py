"""The distributed Ray Data crawl engine (SURVEY.md §3.2, §4)."""
