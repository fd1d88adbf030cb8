"""Source connectors (SURVEY.md §2.1 S-operators): metadata CSV/JSON
ingestion with nested-type repair, URL-list readers, binary-file
scans, and transport-injected crawl fetchers.
"""
