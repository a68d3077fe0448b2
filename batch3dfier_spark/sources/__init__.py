"""Sources & sinks (SURVEY.md §2.1): pages reader/ingest, extent reader,
asset manifest."""
