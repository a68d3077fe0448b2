"""Operators (SURVEY.md §2): tiler, neighbors, dispatch, heights, dedup,
similarity, textstats, multimodal."""
