"""Operators (SURVEY.md §2): tiler, neighbors, dispatch, heights, bag3d,
dedup, similarity, textstats, sampling, multimodal, raster, sessions."""
