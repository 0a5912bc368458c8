"""Structured Streaming surface (placeholder).

The reference is batch-round-structured (SURVEY.md §3); streaming is an
alternative driver loop (`readStream` on a frontier delta dir +
`foreachBatch(run_round)`), planned for a later round.
"""
