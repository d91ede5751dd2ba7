"""Write policies and job drivers (compaction, incremental, backfill)."""
