"""Plan assembly + checkpoint/lineage orchestration."""
