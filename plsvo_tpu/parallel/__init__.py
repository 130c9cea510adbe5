"""Multi-device capabilities: batched multi-sequence VO and distributed
bundle adjustment (BASELINE.json configs 4-5 — new vs the reference)."""
