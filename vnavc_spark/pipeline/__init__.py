"""Stage-level pipeline transforms (SURVEY.md §3 lifecycles).

Every stage is a pure ``DataFrame → DataFrame`` transform; side
effects (HTTP, audio decode, subprocess tools) are confined to
pandas-UDF islands with injectable dependencies so tests stay
hermetic. Stages persist to Parquet between phases (the reference's
per-stage CSV rewrites become columnar staging tables).
"""
