"""Incremental / resumable processing (SURVEY.md §2.8).

The reference is not a stream engine — its 'streaming' is a control
loop (src/engine.rs:66-102) plus incremental re-scan; this package
carries those semantics (T1-T5) as snapshot-diff operators and the
checkpointed stage protocol in plans/pipeline.py."""
