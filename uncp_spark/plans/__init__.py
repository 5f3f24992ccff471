"""Pipeline plans — staged, checkpointed, resumable composition of the
operator modules (the Spark re-expression of uncp's systems scheduler,
src/systems/scheduler.rs:9-96)."""
