"""T3 — cooperative cancellation for pipeline runs.

uncp threads a ``CancellationToken`` through every system and checks it
between work batches (src/systems/mod.rs:174-192); a cancelled run
loses at most one autosave interval. The Spark translation has two
levers, both wrapped here:

  cooperative   the pipeline checks the token between stages; a cancel
                costs at most the in-flight stage, and because every
                finished stage is checkpointed, a later resume() rerun
                skips everything already done (the autosave analogue).
  in-flight     the token binds a Spark job *group*; ``cancel()`` calls
                ``SparkContext.cancelJobGroup``, which interrupts the
                currently-running Spark jobs themselves (long stages
                don't have to finish before the cancel lands).

T1 Pause/Resume (uncp ``EngineCommand::Pause``/``Resume``,
src/engine.rs:66-81: the engine loop stops picking up work but keeps
all state, then continues in-process): ``pause()`` makes the pipeline
block at the NEXT stage boundary — the in-flight stage finishes and its
checkpoint lands, then no new Spark jobs are submitted until
``resume()``. A long 100 TB run can yield the cluster mid-pipeline and
continue later without losing the run (cancel+restart would re-pay
driver/session setup and plan warmup). ``cancel()`` always wins over a
pause: a paused pipeline raises ``CancelledError`` immediately.

Thread-safe: ``cancel()``/``pause()``/``resume()`` may be called from
any thread (a signal handler, a UI, a deadline watchdog).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

# canonical home is the typed taxonomy (errors.py, uncp error.rs
# parity); re-exported here where it has always lived
from uncp_spark.errors import CancelledError  # noqa: F401


class CancellationToken:
    def __init__(self, group_id: str = "uncp-pipeline") -> None:
        self._event = threading.Event()
        self._running = threading.Event()  # cleared = paused
        self._running.set()
        self._group_id = group_id
        self._spark: SparkSession | None = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------ binding

    def bind(self, spark: SparkSession) -> None:
        """Attach this token's job group to the CURRENT thread's Spark
        jobs so an in-flight cancel() can interrupt them. Call from the
        thread that submits the work (job groups are thread-local in
        Spark)."""
        with self._lock:
            self._spark = spark
        spark.sparkContext.setJobGroup(
            self._group_id, "uncp_spark cancellable pipeline", interruptOnCancel=True
        )

    # ------------------------------------------------------------- signal

    def cancel(self) -> None:
        """Request cancellation: flips the cooperative flag and, if
        bound, cancels all in-flight Spark jobs in the token's group."""
        self._event.set()
        with self._lock:
            spark = self._spark
        if spark is not None:
            try:
                spark.sparkContext.cancelJobGroup(self._group_id)
            except Exception:
                pass  # context already stopped — the flag still stands

    @property
    def cancelled(self) -> bool:
        return self._event.is_set()

    def raise_if_cancelled(self) -> None:
        if self._event.is_set():
            raise CancelledError(
                f"pipeline cancelled (job group {self._group_id!r})"
            )

    # ------------------------------------------------------ pause/resume (T1)

    def pause(self) -> None:
        """Block the pipeline at its next stage boundary (the in-flight
        stage completes and checkpoints; no further Spark jobs start)."""
        self._running.clear()

    def resume(self) -> None:
        """Release a pause; the pipeline continues with the next stage."""
        self._running.set()

    @property
    def paused(self) -> bool:
        return not self._running.is_set()

    def wait_if_paused(self) -> None:
        """Cooperative pause point: blocks while paused, waking promptly
        on resume() — and a cancel() during a pause raises immediately
        (cancel outranks pause, matching uncp's command precedence)."""
        while not self._running.is_set():
            self.raise_if_cancelled()
            self._running.wait(timeout=0.2)
        self.raise_if_cancelled()
