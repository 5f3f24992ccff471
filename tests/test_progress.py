"""T4 — live progress metrics streamed DURING a pipeline run.

uncp emits SystemProgress while a system runs (src/systems/mod.rs:57-93);
the Spark bridge must expose task-level progress rows mid-run, not only
post-hoc manifests.
"""

from __future__ import annotations

import json
import os
import threading
import time

from uncp_spark.plans.pipeline import DedupPipeline
from uncp_spark.plans.progress import read_progress


def test_read_progress_empty_when_no_run_yet(spark, tmpdir_path):
    df = read_progress(spark, tmpdir_path)
    assert df.count() == 0
    assert "pipeline_stage" in df.columns


def test_progress_rows_readable_mid_pipeline(spark, repos_df, tmpdir_path):
    path = os.path.join(tmpdir_path, "_metrics", "progress.jsonl")
    done: dict = {}

    def run():
        done["out"] = DedupPipeline(base_dir=tmpdir_path).run(
            spark, repos_df, input_token="fixture", register_sql_views=False
        )

    t = threading.Thread(target=run)
    t.start()
    saw_live = False
    live_stages: set[str] = set()
    while t.is_alive():
        if os.path.exists(path):
            with open(path) as f:
                lines = f.readlines()
            if lines and t.is_alive():
                saw_live = True
                for ln in lines:
                    try:
                        live_stages.add(json.loads(ln)["pipeline_stage"])
                    except (json.JSONDecodeError, KeyError):
                        pass  # reader may catch a partially-flushed tail
        time.sleep(0.2)
    t.join()
    assert "out" in done, "pipeline failed"
    assert saw_live, "no progress rows were readable while the run was live"

    df = read_progress(spark, tmpdir_path)
    rows = df.collect()
    assert rows, "metrics table empty after the run"
    stages_seen = {r.pipeline_stage for r in rows}
    # multiple pipeline stages must have reported, with sane counters
    assert len(stages_seen) >= 2, stages_seen
    assert live_stages <= stages_seen | {"-"}
    assert all(r.num_tasks >= r.completed_tasks >= 0 for r in rows)
    assert all(r.ts_ns > 0 and r.run_id for r in rows)
