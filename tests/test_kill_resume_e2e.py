"""Real kill-and-resume: SIGKILL a running flagship job mid-write, resume it,
and require byte-identical output vs an uninterrupted run (FIXTURES.md
invariant 7 at the job level, not just the writer-logic level)."""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq

JOB = [sys.executable, "jobs/flagship_job.py", "--entities", "120", "--num-cpus", "4"]


def _run(out_dir: str, kill_after: float | None = None) -> dict | None:
    env = dict(os.environ)
    proc = subprocess.Popen(
        JOB + ["--out", out_dir], stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, env=env,
    )
    if kill_after is not None:
        # wait until at least a few partitions committed, then SIGKILL
        deadline = time.time() + 120
        while time.time() < deadline:
            done = len(glob.glob(f"{out_dir}/_manifest/0*.json"))
            if done >= 3:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.3)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return None
    out, _ = proc.communicate(timeout=600)
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_sigkill_mid_job_then_resume_identical(tmp_path):
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    res_clean = _run(clean_dir)
    assert res_clean is not None and res_clean["partitions_skipped_on_resume"] == 0

    killed = _run(crash_dir, kill_after=0.1)
    committed_mid = len(glob.glob(f"{crash_dir}/_manifest/0*.json"))
    if killed is not None:
        # job finished before the kill landed (tiny input, fast box) — the
        # resume semantics are still exercised below via full-skip
        committed_mid = killed["partitions"]

    res = _run(crash_dir)
    assert res is not None
    assert res["partitions"] == res_clean["partitions"]
    assert res["rows"] == res_clean["rows"]
    # whatever was committed before the kill was skipped, not rewritten
    assert res["partitions_skipped_on_resume"] >= min(committed_mid, res["partitions"])

    # byte-identical content vs the uninterrupted run
    clean_files = sorted(glob.glob(f"{clean_dir}/part-*.parquet"))
    crash_files = sorted(glob.glob(f"{crash_dir}/part-*.parquet"))
    assert [os.path.basename(p) for p in clean_files] == [os.path.basename(p) for p in crash_files]
    for a, b in zip(clean_files, crash_files):
        assert pq.read_table(a).equals(pq.read_table(b)), a
