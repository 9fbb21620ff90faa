"""Observability subsystem (utils/trace.py): the reference's cmd_executor
STATS instrumentation + GNU-parallel joblog analogs (SURVEY §5,
ref scripts/lib/cmd_executor.sh:6-19, scripts/full_workflow.sh:431)."""

import os

import pytest

from zkpoa_tpu.utils.trace import Tracer


def test_stage_stats_and_joblog(tmp_path, capsys):
    log_dir = os.path.join(tmp_path, "logs")
    tr = Tracer(log_dir=log_dir)
    with tr.stage("merkle build"):
        sum(range(10000))
    with tr.stage("prove batch 0"):
        pass
    out = capsys.readouterr().out
    assert "=== merkle build ..." in out
    assert "STATS: time" in out and "peak-rss" in out

    assert tr.timings["merkle build"] >= 0.0
    assert set(tr.timings) == {"merkle build", "prove batch 0"}

    # per-stage log file + joblog rows
    assert os.path.exists(os.path.join(log_dir, "merkle_build.log"))
    rows = open(os.path.join(log_dir, "joblog.tsv")).read().splitlines()
    assert rows[0].startswith("Seq\tStarttime")
    assert len(rows) == 3
    assert rows[1].endswith("merkle build") and "\t0\t" in rows[1]


def test_stage_failure_recorded(tmp_path):
    tr = Tracer(log_dir=str(tmp_path), echo=False)
    with pytest.raises(ValueError):
        with tr.stage("exploding stage"):
            raise ValueError("boom")
    rows = open(os.path.join(tmp_path, "joblog.tsv")).read().splitlines()
    assert rows[1].split("\t")[5] == "1"  # Exitval column


def test_accumulates_repeat_stage_names():
    tr = Tracer(echo=False)
    for _ in range(3):
        with tr.stage("x"):
            pass
    assert tr.timings["x"] >= 0.0
    assert len(tr.timings) == 1
