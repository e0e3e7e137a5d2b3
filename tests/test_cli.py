"""CLI integration: the real `python -m gcflow.run` process end to end."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from gcflow import transcripts as tr

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_parquet(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "transcripts.parquet"
    pq.write_table(tr.fixture_transcripts(), str(p))
    return str(p)


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "gcflow.run"] + args,
        capture_output=True, text=True, env=env, cwd=REPO, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])

def test_cli_parquet_counts(fixture_parquet, tmp_path):
    out = _run(["--input", fixture_parquet, "--out", str(tmp_path / "o"),
                "--num-cpus", "4"])
    # basic-mode totals across the conformance corpus (BASELINE.md table)
    assert out["sink_counts"]["app_stopped/AppStopped"] == 15
    assert out["events_total"] == 61
    assert os.path.exists(tmp_path / "o" / "_metrics.json")


def test_cli_two_cpus_no_deadlock(fixture_parquet, tmp_path):
    """At num_cpus=2 the enrich+sink pools used to reserve every CPU and
    deadlock the streaming executor; the task-fn enrich fallback must let
    the pipeline complete (the _run timeout is the deadlock guard)."""
    out = _run(["--input", fixture_parquet, "--out", str(tmp_path / "o2"),
                "--num-cpus", "2"])
    assert out["events_total"] == 61


def test_cli_run_local(fixture_parquet, tmp_path):
    """--run-local (shuffle-light) yields the same sink totals as the
    classic shuffle on conversation-ordered input."""
    out = _run(["--input", fixture_parquet, "--out", str(tmp_path / "rl"),
                "--format", "tsv", "--run-local", "--num-cpus", "4"])
    lines = open(out["path"]).read().rstrip("\n").split("\n")
    assert len(lines) == 62  # header + the 61 conformance-corpus events


def test_cli_heap_tsv(fixture_parquet, tmp_path):
    out = _run(["--input", fixture_parquet, "--out", str(tmp_path / "t"),
                "--format", "tsv", "--heap-stats", "--num-cpus", "4"])
    lines = open(out["path"]).read().rstrip("\n").split("\n")
    assert len(lines) >= 2 and lines[0].startswith("datetime\tage\ttype")
