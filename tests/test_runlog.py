"""RunLog: the persistent log.txt artifact every trainer writes (the
reference flushes args.log at run end, classifier/train.py:309-315)."""

import jax.numpy as jnp

from gen_adversarial_tpu.core.runlog import RunLog, param_summary


def test_runlog_writes_incrementally(tmp_path):
    sink = []
    log = RunLog(tmp_path / "log.txt", log_fn=sink.append)
    log("line one")
    # incremental: the file holds the line even if the run dies right now
    assert (tmp_path / "log.txt").read_text() == "line one\n"
    log("line two")
    assert sink == ["line one", "line two"]
    assert (tmp_path / "log.txt").read_text() == "line one\nline two\n"


def test_runlog_append_vs_fresh(tmp_path):
    RunLog(tmp_path / "log.txt", log_fn=lambda s: None)("first run")
    # resume appends
    RunLog(tmp_path / "log.txt", log_fn=lambda s: None, append=True)("resumed")
    assert (tmp_path / "log.txt").read_text() == "first run\nresumed\n"
    # fresh run truncates
    RunLog(tmp_path / "log.txt", log_fn=lambda s: None)("fresh")
    assert (tmp_path / "log.txt").read_text() == "fresh\n"


def test_param_summary_counts():
    params = {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}
    s = param_summary(params, "toy")
    assert s.startswith("toy:") and "16" in s and "2 arrays" in s
