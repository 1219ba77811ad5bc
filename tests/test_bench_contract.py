"""bench.py artifact-contract tests (VERDICT r11 #1/#2): the final
stdout line must stay under the driver's tail window, and _LoadProbe
stamps must stay non-negative even when a descendant re-parents to init
mid-probe (the A/B worktree subprocess pattern that produced the r11
``tree_cpu_sec: -1948.6`` artifact)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import textwrap
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_print_final_stays_under_byte_bound(capsys):
    big = [{"x": "y" * 3000}] * 3
    bench._print_final(
        {
            "metric": "corpus_wall_sec",
            "value": 1.23,
            "unit": "sec",
            "par": 8,
            "walls": [1.0, 2.0],
            "rep_load": big,
            "e2e_load": big,
            "sf": 0.1,
        }
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line.encode()) < bench._FINAL_LINE_BYTES
    doc = json.loads(line)  # still one complete JSON object
    assert doc["metric"] == "corpus_wall_sec"
    assert doc["value"] == 1.23  # headline survived the shedding
    assert "rep_load" not in doc and doc["shed_for_size"]


def test_print_final_small_headline_untouched(capsys):
    hl = {"metric": "corpus_wall_sec", "value": 2.0, "unit": "sec", "par": 8, "sf": 0.1}
    bench._print_final(hl)
    assert json.loads(capsys.readouterr().out.strip()) == hl


def test_print_final_packs_expensive_queries_first(capsys):
    """optimization r14: the driver parses ONLY the last complete JSON
    line inside a 2000-byte stdout tail, and its per-query/scaling
    analysis needs a "queries" dict THERE (PERF_r13: n_common 0,
    bench_ok false without it). All 154 names don't fit, so the packer
    takes the most expensive first and the line must stay under the
    bound."""
    queries = {f"q{i:03d}_some_entry_name_{i}": float(i) / 10 for i in range(154)}
    hl = {"metric": "corpus_wall_sec", "value": 60.0, "unit": "sec", "par": 8,
          "reps": 3, "walls": [60.0, 61.0, 62.0], "e2e_batch_sec": 8.0,
          "e2e_ref_budget_sec": 400, "sf": 0.1}
    bench._print_final(hl, queries)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line.encode()) < 2000  # the driver's REAL tail window
    doc = json.loads(line)
    assert doc["value"] == 60.0 and doc["queries_total"] == 154
    got = doc["queries"]
    assert 30 < len(got) < 154
    # most expensive first: everything packed must cost >= everything not
    floor = min(got.values())
    dropped_max = max(v for n, v in queries.items() if n not in got)
    assert floor >= dropped_max
    # headline diagnostics survived alongside the packed queries
    assert doc["walls"] == [60.0, 61.0, 62.0]


def test_print_final_packing_never_overflows_with_huge_names(capsys):
    queries = {f"q{i:03d}_{'x' * 300}": 9.9 for i in range(80)}
    hl = {"metric": "corpus_wall_sec", "value": 1.0, "unit": "sec", "par": 8, "sf": 0.1}
    bench._print_final(hl, queries)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line.encode()) < 2000
    assert json.loads(line)["value"] == 1.0


def test_load_probe_nonnegative_when_descendant_orphans():
    """Reproduce the r11 A/B shape: a child process whose OWN child has
    accumulated CPU inside the probe window exits, orphaning the
    grandchild to init. The old tree-total delta went negative (the
    grandchild's already-counted CPU left the tree walk); the per-pid
    probe adopts re-parented pids and clamps, so the stamp must stay
    >= 0 and keep attributing the orphan's post-probe-start burn to us."""
    with tempfile.TemporaryDirectory() as d:
        ready = os.path.join(d, "ready")
        release = os.path.join(d, "release")
        gc_pid_file = os.path.join(d, "gc_pid")
        gc_src = textwrap.dedent(
            f"""
            import os, time
            deadline = time.time() + 0.8
            x = 0
            while time.time() < deadline:
                x += sum(i*i for i in range(10000))
            open({ready!r}, "w").write(str(os.getpid()))
            while not os.path.exists({release!r}):
                time.sleep(0.02)
            deadline = time.time() + 0.6
            while time.time() < deadline:
                x += sum(i*i for i in range(10000))
            time.sleep(5)
            """
        )
        orphan_go = os.path.join(d, "orphan_go")
        child_src = textwrap.dedent(
            f"""
            import os, subprocess, sys, time
            gc = subprocess.Popen([sys.executable, "-c", {gc_src!r}])
            open({gc_pid_file!r}, "w").write(str(gc.pid))
            # the TEST creates orphan_go only after its probe has the
            # grandchild (and its burned CPU) inside tree0
            while not os.path.exists({orphan_go!r}):
                time.sleep(0.02)
            # exit WITHOUT reaping: gc re-parents to init
            os._exit(0)
            """
        )
        child = subprocess.Popen([sys.executable, "-c", child_src])
        try:
            # wait until the grandchild has burned CPU, then start the
            # probe with that CPU inside tree0
            deadline = time.time() + 15
            while not os.path.exists(ready) and time.time() < deadline:
                time.sleep(0.05)
            assert os.path.exists(ready), "grandchild never signalled"
            probe = bench._LoadProbe()
            gc_pid = int(open(gc_pid_file).read())
            assert gc_pid in probe.tree0, "grandchild not in the probe tree"
            open(orphan_go, "w").write("go")
            child.wait(timeout=10)  # child gone -> grandchild orphaned
            open(release, "w").write("go")  # grandchild burns 0.6 s more
            time.sleep(0.8)  # let the orphan burn post-probe CPU
            stamp = probe.stamp()
            assert stamp["tree_cpu_sec"] >= 0.0, stamp
            # the orphan burned ~0.6 s AFTER probe start; adoption must
            # keep most of it ours (generous margin for a loaded host)
            assert stamp["tree_cpu_sec"] >= 0.2, stamp
        finally:
            try:
                gc_pid = int(open(gc_pid_file).read())
                os.kill(gc_pid, 9)
            except (OSError, ValueError):
                pass
            if child.poll() is None:
                child.kill()


def test_record_history_not_gated_on_ab_env(tmp_path, monkeypatch):
    """ADVICE r11: history must append on every non-fast run so the next
    A/B pass compares against the true prior, even if AB was disabled."""
    # _HISTORY is joined against bench.py's dir; an absolute path wins
    # the join, so both write and read land in tmp_path
    monkeypatch.setattr(bench, "_HISTORY", str(tmp_path / "hist.jsonl"))
    bench._record_history({"q01": 1.0}, 0.1)
    src, qmap, sf, commit = bench._prior_bench(0.1)
    assert qmap and sf == 0.1


def test_history_rows_record_commit(tmp_path, monkeypatch):
    """r13 (judge's r12 candidate): each history row must stamp the
    engine-tree commit so the A/B can (a) refuse to adjudicate against a
    same-tree row and (b) check out the row's ACTUAL code."""
    monkeypatch.setattr(bench, "_HISTORY", str(tmp_path / "hist.jsonl"))
    bench._record_history({"q01": 1.0}, 0.1)
    rec = json.loads(open(tmp_path / "hist.jsonl").read().strip())
    head, _dirty = bench._git_state()
    assert rec["commit"] == head and head


def test_prior_bench_skips_same_tree_rows(tmp_path, monkeypatch):
    """Two same-sf rows — older from a prior tree, newer from THIS tree
    (the same-day double-run shape): the prior must be the OLDER,
    different-tree row, else the A/B compares cur vs cur and can only
    ever conclude host drift. With ONLY same-tree rows, fall back to the
    newest one rather than skipping the A/B entirely."""
    monkeypatch.setattr(bench, "_HISTORY", str(tmp_path / "hist.jsonl"))
    head, _ = bench._git_state()
    rows = [
        {"ts": 1.0, "sf": 0.1, "commit": "priorsha000", "queries": {"q01": 2.0}},
        {"ts": 2.0, "sf": 0.1, "commit": head, "queries": {"q01": 1.0}},
    ]
    with open(tmp_path / "hist.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    src, qmap, sf, commit = bench._prior_bench(0.1)
    assert commit == "priorsha000" and qmap == {"q01": 2.0}
    # only same-tree rows -> newest survives as last resort
    with open(tmp_path / "hist.jsonl", "w") as fh:
        fh.write(json.dumps(rows[1]) + "\n")
    src, qmap, sf, commit = bench._prior_bench(0.1)
    assert commit == head and qmap == {"q01": 1.0}


def test_emit_output_order_and_final_line(capsys):
    """The full stdout contract, driver's-eye view: simulate the bounded
    tail capture (keep the last N bytes, parse the last complete JSON
    line) against an oversized A/B payload — the exact r11 failure. The
    recovered line must be the compact corpus_wall_sec headline."""
    big_ab = {
        "ab_walls": {f"q{i:02d}_x": {"cur": 1.0, "prev": 1.0} for i in range(40)},
        "ab_suspects": {f"q{i:02d}_x": {"cur_sweep": 9.9} for i in range(40)},
        "ab_load": {"x": "y" * 2000},
    }
    full_map = {f"q{i:03d}_entry_named_like_ours_{i}": 0.5 + i / 100 for i in range(154)}
    bench._emit_output(
        per_query={"metric": "per_query_sec", "queries": full_map},
        ab=big_ab,
        headline={"metric": "corpus_wall_sec", "value": 3.14, "unit": "sec", "par": 8, "sf": 0.1},
        sf=0.1,
        queries=full_map,
    )
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert [json.loads(l)["metric"] for l in lines] == [
        "per_query_sec",
        "bench_ab",
        "corpus_wall_sec",
    ]
    # driver-style bounded tail: last 2000 BYTES of stdout (the real
    # window, measured across every BENCH_r* artifact — r14)
    tail = out.encode()[-2000:].decode(errors="ignore")
    last_complete = None
    for line in tail.splitlines():
        try:
            last_complete = json.loads(line)
        except ValueError:
            continue
    assert last_complete and last_complete["metric"] == "corpus_wall_sec"
    assert last_complete["value"] == 3.14
    # the per-query contract dict survived INSIDE the bounded tail
    assert last_complete["queries"] and last_complete["queries_total"] == 154
