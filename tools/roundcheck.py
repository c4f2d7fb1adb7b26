"""One-command pre-commit gauntlet: pytest + full oracle verify + bench +
repo cleanliness. Run before ending a round:

    python tools/roundcheck.py            # full (~20 min)
    python tools/roundcheck.py --fast     # skip bench, sf0.001 verify

Exits non-zero on any failure; prints a one-line summary per stage.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], env: dict | None = None) -> bool:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True,
        env={**os.environ, **(env or {})},
    )
    tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
    ok = proc.returncode == 0
    print(f"[{'OK' if ok else 'FAIL'}] {label} ({time.time() - t0:.0f}s)")
    if not ok:
        for line in tail:
            print(f"    {line}")
    return ok


def artifact_hygiene() -> list[str]:
    """Round-artifact hygiene (VERDICT r12 Next #1, after EIGHT
    consecutive rounds of untracked artifacts at judging time): the
    driver's per-round artifacts (BENCH_r*.json / CORRECTNESS_r*.json)
    and the bench detail (BENCH_DETAIL.json) must be COMMITTED, not
    sitting untracked/modified in the working tree.  Returns the
    offending `git status --porcelain` lines; empty means clean."""
    status = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=ROOT, capture_output=True, text=True,
    ).stdout
    offending = []
    for line in status.splitlines():
        path = line[3:].strip()
        name = os.path.basename(path)
        if name == "BENCH_DETAIL.json" or (
            name.endswith(".json")
            and (
                name.startswith("BENCH_r")
                or name.startswith("CORRECTNESS_r")
            )
        ):
            offending.append(line)
    return offending


def main() -> None:
    fast = "--fast" in sys.argv
    ok = True
    ok &= run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    sf = "/root/testdata/sf0.001" if fast else "/root/testdata/sf0.01"
    ok &= run(f"verify {sf}", [sys.executable, "tools/verify.py", sf])
    ok &= run("window audit", [sys.executable, "tools/window_audit.py"])
    ok &= run(
        "plans drift", [sys.executable, "tools/plan_report.py", "--check"]
    )
    ok &= run(
        "blast radius",
        [sys.executable, "-m", "kyuubi_spark.queries.blast", "--check"],
    )
    if not fast:
        ok &= run("bench", [sys.executable, "bench.py"])
    status = subprocess.run(
        ["git", "status", "--short"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    dirty = [
        line for line in status.splitlines()
        if not line.endswith(("BENCH_DETAIL.json", "PLANS.md"))
    ]
    if dirty:
        print("[WARN] uncommitted changes:")
        for line in dirty[:10]:
            print(f"    {line}")
    offending = artifact_hygiene()
    if offending:
        ok = False
        print("[FAIL] round-artifact hygiene — commit the round artifacts:")
        for line in offending:
            print(f"    {line}")
        files = " ".join(sorted(line[3:].strip() for line in offending))
        print(f"    fix: git add {files} && git commit -m "
              f"'round artifacts'")
    print("ROUNDCHECK", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
