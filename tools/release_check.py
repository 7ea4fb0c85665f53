"""One-command release check (VERDICT round-3 item 7).

Hardware validation used to be three separately-remembered commands
(CLAUDE.md: "run hw_sweep + tpu_accuracy after ANY kernel/spec change",
plus the bench smoke and the CPU suite).  This runs all four and writes a
single versioned JSON — one command, one verdict:

    python tools/release_check.py                 # everything (TPU box)
    python tools/release_check.py --skip-tests    # skip the ~8 min CPU suite
    python tools/release_check.py --cpu-only      # suite + interpret smoke
                                                  # (no TPU attached)

Steps (each a subprocess so a wedged device or compiler crash cannot take
the harness down):
  1. CPU test suite        python -m pytest tests/ -q          (x64, 8 vdev)
  2. fused-kernel sweep    python tools/hw_sweep.py            (real TPU)
  3. reference anchors     python tools/tpu_accuracy.py        (real TPU)
  4. headline bench smoke  python bench.py --repeats 2         (real TPU)

Writes RELEASE_CHECK.json at the repo root (git rev + timestamp + per-step
result) and prints ONE summary JSON line; exit code 0 iff every step ran
and passed.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable


def _run(cmd, timeout, env=None):
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout,
            env=dict(os.environ, **(env or {})))
        return p.returncode, p.stdout + p.stderr, time.time() - t0
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return -1, out + f"\nTIMEOUT after {timeout}s", time.time() - t0


def step_tests(rec):
    code, out, dt = _run([PY, "-m", "pytest", "tests/", "-q"], timeout=1800)
    m = re.search(r"(\d+) passed", out)
    mf = re.search(r"(\d+) failed", out)
    rec["tests"] = {
        "ok": code == 0,
        "passed": int(m.group(1)) if m else 0,
        "failed": int(mf.group(1)) if mf else 0,
        "seconds": round(dt, 1),
    }
    return code == 0


def step_sweep(rec):
    code, out, dt = _run([PY, "tools/hw_sweep.py"], timeout=3600)
    m = re.search(r"SWEEP-DONE ok=(\d+) fail=(\d+)", out)
    ok = code == 0 and m is not None and int(m.group(2)) == 0
    rec["hw_sweep"] = {
        "ok": ok,
        "combos_ok": int(m.group(1)) if m else 0,
        "combos_fail": int(m.group(2)) if m else -1,
        "warns": len(re.findall(r"^WARN ", out, re.M)),
        "seconds": round(dt, 1),
        "tail": out.strip().splitlines()[-1] if out.strip() else "",
    }
    return ok


def step_anchors(rec):
    code, out, dt = _run([PY, "tools/tpu_accuracy.py"], timeout=3600)
    path = os.path.join(REPO, "tpu_accuracy_tpu.json")
    hits = total = 0
    if code == 0 and os.path.exists(path):
        rows = json.load(open(path)).get("records", [])
        total = len(rows)
        hits = sum(1 for r in rows if r.get("hit_ref_tol"))
    ok = code == 0 and total > 0 and hits == total
    rec["anchors"] = {"ok": ok, "hit": hits, "total": total,
                      "seconds": round(dt, 1)}
    return ok


def step_bench(rec, repeats=2):
    code, out, dt = _run([PY, "bench.py", "--repeats", str(repeats)],
                         timeout=2400)
    line = next((l for l in reversed(out.strip().splitlines())
                 if l.startswith("{")), None)
    data = json.loads(line) if line else {}
    ok = (code == 0 and data.get("converged_fraction", 0) > 0.99
          and data.get("value", 0) > 0)
    rec["bench"] = {"ok": ok, "seconds": round(dt, 1), "record": data}
    return ok


def step_scaling(rec):
    """Standing scaling artifact (round-5 VERDICT item 6): the shard_map
    overhead report over the 1..8 virtual-device CPU mesh for the
    lockstep, fused, and tall fused routes, plus the 2-process DCN
    completion record -> SCALING_r05.json."""
    code, out, dt = _run([PY, "bench_scaling.py", "--out",
                          "SCALING_r05.json"], timeout=2400)
    ok = code == 0
    data = {}
    try:
        data = json.load(open(os.path.join(REPO, "SCALING_r05.json")))
        dcn = [s for s in data.get("sections", [])
               if s.get("metric") == "dcn_two_process_dp_tp"]
        ok = ok and len(data.get("sections", [])) >= 3 and (
            not dcn or dcn[0].get("ok"))
    except Exception:
        ok = False
    rec["scaling"] = {"ok": ok, "seconds": round(dt, 1),
                      "sections": [s.get("metric")
                                   for s in data.get("sections", [])]}
    return ok


def step_interpret_smoke(rec):
    """CPU stand-in for the hardware steps when no TPU is attached: the
    fused-kernel parity tests in interpret mode (already in the suite) plus
    a tiny bench-config smoke via BENCH_SCALE."""
    code, out, dt = _run(
        [PY, "-m", "pytest", "tests/test_fused_driver.py", "-q"],
        timeout=900)
    rec["interpret_smoke"] = {"ok": code == 0, "seconds": round(dt, 1)}
    return code == 0


def _head_rev():
    return subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()


# measurement artifacts the check itself (re)writes — changes to these are
# not SOURCE staleness (the final workflow is: commit source, run the
# check, commit the artifacts; the artifact commit must not un-fresh the
# verdict it carries)
_ARTIFACTS = {
    "RELEASE_CHECK.json", "SCALING_r05.json", "tpu_accuracy_tpu.json",
    "tpu_accuracy_cpu.json", "docs/tpu_accuracy.md",
}


def _is_artifact(path):
    # markdown and harness-config files don't execute: changing them
    # cannot invalidate what the check validated
    if path.endswith(".md") or path.startswith(".claude/"):
        return True
    return path in _ARTIFACTS or path.startswith(
        ("BENCH_", "ROOFLINE", "MULTICHIP_", "CONFIG5_", "DF_TPU",
         "MXU_PROBE", "TALL_LS", "SCALING_", "COPYCHECK",
         "PROGRESS"))


def _tree_dirty():
    # source staleness only: an artifact is stale when *tracked source*
    # changed, not when untracked scratch files or the check's own
    # outputs move
    out = subprocess.run(["git", "status", "--porcelain", "-uno"], cwd=REPO,
                         capture_output=True, text=True).stdout
    for line in out.splitlines():
        if line.strip() and not _is_artifact(line[3:].strip()):
            return True
    return False


def verify_fresh():
    """Refuse a stale verdict artifact (round-4 VERDICT weak #7): exit 0
    iff RELEASE_CHECK.json exists, passed, and was produced at the current
    HEAD from a clean tree.  ``python tools/release_check.py --verify``."""
    path = os.path.join(REPO, "RELEASE_CHECK.json")
    head = _head_rev()
    if not os.path.exists(path):
        print(json.dumps({"fresh": False, "reason": "no RELEASE_CHECK.json"}))
        return 1
    rec = json.load(open(path))
    reasons = []
    if rec.get("git_rev") != head:
        # accept when everything between the recorded rev and HEAD is
        # measurement artifacts (the artifact-commit pattern)
        diff = subprocess.run(
            ["git", "diff", "--name-only", f"{rec.get('git_rev')}..HEAD"],
            cwd=REPO, capture_output=True, text=True)
        changed = [l.strip() for l in diff.stdout.splitlines() if l.strip()]
        if diff.returncode != 0 or any(not _is_artifact(p)
                                       for p in changed):
            reasons.append(
                f"stale: artifact at {rec.get('git_rev')}, HEAD {head}, "
                f"source changed: "
                f"{[p for p in changed if not _is_artifact(p)][:5]}")
    if rec.get("dirty"):
        reasons.append("artifact was produced from a dirty tree")
    if _tree_dirty():
        reasons.append("working tree has uncommitted tracked changes")
    if not rec.get("ok"):
        reasons.append("artifact records a FAILED check")
    print(json.dumps({"fresh": not reasons, "git_rev": rec.get("git_rev"),
                      "head": head, "reasons": reasons}))
    return 0 if not reasons else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--skip-anchors", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--cpu-only", action="store_true",
                    help="no TPU attached: suite + interpret-mode smoke")
    ap.add_argument("--verify", action="store_true",
                    help="don't run anything: check RELEASE_CHECK.json is "
                         "at HEAD, clean, and passing")
    args = ap.parse_args()

    if args.verify:
        sys.exit(verify_fresh())

    rev = _head_rev()
    rec = {"git_rev": rev, "dirty": _tree_dirty(),
           "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
    oks = []
    if not args.skip_tests:
        print("[release_check] CPU test suite ...", flush=True)
        oks.append(step_tests(rec))
        print(json.dumps(rec["tests"]), flush=True)
    if not args.skip_scaling:
        print("[release_check] scaling artifact (virtual mesh) ...",
              flush=True)
        oks.append(step_scaling(rec))
        print(json.dumps(rec["scaling"]), flush=True)
    if args.cpu_only:
        print("[release_check] interpret-mode kernel smoke ...", flush=True)
        oks.append(step_interpret_smoke(rec))
    else:
        if not args.skip_sweep:
            print("[release_check] fused-kernel hardware sweep ...",
                  flush=True)
            oks.append(step_sweep(rec))
            print(json.dumps(rec["hw_sweep"]), flush=True)
        if not args.skip_anchors:
            print("[release_check] reference accuracy anchors ...",
                  flush=True)
            oks.append(step_anchors(rec))
            print(json.dumps(rec["anchors"]), flush=True)
        if not args.skip_bench:
            print("[release_check] headline bench smoke ...", flush=True)
            oks.append(step_bench(rec))
            print(json.dumps(rec["bench"]), flush=True)

    rec["ok"] = bool(oks) and all(oks)
    out = os.path.join(REPO, "RELEASE_CHECK.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({"release_check": rec["ok"], "git_rev": rev,
                      "steps": {k: v.get("ok") for k, v in rec.items()
                                if isinstance(v, dict)}}))
    sys.exit(0 if rec["ok"] else 1)


if __name__ == "__main__":
    main()
