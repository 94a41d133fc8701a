#!/usr/bin/env python3
"""Test runner with dependency checks and report generation.

Mirrors the reference's tests/run_tests.py contract (SURVEY.md component
19): dependency probe, import smoke-check of the core modules + main,
per-module timed runs, text report with failure extraction, --verbose /
--output CLI.
"""

from __future__ import annotations

import argparse
import importlib
import subprocess
import sys
import time

DEPENDENCIES = ["jax", "numpy", "scipy", "matplotlib", "tqdm", "psutil"]
CORE_MODULES = [
    "timecrystal_tpu.core.mps",
    "timecrystal_tpu.core.observables",
    "timecrystal_tpu.models.kicked_ising",
    "timecrystal_tpu.dynamics.tebd",
    "timecrystal_tpu.dynamics.tdvp",
    "timecrystal_tpu.dynamics.open_system",
    "timecrystal_tpu.parallel.sweep",
    "timecrystal_tpu.analysis.detection",
    "main",
]
TEST_MODULES = [
    "tests/test_core_mps.py",
    "tests/test_csvd.py",
    "tests/test_kicked_ising.py",
    "tests/test_open_system.py",
    "tests/test_tdvp.py",
    "tests/test_application.py",
    "tests/test_parallel.py",
    "tests/test_performance.py",
    "tests/test_tebd_generic.py",
    "tests/test_golden_traces.py",
    "tests/test_utils.py",
    "tests/test_native.py",
]


def check_dependencies(verbose: bool = False) -> bool:
    ok = True
    print("Checking dependencies...")
    for dep in DEPENDENCIES:
        try:
            mod = importlib.import_module(dep)
            if verbose:
                print(f"  [ok] {dep} {getattr(mod, '__version__', '')}")
        except ImportError as exc:
            print(f"  [MISSING] {dep}: {exc}")
            ok = False
    return ok


def check_imports(verbose: bool = False) -> bool:
    ok = True
    print("Smoke-checking module imports...")
    for mod in CORE_MODULES:
        try:
            importlib.import_module(mod)
            if verbose:
                print(f"  [ok] {mod}")
        except Exception as exc:
            print(f"  [FAIL] {mod}: {exc}")
            ok = False
    return ok


def run_test_module(path: str, verbose: bool = False) -> dict:
    t0 = time.time()
    cmd = [sys.executable, "-m", "pytest", path, "-q"]
    if verbose:
        cmd.append("-v")
    proc = subprocess.run(cmd, capture_output=True, text=True)
    wall = time.time() - t0
    passed = proc.returncode == 0
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    return {"module": path, "passed": passed, "wall_time": wall,
            "summary": tail, "stdout": proc.stdout, "stderr": proc.stderr}


def generate_test_report(results: list[dict], dep_ok: bool, import_ok: bool) -> str:
    lines = ["=" * 70, "TIMECRYSTAL-TPU TEST REPORT", "=" * 70, ""]
    lines.append(f"Dependencies OK: {dep_ok}")
    lines.append(f"Imports OK:      {import_ok}")
    lines.append("")
    n_pass = sum(r["passed"] for r in results)
    lines.append(f"Modules passed: {n_pass}/{len(results)}")
    lines.append("")
    for r in results:
        status = "PASS" if r["passed"] else "FAIL"
        lines.append(f"[{status}] {r['module']}  ({r['wall_time']:.1f}s)")
        lines.append(f"       {r['summary'].splitlines()[-1] if r['summary'] else ''}")
        if not r["passed"]:
            lines.append("  --- failure tail ---")
            lines.extend("  " + ln for ln in r["stdout"].splitlines()[-15:])
    lines.append("")
    if n_pass < len(results):
        lines.append("Recommendation: run the failing module with -x -v for detail;")
        lines.append("check tests/conftest.py backend settings if imports failed.")
    else:
        lines.append("All test modules passed.")
    return "\n".join(lines)


def main() -> int:
    parser = argparse.ArgumentParser(description="Run the test suite with report")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--output", type=str, default=None,
                        help="write the report to this file")
    parser.add_argument("--modules", nargs="*", default=None,
                        help="subset of test modules to run")
    args = parser.parse_args()

    dep_ok = check_dependencies(args.verbose)
    import_ok = check_imports(args.verbose)

    modules = args.modules or TEST_MODULES
    results = []
    for mod in modules:
        print(f"\nRunning {mod} ...")
        r = run_test_module(mod, args.verbose)
        print(f"  -> {'PASS' if r['passed'] else 'FAIL'} in {r['wall_time']:.1f}s")
        results.append(r)

    report = generate_test_report(results, dep_ok, import_ok)
    print("\n" + report)
    if args.output:
        with open(args.output, "w") as f:
            f.write(report)
        print(f"\nReport written to {args.output}")
    return 0 if all(r["passed"] for r in results) and dep_ok and import_ok else 1


if __name__ == "__main__":
    sys.exit(main())
