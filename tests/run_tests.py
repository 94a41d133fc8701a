#!/usr/bin/env python3
"""Test runner with dependency checks and report generation.

Mirrors the reference's tests/run_tests.py contract (SURVEY.md component
19): dependency probe, import smoke-check of the core modules + main,
per-module timed runs, text report with failure extraction, --verbose /
--output CLI.
"""

from __future__ import annotations

import argparse
import glob
import importlib
import os
import subprocess
import sys
import time

# repo root importable regardless of invocation directory (for `import main`)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

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
# All CPU-tier test modules, discovered so the list cannot drift as
# files are added.  tests/test_tpu_smoke.py is excluded: it drives the
# REAL TPU via subprocesses (run it with pytest directly when a device
# is attached); on a wedged/absent backend its collection probe alone
# costs ~5 minutes before it skips.
TEST_MODULES = sorted(
    os.path.join("tests", os.path.basename(p))
    for p in glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "test_*.py"))
    if os.path.basename(p) != "test_tpu_smoke.py"
)


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


def run_code_quality_checks(verbose: bool = False) -> dict:
    """Basic code-quality pass (reference tests/run_tests.py:97-140):
    every package module byte-compiles, core modules + main import, and
    public functions carry docstrings."""
    import ast

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {"syntax": {}, "missing_docstrings": [], "main_import": None}
    for root, _dirs, files in os.walk(os.path.join(repo, "timecrystal_tpu")):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, repo)
            src = open(path).read()
            try:
                compile(src, path, "exec")
                results["syntax"][rel] = True
            except SyntaxError as exc:
                results["syntax"][rel] = str(exc)
                continue
            tree = ast.parse(src)
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and \
                        not node.name.startswith("_") and \
                        ast.get_docstring(node) is None:
                    results["missing_docstrings"].append(f"{rel}:{node.name}")
    try:
        import main  # noqa: F401
        results["main_import"] = True
    except Exception as exc:
        results["main_import"] = str(exc)
    bad = [k for k, v in results["syntax"].items() if v is not True]
    print(f"Code quality: {len(results['syntax'])} files byte-compile"
          + (f", {len(bad)} FAILED: {bad}" if bad else " (all ok)"))
    if results["missing_docstrings"] and verbose:
        print("  public defs without docstrings:")
        for item in results["missing_docstrings"]:
            print(f"    {item}")
    elif results["missing_docstrings"]:
        print(f"  {len(results['missing_docstrings'])} public defs without "
              "docstrings (run with --verbose to list)")
    print(f"main.py import: "
          f"{'ok' if results['main_import'] is True else results['main_import']}")
    return results


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
    quality = run_code_quality_checks(args.verbose)
    quality_ok = all(v is True for v in quality["syntax"].values()) and \
        quality["main_import"] is True

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
    return 0 if all(r["passed"] for r in results) and dep_ok and import_ok \
        and quality_ok else 1


if __name__ == "__main__":
    sys.exit(main())
