"""Run a bench script against a specific acf_tpu checkout.

Usage: python scripts/_bench_with_lib.py <lib_dir> <bench_py>

Needed because the editable install registers a *meta-path* finder for
acf_tpu (``__editable___acf_tpu_0_1_0_finder``), which intercepts imports
BEFORE sys.path — a plain PYTHONPATH override would silently keep loading
the HEAD library. This removes that finder, pins ``lib_dir`` at the front
of sys.path, asserts the import really resolves there, and execs the bench.
"""

import runpy
import sys

lib_dir, bench = sys.argv[1], sys.argv[2]
sys.meta_path = [
    f for f in sys.meta_path
    if "editable" not in (type(f).__module__ + type(f).__name__).lower()
]
sys.path.insert(0, lib_dir)
import acf_tpu  # noqa: E402

assert acf_tpu.__file__.startswith(lib_dir), (
    f"acf_tpu resolved to {acf_tpu.__file__}, wanted {lib_dir}")
print(f"# acf_tpu from {acf_tpu.__file__}", file=sys.stderr, flush=True)
sys.argv = [bench]
runpy.run_path(bench, run_name="__main__")
