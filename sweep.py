"""Full-surface health sweep: run EVERY queries() entry against a
scale-factor dir (default sf0.1 — 10× the driver's correctness scale)
and print per-query wall time + row count, slowest first. This is the
runtime-smoke complement to tests/test_oracle_parity.py (which checks
VALUES at sf0.001/sf0.01): it catches scale pathologies — operators
that are value-correct but quietly superlinear — before they reach a
real cluster. Exit code 1 if any query errors.

Usage: python sweep.py [sf_dir]
"""

import sys
import time

import ray
import ray.data


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa

    import __ray_entry__ as e

    res = {}
    for name, fn in sorted(e.queries().items()):
        t0 = time.perf_counter()
        try:
            out = fn(sf)
            if isinstance(out, ray.data.Dataset):
                n = out.count()
            elif isinstance(out, pa.Table):
                n = out.num_rows
            else:
                n = len(out)
            res[name] = (round(time.perf_counter() - t0, 2), int(n), "ok")
        except Exception as ex:  # noqa: BLE001 — a sweep reports, never dies
            res[name] = (round(time.perf_counter() - t0, 2), -1,
                         f"ERR {type(ex).__name__}: {str(ex)[:120]}")
    for name, (sec, n, st) in sorted(res.items(), key=lambda kv: -kv[1][0]):
        print(f"{sec:8.2f}s {n:>9} {name} {st if st != 'ok' else ''}")
    bad = {k: v for k, v in res.items() if v[2] != "ok"}
    print(f"TOTAL {round(sum(v[0] for v in res.values()), 1)} s; "
          f"{len(res)} queries; {len(bad)} errors")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
