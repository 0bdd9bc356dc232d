"""Decompose a round-over-round bench delta into host × engine factors
(round-9 verdict #2 / round-10 task #1 — the reproducible form of the
adjudication BASELINE.md states in prose).

    python scripts/host_normalize.py BENCH_LOCAL_rA.json BENCH_LOCAL_rB.json

For the per-query map shared by both artifacts it prints raw total
deltas, the median per-query ratio (the "uniform shift" detector that
separates host drift from plan regressions: a host move shifts the
MEDIAN; a plan regression moves a few queries against a flat median),
the top regressions/improvements, and — when both artifacts carry
hostprobe stamps — the engine factor after dividing by the stamp
ratio, reported under BOTH proxies (BLAS GFLOP/s and JVM Mrows/s)
since the blend depends on the query family. Artifacts earlier than
round 10 carry no stamp; the tool then reports raw-only and says so,
which is itself the point: un-stamped rounds can only be adjudicated
by breadth, stamped rounds by division.
"""

from __future__ import annotations

import json
import statistics
import sys


MIXED_HOST_RATIO = 1.5  # stamp disparity beyond this = different host
# conditions; a raw comparison is meaningless and the tool REFUSES
# (exit 2) unless --mixed-ok acknowledges it (round-10 verdict #6: the
# driver's healthy-stamp re-run silently replaced the builder's
# degraded-stamp close and the tooling compared across the swap).


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    mixed_ok = "--mixed-ok" in argv
    if mixed_ok:
        argv.remove("--mixed-ok")
    if len(argv) != 2:
        raise SystemExit(__doc__)
    a = json.load(open(argv[0]))
    b = json.load(open(argv[1]))
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    only_b = sorted(set(qb) - set(qa))
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    ratios = sorted(((qb[k] / qa[k], k) for k in common if qa[k] > 0))
    med = statistics.median(r for r, _ in ratios)
    print(f"common queries: {len(common)}  new in B: {len(only_b)} "
          f"(+{sum(qb[k] for k in only_b):.1f} s)")
    print(f"raw common total: {ta:.1f} s -> {tb:.1f} s  (x{tb / ta:.3f})")
    print(f"median per-query ratio: x{med:.3f}  "
          f"(>1.5x: {sum(1 for r, _ in ratios if r > 1.5)}, "
          f"<0.67x: {sum(1 for r, _ in ratios if r < 2 / 3)})")
    host_a, host_b = a.get("host"), b.get("host")
    mixed = False
    if host_a and host_b:
        for key, label in (
            ("host_gflops", "BLAS"),
            ("host_jvm_mrows_s", "JVM"),
            ("host_io_mrows_s", "IO"),
        ):
            if key not in host_a or key not in host_b:
                continue  # IO stamp exists from round 11 on
            hf = host_a[key] / host_b[key]  # >1 = B's host slower
            mixed = mixed or max(hf, 1 / hf) > MIXED_HOST_RATIO
            print(f"{label} stamp: {host_a[key]:.1f} -> {host_b[key]:.1f} "
                  f"(host factor x{hf:.3f}); engine factor under this proxy: "
                  f"x{(tb / ta) / hf:.3f}")
    else:
        missing = [n for n, h in (("A", host_a), ("B", host_b)) if not h]
        print(f"no hostprobe stamp in artifact {'/'.join(missing)}: raw-only "
              f"adjudication (pre-round-10 artifact)")
    print("top regressions:")
    for r, k in ratios[-5:][::-1]:
        print(f"  x{r:.2f}  {k}  ({qa[k]:.2f} -> {qb[k]:.2f} s)")
    print("top improvements:")
    for r, k in ratios[:5]:
        print(f"  x{r:.2f}  {k}  ({qa[k]:.2f} -> {qb[k]:.2f} s)")
    if mixed and not mixed_ok:
        print(
            f"MIXED-HOST: stamp disparity exceeds x{MIXED_HOST_RATIO} — the "
            "raw totals above compare different host conditions; only the "
            "stamped engine factors are meaningful. Re-run with --mixed-ok "
            "to acknowledge."
        )
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
