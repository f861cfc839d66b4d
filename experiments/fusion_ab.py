"""Round-3 fusion ladder A/B on the real TPU (VERDICT item 1).

Measures the 4k pile with the round-2 fusions flipped on incrementally:

  base       pile_config (fused contact table, two-phase prefilter) —
             what BENCH_r02 measured (1.126 ms/step trace)
  bp         + bp_inkernel   (broad phase folded into the table kernel)
  prep       + fuse_prep     (prep kernel merged into solve sweep 0)
  integ      + fuse_integrate (position integration in the last sweep)

Each rung: compile one 120-step chunk, settle, fenced wall window, device
trace, one metrics step (overflow counters MUST stay 0 through
drop+settle). Env: FA_N (default 4096), FA_CHUNKS (default 4),
FA_RUNGS (comma list, default all).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from physics_tpu.scenes import pile_config

from table_bench import run_cfg  # noqa: E402  (same dir)

RUNGS = {
    "base": {},
    "bp": {"bp_inkernel": True},
    "prep": {"bp_inkernel": True, "fuse_prep": True},
    "integ": {"bp_inkernel": True, "fuse_prep": True,
              "fuse_integrate": True},
    # solver-iteration lever on top of the full fusion stack (watch
    # max_penetration in the metrics line for stability regressions)
    "iters66": {"bp_inkernel": True, "fuse_prep": True,
                "fuse_integrate": True, "contact_iters": 6,
                "position_iters": 6},
    # tighter two-phase prefilter cap (watch pair_overflow)
    "cap2_384": {"bp_inkernel": True, "fuse_prep": True,
                 "fuse_integrate": True, "bucket_cap2": 384},
    # the same levers on top of BASE (the fusion stack measured neutral
    # on trace in /tmp/fa1.log — base 1.056 ms vs integ 1.100 ms)
    "b_iters66": {"contact_iters": 6, "position_iters": 6},
    "b_cap384": {"bucket_cap2": 384},
    "b_both": {"contact_iters": 6, "position_iters": 6,
               "bucket_cap2": 384},
    # asymmetric sweep probes — 6+6 destabilized the pile (max_pen 2.51
    # vs 0.345 at 8+8; /tmp/fa2.log): find which pass carries stability
    "b_v6": {"contact_iters": 6, "bucket_cap2": 384},
    "b_p6": {"position_iters": 6, "bucket_cap2": 384},
    "b_v6p7": {"contact_iters": 6, "position_iters": 7,
               "bucket_cap2": 384},
    # single-pass bf16 z movement (docs/PERFORMANCE.md lever 4): halves
    # the solve kernel's MXU matmuls; watch penetration/overflow vs
    # b_cap384's envelope (pen 0.345, overflow 0)
    "b_zbf16": {"bucket_cap2": 384, "z_bf16": True},
}


def main():
    n = int(os.environ.get("FA_N", "4096"))
    chunks = int(os.environ.get("FA_CHUNKS", "4"))
    names = os.environ.get("FA_RUNGS", "base,bp,prep,integ").split(",")
    base = pile_config(n).replace(
        contact_iters=8, contact_solver="pallas_banded")
    results = {}
    for name in names:
        over = RUNGS[name.strip()]
        try:
            wall, tr = run_cfg(f"{name}:{over}", base.replace(**over),
                               n, chunks)
            results[name] = (wall, tr)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            results[name] = None
    print("=== summary (wall ms/step, trace ms/step) ===",
          file=sys.stderr, flush=True)
    for k, v in results.items():
        print(f"  {k}: {v}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
