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
