"""Segmented-training supervisor: restart train_to_ap across host-RSS
segments.

The axon TPU tunnel client leaks host RSS per executed step (~35 MB/step
at 640^2 batch 4 — measured identical for plain / device_put+delete /
reused-host-buffer inputs, so it is per-execution staging inside the
tunnel client, not Python-side retention; BENCH_NOTES.md "Host RSS
leak"). Long quality runs therefore get OOM-killed mid-flight. This
supervisor is the framework's failure-tolerance answer (SURVEY.md §5:
checkpoint/resume + failure detection): it runs train_to_ap as a child
with an RSS budget; the child checkpoints and exits 75 when the budget
is hit, and the supervisor relaunches it with --resume until the step
budget is spent. Combined with the persistent compilation cache the
restart costs seconds, not a recompile.

    python tools/train_supervisor.py --max-rss-gb 60 -- \
        --steps 4500 --until-step 4500 --image-size 640 \
        --ckpt /tmp/ckpt --ckpt-every 500 ...

--until-step (an ABSOLUTE step target) is required: --steps alone is
relative, so each restarted segment would train N more steps and the
run would never converge on its budget.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--max-rss-gb", type=float, default=60.0)
    parser.add_argument("--max-restarts", type=int, default=20)
    parser.add_argument("train_args", nargs=argparse.REMAINDER,
                        help="arguments after `--` go to train_to_ap")
    args = parser.parse_args(argv)
    child_args = [a for a in args.train_args if a != "--"]

    def has_flag(flag):
        return any(a == flag or a.startswith(flag + "=")
                   for a in child_args)

    if not has_flag("--ckpt"):
        parser.error("train_to_ap args must include --ckpt "
                     "(the restart contract is checkpoint-based)")
    if not has_flag("--until-step"):
        # --steps N is RELATIVE: every restarted segment would train N
        # MORE steps and the run would never converge on a step budget
        parser.error("train_to_ap args must include --until-step (an "
                     "absolute target; --steps alone grows the budget "
                     "by N per restart)")

    train_to_ap = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "train_to_ap.py")
    base = [sys.executable, train_to_ap, *child_args,
            "--max-rss-gb", str(args.max_rss_gb)]
    for attempt in range(args.max_restarts + 1):
        cmd = list(base)
        if attempt > 0 and "--resume" not in cmd:
            cmd.append("--resume")
        print(f"[supervisor] segment {attempt}: {' '.join(cmd[1:])}",
              flush=True)
        rc = subprocess.call(cmd)
        if rc != 75:
            print(f"[supervisor] child exited rc={rc} after "
                  f"{attempt + 1} segment(s)", flush=True)
            return rc
    print(f"[supervisor] gave up after {args.max_restarts} restarts",
          flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
