"""FPS vs long-term-memory length (the MODEL_ZOO.md:52-56 axis).

Runs bench.py's online-FPS measurement at a sweep of LT ring capacities on
an -L config (gap-5 LT writes). The reference's unbounded memory makes FPS
decay with video length (R50-AOTL 18.0 -> 6.4 FPS all-frames); here the
cost is set by the ring capacity (the 'grow' eval policy re-buckets to the
next power of two, so a length-L memory costs at most the next bucket).

Usage: python tools/bench_lt_sweep.py [--model aotl] [--caps 8 32 64 128]
Prints one JSON line per capacity (same schema as bench.py).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="aotl")
    ap.add_argument("--caps", type=int, nargs="+", default=[8, 32, 64, 128])
    ap.add_argument("--frames", type=int, default=0,
                    help="0 = cap+20 (fills the ring at --gap 1)")
    ap.add_argument("--gap", type=int, default=1,
                    help="LT write gap; 1 fills the ring fastest")
    args = ap.parse_args()

    for cap in args.caps:
        frames = args.frames or cap + 20
        env = dict(os.environ,
                   BENCH_MODEL=args.model,
                   BENCH_LT_CAP=str(cap),
                   BENCH_LT_GAP=str(args.gap),
                   BENCH_FRAMES=str(frames))
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(f'{{"lt_cap": {cap}, "tokens": {cap * 900}, '
              f'"gap": {args.gap}, "frames": {frames}, '
              f'"bench": {line[-1] if line else "null"}}}', flush=True)
        if r.returncode != 0:
            print(r.stderr[-500:], file=sys.stderr)


if __name__ == "__main__":
    main()
