"""Local J&F scoring of a results directory against ground truth
(a built-in replacement for the external DAVIS evaluation toolkit the
reference defers to — reference README.md:142)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Score VOS results (J&F)")
    p.add_argument("results", help="per-sequence prediction PNG dirs")
    p.add_argument("annotations", help="ground-truth Annotations dir")
    p.add_argument("--seqs", nargs="+", default=None)
    p.add_argument("--json", action="store_true", help="print one JSON line")
    args = p.parse_args()

    from aot_tpu.eval.metrics import evaluate_davis

    out = evaluate_davis(args.results, args.annotations, args.seqs,
                         verbose=not args.json)
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
