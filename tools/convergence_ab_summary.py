"""Summarise the long-horizon convergence A/B (this framework vs the torch
reference engine) into one committed artifact.

Inputs: the JSONL metric streams written by tools/overfit_check.py
(--stream_npz ... --jsonl) and tools/overfit_ref.py (--stream --jsonl) on
the SAME fixed batch stream (identical batches in identical order, same LR
schedule/steps). Produces artifacts/convergence_ab/summary.json with both
curves, windowed means, and curve-distance statistics, plus an ASCII
overlay for quick reading.

Usage: python tools/convergence_ab_summary.py jax.jsonl torch.jsonl out_dir
"""

import json
import os
import sys


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def windowed(rows, key, width):
    """Mean of `key` over trailing windows of `width` steps."""
    out = {}
    for r in rows:
        w = (r["step"] - 1) // width
        out.setdefault(w, []).append(r[key])
    return {(w + 1) * width: sum(v) / len(v) for w, v in sorted(out.items())}


def ascii_overlay(a, b, key, height=12, width=60):
    """Two curves in one terminal plot: '+' = jax, 'o' = torch, '*' both."""
    steps = sorted(set(list(a) + list(b)))
    if not steps:
        return ""
    lo = min(min(a.values()), min(b.values()))
    hi = max(max(a.values()), max(b.values()))
    span = (hi - lo) or 1.0
    grid = [[" "] * width for _ in range(height)]
    smax = max(steps)

    def put(series, ch):
        for s, v in series.items():
            x = min(width - 1, int(s / smax * (width - 1)))
            y = height - 1 - int((v - lo) / span * (height - 1))
            grid[y][x] = "*" if grid[y][x] not in (" ", ch) else ch

    put(a, "+")
    put(b, "o")
    lines = [f"{key}: lo={lo:.3f} hi={hi:.3f}  (+ = aot_tpu, o = torch ref)"]
    lines += ["|" + "".join(row) + "|" for row in grid]
    return "\n".join(lines)


def main():
    jax_path, torch_path, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    ja, to = load(jax_path), load(torch_path)
    os.makedirs(out_dir, exist_ok=True)

    horizon = min(ja[-1]["step"], to[-1]["step"])
    ja = [r for r in ja if r["step"] <= horizon]
    to = [r for r in to if r["step"] <= horizon]
    width = max(100, horizon // 20)

    out = {
        "what": "fixed-stream convergence A/B: identical 200-batch stream, "
                "identical LR schedule, from-scratch AOTT",
        "horizon_steps": horizon,
        "window_steps": width,
        "jax": {"loss": windowed(ja, "loss", width),
                "iou": windowed(ja, "iou", width),
                "sec_per_it": ja[-1]["sec_per_it"]},
        "torch": {"loss": windowed(to, "loss", width),
                  "iou": windowed(to, "iou", width),
                  "sec_per_it": to[-1]["sec_per_it"]},
        "raw": {"jax": ja, "torch": to},
    }
    jl, tl = out["jax"]["loss"], out["torch"]["loss"]
    ji, ti = out["jax"]["iou"], out["torch"]["iou"]
    common = sorted(set(jl) & set(tl))
    out["loss_abs_diff"] = {s: round(abs(jl[s] - tl[s]), 4) for s in common}
    out["iou_abs_diff"] = {s: round(abs(ji[s] - ti[s]), 4) for s in common}
    out["final_window"] = {
        "loss_jax": round(jl[common[-1]], 4),
        "loss_torch": round(tl[common[-1]], 4),
        "iou_jax": round(ji[common[-1]], 4),
        "iou_torch": round(ti[common[-1]], 4),
    }

    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    plot = (ascii_overlay(jl, tl, "loss") + "\n\n" +
            ascii_overlay(ji, ti, "iou") + "\n")
    with open(os.path.join(out_dir, "curves.txt"), "w") as f:
        f.write(plot)
    print(plot)
    print(json.dumps(out["final_window"]))


if __name__ == "__main__":
    main()
