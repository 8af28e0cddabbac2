#!/usr/bin/env bash
# Demo inference (reference: inference.sh).
set -e
model="${1:-r50_deaotl}"
ckpt="${2:-test}"
python tools/demo.py --model "${model}" --ckpt_path "${ckpt}" \
    --data_path ./datasets/Demo --output_path ./demo_output
