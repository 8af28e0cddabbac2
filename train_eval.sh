#!/usr/bin/env bash
# Two-stage training (PRE then PRE_YTB_DAV) + benchmark evals
# (reference: train_eval.sh — same flow, TPU mesh instead of GPU DDP).
set -e

exp="${1:-aot}"
model="${2:-aott}"
devices="${devices:--1}"

echo "== stage 1: static-image pretraining (PRE) =="
python tools/train.py --exp_name "${exp}" --stage pre --model "${model}" \
    --gpu_num "${devices}"

echo "== stage 2: main VOS training (PRE_YTB_DAV) =="
python tools/train.py --exp_name "${exp}" --stage pre_ytb_dav \
    --model "${model}" --gpu_num "${devices}"

echo "== evals =="
dataset_args=(
    "--dataset youtubevos --split val"
    "--dataset youtubevos2019 --split val"
    "--dataset davis2017 --split val"
    "--dataset davis2017 --split test"
    "--dataset davis2016 --split val"
)
for args in "${dataset_args[@]}"; do
    # shellcheck disable=SC2086
    python tools/eval.py --exp_name "${exp}" --stage pre_ytb_dav \
        --model "${model}" --ema ${args}
done
