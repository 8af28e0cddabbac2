#!/usr/bin/env bash
# Same-init convergence A/B, fully symmetric (VERDICT r4 #5).
#
# Extends artifacts/convergence_ab/sameinit_400 to a 600-step horizon with
# --no_seq_freeze on the jax side (the 400-step run froze the id bank after
# step 200 while the torch twin never froze — the one noted asymmetry), so
# "same plateau" becomes a settled window instead of a single endpoint.
#
# Usage: tools/run_sameinit_ab.sh [steps] [workdir]
# Torch side is ~7 s/step on this image's single CPU core — 600 steps is
# ~70 min; run in background and keep the host otherwise quiet only for
# TIMING work (this is a correctness run, contention just slows it).
set -euo pipefail
STEPS="${1:-600}"
WORK="${2:-/tmp/ab600}"
OUT="artifacts/convergence_ab/sameinit_${STEPS}"
cd "$(dirname "$0")/.."
mkdir -p "$WORK" "$OUT"

if [ ! -f "$WORK/stream.npz" ]; then
  echo "[ab] dumping fixed 200-batch stream (batch 4, crop 129)"
  python tools/overfit_check.py --dump_stream 200 \
    --dump_batch "$WORK/stream.npz" --batch 4 --crop 129 --cpu
fi

echo "[ab] torch twin: dump init + $STEPS steps"
python tools/overfit_ref.py --batch_npz "$WORK/stream.npz" --stream \
  --steps "$STEPS" --lr 2e-4 --no_droppath --log_step 10 \
  --dump_init "$WORK/init.pth" \
  --jsonl "$OUT/torch_sameinit.jsonl"

echo "[ab] jax twin: $STEPS steps from the torch init, no seq freeze"
python tools/overfit_check.py --stream_npz "$WORK/stream.npz" \
  --steps "$STEPS" --lr 2e-4 --batch 4 --crop 129 --fp32 \
  --no_droppath --no_id_shuffle --no_seq_freeze --log_step 10 \
  --init_pth "$WORK/init.pth" --cpu \
  --jsonl "$OUT/jax_sameinit.jsonl"

echo "[ab] done — summarize with tools/summarize_ab.py if present, or:"
echo "     python - <<'EOF'  # windowed means of the last 100 steps"
echo "..."
