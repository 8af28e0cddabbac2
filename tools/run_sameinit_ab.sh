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
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/artifacts/convergence_ab/sameinit_${STEPS}"
cd "$REPO"
mkdir -p "$WORK" "$OUT"

if [ ! -d "$WORK/datasets/Static/JPEGImages" ]; then
  echo "[ab] building Static fixture from the Demo frames (e2e_train_demo recipe)"
  DEMO=${DEMO_DATA:-/root/reference/datasets/Demo}
  mkdir -p "$WORK/datasets/Static"
  python - "$WORK" "$DEMO" <<'PYEOF'
import os, sys
import numpy as np
from PIL import Image
run, demo = sys.argv[1], sys.argv[2]
img_dir = os.path.join(run, "datasets/Static/JPEGImages/COCO")
ann_dir = os.path.join(run, "datasets/Static/Annotations/COCO")
os.makedirs(img_dir, exist_ok=True); os.makedirs(ann_dir, exist_ok=True)
SHORT = 300
def resized(im, resample):
    w, h = im.size
    s = SHORT / min(w, h)
    return im.resize((round(w * s), round(h * s)), resample) if s < 1 else im
n = 0
for seq in sorted(os.listdir(os.path.join(demo, "masks"))):
    for m in sorted(os.listdir(os.path.join(demo, "masks", seq))):
        stem = os.path.splitext(m)[0]
        src_img = os.path.join(demo, "images", seq, stem + ".jpg")
        if not os.path.exists(src_img):
            continue
        resized(Image.open(src_img).convert("RGB"), Image.BILINEAR).save(
            os.path.join(img_dir, f"{seq}_{stem}.jpg"), quality=95)
        mask = resized(Image.open(os.path.join(demo, "masks", seq, m)),
                       Image.NEAREST)
        arr = np.array(mask)
        ids, counts = np.unique(arr[arr > 0], return_counts=True)
        keep = ids[np.argsort(counts)[::-1][:3]]
        out = np.zeros_like(arr)
        for new_id, old_id in enumerate(keep, start=1):
            out[arr == old_id] = new_id
        pm = Image.fromarray(out, "P" if mask.mode == "P" else "L")
        if mask.mode == "P":
            pm.putpalette(mask.getpalette())
        pm.save(os.path.join(ann_dir, f"{seq}_{stem}.png"))
        n += 1
print(f"[ab] static fixture: {n} image/mask pairs")
PYEOF
fi

if [ ! -f "$WORK/stream.npz" ]; then
  echo "[ab] dumping fixed 200-batch stream (batch 4, crop 129)"
  (cd "$WORK" && python "$REPO/tools/overfit_check.py" --dump_stream 200 \
    --dump_batch "$WORK/stream.npz" --batch 4 --crop 129 --cpu)
fi

echo "[ab] torch twin: dump init + $STEPS steps"
(cd "$WORK" && python "$REPO/tools/overfit_ref.py" \
  --batch_npz "$WORK/stream.npz" --stream \
  --steps "$STEPS" --lr 2e-4 --no_droppath --log_step 10 \
  --dump_init "$WORK/init.pth" \
  --jsonl "$OUT/torch_sameinit.jsonl")

echo "[ab] jax twin: $STEPS steps from the torch init, no seq freeze"
(cd "$WORK" && python "$REPO/tools/overfit_check.py" \
  --stream_npz "$WORK/stream.npz" \
  --steps "$STEPS" --lr 2e-4 --batch 4 --crop 129 --fp32 \
  --no_droppath --no_id_shuffle --no_seq_freeze --log_step 10 \
  --init_pth "$WORK/init.pth" --cpu \
  --jsonl "$OUT/jax_sameinit.jsonl")

echo "[ab] done — summarize with tools/summarize_ab.py if present, or:"
echo "     python - <<'EOF'  # windowed means of the last 100 steps"
echo "..."
