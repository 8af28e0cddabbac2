#!/bin/bash
# End-to-end training smoke on REAL data (the mounted Demo frames arranged
# as a Static pretrain set): proves the optimizer/EMA/curriculum/data
# pipeline converges, auto-resume works, PRE -> PRE_YTB_DAV chaining loads
# the EMA checkpoint, and the resulting weights drive tools/eval.py
# (reference flow: train_eval.sh:12-51).
#
# Usage: bash tools/e2e_train_demo.sh [RUN_DIR] [STEPS]
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
RUN=${1:-/tmp/e2e_run}
STEPS=${2:-300}
HALF=$((STEPS / 2))
DEMO=${DEMO_DATA:-/root/reference/datasets/Demo}

rm -rf "$RUN" && mkdir -p "$RUN/datasets/Static" "$RUN/datasets"
ln -sfn "$DEMO" "$RUN/datasets/Demo"

python - "$RUN" "$DEMO" <<'EOF'
# Static-layout (JPEGImages/ + Annotations/) from the Demo annotated frames.
# Sources are resized to ~300px short side at build time: the augmentation
# pipeline (affine warp, hue, jitter) costs O(source pixels) and the crop is
# 257^2 — the reference's static pretrain sets are similarly pre-sized.
import os, sys
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
        # keep only the K largest objects (the reference pretrains on
        # saliency-style 1-object data; the Demo panoptic masks carry 40+
        # tiny objects, which makes a short from-scratch run unlearnable)
        import numpy as np
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
print(f"static set: {n} annotated frames")
EOF

cd "$RUN"
COMMON=(--exp_name e2e --model aott --datasets static --batch_size 4
        --data_workers 2 --log_step 25 --save_step "$HALF"
        --set "DATA_RANDOMCROP=(257,257)" --set TRAIN_LR=0.0004
        --set TRAIN_IMG_LOG=True --set TRAIN_TBLOG_STEP=250)

# phase 1: first half, then auto-resume completes the run
python "$REPO/tools/train.py" --stage pre "${COMMON[@]}" --total_steps "$HALF"
echo "=== auto-resume to $STEPS ==="
python "$REPO/tools/train.py" --stage pre "${COMMON[@]}" \
  --total_steps "$STEPS"

# phase 2: stage chaining (PRE -> PRE_YTB_DAV loads PRE's EMA ckpt)
echo "=== stage chaining ==="
python "$REPO/tools/train.py" --stage pre_ytb_dav "${COMMON[@]}" \
  --total_steps "$HALF"

# phase 3: eval the trained checkpoint on the Demo sequences
echo "=== eval trained ckpt ==="
python "$REPO/tools/eval.py" --exp_name e2e --model aott \
  --stage pre_ytb_dav --dataset demo --ema --max_resolution 240

echo "=== artifacts ==="
find . -name metrics.jsonl | head
find ./results -name "*.png" | head -3
