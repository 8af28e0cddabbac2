"""Decompose the training FORWARD into its stages on the real chip.

bench_train_step --mode fwd measures the whole engine.forward; this times
each stage as its own jitted function (encoder / id-emb / add-ref /
propagate / decode / loss / memory-update) so the gap between the sum of
parts and the whole is visible (scan+remat overhead, fusion differences).

Usage: python tools/bench_fwd_parts.py [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2, **kw):
    for _ in range(warmup):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--model", type=str, default="aott")
    p.add_argument("--size", type=int, default=465)
    p.add_argument("--train-trace", action="store_true", default=True)
    args = p.parse_args()

    from aot_tpu.configs import build_config
    from aot_tpu.engine.train import build_train_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.ops.attention import attn_training_context
    from aot_tpu.utils.runtime import setup_runtime

    cfg = build_config(stage="pre", model=args.model, exp_name="bench",
                       make_dirs=False)
    setup_runtime(matmul_precision=cfg.TRAIN_MATMUL_PRECISION)
    model = build_vos_model(cfg)
    eng = build_train_engine(model, cfg)

    t, b, hw = 5, args.batch, args.size
    rng = jax.random.PRNGKey(0)
    img1 = jnp.zeros((1, hw, hw, 3), jnp.float32)
    oh1 = jnp.zeros((1, hw, hw, cfg.MODEL_MAX_OBJ_NUM + 1),
                    jnp.float32).at[..., 0].set(1.0)
    params = jax.jit(lambda r: model.init(r, img1, oh1,
                                          deterministic=True))(rng)["params"]

    frames = jnp.asarray(np.random.RandomState(0).rand(t * b, hw, hw, 3),
                         jnp.float32)
    masks = jnp.asarray(np.random.RandomState(1).randint(0, 4, (b, hw, hw)),
                        jnp.int32)
    obj_nums = jnp.full((b,), 3, jnp.int32)
    rngs = {"dropout": rng, "droppath": rng}

    print(f"[bench_fwd_parts] model={args.model} batch={b} size={hw}")

    def run(name, fn, *a, **kw):
        def wrapped(*x):
            with attn_training_context():
                return fn(*x)

        jfn = jax.jit(wrapped)
        ms = timeit(jfn, *a, **kw)
        print(f"  {name:40s} {ms:8.2f} ms")
        return ms

    # 1. encoder on all 40 frames
    run("encoder 40 frames", lambda f: eng.encode_image(params, f), frames)

    xs = jax.jit(lambda f: eng.encode_image(params, f))(frames)
    feats1 = [x.reshape((t, b) + x.shape[1:])[0] for x in xs]

    # 2. id embedding (one_hot + id-bank conv), once per frame in the step
    def idemb(m):
        from aot_tpu.ops.image import one_hot_mask
        oh = one_hot_mask(m, cfg.MODEL_MAX_OBJ_NUM)
        return eng.get_id_emb(params, oh, deterministic=False, rngs=rngs)
    run("id_emb (x5 per step)", idemb, masks)

    # 3. reference frame seeding
    def addref(m):
        id_emb = idemb(m)
        return eng.add_reference_frame(params, None, m, obj_nums,
                                       img_embs=feats1, id_emb=id_emb,
                                       deterministic=False, rngs=rngs)
    run("add_reference_frame", addref, masks)
    state = jax.jit(addref)(masks)

    # 4. propagate one frame (x4 per step)
    def prop(st):
        return eng.propagate(params, st, None, img_embs=feats1,
                             deterministic=False, rngs=rngs)
    run("propagate (x4)", prop, state)

    # 5. decode logits at stride 4
    def dec(st):
        return eng._apply(params, type(model).decode_id_logits,
                          st.embs, st.shortcuts, rngs=rngs)
    run("decode stride-4 (x5)", dec, state)

    # 6. full frame loss (decode+upsample+CE+jac)  (x5 per step)
    def floss(st, m):
        return eng._frame_loss(params, st, m, obj_nums, None,
                               jnp.float32(1000.0), (hw, hw), rngs)[0]
    run("frame_loss (x5)", floss, state, masks)

    # 7. memory update (x3 per step)
    def upd(st, m):
        id_emb = idemb(m)
        return eng.update_memory(params, st, id_emb=id_emb,
                                 deterministic=False, rngs=rngs)
    run("update_memory (x3)", upd, state, masks)

    # whole forward for comparison
    frames_tb = frames.reshape(t, b, hw, hw, 3)
    masks_tb = jnp.broadcast_to(masks, (t, b, hw, hw))

    def full(f, m):
        with attn_training_context():
            return eng.forward(params, f, m, obj_nums, jnp.float32(1000.0),
                               rngs=rngs, use_prev_pred=False)[0]
    ms = timeit(jax.jit(full), frames_tb, masks_tb, iters=4)
    print(f"  {'FULL forward':40s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
