"""Measure the full jitted training step (fwd+bwd+AdamW+EMA) wall time.

The reference trains at 0.52 s/step for global batch 16 on 4xV100 =
130 ms/sample-per-accelerator (reference README.md:142,
configs/default.py:59-60). This prints ms/step and ms/sample on the
attached chip so loss-pipeline optimisations can be verified end to end.

Usage: python tools/bench_train_step.py [--batch 8] [--model aott] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--model", type=str, default="aott")
    p.add_argument("--size", type=int, default=465)
    p.add_argument("--seq", type=int, default=5)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--mode", choices=["step", "fwd", "grad"], default="step",
                   help="step=full train step; fwd=loss forward only; "
                        "grad=value_and_grad only (no optimizer/EMA)")
    p.add_argument("--no_remat", action="store_true",
                   help="disable jax.checkpoint on the propagation scan "
                        "body (needs the activations to fit HBM)")
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots"],
                   help="TRAIN_REMAT_POLICY: what the scan-body checkpoint "
                        "keeps resident")
    args = p.parse_args()

    from aot_tpu.configs import build_config
    from aot_tpu.engine.train import build_train_engine
    from aot_tpu.models import build_vos_model
    from aot_tpu.train.step import create_train_state, make_train_step
    from aot_tpu.utils.runtime import setup_runtime

    cfg = build_config(stage="pre", model=args.model, exp_name="bench",
                       make_dirs=False,
                       TRAIN_REMAT_POLICY=args.remat_policy,
                       **({"TRAIN_REMAT": False} if args.no_remat else {}))
    setup_runtime(matmul_precision=cfg.TRAIN_MATMUL_PRECISION)
    model = build_vos_model(cfg)
    engine = build_train_engine(model, cfg)

    t, b, hw = args.seq, args.batch, args.size
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, hw, hw, 3), jnp.float32)
    oh = jnp.zeros((1, hw, hw, cfg.MODEL_MAX_OBJ_NUM + 1),
                   jnp.float32).at[..., 0].set(1.0)
    params = jax.jit(lambda r: model.init(r, img, oh,
                                          deterministic=True))(rng)["params"]
    state = create_train_state(cfg, params)

    if args.mode == "step":
        step = jax.jit(make_train_step(cfg, engine), static_argnums=(5,),
                       donate_argnums=(0,))
    else:
        from aot_tpu.ops.attention import attn_training_context

        def loss_only(params_, frames, masks, obj_nums, rng):
            rngs = {"dropout": rng, "droppath": rng}
            with attn_training_context():
                return engine.forward(params_, frames, masks, obj_nums,
                                      jnp.float32(1000.0), rngs=rngs,
                                      use_prev_pred=False)[0]

        if args.mode == "fwd":
            fn = jax.jit(loss_only)
        else:
            fn = jax.jit(jax.value_and_grad(loss_only))

        def step(state_, frames, masks, obj_nums, rng, _flag):
            out = fn(state_.params, frames, masks, obj_nums, rng)
            loss = out[0] if args.mode == "grad" else out
            return state_, {"loss": loss}

    frames = jnp.asarray(
        np.random.RandomState(0).rand(t, b, hw, hw, 3), jnp.float32)
    masks = jnp.asarray(
        np.random.RandomState(1).randint(0, 4, (t, b, hw, hw)), jnp.int32)
    obj_nums = jnp.full((b,), 3, jnp.int32)

    print(f"[bench_train_step] model={args.model} batch={b} size={hw} "
          f"seq={t} device={jax.devices()[0].device_kind}")
    t0 = time.perf_counter()
    state, stats = step(state, frames, masks, obj_nums, rng, True)
    float(stats["loss"])
    print(f"  compile+first step: {time.perf_counter() - t0:.1f} s")

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, stats = step(state, frames, masks, obj_nums, rng, True)
        loss = float(stats["loss"])  # forces full readback, honest timing
        times.append(time.perf_counter() - t0)
    ms = 1e3 * float(np.median(times))
    print(f"  steady step: {ms:.0f} ms  ({ms / b:.1f} ms/sample; "
          f"loss={loss:.4f})")
    print(f"  all: {[f'{1e3 * x:.0f}' for x in times]}")
    if args.mode == "step":
        # training MFU: compiled FLOPs per step / step time / v5e bf16 peak
        try:
            cost = step.lower(state, frames, masks, obj_nums, rng,
                              True).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            mfu = flops / (ms / 1e3) / 197e12
            print(f"  flops/step: {flops:.3e}  MFU: {mfu:.3f} "
                  f"(v5e 197 TF/s bf16 peak)")
        except Exception as e:  # noqa: BLE001
            print(f"  cost_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
