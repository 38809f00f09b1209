"""int8 w8a8 FFN quantization A/B on the real chip (eval forward).

Measures, in ONE process (both variants share the backend; quantization is
a params rewrite, not a global knob): full-precision-path vs int8-FFN eval
forward at a chosen geometry, plus the logit drift between them on the same
inputs.  Timing discipline: dispatch N, force completion with a D2H scalar
fetch (the axon relay acks block_until_ready early).

Usage: python benchmarks/bench_quant.py --model vit4   # config-4 geometry
       python benchmarks/bench_quant.py --model cross8 # live flagship shape
"""

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["vit4", "cross8", "vitL6"],
                    default="vit4",
                    help="vitL6 = the config-6 ViT-Large eval geometry")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--attn", action="store_true",
                    help="int8+attn mode: also quantize the self-attention "
                         "qkv/out projections (SDPA stays bf16)")
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    if not args.no_cache:
        from cross_attention_vit_tpu.utils import enable_compilation_cache

        enable_compilation_cache(str(ROOT / ".bench_jit_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_attention_vit_tpu.configs import (get_mgmt_config,
                                                 get_mgmt_cross_config,
                                                 modify_config)
    from cross_attention_vit_tpu.models import model_cross, model_vit
    from cross_attention_vit_tpu.models.quantize import (calibrate,
                                                         count_quantized,
                                                         quantize_for_inference)
    from cross_attention_vit_tpu.utils import flops as F

    common = dict(lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
                  optim_params={"T_max": 250, "eta_min": 1e-6}, img_aug=False)
    if args.model in ("vit4", "vitL6"):
        module = model_vit
        cfg = get_mgmt_config()
        modify_config(cfg, common)
        if args.model == "vit4":
            modify_config(cfg, dict(num_layers=12, dropout=0.1,
                                    num_modalities=2))
            batch, M = 32, 2
        else:  # config-6 geometry: ViT-Large eval, batch 6
            modify_config(cfg, dict(hidden_dim=1024, mlp_dim=4096,
                                    num_heads=16, num_layers=24, dropout=0.0,
                                    num_modalities=2))
            batch, M = 6, 2
        fwd_flops = lambda: F.model_vit_fwd_flops(cfg, batch)
    else:
        module = model_cross
        cfg = get_mgmt_cross_config()
        modify_config(cfg, common)
        modify_config(cfg, dict(dropout=0.25,
                                attn_order={"0": "1", "1": "2", "2": "0"},
                                num_modalities=3))
        batch, M = 8, 3
        fwd_flops = lambda: F.model_cross_fwd_flops(cfg, batch)
    cfg.compute_dtype = "bfloat16"
    cfg.activation_dtype = "bfloat16"
    cfg.use_flash_attention = True

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        (rng.normal(size=(batch, M, 1, *cfg.img_size)) * 800).astype(np.float32))

    params = module.init(jax.random.key(0), cfg)
    qparams = quantize_for_inference(params, attn=args.attn)
    n_q, int8_bytes = count_quantized(qparams)
    qparams = jax.device_put(jax.tree.map(jnp.asarray, qparams))

    fwd = jax.jit(lambda p, x: module.apply(p, cfg, x))

    def run(p):
        out = fwd(p, imgs)
        float(jnp.sum(out))  # compile + trustworthy sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fwd(p, imgs)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / args.reps, np.asarray(out)

    dt, logits = run(params)
    qdt, qlogits = run(qparams)

    # static calibrated activation scales: eager calibration forward (per-op
    # dispatch — slow on a relayed runtime, offline-once in production)
    t0 = time.perf_counter()
    sparams = calibrate(qparams, lambda p, x: module.apply(p, cfg, x), imgs)
    calib_s = time.perf_counter() - t0
    sparams = jax.device_put(jax.tree.map(jnp.asarray, sparams))
    sdt, slogits = run(sparams)

    print(json.dumps({
        "model": args.model, "batch": batch, "attn": args.attn,
        "fwd_ms_bf16": round(dt * 1e3, 2),
        "fwd_ms_int8_dynamic": round(qdt * 1e3, 2),
        "fwd_ms_int8_static": round(sdt * 1e3, 2),
        "speedup_dynamic": round(dt / qdt, 3),
        "speedup_static": round(dt / sdt, 3),
        "mfu_fwd_bf16": round(F.mfu(fwd_flops(), dt), 4),
        "mfu_fwd_int8_static": round(F.mfu(fwd_flops(), sdt), 4),
        "quantized_kernels": n_q, "int8_mb": round(int8_bytes / 2 ** 20, 1),
        "calib_s": round(calib_s, 1),
        "max_logit_drift_dynamic": float(np.max(np.abs(qlogits - logits))),
        "max_logit_drift_static": float(np.max(np.abs(slogits - logits))),
        "argmax_equal": bool((qlogits.argmax(1) == logits.argmax(1)).all()
                             and (slogits.argmax(1) == logits.argmax(1)).all()),
    }))


if __name__ == "__main__":
    main()
