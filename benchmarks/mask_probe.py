"""Micro-probe: dropout mask generation variants at config-4 scale (real TPU).

36 masks of (32, 1025, 1024) — the per-step mask volume of the config-4
train step.  Variants:
  bern_f32  — jax.random.bernoulli (uniform-f32 compare; the r02 shipped path)
  bits16    — uint16 random bits < round(keep·2^16)  (half the random words
              if the RBG lowering honors the narrow width)
  bits8     — uint8 bits < round(keep·2^8)           (quarter)
Applied cost is also measured (mask → where on a bf16 tensor) so a cheaper
generator that hurts apply fusion shows up.
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    import jax
    import jax.numpy as jnp

    keep = 0.9
    shape = (32, 1025, 1024)
    n_masks = 36

    def keys_for(key):
        return jax.random.split(jax.random.wrap_key_data(
            jnp.concatenate([jax.random.key_data(key)] * 2), impl="rbg"),
            n_masks)

    def gen_bern(key, x):
        out = x
        for k in keys_for(key):
            m = jax.random.bernoulli(k, keep, shape)
            out = jnp.where(m, out / keep, jnp.zeros_like(out))
        return out

    def gen_bits(dtype, bits):
        thresh = int(round(keep * (1 << bits)))

        def f(key, x):
            out = x
            for k in keys_for(key):
                m = jax.random.bits(k, shape, dtype) < dtype(thresh)
                out = jnp.where(m, out / keep, jnp.zeros_like(out))
            return out
        return f

    x = jnp.ones(shape, jnp.bfloat16)
    results = {}
    for name, fn in [("bern_f32", gen_bern),
                     ("bits16", gen_bits(jnp.uint16, 16)),
                     ("bits8", gen_bits(jnp.uint8, 8))]:
        jf = jax.jit(fn)
        out = jf(jax.random.key(0), x)
        float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
        reps = 10
        t0 = time.perf_counter()
        for i in range(reps):
            out = jf(jax.random.fold_in(jax.random.key(0), i), x)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps
        # sanity: keep-rate within 4 sigma
        rate = float(jnp.mean((out != 0).astype(jnp.float32)))
        results[name] = {"ms": round(dt * 1000, 2), "keep_rate": round(rate, 5)}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
