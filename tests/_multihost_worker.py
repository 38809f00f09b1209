"""Worker for the 2-process jax.distributed test (spawned by
test_multihost.py).  Each process owns 2 virtual CPU devices; together they
form a 4-device ('data','model') = (2,2) mesh — the multi-host analogue of
the reference's `Trainer(devices=4, num_nodes=2)` DDP launch
(reference main_mist.py:216-217).

Runs 2 train steps of a tiny ModelCross through the REAL multi-host paths:
  * WeightedRandomSampler.epoch_indices(epoch, host_id, num_hosts) per-host
    draws;
  * loader._put / make_array_from_process_local_data global-batch assembly;
  * make_train_step with replicated metric outputs;
  * MetricAccumulator device-side accumulation + one epoch-end device_get;
  * Trainer._host_snapshot-style replicated gather of TP-sharded params.

Prints ONE JSON line of results for the parent to compare across processes
and against a single-process run of the same global batch.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp

    from cross_attention_vit_tpu.data.dataset import WeightedRandomSampler
    from cross_attention_vit_tpu.data.loader import _label_sharding, _put
    from cross_attention_vit_tpu.models import model_cross
    from cross_attention_vit_tpu.parallel import (batch_sharding, make_mesh,
                                                  replicated, shard_params)
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.metrics import MetricAccumulator
    from cross_attention_vit_tpu.train.trainer import make_train_step

    from test_multihost import GLOBAL_BATCH, LOCAL_BATCH, STEPS, tiny_config

    cfg = tiny_config()
    mesh = make_mesh(2, 2)

    params = shard_params(model_cross.init(jax.random.key(0), cfg), mesh)
    opt_state = optim.init(params)
    step = make_train_step(model_cross.apply, cfg, mesh=mesh)

    sampler = WeightedRandomSampler(np.asarray([1.0, 3.0, 1.0, 3.0] * 4),
                                    num_samples=16, seed=7)
    sampler_draw = sampler.epoch_indices(0, host_id=pid, num_hosts=nproc)

    img_sharding = batch_sharding(mesh, 6)
    acc = MetricAccumulator()
    rng = np.random.default_rng(0)
    # the GLOBAL batch streams are identical on every host; each host feeds
    # only its contiguous slice, mimicking per-host decode of its index shard
    for s in range(STEPS):
        g_img = rng.normal(size=(GLOBAL_BATCH, 3, 1, *cfg.img_size)).astype(np.float32)
        g_lab = rng.integers(0, 2, size=(GLOBAL_BATCH,)).astype(np.int32)
        lo = pid * LOCAL_BATCH
        img = _put(g_img[lo:lo + LOCAL_BATCH], img_sharding)
        lab = _put(g_lab[lo:lo + LOCAL_BATCH], _label_sharding(img_sharding))
        assert img.shape[0] == GLOBAL_BATCH, img.shape
        params, opt_state, aux = step(params, opt_state, img, lab,
                                      jnp.asarray(1e-3, jnp.float32),
                                      jax.random.fold_in(jax.random.key(1), s))
        acc.update(aux["loss"], aux["counts"], aux["probs"], aux["labels"])
    metrics = acc.result()

    # replicated gather of TP-sharded params (the _host_snapshot collective)
    gathered = jax.jit(lambda p: p, out_shardings=replicated(mesh))(params)
    host_params = jax.device_get(gathered)
    psum = float(sum(np.abs(x).sum() for x in jax.tree.leaves(host_params)))

    # TP+FSDP across the process boundary (r4 verdict item 5): ZeRO shards
    # every large param (and, via inheritance, its Adam moments) over 'data'
    # ON TOP of the TP 'model' split, so the step's all-gathers and
    # reduce-scatters cross the jax.distributed boundary.  Same global
    # batches as the DP+TP phase → bit-comparable across processes and vs
    # the single-process run.
    params_f = shard_params(model_cross.init(jax.random.key(0), cfg), mesh,
                            fsdp=True)
    opt_f = optim.init(params_f)
    acc_f = MetricAccumulator()
    rng_f = np.random.default_rng(0)
    for s in range(STEPS):
        g_img = rng_f.normal(size=(GLOBAL_BATCH, 3, 1, *cfg.img_size)).astype(np.float32)
        g_lab = rng_f.integers(0, 2, size=(GLOBAL_BATCH,)).astype(np.int32)
        lo = pid * LOCAL_BATCH
        img = _put(g_img[lo:lo + LOCAL_BATCH], img_sharding)
        lab = _put(g_lab[lo:lo + LOCAL_BATCH], _label_sharding(img_sharding))
        params_f, opt_f, aux = step(params_f, opt_f, img, lab,
                                    jnp.asarray(1e-3, jnp.float32),
                                    jax.random.fold_in(jax.random.key(1), s))
        acc_f.update(aux["loss"], aux["counts"], aux["probs"], aux["labels"])
    fsdp_metrics = acc_f.result()
    gathered_f = jax.jit(lambda p: p, out_shardings=replicated(mesh))(params_f)
    fsdp_psum = float(sum(np.abs(x).sum()
                          for x in jax.tree.leaves(jax.device_get(gathered_f))))

    # ring attention across the PROCESS boundary: tokens shard over a 'seq'
    # axis spanning both hosts, so every ppermute hop in the ring crosses
    # processes at least once — checked against the dense single-host math
    ring_err = _ring_across_processes(pid)

    print(json.dumps({
        "pid": pid,
        "sampler_draw": sampler_draw.tolist(),
        "metrics": {k: round(float(v), 6) for k, v in metrics.items()},
        "param_abs_sum": round(psum, 4),
        "fsdp_metrics": {k: round(float(v), 6) for k, v in fsdp_metrics.items()},
        "fsdp_param_abs_sum": round(fsdp_psum, 4),
        "ring_err": ring_err,
    }))


def _ring_across_processes(pid: int) -> float:
    import functools

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cross_attention_vit_tpu.ops.attention import _sdpa
    from cross_attention_vit_tpu.parallel import make_mesh
    from cross_attention_vit_tpu.parallel.ring import ring_attention

    try:
        from jax import shard_map
        rep_kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}

    mesh = make_mesh(1, seq=4)  # all 4 devices on the ring, 2 per process
    spec = P(None, None, "seq", None)
    sharding = NamedSharding(mesh, spec)
    rng = np.random.default_rng(42)  # identical global operands on each host
    q, k, v = (jnp.asarray(a, jnp.float32)
               for a in rng.normal(size=(3, 2, 2, 32, 8)))

    def make(arr):
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: np.asarray(arr[idx]))

    qs, ks, vs = make(q), make(k), make(v)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, **rep_kw)
    def sharded(q, k, v):
        return ring_attention(q, k, v, scale=q.shape[-1] ** -0.5,
                              axis_name="seq", axis_size=4)

    ref = np.asarray(_sdpa(q, k, v, q.shape[-1] ** -0.5))
    err = jax.jit(lambda a, b, c: jnp.max(jnp.abs(sharded(a, b, c) - ref)),
                  out_shardings=NamedSharding(mesh, P()))(qs, ks, vs)
    return float(err)


if __name__ == "__main__":
    main()
