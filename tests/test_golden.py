"""Golden-logit parity: the full JAX float32 pipeline (NIfTI decode →
pad/crop → live-config model) vs recorded float64 reference-math logits over
the 6 bundled subjects.  Budget: 1e-3 (BASELINE.md parity target).

Regenerate fixtures with tests/make_golden.py after INTENTIONAL semantic
changes only — an unexpected diff here is a parity regression.
"""

import os
from pathlib import Path

import numpy as np
import pytest

import jax

import make_golden

GOLDEN = Path(__file__).parent / "golden"
has_data = os.path.isdir(make_golden.UCSF)

pytestmark = pytest.mark.skipif(not has_data, reason="ucsf-data not mounted")


@pytest.mark.parametrize("name,model_name,cfg_fn", [
    ("cross_live", "model_cross", make_golden.cross_live_config),
    ("vit_live", "model_vit", make_golden.vit_live_config),
])
def test_golden_logits(name, model_name, cfg_fn):
    from cross_attention_vit_tpu import models
    from cross_attention_vit_tpu.data.dataset import BrainDataset

    fixture = GOLDEN / f"{name}.npz"
    assert fixture.exists(), "run tests/make_golden.py"
    with np.load(fixture, allow_pickle=False) as z:
        want = z["logits"]
        subjects = [s for s in z["subjects"]]
        seed = int(z["seed"])

    model = getattr(models, model_name)
    cfg, types = cfg_fn()
    df = make_golden.cohort_df()
    assert [str(s) for s in subjects] == df["ID"].tolist()

    ds = BrainDataset(df, cfg, types=types, is_train=False,
                      folder=make_golden.UCSF)
    imgs, labels = ds.batch(range(len(ds)))
    params = model.init(jax.random.key(seed), cfg)
    logits = np.asarray(jax.jit(
        lambda p, x: model.apply(p, cfg, x))(params, imgs))

    np.testing.assert_allclose(logits, want, atol=1e-3, rtol=1e-3)


def test_golden_flash_and_bf16_within_budget():
    """The production path (bf16 + flash kernel) must stay within a relaxed
    budget of the golden logits (bf16 mantissa ⇒ ~1e-2)."""
    from cross_attention_vit_tpu import models
    from cross_attention_vit_tpu.data.dataset import BrainDataset

    with np.load(GOLDEN / "cross_live.npz") as z:
        want = z["logits"]
        seed = int(z["seed"])
    cfg, types = make_golden.cross_live_config()
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    df = make_golden.cohort_df()
    ds = BrainDataset(df, cfg, types=types, is_train=False,
                      folder=make_golden.UCSF)
    imgs, _ = ds.batch(range(len(ds)))
    params = models.model_cross.init(jax.random.key(seed), cfg)
    logits = np.asarray(jax.jit(
        lambda p, x: models.model_cross.apply(p, cfg, x))(params, imgs))
    np.testing.assert_allclose(logits, want, atol=3e-2)
    # and prediction order agrees
    np.testing.assert_array_equal(logits.argmax(1), want.argmax(1))
