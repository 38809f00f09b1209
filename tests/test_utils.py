"""utils: accum_tensor fold, StageTimer, predict API."""

import numpy as np
import pytest

from cross_attention_vit_tpu.utils import StageTimer, accum_tensor


def test_accum_tensor_fold():
    a = np.arange(12).reshape(3, 4)
    b = np.ones((3, 4))
    got = accum_tensor(a, b, lambda x, y: x * y)
    assert got == a.sum()
    with pytest.raises(ValueError):
        accum_tensor(np.ones(3), np.ones(4), lambda x, y: x)


def test_stage_timer():
    import time
    t = StageTimer()
    with t.stage("sleepy"):
        time.sleep(0.01)
    with t.stage("sleepy"):
        time.sleep(0.01)
    assert t.counts["sleepy"] == 2
    assert t.totals["sleepy"] >= 0.02
    assert "sleepy" in t.summary()


def test_trainer_predict_probabilities(tmp_path):
    import jax
    from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.train.trainer import Trainer
    from test_train import FakeDataset

    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=16, mlp_dim=32, num_heads=2, num_layers=1,
                            img_size=(8, 8, 8), patch_size=(8, 8, 8),
                            num_modalities=1, dropout=0.0, lr=1e-3,
                            weight_decay=0.0, label_smoothing=0.0,
                            optim_params={"T_max": 1, "eta_min": 0}))
    rng = np.random.default_rng(0)
    ds = FakeDataset(rng.normal(size=(4, 1, 1, 8, 8, 8)).astype(np.float32),
                     np.array([0, 1, 0, 1], dtype=np.int32))
    loader = PrefetchLoader(ds, batch_size=2)
    t = Trainer(model_vit, cfg, max_epochs=1, seed=0)
    t.init_state()
    probs = t.predict(loader)
    assert probs.shape == (4,)
    assert ((0 <= probs) & (probs <= 1)).all()
