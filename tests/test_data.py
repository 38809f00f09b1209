"""Data pipeline tests using /root/reference/ucsf-data as the natural fixture
(read-only), plus synthetic NIfTI round-trips."""

import os

import numpy as np
import pandas as pd
import pytest

from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
from cross_attention_vit_tpu.data import nifti
from cross_attention_vit_tpu.data.dataset import (BrainDataset, WeightedRandomSampler,
                                                  create_sampler_weights)
from cross_attention_vit_tpu.data.labels import clean_data
from cross_attention_vit_tpu.data.preprocess import (crop_bounds,
                                                     resize_with_pad_or_crop,
                                                     resize_with_pad_or_crop_np)

UCSF = "/root/reference/ucsf-data"
LABELS = "/root/reference/labels.csv"
has_data = os.path.isdir(UCSF)


# ---------------------------------------------------------------------------
# NIfTI reader
# ---------------------------------------------------------------------------

def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.integers(-500, 3000, size=(17, 13, 9)).astype(np.int16)
    for name in ["a.nii", "a.nii.gz"]:
        p = tmp_path / name
        nifti.write_volume(p, vol, pixdim=(1.0, 2.0, 0.5))
        hdr = nifti.read_header(p)
        assert hdr.shape == (17, 13, 9)
        assert hdr.pixdim == (1.0, 2.0, 0.5)
        got = nifti.read_volume(p, np.float32)
        np.testing.assert_array_equal(got, vol.astype(np.float32))


def test_nifti_scaling_matches_spec(tmp_path):
    vol = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = tmp_path / "scaled.nii.gz"
    nifti.write_volume(p, vol, scl_slope=0.5, scl_inter=10.0)
    got = nifti.read_volume(p)
    np.testing.assert_allclose(got, vol * 0.5 + 10.0)
    # slope == 0 means raw values (NIfTI-1 spec)
    p2 = tmp_path / "raw.nii.gz"
    nifti.write_volume(p2, vol, scl_slope=0.0, scl_inter=999.0)
    np.testing.assert_array_equal(nifti.read_volume(p2), vol.astype(np.float32))


def test_nifti_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.read_header(p)


@pytest.mark.skipif(not has_data, reason="ucsf-data not mounted")
def test_nifti_real_volume_stats():
    """Ground truth verified by hand-parsing the header (SURVEY.md §0):
    240×240×155 int16, 1mm isotropic; FLAIR scl maps background to 0."""
    p = nifti.volume_path(UCSF, "UCSF-PDGM-0085", "FLAIR")
    hdr = nifti.read_header(p)
    assert hdr.shape == (240, 240, 155)
    assert hdr.datatype == 4  # int16
    assert hdr.pixdim == (1.0, 1.0, 1.0)
    vol = nifti.read_volume(p)
    assert vol.shape == (240, 240, 155)
    assert vol.dtype == np.float32
    assert vol.min() == 0.0  # scl_slope/inter maps int16 min to 0
    assert 3000 < vol.max() < 3300
    assert vol[0, 0, 0] == 0.0  # air corner


@pytest.mark.skipif(not has_data, reason="ucsf-data not mounted")
def test_nifti_uint8_segmentation():
    vol = nifti.read_volume(nifti.volume_path(UCSF, "UCSF-PDGM-0085",
                                              "tumor_segmentation"))
    assert set(np.unique(vol)).issubset({0.0, 1.0, 2.0, 4.0})


# ---------------------------------------------------------------------------
# ResizeWithPadOrCrop — MONAI semantics
# ---------------------------------------------------------------------------

def test_pad_or_crop_live_shape_bounds():
    """(240,240,155)→(128,128,64) is pure crop: x,y 56:184, z 45:109."""
    b = crop_bounds((240, 240, 155), (128, 128, 64))
    assert b[0] == (0, 0, 56, 184)
    assert b[1] == (0, 0, 56, 184)
    assert b[2] == (0, 0, 45, 109)


def test_pad_or_crop_values():
    vol = np.arange(240 * 240 * 155, dtype=np.float32).reshape(1, 240, 240, 155)
    out = resize_with_pad_or_crop_np(vol, (128, 128, 64), fill=-1.0)
    np.testing.assert_array_equal(out, vol[:, 56:184, 56:184, 45:109])


def test_pad_or_crop_pad_path():
    """Symmetric pad: front diff//2, remainder at the back (MONAI SpatialPad)."""
    vol = np.ones((1, 5, 8, 3), dtype=np.float32)
    out = resize_with_pad_or_crop_np(vol, (8, 4, 6), fill=-1.0)
    assert out.shape == (1, 8, 4, 6)
    # dim0: pad 3 → front 1, back 2
    assert (out[0, 0] == -1).all() and (out[0, 6] == -1).all() and (out[0, 1, 0, 1] == 1)
    # dim1: crop 8→4: start 8//2-4//2=2
    # dim2: pad 3 → front 1, back 2
    assert (out[0, 1, :, 0] == -1).all() and (out[0, 1, :, 4] == -1).all()


def test_pad_or_crop_jax_matches_np():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(2, 1, 30, 17, 23)).astype(np.float32)
    tgt = (24, 24, 16)
    got = np.asarray(resize_with_pad_or_crop(jnp.asarray(vol), tgt, fill=-1.0))
    want = resize_with_pad_or_crop_np(vol, tgt, fill=-1.0)
    np.testing.assert_array_equal(got, want)


def test_pad_or_crop_identity():
    vol = np.ones((1, 4, 4, 4), np.float32)
    np.testing.assert_array_equal(resize_with_pad_or_crop_np(vol, (4, 4, 4)), vol)


# ---------------------------------------------------------------------------
# clean_data — exact reference parity (dataset_ucsf.py:160-168)
# ---------------------------------------------------------------------------

def _toy_labels():
    return pd.DataFrame({
        "ID": ["UCSF-PDGM-004", "UCSF-PDGM-0138", "UCSF-PDGM-315",
               "UCSF-PDGM-52", "UCSF-PDGM-0085", "UCSF-PDGM-292"],
        "MGMT status": ["positive", "positive", "negative",
                        "indeterminate", "negative", None],
    })


def test_clean_data_semantics():
    out = clean_data(_toy_labels(), "MGMT status")
    # blacklist drops 0138 and 315; indeterminate and NaN dropped
    assert list(out["ID"]) == ["UCSF-PDGM-0004", "UCSF-PDGM-0085"]
    assert list(out["MGMT status"]) == [1.0, 0.0]


@pytest.mark.skipif(not os.path.exists(LABELS), reason="labels.csv not mounted")
def test_clean_data_real_labels():
    df = pd.read_csv(LABELS)
    out = clean_data(df, "MGMT status")
    assert len(out) < len(df)
    assert set(out["MGMT status"].unique()) == {0.0, 1.0}
    assert out["ID"].str.match(r"UCSF-PDGM-\d{4}$").all()
    # the 6 bundled subjects survive cleaning
    bundled = {"UCSF-PDGM-0085", "UCSF-PDGM-0279", "UCSF-PDGM-0381",
               "UCSF-PDGM-0392", "UCSF-PDGM-0451", "UCSF-PDGM-0516"}
    assert bundled <= set(out["ID"])


# ---------------------------------------------------------------------------
# BrainDataset end to end on real volumes
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not has_data, reason="ucsf-data not mounted")
def test_brain_dataset_item_and_batch():
    df = pd.DataFrame({"ID": ["UCSF-PDGM-0085", "UCSF-PDGM-0279"],
                       "MGMT status": [1.0, 0.0]})
    cfg = get_mgmt_config()
    modify_config(cfg, {"num_modalities": 2})
    ds = BrainDataset(df, cfg, types=("FLAIR", "T1c"), is_train=False, folder=UCSF)
    img, label = ds[0]
    assert img.shape == (2, 1, 128, 128, 64)
    assert img.dtype == np.float32
    assert label == 1
    imgs, lab = ds.batch([0, 1])
    assert imgs.shape == (2, 2, 1, 128, 128, 64)
    np.testing.assert_array_equal(lab, [1, 0])
    # cache: second read identical and from memory
    img2, _ = ds[0]
    np.testing.assert_array_equal(img, img2)


def test_weighted_sampler_balances_classes():
    df = pd.DataFrame({"y": [0] * 90 + [1] * 10})
    w = create_sampler_weights(df, "y")
    assert w[0] == pytest.approx(1 / 90)
    assert w[-1] == pytest.approx(1 / 10)
    s = WeightedRandomSampler(w, num_samples=100, seed=0)
    idx = np.concatenate([s.epoch_indices(e) for e in range(30)])
    frac_pos = (idx >= 90).mean()
    assert 0.45 < frac_pos < 0.55  # inverse-frequency → balanced draws
    # determinism per (epoch, host)
    np.testing.assert_array_equal(s.epoch_indices(3), s.epoch_indices(3))
    assert not np.array_equal(s.epoch_indices(3), s.epoch_indices(4))
    assert not np.array_equal(s.epoch_indices(3, host_id=0), s.epoch_indices(3, host_id=1))


# ---------------------------------------------------------------------------
# read_volume_cropped — fused decode+crop equals decode-then-crop
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,target", [
    ((30, 17, 23), (24, 24, 16)),   # mixed crop/pad
    ((10, 10, 10), (16, 16, 16)),   # pure pad
    ((20, 20, 20), (8, 8, 8)),      # pure crop
])
def test_read_volume_cropped_matches_naive(tmp_path, shape, target):
    rng = np.random.default_rng(42)
    vol = rng.integers(-500, 3000, size=shape).astype(np.int16)
    p = tmp_path / "v.nii.gz"
    nifti.write_volume(p, vol, scl_slope=0.25, scl_inter=7.5)
    naive = resize_with_pad_or_crop_np(
        nifti.read_volume(p, np.float32), target, fill=-1.0)
    fused = nifti.read_volume_cropped(p, target, fill=-1.0)
    np.testing.assert_allclose(fused, naive, rtol=1e-6)


@pytest.mark.skipif(not has_data, reason="ucsf-data not mounted")
def test_read_volume_cropped_real_volume():
    p = nifti.volume_path(UCSF, "UCSF-PDGM-0085", "FLAIR")
    naive = resize_with_pad_or_crop_np(nifti.read_volume(p), (128, 128, 64), -1.0)
    fused = nifti.read_volume_cropped(p, (128, 128, 64), -1.0)
    np.testing.assert_allclose(fused, naive, rtol=1e-6)


@pytest.mark.skipif(not has_data, reason="ucsf-data not mounted")
def test_disk_cache(tmp_path):
    df = pd.DataFrame({"ID": ["UCSF-PDGM-0085"], "MGMT status": [1.0]})
    cfg = get_mgmt_config()
    modify_config(cfg, {"num_modalities": 1})
    ds = BrainDataset(df, cfg, types=("FLAIR",), folder=UCSF, cache=False,
                      disk_cache=str(tmp_path / "dc"))
    img1, _ = ds[0]
    cached = list((tmp_path / "dc").glob("*.npy"))
    assert len(cached) == 1 and "128x128x64" in cached[0].name
    # second dataset instance reads the cache (same values)
    ds2 = BrainDataset(df, cfg, types=("FLAIR",), folder=UCSF, cache=False,
                      disk_cache=str(tmp_path / "dc"))
    img2, _ = ds2[0]
    np.testing.assert_array_equal(img1, img2)
    assert not list((tmp_path / "dc").glob("*.tmp.npy"))


def test_loader_consumer_abandons_iteration():
    """Breaking out of the batch iterator must not leave the producer thread
    blocked on a full queue."""
    import threading
    import time as _time
    from cross_attention_vit_tpu.data.loader import PrefetchLoader

    class Slow:
        def __len__(self):
            return 64

        def batch(self, idx):
            return (np.zeros((len(idx), 1, 1, 4, 4, 4), np.float32),
                    np.zeros((len(idx),), np.int32))

    loader = PrefetchLoader(Slow(), batch_size=2, prefetch=1)
    before = threading.active_count()
    it = loader(range(64))
    next(it)
    it.close()  # abandon; generator finally sets stop
    deadline = _time.time() + 5
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before + 1  # producer exited


def test_loader_transfer_dtype_bf16():
    """transfer_dtype='bfloat16' ships device batches as bf16 (half the H2D
    bytes); labels stay int32."""
    import jax.numpy as jnp
    from cross_attention_vit_tpu.data.loader import PrefetchLoader

    class Tiny:
        def __len__(self):
            return 4

        def batch(self, idx):
            return (np.full((len(idx), 1, 1, 4, 4, 4), 3.14159, np.float32),
                    np.zeros((len(idx),), np.int32))

    loader = PrefetchLoader(Tiny(), batch_size=2, transfer_dtype="bfloat16")
    batches = list(loader(range(4)))
    assert len(batches) == 2
    imgs, labels = batches[0]
    assert imgs.dtype == jnp.bfloat16
    assert labels.dtype == jnp.int32
    # values are the bf16 rounding of the host f32 values
    import ml_dtypes

    expected = np.float32(3.14159).astype(ml_dtypes.bfloat16)
    assert np.asarray(imgs.astype(jnp.float32)).flat[0] == np.float32(expected)


def test_bf16_transfer_parity():
    """With bf16 compute, bf16-transferred inputs give BIT-IDENTICAL logits
    to f32-transferred inputs: the first matmul casts to bf16 either way and
    promote_input keeps every downstream dtype (f32 accumulation) the same."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from cross_attention_vit_tpu.configs import get_mgmt_cross_config
    from cross_attention_vit_tpu.models import model_cross

    cfg = get_mgmt_cross_config()
    modify_config(cfg, {"num_modalities": 2, "img_size": (32, 32, 16),
                        "hidden_dim": 64, "mlp_dim": 128, "num_heads": 4,
                        "patch_size": (8, 8, 8), "attn_order": {"0": "1"},
                        "dropout": 0.1, "label_smoothing": 0.0})
    cfg.compute_dtype = "bfloat16"
    params = model_cross.init(jax.random.key(0), cfg)
    img = np.random.RandomState(0).randn(2, 2, 1, 32, 32, 16).astype(np.float32) * 100
    fwd = jax.jit(lambda p, x: model_cross.apply(p, cfg, x, train=False))
    a = np.asarray(fwd(params, jnp.asarray(img)))
    b = np.asarray(fwd(params, jnp.asarray(img.astype(ml_dtypes.bfloat16))))
    np.testing.assert_array_equal(a, b)
