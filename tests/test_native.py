"""Native C++ NIfTI decoder: bit-parity with the Python path."""

import os

import numpy as np
import pytest

from cross_attention_vit_tpu.data import native, nifti

UCSF = "/root/reference/ucsf-data"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no g++ / native build failed")


def test_native_parity_synthetic(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.integers(-500, 3000, size=(30, 17, 23)).astype(np.int16)
    for name, kwargs in [("a.nii.gz", dict(scl_slope=0.25, scl_inter=7.5)),
                         ("b.nii", dict()),
                         ("c.nii.gz", dict(scl_slope=0.0, scl_inter=9.0))]:
        p = tmp_path / name
        nifti.write_volume(p, vol, **kwargs)
        for target in [(24, 24, 16), (40, 10, 30)]:
            got = native.decode_crop(p, target, fill=-1.0)
            want = nifti.read_volume_cropped(p, target, fill=-1.0)
            np.testing.assert_array_equal(got, want), (name, target)


def test_native_other_dtypes(tmp_path):
    for dt in [np.uint8, np.float32, np.int32, np.float64, np.uint16]:
        vol = (np.random.default_rng(1).uniform(0, 100, size=(9, 8, 7))
               ).astype(dt)
        p = tmp_path / f"{np.dtype(dt).name}.nii.gz"
        nifti.write_volume(p, vol)
        got = native.decode_crop(p, (8, 8, 8), fill=0.0)
        want = nifti.read_volume_cropped(p, (8, 8, 8), fill=0.0)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not os.path.isdir(UCSF), reason="ucsf-data not mounted")
def test_native_parity_real_volumes():
    for mod in ["FLAIR", "ADC", "tumor_segmentation"]:
        p = nifti.volume_path(UCSF, "UCSF-PDGM-0085", mod)
        got = native.decode_crop(p, (128, 128, 64))
        want = nifti.read_volume_cropped(p, (128, 128, 64))
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not os.path.isdir(UCSF), reason="ucsf-data not mounted")
def test_native_batch():
    paths = [nifti.volume_path(UCSF, "UCSF-PDGM-0085", m)
             for m in ("DWI", "SWI", "ASL")]
    out = native.decode_crop_batch(paths, (128, 128, 64), num_threads=3)
    assert out.shape == (3, 128, 128, 64)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(out[i], native.decode_crop(p, (128, 128, 64)))


def test_native_errors(tmp_path):
    with pytest.raises(IOError, match="cannot read"):
        native.decode_crop(tmp_path / "missing.nii.gz", (8, 8, 8))
    bad = tmp_path / "garbage.nii"
    bad.write_bytes(b"\x01" * 400)
    with pytest.raises(IOError):
        native.decode_crop(bad, (8, 8, 8))
