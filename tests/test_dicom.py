"""DICOM reader + RSNA dataset tests on synthetic part-10 fixtures."""

import numpy as np
import pandas as pd
import pytest

from cross_attention_vit_tpu.data.dicom import (DicomImage, apply_voi_lut,
                                                read_dicom, write_dicom)
from cross_attention_vit_tpu.data.dataset_rsna import (RSNADataset, crop_img,
                                                       cropped_area, natural_sort)


def test_dicom_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    px = rng.integers(0, 4000, size=(32, 24)).astype(np.uint16)
    p = tmp_path / "a.dcm"
    write_dicom(p, px, instance_number=7)
    d = read_dicom(p)
    assert (d.rows, d.cols) == (32, 24)
    assert d.instance_number == 7
    np.testing.assert_array_equal(d.pixel_array, px)


def test_dicom_signed_and_magic(tmp_path):
    px = (np.arange(64, dtype=np.int16) - 32).reshape(8, 8)
    p = tmp_path / "s.dcm"
    write_dicom(p, px)
    d = read_dicom(p)
    assert d.pixel_representation == 1
    np.testing.assert_array_equal(d.pixel_array, px)
    bad = tmp_path / "bad.dcm"
    bad.write_bytes(b"\x00" * 200)
    with pytest.raises(ValueError, match="DICM"):
        read_dicom(bad)


def test_voi_lut_linear_windowing():
    """DICOM C.11.2.1.2.1 linear function: check the three regimes."""
    img = DicomImage(rows=1, cols=5, bits_allocated=16, pixel_representation=0,
                     window_center=100.0, window_width=50.0)
    x = np.array([0, 80, 100, 120, 4000], dtype=np.uint16)
    y = apply_voi_lut(x, img)
    assert y[0] == 0.0                  # below window → y_min
    assert y[4] == 65535.0              # above window → y_max
    mid = ((100 - 99.5) / 49 + 0.5) * 65535
    assert y[2] == pytest.approx(mid)
    assert y[1] < y[2] < y[3]
    # no window → identity
    img2 = DicomImage(rows=1, cols=5)
    np.testing.assert_array_equal(apply_voi_lut(x, img2), x)


def test_natural_sort():
    from pathlib import Path
    names = [Path(f"Image-{i}.dcm") for i in [10, 2, 1, 30, 9]]
    assert [p.name for p in natural_sort(names)] == \
        ["Image-1.dcm", "Image-2.dcm", "Image-9.dcm", "Image-10.dcm",
         "Image-30.dcm"]


def test_crop_img_bbox():
    img = np.zeros((10, 12), np.float32)
    img[3:7, 4:9] = 5.0
    c = crop_img(img)
    assert c.shape == (4, 5)
    assert cropped_area(img) == 20
    # all-zero image returned unchanged
    z = np.zeros((4, 4), np.float32)
    assert crop_img(z).shape == (4, 4)


def _make_case(tmp_path, case_id, n_slices=9, peak=5, mri_type="FLAIR"):
    """Synthetic series: centered blob whose radius peaks at slice `peak`."""
    d = tmp_path / case_id / mri_type
    d.mkdir(parents=True)
    for i in range(n_slices):
        px = np.zeros((40, 40), np.uint16)
        r = max(2.0, 4 + 10 * (1 - abs(i - peak) / n_slices))
        yy, xx = np.mgrid[:40, :40]
        px[(yy - 20) ** 2 + (xx - 20) ** 2 < r ** 2] = 1000 + 10 * i
        write_dicom(d / f"Image-{i}.dcm", px, window_center=500,
                    window_width=1200, instance_number=i)


def test_rsna_dataset_end_to_end(tmp_path):
    _make_case(tmp_path, "00001", n_slices=9, peak=5)
    _make_case(tmp_path, "00002", n_slices=9, peak=2)
    df = pd.DataFrame({"ID": ["00001", "00002"], "MGMT_value": [1, 0]})
    ds = RSNADataset(df, mri_type="FLAIR", folder=tmp_path, num_imgs=4, size=64)

    biggest = ds.prepare_biggest_images()
    assert biggest == {"00001": 5, "00002": 2}
    assert ds.cache_path.exists()  # cached to JSON

    vol, label = ds[0]
    assert vol.shape == (1, 1, 64, 64, 4)  # (M, C, D, H, W), slices as W
    assert label == 1
    assert 0.0 <= vol.min() and vol.max() <= 1.0
    assert vol.max() == pytest.approx(1.0)  # per-slice normalization hits 1

    imgs, labels = ds.batch([0, 1])
    assert imgs.shape == (2, 1, 1, 64, 64, 4)
    np.testing.assert_array_equal(labels, [1, 0])

    # cache reuse: a fresh instance reads the JSON without rescanning
    ds2 = RSNADataset(df, mri_type="FLAIR", folder=tmp_path, num_imgs=4, size=64)
    assert ds2.prepare_biggest_images() == biggest


def test_rsna_depth_padding(tmp_path):
    _make_case(tmp_path, "00003", n_slices=3, peak=1)
    df = pd.DataFrame({"ID": ["00003"], "MGMT_value": [0]})
    ds = RSNADataset(df, folder=tmp_path, num_imgs=8, size=32)
    vol, _ = ds[0]
    assert vol.shape == (1, 1, 32, 32, 8)
    assert (vol[0, 0, :, :, 3:] == 0).all()  # zero-padded tail


def test_rsna_missing_case_raises(tmp_path):
    df = pd.DataFrame({"ID": ["99999"], "MGMT_value": [0]})
    ds = RSNADataset(df, folder=tmp_path)
    with pytest.raises(FileNotFoundError):
        ds[0]


def test_rsna_multi_type_stacking_and_filter(tmp_path):
    """Multi-type mode: per-case (M, 1, size, size, num_imgs) stacking and
    the availability filter (reference dataset.py:84-100, 163-190)."""
    _make_case(tmp_path, "00001", peak=5, mri_type="FLAIR")
    _make_case(tmp_path, "00001", peak=3, mri_type="T1w")
    _make_case(tmp_path, "00002", peak=2, mri_type="FLAIR")  # T1w missing
    df = pd.DataFrame({"ID": ["00001", "00002"], "MGMT_value": [1, 0]})
    ds = RSNADataset(df, mri_types=("FLAIR", "T1w"), folder=tmp_path,
                     num_imgs=4, size=64)
    # 00002 dropped up front: missing T1w dir (reference clean_data semantics)
    assert len(ds) == 1
    vol, label = ds[0]
    assert vol.shape == (2, 1, 64, 64, 4)
    assert label == 1

    # each stream bit-matches the single-type dataset's volume for its type
    for m, t in enumerate(("FLAIR", "T1w")):
        ds_t = RSNADataset(df, mri_type=t, folder=tmp_path, num_imgs=4,
                           size=64, filter_missing=False)
        v_t, _ = ds_t[0]
        np.testing.assert_array_equal(vol[m:m + 1], v_t)

    # per-type biggest-slice caches, single-type format each
    import json
    assert json.loads((tmp_path / "biggest_FLAIR.json").read_text())["00001"] == 5
    assert json.loads((tmp_path / "biggest_T1w.json").read_text())["00001"] == 3

    imgs, labels = ds.batch([0])
    assert imgs.shape == (1, 2, 1, 64, 64, 4)


def test_rsna_rotate_indexing(tmp_path):
    """rotate indexes the reference's rot_choices (dataset.py:204-212):
    1 = 90° CW, 2 = 90° CCW, 3 = 180°, 0 = none."""
    from cross_attention_vit_tpu.data.dataset_rsna import _rotate

    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(_rotate(img, 0), img)
    np.testing.assert_array_equal(_rotate(img, 1), np.rot90(img, -1))
    np.testing.assert_array_equal(_rotate(img, 2), np.rot90(img, 1))
    np.testing.assert_array_equal(_rotate(img, 3), np.rot90(img, 2))
    try:  # spell-check the np.rot90 mapping against the cv2 constants
        import cv2
        for idx, const in [(1, cv2.ROTATE_90_CLOCKWISE),
                           (2, cv2.ROTATE_90_COUNTERCLOCKWISE),
                           (3, cv2.ROTATE_180)]:
            np.testing.assert_array_equal(_rotate(img, idx),
                                          cv2.rotate(img, const))
    except ImportError:
        pass

    # end-to-end: rotating an asymmetric slice changes the volume; a 180°
    # rotation of a square slice commutes with resize+normalize
    case = tmp_path / "00009" / "FLAIR"
    case.mkdir(parents=True)
    px = np.zeros((40, 40), np.uint16)
    px[5:15, 20:35] = 900  # off-center block
    write_dicom(case / "Image-0.dcm", px, window_center=500, window_width=1200)
    df = pd.DataFrame({"ID": ["00009"], "MGMT_value": [0]})
    v0 = RSNADataset(df, folder=tmp_path, num_imgs=2, size=40, rotate=0)[0][0]
    v3 = RSNADataset(df, folder=tmp_path, num_imgs=2, size=40, rotate=3)[0][0]
    assert not np.array_equal(v0, v3)
    np.testing.assert_allclose(v3[0, :, :, 0], np.rot90(v0[0, :, :, 0], 2),
                               atol=1e-6)


def test_rsna_shared_cache_merge(tmp_path):
    """Two dataset instances over disjoint splits share one cache file: the
    second append must merge with (not clobber) the first's entries on disk
    (round-2 advisor finding: per-instance locks allowed lost updates)."""
    import json
    _make_case(tmp_path, "00001", peak=5)
    _make_case(tmp_path, "00002", peak=2)
    _make_case(tmp_path, "00003", peak=7)
    df1 = pd.DataFrame({"ID": ["00001"], "MGMT_value": [1]})
    df2 = pd.DataFrame({"ID": ["00002"], "MGMT_value": [0]})
    ds1 = RSNADataset(df1, folder=tmp_path, num_imgs=4, size=32)
    ds2 = RSNADataset(df2, folder=tmp_path, num_imgs=4, size=32)
    ds1.prepare_biggest_images()        # disk: {00001}
    ds2.prepare_biggest_images()        # ds2 view: {00001}
    ds1._biggest_for("00003", "FLAIR")  # disk: {00001, 00003}; ds2 unaware
    ds2._biggest_for("00002", "FLAIR")  # must merge, not clobber 00003
    on_disk = json.loads((tmp_path / "biggest_FLAIR.json").read_text())
    assert on_disk == {"00001": 5, "00002": 2, "00003": 7}
