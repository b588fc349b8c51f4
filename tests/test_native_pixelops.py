"""Native C++ pixelops: build, numerical parity with the numpy/PIL reference
paths, and the fused batch-collate contract.

The module is an optimization with mandatory fallbacks — tests cover both the
native path (skipped when no C++ toolchain) and the fallback path.
"""

import shutil

import numpy as np
import pytest

from neurosis_tpu import native

HAS_CXX = shutil.which("g++") is not None or shutil.which("c++") is not None


@pytest.fixture(scope="module")
def lib_available():
    if not HAS_CXX:
        pytest.skip("no C++ toolchain")
    if not native.available():
        pytest.skip("native build failed on this host")
    return True


def test_u8_to_f32_norm_matches_numpy(lib_available):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (37, 53, 3), np.uint8)
    got = native.u8_to_f32_norm(arr)
    want = arr.astype(np.float32) * (2.0 / 255.0) - 1.0
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6


def test_crop_norm_into_batch_slot(lib_available):
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 256, (64 + i, 80 + i, 3), np.uint8) for i in range(4)]
    batch = np.empty((4, 32, 48, 3), np.float32)
    for i, im in enumerate(imgs):
        native.crop_norm_into(im, top=5 + i, left=7, oh=32, ow=48, out=batch[i])
    for i, im in enumerate(imgs):
        want = im[5 + i : 37 + i, 7:55].astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(batch[i], want, atol=1e-6)


def test_crop_norm_bounds_checked():
    arr = np.zeros((16, 16, 3), np.uint8)
    out = np.empty((8, 8, 3), np.float32)
    with pytest.raises(AssertionError):
        native.crop_norm_into(arr, top=10, left=0, oh=8, ow=8, out=out)


@pytest.mark.parametrize("shape,target", [((64, 96), (32, 48)), ((50, 70), (32, 48)), ((31, 45), (64, 64))])
def test_resize_bilinear_matches_pil(lib_available, shape, target):
    from PIL import Image

    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, (*shape, 3), np.uint8)
    got = native.resize_bilinear(arr, *target)
    want = np.asarray(Image.fromarray(arr).resize((target[1], target[0]), Image.BILINEAR))
    assert got.shape == want.shape
    # PIL runs the same triangle filter in 8.8 fixed point; allow rounding skew
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 2, f"max diff {diff.max()}"
    assert (diff > 1).mean() < 0.01


def test_fallbacks_without_native(monkeypatch):
    """With the native lib disabled the wrappers produce identical semantics."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (20, 24, 3), np.uint8)
    got = native.u8_to_f32_norm(arr)
    np.testing.assert_allclose(got, arr.astype(np.float32) * (2.0 / 255.0) - 1.0, atol=1e-6)
    out = np.empty((8, 8, 3), np.float32)
    native.crop_norm_into(arr, 2, 3, 8, 8, out)
    np.testing.assert_allclose(out, arr[2:10, 3:11].astype(np.float32) * (2.0 / 255.0) - 1.0, atol=1e-6)
    r = native.resize_bilinear(arr, 10, 12)
    assert r.shape == (10, 12, 3) and r.dtype == np.uint8
