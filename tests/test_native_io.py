"""Native C++ NIfTI decoder vs the pure-Python reader."""

import numpy as np
import pytest

from multimodal_alzheimer_tpu.data import native_io
from multimodal_alzheimer_tpu.data.nifti import load_nifti, save_nifti


@pytest.fixture(scope="module")
def volumes(tmp_path_factory):
    d = tmp_path_factory.mktemp("vols")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, (compress, dtype) in enumerate(
            [(False, np.float32), (True, np.float32), (True, np.int16),
             (False, np.float64)]):
        if np.issubdtype(dtype, np.floating):
            vol = rng.normal(size=(9, 11, 7)).astype(dtype)
        else:
            vol = rng.integers(-50, 50, size=(9, 11, 7)).astype(dtype)
        p = d / (f"v{i}.nii.gz" if compress else f"v{i}.nii")
        save_nifti(p, vol)
        paths.append(str(p))
        arrays.append(vol.astype(np.float32))
    return paths, arrays


def test_native_builds():
    assert native_io.available(), "native toolchain should be present"


def test_shape(volumes):
    paths, arrays = volumes
    assert native_io.nifti_shape(paths[0]) == arrays[0].shape


def test_single_decode_matches_python(volumes):
    paths, arrays = volumes
    for p, a in zip(paths, arrays):
        got = native_io.decode(p)
        np.testing.assert_allclose(got, a, rtol=1e-6)
        np.testing.assert_allclose(got, load_nifti(p), rtol=1e-6)


def test_batch_decode(volumes):
    paths, arrays = volumes
    batch = native_io.decode_batch(paths, arrays[0].shape, num_threads=4)
    assert batch.shape == (len(paths),) + arrays[0].shape
    for i, a in enumerate(arrays):
        np.testing.assert_allclose(batch[i], a, rtol=1e-6)


def test_batch_decode_bad_path(volumes):
    paths, arrays = volumes
    with pytest.raises(IOError):
        native_io.decode_batch([paths[0], "/nonexistent.nii"],
                               arrays[0].shape)
