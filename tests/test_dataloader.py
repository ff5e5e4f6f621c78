"""Native data loader tests (C++ mmap + prefetch thread, ctypes-bound —
the host-feeding analog of example mains' get_binary_from_file)."""

import numpy as np
import pytest

from csinn2_tpu.runtime.dataloader import DataLoader, write_archive


@pytest.fixture
def archive(tmp_path, rng):
    data = rng.standard_normal((10, 4, 3)).astype(np.float32)
    path = str(tmp_path / "samples.f32")
    write_archive(path, data)
    return path, data


def test_batches_roundtrip(archive):
    path, data = archive
    with DataLoader(path, sample_shape=(4, 3), batch=4) as dl:
        assert dl.n_samples == 10
        batches = list(dl)
    assert [b.shape[0] for b in batches] == [4, 4, 2]   # tail batch short
    np.testing.assert_allclose(np.concatenate(batches), data)


def test_loop_mode_wraps(archive):
    path, data = archive
    with DataLoader(path, sample_shape=(4, 3), batch=8, loop=True) as dl:
        b1 = dl.next()
        b2 = dl.next()
        b3 = dl.next()
    assert b1.shape == b2.shape == b3.shape == (8, 4, 3)
    seq = np.concatenate([b1, b2, b3]).reshape(24, -1)
    want = np.concatenate([data] * 3).reshape(30, -1)[:24]
    np.testing.assert_allclose(seq, want)


def test_bad_size_rejected(tmp_path):
    path = str(tmp_path / "bad.f32")
    np.zeros(7, np.float32).tofile(path)    # not a multiple of sample size
    with pytest.raises(OSError):
        DataLoader(path, sample_shape=(4, 3), batch=2)


def test_prefetch_overlap(archive, tmp_path, rng):
    """Batches keep arriving while the consumer is slow (queue bounded)."""
    import time
    data = rng.standard_normal((64, 16)).astype(np.float32)
    path = str(tmp_path / "big.f32")
    write_archive(path, data)
    with DataLoader(path, sample_shape=(16,), batch=8,
                    prefetch_depth=2) as dl:
        out = []
        for b in dl:
            time.sleep(0.005)     # slow consumer; producer stays ahead
            out.append(b)
    np.testing.assert_allclose(np.concatenate(out), data)
