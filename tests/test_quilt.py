"""Native async writer (quilting equivalent)."""

import os
import time

import numpy as np
import pytest

from wrf_partmc_tpu.utils.quilt import QuiltWriter


def test_quilt_async_writes(tmp_path):
    w = QuiltWriter(n_threads=2)
    if not w.async_ok:
        pytest.skip("no g++ toolchain")
    payloads = {}
    for i in range(8):
        data = os.urandom(1 << 16)
        path = str(tmp_path / f"f{i}.bin")
        payloads[path] = data
        w.submit_bytes(path, data)
    errs = w.flush()
    assert errs == 0
    for path, data in payloads.items():
        with open(path, "rb") as f:
            assert f.read() == data


def test_quilt_npz_roundtrip(tmp_path):
    w = QuiltWriter()
    arr = np.arange(1000, dtype=np.float32)
    p = str(tmp_path / "x.npz")
    w.submit_npz(p, lambda buf: np.savez(buf, arr=arr))
    w.flush()
    np.testing.assert_array_equal(np.load(p)["arr"], arr)


def test_quilt_overlaps_compute(tmp_path):
    w = QuiltWriter(n_threads=2)
    if not w.async_ok:
        pytest.skip("no g++ toolchain")
    big = os.urandom(8 << 20)
    t0 = time.perf_counter()
    for i in range(4):
        w.submit_bytes(str(tmp_path / f"big{i}.bin"), big)
    submit_t = time.perf_counter() - t0
    w.flush()
    total_t = time.perf_counter() - t0
    # submission returns quickly relative to the full write
    assert submit_t < total_t
    assert os.path.getsize(str(tmp_path / "big3.bin")) == len(big)


def test_quilt_error_reporting(tmp_path):
    w = QuiltWriter()
    if not w.async_ok:
        pytest.skip("no g++ toolchain")
    w.submit_bytes(str(tmp_path / "nodir" / "x.bin"), b"abc")  # missing dir
    assert w.flush() >= 1
