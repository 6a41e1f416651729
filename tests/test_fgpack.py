"""Native fgpack store: build, pack, mmap read-back, threaded batch reads."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pack_file(tmp_path_factory):
    from fgvc_tpu.data_io.fgpack import build_library, write_fgpack

    build_library()
    path = tmp_path_factory.mktemp("fgpack") / "test.fgpack"
    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        for _ in range(10)
    ]
    n = write_fgpack(str(path), frames)
    assert n == 10
    return str(path), frames


def test_roundtrip_single(pack_file):
    from fgvc_tpu.data_io.fgpack import FgPack

    path, frames = pack_file
    pack = FgPack(path)
    assert len(pack) == 10
    assert pack.record_shape(0) == (24, 32, 3)
    for i in (0, 3, 9):
        np.testing.assert_array_equal(pack[i], frames[i])
    pack.close()


def test_threaded_batch_read(pack_file):
    from fgvc_tpu.data_io.fgpack import FgPack

    path, frames = pack_file
    pack = FgPack(path)
    pack.prefetch(0, 10)
    idx = [7, 0, 5, 5, 2, 9]
    out = pack.read_batch(idx, n_threads=4)
    for got, i in zip(out, idx):
        np.testing.assert_array_equal(got, frames[i])
    pack.close()


def test_bad_file(tmp_path):
    from fgvc_tpu.data_io.fgpack import FgPack

    bad = tmp_path / "bad.fgpack"
    bad.write_bytes(b"NOPE" + b"\0" * 32)
    with pytest.raises(IOError):
        FgPack(str(bad))
