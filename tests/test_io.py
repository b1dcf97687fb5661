"""Parity tests: scale_sample / gender_correct / npz round-trips."""

import numpy as np
import pytest

from synthetic import CohortSim
from wisecondorx_tpu.io import npz as io_npz


@pytest.fixture(scope="module")
def sim():
    return CohortSim(binsize=5e3, genome_scale=0.002, seed=7)


def test_scale_sample_matches_reference(ref_modules, sim):
    sample = sim.sample("M")
    ours = io_npz.scale_sample(dict(sample), 5000, 100000)
    theirs = ref_modules["overall_tools"].scale_sample(
        dict(sample), 5000, 100000
    )
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_array_equal(ours[k], theirs[k])
        assert ours[k].dtype == np.int32


def test_scale_sample_noop():
    s = {"1": np.arange(10, dtype=np.int32)}
    assert io_npz.scale_sample(s, 100, 100) is s
    assert io_npz.scale_sample(s, 100, None) is s


def test_scale_sample_invalid():
    s = {"1": np.arange(10, dtype=np.int32)}
    with pytest.raises(io_npz.BinScalingError):
        io_npz.scale_sample(s, 300, 500)
    with pytest.raises(io_npz.BinScalingError):
        io_npz.scale_sample(s, 500, 300)


def test_gender_correct_matches_reference(ref_modules, sim):
    sample = sim.sample("M")
    ours = io_npz.gender_correct(
        {k: v.copy() for k, v in sample.items()}, "M"
    )
    theirs = ref_modules["overall_tools"].gender_correct(
        {k: v.copy() for k, v in sample.items()}, "M"
    )
    for k in ours:
        np.testing.assert_array_equal(ours[k], theirs[k])
    # F samples untouched
    ours_f = io_npz.gender_correct(
        {k: v.copy() for k, v in sample.items()}, "F"
    )
    np.testing.assert_array_equal(ours_f["23"], sample["23"])


def test_sample_npz_roundtrip(tmp_path, sim):
    sample = sim.sample("F")
    path = tmp_path / "s.npz"
    io_npz.save_sample_npz(path, 5000, sample, {"mapped": 123})
    loaded, binsize, quality = io_npz.load_sample_npz(path)
    assert binsize == 5000
    assert quality == {"mapped": 123}
    for k in sample:
        np.testing.assert_array_equal(loaded[k], sample[k])


def test_savez_fast_compress_modes(tmp_path, monkeypatch):
    """WCX_NPZ_COMPRESS=always|never|auto all produce standard npz files
    that round-trip exactly; 'never' stores every member (seekable)."""
    import zipfile

    import numpy as np

    from wisecondorx_tpu.io.npz import _savez_fast

    rng = np.random.default_rng(3)
    arrays = {
        "big_random": rng.random((3000, 300)),       # poorly compressible
        "zeros": np.zeros(200000),                   # highly compressible
        "ints": rng.integers(0, 50, 100000),
        "scalar": 42,
    }
    for mode in ("auto", "always", "never"):
        monkeypatch.setenv("WCX_NPZ_COMPRESS", mode)
        path = str(tmp_path / f"m_{mode}.npz")
        _savez_fast(path, arrays)
        back = np.load(path, allow_pickle=True)
        for k, v in arrays.items():
            np.testing.assert_array_equal(back[k], np.asarray(v))
        with zipfile.ZipFile(path) as zf:
            methods = {i.filename: i.compress_type for i in zf.infolist()}
        if mode == "never":
            assert set(methods.values()) == {0}, methods
        if mode == "always":
            assert set(methods.values()) == {8}, methods


def test_verify_reference_npz_detects_corruption(tmp_path):
    """A flipped byte inside a member payload fails verification with a
    CRC error naming the member; a clean file passes."""
    import numpy as np
    import pytest

    from wisecondorx_tpu.io.npz import _savez_fast, verify_reference_npz

    path = str(tmp_path / "v.npz")
    rng = np.random.default_rng(1)
    _savez_fast(path, {"big": rng.random((2000, 300)), "small": np.arange(5)})
    verify_reference_npz(path, expected_keys=["big", "small"])

    with pytest.raises(ValueError, match="missing members"):
        verify_reference_npz(path, expected_keys=["big", "small", "ghost"])

    raw = bytearray(open(path, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(Exception, match="corrupt|CRC|Bad"):
        verify_reference_npz(path, expected_keys=["big", "small"])
