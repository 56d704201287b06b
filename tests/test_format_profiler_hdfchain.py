"""
Formatting utilities, profiling decorators, and HDF file chaining
(cf. reference ``pisa/utils/format.py`` embedded tests
``test_hr_range_formatter/test_list2hrlist/test_format_num/test_timediff``,
``pisa/utils/profiler.py:85,135``, and ``pisa/utils/hdfchain.py``).
"""

import logging as _pylogging

import numpy as np
import pytest

from pisa_tpu.utils.format import (
    engfmt,
    format_num,
    format_times,
    hr_range_formatter,
    hrbool2bool,
    hrlist2list,
    hrlol2lol,
    is_tex,
    list2hrlist,
    make_valid_python_name,
    sep_three_tens,
    split,
    strip_outer_dollars,
    tex_dollars,
    tex_join,
    text2tex,
    timediff,
    timestamp,
)


class TestHrLists:
    def test_range_formatter(self):
        assert hr_range_formatter(0, 10, 1) == "0-10"
        assert hr_range_formatter(0, 10, 2) == "0-10:2"
        assert hr_range_formatter(0.1, 3.1, 1.0) == "0.1-3.1:1"

    def test_list2hrlist(self):
        assert list2hrlist([0, 1]) == "0,1"
        assert list2hrlist([0, 3]) == "0,3"
        assert list2hrlist([0, 1, 2]) == "0-2"
        assert list2hrlist([0, 1, 2, 4, 5, 6, 20]) == "0-2,4-6,20"
        assert list2hrlist([0.1, 1.1, 2.1, 3.1]) == "0.1-3.1:1"

    def test_hrlist2list_roundtrip(self):
        assert hrlist2list("0-2,4-6,20") == [0, 1, 2, 4, 5, 6, 20]
        assert hrlist2list("0-10:2") == [0, 2, 4, 6, 8, 10]
        np.testing.assert_allclose(
            hrlist2list("0.1-3.1:1"), [0.1, 1.1, 2.1, 3.1]
        )
        for lst in ([0, 1, 2], [0, 1, 2, 4, 5, 6, 20], [3], [1, 7]):
            assert hrlist2list(list2hrlist(lst)) == lst

    def test_hrlol2lol(self):
        assert hrlol2lol("0-2;5,7") == [[0, 1, 2], [5, 7]]

    def test_hrbool2bool(self):
        assert hrbool2bool("True") and hrbool2bool("1") and hrbool2bool("yes")
        assert not (hrbool2bool("F") or hrbool2bool("0") or hrbool2bool("no"))
        with pytest.raises(ValueError):
            hrbool2bool("maybe")

    def test_split(self):
        assert split("a, b ,c") == ["a", "b", "c"]
        assert split("A,B", force_case="lower") == ["a", "b"]
        assert split("1,2", parse_func=int) == [1, 2]


class TestFormatNum:
    def test_basic_sigfigs(self):
        assert format_num(3.14159, sigfigs=3) == "3.14"
        assert format_num(0.0, sigfigs=3) == "0"

    def test_precision(self):
        assert format_num(1234.5678, precision=0.01) == "1234.57"
        assert format_num(1234.5678, precision=1) == "1235"

    def test_sci_thresh(self):
        # default thresholds (6, -4): million switches to sci
        assert "e6" in format_num(2.5e6, sigfigs=2)
        assert "e-5" in format_num(2.5e-5, sigfigs=2)
        assert format_num(250.0, sigfigs=3) == "250"

    def test_fmt_modes(self):
        assert format_num(1.2e7, sigfigs=2, fmt="eng") == "12e6"
        assert format_num(1.2e7, sigfigs=2, fmt="sipre") == "12 M"
        assert format_num(2048.0, sigfigs=2, fmt="binpre") == "2 Ki"
        assert format_num(1.2e7, sigfigs=3, fmt="full") == "12000000"

    def test_engfmt(self):
        assert engfmt(1.2e-7, sigfigs=2) == "120 n"

    def test_nan_inf(self):
        assert format_num(float("nan")) == "nan"
        assert format_num(float("inf")) == "inf"
        assert format_num(-float("inf")) == "-inf"
        assert format_num(1e10, inf_thresh=1e9) == "inf"

    def test_separators_and_sign(self):
        assert (
            format_num(1234567.0, sigfigs=7, fmt="full", thousands_sep=",")
            == "1,234,567"
        )
        assert format_num(5.0, always_show_sign=True) == "+5"

    def test_trailing_zeros(self):
        assert format_num(1.5, sigfigs=4, trailing_zeros=True) == "1.500"

    def test_sep_three_tens(self):
        assert sep_three_tens("1234567", "left", ",") == "1,234,567"
        assert sep_three_tens("123456", "right", " ") == "123 456"


class TestTexHelpers:
    def test_text2tex_escapes(self):
        assert r"\_" in text2tex("delta_index")

    def test_is_tex(self):
        assert is_tex(r"$\theta_{23}$")
        assert not is_tex("plain words")

    def test_tex_dollars_and_strip(self):
        assert tex_dollars(r"\theta") == r"$\theta$"
        assert tex_dollars(r"$\theta$") == r"$\theta$"
        assert strip_outer_dollars("$x$") == "x"

    def test_tex_join_skips_empty(self):
        joined = tex_join(",", "a", None, "b")
        assert "a" in joined and "b" in joined

    def test_make_valid_python_name(self):
        name = make_valid_python_name("2-theta 23!")
        assert name.isidentifier() and name == "_theta_23_"


class TestTimes:
    def test_format_times(self):
        s = format_times([1.0, 2.0, 3.0])
        assert "n calls: 3" in s and "mean" in s
        assert format_times([]) == "n calls: 0"
        assert "Individual runs" in format_times([1.0, 2.0], detailed=True)

    def test_timediff(self):
        assert timediff(5.25) == "5.250 s"
        assert timediff(3661.0) == "01:01:01.000"
        assert timediff(90061.0).startswith("1 days, 01:01")
        assert timediff(-5.0).startswith("-")

    def test_timestamp_shape(self):
        ts = timestamp(utc=True)
        assert "T" in ts and ts.endswith("+00:00")
        assert ":" not in timestamp(d=False, t=True, tz=False, winsafe=True)


@pytest.fixture
def tprofile_records():
    """Capture tprofile records directly (the pisa_tpu loggers do not
    propagate to root, so pytest's caplog never sees them)."""
    from pisa_tpu.utils.log import tprofile

    records = []

    class _Collect(_pylogging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = _Collect(level=_pylogging.DEBUG)
    old_level = tprofile.level
    tprofile.addHandler(handler)
    tprofile.setLevel(_pylogging.DEBUG)
    yield records
    tprofile.removeHandler(handler)
    tprofile.setLevel(old_level)


class TestProfiler:
    def test_profile_logs_and_returns(self, tprofile_records):
        from pisa_tpu.utils.profiler import profile

        @profile
        def f(x):
            return x * 2

        assert f(21) == 42
        assert any("f" in msg and " s" in msg for msg in tprofile_records)

    def test_line_profile_accumulates(self, tprofile_records):
        from pisa_tpu.utils.profiler import line_profile

        @line_profile
        def g(n):
            total = 0
            for i in range(n):
                total += i
            return total

        assert g(100) == 4950
        text = "\n".join(tprofile_records)
        assert "line profile" in text and "total +=" in text


class TestHDFChain:
    @pytest.fixture
    def chain_files(self, tmp_path):
        import h5py

        dt = np.dtype([("energy", "f8"), ("coszen", "f8")])
        names = []
        for i in range(3):
            fname = str(tmp_path / f"part{i}.h5")
            with h5py.File(fname, "w") as f:
                arr = np.zeros(10 * (i + 1), dtype=dt)
                arr["energy"] = np.arange(10 * (i + 1)) + 100 * i
                f.create_dataset("events", data=arr)
                grp = f.create_group("deep")
                grp.create_dataset("nested", data=np.arange(4.0))
            names.append(fname)
        return names

    def test_concatenates_across_files(self, chain_files):
        from pisa_tpu.utils.hdfchain import HDFChain

        chain = HDFChain(chain_files)
        tab = chain.root.events
        assert len(tab) == 60
        data = tab.read()
        assert data.shape == (60,)
        # order preserved: file 0 rows first
        assert data["energy"][0] == 0 and data["energy"][10] == 100
        col = tab.col("energy")
        np.testing.assert_array_equal(col, data["energy"])
        chain.close()

    def test_glob_and_getnode(self, chain_files, tmp_path):
        from pisa_tpu.utils.hdfchain import HDFChain

        chain = HDFChain(str(tmp_path / "part*.h5"))
        assert len(chain.getNode("/events")) == 60
        # maxdepth=1 excludes /deep/nested
        assert "/deep/nested" not in chain.pathes
        chain.close()

    def test_maxdepth_2_includes_nested(self, chain_files):
        from pisa_tpu.utils.hdfchain import HDFChain

        chain = HDFChain(chain_files, maxdepth=2)
        assert len(chain.getNode("/deep/nested")) == 12
        chain.close()

    def test_empty_list_raises(self):
        from pisa_tpu.utils.hdfchain import HDFChain

        with pytest.raises(ValueError):
            HDFChain([])
