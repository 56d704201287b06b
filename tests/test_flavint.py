"""
flavInt taxonomy tests (port semantics of reference ``flavInt.py``
test_NuFlav/test_NuFlavInt/test_NuFlavIntGroup/test_FlavIntData).
"""

import pytest

from pisa_tpu.utils.flavint import (
    ALL_NUFLAVINTS,
    FlavIntData,
    IntType,
    NuFlav,
    NuFlavInt,
    NuFlavIntGroup,
    flavint_groups_from_string,
)


def test_nuflav():
    assert NuFlav("numu").code == 14
    assert NuFlav("numubar").code == -14
    assert NuFlav("NuMu Bar").code == -14
    assert NuFlav(-12).name == "nuebar"
    assert NuFlav("nue").bar() == "nuebar"
    assert NuFlav("nutau").flav_index == 2
    assert NuFlav("numu") == NuFlav(14)
    with pytest.raises(ValueError):
        NuFlav("nux")


def test_inttype():
    assert IntType("CC").code == 1
    assert IntType(2).name == "nc"
    assert IntType("cc") == 1 or IntType("cc") == "cc"


def test_nuflavint():
    fi = NuFlavInt("numubar_cc")
    assert fi.flav == "numubar" and fi.int_type == "cc"
    assert fi.cc and not fi.nc
    assert NuFlavInt("numu", "nc").name == "numu_nc"
    assert NuFlavInt("NuMu Bar CC") == fi
    assert str(NuFlavInt(("nue", "nc"))) == "nue_nc"


def test_group_parsing_and_algebra():
    g = NuFlavIntGroup("numu_cc + numubar_cc")
    assert len(g) == 2
    assert "numu_cc" in g
    assert "numu_nc" not in g
    assert str(g) == "numu_numubar_cc"

    # bare flavor expands to both int types
    g2 = NuFlavIntGroup("nue")
    assert len(g2) == 2 and "nue_nc" in g2

    # nuall expansion
    all_nc = NuFlavIntGroup("nuall_nc + nuallbar_nc")
    assert len(all_nc) == 6
    assert all(fi.nc for fi in all_nc)

    # algebra
    g3 = g + "numu_nc"
    assert len(g3) == 3
    g4 = g3 - "numu_cc"
    assert "numu_cc" not in g4 and len(g4) == 2

    assert len(ALL_NUFLAVINTS) == 12


def test_groups_from_string():
    groups = flavint_groups_from_string("nuall_nc+nuallbar_nc; numu_cc+numubar_cc")
    assert len(groups) == 3  # nc group, numu cc group, leftovers
    total = sum(len(g) for g in groups)
    assert total == 12
    with pytest.raises(ValueError):
        flavint_groups_from_string("numu_cc; numu_cc+nue_cc")


def test_flavintdata():
    d = FlavIntData()
    assert len(d) == 12
    d["numu_cc"] = [1, 2, 3]
    assert d[NuFlavInt("numu", "cc")] == [1, 2, 3]
    assert d["NuMu CC"] == [1, 2, 3]
