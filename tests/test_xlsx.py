"""Dependency-free XLSX sink (sits_to_xlsx analog): structural validity
+ typed round-trip."""

import zipfile

import numpy as np
import pandas as pd

from sits_ray.xlsx import read_xlsx, write_xlsx


def test_xlsx_round_trip_types(tmp_path):
    cm = pd.DataFrame(
        {"label": ["crop", "forest"], "crop": [10, 2], "forest": [1, 30],
         "ua": [10 / 11, 30 / 32], "flag": [True, False]}
    )
    s2 = pd.DataFrame({"metric": ["kappa"], "value": [0.8125],
                       "note": ["<xml> & \"quotes\" preserved"]})
    p = write_xlsx({"confusion": cm, "summary": s2}, str(tmp_path / "a.xlsx"))
    z = zipfile.ZipFile(p)
    assert z.testzip() is None
    assert {"[Content_Types].xml", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"} <= set(
        z.namelist()
    )
    back = read_xlsx(p)
    assert list(back) == ["confusion", "summary"]
    b = back["confusion"]
    assert b["label"].tolist() == ["crop", "forest"]
    assert b["crop"].tolist() == [10, 2]
    # repr() round-trips doubles exactly
    assert b["ua"].tolist() == [10 / 11, 30 / 32]
    assert b["flag"].tolist() == [True, False]
    assert back["summary"]["note"].iloc[0] == "<xml> & \"quotes\" preserved"


def test_xlsx_sheet_name_rules_and_nan(tmp_path):
    df = pd.DataFrame({"x": [1.5, np.nan]})
    p = write_xlsx(
        {"a/b:c[d]*?": df, "a_b_c_d__": df,
         "this sheet name is far longer than thirty-one characters": df},
        str(tmp_path / "b.xlsx"),
    )
    back = read_xlsx(p)
    assert len(back) == 3
    for name in back:
        assert len(name) <= 31
        assert not set(name) & set(':\\/?*[]')
    first = back[list(back)[0]]
    assert first["x"].iloc[0] == 1.5
    v = first["x"].iloc[1]
    assert v is None or (isinstance(v, float) and np.isnan(v))


def test_api_verb(tmp_path):
    from sits_ray.api import sits_to_xlsx

    p = sits_to_xlsx(pd.DataFrame({"a": [1]}), str(tmp_path / "c.xlsx"))
    assert read_xlsx(p)["Sheet1"]["a"].tolist() == [1]
