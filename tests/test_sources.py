"""Source-format tests: html-dir, JSONL, CSV all feed the same pipeline."""

import json
import os

import pytest


@pytest.fixture()
def html_dir(tmp_path):
    d = tmp_path / "site"
    d.mkdir()
    (d / "a.html").write_text(
        "<article><p>first page content paragraph long enough</p></article>")
    (d / "b.htm").write_text(
        "<nav><a href='/'>Home</a></nav><p>second page body text here ok</p>")
    (d / "notes.txt").write_text("not html, must be ignored")
    return str(d)


def test_read_html_dir_feeds_pipeline(ray_session, html_dir):
    from bb_ocr_ray.pipelines.extract_pipeline import extract_pages
    from bb_ocr_ray.sources.files import read_html_dir

    out = extract_pages(read_html_dir(html_dir)).to_pandas()
    assert len(out) == 2                      # .txt filtered out
    by_url = out.set_index("url")
    a = by_url[by_url.index.str.endswith("a.html")].iloc[0]
    assert a["text"] == "first page content paragraph long enough"
    b = by_url[by_url.index.str.endswith("b.htm")].iloc[0]
    assert b["text"] == "second page body text here ok"
    assert "Home" not in b["text"]            # boilerplate still dropped


def test_read_pages_json_roundtrip(ray_session, tmp_path):
    from bb_ocr_ray.pipelines.extract_pipeline import extract_pages
    from bb_ocr_ray.sources.files import read_pages_json

    p = tmp_path / "pages.jsonl"
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps({
                "url": f"https://j.example.com/{i}",
                "warc_ts": "2024-01-01T00:00:00",
                "html": f"<p>json sourced page number {i} with enough text</p>",
                "text": "", "lang": "en",
            }) + "\n")
    out = extract_pages(read_pages_json(str(p))).to_pandas()
    assert len(out) == 3
    assert sorted(out["text"])[0] == "json sourced page number 0 with enough text"


def test_read_pages_csv_roundtrip(ray_session, tmp_path):
    import pandas as pd

    from bb_ocr_ray.pipelines.extract_pipeline import extract_pages
    from bb_ocr_ray.sources.files import read_pages_csv

    p = tmp_path / "pages.csv"
    pd.DataFrame({
        "url": [f"https://c.example.com/{i}" for i in range(2)],
        "warc_ts": ["2024-01-01"] * 2,
        "html": [f"<p>csv sourced page {i} content is long enough</p>"
                 for i in range(2)],
    }).to_csv(p, index=False)
    out = extract_pages(read_pages_csv(str(p))).to_pandas()
    assert len(out) == 2
    assert all(out["status"] == "ok")
    assert out["text"].str.startswith("csv sourced page").all()


def test_normalize_pages_null_fields(ray_session, tmp_path):
    """Review regression: null text/lang/html must become ''/b'', never
    the string 'None' or a NaN payload."""
    import json

    from bb_ocr_ray.sources.files import read_pages_json

    p = tmp_path / "nulls.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"url": "https://n.com/1", "html": None,
                            "text": None, "lang": None}) + "\n")
        f.write(json.dumps({"url": "https://n.com/2",
                            "html": "<p>real content here long enough</p>",
                            "text": None, "lang": "en"}) + "\n")
    rows = read_pages_json(str(p)).to_pandas().sort_values("url")
    assert rows["text"].tolist() == ["", ""]
    assert rows["lang"].tolist() == ["", "en"]
    assert rows["html"].iloc[0] == b""
