"""CLI surface tests (G3/G5 parity)."""

import json

import pytest

from mdscraper_spark.jobs.extract import create_cli_parser, load_settings_file


def test_parser_mutually_exclusive_source():
    p = create_cli_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["--warehouse", "w"])  # no source
    with pytest.raises(SystemExit):
        p.parse_args(["--input", "a", "--synthesize", "5", "--warehouse", "w"])


def test_parser_full_flag_surface():
    p = create_cli_parser()
    a = p.parse_args([
        "--synthesize", "10", "--warehouse", "w",
        "--content", "zone-a", "zone-b", "--no-images", "--no-links",
        "--prepend-source-link", "--root-url", "https://x/docs",
        "--exclude-pages", "skip*", "--exclude-selectors", ".ads", "#nav",
        "--extra-heading-space", "2,3", "--resume", "--n-buckets", "64",
        "--salt", "8", "--run-id", "r9",
    ])
    assert a.synthesize == 10 and a.content == ["zone-a", "zone-b"]
    assert a.exclude_selectors == [".ads", "#nav"] and a.salt == 8


def test_settings_yaml_and_json(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text("no_images: true\nextra_heading_space: 'all'\n")
    assert load_settings_file(str(y)) == {"no_images": True,
                                          "extra_heading_space": "all"}
    j = tmp_path / "cfg.json"
    j.write_text(json.dumps({"no_links": True}))
    assert load_settings_file(str(j)) == {"no_links": True}
    bad = tmp_path / "bad.yaml"
    bad.write_text("- just\n- a list\n")
    with pytest.raises(ValueError):
        load_settings_file(str(bad))


def test_save_settings(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mdscraper_spark.jobs.extract import main
    main(["--synthesize", "1", "--warehouse", "w", "--no-images",
          "--save-settings"])
    files = list(tmp_path.glob("mdscraper_spark_*.json"))
    assert len(files) == 1
    cfg = json.loads(files[0].read_text())
    assert cfg["no_images"] is True
