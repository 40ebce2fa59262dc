"""The CLI: glob expansion, output naming, per-file error isolation
(≅ /root/reference/test/cli.test.js, driven in-process)."""

import os

import pytest

from mhtml_to_html_spark.__main__ import main
from mhtml_to_html_spark.sources.corpus import build_archive


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli")
    for i in range(3):
        (path / f"arc{i}.mht").write_bytes(build_archive(i, 2))
    (path / "broken.mht").write_bytes(b"\x00\x05\x16\x07 rubbish")
    return path


@pytest.mark.spark
def test_glob_conversion_with_error_isolation(corpus_dir, capsys):
    code = main([str(corpus_dir / "*.mht"), "--master", "local[2]"])
    assert code == 0, "one broken file must not fail the batch"
    captured = capsys.readouterr()
    for i in range(3):
        out = corpus_dir / f"arc{i}.html"
        assert out.exists(), f"{out} missing"
        text = out.read_text()
        assert text.startswith("<html>") or text.startswith("<!DOCTYPE")
        assert '<meta charset="utf-8">' in text
    assert not (corpus_dir / "broken.html").exists()
    assert "Index page not found" in captured.err


@pytest.mark.spark
def test_single_input_explicit_output(corpus_dir, tmp_path):
    out = tmp_path / "renamed.html"
    code = main([str(corpus_dir / "arc0.mht"), "--output", str(out), "--master", "local[2]"])
    assert code == 0
    assert out.exists() and "data:image/" in out.read_text()
