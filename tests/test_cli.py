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


def _script_archive() -> bytes:
    body = "\r\n".join(
        [
            "MIME-Version: 1.0",
            'Content-Type: multipart/related; boundary="----=_S"',
            "",
            "------=_S",
            "Content-Type: text/html; charset=utf-8",
            "Content-Transfer-Encoding: 8bit",
            "Content-Location: https://e/page.html",
            "",
            '<html><head></head><body><script>var KEEP_ME = 1;</script>'
            '<img src="missing.png"></body></html>',
            "------=_S--",
            "",
        ]
    )
    return body.encode("utf-8")


@pytest.mark.spark
def test_enable_scripts_reaches_convert(tmp_path):
    """--enable-scripts must not be a silent no-op (mod.js:16)."""
    src = tmp_path / "scripted.mht"
    src.write_bytes(_script_archive())
    out_on = tmp_path / "on.html"
    out_off = tmp_path / "off.html"
    assert main([str(src), "--output", str(out_on), "--enable-scripts", "--master", "local[2]"]) == 0
    assert main([str(src), "--output", str(out_off), "--master", "local[2]"]) == 0
    assert "KEEP_ME" in out_on.read_text(), "script dropped despite --enable-scripts"
    assert "KEEP_ME" not in out_off.read_text(), "script kept without the flag"


@pytest.mark.spark
def test_fetch_missing_resources_inlines_fetched_part(tmp_path):
    """--fetch-missing-resources runs the round fixpoint with the
    injected fetch double (mod.js:17,43-46; convert.js:129-146)."""
    from mhtml_to_html_spark.frontier.fixtures import resource_fetch_double

    src = tmp_path / "missing.mht"
    src.write_bytes(_script_archive())
    out = tmp_path / "fetched.html"
    code = main(
        [str(src), "--output", str(out), "--fetch-missing-resources", "--master", "local[2]"],
        fetch=resource_fetch_double,
    )
    assert code == 0
    text = out.read_text()
    assert "data:image/png;base64," in text, "the missing image was not fetched+inlined"


def test_version_flag(capsys):
    from mhtml_to_html_spark import __version__

    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code == 0
    assert __version__ in capsys.readouterr().out


def test_empty_input_prints_usage_exit_1(capsys):
    """mod.js:20-38: empty input → usage + exit 1 (not argparse's 2)."""
    assert main([]) == 1
    assert "usage" in capsys.readouterr().err.lower()


@pytest.mark.spark
def test_directory_input_with_file_output_does_not_overwrite(tmp_path, capsys):
    """A single DIRECTORY input yields many pages: a non-directory
    --output must NOT funnel them all into one file (silent data loss);
    each page lands next to its archive and the flag is warned about."""
    src = tmp_path / "arcs"
    src.mkdir()
    for i in range(2):
        (src / f"arc{i}.mht").write_bytes(build_archive(i, 2))
    out = tmp_path / "single.html"
    code = main([str(src), "--output", str(out), "--master", "local[2]"])
    assert code == 0
    assert not out.exists(), "pages must not overwrite each other into one file"
    for i in range(2):
        assert (src / f"arc{i}.html").exists()
    assert "ignored" in capsys.readouterr().err
