"""End-to-end CLI tests (reference pattern: tests/test_cli.py —
monkeypatched argv, real models on CPU with random weights, every output
format plus error paths).  A single DocumentAnalyzer is cached across
tests to keep CPU compile time bounded."""

import sys

import pytest

pytestmark = pytest.mark.slow

from yomitoku_tpu.cli import main as cli_main

DATA = "/root/reference/tests/data"
_ANALYZER_CACHE = {}


@pytest.fixture(autouse=True)
def _cached_analyzer(monkeypatch):
    """Reuse one lite DocumentAnalyzer across CLI invocations."""
    real_ctor = cli_main.DocumentAnalyzer

    def ctor(configs=None, visualize=False, device="tpu", **kw):
        def _has_path_cfg(d):
            if isinstance(d, dict):
                return any(
                    (k == "path_cfg" and v is not None) or _has_path_cfg(v)
                    for k, v in d.items()
                )
            return False

        if _has_path_cfg(configs):
            # explicit config paths must reach the real loader (error paths)
            return real_ctor(
                configs=configs, visualize=visualize, device=device, **kw
            )
        key = "analyzer"
        if key not in _ANALYZER_CACHE:
            _ANALYZER_CACHE[key] = real_ctor(
                configs=configs, visualize=visualize, device=device, **kw
            )
        a = _ANALYZER_CACHE[key]
        # visualize is normally plumbed at construction; propagate it to
        # the cached submodules so the flag behaves per-invocation
        a.visualize = visualize
        a.text_detector.visualize = visualize
        a.text_recognizer.visualize = visualize
        a.layout.layout_parser.visualize = visualize
        a.layout.table_structure_recognizer.visualize = visualize
        return a

    monkeypatch.setattr(cli_main, "DocumentAnalyzer", ctor)
    yield


def _run(argv):
    old = sys.argv
    sys.argv = ["yomitoku"] + argv
    try:
        cli_main.main()
    finally:
        sys.argv = old


@pytest.mark.parametrize("fmt", ["md", "html", "csv", "json"])
def test_cli_formats(tmp_path, fmt):
    out = tmp_path / fmt
    _run([f"{DATA}/test.jpg", "-f", fmt, "-o", str(out), "--lite", "-d", "cpu"])
    files = list(out.glob(f"*.{fmt}"))
    assert files, f"no .{fmt} output written"
    if fmt == "json":
        # always has structure even for an empty page
        assert files[0].stat().st_size > 0


def test_cli_searchable_pdf(tmp_path):
    out = tmp_path / "pdf"
    _run([f"{DATA}/test.jpg", "-f", "pdf", "-o", str(out), "--lite", "-d", "cpu"])
    files = list(out.glob("*.pdf"))
    assert files and files[0].read_bytes().startswith(b"%PDF")


def test_cli_pdf_combine(tmp_path):
    out = tmp_path / "combined"
    _run([
        f"{DATA}/test.pdf", "-f", "md", "-o", str(out), "--combine",
        "--lite", "-d", "cpu",
    ])
    files = list(out.glob("*.md"))
    assert len(files) == 1


def test_cli_visualize(tmp_path):
    out = tmp_path / "vis"
    _run([f"{DATA}/test.jpg", "-f", "md", "-o", str(out), "-v", "--lite",
          "-d", "cpu"])
    assert list(out.glob("*ocr*.jpg")) or list(out.glob("*layout*.jpg"))


def test_cli_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        _run(["/nonexistent/file.jpg", "-f", "md", "-o", str(tmp_path),
              "-d", "cpu"])


def test_cli_bad_format(tmp_path):
    with pytest.raises(ValueError):
        _run([f"{DATA}/test.jpg", "-f", "docx", "-o", str(tmp_path),
              "-d", "cpu"])


def test_cli_bad_encoding(tmp_path):
    with pytest.raises(ValueError):
        _run([f"{DATA}/test.jpg", "-f", "md", "-o", str(tmp_path),
              "--encoding", "latin-1", "-d", "cpu"])


def test_cli_unsupported_extension(tmp_path):
    with pytest.raises(ValueError):
        _run([f"{DATA}/test.txt", "-f", "md", "-o", str(tmp_path),
              "-d", "cpu"])


def test_cli_directory_recursion_swallows_bad_files(tmp_path):
    """Directory mode processes every file it can and skips the rest
    (reference cli/main.py:548-549 swallows per-file exceptions)."""
    import shutil

    indir = tmp_path / "in"
    sub = indir / "sub"
    sub.mkdir(parents=True)
    shutil.copy(f"{DATA}/test.png", indir / "good.png")
    (indir / "notes.txt").write_text("not an image")
    (sub / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\nnot really a png")
    outdir = tmp_path / "out"
    _run([str(indir), "-f", "json", "-o", str(outdir), "-d", "cpu"])
    produced = list(outdir.glob("*.json"))
    assert len(produced) == 1 and "good" in produced[0].name


def test_cli_bad_config_path(tmp_path):
    with pytest.raises(FileNotFoundError):
        _run([f"{DATA}/test.jpg", "-f", "md", "-o", str(tmp_path),
              "--td_cfg", "/nonexistent/cfg.yaml", "-d", "cpu"])


def test_cli_pages_selection(tmp_path):
    """--pages limits which PDF pages are processed."""
    _run([f"{DATA}/test.pdf", "-f", "json", "-o", str(tmp_path),
          "--pages", "1", "-d", "cpu"])
    outs = list(tmp_path.glob("*.json"))
    assert len(outs) == 1 and "_p1" in outs[0].name


def test_cli_lite_maps_models(tmp_path, monkeypatch):
    """--lite selects parseq-tiny + the reduced-resolution lite detector
    (reference maps --lite to parseq-tiny + ONNX CPU DBNet)."""
    captured = {}

    def spy(configs=None, **kw):
        captured.update(configs)
        raise SystemExit  # stop before building models

    monkeypatch.setattr(cli_main, "DocumentAnalyzer", spy)
    with pytest.raises(SystemExit):
        _run([f"{DATA}/test.jpg", "-f", "md", "-o", str(tmp_path),
              "--lite", "-d", "cpu"])
    assert captured["ocr"]["text_recognizer"]["model_name"] == "parseq-tiny"
    assert captured["ocr"]["text_detector"]["model_name"] == "dbnetv2_1-lite"
