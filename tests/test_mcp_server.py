"""MCP server logic tests with a stubbed ``mcp`` package (the optional
extra is not installed in CI; the conversion glue is what needs cover)."""

import asyncio
import sys
import types

import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mcp_server(tmp_path_factory):
    # stub mcp.server.fastmcp before import
    fastmcp = types.ModuleType("mcp.server.fastmcp")

    class FastMCP:
        def __init__(self, name):
            self.tools = {}
            self.resources = {}

        def tool(self):
            def deco(fn):
                self.tools[fn.__name__] = fn
                return fn
            return deco

        def resource(self, uri):
            def deco(fn):
                self.resources[uri] = fn
                return fn
            return deco

        def run(self, *a, **k):
            raise RuntimeError("not used in tests")

    class Context:
        async def info(self, *a, **k):
            pass

        async def report_progress(self, *a, **k):
            pass

    fastmcp.FastMCP = FastMCP
    fastmcp.Context = Context
    server_pkg = types.ModuleType("mcp.server")
    mcp_pkg = types.ModuleType("mcp")
    sys.modules.setdefault("mcp", mcp_pkg)
    sys.modules["mcp.server"] = server_pkg
    sys.modules["mcp.server.fastmcp"] = fastmcp

    import os

    os.environ["RESOURCE_DIR"] = "/root/reference/tests/data"
    for m in list(sys.modules):
        if m.endswith("cli.mcp_server"):
            del sys.modules[m]
    from yomitoku_tpu.cli import mcp_server as srv

    # lightweight analyzer: lite models on CPU
    from yomitoku_tpu.document_analyzer import DocumentAnalyzer

    srv.analyzer = DocumentAnalyzer(
        configs={"ocr": {"text_recognizer": {"model_name": "parseq-tiny"}}},
        visualize=False,
        device="cpu",
    )
    return srv


@pytest.mark.parametrize("fmt", ["json", "markdown", "html", "csv"])
def test_process_ocr_formats(mcp_server, fmt):
    srv = mcp_server
    ctx = sys.modules["mcp.server.fastmcp"].Context()
    out = asyncio.run(
        srv.process_ocr(ctx, filename="test.jpg", output_format=fmt)
    )
    assert isinstance(out, str)
    if fmt == "json":
        import json

        assert isinstance(json.loads(out), list)
    if fmt == "html":
        assert "<" in out


def test_process_ocr_bad_format(mcp_server):
    srv = mcp_server
    ctx = sys.modules["mcp.server.fastmcp"].Context()
    with pytest.raises(ValueError):
        asyncio.run(
            srv.process_ocr(ctx, filename="test.jpg", output_format="docx")
        )


def test_list_files_resource(mcp_server):
    srv = mcp_server
    fn = srv.mcp.resources["file://list"]
    out = asyncio.run(fn()) if asyncio.iscoroutinefunction(fn) else fn()
    assert "test.jpg" in str(out)
