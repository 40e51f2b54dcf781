"""Kernel frontend (arc_jupyter_spark/kernel.py).

Two layers:

1. Protocol-shape tests through a STUB ipykernel base class — drives
   the real ``do_execute`` / ``do_complete`` message shaping (reply
   dicts, display_data payloads, stderr on error) without a ZMQ
   transport, so the kernel path is exercised even where jupyter is
   not installed.
2. A true end-to-end test via ``jupyter_client`` against the
   installed kernelspec (skip-gated on jupyter availability): one
   ``%sql`` round trip over the wire — the last reference-surface
   path (ArcKernel.scala:11-34).
"""

from __future__ import annotations

import json
import sys
import types

import pytest


@pytest.fixture()
def stub_ipykernel(monkeypatch):
    """Install a minimal ipykernel.kernelbase.Kernel into sys.modules."""

    class StubKernel:
        def __init__(self, **kwargs):
            self.execution_count = 1
            self.iopub_socket = object()
            self.sent: list[tuple[str, dict]] = []

        def send_response(self, socket, msg_type, content):
            self.sent.append((msg_type, content))

        def getpass(self, prompt=""):
            return "stub-secret"

    base = types.ModuleType("ipykernel.kernelbase")
    base.Kernel = StubKernel
    base.__file__ = "<stub>"
    pkg = types.ModuleType("ipykernel")
    pkg.kernelbase = base
    # pyspark sniffs ipykernel.__file__ to detect notebook rendering;
    # a module without it breaks show()/toPandas under the stub
    pkg.__file__ = "<stub>"
    monkeypatch.setitem(sys.modules, "ipykernel", pkg)
    monkeypatch.setitem(sys.modules, "ipykernel.kernelbase", base)
    return StubKernel


@pytest.fixture()
def kernel(stub_ipykernel, spark):
    from arc_jupyter_spark.context import ArcContext
    from arc_jupyter_spark.kernel import make_kernel_class

    cls = make_kernel_class()
    k = cls()
    # give the interpreter the shared test session instead of letting
    # it build one (the stub still wires getpass for %secret)
    from arc_jupyter_spark.interpreter import Interpreter

    k._interp = Interpreter(
        ctx=ArcContext(spark=spark),
        input_fn=lambda key: k.getpass(f"{key}: "),
    )
    return k


def test_do_execute_sql_roundtrip(kernel):
    reply = kernel.do_execute("%sql\nSELECT 1 AS x, 'a' AS y", silent=False)
    assert reply["status"] == "ok"
    kinds = [t for t, _ in kernel.sent]
    assert "display_data" in kinds
    data = dict(kernel.sent)["display_data"]["data"]
    assert "1" in data.get("text/plain", "") or "text/html" in data


def test_do_execute_error_shapes_protocol(kernel):
    reply = kernel.do_execute("%sql\nSELECT * FROM no_such_view_xyz",
                              silent=False)
    assert reply["status"] == "error"
    assert reply["ename"]
    assert any(t == "stream" and c.get("name") == "stderr"
               for t, c in kernel.sent)


def test_do_execute_silent_sends_nothing(kernel):
    reply = kernel.do_execute("%sql\nSELECT 1 AS x", silent=True)
    assert reply["status"] == "ok"
    assert kernel.sent == []


def test_do_complete_returns_magic_snippets(kernel):
    out = kernel.do_complete("%s", 2)
    assert out["status"] == "ok"
    assert any(m.startswith("%sql") for m in out["matches"])
    assert out["cursor_start"] == 0 and out["cursor_end"] == 2


def test_secret_wires_to_kernel_getpass(kernel):
    reply = kernel.do_execute("%secret\nTOKEN", silent=False)
    assert reply["status"] == "ok"
    assert kernel.interp.ctx.secrets["TOKEN"] == "stub-secret"


def test_kernelspec_shape():
    from arc_jupyter_spark.kernel import kernelspec

    spec = kernelspec()
    assert spec["argv"][1:3] == ["-m", "arc_jupyter_spark.kernel"]
    assert "{connection_file}" in spec["argv"]
    json.dumps(spec)  # serializable


try:
    import jupyter_client  # noqa: F401
    HAVE_JUPYTER = True
except ImportError:
    HAVE_JUPYTER = False


@pytest.mark.skipif(not HAVE_JUPYTER, reason="jupyter_client not installed")
def test_zmq_sql_roundtrip(tmp_path):
    """Protocol-level %sql round trip through a real kernel process."""
    import os

    from jupyter_client import KernelManager

    from arc_jupyter_spark.kernel import KERNEL_NAME, install

    os.environ.setdefault("JUPYTER_DATA_DIR", str(tmp_path / "jp"))
    install()
    km = KernelManager(kernel_name=KERNEL_NAME)
    km.start_kernel()
    try:
        kc = km.client()
        kc.start_channels()
        kc.wait_for_ready(timeout=120)
        msg_id = kc.execute("%sql\nSELECT 1 AS x")
        outputs = []
        while True:
            msg = kc.get_iopub_msg(timeout=120)
            if msg["parent_header"].get("msg_id") != msg_id:
                continue
            if msg["msg_type"] == "status" and \
                    msg["content"]["execution_state"] == "idle":
                break
            if msg["msg_type"] == "display_data":
                outputs.append(msg["content"]["data"])
        assert outputs and any("1" in str(v) for v in outputs[0].values())
    finally:
        km.shutdown_kernel(now=True)
