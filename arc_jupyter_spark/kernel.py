"""Jupyter kernel shell: thin frontend over :class:`Interpreter`.

Reference architecture (ArcKernel.scala:11-34): the kernel is a
transport wrapper — all semantics live in the interpreter. Here the
same split: this module only adapts ``do_execute``/``do_complete`` to
the ipykernel protocol. It imports ipykernel lazily so the engine
stays usable as a plain library (SURVEY.md §7 step 9).

Install: ``python -m arc_jupyter_spark.kernel install`` writes a
kernelspec pointing at this module.
"""

from __future__ import annotations

import json
import sys
import tempfile

KERNEL_NAME = "arc_jupyter_spark"
DISPLAY_NAME = "Arc (PySpark)"


def _require_ipykernel():
    try:
        from ipykernel.kernelbase import Kernel
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "ipykernel is not installed; the engine is fully usable as a "
            "library via arc_jupyter_spark.interpreter.Interpreter"
        ) from exc
    return Kernel


def make_kernel_class():
    """Build the kernel class (deferred so import needs no ipykernel)."""
    Kernel = _require_ipykernel()

    from arc_jupyter_spark import __version__
    from arc_jupyter_spark.interpreter import Interpreter, completions

    class ArcSparkKernel(Kernel):  # pragma: no cover - needs jupyter runtime
        implementation = KERNEL_NAME
        implementation_version = __version__
        language = "sql"
        language_version = "ansi"
        language_info = {"name": "sql", "mimetype": "text/x-sql",
                         "file_extension": ".sql"}
        banner = f"{DISPLAY_NAME} {__version__}"

        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            self._interp: Interpreter | None = None

        @property
        def interp(self) -> Interpreter:
            if self._interp is None:
                # %secret wires to the Jupyter stdin password protocol
                # (reference: ArcInterpreter.scala:506-518).
                # ipykernel's raw_input takes no password kwarg — the
                # password-masked variant is Kernel.getpass.
                # restart_on_master_change: the KERNEL mirrors the
                # reference's stop-and-rebuild on %conf master
                # (ArcInterpreter.scala:520-526); library embedders
                # keep their JVM by default.
                self._interp = Interpreter(
                    input_fn=lambda key: self.getpass(f"{key}: "),
                    restart_on_master_change=True,
                )
            return self._interp

        def do_execute(self, code, silent, store_history=True,
                       user_expressions=None, allow_stdin=False):
            try:
                result = self.interp.execute(code)
            except Exception as exc:  # noqa: BLE001 - protocol boundary
                from arc_jupyter_spark.interpreter import format_error

                text = format_error(
                    exc, extended=self.interp.ctx.conf.extended_errors
                )
                if not silent:
                    self.send_response(self.iopub_socket, "stream",
                                      {"name": "stderr", "text": text})
                return {"status": "error", "execution_count": self.execution_count,
                        "ename": type(exc).__name__, "evalue": str(exc),
                        "traceback": [text]}
            if not silent:
                data = {}
                if result.html:
                    data["text/html"] = result.html
                if result.text:
                    data["text/plain"] = result.text
                if data:
                    self.send_response(self.iopub_socket, "display_data",
                                      {"data": data, "metadata": {}})
            return {"status": "ok", "execution_count": self.execution_count,
                    "payload": [], "user_expressions": {}}

        def do_complete(self, code, cursor_pos):
            prefix = code[:cursor_pos].rsplit("\n", 1)[-1]
            items = completions(self.interp.ctx)
            matches = [i["snippet"] for i in items
                       if i["text"].startswith(prefix.strip()) or not prefix.strip()]
            return {"status": "ok", "matches": matches,
                    "cursor_start": cursor_pos - len(prefix),
                    "cursor_end": cursor_pos, "metadata": {}}

    return ArcSparkKernel


def kernelspec() -> dict:
    return {
        "argv": [sys.executable, "-m", "arc_jupyter_spark.kernel",
                 "-f", "{connection_file}"],
        "display_name": DISPLAY_NAME,
        "language": "sql",
    }


def install() -> str:  # pragma: no cover - needs jupyter_client
    from jupyter_client.kernelspec import KernelSpecManager

    with tempfile.TemporaryDirectory() as td:
        with open(f"{td}/kernel.json", "w", encoding="utf-8") as fh:
            json.dump(kernelspec(), fh, indent=2)
        return KernelSpecManager().install_kernel_spec(
            td, kernel_name=KERNEL_NAME, user=True
        )


def main() -> None:  # pragma: no cover - needs jupyter runtime
    if "install" in sys.argv[1:]:
        print(f"installed kernelspec to {install()}")
        return
    from ipykernel.kernelapp import IPKernelApp

    IPKernelApp.launch_instance(kernel_class=make_kernel_class())


if __name__ == "__main__":  # pragma: no cover
    main()
