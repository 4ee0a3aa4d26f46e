"""Persistent-subprocess converter stage (SURVEY.md §2.3 ST1).

The reference shells out to pandoc for every markup conversion
(/root/reference/src/jimmy/md_lib/convert.py:99,147 — one exec per
note).  The Ray-correct shape is an actor-pool stage that spawns ONE
long-lived worker subprocess per actor in ``__init__`` and streams
batches through it over a length-prefixed stdin/stdout pipe protocol —
process spin-up is paid once per actor, not once per document.

pandoc itself is absent from this environment, so the worker subprocess
runs this repo's own HTML→Markdown converter (a real conversion, so the
stage is oracle-checkable against the same golden text as
``extract_text``); swapping in pandoc changes only ``worker_cmd``.

Protocol: 4-byte big-endian length + UTF-8 payload per message, one
request/response pair per document.  A dead subprocess is restarted once
and the failing document dead-letters (``error`` column) instead of
crashing the task (§2.9 fault isolation).
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys

import pyarrow as pa

_WORKER_SRC = r"""
import struct, sys
from jimmy_ray.html.extract import html_to_markdown
rd, wr = sys.stdin.buffer, sys.stdout.buffer
while True:
    head = rd.read(4)
    if len(head) < 4:
        break
    (n,) = struct.unpack(">I", head)
    html = rd.read(n)
    try:
        out = html_to_markdown(html).encode("utf-8")
        status = b"\x00"
    except Exception as exc:
        out = f"{type(exc).__name__}: {exc}".encode()
        status = b"\x01"
    wr.write(status + struct.pack(">I", len(out)) + out)
    wr.flush()
"""


class SubprocessConverterStage:
    """Actor-pool stage: one persistent converter subprocess per actor."""

    def __init__(self, worker_cmd: list[str] | None = None):
        if worker_cmd is None:
            worker_cmd = [sys.executable, "-u", "-c", _WORKER_SRC]
        self.cmd = worker_cmd
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        self.env = dict(os.environ)
        self.env["PYTHONPATH"] = (
            repo_root + os.pathsep + self.env.get("PYTHONPATH", "")
        )
        self.proc: subprocess.Popen | None = None
        self._spawn()

    def _spawn(self) -> None:
        self.proc = subprocess.Popen(
            self.cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            env=self.env,
        )

    def _convert(self, html: bytes) -> tuple[str, str | None]:
        assert self.proc is not None
        self.proc.stdin.write(struct.pack(">I", len(html)) + html)
        self.proc.stdin.flush()
        status = self.proc.stdout.read(1)
        if len(status) < 1:
            raise BrokenPipeError("worker died")
        (n,) = struct.unpack(">I", self.proc.stdout.read(4))
        payload = self.proc.stdout.read(n).decode("utf-8")
        if status == b"\x01":
            return "", payload
        return payload, None

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        errors: list[str | None] = []
        for html in batch["html"].to_pylist():
            try:
                text, err = self._convert(html)
            except (BrokenPipeError, OSError, struct.error) as exc:
                if self.proc is not None:
                    self.proc.kill()
                self._spawn()  # one restart, then dead-letter this row
                try:
                    text, err = self._convert(html)
                except Exception:  # noqa: BLE001
                    text, err = "", f"worker failed twice: {exc}"
            texts.append(text)
            errors.append(err)
        out = {n: batch[n] for n in batch.column_names if n != "html"}
        out["text"] = pa.array(texts, pa.string())
        out["error"] = pa.array(errors, pa.string())
        return pa.table(out)

    def __del__(self):
        if self.proc is not None and self.proc.poll() is None:
            self.proc.kill()


def subprocess_extract(sf_dir: str):
    """extract_text through the subprocess protocol — same golden text as
    the in-process path, so the oracle also proves protocol fidelity."""
    import ray.data as rd

    from jimmy_ray.data import synth

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    pages = docs.map_batches(
        synth.render_pages_batch, batch_format="pyarrow", batch_size=512
    ).select_columns(["url", "html"])  # drop the golden text: prove the path
    converted = pages.map_batches(
        SubprocessConverterStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )
    return converted.select_columns(["url", "text"])
