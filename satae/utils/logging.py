"""Metrics registry: per-epoch dict -> JSONL + stdout (SURVEY.md §5).

The reference's observability is print statements and matplotlib figures
(Report.md:686-687, 2678); this registry keeps the prints but also appends
every record to a JSONL file so runs are machine-readable and resumable
analyses don't re-parse logs.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

from satae.utils.strict_json import dump_strict_json, json_restore


class MetricsLogger:
    def __init__(self, path: Optional[str | Path] = None, *,
                 stream=None, echo: bool = True):
        self.path = Path(path) if path else None
        # None = look up sys.stdout at each write: a def-time default would
        # freeze whatever stdout was at import (e.g. a pytest capture stream
        # that is closed by the time a later test logs).
        self._stream = stream
        self.echo = echo
        self._t0 = time.time()
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    @property
    def stream(self):
        return self._stream if self._stream is not None else sys.stdout

    def log(self, record: Dict[str, Any], **extra: Any) -> None:
        rec = {"t": round(time.time() - self._t0, 3), **record, **extra}
        if self.path:
            with self.path.open("a") as f:
                f.write(dump_strict_json(rec) + "\n")
        if self.echo:
            parts = [f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                     for k, v in rec.items()]
            print("  ".join(parts), file=self.stream, flush=True)

    def __call__(self, msg_or_record) -> None:
        """Also usable as the plain log callback the trainers accept."""
        if isinstance(msg_or_record, dict):
            self.log(msg_or_record)
        else:
            if self.path:
                with self.path.open("a") as f:
                    f.write(json.dumps({"t": round(time.time() - self._t0, 3),
                                        "msg": str(msg_or_record)}) + "\n")
            if self.echo:
                print(msg_or_record, file=self.stream, flush=True)


def read_jsonl(path: str | Path):
    """Inverse of MetricsLogger's strict-JSON writes: restores 'inf'/'nan'
    metric strings (diverged configs) back to floats."""
    return [json_restore(json.loads(line))
            for line in Path(path).read_text().splitlines() if line.strip()]
