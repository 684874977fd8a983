"""Structured metrics logging.

The reference logs through Lightning's self.log + prog_bar (SURVEY §5,
"no structured logging, no dashboards"); here every run can append JSONL
records that downstream tooling (or a human with jq) consumes.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics writer with wall-clock stamps."""

    def __init__(self, path: Optional[str] = None, *,
                 echo: bool = False):
        self.path = path
        self.echo = echo
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)),
                        exist_ok=True)
            self._f = open(path, 'a')
        else:
            self._f = None

    def log(self, step: int, metrics: Dict[str, Any], **extra) -> None:
        rec = {'step': int(step), 't': round(time.time() - self._t0, 3)}
        for k, v in {**metrics, **extra}.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + '\n')
            self._f.flush()
        if self.echo:
            print(line)

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
