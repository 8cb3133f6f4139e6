"""Structured metrics logging: JSONL sink + in-jit callback hook.

The reference's only observability is a returned loss vector
(/root/reference/src/optimize_whitening.jl:41,44 — SURVEY.md §5). Here:
typed per-step records (negll/ELBO, acceptance, step size, divergences,
ESS, R-hat, throughput) appended as JSON lines, with `from_jit` riding
`jax.debug.callback` so metrics can stream out of compiled scans.
Multi-host: each process writes its own shard-tagged file; collective-
reduced scalars (the adaptation consensus values) agree across hosts by
construction.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, flush_every: int = 1):
        if path is not None and jax.process_count() > 1:
            root, ext = os.path.splitext(path)
            path = f"{root}.p{jax.process_index()}{ext or '.jsonl'}"
        self.path = path
        self.flush_every = flush_every
        self._buf: list[str] = []
        self._file = open(path, "a") if path else None
        self.history: list[dict] = []

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = np.asarray(v).item() if np.ndim(v) == 0 \
                    else np.asarray(v).tolist()
            rec[k] = v
        self.history.append(rec)
        if self._file:
            self._buf.append(json.dumps(rec))
            if len(self._buf) >= self.flush_every:
                self._file.write("\n".join(self._buf) + "\n")
                self._file.flush()
                self._buf = []

    def from_jit(self, step, **metrics) -> None:
        """Log from inside a jitted function via jax.debug.callback."""
        jax.debug.callback(
            lambda step, **m: self.log(int(step), **m), step, **metrics)

    def close(self) -> None:
        if self._file:
            if self._buf:
                self._file.write("\n".join(self._buf) + "\n")
                self._buf = []
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
