"""Structured run logging.

Replaces the reference's printf/cout observability (mesh stats, launch
config, matrix dumps, NVRTC logs — SURVEY.md §5) with structured records:
{mesh size, nnz, assembly ms, DOFs/s, CG iters, final residual} as dicts,
emitted as JSON lines and/or mirrored to the standard logging module.
"""
from __future__ import annotations

import json
import logging
import sys
import time
from typing import Optional

__all__ = ["RunLogger", "get_logger"]

_logger = logging.getLogger("tpufem")


def get_logger() -> logging.Logger:
    return _logger


class RunLogger:
    """Collects structured events for one run; optionally streams JSONL."""

    def __init__(self, stream=None, name: str = "run"):
        self.name = name
        self.events: list[dict] = []
        self.stream = stream
        self._t0 = time.perf_counter()

    def log(self, event: str, **fields):
        rec = {"event": event, "t": round(time.perf_counter() - self._t0, 6),
               **fields}
        self.events.append(rec)
        if self.stream is not None:
            print(json.dumps(rec), file=self.stream, flush=True)
        _logger.info("%s %s", event, fields)
        return rec

    def mesh_stats(self, mesh):
        return self.log("mesh", num_nodes=mesh.num_nodes,
                        num_elements=mesh.num_elements, dim=mesh.dim,
                        cell_type=mesh.cell_type)

    def assembly(self, *, num_dofs: int, nnz: Optional[int] = None,
                 seconds: Optional[float] = None, format: str = ""):
        fields = {"num_dofs": num_dofs, "format": format}
        if nnz is not None:
            fields["nnz"] = nnz
        if seconds is not None:
            fields["seconds"] = seconds
            fields["dofs_per_sec"] = num_dofs / seconds if seconds else None
        return self.log("assembly", **fields)

    def solve(self, result, *, seconds: Optional[float] = None):
        fields = {"iterations": int(result.iterations),
                  "residual_norm": float(result.residual_norm),
                  "converged": bool(result.converged),
                  "diverged": bool(result.diverged)}
        if seconds is not None:
            fields["seconds"] = seconds
        return self.log("solve", **fields)

    def dump(self, file=None):
        out = file or sys.stdout
        for rec in self.events:
            print(json.dumps(rec), file=out)
