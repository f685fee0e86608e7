"""JSONL metrics / observability.

SURVEY.md §5 "Metrics / logging": per-window metrics written as one JSON
line each on process 0 after global aggregation — acceptance rates, shrink
and probe counts (sampler health), log L̂ mean/std (estimator health),
wall-clock, ESS/sec.  Stdlib only.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import jax

logger = logging.getLogger("auxpm_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[%(asctime)s auxpm] %(message)s", "%H:%M:%S"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("AUXPM_LOGLEVEL", "INFO"))


class MetricsWriter:
    """Append-only JSONL metrics file, written by process 0 only."""

    def __init__(self, path=None):
        self.path = path
        self.t0 = time.time()
        self._fh = None
        if path and jax.process_index() == 0:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def write(self, record: dict):
        record = {"t": round(time.time() - self.t0, 3), **record}
        if self._fh:
            self._fh.write(json.dumps(record, default=float) + "\n")
            self._fh.flush()
        logger.info(
            " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            )
        )

    def close(self):
        if self._fh:
            self._fh.close()
