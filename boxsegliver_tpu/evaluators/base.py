"""Evaluator base: metric accumulation + comparison
(reference evaluators/evaluator_base.py:23-120)."""

from __future__ import annotations

import csv
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from boxsegliver_tpu.train.hooks import default_compare


class EvaluateBase:
    """Accumulates per-case metric dicts; mean/compare/CSV-dump interface."""

    def __init__(self, classes: List[str], metrics: List[str],
                 primary_metric: Optional[str] = None,
                 secondary_metric: Optional[str] = None):
        self.classes = [c for c in classes if c != "Background"]
        self.metrics_str = list(metrics)
        self.primary_metric = primary_metric
        self.secondary_metric = secondary_metric
        self._metric_values: Dict[str, List[float]] = defaultdict(list)

    def append_metrics(self, pairs: Dict[str, float]):
        for k, v in pairs.items():
            self._metric_values[k].append(float(v))

    def clear_metrics(self):
        self._metric_values.clear()

    def mean_metrics(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self._metric_values.items()}

    def save_metrics(self, path, cases: Optional[List[str]] = None):
        """Per-case CSV dump (reference evaluator_base.py:90-108)."""
        path = Path(path)
        keys = sorted(self._metric_values)
        n = max((len(v) for v in self._metric_values.values()), default=0)
        with path.open("w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow((["case"] if cases else []) + keys)
            for i in range(n):
                row = [cases[i]] if cases else []
                row += [self._metric_values[k][i] if i < len(self._metric_values[k])
                        else "" for k in keys]
                writer.writerow(row)

    def compare(self, candidate: Dict[str, float], best: Dict[str, float],
                min_delta: float = 0.0) -> bool:
        """Lexicographic primary→secondary (reference evaluator_liver.py:1193-1227)."""
        primary = self.primary_metric or f"{self.classes[-1]}/{self.metrics_str[0]}"
        return default_compare(candidate, best, primary, self.secondary_metric,
                               min_delta)
