"""Metrics: counter/gauge/histogram families with null-object defaults.

Reference: cartographer/metrics/ (SURVEY.md §2 "metrics") — instrumentation
is free when no registry is installed (family_factory.h:31-56 null objects);
every major module calls register_metrics(FamilyFactory). A Prometheus
text-format exposition covers the cloud mode's pull endpoint
(cloud/metrics/prometheus/family_factory.cc).
"""

from __future__ import annotations

import math
import threading
from typing import Dict, List, Optional, Sequence, Tuple


class Counter:
    def increment(self, by: float = 1.0) -> None:
        pass


class Gauge:
    def set(self, value: float) -> None:
        pass

    def increment(self, by: float = 1.0) -> None:
        pass

    def decrement(self, by: float = 1.0) -> None:
        pass


class HistogramMetric:
    def observe(self, value: float) -> None:
        pass


class _Family:
    """Null family: labels -> null metric."""

    def __init__(self, metric_cls):
        self._metric_cls = metric_cls

    def add(self, labels: Dict[str, str]):
        return self._metric_cls()


class FamilyFactory:
    """Null-object default factory (metrics::FamilyFactory)."""

    def new_counter_family(self, name: str, description: str):
        return _Family(Counter)

    def new_gauge_family(self, name: str, description: str):
        return _Family(Gauge)

    def new_histogram_family(self, name: str, description: str,
                             boundaries: Sequence[float]):
        return _Family(HistogramMetric)


# ---------------------------------------------------------------------------
# In-memory implementation with Prometheus text exposition
# ---------------------------------------------------------------------------


class _RealCounter(Counter):
    def __init__(self):
        self.value = 0.0
        self._lock = threading.Lock()

    def increment(self, by: float = 1.0) -> None:
        with self._lock:
            self.value += by


class _RealGauge(Gauge):
    def __init__(self):
        self.value = 0.0
        self._lock = threading.Lock()

    def set(self, value: float) -> None:
        with self._lock:
            self.value = value

    def increment(self, by: float = 1.0) -> None:
        with self._lock:
            self.value += by

    def decrement(self, by: float = 1.0) -> None:
        self.increment(-by)


class _RealHistogram(HistogramMetric):
    def __init__(self, boundaries: Sequence[float]):
        self.boundaries = list(boundaries)
        self.bucket_counts = [0] * (len(self.boundaries) + 1)
        self.sum = 0.0
        self.count = 0
        self._lock = threading.Lock()

    def observe(self, value: float) -> None:
        with self._lock:
            i = 0
            while i < len(self.boundaries) and value >= self.boundaries[i]:
                i += 1
            self.bucket_counts[i] += 1
            self.sum += value
            self.count += 1


class _RealFamily:
    def __init__(self, name, description, metric_factory):
        self.name = name
        self.description = description
        self._factory = metric_factory
        self.metrics: List[Tuple[Dict[str, str], object]] = []
        self._lock = threading.Lock()

    def add(self, labels: Dict[str, str]):
        metric = self._factory()
        with self._lock:
            self.metrics.append((dict(labels), metric))
        return metric


class RegistryFamilyFactory(FamilyFactory):
    """Collecting implementation + Prometheus text format."""

    def __init__(self):
        self._families: List[Tuple[str, str, _RealFamily]] = []

    def new_counter_family(self, name: str, description: str):
        fam = _RealFamily(name, description, _RealCounter)
        self._families.append(("counter", name, fam))
        return fam

    def new_gauge_family(self, name: str, description: str):
        fam = _RealFamily(name, description, _RealGauge)
        self._families.append(("gauge", name, fam))
        return fam

    def new_histogram_family(self, name: str, description: str,
                             boundaries: Sequence[float]):
        fam = _RealFamily(name, description,
                          lambda: _RealHistogram(boundaries))
        self._families.append(("histogram", name, fam))
        return fam

    @staticmethod
    def _labels_str(labels: Dict[str, str]) -> str:
        if not labels:
            return ""
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        return "{" + inner + "}"

    def collect_prometheus(self) -> str:
        """Prometheus text exposition format."""
        out = []
        for kind, name, fam in self._families:
            out.append(f"# HELP {name} {fam.description}")
            out.append(f"# TYPE {name} {kind}")
            for labels, metric in fam.metrics:
                ls = self._labels_str(labels)
                if kind in ("counter", "gauge"):
                    out.append(f"{name}{ls} {metric.value}")
                else:
                    cumulative = 0
                    for b, c in zip(metric.boundaries, metric.bucket_counts):
                        cumulative += c
                        lb = dict(labels)
                        lb["le"] = repr(float(b))
                        out.append(f"{name}_bucket{self._labels_str(lb)} {cumulative}")
                    lb = dict(labels)
                    lb["le"] = "+Inf"
                    out.append(f"{name}_bucket{self._labels_str(lb)} {metric.count}")
                    out.append(f"{name}_sum{ls} {metric.sum}")
                    out.append(f"{name}_count{ls} {metric.count}")
        return "\n".join(out) + "\n"


# Histogram boundary helpers (metrics/histogram.h).
def linear_boundaries(start: float, stop: float, num: int) -> List[float]:
    step = (stop - start) / num
    return [start + i * step for i in range(1, num + 1)]


def exponential_boundaries(scale_factor: float, base: float, num: int) -> List[float]:
    return [scale_factor * (base ** i) for i in range(num)]


GLOBAL_FACTORY: FamilyFactory = FamilyFactory()


def set_global_factory(factory: FamilyFactory) -> None:
    global GLOBAL_FACTORY
    GLOBAL_FACTORY = factory
