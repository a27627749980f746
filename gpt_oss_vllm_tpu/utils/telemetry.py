"""Device-memory telemetry + step timing.

TPU-native counterpart of the reference's CUDA VRAM logging
(``log_mem``, ``streaming_unsloth_bnb.py:20-27``; peak tracking at
``streaming_unsloth_loader.py:194,274``): ``device.memory_stats()`` where the
backend exposes it, graceful empty dict where it doesn't (the axon tunnel
backend reports None).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


def device_memory_stats(device=None) -> Dict[str, int]:
    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def pytree_nbytes(tree) -> int:
    """Device bytes of a pytree of arrays (packed 4-bit leaves count their
    stored uint8 bytes). Model-derived accounting that stays available on
    backends that hide allocator stats (the axon tunnel reports None) — the
    operator-facing counterpart of the reference's CUDA ``log_mem``."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        size = getattr(leaf, "size", None)
        dtype = getattr(leaf, "dtype", None)
        if size is None or dtype is None:
            continue
        total += size * dtype.itemsize
    return total


def memory_report(params=None, cache=None, device=None) -> Dict[str, object]:
    """Combined memory picture: backend allocator stats when exposed, plus
    model-derived weight/KV byte accounting that always works."""
    out: Dict[str, object] = {}
    stats = device_memory_stats(device)
    if stats:
        out["hbm"] = {
            k: stats[k]
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
            if k in stats
        }
    if params is not None:
        out["weights_bytes"] = pytree_nbytes(params)
    if cache is not None:
        out["kv_cache_bytes"] = pytree_nbytes((cache.k, cache.v))
    return out


def log_memory(tag: str, device=None) -> None:
    stats = device_memory_stats(device)
    if stats:
        used = stats.get("bytes_in_use", 0) / 1e9
        peak = stats.get("peak_bytes_in_use", 0) / 1e9
        limit = stats.get("bytes_limit", 0) / 1e9
        logger.info("%s: HBM %.2f GB in use (peak %.2f / limit %.2f)", tag, used, peak, limit)
    else:
        logger.debug("%s: no memory stats available on this backend", tag)


class StepTimer:
    """Rolling engine-step timing: prefill/decode latency percentiles."""

    def __init__(self, window: int = 512):
        self.window = window
        self.samples: Dict[str, list] = {}

    def record(self, kind: str, seconds: float) -> None:
        buf = self.samples.setdefault(kind, [])
        buf.append(seconds)
        if len(buf) > self.window:
            del buf[: len(buf) - self.window]

    def percentile(self, kind: str, q: float) -> Optional[float]:
        buf = sorted(self.samples.get(kind, []))
        if not buf:
            return None
        idx = min(len(buf) - 1, int(q * len(buf)))
        return buf[idx]

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for kind in self.samples:
            out[kind] = {
                "p50_ms": (self.percentile(kind, 0.5) or 0) * 1e3,
                "p95_ms": (self.percentile(kind, 0.95) or 0) * 1e3,
                "count": len(self.samples[kind]),
            }
        return out
