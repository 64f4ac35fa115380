"""Small system helpers.

Parity target: the reference's util.py [SURVEY §2.1 C8] — timestamp() and
memory_usage() used in its log lines (checkpoint save/load live in
utils/checkpoint.py).
"""
from __future__ import annotations

import datetime
import resource


def enable_compilation_cache(path: str = ".jax_cache") -> None:
    """Persistent XLA compilation cache — first compile of the n40 train
    step through the axon remote-compile service is ~200s (PERF.md); cached
    recompiles across processes make restarts/evals cheap.  Call before any
    jit execution; harmless if the backend can't serialize executables."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older jax: flag names differ; skip
        pass


def timestamp() -> str:
    return datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")


def memory_usage() -> dict:
    """Peak RSS of this process (MB) + current host memory picture."""
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    out = {"peak_rss_mb": round(peak_mb, 1)}
    try:
        with open("/proc/meminfo") as f:
            info = dict(line.split(":")[:2] for line in f
                        if ":" in line)
        for k, key in (("MemTotal", "host_total_mb"),
                       ("MemAvailable", "host_avail_mb")):
            if k in info:
                out[key] = int(info[k].strip().split()[0]) // 1024
    except OSError:
        pass
    return out


def device_memory_stats() -> dict:
    """Per-device HBM stats when the backend exposes them."""
    import jax
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                stats[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        except Exception:  # noqa: BLE001 — optional API
            pass
    return stats
