"""Dataset generation CLI.

Parity target: `python dataset.py -samples N -path instances/` [SURVEY §3.1].
Writes npz shards (fast path) and optionally per-instance .graph text files
(reference-flavoured format, data/fileio.py).  Host-parallel over processes —
the reference's generation was serial Python around Concorde; here the C++
solver + multiprocessing is the host-parallelism mandated by SURVEY §2.2.
"""
from __future__ import annotations

import argparse
import functools
import multiprocessing as mp
import os


from tsp_gnn_tpu.data import fileio, generator
from tsp_gnn_tpu.utils.redirect import redirect_fd


def _gen_chunk(args, n_min, n_max, solver, restarts, text):
    seed, count, path = args
    with redirect_fd(1, os.devnull):  # silence solver prints (C6 parity)
        insts = generator.generate_instances(seed, count, n_min, n_max,
                                             solver, restarts)
    generator.save_shard(path, insts)
    if text:
        base = os.path.splitext(path)[0]
        for i, inst in enumerate(insts):
            fileio.write_graph(f"{base}_{i}.graph", inst)
    return path, len(insts)


def _shard_count(path: str) -> int:
    """Number of instances inside an existing npz shard (0 if absent/bad).

    Fast path reads the v2 top-level "n" array; v1-format shards (one zip
    member per instance) are counted from their top-level "count" member.
    A v1 archive without "count" (never written by this codebase) returns 0
    and is regenerated — the safe direction for --resume."""
    if not os.path.exists(path):
        return 0
    try:
        import numpy as np
        with np.load(path, allow_pickle=False) as z:
            if "format" in z.files:          # v2: concatenated arrays
                return int(z["n"].shape[0])
            if "count" in z.files:           # v1: per-instance zip members
                return int(z["count"])
        return 0
    except Exception:  # noqa: BLE001 — corrupt/partial shard: regenerate
        return 0


def create_dataset(path: str, samples: int, n_min: int = 20, n_max: int = 40,
                   seed: int = 0, shard_size: int = 1024,
                   solver: str = "auto", restarts: int = 4,
                   workers: int = 0, text: bool = False,
                   resume: bool = False) -> int:
    """resume=True skips shards whose file already exists, so an interrupted
    or partial run can be topped up to `samples` without regenerating (the
    per-shard seed is deterministic in the shard index, so resumed content
    is identical to what a single uninterrupted run would have written)."""
    os.makedirs(path, exist_ok=True)
    jobs = []
    remaining = samples
    shard = 0
    while remaining > 0:
        count = min(shard_size, remaining)
        shard_path = os.path.join(path, f"shard_{shard:05d}.npz")
        # resume only skips a shard that holds the EXPECTED count — a short
        # final shard from a smaller previous run is regenerated, keeping
        # the result identical to an uninterrupted run [ADVICE r2]
        if not (resume and _shard_count(shard_path) == count):
            jobs.append((seed + shard, count, shard_path))
        remaining -= count
        shard += 1
    fn = functools.partial(_gen_chunk, n_min=n_min, n_max=n_max,
                           solver=solver, restarts=restarts, text=text)
    if workers and len(jobs) > 1:
        with mp.get_context("spawn").Pool(workers) as pool:
            results = pool.map(fn, jobs)
    else:
        results = [fn(j) for j in jobs]
    total = sum(c for _, c in results)
    print(f"wrote {total} instances in {len(results)} shards to {path}")
    return total


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate labeled TSP instances")
    p.add_argument("-samples", "--samples", type=int, required=True)
    p.add_argument("-path", "--path", required=True)
    p.add_argument("--n-min", type=int, default=20)
    p.add_argument("--n-max", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shard-size", type=int, default=1024)
    p.add_argument("--solver", default="auto")
    p.add_argument("--restarts", type=int, default=4)
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    p.add_argument("--text", action="store_true",
                   help="also write .graph text files")
    p.add_argument("--resume", action="store_true",
                   help="skip shards whose file already exists (top up an "
                        "interrupted run; per-shard seeds are deterministic)")
    a = p.parse_args(argv)
    create_dataset(a.path, a.samples, a.n_min, a.n_max, a.seed, a.shard_size,
                   a.solver, a.restarts, a.workers, a.text, a.resume)


if __name__ == "__main__":
    main()
