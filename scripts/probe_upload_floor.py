#!/usr/bin/env python
"""Controlled cold-start floor probe: deserialize + first-exec each stored
pipeline executable on an otherwise-idle machine and derive the byte rates.

Cold start on this runtime is bytes-limited (PERFORMANCE.md "Cold start"):
`deserialize_and_load` ships the serialized executable through the device
tunnel, and the device runtime uploads a program at its first execution.
This probe isolates those two costs from model init/compute contention:
fresh process, NO model build, each stored program deserialized and then
executed once with zero dummies, timed separately, strictly sequentially.

The output is the floor arithmetic for the <120 s cold-start target: with
measured deserialize rate Rd and first-exec rate Ru, a first edit that
needs B bytes of programs cannot start its last phase before
~B/Rd + B'/Ru (B' = bytes the prefetch cannot overlap with host work).

Run on an idle machine: python scripts/probe_upload_floor.py
"""

import json
import os
import pathlib
import sys
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))


def main():
    import jax

    from diffusionhandles_tpu.utils.aot import AotStore, _dummy_args

    store = AotStore.default()
    if store.dir is None:
        sys.exit("no AOT store directory")
    import pickle

    rows = []
    from diffusionhandles_tpu.utils.aot import _FORMAT_VERSION
    for f in sorted(store.dir.glob(f"v{_FORMAT_VERSION}-*.aot"),
                    key=lambda p: p.stat().st_size):
        size = f.stat().st_size
        t0 = time.perf_counter()
        with open(f, "rb") as fh:
            record = pickle.load(fh)
        t_read = time.perf_counter() - t0
        name, avals = record[4], record[5]
        t0 = time.perf_counter()
        compiled = store._load(f.stem)
        t_deser = time.perf_counter() - t0
        if compiled is None:
            print(f"{name}: load failed")
            continue
        t_exec = None
        if avals is not None:
            try:
                dummies = _dummy_args(avals)
                t0 = time.perf_counter()
                out = compiled(*dummies)
                jax.block_until_ready(out)
                t_exec = time.perf_counter() - t0
            except Exception as e:
                print(f"{name}: dummy exec failed: {e!r}")
        rows.append({"name": name, "mb": round(size / 1e6, 1),
                     "disk_read_s": round(t_read, 2),
                     "deserialize_s": round(t_deser, 2),
                     "first_exec_s": (round(t_exec, 2)
                                      if t_exec is not None else None)})
        print(f"{name}: {size / 1e6:7.1f} MB  disk {t_read:5.2f}s  "
              f"deserialize {t_deser:6.2f}s "
              f"({size / 1e6 / max(t_deser, 1e-9):5.1f} MB/s)  "
              f"first-exec {t_exec if t_exec is None else round(t_exec, 2)}",
              flush=True)

    tot_mb = sum(r["mb"] for r in rows)
    tot_deser = sum(r["deserialize_s"] for r in rows)
    tot_exec = sum(r["first_exec_s"] or 0 for r in rows)
    summary = {
        "rows": rows,
        "total_mb": round(tot_mb, 1),
        "total_deserialize_s": round(tot_deser, 2),
        "total_first_exec_s": round(tot_exec, 2),
        "deserialize_mb_per_s": round(tot_mb / max(tot_deser, 1e-9), 1),
        "first_exec_mb_per_s": round(tot_mb / max(tot_exec, 1e-9), 1),
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    out_path = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / \
        "upload_floor.json"
    out_path.write_text(json.dumps(summary, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
