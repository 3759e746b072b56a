"""AOT compiled-executable store.

The XLA persistent compilation cache removes recompiles, but a fresh process
still pays minutes of per-program tracing/loading at startup on this device
runtime (round-1 measured ~968 s of warmup for the full pipeline). This
module serializes *compiled executables* (`jax.experimental
.serialize_executable`) keyed by the program content itself so a fresh
process can load them directly.

No reference counterpart: the reference's startup cost is HF checkpoint
loading plus CUDA kernel JIT, both cached by their runtimes
(reference: diffhandles/guided_stable_diffuser.py:26-36). On TPU this is the
idiomatic equivalent of shipping precompiled programs.

Usage:
    aot = AotStore.default()          # repo-level .jax_aot dir (or None)
    fn = aot.wrap("guided_v1", jitted_or_plain_fn)
    out = fn(*args)                   # loads from store or compiles+saves

Invalidation (per-program content keys, round 5): the store key is derived
from the traced program itself — a SHA-256 of the lowered StableHLO text
(debug metadata stripped) + the argument avals + the device fingerprint —
so an executable goes stale exactly when ITS graph changes; editing an
unrelated source file preserves every hit. (The round-4 whole-package code
hash invalidated all pipeline executables on ANY compute-path edit: the
round-4 driver measured a 709 s warmup from 4/6 misses.) Tracing to obtain
the program hash is itself memoized in a sidecar JSON keyed by a
whole-package code hash, so unchanged code never re-traces; a code edit
costs one re-trace per program (seconds) instead of a recompile (minutes)
for programs the edit did not affect. Stale entries are collected by a
last-use TTL (touch-on-load mtime), not by code-hash generation.
"""

from __future__ import annotations

import functools
import hashlib
import os
import pathlib
import pickle
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def jnp_zeros(aval):
    """((shape), dtype-str) -> device zeros."""
    import jax.numpy as jnp
    return jnp.zeros(aval[0], np.dtype(aval[1]))


def _is_aval(av) -> bool:
    """True iff av is exactly (shape_tuple_of_ints, dtype_str) — an
    _arg_avals leaf. A looser predicate (any 2-tuple starting with a tuple)
    also matches a 2-arg args tuple whose first arg is an aval, silently
    breaking prefetch for any program whose arg 0 is a bare array."""
    return (isinstance(av, tuple) and len(av) == 2
            and isinstance(av[0], tuple)
            and all(isinstance(s, int) for s in av[0])
            and isinstance(av[1], str))


_DUMMY_CACHE: Dict = {}
_DUMMY_LOCK = None


def _dummy_args(avals):
    """Zero-filled argument pytree from an _arg_avals record (for
    prefetch-time first executions). Buffers are SHARED process-wide per
    (shape, dtype): the pipeline's scan programs all take the same ~1.7 GB
    U-Net parameter tree, and per-call zero trees from concurrent prefetch
    exec threads blew HBM (measured round 4: RESOURCE_EXHAUSTED with two
    in flight next to the live model + warmup edit). Safe because no
    pipeline program donates its inputs — dummies are read-only."""
    global _DUMMY_LOCK
    import threading
    if _DUMMY_LOCK is None:
        _DUMMY_LOCK = threading.Lock()

    def leaf(av):
        if not _is_aval(av):
            return av
        with _DUMMY_LOCK:
            got = _DUMMY_CACHE.get(av)
            if got is None:
                got = _DUMMY_CACHE[av] = jnp_zeros(av)
        return got

    return jax.tree.map(leaf, avals, is_leaf=_is_aval)


# Modules that define the jitted compute graphs this store serializes.
# Editing any of them invalidates every stored executable; unrelated modules
# (services, testset, aux models) don't churn the cache. This file itself is
# deliberately NOT in the list — the serialized executables don't depend on
# the store/prefetch logic; _FORMAT_VERSION below invalidates on real
# record-format changes instead (learned round 4: every prefetch tweak cost
# a ~20 min full recompile).
_COMPUTE_PATH = (
    "diffuser.py", "inverter.py", "scheduler.py", "guidance.py",
    "models/unet.py", "models/vae.py", "models/clip_text.py",
    "ops/attention.py", "ops/conv.py", "ops/resize.py",
    "parallel/batch.py", "parallel/sharding.py",
)

# Bump when the pickled .aot record layout or the key derivation changes.
# v2: per-program StableHLO content keys.
# v3: programs are traced with jax_traceback_in_locations_limit=0 for
#     hashing — Pallas kernels serialize their Mosaic module INTO the
#     StableHLO (tpu_custom_call backend_config) with caller source
#     locations baked in, which as_text(debug_info=False) cannot strip;
#     with locations on, shifting a LINE in any file on a kernel's call
#     path changed the hash of every grad program (measured round 5:
#     guided + null_opt re-missed after pure name-helper edits, ~25 min
#     of recompiles). Filenames start f"v{_FORMAT_VERSION}-".
_FORMAT_VERSION = 3


def _package_code_hash() -> str:
    """Whole-compute-path code hash — since round 5 this is ONLY the
    sidecar memo generation (when to re-trace for a program hash), never
    part of an executable's store key."""
    root = pathlib.Path(__file__).resolve().parents[1]
    h = hashlib.sha256()
    for rel in _COMPUTE_PATH:
        p = root / rel
        if p.exists():
            h.update(rel.encode())
            h.update(p.read_bytes())
    return h.hexdigest()[:16]


def _program_hash(lowered) -> str:
    """Content hash of a traced program: SHA-256 over the lowered StableHLO
    text with debug metadata (file/line locs) stripped, so comment/line
    shifts in source never change the hash — only a real graph change
    does."""
    return hashlib.sha256(
        lowered.as_text(debug_info=False).encode()).hexdigest()[:16]


@functools.lru_cache()
def _device_fingerprint() -> str:
    devs = jax.devices()
    return f"{devs[0].platform}:{devs[0].device_kind}:{len(devs)}:" \
           f"{jax.__version__}"


def _aval_sig(tree) -> str:
    leaves, treedef = jax.tree.flatten(tree)
    parts = [str(treedef)]
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            parts.append(f"{tuple(leaf.shape)}:{np.dtype(leaf.dtype)}")
        else:
            parts.append(f"py:{type(leaf).__name__}:{leaf!r}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _arg_avals(args):
    """(shape, dtype) pytree of example args, for prefetch-time dummies."""
    return jax.tree.map(
        lambda leaf: ((tuple(leaf.shape), str(np.dtype(leaf.dtype)))
                      if hasattr(leaf, "shape") and hasattr(leaf, "dtype")
                      else leaf), args)


def _resharding_call(compiled):
    """Wrap a deserialized executable so inputs are placed on its expected
    input shardings first (deserialize_and_load can restore a program with a
    different device assignment than the caller's uncommitted arrays)."""
    try:
        # input_shardings[0] is a tuple of per-top-level-arg sharding
        # PYTREES (one entry per argument, mirroring that argument's
        # structure) — flatten to a leaf-aligned list so it zips against
        # the flattened args (a params-dict arg alone has hundreds of
        # leaves)
        in_shardings = jax.tree.flatten(compiled.input_shardings[0])[0]
    except Exception:
        return compiled

    def call(*args):
        leaves, treedef = jax.tree.flatten(args)
        if len(leaves) == len(in_shardings):
            leaves = [x if s is None else jax.device_put(x, s)
                      for x, s in zip(leaves, in_shardings)]
            args = jax.tree.unflatten(treedef, leaves)
        return compiled(*args)

    return call


class AotStore:
    """Directory-backed store of serialized compiled executables."""

    _default: Optional["AotStore"] = None

    def __init__(self, directory: Optional[str]):
        self.dir = pathlib.Path(directory) if directory else None
        if self.dir is not None:
            self.dir.mkdir(parents=True, exist_ok=True)
        self._code_hash = None
        self.stats = {"hits": 0, "misses": 0, "errors": 0,
                      "prefetched": 0, "traces": 0}
        self._loaded: Dict[str, Any] = {}
        self._loaded_names: set = set()
        self._prefetch_thread = None
        self._sidecar: Optional[Dict[str, str]] = None
        self._names: Optional[Dict[str, str]] = None
        import threading
        self._claim_lock = threading.Lock()
        self._claims: Dict[str, Any] = {}   # key -> threading.Event
        # gate for the deferred prefetch wave (see prefetch_async)
        self.first_edit_done = threading.Event()

    @classmethod
    def default(cls) -> "AotStore":
        """Repo-level store; disable with DIFFHANDLES_AOT_DIR=''."""
        if cls._default is None:
            env = os.environ.get("DIFFHANDLES_AOT_DIR")
            if env == "":
                cls._default = cls(None)
            else:
                d = env or str(pathlib.Path(__file__).resolve().parents[2]
                               / ".jax_aot")
                cls._default = cls(d)
        return cls._default

    # -- sidecar: (code generation, device, name, avalsig) -> program hash

    def _sidecar_path(self) -> pathlib.Path:
        return self.dir / "hlokeys.json"

    def _sidecar_load(self) -> Dict[str, str]:
        if self._sidecar is None:
            import json
            try:
                self._sidecar = json.loads(
                    self._sidecar_path().read_text())
            except Exception:
                self._sidecar = {}
        return self._sidecar

    def _sidecar_memo_key(self, name: str, sig: str) -> str:
        if self._code_hash is None:
            self._code_hash = _package_code_hash()
            self._gc()
        # _FORMAT_VERSION in the memo key: a change to the HASHING
        # procedure itself (e.g. v3's loc-free tracing) must invalidate
        # memoized program hashes, or store keys derived from stale-format
        # hashes populate entries that can never hit after the next
        # re-trace
        return (f"{_FORMAT_VERSION}|{self._code_hash}|"
                f"{_device_fingerprint()}|{name}|{sig}")

    def _sidecar_put(self, memo_key: str, program_hash: str) -> None:
        import json
        with self._claim_lock:
            side = self._sidecar_load()
            side[memo_key] = program_hash
            if self.dir is None:
                return
            try:
                # merge with concurrent writers, drop other generations
                # (their code changed: re-trace is the point), atomic swap
                try:
                    disk = json.loads(self._sidecar_path().read_text())
                except Exception:
                    disk = {}
                disk.update(side)
                gen = f"{_FORMAT_VERSION}|{self._code_hash}|"
                disk = {k: v for k, v in disk.items()
                        if k.startswith(gen)}
                tmp = self.dir / ".hlokeys.tmp"
                tmp.write_text(json.dumps(disk, indent=0))
                tmp.replace(self._sidecar_path())
            except OSError:
                pass

    # -- names index: store key -> program name (names.json). Lets the
    # prefetch worker and the cold-start routing enumerate what the store
    # holds WITHOUT pickle-loading multi-hundred-MB records, and lets the
    # pipeline ask "is <program> stored / already deserialized?" by name.

    def _names_path(self) -> pathlib.Path:
        return self.dir / "names.json"

    def _names_load(self) -> Dict[str, list]:
        if self._names is None:
            import json
            try:
                raw = json.loads(self._names_path().read_text())
                # pre-supersede index entries were bare name strings
                self._names = {k: (v if isinstance(v, list) else [v, None])
                               for k, v in raw.items()}
            except Exception:
                self._names = {}
        return self._names

    def _names_put(self, key: str, name: str, sig: str = "") -> None:
        """Record key -> [name, aval-sig] in names.json. When a NEW key
        arrives for an existing (name, sig) pair, the old entry is a
        superseded structure variant of the same program (same name, same
        argument shapes, different graph) that can never be called again
        from current code — unlink it so prefetch stops shipping its
        multi-hundred-MB payload through the tunnel (round 5 watched a
        dead 902 MB null_opt variant deserialize ahead of the live one).
        Same-name entries with DIFFERENT avals (e.g. the two vae_decode
        batch sizes) are distinct programs and are kept."""
        import json
        with self._claim_lock:
            names = self._names_load()
            names[key] = [name, sig]
            if self.dir is None:
                return
            try:
                try:
                    disk = json.loads(self._names_path().read_text())
                except Exception:
                    disk = {}
                for k, v in names.items():
                    disk[k] = v
                for k, v in list(disk.items()):
                    rec_name, rec_sig = (v if isinstance(v, list)
                                         else [v, None])
                    superseded = (k != key and rec_name == name
                                  and sig and rec_sig == sig)
                    if superseded:
                        try:
                            (self.dir / f"{k}.aot").unlink()
                        except OSError:
                            pass
                    if superseded or not (self.dir / f"{k}.aot").exists():
                        disk.pop(k, None)
                tmp = self.dir / ".names.tmp"
                tmp.write_text(json.dumps(disk, indent=0))
                tmp.replace(self._names_path())
                self._names = {k: (v if isinstance(v, list) else [v, None])
                               for k, v in disk.items()}
            except OSError:
                pass

    def _mark_loaded(self, name: str) -> None:
        with self._claim_lock:
            self._loaded_names.add(name)

    def name_stored(self, prefix: str) -> bool:
        """True iff the store holds an executable whose program name starts
        with `prefix` (names-index lookup; legacy entries saved before the
        index existed are found by the prefetch enumeration instead)."""
        if self.dir is None:
            return False
        return any(v[0].startswith(prefix)
                   and (self.dir / f"{k}.aot").exists()
                   for k, v in self._names_load().items())

    def name_loaded(self, prefix: str) -> bool:
        """True iff a program whose name starts with `prefix` has finished
        deserializing in THIS process (prefetch worker or a wrap() call)."""
        with self._claim_lock:
            return any(n.startswith(prefix) for n in self._loaded_names)

    def _key(self, name: str, args, lower=None) -> str:
        """Per-program content key. `lower` is a zero-arg callable
        returning the jax Lowered program; it runs only when the sidecar
        has no memoized program hash for (code generation, name, avals) —
        i.e. once per program per code edit.

        Memo invariant (same one the round-4 scheme relied on): within one
        code generation, (name, avals) identifies a unique program —
        wrap() names must bake in every closure config scalar that alters
        the graph (see the diffuser's name strings), and any graph change
        implies a compute-path edit, which changes the generation and
        forces a re-trace."""
        sig = _aval_sig(args)
        memo_key = self._sidecar_memo_key(name, sig)
        ph = self._sidecar_load().get(memo_key)
        if ph is None:
            if lower is None:
                raise KeyError(f"no memoized program hash for {name}")
            self.stats["traces"] += 1
            t0 = time.perf_counter()
            ph = _program_hash(lower())
            if os.environ.get("DIFFHANDLES_AOT_DEBUG"):
                print(f"[aot] trace+hash {name}: "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
            self._sidecar_put(memo_key, ph)
        raw = f"{_FORMAT_VERSION}|{_device_fingerprint()}|{name}|{sig}|{ph}"
        return (f"v{_FORMAT_VERSION}-"
                + hashlib.sha256(raw.encode()).hexdigest()[:32])

    def _gc(self):
        """Collect entries that cannot or will not hit again: pre-v2 key
        formats, and v2 entries unused (mtime, touched on load) for longer
        than DIFFHANDLES_AOT_TTL_DAYS (default 30). Content keys never go
        stale with the code — only disuse ages them out."""
        if self.dir is None:
            return
        ttl_days = float(os.environ.get("DIFFHANDLES_AOT_TTL_DAYS", "30"))
        cutoff = time.time() - ttl_days * 86400.0
        for f in self.dir.glob("*.aot"):
            stale = not f.name.startswith(f"v{_FORMAT_VERSION}-")
            try:
                stale = stale or f.stat().st_mtime < cutoff
            except OSError:
                continue
            if stale:
                try:
                    f.unlink()
                except OSError:
                    pass

    def _load_claimed(self, key: str, wait_s: float = 120.0):
        """Claim-or-wait load: if another thread (the prefetch worker or a
        concurrent caller) is already deserializing this key, wait for it
        instead of deserializing the multi-hundred-MB payload twice."""
        import threading

        with self._claim_lock:
            if key in self._loaded:
                return self._loaded[key]
            ev = self._claims.get(key)
            if ev is None:
                self._claims[key] = threading.Event()
                owner = True
            else:
                owner = False
        if not owner:
            ev.wait(timeout=wait_s)
            got = self._loaded.get(key)
            if got is not None:
                return got
            # owner failed or is still loading after wait_s: fall back to
            # an own load, but do NOT touch the owner's claim — popping or
            # setting it here would wake further waiters before _loaded is
            # populated and fan out N duplicate multi-hundred-MB loads
            compiled = self._load(key)
            if compiled is not None:
                with self._claim_lock:
                    compiled = self._loaded.setdefault(key, compiled)
            return compiled
        compiled = self._load(key)
        with self._claim_lock:
            if compiled is not None:
                self._loaded[key] = compiled
            ev2 = self._claims.pop(key, None)
        if ev2 is not None:
            ev2.set()
        return compiled

    def _load(self, key: str):
        if self.dir is None:
            return None
        path = self.dir / f"{key}.aot"
        if not path.exists():
            return None
        try:
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            with open(path, "rb") as f:
                record = pickle.load(f)
            payload, in_tree, out_tree, device_ids = record[:4]
            by_id = {d.id: d for d in jax.devices()}
            exec_devices = [by_id[i] for i in device_ids]
            import time as _time
            t0 = _time.perf_counter()
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=exec_devices)
            self.stats["hits"] += 1
            try:
                os.utime(path)   # touch: the TTL GC ages by last use
            except OSError:
                pass
            if os.environ.get("DIFFHANDLES_AOT_DEBUG"):
                print(f"[aot] load {key}: "
                      f"{_time.perf_counter() - t0:.1f}s "
                      f"({path.stat().st_size / 1e6:.0f} MB)", flush=True)
            return _resharding_call(compiled)
        except Exception:
            self.stats["errors"] += 1
            try:
                path.unlink()
            except OSError:
                pass
            return None

    def _save(self, key: str, compiled, name: str = "",
              arg_avals=None, sig: str = "") -> None:
        if self.dir is None:
            return
        try:
            from jax.experimental.serialize_executable import serialize
            payload, in_tree, out_tree = serialize(compiled)
            # deserialize_and_load defaults execution_devices to ALL backend
            # devices; record the program's real device assignment so a
            # 1-device program loads back as a 1-device program.
            device_ids = [
                d.id for d in
                compiled._executable.xla_executable.local_devices()]
            tmp = self.dir / f".{key}.tmp"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, device_ids,
                             name, arg_avals), f)
            tmp.replace(self.dir / f"{key}.aot")
            self._names_put(key, name, sig=sig)
        except Exception:
            self.stats["errors"] += 1

    def wrap(self, name: str, fn: Callable) -> Callable:
        """Wrap a jittable function: per call-signature, load the compiled
        executable from the store or compile once and save it.

        The wrapped callable accepts array pytrees only (every leaf must be
        a jax/numpy array or a python scalar with stable repr).
        """
        jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
        compiled_cache: Dict[str, Any] = {}

        @functools.wraps(getattr(fn, "__wrapped__", fn))
        def call(*args):
            if self.dir is None or (
                    jax.default_backend() == "cpu"
                    and not os.environ.get("DIFFHANDLES_AOT_CPU")):
                # XLA:CPU AOT blobs embed machine features and may SIGILL on
                # a different host; CPU (test) runs use the plain jit path +
                # the persistent compilation cache instead.
                return jitted(*args)
            lowered = []    # memo: at most one trace per call

            def lower():
                if not lowered:
                    # trace WITHOUT source locations: Pallas kernels bake
                    # their callers' source locs into the Mosaic payload
                    # inside the StableHLO (see _FORMAT_VERSION v3 note),
                    # so a loc-bearing trace hashes differently after ANY
                    # line shift on a kernel's call path. Not thread-safe
                    # against a concurrent trace, which never happens
                    # here (the prefetch thread only deserializes).
                    prev = jax.config.jax_traceback_in_locations_limit
                    jax.config.update("jax_traceback_in_locations_limit", 0)
                    try:
                        lowered.append(jitted.lower(*args))
                    finally:
                        jax.config.update(
                            "jax_traceback_in_locations_limit", prev)
                return lowered[0]

            key = self._key(name, args, lower=lower)
            compiled = compiled_cache.get(key)
            if compiled is None:
                # claim-or-wait: reuses the prefetch thread's load (and its
                # device upload) instead of deserializing twice
                compiled = self._load_claimed(key)
            if compiled is None:
                self.stats["misses"] += 1
                compiled = lower().compile()
                self._save(key, compiled, name=name,
                           arg_avals=_arg_avals(args),
                           sig=_aval_sig(args))
            compiled_cache[key] = compiled
            self._mark_loaded(name)
            return compiled(*args)

        call.aot_name = name
        return call

    # ------------------------------------------------------------------
    # Prefetch: hide the fresh-process first-execution upload cliff
    # ------------------------------------------------------------------

    def prefetch_async(self, order=("text_apply", "vae_encode",
                                    "ddim_loop", "null_opt", "initial",
                                    "vae_decode", "guided:"),
                       defer=("guided_batched",),
                       max_concurrent: int = 2, execute: bool = False):
        """Deserialize every stored executable in a background thread, in
        pipeline order, so the
        host-side `deserialize_and_load` (~30-100 s for the ~2.9 GB of
        pipeline executables, page-cache dependent) overlaps the jitted
        model init instead of blocking each phase's first call. Loaded
        executables are handed to wrap()'s call path via self._loaded
        (no double deserialize).

        `execute=True` additionally runs each program once with shared
        zero-filled dummy arguments to trigger the device runtime's
        first-execution program upload early (exec threads bounded by
        `max_concurrent`). This is OFF by default — measured round 4
        (full decision matrix in PERFORMANCE.md "Cold start"): on-demand
        uploads with no device contention gave the best cold start
        (266.8 s) vs 325 s for the round-3 sequential dummy-exec worker
        and 477 s for concurrent dummy execs — first-executions DO
        parallelize on an idle device (26.3 s vs 132.7 s sequential in a
        controlled two-program probe), but any dummy exec racing the real
        pipeline convoys the device queue and loses more than the upload
        overlap wins.

        `order` entries are name prefixes. `defer` entries are prefixes of
        programs the FIRST edit does not need (the batched-editing
        programs): deserialize on this single-vCPU host moves bytes
        through the device tunnel at ~20-35 MB/s, so loading the ~500 MB
        of batched programs before the first edit costs the cold start
        ~15-25 s for nothing. Deferred entries load only after
        `first_edit_done.set()` (the pipeline facade signals it at the end
        of its first transform_foreground) or after a 600 s fallback, so
        long-running services still warm fully.
        """
        import threading

        if self.dir is None or jax.default_backend() == "cpu":
            return None
        if self._prefetch_thread is not None:
            return self._prefetch_thread
        if self._code_hash is None:
            # establishing the generation here must also run the GC —
            # _key() only GCs when it is the one to set _code_hash, and
            # prefetch runs before any wrapped call
            self._code_hash = _package_code_hash()
            self._gc()

        # enumerate (key, name, avals) per store entry. The names index
        # makes this free; entries saved before the index existed (or with
        # execute=True, which needs the avals for dummy calls) fall back to
        # pickle-loading the record — a full read of each multi-hundred-MB
        # file, so the index is the fast path by design.
        names = self._names_load()
        records = []
        for f in sorted(self.dir.glob(f"v{_FORMAT_VERSION}-*.aot")):
            entry = names.get(f.stem)
            name = entry[0] if entry else None
            if name is not None and not execute:
                records.append((f.stem, name, None))
                continue
            try:
                with open(f, "rb") as fh:
                    record = pickle.load(fh)
                if len(record) < 6 or record[5] is None:
                    continue  # old-format entry: no avals to dummy-call
                records.append((f.stem, record[4], record[5]))
                if name is None:
                    self._names_put(f.stem, record[4])  # backfill index
            except Exception:
                continue

        def rank(name):
            for i, prefix in enumerate(order):
                if name.startswith(prefix):
                    return i
            for i, prefix in enumerate(defer):
                if name.startswith(prefix):
                    return len(order) + i
            return len(order) + len(defer)

        # only programs named in `order`/`defer` are prefetched: the store
        # is repo-level and shared, so entries from other program families
        # (e.g. a one-off script's graphs) would otherwise be uploaded
        # through the ~35 MB/s tunnel ahead of programs the pipeline needs
        n_listed = len(order) + len(defer)
        records = [r for r in records if rank(r[1]) < n_listed]
        records.sort(key=lambda r: rank(r[1]))
        deferred = {r[0] for r in records
                    if any(r[1].startswith(p) for p in defer)}

        debug = os.environ.get("DIFFHANDLES_AOT_DEBUG")
        t_origin = time.perf_counter()
        sem = threading.Semaphore(max_concurrent)

        def exec_one(name, compiled, avals, t_load0, t_load1):
            with sem:
                t_exec0 = time.perf_counter()
                try:
                    dummies = _dummy_args(avals)
                    # first execution triggers the device-runtime program
                    # upload; its duration IS the upload timeline entry
                    out = compiled(*dummies)
                    jax.block_until_ready(out)
                    t_exec1 = time.perf_counter()
                    with self._claim_lock:
                        self.stats["prefetched"] += 1
                    if debug:
                        print(f"[aot-timeline] {name}: deserialize "
                              f"{t_load0 - t_origin:.1f}-"
                              f"{t_load1 - t_origin:.1f}s, first-exec "
                              f"(upload) {t_exec0 - t_origin:.1f}-"
                              f"{t_exec1 - t_origin:.1f}s "
                              f"({t_exec1 - t_exec0:.1f}s)", flush=True)
                except Exception:
                    with self._claim_lock:
                        self.stats["errors"] += 1

        def worker():
            execs = []
            for key, name, avals in records:
                if key in deferred:
                    # hold until the first edit is served (or the fallback
                    # elapses) — see the docstring. On a degraded tunnel a
                    # cold edit can itself exceed the fallback, and the
                    # wave then competes with the edit's own uploads
                    # (measured round 5: a >600 s cold edit regressed
                    # further once the wave fired) — hence generous and
                    # env-tunable (DIFFHANDLES_AOT_DEFER_S).
                    self.first_edit_done.wait(timeout=float(
                        os.environ.get("DIFFHANDLES_AOT_DEFER_S", "1800")))
                t_load0 = time.perf_counter()
                compiled = self._load_claimed(key)
                if compiled is None:
                    continue
                t_load1 = time.perf_counter()
                self._mark_loaded(name)
                if not execute:
                    with self._claim_lock:
                        self.stats["prefetched"] += 1
                    if debug:
                        print(f"[aot-timeline] {name}: deserialize "
                              f"{t_load0 - t_origin:.1f}-"
                              f"{t_load1 - t_origin:.1f}s (no dummy exec; "
                              f"upload at first real call)", flush=True)
                    continue
                th = threading.Thread(
                    target=exec_one,
                    args=(name, compiled, avals, t_load0, t_load1),
                    daemon=True, name=f"aot-exec-{name[:24]}")
                th.start()
                execs.append(th)
            for th in execs:
                th.join()
            # release the shared dummy zero buffers (~1.7 GB of HBM)
            _DUMMY_CACHE.clear()

        self._prefetch_thread = threading.Thread(target=worker,
                                                 daemon=True,
                                                 name="aot-prefetch")
        self._prefetch_thread.start()
        return self._prefetch_thread
