#!/usr/bin/env python
"""Flash-attention block-size tuning probe (ROADMAP perf item 2).

Times the Pallas flash forward / fused backward in-scan (the only honest
measurement through the axon tunnel — see PERFORMANCE.md) on the exact
U-Net shapes that route to flash (seq 4096 h=5 and seq 1024 h=10, d=64),
across block-size variants; bk=whole rows route to the production
one-pass kernel (ops/attention.py _flash_onepass_kernel), so the probe
always measures the shipped kernels, never a copy.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_attention.py
"""
import os
import pathlib
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np
from diffusionhandles_tpu.ops.attention import (_flash_bwd_fused_fold_impl,
                                                _flash_bwd_fused_impl,
                                                _flash_bwd_impl,
                                                _flash_fwd_impl)

STEPS = 32


def time_scan(fn, *args, n=8):
    """Run fn STEPS times inside lax.scan with data feedback; time n calls."""
    def scanned(*a):
        def step(carry, _):
            out = fn(carry, *a[1:])
            carry = carry + 0.001 * out.astype(carry.dtype)
            return carry, ()
        last, _ = jax.lax.scan(step, a[0], None, length=STEPS)
        return jnp.sum(last.astype(jnp.float32))
    jfn = jax.jit(scanned)
    t0 = time.perf_counter()
    float(jfn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    float(out)
    per = (time.perf_counter() - t0) / n / STEPS
    return per, compile_s


def main():
    rng = np.random.RandomState(0)
    shapes = [(1, 4096, 5, 64), (2, 4096, 5, 64), (1, 1024, 10, 64)]
    for (b, s, h, d) in shapes:
        q = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
        do = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
        print(f"== shape b={b} s={s} h={h} d={d}", flush=True)

        # ---- forward variants
        for name, fwd in [
            ("fwd cur bq512/bk2048",
             lambda q, k, v: _flash_fwd_impl(q, k, v, 512, 2048)[0]),
            ("fwd bq512/bk=whole",
             lambda q, k, v: _flash_fwd_impl(q, k, v, 512, 1 << 20)[0]),
            ("fwd bq1024/bk=whole",
             lambda q, k, v: _flash_fwd_impl(q, k, v, 1024, 1 << 20)[0]),
            ("fwd bq2048/bk2048",
             lambda q, k, v: _flash_fwd_impl(q, k, v, 2048, 2048)[0]),
            ("fwd bq2048/bk=whole (default)",
             lambda q, k, v: _flash_fwd_impl(q, k, v)[0]),
            ("fwd bq2048 NOfold",
             lambda q, k, v: _flash_fwd_impl(q, k, v, fold=False)[0]),
            ("fwd bq1024 fold",
             lambda q, k, v: _flash_fwd_impl(q, k, v, 1024)[0]),
        ]:
            try:
                per, comp = time_scan(fwd, q, k, v)
                print(f"  {name:>22}: {per*1e6:7.1f} us "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:  # VMEM overflow etc.
                print(f"  {name:>22}: FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)

        # ---- backward variants. The feedback term must consume dq AND
        # dk AND dv: consuming dq alone lets XLA dead-code-eliminate the
        # two-pass formulation's separate dk/dv pallas_call (halving its
        # apparent cost) while the fused kernel — one call, three outputs —
        # cannot be pruned the same way.
        o, lse = _flash_fwd_impl(q, k, v)
        def all3(grads):
            dq, dk, dv = grads
            return dq + dk + dv
        for name, bwd in [
            ("bwd FOLD bq1024/bk1024",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_fold_impl(
                 q, k, v, o_, lse_, do_, 1024, 1024))),
            ("bwd FOLD bq2048/bk2048",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_fold_impl(
                 q, k, v, o_, lse_, do_, 2048, 2048))),
            ("bwd FOLD bq1024/bk2048",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_fold_impl(
                 q, k, v, o_, lse_, do_, 1024, 2048))),
            ("bwd fused bq1024/bk1024",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_impl(
                 q, k, v, o_, lse_, do_, 1024, 1024))),
            ("bwd fused bq512/bk1024",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_impl(
                 q, k, v, o_, lse_, do_, 512, 1024))),
            ("bwd fused bq1024/bk2048",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_impl(
                 q, k, v, o_, lse_, do_, 1024, 2048))),
            ("bwd fused bq512/bk=whole",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_impl(
                 q, k, v, o_, lse_, do_, 512, 1 << 20))),
            ("bwd fused bq2048/bk1024",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_impl(
                 q, k, v, o_, lse_, do_, 2048, 1024))),
            ("bwd fused bq2048/bk2048",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_fused_impl(
                 q, k, v, o_, lse_, do_, 2048, 2048))),
            ("bwd 2pass bq512/bk1024",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_impl(
                 q, k, v, o_, lse_, do_, 512, 1024))),
            ("bwd 2pass bq1024/bk2048",
             lambda do_, o_=o, lse_=lse: all3(_flash_bwd_impl(
                 q, k, v, o_, lse_, do_, 1024, 2048))),
        ]:
            try:
                per, comp = time_scan(bwd, do)
                print(f"  {name:>22}: {per*1e6:7.1f} us "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:
                print(f"  {name:>22}: FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
