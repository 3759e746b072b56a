#!/usr/bin/env python
"""Per-step cost of the U-Net inside lax.scan vs a single jitted call —
determines whether the [3,3,2560,1280] kernel staging copies are
loop-hoisted (paid once) or per-step (worth a Pallas fix)."""
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

from diffusionhandles_tpu.models.unet import (UNet2DCondition, UNetConfig,
                                              init_unet_params)

STEPS = 16


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)  # force full host sync (block_until_ready can lie here)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main():
    import sys
    split = "--split" in sys.argv
    unroll = 2 if "--unroll" in sys.argv else 1
    pallas = "--pallas" in sys.argv
    if "--hybrid" in sys.argv:
        pallas = "hybrid"
    if "--mm1" in sys.argv:
        pallas = "mm1x1"
    if "--taps" in sys.argv:
        pallas = "taps"
    if "--im2col" in sys.argv:
        pallas = "im2col"
    if "--mixed" in sys.argv:
        pallas = "mixed"
    if "--fused" in sys.argv:
        pallas = "fused"
    remat = False
    if "--remat" in sys.argv:
        remat = True
    if "--remat-dots" in sys.argv:
        remat = "dots"
    gn = "--gn" in sys.argv
    cfg = UNetConfig(in_channels=5, dtype=jnp.bfloat16,
                     param_dtype=jnp.bfloat16, flash_attention=True,
                     remat=remat, split_skip_conv=split, pallas_conv=pallas,
                     pallas_gn=gn)
    print(f"split={split} unroll={unroll} pallas={pallas} remat={remat} "
          f"gn={gn}", flush=True)
    unet, params = init_unet_params(cfg, seed=0)
    prepare = "--no-prepare" not in sys.argv
    if prepare:
        from diffusionhandles_tpu.models.unet import prepare_unet_params
    # --w8: store every large float leaf as (int8, per-out-channel scale)
    # and dequantize INSIDE the scan body behind an optimization_barrier.
    # Measures whether XLA fuses the int8->bf16 converts into the matmul
    # operand reads (weight HBM traffic halves) or materializes per-step
    # bf16 copies (traffic grows). Probe only — changes model numerics.
    w8 = "--w8" in sys.argv
    if w8 and prepare:
        # quantize the PREPARED tree (the taps matrices are what the scan
        # bodies actually read); skip the in-jit prepare.
        params = jax.jit(prepare_unet_params)(params)
        prepare = False
    if w8:
        def quant(w):
            if isinstance(w, (tuple, list)):
                return type(w)(quant(e) for e in w)
            if w.dtype not in (jnp.bfloat16, jnp.float32) or w.size < 4096:
                return None
            wf = w.astype(jnp.float32)
            scale = jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1)),
                            keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-12)
            q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
            return q, scale.astype(jnp.bfloat16)

        qtree = jax.tree.map(quant, params,
                             is_leaf=lambda x: not isinstance(x, dict))

        def dequant_tree(p, q):
            def deq(orig, qs):
                if qs is None:
                    return orig
                if isinstance(orig, (tuple, list)):
                    return type(orig)(deq(o, s) for o, s in zip(orig, qs))
                qq, scale = qs
                return (qq.astype(jnp.bfloat16) * scale).astype(orig.dtype)
            return jax.tree.map(
                deq, p, q,
                is_leaf=lambda x: x is None or not isinstance(x, dict))
    bsz = 2 if "--b2" in sys.argv else 1
    x1 = jnp.asarray(np.random.randn(bsz, 64, 64, 4), jnp.float32)
    d1 = jnp.asarray(np.random.randn(bsz, 64, 64, 1), jnp.float32)
    ctx1 = jnp.asarray(np.random.randn(bsz, 77, 1024), jnp.float32)

    def scan_fwd(p, x, d, c):
        if prepare:
            p = prepare_unet_params(p)
        def step(lat, t):
            pp = p
            if w8:
                qb = jax.lax.optimization_barrier(qtree)
                pp = dequant_tree(p, qb)
            eps, _, _ = unet.apply(pp, jnp.concatenate([lat, d], -1),
                                   t, c)
            return lat - 0.1 * eps.astype(lat.dtype), ()
        out, _ = jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32),
                              unroll=unroll)
        return out

    def scan_fwdbwd(p, x, d, c):
        if prepare:
            p = prepare_unet_params(p)
        def loss(pp, cc, lat, t):
            eps, _, _ = unet.apply(pp, jnp.concatenate([lat, d], -1), t, cc)
            return jnp.mean(eps.astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=1)

        def step(carry, t):
            lat, cc = carry
            pp = p
            if w8:
                qb = jax.lax.optimization_barrier(qtree)
                pp = dequant_tree(p, qb)
            cc = cc - 0.01 * g(pp, cc, lat, t)
            return (lat, cc), ()
        (_, out), _ = jax.lax.scan(step, (x, c),
                                   jnp.arange(STEPS, dtype=jnp.int32),
                                   unroll=unroll)
        return out

    def scan_nullopt(p, x, d, c):
        if prepare:
            p = prepare_unet_params(p)
        """EXACT null-opt inner structure (inverter.py): per outer step a
        fresh-Adam lax.while_loop of 5 fwd+bwd wrt the context + 2 no-grad
        fwds — isolates the while/Adam-context overhead vs scan_fwdbwd."""
        import optax
        from diffusionhandles_tpu.scheduler import (ddim_step,
                                                    make_ddim_schedule)
        schedule = make_ddim_schedule(50)

        def mse_loss(cc, lat, t, eps_cond, lat_prev):
            eps, _, _ = unet.apply(p, jnp.concatenate([lat, d], -1), t, cc)
            e = eps + 7.5 * (eps_cond - eps)
            rec = ddim_step(schedule, e, t, lat)
            return jnp.mean((rec - lat_prev) ** 2)

        lg = jax.value_and_grad(mse_loss)
        tx = optax.adam(1.0)

        def outer(carry, t):
            lat, cc = carry
            eps_cond, _, _ = unet.apply(p, jnp.concatenate([lat, d], -1),
                                        t, cc)
            st0 = tx.init(cc)

            def cond_fn(s):
                j, last, _, _ = s
                return jnp.logical_and(j < 5, jnp.logical_or(
                    j == 0, last >= 1e-5))

            def body(s):
                j, _, u, st = s
                loss, g = lg(u, lat, t, eps_cond, lat)
                upd, st = tx.update(g, st, u)
                u = optax.apply_updates(
                    u, jax.tree.map(lambda x: 0.01 * x, upd))
                return j + 1, loss, u, st

            if "--nulloptscan" in sys.argv:
                # masked-scan variant: 5 fixed iterations, updates gated on
                # the early-stop predicate (identical values, no
                # data-dependent control flow)
                def sbody(s, _):
                    j, last, u, st = s
                    live = jnp.logical_or(j == 0, last >= 1e-5)
                    loss, g = lg(u, lat, t, eps_cond, lat)
                    upd, st2 = tx.update(g, st, u)
                    u2 = optax.apply_updates(
                        u, jax.tree.map(lambda x: 0.01 * x, upd))
                    pick = lambda a, b: jnp.where(live, a, b)
                    u = jax.tree.map(pick, u2, u)
                    st = jax.tree.map(pick, st2, st)
                    last = jnp.where(live, loss, last)
                    return (j + 1, last, u, st), ()
                (_, _, cc, _), _ = jax.lax.scan(
                    sbody, (jnp.int32(0), jnp.float32(jnp.inf), cc, st0),
                    None, length=5)
            else:
                _, _, cc, _ = jax.lax.while_loop(
                    cond_fn, body, (jnp.int32(0), jnp.float32(jnp.inf), cc,
                                    st0))
            eps_u, _, _ = unet.apply(p, jnp.concatenate([lat, d], -1), t,
                                     cc)
            lat = ddim_step(schedule, eps_u, t, lat)
            return (lat, cc), ()

        (lat, _), _ = jax.lax.scan(outer, (x, c),
                                   jnp.arange(4, dtype=jnp.int32))
        return lat

    f1 = jax.jit(scan_fwd)
    f2 = jax.jit(scan_fwdbwd)
    benches = [("scan_fwd", f1), ("scan_fwdbwd", f2)]
    if "--fwd-only" in sys.argv:
        benches = benches[:1]
    if "--bwd-only" in sys.argv:
        benches = benches[1:]
    if "--nullopt" in sys.argv or "--nulloptscan" in sys.argv:
        benches = [("scan_nullopt", jax.jit(scan_nullopt))]
    if "--trace" in sys.argv:
        # trace the SCAN program (the production shape): single-call
        # traces attribute costs that XLA hoists out of scan bodies
        fn = benches[-1][1]
        out = fn(params, x1, d1, ctx1)
        np.asarray(out)
        tdir = "/tmp/trace_scan_" + benches[-1][0]
        with jax.profiler.trace(tdir):
            out = fn(params, x1, d1, ctx1)
            np.asarray(out)
        print("trace ->", tdir, flush=True)
        return
    for name, fn in benches:
        t0 = time.perf_counter()
        v = timeit(fn, params, x1, d1, ctx1)
        steps = 4 * 7 if name == "scan_nullopt" else STEPS
        print(f"{name:>12}: {v * 1e3:8.2f} ms total, "
              f"{v * 1e3 / steps:6.2f} ms/unet-call "
              f"(incl compile {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
