"""AOT executable store: save, fresh-store load, invalidation, fallback."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionhandles_tpu.utils.aot import AotStore


@pytest.fixture()
def cpu_aot(monkeypatch):
    monkeypatch.setenv("DIFFHANDLES_AOT_CPU", "1")


def test_store_roundtrip(tmp_path, cpu_aot):
    store = AotStore(str(tmp_path))
    fn = store.wrap("mm", lambda x, y: (x @ y, None))
    a = jnp.asarray(np.random.RandomState(0).randn(8, 8), jnp.float32)
    out, none = fn(a, a)
    assert none is None
    assert store.stats["misses"] == 1
    assert list(tmp_path.glob("*.aot"))

    # a fresh store (fresh process equivalent) loads without compiling
    store2 = AotStore(str(tmp_path))
    fn2 = store2.wrap("mm", lambda x, y: (x @ y, None))
    out2, _ = fn2(a, a)
    assert store2.stats == {"hits": 1, "misses": 0, "errors": 0,
                            "prefetched": 0}
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_distinct_signatures_get_distinct_entries(tmp_path, cpu_aot):
    store = AotStore(str(tmp_path))
    fn = store.wrap("mm", lambda x: x * 2)
    fn(jnp.zeros((4,), jnp.float32))
    fn(jnp.zeros((8,), jnp.float32))
    fn(jnp.zeros((4,), jnp.bfloat16))
    assert store.stats["misses"] == 3
    assert len(list(tmp_path.glob("*.aot"))) == 3


def test_corrupt_entry_falls_back_to_compile(tmp_path, cpu_aot):
    store = AotStore(str(tmp_path))
    fn = store.wrap("mm", lambda x: x + 1)
    x = jnp.zeros((4,), jnp.float32)
    fn(x)
    path = next(tmp_path.glob("*.aot"))
    path.write_bytes(b"garbage")
    store2 = AotStore(str(tmp_path))
    out = store2.wrap("mm", lambda x: x + 1)(x)
    np.testing.assert_array_equal(np.asarray(out), np.ones(4, np.float32))
    assert store2.stats["errors"] >= 1
    assert store2.stats["misses"] == 1


def test_disabled_on_cpu_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("DIFFHANDLES_AOT_CPU", raising=False)
    if jax.default_backend() != "cpu":
        pytest.skip("cpu-only behavior")
    store = AotStore(str(tmp_path))
    fn = store.wrap("mm", lambda x: x + 1)
    fn(jnp.zeros((4,), jnp.float32))
    assert not list(tmp_path.glob("*.aot"))
    assert store.stats["misses"] == 0


def test_gc_prunes_only_stale_generations(tmp_path):
    from diffusionhandles_tpu.utils.aot import AotStore

    store = AotStore(str(tmp_path))
    key = store._key("x", (np.zeros((2, 2), np.float32),))
    cur = tmp_path / f"{key}.aot"
    cur.write_bytes(b"current")
    stale = tmp_path / "deadbeef00000000-abc.aot"
    stale.write_bytes(b"stale")
    legacy = tmp_path / "0123456789abcdef0123456789abcdef.aot"
    legacy.write_bytes(b"legacy-format")
    store._gc()
    assert cur.exists()
    assert not stale.exists()
    assert not legacy.exists()


def test_save_records_name_and_avals_for_prefetch(tmp_path, cpu_aot):
    """Entries carry (name, arg avals) so prefetch_async can dummy-call
    them in pipeline order on a fresh process (upload-cliff hiding)."""
    import pickle

    store = AotStore(str(tmp_path))
    fn = store.wrap("guided_v1", lambda x: x * 3)
    fn(jnp.zeros((4, 2), jnp.float32))
    path = next(tmp_path.glob("*.aot"))
    with open(path, "rb") as f:
        record = pickle.load(f)
    assert len(record) == 6
    assert record[4] == "guided_v1"
    avals = jax.tree.leaves(
        record[5], is_leaf=lambda v: isinstance(v, tuple) and len(v) == 2)
    assert avals == [((4, 2), "float32")]


def test_prefetch_async_noop_on_cpu(tmp_path, cpu_aot):
    store = AotStore(str(tmp_path))
    assert store.prefetch_async() is None


def test_dummy_args_two_array_args():
    """Regression: a program whose arg 0 is a bare array (not a params
    dict) must reconstruct per-arg dummies — a loose is_leaf that matches
    any 2-tuple starting with a tuple mistakes the whole 2-arg args tuple
    for one aval and kills its prefetch."""
    from diffusionhandles_tpu.utils.aot import _arg_avals, _dummy_args

    args = (jnp.zeros((4, 2), jnp.float32), jnp.zeros((4,), jnp.bfloat16))
    dummies = _dummy_args(_arg_avals(args))
    assert len(dummies) == 2
    assert dummies[0].shape == (4, 2) and dummies[0].dtype == jnp.float32
    assert dummies[1].shape == (4,) and dummies[1].dtype == jnp.bfloat16
    # nested pytrees with non-array leaves survive untouched
    args2 = ({"w": jnp.zeros((3,), jnp.float32), "flag": True},
             jnp.zeros((2, 2), jnp.float32))
    d2 = _dummy_args(_arg_avals(args2))
    assert d2[0]["flag"] is True and d2[0]["w"].shape == (3,)
    assert d2[1].shape == (2, 2)


def test_prefetch_async_gcs_stale_generations(tmp_path, monkeypatch):
    """Regression: prefetch_async establishes the code-hash generation
    before any wrapped call, so it must also run the stale-generation GC
    (otherwise _key() never does and old multi-hundred-MB blobs live
    forever)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    store = AotStore(str(tmp_path))
    stale = tmp_path / "deadbeef00000000-abc.aot"
    stale.write_bytes(b"stale")
    t = store.prefetch_async()
    assert t is not None
    t.join(timeout=30)
    assert not stale.exists()


def test_resharding_call_handles_pytree_args(tmp_path, cpu_aot):
    """Regression: compiled.input_shardings[0] is a tuple of per-ARG
    sharding pytrees; the resharding wrapper must flatten it leaf-aligned
    (a params-dict arg 0 alone has many leaves) instead of comparing the
    arg count against the leaf count and silently skipping."""
    from diffusionhandles_tpu.utils.aot import _resharding_call

    def fn(params, x):
        return params["w"] @ x + params["b"]

    params = {"w": jnp.eye(4, dtype=jnp.float32),
              "b": jnp.ones((4,), jnp.float32)}
    x = jnp.arange(4, dtype=jnp.float32)
    compiled = jax.jit(fn).lower(params, x).compile()

    puts = []
    orig_put = jax.device_put
    monkeypatch_target = lambda v, s: (puts.append(1), orig_put(v, s))[1]
    import diffusionhandles_tpu.utils.aot as aot_mod
    old = aot_mod.jax.device_put
    aot_mod.jax.device_put = monkeypatch_target
    try:
        call = _resharding_call(compiled)
        out = call(params, x)
    finally:
        aot_mod.jax.device_put = old
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(fn(params, x)))
    assert len(puts) == 3  # w, b, x all re-placed (leaf-aligned zip ran)
