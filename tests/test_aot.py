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
                            "prefetched": 0, "traces": 0}
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


def test_gc_prunes_old_formats_and_expired_entries(tmp_path):
    """v2 GC: collect pre-v2 key formats and v2 entries unused past the
    TTL (mtime, touched on load); keep recently used v2 entries."""
    import time

    from diffusionhandles_tpu.utils.aot import AotStore

    store = AotStore(str(tmp_path))
    cur = tmp_path / "v3-0123456789abcdef0123456789abcdef.aot"
    cur.write_bytes(b"current")
    old_format = tmp_path / "deadbeef00000000-abc.aot"
    old_format.write_bytes(b"round4-format")
    expired = tmp_path / "v3-ffffffffffffffffffffffffffffffff.aot"
    expired.write_bytes(b"expired")
    os.utime(expired, (time.time() - 90 * 86400,) * 2)
    store._code_hash = "t"  # _gc runs after the generation is set
    store._gc()
    assert cur.exists()
    assert not old_format.exists()
    assert not expired.exists()


def test_unrelated_source_edit_preserves_hit(tmp_path, cpu_aot,
                                             monkeypatch):
    """The round-5 contract: the store key derives from the traced
    program, so a code edit that does not change a program's graph (here
    simulated by flipping the whole-package code hash, which is what an
    edit to ANY compute-path file does) must still HIT — only the sidecar
    memo re-traces. Round 4's code-hash keys lost all 6 executables to
    any edit (709 s driver warmup)."""
    import diffusionhandles_tpu.utils.aot as aot_mod

    x = jnp.asarray(np.random.RandomState(0).randn(4, 4), jnp.float32)

    monkeypatch.setattr(aot_mod, "_package_code_hash", lambda: "gen-a")
    store = AotStore(str(tmp_path))
    out = store.wrap("mm", lambda v: v @ v)(x)
    assert store.stats["misses"] == 1 and store.stats["traces"] == 1

    # "edit an unrelated file": new code generation, same program graph
    monkeypatch.setattr(aot_mod, "_package_code_hash", lambda: "gen-b")
    store2 = AotStore(str(tmp_path))
    out2 = store2.wrap("mm", lambda v: v @ v)(x)
    assert store2.stats["hits"] == 1 and store2.stats["misses"] == 0
    assert store2.stats["traces"] == 1   # re-traced, not recompiled
    assert len(list(tmp_path.glob("v3-*.aot"))) == 1
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    # a REAL graph change (always accompanied by a new code generation:
    # changing a program means editing a compute-path file) must MISS —
    # content keys, not name keys — and its save SUPERSEDES the old
    # same-(name, avals) entry so dead variants never ride the prefetch
    monkeypatch.setattr(aot_mod, "_package_code_hash", lambda: "gen-c")
    store3 = AotStore(str(tmp_path))
    store3.wrap("mm", lambda v: v @ v + 1.0)(x)
    assert store3.stats["misses"] == 1 and store3.stats["traces"] == 1
    assert len(list(tmp_path.glob("v3-*.aot"))) == 1


def test_sidecar_memoizes_tracing(tmp_path, cpu_aot):
    """Unchanged code in a fresh process must not re-trace: the sidecar
    JSON memoizes (generation, name, avals) -> program hash."""
    x = jnp.zeros((3, 3), jnp.float32)
    store = AotStore(str(tmp_path))
    store.wrap("mm", lambda v: v + 2.0)(x)
    assert store.stats["traces"] == 1
    assert (tmp_path / "hlokeys.json").exists()

    store2 = AotStore(str(tmp_path))
    store2.wrap("mm", lambda v: v + 2.0)(x)
    assert store2.stats == {"hits": 1, "misses": 0, "errors": 0,
                            "prefetched": 0, "traces": 0}


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


def test_names_index_and_name_queries(tmp_path, cpu_aot):
    """_save records key->name in names.json; name_stored answers by
    prefix without loading records; name_loaded flips once a wrap() call
    has made the program resident in this process."""
    store = AotStore(str(tmp_path))
    fn = store.wrap("prog_a:taps", lambda x: x * 2.0)
    assert not store.name_stored("prog_a")
    assert not store.name_loaded("prog_a")
    fn(jnp.ones((4,)))
    assert store.name_stored("prog_a:taps")
    assert store.name_stored("prog_a")          # prefix match
    assert not store.name_stored("prog_a:xla")  # other-variant miss
    assert store.name_loaded("prog_a:taps")
    # a FRESH store instance over the same dir sees the index from disk
    store2 = AotStore(str(tmp_path))
    assert store2.name_stored("prog_a:taps")
    assert not store2.name_loaded("prog_a:taps")  # nothing resident yet


def test_prefetch_uses_names_index_for_exact_filtering(tmp_path,
                                                       monkeypatch):
    """Prefetch only touches programs named in order/defer: a store
    holding two conv-mode variants must not deserialize the foreign one
    (round-5: the xla-mode probe watched prefetch ship the 961 MB taps
    'guided' through the tunnel for nothing)."""
    import json
    names = {"v3-aaa": "ddim_loop:50:bfloat16:taps:taps:xla",
             "v3-bbb": "ddim_loop:50:bfloat16:False:False:xla"}
    (tmp_path / "names.json").write_text(json.dumps(names))
    for k in names:
        (tmp_path / f"{k}.aot").write_bytes(b"not-a-real-record")
    store = AotStore(str(tmp_path))
    loaded = []
    monkeypatch.setattr(store, "_load_claimed",
                        lambda key: loaded.append(key) or None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    th = store.prefetch_async(
        order=("ddim_loop:50:bfloat16:False:False:xla",), defer=())
    th.join(timeout=30)
    assert loaded == ["v3-bbb"]


def test_save_supersedes_same_name_same_sig_entry(tmp_path, cpu_aot,
                                                  monkeypatch):
    """A structure change to a program (same name, same arg shapes, new
    graph) must unlink the old store entry — otherwise prefetch keeps
    shipping the dead multi-hundred-MB variant through the tunnel."""
    store = AotStore(str(tmp_path))
    x = jnp.ones((8,))
    store.wrap("prog_b:taps", lambda v: v + 1.0)(x)
    first = {f.name for f in tmp_path.glob("v3-*.aot")}
    assert len(first) == 1
    # same name + same avals, different graph -> supersedes
    monkeypatch.setattr(store, "_sidecar", None)  # drop (name,sig) memo so
    monkeypatch.setattr(store, "_code_hash", "other-gen")  # it re-traces
    (tmp_path / "hlokeys.json").unlink(missing_ok=True)
    store.wrap("prog_b:taps", lambda v: v * 3.0)(x)
    now = {f.name for f in tmp_path.glob("v3-*.aot")}
    assert len(now) == 1 and now != first
    # different avals under the same name -> both kept
    store.wrap("prog_b:taps", lambda v: v * 3.0)(jnp.ones((16,)))
    assert len(list(tmp_path.glob("v3-*.aot"))) == 2
