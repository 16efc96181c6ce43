"""Deadline micro-batcher (dfq_tpu.serve.microbatch): correctness of
result routing, padding, deadline dispatch, and stats."""

import threading
import time

import numpy as np

from dfq_tpu.serve import MicroBatcher


def _make_forward():
    import jax
    import jax.numpy as jnp

    W = jnp.asarray(np.random.default_rng(0).normal(0, 1, (16, 4)), jnp.float32)
    fwd = jax.jit(lambda x: x @ W)
    return fwd, np.asarray(W)


def test_results_match_direct_and_route_correctly():
    fwd, W = _make_forward()
    ex = np.zeros((16,), np.float32)
    mb = MicroBatcher(fwd, ex, buckets=(4, 16), max_wait_ms=5.0)
    rng = np.random.default_rng(1)
    items = [rng.normal(0, 1, (16,)).astype(np.float32) for _ in range(37)]
    futs = [mb.submit(x) for x in items]
    outs = [f.result(timeout=30) for f in futs]
    mb.stop()
    for x, o in zip(items, outs):
        np.testing.assert_allclose(o, x @ W, rtol=1e-4, atol=1e-5)
    st = mb.stats()
    assert st.items == 37
    assert st.dispatches >= 3  # 37 items through buckets of <=16
    assert sum(k * v for k, v in st.dispatch_sizes.items()) == st.items + st.padded


def test_deadline_fires_for_single_request():
    fwd, W = _make_forward()
    ex = np.zeros((16,), np.float32)
    mb = MicroBatcher(fwd, ex, buckets=(4, 64), max_wait_ms=20.0)
    t0 = time.perf_counter()
    out = mb.submit(ex + 1.0).result(timeout=30)
    waited = (time.perf_counter() - t0) * 1e3
    mb.stop()
    np.testing.assert_allclose(out, (ex + 1.0) @ W, rtol=1e-5)
    assert waited >= 15.0, waited  # the deadline actually gated dispatch
    st = mb.stats()
    assert st.dispatch_sizes.get(4) == 1  # smallest bucket, padded 4->1
    assert st.padded == 3


def test_concurrent_submitters():
    fwd, W = _make_forward()
    ex = np.zeros((16,), np.float32)
    mb = MicroBatcher(fwd, ex, buckets=(8, 32), max_wait_ms=2.0)
    results = {}
    lock = threading.Lock()

    def worker(tid):
        rng = np.random.default_rng(tid)
        for i in range(20):
            x = rng.normal(0, 1, (16,)).astype(np.float32)
            o = mb.submit(x).result(timeout=30)
            with lock:
                results[(tid, i)] = (x, o)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.stop()
    assert len(results) == 80
    for x, o in results.values():
        np.testing.assert_allclose(o, x @ W, rtol=1e-4, atol=1e-5)
    st = mb.stats()
    assert st.items == 80 and st.percentile(99) < 10_000


def test_submit_after_stop_raises():
    fwd, _ = _make_forward()
    ex = np.zeros((16,), np.float32)
    mb = MicroBatcher(fwd, ex, buckets=(4,), max_wait_ms=1.0)
    mb.stop()
    try:
        mb.submit(ex)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
